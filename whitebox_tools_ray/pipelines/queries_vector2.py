"""Vector buffer (gis_analysis/buffer_vector.rs, 1,904 LoC) with the overlay
family's probe-region contract: the engine represents the buffer of each
polyline as the union of per-segment CAPSULES (the offset-rings + dissolve
of the reference collapse to exactly this region) and classifies a
deterministic probe grid against it; the DuckDB oracle classifies the same
probes against the point-to-segment distance field — identical float
expression trees on both sides, so the hash is bit-exact.

Fixture: 100 deterministic 6-segment polylines from splitmix64 (start point
+ bounded random steps), buffer radius 1.5; 6x6 probe grid per line over the
bbox inflated by the radius.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources.synthetic import splitmix64
from .queries import query
from .sqlgen import add64, sm64

N_LINES = 100
N_SEGS = 6
BUF_R = 1.5
BUF_SALT = 737271
BPROBE_N = 6


def _units(h: np.ndarray, off: int) -> np.ndarray:
    return (splitmix64(h + np.uint64(off)) % np.uint64(1 << 30)) \
        .astype(np.float64) / float(1 << 30)


def buffer_lines(line_ids: np.ndarray) -> np.ndarray:
    """(n, N_SEGS+1, 2) polyline vertices — cumulative bounded steps."""
    h = splitmix64(line_ids.astype(np.uint64) + np.uint64(BUF_SALT))
    n = len(line_ids)
    v = np.empty((n, N_SEGS + 1, 2))
    v[:, 0, 0] = _units(h, 1) * 300.0 - 150.0
    v[:, 0, 1] = _units(h, 2) * 140.0 - 70.0
    for k in range(N_SEGS):
        v[:, k + 1, 0] = v[:, k, 0] + (_units(h, 10 + 2 * k) * 6.0 - 3.0)
        v[:, k + 1, 1] = v[:, k, 1] + (_units(h, 11 + 2 * k) * 6.0 - 3.0)
    return v


def _buffer_probes(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 36) probe coordinates over the bbox inflated by BUF_R."""
    xmin = v[:, :, 0].min(axis=1) - BUF_R
    xmax = v[:, :, 0].max(axis=1) + BUF_R
    ymin = v[:, :, 1].min(axis=1) - BUF_R
    ymax = v[:, :, 1].max(axis=1) + BUF_R
    jx, jy = np.meshgrid(np.arange(BPROBE_N), np.arange(BPROBE_N), indexing="ij")
    fx = (jx.ravel() + 0.5) / float(BPROBE_N)
    fy = (jy.ravel() + 0.5) / float(BPROBE_N)
    px = xmin[:, None] + fx[None, :] * (xmax - xmin)[:, None]
    py = ymin[:, None] + fy[None, :] * (ymax - ymin)[:, None]
    return px, py


def capsule_inside(v: np.ndarray, px: np.ndarray, py: np.ndarray,
                   r: float = BUF_R) -> np.ndarray:
    """(n, n_probes) bool: probe within distance r of ANY segment — the
    capsule-union buffer region. The exact expression tree (projection
    clamp, squared distance) is mirrored verbatim in the SQL oracle."""
    inside = np.zeros(px.shape, bool)
    for k in range(v.shape[1] - 1):
        x0 = v[:, k, 0][:, None]; y0 = v[:, k, 1][:, None]
        x1 = v[:, k + 1, 0][:, None]; y1 = v[:, k + 1, 1][:, None]
        dx = x1 - x0; dy = y1 - y0
        l2 = dx * dx + dy * dy
        t = ((px - x0) * dx + (py - y0) * dy) / l2
        t = np.minimum(1.0, np.maximum(0.0, t))
        ex = px - (x0 + t * dx)
        ey = py - (y0 + t * dy)
        inside |= (ex * ex + ey * ey) <= r * r
    return inside


def _buffer_sql() -> str:
    h = sm64(add64("CAST(i AS UBIGINT)", str(BUF_SALT)))

    def unit(off: str) -> str:
        return (f"(CAST({sm64(add64('h', off))} % 1073741824 AS DOUBLE)"
                f" / 1073741824.0)")

    return f"""
    lh AS MATERIALIZED (SELECT CAST(i AS BIGINT) AS line_id, {h} AS h
                        FROM range({N_LINES}) t(i)),
    steps AS MATERIALIZED (
      SELECT line_id, CAST(k.i AS BIGINT) AS k,
             {unit('10 + 2 * k.i')} * 6.0 - 3.0 AS sx,
             {unit('11 + 2 * k.i')} * 6.0 - 3.0 AS sy
      FROM lh, range({N_SEGS}) k(i)
    ),
    verts AS MATERIALIZED (
      SELECT l.line_id, CAST(k.i AS BIGINT) AS k,
             ({unit('1')} * 300.0 - 150.0)
             + COALESCE((SELECT SUM(s.sx) FROM steps s
                         WHERE s.line_id = l.line_id AND s.k < k.i), 0.0) AS x,
             ({unit('2')} * 140.0 - 70.0)
             + COALESCE((SELECT SUM(s.sy) FROM steps s
                         WHERE s.line_id = l.line_id AND s.k < k.i), 0.0) AS y
      FROM lh l, range({N_SEGS + 1}) k(i)
    )
    """


@query(
    "vector_buffer_probes",
    f"""
    WITH {_buffer_sql()},
    bbox AS (
      SELECT line_id, MIN(x) - {BUF_R!r} AS xmin, MAX(x) + {BUF_R!r} AS xmax,
             MIN(y) - {BUF_R!r} AS ymin, MAX(y) + {BUF_R!r} AS ymax
      FROM verts GROUP BY line_id
    ),
    probes AS MATERIALIZED (
      SELECT b.line_id, CAST(g.i AS BIGINT) AS probe_id,
             b.xmin + ((g.i // {BPROBE_N}) + 0.5) / {float(BPROBE_N)!r} * (b.xmax - b.xmin) AS px,
             b.ymin + ((g.i % {BPROBE_N}) + 0.5) / {float(BPROBE_N)!r} * (b.ymax - b.ymin) AS py
      FROM bbox b, range({BPROBE_N * BPROBE_N}) g(i)
    ),
    segs AS (
      SELECT v0.line_id, v0.x AS x0, v0.y AS y0, v1.x AS x1, v1.y AS y1
      FROM verts v0 JOIN verts v1
        ON v1.line_id = v0.line_id AND v1.k = v0.k + 1
    ),
    dist AS (
      SELECT p.line_id, p.probe_id,
        MAX(CASE WHEN
          (p.px - (s.x0 + LEAST(1.0, GREATEST(0.0,
             ((p.px - s.x0) * (s.x1 - s.x0) + (p.py - s.y0) * (s.y1 - s.y0))
             / ((s.x1 - s.x0) * (s.x1 - s.x0) + (s.y1 - s.y0) * (s.y1 - s.y0))))
             * (s.x1 - s.x0)))
          * (p.px - (s.x0 + LEAST(1.0, GREATEST(0.0,
             ((p.px - s.x0) * (s.x1 - s.x0) + (p.py - s.y0) * (s.y1 - s.y0))
             / ((s.x1 - s.x0) * (s.x1 - s.x0) + (s.y1 - s.y0) * (s.y1 - s.y0))))
             * (s.x1 - s.x0)))
          + (p.py - (s.y0 + LEAST(1.0, GREATEST(0.0,
             ((p.px - s.x0) * (s.x1 - s.x0) + (p.py - s.y0) * (s.y1 - s.y0))
             / ((s.x1 - s.x0) * (s.x1 - s.x0) + (s.y1 - s.y0) * (s.y1 - s.y0))))
             * (s.y1 - s.y0)))
          * (p.py - (s.y0 + LEAST(1.0, GREATEST(0.0,
             ((p.px - s.x0) * (s.x1 - s.x0) + (p.py - s.y0) * (s.y1 - s.y0))
             / ((s.x1 - s.x0) * (s.x1 - s.x0) + (s.y1 - s.y0) * (s.y1 - s.y0))))
             * (s.y1 - s.y0)))
          <= {BUF_R!r} * {BUF_R!r} THEN 1 ELSE 0 END) AS inside
      FROM probes p JOIN segs s ON s.line_id = p.line_id
      GROUP BY p.line_id, p.probe_id
    )
    SELECT line_id, probe_id, CAST(inside AS BIGINT) AS inside FROM dist
    """,
)
def vector_buffer_probes(sf_dir: str):
    """BufferVector (gis_analysis/buffer_vector.rs): polyline buffer as the
    dissolved union of per-segment capsules; a deterministic probe grid
    classifies the region (the driver contract), bit-exact vs the SQL
    distance-field oracle."""
    import ray.data

    ids = ray.data.range(N_LINES, override_num_blocks=4)

    def per_line(batch: dict) -> pd.DataFrame:
        lids = batch["id"].astype(np.int64)
        v = buffer_lines(lids)
        px, py = _buffer_probes(v)
        inside = capsule_inside(v, px, py)
        npb = BPROBE_N * BPROBE_N
        return pd.DataFrame({
            "line_id": np.repeat(lids, npb),
            "probe_id": np.tile(np.arange(npb, dtype=np.int64), len(lids)),
            "inside": inside.astype(np.int64).ravel()})

    return ids.map_batches(per_line, batch_format="numpy")


# --------------------------------------------------------------------------
# ContoursFromRaster — per-tile marching squares, integer-rational contract
# --------------------------------------------------------------------------

CONTOUR_L2 = 1001  # level 500.5 as 2*L: never equals a (doubled) cell value


def _ms_case_table() -> dict[int, list[tuple[int, int]]]:
    """Marching-squares segment table. Case bits: TL=8 TR=4 BR=2 BL=1 for
    v >= level; edges 0=top 1=right 2=bottom 3=left. Two-crossing cases join
    their crossed edges; the two saddle cases use a FIXED pairing (TL-high
    saddle: (top,right)+(bottom,left); TR-high: (top,left)+(bottom,right))
    — the deterministic disambiguation rule shared verbatim with the SQL."""
    table: dict[int, list[tuple[int, int]]] = {}
    for case in range(16):
        tl, tr = case >> 3 & 1, case >> 2 & 1
        br, bl = case >> 1 & 1, case & 1
        crossed = [e for e, f in zip((0, 1, 2, 3),
                                     (tl != tr, tr != br, bl != br, tl != bl)) if f]
        if len(crossed) == 0:
            table[case] = []
        elif len(crossed) == 2:
            table[case] = [tuple(crossed)]
        else:  # saddle: all 4 edges crossed
            table[case] = [(0, 1), (2, 3)] if tl else [(0, 3), (1, 2)]
    return table


_MS_TABLE = _ms_case_table()


@query(
    "contours_marching_squares",
    (lambda: f"""
    WITH {__import__('whitebox_tools_ray.rasterdefs', fromlist=['_CELLS_CTE'])._CELLS_CTE},
    blocks AS (
      SELECT a.cell_id AS block_id, a.v AS vtl, b.v AS vtr, c2.v AS vbl, d.v AS vbr
      FROM cells a
      JOIN cells b ON b.r = a.r AND b.c = a.c + 1
      JOIN cells c2 ON c2.r = a.r + 1 AND c2.c = a.c
      JOIN cells d ON d.r = a.r + 1 AND d.c = a.c + 1
    ),
    cased AS (
      SELECT block_id, vtl, vtr, vbl, vbr,
             (CASE WHEN 2 * vtl >= {CONTOUR_L2} THEN 8 ELSE 0 END
            + CASE WHEN 2 * vtr >= {CONTOUR_L2} THEN 4 ELSE 0 END
            + CASE WHEN 2 * vbr >= {CONTOUR_L2} THEN 2 ELSE 0 END
            + CASE WHEN 2 * vbl >= {CONTOUR_L2} THEN 1 ELSE 0 END) AS cs
      FROM blocks
    ),
    segtab(cs, seg_idx, e0, e1) AS (VALUES {', '.join(
        f'({cs}, {i}, {e0}, {e1})'
        for cs, segs in _MS_TABLE.items() for i, (e0, e1) in enumerate(segs))})
    SELECT c.block_id, CAST(t.seg_idx AS BIGINT) AS seg_idx,
           CAST(t.e0 AS BIGINT) AS e0, CAST(t.e1 AS BIGINT) AS e1,
           CAST(CASE t.e0 WHEN 0 THEN {CONTOUR_L2} - 2 * vtl
                          WHEN 1 THEN {CONTOUR_L2} - 2 * vtr
                          WHEN 2 THEN {CONTOUR_L2} - 2 * vbl
                          ELSE {CONTOUR_L2} - 2 * vtl END AS BIGINT) AS n0,
           CAST(CASE t.e0 WHEN 0 THEN 2 * (vtr - vtl)
                          WHEN 1 THEN 2 * (vbr - vtr)
                          WHEN 2 THEN 2 * (vbr - vbl)
                          ELSE 2 * (vbl - vtl) END AS BIGINT) AS d0,
           CAST(CASE t.e1 WHEN 0 THEN {CONTOUR_L2} - 2 * vtl
                          WHEN 1 THEN {CONTOUR_L2} - 2 * vtr
                          WHEN 2 THEN {CONTOUR_L2} - 2 * vbl
                          ELSE {CONTOUR_L2} - 2 * vtl END AS BIGINT) AS n1,
           CAST(CASE t.e1 WHEN 0 THEN 2 * (vtr - vtl)
                          WHEN 1 THEN 2 * (vbr - vtr)
                          WHEN 2 THEN 2 * (vbr - vbl)
                          ELSE 2 * (vbl - vtl) END AS BIGINT) AS d1
    FROM cased c JOIN segtab t ON t.cs = c.cs
    """)(),
)
def contours_marching_squares(sf_dir: str):
    """ContoursFromRaster (terrain_analysis/contours_from_raster.rs): the
    500.5 level set via per-tile marching squares over a 1-cell halo — each
    tile emits the segments of blocks whose top-left cell it owns, so
    cross-tile lines stitch exactly (shared edge crossings are computed from
    the same two cell values on both sides). Vertex positions are exact
    rationals (n/d along the crossed edge, doubled-integer arithmetic);
    consumers interpolate floats. Saddles use the fixed rule of
    _ms_case_table."""
    from ..layers import GRID1
    from ..rasterdefs import _value_fn
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        # corner grids for blocks with TL = each own-tile cell
        vtl = padded[1:nr + 1, 1:nc + 1]
        vtr = padded[1:nr + 1, 2:nc + 2]
        vbl = padded[2:nr + 2, 1:nc + 1]
        vbr = padded[2:nr + 2, 2:nc + 2]
        valid = ~(np.isnan(vtr) | np.isnan(vbl) | np.isnan(vbr))
        cs = np.where(valid,
                      (2 * vtl >= CONTOUR_L2) * 8 + (2 * vtr >= CONTOUR_L2) * 4
                      + (2 * vbr >= CONTOUR_L2) * 2 + (2 * vbl >= CONTOUR_L2) * 1,
                      -1)
        return {"cs": cs, "vtl": vtl, "vtr": vtr, "vbl": vbl, "vbr": vbr}

    cells = stencil_3x3(tiles, GRID1, kern)

    def segs(df: pd.DataFrame) -> pd.DataFrame:
        cs = df["cs"].to_numpy(np.float64)
        frames = []
        corners = {k: df[k].to_numpy(np.float64) for k in ("vtl", "vtr", "vbl", "vbr")}

        def edge_nd(e: int, sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            vtl, vtr = corners["vtl"][sel], corners["vtr"][sel]
            vbl, vbr = corners["vbl"][sel], corners["vbr"][sel]
            if e == 0:
                return CONTOUR_L2 - 2 * vtl, 2 * (vtr - vtl)
            if e == 1:
                return CONTOUR_L2 - 2 * vtr, 2 * (vbr - vtr)
            if e == 2:
                return CONTOUR_L2 - 2 * vbl, 2 * (vbr - vbl)
            return CONTOUR_L2 - 2 * vtl, 2 * (vbl - vtl)

        bid = df["cell_id"].to_numpy(np.int64)
        for case, seglist in _MS_TABLE.items():
            if not seglist:
                continue
            sel = np.flatnonzero(cs == case)
            if not len(sel):
                continue
            for i, (e0, e1) in enumerate(seglist):
                n0, d0 = edge_nd(e0, sel)
                n1, d1 = edge_nd(e1, sel)
                frames.append(pd.DataFrame({
                    "block_id": bid[sel], "seg_idx": np.int64(i),
                    "e0": np.int64(e0), "e1": np.int64(e1),
                    "n0": n0.astype(np.int64), "d0": d0.astype(np.int64),
                    "n1": n1.astype(np.int64), "d1": d1.astype(np.int64)}))
        if not frames:
            return pd.DataFrame({k: pd.Series([], dtype=np.int64)
                                 for k in ("block_id", "seg_idx", "e0", "e1",
                                           "n0", "d0", "n1", "d1")})
        return pd.concat(frames, ignore_index=True)

    return cells.map_batches(segs, batch_format="pandas")


# --------------------------------------------------------------------------
# Shapefile import -> clip (end-to-end: .shp bytes -> parser -> packed layer)
# --------------------------------------------------------------------------

from ..layers import clip_keep_sql  # noqa: E402 (cycle-free)
from ..pointdefs import PTS_CTE  # noqa: E402


@query(
    "shapefile_pip_clip",
    f"WITH {PTS_CTE} SELECT event_id FROM pts WHERE {clip_keep_sql('x', 'y')}",
)
def shapefile_pip_clip(sf_dir: str):
    """End-to-end shapefile import (whitebox-vector/src/shapefile/mod.rs:112):
    the builtin polygon layer is WRITTEN as real .shp/.shx/.dbf bytes, read
    back through the record-range-parallel importer into PackedPolygons
    (file part order preserved), and the clip runs against the imported
    layer — the SQL oracle classifies against the original layer
    definitions, so any parser byte error flips the hash."""
    import os

    from ..layers import builtin_features
    from ..sources.shapefile import packed_from_shapefile, write_shapefile
    from ..sources.tables import read_points
    from ..stages.spatial_join import clip_points

    d = "/tmp/wbt_ray_shp_layer"
    os.makedirs(d, exist_ok=True)
    shp = os.path.join(d, "builtin.shp")
    write_shapefile(shp, builtin_features())  # deterministic bytes, idempotent
    polys = packed_from_shapefile(shp)
    return clip_points(read_points(sf_dir, extra_cols=()), polys) \
        .select_columns(["event_id"])


@query("vector_buffer_rings")
def vector_buffer_rings(sf_dir: str):
    """BufferVector RING OUTPUT (gis_analysis/buffer_vector.rs ring
    reassembly; round-3 VERDICT item 6): the dissolved buffer boundary per
    line as (line_id, ring_idx, vtx_idx, x_micro, y_micro, is_hole) rows.
    The region is the exact capsule union evaluated on a fine local grid
    (res = BUF_R/12) and the boundary comes from the SAME ring tracer the
    RasterToVectorPolygons family uses (stages/polygonize._trace_rings) —
    the standard raster-resolution buffer-outline extraction. Rows-only;
    region-equivalence oracle vs capsule_inside in tests/test_overlay.py."""
    import ray.data

    from ..stages.polygonize import _trace_rings

    ids = ray.data.range(N_LINES, override_num_blocks=4)
    res = BUF_R / 12.0

    def per_line(batch: dict) -> pd.DataFrame:
        lids = batch["id"].astype(np.int64)
        v = buffer_lines(lids)
        frames = []
        for i, lid in enumerate(lids):
            xmin = v[i, :, 0].min() - BUF_R - 2 * res
            ymax = v[i, :, 1].max() + BUF_R + 2 * res
            w = int(np.ceil((v[i, :, 0].max() + BUF_R + 2 * res - xmin)
                            / res)) + 1
            hgt = int(np.ceil((ymax - (v[i, :, 1].min() - BUF_R - 2 * res))
                              / res)) + 1
            cx = xmin + (np.arange(w) + 0.5) * res
            cy = ymax - (np.arange(hgt) + 0.5) * res
            gx, gy = np.meshgrid(cx, cy)
            inside = capsule_inside(v[i:i + 1], gx.ravel()[None, :],
                                    gy.ravel()[None, :])[0] \
                .reshape(hgt, w)
            rr, cc = np.nonzero(inside)
            rings = _trace_rings(rr, cc)
            for ri, ring in enumerate(rings):
                r_arr = np.array([p[0] for p in ring], np.float64)
                c_arr = np.array([p[1] for p in ring], np.float64)
                xs = xmin + c_arr * res
                ys = ymax - r_arr * res
                area = 0.5 * float(np.sum(xs[:-1] * ys[1:]
                                          - xs[1:] * ys[:-1]))
                frames.append(pd.DataFrame({
                    "line_id": np.full(len(xs), lid, np.int64),
                    "ring_idx": np.full(len(xs), ri, np.int64),
                    "vtx_idx": np.arange(len(xs), dtype=np.int64),
                    "x_micro": np.floor(xs * 1e6 + 0.5).astype(np.int64),
                    "y_micro": np.floor(ys * 1e6 + 0.5).astype(np.int64),
                    "is_hole": np.full(len(xs), int(area > 0.0), np.int64),
                }))
        if not frames:
            return pd.DataFrame({k: np.empty(0, np.int64) for k in
                                 ("line_id", "ring_idx", "vtx_idx",
                                  "x_micro", "y_micro", "is_hole")})
        return pd.concat(frames, ignore_index=True)

    return ids.map_batches(per_line, batch_format="numpy")
