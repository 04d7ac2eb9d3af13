"""Terrain sweep #9: VisibilityIndex (sampled viewpoints) and
ContoursFromPoints.

VisibilityIndex uses the viewshed's integer DDA line-of-sight kernel
(cross-multiplied slope comparisons — fully integer, bit-exact SQL) over
a deterministic set of 4 sampled viewpoints; vi(cell) = # viewpoints that
see it. The reference evaluates EVERY cell as a viewpoint
(terrain_analysis/visibility_index.rs) — the sampled form is the
documented contract (full O(n^2) evaluation is the same kernel over a
bigger viewpoint table).

ContoursFromPoints (terrain_analysis/contours_from_points.rs) triangulates
the sampled point layer (the construct_vector_tin Delaunay) and emits one
contour segment per (triangle, level) crossing via edge interpolation —
rows-only, independent scalar recomputation in tests/test_terrain9.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _dda_sql, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols

_VPS = ((40, 80), (120, 250), (85, 180), (30, 300))


def _vi_sql() -> str:
    vp_rows = ", ".join(f"({i}, {r}, {c})" for i, (r, c) in enumerate(_VPS))
    return f"""
    WITH {_CELLS_CTE},
    vps(vid, vr, vc) AS (VALUES {vp_rows}),
    vpz AS (SELECT v.vid, v.vr, v.vc, c.v AS zv
            FROM vps v JOIN cells c ON c.r = v.vr AND c.c = v.vc),
    tgt AS (
      SELECT p.vid, p.vr, p.vc, p.zv, c.cell_id, c.r, c.c, c.v,
             GREATEST(abs(c.r - p.vr), abs(c.c - p.vc)) AS kk
      FROM vpz p JOIN cells c ON TRUE
    ),
    los AS (
      SELECT t.vid, t.cell_id, t.v, t.zv, t.kk, s.i AS k,
             t.vr + {_dda_sql('s.i', '(t.r - t.vr)', 't.kk')} AS rk,
             t.vc + {_dda_sql('s.i', '(t.c - t.vc)', 't.kk')} AS ck
      FROM tgt t JOIN range(1, {max(_ROWS, _COLS)}) s(i) ON s.i < t.kk
      WHERE t.kk >= 2
    ),
    blocked AS (
      SELECT l.vid, l.cell_id,
             MAX(CASE WHEN (b.v - l.zv) * l.kk >= (l.v - l.zv) * l.k
                      THEN 1 ELSE 0 END) AS blk
      FROM los l JOIN cells b ON b.r = l.rk AND b.c = l.ck
      GROUP BY l.vid, l.cell_id
    ),
    vis AS (
      SELECT t.vid, t.cell_id,
             CASE WHEN t.kk <= 1 THEN 1
                  WHEN b.blk = 1 THEN 0 ELSE 1 END AS visible
      FROM tgt t LEFT JOIN blocked b
        ON b.vid = t.vid AND b.cell_id = t.cell_id
    )
    SELECT cell_id, CAST(SUM(visible) AS BIGINT) AS vi
    FROM vis GROUP BY cell_id
    """


@query("visibility_index", _vi_sql())
def visibility_index(sf_dir: str):
    from ..relational import partial_agg
    from ..stages.raster import synth_raster_tiles

    tiles = synth_raster_tiles(GRID1, _value_fn)
    vps = [(vr, vc, int(_value_fn(np.array([vr * _COLS + vc]))[0]))
           for vr, vc in _VPS]

    def los(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = (rr * _COLS + cc).ravel()
            zt = np.asarray(t.data, np.float64).astype(np.int64)
            vi = np.zeros(len(cid), np.int64)
            for vr, vc, zv in vps:
                dr = rr.ravel() - vr
                dc = cc.ravel() - vc
                K = np.maximum(np.abs(dr), np.abs(dc))
                blocked = np.zeros(len(cid), bool)
                m = K >= 2
                num = (zt - zv)
                for k in range(1, int(K.max()) if len(K) else 0):
                    sel = m & (k < K)
                    if not sel.any():
                        continue
                    Ks = K[sel]
                    rk = vr + np.sign(dr[sel]) * (
                        (2 * k * np.abs(dr[sel]) + Ks) // (2 * Ks))
                    ck = vc + np.sign(dc[sel]) * (
                        (2 * k * np.abs(dc[sel]) + Ks) // (2 * Ks))
                    zk = _value_fn(rk * _COLS + ck).astype(np.int64)
                    blocked[sel] |= (zk - zv) * Ks >= num[sel] * k
                vis = np.where(K <= 1, 1, (~blocked).astype(np.int64))
                vi += vis
            frames.append(pd.DataFrame({"cell_id": cid, "vi": vi}))
        return pd.concat(frames, ignore_index=True)

    out = tiles.map_batches(los, batch_format="pandas")
    return partial_agg(out, ["cell_id"], [("vi", "max", "vi")])


# --------------------------------------------------------------------------
# ContoursFromPoints: Delaunay TIN over the sampled point layer; each
# (triangle, level) crossing contributes one segment with endpoints
# linearly interpolated on the two crossed edges.
# --------------------------------------------------------------------------
_LEVELS = (20.0, 40.0, 60.0, 80.0)


def contour_segments(xy: np.ndarray, z: np.ndarray, tris: np.ndarray,
                     levels=_LEVELS) -> pd.DataFrame:
    """Shared kernel (pipeline + test): one row per (triangle, level) with
    exactly two crossed edges; endpoint order = ascending crossed-edge
    index; strictly-equal vertices are treated as above (z >= level)."""
    rows = []
    for ti, (a, b, c) in enumerate(tris.tolist()):
        vz = [z[a], z[b], z[c]]
        vv = [xy[a], xy[b], xy[c]]
        for lv in levels:
            above = [v >= lv for v in vz]
            if all(above) or not any(above):
                continue
            pts = []
            for e, (i, j) in enumerate(((0, 1), (1, 2), (2, 0))):
                if above[i] != above[j]:
                    tpar = (lv - vz[i]) / (vz[j] - vz[i])
                    pts.append((vv[i][0] + tpar * (vv[j][0] - vv[i][0]),
                                vv[i][1] + tpar * (vv[j][1] - vv[i][1])))
            if len(pts) == 2:
                rows.append((ti, lv, pts[0][0], pts[0][1],
                             pts[1][0], pts[1][1]))
    return pd.DataFrame(rows, columns=["tri", "level", "x0", "y0",
                                       "x1", "y1"])


@query("contours_from_points")
def contours_from_points(sf_dir: str):
    """Triangles from the EXACT distributed triangulation
    (stages/tin.tiled_delaunay), identified by canonical ascending vertex
    seq triples; vertex values arrive via a distributed join against the
    point layer (no driver point-set pull), and each triangle's level
    crossings are computed in canonical vertex order. Output (a, b, c,
    level, x0, y0, x1, y1); independent scalar oracle in
    tests/test_terrain9.py."""
    from ..sources.tables import read_points
    from ..stages.tin import tiled_delaunay

    pts_ds = read_points(sf_dir).map_batches(
        lambda df: df.loc[df["event_id"] % 23 == 0,
                          ["event_id", "x", "y", "value"]],
        batch_format="pandas")
    tris = tiled_delaunay(pts_ds)  # Dataset[a, b, c], a < b < c

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        t = df[["a", "b", "c"]].to_numpy(np.int64)
        return pd.DataFrame({
            "a": np.repeat(t[:, 0], 3), "b": np.repeat(t[:, 1], 3),
            "c": np.repeat(t[:, 2], 3), "event_id": t.ravel()})

    verts = tris.map_batches(explode, batch_format="pandas")
    j = verts.join(pts_ds, join_type="inner", num_partitions=8,
                   on=("event_id",))

    # co-locate each triangle's 3 vertex rows by a hash of its triple
    # (collisions only co-bucket triangles — correctness is key-exact),
    # then run ONE vectorized crossing kernel per bucket: no per-triangle
    # group dispatch, no driver state.
    M1, M2, M3 = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xBF58476D1CE4E5B9),
                  np.uint64(0x94D049BB133111EB))

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(np.int64).astype(np.uint64)
        b = df["b"].to_numpy(np.int64).astype(np.uint64)
        c = df["c"].to_numpy(np.int64).astype(np.uint64)
        h = (a * M1 + b * M2 + c * M3) >> np.uint64(33)
        return df.assign(__part=(h % np.uint64(32)).astype(np.int64))

    def bucket_segments(g: pd.DataFrame) -> pd.DataFrame:
        # within a triple, event_id order == (a, b, c) vertex order
        g = g.sort_values(["a", "b", "c", "event_id"], kind="mergesort")
        n = len(g) // 3
        xy = g[["x", "y"]].to_numpy(np.float64).reshape(n, 3, 2)
        z = g["value"].to_numpy(np.float64).reshape(n, 3)
        tri = g[["a", "b", "c"]].to_numpy(np.int64)[::3]
        frames = []
        for lv in _LEVELS:
            ab = z >= lv
            cross = ab.any(axis=1) & ~ab.all(axis=1)
            if not cross.any():
                continue
            zc, xc, abc = z[cross], xy[cross], ab[cross]
            m = len(zc)
            ex = np.zeros((m, 3)), np.zeros((m, 3))
            hit = np.zeros((m, 3), bool)
            for e, (i, jj) in enumerate(((0, 1), (1, 2), (2, 0))):
                sel = abc[:, i] != abc[:, jj]
                t = (lv - zc[sel, i]) / (zc[sel, jj] - zc[sel, i])
                ex[0][sel, e] = xc[sel, i, 0] + t * (xc[sel, jj, 0] - xc[sel, i, 0])
                ex[1][sel, e] = xc[sel, i, 1] + t * (xc[sel, jj, 1] - xc[sel, i, 1])
                hit[sel, e] = True
            # a mixed triangle crosses exactly 2 of its 3 edges
            assert (hit.sum(axis=1) == 2).all()
            idx = np.argsort(~hit, axis=1, kind="stable")[:, :2]
            px = np.take_along_axis(ex[0], idx, axis=1)
            py = np.take_along_axis(ex[1], idx, axis=1)
            tc = tri[cross]
            frames.append(pd.DataFrame({
                "a": tc[:, 0], "b": tc[:, 1], "c": tc[:, 2],
                "level": np.float64(lv), "x0": px[:, 0], "y0": py[:, 0],
                "x1": px[:, 1], "y1": py[:, 1]}))
        if not frames:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64),
                                 "level": pd.Series([], dtype=np.float64),
                                 "x0": pd.Series([], dtype=np.float64),
                                 "y0": pd.Series([], dtype=np.float64),
                                 "x1": pd.Series([], dtype=np.float64),
                                 "y1": pd.Series([], dtype=np.float64)})
        return pd.concat(frames, ignore_index=True)

    return j.map_batches(bucketize, batch_format="pandas") \
        .groupby("__part").map_groups(
            lambda g: bucket_segments(g.drop(columns=["__part"])),
            batch_format="pandas")
