"""gis_analysis vector sweep #3: ExtendVectorLines, MergeLineSegments,
SnapEndnodes, ReclassFromFile, ConstructVectorTin, CostPathway.

Fixtures are the deterministic splitmix64 polylines of queries_data3
(integer vertices), split into segments where the tool works on segment
features. Float contracts: line extension uses the libm-free form
dx/len with one correctly-rounded sqrt (cos(atan2(dy,dx)) == dx/hypot
mathematically; the reference's atan2+cos route drifts cross-library,
the division route is IEEE-exact on both engines). Endpoint jitter is
dyadic (k/2048) so squared distances are exact and comparisons
deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hydrodefs import _cost_cte
from ..layers import GRID1
from ..rasterdefs import _value_fn
from .queries import query
from ..linedefs import _L2P_K, _L2P_N, _L2P_SEED
from .sqlgen import sm64

_EXT_DIST = 5.0


def _l2p_vertices_cte() -> str:
    h = sm64(f"CAST(t.i AS UBIGINT) + {_L2P_SEED}")
    return f"""
    vh AS MATERIALIZED (
      SELECT CAST(t.i // {_L2P_K} AS BIGINT) AS line_id,
             CAST(t.i % {_L2P_K} AS BIGINT) AS j, {h} AS h
      FROM range({_L2P_N * _L2P_K}) t(i)
    ),
    v AS MATERIALIZED (
      SELECT line_id, j, CAST(h % 1000 AS BIGINT) AS x,
             CAST({sm64('h')} % 1000 AS BIGINT) AS y
      FROM vh
    )"""


def _l2p_vertices(li: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from ..sources.synthetic import splitmix64

    idx = (li[:, None] * _L2P_K
           + np.arange(_L2P_K, dtype=np.int64)[None, :]).astype(np.uint64) \
        + np.uint64(_L2P_SEED)
    h = splitmix64(idx)
    return ((h % np.uint64(1000)).astype(np.int64),
            (splitmix64(h) % np.uint64(1000)).astype(np.int64))


# --------------------------------------------------------------------------
# ExtendVectorLines (gis_analysis/extend_vector_lines.rs:259-300, both
# ends): new endpoints at p0 + d * (p0 - p1)/|p0 - p1| (and symmetric).
# Degenerate zero-length terminal segments are excluded (reference NaN).
# --------------------------------------------------------------------------
@query(
    "extend_vector_lines",
    f"""
    WITH {_l2p_vertices_cte()},
    ends AS (
      SELECT s.line_id,
             s.x AS x1, s.y AS y1, n.x AS x2, n.y AS y2,
             CAST(0 AS BIGINT) AS which
      FROM v s JOIN v n ON n.line_id = s.line_id AND n.j = 1
      WHERE s.j = 0
      UNION ALL
      SELECT s.line_id, s.x, s.y, n.x, n.y, 1
      FROM v s JOIN v n ON n.line_id = s.line_id AND n.j = {_L2P_K - 2}
      WHERE s.j = {_L2P_K - 1}
    )
    SELECT line_id, which,
           CAST(x1 AS DOUBLE) + {_EXT_DIST!r} * (CAST(x1 - x2 AS DOUBLE)
             / sqrt(CAST((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
                         AS DOUBLE))) AS xe,
           CAST(y1 AS DOUBLE) + {_EXT_DIST!r} * (CAST(y1 - y2 AS DOUBLE)
             / sqrt(CAST((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
                         AS DOUBLE))) AS ye
    FROM ends
    WHERE (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) > 0
    """,
)
def extend_vector_lines(sf_dir: str):
    import ray.data

    def gen(batch: dict) -> pd.DataFrame:
        li = np.asarray(batch["id"], np.int64)
        x, y = _l2p_vertices(li)
        rows = []
        for which, (a, b) in enumerate(((0, 1), (_L2P_K - 1, _L2P_K - 2))):
            dx = (x[:, a] - x[:, b]).astype(np.float64)
            dy = (y[:, a] - y[:, b]).astype(np.float64)
            d2 = (x[:, a] - x[:, b]) * (x[:, a] - x[:, b]) \
                + (y[:, a] - y[:, b]) * (y[:, a] - y[:, b])
            keep = d2 > 0
            ln = np.sqrt(d2.astype(np.float64))
            rows.append(pd.DataFrame({
                "line_id": li[keep], "which": np.int64(which),
                "xe": x[:, a][keep].astype(np.float64)
                + _EXT_DIST * (dx[keep] / ln[keep]),
                "ye": y[:, a][keep].astype(np.float64)
                + _EXT_DIST * (dy[keep] / ln[keep])}))
        return pd.concat(rows, ignore_index=True)

    return ray.data.range(_L2P_N, override_num_blocks=4) \
        .map_batches(gen, batch_format="numpy")


# --------------------------------------------------------------------------
# MergeLineSegments (gis_analysis/merge_line_segments.rs): the polylines
# split into their 7 individual segments; segments sharing an endpoint
# coordinate merge into one feature labelled by the smallest segment id —
# connected components over the endpoint-sharing graph (the near-dup
# cluster machinery shape: bounded pair graph, driver union-find; at scale
# a label-propagation groupby on endpoint keys).
# --------------------------------------------------------------------------
@query(
    "merge_line_segments",
    f"""
    WITH RECURSIVE {_l2p_vertices_cte()},
    seg AS (
      SELECT a.line_id * {_L2P_K - 1} + a.j AS seg_id,
             a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
      FROM v a JOIN v b ON b.line_id = a.line_id AND b.j = a.j + 1
      WHERE a.j < {_L2P_K - 1}
    ),
    pts AS (
      SELECT seg_id, xa AS x, ya AS y FROM seg
      UNION ALL SELECT seg_id, xb, yb FROM seg
    ),
    adj AS (
      SELECT DISTINCT a.seg_id AS s1, b.seg_id AS s2
      FROM pts a JOIN pts b ON a.x = b.x AND a.y = b.y
      WHERE a.seg_id <> b.seg_id
    ),
    -- full transitive closure (components are small chains; the bounded
    -- reach set is the price of a label that must cross LARGER ids)
    closure(s, reach) AS (
      SELECT seg_id, seg_id FROM seg
      UNION
      SELECT c.s, a.s2 FROM closure c JOIN adj a ON a.s1 = c.reach
    ),
    lbl AS (SELECT s AS seg_id, MIN(reach) AS chain FROM closure GROUP BY s)
    SELECT chain, COUNT(*) AS n_segments
    FROM lbl GROUP BY chain
    """,
)
def merge_line_segments(sf_dir: str):
    import ray.data

    def gen(batch: dict) -> pd.DataFrame:
        li = np.asarray(batch["id"], np.int64)
        x, y = _l2p_vertices(li)
        rows = []
        for i, l in enumerate(li.tolist()):
            for j in range(_L2P_K - 1):
                rows.append((l * (_L2P_K - 1) + j,
                             x[i, j], y[i, j], x[i, j + 1], y[i, j + 1]))
        return pd.DataFrame(rows, columns=["seg_id", "xa", "ya", "xb", "yb"])

    segs = ray.data.range(_L2P_N, override_num_blocks=4) \
        .map_batches(gen, batch_format="numpy").to_pandas()

    # endpoint-keyed adjacency, driver union-find (pair graph is O(#segs))
    parent: dict[int, int] = {}

    def find(s: int) -> int:
        while parent.setdefault(s, s) != s:
            parent[s] = parent[parent[s]]
            s = parent[s]
        return s

    bykey: dict[tuple[int, int], int] = {}
    for sid, xa, ya, xb, yb in segs.itertuples(index=False):
        for key in ((xa, ya), (xb, yb)):
            if key in bykey:
                ra, rb = find(bykey[key]), find(sid)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            else:
                bykey[key] = sid
    lbl = {s: find(s) for s in segs["seg_id"]}
    out = pd.DataFrame({"seg_id": list(lbl), "chain": list(lbl.values())})
    g = out.groupby("chain").size()
    return pd.DataFrame({"chain": g.index.to_numpy(np.int64),
                         "n_segments": g.to_numpy(np.int64)})


# --------------------------------------------------------------------------
# SnapEndnodes (gis_analysis/snap_endnodes.rs): endpoints within tolerance
# of an endpoint of a LOWER-id segment move onto it. Contract deviation
# from the reference's sequential chained scan: all snaps read ORIGINAL
# coordinates (one parallel pass); target = min (d2, seg, end) —
# deterministic at any parallelism.
# --------------------------------------------------------------------------
_SNAP_N, _SNAP_SEED, _SNAP_TOL2 = 400, 6160, 0.25


@query(
    "snap_endnodes",
    f"""
    WITH snap_h AS MATERIALIZED (
      SELECT t.i, {sm64(f"CAST(t.i AS UBIGINT) + {_SNAP_SEED}")} AS h
      FROM range({_SNAP_N * 2}) t(i)
    ),
    snap_h2 AS MATERIALIZED (
      SELECT i, h, {sm64('h')} AS hy, {sm64(sm64(f"CAST(i AS UBIGINT) + {_SNAP_SEED}"))} AS h2
      FROM snap_h
    ),
    sp AS MATERIALIZED (
      SELECT CAST(i // 2 AS BIGINT) AS seg, CAST(i % 2 AS BIGINT) AS e,
             CAST(h % 200 AS DOUBLE) + CAST(h2 % 2048 AS DOUBLE) / 2048.0 AS x,
             CAST(hy % 200 AS DOUBLE)
             + CAST({sm64('h2')} % 2048 AS DOUBLE) / 2048.0 AS y
      FROM snap_h2
    ),
    cand AS (
      SELECT a.seg, a.e, b.x AS tx, b.y AS ty,
             row_number() OVER (
               PARTITION BY a.seg, a.e
               ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y),
                        b.seg, b.e) AS rn
      FROM sp a JOIN sp b ON b.seg < a.seg
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= {_SNAP_TOL2!r}
    )
    SELECT a.seg, a.e,
           COALESCE(c.tx, a.x) AS x, COALESCE(c.ty, a.y) AS y
    FROM sp a LEFT JOIN cand c ON c.seg = a.seg AND c.e = a.e AND c.rn = 1
    """,
)
def snap_endnodes(sf_dir: str):
    import ray.data

    from ..sources.synthetic import splitmix64

    i = np.arange(_SNAP_N * 2, dtype=np.uint64)
    h = splitmix64(i + np.uint64(_SNAP_SEED))
    hy = splitmix64(h)
    h2 = splitmix64(splitmix64(i + np.uint64(_SNAP_SEED)))
    x = (h % np.uint64(200)).astype(np.float64) \
        + (h2 % np.uint64(2048)).astype(np.float64) / 2048.0
    y = (hy % np.uint64(200)).astype(np.float64) \
        + (splitmix64(h2) % np.uint64(2048)).astype(np.float64) / 2048.0
    seg = (np.arange(_SNAP_N * 2) // 2).astype(np.int64)
    e = (np.arange(_SNAP_N * 2) % 2).astype(np.int64)

    # the endpoint table is metadata-scale; the pairwise pass is chunked
    # numpy (at 100 TB: a cell-binned candidate join, the FRS shape)
    xs, ys = x.copy(), y.copy()
    for k in range(len(x)):
        lower = seg < seg[k]
        if not lower.any():
            continue
        d2 = (x[k] - x[lower]) ** 2 + (y[k] - y[lower]) ** 2
        ok = d2 <= _SNAP_TOL2
        if ok.any():
            cand = np.flatnonzero(lower)[ok]
            order = np.lexsort((e[cand], seg[cand], d2[ok]))
            t = cand[order[0]]
            xs[k], ys[k] = x[t], y[t]
    return ray.data.from_pandas(pd.DataFrame(
        {"seg": seg, "e": e, "x": xs, "y": ys}))


# --------------------------------------------------------------------------
# ReclassFromFile (gis_analysis/reclass_from_file.rs): (new, from, to)
# ranges from a CSV applied to the raster (from <= v < to).
# --------------------------------------------------------------------------
_RECLASS_ROWS = [(10, 0, 250), (20, 250, 500), (30, 500, 750),
                 (40, 750, 1000)]

_RECLASS_CASE = "CASE " + " ".join(
    f"WHEN v >= {lo} AND v < {hi} THEN {new}"
    for new, lo, hi in _RECLASS_ROWS) + " ELSE -1 END"


@query(
    "reclass_from_file",
    f"""
    WITH cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id,
                          ((t.i * 1000003) % 1000) AS v
                   FROM range({GRID1.rows * GRID1.cols}) t(i))
    SELECT cell_id, CAST({_RECLASS_CASE} AS BIGINT) AS reclassed
    FROM cells
    """,
)
def reclass_from_file(sf_dir: str):
    import csv
    import os
    import tempfile

    import ray as _ray

    from ..stages.raster import synth_raster_tiles
    from ..stages.spatial_join import _cached_get

    d = tempfile.mkdtemp(prefix="reclass_", dir="/tmp")
    p = os.path.join(d, "reclass.csv")
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["new", "from", "to"])
        w.writerows(_RECLASS_ROWS)
    with open(p) as f:
        rows = [(int(r["new"]), int(r["from"]), int(r["to"]))
                for r in csv.DictReader(f)]
    ref = _ray.put(rows)

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def remap(df: pd.DataFrame) -> pd.DataFrame:
        tbl = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * GRID1.cols + cc.ravel()
            v = np.asarray(t.data, np.int64)
            out = np.full(len(v), -1, np.int64)
            for new, lo, hi in tbl:
                out = np.where((v >= lo) & (v < hi), new, out)
            frames.append(pd.DataFrame({"cell_id": cid, "reclassed": out}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(remap, batch_format="pandas")


# --------------------------------------------------------------------------
# ConstructVectorTIN (gis_analysis/construct_vector_tin.rs +
# lidar_analysis/lidar_construct_vector_tin.rs): Delaunay triangles over
# the sampled point layer — the two-level EXACT distributed triangulation
# (stages/tin.tiled_delaunay: per-tile circumcentre-owned triangles +
# verified sliver cleanup; equality with the single-task global run in
# tests/test_vector3.py). Rows-only — the Bowyer-Watson kernel's
# empty-circumcircle property is asserted in tests/test_tin.py and
# tests/test_vector3.py.
# --------------------------------------------------------------------------
@query("construct_vector_tin")
def construct_vector_tin(sf_dir: str):
    from ..sources.tables import read_points
    from ..stages.tin import tiled_delaunay

    pts_ds = read_points(sf_dir, extra_cols=()).map_batches(
        lambda df: df.loc[df["event_id"] % 23 == 0, ["event_id", "x", "y"]],
        batch_format="pandas")
    return tiled_delaunay(pts_ds)


# --------------------------------------------------------------------------
# CostPathway (gis_analysis/cost_pathway.rs): least-cost paths from
# destination cells back to the sources over the cost_distance field —
# backlink = the 4-neighbour satisfying cd2(a) + cost(a) + cost(b) ==
# cd2(b) (first in N,S,E,W order), then the path cells are ONE weighted
# accumulation over the backlink pointer graph (the trace_downslope
# composition). SQL oracle: _cost_cte relaxation -> windowed backlink CASE
# in the same neighbour order -> walk from the destination masses; dense
# Dijkstra backtrack oracle also in tests/test_vector3.py.
# --------------------------------------------------------------------------
_CP_COLS = GRID1.cols
_CP_SQL = f"""
    WITH RECURSIVE {_cost_cte()},
    nb AS (
      SELECT cell_id, ct, cost_dist2 AS w,
        COALESCE(LEAD(cost_dist2, {_CP_COLS}) OVER (ORDER BY cell_id),
                 {1 << 50}) AS dnw,
        COALESCE(LAG(cost_dist2, {_CP_COLS}) OVER (ORDER BY cell_id),
                 {1 << 50}) AS upw,
        COALESCE(CASE WHEN (cell_id % {_CP_COLS}) < {_CP_COLS - 1}
                 THEN LEAD(cost_dist2, 1) OVER (ORDER BY cell_id) END,
                 {1 << 50}) AS rtw,
        COALESCE(CASE WHEN (cell_id % {_CP_COLS}) > 0
                 THEN LAG(cost_dist2, 1) OVER (ORDER BY cell_id) END,
                 {1 << 50}) AS lfw
      FROM costw
    ),
    bl AS MATERIALIZED (
      SELECT cell_id,
        CASE
          WHEN dnw + (1 + ((cell_id + {_CP_COLS})*31)%7) + ct = w
            THEN cell_id + {_CP_COLS}
          WHEN upw + (1 + ((cell_id - {_CP_COLS})*31)%7) + ct = w
            THEN cell_id - {_CP_COLS}
          WHEN rtw + (1 + ((cell_id + 1)*31)%7) + ct = w
            THEN cell_id + 1
          WHEN lfw + (1 + ((cell_id - 1)*31)%7) + ct = w
            THEN cell_id - 1
          ELSE -1 END AS down_id
      FROM nb
    ),
    dests AS (SELECT cell_id FROM bl WHERE (cell_id*104729)%1009 = 0),
    walk(start, cur) AS (
      SELECT d.cell_id, b.down_id FROM dests d
      JOIN bl b ON b.cell_id = d.cell_id WHERE b.down_id >= 0
      UNION ALL
      SELECT w.start, b.down_id FROM walk w
      JOIN bl b ON b.cell_id = w.cur WHERE b.down_id >= 0
    ),
    hits AS (
      SELECT cur AS cell_id, COUNT(*) AS m FROM walk GROUP BY cur
    )
    SELECT b.cell_id,
           CAST(CASE WHEN (b.cell_id*104729)%1009 = 0 THEN 1 ELSE 0 END
                + COALESCE(h.m, 0) AS BIGINT) AS n_paths
    FROM bl b LEFT JOIN hits h ON h.cell_id = b.cell_id
    WHERE CASE WHEN (b.cell_id*104729)%1009 = 0 THEN 1 ELSE 0 END
          + COALESCE(h.m, 0) > 0
"""


@query("cost_pathway", _CP_SQL)
def cost_pathway(sf_dir: str):
    from ..stages.flow import tile_of_expr
    from ..stages.pregel import (cost_distance_pregel,
                                 weighted_accumulation_pregel)
    from ..stages.raster import cells_to_tiles, window_exchange

    n = GRID1.rows * GRID1.cols
    cells = np.arange(n, dtype=np.int64)
    sources = cells[(cells * 7919) % 509 == 0]

    def cost_fn(cids: np.ndarray) -> np.ndarray:
        return (1 + (cids.astype(np.int64) * 31) % 7).astype(np.int64)

    cd = cost_distance_pregel(cost_fn, sources, GRID1)
    tiles = cells_to_tiles(cd, GRID1, "cost_dist2")

    def backlink(padded, nr, nc, r0, c0) -> pd.DataFrame:
        z = padded[1:nr + 1, 1:nc + 1]
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cid = rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)
        cost_b = cost_fn(cid.ravel()).reshape(nr, nc)
        down = np.full((nr, nc), -1, np.int64)
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            zn = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            nid = cid + dr * GRID1.cols + dc
            cost_a = cost_fn(nid.ravel()).reshape(nr, nc)
            hit = (down < 0) & ~np.isnan(zn) & ~np.isnan(z) \
                & (zn + cost_a + cost_b == z)
            down = np.where(hit, nid, down)
        return pd.DataFrame({
            "cell_id": cid.ravel(), "down_id": down.ravel(),
            "tile": tile_of_expr(cid.ravel(), GRID1, 64)})

    bl = window_exchange(tiles, GRID1, backlink, k=1)

    def masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": cid, "tile": df["tile"].to_numpy(np.int64),
            "mass": ((cid * 104729) % 1009 == 0).astype(np.int64)})

    acc = weighted_accumulation_pregel(
        bl, bl.map_batches(masses, batch_format="pandas"), GRID1)
    return acc.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[df["acc"] > 0, "cell_id"].to_numpy(np.int64),
            "n_paths": df.loc[df["acc"] > 0, "acc"].to_numpy(np.int64)}),
        batch_format="pandas")
