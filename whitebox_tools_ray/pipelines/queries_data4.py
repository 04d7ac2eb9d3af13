"""Data-tools sweep #4: RasterToVectorLines
(data_tools/raster_to_vector_lines.rs).

The reference traces thin line rasters into polylines with three passes:
neighbour counting, tracing from line ends, then loop tracing
(raster_to_vector_lines.rs:236-360). Its vertex order depends on the
sequential visited-state of the greedy "highest unvisited neighbour" walk,
so the contract here is the canonical, parallelism-invariant
decomposition of the same 8-connected line-cell graph: junction cells
(degree >= 3) cut the graph; every remaining component is a chain or
loop whose vertices are ordered by BFS distance from the component's
canonical seed (the lowest-id endpoint, or the lowest-id cell for loops);
junction cells emit as their own single-vertex records. link_id is the
component's lowest cell key. Same polyline set as the reference up to
vertex direction and junction handling (documented divergence).

Distributed shape: DDA rasterization (shared with vector_lines_to_raster)
-> block-hash co-group builds degrees and the deduped edge list -> the
edge list (O(total line length), the VECTOR-scale side of the data) drives
a driver union-find exactly like stages/clump's border merge -> per-chain
BFS ordering fans back out over a component groupby. Full SQL oracle:
same DDA walk, 8-offset adjacency arms, recursive min-reachable components
and BFS distances.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .queries import query
from .sqlgen import synth_segments_cte

_R2VL_N = 220  # segments in the synthetic thin-line raster
_EO = 512      # encoding offset: key = (cy + 512) * 4096 + (cx + 512)
_BLK = 64


def _enc(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cy + _EO) * 4096 + (cx + _EO)


# DDA snap/walk CTEs — textual twin of vector_lines_to_raster's oracle
# (queries_data2.py; duplicated because pipelines modules must not import
# each other at module scope — worker closure deserialization re-enters the
# import cycle)
_WALK_CTES = f"""
    snap AS (SELECT seg_id,
                    CAST(floor(x0) AS BIGINT) AS cx0, CAST(floor(y0) AS BIGINT) AS cy0,
                    CAST(floor(x1) AS BIGINT) AS cx1, CAST(floor(y1) AS BIGINT) AS cy1
             FROM seg),
    par AS (SELECT seg_id, cx0, cy0, cx1, cy1,
                   GREATEST(ABS(cx1 - cx0), ABS(cy1 - cy0)) AS span,
                   ABS(cx1 - cx0) AS adx, ABS(cy1 - cy0) AS ady,
                   CASE WHEN cx1 >= cx0 THEN 1 ELSE -1 END AS sx,
                   CASE WHEN cy1 >= cy0 THEN 1 ELSE -1 END AS sy
            FROM snap),
    steps AS (SELECT p.*, CAST(g.i AS BIGINT) AS i
              FROM par p JOIN range(0, 20) g(i) ON g.i <= p.span),
    dwalk AS (SELECT seg_id,
        CASE WHEN adx >= ady THEN cx0 + i * sx
             ELSE cx0 + sx * ((2 * i * adx + ady) // (2 * ady)) END AS cx,
        CASE WHEN adx >= ady THEN
             CASE WHEN adx = 0 THEN cy0
                  ELSE cy0 + sy * ((2 * i * ady + adx) // (2 * adx)) END
             ELSE cy0 + i * sy END AS cy
      FROM steps)
"""

_ADJ_ARMS = " UNION ALL ".join(
    f"SELECT a.id AS a, b.id AS b FROM enc a JOIN enc b "
    f"ON b.cx = a.cx + ({dx}) AND b.cy = a.cy + ({dy})"
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0))

_R2VL_SQL = f"""
    WITH RECURSIVE {synth_segments_cte(_R2VL_N)},
    {_WALK_CTES},
    cells AS MATERIALIZED (SELECT DISTINCT cx, cy FROM dwalk),
    enc AS MATERIALIZED (
      SELECT (cy + {_EO}) * 4096 + (cx + {_EO}) AS id, cx, cy FROM cells),
    adj AS MATERIALIZED ({_ADJ_ARMS}),
    deg AS (SELECT a AS id, COUNT(*) AS d FROM adj GROUP BY a),
    junc AS MATERIALIZED (SELECT id FROM deg WHERE d >= 3),
    nonj AS MATERIALIZED (
      SELECT e.id FROM enc e LEFT JOIN junc j ON j.id = e.id
      WHERE j.id IS NULL),
    cut AS MATERIALIZED (
      SELECT c.a, c.b FROM adj c
      JOIN nonj n1 ON n1.id = c.a JOIN nonj n2 ON n2.id = c.b),
    reach(s, cur) AS (
      SELECT id, id FROM nonj
      UNION
      SELECT r.s, c.b FROM reach r JOIN cut c ON c.a = r.cur
    ),
    comp AS MATERIALIZED (SELECT s AS id, MIN(cur) AS comp
                          FROM reach GROUP BY s),
    cutdeg AS (
      SELECT n.id, COALESCE(k.n, 0) AS d2 FROM nonj n
      LEFT JOIN (SELECT a, COUNT(*) AS n FROM cut GROUP BY a) k ON k.a = n.id),
    seed AS MATERIALIZED (
      SELECT c.comp,
             COALESCE(MIN(CASE WHEN d.d2 <= 1 THEN c.id END), MIN(c.id)) AS sd
      FROM comp c JOIN cutdeg d ON d.id = c.id GROUP BY c.comp),
    dist(comp, cur, d) AS (
      SELECT comp, sd, CAST(0 AS BIGINT) FROM seed
      UNION
      SELECT di.comp, c.b, di.d + 1
      FROM dist di JOIN cut c ON c.a = di.cur WHERE di.d < 5000
    ),
    pos AS (SELECT cur AS id, MIN(d) AS pos FROM dist GROUP BY cur)
    SELECT c.id AS cell_key, c.comp AS link_id, p.pos
    FROM comp c JOIN pos p ON p.id = c.id
    UNION ALL
    SELECT j.id, j.id, CAST(0 AS BIGINT) FROM junc j
"""


@query("raster_to_vector_lines", _R2VL_SQL)
def raster_to_vector_lines(sf_dir: str):
    """RasterToVectorLines (data_tools/raster_to_vector_lines.rs:236-400)
    under the canonical junction-cut chain contract (module docstring).
    Output (cell_key, link_id, pos) int64 — one row per polyline vertex,
    ordered by pos within link_id."""
    from ..relational import partial_agg
    from ..stages.lines import synth_segments
    from ..stages.spatial_join import _cached_get

    seg_ds = ray.data.from_pandas(synth_segments(_R2VL_N))

    def walk(df: pd.DataFrame) -> pd.DataFrame:
        cx0 = np.floor(df["x0"].to_numpy()).astype(np.int64)
        cy0 = np.floor(df["y0"].to_numpy()).astype(np.int64)
        cx1 = np.floor(df["x1"].to_numpy()).astype(np.int64)
        cy1 = np.floor(df["y1"].to_numpy()).astype(np.int64)
        adx, ady = np.abs(cx1 - cx0), np.abs(cy1 - cy0)
        sx = np.where(cx1 >= cx0, 1, -1)
        sy = np.where(cy1 >= cy0, 1, -1)
        span = np.maximum(adx, ady)
        frames = []
        for j in range(len(cx0)):
            i = np.arange(span[j] + 1, dtype=np.int64)
            if adx[j] >= ady[j]:
                cx = cx0[j] + i * sx[j]
                cy = (np.full(i.size, cy0[j], np.int64) if adx[j] == 0 else
                      cy0[j] + sy[j] * ((2 * i * ady[j] + adx[j])
                                        // (2 * adx[j])))
            else:
                cy = cy0[j] + i * sy[j]
                cx = cx0[j] + sx[j] * ((2 * i * adx[j] + ady[j])
                                       // (2 * ady[j]))
            frames.append(pd.DataFrame({"cx": cx, "cy": cy,
                                        "one": np.ones(i.size, np.int64)}))
        return pd.concat(frames, ignore_index=True)

    cells = partial_agg(seg_ds.map_batches(walk, batch_format="pandas"),
                        ["cx", "cy"], [("one", "max", "one")])

    # ---- block-hash co-group: degree + deduped edge list -----------------
    def emit(df: pd.DataFrame) -> pd.DataFrame:
        cx = df["cx"].to_numpy(np.int64)
        cy = df["cy"].to_numpy(np.int64)
        outs = []
        for dbx in (-1, 0, 1):
            for dby in (-1, 0, 1):
                outs.append(pd.DataFrame({
                    "cx": cx, "cy": cy,
                    "own": np.int64(1 if (dbx, dby) == (0, 0) else 0),
                    "blk": ((cx + _EO) // _BLK + dbx) * 4096
                    + ((cy + _EO) // _BLK + dby)}))
        return pd.concat(outs, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ids = _enc(g["cx"].to_numpy(np.int64), g["cy"].to_numpy(np.int64))
        have = set(np.unique(ids).tolist())
        own_m = g["own"].to_numpy(np.int64) == 1
        ocx = g["cx"].to_numpy(np.int64)[own_m]
        ocy = g["cy"].to_numpy(np.int64)[own_m]
        oid = _enc(ocx, ocy)
        rows = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                nid = _enc(ocx + dx, ocy + dy)
                ok = np.array([n in have for n in nid.tolist()], bool)
                if ok.any():
                    rows.append(pd.DataFrame({"a": oid[ok], "b": nid[ok]}))
        if not rows:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64)})
        return pd.concat(rows, ignore_index=True)

    # (a, b) directed both ways once each: a's own block emits (a, b)
    edges = cells.map_batches(emit, batch_format="pandas") \
        .groupby("blk").map_groups(merge, batch_format="pandas") \
        .to_pandas()  # O(total line length) — vector-scale, like clump's
    #                  driver border merge (stages/clump.py)

    a = edges["a"].to_numpy(np.int64)
    b = edges["b"].to_numpy(np.int64)
    ids, deg = np.unique(a, return_counts=True)
    degree = dict(zip(ids.tolist(), deg.tolist()))
    junc = {i for i, d in degree.items() if d >= 3}

    # all line cells (including isolated ones with no edges)
    cp = cells.to_pandas()
    all_ids = np.sort(_enc(cp["cx"].to_numpy(np.int64),
                           cp["cy"].to_numpy(np.int64)))

    parent = {int(i): int(i) for i in all_ids if int(i) not in junc}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    adj: dict[int, list[int]] = {}
    for aa, bb in zip(a.tolist(), b.tolist()):
        if aa in junc or bb in junc:
            continue
        adj.setdefault(aa, []).append(bb)
        ra, rb = find(aa), find(bb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    comp = {i: find(i) for i in parent}
    # canonical relabel: component id = min member id
    cmin: dict[int, int] = {}
    for i, r in comp.items():
        cmin[r] = min(cmin.get(r, i), i)
    comp = {i: cmin[r] for i, r in comp.items()}
    seeds: dict[int, int] = {}  # lowest-id endpoint (cut-degree <= 1)
    for i, cmp_ in comp.items():
        if len(adj.get(i, ())) <= 1 and (cmp_ not in seeds or i < seeds[cmp_]):
            seeds[cmp_] = i
    for cmp_ in set(comp.values()):
        seeds.setdefault(cmp_, cmp_)  # loop: lowest member id

    maps_ref = ray.put((comp, seeds, adj))
    rows = pd.DataFrame({"id": list(comp.keys()),
                         "comp": [comp[i] for i in comp]})
    rows_ds = ray.data.from_pandas(rows).repartition(4)

    def order(g: pd.DataFrame) -> pd.DataFrame:
        cmp_, sds, ad = _cached_get(maps_ref)
        root = int(g["comp"].iloc[0])
        seed = sds[root]
        pos = {seed: 0}
        frontier = [seed]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for x in frontier:
                for y in ad.get(x, ()):
                    if y not in pos:
                        pos[y] = d
                        nxt.append(y)
            frontier = nxt
        return pd.DataFrame({
            "cell_key": g["id"].to_numpy(np.int64),
            "link_id": np.full(len(g), root, np.int64),
            "pos": np.array([pos[int(i)] for i in g["id"]], np.int64)})

    chains = rows_ds.groupby("comp").map_groups(order, batch_format="pandas")
    jrows = np.sort(np.fromiter(junc, np.int64)) if junc \
        else np.empty(0, np.int64)
    jds = ray.data.from_pandas(pd.DataFrame({
        "cell_key": jrows, "link_id": jrows,
        "pos": np.zeros(len(jrows), np.int64)}))
    return chains.union(jds)
