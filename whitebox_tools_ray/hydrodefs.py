"""Shared D8-graph SQL fragments (cycle-free: imported by several pipelines
modules AND shipped inside worker closures — must never import
pipelines.queries*). Mirrors the construction in pipelines/queries_raster;
both modules share THESE definitions so the oracles cannot drift."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .layers import GRID1
from .rasterdefs import _CELLS_CTE

# D8 neighbour order (d8_pointer.rs:252-253): NE,E,SE,S,SW,W,NW,N
_D8_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_D8_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def _d8_len(i: int) -> float:
    diag = float(np.sqrt(GRID1.res_x * GRID1.res_x + GRID1.res_y * GRID1.res_y))
    return [diag, GRID1.res_x, diag, GRID1.res_y, diag, GRID1.res_x, diag, GRID1.res_y][i]


_D8_SLOPES = " UNION ALL ".join(
    f"SELECT a.cell_id, {i} AS i, CAST({1 << i} AS BIGINT) AS code, "
    f"(a.v - b.v) / {_d8_len(i)!r} AS slope "
    f"FROM cells a JOIN cells b ON b.r = a.r + ({_D8_DY[i]}) AND b.c = a.c + ({_D8_DX[i]})"
    for i in range(8)
)

# D8 code -> down-cell offset, rendered into SQL (graph CTE shared by the
# iterative flow oracles)
_D8_CASE = "CASE b.code " + " ".join(
    f"WHEN {1 << i} THEN c.cell_id + ({_D8_DY[i] * GRID1.cols + _D8_DX[i]})"
    for i in range(8)
) + " ELSE -1 END"

# graph-from-`cells` tail (any CTE named cells(cell_id, r, c, v) works —
# flow_accum_full_workflow points it at the FILLED surface)
_GRAPH_TAIL = f"""slopes AS ({_D8_SLOPES}),
    best AS MATERIALIZED (
      SELECT cell_id, code FROM slopes WHERE slope > 0
      QUALIFY row_number() OVER (PARTITION BY cell_id ORDER BY slope DESC, i ASC) = 1
    ),
    graph AS MATERIALIZED (
      SELECT c.cell_id, CAST({_D8_CASE} AS BIGINT) AS down_id
      FROM cells c LEFT JOIN best b ON b.cell_id = c.cell_id
    )"""

_GRAPH_CTES = f"""
    {_CELLS_CTE},
    {_GRAPH_TAIL}
"""

# fixed-point D8 hop units (stages/pregel._hop_units): 2^20 per cardinal
# step, round(sqrt(2) * 2^20) per diagonal
_HOP_STRAIGHT = 1 << 20
_HOP_DIAG = int(np.floor(1.4142135623730951 * (1 << 20) + 0.5))

STREAM_ACC_T = 5  # stream cells: D8 accumulation >= threshold


def _hop_sql(a: str, b: str) -> str:
    return (f"CASE WHEN ({a} // {GRID1.cols}) <> ({b} // {GRID1.cols}) "
            f"AND ({a} % {GRID1.cols}) <> ({b} % {GRID1.cols}) "
            f"THEN {_HOP_DIAG} ELSE {_HOP_STRAIGHT} END")


_WALK_UNITS_CTE = f"""
    walku(start, cur, units) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM graph
      UNION ALL
      SELECT w.start, g.down_id,
             w.units + {_hop_sql('w.cur', 'g.down_id')}
      FROM walku w JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
"""


# ---------------------------------------------------------------------------
# Shared stream-network helpers (moved here from pipelines/queries_hydro2 so
# downstream query modules import them from THIS leaf module; importing them
# from an earlier query module re-entered the pipelines.queries import cycle
# when a worker entry-imported that module to deserialize a closure).
# ---------------------------------------------------------------------------
def _d8_pointer(sf_dir: str):
    # lazy: queries_raster must not be imported at module scope (cycle via
    # pipelines.queries when a worker deserializes a closure from here)
    from .pipelines.queries_raster import d8_pointer

    return d8_pointer(sf_dir)


# acc + stream mask CTEs (shared by the to-stream family; same construction
# as the stream_link_id oracle)
_STREAM_CTES = f"""
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    acc AS MATERIALIZED (
      SELECT g.cell_id, 1 + COALESCE(p.n, 0) AS acc
      FROM graph g LEFT JOIN (SELECT cur, COUNT(*) AS n FROM walk GROUP BY cur) p
        ON p.cur = g.cell_id
    ),
    stream AS MATERIALIZED (SELECT cell_id FROM acc WHERE acc >= {STREAM_ACC_T}),
    -- pointer table CUT at stream cells, exactly like the Python side; a
    -- NOT EXISTS inside the recursive term is unreliable in DuckDB 1.0 (the
    -- stop condition silently drops under some outer-query plans)
    graph2 AS MATERIALIZED (
      SELECT g.cell_id, CASE WHEN s.cell_id IS NOT NULL THEN CAST(-1 AS BIGINT)
                             ELSE g.down_id END AS down_id
      FROM graph g LEFT JOIN stream s ON s.cell_id = g.cell_id
    ),
    walk2(start, cur, units) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM graph2
      UNION ALL
      SELECT w.start, g.down_id,
             w.units + CASE WHEN (w.cur // {GRID1.cols}) <> (g.down_id // {GRID1.cols})
                    AND (w.cur % {GRID1.cols}) <> (g.down_id % {GRID1.cols})
                    THEN {int(np.floor(1.4142135623730951 * (1 << 20) + 0.5))}
                    ELSE {1 << 20} END
      FROM walk2 w JOIN graph2 g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    )
"""


def _stream_cut_graphs(sf_dir: str):
    """(modified down_ds, stream ids ref): the D8 pointer table with stream
    cells (accumulation >= STREAM_ACC_T) converted to terminals — the shared
    prep for the to-stream distance/elevation family."""
    from .stages.flow import down_ds_from_pointer
    from .stages.pregel import flow_accumulation_pregel

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    acc = flow_accumulation_pregel(dds, GRID1)
    scells = acc.map_batches(
        lambda df: pd.DataFrame({"k": df.loc[df["acc"] >= STREAM_ACC_T, "cell_id"]
                                 .to_numpy(np.int64)}),
        batch_format="pandas").to_pandas()
    stream_set = np.sort(scells["k"].to_numpy(np.int64))
    sref = ray.put(stream_set)

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        from .stages.spatial_join import _cached_get

        ss = _cached_get(sref)
        cid = df["cell_id"].to_numpy(np.int64)
        if len(ss):
            pos = np.minimum(np.searchsorted(ss, cid), len(ss) - 1)
            is_stream = ss[pos] == cid
        else:
            is_stream = np.zeros(len(cid), bool)
        return pd.DataFrame({
            "cell_id": cid,
            "down_id": np.where(is_stream, np.int64(-1),
                                df["down_id"].to_numpy(np.int64)),
            "tile": df["tile"].to_numpy(np.int64)})

    return dds.map_batches(cut, batch_format="pandas"), sref


def _dest_in_stream(dest, sref):
    """(cell_id, dest) rows of a basins result whose chain ends at a stream
    cell (others drain to a plain outlet -> reference nodata)."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        from .stages.spatial_join import _cached_get

        ss = _cached_get(sref)
        d = df["basin"].to_numpy(np.int64)
        if len(ss):
            pos = np.minimum(np.searchsorted(ss, d), len(ss) - 1)
            ok = ss[pos] == d
        else:
            ok = np.zeros(len(d), bool)
        return pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64)[ok],
                             "dest": d[ok]})

    return dest.map_batches(keep, batch_format="pandas")


_LINK_CTES = f"""
    sgraph AS MATERIALIZED (
      SELECT g.cell_id, g.down_id FROM graph g
      JOIN stream s ON s.cell_id = g.cell_id
    ),
    s_indeg AS MATERIALIZED (
      SELECT s.cell_id, COUNT(p.cell_id) AS n
      FROM stream s LEFT JOIN sgraph p
        ON p.down_id = s.cell_id
      GROUP BY s.cell_id
    ),
    lgraph AS MATERIALIZED (
      SELECT sg.cell_id,
             CASE WHEN t.cell_id IS NOT NULL AND ti.n < 2 THEN sg.down_id
                  ELSE -1 END AS nxt
      FROM sgraph sg
      LEFT JOIN stream t ON t.cell_id = sg.down_id
      LEFT JOIN s_indeg ti ON ti.cell_id = sg.down_id
    ),
    chase(start, cur) AS (
      SELECT cell_id, cell_id FROM lgraph
      UNION ALL
      SELECT c.start, l.nxt FROM chase c
      JOIN lgraph l ON l.cell_id = c.cur WHERE l.nxt >= 0
    ),
    link AS MATERIALIZED (
      SELECT c.start AS cell_id, c.cur AS link_id
      FROM chase c JOIN lgraph l ON l.cell_id = c.cur
      WHERE l.nxt < 0
    )
"""


# ---------------------------------------------------------------------------
# Pour-point fixture (shared at decorator time by queries_hydro2,
# queries_hydro5 and queries_terrain4 — leaf-resident so worker entry
# imports cannot hit a partially-initialized pipelines module)
# ---------------------------------------------------------------------------
from .pipelines.sqlgen import add64, sm64  # noqa: E402

_POUR_SEED = 909090
N_POUR = 12
SNAP_RADIUS = 3


def _pour_cells() -> np.ndarray:
    """Deterministic raw pour points: pseudo-random interior cells."""
    from .sources.synthetic import splitmix64

    h = splitmix64(np.arange(N_POUR, dtype=np.uint64) + np.uint64(_POUR_SEED))
    r = 1 + (h % np.uint64(GRID1.rows - 2)).astype(np.int64)
    c = 1 + (splitmix64(h) % np.uint64(GRID1.cols - 2)).astype(np.int64)
    return r * GRID1.cols + c


_POUR_CTES = f"""
    pour_h AS MATERIALIZED (
      SELECT CAST(t.i AS BIGINT) AS pour_id,
             {sm64(add64('CAST(t.i AS UBIGINT)', str(_POUR_SEED)))} AS h
      FROM range({N_POUR}) t(i)
    ),
    pour AS MATERIALIZED (
      SELECT pour_id,
             (1 + CAST(h % {GRID1.rows - 2} AS BIGINT)) * {GRID1.cols}
             + (1 + CAST({sm64('h')} % {GRID1.cols - 2} AS BIGINT)) AS cell_id
      FROM pour_h
    ),
    acc2 AS MATERIALIZED (
      SELECT g.cell_id, 1 + COALESCE(p.n, 0) AS acc
      FROM graph g LEFT JOIN (SELECT cur, COUNT(*) AS n FROM walk GROUP BY cur) p
        ON p.cur = g.cell_id
    ),
    snapped AS MATERIALIZED (
      SELECT pour_id, cand_cell AS snap_cell FROM (
        SELECT p.pour_id, c.cell_id AS cand_cell, a.acc,
               row_number() OVER (PARTITION BY p.pour_id
                                  ORDER BY a.acc DESC, c.cell_id ASC) AS rn
        FROM pour p
        JOIN cells c ON abs(c.r - (p.cell_id // {GRID1.cols})) <= {SNAP_RADIUS}
                    AND abs(c.c - (p.cell_id % {GRID1.cols})) <= {SNAP_RADIUS}
        JOIN acc2 a ON a.cell_id = c.cell_id
      ) WHERE rn = 1
    )
"""


# ---------------------------------------------------------------------------
# Priority-flood fill as SQL (FillDepressions, hydro_analysis/
# fill_depressions.rs semantics; Barnes et al. 2014 fixed point):
#   W = max(z, min over 8-neighbours W),  W = z on the grid border,
# iterated from W0 = +inf by Jacobi relaxation. The fixed registered dems
# all converge in <= 180 steps (measured; equality with an independent
# global heapq priority flood is asserted per-dem in tests/test_fill_sql.py,
# so a too-small step budget can never ship silently). The 8-neighbour min
# is separable: one horizontal min3/min2 window layer, then a vertical
# LAG/LEAD(cols) layer — 4 window evaluations per step instead of 8.
# ---------------------------------------------------------------------------
_FILL_BIG = 1 << 40


def _fill_step_select(src: str, zs: list[str]) -> str:
    """One Jacobi step over every w-lane in `zs` (list of (wcol, zcol))."""
    cols, n = GRID1.cols, GRID1.rows * GRID1.cols
    border = (f"(cid < {cols} OR cid >= {n - cols} OR cid % {cols} = 0 "
              f"OR cid % {cols} = {cols - 1})")
    keep = "iter, cid, " + ", ".join(z for _, z in zs)
    h_terms, v_terms = [], []
    for w, z in zs:
        lft = (f"COALESCE(CASE WHEN (cid % {cols}) > 0 THEN LAG({w}, 1) "
               f"OVER (ORDER BY cid) END, {_FILL_BIG})")
        rgt = (f"COALESCE(CASE WHEN (cid % {cols}) < {cols - 1} THEN "
               f"LEAD({w}, 1) OVER (ORDER BY cid) END, {_FILL_BIG})")
        h_terms.append(f"LEAST({lft}, {w}, {rgt}) AS h3_{w}, "
                       f"LEAST({lft}, {rgt}) AS h2_{w}")
        up = f"COALESCE(LAG(h3_{w}, {cols}) OVER (ORDER BY cid), {_FILL_BIG})"
        dn = f"COALESCE(LEAD(h3_{w}, {cols}) OVER (ORDER BY cid), {_FILL_BIG})"
        v_terms.append(f"CASE WHEN {border} THEN {z} ELSE "
                       f"GREATEST({z}, LEAST({up}, h2_{w}, {dn})) END AS {w}")
    l1 = f"SELECT {keep}, " + ", ".join(h_terms) + f" FROM ({src})"
    return f"SELECT {keep}, " + ", ".join(v_terms) + f" FROM ({l1})"


def _fill_cte(dem_exprs, outer: int, steps: int = 4, name: str = "fillw",
              init_join: str = "") -> str:
    """CTE text computing the filled surface(s) for one or more integer dem
    expressions over `cid` (BIGINT cell id, row-major over GRID1). Single
    dem -> columns (cell_id, z, fill); a list of k dems -> (cell_id, z0,
    fill0, ..). `outer*steps` Jacobi steps run lock-step for every lane.
    `init_join` is appended to the init scan's FROM clause so a dem may
    reference joined CTE columns (fill_burn joins the burned-cell set).
    Requires WITH RECURSIVE in the enclosing query."""
    if isinstance(dem_exprs, str):
        dem_exprs = [dem_exprs]
        single = True
    else:
        single = False
    cols, n = GRID1.cols, GRID1.rows * GRID1.cols
    border0 = (f"(t.i < {cols} OR t.i >= {n - cols} OR t.i % {cols} = 0 "
               f"OR t.i % {cols} = {cols - 1})")
    zs = [(f"w{k}", f"z{k}") for k in range(len(dem_exprs))]
    init_cols = []
    for k, expr in enumerate(dem_exprs):
        demi = expr.replace("cid", "CAST(t.i AS BIGINT)")
        init_cols.append(f"({demi}) AS z{k}")
        init_cols.append(f"CASE WHEN {border0} THEN ({demi}) "
                         f"ELSE {_FILL_BIG} END AS w{k}")
    src = (f"SELECT iter, cid, "
           + ", ".join(f"{z}, {w}" for w, z in zs)
           + f" FROM relax_{name} WHERE iter < {outer}")
    for _ in range(steps):
        src = _fill_step_select(src, zs)
    decl = ", ".join(f"{z}, {w}" for w, z in zs)
    out = ("z0 AS z, w0 AS fill" if single else
           ", ".join(f"z{k}, w{k} AS fill{k}" for k in range(len(dem_exprs))))
    return f"""relax_{name}(iter, cid, {decl}) AS (
      SELECT 0, CAST(t.i AS BIGINT), {", ".join(init_cols)}
      FROM range({n}) t(i){init_join}
      UNION ALL
      SELECT iter+1, cid, {decl} FROM ({src}) s
    ),
    {name} AS MATERIALIZED (
      SELECT cid AS cell_id, {out} FROM relax_{name}
      WHERE iter = {outer}
    )"""


# ---------------------------------------------------------------------------
# CostDistance min-plus twin of the fill relaxation (4-neighbour): D = 0 at
# the sources, D = min(D, min_nbr(D(n) + cost(n)) + cost) elsewhere,
# iterated from +inf. Shared by cost_distance and cost_pathway (the fixed
# synthetic cost surface converges at 34 steps — tests/test_fill_sql.py
# asserts Dijkstra equality, so a short budget cannot ship silently).
# ---------------------------------------------------------------------------
_COST_SRC_SQL = "(cid*7919)%509 = 0"
_COST_EXPR = "(1 + (cid*31)%7)"


def _cost_cte(outer: int = 12, steps: int = 4, name: str = "costw") -> str:
    cols, n = GRID1.cols, GRID1.rows * GRID1.cols
    up = f"COALESCE(LAG(e, {cols}) OVER (ORDER BY cid), {_FILL_BIG})"
    dn = f"COALESCE(LEAD(e, {cols}) OVER (ORDER BY cid), {_FILL_BIG})"
    lf = (f"COALESCE(CASE WHEN (cid % {cols}) > 0 THEN LAG(e, 1) "
          f"OVER (ORDER BY cid) END, {_FILL_BIG})")
    rt = (f"COALESCE(CASE WHEN (cid % {cols}) < {cols - 1} THEN LEAD(e, 1) "
          f"OVER (ORDER BY cid) END, {_FILL_BIG})")
    src = f"SELECT iter, cid, ct, w FROM relax_{name} WHERE iter < {outer}"
    for _ in range(steps):
        l1 = f"SELECT iter, cid, ct, w, w + ct AS e FROM ({src})"
        src = (f"SELECT iter, cid, ct, CASE WHEN {_COST_SRC_SQL} THEN 0 "
               f"ELSE LEAST(w, LEAST({up}, {dn}, {lf}, {rt}) + ct) END AS w "
               f"FROM ({l1})")
    init_ct = _COST_EXPR.replace("cid", "CAST(t.i AS BIGINT)")
    init_src = _COST_SRC_SQL.replace("cid", "t.i")
    return f"""relax_{name}(iter, cid, ct, w) AS (
      SELECT 0, CAST(t.i AS BIGINT), {init_ct},
             CASE WHEN {init_src} THEN 0 ELSE {_FILL_BIG} END
      FROM range({n}) t(i)
      UNION ALL
      SELECT iter+1, cid, ct, w FROM ({src}) s
    ),
    {name} AS MATERIALIZED (
      SELECT cid AS cell_id, ct, w AS cost_dist2 FROM relax_{name}
      WHERE iter = {outer}
    )"""


# the two dems shared by fill-family entries across modules (leaf-resident:
# queries_raster and queries_hydro8 both consume the planted-pit dem at
# decoration time)
_FILL_DEM_VALUE = "(cid*1000003)%1000"  # == rasterdefs._value_fn as int64
_FILL_DEM_PITS = (
    f"CASE WHEN (cid//{GRID1.cols} > 40 AND cid//{GRID1.cols} < 50 "
    f"AND cid%{GRID1.cols} > 60 AND cid%{GRID1.cols} < 75) "
    f"OR (cid//{GRID1.cols} > 100 AND cid//{GRID1.cols} < 115 "
    f"AND cid%{GRID1.cols} > 200 AND cid%{GRID1.cols} < 220) "
    f"THEN 5 ELSE 100 + (cid*7919)%400 END"
)


def _strahler_levels(kmax: int = 12, graph: str = 'graph') -> tuple[str, str]:
    """(level CTE text, per-cell order expression for alias `{cell}`): the
    level-set Strahler construction (order >= k iff downstream-or-equal of a
    two-children-at-(k-1) generator), emitted without the final SELECT so
    callers can join the order onto other walks. Lives in this leaf module
    because both queries_hydro3 and queries_raster consume it at decoration
    time (importing it cross-pipeline re-entered the pipelines.queries
    import cycle in fresh workers — CORRECTNESS_r03 avg_upslope_flowpath)."""
    parts = []
    prev = None
    sums = []
    for k in range(2, kmax + 1):
        member = "" if prev is None else f" JOIN {prev} s ON s.cur = p.cell_id"
        parts.append(f"""g{k} AS MATERIALIZED (
      SELECT g.cell_id FROM {graph} g
      JOIN {graph} p ON p.down_id = g.cell_id{member}
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s{k}(cur) AS (
      SELECT cell_id FROM g{k}
      UNION
      SELECT g.down_id FROM s{k} w JOIN {graph} g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    )""")
        prev = f"s{k}"
        sums.append(f"(SELECT COUNT(*) FROM s{k} WHERE s{k}.cur = {{cell}})")
    return ",\n    ".join(parts), "1 + " + " + ".join(sums)


_SB_LEVELS, _SB_ORD = _strahler_levels()
