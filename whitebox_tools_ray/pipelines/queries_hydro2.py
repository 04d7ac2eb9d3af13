"""Round-3 hydro/stream additions composing the Pregel shard machinery:
MaxUpslopeFlowpath, DownslopeDistanceToStream, ElevationAboveStream,
stream link length. All integer-exact (fixed-point hop units, integer
synthetic surface) with recursive-CTE walk oracles sharing the D8 graph
CTEs of queries_raster."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hydrodefs import (STREAM_ACC_T, _GRAPH_CTES, _GRAPH_TAIL, _LINK_CTES,
                         _STREAM_CTES, _WALK_UNITS_CTE, _d8_pointer,
                         _dest_in_stream, _fill_cte, _stream_cut_graphs)
from ..layers import GRID1
from ..rasterdefs import _value_fn
from .queries import query





@query(
    "max_upslope_flowpath",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE}
    SELECT cur AS cell_id, MAX(units) AS muf_units
    FROM walku GROUP BY cur
    """,
)
def max_upslope_flowpath(sf_dir: str):
    """MaxUpslopeFlowpathLength (hydro_analysis/max_upslope_flowpath.rs):
    longest D8 flowpath draining through each cell, fixed-point units —
    the Strahler-style in-degree topological wave in the (max, +) semiring
    (stages/pregel.max_upslope_pregel); sources report 0."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import max_upslope_pregel

    return max_upslope_pregel(down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)






@query(
    "downslope_distance_to_stream",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES}
    SELECT w.start AS cell_id, CAST(w.units AS BIGINT) AS dist_units
    FROM walk2 w JOIN stream s ON s.cell_id = w.cur
    """,
)
def downslope_distance_to_stream(sf_dir: str):
    """DownslopeDistanceToStream (hydro_analysis/downslope_distance_to_stream
    .rs): D8 path distance to the first stream cell (accumulation >=
    STREAM_ACC_T) downstream; stream cells report 0; cells draining to a
    non-stream outlet are nodata (absent). Composition: accumulation Pregel
    -> cut pointer table at stream cells -> flowpath-length + basins Pregel
    -> keep chains whose terminal is a stream cell."""
    from ..stages.pregel import ShardedGraph

    cut_ds, sref = _stream_cut_graphs(sf_dir)
    with ShardedGraph(cut_ds.materialize(), GRID1) as g:
        # one spawn+load serves both algorithms over the cut graph
        lens = g.flowpath_length()
        keep = _dest_in_stream(g.basins(), sref)
    j = lens.join(keep, join_type="inner", num_partitions=8, on=("cell_id",))
    return j.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "dist_units": df["len_units"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "elevation_above_stream",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES}
    SELECT w.start AS cell_id, CAST(cz.v - sz.v AS BIGINT) AS ediff
    FROM walk2 w JOIN stream s ON s.cell_id = w.cur
    JOIN cells cz ON cz.cell_id = w.start
    JOIN cells sz ON sz.cell_id = w.cur
    """,
)
def elevation_above_stream(sf_dir: str):
    """ElevationAboveStream (hydro_analysis/elevation_above_stream.rs):
    elevation difference to the stream cell each cell drains to (integer
    surface, exact); stream cells report 0, chains ending at non-stream
    outlets are nodata (absent). Shares the cut-graph prep with
    downslope_distance_to_stream."""
    from ..stages.pregel import basins_pregel

    cut_ds, sref = _stream_cut_graphs(sf_dir)
    keep = _dest_in_stream(basins_pregel(cut_ds.materialize(), GRID1), sref)

    def ediff(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        dest = df["dest"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": cid,
            "ediff": _value_fn(cid).astype(np.int64)
            - _value_fn(dest).astype(np.int64)})

    return keep.map_batches(ediff, batch_format="pandas")


# --------------------------------------------------------------------------
# Breach depressions (least-cost) — planted-pit surface
# --------------------------------------------------------------------------

BREACH_MAX_DIST = 16
_PIT_DEPTH = 30 * 256


def _breach_z(cells: np.ndarray) -> np.ndarray:
    """Planted-pit DEM, scaled-integer elevations (x256 fixed point): an L1
    cone (minimum at the grid centre) with pits sunk on a 48-cell lattice —
    each breachable to lower ground within BREACH_MAX_DIST — plus one pit at
    the cone minimum itself, which has NO lower ground anywhere and must
    take the fill fallback."""
    cells = np.asarray(cells, np.int64)
    r = cells // GRID1.cols
    c = cells % GRID1.cols
    base = 4 * (np.abs(r - GRID1.rows // 2) + np.abs(c - GRID1.cols // 2)) + 40
    z = base * 256
    pit = ((r % 48 == 17) & (c % 48 == 29)) | \
          ((r == GRID1.rows // 2) & (c == GRID1.cols // 2))
    return np.where(pit, z - _PIT_DEPTH, z).astype(np.float64)


def _breach_sql() -> str:
    """SQL twin of the breach contract (stages/breach.py): pits = strictly
    lower than all 8 present neighbours; per-pit least-cost search inside
    the max_dist window as a lexicographic (cost, steps) relaxation with
    the key packed as cost*32 + steps (steps <= 16 < 32) and expansion
    gated at steps < max_dist exactly like the Dijkstra; target = minimal
    (key, cell) among strictly-lower cells; prev = minimal-id neighbour
    one relaxation step back; the ramp's negative floor division is
    rewritten positive: zp - ((zp - zt)*i + L - 1) // L. All integers —
    bit-equal to the Ray entry (test_hydro2_breach_sql + oracle parity)."""
    md, pk = BREACH_MAX_DIST, 32
    r2, c2 = GRID1.rows // 2, GRID1.cols // 2
    rows, cols = GRID1.rows, GRID1.cols
    dxy = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
           (1, 1))
    nv = ", ".join(f"({dr},{dc})" for dr, dc in dxy)
    return f"""
    WITH RECURSIVE
    bcells AS MATERIALIZED (
      SELECT CAST(t.i AS BIGINT) AS cid, CAST(t.i // {cols} AS BIGINT) AS r,
             CAST(t.i % {cols} AS BIGINT) AS c,
             CAST((4*(ABS(t.i // {cols} - {r2}) + ABS(t.i % {cols} - {c2}))
                   + 40) * 256
                  - CASE WHEN (t.i // {cols}) % 48 = 17
                              AND (t.i % {cols}) % 48 = 29
                           OR (t.i // {cols}) = {r2}
                              AND (t.i % {cols}) = {c2}
                         THEN {_PIT_DEPTH} ELSE 0 END AS BIGINT) AS z
      FROM range({rows * cols}) t(i)
    ),
    offs(dr, dc) AS (SELECT * FROM (VALUES {nv}) t(a,b)),
    nbrz AS MATERIALIZED (
      SELECT a.cid, COUNT(*) AS npres, MIN(b.z) AS minnb
      FROM bcells a JOIN offs o ON TRUE
      JOIN bcells b ON b.r = a.r + o.dr AND b.c = a.c + o.dc
      GROUP BY a.cid
    ),
    pits AS MATERIALIZED (
      SELECT a.cid AS p, a.r AS prr, a.c AS pcc, a.z AS zp, n.minnb
      FROM bcells a JOIN nbrz n ON n.cid = a.cid
      WHERE n.npres = 8 AND n.minnb > a.z
    ),
    offs9(dr, dc) AS (SELECT * FROM (VALUES (0,0), {nv}) t(a,b)),
    relax(iter, p, v, key) AS (
      SELECT 0, p, p, CAST(0 AS BIGINT) FROM pits
      UNION ALL
      SELECT n.iter, n.p, n.v, MIN(n.key)
      FROM (
        SELECT s.iter + 1 AS iter, s.p, b.cid AS v,
               CASE WHEN o.dr = 0 AND o.dc = 0 THEN s.key
                    ELSE s.key + GREATEST(0, b.z - pt.zp)*{pk} + 1 END AS key
        FROM relax s
        JOIN pits pt ON pt.p = s.p
        JOIN offs9 o ON (o.dr = 0 AND o.dc = 0) OR s.key % {pk} < {md}
        JOIN bcells sb ON sb.cid = s.v
        JOIN bcells b ON b.r = sb.r + o.dr AND b.c = sb.c + o.dc
        WHERE s.iter < {md + 4}
          AND ABS(b.r - pt.prr) <= {md} AND ABS(b.c - pt.pcc) <= {md}
      ) n
      GROUP BY n.iter, n.p, n.v
    ),
    relaxF AS MATERIALIZED (
      SELECT p, v, MIN(key) AS key FROM relax WHERE iter = {md + 4}
      GROUP BY p, v
    ),
    targets AS MATERIALIZED (
      SELECT p, v AS tgt, key AS tkey FROM (
        SELECT r.p, r.v, r.key,
               row_number() OVER (PARTITION BY r.p ORDER BY r.key, r.v)
                   AS rn
        FROM relaxF r JOIN bcells b ON b.cid = r.v
        JOIN pits pt ON pt.p = r.p
        WHERE b.z < pt.zp AND r.v != r.p
      ) WHERE rn = 1
    ),
    prevt AS MATERIALIZED (
      SELECT r.p, r.v, MIN(u.v) AS prev
      FROM relaxF r
      JOIN bcells rb ON rb.cid = r.v
      JOIN pits pt ON pt.p = r.p
      JOIN offs o ON TRUE
      JOIN bcells ub ON ub.r = rb.r + o.dr AND ub.c = rb.c + o.dc
      JOIN relaxF u ON u.p = r.p AND u.v = ub.cid
      WHERE u.key = r.key - GREATEST(0, rb.z - pt.zp)*{pk} - 1
      GROUP BY r.p, r.v
    ),
    walkb(p, cur, j) AS (
      SELECT p, tgt, 0 FROM targets
      UNION ALL
      SELECT w.p, pv.prev, w.j + 1
      FROM walkb w JOIN prevt pv ON pv.p = w.p AND pv.v = w.cur
      WHERE w.cur != w.p
    ),
    carves AS (
      SELECT w.cur AS cell_id,
             pt.zp - ((pt.zp - tb.z) * (t.tkey % {pk} - w.j)
                      + (t.tkey % {pk}) - 1) // (t.tkey % {pk}) AS z
      FROM walkb w
      JOIN targets t ON t.p = w.p
      JOIN pits pt ON pt.p = w.p
      JOIN bcells tb ON tb.cid = t.tgt
      WHERE w.j >= 1 AND w.j <= t.tkey % {pk} - 1
    ),
    mods AS MATERIALIZED (
      SELECT c.cell_id, c.z FROM carves c
      JOIN bcells b ON b.cid = c.cell_id WHERE c.z < b.z
      UNION ALL
      SELECT pt.p, pt.minnb FROM pits pt
      LEFT JOIN targets t ON t.p = pt.p WHERE t.p IS NULL
    )
    SELECT b.cid AS cell_id, COALESCE(m.z, b.z) AS z
    FROM bcells b LEFT JOIN mods m ON m.cell_id = b.cid
    """


@query("breach_depressions", _breach_sql())
def breach_depressions(sf_dir: str):
    """BreachDepressionsLeastCost (hydro_analysis/breach_depressions_least_
    cost.rs): carve least-cost breach paths from every pit to lower ground
    (fixed-point ramp), fill-fallback for unresolvable pits — tile-parallel
    with a max_dist halo (stages/breach.py documents the exact contract and
    the partitioning assumption). SQL oracle: _breach_sql per-pit windowed
    lexicographic relaxation. Full-grid brute-force oracle + drainage
    properties also in tests/test_breach.py. Output: (cell_id, z)."""
    from ..stages.breach import breach_depressions_ds

    return breach_depressions_ds(_breach_z, GRID1, max_dist=BREACH_MAX_DIST)




@query(
    "subbasins",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES}
    SELECT w.start AS cell_id, CAST(l.link_id AS BIGINT) AS subbasin
    FROM walk2 w
    JOIN stream s ON s.cell_id = w.cur
    JOIN link l ON l.cell_id = w.cur
    """,
)
def subbasins(sf_dir: str):
    """Subbasins (hydro_analysis/subbasins.rs): label every cell with the
    stream LINK its D8 path first reaches — the drainage area of each link.
    Pure composition of green machinery: stream_link_id (link labels on
    stream cells) + the cut-graph basins destination of the to-stream
    family, joined on the destination stream cell. Cells draining to a
    non-stream outlet are nodata (absent)."""
    from ..stages.pregel import basins_pregel
    from ..stages.spatial_join import _cached_get  # noqa: F401 (workers)
    from .queries_raster import stream_link_id

    # (stream cell -> link) as a broadcast sorted-array LUT — the table is
    # stream-bounded (the blessed stream-walk pull), and the lookup
    # replaces a full-grid hash join on dest
    lp = stream_link_id(sf_dir).to_pandas()
    cells = lp["cell_id"].to_numpy(np.int64)
    order = np.argsort(cells, kind="stable")
    lut_ref = ray.put((cells[order],
                       lp["link_id"].to_numpy(np.int64)[order]))

    cut_ds, sref = _stream_cut_graphs(sf_dir)
    keep = _dest_in_stream(basins_pregel(cut_ds.materialize(), GRID1), sref)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        cs, ls = _cached_get(lut_ref)
        dest = df["dest"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(cs, dest), len(cs) - 1)
        m = len(cs) > 0
        m = (cs[pos] == dest) if m else np.zeros(len(dest), bool)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64)[m],
            "subbasin": ls[pos][m]})

    return keep.map_batches(label, batch_format="pandas")


@query(
    "stream_link_stats",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    linkz AS (
      SELECT l.link_id, l.cell_id, c.v, g.down_id
      FROM link l JOIN cells c ON c.cell_id = l.cell_id
      JOIN graph g ON g.cell_id = l.cell_id
    ),
    internal AS (
      SELECT a.link_id,
             CASE WHEN (a.cell_id // {GRID1.cols}) <> (a.down_id // {GRID1.cols})
                   AND (a.cell_id % {GRID1.cols}) <> (a.down_id % {GRID1.cols})
                  THEN {int(np.floor(1.4142135623730951 * (1 << 20) + 0.5))}
                  ELSE {1 << 20} END AS hop
      FROM linkz a JOIN link b ON b.cell_id = a.down_id
      WHERE a.down_id >= 0 AND b.link_id = a.link_id
    )
    SELECT z.link_id, COUNT(*) AS n_cells,
           CAST(MIN(z.v) AS BIGINT) AS zmin, CAST(MAX(z.v) AS BIGINT) AS zmax,
           CAST(COALESCE((SELECT SUM(i.hop) FROM internal i
                          WHERE i.link_id = z.link_id), 0) AS BIGINT) AS len_units
    FROM linkz z GROUP BY z.link_id
    """,
)
def stream_link_stats(sf_dir: str):
    """Stream link length + relief (stream_network_analysis/stream_link_length.rs,
    stream_link_slope.rs): per link — cell count, min/max surface
    elevation (integer-exact) and the summed fixed-point hop length of the
    link's INTERNAL edges (both endpoints in the same link). Composition:
    stream_link_id labels JOIN the pointer table, link-local hop sums via a
    self-join on the down cell's link."""
    from ..stages.flow import down_ds_from_pointer
    from .queries_raster import stream_link_id

    link = stream_link_id(sf_dir).materialize()
    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1)
    j = link.join(dds.drop_columns(["tile"]), join_type="inner",
                  num_partitions=8, on=("cell_id",))
    # the down cell's link (absent when down is not a stream cell)
    link_down = link.map_batches(
        lambda df: pd.DataFrame({"down_id": df["cell_id"].to_numpy(np.int64),
                                 "down_link": df["link_id"].to_numpy(np.int64)}),
        batch_format="pandas")
    j2 = j.join(link_down, join_type="left_outer", num_partitions=8,
                on=("down_id",))

    _HOPD = int(np.floor(1.4142135623730951 * (1 << 20) + 0.5))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        lid = df["link_id"].to_numpy(np.int64)
        dlink = df["down_link"].to_numpy()
        dlink = np.where(pd.isna(dlink), -1, dlink).astype(np.int64)
        z = _value_fn(cid).astype(np.int64)
        diag = (cid // GRID1.cols != down // GRID1.cols) \
            & (cid % GRID1.cols != down % GRID1.cols)
        hop = np.where(diag, _HOPD, 1 << 20).astype(np.int64)
        internal = (down >= 0) & (dlink == lid)
        g = pd.DataFrame({"link_id": lid, "n_cells": np.ones(len(cid), np.int64),
                          "zmin": z, "zmax": z,
                          "len_units": np.where(internal, hop, 0)})
        return g.groupby("link_id", as_index=False).agg(
            n_cells=("n_cells", "sum"), zmin=("zmin", "min"),
            zmax=("zmax", "max"), len_units=("len_units", "sum"))

    from ..relational import partial_agg

    return partial_agg(j2.map_batches(part, batch_format="pandas"), ["link_id"],
                       [("n_cells", "sum", "n_cells"), ("zmin", "min", "zmin"),
                        ("zmax", "max", "zmax"), ("len_units", "sum", "len_units")])


# graph with edges INTO stream cells cut (for non-stream cells): each
# non-stream cell's chain then terminates at its ENTRY cell — the last
# hillslope cell before the channel
_ENTRY_CTES = """
    graph3 AS MATERIALIZED (
      SELECT g.cell_id, CASE WHEN s.cell_id IS NOT NULL THEN CAST(-1 AS BIGINT)
                             ELSE g.down_id END AS down_id
      FROM graph g LEFT JOIN stream s ON s.cell_id = g.down_id
    ),
    walk3(start, cur) AS (
      SELECT g.cell_id, g.cell_id FROM graph3 g
      WHERE NOT EXISTS (SELECT 1 FROM stream s WHERE s.cell_id = g.cell_id)
      UNION ALL
      SELECT w.start, g.down_id FROM walk3 w
      JOIN graph3 g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    entry AS MATERIALIZED (
      SELECT w.start AS cell_id, w.cur AS entry_cell
      FROM walk3 w JOIN graph3 g ON g.cell_id = w.cur
      WHERE g.down_id < 0
    )
"""


@query(
    "hillslopes",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    {_ENTRY_CTES},
    sides AS MATERIALIZED (
      -- entry cell e -> stream cell s = down(e); side from the integer
      -- cross product of s's flow direction with the entry direction
      SELECT e.cell_id AS entry_cell, ge.down_id AS s,
             l.link_id,
             CASE WHEN gs.down_id < 0 THEN 0 ELSE
               CASE WHEN
                 ((gs.down_id % {GRID1.cols}) - (ge.down_id % {GRID1.cols}))
                   * ((ge.down_id // {GRID1.cols}) - (e.cell_id // {GRID1.cols}))
                 - ((gs.down_id // {GRID1.cols}) - (ge.down_id // {GRID1.cols}))
                   * ((ge.down_id % {GRID1.cols}) - (e.cell_id % {GRID1.cols})) > 0
               THEN 1
               WHEN
                 ((gs.down_id % {GRID1.cols}) - (ge.down_id % {GRID1.cols}))
                   * ((ge.down_id // {GRID1.cols}) - (e.cell_id // {GRID1.cols}))
                 - ((gs.down_id // {GRID1.cols}) - (ge.down_id // {GRID1.cols}))
                   * ((ge.down_id % {GRID1.cols}) - (e.cell_id % {GRID1.cols})) < 0
               THEN 2 ELSE 0 END
             END AS side
      FROM (SELECT DISTINCT entry_cell AS cell_id FROM entry) e
      JOIN graph ge ON ge.cell_id = e.cell_id
      JOIN graph gs ON gs.cell_id = ge.down_id
      JOIN link l ON l.cell_id = ge.down_id
      WHERE ge.down_id >= 0
    )
    SELECT en.cell_id, CAST(s.link_id * 4 + s.side AS BIGINT) AS hillslope
    FROM entry en JOIN sides s ON s.entry_cell = en.entry_cell
    UNION ALL
    SELECT l.cell_id, CAST(l.link_id * 4 + 3 AS BIGINT) AS hillslope
    FROM link l
    """,
)
def hillslopes(sf_dir: str):
    """Hillslopes (hydro_analysis/hillslopes.rs): every cell labelled by the
    stream link it drains into x bank side — side from the integer cross
    product of the receiving stream cell's flow direction with the entry
    direction (1 = left, 2 = right, 0 = along-flow/outlet), stream cells
    get the channel code 3. Composition: basins over the entry-cut graph
    (terminates at the last hillslope cell) + local side classification +
    stream_link_id labels. Cells draining off-grid without touching a
    stream are nodata (absent); hillslope = link_id * 4 + side."""
    from ..stages.pregel import basins_pregel
    from ..stages.flow import down_ds_from_pointer, down_rows_touching, \
        member_sorted as member
    from .queries_raster import stream_link_id

    link = stream_link_id(sf_dir).materialize()
    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    # stream membership of the DOWN cell (cut edges INTO streams)
    sset = link.map_batches(
        lambda df: pd.DataFrame({"k": df["cell_id"].to_numpy(np.int64)}),
        batch_format="pandas").to_pandas()
    stream_set = np.sort(sset["k"].to_numpy(np.int64))
    sref = ray.put(stream_set)

    def cut_into(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        ss = _cached_get(sref)
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        is_stream_cell = member(cid, ss)
        cut = np.where((down >= 0) & member(down, ss), np.int64(-1), down)
        # stream cells keep NO outgoing edge either (they are not hillslope
        # cells; they are labelled separately as channel)
        out = pd.DataFrame({"cell_id": cid,
                            "down_id": np.where(is_stream_cell, np.int64(-1), cut),
                            "tile": df["tile"].to_numpy(np.int64)})
        return out[~is_stream_cell]

    g3 = dds.map_batches(cut_into, batch_format="pandas")
    entry = basins_pregel(g3, GRID1)  # (cell_id, basin = entry cell)

    # side classification per DISTINCT entry cell: the pointer pull is
    # bounded by the stream network's fan-in (rows touching a stream cell),
    # not the grid, and the entry->code table is built vectorized
    rows = down_rows_touching(dds, stream_set, include_down_hits=True)
    rcid = rows["cell_id"].to_numpy(np.int64)
    rdown = rows["down_id"].to_numpy(np.int64)
    link_pd = link.to_pandas()
    lorder = np.argsort(link_pd["cell_id"].to_numpy(np.int64), kind="mergesort")
    lcid = link_pd["cell_id"].to_numpy(np.int64)[lorder]
    llink = link_pd["link_id"].to_numpy(np.int64)[lorder]
    sm = member(rcid, stream_set)
    sorder = np.argsort(rcid[sm], kind="mergesort")
    scid, sdown = rcid[sm][sorder], rdown[sm][sorder]
    # entry candidates: non-stream cells whose down IS a stream cell
    cm = ~sm & (rdown >= 0) & member(rdown, stream_set)
    e, s = rcid[cm], rdown[cm]
    ds_ = sdown[np.searchsorted(scid, s)] if len(s) else np.empty(0, np.int64)
    fx = ds_ % GRID1.cols - s % GRID1.cols
    fy = ds_ // GRID1.cols - s // GRID1.cols
    ex = s % GRID1.cols - e % GRID1.cols
    ey = s // GRID1.cols - e // GRID1.cols
    cross = fx * ey - fy * ex
    side = np.where(ds_ < 0, 0,
                    np.where(cross > 0, 1, np.where(cross < 0, 2, 0)))
    hcode = (llink[np.searchsorted(lcid, s)] * 4 + side
             if len(s) else np.empty(0, np.int64))
    eorder = np.argsort(e, kind="mergesort")
    eref = ray.put((e[eorder], hcode[eorder].astype(np.int64)))

    def label(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        es, hc = _cached_get(eref)
        b = df["basin"].to_numpy(np.int64)
        m = member(b, es)  # basins draining off-grid: no hillslope label
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64)[m],
            "hillslope": hc[np.searchsorted(es, b[m])]})

    hs = entry.map_batches(label, batch_format="pandas")
    channel = link.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64),
                                 "hillslope": df["link_id"].to_numpy(np.int64) * 4 + 3}),
        batch_format="pandas")
    return hs.union(channel)


def _strahler_sql(kmax: int = 12) -> str:
    """Strahler order via level sets: S_1 = all cells; G_k = cells with >= 2
    inflowing neighbours in S_(k-1); S_k = downstream closure of G_k
    (Strahler order is non-decreasing downstream, so membership propagates
    along the D8 chain). strahler(v) = 1 + #{k >= 2 : v in S_k}. Levels are
    statically unrolled to kmax (order <= log2(#sources)); empty levels
    cost nothing."""
    parts = [f"WITH RECURSIVE {_GRAPH_CTES}"]
    prev = None  # None means S_1 = all cells
    sums = []
    for k in range(2, kmax + 1):
        member = "" if prev is None else f" JOIN {prev} s ON s.cur = p.cell_id"
        parts.append(f"""
    g{k} AS MATERIALIZED (
      SELECT g.cell_id FROM graph g
      JOIN graph p ON p.down_id = g.cell_id{member}
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s{k}(cur) AS (
      SELECT cell_id FROM g{k}
      UNION
      SELECT g.down_id FROM s{k} w JOIN graph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    )""")
        prev = f"s{k}"
        sums.append(f"(SELECT COUNT(*) FROM s{k} WHERE s{k}.cur = c.cell_id)")
    return (", ".join(parts)
            + f"""
    SELECT c.cell_id, CAST(1 + {" + ".join(sums)} AS BIGINT) AS strahler
    FROM graph c
    """)


from .queries import ORACLE as _ORACLE  # noqa: E402

# upgrade the round-2 rows-only strahler_order entry to a full SQL oracle
_ORACLE["strahler_order"] = _strahler_sql()


# --------------------------------------------------------------------------
# Pour points: snap to max accumulation + watershed from outlets
# --------------------------------------------------------------------------

from ..hydrodefs import (N_POUR, SNAP_RADIUS, _POUR_CTES,  # noqa: E402
                         _POUR_SEED, _pour_cells)


@query(
    "snap_pour_points",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    {_POUR_CTES}
    SELECT pour_id, CAST(snap_cell AS BIGINT) AS snap_cell FROM snapped
    """,
)
def snap_pour_points(sf_dir: str):
    """SnapPourPoints (hydro_analysis/snap_pour_points.rs): move each outlet
    to the highest-accumulation cell within a Chebyshev radius (ties to the
    lowest cell id). The tiny point set joins the accumulation Dataset on
    the 49 candidate cells per point — no broadcast of the raster."""
    import ray.data

    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flow_accumulation_pregel

    acc = flow_accumulation_pregel(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)
    pours = _pour_cells()
    rows = []
    for pid, cell in enumerate(pours.tolist()):
        r, c = cell // GRID1.cols, cell % GRID1.cols
        for dr in range(-SNAP_RADIUS, SNAP_RADIUS + 1):
            for dc in range(-SNAP_RADIUS, SNAP_RADIUS + 1):
                rr, cc = r + dr, c + dc
                if 0 <= rr < GRID1.rows and 0 <= cc < GRID1.cols:
                    rows.append((pid, rr * GRID1.cols + cc))
    cand = ray.data.from_pandas(pd.DataFrame(rows, columns=["pour_id", "cell_id"])) \
        .repartition(2)
    j = cand.join(acc, join_type="inner", num_partitions=4, on=("cell_id",))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["acc", "cell_id"], ascending=[False, True],
                          kind="mergesort")
        return pd.DataFrame({"pour_id": [np.int64(g["pour_id"].iloc[0])],
                             "snap_cell": [np.int64(g["cell_id"].iloc[0])]})

    return j.groupby("pour_id").map_groups(pick, batch_format="pandas")


@query(
    "watershed_pour_points",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    {_POUR_CTES},
    outlet AS MATERIALIZED (
      SELECT snap_cell, MIN(pour_id) AS pour_id FROM snapped GROUP BY snap_cell
    ),
    graphp AS MATERIALIZED (
      SELECT g.cell_id, CASE WHEN o.snap_cell IS NOT NULL THEN CAST(-1 AS BIGINT)
                             ELSE g.down_id END AS down_id
      FROM graph g LEFT JOIN outlet o ON o.snap_cell = g.cell_id
    ),
    walkp(start, cur) AS (
      SELECT cell_id, cell_id FROM graphp
      UNION ALL
      SELECT w.start, g.down_id FROM walkp w
      JOIN graphp g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT w.start AS cell_id, CAST(o.pour_id AS BIGINT) AS pour_id
    FROM walkp w JOIN outlet o ON o.snap_cell = w.cur
    """,
)
def watershed_pour_points(sf_dir: str):
    """Watershed from explicit outlets (hydro_analysis/watershed.rs): label
    every cell with the FIRST snapped pour point its D8 path reaches (cut
    the pointer table at outlets, basins over the cut graph); cells draining
    elsewhere are nodata (absent). Composes snap_pour_points."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import basins_pregel

    snaps = snap_pour_points(sf_dir).to_pandas()
    outlet = snaps.groupby("snap_cell", as_index=False)["pour_id"].min()
    omap = dict(zip(outlet["snap_cell"].astype(int), outlet["pour_id"].astype(int)))
    ocells = np.sort(outlet["snap_cell"].to_numpy(np.int64))
    oref = ray.put((ocells, omap))

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1)

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        oc, _m = _cached_get(oref)
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(oc, cid), len(oc) - 1)
        is_out = oc[pos] == cid
        return pd.DataFrame({"cell_id": cid,
                             "down_id": np.where(is_out, np.int64(-1), down),
                             "tile": df["tile"].to_numpy(np.int64)})

    dest = basins_pregel(dds.map_batches(cut, batch_format="pandas"), GRID1)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        oc, m = _cached_get(oref)
        d = df["basin"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(oc, d), len(oc) - 1)
        ok = oc[pos] == d
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64)[ok],
            "pour_id": np.array([m[int(x)] for x in d[ok]], np.int64)})

    return dest.map_batches(label, batch_format="pandas")


def _horton_sql() -> str:
    """Horton order oracle: strahler level sets + link principal chains."""
    parts = []
    prev = None
    sums = []
    for k in range(2, 13):
        member = "" if prev is None else f" JOIN {prev} s ON s.cur = p.cell_id"
        parts.append(f"""g{k} AS MATERIALIZED (
      SELECT g.cell_id FROM graph g
      JOIN graph p ON p.down_id = g.cell_id{member}
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s{k}(cur) AS (
      SELECT cell_id FROM g{k}
      UNION
      SELECT g.down_id FROM s{k} w JOIN graph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),""")
        prev = f"s{k}"
        sums.append(f"(SELECT COUNT(*) FROM s{k} WHERE s{k}.cur = c.cell_id)")
    levels = "\n    ".join(parts)
    sumexpr = " + ".join(sums)
    return f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    {levels}
    strahler AS MATERIALIZED (
      SELECT c.cell_id, 1 + {sumexpr} AS ord FROM graph c
    ),
    links AS MATERIALIZED (
      SELECT DISTINCT link_id FROM link
    ),
    lattr AS MATERIALIZED (
      -- a link's Strahler order = the order at its terminal cell (= its id)
      SELECT l.link_id, s.ord,
             g.down_id AS term_down
      FROM links l
      JOIN strahler s ON s.cell_id = l.link_id
      JOIN graph g ON g.cell_id = l.link_id
    ),
    parentrel AS MATERIALIZED (
      -- child link -> parent link (the link of the terminal's down cell)
      SELECT a.link_id AS child, pl.link_id AS parent
      FROM lattr a JOIN link pl ON pl.cell_id = a.term_down
      WHERE a.term_down >= 0
    ),
    principal AS MATERIALIZED (
      -- the principal upstream child at each junction: max Strahler, then
      -- lowest link id — the documented tie-break
      SELECT child, parent FROM (
        SELECT p.child, p.parent,
               row_number() OVER (PARTITION BY p.parent
                                  ORDER BY a.ord DESC, p.child ASC) AS rn
        FROM parentrel p JOIN lattr a ON a.link_id = p.child
      ) WHERE rn = 1
    ),
    hwalk(l, cur) AS (
      SELECT link_id, link_id FROM links
      UNION ALL
      SELECT h.l, pr.parent FROM hwalk h
      JOIN principal pr ON pr.child = h.cur
    ),
    horton AS MATERIALIZED (
      -- farthest-downstream link reachable through principal hops
      SELECT h.l AS link_id, s.ord AS horton FROM hwalk h
      JOIN lattr s ON s.link_id = h.cur
      WHERE NOT EXISTS (SELECT 1 FROM principal pr WHERE pr.child = h.cur)
    )
    SELECT lk.cell_id, CAST(ho.horton AS BIGINT) AS horton
    FROM link lk JOIN horton ho ON ho.link_id = lk.link_id
    """


@query("horton_order", _horton_sql())
def horton_order(sf_dir: str):
    """HortonStreamOrder (stream_network_analysis/horton.rs): Strahler
    orders re-numbered so the principal stream carries its order from outlet
    to source — at each junction the upstream link with the highest Strahler
    order (ties: lowest link id) inherits the downstream link's Horton
    order. The LINK graph is junction-sized (orders of magnitude smaller
    than the raster), so link-level attributes come from the distributed
    Strahler/link stages and the principal-chain walk runs on the collected
    link table; every stream CELL gets its link's Horton order."""
    from ..stages.flow import down_ds_from_pointer, down_rows_touching
    from ..stages.pregel import strahler_pregel
    from .queries_raster import stream_link_id

    link = stream_link_id(sf_dir).materialize()
    strahler = strahler_pregel(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)

    # link-level attributes: terminal cell = link_id (chain-walk terminal)
    lids = link.map_batches(
        lambda df: pd.DataFrame({"cell_id": np.unique(df["link_id"]
                                                      .to_numpy(np.int64))}),
        batch_format="pandas")
    lattr = lids.join(strahler, join_type="inner", num_partitions=4,
                      on=("cell_id",)).to_pandas()
    ord_map = dict(zip(lattr["cell_id"].astype(int),
                       lattr["strahler"].astype(int)))

    link_pd = link.to_pandas()
    link_map = dict(zip(link_pd["cell_id"].astype(int),
                        link_pd["link_id"].astype(int)))
    # pointer rows for link terminal cells only (links are stream cells):
    # the pull is link-graph-sized, never grid-sized
    down_pd = down_rows_touching(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1),
        link_pd["cell_id"].to_numpy(np.int64))
    down_map = dict(zip(down_pd["cell_id"].astype(int),
                        down_pd["down_id"].astype(int)))

    links = sorted(ord_map)
    parent = {}
    for l in links:
        td = down_map.get(l, -1)
        if td >= 0 and td in link_map:
            parent[l] = link_map[td]
    # principal child per parent: (max strahler, min link id)
    principal = {}
    for child, par in parent.items():
        cand = principal.get(par)
        key = (-ord_map[child], child)
        if cand is None or key < cand[0]:
            principal[par] = (key, child)
    principal_child = {par: c for par, ((_k0, _k1), c) in principal.items()}
    horton = {}
    for l in links:
        cur = l
        while parent.get(cur) is not None and \
                principal_child.get(parent[cur]) == cur:
            cur = parent[cur]
        horton[l] = ord_map[cur]
    hkeys = np.array(sorted(horton), np.int64)
    href = ray.put((hkeys, np.array([horton[k] for k in hkeys.tolist()],
                                    np.int64)))

    def label(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        hk, hv = _cached_get(href)
        lid = df["link_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "horton": hv[np.searchsorted(hk, lid)]})

    return link.map_batches(label, batch_format="pandas")


def _tributary_sql() -> str:
    """Tributary id = the farthest-downstream link of each link's principal
    chain (the main stem's outlet link labels the whole stem; every
    tributary starts a new id at its junction)."""
    base = _horton_sql()
    head, _sep, _tail = base.rpartition("SELECT lk.cell_id")
    return head + """SELECT lk.cell_id, CAST(ho2.trib AS BIGINT) AS tributary
    FROM link lk JOIN (
      SELECT h.l AS link_id, h.cur AS trib FROM hwalk h
      WHERE NOT EXISTS (SELECT 1 FROM principal pr WHERE pr.child = h.cur)
    ) ho2 ON ho2.link_id = lk.link_id
    """


@query("tributary_id", _tributary_sql())
def tributary_id(sf_dir: str):
    """TributaryIdentifier (stream_network_analysis/tributary_id.rs): label
    every stream cell with its tributary — the outlet link of the principal
    chain its link belongs to (main stems keep one id source-to-outlet,
    tributaries start new ids at their junctions). Shares the link-graph
    machinery of horton_order."""
    from ..stages.flow import down_ds_from_pointer, down_rows_touching
    from ..stages.pregel import strahler_pregel
    from .queries_raster import stream_link_id

    link = stream_link_id(sf_dir).materialize()
    strahler = strahler_pregel(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)
    lids = link.map_batches(
        lambda df: pd.DataFrame({"cell_id": np.unique(df["link_id"]
                                                      .to_numpy(np.int64))}),
        batch_format="pandas")
    lattr = lids.join(strahler, join_type="inner", num_partitions=4,
                      on=("cell_id",)).to_pandas()
    ord_map = dict(zip(lattr["cell_id"].astype(int),
                       lattr["strahler"].astype(int)))
    link_pd = link.to_pandas()
    link_map = dict(zip(link_pd["cell_id"].astype(int),
                        link_pd["link_id"].astype(int)))
    # pointer rows for link terminal cells only (links are stream cells):
    # the pull is link-graph-sized, never grid-sized
    down_pd = down_rows_touching(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1),
        link_pd["cell_id"].to_numpy(np.int64))
    down_map = dict(zip(down_pd["cell_id"].astype(int),
                        down_pd["down_id"].astype(int)))
    links = sorted(ord_map)
    parent = {}
    for l in links:
        td = down_map.get(l, -1)
        if td >= 0 and td in link_map:
            parent[l] = link_map[td]
    principal = {}
    for child, par in parent.items():
        key = (-ord_map[child], child)
        cand = principal.get(par)
        if cand is None or key < cand[0]:
            principal[par] = (key, child)
    principal_child = {par: c for par, (_k, c) in principal.items()}
    trib = {}
    for l in links:
        cur = l
        while parent.get(cur) is not None and \
                principal_child.get(parent[cur]) == cur:
            cur = parent[cur]
        trib[l] = cur
    tkeys = np.array(sorted(trib), np.int64)
    tref = ray.put((tkeys, np.array([trib[k] for k in tkeys.tolist()],
                                    np.int64)))

    def label(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        tk, tv = _cached_get(tref)
        lid = df["link_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "tributary": tv[np.searchsorted(tk, lid)]})

    return link.map_batches(label, batch_format="pandas")


@query(
    "long_profile",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
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
    stream AS MATERIALIZED (SELECT cell_id FROM acc WHERE acc >= {{T}}),
    {{WALKU}}
    SELECT s.cell_id, lu.len_units, CAST(c.v AS BIGINT) AS z
    FROM stream s
    JOIN (SELECT start, MAX(units) AS len_units FROM walku GROUP BY start) lu
      ON lu.start = s.cell_id
    JOIN cells c ON c.cell_id = s.cell_id
    """.replace("{T}", str(STREAM_ACC_T)).replace("{WALKU}", _WALK_UNITS_CTE),
)
def long_profile(sf_dir: str):
    """LongProfile (stream_network_analysis/long_profile.rs): per stream
    cell the downslope flowpath distance to the outlet (fixed-point units)
    and the surface elevation — the (distance, elevation) pairs a long
    profile plots. Composition: stream mask JOIN flowpath lengths."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import ShardedGraph

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    with ShardedGraph(dds, GRID1) as g:
        acc = g.accumulation()
        lens = g.flowpath_length()
    scells = acc.map_batches(
        lambda df: pd.DataFrame({"cell_id": df.loc[df["acc"] >= STREAM_ACC_T,
                                                   "cell_id"].to_numpy(np.int64)}),
        batch_format="pandas")
    j = scells.join(lens, join_type="inner", num_partitions=8, on=("cell_id",))

    def addz(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({"cell_id": cid,
                             "len_units": df["len_units"].astype(np.int64),
                             "z": _value_fn(cid).astype(np.int64)})

    return j.map_batches(addz, batch_format="pandas")


@query(
    "depth_in_sink",
    f"WITH RECURSIVE {_fill_cte('(cid*2654435761)%1000003', 48)} "
    "SELECT cell_id, (fill - z) AS depth FROM fillw",
)
def depth_in_sink(sf_dir: str):
    """DepthInSink (hydro_analysis/depth_in_sink.rs): fill elevation minus
    surface elevation per cell (0 outside depressions) — pure composition of
    the priority-flood fill stage. SQL oracle: hydrodefs._fill_cte Jacobi
    relaxation (192 steps; converges at 169 on this dem,
    tests/test_fill_sql.py)."""
    from ..stages.pregel import fill_depressions_pregel

    def z_fn(cids: np.ndarray) -> np.ndarray:
        cids = np.asarray(cids, np.int64)
        return ((cids * 2654435761) % 1000003).astype(np.int64)

    fill = fill_depressions_pregel(z_fn, GRID1)

    def depth(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": cid,
            "depth": df["fill"].to_numpy(np.int64) - z_fn(cid)})

    return fill.map_batches(depth, batch_format="pandas")


@query(
    "flow_accum_full_workflow",
    f"""
    WITH RECURSIVE {_fill_cte('(cid*2654435761)%1000003', 48)},
    cells AS (SELECT cell_id, cell_id // {GRID1.cols} AS r,
                     cell_id % {GRID1.cols} AS c, fill AS v FROM fillw),
    {_GRAPH_TAIL},
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT g.cell_id, CAST(1 + COALESCE(p.n, 0) AS BIGINT) AS acc
    FROM graph g LEFT JOIN (SELECT cur, COUNT(*) AS n FROM walk
                            GROUP BY cur) p
      ON p.cur = g.cell_id
    """,
)
def flow_accum_full_workflow(sf_dir: str):
    """FlowAccumulationFullWorkflow (hydro_analysis/flow_accumulation_full_
    workflow.rs): the canonical DEM chain — priority-flood fill -> D8
    pointers over the FILLED surface -> accumulation — composed from three
    verified stages. Filled flats keep no strict descent and drain nowhere
    (the reference's flat-resolution increment is off — documented variant).
    SQL oracle: _fill_cte relaxation -> _GRAPH_TAIL pointer over the filled
    values -> walk-count accumulation; dense end-to-end oracle in
    tests/test_flow.py stays as the cross-check."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import fill_depressions_pregel, flow_accumulation_pregel
    from ..stages.raster import stencil_3x3

    def z_fn(cids: np.ndarray) -> np.ndarray:
        cids = np.asarray(cids, np.int64)
        return ((cids * 2654435761) % 1000003).astype(np.int64)

    fill = fill_depressions_pregel(z_fn, GRID1)

    # rows -> tile tensors (the filled surface is data, not a pure function)
    tile = 64
    tcols = -(-GRID1.cols // tile)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": cid, "fill": df["fill"].to_numpy(np.int64),
            "tile_id": (cid // GRID1.cols // tile) * tcols
            + (cid % GRID1.cols // tile)})

    def build_tile(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tile_id"].iloc[0])
        tr, tc = tid // tcols, tid % tcols
        r0, c0 = tr * tile, tc * tile
        nr = min(tile, GRID1.rows - r0)
        nc = min(tile, GRID1.cols - c0)
        cid = g["cell_id"].to_numpy(np.int64)
        arr = np.empty(nr * nc)
        idx = (cid // GRID1.cols - r0) * nc + (cid % GRID1.cols - c0)
        arr[idx] = g["fill"].to_numpy(np.float64)
        return pd.DataFrame([{"tile_id": tid, "trow": tr, "tcol": tc,
                              "nrows": nr, "ncols": nc, "data": arr}])

    tiles = fill.map_batches(tag, batch_format="pandas") \
        .groupby("tile_id").map_groups(build_tile, batch_format="pandas")

    from ..hydrodefs import _D8_DX, _D8_DY, _d8_len

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        best_slope = np.full((nr, nc), -np.inf)
        code = np.zeros((nr, nc), np.int64)
        for i in range(8):
            zn = padded[1 + _D8_DY[i]:1 + _D8_DY[i] + nr,
                        1 + _D8_DX[i]:1 + _D8_DX[i] + nc]
            slope = (z - zn) / _d8_len(i)
            ok = ~np.isnan(zn) & (slope > 0) & (slope > best_slope)
            best_slope = np.where(ok, slope, best_slope)
            code = np.where(ok, np.int64(1 << i), code)
        return {"d8": code}

    pointer = stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "d8": df["d8"].astype(np.int64)}),
        batch_format="pandas")
    return flow_accumulation_pregel(
        down_ds_from_pointer(pointer, GRID1), GRID1)


@query(
    "stream_power_components",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
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
    nbz AS (
      {" UNION ALL ".join(
        f"SELECT a.cell_id, CAST({dr} AS BIGINT) AS dr, CAST({dc} AS BIGINT) AS dc, b.v "
        f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr in (-1, 0, 1) for dc in (-1, 0, 1))}
    ),
    horn AS (
      SELECT cell_id,
        CAST(SUM(CASE WHEN dc = 1 THEN (CASE WHEN dr = 0 THEN 2 ELSE 1 END) * v
                      WHEN dc = -1 THEN -(CASE WHEN dr = 0 THEN 2 ELSE 1 END) * v
                      ELSE 0 END) AS BIGINT) AS gx8,
        CAST(SUM(CASE WHEN dr = 1 THEN (CASE WHEN dc = 0 THEN 2 ELSE 1 END) * v
                      WHEN dr = -1 THEN -(CASE WHEN dc = 0 THEN 2 ELSE 1 END) * v
                      ELSE 0 END) AS BIGINT) AS gy8
      FROM nbz GROUP BY cell_id HAVING COUNT(*) = 9
    )
    SELECT h.cell_id, CAST(a.acc AS BIGINT) AS acc, h.gx8, h.gy8
    FROM horn h JOIN acc a ON a.cell_id = h.cell_id
    """,
)
def stream_power_components(sf_dir: str):
    """StreamPowerIndex / SedimentTransportIndex (terrain_analysis/
    stream_power_index.rs, sediment_transport_index.rs;
    relative_stream_power_index.rs is the same sufficient statistics at
    exponents sca^0.9 slope^1.1): the exact integer
    sufficient statistics — upslope area (D8 accumulation) + Horn gradient
    numerators per interior cell; SPI = As*tan(slope) and STI's exponent
    forms follow driver-side in float. One accumulation run joined to one
    stencil pass."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flow_accumulation_pregel
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    acc = flow_accumulation_pregel(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded
        a = z[0:nr, 0:nc]; b = z[0:nr, 1:nc + 1]; c = z[0:nr, 2:nc + 2]
        d = z[1:nr + 1, 0:nc]; f = z[1:nr + 1, 2:nc + 2]
        g = z[2:nr + 2, 0:nc]; h = z[2:nr + 2, 1:nc + 1]; i = z[2:nr + 2, 2:nc + 2]
        gx8 = (c + 2 * f + i) - (a + 2 * d + g)
        gy8 = (g + 2 * h + i) - (a + 2 * b + c)
        return {"gx8": gx8, "gy8": gy8}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    horn = stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame(
            {"cell_id": df.loc[np.isfinite(df["gx8"]), "cell_id"].astype(np.int64),
             "gx8": df.loc[np.isfinite(df["gx8"]), "gx8"].astype(np.int64),
             "gy8": df.loc[np.isfinite(df["gx8"]), "gy8"].astype(np.int64)}),
        batch_format="pandas")
    j = horn.join(acc, join_type="inner", num_partitions=8, on=("cell_id",))
    return j.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "acc": df["acc"].astype(np.int64),
                                 "gx8": df["gx8"].astype(np.int64),
                                 "gy8": df["gy8"].astype(np.int64)}),
        batch_format="pandas")
