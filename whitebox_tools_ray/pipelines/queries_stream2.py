"""Stream-network completion (stream_network_analysis/*.rs remainder):
DistanceToOutlet, FarthestChannelHead, TotalLengthOfUpstreamChannels,
HackStreamOrder, FindMainStem, TopologicalStreamOrder, StreamLinkClass,
RemoveShortStreams, StreamSlopeContinuous.

All nine compose existing green machinery: the Pregel shard pool for the
whole-raster waves (flowpath length, max-upslope, weighted accumulation)
restricted to the induced STREAM subgraph (downstream closure: the D8 down
cell of a stream cell is itself a stream cell, so the induced graph is just
the pointer table filtered to stream cells), and the junction-sized link DAG
collected to the driver for the link-level orders (Hack/topological/class) —
the same justification as horton_order: the link graph is orders of
magnitude smaller than the raster, while every per-CELL label is applied
distributed via a broadcast link->attribute map. Oracles are recursive-CTE
walks over the shared D8 graph CTEs, integer-exact (fixed-point hop units).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hydrodefs import (_GRAPH_CTES, _HOP_DIAG, _HOP_STRAIGHT, _LINK_CTES,
                         _STREAM_CTES, _d8_pointer, _hop_sql)
from ..layers import GRID1
from ..memo import session_memo as _session_memo
from ..rasterdefs import _value_fn
from .queries import query

# RemoveShortStreams minimum exterior-link length (fixed-point units):
# 4 cardinal cell hops — removes some but not all headwater links on the
# synthetic surface (asserted in tests/test_stream_network.py)
REMOVE_MIN_UNITS = 4 * _HOP_STRAIGHT


def _hops(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fixed-point D8 hop lengths (2^20 straight, round(sqrt2*2^20) diag) —
    bit-identical to hydrodefs._hop_sql."""
    diag = (a // GRID1.cols != b // GRID1.cols) & (a % GRID1.cols != b % GRID1.cols)
    return np.where(diag, np.int64(_HOP_DIAG), np.int64(_HOP_STRAIGHT))


@_session_memo
def _stream_graph(sf_dir: str) -> ray.data.Dataset:
    """Materialized (cell_id, link_id, down_id, tile): the D8 pointer table
    induced on stream cells (accumulation >= threshold), carrying each
    cell's stream-link label. Downstream closure makes this the complete
    stream subgraph: down_id >= 0 always lands on another stream cell."""
    from ..stages.flow import down_ds_from_pointer
    from .queries_raster import stream_link_id

    link = stream_link_id(sf_dir).materialize()
    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1)
    return link.join(dds, join_type="inner", num_partitions=8,
                     on=("cell_id",)).materialize()


# --------------------------------------------------------------------------
# whole-raster waves over the induced stream subgraph
# --------------------------------------------------------------------------

@query(
    "dist_to_outlet",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    dwalk(start, cur, units) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM stream
      UNION ALL
      SELECT w.start, g.down_id, w.units + {_hop_sql('w.cur', 'g.down_id')}
      FROM dwalk w JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT start AS cell_id, MAX(units) AS dist_units FROM dwalk GROUP BY start
    """,
)
def dist_to_outlet(sf_dir: str):
    """DistanceToOutlet (stream_network_analysis/dist_to_outlet.rs): per
    stream cell the D8 flowpath distance to the network outlet, fixed-point
    units. The downstream-closure argument makes this exactly the Pregel
    flowpath-length wave run on the stream-induced pointer table."""
    from ..stages.pregel import flowpath_length_pregel

    sg = _stream_graph(sf_dir)
    return flowpath_length_pregel(sg.drop_columns(["link_id"]), GRID1).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "dist_units": df["len_units"].to_numpy(np.int64)}),
        batch_format="pandas")


@query(
    "farthest_channel_head",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    fwalk(cur, units) AS (
      SELECT cell_id, CAST(0 AS BIGINT) FROM s_indeg WHERE n = 0
      UNION ALL
      SELECT sg.down_id, w.units + {_hop_sql('w.cur', 'sg.down_id')}
      FROM fwalk w JOIN sgraph sg ON sg.cell_id = w.cur WHERE sg.down_id >= 0
    )
    SELECT cur AS cell_id, MAX(units) AS fch_units FROM fwalk GROUP BY cur
    """,
)
def farthest_channel_head(sf_dir: str):
    """FarthestChannelHead (stream_network_analysis/farthest_channel_head
    .rs): per stream cell the maximum channel distance from any upstream
    channel head (heads report 0) — the (max, +) in-degree wave of
    max_upslope_pregel on the stream-induced subgraph."""
    from ..stages.pregel import max_upslope_pregel

    sg = _stream_graph(sf_dir)
    return max_upslope_pregel(sg.drop_columns(["link_id"]), GRID1).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "fch_units": df["muf_units"].to_numpy(np.int64)}),
        batch_format="pandas")


@query(
    "total_length_channels",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    cwalk(cur, units) AS (
      SELECT sg.down_id,
             CAST({_hop_sql('sg.cell_id', 'sg.down_id')} AS BIGINT)
      FROM sgraph sg WHERE sg.down_id >= 0
      UNION ALL
      SELECT g.down_id, w.units
      FROM cwalk w JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT s.cell_id, CAST(COALESCE(t.total, 0) AS BIGINT) AS upchan_units
    FROM stream s LEFT JOIN (
      SELECT cur, SUM(units) AS total FROM cwalk GROUP BY cur
    ) t ON t.cur = s.cell_id
    """,
)
def total_length_channels(sf_dir: str):
    """TotalLengthOfUpstreamChannels (stream_network_analysis/
    total_length_channels.rs): per stream cell the summed length of every
    channel edge upstream of (and into) it. Identity: seed each cell with
    the sum of its INCOMING stream-edge hop lengths, then the plain
    flow-accumulation sum-drain over the stream subgraph — an edge (a->b)
    contributes to exactly the cells downstream-or-equal of b."""
    from ..relational import partial_agg
    from ..stages.flow import tile_of_expr
    from ..stages.pregel import weighted_accumulation_pregel

    sg = _stream_graph(sf_dir)
    dds = sg.drop_columns(["link_id"]).materialize()

    def emit_masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        t = df["tile"].to_numpy(np.int64)
        base = pd.DataFrame({"cell_id": cid, "tile": t,
                             "mass": np.zeros(len(cid), np.int64)})
        m = down >= 0
        incr = pd.DataFrame({"cell_id": down[m],
                             "tile": tile_of_expr(down[m], GRID1, 64),
                             "mass": _hops(cid[m], down[m])})
        return pd.concat([base, incr], ignore_index=True)

    masses = partial_agg(dds.map_batches(emit_masses, batch_format="pandas"),
                         ["cell_id", "tile"], [("mass", "sum", "mass")])
    acc = weighted_accumulation_pregel(dds, masses, GRID1)
    cells = sg.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64)}),
        batch_format="pandas")
    j = cells.join(acc, join_type="left_outer", num_partitions=8,
                   on=("cell_id",))

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        a = df["acc"].to_numpy()
        a = np.where(pd.isna(a), 0, a).astype(np.int64)
        return pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64),
                             "upchan_units": a})

    return j.map_batches(fill, batch_format="pandas")


@query(
    "stream_slope_continuous",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES}
    SELECT s.cell_id,
           CAST(ca.v - cb.v AS BIGINT) AS dz,
           CAST({_hop_sql('s.cell_id', 'g.down_id')} AS BIGINT) AS hop_units
    FROM stream s
    JOIN graph g ON g.cell_id = s.cell_id
    JOIN cells ca ON ca.cell_id = s.cell_id
    JOIN cells cb ON cb.cell_id = g.down_id
    WHERE g.down_id >= 0
    """,
)
def stream_slope_continuous(sf_dir: str):
    """StreamSlopeContinuous (stream_network_analysis/stream_slope_
    continuous.rs): per stream cell the gradient components over its
    downstream D8 edge — integer elevation drop and fixed-point hop length
    (degrees = atan(dz * z_scale / hop) downstream of this contract).
    Terminal stream cells (no downstream edge) are nodata (absent)."""
    sg = _stream_graph(sf_dir)

    def slope(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        m = down >= 0
        cid, down = cid[m], down[m]
        dz = _value_fn(cid).astype(np.int64) - _value_fn(down).astype(np.int64)
        return pd.DataFrame({"cell_id": cid, "dz": dz,
                             "hop_units": _hops(cid, down)})

    return sg.map_batches(slope, batch_format="pandas")


# --------------------------------------------------------------------------
# link-level orders (junction-sized DAG on the driver, cells labelled
# distributed) — Hack / main stem / topological / link class / short removal
# --------------------------------------------------------------------------

class _LinkTable:
    """Junction-sized link attribute table + the distributed stream graph.

    sg / e / sindeg stay distributed Datasets; links is a collected pandas
    table with one row per stream LINK (head cell, head stream in-degree,
    internal fixed-point length, cell count, parent link, hop to parent)."""

    def __init__(self, sg, e, sindeg, links: pd.DataFrame):
        self.sg, self.e, self.sindeg, self.links = sg, e, sindeg, links


@_session_memo
def _link_table(sf_dir: str) -> _LinkTable:
    from ..stages.spatial_join import _cached_get  # noqa: F401 (workers)

    sg = _stream_graph(sf_dir)
    # ONE stream-bounded driver pull (the stream-walk bound blessed for
    # hillslopes/horton/raster_streams_to_vector: the stream network is
    # orders of magnitude smaller than the raster); the link DAG is derived
    # vectorized on the driver, and the distributed per-cell columns
    # (down_link, stream in-degree) are attached to sg by broadcast
    # sorted-array lookup — this replaced two Dataset hash joins + two
    # shuffle aggregates that each cost ~3 s at any scale.
    st = sg.to_pandas()
    cells = st["cell_id"].to_numpy(np.int64)
    lids = st["link_id"].to_numpy(np.int64)
    downs = st["down_id"].to_numpy(np.int64)
    order = np.argsort(cells, kind="stable")
    cs, ls = cells[order], lids[order]

    def _link_of(a: np.ndarray) -> np.ndarray:
        if not len(cs):
            return np.full(len(a), -1, np.int64)
        pos = np.minimum(np.searchsorted(cs, a), len(cs) - 1)
        return np.where((a >= 0) & (cs[pos] == a), ls[pos], np.int64(-1))

    down_link = _link_of(downs)

    # per-cell stream in-degree, aligned to cs (downstream closure: every
    # down target of a stream cell is a stream cell)
    indeg_cs = np.zeros(len(cs), np.int64)
    tgt = downs[downs >= 0]
    if len(tgt):
        pos = np.searchsorted(cs, tgt)
        # downstream-closure invariant is load-bearing here: every down
        # target of a stream cell must itself be a stream cell, else the
        # searchsorted scatter silently corrupts in-degrees.
        if pos.max(initial=-1) >= len(cs) or not (cs[np.minimum(pos, len(cs) - 1)] == tgt).all():
            raise AssertionError("stream network not downstream-closed: "
                                 "a stream cell's down target is off-stream")
        np.add.at(indeg_cs, pos, 1)

    # per-link internal length + cell count
    intra = (downs >= 0) & (down_link == lids)
    w = np.where(intra, _hops(cells, np.where(downs >= 0, downs, cells)), 0)
    lstats = pd.DataFrame({"link_id": lids, "ilen": w.astype(np.int64),
                           "one": np.ones(len(lids), np.int64)}) \
        .groupby("link_id", as_index=False) \
        .agg(ilen=("ilen", "sum"), n_cells=("one", "sum"))

    # head cell per link = the link cell with no INTRA-link predecessor
    itgt = np.sort(downs[intra])
    if len(itgt):
        pos = np.minimum(np.searchsorted(itgt, cells), len(itgt) - 1)
        is_head = itgt[pos] != cells
    else:
        is_head = np.ones(len(cells), bool)
    heads = pd.DataFrame({"link_id": lids[is_head],
                          "head_cell": cells[is_head]})

    # head stream in-degree: 0 => exterior (source-headed), >=2 => junction
    hpos = np.searchsorted(cs, heads["head_cell"].to_numpy(np.int64))
    headn = pd.DataFrame({"head_cell": heads["head_cell"].to_numpy(np.int64),
                          "head_n": indeg_cs[hpos]})

    # parent linkage: the terminal cell of a link IS the link id; its down
    # cell's link (if any) is the parent
    term = cells == lids
    parent = down_link[term]
    tdown = downs[term]
    hop_out = np.where((tdown >= 0) & (parent >= 0),
                       _hops(cells[term], np.where(tdown >= 0, tdown, 0)),
                       0).astype(np.int64)
    pl = pd.DataFrame({"link_id": lids[term], "parent": parent,
                       "hop_out": hop_out})

    links = (lstats.merge(heads, on="link_id")
             .merge(headn.drop_duplicates("head_cell"), on="head_cell")
             .merge(pl, on="link_id"))

    # distributed per-cell view: sg + down_link + stream in-degree via
    # broadcast lookup (consumers label cells without any join)
    lut_ref = ray.put((cs, ls, indeg_cs))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        cs_b, ls_b, ind_b = _cached_get(lut_ref)
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(cs_b, cid), len(cs_b) - 1)
        dpos = np.minimum(np.searchsorted(cs_b, np.abs(down)), len(cs_b) - 1)
        out = df.copy()
        out["down_link"] = np.where((down >= 0) & (cs_b[dpos] == down),
                                    ls_b[dpos], np.int64(-1)).astype(np.float64)
        out.loc[out["down_link"] < 0, "down_link"] = np.nan
        out["n"] = ind_b[pos]
        return out

    e = sg.map_batches(attach, batch_format="pandas")
    sindeg = e.map_batches(lambda df: df[["cell_id", "n"]],
                           batch_format="pandas")
    return _LinkTable(sg, e, sindeg, links)


def _link_orders(lt: _LinkTable) -> pd.DataFrame:
    """Driver DP over the junction-sized link DAG: channel length from
    headwater, tributary (headwater of the max-length channel path, ties ->
    lowest headwater id — provably equal to the stepwise reference rule),
    Hack order, topological order. Returns links extended with columns
    chanlen / trib / hack / topo / is_main."""
    L = lt.links.set_index("link_id")
    children: dict[int, list[int]] = {}
    for lid, par in zip(L.index, L["parent"]):
        if par >= 0:
            children.setdefault(int(par), []).append(int(lid))

    chanlen: dict[int, int] = {}
    trib: dict[int, int] = {}
    principal: dict[int, int] = {}
    pending = {int(l): len(children.get(int(l), [])) for l in L.index}
    stack = [l for l, p in pending.items() if p == 0]
    while stack:
        l = stack.pop()
        ch = children.get(l, [])
        if ch:
            # principal child: max entering channel length, tie lowest trib
            best = min(ch, key=lambda c: (-(chanlen[c] + int(L.at[c, "hop_out"])),
                                          trib[c]))
            base = chanlen[best] + int(L.at[best, "hop_out"])
            trib[l] = trib[best]
            principal[l] = best
        else:
            base = 0
            trib[l] = int(L.at[l, "head_cell"])
        chanlen[l] = base + int(L.at[l, "ilen"])
        par = int(L.at[l, "parent"])
        if par >= 0:
            pending[par] -= 1
            if pending[par] == 0:
                stack.append(par)

    hack: dict[int, int] = {}
    topo: dict[int, int] = {}
    roots = [int(l) for l in L.index if int(L.at[l, "parent"]) < 0]
    stack = list(roots)
    for r in roots:
        hack[r], topo[r] = 1, 1
    while stack:
        l = stack.pop()
        for c in children.get(l, []):
            hack[c] = hack[l] if principal.get(l) == c else hack[l] + 1
            topo[c] = topo[l] + 1
            stack.append(c)

    out = L.copy()
    out["chanlen"] = [chanlen[int(l)] for l in L.index]
    out["trib"] = [trib[int(l)] for l in L.index]
    out["hack"] = [hack[int(l)] for l in L.index]
    out["topo"] = [topo[int(l)] for l in L.index]
    out["is_main"] = (out["hack"] == 1).astype(np.int64)
    return out.reset_index()


def _label_links(sg: ray.data.Dataset, amap: dict[int, int],
                 col: str) -> ray.data.Dataset:
    """(cell_id, <col>): broadcast the junction-sized link->value map and
    label every stream cell with its link's value."""
    aref = ray.put(amap)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        m = _cached_get(aref)
        lid = df["link_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            col: np.array([m[int(x)] for x in lid], np.int64)})

    return sg.map_batches(label, batch_format="pandas")


_HACK_CTES = f"""
    hpath(h, cur, units) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM s_indeg WHERE n = 0
      UNION ALL
      SELECT w.h, sg.down_id, w.units + {_hop_sql('w.cur', 'sg.down_id')}
      FROM hpath w JOIN sgraph sg ON sg.cell_id = w.cur WHERE sg.down_id >= 0
    ),
    trib AS MATERIALIZED (
      SELECT cur AS cell_id, h AS trib FROM hpath
      QUALIFY row_number() OVER (PARTITION BY cur
                                 ORDER BY units DESC, h ASC) = 1
    ),
    swalk(start, cur, k) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM trib
      UNION ALL
      SELECT w.start, sg.down_id,
             w.k + CASE WHEN ta.trib <> tb.trib THEN 1 ELSE 0 END
      FROM swalk w
      JOIN sgraph sg ON sg.cell_id = w.cur
      JOIN trib ta ON ta.cell_id = w.cur
      JOIN trib tb ON tb.cell_id = sg.down_id
      WHERE sg.down_id >= 0
    )
"""


@query(
    "hack_order",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    {_HACK_CTES}
    SELECT start AS cell_id, CAST(1 + MAX(k) AS BIGINT) AS hack
    FROM swalk GROUP BY start
    """,
)
def hack_order(sf_dir: str):
    """HackStreamOrder (stream_network_analysis/hack_order.rs): the main
    stem (maximum channel length from headwater, ties -> lowest headwater
    cell id) carries order 1 outlet-to-source; a tributary's order is its
    parent's plus one. Cell-level contract: 1 + the number of downstream
    channel edges whose endpoints carry different tributary labels, where a
    cell's tributary is the headwater of its maximum-length upstream
    channel path (the stepwise propagation of the reference equals this
    global rule by induction on the junction DAG)."""
    lt = _link_table(sf_dir)
    od = _link_orders(lt)
    return _label_links(lt.sg, dict(zip(od["link_id"].astype(int),
                                        od["hack"].astype(int))), "hack")


@query(
    "find_main_stem",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    {_HACK_CTES}
    SELECT start AS cell_id,
           CAST(CASE WHEN MAX(k) = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_main
    FROM swalk GROUP BY start
    """,
)
def find_main_stem(sf_dir: str):
    """FindMainStem (stream_network_analysis/find_main_stem.rs): flag the
    cells of each basin's main channel — the Hack-order-1 path (maximum
    channel length, principal chain from the outlet)."""
    lt = _link_table(sf_dir)
    od = _link_orders(lt)
    return _label_links(lt.sg, dict(zip(od["link_id"].astype(int),
                                        od["is_main"].astype(int))), "is_main")


@query(
    "topological_stream_order",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    junc AS MATERIALIZED (SELECT cell_id FROM s_indeg WHERE n >= 2),
    twalk(start, cur, k) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM stream
      UNION ALL
      SELECT w.start, sg.down_id,
             w.k + CASE WHEN j.cell_id IS NOT NULL THEN 1 ELSE 0 END
      FROM twalk w
      JOIN sgraph sg ON sg.cell_id = w.cur
      LEFT JOIN junc j ON j.cell_id = sg.down_id
      WHERE sg.down_id >= 0
    )
    SELECT start AS cell_id, CAST(1 + MAX(k) AS BIGINT) AS topo
    FROM twalk GROUP BY start
    """,
)
def topological_stream_order(sf_dir: str):
    """TopologicalStreamOrder (stream_network_analysis/topological_stream_
    order.rs): the link draining to the outlet is order 1 and every link
    above a junction increments — per cell, 1 + the number of junction
    cells (stream in-degree >= 2) strictly downstream. Link-level: 1 +
    depth in the link tree, labelled onto cells distributed."""
    lt = _link_table(sf_dir)
    od = _link_orders(lt)
    return _label_links(lt.sg, dict(zip(od["link_id"].astype(int),
                                        od["topo"].astype(int))), "topo")


@query(
    "stream_link_class",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    upchase(start, cur) AS (
      SELECT i.cell_id, p.cell_id FROM s_indeg i
      JOIN sgraph p ON p.down_id = i.cell_id
      WHERE i.n = 1
      UNION ALL
      SELECT w.start, p.cell_id FROM upchase w
      JOIN s_indeg i ON i.cell_id = w.cur AND i.n = 1
      JOIN sgraph p ON p.down_id = w.cur
    ),
    cls12 AS MATERIALIZED (
      SELECT u.start AS cell_id, CASE WHEN i.n = 0 THEN 1 ELSE 2 END AS cls
      FROM upchase u JOIN s_indeg i ON i.cell_id = u.cur WHERE i.n <> 1
    )
    SELECT s.cell_id,
           CAST(CASE WHEN g.down_id < 0 THEN 5
                     WHEN i.n >= 2 THEN 4
                     WHEN i.n = 0 THEN 3
                     ELSE c.cls END AS BIGINT) AS link_class
    FROM stream s
    JOIN s_indeg i ON i.cell_id = s.cell_id
    JOIN sgraph g ON g.cell_id = s.cell_id
    LEFT JOIN cls12 c ON c.cell_id = s.cell_id
    """,
)
def stream_link_class(sf_dir: str):
    """StreamLinkClass (stream_network_analysis/stream_link_class.rs):
    5 = outlet node (no downstream cell), 4 = junction node (stream
    in-degree >= 2), 3 = source node (in-degree 0), 1 = exterior link cell
    (its link's head is a source), 2 = interior link cell (head is a
    junction); node classes take precedence in that order, exactly the
    reference's traversal assignment."""
    lt = _link_table(sf_dir)
    ext = set(lt.links.loc[lt.links["head_n"] == 0, "link_id"].astype(int))
    eref = ray.put(ext)
    j = lt.e  # already carries the stream in-degree column n

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        es = _cached_get(eref)
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        lid = df["link_id"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        link12 = np.array([1 if int(x) in es else 2 for x in lid], np.int64)
        cls = np.where(down < 0, 5,
                       np.where(n >= 2, 4, np.where(n == 0, 3, link12)))
        return pd.DataFrame({"cell_id": cid, "link_class": cls.astype(np.int64)})

    return j.map_batches(classify, batch_format="pandas")


@query(
    "remove_short_streams",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    internal AS MATERIALIZED (
      SELECT l.link_id,
             SUM({_hop_sql('l.cell_id', 'g.down_id')}) AS len_units
      FROM link l JOIN graph g ON g.cell_id = l.cell_id
      JOIN link b ON b.cell_id = g.down_id
      WHERE g.down_id >= 0 AND b.link_id = l.link_id
      GROUP BY l.link_id
    ),
    ext AS MATERIALIZED (
      SELECT DISTINCT l.link_id FROM link l
      JOIN s_indeg i ON i.cell_id = l.cell_id WHERE i.n = 0
    ),
    short AS MATERIALIZED (
      SELECT e.link_id FROM ext e
      LEFT JOIN internal il ON il.link_id = e.link_id
      WHERE COALESCE(il.len_units, 0) < {REMOVE_MIN_UNITS}
    )
    SELECT l.cell_id, CAST(1 AS BIGINT) AS kept FROM link l
    WHERE NOT EXISTS (SELECT 1 FROM short s WHERE s.link_id = l.link_id)
    """,
)
def remove_short_streams(sf_dir: str):
    """RemoveShortStreams (stream_network_analysis/remove_short_streams
    .rs): drop EXTERIOR (source-headed) links whose internal fixed-point
    length is below the minimum; interior links always survive. Emits the
    surviving stream cells (kept=1); removed/background cells are nodata
    (absent)."""
    lt = _link_table(sf_dir)
    removed = set(lt.links.loc[(lt.links["head_n"] == 0)
                               & (lt.links["ilen"] < REMOVE_MIN_UNITS),
                               "link_id"].astype(int))
    rref = ray.put(removed)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        rs = _cached_get(rref)
        lid = df["link_id"].to_numpy(np.int64)
        m = np.array([int(x) not in rs for x in lid], bool)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64)[m],
            "kept": np.ones(int(m.sum()), np.int64)})

    return lt.sg.map_batches(keep, batch_format="pandas")
