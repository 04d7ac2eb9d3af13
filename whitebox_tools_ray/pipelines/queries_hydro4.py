"""Hydro sweep #4 — the remaining cheap-composition hydro_analysis tools,
every entry with a bit-exact DuckDB oracle:

  FindNoFlowCells, FindParallelFlow, BreachSingleCellPits, Rho8Pointer,
  D8MassFlux, AverageFlowpathSlope (sufficient statistics),
  FlowLengthDiff, LongestFlowpath, TraceDownslopeFlowpaths,
  JensonSnapPourPoints, ElevationAboveStreamEuclidean.

Determinism contracts:
  * path lengths in fixed-point units (2^20 per cardinal hop) — integer
    sums, order-independent at any parallelism (shared with hydrodefs);
  * Rho8's random diagonal weight is splitmix64(cell*8 + i + SEED) mapped
    to [0,1) by (h >> 11) * 2^-53 — both mappings exact in float64, so
    the slope comparisons are bit-identical between numpy and DuckDB;
  * D8MassFlux efficiency is 0.5 on a sparse deterministic cell set
    (stages/pregel.eff_cell_mask, ~1/64 of cells) and 1.0 elsewhere: every
    intermediate flux is a dyadic rational whose mantissa fits float64
    (asserted at run time), which makes float addition exact and hence
    order-independent — the Pregel wave and the DuckDB per-path sum agree
    bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hydrodefs import (_GRAPH_CTES, _STREAM_CTES, _WALK_UNITS_CTE,
                         _d8_pointer, _hop_sql, STREAM_ACC_T)
from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query
from .sqlgen import sm64

_ROWS, _COLS = GRID1.rows, GRID1.cols
_N = _ROWS * _COLS

# D8 neighbour order (d8_pointer.rs:252-253): NE,E,SE,S,SW,W,NW,N
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


# --------------------------------------------------------------------------
# FindNoFlowCells (hydro_analysis/find_noflow_cells.rs:207-223): flag cells
# with NO lower valid 8-neighbour (the reference emits 1 there and nodata
# elsewhere; absent row == nodata).
# --------------------------------------------------------------------------
def _lower_arms(tbl: str = "cells") -> str:
    """UNION ALL of the 8 equi-joined neighbour directions selecting cells
    with a strictly lower neighbour (hash joins — the portable NOT EXISTS
    spelling forces a quadratic nested loop in DuckDB 1.0)."""
    return " UNION ALL ".join(
        f"SELECT a.cell_id FROM {tbl} a JOIN {tbl} b "
        f"ON b.r = a.r + ({_DY[i]}) AND b.c = a.c + ({_DX[i]}) "
        f"WHERE b.v < a.v"
        for i in range(8))


@query(
    "find_noflow_cells",
    f"""
    WITH {_CELLS_CTE},
    lower_c AS (SELECT DISTINCT cell_id FROM ({_lower_arms()}))
    SELECT a.cell_id, CAST(1 AS BIGINT) AS noflow
    FROM cells a LEFT JOIN lower_c l ON l.cell_id = a.cell_id
    WHERE l.cell_id IS NULL
    """,
)
def find_noflow_cells(sf_dir: str):
    """FindNoFlowCells: one 3x3 halo stencil — a pure map at any scale."""
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        lower = np.zeros((nr, nc), bool)
        for i in range(8):
            zn = padded[1 + _DY[i]:1 + _DY[i] + nr, 1 + _DX[i]:1 + _DX[i] + nc]
            lower |= zn < z  # NaN halo compares False
        return {"noflow": (~lower).astype(np.float64)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    out = stencil_3x3(tiles, GRID1, kern)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[df["noflow"] > 0, "cell_id"].to_numpy(np.int64),
            "noflow": np.ones(int((df["noflow"] > 0).sum()), np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# FindParallelFlow (hydro_analysis/find_parallel_flow.rs): a stream cell is
# "parallel" when any 8-neighbour stream cell carries the SAME D8 pointer
# code, unless that neighbour is straight up/downstream of the cell
# (z != outflowing[n], zn != inflowing[n]). Output 1/0 per stream cell.
# --------------------------------------------------------------------------
def _parallel_sql() -> str:
    arms = []
    for n in range(8):
        outv = 1 << n
        inv = 1 << ((n + 4) % 8)
        arms.append(
            f"SELECT a.cell_id FROM pcode a "
            f"JOIN pcode nb ON nb.r = a.r + ({_DY[n]}) AND nb.c = a.c + ({_DX[n]}) "
            f"JOIN stream sa ON sa.cell_id = a.cell_id "
            f"JOIN stream sn ON sn.cell_id = nb.cell_id "
            f"WHERE a.code <> {outv} AND nb.code = a.code AND nb.code <> {inv}")
    return f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    pcode AS (
      SELECT c.cell_id, c.r, c.c, COALESCE(b.code, 0) AS code
      FROM cells c LEFT JOIN best b ON b.cell_id = c.cell_id
    ),
    par AS (SELECT DISTINCT cell_id FROM ({' UNION ALL '.join(arms)}))
    SELECT s.cell_id,
           CAST(CASE WHEN p.cell_id IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS parallel
    FROM stream s LEFT JOIN par p ON p.cell_id = s.cell_id
    """


@query("find_parallel_flow", _parallel_sql())
def find_parallel_flow(sf_dir: str):
    """FindParallelFlow: one k=2 halo stencil computes the D8 code of the
    centre AND its ring-1 neighbours from the 5x5 z-window (the pointer is
    a pure function of the 3x3 window), emitting (cell, matching-neighbour)
    candidate rows; the stream mask (accumulation >= threshold, broadcast
    as a sorted id array) then filters both endpoints. No joins wider than
    the candidate rows."""
    import ray as _ray

    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flow_accumulation_pregel
    from ..stages.raster import synth_raster_tiles, window_exchange
    from ..stages.spatial_join import _cached_get

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    acc = flow_accumulation_pregel(dds, GRID1)
    sc = acc.map_batches(
        lambda df: pd.DataFrame({"k": df.loc[df["acc"] >= STREAM_ACC_T, "cell_id"]
                                 .to_numpy(np.int64)}),
        batch_format="pandas").to_pandas()
    stream_set = np.sort(sc["k"].to_numpy(np.int64))
    sref = _ray.put(stream_set)

    def codes(padded: np.ndarray) -> np.ndarray:
        """D8 codes for the interior of ``padded`` shrunk by one ring;
        cells whose own z is NaN get -999 (off-grid sentinel)."""
        h, w = padded.shape
        z = padded[1:h - 1, 1:w - 1]
        best = np.full(z.shape, -np.inf)
        code = np.zeros(z.shape, np.int64)
        lens = [np.sqrt(2.0), 1.0] * 4
        for i in range(8):
            zn = padded[1 + _DY[i]:h - 1 + _DY[i], 1 + _DX[i]:w - 1 + _DX[i]]
            slope = (z - zn) / lens[i]
            ok = ~np.isnan(zn) & (slope > 0) & (slope > best)
            best = np.where(ok, slope, best)
            code = np.where(ok, np.int64(1 << i), code)
        return np.where(np.isnan(z), np.int64(-999), code)

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        ss = _cached_get(sref)

        def in_stream(ids: np.ndarray) -> np.ndarray:
            if not len(ss):
                return np.zeros(ids.shape, bool)
            pos = np.minimum(np.searchsorted(ss, ids), len(ss) - 1)
            return ss[pos] == ids

        cd = codes(padded)              # (nr+2, nc+2), ring-1 halo codes
        z = cd[1:nr + 1, 1:nc + 1]
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cid = (rr.astype(np.int64) * _COLS + cc.astype(np.int64))
        par = np.zeros((nr, nc), bool)
        for n in range(8):
            zn = cd[1 + _DY[n]:1 + _DY[n] + nr, 1 + _DX[n]:1 + _DX[n] + nc]
            cand = (z != (1 << n)) & (zn == z) & (zn != (1 << ((n + 4) % 8))) \
                & (zn >= 0)
            nid = cid + _DY[n] * _COLS + _DX[n]
            par |= cand & in_stream(nid)
        keep = in_stream(cid)
        return pd.DataFrame({"cell_id": cid[keep],
                             "parallel": par[keep].astype(np.int64)})

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=2)


# --------------------------------------------------------------------------
# BreachPits / BreachSingleCellPits (hydro_analysis/breach_pits.rs:199-229):
# for every pit (no lower 8-neighbour), each lower ring-2 cell i writes
# (z + zn)/2 into the intermediate ring-1 cell breachcell[i]; the
# reference's sequential row-major scan makes overlapping writes
# last-write-wins — replicated exactly with seq = pit_cell*16 + i.
# --------------------------------------------------------------------------
_DX2 = (2, 2, 2, 2, 2, 1, 0, -1, -2, -2, -2, -2, -2, -1, 0, 1)
_DY2 = (-2, -1, 0, 1, 2, 2, 2, 2, 2, 1, 0, -1, -2, -2, -2, -2)
_BC = (0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 0)


def _breach_pits_sql() -> str:
    offs = ", ".join(
        f"({i}, {_DY2[i]}, {_DX2[i]}, {_DY[_BC[i]]}, {_DX[_BC[i]]})"
        for i in range(16))
    return f"""
    WITH {_CELLS_CTE},
    offs(i, dy2, dx2, bdy, bdx) AS (VALUES {offs}),
    lower_c AS (SELECT DISTINCT cell_id FROM ({_lower_arms()})),
    pits AS (
      SELECT a.cell_id, a.r, a.c, a.v FROM cells a
      LEFT JOIN lower_c l ON l.cell_id = a.cell_id
      WHERE l.cell_id IS NULL
    ),
    writes AS (
      SELECT (p.r + o.bdy) * {_COLS} + (p.c + o.bdx) AS cell_id,
             (CAST(p.v AS DOUBLE) + CAST(z2.v AS DOUBLE)) / 2.0 AS val,
             p.cell_id * 16 + o.i AS seq
      FROM pits p
      JOIN offs o ON TRUE
      JOIN cells z2 ON z2.r = p.r + o.dy2 AND z2.c = p.c + o.dx2
      WHERE z2.v < p.v
    ),
    merged AS (
      SELECT cell_id, val, seq FROM writes
      UNION ALL
      SELECT cell_id, CAST(v AS DOUBLE) AS val, CAST(-1 AS BIGINT) AS seq
      FROM cells
    )
    SELECT cell_id, val AS z FROM merged
    QUALIFY row_number() OVER (PARTITION BY cell_id ORDER BY seq DESC) = 1
    """


@query("breach_pits", _breach_pits_sql())
def breach_pits(sf_dir: str):
    """BreachPits: one k=2 halo stencil emits base rows + breach-write rows
    (targets may sit in a neighbouring tile — window_exchange rows are
    routed by cell); the winner per cell is the max-seq row, folded with a
    distributed integer max over seq*2048 + (z + zn) (values are integral,
    so the packed value decodes exactly)."""
    from ..relational import partial_agg
    from ..stages.raster import synth_raster_tiles, window_exchange

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        z = padded[2:nr + 2, 2:nc + 2]
        lower = np.zeros((nr, nc), bool)
        for i in range(8):
            zn = padded[2 + _DY[i]:2 + _DY[i] + nr, 2 + _DX[i]:2 + _DX[i] + nc]
            lower |= zn < z
        pit = ~lower & ~np.isnan(z)
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cid = rr.astype(np.int64) * _COLS + cc.astype(np.int64)
        zi = z.astype(np.int64, copy=False)  # values integral by construction
        base = pd.DataFrame({"cell_id": cid.ravel(),
                             "pack": (-2048 + 2 * np.where(np.isnan(z), 0, zi)
                                      ).ravel().astype(np.int64)})
        outs = [base[~np.isnan(z).ravel()]]
        for i in range(16):
            zn2 = padded[2 + _DY2[i]:2 + _DY2[i] + nr,
                         2 + _DX2[i]:2 + _DX2[i] + nc]
            w = pit & (zn2 < z)
            if not w.any():
                continue
            tgt = cid[w] + _DY[_BC[i]] * _COLS + _DX[_BC[i]]
            seq = cid[w] * 16 + i
            outs.append(pd.DataFrame({
                "cell_id": tgt,
                "pack": seq * 2048 + zi[w] + zn2[w].astype(np.int64)}))
        return pd.concat(outs, ignore_index=True)

    tiles = synth_raster_tiles(GRID1, _value_fn)
    rows = window_exchange(tiles, GRID1, window_fn, k=2)
    agg = partial_agg(rows, ["cell_id"], [("pack", "max", "pack")])

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        p = df["pack"].to_numpy(np.int64)
        z = np.where(p >= 0, (p % 2048) / 2.0, (p + 2048) / 2.0)
        return pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64),
                             "z": z})

    return agg.map_batches(decode, batch_format="pandas")


# --------------------------------------------------------------------------
# Rho8Pointer (hydro_analysis/rho8_pointer.rs:257-283): D8 with the
# diagonal grid length replaced by (2 - rho), rho ~ U[0,1) — here rho is
# splitmix64(cell*8 + i + 777) mapped by (h >> 11) * 2^-53, exact in both
# numpy and DuckDB, making the argmax bit-deterministic.
# --------------------------------------------------------------------------
_RHO_SEED = 777


def _rho8_sql() -> str:
    arms = []
    for i in range(8):
        if i % 2 == 1:  # cardinal
            den = "1.0"
        else:
            h = sm64(f"CAST(a.cell_id * 8 + {i} + {_RHO_SEED} AS UBIGINT)")
            den = (f"(2.0 - CAST(({h} >> 11) AS DOUBLE) * POWER(2.0, -53))")
        arms.append(
            f"SELECT a.cell_id, {i} AS i, CAST({1 << i} AS BIGINT) AS code, "
            f"(a.v - b.v) / {den} AS slope "
            f"FROM cells a JOIN cells b "
            f"ON b.r = a.r + ({_DY[i]}) AND b.c = a.c + ({_DX[i]})")
    return f"""
    WITH {_CELLS_CTE},
    slopes AS ({' UNION ALL '.join(arms)}),
    best AS (
      SELECT cell_id, code FROM slopes WHERE slope > 0
      QUALIFY row_number() OVER (PARTITION BY cell_id
                                 ORDER BY slope DESC, i ASC) = 1
    )
    SELECT c.cell_id, COALESCE(b.code, 0) AS rho8
    FROM cells c LEFT JOIN best b ON b.cell_id = c.cell_id
    """


@query("rho8_pointer", _rho8_sql())
def rho8_pointer(sf_dir: str):
    """Rho8Pointer: one 3x3 halo stencil, vectorized splitmix64 per
    (cell, diagonal)."""
    from ..sources.synthetic import splitmix64
    from ..stages.raster import synth_raster_tiles, window_exchange

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        z = padded[1:nr + 1, 1:nc + 1]
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cid = rr.astype(np.int64) * _COLS + cc.astype(np.int64)
        best = np.full((nr, nc), -np.inf)
        code = np.zeros((nr, nc), np.int64)
        for i in range(8):
            zn = padded[1 + _DY[i]:1 + _DY[i] + nr, 1 + _DX[i]:1 + _DX[i] + nc]
            if i % 2 == 1:
                den = 1.0
            else:
                h = splitmix64((cid * 8 + i + _RHO_SEED).astype(np.uint64))
                den = 2.0 - (h >> np.uint64(11)).astype(np.float64) * 2.0 ** -53
            slope = (z - zn) / den
            ok = ~np.isnan(zn) & (slope > 0) & (slope > best)
            best = np.where(ok, slope, best)
            code = np.where(ok, np.int64(1 << i), code)
        return pd.DataFrame({"cell_id": cid.ravel(),
                             "rho8": np.where(np.isnan(z), 0, code).ravel()
                             .astype(np.int64)})[~np.isnan(z).ravel()]

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=1)


# --------------------------------------------------------------------------
# D8MassFlux (hydro_analysis/d8_mass_flux.rs): out(n) = load(n) +
# sum_{u -> n} eff(u) * (out(u) - abs(u)). With eff in {1, 0.5} on the
# sparse eff_cell_mask set, every value is a dyadic rational: computed as
# int64 fixed-point (2^30) through ONE weighted accumulation — mass(u) =
# (load(u) - abs(u)) << (30 - C(u)), where C(u) counts eff-cells on the
# path [u, outlet) (the doubling walk with step weight "eff"); then
# out_fp(n) = load(n)<<30 + (A(n) - mass(n)) << C(n).
# --------------------------------------------------------------------------
def _mf_load(c: np.ndarray) -> np.ndarray:
    return 10 + (c * 13 + 7) % 100


def _mf_abs(c: np.ndarray) -> np.ndarray:
    return (c * 29 + 3) % 10


_MF_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    walkc(start, cur, ce) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM graph
      UNION ALL
      SELECT w.start, g.down_id,
             w.ce + CASE WHEN (w.cur * 2654435761) % 64 = 0 THEN 1 ELSE 0 END
      FROM walkc w JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    contrib AS (
      SELECT w.cur AS cell_id,
             SUM(CAST(10 + (w.start * 13 + 7) % 100 - (w.start * 29 + 3) % 10
                      AS DOUBLE) * POWER(2.0, -CAST(w.ce AS DOUBLE))) AS infl
      FROM walkc w WHERE w.cur <> w.start GROUP BY w.cur
    )
    SELECT c.cell_id,
           CAST(10 + (c.cell_id * 13 + 7) % 100 AS DOUBLE)
           + COALESCE(ct.infl, 0.0) AS flux
    FROM cells c LEFT JOIN contrib ct ON ct.cell_id = c.cell_id
"""


@query("d8_mass_flux", _MF_SQL)
def d8_mass_flux(sf_dir: str):
    """D8MassFlux: C(x) via the eff-weighted doubling walk, one weighted
    accumulation over scaled integer masses, exact at any parallelism."""
    from ..stages.flow import down_ds_from_pointer, tile_of_expr
    from ..stages.pregel import (ShardedGraph, eff_cell_mask,
                                 weighted_accumulation_pregel)

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    with ShardedGraph(dds, GRID1) as g:
        cds = g.flowpath_length(weight="eff").materialize()

    def masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        C = df["len_units"].to_numpy(np.int64)
        if len(C) and C.max() > 22:
            raise AssertionError(
                f"mass-flux halving bound violated (max C = {C.max()}): "
                "values would leave the exact-dyadic range")
        m = (_mf_load(cid) - _mf_abs(cid)) << (30 - C)
        return pd.DataFrame({"cell_id": cid,
                             "tile": tile_of_expr(cid, GRID1, 64),
                             "mass": m})

    mds = cds.map_batches(masses, batch_format="pandas")
    acc = weighted_accumulation_pregel(dds, mds, GRID1)
    j = acc.join(cds, join_type="inner", num_partitions=8, on=("cell_id",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        A = df["acc"].to_numpy(np.int64)
        C = df["len_units"].to_numpy(np.int64)
        m = (_mf_load(cid) - _mf_abs(cid)) << (30 - C)
        out_fp = (_mf_load(cid) << 30) + ((A - m) << C)
        return pd.DataFrame({"cell_id": cid,
                             "flux": out_fp.astype(np.float64) * 2.0 ** -30})

    return j.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# AverageFlowpathSlope (hydro_analysis/average_flowpath_slope.rs:300-404):
# per cell, the reference accumulates (1) the total D8 edge length of the
# upstream tree, (2) the number of upstream divide (in-degree-0) cells,
# (3) their total elevation, then outputs atan of the mean gradient. The
# three integer sufficient statistics ARE the contract here (the atan is a
# client-side scalar); each is one weighted accumulation.
# --------------------------------------------------------------------------
_AFS_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE},
    edges AS (
      SELECT g.cell_id AS a, g.down_id AS b,
             {_hop_sql('g.cell_id', 'g.down_id')} AS u
      FROM graph g WHERE g.down_id >= 0
    ),
    tfl AS (
      SELECT w.cur AS cell_id, CAST(SUM(e.u) AS BIGINT) AS tfl_units
      FROM edges e JOIN walku w ON w.start = e.b GROUP BY w.cur
    ),
    divides AS (
      SELECT c.cell_id, c.v FROM cells c
      WHERE NOT EXISTS (SELECT 1 FROM graph g WHERE g.down_id = c.cell_id)
    ),
    dv AS (
      SELECT w.cur AS cell_id, COUNT(*) AS n_div,
             CAST(SUM(d.v) AS BIGINT) AS div_elev_sum
      FROM divides d JOIN walku w ON w.start = d.cell_id GROUP BY w.cur
    )
    SELECT c.cell_id, COALESCE(t.tfl_units, 0) AS tfl_units,
           dv.n_div, dv.div_elev_sum
    FROM cells c
    LEFT JOIN tfl t ON t.cell_id = c.cell_id
    JOIN dv ON dv.cell_id = c.cell_id
"""


@query("avg_flowpath_slope_components", _AFS_SQL)
def avg_flowpath_slope_components(sf_dir: str):
    """Two weighted accumulations: (a) incoming-edge hop units assigned to
    the edge TARGET (inclusive accumulation = the upstream-tree edge-length
    sum), (b) divide-cell indicator packed with divide elevation
    (n_div * 2^27 + v: the field sums cannot carry across — total v sum
    < 2^26 on GRID1)."""
    from ..relational import partial_agg
    from ..stages.flow import (_indeg_state, down_ds_from_pointer,
                               tile_of_expr)
    from ..stages.pregel import weighted_accumulation_pregel

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()

    def emit_edge_masses(df: pd.DataFrame) -> pd.DataFrame:
        # mass = (incoming-edge hop sum) << 18 | 1: the low counter keeps
        # every cell's accumulated mass strictly positive (the drain routes
        # only positive deltas and emits only acc>0 rows), and the field
        # sums cannot carry (n_upstream <= 61200 < 2^18)
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        t = df["tile"].to_numpy(np.int64)
        base = pd.DataFrame({"cell_id": cid, "tile": t,
                             "mass": np.ones(len(cid), np.int64)})
        m = down >= 0
        diag = (cid[m] // _COLS != down[m] // _COLS) \
            & (cid[m] % _COLS != down[m] % _COLS)
        hop = np.where(diag, np.int64(1482910), np.int64(1 << 20))
        incr = pd.DataFrame({"cell_id": down[m],
                             "tile": tile_of_expr(down[m], GRID1, 64),
                             "mass": hop << 18})
        return pd.concat([base, incr], ignore_index=True)

    m1 = partial_agg(dds.map_batches(emit_edge_masses, batch_format="pandas"),
                     ["cell_id", "tile"], [("mass", "sum", "mass")])
    tfl = weighted_accumulation_pregel(dds, m1, GRID1).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64),
                                 "tfl_units": df["acc"].to_numpy(np.int64) >> 18}),
        batch_format="pandas")

    ind = _indeg_state(dds, GRID1, 64)

    def emit_div_masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        isdiv = df["n_inflow"].to_numpy(np.int64) == 0
        v = _value_fn(cid).astype(np.int64)
        return pd.DataFrame({"cell_id": cid,
                             "tile": df["tile"].to_numpy(np.int64),
                             "mass": np.where(isdiv, (1 << 27) + v, 0)})

    m2 = ind.map_batches(emit_div_masses, batch_format="pandas")
    dv = weighted_accumulation_pregel(dds, m2, GRID1)
    j = tfl.join(dv, join_type="inner", num_partitions=8, on=("cell_id",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        packed = df["acc"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "tfl_units": df["tfl_units"].to_numpy(np.int64),
            "n_div": packed >> 27,
            "div_elev_sum": packed & ((1 << 27) - 1)})

    return j.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# FlowLengthDiff (hydro_analysis/flow_length_diff.rs): max |dfl(c)-dfl(n)|
# over the 4 CARDINAL neighbours (n odd in the D8 order), integer units.
# --------------------------------------------------------------------------
_FLD_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE},
    dfl AS (
      SELECT start AS cell_id, start // {_COLS} AS r, start % {_COLS} AS c,
             MAX(units) AS L
      FROM walku GROUP BY start
    )
    SELECT a.cell_id, CAST(MAX(abs(a.L - b.L)) AS BIGINT) AS fld_units
    FROM dfl a JOIN dfl b
      ON (abs(b.r - a.r) + abs(b.c - a.c)) = 1
    GROUP BY a.cell_id
"""


@query("flow_length_diff", _FLD_SQL)
def flow_length_diff(sf_dir: str):
    """FlowLengthDiff: flowpath lengths from the doubling-walk Pregel, then
    one tile-grouped exchange delivers each cell's length to its 4 cardinal
    neighbours (no raster-wide join)."""
    from ..stages.flow import down_ds_from_pointer, tile_of_expr
    from ..stages.pregel import flowpath_length_pregel

    dfl = flowpath_length_pregel(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        L = df["len_units"].to_numpy(np.int64)
        r, c = cid // _COLS, cid % _COLS
        outs = [pd.DataFrame({"cell_id": cid, "kind": np.int64(0), "val": L})]
        for dy, dx in ((0, 1), (1, 0), (0, -1), (-1, 0)):
            ok = (r + dy >= 0) & (r + dy < _ROWS) & (c + dx >= 0) & (c + dx < _COLS)
            outs.append(pd.DataFrame({
                "cell_id": (r[ok] + dy) * _COLS + (c[ok] + dx),
                "kind": np.int64(1), "val": L[ok]}))
        out = pd.concat(outs, ignore_index=True)
        out["tile"] = tile_of_expr(out["cell_id"].to_numpy(np.int64), GRID1, 64)
        return out

    rows = dfl.map_batches(emit, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["kind"] == 0].set_index("cell_id")["val"]
        nb = g[g["kind"] == 1]
        diff = (nb["cell_id"].map(own) - nb["val"]).abs()
        res = diff.groupby(nb["cell_id"]).max()
        return pd.DataFrame({"cell_id": res.index.to_numpy(np.int64),
                             "fld_units": res.to_numpy(np.int64)})

    return rows.groupby("tile").map_groups(merge, batch_format="pandas")


# --------------------------------------------------------------------------
# LongestFlowpath (hydro_analysis/longest_flowpath.rs, vector output): per
# basin the maximum flowpath length to the outlet plus its head cell
# (ties -> lowest head cell id; the packed-max trick keeps one exchange).
# --------------------------------------------------------------------------
_LFP_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE},
    term AS (
      SELECT w.start, w.cur AS outlet, w.units
      FROM walku w JOIN graph g ON g.cell_id = w.cur AND g.down_id < 0
    )
    SELECT outlet AS basin, units AS lfp_units, start AS head_cell
    FROM term
    QUALIFY row_number() OVER (PARTITION BY outlet
                               ORDER BY units DESC, start ASC) = 1
"""


@query("longest_flowpath", _LFP_SQL)
def longest_flowpath(sf_dir: str):
    """LongestFlowpath: ONE ShardedGraph load serves both the flowpath
    lengths and the basin labels; the per-basin winner is a packed integer
    max (units * 2^17 + (N-1-cell), exact)."""
    from ..relational import partial_agg
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import ShardedGraph

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    with ShardedGraph(dds, GRID1) as g:
        L = g.flowpath_length().materialize()
        B = g.basins().materialize()
    j = L.join(B, join_type="inner", num_partitions=8, on=("cell_id",))

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        u = df["len_units"].to_numpy(np.int64)
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({"basin": df["basin"].to_numpy(np.int64),
                             "pack": u * (1 << 17) + (_N - 1 - cid)})

    agg = partial_agg(j.map_batches(pack, batch_format="pandas"),
                      ["basin"], [("pack", "max", "pack")])

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        p = df["pack"].to_numpy(np.int64)
        return pd.DataFrame({"basin": df["basin"].to_numpy(np.int64),
                             "lfp_units": p >> 17,
                             "head_cell": _N - 1 - (p & ((1 << 17) - 1))})

    return agg.map_batches(decode, batch_format="pandas")


# --------------------------------------------------------------------------
# TraceDownslopeFlowpaths (hydro_analysis/trace_downslope_flowpaths.rs):
# mark every cell on the D8 path of any seed; the count of seed paths
# through each cell is one weighted accumulation (mass 1 at seeds).
# --------------------------------------------------------------------------
_TRACE_MOD = 997

_TRACE_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE}
    SELECT cur AS cell_id, COUNT(*) AS n_paths
    FROM walku WHERE start % {_TRACE_MOD} = 0
    GROUP BY cur
"""


@query("trace_downslope_flowpaths", _TRACE_SQL)
def trace_downslope_flowpaths(sf_dir: str):
    from ..stages.flow import down_ds_from_pointer, tile_of_expr
    from ..stages.pregel import weighted_accumulation_pregel

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()

    def masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({"cell_id": cid,
                             "tile": tile_of_expr(cid, GRID1, 64),
                             "mass": (cid % _TRACE_MOD == 0).astype(np.int64)})

    acc = weighted_accumulation_pregel(
        dds, dds.map_batches(masses, batch_format="pandas"), GRID1)
    return acc.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[df["acc"] > 0, "cell_id"].to_numpy(np.int64),
            "n_paths": df.loc[df["acc"] > 0, "acc"].to_numpy(np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# JensonSnapPourPoints (hydro_analysis/jenson_snap_pour_points.rs): snap
# each pour point to the nearest STREAM cell within the window (squared
# cell distance, ties -> lowest cell id).
# --------------------------------------------------------------------------
_JENSON_RADIUS = 4

_JENSON_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    pour_h AS (
      SELECT CAST(t.i AS BIGINT) AS pour_id,
             {sm64("CAST(t.i AS UBIGINT) + 909090")} AS h
      FROM range(12) t(i)
    ),
    pour AS (
      SELECT pour_id,
             (1 + CAST(h % {_ROWS - 2} AS BIGINT)) * {_COLS}
             + (1 + CAST({sm64('h')} % {_COLS - 2} AS BIGINT)) AS cell_id
      FROM pour_h
    )
    SELECT pour_id, snap_cell FROM (
      SELECT p.pour_id, s.cell_id AS snap_cell,
             row_number() OVER (
               PARTITION BY p.pour_id
               ORDER BY (s.cell_id // {_COLS} - p.cell_id // {_COLS})
                        * (s.cell_id // {_COLS} - p.cell_id // {_COLS})
                      + (s.cell_id % {_COLS} - p.cell_id % {_COLS})
                        * (s.cell_id % {_COLS} - p.cell_id % {_COLS}),
                        s.cell_id ASC) AS rn
      FROM pour p JOIN stream s
        ON abs(s.cell_id // {_COLS} - p.cell_id // {_COLS}) <= {_JENSON_RADIUS}
       AND abs(s.cell_id % {_COLS} - p.cell_id % {_COLS}) <= {_JENSON_RADIUS}
    ) WHERE rn = 1
"""


@query("jenson_snap_pour_points", _JENSON_SQL)
def jenson_snap_pour_points(sf_dir: str):
    """JensonSnapPourPoints: the tiny candidate-window rows join the
    accumulation Dataset (same shape as snap_pour_points — no raster
    broadcast)."""
    import ray.data

    from ..hydrodefs import _pour_cells
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flow_accumulation_pregel

    acc = flow_accumulation_pregel(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)
    rows = []
    for pid, cell in enumerate(_pour_cells().tolist()):
        r, c = cell // _COLS, cell % _COLS
        for dr in range(-_JENSON_RADIUS, _JENSON_RADIUS + 1):
            for dc in range(-_JENSON_RADIUS, _JENSON_RADIUS + 1):
                rr, cc = r + dr, c + dc
                if 0 <= rr < _ROWS and 0 <= cc < _COLS:
                    rows.append((pid, rr * _COLS + cc,
                                 dr * dr + dc * dc))
    cand = ray.data.from_pandas(
        pd.DataFrame(rows, columns=["pour_id", "cell_id", "d2"])).repartition(2)
    j = cand.join(acc, join_type="inner", num_partitions=4, on=("cell_id",))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["acc"] >= STREAM_ACC_T]
        g = g.sort_values(["d2", "cell_id"], ascending=True, kind="mergesort")
        return pd.DataFrame({"pour_id": [np.int64(g["pour_id"].iloc[0])],
                             "snap_cell": [np.int64(g["cell_id"].iloc[0])]})

    return j.groupby("pour_id").map_groups(pick, batch_format="pandas")


# --------------------------------------------------------------------------
# ElevationAboveStreamEuclidean (hydro_analysis/
# elevation_above_stream_euclidean.rs): z - z(euclidean-nearest stream
# cell); the sparse high-accumulation stream set (acc >= threshold) is
# broadcast and each tile runs the vectorized argmin (the
# euclidean_allocation kernel with an elevation payload).
# --------------------------------------------------------------------------
_EASE_T = 500

_EASE_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    shi AS MATERIALIZED (
      SELECT a.cell_id, a.cell_id // {_COLS} AS r, a.cell_id % {_COLS} AS c
      FROM acc a WHERE a.acc >= {_EASE_T}
    )
    SELECT cell_id, CAST(v - nearv AS BIGINT) AS ease FROM (
      SELECT c.cell_id, c.v, s.cell_id AS scell,
             ((s.cell_id * 1000003) % 1000) AS nearv,
             row_number() OVER (
               PARTITION BY c.cell_id
               ORDER BY (s.r - c.r) * (s.r - c.r) + (s.c - c.c) * (s.c - c.c),
                        s.cell_id ASC) AS rn
      FROM cells c JOIN shi s ON TRUE
    ) WHERE rn = 1
"""


@query("elevation_above_stream_euclidean", _EASE_SQL)
def elevation_above_stream_euclidean(sf_dir: str):
    import ray as _ray

    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flow_accumulation_pregel
    from ..stages.raster import synth_raster_tiles
    from ..stages.spatial_join import _cached_get

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    acc = flow_accumulation_pregel(dds, GRID1)
    sc = acc.map_batches(
        lambda df: pd.DataFrame({"k": df.loc[df["acc"] >= _EASE_T, "cell_id"]
                                 .to_numpy(np.int64)}),
        batch_format="pandas").to_pandas()
    sids = np.sort(sc["k"].to_numpy(np.int64))
    sref = _ray.put((sids, sids // _COLS, sids % _COLS,
                     _value_fn(sids).astype(np.int64)))

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def ease_tile(df: pd.DataFrame) -> pd.DataFrame:
        tids, trr, tcc, tv = _cached_get(sref)
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            dr = rr.ravel()[:, None] - trr[None, :]
            dc = cc.ravel()[:, None] - tcc[None, :]
            d2 = dr * dr + dc * dc
            best = np.argmin(d2, axis=1)  # ties -> first = lowest id
            cid = rr.ravel() * _COLS + cc.ravel()
            frames.append(pd.DataFrame({
                "cell_id": cid,
                "ease": _value_fn(cid).astype(np.int64) - tv[best]}))
        return pd.concat(frames)

    return tiles.map_batches(ease_tile, batch_format="pandas")
