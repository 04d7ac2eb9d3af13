"""Shared synthetic-raster definitions (cycle-free: imported by several
pipelines modules AND shipped inside worker closures — must not import
pipelines.queries)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .grid import GridSpec
from .layers import GRID1


def _value_fn(cells: np.ndarray) -> np.ndarray:
    return ((cells.astype(np.int64) * 1000003) % 1000).astype(np.float64)


_CELLS_CTE = (
    f"cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id, "
    f"CAST(t.i // {GRID1.cols} AS BIGINT) AS r, CAST(t.i % {GRID1.cols} AS BIGINT) AS c, "
    f"((t.i * 1000003) % 1000) AS v FROM range({GRID1.rows * GRID1.cols}) t(i))"
)


def _devmax_scale_cte(mid: int) -> str:
    # equi-join offset arms (a BETWEEN range join is a ~60x slower IEJoin
    # here); the quirk's clamped lower bound only bites at the top/left
    # edges: row 0 / col 0 are excluded there
    arms = " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS z, b.v AS w FROM cells a JOIN cells b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc}) "
        f"WHERE (a.r >= {mid + 1} OR a.r + ({dr}) >= 1) "
        f"AND (a.c >= {mid + 1} OR a.c + ({dc}) >= 1)"
        for dr in range(-mid, mid + 1) for dc in range(-mid, mid + 1))
    return f"""
    s{mid} AS (
      SELECT cell_id, z, COUNT(*) AS n, SUM(w) AS s, SUM(w * w) AS ss
      FROM ({arms}) GROUP BY cell_id, z
    )"""


def _dda_sql(k: str, d: str, K: str) -> str:
    """Signed integer DDA offset along one axis: sign(d) * ((2k|d| + K) //
    (2K)) — positive-operand division only, so floor-vs-truncate division
    semantics cannot diverge between numpy and DuckDB."""
    return (f"(CASE WHEN {d} < 0 THEN -((2 * {k} * (-({d})) + {K}) // (2 * {K})) "
            f"ELSE ((2 * {k} * {d} + {K}) // (2 * {K})) END)")


# --- off-terrain-object shared kernel (used by queries_terrain12 AND
# queries_terrain13 at module scope; lives here so neither pipeline
# module from-imports the other — the r03 worker import-cycle class) ---
_FILT = 11
_MID = _FILT // 2
_GFLAG = 1 << 20          # ground flag in the packed state channel
_THR = tuple(2 if (dx and dy) else 1 for dx, dy in
             zip((1, 1, 1, 0, -1, -1, -1, 0), (-1, 0, 1, 1, 1, 0, -1, -1)))
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def tophat_state_tiles(grid: GridSpec, value_fn, *, tile: int = 64):
    """Tiles of the packed state: tophat + _GFLAG * seed(ground)."""
    from .stages.raster import (stencil_k, stencil_tiles_as_input,
                                 synth_raster_tiles)

    def erode(padded, nr, nc):
        out = np.full((nr, nc), np.inf)
        for dy in range(-_MID, _MID + 1):
            for dx in range(-_MID, _MID + 1):
                w = padded[_MID + dy:_MID + dy + nr, _MID + dx:_MID + dx + nc]
                out = np.fmin(out, np.where(np.isnan(w), np.inf, w))
        return {"ero": out}

    def dilate_tophat(padded, nr, nc):
        out = np.full((nr, nc), -np.inf)
        for dy in range(-_MID, _MID + 1):
            for dx in range(-_MID, _MID + 1):
                w = padded[_MID + dy:_MID + dy + nr, _MID + dx:_MID + dx + nc]
                out = np.fmax(out, np.where(np.isnan(w), -np.inf, w))
        return {"open": out}

    from .stages.raster import fuse_kernels

    fused = fuse_kernels(erode, "ero", dilate_tophat, _MID, _MID)
    tiles = synth_raster_tiles(grid, value_fn, tile=tile)
    opening = stencil_k(tiles, grid, fused, tile=tile, k=2 * _MID,
                        output="tiles")

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * tile, int(t.tcol) * tile
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            z = value_fn((rr * grid.cols + cc).ravel()).reshape(nr, nc)
            th = z - np.asarray(t.open, np.float64).reshape(nr, nc)
            state = th + _GFLAG * (th <= 1)
            rows.append({"tile_id": int(t.trow) * (-(-grid.cols // tile))
                         + int(t.tcol), "trow": int(t.trow),
                         "tcol": int(t.tcol), "nrows": nr, "ncols": nc,
                         "data": state.ravel()})
        return pd.DataFrame(rows)

    return opening.map_batches(pack, batch_format="pandas")




_SAR_DX = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
_SAR_DY = (-1, -1, -1, 0, 0, 0, 1, 1, 1)


def _horn_pq_sql(*, with_v: bool = False) -> str:
    """`pq` CTE over `cells`: the Horn 3x3 gradients p = dz/dx, q = dz/dy
    (terrain_analysis/slope.rs:272-326) as exact rationals (v is integer,
    denominator 8 on the unit grid). Interior cells only (the 8 joins).
    Lives in this leaf module because several pipeline modules consume it
    at decoration time."""
    joins = " ".join(
        f"JOIN cells n{k} ON n{k}.r = a.r + ({_SAR_DY[k]}) "
        f"AND n{k}.c = a.c + ({_SAR_DX[k]})"
        for k in range(9) if k != 4)
    p = ("(CAST((n2.v + 2 * n5.v + n8.v) - (n0.v + 2 * n3.v + n6.v) "
         "AS DOUBLE) / 8.0)")
    q = ("(CAST((n6.v + 2 * n7.v + n8.v) - (n0.v + 2 * n1.v + n2.v) "
         "AS DOUBLE) / 8.0)")
    v = "a.v, " if with_v else ""
    return f"""
    pq AS (
      SELECT a.cell_id, {v}{p} AS p, {q} AS q
      FROM cells a {joins}
    )"""


# ---------------------------------------------------------------------------
# Acklam inverse-normal (probit), numpy + SQL twins (moved here from
# pipelines/queries_image5 — leaf rule: queries_mathops5 consumes the SQL
# twin at decoration time for the turning-bands oracle).
# ---------------------------------------------------------------------------
_ACK_A = (-3.969683028665376e+01, 2.209460984245205e+02,
          -2.759285104469687e+02, 1.383577518672690e+02,
          -3.066479806614716e+01, 2.506628277459239e+00)
_ACK_B = (-5.447609879822406e+01, 1.615858368580409e+02,
          -1.556989798598866e+02, 6.680131188771972e+01,
          -1.328068155288572e+01)
_ACK_C = (-7.784894002430293e-03, -3.223964580411365e-01,
          -2.400758277161838e+00, -2.549732539343734e+00,
          4.374664141464968e+00, 2.938163982698783e+00)
_ACK_D = (7.784695709041462e-03, 3.224671290700398e-01,
          2.445134137142996e+00, 3.754408661907416e+00)
_ACK_PLOW = 0.02425


def _probit_np(p: np.ndarray) -> np.ndarray:
    a, b, c, d = _ACK_A, _ACK_B, _ACK_C, _ACK_D
    out = np.empty_like(p)
    lo = p < _ACK_PLOW
    hi = p > 1.0 - _ACK_PLOW
    mid = ~lo & ~hi
    q = np.sqrt(-2.0 * np.log(np.where(lo, p, 0.5)))
    out_lo = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
              + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q
                         + 1.0)
    qh = np.sqrt(-2.0 * np.log(np.where(hi, 1.0 - p, 0.5)))
    out_hi = -((((((c[0] * qh + c[1]) * qh + c[2]) * qh + c[3]) * qh + c[4])
                * qh + c[5])
               / ((((d[0] * qh + d[1]) * qh + d[2]) * qh + d[3]) * qh + 1.0))
    qm = p - 0.5
    rm = qm * qm
    out_mid = (((((a[0] * rm + a[1]) * rm + a[2]) * rm + a[3]) * rm + a[4])
               * rm + a[5]) * qm \
        / (((((b[0] * rm + b[1]) * rm + b[2]) * rm + b[3]) * rm + b[4]) * rm
           + 1.0)
    out[lo] = out_lo[lo]
    out[hi] = out_hi[hi]
    out[mid] = out_mid[mid]
    return out


def _probit_sql(p: str) -> str:
    a, b, c, d = _ACK_A, _ACK_B, _ACK_C, _ACK_D

    def poly(coefs, var):
        e = f"{coefs[0]!r}"
        for k in coefs[1:]:
            e = f"({e} * {var} + {k!r})"
        return e

    q = f"sqrt(-2.0 * ln({p}))"
    qh = f"sqrt(-2.0 * ln(1.0 - {p}))"
    qm = f"({p} - 0.5)"
    rm = f"({qm} * {qm})"
    lo = f"({poly(c, q)}) / ({poly(d, q)} * {q} + 1.0)"
    hi = f"-(({poly(c, qh)}) / ({poly(d, qh)} * {qh} + 1.0))"
    midv = f"({poly(a, rm)}) * {qm} / ({poly(b, rm)} * {rm} + 1.0)"
    return (f"CASE WHEN {p} < {_ACK_PLOW!r} THEN {lo} "
            f"WHEN {p} > {1.0 - _ACK_PLOW!r} THEN {hi} "
            f"ELSE {midv} END")


# ---------------------------------------------------------------------------
# Generic multiple-flow-direction fixed-point drain as SQL (FD8 and the
# Qin/Quinn plugin analogs; mirrors stages/pregel's conservation wave):
# every cell starts with 2^20 units; a resolved cell sends floor(m*w/2^20)
# to each downslope edge except the LAST in direction order, which gets the
# exact remainder. Jacobi over the DAG: cells of depth <= k are exact after
# k rounds, so `outer*steps` >= DAG depth makes the fixpoint exact int64.
# Requires a CTE `wpiv(cid, lastd, w0..w7)` (-1 = no edge) over the full
# cell universe; direction d = offs[d] (dr, dc).
# ---------------------------------------------------------------------------
def _mfd_drain_sql(offs, outer: int, steps: int = 2, one: int = 1 << 20,
                   init_mass: str | None = None,
                   fwd_expr: str = "m",
                   exact_weights: bool = False) -> str:
    """`init_mass` (default 2^20) is the per-cell loading expression over
    `cid`; `fwd_expr` (over `m` and `cid`) is the flux actually forwarded
    downstream — the dinf_mass_flux mode pays absorption then fixed-point
    efficiency: (m - absorp)*eff // 2^20 (recorded acc stays m)."""
    cols = GRID1.cols
    wlist = ", ".join(f"w{d}" for d in range(8))
    init = init_mass if init_mass is not None else str(one)

    def step(src: str) -> str:
        l0 = (f"SELECT iter, cid, lastd, m, {wlist}, "
              f"CAST({fwd_expr} AS BIGINT) AS fw FROM ({src})")
        snl = " + ".join(
            f"CASE WHEN w{d} >= 0 AND lastd != {d} "
            f"THEN (fw*w{d})//{one} ELSE 0 END" for d in range(8))
        l1 = (f"SELECT iter, cid, lastd, m, {wlist}, fw, ({snl}) AS snl "
              f"FROM ({l0})")
        if exact_weights:
            # MDInf mode (mdinf_flow_accum.rs): plain fixed-point products
            # on EVERY edge, no remainder conservation
            shares = ", ".join(
                f"CASE WHEN w{d} < 0 THEN NULL "
                f"ELSE (fw*w{d})//{one} END AS sh{d}" for d in range(8))
        else:
            shares = ", ".join(
                f"CASE WHEN w{d} < 0 THEN NULL WHEN lastd = {d} "
                f"THEN fw - snl "
                f"ELSE (fw*w{d})//{one} END AS sh{d}" for d in range(8))
        l2 = f"SELECT iter, cid, lastd, m, {wlist}, {shares} FROM ({l1})"
        inc = []
        for d, (dr, dc) in enumerate(offs):
            off = dr * cols + dc
            conds = []
            if dc == -1:
                conds.append(f"(cid % {cols}) < {cols - 1}")
            if dc == 1:
                conds.append(f"(cid % {cols}) > 0")
            pred = " AND ".join(conds) if conds else "TRUE"
            fn = "LEAD" if off < 0 else "LAG"
            inc.append(f"COALESCE(CASE WHEN {pred} THEN {fn}(sh{d}, "
                       f"{abs(off)}) OVER (ORDER BY cid) END, 0)")
        return (f"SELECT iter, cid, lastd, "
                f"CAST(({init}) + {' + '.join(inc)} AS BIGINT) AS m, "
                f"{wlist} FROM ({l2})")

    src = (f"SELECT iter, cid, lastd, m, {wlist} FROM relax_mfd "
           f"WHERE iter < {outer}")
    for _ in range(steps):
        src = step(src)
    return f"""relax_mfd(iter, cid, lastd, m, {wlist}) AS (
      SELECT 0, cid, lastd, CAST(({init}) AS BIGINT), {wlist} FROM wpiv
      UNION ALL
      SELECT iter+1, cid, lastd, m, {wlist} FROM ({src}) s
    ),
    mfd_acc AS MATERIALIZED (
      SELECT cid AS cell_id, m AS acc_units FROM relax_mfd
      WHERE iter = {outer}
    )"""


_MFD_OFFS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
             (1, 1))  # row-major scan order shared by the drain users


def _dinf_wpiv_ctes(zat) -> str:
    """CTEs dzc/fac/best/edg/wpiv computing the Tarboton D-infinity edge
    weights for an arbitrary integer dem: ``zat(off)`` returns the SQL for
    z at ``cid + off`` (and ``zat(0)`` the cell's own z). Branch selection
    and the first-max facet pick are boundary-safe (see the dinf oracle
    docstring in pipelines/queries_raster)."""
    cols, n = GRID1.cols, GRID1.rows * GRID1.cols
    one = 1 << 20
    quarter = repr(float(np.pi / 4.0))
    rt2 = repr(1.4142135623730951)
    facets = [((0, 1), (-1, 1)), ((-1, 0), (-1, 1)), ((-1, 0), (-1, -1)),
              ((0, -1), (-1, -1)), ((0, -1), (1, -1)), ((1, 0), (1, -1)),
              ((1, 0), (1, 1)), ((0, 1), (1, 1))]

    def valid(dr: int, dc: int) -> str:
        off = dr * cols + dc
        conds = [f"cid + ({off}) BETWEEN 0 AND {n - 1}"]
        if dc == -1:
            conds.append(f"(cid % {cols}) > 0")
        if dc == 1:
            conds.append(f"(cid % {cols}) < {cols - 1}")
        return " AND ".join(conds)

    arms = []
    for f, ((d1r, d1c), (d2r, d2c)) in enumerate(facets):
        o1, o2 = d1r * cols + d1c, d2r * cols + d2c
        z1, z2 = zat(o1), zat(o2)
        s1 = f"CAST(z - {z1} AS DOUBLE)"
        s2 = f"CAST({z1} - {z2} AS DOUBLE)"
        rang = f"ATAN2({s2}, {s1})"
        s = (f"CASE WHEN {rang} < 0.0 THEN {s1} "
             f"WHEN {rang} > {quarter} THEN CAST(z - {z2} AS DOUBLE)/{rt2} "
             f"ELSE SQRT({s1}*{s1} + {s2}*{s2}) END")
        rc = (f"CASE WHEN {rang} < 0.0 THEN 0.0 "
              f"WHEN {rang} > {quarter} THEN {quarter} ELSE {rang} END")
        arms.append(
            f"SELECT cid, z, {f} AS f, {s} AS s, {rc} AS rang, "
            f"cid + ({o1}) AS e1, cid + ({o2}) AS e2 "
            f"FROM dzc WHERE {valid(d1r, d1c)} AND {valid(d2r, d2c)}")
    diridx = {dr * cols + dc: d for d, (dr, dc) in enumerate(_MFD_OFFS)}
    d1case = "CASE best.e1 - best.cid " + " ".join(
        f"WHEN {d1r * cols + d1c} THEN {diridx[d1r * cols + d1c]}"
        for (d1r, d1c), _ in facets) + " END"
    d2case = "CASE best.e2 - best.cid " + " ".join(
        f"WHEN {d2r * cols + d2c} THEN {diridx[d2r * cols + d2c]}"
        for _, (d2r, d2c) in facets) + " END"
    wcols = ", ".join(
        f"COALESCE(CASE WHEN e.d1 = {d} AND e.w1 > 0 THEN e.w1 "
        f"WHEN e.d2 = {d} AND e.w2 > 0 THEN e.w2 END, -1) AS w{d}"
        for d in range(8))
    return f"""dzc AS MATERIALIZED (
      SELECT CAST(t.i AS BIGINT) AS cid, {zat(0).replace('cid', 't.i')} AS z
      FROM range({n}) t(i)
    ),
    fac AS MATERIALIZED ({' UNION ALL '.join(arms)}),
    best AS MATERIALIZED (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY cid
                     ORDER BY s DESC, f ASC) AS rn
        FROM fac) WHERE rn = 1 AND s > 0
    ),
    edg AS MATERIALIZED (
      SELECT best.cid,
             CAST(FLOOR(best.rang / {quarter} * {one} + 0.5) AS BIGINT)
                 AS w2,
             {one} - CAST(FLOOR(best.rang / {quarter} * {one} + 0.5)
                          AS BIGINT) AS w1,
             {d1case} AS d1, {d2case} AS d2
      FROM best
    ),
    wpiv AS MATERIALIZED (
      SELECT c.cid,
             COALESCE(CASE WHEN e.w2 > 0 THEN e.d2
                           WHEN e.w1 > 0 THEN e.d1 END, -1) AS lastd,
             {wcols}
      FROM dzc c LEFT JOIN edg e ON e.cid = c.cid
    )"""
