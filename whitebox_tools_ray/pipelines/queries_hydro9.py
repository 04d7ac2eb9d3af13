"""Hydro sweep #9 — the last two flow-accumulation variants:
MDInfFlowAccumulation (hydro_analysis/mdinf_flow_accum.rs) and
DInfMassFlux (hydro_analysis/dinf_mass_flux.rs).

MDInf (Seibert & McGlynn 2007) routes flow to up to 8 receivers through
triangular facet slopes raised to an exponent; the per-cell weight kernel
is fully local (stages/pregel.FlowShard.mdinf_load, vectorized facet
math) and the accumulation rides the existing fd8 topological shard wave
in exact-weights mode — the reference forwards fa*weights[i] only to
DOWNSLOPE neighbours and silently drops the weight share of facet corners
that are uphill, so the drain deliberately does NOT re-conserve mass.

DInfMassFlux composes loading/efficiency/absorption rasters with the
Tarboton D-infinity split: recorded value = loading + inflows; forwarded
flux = (value - absorption) * efficiency. Integer loading/absorption,
2^20 fixed-point efficiency, floor rounding — the documented deterministic
contract replicated by the scalar oracle in tests/test_hydro9.py.

Both rows-only (facet trig is libm); scalar-literal oracles in
tests/test_hydro9.py, full-grid entries here.
"""

from __future__ import annotations

import numpy as np

from ..layers import GRID1
from ..rasterdefs import _value_fn
from .queries import query

FD8_ONE = 1 << 20


def _mf_load_fn(cids: np.ndarray) -> np.ndarray:
    cids = np.asarray(cids, np.int64)
    return (10 + cids % 5) * FD8_ONE // 1  # integer loading units


def _mf_eff_fn(cids: np.ndarray) -> np.ndarray:
    cids = np.asarray(cids, np.int64)
    return FD8_ONE * (4 + cids % 4) // 8  # efficiency 0.5 .. 0.875


def _mf_absorp_fn(cids: np.ndarray) -> np.ndarray:
    cids = np.asarray(cids, np.int64)
    return (cids % 3) * FD8_ONE // 4  # absorption < loading


def _mdinf_sql() -> str:
    """MDInf oracle: the Seibert-McGlynn facet pipeline as per-cell SQL
    expressions — facet normals/aspect (ATAN branch margins >= 0.0033),
    valley take conditions (the rf equality branches compare exact clamp
    literals), exponent 1.1 shares normalized and floor-rounded (guard
    0.0015), drained in exact-weights mode (no remainder — the reference
    drops uphill facet-corner shares). 360 Jacobi steps (depth <= 333)."""
    from ..rasterdefs import _MFD_OFFS, _mfd_drain_sql

    cols, n = GRID1.cols, GRID1.rows * GRID1.cols
    one = FD8_ONE
    xd = (0, -1, -1, -1, 0, 1, 1, 1)
    yd = (-1, -1, 0, 1, 1, 1, 0, -1)
    dd = [1.0 if i % 2 == 0 else 1.4142135623730951 for i in range(8)]
    qpi = float(np.pi / 4.0)
    pi = float(np.pi)

    def zn(j: int) -> str:
        off = yd[j] * cols + xd[j]
        conds = [f"cid + ({off}) BETWEEN 0 AND {n - 1}"]
        if xd[j] == -1:
            conds.append(f"(cid % {cols}) > 0")
        if xd[j] == 1:
            conds.append(f"(cid % {cols}) < {cols - 1}")
        return (f"CASE WHEN {' AND '.join(conds)} "
                f"THEN CAST(((cid + ({off}))*1000003)%1000 AS DOUBLE) END")

    zn_cols = ", ".join(f"{zn(j)} AS zn{j}" for j in range(8))
    fac_cols = []
    for cdx in range(8):
        i, ii = cdx, (cdx + 1) % 8
        nzc = float(xd[i] * yd[ii] - xd[ii] * yd[i])
        nx = f"({yd[i]}*(zn{ii} - z) - {yd[ii]}*(zn{i} - z))"
        ny = f"({xd[ii]}*(zn{i} - z) - {xd[i]}*(zn{ii} - z))"
        hr = (f"CASE WHEN {nx} = 0.0 THEN "
              f"(CASE WHEN {ny} >= 0.0 THEN 0.0 ELSE {pi!r} END) "
              f"WHEN {nx} >= 0.0 THEN {pi / 2.0!r} - ATAN({ny}/{nx}) "
              f"ELSE {3.0 * pi / 2.0!r} - ATAN({ny}/{nx}) END")
        hs = (f"(-TAN(ACOS({nzc!r} / "
              f"SQRT({nx}*{nx} + {ny}*{ny} + {nzc * nzc!r}))))")
        outside = (f"(({hr}) < CAST({i * qpi!r} AS DOUBLE) "
                   f"OR ({hr}) > CAST({(i + 1) * qpi!r} AS DOUBLE))")
        use1 = f"(zn{i} < zn{ii})"
        rf_b = (f"CASE WHEN {outside} THEN (CASE WHEN {use1} "
                f"THEN CAST({i * qpi!r} AS DOUBLE) ELSE CAST({ii * qpi!r} AS DOUBLE) END) "
                f"ELSE ({hr}) END")
        hs_b = (f"CASE WHEN {outside} THEN (CASE WHEN {use1} "
                f"THEN (z - zn{i})/{dd[i]!r} ELSE (z - zn{ii})/{dd[ii]!r} "
                f"END) ELSE ({hs}) END")
        both = f"(zn{i} IS NOT NULL AND zn{ii} IS NOT NULL)"
        one1 = f"(zn{ii} IS NULL AND zn{i} IS NOT NULL AND zn{i} < z)"
        fac_cols.append(
            f"CASE WHEN {both} THEN ({rf_b}) "
            f"WHEN {one1} THEN CAST({float(i) / 4.0 * pi!r} AS DOUBLE) ELSE 0.0 END "
            f"AS rf{cdx}")
        fac_cols.append(
            f"CASE WHEN {both} THEN ({hs_b}) "
            f"WHEN {one1} THEN (z - zn{i})/{dd[ii]!r} END AS sf{cdx}")
    vly_cols = []
    for cdx in range(8):
        i, ii, ip = cdx, (cdx + 1) % 8, (cdx + 7) % 8
        inside = (f"(rf{i} > CAST({i * qpi!r} AS DOUBLE) "
                  f"AND rf{i} < CAST({(i + 1) * qpi!r} AS DOUBLE))")
        same = f"(rf{i} = rf{ii})"
        b1 = f"(sf{ii} IS NULL AND rf{i} = CAST({(i + 1) * qpi!r} AS DOUBLE))"
        b2 = f"(sf{ip} IS NULL AND rf{i} = CAST({i * qpi!r} AS DOUBLE))"
        vly_cols.append(
            f"CASE WHEN sf{i} IS NOT NULL AND sf{i} > 0 "
            f"AND ({inside} OR {same} OR {b1} OR {b2}) "
            f"THEN POWER(sf{i}, 1.1) ELSE 0.0 END AS v{cdx}")
    vsum = "0.0"
    for cdx in range(8):
        vsum = f"({vsum} + v{cdx})"
    vn_cols = ", ".join(
        f"CASE WHEN vsum > 0 THEN v{c}/vsum ELSE 0.0 END AS vn{c}"
        for c in range(8))
    rf7 = ("CASE WHEN rf7 = 0.0 THEN CAST(" + repr(2.0 * pi)
           + " AS DOUBLE) ELSE rf7 END")
    w_exprs = []
    for d in range(8):
        i, ip = d, (d + 7) % 8
        rfi = rf7 if i == 7 else f"rf{i}"
        rfp = rf7 if ip == 7 else f"rf{ip}"
        a = (f"CASE WHEN vn{i} > 0 THEN vn{i} * "
             f"(CAST({(i + 1) * qpi!r} AS DOUBLE) - {rfi})/{qpi!r} ELSE 0.0 END")
        b = (f"CASE WHEN vn{ip} > 0 THEN vn{ip} * "
             f"({rfp} - CAST({ip * qpi!r} AS DOUBLE))/{qpi!r} ELSE 0.0 END")
        w_exprs.append(f"(({a}) + ({b})) AS wgt{d}")
    diridx = {dr * cols + dc: d for d, (dr, dc) in enumerate(_MFD_OFFS)}
    wcols = []
    for d, (dr, dc) in enumerate(_MFD_OFFS):
        j = next(j for j in range(8) if (yd[j], xd[j]) == (dr, dc))
        wcols.append(
            f"CASE WHEN zn{j} IS NOT NULL AND zn{j} < z "
            f"THEN CAST(FLOOR(wgt{j}*{one} + 0.5) AS BIGINT) "
            f"ELSE -1 END AS w{d}")
    return f"""
    WITH RECURSIVE mz AS MATERIALIZED (
      SELECT CAST(t.i AS BIGINT) AS cid,
             CAST((t.i*1000003)%1000 AS DOUBLE) AS z FROM range({n}) t(i)
    ),
    mzn AS MATERIALIZED (SELECT cid, z, {zn_cols} FROM mz),
    fct AS MATERIALIZED (SELECT cid, z, {', '.join(
        f'zn{j}' for j in range(8))}, {', '.join(fac_cols)} FROM mzn),
    vly AS MATERIALIZED (SELECT *, {', '.join(vly_cols)} FROM fct),
    vs AS MATERIALIZED (SELECT *, {vsum} AS vsum FROM vly),
    vn AS MATERIALIZED (SELECT *, {vn_cols} FROM vs),
    wdbl AS MATERIALIZED (SELECT *, {', '.join(w_exprs)} FROM vn),
    wpiv AS MATERIALIZED (
      SELECT cid, CAST(-1 AS BIGINT) AS lastd, {', '.join(wcols)} FROM wdbl
    ),
    {_mfd_drain_sql(_MFD_OFFS, 180, 2, exact_weights=True)}
    SELECT cell_id, acc_units FROM mfd_acc
    """


@query("mdinf_flow_accum", _mdinf_sql())
def mdinf_flow_accum(sf_dir: str):
    """MDInfFlowAccumulation (hydro_analysis/mdinf_flow_accum.rs:440-605):
    'cells' out_type, exponent 1.1, convergence threshold off. Output
    (cell_id, acc_units) with acc_units in 2^20ths of a cell. SQL oracle:
    _mdinf_sql (facet expressions + exact-weights drain); scalar
    facet/weight oracle on a small grid in tests/test_hydro9.py."""
    from ..stages.pregel import mdinf_accumulation_pregel

    return mdinf_accumulation_pregel(_value_fn, GRID1, exponent=1.1)


def _dmf_sql() -> str:
    """DInfMassFlux oracle: the shared Tarboton edge CTEs over the
    _value_fn dem + the drain in mass-flux mode — per-cell loading as the
    init mass, forwarded flux = (m - absorption) * efficiency // 2^20
    (recorded acc stays loading + inflows). DAG depth <= 333 on this
    surface; 360 steps budgeted."""
    from ..rasterdefs import _dinf_wpiv_ctes, _mfd_drain_sql, _MFD_OFFS

    def zat(off: int) -> str:
        if off == 0:
            return "((cid*1000003)%1000)"
        return f"(((cid + ({off}))*1000003)%1000)"

    one = FD8_ONE
    load = f"(10 + cid % 5) * {one}"
    eff = f"({one} * (4 + cid % 4) // 8)"
    absorp = f"((cid % 3) * {one} // 4)"
    fwd = f"(m - {absorp}) * {eff} // {one}"
    return f"""
    WITH RECURSIVE {_dinf_wpiv_ctes(zat)},
    {_mfd_drain_sql(_MFD_OFFS, 180, 2, init_mass=load, fwd_expr=fwd)}
    SELECT cell_id, acc_units FROM mfd_acc
    """


@query("dinf_mass_flux", _dmf_sql())
def dinf_mass_flux(sf_dir: str):
    """DInfMassFlux (hydro_analysis/dinf_mass_flux.rs): loading 10..14
    cells, efficiency 0.5..0.875, absorption 0..0.5 over the synthetic
    DEM's D-infinity field. Output (cell_id, acc_units) = loading +
    inflows in 2^20 fixed-point units. SQL oracle: _dmf_sql (shared edge
    CTEs, mass-flux drain mode); scalar oracle in tests/test_hydro9.py."""
    from ..stages.pregel import dinf_mass_flux_pregel

    return dinf_mass_flux_pregel(_value_fn, _mf_load_fn, _mf_eff_fn,
                                 _mf_absorp_fn, GRID1)
