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


@query("mdinf_flow_accum")
def mdinf_flow_accum(sf_dir: str):
    """MDInfFlowAccumulation (hydro_analysis/mdinf_flow_accum.rs:440-605):
    'cells' out_type, exponent 1.1, convergence threshold off. Output
    (cell_id, acc_units) with acc_units in 2^20ths of a cell. Rows-only;
    scalar facet/weight oracle on a small grid in tests/test_hydro9.py."""
    from ..stages.pregel import mdinf_accumulation_pregel

    return mdinf_accumulation_pregel(_value_fn, GRID1, exponent=1.1)


@query("dinf_mass_flux")
def dinf_mass_flux(sf_dir: str):
    """DInfMassFlux (hydro_analysis/dinf_mass_flux.rs): loading 10..14
    cells, efficiency 0.5..0.875, absorption 0..0.5 over the synthetic
    DEM's D-infinity field. Output (cell_id, acc_units) = loading +
    inflows in 2^20 fixed-point units. Rows-only; scalar oracle in
    tests/test_hydro9.py."""
    from ..stages.pregel import dinf_mass_flux_pregel

    return dinf_mass_flux_pregel(_value_fn, _mf_load_fn, _mf_eff_fn,
                                 _mf_absorp_fn, GRID1)
