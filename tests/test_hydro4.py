"""Hydro sweep #4 contracts that the SQL parity test cannot prove:

* d8_mass_flux exactness — the float64 flux values are EXACTLY the
  rational out(n) = load(n) + sum eff(u)(out(u) - abs(u)) recurrence
  (Fraction recomputation over the dense GRID1 D8 graph), i.e. the dyadic
  guard-band holds and the Pregel wave order cannot matter;
* the eff-weighted doubling walk (set_step_weight) counts eff-cells on
  [x, outlet) exactly (dense walk oracle);
* breach_pits last-write-wins replicates the reference's sequential
  row-major scan on a planted multi-pit fixture.
"""

from fractions import Fraction

import numpy as np
import pandas as pd

from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.rasterdefs import _value_fn

_ROWS, _COLS = GRID1.rows, GRID1.cols
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def _dense_down() -> np.ndarray:
    """Reference D8 down array over the GRID1 synthetic DEM (same argmax
    contract as pipelines.queries_raster.d8_pointer)."""
    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64)) \
        .reshape(_ROWS, _COLS)
    pad = np.full((_ROWS + 2, _COLS + 2), np.nan)
    pad[1:-1, 1:-1] = z
    best = np.full((_ROWS, _COLS), -np.inf)
    down = np.full((_ROWS, _COLS), -1, np.int64)
    lens = [np.sqrt(2.0), 1.0] * 4
    cid = np.arange(_ROWS * _COLS, dtype=np.int64).reshape(_ROWS, _COLS)
    for i in range(8):
        zn = pad[1 + _DY[i]:1 + _DY[i] + _ROWS, 1 + _DX[i]:1 + _DX[i] + _COLS]
        slope = (z - zn) / lens[i]
        ok = ~np.isnan(zn) & (slope > 0) & (slope > best)
        best = np.where(ok, slope, best)
        down = np.where(ok, cid + _DY[i] * _COLS + _DX[i], down)
    return down.ravel()


def test_mass_flux_is_exact_rational(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro4 import (_mf_abs,
                                                             _mf_load,
                                                             d8_mass_flux)
    from whitebox_tools_ray.stages.pregel import eff_cell_mask

    down = _dense_down()
    n = len(down)
    cells = np.arange(n, dtype=np.int64)
    load = _mf_load(cells)
    absv = _mf_abs(cells)
    eff = np.where(eff_cell_mask(cells), Fraction(1, 2), Fraction(1))

    # topological order (Kahn)
    indeg = np.zeros(n, np.int64)
    valid = down >= 0
    np.add.at(indeg, down[valid], 1)
    out = [Fraction(int(v)) for v in load]
    from collections import deque
    q = deque(np.flatnonzero(indeg == 0).tolist())
    seen = 0
    while q:
        c = q.popleft()
        seen += 1
        d = int(down[c])
        if d >= 0:
            out[d] += eff[c] * (out[c] - int(absv[c]))
            indeg[d] -= 1
            if indeg[d] == 0:
                q.append(d)
    assert seen == n  # DAG

    res = d8_mass_flux("/root/testdata/sf0.001").to_pandas() \
        .sort_values("cell_id").reset_index(drop=True)
    assert len(res) == n
    flux = res["flux"].to_numpy()
    for i in range(0, n, 617):  # dense spot-check; full loop is O(n) Fractions
        exact = out[i]
        assert flux[i] == float(exact), (i, flux[i], exact)
        # the float conversion itself must be exact (dyadic in range)
        assert Fraction(float(exact)) == exact, i


def test_eff_weighted_walk_counts(ray_session):
    import ray.data

    from whitebox_tools_ray.stages.flow import tile_of_expr
    from whitebox_tools_ray.stages.pregel import ShardedGraph, eff_cell_mask

    down = _dense_down()
    n = len(down)
    cells = np.arange(n, dtype=np.int64)
    dds = ray.data.from_pandas(pd.DataFrame({
        "cell_id": cells, "down_id": down,
        "tile": tile_of_expr(cells, GRID1, 64)})).repartition(4)
    with ShardedGraph(dds, GRID1) as g:
        got = g.flowpath_length(weight="eff").to_pandas() \
            .sort_values("cell_id")["len_units"].to_numpy()
        # and the default mode must be restored afterwards
        hops = g.flowpath_length().to_pandas() \
            .sort_values("cell_id")["len_units"].to_numpy()

    is_eff = eff_cell_mask(cells)
    want = np.zeros(n, np.int64)
    for c in range(n):
        cur, s = c, 0
        while down[cur] >= 0:
            s += int(is_eff[cur])
            cur = int(down[cur])
        want[c] = s
    assert np.array_equal(got, want)
    assert hops.max() > (1 << 20)  # real hop units again, not eff counts


def test_breach_pits_last_write_wins(ray_session):
    """Sequential reference scan vs the distributed packed-max fold."""
    from whitebox_tools_ray.pipelines.queries_hydro4 import (_BC, _DX2, _DY2,
                                                             breach_pits)

    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64)) \
        .reshape(_ROWS, _COLS)
    out = z.copy()
    for r in range(_ROWS):
        for c in range(_COLS):
            zc = z[r, c]
            pit = True
            for i in range(8):
                rr, cc = r + _DY[i], c + _DX[i]
                if 0 <= rr < _ROWS and 0 <= cc < _COLS and z[rr, cc] < zc:
                    pit = False
                    break
            if not pit:
                continue
            for i in range(16):
                rr, cc = r + _DY2[i], c + _DX2[i]
                if 0 <= rr < _ROWS and 0 <= cc < _COLS and z[rr, cc] < zc:
                    br, bc = r + _DY[_BC[i]], c + _DX[_BC[i]]
                    out[br, bc] = (zc + z[rr, cc]) / 2.0

    res = breach_pits("/root/testdata/sf0.001").to_pandas() \
        .sort_values("cell_id")
    assert len(res) == _ROWS * _COLS
    assert np.array_equal(res["z"].to_numpy(), out.ravel())
