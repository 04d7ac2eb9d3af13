"""Dense oracles for hydro sweep #6 rows-only entries."""

import numpy as np

from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.rasterdefs import _value_fn
from tests.test_flow import brute_priority_flood

SF = "/root/testdata/sf0.001"
_ROWS, _COLS = GRID1.rows, GRID1.cols


def test_fill_burn_matches_dense(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro6 import (_BURN,
                                                             _burned_sets,
                                                             _member,
                                                             fill_burn)

    n = _ROWS * _COLS
    cells = np.arange(n, dtype=np.int64)
    burn = _burned_sets()
    z = _value_fn(cells).astype(np.int64) \
        - np.where(_member(cells, burn), _BURN, 0)
    want = brute_priority_flood(z.astype(np.float64), _ROWS, _COLS) \
        .astype(np.int64)

    got = fill_burn(SF).to_pandas().sort_values("cell_id")
    assert len(got) == n
    assert np.array_equal(got["fill"].to_numpy(), want)
    # the burn actually changed the fill somewhere
    plain = brute_priority_flood(
        _value_fn(cells), _ROWS, _COLS).astype(np.int64)
    assert (want != plain).any()


def test_stochastic_depression_matches_dense(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro6 import (
        _SDA_N, _sda_noise, stochastic_depression_analysis)

    n = _ROWS * _COLS
    cells = np.arange(n, dtype=np.int64)
    want = np.zeros(n, np.int64)
    for i in range(_SDA_N):
        z = _value_fn(cells).astype(np.int64) * 4 + _sda_noise(cells, i)
        fill = brute_priority_flood(z.astype(np.float64), _ROWS, _COLS) \
            .astype(np.int64)
        want += (fill > z).astype(np.int64)

    got = stochastic_depression_analysis(SF).to_pandas() \
        .sort_values("cell_id")
    assert len(got) == n
    assert np.array_equal(got["ndep"].to_numpy(), want)
    assert want.max() >= 1  # some depressions actually flagged
