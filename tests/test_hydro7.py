"""Independent priority-flood equality for the two fill variants."""

import numpy as np

from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.rasterdefs import _value_fn
from tests.test_flow import brute_priority_flood

SF = "/root/testdata/sf0.001"
_ROWS, _COLS = GRID1.rows, GRID1.cols


def _want() -> np.ndarray:
    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64))
    return brute_priority_flood(z, _ROWS, _COLS).astype(np.int64)


def test_planchon_darboux_matches_priority_flood(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro7 import \
        fill_depressions_planchon_darboux

    got = fill_depressions_planchon_darboux(SF).to_pandas() \
        .sort_values("cell_id")
    assert len(got) == _ROWS * _COLS
    assert np.array_equal(got["fill"].to_numpy(), _want())


def test_wang_liu_matches_priority_flood(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro7 import \
        fill_depressions_wang_liu

    got = fill_depressions_wang_liu(SF).to_pandas().sort_values("cell_id")
    assert len(got) == _ROWS * _COLS
    assert np.array_equal(got["fill"].to_numpy(), _want())
