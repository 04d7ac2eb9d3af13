"""Dense oracles for hydro sweep #5 rows-only entries."""

import numpy as np
import pandas as pd

from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.rasterdefs import _value_fn
from tests.test_flow import brute_priority_flood
from tests.test_hydro4 import _dense_down

SF = "/root/testdata/sf0.001"
_ROWS, _COLS = GRID1.rows, GRID1.cols


def test_dinf_pointer_hand_fixture():
    """Hand-computed facet: centre 10, E=8, NE=9, everything else higher ->
    facet 0 wins with r = 0 (the atan(s2/s1) < 0 clamp), compass 90 deg."""
    from whitebox_tools_ray.pipelines.queries_hydro5 import dinf_facet_dir

    z = np.array([[20.0, 20.0, 9.0],
                  [20.0, 10.0, 8.0],
                  [20.0, 20.0, 20.0]])
    pad = np.full((5, 5), np.nan)
    pad[1:4, 1:4] = z

    def nb(dr, dc):
        return pad[2 + dr:3 + dr, 2 + dc:3 + dc]

    deg = dinf_facet_dir(z[1:2, 1:2], nb)
    assert deg.shape == (1, 1)
    assert deg[0, 0] == 90.0


def test_dinf_pointer_matches_dense(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro5 import (dinf_facet_dir,
                                                             dinf_pointer)

    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64)) \
        .reshape(_ROWS, _COLS)
    pad = np.full((_ROWS + 2, _COLS + 2), np.nan)
    pad[1:-1, 1:-1] = z

    def nb(dr, dc):
        return pad[1 + dr:1 + dr + _ROWS, 1 + dc:1 + dc + _COLS]

    want = np.floor(dinf_facet_dir(z, nb) * 1e6 + 0.5).astype(np.int64)

    got = dinf_pointer(SF).to_pandas().sort_values("cell_id")
    assert len(got) == _ROWS * _COLS
    assert np.array_equal(got["angle_micro"].to_numpy(), want.ravel())


def test_upslope_depression_storage_matches_dense(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro5 import \
        upslope_depression_storage

    n = _ROWS * _COLS
    z = _value_fn(np.arange(n, dtype=np.int64)).astype(np.int64)
    fill = brute_priority_flood(z.astype(np.float64), _ROWS, _COLS) \
        .astype(np.int64)
    depth = fill - z
    down = _dense_down()

    # inclusive upslope accumulation of (depth, 1) by topological waves
    indeg = np.zeros(n, np.int64)
    valid = down >= 0
    np.add.at(indeg, down[valid], 1)
    dsum = depth.copy()
    cnt = np.ones(n, np.int64)
    from collections import deque
    q = deque(np.flatnonzero(indeg == 0).tolist())
    while q:
        c = q.popleft()
        d = int(down[c])
        if d >= 0:
            dsum[d] += dsum[c]
            cnt[d] += cnt[c]
            indeg[d] -= 1
            if indeg[d] == 0:
                q.append(d)

    got = upslope_depression_storage(SF).to_pandas().sort_values("cell_id")
    assert len(got) == n
    assert np.array_equal(got["depth_sum"].to_numpy(), dsum)
    assert np.array_equal(got["n_up"].to_numpy(), cnt)
