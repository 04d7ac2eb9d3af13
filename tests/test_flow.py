"""D8 flow algorithms vs brute-force oracles on a hand-checkable graph."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.grid import GridSpec
from whitebox_tools_ray.stages.flow import (
    basins_pointer_doubling,
    strahler,
)

G = GridSpec(west=0.0, north=20.0, res_x=1.0, res_y=1.0, rows=20, cols=30)


def random_forest(seed=3):
    """Random cycle-free down-pointers: each cell points to a strictly
    lower-indexed cell or is an outlet."""
    rng = np.random.default_rng(seed)
    n = G.rows * G.cols
    down = np.full(n, -1, np.int64)
    for v in range(1, n):
        if rng.random() < 0.9:
            down[v] = rng.integers(0, v)
    return down


def brute_acc(down):
    n = len(down)
    acc = np.zeros(n, np.int64)
    for v in range(n):
        cur = v
        while True:
            acc[cur] += 1
            if down[cur] < 0:
                break
            cur = down[cur]
    return acc


def brute_basin(down):
    n = len(down)
    out = np.empty(n, np.int64)
    for v in range(n):
        cur = v
        while down[cur] >= 0:
            cur = down[cur]
        out[v] = cur
    return out


def brute_strahler(down):
    n = len(down)
    children = {}
    for v in range(n):
        if down[v] >= 0:
            children.setdefault(int(down[v]), []).append(v)
    order = np.zeros(n, np.int64)

    import sys
    sys.setrecursionlimit(100000)

    def solve(v):
        if order[v]:
            return order[v]
        ch = children.get(v, [])
        if not ch:
            order[v] = 1
            return 1
        os_ = [solve(c) for c in ch]
        m = max(os_)
        order[v] = m + (os_.count(m) >= 2)
        return order[v]

    for v in range(n):
        solve(v)
    return order


def _down_ds(down):
    import ray.data

    from whitebox_tools_ray.stages.flow import tile_of_expr

    cells = np.arange(len(down), dtype=np.int64)
    return ray.data.from_pandas(pd.DataFrame({
        "cell_id": cells, "down_id": down,
        "tile": tile_of_expr(cells, G, 8)})).repartition(4)


@pytest.mark.usefixtures("ray_session")
def test_flow_accumulation_matches_bruteforce():
    from whitebox_tools_ray.stages.pregel import flow_accumulation_pregel

    down = random_forest()
    got = flow_accumulation_pregel(_down_ds(down), G, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")
    want = brute_acc(down)
    np.testing.assert_array_equal(got["acc"].to_numpy(), want)
    np.testing.assert_array_equal(got["cell_id"].to_numpy(),
                                  np.arange(len(down), dtype=np.int64))


@pytest.mark.usefixtures("ray_session")
def test_basins_pregel_matches_bruteforce():
    from whitebox_tools_ray.stages.pregel import basins_pregel

    down = random_forest(7)
    got = basins_pregel(_down_ds(down), G, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")
    np.testing.assert_array_equal(got["basin"].to_numpy(), brute_basin(down))


@pytest.mark.usefixtures("ray_session")
def test_strahler_pregel_matches_bruteforce():
    from whitebox_tools_ray.stages.pregel import strahler_pregel

    down = random_forest(11)
    got = strahler_pregel(_down_ds(down), G, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")
    np.testing.assert_array_equal(got["strahler"].to_numpy(), brute_strahler(down))


def test_basins_matches_bruteforce():
    down = random_forest(7)
    np.testing.assert_array_equal(basins_pointer_doubling(down), brute_basin(down))


def test_strahler_matches_bruteforce():
    down = random_forest(11)
    np.testing.assert_array_equal(strahler(down), brute_strahler(down))
    # hand case: two order-1 children -> order 2
    d2 = np.array([-1, 0, 0], np.int64)
    np.testing.assert_array_equal(strahler(d2), [2, 1, 1])
    # single chain stays order 1
    d3 = np.array([-1, 0, 1], np.int64)
    np.testing.assert_array_equal(strahler(d3), [1, 1, 1])
