"""Brute-force oracles for the plugin-crate analogs that are not
SQL-expressible (the Qin/Quinn MFD accumulations) plus sanity checks for
the raster expression engine."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _brute_mfd_acc(kind: str) -> dict[int, int]:
    """Dense Kahn-queue MFD accumulation with the fd8 fixed-point
    conservation semantics (2^20 units/cell, last-edge remainder),
    independent scalar implementation."""
    from whitebox_tools_ray.pipelines.queries_plugins import (
        _mfd_weights, _COLS, _ROWS)

    n = _ROWS * _COLS
    cells = np.arange(n, dtype=np.int64)
    ci, tgts, w_fp, pending = _mfd_weights(cells, _ROWS, _COLS, kind)
    ONE = 1 << 20
    outs: dict[int, list] = {}
    for s, t, w in zip(ci.tolist(), tgts.tolist(), w_fp.tolist()):
        outs.setdefault(int(s), []).append((int(t), int(w)))
    pend = pending.astype(np.int64).copy()
    mass = np.full(n, ONE, dtype=object)
    acc: dict[int, int] = {}
    queue = [c for c in range(n) if pend[c] == 0]
    while queue:
        c = queue.pop()
        acc[c] = int(mass[c])
        m = int(mass[c])
        edges = outs.get(c, [])
        shares = [m * w // ONE for _, w in edges]
        if shares:
            shares[-1] = m - sum(shares[:-1])
        for (t, _w), u in zip(edges, shares):
            mass[t] += u
            pend[t] -= 1
            if pend[t] == 0:
                queue.append(t)
    assert len(acc) == n
    return acc


@pytest.mark.parametrize("kind", ["qin", "quinn"])
def test_mfd_accumulation_matches_brute(ray_session, kind):
    from whitebox_tools_ray.pipelines.queries_plugins import (
        qin_flow_accum, quinn_flow_accum)

    fn = qin_flow_accum if kind == "qin" else quinn_flow_accum
    got = fn(SF).to_pandas().sort_values("cell_id").reset_index(drop=True)
    want = _brute_mfd_acc(kind)
    assert len(got) == len(want)
    cid = got["cell_id"].to_numpy(np.int64)
    np.testing.assert_array_equal(
        got["acc_units"].to_numpy(np.int64),
        np.array([want[int(c)] for c in cid], np.int64))


def test_raster_expression_rejects_unknown_names(ray_session):
    from whitebox_tools_ray.layers import GRID1
    from whitebox_tools_ray.stages.rastercalc import raster_expression

    with pytest.raises(ValueError):
        raster_expression(GRID1, {"z": lambda c: c}, "z + evil_name")


def test_rho8_pointer_is_valid_neighbour(ray_session):
    from whitebox_tools_ray.pipelines.queries_plugins import (
        rho8_down, _COLS)

    cells = np.arange(5000, dtype=np.int64)
    down = rho8_down(cells)
    m = down >= 0
    dr = np.abs(down[m] // _COLS - cells[m] // _COLS)
    dc = np.abs(down[m] % _COLS - cells[m] % _COLS)
    assert (np.maximum(dr, dc) == 1).all()
    # derandomized jitter: pointers deterministic across calls
    np.testing.assert_array_equal(down, rho8_down(cells))


def test_tsp_tour_is_locally_optimal_permutation(ray_session):
    from whitebox_tools_ray.pipelines.queries_plugins import (
        _tsp_sites, travelling_salesman_problem)

    got = travelling_salesman_problem(SF).to_pandas() \
        .sort_values("order_idx")
    tour = got["site_id"].to_numpy(np.int64)
    sites = _tsp_sites()
    assert sorted(tour.tolist()) == sorted(sites["site_id"].tolist())
    x = sites["x"].to_numpy(np.float64)
    y = sites["y"].to_numpy(np.float64)

    def d(a, b):
        return float(np.hypot(x[a] - x[b], y[a] - y[b]))

    n = len(tour)
    # 2-opt local optimality: no single segment reversal shortens the tour
    for i in range(1, n - 1):
        for j in range(i + 1, n):
            a, b = tour[i - 1], tour[i]
            c, e = tour[j], tour[(j + 1) % n]
            if a == e:
                continue
            assert d(a, c) + d(b, e) >= d(a, b) + d(c, e) - 1e-9
