"""Shard-actor cost distance vs a global Dijkstra oracle (exact int64)."""

import heapq

import numpy as np
import pytest

from whitebox_tools_ray.grid import GridSpec

G = GridSpec(west=0.0, north=24.0, res_x=1.0, res_y=1.0, rows=24, cols=36)


def brute_dijkstra(cost, sources):
    n = G.rows * G.cols
    INF = np.iinfo(np.int64).max
    dist = np.full(n, INF, np.int64)
    heap = [(0, int(s)) for s in sources]
    dist[sources] = 0
    while heap:
        d, v = heapq.heappop(heap)
        if d > dist[v]:
            continue
        r, c = v // G.cols, v % G.cols
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < G.rows and 0 <= nc < G.cols:
                u = nr * G.cols + nc
                nd = d + int(cost[v]) + int(cost[u])
                if nd < dist[u]:
                    dist[u] = nd
                    heapq.heappush(heap, (nd, u))
    return dist


@pytest.mark.usefixtures("ray_session")
def test_cost_distance_matches_dijkstra():
    """Random (non-structured) costs against the brute oracle — the pregel
    kernel is the only live cost-distance path (stages/costdist.py was a
    superseded driver-side prototype, deleted round 5)."""
    from whitebox_tools_ray.stages.pregel import cost_distance_pregel

    rng = np.random.default_rng(6)
    n = G.rows * G.cols
    cost = rng.integers(1, 20, n).astype(np.int64)
    sources = np.array([5, n // 2, n - 7], np.int64)

    def cost_fn(cids):
        return cost[np.asarray(cids, np.int64)]

    got_df = cost_distance_pregel(cost_fn, sources, G, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")
    want = brute_dijkstra(cost, sources)
    got = np.full(n, np.iinfo(np.int64).max, np.int64)
    got[got_df["cell_id"].to_numpy()] = got_df["cost_dist2"].to_numpy()
    np.testing.assert_array_equal(got, want)
    assert (got[sources] == 0).all()
    assert got.max() < np.iinfo(np.int64).max  # fully connected grid


@pytest.mark.usefixtures("ray_session")
def test_cost_distance_pregel_matches_dijkstra():
    """The shard-actor cost distance must equal a global single-heap
    Dijkstra exactly (integer weights)."""
    import heapq

    import ray.data  # noqa: F401

    from whitebox_tools_ray.stages.pregel import cost_distance_pregel

    G2 = GridSpec(west=0.0, north=20.0, res_x=1.0, res_y=1.0, rows=40, cols=50)
    n = G2.rows * G2.cols
    cells = np.arange(n, dtype=np.int64)
    cost = (1 + (cells * 13) % 5).astype(np.int64)
    sources = cells[(cells * 37) % 101 == 0]

    def cost_fn(cids):
        return (1 + (cids.astype(np.int64) * 13) % 5).astype(np.int64)

    got = cost_distance_pregel(cost_fn, sources, G2, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")

    INF = 1 << 62
    best = np.full(n, INF, np.int64)
    heap = []
    for s in sources:
        best[s] = 0
        heapq.heappush(heap, (0, int(s)))
    while heap:
        d, v = heapq.heappop(heap)
        if d > best[v]:
            continue
        r, c = v // G2.cols, v % G2.cols
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if not (0 <= nr < G2.rows and 0 <= nc < G2.cols):
                continue
            u = nr * G2.cols + nc
            nd = d + int(cost[v]) + int(cost[u])
            if nd < best[u]:
                best[u] = nd
                heapq.heappush(heap, (nd, u))
    ok = best < INF
    np.testing.assert_array_equal(got["cell_id"].to_numpy(), cells[ok])
    np.testing.assert_array_equal(got["cost_dist2"].to_numpy(), best[ok])
