"""The _fill_cte SQL oracle (Jacobi minimax relaxation, fixed step budget)
must agree bit-for-bit with an INDEPENDENT global heapq priority flood
(Barnes et al. 2014) on every dem registered with a fill-family oracle.
This is the convergence guard: if a dem ever needed more steps than its
budget, equality would break here before the driver could see a mismatch.
Driver-side only — no Ray."""

import heapq

import duckdb
import numpy as np

from whitebox_tools_ray.hydrodefs import (_FILL_DEM_PITS, _FILL_DEM_VALUE,
                                          _fill_cte)
from whitebox_tools_ray.layers import GRID1

ROWS, COLS = GRID1.rows, GRID1.cols


def _priority_flood(z: np.ndarray) -> np.ndarray:
    big = np.int64(1) << 40
    w = np.full((ROWS, COLS), big, np.int64)
    border = np.zeros((ROWS, COLS), bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    w[border] = z[border]
    heap = [(int(w[i, j]), i, j) for i, j in zip(*np.nonzero(border))]
    heapq.heapify(heap)
    while heap:
        v, i, j = heapq.heappop(heap)
        if v > w[i, j]:
            continue
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                ni, nj = i + di, j + dj
                if 0 <= ni < ROWS and 0 <= nj < COLS:
                    cand = max(int(z[ni, nj]), v)
                    if cand < w[ni, nj]:
                        w[ni, nj] = cand
                        heapq.heappush(heap, (cand, ni, nj))
    return w


def _dem(expr_np) -> np.ndarray:
    cid = np.arange(ROWS * COLS, dtype=np.int64)
    return expr_np(cid).reshape(ROWS, COLS)


def _dem_pits(cid):
    r, c = cid // COLS, cid % COLS
    z = 100 + (cid * 7919) % 400
    pit = ((r > 40) & (r < 50) & (c > 60) & (c < 75)) | \
        ((r > 100) & (r < 115) & (c > 200) & (c < 220))
    return np.where(pit, 5, z)


CASES = [
    # (sql dem expr, numpy dem, outer budget) — budgets match the entries
    (_FILL_DEM_PITS, _dem_pits, 40),
    (_FILL_DEM_VALUE, lambda cid: (cid * 1000003) % 1000, 50),
    ("(cid*2654435761)%1000003", lambda cid: (cid * 2654435761) % 1000003, 48),
]


def test_cost_cte_matches_dijkstra():
    from whitebox_tools_ray.hydrodefs import _cost_cte

    sql = (f"WITH RECURSIVE {_cost_cte()} "
           "SELECT cell_id, cost_dist2 FROM costw ORDER BY cell_id")
    got = duckdb.sql(sql).df()["cost_dist2"].to_numpy(np.int64)
    n = ROWS * COLS
    cid = np.arange(n, dtype=np.int64)
    cost = 1 + (cid * 31) % 7
    big = np.int64(1) << 40
    dist = np.full(n, big, np.int64)
    src = np.nonzero((cid * 7919) % 509 == 0)[0]
    dist[src] = 0
    heap = [(0, int(i)) for i in src]
    heapq.heapify(heap)
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist[u]:
            continue
        r, c = u // COLS, u % COLS
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < ROWS and 0 <= nc < COLS:
                v = nr * COLS + nc
                nd = d + cost[u] + cost[v]
                if nd < dist[v]:
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
    assert np.array_equal(got, dist)


def test_fill_sql_matches_priority_flood():
    for expr, npfn, outer in CASES:
        sql = (f"WITH RECURSIVE {_fill_cte(expr, outer)} "
               "SELECT cell_id, fill FROM fillw ORDER BY cell_id")
        got = duckdb.sql(sql).df()["fill"].to_numpy(np.int64)
        truth = _priority_flood(_dem(npfn)).ravel()
        assert np.array_equal(got, truth), expr
