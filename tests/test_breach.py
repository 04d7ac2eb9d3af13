"""BreachDepressionsLeastCost vs a full-grid brute-force oracle + drainage
properties on the planted-pit DEM."""

import heapq

import numpy as np
import pytest

from whitebox_tools_ray.layers import GRID1

_N8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _dense_breach_oracle(z2d: np.ndarray, max_dist: int) -> np.ndarray:
    """Independent whole-array implementation of the documented contract."""
    H, W = z2d.shape
    out = z2d.copy()
    # pits: strictly lower than all 8 present neighbours (border cells never)
    for pr in range(1, H - 1):
        for pc in range(1, W - 1):
            zp = z2d[pr, pc]
            if not all(z2d[pr + dr, pc + dc] > zp for dr, dc in _N8):
                continue
            # dijkstra, cost = sum max(0, z - zp), ties (cost, steps, index)
            best = {(pr, pc): (0.0, 0)}
            prev = {}
            heap = [(0.0, 0, pr * W + pc)]
            target = None
            while heap:
                cost, steps, idx = heapq.heappop(heap)
                u = (idx // W, idx % W)
                if best.get(u, (np.inf, 0))[0] < cost:
                    continue
                if z2d[u] < zp and u != (pr, pc):
                    target = u
                    break
                if steps >= max_dist:
                    continue
                for dr, dc in _N8:
                    vr, vc = u[0] + dr, u[1] + dc
                    if not (0 <= vr < H and 0 <= vc < W):
                        continue
                    if abs(vr - pr) > max_dist or abs(vc - pc) > max_dist:
                        continue
                    ncost = cost + max(0.0, float(z2d[vr, vc] - zp))
                    if (ncost, steps + 1) < best.get((vr, vc), (np.inf, 1 << 30)):
                        best[(vr, vc)] = (ncost, steps + 1)
                        prev[(vr, vc)] = u
                        heapq.heappush(heap, (ncost, steps + 1, vr * W + vc))
            if target is None:
                out[pr, pc] = min(z2d[pr + dr, pc + dc] for dr, dc in _N8)
                continue
            path = [target]
            while path[-1] != (pr, pc):
                path.append(prev[path[-1]])
            path.reverse()
            L = len(path) - 1
            zt = z2d[target]
            for i in range(1, L):
                rr, cc = path[i]
                ramp = int(zp) + (int(zt) - int(zp)) * i // L
                if ramp < out[rr, cc]:
                    out[rr, cc] = ramp
    return out


@pytest.mark.usefixtures("ray_session")
def test_breach_matches_dense_oracle_and_drains():
    from whitebox_tools_ray.pipelines.queries_hydro2 import (
        BREACH_MAX_DIST,
        _breach_z,
        breach_depressions,
    )

    got = breach_depressions("unused").to_pandas().sort_values("cell_id")
    n = GRID1.rows * GRID1.cols
    assert len(got) == n

    cells = np.arange(n, dtype=np.int64)
    z2d = _breach_z(cells).astype(np.int64).reshape(GRID1.rows, GRID1.cols)
    want = _dense_breach_oracle(z2d, BREACH_MAX_DIST)
    got2d = got["z"].to_numpy(np.int64).reshape(GRID1.rows, GRID1.cols)
    assert np.array_equal(got2d, want)

    # something actually happened: carves exist and differ from the base
    assert (got2d != z2d).sum() > 20

    # drainage property: every planted lattice pit now reaches strictly
    # lower ground than itself via a monotone descending D8 walk
    r0, c0 = GRID1.rows // 2, GRID1.cols // 2
    pits = [(r, c) for r in range(GRID1.rows) for c in range(GRID1.cols)
            if r % 48 == 17 and c % 48 == 29]
    for (pr, pc) in pits:
        zp = got2d[pr, pc]
        cur = (pr, pc)
        ok = False
        for _ in range(64):
            nbrs = [(got2d[cur[0] + dr, cur[1] + dc], cur[0] + dr, cur[1] + dc)
                    for dr, dc in _N8
                    if 0 <= cur[0] + dr < GRID1.rows and 0 <= cur[1] + dc < GRID1.cols]
            zmin, nr_, nc_ = min(nbrs)
            if zmin >= got2d[cur]:
                break
            cur = (nr_, nc_)
            if got2d[cur] < zp:
                ok = True
                break
        assert ok, f"pit {(pr, pc)} does not drain after breach"

    # the centre pit (no lower ground exists) took the FILL fallback
    assert got2d[r0, c0] == z2d[r0 - 1, c0 - 1:c0 + 2].min() or \
        got2d[r0, c0] > z2d[r0, c0]
    assert got2d[r0, c0] == min(z2d[r0 + dr, c0 + dc] for dr, dc in _N8)
