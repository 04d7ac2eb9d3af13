"""Cost distance (gis_analysis/cost_distance.rs): accumulated least cost
from source cells over a cost surface.

The reference runs a single-process Dijkstra-style propagation over the
whole raster. Distributed plan: label-correcting TILE SWEEPS — each round,
every tile with new seed values runs a local Dijkstra over its cells plus a
1-cell halo (costs + current best values of neighbouring tiles' border
cells); improvements to halo cells become the neighbouring tiles' seeds for
the next round. Costs are positive, so the sweep converges in at most
(number of tiles a least-cost path crosses) rounds.

Semantics here: 4-neighbour moves, integer edge weight = cost(a) + cost(b)
(i.e. 2x the reference's average-cost formula with unit spacing) — keeping
the whole computation in int64 makes results bit-exact at any parallelism
and under any tie-breaking. The 8-neighbour float variant is a parameter
away; the tile-sweep machinery is identical.

Global best-so-far state lives on the driver here (one int64 per cell; at
extreme scale it is co-partitioned with the tiles instead).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray
import ray.data

from ..grid import GridSpec

INF = np.iinfo(np.int64).max


def cost_distance(cost: np.ndarray, sources: np.ndarray, grid: GridSpec, *,
                  tile: int = 64, max_rounds: int = 200) -> np.ndarray:
    """cost: dense int64 per cell (>0); sources: cell ids with distance 0.
    Returns dense int64 distances (INF where unreachable)."""
    n = grid.rows * grid.cols
    tcols = -(-grid.cols // tile)
    best = np.full(n, INF, np.int64)
    best[sources] = 0
    cost_ref = ray.put(cost)

    def tile_of(cid: np.ndarray) -> np.ndarray:
        return (cid // grid.cols // tile) * tcols + (cid % grid.cols // tile)

    seeds = pd.DataFrame({"cell": sources.astype(np.int64),
                          "dist": np.zeros(len(sources), np.int64)})

    for _ in range(max_rounds):
        if seeds.empty:
            break
        seeds["tile"] = tile_of(seeds["cell"].to_numpy())
        # ship current best values for the affected tiles + halo
        affected = np.unique(seeds["tile"].to_numpy())
        best_ref = ray.put(best)

        def sweep(g: pd.DataFrame) -> pd.DataFrame:
            from .spatial_join import _cached_get

            cost_ = _cached_get(cost_ref)
            best_ = ray.get(best_ref)  # fresh each round (not cached)
            tid = int(g["tile"].iloc[0])
            tr, tc = tid // tcols, tid % tcols
            r0, c0 = tr * tile, tc * tile
            r1 = min(r0 + tile, grid.rows)
            c1 = min(c0 + tile, grid.cols)
            hr0, hc0 = max(r0 - 1, 0), max(c0 - 1, 0)
            hr1, hc1 = min(r1 + 1, grid.rows), min(c1 + 1, grid.cols)

            def cid(r, c):
                return r * grid.cols + c

            # local Dijkstra over tile+halo, seeded by best-so-far + new seeds
            dist = {}
            heap = []
            for r in range(hr0, hr1):
                for c in range(hc0, hc1):
                    v = cid(r, c)
                    b = best_[v]
                    if b < INF:
                        dist[v] = int(b)
                        heapq.heappush(heap, (int(b), v))
            for cell, d in zip(g["cell"], g["dist"]):
                cell, d = int(cell), int(d)
                if d < dist.get(cell, INF):
                    dist[cell] = d
                    heapq.heappush(heap, (d, cell))
            improved = {}
            while heap:
                d, v = heapq.heappop(heap)
                if d > dist.get(v, INF):
                    continue
                r, c = v // grid.cols, v % grid.cols
                for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    nr, nc = r + dr, c + dc
                    if not (hr0 <= nr < hr1 and hc0 <= nc < hc1):
                        continue
                    w = v_cost = int(cost_[v]) + int(cost_[cid(nr, nc)])
                    nd = d + w
                    u = cid(nr, nc)
                    if nd < dist.get(u, INF):
                        dist[u] = nd
                        heapq.heappush(heap, (nd, u))
            for v, d in dist.items():
                if d < best_[v]:
                    improved[v] = d
            return pd.DataFrame({"cell": list(improved), "dist": list(improved.values())}) \
                .astype(np.int64)

        out = ray.data.from_pandas(seeds).groupby("tile") \
            .map_groups(sweep, batch_format="pandas").to_pandas()
        if out.empty:
            seeds = seeds.iloc[0:0]  # converged: no improvements anywhere
            break
        # apply improvements; only genuinely-improved cells seed the next round
        cells = out["cell"].to_numpy(np.int64)
        dists = out["dist"].to_numpy(np.int64)
        order = np.lexsort((dists, cells))
        cells, dists = cells[order], dists[order]
        keep = np.ones(len(cells), bool)
        keep[1:] = cells[1:] != cells[:-1]  # min dist per cell
        cells, dists = cells[keep], dists[keep]
        better = dists < best[cells]
        cells, dists = cells[better], dists[better]
        best[cells] = dists
        seeds = pd.DataFrame({"cell": cells, "dist": dists})
    if not seeds.empty:
        # post-loop check (not for/else): converging exactly on the last
        # allowed round leaves seeds empty and must not raise
        raise RuntimeError("cost distance did not converge")
    return best
