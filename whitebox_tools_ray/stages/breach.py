"""BreachDepressionsLeastCost (hydro_analysis/breach_depressions_least_cost.rs,
991 LoC) re-expressed for tile-parallel execution.

Semantics (documented contract of this engine):
  * a PIT is a cell strictly lower than all 8 of its (present) neighbours;
  * for each pit, a least-cost breach path of length <= max_dist leads to any
    cell strictly lower than the pit. Path cost = sum over path cells of
    max(0, z - z_pit) (the dig volume down to pit level); ties break on
    (cost, steps, cell index) — fully deterministic;
  * carving lowers each interior path cell i (of L steps) to
    min(z_i, z_pit + (z_target - z_pit) * i // L) — a monotone fixed-point
    ramp (elevations are scaled integers, floor division);
  * a pit with NO reachable lower ground within max_dist falls back to a
    pit FILL to its spill elevation min(8-neighbour z) — the reference's
    --fill_pits composition for unresolved pits.

Partitioning assumption (stated per the driver brief): breach search radius
<= halo width k, so every pit's window is fully local to its owning tile;
carves that land in the halo (cells owned by a neighbouring tile) are
emitted as extra rows and merged with a grouped min — order-independent
because planted/realistic pits further apart than 2k never share a carved
cell, and min() composes the base surface with at most one carve.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray.data

from ..grid import GridSpec
from .raster import synth_raster_tiles, window_exchange

_N8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _find_pits(z: np.ndarray, k: int, nr: int, nc: int) -> list[tuple[int, int]]:
    """(row, col) in padded coords of own-tile cells strictly lower than all
    8 present neighbours (cells missing a neighbour — raster border — drain
    off-grid and are never pits)."""
    centre = z[k:k + nr, k:k + nc]
    is_pit = np.ones((nr, nc), bool)
    for dr, dc in _N8:
        w = z[k + dr:k + dr + nr, k + dc:k + dc + nc]
        is_pit &= ~np.isnan(w) & (w > centre)
    rr, cc = np.nonzero(is_pit)
    return [(int(r) + k, int(c) + k) for r, c in zip(rr, cc)]


def _breach_one(z: np.ndarray, pr: int, pc: int, max_dist: int):
    """Least-cost breach for the pit at padded coords (pr, pc); returns a
    list of (row, col, new_z) carves, or None -> fill fallback."""
    H, W = z.shape
    zp = z[pr, pc]
    start = (pr, pc)
    best: dict[tuple[int, int], tuple[float, int]] = {start: (0.0, 0)}
    prev: dict[tuple[int, int], tuple[int, int]] = {}
    heap = [(0.0, 0, pr * W + pc)]
    target = None
    while heap:
        cost, steps, idx = heapq.heappop(heap)
        u = (idx // W, idx % W)
        if best.get(u, (np.inf, 0))[0] < cost:
            continue
        if z[u] < zp and u != start:
            target = u
            break
        if steps >= max_dist:
            continue
        for dr, dc in _N8:
            vr, vc = u[0] + dr, u[1] + dc
            if not (0 <= vr < H and 0 <= vc < W) or np.isnan(z[vr, vc]):
                continue
            # keep the search inside the pit's own window so the carve can
            # never leave the halo (the partitioning assumption above)
            if abs(vr - pr) > max_dist or abs(vc - pc) > max_dist:
                continue
            v = (vr, vc)
            ncost = cost + max(0.0, float(z[vr, vc] - zp))
            cand = (ncost, steps + 1)
            if cand < best.get(v, (np.inf, 1 << 30)):
                best[v] = cand
                prev[v] = u
                heapq.heappush(heap, (ncost, steps + 1, vr * W + vc))
    if target is None:
        return None
    path = [target]
    while path[-1] != start:
        path.append(prev[path[-1]])
    path.reverse()  # pit .. target
    L = len(path) - 1
    zt = z[target]
    carves = []
    for i in range(1, L):
        r, c = path[i]
        ramp = int(zp) + (int(zt) - int(zp)) * i // L
        if ramp < z[r, c]:
            carves.append((r, c, ramp))
    return carves


def breach_depressions_ds(z_fn, grid: GridSpec, *, max_dist: int = 16,
                          tile: int = 64) -> ray.data.Dataset:
    """Dataset (cell_id, z) — the breached surface (scaled-integer
    elevations). Tiles exchange a max_dist halo; each tile breaches ITS pits
    and emits base rows for its own cells plus carve rows (possibly in the
    halo); a grouped min merges them."""
    from ..relational import partial_agg

    k = max_dist
    tiles = synth_raster_tiles(grid, z_fn, tile=tile)

    def window_fn(padded: np.ndarray, nr: int, nc: int, r0: int, c0: int) -> pd.DataFrame:
        rows_out = []
        for pr, pc in _find_pits(padded, k, nr, nc):
            carves = _breach_one(padded, pr, pc, k)
            if carves is None:
                # fill fallback: raise the pit to its spill elevation
                nbs = [padded[pr + dr, pc + dc] for dr, dc in _N8
                       if not np.isnan(padded[pr + dr, pc + dc])]
                rows_out.append((pr, pc, int(min(nbs))))
            else:
                rows_out.extend(carves)
        if not rows_out:
            return pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                                 "z": pd.Series([], dtype=np.int64)})
        pr = np.array([r for r, _, _ in rows_out], np.int64)
        pc_ = np.array([c for _, c, _ in rows_out], np.int64)
        zn = np.array([v for _, _, v in rows_out], np.int64)
        return pd.DataFrame({
            "cell_id": (pr - k + r0) * grid.cols + (pc_ - k + c0), "z": zn})

    # modification rows are SPARSE (per-pit paths); collect + broadcast them
    # and apply over the base tiles in one vectorized pass. Disjoint pit
    # windows (pits further apart than 2k) guarantee one modification per
    # cell. At continental pit densities the broadcast swaps for a shuffle
    # join on cell_id — the same downstream map.
    mods = window_exchange(tiles, grid, window_fn, tile=tile, k=k).to_pandas()
    mc = mods["cell_id"].to_numpy(np.int64)
    order = np.argsort(mc, kind="stable")
    mref = ray.put((mc[order], mods["z"].to_numpy(np.int64)[order]))

    def apply_mods(df: pd.DataFrame) -> pd.DataFrame:
        from .spatial_join import _cached_get

        mcells, mz = _cached_get(mref)
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * tile, int(t["tcol"]) * tile
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * grid.cols + cc.ravel()
            z = np.asarray(t["data"], np.float64).astype(np.int64)
            if len(mcells):
                pos = np.minimum(np.searchsorted(mcells, cid), len(mcells) - 1)
                hit = mcells[pos] == cid
                z = np.where(hit, mz[pos], z)
            frames.append(pd.DataFrame({"cell_id": cid, "z": z}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(apply_mods, batch_format="pandas")
