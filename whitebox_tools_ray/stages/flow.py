"""Iterative D8 flow algorithms (G family): flow accumulation + basins.

Reference: hydro_analysis/d8_flow_accum.rs:483-560 — a parallel
num-inflowing count then a strictly SEQUENTIAL stack-driven topological
drain over the whole raster. That cannot distribute; the Ray plan follows
SURVEY.md section 2.4 "G": Pregel-style tile sweeps.

Flow accumulation (every cell injects mass 1; acc[v] = mass passing through
v incl. its own):
  round r: packets (cell, mass) are grouped by TILE and drained internally —
  a per-tile sequential walk (the reference's drain, but per shard) that
  adds the mass to every visited cell and forwards whatever exits the tile
  as a packet into the neighbouring tile. Only cross-border mass survives a
  round, so rounds ~ max tile-crossings of any flow path.

Basins: label[v] = the outlet cell its path reaches — computed by pointer
doubling (next := next(next)) in O(log path) rounds of self-joins.

The D8 graph is cycle-free by construction (strictly decreasing elevation).
The down-pointer array is broadcast here (0.5 MB at the test grid); at
extreme scale it is co-partitioned with the packets by tile instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..grid import GridSpec


def d8_down_ids(d8_cells: pd.DataFrame, grid: GridSpec) -> np.ndarray:
    """(cell_id, d8 code) -> dense down_id array (-1 = outlet)."""
    from ..pipelines.queries_raster import _D8_DX, _D8_DY

    down = np.full(grid.rows * grid.cols, -1, np.int64)
    cid = d8_cells["cell_id"].to_numpy(np.int64)
    code = d8_cells["d8"].to_numpy(np.int64)
    r = cid // grid.cols
    c = cid % grid.cols
    for i in range(8):
        m = code == (1 << i)
        nr, nc = r[m] + _D8_DY[i], c[m] + _D8_DX[i]
        # off-grid neighbours become outlets (-1); without this, a code
        # pointing off a row edge would wrap to the far column of the
        # adjacent row and silently mis-route flow.
        ok = (nr >= 0) & (nr < grid.rows) & (nc >= 0) & (nc < grid.cols)
        tgt = np.where(ok, nr * grid.cols + nc, -1)
        down[cid[m]] = tgt
    return down


def flow_accumulation(down: np.ndarray, grid: GridSpec, *, tile: int = 64,
                      max_rounds: int = 64) -> pd.DataFrame:
    """Returns DataFrame (cell_id, acc). Distributed tile-sweep rounds."""
    tcols = -(-grid.cols // tile)
    down_ref = ray.put(down)

    n = grid.rows * grid.cols
    cells = np.arange(n, dtype=np.int64)
    packets = pd.DataFrame({"cell": cells, "mass": np.ones(n, np.int64)})
    acc_frames: list[pd.DataFrame] = []

    def drain(g: pd.DataFrame) -> pd.DataFrame:
        from .spatial_join import _cached_get

        dn = _cached_get(down_ref)
        tid = int(g["tile"].iloc[0])
        tr, tc = tid // tcols, tid % tcols

        def tile_of(cid: int) -> int:
            return (cid // grid.cols // tile) * tcols + (cid % grid.cols // tile)

        local_acc: dict[int, int] = {}
        out_pkts: dict[int, int] = {}
        # combine packets per cell first
        combined = g.groupby("cell", sort=False)["mass"].sum()
        for cell, mass in combined.items():
            cur = int(cell)
            m = int(mass)
            while True:
                local_acc[cur] = local_acc.get(cur, 0) + m
                nxt = int(dn[cur])
                if nxt < 0:
                    break
                if tile_of(nxt) != tid:
                    out_pkts[nxt] = out_pkts.get(nxt, 0) + m
                    break
                cur = nxt
        rows = [(k, v, 0) for k, v in local_acc.items()] + \
               [(k, v, 1) for k, v in out_pkts.items()]
        return pd.DataFrame(rows, columns=["cell", "mass", "is_packet"])

    for _ in range(max_rounds):
        if packets.empty:
            break
        packets = packets.copy()
        packets["tile"] = (packets["cell"] // grid.cols // tile) * tcols \
            + (packets["cell"] % grid.cols // tile)
        ds = ray.data.from_pandas(packets)
        out = ds.groupby("tile").map_groups(drain, batch_format="pandas").to_pandas()
        acc_frames.append(out[out["is_packet"] == 0][["cell", "mass"]])
        packets = out[out["is_packet"] == 1][["cell", "mass"]].reset_index(drop=True)
    if not packets.empty:
        # checked after the loop (not for/else) so a run that drains its last
        # packets exactly on round max_rounds still counts as converged
        raise RuntimeError("flow accumulation did not converge (cycle?)")

    acc = pd.concat(acc_frames).groupby("cell", sort=False)["mass"].sum().reset_index()
    acc.columns = ["cell_id", "acc"]
    return acc.sort_values("cell_id").reset_index(drop=True)


def strahler(down: np.ndarray, *, max_rounds: int = 100_000) -> np.ndarray:
    """Strahler order over the D8 forest, topological-wave iteration:
    resolve cells whose inflowing children are all resolved; order = max
    child order, +1 when >= 2 children attain the max; leaves = 1."""
    n = len(down)
    indeg = np.bincount(down[down >= 0], minlength=n)
    order = np.zeros(n, np.int64)
    max_child = np.zeros(n, np.int64)
    max_count = np.zeros(n, np.int64)
    pending = indeg.copy()
    frontier = np.flatnonzero(pending == 0)
    order[frontier] = 1
    rounds = 0
    while len(frontier):
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError("strahler did not converge (cycle?)")
        # push resolved orders downstream (vectorized per wave)
        d = down[frontier]
        ok = d >= 0
        for cell, o in zip(d[ok], order[frontier[ok]]):
            if o > max_child[cell]:
                max_child[cell] = o
                max_count[cell] = 1
            elif o == max_child[cell]:
                max_count[cell] += 1
        np.subtract.at(pending, d[ok], 1)
        nxt = d[ok][pending[d[ok]] == 0]
        nxt = np.unique(nxt)
        order[nxt] = max_child[nxt] + (max_count[nxt] >= 2)
        frontier = nxt
    return order


def basins_pointer_doubling(down: np.ndarray, *, max_rounds: int = 40) -> np.ndarray:
    """label[v] = outlet cell id of v's flow path, via pointer doubling.

    Expressed densely here (the down array is the broadcast state); the
    distributed rendering of one round is a self-join of the (cell, next)
    table on next = cell — O(log path-length) such joins total.
    """
    n = len(down)
    nxt = np.where(down < 0, np.arange(n, dtype=np.int64), down)
    for _ in range(max_rounds):
        new = nxt[nxt]  # the pointer-doubling self-join
        if (new == nxt).all():
            return nxt
        nxt = new
    raise RuntimeError("basin labeling did not converge (cycle?)")
