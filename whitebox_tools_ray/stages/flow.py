"""D8 flow building blocks (G family): pointer tables + in-degree.

Reference: hydro_analysis/d8_flow_accum.rs:483-560 — a parallel
num-inflowing count then a strictly SEQUENTIAL stack-driven topological
drain over the whole raster. That cannot distribute; the Ray plan follows
SURVEY.md section 2.4 "G": Pregel-style tile sweeps.

Round-2 redesign (round 1 kept every per-cell array on the driver): the
iterative rounds live in tile-sharded Pregel ACTORS (stages/pregel.py) whose
state never touches the driver; this module keeps the distributed one-pass
pieces — pointer-table derivation (down_ds_from_pointer), the join-free
in-degree pass (_indeg_state / num_inflowing_ds) — plus dense numpy
reference oracles for pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from ..grid import GridSpec


def d8_down_ids(d8_cells: pd.DataFrame, grid: GridSpec) -> np.ndarray:
    """(cell_id, d8 code) -> dense down_id array (-1 = outlet). Reference
    numpy oracle used by tests; the engine path is down_ds_from_pointer."""
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


def tile_of_expr(cell: np.ndarray, grid: GridSpec, tile: int) -> np.ndarray:
    tcols = -(-grid.cols // tile)
    return (cell // grid.cols // tile) * tcols + (cell % grid.cols // tile)


def down_ds_from_pointer(d8_ds: ray.data.Dataset, grid: GridSpec,
                         *, tile: int = 64) -> ray.data.Dataset:
    """D8 pointer Dataset (cell_id, d8) -> (cell_id, down_id, tile), fully
    distributed (bounds-checked vectorized arithmetic per batch)."""
    from ..pipelines.queries_raster import _D8_DX, _D8_DY

    dx = np.asarray(_D8_DX, np.int64)
    dy = np.asarray(_D8_DY, np.int64)

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        code = df["d8"].to_numpy(np.int64)
        r, c = cid // grid.cols, cid % grid.cols
        down = np.full(len(cid), -1, np.int64)
        for i in range(8):
            m = code == (1 << i)
            if not m.any():
                continue
            nr, nc = r[m] + dy[i], c[m] + dx[i]
            ok = (nr >= 0) & (nr < grid.rows) & (nc >= 0) & (nc < grid.cols)
            down[m] = np.where(ok, nr * grid.cols + nc, -1)
        return pd.DataFrame({"cell_id": cid, "down_id": down,
                             "tile": tile_of_expr(cid, grid, tile)})

    return d8_ds.map_batches(enc, batch_format="pandas")


def _down_map(rows: pd.DataFrame) -> dict[int, int]:
    return dict(zip(rows["cell_id"].to_numpy(np.int64),
                    rows["down_id"].to_numpy(np.int64)))


def member_sorted(arr: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
    """Vectorized membership of arr in a SORTED int64 key array."""
    if not len(sorted_keys):
        return np.zeros(len(arr), bool)
    pos = np.minimum(np.searchsorted(sorted_keys, arr), len(sorted_keys) - 1)
    return sorted_keys[pos] == arr


def down_rows_touching(down_ds: ray.data.Dataset, keys: np.ndarray,
                       *, include_down_hits: bool = False) -> pd.DataFrame:
    """Collect (cell_id, down_id) rows whose cell_id lies in the key set
    (optionally also rows whose DOWN cell does) — the driver-side pull is
    bounded by the key set and its fan-in, not the grid. The stream-network
    walks (horton/tributary/hillslopes) only ever look up stream(-adjacent)
    cells, so pulling the full grid pointer for them is pure waste at a
    continental DEM."""
    keys = np.sort(np.asarray(keys, np.int64))
    kref = ray.put(keys)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        from .spatial_join import _cached_get

        ks = _cached_get(kref)
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        m = member_sorted(cid, ks)
        if include_down_hits:
            m |= member_sorted(down, ks)
        return pd.DataFrame({"cell_id": cid[m], "down_id": down[m]})

    return down_ds.map_batches(pick, batch_format="pandas").to_pandas()


def _indeg_state(down_ds: ray.data.Dataset, grid: GridSpec, tile: int
                 ) -> ray.data.Dataset:
    """(cell_id, tile, down_id, n_inflow) via ONE tile-groupby: down rows
    and in-degree increment rows (routed to the TARGET cell's tile) co-group
    and merge vectorized. No hash join — Ray's join operator pins aggregator
    actors per instance, and two live joins on a small cluster deadlock
    (observed; same reason the MinHash verify dropped its join plan)."""
    def emit(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)
        t = df["tile"].to_numpy(np.int64)
        base = pd.DataFrame({"cell_id": cid, "tile": t, "down_id": down,
                             "kind": np.int64(0)})
        m = down >= 0
        incr = pd.DataFrame({"cell_id": down[m],
                             "tile": tile_of_expr(down[m], grid, tile),
                             "down_id": np.int64(-2), "kind": np.int64(1)})
        return pd.concat([base, incr], ignore_index=True)

    both = down_ds.map_batches(emit, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["kind"] == 0]
        counts = g[g["kind"] == 1].groupby("cell_id").size()
        n = base["cell_id"].map(counts).fillna(0).astype(np.int64)
        return pd.DataFrame({"cell_id": base["cell_id"].to_numpy(np.int64),
                             "tile": base["tile"].to_numpy(np.int64),
                             "down_id": base["down_id"].to_numpy(np.int64),
                             "n_inflow": n.to_numpy()})

    return both.groupby("tile").map_groups(merge, batch_format="pandas")


def num_inflowing_ds(down_ds: ray.data.Dataset, grid: GridSpec | None = None,
                     *, tile: int = 64) -> ray.data.Dataset:
    """Dataset (cell_id, n_inflow): in-degree of the D8 graph — one
    co-grouped tile pass (see _indeg_state)."""
    if grid is None:
        from ..layers import GRID1 as grid  # noqa: N813
    return _indeg_state(down_ds, grid, tile).map_batches(
        lambda df: df[["cell_id", "n_inflow"]], batch_format="pandas")


# ---------------------------------------------------------------------------
# numpy reference implementations (pytest brute-force oracles ONLY — the
# engine paths above keep state in datasets)
# ---------------------------------------------------------------------------

def strahler(down: np.ndarray, *, max_rounds: int = 100_000) -> np.ndarray:
    """Reference oracle: topological-wave Strahler on a dense array."""
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
    """Reference oracle: dense pointer doubling."""
    n = len(down)
    nxt = np.where(down < 0, np.arange(n, dtype=np.int64), down)
    for _ in range(max_rounds):
        new = nxt[nxt]
        if (new == nxt).all():
            return nxt
        nxt = new
    raise RuntimeError("basin labeling did not converge (cycle?)")
