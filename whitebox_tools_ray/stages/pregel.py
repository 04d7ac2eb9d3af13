"""Tile-sharded Pregel actors for the iterative G-family algorithms.

Why raw actors and not a Dataset loop: the per-round Dataset rendering
(union -> groupby(tile).map_groups -> materialize) degrades GEOMETRICALLY in
Ray Data 2.49 — a 12-round loop over 600 rows goes 0.3s -> 45s/round
(reproduced in isolation; every round re-plans against the accumulated
session state). Iterative algorithms with shared mutable per-cell state are
exactly the case the Dataset API cannot express (driver brief: "drop to raw
Ray tasks / actors only where the Dataset API genuinely can't"), so the
state lives in long-lived SHARD ACTORS instead:

  * the D8 pointer/cost table is loaded ONCE into N shard actors (tiles
    hash to shards) via a single Dataset shuffle — per-cell state never
    touches the driver;
  * each round the driver only ROUTES small cross-shard message arrays
    (numpy int64) between actors and sums their counts — O(border) bytes;
  * results come back as per-shard object refs assembled with
    ``ray.data.from_pandas_refs`` — again no driver materialization.

On a multi-node cluster the shards spread across nodes and each round is a
bulk-synchronous superstep with O(border) network traffic — the textbook
Pregel rendering of hydro_analysis/d8_flow_accum.rs:483-560's sequential
drain.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..grid import GridSpec


def eff_cell_mask(c: np.ndarray) -> np.ndarray:
    """d8_mass_flux's efficiency-halving cells (eff = 0.5, elsewhere 1.0) —
    ~1/64 of cells, keeping the max halving count along any D8 path small
    enough that every fixed-point value stays exactly representable
    (pipelines/queries_hydro4 asserts the bound at run time)."""
    return (c * 2654435761) % 64 == 0


def shard_of_tiles(tiles: np.ndarray, grid: GridSpec, tile: int,
                   n_shards: int) -> np.ndarray:
    """Tile -> shard: BLOCKED contiguous tile ranges (round-4: the old
    round-robin `tile % n_shards` interleaved neighbouring tiles across
    shards, so label-correcting floods crossed a shard boundary every
    `tile` cells and rounds scaled with grid width; blocked stripes keep
    propagation intra-shard and rounds ~ n_shards)."""
    trows = -(-grid.rows // tile)
    tcols = -(-grid.cols // tile)
    return tiles * n_shards // (trows * tcols)


def _tile_of(cid: np.ndarray, grid: GridSpec, tile: int) -> np.ndarray:
    tcols = -(-grid.cols // tile)
    return (cid // grid.cols // tile) * tcols + (cid % grid.cols // tile)


@ray.remote
class FlowShard:
    """One shard = many tiles. Holds pointer + per-cell algorithm state.

    Round-3 rework: shard state is DENSE numpy (sorted cell array + aligned
    columns) instead of dict[int, int]; drains/walks are vectorized waves /
    one-time pointer-doubling tables instead of per-cell Python while loops
    (round-2 VERDICT item 3 — dict walks capped throughput at ~0.7M cells/s).
    The scalar wave algorithms (Strahler, Dijkstra, priority-flood) keep
    their loops but read pre-batched surface arrays instead of one-element
    z_fn calls."""

    def __init__(self, grid_dims: tuple[int, int], tile: int, n_shards: int):
        self.rows, self.cols = grid_dims
        self.tile = tile
        self.n_shards = n_shards
        self.tcols = -(-self.cols // tile)
        self._frames: list[pd.DataFrame] = []
        self.cells_arr: np.ndarray | None = None  # sorted local cell ids
        self.down_arr: np.ndarray | None = None   # aligned down cell ids
        self.down_loc: np.ndarray | None = None   # -2 terminal, -1 remote, else local idx
        self._res = None                          # (U, D, OK) doubling tables
        self._down_dict: dict[int, int] | None = None

    def node_id(self) -> str:
        """Placement observability (multi-node SPREAD verification)."""
        import ray

        return ray.get_runtime_context().get_node_id()

    def _tile(self, cid: int) -> int:
        return (cid // self.cols // self.tile) * self.tcols \
            + (cid % self.cols // self.tile)

    def _shard(self, cid: int) -> int:
        return self._tile(cid) * self.n_shards // self._ntiles()

    def _ntiles(self) -> int:
        return (-(-self.rows // self.tile)) * self.tcols

    def _vec_shard(self, cid: np.ndarray) -> np.ndarray:
        t = ((cid // self.cols // self.tile) * self.tcols
             + (cid % self.cols // self.tile))
        return t * self.n_shards // self._ntiles()

    def _vec_hops(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        if getattr(self, "_wmode", "hops") == "eff":
            return eff_cell_mask(a).astype(np.int64)
        diag = (a // self.cols != b // self.cols) & (a % self.cols != b % self.cols)
        return np.where(diag, _HOP_DIAG, _HOP_STRAIGHT).astype(np.int64)

    def set_step_weight(self, mode: str) -> bool:
        """Step weight of the doubling walk tables: "hops" (default —
        fixed-point D8 hop units) or "eff" (1 on d8_mass_flux's
        efficiency-halving cells, 0 elsewhere, so flowpath_length returns
        C(x) = # halving cells on the path [x, outlet)). Clears the cached
        tables — they are weight-specific."""
        self._wmode = mode
        self._res = None
        return True

    def load(self, df: pd.DataFrame) -> int:
        return self.load_arrays(df["cell_id"].to_numpy(np.int64),
                                df["down_id"].to_numpy(np.int64))

    def load_arrays(self, cells: np.ndarray, downs: np.ndarray) -> int:
        self._frames.append(pd.DataFrame({"cell_id": cells, "down_id": downs}))
        self.cells_arr = None  # invalidate
        self._res = None
        self._down_dict = None
        self._topo = None
        return len(cells)

    def load_universe(self, sid: int) -> int:
        """Synthesize this shard's full cell universe locally (down = -1):
        shard sid owns the blocked tile range [ceil(sid*T/S),
        ceil((sid+1)*T/S)) of shard_of_tiles, expanded to cell ids without
        any object-store traffic — for algorithms that need every grid
        cell but no pointer data (fill / fd8 / mfd / dinf / cost dist)."""
        T = self._ntiles()
        S = self.n_shards
        t_lo = -(-sid * T // S)
        t_hi = -(-(sid + 1) * T // S)
        tile = self.tile
        parts = []
        for t in range(t_lo, min(t_hi, T)):
            tr, tc = divmod(t, self.tcols)
            r0 = tr * tile
            c0 = tc * tile
            parts.append((np.arange(r0, min(r0 + tile, self.rows),
                                    dtype=np.int64)[:, None] * self.cols
                          + np.arange(c0, min(c0 + tile, self.cols),
                                      dtype=np.int64)[None, :]).ravel())
        cells = np.sort(np.concatenate(parts)) if parts \
            else np.empty(0, np.int64)
        return self.load_arrays(cells, np.full(len(cells), -1, np.int64))

    def reset(self) -> bool:
        """Return the actor to a pristine state so the shard pool can reuse
        the process (spawning 16 actor processes costs ~1.5 s per pregel
        run; the pool amortizes it across queries)."""
        self._frames = []
        self.cells_arr = None
        self.down_arr = None
        self.down_loc = None
        self._res = None
        self._down_dict = None
        self._topo = None
        self._wmode = "hops"
        # hasattr-guarded algorithm state must not leak across runs
        for attr in ("_dsi_z", "_dsi_d", "dsi_parts", "vis_parts",
                     "iso_pending", "iso_sum", "iso_bestkey", "iso_bestfrom",
                     "iso_bestfa", "iso_done", "iso_outlets", "iso_target", "_iso_offs_sorted", "_iso_idx_sorted",
                     "_mass_frames", "pending", "maxc", "cntm", "order",
                     "muf_pending", "muf_best", "muf", "acc_arr", "acc_extra",
                     "macc_arr", "macc_extra", "_macc_vals",
                     "fpl_parts", "bas_parts", "fd8_indptr", "fd8_tgt",
                     "fd8_w", "fd8_tgt_loc", "fd8_pending_arr",
                     "fd8_mass_arr", "fd8_acc_arr", "fd8_done",
                     "_mf_eff", "_mf_abs", "_fd8_exact_weights",
                     "best", "cells", "fill",
                     "cost_fn", "z_fn", "init_mass", "fplen", "fl_memo",
                     "basin", "memo", "_lc_nbr", "_lc_val", "_lc_self",
                     "_hp_val", "_hp_z", "_hp_ppos", "_hp_arrpos",
                     "_hp_offs", "_hp_used",
                     "_fl_L", "_fl_lab", "_fl_seeds", "_fl_final"):
            if hasattr(self, attr):
                delattr(self, attr)
        return True

    def _ensure(self):
        if self.cells_arr is not None:
            return
        if self._frames:
            all_df = pd.concat(self._frames)
            cid = all_df["cell_id"].to_numpy(np.int64)
            order = np.argsort(cid, kind="stable")
            self.cells_arr = cid[order]
            self.down_arr = all_df["down_id"].to_numpy(np.int64)[order]
        else:
            self.cells_arr = np.empty(0, np.int64)
            self.down_arr = np.empty(0, np.int64)
        n = len(self.cells_arr)
        loc = np.full(n, -1, np.int64)
        term = self.down_arr < 0
        loc[term] = -2
        nz = ~term
        if nz.any():
            pos = np.searchsorted(self.cells_arr, self.down_arr[nz])
            pos = np.clip(pos, 0, n - 1)
            present = self.cells_arr[pos] == self.down_arr[nz]
            sub = np.full(nz.sum(), -1, np.int64)
            sub[present] = pos[present]
            loc[nz] = sub
        self.down_loc = loc

    @property
    def down(self) -> dict[int, int]:
        """dict view for the remaining scalar wave algorithms."""
        if self._down_dict is None:
            self._ensure()
            self._down_dict = dict(zip(self.cells_arr.tolist(),
                                       self.down_arr.tolist()))
        return self._down_dict

    def _lookup(self, cur: np.ndarray):
        """(pos, present) of probe cells in the local sorted array."""
        self._ensure()
        n = len(self.cells_arr)
        if n == 0:
            return np.zeros(len(cur), np.int64), np.zeros(len(cur), bool)
        pos = np.clip(np.searchsorted(self.cells_arr, cur), 0, n - 1)
        return pos, self.cells_arr[pos] == cur

    @staticmethod
    def _group_rows(shards: np.ndarray, rows: np.ndarray) -> dict[int, np.ndarray]:
        """Split row array by shard id — vectorized routing."""
        if not len(rows):
            return {}
        order = np.argsort(shards, kind="stable")
        ss = shards[order]
        rows = rows[order]
        bounds = np.flatnonzero(np.diff(ss)) + 1
        starts = np.concatenate([[0], bounds])
        return {int(ss[st]): part
                for st, part in zip(starts, np.split(rows, bounds))}

    # ---- flow accumulation ----------------------------------------------
    def acc_load_masses(self, df: pd.DataFrame) -> int:
        """Custom initial masses (e.g. Shreve: 1 at in-degree-0 cells)."""
        if not hasattr(self, "_mass_frames"):
            self._mass_frames: list[pd.DataFrame] = []
        self._mass_frames.append(pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "mass": df["mass"].to_numpy(np.int64)}))
        return len(df)

    def acc_init(self):
        self._ensure()
        self.acc_arr = np.zeros(len(self.cells_arr), np.int64)
        self.acc_extra: dict[int, int] = {}
        if hasattr(self, "_mass_frames"):
            mdf = pd.concat(self._mass_frames)
            cells = mdf["cell_id"].to_numpy(np.int64)
            mass = mdf["mass"].to_numpy(np.int64)
            keep = mass != 0
            return self._acc_apply(cells[keep], mass[keep])
        return self._acc_apply(self.cells_arr,
                               np.ones(len(self.cells_arr), np.int64))

    def acc_round(self, msgs: list[np.ndarray]):
        if msgs:
            arr = np.concatenate([a.reshape(-1, 2) for a in msgs])
        else:
            arr = np.empty((0, 2), np.int64)
        return self._acc_apply(arr[:, 0], arr[:, 1])

    def _ensure_levels(self):
        """Within-shard topological level order (Kahn by waves), computed
        once: drains then process whole levels with scatter-adds — O(n) per
        drain, no per-hop sorting."""
        if getattr(self, "_topo", None) is not None:
            return
        self._ensure()
        n = len(self.cells_arr)
        indeg = np.zeros(n, np.int64)
        t = self.down_loc[self.down_loc >= 0]
        np.add.at(indeg, t, 1)
        frontier = np.flatnonzero(indeg == 0)
        parts = []
        while len(frontier):
            parts.append(frontier)
            t = self.down_loc[frontier]
            t = t[t >= 0]
            uniq, cnt = np.unique(t, return_counts=True)
            indeg[uniq] -= cnt
            frontier = uniq[indeg[uniq] == 0]
        self._topo = (np.concatenate(parts) if parts else np.empty(0, np.int64),
                      np.cumsum([0] + [len(p) for p in parts]))

    def _acc_apply(self, cells: np.ndarray, mass: np.ndarray):
        """Level-ordered mass drain: delta flows down one topological level
        at a time via scatter-adds into a dense per-shard buffer."""
        self._ensure_levels()
        pos, present = self._lookup(cells)
        for c, m in zip(cells[~present].tolist(), mass[~present].tolist()):
            self.acc_extra[c] = self.acc_extra.get(c, 0) + m
        n = len(self.cells_arr)
        if n == 0:
            return {}
        delta = np.zeros(n, np.int64)
        np.add.at(delta, pos[present], mass[present])
        order, bounds = self._topo
        out_cells: list[np.ndarray] = []
        out_mass: list[np.ndarray] = []
        for li in range(len(bounds) - 1):
            lvl = order[bounds[li]:bounds[li + 1]]
            val = delta[lvl]
            self.acc_arr[lvl] += val
            nxt = self.down_loc[lvl]
            lm = nxt >= 0
            np.add.at(delta, nxt[lm], val[lm])
            ext = (nxt == -1) & (val > 0)
            if ext.any():
                out_cells.append(self.down_arr[lvl[ext]])
                out_mass.append(val[ext])
        if not out_cells:
            return {}
        oc = np.concatenate(out_cells)
        om = np.concatenate(out_mass)
        uniq, inv = np.unique(oc, return_inverse=True)
        mm = np.zeros(len(uniq), np.int64)
        np.add.at(mm, inv, om)
        rows = np.stack([uniq, mm], axis=1)
        return self._group_rows(self._vec_shard(uniq), rows)

    def acc_result(self) -> pa.Table:
        self._ensure()
        mask = self.acc_arr > 0
        cells = self.cells_arr[mask]
        acc = self.acc_arr[mask]
        if self.acc_extra:
            cells = np.concatenate([cells, np.fromiter(self.acc_extra.keys(),
                                                       np.int64)])
            acc = np.concatenate([acc, np.fromiter(self.acc_extra.values(),
                                                   np.int64)])
        return pa.table({"cell_id": cells, "acc": acc})

    # ---- max-upslope accumulation (max semiring over the D8 DAG) ---------
    # whitebox-plugins/src/max_upslope_value/main.rs:276-366: output starts
    # as the values raster and each cell pushes its running max down its D8
    # pointer; = max over upslope-or-equal cells of value. Level-ordered
    # drain like _acc_apply, in the (max) semiring (idempotent, so repeated
    # pushes are harmless and messages carry plain candidates).
    def macc_load(self, value_fn) -> int:
        self._ensure()
        self._macc_vals = np.asarray(value_fn(self.cells_arr), np.int64) \
            if len(self.cells_arr) else np.empty(0, np.int64)
        # start BELOW every real value so the init candidates propagate
        # (the drain only pushes strict improvements)
        self.macc_arr = np.full(len(self.cells_arr), -(1 << 62), np.int64)
        self.macc_extra: dict[int, int] = {}
        return len(self.cells_arr)

    def macc_init(self):
        self._ensure()
        return self._macc_apply(self.cells_arr, self._macc_vals.copy())

    def macc_round(self, msgs: list[np.ndarray]):
        if msgs:
            arr = np.concatenate([a.reshape(-1, 2) for a in msgs])
        else:
            arr = np.empty((0, 2), np.int64)
        return self._macc_apply(arr[:, 0], arr[:, 1])

    def _macc_apply(self, cells: np.ndarray, cand: np.ndarray):
        self._ensure_levels()
        pos, present = self._lookup(cells)
        for c, m in zip(cells[~present].tolist(), cand[~present].tolist()):
            if m > self.macc_extra.get(c, -(1 << 62)):
                self.macc_extra[c] = m
        n = len(self.cells_arr)
        if n == 0:
            return {}
        LOW = -(1 << 62)
        delta = np.full(n, LOW, np.int64)
        np.maximum.at(delta, pos[present], cand[present])
        order, bounds = self._topo
        out_cells: list[np.ndarray] = []
        out_max: list[np.ndarray] = []
        for li in range(len(bounds) - 1):
            lvl = order[bounds[li]:bounds[li + 1]]
            imp = delta[lvl] > self.macc_arr[lvl]
            if not imp.any():
                continue
            lvl = lvl[imp]
            self.macc_arr[lvl] = delta[lvl]
            nxt = self.down_loc[lvl]
            lm = nxt >= 0
            np.maximum.at(delta, nxt[lm], self.macc_arr[lvl][lm])
            ext = nxt == -1
            if ext.any():
                out_cells.append(self.down_arr[lvl[ext]])
                out_max.append(self.macc_arr[lvl[ext]])
        if not out_cells:
            return {}
        oc = np.concatenate(out_cells)
        om = np.concatenate(out_max)
        uniq, inv = np.unique(oc, return_inverse=True)
        mm = np.full(len(uniq), -(1 << 62), np.int64)
        np.maximum.at(mm, inv, om)
        rows = np.stack([uniq, mm], axis=1)
        return self._group_rows(self._vec_shard(uniq), rows)

    def macc_result(self) -> pa.Table:
        return pa.table({"cell_id": self.cells_arr,
                         "max_up": self.macc_arr})

    # ---- FD8 multiple-flow-direction accumulation ------------------------
    # hydro_analysis/fd8_flow_accum.rs: flow disperses to EVERY downslope
    # neighbour proportionally to slope^exponent. Mass is fixed-point
    # (FD8_ONE units per cell) with the remainder assigned to the last
    # neighbour in D8 scan order — exactly conserving and order-independent.
    FD8_ONE = 1 << 20

    def _neighbor_z(self, cells: np.ndarray, z_fn, offs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(z0 (n,), zn (n, len(offs)) with NaN off-grid, ncell (n, len(offs)))
        — ONE batched z_fn call for everything (the round-2 loads called
        z_fn one element at a time)."""
        r = cells // self.cols
        c = cells % self.cols
        z0 = np.asarray(z_fn(cells), np.float64)
        zn = np.full((len(cells), len(offs)), np.nan)
        ncell = np.full((len(cells), len(offs)), -1, np.int64)
        for k, (dr, dc) in enumerate(offs):
            nr, nc = r + dr, c + dc
            ok = (nr >= 0) & (nr < self.rows) & (nc >= 0) & (nc < self.cols)
            u = nr * self.cols + nc
            ncell[ok, k] = u[ok]
            if ok.any():
                zn[ok, k] = np.asarray(z_fn(u[ok]), np.float64)
        return z0, zn, ncell

    def _fd8_set_edges(self, ci: np.ndarray, tgts: np.ndarray,
                       ws: np.ndarray, pending: np.ndarray) -> int:
        """Dense FD8 wave state (round-3 VERDICT item: the dict-of-lists +
        per-cell Python queue interior is now CSR arrays drained by
        vectorized scatter-add waves, the same form as _acc_apply).
        ci = edge source positions into cells_arr (sorted, scan order),
        tgts/ws = edge target cell ids / fixed-point weights, pending =
        per-cell upslope in-degree."""
        n = len(self.cells_arr)
        counts = np.bincount(ci, minlength=n).astype(np.int64)
        self.fd8_indptr = np.concatenate([np.zeros(1, np.int64),
                                          np.cumsum(counts)])
        self.fd8_tgt = np.asarray(tgts, np.int64)
        # weights and local positions compact to int32 when provably in
        # range (fixed-point shares are <= 2^20; positions < shard size):
        # the three edge-length arrays dominate retained actor memory
        # (~300 MB/actor at a 61.6M-cell grid in int64)
        w64 = np.asarray(ws, np.int64)
        self.fd8_w = w64.astype(np.int32) \
            if len(w64) == 0 or (w64.max() < 2**31
                                 and w64.min() >= -(2**31)) else w64
        pos, present = self._lookup(self.fd8_tgt)
        loc64 = np.where(present, pos, -1)
        self.fd8_tgt_loc = loc64.astype(np.int32) if n < 2**31 else loc64
        self.fd8_pending_arr = np.asarray(pending, np.int64).copy()
        self.fd8_mass_arr = np.full(n, self.FD8_ONE, np.int64)
        self.fd8_acc_arr = np.zeros(n, np.int64)
        self.fd8_done = np.zeros(n, bool)
        return n

    def fd8_load(self, z_fn, exponent: float) -> int:
        self._ensure()
        cells = self.cells_arr
        n = len(cells)
        offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
        dists = np.array([1.4142135623730951 if dr and dc else 1.0
                          for dr, dc in offs])
        # per-offset streaming (round-4 continuation: the (n, 8) float64
        # zn/ncell matrices were ~500 MB of transients per shard at a
        # 61.6M-cell grid — 16 actors bursting them concurrently is what
        # this host throttles hardest). Only the (n, 8) BOOL down matrix
        # is materialized; neighbour ids and z re-derive per edge from
        # (ci, ki), bit-identically (z_fn is pure, same float64 path).
        r = cells // self.cols
        c = cells % self.cols
        z0 = np.asarray(z_fn(cells), np.float64)
        down = np.zeros((n, 8), bool)
        pending = np.zeros(n, np.int64)
        doff = np.empty(8, np.int64)
        for k, (dr, dc) in enumerate(offs):
            nr, nc = r + dr, c + dc
            ok = (nr >= 0) & (nr < self.rows) & (nc >= 0) & (nc < self.cols)
            doff[k] = dr * self.cols + dc
            if ok.any():
                zu = np.asarray(z_fn(cells[ok] + doff[k]), np.float64)
                zl = z0[ok]
                down[ok, k] = zu < zl
                pending[ok] += zu > zl
        # nonzero is row-major, so edges stay in scan order and
        # np.add.reduceat's strictly sequential slice reduction reproduces
        # the scalar load's left-to-right `sum(slopes)` bit-for-bit.
        ci, ki = np.nonzero(down)
        u_e = cells[ci] + doff[ki]
        z_e = np.asarray(z_fn(u_e), np.float64)
        s_e = ((z0[ci] - z_e) / dists[ki]) ** exponent
        bounds = np.searchsorted(ci, np.arange(len(cells) + 1))
        has = bounds[1:] > bounds[:-1]
        tot_c = np.zeros(len(cells))
        if len(ci):
            tot_c[has] = np.add.reduceat(s_e, bounds[:-1][has])
        with np.errstate(invalid="ignore", divide="ignore"):
            w_e = np.floor(s_e / tot_c[ci] * self.FD8_ONE + 0.5) \
                .astype(np.int64)
        # the LAST down neighbour (scan order) takes the rounding remainder
        if len(ci):
            wsum_c = np.zeros(len(cells), np.int64)
            wsum_c[has] = np.add.reduceat(w_e, bounds[:-1][has])
            last = bounds[1:][has] - 1
            w_e[last] = self.FD8_ONE - (wsum_c[has] - w_e[last])
        return self._fd8_set_edges(ci, u_e, w_e, pending)

    def mfd_load(self, edge_fn) -> int:
        """Custom-weight MFD wave state: edge_fn computes the edge list
        (see mfd_accumulation_pregel)."""
        self._ensure()
        ci, tgts, ws, pending = edge_fn(self.cells_arr, self.rows, self.cols)
        return self._fd8_set_edges(np.asarray(ci, np.int64),
                                   np.asarray(tgts, np.int64),
                                   np.asarray(ws, np.int64),
                                   np.asarray(pending, np.int64))

    def cells_list(self):
        self._ensure()
        return self.cells_arr.tolist()

    # ---- D-infinity (Tarboton) accumulation ------------------------------
    # hydro_analysis/dinf_flow_accum.rs: the steepest of 8 triangular facets
    # picks at most TWO receiving neighbours; flow splits by the angular
    # position within the facet. Same fixed-point wave state as FD8.
    @staticmethod
    def dinf_targets(z, rows, cols, c):
        """[(target_cell, fixed_weight)] for cell c (weights sum to FD8_ONE;
        zero-weight targets dropped). Pure function of the surface — used
        identically for out-edges and for in-degree counting."""
        ONE = 1 << 20
        r, cc = c // cols, c % cols

        def zat(rr, ccc):
            if 0 <= rr < rows and 0 <= ccc < cols:
                return z(rr * cols + ccc)
            return None

        z0 = z(c)
        # facets as (cardinal offset, diagonal offset)
        facets = [((0, 1), (-1, 1)), ((-1, 0), (-1, 1)), ((-1, 0), (-1, -1)),
                  ((0, -1), (-1, -1)), ((0, -1), (1, -1)), ((1, 0), (1, -1)),
                  ((1, 0), (1, 1)), ((0, 1), (1, 1))]
        best = None  # (s, e1_cell, e2_cell, rang)
        quarter = np.pi / 4.0
        for (d1r, d1c), (d2r, d2c) in facets:
            z1 = zat(r + d1r, cc + d1c)
            z2 = zat(r + d2r, cc + d2c)
            if z1 is None or z2 is None:
                continue
            s1 = float(z0 - z1)
            s2 = float(z1 - z2)
            rang = np.arctan2(s2, s1)
            if rang < 0.0:
                rang = 0.0
                s = s1
            elif rang > quarter:
                rang = quarter
                s = float(z0 - z2) / 1.4142135623730951
            else:
                s = float(np.sqrt(s1 * s1 + s2 * s2))
            if s > 0 and (best is None or s > best[0]):
                best = (s, (r + d1r) * cols + (cc + d1c),
                        (r + d2r) * cols + (cc + d2c), rang)
        if best is None:
            return []
        _, e1, e2, rang = best
        w2 = int(np.floor(rang / quarter * ONE + 0.5))
        w1 = ONE - w2
        out = []
        if w1 > 0:
            out.append((e1, w1))
        if w2 > 0:
            out.append((e2, w2))
        return out

    # Tarboton facets as (cardinal offset, diagonal offset) — shared by the
    # scalar reference helper and the vectorized loader
    DINF_FACETS = [((0, 1), (-1, 1)), ((-1, 0), (-1, 1)), ((-1, 0), (-1, -1)),
                   ((0, -1), (-1, -1)), ((0, -1), (1, -1)), ((1, 0), (1, -1)),
                   ((1, 0), (1, 1)), ((0, 1), (1, 1))]

    def dinf_targets_vec(self, z_fn, cells: np.ndarray):
        """(e1, e2, w1, w2) int64 arrays (targets -1 where no outflow) —
        vectorized dinf_targets over a cell array: 8 facets evaluated once
        per cell on batched z (the round-2 loader re-scanned all 8 facets of
        every neighbour per cell: ~64x redundant work, one z_fn element at a
        time — round-2 ADVICE)."""
        ONE = self.FD8_ONE
        quarter = np.pi / 4.0
        # distinct neighbour offsets used by the facets
        offs = [(0, 1), (-1, 0), (0, -1), (1, 0), (-1, 1), (-1, -1), (1, -1), (1, 1)]
        oidx = {o: k for k, o in enumerate(offs)}
        z0, zn, ncell = self._neighbor_z(cells, z_fn, offs)
        n = len(cells)
        s_all = np.full((n, 8), -np.inf)
        rang_all = np.zeros((n, 8))
        e1_all = np.full((n, 8), -1, np.int64)
        e2_all = np.full((n, 8), -1, np.int64)
        with np.errstate(invalid="ignore"):
            for f, (d1, d2) in enumerate(self.DINF_FACETS):
                k1, k2 = oidx[d1], oidx[d2]
                z1 = zn[:, k1]
                z2 = zn[:, k2]
                valid = ~np.isnan(z1) & ~np.isnan(z2)
                s1 = z0 - z1
                s2 = z1 - z2
                rang = np.arctan2(s2, s1)
                low = rang < 0.0
                high = rang > quarter
                s = np.sqrt(s1 * s1 + s2 * s2)
                s = np.where(low, s1, s)
                s = np.where(high, (z0 - z2) / 1.4142135623730951, s)
                rang = np.clip(rang, 0.0, quarter)
                s_all[:, f] = np.where(valid & (s > 0), s, -np.inf)
                rang_all[:, f] = rang
                e1_all[:, f] = ncell[:, k1]
                e2_all[:, f] = ncell[:, k2]
        best = np.argmax(s_all, axis=1)  # first max, like the scalar scan
        has = s_all[np.arange(n), best] > 0
        rang_b = rang_all[np.arange(n), best]
        w2 = np.floor(rang_b / quarter * ONE + 0.5).astype(np.int64)
        w1 = ONE - w2
        e1 = np.where(has & (w1 > 0), e1_all[np.arange(n), best], -1)
        e2 = np.where(has & (w2 > 0), e2_all[np.arange(n), best], -1)
        return e1, e2, w1, w2

    def dinf_load(self, z_fn) -> int:
        """Populates the SAME wave state as fd8_load; the rounds reuse
        fd8_round/fd8_result unchanged."""
        self._ensure()
        cells = self.cells_arr
        e1, e2, w1, w2 = self.dinf_targets_vec(z_fn, cells)
        # in-degree: evaluate every DISTINCT potential sender (local cells +
        # their neighbours) ONCE and count edges landing on local cells
        r = cells // self.cols
        c = cells % self.cols
        senders = [cells]
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                ok = (nr >= 0) & (nr < self.rows) & (nc >= 0) & (nc < self.cols)
                senders.append((nr * self.cols + nc)[ok])
        sun = np.unique(np.concatenate(senders))
        se1, se2, _sw1, _sw2 = self.dinf_targets_vec(z_fn, sun)
        tgts = np.concatenate([se1[se1 >= 0], se2[se2 >= 0]])
        pos, present = self._lookup(tgts)
        indeg = np.zeros(len(cells), np.int64)
        np.add.at(indeg, pos[present], 1)
        # edge list: e1 then e2 per cell (row-major nonzero keeps that order)
        em = np.stack([e1, e2], axis=1)
        wm = np.stack([w1, w2], axis=1)
        valid = em >= 0
        ci, ki = np.nonzero(valid)
        return self._fd8_set_edges(ci, em[ci, ki], wm[ci, ki], indeg)

    def mf_configure(self, load_fn, eff_fp_fn, absorp_fn) -> int:
        """Switch the (already dinf_load-ed) drain into mass-flux mode
        (hydro_analysis/dinf_mass_flux.rs): initial mass = loading units,
        recorded acc = loading + inflows, forwarded flux =
        (acc - absorption) * efficiency with efficiency a 2^20 fixed-point
        proportion (floor)."""
        self._ensure()
        cells = self.cells_arr
        load = np.asarray(load_fn(cells), np.int64) if len(cells) \
            else np.empty(0, np.int64)
        eff = np.asarray(eff_fp_fn(cells), np.int64) if len(cells) \
            else np.empty(0, np.int64)
        absorp = np.asarray(absorp_fn(cells), np.int64) if len(cells) \
            else np.empty(0, np.int64)
        self.fd8_mass_arr = load.copy()
        self._mf_eff = eff
        self._mf_abs = absorp
        return len(cells)

    # MDInf facet neighbour order (mdinf_flow_accum.rs:392-403):
    # N, NW, W, SW, S, SE, E, NE with dd = [1, sqrt2, 1, sqrt2, ...]
    MDINF_XD = (0, -1, -1, -1, 0, 1, 1, 1)
    MDINF_YD = (-1, -1, 0, 1, 1, 1, 0, -1)

    def mdinf_load(self, z_fn, exponent: float) -> int:
        """Populates the fd8 wave state with Seibert & McGlynn (2007)
        MD-infinity facet weights (mdinf_flow_accum.rs:440-605). Weights are
        2^20 fixed-point rounded; the drain runs with exact-weights mode
        (no remainder conservation) because the reference drops the weight
        share of facet corners that are not downslope. The reference's
        stale r_facet/s_facet carry-over across cells (arrays reused
        between stack pops without reinitializing unset entries) is NOT
        reproduced — unset facets are treated as nodata; this only affects
        raster-border cells. The convergence-threshold D8 switch is off
        (its default)."""
        self._fd8_exact_weights = True
        self._ensure()
        cells = self.cells_arr
        ONE = self.FD8_ONE
        qpi = np.pi / 4.0
        gr = 1.0  # grid_res = (res_x + res_y)/2 on the unit-resolution grid
        xd, yd = self.MDINF_XD, self.MDINF_YD
        dd = [1.0 if i % 2 == 0 else 1.4142135623730951 for i in range(8)]
        offs = list(zip(yd, xd))
        z0, zn, ncell = self._neighbor_z(cells, z_fn, offs)
        n = len(cells)
        r_facet = np.zeros((n, 8))
        s_facet = np.full((n, 8), np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            for c in range(8):
                i, ii = c, (c + 1) % 8
                p1, p2 = zn[:, i], zn[:, ii]
                both = ~np.isnan(p1) & ~np.isnan(p2)
                z1 = p1 - z0
                z2 = p2 - z0
                nx = (yd[i] * z2 - yd[ii] * z1) * gr
                ny = (xd[ii] * z1 - xd[i] * z2) * gr
                nz = (xd[i] * yd[ii] - xd[ii] * yd[i]) * gr * gr
                hr = np.where(nx == 0.0, np.where(ny >= 0.0, 0.0, np.pi),
                              np.where(nx >= 0.0,
                                       np.pi / 2.0 - np.arctan(ny / nx),
                                       3.0 * np.pi / 2.0 - np.arctan(ny / nx)))
                hs = -np.tan(np.arccos(
                    nz / np.sqrt(nx * nx + ny * ny + nz * nz)))
                outside = (hr < i * qpi) | (hr > (i + 1) * qpi)
                use1 = p1 < p2
                hr = np.where(outside, np.where(use1, i * qpi, ii * qpi), hr)
                hs = np.where(outside,
                              np.where(use1, (z0 - p1) / (dd[i] * gr),
                                       (z0 - p2) / (dd[ii] * gr)), hs)
                r_facet[:, c] = np.where(both, hr, r_facet[:, c])
                s_facet[:, c] = np.where(both, hs, s_facet[:, c])
                # one-sided facet (p2 off-grid): direction of p1 if downhill
                # (the reference divides by dd[ii] here — replicated quirk)
                one = ~both & ~np.isnan(p1) & (p1 < z0)
                r_facet[:, c] = np.where(one, i / 4.0 * np.pi, r_facet[:, c])
                s_facet[:, c] = np.where(one, (z0 - p1) / (dd[ii] * gr),
                                         s_facet[:, c])

            valley = np.zeros((n, 8))
            for c in range(8):
                i, ii, iprev = c, (c + 1) % 8, (c + 7) % 8
                sf = s_facet[:, i]
                rf = r_facet[:, i]
                inside = (rf > i * qpi) & (rf < (i + 1) * qpi)
                same = rf == r_facet[:, ii]
                bord1 = np.isnan(s_facet[:, ii]) & (rf == (i + 1) * qpi)
                bord2 = np.isnan(s_facet[:, iprev]) & (rf == i * qpi)
                take = (sf > 0) & (inside | same | bord1 | bord2)
                valley[:, c] = np.where(take, sf, 0.0)
            if exponent != 1.0:
                valley = valley ** exponent
            vsum = np.zeros(n)
            for c in range(8):
                vsum = vsum + valley[:, c]
            has = vsum > 0
            valley = np.where(has[:, None], valley / vsum[:, None], 0.0)
            rf7 = np.where(r_facet[:, 7] == 0.0, 2.0 * np.pi, r_facet[:, 7])
            r_facet[:, 7] = rf7
            weights = np.zeros((n, 8))
            for c in range(8):
                i, ii = c, (c + 1) % 8
                v = valley[:, i]
                pos = v > 0
                weights[:, i] += np.where(
                    pos, v * ((i + 1) * qpi - r_facet[:, i]) / qpi, 0.0)
                weights[:, ii] += np.where(
                    pos, v * (r_facet[:, i] - i * qpi) / qpi, 0.0)
            down = ~np.isnan(zn) & (zn < z0[:, None])
            pending = (~np.isnan(zn) & (zn > z0[:, None])).sum(axis=1)
            w = np.where(down, np.floor(weights * ONE + 0.5), 0.0) \
                .astype(np.int64)
        ci, ki = np.nonzero(down)  # every downslope neighbour is an edge
        return self._fd8_set_edges(ci, ncell[ci, ki], w[ci, ki], pending)

    def fd8_round(self, msgs: list[np.ndarray]):
        """Vectorized multi-flow drain: messages scatter into the dense
        mass/pending arrays, then local topological waves forward shares
        along the CSR edge lists (fd8_flow_accum.rs:483-560 semantics:
        exact fixed-point conservation with the remainder on the LAST
        downslope edge, or exact-weights mode for MDInf)."""
        ONE = self.FD8_ONE
        if msgs:
            arr = np.concatenate([a.reshape(-1, 3) for a in msgs])
            pos, present = self._lookup(arr[:, 0])
            np.add.at(self.fd8_mass_arr, pos[present], arr[present, 1])
            np.subtract.at(self.fd8_pending_arr, pos[present],
                           arr[present, 2])
        exact_w = getattr(self, "_fd8_exact_weights", False)
        mf_eff = getattr(self, "_mf_eff", None)
        indptr = self.fd8_indptr
        out_t: list[np.ndarray] = []
        out_u: list[np.ndarray] = []
        frontier = np.flatnonzero((self.fd8_pending_arr == 0)
                                  & ~self.fd8_done)
        while len(frontier):
            self.fd8_done[frontier] = True
            self.fd8_pending_arr[frontier] = -1  # never re-selected
            m = self.fd8_mass_arr[frontier].copy()
            self.fd8_acc_arr[frontier] = m
            if mf_eff is not None:
                # mass-flux mode (dinf_mass_flux.rs): recorded value is
                # loading + inflows; forwarded flux pays absorption then
                # proportional efficiency (fixed-point floor)
                m = (m - self._mf_abs[frontier]) * mf_eff[frontier] // ONE
            cnt = indptr[frontier + 1] - indptr[frontier]
            total = int(cnt.sum())
            if total:
                rep = np.repeat(np.arange(len(frontier)), cnt)
                csum = np.concatenate([np.zeros(1, np.int64),
                                       np.cumsum(cnt)])
                eidx = np.repeat(indptr[frontier], cnt) \
                    + np.arange(total) - np.repeat(csum[:-1], cnt)
                share = m[rep] * self.fd8_w[eidx] // ONE
                if not exact_w:
                    cellsum = np.zeros(len(frontier), np.int64)
                    np.add.at(cellsum, rep, share)
                    has = cnt > 0
                    last = csum[1:][has] - 1
                    hsrc = np.flatnonzero(has)
                    share[last] = m[hsrc] - (cellsum[hsrc] - share[last])
                tl = self.fd8_tgt_loc[eidx]
                lm = tl >= 0
                np.add.at(self.fd8_mass_arr, tl[lm], share[lm])
                np.subtract.at(self.fd8_pending_arr, tl[lm], 1)
                if (~lm).any():
                    out_t.append(self.fd8_tgt[eidx[~lm]])
                    out_u.append(share[~lm])
                # next frontier = only the targets that just hit zero (a
                # full (pending == 0) rescan per wave is O(n * waves))
                cand = np.unique(tl[lm])
                frontier = cand[(self.fd8_pending_arr[cand] == 0)
                                & ~self.fd8_done[cand]]
            else:
                frontier = np.empty(0, np.int64)
        if not out_t:
            return {}
        oc = np.concatenate(out_t)
        ou = np.concatenate(out_u)
        uniq, inv = np.unique(oc, return_inverse=True)
        usum = np.zeros(len(uniq), np.int64)
        ucnt = np.zeros(len(uniq), np.int64)
        np.add.at(usum, inv, ou)
        np.add.at(ucnt, inv, 1)
        rows = np.stack([uniq, usum, ucnt], axis=1)
        return self._group_rows(self._vec_shard(uniq), rows)

    def fd8_result(self) -> pa.Table:
        return pa.table({"cell_id": self.cells_arr[self.fd8_done],
                         "acc_units": self.fd8_acc_arr[self.fd8_done]})

    def fd8_unresolved(self) -> int:
        return int((~self.fd8_done).sum())

    # ---- downslope flowpath length ---------------------------------------
    # downslope_flowpath_length.rs: distance along the D8 path to the outlet.
    # One-time pointer-doubling tables (U = units to the shard exit, D = exit
    # cell, OK = terminal?) replace the round-2 per-probe memoized Python
    # walks; probes resolve as pure vectorized gathers.
    def _ensure_resolve(self):
        if self._res is not None:
            return
        self._ensure()
        n = len(self.cells_arr)
        U = np.zeros(n, np.int64)
        D = np.zeros(n, np.int64)
        OK = np.zeros(n, bool)
        J = np.full(n, -1, np.int64)
        loc = self.down_loc
        term = loc == -2
        D[term] = self.cells_arr[term]
        OK[term] = True
        ext = loc == -1
        D[ext] = self.down_arr[ext]
        U[ext] = self._vec_hops(self.cells_arr[ext], self.down_arr[ext])
        lm = loc >= 0
        J[lm] = loc[lm]
        U[lm] = self._vec_hops(self.cells_arr[lm], self.down_arr[lm])
        # doubling: invariant U[i] = units from cell i to cell J[i] (or to
        # D[i] once J[i] = -1); gathers read pre-iteration state
        while True:
            a = np.flatnonzero(J >= 0)
            if not len(a):
                break
            t = J[a]
            Ut, Jt, Dt, OKt = U[t], J[t], D[t], OK[t]
            U[a] += Ut
            done = Jt < 0
            ad = a[done]
            D[ad] = Dt[done]
            OK[ad] = OKt[done]
            J[ad] = -1
            J[a[~done]] = Jt[~done]
        self._res = (U, D, OK)

    def _probe_resolve(self, cur: np.ndarray):
        """(U, D, OK) for arbitrary probe cells; absent cells are terminal
        at themselves (matches the dict walks' down.get(cur, -1))."""
        self._ensure_resolve()
        U, D, OK = self._res
        if not len(self.cells_arr):
            return (np.zeros(len(cur), np.int64), cur.copy(),
                    np.ones(len(cur), bool))
        pos, present = self._lookup(cur)
        u = np.where(present, U[pos], 0)
        d = np.where(present, D[pos], cur)
        ok = np.where(present, OK[pos], True)
        return u, d, ok

    def fl_len_init(self):
        self._ensure()
        self.fpl_parts: list[tuple[np.ndarray, np.ndarray]] = []
        return self._fl_len_apply(self.cells_arr, self.cells_arr,
                                  np.zeros(len(self.cells_arr), np.int64))

    def fl_len_round(self, msgs: list[np.ndarray]):
        if msgs:
            arr = np.concatenate([a.reshape(-1, 3) for a in msgs])
        else:
            arr = np.empty((0, 3), np.int64)
        return self._fl_len_apply(arr[:, 0], arr[:, 1], arr[:, 2])

    def _fl_len_apply(self, cur, origin, acc_units):
        u, d, ok = self._probe_resolve(cur)
        units = acc_units + u
        self.fpl_parts.append((origin[ok], units[ok]))
        rows = np.stack([d[~ok], origin[~ok], units[~ok]], axis=1)
        return self._group_rows(self._vec_shard(d[~ok]), rows)

    def fl_len_resolve(self, msgs: list[np.ndarray]) -> int:
        n = 0
        for arr in msgs:
            arr = arr.reshape(-1, 2)
            self.fpl_parts.append((arr[:, 0], arr[:, 1]))
            n += len(arr)
        return n

    def fl_len_homeless(self):
        origin = np.concatenate([p[0] for p in self.fpl_parts]) \
            if self.fpl_parts else np.empty(0, np.int64)
        units = np.concatenate([p[1] for p in self.fpl_parts]) \
            if self.fpl_parts else np.empty(0, np.int64)
        _, present = self._lookup(origin)
        self.fpl_parts = [(origin[present], units[present])]
        rows = np.stack([origin[~present], units[~present]], axis=1)
        return self._group_rows(self._vec_shard(origin[~present]), rows)

    def fl_len_result(self) -> pa.Table:
        origin = np.concatenate([p[0] for p in self.fpl_parts]) \
            if self.fpl_parts else np.empty(0, np.int64)
        units = np.concatenate([p[1] for p in self.fpl_parts]) \
            if self.fpl_parts else np.empty(0, np.int64)
        return pa.table({"cell_id": origin, "len_units": units})

    # ---- downslope index (bounded-drop walk) -----------------------------
    # Probes walk hop-by-hop until the cumulative elevation drop reaches
    # d (the doubling tables can't stop mid-chain). The per-probe state is
    # (origin, cur, units, z0); local advancing is vectorized and a probe
    # leaves the shard at most once per crossing — rounds are bounded by
    # shard crossings, not path length.
    def dsi_load(self, z_fn, d_drop: int) -> int:
        self._ensure()
        self._dsi_d = int(d_drop)
        self._dsi_z = z_fn(self.cells_arr).astype(np.int64) \
            if len(self.cells_arr) else np.empty(0, np.int64)
        return len(self.cells_arr)

    def dsi_init(self):
        self._ensure()
        self.dsi_parts: list[np.ndarray] = []
        z0 = self._dsi_z
        return self._dsi_apply(self.cells_arr, self.cells_arr,
                               np.zeros(len(self.cells_arr), np.int64), z0)

    def dsi_round(self, msgs: list[np.ndarray]):
        if msgs:
            arr = np.concatenate([a.reshape(-1, 4) for a in msgs])
        else:
            arr = np.empty((0, 4), np.int64)
        return self._dsi_apply(arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3])

    def _dsi_apply(self, cur, origin, units, z0):
        cur = cur.astype(np.int64)
        origin = origin.astype(np.int64)
        units = units.astype(np.int64)
        z0 = z0.astype(np.int64)
        out_rows = []
        while len(cur):
            pos, present = self._lookup(cur)
            # probes for non-local cells route away
            if (~present).any():
                rows = np.stack([cur[~present], origin[~present],
                                 units[~present], z0[~present]], axis=1)
                out_rows.append(rows)
            cur, pos = cur[present], pos[present]
            origin, units, z0 = origin[present], units[present], z0[present]
            if not len(cur):
                break
            drop_hit = z0 - self._dsi_z[pos] >= self._dsi_d
            if drop_hit.any():
                self.dsi_parts.append(np.stack(
                    [origin[drop_hit], units[drop_hit],
                     np.ones(int(drop_hit.sum()), np.int64)], axis=1))
            go = ~drop_hit
            cur, pos = cur[go], pos[go]
            origin, units, z0 = origin[go], units[go], z0[go]
            if not len(cur):
                break
            down = self.down_arr[pos]
            term = down < 0
            if term.any():
                self.dsi_parts.append(np.stack(
                    [origin[term], units[term],
                     np.zeros(int(term.sum()), np.int64)], axis=1))
            adv = ~term
            nxt = down[adv]
            units = units[adv] + self._vec_hops(cur[adv], nxt)
            origin, z0 = origin[adv], z0[adv]
            cur = nxt
        if not out_rows:
            return {}
        rows = np.concatenate(out_rows)
        return self._group_rows(self._vec_shard(rows[:, 0]), rows)

    def dsi_result(self) -> pd.DataFrame:
        """(origin, units, reached) rows — delivered to whichever shard
        recorded them; callers aggregate by cell_id downstream."""
        if not getattr(self, "dsi_parts", None):
            return pd.DataFrame({"cell_id": np.empty(0, np.int64),
                                 "units": np.empty(0, np.int64),
                                 "reached": np.empty(0, np.int64)})
        arr = np.concatenate(self.dsi_parts)
        return pd.DataFrame({"cell_id": arr[:, 0], "units": arr[:, 1],
                             "reached": arr[:, 2]})

    # ---- basins (outlet labelling) --------------------------------------
    # Same doubling tables as flowpath length; only (D, OK) are consumed.
    def bas_init(self):
        self._ensure()
        self.bas_parts: list[tuple[np.ndarray, np.ndarray]] = []
        return self._bas_apply(self.cells_arr, self.cells_arr)

    def bas_round(self, msgs: list[np.ndarray]):
        if msgs:
            arr = np.concatenate([a.reshape(-1, 2) for a in msgs])
        else:
            arr = np.empty((0, 2), np.int64)
        return self._bas_apply(arr[:, 0], arr[:, 1])

    def _bas_apply(self, cur, origin):
        _, d, ok = self._probe_resolve(cur)
        self.bas_parts.append((origin[ok], d[ok]))
        rows = np.stack([d[~ok], origin[~ok]], axis=1)
        return self._group_rows(self._vec_shard(d[~ok]), rows)

    def bas_resolve(self, msgs: list[np.ndarray]) -> int:
        """Deliver resolved (origin, outlet) labels home."""
        n = 0
        for arr in msgs:
            arr = arr.reshape(-1, 2)
            self.bas_parts.append((arr[:, 0], arr[:, 1]))
            n += len(arr)
        return n

    def bas_homeless(self):
        """(origin, outlet) rows for origins NOT local to this shard."""
        origin = np.concatenate([p[0] for p in self.bas_parts]) \
            if self.bas_parts else np.empty(0, np.int64)
        dest = np.concatenate([p[1] for p in self.bas_parts]) \
            if self.bas_parts else np.empty(0, np.int64)
        _, present = self._lookup(origin)
        self.bas_parts = [(origin[present], dest[present])]
        rows = np.stack([origin[~present], dest[~present]], axis=1)
        return self._group_rows(self._vec_shard(origin[~present]), rows)

    def bas_result(self) -> pa.Table:
        origin = np.concatenate([p[0] for p in self.bas_parts]) \
            if self.bas_parts else np.empty(0, np.int64)
        dest = np.concatenate([p[1] for p in self.bas_parts]) \
            if self.bas_parts else np.empty(0, np.int64)
        return pa.table({"cell_id": origin, "basin": dest})

    # ---- path visit enumeration (MaxBranchLength support) ---------------
    # Probes (origin, cur, units) walk hop-by-hop; every VISITED cell's
    # owning shard records (visited, origin, units) — including the start
    # (units 0) and the terminal. Visit rows therefore land sharded by the
    # visited cell, exactly the partitioning the pair-meet join wants.
    # Memory per shard is bounded by the total flowpath length crossing it
    # (the same O(sum path) work the reference's marking scan performs).
    def vis_init(self, nonpit_only: bool = False):
        self._ensure()
        self.vis_parts: list[np.ndarray] = []
        seeds = self.cells_arr
        if nonpit_only and len(seeds):
            seeds = seeds[self.down_arr >= 0]
        return self._vis_apply(seeds, seeds,
                               np.zeros(len(seeds), np.int64))

    def vis_round(self, msgs: list[np.ndarray]):
        if msgs:
            arr = np.concatenate([a.reshape(-1, 3) for a in msgs])
        else:
            arr = np.empty((0, 3), np.int64)
        return self._vis_apply(arr[:, 0], arr[:, 1], arr[:, 2])

    def _vis_apply(self, cur, origin, units):
        cur = cur.astype(np.int64)
        origin = origin.astype(np.int64)
        units = units.astype(np.int64)
        out_rows = []
        while len(cur):
            pos, present = self._lookup(cur)
            if (~present).any():
                out_rows.append(np.stack([cur[~present], origin[~present],
                                          units[~present]], axis=1))
            cur, pos = cur[present], pos[present]
            origin, units = origin[present], units[present]
            if not len(cur):
                break
            self.vis_parts.append(np.stack([cur, origin, units], axis=1))
            down = self.down_arr[pos]
            adv = down >= 0
            nxt = down[adv]
            units = units[adv] + self._vec_hops(cur[adv], nxt)
            origin = origin[adv]
            cur = nxt
        if not out_rows:
            return {}
        rows = np.concatenate(out_rows)
        return self._group_rows(self._vec_shard(rows[:, 0]), rows)

    def vis_result(self) -> pd.DataFrame:
        if not getattr(self, "vis_parts", None):
            return pd.DataFrame({"cell_id": np.empty(0, np.int64),
                                 "origin": np.empty(0, np.int64),
                                 "units": np.empty(0, np.int64)})
        arr = np.concatenate(self.vis_parts)
        return pd.DataFrame({"cell_id": arr[:, 0], "origin": arr[:, 1],
                             "units": arr[:, 2]})

    # ---- isobasins (equal-area basin cutting) ----------------------------
    # hydro_analysis/isobasins.rs pour-point scan as an in-degree-gated
    # topological wave (the muf_* pattern): a cell fires once every
    # inflowing contribution arrived; its carried accumulation fa is
    # 1 + sum(contributions), and when fa >= target the basin is cut either
    # at the largest inflowing neighbour (if that is closer to the target)
    # or at the cell itself. Messages carry (to, from, fa) so the tie rule
    # (strictly-greater scan in D8 order 0..7) is reproduced exactly.
    def iso_init_load(self, indeg_df: pd.DataFrame, target: int) -> int:
        if not hasattr(self, "iso_pending"):
            self._ensure()
            n = len(self.cells_arr)
            self.iso_pending = np.zeros(n, np.int64)
            self.iso_sum = np.zeros(n, np.int64)
            self.iso_bestkey = np.full(n, -1, np.int64)
            self.iso_bestfrom = np.full(n, -1, np.int64)
            self.iso_bestfa = np.zeros(n, np.int64)
            self.iso_done = np.zeros(n, bool)
            self.iso_outlets: list[np.ndarray] = []
            # D8 offset (frm - to) -> scan index i, vectorized via a sorted
            # offset table (isobasins.rs walks neighbours in pointer order)
            offs = np.array([dy * self.cols + dx for dx, dy in
                             zip((1, 1, 1, 0, -1, -1, -1, 0),
                                 (-1, 0, 1, 1, 1, 0, -1, -1))], np.int64)
            order = np.argsort(offs)
            self._iso_offs_sorted = offs[order]
            self._iso_idx_sorted = np.arange(8, dtype=np.int64)[order]
        self.iso_target = int(target)
        cells = indeg_df["cell_id"].to_numpy(np.int64)
        pos, present = self._lookup(cells)
        self.iso_pending[pos[present]] = \
            indeg_df["n_inflow"].to_numpy(np.int64)[present]
        return len(indeg_df)

    def _iso_recv(self, pos: np.ndarray, frm: np.ndarray, fa: np.ndarray):
        """Vectorized recv: scatter fa sums, in-degree decrements, and the
        max-fa / lowest-D8-index tie rule (key = fa*8 + (7-i); keys are
        unique per (fa, direction), so the winner set after np.maximum.at
        is exactly the messages whose key equals the stored best)."""
        to_cell = self.cells_arr[pos]
        k = np.searchsorted(self._iso_offs_sorted, frm - to_cell)
        i = self._iso_idx_sorted[np.clip(k, 0, 7)]
        key = fa * 8 + (7 - i)
        np.add.at(self.iso_sum, pos, fa)
        np.maximum.at(self.iso_bestkey, pos, key)
        win = key == self.iso_bestkey[pos]
        self.iso_bestfrom[pos[win]] = frm[win]
        self.iso_bestfa[pos[win]] = fa[win]
        np.subtract.at(self.iso_pending, pos, 1)

    def iso_round(self, msgs: list[np.ndarray]):
        if not hasattr(self, "iso_pending"):  # shard holds no graph cells
            return {}
        if msgs:
            arr = np.concatenate([a.reshape(-1, 3) for a in msgs])
            if len(arr):
                pos, present = self._lookup(arr[:, 0])
                self._iso_recv(pos[present], arr[present, 1],
                               arr[present, 2])
        target = self.iso_target
        out_t: list[np.ndarray] = []
        out_f: list[np.ndarray] = []
        out_a: list[np.ndarray] = []
        frontier = np.flatnonzero((self.iso_pending == 0) & ~self.iso_done)
        while len(frontier):
            self.iso_done[frontier] = True
            self.iso_pending[frontier] = -1
            cells = self.cells_arr[frontier]
            fa = 1 + self.iso_sum[frontier]
            inla = self.iso_bestfa[frontier]
            has_best = self.iso_bestfrom[frontier] >= 0
            cut = fa >= target
            use_inflow = cut & ((target - inla) < (fa - target)) & has_best
            self_cut = cut & ~use_inflow
            if use_inflow.any():
                self.iso_outlets.append(
                    self.iso_bestfrom[frontier[use_inflow]])
            if self_cut.any():
                self.iso_outlets.append(cells[self_cut])
            fa = np.where(use_inflow, fa - inla, fa)
            fa = np.where(self_cut, np.int64(1), fa)
            tl = self.down_loc[frontier]
            term = self.down_arr[frontier] < 0
            t_out = term & ~self_cut
            if t_out.any():
                self.iso_outlets.append(cells[t_out])
            lm = tl >= 0
            if lm.any():
                self._iso_recv(tl[lm], cells[lm], fa[lm])
            rm = ~term & ~lm
            if rm.any():
                out_t.append(self.down_arr[frontier[rm]])
                out_f.append(cells[rm])
                out_a.append(fa[rm])
            cand = np.unique(tl[lm]) if lm.any() else np.empty(0, np.int64)
            frontier = cand[(self.iso_pending[cand] == 0)
                            & ~self.iso_done[cand]]
        if not out_t:
            return {}
        rows = np.stack([np.concatenate(out_t), np.concatenate(out_f),
                         np.concatenate(out_a)], axis=1)
        return self._group_rows(self._vec_shard(rows[:, 0]), rows)

    def iso_result(self) -> pd.DataFrame:
        """(outlet, boundary): per-shard outlets, already unique within the
        shard. boundary=1 marks outlets within one cell of a shard
        boundary — the only cells a SECOND shard can also have recorded
        (a cross-shard duplicate needs the outlet adjacent to a foreign
        cell). The predicate depends only on the outlet's own
        neighbourhood, so every recorder classifies it identically."""
        parts = getattr(self, "iso_outlets", [])
        o = np.unique(np.concatenate(parts)) if parts \
            else np.empty(0, np.int64)
        r = o // self.cols
        c = o % self.cols
        own = self._vec_shard(o)
        bnd = np.zeros(len(o), bool)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                ok = (nr >= 0) & (nr < self.rows) \
                    & (nc >= 0) & (nc < self.cols)
                if ok.any():
                    s = self._vec_shard(nr[ok] * self.cols + nc[ok])
                    sub = bnd[ok]
                    sub |= s != own[ok]
                    bnd[ok] = sub
        return pd.DataFrame({"outlet": o,
                             "boundary": bnd.astype(np.int8)})

    def iso_unresolved(self) -> int:
        if not hasattr(self, "iso_pending"):
            return 0
        return int((~self.iso_done).sum())

    # ---- cost distance ---------------------------------------------------
    def _lc_setup(self, offs, surf_fn):
        """Dense label-correcting state (round-3 VERDICT item: the heapq +
        dict Dijkstra/priority-flood interiors are now whole-array relax
        waves). Per offset (dr, dc) the shift cell -> cell + dr*cols + dc is
        INJECTIVE, so each direction relaxes with a plain np.minimum gather/
        scatter — no ufunc.at, no collisions. Pre-batches the surface values
        of every neighbour once (fn is pure)."""
        self._ensure()
        cells = self.cells_arr
        n = len(cells)
        r = cells // self.cols
        c = cells % self.cols
        self._lc_self = np.asarray(surf_fn(cells), np.int64) if n \
            else np.empty(0, np.int64)
        self._lc_nbr = []
        self._lc_offs = list(offs)
        for dr, dc in offs:
            nr, nc = r + dr, c + dc
            ok = (nr >= 0) & (nr < self.rows) & (nc >= 0) & (nc < self.cols)
            u = np.where(ok, nr * self.cols + nc, -1)
            uloc = np.full(n, -1, np.int64)
            if ok.any():
                pos, present = self._lookup(u[ok])
                sub = np.full(int(ok.sum()), -1, np.int64)
                sub[present] = pos[present]
                uloc[ok] = sub
            uval = np.zeros(n, np.int64)
            if ok.any():
                uval[ok] = np.asarray(surf_fn(u[ok]), np.int64)
            self._lc_nbr.append((ok, u, uloc, uval))
        self._lc_val = np.full(n, 1 << 62, np.int64)
        self._hp_val = None  # heap-canvas cache is per-_lc_setup
        self._hp_used = False

    def _hp_ensure(self):
        """Padded dense canvas + heap state for the exact within-shard
        relax. The shard's row span, full grid width, plus a one-cell
        sentinel ring (surface INF) so the hot loop needs no bounds
        checks. Surface/value canvases are plain Python lists: the heap
        loop does ~10 scalar reads per cell and list indexing is ~3x
        cheaper than boxing numpy scalars. Built once per _lc_setup."""
        if getattr(self, "_hp_val", None) is not None:
            return
        cells = self.cells_arr
        INF = 1 << 62
        rmin = int(cells[0] // self.cols) if len(cells) else 0
        rmax = int(cells[-1] // self.cols) if len(cells) else 0
        wp = self.cols + 2
        size = (rmax - rmin + 3) * wp
        ppos = (cells // self.cols - rmin + 1) * wp + cells % self.cols + 1
        self._hp_ppos = ppos
        z = np.full(size, INF, np.int64)
        z[ppos] = self._lc_self
        self._hp_z = z.tolist()
        self._hp_val = np.full(size, INF, np.int64).tolist()
        ap = np.full(size, -1, np.int64)
        ap[ppos] = np.arange(len(cells), dtype=np.int64)
        self._hp_arrpos = ap
        if len(self._lc_offs) == 8:
            self._hp_offs = (-wp - 1, -wp, -wp + 1, -1, 1,
                             wp - 1, wp, wp + 1)
        else:
            self._hp_offs = (-wp, -1, 1, wp)

    def _lc_relax(self, cand_cells: np.ndarray, cand_vals: np.ndarray,
                  mode: str):
        """Relax to the within-shard fixpoint, then emit min-candidates for
        every remote in-grid neighbour of an improved cell. mode='cd':
        candidate = val + cost(self) + cost(nbr); mode='fl': max(val, z_nbr)
        — the (min, +) and (min, max) semirings share the loop.

        Two exact interiors, chosen by front shape (measured at 6.12M
        cells on a hash surface, the worst case — ~n/9 pits):

        * FIRST call (seeds: raster border / source points — a THIN front
          that must flood the whole shard): heap relax = sequential
          priority-flood / Dijkstra over a padded canvas
          (fill_depressions.rs:131-210 semantics). Candidates pre-load
          the heap, edge updates are monotone non-decreasing in both
          semirings, so the first pop of a cell is final and each touched
          cell settles once — n pops regardless of surface shape. The
          vectorized wave needs ~stripe-width iterations here (27 s vs
          6 s) and Planchon-Darboux scans need O(depression nesting)
          passes (>40 on hash surfaces).
        * LATER calls (cross-shard message rounds — a WIDE border front
          with shallow-to-deep penetration): vectorized active-set wave.
          Each iteration relaxes the whole front at numpy speed, which
          beats the scalar heap ~3x when the front is 10k+ cells wide
          (4 s vs 13 s over all rounds)."""
        INF = 1 << 62
        val = self._lc_val
        n = len(val)
        if n == 0:
            return {}
        entry = val.copy()  # BEFORE candidates: seed improvements must count
        if len(cand_cells):
            pos, present = self._lookup(np.asarray(cand_cells, np.int64))
            cv = np.asarray(cand_vals, np.int64)
        else:
            pos = present = cv = None
        cd = mode == "cd"
        if not getattr(self, "_hp_used", False) and not cd:
            # ---- seed call, (min, max) semiring: monotone BUCKET queue --
            # Priority-flood pops in non-decreasing order and every push is
            # nv = max(v, z_q) >= v, so a Dial's queue over RANK-COMPRESSED
            # levels (the z value set ∪ seed values) is exact: the cursor
            # only advances, each bucket entry is live iff hv still equals
            # its bucket's level, and rank(nv) is O(1) — z_q's precomputed
            # rank when z_q > v, the cursor rank otherwise. Replaces the
            # packed heap's O(log n) sifts with O(1) list ops (round-4
            # VERDICT item 8; measured ~1.9x on the 387k-cell hash shard).
            self._hp_used = True
            self._hp_ensure()
            hv = self._hp_val
            hz = self._hp_z
            offs = self._hp_offs
            if pos is None or not present.any():
                return {}
            lvl = np.unique(np.concatenate([self._lc_self, cv[present]]))
            zrank = np.full(len(hv), -1, np.int64)
            zrank[self._hp_ppos] = np.searchsorted(lvl, self._lc_self)
            zr = zrank.tolist()
            K = len(lvl)
            lvl_l = lvl.tolist()
            buckets: list[list[int]] = [[] for _ in range(K)]
            seed_rk = np.searchsorted(lvl, cv[present])
            pp = self._hp_ppos[pos[present]]
            for p, v, rk in zip(pp.tolist(), cv[present].tolist(),
                                seed_rk.tolist()):
                if v < hv[p]:
                    hv[p] = v
                    buckets[rk].append(p)
            ch_p: list[int] = []
            ch_v: list[int] = []
            app_p = ch_p.append
            app_v = ch_v.append
            INFl = INF
            rk = 0
            while rk < K:
                b = buckets[rk]
                if not b:
                    rk += 1
                    continue
                v = lvl_l[rk]
                bpop = b.pop
                bapp = b.append
                while b:  # b grows with same-level (flood) pushes
                    p = bpop()
                    if hv[p] != v:
                        continue  # superseded by a lower level
                    app_p(p)
                    app_v(v)
                    for o in offs:
                        q = p + o
                        zq = hz[q]
                        if zq < INFl and (v if v > zq else zq) < hv[q]:
                            if zq <= v:
                                hv[q] = v
                                bapp(q)
                            else:
                                hv[q] = zq
                                buckets[zr[q]].append(q)
                rk += 1
            ai = self._hp_arrpos[np.asarray(ch_p, np.int64)]
            np.minimum.at(val, ai, np.asarray(ch_v, np.int64))
            self._hp_val = self._hp_z = None
            self._hp_ppos = self._hp_arrpos = None
        elif not getattr(self, "_hp_used", False):
            # ---- seed call: exact heap relax --------------------------
            self._hp_used = True
            self._hp_ensure()
            hv = self._hp_val
            hz = self._hp_z
            offs = self._hp_offs
            # hv[q] is updated at PUSH time (lazy-deletion decrease-key):
            # a popped entry is live iff its value still equals hv[p], so
            # each cell is pushed once per strict improvement (~1x/cell
            # measured vs ~4x with settle-time updates) and settled once.
            # Keys pack to one int when the value bound fits beside the
            # canvas position — int compares during sift are ~5x cheaper
            # than tuple compares (6.8 s -> 2.0 s per 387k-cell shard).
            sh_bits = (len(hv) - 1).bit_length()
            if cd:
                own_max = int(self._lc_self.max()) if len(self._lc_self) \
                    else 0
                vbound = (int(cv[present].max()) if pos is not None
                          and present.any() else 0) \
                    + 2 * own_max * (n + 1)
            else:
                vbound = int(self._lc_self.max()) if len(self._lc_self) \
                    else 0
                if pos is not None and present.any():
                    vbound = max(vbound, int(cv[present].max()))
            packed = 0 <= vbound < (1 << (62 - sh_bits))
            heap = []
            if pos is not None:
                pp = self._hp_ppos[pos[present]]
                for p, v in zip(pp.tolist(), cv[present].tolist()):
                    if v < hv[p]:
                        hv[p] = v
                        heap.append((v << sh_bits) | p if packed else (v, p))
            if not heap:
                return {}
            heapq.heapify(heap)
            push = heapq.heappush
            pop = heapq.heappop
            ch_p: list[int] = []
            ch_v: list[int] = []
            mask = (1 << sh_bits) - 1
            while heap:
                if packed:
                    k = pop(heap)
                    v = k >> sh_bits
                    p = k & mask
                else:
                    v, p = pop(heap)
                if hv[p] != v:
                    continue  # stale: a lower candidate superseded it
                ch_p.append(p)
                ch_v.append(v)
                if cd:
                    base = v + hz[p]
                    for o in offs:
                        q = p + o
                        zq = hz[q]
                        if zq < INF:
                            nv = base + zq
                            if nv < hv[q]:
                                hv[q] = nv
                                push(heap, (nv << sh_bits) | q if packed
                                     else (nv, q))
                else:
                    for o in offs:
                        q = p + o
                        zq = hz[q]
                        if zq < INF:
                            nv = v if v > zq else zq
                            if nv < hv[q]:
                                hv[q] = nv
                                push(heap, (nv << sh_bits) | q if packed
                                     else (nv, q))
            # write the settled values back to the dense shard array
            # (values only decrease, so min-scatter is duplicate-safe)
            ai = self._hp_arrpos[np.asarray(ch_p, np.int64)]
            np.minimum.at(val, ai, np.asarray(ch_v, np.int64))
            # the heap canvas (Python lists, ~36 B/cell) serves only this
            # seed call — message rounds use the wave — so free it now
            self._hp_val = self._hp_z = None
            self._hp_ppos = self._hp_arrpos = None
        else:
            # ---- message round: vectorized active-set wave ------------
            if pos is not None:
                np.minimum.at(val, pos[present], cv[present])
            if np.array_equal(entry, val):
                return {}  # nothing improved: the fixpoint holds
            active = np.flatnonzero(val < entry)
            while len(active):
                nxt: list[np.ndarray] = []
                for ok, u, uloc, uval in self._lc_nbr:
                    tl = uloc[active]
                    m = tl >= 0
                    if not m.any():
                        continue
                    src = active[m]
                    tgt = tl[m]
                    if cd:
                        cand = val[src] + self._lc_self[src] + uval[src]
                    else:
                        cand = np.maximum(val[src], uval[src])
                    imp = cand < val[tgt]
                    if imp.any():
                        val[tgt[imp]] = cand[imp]
                        nxt.append(tgt[imp])
                active = np.unique(np.concatenate(nxt)) if nxt \
                    else np.empty(0, np.int64)
        improved = val < entry
        if not improved.any():
            return {}
        msgs_t: list[np.ndarray] = []
        msgs_v: list[np.ndarray] = []
        for ok, u, uloc, uval in self._lc_nbr:
            rm = ok & (uloc < 0) & improved
            if not rm.any():
                continue
            if mode == "cd":
                nd = val[rm] + self._lc_self[rm] + uval[rm]
            else:
                nd = np.maximum(val[rm], uval[rm])
            msgs_t.append(u[rm])
            msgs_v.append(nd)
        if not msgs_t:
            return {}
        t = np.concatenate(msgs_t)
        v = np.concatenate(msgs_v)
        uniq, inv = np.unique(t, return_inverse=True)
        mv = np.full(len(uniq), INF, np.int64)
        np.minimum.at(mv, inv, v)
        rows = np.stack([uniq, mv], axis=1)
        return self._group_rows(self._vec_shard(uniq), rows)

    def cd_load(self, cost_fn) -> int:
        """cost_fn: pure fn(cell_ids)->int64 (synthetic surface / raster
        lookup), pre-batched over local cells + halo."""
        self._lc_setup([(1, 0), (-1, 0), (0, 1), (0, -1)], cost_fn)
        return len(self.cells_arr)

    def cd_seed(self, sources: np.ndarray):
        src = np.asarray(sources, np.int64)
        return self._lc_relax(src, np.zeros(len(src), np.int64), "cd")

    def cd_round(self, msgs: list[np.ndarray]):
        if msgs:
            arr = np.concatenate([a.reshape(-1, 2) for a in msgs])
        else:
            arr = np.empty((0, 2), np.int64)
        return self._lc_relax(arr[:, 0], arr[:, 1], "cd")

    def cd_result(self) -> pa.Table:
        m = self._lc_val < (1 << 62)
        return pa.table({"cell_id": self.cells_arr[m],
                         "cost_dist2": self._lc_val[m]})

    # ---- priority-flood depression filling -------------------------------
    # Same label-correcting shard sweep as cost distance, in the (min, max)
    # semiring: fill(c) = min over paths to the raster border of
    # max(z along path) — relax nw = max(w_v, z_u) instead of d + cost.
    def fl_load(self, z_fn) -> int:
        self.z_fn = z_fn
        self._lc_setup([(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                        if (dr, dc) != (0, 0)], z_fn)
        return len(self.cells_arr)

    def fl_seed(self):
        cells = self.cells_arr
        r = cells // self.cols
        c = cells % self.cols
        border = (r == 0) | (r == self.rows - 1) | (c == 0) \
            | (c == self.cols - 1)
        bc = cells[border]
        zv = self._lc_self[border]
        return self._lc_relax(bc, zv, "fl")

    def fl_round(self, msgs: list[np.ndarray]):
        if msgs:
            arr = np.concatenate([a.reshape(-1, 2) for a in msgs])
        else:
            arr = np.empty((0, 2), np.int64)
        return self._lc_relax(arr[:, 0], arr[:, 1], "fl")

    def fl_result(self) -> pa.Table:
        if getattr(self, "_fl_final", None) is not None:
            return pa.table({"cell_id": self.cells_arr,
                             "fill": self._fl_final})
        m = self._lc_val < (1 << 62)
        return pa.table({"cell_id": self.cells_arr[m],
                         "fill": self._lc_val[m]})

    # ---- two-superstep fill (watershed spill graph) ----------------------
    def fl_flood_local(self, z_fn):
        """Superstep 1 of the two-superstep parallel priority-flood
        (R. Barnes, "Parallel Priority-Flood: an optimal two-pass
        depression filling algorithm for trillion cell DEMs",
        C&G 2016; reference semantics hydro_analysis/fill_depressions.rs:
        131-210). Floods the shard in the (min, max) semiring seeded
        from every PERIMETER cell (raster border + any cell with an
        out-of-shard in-grid 8-neighbour) at its own elevation, tracking
        per cell the seed label that settled it. L(c) <= true fill, and
        within a labelled watershed any two cells connect by a path whose
        max is <= max of their L values (flood-tree monotonicity), so the
        watershed-granularity contraction is exact: the driver solves
        minimax-to-ocean over the spill graph and the final fill is
        max(L(c), W(lab(c))) — zero cross-shard message rounds.

        Perimeter seeds keep their own label and L(seed) = z(seed)
        (every arriving value maxes with the cell's own z, and pushes
        improve strictly), so cross-shard spill edges are computable
        LOCALLY: for border-adjacent (a owned, b not), both are seeds of
        their shards and the edge is (a, b, max(z(a), z(b))).

        Returns (edges, seeds): edges (m, 3) int64 (u, v, w) over
        seed-cell node ids (-1 = ocean), within-shard pairs min-reduced;
        seeds = this shard's sorted seed cell ids."""
        self._ensure()
        cells = self.cells_arr
        n = len(cells)
        INF = 1 << 62
        if n == 0:
            self._fl_L = self._fl_lab = np.empty(0, np.int64)
            self._fl_seeds = np.empty(0, np.int64)
            self._fl_final = self._fl_L
            return np.empty((0, 3), np.int64), self._fl_seeds
        zself = np.asarray(z_fn(cells), np.int64)
        rows, cols = self.rows, self.cols
        rmin = int(cells[0] // cols)
        rmax = int(cells[-1] // cols)
        wp = cols + 2
        size = (rmax - rmin + 3) * wp
        ppos = (cells // cols - rmin + 1) * wp + cells % cols + 1
        zc = np.full(size, INF, np.int64)
        zc[ppos] = zself
        arrpos = np.full(size, -1, np.int64)
        arrpos[ppos] = np.arange(n, dtype=np.int64)
        own = arrpos >= 0
        offs = (-wp - 1, -wp, -wp + 1, -1, 1, wp - 1, wp, wp + 1)
        r = cells // cols
        c = cells % cols
        border_m = (r == 0) | (r == rows - 1) | (c == 0) | (c == cols - 1)
        seed_m = border_m.copy()
        cross_parts = []
        for o in offs:
            q = ppos + o
            qr = q // wp + rmin - 1
            qc = q % wp - 1
            m = (qr >= 0) & (qr < rows) & (qc >= 0) & (qc < cols) \
                & ~own[q]
            if m.any():
                seed_m |= m
                bcell = qr[m] * cols + qc[m]
                zb = np.asarray(z_fn(bcell), np.int64)
                cross_parts.append(np.stack(
                    [cells[m], bcell, np.maximum(zself[m], zb)], axis=1))
        sp = ppos[seed_m]
        hv = np.full(size, INF, np.int64)
        hv[sp] = zself[seed_m]
        hlab = np.full(size, -1, np.int64)
        hlab[sp] = sp
        lvl = np.unique(zself)
        zrank = np.full(size, -1, np.int64)
        zrank[ppos] = np.searchsorted(lvl, zself)
        K = len(lvl)
        buckets: list[list[int]] = [[] for _ in range(K)]
        for p, rk in zip(sp.tolist(), zrank[sp].tolist()):
            buckets[rk].append(p)
        hvl = hv.tolist()
        hzl = zc.tolist()
        hll = hlab.tolist()
        zrl = zrank.tolist()
        lvl_l = lvl.tolist()
        rk = 0
        while rk < K:
            b = buckets[rk]
            if not b:
                rk += 1
                continue
            v = lvl_l[rk]
            bpop = b.pop
            bapp = b.append
            while b:  # b grows with same-level (flood) pushes
                p = bpop()
                if hvl[p] != v:
                    continue  # superseded by a lower level
                lb = hll[p]
                for o in offs:
                    q = p + o
                    zq = hzl[q]
                    if zq < INF and (v if v > zq else zq) < hvl[q]:
                        hll[q] = lb
                        if zq <= v:
                            hvl[q] = v
                            bapp(q)
                        else:
                            hvl[q] = zq
                            buckets[zrl[q]].append(q)
            rk += 1
        Vc = np.asarray(hvl, np.int64)
        labp = np.asarray(hll, np.int64)
        L = Vc[ppos]
        assert (L < INF).all(), "shard not fully flooded (disconnected?)"
        self._fl_L = L
        self._fl_lab = cells[arrpos[labp[ppos]]]
        self._fl_seeds = cells[seed_m]  # cells sorted -> seeds sorted
        self._fl_final = None
        # ---- within-shard watershed adjacency, min-reduced per pair ----
        ew = []
        for o in (1, wp - 1, wp, wp + 1):  # 4 dirs cover all unordered pairs
            m = own[:-o] & own[o:]
            i = np.flatnonzero(m)
            la = labp[i]
            lb = labp[i + o]
            d = la != lb
            if d.any():
                ii = i[d]
                ew.append(np.stack(
                    [np.minimum(la[d], lb[d]), np.maximum(la[d], lb[d]),
                     np.maximum(Vc[ii], Vc[ii + o])], axis=1))
        parts = []
        if ew:
            e = np.concatenate(ew)
            key = e[:, 0] * np.int64(size) + e[:, 1]
            uk, inv = np.unique(key, return_inverse=True)
            mw = np.full(len(uk), INF, np.int64)
            np.minimum.at(mw, inv, e[:, 2])
            parts.append(np.stack(
                [cells[arrpos[uk // size]], cells[arrpos[uk % size]], mw],
                axis=1))
        parts.extend(cross_parts)
        if border_m.any():
            parts.append(np.stack(
                [np.full(int(border_m.sum()), -1, np.int64),
                 cells[border_m], zself[border_m]], axis=1))
        edges = np.concatenate(parts) if parts \
            else np.empty((0, 3), np.int64)
        return edges, self._fl_seeds

    def fl_apply_levels(self, seed_ids: np.ndarray, wv: np.ndarray) -> int:
        """Superstep 2: raise each cell to its watershed's global spill
        level. seed_ids are this shard's (sorted) seeds, wv the solved
        minimax-to-ocean level per seed."""
        idx = np.searchsorted(seed_ids, self._fl_lab)
        self._fl_final = np.maximum(self._fl_L, wv[idx])
        return len(self._fl_final)

    # ---- strahler --------------------------------------------------------
    def str_init_load(self, indeg_df: pd.DataFrame) -> int:
        if not hasattr(self, "pending"):
            self.pending: dict[int, int] = {}
            self.maxc: dict[int, int] = {}
            self.cntm: dict[int, int] = {}
            self.order: dict[int, int] = {}
        for c, n in zip(indeg_df["cell_id"].astype(int),
                        indeg_df["n_inflow"].astype(int)):
            self.pending[c] = n
            self.maxc[c] = 0
            self.cntm[c] = 0
        return len(indeg_df)

    def str_round(self, msgs: list[np.ndarray]):
        inbox = []
        for arr in msgs:
            inbox.extend((int(a), int(b)) for a, b in arr.reshape(-1, 2))
        return self._str_drain(inbox)

    def _str_drain(self, inbox):
        def recv(cell, o):
            if o > self.maxc[cell]:
                self.maxc[cell], self.cntm[cell] = o, 1
            elif o == self.maxc[cell]:
                self.cntm[cell] += 1
            self.pending[cell] -= 1

        for cell, o in inbox:
            recv(cell, o)
        queue = [c for c, p in self.pending.items() if p == 0]
        out: dict[int, list] = {}
        while queue:
            cell = queue.pop()
            if cell in self.order:
                continue
            o = self.maxc[cell] + (1 if self.cntm[cell] >= 2 else 0) \
                if self.maxc[cell] > 0 else 1
            self.order[cell] = o
            del self.pending[cell]
            tgt = self.down.get(cell, -1)
            if tgt < 0:
                continue
            if self._shard(tgt) == self._shard(cell) and tgt in self.pending:
                recv(tgt, o)
                if self.pending[tgt] == 0:
                    queue.append(tgt)
            else:
                out.setdefault(self._shard(tgt), []).append((tgt, o))
        return {s: np.asarray(v, np.int64) for s, v in out.items()}

    def str_result(self) -> pd.DataFrame:
        return pd.DataFrame({"cell_id": np.fromiter(self.order.keys(), np.int64),
                             "strahler": np.fromiter(self.order.values(), np.int64)})

    def str_unresolved(self) -> int:
        return len(self.pending)

    # ---- max upslope flowpath length ------------------------------------
    # hydro_analysis/max_upslope_flowpath.rs: muf(v) = max over inflowing
    # neighbours u of muf(u) + hop(u, v); 0 at sources. Same in-degree
    # topological wave as Strahler, (max, +) semiring, fixed-point units.
    def muf_init_load(self, indeg_df: pd.DataFrame) -> int:
        if not hasattr(self, "muf_pending"):
            self.muf_pending: dict[int, int] = {}
            self.muf_best: dict[int, int] = {}
            self.muf: dict[int, int] = {}
        for c, n in zip(indeg_df["cell_id"].astype(int),
                        indeg_df["n_inflow"].astype(int)):
            self.muf_pending[c] = n
            self.muf_best[c] = 0
        return len(indeg_df)

    def muf_round(self, msgs: list[np.ndarray]):
        inbox = []
        for arr in msgs:
            inbox.extend((int(a), int(b)) for a, b in arr.reshape(-1, 2))
        return self._muf_drain(inbox)

    def _muf_drain(self, inbox):
        def recv(cell, cand):
            if cand > self.muf_best[cell]:
                self.muf_best[cell] = cand
            self.muf_pending[cell] -= 1

        for cell, cand in inbox:
            recv(cell, cand)
        queue = [c for c, p in self.muf_pending.items() if p == 0]
        out: dict[int, list] = {}
        while queue:
            cell = queue.pop()
            if cell in self.muf:
                continue
            v = self.muf_best[cell]
            self.muf[cell] = v
            del self.muf_pending[cell]
            tgt = self.down.get(cell, -1)
            if tgt < 0:
                continue
            cand = v + _hop_units(cell, tgt, self.cols)
            if self._shard(tgt) == self._shard(cell) and tgt in self.muf_pending:
                recv(tgt, cand)
                if self.muf_pending[tgt] == 0:
                    queue.append(tgt)
            else:
                out.setdefault(self._shard(tgt), []).append((tgt, cand))
        return {s: np.asarray(v, np.int64) for s, v in out.items()}

    def muf_result(self) -> pd.DataFrame:
        return pd.DataFrame({"cell_id": np.fromiter(self.muf.keys(), np.int64),
                             "muf_units": np.fromiter(self.muf.values(), np.int64)})

    def muf_unresolved(self) -> int:
        return len(self.muf_pending)



_LOAD_GROUP_ENV = os.environ.get("WBT_MAX_PARALLEL_LOADS", "")


def _load_group() -> int:
    """Concurrent heavy-load budget: 6 per ALIVE node (the measured
    single-node collapse point of this guest's lazy memory provisioning),
    so multi-node clusters stagger per node instead of per cluster.
    WBT_MAX_PARALLEL_LOADS pins it explicitly."""
    if _LOAD_GROUP_ENV:
        return max(1, int(_LOAD_GROUP_ENV))
    try:
        alive = sum(1 for nd in ray.nodes() if nd.get("Alive"))
    except Exception:
        alive = 1
    return 6 * max(1, alive)


def _staggered_load(thunks: list, *, bytes_per_shard: int | None = None
                    ) -> list:
    """Submit heavy per-shard load calls in bounded groups. A single-node
    guest collapses when too many actors fault ~1 GB of fresh pages
    concurrently (measured at a 61.6M-cell grid: 6 parallel fd8_loads
    finish in 4.7 s, 12 take 50 s — the host's lazy memory provisioning
    throttles past ~8 GB of aggregate burst). Thunks are submitted per
    group because ray.get does not throttle already-submitted actor
    tasks. Multi-node clusters spread shards across hosts and should
    raise WBT_MAX_PARALLEL_LOADS."""
    out = []
    g = _load_group()
    if bytes_per_shard:
        # the throttle is an AGGREGATE burst (~8 GB); when the caller can
        # bound its per-shard allocation, admit as many shards as fit a
        # conservative 4 GB budget instead of the worst-case group of 6
        g = max(g, int((4 << 30) // max(1, bytes_per_shard)))
    for i in range(0, len(thunks), g):
        out.extend(ray.get([t() for t in thunks[i:i + g]]))
    return out


_RUN_SEQ = [0]  # unique actor-name suffix per invocation (no Date/random)
# (grid dims, tile, n_shards) -> (actors, prefix): long-lived shard pool;
# actors reset between runs instead of respawning (spawn = ~1.5 s / run)
_POOL: dict[tuple, tuple[list, str]] = {}


def _pool_actors(grid: GridSpec, tile: int, n_shards: int):
    """Fetch-or-spawn the named shard-actor pool for this grid key
    (actors reset between runs; spawn = ~1.5 s per run otherwise).

    Keys include the Ray job id: a driver that cycles
    ray.shutdown()/ray.init() in one process must never touch handles
    from the previous session — even ray.kill on such a handle is a
    fatal core-worker check, not a catchable exception — so dead-job
    entries are simply dropped (their actors died with the session)."""
    import os

    # the GCS address is unique per cluster instance (job AND worker ids
    # are NOT: a fresh local cluster restarts both at the same value)
    sess = ray.get_runtime_context().gcs_address
    for k in [k for k in _POOL if k[0] != sess]:
        del _POOL[k]
    key = (sess, grid.rows, grid.cols, tile, n_shards)
    shards, prefix = None, ""
    if key in _POOL:
        cand, prefix = _POOL.pop(key)
        try:
            ray.get([s.reset.remote() for s in cand], timeout=10)
            shards = cand
        except Exception:
            for s in cand:
                try:
                    ray.kill(s)
                except Exception:
                    pass
    if shards is None:
        _RUN_SEQ[0] += 1
        prefix = f"wbt_flow_{os.getpid()}_{_RUN_SEQ[0]}"
        # SPREAD: shard interiors are DRAM-bandwidth-bound, so each shard
        # should land on its own node where possible (no-op single-node)
        shards = [FlowShard.options(name=f"{prefix}_{i}", namespace="wbt",
                                    scheduling_strategy="SPREAD")
                  .remote((grid.rows, grid.cols), tile, n_shards)
                  for i in range(n_shards)]
        ray.get([s.__ray_ready__.remote() for s in shards])
    _POOL_KEY[id(shards)] = (key, prefix)
    return shards, prefix


def _spawn_full_universe(grid: GridSpec, tile: int, n_shards: int):
    """Shard pool over the full cell universe with NO pointer data: each
    actor synthesizes its own blocked tile range locally (down = -1), so
    nothing crosses the object store. Replaces pushing a synthetic
    range(n) Dataset for fill / fd8 / mfd / dinf / cost distance — the
    push was ~3 s at 6.12M cells, half the fill wall."""
    shards, prefix = _pool_actors(grid, tile, n_shards)
    ray.get([s.load_universe.remote(i) for i, s in enumerate(shards)])
    return shards, prefix


def _spawn_and_load(down_ds: ray.data.Dataset, grid: GridSpec, tile: int,
                    n_shards: int):
    """One-time distributed load: every read batch splits its rows by shard
    locally and pushes the slices straight into the named shard actors
    (named-actor lookup from inside map_batches) — rows never visit the
    driver and there is no all-to-all shuffle."""
    shards, prefix = _pool_actors(grid, tile, n_shards)

    def push_batch(df: pd.DataFrame) -> pd.DataFrame:
        # no groupby shuffle: every read batch splits its rows by shard
        # locally and pushes the slices straight into the named actors
        # (round-3: the all-to-all sort was 70% of pregel wall time)
        cid = df["cell_id"].to_numpy(np.int64)
        # guard a silent footgun: a tile column computed against a
        # DIFFERENT GridSpec mis-routes cells to shards the actors will not
        # look in, truncating walks without any error
        want = _tile_of(cid, grid, tile)
        shard = shard_of_tiles(df["tile"].to_numpy(np.int64), grid, tile,
                               n_shards)
        assert (shard_of_tiles(want, grid, tile, n_shards) == shard).all(), \
            "down_ds tile column disagrees with the Pregel grid/tile spec"
        order = np.argsort(shard, kind="stable")
        ss = shard[order]
        cid_s = cid[order]
        down_s = df["down_id"].to_numpy(np.int64)[order]
        bounds = np.flatnonzero(np.diff(ss)) + 1
        starts = np.concatenate([[0], bounds]) if len(ss) else []
        refs = []
        for st, part in zip(starts, np.split(np.arange(len(ss)), bounds)):
            actor = ray.get_actor(f"{prefix}_{int(ss[st])}", namespace="wbt")
            lo, hi = part[0], part[-1] + 1
            refs.append(actor.load_arrays.remote(
                np.ascontiguousarray(cid_s[lo:hi]),
                np.ascontiguousarray(down_s[lo:hi])))
        ray.get(refs)
        return pd.DataFrame({"n": [len(df)]})

    down_ds.map_batches(push_batch, batch_format="pandas").count()
    return shards, prefix


def _route(outs: list[dict[int, np.ndarray]], n_shards: int) -> list[list[np.ndarray]]:
    inboxes: list[list[np.ndarray]] = [[] for _ in range(n_shards)]
    for d in outs:
        for s, arr in d.items():
            if len(arr):
                inboxes[s].append(arr)
    return inboxes


_POOL_KEY: dict[int, tuple[tuple, str]] = {}  # id(shards) -> (pool key, prefix)


def _teardown(shards) -> None:
    info = _POOL_KEY.pop(id(shards), None)
    if info is None or info[0] in _POOL:
        for s in shards:
            ray.kill(s)
        return
    _POOL[info[0]] = (shards, info[1])


class ShardedGraph:
    """A loaded D8 pointer graph on the shard-actor pool: pay
    spawn + distributed load ONCE and run several algorithms over it
    (accumulation, basins, flowpath length). The per-algorithm pregel
    functions below are thin one-shot wrappers; compositions like
    downslope-distance-to-stream use this handle directly."""

    def __init__(self, down_ds: ray.data.Dataset, grid: GridSpec, *,
                 tile: int = 64, n_shards: int = 8):
        self.shards, self.prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
        self.n_shards = n_shards

    def close(self):
        _teardown(self.shards)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def accumulation(self, max_rounds: int = 256) -> ray.data.Dataset:
        shards = self.shards
        outs = ray.get([s.acc_init.remote() for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, self.n_shards)
            if not any(inboxes):
                refs = [s.acc_result.remote() for s in shards]
                return ray.data.from_arrow_refs(refs).materialize()
            outs = ray.get([s.acc_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        raise RuntimeError("flow accumulation did not converge (cycle?)")

    def basins(self, max_rounds: int = 256) -> ray.data.Dataset:
        shards = self.shards
        outs = ray.get([s.bas_init.remote() for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, self.n_shards)
            if not any(inboxes):
                break
            outs = ray.get([s.bas_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        else:
            raise RuntimeError("basin labeling did not converge (cycle?)")
        # send labels resolved on foreign shards back to their origin's shard
        homeless = ray.get([s.bas_homeless.remote() for s in shards])
        inboxes = _route(homeless, self.n_shards)
        ray.get([s.bas_resolve.remote(inboxes[i]) for i, s in enumerate(shards)])
        refs = [s.bas_result.remote() for s in shards]
        return ray.data.from_arrow_refs(refs).materialize()

    def flowpath_length(self, max_rounds: int = 256, *,
                        weight: str = "hops") -> ray.data.Dataset:
        shards = self.shards
        if weight != "hops":
            ray.get([s.set_step_weight.remote(weight) for s in shards])
        try:
            return self._flowpath_length_inner(max_rounds)
        finally:
            if weight != "hops":
                ray.get([s.set_step_weight.remote("hops") for s in shards])

    def _flowpath_length_inner(self, max_rounds: int) -> ray.data.Dataset:
        shards = self.shards
        outs = ray.get([s.fl_len_init.remote() for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, self.n_shards)
            if not any(inboxes):
                break
            outs = ray.get([s.fl_len_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        else:
            raise RuntimeError("flowpath length did not converge")
        homeless = ray.get([s.fl_len_homeless.remote() for s in shards])
        inboxes = _route(homeless, self.n_shards)
        ray.get([s.fl_len_resolve.remote(inboxes[i])
                 for i, s in enumerate(shards)])
        refs = [s.fl_len_result.remote() for s in shards]
        return ray.data.from_arrow_refs(refs).materialize()


def flow_accumulation_pregel(down_ds: ray.data.Dataset, grid: GridSpec, *,
                             tile: int = 64, n_shards: int = 8,
                             max_rounds: int = 256) -> ray.data.Dataset:
    with ShardedGraph(down_ds, grid, tile=tile, n_shards=n_shards) as g:
        return g.accumulation(max_rounds)


def max_value_accumulation_pregel(down_ds: ray.data.Dataset, value_fn,
                                  grid: GridSpec, *, tile: int = 64,
                                  n_shards: int = 8,
                                  max_rounds: int = 256) -> ray.data.Dataset:
    """Dataset (cell_id, max_up): max over upslope-or-equal cells of
    value_fn(cell) along the D8 graph (whitebox-plugins/src/
    max_upslope_value/main.rs). Also serves EdgeContamination with
    value_fn = border indicator."""
    shards, _prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
    try:
        ray.get([s.macc_load.remote(value_fn) for s in shards])
        outs = ray.get([s.macc_init.remote() for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                refs = [s.macc_result.remote() for s in shards]
                return ray.data.from_arrow_refs(refs).materialize()
            outs = ray.get([s.macc_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        raise RuntimeError("max accumulation did not converge")
    finally:
        _teardown(shards)


def basins_pregel(down_ds: ray.data.Dataset, grid: GridSpec, *,
                  tile: int = 64, n_shards: int = 8,
                  max_rounds: int = 256) -> ray.data.Dataset:
    with ShardedGraph(down_ds, grid, tile=tile, n_shards=n_shards) as g:
        return g.basins(max_rounds)


def max_upslope_pregel(down_ds: ray.data.Dataset, grid: GridSpec, *,
                       tile: int = 64, n_shards: int = 8,
                       max_rounds: int = 512) -> ray.data.Dataset:
    """Dataset (cell_id, muf_units): maximum upslope flowpath length
    (hydro_analysis/max_upslope_flowpath.rs) — the Strahler in-degree wave in
    the (max, +) semiring with the fixed-point D8 hop units of
    flowpath_length_pregel."""
    from .flow import _indeg_state

    shards, prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
    try:
        indeg = _indeg_state(down_ds, grid, tile).map_batches(
            lambda df: df.assign(shard=shard_of_tiles(
                df["tile"].to_numpy(np.int64), grid, tile, n_shards)),
            batch_format="pandas")

        def push(g: pd.DataFrame) -> pd.DataFrame:
            sid = int(g["shard"].iloc[0])
            actor = ray.get_actor(f"{prefix}_{sid}", namespace="wbt")
            ray.get(actor.muf_init_load.remote(g[["cell_id", "n_inflow"]]))
            return pd.DataFrame({"n": [len(g)]})

        indeg.groupby("shard").map_groups(push, batch_format="pandas").count()
        outs = ray.get([s.muf_round.remote([]) for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                break
            outs = ray.get([s.muf_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        else:
            raise RuntimeError("max upslope flowpath did not converge (cycle?)")
        left = sum(ray.get([s.muf_unresolved.remote() for s in shards]))
        if left:
            raise RuntimeError(f"max upslope left {left} unresolved cells")
        refs = [s.muf_result.remote() for s in shards]
        return ray.data.from_pandas_refs(refs).materialize()
    finally:
        _teardown(shards)


def strahler_pregel(down_ds: ray.data.Dataset, grid: GridSpec, *,
                    tile: int = 64, n_shards: int = 8,
                    max_rounds: int = 512) -> ray.data.Dataset:
    from .flow import _indeg_state

    shards, prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
    try:
        # in-degree via ONE co-grouped pass, pushed shard-wise like the load
        indeg = _indeg_state(down_ds, grid, tile).map_batches(
            lambda df: df.assign(shard=shard_of_tiles(
                df["tile"].to_numpy(np.int64), grid, tile, n_shards)),
            batch_format="pandas")

        def push(g: pd.DataFrame) -> pd.DataFrame:
            sid = int(g["shard"].iloc[0])
            actor = ray.get_actor(f"{prefix}_{sid}", namespace="wbt")
            ray.get(actor.str_init_load.remote(g[["cell_id", "n_inflow"]]))
            return pd.DataFrame({"n": [len(g)]})

        indeg.groupby("shard").map_groups(push, batch_format="pandas").count()
        outs = ray.get([s.str_round.remote([]) for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                break
            outs = ray.get([s.str_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        else:
            raise RuntimeError("strahler did not converge (cycle?)")
        left = sum(ray.get([s.str_unresolved.remote() for s in shards]))
        if left:
            raise RuntimeError(f"strahler left {left} unresolved cells")
        refs = [s.str_result.remote() for s in shards]
        return ray.data.from_pandas_refs(refs).materialize()
    finally:
        _teardown(shards)


def cost_distance_pregel(cost_fn, sources: np.ndarray, grid: GridSpec, *,
                         tile: int = 64, n_shards: int = 8,
                         max_rounds: int = 256) -> ray.data.Dataset:
    """Dataset (cell_id, cost_dist2): sharded label-correcting Dijkstra.
    Each shard relaxes its own cells; candidate distances crossing shard
    borders travel as (cell, dist) messages. Positive costs guarantee
    convergence in <= (shards a least-cost path crosses) rounds. Needs a
    full cell universe, so a synthetic down table (all -1) feeds the load."""
    shards, _prefix = _spawn_full_universe(grid, tile, n_shards)
    try:
        per = grid.rows * grid.cols // max(1, n_shards)
        _staggered_load([lambda s=s: s.cd_load.remote(cost_fn)
                         for s in shards], bytes_per_shard=per * 200)
        outs = ray.get([s.cd_seed.remote(sources) for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                refs = [s.cd_result.remote() for s in shards]
                return ray.data.from_arrow_refs(refs).materialize()
            outs = ray.get([s.cd_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        raise RuntimeError("cost distance did not converge")
    finally:
        _teardown(shards)


def _fill_solve_graph(edges: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimax-to-ocean over the watershed spill graph via ascending
    Kruskal: a node's level is the weight of the edge that first joins its
    component to the ocean component (node id -1). Union-find with path
    halving; per-root member linked lists so levels are assigned exactly
    once per node (O(E log E) sort + O(E alpha) unions). Returns (sorted
    node ids, level per node)."""
    u = edges[:, 0]
    v = edges[:, 1]
    w = edges[:, 2]
    nodes = np.unique(np.concatenate([u, v]))
    if len(nodes) and nodes[0] == -1:
        nodes = nodes[1:]
    nn = len(nodes)
    du = np.where(u == -1, 0, np.searchsorted(nodes, u) + 1)
    dv = np.where(v == -1, 0, np.searchsorted(nodes, v) + 1)
    order = np.argsort(w, kind="stable")
    parent = list(range(nn + 1))
    ocean = [False] * (nn + 1)
    ocean[0] = True
    head = list(range(nn + 1))
    tail = list(range(nn + 1))
    nxt = [-1] * (nn + 1)
    level = np.full(nn, -1, np.int64)  # placeholder; weights may be ANY
    remaining = nn                     # int64 (negative DEMs are legal)
    for a, b, ww in zip(du[order].tolist(), dv[order].tolist(),
                        w[order].tolist()):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        while parent[b] != b:
            parent[b] = parent[parent[b]]
            b = parent[b]
        if a == b:
            continue
        if ocean[b] and not ocean[a]:
            a, b = b, a
        if ocean[a] and not ocean[b]:
            m = head[b]
            while m != -1:
                level[m - 1] = ww
                remaining -= 1
                m = nxt[m]
            parent[b] = a
            if remaining == 0:
                break
        elif ocean[a]:  # both ocean-connected: plain union
            parent[b] = a
        else:  # neither: union + O(1) member-list concat
            parent[b] = a
            nxt[tail[a]] = head[b]
            tail[a] = tail[b]
    assert remaining == 0, "spill graph not connected to the ocean"
    return nodes, level


def fill_depressions_pregel(z_fn, grid: GridSpec, *, tile: int = 64,
                            n_shards: int = 8, max_rounds: int = 256,
                            method: str = "graph") -> ray.data.Dataset:
    """Dataset (cell_id, fill): parallel priority-flood depression filling
    (hydro_analysis/fill_depressions.rs semantics — every cell raised to its
    spill elevation; D8 connectivity).

    method="graph" (default): two-superstep watershed-spill-graph
    decomposition (Barnes 2016) — each shard floods locally from its
    perimeter with labels, the driver solves minimax-to-ocean over the
    contracted spill graph (O(perimeter)-sized, never O(grid)), one
    vectorized max-join finishes. Superstep count is independent of the
    shard count, so shards scale with cluster width freely.
    method="bsp": sharded label-correcting sweep — raster-border cells
    seed at their own elevation, floods cross shard borders as (cell,
    candidate fill) messages over O(shard-graph diameter) rounds."""
    shards, _prefix = _spawn_full_universe(grid, tile, n_shards)
    try:
        if method == "graph":
            # the flood's footprint is the Python-list canvases
            # (~90 B/cell); stagger only when shards are huge enough to
            # trip the guest's lazy-memory throttle (see _staggered_load)
            thunks = [lambda s=s: s.fl_flood_local.remote(z_fn)
                      for s in shards]
            per = grid.rows * grid.cols // max(1, n_shards)
            packs = _staggered_load(thunks, bytes_per_shard=per * 360)
            nodes, levels = _fill_solve_graph(
                np.concatenate([p[0] for p in packs]))
            ray.get([s.fl_apply_levels.remote(
                p[1], levels[np.searchsorted(nodes, p[1])])
                for s, p in zip(shards, packs)])
            refs = [s.fl_result.remote() for s in shards]
            return ray.data.from_arrow_refs(refs).materialize()
        per = grid.rows * grid.cols // max(1, n_shards)
        _staggered_load([lambda s=s: s.fl_load.remote(z_fn)
                         for s in shards], bytes_per_shard=per * 200)
        outs = ray.get([s.fl_seed.remote() for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                refs = [s.fl_result.remote() for s in shards]
                return ray.data.from_arrow_refs(refs).materialize()
            outs = ray.get([s.fl_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        raise RuntimeError("depression filling did not converge")
    finally:
        _teardown(shards)


def shreve_pregel(down_ds: ray.data.Dataset, grid: GridSpec, *,
                  tile: int = 64, n_shards: int = 8,
                  max_rounds: int = 256) -> ray.data.Dataset:
    """Dataset (cell_id, shreve): Shreve stream magnitude = number of
    upstream sources (in-degree-0 cells), sources count 1
    (stream_network_analysis/shreve_magnitude.rs semantics). Exactly the
    flow-accumulation semiring with mass injected ONLY at sources — the
    same shard drain runs with custom initial masses."""
    from .flow import _indeg_state

    shards, prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
    try:
        masses = _indeg_state(down_ds, grid, tile).map_batches(
            lambda df: pd.DataFrame({
                "cell_id": df["cell_id"].to_numpy(np.int64),
                "mass": (df["n_inflow"].to_numpy(np.int64) == 0).astype(np.int64),
                "shard": shard_of_tiles(df["tile"].to_numpy(np.int64),
                                        grid, tile, n_shards)}),
            batch_format="pandas")

        def push(g: pd.DataFrame) -> pd.DataFrame:
            sid = int(g["shard"].iloc[0])
            actor = ray.get_actor(f"{prefix}_{sid}", namespace="wbt")
            ray.get(actor.acc_load_masses.remote(g[["cell_id", "mass"]]))
            return pd.DataFrame({"n": [len(g)]})

        masses.groupby("shard").map_groups(push, batch_format="pandas").count()
        outs = ray.get([s.acc_init.remote() for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                refs = [s.acc_result.remote() for s in shards]
                return ray.data.from_arrow_refs(refs).materialize().map_batches(
                    lambda df: df.rename(columns={"acc": "shreve"}),
                    batch_format="pandas")
            outs = ray.get([s.acc_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        raise RuntimeError("shreve did not converge (cycle?)")
    finally:
        _teardown(shards)


def weighted_accumulation_pregel(down_ds: ray.data.Dataset,
                                 masses_ds: ray.data.Dataset, grid: GridSpec,
                                 *, tile: int = 64, n_shards: int = 8,
                                 max_rounds: int = 256) -> ray.data.Dataset:
    """Dataset (cell_id, acc): sum of caller-supplied int64 masses over the
    upstream-or-equal cells of each cell — the flow-accumulation level drain
    with custom initial masses (shreve_pregel generalized; e.g. total
    upstream channel length = masses set to each cell's summed incoming
    stream-edge hop lengths). ``masses_ds`` must carry (cell_id, tile, mass)
    and COVER every graph cell (mass 0 rows included) so every shard
    receives a load call and none falls back to the count-accumulation
    default masses."""
    shards, prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
    try:
        masses = masses_ds.map_batches(
            lambda df: pd.DataFrame({
                "cell_id": df["cell_id"].to_numpy(np.int64),
                "mass": df["mass"].to_numpy(np.int64),
                "shard": shard_of_tiles(df["tile"].to_numpy(np.int64),
                                        grid, tile, n_shards)}),
            batch_format="pandas")

        def push(g: pd.DataFrame) -> pd.DataFrame:
            sid = int(g["shard"].iloc[0])
            actor = ray.get_actor(f"{prefix}_{sid}", namespace="wbt")
            ray.get(actor.acc_load_masses.remote(g[["cell_id", "mass"]]))
            return pd.DataFrame({"n": [len(g)]})

        masses.groupby("shard").map_groups(push, batch_format="pandas").count()
        outs = ray.get([s.acc_init.remote() for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                refs = [s.acc_result.remote() for s in shards]
                return ray.data.from_arrow_refs(refs).materialize()
            outs = ray.get([s.acc_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        raise RuntimeError("weighted accumulation did not converge (cycle?)")
    finally:
        _teardown(shards)


def fd8_accumulation_pregel(z_fn, grid: GridSpec, *, exponent: float = 1.1,
                            tile: int = 64, n_shards: int = 8,
                            max_rounds: int = 512) -> ray.data.Dataset:
    """Dataset (cell_id, acc_units): FD8 multiple-flow-direction
    accumulation (hydro_analysis/fd8_flow_accum.rs) — flow disperses to all
    downslope neighbours proportional to slope^exponent. Fixed-point mass
    (2^20 units per cell) with deterministic remainder assignment makes the
    result exact int64 and parallelism-invariant. Topological wave over
    shard actors: a cell fires when all its upslope neighbours resolved;
    in-degree is computed locally (the surface is a pure function of cell
    id, so neighbour elevations need no exchange). acc_units / 2^20 is the
    upslope-area measure in cells."""
    shards, _prefix = _spawn_full_universe(grid, tile, n_shards)
    try:
        per = grid.rows * grid.cols // max(1, n_shards)
        _staggered_load([lambda s=s: s.fd8_load.remote(z_fn, exponent)
                        for s in shards], bytes_per_shard=per * 400)
        outs = ray.get([s.fd8_round.remote([]) for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                break
            outs = ray.get([s.fd8_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        else:
            raise RuntimeError("fd8 did not converge")
        left = sum(ray.get([s.fd8_unresolved.remote() for s in shards]))
        if left:
            raise RuntimeError(f"fd8 left {left} unresolved cells (flat ties?)")
        refs = [s.fd8_result.remote() for s in shards]
        return ray.data.from_arrow_refs(refs).materialize()
    finally:
        _teardown(shards)


def mfd_accumulation_pregel(edge_fn, grid: GridSpec, *, tile: int = 64,
                            n_shards: int = 8,
                            max_rounds: int = 512) -> ray.data.Dataset:
    """Dataset (cell_id, acc_units): generic multiple-flow-direction
    accumulation over custom edge weights. edge_fn(cells, rows, cols) ->
    (ci, tgts, ws, pending) computes, vectorized inside each shard actor,
    the scan-ordered edge list (fixed-point 2^20 weights) and the upslope
    in-degree — serves the Qin/Quinn plugin analogs on the shared fd8 wave
    (whitebox-plugins/src/{qin,quinn}_flow_accumulation/main.rs)."""
    shards, _prefix = _spawn_full_universe(grid, tile, n_shards)
    try:
        per = grid.rows * grid.cols // max(1, n_shards)
        _staggered_load([lambda s=s: s.mfd_load.remote(edge_fn) for s in shards], bytes_per_shard=per * 400)
        outs = ray.get([s.fd8_round.remote([]) for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                break
            outs = ray.get([s.fd8_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        else:
            raise RuntimeError("mfd accumulation did not converge")
        left = sum(ray.get([s.fd8_unresolved.remote() for s in shards]))
        if left:
            raise RuntimeError(f"mfd left {left} unresolved cells")
        refs = [s.fd8_result.remote() for s in shards]
        return ray.data.from_arrow_refs(refs).materialize()
    finally:
        _teardown(shards)


def dinf_accumulation_pregel(z_fn, grid: GridSpec, *, tile: int = 64,
                             n_shards: int = 8,
                             max_rounds: int = 512) -> ray.data.Dataset:
    """Dataset (cell_id, acc_units): D-infinity flow accumulation
    (hydro_analysis/dinf_flow_accum.rs, Tarboton facets) — at most two
    receivers per cell, angular flow split, fixed-point mass; same
    topological shard wave as FD8."""
    shards, _prefix = _spawn_full_universe(grid, tile, n_shards)
    try:
        per = grid.rows * grid.cols // max(1, n_shards)
        _staggered_load([lambda s=s: s.dinf_load.remote(z_fn) for s in shards], bytes_per_shard=per * 400)
        outs = ray.get([s.fd8_round.remote([]) for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                break
            outs = ray.get([s.fd8_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        else:
            raise RuntimeError("dinf did not converge")
        left = sum(ray.get([s.fd8_unresolved.remote() for s in shards]))
        if left:
            raise RuntimeError(f"dinf left {left} unresolved cells")
        refs = [s.fd8_result.remote() for s in shards]
        return ray.data.from_arrow_refs(refs).materialize()
    finally:
        _teardown(shards)


def _facet_accum_run(shards, n_shards, max_rounds, what: str):
    outs = ray.get([s.fd8_round.remote([]) for s in shards])
    for _ in range(max_rounds):
        inboxes = _route(outs, n_shards)
        if not any(inboxes):
            break
        outs = ray.get([s.fd8_round.remote(inboxes[i])
                        for i, s in enumerate(shards)])
    else:
        raise RuntimeError(f"{what} did not converge")
    left = sum(ray.get([s.fd8_unresolved.remote() for s in shards]))
    if left:
        raise RuntimeError(f"{what} left {left} unresolved cells")
    refs = [s.fd8_result.remote() for s in shards]
    return ray.data.from_arrow_refs(refs).materialize()


def mdinf_accumulation_pregel(z_fn, grid: GridSpec, *, exponent: float = 1.1,
                              tile: int = 64, n_shards: int = 8,
                              max_rounds: int = 512) -> ray.data.Dataset:
    """Dataset (cell_id, acc_units): MD-infinity flow accumulation
    (hydro_analysis/mdinf_flow_accum.rs, Seibert & McGlynn 2007 triangular
    facets, slope^exponent proportioning over up to 8 receivers) — the fd8
    topological shard wave with the MDInf weight loader in exact-weights
    (non-conserving, like the reference) mode."""
    shards, _prefix = _spawn_full_universe(grid, tile, n_shards)
    try:
        per = grid.rows * grid.cols // max(1, n_shards)
        _staggered_load([lambda s=s: s.mdinf_load.remote(z_fn, exponent)
                        for s in shards], bytes_per_shard=per * 400)
        return _facet_accum_run(shards, n_shards, max_rounds, "mdinf")
    finally:
        _teardown(shards)


def dinf_mass_flux_pregel(z_fn, load_fn, eff_fp_fn, absorp_fn,
                          grid: GridSpec, *, tile: int = 64,
                          n_shards: int = 8,
                          max_rounds: int = 512) -> ray.data.Dataset:
    """Dataset (cell_id, acc_units): D-infinity mass flux
    (hydro_analysis/dinf_mass_flux.rs) — per cell, loading + inflows; the
    forwarded flux is (value - absorption) * efficiency split over the
    Tarboton facet pair. Integer loading/absorption units; efficiency a
    2^20 fixed-point proportion; floor rounding (documented contract)."""
    shards, _prefix = _spawn_full_universe(grid, tile, n_shards)
    try:
        per = grid.rows * grid.cols // max(1, n_shards)
        _staggered_load([lambda s=s: s.dinf_load.remote(z_fn) for s in shards], bytes_per_shard=per * 400)
        ray.get([s.mf_configure.remote(load_fn, eff_fp_fn, absorp_fn)
                 for s in shards])
        return _facet_accum_run(shards, n_shards, max_rounds, "dinf mass flux")
    finally:
        _teardown(shards)


# D8 hop length in 2^20 fixed-point units (diagonals = sqrt(2))
_HOP_STRAIGHT = 1 << 20
_HOP_DIAG = int(np.floor(1.4142135623730951 * (1 << 20) + 0.5))


def _hop_units(a: int, b: int, cols: int) -> int:
    ra, ca = a // cols, a % cols
    rb, cb = b // cols, b % cols
    return _HOP_DIAG if (ra != rb and ca != cb) else _HOP_STRAIGHT


def path_visits_pregel(down_ds: ray.data.Dataset, grid: GridSpec, *,
                       tile: int = 64, n_shards: int = 8,
                       nonpit_only: bool = False,
                       max_rounds: int = 4096) -> ray.data.Dataset:
    """Dataset (cell_id, origin, units): every (visited cell, start cell)
    pair along every D8 flowpath with the fixed-point hop distance from the
    start — the distributed equivalent of max_branch_length.rs's
    path-marking scan (terrain_analysis/max_branch_length.rs:349-375).
    Rows land sharded by the VISITED cell, so the downstream pair-meet
    join groups without a second exchange. Output volume is the total
    flowpath length (the same bound as the reference's O(n·path) scan)."""
    shards, _prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
    try:
        outs = ray.get([s.vis_init.remote(nonpit_only) for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                refs = [s.vis_result.remote() for s in shards]
                return ray.data.from_pandas_refs(refs).materialize()
            outs = ray.get([s.vis_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        raise RuntimeError("path visit walk did not converge")
    finally:
        _teardown(shards)


def isobasins_pregel(down_ds: ray.data.Dataset, grid: GridSpec,
                     target: int, *, tile: int = 64, n_shards: int = 8,
                     max_rounds: int = 512) -> ray.data.Dataset:
    """Dataset (outlet,): the pour-point cells of the isobasins cut scan
    (hydro_analysis/isobasins.rs:392-459) — in-degree-gated topological
    wave; each cell fires once with its full modified accumulation and the
    cut rule marks either the largest inflowing neighbour or the cell
    itself. Terminals are always outlets. Basin labels follow by cutting
    the pointer graph at these outlets and running basins_pregel."""
    from .flow import _indeg_state

    shards, prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
    try:
        indeg = _indeg_state(down_ds, grid, tile).map_batches(
            lambda df: df.assign(shard=shard_of_tiles(
                df["tile"].to_numpy(np.int64), grid, tile, n_shards)),
            batch_format="pandas")

        def push(g: pd.DataFrame) -> pd.DataFrame:
            sid = int(g["shard"].iloc[0])
            actor = ray.get_actor(f"{prefix}_{sid}", namespace="wbt")
            ray.get(actor.iso_init_load.remote(g[["cell_id", "n_inflow"]],
                                               target))
            return pd.DataFrame({"n": [len(g)]})

        indeg.groupby("shard").map_groups(push, batch_format="pandas").count()
        outs = ray.get([s.iso_round.remote([]) for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                break
            outs = ray.get([s.iso_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        else:
            raise RuntimeError("isobasins wave did not converge (cycle?)")
        left = sum(ray.get([s.iso_unresolved.remote() for s in shards]))
        if left:
            raise RuntimeError(f"isobasins left {left} unresolved cells")
        refs = [s.iso_result.remote() for s in shards]
        out = ray.data.from_pandas_refs(refs).materialize()
        # a cell can be marked by two different shards (own cut + a
        # neighbour cut recorded by the deciding cell's shard), but only
        # when the outlet sits within one cell of a shard boundary —
        # interior outlets are globally unique already. Route ONLY the
        # boundary band (O(grid width), not O(outlets)) through a single
        # dedup task; a groupby aggregate here cost 17 of isobasins' 18 s
        # at 6.12M cells (~n/1000 single-row groups).
        interior = out.map_batches(
            lambda df: df[df["boundary"] == 0][["outlet"]],
            batch_format="pandas")
        border = out.map_batches(
            lambda df: df[df["boundary"] == 1][["outlet"]],
            batch_format="pandas").repartition(1).map_batches(
            lambda df: pd.DataFrame(
                {"outlet": np.unique(df["outlet"].to_numpy(np.int64))}),
            batch_format="pandas")
        return interior.union(border).materialize()
    finally:
        _teardown(shards)


def downslope_index_pregel(down_ds: ray.data.Dataset, z_fn, d_drop: int,
                           grid: GridSpec, *, tile: int = 64,
                           n_shards: int = 8,
                           max_rounds: int = 4096) -> ray.data.Dataset:
    """Dataset (cell_id, units, reached): D8 path distance to the first
    cell whose elevation is >= d_drop below the start (downslope_index.rs
    distance form); reached=0 rows carry the full path length to the
    terminal. Hop-by-hop shard walks (the drop test can't use the
    doubling tables)."""
    shards, _prefix = _spawn_and_load(down_ds, grid, tile, n_shards)
    try:
        per = grid.rows * grid.cols // max(1, n_shards)
        _staggered_load([lambda s=s: s.dsi_load.remote(z_fn, d_drop)
                        for s in shards], bytes_per_shard=per * 400)
        outs = ray.get([s.dsi_init.remote() for s in shards])
        for _ in range(max_rounds):
            inboxes = _route(outs, n_shards)
            if not any(inboxes):
                refs = [s.dsi_result.remote() for s in shards]
                return ray.data.from_pandas_refs(refs).materialize()
            outs = ray.get([s.dsi_round.remote(inboxes[i])
                            for i, s in enumerate(shards)])
        raise RuntimeError("downslope index walk did not converge")
    finally:
        _teardown(shards)


def flowpath_length_pregel(down_ds: ray.data.Dataset, grid: GridSpec, *,
                           tile: int = 64, n_shards: int = 8,
                           max_rounds: int = 256) -> ray.data.Dataset:
    """Dataset (cell_id, len_units): downslope flowpath length
    (hydro_analysis/downslope_flowpath_length.rs) — fixed-point D8 path
    distance (2^20 units per cell, diagonals sqrt 2) from every cell to its
    outlet. Doubling-table probe resolution like basins, probes carry
    accumulated distance."""
    with ShardedGraph(down_ds, grid, tile=tile, n_shards=n_shards) as g:
        return g.flowpath_length(max_rounds)
