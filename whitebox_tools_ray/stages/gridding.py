"""Gridding operators: VectorPointsToRaster assigns, NN gridding, IDW.

Ray Data physical plan (SURVEY.md section 2.3 b-d): points are expanded to
candidate (cell, point) pairs in a vectorized ``map_batches`` kernel — each
point emits the cells whose CENTRES lie within the search radius, mirroring
the reference's cell-centre probes (idw_interpolation.rs:620-625) — then one
``groupby(cell_id)`` shuffle reduces candidates per cell. Candidate rows are
narrow (ints + a few doubles); the wide input columns never enter the
shuffle.

Determinism: reductions are either order-independent (int sums, min/max) or
keyed on an explicit record seq (first/last), so block order / parallelism
cannot change results — unlike the reference's record-order semantics
(vector_points_to_raster.rs:402-450) which this replicates exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..grid import GridSpec
from ..relational import partial_agg, tree_reduce

# first/last packing: seq * 2^33 + (cents + 2^32); valid while |cents| < 2^32
# and seq < 2^29 — fine for the test corpus; the unbounded path is
# relational.arg_extreme_reduce.
_PACK_SHIFT = np.int64(1) << np.int64(33)
_PACK_OFF = np.int64(1) << np.int64(32)


def _pack(seq: np.ndarray, cents: np.ndarray) -> np.ndarray:
    return seq.astype(np.int64) * _PACK_SHIFT + (cents.astype(np.int64) + _PACK_OFF)


def _unpack_cents(packed: np.ndarray) -> np.ndarray:
    return packed % _PACK_SHIFT - _PACK_OFF


def points_to_raster(points_ds, grid: GridSpec, *, x_col="x", y_col="y",
                     value_col="value", seq_col="event_id"):
    """All six --assign reductions of VectorPointsToRaster in one pass
    (data_tools/vector_points_to_raster.rs:402-530): first/last/min/max/sum/
    count. first = value at min seq, last = value at max seq (record order
    made explicit). Values are reduced in integer cents; sums are exact.

    Output: cell_id, n, vmin, vmax, sum_cents, first_cents, last_cents.
    """

    def encode(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        seq = t[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
        row = grid.row_from_y(y)
        col = grid.col_from_x(x)
        ok = grid.in_bounds(row, col)
        cents = np.rint(v * 100.0).astype(np.int64)
        packed = _pack(seq, cents)
        return pa.table({
            "cell_id": grid.cell_id(row, col)[ok],
            "n": np.ones(int(ok.sum()), np.int64),
            "vmin": v[ok], "vmax": v[ok],
            "sum_cents": cents[ok],
            "first_p": packed[ok], "last_p": packed[ok],
        })

    enc = points_ds.map_batches(encode, batch_format="pyarrow")
    agg = partial_agg(enc, ["cell_id"], [
        ("n", "sum", "n"), ("vmin", "min", "vmin"), ("vmax", "max", "vmax"),
        ("sum_cents", "sum", "sum_cents"),
        ("first_p", "min", "first_p"), ("last_p", "max", "last_p"),
    ])

    def decode(t: pa.Table) -> pa.Table:
        first = _unpack_cents(t["first_p"].to_numpy(zero_copy_only=False))
        last = _unpack_cents(t["last_p"].to_numpy(zero_copy_only=False))
        t = t.drop_columns(["first_p", "last_p"])
        return t.append_column("first_cents", pa.array(first)) \
                .append_column("last_cents", pa.array(last))

    return agg.map_batches(decode, batch_format="pyarrow")


def _candidate_cells(x, y, extra: dict[str, np.ndarray], grid: GridSpec, radius: float):
    """Expand each point to every cell whose centre is within ``radius``.

    The fixed (2w+1)^2 window around the point's own cell (w = ceil(R/res)+1)
    is a guaranteed superset; the exact d2 <= R^2 filter matches the
    reference's radius search (fixed_radius_search.rs:115-121) and the SQL
    oracle's cross-join condition bit-for-bit.
    """
    n = len(x)
    wx = int(np.ceil(radius / grid.res_x)) + 1
    wy = int(np.ceil(radius / grid.res_y)) + 1
    dc, dr = np.meshgrid(np.arange(-wx, wx + 1), np.arange(-wy, wy + 1), indexing="ij")
    dc, dr = dc.ravel(), dr.ravel()
    m = len(dc)
    col0 = grid.col_from_x(x)
    row0 = grid.row_from_y(y)
    cols = np.repeat(col0, m) + np.tile(dc, n)
    rows = np.repeat(row0, m) + np.tile(dr, n)
    px = np.repeat(x, m)
    py = np.repeat(y, m)
    ok = grid.in_bounds(rows, cols)
    cols, rows, px, py = cols[ok], rows[ok], px[ok], py[ok]
    cx = grid.x_from_col(cols)
    cy = grid.y_from_row(rows)
    d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
    near = d2 <= radius * radius
    out = {
        "cell_id": grid.cell_id(rows, cols)[near],
        "d2": d2[near],
    }
    keep_idx = np.repeat(np.arange(n), m)[ok][near]
    for name, arr in extra.items():
        out[name] = arr[keep_idx]
    return out


def nn_grid(points_ds, grid: GridSpec, max_dist: float, *, x_col="x", y_col="y",
            value_col="value", seq_col="event_id"):
    """NearestNeighbourGridding (gis_analysis/nearest_neighbour_gridding.rs:
    443-456): per cell centre, the value of the nearest point within
    ``max_dist``; ties broken by insertion order (min seq — the reference's
    NMinimizer keeps the first-inserted on equal distance).

    Output: cell_id, event_id, d2, value_cents.
    """

    def cand(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        extra = {
            "event_id": t[seq_col].to_numpy(zero_copy_only=False).astype(np.int64),
            "value_cents": np.rint(t[value_col].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64),
        }
        return pa.table(_candidate_cells(x, y, extra, grid, max_dist))

    cands = points_ds.map_batches(cand, batch_format="pyarrow", batch_size=16384)

    def best_per_batch(df: pd.DataFrame) -> pd.DataFrame:
        # algebraic argmin by (d2, seq): per-batch partial, then tree merge
        order = np.lexsort((df["event_id"].to_numpy(), df["d2"].to_numpy()))
        df = df.iloc[order]
        return df.drop_duplicates("cell_id", keep="first")

    partial = cands.map_batches(best_per_batch, batch_format="pandas")
    return tree_reduce(partial, best_per_batch, batch_format="pandas")


def idw_grid_int(points_ds, grid: GridSpec, radius: float, *, x_col="x", y_col="y",
                 value_col="value", seq_col="event_id"):
    """IDW gridding with integer-quantized regularized weights.

    Reference shape (gis_analysis/idw_interpolation.rs:620-644): radius
    search around each cell centre, weight by inverse distance. This variant
    quantizes the weight to w = round(1e9/(1+d2)) (int64) so the per-cell
    reduction is an exact integer sum — bit-identical at any parallelism and
    SQL-expressible. Output: cell_id, n_neighbors, wsum, wv_sum; the IDW
    value is wv_sum/wsum/100 (left to the consumer to keep columns exact).
    """

    def cand(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        extra = {
            "value_cents": np.rint(t[value_col].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64),
        }
        out = _candidate_cells(x, y, extra, grid, radius)
        w = np.rint(1e9 / (1.0 + out.pop("d2"))).astype(np.int64)
        out["wsum"] = w
        out["wv_sum"] = w * out.pop("value_cents")
        out["n_neighbors"] = np.ones(len(w), np.int64)
        return pa.table(out)

    cands = points_ds.map_batches(cand, batch_format="pyarrow", batch_size=16384)
    return partial_agg(cands, ["cell_id"], [
        ("n_neighbors", "sum", "n_neighbors"),
        ("wsum", "sum", "wsum"), ("wv_sum", "sum", "wv_sum"),
    ])


def idw_grid(points_ds, grid: GridSpec, radius: float, *, weight: float = 2.0,
             min_points: int = 3, max_rounds: int = 5, x_col="x", y_col="y",
             value_col="value", seq_col="event_id"):
    """Reference-faithful IDW gridding (gis_analysis/idw_interpolation.rs:
    615-645): per cell centre (x = west + (col+0.5)*res, exact float order),
    radius search; if fewer than min_points neighbours, kNN(min_points)
    fallback; weight 1/dist^weight over EUCLIDEAN distance; an exact hit
    (dist == 0) short-circuits to the point value; cells that never reach
    min_points stay nodata (omitted).

    Distributed plan: candidate (cell, point) pairs at the base radius; cells
    short of min_points re-probe in doubling-radius rounds (the expanding
    shell of fixed_radius_search.rs:180-203). The kNN fallback is EXACT here
    (take the min_points nearest among candidates; the probe radius bounds
    the k-th distance, so no nearer point can be outside) — the reference's
    shell scan is approximate; divergences are possible only where its shell
    heuristic misses a true neighbour. Per-cell reduction orders candidates
    by (d2, seq) before summing, so results are parallelism-invariant.

    Output: cell_id, n_neighbors, idw (float64).
    """

    TILE = 16  # coarse prefilter granularity for refinement rounds

    def make_cand(r: float, keep_ref=None, mask_ref=None):
        """keep_ref: ray.put(SORTED unsat cell ids) — broadcast once per
        round, fetched once per worker (round 1 shipped the array inside
        every task closure). mask_ref: ray.put integral image of the unsat
        TILE mask — points whose radius window contains no unsat tile are
        dropped BEFORE candidate expansion, so refinement rounds only
        re-expand points near still-unsatisfied cells instead of the whole
        dataset."""
        def cand(t: pa.Table) -> pa.Table:
            from .spatial_join import _cached_get

            x = t[x_col].to_numpy(zero_copy_only=False)
            y = t[y_col].to_numpy(zero_copy_only=False)
            seq = t[seq_col].to_numpy(zero_copy_only=False).astype(np.int64)
            val = t[value_col].to_numpy(zero_copy_only=False)
            if mask_ref is not None:
                ii = _cached_get(mask_ref)  # (trows+1, tcols+1) integral image
                trows, tcols = ii.shape[0] - 1, ii.shape[1] - 1
                tw = int(np.ceil(r / (grid.res_x * TILE))) + 1
                th = int(np.ceil(r / (grid.res_y * TILE))) + 1
                tc = np.clip(grid.col_from_x(x) // TILE, 0, tcols - 1)
                tr = np.clip(grid.row_from_y(y) // TILE, 0, trows - 1)
                r0 = np.clip(tr - th, 0, trows); r1 = np.clip(tr + th + 1, 0, trows)
                c0 = np.clip(tc - tw, 0, tcols); c1 = np.clip(tc + tw + 1, 0, tcols)
                windowed = ii[r1, c1] - ii[r0, c1] - ii[r1, c0] + ii[r0, c0]
                near = windowed > 0
                x, y, seq, val = x[near], y[near], seq[near], val[near]
            out = _candidate_cells_centres(x, y, {"seq": seq, "value": val}, grid, r)
            if keep_ref is not None:
                keep = _cached_get(keep_ref)  # sorted unsat cell ids
                if len(keep):
                    pos = np.minimum(np.searchsorted(keep, out["cell_id"]),
                                     len(keep) - 1)
                    mask = keep[pos] == out["cell_id"]
                else:
                    mask = np.zeros(len(out["cell_id"]), bool)
                out = {k: v[mask] for k, v in out.items()}
            return pa.table(out)

        return cand

    def _unsat_refs(unsat: np.ndarray):
        """Broadcast the sorted unsat set + the integral image of its coarse
        tile occupancy mask."""
        srt = np.sort(unsat)
        trows = -(-grid.rows // TILE)
        tcols = -(-grid.cols // TILE)
        mask = np.zeros((trows, tcols), np.int64)
        tr = (srt // grid.cols) // TILE
        tc = (srt % grid.cols) // TILE
        mask[tr, tc] = 1
        ii = np.zeros((trows + 1, tcols + 1), np.int64)
        ii[1:, 1:] = mask.cumsum(axis=0).cumsum(axis=1)
        return ray.put(srt), ray.put(ii)

    def reduce_cell(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df["seq"].to_numpy(), df["d2"].to_numpy()))
        d2 = df["d2"].to_numpy()[order]
        v = df["value"].to_numpy()[order]
        if len(d2) < min_points:
            return pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                                 "n_neighbors": pd.Series([], dtype=np.int64),
                                 "idw": pd.Series([], dtype=np.float64)})
        dist = np.sqrt(d2)
        if dist[0] == 0.0:
            return pd.DataFrame({"cell_id": [df["cell_id"].iloc[0]],
                                 "n_neighbors": [np.int64(len(d2))], "idw": [v[0]]})
        # reference sums in retrieval order; our deterministic order is by
        # (dist, seq) — fix the order, then the float64 sum is reproducible
        w = 1.0 / dist ** weight
        return pd.DataFrame({"cell_id": [df["cell_id"].iloc[0]],
                             "n_neighbors": [np.int64(len(d2))],
                             "idw": [float(np.sum(w * v) / np.sum(w))]})

    base = points_ds.map_batches(make_cand(radius), batch_format="pyarrow").materialize()
    counts = partial_agg(base, ["cell_id"], [("seq", "count", "n")]).to_pandas()
    satisfied = counts[counts["n"] >= min_points]["cell_id"].to_numpy()

    results = [base.map_batches(
        lambda t: t.filter(pa.array(np.isin(t["cell_id"].to_numpy(zero_copy_only=False), satisfied))),
        batch_format="pyarrow")]

    all_cells = np.arange(grid.rows * grid.cols, dtype=np.int64)
    unsat = np.setdiff1d(all_cells, satisfied)
    r = radius
    for _ in range(max_rounds):
        if len(unsat) == 0:
            break
        r *= 2.0
        keep_ref, mask_ref = _unsat_refs(unsat)
        cand_r = points_ds.map_batches(make_cand(r, keep_ref, mask_ref),
                                       batch_format="pyarrow").materialize()
        cnt = partial_agg(cand_r, ["cell_id"], [("seq", "count", "n")]).to_pandas()
        ok_cells = cnt[cnt["n"] >= min_points]["cell_id"].to_numpy()
        if len(ok_cells):
            # kNN(min_points): keep only the min_points nearest per cell
            def knn_trim(df: pd.DataFrame, _ok=ok_cells) -> pd.DataFrame:
                df = df[df["cell_id"].isin(_ok)]
                order = np.lexsort((df["seq"].to_numpy(), df["d2"].to_numpy()))
                df = df.iloc[order]
                return df.groupby("cell_id", sort=False).head(min_points)

            trimmed = tree_reduce(cand_r, knn_trim, batch_format="pandas",
                                  levels=(1,))
            results.append(trimmed)
        unsat = np.setdiff1d(unsat, ok_cells)

    cands = results[0]
    for extra in results[1:]:
        cands = cands.union(extra)
    from ..relational import keyed_map_groups

    return keyed_map_groups(cands, "cell_id", reduce_cell)


def _candidate_cells_centres(x, y, extra, grid: GridSpec, radius: float):
    """Like _candidate_cells but with the reference IDW centre formula
    x = west + (col+0.5)*res (idw_interpolation.rs:620-621) — bit-for-bit."""
    n = len(x)
    wx = int(np.ceil(radius / grid.res_x)) + 1
    wy = int(np.ceil(radius / grid.res_y)) + 1
    dc, dr = np.meshgrid(np.arange(-wx, wx + 1), np.arange(-wy, wy + 1), indexing="ij")
    dc, dr = dc.ravel(), dr.ravel()
    m = len(dc)
    col0 = grid.col_from_x(x)
    row0 = grid.row_from_y(y)
    cols = np.repeat(col0, m) + np.tile(dc, n)
    rows = np.repeat(row0, m) + np.tile(dr, n)
    px = np.repeat(x, m)
    py = np.repeat(y, m)
    ok = grid.in_bounds(rows, cols)
    cols, rows, px, py = cols[ok], rows[ok], px[ok], py[ok]
    cx = grid.west + (cols.astype(np.float64) + 0.5) * grid.res_x
    cy = grid.north - (rows.astype(np.float64) + 0.5) * grid.res_y
    d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
    near = d2 <= radius * radius
    out = {"cell_id": grid.cell_id(rows, cols)[near], "d2": d2[near]}
    keep_idx = np.repeat(np.arange(n), m)[ok][near]
    for name, arr in extra.items():
        out[name] = arr[keep_idx]
    return out


def rbf_grid(points_ds, grid: GridSpec, *, k: int = 8, radius: float = 12.0,
             x_col="x", y_col="y", value_col="value", seq_col="event_id"):
    """RBF interpolation (gis_analysis/radial_basis_function_interpolation.rs
    semantics, thin-plate-spline basis phi(r) = r^2 ln r): per grid cell the
    k nearest points (exact among radius candidates, ties by (d2, seq)) form
    the k x k system A w = v; the prediction is sum w_i phi(|p_i - c|).

    Distribution: the IDW candidate machinery emits (cell, point) pairs, a
    tree-combined per-cell top-k keeps k rows per cell, and ONE whole-block
    pass runs a BATCHED np.linalg.solve over (n_cells, k, k) — no per-cell
    task granularity. Cells with fewer than k candidates in the radius are
    omitted (nodata). Output: cell_id, rbf (float64), deterministic at any
    parallelism (candidate order fixed before the solve).
    """
    from ..relational import tree_reduce

    def cand(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        extra = {
            "seq": t[seq_col].to_numpy(zero_copy_only=False).astype(np.int64),
            "value": t[value_col].to_numpy(zero_copy_only=False),
            "px": x, "py": y,
        }
        return pa.table(_candidate_cells_centres(x, y, extra, grid, radius))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df["seq"].to_numpy(), df["d2"].to_numpy()))
        df = df.iloc[order]
        return df.groupby("cell_id", sort=False).head(k)

    cands = points_ds.map_batches(cand, batch_format="pyarrow")
    pruned = tree_reduce(cands.map_batches(topk, batch_format="pandas"),
                         topk, batch_format="pandas")

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df["seq"].to_numpy(), df["d2"].to_numpy(),
                            df["cell_id"].to_numpy()))
        df = df.iloc[order]
        counts = df.groupby("cell_id", sort=False).size()
        full = counts[counts == k].index.to_numpy(np.int64)
        df = df[df["cell_id"].isin(full)]
        if df.empty:
            return pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                                 "rbf": pd.Series([], dtype=np.float64)})
        n = len(df) // k
        px = df["px"].to_numpy().reshape(n, k)
        py = df["py"].to_numpy().reshape(n, k)
        v = df["value"].to_numpy().reshape(n, k)
        d2c = df["d2"].to_numpy().reshape(n, k)
        cells = df["cell_id"].to_numpy(np.int64).reshape(n, k)[:, 0]

        def phi(r2):
            with np.errstate(divide="ignore", invalid="ignore"):
                return np.where(r2 > 0, 0.5 * r2 * np.log(r2), 0.0)

        dx = px[:, :, None] - px[:, None, :]
        dy = py[:, :, None] - py[:, None, :]
        A = phi(dx * dx + dy * dy)  # (n, k, k)
        try:
            w = np.linalg.solve(A, v[:, :, None])[:, :, 0]
        except np.linalg.LinAlgError:
            return pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                                 "rbf": pd.Series([], dtype=np.float64)})
        pred = np.sum(w * phi(d2c), axis=1)
        return pd.DataFrame({"cell_id": cells, "rbf": pred})

    return pruned.map_batches(solve, batch_format="pandas", batch_size=None)
