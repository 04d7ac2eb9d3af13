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
    min_points within max_rounds doubling rounds stay nodata (omitted).

    Distributed plan: candidate (cell, point) pairs at the base radius; cells
    short of min_points re-probe in doubling-radius rounds (the expanding
    shell of fixed_radius_search.rs:180-203). The kNN fallback is EXACT here
    (take the min_points nearest among candidates; the probe radius bounds
    the k-th distance, so no nearer point can be outside) — the reference's
    shell scan is approximate; divergences are possible only where its shell
    heuristic misses a true neighbour. Per-cell reduction orders candidates
    by (d2, seq) before summing, so results are parallelism-invariant.

    Scale discipline: NOTHING O(grid) touches the driver. Cell space is
    split into fixed cell-id RANGE buckets; each bucket task derives its
    own unsatisfied set with a local bincount over its dense range, reduces
    its satisfied cells vectorized (segment reduceat over (cell, d2, seq)-
    sorted rows) and emits still-unsat cell ids as marker ROWS. Refinement
    rounds co-locate those marker rows with the new candidates by the same
    range bucketing, so satisfied/unsat tracking is a distributed
    anti-join, never a driver array. The only driver-side state per round
    is the coarse-tile occupancy mask used to prefilter points before
    candidate expansion — O(grid / TILE^2) with TILE grown geometrically so
    the mask stays <= ~4M tiles at any grid size — plus the scalar unsat
    count that terminates the loop.

    Output: cell_id, n_neighbors, idw (float64).
    """
    import ray as _ray
    import ray.data as _rd  # noqa: F401

    ncells = grid.rows * grid.cols
    NB = 32  # cell-range buckets (each task owns a dense cell-id range)
    stride = -(-ncells // NB)
    TILE = 16  # coarse prefilter granularity for refinement rounds
    while (-(-grid.rows // TILE)) * (-(-grid.cols // TILE)) > (1 << 22):
        TILE *= 2

    def make_cand(r: float, mask_ref=None):
        """mask_ref: ray.put integral image of the unsat TILE mask — points
        whose radius window contains no unsat tile are dropped BEFORE
        candidate expansion, so refinement rounds only re-expand points near
        still-unsatisfied cells instead of the whole dataset. Candidates for
        satisfied cells that slip through the coarse mask are dropped in the
        bucket kernel (exact membership against the bucket's marker rows)."""
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
            out["__b"] = out["cell_id"] // stride
            return pa.table(out)

        return cand

    def _reduce_sorted(cell, d2, v):
        """Vectorized per-cell IDW over rows sorted by (cell, d2, seq):
        segment reduceat with the exact-hit (d2 == 0 first row) short-circuit.
        Returns (cell_ids, n_neighbors, idw)."""
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        n = ends - starts
        dist = np.sqrt(d2)
        exact = dist[starts] == 0.0
        with np.errstate(divide="ignore"):
            w = 1.0 / dist ** weight
        w_safe = np.where(np.isfinite(w), w, 0.0)
        sw = np.add.reduceat(w_safe, starts)
        swv = np.add.reduceat(w_safe * v, starts)
        with np.errstate(invalid="ignore"):
            idw = swv / sw
        idw[exact] = v[starts[exact]]
        return cell[starts], n.astype(np.int64), idw

    def _sort_cds(df: pd.DataFrame):
        order = np.lexsort((df["seq"].to_numpy(), df["d2"].to_numpy(),
                            df["cell_id"].to_numpy()))
        return (df["cell_id"].to_numpy(np.int64)[order],
                df["d2"].to_numpy(np.float64)[order],
                df["value"].to_numpy(np.float64)[order])

    _OUT = {"cell_id": np.int64, "n_neighbors": np.int64, "idw": np.float64}

    def _frame(cell, n, idw):
        return pd.DataFrame({"cell_id": cell.astype(np.int64),
                             "n_neighbors": n.astype(np.int64),
                             "idw": idw.astype(np.float64)})

    def round0_kernel(g: pd.DataFrame) -> pd.DataFrame:
        """One dense cell-id range: reduce satisfied cells, emit unsat cells
        of the range as marker rows (n_neighbors == -1). Every bucket is
        guaranteed a group by the seq == -2 seed rows (a bucket whose range
        drew zero base candidates still owes its whole range as unsat)."""
        b = int(g["__b"].iloc[0])
        lo, hi = b * stride, min((b + 1) * stride, ncells)
        g = g.loc[g["seq"].to_numpy() >= 0]
        cell, d2, v = _sort_cds(g)
        cnt = np.bincount(cell - lo, minlength=hi - lo)
        sat_local = cnt >= min_points
        keep = sat_local[cell - lo]
        out = [_frame(*_reduce_sorted(cell[keep], d2[keep], v[keep]))
               if keep.any() else _frame(np.array([], np.int64),
                                         np.array([], np.int64),
                                         np.array([], np.float64))]
        unsat = np.flatnonzero(~sat_local).astype(np.int64) + lo
        out.append(_frame(unsat, np.full(len(unsat), -1, np.int64),
                          np.zeros(len(unsat), np.float64)))
        return pd.concat(out, ignore_index=True)

    def roundr_kernel(g: pd.DataFrame) -> pd.DataFrame:
        """Co-group of this round's candidates (seq >= 0) and the previous
        round's unsat marker rows (seq == -1) for one cell-id range: cells
        reaching min_points candidates get an EXACT kNN(min_points) trim +
        reduction; the rest re-emit as markers for the next round."""
        is_marker = g["seq"].to_numpy() < 0
        unsat = np.unique(g["cell_id"].to_numpy(np.int64)[is_marker])
        out_empty = pd.DataFrame({k: pd.Series([], dtype=t)
                                  for k, t in _OUT.items()})
        if len(unsat) == 0:
            return out_empty
        c = g.loc[~is_marker]
        if len(c):
            pos = np.minimum(np.searchsorted(unsat, c["cell_id"].to_numpy()),
                             len(unsat) - 1)
            c = c.loc[unsat[pos] == c["cell_id"].to_numpy()]
        outs = []
        still = unsat
        if len(c):
            cell, d2, v = _sort_cds(c)
            starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
            ends = np.r_[starts[1:], len(cell)]
            n = ends - starts
            ok = n >= min_points
            # rank within cell; keep the min_points nearest of ok cells
            rank = np.arange(len(cell)) - np.repeat(starts, n)
            keep = np.repeat(ok, n) & (rank < min_points)
            if keep.any():
                outs.append(_frame(*_reduce_sorted(cell[keep], d2[keep],
                                                   v[keep])))
            done = cell[starts[ok]]
            pos = np.minimum(np.searchsorted(unsat, done), len(unsat) - 1)
            gone = np.zeros(len(unsat), bool)
            gone[pos[unsat[pos] == done]] = True
            still = unsat[~gone]
        outs.append(_frame(still, np.full(len(still), -1, np.int64),
                           np.zeros(len(still), np.float64)))
        return pd.concat(outs, ignore_index=True) if outs else out_empty

    def _split(res_ds):
        """Materialized mixed frame -> (result rows, unsat marker Dataset).
        Marker rows carry the candidate schema (+ __b) so refinement rounds
        can union them straight into the next candidate stream."""
        res = res_ds.materialize()
        done = res.map_batches(lambda df: df.loc[df["n_neighbors"] >= 0],
                               batch_format="pandas")

        def to_markers(df: pd.DataFrame) -> pa.Table:
            cid = df.loc[df["n_neighbors"] < 0, "cell_id"].to_numpy(np.int64)
            return pa.table({
                "cell_id": cid,
                "d2": np.full(len(cid), -1.0),
                "seq": np.full(len(cid), -1, np.int64),
                "value": np.zeros(len(cid)),
                "__b": cid // stride})

        return done, res.map_batches(to_markers, batch_format="pandas")

    def _mask_ref(unsat_ds, r: float):
        """Integral image of the unsat coarse-tile occupancy, built from the
        DISTRIBUTED unsat set; only the O(occupied tiles) distinct tile list
        (bounded by the TILE growth rule) reaches the driver."""
        trows = -(-grid.rows // TILE)
        tcols = -(-grid.cols // TILE)

        def to_tiles(df: pd.DataFrame) -> pd.DataFrame:
            cid = df["cell_id"].to_numpy(np.int64)
            tid = np.unique(((cid // grid.cols) // TILE) * tcols
                            + (cid % grid.cols) // TILE)
            return pd.DataFrame({"tile": tid,
                                 "n": np.ones(len(tid), np.int64)})

        tiles = partial_agg(unsat_ds.map_batches(to_tiles, batch_format="pandas"),
                            ["tile"], [("n", "sum", "n")]).to_pandas()
        tid = tiles["tile"].to_numpy(np.int64)
        mask = np.zeros((trows, tcols), np.int64)
        mask[tid // tcols, tid % tcols] = 1
        ii = np.zeros((trows + 1, tcols + 1), np.int64)
        ii[1:, 1:] = mask.cumsum(axis=0).cumsum(axis=1)
        return _ray.put(ii)

    nb_used = -(-ncells // stride)
    seeds = _rd.from_arrow(pa.table({
        "cell_id": np.arange(nb_used, dtype=np.int64) * stride,
        "d2": np.full(nb_used, -1.0),
        "seq": np.full(nb_used, -2, np.int64),
        "value": np.zeros(nb_used),
        "__b": np.arange(nb_used, dtype=np.int64)}))

    base = points_ds.map_batches(make_cand(radius), batch_format="pyarrow")
    done0, unsat_ds = _split(base.union(seeds).groupby("__b").map_groups(
        round0_kernel, batch_format="pandas"))
    results = [done0]

    r = radius
    for _ in range(max_rounds):
        if unsat_ds.count() == 0:
            break
        r *= 2.0
        cand_r = points_ds.map_batches(make_cand(r, _mask_ref(unsat_ds, r)),
                                       batch_format="pyarrow")
        done_r, unsat_ds = _split(unsat_ds.union(cand_r).groupby("__b")
                                  .map_groups(roundr_kernel,
                                              batch_format="pandas"))
        results.append(done_r)

    out = results[0]
    for extra in results[1:]:
        out = out.union(extra)
    return out


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
