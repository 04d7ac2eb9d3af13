"""math_stat_analysis per-cell raster math sweep.

Reference kernels (file:line cited per query): the Boolean family maps
nonzero->1 (and.rs:245-252, or.rs, xor.rs, not.rs = "z1 AND NOT z2"),
comparisons emit 1/0 (equal_to.rs:485-490, greater_than.rs:507-517),
IntegerDivision truncates toward zero after integer casts
(integer_division.rs:438-441), Modulo is Rust ``%`` = C fmod with the
dividend's sign (modulo.rs:441-444), Round is f64::round = half away from
zero (round.rs:213), Truncate is ``(z*10^d).trunc()/10^d`` (truncate.rs:236),
ZScores uses the POPULATION stdev (whitebox-raster/src/lib.rs:1103
``sqrt(sq_diff_sum / count)``), RMSE reports sqrt(mean squared diff) + mean
vertical error (root_mean_square_error.rs:250-273).

Architecture: every op is an embarrassingly-parallel ``map_batches`` over the
tile-aligned raster dataset — zero shuffles; at 100 TB each tile is an
independent task. Two-raster ops use bands that are deterministic functions
of cell_id so tile-local evaluation IS the aligned-raster merge (the real
co-partitioned multi-raster merge pattern — union + groupby(tile_id) — is
exercised by queries_overlay2.py). Global-statistic ops (ZScores, RMSE) run
a distributed integer partial aggregate first (sums of int-valued cells are
exact in any order), then broadcast the two scalars into the per-tile map:
the 100 TB two-pass pattern.

Float results are bit-exact vs DuckDB because both sides evaluate the same
IEEE expression tree over the same integer-exact inputs (sqrt and arithmetic
are correctly rounded; the only libm call is pow on small integer bases).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..stages.raster import synth_raster_tiles
from .queries import query

_N = GRID1.rows * GRID1.cols

# band definitions — signed a/b, never-zero-filtered denominator d, nonneg u
_A_SQL = "(((t.i * 1000003) % 1001) - 500)"
_B_SQL = "(((t.i * 999983 + 17) % 1001) - 500)"
_D_SQL = "(((t.i * 999979) % 211) - 105)"
_U_SQL = "((t.i * 1000003) % 1001)"

_CELLS = (f"cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id, {_A_SQL} AS a, "
          f"{_B_SQL} AS b, {_D_SQL} AS d, {_U_SQL} AS u "
          f"FROM range({_N}) t(i))")


def _a_fn(cells: np.ndarray) -> np.ndarray:
    return (((cells.astype(np.int64) * 1000003) % 1001) - 500).astype(np.float64)


def _bands(cells: np.ndarray):
    c = cells.astype(np.int64)
    b = (((c * 999983 + 17) % 1001) - 500).astype(np.float64)
    d = (((c * 999979) % 211) - 105).astype(np.float64)
    u = ((c * 1000003) % 1001).astype(np.float64)
    return b, d, u


def _cell_map(out_col: str, cell_fn, dtype=np.int64):
    """map_batches over the tile dataset: explode each tile to cell rows and
    apply cell_fn(cells, a, b, d, u) -> (values, keep_mask|None)."""
    tiles = synth_raster_tiles(GRID1, _a_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids, vals = [], []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            a = np.asarray(t.data, np.float64)
            b, d, u = _bands(cells)
            v, keep = cell_fn(cells, a, b, d, u)
            if keep is not None:
                cells, v = cells[keep], v[keep]
            ids.append(cells)
            vals.append(v.astype(dtype))
        return pd.DataFrame({"cell_id": np.concatenate(ids),
                             out_col: np.concatenate(vals)})

    return tiles.map_batches(f, batch_format="pandas")


def _q(name: str, select: str, cell_fn, dtype=np.int64, where: str = ""):
    sql = f"WITH {_CELLS} SELECT cell_id, {select} FROM cells{where}"

    @query(name, sql)
    def _impl(sf_dir: str, _fn=cell_fn, _col=select.split(" AS ")[-1], _dt=dtype):
        return _cell_map(_col, _fn, _dt)

    return _impl


# --- Boolean family (nonzero -> 1) ---------------------------------------
_q("math_and", "CAST(CASE WHEN a <> 0 AND b <> 0 THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: (((a != 0) & (b != 0)).astype(np.int64), None))
_q("math_or", "CAST(CASE WHEN a <> 0 OR b <> 0 THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: (((a != 0) | (b != 0)).astype(np.int64), None))
_q("math_xor", "CAST(CASE WHEN (a <> 0) <> (b <> 0) THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: (((a != 0) ^ (b != 0)).astype(np.int64), None))
_q("math_not", "CAST(CASE WHEN a <> 0 AND b = 0 THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: (((a != 0) & (b == 0)).astype(np.int64), None))

# --- Comparisons (1/0, equal_to.rs:485, greater_than.rs:507) -------------
_q("math_equal_to", "CAST(CASE WHEN a = b THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: ((a == b).astype(np.int64), None))
_q("math_not_equal_to", "CAST(CASE WHEN a <> b THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: ((a != b).astype(np.int64), None))
_q("math_greater_than", "CAST(CASE WHEN a > b THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: ((a > b).astype(np.int64), None))
_q("math_greater_equal", "CAST(CASE WHEN a >= b THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: ((a >= b).astype(np.int64), None))
_q("math_less_than", "CAST(CASE WHEN a < b THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: ((a < b).astype(np.int64), None))

# IsNoData: sentinel -32768 injected at cell % 97 == 0 (math_stat_analysis/
# isnodata.rs: 1 where value == nodata else 0)
_q("math_isnodata", "CAST(CASE WHEN cell_id % 97 = 0 THEN 1 ELSE 0 END AS BIGINT) AS v",
   lambda c, a, b, d, u: ((c % 97 == 0).astype(np.int64), None))

# --- Arithmetic (add.rs / subtract.rs / multiply.rs / divide.rs; the
# inplace_add.rs / inplace_subtract.rs / inplace_multiply.rs /
# inplace_divide.rs tools are the identical kernels writing over band A) --
_q("math_add", "CAST(a + b AS BIGINT) AS v",
   lambda c, a, b, d, u: (a + b, None))
_q("math_subtract", "CAST(a - b AS BIGINT) AS v",
   lambda c, a, b, d, u: (a - b, None))
_q("math_multiply", "CAST(a * b AS BIGINT) AS v",
   lambda c, a, b, d, u: (a * b, None))
_q("math_divide", "a / CAST(d AS DOUBLE) AS v",
   lambda c, a, b, d, u: (a / d, d != 0), np.float64, " WHERE d <> 0")
# trunc-toward-zero integer division via dividend-sign modulo (exactly
# integer_division.rs:440 `z1 as isize / z2 as isize` for integral inputs)
_q("math_integer_division",
   "CAST((CAST(a AS BIGINT) - (CAST(a AS BIGINT) % CAST(d AS BIGINT)))"
   " // CAST(d AS BIGINT) AS BIGINT) AS v",
   lambda c, a, b, d, u: ((a - np.fmod(a, d)) / d, d != 0),
   np.int64, " WHERE d <> 0")
_q("math_modulo", "CAST(CAST(a AS BIGINT) % CAST(d AS BIGINT) AS BIGINT) AS v",
   lambda c, a, b, d, u: (np.fmod(a, d), d != 0), np.int64, " WHERE d <> 0")
_q("math_abs", "CAST(ABS(a) AS BIGINT) AS v",
   lambda c, a, b, d, u: (np.abs(a), None))
_q("math_negate", "CAST(-a AS BIGINT) AS v",
   lambda c, a, b, d, u: (-a, None))
_q("math_min2", "CAST(LEAST(a, b) AS BIGINT) AS v",
   lambda c, a, b, d, u: (np.minimum(a, b), None))
_q("math_max2", "CAST(GREATEST(a, b) AS BIGINT) AS v",
   lambda c, a, b, d, u: (np.maximum(a, b), None))
_q("math_increment", "CAST(a + 1 AS BIGINT) AS v",
   lambda c, a, b, d, u: (a + 1.0, None))
_q("math_decrement", "CAST(a - 1 AS BIGINT) AS v",
   lambda c, a, b, d, u: (a - 1.0, None))
_q("math_square", "CAST(a * a AS BIGINT) AS v",
   lambda c, a, b, d, u: (a * a, None))
_q("math_sqrt", "sqrt(CAST(u AS DOUBLE)) AS v",
   lambda c, a, b, d, u: (np.sqrt(u), None), np.float64)
_q("math_reciprocal", "1.0 / CAST(d AS DOUBLE) AS v",
   lambda c, a, b, d, u: (1.0 / d, d != 0), np.float64, " WHERE d <> 0")
# Power (math_stat_analysis/power.rs:423 z1.powf(z2)) with exponent 3: for
# integer bases |a|<=500 the exact a^3 is float64-representable, so a
# correctly-rounded powf equals the explicit product — evaluated as (a*a)*a
# on both sides (DuckDB's bundled pow and numpy's libm pow disagree by 1 ulp
# on some integer bases, so neither is used directly)
_q("math_power", "CAST((a * a) * a AS BIGINT) AS v",
   lambda c, a, b, d, u: ((a * a) * a, None))

# --- Rounding on half-integer values h = a/2 (round.rs:213 f64::round =
# half AWAY from zero; DuckDB round() likewise; numpy's np.round would be
# half-to-even so the kernel mirrors the fold explicitly) ------------------
_q("math_round", "CAST(round(a / 2.0, 0) AS BIGINT) AS v",
   lambda c, a, b, d, u: (np.where(a >= 0, np.floor(a / 2.0 + 0.5),
                                   np.ceil(a / 2.0 - 0.5)), None))
_q("math_ceil", "CAST(ceil(a / 2.0) AS BIGINT) AS v",
   lambda c, a, b, d, u: (np.ceil(a / 2.0), None))
_q("math_floor", "CAST(floor(a / 2.0) AS BIGINT) AS v",
   lambda c, a, b, d, u: (np.floor(a / 2.0), None))
_q("math_truncate", "CAST(trunc(a / 2.0) AS BIGINT) AS v",
   lambda c, a, b, d, u: (np.trunc(a / 2.0), None))

# --- Angle conversions: single multiply by the correctly-rounded constant
# (f64::to_degrees = x * (180/PI); both sides fold 180.0/pi() to the same
# double, then one IEEE multiply) -----------------------------------------
_q("math_to_degrees", "a * (180.0 / pi()) AS v",
   lambda c, a, b, d, u: (a * np.float64(180.0 / np.pi), None), np.float64)
_q("math_to_radians", "a * (pi() / 180.0) AS v",
   lambda c, a, b, d, u: (a * np.float64(np.pi / 180.0), None), np.float64)


# --- ZScores: two-pass — distributed integer partial agg, then broadcast ---
@query(
    "math_zscores",
    f"""
    WITH {_CELLS},
    s AS (SELECT CAST(SUM(u) AS BIGINT) AS s1, CAST(SUM(u * u) AS BIGINT) AS s2,
                 COUNT(*) AS n FROM cells)
    SELECT c.cell_id,
           (c.u - CAST(s.s1 AS DOUBLE) / s.n) /
           sqrt(CAST(s.s2 AS DOUBLE) / s.n
                - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n)) AS v
    FROM cells c, s
    """,
)
def math_zscores(sf_dir: str):
    """ZScores (math_stat_analysis/zscores.rs:21 output (z-mean)/stdev with
    the POPULATION stdev, whitebox-raster/src/lib.rs:1103). Both paths derive
    mean/stdev from the same integer-exact sufficient statistics (S1, S2, n)
    by the same expression tree, so the floats are bit-identical (the
    reference's thread-order-dependent pairwise accumulation is equal in
    value; sums of <2^53 integers are exact in any order)."""

    def u_fn(cells: np.ndarray) -> np.ndarray:
        return ((cells.astype(np.int64) * 1000003) % 1001).astype(np.float64)

    tiles = synth_raster_tiles(GRID1, u_fn)

    # pass 1: integer sufficient statistics (exact in any combine order)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s1 = s2 = n = 0
        for dat in df["data"]:
            v = np.asarray(dat, np.int64)
            s1 += int(v.sum()); s2 += int((v * v).sum()); n += v.size
        return pd.DataFrame({"s1": [s1], "s2": [s2], "n": [n]})

    stats = tiles.map_batches(partial, batch_format="pandas").to_pandas()
    s1, s2, n = (int(stats["s1"].sum()), int(stats["s2"].sum()),
                 int(stats["n"].sum()))
    mean = np.float64(s1) / np.float64(n)
    std = np.sqrt(np.float64(s2) / np.float64(n) - mean * mean)

    # pass 2: per-tile map with the two broadcast scalars
    def zmap(df: pd.DataFrame) -> pd.DataFrame:
        ids, vals = [], []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            ids.append(cells)
            vals.append((np.asarray(t.data, np.float64) - mean) / std)
        return pd.DataFrame({"cell_id": np.concatenate(ids),
                             "v": np.concatenate(vals)})

    return tiles.map_batches(zmap, batch_format="pandas")


@query(
    "math_rmse",
    f"""
    WITH {_CELLS}
    SELECT sqrt(CAST(SUM((b - a) * (b - a)) AS DOUBLE) / COUNT(*)) AS rmse,
           CAST(SUM(b - a) AS DOUBLE) / COUNT(*) AS mean_vertical_error
    FROM cells
    """,
)
def math_rmse(sf_dir: str):
    """RootMeanSquareError (root_mean_square_error.rs:250-273: rmse =
    sqrt(sq_sum/n), mean vertical error = sum/n, diffs taken input-minus-base).
    Distributed integer partial aggregate -> one scalar row."""
    tiles = synth_raster_tiles(GRID1, _a_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = sq = n = 0
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            a = np.asarray(t.data, np.int64)
            b, _, _ = _bands(cells)
            diff = b.astype(np.int64) - a
            sd += int(diff.sum()); sq += int((diff * diff).sum()); n += diff.size
        return pd.DataFrame({"sd": [sd], "sq": [sq], "n": [n]})

    p = tiles.map_batches(partial, batch_format="pandas").to_pandas()
    sd, sq, n = int(p["sd"].sum()), int(p["sq"].sum()), int(p["n"].sum())
    return pd.DataFrame({
        "rmse": [float(np.sqrt(np.float64(sq) / np.float64(n)))],
        "mean_vertical_error": [float(np.float64(sd) / np.float64(n))],
    })
