"""math_stat_analysis sweep #2: transcendental per-cell functions and the
two-raster statistical tests.

Transcendental family (math_stat_analysis/{sin,cos,tan,arcsin,arccos,arctan,
atan2,sinh,cosh,tanh,arsinh,arcosh,artanh,exp,exp2,ln,log10,log2}.rs — each
is ``output(cell) = f(input(cell))`` over the raster): DuckDB's and numpy's
libm are NOT bit-identical for these (measured: up to ~3 ulp apart on our
domains), so float equality can't be the contract. Instead both sides emit
micro-units: ``sign(f) * floor(|f| * 1e6 + 0.5)`` as BIGINT. That is
deterministic-safe on OUR fixed input domains because the minimum distance
from ``|f|*1e6 + 0.5`` to a rounding boundary across every distinct input
value is >= 4e-5 (measured; re-asserted by tests/test_mathops2.py) while the
cross-library disagreement is <= ~1e-8 in the same scaled units — a >1000x
guard band. Hyperbolics (DuckDB has no sinh/cosh/...) are expressed via the
same explicit exp/ln formula tree on BOTH sides.

Statistical tests are driven from integer-exact sufficient statistics
(distributed partial aggregates; sums of bounded ints are exact in any
combine order) and finished with the reference's exact expression tree, so
those floats ARE bit-identical:

- PairedSampleTTest (paired_sample_t_test.rs:338-383): population variance
  of the per-cell differences, std_err = sd/sqrt(n), t = mean/std_err.
- WilcoxonSignedRankTest (wilcoxon_signed_rank_test.rs:382-423): zero
  diffs excluded, tied |diffs| get average ranks; W+ / W- / W. Ranks are
  derived from the VALUE HISTOGRAM (<= 1000 distinct |d|), not a global
  sort — the 100 TB shape: per-tile counts -> tiny driver table ->
  closed-form average ranks (below + (tot+1)/2, exact halves).
- TwoSampleKsTest (two_sample_ks_test.rs): D = max |ecdf1-ecdf2| over the
  merged support, computed as integer max of |c1*n2 - c2*n1| then ONE
  division — bit-exact.
- ImageRegression (image_regression.rs:378-384): slope / intercept / r²
  from (n, Sx, Sy, Sxy, Sxx, Syy).
- PrincipalComponentAnalysis (math_stat_analysis/
  principal_component_analysis.rs) for the 2-band case: covariance from
  integer moments, closed-form symmetric-2x2 eigenvalues
  lam = t/2 +- sqrt((t/2)^2 - det), explained-variance percentages.
- RescaleValueRange (rescale_value_range.rs): two-pass — distributed
  integer min/max, then the per-cell linear map.
- RandomSample (random_sample.rs) deterministic analog: splitmix64(cell)
  threshold keeps ~1% of cells; the oracle re-derives the same hash in SQL
  (sqlgen.sm64). Covers random_field.rs's "deterministic pseudo-random per
  cell" primitive too (the spatially-correlated variant needs a
  convolution, out of scope here).

Architecture: every per-cell op is an embarrassingly-parallel map_batches
over tile rows (zero shuffles); the tests are partial-aggregate +
broadcast-scalar two-pass pipelines — both shapes hold unchanged at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..stages.raster import synth_raster_tiles
from .queries import query
from .sqlgen import sm64

_N = GRID1.rows * GRID1.cols

_A_SQL = "(((t.i * 1000003) % 1001) - 500)"
_B_SQL = "(((t.i * 999983 + 17) % 1001) - 500)"

_CELLS = (f"cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id, "
          f"CAST({_A_SQL} AS DOUBLE) AS a, CAST({_B_SQL} AS DOUBLE) AS b "
          f"FROM range({_N}) t(i))")


def _a_fn(cells: np.ndarray) -> np.ndarray:
    return (((cells.astype(np.int64) * 1000003) % 1001) - 500).astype(np.float64)


def _b_of(cells: np.ndarray) -> np.ndarray:
    return (((cells.astype(np.int64) * 999983 + 17) % 1001) - 500).astype(np.float64)


def _cell_map(out_col: str, cell_fn, dtype=np.float64):
    tiles = synth_raster_tiles(GRID1, _a_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids, vals = [], []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            a = np.asarray(t.data, np.float64)
            v, keep = cell_fn(cells, a, _b_of(cells))
            if keep is not None:
                cells, v = cells[keep], v[keep]
            ids.append(cells)
            vals.append(v.astype(dtype))
        return pd.DataFrame({"cell_id": np.concatenate(ids),
                             out_col: np.concatenate(vals)})

    return tiles.map_batches(f, batch_format="pandas")


def _round_micro(v: np.ndarray) -> np.ndarray:
    """sign(v) * floor(|v| * 1e6 + 0.5) — half away from zero, micro-units."""
    return np.where(v >= 0, np.floor(v * 1e6 + 0.5),
                    -np.floor(-v * 1e6 + 0.5)).astype(np.int64)


def _sql_micro(expr: str) -> str:
    return (f"CAST(CASE WHEN ({expr}) >= 0 THEN floor(({expr}) * 1e6 + 0.5) "
            f"ELSE -floor(-({expr}) * 1e6 + 0.5) END AS BIGINT) AS v")


# registry of (name, numpy_fn(a, b), sql_expr over columns a/b) — the numpy
# fn and SQL expr evaluate the same mathematical function; micro-rounding
# absorbs the <=3-ulp libm disagreement (module docstring).
_TRIG = [
    ("math_sin", lambda a, b: np.sin(a), "sin(a)"),
    ("math_cos", lambda a, b: np.cos(a), "cos(a)"),
    ("math_tan", lambda a, b: np.tan(a), "tan(a)"),
    ("math_arcsin", lambda a, b: np.arcsin(a / 512.0), "asin(a / 512.0)"),
    ("math_arccos", lambda a, b: np.arccos(a / 512.0), "acos(a / 512.0)"),
    ("math_arctan", lambda a, b: np.arctan(a), "atan(a)"),
    ("math_atan2", lambda a, b: np.arctan2(a, b), "atan2(a, b)"),
    ("math_exp", lambda a, b: np.exp(a / 128.0), "exp(a / 128.0)"),
    ("math_exp2", lambda a, b: np.exp2(a / 128.0), "pow(2.0, a / 128.0)"),
    ("math_ln", lambda a, b: np.log(a + 501.0), "ln(a + 501.0)"),
    ("math_log10", lambda a, b: np.log10(a + 501.0), "log10(a + 501.0)"),
    ("math_log2", lambda a, b: np.log2(a + 501.0), "log2(a + 501.0)"),
    # hyperbolics via the explicit exp/ln trees (DuckDB has no hyperbolics;
    # both sides evaluate the SAME formula)
    ("math_sinh", lambda a, b: (np.exp(a / 128.0) - np.exp(-(a / 128.0))) / 2.0,
     "(exp(a / 128.0) - exp(-(a / 128.0))) / 2.0"),
    ("math_cosh", lambda a, b: (np.exp(a / 128.0) + np.exp(-(a / 128.0))) / 2.0,
     "(exp(a / 128.0) + exp(-(a / 128.0))) / 2.0"),
    ("math_tanh", lambda a, b: (np.exp(a / 128.0) - np.exp(-(a / 128.0)))
     / (np.exp(a / 128.0) + np.exp(-(a / 128.0))),
     "(exp(a / 128.0) - exp(-(a / 128.0))) / (exp(a / 128.0) + exp(-(a / 128.0)))"),
    ("math_arsinh",
     lambda a, b: np.log(a / 128.0 + np.sqrt((a / 128.0) * (a / 128.0) + 1.0)),
     "ln(a / 128.0 + sqrt((a / 128.0) * (a / 128.0) + 1.0))"),
    ("math_arcosh",
     lambda a, b: np.log((a + 501.0) + np.sqrt((a + 501.0) * (a + 501.0) - 1.0)),
     "ln((a + 501.0) + sqrt((a + 501.0) * (a + 501.0) - 1.0))"),
    ("math_artanh",
     lambda a, b: 0.5 * np.log((1.0 + a / 512.0) / (1.0 - a / 512.0)),
     "0.5 * ln((1.0 + a / 512.0) / (1.0 - a / 512.0))"),
]


def _mk_trig(name: str, fn, expr: str):
    sql = f"WITH {_CELLS} SELECT cell_id, {_sql_micro(expr)} FROM cells"

    @query(name, sql)
    def _impl(sf_dir: str, _fn=fn):
        return _cell_map("v", lambda c, a, b: (_round_micro(_fn(a, b)), None),
                         np.int64)

    return _impl


for _name, _fn, _expr in _TRIG:
    _mk_trig(_name, _fn, _expr)


def _suff_stats():
    """One distributed pass -> integer (n, Sa, Sb, Saa, Sbb, Sab, Sd, Sdd,
    min_a, max_a). Exact in any combine order (|a|,|b| <= 500, n = 61,200)."""
    tiles = synth_raster_tiles(GRID1, _a_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(8, np.int64)
        mn, mx = np.int64(1 << 60), np.int64(-(1 << 60))
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            a = np.asarray(t.data, np.float64).astype(np.int64)
            b = _b_of(cells).astype(np.int64)
            d = a - b
            acc += np.array([a.size, a.sum(), b.sum(), (a * a).sum(),
                             (b * b).sum(), (a * b).sum(), d.sum(),
                             (d * d).sum()], np.int64)
            mn, mx = min(mn, a.min()), max(mx, a.max())
        return pd.DataFrame({"n": [acc[0]], "sa": [acc[1]], "sb": [acc[2]],
                             "saa": [acc[3]], "sbb": [acc[4]], "sab": [acc[5]],
                             "sd": [acc[6]], "sdd": [acc[7]],
                             "mna": [mn], "mxa": [mx]})

    s = tiles.map_batches(partial, batch_format="pandas").to_pandas()
    return {k: int(s[k].sum()) for k in
            ("n", "sa", "sb", "saa", "sbb", "sab", "sd", "sdd")} | {
        "mna": int(s["mna"].min()), "mxa": int(s["mxa"].max())}


_STATS_SQL = (f"st AS (SELECT COUNT(*) AS n, CAST(SUM(a) AS BIGINT) AS sa, "
              f"CAST(SUM(b) AS BIGINT) AS sb, CAST(SUM(a*a) AS BIGINT) AS saa, "
              f"CAST(SUM(b*b) AS BIGINT) AS sbb, CAST(SUM(a*b) AS BIGINT) AS sab, "
              f"CAST(SUM(a-b) AS BIGINT) AS sd, "
              f"CAST(SUM((a-b)*(a-b)) AS BIGINT) AS sdd, "
              f"CAST(MIN(a) AS BIGINT) AS mna, CAST(MAX(a) AS BIGINT) AS mxa "
              f"FROM cells)")


@query(
    "math_paired_t_test",
    f"""
    WITH {_CELLS}, {_STATS_SQL}
    SELECT (CAST(sd AS DOUBLE) / n) /
           (sqrt(CAST(sdd AS DOUBLE) / n
                 - (CAST(sd AS DOUBLE) / n) * (CAST(sd AS DOUBLE) / n))
            / sqrt(CAST(n AS DOUBLE))) AS t_stat,
           n AS n
    FROM st
    """,
)
def math_paired_t_test(sf_dir: str):
    """PairedSampleTTest (paired_sample_t_test.rs:338-383): diffs d = a - b,
    population variance, t = mean / (sd / sqrt(n)). One distributed integer
    pass; the scalar finish is the identical expression tree on both sides."""
    s = _suff_stats()
    n = np.float64(s["n"])
    mean = np.int64(s["sd"]) / n
    sd = np.sqrt(np.int64(s["sdd"]) / n - mean * mean)
    t = mean / (sd / np.sqrt(n))
    return pd.DataFrame({"t_stat": [t], "n": [s["n"]]})


@query(
    "math_image_regression",
    f"""
    WITH {_CELLS}, {_STATS_SQL}
    SELECT (n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb)
           / (n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa) AS slope,
           (CAST(sb AS DOUBLE)
            - ((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb)
               / (n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa)) * sa)
           / n AS intercept,
           ((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb)
            / (sqrt(n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa)
               * sqrt(n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb)))
           * ((n * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * sb)
              / (sqrt(n * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * sa)
                 * sqrt(n * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * sb)))
           AS r_sqr
    FROM st
    """,
)
def math_image_regression(sf_dir: str):
    """ImageRegression (image_regression.rs:378-384): y = slope*x +
    intercept via least squares on (n, Sx, Sy, Sxy, Sxx, Syy); r² = r*r with
    r = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx²) * sqrt(n*Syy - Sy²))."""
    s = _suff_stats()
    n = np.float64(s["n"])
    sa, sb = np.float64(s["sa"]), np.float64(s["sb"])
    num = n * np.float64(s["sab"]) - sa * sb
    slope = num / (n * np.float64(s["saa"]) - sa * sa)
    intercept = (sb - slope * sa) / n
    r = num / (np.sqrt(n * np.float64(s["saa"]) - sa * sa)
               * np.sqrt(n * np.float64(s["sbb"]) - sb * sb))
    return pd.DataFrame({"slope": [slope], "intercept": [intercept],
                         "r_sqr": [r * r]})


@query(
    "math_pca_2band",
    f"""
    WITH {_CELLS}, {_STATS_SQL},
    c AS (SELECT CAST(saa AS DOUBLE) / n
                 - (CAST(sa AS DOUBLE) / n) * (CAST(sa AS DOUBLE) / n) AS cxx,
                 CAST(sbb AS DOUBLE) / n
                 - (CAST(sb AS DOUBLE) / n) * (CAST(sb AS DOUBLE) / n) AS cyy,
                 CAST(sab AS DOUBLE) / n
                 - (CAST(sa AS DOUBLE) / n) * (CAST(sb AS DOUBLE) / n) AS cxy
          FROM st)
    SELECT (cxx + cyy) / 2.0 + sqrt(((cxx - cyy) / 2.0) * ((cxx - cyy) / 2.0)
                                    + cxy * cxy) AS lambda1,
           (cxx + cyy) / 2.0 - sqrt(((cxx - cyy) / 2.0) * ((cxx - cyy) / 2.0)
                                    + cxy * cxy) AS lambda2,
           ((cxx + cyy) / 2.0 + sqrt(((cxx - cyy) / 2.0) * ((cxx - cyy) / 2.0)
                                     + cxy * cxy)) / (cxx + cyy) * 100.0
           AS pct_var1
    FROM c
    """,
)
def math_pca_2band(sf_dir: str):
    """PrincipalComponentAnalysis (math_stat_analysis/
    principal_component_analysis.rs) for the 2-band stack: population
    covariance matrix from one integer pass, symmetric-2x2 eigenvalues in
    closed form (lam = t/2 ± sqrt((t/2)² - det) written as the stable
    half-trace ± sqrt(quarter-diff² + cxy²) tree), percent explained
    variance. The n-band case runs the same one-pass cross-moment
    aggregation with an O(bands²) driver-side eigensolve."""
    s = _suff_stats()
    n = np.float64(s["n"])
    ma, mb = np.float64(s["sa"]) / n, np.float64(s["sb"]) / n
    cxx = np.float64(s["saa"]) / n - ma * ma
    cyy = np.float64(s["sbb"]) / n - mb * mb
    cxy = np.float64(s["sab"]) / n - ma * mb
    half, rad = (cxx + cyy) / 2.0, np.sqrt(((cxx - cyy) / 2.0) ** 2 + cxy * cxy)
    return pd.DataFrame({"lambda1": [half + rad], "lambda2": [half - rad],
                         "pct_var1": [(half + rad) / (cxx + cyy) * 100.0]})


@query(
    "math_rescale_value_range",
    f"""
    WITH {_CELLS}, {_STATS_SQL}
    SELECT c.cell_id,
           100.0 + (c.a - st.mna) * (1000.0 - 100.0)
                   / (CAST(st.mxa AS DOUBLE) - st.mna) AS v
    FROM cells c, st
    """,
)
def math_rescale_value_range(sf_dir: str):
    """RescaleValueRange (math_stat_analysis/rescale_value_range.rs:
    out = new_min + (z - min) * (new_max - new_min) / (max - min), here
    [100, 1000]). Two-pass: distributed integer min/max, broadcast scalars
    into the per-tile map. Integer inputs + one shared expression tree =
    bit-exact floats."""
    s = _suff_stats()
    mna = np.float64(s["mna"])
    span = np.float64(s["mxa"]) - mna

    def fn(c, a, b):
        return 100.0 + (a - mna) * np.float64(900.0) / span, None

    return _cell_map("v", fn, np.float64)


@query(
    "math_wilcoxon_signed_rank",
    f"""
    WITH {_CELLS},
    dd AS (SELECT CAST(a - b AS BIGINT) AS d FROM cells WHERE a <> b),
    h AS (SELECT ABS(d) AS ad, CASE WHEN d > 0 THEN 1 ELSE -1 END AS s,
                 COUNT(*) AS c FROM dd GROUP BY 1, 2),
    g AS (SELECT ad, SUM(c) AS tot FROM h GROUP BY ad),
    cum AS (SELECT ad, tot,
                   SUM(tot) OVER (ORDER BY ad
                                  ROWS UNBOUNDED PRECEDING) - tot AS below
            FROM g),
    r AS (SELECT h.ad, h.s, h.c,
                 cum.below + (cum.tot + 1) / 2.0 AS ar
          FROM h JOIN cum USING (ad))
    SELECT CAST(SUM(CASE WHEN s > 0 THEN c * ar ELSE 0 END) AS DOUBLE) AS w_pos,
           CAST(SUM(CASE WHEN s < 0 THEN c * ar ELSE 0 END) AS DOUBLE) AS w_neg,
           CAST(SUM(CASE WHEN s > 0 THEN c ELSE 0 END)
                + SUM(CASE WHEN s < 0 THEN c ELSE 0 END) AS BIGINT) AS nr
    FROM r
    """,
)
def math_wilcoxon_signed_rank(sf_dir: str):
    """WilcoxonSignedRankTest (wilcoxon_signed_rank_test.rs:382-423): zero
    differences excluded; tied |d| share the average rank. Scale shape: the
    global sort is replaced by a VALUE-HISTOGRAM rank derivation — per-tile
    (|d|, sign) counts (<= 2000 distinct groups regardless of raster size)
    -> driver-side cumulative counts -> average rank = below + (tot+1)/2
    (exact halves; products and sums < 2^53 stay exact)."""
    tiles = synth_raster_tiles(GRID1, _a_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            d = (np.asarray(t.data, np.float64).astype(np.int64)
                 - _b_of(cells).astype(np.int64))
            d = d[d != 0]
            ks.append(np.abs(d) * 2 + (np.sign(d) > 0))
        uk, cnt = np.unique(np.concatenate(ks) if ks
                            else np.empty(0, np.int64), return_counts=True)
        return pd.DataFrame({"key": uk.astype(np.int64),
                             "c": cnt.astype(np.int64)})

    from ..relational import partial_agg

    h = partial_agg(tiles.map_batches(partial, batch_format="pandas"),
                    ["key"], [("c", "sum", "c")]).to_pandas()
    key = h["key"].to_numpy(np.int64)
    cnt = h["c"].to_numpy(np.int64)
    ad, pos = key // 2, (key % 2) == 1
    order = np.argsort(ad, kind="stable")
    ad, pos, cnt = ad[order], pos[order], cnt[order]
    uv, inv = np.unique(ad, return_inverse=True)
    tot = np.zeros(uv.size, np.int64)
    np.add.at(tot, inv, cnt)
    below = np.concatenate([[0], np.cumsum(tot)[:-1]])
    ar = below[inv] + (tot[inv] + 1) / 2.0
    w_pos = float(np.sum(np.where(pos, cnt * ar, 0.0)))
    w_neg = float(np.sum(np.where(~pos, cnt * ar, 0.0)))
    return pd.DataFrame({"w_pos": [w_pos], "w_neg": [w_neg],
                         "nr": [int(cnt.sum())]})


@query(
    "math_two_sample_ks",
    f"""
    WITH {_CELLS},
    h1 AS (SELECT CAST(a AS BIGINT) AS v, COUNT(*) AS c FROM cells GROUP BY 1),
    h2 AS (SELECT CAST(b AS BIGINT) AS v, COUNT(*) AS c FROM cells GROUP BY 1),
    sup AS (SELECT v FROM h1 UNION SELECT v FROM h2),
    e AS (SELECT s.v,
                 (SELECT COALESCE(SUM(c), 0) FROM h1 WHERE h1.v <= s.v) AS c1,
                 (SELECT COALESCE(SUM(c), 0) FROM h2 WHERE h2.v <= s.v) AS c2
          FROM sup s),
    n AS (SELECT (SELECT SUM(c) FROM h1) AS n1, (SELECT SUM(c) FROM h2) AS n2)
    SELECT CAST(MAX(ABS(e.c1 * n.n2 - e.c2 * n.n1)) AS DOUBLE)
           / (CAST(n.n1 AS DOUBLE) * n.n2) AS d_stat,
           CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2
    FROM e, n GROUP BY n.n1, n.n2
    """,
)
def math_two_sample_ks(sf_dir: str):
    """TwoSampleKsTest (math_stat_analysis/two_sample_ks_test.rs): D =
    max_v |ECDF1(v) - ECDF2(v)|. Same histogram shape as Wilcoxon: per-tile
    value counts -> tiny driver table; D computed as the INTEGER max of
    |c1*n2 - c2*n1| divided once — bit-exact."""
    tiles = synth_raster_tiles(GRID1, _a_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            a = np.asarray(t.data, np.float64).astype(np.int64)
            b = _b_of(cells).astype(np.int64)
            # packed (v, which) key: v*2 + which, vectorized per tile
            keys.append(a * 2)
            keys.append(b * 2 + 1)
        uk, cnt = np.unique(np.concatenate(keys) if keys
                            else np.empty(0, np.int64), return_counts=True)
        return pd.DataFrame({"v": (uk >> 1).astype(np.int64),
                             "which": (uk & 1).astype(np.int64),
                             "c": cnt.astype(np.int64)})

    from ..relational import partial_agg

    h = partial_agg(tiles.map_batches(partial, batch_format="pandas"),
                    ["v", "which"], [("c", "sum", "c")]).to_pandas()
    v = h["v"].to_numpy(np.int64)
    which = h["which"].to_numpy(np.int64)
    cnt = h["c"].to_numpy(np.int64)
    sup = np.unique(v)
    c1 = np.zeros(sup.size, np.int64)
    c2 = np.zeros(sup.size, np.int64)
    idx = np.searchsorted(sup, v)
    np.add.at(c1, idx[which == 0], cnt[which == 0])
    np.add.at(c2, idx[which == 1], cnt[which == 1])
    cc1, cc2 = np.cumsum(c1), np.cumsum(c2)
    n1, n2 = int(cc1[-1]), int(cc2[-1])
    num = int(np.max(np.abs(cc1 * n2 - cc2 * n1)))
    return pd.DataFrame({"d_stat": [np.float64(num) / (np.float64(n1) * n2)],
                         "n1": [n1], "n2": [n2]})


_SM_CELL = sm64("CAST(t.i AS UBIGINT)")


@query(
    "math_random_sample",
    f"""
    SELECT CAST(t.i AS BIGINT) AS cell_id,
           CAST({_A_SQL} AS BIGINT) AS v
    FROM range({_N}) t(i)
    WHERE {_SM_CELL} % 100 = 0
    """,
)
def math_random_sample(sf_dir: str):
    """RandomSample (math_stat_analysis/random_sample.rs) as a deterministic
    reproducible sample: keep cells where splitmix64(cell_id) % 100 == 0
    (~1%), emitting the band value — the shareable seed-stable analog of the
    reference's RNG draw (random_field.rs uses the same per-cell-random
    primitive). Embarrassingly parallel; the oracle re-derives the identical
    hash via sqlgen.sm64."""
    from ..sources.synthetic import splitmix64

    def fn(c, a, b):
        keep = (splitmix64(c.astype(np.uint64)) % np.uint64(100)
                == np.uint64(0))
        return a, keep

    return _cell_map("v", fn, np.int64)
