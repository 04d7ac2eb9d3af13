"""math_stat / image sweep #3: windowed image correlation, Crispness
Index, raster cumulative distribution, attribute scattergram, highpass
bilateral filter, vignetting correction.

Float contracts: the windowed correlation, crispness, CDF and vignetting
outputs are computed from INTEGER sufficient statistics and finished with
one shared IEEE expression tree (division / sqrt are correctly rounded, so
numpy and DuckDB agree bit-for-bit). The vignetting factor uses the
closed form cos(atan(x))^-4 = (1 + x^2)^2 — pure arithmetic, no libm.
The highpass bilateral output passes through exp (libm) and is emitted in
milli-units under the queries_image4 guard-band argument.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from ..relational import partial_agg
from ..sources.tables import read_table
from ..stages.raster import stencil_3x3, synth_raster_tiles, window_exchange
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols


def _w_fn(cells: np.ndarray) -> np.ndarray:
    """Second synthetic band (the established (cell*733)%1000 twin)."""
    return ((cells.astype(np.int64) * 733) % 1000).astype(np.float64)


# --------------------------------------------------------------------------
# ImageCorrelationNeighbourhoodAnalysis (math_stat_analysis/
# image_correlation_neighbourhood_analysis.rs): per-cell Pearson r between
# two bands over the clipped 5x5 window, from integer sufficient sums.
# Rows only where both windowed variances are positive.
# --------------------------------------------------------------------------
def _imgcorr_sql() -> str:
    arms = " UNION ALL ".join(
        f"SELECT a.cell_id, b.v AS v1, (b.cell_id * 733) % 1000 AS v2 "
        f"FROM cells a JOIN cells b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr in range(-2, 3) for dc in range(-2, 3))
    return f"""
    WITH {_CELLS_CTE},
    nb AS ({arms}),
    s AS (
      SELECT cell_id, COUNT(*) AS n, SUM(v1) AS s1, SUM(v2) AS s2,
             SUM(v1 * v1) AS s11, SUM(v2 * v2) AS s22, SUM(v1 * v2) AS s12
      FROM nb GROUP BY cell_id
    )
    SELECT cell_id,
           (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
           / sqrt((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                  * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n))
           AS r
    FROM s
    WHERE (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) > 0
      AND (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n) > 0
    """


@query("image_corr_neighbourhood", _imgcorr_sql())
def image_corr_neighbourhood(sf_dir: str):
    """One k=2 halo exchange; both bands are derived from the cell id, so
    the pair needs no second input read (at scale: a zipped two-band tile
    Dataset, same exchange)."""

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        k = 2
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        n = np.zeros((nr, nc), np.int64)
        s1 = np.zeros((nr, nc), np.int64)
        s2 = np.zeros((nr, nc), np.int64)
        s11 = np.zeros((nr, nc), np.int64)
        s22 = np.zeros((nr, nc), np.int64)
        s12 = np.zeros((nr, nc), np.int64)
        for dr in range(-2, 3):
            for dc in range(-2, 3):
                w = padded[k + dr:k + dr + nr, k + dc:k + dc + nc]
                ok = ~np.isnan(w)
                v1 = np.where(ok, w, 0.0).astype(np.int64)
                rn = rr + dr
                cn = cc + dc
                v2 = np.where(ok, (rn.astype(np.int64) * _COLS
                                   + cn.astype(np.int64)) * 733 % 1000, 0)
                n += ok.astype(np.int64)
                s1 += v1
                s2 += v2
                s11 += v1 * v1
                s22 += v2 * v2
                s12 += v1 * v2
        nf = n.astype(np.float64)
        var1 = s11.astype(np.float64) - s1.astype(np.float64) \
            * s1.astype(np.float64) / nf
        var2 = s22.astype(np.float64) - s2.astype(np.float64) \
            * s2.astype(np.float64) / nf
        cov = s12.astype(np.float64) - s1.astype(np.float64) \
            * s2.astype(np.float64) / nf
        keep = (var1 > 0) & (var2 > 0)
        with np.errstate(invalid="ignore"):
            r = cov / np.sqrt(var1 * var2)
        cid = rr.astype(np.int64) * _COLS + cc.astype(np.int64)
        return pd.DataFrame({"cell_id": cid[keep].ravel(),
                             "r": r[keep].ravel()})

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=2)


# --------------------------------------------------------------------------
# CrispnessIndex (math_stat_analysis/crispness_index.rs:271-326): for the
# membership image p = v/999: C = SS_mp / SS_B, SS_mp = sum (p - pbar)^2,
# SS_B = sum_p (1 - pbar)^2 + (N - sum_p) pbar^2 — a single row finished
# from the distributed integer sums (sum v, sum v^2).
# --------------------------------------------------------------------------
@query(
    "crispness_index",
    f"""
    WITH {_CELLS_CTE},
    m AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sv,
                 CAST(SUM(v * v) AS DOUBLE) AS svv FROM cells)
    SELECT ((svv - sv * sv / n) / (999.0 * 999.0))
           / ((sv / 999.0) * (1.0 - sv / 999.0 / n) * (1.0 - sv / 999.0 / n)
              + (n - sv / 999.0) * (sv / 999.0 / n) * (sv / 999.0 / n))
           AS crispness
    FROM m
    """,
)
def crispness_index(sf_dir: str):
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df.itertuples():
            v = np.asarray(t.data, np.int64)
            out.append({"k": 0, "n": len(v), "sv": int(v.sum()),
                        "svv": int((v * v).sum())})
        return pd.DataFrame(out)

    agg = partial_agg(tiles.map_batches(sums, batch_format="pandas"),
                      ["k"], [("n", "sum", "n"), ("sv", "sum", "sv"),
                              ("svv", "sum", "svv")])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64).astype(np.float64)
        sv = df["sv"].to_numpy(np.int64).astype(np.float64)
        svv = df["svv"].to_numpy(np.int64).astype(np.float64)
        ss_mp = (svv - sv * sv / n) / (999.0 * 999.0)
        sp = sv / 999.0
        pbar = sv / 999.0 / n
        ss_b = sp * (1.0 - pbar) * (1.0 - pbar) + (n - sp) * pbar * pbar
        return pd.DataFrame({"crispness": ss_mp / ss_b})

    return agg.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# CumulativeDistribution (math_stat_analysis/cumulative_dist.rs): per cell
# the cumulative proportion of its 100-bin histogram class — global integer
# min/max + histogram (partial-merge), broadcast CDF, vectorized remap.
# --------------------------------------------------------------------------
@query(
    "cumulative_dist_raster",
    f"""
    WITH {_CELLS_CTE},
    mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n FROM cells),
    binned AS (
      SELECT c.cell_id,
             least(CAST(FLOOR(CAST(c.v - m.lo AS DOUBLE)
                         / (CAST(m.hi - m.lo AS DOUBLE) / 100.0)) AS BIGINT),
                   99) AS bin
      FROM cells c, mm m
    ),
    h AS (SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY bin),
    cdf AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM h)
    SELECT b.cell_id, CAST(cdf.cum AS DOUBLE) / m.n AS cum_p
    FROM binned b JOIN cdf ON cdf.bin = b.bin, mm m
    """,
)
def cumulative_dist_raster(sf_dir: str):
    import ray as _ray

    from ..stages.spatial_join import _cached_get

    tiles = synth_raster_tiles(GRID1, _value_fn).materialize()

    def mm(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df.itertuples():
            v = np.asarray(t.data, np.int64)
            out.append({"k": 0, "lo": int(v.min()), "hi": int(v.max()),
                        "n": len(v)})
        return pd.DataFrame(out)

    ext = partial_agg(tiles.map_batches(mm, batch_format="pandas"),
                      ["k"], [("lo", "min", "lo"), ("hi", "max", "hi"),
                              ("n", "sum", "n")]).to_pandas()
    lo, hi, n = (int(ext["lo"][0]), int(ext["hi"][0]), int(ext["n"][0]))
    bsz = (hi - lo) / 100.0

    def bins(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df.itertuples():
            v = np.asarray(t.data, np.int64)
            b = np.minimum(((v - lo).astype(np.float64) / bsz)
                           .astype(np.int64), 99)
            ub, cnt = np.unique(b, return_counts=True)
            out.append(pd.DataFrame({"bin": ub, "cnt": cnt.astype(np.int64)}))
        return pd.concat(out, ignore_index=True)

    h = partial_agg(tiles.map_batches(bins, batch_format="pandas"),
                    ["bin"], [("cnt", "sum", "cnt")]).to_pandas() \
        .sort_values("bin")
    cum = np.zeros(100, np.int64)
    cum[h["bin"].to_numpy(np.int64)] = h["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cum)
    ref = _ray.put(cum)

    def remap(df: pd.DataFrame) -> pd.DataFrame:
        cdf = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * _COLS + cc.ravel()
            v = np.asarray(t.data, np.int64)
            b = np.minimum(((v - lo).astype(np.float64) / bsz)
                           .astype(np.int64), 99)
            frames.append(pd.DataFrame({
                "cell_id": cid, "cum_p": cdf[b].astype(np.float64) / n}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(remap, batch_format="pandas")


# --------------------------------------------------------------------------
# AttributeScattergram (math_stat_analysis/attribute_scattergram.rs): the
# binned 2-D histogram of two lineitem attributes (the plot's data table).
# --------------------------------------------------------------------------
@query(
    "attribute_scattergram",
    """
    SELECT CAST(l_quantity AS BIGINT) AS qbin,
           CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS pbin,
           COUNT(*) AS n
    FROM lineitem GROUP BY qbin, pbin
    """,
)
def attribute_scattergram(sf_dir: str):
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_quantity", "l_extendedprice"])

    def bins(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "qbin": df["l_quantity"].to_numpy(np.float64).astype(np.int64),
            "pbin": np.floor(df["l_extendedprice"].to_numpy(np.float64)
                             / 5000.0).astype(np.int64),
            "n": np.ones(len(df), np.int64)})

    return partial_agg(ds.map_batches(bins, batch_format="pandas"),
                       ["qbin", "pbin"], [("n", "sum", "n")])


# --------------------------------------------------------------------------
# HighPassBilateralFilter (image_analysis/highpass_bilateral_filter.rs):
# z minus the 3x3 bilateral smoothing (same sigma contract as
# queries_image4.bilateral_filter), milli-unit guard band.
# --------------------------------------------------------------------------
_SIG_D, _SIG_I = 0.25, 50.0
_RECIP_D = 1.0 / (np.sqrt(2.0 * np.pi) * _SIG_D)
_RECIP_I = 1.0 / (np.sqrt(2.0 * np.pi) * _SIG_I)
_ALL9 = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


def _nb9_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS cv, b.v, ({dr}) AS dr, ({dc}) AS dc "
        f"FROM cells a JOIN cells b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr, dc in _ALL9)


@query(
    "highpass_bilateral_filter",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb9_sql()}),
    w AS (SELECT cell_id, cv, v,
                 ({_RECIP_I!r} * exp(-1.0 * ((v - cv) * (v - cv))
                  / {2.0 * _SIG_I * _SIG_I!r})
                  * {_RECIP_D!r} * exp(-1.0 * (dr * dr + dc * dc)
                  / {2.0 * _SIG_D * _SIG_D!r})) AS wt
          FROM nb),
    s AS (SELECT cell_id, SUM(wt) AS sw FROM w GROUP BY cell_id)
    SELECT w.cell_id,
           CAST(floor((ANY_VALUE(w.cv) - SUM(w.wt * w.v / s.sw)) * 1e3 + 0.5)
                AS BIGINT) AS hp_milli
    FROM w JOIN s ON s.cell_id = w.cell_id
    GROUP BY w.cell_id
    """,
)
def highpass_bilateral_filter(sf_dir: str):
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        ws, acc = np.zeros((nr, nc)), np.zeros((nr, nc))
        wlist = []
        for dr, dc in _ALL9:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            ok = ~np.isnan(w)
            wv = np.where(ok, w, 0.0)
            wt = (_RECIP_I * np.exp(-1.0 * ((wv - z) * (wv - z))
                                    / (2.0 * _SIG_I * _SIG_I))
                  * _RECIP_D * np.exp(-1.0 * (dr * dr + dc * dc)
                                      / (2.0 * _SIG_D * _SIG_D)))
            wt = np.where(ok, wt, 0.0)
            ws += wt
            wlist.append((wt, wv))
        for wt, wv in wlist:
            acc += wt * wv / ws
        return {"hp_milli": np.where(np.isnan(z), np.nan,
                                     np.floor((z - acc) * 1e3 + 0.5))}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "hp_milli": df["hp_milli"].astype(np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# CorrectVignetting (image_analysis/correct_vignetting.rs): out = z /
# cos(theta)^4, theta = atan(d / f) — closed form z * (1 + (d/f)^2)^2:
# pure arithmetic (no libm), bit-exact with the shared expression tree.
# --------------------------------------------------------------------------
_VIG_F = 300.0

@query(
    "correct_vignetting",
    f"""
    WITH {_CELLS_CTE}
    SELECT cell_id,
           CAST(v AS DOUBLE)
           * ((1.0 + ((((CAST(r AS DOUBLE) - 84.5)
                     * (CAST(r AS DOUBLE) - 84.5)
                     + (CAST(c AS DOUBLE) - 179.5)
                     * (CAST(c AS DOUBLE) - 179.5))
              / 90000.0)))
              * (1.0 + ((((CAST(r AS DOUBLE) - 84.5)
                     * (CAST(r AS DOUBLE) - 84.5)
                     + (CAST(c AS DOUBLE) - 179.5)
                     * (CAST(c AS DOUBLE) - 179.5))
              / 90000.0)))) AS corrected
    FROM cells
    """,
)
def correct_vignetting(sf_dir: str):
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def fix(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.float64),
                                 np.arange(c0, c0 + nc, dtype=np.float64),
                                 indexing="ij")
            cid = (rr.astype(np.int64) * _COLS + cc.astype(np.int64)).ravel()
            d2 = ((rr - (_ROWS - 1) / 2.0) * (rr - (_ROWS - 1) / 2.0)
                  + (cc - (_COLS - 1) / 2.0) * (cc - (_COLS - 1) / 2.0))
            x = d2 / (_VIG_F * _VIG_F)
            v = np.asarray(t.data, np.float64)
            frames.append(pd.DataFrame({
                "cell_id": cid,
                "corrected": v * ((1.0 + x) * (1.0 + x)).ravel()}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(fix, batch_format="pandas")
