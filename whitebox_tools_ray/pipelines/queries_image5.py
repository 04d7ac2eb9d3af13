"""Image/stat sweep #5: MosaicWithFeathering, GaussianContrastStretch,
KsTestForNormality.

Float contracts: feathering weights are integer edge distances with one
shared division tree — bit-exact. The Gaussian stretch maps histogram
midpoint-percentiles through the Acklam inverse-normal rational
approximation and the KS test evaluates the A&S 7.1.26 erf series — both
share every coefficient and branch between numpy and DuckDB; ln/exp pass
through libm, so those two emit micro-unit integers (guard band).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from ..relational import partial_agg
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols


# --------------------------------------------------------------------------
# MosaicWithFeathering (image_analysis/mosaic_with_feathering.rs): in the
# overlap, out = (vA*dA + vB*dB)/(dA + dB) with d = distance to the
# respective image edge (+1). Image A = the full GRID1 raster; image B =
# the (cell*733)%1000 band over rows 40..119, cols 80..259.
# --------------------------------------------------------------------------
_B_R0, _B_R1, _B_C0, _B_C1 = 40, 119, 80, 259


@query(
    "mosaic_with_feathering",
    f"""
    WITH {_CELLS_CTE}
    SELECT cell_id,
           CASE WHEN r BETWEEN {_B_R0} AND {_B_R1}
                 AND c BETWEEN {_B_C0} AND {_B_C1}
           THEN (CAST(v AS DOUBLE)
                 * (least(least(r, {_ROWS - 1} - r),
                          least(c, {_COLS - 1} - c)) + 1)
                 + CAST((cell_id * 733) % 1000 AS DOUBLE)
                 * (least(least(r - {_B_R0}, {_B_R1} - r),
                          least(c - {_B_C0}, {_B_C1} - c)) + 1))
                / ((least(least(r, {_ROWS - 1} - r),
                          least(c, {_COLS - 1} - c)) + 1)
                   + (least(least(r - {_B_R0}, {_B_R1} - r),
                            least(c - {_B_C0}, {_B_C1} - c)) + 1))
           ELSE CAST(v AS DOUBLE) END AS mosaic
    FROM cells
    """,
)
def mosaic_with_feathering(sf_dir: str):
    from ..stages.raster import synth_raster_tiles

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def feather(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr * _COLS + cc
            v = np.asarray(t.data, np.float64).reshape(nr, nc)
            w = ((cid * 733) % 1000).astype(np.float64)
            inb = (rr >= _B_R0) & (rr <= _B_R1) & (cc >= _B_C0) & (cc <= _B_C1)
            da = (np.minimum(np.minimum(rr, _ROWS - 1 - rr),
                             np.minimum(cc, _COLS - 1 - cc)) + 1) \
                .astype(np.float64)
            db = (np.minimum(np.minimum(rr - _B_R0, _B_R1 - rr),
                             np.minimum(cc - _B_C0, _B_C1 - cc)) + 1) \
                .astype(np.float64)
            out = np.where(inb, (v * da + w * db) / (da + db), v)
            frames.append(pd.DataFrame({"cell_id": cid.ravel(),
                                        "mosaic": out.ravel()}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(feather, batch_format="pandas")


# --------------------------------------------------------------------------
# GaussianContrastStretch (image_analysis/gaussian_contrast_stretch.rs):
# map each value's histogram midpoint percentile through the inverse
# normal CDF. Probit = Acklam's rational approximation (identical
# coefficients/branches in numpy and SQL; the tail branch passes through
# ln -> micro guard band).
# --------------------------------------------------------------------------
from ..rasterdefs import (_probit_np, _probit_sql)  # noqa: E402 (leaf)


@query(
    "gaussian_contrast_stretch",
    f"""
    WITH {_CELLS_CTE},
    h AS MATERIALIZED (SELECT v, COUNT(*) AS cnt FROM cells GROUP BY v),
    cdf AS MATERIALIZED (
      SELECT v, (CAST(SUM(cnt) OVER (ORDER BY v) AS DOUBLE)
                 - 0.5 * cnt) / {_ROWS * _COLS} AS p
      FROM h
    ),
    vmap AS MATERIALIZED (
      SELECT v, CAST(floor({_probit_sql('p')} * 1e6 + 0.5) AS BIGINT)
             AS gcs_micro
      FROM cdf
    )
    SELECT c.cell_id, m.gcs_micro
    FROM cells c JOIN vmap m ON m.v = c.v
    """,
)
def gaussian_contrast_stretch(sf_dir: str):
    import ray as _ray

    from ..stages.raster import synth_raster_tiles
    from ..stages.spatial_join import _cached_get

    tiles = synth_raster_tiles(GRID1, _value_fn).materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df.itertuples():
            vv, cnt = np.unique(np.asarray(t.data, np.int64),
                                return_counts=True)
            out.append(pd.DataFrame({"v": vv, "cnt": cnt.astype(np.int64)}))
        return pd.concat(out, ignore_index=True)

    h = partial_agg(tiles.map_batches(hist, batch_format="pandas"),
                    ["v"], [("cnt", "sum", "cnt")]).to_pandas() \
        .sort_values("v")
    cnt = np.zeros(1000, np.int64)
    cnt[h["v"].to_numpy(np.int64)] = h["cnt"].to_numpy(np.int64)
    cum = np.cumsum(cnt)
    n = _ROWS * _COLS
    p = (cum.astype(np.float64) - 0.5 * cnt) / n
    gcs = np.full(1000, np.iinfo(np.int64).min, np.int64)
    present = cnt > 0
    gcs[present] = np.floor(_probit_np(p[present]) * 1e6 + 0.5).astype(np.int64)
    ref = _ray.put(gcs)

    def remap(df: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * _COLS + cc.ravel()
            v = np.asarray(t.data, np.int64)
            frames.append(pd.DataFrame({"cell_id": cid,
                                        "gcs_micro": m[v]}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(remap, batch_format="pandas")


# --------------------------------------------------------------------------
# KsTestForNormality (math_stat_analysis/ks_normality_test.rs): D =
# max(|ecdf - Phi(z)|) over the value support, mean/sd from integer sums,
# Phi via the A&S 7.1.26 erf series (exp -> micro guard band).
# --------------------------------------------------------------------------
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_ERF_P = 0.3275911


def _phi_np(x: np.ndarray) -> np.ndarray:
    s = np.sign(x)
    ax = np.abs(x) / np.sqrt(2.0)
    t = 1.0 / (1.0 + _ERF_P * ax)
    a = _ERF_A
    y = 1.0 - (((((a[4] * t + a[3]) * t) + a[2]) * t + a[1]) * t + a[0]) \
        * t * np.exp(-ax * ax)
    return 0.5 * (1.0 + s * y)


def _phi_sql(x: str) -> str:
    a = _ERF_A
    ax = f"(abs({x}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {_ERF_P!r} * {ax}))"
    y = (f"(1.0 - ((((({a[4]!r} * {t} + {a[3]!r}) * {t}) + {a[2]!r}) * {t} "
         f"+ {a[1]!r}) * {t} + {a[0]!r}) * {t} * exp(-{ax} * {ax}))")
    return f"(0.5 * (1.0 + sign({x}) * {y}))"


@query(
    "ks_normality_test",
    f"""
    WITH {_CELLS_CTE},
    m AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS DOUBLE) AS sv,
                 CAST(SUM(v * v) AS DOUBLE) AS svv FROM cells),
    h AS (SELECT v, COUNT(*) AS cnt FROM cells GROUP BY v),
    cdf AS (
      SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum,
             SUM(cnt) OVER (ORDER BY v) - cnt AS below
      FROM h
    ),
    z AS (
      SELECT c.v, c.cum, c.below, m.n,
             (CAST(c.v AS DOUBLE) - m.sv / m.n)
             / sqrt((m.svv - m.sv * m.sv / m.n) / m.n) AS zz
      FROM cdf c, m
    ),
    dd AS (
      SELECT MAX(greatest(abs(CAST(cum AS DOUBLE) / n - {_phi_sql('zz')}),
                          abs(CAST(below AS DOUBLE) / n - {_phi_sql('zz')})))
             AS d
      FROM z
    )
    SELECT m.n, CAST(floor(dd.d * 1e6 + 0.5) AS BIGINT) AS d_micro
    FROM m, dd
    """,
)
def ks_normality_test(sf_dir: str):
    from ..stages.raster import synth_raster_tiles

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df.itertuples():
            v = np.asarray(t.data, np.int64)
            vv, cnt = np.unique(v, return_counts=True)
            d = pd.DataFrame({"v": vv, "cnt": cnt.astype(np.int64)})
            d["sv"] = d["v"] * d["cnt"]
            d["svv"] = d["v"] * d["v"] * d["cnt"]
            out.append(d)
        return pd.concat(out, ignore_index=True)

    h = partial_agg(tiles.map_batches(stats, batch_format="pandas"),
                    ["v"], [("cnt", "sum", "cnt"), ("sv", "sum", "sv"),
                            ("svv", "sum", "svv")]).to_pandas() \
        .sort_values("v")
    n = int(h["cnt"].sum())
    sv = float(h["sv"].sum())
    svv = float(h["svv"].sum())
    mean = sv / n
    sd = np.sqrt((svv - sv * sv / n) / n)
    cum = h["cnt"].cumsum().to_numpy(np.int64)
    below = cum - h["cnt"].to_numpy(np.int64)
    zz = (h["v"].to_numpy(np.int64).astype(np.float64) - mean) / sd
    phi = _phi_np(zz)
    d = np.maximum(np.abs(cum.astype(np.float64) / n - phi),
                   np.abs(below.astype(np.float64) / n - phi)).max()
    return pd.DataFrame({"n": [np.int64(n)],
                         "d_micro": [np.int64(np.floor(d * 1e6 + 0.5))]})
