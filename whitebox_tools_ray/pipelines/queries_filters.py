"""Image / terrain filter sweep on the halo-exchange stencil framework
(stages/raster.stencil_k): Laplacian, Emboss, Majority, Diversity,
DeviationFromMean, HighPass, 5x5 Gaussian, Zevenbergen–Thorne curvatures.

All over the deterministic synthetic raster v(cell) = (cell*1000003) % 1000
on GRID1, with DuckDB oracles built from per-offset equi-joins (same pattern
as queries_raster: a cross-join with arithmetic conditions defeats DuckDB's
hash-join planner). Integer contracts wherever the reference kernel is a
weighted sum; the curvature pair is float but uses identical arithmetic
expression order on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..stages.raster import stencil_3x3, stencil_k, synth_raster_tiles
from .queries import query
from ..rasterdefs import _CELLS_CTE, _value_fn


def _nb_union(offsets) -> str:
    return " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS cv, CAST({dr} AS BIGINT) AS dr, "
        f"CAST({dc} AS BIGINT) AS dc, b.v "
        f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr, dc in offsets
    )


_CROSS4 = [(-1, 0), (1, 0), (0, -1), (0, 1)]
_ALL9 = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


@query(
    "raster_laplacian",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_CROSS4)})
    SELECT cell_id, CAST(4 * MAX(cv) - SUM(v) AS BIGINT) AS lap
    FROM nb GROUP BY cell_id HAVING COUNT(*) = 4
    """,
)
def raster_laplacian(sf_dir: str):
    """LaplacianFilter (image_analysis/laplacian_filter.rs, 3x3 '4' variant):
    4*centre - (N+S+E+W), interior cells only — integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        n = padded[0:nr, 1:nc + 1]
        s = padded[2:nr + 2, 1:nc + 1]
        w = padded[1:nr + 1, 0:nc]
        e = padded[1:nr + 1, 2:nc + 2]
        lap = 4 * z - (n + s + w + e)
        return {"lap": lap}

    out = stencil_3x3(tiles, GRID1, kern)
    return out.map_batches(
        lambda df: df.loc[np.isfinite(df["lap"]), :].assign(
            cell_id=lambda d: d["cell_id"].astype(np.int64),
            lap=lambda d: d["lap"].astype(np.int64)),
        batch_format="pandas")


@query(
    "raster_emboss_n",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union([(-1, 0), (1, 0)])})
    SELECT c.cell_id,
           CAST(COALESCE(MAX(CASE WHEN nb.dr = 1 THEN nb.v END), c.v)
                - COALESCE(MAX(CASE WHEN nb.dr = -1 THEN nb.v END), c.v)
                AS BIGINT) AS emboss
    FROM cells c LEFT JOIN nb ON nb.cell_id = c.cell_id
    GROUP BY c.cell_id, c.v
    """,
)
def raster_emboss_n(sf_dir: str):
    """EmbossFilter direction 'n' (image_analysis/emboss_filter.rs:339-341):
    -1 at the north neighbour, +1 at the south; a missing (nodata/off-grid)
    neighbour substitutes the centre value (emboss_filter.rs:362-365)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        n = padded[0:nr, 1:nc + 1]
        s = padded[2:nr + 2, 1:nc + 1]
        n = np.where(np.isnan(n), z, n)
        s = np.where(np.isnan(s), z, s)
        return {"emboss": s - n}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "emboss": df["emboss"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_majority3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)}),
    cnts AS (
      SELECT cell_id, v, COUNT(*) AS n FROM nb GROUP BY cell_id, v
    )
    SELECT cell_id, CAST(v AS BIGINT) AS majority
    FROM cnts
    QUALIFY row_number() OVER (PARTITION BY cell_id ORDER BY n DESC, v ASC) = 1
    """,
)
def raster_majority3x3(sf_dir: str):
    """MajorityFilter (image_analysis/majority_filter.rs): modal value of the
    3x3 window (present cells only); ties resolve to the smallest value —
    deterministic at any parallelism."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        wins = np.stack([padded[dr:dr + nr, dc:dc + nc]
                         for dr in (0, 1, 2) for dc in (0, 1, 2)], axis=2)
        # count occurrences of each window value within its window
        cnt = np.zeros(wins.shape, np.int64)
        for j in range(9):
            cnt += (wins == wins[:, :, j:j + 1]).astype(np.int64)
        cnt = np.where(np.isnan(wins), -1, cnt)
        # max count, tie -> smallest value: score = cnt*1000000 - v
        score = cnt * 1_000_000 - np.where(np.isnan(wins), 0, wins)
        best = np.argmax(score, axis=2)
        ii, jj = np.meshgrid(np.arange(nr), np.arange(nc), indexing="ij")
        return {"majority": wins[ii, jj, best]}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "majority": df["majority"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_diversity3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)})
    SELECT cell_id, COUNT(DISTINCT v) AS diversity
    FROM nb GROUP BY cell_id
    """,
)
def raster_diversity3x3(sf_dir: str):
    """DiversityFilter (image_analysis/diversity_filter.rs): number of
    distinct values in the 3x3 window (present cells only)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        wins = np.stack([padded[dr:dr + nr, dc:dc + nc]
                         for dr in (0, 1, 2) for dc in (0, 1, 2)], axis=2)
        srt = np.sort(wins, axis=2)  # NaNs sort to the end
        valid = ~np.isnan(srt)
        firsts = valid[:, :, :1]
        news = valid[:, :, 1:] & (srt[:, :, 1:] != srt[:, :, :-1])
        return {"diversity": firsts.sum(axis=2) + news.sum(axis=2)}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "diversity": df["diversity"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_dev_scaled",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)})
    SELECT cell_id, CAST(MAX(cv) * COUNT(*) - SUM(v) AS BIGINT) AS dev_scaled,
           COUNT(*) AS n9
    FROM nb GROUP BY cell_id
    """,
)
def raster_dev_scaled(sf_dir: str):
    """DiffFromMeanElev / DevFromMeanElev (terrain_analysis/
    diff_from_mean_elev.rs, dev_from_mean_elev.rs - DEV adds the /sd
    factor, same sufficient statistics) with an
    integer contract: dev_scaled = v*n9 - sum9 (= n9 * (v - mean9)), exact
    in int64 — the float mean is left to the consumer."""
    from ..stages.raster import mean3x3_kernel

    tiles = synth_raster_tiles(GRID1, _value_fn)
    cells = stencil_3x3(tiles, GRID1, mean3x3_kernel)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].astype(np.int64)
        v = (cid.to_numpy() * 1000003) % 1000
        return pd.DataFrame({
            "cell_id": cid,
            "dev_scaled": v * df["n9"].astype(np.int64).to_numpy()
            - df["sum9"].astype(np.int64).to_numpy(),
            "n9": df["n9"].astype(np.int64)})

    return cells.map_batches(finish, batch_format="pandas")


@query(
    "raster_high_pass",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)})
    SELECT cell_id, CAST(9 * MAX(cv) - SUM(v) AS BIGINT) AS hp
    FROM nb GROUP BY cell_id HAVING COUNT(*) = 9
    """,
)
def raster_high_pass(sf_dir: str):
    """HighPassFilter (image_analysis/highpass_filter.rs): 9*centre -
    neighbourhood sum, interior cells only — integer-exact."""
    from ..stages.raster import mean3x3_kernel

    tiles = synth_raster_tiles(GRID1, _value_fn)
    cells = stencil_3x3(tiles, GRID1, mean3x3_kernel)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n9"] == 9]
        cid = df["cell_id"].astype(np.int64)
        v = (cid.to_numpy() * 1000003) % 1000
        return pd.DataFrame({
            "cell_id": cid,
            "hp": 9 * v - df["sum9"].astype(np.int64).to_numpy()})

    return cells.map_batches(finish, batch_format="pandas")


_G5_W = [1, 4, 6, 4, 1]
_G5_OFF = [(dr, dc, _G5_W[dr + 2] * _G5_W[dc + 2])
           for dr in (-2, -1, 0, 1, 2) for dc in (-2, -1, 0, 1, 2)]
_G5_UNION = " UNION ALL ".join(
    f"SELECT a.cell_id, CAST({w} AS BIGINT) AS w, b.v "
    f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
    for dr, dc, w in _G5_OFF
)


@query(
    "raster_gaussian5x5",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_G5_UNION})
    SELECT cell_id, CAST(SUM(w * v) AS BIGINT) AS gauss256
    FROM nb GROUP BY cell_id HAVING COUNT(*) = 25
    """,
)
def raster_gaussian5x5(sf_dir: str):
    """GaussianFilter (image_analysis/gaussian_filter.rs) as the classic
    integer 5x5 binomial kernel (outer([1,4,6,4,1]) / 256): weighted sum in
    int64 over a 2-cell halo exchange (stencil_k k=2), interior only."""
    tiles = synth_raster_tiles(GRID1, _value_fn)
    w5 = np.outer(_G5_W, _G5_W).astype(np.float64)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        acc = np.zeros((nr, nc))
        for dr in range(5):
            for dc in range(5):
                acc = acc + w5[dr, dc] * padded[dr:dr + nr, dc:dc + nc]
        return {"gauss256": acc}  # NaN where any of the 25 is missing

    out = stencil_k(tiles, GRID1, kern, k=2)
    return out.map_batches(
        lambda df: df.loc[np.isfinite(df["gauss256"]), :].assign(
            cell_id=lambda d: d["cell_id"].astype(np.int64),
            gauss256=lambda d: d["gauss256"].astype(np.int64)),
        batch_format="pandas")


@query(
    "raster_curvatures",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)}),
    z AS (
      SELECT cell_id,
        MAX(CASE WHEN dr = -1 AND dc = -1 THEN v END) AS z1,
        MAX(CASE WHEN dr = -1 AND dc = 0 THEN v END) AS z2,
        MAX(CASE WHEN dr = -1 AND dc = 1 THEN v END) AS z3,
        MAX(CASE WHEN dr = 0 AND dc = -1 THEN v END) AS z4,
        MAX(CASE WHEN dr = 0 AND dc = 0 THEN v END) AS z5,
        MAX(CASE WHEN dr = 0 AND dc = 1 THEN v END) AS z6,
        MAX(CASE WHEN dr = 1 AND dc = -1 THEN v END) AS z7,
        MAX(CASE WHEN dr = 1 AND dc = 0 THEN v END) AS z8,
        MAX(CASE WHEN dr = 1 AND dc = 1 THEN v END) AS z9
      FROM nb GROUP BY cell_id HAVING COUNT(*) = 9
    ),
    dd AS (
      SELECT cell_id,
        (z4 + z6) / 2.0 - z5 AS d,
        (z2 + z8) / 2.0 - z5 AS e,
        (-z1 + z3 + z7 - z9) / 4.0 AS f,
        (-z4 + z6) / 2.0 AS g,
        (z2 - z8) / 2.0 AS h
      FROM z
    )
    SELECT cell_id,
      CASE WHEN g * g + h * h = 0 THEN 0.0
           ELSE -2.0 * (d * g * g + e * h * h + f * g * h) / (g * g + h * h)
      END AS profile_curv,
      CASE WHEN g * g + h * h = 0 THEN 0.0
           ELSE 2.0 * (d * h * h + e * g * g - f * g * h) / (g * g + h * h)
      END AS plan_curv
    FROM dd
    """,
)
def raster_curvatures(sf_dir: str):
    """PlanCurvature + ProfileCurvature (terrain_analysis/plan_curvature.rs,
    prof_curvature.rs) via the Zevenbergen–Thorne quadric coefficients on a
    unit-cell grid; flat cells (G=H=0) emit 0. Interior cells only. The SQL
    oracle evaluates the identical expression tree, so float results are
    bit-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z1 = padded[0:nr, 0:nc]; z2 = padded[0:nr, 1:nc + 1]; z3 = padded[0:nr, 2:nc + 2]
        z4 = padded[1:nr + 1, 0:nc]; z5 = padded[1:nr + 1, 1:nc + 1]; z6 = padded[1:nr + 1, 2:nc + 2]
        z7 = padded[2:nr + 2, 0:nc]; z8 = padded[2:nr + 2, 1:nc + 1]; z9 = padded[2:nr + 2, 2:nc + 2]
        d = (z4 + z6) / 2.0 - z5
        e = (z2 + z8) / 2.0 - z5
        f = (-z1 + z3 + z7 - z9) / 4.0
        g = (-z4 + z6) / 2.0
        h = (z2 - z8) / 2.0
        denom = g * g + h * h
        with np.errstate(invalid="ignore", divide="ignore"):
            prof = np.where(denom == 0, 0.0,
                            -2.0 * (d * g * g + e * h * h + f * g * h) / denom)
            plan = np.where(denom == 0, 0.0,
                            2.0 * (d * h * h + e * g * g - f * g * h) / denom)
        interior = np.isfinite(z1 + z2 + z3 + z4 + z6 + z7 + z8 + z9)
        return {"profile_curv": np.where(interior, prof, np.nan),
                "plan_curv": np.where(interior, plan, np.nan)}

    out = stencil_3x3(tiles, GRID1, kern)
    return out.map_batches(
        lambda df: df.loc[np.isfinite(df["profile_curv"]), :].assign(
            cell_id=lambda d: d["cell_id"].astype(np.int64)),
        batch_format="pandas")


@query(
    "elev_percentile",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)})
    SELECT cell_id,
           CAST(SUM(CASE WHEN v < cv THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           COUNT(*) AS n9
    FROM nb GROUP BY cell_id
    """,
)
def elev_percentile(sf_dir: str):
    """ElevPercentile (terrain_analysis/elev_percentile.rs): rank of the
    centre among its 3x3 neighbourhood — integer contract (n_below, n9);
    the percentile n_below/n9*100 is left to consumers."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        centre = padded[1:nr + 1, 1:nc + 1]
        below = np.zeros((nr, nc), np.int64)
        n = np.zeros((nr, nc), np.int64)
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                w = padded[dr:dr + nr, dc:dc + nc]
                ok = ~np.isnan(w)
                below += (ok & (w < centre)).astype(np.int64)
                n += ok.astype(np.int64)
        return {"n_below": below, "n9": n}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "n_below": df["n_below"].astype(np.int64),
                                 "n9": df["n9"].astype(np.int64)}),
        batch_format="pandas")


_W11 = 5  # 11x11 window half-width
_M11_UNION = " UNION ALL ".join(
    f"SELECT a.cell_id, b.v FROM cells a JOIN cells b "
    f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
    for dr in range(-_W11, _W11 + 1) for dc in range(-_W11, _W11 + 1)
)


@query(
    "raster_mean11x11_fast",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_M11_UNION})
    SELECT cell_id, CAST(SUM(v) AS BIGINT) AS sum121, COUNT(*) AS n121
    FROM nb GROUP BY cell_id
    """,
)
def raster_mean11x11_fast(sf_dir: str):
    """FastAlmostGaussianFilter-style LARGE-window mean (image_analysis/
    fast_almost_gaussian_filter.rs uses repeated box blurs whose cost must
    not grow with window size): the 11x11 neighbourhood sum via a per-tile
    INTEGRAL IMAGE over the 5-cell halo — O(1) work per cell regardless of
    window, vs O(w^2) for the naive stencil. Integer-exact (NaN halo
    contributes zero; count tracked the same way)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        w = _W11
        vals = np.nan_to_num(padded, nan=0.0)
        cnts = (~np.isnan(padded)).astype(np.float64)
        # integral images with a zero top/left border
        iv = np.zeros((padded.shape[0] + 1, padded.shape[1] + 1))
        ic = np.zeros_like(iv)
        iv[1:, 1:] = vals.cumsum(axis=0).cumsum(axis=1)
        ic[1:, 1:] = cnts.cumsum(axis=0).cumsum(axis=1)

        def window(ii):
            # cell (r, c) of the tile sits at padded[r+w, c+w]; its window
            # spans padded rows [r, r+2w] inclusive
            a = ii[2 * w + 1:2 * w + 1 + nr, 2 * w + 1:2 * w + 1 + nc]
            b = ii[0:nr, 2 * w + 1:2 * w + 1 + nc]
            c = ii[2 * w + 1:2 * w + 1 + nr, 0:nc]
            d = ii[0:nr, 0:nc]
            return a - b - c + d

        return {"sum121": window(iv), "n121": window(ic)}

    return stencil_k(tiles, GRID1, kern, k=_W11).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "sum121": np.rint(df["sum121"]).astype(np.int64),
                                 "n121": np.rint(df["n121"]).astype(np.int64)}),
        batch_format="pandas")
