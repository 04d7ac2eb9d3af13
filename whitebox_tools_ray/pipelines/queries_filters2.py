"""Round-3 filter / morphology / statistics sweep on the halo-exchange
stencil framework: Opening, Closing, Tophat, ConservativeSmoothing, Olympic,
Prewitt, Scharr, RobertsCross, LineDetection, ElevRelativeToMinMax,
RasterHistogram, KappaIndex, PCA components, Anova components,
FindLowestOrHighestPoints, BlockMaximum/BlockMinimum gridding,
AggregateRaster, EdgeProportion.

All integer-exact over the deterministic synthetic raster
v(cell) = (cell*1000003) % 1000 on GRID1, same per-offset equi-join oracle
pattern as queries_filters.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..layers import GRID1
from ..relational import partial_agg
from ..stages.raster import stencil_3x3, stencil_k, synth_raster_tiles
from .queries import query
from ..rasterdefs import _CELLS_CTE, _value_fn

_ALL9 = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
_RING8 = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)]


def _nb_union(offsets) -> str:
    return " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS cv, CAST({dr} AS BIGINT) AS dr, "
        f"CAST({dc} AS BIGINT) AS dc, b.v "
        f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr, dc in offsets
    )


# --------------------------------------------------------------------------
# Morphology: Opening / Closing / Tophat (two-level 3x3 min/max, k=2 halo)
# --------------------------------------------------------------------------

# second-level neighbourhood join over a per-cell aggregate CTE `agg(cell_id, m)`
_AGG_NB = " UNION ALL ".join(
    f"SELECT a.cell_id, b.m FROM cells a "
    f"JOIN aggrc b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
    for dr, dc in _ALL9
)


def _morph_sql(first: str, second: str, out: str) -> str:
    return f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)}),
    agg AS (SELECT cell_id, {first}(v) AS m FROM nb GROUP BY cell_id),
    aggrc AS (SELECT c.cell_id, c.r, c.c, g.m FROM cells c
              JOIN agg g ON g.cell_id = c.cell_id),
    nb2 AS ({_AGG_NB})
    SELECT cell_id, CAST({second}(m) AS BIGINT) AS {out}
    FROM nb2 GROUP BY cell_id
    """


def _stage1_kernel(padded: np.ndarray, nr: int, nc: int, fn) -> np.ndarray:
    """fn-over-3x3 for the inner (nr+2)x(nc+2) region of a k=2 padded array,
    masked to in-grid positions (NaN at off-grid positions so they never
    contribute to the second stage — matches the SQL's missing rows)."""
    m = np.full((nr + 2, nc + 2), np.nan)
    for dr in range(3):
        for dc in range(3):
            m = fn(m, padded[dr:dr + nr + 2, dc:dc + nc + 2])
    return np.where(np.isnan(padded[1:nr + 3, 1:nc + 3]), np.nan, m)


def _morph_kernel(padded: np.ndarray, nr: int, nc: int, first, second) -> np.ndarray:
    m = _stage1_kernel(padded, nr, nc, first)
    out = np.full((nr, nc), np.nan)
    for dr in range(3):
        for dc in range(3):
            out = second(out, m[dr:dr + nr, dc:dc + nc])
    return out


@query("raster_opening", _morph_sql("MIN", "MAX", "opening"))
def raster_opening(sf_dir: str):
    """Opening (image_analysis/opening.rs): grayscale erosion (3x3 min) then
    dilation (3x3 max) in ONE k=2 halo exchange — the eroded intermediate is
    computed for the 1-cell ring around each tile so no second shuffle is
    needed. Integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        return {"opening": _morph_kernel(padded, nr, nc, np.fmin, np.fmax)}

    return stencil_k(tiles, GRID1, kern, k=2).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "opening": df["opening"].astype(np.int64)}),
        batch_format="pandas")


@query("raster_closing", _morph_sql("MAX", "MIN", "closing"))
def raster_closing(sf_dir: str):
    """Closing (image_analysis/closing.rs): dilation then erosion, same
    single-exchange shape as raster_opening."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        return {"closing": _morph_kernel(padded, nr, nc, np.fmax, np.fmin)}

    return stencil_k(tiles, GRID1, kern, k=2).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "closing": df["closing"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_tophat",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)}),
    mn AS (SELECT cell_id, MIN(v) AS m FROM nb GROUP BY cell_id),
    mx AS (SELECT cell_id, MAX(v) AS m FROM nb GROUP BY cell_id),
    mnrc AS (SELECT c.cell_id, c.r, c.c, g.m FROM cells c JOIN mn g USING (cell_id)),
    mxrc AS (SELECT c.cell_id, c.r, c.c, g.m FROM cells c JOIN mx g USING (cell_id)),
    op AS (
      SELECT cell_id, MAX(m) AS opening FROM (
        {" UNION ALL ".join(f"SELECT a.cell_id, b.m FROM cells a JOIN mnrc b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})" for dr, dc in _ALL9)}
      ) GROUP BY cell_id
    ),
    cl AS (
      SELECT cell_id, MIN(m) AS closing FROM (
        {" UNION ALL ".join(f"SELECT a.cell_id, b.m FROM cells a JOIN mxrc b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})" for dr, dc in _ALL9)}
      ) GROUP BY cell_id
    )
    SELECT c.cell_id, CAST(c.v - op.opening AS BIGINT) AS white_tophat,
           CAST(cl.closing - c.v AS BIGINT) AS black_tophat
    FROM cells c JOIN op USING (cell_id) JOIN cl USING (cell_id)
    """,
)
def raster_tophat(sf_dir: str):
    """TophatTransform (image_analysis/tophat.rs): white tophat = v - opening,
    black tophat = closing - v, both variants in one k=2 exchange."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[2:nr + 2, 2:nc + 2]
        op = _morph_kernel(padded, nr, nc, np.fmin, np.fmax)
        cl = _morph_kernel(padded, nr, nc, np.fmax, np.fmin)
        return {"white_tophat": z - op, "black_tophat": cl - z}

    return stencil_k(tiles, GRID1, kern, k=2).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "white_tophat": df["white_tophat"].astype(np.int64),
                                 "black_tophat": df["black_tophat"].astype(np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# More 3x3 filters
# --------------------------------------------------------------------------

@query(
    "raster_conservative_smoothing",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_RING8)})
    SELECT cell_id,
           CAST(CASE WHEN MAX(cv) > MAX(v) THEN MAX(v)
                     WHEN MAX(cv) < MIN(v) THEN MIN(v)
                     ELSE MAX(cv) END AS BIGINT) AS smoothed
    FROM nb GROUP BY cell_id
    """,
)
def raster_conservative_smoothing(sf_dir: str):
    """ConservativeSmoothingFilter
    (image_analysis/conservative_smoothing_filter.rs): clamp the centre into [min, max] of its 8 neighbours
    (centre excluded) — integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        vmin = np.full((nr, nc), np.nan)
        vmax = np.full((nr, nc), np.nan)
        for dr, dc in _RING8:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            vmin = np.fmin(vmin, w)
            vmax = np.fmax(vmax, w)
        return {"smoothed": np.clip(z, vmin, vmax)}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "smoothed": df["smoothed"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_olympic",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)})
    SELECT cell_id, CAST(SUM(v) - MIN(v) - MAX(v) AS BIGINT) AS osum,
           COUNT(*) - 2 AS on_cnt
    FROM nb GROUP BY cell_id
    """,
)
def raster_olympic(sf_dir: str):
    """OlympicFilter (image_analysis/olympic_filter.rs): neighbourhood mean
    after dropping one min and one max — integer contract (osum, on_cnt);
    the float mean osum/on_cnt is left to consumers."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        s = np.zeros((nr, nc))
        n = np.zeros((nr, nc), np.int64)
        vmin = np.full((nr, nc), np.nan)
        vmax = np.full((nr, nc), np.nan)
        for dr, dc in _ALL9:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            ok = ~np.isnan(w)
            s += np.where(ok, w, 0.0)
            n += ok.astype(np.int64)
            vmin = np.fmin(vmin, w)
            vmax = np.fmax(vmax, w)
        return {"osum": s - vmin - vmax, "on_cnt": n - 2}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "osum": df["osum"].astype(np.int64),
                                 "on_cnt": df["on_cnt"].astype(np.int64)}),
        batch_format="pandas")


def _grad_sql(wx: dict, wy: dict) -> str:
    """Weighted-gradient oracle: wx/wy map (dr,dc) -> integer weight."""
    gx = " + ".join(
        f"{w} * MAX(CASE WHEN dr = {dr} AND dc = {dc} THEN v END)"
        for (dr, dc), w in wx.items())
    gy = " + ".join(
        f"{w} * MAX(CASE WHEN dr = {dr} AND dc = {dc} THEN v END)"
        for (dr, dc), w in wy.items())
    return f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)})
    SELECT cell_id, CAST({gx} AS BIGINT) AS gx, CAST({gy} AS BIGINT) AS gy
    FROM nb GROUP BY cell_id HAVING COUNT(*) = 9
    """


def _grad_query(wx: dict, wy: dict):
    """Interior-only integer gradient pair on the 3x3 stencil."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        gx = np.zeros((nr, nc))
        gy = np.zeros((nr, nc))
        full = np.ones((nr, nc), bool)
        for dr, dc in _ALL9:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            full &= ~np.isnan(w)
            gx += wx.get((dr, dc), 0) * np.nan_to_num(w)
            gy += wy.get((dr, dc), 0) * np.nan_to_num(w)
        return {"gx": np.where(full, gx, np.nan), "gy": np.where(full, gy, np.nan)}

    cells = stencil_3x3(tiles, GRID1, kern)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[np.isfinite(df["gx"]) & np.isfinite(df["gy"])]
        return pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                             "gx": df["gx"].astype(np.int64),
                             "gy": df["gy"].astype(np.int64)})

    return cells.map_batches(finish, batch_format="pandas")


_PREWITT_X = {(-1, 1): 1, (0, 1): 1, (1, 1): 1, (-1, -1): -1, (0, -1): -1, (1, -1): -1}
_PREWITT_Y = {(1, -1): 1, (1, 0): 1, (1, 1): 1, (-1, -1): -1, (-1, 0): -1, (-1, 1): -1}


@query("raster_prewitt", _grad_sql(_PREWITT_X, _PREWITT_Y))
def raster_prewitt(sf_dir: str):
    """PrewittFilter (image_analysis/prewitt_filter.rs): unweighted 3x3
    gradients, interior cells only — integer-exact."""
    return _grad_query(_PREWITT_X, _PREWITT_Y)


_SCHARR_X = {(-1, 1): 3, (0, 1): 10, (1, 1): 3, (-1, -1): -3, (0, -1): -10, (1, -1): -3}
_SCHARR_Y = {(1, -1): 3, (1, 0): 10, (1, 1): 3, (-1, -1): -3, (-1, 0): -10, (-1, 1): -3}


@query("raster_scharr", _grad_sql(_SCHARR_X, _SCHARR_Y))
def raster_scharr(sf_dir: str):
    """ScharrFilter (image_analysis/scharr_filter.rs): 3/10/3-weighted
    gradients, interior cells only — integer-exact."""
    return _grad_query(_SCHARR_X, _SCHARR_Y)


_ROBERTS_X = {(0, 0): 1, (1, 1): -1}
_ROBERTS_Y = {(0, 1): 1, (1, 0): -1}


@query("raster_roberts_cross", _grad_sql(_ROBERTS_X, _ROBERTS_Y))
def raster_roberts_cross(sf_dir: str):
    """RobertsCrossFilter (image_analysis/roberts_filter.rs): the 2x2
    diagonal-difference pair g1 = z(r,c) - z(r+1,c+1), g2 = z(r,c+1) -
    z(r+1,c). Interior-only contract shared with the other gradient filters
    (HAVING COUNT(*)=9 keeps the edge semantics identical across the
    family)."""
    return _grad_query(_ROBERTS_X, _ROBERTS_Y)


_LINE_H = {(-1, -1): -1, (-1, 0): -1, (-1, 1): -1,
           (0, -1): 2, (0, 0): 2, (0, 1): 2,
           (1, -1): -1, (1, 0): -1, (1, 1): -1}


@query(
    "raster_line_detection_h",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)})
    SELECT cell_id,
      CAST(SUM((CASE dr WHEN 0 THEN 2 ELSE -1 END) * v) AS BIGINT) AS lineh
    FROM nb GROUP BY cell_id HAVING COUNT(*) = 9
    """,
)
def raster_line_detection_h(sf_dir: str):
    """LineDetectionFilter 'horizontal' variant (image_analysis/
    line_detection_filter.rs): [[-1,-1,-1],[2,2,2],[-1,-1,-1]] — interior
    cells, integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        acc = np.zeros((nr, nc))
        full = np.ones((nr, nc), bool)
        for (dr, dc), w in _LINE_H.items():
            win = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            full &= ~np.isnan(win)
            acc += w * np.nan_to_num(win)
        return {"lineh": np.where(full, acc, np.nan)}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame(
            {"cell_id": df.loc[np.isfinite(df["lineh"]), "cell_id"].astype(np.int64),
             "lineh": df.loc[np.isfinite(df["lineh"]), "lineh"].astype(np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# Whole-raster statistics (broadcast / partial-merge patterns)
# --------------------------------------------------------------------------

@query(
    "elev_rel_minmax",
    f"""
    WITH {_CELLS_CTE},
    g AS (SELECT MIN(v) AS gmin, MAX(v) AS gmax FROM cells)
    SELECT c.cell_id, CAST(c.v - g.gmin AS BIGINT) AS above_min,
           CAST(g.gmax - g.gmin AS BIGINT) AS rel_range
    FROM cells c, g
    """,
)
def elev_rel_minmax(sf_dir: str):
    """ElevRelativeToMinMax (terrain_analysis/elev_relative_to_min_max.rs):
    per-cell elevation relative to the raster-wide min/max — the two-pass
    broadcast shape (tiny global aggregate -> ray.put -> vectorized map);
    integer contract (above_min, rel_range)."""
    import ray

    from ..stages.spatial_join import _cached_get

    tiles = synth_raster_tiles(GRID1, _value_fn)
    n = GRID1.rows * GRID1.cols
    # global min/max of the synthetic raster, computed distributed once
    gs = synth_raster_tiles(GRID1, _value_fn).map_batches(
        lambda df: pd.DataFrame(
            {"k": [0] * len(df),
             "mn": [np.asarray(d, np.int64).min() for d in df["data"]],
             "mx": [np.asarray(d, np.int64).max() for d in df["data"]]}),
        batch_format="pandas")
    agg = partial_agg(gs, ["k"], [("mn", "min", "mn"), ("mx", "max", "mx")]).take(1)[0]
    ref = ray.put((int(agg["mn"]), int(agg["mx"])))

    def rel(df: pd.DataFrame) -> pd.DataFrame:
        gmin, gmax = _cached_get(ref)
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64), indexing="ij")
            v = np.asarray(t["data"], np.int64)
            frames.append(pd.DataFrame({
                "cell_id": rr.ravel() * GRID1.cols + cc.ravel(),
                "above_min": v - gmin,
                "rel_range": np.full(len(v), gmax - gmin, np.int64)}))
        return pd.concat(frames)

    return tiles.map_batches(rel, batch_format="pandas")


@query(
    "raster_histogram",
    f"""
    WITH {_CELLS_CTE}
    SELECT CAST(v // 50 AS BIGINT) AS bin, COUNT(*) AS n
    FROM cells GROUP BY bin
    """,
)
def raster_histogram(sf_dir: str):
    """RasterHistogram (math_stat_analysis/raster_histogram.rs): fixed-width
    binned counts (bin = v // 50, 20 bins) — per-tile partial histograms
    merged, never a row per cell on the driver."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, t in df.iterrows():
            b = np.asarray(t["data"], np.int64) // 50
            vals, cnts = np.unique(b, return_counts=True)
            frames.append(pd.DataFrame({"bin": vals, "n": cnts.astype(np.int64)}))
        return pd.concat(frames)

    return partial_agg(tiles.map_batches(part, batch_format="pandas"), ["bin"],
                       [("n", "sum", "n")])


@query(
    "kappa_components",
    f"""
    WITH {_CELLS_CTE}
    SELECT CAST(v % 7 AS BIGINT) AS class_a,
           CAST((v * 13) % 7 AS BIGINT) AS class_b, COUNT(*) AS n
    FROM cells GROUP BY class_a, class_b
    """,
)
def kappa_components(sf_dir: str):
    """KappaIndexOfAgreement (math_stat_analysis/kappa_index.rs): the full
    confusion matrix of two derived classifications (a = v mod 7,
    b = 13v mod 7) — integer-exact; kappa = (po - pe)/(1 - pe) follows from
    these counts driver-side."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, t in df.iterrows():
            v = np.asarray(t["data"], np.int64)
            key = (v % 7) * 7 + (v * 13) % 7
            vals, cnts = np.unique(key, return_counts=True)
            frames.append(pd.DataFrame({"class_a": vals // 7, "class_b": vals % 7,
                                        "n": cnts.astype(np.int64)}))
        return pd.concat(frames)

    return partial_agg(tiles.map_batches(part, batch_format="pandas"),
                       ["class_a", "class_b"], [("n", "sum", "n")])


@query(
    "raster_pca_components",
    f"""
    WITH {_CELLS_CTE},
    bands AS (SELECT cell_id, v AS b1, (cell_id * 733) % 1000 AS b2,
                     (cell_id * 577) % 1000 AS b3 FROM cells)
    SELECT COUNT(*) AS n,
           CAST(SUM(b1) AS BIGINT) AS s1, CAST(SUM(b2) AS BIGINT) AS s2,
           CAST(SUM(b3) AS BIGINT) AS s3,
           CAST(SUM(b1 * b1) AS BIGINT) AS s11, CAST(SUM(b1 * b2) AS BIGINT) AS s12,
           CAST(SUM(b1 * b3) AS BIGINT) AS s13, CAST(SUM(b2 * b2) AS BIGINT) AS s22,
           CAST(SUM(b2 * b3) AS BIGINT) AS s23, CAST(SUM(b3 * b3) AS BIGINT) AS s33
    FROM bands
    """,
)
def raster_pca_components(sf_dir: str):
    """PrincipalComponentAnalysis (math_stat_analysis/principal_component_
    analysis.rs): the cross-moment matrix over a 3-band synthetic stack —
    exact int64 partial sums (the tiny 3x3 eigen-solve is a driver-side float
    step, as in the reference's correlation-matrix stage)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64), indexing="ij")
            cid = rr.ravel() * GRID1.cols + cc.ravel()
            b1 = np.asarray(t["data"], np.int64)
            b2 = (cid * 733) % 1000
            b3 = (cid * 577) % 1000
            rows.append({"k": 0, "n": np.int64(len(cid)),
                         "s1": b1.sum(), "s2": b2.sum(), "s3": b3.sum(),
                         "s11": (b1 * b1).sum(), "s12": (b1 * b2).sum(),
                         "s13": (b1 * b3).sum(), "s22": (b2 * b2).sum(),
                         "s23": (b2 * b3).sum(), "s33": (b3 * b3).sum()})
        return pd.DataFrame(rows)

    cols = ["n", "s1", "s2", "s3", "s11", "s12", "s13", "s22", "s23", "s33"]
    return partial_agg(tiles.map_batches(part, batch_format="pandas"), ["k"],
                       [(c, "sum", c) for c in cols]).drop_columns(["k"])


@query(
    "anova_components",
    f"""
    WITH {_CELLS_CTE}
    SELECT CAST((cell_id * 733) % 5 AS BIGINT) AS grp, COUNT(*) AS n,
           CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS ss
    FROM cells GROUP BY grp
    """,
)
def anova_components(sf_dir: str):
    """Anova (math_stat_analysis/anova.rs): per-group n / sum / sum-of-squares
    over a 5-class derived factor — the exact integer sufficient statistics
    for the F test (between/within sums of squares follow driver-side)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64), indexing="ij")
            cid = rr.ravel() * GRID1.cols + cc.ravel()
            v = np.asarray(t["data"], np.int64)
            g = (cid * 733) % 5
            frame = pd.DataFrame({"grp": g, "n": np.ones(len(v), np.int64),
                                  "s": v, "ss": v * v})
            frames.append(frame.groupby("grp", as_index=False).sum())
        return pd.concat(frames)

    return partial_agg(tiles.map_batches(part, batch_format="pandas"), ["grp"],
                       [("n", "sum", "n"), ("s", "sum", "s"), ("ss", "sum", "ss")])


@query(
    "find_lowest_highest",
    f"""
    WITH {_CELLS_CTE}
    SELECT (SELECT MIN(v) FROM cells) AS min_v,
           (SELECT MIN(cell_id) FROM cells
            WHERE v = (SELECT MIN(v) FROM cells)) AS min_cell,
           (SELECT MAX(v) FROM cells) AS max_v,
           (SELECT MIN(cell_id) FROM cells
            WHERE v = (SELECT MAX(v) FROM cells)) AS max_cell
    """,
)
def find_lowest_highest(sf_dir: str):
    """FindLowestOrHighestPoints (gis_analysis/find_lowest_or_highest_points
    .rs): raster-wide argmin/argmax with deterministic lowest-cell-id
    tie-break — per-tile candidate partials, merged in one reduce."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64), indexing="ij")
            cid = rr.ravel() * GRID1.cols + cc.ravel()
            v = np.asarray(t["data"], np.int64)
            mn, mx = v.min(), v.max()
            rows.append({"k": 0, "min_v": mn, "min_cell": cid[v == mn].min(),
                         "max_v": mx, "max_cell": cid[v == mx].min()})
        return pd.DataFrame(rows)

    parts = tiles.map_batches(part, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        mn = df["min_v"].min()
        mx = df["max_v"].max()
        return pd.DataFrame([{
            "min_v": np.int64(mn),
            "min_cell": df.loc[df["min_v"] == mn, "min_cell"].min(),
            "max_v": np.int64(mx),
            "max_cell": df.loc[df["max_v"] == mx, "max_cell"].min()}])

    # candidates are tiny (one row per tile): single-group exact merge
    return parts.groupby("k").map_groups(merge, batch_format="pandas")


# --------------------------------------------------------------------------
# Block gridding (points -> per-cell extreme) + raster aggregation
# --------------------------------------------------------------------------

from ..pointdefs import PTS_CTE, _cid1  # noqa: E402


@query(
    "block_max_gridding",
    f"""
    WITH {PTS_CTE}
    SELECT {_cid1} AS cell_id,
           CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS max_cents,
           COUNT(*) AS n
    FROM pts GROUP BY cell_id
    """,
)
def block_max_gridding(sf_dir: str):
    """BlockMaximumGridding (gis_analysis/block_maximum.rs): per-cell max of
    the point values (exact cents) + count — encode-to-cell + grouped max,
    the A2 pattern; cells with no points stay absent (reference nodata)."""
    from ..relational import cents
    from ..sources.tables import read_points

    ds = read_points(sf_dir)

    def enc(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        col = np.floor((x - GRID1.west) / GRID1.res_x).astype(np.int64)
        row = np.floor((GRID1.north - y) / GRID1.res_y).astype(np.int64)
        t = cents(t, "value", "max_cents")
        return pa.table({"cell_id": row * GRID1.cols + col,
                         "max_cents": t["max_cents"],
                         "n": np.ones(len(x), np.int64)})

    return partial_agg(ds.map_batches(enc, batch_format="pyarrow"), ["cell_id"],
                       [("max_cents", "max", "max_cents"), ("n", "sum", "n")])


@query(
    "block_min_gridding",
    f"""
    WITH {PTS_CTE}
    SELECT {_cid1} AS cell_id,
           CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           COUNT(*) AS n
    FROM pts GROUP BY cell_id
    """,
)
def block_min_gridding(sf_dir: str):
    """BlockMinimumGridding (gis_analysis/block_minimum.rs): per-cell min of
    point values (exact cents) + count."""
    from ..relational import cents
    from ..sources.tables import read_points

    ds = read_points(sf_dir)

    def enc(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        col = np.floor((x - GRID1.west) / GRID1.res_x).astype(np.int64)
        row = np.floor((GRID1.north - y) / GRID1.res_y).astype(np.int64)
        t = cents(t, "value", "min_cents")
        return pa.table({"cell_id": row * GRID1.cols + col,
                         "min_cents": t["min_cents"],
                         "n": np.ones(len(x), np.int64)})

    return partial_agg(ds.map_batches(enc, batch_format="pyarrow"), ["cell_id"],
                       [("min_cents", "min", "min_cents"), ("n", "sum", "n")])


@query(
    "raster_aggregate2x2",
    f"""
    WITH {_CELLS_CTE}
    SELECT CAST((r // 2) * {-(-GRID1.cols // 2)} + (c // 2) AS BIGINT) AS block_id,
           CAST(SUM(v) AS BIGINT) AS vsum, COUNT(*) AS n,
           CAST(MIN(v) AS BIGINT) AS vmin, CAST(MAX(v) AS BIGINT) AS vmax
    FROM cells GROUP BY block_id
    """,
)
def raster_aggregate2x2(sf_dir: str):
    """AggregateRaster (gis_analysis/aggregate_raster.rs, agg factor 2):
    2x2-block sum/count/min/max — tiles aggregate their own blocks (tile size
    is a multiple of the factor, so no block straddles tiles)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)
    bcols = -(-GRID1.cols // 2)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64), indexing="ij")
            bid = (rr.ravel() // 2) * bcols + (cc.ravel() // 2)
            v = np.asarray(t["data"], np.int64)
            g = pd.DataFrame({"block_id": bid, "vsum": v,
                              "n": np.ones(len(v), np.int64), "vmin": v, "vmax": v})
            frames.append(g.groupby("block_id", as_index=False)
                          .agg(vsum=("vsum", "sum"), n=("n", "sum"),
                               vmin=("vmin", "min"), vmax=("vmax", "max")))
        return pd.concat(frames)

    return partial_agg(tiles.map_batches(part, batch_format="pandas"), ["block_id"],
                       [("vsum", "sum", "vsum"), ("n", "sum", "n"),
                        ("vmin", "min", "vmin"), ("vmax", "max", "vmax")])


@query(
    "edge_proportion",
    f"""
    WITH {_CELLS_CTE},
    cls AS (SELECT cell_id, r, c, CAST(v % 10 AS BIGINT) AS cat FROM cells),
    nb AS (
      {" UNION ALL ".join(
        f"SELECT a.cell_id, a.cat, b.cat AS ncat FROM cls a "
        f"JOIN cls b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr, dc in [(-1, 0), (1, 0), (0, -1), (0, 1)])}
    ),
    edge AS (
      SELECT cell_id, cat, MAX(CASE WHEN ncat <> cat THEN 1 ELSE 0 END) AS is_edge
      FROM nb GROUP BY cell_id, cat
    )
    SELECT cat, COUNT(*) AS n_cells, CAST(SUM(is_edge) AS BIGINT) AS n_edge
    FROM edge GROUP BY cat
    """,
)
def edge_proportion(sf_dir: str):
    """EdgeProportion (gis_analysis/edge_proportion.rs): per category
    (v mod 10), how many cells touch a different category 4-neighbour —
    halo stencil + grouped partials. Cells with no in-grid 4-neighbour
    (none on this grid) would be absent, matching the SQL."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        cat = padded[1:nr + 1, 1:nc + 1] % 10
        edge = np.zeros((nr, nc), bool)
        for dr, dc in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            edge |= (~np.isnan(w)) & (w % 10 != cat)
        return {"cat": cat, "is_edge": edge.astype(np.int64)}

    cells = stencil_3x3(tiles, GRID1, kern)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"cat": df["cat"].astype(np.int64),
                          "n_cells": np.ones(len(df), np.int64),
                          "n_edge": df["is_edge"].astype(np.int64)})
        return g.groupby("cat", as_index=False).sum()

    return partial_agg(cells.map_batches(part, batch_format="pandas"), ["cat"],
                       [("n_cells", "sum", "n_cells"), ("n_edge", "sum", "n_edge")])


# --------------------------------------------------------------------------
# 10x-grid stencil throughput entry (per-tile tensors end-to-end)
# --------------------------------------------------------------------------

from ..grid import GridSpec  # noqa: E402

GRID10 = GridSpec(west=-180.0, north=85.0, res_x=0.1, res_y=0.1,
                  rows=1700, cols=3600)

_NB10_UNION = " UNION ALL ".join(
    f"SELECT a.cell_id, b.v FROM cells10 a JOIN cells10 b "
    f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
    for dr, dc in _ALL9
)


@query(
    "stencil_mean3x3_10x",
    f"""
    WITH cells10 AS (SELECT CAST(t.i AS BIGINT) AS cell_id,
            CAST(t.i // {GRID10.cols} AS BIGINT) AS r,
            CAST(t.i % {GRID10.cols} AS BIGINT) AS c,
            ((t.i * 1000003) % 1000) AS v
            FROM range({GRID10.rows * GRID10.cols}) t(i)),
    nb AS ({_NB10_UNION})
    SELECT (SELECT COUNT(*) FROM cells10) AS n_cells,
           CAST(SUM(v) AS BIGINT) AS total_sum9,
           COUNT(*) AS total_n9
    FROM nb
    """,
)
def stencil_mean3x3_10x(sf_dir: str):
    """MeanFilter at the 10x grid (6.12M cells) consumed AS TILE TENSORS
    end-to-end: the stencil emits one row per tile (output="tiles") and the
    checksum aggregates per tile — the per-cell long format never exists
    (round-2 VERDICT item 5; the cells path pays a 64x row exchange at this
    size). SQL oracle: whole-raster neighbourhood-sum checksums."""
    from ..stages.raster import mean3x3_kernel

    tiles = synth_raster_tiles(GRID10, _value_fn)
    tout = stencil_k(tiles, GRID10, mean3x3_kernel, k=1, output="tiles")

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in df.itertuples():
            rows.append({"k": 0,
                         "n_cells": np.int64(int(t.nrows) * int(t.ncols)),
                         "total_sum9": np.int64(np.asarray(t.sum9).sum()),
                         "total_n9": np.int64(np.asarray(t.n9).sum())})
        return pd.DataFrame(rows)

    return partial_agg(tout.map_batches(agg, batch_format="pandas"), ["k"],
                       [("n_cells", "sum", "n_cells"),
                        ("total_sum9", "sum", "total_sum9"),
                        ("total_n9", "sum", "total_n9")]).drop_columns(["k"])


def _sum9_kernel(padded: np.ndarray, nr: int, nc: int) -> dict:
    s = np.zeros((nr, nc))
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            w = padded[dr:dr + nr, dc:dc + nc]
            s += np.where(np.isnan(w), 0.0, w)
    return {"s": s}


@query(
    "stencil_chain_fused",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)}),
    s1 AS (SELECT cell_id, CAST(SUM(v) AS BIGINT) AS s FROM nb GROUP BY cell_id),
    s1rc AS (SELECT c.cell_id, c.r, c.c, s1.s FROM cells c JOIN s1 USING (cell_id)),
    nb2 AS ({" UNION ALL ".join(
        f"SELECT a.cell_id, b.s FROM cells a JOIN s1rc b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})" for dr, dc in _ALL9)})
    SELECT cell_id, CAST(SUM(s) AS BIGINT) AS s2 FROM nb2 GROUP BY cell_id
    """,
)
def stencil_chain_fused(sf_dir: str):
    """Chained 3x3 neighbourhood sums FUSED into one k=2 halo exchange
    (stages/raster.fuse_kernels): a two-stencil smoothing chain pays one
    exchange instead of two plus a per-cell re-tile shuffle. SQL oracle
    evaluates the two levels independently."""
    from ..stages.raster import fuse_kernels

    fused = fuse_kernels(_sum9_kernel, "s", _sum9_kernel, 1, 1)
    tiles = synth_raster_tiles(GRID1, _value_fn)
    return stencil_k(tiles, GRID1, fused, k=2).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "s2": df["s"].astype(np.int64)}),
        batch_format="pandas")


@query("stencil_chain_10x")
def stencil_chain_10x(sf_dir: str):
    """The fused chain at the 10x grid (6.12M cells), consumed as tile
    tensors — the bench entry for round-2 VERDICT item 5 (>= 2x over the
    per-cell re-tile chain, measured in BASELINE.md). Rows-only: one
    checksum row; the GRID1 twin above is the SQL-exact correctness gate and
    tests/test_stencil_chain.py proves 10x checksum equality against the
    unfused path."""
    from ..stages.raster import fuse_kernels

    fused = fuse_kernels(_sum9_kernel, "s", _sum9_kernel, 1, 1)
    tout = stencil_k(synth_raster_tiles(GRID10, _value_fn), GRID10, fused,
                     k=2, output="tiles")

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in df.itertuples():
            rows.append({"k": 0, "n_cells": np.int64(int(t.nrows) * int(t.ncols)),
                         "checksum": np.int64(np.asarray(t.s).sum())})
        return pd.DataFrame(rows)

    return partial_agg(tout.map_batches(agg, batch_format="pandas"), ["k"],
                       [("n_cells", "sum", "n_cells"),
                        ("checksum", "sum", "checksum")]).drop_columns(["k"])


@query(
    "horizon_angle_east",
    f"""
    WITH {_CELLS_CTE}
    SELECT a.cell_id, MAX((b.v - a.v) * 1.0 / (a.c - b.c)) AS hslope
    FROM cells a JOIN cells b ON b.r = a.r AND b.c < a.c
    GROUP BY a.cell_id
    """,
)
def horizon_angle_east(sf_dir: str):
    """HorizonAngle (terrain_analysis/horizon_angle.rs), westward sight line:
    per cell the maximum elevation slope to any cell west of it in its row —
    rows are independent scan lines, so the sweep parallelizes per row-batch
    with zero exchange; first-column cells have no horizon (absent). The
    float MAX over identical IEEE quotients is order-independent, so the
    oracle hash is exact. The all-azimuth tool runs this per azimuth band."""
    import ray.data

    rows_ds = ray.data.range(GRID1.rows, override_num_blocks=8)

    def sweep(batch: dict) -> pd.DataFrame:
        frames = []
        for r in batch["id"].astype(np.int64):
            cid = r * GRID1.cols + np.arange(GRID1.cols, dtype=np.int64)
            v = _value_fn(cid)
            # slope matrix over (target i, source j<i): (v_j - v_i) / (i - j)
            i = np.arange(GRID1.cols)
            diff = v[None, :] - v[:, None]          # [i, j] = v_j - v_i
            dist = i[:, None] - i[None, :]          # i - j
            with np.errstate(divide="ignore", invalid="ignore"):
                sl = np.where(dist > 0, diff / np.where(dist > 0, dist, 1), -np.inf)
            best = sl.max(axis=1)
            frames.append(pd.DataFrame({"cell_id": cid[1:], "hslope": best[1:]}))
        return pd.concat(frames, ignore_index=True)

    return rows_ds.map_batches(sweep, batch_format="numpy")


@query(
    "raster_pits",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_RING8)})
    SELECT cell_id FROM nb
    GROUP BY cell_id
    HAVING COUNT(*) = 8 AND MIN(v) > MAX(cv)
    """,
)
def raster_pits(sf_dir: str):
    """Sink / pit detection (hydro_analysis/sink.rs, find_no_flow_cells):
    interior cells strictly lower than all 8 neighbours — the halo stencil's
    cheapest member, the seed set for fill/breach."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        pit = np.ones((nr, nc), bool)
        for dr, dc in _RING8:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            pit &= ~np.isnan(w) & (w > z)
        return {"pit": pit.astype(np.int64)}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df.loc[df["pit"] == 1, "cell_id"]
                                 .astype(np.int64)}),
        batch_format="pandas")


@query(
    "histogram_matching",
    f"""
    WITH {_CELLS_CTE},
    bb AS (SELECT cell_id, (cell_id * 733) % 1000 AS w FROM cells),
    ha AS (SELECT v, COUNT(*) AS n FROM cells GROUP BY v),
    ca AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cdf FROM ha),
    hb AS (SELECT w, COUNT(*) AS n FROM bb GROUP BY w),
    cb AS (SELECT w, SUM(n) OVER (ORDER BY w) AS cdf FROM hb),
    vmap AS (SELECT ca.v,
                    (SELECT MIN(cb.w) FROM cb WHERE cb.cdf >= ca.cdf) AS matched
             FROM ca)
    SELECT c.cell_id, CAST(m.matched AS BIGINT) AS matched
    FROM cells c JOIN vmap m ON m.v = c.v
    """,
)
def histogram_matching(sf_dir: str):
    """HistogramMatching (image_analysis/histogram_matching.rs;
    histogram_matching_two_images.rs IS this image-to-image form): remap band
    A's values so its CDF matches reference band B's (matched(v) = least w
    with cdfB(w) >= cdfA(v)) — two tiny global histograms (partial-merge),
    driver builds the 1000-entry value map, broadcast vectorized remap.
    Integer-exact."""
    import ray

    from ..stages.spatial_join import _cached_get

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def hists(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * GRID1.cols + cc.ravel()
            a = np.asarray(t.data, np.int64)
            b = (cid * 733) % 1000
            va, na = np.unique(a, return_counts=True)
            vb, nb = np.unique(b, return_counts=True)
            frames.append(pd.DataFrame({"band": 0, "v": va, "n": na.astype(np.int64)}))
            frames.append(pd.DataFrame({"band": 1, "v": vb, "n": nb.astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    hist = partial_agg(tiles.map_batches(hists, batch_format="pandas"),
                       ["band", "v"], [("n", "sum", "n")]).to_pandas()
    ha = hist[hist["band"] == 0].sort_values("v")
    hb = hist[hist["band"] == 1].sort_values("v")
    cdfa = ha["n"].cumsum().to_numpy(np.int64)
    vb = hb["v"].to_numpy(np.int64)
    cdfb = hb["n"].cumsum().to_numpy(np.int64)
    pos = np.searchsorted(cdfb, cdfa, side="left")  # least w: cdfB(w) >= cdfA(v)
    mapping = np.full(1000, -1, np.int64)
    mapping[ha["v"].to_numpy(np.int64)] = vb[np.minimum(pos, len(vb) - 1)]
    ref = ray.put(mapping)

    def remap(df: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * GRID1.cols + cc.ravel()
            a = np.asarray(t.data, np.int64)
            frames.append(pd.DataFrame({"cell_id": cid, "matched": m[a]}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(remap, batch_format="pandas")


@query(
    "contrast_stretch",
    f"""
    WITH {_CELLS_CTE},
    g AS (SELECT MIN(v) AS gmin, MAX(v) AS gmax FROM cells)
    SELECT c.cell_id,
           CAST((c.v - g.gmin) * 255 // (g.gmax - g.gmin) AS BIGINT) AS stretched
    FROM cells c, g
    """,
)
def contrast_stretch(sf_dir: str):
    """MinMaxContrastStretch (image_analysis/min_max_contrast_stretch.rs):
    linear stretch to [0, 255] with floor division — global min/max
    broadcast, integer-exact."""
    import ray

    from ..stages.spatial_join import _cached_get

    tiles = synth_raster_tiles(GRID1, _value_fn)
    gs = tiles.map_batches(
        lambda df: pd.DataFrame(
            {"k": [0] * len(df),
             "mn": [np.asarray(d, np.int64).min() for d in df["data"]],
             "mx": [np.asarray(d, np.int64).max() for d in df["data"]]}),
        batch_format="pandas")
    agg = partial_agg(gs, ["k"], [("mn", "min", "mn"), ("mx", "max", "mx")]).take(1)[0]
    ref = ray.put((int(agg["mn"]), int(agg["mx"])))

    def stretch(df: pd.DataFrame) -> pd.DataFrame:
        gmin, gmax = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * GRID1.cols + cc.ravel()
            v = np.asarray(t.data, np.int64)
            frames.append(pd.DataFrame({
                "cell_id": cid, "stretched": (v - gmin) * 255 // (gmax - gmin)}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(stretch, batch_format="pandas")


@query(
    "integral_image",
    f"""
    WITH {_CELLS_CTE},
    rowc AS (
      SELECT cell_id, r, c,
             SUM(v) OVER (PARTITION BY r ORDER BY c) AS rc
      FROM cells
    )
    SELECT cell_id,
           CAST(SUM(rc) OVER (PARTITION BY c ORDER BY r) AS BIGINT) AS integral
    FROM rowc
    """,
)
def integral_image(sf_dir: str):
    """IntegralImage (image_analysis/integral_image.rs): the 2-D prefix sum
    I(r,c) = sum of all cells above-left inclusive, as a DISTRIBUTED scan:
    each tile computes its local integral plus tiny row-band/col-band/total
    summaries (129 values per tile); the driver combines the summaries into
    per-tile offset vectors (a 2-D prefix over the tile grid — O(#tiles)
    work) and broadcasts them; a second vectorized pass adds offsets. No
    per-cell data ever crosses tiles. Integer-exact; SQL oracle = two
    window cumsums."""
    import ray

    from ..stages.spatial_join import _cached_get

    tile = 64
    tcols = -(-GRID1.cols // tile)
    trows = -(-GRID1.rows // tile)
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def summaries(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            v = np.asarray(t.data, np.int64).reshape(nr, nc)
            rows.append({"trow": int(t.trow), "tcol": int(t.tcol),
                         "rowcum": v.sum(axis=1).cumsum(),   # (nr,)
                         "colcum": v.sum(axis=0).cumsum(),   # (nc,)
                         "total": np.int64(v.sum())})
        return pd.DataFrame(rows)

    summ = tiles.map_batches(summaries, batch_format="pandas").to_pandas()
    rowcums: dict = {}
    colcums: dict = {}
    totals = np.zeros((trows, tcols), np.int64)
    for t in summ.itertuples():
        rowcums[(t.trow, t.tcol)] = np.asarray(t.rowcum, np.int64)
        colcums[(t.trow, t.tcol)] = np.asarray(t.colcum, np.int64)
        totals[t.trow, t.tcol] = t.total
    # per-tile offsets: left row-bands, top col-bands, above-left corner
    left: dict = {}
    top: dict = {}
    corner2d = totals.cumsum(axis=0).cumsum(axis=1)
    corner: dict = {}
    for (tr, tc), rc in rowcums.items():
        left[(tr, tc)] = sum((rowcums[(tr, k)] for k in range(tc)),
                             np.zeros_like(rc))
        top[(tr, tc)] = sum((colcums[(k, tc)] for k in range(tr)),
                            np.zeros_like(colcums[(tr, tc)]))
        corner[(tr, tc)] = int(corner2d[tr - 1, tc - 1]) if tr > 0 and tc > 0 else 0
    ref = ray.put((left, top, corner))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        lmap, tmap, cmap = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            tr, tc = int(t.trow), int(t.tcol)
            r0, c0 = tr * tile, tc * tile
            v = np.asarray(t.data, np.int64).reshape(nr, nc)
            local = v.cumsum(axis=0).cumsum(axis=1)
            out = (local + lmap[(tr, tc)][:, None] + tmap[(tr, tc)][None, :]
                   + cmap[(tr, tc)])
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            frames.append(pd.DataFrame({
                "cell_id": rr.ravel() * GRID1.cols + cc.ravel(),
                "integral": out.ravel()}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(combine, batch_format="pandas")


@query(
    "image_autocorrelation",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union([(-1, 0), (1, 0), (0, -1), (0, 1)])})
    SELECT (SELECT COUNT(*) FROM cells) AS n,
           (SELECT CAST(SUM(v) AS BIGINT) FROM cells) AS sv,
           (SELECT CAST(SUM(v * v) AS BIGINT) FROM cells) AS svv,
           COUNT(*) AS n_pairs,
           CAST(SUM(cv * v) AS BIGINT) AS s_cross
    FROM nb
    """,
)
def image_autocorrelation(sf_dir: str):
    """ImageAutocorrelation (math_stat_analysis/image_autocorrelation.rs):
    the Moran's I sufficient statistics under rook weights — n, sum v,
    sum v^2, directed neighbour-pair count and cross-product sum, all exact
    int64 partials (I = n * sum_cross-ish follows driver-side)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        cross = np.zeros((nr, nc))
        cnt = np.zeros((nr, nc), np.int64)
        for dr, dc in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            ok = ~np.isnan(w)
            cross += np.where(ok, z * w, 0.0)
            cnt += ok.astype(np.int64)
        return {"cross": cross, "cnt": cnt, "v": z}

    cells = stencil_3x3(tiles, GRID1, kern)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        return pd.DataFrame([{
            "k": 0, "n": np.int64(len(df)), "sv": v.sum(),
            "svv": (v * v).sum(),
            "n_pairs": df["cnt"].to_numpy(np.int64).sum(),
            "s_cross": df["cross"].to_numpy(np.int64).sum()}])

    return partial_agg(cells.map_batches(part, batch_format="pandas"), ["k"],
                       [(c, "sum", c) for c in
                        ("n", "sv", "svv", "n_pairs", "s_cross")]).drop_columns(["k"])


_LOG5 = [[0, 0, -1, 0, 0], [0, -1, -2, -1, 0], [-1, -2, 16, -2, -1],
         [0, -1, -2, -1, 0], [0, 0, -1, 0, 0]]
_LOG_OFF = [(dr - 2, dc - 2, _LOG5[dr][dc]) for dr in range(5) for dc in range(5)
            if _LOG5[dr][dc] != 0]
_LOG_UNION = " UNION ALL ".join(
    f"SELECT a.cell_id, CAST({w} AS BIGINT) AS w, b.v "
    f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
    for dr, dc, w in _LOG_OFF
)


@query(
    "laplacian_of_gaussian",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_LOG_UNION})
    SELECT cell_id, CAST(SUM(w * v) AS BIGINT) AS log5
    FROM nb GROUP BY cell_id HAVING COUNT(*) = {len(_LOG_OFF)}
    """,
)
def laplacian_of_gaussian(sf_dir: str):
    """LaplacianOfGaussianFilter (image_analysis/log_filter.rs):
    the classic integer 5x5 LoG kernel, interior cells only — k=2 halo
    stencil, integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)
    w5 = np.asarray(_LOG5, np.float64)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        acc = np.zeros((nr, nc))
        full = np.ones((nr, nc), bool)
        for dr in range(5):
            for dc in range(5):
                w = w5[dr, dc]
                win = padded[dr:dr + nr, dc:dc + nc]
                if w != 0:
                    full &= ~np.isnan(win)
                    acc += w * np.nan_to_num(win)
        return {"log5": np.where(full, acc, np.nan)}

    out = stencil_k(tiles, GRID1, kern, k=2)
    return out.map_batches(
        lambda df: pd.DataFrame(
            {"cell_id": df.loc[np.isfinite(df["log5"]), "cell_id"].astype(np.int64),
             "log5": df.loc[np.isfinite(df["log5"]), "log5"].astype(np.int64)}),
        batch_format="pandas")


# viewshed viewpoint: grid centre cell
VS_VR, VS_VC = GRID1.rows // 2, GRID1.cols // 2


from ..rasterdefs import _dda_sql  # noqa: E402


@query(
    "viewshed",
    f"""
    WITH {_CELLS_CTE},
    vp AS (SELECT v AS zv FROM cells
           WHERE r = {VS_VR} AND c = {VS_VC}),
    tgt AS (
      SELECT cell_id, r, c, v,
             GREATEST(abs(r - {VS_VR}), abs(c - {VS_VC})) AS kk
      FROM cells
    ),
    los AS (
      SELECT t.cell_id, t.v, t.kk, s.i AS k,
             {VS_VR} + {_dda_sql('s.i', f'(t.r - {VS_VR})', 't.kk')} AS rk,
             {VS_VC} + {_dda_sql('s.i', f'(t.c - {VS_VC})', 't.kk')} AS ck
      FROM tgt t JOIN range(1, {max(GRID1.rows, GRID1.cols)}) s(i)
        ON s.i < t.kk
      WHERE t.kk >= 2
    ),
    blocked AS (
      SELECT l.cell_id,
             MAX(CASE WHEN (b.v - vp.zv) * l.kk >= (l.v - vp.zv) * l.k
                      THEN 1 ELSE 0 END) AS blk
      FROM los l JOIN cells b ON b.r = l.rk AND b.c = l.ck, vp
      GROUP BY l.cell_id
    )
    SELECT t.cell_id,
           CAST(CASE WHEN t.kk <= 1 THEN 1
                     WHEN b.blk = 1 THEN 0 ELSE 1 END AS BIGINT) AS visible
    FROM tgt t LEFT JOIN blocked b ON b.cell_id = t.cell_id
    """,
)
def viewshed(sf_dir: str):
    """Viewshed (terrain_analysis/viewshed.rs), integer DDA line-of-sight
    variant: a cell is visible from the centre viewpoint iff no cell on the
    parametric integer line between them has sight-line slope >= the
    target's (slopes compared by exact cross-multiplication over the
    Chebyshev step count — fully integer, so the oracle is bit-exact;
    the reference's R3 algorithm interpolates elevations instead, the
    documented variant difference). Targets partition freely across
    workers; each batch re-derives intermediate elevations from the pure
    surface function, so there is NO broadcast and no exchange — the
    per-azimuth-band sharding the scale path needs."""
    zv = int(_value_fn(np.array([VS_VR * GRID1.cols + VS_VC]))[0])

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def los(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            rr = rr.ravel()
            cc = cc.ravel()
            cid = rr * GRID1.cols + cc
            zt = np.asarray(t.data, np.int64)
            dr = rr - VS_VR
            dc = cc - VS_VC
            K = np.maximum(np.abs(dr), np.abs(dc))
            blocked = np.zeros(len(cid), bool)
            num_c = zt - zv
            kmax = int(K.max()) if len(K) else 0
            for k in range(1, kmax):
                m = k < K
                if not m.any():
                    break
                Km = K[m]
                adr = np.abs(dr[m])
                adc = np.abs(dc[m])
                rk = VS_VR + np.sign(dr[m]) * ((2 * k * adr + Km) // (2 * Km))
                ck = VS_VC + np.sign(dc[m]) * ((2 * k * adc + Km) // (2 * Km))
                zk = _value_fn(rk * GRID1.cols + ck).astype(np.int64)
                blocked[m] |= (zk - zv) * Km >= num_c[m] * k
            visible = np.where(K <= 1, 1, (~blocked).astype(np.int64))
            frames.append(pd.DataFrame({"cell_id": cid, "visible": visible}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(los, batch_format="pandas")


@query(
    "num_up_down_neighbours",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_RING8)})
    SELECT cell_id,
           CAST(SUM(CASE WHEN v < cv THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
           CAST(SUM(CASE WHEN v > cv THEN 1 ELSE 0 END) AS BIGINT) AS n_up
    FROM nb GROUP BY cell_id
    """,
)
def num_up_down_neighbours(sf_dir: str):
    """NumDownslopeNeighbours + NumUpslopeNeighbours (terrain_analysis/
    num_downslope_neighbours.rs, num_upslope_neighbours.rs): per cell the count of strictly lower
    / higher 8-neighbours — one stencil pass, integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        nd = np.zeros((nr, nc), np.int64)
        nu = np.zeros((nr, nc), np.int64)
        for dr, dc in _RING8:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            ok = ~np.isnan(w)
            nd += (ok & (w < z)).astype(np.int64)
            nu += (ok & (w > z)).astype(np.int64)
        return {"n_down": nd, "n_up": nu}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "n_down": df["n_down"].astype(np.int64),
                                 "n_up": df["n_up"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "downslope_elev_change",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_RING8)})
    SELECT cell_id,
           CAST(MAX(CASE WHEN v < cv THEN cv - v ELSE 0 END) AS BIGINT) AS max_drop,
           CAST(MIN(CASE WHEN v < cv THEN cv - v ELSE NULL END) AS BIGINT) AS min_drop
    FROM nb GROUP BY cell_id
    HAVING SUM(CASE WHEN v < cv THEN 1 ELSE 0 END) > 0
    """,
)
def downslope_elev_change(sf_dir: str):
    """MaxDownslopeElevChange + MinDownslopeElevChange (terrain_analysis/
    {max,min}_downslope_elev_change.rs): the largest/smallest positive drop
    to an 8-neighbour; cells with no downslope neighbour (pits/flats) are
    nodata (absent)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        mx = np.zeros((nr, nc))
        mn = np.full((nr, nc), np.inf)
        any_down = np.zeros((nr, nc), bool)
        for dr, dc in _RING8:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            down = ~np.isnan(w) & (w < z)
            drop = np.where(down, z - w, 0.0)
            mx = np.maximum(mx, drop)
            mn = np.where(down, np.minimum(mn, drop), mn)
            any_down |= down
        return {"max_drop": np.where(any_down, mx, np.nan),
                "min_drop": np.where(any_down, mn, np.nan)}

    out = stencil_3x3(tiles, GRID1, kern)
    return out.map_batches(
        lambda df: pd.DataFrame(
            {"cell_id": df.loc[np.isfinite(df["max_drop"]), "cell_id"].astype(np.int64),
             "max_drop": df.loc[np.isfinite(df["max_drop"]), "max_drop"].astype(np.int64),
             "min_drop": df.loc[np.isfinite(df["max_drop"]), "min_drop"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "hypsometric_cdf",
    f"""
    WITH {_CELLS_CTE},
    h AS (SELECT CAST(v // 100 AS BIGINT) AS band, COUNT(*) AS n
          FROM cells GROUP BY band)
    SELECT band, n, CAST(SUM(n) OVER (ORDER BY band) AS BIGINT) AS cum_cells
    FROM h
    """,
)
def hypsometric_cdf(sf_dir: str):
    """HypsometricAnalysis (terrain_analysis/hypsometric_analysis.rs): the
    elevation-band area CDF (band = v // 100) — per-tile partial histograms
    merged, cumulative sum over the tiny band table driver-side."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            b = np.asarray(t.data, np.int64) // 100
            vals, cnts = np.unique(b, return_counts=True)
            frames.append(pd.DataFrame({"band": vals, "n": cnts.astype(np.int64)}))
        return pd.concat(frames)

    hist = partial_agg(tiles.map_batches(part, batch_format="pandas"), ["band"],
                       [("n", "sum", "n")]).to_pandas().sort_values("band")
    hist["cum_cells"] = hist["n"].cumsum()
    return hist.reset_index(drop=True)


KNM_K = 5


@query(
    "k_nearest_mean_filter",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb_union(_ALL9)}),
    ranked AS (
      SELECT cell_id, v,
             row_number() OVER (PARTITION BY cell_id
                                ORDER BY abs(v - cv), v, dr, dc) AS rn
      FROM nb
    )
    SELECT cell_id, CAST(SUM(v) AS BIGINT) AS ksum, COUNT(*) AS kn
    FROM ranked WHERE rn <= {KNM_K} GROUP BY cell_id
    """,
)
def k_nearest_mean_filter(sf_dir: str):
    """KNearestMeanFilter (image_analysis/k_nearest_mean_filter.rs, k=5):
    mean of the k window values closest IN VALUE to the centre — ties break
    deterministically on (|v - centre|, v, dr, dc), identical lexicographic
    order on both sides. Integer contract (ksum, kn)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        centre = padded[1:nr + 1, 1:nc + 1]
        vals = np.stack([padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
                         for dr, dc in _ALL9], axis=2)          # (nr, nc, 9)
        drs = np.array([dr for dr, _ in _ALL9])
        dcs = np.array([dc for _, dc in _ALL9])
        absd = np.abs(vals - centre[:, :, None])
        missing = np.isnan(vals)
        # lexicographic (absd, v, dr, dc) via a packed integer key; values
        # are 0..999 ints, offsets in -1..1 — all fields fit their slots
        key = (np.where(missing, np.int64(1 << 40),
                        absd.astype(np.int64) * (1 << 20)
                        + np.nan_to_num(vals).astype(np.int64) * (1 << 10))
               + (drs[None, None, :] + 1) * (1 << 5)
               + (dcs[None, None, :] + 1))
        order = np.argsort(key, axis=2, kind="stable")[:, :, :KNM_K]
        picked = np.take_along_axis(vals, order, axis=2)
        pkey = np.take_along_axis(key, order, axis=2)
        ok = pkey < (1 << 40)
        return {"ksum": np.where(ok, np.nan_to_num(picked), 0.0).sum(axis=2),
                "kn": ok.sum(axis=2)}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "ksum": df["ksum"].astype(np.int64),
                                 "kn": df["kn"].astype(np.int64)}),
        batch_format="pandas")
