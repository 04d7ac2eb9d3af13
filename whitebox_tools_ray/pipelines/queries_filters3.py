"""image_analysis filter sweep #3: TotalFilter, StdevFilter,
PercentileFilter, AdaptiveFilter, FlipImage, UserDefinedWeightsFilter,
ChangeVectorAnalysis, NormalizedDifferenceIndex, GammaCorrection,
CreateColourComposite, SplitColourComposite.

All SQL-exact over the deterministic synthetic raster on GRID1.

Integral-image edge semantics: the reference's integral-image filters
(total_filter.rs:350-366, stdev_filter.rs:386-399, adaptive_filter.rs:441-470)
clamp the subtracted corner ``x1 = col - midpoint - 1`` INTO the grid
(``if x1 < 0 { x1 = 0 }``), which makes windows at the top/left edges
EXCLUDE row 0 / column 0 (for a 3x3 filter: cells with r <= 1 never see
row 0, cells with c <= 1 never see column 0 — including the centre cell
itself at r == 0 or c == 0).  Both the Ray kernel and the DuckDB oracle
replicate this clamp exactly: a neighbour at global (r+dr, c+dc) is in the
window iff  r+dr >= clamp(r-2, 0, rows-1)+1  and  c+dc >= clamp(c-2, 0,
cols-1)+1  (the upper bounds are the ordinary grid clip).

Architecture: every filter is one halo exchange (window_exchange, k=1) —
at 100 TB each tile plus its 1-cell apron is an independent task; the only
movement is the O(perimeter) fragment shuffle.  FlipImage is exchange-FREE:
each source tile computes its mirrored destination coordinates and emits
(dest_cell_id, value) directly — a pure map at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..stages.raster import synth_raster_tiles, window_exchange
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols
_TILE = 64

_ALL9 = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]


def _abs_stencil(kern):
    """3x3 stencil whose kernel sees absolute coordinates:
    kern(padded, nr, nc, r0, c0) -> dict[str, (nr,nc) array]; exploded to
    one row per cell (cell_id + result columns)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def window_fn(padded, nr, nc, r0, c0):
        res = kern(padded, nr, nc, r0, c0)
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        out = {"cell_id": (rr.astype(np.int64) * _COLS + cc.astype(np.int64)).ravel()}
        for key, v in res.items():
            out[key] = np.asarray(v).ravel()
        return pd.DataFrame(out)

    return window_exchange(tiles, GRID1, window_fn, tile=_TILE, k=1)


def _shifted(padded, nr, nc):
    """(9, nr, nc) stack of the 3x3 neighbourhood (NaN outside the grid),
    ordered as _ALL9."""
    return np.stack([padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
                     for dr, dc in _ALL9])


def _intwin_valid(nr, nc, r0, c0):
    """(9, nr, nc) bool: neighbour (dr,dc) inside the reference's
    integral-image window (the top/left clamp quirk, total_filter.rs:350)."""
    r = np.arange(r0, r0 + nr)[:, None] + np.zeros((1, nc), np.int64)
    c = np.arange(c0, c0 + nc)[None, :] + np.zeros((nr, 1), np.int64)
    lo_r = np.clip(r - 2, 0, _ROWS - 1) + 1
    lo_c = np.clip(c - 2, 0, _COLS - 1) + 1
    masks = []
    for dr, dc in _ALL9:
        rr, cc = r + dr, c + dc
        masks.append((rr >= lo_r) & (rr <= _ROWS - 1) & (rr >= 0)
                     & (cc >= lo_c) & (cc <= _COLS - 1) & (cc >= 0))
    return np.stack(masks)


# SQL: per-offset equi-join restricted to the integral-clamp window
def _intwin_union() -> str:
    return " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS cv, b.v FROM cells a "
        f"JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc}) "
        f"WHERE a.r + ({dr}) >= LEAST(GREATEST(a.r - 2, 0), {_ROWS - 1}) + 1 "
        f"AND a.c + ({dc}) >= LEAST(GREATEST(a.c - 2, 0), {_COLS - 1}) + 1"
        for dr, dc in _ALL9
    )


# plain clipped 3x3 window (no clamp quirk) — percentile/user-weights path
def _plainwin_union() -> str:
    return " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS cv, b.v FROM cells a "
        f"JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr, dc in _ALL9
    )


@query(
    "raster_total3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_intwin_union()})
    SELECT cell_id, CAST(SUM(v) AS BIGINT) AS total9
    FROM nb GROUP BY cell_id
    """,
)
def raster_total3x3(sf_dir: str):
    """TotalFilter (image_analysis/total_filter.rs:282-366): sum over the
    integral-image window (min_val = raster minimum = 0 here, so the
    shifted sums equal plain sums); integer-exact."""

    def kern(padded, nr, nc, r0, c0):
        st = _shifted(padded, nr, nc)
        st = np.where(_intwin_valid(nr, nc, r0, c0), st, np.nan)
        return {"total9": np.nansum(st, axis=0)}

    ds = _abs_stencil(kern)
    return ds.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "total9": df["total9"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_stdev3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_intwin_union()}),
    agg AS (SELECT cell_id, COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2
            FROM nb GROUP BY cell_id)
    SELECT cell_id,
           CASE WHEN (CAST(s2 AS DOUBLE) - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) > 0
                THEN sqrt((CAST(s2 AS DOUBLE) - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                ELSE 0.0 END AS sdev
    FROM agg
    """,
)
def raster_stdev3x3(sf_dir: str):
    """StdevFilter (image_analysis/stdev_filter.rs:386-399): population
    variance v = (S2 - S1*S1/n)/n from integral images, s = sqrt(v) when
    v > 0 else 0.  Both sides evaluate the identical IEEE expression tree
    over integer-exact S1/S2/n, so the float is bit-identical."""

    def kern(padded, nr, nc, r0, c0):
        st = _shifted(padded, nr, nc)
        valid = _intwin_valid(nr, nc, r0, c0)
        st = np.where(valid, st, np.nan)
        n = valid.sum(axis=0).astype(np.float64)
        s1 = np.nansum(st, axis=0)
        s2 = np.nansum(st * st, axis=0)
        v = (s2 - (s1 * s1) / n) / n
        return {"sdev": np.where(v > 0, np.sqrt(np.maximum(v, 0)), 0.0)}

    ds = _abs_stencil(kern)
    return ds.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "sdev": df["sdev"].astype(np.float64)}),
        batch_format="pandas")


@query(
    "raster_adaptive3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_intwin_union()}),
    agg AS (SELECT cell_id, MAX(cv) AS z, COUNT(*) AS n,
                   SUM(v) AS s1, SUM(v * v) AS s2
            FROM nb GROUP BY cell_id)
    SELECT c.cell_id,
           CASE WHEN a.cell_id IS NULL THEN CAST(c.v AS DOUBLE)
                WHEN (CAST(a.s2 AS DOUBLE) - (CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE))
                      / CAST(a.n AS DOUBLE)) / CAST(a.n AS DOUBLE) > 0
                     AND abs((CAST(c.v AS DOUBLE) - CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE))
                             / sqrt((CAST(a.s2 AS DOUBLE)
                                     - (CAST(a.s1 AS DOUBLE) * CAST(a.s1 AS DOUBLE))
                                     / CAST(a.n AS DOUBLE)) / CAST(a.n AS DOUBLE))) > 2.0
                THEN CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)
                ELSE CAST(c.v AS DOUBLE) END AS adapted
    FROM cells c LEFT JOIN agg a ON a.cell_id = c.cell_id
    """,
)
def raster_adaptive3x3(sf_dir: str):
    """AdaptiveFilter (image_analysis/adaptive_filter.rs:456-470, threshold
    2.0 sd): mean = S1/n (min_val = 0), s = sqrt((S2 - S1*S1/n)/n); output
    mean where |(z - mean)/s| > 2 and the variance is positive, else z.
    Same expression tree both sides -> bit-exact floats and identical
    branch decisions."""

    def kern(padded, nr, nc, r0, c0):
        st = _shifted(padded, nr, nc)
        valid = _intwin_valid(nr, nc, r0, c0)
        stm = np.where(valid, st, np.nan)
        z = padded[1:nr + 1, 1:nc + 1]
        n = valid.sum(axis=0).astype(np.float64)
        s1 = np.nansum(stm, axis=0)
        s2 = np.nansum(stm * stm, axis=0)
        v = (s2 - (s1 * s1) / n) / n
        mean = s1 / n
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.sqrt(np.maximum(v, 0))
            trig = (v > 0) & (np.abs((z - mean) / s) > 2.0)
        return {"adapted": np.where(trig, mean, z)}

    ds = _abs_stencil(kern)
    return ds.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "adapted": df["adapted"].astype(np.float64)}),
        batch_format="pandas")


@query(
    "raster_percentile3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_plainwin_union()}),
    agg AS (SELECT cell_id, COUNT(*) AS n,
                   SUM(CASE WHEN v < cv THEN 1 ELSE 0 END) AS nl
            FROM nb GROUP BY cell_id)
    SELECT cell_id, CAST(nl AS DOUBLE) / CAST(n AS DOUBLE) * 100.0 AS pctile
    FROM agg
    """,
)
def raster_percentile3x3(sf_dir: str):
    """PercentileFilter (image_analysis/percentile_filter.rs:445-455):
    percentile of the CENTRE value within its (plain, clipped) 3x3 window =
    n_less_than / n * 100 over the sliding histogram; the window includes
    the centre (its own bin is not 'less than').  Integer counts, one float
    division — same tree both sides."""

    def kern(padded, nr, nc, r0, c0):
        st = _shifted(padded, nr, nc)
        z = padded[1:nr + 1, 1:nc + 1]
        n = np.sum(~np.isnan(st), axis=0).astype(np.float64)
        with np.errstate(invalid="ignore"):
            nl = np.nansum((st < z[None, :, :]).astype(np.float64)
                           * (~np.isnan(st)), axis=0)
        return {"pctile": nl / n * 100.0}

    ds = _abs_stencil(kern)
    return ds.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "pctile": df["pctile"].astype(np.float64)}),
        batch_format="pandas")


@query(
    "raster_user_weights",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({" UNION ALL ".join(
        f"SELECT a.cell_id, {w} * b.v AS wv FROM cells a "
        f"JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for (dr, dc), w in zip(_ALL9, (1, 2, 1, 2, 4, 2, 1, 2, 1)))})
    SELECT cell_id, CAST(SUM(wv) AS BIGINT) AS wsum
    FROM nb GROUP BY cell_id
    """,
)
def raster_user_weights(sf_dir: str):
    """UserDefinedWeightsFilter (image_analysis/user_defined_weights_filter.rs,
    centre kernel, --normalize off): sum of weight*value over the valid
    (clipped) window with the binomial kernel [[1,2,1],[2,4,2],[1,2,1]];
    integer-exact."""
    wts = np.array([1, 2, 1, 2, 4, 2, 1, 2, 1], np.float64)

    def kern(padded, nr, nc, r0, c0):
        st = _shifted(padded, nr, nc)
        return {"wsum": np.nansum(st * wts[:, None, None], axis=0)}

    ds = _abs_stencil(kern)
    return ds.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "wsum": df["wsum"].astype(np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# Exchange-free per-cell image ops
# --------------------------------------------------------------------------

@query(
    "raster_flip",
    f"""
    WITH {_CELLS_CTE}
    SELECT a.cell_id,
           CAST(bv.v AS BIGINT) AS vflip,
           CAST(bh.v AS BIGINT) AS hflip,
           CAST(bb.v AS BIGINT) AS bflip
    FROM cells a
    JOIN cells bv ON bv.r = {_ROWS - 1} - a.r AND bv.c = a.c
    JOIN cells bh ON bh.r = a.r AND bh.c = {_COLS - 1} - a.c
    JOIN cells bb ON bb.r = {_ROWS - 1} - a.r AND bb.c = {_COLS - 1} - a.c
    """,
)
def raster_flip(sf_dir: str):
    """FlipImage (image_analysis/flip_image.rs:224-240), all three
    directions in one result: out[r,c] = in[rows-1-r, c] (v), in[r,cols-1-c]
    (h), in[rows-1-r, cols-1-c] (b).  Exchange-free: each SOURCE tile emits
    its values at their mirrored DESTINATION cell ids (three destinations
    per source cell) — a pure map; the 100 TB pattern needs no shuffle at
    all because downstream sinks partition by dest tile anyway."""
    import ray

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * _TILE, int(t.tcol) * _TILE
            nr, nc = int(t.nrows), int(t.ncols)
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                                 indexing="ij")
            rr, cc = rr.ravel().astype(np.int64), cc.ravel().astype(np.int64)
            v = np.asarray(t.data, np.float64).astype(np.int64)
            neg = np.full(len(v), -1, np.int64)
            # source cell (r,c)'s value lands at three mirrored destinations;
            # missing flavours are -1 so a per-column Max recombines them
            # (all raster values are >= 0).
            frames.append(pd.DataFrame({
                "cell_id": (_ROWS - 1 - rr) * _COLS + cc,
                "vflip": v, "hflip": neg, "bflip": neg}))
            frames.append(pd.DataFrame({
                "cell_id": rr * _COLS + (_COLS - 1 - cc),
                "vflip": neg, "hflip": v, "bflip": neg}))
            frames.append(pd.DataFrame({
                "cell_id": (_ROWS - 1 - rr) * _COLS + (_COLS - 1 - cc),
                "vflip": neg, "hflip": neg, "bflip": v}))
        return pd.concat(frames, ignore_index=True)

    ds = tiles.map_batches(emit, batch_format="pandas")
    # tree-combine partial max instead of Ray's groupby aggregate: the
    # sort-based aggregate walks groups in Python (~4k groups/s measured),
    # which at one group PER CELL dwarfs the actual flip work
    from ..relational import partial_agg

    return partial_agg(ds, ["cell_id"],
                       [("vflip", "max", "vflip"),
                        ("hflip", "max", "hflip"),
                        ("bflip", "max", "bflip")])


# --- two-band ops ---------------------------------------------------------

_U2_SQL = "((t.i * 999983 + 421) % 1000)"
_W1_SQL = "((t.i * 999979 + 77) % 1000)"
_W2_SQL = "((t.i * 999961 + 13) % 1000)"

_CELLS2 = (f"cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id, "
           f"((t.i * 1000003) % 1000) AS v, {_U2_SQL} AS u2, "
           f"{_W1_SQL} AS w1, {_W2_SQL} AS w2 "
           f"FROM range({_ROWS * _COLS}) t(i))")


def _bands2(cells: np.ndarray):
    c = cells.astype(np.int64)
    u2 = ((c * 999983 + 421) % 1000).astype(np.float64)
    w1 = ((c * 999979 + 77) % 1000).astype(np.float64)
    w2 = ((c * 999961 + 13) % 1000).astype(np.float64)
    return u2, w1, w2


def _percell(out_fn):
    """Exchange-free per-cell op over (v, u2, w1, w2) bands."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * _TILE, int(t.tcol) * _TILE
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * _COLS + cc.astype(np.int64)).ravel()
            v = np.asarray(t.data, np.float64)
            u2, w1, w2 = _bands2(cells)
            res = out_fn(v, u2, w1, w2)
            res["cell_id"] = cells
            frames.append(pd.DataFrame(res))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


@query(
    "change_vector_analysis",
    f"""
    WITH {_CELLS2}
    SELECT cell_id,
           sqrt(CAST((w1 - v) * (w1 - v) + (w2 - u2) * (w2 - u2) AS DOUBLE)) AS magnitude,
           CAST(CASE WHEN w1 - v >= 0 THEN 1 ELSE 0 END
                + CASE WHEN w2 - u2 >= 0 THEN 2 ELSE 0 END AS BIGINT) AS sector
    FROM cells
    """,
)
def change_vector_analysis(sf_dir: str):
    """ChangeVectorAnalysis (image_analysis/change_vector_analysis.rs:
    334-361 accumulate z^2 and 2^i where z = date2-date1 >= 0; finalize
    magnitude = sqrt at :356-362).  Two bands per date: date1 = (v, u2),
    date2 = (w1, w2).  The squared sum is integer-exact; sqrt is one
    correctly-rounded call on both sides."""

    def f(v, u2, w1, w2):
        d1, d2 = w1 - v, w2 - u2
        return {"magnitude": np.sqrt(d1 * d1 + d2 * d2),
                "sector": ((d1 >= 0).astype(np.int64)
                           + 2 * (d2 >= 0).astype(np.int64))}

    return _percell(f)


@query(
    "normalized_diff_index",
    f"""
    WITH {_CELLS2}
    SELECT cell_id,
           CASE WHEN v + u2 <> 0
                THEN CAST(v - u2 AS DOUBLE) / CAST(v + u2 AS DOUBLE)
                ELSE 0.0 END AS ndi
    FROM cells
    """,
)
def normalized_diff_index(sf_dir: str):
    """NormalizedDifferenceIndex (image_analysis/
    normalized_difference_index.rs:346-352, correction factor 0): (b1-b2)/
    (b1+b2), 0 where the denominator is zero.  One float division, same
    tree both sides."""

    def f(v, u2, w1, w2):
        den = v + u2
        with np.errstate(invalid="ignore", divide="ignore"):
            nd = np.where(den != 0, (v - u2) / np.where(den != 0, den, 1.0), 0.0)
        return {"ndi": nd}

    return _percell(f)


@query(
    "raster_gamma_correction",
    f"""
    WITH {_CELLS_CTE}
    SELECT cell_id, sqrt(CAST(v AS DOUBLE)) AS gcorr FROM cells
    """,
)
def raster_gamma_correction(sf_dir: str):
    """GammaCorrection (image_analysis/gamma_correction.rs:279, greyscale
    path z_out = z_in^gamma) with gamma = 0.5: z^0.5 = sqrt(z) — a single
    correctly-rounded sqrt on both sides (powf(0.5) == sqrt for finite
    nonnegative IEEE doubles)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * _TILE, int(t.tcol) * _TILE
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * _COLS + cc.astype(np.int64)).ravel()
            frames.append(pd.DataFrame({
                "cell_id": cells,
                "gcorr": np.sqrt(np.asarray(t.data, np.float64))}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


# --- colour composite / split --------------------------------------------

# band -> 0..255 exactly as create_colour_composite.rs:387-412:
# scaled = (z - min)/range * 255, clamped, then TRUNCATED by `as u32`
# (min = 0, range = 999 for all synthetic bands).  The float divide+multiply
# then floor is replicated verbatim — (z/999)*255 truncates DOWN even when
# the product lands epsilon below an integer.
_SCALE = "CAST(floor(CAST({b} AS DOUBLE) / 999.0 * 255.0) AS BIGINT)"


@query(
    "colour_composite",
    f"""
    WITH {_CELLS2}
    SELECT cell_id,
           CAST(CAST(255 AS BIGINT) * 16777216
                + {_SCALE.format(b='w1')} * 65536
                + {_SCALE.format(b='u2')} * 256
                + {_SCALE.format(b='v')} AS BIGINT) AS argb
    FROM cells
    """,
)
def colour_composite(sf_dir: str):
    """CreateColourComposite (image_analysis/create_colour_composite.rs:
    380-430): r/g/b scaled to 0..255 by (z-min)/range*255 with `as u32`
    truncation, packed a<<24 | b<<16 | g<<8 | r (alpha = 255, the
    no-opacity default; byte order per split_colour_composite.rs:260-262)."""

    def f(v, u2, w1, w2):
        r = np.floor(v / 999.0 * 255.0)
        g = np.floor(u2 / 999.0 * 255.0)
        b = np.floor(w1 / 999.0 * 255.0)
        return {"argb": (255 * 16777216 + b.astype(np.int64) * 65536
                         + g.astype(np.int64) * 256
                         + r.astype(np.int64))}

    return _percell(f)


@query(
    "split_colour_composite",
    f"""
    WITH {_CELLS2},
    comp AS (SELECT cell_id,
                    CAST(CAST(255 AS BIGINT) * 16777216
                         + {_SCALE.format(b='w1')} * 65536
                         + {_SCALE.format(b='u2')} * 256
                         + {_SCALE.format(b='v')} AS BIGINT) AS argb
             FROM cells)
    SELECT cell_id,
           CAST(argb % 256 AS BIGINT) AS red,
           CAST((argb // 256) % 256 AS BIGINT) AS green,
           CAST((argb // 65536) % 256 AS BIGINT) AS blue
    FROM comp
    """,
)
def split_colour_composite(sf_dir: str):
    """SplitColourComposite (image_analysis/split_colour_composite.rs:
    260-262): red = val & 0xFF, green = (val >> 8) & 0xFF, blue =
    (val >> 16) & 0xFF — chained after the composite packing so the pair
    round-trips."""

    def f(v, u2, w1, w2):
        r = np.floor(v / 999.0 * 255.0).astype(np.int64)
        g = np.floor(u2 / 999.0 * 255.0).astype(np.int64)
        b = np.floor(w1 / 999.0 * 255.0).astype(np.int64)
        argb = 255 * 16777216 + b * 65536 + g * 256 + r
        return {"red": argb & 0xFF, "green": (argb >> 8) & 0xFF,
                "blue": (argb >> 16) & 0xFF}

    return _percell(f)
