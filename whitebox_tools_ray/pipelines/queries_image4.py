"""Image sweep #4 — colour-space ops, global contrast stretches, and the
value-adaptive 3x3 filters.

Synthetic 8-bit bands (1..255, never 0 so the IHS normalisation r+g+b and
rn/gn/bn denominators are always defined):
    r = 1 + (cell*1000003) % 255,  g = 1 + (cell*999983+17) % 255,
    b = 1 + (cell*999979+5) % 255, pan = 1 + (cell*997+3) % 255

Float contract notes (same taxonomy as queries_mathops2):
- EXACT trees (bit-identical floats, no rounding needed): every op whose
  only irrational step is IEEE +-*/ or sqrt over integer-derived values —
  lee/sigma filter, edge-preserving mean, percentage & stdev stretches,
  balance contrast enhancement, direct decorrelation, Brovey pan-sharpen.
- MICRO/MILLI-ROUNDED (numpy and DuckDB libm disagree by ulps on
  acos/cos/exp): rgb→IHS hue, IHS→rgb round-trip, sigmoidal stretch,
  bilateral filter. Both sides emit sign(f)*floor(|f|*S + 0.5) as BIGINT;
  tests/test_image4.py re-asserts the guard band (min distance to a
  rounding boundary across all distinct inputs >> cross-library drift).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from ..stages.raster import stencil_3x3, synth_raster_tiles
from .queries import query

_N = GRID1.rows * GRID1.cols
_ALL9 = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
_RING8 = [(dr, dc) for (dr, dc) in _ALL9 if (dr, dc) != (0, 0)]

_R_SQL = "(1 + (t.i * 1000003) % 255)"
_G_SQL = "(1 + (t.i * 999983 + 17) % 255)"
_B_SQL = "(1 + (t.i * 999979 + 5) % 255)"
_P_SQL = "(1 + (t.i * 997 + 3) % 255)"

_RGB_CTE = (f"rgb AS (SELECT CAST(t.i AS BIGINT) AS cell_id, "
            f"CAST({_R_SQL} AS DOUBLE) AS r, CAST({_G_SQL} AS DOUBLE) AS g, "
            f"CAST({_B_SQL} AS DOUBLE) AS b, CAST({_P_SQL} AS DOUBLE) AS p "
            f"FROM range({_N}) t(i))")


def _rgb_of(cells: np.ndarray):
    c = cells.astype(np.int64)
    r = (1 + (c * 1000003) % 255).astype(np.float64)
    g = (1 + (c * 999983 + 17) % 255).astype(np.float64)
    b = (1 + (c * 999979 + 5) % 255).astype(np.float64)
    p = (1 + (c * 997 + 3) % 255).astype(np.float64)
    return r, g, b, p


def _percell_rgb(fn):
    """map_batches over tile rows; fn(cells, r, g, b, pan) -> dict of cols."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            r, g, b, p = _rgb_of(cells)
            frames.append(pd.DataFrame({"cell_id": cells} | fn(cells, r, g, b, p)))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


def _round_micro(v: np.ndarray, scale: float = 1e6) -> np.ndarray:
    return np.where(v >= 0, np.floor(v * scale + 0.5),
                    -np.floor(-v * scale + 0.5)).astype(np.int64)


# --- RGB -> IHS (rgb_to_ihs.rs:783-830 value2hsi) -------------------------

_HUE_EXPR = """CASE WHEN rn = gn AND rn = bn THEN 0.0
    WHEN b > g THEN 2.0 * pi() - acos((0.5 * ((rn - gn) + (rn - bn)))
        / sqrt((rn - gn) * (rn - gn) + (rn - bn) * (gn - bn)))
    ELSE acos((0.5 * ((rn - gn) + (rn - bn)))
        / sqrt((rn - gn) * (rn - gn) + (rn - bn) * (gn - bn))) END"""


@query(
    "rgb_to_ihs",
    f"""
    WITH {_RGB_CTE},
    nrm AS (SELECT cell_id, r / 255.0 AS r1, g / 255.0 AS g1, b / 255.0 AS b1,
                   (r / 255.0) / (r / 255.0 + g / 255.0 + b / 255.0) AS rn,
                   (g / 255.0) / (r / 255.0 + g / 255.0 + b / 255.0) AS gn,
                   (b / 255.0) / (r / 255.0 + g / 255.0 + b / 255.0) AS bn,
                   g, b
            FROM rgb)
    SELECT cell_id,
           CAST(floor(({_HUE_EXPR}) * 1e6 + 0.5) AS BIGINT) AS h_micro,
           1.0 - 3.0 * LEAST(rn, gn, bn) AS s,
           (r1 + g1 + b1) / 3.0 AS i
    FROM nrm
    """,
)
def rgb_to_ihs(sf_dir: str):
    """RgbToIhs (image_analysis/rgb_to_ihs.rs:783-830 value2hsi): normalise
    to 0..1, h = acos(0.5*((rn-gn)+(rn-bn)) / sqrt((rn-gn)^2 + (rn-bn)(gn-bn)))
    reflected to 2pi-h when b > g (0 on grey), s = 1 - 3*min(rn,gn,bn),
    i = (r+g+b)/3. s and i are exact rational trees; h passes through acos so
    it is emitted in micro-units (module docstring guard-band contract)."""

    def fn(c, r, g, b, p):
        r1, g1, b1 = r / 255.0, g / 255.0, b / 255.0
        tot = r1 + g1 + b1
        rn, gn, bn = r1 / tot, g1 / tot, b1 / tot
        grey = (rn == gn) & (rn == bn)
        with np.errstate(invalid="ignore", divide="ignore"):
            core = np.arccos((0.5 * ((rn - gn) + (rn - bn)))
                             / np.sqrt((rn - gn) * (rn - gn)
                                       + (rn - bn) * (gn - bn)))
        h = np.where(grey, 0.0, np.where(b > g, 2.0 * np.pi - core, core))
        s = 1.0 - 3.0 * np.minimum(np.minimum(rn, gn), bn)
        return {"h_micro": np.floor(h * 1e6 + 0.5).astype(np.int64),
                "s": s, "i": tot / 3.0}

    return _percell_rgb(fn)


# --- IHS -> RGB round-trip (ihs_to_rgb.rs:598-630 hsi2value) --------------

_SECTOR = """i * (1.0 + (s * cos(hh)) / cos(pi() / 3.0 - hh))"""


@query(
    "ihs_to_rgb",
    f"""
    WITH {_RGB_CTE},
    nrm AS (SELECT cell_id, g AS g0, b AS b0,
                   (r / 255.0) / (r / 255.0 + g / 255.0 + b / 255.0) AS rn,
                   (g / 255.0) / (r / 255.0 + g / 255.0 + b / 255.0) AS gn,
                   (b / 255.0) / (r / 255.0 + g / 255.0 + b / 255.0) AS bn,
                   (r / 255.0 + g / 255.0 + b / 255.0) / 3.0 AS i
            FROM rgb),
    ihs AS (SELECT cell_id, i,
                   1.0 - 3.0 * LEAST(rn, gn, bn) AS s,
                   CASE WHEN rn = gn AND rn = bn THEN 0.0
                        WHEN b0 > g0 THEN 2.0 * pi()
                            - acos((0.5 * ((rn - gn) + (rn - bn)))
                                   / sqrt((rn - gn) * (rn - gn)
                                          + (rn - bn) * (gn - bn)))
                        ELSE acos((0.5 * ((rn - gn) + (rn - bn)))
                                  / sqrt((rn - gn) * (rn - gn)
                                         + (rn - bn) * (gn - bn))) END AS h
            FROM nrm),
    sector AS (SELECT cell_id, i, s, h,
                      CASE WHEN h < 2.0 * pi() / 3.0 THEN 0
                           WHEN h < 4.0 * pi() / 3.0 THEN 1 ELSE 2 END AS sec,
                      CASE WHEN h < 2.0 * pi() / 3.0 THEN h
                           WHEN h < 4.0 * pi() / 3.0 THEN h - 2.0 * pi() / 3.0
                           ELSE h - 4.0 * pi() / 3.0 END AS hh
               FROM ihs),
    xyz AS (SELECT cell_id, sec, i * (1.0 - s) AS x, {_SECTOR} AS y,
                   3.0 * i - (i * (1.0 - s) + {_SECTOR}) AS z
            FROM sector)
    SELECT cell_id,
           CAST(floor(255.0 * (CASE sec WHEN 0 THEN y WHEN 1 THEN x ELSE z END)
                      + 0.5) AS BIGINT) AS r_out,
           CAST(floor(255.0 * (CASE sec WHEN 0 THEN z WHEN 1 THEN y ELSE x END)
                      + 0.5) AS BIGINT) AS g_out,
           CAST(floor(255.0 * (CASE sec WHEN 0 THEN x WHEN 1 THEN z ELSE y END)
                      + 0.5) AS BIGINT) AS b_out
    FROM xyz
    """,
)
def ihs_to_rgb(sf_dir: str):
    """IhsToRgb (image_analysis/ihs_to_rgb.rs:598-630 hsi2value) chained
    after the forward transform (round-trip, like split_colour_composite):
    x = i(1-s), y = i(1 + s*cos(h')/cos(pi/3 - h')), z = 3i - x - y assigned
    to (r,g,b) by the 2pi/3 sector, each scaled *255 and rounded half-up.
    The rounded u8 outputs are deterministic-safe (guard band re-asserted by
    tests/test_image4.py: no y*255 lands within 1e-4 of a .5 boundary while
    cross-library cos/acos drift is < 1e-10)."""

    def fn(c, r, g, b, p):
        r1, g1, b1 = r / 255.0, g / 255.0, b / 255.0
        tot = r1 + g1 + b1
        rn, gn, bn = r1 / tot, g1 / tot, b1 / tot
        grey = (rn == gn) & (rn == bn)
        with np.errstate(invalid="ignore", divide="ignore"):
            core = np.arccos((0.5 * ((rn - gn) + (rn - bn)))
                             / np.sqrt((rn - gn) * (rn - gn)
                                       + (rn - bn) * (gn - bn)))
        h = np.where(grey, 0.0, np.where(b > g, 2.0 * np.pi - core, core))
        s = 1.0 - 3.0 * np.minimum(np.minimum(rn, gn), bn)
        i = tot / 3.0
        sec = np.where(h < 2.0 * np.pi / 3.0, 0,
                       np.where(h < 4.0 * np.pi / 3.0, 1, 2))
        hh = h - np.where(sec == 0, 0.0,
                          np.where(sec == 1, 2.0 * np.pi / 3.0,
                                   4.0 * np.pi / 3.0))
        x = i * (1.0 - s)
        y = i * (1.0 + (s * np.cos(hh)) / np.cos(np.pi / 3.0 - hh))
        z = 3.0 * i - (x + y)
        ro = np.choose(sec, [y, x, z])
        go = np.choose(sec, [z, y, x])
        bo = np.choose(sec, [x, z, y])
        return {"r_out": np.floor(255.0 * ro + 0.5).astype(np.int64),
                "g_out": np.floor(255.0 * go + 0.5).astype(np.int64),
                "b_out": np.floor(255.0 * bo + 0.5).astype(np.int64)}

    return _percell_rgb(fn)


# --- DirectDecorrelationStretch (direct_decorrelation_stretch.rs:300-326) --


@query(
    "direct_decorrelation_stretch",
    f"""
    WITH {_RGB_CTE}
    SELECT cell_id,
           CAST(trunc(GREATEST(0.0, LEAST(255.0, r - 0.5 * LEAST(r, g, b))))
                AS BIGINT) AS r_out,
           CAST(trunc(GREATEST(0.0, LEAST(255.0, g - 0.5 * LEAST(r, g, b))))
                AS BIGINT) AS g_out,
           CAST(trunc(GREATEST(0.0, LEAST(255.0, b - 0.5 * LEAST(r, g, b))))
                AS BIGINT) AS b_out
    FROM rgb
    """,
)
def direct_decorrelation_stretch(sf_dir: str):
    """DirectDecorrelationStretch (direct_decorrelation_stretch.rs:300-326):
    out_band = band - k*min(r,g,b) with the default achromatic factor
    k = 0.5, clamped to [0,255] and truncated by the `as u8` store. The
    reference then pipes the result through its optional percentage clip
    stretch — that stage is the separately-implemented
    percentage_contrast_stretch; here we emit the decorrelated bands.
    Exact halves arithmetic — bit-exact."""

    def fn(c, r, g, b, p):
        m = 0.5 * np.minimum(np.minimum(r, g), b)
        out = {}
        for k, band in (("r_out", r), ("g_out", g), ("b_out", b)):
            out[k] = np.trunc(np.clip(band - m, 0.0, 255.0)).astype(np.int64)
        return out

    return _percell_rgb(fn)


# --- BalanceContrastEnhancement (balance_contrast_enhancement.rs:370-440) --

_BCE_ST = (f"st AS (SELECT CAST(MIN(r) AS DOUBLE) AS rl, CAST(MAX(r) AS DOUBLE) AS rh, "
           f"SUM(r) / COUNT(*) AS re, SUM(r * r) / COUNT(*) AS rs, "
           f"CAST(MIN(g) AS DOUBLE) AS gl, CAST(MAX(g) AS DOUBLE) AS gh, "
           f"SUM(g) / COUNT(*) AS ge, SUM(g * g) / COUNT(*) AS gs, "
           f"CAST(MIN(b) AS DOUBLE) AS bl, CAST(MAX(b) AS DOUBLE) AS bh, "
           f"SUM(b) / COUNT(*) AS be, SUM(b * b) / COUNT(*) AS bs "
           f"FROM rgb)")


def _bce_band_sql(x: str, lo: str, hi: str, e_: str, s_: str) -> str:
    bb = (f"(({hi} * {hi} * (100.0 - 0.0) - {s_} * (255.0 - 0.0) "
          f"+ {lo} * {lo} * (255.0 - 100.0)) "
          f"/ (2.0 * ({hi} * (100.0 - 0.0) - {e_} * (255.0 - 0.0) "
          f"+ {lo} * (255.0 - 100.0))))")
    aa = f"((255.0 - 0.0) / (({hi} - {lo}) * ({hi} + {lo} - 2.0 * {bb})))"
    cc = f"(0.0 - {aa} * (({lo} - {bb}) * ({lo} - {bb})))"
    return (f"GREATEST(0.0, LEAST(255.0, {aa} * (({x} - {bb}) * ({x} - {bb}))"
            f" + {cc}))")


@query(
    "balance_contrast_enhancement",
    f"""
    WITH {_RGB_CTE}, {_BCE_ST}
    SELECT cell_id,
           {_bce_band_sql('c.r', 'st.rl', 'st.rh', 'st.re', 'st.rs')} AS r_out,
           {_bce_band_sql('c.g', 'st.gl', 'st.gh', 'st.ge', 'st.gs')} AS g_out,
           {_bce_band_sql('c.b', 'st.bl', 'st.bh', 'st.be', 'st.bs')} AS b_out
    FROM rgb c, st
    """,
)
def balance_contrast_enhancement(sf_dir: str):
    """BalanceContrastEnhancement (balance_contrast_enhancement.rs:370-440):
    per band the parabolic transform out = a(x-b)^2 + c with
    b = (h_x^2(E-L) - s_x(H-L) + l_x^2(H-E)) / 2(h_x(E-L) - e_x(H-L) + l_x(H-E)),
    a = (H-L)/((h_x-l_x)(h_x+l_x-2b)), c = L - a(l_x-b)^2, where L=0, H=255,
    E=100 (the default --band_mean), l/h/e/s are the band min, max, mean and
    mean square. Two-pass: distributed integer stats, broadcast coefficients
    into the per-cell map. Exact expression tree — bit-identical."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(7, np.int64)  # n, sr, srr, sg, sgg, sb, sbb
        mn = np.full(3, 1 << 60, np.int64)
        mx = np.full(3, -(1 << 60), np.int64)
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            r, g, b, _ = _rgb_of(cells)
            for j, band in enumerate((r, g, b)):
                bi = band.astype(np.int64)
                acc[1 + 2 * j] += bi.sum()
                acc[2 + 2 * j] += (bi * bi).sum()
                mn[j] = min(mn[j], bi.min())
                mx[j] = max(mx[j], bi.max())
            acc[0] += cells.size
        return pd.DataFrame({"k": list(range(7)), "v": acc} | {
            "mn": list(mn) + [0] * 4, "mx": list(mx) + [0] * 4})

    s = (synth_raster_tiles(GRID1, _value_fn)
         .map_batches(partial, batch_format="pandas").to_pandas())
    tot = s.groupby("k")["v"].sum()
    n = np.float64(tot[0])
    coef = {}
    for j, key in enumerate("rgb"):
        lo = np.float64(int(s.loc[s["k"] == j, "mn"].min()))
        hi = np.float64(int(s.loc[s["k"] == j, "mx"].max()))
        e_ = np.float64(int(tot[1 + 2 * j])) / n
        s_ = np.float64(int(tot[2 + 2 * j])) / n
        bb = ((hi * hi * (100.0 - 0.0) - s_ * (255.0 - 0.0)
               + lo * lo * (255.0 - 100.0))
              / (2.0 * (hi * (100.0 - 0.0) - e_ * (255.0 - 0.0)
                        + lo * (255.0 - 100.0))))
        aa = (255.0 - 0.0) / ((hi - lo) * (hi + lo - 2.0 * bb))
        cc = 0.0 - aa * ((lo - bb) * (lo - bb))
        coef[key] = (aa, bb, cc)

    def fn(c, r, g, b, p):
        out = {}
        for key, band in (("r", r), ("g", g), ("b", b)):
            aa, bb, cc = coef[key]
            out[key + "_out"] = np.minimum(
                255.0, np.maximum(0.0, aa * ((band - bb) * (band - bb)) + cc))
        return out

    return _percell_rgb(fn)


# --- Brovey pan-sharpening (pan_sharpening.rs, --method=brovey) -----------


@query(
    "pan_sharpen_brovey",
    f"""
    WITH {_RGB_CTE}
    SELECT cell_id,
           CAST(floor(GREATEST(0.0, LEAST(255.0, r * p / ((r + g + b) / 3.0)))
                      + 0.5) AS BIGINT) AS r_out,
           CAST(floor(GREATEST(0.0, LEAST(255.0, g * p / ((r + g + b) / 3.0)))
                      + 0.5) AS BIGINT) AS g_out,
           CAST(floor(GREATEST(0.0, LEAST(255.0, b * p / ((r + g + b) / 3.0)))
                      + 0.5) AS BIGINT) AS b_out
    FROM rgb
    """,
)
def pan_sharpen_brovey(sf_dir: str):
    """PanchromaticSharpening (image_analysis/pan_sharpening.rs, Brovey
    method): out_band = band * pan / ((r+g+b)/3), clamped to [0,255] and
    rounded. Rational arithmetic over integer bands — the quotient is
    bit-identical on both sides, so the rounded u8s match exactly."""

    def fn(c, r, g, b, p):
        i = (r + g + b) / 3.0
        out = {}
        for k, band in (("r_out", r), ("g_out", g), ("b_out", b)):
            out[k] = np.floor(np.minimum(255.0, np.maximum(0.0, band * p / i))
                              + 0.5).astype(np.int64)
        return out

    return _percell_rgb(fn)


# --- WriteFunctionMemoryInsertion (write_func_memory_insertion.rs) --------


@query(
    "write_func_memory_insertion",
    f"""
    WITH {_RGB_CTE}
    SELECT cell_id,
           CAST(CAST(255 AS BIGINT) * 16777216
                + CAST(g AS BIGINT) * 65536
                + CAST(g AS BIGINT) * 256
                + CAST(r AS BIGINT) AS BIGINT) AS argb
    FROM rgb
    """,
)
def write_func_memory_insertion(sf_dir: str):
    """WriteFunctionMemoryInsertion (image_analysis/
    write_func_memory_insertion.rs): change-detection composite — image 1
    (here band r) into the red channel, image 2 (band g) into green AND
    blue (the two-date case), packed a<<24|b<<16|g<<8|r like
    create_colour_composite. Integer-exact."""

    def fn(c, r, g, b, p):
        argb = (255 * 16777216 + g.astype(np.int64) * 65536
                + g.astype(np.int64) * 256 + r.astype(np.int64))
        return {"argb": argb}

    return _percell_rgb(fn)


# --- ImageStackProfile (image_analysis/image_stack_profile.rs) ------------


@query(
    "image_stack_profile",
    f"""
    WITH {_RGB_CTE}
    SELECT cell_id, CAST(1 AS BIGINT) AS band_num, CAST(r AS BIGINT) AS value
    FROM rgb WHERE cell_id % 6121 = 0
    UNION ALL
    SELECT cell_id, CAST(2 AS BIGINT), CAST(g AS BIGINT)
    FROM rgb WHERE cell_id % 6121 = 0
    UNION ALL
    SELECT cell_id, CAST(3 AS BIGINT), CAST(b AS BIGINT)
    FROM rgb WHERE cell_id % 6121 = 0
    """,
)
def image_stack_profile(sf_dir: str):
    """ImageStackProfile (image_analysis/image_stack_profile.rs): for each
    probe point, the value in every image of the stack (here the 3 synthetic
    bands; probes = every 6121st cell). The multi-raster read is the
    co-partitioned tile-stack pattern (queries_overlay2); output is
    (point, band index, value) long-form, like the reference's profile
    table. Integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            keep = (cells % 6121) == 0
            if not keep.any():
                continue
            cid = cells[keep]
            r, g, b, _ = _rgb_of(cid)
            for num, band in ((1, r), (2, g), (3, b)):
                frames.append(pd.DataFrame({
                    "cell_id": cid, "band_num": np.int64(num),
                    "value": band.astype(np.int64)}))
        if not frames:
            return pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                                 "band_num": pd.Series([], dtype=np.int64),
                                 "value": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


# --- Global stretches on the v band ---------------------------------------

_HIST_TAIL = """
    hist AS (SELECT v, COUNT(*) AS n FROM cells GROUP BY v),
    tot AS (SELECT SUM(n) AS n, CAST(round(SUM(n) * 1.0 / 100.0, 0) AS BIGINT)
                   AS tail FROM hist),
    lo AS (SELECT MIN(v) AS minv FROM
           (SELECT v, SUM(n) OVER (ORDER BY v) AS cum FROM hist), tot
           WHERE cum >= tot.tail),
    hi AS (SELECT MAX(v) AS maxv FROM
           (SELECT v, SUM(n) OVER (ORDER BY v DESC) AS cum FROM hist), tot
           WHERE cum >= tot.tail)
"""


@query(
    "percentage_contrast_stretch",
    f"""
    WITH {_CELLS_CTE}, {_HIST_TAIL}
    SELECT c.cell_id,
           CAST(GREATEST(0.0, LEAST(255.0,
                floor((c.v - lo.minv) / CAST(hi.maxv - lo.minv AS DOUBLE)
                      * 256.0))) AS BIGINT) AS tone
    FROM cells c, lo, hi
    """,
)
def percentage_contrast_stretch(sf_dir: str):
    """PercentageContrastStretch (percentage_contrast_stretch.rs:336-395):
    clip both tails at 1% (tail cell count = round(n*clip/100); min_val =
    first value whose cumulative count reaches the tail from below, max_val
    symmetric from above), then z_out = floor((z-min)/range*num_tones)
    clamped to [0, 255] (num_tones=256). Histogram pass is a tiny
    distributed value-count; the map is per-cell. Integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def hists(df: pd.DataFrame) -> pd.DataFrame:
        vals, cnts = np.unique(
            np.concatenate([np.asarray(t.data, np.int64) for t in df.itertuples()]),
            return_counts=True)
        return pd.DataFrame({"v": vals, "n": cnts.astype(np.int64)})

    from ..relational import partial_agg
    h = partial_agg(tiles.map_batches(hists, batch_format="pandas"),
                    ["v"], [("n", "sum", "n")]).to_pandas().sort_values("v")
    v = h["v"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64)
    total = int(n.sum())
    tail = int(np.floor(total * 1.0 / 100.0 + 0.5))
    cum = np.cumsum(n)
    minv = np.float64(v[np.argmax(cum >= tail)])
    cumd = np.cumsum(n[::-1])
    maxv = np.float64(v[::-1][np.argmax(cumd >= tail)])
    rng = maxv - minv

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            z = np.asarray(t.data, np.float64)
            tone = np.clip(np.floor((z - minv) / rng * 256.0), 0.0, 255.0)
            frames.append(pd.DataFrame({"cell_id": cells,
                                        "tone": tone.astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


@query(
    "stdev_contrast_stretch",
    f"""
    WITH {_CELLS_CTE},
    st AS (SELECT SUM(v) AS s1, SUM(v * v) AS s2, COUNT(*) AS n FROM cells),
    mm AS (SELECT CAST(s1 AS DOUBLE) / n
                  - 2.0 * sqrt(CAST(s2 AS DOUBLE) / n
                               - (CAST(s1 AS DOUBLE) / n)
                               * (CAST(s1 AS DOUBLE) / n)) AS minv,
                  CAST(s1 AS DOUBLE) / n
                  + 2.0 * sqrt(CAST(s2 AS DOUBLE) / n
                               - (CAST(s1 AS DOUBLE) / n)
                               * (CAST(s1 AS DOUBLE) / n)) AS maxv
           FROM st)
    SELECT c.cell_id,
           CAST(GREATEST(0.0, LEAST(255.0,
                floor((c.v - mm.minv) / (mm.maxv - mm.minv) * 256.0)))
                AS BIGINT) AS tone
    FROM cells c, mm
    """,
)
def stdev_contrast_stretch(sf_dir: str):
    """StandardDeviationContrastStretch (stdev_contrast_stretch.rs): clip at
    mean ± 2 population stdevs, then the same floor((z-min)/range*tones) map
    (num_tones=256). sqrt is IEEE-correctly-rounded in both numpy and
    DuckDB, so the whole tree is bit-exact from the integer sums."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s1 = s2 = n = 0
        for t in df.itertuples():
            z = np.asarray(t.data, np.int64)
            s1 += int(z.sum()); s2 += int((z * z).sum()); n += z.size
        return pd.DataFrame({"s1": [s1], "s2": [s2], "n": [n]})

    s = tiles.map_batches(partial, batch_format="pandas").to_pandas()
    s1, s2, n = int(s["s1"].sum()), int(s["s2"].sum()), int(s["n"].sum())
    mean = np.float64(s1) / np.float64(n)
    sd = np.sqrt(np.float64(s2) / np.float64(n) - mean * mean)
    minv, maxv = mean - 2.0 * sd, mean + 2.0 * sd

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            z = np.asarray(t.data, np.float64)
            tone = np.clip(np.floor((z - minv) / (maxv - minv) * 256.0),
                           0.0, 255.0)
            frames.append(pd.DataFrame({"cell_id": cells,
                                        "tone": tone.astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


@query(
    "sigmoidal_contrast_stretch",
    f"""
    WITH {_CELLS_CTE},
    mm AS (SELECT CAST(MIN(v) AS DOUBLE) AS minv, CAST(MAX(v) AS DOUBLE) AS maxv
           FROM cells),
    sc AS (SELECT 1.0 / (1.0 + exp(2.0 * 0.25)) AS a,
                  1.0 / (1.0 + exp(2.0 * (0.25 - 1.0)))
                  - 1.0 / (1.0 + exp(2.0 * 0.25)) AS b)
    SELECT c.cell_id,
           CAST(floor(((1.0 / (1.0 + exp(2.0 * (0.25
                       - (c.v - mm.minv) / (mm.maxv - mm.minv)))) - sc.a)
                      / sc.b * 1e6) + 0.5) AS BIGINT) AS v_micro
    FROM cells c, mm, sc
    """,
)
def sigmoidal_contrast_stretch(sf_dir: str):
    """SigmoidalContrastStretch (sigmoidal_contrast_stretch.rs:343-392):
    normalise z to 0..1 over the image min/max, then
    out = (1/(1+exp(gain*(cutoff - z))) - a) / b with
    a = 1/(1+exp(gain*cutoff)), b = 1/(1+exp(gain*(cutoff-1))) - a
    (gain=2, cutoff=0.25). exp passes through libm, so the 0..1 output is
    emitted in micro-units under the guard-band contract."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vs = np.concatenate([np.asarray(t.data, np.int64) for t in df.itertuples()])
        return pd.DataFrame({"mn": [int(vs.min())], "mx": [int(vs.max())]})

    s = tiles.map_batches(partial, batch_format="pandas").to_pandas()
    minv = np.float64(int(s["mn"].min()))
    maxv = np.float64(int(s["mx"].max()))
    gain, cutoff = 2.0, 0.25
    a = 1.0 / (1.0 + np.exp(gain * cutoff))
    b = 1.0 / (1.0 + np.exp(gain * (cutoff - 1.0))) - a

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            zn = (np.asarray(t.data, np.float64) - minv) / (maxv - minv)
            out = (1.0 / (1.0 + np.exp(gain * (cutoff - zn))) - a) / b
            frames.append(pd.DataFrame({
                "cell_id": cells,
                "v_micro": np.floor(out * 1e6 + 0.5).astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


# --- Value-adaptive 3x3 filters ------------------------------------------

def _nb9(with_w: bool = False) -> str:
    return " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS cv, CAST({dr} AS BIGINT) AS dr, "
        f"CAST({dc} AS BIGINT) AS dc, b.v "
        f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr, dc in _ALL9)


@query(
    "lee_sigma_filter",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb9()}),
    agg AS (SELECT cell_id,
                   SUM(CASE WHEN v >= cv - 10 AND v <= cv + 10 THEN v END) AS s_in,
                   COUNT(CASE WHEN v >= cv - 10 AND v <= cv + 10 THEN 1 END) AS n_in,
                   SUM(CASE WHEN dr <> 0 OR dc <> 0 THEN v END) AS s_rg,
                   COUNT(CASE WHEN dr <> 0 OR dc <> 0 THEN 1 END) AS n_rg
            FROM nb GROUP BY cell_id)
    SELECT cell_id,
           CASE WHEN n_in > 5 THEN CAST(s_in AS DOUBLE) / n_in
                ELSE CAST(s_rg AS DOUBLE) / n_rg END AS v
    FROM agg
    """,
)
def lee_sigma_filter(sf_dir: str):
    """LeeSigmaFilter (image_analysis/lee_filter.rs core loop): mean of the
    3x3 window cells within [z-sigma, z+sigma] (sigma=10, inclusive, centre
    included); if fewer than m=5+1 qualify, fall back to the mean of the 8
    ring neighbours. Off-grid cells are nodata and skipped (partial windows
    at edges, same as the reference). Integer selection + one division —
    bit-exact doubles."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        s_in = np.zeros((nr, nc)); n_in = np.zeros((nr, nc))
        s_rg = np.zeros((nr, nc)); n_rg = np.zeros((nr, nc))
        for dr, dc in _ALL9:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            ok = ~np.isnan(w)
            sel = ok & (w >= z - 10) & (w <= z + 10)
            s_in += np.where(sel, w, 0.0); n_in += sel
            if (dr, dc) != (0, 0):
                s_rg += np.where(ok, w, 0.0); n_rg += ok
        out = np.where(n_in > 5, s_in / np.where(n_in > 0, n_in, 1),
                       s_rg / np.where(n_rg > 0, n_rg, 1))
        return {"v": out}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "v": df["v"].astype(np.float64)}),
        batch_format="pandas")


@query(
    "edge_preserving_mean_filter",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb9()})
    SELECT cell_id,
           CAST(SUM(CASE WHEN ABS(v - cv) <= 150 THEN v END) AS DOUBLE)
           / COUNT(CASE WHEN ABS(v - cv) <= 150 THEN 1 END) AS v
    FROM nb GROUP BY cell_id
    """,
)
def edge_preserving_mean_filter(sf_dir: str):
    """EdgePreservingMeanFilter (image_analysis/edge_preserving_mean_filter
    .rs): mean of the 3x3 window cells whose absolute value difference from
    the centre is <= threshold (150); the centre always qualifies so the
    mean is defined everywhere. Integer selection + one division —
    bit-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        s = np.zeros((nr, nc)); n = np.zeros((nr, nc))
        for dr, dc in _ALL9:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            sel = ~np.isnan(w) & (np.abs(w - z) <= 150)
            s += np.where(sel, w, 0.0); n += sel
        return {"v": s / n}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "v": df["v"].astype(np.float64)}),
        batch_format="pandas")


@query(
    "highpass_median_filter",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb9()})
    SELECT cell_id, CAST(ANY_VALUE(cv) - MEDIAN(v) AS BIGINT) AS hpm
    FROM nb GROUP BY cell_id HAVING COUNT(*) = 9
    """,
)
def highpass_median_filter(sf_dir: str):
    """HighPassMedianFilter (image_analysis/highpass_median_filter.rs):
    z - median(3x3 window). Interior cells only (full 9-cell windows) so the
    median of an odd count of integers is itself an integer — exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        stack = np.stack([padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
                          for dr, dc in _ALL9])
        med = np.median(stack, axis=0)  # NaN when any neighbour missing
        full = ~np.isnan(stack).any(axis=0)
        return {"hpm": np.where(full, z - med, np.nan)}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: df.loc[np.isfinite(df["hpm"]), :].pipe(
            lambda d: pd.DataFrame({"cell_id": d["cell_id"].astype(np.int64),
                                    "hpm": d["hpm"].astype(np.int64)})),
        batch_format="pandas")


# CornerDetection (image_analysis/corner_detection.rs:206-280): binary
# image bin = (v >= 500); neighbour order i=0..7 is (dy,dx) =
# (-1,1),(0,1),(1,1),(1,0),(1,-1),(0,-1),(-1,-1),(-1,0); a corner matches
# any of 4 patterns — two specific neighbours foreground, three specific
# neighbours background; off-grid counts as background (inner-join sums
# can't reach 2 when a required-fg neighbour is missing, and a missing
# bg neighbour contributes 0 — the same semantics).
_CORNER_PATTERNS = [
    ([(0, 1), (-1, 0)], [(1, 0), (1, -1), (0, -1)]),
    ([(0, -1), (-1, 0)], [(0, 1), (1, 1), (1, 0)]),
    ([(1, 0), (0, -1)], [(-1, 1), (0, 1), (-1, 0)]),
    ([(0, 1), (1, 0)], [(0, -1), (-1, -1), (-1, 0)]),
]


def _corner_sql() -> str:
    conds = []
    for fg, bg in _CORNER_PATTERNS:
        f_ = " OR ".join(f"(dr = {dr} AND dc = {dc})" for dr, dc in fg)
        b_ = " OR ".join(f"(dr = {dr} AND dc = {dc})" for dr, dc in bg)
        conds.append(
            f"(SUM(CASE WHEN ({f_}) AND v >= 500 THEN 1 ELSE 0 END) = 2 AND "
            f"SUM(CASE WHEN ({b_}) AND v >= 500 THEN 1 ELSE 0 END) = 0)")
    return " OR ".join(conds)


@query(
    "corner_detection",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb9()}),
    pat AS (SELECT cell_id, CASE WHEN {_corner_sql()} THEN 1 ELSE 0 END AS hit
            FROM nb WHERE dr <> 0 OR dc <> 0 GROUP BY cell_id)
    SELECT c.cell_id,
           CAST(CASE WHEN c.v >= 500 THEN COALESCE(p.hit, 0) ELSE 0 END
                AS BIGINT) AS corner
    FROM cells c LEFT JOIN pat p ON p.cell_id = c.cell_id
    """,
)
def corner_detection(sf_dir: str):
    """CornerDetection (image_analysis/corner_detection.rs:206-280) on the
    binary image bin = (v >= 500): foreground cell -> 1 if any of the four
    2-fg/3-bg ring patterns matches (off-grid = background), else 0;
    background cells -> 0. Integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)
    # neighbour index order from the reference (dy, dx) arrays
    order = [(-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0)]

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        fgp = np.where(np.isnan(padded), 0.0, (padded >= 500).astype(np.float64))
        z = padded[1:nr + 1, 1:nc + 1]
        nbs = {o: fgp[1 + o[0]:1 + o[0] + nr, 1 + o[1]:1 + o[1] + nc]
               for o in order}
        hit = np.zeros((nr, nc), bool)
        for fg, bg in _CORNER_PATTERNS:
            m = np.ones((nr, nc), bool)
            for o in fg:
                m &= nbs[o] == 1.0
            for o in bg:
                m &= nbs[o] == 0.0
            hit |= m
        corner = np.where(np.isnan(z), np.nan,
                          np.where((z >= 500) & hit, 1.0, 0.0))
        return {"corner": corner}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "corner": df["corner"].astype(np.int64)}),
        batch_format="pandas")


# --- Bilateral filter (bilateral_filter.rs:250-400) -----------------------

_SIG_D, _SIG_I = 0.25, 50.0
_RECIP_D = 1.0 / (np.sqrt(2.0 * np.pi) * _SIG_D)
_RECIP_I = 1.0 / (np.sqrt(2.0 * np.pi) * _SIG_I)


def _bilateral_w_sql() -> str:
    # per-neighbour combined weight, matching the reference's
    # wd = recip_d * exp(-(x^2+y^2)/(2 sig_d^2)); wi = recip_i *
    # exp(-(zn-z)^2/(2 sig_i^2)); w = wi * wd
    return (f"({_RECIP_I!r} * exp(-1.0 * ((v - cv) * (v - cv)) "
            f"/ {2.0 * _SIG_I * _SIG_I!r}) "
            f"* {_RECIP_D!r} * exp(-1.0 * (dr * dr + dc * dc) "
            f"/ {2.0 * _SIG_D * _SIG_D!r}))")


@query(
    "bilateral_filter",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_nb9()}),
    w AS (SELECT cell_id, v, {_bilateral_w_sql()} AS wt FROM nb),
    s AS (SELECT cell_id, SUM(wt) AS sw FROM w GROUP BY cell_id)
    SELECT w.cell_id,
           CAST(floor(SUM(w.wt * w.v / s.sw) * 1e3 + 0.5) AS BIGINT) AS v_milli
    FROM w JOIN s ON s.cell_id = w.cell_id
    GROUP BY w.cell_id
    """,
)
def bilateral_filter(sf_dir: str):
    """BilateralFilter (image_analysis/bilateral_filter.rs:250-400) with
    sigma_dist=0.25 (the derived kernel size is 3x3: the first distance
    weight below the 0.001 cutoff is at i=1 -> filter_size=3, the minimum)
    and sigma_int=50: w = [recip_i * exp(-(zn-z)^2/2si^2)] * [recip_d *
    exp(-(x^2+y^2)/2sd^2)], out = sum_a(w_a * z_a / sum w). exp passes
    through libm and the 9-term sums are order-dependent in the last ulps,
    so the output is emitted in milli-units (guard band ~8e-6 vs drift
    ~1e-9; re-asserted by tests/test_image4.py)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        ws, acc = np.zeros((nr, nc)), np.zeros((nr, nc))
        wlist = []
        for dr, dc in _ALL9:
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            ok = ~np.isnan(w)
            wv = np.where(w == w, w, 0.0)
            wt = (_RECIP_I * np.exp(-1.0 * ((wv - z) * (wv - z))
                                    / (2.0 * _SIG_I * _SIG_I))
                  * _RECIP_D * np.exp(-1.0 * (dr * dr + dc * dc)
                                      / (2.0 * _SIG_D * _SIG_D)))
            wt = np.where(ok, wt, 0.0)
            ws += wt
            wlist.append((wt, wv))
        for wt, wv in wlist:
            acc += wt * wv / ws
        return {"v_milli": np.where(np.isnan(z), np.nan,
                                    np.floor(acc * 1e3 + 0.5))}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "v_milli": df["v_milli"].astype(np.int64)}),
        batch_format="pandas")


# --- Unsharp masking / DoG on integer binomial kernels (k=2 halo) ---------

_B5 = np.array([1, 4, 6, 4, 1], np.int64)
_B3 = np.array([1, 2, 1], np.int64)


def _w25_sql() -> str:
    terms = []
    for i, dr in enumerate(range(-2, 3)):
        for j, dc in enumerate(range(-2, 3)):
            w = int(_B5[i] * _B5[j])
            terms.append(
                f"SELECT a.cell_id, a.v AS cv, CAST({w} AS BIGINT) AS w, b.v "
                f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) "
                f"AND b.c = a.c + ({dc})")
    return " UNION ALL ".join(terms)


def _w9_sql() -> str:
    terms = []
    for i, dr in enumerate(range(-1, 2)):
        for j, dc in enumerate(range(-1, 2)):
            w = int(_B3[i] * _B3[j])
            terms.append(
                f"SELECT a.cell_id, CAST({w} AS BIGINT) AS w, b.v "
                f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) "
                f"AND b.c = a.c + ({dc})")
    return " UNION ALL ".join(terms)


@query(
    "unsharp_masking",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_w25_sql()})
    SELECT cell_id,
           CAST(768 * ANY_VALUE(cv) - SUM(w * v) AS BIGINT) AS usm512
    FROM nb GROUP BY cell_id HAVING COUNT(*) = 25
    """,
)
def unsharp_masking(sf_dir: str):
    """UnsharpMasking (image_analysis/unsharp_masking.rs) with the integer
    5x5 binomial blur (sigma ~= 1.06, the gaussian_filter convention here),
    amount = 50% and threshold = 0: out = z + 0.5*(z - blur) — emitted
    scaled by 512 so everything stays integer: usm512 = 768*z - sum25(w*v)
    (blur = sum/256). Interior cells only; one k=2 halo exchange."""
    from ..stages.raster import stencil_k
    tiles = synth_raster_tiles(GRID1, _value_fn)
    w5 = np.outer(_B5, _B5).astype(np.float64)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[2:nr + 2, 2:nc + 2]
        acc = np.zeros((nr, nc))
        for dr in range(5):
            for dc in range(5):
                acc = acc + w5[dr, dc] * padded[dr:dr + nr, dc:dc + nc]
        return {"usm512": 768.0 * z - acc}

    return stencil_k(tiles, GRID1, kern, k=2).map_batches(
        lambda df: df.loc[np.isfinite(df["usm512"]), :].pipe(
            lambda d: pd.DataFrame({"cell_id": d["cell_id"].astype(np.int64),
                                    "usm512": d["usm512"].astype(np.int64)})),
        batch_format="pandas")


@query(
    "dog_filter",
    f"""
    WITH {_CELLS_CTE},
    nb3 AS ({_w9_sql()}),
    g3 AS (SELECT cell_id, SUM(w * v) AS s3 FROM nb3 GROUP BY cell_id
           HAVING COUNT(*) = 9),
    nb5 AS ({_w25_sql()}),
    g5 AS (SELECT cell_id, SUM(w * v) AS s5 FROM nb5 GROUP BY cell_id
           HAVING COUNT(*) = 25)
    SELECT g3.cell_id, CAST(16 * g3.s3 - g5.s5 AS BIGINT) AS dog256
    FROM g3 JOIN g5 ON g5.cell_id = g3.cell_id
    """,
)
def dog_filter(sf_dir: str):
    """DiffOfGaussianFilter (image_analysis/dog_filter.rs): narrow gaussian
    minus wide gaussian, realised as the integer binomial pair (3x3 [1,2,1]
    outer / 16 minus 5x5 [1,4,6,4,1] outer / 256) — dog256 = 16*sum3 - sum5
    keeps the contract integer-exact. Interior (k=2) cells only; both
    kernels evaluated in the SAME k=2 halo exchange."""
    from ..stages.raster import stencil_k
    tiles = synth_raster_tiles(GRID1, _value_fn)
    w5 = np.outer(_B5, _B5).astype(np.float64)
    w3 = np.outer(_B3, _B3).astype(np.float64)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        a5 = np.zeros((nr, nc))
        for dr in range(5):
            for dc in range(5):
                a5 = a5 + w5[dr, dc] * padded[dr:dr + nr, dc:dc + nc]
        a3 = np.zeros((nr, nc))
        for dr in range(3):
            for dc in range(3):
                a3 = a3 + w3[dr, dc] * padded[1 + dr:1 + dr + nr,
                                              1 + dc:1 + dc + nc]
        return {"dog256": 16.0 * a3 - a5}

    return stencil_k(tiles, GRID1, kern, k=2).map_batches(
        lambda df: df.loc[np.isfinite(df["dog256"]), :].pipe(
            lambda d: pd.DataFrame({"cell_id": d["cell_id"].astype(np.int64),
                                    "dog256": d["dog256"].astype(np.int64)})),
        batch_format="pandas")
