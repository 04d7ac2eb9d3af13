"""Terrain sweep #2 — the Florinsky 5x5 curvature family, multidirectional
hillshade, Pennock landform classification, and window-position metrics.

Single-source-of-truth float contract: each derivative / output formula is
ONE Python string (tokens z0..z24 for the 5x5 window, row-major with
dr = n//5 - 2, dc = n%5 - 2, exactly gaussian_curvature.rs:304-311's
offsets array) that is (a) `eval`'d with numpy arrays on the Ray side and
(b) substituted into the DuckDB oracle verbatim — the two sides therefore
share one IEEE expression tree and results are BIT-IDENTICAL wherever the
only libm call is the correctly-rounded sqrt. Off-grid / nodata window
cells take the centre value z12 (gaussian_curvature.rs:318-322).

The derivative stencils are Florinsky (2016)'s third-order polynomial
fits (gaussian_curvature.rs:330-349): p, q (1st order, /420), r, t (/35),
s (/100) at unit grid res. Curvature formulas: gaussian (r t - s^2)/w^2,
mean -((1+q^2)r - 2pqs + (1+p^2)t)/(2 w^1.5), maximal/minimal = mean +-
sqrt(max(mean^2 - gauss, 0)), total r^2 + 2s^2 + t^2, tangential
-(q^2 r - 2pqs + p^2 t)/((p^2+q^2) sqrt(w)), w = 1 + p^2 + q^2
({mean,maximal,minimal,total,tan}_curvature.rs:356-367). powi/powf are
rewritten as explicit products (x*x, q*sqrt(q)) shared by both sides.

MultidirectionalHillshade (multidirectional_hillshade.rs:344-420) rounds
to integer at |val| ~ 3e4 where the cross-library atan/sin drift is
~1e-11 — deterministic by the guard-band argument (queries_mathops2).
Pennock (pennock_landform_class.rs:361-470) compares atan-derived slope
against thresholds; tests/test_terrain2.py asserts no cell sits within
1e-9 degrees of a class boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from ..stages.raster import stencil_k, synth_raster_tiles
from .queries import query

_N = GRID1.rows * GRID1.cols

# --- shared formula strings (z0..z24 tokens) ------------------------------

_P = ("((1.0 / 420.0) * (44.0 * (z3 + z23 - z1 - z21) "
      "+ 31.0 * (z0 + z20 - z4 - z24 + 2.0 * (z8 + z18 - z6 - z16)) "
      "+ 17.0 * (z14 - z10 + 4.0 * (z13 - z11)) "
      "+ 5.0 * (z9 + z19 - z5 - z15)))")
_Q = ("((1.0 / 420.0) * (44.0 * (z5 + z9 - z15 - z19) "
      "+ 31.0 * (z20 + z24 - z0 - z4 + 2.0 * (z6 + z8 - z16 - z18)) "
      "+ 17.0 * (z2 - z22 + 4.0 * (z7 - z17)) "
      "+ 5.0 * (z1 + z3 - z21 - z23)))")
_R = ("((1.0 / 35.0) * (2.0 * (z0 + z4 + z5 + z9 + z10 + z14 + z15 + z19 "
      "+ z20 + z24) - 2.0 * (z2 + z7 + z12 + z17 + z22) "
      "- z1 - z3 - z6 - z8 - z11 - z13 - z16 - z18 - z21 - z23))")
_T = ("((1.0 / 35.0) * (2.0 * (z0 + z1 + z2 + z3 + z4 + z20 + z21 + z22 "
      "+ z23 + z24) - 2.0 * (z10 + z11 + z12 + z13 + z14) "
      "- z5 - z6 - z7 - z8 - z9 - z15 - z16 - z17 - z18 - z19))")
_S = ("((1.0 / 100.0) * (z8 + z16 - z6 - z18 + 4.0 * (z4 + z20 - z0 - z24) "
      "+ 2.0 * (z3 + z9 + z15 + z21 - z1 - z5 - z19 - z23)))")

_W = f"(1.0 + {_P} * {_P} + {_Q} * {_Q})"
_GAUSS = f"(({_R} * {_T} - {_S} * {_S}) / ({_W} * {_W}))"
_MEAN = (f"(-((1.0 + {_Q} * {_Q}) * {_R} - 2.0 * {_P} * {_Q} * {_S} "
         f"+ (1.0 + {_P} * {_P}) * {_T}) "
         f"/ (2.0 * sqrt(({_W} * {_W}) * {_W})))")
_RAD = f"sqrt(greatest({_MEAN} * {_MEAN} - {_GAUSS}, 0.0))"
_TOTAL = f"({_R} * {_R} + 2.0 * {_S} * {_S} + {_T} * {_T})"
_PQ2 = f"({_P} * {_P} + {_Q} * {_Q})"
_TAN_CORE = (f"(-({_Q} * {_Q} * {_R} - 2.0 * {_P} * {_Q} * {_S} "
             f"+ {_P} * {_P} * {_T}) / ({_PQ2} * sqrt({_W})))")

_NP_ENV = {"sqrt": np.sqrt, "greatest": np.maximum, "atan": np.arctan,
           "sin": np.sin, "abs": np.abs, "__builtins__": {}}


def _z25_sql() -> str:
    """wide(cell_id, z0..z24) with off-grid cells folded to the centre."""
    unions = " UNION ALL ".join(
        f"SELECT a.cell_id, {n} AS n, b.v "
        f"FROM cells a JOIN cells b ON b.r = a.r + ({n // 5 - 2}) "
        f"AND b.c = a.c + ({n % 5 - 2})"
        for n in range(25))
    pivot = ", ".join(
        f"COALESCE(MAX(CASE WHEN n = {n} THEN CAST(v AS DOUBLE) END), "
        f"MAX(CASE WHEN n = 12 THEN CAST(v AS DOUBLE) END)) AS z{n}"
        for n in range(25))
    return f"nb AS ({unions}), wide AS (SELECT cell_id, {pivot} FROM nb GROUP BY cell_id)"


def _z25_kernel(expr_np):
    """stencil over k=2 halo; expr_np(z: dict n->array) -> output array."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        centre = padded[2:nr + 2, 2:nc + 2]
        z = {}
        for n in range(25):
            dr, dc = n // 5 - 2, n % 5 - 2
            w = padded[2 + dr:2 + dr + nr, 2 + dc:2 + dc + nc]
            z[f"z{n}"] = np.where(np.isnan(w), centre, w)
        return {"v": expr_np(z)}

    return stencil_k(tiles, GRID1, kern, k=2).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "v": df["v"].astype(np.float64)}),
        batch_format="pandas")


def _curv_query(name: str, expr: str, ref: str, extra_doc: str = ""):
    sql = f"WITH {_CELLS_CTE}, {_z25_sql()} SELECT cell_id, {expr} AS v FROM wide"
    code = compile(expr, name, "eval")

    @query(name, sql)
    def _impl(sf_dir: str, _code=code):
        return _z25_kernel(lambda z: eval(_code, dict(_NP_ENV), z))

    _impl.__doc__ = (f"{ref}: Florinsky 5x5 derivative stencils at unit "
                     f"res, nodata window cells -> centre value; one shared "
                     f"expression tree (module docstring) — bit-exact. "
                     f"{extra_doc}")
    return _impl


_curv_query("gaussian_curvature", _GAUSS,
            "GaussianCurvature (terrain_analysis/gaussian_curvature.rs:354)")
_curv_query("mean_curvature", _MEAN,
            "MeanCurvature (terrain_analysis/mean_curvature.rs:357)")
_curv_query("maximal_curvature", f"({_MEAN} + {_RAD})",
            "MaximalCurvature (terrain_analysis/maximal_curvature.rs:356-358)",
            "mean^2 - gauss clamped at 0 before the sqrt on both sides.")
_curv_query("minimal_curvature", f"({_MEAN} - {_RAD})",
            "MinimalCurvature (terrain_analysis/minimal_curvature.rs)")
_curv_query("total_curvature", _TOTAL,
            "TotalCurvature (terrain_analysis/total_curvature.rs:344)")


@query(
    "tan_curvature",
    f"""
    WITH {_CELLS_CTE}, {_z25_sql()}
    SELECT cell_id,
           CASE WHEN {_PQ2} = 0.0 THEN 0.0 ELSE {_TAN_CORE} END AS v
    FROM wide
    """,
)
def tan_curvature(sf_dir: str):
    """TangentialCurvature (terrain_analysis/tan_curvature.rs:367): flat
    cells (p = q = 0) emit 0; otherwise the shared Florinsky tree —
    bit-exact."""
    core = compile(_TAN_CORE, "tan", "eval")
    pq2 = compile(_PQ2, "pq2", "eval")

    def f(z):
        denom = eval(pq2, dict(_NP_ENV), z)
        with np.errstate(invalid="ignore", divide="ignore"):
            val = eval(core, dict(_NP_ENV), z)
        return np.where(denom == 0.0, 0.0, val)

    return _z25_kernel(f)


# --- MultidirectionalHillshade (multidirectional_hillshade.rs:344-420) ----

_MDH_AZ = [np.radians(a - 90.0) for a in (225.0, 270.0, 315.0, 360.0)]
_MDH_W = [0.1, 0.4, 0.4, 0.1]
_SIN_T = float(np.sin(np.radians(30.0)))
_COS_T = float(np.cos(np.radians(30.0)))


@query(
    "multidirectional_hillshade",
    f"""
    WITH {_CELLS_CTE}, {_z25_sql()},
    pq AS (SELECT cell_id, {_P} AS p, {_Q} AS q FROM wide),
    terms AS (SELECT cell_id, p, q,
        GREATEST(sqrt(p * p + q * q), 0.00017) AS tan_slope,
        CASE WHEN p <> 0.0
             THEN pi() - atan(q / p) + (pi() / 2.0) * (p / ABS(p))
             ELSE pi() END AS aspect
      FROM pq),
    hs AS (SELECT cell_id,
        (tan_slope / sqrt(1.0 + tan_slope * tan_slope)) *
        (({_SIN_T!r} / tan_slope - {_COS_T!r} * sin({_MDH_AZ[0]!r} - aspect)) * 0.1
         + ({_SIN_T!r} / tan_slope - {_COS_T!r} * sin({_MDH_AZ[1]!r} - aspect)) * 0.4
         + ({_SIN_T!r} / tan_slope - {_COS_T!r} * sin({_MDH_AZ[2]!r} - aspect)) * 0.4
         + ({_SIN_T!r} / tan_slope - {_COS_T!r} * sin({_MDH_AZ[3]!r} - aspect)) * 0.1)
        * 32767.0 AS val
      FROM terms)
    SELECT cell_id,
           CAST(floor(GREATEST(val, 0.0) + 0.5) AS BIGINT) AS hs
    FROM hs
    """,
)
def multidirectional_hillshade(sf_dir: str):
    """MultidirectionalHillshade (multidirectional_hillshade.rs:344-420,
    4-direction mode): Florinsky p/q, tan_slope clamped at 0.00017, aspect =
    pi - atan(q/p) + (pi/2) sign(p), val = sum_a w_a * term1*(term2-term3a),
    scaled by 32767, clamped at 0 and rounded. Rounded-integer contract:
    drift ~1e-11 vs boundary margins ~1e-5 (guard band re-asserted in
    tests/test_terrain2.py)."""
    pcode, qcode = compile(_P, "p", "eval"), compile(_Q, "q", "eval")

    def f(z):
        p = eval(pcode, dict(_NP_ENV), z)
        q = eval(qcode, dict(_NP_ENV), z)
        tan_slope = np.maximum(np.sqrt(p * p + q * q), 0.00017)
        with np.errstate(invalid="ignore", divide="ignore"):
            aspect = np.where(
                p != 0.0,
                np.pi - np.arctan(q / np.where(p != 0.0, p, 1.0))
                + (np.pi / 2.0) * (p / np.abs(np.where(p != 0.0, p, 1.0))),
                np.pi)
        term1 = tan_slope / np.sqrt(1.0 + tan_slope * tan_slope)
        val = term1 * sum(
            (_SIN_T / tan_slope - _COS_T * np.sin(az - aspect)) * w
            for az, w in zip(_MDH_AZ, _MDH_W)) * 32767.0
        return np.floor(np.maximum(val, 0.0) + 0.5)

    return _z25_kernel(f).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"],
                                 "hs": df["v"].astype(np.int64)}),
        batch_format="pandas")


# --- Pennock landform classes (pennock_landform_class.rs:361-470) ---------

# ring-8 neighbour order (dx, dy) from :361-362 — n0..n7; n8 = centre
_PEN_NB = [(1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1)]
_DEG = 57.29577951308232  # 180/pi folded to one double on both sides


def _pen_sql() -> str:
    unions = " UNION ALL ".join(
        f"SELECT a.cell_id, {i} AS n, b.v FROM cells a "
        f"JOIN cells b ON b.r = a.r + ({dy}) AND b.c = a.c + ({dx})"
        for i, (dx, dy) in enumerate(_PEN_NB))
    pivot = ", ".join(
        f"COALESCE(MAX(CASE WHEN nbp.n = {i} THEN CAST(nbp.v AS DOUBLE) END), "
        f"CAST(c.v AS DOUBLE)) AS n{i}" for i in range(8))
    return (f"nbp AS ({unions}), "
            f"widep AS (SELECT c.cell_id, CAST(c.v AS DOUBLE) AS zc, {pivot} "
            f"FROM cells c LEFT JOIN nbp ON nbp.cell_id = c.cell_id "
            f"GROUP BY c.cell_id, c.v)")


_PEN_EXPRS = {
    "zx": "((n1 - n5) / 2.0)",
    "zy": "((n7 - n3) / 2.0)",
    "zxx": "((n1 - 2.0 * zc + n5) / 1.0)",
    "zyy": "((n7 - 2.0 * zc + n3) / 1.0)",
    "zxy": "((-n6 + n0 + n4 - n2) / 4.0)",
    "fx": "((n2 - n4 + 2.0 * (n1 - n5) + n0 - n6) / 8.0)",
    "fy": "((n6 - n4 + 2.0 * (n7 - n3) + n0 - n2) / 8.0)",
}


@query(
    "pennock_landform_class",
    f"""
    WITH {_CELLS_CTE}, {_pen_sql()},
    d AS (SELECT cell_id,
          {_PEN_EXPRS['zx']} AS zx, {_PEN_EXPRS['zy']} AS zy,
          {_PEN_EXPRS['zxx']} AS zxx, {_PEN_EXPRS['zyy']} AS zyy,
          {_PEN_EXPRS['zxy']} AS zxy,
          {_PEN_EXPRS['fx']} AS fx, {_PEN_EXPRS['fy']} AS fy
          FROM widep),
    m AS (SELECT cell_id, zx * zx + zy * zy AS pp,
                 zx * zx + zy * zy + 1.0 AS qq,
                 zx, zy, zxx, zyy, zxy, fx, fy FROM d),
    cls AS (SELECT cell_id, pp,
        atan(sqrt(fx * fx + fy * fy)) * {_DEG} AS slope,
        -1.0 * ((zxx * zy * zy - 2.0 * zxy * zx * zy + zyy * zx * zx)
                / (pp * (qq * sqrt(qq)))) * {_DEG} AS plan,
        -1.0 * ((zxx * zx * zx - 2.0 * zxy * zx * zy + zyy * zy * zy)
                / (pp * (qq * sqrt(qq)))) * {_DEG} AS prof
      FROM m WHERE pp > 0.0)
    SELECT cell_id, CAST(CASE
        WHEN prof < -0.1 AND plan <= 0.0 AND slope > 3.0 THEN 1
        WHEN prof < -0.1 AND plan > 0.0 AND slope > 3.0 THEN 2
        WHEN prof > 0.1 AND plan <= 0.0 AND slope > 3.0 THEN 3
        WHEN prof > 0.1 AND plan > 0.0 AND slope > 3.0 THEN 4
        WHEN prof >= -0.1 AND prof < 0.1 AND slope > 3.0 AND plan <= 0.0 THEN 5
        WHEN prof >= -0.1 AND prof < 0.1 AND slope > 3.0 AND plan > 0.0 THEN 6
        WHEN slope <= 3.0 THEN 7
        ELSE -128 END AS BIGINT) AS landform
    FROM cls
    """,
)
def pennock_landform_class(sf_dir: str):
    """PennockLandformClass (pennock_landform_class.rs:361-470): classes
    1-7 from profile curvature, plan curvature and slope (thresholds 0.1
    deg, 0.0 deg, 3.0 deg; q^1.5 rewritten q*sqrt(q) on both sides; nodata
    neighbours -> centre). Flat cells (p = 0) are unclassified (absent).
    Threshold comparisons are on shared trees; the slope/atan guard band is
    asserted in tests/test_terrain2.py."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        zc = padded[1:nr + 1, 1:nc + 1]
        n = {}
        for i, (dx, dy) in enumerate(_PEN_NB):
            w = padded[1 + dy:1 + dy + nr, 1 + dx:1 + dx + nc]
            n[i] = np.where(np.isnan(w), zc, w)
        zx = (n[1] - n[5]) / 2.0
        zy = (n[7] - n[3]) / 2.0
        zxx = (n[1] - 2.0 * zc + n[5]) / 1.0
        zyy = (n[7] - 2.0 * zc + n[3]) / 1.0
        zxy = (-n[6] + n[0] + n[4] - n[2]) / 4.0
        fx = (n[2] - n[4] + 2.0 * (n[1] - n[5]) + n[0] - n[6]) / 8.0
        fy = (n[6] - n[4] + 2.0 * (n[7] - n[3]) + n[0] - n[2]) / 8.0
        pp = zx * zx + zy * zy
        qq = pp + 1.0
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.arctan(np.sqrt(fx * fx + fy * fy)) * _DEG
            plan = -1.0 * ((zxx * zy * zy - 2.0 * zxy * zx * zy
                            + zyy * zx * zx) / (pp * (qq * np.sqrt(qq)))) * _DEG
            prof = -1.0 * ((zxx * zx * zx - 2.0 * zxy * zx * zy
                            + zyy * zy * zy) / (pp * (qq * np.sqrt(qq)))) * _DEG
        cls = np.full(zc.shape, np.nan)
        gt = slope > 3.0
        cls = np.where((prof < -0.1) & (plan <= 0.0) & gt, 1.0, cls)
        cls = np.where(np.isnan(cls) & (prof < -0.1) & (plan > 0.0) & gt, 2.0, cls)
        cls = np.where(np.isnan(cls) & (prof > 0.1) & (plan <= 0.0) & gt, 3.0, cls)
        cls = np.where(np.isnan(cls) & (prof > 0.1) & (plan > 0.0) & gt, 4.0, cls)
        cls = np.where(np.isnan(cls) & (prof >= -0.1) & (prof < 0.1) & gt
                       & (plan <= 0.0), 5.0, cls)
        cls = np.where(np.isnan(cls) & (prof >= -0.1) & (prof < 0.1) & gt
                       & (plan > 0.0), 6.0, cls)
        cls = np.where(np.isnan(cls) & (slope <= 3.0), 7.0, cls)
        cls = np.where(np.isnan(cls), -128.0, cls)  # threshold-equality edge
        return {"landform": np.where(pp > 0.0, cls, np.nan)}

    from ..stages.raster import stencil_3x3
    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: df.loc[np.isfinite(df["landform"]), :].pipe(
            lambda d: pd.DataFrame({
                "cell_id": d["cell_id"].astype(np.int64),
                "landform": d["landform"].astype(np.int64)})),
        batch_format="pandas")


# --- Window position metrics (integer-rational, 3x3) ----------------------

_NB9P = " UNION ALL ".join(
    f"SELECT a.cell_id, a.v AS cv, b.v "
    f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
    for dr in (-1, 0, 1) for dc in (-1, 0, 1))


@query(
    "relative_topographic_position",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_NB9P}),
    agg AS (SELECT cell_id, ANY_VALUE(cv) AS z,
                   CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mu,
                   MIN(v) AS lo, MAX(v) AS hi
            FROM nb GROUP BY cell_id)
    SELECT cell_id,
           CASE WHEN z < mu THEN (z - mu) / (mu - lo)
                WHEN hi = mu THEN 0.0
                ELSE (z - mu) / (hi - mu) END AS rtp
    FROM agg
    """,
)
def relative_topographic_position(sf_dir: str):
    """RelativeTopographicPosition (relative_topographic_position.rs:
    407-409): rtp = (z-mu)/(mu-min) below the window mean, (z-mu)/(max-mu)
    at-or-above it (0 when the window is flat), 3x3 window with nodata
    cells skipped. Rational over integers — bit-exact."""
    from ..stages.raster import stencil_3x3
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        s = np.zeros((nr, nc)); n = np.zeros((nr, nc))
        lo = np.full((nr, nc), np.nan); hi = np.full((nr, nc), np.nan)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
                ok = ~np.isnan(w)
                s += np.where(ok, w, 0.0); n += ok
                lo = np.fmin(lo, w); hi = np.fmax(hi, w)
        mu = s / n
        with np.errstate(invalid="ignore", divide="ignore"):
            rtp = np.where(z < mu, (z - mu) / (mu - lo),
                           np.where(hi == mu, 0.0, (z - mu) / (hi - mu)))
        return {"rtp": rtp}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "rtp": df["rtp"].astype(np.float64)}),
        batch_format="pandas")


@query(
    "percent_elev_range",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_NB9P}),
    agg AS (SELECT cell_id, ANY_VALUE(cv) AS z, MIN(v) AS lo, MAX(v) AS hi
            FROM nb GROUP BY cell_id)
    SELECT cell_id,
           CASE WHEN hi > lo
                THEN CAST(z - lo AS DOUBLE) / (hi - lo) * 100.0
                ELSE 0.0 END AS pct
    FROM agg
    """,
)
def percent_elev_range(sf_dir: str):
    """PercentElevRange (percent_elev_range.rs:381-383): (z - min)/range *
    100 over the 3x3 window, 0 on flat windows. Rational over integers —
    bit-exact."""
    from ..stages.raster import stencil_3x3
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        lo = np.full((nr, nc), np.nan); hi = np.full((nr, nc), np.nan)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
                lo = np.fmin(lo, w); hi = np.fmax(hi, w)
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = np.where(hi > lo, (z - lo) / (hi - lo) * 100.0, 0.0)
        return {"pct": pct}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "pct": df["pct"].astype(np.float64)}),
        batch_format="pandas")
