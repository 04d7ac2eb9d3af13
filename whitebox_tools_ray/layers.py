"""Built-in deterministic polygon layer for the spatial-join operators.

One definition, two renderings: (a) a :class:`PackedPolygons` for the engine's
winding-number kernel, (b) per-part SQL predicates so the DuckDB oracle can
replicate the exact semantics (rectangles -> strict inequalities; the convex
pentagon -> strict half-plane conjunction; both match the reference's
"edges outside" even-odd rule, poly_ops.rs:30-33).

Layer layout (FIXTURES.md section 2 edge cases):
  poly 0  rect A        (-120,-40)-(-60,20)
  poly 1  rect B + hole outer (-30,-50)-(60,40), hole (0,-20)-(30,10)
  poly 2  rect C        (10,-30)-(45,0) — overlaps B's hole, so the clip
          "last tested part wins" quirk (clip.rs:314-324) is exercised:
          points in holeB but also in C are KEPT by clip.
  poly 3  convex pentagon (clockwise) in the north-east quadrant
"""

from __future__ import annotations

import numpy as np

from .geometry import PackedPolygons
from .grid import GridSpec

# the canonical 1-degree world grid shared by the spatial + raster operators
GRID1 = GridSpec(west=-180.0, north=85.0, res_x=1.0, res_y=1.0, rows=170, cols=360, tile_size=32)

# (xmin, ymin, xmax, ymax)
RECT_A = (-120.0, -40.0, -60.0, 20.0)
RECT_B = (-30.0, -50.0, 60.0, 40.0)
HOLE_B = (0.0, -20.0, 30.0, 10.0)
RECT_C = (10.0, -30.0, 45.0, 0.0)
# clockwise convex pentagon, closed. Coordinates are dyadic (exact float64)
# so SQL shoelace sums stay order-independent; the .03125 offsets keep every
# edge clear of half-integer cell centres (a centre exactly ON an edge is
# inside for the winding kernel but outside for the strict half-plane SQL).
PENT = [(100.0, 50.0), (140.0, 30.0), (130.0, -10.0), (105.03125, -25.03125),
        (88.0, 12.0), (100.0, 50.0)]


def _rect_ring(xmin, ymin, xmax, ymax, clockwise=True):
    if clockwise:
        pts = [(xmin, ymax), (xmax, ymax), (xmax, ymin), (xmin, ymin), (xmin, ymax)]
    else:
        pts = [(xmin, ymax), (xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]
    return np.asarray(pts, np.float64)


def builtin_features() -> list:
    """The raw feature list (feature_id, [(ring, is_hole), ...]) — also the
    fixture the shapefile round-trip writes/imports."""
    return [
        (0, [(_rect_ring(*RECT_A), False)]),
        (1, [(_rect_ring(*RECT_B), False), (_rect_ring(*HOLE_B, clockwise=False), True)]),
        (2, [(_rect_ring(*RECT_C), False)]),
        (3, [(np.asarray(PENT, np.float64), False)]),
    ]


def builtin_polygons() -> PackedPolygons:
    """The packed layer, part order = file order (drives clip semantics)."""
    return PackedPolygons.from_features(builtin_features())


def _rect_sql(px: str, py: str, rect) -> str:
    # The winding kernel is half-open on axis-aligned rectangles: left/bottom
    # edges inside, right/top outside (empirically verified against the
    # reference algorithm in tests/test_geometry.py::test_rect_boundary).
    xmin, ymin, xmax, ymax = rect
    return f"({px} >= {xmin} AND {px} < {xmax} AND {py} >= {ymin} AND {py} < {ymax})"


def _pent_sql(px: str, py: str) -> str:
    conds = []
    for (x0, y0), (x1, y1) in zip(PENT[:-1], PENT[1:]):
        # strictly right of every edge of the clockwise ring: is_left < 0
        conds.append(f"(({x1} - {x0}) * ({py} - {y0}) - ({px} - {x0}) * ({y1} - {y0}) < 0)")
    return "(" + " AND ".join(conds) + ")"


def feature_sql(px: str, py: str) -> dict[int, str]:
    """Per-feature containment predicates (feature's own holes applied)."""
    return {
        0: _rect_sql(px, py, RECT_A),
        1: f"({_rect_sql(px, py, RECT_B)} AND NOT {_rect_sql(px, py, HOLE_B)})",
        2: _rect_sql(px, py, RECT_C),
        3: _pent_sql(px, py),
    }


def clip_keep_sql(px: str, py: str) -> str:
    """Whole-layer clip keep predicate = reference part order, last match wins.

    Part order: [A_outer, B_outer, B_hole, C_outer, PENT]; a CASE over the
    REVERSED order (first match = last tested part) reproduces clip.rs:314-324.
    """
    return (
        "(CASE "
        f"WHEN {_pent_sql(px, py)} THEN TRUE "
        f"WHEN {_rect_sql(px, py, RECT_C)} THEN TRUE "
        f"WHEN {_rect_sql(px, py, HOLE_B)} THEN FALSE "
        f"WHEN {_rect_sql(px, py, RECT_B)} THEN TRUE "
        f"WHEN {_rect_sql(px, py, RECT_A)} THEN TRUE "
        "ELSE FALSE END)"
    )


def p2r_case_sql() -> str:
    """The polygons_to_raster burn CASE (highest feature id wins) — a leaf
    export so several pipelines modules can embed it at decorator time
    without cross-importing each other."""
    feats = feature_sql("cx", "cy")
    return "CASE " + " ".join(
        f"WHEN {cond} THEN CAST({fid} AS BIGINT)"
        for fid, cond in sorted(feats.items(), reverse=True)
    ) + " ELSE NULL END"
