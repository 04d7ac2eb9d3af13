"""Geometry kernel parity with the reference's unit tests.

Cases ported from whitebox-common/src/algorithms/poly_ops.rs:184-220
(test_point_in_poly / test_winding_number on a hand-built triangle) plus
boundary semantics (edges outside) and the SQL-predicate equivalences the
DuckDB oracles rely on.
"""

import numpy as np

from whitebox_tools_ray.geometry import (
    PackedPolygons,
    is_clockwise,
    point_in_poly,
    polygon_area,
    winding_number,
)
from whitebox_tools_ray.layers import (
    HOLE_B,
    PENT,
    RECT_A,
    RECT_B,
    RECT_C,
    builtin_polygons,
    _rect_ring,
)

# the reference's test triangle: V-shaped closed poly (poly_ops.rs:186-193)
TRI = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.5, 0.5], [0.0, 0.0]])


def test_point_in_poly_reference_cases():
    # inside point (poly_ops test uses (0.75, 0.25) style probes)
    assert point_in_poly([0.75], [0.25], TRI)[0]
    # the notch region (inside bbox, outside poly)
    assert not point_in_poly([0.2], [0.75], TRI)[0]
    # far outside
    assert not point_in_poly([2.0], [2.0], TRI)[0]


def test_rect_boundary():
    """Actual reference-algorithm boundary behavior on axis-aligned rects is
    HALF-OPEN: left/bottom edges inside, right/top edges outside (the
    poly_ops.rs:27 'edges outside' docstring is only approximate — the code
    is the authority). The SQL oracles rely on this."""
    ring = _rect_ring(0.0, 0.0, 10.0, 10.0)
    inside_pts = [(0.0, 5.0), (5.0, 0.0), (0.0, 0.0), (5.0, 5.0)]
    outside_pts = [(10.0, 5.0), (5.0, 10.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)]
    for x, y in inside_pts:
        assert point_in_poly([x], [y], ring)[0], (x, y)
    for x, y in outside_pts:
        assert not point_in_poly([x], [y], ring)[0], (x, y)


def test_winding_number_even_odd():
    # self-overlapping probe: winding number of TRI interior is +/-1
    wn = winding_number([0.75], [0.25], TRI)
    assert wn[0] % 2 != 0


def test_clockwise_orientation():
    assert is_clockwise(_rect_ring(0, 0, 1, 1, clockwise=True))
    assert not is_clockwise(_rect_ring(0, 0, 1, 1, clockwise=False))
    assert polygon_area(_rect_ring(0, 0, 2, 3, clockwise=False)) == 6.0


def _rect_halfopen(px, py, rect):
    xmin, ymin, xmax, ymax = rect
    return (px >= xmin) & (px < xmax) & (py >= ymin) & (py < ymax)


def test_rect_ring_matches_halfopen_inequalities():
    """The SQL oracle models rectangles as half-open inequalities; the winding
    kernel must agree everywhere, including on-edge and on-corner points."""
    ring = _rect_ring(*RECT_A)
    rng = np.random.default_rng(7)
    px = np.concatenate([rng.uniform(-180, 180, 5000), [-120, -60, -90, -120, -60]])
    py = np.concatenate([rng.uniform(-85, 85, 5000), [-40, 20, -40, 0, 0]])
    np.testing.assert_array_equal(point_in_poly(px, py, ring), _rect_halfopen(px, py, RECT_A))


def test_pentagon_matches_half_planes():
    ring = np.asarray(PENT)
    rng = np.random.default_rng(11)
    px = rng.uniform(80, 150, 20000)
    py = rng.uniform(-40, 60, 20000)
    inside = np.ones(len(px), bool)
    for (x0, y0), (x1, y1) in zip(PENT[:-1], PENT[1:]):
        inside &= (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0) < 0
    np.testing.assert_array_equal(point_in_poly(px, py, ring), inside)


def brute_clip_mask(px, py, polys: PackedPolygons):
    """Row-at-a-time oracle of clip.rs:314-324: loop all parts, last match wins."""
    out = np.zeros(len(px), bool)
    for i in range(len(px)):
        for p, ring in enumerate(polys.rings):
            xmin, ymin, xmax, ymax = polys.bboxes[p]
            if not (xmin <= px[i] <= xmax and ymin <= py[i] <= ymax):
                continue
            if point_in_poly([px[i]], [py[i]], ring)[0]:
                out[i] = not polys.is_hole[p]
    return out


def test_clip_mask_last_part_wins():
    polys = builtin_polygons()
    rng = np.random.default_rng(3)
    px = rng.uniform(-180, 180, 3000)
    py = rng.uniform(-85, 85, 3000)
    np.testing.assert_array_equal(polys.clip_mask(px, py), brute_clip_mask(px, py, polys))
    # a point in B's hole but inside C must be KEPT (later part overrides hole)
    assert polys.clip_mask([20.0], [-10.0])[0]
    # a point in B's hole outside C must be dropped
    assert not polys.clip_mask([5.0], [5.0])[0]
    # plain B interior kept
    assert polys.clip_mask([-20.0], [30.0])[0]


def test_pip_pairs_per_feature_holes():
    polys = builtin_polygons()
    # hole point -> not in feature 1, but in feature 2
    idx, fid = polys.pip_pairs([20.0], [-10.0])
    assert set(fid.tolist()) == {2}
    # overlap of nothing -> empty
    idx, fid = polys.pip_pairs([179.0], [-80.0])
    assert len(idx) == 0


def test_min_area_bbox_axes_rotated_rect():
    """A 10x2 rectangle rotated 45 deg must give axes (2, 10) and
    elongation 0.8 — the axis-aligned bbox would wrongly give ~0."""
    import numpy as np

    from whitebox_tools_ray.geometry import min_area_bbox_axes

    rect = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 2.0], [0.0, 2.0]])
    t = np.pi / 4.0
    rot = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    pts = rect @ rot.T + np.array([3.0, 7.0])
    s, l = min_area_bbox_axes(pts)
    assert abs(s - 2.0) < 1e-9 and abs(l - 10.0) < 1e-9


def test_min_area_bbox_axes_degenerate():
    import numpy as np

    from whitebox_tools_ray.geometry import min_area_bbox_axes

    s, l = min_area_bbox_axes(np.array([[1.0, 2.0], [4.0, 6.0]]))
    assert s == 0.0 and abs(l - 5.0) < 1e-12
    s, l = min_area_bbox_axes(np.array([[1.0, 2.0], [1.0, 2.0]]))
    assert (s, l) == (0.0, 0.0)


def test_cell_index_matches_brute_force():
    """pip_pairs_indexed / clip_mask_indexed must be bit-identical to the
    linear-scan kernels on the 10k diamond layer (and sublinear in parts)."""
    import numpy as np

    from whitebox_tools_ray.geometry import clip_mask_indexed, pip_pairs_indexed
    from whitebox_tools_ray.layers_big import packed_diamonds

    polys = packed_diamonds(3000)
    idx = polys.build_cell_index()
    rng = np.random.default_rng(3)
    px = rng.uniform(-180, 180, 20000)
    py = rng.uniform(-85, 85, 20000)
    i1, f1 = pip_pairs_indexed(polys, idx, px, py)
    i2, f2 = polys.pip_pairs(px, py)
    o = np.lexsort((f2, i2))
    assert (i1 == i2[o]).all() and (f1 == f2[o]).all()
    assert len(i1) > 0
    k1 = clip_mask_indexed(polys, idx, px, py)
    k2 = polys.clip_mask(px, py)
    assert (k1 == k2).all() and k1.any()


def test_cell_index_sublinear_in_parts():
    """Indexed kernel time must grow far slower than part count (the whole
    point of the index): 8x the parts must cost < 3x the time."""
    import time

    import numpy as np

    from whitebox_tools_ray.geometry import pip_pairs_indexed
    from whitebox_tools_ray.layers_big import packed_diamonds

    rng = np.random.default_rng(4)
    px = rng.uniform(-180, 180, 30000)
    py = rng.uniform(-85, 85, 30000)

    def timed(n):
        polys = packed_diamonds(n)
        idx = polys.build_cell_index()
        pip_pairs_indexed(polys, idx, px, py)  # warm
        t0 = time.perf_counter()
        pip_pairs_indexed(polys, idx, px, py)
        return time.perf_counter() - t0

    t_small, t_big = timed(1250), timed(10000)
    assert t_big < 3 * t_small + 0.05, (t_small, t_big)
