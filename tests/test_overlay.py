"""Sutherland-Hodgman convex clipping unit tests (incl. the pentagon cases
excluded from the SQL contract)."""

import numpy as np

from whitebox_tools_ray.geometry import clip_polygon_convex, polygon_area
from whitebox_tools_ray.layers import PENT, _rect_ring


def test_rect_rect_intersection():
    subj = _rect_ring(0.0, 0.0, 10.0, 10.0)
    clip = _rect_ring(5.0, 5.0, 20.0, 20.0)
    out = clip_polygon_convex(subj, clip)
    assert abs(abs(polygon_area(out)) - 25.0) < 1e-12  # 5x5 overlap


def test_disjoint_is_empty():
    subj = _rect_ring(0.0, 0.0, 1.0, 1.0)
    clip = _rect_ring(5.0, 5.0, 6.0, 6.0)
    assert len(clip_polygon_convex(subj, clip)) == 0


def test_subject_inside_clip_unchanged_area():
    subj = _rect_ring(1.0, 1.0, 2.0, 2.0)
    clip = _rect_ring(0.0, 0.0, 10.0, 10.0)
    out = clip_polygon_convex(subj, clip)
    assert abs(abs(polygon_area(out)) - 1.0) < 1e-12


def test_pentagon_clip_area_via_sampling():
    """Monte-Carlo-grid oracle for the non-rect case: clipped area equals
    the fraction of a fine grid inside BOTH the pentagon and the window."""
    from whitebox_tools_ray.geometry import point_in_poly

    pent = np.asarray(PENT)
    clip = _rect_ring(95.0, -20.0, 135.0, 40.0)
    out = clip_polygon_convex(pent, clip)
    area = abs(polygon_area(out))
    xs = np.linspace(80.0, 145.0, 400)
    ys = np.linspace(-30.0, 55.0, 400)
    gx, gy = np.meshgrid(xs, ys)
    inside_p = point_in_poly(gx.ravel(), gy.ravel(), pent)
    inside_c = (gx.ravel() >= 95) & (gx.ravel() <= 135) & \
        (gy.ravel() >= -20) & (gy.ravel() <= 40)
    cell_a = (xs[1] - xs[0]) * (ys[1] - ys[0])
    approx = (inside_p & inside_c).sum() * cell_a
    assert abs(area - approx) / area < 0.02


def test_greiner_hormann_dense_sampling():
    """Overlay region == pointwise region algebra on dense random samples,
    for all four ops over 60 star pairs (non-convex, crossing/contained/
    disjoint mixes)."""
    import numpy as np

    from whitebox_tools_ray.geometry import point_in_poly
    from whitebox_tools_ray.pipelines.queries_overlay import star_rings
    from whitebox_tools_ray.stages.overlay import greiner_hormann, region_inside

    rng = np.random.default_rng(11)
    ids = np.arange(60, dtype=np.int64)
    A, B = star_rings(ids)
    for i in range(len(ids)):
        allv = np.concatenate([A[i, :-1], B[i, :-1]])
        px = rng.uniform(allv[:, 0].min() - 0.5, allv[:, 0].max() + 0.5, 600)
        py = rng.uniform(allv[:, 1].min() - 0.5, allv[:, 1].max() + 0.5, 600)
        in_a = point_in_poly(px, py, A[i])
        in_b = point_in_poly(px, py, B[i])
        for op, want in [("intersect", in_a & in_b), ("union", in_a | in_b),
                         ("difference", in_a & ~in_b), ("symdiff", in_a ^ in_b)]:
            got = region_inside(greiner_hormann(A[i], B[i], op), px, py)
            assert (got == want).all(), (i, op, int((got != want).sum()))


def test_greiner_hormann_containment_cases():
    """No-crossing branches: disjoint, A inside B, B inside A."""
    import numpy as np

    from whitebox_tools_ray.stages.overlay import greiner_hormann, region_inside

    sq = np.array([[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])
    inner = np.array([[1., 1.], [3., 1.], [3., 3.], [1., 3.], [1., 1.]])
    far = inner + 10.0
    px = np.array([2.0, 0.5, 12.0, -5.0])
    py = np.array([2.0, 0.5, 12.0, -5.0])
    # A=sq, B=inner (B inside A)
    assert (region_inside(greiner_hormann(sq, inner, "intersect"), px, py)
            == [True, False, False, False]).all()
    assert (region_inside(greiner_hormann(sq, inner, "union"), px, py)
            == [True, True, False, False]).all()
    # difference sq - inner: ring with hole
    assert (region_inside(greiner_hormann(sq, inner, "difference"), px, py)
            == [False, True, False, False]).all()
    # disjoint
    assert greiner_hormann(sq, far, "intersect") == []
    assert (region_inside(greiner_hormann(sq, far, "union"), px, py)
            == [True, True, True, False]).all()
