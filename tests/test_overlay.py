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
