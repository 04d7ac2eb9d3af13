"""Brute oracles for the bounding-circle pair (shape sweep #3)."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _brute_mec(pts: np.ndarray):
    """Independent minimum enclosing circle: enumerate over ALL point
    pairs/triples (not just the hull)."""
    best = None
    n = len(pts)
    for i in range(n):
        for j in range(i + 1, n):
            cx = (pts[i, 0] + pts[j, 0]) / 2.0
            cy = (pts[i, 1] + pts[j, 1]) / 2.0
            r2 = (pts[i, 0] - cx) ** 2 + (pts[i, 1] - cy) ** 2
            if ((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2
                    <= r2 * (1 + 1e-9)).all():
                cand = (r2, cx, cy)
                if best is None or cand < best:
                    best = cand
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                ax, ay = pts[i]
                bx, by = pts[j]
                cx_, cy_ = pts[k]
                d = 2 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
                if d == 0:
                    continue
                ux = ((ax**2 + ay**2) * (by - cy_)
                      + (bx**2 + by**2) * (cy_ - ay)
                      + (cx_**2 + cy_**2) * (ay - by)) / d
                uy = ((ax**2 + ay**2) * (cx_ - bx)
                      + (bx**2 + by**2) * (ax - cx_)
                      + (cx_**2 + cy_**2) * (bx - ax)) / d
                r2 = (ax - ux) ** 2 + (ay - uy) ** 2
                if ((pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
                        <= r2 * (1 + 1e-9)).all():
                    cand = (r2, ux, uy)
                    if best is None or cand < best:
                        best = cand
    r2, cx, cy = best
    return cx, cy, float(np.sqrt(r2))


def test_mbc_kernel_matches_all_points_brute():
    from whitebox_tools_ray.pipelines.queries_shape3 import _mbc
    from whitebox_tools_ray.stardefs import star_rings

    pids = np.arange(20, dtype=np.int64)
    ra, _rb = star_rings(pids)
    for i in range(20):
        pts = np.column_stack([ra[i, :12, 0], ra[i, :12, 1]])
        cx, cy, r = _mbc(pts)
        bx, by, br = _brute_mec(pts)
        assert abs(r - br) <= 1e-9 * max(1.0, br), i
        # all points covered
        d = np.sqrt((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2)
        assert (d <= r * (1 + 1e-6)).all(), i


def test_minimum_bounding_circle_entry(ray_session):
    from whitebox_tools_ray.pipelines.queries_shape3 import \
        minimum_bounding_circle
    from whitebox_tools_ray.sources.tables import read_points

    res = minimum_bounding_circle(SF)
    pts = read_points(SF, extra_cols=("event_type",)).to_pandas()
    assert set(res["event_type"]) == set(pts["event_type"])
    for _, row in res.iterrows():
        g = pts[pts["event_type"] == row["event_type"]]
        cx, cy = row["cx_u"] / 1e6, row["cy_u"] / 1e6
        r = row["r_u"] / 1e6
        d = np.sqrt((g["x"] - cx) ** 2 + (g["y"] - cy) ** 2)
        assert (d <= r * (1 + 1e-5)).all()
        # minimality: at least 2 support points on the boundary
        assert (d >= r * (1 - 1e-5)).sum() >= 2
        assert row["n"] == len(g)


def test_related_circumscribing_circle(ray_session):
    from whitebox_tools_ray.pipelines.queries_shape3 import (
        _mbc, related_circumscribing_circle)
    from whitebox_tools_ray.stardefs import star_rings

    res = related_circumscribing_circle(SF).to_pandas() \
        .sort_values("pair_id")
    assert len(res) == 200
    assert (res["rcc_micro"] > 0).all() and (res["rcc_micro"] < 10**6).all()
    # spot-check against the direct formula (hull-based _mbc agrees with
    # the all-vertex enumeration on these fixtures)
    pids = np.arange(5, dtype=np.int64)
    ra, _rb = star_rings(pids)
    for i in range(5):
        x, y = ra[i, :12, 0], ra[i, :12, 1]
        area2 = 0.0
        for k in range(12):
            k2 = (k + 1) % 12
            area2 += x[k] * y[k2] - x[k2] * y[k]
        cx, cy, r = _mbc(np.column_stack([x, y]))
        want = 1.0 - abs(area2) / 2.0 / (np.pi * r * r)
        assert abs(res.iloc[i]["rcc_micro"] - np.floor(want * 1e6 + 0.5)) <= 1
