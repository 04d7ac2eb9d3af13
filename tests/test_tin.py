"""Delaunay + TIN gridding properties:
- triangulation validity (empty circumcircle within tolerance, full hull coverage)
- linear interpolation reproduces a PLANE exactly (any correct Delaunay
  linear interpolant is exact for affine functions — a strong oracle that
  needs no reference implementation)
"""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.functions.delaunay import delaunay, interpolate_linear
from whitebox_tools_ray.grid import GridSpec


def test_delaunay_small_square():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    tris = delaunay(pts)
    assert len(tris) == 2
    # all 4 vertices used
    assert set(tris.ravel().tolist()) == {0, 1, 2, 3}


def test_delaunay_empty_circumcircle():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 10, (60, 2))
    tris = delaunay(pts)
    # area sums to hull area
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    areas = 0.5 * ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                   - (c[:, 0] - a[:, 0]) * (b[:, 1] - a[:, 1]))
    assert (areas > 0).all()  # CCW
    # empty circumcircle property (allow tiny numeric slack)
    for t, (pa, pb, pc) in zip(tris, zip(a, b, c)):
        ax, ay = pa
        bx, by = pb
        cx, cy = pc
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
              + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
              + (cx**2 + cy**2) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        others = np.ones(len(pts), bool)
        others[list(t)] = False
        assert (d2[others] >= r2 * (1 - 1e-9)).all()


def test_interpolation_exact_on_plane():
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 10, (100, 2))
    vals = 3.0 + 2.0 * pts[:, 0] - 1.5 * pts[:, 1]
    tris = delaunay(pts)
    qx = rng.uniform(1, 9, 500)
    qy = rng.uniform(1, 9, 500)
    got, hit = interpolate_linear(pts, vals, tris, qx, qy)
    want = 3.0 + 2.0 * qx - 1.5 * qy
    assert hit.mean() > 0.95
    np.testing.assert_allclose(got[hit], want[hit], rtol=1e-10, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_tin_grid_plane_reproduction():
    import ray.data

    from whitebox_tools_ray.stages.tin import tin_grid

    g = GridSpec(west=0.0, north=60.0, res_x=2.0, res_y=2.0, rows=30, cols=40)
    rng = np.random.default_rng(9)
    n = 800
    x = rng.uniform(0, 80, n)
    y = rng.uniform(0, 60, n)
    v = 10.0 + 0.5 * x + 0.25 * y
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "x": x, "y": y, "value": v})
    ds = ray.data.from_pandas(df).repartition(4)
    out = tin_grid(ds, g, tile_deg=20.0, buffer=8.0).to_pandas()
    assert len(out) > 0.8 * g.rows * g.cols  # most cells covered
    # no duplicate cells across TIN tiles
    assert out["cell_id"].is_unique
    cid = out["cell_id"].to_numpy(np.int64)
    cx = g.x_from_col(cid % g.cols)
    cy = g.y_from_row(cid // g.cols)
    want = 10.0 + 0.5 * cx + 0.25 * cy
    np.testing.assert_allclose(out["tin_value"].to_numpy(), want, rtol=1e-9, atol=1e-8)
