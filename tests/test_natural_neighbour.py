"""Natural-neighbour (Laplace) interpolation: linear precision + convexity."""

import numpy as np
import pandas as pd
import pytest


def test_plane_reproduction_and_convexity():
    from whitebox_tools_ray.functions.delaunay import delaunay, natural_neighbour

    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 10, (200, 2))
    z = 2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 7.0
    tris = delaunay(pts)
    qx = rng.uniform(2, 8, 300)
    qy = rng.uniform(2, 8, 300)
    vals, hit = natural_neighbour(pts, z, tris, qx, qy)
    assert hit.sum() > 250  # interior queries resolve
    want = 2.0 * qx[hit] - 3.0 * qy[hit] + 7.0
    # linear precision: Laplace weights are local coordinates
    assert np.allclose(vals[hit], want, rtol=0, atol=1e-7)

    # convexity: interpolant bounded by the sample range on non-planar data
    z2 = rng.uniform(0, 100, 200)
    v2, h2 = natural_neighbour(pts, z2, tris, qx, qy)
    assert (v2[h2] >= z2.min() - 1e-9).all() and (v2[h2] <= z2.max() + 1e-9).all()


@pytest.mark.usefixtures("ray_session")
def test_gridded_natural_neighbour_runs():
    from whitebox_tools_ray.pipelines.queries_spatial import natural_neighbour_gridding

    out = natural_neighbour_gridding("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 100
    assert out["cell_id"].is_unique
    assert np.isfinite(out["nn_value"]).all()
