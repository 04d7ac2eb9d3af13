"""Reference-faithful IDW vs a brute-force O(cells x points) oracle.

The oracle replicates gis_analysis/idw_interpolation.rs:615-645 exactly:
radius search (Euclidean), kNN(min_points) fallback, 1/dist^weight, exact-hit
short-circuit, nodata when min_points unreachable — with the engine's
documented deterministic candidate order (d2, seq)."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.grid import GridSpec

GRID = GridSpec(west=-180.0, north=85.0, res_x=20.0, res_y=20.0, rows=8, cols=18)
RADIUS = 25.0
WEIGHT = 2.0
MIN_POINTS = 3


def brute_idw(px, py, pv, seq):
    rows = []
    for cell in range(GRID.rows * GRID.cols):
        col, row = cell % GRID.cols, cell // GRID.cols
        cx = GRID.west + (np.float64(col) + 0.5) * GRID.res_x
        cy = GRID.north - (np.float64(row) + 0.5) * GRID.res_y
        d2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
        order = np.lexsort((seq, d2))
        within = order[d2[order] <= RADIUS * RADIUS]
        if len(within) < MIN_POINTS:
            # kNN fallback: exactly min_points nearest (ties by seq)
            within = order[:MIN_POINTS]
            if len(within) < MIN_POINTS:
                continue
        d = np.sqrt(d2[within])
        v = pv[within]
        if d[0] == 0.0:
            rows.append((cell, len(within), v[0]))
            continue
        w = 1.0 / d ** WEIGHT
        rows.append((cell, len(within), float(np.sum(w * v) / np.sum(w))))
    return pd.DataFrame(rows, columns=["cell_id", "n_neighbors", "idw"])


@pytest.mark.usefixtures("ray_session")
def test_idw_faithful_matches_bruteforce():
    import ray.data

    from whitebox_tools_ray.stages.gridding import idw_grid

    rng = np.random.default_rng(17)
    n = 400
    px = rng.uniform(-180, 180, n)
    py = rng.uniform(-85, 85, n)
    pv = np.sin(px / 30.0) * np.cos(py / 30.0) * 100.0
    seq = np.arange(n, dtype=np.int64)
    # plant an exact hit on a cell centre (col 3, row 2)
    px[7] = GRID.west + (np.float64(3) + 0.5) * GRID.res_x
    py[7] = GRID.north - (np.float64(2) + 0.5) * GRID.res_y

    pts = ray.data.from_pandas(pd.DataFrame({"event_id": seq, "x": px, "y": py, "value": pv}))
    got = idw_grid(pts, GRID, RADIUS, weight=WEIGHT, min_points=MIN_POINTS) \
        .to_pandas().sort_values("cell_id").reset_index(drop=True)
    want = brute_idw(px, py, pv, seq).sort_values("cell_id").reset_index(drop=True)

    assert len(got) == len(want)
    np.testing.assert_array_equal(got["cell_id"].to_numpy(), want["cell_id"].to_numpy())
    np.testing.assert_array_equal(got["n_neighbors"].to_numpy(np.int64),
                                  want["n_neighbors"].to_numpy(np.int64))
    np.testing.assert_allclose(got["idw"].to_numpy(), want["idw"].to_numpy(), rtol=1e-12)
    # the planted exact hit short-circuits to the point value
    cell = 2 * GRID.cols + 3
    assert got.loc[got.cell_id == cell, "idw"].iloc[0] == pv[7]
