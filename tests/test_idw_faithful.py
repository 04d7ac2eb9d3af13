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


@pytest.mark.usefixtures("ray_session")
def test_idw_faithful_sparse_fallback_rounds():
    """Sparse points force the kNN(min_points) fallback for most cells across
    several doubling rounds (the path that previously held O(grid) driver
    arrays — now distributed range-bucket anti-joins). 8 points, radius 20:
    almost every cell is short of min_points at the base radius."""
    import ray.data

    from whitebox_tools_ray.stages.gridding import idw_grid

    rng = np.random.default_rng(99)
    n = 8
    px = rng.uniform(-170, 170, n)
    py = rng.uniform(-80, 80, n)
    pv = rng.uniform(-50, 50, n)
    seq = np.arange(n, dtype=np.int64)

    radius = 20.0

    def brute(px, py, pv, seq):
        rows = []
        for cell in range(GRID.rows * GRID.cols):
            col, row = cell % GRID.cols, cell // GRID.cols
            cx = GRID.west + (np.float64(col) + 0.5) * GRID.res_x
            cy = GRID.north - (np.float64(row) + 0.5) * GRID.res_y
            d2 = (px - cx) ** 2 + (py - cy) ** 2
            order = np.lexsort((seq, d2))
            within = order[d2[order] <= radius * radius]
            if len(within) < MIN_POINTS:
                within = order[:MIN_POINTS]
            d = np.sqrt(d2[within])
            v = pv[within]
            if d[0] == 0.0:
                rows.append((cell, len(within), v[0]))
                continue
            w = 1.0 / d ** WEIGHT
            rows.append((cell, len(within), float(np.sum(w * v) / np.sum(w))))
        return pd.DataFrame(rows, columns=["cell_id", "n_neighbors", "idw"])

    pts = ray.data.from_pandas(pd.DataFrame(
        {"event_id": seq, "x": px, "y": py, "value": pv}))
    got = idw_grid(pts, GRID, radius, weight=WEIGHT, min_points=MIN_POINTS,
                   max_rounds=6) \
        .to_pandas().sort_values("cell_id").reset_index(drop=True)
    want = brute(px, py, pv, seq).sort_values("cell_id").reset_index(drop=True)
    # radius * 2^6 = 1280 covers the whole extent: every cell resolves
    assert len(got) == GRID.rows * GRID.cols
    np.testing.assert_array_equal(got["cell_id"].to_numpy(),
                                  want["cell_id"].to_numpy())
    np.testing.assert_array_equal(got["n_neighbors"].to_numpy(np.int64),
                                  want["n_neighbors"].to_numpy(np.int64))
    np.testing.assert_allclose(got["idw"].to_numpy(), want["idw"].to_numpy(),
                               rtol=1e-12)
    # most cells went through the fallback (exactly MIN_POINTS neighbours)
    assert (got["n_neighbors"].to_numpy() == MIN_POINTS).mean() > 0.5


@pytest.mark.usefixtures("ray_session")
def test_rbf_grid_matches_bruteforce():
    """RBF thin-plate solve vs a dense per-cell brute force (same k-nearest
    selection rule, same system) at sf0.001."""
    import numpy as np

    from whitebox_tools_ray.pipelines.queries_spatial import GRID_IDW
    from whitebox_tools_ray.sources.tables import read_points
    from whitebox_tools_ray.stages.gridding import rbf_grid

    sf = "/root/testdata/sf0.001"
    got = rbf_grid(read_points(sf), GRID_IDW, k=8, radius=12.0) \
        .to_pandas().sort_values("cell_id").reset_index(drop=True)

    pts = read_points(sf).to_pandas()
    x = pts["x"].to_numpy()
    y = pts["y"].to_numpy()
    v = pts["value"].to_numpy()
    seq = pts["event_id"].to_numpy(np.int64)

    def phi(r2):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(r2 > 0, 0.5 * r2 * np.log(r2), 0.0)

    rows = []
    g = GRID_IDW
    for cell in got["cell_id"].to_numpy():  # verify every produced cell
        r, c = cell // g.cols, cell % g.cols
        cx = g.west + (c + 0.5) * g.res_x
        cy = g.north - (r + 0.5) * g.res_y
        d2 = (x - cx) ** 2 + (y - cy) ** 2
        m = d2 <= 12.0 * 12.0
        idx = np.flatnonzero(m)
        order = np.lexsort((seq[idx], d2[idx]))[:8]
        sel = idx[order]
        assert len(sel) == 8
        dxm = x[sel][:, None] - x[sel][None, :]
        dym = y[sel][:, None] - y[sel][None, :]
        A = phi(dxm * dxm + dym * dym)
        w = np.linalg.solve(A, v[sel])
        rows.append(float(np.sum(w * phi(d2[sel]))))
    np.testing.assert_allclose(got["rbf"].to_numpy(), np.array(rows),
                               rtol=1e-9, atol=1e-9)
    assert len(got) > 100
