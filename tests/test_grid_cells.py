"""Grid transform + FRS cell codec parity tests.

Floor-arithmetic parity with whitebox-raster/src/lib.rs:728-749 and
fixed_radius_search.rs binning (:84-87) / 5x5 probe coverage (:98-130).
"""

import numpy as np

from whitebox_tools_ray.cells import (
    encode_cells,
    expand_kring,
    frs_bin,
    kring_offsets,
    pack_bin,
    shell_offsets,
    unpack_bin,
)
from whitebox_tools_ray.grid import GridSpec, hex_centers, hex_size_from_width

GRID = GridSpec(west=-180.0, north=85.0, res_x=1.0, res_y=1.0, rows=170, cols=360)


def test_roundtrip_col_row():
    rng = np.random.default_rng(5)
    x = rng.uniform(-180, 180, 1000)
    y = rng.uniform(-85, 85, 1000)
    col = GRID.col_from_x(x)
    row = GRID.row_from_y(y)
    # reference transform: cell centre maps back to the same cell
    cx = GRID.x_from_col(col)
    cy = GRID.y_from_row(row)
    np.testing.assert_array_equal(GRID.col_from_x(cx), col)
    np.testing.assert_array_equal(GRID.row_from_y(cy), row)


def test_cell_edges_floor_semantics():
    # x exactly on a cell boundary belongs to the RIGHT cell (floor)
    assert GRID.col_from_x(np.array([-180.0]))[0] == 0
    assert GRID.col_from_x(np.array([-179.0]))[0] == 1
    # y exactly on a boundary belongs to the cell BELOW (floor of north - y)
    assert GRID.row_from_y(np.array([85.0]))[0] == 0
    assert GRID.row_from_y(np.array([84.0]))[0] == 1


def test_tile_id_rowmajor():
    g = GridSpec(west=0, north=100, res_x=1, res_y=1, rows=100, cols=100, tile_size=32)
    assert g.tile_cols == 4 and g.tile_rows == 4
    assert g.tile_id(np.array([0]), np.array([0]))[0] == 0
    assert g.tile_id(np.array([0]), np.array([33]))[0] == 1
    assert g.tile_id(np.array([32]), np.array([0]))[0] == 4


def test_pack_unpack_bin():
    i = np.array([-1000, 0, 1000, 2**24], np.int64)
    j = np.array([500, -500, 0, -(2**24)], np.int64)
    pi, pj = unpack_bin(pack_bin(i, j))
    np.testing.assert_array_equal(pi, i)
    np.testing.assert_array_equal(pj, j)


def test_frs_bin_matches_reference_formula():
    radius = 10.0
    x = np.array([-25.0, -0.1, 0.0, 4.9, 5.0, 25.1])
    # reference: floor(x * (1/(radius*0.5)))
    np.testing.assert_array_equal(frs_bin(x, radius), np.floor(x / 5.0).astype(np.int64))


def test_kring_covers_radius():
    """Any pair within `radius` must share a cell after 5x5 expansion —
    the search() guarantee of fixed_radius_search.rs:98-130."""
    rng = np.random.default_rng(9)
    radius = 3.0
    bx = rng.uniform(0, 50, 400)
    by = rng.uniform(0, 50, 400)
    qx = rng.uniform(0, 50, 200)
    qy = rng.uniform(0, 50, 200)
    bcell = encode_cells(bx, by, radius)
    pi, qcells = expand_kring(qx, qy, radius, k=2)
    cover = {}
    for p, c in zip(pi, qcells):
        cover.setdefault(int(c), set()).add(int(p))
    for b in range(len(bx)):
        d2 = (bx[b] - qx) ** 2 + (by[b] - qy) ** 2
        near = np.flatnonzero(d2 <= radius * radius)
        covered = cover.get(int(bcell[b]), set())
        for q in near:
            assert int(q) in covered


def test_shell_offsets():
    di, dj = shell_offsets(2)
    assert len(di) == 16  # 5x5 minus 3x3
    assert (np.maximum(np.abs(di), np.abs(dj)) == 2).all()
    d1 = kring_offsets(1)
    assert len(d1[0]) == 9


def test_hex_math():
    w = 2.0
    s = hex_size_from_width(w)
    assert abs(s - w / (2 * np.cos(np.pi / 6))) < 1e-15
    hid, cx, cy = hex_centers(0, 0, 10, 10, w)
    assert len(hid) == len(cx) == len(cy)
    # odd rows are offset by half a width
    assert np.any(np.isclose(cx % w, w / 2))
