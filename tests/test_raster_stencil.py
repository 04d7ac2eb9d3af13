"""Halo-exchange stencil vs whole-array numpy oracles."""

import numpy as np
import pytest

from whitebox_tools_ray.grid import GridSpec
from whitebox_tools_ray.stages.raster import (
    mean3x3_kernel,
    slope_kernel_factory,
    stencil_3x3,
    synth_raster_tiles,
)

G = GridSpec(west=0.0, north=50.0, res_x=1.0, res_y=1.0, rows=50, cols=70)

# NOTE: vfn must be a lambda (pickled by VALUE into Ray tasks); a top-level
# function of a test module is pickled by reference, which workers can't import
vfn = lambda cells: ((cells.astype(np.int64) * 997) % 311).astype(np.float64)  # noqa: E731


def whole_raster():
    cells = np.arange(G.rows * G.cols, dtype=np.int64)
    return vfn(cells).reshape(G.rows, G.cols)


@pytest.mark.usefixtures("ray_session")
def test_mean3x3_matches_whole_array():
    tiles = synth_raster_tiles(G, vfn, tile=16)
    got = stencil_3x3(tiles, G, mean3x3_kernel, tile=16).to_pandas() \
        .sort_values("cell_id").reset_index(drop=True)

    z = whole_raster()
    pad = np.full((G.rows + 2, G.cols + 2), np.nan)
    pad[1:-1, 1:-1] = z
    s = np.zeros_like(z)
    n = np.zeros(z.shape, np.int64)
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            w = pad[dr:dr + G.rows, dc:dc + G.cols]
            ok = ~np.isnan(w)
            s += np.where(ok, w, 0.0)
            n += ok
    assert len(got) == G.rows * G.cols
    np.testing.assert_array_equal(got["sum9"].to_numpy(np.float64), s.ravel())
    np.testing.assert_array_equal(got["n9"].to_numpy(np.int64), n.ravel())
    # interior cells have 9 neighbours, corners 4, edges 6
    assert got["n9"].min() == 4 and got["n9"].max() == 9


@pytest.mark.usefixtures("ray_session")
def test_aspect_hillshade_matches_whole_array():
    from whitebox_tools_ray.stages.raster import aspect_hillshade_kernel_factory

    tiles = synth_raster_tiles(G, vfn, tile=16)
    got = stencil_3x3(tiles, G, aspect_hillshade_kernel_factory(G.res_x, G.res_y),
                      tile=16).to_pandas().sort_values("cell_id").reset_index(drop=True)
    z = whole_raster()
    pad = np.full((G.rows + 2, G.cols + 2), np.nan)
    pad[1:-1, 1:-1] = z
    want = aspect_hillshade_kernel_factory(G.res_x, G.res_y)(pad, G.rows, G.cols)
    for col in ("aspect_deg", "hillshade"):
        w = np.asarray(want[col]).ravel()
        gv = got[col].to_numpy()
        np.testing.assert_array_equal(np.isnan(gv), np.isnan(w))
        np.testing.assert_array_equal(gv[~np.isnan(w)], w[~np.isnan(w)])


@pytest.mark.usefixtures("ray_session")
def test_slope_matches_whole_array():
    tiles = synth_raster_tiles(G, vfn, tile=16)
    got = stencil_3x3(tiles, G, slope_kernel_factory(G.res_x, G.res_y), tile=16) \
        .to_pandas().sort_values("cell_id").reset_index(drop=True)

    z = whole_raster()
    pad = np.full((G.rows + 2, G.cols + 2), np.nan)
    pad[1:-1, 1:-1] = z
    nr, nc = G.rows, G.cols
    a = pad[0:nr, 0:nc]; b = pad[0:nr, 1:nc + 1]; c = pad[0:nr, 2:nc + 2]
    d = pad[1:nr + 1, 0:nc]; f = pad[1:nr + 1, 2:nc + 2]
    g = pad[2:nr + 2, 0:nc]; h = pad[2:nr + 2, 1:nc + 1]; i = pad[2:nr + 2, 2:nc + 2]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * G.res_x)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * G.res_y)
    want = np.degrees(np.arctan(np.sqrt(dzdx ** 2 + dzdy ** 2))).ravel()

    np.testing.assert_array_equal(np.isnan(got["slope_deg"].to_numpy()), np.isnan(want))
    wv, gv = want[~np.isnan(want)], got["slope_deg"].to_numpy()[~np.isnan(want)]
    np.testing.assert_array_equal(gv, wv)
