"""Generic-position proof for the clip family: no raster cell centre, tile
centre or event point lies exactly on a clip-ring edge (the winding test's
only non-shared-tree hazard)."""

import numpy as np

from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.pipelines.queries_clip2 import clip_ring


def _min_cross_margin(px, py):
    ring = clip_ring()
    m = np.inf
    for e in range(12):
        x0, y0 = ring[e]
        x1, y1 = ring[e + 1]
        # only crossings with the edge's y-span matter for the winding test
        span = ((np.minimum(y0, y1) <= py) & (py <= np.maximum(y0, y1)))
        if span.any():
            cross = (x1 - x0) * (py[span] - y0) - (px[span] - x0) * (y1 - y0)
            m = min(m, float(np.min(np.abs(cross))))
    return m


def test_cell_centres_generic_position():
    cells = np.arange(GRID1.rows * GRID1.cols, dtype=np.int64)
    px = -180.0 + (cells % GRID1.cols + 0.5) * (360.0 / GRID1.cols)
    py = 85.0 - (cells // GRID1.cols + 0.5) * (170.0 / GRID1.rows)
    assert _min_cross_margin(px, py) > 1e-9


def test_tile_centres_generic_position():
    i = np.arange(36 * 17, dtype=np.int64)
    cx = -180.0 + (i % 36) * 10.0 + 5.0
    cy = -85.0 + (i // 36) * 10.0 + 5.0
    assert _min_cross_margin(cx, cy) > 1e-9
