"""Marching-squares contours: stitching + level-set consistency properties.

Every crossed cell-pair edge must be referenced by exactly two segment
endpoints (one from each adjacent block) unless the edge sits on the raster
boundary row/column of blocks — that is cross-tile stitching working: shared
crossings computed identically on both sides of a tile border.
"""

import numpy as np
import pytest

from whitebox_tools_ray.layers import GRID1


@pytest.mark.usefixtures("ray_session")
def test_contour_segments_stitch_and_respect_level():
    from whitebox_tools_ray.pipelines.queries_vector2 import (
        CONTOUR_L2,
        contours_marching_squares,
    )
    from whitebox_tools_ray.rasterdefs import _value_fn

    df = contours_marching_squares("unused").to_pandas()
    assert len(df) > 1000  # non-vacuous on the synthetic surface

    n = GRID1.rows * GRID1.cols
    v = _value_fn(np.arange(n)).astype(np.int64).reshape(GRID1.rows, GRID1.cols)

    # canonical crossing-edge key per (block, edge id)
    refs: dict = {}
    for r in df.itertuples():
        br, bc = divmod(int(r.block_id), GRID1.cols)
        for e, nn, dd in ((int(r.e0), int(r.n0), int(r.d0)),
                          (int(r.e1), int(r.n1), int(r.d1))):
            if e == 0:
                key = ("h", br, bc)
                a, b = v[br, bc], v[br, bc + 1]
            elif e == 1:
                key = ("v", br, bc + 1)
                a, b = v[br, bc + 1], v[br + 1, bc + 1]
            elif e == 2:
                key = ("h", br + 1, bc)
                a, b = v[br + 1, bc], v[br + 1, bc + 1]
            else:
                key = ("v", br, bc)
                a, b = v[br, bc], v[br + 1, bc]
            # the edge really straddles the level and the rational is right
            assert (2 * a >= CONTOUR_L2) != (2 * b >= CONTOUR_L2)
            assert nn == CONTOUR_L2 - 2 * a and dd == 2 * (b - a)
            assert 0 < nn / dd < 1
            refs.setdefault(key, []).append((br, bc))

    # stitching: interior crossed edges referenced by exactly 2 blocks
    for (kind, er, ec), blocks in refs.items():
        if kind == "h":
            expect = 2 if 0 < er < GRID1.rows - 1 else 1
        else:
            expect = 2 if 0 < ec < GRID1.cols - 1 else 1
        assert len(blocks) == expect, ((kind, er, ec), blocks)
