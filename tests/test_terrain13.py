"""Whole-grid fixpoint oracle for the embankment mapping grow."""

import numpy as np

from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.rasterdefs import _value_fn

_ROWS, _COLS = GRID1.rows, GRID1.cols


def _tophat(z2d, filt=11):
    mid = filt // 2
    pad = np.full((_ROWS + 2 * mid, _COLS + 2 * mid), np.nan)
    pad[mid:-mid, mid:-mid] = z2d
    ero = np.full_like(z2d, np.inf)
    for dy in range(-mid, mid + 1):
        for dx in range(-mid, mid + 1):
            w = pad[mid + dy:mid + dy + _ROWS, mid + dx:mid + dx + _COLS]
            ero = np.fmin(ero, np.where(np.isnan(w), np.inf, w))
    pad2 = np.full((_ROWS + 2 * mid, _COLS + 2 * mid), np.nan)
    pad2[mid:-mid, mid:-mid] = ero
    opn = np.full_like(z2d, -np.inf)
    for dy in range(-mid, mid + 1):
        for dx in range(-mid, mid + 1):
            w = pad2[mid + dy:mid + dy + _ROWS, mid + dx:mid + dx + _COLS]
            opn = np.fmax(opn, np.where(np.isnan(w), -np.inf, w))
    return z2d - opn


def test_embankment_mapping_matches_fixpoint(ray_session):
    from whitebox_tools_ray.pipelines.queries_terrain13 import (
        _HMIN, _WMAX, embankment_mapping, road_cells)

    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64)) \
        .reshape(_ROWS, _COLS)
    th = _tophat(z)
    ok = th >= _HMIN
    seeds = np.zeros((_ROWS, _COLS), bool)
    rc = road_cells()
    seeds[rc // _COLS, rc % _COLS] = True
    grown = seeds & ok
    for _ in range(_WMAX):
        nxt = grown.copy()
        nxt[1:, :] |= grown[:-1, :]
        nxt[:-1, :] |= grown[1:, :]
        nxt[:, 1:] |= grown[:, :-1]
        nxt[:, :-1] |= grown[:, 1:]
        nxt[1:, 1:] |= grown[:-1, :-1]
        nxt[1:, :-1] |= grown[:-1, 1:]
        nxt[:-1, 1:] |= grown[1:, :-1]
        nxt[:-1, :-1] |= grown[1:, 1:]
        grown = nxt & ok
    want = grown.ravel().astype(np.int64)
    assert want.sum() > 20  # non-trivial embankments exist

    got = embankment_mapping("/root/testdata/sf0.001").to_pandas() \
        .sort_values("cell_id")
    assert len(got) == _ROWS * _COLS
    np.testing.assert_array_equal(got["emb"].to_numpy(np.int64), want)
