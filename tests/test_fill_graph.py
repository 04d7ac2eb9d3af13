"""A/B gate for the two-superstep watershed-spill-graph fill
(fill_depressions_pregel method="graph", Barnes 2016) against both the
message-round BSP engine (method="bsp", oracle-verified since round 2) and
an independent driver heapq priority flood, over surfaces chosen to stress
the decomposition: a hash surface (all-distinct levels, ~n/9 pits), a
heavy-tie surface (z mod 7 — equal-level floods cross every shard border),
and nested bowls (deep depressions spanning shards). Shard counts cover
the single-shard degenerate case, empty shards (tile coarser than the
grid), and genuine multi-shard splits."""

import heapq

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.grid import GridSpec


def _mk_hash():
    # closures, not module functions: Ray workers cannot import test modules
    def zf(i):
        i = np.asarray(i, np.int64)
        return (i * 2654435761) % 1000000007

    return zf


def _mk_ties():
    def zf(i):
        i = np.asarray(i, np.int64)
        return (i * 2654435761) % 7

    return zf


def _mk_bowls(rows, cols):
    r = np.arange(rows)[:, None]
    c = np.arange(cols)[None, :]
    d = np.maximum(np.abs(r - rows // 2), np.abs(c - cols // 3))
    z = (100 + ((d * 7) % 23) - 2 * ((d % 5) == 0) * d).astype(np.int64)
    d2 = np.abs(r - rows // 3) + np.abs(c - (2 * cols) // 3)
    z = np.minimum(z, (60 + d2 * 3).astype(np.int64))
    flat = z.ravel()

    def zf(i):
        return flat[np.asarray(i, np.int64)]

    return zf


def _flood_ref(zf, rows, cols):
    z = np.asarray(zf(np.arange(rows * cols, dtype=np.int64)),
                   np.int64).reshape(rows, cols)
    big = np.int64(1) << 62
    w = np.full((rows, cols), big, np.int64)
    border = np.zeros((rows, cols), bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    w[border] = z[border]
    heap = [(int(w[i, j]), i, j) for i, j in zip(*np.nonzero(border))]
    heapq.heapify(heap)
    while heap:
        v, i, j = heapq.heappop(heap)
        if v > w[i, j]:
            continue
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                ni, nj = i + di, j + dj
                if 0 <= ni < rows and 0 <= nj < cols:
                    cand = max(int(z[ni, nj]), v)
                    if cand < w[ni, nj]:
                        w[ni, nj] = cand
                        heapq.heappush(heap, (cand, ni, nj))
    return w.ravel()


def _run(zf, rows, cols, tile, n_shards, method):
    from whitebox_tools_ray.stages.pregel import fill_depressions_pregel

    g = GridSpec(west=0.0, north=float(rows), res_x=1.0, res_y=1.0,
                 rows=rows, cols=cols)
    df = fill_depressions_pregel(zf, g, tile=tile, n_shards=n_shards,
                                 method=method).to_pandas()
    return df.sort_values("cell_id").reset_index(drop=True)


def _mk_neg():
    # negative elevations are legal (burned DEMs, noisy SDA surfaces) —
    # guards the solver's level bookkeeping against sign assumptions
    def zf(i):
        i = np.asarray(i, np.int64)
        return (i * 2654435761) % 101 - 60

    return zf


CASES = [("hash", 41, 37), ("ties", 41, 37), ("bowls", 48, 30),
         ("neg", 41, 37)]


@pytest.mark.parametrize("name,rows,cols", CASES)
@pytest.mark.parametrize("tile,n_shards", [(8, 1), (8, 3), (8, 5), (64, 4)])
def test_graph_matches_bsp_and_flood(ray_session, name, rows, cols,
                                     tile, n_shards):
    zf = {"hash": _mk_hash, "ties": _mk_ties, "neg": _mk_neg,
          "bowls": lambda: _mk_bowls(rows, cols)}[name]()
    got = _run(zf, rows, cols, tile, n_shards, "graph")
    ref = _flood_ref(zf, rows, cols)
    assert len(got) == rows * cols
    assert (got["cell_id"].to_numpy() == np.arange(rows * cols)).all()
    np.testing.assert_array_equal(got["fill"].to_numpy(), ref)
    bsp = _run(zf, rows, cols, tile, n_shards, "bsp")
    pd.testing.assert_frame_equal(got, bsp)


def test_graph_larger_hash_grid(ray_session):
    rows, cols = 120, 90
    zf = _mk_hash()
    got = _run(zf, rows, cols, 16, 6, "graph")
    np.testing.assert_array_equal(got["fill"].to_numpy(),
                                  _flood_ref(zf, rows, cols))
