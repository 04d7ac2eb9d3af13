"""Independent dense oracles for hydro sweep #8: flood order (heapq
priority flood + rank), isobasins (sequential reference cut scan), and
max branch length (brute double-walk on a small grid)."""

import numpy as np
import pandas as pd
import ray

from whitebox_tools_ray.grid import GridSpec
from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.rasterdefs import _value_fn
from tests.test_flow import brute_priority_flood

SF = "/root/testdata/sf0.001"
_ROWS, _COLS = GRID1.rows, GRID1.cols

_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)

_HOP_S = 1 << 20
_HOP_D = int(np.floor(1.4142135623730951 * (1 << 20) + 0.5))


def _dense_down(z: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Reference D8 pointer (strict > slope, first-in-order wins)."""
    zz = z.reshape(rows, cols).astype(np.float64)
    pad = np.full((rows + 2, cols + 2), np.nan)
    pad[1:-1, 1:-1] = zz
    best = np.full((rows, cols), -np.inf)
    down = np.full((rows, cols), -1, np.int64)
    diag = np.sqrt(2.0)
    for i in range(8):
        zn = pad[1 + _DY[i]:1 + _DY[i] + rows, 1 + _DX[i]:1 + _DX[i] + cols]
        ln = diag if i % 2 == 0 else 1.0
        slope = (zz - zn) / ln
        ok = ~np.isnan(zn) & (slope > 0) & (slope > best)
        best = np.where(ok, slope, best)
        r, c = np.nonzero(ok)
        down[r, c] = (r + _DY[i]) * cols + (c + _DX[i])
    return down.ravel()


def test_flood_order_matches_fill_rank(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro8 import _fo_zfn, \
        flood_order

    z = _fo_zfn(np.arange(_ROWS * _COLS, dtype=np.int64))
    fill = brute_priority_flood(z, _ROWS, _COLS).astype(np.int64)
    n = len(fill)
    idx = np.lexsort((np.arange(n), fill))
    want = np.empty(n, np.int64)
    want[idx] = np.arange(1, n + 1)

    got = flood_order(SF).to_pandas().sort_values("cell_id")
    assert len(got) == n
    assert np.array_equal(got["flood_ord"].to_numpy(), want)


def _iso_oracle(down: np.ndarray, rows: int, cols: int, target: int):
    """Sequential restatement of isobasins.rs:392-459 with basin labels
    canonicalized to the outlet cell id."""
    n = rows * cols
    indeg = np.zeros(n, np.int64)
    m = down >= 0
    np.add.at(indeg, down[m], 1)
    contribs: dict[int, list[tuple[int, int]]] = {i: [] for i in range(n)}
    off_to_i = {_DY[i] * cols + _DX[i]: i for i in range(8)}
    outlets: set[int] = set()
    stack = list(np.flatnonzero(indeg == 0))
    pend = indeg.copy()
    while stack:
        c = stack.pop()
        fa = 1 + sum(f for _, f in contribs[c])
        marked_self = False
        if fa >= target:
            inla_mag, inla_from = 0, -1
            best_key = -1
            for frm, f in contribs[c]:
                i = off_to_i[frm - c]
                key = f * 8 + (7 - i)
                if key > best_key:
                    best_key, inla_mag, inla_from = key, f, frm
            if (target - inla_mag) < (fa - target):
                if inla_from >= 0:
                    outlets.add(inla_from)
                    fa -= inla_mag
                else:
                    outlets.add(c)
                    marked_self = True
                    fa = 1
            else:
                outlets.add(c)
                marked_self = True
                fa = 1
        d = down[c]
        if d < 0:
            if not marked_self:
                outlets.add(c)
            continue
        contribs[d].append((c, fa))
        pend[d] -= 1
        if pend[d] == 0:
            stack.append(d)

    basin = np.full(n, -1, np.int64)
    for x in range(n):
        cur = x
        while cur not in outlets:
            cur = down[cur]
            assert cur >= 0
        basin[x] = cur
    return basin, outlets


def test_isobasins_matches_sequential_scan(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro8 import ISO_TARGET, \
        isobasins

    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64))
    down = _dense_down(z, _ROWS, _COLS)
    want, outlets = _iso_oracle(down, _ROWS, _COLS, ISO_TARGET)
    assert len(outlets) > 50  # the cut actually fires

    got = isobasins(SF).to_pandas().sort_values("cell_id")
    assert len(got) == _ROWS * _COLS
    assert np.array_equal(got["basin"].to_numpy(), want)


def _bmax_oracle(down: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Literal double-walk: per cardinal pair of non-pit cells, distance
    (hop units) from each member to the first common flowpath cell."""
    n = rows * cols

    def hop(a, b):
        return _HOP_D if (a // cols != b // cols) and (a % cols != b % cols) \
            else _HOP_S

    out = np.zeros(n, np.int64)
    for a in range(n):
        if down[a] < 0:
            continue
        for b, ok in ((a + 1, a % cols < cols - 1), (a + cols, a // cols < rows - 1)):
            if not ok or b >= n or down[b] < 0:
                continue
            apath: dict[int, int] = {}
            cur, units = a, 0
            while True:
                apath[cur] = units
                if down[cur] < 0:
                    break
                units += hop(cur, down[cur])
                cur = down[cur]
            la = units
            cur, units = b, 0
            da = db = None
            while True:
                if cur in apath:
                    da, db = apath[cur], units
                    break
                if down[cur] < 0:
                    break
                units += hop(cur, down[cur])
                cur = down[cur]
            if da is None:
                da, db = la, units
            if da > out[a]:
                out[a] = da
            if db > out[b]:
                out[b] = db
    return out


def test_bmax_pipeline_matches_double_walk(ray_session):
    from whitebox_tools_ray.pipelines.queries_hydro8 import bmax_pipeline
    from whitebox_tools_ray.stages.flow import tile_of_expr

    g = GridSpec(west=0.0, north=0.0, res_x=1.0, res_y=1.0,
                 rows=40, cols=48, tile_size=16)
    cid = np.arange(g.rows * g.cols, dtype=np.int64)
    z = ((cid * 37) % 91 + (cid // g.cols) * 3).astype(np.float64)
    down = _dense_down(z, g.rows, g.cols)
    want = _bmax_oracle(down, g.rows, g.cols)

    down_ds = ray.data.from_pandas(pd.DataFrame({
        "cell_id": cid, "down_id": down,
        "tile": tile_of_expr(cid, g, 64)})).repartition(4)
    got = bmax_pipeline(down_ds, g).to_pandas().sort_values("cell_id")
    assert len(got) == g.rows * g.cols
    assert np.array_equal(got["bmax_units"].to_numpy(), want)
