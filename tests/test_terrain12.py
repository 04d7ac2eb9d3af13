"""Scalar-literal oracle for the off-terrain-object pair on a small grid."""

import numpy as np

from whitebox_tools_ray.grid import GridSpec

_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def _oracle(z, rows, cols, filt=11):
    mid = filt // 2

    def win(arr, r, c, fn, init):
        best = init
        for r2 in range(r - mid, r + mid + 1):
            for c2 in range(c - mid, c + mid + 1):
                if 0 <= r2 < rows and 0 <= c2 < cols:
                    v = arr[r2 * cols + c2]
                    if not np.isnan(v):
                        best = fn(best, v)
        return best

    ero = np.array([win(z, r, c, min, np.inf)
                    for r in range(rows) for c in range(cols)])
    opening = np.array([win(ero, r, c, max, -np.inf)
                        for r in range(rows) for c in range(cols)])
    tophat = z - opening

    thr = [2 if (_DX[i] and _DY[i]) else 1 for i in range(8)]
    ground = tophat <= 1
    stack = list(np.flatnonzero(ground))
    while stack:
        cur = stack.pop()
        r, c = cur // cols, cur % cols
        for i in range(8):
            r2, c2 = r + _DY[i], c + _DX[i]
            if 0 <= r2 < rows and 0 <= c2 < cols:
                n = r2 * cols + c2
                if not ground[n] and tophat[n] - tophat[cur] <= thr[i]:
                    ground[n] = True
                    stack.append(n)

    # blobs: 8-connected non-ground components, min-cell label
    oto = np.ones(rows * cols, np.int64)
    seen = np.zeros(rows * cols, bool)
    for s in range(rows * cols):
        if ground[s] or seen[s]:
            continue
        comp, stack2 = [s], [s]
        seen[s] = True
        while stack2:
            cur = stack2.pop()
            comp.append(cur)
            r, c = cur // cols, cur % cols
            for i in range(8):
                r2, c2 = r + _DY[i], c + _DX[i]
                if 0 <= r2 < rows and 0 <= c2 < cols:
                    n = r2 * cols + c2
                    if not ground[n] and not seen[n]:
                        seen[n] = True
                        stack2.append(n)
        lab = min(comp)
        for x in comp:
            oto[x] = lab

    # backfill: IDW over ground-edge cells within radius filt/1.5
    rad2 = (filt / 1.5) ** 2
    offs = [(dy, dx) for dy in range(-8, 9) for dx in range(-8, 9)
            if 0 < dy * dy + dx * dx <= rad2]
    edge = np.zeros(rows * cols, bool)
    for x in range(rows * cols):
        if not ground[x]:
            continue
        r, c = x // cols, x % cols
        for i in range(8):
            r2, c2 = r + _DY[i], c + _DX[i]
            if 0 <= r2 < rows and 0 <= c2 < cols \
                    and not ground[r2 * cols + c2]:
                edge[x] = True
                break
    zout = np.where(ground, z, np.nan)
    for x in range(rows * cols):
        if ground[x]:
            continue
        r, c = x // cols, x % cols
        wsum = zsum = 0.0
        for dy, dx in offs:
            r2, c2 = r + dy, c + dx
            if 0 <= r2 < rows and 0 <= c2 < cols \
                    and edge[r2 * cols + c2]:
                w = 1.0 / (dy * dy + dx * dx)
                wsum += w
                zsum += z[r2 * cols + c2] * w
        if wsum > 0:
            zout[x] = zsum / wsum
    return ground, oto, zout


def _zfn(cids):
    cids = np.asarray(cids, np.int64)
    base = ((cids * 811) % 23).astype(np.float64)  # gentle ground
    r, c = cids // 48, cids % 48
    bump = ((r // 9 + c // 9) % 3 == 0) & (r % 9 < 4) & (c % 9 < 4)
    return base + np.where(bump, 500.0, 0.0)  # steep 4x4 OTO blocks


def test_oto_pair_matches_scalar(ray_session):
    from whitebox_tools_ray.pipelines.queries_terrain12 import (
        map_otos_pipeline, remove_oto_pipeline)

    g = GridSpec(west=0.0, north=0.0, res_x=1.0, res_y=1.0,
                 rows=40, cols=48, tile_size=16)
    z = _zfn(np.arange(g.rows * g.cols, dtype=np.int64))

    def zfn(cids):
        cids = np.asarray(cids, np.int64)
        base = ((cids * 811) % 23).astype(np.float64)
        r, c = cids // 48, cids % 48
        bump = ((r // 9 + c // 9) % 3 == 0) & (r % 9 < 4) & (c % 9 < 4)
        return base + np.where(bump, 500.0, 0.0)

    ground, oto, zout = _oracle(z, g.rows, g.cols)
    assert (~ground).sum() > 20  # the fixture actually has OTOs

    got = map_otos_pipeline(g, zfn, tile=16).to_pandas() \
        .sort_values("cell_id")
    assert len(got) == g.rows * g.cols
    np.testing.assert_array_equal(got["oto"].to_numpy(np.int64), oto)

    got2 = remove_oto_pipeline(g, zfn, tile=16).to_pandas() \
        .sort_values("cell_id")
    np.testing.assert_allclose(got2["zout"].to_numpy(), zout,
                               rtol=0, atol=0)
