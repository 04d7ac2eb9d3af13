"""D8 flow algorithms vs brute-force oracles on a hand-checkable graph."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.grid import GridSpec
from whitebox_tools_ray.stages.flow import (
    basins_pointer_doubling,
    strahler,
)

G = GridSpec(west=0.0, north=20.0, res_x=1.0, res_y=1.0, rows=20, cols=30)


def random_forest(seed=3):
    """Random cycle-free down-pointers: each cell points to a strictly
    lower-indexed cell or is an outlet."""
    rng = np.random.default_rng(seed)
    n = G.rows * G.cols
    down = np.full(n, -1, np.int64)
    for v in range(1, n):
        if rng.random() < 0.9:
            down[v] = rng.integers(0, v)
    return down


def brute_acc(down):
    n = len(down)
    acc = np.zeros(n, np.int64)
    for v in range(n):
        cur = v
        while True:
            acc[cur] += 1
            if down[cur] < 0:
                break
            cur = down[cur]
    return acc


def brute_basin(down):
    n = len(down)
    out = np.empty(n, np.int64)
    for v in range(n):
        cur = v
        while down[cur] >= 0:
            cur = down[cur]
        out[v] = cur
    return out


def brute_strahler(down):
    n = len(down)
    children = {}
    for v in range(n):
        if down[v] >= 0:
            children.setdefault(int(down[v]), []).append(v)
    order = np.zeros(n, np.int64)

    import sys
    sys.setrecursionlimit(100000)

    def solve(v):
        if order[v]:
            return order[v]
        ch = children.get(v, [])
        if not ch:
            order[v] = 1
            return 1
        os_ = [solve(c) for c in ch]
        m = max(os_)
        order[v] = m + (os_.count(m) >= 2)
        return order[v]

    for v in range(n):
        solve(v)
    return order


def _down_ds(down):
    import ray.data

    from whitebox_tools_ray.stages.flow import tile_of_expr

    cells = np.arange(len(down), dtype=np.int64)
    return ray.data.from_pandas(pd.DataFrame({
        "cell_id": cells, "down_id": down,
        "tile": tile_of_expr(cells, G, 8)})).repartition(4)


@pytest.mark.usefixtures("ray_session")
def test_flow_accumulation_matches_bruteforce():
    from whitebox_tools_ray.stages.pregel import flow_accumulation_pregel

    down = random_forest()
    got = flow_accumulation_pregel(_down_ds(down), G, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")
    want = brute_acc(down)
    np.testing.assert_array_equal(got["acc"].to_numpy(), want)
    np.testing.assert_array_equal(got["cell_id"].to_numpy(),
                                  np.arange(len(down), dtype=np.int64))


@pytest.mark.usefixtures("ray_session")
def test_basins_pregel_matches_bruteforce():
    from whitebox_tools_ray.stages.pregel import basins_pregel

    down = random_forest(7)
    got = basins_pregel(_down_ds(down), G, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")
    np.testing.assert_array_equal(got["basin"].to_numpy(), brute_basin(down))


@pytest.mark.usefixtures("ray_session")
def test_strahler_pregel_matches_bruteforce():
    from whitebox_tools_ray.stages.pregel import strahler_pregel

    down = random_forest(11)
    got = strahler_pregel(_down_ds(down), G, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")
    np.testing.assert_array_equal(got["strahler"].to_numpy(), brute_strahler(down))


def test_basins_matches_bruteforce():
    down = random_forest(7)
    np.testing.assert_array_equal(basins_pointer_doubling(down), brute_basin(down))


def test_strahler_matches_bruteforce():
    down = random_forest(11)
    np.testing.assert_array_equal(strahler(down), brute_strahler(down))
    # hand case: two order-1 children -> order 2
    d2 = np.array([-1, 0, 0], np.int64)
    np.testing.assert_array_equal(strahler(d2), [2, 1, 1])
    # single chain stays order 1
    d3 = np.array([-1, 0, 1], np.int64)
    np.testing.assert_array_equal(strahler(d3), [1, 1, 1])


def brute_priority_flood(z, rows, cols):
    """Global single-heap priority-flood (Barnes et al. 2014), D8."""
    import heapq

    INF = 1 << 62
    fill = np.full(rows * cols, INF, np.int64)
    heap = []
    for r in range(rows):
        for c in range(cols):
            if r in (0, rows - 1) or c in (0, cols - 1):
                v = r * cols + c
                fill[v] = z[v]
                heapq.heappush(heap, (int(z[v]), v))
    while heap:
        w, v = heapq.heappop(heap)
        if w > fill[v]:
            continue
        r, c = v // cols, v % cols
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                if not (0 <= nr < rows and 0 <= nc < cols):
                    continue
                u = nr * cols + nc
                nw = max(w, int(z[u]))
                if nw < fill[u]:
                    fill[u] = nw
                    heapq.heappush(heap, (nw, u))
    return fill


@pytest.mark.usefixtures("ray_session")
def test_fill_depressions_pregel_matches_priority_flood():
    """Planted-pit DEM: the sharded flood must equal the global
    priority-flood exactly, and must actually RAISE the planted pits."""
    from whitebox_tools_ray.stages.pregel import fill_depressions_pregel

    G2 = GridSpec(west=0.0, north=30.0, res_x=1.0, res_y=1.0, rows=30, cols=40)
    n = G2.rows * G2.cols
    cells = np.arange(n, dtype=np.int64)
    z = (100 + (cells * 31) % 50).astype(np.int64)
    # plant two deep pits away from the border
    z[5 * G2.cols + 7] = 1
    z[20 * G2.cols + 25] = 3

    def z_fn(cids):
        return z[np.asarray(cids, np.int64)]

    got = fill_depressions_pregel(z_fn, G2, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")
    want = brute_priority_flood(z, G2.rows, G2.cols)
    np.testing.assert_array_equal(got["cell_id"].to_numpy(), cells)
    np.testing.assert_array_equal(got["fill"].to_numpy(), want)
    assert want[5 * G2.cols + 7] > 1 and want[20 * G2.cols + 25] > 3


@pytest.mark.usefixtures("ray_session")
def test_fd8_accumulation_matches_bruteforce():
    """FD8 dispersal vs a dense topological brute force with IDENTICAL
    fixed-point arithmetic; also conservation: total units == n * 2^20
    (every cell's mass ends in some accumulation count exactly once per
    downstream hop... total acc = sum over cells of mass passing through)."""
    from whitebox_tools_ray.stages.pregel import fd8_accumulation_pregel

    G2 = GridSpec(west=0.0, north=25.0, res_x=1.0, res_y=1.0, rows=25, cols=30)
    n = G2.rows * G2.cols
    cells = np.arange(n, dtype=np.int64)
    z = ((cells * 2654435761) % 1000003).astype(np.int64)

    def z_fn(cids):
        return z[np.asarray(cids, np.int64)]

    got = fd8_accumulation_pregel(z_fn, G2, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")

    # dense brute force, same arithmetic
    ONE = 1 << 20
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    downs = {}
    indeg = np.zeros(n, np.int64)
    for c in range(n):
        r, cc = c // G2.cols, c % G2.cols
        ds_, sl = [], []
        for dr, dc in offs:
            nr, nc = r + dr, cc + dc
            if not (0 <= nr < G2.rows and 0 <= nc < G2.cols):
                continue
            u = nr * G2.cols + nc
            dist = 1.4142135623730951 if dr and dc else 1.0
            if z[u] < z[c]:
                ds_.append(u)
                sl.append(((int(z[c]) - int(z[u])) / dist) ** 1.1)
            elif z[u] > z[c]:
                indeg[c] += 1
        if ds_:
            tot = sum(sl)
            ws = [int(np.floor(s / tot * ONE + 0.5)) for s in sl[:-1]]
            ws.append(ONE - sum(ws))
            downs[c] = list(zip(ds_, ws))
    mass = np.full(n, ONE, object)
    acc = np.zeros(n, object)
    from collections import deque
    q = deque(np.flatnonzero(indeg == 0).tolist())
    done = np.zeros(n, bool)
    while q:
        c = q.popleft()
        if done[c]:
            continue
        done[c] = True
        m = int(mass[c])
        acc[c] = m
        outs = downs.get(c, [])
        shares = [m * w // ONE for _, w in outs]
        if shares:
            shares[-1] = m - sum(shares[:-1])
        for (u, _w), units in zip(outs, shares):
            mass[u] += units
            indeg[u] -= 1
            if indeg[u] == 0:
                q.append(u)
    assert done.all()
    np.testing.assert_array_equal(got["cell_id"].to_numpy(), cells)
    np.testing.assert_array_equal(got["acc_units"].to_numpy(),
                                  np.array([int(x) for x in acc], np.int64))


@pytest.mark.usefixtures("ray_session")
def test_wetness_index_composition():
    """TWI query == dense recomputation of ln(acc / tan(slope)) from the
    same D8 pointers and Horn slope at sf0.001."""
    from whitebox_tools_ray.layers import GRID1
    from whitebox_tools_ray.pipelines.queries_raster import d8_pointer, wetness_index
    from whitebox_tools_ray.stages.flow import d8_down_ids

    sf = "/root/testdata/sf0.001"
    got = wetness_index(sf).to_pandas().sort_values("cell_id").reset_index(drop=True)

    d8 = d8_pointer(sf).to_pandas()
    down = d8_down_ids(d8, GRID1)
    acc = brute_acc(down).astype(np.float64)
    # dense Horn slope over the same surface
    n = GRID1.rows * GRID1.cols
    z = ((np.arange(n) * 1000003) % 1000).astype(np.float64) \
        .reshape(GRID1.rows, GRID1.cols)
    zp = np.full((GRID1.rows + 2, GRID1.cols + 2), np.nan)
    zp[1:-1, 1:-1] = z
    a = zp[0:-2, 0:-2]; b = zp[0:-2, 1:-1]; c = zp[0:-2, 2:]
    d = zp[1:-1, 0:-2]; f = zp[1:-1, 2:]
    g = zp[2:, 0:-2]; h = zp[2:, 1:-1]; i = zp[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / 8.0
    tan_s = np.sqrt(dzdx ** 2 + dzdy ** 2).ravel()
    ok = np.isfinite(tan_s) & (tan_s > 0)
    want = {int(cid): int(np.floor(1e6 * np.log(acc[cid] / tan_s[cid]) + 0.5))
            for cid in np.flatnonzero(ok)}
    got_map = dict(zip(got["cell_id"].astype(int), got["twi_micro"]))
    assert set(got_map) == set(want)
    for k in want:
        assert got_map[k] == want[k]


@pytest.mark.usefixtures("ray_session")
def test_dinf_accumulation_matches_bruteforce():
    """D-infinity wave vs a dense topological brute force using the SAME
    facet/weight function (FlowShard.dinf_targets)."""
    from collections import deque

    from whitebox_tools_ray.stages.pregel import FlowShard, dinf_accumulation_pregel

    G2 = GridSpec(west=0.0, north=20.0, res_x=1.0, res_y=1.0, rows=20, cols=25)
    n = G2.rows * G2.cols
    zarr = ((np.arange(n) * 48271) % 99991).astype(np.int64)

    def z_fn(cids):
        return zarr[np.asarray(cids, np.int64)]

    got = dinf_accumulation_pregel(z_fn, G2, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")

    ONE = 1 << 20
    z = lambda c: int(zarr[c])  # noqa: E731
    targets = {c: FlowShard.dinf_targets(z, G2.rows, G2.cols, c) for c in range(n)}
    indeg = np.zeros(n, np.int64)
    for c, outs in targets.items():
        for t, _ in outs:
            indeg[t] += 1
    mass = np.full(n, ONE, object)
    acc = np.zeros(n, object)
    q = deque(np.flatnonzero(indeg == 0).tolist())
    done = np.zeros(n, bool)
    while q:
        c = q.popleft()
        if done[c]:
            continue
        done[c] = True
        m = int(mass[c])
        acc[c] = m
        outs = targets[c]
        shares = [m * w // ONE for _, w in outs]
        if shares:
            shares[-1] = m - sum(shares[:-1])
        for (t, _w), units in zip(outs, shares):
            mass[t] += units
            indeg[t] -= 1
            if indeg[t] == 0:
                q.append(t)
    assert done.all()
    np.testing.assert_array_equal(got["cell_id"].to_numpy(),
                                  np.arange(n, dtype=np.int64))
    np.testing.assert_array_equal(got["acc_units"].to_numpy(),
                                  np.array([int(x) for x in acc], np.int64))


@pytest.mark.usefixtures("ray_session")
def test_flowpath_length_matches_bruteforce():
    """Downslope flowpath length vs a dense per-cell walk with the same
    fixed-point hop units (uses the spatially-LOCAL D8 surface so diagonal
    hops actually occur)."""
    from whitebox_tools_ray.stages.pregel import (_HOP_DIAG, _HOP_STRAIGHT,
                                                  flowpath_length_pregel)

    G2 = GridSpec(west=0.0, north=20.0, res_x=1.0, res_y=1.0, rows=20, cols=25)
    n = G2.rows * G2.cols
    z = ((np.arange(n) * 48271) % 99991).astype(np.int64)
    # steepest-descent D8 pointers from the surface
    down = np.full(n, -1, np.int64)
    for c in range(n):
        r, cc = c // G2.cols, c % G2.cols
        best, bz = -1, z[c]
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, cc + dc
                if 0 <= nr < G2.rows and 0 <= nc < G2.cols:
                    u = nr * G2.cols + nc
                    if z[u] < bz:
                        best, bz = u, z[u]
        down[c] = best

    import ray.data

    from whitebox_tools_ray.stages.flow import tile_of_expr

    cells = np.arange(n, dtype=np.int64)
    dds = ray.data.from_pandas(pd.DataFrame({
        "cell_id": cells, "down_id": down,
        "tile": tile_of_expr(cells, G2, 8)})).repartition(4)
    got = flowpath_length_pregel(dds, G2, tile=8, n_shards=4) \
        .to_pandas().sort_values("cell_id")

    want = np.zeros(n, np.int64)
    for v in range(n):
        cur, acc = v, 0
        while down[cur] >= 0:
            nxt = down[cur]
            ra, ca = cur // G2.cols, cur % G2.cols
            rb, cb = nxt // G2.cols, nxt % G2.cols
            acc += _HOP_DIAG if (ra != rb and ca != cb) else _HOP_STRAIGHT
            cur = nxt
        want[v] = acc
    np.testing.assert_array_equal(got["cell_id"].to_numpy(),
                                  np.arange(n, dtype=np.int64))
    np.testing.assert_array_equal(got["len_units"].to_numpy(), want)


def test_dinf_hand_computed_facet():
    """Hand-worked Tarboton facet fixture (round-2 ADVICE: the facet/weight
    geometry was only ever checked against its own implementation). 3x3
    grid, centre z=10; only depression through the east/north-east facet:
    z(E)=6, z(NE)=4, all other neighbours 20. Expected: facet 0 wins with
    s1=4, s2=2, rang=atan2(2,4), receivers E and NE split by the angle."""
    import numpy as np

    from whitebox_tools_ray.stages.pregel import FlowShard

    rows = cols = 3
    zmap = {4: 10, 5: 6, 2: 4}  # centre, E, NE

    def z(cid):
        return zmap.get(cid, 20)

    got = FlowShard.dinf_targets(z, rows, cols, 4)
    ONE = 1 << 20
    rang = float(np.arctan2(2.0, 4.0))
    w2 = int(np.floor(rang / (np.pi / 4.0) * ONE + 0.5))
    w1 = ONE - w2
    assert got == [(5, w1), (2, w2)]
    # independent sanity: s of the winning facet beats every alternative
    s_win = np.sqrt(4.0 ** 2 + 2.0 ** 2)
    s_f7 = 4.0  # facet 7 clamps to rang=0, s=s1
    assert s_win > s_f7 and 0 < w2 < ONE

    # the vectorized loader path must agree exactly with the scalar helper
    Plain = FlowShard.__ray_actor_class__  # the undecorated class

    class _Stub:
        pass

    stub = _Stub()
    stub.rows, stub.cols = rows, cols
    stub.FD8_ONE = ONE
    stub.DINF_FACETS = Plain.DINF_FACETS
    stub._neighbor_z = Plain._neighbor_z.__get__(stub)

    def z_vec(cids):
        return np.array([z(int(c)) for c in np.asarray(cids).ravel()], np.int64)

    e1, e2, w1v, w2v = Plain.dinf_targets_vec(stub, z_vec, np.array([4]))
    assert (int(e1[0]), int(w1v[0])) == (5, w1)
    assert (int(e2[0]), int(w2v[0])) == (2, w2)


@pytest.mark.usefixtures("ray_session")
def test_flow_accum_full_workflow_dense_oracle():
    """fill -> D8-on-filled -> accumulation, end to end, vs a dense
    composition of the same three contracts."""
    from whitebox_tools_ray.layers import GRID1
    from whitebox_tools_ray.pipelines.queries_hydro2 import flow_accum_full_workflow

    got = flow_accum_full_workflow("unused").to_pandas().sort_values("cell_id")
    rows, cols = GRID1.rows, GRID1.cols
    n = rows * cols
    cells = np.arange(n, dtype=np.int64)
    z = ((cells * 2654435761) % 1000003).astype(np.int64)
    filled = brute_priority_flood(z, rows, cols)

    # dense D8 on the filled surface (strict descent, first-max-wins)
    from whitebox_tools_ray.hydrodefs import _D8_DX, _D8_DY, _d8_len

    zf = filled.reshape(rows, cols).astype(np.float64)
    down = np.full(n, -1, np.int64)
    for cell in range(n):
        r, c = divmod(cell, cols)
        best = -np.inf
        for i in range(8):
            rr, cc = r + _D8_DY[i], c + _D8_DX[i]
            if not (0 <= rr < rows and 0 <= cc < cols):
                continue
            s = (zf[r, c] - zf[rr, cc]) / _d8_len(i)
            if s > 0 and s > best:
                best = s
                down[cell] = rr * cols + cc
    # dense accumulation: counts of cells draining through each cell
    acc = np.ones(n, np.int64)
    order = np.argsort(-filled, kind="stable")  # high to low: safe topo order
    for cell in order:
        d = down[cell]
        if d >= 0:
            acc[d] += acc[cell]
    np.testing.assert_array_equal(got["cell_id"].to_numpy(), cells)
    np.testing.assert_array_equal(got["acc"].to_numpy(), acc)


def test_down_rows_touching_filters_exactly(ray_session):
    """down_rows_touching pulls precisely the rows whose cell (or, when
    asked, DOWN cell) lies in the key set — the bounded driver pull behind
    the stream-network walks."""
    import ray.data

    from whitebox_tools_ray.stages.flow import down_rows_touching

    down = random_forest(seed=11)
    n = len(down)
    full = pd.DataFrame({"cell_id": np.arange(n, dtype=np.int64),
                         "down_id": down})
    ds = ray.data.from_pandas(full)
    keys = np.arange(0, n, 7, dtype=np.int64)

    got = down_rows_touching(ds, keys).sort_values("cell_id")
    exp = full[np.isin(full["cell_id"], keys)]
    np.testing.assert_array_equal(got["cell_id"].to_numpy(),
                                  exp["cell_id"].to_numpy())
    np.testing.assert_array_equal(got["down_id"].to_numpy(),
                                  exp["down_id"].to_numpy())

    got2 = down_rows_touching(ds, keys, include_down_hits=True) \
        .sort_values("cell_id")
    m = np.isin(full["cell_id"], keys) | np.isin(full["down_id"], keys)
    exp2 = full[m]
    np.testing.assert_array_equal(got2["cell_id"].to_numpy(),
                                  exp2["cell_id"].to_numpy())
    np.testing.assert_array_equal(got2["down_id"].to_numpy(),
                                  exp2["down_id"].to_numpy())
