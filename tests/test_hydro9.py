"""Scalar-literal oracles for MDInf accumulation and DInf mass flux:
independent per-cell facet math + sequential topological drains in plain
Python dicts, compared against the sharded Pregel pipelines."""

import numpy as np

from whitebox_tools_ray.grid import GridSpec

ONE = 1 << 20
QPI = np.pi / 4.0

_MD_XD = (0, -1, -1, -1, 0, 1, 1, 1)
_MD_YD = (-1, -1, 0, 1, 1, 1, 0, -1)
_MD_DD = [1.0 if i % 2 == 0 else 1.4142135623730951 for i in range(8)]


def _zfn_arr(n):
    cids = np.arange(n, dtype=np.int64)
    return ((cids * 1000003) % 1000).astype(np.float64)


def _mdinf_weights(z, rows, cols, r, c, exponent):
    """mdinf_flow_accum.rs:440-605 facet scan for one cell -> (weights[8],
    downslope[8]) in the MDInf neighbour order."""
    def zat(rr, cc):
        if 0 <= rr < rows and 0 <= cc < cols:
            return z[rr * cols + cc]
        return None

    z0 = z[r * cols + c]
    r_f = [0.0] * 8
    s_f = [None] * 8
    for i in range(8):
        ii = (i + 1) % 8
        p1 = zat(r + _MD_YD[i], c + _MD_XD[i])
        p2 = zat(r + _MD_YD[ii], c + _MD_XD[ii])
        if p1 is not None and p2 is not None:
            z1, z2 = p1 - z0, p2 - z0
            nx = (_MD_YD[i] * z2 - _MD_YD[ii] * z1)
            ny = (_MD_XD[ii] * z1 - _MD_XD[i] * z2)
            nz = float(_MD_XD[i] * _MD_YD[ii] - _MD_XD[ii] * _MD_YD[i])
            if nx == 0.0:
                hr = 0.0 if ny >= 0.0 else np.pi
            elif nx >= 0.0:
                hr = np.pi / 2.0 - np.arctan(ny / nx)
            else:
                hr = 3.0 * np.pi / 2.0 - np.arctan(ny / nx)
            hs = -np.tan(np.arccos(nz / np.sqrt(nx * nx + ny * ny + nz * nz)))
            if hr < i * QPI or hr > (i + 1) * QPI:
                if p1 < p2:
                    hr, hs = i * QPI, (z0 - p1) / _MD_DD[i]
                else:
                    hr, hs = ii * QPI, (z0 - p2) / _MD_DD[ii]
            r_f[i], s_f[i] = hr, hs
        elif p1 is not None and p1 < z0:
            r_f[i] = i / 4.0 * np.pi
            s_f[i] = (z0 - p1) / _MD_DD[ii]  # reference's dd[ii] quirk

    valley = [0.0] * 8
    vsum = 0.0
    for i in range(8):
        ii, ip = (i + 1) % 8, (i + 7) % 8
        if s_f[i] is not None and s_f[i] > 0:
            if i * QPI < r_f[i] < (i + 1) * QPI:
                valley[i] = s_f[i]
            elif r_f[i] == r_f[ii]:
                valley[i] = s_f[i]
            elif s_f[ii] is None and r_f[i] == (i + 1) * QPI:
                valley[i] = s_f[i]
            elif s_f[ip] is None and r_f[i] == i * QPI:
                valley[i] = s_f[i]
        valley[i] = valley[i] ** exponent
        vsum += valley[i]

    weights = [0.0] * 8
    if vsum > 0:
        valley = [v / vsum for v in valley]
        if r_f[7] == 0.0:
            r_f[7] = 2.0 * np.pi
        for i in range(8):
            ii = (i + 1) % 8
            if valley[i] > 0:
                weights[i] += valley[i] * ((i + 1) * QPI - r_f[i]) / QPI
                weights[ii] += valley[i] * (r_f[i] - i * QPI) / QPI

    down = [False] * 8
    for i in range(8):
        p1 = zat(r + _MD_YD[i], c + _MD_XD[i])
        down[i] = p1 is not None and p1 < z0
    return weights, down


def _topo_drain(n, edges, init_mass, transform=None):
    """edges: {cell: [(tgt, w_fp)]}; init_mass: {cell: units}. Returns acc
    (recorded mass at fire). Exact-weights mode: share = m*w//ONE, no
    remainder conservation unless transform provides the conserving pair."""
    indeg = {i: 0 for i in range(n)}
    for c, outs in edges.items():
        for t, _ in outs:
            indeg[t] += 1
    mass = dict(init_mass)
    acc = {}
    queue = [c for c in range(n) if indeg[c] == 0]
    while queue:
        c = queue.pop()
        m = mass.get(c, 0)
        acc[c] = m
        mo = transform(c, m) if transform else m
        outs = edges.get(c, [])
        shares = [mo * w // ONE for _, w in outs]
        if shares and transform is not None:
            shares[-1] = mo - sum(shares[:-1])
        for (t, _), u in zip(outs, shares):
            mass[t] = mass.get(t, 0) + u
        for t, _ in outs:
            indeg[t] -= 1
            if indeg[t] == 0:
                queue.append(t)
    assert len(acc) == n
    return acc


def _dinf_edges(z, rows, cols):
    """Independent Tarboton facet scan (dinf_flow_accum.rs facets)."""
    facets = [((0, 1), (-1, 1)), ((-1, 0), (-1, 1)), ((-1, 0), (-1, -1)),
              ((0, -1), (-1, -1)), ((0, -1), (1, -1)), ((1, 0), (1, -1)),
              ((1, 0), (1, 1)), ((0, 1), (1, 1))]
    edges = {}
    for cell in range(rows * cols):
        r, c = cell // cols, cell % cols
        z0 = z[cell]
        best = None
        for (d1r, d1c), (d2r, d2c) in facets:
            r1, c1, r2, c2 = r + d1r, c + d1c, r + d2r, c + d2c
            if not (0 <= r1 < rows and 0 <= c1 < cols
                    and 0 <= r2 < rows and 0 <= c2 < cols):
                continue
            z1, z2 = z[r1 * cols + c1], z[r2 * cols + c2]
            s1, s2 = z0 - z1, z1 - z2
            rang = np.arctan2(s2, s1)
            if rang < 0.0:
                rang, s = 0.0, s1
            elif rang > QPI:
                rang, s = QPI, (z0 - z2) / 1.4142135623730951
            else:
                s = np.sqrt(s1 * s1 + s2 * s2)
            if s > 0 and (best is None or s > best[0]):
                best = (s, r1 * cols + c1, r2 * cols + c2, rang)
        if best is None:
            continue
        _, e1, e2, rang = best
        w2 = int(np.floor(rang / QPI * ONE + 0.5))
        w1 = ONE - w2
        outs = []
        if w1 > 0:
            outs.append((e1, w1))
        if w2 > 0:
            outs.append((e2, w2))
        edges[cell] = outs
    return edges


def test_mdinf_matches_scalar_oracle(ray_session):
    from whitebox_tools_ray.stages.pregel import mdinf_accumulation_pregel

    g = GridSpec(west=0.0, north=0.0, res_x=1.0, res_y=1.0,
                 rows=40, cols=44, tile_size=16)
    n = g.rows * g.cols
    z = _zfn_arr(n)

    def zfn(cids):
        cids = np.asarray(cids, np.int64)
        return ((cids * 1000003) % 1000).astype(np.float64)

    edges = {}
    for cell in range(n):
        w, down = _mdinf_weights(z, g.rows, g.cols, cell // g.cols,
                                 cell % g.cols, 1.1)
        outs = []
        for i in range(8):
            if down[i]:
                t = (cell // g.cols + _MD_YD[i]) * g.cols \
                    + (cell % g.cols + _MD_XD[i])
                outs.append((t, int(np.floor(w[i] * ONE + 0.5))))
        if outs:
            edges[cell] = outs
    want = _topo_drain(n, edges, dict.fromkeys(range(n), ONE))

    got = mdinf_accumulation_pregel(zfn, g, exponent=1.1, tile=64,
                                    n_shards=4).to_pandas() \
        .sort_values("cell_id")
    assert len(got) == n
    assert np.array_equal(got["acc_units"].to_numpy(),
                          np.array([want[i] for i in range(n)], np.int64))


def test_dinf_mass_flux_matches_scalar_oracle(ray_session):
    from whitebox_tools_ray.stages.pregel import dinf_mass_flux_pregel

    g = GridSpec(west=0.0, north=0.0, res_x=1.0, res_y=1.0,
                 rows=36, cols=40, tile_size=16)
    n = g.rows * g.cols
    z = _zfn_arr(n)

    def zfn(cids):
        cids = np.asarray(cids, np.int64)
        return ((cids * 1000003) % 1000).astype(np.float64)

    def load_fn(cids):
        cids = np.asarray(cids, np.int64)
        return (10 + cids % 5) * ONE

    def eff_fn(cids):
        cids = np.asarray(cids, np.int64)
        return ONE * (4 + cids % 4) // 8

    def absorp_fn(cids):
        cids = np.asarray(cids, np.int64)
        return (cids % 3) * ONE // 4

    edges = _dinf_edges(z, g.rows, g.cols)
    load = {i: int((10 + i % 5) * ONE) for i in range(n)}
    eff = {i: int(ONE * (4 + i % 4) // 8) for i in range(n)}
    absorp = {i: int((i % 3) * ONE // 4) for i in range(n)}

    def transform(c, m):
        return (m - absorp[c]) * eff[c] // ONE

    want = _topo_drain(n, edges, load, transform)

    got = dinf_mass_flux_pregel(zfn, load_fn, eff_fn, absorp_fn, g,
                                tile=64, n_shards=4).to_pandas() \
        .sort_values("cell_id")
    assert len(got) == n
    assert np.array_equal(got["acc_units"].to_numpy(),
                          np.array([want[i] for i in range(n)], np.int64))
