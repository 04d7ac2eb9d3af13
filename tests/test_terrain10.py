"""Scalar-loop oracle for the Sun et al. smoothing family (FPS / DPS):
independent dense per-cell implementation on a small grid, compared
bit-exactly against the fused tile-stencil pipeline."""

import numpy as np

from whitebox_tools_ray.grid import GridSpec

_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def _cos(n1, n2):
    return (n1[0] * n2[0] + n1[1] * n2[1] + 1.0) / np.sqrt(
        (n1[0] ** 2 + n1[1] ** 2 + 1.0) * (n2[0] ** 2 + n2[1] ** 2 + 1.0))


def _oracle(z, rows, cols, filter_size, norm_deg, num_iter, drainage=None):
    mid = filter_size // 2

    def at(arr, r, c):
        if 0 <= r < rows and 0 <= c < cols:
            return arr[r * cols + c]
        return np.nan

    # normals
    a = np.full(rows * cols, np.nan)
    b = np.full(rows * cols, np.nan)
    for r in range(rows):
        for c in range(cols):
            zc = z[r * cols + c]
            v = []
            for i in range(8):
                zn = at(z, r + _DY[i], c + _DX[i])
                v.append(zc if np.isnan(zn) else zn)
            a[r * cols + c] = -(v[2] - v[4] + 2.0 * (v[1] - v[5])
                                + v[0] - v[6]) / 8.0
            b[r * cols + c] = -(v[6] - v[4] + 2.0 * (v[7] - v[3])
                                + v[0] - v[2]) / 8.0

    # adaptive threshold (DPS) or scalar
    base_thr = np.cos(np.radians(norm_deg))
    thr = np.full(rows * cols, base_thr)
    if drainage:
        mid2 = filter_size
        mult = 10.0 ** drainage["sig_digits"]
        red, t = drainage["reduction"], -abs(drainage["dfm"])
        bins = np.floor(z * mult)
        for r in range(rows):
            for c in range(cols):
                vals = [at(bins, r2, c2)
                        for r2 in range(r - mid2, r + mid2 + 1)
                        for c2 in range(c - mid2, c + mid2 + 1)]
                vals = sorted(v for v in vals if not np.isnan(v))
                k = max(len(vals) // 2, 1)
                dfm = (bins[r * cols + c] - vals[k - 1]) / mult
                if dfm < 0.0 and dfm > t:
                    thr[r * cols + c] = np.cos(np.radians(
                        norm_deg * (1.0 - red * dfm / t)))
                elif dfm <= t:
                    thr[r * cols + c] = np.cos(np.radians(
                        norm_deg * (1.0 - red)))

    # smooth normals
    sa = np.full(rows * cols, np.nan)
    sb = np.full(rows * cols, np.nan)
    for r in range(rows):
        for c in range(cols):
            nc_ = (a[r * cols + c], b[r * cols + c])
            th = thr[r * cols + c]
            asum = bsum = wsum = 0.0
            for wr in range(-mid, mid + 1):
                for wc in range(-mid, mid + 1):
                    r2, c2 = r + wr, c + wc
                    an = at(a, r2, c2)
                    if np.isnan(an):
                        continue
                    bn = b[r2 * cols + c2]
                    cos = _cos(nc_, (an, bn))
                    if cos > th:
                        w = (cos - th) ** 2
                        asum += an * w
                        bsum += bn * w
                        wsum += w
            sa[r * cols + c] = asum / wsum
            sb[r * cols + c] = bsum / wsum

    # Jacobi elevation updates
    zc = z.copy()
    for _ in range(num_iter):
        nxt = zc.copy()
        for r in range(rows):
            for c in range(cols):
                th = thr[r * cols + c]
                ncn = (sa[r * cols + c], sb[r * cols + c])
                zsum = wsum = 0.0
                for n in range(8):
                    r2, c2 = r + _DY[n], c + _DX[n]
                    zn = at(zc, r2, c2)
                    if np.isnan(zn):
                        continue
                    nn = (sa[r2 * cols + c2], sb[r2 * cols + c2])
                    cos = _cos(ncn, nn)
                    if cos > th:
                        w = (cos - th) ** 2
                        zsum += -(nn[0] * (-_DX[n]) + nn[1] * (_DY[n])
                                  - zn) * w
                        wsum += w
                if wsum > 0.0:
                    nxt[r * cols + c] = zsum / wsum
        zc = nxt
    return zc


def _run(drainage, ray_session):
    from whitebox_tools_ray.pipelines.queries_terrain10 import smoothing_field

    # nested so cloudpickle ships it by value (pytest test modules are not
    # importable from Ray workers)
    def zfn(cids):
        cids = np.asarray(cids, np.int64)
        return (((cids * 131) % 97) * 0.25 + (cids % 7)).astype(np.float64)

    g = GridSpec(west=0.0, north=0.0, res_x=1.0, res_y=1.0,
                 rows=28, cols=30, tile_size=16)
    z = zfn(np.arange(g.rows * g.cols, dtype=np.int64))
    want = _oracle(z, g.rows, g.cols, 5, 15.0, 2, drainage)

    got = smoothing_field(g, zfn, filter_size=5, norm_diff_deg=15.0,
                          num_iter=2, drainage=drainage, tile=16) \
        .to_pandas().sort_values("cell_id")
    assert len(got) == g.rows * g.cols
    np.testing.assert_allclose(got["zs"].to_numpy(), want, rtol=0, atol=0)


def test_fps_matches_scalar_oracle(ray_session):
    _run(None, ray_session)


def test_dps_matches_scalar_oracle(ray_session):
    _run({"reduction": 0.8, "dfm": 0.15, "sig_digits": 2}, ray_session)


def test_fps_full_grid_shape(ray_session):
    from whitebox_tools_ray.pipelines.queries_terrain10 import \
        feature_preserving_smoothing

    got = feature_preserving_smoothing("/root/testdata/sf0.001").to_pandas()
    assert len(got) == 170 * 360
    assert np.isfinite(got["zs_u"].to_numpy()).all()
