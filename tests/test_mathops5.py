"""Scalar oracle for the derandomized turning-bands simulation."""

import numpy as np

from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.sources.synthetic import splitmix64


def _probit_scalar(p):
    # independent reimplementation: inverse-normal via Acklam constants
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    plow = 0.02425
    if p < plow:
        q = np.sqrt(-2.0 * np.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q
                           + 1.0)
    if p > 1.0 - plow:
        q = np.sqrt(-2.0 * np.log(1.0 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
                 + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q
                            + 1.0)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
            + a[5]) * q / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                            + b[4]) * r + 1.0)


def test_band_line_matches_scalar(ray_session):
    from whitebox_tools_ray.pipelines.queries_mathops5 import _TB_SEED, \
        tb_bands

    bands, diag = tb_bands(GRID1.rows, GRID1.cols, GRID1.res_x,
                           iterations=2, rng=24.0, seed=_TB_SEED)
    # scalar re-derivation of band 0's filtered standardized line
    fhs = 12
    fsz = 25
    w = np.sqrt(36.0 / (fhs * (fhs + 1) * fsz))
    t = np.zeros(diag + 2 * fhs)
    for j in range(diag):
        h = int(splitmix64(np.array([j + _TB_SEED], np.uint64))[0])
        t[j] = _probit_scalar((h >> 11) / float(1 << 53))
    y = np.zeros(diag)
    for j in range(diag):
        s = 0.0
        for m in range(-fhs, fhs + 1):
            s += m * t[j + fhs + m]
        y[j] = w * s
    mean = y.sum() / diag
    stdev = np.sqrt((y * y).sum() / diag - mean * mean)
    y = (y - mean) / stdev
    np.testing.assert_allclose(bands[0][0], y, rtol=0, atol=1e-12)


def test_turning_bands_field(ray_session):
    from whitebox_tools_ray.pipelines.queries_mathops5 import _TB_ITER, \
        tb_bands, turning_bands, _TB_SEED, _TB_RANGE

    got = turning_bands("/root/testdata/sf0.001").to_pandas() \
        .sort_values("cell_id")
    n = GRID1.rows * GRID1.cols
    assert len(got) == n
    f = got["field_u"].to_numpy(np.float64) / 1e6
    assert np.isfinite(f).all()
    # near-standard field: per-band lines are standardized and the sum is
    # divided by sqrt(iterations)
    assert abs(f.mean()) < 0.5
    assert 0.4 < f.std() < 2.5

    # spot-check 5 cells against a scalar projection of the driver bands
    bands, diag = tb_bands(GRID1.rows, GRID1.cols, GRID1.res_x,
                           iterations=_TB_ITER, rng=_TB_RANGE,
                           seed=_TB_SEED)
    fmap = dict(zip(got["cell_id"].to_numpy(np.int64), f))
    for cell in (0, 5001, 30030, 44321, n - 1):
        row, col = cell // GRID1.cols, cell % GRID1.cols
        acc = 0.0
        for y, ls, li, ps, sd, sx, sy in bands:
            pi = row - ps * col
            ix = (pi - li) / sd
            iy = ls * ix - li
            p = int(np.sqrt((ix - sx) ** 2 + (iy - sy) ** 2))
            p = min(max(p, 0), diag - 1)
            acc += y[p]
        assert abs(fmap[cell] - acc / np.sqrt(_TB_ITER)) < 1e-5
