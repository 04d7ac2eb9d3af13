"""Guard-band proofs for queries_terrain2's threshold / rounding contracts:
Pennock class boundaries and the multidirectional-hillshade integer
rounding must sit far from the cross-library atan/sin drift (~1e-11)."""

import numpy as np

from whitebox_tools_ray.layers import GRID1
from whitebox_tools_ray.rasterdefs import _value_fn

_DEG = 57.29577951308232


def _windows():
    """All interior 3x3 windows of the synthetic raster as n0..n7 + centre,
    mirroring queries_terrain2._PEN_NB order."""
    rows, cols = GRID1.rows, GRID1.cols
    cells = np.arange(rows * cols, dtype=np.int64)
    z = _value_fn(cells).reshape(rows, cols)
    zc = z[1:-1, 1:-1]
    nb = [(1, -1), (1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1)]
    n = {i: z[1 + dy:rows - 1 + dy, 1 + dx:cols - 1 + dx]
         for i, (dx, dy) in enumerate(nb)}
    return zc, n


def test_pennock_threshold_guard_band():
    zc, n = _windows()
    zx = (n[1] - n[5]) / 2.0
    zy = (n[7] - n[3]) / 2.0
    zxx = n[1] - 2.0 * zc + n[5]
    zyy = n[7] - 2.0 * zc + n[3]
    zxy = (-n[6] + n[0] + n[4] - n[2]) / 4.0
    fx = (n[2] - n[4] + 2.0 * (n[1] - n[5]) + n[0] - n[6]) / 8.0
    fy = (n[6] - n[4] + 2.0 * (n[7] - n[3]) + n[0] - n[2]) / 8.0
    pp = zx * zx + zy * zy
    qq = pp + 1.0
    ok = pp > 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = np.arctan(np.sqrt(fx * fx + fy * fy)) * _DEG
        plan = -((zxx * zy * zy - 2 * zxy * zx * zy + zyy * zx * zx)
                 / (pp * (qq * np.sqrt(qq)))) * _DEG
        prof = -((zxx * zx * zx - 2 * zxy * zx * zy + zyy * zy * zy)
                 / (pp * (qq * np.sqrt(qq)))) * _DEG
    # plan/prof use only +-*/ and sqrt — bit-identical across numpy/DuckDB,
    # so exact threshold hits branch identically on both sides and need no
    # margin. slope passes through atan (libm drift ~1e-11): its distance
    # from the 3.0-degree class boundary must dominate that drift.
    margin = np.min(np.abs(slope[ok] - 3.0))
    assert margin > 1e-9, f"slope threshold margin {margin:.2e}"
    assert np.isfinite(plan[ok]).all() and np.isfinite(prof[ok]).all()


def test_mdh_rounding_guard_band():
    from whitebox_tools_ray.pipelines.queries_terrain2 import (_COS_T, _MDH_AZ,
                                                               _MDH_W, _SIN_T)
    zc, n = _windows()
    # Florinsky p/q need the 5x5 window; reuse the 3x3-derived Horn-like
    # surrogate ONLY to bound magnitudes is not enough — recompute exactly.
    rows, cols = GRID1.rows, GRID1.cols
    z = _value_fn(np.arange(rows * cols, dtype=np.int64)).reshape(rows, cols)
    zi = {}
    for k in range(25):
        dr, dc = k // 5 - 2, k % 5 - 2
        zi[k] = z[2 + dr:rows - 2 + dr, 2 + dc:cols - 2 + dc]
    p = (1.0 / 420.0) * (44.0 * (zi[3] + zi[23] - zi[1] - zi[21])
                         + 31.0 * (zi[0] + zi[20] - zi[4] - zi[24]
                                   + 2.0 * (zi[8] + zi[18] - zi[6] - zi[16]))
                         + 17.0 * (zi[14] - zi[10] + 4.0 * (zi[13] - zi[11]))
                         + 5.0 * (zi[9] + zi[19] - zi[5] - zi[15]))
    q = (1.0 / 420.0) * (44.0 * (zi[5] + zi[9] - zi[15] - zi[19])
                         + 31.0 * (zi[20] + zi[24] - zi[0] - zi[4]
                                   + 2.0 * (zi[6] + zi[8] - zi[16] - zi[18]))
                         + 17.0 * (zi[2] - zi[22] + 4.0 * (zi[7] - zi[17]))
                         + 5.0 * (zi[1] + zi[3] - zi[21] - zi[23]))
    tan_slope = np.maximum(np.sqrt(p * p + q * q), 0.00017)
    with np.errstate(invalid="ignore", divide="ignore"):
        aspect = np.where(p != 0.0,
                          np.pi - np.arctan(q / np.where(p != 0, p, 1.0))
                          + (np.pi / 2.0) * np.sign(np.where(p != 0, p, 1.0)),
                          np.pi)
    term1 = tan_slope / np.sqrt(1.0 + tan_slope * tan_slope)
    val = term1 * sum((_SIN_T / tan_slope - _COS_T * np.sin(az - aspect)) * w
                      for az, w in zip(_MDH_AZ, _MDH_W)) * 32767.0
    val = np.maximum(val, 0.0)
    t = val + 0.5
    margin = np.min(np.abs(t - np.round(t)))
    assert margin > 1e-7, f"mdh rounding margin {margin:.2e}"
