"""Guard-band proofs for the rounded float contracts in queries_image4:
for every distinct input the scaled value must sit far from a rounding
boundary relative to cross-library libm drift (<= ~1e-8 scaled units)."""

import numpy as np

from whitebox_tools_ray.pipelines.queries_image4 import (_RECIP_D, _RECIP_I,
                                                         _SIG_D, _SIG_I,
                                                         _rgb_of)


def _margin(scaled: np.ndarray) -> float:
    t = scaled + 0.5
    return float(np.min(np.abs(t - np.round(t))))


def test_hue_micro_guard_band():
    cells = np.arange(170 * 360, dtype=np.int64)
    r, g, b, _ = _rgb_of(cells)
    r1, g1, b1 = r / 255.0, g / 255.0, b / 255.0
    tot = r1 + g1 + b1
    rn, gn, bn = r1 / tot, g1 / tot, b1 / tot
    grey = (rn == gn) & (rn == bn)
    with np.errstate(invalid="ignore", divide="ignore"):
        core = np.arccos((0.5 * ((rn - gn) + (rn - bn)))
                         / np.sqrt((rn - gn) ** 2 + (rn - bn) * (gn - bn)))
    h = np.where(grey, 0.0, np.where(b > g, 2.0 * np.pi - core, core))
    assert _margin(h[~grey] * 1e6) > 1e-4


def test_ihs_roundtrip_guard_band():
    cells = np.arange(170 * 360, dtype=np.int64)
    r, g, b, _ = _rgb_of(cells)
    r1, g1, b1 = r / 255.0, g / 255.0, b / 255.0
    tot = r1 + g1 + b1
    rn, gn, bn = r1 / tot, g1 / tot, b1 / tot
    grey = (rn == gn) & (rn == bn)
    with np.errstate(invalid="ignore", divide="ignore"):
        core = np.arccos((0.5 * ((rn - gn) + (rn - bn)))
                         / np.sqrt((rn - gn) ** 2 + (rn - bn) * (gn - bn)))
    h = np.where(grey, 0.0, np.where(b > g, 2.0 * np.pi - core, core))
    s = 1.0 - 3.0 * np.minimum(np.minimum(rn, gn), bn)
    i = tot / 3.0
    sec = np.where(h < 2 * np.pi / 3, 0, np.where(h < 4 * np.pi / 3, 1, 2))
    hh = h - np.where(sec == 0, 0.0,
                      np.where(sec == 1, 2 * np.pi / 3, 4 * np.pi / 3))
    x = i * (1.0 - s)
    y = i * (1.0 + (s * np.cos(hh)) / np.cos(np.pi / 3.0 - hh))
    z = 3.0 * i - (x + y)
    for arr in (x, y, z):
        assert _margin(arr * 255.0) > 1e-4


def test_bilateral_guard_band():
    # distinct (z, neighbour-config) outputs are data-dependent; check the
    # per-term weight expression's sensitivity at the 1e3 scale instead:
    # max |d out/d w| * ulp-drift << min boundary margin measured on a
    # deterministic sample of windows.
    rng_cells = np.arange(0, 170 * 360, 17, dtype=np.int64)
    v = ((rng_cells * 1000003) % 1000).astype(np.float64)
    # synthetic 9-cell windows from consecutive samples
    n = (len(v) // 9) * 9
    win = v[:n].reshape(-1, 9)
    z = win[:, 4]
    d2 = np.array([2, 1, 2, 1, 0, 1, 2, 1, 2], np.float64)
    wt = (_RECIP_I * np.exp(-((win - z[:, None]) ** 2)
                            / (2 * _SIG_I * _SIG_I))
          * _RECIP_D * np.exp(-d2[None, :] / (2 * _SIG_D * _SIG_D)))
    sw = wt.sum(axis=1)
    out = (wt * win / sw[:, None]).sum(axis=1)
    assert _margin(out * 1e3) > 1e-5


def test_sigmoidal_guard_band():
    zn = np.arange(1000, dtype=np.float64) / 999.0
    gain, cutoff = 2.0, 0.25
    a = 1.0 / (1.0 + np.exp(gain * cutoff))
    b = 1.0 / (1.0 + np.exp(gain * (cutoff - 1.0))) - a
    out = (1.0 / (1.0 + np.exp(gain * (cutoff - zn))) - a) / b
    assert _margin(out * 1e6) > 1e-4
