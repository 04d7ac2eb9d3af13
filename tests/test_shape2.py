"""Structural and guard-band proofs for queries_shape2."""

import numpy as np

from whitebox_tools_ray.pipelines.queries_shape2 import _monotone_chain
from whitebox_tools_ray.stardefs import N_PAIRS, star_rings


def test_star_hull_is_odd_spikes():
    """The oracle's ground truth: every star's hull is its 6 odd-k spikes."""
    A, _ = star_rings(np.arange(N_PAIRS, dtype=np.int64))
    for i in range(N_PAIRS):
        pts = A[i, :12]
        hull = sorted(_monotone_chain(pts))
        assert hull == [1, 3, 5, 7, 9, 11], f"pair {i}: hull {hull}"


def test_monotone_chain_generic():
    """The engine-side hull is a real hull: every input point lies inside
    or on the hull polygon, hull vertices are in convex position."""
    rng_pts = np.stack([
        ((np.arange(40) * 48271) % 1000) / 17.0,
        ((np.arange(40) * 69621) % 1000) / 23.0], axis=1)
    hull = _monotone_chain(rng_pts)
    hp = rng_pts[hull]
    n = len(hp)
    for t in range(n):
        o, a = hp[t], hp[(t + 1) % n]
        cross = (a[0] - o[0]) * (rng_pts[:, 1] - o[1]) \
            - (a[1] - o[1]) * (rng_pts[:, 0] - o[0])
        assert (cross >= -1e-9).all(), "point outside hull edge"


def test_patch_orientation_guard_band():
    A, _ = star_rings(np.arange(N_PAIRS, dtype=np.int64))
    x, y = A[:, :12, 0], A[:, :12, 1]
    mx = x.sum(axis=1) / 12.0
    my = y.sum(axis=1) / 12.0
    sxx = ((x - mx[:, None]) ** 2).sum(axis=1)
    syy = ((y - my[:, None]) ** 2).sum(axis=1)
    sxy = ((x - mx[:, None]) * (y - my[:, None])).sum(axis=1)
    slope = np.where(sxy < 0, -np.sqrt(syy / sxx), np.sqrt(syy / sxx))
    a = np.arctan(slope) * (180.0 / np.pi)
    orient = np.where(a < 0, 90.0 + -1.0 * a, 90.0 - a)
    t = orient * 1e6 + 0.5
    margin = np.min(np.abs(t - np.round(t)))
    assert margin > 1e-4, f"orientation rounding margin {margin:.2e}"
