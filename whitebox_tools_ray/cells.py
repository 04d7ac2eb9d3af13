"""Fixed-radius-search cell encoding + k-ring expansion.

The reference's spatial-join primitive is a hash-grid: points are binned into
square cells of side radius/2 (inv_r = 1/(radius*0.5)), a radius query scans
the fixed 5x5 neighbourhood of bins and distance-filters by r^2, and kNN
expands square shells ring by ring until k neighbours are found
(whitebox-common/src/structures/fixed_radius_search.rs:58-216).

Here the same design becomes the distributed shuffle key: encode both sides
of a spatial join to FRS bins, k-ring-expand the query side (each query cell
emits its (2k+1)^2 neighbourhood), then ``groupby(cell)`` co-locates every
candidate pair. Bin arithmetic is bit-identical to the reference:
``bin = floor(coord * inv_r)`` in float64.
"""

from __future__ import annotations

import numpy as np

# Pack the (i, j) bin pair into one int64 shuffle key. Offset keeps negatives
# positive; +/-2^25 bins per axis (33M cells/axis) far exceeds any realistic
# extent/resolution while keeping the packed key < 2^52 (no int64 overflow).
_OFF = np.int64(1) << np.int64(25)
_SHIFT = np.int64(1) << np.int64(26)


def frs_bin(coord: np.ndarray, radius: float) -> np.ndarray:
    """floor(coord / (radius*0.5)) — fixed_radius_search.rs:66 (inv_r) / :84-87."""
    inv_r = 1.0 / (radius * 0.5)
    return np.floor(np.asarray(coord, np.float64) * inv_r).astype(np.int64)


def pack_bin(i: np.ndarray, j: np.ndarray) -> np.ndarray:
    return (np.asarray(i, np.int64) + _OFF) * _SHIFT + (np.asarray(j, np.int64) + _OFF)


def unpack_bin(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    key = np.asarray(key, np.int64)
    return key // _SHIFT - _OFF, key % _SHIFT - _OFF


def encode_cells(x: np.ndarray, y: np.ndarray, radius: float) -> np.ndarray:
    """Point -> packed FRS bin id (the build-side shuffle key)."""
    return pack_bin(frs_bin(x, radius), frs_bin(y, radius))


def kring_offsets(k: int) -> tuple[np.ndarray, np.ndarray]:
    """All (di, dj) with |di|,|dj| <= k. k=2 is the reference's 5x5 probe
    (fixed_radius_search.rs:69-75)."""
    d = np.arange(-k, k + 1, dtype=np.int64)
    di, dj = np.meshgrid(d, d, indexing="ij")
    return di.ravel(), dj.ravel()


def expand_kring(x: np.ndarray, y: np.ndarray, radius: float, k: int = 2):
    """Emit each query point once per neighbouring bin (probe-side explode).

    Returns (point_index, packed_cell) arrays of length n*(2k+1)^2. After a
    ``groupby(cell)`` against build-side points encoded with
    :func:`encode_cells`, every point pair within ``radius`` is co-located
    (because bins have side radius/2, the 5x5 probe covers the disc —
    the reference's search() guarantee, fixed_radius_search.rs:98-130).
    """
    i = frs_bin(x, radius)
    j = frs_bin(y, radius)
    di, dj = kring_offsets(k)
    n = len(i)
    m = len(di)
    pi = np.repeat(np.arange(n, dtype=np.int64), m)
    cells = pack_bin(
        np.repeat(i, m) + np.tile(di, n),
        np.repeat(j, m) + np.tile(dj, n),
    )
    return pi, cells


def shell_offsets(shell: int) -> tuple[np.ndarray, np.ndarray]:
    """The square ring at Chebyshev distance ``shell`` (kNN expanding-shell
    probe, fixed_radius_search.rs:180-203: max(|m|,|n|) == shell)."""
    d = np.arange(-shell, shell + 1, dtype=np.int64)
    di, dj = np.meshgrid(d, d, indexing="ij")
    keep = np.maximum(np.abs(di), np.abs(dj)) == shell
    return di[keep].ravel(), dj[keep].ravel()


def salt_cells(cells: np.ndarray, seq: np.ndarray, hot_threshold_counts: dict | None,
               n_salts: int = 8) -> np.ndarray:
    """Salt hot cells: cells listed in ``hot_threshold_counts`` get their key
    replaced by ``cell*n_salts + (seq % n_salts)`` in a reserved negative
    keyspace, splitting a skewed group into n_salts sub-groups for a two-phase
    aggregate. Cold cells keep ``cell*n_salts`` so re-merge is a second small
    groupby on ``salted // n_salts``."""
    cells = np.asarray(cells, np.int64)
    salted = cells * np.int64(n_salts)
    if hot_threshold_counts:
        hot = np.isin(cells, np.fromiter(hot_threshold_counts, np.int64, len(hot_threshold_counts)))
        salted = salted + np.where(hot, np.asarray(seq, np.int64) % n_salts, 0)
    return salted
