"""Near-duplicate detection kernels: shingling, MinHash, LSH bands, SimHash.

Ray-Data plan (ray_guide.md near-dup pattern): per-batch shingle+minhash in a
stateful map_batches (hash seeds built once per actor) -> explode to
(band_id, band_hash, doc_id) rows -> groupby(band) -> candidate pairs ->
verify exact Jaccard -> keep-min-doc_id per duplicate cluster. Everything is
deterministic in the seed, so results are parallelism-invariant.
"""

from __future__ import annotations

import numpy as np

# odd multipliers + offsets for the universal-hash family h_i(x) = a_i*x + b_i
_MASK61 = np.uint64((1 << 61) - 1)


def _hash_family(num: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Universal-hash family derived from splitmix64 (NOT np.random: the
    derivation must be reproducible inside the DuckDB oracle, which
    regenerates a_i/b_i with the same mixing — pipelines/sqlgen.sm64)."""
    from ..sources.synthetic import splitmix64

    i = np.arange(num, dtype=np.uint64)
    with np.errstate(over="ignore"):
        base = np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
        a = (splitmix64(i * np.uint64(2) + base) % (_MASK61 - np.uint64(1))
             + np.uint64(1)) | np.uint64(1)
        b = splitmix64(i * np.uint64(2) + np.uint64(1) + base) % _MASK61
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles -> stable uint64 hashes (polynomial over token hashes)."""
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    th = np.array([hash_token(t) for t in toks], np.uint64)
    n = len(th) - k + 1
    with np.errstate(over="ignore"):
        out = np.zeros(n, np.uint64)
        for j in range(k):
            out = out * np.uint64(1099511628211) + th[j:j + n]
    return np.unique(out)


_TOKEN_CACHE: dict[str, int] = {}


def hash_token(tok: str) -> int:
    """Deterministic token hash (FNV-1a, independent of PYTHONHASHSEED).
    Memoized per worker — natural-language vocabularies are heavy-tailed, so
    the cache hit rate is high and the per-byte Python loop rarely runs."""
    h = _TOKEN_CACHE.get(tok)
    if h is not None:
        return h
    h = 14695981039346656037
    for byte in tok.encode("utf-8"):
        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    if len(_TOKEN_CACHE) < 4_000_000:  # bound worker memory
        _TOKEN_CACHE[tok] = h
    return h


class MinHasher:
    """num_perm minhash signatures + LSH banding. Build once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42, k: int = 3):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, k
        self.rows = num_perm // bands
        self.a, self.b = _hash_family(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hashes, min over shingles
            hv = (self.a[:, None] * sh[None, :] + self.b[:, None]) & _MASK61
        return hv.min(axis=1)

    def signatures_batch(self, texts) -> np.ndarray:
        """Vectorized signatures for a batch of texts: all shingles hashed in
        one (num_perm, total_shingles) pass, per-doc minima via
        ``np.minimum.reduceat`` — no per-document Python in the hash loop."""
        all_sh = []
        starts = [0]
        for t in texts:
            sh = shingle_hashes(t, self.k)
            all_sh.append(sh)
            starts.append(starts[-1] + len(sh))
        flat = np.concatenate(all_sh) if all_sh else np.empty(0, np.uint64)
        if len(flat) == 0:
            return np.empty((0, self.num_perm), np.uint64)
        with np.errstate(over="ignore"):
            hv = (self.a[:, None] * flat[None, :] + self.b[:, None]) & _MASK61
        mins = np.minimum.reduceat(hv, np.asarray(starts[:-1]), axis=1)
        return mins.T  # (n_docs, num_perm)

    def band_hashes_batch(self, sigs: np.ndarray) -> np.ndarray:
        """(n_docs, num_perm) -> (n_docs, bands) bucket keys, vectorized FNV
        fold over each band's rows."""
        n = sigs.shape[0]
        out = np.empty((n, self.bands), np.uint64)
        with np.errstate(over="ignore"):
            for bi in range(self.bands):
                seg = sigs[:, bi * self.rows:(bi + 1) * self.rows]
                h = np.full(n, 14695981039346656037, np.uint64)
                for j in range(self.rows):
                    h = (h ^ seg[:, j]) * np.uint64(1099511628211)
                out[:, bi] = h
        return out

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """Collapse each band of the signature to one uint64 bucket key."""
        out = np.empty(self.bands, np.uint64)
        with np.errstate(over="ignore"):
            for bi in range(self.bands):
                seg = sig[bi * self.rows:(bi + 1) * self.rows]
                h = np.uint64(14695981039346656037)
                for v in seg:
                    h = (h ^ v) * np.uint64(1099511628211)
                out[bi] = h
        return out


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


class SimHasher:
    """64-bit SimHash over word features (weighted bit voting)."""

    def __init__(self):
        self.bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        toks = text.split()
        if not toks:
            return np.uint64(0)
        th = np.array([hash_token(t) for t in toks], np.uint64)
        bits = ((th[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(th)
        out = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return out


SIMHASH_MAX_HAMMING = 7  # two-level banding guarantees recall at <= 7


def simhash_bucket_keys(h: np.ndarray) -> np.ndarray:
    """(n, 64) int64 LSH bucket keys for 64-bit simhashes: two-level banding
    (8 bands x 8 bits; for each band, the remaining 56 bits split into 8
    sub-bands x 7 bits). A pair within hamming <= 7 leaves >= 1 band
    untouched, and its <= 7 differing bits (all outside that band) leave
    >= 1 of that band's 8 sub-bands untouched — so every such pair shares at
    least one of the 64 (band, sub-band) keys: recall is GUARANTEED at the
    reported max_hamming, unlike the round-2 4x16-bit chunking (pigeonhole
    only to <= 3). Expected bucket population is n/2^15 per key (15 key
    bits), so in-bucket verification stays near-linear at corpus scale."""
    h = np.asarray(h, np.uint64)
    keys = np.empty((len(h), 64), np.int64)
    col = 0
    for i in range(8):
        band = ((h >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.int64)
        low = h & ((np.uint64(1) << np.uint64(8 * i)) - np.uint64(1))
        high = h >> np.uint64(8 * (i + 1))
        compact = low | (high << np.uint64(8 * i))  # the other 56 bits
        for j in range(8):
            sub = ((compact >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.int64)
            keys[:, col] = ((i * 8 + j) * 256 + band) * 128 + sub
            col += 1
    return keys


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via bit tricks (vectorized)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
