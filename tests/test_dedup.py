"""Near-dup pipelines vs brute-force oracles on a planted-duplicate corpus."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.functions.dedup import (
    MinHasher,
    SimHasher,
    hamming64,
    jaccard,
    shingle_hashes,
)


def planted_corpus(n_base: int = 60, seed: int = 5) -> pd.DataFrame:
    """Random word docs + planted near-dup pairs (small token edits)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{k}" for k in range(300)]
    texts = []
    for i in range(n_base):
        toks = [vocab[j] for j in rng.integers(0, 300, rng.integers(30, 60))]
        texts.append(" ".join(toks))
    # plant near-dups: copy with 1-3 token substitutions
    for i in range(0, 20, 2):
        toks = texts[i].split()
        for _ in range(rng.integers(1, 3)):
            toks[rng.integers(0, len(toks))] = vocab[rng.integers(0, 300)]
        texts.append(" ".join(toks))
    # plant one exact duplicate
    texts.append(texts[3])
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})


def brute_pairs(df: pd.DataFrame, threshold: float) -> set:
    out = set()
    arr = df["text"].to_numpy()
    ids = df["doc_id"].to_numpy()
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            if jaccard(arr[i], arr[j]) >= threshold:
                out.add((int(ids[i]), int(ids[j])))
    return out


def test_minhash_lsh_finds_planted_dups():
    df = planted_corpus()
    want = brute_pairs(df, 0.5)
    assert len(want) >= 8  # the planted pairs are above threshold

    mh = MinHasher(num_perm=128, bands=32)
    sigs = {int(r.doc_id): mh.signature(r.text) for r in df.itertuples()}
    buckets: dict = {}
    for did, sig in sigs.items():
        for bi, h in enumerate(mh.band_hashes(sig)):
            buckets.setdefault((bi, int(h)), []).append(did)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    verified = {(a, b) for a, b in cand
                if jaccard(df.text[a], df.text[b]) >= 0.5}
    # verification guarantees precision; banding (b=32, r=4) gives ~99%
    # recall at s=0.5 -> all planted pairs found on this corpus
    assert verified <= want
    assert len(want - verified) == 0


def test_minhash_signature_similarity_estimates_jaccard():
    df = planted_corpus()
    mh = MinHasher(num_perm=128, bands=32)
    a, b = df.text[0], df.text[60]  # 60 is the near-dup of 0
    sa, sb = mh.signature(a), mh.signature(b)
    est = float(np.mean(sa == sb))
    true = jaccard(a, b)
    assert abs(est - true) < 0.2


def test_simhash_close_for_near_dups_far_for_random():
    df = planted_corpus()
    sh = SimHasher()
    h0 = np.array([sh.simhash(df.text[0])], np.uint64)
    hdup = np.array([sh.simhash(df.text[60])], np.uint64)
    hrand = np.array([sh.simhash(df.text[30])], np.uint64)
    assert hamming64(h0, hdup)[0] <= 12
    assert hamming64(h0, hrand)[0] > 12


def test_shingles_deterministic():
    a = shingle_hashes("the quick brown fox jumps", k=3)
    b = shingle_hashes("the quick brown fox jumps", k=3)
    np.testing.assert_array_equal(a, b)
    assert len(a) == 3  # 5 tokens -> 3 trigram shingles


@pytest.mark.usefixtures("ray_session")
def test_minhash_pipeline_on_planted_corpus(tmp_path):
    """End-to-end minhash_near_dup over a parquet dir shaped like documents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from whitebox_tools_ray.pipelines.queries_text import minhash_near_dup

    df = planted_corpus()
    df["lang"] = "en"
    df["source"] = "s"
    df["n_chars"] = df["text"].str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    got = minhash_near_dup(str(tmp_path)).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    want = brute_pairs(df, 0.5)
    assert got_pairs <= want          # precision: every reported pair is real
    assert len(want - got_pairs) == 0  # recall on this corpus
    # jacc_num/jacc_den carry the exact integer Jaccard
    for r in got.itertuples():
        assert 0 < r.jacc_num <= r.jacc_den
        assert r.jacc_num / r.jacc_den >= 0.5


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup_planted_pair(tmp_path):
    """A planted near-identical embedding pair must be detected (the round-1
    version emitted 0 rows everywhere — vacuous)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from whitebox_tools_ray.pipelines.queries_text import embedding_near_dup

    rng = np.random.default_rng(7)
    m = rng.standard_normal((40, 64))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    m[1] = m[0] + rng.standard_normal(64) * 0.01  # near-dup of vec 0
    m[1] /= np.linalg.norm(m[1])
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array(list(m.astype(np.float32)),
                              pa.list_(pa.float32(), 64)),
    }), str(tmp_path / "embeddings.parquet"))

    got = embedding_near_dup(str(tmp_path)).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["vec_a"], got["vec_b"])}
    assert (0, 1) in pairs
    # precision: every reported pair really clears the exact-dot threshold
    q = np.rint(m.astype(np.float64) * 10000).astype(np.int64)
    for r in got.itertuples():
        assert int(q[r.vec_a] @ q[r.vec_b]) == r.dot >= 40_000_000


def test_simhash_banding_recall_guarantee():
    """Two-level (band, sub-band) keys must catch EVERY pair with hamming
    <= 7 — including a planted hamming-7 pair whose differing bits touch all
    four of the round-2 16-bit chunks (which that scheme provably missed)."""
    import numpy as np

    from whitebox_tools_ray.functions.dedup import (
        SIMHASH_MAX_HAMMING,
        hamming64,
        simhash_bucket_keys,
    )

    h1 = np.uint64(0xDEADBEEFCAFEF00D)
    # 7 flipped bits spread over all four 16-bit chunks (bits 0,10,20,30,40,50,60)
    flip = np.uint64(0)
    for b in (0, 10, 20, 30, 40, 50, 60):
        flip |= np.uint64(1) << np.uint64(b)
    h2 = h1 ^ flip
    assert hamming64(np.array([h1]), np.array([h2]))[0] == 7 <= SIMHASH_MAX_HAMMING
    # old 4x16 chunking: every chunk differs -> no shared bucket
    for c in range(4):
        assert (int(h1) >> (16 * c)) & 0xFFFF != (int(h2) >> (16 * c)) & 0xFFFF
    k1, k2 = simhash_bucket_keys(np.array([h1, h2], np.uint64))
    assert set(k1) & set(k2), "two-level banding must share a bucket at hamming 7"

    # exhaustive recall property: random pairs within the bound always share
    # a key; pairs beyond it are allowed (but not required) to collide
    rng = np.random.default_rng(42)
    base = rng.integers(0, 2**63, 200, dtype=np.int64).view(np.uint64)
    for h in base:
        nbits = rng.integers(0, SIMHASH_MAX_HAMMING + 1)
        pos = rng.choice(64, size=nbits, replace=False)
        f = np.uint64(0)
        for b in pos:
            f |= np.uint64(1) << np.uint64(b)
        other = h ^ f
        ka, kb = simhash_bucket_keys(np.array([h, other], np.uint64))
        assert set(ka) & set(kb), f"missed pair at hamming {nbits}"
