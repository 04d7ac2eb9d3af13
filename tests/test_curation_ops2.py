"""Edge-case units for the round-5 curation/graph kernels
(pipelines/queries_curation.py): bigram segmentation, link extraction,
decile empty-bucket contract. The full-pipeline hash checks live in
test_oracle_parity.py; these pin the branches small corpora rarely hit."""

import numpy as np
import pandas as pd
import pyarrow as pa

from whitebox_tools_ray.pipelines.queries_curation import (_bigram_ids,
                                                           _LinkExtract)


def test_bigram_ids_boundaries():
    # separator-crossing pairs must be excluded; per-doc counts clip at 0
    ids, per_doc = _bigram_ids(["abc", "", "x", "yz"])
    assert per_doc.tolist() == [2, 0, 0, 1]
    want = [ord("a") * 256 + ord("b"), ord("b") * 256 + ord("c"),
            ord("y") * 256 + ord("z")]
    assert ids.tolist() == want


def test_bigram_ids_empty_and_single():
    ids, per_doc = _bigram_ids([])
    assert len(ids) == 0 and len(per_doc) == 0
    ids, per_doc = _bigram_ids([""])
    assert len(ids) == 0 and per_doc.tolist() == [0]


def test_bigram_ids_scoring_segments_align():
    # reduceat offsets derived from per_doc must partition ids exactly
    texts = ["hello world", "ab", "", "zzz"]
    ids, per_doc = _bigram_ids(texts)
    assert per_doc.sum() == len(ids)
    # doc 0's segment is its own bigrams
    seg0 = ids[: per_doc[0]]
    b = "hello world".encode()
    want0 = [b[i] * 256 + b[i + 1] for i in range(len(b) - 1)]
    assert seg0.tolist() == want0


def test_link_extract_no_anchors_and_multiline():
    t = pa.table({
        "page_id": pa.array([0, 1, 2], pa.int64()),
        "src_site": pa.array([5, 6, 7], pa.int64()),
        "html": pa.array([
            b"<html><body>no links here</body></html>",
            b'<a href="https://site12.example/p0">a</a>\n'
            b'<a href="https://site12.example/p1">b</a>',
            b'pre <a href="https://other.example/x">ignored domain</a> '
            b'<a href="https://site3.example/p0">kept</a>',
        ], pa.binary()),
    })
    out = _LinkExtract()(t).to_pandas()
    # page 0 contributes nothing; duplicate dst kept as multiplicity;
    # foreign-domain href ignored by the site pattern
    assert out.values.tolist() == [[6, 12], [6, 12], [7, 3]]


def test_decile_rank_matches_row_number(ray_session, tmp_path):
    import ray.data

    from whitebox_tools_ray.pipelines.queries_curation import \
        doc_length_decile

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x"] * n,
        "lang": ["en"] * n,
        "source": ["s"] * n,
        # heavy ties: only 7 distinct lengths
        "n_chars": rng.integers(10, 17, n).astype(np.int64),
    })
    ray.data.from_pandas(df).write_parquet(str(tmp_path / "documents.parquet"))
    out = doc_length_decile(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    order = df.sort_values(["n_chars", "doc_id"]).reset_index()
    rank = pd.Series(np.arange(n), index=order["doc_id"]).sort_index()
    want = (rank.to_numpy(np.int64) * 10) // n
    np.testing.assert_array_equal(
        out.sort_values("doc_id")["decile"].to_numpy(np.int64), want)
