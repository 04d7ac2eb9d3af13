"""Edge-case coverage for the curation operators added in round 5.

The oracle-parity suite exercises the realistic paths at sf0.001; the
crafted corpora here hit the branches real data never does:
`source_token_budget`'s zero-admission source (first doc already over
budget) and the empty-boundary-bucket case (the boundary bucket's first
row overshoots the residual, so only the full buckets below are
admitted). The oracle is an independent brute-force rule: sort each
source by splitmix64(doc_id), admit while the running char total stays
within budget.
"""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.pipelines.queries_text2 import (
    _MIX_BUDGET, source_token_budget)
from whitebox_tools_ray.sources.synthetic import splitmix64


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    df = df.copy()
    df["h"] = splitmix64(df["doc_id"].to_numpy(np.int64))
    for src, g in df.groupby("source"):
        g = g.sort_values("h")
        ok = g["n_chars"].cumsum().to_numpy() <= _MIX_BUDGET
        out.append(g.loc[ok, ["source", "doc_id"]])
    return (pd.concat(out) if out else df[["source", "doc_id"]]) \
        .sort_values(["source", "doc_id"]).reset_index(drop=True)


def _ids_by_bucket_order(n: int, start: int = 0) -> list[int]:
    """The first n doc_ids ordered by their splitmix64 hash (so tests can
    place chars at known positions in the admission order)."""
    ids = np.arange(start, start + n, dtype=np.int64)
    return ids[np.argsort(splitmix64(ids))].tolist()


def _run(tmp_path, df: pd.DataFrame) -> pd.DataFrame:
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    got = source_token_budget(str(sf)).to_pandas()
    return got.sort_values(["source", "doc_id"]).reset_index(drop=True)


def test_zero_admission_source(tmp_path, ray_session):
    """A source whose hash-first doc alone exceeds the budget admits
    nothing; a normal sibling source is unaffected."""
    first, second = _ids_by_bucket_order(2)
    rows = [
        {"doc_id": first, "source": "giant", "n_chars": _MIX_BUDGET + 1,
         "text": "x"},
        {"doc_id": second, "source": "giant", "n_chars": 10, "text": "x"},
    ]
    rows += [{"doc_id": 1000 + i, "source": "ok", "n_chars": 100,
              "text": "x"} for i in range(5)]
    df = pd.DataFrame(rows)
    got = _run(tmp_path, df)
    want = _brute(df)
    assert (got["source"] == "giant").sum() == 0
    assert (want["source"] == "giant").sum() == 0
    pd.testing.assert_frame_equal(got, want)


def test_budget_not_binding_admits_all(tmp_path, ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "source": ["a"] * 5 + ["b"] * 5,
        "n_chars": np.full(10, 7, np.int64),
        "text": ["x"] * 10,
    })
    got = _run(tmp_path, df)
    assert len(got) == 10
    pd.testing.assert_frame_equal(got, _brute(df))


def test_empty_boundary_bucket_admits_full_buckets_below(tmp_path,
                                                         ray_session):
    """Chars are placed so the budget is exhausted exactly at a doc
    boundary partway through the hash order: every later doc (including
    the boundary bucket's own rows) must be rejected, every earlier one
    admitted — the `bucket > 0` fallback when no boundary-bucket row fits."""
    order = _ids_by_bucket_order(64)
    k = 17
    per = _MIX_BUDGET // k  # k docs fill the budget except a remainder
    rows = []
    for rank, did in enumerate(order):
        n = per if rank < k else _MIX_BUDGET  # later docs can never fit
        rows.append({"doc_id": did, "source": "s", "n_chars": n,
                     "text": "x"})
    df = pd.DataFrame(rows)
    got = _run(tmp_path, df)
    want = _brute(df)
    assert len(want) == k  # the crafted prefix is what the rule admits
    pd.testing.assert_frame_equal(got, want)


def test_matches_brute_on_random_corpus(tmp_path, ray_session):
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["a", "b", "c"], n),
        "n_chars": rng.integers(1, 400, n).astype(np.int64),
        "text": ["x"] * n,
    })
    pd.testing.assert_frame_equal(_run(tmp_path, df), _brute(df))
