"""Training-data curation ops #2: corpus-statistics scoring and admission
filters that exercise the two broadcast patterns a 100-TB pipeline needs —
a MODEL broadcast (train tiny sufficient statistics corpus-wide, ship them
once with ray.put, score every row locally) and a POLICY broadcast (an
explicit blocklist shipped once, membership-checked per batch).

All contracts are integers or raw strings, so every oracle is exact SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..relational import keyed_map_groups, partial_agg
from ..sources.tables import read_table
from .queries import query

# --------------------------------------------------------------------------
# Bigram familiarity score (KenLM-style quality proxy with integer stats)
# --------------------------------------------------------------------------

_BIGRAM_SQL = """
WITH bg AS (
  SELECT doc_id, substr(text, s.i + 1, 2) AS b
  FROM documents, range(4096) s(i)
  WHERE s.i < length(text) - 1
), model AS (
  SELECT b, COUNT(*) AS c FROM bg GROUP BY b
)
SELECT bg.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(model.c) AS BIGINT) AS familiarity
FROM bg JOIN model USING (b)
GROUP BY bg.doc_id
"""


def _bigram_ids(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate ASCII texts with a NUL separator and return (bigram ids
    c0*256+c1 excluding separator-crossing pairs, per-doc bigram counts)."""
    data = "\x00".join(texts).encode("utf-8")
    c = np.frombuffer(data, np.uint8).astype(np.int32)
    if len(c) < 2:
        return np.empty(0, np.int32), np.zeros(len(texts), np.int64)
    pair = c[:-1] * 256 + c[1:]
    valid = (c[:-1] != 0) & (c[1:] != 0)
    per_doc = np.maximum(np.array([len(t.encode("utf-8")) for t in texts],
                                  np.int64) - 1, 0)
    return pair[valid], per_doc


@query("bigram_familiarity", _BIGRAM_SQL)
def bigram_familiarity(sf_dir: str):
    """Language-model quality proxy (the KenLM-perplexity-filter shape with
    integer sufficient statistics): pass 1 trains a corpus-wide char-bigram
    count model as a streaming partial aggregate — the model is bounded by
    charset^2 (<= 64 KB of int64), NOT corpus size, so at 100 TB it is
    still one ray.put; pass 2 re-streams the corpus and scores each doc as
    the sum of its bigrams' global counts via the broadcast table
    (np.add.reduceat segment sums, no joins, no second shuffle)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def model_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids, _ = _bigram_ids(df["text"].to_list())
        counts = np.bincount(ids, minlength=0)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"b_id": nz.astype(np.int64),
                             "c": counts[nz].astype(np.int64)})

    model_rows = partial_agg(ds.map_batches(model_partial,
                                            batch_format="pandas"),
                             ["b_id"], [("c", "sum", "c")]).to_pandas()
    model = np.zeros(65536, np.int64)
    model[model_rows["b_id"].to_numpy(np.int64)] = \
        model_rows["c"].to_numpy(np.int64)
    model_ref = ray.put(model)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model_ref)
        ids, per_doc = _bigram_ids(df["text"].to_list())
        offsets = np.concatenate([[0], np.cumsum(per_doc)[:-1]])
        fam = (np.add.reduceat(m[ids], offsets)
               if len(ids) else np.zeros(len(per_doc), np.int64))
        fam = np.where(per_doc > 0, fam, 0)
        keep = per_doc > 0  # docs shorter than 2 chars have no bigrams
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
            "n_bigrams": per_doc[keep],
            "familiarity": fam[keep].astype(np.int64),
        })

    return ds.map_batches(score, batch_format="pandas")


# --------------------------------------------------------------------------
# Global decile assignment WITHOUT a global sort
# --------------------------------------------------------------------------

_DECILE_SQL = """
SELECT doc_id, n_chars,
       (ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) * 10
           // COUNT(*) OVER () AS decile
FROM documents
"""


@query("doc_length_decile", _DECILE_SQL)
def doc_length_decile(sf_dir: str):
    """Corpus-wide rank/decile per document with NO global sort: the value
    domain (n_chars) is bounded, so a tiny count-per-value aggregate gives
    every value's base rank (CDF broadcast, one small driver table); the
    within-value order (tie-break by doc_id) is resolved by a bucketed
    map_groups keyed on n_chars. The only exchange is on a bounded-
    cardinality key — at 10^12 rows a global ``ds.sort`` is the single
    most expensive operation an engine can run; this shape replaces it for
    every bounded-domain ranking (length percentiles, score bands)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    cdf = partial_agg(
        ds.map_batches(lambda df: pd.DataFrame(
            {"n_chars": df["n_chars"].to_numpy(np.int64),
             "cnt": np.ones(len(df), np.int64)}), batch_format="pandas"),
        ["n_chars"], [("cnt", "sum", "cnt")]).to_pandas() \
        .sort_values("n_chars")
    values = cdf["n_chars"].to_numpy(np.int64)
    base = np.concatenate([[0], np.cumsum(cdf["cnt"].to_numpy(np.int64))])
    total = int(base[-1])
    base_of = dict(zip(values.tolist(), base[:-1].tolist()))
    base_ref = ray.put(base_of)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "n_chars": pd.Series(dtype=np.int64),
                                 "decile": pd.Series(dtype=np.int64)})
        lut = ray.get(base_ref)
        g = g.sort_values(["n_chars", "doc_id"])
        within = g.groupby("n_chars", sort=False).cumcount().to_numpy(np.int64)
        nch = g["n_chars"].to_numpy(np.int64)
        rank = np.array([lut[int(v)] for v in nch], np.int64) + within
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "n_chars": nch,
                             "decile": rank * 10 // total})

    return keyed_map_groups(ds, "n_chars", rank_group, per_group=False)


# --------------------------------------------------------------------------
# Source blocklist admission filter (policy broadcast)
# --------------------------------------------------------------------------

BLOCKLIST = ("src3", "src7", "src12", "src18")

_BLOCKLIST_SQL = f"""
SELECT doc_id, source, lang, n_chars
FROM documents
WHERE source NOT IN ({", ".join(repr(s) for s in BLOCKLIST)})
"""


@query("source_blocklist_filter", _BLOCKLIST_SQL)
def source_blocklist_filter(sf_dir: str):
    """Crawl-admission policy filter: an explicit source/domain blocklist is
    shipped to the cluster ONCE (ray.put) and membership-checked per batch
    with a vectorized isin — the real-world list is millions of domains, so
    it must never ride along inside the lambda closure (re-pickled per
    task) nor become a join side (a shuffle for a static policy)."""
    blocked_ref = ray.put(frozenset(BLOCKLIST))
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "source", "lang", "n_chars"])

    def admit(df: pd.DataFrame) -> pd.DataFrame:
        blocked = ray.get(blocked_ref)
        return df[~df["source"].isin(blocked)]

    return ds.map_batches(admit, batch_format="pandas")
