"""Web-scale training-data quality ops #2: Gopher-style repetition signals
and benchmark-contamination screening over the documents corpus.

Both are the canonical LLM-corpus filters published for web-text pipelines
(Gopher/MassiveText repetition thresholds; n-gram overlap decontamination vs
held-out eval sets). Integer contracts: counts only, ratio thresholds left
to consumers, so the DuckDB oracles are exact. Token semantics shared with
the dedup family (any-whitespace str.split(); FNV-1a token hashes;
polynomial word-k-gram shingles — sqlgen reproduces each bit-for-bit)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..functions.text import fingerprint64
from ..relational import keyed_map_groups, partial_agg
from ..sources.tables import read_table
from .queries import query
from .sqlgen import add64, fnv_tokens_cte, mul64, tok_rows_cte

# contamination screen: word-8-gram overlap against the deterministic
# held-out slice doc_id % EVAL_MOD == 0 (the "benchmark" docs)
CONTAM_K = 8
EVAL_MOD = 97


@query(
    "doc_repetition_signals",
    f"""
    WITH {tok_rows_cte()},
    big AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok AS g
      FROM tok_rows a
      JOIN tok_rows b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    ),
    tri AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS g
      FROM tok_rows a
      JOIN tok_rows b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN tok_rows c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    ),
    bg AS (
      SELECT doc_id, SUM(cnt) AS n, MAX(cnt) AS top_n
      FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM big GROUP BY doc_id, g)
      GROUP BY doc_id
    ),
    tg AS (
      SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS nd
      FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM tri GROUP BY doc_id, g)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(bg.n, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(bg.top_n, 0) AS BIGINT) AS top_bigram_n,
           CAST(COALESCE(tg.n, 0) AS BIGINT) AS n_trigrams,
           CAST(COALESCE(tg.n - tg.nd, 0) AS BIGINT) AS dup_trigram_n
    FROM documents d
    LEFT JOIN bg ON bg.doc_id = d.doc_id
    LEFT JOIN tg ON tg.doc_id = d.doc_id
    """,
)
def doc_repetition_signals(sf_dir: str):
    """Gopher/MassiveText repetition quality signals, integer sufficient
    statistics per document: total and most-frequent word-bigram counts
    (top-2-gram fraction = top_bigram_n / n_bigrams) and duplicated-trigram
    occurrences (dup fraction = dup_trigram_n / n_trigrams). One vectorized
    pandas pass: explode tokens with positions, shift-join n-grams inside
    the batch, grouped counts — no shuffle (per-doc signals only)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def signals(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        n = toks.str.len().to_numpy(np.int64)
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), n)
        flat = pd.DataFrame({"doc": doc, "tok": np.concatenate(
            [np.asarray(t, object) for t in toks]) if len(df) else
            np.empty(0, object)})
        # within-doc shifts: last rows of each doc masked out
        t1 = flat["tok"].shift(-1)
        t2 = flat["tok"].shift(-2)
        same1 = flat["doc"].shift(-1) == flat["doc"]
        same2 = flat["doc"].shift(-2) == flat["doc"]
        bg = pd.DataFrame({"doc": flat["doc"], "g": flat["tok"] + " " + t1})[same1]
        tg = pd.DataFrame({"doc": flat["doc"],
                           "g": flat["tok"] + " " + t1 + " " + t2})[same2]
        bc = bg.groupby(["doc", "g"]).size().groupby("doc").agg(["sum", "max"])
        tc = tg.groupby(["doc", "g"]).size().groupby("doc").agg(["sum", "count"])
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)})
        out = out.merge(bc.rename(columns={"sum": "n_bigrams",
                                           "max": "top_bigram_n"}),
                        left_on="doc_id", right_index=True, how="left")
        out = out.merge(tc.rename(columns={"sum": "n_trigrams",
                                           "count": "nd"}),
                        left_on="doc_id", right_index=True, how="left")
        for c in ["n_bigrams", "top_bigram_n", "n_trigrams", "nd"]:
            out[c] = out[c].fillna(0).astype(np.int64)
        out["dup_trigram_n"] = out["n_trigrams"] - out["nd"]
        return out[["doc_id", "n_bigrams", "top_bigram_n", "n_trigrams",
                    "dup_trigram_n"]]

    return ds.map_batches(signals, batch_format="pandas")


def _contamination_sql() -> str:
    """Word-8-gram polynomial shingles (same FNV token hashes and nested
    mul-add fold as functions/dedup.shingle_hashes) recomputed in DuckDB;
    eval grams = the distinct shingles of the doc_id % EVAL_MOD == 0 docs."""
    sh = "f0.h"
    for j in range(1, CONTAM_K):
        sh = add64(mul64(sh, "1099511628211"), f"f{j}.h")
    joins = "\n      ".join(
        f"JOIN tok_rows t{j} ON t{j}.doc_id = t0.doc_id "
        f"AND t{j}.pos = t0.pos + {j}\n      "
        f"JOIN tok_fnv f{j} ON f{j}.tok = t{j}.tok"
        for j in range(1, CONTAM_K))
    return f"""
    WITH RECURSIVE {fnv_tokens_cte()},
    sh_rows AS (
      SELECT t0.doc_id, {sh} AS s
      FROM tok_rows t0
      JOIN tok_fnv f0 ON f0.tok = t0.tok
      {joins}
    ),
    shingles AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM sh_rows),
    evalg AS MATERIALIZED (
      SELECT DISTINCT s FROM shingles WHERE doc_id % {EVAL_MOD} = 0
    )
    SELECT s.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated
    FROM shingles s LEFT JOIN evalg e ON e.s = s.s
    WHERE s.doc_id % {EVAL_MOD} <> 0
    GROUP BY s.doc_id
    """


@query("benchmark_contamination", _contamination_sql())
def benchmark_contamination(sf_dir: str):
    """Benchmark-decontamination screen: per non-eval document the number of
    distinct word-8-grams shared with the held-out eval slice (doc_id %
    EVAL_MOD == 0) — the standard exact-overlap test run before training on
    web text. Plan: eval docs are a tiny deterministic slice, so their gram
    set is built once and broadcast (ray.put) — a per-batch sorted-array
    membership probe, never a shuffle join against the corpus. Corpus
    invariant: every document has >= 8 tokens (min observed: 10)."""
    from ..functions.dedup import shingle_hashes

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def eval_grams(df: pd.DataFrame) -> pd.DataFrame:
        m = df["doc_id"].to_numpy(np.int64) % EVAL_MOD == 0
        gs = [shingle_hashes(t, CONTAM_K) for t in df.loc[m, "text"]]
        flat = np.unique(np.concatenate(gs)) if gs else np.empty(0, np.uint64)
        return pd.DataFrame({"g": flat.astype(np.uint64)})

    eg = ds.map_batches(eval_grams, batch_format="pandas").to_pandas()
    eval_set = np.unique(eg["g"].to_numpy(np.uint64))
    eref = ray.put(eval_set)

    def screen(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        ev = _cached_get(eref)
        did = df["doc_id"].to_numpy(np.int64)
        m = did % EVAL_MOD != 0
        rows = []
        for d, t in zip(did[m], df.loc[m, "text"]):
            sh = shingle_hashes(t, CONTAM_K)
            if len(ev):
                pos = np.minimum(np.searchsorted(ev, sh), len(ev) - 1)
                hit = int((ev[pos] == sh).sum())
            else:
                hit = 0
            rows.append((d, len(sh), hit))
        return pd.DataFrame(rows, columns=["doc_id", "n_grams",
                                           "n_contaminated"]) \
            .astype({"doc_id": np.int64, "n_grams": np.int64,
                     "n_contaminated": np.int64})

    return ds.map_batches(screen, batch_format="pandas")


# --------------------------------------------------------------------------
# PII scrubbing (training-data mandate: the standard pre-training redaction
# pass — emails / IPv4 / phone numbers — as a zero-copy Arrow RE2 kernel).
# The synthetic corpus contains no organic PII, so both sides append the
# SAME deterministic doc_id-derived contact line to 2/3 of the documents
# (doc_id % 3 != 0) before scanning; the other 1/3 exercise the no-match
# path. pyarrow.compute and DuckDB both run RE2, so counts AND the redacted
# strings themselves are byte-comparable (the driver hash covers them).
# --------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+1-555-\d{4}"


@query(
    "pii_scrub",
    rf"""
    WITH aug AS (
      SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 THEN '' ELSE
        ' contact user' || CAST(doc_id AS VARCHAR)
        || '@ex' || CAST(doc_id % 7 AS VARCHAR)
        || '.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
        || '.0.' || CAST(doc_id % 100 AS VARCHAR)
        || ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        END AS aug_text
      FROM documents
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(aug_text, '{_PII_EMAIL}')) AS BIGINT)
        AS n_email,
      CAST(len(regexp_extract_all(aug_text, '{_PII_IPV4}')) AS BIGINT)
        AS n_ip,
      CAST(len(regexp_extract_all(aug_text, '{_PII_PHONE}')) AS BIGINT)
        AS n_phone,
      regexp_replace(regexp_replace(regexp_replace(aug_text,
        '{_PII_EMAIL}', '[EMAIL]', 'g'),
        '{_PII_IPV4}', '[IP]', 'g'),
        '{_PII_PHONE}', '[PHONE]', 'g') AS redacted,
      CAST(length(regexp_replace(regexp_replace(regexp_replace(aug_text,
        '{_PII_EMAIL}', '[EMAIL]', 'g'),
        '{_PII_IPV4}', '[IP]', 'g'),
        '{_PII_PHONE}', '[PHONE]', 'g')) AS BIGINT) AS red_len
    FROM aug
    """,
)
def pii_scrub(sf_dir: str):
    """PII redaction over the documents corpus: per-document email / IPv4 /
    phone match counts plus the redacted text (passes applied in a fixed
    order: email -> ip -> phone). One streaming Arrow pass — compiled-RE2
    `count_substring_regex` / `replace_substring_regex` kernels, no Python
    row loop, no shuffle (per-doc outputs only). Reference analog: the
    attribute-scrub family (data_tools modify_no_data_value.rs pattern —
    value rewrite in a single raster/table pass); the regex set is the
    standard web-pipeline PII triple."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        s = lambda a: pc.cast(pa.array(a), pa.string())  # noqa: E731
        inj = pc.binary_join_element_wise(
            " contact user", s(ids), "@ex", s(ids % 7),
            ".com from 10.", s(ids % 256), ".0.", s(ids % 100),
            " tel +1-555-", pc.utf8_lpad(s(ids % 10000), 4, "0"), "")
        inj = pc.if_else(pa.array(ids % 3 == 0), "", inj)
        aug = pc.binary_join_element_wise(t.column("text"), inj, "")
        red = pc.replace_substring_regex(
            aug, pattern=_PII_EMAIL, replacement="[EMAIL]")
        red = pc.replace_substring_regex(
            red, pattern=_PII_IPV4, replacement="[IP]")
        red = pc.replace_substring_regex(
            red, pattern=_PII_PHONE, replacement="[PHONE]")
        cnt = lambda p: pc.cast(  # noqa: E731
            pc.count_substring_regex(aug, pattern=p), pa.int64())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_email": cnt(_PII_EMAIL),
            "n_ip": cnt(_PII_IPV4),
            "n_phone": cnt(_PII_PHONE),
            "redacted": red,
            "red_len": pc.cast(pc.utf8_length(red), pa.int64()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Stratified deterministic sampling (training-data mandate: "take K docs per
# stratum" curation without a global sort — the seeded-hash-order idiom every
# corpus-mixing pipeline uses so reruns and resumed jobs pick the same docs).
# --------------------------------------------------------------------------

_SAMPLE_K = 20


def _stratified_sql() -> str:
    from .sqlgen import sm64

    return f"""
    SELECT lang, doc_id, CAST(rnk AS BIGINT) AS smpl_rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {sm64('doc_id')}) AS rnk
      FROM documents)
    WHERE rnk <= {_SAMPLE_K}
    """


@query("stratified_sample_topk", _stratified_sql())
def stratified_sample_topk(sf_dir: str):
    """Deterministic stratified sample: the K=_SAMPLE_K documents per lang
    with the smallest splitmix64(doc_id) (a u64 bijection, so no ties and the
    pick is stable across runs / parallelism / resumes). Distributed per-group
    top-k WITHOUT a global sort: each batch emits at most K rows per lang
    (map-side combine), then one tiny groupby over num_batches x langs x K
    partial rows selects the final K and assigns ranks — shuffle volume is
    O(K * strata), never O(corpus)."""
    from ..sources.synthetic import splitmix64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "lang": df["lang"],
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "h": splitmix64(df["doc_id"].to_numpy(np.int64)),
        })
        return out.sort_values("h").groupby("lang", sort=False) \
            .head(_SAMPLE_K)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("h").head(_SAMPLE_K).reset_index(drop=True)
        return pd.DataFrame({
            "lang": g["lang"],
            "doc_id": g["doc_id"].astype(np.int64),
            "smpl_rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("lang").map_groups(final, batch_format="pandas")


# --------------------------------------------------------------------------
# URL canonicalization (training-data mandate: the dedup-key normalization
# every web crawl applies before URL-level dedup — lowercase scheme+host,
# strip the port, drop the fragment, preserve path case). The corpus has no
# URL column, so both sides synthesize the SAME mixed-case doc_id-derived
# raw URL (optional :80 port, optional #fragment) and canonicalize it.
# --------------------------------------------------------------------------

@query(
    "url_canonicalize",
    r"""
    WITH raw AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 2 = 1 THEN 'HTTPS' ELSE 'HTTP' END)
        || '://WWW' || CAST(doc_id % 5 AS VARCHAR)
        || '.Ex' || CAST(doc_id % 11 AS VARCHAR) || '.COM'
        || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END)
        || '/P/' || CAST(doc_id AS VARCHAR)
        || (CASE WHEN doc_id % 3 = 0 THEN '#Frag' ELSE '' END) AS url
      FROM documents
    )
    SELECT doc_id,
      lower(regexp_extract(url, '^([A-Za-z]+)://([^/:#]+)', 2)) AS host,
      lower(regexp_extract(url, '^([A-Za-z]+)://([^/:#]+)', 1)) || '://'
        || lower(regexp_extract(url, '^([A-Za-z]+)://([^/:#]+)', 2))
        || regexp_extract(url, '^[A-Za-z]+://[^/:#]+(:\d+)?(/[^#]*)?', 2)
        AS canon
    FROM raw
    """,
)
def url_canonicalize(sf_dir: str):
    """URL canonicalization for crawl dedup keys: lowercase the scheme and
    host, strip any explicit port, drop the #fragment, keep the path
    byte-for-byte (paths are case-sensitive). One streaming Arrow pass —
    a single compiled-RE2 `extract_regex` per batch whose named groups
    (scheme/host/port/path) are recombined with `binary_join_element_wise`;
    the canonical strings are byte-compared against the DuckDB oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def canon(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        s = lambda a: pc.cast(pa.array(a), pa.string())  # noqa: E731
        scheme = pc.if_else(pa.array(ids % 2 == 1), "HTTPS", "HTTP")
        port = pc.if_else(pa.array(ids % 4 == 0), ":80", "")
        frag = pc.if_else(pa.array(ids % 3 == 0), "#Frag", "")
        raw = pc.binary_join_element_wise(
            scheme, "://WWW", s(ids % 5), ".Ex", s(ids % 11), ".COM",
            port, "/P/", s(ids), frag, "")
        ex = pc.extract_regex(
            raw, pattern=r"^(?P<sc>[A-Za-z]+)://(?P<host>[^/:#]+)"
                         r"(?P<port>:\d+)?(?P<path>/[^#]*)?")
        sc = pc.utf8_lower(pc.struct_field(ex, "sc"))
        host = pc.utf8_lower(pc.struct_field(ex, "host"))
        out = pc.binary_join_element_wise(
            sc, "://", host, pc.struct_field(ex, "path"), "")
        return pa.table({"doc_id": t.column("doc_id"),
                         "host": host, "canon": out})

    return ds.map_batches(canon, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Token-budget source mixing (training-data mandate: "take at most B tokens
# per source, greedily in seeded-hash order" — the corpus-mixing admission
# rule). Exact and distributed WITHOUT a per-source global sort: the
# admitted set is a prefix in splitmix64(doc_id) order, so only the
# per-source CUTOFF hash must be found. Three passes: (A) per-(source,
# hash-bucket) char sums -> a sources x 1024 histogram on the driver picks
# each source's boundary bucket; (B) only the boundary bucket's rows
# (corpus/1024 selectivity) resolve the exact cutoff; (C) a broadcast
# per-source cutoff filter emits the admitted docs. Driver state is
# O(sources x 1024), shuffle volume zero.
# --------------------------------------------------------------------------

_MIX_BUDGET = 4_000  # chars per source; binds at sf0.001/0.01/0.1
# (per-source totals: ~21k / ~7.5k / ~74k chars)


def _budget_sql() -> str:
    from .sqlgen import sm64

    return f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY {sm64('doc_id')}
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents)
    SELECT source, doc_id FROM ranked WHERE cum <= {_MIX_BUDGET}
    """


@query("source_token_budget", _budget_sql())
def source_token_budget(sf_dir: str):
    """Greedy per-source admission under a character budget, in
    splitmix64(doc_id) order (deterministic, tie-free). See the block
    comment above for the 3-pass exact plan; the DuckDB oracle is the
    one-window-function form of the same rule."""
    from ..sources.synthetic import splitmix64

    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "source", "n_chars"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["h"] = splitmix64(df["doc_id"].to_numpy(np.int64))
        df["bucket"] = (df["h"].to_numpy() >> np.uint64(54)).astype(np.int64)
        return df

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        return keyed(df).groupby(["source", "bucket"], as_index=False,
                                 sort=False)["n_chars"].sum()

    # pass A: sources x <=1024 partial rows per batch; final combine is tiny
    agg = ds.map_batches(bucket_sums, batch_format="pandas").to_pandas() \
        .groupby(["source", "bucket"], as_index=False)["n_chars"].sum()
    cuts: dict[str, np.uint64] = {}
    bounds: dict[str, tuple[int, int]] = {}
    for src, g in agg.groupby("source"):
        g = g.sort_values("bucket")
        cum = g["n_chars"].cumsum()
        over = (cum > _MIX_BUDGET).to_numpy()
        if not over.any():
            cuts[src] = np.uint64(0xFFFFFFFFFFFFFFFF)
            continue
        i = int(np.argmax(over))
        prev = int(cum.iloc[i - 1]) if i > 0 else 0
        bounds[src] = (int(g["bucket"].iloc[i]), _MIX_BUDGET - prev)

    if bounds:
        bb = {s: b for s, (b, _) in bounds.items()}

        def boundary_rows(df: pd.DataFrame) -> pd.DataFrame:
            df = keyed(df)
            m = df["source"].map(bb).to_numpy() == df["bucket"].to_numpy()
            return df.loc[m, ["source", "n_chars", "h"]]

        # pass B: ~corpus/1024 rows resolve each source's exact cutoff hash
        br = ds.map_batches(boundary_rows, batch_format="pandas").to_pandas()
        for src, (bucket, resid) in bounds.items():
            rows = br[br["source"] == src].sort_values("h")
            ok = rows["n_chars"].cumsum().to_numpy() <= resid
            if ok.any():
                cuts[src] = rows["h"].to_numpy()[np.flatnonzero(ok)[-1]]
            elif bucket > 0:
                # admit the full buckets below; cutoff = bucket lower bound-1
                cuts[src] = np.uint64(bucket << 54) - np.uint64(1)
            # else: nothing admitted for this source -> no cuts entry

    def admit(df: pd.DataFrame) -> pd.DataFrame:
        df = keyed(df)
        hc = df["source"].map(cuts)
        m = hc.notna().to_numpy() & (
            df["h"].to_numpy() <= hc.fillna(0).to_numpy(np.uint64))
        return df.loc[m, ["source", "doc_id"]]

    return ds.map_batches(admit, batch_format="pandas")


# --------------------------------------------------------------------------
# TF-IDF keyword extraction (integer contract: raw tf + global df per term,
# top-5 terms per doc by tf desc / tok asc — the idf weighting is a
# monotone per-(tf, df) function left to consumers, so the oracle is
# exact). Scale note: the document-frequency table is vocabulary-sized and
# broadcast to the per-batch scorers; at open-web vocabulary scale the
# broadcast swaps for a hash-bucketed join on the token, same contract.
# --------------------------------------------------------------------------

_TFIDF_TOPN = 5


def _tfidf_sql() -> str:
    from .sqlgen import tok_rows_cte

    return f"""
    WITH {tok_rows_cte()},
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM tok_rows GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok_rows GROUP BY tok
    )
    SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
    FROM (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, tf.tok) AS rnk
      FROM tf JOIN df ON df.tok = tf.tok)
    WHERE rnk <= {_TFIDF_TOPN}
    """


@query("doc_tfidf_top_terms", _tfidf_sql())
def doc_tfidf_top_terms(sf_dir: str):
    """Top-5 terms per document by term frequency (ties broken by token
    asc) with each term's global document frequency attached — the integer
    sufficient statistics of TF-IDF keyword extraction. Two stages: a
    vocabulary-sized df aggregate (distinct-doc count per token, built with
    a map-side per-batch distinct) broadcast via ray.put, then one per-batch
    pass computing tf and selecting the top-5 (docs never span batches)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def batch_df(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        n = toks.str.len().to_numpy(np.int64)
        flat = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), n),
            "tok": np.concatenate([np.asarray(t, object) for t in toks])
            if len(df) else np.empty(0, object),
        }).drop_duplicates()
        return flat.groupby("tok", as_index=False, sort=False) \
            .size().rename(columns={"size": "df"})

    # vocabulary-sized: per-batch distinct-doc partials, final combine tiny
    dfreq = ds.map_batches(batch_df, batch_format="pandas").to_pandas() \
        .groupby("tok", as_index=False)["df"].sum()
    dref = ray.put(dict(zip(dfreq["tok"], dfreq["df"].astype(np.int64))))

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        dmap = _cached_get(dref)
        toks = df["text"].str.split()
        n = toks.str.len().to_numpy(np.int64)
        flat = pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), n),
            "tok": np.concatenate([np.asarray(t, object) for t in toks])
            if len(df) else np.empty(0, object),
        })
        tf = flat.groupby(["doc_id", "tok"], as_index=False, sort=False) \
            .size().rename(columns={"size": "tf"})
        tf = tf.sort_values(["doc_id", "tf", "tok"],
                            ascending=[True, False, True])
        top = tf.groupby("doc_id", sort=False).head(_TFIDF_TOPN)
        return pd.DataFrame({
            "doc_id": top["doc_id"].to_numpy(np.int64),
            "tok": top["tok"],
            "tf": top["tf"].to_numpy(np.int64),
            "df": top["tok"].map(dmap).to_numpy(np.int64),
        })

    return ds.map_batches(topn, batch_format="pandas")


# --------------------------------------------------------------------------
# Paragraph-level exact dedup (C4-style): corpus-wide first occurrence wins
# --------------------------------------------------------------------------

_PARA_SQL = """
WITH para AS (
  SELECT doc_id, doc_id // 4 AS page_id, doc_id % 4 AS para_idx,
         text, n_chars
  FROM documents
), k AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keep_doc FROM para
)
SELECT page_id,
       COUNT(*) AS n_paras,
       CAST(SUM(CASE WHEN doc_id = keep_doc THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN doc_id = keep_doc THEN 0 ELSE 1 END) AS BIGINT)
           AS n_dropped,
       CAST(SUM(CASE WHEN doc_id = keep_doc THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars,
       COALESCE(string_agg(CASE WHEN doc_id = keep_doc THEN text END,
                           chr(10) || chr(10) ORDER BY para_idx), '')
           AS kept_text
FROM k GROUP BY page_id
"""


@query("paragraph_dedup", _PARA_SQL)
def paragraph_dedup(sf_dir: str):
    """C4-style paragraph-level exact dedup: pages are composed of 4
    consecutive documents (page_id = doc_id // 4, paragraph order =
    doc_id % 4 — deterministic, so the oracle composes the same pages); a
    paragraph is kept only at its corpus-wide FIRST occurrence (min doc_id
    over identical text), including first-within-page for intra-page
    repeats. Pages whose every paragraph duplicated an earlier one remain
    in the output with kept_text = ''.

    Shuffle discipline (100-TB shape): the duplicate-group exchange is
    keyed on a 64-bit content fingerprint, never the text (same collision
    note as doc_exact_dedup); the text travels exactly twice — once into
    the fingerprint join, once into the per-page reassembly — both as
    streaming map_batches/groupby stages, nothing on the driver."""
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "text", "n_chars"])

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "h": fingerprint64(df["text"]).astype(np.int64),
            "doc_id": did,
            "page_id": did // 4,
            "para_idx": did % 4,
            "text": df["text"].to_numpy(object),
            "n_chars": df["n_chars"].to_numpy(np.int64),
        })

    para = ds.map_batches(enc, batch_format="pandas")
    keep_min = partial_agg(
        para.map_batches(lambda df: df[["h", "doc_id"]],
                         batch_format="pandas"),
        ["h"], [("doc_id", "min", "keep_doc")])
    joined = para.join(keep_min, join_type="inner", num_partitions=16,
                       on=("h",))

    def pages(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["page_id", "para_idx"])
        keep = (g["doc_id"].to_numpy(np.int64)
                == g["keep_doc"].to_numpy(np.int64))
        g = g.assign(keepflag=keep.astype(np.int64),
                     kc=np.where(keep, g["n_chars"].to_numpy(np.int64), 0))
        agg = g.groupby("page_id", sort=True).agg(
            n_paras=("doc_id", "size"), n_kept=("keepflag", "sum"),
            kept_chars=("kc", "sum"))
        kept_text = (g[keep].groupby("page_id", sort=True)["text"]
                     .agg("\n\n".join))
        out = agg.reset_index().astype({"page_id": np.int64,
                                        "n_paras": np.int64,
                                        "n_kept": np.int64,
                                        "kept_chars": np.int64})
        out["n_dropped"] = out["n_paras"] - out["n_kept"]
        out["kept_text"] = out["page_id"].map(kept_text).fillna("")
        return out[["page_id", "n_paras", "n_kept", "n_dropped",
                    "kept_chars", "kept_text"]]

    return keyed_map_groups(joined, "page_id", pages, per_group=False)
