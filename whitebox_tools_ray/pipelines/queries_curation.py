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

from ..memo import session_memo
from ..relational import keyed_map_groups, partial_agg
from ..sources.tables import read_table
from .queries import query
from .sqlgen import add64, sm64

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
        # reduceat rejects an offset == len(ids), which a trailing
        # zero-bigram doc produces; clamp — the np.where below zeroes the
        # meaningless value that the clamped segment yields
        offsets = np.minimum(np.concatenate([[0], np.cumsum(per_doc)[:-1]]),
                             max(len(ids) - 1, 0))
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


# --------------------------------------------------------------------------
# Web link-graph extraction (the CC web-graph shape)
# --------------------------------------------------------------------------

_LINKS_N = 5000
_LINKS_SEED = 42


def _synth_link_pages(n: int = _LINKS_N, seed: int = _LINKS_SEED) -> pa.Table:
    """Pages whose anchors are closed-form: page i (site h % 1000) links to
    site splitmix64(h + j + 1) % 1000 for j in 0..n_links-1 (1..8 links).
    The HTML is real markup the extraction stage must actually parse."""
    from ..sources.synthetic import splitmix64

    ids = np.arange(n, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    n_links = (1 + (h % np.uint64(8))).astype(np.int64)
    src_site = (h % np.uint64(1000)).astype(np.int64)
    htmls = []
    for i in range(n):
        tgt = splitmix64(h[i] + np.uint64(1)
                         + np.arange(n_links[i], dtype=np.uint64)) \
            % np.uint64(1000)
        anchors = "".join(
            f'<a href="https://site{int(t)}.example/p{j}">link {j}</a> '
            for j, t in enumerate(tgt))
        htmls.append((f"<html><head><title>P{i}</title></head><body>"
                      f"<p>page {i}</p>{anchors}</body></html>")
                     .encode("utf-8"))
    return pa.table({
        "page_id": ids,
        "src_site": src_site,
        "html": pa.array(htmls, pa.binary()),
    })


def _link_graph_sql(n: int = _LINKS_N, seed: int = _LINKS_SEED) -> str:
    from .sqlgen import add64, sm64

    h = sm64(add64("CAST(p.i AS UBIGINT)", str(seed)))
    t = sm64(add64("h", "CAST(j.j + 1 AS UBIGINT)"))
    return f"""
    WITH page AS (
        SELECT CAST(p.i AS BIGINT) AS page_id, {h} AS h FROM range({n}) p(i)
    ), edge AS (
        SELECT CAST(h % 1000 AS BIGINT) AS src_site,
               CAST({t} % 1000 AS BIGINT) AS dst_site
        FROM page, range(8) j(j)
        WHERE j.j < 1 + CAST(h % 8 AS BIGINT)
    )
    SELECT dst_site,
           COUNT(*) AS in_degree,
           CAST(COUNT(DISTINCT src_site) AS BIGINT) AS n_src_sites
    FROM edge GROUP BY dst_site
    """


class _LinkExtract:
    """Actor-pool stage: compiled-regex href extraction (findall per page —
    pc.extract_regex is first-match-only, so the multi-match scan runs on
    raw bytes with one compiled pattern per actor)."""

    def __init__(self):
        import re

        self._pat = re.compile(rb'href="https://site(\d+)\.example')

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        src = batch["src_site"].to_numpy(zero_copy_only=False)
        for i, html in enumerate(batch["html"].to_pylist()):
            for m in self._pat.findall(html):
                srcs.append(int(src[i]))
                dsts.append(int(m))
        return pa.table({"src_site": pa.array(srcs, pa.int64()),
                         "dst_site": pa.array(dsts, pa.int64())})


@session_memo
def _link_edges():
    """Materialized weighted edge list (src_site, dst_site, m) extracted
    from the real HTML once per Ray session — the whole link-graph family
    (degrees, PageRank, BFS) starts here, so the extraction actor pool and
    the (src, dst) collapse run once (same shared-intermediate design as
    the stream-network index memo)."""
    from ..config import actor_pool

    pages = ray.data.from_arrow(_synth_link_pages())
    raw = pages.map_batches(_LinkExtract, batch_size=512,
                            batch_format="pyarrow",
                            concurrency=actor_pool())
    raw = raw.map_batches(
        lambda t: t.append_column("m", pa.array(np.ones(len(t), np.int64))),
        batch_format="pyarrow")
    return partial_agg(raw, ["src_site", "dst_site"],
                       [("m", "sum", "m")]).materialize()


@query("link_graph_degrees", _link_graph_sql())
def link_graph_degrees(sf_dir: str):
    """Web-graph extraction (the Common-Crawl hyperlink-graph shape): real
    HTML anchors -> compiled-regex edge extraction in an actor pool ->
    distinct-source collapse (partial agg on (dst, src)) -> per-site
    in-degree. Both exchanges are on small int keys; the HTML never enters
    a shuffle. Oracle regenerates the edges in closed form — an extraction
    bug (missed/duplicated anchor) flips the hash."""
    pair = _link_edges().map_batches(
        lambda t: t.append_column("one", pa.array(np.ones(len(t), np.int64))),
        batch_format="pyarrow")
    return partial_agg(pair, ["dst_site"],
                       [("m", "sum", "in_degree"),
                        ("one", "sum", "n_src_sites")])


# --------------------------------------------------------------------------
# HyperLogLog register sketch (mergeable count-distinct sufficient stats)
# --------------------------------------------------------------------------

_HLL_P = 8  # 256 registers
_HLL_TAIL_BITS = 64 - _HLL_P
_HLL_TAIL_MASK = (1 << _HLL_TAIL_BITS) - 1


def _hll_sql() -> str:
    from .sqlgen import fnv_tokens_cte

    rho_case = ("CASE " + " ".join(
        f"WHEN tail >= {1 << k} THEN {_HLL_TAIL_BITS - k}"
        for k in range(_HLL_TAIL_BITS - 1, -1, -1))
        + f" ELSE {_HLL_TAIL_BITS + 1} END")
    return f"""
    WITH RECURSIVE {fnv_tokens_cte()}
    , reg AS (
      SELECT CAST(h >> {_HLL_TAIL_BITS} AS BIGINT) AS register,
             h & {_HLL_TAIL_MASK} AS tail
      FROM tok_fnv
    )
    SELECT register, CAST(MAX({rho_case}) AS BIGINT) AS max_rho
    FROM reg GROUP BY register
    """


def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Exact integer bit length (floor(log2)+1; 0 -> 0) — float log2 would
    misround near 2^53, so binary-search shifts instead."""
    x = x.astype(np.uint64).copy()
    b = np.zeros(len(x), np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = (x >> np.uint64(shift)) != 0
        b[m] += shift
        x[m] >>= np.uint64(shift)
    return b + (x != 0)


@query("hll_token_registers", _hll_sql())
def hll_token_registers(sf_dir: str):
    """HyperLogLog sufficient statistics for the corpus-wide distinct-token
    count: per 8-bit register, the max leading-zero rank of any token hash
    landing there. The sketch is MERGEABLE (elementwise max) and
    multiplicity-insensitive, so it needs NO dedup shuffle — every batch
    emits 256-bounded partials and one tiny max-aggregate merges them; at
    100 TB the total exchange is O(workers x 256) rows. Registers stay
    integers (the float harmonic-mean estimate is the consumer's last
    step), so the DuckDB oracle is exact."""
    from ..functions.dedup import hash_token

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for t in df["text"].to_list():
            toks.update(t.split())
        if not toks:
            return pd.DataFrame({"register": pd.Series(dtype=np.int64),
                                 "max_rho": pd.Series(dtype=np.int64)})
        h = np.fromiter((hash_token(t) for t in toks), np.uint64, len(toks))
        reg = (h >> np.uint64(_HLL_TAIL_BITS)).astype(np.int64)
        tail = h & np.uint64(_HLL_TAIL_MASK)
        rho = _HLL_TAIL_BITS + 1 - _bitlen_u64(tail)
        out = pd.DataFrame({"register": reg, "max_rho": rho})
        return out.groupby("register", as_index=False)["max_rho"].max()

    return partial_agg(ds.map_batches(partials, batch_format="pandas"),
                       ["register"], [("max_rho", "max", "max_rho")])


# --------------------------------------------------------------------------
# Embedding Gram matrix (PCA/whitening sufficient statistics)
# --------------------------------------------------------------------------

_EMB_DIM = 64
_EMB_Q = 1 << 20  # quantization scale: float32 * 2^20 is exact in double

_GRAM_SQL = f"""
SELECT CAST(i.i AS BIGINT) AS i, CAST(j.j AS BIGINT) AS j,
       CAST(SUM(
           CAST(FLOOR(embedding[CAST(i.i + 1 AS INT)] * {_EMB_Q}) AS BIGINT)
         * CAST(FLOOR(embedding[CAST(j.j + 1 AS INT)] * {_EMB_Q}) AS BIGINT)
       ) AS BIGINT) AS sum_q
FROM embeddings, range({_EMB_DIM}) i(i), range({_EMB_DIM}) j(j)
WHERE j.j >= i.i
GROUP BY i.i, j.j
"""


@query("embedding_gram_matrix", _GRAM_SQL)
def embedding_gram_matrix(sf_dir: str):
    """Second-moment (Gram) matrix of the embedding corpus — the mergeable
    sufficient statistic behind PCA / whitening / linear probes: each batch
    contributes one dim x dim integer matmul partial (Q^T Q over
    2^20-quantized values; floor, not round — numpy rounds half-even,
    DuckDB half-away), and the only exchange is dim^2-bounded rows,
    independent of corpus size. At 10^12 rows re-scale the quantization to
    keep sum_q inside int64 (bound: n * (Q * max|e|)^2)."""
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])
    iu, ju = np.triu_indices(_EMB_DIM)

    def gram_partial(t) -> pd.DataFrame:
        e = np.stack(t["embedding"].to_pylist()) if len(t) else \
            np.zeros((0, _EMB_DIM), np.float64)
        q = np.floor(e.astype(np.float64) * _EMB_Q).astype(np.int64)
        g = q.T @ q
        return pd.DataFrame({"i": iu.astype(np.int64),
                             "j": ju.astype(np.int64),
                             "sum_q": g[iu, ju]})

    return partial_agg(ds.map_batches(gram_partial, batch_format="pyarrow"),
                       ["i", "j"], [("sum_q", "sum", "sum_q")])


# --------------------------------------------------------------------------
# Fixed-point PageRank over the extracted link graph
# --------------------------------------------------------------------------

_PR_ITERS = 5
_PR_SCALE = 1_000_000           # initial mass per site
_PR_BASE = 150_000              # (1 - d) * SCALE with d = 0.85
_PR_SITES = 1000


def _pagerank_sql(iters: int = _PR_ITERS) -> str:
    """Unrolled-iteration oracle (standard SQL forbids aggregates in a
    recursive CTE member, so the five damping rounds are generated as five
    chained CTEs). Integer floor division matches the Ray side exactly."""
    h = sm64(add64("CAST(p.i AS UBIGINT)", str(_LINKS_SEED)))
    t = sm64(add64("h", "CAST(j.j + 1 AS UBIGINT)"))
    out = [f"""
    WITH page AS (
        SELECT CAST(p.i AS BIGINT) AS page_id, {h} AS h
        FROM range({_LINKS_N}) p(i)
    ), rawedge AS (
        SELECT CAST(h % {_PR_SITES} AS BIGINT) AS src_site,
               CAST({t} % {_PR_SITES} AS BIGINT) AS dst_site
        FROM page, range(8) j(j)
        WHERE j.j < 1 + CAST(h % 8 AS BIGINT)
    ), edge AS (
        SELECT src_site, dst_site, COUNT(*) AS m
        FROM rawedge GROUP BY src_site, dst_site
    ), outdeg AS (
        SELECT src_site, CAST(SUM(m) AS BIGINT) AS od
        FROM edge GROUP BY src_site
    ), nodes AS (
        SELECT CAST(n.n AS BIGINT) AS site FROM range({_PR_SITES}) n(n)
    ), pr0 AS (
        SELECT site, CAST({_PR_SCALE} AS BIGINT) AS mass FROM nodes
    )"""]
    for k in range(iters):
        out.append(f""", pr{k + 1} AS (
        SELECT n.site,
               CAST({_PR_BASE} + COALESCE(s.contrib, 0) AS BIGINT) AS mass
        FROM nodes n LEFT JOIN (
            SELECT e.dst_site AS site,
                   SUM((p.mass * 85 * e.m) // (100 * o.od)) AS contrib
            FROM edge e
            JOIN pr{k} p ON p.site = e.src_site
            JOIN outdeg o ON o.src_site = e.src_site
            GROUP BY e.dst_site) s ON s.site = n.site
    )""")
    out.append(f"\n    SELECT site, mass FROM pr{iters}")
    return "".join(out)


@query("link_pagerank_fixedpoint", _pagerank_sql())
def link_pagerank_fixedpoint(sf_dir: str):
    """PageRank (damping 0.85, 5 rounds) over the REAL extracted link graph
    in exact integer fixed point: contribution = (mass * 85 * m) //
    (100 * outdeg) — floors make every round bit-reproducible at any
    parallelism, so the oracle is exact SQL (unrolled CTE rounds).

    Distributed shape (the real web-graph pattern, nodes NEVER on the
    driver): mass lives in a node-keyed Dataset; each round is one join of
    the weighted edge list against the mass on src, one partial-agg sum by
    dst, and a union with the zero-contribution node base. Each round's
    node-sized result materializes (documented boundary: O(nodes) in the
    object store, like MULTINODE.md's other bounded materialize points) so
    round k+1 reads a computed table, not a 2^k-deep lineage."""
    edges = _link_edges()
    outdeg = partial_agg(edges, ["src_site"], [("m", "sum", "od")])
    edge_w = edges.join(outdeg, join_type="inner", num_partitions=8,
                        on=("src_site",)).materialize()

    nodes = ray.data.from_arrow(pa.table({
        "site": np.arange(_PR_SITES, dtype=np.int64),
        "contrib": np.zeros(_PR_SITES, np.int64)}))
    mass = ray.data.from_arrow(pa.table({
        "site": np.arange(_PR_SITES, dtype=np.int64),
        "mass": np.full(_PR_SITES, _PR_SCALE, np.int64)}))
    for _ in range(_PR_ITERS):
        joined = edge_w.join(mass.map_batches(
            lambda t: t.rename_columns(["src_site", "mass"]),
            batch_format="pyarrow"), join_type="inner", num_partitions=8,
            on=("src_site",))
        contrib = joined.map_batches(
            lambda t: pa.table({
                "site": t["dst_site"],
                "contrib": pa.array(
                    (t["mass"].to_numpy(zero_copy_only=False) * 85
                     * t["m"].to_numpy(zero_copy_only=False))
                    // (100 * t["od"].to_numpy(zero_copy_only=False)),
                    pa.int64())}),
            batch_format="pyarrow")
        summed = partial_agg(contrib.union(nodes), ["site"],
                             [("contrib", "sum", "contrib")])
        mass = summed.map_batches(
            lambda t: pa.table({
                "site": t["site"],
                "mass": pa.array(_PR_BASE
                                 + t["contrib"].to_numpy(zero_copy_only=False),
                                 pa.int64())}),
            batch_format="pyarrow").materialize()
    return mass


# --------------------------------------------------------------------------
# Exact substring duplication detection (Lee et al. dedup shape, L = 32)
# --------------------------------------------------------------------------

_SUB_L = 32

_SUBSTR_SQL = f"""
WITH g AS (
  SELECT doc_id, substr(text, s.i + 1, {_SUB_L}) AS gram
  FROM documents, range(4096) s(i)
  WHERE s.i <= length(text) - {_SUB_L}
), c AS (
  SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram
)
SELECT doc_id, COUNT(*) AS n_pos,
       CAST(SUM(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_pos,
       MAX(c.cnt) AS max_gram_count
FROM g JOIN c USING (gram)
GROUP BY doc_id
"""

_RH_B = np.uint64(0x100000001B3)          # odd -> invertible mod 2^64
_RH_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _rolling_grams(text: str, L: int = _SUB_L) -> np.ndarray:
    """All L-char rolling polynomial hashes of an ASCII text, vectorized:
    H[i] = B^(i+L) * (S[i+L] - S[i]) mod 2^64 where S is the Binv-weighted
    prefix sum — no per-position Python loop. Distinct grams collide with
    probability ~n^2/2^64 (same accepted caveat as doc_exact_dedup; the SQL
    oracle groups raw grams)."""
    b = np.frombuffer(text.encode("utf-8"), np.uint8).astype(np.uint64)
    n = len(b)
    if n < L:
        return np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        binv_pow = np.concatenate(
            [[np.uint64(1)],
             np.cumprod(np.full(n, _RH_BINV, np.uint64))])
        b_pow = np.concatenate(
            [[np.uint64(1)], np.cumprod(np.full(n, _RH_B, np.uint64))])
        s = np.concatenate([[np.uint64(0)],
                            np.cumsum(b * binv_pow[1:n + 1])])
        return b_pow[L:n + 1] * (s[L:n + 1] - s[:n - L + 1])


@query("substring_dup_positions", _SUBSTR_SQL)
def substring_dup_positions(sf_dir: str):
    """Exact substring duplication (the published suffix-array dedup
    method's detection pass, expressed as rolling-hash shingles): a doc
    position is duplicated when its 32-gram occurs >= 2 times anywhere in
    the corpus. One explode -> count-per-gram partial aggregate -> hash
    join back -> per-doc rollup; the exchange carries 64-bit hashes, never
    the grams."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for did, text in zip(df["doc_id"].to_numpy(np.int64),
                             df["text"].to_list()):
            h = _rolling_grams(text)
            if len(h):
                ids.append(np.full(len(h), did, np.int64))
                hs.append(h.view(np.int64))
        if not ids:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "gh": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"doc_id": np.concatenate(ids),
                             "gh": np.concatenate(hs)})

    grams = ds.map_batches(explode, batch_format="pandas")
    counts = partial_agg(
        grams.map_batches(lambda df: df.assign(cnt=np.ones(len(df), np.int64)),
                          batch_format="pandas"),
        ["gh"], [("cnt", "sum", "cnt")])
    joined = grams.join(counts, join_type="inner", num_partitions=16,
                        on=("gh",))

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df["cnt"].to_numpy(np.int64)
        g = df.assign(dup=(cnt >= 2).astype(np.int64)) \
            .groupby("doc_id", as_index=False) \
            .agg(n_pos=("gh", "size"), n_dup_pos=("dup", "sum"),
                 max_gram_count=("cnt", "max"))
        return g.astype({"doc_id": np.int64, "n_pos": np.int64,
                         "n_dup_pos": np.int64, "max_gram_count": np.int64})

    return keyed_map_groups(joined, "doc_id", per_doc, per_group=False)


# --------------------------------------------------------------------------
# BFS hop distance over the link graph (frontier iteration)
# --------------------------------------------------------------------------

_BFS_ROUNDS = 4
_BFS_SEEDS = (0, 1, 2, 3, 4)  # seed sites (crawl entry points)


def _bfs_sql(rounds: int = _BFS_ROUNDS) -> str:
    """Unrolled frontier rounds: dist{k+1} = min(dist{k}, 1 + min over
    in-edges from sites at distance exactly k)."""
    h = sm64(add64("CAST(p.i AS UBIGINT)", str(_LINKS_SEED)))
    t = sm64(add64("h", "CAST(j.j + 1 AS UBIGINT)"))
    seeds = ", ".join(str(s) for s in _BFS_SEEDS)
    out = [f"""
    WITH page AS (
        SELECT CAST(p.i AS BIGINT) AS page_id, {h} AS h
        FROM range({_LINKS_N}) p(i)
    ), edge AS (
        SELECT DISTINCT CAST(h % {_PR_SITES} AS BIGINT) AS src_site,
               CAST({t} % {_PR_SITES} AS BIGINT) AS dst_site
        FROM page, range(8) j(j)
        WHERE j.j < 1 + CAST(h % 8 AS BIGINT)
    ), dist0 AS (
        SELECT CAST(n.n AS BIGINT) AS site,
               CASE WHEN n.n IN ({seeds}) THEN 0 ELSE {_PR_SITES} END AS dist
        FROM range({_PR_SITES}) n(n)
    )"""]
    for k in range(rounds):
        out.append(f""", dist{k + 1} AS (
        SELECT d.site,
               LEAST(d.dist,
                     COALESCE((SELECT MIN(s.dist) + 1
                               FROM edge e JOIN dist{k} s
                                 ON s.site = e.src_site
                               WHERE e.dst_site = d.site
                                 AND s.dist = {k}), {_PR_SITES})) AS dist
        FROM dist{k} d
    )""")
    out.append(f"""
    SELECT site, CAST(dist AS BIGINT) AS dist FROM dist{rounds}
    WHERE dist < {_PR_SITES}""")
    return "".join(out)


@query("link_bfs_distance", _bfs_sql())
def link_bfs_distance(sf_dir: str):
    """BFS hop distance from 5 seed sites over the DISTINCT extracted link
    graph, as FRONTIER iteration: each round joins only the sites reached
    in the previous round (the active frontier, typically a tiny fraction
    of all nodes) against the edge list, then folds newly reached sites
    into the distance table with a min-aggregate — the standard
    delta-iteration optimization for distributed BFS (the full distance
    table never re-joins the edges). Emits sites reached within 4 hops."""
    edges = _link_edges().drop_columns(["m"])

    seeds = np.asarray(_BFS_SEEDS, np.int64)
    dist = ray.data.from_arrow(pa.table({
        "site": seeds, "dist": np.zeros(len(seeds), np.int64)})).materialize()
    frontier = dist
    for k in range(_BFS_ROUNDS):
        hop = edges.join(
            frontier.map_batches(
                lambda t: t.rename_columns(["src_site", "dist"]),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=8, on=("src_site",))
        reached = hop.map_batches(
            lambda t: pa.table({
                "site": t["dst_site"],
                "dist": pa.array(
                    t["dist"].to_numpy(zero_copy_only=False) + 1, pa.int64())}),
            batch_format="pyarrow")
        # fold: min distance wins. Distances are monotone (round j only
        # ever assigns j+1), so folded dist == k+1 already means "reached
        # for the first time this round" — the frontier needs no anti-join
        # against the seen set.
        merged = partial_agg(dist.union(reached), ["site"],
                             [("dist", "min", "dist")]).materialize()
        frontier = merged.map_batches(
            lambda t, kk=k: t.filter(pa.compute.equal(t["dist"], kk + 1)),
            batch_format="pyarrow").materialize()
        dist = merged
        if frontier.count() == 0:
            break
    return dist


# --------------------------------------------------------------------------
# Tumbling-window heavy hitters (daily top-k users)
# --------------------------------------------------------------------------

_TOPK_K = 3

_TOPK_SQL = f"""
WITH c AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
         user_id, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT day_idx, user_id, n, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY day_idx
                                    ORDER BY n DESC, user_id ASC)
                 AS BIGINT) AS rnk
  FROM c)
WHERE rnk <= {_TOPK_K}
"""


@query("daily_topk_users", _TOPK_SQL)
def daily_topk_users(sf_dir: str):
    """Tumbling-window heavy hitters: count per (day, user) with map-side
    combine, then per-day top-3 with deterministic ties (count DESC,
    user_id ASC) in a bucketed map_groups. The per-window state is k rows —
    the streaming-analytics shape where only (windows x k) rows survive
    the second exchange."""
    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        return pd.DataFrame({
            "day_idx": ts // 86_400_000_000,
            "user_id": df["user_id"].to_numpy(np.int64),
            "n": np.ones(len(df), np.int64)})

    counts = partial_agg(ds.map_batches(enc, batch_format="pandas"),
                         ["day_idx", "user_id"], [("n", "sum", "n")])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["day_idx", "n", "user_id"],
                          ascending=[True, False, True])
        g = g.assign(rnk=g.groupby("day_idx", sort=False).cumcount() + 1)
        out = g[g["rnk"] <= _TOPK_K]
        return out.astype({"day_idx": np.int64, "user_id": np.int64,
                           "n": np.int64, "rnk": np.int64})

    return keyed_map_groups(counts, "day_idx", topk, per_group=False)


# --------------------------------------------------------------------------
# Connected components over the (undirected) link graph — label propagation
# --------------------------------------------------------------------------

_CC_ROUNDS = 6


def _cc_sql(rounds: int = _CC_ROUNDS) -> str:
    """Unrolled min-label propagation over the symmetrized edge set; after
    convergence extra rounds are no-ops, so the fixed round count is an
    exact contract whether or not the graph converged earlier."""
    h = sm64(add64("CAST(p.i AS UBIGINT)", str(_LINKS_SEED)))
    t = sm64(add64("h", "CAST(j.j + 1 AS UBIGINT)"))
    out = [f"""
    WITH page AS (
        SELECT CAST(p.i AS BIGINT) AS page_id, {h} AS h
        FROM range({_LINKS_N}) p(i)
    ), de AS (
        SELECT DISTINCT CAST(h % {_PR_SITES} AS BIGINT) AS a,
               CAST({t} % {_PR_SITES} AS BIGINT) AS b
        FROM page, range(8) j(j)
        WHERE j.j < 1 + CAST(h % 8 AS BIGINT)
    ), edge AS (
        SELECT a, b FROM de UNION SELECT b, a FROM de
    ), lab0 AS (
        SELECT CAST(n.n AS BIGINT) AS site, CAST(n.n AS BIGINT) AS label
        FROM range({_PR_SITES}) n(n)
    )"""]
    for k in range(rounds):
        out.append(f""", lab{k + 1} AS (
        SELECT l.site,
               LEAST(l.label,
                     COALESCE((SELECT MIN(s.label)
                               FROM edge e JOIN lab{k} s ON s.site = e.a
                               WHERE e.b = l.site), l.label)) AS label
        FROM lab{k} l
    )""")
    out.append(f"\n    SELECT site, label FROM lab{rounds}")
    return "".join(out)


@query("link_connected_components", _cc_sql())
def link_connected_components(sf_dir: str):
    """Distributed connected components (min-label propagation) over the
    symmetrized link graph: each round joins current labels against the
    edge list, folds with a min-aggregate, and materializes the node-sized
    label table; exits early when the label-sum fixed point is reached
    (extra rounds are no-ops, so the early exit matches the oracle's fixed
    round count exactly). The distributed counterpart of the dedup
    family's driver-side union-find — this one never collects the graph."""
    edges = _link_edges().drop_columns(["m"])
    sym = edges.union(edges.map_batches(
        lambda t: pa.table({"src_site": t["dst_site"],
                            "dst_site": t["src_site"]}),
        batch_format="pyarrow"))
    sym = partial_agg(sym.map_batches(
        lambda t: t.append_column("one", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow"), ["src_site", "dst_site"],
        [("one", "min", "one")]).drop_columns(["one"]).materialize()

    labels = ray.data.from_arrow(pa.table({
        "site": np.arange(_PR_SITES, dtype=np.int64),
        "label": np.arange(_PR_SITES, dtype=np.int64)})).materialize()
    prev_sum = None
    for _ in range(_CC_ROUNDS):
        prop = sym.join(labels.map_batches(
            lambda t: t.rename_columns(["src_site", "label"]),
            batch_format="pyarrow"), join_type="inner", num_partitions=8,
            on=("src_site",))
        cand = prop.map_batches(
            lambda t: pa.table({"site": t["dst_site"], "label": t["label"]}),
            batch_format="pyarrow")
        labels = partial_agg(labels.union(cand), ["site"],
                             [("label", "min", "label")]).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    return labels


# --------------------------------------------------------------------------
# WARC container round-trip (Common Crawl's native shard format)
# --------------------------------------------------------------------------

_WARC_N = 2000
# html template constants per edge-case class e = h % 100 (validated
# against gen_pages output character-for-character; body absent for e = 0)
_WARC_CONST = {0: 55, 1: 71, 2: 93, 3: 84}
_WARC_CONST_ELSE = 62


def _warc_sql(n: int = _WARC_N) -> str:
    """Regenerate (page_id, url, content_len) of the synthetic pages in
    closed form: url from the page hash, content length from the html
    template class + title digits + the VOCAB word-length sum of the
    splitmix64 body (VOCAB lengths inlined as a 256-row VALUES CTE)."""
    from ..sources.synthetic import VOCAB

    seed_mix = (42 * 0x9E3779B97F4A7C15) % (1 << 64)
    h = sm64(add64("CAST(p.i AS UBIGINT)", str(seed_mix)))
    wh = sm64(add64("CAST(k.k AS UBIGINT)", "h"))
    wlen_rows = ", ".join(f"({i}, {len(w)})" for i, w in enumerate(VOCAB))
    const_case = ("CASE CAST(h % 100 AS BIGINT) "
                  + " ".join(f"WHEN {e} THEN {c}"
                             for e, c in _WARC_CONST.items())
                  + f" ELSE {_WARC_CONST_ELSE} END")
    return f"""
    WITH page AS MATERIALIZED (
        SELECT CAST(p.i AS BIGINT) AS page_id, {h} AS h,
               20 + CAST({h} % 180 AS BIGINT) AS nw
        FROM range({n}) p(i)
    ), wlen(i, wl) AS (VALUES {wlen_rows}),
    widx AS MATERIALIZED (
        SELECT page_id, nw, CAST({wh} % 256 AS BIGINT) AS wi
        FROM page, range(200) k(k)
        WHERE k.k < nw
    ),
    body AS (
        SELECT page_id,
               CAST(SUM(w.wl) + nw - 1 AS BIGINT) AS body_len
        FROM widx JOIN wlen w ON w.i = widx.wi
        GROUP BY page_id, nw
    )
    SELECT p.page_id,
           'https://site' || CAST(CAST(h % 10000 AS BIGINT) AS VARCHAR)
             || '.example/' || CAST(p.page_id AS VARCHAR) AS url,
           CAST({const_case}
                + length(CAST(p.page_id AS VARCHAR))
                + CASE WHEN CAST(h % 100 AS BIGINT) = 0 THEN 0
                       ELSE b.body_len END AS BIGINT) AS content_len
    FROM page p JOIN body b ON b.page_id = p.page_id
    """


@query("warc_roundtrip_stats", _warc_sql())
def warc_roundtrip_stats(sf_dir: str):
    """WARC container boundary (sources/warc.py): shard the synthetic pages
    into per-record-gzip .warc.gz files from inside map_batches (one shard
    per block, deterministic record IDs), read them back with one task per
    shard (the Common-Crawl parallelism unit), and report per-page url +
    content length. The oracle regenerates both in closed form, so a
    corruption anywhere in the WARC write, the gzip member framing, or the
    header parse flips the hash."""
    import os
    import tempfile

    from ..sources.synthetic import pages_dataset
    from ..sources.warc import read_warc_ds, write_warc

    d = tempfile.mkdtemp(prefix="warc_rt_", dir="/tmp")
    pages = pages_dataset(_WARC_N, blocks=8)

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        recs = [(int(r.page_id), r.url, r.warc_ts.isoformat() + "Z",
                 r.html) for r in df.itertuples()]
        lo = int(df["page_id"].min())
        path = os.path.join(d, f"shard-{lo:08d}.warc.gz")
        write_warc(path, recs, gzip_members=True)
        return pd.DataFrame({"path": [path]})

    paths = pages.map_batches(shard, batch_format="pandas").to_pandas()
    ds = read_warc_ds(paths["path"].to_list(),
                      columns=["page_id", "url", "content_len"])
    return ds


# --------------------------------------------------------------------------
# JSONL interchange round-trip with escaping-adversarial strings
# --------------------------------------------------------------------------

_JSONL_N = 3000
_JSONL_PATTERNS = ['plain text ', 'quo"te"d ', 'back\\slash ', 'new\nline ',
                   'tab\tchar ', 'uni é中 ', 'emoji \U0001F680 ',
                   "apo'strophe "]

_JSONL_SQL = f"""
SELECT CAST(t.i AS BIGINT) AS row_id,
       CASE CAST(t.i % 8 AS BIGINT)
            WHEN 0 THEN 'plain text '
            WHEN 1 THEN 'quo"te"d '
            WHEN 2 THEN 'back\\slash '
            WHEN 3 THEN 'new' || chr(10) || 'line '
            WHEN 4 THEN 'tab' || chr(9) || 'char '
            WHEN 5 THEN 'uni é中 '
            WHEN 6 THEN 'emoji \U0001F680 '
            ELSE 'apo''strophe '
       END || CAST(t.i AS VARCHAR) AS text,
       length(CASE CAST(t.i % 8 AS BIGINT)
            WHEN 0 THEN 'plain text '
            WHEN 1 THEN 'quo"te"d '
            WHEN 2 THEN 'back\\slash '
            WHEN 3 THEN 'new' || chr(10) || 'line '
            WHEN 4 THEN 'tab' || chr(9) || 'char '
            WHEN 5 THEN 'uni é中 '
            WHEN 6 THEN 'emoji \U0001F680 '
            ELSE 'apo''strophe '
       END || CAST(t.i AS VARCHAR)) AS n_chars
FROM range({_JSONL_N}) t(i)
"""


@query("jsonl_adversarial_roundtrip", _JSONL_SQL)
def jsonl_adversarial_roundtrip(sf_dir: str):
    """JSONL interchange boundary (sources/formats.py): rows whose strings
    hit every JSON escaping class (quotes, backslashes, newlines, tabs,
    non-ASCII, astral-plane emoji, apostrophes) are sharded to JSONL from
    inside map_batches, read back one task per shard, and byte-compared —
    the oracle regenerates the strings as SQL literals, so any
    escape/encode defect in the writer or parser flips the hash."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="jsonl_rt_", dir="/tmp")
    ids = np.arange(_JSONL_N, dtype=np.int64)
    src = pd.DataFrame({
        "row_id": ids,
        "text": [_JSONL_PATTERNS[i % 8] + str(i) for i in ids]})
    ds = ray.data.from_pandas(src).repartition(8)

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        from ..sources.formats import write_jsonl

        lo = int(df["row_id"].min())
        path = os.path.join(d, f"shard-{lo:08d}.jsonl")
        write_jsonl(path, df)
        return pd.DataFrame({"path": [path]})

    paths = ds.map_batches(shard, batch_format="pandas").to_pandas()
    from ..sources.formats import read_jsonl_ds

    back = read_jsonl_ds(paths["path"].to_list())

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "row_id": df["row_id"].to_numpy(np.int64),
            "text": df["text"].to_numpy(object),
            "n_chars": df["text"].str.len().to_numpy(np.int64)})

    return back.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# Per-source boilerplate template detection (word-3-gram site templates)
# --------------------------------------------------------------------------

def _template_sql() -> str:
    from .sqlgen import tok_rows_cte

    return f"""
    WITH {tok_rows_cte()},
    g AS (
      SELECT t1.doc_id, d.source,
             t1.tok || ' ' || t2.tok || ' ' || t3.tok AS gram
      FROM tok_rows t1
      JOIN tok_rows t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
      JOIN tok_rows t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
      JOIN documents d ON d.doc_id = t1.doc_id
    ),
    gd AS (SELECT DISTINCT source, gram, doc_id FROM g),
    sd AS (SELECT source, COUNT(*) AS n_src_docs FROM documents
           GROUP BY source),
    cnt AS (SELECT source, gram, COUNT(*) AS n_docs FROM gd
            GROUP BY source, gram)
    SELECT c.source, c.gram, c.n_docs, s.n_src_docs
    FROM cnt c JOIN sd s USING (source)
    WHERE c.n_docs >= 2
    """


@query("source_template_grams", _template_sql())
def source_template_grams(sf_dir: str):
    """Boilerplate/template detection (the site-template-removal pass of a
    web-corpus pipeline): word-3-grams repeated across a
    source's documents (threshold n_docs >= 2 — sized to the synthetic
    corpus's planted-duplicate density; production corpora use a
    fraction-of-source cutoff on the same plan) are template candidates. The
    per-doc DISTINCT collapse happens map-side (a set per document), the
    count exchange is keyed on (source, gram), and the per-source doc
    totals — 20 rows — broadcast for the final threshold filter instead
    of joining."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    totals = partial_agg(ds.map_batches(
        lambda df: pd.DataFrame({
            "source": df["source"].to_numpy(object),
            "n": np.ones(len(df), np.int64)}), batch_format="pandas"),
        ["source"], [("n", "sum", "n_src_docs")]).to_pandas()
    totals_ref = ray.put(dict(zip(totals["source"], totals["n_src_docs"])))

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        srcs, grams = [], []
        for src, text in zip(df["source"].to_list(), df["text"].to_list()):
            t = text.split()
            uniq = {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
            srcs.extend([src] * len(uniq))
            grams.extend(uniq)
        return pd.DataFrame({"source": np.asarray(srcs, object),
                             "gram": np.asarray(grams, object),
                             "n_docs": np.ones(len(srcs), np.int64)})

    counts = partial_agg(ds.map_batches(explode, batch_format="pandas"),
                         ["source", "gram"], [("n_docs", "sum", "n_docs")])

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        tot = ray.get(totals_ref)
        n_src = df["source"].map(tot).to_numpy(np.int64)
        n = df["n_docs"].to_numpy(np.int64)
        keep = n >= 2
        out = df[keep].copy()
        out["n_src_docs"] = n_src[keep]
        return out[["source", "gram", "n_docs", "n_src_docs"]]

    return counts.map_batches(threshold, batch_format="pandas")


# --------------------------------------------------------------------------
# CUBE rollup derived from the finest aggregate (no corpus re-scan)
# --------------------------------------------------------------------------

_CUBE_SQL = """
SELECT COALESCE(lang, '*') AS lang, COALESCE(source, '*') AS source,
       COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY CUBE (lang, source)
"""


@query("lang_source_cube", _CUBE_SQL)
def lang_source_cube(sf_dir: str):
    """GROUP BY CUBE (lang, source) computed the distributed way: ONE scan
    builds the finest (lang, source) aggregate; the three coarser grouping
    sets re-aggregate that tiny table (|langs| x |sources| rows), never
    the corpus. '*' marks the rolled-up dimension. COUNT re-aggregates as
    SUM at coarser levels — the standard algebraic-rollup rule."""
    ds = read_table(sf_dir, "documents",
                    columns=["lang", "source", "n_chars"])
    fine = partial_agg(ds.map_batches(
        lambda df: pd.DataFrame({
            "lang": df["lang"].to_numpy(object),
            "source": df["source"].to_numpy(object),
            "n": np.ones(len(df), np.int64),
            "sum_chars": df["n_chars"].to_numpy(np.int64)}),
        batch_format="pandas"),
        ["lang", "source"], [("n", "sum", "n"),
                             ("sum_chars", "sum", "sum_chars")])

    def levels(df: pd.DataFrame) -> pd.DataFrame:
        outs = [df]
        for dims in (("lang",), ("source",), ()):
            g = df.copy()
            for d in ("lang", "source"):
                if d not in dims:
                    g[d] = "*"
            outs.append(g.groupby(["lang", "source"], as_index=False)
                        [["n", "sum_chars"]].sum())
        return pd.concat(outs, ignore_index=True)

    # the finest aggregate is keys-bounded: one block, derive levels there
    return fine.repartition(1).map_batches(levels, batch_format="pandas",
                                           batch_size=None)


# --------------------------------------------------------------------------
# Partitioned sliding-window sum (window-function family)
# --------------------------------------------------------------------------

_MOVSUM_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS mov_sum_cents
FROM events
"""


@query("events_moving_sum3", _MOVSUM_SQL)
def events_moving_sum3(sf_dir: str):
    """Per-user sliding-window sum over the 3 most recent events (ROWS
    2 PRECEDING, deterministic (ts, event_id) order, integer cents) — the
    window-function shape: one bucketed exchange on the partition key,
    then a vectorized cumsum-difference per key; no global sort."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts_us": df["ts"].to_numpy("datetime64[us]").astype(np.int64),
            "cents": np.round(df["value"].to_numpy(np.float64) * 100)
            .astype(np.int64)})

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        c = g["cents"].to_numpy(np.int64)
        cs = np.concatenate([[0], np.cumsum(c)])
        # the window start clamps at each USER's first row (several users
        # share a bucket), via the row's within-user ordinal
        ord_in_user = g.groupby("user_id", sort=False).cumcount().to_numpy()
        start = np.arange(len(c)) - np.minimum(ord_in_user, 2)
        w = cs[np.arange(1, len(c) + 1)] - cs[start]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "mov_sum_cents": w})

    enc_ds = ds.map_batches(enc, batch_format="pandas")
    return keyed_map_groups(enc_ds, "user_id", window, per_group=False)

# --------------------------------------------------------------------------
# Cross-language vocabulary overlap matrix
# --------------------------------------------------------------------------

_VOCAB_SQL = """
WITH lt AS (
  SELECT DISTINCT lang, unnest(regexp_split_to_array(text, '\\s+')) AS tok
  FROM documents
), lt2 AS (SELECT lang, tok FROM lt WHERE tok <> '')
SELECT a.lang AS lang_a, b.lang AS lang_b,
       COUNT(*) AS n_shared
FROM lt2 a JOIN lt2 b ON a.tok = b.tok AND a.lang < b.lang
GROUP BY a.lang, b.lang
"""


@query("lang_vocab_overlap", _VOCAB_SQL)
def lang_vocab_overlap(sf_dir: str):
    """Cross-language vocabulary overlap (corpus-comparison shape): the
    distinct (lang, token) collapse happens map-side; per token the lang
    SET is tiny (<= |langs|), so the pair fan-out per token is bounded and
    the final exchange carries |langs|^2 keys. At 10^12 docs the token-
    keyed exchange carries each distinct token once per lang — vocabulary-
    not corpus-sized."""
    ds = read_table(sf_dir, "documents", columns=["lang", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        langs, toks = [], []
        for lang, text in zip(df["lang"].to_list(), df["text"].to_list()):
            u = set(text.split())
            langs.extend([lang] * len(u))
            toks.extend(u)
        out = pd.DataFrame({"lang": np.asarray(langs, object),
                            "tok": np.asarray(toks, object)})
        out["z"] = np.zeros(len(out), np.int8)
        return out

    lt = partial_agg(ds.map_batches(explode, batch_format="pandas"),
                     ["lang", "tok"], [("z", "min", "z")]).drop_columns(["z"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b = [], []
        for _, sub in g.groupby("tok", sort=False):
            ls = sorted(sub["lang"].to_list())
            for i in range(len(ls)):
                for j in range(i + 1, len(ls)):
                    rows_a.append(ls[i])
                    rows_b.append(ls[j])
        return pd.DataFrame({"lang_a": np.asarray(rows_a, object),
                             "lang_b": np.asarray(rows_b, object),
                             "n_shared": np.ones(len(rows_a), np.int64)})

    # bucket by token hash so each token's lang set co-locates
    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import fingerprint64

        df = df.copy()
        df["th"] = fingerprint64(df["tok"]).astype(np.int64)
        return df

    hashed = lt.map_batches(add_h, batch_format="pandas")
    pair_rows = keyed_map_groups(hashed, "th", pairs, per_group=False)
    return partial_agg(pair_rows, ["lang_a", "lang_b"],
                       [("n_shared", "sum", "n_shared")])
