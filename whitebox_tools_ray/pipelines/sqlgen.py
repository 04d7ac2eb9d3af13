"""DuckDB SQL expression generators for the deterministic synthetic kernels.

These emit SQL strings that reproduce, bit-for-bit, the numpy uint64 mixing
used by sources/synthetic.py (splitmix64) and functions/text.py (FNV-1a) —
so rows-only operators whose inputs are synthesized from splitmix64 can carry
REAL DuckDB oracles: the SQL recomputes the same inputs and the same logic
independently of the Ray code path.

DuckDB has no wrapping 64-bit arithmetic (UBIGINT overflow raises), so all
multiplications/additions go through HUGEINT with an explicit ``% 2^64``;
bitwise xor/shift stay in UBIGINT.
"""

from __future__ import annotations

M64 = "18446744073709551616"  # 2^64


def u64(expr: str) -> str:
    return f"CAST({expr} AS UBIGINT)"


def add64(a: str, b: str) -> str:
    """(a + b) mod 2^64 as UBIGINT."""
    return u64(f"(CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % {M64}")


def mul64(a: str, b: str) -> str:
    """(a * b) mod 2^64 as UBIGINT. Two 64-bit operands can overflow signed
    INT128, so split ``a`` into 32-bit halves:
    a*b mod 2^64 = (((a>>32)*b mod 2^32) << 32) + (a&0xffffffff)*b, mod 2^64 —
    every intermediate stays below 2^97."""
    ah = f"CAST(({u64(a)} >> 32) AS HUGEINT)"
    al = f"CAST(({u64(a)} & 4294967295) AS HUGEINT)"
    bh = f"CAST({b} AS HUGEINT)"
    return u64(f"((({ah} * {bh}) % 4294967296) * 4294967296 + {al} * {bh}) % {M64}")


def xor64(a: str, b: str) -> str:
    return f"xor({u64(a)}, {u64(b)})"


def shr(a: str, n: int) -> str:
    return f"({u64(a)} >> {n})"


def sm64(expr: str) -> str:
    """splitmix64(expr) — mirrors sources/synthetic.py:30-39 exactly."""
    x = add64(expr, "11400714819323198485")  # 0x9E3779B97F4A7C15
    z = mul64(xor64(x, shr(x, 30)), "13787848793156543929")  # 0xBF58476D1CE4E5B9
    z = mul64(xor64(z, shr(z, 27)), "10723151780598845931")  # 0x94D049BB133111EB
    return xor64(z, shr(z, 31))


def synth_segments_cte(n: int, seed: int = 42) -> str:
    """CTE ``seg(seg_id, x0, y0, x1, y1)`` recomputing stages/lines.py
    synth_segments bit-for-bit (same splitmix64 mixing, same float ops in the
    same order)."""
    h = sm64(add64("CAST(i AS UBIGINT)", str(seed * 0x9E3779B9)))

    def unit(off: int) -> str:
        return (f"(CAST({sm64(add64('h', str(off)))} % 1073741824 AS DOUBLE)"
                f" / 1073741824.0)")

    # MATERIALIZED: DuckDB 1.0 hits an internal flat-vector assertion when
    # these deep bit-mixing expressions are inlined into downstream joins
    return f"""
    seg_h AS MATERIALIZED (SELECT i, {h} AS h FROM range({n}) t(i)),
    seg_u AS MATERIALIZED (SELECT i, {unit(1)} AS u1, {unit(2)} AS u2,
                     {unit(3)} AS u3, {unit(4)} AS u4 FROM seg_h),
    seg AS MATERIALIZED (SELECT CAST(i AS BIGINT) AS seg_id,
                   u1 * 360.0 - 180.0 AS x0,
                   u2 * 170.0 - 85.0 AS y0,
                   u1 * 360.0 - 180.0 + (u3 - 0.5) * 6.0 AS x1,
                   u2 * 170.0 - 85.0 + (u4 - 0.5) * 6.0 AS y1
            FROM seg_u)
    """


def tok_rows_cte(source_cte: str = "documents") -> str:
    """CTE ``tok_rows(doc_id, pos, tok)``: every whitespace token of
    ``documents.text`` with its 1-based position — any-whitespace split with
    empty-token filtering + renumbering, matching Python str.split() exactly
    (string_split(text, ' ') would keep empty tokens on consecutive spaces
    and miss tabs/newlines — round-2 ADVICE)."""
    return rf"""
    tok_rows AS MATERIALIZED (
      SELECT doc_id,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY r.i) AS BIGINT) AS pos,
             ts[CAST(r.i AS INT)] AS tok
      FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts FROM {source_cte}),
           UNNEST(range(1, len(ts) + 1)) r(i)
      WHERE ts[CAST(r.i AS INT)] <> ''
    )
    """


def fnv_tokens_cte(source_cte: str = "documents") -> str:
    """CTEs computing FNV-1a 64-bit hashes of every whitespace token of
    ``documents.text`` — bit-exact vs functions/dedup.hash_token (ASCII
    corpus: ord(char) == utf-8 byte).

    Emits: tok_rows(doc_id, pos, tok) with multiplicity, and
    tok_fnv(tok, h UBIGINT) for distinct tokens.
    """
    step_h = mul64(xor64("h", "CAST(ord(substr(t.tok, f.i + 1, 1)) AS UBIGINT)"),
                   "1099511628211")
    return rf"""
    {tok_rows_cte(source_cte)},
    toks AS (SELECT DISTINCT tok FROM tok_rows),
    fnv_iter(tok, i, h) AS (
      SELECT tok, 0, CAST(14695981039346656037 AS UBIGINT) FROM toks
      UNION ALL
      SELECT f.tok, f.i + 1, {step_h.replace('t.tok', 'f.tok')}
      FROM fnv_iter f WHERE f.i < length(f.tok)
    ),
    tok_fnv AS MATERIALIZED (
      SELECT tok, h FROM fnv_iter WHERE i = length(tok)
    )
    """
