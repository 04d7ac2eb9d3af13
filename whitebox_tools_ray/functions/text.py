"""Text-analysis kernels for the documents table (training-data pipeline ops).

All kernels are deterministic and vectorized (numpy / pandas string methods /
compiled regex); stateful pieces (compiled patterns, language profiles) are
built once per actor in the stage classes that use them.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

STOPWORDS = ("the", "a")

_WS = re.compile(r"\s+")


def token_counts(texts: pd.Series) -> np.ndarray:
    """Whitespace token count; single-space-joined corpus => count(' ')+1.

    Matches the SQL oracle length(text)-length(replace(text,' ',''))+1 for
    non-empty single-spaced text; empty strings count 0 tokens.
    """
    n = texts.str.count(" ").to_numpy() + 1
    return np.where(texts.str.len().to_numpy() == 0, 0, n).astype(np.int64)


def stopword_counts(texts: pd.Series, stopwords=STOPWORDS) -> np.ndarray:
    """Count of whole-word stopword occurrences (vectorized regex)."""
    pat = r"\b(?:" + "|".join(re.escape(w) for w in stopwords) + r")\b"
    return texts.str.count(pat).to_numpy().astype(np.int64)


# ---- rolling-hash document fingerprint (Rabin-Karp style) ----

_FP_BASE = np.uint64(1099511628211)


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """Order-sensitive 64-bit polynomial rolling hash over utf-8 bytes:
    h = sum(byte[i] * B^i) mod 2^64 — a deterministic document fingerprint
    (content-defined identity for exact dedup at scale). The inner product is
    numpy-vectorized per document against a precomputed power table."""
    arr = texts.to_numpy()
    max_len = max((len(t.encode("utf-8")) for t in arr), default=0)
    with np.errstate(over="ignore"):
        powers = np.concatenate([[np.uint64(1)], np.cumprod(np.full(max_len, _FP_BASE, np.uint64))])
    out = np.empty(len(arr), np.uint64)
    for i, t in enumerate(arr):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            out[i] = np.sum(b * powers[: len(b)], dtype=np.uint64)
    return out


# ---- n-gram language ID (profile heuristic) ----

class NgramLanguageId:
    """Character-trigram profile scorer. Profiles are tiny built-in priors for
    a handful of languages; deterministic scoring -> argmax (ties by language
    code order). Built once per actor (stateful-stage pattern)."""

    PROFILES = {
        "en": ("the", " th", "he ", "ing", "and", " an", "nd ", " of", "of ", "ion"),
        "de": ("en ", "er ", "ch ", "der", " de", "ie ", "ein", "sch", "die", "und"),
        "fr": ("es ", " de", "de ", "le ", " le", "ent", "ne ", "la ", " la", "tio"),
        "es": (" de", "de ", "os ", "la ", " la", "el ", " el", "ión", "ci", "ent"),
        "zh": ("的", "了", "是", "在", "我", "有", "他", "这", "中", "大"),
    }

    def __init__(self):
        self.langs = sorted(self.PROFILES)
        self.tables = {lang: {g: len(p) - i for i, g in enumerate(p)}
                       for lang, p in self.PROFILES.items()}

    def classify(self, texts: pd.Series) -> np.ndarray:
        out = np.empty(len(texts), object)
        for i, t in enumerate(texts.to_numpy()):
            best_lang, best = self.langs[0], -1
            for lang in self.langs:
                # weighted count of profile grams present in the text
                score = sum(w * t.count(g) for g, w in self.tables[lang].items())
                if score > best:
                    best, best_lang = score, lang
            out[i] = best_lang
        return out


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Heuristic quality-scoring features: length, token count, mean token
    length, stopword count (the length/punct/stopword-ratio family)."""
    n_chars = texts.str.len().to_numpy().astype(np.int64)
    n_tok = token_counts(texts)
    n_stop = stopword_counts(texts)
    return pd.DataFrame({
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_stopwords": n_stop,
    })
