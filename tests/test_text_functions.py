"""Unit tests for the text-analysis kernels."""

import numpy as np
import pandas as pd

from whitebox_tools_ray.config import EngineConfig
from whitebox_tools_ray.functions.text import (
    NgramLanguageId,
    fingerprint64,
    quality_features,
    stopword_counts,
    token_counts,
)


def test_token_counts_edges():
    s = pd.Series(["a b c", "", "single", "x y"])
    np.testing.assert_array_equal(token_counts(s), [3, 0, 1, 2])


def test_stopword_counts_whole_words():
    s = pd.Series(["the cat and a dog", "theatre agenda", "a the a"])
    np.testing.assert_array_equal(stopword_counts(s), [2, 0, 3])


def test_fingerprint_deterministic_and_distinct():
    s = pd.Series(["hello world", "hello world", "hello worlds", ""])
    f = fingerprint64(s)
    assert f[0] == f[1]
    assert f[0] != f[2]
    assert f[3] == 0  # empty text hashes to 0 under the polynomial scheme
    # batch-split invariance
    f2 = np.concatenate([fingerprint64(s[:2]), fingerprint64(s[2:])])
    np.testing.assert_array_equal(f, f2)


def test_quality_features_shape():
    q = quality_features(pd.Series(["the a b", ""]))
    assert list(q.columns) == ["n_chars", "n_tokens", "n_stopwords"]
    assert q["n_tokens"].tolist() == [3, 0]
    assert q["n_stopwords"].tolist() == [2, 0]


def test_lang_id_deterministic():
    m = NgramLanguageId()
    s = pd.Series(["the thing and the other thing", "der ein und schein", "中文的文本在这里"])
    a = m.classify(s)
    b = m.classify(s)
    np.testing.assert_array_equal(a, b)
    assert a[0] == "en"
    assert a[2] == "zh"


def test_engine_config_roundtrip(tmp_path):
    cfg = EngineConfig(num_cpus=8, verbose=True)
    p = str(tmp_path / "settings.json")
    cfg.save(p)
    loaded = EngineConfig.load(p)
    assert loaded.num_cpus == 8 and loaded.verbose
