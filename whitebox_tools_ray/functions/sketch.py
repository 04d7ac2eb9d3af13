"""Mergeable approximate quantile sketch (the SCALE path for quantiles over
unbounded key spaces — the exact `quantiles_quantity` / `exact_quantiles_
value` operators need a full global sort; this streams).

Design: a compressed weighted CDF of at most K (value, weight) points. Each
batch compresses its sorted values to K points at evenly spaced ranks; the
tree merge concatenates partials, re-sorts by value, and re-compresses.
Every compression moves any rank estimate by at most W/K (W = summarized
weight), so after L merge levels the rank error is bounded by L*n/K —
with the default tree (batch + 2 levels) and K = 512 that is < 0.6% of n.
Deterministic: no sampling, ties keep first-sorted order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def compress(values: np.ndarray, weights: np.ndarray, k: int) -> pd.DataFrame:
    """Weighted values -> <= k summary points at evenly spaced ranks."""
    order = np.argsort(values, kind="mergesort")
    v = values[order]
    w = weights[order].astype(np.float64)
    total = w.sum()
    if len(v) <= k:
        return pd.DataFrame({"v": v, "w": w})
    cum = np.cumsum(w)
    targets = (np.arange(k) + 0.5) / k * total
    idx = np.searchsorted(cum, targets)
    idx = np.minimum(idx, len(v) - 1)
    return pd.DataFrame({"v": v[idx], "w": np.full(k, total / k)})


def sketch_quantiles(ds, col: str, *, k: int = 512,
                     qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    """Dataset -> DataFrame (q, est) via per-batch compress + tree merge."""
    from ..relational import tree_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(np.float64) if col in df.columns \
            else df["v"].to_numpy(np.float64)
        w = df["w"].to_numpy(np.float64) if "w" in df.columns \
            else np.ones(len(v))
        return compress(v, w, k)

    root = tree_reduce(ds.map_batches(partial, batch_format="pandas"),
                       partial, batch_format="pandas").to_pandas()
    order = np.argsort(root["v"].to_numpy(), kind="mergesort")
    v = root["v"].to_numpy()[order]
    w = root["w"].to_numpy()[order]
    cum = np.cumsum(w)
    total = cum[-1]
    out = []
    for q in qs:
        i = int(np.searchsorted(cum, q * total))
        out.append((float(q), float(v[min(i, len(v) - 1)])))
    return pd.DataFrame(out, columns=["q", "est"])
