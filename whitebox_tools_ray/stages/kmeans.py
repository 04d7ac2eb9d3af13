"""k-means clustering (IT pattern: KMeansClustering,
image_analysis/k_means_clustering.rs) as a driver loop over distributed
assign + partial-update rounds.

Determinism at any parallelism: embeddings are quantized to int64
(round(x * SCALE)); per-cluster partial sums are exact integer vectors, so
the merged centroid update is independent of block order; assignment ties
break on the lower cluster id. Centroids are broadcast per round via
``ray.put``; each batch computes distances vectorized (numpy matmul) and
emits one (cluster, int-vector-sum, count) partial row per cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

KM_SCALE = 10000.0


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.rint(mat.astype(np.float64) * KM_SCALE).astype(np.int64)


def _assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid by squared distance over the quantized space;
    ties -> lowest cluster id (argmin semantics)."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
    cross = q @ cents.T                       # int64 exact
    c2 = np.sum(cents * cents, axis=1)        # int64 exact
    score = c2[None, :] - 2 * cross           # exact ints -> exact argmin
    return np.argmin(score, axis=1).astype(np.int64)


def kmeans_fit(emb_ds, *, k: int = 8, iters: int = 10, vec_col: str = "embedding",
               id_col: str = "vec_id"):
    """Returns (centroids float64 (k, dim), assignments Dataset(vec_id,
    cluster)). Init = the k rows with the lowest ids (deterministic)."""
    import pyarrow.compute as pc

    # vectorized Arrow mask (not a per-row Python filter over every embedding)
    init = emb_ds.map_batches(lambda t: t.filter(pc.less(t[id_col], k)),
                              batch_format="pyarrow").to_pandas().sort_values(id_col)
    cents_q = _quantize(np.stack(init[vec_col].to_numpy()))
    dim = cents_q.shape[1]

    for _ in range(iters):
        ref = ray.put(cents_q)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            from .spatial_join import _cached_get

            cq = _cached_get(ref)
            q = _quantize(np.stack(df[vec_col].to_numpy()))
            a = _assign(q, cq)
            rows = []
            for c in range(len(cq)):
                m = a == c
                if m.any():
                    rows.append({"cluster": c, "n": np.int64(int(m.sum())),
                                 "qsum": q[m].sum(axis=0)})
            return pd.DataFrame(rows)

        pdf = emb_ds.map_batches(partial, batch_format="pandas").to_pandas()
        new = cents_q.copy()
        for c in range(k):
            sub = pdf[pdf["cluster"] == c]
            if len(sub):
                n = int(sub["n"].sum())
                qsum = np.sum(np.stack(sub["qsum"].to_numpy()), axis=0)
                # re-quantized mean keeps the state integer and exact
                new[c] = np.rint(qsum / n).astype(np.int64)
        if (new == cents_q).all():
            cents_q = new
            break
        cents_q = new

    final_ref = ray.put(cents_q)

    def assign_out(df: pd.DataFrame) -> pd.DataFrame:
        from .spatial_join import _cached_get

        cq = _cached_get(final_ref)
        q = _quantize(np.stack(df[vec_col].to_numpy()))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "cluster": _assign(q, cq)})

    return cents_q.astype(np.float64) / KM_SCALE, \
        emb_ds.map_batches(assign_out, batch_format="pandas")
