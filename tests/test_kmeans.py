"""k-means vs a single-machine numpy reference with identical quantized
semantics — centroids and assignments must match exactly."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.stages.kmeans import KM_SCALE, _assign, _quantize


def reference_kmeans(mat: np.ndarray, ids: np.ndarray, k: int, iters: int):
    order = np.argsort(ids)
    cents = _quantize(mat[order[:k]])
    for _ in range(iters):
        q = _quantize(mat)
        a = _assign(q, cents)
        new = cents.copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = np.rint(q[m].sum(axis=0) / int(m.sum())).astype(np.int64)
        if (new == cents).all():
            cents = new
            break
        cents = new
    return cents.astype(np.float64) / KM_SCALE, _assign(_quantize(mat), cents)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_reference():
    import ray.data

    from whitebox_tools_ray.stages.kmeans import kmeans_fit

    rng = np.random.default_rng(11)
    # three separated blobs + noise dims
    n, dim, k = 600, 8, 3
    centers = rng.standard_normal((k, dim)) * 5
    mat = np.vstack([centers[i % k] + rng.standard_normal(dim) * 0.5 for i in range(n)]) \
        .astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    ds = ray.data.from_pandas(df).repartition(6)

    cents, assigns = kmeans_fit(ds, k=k, iters=8)
    got = assigns.to_pandas().sort_values("vec_id").reset_index(drop=True)
    want_cents, want_assign = reference_kmeans(mat, ids, k, 8)

    np.testing.assert_array_equal(cents, want_cents)
    np.testing.assert_array_equal(got["cluster"].to_numpy(), want_assign)
    # clusters actually separate the blobs (quality sanity)
    from collections import Counter

    for c in range(k):
        blob_of = Counter(np.arange(n)[got["cluster"].to_numpy() == c] % k)
        assert blob_of.most_common(1)[0][1] > 0.9 * sum(blob_of.values())
