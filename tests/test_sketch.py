"""Mergeable quantile sketch: rank-error bound vs the exact sort."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_sketch_rank_error_bound():
    import ray.data

    from whitebox_tools_ray.functions.sketch import sketch_quantiles
    from whitebox_tools_ray.sources.tables import read_table

    sf = "/root/testdata/sf0.01"
    ds = read_table(sf, "events", columns=["value"])
    est = sketch_quantiles(ds, "value", k=512)
    exact = np.sort(ds.to_pandas()["value"].to_numpy())
    n = len(exact)
    eps = 3 * n / 512  # batch + 2 tree levels
    for q, v in zip(est["q"], est["est"]):
        rank = np.searchsorted(exact, v)
        assert abs(rank - q * n) <= eps, (q, v, rank, q * n, eps)


def test_compress_preserves_weight_and_bounds():
    import numpy as np

    from whitebox_tools_ray.functions.sketch import compress

    rng = np.random.default_rng(5)
    v = rng.standard_normal(10000)
    w = np.ones(10000)
    c = compress(v, w, 64)
    assert len(c) == 64
    assert abs(c["w"].sum() - 10000) < 1e-6
    assert c["v"].min() >= v.min() and c["v"].max() <= v.max()
