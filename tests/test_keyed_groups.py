"""keyed_map_groups must be a drop-in for groupby().map_groups (same
groups, same per-group rows), and session_memo must key on (args, Ray
session) only. Kernels are closures — pickled by value into workers."""

import numpy as np
import pandas as pd
import ray

from whitebox_tools_ray.memo import session_memo
from whitebox_tools_ray.relational import keyed_map_groups


def _frame(n=5000, keys=700, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, keys, n).astype(np.int64) * 13 - 50,
        "v": rng.integers(0, 1000, n).astype(np.int64)})


def _make_gsum():
    def gsum(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [int(g["k"].iloc[0])],
                             "s": [int(g["v"].sum())],
                             "n": [len(g)]})
    return gsum


def test_keyed_map_groups_matches_map_groups(ray_session):
    df = _frame()
    ds = ray.data.from_pandas(df)
    gsum = _make_gsum()
    a = keyed_map_groups(ds, "k", gsum).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    b = ds.groupby("k").map_groups(gsum, batch_format="pandas") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_keyed_map_groups_whole_part(ray_session):
    df = _frame()
    ds = ray.data.from_pandas(df)

    def part_sum(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across groups in the bucket
        out = g.groupby("k", as_index=False).agg(s=("v", "sum"),
                                                 n=("v", "size"))
        out["n"] = out["n"].astype(np.int64)
        return out

    a = keyed_map_groups(ds, "k", part_sum, per_group=False).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exact = df.groupby("k", as_index=False).agg(s=("v", "sum"),
                                                n=("v", "size"))
    exact["n"] = exact["n"].astype(np.int64)
    pd.testing.assert_frame_equal(a, exact.sort_values("k")
                                  .reset_index(drop=True))


def test_keyed_map_groups_key_colocation(ray_session):
    # every key appears in exactly one output row of the per-group count —
    # i.e. no key was split across buckets
    df = _frame(n=20000, keys=3000)
    ds = ray.data.from_pandas(df)
    out = keyed_map_groups(ds, "k", _make_gsum()).to_pandas()
    assert out["k"].is_unique
    assert int(out["n"].sum()) == len(df)


def test_session_memo_identity_and_args(ray_session):
    calls = []

    @session_memo
    def build(tag):
        calls.append(tag)
        return object()

    a1, a2, b = build("a"), build("a"), build("b")
    assert a1 is a2 and a1 is not b
    assert calls == ["a", "b"]
