"""Hot-key salting: the salted two-phase aggregate equals the direct
computation on a deliberately skewed key distribution (one key holds ~50%
of rows — the dense-urban-cell scenario)."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.cells import salt_cells


def test_salt_cells_splits_only_hot():
    cells = np.array([5, 5, 5, 7, 9], np.int64)
    seq = np.arange(5, dtype=np.int64)
    salted = salt_cells(cells, seq, {5: 1000}, n_salts=4)
    # hot cell 5 fans out across sub-keys; cold cells keep salt 0
    assert len({s for s, c in zip(salted, cells) if c == 5}) > 1
    assert all(s == c * 4 for s, c in zip(salted, cells) if c != 5)
    # unsalting recovers the cell
    np.testing.assert_array_equal(salted // 4, cells)


@pytest.mark.usefixtures("ray_session")
def test_salted_group_agg_matches_direct():
    import ray.data

    from whitebox_tools_ray.relational import salted_group_agg

    rng = np.random.default_rng(3)
    n = 20000
    # skew: half the rows land on cell 42
    cell = np.where(rng.random(n) < 0.5, 42, rng.integers(0, 50, n)).astype(np.int64)
    val = np.rint(rng.random(n) * 10000).astype(np.int64)
    seq = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"cell": cell, "v": val, "seq": seq})
    ds = ray.data.from_pandas(df).repartition(8)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell": [g["cell"].iloc[0]],
                             "n": [np.int64(len(g))],
                             "vsum": [g["v"].sum()],
                             "vmin": [g["v"].min()]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell": [g["cell"].iloc[0]],
                             "n": [g["n"].sum()],
                             "vsum": [g["vsum"].sum()],
                             "vmin": [g["vmin"].min()]})

    got = salted_group_agg(ds, "cell", partial, merge, hot_keys=[42],
                           n_salts=8, seq_col="seq") \
        .to_pandas().sort_values("cell").reset_index(drop=True)
    want = df.groupby("cell").agg(n=("v", "size"), vsum=("v", "sum"),
                                  vmin=("v", "min")).reset_index() \
        .sort_values("cell").reset_index(drop=True)
    np.testing.assert_array_equal(got["cell"].to_numpy(), want["cell"].to_numpy())
    np.testing.assert_array_equal(got["n"].to_numpy(np.int64), want["n"].to_numpy(np.int64))
    np.testing.assert_array_equal(got["vsum"].to_numpy(np.int64), want["vsum"].to_numpy(np.int64))
    np.testing.assert_array_equal(got["vmin"].to_numpy(np.int64), want["vmin"].to_numpy(np.int64))
