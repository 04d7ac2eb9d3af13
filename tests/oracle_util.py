"""Shared DuckDB-oracle comparison harness (mirrors the driver's check:
row count + schema + order-insensitive value comparison)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def to_pdf(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(ray_df: pd.DataFrame, duck_df: pd.DataFrame, name: str, float_exact: bool = True):
    a, b = canon(to_pdf(ray_df)), canon(duck_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            if float_exact:
                ok = np.array_equal(av, bv, equal_nan=True)
            else:
                ok = np.allclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
            assert ok, f"{name}: float column {col} mismatch (max diff " \
                       f"{np.nanmax(np.abs(av - bv)) if len(av) else 0})"
        else:
            assert (pd.Series(av).fillna("\0") == pd.Series(bv).fillna("\0")).all(), \
                f"{name}: column {col} values differ"
