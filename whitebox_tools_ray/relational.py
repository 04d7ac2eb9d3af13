"""Relational building blocks: pre-aggregated groupbys and exact-money sums.

Shuffle discipline (SURVEY.md section 4.2): a bare ``groupby().aggregate()``
shuffles every row. :func:`partial_agg` combines inside ``map_batches`` first
(vectorized ``pyarrow.Table.group_by`` per batch -> one row per key per
batch), so the all-to-all exchange only moves ``n_keys x n_blocks`` partial
rows — the same partial/merge design as the reference's per-thread
accumulators (math_stat_analysis/raster_summary_stats.rs:232-263), but
expressed as a Dataset plan.

Money sums use integer cents (``round(x*100) -> int64``) so results are
bit-identical to the DuckDB oracle regardless of reduction order — float64
addition is not associative, int64 addition is.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Min, Sum


def cents(batch: pa.Table, col: str, out: str) -> pa.Table:
    """Append round(col*100) as int64 (DuckDB: CAST(ROUND(col*100) AS BIGINT)).

    numpy rint (half-to-even) vs DuckDB ROUND (half-away) only differ when
    col*100 is exactly representable at .5 — impossible for 2-decimal money
    and measure-zero for random doubles.
    """
    v = batch[col].to_numpy(zero_copy_only=False)
    return batch.append_column(out, pa.array(np.rint(v * 100.0).astype(np.int64)))


# spec ops -> (arrow partial aggregate, final ray aggregate factory)
_PARTIAL = {
    "sum": "sum",
    "count": "count",  # partial count -> final sum
    "min": "min",
    "max": "max",
}


def partial_agg(ds, keys: list[str], specs: list[tuple[str, str, str]], *, batch_size: int = 65536):
    """Two-phase grouped aggregate.

    specs: (column, op, out_name) with op in {sum, count, min, max}.
    Phase 1 per batch: ``pyarrow.Table.group_by(keys).aggregate`` (vectorized,
    zero-copy in). Phase 2: tiny ``groupby(keys).aggregate`` over partials.
    """
    arrow_aggs = []
    renames = {}
    for col, op, out in specs:
        arrow_aggs.append((col, _PARTIAL[op]))
        renames[f"{col}_{_PARTIAL[op]}"] = out

    def combine(batch: pa.Table) -> pa.Table:
        res = batch.group_by(keys).aggregate(arrow_aggs)
        return res.rename_columns([renames.get(c, c) for c in res.column_names])

    partials = ds.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)
    finals = []
    for col, op, out in specs:
        if op in ("sum", "count"):
            finals.append(Sum(out, alias_name=out))
        elif op == "min":
            finals.append(Min(out, alias_name=out))
        elif op == "max":
            finals.append(Max(out, alias_name=out))
    return partials.groupby(keys).aggregate(*finals)


def arg_extreme_reduce(ds, keys: list[str], seq_col: str, carry: list[str], *,
                       mode: str = "min", batch_size: int = 65536):
    """Keep, per key group, the row with the min (or max) ``seq_col``.

    Order-independent replication of record-order semantics (``first``/
    ``last`` assigns, data_tools/vector_points_to_raster.rs:402-450; dedup
    keep-first, lidar_analysis/remove_duplicates.rs:272-291): phase 1 reduces
    each batch to one candidate row per key (vectorized pandas idxmin/idxmax),
    phase 2 reduces candidates with a tiny ``map_groups``.
    """
    import pandas as pd  # noqa: F401

    cols = list(dict.fromkeys([*keys, seq_col, *carry]))

    def reduce_batch(df):
        idx = df.groupby(keys, sort=False)[seq_col].idxmin() if mode == "min" \
            else df.groupby(keys, sort=False)[seq_col].idxmax()
        return df.loc[idx, cols]

    partials = ds.map_batches(reduce_batch, batch_format="pandas", batch_size=batch_size)
    return partials.groupby(keys).map_groups(reduce_batch, batch_format="pandas")
