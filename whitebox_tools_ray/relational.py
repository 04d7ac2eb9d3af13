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


def keyed_map_groups(ds, key: str, fn, *, parts: int = 32,
                     batch_format: str = "pandas", per_group: bool = True):
    """``groupby(key).map_groups(fn)`` with the per-group dispatch overhead
    amortized: rows are hash-bucketed into ``parts`` buckets, Ray's
    map_groups runs once PER BUCKET, and groups are walked by an in-process
    ``pandas.groupby`` loop. Ray's own per-group task slicing costs ~250 us
    per group (measured: 10k-cell co-groups spend 6+ s in dispatch for
    <1 s of kernel); the bucket form pays it ``parts`` times.

    Semantics identical to groupby().map_groups for any fn that sees one
    whole group per call (the bucket hash co-locates every row of a key).
    Only int64-keyed co-groups use this; output row order is not defined,
    matching the Dataset contract.

    Contract difference vs Ray's map_groups: when every group in a bucket
    returns an EMPTY frame, fn is invoked once more with an empty input
    frame (``g.iloc[0:0]``) purely to recover the output schema — so
    kernels passed here must tolerate an empty input frame (returning an
    empty frame with the right columns). Ray's own map_groups guarantees
    non-empty groups; a kernel that indexes ``g.iloc[0]`` unconditionally
    satisfies Ray's contract but not this one.

    ``per_group=False`` hands fn the WHOLE bucket instead (every row of
    each contained key, several keys per call) — for kernels that can
    vectorize across groups (rank-within-key via groupby.cumcount etc.),
    eliminating the in-process group walk too."""
    import pandas as pd

    knuth = np.uint64(0x9E3779B97F4A7C15)

    def add_part(df: "pd.DataFrame") -> "pd.DataFrame":
        k = df[key].to_numpy(np.int64).astype(np.uint64)
        out = df.copy()
        out["__part"] = ((k * knuth) >> np.uint64(33)).astype(np.int64) % parts
        return out

    def per_part(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.drop(columns=["__part"])
        if not per_group:
            return fn(g)
        outs = [fn(sub) for _, sub in g.groupby(key, sort=True)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return fn(g.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("__part").map_groups(per_part,
                                          batch_format=batch_format))


def tree_reduce(ds, reduce_batch, *, levels: tuple[int, ...] = (32, 1),
                batch_format: str = "pyarrow"):
    """Tree-combine an ALGEBRAIC per-batch reduction: apply ``reduce_batch``
    per block, coalescing blocks level by level (e.g. 5000 -> 32 -> 1).

    Correct whenever the reduction is associative/commutative over arbitrary
    row subsets (sum/min/max/count partials, argmin-by-seq candidates,
    drop-duplicates). Replaces ``groupby().aggregate()`` whose per-group
    overhead dominates at 10^4+ groups (measured: 2-5 s per AggregateFn on
    61k groups vs milliseconds for an Arrow group_by over the same rows).
    The root block holds one row per key — use only for key cardinalities
    that fit one block (grid cells, tiles, types); for unbounded keys keep
    the shuffle aggregate.
    """
    for n in levels:
        # batch_size=None pins whole-block batching: the merge at each level
        # must see the entire repartitioned block in ONE batch or duplicate
        # per-key partial rows survive to the root.
        ds = ds.repartition(n).map_batches(reduce_batch, batch_format=batch_format,
                                           batch_size=None)
    return ds


def partial_agg(ds, keys: list[str], specs: list[tuple[str, str, str]], *,
                batch_size: int = 65536, mode: str = "tree"):
    """Grouped aggregate: per-batch Arrow combine + tree (or shuffle) merge.

    specs: (column, op, out_name) with op in {sum, count, min, max}.
    Phase 1 per batch: ``pyarrow.Table.group_by(keys).aggregate`` (vectorized,
    zero-copy in) — one row per key per batch, so the exchange only moves
    ``n_keys x n_blocks`` partial rows. Phase 2: ``mode="tree"`` (default)
    merges partials with tree_reduce; ``mode="shuffle"`` uses Ray's
    sort-shuffle ``groupby().aggregate`` for unbounded key cardinality.
    """
    arrow_aggs = []
    renames = {}
    merge_aggs = []
    for col, op, out in specs:
        arrow_aggs.append((col, _PARTIAL[op]))
        renames[f"{col}_{_PARTIAL[op]}"] = out
        merge_op = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}[op]
        merge_aggs.append((out, merge_op))

    def combine(batch: pa.Table) -> pa.Table:
        res = batch.group_by(keys).aggregate(arrow_aggs)
        return res.rename_columns([renames.get(c, c) for c in res.column_names])

    merge_renames = {f"{out}_{mop}": out for out, mop in merge_aggs}

    def merge(batch: pa.Table) -> pa.Table:
        res = batch.group_by(keys).aggregate(merge_aggs)
        res = res.rename_columns([merge_renames.get(c, c) for c in res.column_names])
        return res.select([*keys, *[out for out, _ in merge_aggs]])

    partials = ds.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)
    if mode == "tree":
        return tree_reduce(partials, merge)
    finals = []
    for col, op, out in specs:
        if op in ("sum", "count"):
            finals.append(Sum(out, alias_name=out))
        elif op == "min":
            finals.append(Min(out, alias_name=out))
        elif op == "max":
            finals.append(Max(out, alias_name=out))
    return partials.groupby(keys).aggregate(*finals)


def salted_group_agg(ds, key: str, partial_fn, merge_fn, *, hot_keys=None,
                     n_salts: int = 8, seq_col: str | None = None,
                     batch_format: str = "pandas"):
    """Two-phase grouped aggregation with hot-key salting (north-rule skew
    control for dense urban cells).

    A ``groupby(key).map_groups`` serializes each key into one task; a key
    holding 20% of the rows becomes a straggler. Here hot keys (``hot_keys``
    iterable, or all keys when None) are split into ``n_salts`` sub-groups by
    ``seq_col % n_salts`` (or a per-batch counter), ``partial_fn`` reduces
    each (key, salt) sub-group in parallel, and ``merge_fn`` combines the
    n_salts partial rows per key in a second, tiny groupby. Both fns are
    pandas-in/pandas-out; partial_fn's output must be mergeable by merge_fn
    (algebraic or sketch-style state).
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    hot = set(int(k) for k in hot_keys) if hot_keys is not None else None

    def add_salt(df):
        if seq_col is not None:
            salt = df[seq_col].to_numpy() % n_salts
        else:
            salt = np.arange(len(df)) % n_salts
        if hot is not None:
            salt = np.where(df[key].isin(hot).to_numpy(), salt, 0)
        df = df.copy()
        df["_salt"] = salt.astype(np.int64)
        return df

    salted = ds.map_batches(add_salt, batch_format=batch_format)
    partials = salted.groupby([key, "_salt"]).map_groups(partial_fn,
                                                         batch_format=batch_format)
    merged = partials.groupby(key).map_groups(merge_fn, batch_format=batch_format)
    return merged


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
