"""Parquet table readers + deterministic coordinate derivation.

The driver's test tables (TESTDATA.md) carry no lon/lat, so the spatial
operators derive point coordinates from integer keys with arithmetic that is
bit-identical between numpy (engine side) and DuckDB SQL (oracle side):
multiplicative congruential mixing entirely in int64 (no overflow at any
scale factor: id * 69621 < 2^63 for id < 1.3e14), then one exact float64
division. Both engines perform the same IEEE-754 ops in the same order, so
every derived coordinate — and therefore every cell/tile assignment — is
byte-identical at any parallelism level (the north-rule invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

# Point layer derivation over `events` (event_id) — x in [-180, 180), y in [-85, 85)
_MODULUS = 100_000
_AX, _AY = 48271, 69621

X_SQL = "((((event_id * 48271) % 100000) / 100000.0) * 360.0 - 180.0)"
Y_SQL = "((((event_id * 69621) % 100000) / 100000.0) * 170.0 - 85.0)"

# Document layer derivation over `documents` (doc_id) — same construction
DOC_X_SQL = "((((doc_id * 48271) % 100000) / 100000.0) * 360.0 - 180.0)"
DOC_Y_SQL = "((((doc_id * 69621) % 100000) / 100000.0) * 170.0 - 85.0)"


def _mix(ids: np.ndarray, mult: int) -> np.ndarray:
    return (np.asarray(ids, np.int64) * np.int64(mult)) % np.int64(_MODULUS)


def derive_xy(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) float64 point coords from an int64 id column (SQL-replicable)."""
    x = (_mix(ids, _AX) / float(_MODULUS)) * 360.0 - 180.0
    y = (_mix(ids, _AY) / float(_MODULUS)) * 170.0 - 85.0
    return x, y


derive_doc_xy = derive_xy  # same formula, applied to doc_id


def add_xy(batch: pa.Table, id_col: str = "event_id") -> pa.Table:
    """map_batches kernel: append derived x/y columns (zero-copy otherwise)."""
    x, y = derive_xy(batch[id_col].to_numpy(zero_copy_only=False))
    return batch.append_column("x", pa.array(x)).append_column("y", pa.array(y))


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read of one test table.

    Block count scales with data volume (~64 MiB compressed per block,
    minimum 2 for pipeline parallelism) instead of Ray's default CPU-based
    split: tiny tables otherwise fan out to 64 blocks and every downstream
    groupby/sort pays a 64x64 tiny-task shuffle — pure overhead. At 100 TB
    the same rule yields thousands of blocks and full parallelism.
    """
    import os

    path = f"{sf_dir}/{name}.parquet"
    size = os.path.getsize(path)
    blocks = max(2, min(512, size // (64 * 1024 * 1024) + 1))
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=int(blocks))


def read_parquet_dir(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a parquet directory with byte-proportional block sizing — without
    an override Ray makes one block per FILE, and a hive-partitioned
    checkpoint (partitions x writer blocks) explodes into thousands of tiny
    blocks whose task churn anti-scales with num_cpus."""
    import os

    size = 0
    for root, _, files in os.walk(path):
        size += sum(os.path.getsize(os.path.join(root, f))
                    for f in files if f.endswith(".parquet"))
    blocks = max(2, min(512, size // (64 * 1024 * 1024) + 1))
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=int(blocks))


def read_parquet_files_fast(path: str, columns: list[str]) -> ray.data.Dataset:
    """Planning-free parallel read of a parquet tree for NARROW follow-up
    scans (checkpoint rollups): ``ray.data.read_parquet`` prefetches
    per-fragment metadata on the driver (~1 ms/file — 2.4 s over the 2.7k
    files a blocks-x-keys partitioned write makes), which is pure fixed
    cost when the consumer only needs a column or two. This reads the
    file LIST as items and opens each file inside the map task instead.
    Hive partition columns are NOT recovered — pass only physical columns."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    files = []
    for root, _, fs in os.walk(path):
        files.extend(os.path.join(root, f) for f in fs
                     if f.endswith(".parquet"))
    files.sort()

    def read_files(batch: dict) -> pa.Table:
        tabs = [pq.read_table(f, columns=columns) for f in batch["item"]]
        return pa.concat_tables(tabs) if tabs \
            else pa.table({c: [] for c in columns})

    per_task = max(1, len(files) // 256 + 1)
    return ray.data.from_items(files,
                               override_num_blocks=max(1, len(files) // per_task)) \
        .map_batches(read_files, batch_format="numpy", batch_size=per_task)


def read_points(sf_dir: str, extra_cols: tuple[str, ...] = ("value",)) -> ray.data.Dataset:
    """The standard point layer: events + derived (x, y).

    ``event_id`` doubles as the record_seq that replicates the reference's
    record-order semantics (first/last assigns, dedup keep-first) in an
    order-independent way (SURVEY.md section 2.3d).
    """
    ds = read_table(sf_dir, "events", columns=["event_id", *extra_cols])
    return ds.map_batches(add_xy, batch_format="pyarrow")
