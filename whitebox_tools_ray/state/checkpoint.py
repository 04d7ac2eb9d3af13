"""Per-stage Parquet checkpoints with per-partition lineage records.

The reference has no checkpoint/resume at all (SURVEY.md section 4.1 — a
panicking thread poisons the whole run); the north rule requires stages to be
resumable with per-partition lineage. Design:

  * every stage output is a Parquet directory, written atomically: write to
    ``<dir>.tmp`` then rename, then write ``_MANIFEST.json``
  * the manifest records lineage: stage name, input signature, wall time,
    row count, and per-partition (e.g. per-tile) row counts
  * ``run_stage`` skips any stage whose manifest is present and whose input
    signature matches — a restarted job re-reads completed stages from
    Parquet instead of recomputing them
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

import ray.data


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_MANIFEST.json")


def is_complete(out_dir: str, input_sig: str | None = None) -> bool:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return False
    with open(p) as f:
        m = json.load(f)
    return m.get("complete", False) and (input_sig is None or m.get("input_sig") == input_sig)


def read_manifest(out_dir: str) -> dict:
    with open(_manifest_path(out_dir)) as f:
        return json.load(f)


def checkpointed_write(ds: ray.data.Dataset, out_dir: str, *, stage: str,
                       input_sig: str, partition_col: str | None = None,
                       min_rows_per_file: int | None = None) -> dict:
    """Write ``ds`` to ``out_dir`` atomically and record lineage.

    When ``partition_col`` is given, the output is hive-partitioned on it
    (one directory per tile/key range — the resumable layout) and the
    manifest carries per-partition row counts. ``min_rows_per_file``
    bundles blocks into write tasks of at least that many rows: a
    partitioned write otherwise creates blocks x keys files (5.4k files
    of ~800 rows at 16M pages), and every downstream fixed cost — write
    finalize, the lineage footer scan, the rollup re-read — is per-file.
    """
    import pyarrow.parquet as pq

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.time()
    if partition_col is not None:
        ds.write_parquet(tmp, partition_cols=[partition_col],  # streaming write
                         min_rows_per_file=min_rows_per_file)
        # per-partition lineage from file metadata only — no data re-read.
        # Footer reads release the GIL in Arrow, and a partitioned write
        # makes blocks x keys files (2.7k at 8M pages), so scan them
        # threaded: serial was ~1 ms/file of pure driver fixed cost.
        from concurrent.futures import ThreadPoolExecutor

        work: list[tuple[str, str]] = []
        for entry in sorted(os.listdir(tmp)):
            d = os.path.join(tmp, entry)
            if not (os.path.isdir(d) and "=" in entry):
                continue
            key = entry.split("=", 1)[1]
            work.extend((key, os.path.join(d, f)) for f in os.listdir(d)
                        if f.endswith(".parquet"))
        parts: dict[str, int] = {}
        with ThreadPoolExecutor(max_workers=16) as ex:
            for (key, _), n in zip(work, ex.map(
                    lambda kf: pq.read_metadata(kf[1]).num_rows, work)):
                parts[key] = parts.get(key, 0) + n
        rows = int(sum(parts.values()))
    else:
        ds.write_parquet(tmp, min_rows_per_file=min_rows_per_file)
        parts = {}
        rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows
                   for f in os.listdir(tmp) if f.endswith(".parquet"))
    wall = time.time() - t0
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    manifest = {
        "stage": stage,
        "input_sig": input_sig,
        "complete": True,
        "rows": rows,
        "wall_sec": round(wall, 3),
        "partitions": parts,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(_manifest_path(out_dir), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def checkpointed_write_inline_rollup(
        ds: ray.data.Dataset, out_dir: str, *, stage: str, input_sig: str,
        partition_col: str, uid_col: str, rollup_keys: list[str],
        rollup_specs: list[tuple[str, str, str]],
        drop_from_files: tuple[str, ...] = ()):
    """One-pass partitioned checkpoint write whose write tasks ALSO emit
    grouped-aggregate partials over the rows they just wrote.

    ``write_parquet(partition_cols=...)`` followed by a rollup re-read pays
    three per-file costs over the blocks x keys file explosion (~5.4k files
    at 16M pages): the lineage footer scan, a second read-executor launch,
    and one file open per file — ~8-11 s per bench leg that is pure fixed
    cost (bundling the write with ``min_rows_per_file`` instead coalesces
    the FUSED upstream chain into row-count-sized tasks, which serializes
    the 32-CPU leg and trips this guest's resident-memory throttle —
    measured 42 s -> 112 s, so the re-read must go, not the task shape).
    Here each map task splits its batch by ``partition_col``, writes the
    hive layout itself (same directory shape as write_parquet: the
    partition column lives in the dir name, not the file), and returns a
    ``rollup_keys`` x ``rollup_specs`` partial for the batch. The caller
    gets the merged rollup WITHOUT any re-read, and the manifest's
    per-partition counts derive from the same partials.

    Retry-idempotent: filenames are a deterministic function of the batch
    content (min ``uid_col``, a globally unique id, plus row count), so a
    re-executed write task overwrites its own files instead of duplicating
    rows. Returns ``(rollup pandas.DataFrame, manifest)``; the rollup is
    grouped-aggregate-sized (bounded by the spatial grid, not the data).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..relational import partial_agg

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    t0 = time.time()

    arrow_aggs = [(c, {"sum": "sum", "count": "count", "min": "min",
                       "max": "max"}[op]) for c, op, _ in rollup_specs]
    renames = {f"{c}_{a}": out for (c, a), (_, _, out)
               in zip(arrow_aggs, rollup_specs)}
    partial_keys = [partition_col, *[k for k in rollup_keys
                                     if k != partition_col]]

    def write_and_partial(t: pa.Table) -> pa.Table:
        tid = t[partition_col].to_numpy(zero_copy_only=False)
        if len(t):
            order = np.argsort(tid, kind="stable")
            ts = t.take(pa.array(order))
            tids = tid[order]
            uid = ts[uid_col].to_numpy(zero_copy_only=False)
            sig = f"{int(uid.min()):016x}-{len(ts)}"
            bounds = np.flatnonzero(np.diff(tids)).astype(np.int64) + 1
            starts = np.concatenate(([0], bounds))
            stops = np.concatenate((bounds, [len(ts)]))
            # the partition column lives in the dir name (hive layout);
            # rollup-only derived columns stay out of the checkpoint schema
            body = ts.drop_columns([partition_col, *drop_from_files])
            for lo, hi in zip(starts, stops):
                key = tids[lo]
                d = os.path.join(tmp, f"{partition_col}={key}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(body.slice(lo, hi - lo),
                               os.path.join(d, f"part-{sig}.parquet"))
        res = t.group_by(partial_keys).aggregate(arrow_aggs)
        return res.rename_columns([renames.get(c, c)
                                   for c in res.column_names])

    # materialize the (grouped-partial-sized) write outputs BEFORE the
    # merge: with the tree merge's AllToAll Repartition in the same
    # streaming graph, Ray's resource allocator reserves budget for the
    # downstream exchange and backpressures the fused write stage to ONE
    # in-flight task at low CPU counts (measured 73 s -> 400+ s at 8
    # CPUs). The boundary costs one copy of n_blocks x n_keys partial
    # rows — bounded by the grid, not the data.
    partials = ds.map_batches(write_and_partial,
                              batch_format="pyarrow").materialize()
    merged = partial_agg(partials, partial_keys,
                         [(out, "sum" if op in ("sum", "count") else op, out)
                          for _, op, out in rollup_specs]).to_pandas()
    outs = [out for _, _, out in rollup_specs]
    if merged.empty:  # empty input loses the schema through the merge
        merged = pd.DataFrame(columns=[*partial_keys, *outs])
    wall = time.time() - t0

    # per-partition lineage rows come from a count spec (a count over the
    # non-null uid column IS the partition's row count; sums are not)
    count_col = next((out for _, op, out in rollup_specs if op == "count"),
                     None)
    if count_col is None:
        raise ValueError("rollup_specs needs a 'count' spec — the manifest's "
                         "per-partition row counts derive from it")
    parts = {str(k): int(v) for k, v in
             merged.groupby(partition_col)[count_col].sum().items()}
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    manifest = {
        "stage": stage,
        "input_sig": input_sig,
        "complete": True,
        "rows": int(sum(parts.values())),
        "wall_sec": round(wall, 3),
        "partitions": parts,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(_manifest_path(out_dir), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if partition_col not in rollup_keys:
        merged = merged.groupby(rollup_keys, as_index=False)[
            [out for _, _, out in rollup_specs]].sum()
    return merged, manifest


def resumable_partition_write(ds: ray.data.Dataset, out_dir: str, *,
                              partition_col: str, stage: str, input_sig: str) -> dict:
    """Per-PARTITION resumable write: each key's rows land in
    ``<out_dir>/<partition_col>=<key>/`` written atomically (tmp file +
    rename + ``_DONE`` marker). A rerun filters out rows of already-done
    partitions BEFORE the shuffle and only recomputes the missing ones —
    the finest-grained resume the north rule asks for (a killed run loses
    only its in-flight partitions).
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    # A partition counts as done ONLY if its _DONE marker records the SAME
    # input signature as this run: a stale partition (input changed since it
    # was written) is deleted and recomputed, never silently kept.
    done: set[str] = set()
    for d in os.listdir(out_dir):
        if "=" not in d:
            continue
        marker = os.path.join(out_dir, d, "_DONE")
        if not os.path.exists(marker):
            continue
        with open(marker) as f:
            recorded_sig = f.read()
        if recorded_sig == input_sig:
            done.add(d.split("=", 1)[1])
        else:
            shutil.rmtree(os.path.join(out_dir, d))

    if done:
        done_keys = {int(k) if k.lstrip("-").isdigit() else k for k in done}
        ref = ray.put(done_keys)

        def drop_done(df: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            return df[~df[partition_col].isin(keys)]

        ds = ds.map_batches(drop_done, batch_format="pandas")

    def write_partition(g: pd.DataFrame) -> pd.DataFrame:
        key = g[partition_col].iloc[0]
        pdir = os.path.join(out_dir, f"{partition_col}={key}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "part.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.rename(tmp, os.path.join(pdir, "part.parquet"))
        with open(os.path.join(pdir, "_DONE"), "w") as f:
            f.write(input_sig)
        return pd.DataFrame({partition_col: [key], "rows": [len(g)]})

    written = ds.groupby(partition_col).map_groups(write_partition,
                                                   batch_format="pandas").to_pandas()
    parts = {}
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if "=" in d and os.path.isdir(full) and os.path.exists(os.path.join(full, "_DONE")):
            parts[d.split("=", 1)[1]] = sum(
                pq.read_metadata(os.path.join(full, f)).num_rows
                for f in os.listdir(full) if f.endswith(".parquet"))
    manifest = {
        "stage": stage, "input_sig": input_sig, "complete": True,
        "rows": int(sum(parts.values())), "partitions": parts,
        "newly_written": int(len(written)),
        "resumed_partitions": int(len(done)),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(_manifest_path(out_dir), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def run_stage(name: str, build: Callable[[], ray.data.Dataset], out_dir: str, *,
              input_sig: str, partition_col: str | None = None,
              resume: bool = True,
              min_rows_per_file: int | None = None) -> tuple[ray.data.Dataset, dict]:
    """Execute (or resume) one checkpointed stage.

    Returns (dataset reading the stage output, manifest). On resume the
    build function is never called — the completed Parquet is the source.
    """
    from ..sources.tables import read_parquet_dir

    if resume and is_complete(out_dir, input_sig):
        m = read_manifest(out_dir)
        m["resumed"] = True
        return read_parquet_dir(out_dir), m
    manifest = checkpointed_write(build(), out_dir, stage=name, input_sig=input_sig,
                                  partition_col=partition_col,
                                  min_rows_per_file=min_rows_per_file)
    manifest["resumed"] = False
    return read_parquet_dir(out_dir), manifest
