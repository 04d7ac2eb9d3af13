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
                       input_sig: str, partition_col: str | None = None) -> dict:
    """Write ``ds`` to ``out_dir`` atomically and record lineage.

    When ``partition_col`` is given, the output is hive-partitioned on it
    (one directory per tile/key range — the resumable layout) and the
    manifest carries per-partition row counts.
    """
    import pyarrow.parquet as pq

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.time()
    if partition_col is not None:
        ds.write_parquet(tmp, partition_cols=[partition_col])  # streaming write
        # per-partition lineage from file metadata only — no data re-read
        parts: dict[str, int] = {}
        for entry in sorted(os.listdir(tmp)):
            d = os.path.join(tmp, entry)
            if not (os.path.isdir(d) and "=" in entry):
                continue
            key = entry.split("=", 1)[1]
            parts[key] = sum(pq.read_metadata(os.path.join(d, f)).num_rows
                             for f in os.listdir(d) if f.endswith(".parquet"))
        rows = int(sum(parts.values()))
    else:
        ds.write_parquet(tmp)
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


def run_stage(name: str, build: Callable[[], ray.data.Dataset], out_dir: str, *,
              input_sig: str, partition_col: str | None = None,
              resume: bool = True) -> tuple[ray.data.Dataset, dict]:
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
                                  partition_col=partition_col)
    manifest["resumed"] = False
    return read_parquet_dir(out_dir), manifest
