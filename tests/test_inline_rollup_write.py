"""checkpointed_write_inline_rollup: the one-pass partitioned checkpoint
write whose write tasks emit grouped partials (no rollup re-read).

Covers: rollup/manifest equivalence with the actual file contents, hive
layout parity with write_parquet (partition col in the dir name only),
drop_from_files, empty input, retry idempotency of the deterministic
filenames, and the count-spec contract."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from whitebox_tools_ray.state.checkpoint import (
    checkpointed_write_inline_rollup, read_manifest)


def _mk_ds(n=1000, blocks=7):
    import numpy as np

    uid = np.arange(n, dtype=np.int64)
    t = pa.table({
        "uid": uid,
        "part": (uid * 2654435761 % 5).astype("int64"),
        "cell": (uid * 40503 % 37).astype("int64"),
        "val": (uid % 13).astype("int64"),
        "aux": (uid % 3).astype("int64"),
    })
    return ray.data.from_arrow(t).repartition(blocks), t


def test_rollup_matches_files_and_manifest(tmp_path):
    ds, t = _mk_ds()
    out = str(tmp_path / "ckpt")
    merged, manifest = checkpointed_write_inline_rollup(
        ds, out, stage="s", input_sig="sig", partition_col="part",
        uid_col="uid", rollup_keys=["cell"],
        rollup_specs=[("uid", "count", "n"), ("val", "sum", "sum_val")])
    files = glob.glob(out + "/part=*/*.parquet")
    body = pa.concat_tables([pq.read_table(f) for f in files])
    assert manifest["rows"] == len(t) == body.num_rows
    # partition col lives in dir names only (write_parquet layout parity)
    assert "part" not in body.column_names
    df = t.to_pandas()
    expect = df.groupby("cell").agg(n=("uid", "size"), sum_val=("val", "sum"))
    got = merged.set_index("cell").sort_index()
    assert (got["n"] == expect.sort_index()["n"]).all()
    assert (got["sum_val"] == expect.sort_index()["sum_val"]).all()
    # per-partition lineage equals the true per-part row counts
    pc = df.groupby("part").size()
    assert manifest["partitions"] == {str(k): int(v) for k, v in pc.items()}
    assert read_manifest(out)["complete"]


def test_drop_from_files_keeps_rollup(tmp_path):
    ds, t = _mk_ds()
    out = str(tmp_path / "ckpt")
    merged, _ = checkpointed_write_inline_rollup(
        ds, out, stage="s", input_sig="sig", partition_col="part",
        uid_col="uid", rollup_keys=["cell"],
        rollup_specs=[("uid", "count", "n"), ("aux", "sum", "sum_aux")],
        drop_from_files=("aux",))
    body = pa.concat_tables([
        pq.read_table(f) for f in glob.glob(out + "/part=*/*.parquet")])
    assert "aux" not in body.column_names
    assert merged["sum_aux"].sum() == t["aux"].to_pandas().sum()


def test_empty_input(tmp_path):
    ds = ray.data.from_arrow(pa.table({
        "uid": pa.array([], pa.int64()), "part": pa.array([], pa.int64()),
        "cell": pa.array([], pa.int64())}))
    out = str(tmp_path / "ckpt")
    merged, manifest = checkpointed_write_inline_rollup(
        ds, out, stage="s", input_sig="sig", partition_col="part",
        uid_col="uid", rollup_keys=["cell"],
        rollup_specs=[("uid", "count", "n")])
    assert manifest["rows"] == 0 and manifest["partitions"] == {}
    assert len(merged) == 0 and os.path.exists(out)


def test_filenames_deterministic_for_retry_idempotency(tmp_path):
    """A re-executed write task must overwrite its own files, not add new
    ones: filenames depend only on the batch content."""
    ds, _ = _mk_ds()
    names = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        checkpointed_write_inline_rollup(
            ds, out, stage="s", input_sig="sig", partition_col="part",
            uid_col="uid", rollup_keys=["cell"],
            rollup_specs=[("uid", "count", "n")])
        names.append(sorted(os.path.relpath(f, out) for f in
                            glob.glob(out + "/part=*/*.parquet")))
    assert names[0] == names[1]


def test_count_spec_required(tmp_path):
    ds, _ = _mk_ds(50, 2)
    with pytest.raises(ValueError, match="count"):
        checkpointed_write_inline_rollup(
            ds, str(tmp_path / "ckpt"), stage="s", input_sig="sig",
            partition_col="part", uid_col="uid", rollup_keys=["cell"],
            rollup_specs=[("val", "sum", "sum_val")])
