"""Checkpoint/resume semantics (north rule: resumable from Parquet
checkpoints with per-partition lineage)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_stage_checkpoint_and_resume(tmp_path):
    import pandas as pd
    import ray.data

    from whitebox_tools_ray.state.checkpoint import is_complete, read_manifest, run_stage

    out = str(tmp_path / "stage1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        df = pd.DataFrame({"tile_id": np.repeat([0, 1, 2], 10), "v": np.arange(30)})
        return ray.data.from_pandas(df)

    ds1, m1 = run_stage("s1", build, out, input_sig="sig-a", partition_col="tile_id")
    assert calls["n"] == 1 and not m1["resumed"]
    assert m1["rows"] == 30
    assert m1["partitions"] == {"0": 10, "1": 10, "2": 10}  # per-partition lineage
    assert is_complete(out, "sig-a")

    # resume: build() must NOT run again; data comes from the checkpoint
    ds2, m2 = run_stage("s1", build, out, input_sig="sig-a", partition_col="tile_id")
    assert calls["n"] == 1 and m2["resumed"]
    assert ds2.count() == 30

    # changed input signature invalidates the checkpoint
    ds3, m3 = run_stage("s1", build, out, input_sig="sig-b", partition_col="tile_id")
    assert calls["n"] == 2 and not m3["resumed"]


@pytest.mark.usefixtures("ray_session")
def test_per_partition_resume(tmp_path):
    """A rerun skips partitions whose _DONE marker exists (their files are
    untouched) and writes only the missing ones."""
    import os
    import time as _time

    import pandas as pd
    import ray.data

    from whitebox_tools_ray.state.checkpoint import resumable_partition_write

    out = str(tmp_path / "ptiles")
    df = pd.DataFrame({"tile_id": np.repeat([0, 1, 2, 3], 25), "v": np.arange(100)})

    # first run: only tiles 0 and 1 "survive the crash"
    part = ray.data.from_pandas(df[df.tile_id < 2])
    m1 = resumable_partition_write(part, out, partition_col="tile_id",
                                   stage="s", input_sig="sig")
    assert set(m1["partitions"]) == {"0", "1"} and m1["newly_written"] == 2

    mtimes = {d: os.path.getmtime(os.path.join(out, d, "part.parquet"))
              for d in os.listdir(out) if "=" in d}
    _time.sleep(0.05)

    # rerun with the FULL input: tiles 0/1 skipped, 2/3 written
    m2 = resumable_partition_write(ray.data.from_pandas(df), out,
                                   partition_col="tile_id", stage="s", input_sig="sig")
    assert set(m2["partitions"]) == {"0", "1", "2", "3"}
    assert m2["resumed_partitions"] == 2 and m2["newly_written"] == 2
    assert m2["rows"] == 100
    for d, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "part.parquet")) == t  # untouched


@pytest.mark.usefixtures("ray_session")
def test_interrupted_run_recovers(tmp_path):
    """A run killed mid-write leaves a .tmp dir and no manifest; the rerun
    recomputes and produces a complete, identical output."""
    import pandas as pd
    import ray.data

    from whitebox_tools_ray.state.checkpoint import is_complete, run_stage

    out = str(tmp_path / "stage2")

    # simulate the kill: a stale partial tmp dir from a previous attempt
    os.makedirs(out + ".tmp/tile_id=0", exist_ok=True)
    with open(out + ".tmp/tile_id=0/junk.parquet", "w") as f:
        f.write("partial garbage")
    assert not is_complete(out)

    def build():
        df = pd.DataFrame({"tile_id": np.repeat([0, 1], 5), "v": np.arange(10)})
        return ray.data.from_pandas(df)

    ds, m = run_stage("s2", build, out, input_sig="x", partition_col="tile_id")
    assert m["rows"] == 10 and not m["resumed"]
    got = ds.to_pandas().sort_values("v").reset_index(drop=True)
    assert list(got["v"]) == list(range(10))
    # manifest is valid json with lineage fields
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert man["stage"] == "s2" and man["complete"] and "wall_sec" in man
