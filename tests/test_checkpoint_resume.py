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
