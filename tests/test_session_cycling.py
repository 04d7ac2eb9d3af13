"""A driver that cycles ray.shutdown()/ray.init() in ONE process must get
fresh pool actors and memo entries: Ray restarts job AND worker ids at the
same values on a new local cluster, so session-scoped caches keyed on them
serve dead handles — ray.kill on a stale actor handle is a FATAL
core-worker check, not a catchable exception (found by
scripts/two_node_check.py). Caches key on the per-instance GCS address.

Runs in a subprocess: the suite's session-scoped Ray must stay up.
"""

import subprocess
import sys
import textwrap


def test_pool_and_memo_survive_init_cycles():
    code = textwrap.dedent("""
        import os, sys
        os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
        sys.path.insert(0, "/root/repo")
        import numpy as np, pandas as pd, ray, ray.data
        from whitebox_tools_ray import memo
        from whitebox_tools_ray.grid import GridSpec
        from whitebox_tools_ray.stages.flow import tile_of_expr
        from whitebox_tools_ray.stages.pregel import flow_accumulation_pregel

        G = GridSpec(west=-180.0, north=85.0, res_x=0.1, res_y=0.1,
                     rows=20, cols=40)
        n = G.rows * G.cols

        calls = [0]

        @memo.session_memo
        def cached(tag):
            calls[0] += 1
            return ray.data.range(10).materialize()

        sums = []
        for cycle in range(2):
            ray.init(address="local", num_cpus=4, include_dashboard=False,
                     logging_level="ERROR")
            cid = np.arange(n, dtype=np.int64)
            down = np.where(cid % G.cols < G.cols - 1, cid + 1, -1)
            ds = ray.data.from_pandas(pd.DataFrame({
                "cell_id": cid, "down_id": down,
                "tile": tile_of_expr(cid, G, 8)})).repartition(2)
            acc = flow_accumulation_pregel(ds, G, tile=8, n_shards=2)
            sums.append(int(acc.to_pandas()["acc"].sum()))
            assert cached("x").count() == 10   # must NOT be a dead handle
            ray.shutdown()
        assert sums[0] == sums[1], sums
        assert calls[0] == 2, f"memo served a dead-session entry: {calls}"
        print("CYCLES-OK", sums[0])
    """)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "CYCLES-OK" in r.stdout
