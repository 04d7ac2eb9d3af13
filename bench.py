"""Benchmark harness: runs the headline pipelines over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

    python bench.py              # single run at RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # fresh processes at 8 and 32 CPUs,
                                 # reports throughputs + scaling efficiency
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pricing_summary",
    "cell_grid_counts",
    "pip_clip_points",
    "points_raster_assigns",
    "nn_gridding",
    "idw_gridding_int",
    "hex_binning",
    "doc_exact_dedup",
    "ann_topk_dot",
    "events_sessionize",
]


def consume(res) -> int:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    return len(res)


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from whitebox_tools_ray.pipelines.flagship import flagship_tiling
    from whitebox_tools_ray.pipelines.queries import QUERIES

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    for name in ("events", "lineitem", "documents", "embeddings", "orders"):
        with open(f"{SF_DIR}/{name}.parquet", "rb") as f:
            f.read()

    out_dir = f"/tmp/wbt_bench_{NCPU}"
    shutil.rmtree(out_dir, ignore_errors=True)
    head = flagship_tiling(SF_DIR, out_dir, resume=False)

    qtimes = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        consume(QUERIES[name](SF_DIR))
        qtimes[name] = round(time.time() - t0, 3)

    total = head["wall_sec"] + sum(qtimes.values())
    result = {
        "metric": "spatial-join + tiling throughput (docs/sec, tiles/sec)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"flagship_tiling": round(head["wall_sec"], 3), **qtimes},
        "docs_per_sec": round(head["docs_per_sec"], 1),
        "tiles_per_sec": round(head["tiles_per_sec"], 2),
        "n_docs": head["n_docs"],
        "n_tiles": head["n_tiles"],
        "sf": SF_DIR,
        "num_cpus": NCPU,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    # efficiency of the flagship throughput from N to 4N CPUs
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (32 / 8)
    return {
        "metric": "scaling efficiency N=8 -> 4N=32",
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "tiles_per_sec_8": lo["tiles_per_sec"],
        "tiles_per_sec_32": hi["tiles_per_sec"],
        "total_sec_8": lo["value"],
        "total_sec_32": hi["value"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
