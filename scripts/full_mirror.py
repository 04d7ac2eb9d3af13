"""Full sf0.01 parity sweep: run EVERY queries() entry at the driver's
correctness scale (sf0.01) against its DuckDB oracle, never-checked
entries first, writing results incrementally so the sweep is resumable.

    python scripts/full_mirror.py [results.json] [sf_dir]

Entries already hash-green in a past CORRECTNESS_r*.json round are
re-verified LAST (they ran at this scale under this code lineage);
entries present in the results file are skipped on restart.
"""

import glob
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_mirror_results.json"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

import ray  # noqa: E402

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR",
         runtime_env={"env_vars": {"NUMPY_MADVISE_HUGEPAGE": "0"}})
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from tests.oracle_util import canon, duck_con, to_pdf  # noqa: E402
from whitebox_tools_ray.pipelines.queries import ORACLE, QUERIES  # noqa: E402

# entries hash-green in any past driver round (checked at sf0.01 already)
green: set[str] = set()
for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
    try:
        for name, rec in json.load(open(path)).items():
            if rec.get("hash_match"):
                green.add(name)
    except Exception:
        pass

results: dict = {}
if os.path.exists(OUT):
    try:
        results = json.load(open(OUT))
    except Exception:
        results = {}

names = list(QUERIES)
order = sorted(names, key=lambda n: (
    n in green,                      # never-driver-green first
    0 if n in ORACLE else 1,         # SQL-backed before rows-only
    names.index(n)))

con = duck_con(SF)
todo = [n for n in order if n not in results]
print(f"sweep: {len(todo)} to run ({len(results)} already recorded), sf={SF}",
      flush=True)

for idx, name in enumerate(todo):
    t0 = time.time()
    try:
        res = to_pdf(QUERIES[name](SF))
        tray = time.time() - t0
        n_rows = len(res)
        status = "rows-only"
        if name in ORACLE:
            t1 = time.time()
            b = canon(con.execute(ORACLE[name]).fetchdf())
            tsql = time.time() - t1
            a = canon(res)
            status = "OK"
            if list(a.columns) != list(b.columns):
                status = f"SCHEMA {list(a.columns)} != {list(b.columns)}"
            elif len(a) != len(b):
                status = f"ROWS {len(a)} != {len(b)}"
            else:
                for col in a.columns:
                    av, bv = a[col].to_numpy(), b[col].to_numpy()
                    if av.dtype.kind == "f" or bv.dtype.kind == "f":
                        if not np.array_equal(av.astype(np.float64),
                                              bv.astype(np.float64),
                                              equal_nan=True):
                            status = f"VALUES {col}"
                            break
                    elif not (pd.Series(av).fillna("\0")
                              == pd.Series(bv).fillna("\0")).all():
                        status = f"VALUES {col}"
                        break
        else:
            tsql = 0.0
        dt = time.time() - t0
        mark = "OK" if status in ("OK", "rows-only") else "FAIL"
        results[name] = {"status": status, "rows": n_rows,
                         "ray_sec": round(tray, 2), "sql_sec": round(tsql, 2)}
        print(f"[{idx+1}/{len(todo)}] {mark:4s} {name:32s} ray={tray:6.2f}s "
              f"sql={tsql:6.2f}s rows={n_rows} {status}", flush=True)
    except Exception as e:
        results[name] = {"status": f"ERROR {type(e).__name__}: {str(e)[:200]}",
                         "sec": round(time.time() - t0, 2)}
        print(f"[{idx+1}/{len(todo)}] FAIL {name:32s} ERROR "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        traceback.print_exc(limit=2)
    with open(OUT + ".tmp", "w") as f:
        json.dump(results, f, indent=1)
    os.replace(OUT + ".tmp", OUT)

n_ok = sum(1 for r in results.values()
           if r["status"] in ("OK", "rows-only"))
print(json.dumps({"ok": n_ok, "fail": len(results) - n_ok,
                  "total": len(results)}))
ray.shutdown()
