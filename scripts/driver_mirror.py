"""Mirror the driver's CORRECTNESS check: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (rowcount + schema +
order-insensitive values). Prints one line per query + a summary."""

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import ray  # noqa: E402

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from tests.oracle_util import canon, duck_con, to_pdf  # noqa: E402
from whitebox_tools_ray.pipelines.queries import ORACLE, QUERIES  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duck_con(SF)
ok = bad = 0
results = {}
for name in sorted(QUERIES):
    t0 = time.time()
    try:
        res = to_pdf(QUERIES[name](SF))
        n = len(res)
        if name in ORACLE:
            import numpy as np
            import pandas as pd

            a = canon(res)
            b = canon(con.execute(ORACLE[name]).fetchdf())
            status = "OK"
            if list(a.columns) != list(b.columns):
                status = f"SCHEMA {list(a.columns)} != {list(b.columns)}"
            elif len(a) != len(b):
                status = f"ROWS {len(a)} != {len(b)}"
            else:
                for col in a.columns:
                    av, bv = a[col].to_numpy(), b[col].to_numpy()
                    if av.dtype.kind == "f" or bv.dtype.kind == "f":
                        if not np.array_equal(av.astype(np.float64), bv.astype(np.float64),
                                              equal_nan=True):
                            status = f"VALUES {col}"
                            break
                    elif not (pd.Series(av).fillna("\0") == pd.Series(bv).fillna("\0")).all():
                        status = f"VALUES {col}"
                        break
        else:
            status = "rows-only"
        dt = time.time() - t0
        mark = "OK" if status in ("OK", "rows-only") else "FAIL"
        if mark == "OK":
            ok += 1
        else:
            bad += 1
        results[name] = {"status": status, "rows": n, "sec": round(dt, 2)}
        print(f"{mark:4s} {name:28s} {dt:6.2f}s rows={n} {status}", flush=True)
    except Exception as e:
        bad += 1
        results[name] = {"status": f"ERROR {type(e).__name__}", "sec": round(time.time() - t0, 2)}
        print(f"FAIL {name:28s} ERROR {type(e).__name__}: {str(e)[:100]}", flush=True)
        traceback.print_exc(limit=2)

print(json.dumps({"ok": ok, "fail": bad, "total": len(QUERIES)}))
ray.shutdown()
