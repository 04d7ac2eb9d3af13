"""Run the driver-mirror comparison for a SUBSET of queries, named on the
command line:  python scripts/check_subset.py q1 q2 ...  (sf dir via
$GRAFT_SF_DIR, default sf0.01)."""

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import ray  # noqa: E402

ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from tests.oracle_util import canon, duck_con, to_pdf  # noqa: E402
from whitebox_tools_ray.pipelines.queries import ORACLE, QUERIES  # noqa: E402

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
con = duck_con(SF)
ok = bad = 0
for name in sys.argv[1:]:
    t0 = time.time()
    try:
        res = to_pdf(QUERIES[name](SF))
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
                    if av.dtype != bv.dtype:
                        status = f"DTYPE {col} {av.dtype} != {bv.dtype}"
                        break
                    if av.dtype.kind == "f":
                        if not np.array_equal(av, bv, equal_nan=True):
                            status = f"VALUES {col}"
                            break
                    elif not (pd.Series(av).fillna("\0") == pd.Series(bv).fillna("\0")).all():
                        status = f"VALUES {col}"
                        break
        else:
            status = f"rows-only ({len(res)} rows)"
    except Exception:
        status = "ERR " + traceback.format_exc(limit=3).replace("\n", " | ")[:300]
    mark = "OK" if status.startswith(("OK", "rows-only")) else "FAIL"
    ok += mark == "OK"
    bad += mark != "OK"
    print(f"{mark:4s} {name:32s} {time.time() - t0:6.1f}s  {status}")

print(f"\n{ok} ok / {bad} bad")
ray.shutdown()
sys.exit(1 if bad else 0)
