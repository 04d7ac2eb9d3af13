import os
import sys
import time

import ray

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from whitebox_tools_ray.pipelines.queries import QUERIES  # noqa: E402

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
name = sys.argv[1]
t0 = time.time()
res = QUERIES[name](SF)
import ray.data  # noqa: E402

if isinstance(res, ray.data.Dataset):
    n = res.count()
    print(res.stats())
else:
    n = len(res)
print(f"{name}: {time.time() - t0:.2f}s rows={n}")
ray.shutdown()
