import sys
import time

import ray

ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
from whitebox_tools_ray.pipelines.queries import QUERIES  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.001"
names = [a for a in sys.argv[1:] if "/" not in a] or list(QUERIES)
for name in names:
    t0 = time.time()
    try:
        res = QUERIES[name](SF)
        import ray.data

        n = res.count() if isinstance(res, ray.data.Dataset) else len(res)
        print(f"{name:28s} {time.time() - t0:7.2f}s rows={n}", flush=True)
    except Exception as e:
        print(f"{name:28s} ERR {type(e).__name__}: {str(e)[:150]}", flush=True)
ray.shutdown()
