import sys
import time

sys.path.insert(0, "/root/repo")
import ray  # noqa: E402

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
from whitebox_tools_ray.pipelines.queries import QUERIES  # noqa: E402

t0 = time.time()
n = QUERIES["minhash_near_dup"]("/root/testdata/sf0.01").count()
print("minhash self-join @8cpu:", round(time.time() - t0, 2), n)
ray.shutdown()
