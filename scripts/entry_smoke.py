import importlib.util
import sys

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
res = m.entry()
print("entry rows:", res.count())
qs, osql = m.queries(), m.oracle_sql()
print(len(qs), "queries,", len(osql), "oracles")
assert set(osql) <= set(qs)
ray.shutdown()
