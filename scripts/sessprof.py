import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
from whitebox_tools_ray.sources.tables import read_table

SF = "/root/testdata/sf0.1"

t0 = time.time()
ds = read_table(SF, "events", columns=["user_id", "event_id", "ts"])
print("count:", ds.count(), round(time.time() - t0, 2))

t0 = time.time()
n = read_table(SF, "events", columns=["user_id", "event_id", "ts"]).sort("user_id").count()
print("sort:", round(time.time() - t0, 2))

t0 = time.time()
n = read_table(SF, "events", columns=["user_id", "event_id", "ts"]) \
    .groupby("user_id").map_groups(lambda g: g.head(1), batch_format="pandas").count()
print("groupby.map_groups head:", round(time.time() - t0, 2))


def sess(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"])
    us = g["ts"].astype("int64").to_numpy()
    gap = np.diff(us, prepend=us[0] - 1_800_000_001) > 1_800_000_000
    sid = np.cumsum(gap).astype(np.int64)
    out = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "session_idx": sid,
                        "event_id": g["event_id"].to_numpy()})
    agg = out.groupby(["user_id", "session_idx"], sort=False).agg(
        n=("event_id", "size"), first_event=("event_id", "min")).reset_index()
    return agg


t0 = time.time()
n = read_table(SF, "events", columns=["user_id", "event_id", "ts"]) \
    .groupby("user_id").map_groups(sess, batch_format="pandas").count()
print("full sessionize:", round(time.time() - t0, 2), n)
ray.shutdown()
