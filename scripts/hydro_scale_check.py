"""10x-grid hydro scale check: 1700x3600 = 6.12M cells, driver RSS tracked.

Round-3: input pointer generation is materialized untimed (it is test-input
prep, not the engine) and the shard pool is warmed with one untimed run, so
the timed numbers measure load + algorithm + result — the steady-state cost
of a long-lived engine. Pass --grid100 for the 100x (5400x11400 = 61.6M
cell) variant.
"""
import ray, sys, time, os, resource
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # THP faults ~30x slow here
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR",
         runtime_env={"env_vars": {"NUMPY_MADVISE_HUGEPAGE": "0"}})
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd, ray.data
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from whitebox_tools_ray.grid import GridSpec
from whitebox_tools_ray.stages.pregel import (ShardedGraph,
    cost_distance_pregel, fd8_accumulation_pregel, fill_depressions_pregel,
    flow_accumulation_pregel, isobasins_pregel)
from whitebox_tools_ray.stages.flow import tile_of_expr

def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

if "--grid100" in sys.argv:
    G = GridSpec(west=-180.0, north=85.0, res_x=0.1, res_y=0.1, rows=5400, cols=11400)
else:
    G = GridSpec(west=-180.0, north=85.0, res_x=0.1, res_y=0.1, rows=1700, cols=3600)
n = G.rows * G.cols
print("cells:", n, "driver RSS before:", rss_mb(), "MB", flush=True)

# deterministic D8 pointers, generated DISTRIBUTED (never a driver array):
# strictly-decreasing surface z = (cell*2654435761)%1e9 with down = lowest
# of 8 neighbors if lower else outlet — computed per batch.
def gen(batch):
    cid = batch["id"].astype(np.int64)
    r, c = cid // G.cols, cid % G.cols
    def z(i):
        return (i * 2654435761) % 1000000007
    best = np.full(len(cid), -1, np.int64)
    bz = z(cid)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0: continue
            nr, nc = r + dr, c + dc
            ok = (nr >= 0) & (nr < G.rows) & (nc >= 0) & (nc < G.cols)
            u = np.where(ok, nr * G.cols + nc, 0)
            uz = np.where(ok, z(u), np.iinfo(np.int64).max)
            m = uz < bz
            best = np.where(m, u, best)
            bz = np.where(m, uz, bz)
    return pd.DataFrame({"cell_id": cid, "down_id": best,
                         "tile": tile_of_expr(cid, G, 64)})

t0 = time.time()
dds = ray.data.range(n, override_num_blocks=64).map_batches(gen, batch_format="numpy").materialize()
print("input gen+materialize (untimed prep):", round(time.time()-t0, 1), "s", flush=True)

# untimed warm-up: spawns the shard pool for this grid key (a long-lived
# engine pays actor spawn once, not per job)
warm = ray.data.from_pandas(pd.DataFrame({
    "cell_id": np.arange(1000, dtype=np.int64),
    "down_id": np.full(1000, -1, np.int64),
    "tile": tile_of_expr(np.arange(1000, dtype=np.int64), G, 64)})).repartition(2)
flow_accumulation_pregel(warm, G, tile=64, n_shards=16).count()

# ONE distributed load serves all three algorithms (ShardedGraph)
t0 = time.time()
g = ShardedGraph(dds, G, tile=64, n_shards=16)
print(f"graph load wall {time.time()-t0:.1f} s; RSS {rss_mb()} MB", flush=True)

t0 = time.time()
acc = g.accumulation()
n_out = acc.count()
s = acc.map_batches(lambda df: pd.DataFrame({"s": [int(df["acc"].sum())]}), batch_format="pandas").sum("s")
dt = time.time() - t0
print(f"flow_acc rows {n_out} sum {s} wall {dt:.1f} s = {n/dt/1e6:.2f}M cells/s; RSS {rss_mb()} MB", flush=True)
# invariant: sum of acc = sum over cells of path length = total visits; every cell visited >= 1 -> rows == n
assert n_out == n
t0 = time.time()
nb = g.basins().count()
dt = time.time() - t0
print(f"basins rows {nb} wall {dt:.1f} s = {n/dt/1e6:.2f}M cells/s; RSS {rss_mb()} MB", flush=True)
assert nb == n
t0 = time.time()
nf = g.flowpath_length().count()
dt = time.time() - t0
print(f"flowpath rows {nf} wall {dt:.1f} s = {n/dt/1e6:.2f}M cells/s; RSS {rss_mb()} MB", flush=True)
assert nf == n
g.close()

# round-4: the formerly dict-state interiors, vectorized (CSR waves / dense
# label-correcting relax). Each row reports cells/sec for comparison against
# the D8 flow-accum number above.
def zf(i):
    i = np.asarray(i, np.int64)
    return (i * 2654435761) % 1000000007

t0 = time.time()
nfd8 = fd8_accumulation_pregel(zf, G, tile=64, n_shards=16).count()
dt = time.time() - t0
print(f"fd8_acc rows {nfd8} wall {dt:.1f} s = {n/dt/1e6:.2f}M cells/s; RSS {rss_mb()} MB", flush=True)
assert nfd8 == n

t0 = time.time()
def costf(i):
    i = np.asarray(i, np.int64)
    return 1 + (i * 11400714819323198485 % 97).astype(np.int64)
src = np.arange(0, n, max(1, n // 64), dtype=np.int64)
ncd = cost_distance_pregel(costf, src, G, tile=64, n_shards=16).count()
dt = time.time() - t0
print(f"cost_dist rows {ncd} wall {dt:.1f} s = {n/dt/1e6:.2f}M cells/s; RSS {rss_mb()} MB", flush=True)
assert ncd == n

t0 = time.time()
nfl = fill_depressions_pregel(zf, G, tile=64, n_shards=16).count()
dt = time.time() - t0
print(f"fill_depr rows {nfl} wall {dt:.1f} s = {n/dt/1e6:.2f}M cells/s; RSS {rss_mb()} MB", flush=True)
assert nfl == n

t0 = time.time()
niso = isobasins_pregel(dds, G, max(2, n // 1000), tile=64, n_shards=16).count()
dt = time.time() - t0
print(f"isobasins outlets {niso} wall {dt:.1f} s = {n/dt/1e6:.2f}M cells/s; RSS {rss_mb()} MB", flush=True)

print("DONE; final driver RSS", rss_mb(), "MB", flush=True)
ray.shutdown()
