"""Driver for the two-node deployment check — run by two_node_check.py
against an already-started 2-node cluster (address 127.0.0.1:6379), then
re-run standalone single-node for parity. Verifies, on a REAL multi-raylet
cluster, the assumptions MULTINODE.md records:

  * Dataset blocks + broadcast ObjectRefs flow across nodes (flagship
    pages: extract -> broadcast clip -> tile write -> inline rollup), with
    map tasks observed on BOTH nodes;
  * SPREAD-placed named Pregel shard actors land on both nodes and are
    addressable via ray.get_actor from tasks on the other node
    (ShardedGraph accumulation + priority-flood fill);
  * results are bit-identical to a single-node run of the same inputs.
"""
import collections
import json
import os
import shutil
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import ray
import ray.data

N_PAGES = 200_000


def make_pointer_ds(G, n):
    from whitebox_tools_ray.stages.flow import tile_of_expr

    def gen(batch):
        cid = batch["id"].astype(np.int64)
        r, c = cid // G.cols, cid % G.cols

        def z(i):
            return (i * 2654435761) % 1000000007

        best = np.full(len(cid), -1, np.int64)
        bz = z(cid)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                nr, nc = r + dr, c + dc
                ok = (nr >= 0) & (nr < G.rows) & (nc >= 0) & (nc < G.cols)
                u = np.where(ok, nr * G.cols + nc, 0)
                uz = np.where(ok, z(u), np.iinfo(np.int64).max)
                m = uz < bz
                best = np.where(m, u, best)
                bz = np.where(m, uz, bz)
        return pd.DataFrame({"cell_id": cid, "down_id": best,
                             "tile": tile_of_expr(cid, G, 64)})

    return ray.data.range(n, override_num_blocks=16).map_batches(
        gen, batch_format="numpy").materialize()


def run_engine(tag):
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from whitebox_tools_ray.grid import GridSpec
    from whitebox_tools_ray.pipelines.flagship import flagship_pages
    from whitebox_tools_ray.sources.synthetic import write_pages_corpus
    from whitebox_tools_ray.stages.pregel import (ShardedGraph,
                                                  fill_depressions_pregel)

    corpus = "/tmp/two_node/corpus"
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        shutil.rmtree(corpus, ignore_errors=True)
        write_pages_corpus(corpus, N_PAGES)
        open(os.path.join(corpus, "_DONE"), "w").close()
    out = f"/tmp/two_node/out_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    h = flagship_pages(corpus, out, resume=False)
    head = {k: h[k] for k in ("n_docs", "n_kept", "n_tiles", "n_cells")}
    print(f"flagship {tag}:", json.dumps(head), flush=True)

    # which nodes did Dataset map tasks run on? (self-reported node ids)
    seen = ray.data.range(20000, override_num_blocks=40).map_batches(
        lambda b: pd.DataFrame(
            {"node": [ray.get_runtime_context().get_node_id()]}),
        batch_format="pandas").to_pandas()["node"].unique()
    print(f"dataset task nodes ({tag}):", len(seen), flush=True)

    G = GridSpec(west=-180.0, north=85.0, res_x=0.1, res_y=0.1,
                 rows=680, cols=1440)
    n = G.rows * G.cols
    ptr = make_pointer_ds(G, n)
    g = ShardedGraph(ptr, G, tile=64, n_shards=4)
    shard_nodes = collections.Counter(
        ray.get([s.node_id.remote() for s in g.shards]))
    print(f"shard actor nodes ({tag}):", len(shard_nodes),
          dict(shard_nodes.most_common()), flush=True)
    acc = g.accumulation()
    acc_sum = int(acc.map_batches(
        lambda df: pd.DataFrame({"s": [int(df["acc"].sum())]}),
        batch_format="pandas").to_pandas()["s"].sum())
    g.close()

    def zf(i):
        i = np.asarray(i, np.int64)
        return (i * 2654435761) % 1000000007

    fill = fill_depressions_pregel(zf, G, tile=64, n_shards=4)
    fill_sum = int(fill.map_batches(
        lambda df: pd.DataFrame({"s": [int(df["fill"].sum()) & 0x7FFFFFFF]}),
        batch_format="pandas").to_pandas()["s"].sum())
    # round-5 graph family: iterative join/materialize rounds + the
    # session-memoized edge list, across both nodes' object stores
    from whitebox_tools_ray import memo
    from whitebox_tools_ray.pipelines.queries_curation import \
        link_pagerank_fixedpoint

    memo.clear()  # force re-extraction inside THIS cluster
    pr = link_pagerank_fixedpoint("").to_pandas()
    pr_sum = int(pr["mass"].sum())
    print(f"{tag}: acc_sum={acc_sum} fill_sum={fill_sum} "
          f"pagerank_sum={pr_sum}", flush=True)
    return {"head": head, "acc_sum": acc_sum, "fill_sum": fill_sum,
            "pr_sum": pr_sum,
            "task_nodes": len(seen), "shard_nodes": len(shard_nodes)}


def main():
    ray.init(address="127.0.0.1:6379", namespace="wbt",
             logging_level="ERROR")
    alive = [x for x in ray.nodes() if x["Alive"]]
    assert len(alive) == 2, f"expected 2 alive nodes, got {len(alive)}"
    two = run_engine("2node")
    assert two["task_nodes"] == 2, "dataset tasks did not span both nodes"
    assert two["shard_nodes"] == 2, "SPREAD left all shard actors on one node"
    ray.shutdown()

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             namespace="wbt", logging_level="ERROR")
    one = run_engine("1node")
    ray.shutdown()

    assert two["head"] == one["head"], (two["head"], one["head"])
    assert two["acc_sum"] == one["acc_sum"]
    assert two["fill_sum"] == one["fill_sum"]
    assert two["pr_sum"] == one["pr_sum"]
    print("PARITY: 2-node == 1-node (flagship counts, D8 accumulation + "
          "priority-flood checksums, fixed-point PageRank)")


if __name__ == "__main__":
    main()
