"""IVF ANN vs brute force: on clustered data the probe path must reach high
recall@k; the exact scorer guarantees precision of reported dots."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_on_clustered_data(tmp_path):
    from whitebox_tools_ray.pipelines.queries_text import ANN_NQ, ann_ivf_topk, ann_topk_dot

    rng = np.random.default_rng(21)
    n, dim, blobs = 1200, 32, 10
    centers = rng.standard_normal((blobs, dim)) * 4
    mat = np.vstack([centers[i % blobs] + rng.standard_normal(dim) * 0.4
                     for i in range(n)]).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(mat), "label": np.zeros(n, np.int32)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "embeddings.parquet"))

    brute = ann_topk_dot(str(tmp_path)).to_pandas()
    ivf = ann_ivf_topk(str(tmp_path)).to_pandas()

    recalls = []
    for q in range(ANN_NQ):
        want = set(brute.loc[brute.q_id == q, "vec_id"].astype(int))
        got = set(ivf.loc[ivf.q_id == q, "vec_id"].astype(int))
        recalls.append(len(want & got) / len(want))
        # every reported dot matches the exact brute-force dot for that pair
        bd = dict(zip(brute.loc[brute.q_id == q, "vec_id"].astype(int),
                      brute.loc[brute.q_id == q, "dot"].astype(int)))
        for r in ivf[ivf.q_id == q].itertuples():
            if int(r.vec_id) in bd:
                assert int(r.dot) == bd[int(r.vec_id)]
    assert np.mean(recalls) >= 0.9  # clustered data: probes cover the answers


@pytest.mark.usefixtures("ray_session")
def test_ivf_index_persisted_and_pruned(tmp_path):
    """The IVF index must persist (second run reuses it) and probe-time
    reads must touch only the probed partitions — read rows bounded by the
    manifest's per-list lineage rows, strictly fewer than the corpus."""
    import os

    from whitebox_tools_ray.pipelines.queries_text import (
        ann_ivf_index_dir,
        ann_ivf_topk,
    )
    from whitebox_tools_ray.state.checkpoint import read_manifest

    rng = np.random.default_rng(33)
    n, dim, blobs = 800, 32, 8
    centers = rng.standard_normal((blobs, dim)) * 4
    mat = np.vstack([centers[i % blobs] + rng.standard_normal(dim) * 0.4
                     for i in range(n)]).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(mat), "label": np.zeros(n, np.int32)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "embeddings.parquet"))

    ann_ivf_topk(str(tmp_path)).to_pandas()
    index_dir, sig = ann_ivf_index_dir(str(tmp_path), 16)
    m = read_manifest(index_dir)
    assert m["input_sig"] == sig and m["complete"]
    assert sum(int(v) for v in m["partitions"].values()) == n
    # hive layout on disk: one dir per inverted list
    lists = [d for d in os.listdir(index_dir) if d.startswith("list_id=")]
    assert len(lists) == len(m["partitions"]) >= 2
    mtime = os.path.getmtime(os.path.join(index_dir, "_MANIFEST.json"))

    # second run: index reused (manifest untouched), and the pruned read
    # (nprobe=1) covers at most ANN_NQ lists' rows — lineage-bounded
    out = ann_ivf_topk(str(tmp_path), nprobe=1).to_pandas()
    assert os.path.getmtime(os.path.join(index_dir, "_MANIFEST.json")) == mtime
    biggest = sorted((int(v) for v in m["partitions"].values()), reverse=True)
    max_rows_readable = sum(biggest[:8])  # <= ANN_NQ probed lists
    assert max_rows_readable < n  # pruning is real: can't have read it all
    assert len(out) > 0
