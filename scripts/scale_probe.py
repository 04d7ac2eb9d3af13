import os
import sys
import time

import numpy as np
import pyarrow as pa
import ray

ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
from whitebox_tools_ray.functions.extract_html import ExtractText  # noqa: E402
from whitebox_tools_ray.layers import builtin_polygons  # noqa: E402
from whitebox_tools_ray.pipelines.queries_spatial import GRID1  # noqa: E402
from whitebox_tools_ray.stages.spatial_join import clip_points  # noqa: E402

CORPUS = "/tmp/wbt_pages_corpus"
files = [os.path.join(CORPUS, f) for f in sorted(os.listdir(CORPUS)) if f.endswith(".parquet")]
size = sum(os.path.getsize(f) for f in files)
blocks = max(8, min(1024, size // (32 * 1024 * 1024) + 1))
print("corpus MB", size // 2**20, "blocks", blocks, "files", len(files))


def stage(label, fn):
    t0 = time.time()
    n = fn()
    print(f"{label:24s} {time.time() - t0:7.2f}s  n={n}", flush=True)


def read_only():
    ds = ray.data.read_parquet(CORPUS, columns=["url", "page_id", "html", "lon", "lat"],
                               override_num_blocks=int(blocks))
    return ds.count()


def extract():
    ds = ray.data.read_parquet(CORPUS, columns=["url", "page_id", "html", "lon", "lat"],
                               override_num_blocks=int(blocks))
    ds = ds.map_batches(ExtractText, fn_constructor_kwargs={"out_col": "text"},
                        batch_format="pandas", batch_size=8192, concurrency=(1, 24))
    ds = ds.map_batches(lambda t: t.select(["url", "page_id", "text", "lon", "lat"]),
                        batch_format="pyarrow")
    return ds.count()


def extract_clip_enc():
    ds = ray.data.read_parquet(CORPUS, columns=["url", "page_id", "html", "lon", "lat"],
                               override_num_blocks=int(blocks))
    ds = ds.map_batches(ExtractText, fn_constructor_kwargs={"out_col": "text"},
                        batch_format="pandas", batch_size=8192, concurrency=(1, 24))
    ds = ds.map_batches(lambda t: t.select(["url", "page_id", "text", "lon", "lat"]),
                        batch_format="pyarrow")
    kept = clip_points(ds, builtin_polygons(), x_col="lon", y_col="lat", concurrency=(1, 24))

    def enc(t: pa.Table) -> pa.Table:
        x = t["lon"].to_numpy(zero_copy_only=False)
        y = t["lat"].to_numpy(zero_copy_only=False)
        row = GRID1.row_from_y(y)
        col = GRID1.col_from_x(x)
        return t.append_column("cell_id", pa.array(GRID1.cell_id(row, col))) \
                .append_column("tile_id", pa.array(GRID1.tile_id(row, col)))

    return kept.map_batches(enc, batch_format="pyarrow").count()


def full_write():
    import shutil
    out = f"/tmp/probe_out_{ncpu}"
    shutil.rmtree(out, ignore_errors=True)
    ds = ray.data.read_parquet(CORPUS, columns=["url", "page_id", "html", "lon", "lat"],
                               override_num_blocks=int(blocks))
    ds = ds.map_batches(ExtractText, fn_constructor_kwargs={"out_col": "text"},
                        batch_format="pandas", batch_size=8192, concurrency=(1, 24))
    ds = ds.map_batches(lambda t: t.select(["url", "page_id", "text", "lon", "lat"]),
                        batch_format="pyarrow")
    kept = clip_points(ds, builtin_polygons(), x_col="lon", y_col="lat", concurrency=(1, 24))

    def enc(t: pa.Table) -> pa.Table:
        x = t["lon"].to_numpy(zero_copy_only=False)
        y = t["lat"].to_numpy(zero_copy_only=False)
        row = GRID1.row_from_y(y)
        col = GRID1.col_from_x(x)
        return t.append_column("cell_id", pa.array(GRID1.cell_id(row, col))) \
                .append_column("tile_id", pa.array(GRID1.tile_id(row, col)))

    kept.map_batches(enc, batch_format="pyarrow").write_parquet(out, partition_cols=["tile_id"])
    return "written"


stage("read_only", read_only)
stage("extract", extract)
stage("extract_clip_enc", extract_clip_enc)
stage("full_write", full_write)
ray.shutdown()
