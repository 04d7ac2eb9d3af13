"""North-rule invariant: the flagship pipeline produces byte-identical
results at different num_cpus (fresh Ray processes), including identical
tile/cell assignments and extracted text per url."""

import json
import subprocess
import sys
import textwrap


def run_flagship(ncpu: int, tmp: str) -> dict:
    code = textwrap.dedent(f"""
        import sys, json, shutil
        sys.path.insert(0, "/root/repo")
        import ray
        ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from whitebox_tools_ray.sources.synthetic import write_pages_corpus
        from whitebox_tools_ray.pipelines.flagship import flagship_pages
        import os
        corpus = "{tmp}/corpus"
        if not os.path.exists(corpus):
            write_pages_corpus(corpus, 30000)
        out = "{tmp}/out_{ncpu}"
        shutil.rmtree(out, ignore_errors=True)
        res = flagship_pages(corpus, out, resume=False)
        # canonical content hash of the tiled output
        import pyarrow.parquet as pq, pyarrow as pa, hashlib, glob
        import pandas as pd
        frames = []
        for f in sorted(glob.glob(out + "/tiled/**/*.parquet", recursive=True)):
            tile = f.split("tile_id=")[1].split("/")[0]
            df = pq.read_table(f).to_pandas()
            df["tile_id"] = int(tile)
            frames.append(df)
        alldf = pd.concat(frames).sort_values("page_id").reset_index(drop=True)
        h = hashlib.sha256(pd.util.hash_pandas_object(alldf, index=False).values.tobytes()).hexdigest()
        print(json.dumps({{"rows": len(alldf), "hash": h,
                           "text_hash": hashlib.sha256("\\x00".join(alldf["text"]).encode()).hexdigest(),
                           "cells": int(alldf["cell_id"].sum())}}))
        ray.shutdown()
    """)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def test_flagship_invariant_across_num_cpus(tmp_path):
    a = run_flagship(2, str(tmp_path))
    b = run_flagship(4, str(tmp_path))
    assert a["rows"] == b["rows"] > 0
    assert a["hash"] == b["hash"]
    assert a["text_hash"] == b["text_hash"]
    assert a["cells"] == b["cells"]
