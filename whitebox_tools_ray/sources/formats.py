"""Alternate source/sink formats (IO family: CsvPointsToVector,
ExportTableToCsv, HTML report sinks — data_tools/*.rs,
math_stat_analysis/zonal_statistics.rs report writer)."""

from __future__ import annotations

import os

import ray.data


def export_csv(ds: ray.data.Dataset, out_dir: str) -> str:
    """ExportTableToCsv analog: parquet-backed dataset -> CSV directory."""
    ds.write_csv(out_dir)
    return out_dir


def read_csv_points(path: str) -> ray.data.Dataset:
    """CsvPointsToVector analog: CSV -> Dataset (schema inferred by Arrow)."""
    return ray.data.read_csv(path)


def write_html_report(title: str, rows: list[dict], out_path: str) -> str:
    """HTML stats-report sink (the reference writes per-tool HTML reports,
    e.g. zonal_statistics.rs BufWriter): a small aggregate rendered to a
    single file."""
    cols = list(rows[0].keys()) if rows else []
    body = "\n".join(
        "<tr>" + "".join(f"<td>{r[c]}</td>" for c in cols) + "</tr>" for r in rows
    )
    html = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title></head><body><h1>{title}</h1>"
        "<table border='1'><thead><tr>"
        + "".join(f"<th>{c}</th>" for c in cols)
        + f"</tr></thead><tbody>{body}</tbody></table></body></html>"
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    return out_path


# --------------------------------------------------------------------------
# JSONL (one JSON object per line) — the lingua franca of LLM-corpus interchange
# --------------------------------------------------------------------------

def write_jsonl(path: str, df) -> None:
    """Write a DataFrame as JSONL with full JSON string escaping (the
    standard library encoder: quotes, backslashes, control chars, and
    non-ASCII passed through as UTF-8 — ensure_ascii=False matches what
    production corpus tooling emits)."""
    import json

    cols = list(df.columns)
    with open(path, "w", encoding="utf-8") as f:
        for row in df.itertuples(index=False):
            f.write(json.dumps(dict(zip(cols, row)), ensure_ascii=False,
                               separators=(",", ":")) + "\n")


def read_jsonl_records(path: str):
    """Parse one JSONL shard -> DataFrame (column order = first record's
    key order)."""
    import json

    import pandas as pd

    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return pd.DataFrame(rows)


def read_jsonl_ds(paths: list[str], *, columns=None):
    """Dataset over JSONL shards, one read task per file (same parallel
    unit as the WARC reader — corpus interchange ships many shards)."""
    import pandas as pd
    import ray.data

    def load(batch: pd.DataFrame) -> pd.DataFrame:
        frames = [read_jsonl_records(p) for p in batch["path"]]
        df = pd.concat(frames, ignore_index=True)
        return df[columns] if columns else df

    files = ray.data.from_pandas(pd.DataFrame({"path": paths})) \
        .repartition(max(1, len(paths)))
    return files.map_batches(load, batch_format="pandas", batch_size=1)
