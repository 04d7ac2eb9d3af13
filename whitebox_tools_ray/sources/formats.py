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
