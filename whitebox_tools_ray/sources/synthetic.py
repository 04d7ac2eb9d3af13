"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md).

Schema matches the north-rule input hint exactly:
    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)
plus derived (lon, lat) float64 with a 20% hot-cell skew component (5 urban
boxes) to exercise skew handling.

Everything is a pure function of (seed, row index) via splitmix64 mixing, so
any shard of rows can be generated independently on any worker: generation
itself is a Ray Data pipeline (``range(n) -> map_batches(GenPages)``), and
re-runs at any parallelism produce byte-identical rows. The ``text`` column
is the ground truth for the extract_text kernel: it is computed by applying
functions.extract_html.extract_text_one to the generated html, making the
byte-identical-per-url invariant testable end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.extract_html import extract_text_one

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 (public-domain mixing constants)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + _U64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z

VOCAB = np.array(
    [f"{a}{b}" for a in ("lor", "ipsu", "dat", "ter", "aqu", "mont", "vil", "cas",
                         "fer", "sol", "mar", "pla", "gra", "tor", "ben", "cor")
     for b in ("em", "um", "ia", "os", "eta", "ino", "ara", "ent",
               "ora", "ille", "ak", "un", "ese", "ol", "ity", "ane")],
    dtype=object,
)  # 256 deterministic word-like tokens

LANGS = np.array(["en", "de", "fr", "zh", ""], dtype=object)
LANG_CUM = np.array([60, 70, 80, 90, 100])  # en .6, de/fr/zh .1, '' .1

# 5 "urban" hot boxes (lon, lat, half-width) — 20% of rows land here
HOT_BOXES = np.array([
    [-74.0, 40.7], [2.35, 48.85], [139.7, 35.7], [-0.13, 51.5], [116.4, 39.9],
])
HOT_HALF = 0.5


def _filler(h: np.ndarray, i: int) -> str:
    """Deterministic word sequence for row hash h[i] (20..199 words)."""
    n = int(20 + h[i] % _U64(180))
    idx = splitmix64(np.arange(n, dtype=np.uint64) + h[i]) % _U64(len(VOCAB))
    return " ".join(VOCAB[idx.astype(np.int64)])


def gen_pages(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Generate the pages rows for the given row indices (any order/shard)."""
    ids = np.asarray(ids, np.int64)
    h = splitmix64(ids.astype(np.uint64) + _U64(seed) * _U64(0x9E3779B97F4A7C15))
    n = len(ids)

    site = (h % _U64(10000)).astype(np.int64)
    urls = pd.Series(site).map(lambda s: f"https://site{s}.example") + \
        pd.Series(ids).map(lambda i: f"/{i}")

    ts = pd.to_datetime(1735689600_000000 + (h % _U64(31_536_000)).astype(np.int64) * 1_000_000,
                        unit="us")

    lang = LANGS[np.searchsorted(LANG_CUM, (h % _U64(100)).astype(np.int64), side="right")]

    edge = (h % _U64(100)).astype(np.int64)
    htmls = np.empty(n, object)
    for k in range(n):
        body = _filler(h, k)
        e = edge[k]
        if e == 0:  # empty body
            html = f"<html><head><title>T{ids[k]}</title></head><body></body></html>"
        elif e == 1:  # broken/unclosed tag survives literally
            html = (f"<html><head><title>T{ids[k]}</title></head>"
                    f"<body><p>{body}</p><p broken</body></html>")
        elif e == 2:  # script block must be removed wholesale
            html = (f"<html><head><title>T{ids[k]}</title></head>"
                    f"<body><script>var x = 1 < 2;</script><p>{body}</p></body></html>")
        elif e == 3:  # nested inline tags + extra whitespace
            html = (f"<html><head><title>T{ids[k]}</title></head>"
                    f"<body>  <div><b><i>{body}</i></b></div>\n\t</body></html>")
        else:
            html = (f"<html><head><title>T{ids[k]}</title></head>"
                    f"<body><p>{body}</p></body></html>")
        htmls[k] = html

    texts = np.array([extract_text_one(s) for s in htmls], object)

    # lon/lat: area-uniform from independent mixes; 20% remapped to hot boxes
    hx = splitmix64(h + _U64(1))
    hy = splitmix64(h + _U64(2))
    lon = (hx % _U64(1 << 32)).astype(np.float64) / float(1 << 32) * 360.0 - 180.0
    frac = (hy % _U64(1 << 32)).astype(np.float64) / float(1 << 32)
    lat = np.degrees(np.arcsin(2.0 * frac - 1.0))
    lat = np.clip(lat, -85.0, 85.0)
    hot = (h % _U64(5)) == 0  # 20%
    box = (splitmix64(h + _U64(3)) % _U64(len(HOT_BOXES))).astype(np.int64)
    jx = ((splitmix64(h + _U64(4)) % _U64(1 << 20)).astype(np.float64) / float(1 << 20) - 0.5) * 2 * HOT_HALF
    jy = ((splitmix64(h + _U64(5)) % _U64(1 << 20)).astype(np.float64) / float(1 << 20) - 0.5) * 2 * HOT_HALF
    lon = np.where(hot, HOT_BOXES[box, 0] + jx, lon)
    lat = np.where(hot, HOT_BOXES[box, 1] + jy, lat)

    return pd.DataFrame({
        "url": urls.to_numpy(object),
        "warc_ts": ts,
        "html": [s.encode("utf-8") for s in htmls],
        "text": texts,
        "lang": lang,
        "lon": lon,
        "lat": lat,
        "page_id": ids,
    })


class GenPages:
    def __init__(self, seed: int = 42):
        self.seed = seed

    def __call__(self, batch: dict) -> pd.DataFrame:
        return gen_pages(batch["id"], self.seed)


def pages_dataset(n_rows: int, seed: int = 42, *, blocks: int | None = None) -> ray.data.Dataset:
    """Distributed deterministic generation: range(n) -> map_batches(GenPages)."""
    ds = ray.data.range(n_rows, override_num_blocks=blocks or max(2, n_rows // 100_000))
    return ds.map_batches(GenPages, fn_constructor_kwargs={"seed": seed},
                          batch_format="numpy", batch_size=25_000, concurrency=(1, 16))


def write_pages_corpus(out_dir: str, n_rows: int, seed: int = 42) -> None:
    """Materialize the corpus once (used by bench --scaling; both parallelism
    levels then read the same files)."""
    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")), ("html", pa.binary()),
        ("text", pa.string()), ("lang", pa.string()),
        ("lon", pa.float64()), ("lat", pa.float64()), ("page_id", pa.int64()),
    ])
    pages_dataset(n_rows, seed).map_batches(
        lambda df: pa.Table.from_pandas(df, schema=schema, preserve_index=False),
        batch_format="pandas",
    ).write_parquet(out_dir)
