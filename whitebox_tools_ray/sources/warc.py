"""WARC (Web ARChive, ISO 28500) reader/writer — Common Crawl's native
container. Public-spec from-scratch implementation: WARC/1.0 response
records with CRLF header blocks, Content-Length-delimited payloads, and
the CC convention of one gzip MEMBER per record in ``.warc.gz`` (so a
standard gunzip sees a valid concatenated stream and a reader can resume
at any member boundary).

Parallelism model is the Common-Crawl one: the FILE is the parallel unit
(a crawl ships tens of thousands of ~1 GB warc files); ``read_warc_ds``
schedules one Ray task per shard. Record IDs are deterministic
(``<urn:graft:{page_id}>``) — no wall-clock or RNG in the writer, so
shards are resumable/retry-idempotent like the parquet sinks.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd


def write_warc(path: str, records: list[tuple[int, str, str, bytes]],
               *, gzip_members: bool = False) -> None:
    """Write WARC/1.0 response records: (page_id, url, iso_ts, payload)."""
    out = []
    for page_id, url, ts, payload in records:
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: response\r\n"
               f"WARC-Record-ID: <urn:graft:{page_id}>\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts}\r\n"
               f"Content-Length: {len(payload)}\r\n"
               f"\r\n").encode("utf-8")
        rec = hdr + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip member
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    with open(path, "wb") as f:
        f.write(b"".join(out))


def _split_members(data: bytes) -> list[bytes]:
    """Decompress a concatenated-gzip-members stream into raw records."""
    out = []
    while data:
        d = zlib.decompressobj(31)
        out.append(d.decompress(data))
        data = d.unused_data
    return out


def read_warc_records(path: str) -> pd.DataFrame:
    """Parse one WARC shard -> DataFrame(page_id, url, warc_date,
    content_len, payload). Handles plain and per-record-gzip files."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        chunks = _split_members(data)
    else:
        chunks = [data]
    ids, urls, dates, lens, payloads = [], [], [], [], []
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            end = chunk.find(b"\r\n\r\n", pos)
            if end < 0:
                break
            headers = {}
            lines = chunk[pos:end].decode("utf-8").split("\r\n")
            if not lines or not lines[0].startswith("WARC/"):
                raise ValueError(f"bad WARC record header at {pos}")
            for line in lines[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            n = int(headers["content-length"])
            body = chunk[end + 4:end + 4 + n]
            rid = headers.get("warc-record-id", "")
            ids.append(int(rid.split(":")[-1].rstrip(">"))
                       if rid.startswith("<urn:graft:") else -1)
            urls.append(headers.get("warc-target-uri", ""))
            dates.append(headers.get("warc-date", ""))
            lens.append(n)
            payloads.append(body)
            pos = end + 4 + n + 4  # skip the record-terminating CRLFCRLF
    return pd.DataFrame({
        "page_id": np.asarray(ids, np.int64),
        "url": np.asarray(urls, object),
        "warc_date": np.asarray(dates, object),
        "content_len": np.asarray(lens, np.int64),
        "payload": np.asarray(payloads, object),
    })


def read_warc_ds(paths: list[str], *, columns: list[str] | None = None):
    """Dataset over WARC shards, one read task per file (the CC layout:
    parallelism = shard count; a shard streams record-by-record)."""
    import ray.data

    def load(batch: pd.DataFrame) -> pd.DataFrame:
        frames = [read_warc_records(p) for p in batch["path"]]
        df = pd.concat(frames, ignore_index=True)
        return df[columns] if columns else df

    files = ray.data.from_pandas(pd.DataFrame({"path": paths})) \
        .repartition(max(1, len(paths)))
    return files.map_batches(load, batch_format="pandas", batch_size=1)
