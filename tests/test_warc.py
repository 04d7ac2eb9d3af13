"""WARC container round-trips + parse edge cases (sources/warc.py)."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.sources.warc import (read_warc_records, write_warc,
                                             read_warc_ds)


def _recs(n=40, payload_extra=b""):
    return [(i, f"https://site{i % 7}.example/{i}",
             f"2024-01-{(i % 27) + 1:02d}T00:00:00Z",
             (f"<html>page {i}</html>").encode() + payload_extra)
            for i in range(n)]


def test_roundtrip_plain(tmp_path):
    p = str(tmp_path / "a.warc")
    recs = _recs()
    write_warc(p, recs)
    df = read_warc_records(p)
    assert len(df) == len(recs)
    for (pid, url, ts, payload), row in zip(recs, df.itertuples()):
        assert row.page_id == pid and row.url == url
        assert row.warc_date == ts
        assert row.content_len == len(payload)
        assert row.payload == payload


def test_roundtrip_gzip_members(tmp_path):
    p = str(tmp_path / "a.warc.gz")
    recs = _recs(25)
    write_warc(p, recs, gzip_members=True)
    # standard gunzip must accept the concatenated members
    import gzip

    with gzip.open(p, "rb") as f:
        raw = f.read()
    assert raw.startswith(b"WARC/1.0\r\n")
    df = read_warc_records(p)
    assert len(df) == 25
    assert (df["payload"].map(len).to_numpy() ==
            df["content_len"].to_numpy()).all()


def test_payload_with_crlf_inside(tmp_path):
    # Content-Length framing must survive CRLFCRLF sequences in the body
    p = str(tmp_path / "b.warc")
    recs = _recs(5, payload_extra=b"\r\n\r\nWARC/1.0\r\n\r\n")
    write_warc(p, recs)
    df = read_warc_records(p)
    assert len(df) == 5
    assert all(df["payload"].iloc[i].endswith(b"WARC/1.0\r\n\r\n")
               for i in range(5))


def test_malformed_rejected(tmp_path):
    p = str(tmp_path / "c.warc")
    with open(p, "wb") as f:
        f.write(b"NOT A WARC\r\n\r\nmore")
    with pytest.raises(ValueError):
        read_warc_records(p)


def test_read_warc_ds_parallel(tmp_path, ray_session):
    paths = []
    for s in range(3):
        p = str(tmp_path / f"s{s}.warc.gz")
        write_warc(p, [(s * 100 + i, f"u{s}/{i}", "2024-01-01T00:00:00Z",
                        b"x" * (i + 1)) for i in range(10)],
                   gzip_members=True)
        paths.append(p)
    df = read_warc_ds(paths, columns=["page_id", "content_len"]) \
        .to_pandas().sort_values("page_id")
    assert len(df) == 30
    want = sorted([s * 100 + i for s in range(3) for i in range(10)])
    assert df["page_id"].to_list() == want
    assert df["content_len"].to_list() == [i % 100 + 1 for i in want]
