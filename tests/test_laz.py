"""LAZ (LASzip) codec: lossless round-trip across point formats, chunk
boundaries, adversarial value ranges, and the parallel Dataset reader.

No external .laz fixtures or lidar libraries exist in this sandbox, so
these tests pin the committed guarantees: bit-exact round-trip of every
field (including the k=32 corrector path, GPS-time full-resync and
sequence-switch paths), independent chunk decode, and container-layout
invariants (bit-7 format flag, laszip VLR, chunk table)."""

import os
import struct

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.sources.laz import (read_laz_chunk, read_laz_chunk_table,
                                            read_laz_ds, read_laz_header,
                                            read_laz_points, write_laz)

POINT_COLS = ("x_int", "y_int", "z_int", "intensity", "cls", "ret",
              "nret", "scan_angle", "psid")


def _df(n=4000, seed=7):
    rng = np.arange(n, dtype=np.int64) + seed
    nret = 1 + rng % 3
    return pd.DataFrame({
        "x_int": rng * 37 % 360000, "y_int": rng * 91 % 170000,
        "z_int": (rng * 53 % 20000) - 10000,
        "intensity": rng * 97 % 4096, "cls": rng % 7,
        "ret": 1 + (rng * 31) % nret, "nret": nret,
        "scan_angle": (rng * 13) % 41 - 20, "psid": rng % 4,
        "gps_time": rng.astype(np.float64) / 8.0})


def _assert_equal(back: pd.DataFrame, df: pd.DataFrame, gps: bool) -> None:
    for col in POINT_COLS:
        assert np.array_equal(back[col].to_numpy(), df[col].to_numpy()), col
    if gps:
        # compare bit patterns: NaN-safe and exact
        assert np.array_equal(back["gps_time"].to_numpy().view(np.uint64),
                              df["gps_time"].to_numpy().view(np.uint64))


@pytest.mark.parametrize("fmt", [0, 1])
def test_laz_roundtrip(tmp_path, fmt):
    df = _df()
    p = os.path.join(tmp_path, "t.laz")
    write_laz(p, df, point_format=fmt, chunk_size=1000)
    h = read_laz_header(p)
    assert h["point_format"] == fmt
    assert h["n_points"] == len(df)
    assert h["chunk_size"] == 1000
    assert len(h["items"]) == (2 if fmt == 1 else 1)
    _assert_equal(read_laz_points(p), df, gps=fmt == 1)


def test_header_marks_compression(tmp_path):
    p = os.path.join(tmp_path, "t.laz")
    write_laz(p, _df(100), point_format=1)
    with open(p, "rb") as f:
        hdr = f.read(227)
    assert hdr[104] & 0x80                       # compressed-format flag
    assert hdr[104] & 0x7F == 1
    (n_vlr,) = struct.unpack_from("<I", hdr, 100)
    assert n_vlr == 1


@pytest.mark.parametrize("n", [1, 2, 999, 1000, 1001, 2000, 2001])
def test_chunk_boundaries(tmp_path, n):
    df = _df(n)
    p = os.path.join(tmp_path, "t.laz")
    write_laz(p, df, point_format=1, chunk_size=1000)
    table = read_laz_chunk_table(p)
    assert len(table) == -(-n // 1000)
    _assert_equal(read_laz_points(p), df, gps=True)


def test_chunks_decode_independently(tmp_path):
    """Any single chunk decodes without touching the others (the parallel
    reader's contract)."""
    df = _df(3000)
    p = os.path.join(tmp_path, "t.laz")
    write_laz(p, df, point_format=1, chunk_size=1000)
    mid = read_laz_chunk(p, 1)
    _assert_equal(mid.reset_index(drop=True),
                  df.iloc[1000:2000].reset_index(drop=True), gps=True)


def test_empty_and_single(tmp_path):
    p = os.path.join(tmp_path, "e.laz")
    write_laz(p, _df(0), point_format=1)
    assert read_laz_header(p)["n_points"] == 0
    assert len(read_laz_points(p)) == 0
    p2 = os.path.join(tmp_path, "s.laz")
    df = _df(1)
    write_laz(p2, df, point_format=1)
    _assert_equal(read_laz_points(p2), df, gps=True)


def test_adversarial_extremes(tmp_path):
    """i32-extreme coordinate jumps (k=32 correctors), u16 extremes, the
    full scan-angle byte range, and every (ret, nret) context cell."""
    rs = np.random.RandomState(42)
    n = 3000
    nret = rs.randint(1, 8, n)
    df = pd.DataFrame({
        "x_int": rs.randint(-2**31, 2**31, n, dtype=np.int64),
        "y_int": rs.randint(-2**31, 2**31, n, dtype=np.int64),
        "z_int": rs.randint(-2**31, 2**31, n, dtype=np.int64),
        "intensity": rs.randint(0, 2**16, n),
        "cls": rs.randint(0, 256, n),
        "ret": 1 + rs.randint(0, 7, n) % np.maximum(nret, 1),
        "nret": nret,
        "scan_angle": rs.randint(-128, 128, n),
        "psid": rs.randint(0, 2**16, n),
        "gps_time": rs.randn(n) * 1e6})
    p = os.path.join(tmp_path, "x.laz")
    write_laz(p, df, point_format=1, chunk_size=700)
    _assert_equal(read_laz_points(p), df, gps=True)


def test_gps_time_sequences(tmp_path):
    """Two interleaved emitters with far-apart time bases force the
    GPS-time codec through its full-resync and sequence-switch paths."""
    n = 2000
    i = np.arange(n, dtype=np.float64)
    t = np.where(np.arange(n) % 2 == 0, 1.0e5 + i * 0.001, 9.0e8 + i * 0.25)
    df = _df(n)
    df["gps_time"] = t
    p = os.path.join(tmp_path, "g.laz")
    write_laz(p, df, point_format=1, chunk_size=512)
    _assert_equal(read_laz_points(p), df, gps=True)


def test_constant_and_sorted_streams(tmp_path):
    """Degenerate inputs: all-identical points, then a monotone walk (the
    unchanged/multi==1 hot paths)."""
    n = 1500
    df = pd.DataFrame({
        "x_int": np.full(n, 1234), "y_int": np.full(n, -99),
        "z_int": np.full(n, 7), "intensity": np.full(n, 55),
        "cls": np.full(n, 2), "ret": np.full(n, 1), "nret": np.full(n, 1),
        "scan_angle": np.full(n, -5), "psid": np.full(n, 9),
        "gps_time": np.full(n, 123.456)})
    p = os.path.join(tmp_path, "c.laz")
    write_laz(p, df, point_format=1, chunk_size=400)
    _assert_equal(read_laz_points(p), df, gps=True)

    i = np.arange(n, dtype=np.int64)
    df2 = pd.DataFrame({
        "x_int": i * 10, "y_int": i * 3, "z_int": i,
        "intensity": np.full(n, 100), "cls": np.full(n, 1),
        "ret": np.full(n, 1), "nret": np.full(n, 1),
        "scan_angle": np.full(n, 0), "psid": np.full(n, 1),
        "gps_time": i * 0.0001})
    p2 = os.path.join(tmp_path, "m.laz")
    write_laz(p2, df2, point_format=1, chunk_size=400)
    _assert_equal(read_laz_points(p2), df2, gps=True)
    # sorted walks should compress well below the raw record size
    assert os.path.getsize(p2) < n * 28 * 0.25


def test_compression_beats_raw(tmp_path):
    df = _df(5000)
    p = os.path.join(tmp_path, "t.laz")
    write_laz(p, df, point_format=1)
    assert os.path.getsize(p) < len(df) * 28 * 0.6


def test_read_laz_ds(tmp_path, ray_session):
    """Parallel Dataset reader over two files x three chunks."""
    d1, d2 = _df(2500, seed=3), _df(1700, seed=11)
    p1 = os.path.join(tmp_path, "a.laz")
    p2 = os.path.join(tmp_path, "b.laz")
    write_laz(p1, d1, point_format=1, chunk_size=1000)
    write_laz(p2, d2, point_format=1, chunk_size=1000)
    got = read_laz_ds([p1, p2]).to_pandas()
    assert len(got) == len(d1) + len(d2)
    exp = pd.concat([d1, d2], ignore_index=True)
    g = got.sort_values(["psid", "x_int", "y_int", "z_int", "gps_time"]).reset_index(drop=True)
    e = exp.sort_values(["psid", "x_int", "y_int", "z_int", "gps_time"]).reset_index(drop=True)
    for col in POINT_COLS + ("gps_time",):
        assert np.array_equal(g[col].to_numpy(), e[col].to_numpy()), col


def test_golden_fixture_bitstream(tmp_path):
    """A COMMITTED .laz file pins the bitstream across refactors: the
    decoder must read it bit-exact forever, and re-encoding its content
    must reproduce the identical bytes (the codec is deterministic). The
    round-trip tests alone cannot catch a symmetric encoder+decoder
    change that silently forks the format."""
    import hashlib

    golden = os.path.join(os.path.dirname(__file__), "fixtures",
                          "golden_pf1.laz")
    with open(golden, "rb") as f:
        blob = f.read()
    assert hashlib.sha256(blob).hexdigest() == \
        "6c1ee36edb9acbd1c43a944ee160f86c5ad6a384eda3aed0789f598b903478c8"
    df = _df(2000)
    _assert_equal(read_laz_points(golden), df, gps=True)
    p = os.path.join(tmp_path, "re.laz")
    write_laz(p, df, point_format=1, chunk_size=700)
    with open(p, "rb") as f:
        assert f.read() == blob


def test_read_las_ds_dispatches_laz(tmp_path, ray_session):
    """Mixed .las/.laz input through the one reader API (the reference's
    extension-dispatched read)."""
    from whitebox_tools_ray.sources.las import read_las_ds, write_las

    d1, d2 = _df(800, seed=3), _df(700, seed=11)
    p1 = os.path.join(tmp_path, "a.las")
    p2 = os.path.join(tmp_path, "b.laz")
    write_las(p1, d1, point_format=1)
    write_laz(p2, d2, point_format=1, chunk_size=500)
    got = read_las_ds([p1, p2]).to_pandas()
    assert len(got) == len(d1) + len(d2)
    exp = pd.concat([d1, d2], ignore_index=True)
    g = got.sort_values(["psid", "x_int", "y_int", "gps_time"]).reset_index(drop=True)
    e = exp.sort_values(["psid", "x_int", "y_int", "gps_time"]).reset_index(drop=True)
    for col in POINT_COLS + ("gps_time",):
        assert np.array_equal(g[col].to_numpy(), e[col].to_numpy()), col
