"""LAS 1.2 binary layer: header layout, both point formats, record-range
parallel reads, ascii round trip."""

import os

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.sources.las import (ascii_lines_to_las_df,
                                            las_to_ascii_lines,
                                            read_las_ds, read_las_header,
                                            read_las_records, write_las)


def _df(n=1000, seed=7):
    rng = np.arange(n, dtype=np.int64) + seed
    nret = 1 + rng % 3
    return pd.DataFrame({
        "x_int": rng * 37 % 360000, "y_int": rng * 91 % 170000,
        "z_int": (rng * 53 % 20000) - 10000,
        "intensity": rng * 97 % 4096, "cls": rng % 7,
        "ret": 1 + (rng * 31) % nret, "nret": nret,
        "scan_angle": (rng * 13) % 41 - 20, "psid": rng % 4,
        "gps_time": rng.astype(np.float64) / 8.0})


@pytest.mark.parametrize("fmt", [0, 1])
def test_las_roundtrip(tmp_path, fmt):
    df = _df()
    p = os.path.join(tmp_path, "t.las")
    write_las(p, df, point_format=fmt)
    h = read_las_header(p)
    assert h["version"] == (1, 2)
    assert h["point_format"] == fmt
    assert h["n_points"] == len(df)
    assert h["record_len"] == (28 if fmt == 1 else 20)
    back = read_las_records(p, 0, len(df))
    for col in ("x_int", "y_int", "z_int", "intensity", "cls", "ret",
                "nret", "scan_angle", "psid"):
        assert np.array_equal(back[col].to_numpy(), df[col].to_numpy()), col
    if fmt == 1:
        assert np.array_equal(back["gps_time"], df["gps_time"])
    # dequantized coordinates follow the header scale/offset
    assert np.array_equal(back["x"].to_numpy(),
                          df["x_int"].to_numpy() * 0.001 + (-180.0))


def test_las_record_ranges(tmp_path):
    df = _df(257)
    p = os.path.join(tmp_path, "t.las")
    write_las(p, df)
    a = read_las_records(p, 0, 100)
    b = read_las_records(p, 100, 257)
    got = pd.concat([a, b], ignore_index=True)
    assert np.array_equal(got["x_int"].to_numpy(), df["x_int"].to_numpy())


def test_las_ds_multifile(tmp_path, ray_session):
    d1, d2 = _df(300, seed=1), _df(400, seed=2)
    p1, p2 = os.path.join(tmp_path, "a.las"), os.path.join(tmp_path, "b.las")
    write_las(p1, d1)
    write_las(p2, d2)
    ds = read_las_ds([p1, p2], records_per_block=128)
    got = ds.to_pandas()
    assert len(got) == 700
    assert got["z_int"].sum() == d1["z_int"].sum() + d2["z_int"].sum()


def test_ascii_roundtrip():
    df = _df(50)
    lines = las_to_ascii_lines(df)
    back = ascii_lines_to_las_df(lines)
    for col in ("x_int", "y_int", "z_int", "intensity", "cls", "ret"):
        assert np.array_equal(back[col].to_numpy(), df[col].to_numpy()), col
