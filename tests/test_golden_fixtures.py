"""Committed golden files pin every from-scratch codec's on-disk format.

The per-codec round-trip tests re-encode on every run, so a symmetric
encoder+decoder change could silently fork a format without failing
anything; each fixture here was written once and its DECODE must stay
bit-exact forever. Re-encode equality is additionally asserted for the
codecs whose writers are fully self-contained (LAS, GeoTIFF LZW) — the
zlib-backed writers (PNG, zlidar) are decode-pinned only, since zlib's
compressed bytes are not guaranteed stable across library versions.
(The .laz golden has its own test in test_laz.py.)
"""

import os

import numpy as np
import pandas as pd

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _las_df(n=1500, seed=7):
    rng = np.arange(n, dtype=np.int64) + seed
    nret = 1 + rng % 3
    return pd.DataFrame({
        "x_int": rng * 37 % 360000, "y_int": rng * 91 % 170000,
        "z_int": (rng * 53 % 20000) - 10000,
        "intensity": rng * 97 % 4096, "cls": rng % 7,
        "ret": 1 + (rng * 31) % nret, "nret": nret,
        "scan_angle": (rng * 13) % 41 - 20, "psid": rng % 4,
        "gps_time": rng.astype(np.float64) / 8.0})


def test_golden_las(tmp_path):
    from whitebox_tools_ray.sources.las import read_las_records, write_las

    df = _las_df()
    p = os.path.join(FIX, "golden_pf1.las")
    back = read_las_records(p, 0, len(df))
    for col in df.columns:
        assert np.array_equal(back[col].to_numpy(), df[col].to_numpy()), col
    p2 = os.path.join(tmp_path, "re.las")
    write_las(p2, df, point_format=1)
    with open(p, "rb") as a, open(p2, "rb") as b:
        assert a.read() == b.read()


def test_golden_zlidar():
    from whitebox_tools_ray.sources.las import read_zlidar

    df = _las_df()
    back = read_zlidar(os.path.join(FIX, "golden.zlidar"))
    for col in back.columns:
        assert np.array_equal(back[col].to_numpy(),
                              df[col].to_numpy().astype(back[col].dtype)), col


def test_golden_geotiff_lzw(tmp_path):
    from whitebox_tools_ray.sources.geotiff import (_decode_chunk, read_info,
                                                    write_geotiff)

    cells = np.arange(96 * 130, dtype=np.int64)
    dem = ((100 + (cells * 31) % 57).astype(np.int32)).reshape(96, 130)
    p = os.path.join(FIX, "golden_lzw.tif")
    info = read_info(p)
    assert (info.height, info.width) == (96, 130)
    assert info.compression == 5 and info.predictor == 2
    got = np.vstack([_decode_chunk(p, info, i)
                     for i in range(len(info.offsets))])
    assert np.array_equal(got.astype(np.int64), dem)
    p2 = os.path.join(tmp_path, "re.tif")
    write_geotiff(p2, dem, west=-10.0, north=20.0, res=0.5,
                  compression="lzw", predictor=2, rows_per_strip=17)
    with open(p, "rb") as a, open(p2, "rb") as b:
        assert a.read() == b.read()


def test_golden_png():
    from whitebox_tools_ray.functions.png import decode_png

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (xx * 4) % 256
    img[..., 1] = (yy * 6) % 256
    img[..., 2] = (xx + yy) % 256
    with open(os.path.join(FIX, "golden_rgb.png"), "rb") as f:
        got = decode_png(f.read())
    assert np.array_equal(got, img)


def test_golden_shapefile():
    from whitebox_tools_ray.sources.shapefile import (_parse_record, read_dbf,
                                                      read_shx)

    base = os.path.join(FIX, "golden_poly")
    index = read_shx(base + ".shx")
    assert len(index) == 2
    with open(base + ".shp", "rb") as f:
        buf = f.read()
    sq = lambda x0, y0, s: np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        float)
    expected = [[sq(0, 0, 10)[::-1], sq(3, 3, 2)], [sq(20, 5, 4)[::-1]]]
    for (off, clen), exp_rings in zip(index, expected):
        _st, got = _parse_record(buf[off + 8:off + 8 + clen])
        assert len(got) == len(exp_rings)
        for r, e in zip(got, exp_rings):
            assert np.array_equal(np.asarray(r, float), e)
    dbf = read_dbf(base + ".dbf")
    assert dbf["fid"].tolist() == [1, 2]
    assert dbf["name"].tolist() == ["a", "b"]
    # read_dbf returns text fields as-written; numeric parse is the caller's
    assert [float(v) for v in dbf["v"]] == [1.5, -2.25]


def test_golden_wav(tmp_path):
    from whitebox_tools_ray.functions.wav import decode_wav, encode_wav

    t = np.arange(1200, dtype=np.int64)
    s = ((17 * t + 301) % 4096 - 2048).astype(np.int16)
    with open(os.path.join(FIX, "golden.wav"), "rb") as f:
        data = f.read()
    dec, rate = decode_wav(data)
    assert rate == 16000
    assert np.array_equal(dec[:, 0], s)
    # the WAV writer is fully self-contained: re-encode must be bit-exact
    assert encode_wav(s, 16000,
                      extra_chunks=((b"LIST", b"INFOISFTgolden"),)) == data


def test_golden_gif():
    from whitebox_tools_ray.functions.gif import decode_gif, encode_gif

    pal = np.stack([np.arange(256), (255 - np.arange(256)),
                    (np.arange(256) * 7) % 256], axis=1).astype(np.uint8)
    yy, xx = np.mgrid[0:21, 0:17]
    frames = [((3 * xx + 5 * yy + 11 * k + 40) % 256).astype(np.uint8)
              for k in range(4)]
    with open(os.path.join(FIX, "golden_anim.gif"), "rb") as f:
        data = f.read()
    got, gpal, delays = decode_gif(data)
    assert delays == [6, 6, 6, 6]
    assert np.array_equal(gpal, pal)
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)
    # the GIF writer is fully self-contained: re-encode must be bit-exact
    assert encode_gif(frames, pal, delays_cs=[6, 6, 6, 6]) == data
