"""GeoTIFF round trip + a real stencil query over an imported raster."""

import numpy as np
import pytest


def _synthetic_dem(rows=100, cols=130):
    cells = np.arange(rows * cols, dtype=np.int64)
    return (100.0 + (cells * 31) % 57).astype(np.float64).reshape(rows, cols)


def test_write_read_info(tmp_path):
    from whitebox_tools_ray.sources.geotiff import read_info, write_geotiff

    dem = _synthetic_dem()
    p = str(tmp_path / "dem.tif")
    write_geotiff(p, dem, west=-10.0, north=50.0, res=0.5, nodata=-9999.0)
    info = read_info(p)
    assert (info.width, info.height) == (130, 100)
    assert info.west == -10.0 and info.north == 50.0 and info.res_x == 0.5
    assert info.nodata == -9999.0
    assert info.dtype == np.dtype("<f8")


@pytest.mark.usefixtures("ray_session")
def test_geotiff_tiles_roundtrip(tmp_path):
    from whitebox_tools_ray.sources.geotiff import geotiff_to_tiles, write_geotiff

    dem = _synthetic_dem()
    dem[3, 4] = -9999.0  # nodata hole
    p = str(tmp_path / "dem.tif")
    write_geotiff(p, dem, nodata=-9999.0)
    tiles = geotiff_to_tiles(p, tile=32).to_pandas()
    # reassemble and compare
    out = np.full(dem.shape, np.nan)
    for t in tiles.itertuples():
        arr = np.asarray(t.data, np.float64).reshape(t.nrows, t.ncols)
        out[t.trow * 32:t.trow * 32 + t.nrows,
            t.tcol * 32:t.tcol * 32 + t.ncols] = arr
    want = np.where(dem == -9999.0, np.nan, dem)
    np.testing.assert_array_equal(np.isnan(out), np.isnan(want))
    np.testing.assert_array_equal(out[~np.isnan(want)], want[~np.isnan(want)])


@pytest.mark.usefixtures("ray_session")
def test_geotiff_int32_deflate(tmp_path):
    """Deflate-compressed int raster read path (write raw, recompress)."""
    import struct
    import zlib

    from whitebox_tools_ray.sources.geotiff import (geotiff_to_tiles, read_info,
                                                    write_geotiff)

    dem = ((np.arange(40 * 50) * 7) % 1000).astype(np.int32).reshape(40, 50)
    p = str(tmp_path / "int.tif")
    write_geotiff(p, dem)
    info = read_info(p)
    assert info.dtype == np.dtype("<i4")
    # recompress the strip in place as deflate to exercise that path
    raw = open(p, "rb").read()
    strip = raw[info.offsets[0]:info.offsets[0] + info.byte_counts[0]]
    comp = zlib.compress(strip)
    # easiest: append compressed strip, patch offset/bytecount/compression
    # by rewriting a fresh file through the writer is simpler — here just
    # verify decompress path via _decode_chunk on a crafted info
    from whitebox_tools_ray.sources import geotiff as G

    p2 = str(tmp_path / "int_defl.tif")
    with open(p2, "wb") as f:
        f.write(raw[:info.offsets[0]])
        f.write(comp)
    info2 = read_info(p2)
    object.__setattr__(info2, "compression", 8) if hasattr(info2, "__dataclass_fields__") else None
    info2.compression = 8
    info2.byte_counts = [len(comp)]
    got = G._decode_chunk(p2, info2, 0)
    np.testing.assert_array_equal(got, dem)


@pytest.mark.usefixtures("ray_session")
def test_geotiff_slope_query(tmp_path):
    """An imported GeoTIFF drives the existing stencil machinery end-to-end."""
    from whitebox_tools_ray.grid import GridSpec
    from whitebox_tools_ray.sources.geotiff import geotiff_to_tiles, write_geotiff
    from whitebox_tools_ray.stages.raster import stencil_3x3, slope_kernel_factory

    dem = _synthetic_dem(64, 64)
    p = str(tmp_path / "dem.tif")
    write_geotiff(p, dem, west=0.0, north=64.0, res=1.0)
    g = GridSpec(west=0.0, north=64.0, res_x=1.0, res_y=1.0, rows=64, cols=64)
    tiles = geotiff_to_tiles(p, tile=32)
    out = stencil_3x3(tiles, g, slope_kernel_factory(1.0, 1.0), tile=32).to_pandas()
    assert len(out) == 64 * 64
    # spot-check one interior cell against the direct Horn formula
    r, c = 10, 10
    z = dem
    dzdx = ((z[r-1,c+1] + 2*z[r,c+1] + z[r+1,c+1]) - (z[r-1,c-1] + 2*z[r,c-1] + z[r+1,c-1])) / 8.0
    dzdy = ((z[r+1,c-1] + 2*z[r+1,c] + z[r+1,c+1]) - (z[r-1,c-1] + 2*z[r-1,c] + z[r-1,c+1])) / 8.0
    want = np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
    got = out.loc[out["cell_id"] == r * 64 + c, "slope_deg"].iloc[0]
    assert abs(got - want) < 1e-9


def test_lzw_codec_vector_and_roundtrip():
    """Pin the TIFF-LZW bitstream layout with a hand-packed vector (MSB-first
    9-bit codes: CLEAR,0x07,258,0x08,EOI for input 07 07 07 08), then fuzz
    encode->decode round trips across width growth and a table reset."""
    from whitebox_tools_ray.sources.geotiff import lzw_decode, lzw_encode

    enc = lzw_encode(b"\x07\x07\x07\x08")
    assert enc == bytes([0x80, 0x01, 0xE0, 0x40, 0x88, 0x08])
    assert lzw_decode(enc) == b"\x07\x07\x07\x08"

    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 500, 5000, 80_000):
        # low-entropy bytes so the table grows through 9->10->11->12 bits
        # and (at 80k) wraps through a table reset
        data = (rng.integers(0, 7, n, dtype=np.uint8)
                * rng.integers(1, 3, n, dtype=np.uint8)).tobytes()
        assert lzw_decode(lzw_encode(data)) == data
    runs = b"".join(bytes([i % 251]) * (i % 17 + 1) for i in range(2000))
    assert lzw_decode(lzw_encode(runs)) == runs


def test_packbits_codec_roundtrip():
    from whitebox_tools_ray.sources.geotiff import (packbits_decode,
                                                    packbits_encode)

    rng = np.random.default_rng(5)
    cases = [b"", b"\x00", b"aaa", b"ab", b"a" * 400,
             rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes(),
             b"ab" * 100 + b"c" * 300 + bytes(range(256))]
    for data in cases:
        assert packbits_decode(packbits_encode(data), len(data)) == data


@pytest.mark.usefixtures("ray_session")
def test_geotiff_lzw_predictor_multistrip(tmp_path):
    """LZW + horizontal predictor, multi-strip int32 single band — the most
    common real-world GeoTIFF layout (whitebox-raster/src/geotiff/mod.rs
    compression dispatch)."""
    from whitebox_tools_ray.sources.geotiff import (geotiff_to_tiles,
                                                    read_info, write_geotiff)

    dem = ((np.arange(90 * 77) * 13) % 500).astype(np.int32).reshape(90, 77)
    p = str(tmp_path / "lzw.tif")
    write_geotiff(p, dem, west=2.0, north=90.0, res=1.0,
                  compression="lzw", predictor=2, rows_per_strip=16)
    info = read_info(p)
    assert info.compression == 5 and info.predictor == 2
    assert len(info.offsets) == 6
    tiles = geotiff_to_tiles(p, tile=32).to_pandas()
    back = np.full(dem.shape, np.nan)
    for t in tiles.itertuples():
        r0, c0 = int(t.trow) * 32, int(t.tcol) * 32
        back[r0:r0 + int(t.nrows), c0:c0 + int(t.ncols)] = \
            np.asarray(t.data).reshape(int(t.nrows), int(t.ncols))
    np.testing.assert_array_equal(back, dem.astype(np.float64))


@pytest.mark.usefixtures("ray_session")
def test_geotiff_packbits_rgb(tmp_path):
    from whitebox_tools_ray.sources.geotiff import (geotiff_to_tiles,
                                                    read_info, write_geotiff)

    rng = np.random.default_rng(7)
    rgb = np.repeat(rng.integers(0, 256, (40, 8, 3), dtype=np.uint8),
                    7, axis=1)  # horizontal runs so packbits compresses
    p = str(tmp_path / "pb.tif")
    write_geotiff(p, rgb, compression="packbits", rows_per_strip=11)
    info = read_info(p)
    assert info.compression == 32773 and info.spp == 3
    for band in (0, 2):
        tiles = geotiff_to_tiles(p, tile=32, band=band).to_pandas()
        back = np.full((40, 56), -1.0)
        for t in tiles.itertuples():
            r0, c0 = int(t.trow) * 32, int(t.tcol) * 32
            back[r0:r0 + int(t.nrows), c0:c0 + int(t.ncols)] = \
                np.asarray(t.data).reshape(int(t.nrows), int(t.ncols))
        np.testing.assert_array_equal(back, rgb[:, :, band].astype(float))


@pytest.mark.usefixtures("ray_session")
def test_geotiff_planar_bands(tmp_path):
    """PlanarConfiguration 2: one strip sequence per band, LZW + predictor
    and deflate variants, every band reassembled exactly."""
    from whitebox_tools_ray.sources.geotiff import (geotiff_to_tiles,
                                                    read_info, write_geotiff)

    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (53, 38, 4), dtype=np.uint8)
    for comp, pred in (("lzw", 2), ("deflate", 1), ("none", 1)):
        p = str(tmp_path / f"planar_{comp}.tif")
        write_geotiff(p, rgb, planar=2, compression=comp, predictor=pred,
                      rows_per_strip=10)
        info = read_info(p)
        assert info.planar == 2 and info.spp == 4
        assert len(info.offsets) == 4 * 6 and info.chunks_per_plane == 6
        for band in range(4):
            tiles = geotiff_to_tiles(p, tile=32, band=band).to_pandas()
            back = np.full((53, 38), -1.0)
            for t in tiles.itertuples():
                r0, c0 = int(t.trow) * 32, int(t.tcol) * 32
                back[r0:r0 + int(t.nrows), c0:c0 + int(t.ncols)] = \
                    np.asarray(t.data).reshape(int(t.nrows), int(t.ncols))
            np.testing.assert_array_equal(back, rgb[:, :, band].astype(float))


@pytest.mark.usefixtures("ray_session")
def test_geotiff_float_lzw(tmp_path):
    """LZW on float64 samples (predictor 1) round-trips bit-exactly."""
    from whitebox_tools_ray.sources.geotiff import geotiff_to_tiles, write_geotiff

    dem = _synthetic_dem(48, 31) / 7.0
    p = str(tmp_path / "flzw.tif")
    write_geotiff(p, dem, compression="lzw", rows_per_strip=13)
    tiles = geotiff_to_tiles(p, tile=32).to_pandas()
    back = np.full(dem.shape, np.nan)
    for t in tiles.itertuples():
        r0, c0 = int(t.trow) * 32, int(t.tcol) * 32
        back[r0:r0 + int(t.nrows), c0:c0 + int(t.ncols)] = \
            np.asarray(t.data).reshape(int(t.nrows), int(t.ncols))
    np.testing.assert_array_equal(back, dem)


def test_rgb_multiband_round_trip(ray_session):
    import numpy as np

    from whitebox_tools_ray.sources.geotiff import (geotiff_to_tiles,
                                                    read_info, write_geotiff)

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (70, 45, 3), dtype=np.uint8)
    path = "/tmp/wbt_test_rgb_rt.tif"
    write_geotiff(path, rgb, west=5.0, north=70.0, res=1.0)
    info = read_info(path)
    assert info.spp == 3 and info.bits == 8
    for band in range(3):
        tiles = geotiff_to_tiles(path, tile=32, band=band).to_pandas()
        back = np.full((70, 45), -1.0)
        for t in tiles.itertuples():
            r0, c0 = int(t.trow) * 32, int(t.tcol) * 32
            back[r0:r0 + int(t.nrows), c0:c0 + int(t.ncols)] = \
                np.asarray(t.data).reshape(int(t.nrows), int(t.ncols))
        np.testing.assert_array_equal(back, rgb[:, :, band].astype(float))
