"""GIF codec: public-spec conformance vector, round-trips, container edge
cases, and the real FrameSampler path (functions/gif.py,
stages/multimodal.py)."""

import struct

import numpy as np
import pytest

from whitebox_tools_ray.functions.gif import (_lzw_decode, _lzw_encode,
                                              _sub_blocks, decode_gif,
                                              encode_gif)

# ---------------------------------------------------------------------------
# External conformance vector: the canonical 10x10 worked example that
# accompanies the public GIF89a spec (LZW min code size 2). This pins the
# LSB-first packing, the width-growth timing, and the KwKwK case against
# ground truth that did NOT come from this repo's encoder.
# ---------------------------------------------------------------------------
SPEC_LZW = bytes([0x8C, 0x2D, 0x99, 0x87, 0x2A, 0x1C, 0xDC, 0x33, 0xA0, 0x02,
                  0x75, 0xEC, 0x95, 0xFA, 0xA8, 0xDE, 0x60, 0x8C, 0x04, 0x91,
                  0x4C, 0x01, 0x00])
SPEC_PIXELS = np.array([
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
    [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
    [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
    [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1]], np.uint8)


def test_lzw_decode_matches_spec_example():
    out = _lzw_decode(SPEC_LZW, 2, 100).reshape(10, 10)
    np.testing.assert_array_equal(out, SPEC_PIXELS)


def test_lzw_encode_of_spec_pixels_decodes_back():
    enc = _lzw_encode(SPEC_PIXELS.ravel(), 2)
    out = _lzw_decode(enc, 2, 100).reshape(10, 10)
    np.testing.assert_array_equal(out, SPEC_PIXELS)


@pytest.mark.parametrize("shape,nf", [((5, 7), 3), ((40, 40), 2),
                                      ((90, 80), 4), ((1, 1), 1)])
def test_roundtrip_random(shape, nf):
    rng = np.random.default_rng(hash(shape) % 2**31)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    frames = [rng.integers(0, 256, shape).astype(np.uint8)
              for _ in range(nf)]
    data = encode_gif(frames, pal, delays_cs=[4 + i for i in range(nf)])
    df, dpal, dd = decode_gif(data)
    assert dd == [4 + i for i in range(nf)]
    assert (dpal == pal).all()
    for a, b in zip(frames, df):
        np.testing.assert_array_equal(a, b)


def test_roundtrip_compressible_and_small_palette():
    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                    np.uint8)
    fr = [np.zeros((64, 64), np.uint8),
          (np.arange(64 * 64) % 4).reshape(64, 64).astype(np.uint8)]
    df, dpal, _ = decode_gif(encode_gif(fr, pal4))
    for a, b in zip(fr, df):
        np.testing.assert_array_equal(a, b)
    assert (dpal[:4] == pal4).all()


def test_lzw_early_reset_path():
    # enough distinct pixels that next_code crosses the early-clear
    # threshold several times
    rng = np.random.default_rng(3)
    fr = rng.integers(0, 256, (150, 150)).astype(np.uint8)
    enc = _lzw_encode(fr.ravel(), 8)
    np.testing.assert_array_equal(
        _lzw_decode(enc, 8, fr.size).reshape(fr.shape), fr)


def _container(w, h, blocks, gct=None, gct_bits=8):
    out = bytearray(b"GIF89a")
    packed = (0x80 | (gct_bits - 1)) if gct is not None else 0
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    if gct is not None:
        full = np.zeros((1 << gct_bits, 3), np.uint8)
        full[: len(gct)] = gct
        out += full.tobytes()
    for b in blocks:
        out += b
    out.append(0x3B)
    return bytes(out)


def test_interlaced_decode():
    rng = np.random.default_rng(4)
    fr = rng.integers(0, 256, (13, 9)).astype(np.uint8)
    order = np.concatenate([np.arange(s, 13, st)
                            for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))])
    img = (struct.pack("<BHHHHB", 0x2C, 0, 0, 9, 13, 0x40) + bytes([8])
           + _sub_blocks(_lzw_encode(fr[order].ravel(), 8)))
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    frames, _, _ = decode_gif(_container(9, 13, [img], gct=pal))
    np.testing.assert_array_equal(frames[0], fr)


def test_transparency_compositing_and_subrect():
    pal = np.zeros((256, 3), np.uint8)
    base = np.full((6, 6), 5, np.uint8)
    img1 = (struct.pack("<BHHHHB", 0x2C, 0, 0, 6, 6, 0) + bytes([8])
            + _sub_blocks(_lzw_encode(base.ravel(), 8)))
    # frame 2: 2x3 sub-rectangle at (2,1) with transparent index 9
    patch = np.array([[9, 7, 9], [7, 9, 7]], np.uint8)
    gce = struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x01, 12, 9, 0)
    img2 = (struct.pack("<BHHHHB", 0x2C, 1, 2, 3, 2, 0) + bytes([8])
            + _sub_blocks(_lzw_encode(patch.ravel(), 8)))
    frames, _, delays = decode_gif(
        _container(6, 6, [img1, gce + img2], gct=pal))
    assert delays == [0, 12]
    expect = base.copy()
    expect[2, 2] = 7   # patch (0,1) -> canvas (2, 1+1)
    expect[3, 1] = 7
    expect[3, 3] = 7   # transparent 9s leave the 5s
    np.testing.assert_array_equal(frames[1], expect)
    np.testing.assert_array_equal(frames[0], base)


def test_unknown_extension_skipped():
    pal = np.zeros((256, 3), np.uint8)
    fr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    app_ext = (bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
               + bytes([3, 1, 0, 0, 0]))
    img = (struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0) + bytes([8])
           + _sub_blocks(_lzw_encode(fr.ravel(), 8)))
    frames, _, _ = decode_gif(_container(4, 4, [app_ext + img], gct=pal))
    np.testing.assert_array_equal(frames[0], fr)


def test_malformed_rejected():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # no image data


def test_frame_sampler_real_gif_path():
    from whitebox_tools_ray.sources.synthetic import splitmix64
    from whitebox_tools_ray.stages.multimodal import (FrameSampler,
                                                      synth_video_table)

    n = 40
    t = synth_video_table(n, seed=7)
    out = FrameSampler(stride_ms=300)(t).to_pandas()
    h = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(7))
    rows = 0
    for i in range(n):
        w = 8 + int(h[i] % np.uint64(16))
        ht = 8 + int((h[i] >> np.uint64(5)) % np.uint64(16))
        nf = 2 + int((h[i] >> np.uint64(10)) % np.uint64(7))
        delay = 4 + int((h[i] >> np.uint64(13)) % np.uint64(16))
        a = 1 + int((h[i] >> np.uint64(18)) % np.uint64(32))
        b = 1 + int((h[i] >> np.uint64(23)) % np.uint64(32))
        c = 1 + int((h[i] >> np.uint64(28)) % np.uint64(64))
        d = int((h[i] >> np.uint64(34)) % np.uint64(256))
        step = max(1, 300 // (delay * 10))
        yy, xx = np.mgrid[0:ht, 0:w]
        for k in range(0, nf, step):
            sub = out[(out.item_id == i) & (out.frame_idx == k)]
            assert len(sub) == 1
            want = int(((a * xx + b * yy + c * k + d) % 256).sum())
            assert sub.iloc[0]["pix_sum"] == want
            assert sub.iloc[0]["n_px"] == w * ht
            assert sub.iloc[0]["ts_ms"] == k * delay * 10
            rows += 1
    assert len(out) == rows
