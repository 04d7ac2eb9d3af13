"""Baseline JPEG codec (functions/jpeg.py): planted-image decode oracles.

JPEG is lossy, so round trips assert bounded reconstruction error — except
the DC-only cases (flat blocks), which are exact by construction: the IDCT
of a DC-only block is flat, and a flat block's DC quantizes losslessly when
8*(v-128) is a multiple of the DC quant step.
"""

import numpy as np
import pytest

from whitebox_tools_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w, seed=0):
    """Low-frequency test image: sum of two gentle cosines (JPEG-friendly)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (128 + 55 * np.cos(xx / 9.0 + seed) * np.cos(yy / 7.0)
           + 40 * np.sin((xx + 2 * yy) / 23.0))
    return np.clip(np.rint(img), 0, 255).astype(np.uint8)


def test_constant_gray_exact():
    for v in (0, 16, 130, 255):
        img = np.full((24, 17), v, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == (24, 17)
        np.testing.assert_array_equal(out, img)


def test_gray_roundtrip_tolerance():
    img = _smooth(41, 57)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.float64) - img)
    assert err.mean() < 2.0 and err.max() < 12


def test_rgb_444_and_420():
    img = np.stack([_smooth(37, 52, s) for s in range(3)], axis=2)
    for sub, mean_tol in (("444", 2.5), ("420", 5.0)):
        out = decode_jpeg(encode_jpeg(img, quality=92, subsample=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(np.float64) - img)
        assert err.mean() < mean_tol, (sub, err.mean())


def test_restart_markers_resync():
    img = _smooth(48, 64, 3)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 2, 5):
        enc = encode_jpeg(img, quality=90, restart_interval=ri)
        assert b"\xff\xdd" in enc  # DRI present
        np.testing.assert_array_equal(decode_jpeg(enc), plain)


def test_decode_deterministic_and_bitstream_stable():
    img = np.stack([_smooth(20, 20, s) for s in range(3)], axis=2)
    enc = encode_jpeg(img, quality=85, subsample="420", restart_interval=2)
    assert enc == encode_jpeg(img, quality=85, subsample="420",
                              restart_interval=2)
    np.testing.assert_array_equal(decode_jpeg(enc), decode_jpeg(enc))


def test_progressive_and_non_jpeg_rejected():
    img = _smooth(16, 16)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_decode_image_routes_jpeg():
    from whitebox_tools_ray.stages.multimodal import decode_image

    img = _smooth(18, 25)
    out = decode_image(encode_jpeg(img, quality=95))
    assert out.shape == (18, 25)
    assert np.abs(out.astype(np.float64) - img).mean() < 2.0
