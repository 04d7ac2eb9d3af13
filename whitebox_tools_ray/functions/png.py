"""Pure-python PNG codec (public spec: RFC 2083 / W3C PNG) — the real
decode half of the multimodal boundary (round-3 VERDICT item 9: replace the
fake-hash feature stub with an actual image codec; PIL/cv2 are absent in
this container, zlib is stdlib).

Supported: 8-bit depth, color types 0 (grayscale), 2 (RGB), 4 (gray+alpha),
6 (RGBA); non-interlaced; all five scanline filters (None/Sub/Up/Average/
Paeth) on decode. The encoder writes filter type `filter_type` on every
scanline (0 by default; other values exist to exercise the decoder paths
in tests).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    r = row.astype(np.int64)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int64)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        p = left + up - upleft
        pa_ = np.abs(p - left)
        pb = np.abs(p - up)
        pc = np.abs(p - upleft)
        pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                        np.where(pb <= pc, up, upleft))
        out = r - pred
    else:
        raise ValueError(f"bad filter {ftype}")
    return (out % 256).astype(np.uint8)


def encode_png(arr: np.ndarray, *, filter_type: int = 0) -> bytes:
    """uint8 array (H, W) gray / (H, W, 2) gray+alpha / (H, W, 3) RGB /
    (H, W, 4) RGBA -> PNG bytes."""
    arr = np.ascontiguousarray(arr, np.uint8)
    if arr.ndim == 2:
        ctype, ch = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        ch = arr.shape[2]
        ctype = {2: 4, 3: 2, 4: 6}[ch]
        flat = arr
    else:
        raise ValueError("unsupported array shape")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, np.uint8)
    for y in range(h):
        row = flat[y].reshape(-1)
        raw.append(filter_type)
        filt = _filter_row(filter_type, row, prev, ch)
        raw.extend(filt.tobytes())
        prev = row
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def _unfilter_row(ftype: int, cur: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    n = len(cur)
    out = np.zeros(n, np.int64)
    c = cur.astype(np.int64)
    up = prev.astype(np.int64)
    if ftype == 0:
        out = c
    elif ftype == 2:
        out = (c + up) % 256
    elif ftype == 1:
        # left-dependency: resolve per pixel-stride; each lane (offset mod
        # bpp) is an independent prefix recurrence over n//bpp elements
        for k in range(bpp):
            lane = c[k::bpp].copy()
            acc = 0
            for i in range(len(lane)):
                acc = (lane[i] + acc) % 256
                lane[i] = acc
            out[k::bpp] = lane
    elif ftype == 3:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (c[i] + (left + up[i]) // 2) % 256
    elif ftype == 4:
        for i in range(n):
            left = out[i - bpp] if i >= bpp else 0
            ul = up[i - bpp] if i >= bpp else 0
            p = left + up[i] - ul
            pa_, pb, pc = abs(p - left), abs(p - up[i]), abs(p - ul)
            pred = left if (pa_ <= pb and pa_ <= pc) else \
                (up[i] if pb <= pc else ul)
            out[i] = (c[i] + pred) % 256
    else:
        raise ValueError(f"bad filter {ftype}")
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W) or (H, W, C)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    ctype = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or comp != 0 or filt != 0 or ilace != 0:
                raise NotImplementedError(
                    "only 8-bit non-interlaced PNG supported")
            if ctype not in _CHANNELS:
                raise NotImplementedError(f"color type {ctype}")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        cur = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1)
        prev = _unfilter_row(ftype, cur, prev, ch)
        out[y] = prev
    if ch == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, ch)
