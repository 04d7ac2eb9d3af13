"""Pure-python GIF87a/89a codec — real animated-image (video-shaped) boundary.

Closes the last multimodal stub: video frame-sampling (stages/multimodal.py
FrameSampler) now decodes REAL frames from an animated container instead of
slicing opaque bytes. GIF is the one animated format a pure-python codec can
serve in this environment (no ffmpeg); the format is the public GIF89a spec.

Scope:
  decode: header + logical screen descriptor, global/local color tables,
          interlaced images, graphic-control extensions (frame delay +
          transparency compositing onto the running canvas), unknown
          extensions skipped, variable-width LSB-first LZW with deferred
          clear (table stays at 4096 until an explicit clear code).
  encode: multi-frame GIF89a, global palette, per-frame delay, real LZW
          compression (dict reset via an explicit early clear well before
          the 4096-entry cap — spec-legal and sidesteps the cap edge).

Width-bump synchronization (the classic LZW off-by-one): the decoder's
table lags the encoder's by exactly one emitted code, so the DECODER grows
its code width when the entry it just added is ``(1 << width) - 1`` while
the ENCODER grows when the entry it just added is ``(1 << width)`` — the
same asymmetry giflib implements (RunningCode > MaxCode1). The encoder's
output is cross-validated pixel-exact against an independent conformant
decoder (WebKit canvas) in scripts/gif_browser_check.py; the committed
golden fixture pins the bitstream (tests/test_gif.py).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096
_ENC_RESET = 4000  # early-clear threshold (< 4096 - spec allows clear anytime)


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first packing, variable width 3..12 bits)
# --------------------------------------------------------------------------

def _lzw_decode(data: bytes, mcs: int, n_px: int) -> np.ndarray:
    """Decode a GIF LZW stream (already de-sub-blocked) to ``n_px`` indices."""
    clear = 1 << mcs
    end = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table = list(base)
    table += [b"", b""]  # clear/end placeholders
    width = mcs + 1
    next_code = end + 1
    prev = -1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < n_px:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base) + [b"", b""]
            width = mcs + 1
            next_code = end + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            out += table[code]
            prev = code
            continue
        if code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if next_code < _MAX_CODE:
            table.append(table[prev] + entry[:1])
            next_code += 1
            # decoder bumps when the entry just added is (1<<width)-1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return np.frombuffer(bytes(out[:n_px]), np.uint8)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF LZW encode (giflib-consistent width bumps, early dict reset)."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    width = mcs + 1
    next_code = end + 1
    emit(clear, width)
    px = indices.astype(np.uint8).tobytes()
    if px:
        buf = px[:1]
        for i in range(1, len(px)):
            cand = buf + px[i:i + 1]
            if cand in table:
                buf = cand
                continue
            emit(table[buf], width)
            table[cand] = next_code
            next_code += 1
            # encoder bumps one emit LATER than the decoder: when the entry
            # just added is (1 << width) (giflib RunningCode > MaxCode1)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
            if next_code >= _ENC_RESET:
                emit(clear, width)
                table = {bytes([j]): j for j in range(clear)}
                width = mcs + 1
                next_code = end + 1
            buf = px[i:i + 1]
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(start, h, step)
                            for start, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


# --------------------------------------------------------------------------
# Container
# --------------------------------------------------------------------------

def encode_gif(frames: list[np.ndarray], palette: np.ndarray,
               delays_cs: list[int] | None = None) -> bytes:
    """Encode index frames (each HxW uint8) + one global palette (n<=256 x 3
    uint8) as an animated GIF89a. ``delays_cs`` is per-frame delay in
    centiseconds (GCE blocks are written only when given)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    pal = np.asarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    gct_bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    pal_full = np.zeros((1 << gct_bits, 3), np.uint8)
    pal_full[: len(pal)] = pal
    mcs = max(2, gct_bits)  # LZW min code size (spec: >= 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 7)
                       | ((gct_bits - 1) & 7) << 4, 0, 0)
    out += pal_full.tobytes()
    for k, fr in enumerate(frames):
        if fr.shape != (h, w):
            raise ValueError("all frames must share the screen size")
        if delays_cs is not None:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x00,
                               int(delays_cs[k]), 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(fr.ravel(), mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> tuple[list[np.ndarray], np.ndarray, list[int]]:
    """Decode a GIF -> (composited index frames HxW uint8, palette (256,3),
    per-frame delays in centiseconds). Frames with a transparent index keep
    the previous canvas under transparent pixels (disposal method 'none');
    sub-rectangle frames composite onto the running canvas."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gpal = np.zeros((256, 3), np.uint8)
    if packed & 0x80:
        n = 2 << (packed & 7)
        gpal[:n] = np.frombuffer(data[pos:pos + 3 * n],
                                 np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w), np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay = 0
    transparent = -1
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                gce_packed = data[pos + 1]
                (delay,) = struct.unpack_from("<H", data, pos + 2)
                transparent = data[pos + 4] if gce_packed & 1 else -1
                pos += 1 + size
            # skip remaining sub-blocks (all of them, for unknown labels)
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gpal
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 7)
            pal = np.zeros((256, 3), np.uint8)
            pal[:n] = np.frombuffer(data[pos:pos + 3 * n],
                                    np.uint8).reshape(n, 3)
            pos += 3 * n
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(lzw), mcs, fw * fh).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        region = canvas[top:top + fh, left:left + fw]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = idx[mask]
        else:
            region[:] = idx
        frames.append(canvas.copy())
        delays.append(delay)
        delay = 0
        transparent = -1
        last_pal = pal  # palette of the LAST frame is returned
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, last_pal, delays
