"""Pure-python WAV (RIFF/WAVE) codec — real audio container boundary.

Upgrades the multimodal audio path (stages/multimodal.py) from "interpret
raw bytes as int16 PCM" to a real container parse: RIFF chunk walk, fmt
chunk validation, PCM 8/16-bit, mono/stereo, unknown-chunk skipping
(LIST/fact/cue), odd-chunk pad bytes. Reference analog: WhiteboxTools has
no audio tools — this exists for the driver's multimodal mandate (treat
media as opaque binary + typed metadata, decode behind an actor-pool
stage); the container format is the public RIFF/WAVE spec (Microsoft
Multimedia Programming Interface and Data Specifications 1.0).

Decode always returns int16 samples shaped (n_samples, n_channels);
8-bit PCM (unsigned, 128-offset) is widened as (b - 128) << 8 so feature
kernels see one dtype.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int, *, bits: int = 16,
               extra_chunks: tuple[tuple[bytes, bytes], ...] = ()) -> bytes:
    """Encode int16 samples (shape (n,) or (n, ch)) as a PCM WAV file.

    ``extra_chunks`` inserts (id, payload) chunks between ``fmt `` and
    ``data`` — used by tests and the synth table to exercise the reader's
    chunk-skip path the way real-world encoders (LIST/INFO metadata) do.
    """
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be 1-D or 2-D (n, channels)")
    n, ch = s.shape
    if bits == 16:
        payload = s.astype("<i2").tobytes()
    elif bits == 8:
        # PCM8 is unsigned with a 128 offset; round-trips exactly for
        # samples that are multiples of 256 in int16 space
        payload = ((s.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16 (PCM)")
    block_align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * block_align, block_align, bits)
    chunks = [(b"fmt ", fmt), *extra_chunks, (b"data", payload)]
    body = bytearray(b"WAVE")
    for cid, cdata in chunks:
        body += cid + struct.pack("<I", len(cdata)) + cdata
        if len(cdata) % 2:
            body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV file -> (int16 samples shaped (n, channels), rate).

    Walks the RIFF chunk list, skipping unknown chunks and honoring the
    word-alignment pad byte; raises ValueError on a malformed container and
    NotImplementedError on non-PCM (compressed) audio formats.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + size > len(data):
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", data, start)
        elif cid == b"data":
            payload = data[start:start + size]
        pos = start + size + (size % 2)  # pad byte on odd sizes
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"WAV audio format {audio_format} "
                                  "(only PCM=1 supported)")
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    if bits == 16:
        flat = np.frombuffer(payload[: (len(payload) // (2 * ch)) * 2 * ch],
                             "<i2").astype(np.int16)
    elif bits == 8:
        flat = ((np.frombuffer(payload[: (len(payload) // ch) * ch],
                               np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return flat.reshape(-1, ch), rate
