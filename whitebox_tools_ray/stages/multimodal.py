"""Multimodal (image/audio/video) column plumbing — REAL image decode.

Driver mandate: treat media as opaque ``binary`` columns with typed metadata;
implement decode / feature-extract / resize / frame-sample as actor-pool
``map_batches`` stages. The codec boundary is real pure-python decoders:
PNG (functions/png.py — 8-bit gray/RGB/RGBA, all five scanline filters) and
baseline JPEG (functions/jpeg.py — sequential DCT, 4:4:4/4:2:2/4:2:0 chroma,
restart markers), plus int16-PCM interpretation for audio payloads; video
codecs remain a documented NotImplementedError (no ffmpeg in this
container). The legacy deterministic fake decoder is kept behind
``fake=True`` for payload-integrity tests.

Schema of a media table:
    {item_id: int64, url: string, media_type: string,
     payload: binary, width: int32, height: int32, duration_ms: int32}
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("url", pa.string()),
    ("media_type", pa.string()),   # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n_rows: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes; metadata real)."""
    from ..sources.synthetic import splitmix64

    ids = np.arange(n_rows, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    types = np.array(["image", "audio", "video"], object)[
        (h % np.uint64(3)).astype(np.int64)]
    rng_bytes = [
        (splitmix64(np.arange(payload_bytes // 8, dtype=np.uint64) + h[i])
         .view(np.uint8)).tobytes()
        for i in range(n_rows)
    ]
    return pa.table({
        "item_id": ids,
        "url": pa.array([f"https://media{int(x) % 100}.example/{i}"
                         for i, x in enumerate(h)], pa.string()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(rng_bytes, pa.binary()),
        "width": pa.array(((h % np.uint64(1024)) + np.uint64(64)).astype(np.int32)),
        "height": pa.array(((h % np.uint64(768)) + np.uint64(64)).astype(np.int32)),
        "duration_ms": pa.array((h % np.uint64(60000)).astype(np.int32)),
    }, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Codec boundary. PNG (functions/png.py) and baseline JPEG
    (functions/jpeg.py — sequential DCT, 4:4:4/4:2:2/4:2:0, restart
    markers) payloads decode for real; other formats raise
    NotImplementedError. ``fake=True`` keeps the legacy hash-stub decoder."""
    if fake:
        arr = np.frombuffer(payload[: 48 * 48], dtype=np.uint8)
        arr = np.pad(arr, (0, 48 * 48 - len(arr)))
        return arr.reshape(48, 48)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..functions.png import decode_png

        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "only PNG and baseline JPEG decode in this environment "
        "(pure-python codecs); video needs ffmpeg at deployment")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (real, deterministic) — the normalization
    step before the fixed-size feature projection."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).astype(np.int64)
    ci = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ri][:, ci]


def synth_image_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Media rows whose image payloads are REAL encoded images
    (deterministic gradient + hash-texture patterns, varying small sizes):
    ~2/3 PNG (all five scanline filters), ~1/3 baseline JPEG (grayscale and
    RGB, 4:4:4 and 4:2:0, some with restart intervals) — a CC-crawl-shaped
    format mix. width/height metadata match the encoded pixels."""
    from ..functions.jpeg import encode_jpeg
    from ..functions.png import encode_png
    from ..sources.synthetic import splitmix64

    ids = np.arange(n_rows, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    payloads, ws, hs, urls = [], [], [], []
    for i in range(n_rows):
        # NOTE exact uint64 modulo everywhere: `h[i] % 24` with a Python
        # int promotes to float64 in numpy (h rounds to 53 bits first),
        # which no integer SQL oracle can reproduce
        hh = int(h[i] % np.uint64(24)) + 8
        ww = int((h[i] >> np.uint64(8)) % np.uint64(24)) + 8
        yy, xx = np.mgrid[0:hh, 0:ww]
        base = (7 * xx + 13 * yy + int(h[i] % np.uint64(251))) % 256
        tex = splitmix64((yy.astype(np.uint64) * np.uint64(ww)
                          + xx.astype(np.uint64)) + h[i]) % np.uint64(64)
        img = ((base + tex.astype(np.int64)) % 256).astype(np.uint8)
        sel = int(h[i] % np.uint64(3))
        if sel == 0:  # baseline JPEG
            quality = 85 + int((h[i] >> np.uint64(16)) % np.uint64(11))
            if int(h[i] >> np.uint64(24)) % 2:
                rgb = np.stack([img, np.roll(img, 1, axis=1),
                                np.roll(img, 1, axis=0)], axis=2)
                sub = "420" if int(h[i] >> np.uint64(32)) % 2 else "444"
                payloads.append(encode_jpeg(
                    rgb, quality=quality, subsample=sub,
                    restart_interval=int(h[i] % np.uint64(4))))
            else:
                payloads.append(encode_jpeg(img, quality=quality))
            ext = "jpg"
        else:
            payloads.append(encode_png(
                img, filter_type=int(h[i] % np.uint64(5))))
            ext = "png"
        urls.append(f"https://img{int(h[i]) % 100}.example/{i}.{ext}")
        ws.append(ww)
        hs.append(hh)
    return pa.table({
        "item_id": ids,
        "url": pa.array(urls, pa.string()),
        "media_type": pa.array(["image"] * n_rows, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(np.asarray(ws, np.int32)),
        "height": pa.array(np.asarray(hs, np.int32)),
        "duration_ms": pa.array(np.zeros(n_rows, np.int32)),
    }, schema=MEDIA_SCHEMA)


def synth_audio_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Media rows whose audio payloads are REAL encoded WAV files
    (functions/wav.py): mono 16-bit PCM sawtooth-like integer signals with
    per-item splitmix64-derived length / rate / slope / phase, so a DuckDB
    oracle can regenerate the exact samples and aggregate the same features
    (pipelines/queries_media2.py). Every 5th item carries a LIST metadata
    chunk before ``data`` to exercise the reader's chunk-skip path."""
    from ..functions.wav import encode_wav
    from ..sources.synthetic import splitmix64

    ids = np.arange(n_rows, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    rates = np.array([8000, 16000, 22050], np.int64)[
        ((h >> np.uint64(4)) % np.uint64(3)).astype(np.int64)]
    ns = (500 + (h % np.uint64(1500)).astype(np.int64))
    payloads = []
    for i in range(n_rows):
        a = 1 + int((h[i] >> np.uint64(8)) % np.uint64(64))
        b = int((h[i] >> np.uint64(16)) % np.uint64(4096))
        t = np.arange(ns[i], dtype=np.int64)
        s = ((a * t + b) % 4096 - 2048).astype(np.int16)
        extra = ((b"LIST", b"INFOISFT" + struct_pack_meta(i))
                 if int(h[i] % np.uint64(5)) == 0 else None)
        payloads.append(encode_wav(s, int(rates[i]),
                                   extra_chunks=(extra,) if extra else ()))
    return pa.table({
        "item_id": ids,
        "url": pa.array([f"https://audio{int(x) % 100}.example/{i}.wav"
                         for i, x in enumerate(h)], pa.string()),
        "media_type": pa.array(["audio"] * n_rows, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(np.zeros(n_rows, np.int32)),
        "height": pa.array(np.zeros(n_rows, np.int32)),
        "duration_ms": pa.array((ns * 1000 // rates).astype(np.int32)),
    }, schema=MEDIA_SCHEMA)


def struct_pack_meta(i: int) -> bytes:
    """Odd-length LIST payload (forces the RIFF pad byte on odd items)."""
    tag = f"synth-{i}".encode()
    return tag + (b"\x00" if (len(tag) + 8) % 2 == 0 else b"")


def synth_video_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Media rows whose video payloads are REAL animated GIFs
    (functions/gif.py): per-item splitmix64-derived size / frame count /
    uniform frame delay, frame k pixel (y, x) = (a*x + b*y + c*k + d) % 256
    — a closed form a DuckDB oracle regenerates to check the decoded
    per-frame pixel sums (pipelines/queries_media2.py)."""
    from ..functions.gif import encode_gif
    from ..sources.synthetic import splitmix64

    ids = np.arange(n_rows, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(seed))
    pal = np.stack([np.arange(256), (255 - np.arange(256)),
                    (np.arange(256) * 7) % 256], axis=1).astype(np.uint8)
    payloads, durs = [], []
    for i in range(n_rows):
        w = 8 + int(h[i] % np.uint64(16))
        ht = 8 + int((h[i] >> np.uint64(5)) % np.uint64(16))
        nf = 2 + int((h[i] >> np.uint64(10)) % np.uint64(7))
        delay = 4 + int((h[i] >> np.uint64(13)) % np.uint64(16))
        a = 1 + int((h[i] >> np.uint64(18)) % np.uint64(32))
        b = 1 + int((h[i] >> np.uint64(23)) % np.uint64(32))
        c = 1 + int((h[i] >> np.uint64(28)) % np.uint64(64))
        d = int((h[i] >> np.uint64(34)) % np.uint64(256))
        yy, xx = np.mgrid[0:ht, 0:w]
        frames = [((a * xx + b * yy + c * k + d) % 256).astype(np.uint8)
                  for k in range(nf)]
        payloads.append(encode_gif(frames, pal, delays_cs=[delay] * nf))
        durs.append(nf * delay * 10)
    return pa.table({
        "item_id": ids,
        "url": pa.array([f"https://video{int(x) % 100}.example/{i}.gif"
                         for i, x in enumerate(h)], pa.string()),
        "media_type": pa.array(["video"] * n_rows, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array((8 + (h % np.uint64(16))).astype(np.int32)),
        "height": pa.array(
            (8 + ((h >> np.uint64(5)) % np.uint64(16))).astype(np.int32)),
        "duration_ms": pa.array(np.asarray(durs, np.int32)),
    }, schema=MEDIA_SCHEMA)


class WavFeatureExtract:
    """Actor-pool stage: REAL WAV container parse -> integer audio features
    (sample count, rate, energy, zero crossings, peak). Pure-int outputs so
    the DuckDB oracle hash-matches; the decode itself (RIFF walk, fmt
    validation, chunk skip) runs on every payload."""

    def __init__(self):
        from ..functions.wav import decode_wav

        self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        out = np.empty((n, 5), np.int64)
        for i, p in enumerate(batch["payload"].to_pylist()):
            samples, rate = self._decode(p)
            s = samples.astype(np.int64).mean(axis=1, dtype=np.int64) \
                if samples.shape[1] > 1 else samples[:, 0].astype(np.int64)
            neg = s < 0
            out[i] = (len(s), rate, int((s * s).sum()),
                      int((neg[1:] != neg[:-1]).sum()),
                      int(np.abs(s).max(initial=0)))
        return pa.table({
            "item_id": batch["item_id"],
            "n_samples": out[:, 0], "sample_rate": out[:, 1],
            "sum_sq": out[:, 2], "zero_cross": out[:, 3],
            "peak_abs": out[:, 4],
        })


class WavWindowedRms:
    """Actor-pool stage: decoded WAV -> per-window integer energy rows
    (non-overlapping ``window`` samples; the last window may be partial).
    The windowed-DSP explode shape: one media row fans out to n//window
    feature rows."""

    def __init__(self, window: int = 256):
        from ..functions.wav import decode_wav

        self.window = window
        self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widx, wn, ssq = [], [], [], []
        items = batch["item_id"].to_numpy(zero_copy_only=False)
        for i, p in enumerate(batch["payload"].to_pylist()):
            samples, _rate = self._decode(p)
            s = samples[:, 0].astype(np.int64)
            for k in range(0, len(s), self.window):
                seg = s[k:k + self.window]
                ids.append(int(items[i]))
                widx.append(k // self.window)
                wn.append(len(seg))
                ssq.append(int((seg * seg).sum()))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "w_idx": pa.array(widx, pa.int64()),
            "n_samples": pa.array(wn, pa.int64()),
            "sum_sq": pa.array(ssq, pa.int64()),
        })


class GifTemporalDiff:
    """Actor-pool stage: decoded GIF -> per-consecutive-frame-pair motion
    features (sum of absolute pixel-index change + changed-pixel count) —
    the temporal-video-feature shape over a real animated container."""

    def __init__(self):
        from ..functions.gif import decode_gif

        self._decode = decode_gif

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, dsum, nchg = [], [], [], []
        items = batch["item_id"].to_numpy(zero_copy_only=False)
        for i, p in enumerate(batch["payload"].to_pylist()):
            frames, _pal, _delays = self._decode(p)
            for k in range(1, len(frames)):
                d = frames[k].astype(np.int64) - frames[k - 1].astype(np.int64)
                ids.append(int(items[i]))
                fidx.append(k)
                dsum.append(int(np.abs(d).sum()))
                nchg.append(int((d != 0).sum()))
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "abs_diff_sum": pa.array(dsum, pa.int64()),
            "n_changed": pa.array(nchg, pa.int64()),
        })


class MediaFeatureExtract:
    """Actor-pool stage: decode (stub) -> per-item feature vector.

    Real pattern: the (heavy) codec/model loads once per actor in __init__;
    __call__ processes small batches (binary payloads are wide — batch_size
    must be small so batch x concurrency fits worker heaps).
    """

    def __init__(self, fake_decode: bool = False, feature_dim: int = 16):
        self.fake = fake_decode
        self.dim = feature_dim
        # model-load stand-in: a fixed projection matrix built once per actor
        rng = np.random.default_rng(7)
        self.proj = rng.standard_normal((48 * 48, feature_dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.empty((len(batch), self.dim))
        payloads = batch["payload"].to_pylist()
        kinds = batch["media_type"].to_pylist()
        for i, (p, kind) in enumerate(zip(payloads, kinds)):
            if self.fake:
                img = decode_image(p, fake=True).astype(np.float64)
            elif kind == "image":
                img = decode_image(p).astype(np.float64)
                if img.ndim == 3:
                    img = img.mean(axis=2)  # luminance-ish collapse
                img = resize_nearest(img, 48, 48)
            else:
                # audio payload: int16 PCM interpretation, folded into the
                # same fixed-size frame for the shared projection
                pcm = np.frombuffer(p[: 48 * 48 * 2], np.int16)                     .astype(np.float64) / 256.0
                pcm = np.pad(pcm, (0, 48 * 48 - len(pcm)))
                img = pcm.reshape(48, 48)
            feats[i] = img.ravel() @ self.proj
        return pa.table({
            "item_id": batch["item_id"],
            "media_type": batch["media_type"],
            "feature": pa.array(list(feats), pa.list_(pa.float64(), self.dim)),
        })


class FrameSampler:
    """Actor-pool stage: video frame sampling — REAL decode for animated
    GIF payloads (functions/gif.py), duration-based fan-out for opaque
    (undecodable) payloads.

    GIF path: decode all frames, keep every ``step``-th frame where
    ``step = max(1, stride_ms // frame_delay_ms)``, and emit the sampled
    frame's pixel-index sum + size — real per-frame features from a real
    animated container. Opaque path: one row per ``stride_ms`` of metadata
    duration with n_px = pix_sum = -1 (the fan-out shape without a codec).
    """

    def __init__(self, stride_ms: int = 10_000):
        from ..functions.gif import decode_gif

        self.stride = stride_ms
        self._decode = decode_gif

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, ts, npx, psum = [], [], [], [], []
        dur = batch["duration_ms"].to_numpy(zero_copy_only=False)
        item = batch["item_id"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        for i in range(len(batch)):
            p = payloads[i]
            if p[:4] == b"GIF8":
                fr, _pal, delays = self._decode(p)
                step = max(1, self.stride // max(1, delays[0] * 10))
                t_cum = np.concatenate(
                    [[0], np.cumsum(np.asarray(delays[:-1], np.int64)) * 10])
                for k in range(0, len(fr), step):
                    ids.append(int(item[i]))
                    frames.append(k)
                    ts.append(int(t_cum[k]))
                    npx.append(fr[k].size)
                    psum.append(int(fr[k].astype(np.int64).sum()))
            else:
                n = max(1, int(dur[i]) // self.stride)
                for k in range(n):
                    ids.append(int(item[i]))
                    frames.append(k)
                    ts.append(k * self.stride)
                    npx.append(-1)
                    psum.append(-1)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int64()),
            "ts_ms": pa.array(ts, pa.int64()),
            "n_px": pa.array(npx, pa.int64()),
            "pix_sum": pa.array(psum, pa.int64()),
        })


def media_feature_pipeline(media: ray.data.Dataset, *, batch_size: int = 256,
                           concurrency=None,
                           fake_decode: bool = False) -> ray.data.Dataset:
    """images/audio -> feature vectors (actor pool, small batches for wide
    binary rows), videos -> sampled frames. Returns the feature dataset."""
    import pyarrow.compute as pc

    from ..config import actor_pool

    if concurrency is None:
        concurrency = actor_pool()  # scale the pool with cluster CPUs
    # vectorized Arrow mask, not a per-row Python filter
    imgs = media.map_batches(
        lambda t: t.filter(pc.not_equal(t["media_type"], "video")),
        batch_format="pyarrow")
    return imgs.map_batches(MediaFeatureExtract, batch_size=batch_size,
                            batch_format="pyarrow", concurrency=concurrency,
                            fn_constructor_kwargs={
                                "fake_decode": fake_decode})
