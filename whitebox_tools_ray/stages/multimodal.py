"""Multimodal (image/audio/video) column plumbing — decode stubbed.

Driver mandate: treat media as opaque ``binary`` columns with typed metadata;
implement decode / feature-extract / resize / frame-sample as actor-pool
``map_batches`` stages. The image/audio libraries are not in this container,
so the codec boundary is stubbed (``decode_image`` raises NotImplementedError
unless the deterministic fake decoder is selected) — but everything Ray-side
is real and tested: schema, batch sizing for large binary payloads, actor
signature, zero-copy binary handling, partitioned output layout.

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
    """Codec boundary. Real decode needs PIL/cv2 (absent in this container):
    raises NotImplementedError. The deterministic fake decoder hashes payload
    bytes into a small pseudo-image so downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "(deterministic stub) or install PIL/cv2 at deployment")
    arr = np.frombuffer(payload[: 48 * 48], dtype=np.uint8)
    arr = np.pad(arr, (0, 48 * 48 - len(arr)))
    return arr.reshape(48, 48)


class MediaFeatureExtract:
    """Actor-pool stage: decode (stub) -> per-item feature vector.

    Real pattern: the (heavy) codec/model loads once per actor in __init__;
    __call__ processes small batches (binary payloads are wide — batch_size
    must be small so batch x concurrency fits worker heaps).
    """

    def __init__(self, fake_decode: bool = True, feature_dim: int = 16):
        self.fake = fake_decode
        self.dim = feature_dim
        # model-load stand-in: a fixed projection matrix built once per actor
        rng = np.random.default_rng(7)
        self.proj = rng.standard_normal((48 * 48, feature_dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.empty((len(batch), self.dim))
        payloads = batch["payload"].to_pylist()
        for i, p in enumerate(payloads):
            img = decode_image(p, fake=self.fake).astype(np.float64).ravel()
            feats[i] = img @ self.proj
        return pa.table({
            "item_id": batch["item_id"],
            "media_type": batch["media_type"],
            "feature": pa.array(list(feats), pa.list_(pa.float64(), self.dim)),
        })


class FrameSampler:
    """Actor-pool stage: video frame-sample plumbing (stubbed decode).

    Emits one row per sampled frame index (every ``stride_ms``) with the
    frame payload slice — at deployment the slice becomes a real frame
    decode; the fan-out/row-explosion shape is what matters to the engine.
    """

    def __init__(self, stride_ms: int = 10_000):
        self.stride = stride_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, ts = [], [], []
        dur = batch["duration_ms"].to_numpy(zero_copy_only=False)
        item = batch["item_id"].to_numpy(zero_copy_only=False)
        for i in range(len(batch)):
            n = max(1, int(dur[i]) // self.stride)
            for k in range(n):
                ids.append(int(item[i]))
                frames.append(k)
                ts.append(k * self.stride)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
            "ts_ms": pa.array(ts, pa.int32()),
        })


def media_feature_pipeline(media: ray.data.Dataset, *, batch_size: int = 256,
                           concurrency=None) -> ray.data.Dataset:
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
                            batch_format="pyarrow", concurrency=concurrency)
