"""Broadcast point-in-polygon stages (Clip / Erase / zonal tagging).

Ray-Data plan for the reference's Clip point branch (gis_analysis/clip.rs:
299-370): the polygon layer is packed once on the driver (PackedPolygons),
put in the object store with ``ray.put``, and each actor of a
``map_batches(ClipPoints, concurrency=N)`` pool fetches it ONCE in
``__init__``. Per batch the kernel is fully vectorized: bbox prefilter then
exact winding-number test, parts evaluated in file order so the reference's
"last tested part wins" hole semantics hold exactly.

At 100 TB scale the polygon layer stays O(MB) (it is the small side); the
page/point side streams through the actor pool with zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geometry import PackedPolygons


class ClipPoints:
    """Keep rows whose (x, y) survives the clip layer (Clip tool analog)."""

    def __init__(self, polygons_ref, x_col: str = "x", y_col: str = "y", negate: bool = False):
        # one object-store fetch per ACTOR, not per batch
        obj = ray.get(polygons_ref) if isinstance(polygons_ref, ray.ObjectRef) else polygons_ref
        self.polys: PackedPolygons = obj
        self.x_col, self.y_col, self.negate = x_col, y_col, negate

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = self.polys.clip_mask(
            batch[self.x_col].to_numpy(zero_copy_only=False),
            batch[self.y_col].to_numpy(zero_copy_only=False),
        )
        if self.negate:  # Erase tool analog (gis_analysis/erase.rs)
            keep = ~keep
        return batch.filter(pa.array(keep))


class TagPolygon:
    """Emit one row per (point, containing feature) — the PIP join.

    Unlike clip, feature identity is preserved (per-feature hole logic), which
    is what zonal statistics / JoinTables-style attribute transfer need.
    """

    def __init__(self, polygons_ref, x_col: str = "x", y_col: str = "y"):
        obj = ray.get(polygons_ref) if isinstance(polygons_ref, ray.ObjectRef) else polygons_ref
        self.polys: PackedPolygons = obj
        self.x_col, self.y_col = x_col, y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx, fid = self.polys.pip_pairs(
            batch[self.x_col].to_numpy(zero_copy_only=False),
            batch[self.y_col].to_numpy(zero_copy_only=False),
        )
        out = batch.take(pa.array(idx))
        return out.append_column("poly_id", pa.array(fid))


# Per-worker-process cache of deserialized broadcast objects. Stateless map
# tasks reuse long-lived worker processes; caching here gives actor-pool
# economics (one fetch+unpickle per worker) without actor-pool SPAWN cost,
# which measurably dominates small-state stages (an actor pool of 24 costs
# tens of seconds of cold start; tasks reuse already-warm workers).
_BROADCAST_CACHE: dict = {}


def _cached_get(ref):
    key = ref.hex() if isinstance(ref, ray.ObjectRef) else id(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
    return _BROADCAST_CACHE[key]


def clip_points(ds, polygons: PackedPolygons, *, negate: bool = False,
                x_col: str = "x", y_col: str = "y",
                concurrency: int | tuple | None = None, batch_size: int = 65536):
    ref = ray.put(polygons)

    def clip_batch(batch: pa.Table) -> pa.Table:
        polys: PackedPolygons = _cached_get(ref)
        keep = polys.clip_mask(
            batch[x_col].to_numpy(zero_copy_only=False),
            batch[y_col].to_numpy(zero_copy_only=False),
        )
        if negate:
            keep = ~keep
        return batch.filter(pa.array(keep))

    return ds.map_batches(clip_batch, batch_format="pyarrow", batch_size=batch_size)


def tag_polygons(ds, polygons: PackedPolygons, *,
                 concurrency: int | tuple | None = None, batch_size: int = 65536):
    ref = ray.put(polygons)

    def tag_batch(batch: pa.Table) -> pa.Table:
        polys: PackedPolygons = _cached_get(ref)
        idx, fid = polys.pip_pairs(
            batch["x"].to_numpy(zero_copy_only=False),
            batch["y"].to_numpy(zero_copy_only=False),
        )
        out = batch.take(pa.array(idx))
        return out.append_column("poly_id", pa.array(fid))

    return ds.map_batches(tag_batch, batch_format="pyarrow", batch_size=batch_size)
