"""General polygon overlay queries (V family): Intersect / Union /
Difference / SymmetricalDifference on non-convex star pairs, driver-checked.

The overlay itself (stages/overlay.greiner_hormann) produces result RINGS;
the driver-checkable contract is the REGION they encode: each query
classifies a deterministic probe grid against the overlay result rings
(even-odd), while the DuckDB oracle classifies the same probes against the
region algebra of the INPUT rings (inside_A <op> inside_B) — if the
reassembled rings encode the wrong region anywhere near a probe, the hash
diverges. Ring-level structure is additionally pytest-checked by dense
sampling (tests/test_overlay.py).

Fixtures: 200 pairs of 12-vertex radial star polygons (alternating radii →
non-convex, single-valued in angle → simple). Unit direction vectors are
FIXED Python float literals shared verbatim with the SQL text; radii/centres
come from splitmix64, so both sides build bit-identical vertices.

Reference: gis_analysis/{intersect,union,difference,
symmetrical_difference}.rs; split machinery line_ops.rs:138.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources.synthetic import splitmix64
from .queries import query
from .sqlgen import add64, sm64

from ..stardefs import (N_PAIRS, PROBE_N, STAR_DIRS, STAR_K, _SALT,  # noqa: F401
                        PROBES_SQL as _PROBES_SQL, _star_sql, _units,
                        probe_grid, star_rings)


def _overlay_query(op: str):
    def run(sf_dir: str):
        import ray.data

        from ..stages.overlay import greiner_hormann, region_inside

        ids = ray.data.range(N_PAIRS, override_num_blocks=8)

        def per_pair(batch: dict) -> pd.DataFrame:
            pids = batch["id"].astype(np.int64)
            A, B = star_rings(pids)
            px, py = probe_grid(A, B)
            frames = []
            for i, pid in enumerate(pids):
                rings = greiner_hormann(A[i], B[i], op)
                inside = region_inside(rings, px[i], py[i])
                frames.append(pd.DataFrame({
                    "pair_id": np.full(PROBE_N * PROBE_N, pid, np.int64),
                    "probe_id": np.arange(PROBE_N * PROBE_N, dtype=np.int64),
                    "inside": inside.astype(np.int64),
                }))
            return pd.concat(frames, ignore_index=True)

        return ids.map_batches(per_pair, batch_format="numpy")

    return run



_OP_PRED = {
    "intersect": "in_a AND in_b",
    "union": "in_a OR in_b",
    "difference": "in_a AND NOT in_b",
    "symdiff": "in_a != in_b",
}

for _op, _pred in _OP_PRED.items():
    query(f"overlay_{_op}_probes", f"""
    WITH {_star_sql()},
    {_PROBES_SQL}
    SELECT pair_id, probe_id,
           CAST(CASE WHEN {_pred} THEN 1 ELSE 0 END AS BIGINT) AS inside
    FROM membership
    """)(_overlay_query(_op))


def _rings_query(op: str):
    def run(sf_dir: str):
        import ray.data

        from ..stages.overlay import greiner_hormann

        ids = ray.data.range(N_PAIRS, override_num_blocks=8)

        def per_pair(batch: dict) -> pd.DataFrame:
            pids = batch["id"].astype(np.int64)
            A, B = star_rings(pids)
            frames = []
            for i, pid in enumerate(pids):
                rings = greiner_hormann(A[i], B[i], op)
                for ri, ring in enumerate(rings):
                    nv = len(ring)
                    # signed double area: orientation is part of the
                    # geometry contract (holes are CW under even-odd)
                    x, y = ring[:, 0], ring[:, 1]
                    a2 = float(np.sum(x * np.roll(y, -1)
                                      - np.roll(x, -1) * y))
                    frames.append(pd.DataFrame({
                        "pair_id": np.full(nv, pid, np.int64),
                        "ring_idx": np.full(nv, ri, np.int64),
                        "vtx_idx": np.arange(nv, dtype=np.int64),
                        "x_micro": np.floor(x * 1e6 + 0.5).astype(np.int64),
                        "y_micro": np.floor(y * 1e6 + 0.5).astype(np.int64),
                        "area2_sign": np.full(
                            nv, np.sign(a2).astype(np.int64), np.int64),
                    }))
            if not frames:
                return pd.DataFrame({
                    "pair_id": np.empty(0, np.int64),
                    "ring_idx": np.empty(0, np.int64),
                    "vtx_idx": np.empty(0, np.int64),
                    "x_micro": np.empty(0, np.int64),
                    "y_micro": np.empty(0, np.int64),
                    "area2_sign": np.empty(0, np.int64)})
            return pd.concat(frames, ignore_index=True)

        return ids.map_batches(per_pair, batch_format="numpy")

    run.__name__ = f"overlay_{op}_rings"
    run.__doc__ = f"""Vector overlay RING OUTPUT (gis_analysis/{op if op != 'symdiff' else 'symmetrical_difference'}.rs
    ring reassembly; round-3 VERDICT item 6): the actual Greiner-Hormann
    result geometry as (pair_id, ring_idx, vtx_idx, x_micro, y_micro,
    area2_sign) rows — the same rings whose REGION the SQL-backed
    overlay_{op}_probes entry verifies against the input region algebra.
    Rows-only; ring-structure oracle (closure, orientation, region
    equivalence by dense sampling) in tests/test_overlay.py."""
    return run


for _op in _OP_PRED:
    query(f"overlay_{_op}_rings")(_rings_query(_op))
