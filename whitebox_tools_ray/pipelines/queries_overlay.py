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
                        _star_sql, _units, probe_grid, star_rings)


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


_PROBES_SQL = f"""
    bbox AS (
      SELECT pair_id, MIN(x) AS xmin, MAX(x) AS xmax,
             MIN(y) AS ymin, MAX(y) AS ymax
      FROM verts GROUP BY pair_id
    ),
    probes AS MATERIALIZED (
      SELECT b.pair_id, CAST(g.i AS BIGINT) AS probe_id,
             b.xmin + ((g.i // {PROBE_N}) + 0.5) / {float(PROBE_N)!r} * (b.xmax - b.xmin) AS px,
             b.ymin + ((g.i % {PROBE_N}) + 0.5) / {float(PROBE_N)!r} * (b.ymax - b.ymin) AS py
      FROM bbox b, range({PROBE_N * PROBE_N}) g(i)
    ),
    edges AS (
      SELECT v0.pair_id, v0.ring, v0.x AS x0, v0.y AS y0, v1.x AS x1, v1.y AS y1
      FROM verts v0 JOIN verts v1
        ON v1.pair_id = v0.pair_id AND v1.ring = v0.ring
       AND v1.k = (v0.k + 1) % {STAR_K}
    ),
    wind AS (
      SELECT p.pair_id, p.probe_id, e.ring,
        SUM(CASE WHEN e.y0 <= p.py AND e.y1 > p.py
                  AND (e.x1 - e.x0) * (p.py - e.y0) - (p.px - e.x0) * (e.y1 - e.y0) > 0
                 THEN 1 ELSE 0 END)
        - SUM(CASE WHEN e.y0 > p.py AND e.y1 <= p.py
                    AND (e.x1 - e.x0) * (p.py - e.y0) - (p.px - e.x0) * (e.y1 - e.y0) < 0
                   THEN 1 ELSE 0 END) AS wn
      FROM probes p JOIN edges e ON e.pair_id = p.pair_id
      GROUP BY p.pair_id, p.probe_id, e.ring
    ),
    membership AS (
      SELECT pair_id, probe_id,
             MAX(CASE WHEN ring = 0 THEN abs(wn) % 2 END) = 1 AS in_a,
             MAX(CASE WHEN ring = 1 THEN abs(wn) % 2 END) = 1 AS in_b
      FROM wind GROUP BY pair_id, probe_id
    )
"""

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
