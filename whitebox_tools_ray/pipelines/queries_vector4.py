"""Vector sweep #4: SplitWithLines (gis_analysis/split_with_lines.rs).

The reference splits polygons (or lines) with the features of a polyline
layer. The contract here follows the overlay family's probe-region
design: each star polygon A is split by the straight line through its
centre along a FIXED unit direction (STAR_DIRS[pair % 12], the same
double literals on both sides); the Ray side performs the REAL split —
two Sutherland-Hodgman half-plane clips producing the two piece rings —
and classifies the shared 5x5 probe grid against those rings (even-odd),
while the DuckDB oracle classifies the same probes by region algebra:
piece = 0 outside A, 1 on the left of the split line, 2 on the right.
Any probe the reconstructed pieces cover differently hash-fails.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources.synthetic import splitmix64
from ..stardefs import (_SALT, _star_sql, _units, N_PAIRS, PROBE_N,
                        PROBES_SQL, STAR_DIRS, STAR_K, probe_grid,
                        star_rings)
from .queries import query

_SPLIT_SQL = f"""
    WITH {_star_sql()},
    {PROBES_SQL}
    SELECT m.pair_id, m.probe_id,
           CAST(CASE WHEN NOT m.in_a THEN 0
                     WHEN (p.px - c.cxa) * (-d.dy)
                          + (p.py - c.cya) * d.dx > 0 THEN 1
                     ELSE 2 END AS BIGINT) AS piece
    FROM membership m
    JOIN probes p ON p.pair_id = m.pair_id AND p.probe_id = m.probe_id
    JOIN centres c ON c.p = m.pair_id
    JOIN dirs d ON d.k = m.pair_id % {STAR_K}
"""


@query("split_with_lines", _SPLIT_SQL)
def split_with_lines(sf_dir: str):
    """SplitWithLines (gis_analysis/split_with_lines.rs) under the
    probe-region contract (module docstring). Output
    (pair_id, probe_id, piece) int64."""
    import ray.data

    from ..geometry import clip_polygon_convex
    from ..stages.overlay import region_inside

    ids = ray.data.range(N_PAIRS, override_num_blocks=8)
    big = 1000.0

    def per_pair(batch: dict) -> pd.DataFrame:
        pids = batch["id"].astype(np.int64)
        A, B = star_rings(pids)
        px, py = probe_grid(A, B)
        h = splitmix64(pids.astype(np.uint64) + np.uint64(_SALT))
        cxa = _units(h, 1) * 300.0 - 150.0
        cya = _units(h, 2) * 140.0 - 70.0
        frames = []
        for i, pid in enumerate(pids):
            ux, uy = STAR_DIRS[int(pid) % STAR_K]
            cx, cy = cxa[i], cya[i]
            p0 = np.array([cx - big * ux, cy - big * uy])
            p1 = np.array([cx + big * ux, cy + big * uy])
            nv = np.array([-uy, ux])  # left normal of the split direction

            def halfplane_rect(sign: float) -> np.ndarray:
                a = p0 + 0.0
                b = p1 + 0.0
                c2 = p1 + sign * big * nv
                d2 = p0 + sign * big * nv
                ring = np.array([a, b, c2, d2, a])
                # clip_polygon_convex needs CLOCKWISE clip rings; the left
                # rectangle (sign +1) as listed is counter-clockwise
                return ring[::-1] if sign > 0 else ring

            left = clip_polygon_convex(A[i], halfplane_rect(+1.0))
            right = clip_polygon_convex(A[i], halfplane_rect(-1.0))
            in_l = region_inside([left] if len(left) else [], px[i], py[i])
            in_r = region_inside([right] if len(right) else [], px[i], py[i])
            piece = np.where(in_l, 1, np.where(in_r, 2, 0)).astype(np.int64)
            frames.append(pd.DataFrame({
                "pair_id": np.full(PROBE_N * PROBE_N, pid, np.int64),
                "probe_id": np.arange(PROBE_N * PROBE_N, dtype=np.int64),
                "piece": piece}))
        return pd.concat(frames, ignore_index=True)

    return ids.map_batches(per_pair, batch_format="numpy")


@query("split_with_lines_rings")
def split_with_lines_rings(sf_dir: str):
    """SplitWithLines RING OUTPUT (gis_analysis/split_with_lines.rs;
    round-3 VERDICT item 6): the two Sutherland-Hodgman piece rings as
    (pair_id, piece, vtx_idx, x_micro, y_micro) rows — the same rings
    whose region the SQL-backed split_with_lines entry verifies. Rows-only;
    ring-structure oracle in tests/test_overlay.py."""
    import ray.data

    from ..geometry import clip_polygon_convex

    ids = ray.data.range(N_PAIRS, override_num_blocks=8)
    big = 1000.0

    def per_pair(batch: dict) -> pd.DataFrame:
        pids = batch["id"].astype(np.int64)
        A, _B = star_rings(pids)
        h = splitmix64(pids.astype(np.uint64) + np.uint64(_SALT))
        cxa = _units(h, 1) * 300.0 - 150.0
        cya = _units(h, 2) * 140.0 - 70.0
        frames = []
        for i, pid in enumerate(pids):
            ux, uy = STAR_DIRS[int(pid) % STAR_K]
            cx, cy = cxa[i], cya[i]
            p0 = np.array([cx - big * ux, cy - big * uy])
            p1 = np.array([cx + big * ux, cy + big * uy])
            nv = np.array([-uy, ux])

            def halfplane_rect(sign: float) -> np.ndarray:
                ring = np.array([p0, p1, p1 + sign * big * nv,
                                 p0 + sign * big * nv, p0])
                return ring[::-1] if sign > 0 else ring

            for piece, sign in ((1, +1.0), (2, -1.0)):
                ring = clip_polygon_convex(A[i], halfplane_rect(sign))
                if not len(ring):
                    continue
                frames.append(pd.DataFrame({
                    "pair_id": np.full(len(ring), pid, np.int64),
                    "piece": np.full(len(ring), piece, np.int64),
                    "vtx_idx": np.arange(len(ring), dtype=np.int64),
                    "x_micro": np.floor(ring[:, 0] * 1e6 + 0.5)
                    .astype(np.int64),
                    "y_micro": np.floor(ring[:, 1] * 1e6 + 0.5)
                    .astype(np.int64)}))
        if not frames:
            return pd.DataFrame({k: np.empty(0, np.int64) for k in
                                 ("pair_id", "piece", "vtx_idx",
                                  "x_micro", "y_micro")})
        return pd.concat(frames, ignore_index=True)

    return ids.map_batches(per_pair, batch_format="numpy")
