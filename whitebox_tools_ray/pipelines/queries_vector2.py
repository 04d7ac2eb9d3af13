"""Vector buffer (gis_analysis/buffer_vector.rs, 1,904 LoC) with the overlay
family's probe-region contract: the engine represents the buffer of each
polyline as the union of per-segment CAPSULES (the offset-rings + dissolve
of the reference collapse to exactly this region) and classifies a
deterministic probe grid against it; the DuckDB oracle classifies the same
probes against the point-to-segment distance field — identical float
expression trees on both sides, so the hash is bit-exact.

Fixture: 100 deterministic 6-segment polylines from splitmix64 (start point
+ bounded random steps), buffer radius 1.5; 6x6 probe grid per line over the
bbox inflated by the radius.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources.synthetic import splitmix64
from .queries import query
from .sqlgen import add64, sm64

N_LINES = 100
N_SEGS = 6
BUF_R = 1.5
BUF_SALT = 737271
BPROBE_N = 6


def _units(h: np.ndarray, off: int) -> np.ndarray:
    return (splitmix64(h + np.uint64(off)) % np.uint64(1 << 30)) \
        .astype(np.float64) / float(1 << 30)


def buffer_lines(line_ids: np.ndarray) -> np.ndarray:
    """(n, N_SEGS+1, 2) polyline vertices — cumulative bounded steps."""
    h = splitmix64(line_ids.astype(np.uint64) + np.uint64(BUF_SALT))
    n = len(line_ids)
    v = np.empty((n, N_SEGS + 1, 2))
    v[:, 0, 0] = _units(h, 1) * 300.0 - 150.0
    v[:, 0, 1] = _units(h, 2) * 140.0 - 70.0
    for k in range(N_SEGS):
        v[:, k + 1, 0] = v[:, k, 0] + (_units(h, 10 + 2 * k) * 6.0 - 3.0)
        v[:, k + 1, 1] = v[:, k, 1] + (_units(h, 11 + 2 * k) * 6.0 - 3.0)
    return v


def _buffer_probes(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 36) probe coordinates over the bbox inflated by BUF_R."""
    xmin = v[:, :, 0].min(axis=1) - BUF_R
    xmax = v[:, :, 0].max(axis=1) + BUF_R
    ymin = v[:, :, 1].min(axis=1) - BUF_R
    ymax = v[:, :, 1].max(axis=1) + BUF_R
    jx, jy = np.meshgrid(np.arange(BPROBE_N), np.arange(BPROBE_N), indexing="ij")
    fx = (jx.ravel() + 0.5) / float(BPROBE_N)
    fy = (jy.ravel() + 0.5) / float(BPROBE_N)
    px = xmin[:, None] + fx[None, :] * (xmax - xmin)[:, None]
    py = ymin[:, None] + fy[None, :] * (ymax - ymin)[:, None]
    return px, py


def capsule_inside(v: np.ndarray, px: np.ndarray, py: np.ndarray,
                   r: float = BUF_R) -> np.ndarray:
    """(n, n_probes) bool: probe within distance r of ANY segment — the
    capsule-union buffer region. The exact expression tree (projection
    clamp, squared distance) is mirrored verbatim in the SQL oracle."""
    inside = np.zeros(px.shape, bool)
    for k in range(v.shape[1] - 1):
        x0 = v[:, k, 0][:, None]; y0 = v[:, k, 1][:, None]
        x1 = v[:, k + 1, 0][:, None]; y1 = v[:, k + 1, 1][:, None]
        dx = x1 - x0; dy = y1 - y0
        l2 = dx * dx + dy * dy
        t = ((px - x0) * dx + (py - y0) * dy) / l2
        t = np.minimum(1.0, np.maximum(0.0, t))
        ex = px - (x0 + t * dx)
        ey = py - (y0 + t * dy)
        inside |= (ex * ex + ey * ey) <= r * r
    return inside


def _buffer_sql() -> str:
    h = sm64(add64("CAST(i AS UBIGINT)", str(BUF_SALT)))

    def unit(off: str) -> str:
        return (f"(CAST({sm64(add64('h', off))} % 1073741824 AS DOUBLE)"
                f" / 1073741824.0)")

    return f"""
    lh AS MATERIALIZED (SELECT CAST(i AS BIGINT) AS line_id, {h} AS h
                        FROM range({N_LINES}) t(i)),
    steps AS MATERIALIZED (
      SELECT line_id, CAST(k.i AS BIGINT) AS k,
             {unit('10 + 2 * k.i')} * 6.0 - 3.0 AS sx,
             {unit('11 + 2 * k.i')} * 6.0 - 3.0 AS sy
      FROM lh, range({N_SEGS}) k(i)
    ),
    verts AS MATERIALIZED (
      SELECT l.line_id, CAST(k.i AS BIGINT) AS k,
             ({unit('1')} * 300.0 - 150.0)
             + COALESCE((SELECT SUM(s.sx) FROM steps s
                         WHERE s.line_id = l.line_id AND s.k < k.i), 0.0) AS x,
             ({unit('2')} * 140.0 - 70.0)
             + COALESCE((SELECT SUM(s.sy) FROM steps s
                         WHERE s.line_id = l.line_id AND s.k < k.i), 0.0) AS y
      FROM lh l, range({N_SEGS + 1}) k(i)
    )
    """


@query(
    "vector_buffer_probes",
    f"""
    WITH {_buffer_sql()},
    bbox AS (
      SELECT line_id, MIN(x) - {BUF_R!r} AS xmin, MAX(x) + {BUF_R!r} AS xmax,
             MIN(y) - {BUF_R!r} AS ymin, MAX(y) + {BUF_R!r} AS ymax
      FROM verts GROUP BY line_id
    ),
    probes AS MATERIALIZED (
      SELECT b.line_id, CAST(g.i AS BIGINT) AS probe_id,
             b.xmin + ((g.i // {BPROBE_N}) + 0.5) / {float(BPROBE_N)!r} * (b.xmax - b.xmin) AS px,
             b.ymin + ((g.i % {BPROBE_N}) + 0.5) / {float(BPROBE_N)!r} * (b.ymax - b.ymin) AS py
      FROM bbox b, range({BPROBE_N * BPROBE_N}) g(i)
    ),
    segs AS (
      SELECT v0.line_id, v0.x AS x0, v0.y AS y0, v1.x AS x1, v1.y AS y1
      FROM verts v0 JOIN verts v1
        ON v1.line_id = v0.line_id AND v1.k = v0.k + 1
    ),
    dist AS (
      SELECT p.line_id, p.probe_id,
        MAX(CASE WHEN
          (p.px - (s.x0 + LEAST(1.0, GREATEST(0.0,
             ((p.px - s.x0) * (s.x1 - s.x0) + (p.py - s.y0) * (s.y1 - s.y0))
             / ((s.x1 - s.x0) * (s.x1 - s.x0) + (s.y1 - s.y0) * (s.y1 - s.y0))))
             * (s.x1 - s.x0)))
          * (p.px - (s.x0 + LEAST(1.0, GREATEST(0.0,
             ((p.px - s.x0) * (s.x1 - s.x0) + (p.py - s.y0) * (s.y1 - s.y0))
             / ((s.x1 - s.x0) * (s.x1 - s.x0) + (s.y1 - s.y0) * (s.y1 - s.y0))))
             * (s.x1 - s.x0)))
          + (p.py - (s.y0 + LEAST(1.0, GREATEST(0.0,
             ((p.px - s.x0) * (s.x1 - s.x0) + (p.py - s.y0) * (s.y1 - s.y0))
             / ((s.x1 - s.x0) * (s.x1 - s.x0) + (s.y1 - s.y0) * (s.y1 - s.y0))))
             * (s.y1 - s.y0)))
          * (p.py - (s.y0 + LEAST(1.0, GREATEST(0.0,
             ((p.px - s.x0) * (s.x1 - s.x0) + (p.py - s.y0) * (s.y1 - s.y0))
             / ((s.x1 - s.x0) * (s.x1 - s.x0) + (s.y1 - s.y0) * (s.y1 - s.y0))))
             * (s.y1 - s.y0)))
          <= {BUF_R!r} * {BUF_R!r} THEN 1 ELSE 0 END) AS inside
      FROM probes p JOIN segs s ON s.line_id = p.line_id
      GROUP BY p.line_id, p.probe_id
    )
    SELECT line_id, probe_id, CAST(inside AS BIGINT) AS inside FROM dist
    """,
)
def vector_buffer_probes(sf_dir: str):
    """BufferVector (gis_analysis/buffer_vector.rs): polyline buffer as the
    dissolved union of per-segment capsules; a deterministic probe grid
    classifies the region (the driver contract), bit-exact vs the SQL
    distance-field oracle."""
    import ray.data

    ids = ray.data.range(N_LINES, override_num_blocks=4)

    def per_line(batch: dict) -> pd.DataFrame:
        lids = batch["id"].astype(np.int64)
        v = buffer_lines(lids)
        px, py = _buffer_probes(v)
        inside = capsule_inside(v, px, py)
        npb = BPROBE_N * BPROBE_N
        return pd.DataFrame({
            "line_id": np.repeat(lids, npb),
            "probe_id": np.tile(np.arange(npb, dtype=np.int64), len(lids)),
            "inside": inside.astype(np.int64).ravel()})

    return ids.map_batches(per_line, batch_format="numpy")
