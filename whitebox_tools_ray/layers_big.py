"""A 10,000-feature deterministic polygon layer (diamond quadrilaterals,
20% with holes) for the indexed / shuffled spatial-join paths.

The round-1 layer had 5 features, so a linear scan over parts per batch was
invisible; the north star mandates a cell->candidate-parts index and a
groupby-on-cell shuffle join (SURVEY.md section 2.3a; reference pre-indexes
the clip layer per record, gis_analysis/clip.rs:299-370). This layer makes
those paths measurable and their absence fatal.

Geometry is synthesized from splitmix64 with LINEAR float arithmetic only
(no trig), so the DuckDB oracle regenerates vertices bit-for-bit via
pipelines/sqlgen.sm64 and evaluates the same half-plane tests.

Feature i (h = splitmix64(i + seed*0x9E3779B9 + 7777)):
    centre   cx = u1*360-180, cy = u2*170-85         (u_k = 30-bit unit)
    arms     dx1, dy1, dx2, dy2 = 0.2 + u_{3..6}*1.8  (east/north/west/south)
    outer    (cx+dx1,cy) (cx,cy-dy2) (cx-dx2,cy) (cx,cy+dy1)  [closed]
    hole     same shape scaled by 1/3, iff h % 5 == 0 (strictly inside)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .geometry import PackedPolygons
from .sources.synthetic import splitmix64

N_DIAMONDS = 10_000
_SEED_OFF = np.uint64(42) * np.uint64(0x9E3779B9) + np.uint64(7777)


def diamond_params(n: int = N_DIAMONDS) -> pd.DataFrame:
    ids = np.arange(n, dtype=np.uint64)
    h = splitmix64(ids + _SEED_OFF)

    def unit(off: int) -> np.ndarray:
        return (splitmix64(h + np.uint64(off)) % np.uint64(1 << 30)) \
            .astype(np.float64) / float(1 << 30)

    return pd.DataFrame({
        "poly_id": ids.astype(np.int64),
        "cx": unit(1) * 360.0 - 180.0,
        "cy": unit(2) * 170.0 - 85.0,
        "dx1": 0.2 + unit(3) * 1.8,
        "dy1": 0.2 + unit(4) * 1.8,
        "dx2": 0.2 + unit(5) * 1.8,
        "dy2": 0.2 + unit(6) * 1.8,
        "has_hole": (h % np.uint64(5)) == 0,
    })


def _ring(cx, cy, dx1, dy1, dx2, dy2, scale: float = 1.0) -> np.ndarray:
    return np.array([
        [cx + dx1 * scale, cy],
        [cx, cy - dy2 * scale],
        [cx - dx2 * scale, cy],
        [cx, cy + dy1 * scale],
        [cx + dx1 * scale, cy],
    ], np.float64)


def packed_diamonds(n: int = N_DIAMONDS) -> PackedPolygons:
    p = diamond_params(n)
    feats = []
    for r in p.itertuples():
        parts = [(_ring(r.cx, r.cy, r.dx1, r.dy1, r.dx2, r.dy2), False)]
        if r.has_hole:
            parts.append((_ring(r.cx, r.cy, r.dx1, r.dy1, r.dx2, r.dy2,
                                scale=1.0 / 3.0), True))
        feats.append((int(r.poly_id), parts))
    return PackedPolygons.from_features(feats)


def parts_table(n: int = N_DIAMONDS) -> pd.DataFrame:
    """One row per part for the SHUFFLE join path: ring coords serialized as
    bytes (Arrow binary — list payloads don't survive Ray joins/shuffles),
    bbox columns for cell coverage, part order preserved in part_idx."""
    polys = packed_diamonds(n)
    return pd.DataFrame({
        "part_idx": np.arange(len(polys.rings), dtype=np.int64),
        "poly_id": polys.feature_id,
        "is_hole": polys.is_hole,
        "xmin": polys.bboxes[:, 0], "ymin": polys.bboxes[:, 1],
        "xmax": polys.bboxes[:, 2], "ymax": polys.bboxes[:, 3],
        "ring": [r.tobytes() for r in polys.rings],
    })


def diamonds_cte(n: int = N_DIAMONDS) -> str:
    """SQL CTE ``diam(poly_id, cx, cy, dx1, dy1, dx2, dy2, has_hole)``
    regenerating diamond_params bit-for-bit."""
    from .pipelines.sqlgen import add64, sm64

    h = sm64(add64("CAST(i AS UBIGINT)", str(int(_SEED_OFF))))

    def unit(off: int) -> str:
        return (f"(CAST({sm64(add64('h', str(off)))} % 1073741824 AS DOUBLE)"
                f" / 1073741824.0)")

    return f"""
    diam_h AS MATERIALIZED (SELECT i, {h} AS h FROM range({n}) t(i)),
    diam AS MATERIALIZED (
      SELECT CAST(i AS BIGINT) AS poly_id,
             {unit(1)} * 360.0 - 180.0 AS cx,
             {unit(2)} * 170.0 - 85.0 AS cy,
             0.2 + {unit(3)} * 1.8 AS dx1,
             0.2 + {unit(4)} * 1.8 AS dy1,
             0.2 + {unit(5)} * 1.8 AS dx2,
             0.2 + {unit(6)} * 1.8 AS dy2,
             h % 5 = 0 AS has_hole
      FROM diam_h)
    """


def diamond_inside_sql(px: str, py: str, scale: str = "1.0") -> str:
    """Half-plane conjunction for the (possibly scaled) diamond of the
    current ``diam`` row — vertex coordinates computed exactly as numpy does
    (cx + dx1*scale etc.), edges in ring order A->B->C->D, inside = is_left<0
    on every edge (clockwise ring; boundary is measure-zero for random
    points, same convention as layers._pent_sql)."""
    ax, ay = f"(cx + dx1 * {scale})", "cy"
    bx, by = "cx", f"(cy - dy2 * {scale})"
    c2x, c2y = f"(cx - dx2 * {scale})", "cy"
    dx_, dy_ = "cx", f"(cy + dy1 * {scale})"
    edges = [(ax, ay, bx, by), (bx, by, c2x, c2y), (c2x, c2y, dx_, dy_),
             (dx_, dy_, ax, ay)]
    conds = [
        f"(({x1} - {x0}) * ({py} - {y0}) - ({px} - {x0}) * ({y1} - {y0}) < 0)"
        for x0, y0, x1, y1 in edges
    ]
    return "(" + " AND ".join(conds) + ")"
