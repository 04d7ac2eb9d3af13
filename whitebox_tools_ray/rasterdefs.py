"""Shared synthetic-raster definitions (cycle-free: imported by several
pipelines modules AND shipped inside worker closures — must not import
pipelines.queries)."""

from __future__ import annotations

import numpy as np

from .layers import GRID1


def _value_fn(cells: np.ndarray) -> np.ndarray:
    return ((cells.astype(np.int64) * 1000003) % 1000).astype(np.float64)


_CELLS_CTE = (
    f"cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id, "
    f"CAST(t.i // {GRID1.cols} AS BIGINT) AS r, CAST(t.i % {GRID1.cols} AS BIGINT) AS c, "
    f"((t.i * 1000003) % 1000) AS v FROM range({GRID1.rows * GRID1.cols}) t(i))"
)


def _devmax_scale_cte(mid: int) -> str:
    # equi-join offset arms (a BETWEEN range join is a ~60x slower IEJoin
    # here); the quirk's clamped lower bound only bites at the top/left
    # edges: row 0 / col 0 are excluded there
    arms = " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS z, b.v AS w FROM cells a JOIN cells b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc}) "
        f"WHERE (a.r >= {mid + 1} OR a.r + ({dr}) >= 1) "
        f"AND (a.c >= {mid + 1} OR a.c + ({dc}) >= 1)"
        for dr in range(-mid, mid + 1) for dc in range(-mid, mid + 1))
    return f"""
    s{mid} AS (
      SELECT cell_id, z, COUNT(*) AS n, SUM(w) AS s, SUM(w * w) AS ss
      FROM ({arms}) GROUP BY cell_id, z
    )"""


def _dda_sql(k: str, d: str, K: str) -> str:
    """Signed integer DDA offset along one axis: sign(d) * ((2k|d| + K) //
    (2K)) — positive-operand division only, so floor-vs-truncate division
    semantics cannot diverge between numpy and DuckDB."""
    return (f"(CASE WHEN {d} < 0 THEN -((2 * {k} * (-({d})) + {K}) // (2 * {K})) "
            f"ELSE ((2 * {k} * {d} + {K}) // (2 * {K})) END)")
