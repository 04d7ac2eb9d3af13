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
