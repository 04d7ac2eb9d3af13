"""Shared D8-graph SQL fragments (cycle-free: imported by several pipelines
modules AND shipped inside worker closures — must never import
pipelines.queries*). Mirrors the construction in pipelines/queries_raster;
both modules share THESE definitions so the oracles cannot drift."""

from __future__ import annotations

import numpy as np

from .layers import GRID1
from .rasterdefs import _CELLS_CTE

# D8 neighbour order (d8_pointer.rs:252-253): NE,E,SE,S,SW,W,NW,N
_D8_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_D8_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def _d8_len(i: int) -> float:
    diag = float(np.sqrt(GRID1.res_x * GRID1.res_x + GRID1.res_y * GRID1.res_y))
    return [diag, GRID1.res_x, diag, GRID1.res_y, diag, GRID1.res_x, diag, GRID1.res_y][i]


_D8_SLOPES = " UNION ALL ".join(
    f"SELECT a.cell_id, {i} AS i, CAST({1 << i} AS BIGINT) AS code, "
    f"(a.v - b.v) / {_d8_len(i)!r} AS slope "
    f"FROM cells a JOIN cells b ON b.r = a.r + ({_D8_DY[i]}) AND b.c = a.c + ({_D8_DX[i]})"
    for i in range(8)
)

# D8 code -> down-cell offset, rendered into SQL (graph CTE shared by the
# iterative flow oracles)
_D8_CASE = "CASE b.code " + " ".join(
    f"WHEN {1 << i} THEN c.cell_id + ({_D8_DY[i] * GRID1.cols + _D8_DX[i]})"
    for i in range(8)
) + " ELSE -1 END"

_GRAPH_CTES = f"""
    {_CELLS_CTE},
    slopes AS ({_D8_SLOPES}),
    best AS MATERIALIZED (
      SELECT cell_id, code FROM slopes WHERE slope > 0
      QUALIFY row_number() OVER (PARTITION BY cell_id ORDER BY slope DESC, i ASC) = 1
    ),
    graph AS MATERIALIZED (
      SELECT c.cell_id, CAST({_D8_CASE} AS BIGINT) AS down_id
      FROM cells c LEFT JOIN best b ON b.cell_id = c.cell_id
    )
"""

# fixed-point D8 hop units (stages/pregel._hop_units): 2^20 per cardinal
# step, round(sqrt(2) * 2^20) per diagonal
_HOP_STRAIGHT = 1 << 20
_HOP_DIAG = int(np.floor(1.4142135623730951 * (1 << 20) + 0.5))

STREAM_ACC_T = 5  # stream cells: D8 accumulation >= threshold


def _hop_sql(a: str, b: str) -> str:
    return (f"CASE WHEN ({a} // {GRID1.cols}) <> ({b} // {GRID1.cols}) "
            f"AND ({a} % {GRID1.cols}) <> ({b} % {GRID1.cols}) "
            f"THEN {_HOP_DIAG} ELSE {_HOP_STRAIGHT} END")


_WALK_UNITS_CTE = f"""
    walku(start, cur, units) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM graph
      UNION ALL
      SELECT w.start, g.down_id,
             w.units + {_hop_sql('w.cur', 'g.down_id')}
      FROM walku w JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
"""
