"""Shared point/grid SQL fragments (cycle-free: several pipelines modules
import these at module scope AND ship them in worker closures — this module
must never import pipelines.queries*)."""

from __future__ import annotations

from .grid import GridSpec
from .layers import GRID1
from .sources.tables import X_SQL, Y_SQL

PTS_CTE = f"pts AS (SELECT event_id, value, {X_SQL} AS x, {Y_SQL} AS y FROM events)"


def _cell_sql(g: GridSpec, x: str = "x", y: str = "y") -> tuple[str, str, str]:
    col = f"CAST(FLOOR(({x} - ({g.west!r})) / {g.res_x!r}) AS BIGINT)"
    row = f"CAST(FLOOR((({g.north!r}) - {y}) / {g.res_y!r}) AS BIGINT)"
    return col, row, f"({row} * {g.cols} + {col})"


_c1, _r1, _cid1 = _cell_sql(GRID1)
