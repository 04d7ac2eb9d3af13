"""Shared point/grid SQL fragments (cycle-free: several pipelines modules
import these at module scope AND ship them in worker closures — this module
must never import pipelines.queries*)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .grid import GridSpec
from .layers import GRID1
from .sources.tables import X_SQL, Y_SQL

PTS_CTE = f"pts AS (SELECT event_id, value, {X_SQL} AS x, {Y_SQL} AS y FROM events)"


def _cell_sql(g: GridSpec, x: str = "x", y: str = "y") -> tuple[str, str, str]:
    col = f"CAST(FLOOR(({x} - ({g.west!r})) / {g.res_x!r}) AS BIGINT)"
    row = f"CAST(FLOOR((({g.north!r}) - {y}) / {g.res_y!r}) AS BIGINT)"
    return col, row, f"({row} * {g.cols} + {col})"


_c1, _r1, _cid1 = _cell_sql(GRID1)


def _lpts_df(df: pd.DataFrame) -> pd.DataFrame:
    e = df["event_id"].to_numpy(np.int64)
    cents = np.round(df["value"].to_numpy(np.float64) * 100).astype(np.int64)
    x = df["x"].to_numpy(np.float64)
    y = df["y"].to_numpy(np.float64)
    col = np.floor((x - GRID1.west) / GRID1.res_x).astype(np.int64)
    row = np.floor((GRID1.north - y) / GRID1.res_y).astype(np.int64)
    nret = 1 + (e % 3)
    return pd.DataFrame({
        "event_id": e, "x": x, "y": y, "cents": cents,
        "cell_id": row * GRID1.cols + col,
        "fl": e % 4, "cls": e % 7, "angle": ((e * 13) % 41) - 20,
        "nret": nret, "ret": 1 + ((e * 31) % nret),
        "intensity": (e * 97) % 4096})
