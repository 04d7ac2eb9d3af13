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


# ---------------------------------------------------------------------------
# Direction-extreme candidate subsets (shared by minimum_bounding_circle and
# mbb_by_type): the 32 integer direction vectors (8 per quadrant, closed
# under 90-degree rotation). Extreme point of a group for direction d =
# argmax(x*dx + y*dy), ties broken by min event_id — associative, so the
# Ray side computes it with per-batch partials, and the SQL twin with one
# window over pts x dirs. Integer components keep the dot products
# bit-identical between numpy and DuckDB.
# ---------------------------------------------------------------------------
_EXT_BASE = ((1, 0), (4, 1), (2, 1), (4, 3), (1, 1), (3, 4), (1, 2), (1, 4))
EXT_DIRS = tuple((a, b) for ab in _EXT_BASE
                 for a, b in ((ab[0], ab[1]), (-ab[1], ab[0]),
                              (-ab[0], -ab[1]), (ab[1], -ab[0])))

PTS_T_CTE = (f"pts AS (SELECT event_id, event_type, {X_SQL} AS x, "
             f"{Y_SQL} AS y FROM events)")

EXT_CTES = f"""
    dirs(dir_id, dx, dy) AS (SELECT * FROM (VALUES {
        ", ".join(f"({i},{dx},{dy})" for i, (dx, dy) in enumerate(EXT_DIRS))
    }) t(a,b,c)),
    ext0 AS (
      SELECT event_type, dir_id, event_id FROM (
        SELECT p.event_type, d.dir_id, p.event_id,
               row_number() OVER (PARTITION BY p.event_type, d.dir_id
                                  ORDER BY (p.x*d.dx + p.y*d.dy) DESC,
                                           p.event_id) AS rn
        FROM pts p CROSS JOIN dirs d) WHERE rn = 1
    ),
    ext AS MATERIALIZED (
      SELECT e.event_type, p.event_id, p.x, p.y,
             row_number() OVER (PARTITION BY e.event_type
                                ORDER BY p.event_id) AS k
      FROM (SELECT DISTINCT event_type, event_id FROM ext0) e
      JOIN pts p ON p.event_id = e.event_id
               AND p.event_type = e.event_type
    )
"""


def type_extremes(sf_dir: str) -> pd.DataFrame:
    """Per-event-type direction extremes as a SMALL driver-side frame
    (bounded by |types| * 32 rows regardless of data size): per-batch
    argmax partials -> tiny (type, dir) groupby -> distinct ids, coords
    rederived from the id formula. Columns (event_type, event_id, x, y),
    sorted by (event_type, event_id)."""
    from .sources.tables import derive_xy, read_points

    ds = read_points(sf_dir, extra_cols=("event_type",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        rows = []
        for t in np.unique(et):
            m = et == t
            xm, ym, em = x[m], y[m], eid[m]
            for d, (dx, dy) in enumerate(EXT_DIRS):
                dot = xm * dx + ym * dy
                mx = dot.max()
                rows.append((t, d, mx, em[dot == mx].min()))
        return pd.DataFrame(rows, columns=["event_type", "dir_id", "dot",
                                           "event_id"])

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.sort_values(["dot", "event_id"], ascending=[False, True],
                           kind="mergesort")
        return g2.head(1)[["event_type", "event_id"]]

    ext = ds.map_batches(partial, batch_format="pandas") \
        .groupby(["event_type", "dir_id"]) \
        .map_groups(pick, batch_format="pandas").to_pandas()
    ext = ext.drop_duplicates().sort_values(["event_type", "event_id"]) \
        .reset_index(drop=True)
    x, y = derive_xy(ext["event_id"].to_numpy(np.int64))
    ext["x"], ext["y"] = x, y
    return ext
