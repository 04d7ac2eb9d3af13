"""Terrain sweep #7: Geomorphons and DownslopeIndex.

Geomorphons (terrain_analysis/geomorphons.rs, Jasiewicz & Stepinski
2013): 8 ray directions, lookout 8 cells, flatness tangent 1/8. The
per-ray extreme angles are dz/(t*u) with the per-step divisor t*u
PRE-COMPUTED in Python and embedded verbatim in the SQL — one shared
float tree, bit-exact (comparisons of correctly-rounded divisions of
integer dz by identical constants). The (n-, n+) -> landform table is the
published 10-class matrix.

DownslopeIndex (terrain_analysis/downslope_index.rs, distance form):
fixed-point D8 path distance to the first cell d=25 units lower — the
drop is strictly monotone along a D8 path (the pointer chooses a LOWER
neighbour), so "first crossing" == MIN path distance among qualifying
cells, which the recursive SQL oracle states directly; the engine side is
a bounded hop-by-hop shard walk (stages/pregel.downslope_index_pregel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hydrodefs import _GRAPH_CTES, _WALK_UNITS_CTE, _d8_pointer
from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols

# D8 ray directions (NE,E,SE,S,SW,W,NW,N) and per-step divisors t * u
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)
_SQRT2 = float(np.sqrt(2.0))
_GEO_L = 8
_GEO_FLAT = 0.125
# divisor literal per (direction parity, t): diagonals are even indices
_TD = {(par, t): (t * _SQRT2 if par == 0 else float(t))
       for par in (0, 1) for t in range(1, _GEO_L + 1)}

# (n_minus, n_plus) -> class id; FL=1 PK=2 RI=3 SH=4 SP=5 SL=6 HL=7 FS=8
# VL=9 PT=10 (the published geomorphon matrix)
_GEO_TABLE = {}
_ROWS_TBL = [
    "FL FL FL FS FS VL VL VL PT",
    "FL FL FS FS FS VL VL VL",
    "FL SH SL SL HL HL VL",
    "SH SH SL SL SL HL",
    "SH SH SL SL SL",
    "RI RI SP SP",
    "RI RI RI",
    "RI RI",
    "PK",
]
_CLS = {"FL": 1, "PK": 2, "RI": 3, "SH": 4, "SP": 5, "SL": 6, "HL": 7,
        "FS": 8, "VL": 9, "PT": 10}
for nm, row in enumerate(_ROWS_TBL):
    for npls, name in enumerate(row.split()):
        _GEO_TABLE[(nm, npls)] = _CLS[name]


def _geomorphons_sql() -> str:
    arms = []
    for k in range(8):
        u_par = k % 2  # even = diagonal
        for t in range(1, _GEO_L + 1):
            td = _TD[(u_par, t)]
            arms.append(
                f"SELECT a.cell_id, {k} AS k, "
                f"(CAST(b.v - a.v AS DOUBLE) / {td!r}) AS ang "
                f"FROM cells a JOIN cells b "
                f"ON b.r = a.r + ({t * _DY[k]}) AND b.c = a.c + ({t * _DX[k]})")
    tbl = " ".join(
        f"WHEN nm = {nm} AND npls = {npls} THEN {cid}"
        for (nm, npls), cid in sorted(_GEO_TABLE.items()))
    return f"""
    WITH {_CELLS_CTE},
    rays AS MATERIALIZED ({' UNION ALL '.join(arms)}),
    dirs AS MATERIALIZED (
      SELECT cell_id, k, MAX(ang) AS maxa, MIN(ang) AS mina
      FROM rays GROUP BY cell_id, k
    ),
    signs AS (
      SELECT cell_id,
             CASE WHEN maxa > {_GEO_FLAT!r}
                   AND (NOT mina < {-_GEO_FLAT!r} OR maxa > -mina) THEN 1
                  WHEN mina < {-_GEO_FLAT!r}
                   AND (NOT maxa > {_GEO_FLAT!r} OR -mina > maxa) THEN -1
                  ELSE 0 END AS s
      FROM dirs
    ),
    counts AS (
      SELECT cell_id,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS npls,
             SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS nm
      FROM signs GROUP BY cell_id
    )
    SELECT cell_id, CAST(CASE {tbl} ELSE 6 END AS BIGINT) AS landform
    FROM counts
    """


@query("geomorphons", _geomorphons_sql())
def geomorphons(sf_dir: str):
    from ..stages.raster import stencil_k, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        k = _GEO_L
        z = padded[k:k + nr, k:k + nc]
        npls = np.zeros((nr, nc), np.int64)
        nmin = np.zeros((nr, nc), np.int64)
        for d in range(8):
            maxa = np.full((nr, nc), -np.inf)
            mina = np.full((nr, nc), np.inf)
            for t in range(1, _GEO_L + 1):
                w = padded[k + t * _DY[d]:k + t * _DY[d] + nr,
                           k + t * _DX[d]:k + t * _DX[d] + nc]
                ang = (w - z) / _TD[(d % 2, t)]
                ok = ~np.isnan(ang)
                maxa = np.where(ok & (ang > maxa), ang, maxa)
                mina = np.where(ok & (ang < mina), ang, mina)
            pos = maxa > _GEO_FLAT
            neg = mina < -_GEO_FLAT
            sp = pos & (~neg | (maxa > -mina))
            sn = neg & (~pos | (-mina > maxa))
            npls += sp.astype(np.int64)
            nmin += (sn & ~sp).astype(np.int64)
        cls = np.full((nr, nc), 6, np.int64)
        for (nm, npl), cid in _GEO_TABLE.items():
            cls = np.where((nmin == nm) & (npls == npl), cid, cls)
        return {"landform": cls.astype(np.float64)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return stencil_k(tiles, GRID1, kern, k=_GEO_L).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].astype(np.int64),
            "landform": df["landform"].astype(np.int64)}),
        batch_format="pandas")


_DSI_DROP = 25


@query(
    "downslope_index",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE},
    q AS (
      SELECT w.start, w.units,
             (w.start * 1000003) % 1000 - (w.cur * 1000003) % 1000 AS dz_drop
      FROM walku w
    ),
    hit AS (
      SELECT start, MIN(units) AS units FROM q
      WHERE dz_drop >= {_DSI_DROP} GROUP BY start
    ),
    full_len AS (
      SELECT start, MAX(units) AS units FROM q GROUP BY start
    )
    SELECT f.start AS cell_id,
           CAST(COALESCE(h.units, f.units) AS BIGINT) AS units,
           CAST(CASE WHEN h.start IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS reached
    FROM full_len f LEFT JOIN hit h ON h.start = f.start
    """,
)
def downslope_index(sf_dir: str):
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import downslope_index_pregel

    def zfn(cells: np.ndarray) -> np.ndarray:
        return _value_fn(cells).astype(np.int64)

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1)
    return downslope_index_pregel(dds, zfn, _DSI_DROP, GRID1)
