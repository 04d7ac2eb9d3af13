"""Terrain sweep #11: TimeInDaylight
(terrain_analysis/time_in_daylight.rs).

The reference builds a solar almanac (lat/long, 10-second steps over a
day/date window), computes horizon-angle rasters per azimuth fraction
within --max_dist, and counts the time each cell's horizon is below the
sun (:24-55). The trigonometric almanac is replaced here by a FIXED
16-sample almanac — the 8 D8 azimuths x 2 rational sun altitudes
(tan = 1/2 and 1/4) — so the horizon test
  blocked(dir, p/q)  <=>  exists k <= 32:
      z_k > z_c  and  q^2 (z_k - z_c)^2 > p^2 k^2 (dx^2 + dy^2)
is INTEGER-EXACT (squared cross-multiplication; |dir| never computed).
Output tid = number of lit samples (0..16), proportional to the
reference's time-in-daylight fraction under the sampled almanac.
max_dist = 32 cells. One k=32 halo tile exchange; full SQL oracle with
the same comparisons.
"""

from __future__ import annotations

import numpy as np

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols

_DIRS = ((0, 1), (-1, 1), (-1, 0), (-1, -1),
         (0, -1), (1, -1), (1, 0), (1, 1))
_ALTS = ((1, 2), (1, 4))  # tan(altitude) = p/q
_MAXK = 32


def _tid_sql() -> str:
    # constant-offset equi-join arms (8 dirs x 32 steps) — the devmax
    # pattern; a variable-offset join plans ~100x slower in DuckDB 1.0
    arms = " UNION ALL ".join(
        f"SELECT a.cell_id, {did} AS did, a.v AS zc, b.v AS zk, "
        f"CAST({k} AS BIGINT) AS k, CAST({dx * dx + dy * dy} AS BIGINT) AS n2 "
        f"FROM cells a JOIN cells b "
        f"ON b.r = a.r + ({dy * k}) AND b.c = a.c + ({dx * k})"
        for did, (dy, dx) in enumerate(_DIRS)
        for k in range(1, _MAXK + 1))
    tests = ", ".join(
        f"MAX(CASE WHEN zk > zc AND {q * q} * (zk - zc) * (zk - zc) "
        f"> {p * p} * k * k * n2 THEN 1 ELSE 0 END) AS b{j}"
        for j, (p, q) in enumerate(_ALTS))
    blksum = " + ".join(f"SUM(b{j})" for j in range(len(_ALTS)))
    n_samples = len(_DIRS) * len(_ALTS)
    return f"""
    WITH {_CELLS_CTE},
    arms AS ({arms}),
    blk AS (SELECT cell_id, did, {tests} FROM arms GROUP BY cell_id, did),
    agg AS (SELECT cell_id, {blksum} AS nblk FROM blk GROUP BY cell_id)
    SELECT c.cell_id, CAST({n_samples} - COALESCE(a.nblk, 0) AS BIGINT) AS tid
    FROM cells c LEFT JOIN agg a ON a.cell_id = c.cell_id
    """


@query("time_in_daylight", _tid_sql())
def time_in_daylight(sf_dir: str):
    """TimeInDaylight (terrain_analysis/time_in_daylight.rs) under the
    16-sample rational almanac (module docstring). Output (cell_id, tid)
    int64 = lit samples of 16. Integer-exact, SQL oracle above."""
    from ..stages.raster import stencil_k, synth_raster_tiles

    n_samples = len(_DIRS) * len(_ALTS)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        K = _MAXK
        zc = padded[K:K + nr, K:K + nc]
        lit = np.full((nr, nc), n_samples, np.int64)
        for dy, dx in _DIRS:
            n2 = dx * dx + dy * dy
            blocked = [np.zeros((nr, nc), bool) for _ in _ALTS]
            for k in range(1, K + 1):
                zk = padded[K + dy * k:K + dy * k + nr,
                            K + dx * k:K + dx * k + nc]
                with np.errstate(invalid="ignore"):
                    d = zk - zc
                    up = ~np.isnan(zk) & (d > 0)
                d2 = np.where(up, d, 0.0) ** 2
                for j, (p, q) in enumerate(_ALTS):
                    blocked[j] |= up & (q * q * d2 > p * p * k * k * n2)
            for j in range(len(_ALTS)):
                lit -= blocked[j].astype(np.int64)
        return {"tid": lit}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    out = stencil_k(tiles, GRID1, kern, k=_MAXK)
    return out.map_batches(
        lambda df: df.assign(tid=df["tid"].astype(np.int64)),
        batch_format="pandas")
