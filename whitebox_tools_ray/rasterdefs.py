"""Shared synthetic-raster definitions (cycle-free: imported by several
pipelines modules AND shipped inside worker closures — must not import
pipelines.queries)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .grid import GridSpec
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


# --- off-terrain-object shared kernel (used by queries_terrain12 AND
# queries_terrain13 at module scope; lives here so neither pipeline
# module from-imports the other — the r03 worker import-cycle class) ---
_FILT = 11
_MID = _FILT // 2
_GFLAG = 1 << 20          # ground flag in the packed state channel
_THR = tuple(2 if (dx and dy) else 1 for dx, dy in
             zip((1, 1, 1, 0, -1, -1, -1, 0), (-1, 0, 1, 1, 1, 0, -1, -1)))
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def tophat_state_tiles(grid: GridSpec, value_fn, *, tile: int = 64):
    """Tiles of the packed state: tophat + _GFLAG * seed(ground)."""
    from .stages.raster import (stencil_k, stencil_tiles_as_input,
                                 synth_raster_tiles)

    def erode(padded, nr, nc):
        out = np.full((nr, nc), np.inf)
        for dy in range(-_MID, _MID + 1):
            for dx in range(-_MID, _MID + 1):
                w = padded[_MID + dy:_MID + dy + nr, _MID + dx:_MID + dx + nc]
                out = np.fmin(out, np.where(np.isnan(w), np.inf, w))
        return {"ero": out}

    def dilate_tophat(padded, nr, nc):
        out = np.full((nr, nc), -np.inf)
        for dy in range(-_MID, _MID + 1):
            for dx in range(-_MID, _MID + 1):
                w = padded[_MID + dy:_MID + dy + nr, _MID + dx:_MID + dx + nc]
                out = np.fmax(out, np.where(np.isnan(w), -np.inf, w))
        return {"open": out}

    from .stages.raster import fuse_kernels

    fused = fuse_kernels(erode, "ero", dilate_tophat, _MID, _MID)
    tiles = synth_raster_tiles(grid, value_fn, tile=tile)
    opening = stencil_k(tiles, grid, fused, tile=tile, k=2 * _MID,
                        output="tiles")

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * tile, int(t.tcol) * tile
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            z = value_fn((rr * grid.cols + cc).ravel()).reshape(nr, nc)
            th = z - np.asarray(t.open, np.float64).reshape(nr, nc)
            state = th + _GFLAG * (th <= 1)
            rows.append({"tile_id": int(t.trow) * (-(-grid.cols // tile))
                         + int(t.tcol), "trow": int(t.trow),
                         "tcol": int(t.tcol), "nrows": nr, "ncols": nc,
                         "data": state.ravel()})
        return pd.DataFrame(rows)

    return opening.map_batches(pack, batch_format="pandas")




_SAR_DX = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
_SAR_DY = (-1, -1, -1, 0, 0, 0, 1, 1, 1)


def _horn_pq_sql(*, with_v: bool = False) -> str:
    """`pq` CTE over `cells`: the Horn 3x3 gradients p = dz/dx, q = dz/dy
    (terrain_analysis/slope.rs:272-326) as exact rationals (v is integer,
    denominator 8 on the unit grid). Interior cells only (the 8 joins).
    Lives in this leaf module because several pipeline modules consume it
    at decoration time."""
    joins = " ".join(
        f"JOIN cells n{k} ON n{k}.r = a.r + ({_SAR_DY[k]}) "
        f"AND n{k}.c = a.c + ({_SAR_DX[k]})"
        for k in range(9) if k != 4)
    p = ("(CAST((n2.v + 2 * n5.v + n8.v) - (n0.v + 2 * n3.v + n6.v) "
         "AS DOUBLE) / 8.0)")
    q = ("(CAST((n6.v + 2 * n7.v + n8.v) - (n0.v + 2 * n1.v + n2.v) "
         "AS DOUBLE) / 8.0)")
    v = "a.v, " if with_v else ""
    return f"""
    pq AS (
      SELECT a.cell_id, {v}{p} AS p, {q} AS q
      FROM cells a {joins}
    )"""
