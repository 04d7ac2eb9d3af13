"""Multi-raster overlay family (gis_analysis raster-stack tools).

Reference semantics (each cited in its query's docstring): a stack of K
aligned rasters is folded cell-by-cell — HighestPosition keeps the FIRST band
achieving the maximum (strict ``>`` fold, gis_analysis/highest_pos.rs:233),
Max/MinOverlay keep the extreme value (max_overlay.rs:233, min_overlay.rs:233),
the Abs variants compare ``|v|`` (max_abs_overlay.rs:232), Sum/Multiply/Average
accumulate (sum_overlay.rs:230, multiply_overlay.rs, average_overlay.rs:238-263),
WeightedSum normalizes the weights to 1.0 then accumulates ``v*w``
(weighted_sum.rs:226-232,278), and PickFromList selects the band named by a
position raster (pick_from_list.rs:244-248).

Ray-Data-first architecture — NOT the reference's sequential
read-one-raster-at-a-time accumulate loop: each band is an independent
tile-aligned Dataset (at 100 TB each raster arrives from its own Parquet
prefix); bands are unioned with a ``band`` column and co-partitioned by
``groupby(tile_id)`` — ONE shuffle keyed on the shared tile grid — then each
group (K tile rows) is folded vectorized in ``map_groups``. No band is ever
broadcast and no cell-level long format exists before the fold.

Inputs are deterministic synthetic bands
``v_b(cell) = ((cell*P_b + 17*b) % 1001) - 500`` (signed so the Abs variants
differ from the plain ones); all folds are integer-exact so the DuckDB oracles
match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..stages.raster import synth_raster_tiles
from .queries import query

_PRIMES = (1000003, 999983, 999979, 999961)
_K = len(_PRIMES)


def _band_value_fn(b: int):
    p = _PRIMES[b]

    def fn(cells: np.ndarray) -> np.ndarray:
        return (((cells.astype(np.int64) * p + 17 * b) % 1001) - 500).astype(np.float64)

    return fn


def _band_sql(b: int) -> str:
    return f"(((t.i * {_PRIMES[b]} + {17 * b}) % 1001) - 500)"


# cells CTE exposing all four band values per cell (integer domain)
_STACK_CTE = (
    "cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id, "
    + ", ".join(f"{_band_sql(b)} AS v{b}" for b in range(_K))
    + f" FROM range({GRID1.rows * GRID1.cols}) t(i))"
)


def _stacked_fold(fold_fn, out_col: str, out_dtype=np.int64):
    """Union K band tile-datasets -> groupby(tile_id) -> vectorized fold.

    fold_fn(stack: (K, n) float64) -> (n,) result array."""
    bands = []
    for b in range(_K):
        t = synth_raster_tiles(GRID1, _band_value_fn(b))
        bands.append(t.map_batches(
            lambda df, _b=b: df.assign(band=np.int64(_b)), batch_format="pandas"))
    unioned = bands[0].union(*bands[1:])

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("band")
        stack = np.stack([np.asarray(d, np.float64) for d in g["data"]])
        first = g.iloc[0]
        r0 = int(first["trow"]) * 64
        c0 = int(first["tcol"]) * 64
        nr, nc = int(first["nrows"]), int(first["ncols"])
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
        return pd.DataFrame({"cell_id": cells,
                             out_col: fold_fn(stack).astype(out_dtype)})

    return unioned.groupby("tile_id").map_groups(fold, batch_format="pandas")


def _first_wins_pos(stack: np.ndarray, maximum: bool) -> np.ndarray:
    """Sequential strict-compare fold (highest_pos.rs:231-236): the FIRST band
    attaining the extreme keeps the position."""
    best = stack[0].copy()
    pos = np.zeros(stack.shape[1], np.int64)
    for b in range(1, stack.shape[0]):
        better = stack[b] > best if maximum else stack[b] < best
        best = np.where(better, stack[b], best)
        pos = np.where(better, b, pos)
    return pos


@query(
    "overlay_highest_position",
    f"""
    WITH {_STACK_CTE}
    SELECT cell_id, CAST(CASE GREATEST(v0, v1, v2, v3)
        WHEN v0 THEN 0 WHEN v1 THEN 1 WHEN v2 THEN 2 ELSE 3 END AS BIGINT) AS pos
    FROM cells
    """,
)
def overlay_highest_position(sf_dir: str):
    """HighestPosition (gis_analysis/highest_pos.rs:233: strict ``z > high``
    so the first band wins ties; 0-based stack index). The CASE-on-GREATEST
    oracle picks the first band equal to the max — identical tie rule."""
    return _stacked_fold(lambda s: _first_wins_pos(s, True), "pos")


@query(
    "overlay_lowest_position",
    f"""
    WITH {_STACK_CTE}
    SELECT cell_id, CAST(CASE LEAST(v0, v1, v2, v3)
        WHEN v0 THEN 0 WHEN v1 THEN 1 WHEN v2 THEN 2 ELSE 3 END AS BIGINT) AS pos
    FROM cells
    """,
)
def overlay_lowest_position(sf_dir: str):
    """LowestPosition (gis_analysis/lowest_pos.rs, strict ``<`` fold)."""
    return _stacked_fold(lambda s: _first_wins_pos(s, False), "pos")


@query(
    "overlay_max",
    f"WITH {_STACK_CTE} SELECT cell_id, "
    f"CAST(GREATEST(v0, v1, v2, v3) AS BIGINT) AS vmax FROM cells",
)
def overlay_max(sf_dir: str):
    """MaxOverlay (gis_analysis/max_overlay.rs:233)."""
    return _stacked_fold(lambda s: s.max(axis=0), "vmax")


@query(
    "overlay_min",
    f"WITH {_STACK_CTE} SELECT cell_id, "
    f"CAST(LEAST(v0, v1, v2, v3) AS BIGINT) AS vmin FROM cells",
)
def overlay_min(sf_dir: str):
    """MinOverlay (gis_analysis/min_overlay.rs:233)."""
    return _stacked_fold(lambda s: s.min(axis=0), "vmin")


@query(
    "overlay_max_abs",
    f"WITH {_STACK_CTE} SELECT cell_id, "
    f"CAST(GREATEST(ABS(v0), ABS(v1), ABS(v2), ABS(v3)) AS BIGINT) AS vmaxabs "
    f"FROM cells",
)
def overlay_max_abs(sf_dir: str):
    """MaxAbsoluteOverlay (gis_analysis/max_abs_overlay.rs:232: compares and
    stores ``|v|``)."""
    return _stacked_fold(lambda s: np.abs(s).max(axis=0), "vmaxabs")


@query(
    "overlay_min_abs",
    f"WITH {_STACK_CTE} SELECT cell_id, "
    f"CAST(LEAST(ABS(v0), ABS(v1), ABS(v2), ABS(v3)) AS BIGINT) AS vminabs "
    f"FROM cells",
)
def overlay_min_abs(sf_dir: str):
    """MinAbsoluteOverlay (gis_analysis/min_abs_overlay.rs:232)."""
    return _stacked_fold(lambda s: np.abs(s).min(axis=0), "vminabs")


@query(
    "overlay_sum",
    f"WITH {_STACK_CTE} SELECT cell_id, "
    f"CAST(v0 + v1 + v2 + v3 AS BIGINT) AS vsum FROM cells",
)
def overlay_sum(sf_dir: str):
    """SumOverlay (gis_analysis/sum_overlay.rs:230: per-cell accumulate)."""
    return _stacked_fold(lambda s: s.sum(axis=0), "vsum")


@query(
    "overlay_multiply",
    f"WITH {_STACK_CTE} SELECT cell_id, "
    f"CAST(v0 * v1 * v2 * v3 AS BIGINT) AS vprod FROM cells",
)
def overlay_multiply(sf_dir: str):
    """MultiplyOverlay (gis_analysis/multiply_overlay.rs). |v| <= 500 so the
    4-band product (<= 6.25e10) is exactly representable in float64."""
    return _stacked_fold(lambda s: s.prod(axis=0), "vprod")


@query(
    "overlay_average",
    f"WITH {_STACK_CTE} SELECT cell_id, "
    f"CAST((v0 + v1 + v2 + v3) / 4.0 AS DOUBLE) AS vavg FROM cells",
)
def overlay_average(sf_dir: str):
    """AverageOverlay (gis_analysis/average_overlay.rs:238-263: sum then
    divide by the valid-band count — K=4 here, and /4 is exact in binary)."""
    return _stacked_fold(lambda s: s.sum(axis=0) / 4.0, "vavg", np.float64)


@query(
    "overlay_weighted_sum",
    f"""
    WITH {_STACK_CTE}
    SELECT cell_id,
           v0 * (1.0 / 10.0) + v1 * (2.0 / 10.0)
         + v2 * (3.0 / 10.0) + v3 * (4.0 / 10.0) AS vwsum
    FROM cells
    """,
)
def overlay_weighted_sum(sf_dir: str):
    """WeightedSum (gis_analysis/weighted_sum.rs:226-232 normalizes weights to
    sum 1, then :278 accumulates ``v*w`` band-by-band). Weights (1,2,3,4);
    both paths compute w_b = b/10 by the same double division and fold
    left-to-right, so rounding is identical."""
    w = [np.float64(b + 1) / np.float64(10.0) for b in range(_K)]

    def fold(s: np.ndarray) -> np.ndarray:
        out = s[0] * w[0]
        for b in range(1, _K):
            out = out + s[b] * w[b]
        return out

    return _stacked_fold(fold, "vwsum", np.float64)


@query(
    "overlay_pick_from_list",
    f"""
    WITH {_STACK_CTE}
    SELECT cell_id, CAST(CASE cell_id % 4
        WHEN 0 THEN v0 WHEN 1 THEN v1 WHEN 2 THEN v2 ELSE v3 END AS BIGINT) AS picked
    FROM cells
    """,
)
def overlay_pick_from_list(sf_dir: str):
    """PickFromList (gis_analysis/pick_from_list.rs:244-248: the position
    raster's value j selects band j's cell value; 0-based float compare).
    Position raster = cell_id % 4."""

    def fold_with_cells(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("band")
        stack = np.stack([np.asarray(d, np.float64) for d in g["data"]])
        first = g.iloc[0]
        r0, c0 = int(first["trow"]) * 64, int(first["tcol"]) * 64
        nr, nc = int(first["nrows"]), int(first["ncols"])
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
        pos = cells % 4
        picked = stack[pos, np.arange(stack.shape[1])]
        return pd.DataFrame({"cell_id": cells, "picked": picked.astype(np.int64)})

    bands = []
    for b in range(_K):
        t = synth_raster_tiles(GRID1, _band_value_fn(b))
        bands.append(t.map_batches(
            lambda df, _b=b: df.assign(band=np.int64(_b)), batch_format="pandas"))
    return (bands[0].union(*bands[1:])
            .groupby("tile_id").map_groups(fold_with_cells, batch_format="pandas"))
