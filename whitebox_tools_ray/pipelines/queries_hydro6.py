"""Hydro sweep #6: BurnStreamsAtRoads, FillBurn, and
StochasticDepressionAnalysis (derandomized).

BurnStreamsAtRoads is SQL-exact (two seeded DDA line walks + a 3x3
road-proximity mask); FillBurn and the depression analysis compose the
priority-flood Pregel fill and carry dense brute-force oracles
(tests/test_hydro6.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hydrodefs import _fill_cte
from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query
from ..linedefs import _dda_walk_sql
from .sqlgen import sm64, synth_segments_cte

_ROWS, _COLS = GRID1.rows, GRID1.cols
_STREAM_N, _ROAD_N, _ROAD_SEED = 400, 150, 99
_BURN = 50


def _dda_cells(n: int, seed: int = 42) -> np.ndarray:
    """GRID1 cell ids of the integer-DDA rasterization of the synthetic
    segment layer (the vector_lines_to_raster walk)."""
    from ..stages.lines import synth_segments

    seg = synth_segments(n, seed=seed)
    cx0 = np.floor(seg["x0"].to_numpy()).astype(np.int64)
    cy0 = np.floor(seg["y0"].to_numpy()).astype(np.int64)
    cx1 = np.floor(seg["x1"].to_numpy()).astype(np.int64)
    cy1 = np.floor(seg["y1"].to_numpy()).astype(np.int64)
    adx, ady = np.abs(cx1 - cx0), np.abs(cy1 - cy0)
    sx = np.where(cx1 >= cx0, 1, -1)
    sy = np.where(cy1 >= cy0, 1, -1)
    span = np.maximum(adx, ady)
    cells = []
    for j in range(len(seg)):
        i = np.arange(span[j] + 1, dtype=np.int64)
        if adx[j] >= ady[j]:
            cx = cx0[j] + i * sx[j]
            cy = (np.full_like(i, cy0[j]) if adx[j] == 0 else
                  cy0[j] + sy[j] * ((2 * i * ady[j] + adx[j]) // (2 * adx[j])))
        else:
            cy = cy0[j] + i * sy[j]
            cx = cx0[j] + sx[j] * ((2 * i * adx[j] + ady[j]) // (2 * ady[j]))
        ok = (cy >= -85) & (cy <= 84) & (cx >= -180) & (cx <= 179)
        cells.append((84 - cy[ok]) * _COLS + (cx[ok] + 180))
    return np.unique(np.concatenate(cells))


def _burn_sql() -> str:
    streams = synth_segments_cte(_STREAM_N).replace("seg_h", "str_seg_h") \
        .replace("seg_u", "str_seg_u").replace("seg AS", "str_seg AS")
    roads = synth_segments_cte(_ROAD_N, seed=_ROAD_SEED) \
        .replace("seg_h", "rd_seg_h").replace("seg_u", "rd_seg_u") \
        .replace("seg AS", "rd_seg AS")
    return f"""
    WITH {streams},
    {roads},
    {_dda_walk_sql(_STREAM_N, 42, "str")},
    {_dda_walk_sql(_ROAD_N, _ROAD_SEED, "rd")},
    near_road AS MATERIALIZED (
      SELECT DISTINCT r.cell_id + dy * {_COLS} + dx AS cell_id
      FROM rd r JOIN (VALUES (-1), (0), (1)) t1(dy) ON TRUE
      JOIN (VALUES (-1), (0), (1)) t2(dx) ON TRUE
    ),
    {_CELLS_CTE}
    SELECT c.cell_id,
           CAST(c.v - CASE WHEN s.cell_id IS NOT NULL
                            AND nr.cell_id IS NULL
                           THEN {_BURN} ELSE 0 END AS BIGINT) AS z
    FROM cells c
    LEFT JOIN str s ON s.cell_id = c.cell_id
    LEFT JOIN near_road nr ON nr.cell_id = c.cell_id
    """


def _burned_sets():
    streams = _dda_cells(_STREAM_N)
    roads = _dda_cells(_ROAD_N, seed=_ROAD_SEED)
    rr, cc = roads // _COLS, roads % _COLS
    near = np.unique(np.concatenate(
        [(rr + dy) * _COLS + (cc + dx)
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)]))
    burn = np.setdiff1d(streams, near)
    return burn


def _member(a: np.ndarray, s: np.ndarray) -> np.ndarray:
    if not len(s):
        return np.zeros(len(a), bool)
    pos = np.minimum(np.searchsorted(s, a), len(s) - 1)
    return s[pos] == a


@query("burn_streams_at_roads", _burn_sql())
def burn_streams_at_roads(sf_dir: str):
    """BurnStreamsAtRoads (hydro_analysis/burn_streams_at_roads.rs): drop
    stream cells by the burn depth EXCEPT within one cell of a road (the
    road-crossing protection). Both line layers are seeded DDA walks; the
    burn set is broadcast."""
    from ..stages.raster import synth_raster_tiles
    from ..stages.spatial_join import _cached_get

    ref = ray.put(_burned_sets())
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def burn_tiles(df: pd.DataFrame) -> pd.DataFrame:
        b = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * _COLS + cc.ravel()
            v = np.asarray(t.data, np.int64)
            frames.append(pd.DataFrame({
                "cell_id": cid,
                "z": v - np.where(_member(cid, b), _BURN, 0)}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(burn_tiles, batch_format="pandas")


def _fill_burn_sql() -> str:
    """Burn-layer CTEs (the proven _burn_sql fragments) + the fill
    relaxation with the burned dem joined into the init scan. Converges at
    180 steps on this surface (200 budgeted; equality with the dense
    burn+priority-flood oracle stays in tests/test_hydro6.py)."""
    streams = synth_segments_cte(_STREAM_N).replace("seg_h", "str_seg_h") \
        .replace("seg_u", "str_seg_u").replace("seg AS", "str_seg AS")
    roads = synth_segments_cte(_ROAD_N, seed=_ROAD_SEED) \
        .replace("seg_h", "rd_seg_h").replace("seg_u", "rd_seg_u") \
        .replace("seg AS", "rd_seg AS")
    dem = (f"((cid*1000003)%1000) - CASE WHEN bset.cell_id IS NOT NULL "
           f"THEN {_BURN} ELSE 0 END")
    return f"""
    WITH RECURSIVE {streams},
    {roads},
    {_dda_walk_sql(_STREAM_N, 42, "str")},
    {_dda_walk_sql(_ROAD_N, _ROAD_SEED, "rd")},
    near_road AS MATERIALIZED (
      SELECT DISTINCT r.cell_id + dy * {_COLS} + dx AS cell_id
      FROM rd r JOIN (VALUES (-1), (0), (1)) t1(dy) ON TRUE
      JOIN (VALUES (-1), (0), (1)) t2(dx) ON TRUE
    ),
    bset AS MATERIALIZED (
      SELECT s.cell_id FROM str s
      LEFT JOIN near_road nr ON nr.cell_id = s.cell_id
      WHERE nr.cell_id IS NULL
    ),
    {_fill_cte(dem, 50, init_join=" LEFT JOIN bset ON bset.cell_id = t.i")}
    SELECT cell_id, fill FROM fillw
    """


@query("fill_burn", _fill_burn_sql())
def fill_burn(sf_dir: str):
    """FillBurn (hydro_analysis/fill_burn.rs): priority-flood fill of the
    stream-burned DEM. SQL oracle: _fill_burn_sql (burn CTEs + joined-dem
    fill relaxation); dense burn+priority-flood oracle in
    tests/test_hydro6.py."""
    from ..stages.pregel import fill_depressions_pregel

    burn = _burned_sets()

    def zfn(cells: np.ndarray) -> np.ndarray:
        return _value_fn(cells).astype(np.int64) \
            - np.where(_member(cells, burn), _BURN, 0)

    fill = fill_depressions_pregel(zfn, GRID1)
    return fill.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64),
                                 "fill": df["fill"].to_numpy(np.int64)}),
        batch_format="pandas")


_SDA_N, _SDA_SEED = 4, 424242


def _sda_noise(cells: np.ndarray, i: int) -> np.ndarray:
    from ..sources.synthetic import splitmix64

    h = splitmix64((cells * _SDA_N + i + _SDA_SEED).astype(np.uint64))
    return (h % np.uint64(7)).astype(np.int64) - 3


def _sda_dem_sql(i: int) -> str:
    noise = sm64(f"CAST(cid*{_SDA_N} + {i} + {_SDA_SEED} AS UBIGINT)")
    return (f"((cid*1000003)%1000)*4 + CAST({noise} % 7 AS BIGINT) - 3")


@query(
    "stochastic_depression_analysis",
    f"WITH RECURSIVE {_fill_cte([_sda_dem_sql(i) for i in range(_SDA_N)], 95)} "
    "SELECT cell_id, CAST("
    + " + ".join(f"CASE WHEN fill{i} > z{i} THEN 1 ELSE 0 END"
                 for i in range(_SDA_N))
    + " AS BIGINT) AS ndep FROM fillw",
)
def stochastic_depression_analysis(sf_dir: str):
    """StochasticDepressionAnalysis (hydro_analysis/
    stochastic_depression_analysis.rs), derandomized: N=4 splitmix64 noise
    realizations; ndep(cell) = number of realizations where the filled
    noisy surface exceeds the noisy surface (cell in a depression).
    SQL oracle: a 4-lane hydrodefs._fill_cte relaxation (380 steps lock-
    step; lanes converge at <=346, priority-flood equality in
    tests/test_hydro6.py stays as the cross-check)."""
    from ..stages.pregel import fill_depressions_pregel

    outs = []
    for i in range(_SDA_N):
        def zfn(cells: np.ndarray, _i=i) -> np.ndarray:
            return _value_fn(cells).astype(np.int64) * 4 \
                + _sda_noise(cells, _i)

        fill = fill_depressions_pregel(zfn, GRID1)

        def dep(df: pd.DataFrame, _i=i) -> pd.DataFrame:
            cid = df["cell_id"].to_numpy(np.int64)
            z = _value_fn(cid).astype(np.int64) * 4 + _sda_noise(cid, _i)
            return pd.DataFrame({
                "cell_id": cid,
                "ndep": (df["fill"].to_numpy(np.int64) > z)
                .astype(np.int64)})

        outs.append(fill.map_batches(dep, batch_format="pandas"))

    from ..relational import partial_agg

    u = outs[0]
    for o in outs[1:]:
        u = u.union(o)
    return partial_agg(u, ["cell_id"], [("ndep", "sum", "ndep")])
