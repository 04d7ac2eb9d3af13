"""Terrain sweep #13: EmbankmentMapping
(terrain_analysis/embankment_mapping.rs, Van Nieuwenhuizen, Lindsay &
DeVries 2021) — same kernel covers the plugin twin MapEmbankments
(terrain_analysis/map_embankments.rs).

The reference rasterizes a transportation vector, repositions the road
cells onto the embankment crest, and region-grows embankment cells under
height/width/slope constraints. The analog here: road cells from the
shared DDA-rasterized segment layer seed a breadth-limited grow over the
white top-hat residual (the raised-surface signal the paper uses):
embankment = cells with tophat >= 2 reachable from a road cell through
tophat >= 2 cells within 8 BFS steps (the max embankment width). The
radius cap makes the grow strictly local — ONE k=8 halo exchange, no
iteration: any qualifying path lies inside the window of the cell it
reaches. Output (cell_id, emb) 0/1. Rows-only; vectorized whole-grid
fixpoint oracle in tests/test_terrain13.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..layers import GRID1
from ..rasterdefs import _GFLAG, _value_fn, tophat_state_tiles
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols
_HMIN = 2     # minimum top-hat residual (raised surface)
_WMAX = 8     # max embankment width in BFS steps
_ROAD_N = 150  # segments in the synthetic road network


def road_cells() -> np.ndarray:
    """Grid cell ids of the DDA-rasterized synthetic road segments."""
    from ..stages.lines import synth_segments

    seg = synth_segments(_ROAD_N, seed=4242)
    out = []
    cx0 = np.floor(seg["x0"].to_numpy()).astype(np.int64)
    cy0 = np.floor(seg["y0"].to_numpy()).astype(np.int64)
    cx1 = np.floor(seg["x1"].to_numpy()).astype(np.int64)
    cy1 = np.floor(seg["y1"].to_numpy()).astype(np.int64)
    adx, ady = np.abs(cx1 - cx0), np.abs(cy1 - cy0)
    sx = np.where(cx1 >= cx0, 1, -1)
    sy = np.where(cy1 >= cy0, 1, -1)
    span = np.maximum(adx, ady)
    for j in range(len(seg)):
        i = np.arange(span[j] + 1, dtype=np.int64)
        if adx[j] >= ady[j]:
            cx = cx0[j] + i * sx[j]
            cy = (np.full(i.size, cy0[j], np.int64) if adx[j] == 0 else
                  cy0[j] + sy[j] * ((2 * i * ady[j] + adx[j])
                                    // (2 * adx[j])))
        else:
            cy = cy0[j] + i * sy[j]
            cx = cx0[j] + sx[j] * ((2 * i * adx[j] + ady[j])
                                   // (2 * ady[j]))
        row = 84 - cy  # GRID1: north=85, res 1 -> floor((85-y)) = 84-cy
        col = cx + 180
        ok = (row >= 0) & (row < _ROWS) & (col >= 0) & (col < _COLS)
        out.append(row[ok] * _COLS + col[ok])
    return np.unique(np.concatenate(out))




def _emb_sql() -> str:
    """SQL twin of the embankment grow: truncated-window 11x11 white
    top-hat (erode-then-dilate arm unions), the shared DDA road layer, and
    the width-capped region grow unrolled as 8 masked 8-dilations (the
    radius cap makes the fixpoint a bounded morphology, so the oracle needs
    no recursion)."""
    from ..linedefs import _dda_walk_sql
    from .sqlgen import synth_segments_cte

    roads_seg = synth_segments_cte(_ROAD_N, seed=4242) \
        .replace("seg_h", "road_seg_h").replace("seg_u", "road_seg_u") \
        .replace("seg AS", "road_seg AS")
    ero_arms = " UNION ALL ".join(
        f"SELECT a.cell_id, b.v AS w FROM cells a JOIN cells b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr in range(-5, 6) for dc in range(-5, 6))
    opn_arms = " UNION ALL ".join(
        f"SELECT a.cell_id, e.e AS w FROM cells a JOIN ero e "
        f"ON e.r = a.r + ({dr}) AND e.c = a.c + ({dc})"
        for dr in range(-5, 6) for dc in range(-5, 6))
    dil = []
    g_prev = "g0"
    for step in range(1, _WMAX + 1):
        arms = " UNION ALL ".join(
            f"SELECT m.cell_id, m.r, m.c FROM mask m JOIN {g_prev} g "
            f"ON g.r = m.r + ({dr}) AND g.c = m.c + ({dc})"
            for dr in (-1, 0, 1) for dc in (-1, 0, 1))
        dil.append(f"""g{step} AS MATERIALIZED (
      SELECT DISTINCT cell_id, r, c FROM ({arms}) t)""")
        g_prev = f"g{step}"
    from ..rasterdefs import _CELLS_CTE

    return f"""
    WITH {_CELLS_CTE},
    {roads_seg},
    {_dda_walk_sql(_ROAD_N, 4242, "road")},
    ero AS MATERIALIZED (
      SELECT t.cell_id, c2.r, c2.c, MIN(t.w) AS e
      FROM ({ero_arms}) t JOIN cells c2 ON c2.cell_id = t.cell_id
      GROUP BY t.cell_id, c2.r, c2.c
    ),
    opn AS MATERIALIZED (
      SELECT cell_id, MAX(w) AS o FROM ({opn_arms}) GROUP BY cell_id
    ),
    th AS MATERIALIZED (
      SELECT c.cell_id, c.r, c.c, c.v - o.o AS th
      FROM cells c JOIN opn o ON o.cell_id = c.cell_id
    ),
    mask AS MATERIALIZED (SELECT cell_id, r, c FROM th WHERE th >= {_HMIN}),
    g0 AS MATERIALIZED (
      SELECT m.cell_id, m.r, m.c FROM mask m
      JOIN road rd ON rd.cell_id = m.cell_id
    ),
    {",".join(dil)}
    SELECT c.cell_id, CAST(g.cell_id IS NOT NULL AS BIGINT) AS emb
    FROM cells c LEFT JOIN g{_WMAX} g ON g.cell_id = c.cell_id
    """


@query("embankment_mapping", _emb_sql())
def embankment_mapping(sf_dir: str):
    """EmbankmentMapping / MapEmbankments (module docstring): road-seeded
    width-capped grow over the top-hat residual. Output (cell_id, emb)
    int64 0/1 over the full grid. SQL-exact (round-4 conversion): the
    bounded grow unrolls as 8 masked dilations in the oracle."""
    from ..stages.raster import window_exchange
    from ..stages.spatial_join import _cached_get

    tiles = tophat_state_tiles(GRID1, _value_fn)
    roads_ref = ray.put(road_cells())

    def kern(padded, nr, nc, r0, c0):
        roads = _cached_get(roads_ref)
        with np.errstate(invalid="ignore"):
            th = np.where(np.isnan(padded), -1.0, padded % _GFLAG)
        hh, ww = padded.shape
        rr, cc = np.meshgrid(np.arange(r0 - _WMAX, r0 + nr + _WMAX,
                                       dtype=np.int64),
                             np.arange(c0 - _WMAX, c0 + nc + _WMAX,
                                       dtype=np.int64), indexing="ij")
        ingrid = (rr >= 0) & (rr < _ROWS) & (cc >= 0) & (cc < _COLS)
        cid = np.where(ingrid, rr * _COLS + cc, -1)
        is_road = np.isin(cid, roads) & ingrid
        ok = th >= _HMIN
        grown = is_road & ok
        for _step in range(_WMAX):
            nxt = grown.copy()
            nxt[1:, :] |= grown[:-1, :]
            nxt[:-1, :] |= grown[1:, :]
            nxt[:, 1:] |= grown[:, :-1]
            nxt[:, :-1] |= grown[:, 1:]
            nxt[1:, 1:] |= grown[:-1, :-1]
            nxt[1:, :-1] |= grown[:-1, 1:]
            nxt[:-1, 1:] |= grown[1:, :-1]
            nxt[:-1, :-1] |= grown[1:, 1:]
            grown = nxt & ok
        emb = grown[_WMAX:_WMAX + nr, _WMAX:_WMAX + nc]
        rr2 = rr[_WMAX:_WMAX + nr, _WMAX:_WMAX + nc]
        cc2 = cc[_WMAX:_WMAX + nr, _WMAX:_WMAX + nc]
        return pd.DataFrame([{
            "cell_id_arr": (rr2 * _COLS + cc2).ravel(),
            "emb_arr": emb.ravel().astype(np.int64)}])

    res = window_exchange(tiles, GRID1, kern, k=_WMAX)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = [pd.DataFrame({"cell_id": np.asarray(t.cell_id_arr,
                                                      np.int64),
                                "emb": np.asarray(t.emb_arr, np.int64)})
                  for t in df.itertuples()]
        return pd.concat(frames, ignore_index=True)

    return res.map_batches(explode, batch_format="pandas")


# --------------------------------------------------------------------------
# TopographicHachures (terrain_analysis/topographic_hachures.rs): the
# reference draws slope-line strokes between contours. Analog: hachure
# strokes seeded on a regular 8x8 lattice, each stroke tracing the D8
# steepest-descent path for up to 6 steps — (stroke, k, cell) vertex rows,
# SQL-exact through the shared pointer-graph CTE.
# --------------------------------------------------------------------------
from ..hydrodefs import _GRAPH_CTES  # noqa: E402  (leaf module)

_HACH_STEPS = 6

_HACH_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    seeds AS (
      SELECT cell_id FROM cells WHERE r % 8 = 4 AND c % 8 = 4
    ),
    hwalk(stroke, cell_id, k) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM seeds
      UNION ALL
      SELECT w.stroke, g.down_id, w.k + 1
      FROM hwalk w JOIN graph g ON g.cell_id = w.cell_id
      WHERE g.down_id >= 0 AND w.k < {_HACH_STEPS}
    )
    SELECT stroke, k, cell_id FROM hwalk
"""


@query("topographic_hachures", _HACH_SQL)
def topographic_hachures(sf_dir: str):
    """TopographicHachures (terrain_analysis/topographic_hachures.rs)
    analog: lattice-seeded steepest-descent strokes (module comment).
    Strokes are embarrassingly parallel seed tasks with locally-evaluated
    pointers (the insert_dams pattern — walks are <= 6 steps, zero
    exchange). Output (stroke, k, cell_id) int64."""
    import ray.data

    from .queries_hydro10 import _d8_down_local

    rr, cc = np.meshgrid(np.arange(4, _ROWS, 8, dtype=np.int64),
                         np.arange(4, _COLS, 8, dtype=np.int64),
                         indexing="ij")
    seeds = (rr * _COLS + cc).ravel()
    ds = ray.data.from_pandas(pd.DataFrame({"seed": seeds})).repartition(4)

    def trace(df: pd.DataFrame) -> pd.DataFrame:
        cur = df["seed"].to_numpy(np.int64)
        stroke = cur.copy()
        frames = [pd.DataFrame({"stroke": stroke, "k": np.int64(0),
                                "cell_id": cur})]
        alive = np.ones(len(cur), bool)
        for k in range(1, _HACH_STEPS + 1):
            down = _d8_down_local(cur // _COLS, cur % _COLS)
            alive &= down >= 0
            if not alive.any():
                break
            cur = np.where(alive, down, cur)
            frames.append(pd.DataFrame({
                "stroke": stroke[alive],
                "k": np.full(int(alive.sum()), k, np.int64),
                "cell_id": cur[alive]}))
        return pd.concat(frames, ignore_index=True)

    return ds.map_batches(trace, batch_format="pandas")
