"""Terrain sweep #12 — the off-terrain-object pair:
RemoveOffTerrainObjects (terrain_analysis/remove_off_terrain_objects.rs,
Lindsay 2018) and MapOffTerrainObjects (terrain_analysis/map_otos.rs).

Pipeline (shared):
1. white top-hat: opening = dilate(erode(z)) over the filter x filter
   square window (one FUSED k=2*mid halo exchange); tophat = z - opening —
   INTEGER on the integer synthetic DEM.
2. ground region grow over the top-hat (remove_off_terrain_objects.rs:
   457-506): seeds tophat <= 1 (slope 60 deg on the unit grid: thresholds
   tan60*len round to the integer conditions dz <= 1 cardinal / <= 2
   diagonal); growth is monotone, so it runs as Planchon-style tile-halo
   iterations (within-tile sweeps to local fixpoint, rounds bounded by the
   tile-graph diameter) — the sequential stack order is immaterial because
   reachability is order-free.
3a. MapOffTerrainObjects analog: the non-ground mask's 8-connected blobs
   via the clump machinery, labels canonicalized to the lowest cell id
   (the reference's fid numbering is scan-order); ground cells emit 1.
3b. RemoveOffTerrainObjects: ground cells keep z; non-ground cells get the
   1/d^2-weighted IDW of z over GROUND EDGE cells (ground with a
   non-ground 8-neighbour) within radius filter/1.5 (:514-578, the
   squared-euclidean FRS weights) — one k=8 halo exchange, fixed offset
   enumeration order so the float sums are deterministic.

Rows-only; scalar-literal oracle in tests/test_terrain12.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..grid import GridSpec
from ..layers import GRID1
from ..rasterdefs import (_DX, _DY, _FILT, _GFLAG, _MID, _THR,
                          _value_fn, tophat_state_tiles)
from .queries import query

_RAD2 = (_FILT / 1.5) ** 2  # FRS radius^2 (squared-euclidean metric)
_IDW_OFFS = tuple((dy, dx)
                  for dy in range(-8, 9) for dx in range(-8, 9)
                  if 0 < dy * dy + dx * dx <= _RAD2)


def grow_ground_tiles(state_tiles, grid: GridSpec, *, tile: int = 64,
                      max_rounds: int = 64):
    """Tile-halo fixpoint of the directional ground grow; returns tiles of
    the packed state with the final ground flags."""
    from ..stages.raster import stencil_tiles_as_input, window_exchange

    tiles = state_tiles
    for _round in range(max_rounds):
        def grow_kern(padded, nr, nc, r0, c0):
            th = np.where(np.isnan(padded), np.nan, padded % _GFLAG)
            gr = padded >= _GFLAG
            changed_any = 0
            while True:
                newg = np.zeros((nr, nc), bool)
                for i in range(8):
                    src = gr[1 + _DY[i]:1 + _DY[i] + nr,
                             1 + _DX[i]:1 + _DX[i] + nc]
                    ths = th[1 + _DY[i]:1 + _DY[i] + nr,
                             1 + _DX[i]:1 + _DX[i] + nc]
                    cond = src & ~gr[1:1 + nr, 1:1 + nc] \
                        & (th[1:1 + nr, 1:1 + nc] - ths <= _THR[i])
                    newg |= np.where(np.isnan(th[1:1 + nr, 1:1 + nc]),
                                     False, cond)
                if not newg.any():
                    break
                changed_any = 1
                gr[1:1 + nr, 1:1 + nc] |= newg
            state = th[1:1 + nr, 1:1 + nc] \
                + _GFLAG * gr[1:1 + nr, 1:1 + nc]
            row = {"trow": r0 // tile, "tcol": c0 // tile, "nrows": nr,
                   "ncols": nc, "z": state.ravel(),
                   "chg": np.full(nr * nc, changed_any, np.float64)}
            return pd.DataFrame([row])

        res = window_exchange(tiles, grid, grow_kern, tile=tile, k=1) \
            .materialize()
        chg = res.map_batches(
            lambda df: pd.DataFrame(
                {"n": [int(sum(np.asarray(v)[0] for v in df["chg"]))]}),
            batch_format="pandas").to_pandas()["n"].sum()
        tiles = stencil_tiles_as_input(res, grid, "z").materialize()
        if int(chg) == 0:
            break
    return tiles


_OTO_BIG = 1 << 40


def _oto_base_ctes() -> str:
    """cells -> truncated 11x11 white top-hat (the proven terrain13 arm
    unions, equality with tophat_state_tiles asserted in
    tests/test_terrain12.py) -> directional ground grow as a dedup-
    recursive CTE (seeds th <= 1; u joins from ground v when
    th(u) - th(v) <= 2 diagonal / 1 cardinal)."""
    from ..rasterdefs import _CELLS_CTE

    ero_arms = " UNION ALL ".join(
        f"SELECT a.cell_id, b.v AS w FROM cells a JOIN cells b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr in range(-_MID, _MID + 1) for dc in range(-_MID, _MID + 1))
    opn_arms = " UNION ALL ".join(
        f"SELECT a.cell_id, e.e AS w FROM cells a JOIN ero e "
        f"ON e.r = a.r + ({dr}) AND e.c = a.c + ({dc})"
        for dr in range(-_MID, _MID + 1) for dc in range(-_MID, _MID + 1))
    offvals = ", ".join(f"({-_DY[i]},{-_DX[i]},{_THR[i]})" for i in range(8))
    return f"""{_CELLS_CTE},
    ero AS MATERIALIZED (
      SELECT t.cell_id, c2.r, c2.c, MIN(t.w) AS e
      FROM ({ero_arms}) t JOIN cells c2 ON c2.cell_id = t.cell_id
      GROUP BY t.cell_id, c2.r, c2.c
    ),
    opn AS MATERIALIZED (
      SELECT t.cell_id AS cell_id, MAX(t.w) AS o FROM ({opn_arms}) t
      GROUP BY t.cell_id
    ),
    tht AS MATERIALIZED (
      SELECT c.cell_id, c.r, c.c, c.v - o.o AS th
      FROM cells c JOIN opn o ON o.cell_id = c.cell_id
    ),
    goffs(dr, dc, thr) AS (SELECT * FROM (VALUES {offvals}) t(a,b,c)),
    grow(cell) AS (
      SELECT cell_id FROM tht WHERE th <= 1
      UNION
      SELECT t.cell_id
      FROM grow g JOIN tht gv ON gv.cell_id = g.cell
      JOIN goffs o ON TRUE
      JOIN tht t ON t.r = gv.r + o.dr AND t.c = gv.c + o.dc
      WHERE t.th - gv.th <= o.thr
    ),
    gmask AS MATERIALIZED (
      SELECT c.cell_id, c.r, c.c, c.v,
             (g.cell IS NOT NULL) AS gr
      FROM cells c LEFT JOIN grow g ON g.cell = c.cell_id
    )"""


def _oto_label_sql(outer: int = 135, steps: int = 4) -> str:
    """map_otos oracle: the base CTEs + 8-connected min-label Jacobi over
    the non-ground mask (separable min; converges at 507 steps on this
    fixture, 540 budgeted — equality with the clump labels asserted by
    oracle parity)."""
    cols, n = GRID1.cols, GRID1.rows * GRID1.cols

    def lab_step(src: str) -> str:
        lft = (f"COALESCE(CASE WHEN (cid % {cols}) > 0 THEN LAG(lab, 1) "
               f"OVER (ORDER BY cid) END, {_OTO_BIG})")
        rgt = (f"COALESCE(CASE WHEN (cid % {cols}) < {cols - 1} THEN "
               f"LEAD(lab, 1) OVER (ORDER BY cid) END, {_OTO_BIG})")
        l1 = (f"SELECT iter, cid, ng, lab, LEAST({lft}, lab, {rgt}) AS h3 "
              f"FROM ({src})")
        up = f"COALESCE(LAG(h3, {cols}) OVER (ORDER BY cid), {_OTO_BIG})"
        dn = f"COALESCE(LEAD(h3, {cols}) OVER (ORDER BY cid), {_OTO_BIG})"
        return (f"SELECT iter, cid, ng, CASE WHEN ng THEN "
                f"LEAST({up}, h3, {dn}) ELSE {_OTO_BIG} END AS lab "
                f"FROM ({l1})")

    src = f"SELECT iter, cid, ng, lab FROM relax_lab WHERE iter < {outer}"
    for _ in range(steps):
        src = lab_step(src)
    return f"""
    WITH RECURSIVE {_oto_base_ctes()},
    relax_lab(iter, cid, ng, lab) AS (
      SELECT 0, cell_id, NOT gr,
             CASE WHEN gr THEN {_OTO_BIG} ELSE cell_id END
      FROM gmask
      UNION ALL
      SELECT iter+1, cid, ng, lab FROM ({src}) s
    )
    SELECT g.cell_id, CASE WHEN g.gr THEN 1 ELSE r.lab END AS oto
    FROM gmask g JOIN (SELECT cid, lab FROM relax_lab
                       WHERE iter = {outer}) r ON r.cid = g.cell_id
    """


@query("map_otos", _oto_label_sql())
def map_otos(sf_dir: str):
    """MapOffTerrainObjects (terrain_analysis/map_otos.rs) analog on the
    shared top-hat grow: output (cell_id, oto) with ground cells = 1 and
    each 8-connected off-terrain blob labelled by its lowest cell id.
    SQL oracle: _oto_label_sql (tophat arms + grow recursion + min-label
    Jacobi); scalar oracle also in tests/test_terrain12.py."""
    return map_otos_pipeline(GRID1, _value_fn)


def map_otos_pipeline(grid, value_fn, *, tile: int = 64):
    import ray

    from ..relational import partial_agg
    from ..stages.clump import clump
    from ..stages.spatial_join import _cached_get

    GRID1 = grid  # noqa: N806 — closures below use the local grid
    tiles = grow_ground_tiles(tophat_state_tiles(grid, value_fn, tile=tile),
                              grid, tile=tile)

    # non-ground mask tiles for the clump (ground -> nodata)
    def mask(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["data"] = [np.where(np.asarray(v) >= _GFLAG, -32768.0, 1.0)
                       for v in df["data"]]
        return out

    comp = clump(tiles.map_batches(mask, batch_format="pandas"), grid,
                 tile=tile)
    # canonical min-cell label per clump id
    mins = partial_agg(comp, ["clump_id"],
                       [("cell_id", "min", "mincell")]).to_pandas()
    lab = dict(zip(mins["clump_id"].to_numpy(np.int64).tolist(),
                   mins["mincell"].to_numpy(np.int64).tolist()))
    lref = ray.put(lab)

    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        lb = _cached_get(lref)
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": cid,
            "oto": df["clump_id"].map(lb).to_numpy(np.int64)})

    blobs = comp.map_batches(relabel, batch_format="pandas")

    # ground rows straight from the state tiles (distributed)
    def ground_rows(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * tile, int(t.tcol) * tile
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            st = np.asarray(t.data, np.float64)
            m = st >= _GFLAG
            cid = (rr * GRID1.cols + cc).ravel()[m]
            frames.append(pd.DataFrame({
                "cell_id": cid, "oto": np.ones(len(cid), np.int64)}))
        return pd.concat(frames, ignore_index=True)

    gds = tiles.map_batches(ground_rows, batch_format="pandas")
    return blobs.union(gds)


def _roto_sql() -> str:
    """remove_off_terrain_objects oracle: base CTEs + ground-edge flag (8
    arm windows) + the 1/d^2 IDW as LEFT-FOLD chains over the fixed
    _IDW_OFFS enumeration order — bitwise-identical to the kernel's
    `wsum += where(e, w, 0.0)` accumulation (adding literal 0.0 terms is
    float-exact)."""
    cols, rows = GRID1.cols, GRID1.rows

    def nbr(col: str, dy: int, dx: int, default: str) -> str:
        off = dy * cols + dx
        fn = "LAG" if off < 0 else "LEAD"
        conds = []
        if dx < 0:
            conds.append(f"(cid % {cols}) >= {-dx}")
        if dx > 0:
            conds.append(f"(cid % {cols}) < {cols - dx}")
        pred = " AND ".join(conds) if conds else "TRUE"
        if off == 0:
            return col
        return (f"COALESCE(CASE WHEN {pred} THEN {fn}({col}, {abs(off)}) "
                f"OVER (ORDER BY cid) END, {default})")

    edge_terms = " OR ".join(nbr("ngf", _DY[i], _DX[i], "FALSE")
                             for i in range(8))
    # edge = ground cell with any on-grid NON-ground neighbour. The IDW
    # left-fold is split into chained 32-term layers (DuckDB's binder caps
    # expression nesting at 128) — the accumulation ORDER is unchanged, so
    # the float sums stay bitwise-identical to the kernel's loop.
    src = "SELECT cid, v, gr, edg, 0.0 AS wsum, 0.0 AS zsum FROM edged"
    offs = list(_IDW_OFFS)
    for lo in range(0, len(offs), 32):
        wchain, zchain = "wsum", "zsum"
        for dy, dx in offs[lo:lo + 32]:
            w = 1.0 / (dy * dy + dx * dx)
            e = nbr("edg", dy, dx, "FALSE")
            z = f"(((cid + {dy * cols + dx}) * 1000003) % 1000)"
            wchain = f"({wchain} + CASE WHEN {e} THEN {w!r} ELSE 0.0 END)"
            zchain = (f"({zchain} + CASE WHEN {e} THEN "
                      f"CAST({z} AS DOUBLE) * {w!r} ELSE 0.0 END)")
        src = (f"SELECT cid, v, gr, edg, {wchain} AS wsum, "
               f"{zchain} AS zsum FROM ({src})")
    return f"""
    WITH RECURSIVE {_oto_base_ctes()},
    st AS MATERIALIZED (
      SELECT cell_id AS cid, v, gr, NOT gr AS ngf FROM gmask
    ),
    edged AS MATERIALIZED (
      SELECT cid, v, gr, (gr AND ({edge_terms})) AS edg FROM st
    ),
    idw AS ({src})
    SELECT cid AS cell_id,
           CAST(CASE WHEN gr THEN FLOOR(CAST(v AS DOUBLE) * 1e6 + 0.5)
                WHEN wsum > 0.0 THEN FLOOR(zsum / wsum * 1e6 + 0.5)
                ELSE -1 END AS BIGINT) AS zout_u
    FROM idw
    """


@query("remove_off_terrain_objects", _roto_sql())
def remove_off_terrain_objects(sf_dir: str):
    """RemoveOffTerrainObjects
    (terrain_analysis/remove_off_terrain_objects.rs:240-610): ground cells
    keep z; off-terrain cells get the 1/d^2 IDW of z over ground-edge
    cells within radius filter/1.5; unreachable cells emit -1. Output
    (cell_id, zout_u) micro-quantized int64 (DuckDB reassociates constant
    float folds, so the raw double cannot be matched bitwise; the 1e-6
    quantum sits >3 orders of magnitude above the reassociation drift and
    the fixture's nearest rounding boundary is 6e-4 away). SQL oracle:
    _roto_sql; scalar oracle also in tests/test_terrain12.py."""
    res = remove_oto_pipeline(GRID1, _value_fn)

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        z = df["zout"].to_numpy(np.float64)
        q = np.floor(z * 1e6 + 0.5)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "zout_u": np.where(np.isnan(q), -1, q).astype(np.int64)})

    return res.map_batches(quant, batch_format="pandas")


def remove_oto_pipeline(grid, value_fn, *, tile: int = 64):
    from ..stages.raster import window_exchange

    GRID1 = grid  # noqa: N806 — closures below use the local grid
    _value_fn = value_fn  # noqa: N806
    tiles = grow_ground_tiles(tophat_state_tiles(grid, value_fn, tile=tile),
                              grid, tile=tile)

    def backfill(padded, nr, nc, r0, c0):
        gr = padded >= _GFLAG
        valid = ~np.isnan(padded)
        # ground-edge: ground with any valid non-ground 8-neighbour —
        # computed on the padded-minus-one-ring region with pure slicing
        # (no wrap); the IDW offsets only reach radius 7 < 8, so the
        # missing outermost ring is never consulted
        edge = np.zeros_like(gr)
        hh, ww = padded.shape
        core = (slice(1, hh - 1), slice(1, ww - 1))
        ecore = np.zeros((hh - 2, ww - 2), bool)
        for i in range(8):
            sl = (slice(1 + _DY[i], hh - 1 + _DY[i]),
                  slice(1 + _DX[i], ww - 1 + _DX[i]))
            ecore |= gr[core] & valid[sl] & ~gr[sl]
        edge[core] = ecore
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                             np.arange(c0, c0 + nc, dtype=np.int64),
                             indexing="ij")
        gcell = np.meshgrid(np.arange(r0 - 8, r0 + nr + 8, dtype=np.int64),
                            np.arange(c0 - 8, c0 + nc + 8, dtype=np.int64),
                            indexing="ij")
        zpad = _value_fn((gcell[0] * GRID1.cols + gcell[1]).ravel()) \
            .reshape(padded.shape)
        wsum = np.zeros((nr, nc))
        zsum = np.zeros((nr, nc))
        for dy, dx in _IDW_OFFS:
            e = edge[8 + dy:8 + dy + nr, 8 + dx:8 + dx + nc]
            zz = zpad[8 + dy:8 + dy + nr, 8 + dx:8 + dx + nc]
            w = 1.0 / (dy * dy + dx * dx)
            wsum += np.where(e, w, 0.0)
            zsum += np.where(e, zz * w, 0.0)
        gin = gr[8:8 + nr, 8:8 + nc]
        zin = zpad[8:8 + nr, 8:8 + nc]
        with np.errstate(invalid="ignore"):
            zout = np.where(gin, zin, np.where(wsum > 0.0, zsum / wsum,
                                               np.nan))
        return pd.DataFrame([{
            "cell_id_arr": (rr * GRID1.cols + cc).ravel(),
            "zout_arr": zout.ravel()}])

    res = window_exchange(tiles, grid, backfill, tile=tile, k=8)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = [pd.DataFrame({"cell_id": np.asarray(t.cell_id_arr,
                                                      np.int64),
                                "zout": np.asarray(t.zout_arr, np.float64)})
                  for t in df.itertuples()]
        return pd.concat(frames, ignore_index=True)

    return res.map_batches(explode, batch_format="pandas")
