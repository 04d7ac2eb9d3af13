"""Hydro sweep #5: FD8Pointer, RaiseWalls, FlattenLakes, UnnestBasins,
UpslopeDepressionStorage, DInfPointer.

Compositions over the established machinery: the integer-DDA line walk
(queries_data2.vector_lines_to_raster) rasterizes the wall lines, the
broadcast polygon layer (queries_more.polygons_to_raster) selects lake
cells, the bitmask-accumulation trick computes pour-point nesting levels
in ONE Pregel pass (mass = 2^pour_index, 12 pours < 63 bits), and
per-level watersheds are cut-graph basins runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hydrodefs import (_FILL_DEM_VALUE, _GRAPH_CTES, _WALK_UNITS_CTE,
                         _d8_pointer, _fill_cte)
from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query
from .sqlgen import sm64, synth_segments_cte

_ROWS, _COLS = GRID1.rows, GRID1.cols
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


# --------------------------------------------------------------------------
# FD8Pointer (hydro_analysis/fd8_pointer.rs): the bit-sum of ALL lower
# 8-neighbours (multiple flow directions).
# --------------------------------------------------------------------------
_FD8_ARMS = " UNION ALL ".join(
    f"SELECT a.cell_id, CAST({1 << i} AS BIGINT) AS bit "
    f"FROM cells a JOIN cells b "
    f"ON b.r = a.r + ({_DY[i]}) AND b.c = a.c + ({_DX[i]}) "
    f"WHERE b.v < a.v"
    for i in range(8))


@query(
    "fd8_pointer",
    f"""
    WITH {_CELLS_CTE},
    bits AS ({_FD8_ARMS})
    SELECT c.cell_id, CAST(COALESCE(SUM(b.bit), 0) AS BIGINT) AS fd8
    FROM cells c LEFT JOIN bits b ON b.cell_id = c.cell_id
    GROUP BY c.cell_id
    """,
)
def fd8_pointer(sf_dir: str):
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        code = np.zeros((nr, nc), np.int64)
        for i in range(8):
            zn = padded[1 + _DY[i]:1 + _DY[i] + nr, 1 + _DX[i]:1 + _DX[i] + nc]
            code += np.where(~np.isnan(zn) & (zn < z), np.int64(1 << i), 0)
        return {"fd8": code.astype(np.float64)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "fd8": df["fd8"].astype(np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# RaiseWalls (hydro_analysis/raise_walls.rs): z + wall_height on the cells
# of the rasterized wall lines (the synthetic segment layer through the
# integer-DDA walk of vector_lines_to_raster, mapped into GRID1).
# --------------------------------------------------------------------------
_WALL_N = 400
_WALL_H = 100


def _raise_walls_sql() -> str:
    return f"""
    WITH {synth_segments_cte(_WALL_N)},
    snap AS (SELECT seg_id,
                    CAST(floor(x0) AS BIGINT) AS cx0, CAST(floor(y0) AS BIGINT) AS cy0,
                    CAST(floor(x1) AS BIGINT) AS cx1, CAST(floor(y1) AS BIGINT) AS cy1
             FROM seg),
    par AS (SELECT seg_id, cx0, cy0, cx1, cy1,
                   GREATEST(ABS(cx1 - cx0), ABS(cy1 - cy0)) AS span,
                   ABS(cx1 - cx0) AS adx, ABS(cy1 - cy0) AS ady,
                   CASE WHEN cx1 >= cx0 THEN 1 ELSE -1 END AS sx,
                   CASE WHEN cy1 >= cy0 THEN 1 ELSE -1 END AS sy
            FROM snap),
    steps AS (SELECT p.*, CAST(g.i AS BIGINT) AS i
              FROM par p JOIN range(0, 20) g(i) ON g.i <= p.span),
    wwalk AS (SELECT
        CASE WHEN adx >= ady THEN cx0 + i * sx
             ELSE cx0 + sx * ((2 * i * adx + ady) // (2 * ady)) END AS cx,
        CASE WHEN adx >= ady THEN
             CASE WHEN adx = 0 THEN cy0
                  ELSE cy0 + sy * ((2 * i * ady + adx) // (2 * adx)) END
             ELSE cy0 + i * sy END AS cy
      FROM steps),
    wall AS (SELECT DISTINCT (84 - cy) * {_COLS} + (cx + 180) AS cell_id
             FROM wwalk
             WHERE cy BETWEEN -85 AND 84 AND cx BETWEEN -180 AND 179),
    {_CELLS_CTE}
    SELECT c.cell_id,
           CAST(c.v + CASE WHEN w.cell_id IS NOT NULL THEN {_WALL_H}
                           ELSE 0 END AS BIGINT) AS z
    FROM cells c LEFT JOIN wall w ON w.cell_id = c.cell_id
    """


@query("raise_walls", _raise_walls_sql())
def raise_walls(sf_dir: str):
    from ..stages.raster import synth_raster_tiles
    from ..stages.spatial_join import _cached_get
    from ..stages.lines import synth_segments

    seg = synth_segments(_WALL_N)
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
    wall = np.unique(np.concatenate(cells))
    ref = ray.put(wall)

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def rise(df: pd.DataFrame) -> pd.DataFrame:
        w = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * _COLS + cc.ravel()
            pos = np.minimum(np.searchsorted(w, cid), len(w) - 1) \
                if len(w) else np.zeros(len(cid), np.int64)
            on_wall = (w[pos] == cid) if len(w) else np.zeros(len(cid), bool)
            v = np.asarray(t.data, np.int64)
            frames.append(pd.DataFrame({
                "cell_id": cid, "z": v + np.where(on_wall, _WALL_H, 0)}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(rise, batch_format="pandas")


# --------------------------------------------------------------------------
# FlattenLakes (hydro_analysis/flatten_lakes.rs:336-465): cells inside a
# lake polygon take the lake's minimum elevation. Lake layer = the builtin
# polygon layer; assignment = the polygons_to_raster centre-in-polygon
# burn; the 4-entry lake->min map is broadcast.
# --------------------------------------------------------------------------
def _flatten_sql() -> str:
    from ..layers import p2r_case_sql

    _P2R_CASE = p2r_case_sql()
    return f"""
    WITH cellsxy AS (
      SELECT CAST(t.i AS BIGINT) AS cell_id,
             ({GRID1.west + GRID1.res_x / 2.0!r} + CAST(t.i % {_COLS} AS DOUBLE) * {GRID1.res_x!r}) AS cx,
             ({GRID1.north - GRID1.res_y / 2.0!r} - CAST(t.i // {_COLS} AS DOUBLE) * {GRID1.res_y!r}) AS cy,
             ((t.i * 1000003) % 1000) AS v
      FROM range({_ROWS * _COLS}) t(i)),
    assign AS (
      SELECT cell_id, v, {_P2R_CASE.replace('cells', 'cellsxy')} AS poly_id
      FROM cellsxy
    ),
    lakemin AS (
      SELECT poly_id, MIN(v) AS zmin FROM assign
      WHERE poly_id IS NOT NULL GROUP BY poly_id
    )
    SELECT a.cell_id,
           CAST(CASE WHEN a.poly_id IS NOT NULL THEN m.zmin ELSE a.v END
                AS BIGINT) AS z
    FROM assign a LEFT JOIN lakemin m ON m.poly_id = a.poly_id
    """


@query("flatten_lakes", _flatten_sql())
def flatten_lakes(sf_dir: str):
    from ..relational import partial_agg
    from ..stages.spatial_join import _cached_get
    from .queries_more import polygons_to_raster

    burn = polygons_to_raster(sf_dir).materialize()

    def withv(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({"poly_id": df["poly_id"].to_numpy(np.int64),
                             "zmin": _value_fn(cid).astype(np.int64)})

    mins = partial_agg(burn.map_batches(withv, batch_format="pandas"),
                       ["poly_id"], [("zmin", "min", "zmin")]).to_pandas()
    # per-LAKE minima stay driver-side (bounded by the lake count); the
    # per-CELL assignment does NOT — it grows with lake area, so it is
    # joined back as a Dataset instead of the round-3 broadcast pull.
    lut_ref = ray.put(dict(zip(mins["poly_id"].astype(int),
                               mins["zmin"].astype(int))))

    def lakez(df: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(lut_ref)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "zlake": np.array([m[int(p)] for p in df["poly_id"]],
                              np.int64)})

    from ..stages.raster import synth_raster_tiles

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            frames.append(pd.DataFrame({
                "cell_id": rr.ravel() * _COLS + cc.ravel(),
                "v": np.asarray(t.data, np.int64)}))
        return pd.concat(frames, ignore_index=True)

    cells = tiles.map_batches(explode, batch_format="pandas")
    j = cells.join(burn.map_batches(lakez, batch_format="pandas"),
                   join_type="left_outer", num_partitions=8,
                   on=("cell_id",))

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        zl = df["zlake"].to_numpy(np.float64)
        v = df["v"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "z": np.where(np.isnan(zl), v, zl).astype(np.int64)})

    return j.map_batches(pick, batch_format="pandas")


# --------------------------------------------------------------------------
# UnnestBasins (hydro_analysis/unnest_basins.rs): nested watersheds of the
# raw pour points. A pour point's nesting level = 1 + number of pour
# points strictly downstream on its D8 path; the level-k raster labels
# every cell whose path reaches a level-k pour first (cut-graph basins
# over that level's pour subset). Pour levels come from ONE bitmask
# accumulation (mass = 2^pour_index).
# --------------------------------------------------------------------------
def _unnest_sql() -> str:
    from ..hydrodefs import _POUR_SEED, N_POUR

    return f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE},
    pour_h AS (
      SELECT CAST(t.i AS BIGINT) AS pour_id,
             {sm64(f"CAST(t.i AS UBIGINT) + {_POUR_SEED}")} AS h
      FROM range({N_POUR}) t(i)
    ),
    pour AS MATERIALIZED (
      SELECT pour_id,
             (1 + CAST(h % {_ROWS - 2} AS BIGINT)) * {_COLS}
             + (1 + CAST({sm64('h')} % {_COLS - 2} AS BIGINT)) AS cell_id
      FROM pour_h
    ),
    -- nesting level: pours strictly downstream on the pour's own path
    lvl2 AS MATERIALIZED (
      SELECT p.pour_id, p.cell_id, 1 + COUNT(q.cell_id) AS level
      FROM pour p
      LEFT JOIN walku w ON w.start = p.cell_id AND w.cur <> p.cell_id
      LEFT JOIN pour q ON q.cell_id = w.cur
      GROUP BY p.pour_id, p.cell_id
    ),
    -- first pour on each cell's path (hop-ordered): the walku row with the
    -- smallest units among pour hits
    hits AS (
      SELECT w.start AS cell_id, p.pour_id, l.level, w.units,
             row_number() OVER (PARTITION BY w.start, l.level
                                ORDER BY w.units ASC, p.pour_id ASC) AS rn
      FROM walku w
      JOIN pour p ON p.cell_id = w.cur
      JOIN lvl2 l ON l.pour_id = p.pour_id
    )
    SELECT cell_id, CAST(level AS BIGINT) AS level,
           CAST(pour_id AS BIGINT) AS pour_id
    FROM hits WHERE rn = 1
    """


@query("unnest_basins", _unnest_sql())
def unnest_basins(sf_dir: str):
    from ..stages.flow import down_ds_from_pointer, tile_of_expr
    from ..stages.pregel import basins_pregel, weighted_accumulation_pregel
    from ..stages.spatial_join import _cached_get
    from ..hydrodefs import _pour_cells

    pours = _pour_cells()
    psort = np.sort(pours)
    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()

    # pour bitmask accumulation -> levels
    def masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        m = np.zeros(len(cid), np.int64)
        for i, p in enumerate(pours.tolist()):
            m = np.where(cid == p, m | (1 << i), m)
        return pd.DataFrame({"cell_id": cid,
                             "tile": tile_of_expr(cid, GRID1, 64),
                             "mass": m})

    acc = weighted_accumulation_pregel(
        dds, dds.map_batches(masses, batch_format="pandas"), GRID1)
    at_pour = acc.map_batches(
        lambda df: df[df["cell_id"].isin(psort)], batch_format="pandas") \
        .to_pandas()
    upmask = dict(zip(at_pour["cell_id"].astype(int),
                      at_pour["acc"].astype(int)))
    # level(p) = 1 + #pours q != p with p in upstream(q)  <=>  bit_p set in
    # acc(q)
    level = {}
    for i, p in enumerate(pours.tolist()):
        downs = sum(1 for q in pours.tolist()
                    if q != p and (upmask.get(q, 0) >> i) & 1)
        level[p] = 1 + downs

    frames = []
    for k in sorted(set(level.values())):
        lv_pours = np.sort(np.array([p for p, lv in level.items()
                                     if lv == k], np.int64))
        ref = ray.put(lv_pours)

        def cut(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            oc = _cached_get(_ref)
            cid = df["cell_id"].to_numpy(np.int64)
            down = df["down_id"].to_numpy(np.int64)
            pos = np.minimum(np.searchsorted(oc, cid), len(oc) - 1)
            is_out = oc[pos] == cid
            return pd.DataFrame({"cell_id": cid,
                                 "down_id": np.where(is_out, np.int64(-1),
                                                     down),
                                 "tile": df["tile"].to_numpy(np.int64)})

        dest = basins_pregel(dds.map_batches(cut, batch_format="pandas"),
                             GRID1)

        def label(df: pd.DataFrame, _ref=ref, _k=k) -> pd.DataFrame:
            oc = _cached_get(_ref)
            d = df["basin"].to_numpy(np.int64)
            pos = np.minimum(np.searchsorted(oc, d), len(oc) - 1)
            ok = oc[pos] == d
            pid = np.searchsorted(psort, d[ok])
            # map pour cell -> pour_id (original index)
            cell_to_id = {int(c): i for i, c in enumerate(pours.tolist())}
            return pd.DataFrame({
                "cell_id": df["cell_id"].to_numpy(np.int64)[ok],
                "level": np.int64(_k),
                "pour_id": np.array([cell_to_id[int(x)] for x in d[ok]],
                                    np.int64)})

        frames.append(dest.map_batches(label, batch_format="pandas"))

    out = frames[0]
    for f in frames[1:]:
        out = out.union(f)
    return out


# --------------------------------------------------------------------------
# UpslopeDepressionStorage (hydro_analysis/upslope_depression_storage.rs):
# mean upslope (fill - z) depth — the priority-flood fill composed with
# TWO weighted accumulations (depth sum in fixed units; upslope cell
# count), exact integers. SQL oracle: the hydrodefs._fill_cte relaxation
# (depth = fill - z) summed over the D8 walk closure; the dense
# composition oracle in tests/test_hydro5.py stays as a cross-check.
# --------------------------------------------------------------------------
@query(
    "upslope_depression_storage",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_fill_cte(_FILL_DEM_VALUE, 50)},
    dep AS MATERIALIZED (SELECT cell_id, fill - z AS d FROM fillw),
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    up AS (
      SELECT w.cur AS cell_id, SUM(d.d) AS ds, COUNT(*) AS n
      FROM walk w JOIN dep d ON d.cell_id = w.start GROUP BY w.cur
    )
    SELECT dp.cell_id, CAST(dp.d + COALESCE(u.ds, 0) AS BIGINT) AS depth_sum,
           CAST(1 + COALESCE(u.n, 0) AS BIGINT) AS n_up
    FROM dep dp LEFT JOIN up u ON u.cell_id = dp.cell_id
    """,
)
def upslope_depression_storage(sf_dir: str):
    from ..stages.flow import down_ds_from_pointer, tile_of_expr
    from ..stages.pregel import (fill_depressions_pregel,
                                 weighted_accumulation_pregel)

    def zfn(cells: np.ndarray) -> np.ndarray:
        return _value_fn(cells).astype(np.int64)

    fill = fill_depressions_pregel(zfn, GRID1).materialize()
    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()

    def depth_masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        depth = df["fill"].to_numpy(np.int64) - zfn(cid)
        # pack depth (<= ~1000 * 2^17 fits easily) with a +1 counter so
        # every accumulated mass stays positive (the drain drops zeros)
        return pd.DataFrame({"cell_id": cid,
                             "tile": tile_of_expr(cid, GRID1, 64),
                             "mass": (depth << 18) + 1})

    acc = weighted_accumulation_pregel(
        dds, fill.map_batches(depth_masses, batch_format="pandas"), GRID1)
    return acc.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "depth_sum": df["acc"].to_numpy(np.int64) >> 18,
            "n_up": df["acc"].to_numpy(np.int64) & ((1 << 18) - 1)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# DInfPointer (hydro_analysis/dinf_pointer.rs): Tarboton's steepest facet
# flow angle. Rows-only with an INDEPENDENT dense facet oracle in
# tests/test_hydro5.py (direct formulas, not the shard code); the angle is
# emitted in micro-degrees (guard band vs the atan drift).
# --------------------------------------------------------------------------
_DINF_E1C = (1, 0, 0, -1, -1, 0, 0, 1)
_DINF_E1R = (0, -1, -1, 0, 0, 1, 1, 0)
_DINF_E2C = (1, 1, -1, -1, -1, -1, 1, 1)
_DINF_E2R = (-1, -1, -1, -1, 1, 1, 1, 1)
_DINF_AC = (0.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0)
_DINF_AF = (1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)


def dinf_facet_dir(z: np.ndarray, nb) -> np.ndarray:
    """dinf_pointer.rs:243-323 replicated vectorized: the compass angle
    (degrees) of the steepest Tarboton facet, -1.0 where no positive
    slope. ``nb(dr, dc)`` returns the shifted neighbour array (NaN
    off-grid). Shared by the pipeline kernel and the dense test oracle."""
    atan1 = np.arctan(1.0)
    half_pi = np.pi / 2.0
    diag = np.sqrt(2.0)
    max_slope = np.full(z.shape, -np.inf)
    dirv = np.full(z.shape, 360.0)
    for i in range(8):
        e1 = nb(_DINF_E1R[i], _DINF_E1C[i])
        e2 = nb(_DINF_E2R[i], _DINF_E2C[i])
        ok = ~np.isnan(e1) & ~np.isnan(e2)
        both = ok & (z > e1) & (z > e2)
        s1 = z - e1
        s2 = e1 - e2
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(s1 != 0.0, np.arctan(s2 / s1), half_pi)
        s = np.sqrt(s1 * s1 + s2 * s2)
        s = np.where((s1 < 0) & (s2 < 0), -s, s)
        s = np.where((s1 < 0) & (s2 == 0), -s, s)
        s = np.where((s1 == 0) & (s2 < 0), -s, s)
        s = np.where(r < 0.0, s1, s)
        s = np.where(r > atan1, (z - e2) / diag, s)
        r = np.clip(r, 0.0, atan1)
        upd = both & (s >= max_slope) & (s != 0.00001)
        max_slope = np.where(upd, s, max_slope)
        dirv = np.where(upd, _DINF_AF[i] * r + _DINF_AC[i] * half_pi, dirv)
        # one-neighbour branch: e0 > e1 XOR/OR e0 > e2 (but not both)
        single = ok & ~both & ((z > e1) | (z > e2))
        r1 = np.where(z > e1, 0.0, atan1)
        ss = np.where(z > e1, s1, (z - e2) / diag)
        upd = single & (ss >= max_slope) & (ss != 0.00001)
        max_slope = np.where(upd, ss, max_slope)
        dirv = np.where(upd, _DINF_AF[i] * r1 + _DINF_AC[i] * half_pi, dirv)
    deg = 360.0 - np.degrees(dirv) + 90.0
    deg = np.where(deg > 360.0, deg - 360.0, deg)
    return np.where(max_slope > 0, deg, -1.0)




def _dinf_pointer_sql() -> str:
    """SQL twin of dinf_facet_dir: per-facet candidate rows (either the
    two-neighbour or the one-neighbour branch), folded with the scalar
    scan's last-wins >= rule (ORDER BY s DESC, i DESC) and the s != 1e-5
    quirk filter. All floats derive from integer z through fixed expression
    trees, so both engines produce identical doubles."""
    atan1 = "atan(1.0)"
    half_pi = "(pi() / 2.0)"
    diag = "1.4142135623730951"
    arms = []
    for i in range(8):
        e1r, e1c = _DINF_E1R[i], _DINF_E1C[i]
        e2r, e2c = _DINF_E2R[i], _DINF_E2C[i]
        ac, af = _DINF_AC[i], _DINF_AF[i]
        base = (f"FROM cells a JOIN cells n1 ON n1.r = a.r + ({e1r}) "
                f"AND n1.c = a.c + ({e1c}) "
                f"JOIN cells n2 ON n2.r = a.r + ({e2r}) "
                f"AND n2.c = a.c + ({e2c})")
        s1 = "(a.v - n1.v)"
        s2 = "(n1.v - n2.v)"
        r0 = f"(CASE WHEN {s1} != 0.0 THEN atan({s2} / {s1}) ELSE {half_pi} END)"
        s_mag = f"sqrt({s1} * {s1} + {s2} * {s2})"
        s_sgn = (f"(CASE WHEN ({s1} < 0 AND {s2} < 0) OR ({s1} < 0 AND {s2} = 0) "
                 f"OR ({s1} = 0 AND {s2} < 0) THEN -{s_mag} ELSE {s_mag} END)")
        s_fix = (f"(CASE WHEN {r0} < 0.0 THEN {s1} "
                 f"WHEN {r0} > {atan1} THEN (a.v - n2.v) / {diag} "
                 f"ELSE {s_sgn} END)")
        r_clip = f"LEAST(GREATEST({r0}, 0.0), {atan1})"
        dirv = f"({af!r} * {r_clip} + {ac!r} * {half_pi})"
        arms.append(
            f"SELECT a.cell_id, {i} AS i, {s_fix} AS s, {dirv} AS dirv "
            f"{base} WHERE a.v > n1.v AND a.v > n2.v")
        # one-neighbour branch: z > e1 XOR-ish (not both)
        r1 = f"(CASE WHEN a.v > n1.v THEN 0.0 ELSE {atan1} END)"
        ss = (f"(CASE WHEN a.v > n1.v THEN {s1} "
              f"ELSE (a.v - n2.v) / {diag} END)")
        dirv1 = f"({af!r} * {r1} + {ac!r} * {half_pi})"
        arms.append(
            f"SELECT a.cell_id, {i} AS i, {ss} AS s, {dirv1} AS dirv "
            f"{base} WHERE NOT (a.v > n1.v AND a.v > n2.v) "
            f"AND (a.v > n1.v OR a.v > n2.v)")
    return f"""
    cand AS MATERIALIZED ({' UNION ALL '.join(arms)}),
    best AS (
      SELECT cell_id, s, dirv FROM cand WHERE s != 0.00001
      QUALIFY row_number() OVER (PARTITION BY cell_id
                                 ORDER BY s DESC, i DESC) = 1
    ),
    ang AS (
      SELECT cell_id,
             CASE WHEN s > 0 THEN
               CASE WHEN 360.0 - degrees(dirv) + 90.0 > 360.0
                    THEN 360.0 - degrees(dirv) + 90.0 - 360.0
                    ELSE 360.0 - degrees(dirv) + 90.0 END
             ELSE -1.0 END AS deg
      FROM best
    )
    SELECT c.cell_id,
           CAST(floor(COALESCE(a.deg, -1.0) * 1e6 + 0.5) AS BIGINT)
             AS angle_micro
    FROM cells c LEFT JOIN ang a ON a.cell_id = c.cell_id
    """


@query("dinf_pointer", f"WITH {_CELLS_CTE},{_dinf_pointer_sql()}")
def dinf_pointer(sf_dir: str):
    """DInfPointer (hydro_analysis/dinf_pointer.rs): Tarboton steepest-
    facet compass angle, micro-degree units (atan passes through libm —
    the mathops2 guard band; -1 deg flags no-flow cells, matching the
    reference's -1 sentinel). Rows-only; dense oracle in
    tests/test_hydro5.py runs the same published formulas over the whole
    grid at once."""
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]

        def nb(dr, dc):
            return padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]

        deg = dinf_facet_dir(z, nb)
        return {"angle_micro": np.floor(deg * 1e6 + 0.5)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].astype(np.int64),
            "angle_micro": df["angle_micro"].astype(np.int64)}),
        batch_format="pandas")
