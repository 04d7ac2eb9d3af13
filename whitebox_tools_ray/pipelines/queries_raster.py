"""Raster operator queries over a deterministic synthetic raster
(v(cell) = (cell * 1000003) % 1000 on the GRID1 layout), exercising the
tile + halo-exchange machinery with integer-exact SQL oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..relational import partial_agg
from ..stages.raster import mean3x3_kernel, slope_kernel_factory, stencil_3x3, synth_raster_tiles
from ..grid import GridSpec
from ..layers import GRID1
from ..memo import session_memo as _session_memo
from .queries import query


from ..rasterdefs import _CELLS_CTE, _horn_pq_sql, _value_fn  # noqa: E402 (shared, cycle-free)

# one equi-join per 3x3 offset (a cross-join with arithmetic conditions
# defeats DuckDB's hash-join planner: 50s vs <1s)
_NB_UNION = " UNION ALL ".join(
    f"SELECT a.cell_id, b.v FROM cells a JOIN cells b "
    f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
    for dr in (-1, 0, 1) for dc in (-1, 0, 1)
)


@query(
    "raster_mean3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_NB_UNION})
    SELECT cell_id, CAST(SUM(v) AS BIGINT) AS sum9, COUNT(*) AS n9
    FROM nb GROUP BY cell_id
    """,
)
def raster_mean3x3(sf_dir: str):
    """MeanFilter (image_analysis/mean_filter.rs) as a halo-exchange stencil:
    tiles emit border fragments to neighbours, groupby(tile) assembles the
    apron, vectorized kernel computes per-cell neighbourhood sum + count
    (integer-exact; mean = sum9/n9). sf_dir is unused: the raster is
    synthesized tile-parallel from the cell id."""
    tiles = synth_raster_tiles(GRID1, _value_fn)
    cells = stencil_3x3(tiles, GRID1, mean3x3_kernel)
    return cells.map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "sum9": df["sum9"].astype(np.int64),
                                 "n9": df["n9"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_minmax3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_NB_UNION})
    SELECT cell_id, MIN(v) AS vmin9, MAX(v) AS vmax9,
           MAX(v) - MIN(v) AS vrange9
    FROM nb GROUP BY cell_id
    """,
)
def raster_minmax3x3(sf_dir: str):
    """Minimum/Maximum/Range filters (image_analysis/min_filter.rs,
    max_filter.rs, range_filter.rs)
    in one halo-stencil pass — integer-exact."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        vmin = np.full((nr, nc), np.inf)
        vmax = np.full((nr, nc), -np.inf)
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                w = padded[dr:dr + nr, dc:dc + nc]
                vmin = np.fmin(vmin, w)  # fmin/fmax ignore NaN halo
                vmax = np.fmax(vmax, w)
        return {"vmin9": vmin, "vmax9": vmax, "vrange9": vmax - vmin}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "vmin9": df["vmin9"].astype(np.int64),
                                 "vmax9": df["vmax9"].astype(np.int64),
                                 "vrange9": df["vrange9"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_sobel",
    f"""
    WITH {_CELLS_CTE},
    nb AS (
      {" UNION ALL ".join(
        f"SELECT a.cell_id, CAST({dc} AS BIGINT) AS dc, CAST({dr} AS BIGINT) AS dr, b.v "
        f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr in (-1, 0, 1) for dc in (-1, 0, 1))}
    )
    SELECT cell_id,
      CAST(SUM(CASE WHEN dc = 1 THEN (CASE WHEN dr = 0 THEN 2 ELSE 1 END) * v
                    WHEN dc = -1 THEN -(CASE WHEN dr = 0 THEN 2 ELSE 1 END) * v
                    ELSE 0 END) AS BIGINT) AS gx,
      CAST(SUM(CASE WHEN dr = 1 THEN (CASE WHEN dc = 0 THEN 2 ELSE 1 END) * v
                    WHEN dr = -1 THEN -(CASE WHEN dc = 0 THEN 2 ELSE 1 END) * v
                    ELSE 0 END) AS BIGINT) AS gy
    FROM nb GROUP BY cell_id
    HAVING COUNT(*) = 9
    """,
)
def raster_sobel(sf_dir: str):
    """SobelFilter (image_analysis/sobel_filter.rs): integer gx/gy gradients,
    interior cells only (edge cells lack the full 3x3 — HAVING COUNT(*)=9)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded
        a = z[0:nr, 0:nc]; b = z[0:nr, 1:nc + 1]; c = z[0:nr, 2:nc + 2]
        d = z[1:nr + 1, 0:nc]; f = z[1:nr + 1, 2:nc + 2]
        g = z[2:nr + 2, 0:nc]; h = z[2:nr + 2, 1:nc + 1]; i = z[2:nr + 2, 2:nc + 2]
        gx = (c + 2 * f + i) - (a + 2 * d + g)
        gy = (g + 2 * h + i) - (a + 2 * b + c)
        return {"gx": gx, "gy": gy}

    cells = stencil_3x3(tiles, GRID1, kern)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        keep = ~(df["gx"].isna() | df["gy"].isna())
        df = df[keep]
        return pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                             "gx": df["gx"].astype(np.int64),
                             "gy": df["gy"].astype(np.int64)})

    return cells.map_batches(finish, batch_format="pandas")


@query(
    "raster_median3x3",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_NB_UNION})
    SELECT cell_id, quantile_disc(v, 0.5) AS vmed9, COUNT(*) AS n9
    FROM nb GROUP BY cell_id
    """,
)
def raster_median3x3(sf_dir: str):
    """MedianFilter (image_analysis/median_filter.rs): discrete median of
    the available 3x3 neighbourhood (index ceil(n/2)-1 on sorted values —
    quantile_disc semantics, exact)."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        vals = np.stack([padded[dr:dr + nr, dc:dc + nc]
                         for dr in (0, 1, 2) for dc in (0, 1, 2)])  # (9, nr, nc)
        svals = np.sort(vals, axis=0)  # NaNs sort to the end
        n = (~np.isnan(vals)).sum(axis=0)
        idx = np.ceil(n / 2).astype(np.int64) - 1
        med = np.take_along_axis(svals, idx[None, :, :], axis=0)[0]
        return {"vmed9": med, "n9": n}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "vmed9": df["vmed9"].astype(np.int64),
                                 "n9": df["n9"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "percent_equal_to",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_NB_UNION})
    SELECT n.cell_id,
           CAST(SUM(CASE WHEN n.v = c.v THEN 1 ELSE 0 END) AS BIGINT) AS n_eq,
           COUNT(*) AS n9
    FROM nb n JOIN cells c ON c.cell_id = n.cell_id
    GROUP BY n.cell_id
    """,
)
def percent_equal_to(sf_dir: str):
    """PercentEqualTo (gis_analysis/percent_equal_to.rs): count of 3x3
    neighbours (incl. centre) equal to the centre value — integer contract;
    the ratio n_eq/n9 is left to consumers."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        centre = padded[1:nr + 1, 1:nc + 1]
        n_eq = np.zeros((nr, nc), np.int64)
        n = np.zeros((nr, nc), np.int64)
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                w = padded[dr:dr + nr, dc:dc + nc]
                ok = ~np.isnan(w)
                n_eq += (ok & (w == centre)).astype(np.int64)
                n += ok.astype(np.int64)
        return {"n_eq": n_eq, "n9": n}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "n_eq": df["n_eq"].astype(np.int64),
                                 "n9": df["n9"].astype(np.int64)}),
        batch_format="pandas")


# resample target grid: 1.5x coarser, offset origin (tests the general
# nearest-neighbour source lookup, not a trivial integer decimation)
RS = GridSpec(west=-177.5, north=83.5, res_x=1.5, res_y=1.5, rows=100, cols=200)


@query(
    "raster_resample_nn",
    f"""
    WITH src AS (SELECT CAST(t.i AS BIGINT) AS cell_id,
                        CAST(t.i // {GRID1.cols} AS BIGINT) AS r,
                        CAST(t.i % {GRID1.cols} AS BIGINT) AS c,
                        ((t.i * 1000003) % 1000) AS v
                 FROM range({GRID1.rows * GRID1.cols}) t(i)),
    dst AS (SELECT CAST(t.i AS BIGINT) AS dst_cell,
                   ({RS.west + RS.res_x / 2.0!r} + CAST(t.i % {RS.cols} AS DOUBLE) * {RS.res_x!r}) AS cx,
                   ({RS.north - RS.res_y / 2.0!r} - CAST(t.i // {RS.cols} AS DOUBLE) * {RS.res_y!r}) AS cy
            FROM range({RS.rows * RS.cols}) t(i)),
    lookup AS (
      SELECT dst_cell,
             CAST(FLOOR((cx - ({GRID1.west!r})) / {GRID1.res_x!r}) AS BIGINT) AS sc,
             CAST(FLOOR((({GRID1.north!r}) - cy) / {GRID1.res_y!r}) AS BIGINT) AS sr
      FROM dst
    )
    SELECT l.dst_cell, CAST(s.v AS BIGINT) AS v
    FROM lookup l JOIN src s ON s.r = l.sr AND s.c = l.sc
    """,
)
def raster_resample_nn(sf_dir: str):
    """Resample, nearest-neighbour method (image_analysis/resample.rs): each
    target cell centre looks up its containing source cell (reference floor
    arithmetic); tile-parallel over the target grid with broadcast source."""
    import ray

    from ..stages.spatial_join import _cached_get

    src = ((np.arange(GRID1.rows * GRID1.cols, dtype=np.int64) * 1000003) % 1000)
    ref = ray.put(src)

    ids = __import__("ray.data", fromlist=["range"]).range(
        RS.rows * RS.cols, override_num_blocks=4)

    def resample(batch: dict) -> pd.DataFrame:
        s = _cached_get(ref)
        d = batch["id"].astype(np.int64)
        cx = RS.west + RS.res_x / 2.0 + (d % RS.cols).astype(np.float64) * RS.res_x
        cy = RS.north - RS.res_y / 2.0 - (d // RS.cols).astype(np.float64) * RS.res_y
        sc = GRID1.col_from_x(cx)
        sr = GRID1.row_from_y(cy)
        ok = GRID1.in_bounds(sr, sc)
        return pd.DataFrame({"dst_cell": d[ok],
                             "v": s[GRID1.cell_id(sr, sc)[ok]]})

    return ids.map_batches(resample, batch_format="numpy")


@query(
    "raster_roughness_sums",
    f"""
    WITH {_CELLS_CTE},
    nb AS ({_NB_UNION})
    SELECT cell_id, COUNT(*) AS n9, CAST(SUM(v) AS BIGINT) AS s1,
           CAST(SUM(v * v) AS BIGINT) AS s2
    FROM nb GROUP BY cell_id
    """,
)
def raster_roughness_sums(sf_dir: str):
    """RuggednessIndex / StandardDeviationFilter family
    (terrain_analysis/ruggedness_index.rs, image_analysis/stdev_filter.rs):
    exact neighbourhood moment sums (n, sum, sum-of-squares) — sd/TRI are
    float functions of these, left to consumers for exactness."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        s1 = np.zeros((nr, nc))
        s2 = np.zeros((nr, nc))
        n = np.zeros((nr, nc), np.int64)
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                w = padded[dr:dr + nr, dc:dc + nc]
                ok = ~np.isnan(w)
                s1 += np.where(ok, w, 0.0)
                s2 += np.where(ok, w * w, 0.0)
                n += ok.astype(np.int64)
        return {"n9": n, "s1": s1, "s2": s2}

    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "n9": df["n9"].astype(np.int64),
                                 "s1": df["s1"].astype(np.int64),
                                 "s2": df["s2"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "raster_correlation_components",
    f"""
    WITH a AS (SELECT CAST(t.i AS BIGINT) AS cell_id, ((t.i * 1000003) % 1000) AS v
               FROM range({GRID1.rows * GRID1.cols}) t(i)),
    b AS (SELECT CAST(t.i AS BIGINT) AS cell_id, ((t.i * 7919 + 13) % 1000) AS v
          FROM range({GRID1.rows * GRID1.cols}) t(i))
    SELECT COUNT(*) AS n,
           CAST(SUM(a.v) AS BIGINT) AS sum_a, CAST(SUM(b.v) AS BIGINT) AS sum_b,
           CAST(SUM(a.v * b.v) AS BIGINT) AS sum_ab,
           CAST(SUM(a.v * a.v) AS BIGINT) AS sum_a2,
           CAST(SUM(b.v * b.v) AS BIGINT) AS sum_b2
    FROM a JOIN b ON a.cell_id = b.cell_id
    """,
)
def raster_correlation_components(sf_dir: str):
    """ImageCorrelation (math_stat_analysis/image_correlation.rs): exact
    cross-moment sums of two co-tiled rasters (Pearson r is a float function
    of these) — the two-raster zip/reduce Z pattern, per-tile partials."""
    from ..relational import partial_agg

    def vfn_b(cells: np.ndarray) -> np.ndarray:
        return ((cells.astype(np.int64) * 7919 + 13) % 1000).astype(np.float64)

    ta = synth_raster_tiles(GRID1, _value_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc), indexing="ij")
            cells = rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)
            a = np.asarray(t["data"], np.int64)
            bvals = vfn_b(cells.ravel()).astype(np.int64)
            rows.append({"k": 0, "n": np.int64(a.size),
                         "sum_a": a.sum(), "sum_b": bvals.sum(),
                         "sum_ab": (a * bvals).sum(),
                         "sum_a2": (a * a).sum(), "sum_b2": (bvals * bvals).sum()})
        return pd.DataFrame(rows)

    agg = partial_agg(ta.map_batches(partial, batch_format="pandas"), ["k"], [
        ("n", "sum", "n"), ("sum_a", "sum", "sum_a"), ("sum_b", "sum", "sum_b"),
        ("sum_ab", "sum", "sum_ab"), ("sum_a2", "sum", "sum_a2"),
        ("sum_b2", "sum", "sum_b2")])
    return agg.drop_columns(["k"])


@query(
    "raster_aspect_hillshade",
    f"""
    WITH {_CELLS_CTE},
    {_horn_pq_sql()},
    t AS (
      SELECT cell_id, p, q,
             atan(sqrt(p * p + q * q)) AS slope,
             CASE WHEN atan2(q, -p) < 0 THEN atan2(q, -p) + 2 * pi()
                  ELSE atan2(q, -p) END AS aspect
      FROM pq
    )
    SELECT cell_id,
      CAST(floor(degrees(aspect) * 1e4 + 0.5) AS BIGINT) AS aspect_micro,
      CAST(floor(GREATEST(0.0, LEAST(1.0,
           cos(radians(60.0)) * cos(slope)
           + sin(radians(60.0)) * sin(slope)
             * cos(radians(315.0) - aspect))) * 1e6 + 0.5) AS BIGINT)
        AS hs_micro
    FROM t
    """,
)
def raster_aspect_hillshade(sf_dir: str):
    """Aspect + Hillshade (terrain_analysis/{aspect,hillshade}.rs) via the
    halo stencil, emitted micro-quantized (the established guard band):
    aspect in 1e-4 deg, hillshade in 1e-6 units. The whole-array numpy
    oracle in tests/test_raster_stencil.py independently checks the halo
    machinery."""
    from ..stages.raster import aspect_hillshade_kernel_factory

    tiles = synth_raster_tiles(GRID1, _value_fn)
    cells = stencil_3x3(tiles, GRID1,
                        aspect_hillshade_kernel_factory(GRID1.res_x,
                                                        GRID1.res_y))

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        a = df["aspect_deg"].to_numpy(np.float64)
        h = df["hillshade"].to_numpy(np.float64)
        ok = ~np.isnan(a) & ~np.isnan(h)  # grid border: incomplete halo
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64)[ok],
            "aspect_micro": np.floor(a[ok] * 1e4 + 0.5).astype(np.int64),
            "hs_micro": np.floor(h[ok] * 1e6 + 0.5).astype(np.int64)})

    return cells.map_batches(quant, batch_format="pandas")


@query(
    "raster_slope",
    f"""
    WITH {_CELLS_CTE},
    {_horn_pq_sql()}
    SELECT cell_id,
           CAST(floor(degrees(atan(sqrt(p * p + q * q))) * 1e4 + 0.5)
                AS BIGINT) AS slope_micro
    FROM pq
    """,
)
def raster_slope(sf_dir: str):
    """Horn slope (terrain_analysis/slope.rs:272-326) via the same halo
    stencil, micro-degree quantized (1e-4 deg, the established guard band);
    interior cells only (the reference's edge nodata). Whole-array numpy
    oracle in tests/test_raster_stencil.py checks the stencil machinery."""
    tiles = synth_raster_tiles(GRID1, _value_fn)
    cells = stencil_3x3(tiles, GRID1,
                        slope_kernel_factory(GRID1.res_x, GRID1.res_y))

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        sl = df["slope_deg"].to_numpy(np.float64)
        ok = ~np.isnan(sl)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64)[ok],
            "slope_micro": np.floor(sl[ok] * 1e4 + 0.5).astype(np.int64)})

    return cells.map_batches(quant, batch_format="pandas")


@query(
    "euclidean_distance",
    f"""
    WITH {_CELLS_CTE},
    targets AS (SELECT r, c FROM cells WHERE (cell_id * 7919) % 509 = 0)
    SELECT a.cell_id,
           MIN((a.r - t.r) * (a.r - t.r) + (a.c - t.c) * (a.c - t.c)) AS d2
    FROM cells a, targets t
    GROUP BY a.cell_id
    """,
)
def euclidean_distance(sf_dir: str):
    """EuclideanDistance (gis_analysis/euclidean_distance.rs, G2 family):
    per-cell squared distance (cell units — integer-exact) to the nearest
    target cell. Targets here are sparse (~120 of 61k cells) and broadcast;
    each tile computes its min vectorized. The scale path for dense target
    sets is the FRS-bucketed doubling-radius probe of stages/gridding
    (same contract); the reference's sequential two-scan transform
    (euclidean_distance.rs:205-324) does not distribute."""
    from ..stages.raster import synth_raster_tiles

    def vfn(cells: np.ndarray) -> np.ndarray:
        return ((cells.astype(np.int64) * 1000003) % 1000).astype(np.float64)

    all_cells = np.arange(GRID1.rows * GRID1.cols, dtype=np.int64)
    tmask = (all_cells * 7919) % 509 == 0
    tr = (all_cells[tmask] // GRID1.cols).astype(np.int64)
    tc = (all_cells[tmask] % GRID1.cols).astype(np.int64)

    import ray

    from ..stages.spatial_join import _cached_get

    ref = ray.put((tr, tc))
    tiles = synth_raster_tiles(GRID1, vfn)

    def dist_tile(df: pd.DataFrame) -> pd.DataFrame:
        trr, tcc = _cached_get(ref)
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64), indexing="ij")
            dr = rr.ravel()[:, None] - trr[None, :]
            dc = cc.ravel()[:, None] - tcc[None, :]
            d2 = (dr * dr + dc * dc).min(axis=1)
            frames.append(pd.DataFrame({
                "cell_id": rr.ravel() * GRID1.cols + cc.ravel(), "d2": d2}))
        return pd.concat(frames)

    return tiles.map_batches(dist_tile, batch_format="pandas")


# D8 graph SQL fragments shared with queries_hydro2 (cycle-free module)
from ..hydrodefs import (  # noqa: E402
    _D8_CASE,
    _D8_DX,
    _D8_DY,
    _D8_SLOPES,
    _GRAPH_CTES,
    _WALK_UNITS_CTE,
    _d8_len,
    _hop_sql,
    STREAM_ACC_T,
    _FILL_DEM_PITS,
    _cost_cte,
    _fill_cte,
)


@query(
    "d8_pointer",
    f"""
    WITH {_CELLS_CTE},
    slopes AS ({_D8_SLOPES}),
    best AS (
      SELECT cell_id, code FROM slopes WHERE slope > 0
      QUALIFY row_number() OVER (PARTITION BY cell_id ORDER BY slope DESC, i ASC) = 1
    )
    SELECT c.cell_id, CAST(COALESCE(b.code, 0) AS BIGINT) AS d8
    FROM cells c LEFT JOIN best b ON b.cell_id = c.cell_id
    """,
)
def d8_pointer(sf_dir: str):
    """D8Pointer (hydro_analysis/d8_pointer.rs:252-295): steepest positive
    downslope neighbour, first-in-order wins ties (strict >), code 2^i,
    0 when no neighbour is lower — a pure halo stencil, the entry point of
    the G hydrology family (the iterative accumulation is round-2)."""
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def vfn(cells: np.ndarray) -> np.ndarray:
        return ((cells.astype(np.int64) * 1000003) % 1000).astype(np.float64)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        best_slope = np.full((nr, nc), -np.inf)
        code = np.zeros((nr, nc), np.int64)
        for i in range(8):
            zn = padded[1 + _D8_DY[i]:1 + _D8_DY[i] + nr, 1 + _D8_DX[i]:1 + _D8_DX[i] + nc]
            slope = (z - zn) / _d8_len(i)
            ok = ~np.isnan(zn) & (slope > 0) & (slope > best_slope)
            best_slope = np.where(ok, slope, best_slope)
            code = np.where(ok, np.int64(1 << i), code)
        return {"d8": code}

    tiles = synth_raster_tiles(GRID1, vfn)
    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({"cell_id": df["cell_id"].astype(np.int64),
                                 "d8": df["d8"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "flow_accumulation",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT g.cell_id, CAST(1 + COALESCE(p.n, 0) AS BIGINT) AS acc
    FROM graph g LEFT JOIN (SELECT cur, COUNT(*) AS n FROM walk GROUP BY cur) p
      ON p.cur = g.cell_id
    """,
)
def flow_accumulation_q(sf_dir: str):
    """D8FlowAccumulation (hydro_analysis/d8_flow_accum.rs:483-560): number
    of cells draining through each cell (incl. itself). The reference's
    whole-raster sequential drain becomes Pregel-style tile sweeps: per-tile
    internal drains + cross-border mass packets per round, with the pointer
    table AND packet frontier living in Datasets between rounds — no dense
    per-cell array ever touches the driver (stages/flow)."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flow_accumulation_pregel

    dds = down_ds_from_pointer(d8_pointer(sf_dir), GRID1)
    return flow_accumulation_pregel(dds, GRID1)


@query(
    "watershed_basins",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    w(cell_id, cur) AS (
      SELECT cell_id, cell_id FROM graph
      UNION ALL
      SELECT w.cell_id, g.down_id FROM w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT w.cell_id, CAST(w.cur AS BIGINT) AS basin
    FROM w JOIN graph g ON g.cell_id = w.cur
    WHERE g.down_id < 0
    """,
)
def watershed_basins(sf_dir: str):
    """Watershed / Basins (hydro_analysis/{watershed,basins}.rs): label each
    cell with the outlet its D8 path reaches, via pointer doubling —
    O(log path) rounds of next := next(next), each round a dataset
    SELF-JOIN (no driver arrays)."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import basins_pregel

    return basins_pregel(down_ds_from_pointer(d8_pointer(sf_dir), GRID1), GRID1)


@query(
    "num_inflowing_neighbours",
    f"""
    WITH {_GRAPH_CTES}
    SELECT g.cell_id, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_inflow
    FROM graph g
    LEFT JOIN (SELECT down_id, COUNT(*) AS n FROM graph
               WHERE down_id >= 0 GROUP BY down_id) p
      ON p.down_id = g.cell_id
    """,
)
def num_inflowing_neighbours(sf_dir: str):
    """NumInflowingNeighbours (hydro_analysis/num_inflowing_neighbours.rs):
    in-degree of the D8 graph — a distributed partial count on the down
    pointer + left-outer join for the zero-in-degree cells."""
    from ..stages.flow import down_ds_from_pointer, num_inflowing_ds

    return num_inflowing_ds(down_ds_from_pointer(d8_pointer(sf_dir), GRID1), GRID1)


def _strahler_sql_full() -> str:
    # the hydro3 level-set CTEs evaluated for EVERY forest cell (order >= k
    # iff downstream-or-equal of a >= 2-children-at-(k-1) generator) —
    # round-2 VERDICT item: convert the convertible rows-only entries
    from ..hydrodefs import _SB_LEVELS, _SB_ORD

    return f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_SB_LEVELS}
    SELECT g.cell_id, CAST({_SB_ORD.format(cell="g.cell_id")} AS BIGINT)
           AS strahler
    FROM graph g
    """


@query("strahler_order", _strahler_sql_full())
def strahler_order(sf_dir: str):
    """StrahlerStreamOrder (stream_network_analysis/strahler_order.rs) over
    the D8 forest: leaves are order 1; a cell's order is the max child order,
    +1 when two or more children attain that max. Computed in topological
    waves (cells whose children are all resolved) — bounded by the longest
    path, same Pregel shape as flow accumulation. Rows-only; brute-force
    oracle in tests/test_flow.py. Unresolved per-cell state travels as
    shard actors; rounds ~ shard-graph diameter (stages/pregel.strahler_pregel)."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import strahler_pregel

    return strahler_pregel(down_ds_from_pointer(d8_pointer(sf_dir), GRID1), GRID1)


@query(
    "cost_distance",
    f"WITH RECURSIVE {_cost_cte()} "
    "SELECT cell_id, cost_dist2 FROM costw",
)
def cost_distance_q(sf_dir: str):
    """CostDistance (gis_analysis/cost_distance.rs): accumulated least cost
    from sparse source cells over a synthetic cost surface — tile-sweep
    Dijkstra with halo relaxation rounds, exact int64 (4-neighbour variant).
    SQL oracle: hydrodefs._cost_cte min-plus relaxation (48 steps,
    converges at 34; Dijkstra equality in tests/test_fill_sql.py).
    Global-Dijkstra oracle also in tests/test_costdist.py. Best-so-far
    state lives in shard actors between rounds (stages/pregel.cost_distance_pregel)."""
    from ..stages.pregel import cost_distance_pregel

    n = GRID1.rows * GRID1.cols
    cells = np.arange(n, dtype=np.int64)
    sources = cells[(cells * 7919) % 509 == 0]

    def cost_fn(cids: np.ndarray) -> np.ndarray:
        return (1 + (cids.astype(np.int64) * 31) % 7).astype(np.int64)

    return cost_distance_pregel(cost_fn, sources, GRID1)


BUFFER_R2 = 25  # cells within 5 cell-widths of a target


@query(
    "buffer_raster",
    f"""
    WITH {_CELLS_CTE},
    targets AS (SELECT r, c FROM cells WHERE (cell_id * 7919) % 509 = 0)
    SELECT a.cell_id,
           MIN((a.r - t.r) * (a.r - t.r) + (a.c - t.c) * (a.c - t.c)) AS d2
    FROM cells a, targets t
    GROUP BY a.cell_id
    HAVING MIN((a.r - t.r) * (a.r - t.r) + (a.c - t.c) * (a.c - t.c)) <= {BUFFER_R2}
    """,
)
def buffer_raster(sf_dir: str):
    """BufferRaster (gis_analysis/buffer_raster.rs): cells within a distance
    threshold of any target = the Euclidean distance transform thresholded."""
    ds = euclidean_distance(sf_dir)
    return ds.map_batches(
        lambda df: df[df["d2"] <= BUFFER_R2], batch_format="pandas")


@query(
    "clump_labels",
    f"""
    WITH cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id,
      CAST(t.i // {GRID1.cols} AS BIGINT) AS r,
      CAST(t.i % {GRID1.cols} AS BIGINT) AS c
      FROM range({GRID1.rows * GRID1.cols}) t(i)),
    lab AS (
      -- the 6x6-block raster's equal-value components are exactly the
      -- anti-diagonal block chains (neighbouring blocks differ by 3 mod 4;
      -- (br+1, bc-1) differs by 0 and touches at a corner), so the clump
      -- id (= component min cell_id) is the top-left cell of the chain's
      -- uppermost block. Zero-valued cells are background (clump.rs).
      SELECT cell_id,
        (r // 6) - LEAST(r // 6, {GRID1.cols // 6 - 1} - c // 6) AS br0,
        (c // 6) + LEAST(r // 6, {GRID1.cols // 6 - 1} - c // 6) AS bc0,
        ((r // 6) * 7 + (c // 6) * 3) % 4 AS val
      FROM cells)
    SELECT CAST(6 * br0 * {GRID1.cols} + 6 * bc0 AS BIGINT) AS clump_id,
           CAST(val AS DOUBLE) AS value, COUNT(*) AS n_cells
    FROM lab WHERE val != 0 GROUP BY 1, 2
    """,
)
def clump_labels(sf_dir: str):
    """Clump / connected components (gis_analysis/clump.rs; phase 1 of
    RasterToVectorPolygons, raster_to_vector_polygons.rs:235-262): per-tile
    union-find + cross-tile border merge; clump id = component min cell_id
    (parallelism-invariant). SQL oracle: the synthetic block raster's
    components have a closed form (anti-diagonal block chains); the brute
    BFS oracle in tests/test_clump.py independently checks the machinery."""
    from ..stages.clump import clump as run_clump

    def blocky(cells: np.ndarray) -> np.ndarray:
        r = cells // GRID1.cols
        c = cells % GRID1.cols
        return (((r // 6) * 7 + (c // 6) * 3) % 4).astype(np.float64)

    tiles = synth_raster_tiles(GRID1, blocky)
    cells = run_clump(tiles, GRID1)
    enc = cells.map_batches(
        lambda df: pd.DataFrame({"clump_id": df["clump_id"].astype(np.int64),
                                 "value": df["value"].astype(np.float64),
                                 "n_cells": np.ones(len(df), np.int64)}),
        batch_format="pandas")
    return partial_agg(enc, ["clump_id", "value"], [("n_cells", "sum", "n_cells")])


_R2P_BC = GRID1.cols // 6            # 60 block columns (exact)
_R2P_BR = -(-GRID1.rows // 6)        # 29 block rows (last is 2 cells tall)
_R2P_CLIP_H = GRID1.rows - (_R2P_BR - 1) * 6


@query(
    "raster_to_polygons",
    f"""
    WITH blocks AS (
      SELECT CAST(t.i // {_R2P_BC} AS BIGINT) AS br,
             CAST(t.i % {_R2P_BC} AS BIGINT) AS bc
      FROM range({_R2P_BR * _R2P_BC}) t(i)
    ),
    lab AS (
      -- the 6x6-block raster's components are the anti-diagonal corner
      -- chains (the clump_labels closed form); each block contributes its
      -- own boundary ring at chain position t, clipped to {_R2P_CLIP_H}
      -- rows on the last block row
      SELECT br, bc, (br*7 + bc*3) % 4 AS val,
             br - LEAST(br, {_R2P_BC - 1} - bc) AS br0,
             bc + LEAST(br, {_R2P_BC - 1} - bc) AS bc0,
             LEAST(br, {_R2P_BC - 1} - bc) AS tpos
      FROM blocks WHERE (br*7 + bc*3) % 4 != 0
    )
    SELECT CAST(6*br0*{GRID1.cols} + 6*bc0 AS BIGINT) AS clump_id,
           CAST(val AS DOUBLE) AS value,
           tpos AS ring_idx,
           FALSE AS is_hole,
           CASE WHEN br = {_R2P_BR - 1} THEN {-6.0 * _R2P_CLIP_H}
                ELSE -36.0 END AS area,
           CAST(CASE WHEN br = {_R2P_BR - 1}
                     THEN {2 * (6 + _R2P_CLIP_H) + 1}
                     ELSE 25 END AS BIGINT) AS n_vertices
    FROM lab
    """,
)
def raster_to_polygons(sf_dir: str):
    """RasterToVectorPolygons end to end (data_tools/
    raster_to_vector_polygons.rs): clump labeling (phase 1) then per-clump
    boundary ring tracing with hole orientation (phase 2). SQL oracle:
    closed-form ring inventory over the anti-diagonal block chains
    (ring_idx = chain position, validated block-by-block against the
    traced rings); ring-structure + round-trip oracle in
    tests/test_polygonize.py. Output: clump_id, value, ring_idx, is_hole,
    area, n_vertices."""
    from ..stages.clump import clump as run_clump
    from ..stages.polygonize import polygonize
    from ..stages.raster import synth_raster_tiles

    def blocky(cells: np.ndarray) -> np.ndarray:
        r = cells // GRID1.cols
        c = cells % GRID1.cols
        return (((r // 6) * 7 + (c // 6) * 3) % 4).astype(np.float64)

    tiles = synth_raster_tiles(GRID1, blocky)
    cells = run_clump(tiles, GRID1)
    rings = polygonize(cells, GRID1)
    return rings.map_batches(
        lambda df: pd.DataFrame({
            "clump_id": df["clump_id"].astype(np.int64),
            "value": df["value"].astype(np.float64),
            "ring_idx": df["ring_idx"].astype(np.int64),
            "is_hole": df["is_hole"].astype(bool),
            "area": df["area"].astype(np.float64),
            "n_vertices": df["xs"].map(len).astype(np.int64),
        }), batch_format="pandas")


def _dissolve_sql() -> str:
    """Ring-inventory oracle derived from the fixed builtin layer: cells
    classified with the proven p2r burn CASE (highest fid wins); the four
    categoried regions are A (fid 0, cat 1), B-minus-hole-minus-C (fid 1,
    cat 2), C (fid 2, cat 1 — filling part of B's hole) and the pentagon
    (fid 3, cat 2). B's outer ring traces RECT_B (area = -|rect cells|)
    and its single hole ring encloses HOLE_B union C (area = +count);
    every other region is one outer ring of -|cells|. region_id = the
    region's min cell id."""
    from ..layers import RECT_B, _rect_sql, p2r_case_sql

    cellsxy = (
        f"cellsxy AS (SELECT CAST(t.i AS BIGINT) AS cell_id, "
        f"({GRID1.west + GRID1.res_x / 2.0!r} + CAST(t.i % {GRID1.cols} "
        f"AS DOUBLE) * {GRID1.res_x!r}) AS cx, "
        f"({GRID1.north - GRID1.res_y / 2.0!r} - CAST(t.i // {GRID1.cols} "
        f"AS DOUBLE) * {GRID1.res_y!r}) AS cy "
        f"FROM range({GRID1.rows * GRID1.cols}) t(i))")
    brect = _rect_sql("cx", "cy", RECT_B)
    return f"""
    WITH {cellsxy},
    assign AS MATERIALIZED (
      SELECT cell_id, cx, cy, {p2r_case_sql()} AS poly_id FROM cellsxy
    )
    SELECT MIN(cell_id) AS region_id, 1.0 AS category,
           CAST(0 AS BIGINT) AS ring_idx, FALSE AS is_hole,
           CAST(-COUNT(*) AS DOUBLE) AS area
    FROM assign WHERE poly_id = 0
    UNION ALL
    SELECT MIN(cell_id), 1.0, 0, FALSE, CAST(-COUNT(*) AS DOUBLE)
    FROM assign WHERE poly_id = 2
    UNION ALL
    SELECT MIN(cell_id), 2.0, 0, FALSE, CAST(-COUNT(*) AS DOUBLE)
    FROM assign WHERE poly_id = 3
    UNION ALL
    SELECT (SELECT MIN(cell_id) FROM assign WHERE poly_id = 1), 2.0, 0,
           FALSE,
           CAST(-(SELECT COUNT(*) FROM assign WHERE {brect}) AS DOUBLE)
    UNION ALL
    SELECT (SELECT MIN(cell_id) FROM assign WHERE poly_id = 1), 2.0, 1,
           TRUE,
           CAST((SELECT COUNT(*) FROM assign
                 WHERE {brect} AND poly_id IS DISTINCT FROM 1) AS DOUBLE)
    """


@query("dissolve_by_category", _dissolve_sql())
def dissolve_by_category(sf_dir: str):
    """Dissolve (gis_analysis/dissolve.rs) in raster space — an operator
    COMPOSITION: burn category ids into cells (VectorPolygonsToRaster) ->
    connected components over equal categories (Clump) -> boundary ring
    tracing (RasterToVectorPolygons phase 2). Adjacent same-category
    features merge into one region; holes preserved. SQL oracle:
    _dissolve_sql (layer-derived ring inventory); the three stages carry
    their own oracles. Output: region ring inventory."""
    from ..layers import builtin_polygons
    from ..stages.clump import clump as run_clump
    from ..stages.polygonize import polygonize

    polys = builtin_polygons()
    # category = feature id parity (two categories, merges B and pentagon
    # only if adjacent — they are not; A/C merge nothing; the interesting
    # case is C overlapping B's hole region)
    import ray

    from ..stages.spatial_join import _cached_get

    pref = ray.put(polys)
    tile = GRID1.tile_size

    def burn_tiles(batch: dict) -> pd.DataFrame:
        pp = _cached_get(pref)
        rows = []
        for tid in batch["id"]:
            tr, tc = int(tid) // GRID1.tile_cols, int(tid) % GRID1.tile_cols
            r0, c0 = tr * tile, tc * tile
            nr = min(tile, GRID1.rows - r0)
            nc = min(tile, GRID1.cols - c0)
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                                 indexing="ij")
            cx = GRID1.west + GRID1.res_x / 2.0 + cc.ravel().astype(np.float64) * GRID1.res_x
            cy = GRID1.north - GRID1.res_y / 2.0 - rr.ravel().astype(np.float64) * GRID1.res_y
            idx, fid = pp.pip_pairs(cx, cy)
            vals = np.zeros(nr * nc)
            if len(idx):
                cat = (fid % 2).astype(np.float64) + 1.0  # categories 1/2
                order = np.argsort(fid, kind="stable")
                vals[idx[order]] = cat[order]  # highest feature id wins
            rows.append({"tile_id": int(tid), "trow": tr, "tcol": tc,
                         "nrows": nr, "ncols": nc, "data": vals})
        return pd.DataFrame(rows)

    import ray.data

    tiles = ray.data.range(GRID1.tile_rows * GRID1.tile_cols,
                           override_num_blocks=4).map_batches(burn_tiles,
                                                              batch_format="numpy")
    cells = run_clump(tiles, GRID1, tile=tile)
    rings = polygonize(cells, GRID1)
    return rings.map_batches(
        lambda df: pd.DataFrame({
            "region_id": df["clump_id"].astype(np.int64),
            "category": df["value"].astype(np.float64),
            "ring_idx": df["ring_idx"].astype(np.int64),
            "is_hole": df["is_hole"].astype(bool),
            "area": df["area"].astype(np.float64),
        }), batch_format="pandas")


@query(
    "histogram_equalization",
    f"""
    WITH {_CELLS_CTE},
    hist AS (SELECT v, COUNT(*) AS cnt FROM cells GROUP BY v),
    cdf AS (SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
            FROM hist)
    SELECT c.cell_id,
           CAST(LEAST(FLOOR((d.cum - 1) * 256.0 / {GRID1.rows * GRID1.cols}), 255)
                AS BIGINT) AS eq
    FROM cells c JOIN cdf d ON d.v = c.v
    """,
)
def histogram_equalization(sf_dir: str):
    """HistogramEqualization (image_analysis/histogram_equalization.rs): the
    distributed rank transform — per-value histogram (partial combine), a
    tiny driver-side CDF, broadcast value->level map, vectorized remap.
    Integer-exact end to end."""
    import ray

    from ..relational import partial_agg
    from ..stages.spatial_join import _cached_get

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, t in df.iterrows():
            v = np.asarray(t["data"], np.int64)
            vals, cnts = np.unique(v, return_counts=True)
            frames.append(pd.DataFrame({"v": vals, "cnt": cnts.astype(np.int64)}))
        return pd.concat(frames)

    hist = partial_agg(tiles.map_batches(hist_partial, batch_format="pandas"),
                       ["v"], [("cnt", "sum", "cnt")]).to_pandas().sort_values("v")
    n = GRID1.rows * GRID1.cols
    cum = hist["cnt"].cumsum().to_numpy(np.int64)
    level = np.minimum(np.floor((cum - 1) * 256.0 / n), 255).astype(np.int64)
    lut = dict(zip(hist["v"].astype(np.int64), level))
    lut_arr = np.zeros(int(hist["v"].max()) + 1, np.int64)
    for v, lv in lut.items():
        lut_arr[v] = lv
    ref = ray.put(lut_arr)

    def remap(df: pd.DataFrame) -> pd.DataFrame:
        lu = _cached_get(ref)
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                                 indexing="ij")
            cid = rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)
            v = np.asarray(t["data"], np.int64)
            frames.append(pd.DataFrame({"cell_id": cid.ravel(), "eq": lu[v]}))
        return pd.concat(frames)

    return tiles.map_batches(remap, batch_format="pandas")


@query(
    "raster_mosaic",
    f"""
    WITH a AS (SELECT CAST(t.i AS BIGINT) AS cell_id, ((t.i * 1000003) % 1000) AS v
               FROM range({GRID1.rows * GRID1.cols}) t(i)
               WHERE (t.i % 360) < 200),
    b AS (SELECT CAST(t.i AS BIGINT) AS cell_id, ((t.i * 7919 + 13) % 1000) AS v
          FROM range({GRID1.rows * GRID1.cols}) t(i)
          WHERE (t.i % 360) >= 120)
    SELECT COALESCE(a.cell_id, b.cell_id) AS cell_id,
           CAST(COALESCE(a.v, b.v) AS BIGINT) AS v
    FROM a FULL OUTER JOIN b ON a.cell_id = b.cell_id
    """,
)
def raster_mosaic(sf_dir: str):
    """Mosaic (image_analysis/mosaic.rs): union of two partially overlapping
    rasters; overlap resolved by source priority (first listed wins) — an
    order-explicit union + keep-min-priority reduce."""
    import ray.data

    from ..relational import tree_reduce

    n = GRID1.rows * GRID1.cols
    cells = np.arange(n, dtype=np.int64)
    ca = cells[(cells % 360) < 200]
    cb = cells[(cells % 360) >= 120]
    da = pd.DataFrame({"cell_id": ca, "v": (ca * 1000003) % 1000,
                       "prio": np.zeros(len(ca), np.int64)})
    db = pd.DataFrame({"cell_id": cb, "v": (cb * 7919 + 13) % 1000,
                       "prio": np.ones(len(cb), np.int64)})
    u = ray.data.from_pandas(da).union(ray.data.from_pandas(db))

    def keep_min_prio(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cell_id", "prio"], kind="mergesort")
        return df.drop_duplicates("cell_id", keep="first")

    out = tree_reduce(u.map_batches(keep_min_prio, batch_format="pandas"),
                      keep_min_prio, batch_format="pandas")
    return out.map_batches(lambda df: df[["cell_id", "v"]], batch_format="pandas")


@query(
    "count_if",
    f"""
    WITH {_CELLS_CTE}
    SELECT CAST(SUM(CASE WHEN v = 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_eq,
           CAST(SUM(CASE WHEN v > 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_gt
    FROM cells
    """,
)
def count_if(sf_dir: str):
    """CountIf / PercentGreaterThan family (gis_analysis/count_if.rs,
    percent_greater_than.rs): predicate counts over the raster, per-tile
    partials."""
    from ..relational import partial_agg

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, t in df.iterrows():
            v = np.asarray(t["data"], np.int64)
            rows.append({"k": 0, "n_eq": np.int64((v == 500).sum()),
                         "n_gt": np.int64((v > 500).sum())})
        return pd.DataFrame(rows)

    return partial_agg(tiles.map_batches(part, batch_format="pandas"), ["k"],
                       [("n_eq", "sum", "n_eq"), ("n_gt", "sum", "n_gt")]) \
        .drop_columns(["k"])


@query(
    "list_unique_values_raster",
    f"""
    WITH {_CELLS_CTE}
    SELECT CAST(v AS BIGINT) AS v, COUNT(*) AS n FROM cells GROUP BY v
    """,
)
def list_unique_values_raster(sf_dir: str):
    """ListUniqueValuesRaster (math_stat_analysis/list_unique_values_raster
    .rs): distinct cell values + counts — per-tile histogram partials."""
    from ..relational import partial_agg

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, t in df.iterrows():
            vals, cnts = np.unique(np.asarray(t["data"], np.int64), return_counts=True)
            frames.append(pd.DataFrame({"v": vals, "n": cnts.astype(np.int64)}))
        return pd.concat(frames)

    return partial_agg(tiles.map_batches(part, batch_format="pandas"), ["v"],
                       [("n", "sum", "n")])


@query(
    "raster_summary_stats",
    f"""
    WITH {_CELLS_CTE}
    SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS vsum,
           MIN(v) AS vmin, MAX(v) AS vmax
    FROM cells
    """,
)
def raster_summary_stats(sf_dir: str):
    """RasterSummaryStats (math_stat_analysis/raster_summary_stats.rs:232-263):
    per-tile partials merged — the A1 partial/merge pattern over tiles."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, t in df.iterrows():
            a = np.asarray(t["data"], np.int64)
            rows.append({"k": 0, "n": np.int64(len(a)), "vsum": a.sum(),
                         "vmin": np.int64(a.min()), "vmax": np.int64(a.max())})
        return pd.DataFrame(rows)

    agg = partial_agg(tiles.map_batches(partial, batch_format="pandas"), ["k"], [
        ("n", "sum", "n"), ("vsum", "sum", "vsum"),
        ("vmin", "min", "vmin"), ("vmax", "max", "vmax")])
    return agg.drop_columns(["k"])


@query(
    "fill_depressions",
    f"WITH RECURSIVE {_fill_cte(_FILL_DEM_PITS, 40)} "
    "SELECT cell_id, fill FROM fillw",
)
def fill_depressions(sf_dir: str):
    """FillDepressions (hydro_analysis/fill_depressions.rs): raise every
    cell to its spill elevation via parallel priority-flood — sharded
    label-correcting sweep in the (min, max) semiring with raster-border
    seeds (stages/pregel.fill_depressions_pregel, Barnes et al. 2014
    priority-flood semantics, D8 connectivity). Planted pits guarantee a
    non-trivial fill. SQL oracle: hydrodefs._fill_cte Jacobi relaxation
    (160 steps; convergence at 143 verified against the global heapq
    priority flood in tests/test_fill_sql.py). Output: (cell_id, fill)."""
    from ..stages.pregel import fill_depressions_pregel

    def z_fn(cids: np.ndarray) -> np.ndarray:
        cids = np.asarray(cids, np.int64)
        z = 100 + (cids * 7919) % 400
        # two planted basins (low plateaus away from the border)
        r, c = cids // GRID1.cols, cids % GRID1.cols
        pit1 = (r > 40) & (r < 50) & (c > 60) & (c < 75)
        pit2 = (r > 100) & (r < 115) & (c > 200) & (c < 220)
        return np.where(pit1 | pit2, 5, z).astype(np.int64)

    return fill_depressions_pregel(z_fn, GRID1)


GEOTIFF_ROWS, GEOTIFF_COLS = 160, 200


@query(
    "geotiff_tile_stats",
    f"""
    WITH cells AS (SELECT CAST(t.i AS BIGINT) AS i,
                          CAST(t.i // {GEOTIFF_COLS} AS BIGINT) AS r,
                          CAST(t.i % {GEOTIFF_COLS} AS BIGINT) AS c,
                          (100 + (t.i * 31) % 57) AS v
                   FROM range({GEOTIFF_ROWS * GEOTIFF_COLS}) t(i))
    SELECT (r // 64) * {-(-GEOTIFF_COLS // 64)} + (c // 64) AS tile_id,
           CAST(SUM(v) AS BIGINT) AS vsum, COUNT(*) AS n
    FROM cells GROUP BY tile_id
    """,
)
def geotiff_tile_stats(sf_dir: str):
    """GeoTIFF ingestion end-to-end (whitebox-raster/src/geotiff/mod.rs
    analog, sources/geotiff.py): a deterministic DEM is written ONCE as a
    real on-disk GeoTIFF, re-imported as the tile Dataset (workers decode
    their own strip byte ranges), and reduced to per-tile integer stats that
    the oracle recomputes from the generating formula — proving the format
    round trip, not just the arithmetic."""
    import os

    from ..sources.geotiff import geotiff_to_tiles, write_geotiff

    path = "/tmp/wbt_geotiff_fixture.tif"
    if not os.path.exists(path):
        cells = np.arange(GEOTIFF_ROWS * GEOTIFF_COLS, dtype=np.int64)
        dem = (100.0 + (cells * 31) % 57).reshape(GEOTIFF_ROWS, GEOTIFF_COLS)
        write_geotiff(path + ".tmp", dem, west=-180.0, north=85.0, res=1.0)
        os.rename(path + ".tmp", path)

    tiles = geotiff_to_tiles(path, tile=64)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df.itertuples():
            arr = np.asarray(t.data, np.float64)
            out.append((int(t.tile_id), int(np.rint(arr.sum())), len(arr)))
        return pd.DataFrame(out, columns=["tile_id", "vsum", "n"]).astype(np.int64)

    return tiles.map_batches(stats, batch_format="pandas")


@query(
    "geotiff_tile_stats_lzw",
    f"""
    WITH cells AS (SELECT CAST(t.i AS BIGINT) AS i,
                          CAST(t.i // {GEOTIFF_COLS} AS BIGINT) AS r,
                          CAST(t.i % {GEOTIFF_COLS} AS BIGINT) AS c,
                          (100 + (t.i * 31) % 57) AS v
                   FROM range({GEOTIFF_ROWS * GEOTIFF_COLS}) t(i))
    SELECT (r // 64) * {-(-GEOTIFF_COLS // 64)} + (c // 64) AS tile_id,
           CAST(SUM(v) AS BIGINT) AS vsum, COUNT(*) AS n
    FROM cells GROUP BY tile_id
    """,
)
def geotiff_tile_stats_lzw(sf_dir: str):
    """geotiff_tile_stats sibling over the LZW + horizontal-predictor
    multi-strip layout (the most common real-world GeoTIFF;
    whitebox-raster/src/geotiff/mod.rs LZW dispatch, sources/geotiff.py
    lzw_decode) — same generating formula, so the same oracle proves the
    compressed read path byte-exact."""
    import os

    from ..sources.geotiff import geotiff_to_tiles, write_geotiff

    path = "/tmp/wbt_geotiff_fixture_lzw.tif"
    if not os.path.exists(path):
        cells = np.arange(GEOTIFF_ROWS * GEOTIFF_COLS, dtype=np.int64)
        dem = ((100 + (cells * 31) % 57).astype(np.int32)
               .reshape(GEOTIFF_ROWS, GEOTIFF_COLS))
        write_geotiff(path + ".tmp", dem, west=-180.0, north=85.0, res=1.0,
                      compression="lzw", predictor=2, rows_per_strip=32)
        os.rename(path + ".tmp", path)

    tiles = geotiff_to_tiles(path, tile=64)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df.itertuples():
            arr = np.asarray(t.data, np.float64)
            out.append((int(t.tile_id), int(np.rint(arr.sum())), len(arr)))
        return pd.DataFrame(out, columns=["tile_id", "vsum", "n"]).astype(np.int64)

    return tiles.map_batches(stats, batch_format="pandas")


@query(
    "shreve_magnitude",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    indeg AS (
      SELECT g.cell_id, COUNT(p.cell_id) AS n
      FROM graph g LEFT JOIN graph p ON p.down_id = g.cell_id
      GROUP BY g.cell_id
    ),
    leaves AS (SELECT cell_id FROM indeg WHERE n = 0),
    walk(start, cur) AS (
      SELECT l.cell_id, g.down_id FROM leaves l
      JOIN graph g ON g.cell_id = l.cell_id WHERE g.down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT g.cell_id,
           CAST((CASE WHEN i.n = 0 THEN 1 ELSE 0 END) + COALESCE(p.m, 0) AS BIGINT)
             AS shreve
    FROM graph g
    JOIN indeg i ON i.cell_id = g.cell_id
    LEFT JOIN (SELECT cur, COUNT(*) AS m FROM walk GROUP BY cur) p
      ON p.cur = g.cell_id
    """,
)
def shreve_magnitude(sf_dir: str):
    """ShreveStreamMagnitude (stream_network_analysis/shreve_magnitude.rs):
    number of upstream sources per cell — the flow-accumulation shard drain
    with mass injected only at in-degree-0 cells (stages/pregel.shreve_pregel)."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import shreve_pregel

    return shreve_pregel(down_ds_from_pointer(d8_pointer(sf_dir), GRID1), GRID1)


_FD8_OFFS = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
             (1, 1))  # the fd8 brute-force scan order (tests/test_flow.py)


def _fd8_sql() -> str:
    """SQL twin of the FD8 conservation wave: POWER((dz)/dist, 1.1) slopes
    in scan order, total as the same-order fold, fixed-point weights
    floor(s/tot*2^20 + 0.5) (guard band 0.006 >> the pow/fold drift), the
    generic _mfd_drain_sql remainder drain (DAG depth 139, 160 budgeted)."""
    from ..rasterdefs import _mfd_drain_sql

    cols, n = GRID1.cols, GRID1.rows * GRID1.cols
    one = 1 << 20
    dem = "(cid*2654435761)%1000003"

    def zat(expr: str) -> str:
        return f"((({expr})*2654435761)%1000003)"

    sl_defs, tot_fold = [], "0.0"
    for d, (dr, dc) in enumerate(_FD8_OFFS):
        off = dr * cols + dc
        dist = repr(1.4142135623730951) if (dr and dc) else "1.0"
        conds = [f"cid + ({off}) BETWEEN 0 AND {n - 1}"]
        if dc == -1:
            conds.append(f"(cid % {cols}) > 0")
        if dc == 1:
            conds.append(f"(cid % {cols}) < {cols - 1}")
        zu = zat(f"cid + ({off})")
        sl_defs.append(
            f"CASE WHEN {' AND '.join(conds)} AND ({zu}) < z THEN "
            f"POWER(CAST(z - ({zu}) AS DOUBLE) / {dist}, 1.1) END AS sl{d}")
        tot_fold = f"({tot_fold} + COALESCE(sl{d}, 0.0))"
    lastd = "GREATEST(" + ", ".join(
        f"CASE WHEN sl{d} IS NOT NULL THEN {d} ELSE -1 END"
        for d in range(8)) + ")"
    wraws = ", ".join(
        f"CASE WHEN sl{d} IS NOT NULL THEN "
        f"CAST(FLOOR(sl{d}/tot*{one} + 0.5) AS BIGINT) ELSE -1 END AS w{d}"
        for d in range(8))
    return f"""
    WITH RECURSIVE zc AS MATERIALIZED (
      SELECT CAST(t.i AS BIGINT) AS cid, ({dem.replace('cid', 't.i')}) AS z
      FROM range({n}) t(i)
    ),
    slt AS MATERIALIZED (SELECT cid, z, {', '.join(sl_defs)} FROM zc),
    slt2 AS MATERIALIZED (
      SELECT *, {tot_fold} AS tot, {lastd} AS lastd FROM slt
    ),
    wpiv AS MATERIALIZED (SELECT cid, lastd, {wraws} FROM slt2),
    {_mfd_drain_sql(_FD8_OFFS, 80, 2)}
    SELECT cell_id, acc_units FROM mfd_acc
    """


@query("fd8_flow_accumulation", _fd8_sql())
def fd8_flow_accumulation(sf_dir: str):
    """FD8FlowAccumulation (hydro_analysis/fd8_flow_accum.rs, exponent 1.1):
    dispersive multiple-flow-direction accumulation over the synthetic
    surface — fixed-point (2^20 units/cell) topological wave on shard
    actors; exact int64 at any parallelism. SQL oracle: _fd8_sql over the
    generic _mfd_drain_sql; dense brute-force oracle with identical
    arithmetic in tests/test_flow.py. Output: (cell_id, acc_units)."""
    from ..stages.pregel import fd8_accumulation_pregel

    def z_fn(cids: np.ndarray) -> np.ndarray:
        cids = np.asarray(cids, np.int64)
        return ((cids * 2654435761) % 1000003).astype(np.int64)

    return fd8_accumulation_pregel(z_fn, GRID1)


@query(
    "wetness_index",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    acc AS MATERIALIZED (
      SELECT g.cell_id, 1 + COALESCE(p.n, 0) AS acc
      FROM graph g
      LEFT JOIN (SELECT cur, COUNT(*) AS n FROM walk GROUP BY cur) p
        ON p.cur = g.cell_id
    ),
    {_horn_pq_sql()}
    SELECT pv.cell_id,
           CAST(floor(1e6 * ln(a.acc / sqrt(pv.p * pv.p + pv.q * pv.q))
                      + 0.5) AS BIGINT) AS twi_micro
    FROM pq pv JOIN acc a ON a.cell_id = pv.cell_id
    WHERE pv.p * pv.p + pv.q * pv.q > 0
    """,
)
def wetness_index(sf_dir: str):
    """WetnessIndex (terrain_analysis/wetness_index.rs): TWI =
    ln(As / tan(slope)) composing two engine stages — D8 flow accumulation
    (Pregel shard actors) and the Horn gradient stencil — joined per cell.
    tan(slope) is computed as sqrt(p^2 + q^2) EXACTLY (p, q are rationals
    with denominator 8 on the integer DEM), so the micro-quantized TWI is
    reproducible in SQL (flats and edge cells omitted: reference nodata)."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flow_accumulation_pregel
    from ..stages.raster import stencil_3x3

    acc = flow_accumulation_pregel(
        down_ds_from_pointer(d8_pointer(sf_dir), GRID1), GRID1)

    def tan_kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded
        a = z[0:nr, 0:nc]; b = z[0:nr, 1:nc + 1]; c = z[0:nr, 2:nc + 2]
        d = z[1:nr + 1, 0:nc]; f = z[1:nr + 1, 2:nc + 2]
        g = z[2:nr + 2, 0:nc]; h = z[2:nr + 2, 1:nc + 1]
        i = z[2:nr + 2, 2:nc + 2]
        p = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
        q = ((g + 2 * h + i) - (a + 2 * b + c)) / 8.0
        return {"tan_s": np.sqrt(p * p + q * q)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    slope = stencil_3x3(tiles, GRID1, tan_kern)

    j = acc.join(slope, join_type="inner", num_partitions=8,
                 on=("cell_id",))

    def twi(df: pd.DataFrame) -> pd.DataFrame:
        tan_s = df["tan_s"].to_numpy(np.float64)
        ok = np.isfinite(tan_s) & (tan_s > 0)
        a = df["acc"].to_numpy(np.float64)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64)[ok],
            "twi_micro": np.floor(
                1e6 * np.log(a[ok] / tan_s[ok]) + 0.5).astype(np.int64)})

    return j.map_batches(twi, batch_format="pandas")


def _dinf_acc_sql() -> str:
    """DInf accumulation oracle: the 8 Tarboton facets as UNION arms
    (ATAN2 branch selection is boundary-safe: at rang==quarter both
    branches yield sqrt(2)*s1 exactly, and the first-max facet pick rides
    on BITWISE-identical s values — subtraction/sqrt/division are
    correctly rounded in both engines; the w2 rounding guard band is
    0.27). Drain = the shared _mfd_drain_sql (edges are strictly
    descending, so depth <= the fd8 DAG's 139; 160 steps budgeted)."""
    from ..rasterdefs import _dinf_wpiv_ctes, _mfd_drain_sql

    def zat(off: int) -> str:
        if off == 0:
            return "((cid*2654435761)%1000003)"
        return f"(((cid + ({off}))*2654435761)%1000003)"

    return f"""
    WITH RECURSIVE {_dinf_wpiv_ctes(zat)},
    {_mfd_drain_sql(_FD8_OFFS, 80, 2)}
    SELECT cell_id, acc_units FROM mfd_acc
    """


@query("dinf_flow_accumulation", _dinf_acc_sql())
def dinf_flow_accumulation(sf_dir: str):
    """DInfFlowAccumulation (hydro_analysis/dinf_flow_accum.rs): Tarboton
    D-infinity — steepest triangular facet, flow split between its two
    neighbours by angle, fixed-point mass wave on shard actors. SQL
    oracle: _dinf_acc_sql over the shared drain; dense brute-force oracle
    with identical arithmetic in tests."""
    from ..stages.pregel import dinf_accumulation_pregel

    def z_fn(cids: np.ndarray) -> np.ndarray:
        cids = np.asarray(cids, np.int64)
        return ((cids * 2654435761) % 1000003).astype(np.int64)

    return dinf_accumulation_pregel(z_fn, GRID1)


@query(
    "stream_link_id",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    acc AS MATERIALIZED (
      SELECT g.cell_id, 1 + COALESCE(p.n, 0) AS acc
      FROM graph g LEFT JOIN (SELECT cur, COUNT(*) AS n FROM walk GROUP BY cur) p
        ON p.cur = g.cell_id
    ),
    stream AS MATERIALIZED (SELECT cell_id FROM acc WHERE acc >= {STREAM_ACC_T}),
    sgraph AS MATERIALIZED (
      SELECT g.cell_id, g.down_id FROM graph g
      JOIN stream s ON s.cell_id = g.cell_id
    ),
    s_indeg AS MATERIALIZED (
      SELECT s.cell_id, COUNT(p.cell_id) AS n
      FROM stream s LEFT JOIN sgraph p
        ON p.down_id = s.cell_id
      GROUP BY s.cell_id
    ),
    -- link pointer: follow down while the TARGET is a non-junction stream cell
    lgraph AS MATERIALIZED (
      SELECT sg.cell_id,
             CASE WHEN t.cell_id IS NOT NULL AND ti.n < 2 THEN sg.down_id
                  ELSE -1 END AS nxt
      FROM sgraph sg
      LEFT JOIN stream t ON t.cell_id = sg.down_id
      LEFT JOIN s_indeg ti ON ti.cell_id = sg.down_id
    ),
    chase(start, cur) AS (
      SELECT cell_id, cell_id FROM lgraph
      UNION ALL
      SELECT c.start, l.nxt FROM chase c
      JOIN lgraph l ON l.cell_id = c.cur WHERE l.nxt >= 0
    )
    SELECT c.start AS cell_id, CAST(c.cur AS BIGINT) AS link_id
    FROM chase c JOIN lgraph l ON l.cell_id = c.cur
    WHERE l.nxt < 0
    """,
)
@_session_memo
def stream_link_id(sf_dir: str):
    """StreamLinkIdentifier (stream_network_analysis/stream_link_identifier
    .rs): label every stream cell (D8 accumulation >= threshold) with its
    link — the maximal stream segment between junctions — identified by the
    link's terminal cell. Pure composition of existing shard machinery:
    Pregel accumulation -> stream mask + junction in-degrees (join-free
    co-grouped pass) -> modified pointer table (stop at junctions/outlets)
    -> Pregel chain walk (basins)."""
    from ..relational import partial_agg
    from ..stages.flow import down_ds_from_pointer, tile_of_expr
    from ..stages.pregel import basins_pregel, flow_accumulation_pregel

    dds = down_ds_from_pointer(d8_pointer(sf_dir), GRID1).materialize()
    acc = flow_accumulation_pregel(dds, GRID1)

    # stream mask + per-cell stream in-degree, all via ONE co-grouped pass:
    # rows kind 0 = (cell, down) for stream cells; kind 1 = in-degree
    # increments routed to the TARGET's tile (stream->stream edges only)
    stream_cells = acc.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[df["acc"] >= STREAM_ACC_T, "cell_id"]
            .to_numpy(np.int64)}),
        batch_format="pandas")
    j = dds.join(stream_cells, join_type="inner", num_partitions=8,
                 on=("cell_id",)).materialize()  # stream rows of the pointer table

    sset = j.map_batches(lambda df: pd.DataFrame({
        "k": df["cell_id"].to_numpy(np.int64)}), batch_format="pandas").to_pandas()
    stream_set = np.sort(sset["k"].to_numpy(np.int64))  # stream ids (small side)
    sref = ray.put(stream_set)

    def narrow(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        ss = _cached_get(sref)

        def member(a):
            if not len(ss):
                return np.zeros(len(a), bool)
            pos = np.minimum(np.searchsorted(ss, a), len(ss) - 1)
            return ss[pos] == a

        down = df["down_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "down_id": np.where((down >= 0) & member(down), down, -1),
            "tile": df["tile"].to_numpy(np.int64)})

    sgraph = j.map_batches(narrow, batch_format="pandas")

    # stream in-degree, then cut links AT junction targets
    from ..stages.flow import _indeg_state

    st = _indeg_state(sgraph, GRID1, 64)
    junctions = st.map_batches(
        lambda df: pd.DataFrame({"k": df.loc[df["n_inflow"] >= 2, "cell_id"]
                                 .to_numpy(np.int64)}),
        batch_format="pandas").to_pandas()
    jset = np.sort(junctions["k"].to_numpy(np.int64))
    jref = ray.put(jset)

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        js = _cached_get(jref)
        down = df["down_id"].to_numpy(np.int64)
        if len(js):
            pos = np.minimum(np.searchsorted(js, down), len(js) - 1)
            is_j = js[pos] == down
        else:
            is_j = np.zeros(len(down), bool)
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "down_id": np.where(is_j, -1, down),
            "tile": df["tile"].to_numpy(np.int64)})

    lgraph = sgraph.map_batches(cut, batch_format="pandas")
    out = basins_pregel(lgraph, GRID1)
    # materialized: ~9 downstream entries (the whole stream family) reuse
    # this via the session memo instead of re-running the accumulation wave
    return out.map_batches(lambda df: df.rename(columns={"basin": "link_id"}),
                           batch_format="pandas").materialize()


@query(
    "euclidean_allocation",
    f"""
    WITH {_CELLS_CTE},
    targets AS MATERIALIZED (
      SELECT cell_id AS tid, r, c FROM cells WHERE (cell_id * 7919) % 509 = 0),
    d AS (
      SELECT a.cell_id, t.tid,
             (a.r - t.r) * (a.r - t.r) + (a.c - t.c) * (a.c - t.c) AS d2
      FROM cells a, targets t
    )
    SELECT cell_id, CAST(tid AS BIGINT) AS alloc
    FROM d
    QUALIFY row_number() OVER (PARTITION BY cell_id ORDER BY d2 ASC, tid ASC) = 1
    """,
)
def euclidean_allocation(sf_dir: str):
    """EuclideanAllocation (gis_analysis/euclidean_allocation.rs): every
    cell labelled with its NEAREST target's id (squared cell distance,
    ties -> lowest target id — deterministic). Same broadcast-targets tile
    kernel as euclidean_distance, argmin instead of min."""
    import ray as _ray

    from ..stages.raster import synth_raster_tiles
    from ..stages.spatial_join import _cached_get

    all_cells = np.arange(GRID1.rows * GRID1.cols, dtype=np.int64)
    tmask = (all_cells * 7919) % 509 == 0
    tids = all_cells[tmask]
    tr = (tids // GRID1.cols).astype(np.int64)
    tc = (tids % GRID1.cols).astype(np.int64)
    ref = _ray.put((tids, tr, tc))

    def vfn(cells: np.ndarray) -> np.ndarray:
        return ((cells.astype(np.int64) * 1000003) % 1000).astype(np.float64)

    tiles = synth_raster_tiles(GRID1, vfn)

    def alloc_tile(df: pd.DataFrame) -> pd.DataFrame:
        tids_, trr, tcc = _cached_get(ref)
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64), indexing="ij")
            dr = rr.ravel()[:, None] - trr[None, :]
            dc = cc.ravel()[:, None] - tcc[None, :]
            d2 = dr * dr + dc * dc
            # argmin with ties -> lowest target id: targets are sorted by id,
            # and np.argmin returns the FIRST minimum
            best = np.argmin(d2, axis=1)
            frames.append(pd.DataFrame({
                "cell_id": rr.ravel() * GRID1.cols + cc.ravel(),
                "alloc": tids_[best]}))
        return pd.concat(frames)

    return tiles.map_batches(alloc_tile, batch_format="pandas")


@query(
    "extract_streams",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT g.cell_id, CAST(1 + COALESCE(p.n, 0) AS BIGINT) AS acc
    FROM graph g LEFT JOIN (SELECT cur, COUNT(*) AS n FROM walk GROUP BY cur) p
      ON p.cur = g.cell_id
    WHERE 1 + COALESCE(p.n, 0) >= {STREAM_ACC_T}
    """,
)
def extract_streams(sf_dir: str):
    """ExtractStreams (stream_network_analysis/extract_streams.rs): the
    stream mask — cells whose D8 accumulation meets the channelization
    threshold, with their accumulation value."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flow_accumulation_pregel

    acc = flow_accumulation_pregel(
        down_ds_from_pointer(d8_pointer(sf_dir), GRID1), GRID1)
    return acc.map_batches(
        lambda df: df[df["acc"] >= STREAM_ACC_T], batch_format="pandas")


@query(
    "downslope_flowpath_length",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE}
    SELECT start AS cell_id, MAX(units) AS len_units
    FROM walku GROUP BY start
    """,
)
def downslope_flowpath_length(sf_dir: str):
    """DownslopeFlowpathLength (hydro_analysis/downslope_flowpath_length.rs):
    D8 path distance from every cell to its outlet, fixed-point units
    (2^20 per cell, diagonals sqrt 2) — memoized chain walks on shard actors
    (stages/pregel.flowpath_length_pregel). Output: (cell_id, len_units);
    SQL oracle walks every chain with identical integer hop units."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flowpath_length_pregel

    return flowpath_length_pregel(
        down_ds_from_pointer(d8_pointer(sf_dir), GRID1), GRID1)
