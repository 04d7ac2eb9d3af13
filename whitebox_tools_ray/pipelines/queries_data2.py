"""data_tools + gis_analysis conversion sweep: nodata management, raster
constructors, raster<->vector conversions, vector part restructuring,
CSV round-trips, and the Prashker anti-aliased raster perimeter/area.

All entries are either pure per-cell maps over the deterministic synthetic
raster (nodata sentinel -32768 injected at cell % 97 == 0, the
math_isnodata convention), per-feature maps over the SQL-reconstructible
star-polygon fixture (queries_overlay._star_sql) / splitmix64 segments
(sqlgen.synth_segments_cte), or tiny groupbys — zero shuffles except the
final aggregations, every one scale-safe.

Float notes: everything here is integer-exact except the perimeter LUT;
the Prashker lut entries are 9-decimal literals, so both sides accumulate
them as NANO-scaled int64 (lut*1e9 exactly) — order-free integer sums, one
final division for display left to consumers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from ..stages.raster import stencil_3x3, synth_raster_tiles
from .queries import query
from .sqlgen import synth_segments_cte

_N = GRID1.rows * GRID1.cols

# nodata sentinel convention shared with math_isnodata (queries_mathops.py)
_ND_CELLS = (f"cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id, "
             f"CAST(t.i // {GRID1.cols} AS BIGINT) AS r, "
             f"CAST(t.i % {GRID1.cols} AS BIGINT) AS c, "
             f"CASE WHEN t.i % 97 = 0 THEN -32768 "
             f"ELSE (t.i * 1000003) % 1000 END AS v, "
             f"((t.i * 999983 + 17) % 1000) AS b "
             f"FROM range({_N}) t(i))")


def _nd_map(fn, out_dtypes):
    """Per-cell map over tiles with the nodata sentinel injected; fn(cells,
    v_with_sentinel, b) -> dict of output arrays."""
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            v = np.asarray(t.data, np.int64)
            v = np.where(cells % 97 == 0, np.int64(-32768), v)
            b = (cells * 999983 + 17) % 1000
            out = fn(cells, v, b)
            if out is None:
                continue
            frames.append(pd.DataFrame({"cell_id": cells} | out))
        return pd.concat(frames, ignore_index=True)

    ds = tiles.map_batches(f, batch_format="pandas")
    return ds.map_batches(
        lambda df: df.astype({k: d for k, d in out_dtypes.items()
                              if k in df.columns}),
        batch_format="pandas")


@query(
    "convert_nodata_to_zero",
    f"WITH {_ND_CELLS} SELECT cell_id, "
    f"CAST(CASE WHEN v = -32768 THEN 0 ELSE v END AS BIGINT) AS v FROM cells",
)
def convert_nodata_to_zero(sf_dir: str):
    """ConvertNodataToZero (data_tools/convert_nodata_to_zero.rs): nodata
    cells become 0, everything else passes through. Integer-exact."""
    return _nd_map(lambda c, v, b: {"v": np.where(v == -32768, 0, v)},
                   {"v": np.int64})


@query(
    "modify_nodata_value",
    f"WITH {_ND_CELLS} SELECT cell_id, "
    f"CAST(CASE WHEN v = -32768 THEN -9999 ELSE v END AS BIGINT) AS v FROM cells",
)
def modify_nodata_value(sf_dir: str):
    """ModifyNoDataValue (data_tools/modify_nodata_value.rs): rewrite cells
    holding the old nodata value (-32768) to the new one (-9999) and update
    the declared sentinel. Integer-exact."""
    return _nd_map(lambda c, v, b: {"v": np.where(v == -32768, -9999, v)},
                   {"v": np.int64})


@query(
    "set_nodata_value",
    f"WITH {_ND_CELLS} SELECT cell_id, CAST(v AS BIGINT) AS v FROM cells "
    f"WHERE v <> 0",
)
def set_nodata_value(sf_dir: str):
    """SetNodataValue (data_tools/set_nodata_value.rs): declare 0 the nodata
    value — the grid keeps its numbers, cells equal to the new sentinel
    become nodata (absent here, matching the engine's sparse-valid-cell
    output convention). Integer-exact."""
    return _nd_map(lambda c, v, b: {"v": np.where(v == 0, np.nan, v)},
                   {"v": np.float64}).map_batches(
        lambda df: df.loc[np.isfinite(df["v"]), :].astype({"v": np.int64}),
        batch_format="pandas")


@query(
    "new_raster_from_base",
    f"SELECT CAST(t.i AS BIGINT) AS cell_id, CAST(7 AS BIGINT) AS v "
    f"FROM range({_N}) t(i)",
)
def new_raster_from_base(sf_dir: str):
    """NewRasterFromBase (data_tools/new_raster.rs): constant raster (value
    7) with the base grid's shape/transform. Also the CreatePlane
    (gis_analysis/create_plane.rs) degenerate case. Integer-exact."""
    return _nd_map(lambda c, v, b: {"v": np.full(c.size, 7, np.int64)},
                   {"v": np.int64})


@query(
    "update_nodata_cells",
    f"WITH {_ND_CELLS} SELECT cell_id, "
    f"CAST(CASE WHEN v = -32768 THEN b ELSE v END AS BIGINT) AS v FROM cells",
)
def update_nodata_cells(sf_dir: str):
    """UpdateNodataCells (gis_analysis/update_nodata_cells.rs): fill nodata
    cells of input 1 from the aligned input 2 (band b), keep valid cells.
    Integer-exact."""
    return _nd_map(lambda c, v, b: {"v": np.where(v == -32768, b, v)},
                   {"v": np.int64})


@query(
    "raster_to_vector_points",
    f"""
    WITH {_ND_CELLS}
    SELECT cell_id,
           -180.0 + (c + 0.5) * (360.0 / {GRID1.cols}) AS x,
           85.0 - (r + 0.5) * (170.0 / {GRID1.rows}) AS y,
           CAST(v AS BIGINT) AS value
    FROM cells WHERE v <> -32768
    """,
)
def raster_to_vector_points(sf_dir: str):
    """RasterToVectorPoints (data_tools/raster_to_vector_points.rs): one
    point per valid cell at the cell centre (x = west + (col+0.5)*resx,
    y = north - (row+0.5)*resy), attribute VALUE. The coordinate transform
    is one shared float expression tree — bit-exact."""

    def fn(c, v, b):
        rr, cc = c // GRID1.cols, c % GRID1.cols
        x = -180.0 + (cc + 0.5) * (360.0 / GRID1.cols)
        y = 85.0 - (rr + 0.5) * (170.0 / GRID1.rows)
        keep = v != -32768
        return {"x": np.where(keep, x, np.nan), "y": y,
                "value": v.astype(np.float64)}

    ds = _nd_map(fn, {"value": np.float64})
    return ds.map_batches(
        lambda df: df.loc[np.isfinite(df["x"]), :].astype({"value": np.int64}),
        batch_format="pandas")


@query(
    "raster_cell_assignment",
    f"WITH {_ND_CELLS} SELECT cell_id, CAST(r AS BIGINT) AS row_num, "
    f"CAST(c AS BIGINT) AS col_num FROM cells",
)
def raster_cell_assignment(sf_dir: str):
    """RasterCellAssignment (gis_analysis/raster_cell_assignment.rs): assign
    each cell its row / column number (the x/y variants are the
    raster_to_vector_points transform). Integer-exact."""
    return _nd_map(lambda c, v, b: {"row_num": c // GRID1.cols,
                                    "col_num": c % GRID1.cols},
                   {"row_num": np.int64, "col_num": np.int64})


@query(
    "reclass_equal_interval",
    f"WITH {_ND_CELLS} SELECT cell_id, "
    f"floor(CAST(v AS DOUBLE) / 75.0) * 75.0 AS v "
    f"FROM cells WHERE v <> -32768",
)
def reclass_equal_interval(sf_dir: str):
    """ReclassEqualInterval (gis_analysis/reclass_equal_interval.rs:279:
    z = floor(z / interval) * interval, interval=75, start 0). One shared
    expression tree over integers — bit-exact."""

    def fn(c, v, b):
        keep = v != -32768
        out = np.floor(v.astype(np.float64) / 75.0) * 75.0
        return {"v": np.where(keep, out, np.nan)}

    return _nd_map(fn, {"v": np.float64}).map_batches(
        lambda df: df.loc[np.isfinite(df["v"]), :],
        batch_format="pandas")


@query(
    "raster_area_by_class",
    f"""
    WITH {_ND_CELLS}
    SELECT CAST(v // 100 AS BIGINT) AS class,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM cells WHERE v <> -32768 GROUP BY 1
    """,
)
def raster_area_by_class(sf_dir: str):
    """RasterArea (gis_analysis/raster_area.rs): grid-cell count per class
    (class = v // 100, 10 classes); area = count * cell_area is a constant
    multiple. Per-tile partial counts -> one tiny groupby — the canonical
    pre-aggregated zonal shape. Integer-exact."""
    from ..relational import partial_agg
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for t in df.itertuples():
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                 np.arange(c0, c0 + int(t.ncols)), indexing="ij")
            cells = (rr.astype(np.int64) * GRID1.cols + cc.astype(np.int64)).ravel()
            v = np.asarray(t.data, np.int64)
            v = v[cells % 97 != 0]
            uk, cnt = np.unique(v // 100, return_counts=True)
            for k, n in zip(uk.tolist(), cnt.tolist()):
                out[k] = out.get(k, 0) + n
        return pd.DataFrame({"class": list(out.keys()),
                             "n_cells": np.array(list(out.values()), np.int64)})

    return partial_agg(tiles.map_batches(partial, batch_format="pandas"),
                       ["class"], [("n_cells", "sum", "n_cells")])


# --- Prashker anti-aliased perimeter (gis_analysis/raster_perimeter.rs) ---

_PERIM_LUT_NANO = np.array([
    4000000000, 2828427125, 2236067977, 2414213562, 2828427125, 3000000000,
    2414213562, 2236067977, 2236067977, 2414213562, 2000000000, 2000000000,
    2828427125, 1414213562, 1414213562, 1414213562, 2236067977, 2828427125,
    2000000000, 1414213562, 2414213562, 1414213562, 2000000000, 1414213562,
    2000000000, 2000000000, 1000000000, 2000000000, 2000000000, 2000000000,
    2000000000, 1000000000, 2828427125, 3000000000, 2828427125, 1414213562,
    2000000000, 4000000000, 2236067977, 2236067977, 2414213562, 2236067977,
    1414213562, 1414213562, 2236067977, 2236067977, 1414213562, 1414213562,
    2828427125, 2236067977, 1414213562, 1414213562, 2236067977, 2414213562,
    2000000000, 1414213562, 2000000000, 2000000000, 1000000000, 1414213562,
    2000000000, 2000000000, 1000000000, 1000000000, 2236067977, 2828427125,
    2000000000, 2000000000, 2828427125, 2236067977, 2000000000, 2000000000,
    2000000000, 1414213562, 1000000000, 2000000000, 1414213562, 1414213562,
    1000000000, 1414213562, 2000000000, 1414213562, 1000000000, 1000000000,
    1414213562, 1414213562, 2000000000, 1414213562, 1000000000, 1000000000,
    0, 0, 1000000000, 1000000000, 0, 0, 2414213562, 1414213562, 2000000000,
    2000000000, 2236067977, 2414213562, 2000000000, 2000000000, 2000000000,
    1414213562, 2000000000, 1000000000, 2000000000, 1414213562, 1000000000,
    1000000000, 1414213562, 1414213562, 1000000000, 1000000000, 1414213562,
    1414213562, 1000000000, 1000000000, 2000000000, 1414213562, 0, 0,
    1000000000, 1000000000, 0, 0, 2828427125, 2000000000, 2828427125,
    2236067977, 3000000000, 4000000000, 1414213562, 2236067977, 2828427125,
    2236067977, 1414213562, 2000000000, 2236067977, 2414213562, 1414213562,
    1414213562, 2414213562, 2236067977, 1414213562, 1414213562, 2236067977,
    2236067977, 1414213562, 1414213562, 2000000000, 2000000000, 1000000000,
    1000000000, 2000000000, 2000000000, 1414213562, 1000000000, 3000000000,
    4000000000, 2236067977, 2414213562, 4000000000, 4000000000, 2414213562,
    2236067977, 1414213562, 2236067977, 1414213562, 1414213562, 2414213562,
    2236067977, 1414213562, 1414213562, 1414213562, 2414213562, 1414213562,
    1414213562, 2236067977, 2236067977, 1414213562, 1414213562, 2000000000,
    2000000000, 1000000000, 1000000000, 2000000000, 2000000000, 1000000000,
    1000000000, 2414213562, 2000000000, 2236067977, 2000000000, 1414213562,
    2414213562, 2000000000, 2000000000, 1414213562, 1414213562, 1000000000,
    1000000000, 1414213562, 1414213562, 1000000000, 1000000000, 2000000000,
    2000000000, 2000000000, 1000000000, 1414213562, 1414213562, 1000000000,
    1000000000, 2000000000, 1000000000, 0, 0, 1414213562, 1000000000, 0, 0,
    2236067977, 2236067977, 2000000000, 2000000000, 2236067977, 2236067977,
    2000000000, 2000000000, 1414213562, 1414213562, 1414213562, 1000000000,
    1414213562, 1414213562, 1000000000, 1000000000, 1414213562, 1414213562,
    1414213562, 1000000000, 1414213562, 1414213562, 1000000000, 1000000000,
    1000000000, 1000000000, 0, 0, 1000000000, 1000000000, 0, 0], np.int64)

# neighbour order (dy,dx) and bit weights from raster_perimeter.rs:517-519
_PERIM_NB = [(-1, 1, 1), (0, 1, 2), (1, 1, 4), (1, 0, 8),
             (1, -1, 16), (0, -1, 32), (-1, -1, 64), (-1, 0, 128)]


def _perim_lut_sql() -> str:
    vals = ", ".join(f"({i}, {int(v)})" for i, v in enumerate(_PERIM_LUT_NANO))
    return f"lut(idx, nano) AS (VALUES {vals})"


@query(
    "raster_perimeter_by_class",
    f"""
    WITH {_CELLS_CTE},
    cls AS (SELECT cell_id, r, c, v // 100 AS k FROM cells),
    msk AS (SELECT a.cell_id, a.k,
        {" + ".join(f"COALESCE((SELECT {w} FROM cls b WHERE b.r = a.r + ({dr}) "
                    f"AND b.c = a.c + ({dc}) AND b.k = a.k), 0)"
                    for dr, dc, w in _PERIM_NB)} AS idx
            FROM cls a),
    {_perim_lut_sql()}
    SELECT CAST(m.k AS BIGINT) AS class,
           CAST(SUM(l.nano) AS BIGINT) AS perim_nano
    FROM msk m JOIN lut l ON l.idx = m.idx
    GROUP BY m.k
    """,
)
def raster_perimeter_by_class(sf_dir: str):
    """RasterPerimeter (gis_analysis/raster_perimeter.rs:517-580): the
    Prashker (2009) anti-aliasing estimator — each cell contributes
    lut[8-bit same-class neighbour mask] to its class total (off-grid =
    different class). The lut's 9-decimal entries are accumulated as exact
    nano-scaled int64 (order-free distributed sum; the reference's f64 sum
    equals perim_nano/1e9 to float rounding). Classes k = v // 100."""
    from ..relational import partial_agg
    tiles = synth_raster_tiles(GRID1, _value_fn)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        k = np.floor(padded / 100.0)
        kc = k[1:nr + 1, 1:nc + 1]
        idx = np.zeros((nr, nc), np.int64)
        for dr, dc, w in _PERIM_NB:
            nbk = k[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            same = ~np.isnan(nbk) & (nbk == kc)
            idx += np.where(same, w, 0)
        return {"pk": kc, "pnano": _PERIM_LUT_NANO[idx]}

    cellrows = stencil_3x3(tiles, GRID1, kern)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(df["pk"].astype(np.int64))["pnano"].sum()
        return pd.DataFrame({"class": g.index.to_numpy(np.int64),
                             "perim_nano": g.to_numpy(np.int64)})

    return partial_agg(cellrows.map_batches(partial, batch_format="pandas"),
                       ["class"], [("perim_nano", "sum", "perim_nano")])


# --- Vector part restructuring over the star fixture ----------------------

from ..stardefs import N_PAIRS, _star_sql, star_rings  # noqa: E402


def _star_features():
    """Ray-side (pair_id, ring, k, x, y) vertex rows (12 per ring, 2 rings
    per pair) — the multipart fixture."""
    import ray.data

    ids = ray.data.range(N_PAIRS, override_num_blocks=4)

    def verts(batch: dict) -> pd.DataFrame:
        pids = batch["id"].astype(np.int64)
        A, B = star_rings(pids)
        frames = []
        for ring, V in ((0, A), (1, B)):
            n = V.shape[1] - 1  # drop the closing vertex
            for i, pid in enumerate(pids):
                frames.append(pd.DataFrame({
                    "pair_id": np.full(n, pid, np.int64),
                    "ring": np.full(n, ring, np.int64),
                    "k": np.arange(n, dtype=np.int64),
                    "x": V[i, :n, 0], "y": V[i, :n, 1]}))
        return pd.concat(frames, ignore_index=True)

    return ids.map_batches(verts, batch_format="numpy")


@query(
    "multipart_to_singlepart",
    f"""
    WITH {_star_sql()}
    SELECT pair_id * 2 + ring AS new_fid, pair_id AS src_fid,
           CAST(ring AS BIGINT) AS part, COUNT(*) AS n_verts
    FROM verts GROUP BY pair_id, ring
    """,
)
def multipart_to_singlepart(sf_dir: str):
    """MultiPartToSinglePart (data_tools/multipart_to_singlepart.rs): each
    part of a multipart feature (here: the 2 rings of a star pair) becomes
    its own feature with a fresh fid, attributes copied. Integer-exact."""
    return _star_features().map_batches(
        lambda df: df.groupby(["pair_id", "ring"], as_index=False)
        .agg(n_verts=("k", "size"))
        .assign(new_fid=lambda d: d["pair_id"] * 2 + d["ring"],
                src_fid=lambda d: d["pair_id"],
                part=lambda d: d["ring"])
        [["new_fid", "src_fid", "part", "n_verts"]]
        .astype({"n_verts": np.int64}),
        batch_format="pandas")


@query(
    "singlepart_to_multipart",
    f"""
    WITH {_star_sql()}
    SELECT pair_id AS fid, COUNT(DISTINCT ring) AS n_parts,
           COUNT(*) AS n_verts
    FROM verts GROUP BY pair_id
    """,
)
def singlepart_to_multipart(sf_dir: str):
    """SinglePartToMultiPart (data_tools/singlepart_to_multipart.rs):
    features sharing a group attribute (pair_id) merge into one multipart
    feature — part and vertex counts verify the regrouping. The groupby is
    the only exchange. Integer-exact."""
    return _star_features().map_batches(
        lambda df: df.groupby("pair_id", as_index=False)
        .agg(n_parts=("ring", "nunique"), n_verts=("k", "size")),
        batch_format="pandas").groupby("pair_id").sum(
        ["n_parts", "n_verts"]).map_batches(
        lambda df: pd.DataFrame({"fid": df["pair_id"].astype(np.int64),
                                 "n_parts": df["sum(n_parts)"].astype(np.int64),
                                 "n_verts": df["sum(n_verts)"].astype(np.int64)}),
        batch_format="pandas")


@query(
    "polygons_to_lines",
    f"""
    WITH {_star_sql()},
    nxt AS (SELECT v1.pair_id, v1.ring, v1.k, v1.x AS x0, v1.y AS y0,
                   v2.x AS x1, v2.y AS y1
            FROM verts v1 JOIN verts v2
              ON v2.pair_id = v1.pair_id AND v2.ring = v1.ring
             AND v2.k = (v1.k + 1) % 12)
    SELECT pair_id, CAST(ring AS BIGINT) AS ring, CAST(k AS BIGINT) AS k,
           x0, y0, x1, y1 FROM nxt
    """,
)
def polygons_to_lines(sf_dir: str):
    """PolygonsToLines (data_tools/polygons_to_lines.rs): every polygon ring
    becomes a polyline; emitted as the ring's edge list (k -> k+1 mod 12,
    the closing edge included). Shared splitmix64 vertex trees — bit-exact
    floats."""

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (pid, ring), g in df.groupby(["pair_id", "ring"]):
            g = g.sort_values("k")
            x, y = g["x"].to_numpy(), g["y"].to_numpy()
            k = g["k"].to_numpy(np.int64)
            out.append(pd.DataFrame({
                "pair_id": pid, "ring": ring, "k": k,
                "x0": x, "y0": y,
                "x1": np.roll(x, -1), "y1": np.roll(y, -1)}))
        return pd.concat(out, ignore_index=True)

    return _star_features().groupby("pair_id").map_groups(
        edges, batch_format="pandas")


@query(
    "extract_nodes",
    f"""
    WITH {_star_sql()}
    SELECT pair_id, CAST(ring AS BIGINT) AS ring, CAST(k AS BIGINT) AS k,
           x, y FROM verts
    """,
)
def extract_nodes(sf_dir: str):
    """ExtractNodes (gis_analysis/extract_nodes.rs): one point per polygon
    vertex, carrying the source feature id. Also covers
    AddPointCoordinatesToTable (data_tools/add_point_coordinates_to_table
    .rs — the x/y columns ARE the appended coordinates). Bit-exact."""
    return _star_features()


@query(
    "remove_polygon_holes",
    f"""
    WITH {_star_sql()}
    SELECT pair_id, CAST(k AS BIGINT) AS k, x, y FROM verts WHERE ring = 0
    """,
)
def remove_polygon_holes(sf_dir: str):
    """RemovePolygonHoles (data_tools/remove_polygon_holes.rs): keep only
    each feature's outer ring (ring 0), dropping interior rings. Bit-exact."""
    return _star_features().filter(
        lambda row: row["ring"] == 0).map_batches(
        lambda df: df[["pair_id", "k", "x", "y"]], batch_format="pandas")


_SEG_N = 400


@query(
    "clean_vector",
    f"""
    WITH {synth_segments_cte(_SEG_N)},
    degen AS (SELECT seg_id, x0, y0,
                     CASE WHEN seg_id % 13 = 0 THEN x0 ELSE x1 END AS x1,
                     CASE WHEN seg_id % 13 = 0 THEN y0 ELSE y1 END AS y1
              FROM seg)
    SELECT seg_id, x0, y0, x1, y1 FROM degen
    WHERE x0 <> x1 OR y0 <> y1
    """,
)
def clean_vector(sf_dir: str):
    """CleanVector (data_tools/clean_vector.rs): drop null/degenerate
    geometries — here zero-length segments (planted at seg_id % 13 == 0 by
    collapsing the end vertex). Bit-exact splitmix64 trees."""
    import ray.data

    from ..stages.lines import synth_segments

    seg = synth_segments(_SEG_N)
    seg.loc[seg["seg_id"] % 13 == 0, ["x1", "y1"]] = \
        seg.loc[seg["seg_id"] % 13 == 0, ["x0", "y0"]].to_numpy()
    keep = seg[(seg["x0"] != seg["x1"]) | (seg["y0"] != seg["y1"])]
    return ray.data.from_pandas(keep.reset_index(drop=True))


@query(
    "vector_lines_to_raster",
    f"""
    WITH {synth_segments_cte(_SEG_N)},
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
    walk AS (SELECT seg_id,
        CASE WHEN adx >= ady THEN cx0 + i * sx
             ELSE cx0 + sx * ((2 * i * adx + ady) // (2 * ady)) END AS cx,
        CASE WHEN adx >= ady THEN
             CASE WHEN adx = 0 THEN cy0
                  ELSE cy0 + sy * ((2 * i * ady + adx) // (2 * adx)) END
             ELSE cy0 + i * sy END AS cy
      FROM steps)
    SELECT cx, cy, CAST(MAX(seg_id) AS BIGINT) AS value
    FROM walk GROUP BY cx, cy
    """,
)
def vector_lines_to_raster(sf_dir: str):
    """VectorLinesToRaster (data_tools/vector_lines_to_raster.rs) at 1-unit
    cells: endpoints snap to containing cells, the integer DDA walks the
    major axis with the exact closed form minor = c0 + s*((2*i*minor_span +
    major_span) // (2*major_span)) (the viewshed entry's cross-multiplied
    DDA), later features win (MAX seg_id). Covers RasterizeStreams
    (stream_network_analysis/rasterize_streams.rs) — same walk keyed by
    stream id. Integer-exact."""
    import ray.data

    from ..stages.lines import synth_segments

    seg = synth_segments(_SEG_N)
    ds = ray.data.from_pandas(seg)

    def walk(df: pd.DataFrame) -> pd.DataFrame:
        cx0 = np.floor(df["x0"].to_numpy()).astype(np.int64)
        cy0 = np.floor(df["y0"].to_numpy()).astype(np.int64)
        cx1 = np.floor(df["x1"].to_numpy()).astype(np.int64)
        cy1 = np.floor(df["y1"].to_numpy()).astype(np.int64)
        sid = df["seg_id"].to_numpy(np.int64)
        adx, ady = np.abs(cx1 - cx0), np.abs(cy1 - cy0)
        sx = np.where(cx1 >= cx0, 1, -1)
        sy = np.where(cy1 >= cy0, 1, -1)
        span = np.maximum(adx, ady)
        frames = []
        for j in range(len(sid)):
            i = np.arange(span[j] + 1, dtype=np.int64)
            if adx[j] >= ady[j]:
                cx = cx0[j] + i * sx[j]
                cy = (cy0[j] if adx[j] == 0 else
                      cy0[j] + sy[j] * ((2 * i * ady[j] + adx[j])
                                        // (2 * adx[j])))
                cy = np.broadcast_to(cy, i.shape)
            else:
                cy = cy0[j] + i * sy[j]
                cx = cx0[j] + sx[j] * ((2 * i * adx[j] + ady[j])
                                       // (2 * ady[j]))
            frames.append(pd.DataFrame({
                "cx": np.asarray(cx, np.int64), "cy": np.asarray(cy, np.int64),
                "value": np.full(i.size, sid[j], np.int64)}))
        return pd.concat(frames, ignore_index=True)

    from ..relational import partial_agg
    return partial_agg(ds.map_batches(walk, batch_format="pandas"),
                       ["cx", "cy"], [("value", "max", "value")])
