"""Additional operator coverage: vector geometry attributes, expression
filters, cumulative scans, bounding boxes, raster aggregation, polygon
rasterization, large-side hash join, JSON attribute extraction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..geometry import polygon_area
from ..layers import GRID1, builtin_polygons, feature_sql
from ..relational import cents, partial_agg
from ..sources.tables import X_SQL, Y_SQL, read_table
from .queries import query

# --------------------------------------------------------------------------
# Vector geometry attributes (M1 family: PolygonArea, Centroid, LayerFootprint)
# --------------------------------------------------------------------------


def _poly_rings_sql_values() -> str:
    """Ring vertices of the builtin layer as a VALUES relation
    (poly_id, part, seq, x, y) — all literals, so SQL can recompute geometry."""
    rows = []
    polys = builtin_polygons()
    part_counter: dict[int, int] = {}
    for p, ring in enumerate(polys.rings):
        fid = int(polys.feature_id[p])
        part = part_counter.get(fid, 0)
        part_counter[fid] = part + 1
        for s, (x, y) in enumerate(ring):
            rows.append(f"({fid}, {part}, {s}, CAST({x!r} AS DOUBLE), CAST({y!r} AS DOUBLE))")
    return "ring_pts(poly_id, part, seq, x, y) AS (VALUES " + ", ".join(rows) + ")"


@query(
    "polygon_metrics",
    f"""
    WITH {_poly_rings_sql_values()},
    edges AS (
      SELECT a.poly_id, a.part, a.x AS x0, a.y AS y0, b.x AS x1, b.y AS y1
      FROM ring_pts a JOIN ring_pts b
        ON a.poly_id = b.poly_id AND a.part = b.part AND b.seq = a.seq + 1
    )
    SELECT CAST(poly_id AS BIGINT) AS poly_id,
           CAST(COUNT(*) + COUNT(DISTINCT part) AS BIGINT) AS n_vertices,
           SUM(0.5 * (x0 * y1 - x1 * y0)) AS signed_area,
           MIN(x0) AS xmin, MAX(x0) AS xmax, MIN(y0) AS ymin, MAX(y0) AS ymax
    FROM edges GROUP BY poly_id
    """,
)
def polygon_metrics(sf_dir: str):
    """PolygonArea / MinimumBoundingEnvelope family (gis_analysis/
    polygon_area.rs, layer_footprint.rs): shoelace signed area per feature
    (holes CCW contribute opposite sign), vertex count, bbox. The layer's
    integer-valued coordinates make every product exact -> bit-exact sums."""
    import ray.data

    polys = builtin_polygons()
    rows = []
    for fid in np.unique(polys.feature_id):
        area = 0.0
        nv = 0
        xs, ys = [], []
        for p in np.flatnonzero(polys.feature_id == fid):
            ring = polys.rings[p]
            area += polygon_area(ring)
            nv += len(ring)
            xs.append(ring[:-1, 0])
            ys.append(ring[:-1, 1])
        xs = np.concatenate(xs)
        ys = np.concatenate(ys)
        rows.append({"poly_id": int(fid), "n_vertices": np.int64(nv),
                     "signed_area": area,
                     "xmin": xs.min(), "xmax": xs.max(),
                     "ymin": ys.min(), "ymax": ys.max()})
    return ray.data.from_pandas(pd.DataFrame(rows))


@query(
    "events_bbox_by_type",
    f"""
    WITH pts AS (SELECT event_type, {X_SQL} AS x, {Y_SQL} AS y FROM events)
    SELECT event_type, COUNT(*) AS n,
           MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax
    FROM pts GROUP BY event_type
    """,
)
def events_bbox_by_type(sf_dir: str):
    """LayerFootprint / MinimumBoundingEnvelope as a grouped aggregate."""
    from ..sources.tables import add_xy

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type"])
    ds = ds.map_batches(add_xy, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "n": np.ones(len(t), np.int64),
                            "xmin": t["x"], "xmax": t["x"],
                            "ymin": t["y"], "ymax": t["y"]}),
        batch_format="pyarrow")
    return partial_agg(ds, ["event_type"], [
        ("n", "sum", "n"), ("xmin", "min", "xmin"), ("xmax", "max", "xmax"),
        ("ymin", "min", "ymin"), ("ymax", "max", "ymax")])


# --------------------------------------------------------------------------
# Expression filter (ExtractByAttribute plugin: evalexpr over attributes)
# --------------------------------------------------------------------------

FILTER_EXPR = "(value > 200.0) & (event_type == 'click')"


@query(
    "attribute_filter_expr",
    "SELECT event_id, value FROM events WHERE value > 200.0 AND event_type = 'click'",
)
def attribute_filter_expr(sf_dir: str):
    """User-supplied expression filter (whitebox-plugins/src/
    extract_by_attribute/main.rs:136-142 evalexpr analog): the expression
    string is compiled once and evaluated vectorized per batch via
    pandas.eval — the engine's UDF-predicate hook."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.eval(FILTER_EXPR)
        return df.loc[keep, ["event_id", "value"]]

    return ds.map_batches(flt, batch_format="pandas")


# --------------------------------------------------------------------------
# Cumulative scan (CumulativeDistribution analog) — ordered running totals
# --------------------------------------------------------------------------

@query(
    "cumulative_qty",
    """
    SELECT l_orderkey, l_linenumber,
           SUM(l_quantity) OVER (PARTITION BY l_returnflag
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                                 ROWS UNBOUNDED PRECEDING) AS running_qty
    FROM lineitem
    """,
)
def cumulative_qty(sf_dir: str):
    """Running total per group over an explicit total order (the ordered-log
    scan; l_quantity is integer-valued so float64 cumsum is exact). The sort
    key includes l_quantity so any remaining ties are between fully identical
    rows — the (id, running) multiset is then order-independent."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_shipdate", "l_orderkey",
                             "l_linenumber", "l_quantity"])

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"],
                          kind="mergesort")
        run = g["l_quantity"].cumsum()
        return pd.DataFrame({"l_orderkey": g["l_orderkey"].to_numpy(),
                             "l_linenumber": g["l_linenumber"].to_numpy(),
                             "running_qty": run.to_numpy()})

    return ds.groupby("l_returnflag").map_groups(scan, batch_format="pandas")


# --------------------------------------------------------------------------
# Raster aggregation (AggregateRaster: downsample by an integer factor)
# --------------------------------------------------------------------------

@query(
    "raster_aggregate4",
    f"""
    WITH cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id,
                          CAST(t.i // {GRID1.cols} AS BIGINT) AS r,
                          CAST(t.i % {GRID1.cols} AS BIGINT) AS c,
                          ((t.i * 1000003) % 1000) AS v
                   FROM range({GRID1.rows * GRID1.cols}) t(i))
    SELECT (r // 4) * {-(-GRID1.cols // 4)} + (c // 4) AS agg_cell,
           CAST(SUM(v) AS BIGINT) AS vsum, COUNT(*) AS n
    FROM cells GROUP BY agg_cell
    """,
)
def raster_aggregate4(sf_dir: str):
    """AggregateRaster (gis_analysis/aggregate_raster.rs): 4x downsample =
    tile-local grouped reduce (no cross-tile traffic when the aggregation
    factor divides the tile size)."""
    from ..stages.raster import synth_raster_tiles

    acols = -(-GRID1.cols // 4)

    def vfn(cells: np.ndarray) -> np.ndarray:
        return ((cells.astype(np.int64) * 1000003) % 1000).astype(np.float64)

    tiles = synth_raster_tiles(GRID1, vfn)

    def agg_tile(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, t in df.iterrows():
            nr, nc = int(t["nrows"]), int(t["ncols"])
            r0, c0 = int(t["trow"]) * 64, int(t["tcol"]) * 64
            arr = np.asarray(t["data"], np.float64).reshape(nr, nc)
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc), indexing="ij")
            key = (rr // 4).astype(np.int64) * acols + (cc // 4).astype(np.int64)
            g = pd.DataFrame({"agg_cell": key.ravel(), "vsum": arr.ravel().astype(np.int64)})
            g["n"] = np.int64(1)
            frames.append(g.groupby("agg_cell", sort=False).sum().reset_index())
        return pd.concat(frames)

    return partial_agg(tiles.map_batches(agg_tile, batch_format="pandas"),
                       ["agg_cell"], [("vsum", "sum", "vsum"), ("n", "sum", "n")])


# --------------------------------------------------------------------------
# VectorPolygonsToRaster (cell-centre-in-polygon rasterization)
# --------------------------------------------------------------------------

from ..layers import p2r_case_sql  # noqa: E402

_P2R_CASE = p2r_case_sql()


@query(
    "polygons_to_raster",
    f"""
    WITH cells AS (
      SELECT CAST(t.i AS BIGINT) AS cell_id,
             ({GRID1.west + GRID1.res_x / 2.0!r} + CAST(t.i % {GRID1.cols} AS DOUBLE) * {GRID1.res_x!r}) AS cx,
             ({GRID1.north - GRID1.res_y / 2.0!r} - CAST(t.i // {GRID1.cols} AS DOUBLE) * {GRID1.res_y!r}) AS cy
      FROM range({GRID1.rows * GRID1.cols}) t(i))
    SELECT cell_id, {_P2R_CASE} AS poly_id
    FROM cells
    WHERE {_P2R_CASE} IS NOT NULL
    """,
)
def polygons_to_raster(sf_dir: str):
    """VectorPolygonsToRaster (data_tools/vector_polygons_to_raster.rs):
    burn feature ids into cells whose CENTRE falls inside the feature;
    overlapping features resolved by highest feature id (deterministic
    last-feature-wins, mirroring record-order burn). Tile-parallel: cell
    centres are generated per tile and tested against the broadcast layer."""
    import ray.data

    polys = builtin_polygons()

    n_tiles = GRID1.tile_rows * GRID1.tile_cols
    ids = ray.data.range(n_tiles, override_num_blocks=4)

    def burn(batch: dict) -> pd.DataFrame:
        frames = []
        for tid in batch["id"]:
            tr, tc = int(tid) // GRID1.tile_cols, int(tid) % GRID1.tile_cols
            r0, c0 = tr * GRID1.tile_size, tc * GRID1.tile_size
            nr = min(GRID1.tile_size, GRID1.rows - r0)
            nc = min(GRID1.tile_size, GRID1.cols - c0)
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc), indexing="ij")
            cx = GRID1.west + GRID1.res_x / 2.0 + cc.ravel().astype(np.float64) * GRID1.res_x
            cy = GRID1.north - GRID1.res_y / 2.0 - rr.ravel().astype(np.float64) * GRID1.res_y
            cid = rr.ravel().astype(np.int64) * GRID1.cols + cc.ravel().astype(np.int64)
            idx, fid = polys.pip_pairs(cx, cy)
            if len(idx) == 0:
                continue
            df = pd.DataFrame({"cell_id": cid[idx], "poly_id": fid})
            # highest feature id wins on overlap
            df = df.sort_values(["cell_id", "poly_id"]).drop_duplicates("cell_id", keep="last")
            frames.append(df)
        return pd.concat(frames) if frames else pd.DataFrame(
            {"cell_id": pd.Series([], dtype=np.int64), "poly_id": pd.Series([], dtype=np.int64)})

    return ids.map_batches(burn, batch_format="numpy")


def _psm_sql() -> str:
    """SQL twin generated from the SAME literal layer (layers.builtin_
    features; dyadic coordinates, so the shoelace is exact and order-free):
    area/perimeter as unrolled literal chains in ring order (perimeter's
    sqrt terms fold left-to-right exactly like the Python accumulation),
    elongation via the pair-orientation min-area box over the feature's
    ring vertices (the minimum-area rectangle aligns with a hull edge,
    and hull edges are vertex pairs, so the pair-orientation minimum IS
    the true minimum)."""
    from ..layers import builtin_features

    vert_vals, scal_vals = [], []
    for fid, rings in builtin_features():
        k = 0
        area_chain = "0.0"
        perim_chain = "0.0"
        for ring, _hole in rings:
            r = np.asarray(ring, np.float64)
            for x, y in r[:-1]:
                k += 1
                vert_vals.append(f"({fid},{k},{float(x)!r},{float(y)!r})")
            s_chain = "0.0"
            for i in range(len(r) - 1):
                x0, y0 = float(r[i, 0]), float(r[i, 1])
                x1, y1 = float(r[i + 1, 0]), float(r[i + 1, 1])
                s_chain = f"({s_chain} + ({x0!r}*{y1!r} - {x1!r}*{y0!r}))"
                dx, dy = x1 - x0, y1 - y0
                perim_chain = (f"({perim_chain} + "
                               f"SQRT({dx!r}*{dx!r} + {dy!r}*{dy!r}))")
            area_chain = f"({area_chain} + 0.5*{s_chain})"
        scal_vals.append(f"({fid}, ABS({area_chain}), {perim_chain})")
    return f"""
    WITH verts(fid, k, x, y) AS (SELECT * FROM (VALUES {
        ", ".join(vert_vals)}) t(a,b,c,d)),
    scal(fid, a_abs, perim) AS (SELECT * FROM (VALUES {
        ", ".join(scal_vals)}) t(a,b,c)),
    prs AS (
      SELECT a.fid, a.k AS ka, b.k AS kb, b.x - a.x AS dx, b.y - a.y AS dy
      FROM verts a JOIN verts b ON b.fid = a.fid AND b.k > a.k
      WHERE b.x - a.x != 0 OR b.y - a.y != 0
    ),
    proj AS (
      SELECT p.fid, p.ka, p.kb, p.dx, p.dy,
             MIN(v.x*p.dx + v.y*p.dy) AS umin,
             MAX(v.x*p.dx + v.y*p.dy) AS umax,
             MIN(-(v.x*p.dy) + v.y*p.dx) AS vmin,
             MAX(-(v.x*p.dy) + v.y*p.dx) AS vmax
      FROM prs p JOIN verts v ON v.fid = p.fid
      GROUP BY p.fid, p.ka, p.kb, p.dx, p.dy
    ),
    scored AS (
      SELECT fid, ka, kb, dx, dy, umax - umin AS w, vmax - vmin AS h,
             (umax - umin) * (vmax - vmin) / (dx*dx + dy*dy) AS area_s
      FROM proj
    ),
    win AS (
      SELECT fid,
             LEAST(w, h) / SQRT(dx*dx + dy*dy) AS short_ax,
             GREATEST(w, h) / SQRT(dx*dx + dy*dy) AS long_ax
      FROM (SELECT * FROM scored
            QUALIFY row_number() OVER (PARTITION BY fid
                      ORDER BY area_s, ka, kb) = 1)
    )
    SELECT CAST(s.fid AS BIGINT) AS poly_id,
           CAST(FLOOR(s.a_abs*1e6 + 0.5) AS BIGINT) AS area_u,
           CAST(FLOOR(s.perim*1e6 + 0.5) AS BIGINT) AS perim_u,
           CAST(FLOOR(s.a_abs/s.perim*1e6 + 0.5) AS BIGINT) AS compact_u,
           CAST(FLOOR(s.perim/s.a_abs*1e6 + 0.5) AS BIGINT) AS pa_u,
           CAST(FLOOR((1.0 - w.short_ax/w.long_ax)*1e6 + 0.5) AS BIGINT)
               AS elong_u
    FROM scal s JOIN win w ON w.fid = s.fid
    """


@query("polygon_shape_metrics", _psm_sql())
def polygon_shape_metrics(sf_dir: str):
    """Shape-metric family, reference-faithful formulas: per feature — area
    (holes subtract, compactness_ratio.rs:204-228), perimeter,
    compactness = A/P (compactness_ratio.rs:43,228), perimeter_area = P/A
    (perimeter_area_ratio.rs), elongation = 1 - S/L with S/L the axes of
    the minimum-AREA rotated bounding box (elongation_ratio.rs:217-226,
    minimum_bounding_box.rs MinimizationCriterion::Area) computed by
    pair-orientation enumeration over the feature's ring vertices (exact:
    the optimal rectangle aligns with a hull edge, and every hull edge is
    a vertex pair). SQL-exact via _psm_sql — identical literal expression
    trees on both sides, micro-quantized outputs."""
    import ray.data

    from ..layers import builtin_features

    rows = []
    for fid, rings in builtin_features():
        area = 0.0
        perim = 0.0
        pts = []
        for ring, _hole in rings:
            r = np.asarray(ring, np.float64)
            s = 0.0
            for i in range(len(r) - 1):
                s = s + (float(r[i, 0]) * float(r[i + 1, 1])
                         - float(r[i + 1, 0]) * float(r[i, 1]))
                dx = float(r[i + 1, 0]) - float(r[i, 0])
                dy = float(r[i + 1, 1]) - float(r[i, 1])
                perim = perim + float(np.sqrt(dx * dx + dy * dy))
            area = area + 0.5 * s
            pts.append(r[:-1])
        p = np.concatenate(pts)
        best = None
        for i in range(len(p)):
            for j in range(i + 1, len(p)):
                dx = p[j, 0] - p[i, 0]
                dy = p[j, 1] - p[i, 1]
                if dx == 0 and dy == 0:
                    continue
                u = p[:, 0] * dx + p[:, 1] * dy
                v = -(p[:, 0] * dy) + p[:, 1] * dx
                w = u.max() - u.min()
                h = v.max() - v.min()
                area_s = w * h / (dx * dx + dy * dy)
                key = (area_s, i + 1, j + 1)
                if best is None or key < best[:3]:
                    ln = float(np.sqrt(dx * dx + dy * dy))
                    best = (area_s, i + 1, j + 1,
                            min(w, h) / ln, max(w, h) / ln)
        short_ax, long_ax = best[3], best[4]
        a_abs = abs(area)

        def uq(val: float) -> int:
            return int(np.floor(val * 1e6 + 0.5))

        rows.append({
            "poly_id": int(fid),
            "area_u": uq(a_abs),
            "perim_u": uq(perim),
            "compact_u": uq(a_abs / perim),
            "pa_u": uq(perim / a_abs),
            "elong_u": uq(1.0 - short_ax / long_ax),
        })
    return ray.data.from_pandas(pd.DataFrame(rows))


@query(
    "trend_surface_components",
    f"""
    WITH pts AS (
      SELECT CAST(ROUND({X_SQL} * 128) AS BIGINT) AS xq,
             CAST(ROUND({Y_SQL} * 128) AS BIGINT) AS yq,
             CAST(ROUND(value * 100) AS BIGINT) AS zq
      FROM events
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
           CAST(SUM(zq) AS BIGINT) AS sz,
           CAST(SUM(xq * xq) AS BIGINT) AS sxx,
           CAST(SUM(xq * yq) AS BIGINT) AS sxy,
           CAST(SUM(yq * yq) AS BIGINT) AS syy,
           CAST(SUM(xq * zq) AS BIGINT) AS sxz,
           CAST(SUM(yq * zq) AS BIGINT) AS syz
    FROM pts
    """,
)
def trend_surface_components(sf_dir: str):
    """TrendSurface degree-1 (math_stat_analysis/trend_surface.rs /
    trend_surface_vector_points.rs): the normal-equation moment sums over
    dyadically quantized (x*128 -- exact float multiply, so half-way rounding cases are measure-zero) coordinates and cent values — exact int64, order-independent;
    the 3x3 solve for the plane coefficients is a driver-side float step."""
    from ..sources.tables import read_points

    ds = read_points(sf_dir)

    def enc(t: pa.Table) -> pa.Table:
        xq = np.rint(t["x"].to_numpy(zero_copy_only=False) * 128).astype(np.int64)
        yq = np.rint(t["y"].to_numpy(zero_copy_only=False) * 128).astype(np.int64)
        zq = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "k": np.zeros(len(xq), np.int64),
            "n": np.ones(len(xq), np.int64),
            "sx": xq, "sy": yq, "sz": zq,
            "sxx": xq * xq, "sxy": xq * yq, "syy": yq * yq,
            "sxz": xq * zq, "syz": yq * zq,
        })

    agg = partial_agg(ds.map_batches(enc, batch_format="pyarrow"), ["k"], [
        (c, "sum", c) for c in ("n", "sx", "sy", "sz", "sxx", "sxy", "syy", "sxz", "syz")
    ])
    return agg.drop_columns(["k"])


# --------------------------------------------------------------------------
# Large-side hash join (Ray native Dataset.join) + JSON attribute extraction
# --------------------------------------------------------------------------

@query(
    "join_orders_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_orders_customers(sf_dir: str):
    """Distributed hash join (Ray Dataset.join, hash-partitioned on the key)
    — the both-sides-large path; the rollup then pre-aggregates as usual."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner", num_partitions=8,
                         on=("o_custkey",), right_on=("c_custkey",))
    joined = joined.map_batches(
        lambda t: cents(t, "o_totalprice", "total_cents")
        .append_column("n", pa.array(np.ones(len(t), np.int64)))
        .select(["c_mktsegment", "n", "total_cents"]),
        batch_format="pyarrow")
    return partial_agg(joined, ["c_mktsegment"],
                       [("n", "sum", "n"), ("total_cents", "sum", "total_cents")])


@query(
    "props_extract_stats",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
    FROM events GROUP BY event_type
    """,
)
def props_extract_stats(sf_dir: str):
    """Semi-structured attribute extraction (MergeTableWithCsv/JoinTables
    attribute-transfer analog over JSON props): vectorized field pull +
    grouped integer stats."""
    ds = read_table(sf_dir, "events", columns=["event_type", "props"])

    def ext(t: pa.Table) -> pa.Table:
        k = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>-?\d+)')
        kv = pc.struct_field(k, "k").cast(pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "k_sum": kv, "k_min": kv, "k_max": kv})

    return partial_agg(ds.map_batches(ext, batch_format="pyarrow"), ["event_type"], [
        ("k_sum", "sum", "k_sum"), ("k_min", "min", "k_min"), ("k_max", "max", "k_max")])


# --------------------------------------------------------------------------
# Round-2 quick-coverage sweep: block gridding, extreme points, centroids,
# rotated minimum bounding boxes (lidar_analysis + gis_analysis families)
# --------------------------------------------------------------------------

from ..pointdefs import EXT_CTES, PTS_CTE, PTS_T_CTE, _cid1  # noqa: E402 (cycle-free)

@query(
    "block_min_max_gridding",
    f"""
    WITH {PTS_CTE}
    SELECT {_cid1} AS cell_id,
           CAST(MIN(ROUND(value * 100)) AS BIGINT) AS zmin_cents,
           CAST(MAX(ROUND(value * 100)) AS BIGINT) AS zmax_cents,
           COUNT(*) AS n
    FROM pts GROUP BY cell_id
    """,
)
def block_min_max_gridding(sf_dir: str):
    """LidarBlockMinimum + LidarBlockMaximum (lidar_analysis/
    block_minimum.rs:22, block_maximum.rs): per grid cell the min/max point
    value — one vectorized encode + partial min/max merge, cents-exact."""
    from ..sources.tables import read_points

    ds = read_points(sf_dir)

    def enc(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        v = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"cell_id": GRID1.cell_id_from_xy(x, y),
                         "zmin_cents": v, "zmax_cents": v,
                         "n": np.ones(len(v), np.int64)})

    return partial_agg(ds.map_batches(enc, batch_format="pyarrow"), ["cell_id"],
                       [("zmin_cents", "min", "zmin_cents"),
                        ("zmax_cents", "max", "zmax_cents"), ("n", "sum", "n")])


@query(
    "lowest_highest_points",
    f"""
    WITH {PTS_CTE},
    q AS (SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM pts)
    SELECT * FROM (
      SELECT 'lowest' AS which, CAST(MIN(event_id) AS BIGINT) AS event_id
      FROM q WHERE cents = (SELECT MIN(cents) FROM q)
      UNION ALL
      SELECT 'highest', CAST(MIN(event_id) AS BIGINT)
      FROM q WHERE cents = (SELECT MAX(cents) FROM q)
    )
    """,
)
def lowest_highest_points(sf_dir: str):
    """FindLowestOrHighestPoints (gis_analysis/find_lowest_or_highest_
    points.rs): global extreme-value points; ties resolve to the lowest
    event id (deterministic record order). Tree-combined arg-extreme."""
    from ..relational import tree_reduce
    from ..sources.tables import read_points

    ds = read_points(sf_dir)

    def reduce_batch(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        ids = df["event_id"].to_numpy(np.int64)
        out = []
        for which, sel in (("lowest", cents == cents.min()),
                           ("highest", cents == cents.max())):
            cand = ids[sel]
            out.append((which, int(cand.min()), int(cents[sel][0])))
        return pd.DataFrame(out, columns=["which", "event_id", "cents"])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        lo = df[df["which"] == "lowest"]
        if len(lo):
            m = lo["cents"].min()
            rows.append(("lowest", int(lo.loc[lo["cents"] == m, "event_id"].min()), int(m)))
        hi = df[df["which"] == "highest"]
        if len(hi):
            m = hi["cents"].max()
            rows.append(("highest", int(hi.loc[hi["cents"] == m, "event_id"].min()), int(m)))
        # tree_reduce repartition can hand this merge an EMPTY block
        return pd.DataFrame(rows, columns=["which", "event_id", "cents"]) \
            .astype({"event_id": np.int64, "cents": np.int64}) if rows else \
            pd.DataFrame({"which": pd.Series([], dtype=object),
                          "event_id": pd.Series([], dtype=np.int64),
                          "cents": pd.Series([], dtype=np.int64)})

    first = ds.map_batches(reduce_batch, batch_format="pandas")
    return tree_reduce(first, merge, batch_format="pandas").map_batches(
        lambda df: df[["which", "event_id"]], batch_format="pandas")


@query(
    "centroid_by_type",
    f"""
    WITH {PTS_CTE},
    e AS (SELECT event_id, x, y FROM pts),
    t AS (SELECT event_id, event_type FROM events)
    SELECT t.event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(e.x * 1048576) AS BIGINT)) AS BIGINT) AS sx_q,
           CAST(SUM(CAST(ROUND(e.y * 1048576) AS BIGINT)) AS BIGINT) AS sy_q
    FROM e JOIN t USING (event_id)
    GROUP BY t.event_type
    """,
)
def centroid_by_type(sf_dir: str):
    """CentroidVector (gis_analysis/centroid_vector.rs) over point groups:
    exact dyadically-quantized coordinate sums per type (centroid =
    sx_q/n/2^20 left to the consumer — float division is the only inexact
    step and stays out of the contract)."""
    from ..sources.tables import read_points

    ds = read_points(sf_dir, extra_cols=("event_type",))

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "n": np.ones(len(df), np.int64),
            "sx_q": np.rint(df["x"].to_numpy(np.float64) * 1048576.0).astype(np.int64),
            "sy_q": np.rint(df["y"].to_numpy(np.float64) * 1048576.0).astype(np.int64),
        })

    return partial_agg(ds.map_batches(enc, batch_format="pandas"), ["event_type"],
                       [("n", "sum", "n"), ("sx_q", "sum", "sx_q"),
                        ("sy_q", "sum", "sy_q")])


_MBB_SQL = f"""
    WITH {PTS_T_CTE},
    {EXT_CTES},
    prs AS (
      SELECT a.event_type, a.k AS ka, b.k AS kb,
             b.x - a.x AS dx, b.y - a.y AS dy
      FROM ext a JOIN ext b ON b.event_type = a.event_type AND b.k > a.k
      WHERE b.x - a.x != 0 OR b.y - a.y != 0
    ),
    proj AS (
      SELECT r.event_type, r.ka, r.kb, r.dx, r.dy,
             MIN(p.x*r.dx + p.y*r.dy) AS umin,
             MAX(p.x*r.dx + p.y*r.dy) AS umax,
             MIN(-(p.x*r.dy) + p.y*r.dx) AS vmin,
             MAX(-(p.x*r.dy) + p.y*r.dx) AS vmax
      FROM prs r JOIN pts p ON p.event_type = r.event_type
      GROUP BY r.event_type, r.ka, r.kb, r.dx, r.dy
    ),
    scored AS (
      SELECT event_type, ka, kb, dx, dy,
             umax - umin AS w, vmax - vmin AS h,
             (umax - umin) * (vmax - vmin) / (dx*dx + dy*dy) AS area_s
      FROM proj
    ),
    nn AS (SELECT event_type, COUNT(*) AS n FROM pts GROUP BY event_type)
    SELECT s.event_type, nn.n,
           CAST(FLOOR(LEAST(s.w, s.h) / SQRT(s.dx*s.dx + s.dy*s.dy)
                      * 1e6 + 0.5) AS BIGINT) AS short_u,
           CAST(FLOOR(GREATEST(s.w, s.h) / SQRT(s.dx*s.dx + s.dy*s.dy)
                      * 1e6 + 0.5) AS BIGINT) AS long_u
    FROM (SELECT * FROM scored
          QUALIFY row_number() OVER (PARTITION BY event_type
                    ORDER BY area_s, ka, kb) = 1) s
    JOIN nn USING (event_type)
"""


@query("mbb_by_type", _MBB_SQL)
def mbb_by_type(sf_dir: str):
    """MinimumBoundingBox (whitebox-common/src/algorithms/
    minimum_bounding_box.rs, MinimizationCriterion::Area) per event type:
    short/long axes of the minimum-area rotated box (= the
    PolygonLongAxis / PolygonShortAxis outputs, gis_analysis/
    polygon_long_axis.rs, polygon_short_axis.rs), as a deterministic-limit
    analog: candidate orientations are the pair directions of the
    32-direction extreme subset (pointdefs.EXT_DIRS — supersets the hull
    edges that matter on scattered points), extents are exact min/max
    projections over ALL points (associative partials, no full-group
    pull), winner = lexicographic (area, ka, kb). Output
    (event_type, n, short_u, long_u) micro-quantized int64."""
    import ray

    from ..pointdefs import type_extremes
    from ..relational import partial_agg
    from ..sources.tables import read_points

    ext = type_extremes(sf_dir)
    pairs = {}
    for t, g in ext.groupby("event_type", sort=True):
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        ka, kb, dx, dy = [], [], [], []
        n = len(x)
        for i in range(n):
            for j in range(i + 1, n):
                ddx, ddy = x[j] - x[i], y[j] - y[i]
                if ddx != 0 or ddy != 0:
                    ka.append(i + 1)  # 1-based like the SQL ext.k
                    kb.append(j + 1)
                    dx.append(ddx)
                    dy.append(ddy)
        pairs[t] = (np.asarray(ka, np.int64), np.asarray(kb, np.int64),
                    np.asarray(dx, np.float64), np.asarray(dy, np.float64))
    pair_ref = ray.put(pairs)

    pts = read_points(sf_dir, extra_cols=("event_type",))

    def proj_part(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        pp = _cached_get(pair_ref)
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        et = df["event_type"].to_numpy()
        frames = []
        for t in np.unique(et):
            m = et == t
            xm, ym = x[m], y[m]
            ka, kb, dx, dy = pp[t]
            u = xm[:, None] * dx[None, :] + ym[:, None] * dy[None, :]
            v = -(xm[:, None] * dy[None, :]) + ym[:, None] * dx[None, :]
            frames.append(pd.DataFrame({
                "event_type": t, "ka": ka, "kb": kb,
                "umin": u.min(axis=0), "umax": u.max(axis=0),
                "vmin": v.min(axis=0), "vmax": v.max(axis=0),
                "n": np.int64(m.sum())}))
        return pd.concat(frames, ignore_index=True)

    agg = partial_agg(pts.map_batches(proj_part, batch_format="pandas"),
                      ["event_type", "ka", "kb"],
                      [("umin", "min", "umin"), ("umax", "max", "umax"),
                       ("vmin", "min", "vmin"), ("vmax", "max", "vmax"),
                       ("n", "sum", "n")]).to_pandas()

    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        ka, kb, dx, dy = pairs[t]
        key = {(int(a), int(b)): i for i, (a, b) in enumerate(zip(ka, kb))}
        idx = np.asarray([key[(int(a), int(b))]
                          for a, b in zip(g["ka"], g["kb"])], np.int64)
        w = g["umax"].to_numpy() - g["umin"].to_numpy()
        h = g["vmax"].to_numpy() - g["vmin"].to_numpy()
        area_s = w * h / (dx[idx] * dx[idx] + dy[idx] * dy[idx])
        order = sorted(range(len(area_s)),
                       key=lambda i: (area_s[i], ka[idx[i]], kb[idx[i]]))
        i = order[0]
        ln = np.sqrt(dx[idx[i]] * dx[idx[i]] + dy[idx[i]] * dy[idx[i]])
        rows.append((t, int(g["n"].iloc[0]),
                     int(np.floor(min(w[i], h[i]) / ln * 1e6 + 0.5)),
                     int(np.floor(max(w[i], h[i]) / ln * 1e6 + 0.5))))
    return pd.DataFrame(rows, columns=["event_type", "n", "short_u",
                                       "long_u"])


@query("quantile_sketch_value")
def quantile_sketch_value(sf_dir: str):
    """Approximate quantiles of events.value via the mergeable compressed-CDF
    sketch (functions/sketch.py) — the streaming SCALE path next to the
    exact global-sort quantile operators; rank error bounded by
    merge-levels/K (< 0.6% here). Rows-only; the error bound is asserted
    against the exact sort in tests/test_sketch.py."""
    import ray.data

    from ..functions.sketch import sketch_quantiles

    ds = read_table(sf_dir, "events", columns=["value"])
    return ray.data.from_pandas(sketch_quantiles(ds, "value"))


@query(
    "lidar_elevation_slice",
    f"""
    WITH {PTS_CTE}
    SELECT event_id,
           CAST(CASE WHEN ROUND(value * 100) < 2000 THEN 0
                     WHEN ROUND(value * 100) < 6000 THEN 1
                     ELSE 2 END AS BIGINT) AS slice_class
    FROM pts
    """,
)
def lidar_elevation_slice(sf_dir: str):
    """LidarElevationSlice (lidar_analysis/lidar_elevation_slice.rs):
    classify every point by elevation band (cents-exact thresholds 20.00 /
    60.00) — pure vectorized map, no shuffle."""
    from ..sources.tables import read_points

    ds = read_points(sf_dir)

    def classify(t: pa.Table) -> pa.Table:
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        cls = np.where(cents < 2000, 0, np.where(cents < 6000, 1, 2)).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "slice_class": cls})

    return ds.map_batches(classify, batch_format="pyarrow")


@query(
    "attribute_correlation",
    """
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sp,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sqq,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS spp,
           CAST(SUM(CAST(l_quantity AS BIGINT)
                    * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sqp
    FROM lineitem
    """,
)
def attribute_correlation(sf_dir: str):
    """AttributeCorrelation (math_stat_analysis/attribute_correlation.rs):
    exact integer cross-moments between two table attributes (quantity x
    price cents) — Pearson r follows driver-side from the six sums."""
    from ..sources.tables import read_table

    ds = read_table(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def part(t: pa.Table) -> pd.DataFrame:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pd.DataFrame([{
            "k": 0, "n": np.int64(len(q)), "sq": q.sum(), "sp": p.sum(),
            "sqq": (q * q).sum(), "spp": (p * p).sum(), "sqp": (q * p).sum()}])

    return partial_agg(ds.map_batches(part, batch_format="pyarrow"), ["k"],
                       [(c, "sum", c) for c in
                        ("n", "sq", "sp", "sqq", "spp", "sqp")]).drop_columns(["k"])


@query(
    "attribute_histogram",
    """
    SELECT CAST(l_quantity AS BIGINT) // 5 AS bin, COUNT(*) AS n
    FROM lineitem GROUP BY bin
    """,
)
def attribute_histogram(sf_dir: str):
    """AttributeHistogram (math_stat_analysis/attribute_histogram.rs):
    binned counts of a table attribute — per-batch partial histograms."""
    from ..sources.tables import read_table

    ds = read_table(sf_dir, "lineitem", columns=["l_quantity"])

    def part(t: pa.Table) -> pd.DataFrame:
        b = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64) // 5
        vals, cnts = np.unique(b, return_counts=True)
        return pd.DataFrame({"bin": vals, "n": cnts.astype(np.int64)})

    return partial_agg(ds.map_batches(part, batch_format="pyarrow"), ["bin"],
                       [("n", "sum", "n")])


@query(
    "lidar_remove_outliers",
    f"""
    WITH {PTS_CTE},
    enc AS (SELECT event_id, {_cid1} AS cell_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents FROM pts),
    cellagg AS (SELECT cell_id, COUNT(*) AS n, SUM(cents) AS s
                FROM enc GROUP BY cell_id)
    SELECT e.event_id,
           CAST(CASE WHEN abs(e.cents * a.n - a.s) > 3000 * a.n
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM enc e JOIN cellagg a USING (cell_id)
    """,
)
def lidar_remove_outliers(sf_dir: str):
    """LidarRemoveOutliers (lidar_analysis/lidar_remove_outliers.rs;
    lidar_outliers.rs is the same cell-deviation flagging without removal): a point is an outlier when it deviates from its grid
    cell's mean by more than 30.00 — the integer contract
    |cents*n - sum| > 3000*n avoids the float mean; co-partitioned join like
    lidar_ground_classify."""
    from ..sources.tables import read_points

    ds = read_points(sf_dir)

    def enc(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        return pa.table({"event_id": t["event_id"].to_numpy(zero_copy_only=False)
                         .astype(np.int64),
                         "cell_id": GRID1.cell_id_from_xy(x, y), "cents": cents})

    encoded = ds.map_batches(enc, batch_format="pyarrow").materialize()
    agg = partial_agg(
        encoded.map_batches(lambda t: pa.table({
            "cell_id": t["cell_id"], "n": np.ones(len(t), np.int64),
            "s": t["cents"]}), batch_format="pyarrow"),
        ["cell_id"], [("n", "sum", "n"), ("s", "sum", "s")])
    j = encoded.join(agg, join_type="inner", num_partitions=8, on=("cell_id",))

    def classify(t: pa.Table) -> pa.Table:
        cents = t["cents"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": t["event_id"],
                         "is_outlier": (np.abs(cents * n - s) > 3000 * n)
                         .astype(np.int64)})

    return j.map_batches(classify, batch_format="pyarrow")
