"""Format-conversion sweep: ASPRS LAS 1.2 binary round trip (tiled,
parallel read), LAS<->ASCII, LAS->multipoint shapefile, GeoTIFF tag dump,
raster format conversion, table<->CSV round trips, lines->polygons,
attribute-table reinitialisation, lidar hex binning.

Reference tools covered: whitebox-lidar/src/las.rs (read/write),
lidar_analysis/{ascii_to_las,las_to_ascii,las_to_shapefile,
las_to_multipoint_shapefile,lidar_hex_bin}.rs, data_tools/
{print_geotiff_tags,convert_raster_format,export_table_to_csv,
csv_points_to_vector,merge_table_with_csv,lines_to_polygons,
reinitialize_attribute_table}.rs.

Determinism: LAS coordinate quantization is FLOOR(u/scale + 0.5) — the
same float expression in numpy and DuckDB (np.round's half-to-even is NOT
SQL ROUND, so round() never appears); every aggregate is an integer sum.
Scratch files go under a per-call mkdtemp in /tmp; at scale each batch
writes its own LAS/CSV shard (the LidarTile convention) and the re-read
parallelizes across files and record ranges.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..pointdefs import PTS_CTE
from ..rasterdefs import _CELLS_CTE, _value_fn
from ..relational import partial_agg
from ..sources.tables import read_points, read_table
from .queries import query
from ..hexdefs import _hex_cte, _hex_layout
from .sqlgen import sm64

_ROWS, _COLS = GRID1.rows, GRID1.cols

# LAS quantization contract (write side fixes scale/offset; both engines
# evaluate the identical float tree)
_QX = "CAST(FLOOR((x - (-180.0)) / 0.001 + 0.5) AS BIGINT)"
_QY = "CAST(FLOOR((y - (-85.0)) / 0.001 + 0.5) AS BIGINT)"
_QZ = "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)"

_LAS_CTE = f"""
    {PTS_CTE},
    lq AS (SELECT event_id, {_QX} AS x_int, {_QY} AS y_int, {_QZ} AS z_int,
                  (event_id * 97) % 4096 AS intensity,
                  event_id % 7 AS cls,
                  1 + (event_id % 3) AS nret,
                  1 + ((event_id * 31) % (1 + (event_id % 3))) AS ret,
                  ((event_id * 13) % 41) - 20 AS angle,
                  event_id % 4 AS fl
           FROM pts)
"""


def _quantize(df: pd.DataFrame) -> pd.DataFrame:
    e = df["event_id"].to_numpy(np.int64)
    x = df["x"].to_numpy(np.float64)
    y = df["y"].to_numpy(np.float64)
    v = df["value"].to_numpy(np.float64)
    nret = 1 + (e % 3)
    return pd.DataFrame({
        "event_id": e,
        "x_int": np.floor((x - (-180.0)) / 0.001 + 0.5).astype(np.int64),
        "y_int": np.floor((y - (-85.0)) / 0.001 + 0.5).astype(np.int64),
        "z_int": np.floor(v * 100.0 + 0.5).astype(np.int64),
        "intensity": (e * 97) % 4096, "cls": e % 7,
        "nret": nret, "ret": 1 + ((e * 31) % nret),
        "scan_angle": ((e * 13) % 41) - 20, "psid": e % 4,
        "gps_time": e.astype(np.float64)})


@query(
    "las_roundtrip_stats",
    f"""
    WITH {_LAS_CTE}
    SELECT CAST(cls AS BIGINT) AS cls, COUNT(*) AS n,
           CAST(SUM(intensity) AS BIGINT) AS sum_intensity,
           CAST(SUM(x_int) AS BIGINT) AS sum_x,
           CAST(SUM(y_int) AS BIGINT) AS sum_y,
           CAST(SUM(z_int) AS BIGINT) AS sum_z,
           CAST(SUM(ret * 10 + nret) AS BIGINT) AS sum_flags,
           CAST(SUM(angle) AS BIGINT) AS sum_angle
    FROM lq GROUP BY cls
    """,
)
def las_roundtrip_stats(sf_dir: str):
    """whitebox-lidar/src/las.rs analog: every batch writes its own LAS 1.2
    point-format-1 file; the read-back Dataset decodes per-file record
    ranges in parallel, and the per-class aggregate proves the binary
    round trip bit-for-bit (integer grid coords, flags, angles, GPS
    time)."""
    from ..sources.las import read_las_ds, write_las

    d = tempfile.mkdtemp(prefix="las_rt_", dir="/tmp")

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        p = os.path.join(d, f"part-{uuid.uuid4().hex}.las")
        write_las(p, df, point_format=1)
        return pd.DataFrame({"path": [p], "n": [len(df)]})

    pts = read_points(sf_dir).map_batches(_quantize, batch_format="pandas")
    paths = pts.map_batches(write_batch, batch_format="pandas").to_pandas()
    las = read_las_ds(paths["path"].tolist())

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cls": df["cls"].to_numpy(np.int64),
            "n": np.ones(len(df), np.int64),
            "sum_intensity": df["intensity"].to_numpy(np.int64),
            "sum_x": df["x_int"].to_numpy(np.int64),
            "sum_y": df["y_int"].to_numpy(np.int64),
            "sum_z": df["z_int"].to_numpy(np.int64),
            "sum_flags": df["ret"].to_numpy(np.int64) * 10
            + df["nret"].to_numpy(np.int64),
            "sum_angle": df["scan_angle"].to_numpy(np.int64)})

    return partial_agg(las.map_batches(stats, batch_format="pandas"),
                       ["cls"], [(c, "sum", c) for c in
                                 ("n", "sum_intensity", "sum_x", "sum_y",
                                  "sum_z", "sum_flags", "sum_angle")])


@query(
    "ascii_las_roundtrip",
    f"""
    WITH {_LAS_CTE}
    SELECT COUNT(*) AS n,
           CAST(SUM(x_int + 3 * y_int) AS BIGINT) AS xy_sum,
           CAST(SUM(z_int * (1 + cls)) AS BIGINT) AS zc_sum,
           CAST(SUM(intensity * ret) AS BIGINT) AS ir_sum
    FROM lq
    """,
)
def ascii_las_roundtrip(sf_dir: str):
    """las_to_ascii.rs + ascii_to_las.rs: LAS-quantized points -> one text
    shard per batch -> parsed back -> LAS-field checksums. The text format
    carries the INTEGER grid fields, so the round trip is lossless by
    construction."""
    import ray.data

    from ..sources.las import ascii_lines_to_las_df, las_to_ascii_lines

    d = tempfile.mkdtemp(prefix="las_ascii_", dir="/tmp")

    def write_txt(df: pd.DataFrame) -> pd.DataFrame:
        p = os.path.join(d, f"part-{uuid.uuid4().hex}.txt")
        with open(p, "w") as f:
            f.write("\n".join(las_to_ascii_lines(df)) + "\n")
        return pd.DataFrame({"path": [p]})

    pts = read_points(sf_dir).map_batches(_quantize, batch_format="pandas")
    paths = pts.map_batches(write_txt, batch_format="pandas").to_pandas()
    txt = ray.data.read_text(paths["path"].tolist())

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        las = ascii_lines_to_las_df(df["text"])
        return pd.DataFrame({
            "n": np.ones(len(las), np.int64),
            "xy_sum": las["x_int"] + 3 * las["y_int"],
            "zc_sum": las["z_int"] * (1 + las["cls"]),
            "ir_sum": las["intensity"] * las["ret"]})

    rows = txt.map_batches(parse, batch_format="pandas")
    return partial_agg(rows.map_batches(
        lambda df: df.assign(k=np.int64(0)), batch_format="pandas"),
        ["k"], [(c, "sum", c) for c in ("n", "xy_sum", "zc_sum", "ir_sum")]) \
        .map_batches(lambda df: df[["n", "xy_sum", "zc_sum", "ir_sum"]],
                     batch_format="pandas")


@query(
    "las_to_multipoint_shapefile",
    f"""
    WITH {PTS_CTE}
    SELECT x, y FROM pts WHERE event_id % 13 = 0
    """,
)
def las_to_multipoint_shapefile(sf_dir: str):
    """las_to_shapefile.rs / las_to_multipoint_shapefile.rs: sampled points
    -> one MultiPoint .shp record -> parsed back. The shapefile stores raw
    <f8, so the coordinates survive bit-for-bit (no quantization)."""
    import ray.data

    from ..sources.shapefile import (read_multipoint_shapefile,
                                     write_multipoint_shapefile)

    pts = read_points(sf_dir, extra_cols=()).map_batches(
        lambda df: df.loc[df["event_id"] % 13 == 0, ["x", "y"]],
        batch_format="pandas").to_pandas()
    p = os.path.join(tempfile.mkdtemp(prefix="las_shp_", dir="/tmp"),
                     "points.shp")
    write_multipoint_shapefile(p, pts[["x", "y"]].to_numpy())
    xy = read_multipoint_shapefile(p)
    return ray.data.from_pandas(pd.DataFrame({"x": xy[:, 0], "y": xy[:, 1]}))


@query(
    "lidar_hex_bin",
    f"""
    WITH {PTS_CTE}, {_hex_cte()},
    lp AS (SELECT event_id, x, y, (event_id * 97) % 4096 AS intensity
           FROM pts),
    assign AS (
      SELECT p.event_id, p.intensity, h.hex_id,
             (p.x - h.hx) * (p.x - h.hx) + (p.y - h.hy) * (p.y - h.hy) AS d2
      FROM lp p, hexes h
      QUALIFY row_number() OVER (PARTITION BY p.event_id
                                 ORDER BY d2, h.hex_id) = 1
    )
    SELECT hex_id, COUNT(*) AS n,
           CAST(SUM(intensity) AS BIGINT) AS sum_intensity
    FROM assign GROUP BY hex_id
    """,
)
def lidar_hex_bin(sf_dir: str):
    """LidarHexBinning (lidar_analysis/lidar_hex_bin.rs): the vector hex
    lattice assignment with an intensity payload — broadcast centres,
    chunked brute-force argmin, partial-combined aggregate."""
    import ray as _ray

    from ..stages.spatial_join import _cached_get

    hid, cx, cy = _hex_layout()
    ref = _ray.put((hid, cx, cy))

    def assign_hex(df: pd.DataFrame) -> pd.DataFrame:
        hid_, cx_, cy_ = _cached_get(ref)
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        e = df["event_id"].to_numpy(np.int64)
        out = np.empty(len(x), np.int64)
        for lo in range(0, len(x), 4096):
            hi = min(lo + 4096, len(x))
            d2 = (x[lo:hi, None] - cx_[None, :]) ** 2 \
                + (y[lo:hi, None] - cy_[None, :]) ** 2
            out[lo:hi] = hid_[np.argmin(d2, axis=1)]
        return pd.DataFrame({"hex_id": out,
                             "n": np.ones(len(x), np.int64),
                             "sum_intensity": (e * 97) % 4096})

    ds = read_points(sf_dir, extra_cols=())
    return partial_agg(ds.map_batches(assign_hex, batch_format="pandas"),
                       ["hex_id"], [("n", "sum", "n"),
                                    ("sum_intensity", "sum", "sum_intensity")])


@query(
    "print_geotiff_tags",
    """
    SELECT * FROM (VALUES
      (CAST(256 AS BIGINT), CAST(1 AS BIGINT), CAST(360 AS DOUBLE)),
      (257, 1, 170.0), (258, 1, 32.0), (259, 1, 1.0), (262, 1, 1.0),
      (277, 1, 1.0), (278, 1, 170.0), (279, 1, 244800.0), (339, 1, 2.0),
      (33550, 3, 1.0), (33922, 6, 0.0)
    ) AS t(tag, n_vals, val0)
    """,
)
def print_geotiff_tags(sf_dir: str):
    """PrintGeoTiffTags (data_tools/print_geotiff_tags.rs): write the GRID1
    synthetic raster as int32 GeoTIFF, dump its IFD. The VALUES oracle PINS
    the binary tag layout (offset-dependent StripOffsets excluded)."""
    import ray.data
    import struct as _struct

    from ..sources.geotiff import _read_ifd, write_geotiff

    p = os.path.join(tempfile.mkdtemp(prefix="gtif_tags_", dir="/tmp"),
                     "grid1.tif")
    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64)) \
        .reshape(_ROWS, _COLS).astype(np.int32)
    write_geotiff(p, z, west=GRID1.west, north=GRID1.north, res=GRID1.res_x)
    with open(p, "rb") as f:
        sig = f.read(4)
        endian = "<" if sig[:2] == b"II" else ">"
        (off,) = _struct.unpack(endian + "I", f.read(4))
        f.seek(off)
        ifd = _read_ifd(f, endian)
    rows = [(int(tag), len(vals), float(vals[0]))
            for tag, (_typ, vals) in sorted(ifd.items()) if tag != 273]
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["tag", "n_vals", "val0"]))


@query(
    "convert_raster_format",
    f"""
    WITH {_CELLS_CTE}
    SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sum_v,
           CAST(SUM(v * (cell_id % 9973)) AS BIGINT) AS checksum
    FROM cells
    """,
)
def convert_raster_format(sf_dir: str):
    """ConvertRasterFormat (data_tools/convert_raster_format.rs): GeoTIFF ->
    tile Dataset -> hive parquet -> re-read, with a content checksum proving
    the two format hops are lossless. The GeoTIFF re-read and the parquet
    re-read are both distributed range reads."""
    import ray.data

    from ..sources.geotiff import geotiff_to_tiles, write_geotiff

    d = tempfile.mkdtemp(prefix="convert_", dir="/tmp")
    p = os.path.join(d, "grid1.tif")
    z = _value_fn(np.arange(_ROWS * _COLS, dtype=np.int64)) \
        .reshape(_ROWS, _COLS)
    write_geotiff(p, z, west=GRID1.west, north=GRID1.north, res=GRID1.res_x)

    tiles = geotiff_to_tiles(p)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr),
                                 np.arange(c0, c0 + nc), indexing="ij")
            cid = rr.astype(np.int64) * _COLS + cc.astype(np.int64)
            frames.append(pd.DataFrame({
                "cell_id": cid.ravel(),
                "v": np.asarray(t.data, np.float64).astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    pq = os.path.join(d, "cells_parquet")
    tiles.map_batches(explode, batch_format="pandas").write_parquet(pq)
    cells = ray.data.read_parquet(pq)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        return pd.DataFrame({"k": [np.int64(0)], "n": [len(df)],
                             "sum_v": [v.sum()],
                             "checksum": [(v * (cid % 9973)).sum()]})

    return partial_agg(cells.map_batches(stats, batch_format="pandas"),
                       ["k"], [("n", "sum", "n"), ("sum_v", "sum", "sum_v"),
                               ("checksum", "sum", "checksum")]) \
        .map_batches(lambda df: df[["n", "sum_v", "checksum"]],
                     batch_format="pandas")


@query(
    "table_csv_roundtrip",
    """
    SELECT COUNT(*) AS n,
           CAST(SUM(n_nationkey * (1 + n_regionkey)) AS BIGINT) AS key_sum,
           CAST(SUM(length(n_name)) AS BIGINT) AS name_len_sum
    FROM nation
    """,
)
def table_csv_roundtrip(sf_dir: str):
    """ExportTableToCsv + CsvPointsToVector (data_tools/
    {export_table_to_csv,csv_points_to_vector}.rs): parquet -> CSV shard
    directory -> re-read -> checksums."""
    import ray.data

    from ..sources.formats import export_csv

    d = tempfile.mkdtemp(prefix="csv_rt_", dir="/tmp")
    ds = read_table(sf_dir, "nation",
                    columns=["n_nationkey", "n_regionkey", "n_name"])
    export_csv(ds, d)
    back = ray.data.read_csv(d)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": [np.int64(0)], "n": [len(df)],
            "key_sum": [int((df["n_nationkey"].to_numpy(np.int64)
                             * (1 + df["n_regionkey"].to_numpy(np.int64))).sum())],
            "name_len_sum": [int(df["n_name"].str.len().sum())]})

    return partial_agg(back.map_batches(stats, batch_format="pandas"),
                       ["k"], [("n", "sum", "n"), ("key_sum", "sum", "key_sum"),
                               ("name_len_sum", "sum", "name_len_sum")]) \
        .map_batches(lambda df: df[["n", "key_sum", "name_len_sum"]],
                     batch_format="pandas")


@query(
    "merge_table_with_csv",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           CAST(n_regionkey * 7 + 1 AS BIGINT) AS bonus
    FROM nation
    """,
)
def merge_table_with_csv(sf_dir: str):
    """MergeTableWithCsv (data_tools/merge_table_with_csv.rs): a tiny keyed
    CSV attribute file merged onto the nation table — the CSV side is read
    back from disk and BROADCAST into the probe map (J1)."""
    import ray as _ray
    import ray.data

    from ..stages.spatial_join import _cached_get

    d = tempfile.mkdtemp(prefix="merge_csv_", dir="/tmp")
    p = os.path.join(d, "bonus.csv")
    with open(p, "w") as f:
        f.write("regionkey,bonus\n")
        for rk in range(5):
            f.write(f"{rk},{rk * 7 + 1}\n")
    csv = ray.data.read_csv(p).to_pandas()
    lut = dict(zip(csv["regionkey"].astype(int), csv["bonus"].astype(int)))
    ref = _ray.put(lut)

    ds = read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(ref)
        return pd.DataFrame({
            "n_nationkey": df["n_nationkey"].to_numpy(np.int64),
            "bonus": df["n_regionkey"].map(m).to_numpy(np.int64)})

    return ds.map_batches(probe, batch_format="pandas")


# --------------------------------------------------------------------------
# LinesToPolygons (data_tools/lines_to_polygons.rs): close each polyline
# into a ring, report vertex count + doubled shoelace area. Fixture: 200
# deterministic 8-vertex splitmix64 polylines (integer coordinates).
# --------------------------------------------------------------------------
from ..linedefs import _L2P_K, _L2P_N, _L2P_SEED  # noqa: E402


def _l2p_sql() -> str:
    h = sm64(f"CAST(t.i AS UBIGINT) + {_L2P_SEED}")
    return f"""
    WITH vh AS MATERIALIZED (
      SELECT CAST(t.i // {_L2P_K} AS BIGINT) AS line_id,
             CAST(t.i % {_L2P_K} AS BIGINT) AS j,
             {h} AS h
      FROM range({_L2P_N * _L2P_K}) t(i)
    ),
    v AS MATERIALIZED (
      SELECT line_id, j, CAST(h % 1000 AS BIGINT) AS x,
             CAST({sm64('h')} % 1000 AS BIGINT) AS y
      FROM vh
    )
    SELECT a.line_id, CAST({_L2P_K} AS BIGINT) AS n_vertices,
           CAST(SUM(a.x * b.y - b.x * a.y) AS BIGINT) AS area2
    FROM v a JOIN v b ON b.line_id = a.line_id
     AND b.j = (a.j + 1) % {_L2P_K}
    GROUP BY a.line_id
    """


@query("lines_to_polygons", _l2p_sql())
def lines_to_polygons(sf_dir: str):
    import ray.data

    from ..sources.synthetic import splitmix64

    def gen(batch: dict) -> pd.DataFrame:
        out = []
        for li in batch["id"]:
            idx = np.arange(_L2P_K, dtype=np.uint64) \
                + np.uint64(int(li) * _L2P_K + _L2P_SEED)
            h = splitmix64(idx)
            x = (h % np.uint64(1000)).astype(np.int64)
            y = (splitmix64(h) % np.uint64(1000)).astype(np.int64)
            xn, yn = np.roll(x, -1), np.roll(y, -1)
            out.append({"line_id": int(li), "n_vertices": _L2P_K,
                        "area2": int((x * yn - xn * y).sum())})
        return pd.DataFrame(out)

    return ray.data.range(_L2P_N, override_num_blocks=4) \
        .map_batches(gen, batch_format="numpy")


@query(
    "reinitialize_attribute_table",
    "SELECT row_number() OVER (ORDER BY s_suppkey) - 1 AS fid FROM supplier",
)
def reinitialize_attribute_table(sf_dir: str):
    """ReinitializeAttributeTable (data_tools/
    reinitialize_attribute_table.rs): drop every attribute, keep a fresh
    sequential FID in record (s_suppkey) order. Attribute tables are
    metadata-scale — the keyed rank is computed on the driver."""
    import ray.data

    keys = read_table(sf_dir, "supplier", columns=["s_suppkey"]).to_pandas()
    keys = keys.sort_values("s_suppkey", kind="mergesort").reset_index(drop=True)
    return ray.data.from_pandas(
        pd.DataFrame({"fid": np.arange(len(keys), dtype=np.int64)}))

@query(
    "zlidar_roundtrip_stats",
    f"""
    WITH {_LAS_CTE}
    SELECT CAST(cls AS BIGINT) AS cls, COUNT(*) AS n,
           CAST(SUM(x_int + 7 * y_int) AS BIGINT) AS xy7_sum,
           CAST(SUM(z_int) AS BIGINT) AS z_sum,
           CAST(SUM(intensity + ret + nret + angle) AS BIGINT) AS attr_sum
    FROM lq GROUP BY cls
    """,
)
def zlidar_roundtrip_stats(sf_dir: str):
    """las_to_zlidar.rs + zlidar_to_las.rs: every batch writes its own
    .zlidar subset file (ZLDR signature, per-field DEFLATE sub-blocks —
    sources/las.py:write_zlidar), the read-back decodes in parallel, and
    per-class checksums prove the compressed round trip bit-for-bit. The
    reference's nibble-tag delta coordinate coding is a documented
    non-goal of the subset container."""
    import ray.data

    from ..sources.las import read_zlidar, write_zlidar

    d = tempfile.mkdtemp(prefix="zlidar_rt_", dir="/tmp")

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        p = os.path.join(d, f"part-{uuid.uuid4().hex}.zlidar")
        write_zlidar(p, df)
        return pd.DataFrame({"path": [p], "n": [len(df)]})

    pts = read_points(sf_dir).map_batches(_quantize, batch_format="pandas")
    paths = pts.map_batches(write_batch, batch_format="pandas").to_pandas()

    z = ray.data.from_pandas(paths[["path"]]).flat_map(
        lambda row: read_zlidar(row["path"]).to_dict("records"))

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cls": df["cls"].to_numpy(np.int64),
            "n": np.ones(len(df), np.int64),
            "xy7_sum": df["x_int"].to_numpy(np.int64)
            + 7 * df["y_int"].to_numpy(np.int64),
            "z_sum": df["z_int"].to_numpy(np.int64),
            "attr_sum": df["intensity"].to_numpy(np.int64)
            + df["ret"].to_numpy(np.int64) + df["nret"].to_numpy(np.int64)
            + df["scan_angle"].to_numpy(np.int64)})

    return partial_agg(z.map_batches(stats, batch_format="pandas"),
                       ["cls"], [(c, "sum", c) for c in
                                 ("n", "xy7_sum", "z_sum", "attr_sum")])


@query(
    "laz_roundtrip_stats",
    f"""
    WITH {_LAS_CTE}
    SELECT CAST(cls AS BIGINT) AS cls, COUNT(*) AS n,
           CAST(SUM(x_int + 7 * y_int) AS BIGINT) AS xy7_sum,
           CAST(SUM(z_int) AS BIGINT) AS z_sum,
           CAST(SUM(intensity + ret + nret + angle) AS BIGINT) AS attr_sum,
           CAST(SUM(event_id) AS BIGINT) AS gps_sum
    FROM lq GROUP BY cls
    """,
)
def laz_roundtrip_stats(sf_dir: str):
    """Real LAZ (LASzip) round trip — the reference reads/writes .laz via
    the laz crate (whitebox-lidar/src/las.rs:527,1175 read_laz_data /
    :3409 write_laz_data); sources/laz.py is a from-scratch pure-python
    implementation of the published LASzip algorithm (FastAC arithmetic
    coder, POINT10 v2 + GPSTIME11 v2 item codecs, pointwise-chunked
    container). Every batch writes its own .laz; the read-back Dataset
    decodes one task per (file, chunk) via the chunk table; per-class
    checksums incl. the GPS-time sum prove the compressed round trip
    bit-for-bit."""
    from ..sources.laz import read_laz_ds, write_laz

    d = tempfile.mkdtemp(prefix="laz_rt_", dir="/tmp")

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        p = os.path.join(d, f"part-{uuid.uuid4().hex}.laz")
        write_laz(p, df, point_format=1)
        return pd.DataFrame({"path": [p], "n": [len(df)]})

    pts = read_points(sf_dir).map_batches(_quantize, batch_format="pandas")
    paths = pts.map_batches(write_batch, batch_format="pandas").to_pandas()
    laz = read_laz_ds(paths["path"].tolist())

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cls": df["cls"].to_numpy(np.int64),
            "n": np.ones(len(df), np.int64),
            "xy7_sum": df["x_int"].to_numpy(np.int64)
            + 7 * df["y_int"].to_numpy(np.int64),
            "z_sum": df["z_int"].to_numpy(np.int64),
            "attr_sum": df["intensity"].to_numpy(np.int64)
            + df["ret"].to_numpy(np.int64) + df["nret"].to_numpy(np.int64)
            + df["scan_angle"].to_numpy(np.int64),
            # gps_time carries event_id exactly (small integers in f64)
            "gps_sum": df["gps_time"].to_numpy(np.float64).astype(np.int64)})

    return partial_agg(laz.map_batches(stats, batch_format="pandas"),
                       ["cls"], [(c, "sum", c) for c in
                                 ("n", "xy7_sum", "z_sum", "attr_sum",
                                  "gps_sum")])
