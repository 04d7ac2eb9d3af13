"""Clip/erase family against a single large clip polygon: raster, lidar
and tile variants.

The clip region is one 12-vertex star ring centred at the origin with
radii 30..60 from splitmix64 (fixed STAR_DIRS directions) — big enough to
contain thousands of world-bbox cells/points. Point-in-polygon uses the
overlay family's crossing-rule winding number; all vertex coordinates and
probe coordinates derive from shared integer seeds, so the float
comparisons are identical trees on both sides (generic position: no probe
lies on an edge — asserted in tests/test_clip2.py).

At 100 TB the ring is a broadcast constant (ray.put) and each batch
classifies its own points vectorized — no shuffle at all; the general
many-polygon case is the CSR-indexed pip machinery (queries_spatial)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..pointdefs import PTS_CTE
from ..rasterdefs import _CELLS_CTE, _value_fn
from ..sources.synthetic import splitmix64
from ..stardefs import STAR_DIRS
from ..stages.raster import synth_raster_tiles
from .queries import query
from .sqlgen import add64, sm64

_CLIP_SALT = 909091


def clip_ring() -> np.ndarray:
    """(13, 2) closed ring, CCW."""
    k = np.arange(12, dtype=np.uint64)
    h = splitmix64(k + np.uint64(_CLIP_SALT))
    u = (h % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30)
    r = 30.0 + u * 30.0
    d = np.array(STAR_DIRS)
    v = np.empty((13, 2))
    v[:12, 0] = d[:, 0] * r
    v[:12, 1] = d[:, 1] * r
    v[12] = v[0]
    return v


def _ring_sql() -> str:
    h = sm64(add64("CAST(t.i AS UBIGINT)", str(_CLIP_SALT)))
    dirs = ", ".join(f"({k}, {dx!r}, {dy!r})"
                     for k, (dx, dy) in enumerate(STAR_DIRS))
    return f"""
    rdirs(k, dx, dy) AS (VALUES {dirs}),
    rring AS MATERIALIZED (
      SELECT d.k,
             d.dx * (30.0 + (CAST({h} % 1073741824 AS DOUBLE)
                             / 1073741824.0) * 30.0) AS x,
             d.dy * (30.0 + (CAST({h} % 1073741824 AS DOUBLE)
                             / 1073741824.0) * 30.0) AS y
      FROM range(12) t(i) JOIN rdirs d ON d.k = t.i
    ),
    redges AS (
      SELECT e0.x AS x0, e0.y AS y0, e1.x AS x1, e1.y AS y1
      FROM rring e0 JOIN rring e1 ON e1.k = (e0.k + 1) % 12
    )
    """


def _wind_sql(px: str, py: str) -> str:
    """Winding number of ({px},{py}) over redges (crossing rule)."""
    return f"""(SELECT
        SUM(CASE WHEN e.y0 <= {py} AND e.y1 > {py}
                  AND (e.x1 - e.x0) * ({py} - e.y0)
                      - ({px} - e.x0) * (e.y1 - e.y0) > 0
                 THEN 1 ELSE 0 END)
        - SUM(CASE WHEN e.y0 > {py} AND e.y1 <= {py}
                    AND (e.x1 - e.x0) * ({py} - e.y0)
                        - ({px} - e.x0) * (e.y1 - e.y0) < 0
                   THEN 1 ELSE 0 END)
      FROM redges e)"""


def _wind_np(ring: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    wn = np.zeros(px.shape, np.int64)
    for e in range(12):
        x0, y0 = ring[e]
        x1, y1 = ring[e + 1]
        cross = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)
        wn += np.where((y0 <= py) & (y1 > py) & (cross > 0), 1, 0)
        wn -= np.where((y0 > py) & (y1 <= py) & (cross < 0), 1, 0)
    return wn


_CTR_X = f"(-180.0 + (c + 0.5) * (360.0 / {GRID1.cols}))"
_CTR_Y = f"(85.0 - (r + 0.5) * (170.0 / {GRID1.rows}))"


def _raster_clip(name: str, keep_inside: bool, ref: str):
    cmp = "<> 0" if keep_inside else "= 0"

    @query(
        name,
        f"""
        WITH {_CELLS_CTE}, {_ring_sql()}
        SELECT cell_id, CAST(v AS BIGINT) AS v
        FROM cells
        WHERE {_wind_sql(_CTR_X, _CTR_Y)} {cmp}
        """,
    )
    def _impl(sf_dir: str, _inside=keep_inside):
        ring = clip_ring()
        tiles = synth_raster_tiles(GRID1, _value_fn)

        def f(df: pd.DataFrame) -> pd.DataFrame:
            frames = []
            for t in df.itertuples():
                r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
                rr, cc = np.meshgrid(np.arange(r0, r0 + int(t.nrows)),
                                     np.arange(c0, c0 + int(t.ncols)),
                                     indexing="ij")
                cells = (rr.astype(np.int64) * GRID1.cols
                         + cc.astype(np.int64)).ravel()
                px = -180.0 + (cells % GRID1.cols + 0.5) * (360.0 / GRID1.cols)
                py = 85.0 - (cells // GRID1.cols + 0.5) * (170.0 / GRID1.rows)
                wn = _wind_np(ring, px, py)
                keep = (wn != 0) if _inside else (wn == 0)
                frames.append(pd.DataFrame({
                    "cell_id": cells[keep],
                    "v": np.asarray(t.data, np.int64)[keep]}))
            return pd.concat(frames, ignore_index=True)

        return tiles.map_batches(f, batch_format="pandas")

    _impl.__doc__ = (f"{ref}: raster cells whose centres fall "
                     f"{'inside' if keep_inside else 'outside'} the clip "
                     f"polygon survive; crossing-rule winding over the "
                     f"broadcast ring — shared float trees, bit-exact.")
    return _impl


_raster_clip("clip_raster_to_polygon", True,
             "ClipRasterToPolygon (gis_analysis/clip_raster_to_polygon.rs)")
_raster_clip("erase_polygon_from_raster", False,
             "ErasePolygonFromRaster (gis_analysis/erase_polygon_from_raster"
             ".rs)")


def _lidar_clip(name: str, keep_inside: bool, ref: str):
    cmp = "<> 0" if keep_inside else "= 0"

    @query(
        name,
        f"""
        WITH {PTS_CTE}, {_ring_sql()}
        SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM pts
        WHERE {_wind_sql('pts.x', 'pts.y')} {cmp}
        """,
    )
    def _impl(sf_dir: str, _inside=keep_inside):
        from ..sources.tables import read_points
        ring = clip_ring()

        def f(df: pd.DataFrame) -> pd.DataFrame:
            wn = _wind_np(ring, df["x"].to_numpy(np.float64),
                          df["y"].to_numpy(np.float64))
            keep = (wn != 0) if _inside else (wn == 0)
            d = df.loc[keep, :]
            return pd.DataFrame({
                "event_id": d["event_id"].to_numpy(np.int64),
                "cents": np.round(d["value"].to_numpy(np.float64) * 100)
                .astype(np.int64)})

        return read_points(sf_dir).map_batches(f, batch_format="pandas")

    _impl.__doc__ = (f"{ref}: LAS points "
                     f"{'inside' if keep_inside else 'outside'} the clip "
                     f"polygon survive — broadcast-ring winding per batch, "
                     f"no shuffle. Bit-exact.")
    return _impl


_lidar_clip("clip_lidar_to_polygon", True,
            "ClipLidarToPolygon (lidar_analysis/clip_lidar_to_polygon.rs)")
_lidar_clip("erase_polygon_from_lidar", False,
            "ErasePolygonFromLidar (lidar_analysis/erase_polygon_from_lidar"
            ".rs)")


@query(
    "select_tiles_by_polygon",
    f"""
    WITH {_ring_sql()},
    tiles AS (SELECT CAST(t.i AS BIGINT) AS tile_id,
                     -180.0 + (t.i % 36) * 10.0 + 5.0 AS cx,
                     -85.0 + (t.i // 36) * 10.0 + 5.0 AS cy
              FROM range({36 * 17}) t(i))
    SELECT tile_id FROM tiles
    WHERE {_wind_sql('tiles.cx', 'tiles.cy')} <> 0
    """,
)
def select_tiles_by_polygon(sf_dir: str):
    """SelectTilesByPolygon (lidar_analysis/select_tiles_by_polygon.rs):
    keep the 10x10-degree tiles whose centres fall inside the clip polygon
    (the tile-manifest pruning step a 100-TB ingest runs BEFORE reading any
    points). Bit-exact."""
    import ray.data

    ring = clip_ring()
    i = np.arange(36 * 17, dtype=np.int64)
    cx = -180.0 + (i % 36) * 10.0 + 5.0
    cy = -85.0 + (i // 36) * 10.0 + 5.0
    ids = ray.data.from_pandas(pd.DataFrame({"tile_id": i, "cx": cx, "cy": cy}))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        wn = _wind_np(ring, df["cx"].to_numpy(), df["cy"].to_numpy())
        return df.loc[wn != 0, ["tile_id"]]

    return ids.map_batches(f, batch_format="pandas")


@query(
    "lidar_classify_subset",
    f"""
    WITH {PTS_CTE},
    lpc AS (SELECT event_id, x, y, event_id % 7 AS cls FROM pts),
    {_ring_sql()}
    SELECT event_id,
           CAST(CASE WHEN {_wind_sql('p.x', 'p.y')} <> 0 THEN 13
                     ELSE p.cls END AS BIGINT) AS cls
    FROM lpc p
    """,
)
def lidar_classify_subset(sf_dir: str):
    """LidarClassifySubset (lidar_analysis/lidar_classify_subset.rs):
    points inside the clip polygon take the override class (13); the same
    broadcast-ring winding kernel as the lidar clip family."""
    from ..sources.tables import read_points
    from ..stages.spatial_join import _cached_get
    import ray as _ray

    ref = _ray.put(clip_ring())

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        ring = _cached_get(ref)
        e = df["event_id"].to_numpy(np.int64)
        wn = _wind_np(ring, df["x"].to_numpy(np.float64),
                      df["y"].to_numpy(np.float64))
        return pd.DataFrame({
            "event_id": e,
            "cls": np.where(wn != 0, np.int64(13), e % 7)})

    return read_points(sf_dir, extra_cols=()).map_batches(
        classify, batch_format="pandas")
