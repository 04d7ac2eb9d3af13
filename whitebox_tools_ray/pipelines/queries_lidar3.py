"""LiDAR sweep #3: FindFlightlineEdgePoints, NormalVectors,
LidarHillshade.

Normals come from the Horn gradient of the first-return DSM grid (the
reference fits per-point neighbourhood planes; the grid-based surface
normal is the deterministic contract here, documented). The light vector
components are Python-computed constants embedded verbatim in the SQL, so
hillshade needs no runtime libm — every output is bit-exact or integer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..pointdefs import PTS_CTE, _cell_sql
from ..relational import partial_agg
from ..sources.tables import read_points
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols
_c1, _r1, _CID = _cell_sql(GRID1)

# the normal/DSM grid is COARSER (4-unit cells) so 3x3 DSM windows are
# dense at the synthetic point density
from ..grid import GridSpec  # noqa: E402

_NG = GridSpec(west=-180.0, north=85.0, res_x=4.0, res_y=4.0,
               rows=43, cols=90, tile_size=32)
_NGC, _NGR, _NGCID = _cell_sql(_NG)

_LPTS = f"""
    {PTS_CTE},
    lp AS (SELECT event_id, x, y,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  {_NGCID} AS cell_id,
                  event_id % 4 AS fl,
                  ((event_id * 13) % 41) - 20 AS angle,
                  1 + ((event_id * 31) % (1 + (event_id % 3))) AS ret
           FROM pts)
"""

_SAR_DX = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
_SAR_DY = (-1, -1, -1, 0, 0, 0, 1, 1, 1)

# DSM + Horn-normal CTEs (z = cents/100; all 8 neighbour cells must hold
# first-return points)
_DSM_NRM = f"""
    dsm AS MATERIALIZED (
      SELECT cell_id, cell_id // {_NG.cols} AS r, cell_id % {_NG.cols} AS c,
             CAST(MAX(cents) AS DOUBLE) / 100.0 AS z
      FROM lp
      WHERE ret = 1 AND ({_NGC}) BETWEEN 0 AND {_NG.cols - 1}
        AND ({_NGR}) BETWEEN 0 AND {_NG.rows - 1}
      GROUP BY cell_id
    ),
    nrm AS MATERIALIZED (
      SELECT a.cell_id,
             (((n2.z + 2.0 * n5.z + n8.z) - (n0.z + 2.0 * n3.z + n6.z))
              / 8.0) AS p,
             (((n6.z + 2.0 * n7.z + n8.z) - (n0.z + 2.0 * n1.z + n2.z))
              / 8.0) AS q
      FROM dsm a {' '.join(
          f"JOIN dsm n{k} ON n{k}.r = a.r + ({_SAR_DY[k]}) "
          f"AND n{k}.c = a.c + ({_SAR_DX[k]})"
          for k in range(9) if k != 4)}
    )
"""

def _EMPTY() -> pd.DataFrame:
    return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                         "nx": pd.Series([], dtype=np.float64),
                         "ny": pd.Series([], dtype=np.float64),
                         "nz": pd.Series([], dtype=np.float64)})


def _EMPTY_HS() -> pd.DataFrame:
    return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                         "hs": pd.Series([], dtype=np.int64)})


_AZ, _ALT = np.radians(315.0), np.radians(30.0)
_LX = float(np.sin(_AZ) * np.cos(_ALT))
_LY = float(np.cos(_AZ) * np.cos(_ALT))
_LZ = float(np.sin(_ALT))


@query(
    "find_flightline_edge_points",
    f"""
    WITH {_LPTS}
    SELECT event_id, CAST(fl AS BIGINT) AS fl
    FROM lp WHERE angle = 20 OR angle = -20
    """,
)
def find_flightline_edge_points(sf_dir: str):
    """FindFlightlineEdgePoints (lidar_analysis/
    find_flightline_edge_points.rs): points carrying the maximum-magnitude
    scan angle (the synthetic stand-in for the LAS edge-of-flightline
    bit)."""
    def flag(df: pd.DataFrame) -> pd.DataFrame:
        e = df["event_id"].to_numpy(np.int64)
        angle = ((e * 13) % 41) - 20
        keep = np.abs(angle) == 20
        return pd.DataFrame({"event_id": e[keep], "fl": e[keep] % 4})

    return read_points(sf_dir, extra_cols=()).map_batches(
        flag, batch_format="pandas")


def _dsm_normals(sf_dir: str):
    """(cell_id, p, q) Dataset from the first-return DSM (Python side:
    partial-agg DSM -> re-tile -> one halo stencil)."""
    from ..stages.raster import cells_to_tiles, window_exchange

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        e = df["event_id"].to_numpy(np.int64)
        nret = 1 + (e % 3)
        ret = 1 + ((e * 31) % nret)
        cents = np.round(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        col = np.floor((x - _NG.west) / _NG.res_x).astype(np.int64)
        row = np.floor((_NG.north - y) / _NG.res_y).astype(np.int64)
        keep = (ret == 1) & (row >= 0) & (row < _NG.rows) \
            & (col >= 0) & (col < _NG.cols)
        return pd.DataFrame({
            "cell_id": (row * _NG.cols + col)[keep],
            "dsm_cents": cents[keep]})

    dsm = partial_agg(
        read_points(sf_dir).map_batches(derive, batch_format="pandas"),
        ["cell_id"], [("dsm_cents", "max", "dsm_cents")])
    dsm = dsm.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "z": df["dsm_cents"].to_numpy(np.int64).astype(np.float64)
            / 100.0}),
        batch_format="pandas")
    tiles = cells_to_tiles(dsm, _NG, "z")

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        zs = [padded[1 + _SAR_DY[k]:1 + _SAR_DY[k] + nr,
                     1 + _SAR_DX[k]:1 + _SAR_DX[k] + nc] for k in range(9)]
        ok = ~np.isnan(zs[4])
        for k in range(9):
            ok &= ~np.isnan(zs[k])
        p = ((zs[2] + 2.0 * zs[5] + zs[8])
             - (zs[0] + 2.0 * zs[3] + zs[6])) / 8.0
        q = ((zs[6] + 2.0 * zs[7] + zs[8])
             - (zs[0] + 2.0 * zs[1] + zs[2])) / 8.0
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cid = rr.astype(np.int64) * _NG.cols + cc.astype(np.int64)
        return pd.DataFrame({"cell_id": cid[ok].ravel(),
                             "p": p[ok].ravel(), "q": q[ok].ravel()})

    # normalize dtypes (empty per-tile frames otherwise emit object blocks
    # whose schema breaks the downstream hash join)
    return window_exchange(tiles, _NG, window_fn, k=1).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "p": df["p"].to_numpy(np.float64),
            "q": df["q"].to_numpy(np.float64)}),
        batch_format="pandas")


@query(
    "lidar_normal_vectors",
    f"""
    WITH {_LPTS},
    {_DSM_NRM}
    SELECT l.event_id,
           -n.p / sqrt(n.p * n.p + n.q * n.q + 1.0) AS nx,
           -n.q / sqrt(n.p * n.p + n.q * n.q + 1.0) AS ny,
           1.0 / sqrt(n.p * n.p + n.q * n.q + 1.0) AS nz
    FROM lp l JOIN nrm n ON n.cell_id = l.cell_id
    """,
)
def lidar_normal_vectors(sf_dir: str):
    """NormalVectors (lidar_analysis/normal_vectors.rs), grid-surface
    contract: each point takes the unit normal of its DSM cell."""
    nrm = _dsm_normals(sf_dir).materialize()
    if nrm.count() == 0:  # sparse clouds: no complete DSM window anywhere
        return _EMPTY()

    def pts(df: pd.DataFrame) -> pd.DataFrame:
        e = df["event_id"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        col = np.floor((x - _NG.west) / _NG.res_x).astype(np.int64)
        row = np.floor((_NG.north - y) / _NG.res_y).astype(np.int64)
        return pd.DataFrame({"event_id": e,
                             "cell_id": row * _NG.cols + col})

    p = read_points(sf_dir, extra_cols=()).map_batches(
        pts, batch_format="pandas")
    j = p.join(nrm, join_type="inner", num_partitions=8, on=("cell_id",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        pp = df["p"].to_numpy(np.float64)
        qq = df["q"].to_numpy(np.float64)
        ln = np.sqrt(pp * pp + qq * qq + 1.0)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(np.int64),
                             "nx": -pp / ln, "ny": -qq / ln, "nz": 1.0 / ln})

    return j.map_batches(finish, batch_format="pandas")


@query(
    "lidar_hillshade",
    f"""
    WITH {_LPTS},
    {_DSM_NRM}
    SELECT l.event_id,
           CAST(floor(255.0 * greatest(
             (-n.p / sqrt(n.p * n.p + n.q * n.q + 1.0)) * {_LX!r}
             + (-n.q / sqrt(n.p * n.p + n.q * n.q + 1.0)) * {_LY!r}
             + (1.0 / sqrt(n.p * n.p + n.q * n.q + 1.0)) * {_LZ!r}, 0.0)
             + 0.5) AS BIGINT) AS hs
    FROM lp l JOIN nrm n ON n.cell_id = l.cell_id
    """,
)
def lidar_hillshade(sf_dir: str):
    """LidarHillshade (lidar_analysis/lidar_hillshade.rs): per-point
    hillshade from the DSM-cell normal and a FIXED light vector (azimuth
    315, altitude 30; the trig constants are Python literals shared with
    the SQL — no runtime libm, so the 0..255 value is exact)."""
    nrm = _dsm_normals(sf_dir).materialize()
    if nrm.count() == 0:  # sparse clouds: no complete DSM window anywhere
        return _EMPTY_HS()

    def pts(df: pd.DataFrame) -> pd.DataFrame:
        e = df["event_id"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.float64)
        y = df["y"].to_numpy(np.float64)
        col = np.floor((x - _NG.west) / _NG.res_x).astype(np.int64)
        row = np.floor((_NG.north - y) / _NG.res_y).astype(np.int64)
        return pd.DataFrame({"event_id": e,
                             "cell_id": row * _NG.cols + col})

    p = read_points(sf_dir, extra_cols=()).map_batches(
        pts, batch_format="pandas")
    j = p.join(nrm, join_type="inner", num_partitions=8, on=("cell_id",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        pp = df["p"].to_numpy(np.float64)
        qq = df["q"].to_numpy(np.float64)
        ln = np.sqrt(pp * pp + qq * qq + 1.0)
        dot = (-pp / ln) * _LX + (-qq / ln) * _LY + (1.0 / ln) * _LZ
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "hs": np.floor(255.0 * np.maximum(dot, 0.0) + 0.5)
            .astype(np.int64)})

    return j.map_batches(finish, batch_format="pandas")
