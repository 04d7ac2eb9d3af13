"""TIN gridding (gis_analysis/tin_gridding.rs; lidar sibling
lidar_analysis/lidar_tin_gridding.rs): Delaunay-triangulate the point layer,
linearly interpolate every cell centre inside the hull.

Distributed plan = the reference's own sharded-lidar pattern
(lidar_idw_interpolation.rs:536-600 halo re-reads): points are assigned to
coarse TIN tiles, each point is ALSO replicated to neighbouring tiles within
``buffer`` (the halo), and each tile triangulates its own + halo points and
interpolates only its interior cells. A halo >= the expected max triangle
edge makes tile edges consistent; cells outside the hull stay nodata.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.delaunay import delaunay, interpolate_linear
from ..grid import GridSpec


def tin_grid(points_ds, grid: GridSpec, *, tile_deg: float = 30.0, buffer: float = 6.0,
             x_col="x", y_col="y", value_col="value", seq_col="event_id"):
    """Output: cell_id, tin_value for every covered cell centre."""
    tcols = int(np.ceil((grid.east - grid.west) / tile_deg))
    trows = int(np.ceil((grid.north - grid.south) / tile_deg))

    def to_tiles(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        frames = []
        for dtx in (-1, 0, 1):
            for dty in (-1, 0, 1):
                # home tile, then replicate to neighbours when within buffer
                tc = np.floor((x - grid.west) / tile_deg).astype(np.int64) + dtx
                tr = np.floor((grid.north - y) / tile_deg).astype(np.int64) + dty
                ok = (tc >= 0) & (tc < tcols) & (tr >= 0) & (tr < trows)
                if dtx != 0:
                    edge = grid.west + (tc + (1 if dtx == -1 else 0)) * tile_deg
                    ok &= np.abs(x - edge) <= buffer
                if dty != 0:
                    edge = grid.north - (tr + (1 if dty == -1 else 0)) * tile_deg
                    ok &= np.abs(y - edge) <= buffer
                if not ok.any():
                    continue
                frames.append(pd.DataFrame({
                    "tin_tile": tr[ok] * tcols + tc[ok],
                    "x": x[ok], "y": y[ok],
                    "value": df[value_col].to_numpy(np.float64)[ok],
                    "seq": df[seq_col].to_numpy(np.int64)[ok],
                }))
        return pd.concat(frames) if frames else pd.DataFrame(
            columns=["tin_tile", "x", "y", "value", "seq"])

    tiled = points_ds.map_batches(to_tiles, batch_format="pandas")

    def triangulate_tile(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tin_tile"].iloc[0])
        tr, tc = tid // tcols, tid % tcols
        # dedup coincident points: keep lowest seq (reference coincident rule)
        g = g.sort_values("seq", kind="mergesort").drop_duplicates(["x", "y"])
        pts = g[["x", "y"]].to_numpy()
        vals = g["value"].to_numpy()
        if len(pts) < 3:
            return pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                                 "tin_value": pd.Series([], dtype=np.float64)})
        tris = delaunay(pts)
        # interior cell centres of this TIN tile
        x_lo = grid.west + tc * tile_deg
        x_hi = min(x_lo + tile_deg, grid.east)
        y_hi = grid.north - tr * tile_deg
        y_lo = max(y_hi - tile_deg, grid.south)
        c_lo = grid.col_from_x(np.array([x_lo]))[0]
        c_hi = min(grid.col_from_x(np.array([x_hi - 1e-9]))[0] + 1, grid.cols)
        r_lo = grid.row_from_y(np.array([y_hi]))[0]
        r_hi = min(grid.row_from_y(np.array([y_lo + 1e-9]))[0] + 1, grid.rows)
        rr, cc = np.meshgrid(np.arange(r_lo, r_hi), np.arange(c_lo, c_hi), indexing="ij")
        qx = grid.x_from_col(cc.ravel())
        qy = grid.y_from_row(rr.ravel())
        vals_i, hits = interpolate_linear(pts, vals, tris, qx, qy)
        cid = (rr.ravel().astype(np.int64) * grid.cols + cc.ravel().astype(np.int64))[hits]
        return pd.DataFrame({"cell_id": cid, "tin_value": vals_i[hits]})

    return tiled.groupby("tin_tile").map_groups(triangulate_tile, batch_format="pandas")


def natural_neighbour_grid(points_ds, grid: GridSpec, *, tile_deg: float = 30.0,
                           buffer: float = 6.0, x_col="x", y_col="y",
                           value_col="value", seq_col="event_id"):
    """Natural-neighbour gridding (gis_analysis/natural_neighbour_
    interpolation.rs; Laplace-weight variant, functions/delaunay
    .natural_neighbour) — identical tile+halo sharding to tin_grid.
    Output: cell_id, nn_value for every cell whose Bowyer–Watson cavity is
    fully real (interior of the local hull)."""
    from ..functions.delaunay import natural_neighbour

    tcols = int(np.ceil((grid.east - grid.west) / tile_deg))
    trows = int(np.ceil((grid.north - grid.south) / tile_deg))

    def to_tiles(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        frames = []
        for dtx in (-1, 0, 1):
            for dty in (-1, 0, 1):
                tc = np.floor((x - grid.west) / tile_deg).astype(np.int64) + dtx
                tr = np.floor((grid.north - y) / tile_deg).astype(np.int64) + dty
                ok = (tc >= 0) & (tc < tcols) & (tr >= 0) & (tr < trows)
                if dtx != 0:
                    edge = grid.west + (tc + (1 if dtx == -1 else 0)) * tile_deg
                    ok &= np.abs(x - edge) <= buffer
                if dty != 0:
                    edge = grid.north - (tr + (1 if dty == -1 else 0)) * tile_deg
                    ok &= np.abs(y - edge) <= buffer
                if not ok.any():
                    continue
                frames.append(pd.DataFrame({
                    "tin_tile": tr[ok] * tcols + tc[ok],
                    "x": x[ok], "y": y[ok],
                    "value": df[value_col].to_numpy(np.float64)[ok],
                    "seq": df[seq_col].to_numpy(np.int64)[ok],
                }))
        return pd.concat(frames) if frames else pd.DataFrame(
            columns=["tin_tile", "x", "y", "value", "seq"])

    tiled = points_ds.map_batches(to_tiles, batch_format="pandas")

    def interp_tile(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tin_tile"].iloc[0])
        tr, tc = tid // tcols, tid % tcols
        g = g.sort_values("seq", kind="mergesort").drop_duplicates(["x", "y"])
        pts = g[["x", "y"]].to_numpy()
        vals = g["value"].to_numpy()
        empty = pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                              "nn_value": pd.Series([], dtype=np.float64)})
        if len(pts) < 3:
            return empty
        tris = delaunay(pts)
        x_lo = grid.west + tc * tile_deg
        x_hi = min(x_lo + tile_deg, grid.east)
        y_hi = grid.north - tr * tile_deg
        y_lo = max(y_hi - tile_deg, grid.south)
        c_lo = grid.col_from_x(np.array([x_lo]))[0]
        c_hi = min(grid.col_from_x(np.array([x_hi - 1e-9]))[0] + 1, grid.cols)
        r_lo = grid.row_from_y(np.array([y_hi]))[0]
        r_hi = min(grid.row_from_y(np.array([y_lo + 1e-9]))[0] + 1, grid.rows)
        rr, cc = np.meshgrid(np.arange(r_lo, r_hi), np.arange(c_lo, c_hi), indexing="ij")
        qx = grid.x_from_col(cc.ravel())
        qy = grid.y_from_row(rr.ravel())
        vals_i, hits = natural_neighbour(pts, vals, tris, qx, qy)
        cid = (rr.ravel().astype(np.int64) * grid.cols + cc.ravel().astype(np.int64))[hits]
        return pd.DataFrame({"cell_id": cid, "nn_value": vals_i[hits]})

    return tiled.groupby("tin_tile").map_groups(interp_tile, batch_format="pandas")
