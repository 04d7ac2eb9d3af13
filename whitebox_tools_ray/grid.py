"""Grid / tile / hex codecs with bit-exact parity to the reference transforms.

Reference semantics (whitebox-raster/src/lib.rs:728-749):
    get_x_from_column = west + res_x/2 + col*res_x
    get_y_from_row    = north - res_y/2 - row*res_y
    get_column_from_x = floor((x - west) / res_x)
    get_row_from_y    = floor((north - y) / res_y)

All kernels are pure numpy over float64 so N-CPU and 4N-CPU runs produce
identical cell/tile assignments (the north-rule invariant). NoData keeps the
reference sentinel -32768 (lib.rs:1304).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

NODATA = -32768.0


@dataclass(frozen=True)
class GridSpec:
    """Georeferencing + schema of a raster grid (RasterConfigs analog,
    whitebox-raster/src/lib.rs:1260-1320)."""

    west: float
    north: float
    res_x: float
    res_y: float
    rows: int
    cols: int
    nodata: float = NODATA
    # tile edge length in cells for the tile-aligned Arrow layout
    tile_size: int = 256

    @property
    def south(self) -> float:
        return self.north - self.rows * self.res_y

    @property
    def east(self) -> float:
        return self.west + self.cols * self.res_x

    # --- world -> grid (floor arithmetic, lib.rs:743-749) ---
    def col_from_x(self, x: np.ndarray) -> np.ndarray:
        return np.floor((np.asarray(x, np.float64) - self.west) / self.res_x).astype(np.int64)

    def row_from_y(self, y: np.ndarray) -> np.ndarray:
        return np.floor((self.north - np.asarray(y, np.float64)) / self.res_y).astype(np.int64)

    # --- grid -> world cell centres (lib.rs:728-741) ---
    def x_from_col(self, col: np.ndarray) -> np.ndarray:
        return self.west + self.res_x / 2.0 + np.asarray(col, np.float64) * self.res_x

    def y_from_row(self, row: np.ndarray) -> np.ndarray:
        return self.north - self.res_y / 2.0 - np.asarray(row, np.float64) * self.res_y

    def cell_id(self, row: np.ndarray, col: np.ndarray) -> np.ndarray:
        """Flat row-major cell index (lib.rs:102-103: idx = row*columns + col)."""
        return np.asarray(row, np.int64) * self.cols + np.asarray(col, np.int64)

    def cell_id_from_xy(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return self.cell_id(self.row_from_y(y), self.col_from_x(x))

    def in_bounds(self, row: np.ndarray, col: np.ndarray) -> np.ndarray:
        return (row >= 0) & (row < self.rows) & (col >= 0) & (col < self.cols)

    # --- tiling (LidarTile analog, lidar_analysis/lidar_tile.rs:315-325) ---
    @property
    def tile_cols(self) -> int:
        return -(-self.cols // self.tile_size)

    @property
    def tile_rows(self) -> int:
        return -(-self.rows // self.tile_size)

    def tile_id(self, row: np.ndarray, col: np.ndarray) -> np.ndarray:
        """tile = trow * tile_cols + tcol — same row-major convention as cells."""
        trow = np.asarray(row, np.int64) // self.tile_size
        tcol = np.asarray(col, np.int64) // self.tile_size
        return trow * self.tile_cols + tcol

    def tile_id_from_xy(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return self.tile_id(self.row_from_y(y), self.col_from_x(x))


def hex_size_from_width(width: float) -> float:
    """Hex circumradius s from cell width w: s = w / (2*cos(pi/6))
    (gis_analysis/vector_hex_bin.rs:281-282)."""
    return width / (2.0 * np.cos(np.pi / 6.0))


def hex_centers(west: float, south: float, east: float, north: float, width: float):
    """Generate pointy-top hex centre lattice covering the extent.

    Mirrors the reference hexbin construction (vector_hex_bin.rs:166-199):
    a staggered lattice of centres; points are then assigned to their nearest
    centre (knn=1, ties -> lowest hex_id). Returns (hex_id, cx, cy) arrays.
    """
    s = hex_size_from_width(width)
    half_w = width / 2.0
    vert = 1.5 * s  # vertical spacing between rows
    nrows = int(np.ceil((north - south) / vert)) + 2
    ncols = int(np.ceil((east - west) / width)) + 2
    rows = np.repeat(np.arange(nrows, dtype=np.int64), ncols)
    cols = np.tile(np.arange(ncols, dtype=np.int64), nrows)
    cx = west + cols.astype(np.float64) * width + np.where(rows % 2 == 1, half_w, 0.0)
    cy = south + rows.astype(np.float64) * vert
    hex_id = rows * ncols + cols
    return hex_id, cx, cy
