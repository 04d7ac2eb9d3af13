"""Shared hex-lattice fixture (leaf module: imported by queries_spatial
AND queries_data3 — a cross-pipelines from-import breaks worker
deserialization through the pipelines.queries import cycle)."""

from __future__ import annotations

import numpy as np

from .grid import hex_centers, hex_size_from_width

HEX_WIDTH = 12.0


def _hex_layout():
    return hex_centers(-180.0, -85.0, 180.0, 85.0, HEX_WIDTH)


def _hex_cte() -> str:
    # embed the exact row-spacing literal so SQL and numpy share every bit;
    # nrows/ncols formulas identical to grid.hex_centers
    s = hex_size_from_width(HEX_WIDTH)
    vert = 1.5 * s
    nrows = int(np.ceil((85.0 - (-85.0)) / vert)) + 2
    ncols = int(np.ceil((180.0 - (-180.0)) / HEX_WIDTH)) + 2
    return (
        f"hexes AS (SELECT CAST(t.i AS BIGINT) AS hex_id, "
        f"(-180.0 + CAST(t.i % {ncols} AS DOUBLE) * {HEX_WIDTH!r} + "
        f"CASE WHEN (t.i // {ncols}) % 2 = 1 THEN {HEX_WIDTH / 2.0!r} ELSE 0.0 END) AS hx, "
        f"(-85.0 + CAST(t.i // {ncols} AS DOUBLE) * {vert!r}) AS hy "
        f"FROM range({nrows * ncols}) t(i))"
    )
