"""Terrain sweep #8: SlopeVsElevationPlot, FillMissingData,
HypsometricallyTintedHillshade.

SlopeVsElevationPlot bins the micro-degree Horn slopes (exact integers on
both engines) against elevation bins — pure integer counts. The
hypsometric tint needs no libm at run time (the light vector is a Python
constant embedded in the SQL; the elevation palette is an integer
lookup), so its RGB channels are exact. FillMissingData's IDW weights are
rationals of integer squared distances; the window accumulation order
differs between engines, so the filled value is emitted micro-rounded
(guard band).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols

_SAR_DX = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
_SAR_DY = (-1, -1, -1, 0, 0, 0, 1, 1, 1)


def _horn_pq_sql() -> str:
    joins = " ".join(
        f"JOIN cells n{k} ON n{k}.r = a.r + ({_SAR_DY[k]}) "
        f"AND n{k}.c = a.c + ({_SAR_DX[k]})"
        for k in range(9) if k != 4)
    p = ("(CAST((n2.v + 2 * n5.v + n8.v) - (n0.v + 2 * n3.v + n6.v) "
         "AS DOUBLE) / 8.0)")
    q = ("(CAST((n6.v + 2 * n7.v + n8.v) - (n0.v + 2 * n1.v + n2.v) "
         "AS DOUBLE) / 8.0)")
    return f"""
    pq AS (
      SELECT a.cell_id, a.v, {p} AS p, {q} AS q
      FROM cells a {joins}
    )"""


def _horn_pq(padded, nr, nc):
    zs = [padded[1 + _SAR_DY[k]:1 + _SAR_DY[k] + nr,
                 1 + _SAR_DX[k]:1 + _SAR_DX[k] + nc] for k in range(9)]
    p = ((zs[2] + 2 * zs[5] + zs[8]) - (zs[0] + 2 * zs[3] + zs[6])) / 8.0
    q = ((zs[6] + 2 * zs[7] + zs[8]) - (zs[0] + 2 * zs[1] + zs[2])) / 8.0
    return p, q


# --------------------------------------------------------------------------
# SlopeVsElevationPlot (terrain_analysis/slope_vs_elev_plot.rs): the
# plot's 2-D table — slope degree bins x 100-unit elevation bins.
# --------------------------------------------------------------------------
@query(
    "slope_vs_elev_plot",
    f"""
    WITH {_CELLS_CTE},
    {_horn_pq_sql()},
    sm AS (
      SELECT v // 100 AS ebin,
             CAST(floor(degrees(atan(sqrt(p * p + q * q))) * 1e4 + 0.5)
                  AS BIGINT) // 10000 AS sbin
      FROM pq
    )
    SELECT CAST(ebin AS BIGINT) AS ebin, CAST(sbin AS BIGINT) AS sbin,
           COUNT(*) AS n
    FROM sm GROUP BY ebin, sbin
    """,
)
def slope_vs_elev_plot(sf_dir: str):
    from ..relational import partial_agg
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        p, q = _horn_pq(padded, nr, nc)
        slope = np.degrees(np.arctan(np.sqrt(p * p + q * q)))
        sm = np.floor(slope * 1e4 + 0.5)
        return {"ebin": np.floor(z / 100.0), "sbin": sm // 10000}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    cellsd = stencil_3x3(tiles, GRID1, kern)

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        ok = ~df["sbin"].isna()
        return pd.DataFrame({
            "ebin": df.loc[ok, "ebin"].to_numpy(np.int64),
            "sbin": df.loc[ok, "sbin"].to_numpy(np.int64),
            "n": np.ones(int(ok.sum()), np.int64)})

    return partial_agg(cellsd.map_batches(rows, batch_format="pandas"),
                       ["ebin", "sbin"], [("n", "sum", "n")])


# --------------------------------------------------------------------------
# FillMissingData (terrain_analysis/fill_missing_data.rs): holes (cells
# with splitmix-deterministic nodata) take the IDW (power 2) of the valid
# cells in their 11x11 window. Micro-rounded output (window sum order).
# --------------------------------------------------------------------------
_HOLE_MOD = 89


def _fmd_sql() -> str:
    arms = " UNION ALL ".join(
        f"SELECT a.cell_id, b.v, "
        f"CAST({dr * dr + dc * dc} AS DOUBLE) AS d2 "
        f"FROM holes a JOIN cells b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc}) "
        f"WHERE (b.cell_id * 104729) % {_HOLE_MOD} <> 0"
        for dr in range(-5, 6) for dc in range(-5, 6)
        if not (dr == 0 and dc == 0))
    return f"""
    WITH {_CELLS_CTE},
    holes AS (SELECT cell_id, r, c FROM cells
              WHERE (cell_id * 104729) % {_HOLE_MOD} = 0),
    w AS ({arms})
    SELECT cell_id,
           CAST(floor(SUM(CAST(v AS DOUBLE) / d2) / SUM(1.0 / d2) * 1e6
                      + 0.5) AS BIGINT) AS fill_micro
    FROM w GROUP BY cell_id
    """


@query("fill_missing_data", _fmd_sql())
def fill_missing_data(sf_dir: str):
    from ..stages.raster import synth_raster_tiles, window_exchange

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        k = 5
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cid = rr.astype(np.int64) * _COLS + cc.astype(np.int64)
        hole = (cid * 104729) % _HOLE_MOD == 0
        num = np.zeros((nr, nc))
        den = np.zeros((nr, nc))
        for dr in range(-5, 6):
            for dc in range(-5, 6):
                if dr == 0 and dc == 0:
                    continue
                w = padded[k + dr:k + dr + nr, k + dc:k + dc + nc]
                nid = cid + dr * _COLS + dc
                valid = ~np.isnan(w) & ((nid * 104729) % _HOLE_MOD != 0)
                d2 = float(dr * dr + dc * dc)
                num += np.where(valid, w / d2, 0.0)
                den += np.where(valid, 1.0 / d2, 0.0)
        with np.errstate(invalid="ignore"):
            fill = num / den
        keep = hole & (den > 0)
        return pd.DataFrame({
            "cell_id": cid[keep].ravel(),
            "fill_micro": np.floor(fill[keep] * 1e6 + 0.5)
            .astype(np.int64).ravel()})

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=5)


# --------------------------------------------------------------------------
# HypsometricallyTintedHillshade (terrain_analysis/
# hypsometrically_tinted_hillshade.rs): elevation-band palette modulated
# by the surface-normal hillshade — all integer at run time (light-vector
# constants are Python literals; palette is a 10-entry table).
# --------------------------------------------------------------------------
_AZ, _ALT = np.radians(315.0), np.radians(30.0)
_LX = float(np.sin(_AZ) * np.cos(_ALT))
_LY = float(np.cos(_AZ) * np.cos(_ALT))
_LZ = float(np.sin(_ALT))

_PALETTE = [(38, 115, 0), (86, 148, 0), (140, 184, 0), (200, 215, 75),
            (237, 222, 131), (222, 176, 105), (204, 130, 74),
            (186, 88, 49), (160, 60, 34), (134, 37, 23)]


def _hth_sql() -> str:
    joins = " ".join(
        f"JOIN cells n{k} ON n{k}.r = a.r + ({_SAR_DY[k]}) "
        f"AND n{k}.c = a.c + ({_SAR_DX[k]})"
        for k in range(9) if k != 4)
    p = ("(CAST((n2.v + 2 * n5.v + n8.v) - (n0.v + 2 * n3.v + n6.v) "
         "AS DOUBLE) / 8.0)")
    q = ("(CAST((n6.v + 2 * n7.v + n8.v) - (n0.v + 2 * n1.v + n2.v) "
         "AS DOUBLE) / 8.0)")
    ln = "sqrt(p * p + q * q + 1.0)"
    hs = (f"floor(255.0 * greatest((-p / {ln}) * {_LX!r} "
          f"+ (-q / {ln}) * {_LY!r} + (1.0 / {ln}) * {_LZ!r}, 0.0) + 0.5)")
    pr = "CASE " + " ".join(f"WHEN a.v // 100 = {b} THEN {rgb[0]}"
                            for b, rgb in enumerate(_PALETTE)) + " END"
    pg = "CASE " + " ".join(f"WHEN a.v // 100 = {b} THEN {rgb[1]}"
                            for b, rgb in enumerate(_PALETTE)) + " END"
    pb = "CASE " + " ".join(f"WHEN a.v // 100 = {b} THEN {rgb[2]}"
                            for b, rgb in enumerate(_PALETTE)) + " END"
    return f"""
    WITH {_CELLS_CTE},
    pq AS (
      SELECT a.cell_id, a.v, {p} AS p, {q} AS q
      FROM cells a {joins}
    ),
    hsx AS (SELECT cell_id, v, CAST({hs} AS BIGINT) AS hs FROM pq)
    SELECT cell_id,
           CAST(({pr.replace('a.v', 'v')}) * hs // 255 AS BIGINT) AS red,
           CAST(({pg.replace('a.v', 'v')}) * hs // 255 AS BIGINT) AS green,
           CAST(({pb.replace('a.v', 'v')}) * hs // 255 AS BIGINT) AS blue
    FROM hsx
    """


@query("hypsometrically_tinted_hillshade", _hth_sql())
def hypsometrically_tinted_hillshade(sf_dir: str):
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    pal = np.array(_PALETTE, np.int64)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        p, q = _horn_pq(padded, nr, nc)
        ln = np.sqrt(p * p + q * q + 1.0)
        dot = (-p / ln) * _LX + (-q / ln) * _LY + (1.0 / ln) * _LZ
        hs = np.floor(255.0 * np.maximum(dot, 0.0) + 0.5)
        b = np.clip(np.where(np.isnan(z), 0.0, z // 100.0), 0, 9) \
            .astype(np.int64)
        ok = ~np.isnan(hs)
        hsv = np.where(ok, hs, 0).astype(np.int64)
        return {"red": np.where(ok, pal[b, 0] * hsv // 255, np.nan),
                "green": np.where(ok, pal[b, 1] * hsv // 255, np.nan),
                "blue": np.where(ok, pal[b, 2] * hsv // 255, np.nan)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    out = stencil_3x3(tiles, GRID1, kern)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[~df["red"].isna(), "cell_id"]
            .to_numpy(np.int64),
            "red": df.loc[~df["red"].isna(), "red"].to_numpy(np.int64),
            "green": df.loc[~df["red"].isna(), "green"].to_numpy(np.int64),
            "blue": df.loc[~df["red"].isna(), "blue"].to_numpy(np.int64)}),
        batch_format="pandas")