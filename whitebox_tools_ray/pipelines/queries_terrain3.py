"""Terrain sweep #3 — ridge detection, the up/downslope elevation-change
family, pit-relative and watershed-relative elevation, directional relief
and fetch (east azimuth), and the Lindsay multiscale DEVmax / DIFFmax
pair. All SQL-exact.

Float contracts:
  * slope argmax ties (cardinal dz/1 vs diagonal dz/sqrt2) can only occur
    at 0/0 flats; both sides break ties by ascending neighbour index;
  * fetch's height increment is 1/16 so the line test is pure integer
    (16*v_j >= 16*v_c + (j - c));
  * DEVmax replicates the reference's integral-image edge clamp quirk
    (max_elev_deviation.rs:397-428: windows at the top/left edges EXCLUDE
    row 0 / column 0) and evaluates mean/variance/deviation with the same
    float expression tree in numpy and DuckDB — sums are integers, so the
    divisions and sqrt are correctly rounded identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hydrodefs import _GRAPH_CTES, _WALK_UNITS_CTE, _d8_pointer
from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)
_DIAG = float(np.sqrt(2.0))
_LENS = [_DIAG, 1.0] * 4


# --------------------------------------------------------------------------
# FindRidges (terrain_analysis/find_ridges.rs:225-244, line_thin=false):
# ridge cells have both N+S neighbours lower OR both W+E neighbours lower.
# --------------------------------------------------------------------------
@query(
    "find_ridges",
    f"""
    WITH {_CELLS_CTE}
    SELECT cell_id, CAST(1 AS BIGINT) AS ridge FROM (
      SELECT a.cell_id FROM cells a
      JOIN cells n ON n.r = a.r - 1 AND n.c = a.c
      JOIN cells s ON s.r = a.r + 1 AND s.c = a.c
      WHERE n.v < a.v AND s.v < a.v
      UNION
      SELECT a.cell_id FROM cells a
      JOIN cells w ON w.r = a.r AND w.c = a.c - 1
      JOIN cells e ON e.r = a.r AND e.c = a.c + 1
      WHERE w.v < a.v AND e.v < a.v
    )
    """,
)
def find_ridges(sf_dir: str):
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]

        def sh(dr, dc):
            return padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]

        ns = (sh(-1, 0) < z) & (sh(1, 0) < z)
        we = (sh(0, -1) < z) & (sh(0, 1) < z)
        return {"ridge": (ns | we).astype(np.float64)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[df["ridge"] > 0, "cell_id"].to_numpy(np.int64),
            "ridge": np.ones(int((df["ridge"] > 0).sum()), np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# Max/MinDownslopeElevChange + MaxUpslopeElevChange (terrain_analysis/
# {max,min}_downslope_elev_change.rs, max_upslope_elev_change.rs): the
# z-change of the steepest / gentlest qualifying neighbour (slope compare,
# strict first-wins in D8 order). Rows only where a qualifying neighbour
# exists (reference nodata elsewhere).
# --------------------------------------------------------------------------
def _elev_change_sql(cond: str, dz: str, slope_num: str, order: str,
                     out: str) -> str:
    arms = " UNION ALL ".join(
        f"SELECT a.cell_id, {i} AS i, ({dz}) AS dz, "
        f"(CAST({slope_num} AS DOUBLE) / {_LENS[i]!r}) AS slope "
        f"FROM cells a JOIN cells b "
        f"ON b.r = a.r + ({_DY[i]}) AND b.c = a.c + ({_DX[i]}) "
        f"WHERE {cond}"
        for i in range(8))
    return f"""
    WITH {_CELLS_CTE},
    arms AS ({arms})
    SELECT cell_id, CAST(dz AS BIGINT) AS {out}
    FROM arms
    QUALIFY row_number() OVER (PARTITION BY cell_id
                               ORDER BY slope {order}, i ASC) = 1
    """


def _elev_change_query(sf_dir, select, value, extreme, out):
    from ..stages.raster import stencil_k, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded[1:nr + 1, 1:nc + 1]
        best = np.full((nr, nc), np.inf if extreme == "min" else -np.inf)
        dz = np.full((nr, nc), np.nan)
        for i in range(8):
            zn = padded[1 + _DY[i]:1 + _DY[i] + nr, 1 + _DX[i]:1 + _DX[i] + nc]
            ok = ~np.isnan(zn) & select(z, zn)
            s = value(z, zn) / _LENS[i]
            better = ok & ((s < best) if extreme == "min" else (s > best))
            best = np.where(better, s, best)
            dz = np.where(better, value(z, zn), dz)
        return {"out": dz}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    res = stencil_k(tiles, GRID1, kern, k=1)
    return res.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[~df["out"].isna(), "cell_id"].to_numpy(np.int64),
            out: df.loc[~df["out"].isna(), "out"].to_numpy(np.int64)}),
        batch_format="pandas")


@query("max_downslope_elev_change",
       _elev_change_sql("b.v < a.v", "a.v - b.v", "a.v - b.v", "DESC",
                        "max_z_change"))
def max_downslope_elev_change(sf_dir: str):
    return _elev_change_query(sf_dir, lambda z, zn: zn < z,
                              lambda z, zn: z - zn, "max", "max_z_change")


@query("min_downslope_elev_change",
       _elev_change_sql("b.v <= a.v", "a.v - b.v", "a.v - b.v", "ASC",
                        "min_z_change"))
def min_downslope_elev_change(sf_dir: str):
    """Reference quirk: slope >= 0 qualifies, so FLAT neighbours (dz = 0)
    participate (min_downslope_elev_change.rs kernel)."""
    return _elev_change_query(sf_dir, lambda z, zn: zn <= z,
                              lambda z, zn: z - zn, "min", "min_z_change")


@query("max_upslope_elev_change",
       _elev_change_sql("b.v > a.v", "b.v - a.v", "b.v - a.v", "DESC",
                        "max_z_change"))
def max_upslope_elev_change(sf_dir: str):
    return _elev_change_query(sf_dir, lambda z, zn: zn > z,
                              lambda z, zn: zn - z, "max", "max_z_change")


# --------------------------------------------------------------------------
# ElevAbovePit (terrain_analysis/elev_above_pit.rs): z minus the elevation
# of the terminal cell of the cell's D8 path (pit or edge outlet) — the
# basins labelling composed with the synthetic elevation formula.
# --------------------------------------------------------------------------
@query(
    "elev_above_pit",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE},
    term AS (
      SELECT w.start, w.cur AS pit
      FROM walku w JOIN graph g ON g.cell_id = w.cur AND g.down_id < 0
    )
    SELECT start AS cell_id,
           CAST((start * 1000003) % 1000 - (pit * 1000003) % 1000
                AS BIGINT) AS eap
    FROM term
    """,
)
def elev_above_pit(sf_dir: str):
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import basins_pregel

    b = basins_pregel(down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        pit = df["basin"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": cid,
            "eap": _value_fn(cid).astype(np.int64)
            - _value_fn(pit).astype(np.int64)})

    return b.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# ElevRelativeToWatershedMinMax (terrain_analysis/
# elev_relative_to_watershed_min_max.rs): (z - zmin) / (zmax - zmin) within
# the cell's basin; rows only where the basin has relief (reference nodata
# when zmax == zmin).
# --------------------------------------------------------------------------
@query(
    "elev_rel_watershed_minmax",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE},
    term AS (
      SELECT w.start, w.cur AS basin
      FROM walku w JOIN graph g ON g.cell_id = w.cur AND g.down_id < 0
    ),
    ext AS (
      SELECT basin, MIN((start * 1000003) % 1000) AS zmin,
             MAX((start * 1000003) % 1000) AS zmax
      FROM term GROUP BY basin
    )
    SELECT t.start AS cell_id,
           CAST((t.start * 1000003) % 1000 - e.zmin AS DOUBLE)
           / CAST(e.zmax - e.zmin AS DOUBLE) AS z_rel
    FROM term t JOIN ext e ON e.basin = t.basin
    WHERE e.zmax > e.zmin
    """,
)
def elev_rel_watershed_minmax(sf_dir: str):
    from ..relational import partial_agg
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import basins_pregel

    b = basins_pregel(down_ds_from_pointer(_d8_pointer(sf_dir), GRID1),
                      GRID1).materialize()

    def withv(df: pd.DataFrame) -> pd.DataFrame:
        v = _value_fn(df["cell_id"].to_numpy(np.int64)).astype(np.int64)
        return pd.DataFrame({"basin": df["basin"].to_numpy(np.int64),
                             "vmin": v, "vmax": v})

    ext = partial_agg(b.map_batches(withv, batch_format="pandas"),
                      ["basin"], [("vmin", "min", "vmin"),
                                  ("vmax", "max", "vmax")])
    j = b.join(ext, join_type="inner", num_partitions=8, on=("basin",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        v = _value_fn(cid).astype(np.int64)
        lo = df["vmin"].to_numpy(np.int64)
        hi = df["vmax"].to_numpy(np.int64)
        keep = hi > lo
        return pd.DataFrame({
            "cell_id": cid[keep],
            "z_rel": (v[keep] - lo[keep]).astype(np.float64)
            / (hi[keep] - lo[keep]).astype(np.float64)})

    return j.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# DirectionalRelief (terrain_analysis/directional_relief.rs:327-426,
# azimuth = 90 / east): mean elevation of all cells on the sight line to
# the grid edge minus z. Exchange-free: each row is generated and swept in
# one task (the synthetic surface is a cell-id formula).
# --------------------------------------------------------------------------
@query(
    "directional_relief_east",
    f"""
    WITH {_CELLS_CTE}
    SELECT cell_id,
           CAST(SUM(v) OVER w AS DOUBLE) / COUNT(v) OVER w
           - CAST(v AS DOUBLE) AS relief
    FROM cells
    WINDOW w AS (PARTITION BY r ORDER BY c
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    QUALIFY c < {_COLS - 1}
    """,
)
def directional_relief_east(sf_dir: str):
    import ray.data

    def row_sweep(batch: dict) -> pd.DataFrame:
        frames = []
        for r in batch["id"]:
            cid = np.int64(r) * _COLS + np.arange(_COLS, dtype=np.int64)
            v = _value_fn(cid).astype(np.int64)
            # suffix sums of strictly-east cells
            sfx = np.cumsum(v[::-1])[::-1] - v
            cnt = _COLS - 1 - np.arange(_COLS)
            keep = cnt > 0
            frames.append(pd.DataFrame({
                "cell_id": cid[keep],
                "relief": sfx[keep].astype(np.float64) / cnt[keep]
                - v[keep].astype(np.float64)}))
        return pd.concat(frames, ignore_index=True)

    rows = ray.data.range(_ROWS, override_num_blocks=8)
    return rows.map_batches(row_sweep, batch_format="numpy")


# --------------------------------------------------------------------------
# FetchAnalysis (terrain_analysis/fetch_analysis.rs, azimuth = 90 / east,
# height increment 1/16): distance in cells to the first east cell whose
# elevation meets v_j >= v_c + (j - c)/16 — integer test 16*v_j >= 16*v_c
# + (j - c); when no cell qualifies the reference emits the negated
# traversal distance (here -(cols-1-c)).
# --------------------------------------------------------------------------
@query(
    "fetch_analysis_east",
    f"""
    WITH {_CELLS_CTE},
    hit AS (
      SELECT a.cell_id, MIN(b.c - a.c) AS fetch
      FROM cells a JOIN cells b
        ON b.r = a.r AND b.c > a.c AND 16 * b.v >= 16 * a.v + (b.c - a.c)
      GROUP BY a.cell_id
    )
    SELECT c.cell_id,
           CAST(COALESCE(h.fetch, -({_COLS - 1} - c.c)) AS BIGINT) AS fetch
    FROM cells c LEFT JOIN hit h ON h.cell_id = c.cell_id
    WHERE c.c < {_COLS - 1}
    """,
)
def fetch_analysis_east(sf_dir: str):
    import ray.data

    def row_sweep(batch: dict) -> pd.DataFrame:
        frames = []
        for r in batch["id"]:
            cid = np.int64(r) * _COLS + np.arange(_COLS, dtype=np.int64)
            v16 = 16 * _value_fn(cid).astype(np.int64)
            fetch = np.empty(_COLS, np.int64)
            for c in range(_COLS - 1):
                d = np.arange(1, _COLS - c, dtype=np.int64)
                ok = v16[c + 1:] >= v16[c] + d
                hits = np.flatnonzero(ok)
                fetch[c] = (hits[0] + 1) if len(hits) else -(_COLS - 1 - c)
            frames.append(pd.DataFrame({"cell_id": cid[:-1],
                                        "fetch": fetch[:-1]}))
        return pd.concat(frames, ignore_index=True)

    rows = ray.data.range(_ROWS, override_num_blocks=8)
    return rows.map_batches(row_sweep, batch_format="numpy")


# --------------------------------------------------------------------------
# MaxElevDeviation + MaxDifferenceFromMean (terrain_analysis/
# {max_elev_deviation,max_diff_from_mean}.rs): DEV = (z - mean)/sd and
# DIFF = z - mean over window scales 3/5/7, keeping the value whose
# magnitude is largest (strict >, so the SMALLEST qualifying scale wins
# ties). Windows replicate the reference's integral clamp quirk.
# --------------------------------------------------------------------------
_SCALES = (1, 2, 3)  # midpoints -> 3x3, 5x5, 7x7


from ..rasterdefs import _devmax_scale_cte  # noqa: E402


def _devmax_sql(use_sd: bool, out: str) -> str:
    ctes = ",".join(_devmax_scale_cte(m) for m in _SCALES)
    if use_sd:
        val = ("(CAST(z AS DOUBLE) - CAST(s AS DOUBLE) / n) / "
               "sqrt((CAST(ss AS DOUBLE) - (CAST(s AS DOUBLE) "
               "* CAST(s AS DOUBLE)) / n) / n)")
        guard = ("WHERE (CAST(ss AS DOUBLE) - (CAST(s AS DOUBLE) "
                 "* CAST(s AS DOUBLE)) / n) / n > 0")
    else:
        val = "CAST(z AS DOUBLE) - CAST(s AS DOUBLE) / n"
        guard = ""
    arms = " UNION ALL ".join(
        f"SELECT cell_id, CAST({2 * m + 1} AS BIGINT) AS scale, {val} AS val "
        f"FROM s{m} {guard}" for m in _SCALES)
    return f"""
    WITH {_CELLS_CTE},
    {ctes},
    sv AS ({arms})
    SELECT cell_id, val AS {out}, scale
    FROM sv
    QUALIFY row_number() OVER (PARTITION BY cell_id
                               ORDER BY abs(val) DESC, scale ASC) = 1
    """


def _devmax_impl(use_sd: bool, out: str):
    from ..stages.raster import synth_raster_tiles, window_exchange

    kmax = max(_SCALES)

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        k = kmax
        z = padded[k:k + nr, k:k + nc]
        r = np.arange(r0, r0 + nr, dtype=np.int64)[:, None] \
            + np.zeros((1, nc), np.int64)
        c = np.arange(c0, c0 + nc, dtype=np.int64)[None, :] \
            + np.zeros((nr, 1), np.int64)
        best = np.full((nr, nc), -1.0)     # |val| so far (>= 0 when set)
        val = np.full((nr, nc), np.nan)
        scl = np.zeros((nr, nc), np.int64)
        for mid in _SCALES:
            lo_r = np.maximum(r - mid - 1, 0) + 1
            lo_c = np.maximum(c - mid - 1, 0) + 1
            n = np.zeros((nr, nc), np.int64)
            s = np.zeros((nr, nc), np.int64)
            ss = np.zeros((nr, nc), np.int64)
            for dr in range(-mid, mid + 1):
                for dc in range(-mid, mid + 1):
                    rr, cc = r + dr, c + dc
                    m = (rr >= lo_r) & (rr <= _ROWS - 1) & (rr >= 0) \
                        & (cc >= lo_c) & (cc <= _COLS - 1) & (cc >= 0)
                    w = padded[k + dr:k + dr + nr, k + dc:k + dc + nc]
                    wi = np.where(m, w, 0.0).astype(np.int64)
                    n += m.astype(np.int64)
                    s += wi
                    ss += wi * wi
            nf = n.astype(np.float64)
            mean = s.astype(np.float64) / nf
            if use_sd:
                var = (ss.astype(np.float64)
                       - (s.astype(np.float64) * s.astype(np.float64)) / nf) / nf
                ok = var > 0
                with np.errstate(invalid="ignore"):
                    v = (z - mean) / np.sqrt(np.where(ok, var, 1.0))
            else:
                ok = n > 0
                v = z - mean
            better = ok & (np.abs(v) > best)
            best = np.where(better, np.abs(v), best)
            val = np.where(better, v, val)
            scl = np.where(better, 2 * mid + 1, scl)
        cid = r * _COLS + c
        keep = best >= 0
        return pd.DataFrame({"cell_id": cid[keep].ravel(),
                             out: val[keep].ravel(),
                             "scale": scl[keep].ravel()})

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=kmax)


@query("max_elev_deviation", _devmax_sql(True, "devmax"))
def max_elev_deviation(sf_dir: str):
    """DEVmax (Lindsay et al. 2015): ONE k=3 halo exchange evaluates all
    three scales (the wider scales reuse the same padded window)."""
    return _devmax_impl(True, "devmax")


@query("max_diff_from_mean", _devmax_sql(False, "diffmax"))
def max_diff_from_mean(sf_dir: str):
    return _devmax_impl(False, "diffmax")
