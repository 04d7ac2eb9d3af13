"""Terrain sweep #5 — the Lindsay multiscale family: anisotropy of
elevation deviation (+ signature), DEV scale signature, the multiscale
topographic position composite, and multiscale elevation percentile.

Float contracts: every statistic is finished from INTEGER window sums
with one shared expression tree (sqrt/división correctly rounded), so
max_anisotropy_dev and the signatures are bit-exact; the MTPI logistic
passes through exp (libm) but lands on integer [0,255] channels whose
floor boundaries sit ~1e8 times farther away than the cross-library
drift (the mathops2 guard-band argument).

Windows here are FULL interior windows (no integral clamp quirk —
max_anisotropy_dev.rs:367-381 itself restricts to y1 >= 0 && y4 < rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols

_PROBES = (60 * _COLS + 100, 90 * _COLS + 200, 40 * _COLS + 300)


# --------------------------------------------------------------------------
# MaxAnisotropyDev (terrain_analysis/max_anisotropy_dev.rs:349-560), one
# scale (mid=3, middle-pane radius 1): overall DEV plus four directional
# pane DEVs (N-S, E-W, NE-SW, NW-SE 3-block diagonals); anisotropy =
# sqrt(mean of squared (pane - overall)).
# --------------------------------------------------------------------------
def _aniso_panes(mid: int, mpr: int):
    """offset -> (overall, ns, ew, nesw, nwse) membership flags."""
    flags = {}
    for dr in range(-mid, mid + 1):
        for dc in range(-mid, mid + 1):
            ns = 1 if abs(dc) <= mpr else 0
            ew = 1 if abs(dr) <= mpr else 0
            ctr = abs(dr) <= mpr and abs(dc) <= mpr
            nesw = 1 if ((-mid <= dr <= -mpr - 1 and mpr + 1 <= dc <= mid)
                         or ctr
                         or (mpr + 1 <= dr <= mid
                             and -mid <= dc <= -mpr - 1)) else 0
            nwse = 1 if ((-mid <= dr <= -mpr - 1 and -mid <= dc <= -mpr - 1)
                         or ctr
                         or (mpr + 1 <= dr <= mid
                             and mpr + 1 <= dc <= mid)) else 0
            flags[(dr, dc)] = (1, ns, ew, nesw, nwse)
    return flags


_PANE_NAMES = ("o", "ns", "ew", "nesw", "nwse")


def _aniso_sums_cte(mid: int, mpr: int, anchor_where: str = "") -> str:
    """CTE s{mid}: per anchored cell the integer (n, sum, sumsq) of the
    five panes, from per-offset equi-join arms with constant flags."""
    flags = _aniso_panes(mid, mpr)
    arms = " UNION ALL ".join(
        f"SELECT a.cell_id, a.v AS z, b.v AS w, "
        + ", ".join(f"{fl[k]} AS f_{_PANE_NAMES[k]}" for k in range(5))
        + f" FROM cells a JOIN cells b ON b.r = a.r + ({dr}) "
        f"AND b.c = a.c + ({dc}) "
        f"WHERE a.r BETWEEN {mid} AND {_ROWS - 1 - mid} "
        f"AND a.c BETWEEN {mid} AND {_COLS - 1 - mid}{anchor_where}"
        for (dr, dc), fl in flags.items())
    aggs = ", ".join(
        f"SUM(f_{p}) AS n_{p}, SUM(w * f_{p}) AS s_{p}, "
        f"SUM(w * w * f_{p}) AS ss_{p}"
        for p in _PANE_NAMES)
    return f"""
    s{mid} AS (
      SELECT cell_id, z, {aggs}
      FROM ({arms}) GROUP BY cell_id, z
    )"""


def _aniso_select(mid: int) -> str:
    """anisotropy expression over s{mid} (CASE-guarded panes)."""
    def var(p):
        return (f"((CAST(ss_{p} AS DOUBLE) - (CAST(s_{p} AS DOUBLE) "
                f"* CAST(s_{p} AS DOUBLE)) / n_{p}) / n_{p})")

    def dev(p):
        return (f"((CAST(z AS DOUBLE) - CAST(s_{p} AS DOUBLE) / n_{p}) "
                f"/ sqrt({var(p)}))")

    pane_val = {p: f"CASE WHEN n_{p} > 3 AND {var(p)} > 0.0 "
                   f"THEN ({dev(p)} - {dev('o')}) ELSE 0.0 END"
                for p in _PANE_NAMES[1:]}
    pane_ok = {p: f"CASE WHEN n_{p} > 3 AND {var(p)} > 0.0 "
                  f"THEN 1.0 ELSE 0.0 END"
               for p in _PANE_NAMES[1:]}
    nvalid = " + ".join(pane_ok.values())
    sumsq = " + ".join(f"({pane_val[p]}) * ({pane_val[p]})"
                       for p in _PANE_NAMES[1:])
    return (f"CASE WHEN n_o > 3 AND {var('o')} > 0.0 AND ({nvalid}) > 0.0 "
            f"THEN sqrt(({sumsq}) / ({nvalid})) ELSE NULL END")


@query(
    "max_anisotropy_dev",
    f"""
    WITH {_CELLS_CTE},
    {_aniso_sums_cte(3, 1)}
    SELECT cell_id, {_aniso_select(3)} AS aniso
    FROM s3
    WHERE {_aniso_select(3)} IS NOT NULL
    """,
)
def max_anisotropy_dev(sf_dir: str):
    return _aniso_impl([(3, 1)], anchors=None, out="aniso")


@query(
    "anisotropy_dev_signature",
    f"""
    WITH {_CELLS_CTE},
    {",".join(_aniso_sums_cte(m, 1, f" AND a.cell_id IN {_PROBES}")
              for m in (2, 3, 4))}
    {" UNION ALL ".join(
        f"SELECT cell_id, CAST({2 * m + 1} AS BIGINT) AS scale, "
        f"{_aniso_select(m)} AS aniso FROM s{m} "
        f"WHERE {_aniso_select(m)} IS NOT NULL" for m in (2, 3, 4))}
    """,
)
def anisotropy_dev_signature(sf_dir: str):
    """MaxAnisotropyDevSignature (terrain_analysis/
    max_anisotropy_dev_signature.rs): the anisotropy-vs-scale curve at the
    three probe cells."""
    return _aniso_impl([(m, 1) for m in (2, 3, 4)], anchors=_PROBES,
                       out="aniso", with_scale=True)


def _aniso_impl(scales, anchors, out, with_scale=False):
    from ..stages.raster import synth_raster_tiles, window_exchange

    kmax = max(m for m, _ in scales)

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        k = kmax
        z = padded[k:k + nr, k:k + nc]
        r = np.arange(r0, r0 + nr, dtype=np.int64)[:, None] \
            + np.zeros((1, nc), np.int64)
        c = np.arange(c0, c0 + nc, dtype=np.int64)[None, :] \
            + np.zeros((nr, 1), np.int64)
        cid = r * _COLS + c
        frames = []
        for mid, mpr in scales:
            flags = _aniso_panes(mid, mpr)
            n = {p: np.zeros((nr, nc), np.int64) for p in _PANE_NAMES}
            s = {p: np.zeros((nr, nc), np.int64) for p in _PANE_NAMES}
            ss = {p: np.zeros((nr, nc), np.int64) for p in _PANE_NAMES}
            for (dr, dc), fl in flags.items():
                w = padded[k + dr:k + dr + nr, k + dc:k + dc + nc]
                wi = np.where(np.isnan(w), 0, w).astype(np.int64)
                for ki, p in enumerate(_PANE_NAMES):
                    if fl[ki]:
                        n[p] += 1
                        s[p] += wi
                        ss[p] += wi * wi
            interior = (r >= mid) & (r <= _ROWS - 1 - mid) \
                & (c >= mid) & (c <= _COLS - 1 - mid)

            def var(p):
                nf = n[p].astype(np.float64)
                return (ss[p].astype(np.float64)
                        - (s[p].astype(np.float64)
                           * s[p].astype(np.float64)) / nf) / nf

            def dev(p):
                nf = n[p].astype(np.float64)
                with np.errstate(invalid="ignore", divide="ignore"):
                    return (z - s[p].astype(np.float64) / nf) \
                        / np.sqrt(var(p))

            with np.errstate(invalid="ignore", divide="ignore"):
                v_o = var("o")
                d_o = dev("o")
                sumsq = np.zeros((nr, nc))
                nvalid = np.zeros((nr, nc))
                for p in _PANE_NAMES[1:]:
                    ok = (n[p] > 3) & (var(p) > 0.0)
                    d = np.where(ok, dev(p) - d_o, 0.0)
                    sumsq = sumsq + d * d
                    nvalid = nvalid + ok.astype(np.float64)
                good = interior & (n["o"] > 3) & (v_o > 0.0) & (nvalid > 0.0)
                aniso = np.where(good, np.sqrt(
                    np.where(good, sumsq / np.where(good, nvalid, 1.0), 0.0)),
                    np.nan)
            keep = good
            if anchors is not None:
                keep = keep & np.isin(cid, np.asarray(anchors, np.int64))
            row = {"cell_id": cid[keep].ravel(), out: aniso[keep].ravel()}
            if with_scale:
                row = {"cell_id": cid[keep].ravel(),
                       "scale": np.full(int(keep.sum()), 2 * mid + 1,
                                        np.int64),
                       out: aniso[keep].ravel()}
            frames.append(pd.DataFrame(row))
        return pd.concat(frames, ignore_index=True)

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=kmax)


# --------------------------------------------------------------------------
# MaxElevDevSignature (terrain_analysis/max_elev_dev_signature.rs): the
# DEV-vs-scale curve at the probe cells, scales 3..13 (mid 1..6), full
# interior windows.
# --------------------------------------------------------------------------
def _devsig_sql() -> str:
    arms = []
    for mid in range(1, 7):
        arms.append(f"""
      SELECT a.cell_id, CAST({2 * mid + 1} AS BIGINT) AS scale, a.v AS z,
             COUNT(*) AS n, SUM(b.v) AS s, SUM(b.v * b.v) AS ss
      FROM cells a JOIN cells b
        ON b.r BETWEEN a.r - {mid} AND a.r + {mid}
       AND b.c BETWEEN a.c - {mid} AND a.c + {mid}
      WHERE a.cell_id IN {_PROBES}
      GROUP BY a.cell_id, a.v""")
    return f"""
    WITH {_CELLS_CTE},
    sig AS ({' UNION ALL '.join(arms)})
    SELECT cell_id, scale,
           (CAST(z AS DOUBLE) - CAST(s AS DOUBLE) / n)
           / sqrt((CAST(ss AS DOUBLE)
                   - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / n) / n) AS dev
    FROM sig
    WHERE (CAST(ss AS DOUBLE)
           - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / n) / n > 0
    """


@query("max_elev_dev_signature", _devsig_sql())
def max_elev_dev_signature(sf_dir: str):
    from ..stages.raster import synth_raster_tiles, window_exchange

    kmax = 6

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        z = padded[kmax:kmax + nr, kmax:kmax + nc]
        r = np.arange(r0, r0 + nr, dtype=np.int64)[:, None] \
            + np.zeros((1, nc), np.int64)
        c = np.arange(c0, c0 + nc, dtype=np.int64)[None, :] \
            + np.zeros((nr, 1), np.int64)
        cid = r * _COLS + c
        probe = np.isin(cid, np.asarray(_PROBES, np.int64))
        if not probe.any():
            return pd.DataFrame({"cell_id": [], "scale": [], "dev": []})
        frames = []
        for mid in range(1, 7):
            n = np.zeros((nr, nc), np.int64)
            s = np.zeros((nr, nc), np.int64)
            ss = np.zeros((nr, nc), np.int64)
            for dr in range(-mid, mid + 1):
                for dc in range(-mid, mid + 1):
                    w = padded[kmax + dr:kmax + dr + nr,
                               kmax + dc:kmax + dc + nc]
                    wi = np.where(np.isnan(w), 0, w).astype(np.int64)
                    n += 1
                    s += wi
                    ss += wi * wi
            nf = n.astype(np.float64)
            var = (ss.astype(np.float64)
                   - (s.astype(np.float64) * s.astype(np.float64)) / nf) / nf
            with np.errstate(invalid="ignore"):
                dev = (z - s.astype(np.float64) / nf) / np.sqrt(var)
            keep = probe & (var > 0)
            frames.append(pd.DataFrame({
                "cell_id": cid[keep].ravel(),
                "scale": np.full(int(keep.sum()), 2 * mid + 1, np.int64),
                "dev": dev[keep].ravel()}))
        return pd.concat(frames, ignore_index=True)

    tiles = synth_raster_tiles(GRID1, _value_fn)
    out = window_exchange(tiles, GRID1, window_fn, k=kmax)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].astype(np.int64),
            "scale": df["scale"].astype(np.int64),
            "dev": df["dev"].astype(np.float64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# MultiscaleTopographicPositionImage (terrain_analysis/
# multiscale_topographic_position_image.rs:378-425): channel =
# floor(512/(1 + exp(-1.2 |DEV|))) - 256, clamped to [0,255]; blue=local
# (mid 1), green=meso (max|DEV| over mid 2-3), red=broad (mid 4-5).
# --------------------------------------------------------------------------
_MTPI_SETS = {"blue": (1,), "green": (2, 3), "red": (4, 5)}
_MTPI_CUTOFF = 1.2


def _mtpi_sql() -> str:
    ctes = []
    sels = {}
    for chan, mids in _MTPI_SETS.items():
        for mid in mids:
            arms = " UNION ALL ".join(
                f"SELECT a.cell_id, a.v AS z, b.v AS w "
                f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) "
                f"AND b.c = a.c + ({dc}) "
                f"WHERE a.r BETWEEN 5 AND {_ROWS - 6} "
                f"AND a.c BETWEEN 5 AND {_COLS - 6}"
                for dr in range(-mid, mid + 1)
                for dc in range(-mid, mid + 1))
            ctes.append(f"""
    w{mid} AS (
      SELECT cell_id, z, COUNT(*) AS n, SUM(w) AS s, SUM(w * w) AS ss
      FROM ({arms}) GROUP BY cell_id, z
    ),
    d{mid} AS (
      SELECT cell_id,
             (CAST(z AS DOUBLE) - CAST(s AS DOUBLE) / n)
             / sqrt((CAST(ss AS DOUBLE)
                     - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / n) / n)
             AS dev
      FROM w{mid}
      WHERE (CAST(ss AS DOUBLE)
             - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / n) / n > 0
    )""")
        mids_devs = [f"abs(d{m}.dev)" for m in mids]
        dv = mids_devs[0] if len(mids) == 1 \
            else f"greatest({', '.join(mids_devs)})"
        sels[chan] = (f"CAST(least(greatest(floor(512.0 / (1.0 + "
                      f"exp(-{_MTPI_CUTOFF!r} * {dv}))) - 256.0, 0.0), "
                      f"255.0) AS BIGINT)")
    joins = " ".join(f"JOIN d{m} ON d{m}.cell_id = d1.cell_id"
                     for m in (2, 3, 4, 5))
    return f"""
    WITH {_CELLS_CTE},
    {','.join(ctes)}
    SELECT d1.cell_id, {sels['red']} AS red, {sels['green']} AS green,
           {sels['blue']} AS blue
    FROM d1 {joins}
    """


@query("multiscale_topographic_position_image", _mtpi_sql())
def multiscale_topographic_position_image(sf_dir: str):
    from ..stages.raster import synth_raster_tiles, window_exchange

    kmax = 5

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        z = padded[kmax:kmax + nr, kmax:kmax + nc]
        r = np.arange(r0, r0 + nr, dtype=np.int64)[:, None] \
            + np.zeros((1, nc), np.int64)
        c = np.arange(c0, c0 + nc, dtype=np.int64)[None, :] \
            + np.zeros((nr, 1), np.int64)
        cid = r * _COLS + c
        interior = (r >= 5) & (r <= _ROWS - 6) & (c >= 5) & (c <= _COLS - 6)
        devs = {}
        ok_all = interior.copy()
        for mid in (1, 2, 3, 4, 5):
            n = np.zeros((nr, nc), np.int64)
            s = np.zeros((nr, nc), np.int64)
            ss = np.zeros((nr, nc), np.int64)
            for dr in range(-mid, mid + 1):
                for dc in range(-mid, mid + 1):
                    w = padded[kmax + dr:kmax + dr + nr,
                               kmax + dc:kmax + dc + nc]
                    wi = np.where(np.isnan(w), 0, w).astype(np.int64)
                    n += 1
                    s += wi
                    ss += wi * wi
            nf = n.astype(np.float64)
            var = (ss.astype(np.float64)
                   - (s.astype(np.float64) * s.astype(np.float64)) / nf) / nf
            with np.errstate(invalid="ignore"):
                devs[mid] = (z - s.astype(np.float64) / nf) / np.sqrt(var)
            ok_all &= var > 0

        def chan(mids):
            dv = np.abs(devs[mids[0]])
            for m in mids[1:]:
                dv = np.maximum(dv, np.abs(devs[m]))
            v = np.floor(512.0 / (1.0 + np.exp(-_MTPI_CUTOFF * dv))) - 256.0
            return np.clip(v, 0.0, 255.0).astype(np.int64)

        keep = ok_all
        return pd.DataFrame({
            "cell_id": cid[keep].ravel(),
            "red": chan(_MTPI_SETS["red"])[keep].ravel(),
            "green": chan(_MTPI_SETS["green"])[keep].ravel(),
            "blue": chan(_MTPI_SETS["blue"])[keep].ravel()})

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=kmax)


# --------------------------------------------------------------------------
# MultiscaleElevationPercentile (terrain_analysis/
# multiscale_elev_percentile.rs:509-551): ep = 100 * n_less/n per scale;
# the kept scale maximizes |ep - 50| (ties -> smaller scale).
# --------------------------------------------------------------------------
def _msep_sql() -> str:
    arms = []
    for mid in (1, 2, 3):
        offs = " UNION ALL ".join(
            f"SELECT a.cell_id, CASE WHEN b.v < a.v THEN 1 ELSE 0 END AS lt "
            f"FROM cells a JOIN cells b ON b.r = a.r + ({dr}) "
            f"AND b.c = a.c + ({dc}) "
            f"WHERE a.r BETWEEN 3 AND {_ROWS - 4} "
            f"AND a.c BETWEEN 3 AND {_COLS - 4}"
            for dr in range(-mid, mid + 1) for dc in range(-mid, mid + 1))
        arms.append(f"""
      SELECT cell_id, CAST({2 * mid + 1} AS BIGINT) AS scale,
             100.0 * SUM(lt) / COUNT(*) AS ep
      FROM ({offs}) GROUP BY cell_id""")
    return f"""
    WITH {_CELLS_CTE},
    eps AS ({' UNION ALL '.join(arms)})
    SELECT cell_id, ep, scale FROM eps
    QUALIFY row_number() OVER (PARTITION BY cell_id
                               ORDER BY abs(ep - 50.0) DESC, scale ASC) = 1
    """


@query("multiscale_elev_percentile", _msep_sql())
def multiscale_elev_percentile(sf_dir: str):
    from ..stages.raster import synth_raster_tiles, window_exchange

    kmax = 3

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        z = padded[kmax:kmax + nr, kmax:kmax + nc]
        r = np.arange(r0, r0 + nr, dtype=np.int64)[:, None] \
            + np.zeros((1, nc), np.int64)
        c = np.arange(c0, c0 + nc, dtype=np.int64)[None, :] \
            + np.zeros((nr, 1), np.int64)
        cid = r * _COLS + c
        interior = (r >= 3) & (r <= _ROWS - 4) & (c >= 3) & (c <= _COLS - 4)
        best = np.full((nr, nc), -1.0)
        ep_out = np.zeros((nr, nc))
        sc_out = np.zeros((nr, nc), np.int64)
        for mid in (1, 2, 3):
            less = np.zeros((nr, nc), np.int64)
            n = np.zeros((nr, nc), np.int64)
            for dr in range(-mid, mid + 1):
                for dc in range(-mid, mid + 1):
                    w = padded[kmax + dr:kmax + dr + nr,
                               kmax + dc:kmax + dc + nc]
                    less += (w < z).astype(np.int64)
                    n += 1
            ep = 100.0 * less.astype(np.float64) / n.astype(np.float64)
            score = np.abs(ep - 50.0)
            better = score > best
            best = np.where(better, score, best)
            ep_out = np.where(better, ep, ep_out)
            sc_out = np.where(better, 2 * mid + 1, sc_out)
        keep = interior
        return pd.DataFrame({"cell_id": cid[keep].ravel(),
                             "ep": ep_out[keep].ravel(),
                             "scale": sc_out[keep].ravel()})

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=kmax)
