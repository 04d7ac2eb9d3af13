"""Terrain sweep #6 — the surface-normal dispersion family:
SphericalStdDevOfNormals (terrain_analysis/
spherical_std_dev_of_normals.rs), AverageNormalVectorAngularDeviation
(terrain_analysis/average_normal_vector_angular_deviation.rs), and their
multiscale/signature variants (MultiscaleStdDevNormals(+Signature),
MultiscaleRoughness(+Signature)).

Contract (simplified from the reference, documented): unit normals come
straight from the Horn gradient, n = (-p, -q, 1)/sqrt(p^2+q^2+1) — no
Gaussian pre-smoothing stage (spherical_std_dev_of_normals.rs:276-380
smooths first; the dispersion statistics themselves are the reference's:
SSDN = sqrt(-2 ln Rbar) in degrees, ANVAD = mean acos(n_i . nbar)).
Roughness (multiscale_roughness.rs:504-540) is the ANVAD statistic
maximized over scales. Normals are exact float trees (sqrt only); the
window sums and ln/acos pass through libm, so outputs are micro-degree
integers under the established guard band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols
_PROBES = (60 * _COLS + 100, 90 * _COLS + 200, 40 * _COLS + 300)

_SAR_DX = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
_SAR_DY = (-1, -1, -1, 0, 0, 0, 1, 1, 1)

_NRM_CTE = f"""
    pq AS MATERIALIZED (
      SELECT a.cell_id, a.r, a.c,
             (CAST((n2.v + 2 * n5.v + n8.v) - (n0.v + 2 * n3.v + n6.v)
                   AS DOUBLE) / 8.0) AS p,
             (CAST((n6.v + 2 * n7.v + n8.v) - (n0.v + 2 * n1.v + n2.v)
                   AS DOUBLE) / 8.0) AS q
      FROM cells a {' '.join(
          f"JOIN cells n{k} ON n{k}.r = a.r + ({_SAR_DY[k]}) "
          f"AND n{k}.c = a.c + ({_SAR_DX[k]})"
          for k in range(9) if k != 4)}
    ),
    nrm AS MATERIALIZED (
      SELECT cell_id, r, c,
             -p / sqrt(p * p + q * q + 1.0) AS nx,
             -q / sqrt(p * p + q * q + 1.0) AS ny,
             1.0 / sqrt(p * p + q * q + 1.0) AS nz
      FROM pq
    )
"""


def _nsums_cte(mid: int, anchor_where: str = "") -> str:
    arms = " UNION ALL ".join(
        f"SELECT a.cell_id, a.r, a.c, b.nx, b.ny, b.nz "
        f"FROM nrm a JOIN nrm b ON b.r = a.r + ({dr}) "
        f"AND b.c = a.c + ({dc}) "
        f"WHERE a.r BETWEEN {mid + 1} AND {_ROWS - 2 - mid} "
        f"AND a.c BETWEEN {mid + 1} AND {_COLS - 2 - mid}{anchor_where}"
        for dr in range(-mid, mid + 1) for dc in range(-mid, mid + 1))
    return f"""
    ns{mid} AS MATERIALIZED (
      SELECT cell_id, r, c, COUNT(*) AS n, SUM(nx) AS sx, SUM(ny) AS sy,
             SUM(nz) AS sz
      FROM ({arms}) GROUP BY cell_id, r, c
    )"""


def _ssdn_expr(t: str = "") -> str:
    r = f"sqrt({t}sx * {t}sx + {t}sy * {t}sy + {t}sz * {t}sz)"
    return (f"CAST(floor(degrees(sqrt(-2.0 * ln(least({r} / {t}n, 1.0))))"
            f" * 1e6 + 0.5) AS BIGINT)")


def _anvad_cte(mid: int, anchor_where: str = "") -> str:
    """th{mid}: mean acos(n_i . nbar) over the window, micro-degrees."""
    arms = " UNION ALL ".join(
        f"SELECT s.cell_id, acos(least(greatest((b.nx * s.sx + b.ny * s.sy "
        f"+ b.nz * s.sz) / sqrt(s.sx * s.sx + s.sy * s.sy + s.sz * s.sz), "
        f"-1.0), 1.0)) AS th "
        f"FROM ns{mid} s JOIN nrm b ON b.r = s.r + ({dr}) "
        f"AND b.c = s.c + ({dc}){anchor_where}"
        for dr in range(-mid, mid + 1) for dc in range(-mid, mid + 1))
    return f"""
    th{mid} AS MATERIALIZED (
      SELECT cell_id,
             CAST(floor(degrees(SUM(th) / COUNT(*)) * 1e6 + 0.5) AS BIGINT)
             AS anvad_micro
      FROM ({arms}) GROUP BY cell_id
    )"""


@query(
    "spherical_std_dev_normals",
    f"""
    WITH {_CELLS_CTE},
    {_NRM_CTE},
    {_nsums_cte(2)}
    SELECT cell_id, {_ssdn_expr()} AS ssdn_micro FROM ns2
    """,
)
def spherical_std_dev_normals(sf_dir: str):
    return _normals_impl("ssdn", [(2,)], anchors=None)


@query(
    "avg_normal_angular_deviation",
    f"""
    WITH {_CELLS_CTE},
    {_NRM_CTE},
    {_nsums_cte(2)},
    {_anvad_cte(2)}
    SELECT cell_id, anvad_micro FROM th2
    """,
)
def avg_normal_angular_deviation(sf_dir: str):
    return _normals_impl("anvad", [(2,)], anchors=None)


def _ms_sql(stat: str, out: str) -> str:
    if stat == "ssdn":
        ctes = ",".join(_nsums_cte(m) for m in (1, 2, 3))
        arms = " UNION ALL ".join(
            f"SELECT cell_id, CAST({2 * m + 1} AS BIGINT) AS scale, "
            f"{_ssdn_expr()} AS v FROM ns{m}" for m in (1, 2, 3))
    else:
        ctes = ",".join(_nsums_cte(m) + "," + _anvad_cte(m)
                        for m in (1, 2, 3))
        arms = " UNION ALL ".join(
            f"SELECT cell_id, CAST({2 * m + 1} AS BIGINT) AS scale, "
            f"anvad_micro AS v FROM th{m}" for m in (1, 2, 3))
    return f"""
    WITH {_CELLS_CTE},
    {_NRM_CTE},
    {ctes},
    sv AS ({arms})
    SELECT cell_id, v AS {out}, scale FROM sv
    QUALIFY row_number() OVER (PARTITION BY cell_id
                               ORDER BY v DESC, scale ASC) = 1
    """


def _sig_sql(stat: str, out: str) -> str:
    aw = f" AND a.cell_id IN {_PROBES}"
    aw2 = f" AND s.cell_id IN {_PROBES}"
    if stat == "ssdn":
        ctes = ",".join(_nsums_cte(m, aw) for m in (1, 2, 3, 4, 5))
        arms = " UNION ALL ".join(
            f"SELECT cell_id, CAST({2 * m + 1} AS BIGINT) AS scale, "
            f"{_ssdn_expr()} AS {out} FROM ns{m}" for m in (1, 2, 3, 4, 5))
    else:
        ctes = ",".join(_nsums_cte(m, aw) + "," + _anvad_cte(m, aw2)
                        for m in (1, 2, 3, 4, 5))
        arms = " UNION ALL ".join(
            f"SELECT cell_id, CAST({2 * m + 1} AS BIGINT) AS scale, "
            f"anvad_micro AS {out} FROM th{m}" for m in (1, 2, 3, 4, 5))
    return f"""
    WITH {_CELLS_CTE},
    {_NRM_CTE},
    {ctes}
    {arms}
    """


@query("multiscale_std_dev_normals", _ms_sql("ssdn", "ssdn_micro"))
def multiscale_std_dev_normals(sf_dir: str):
    """MultiscaleStdDevNormals (terrain_analysis/
    multiscale_std_dev_normals.rs): SSDN maximized over window scales
    3/5/7 (ties -> smaller scale), with the winning scale."""
    return _normals_impl("ssdn", [(1,), (2,), (3,)], anchors=None,
                         multiscale=True, out="ssdn_micro")


@query("multiscale_std_dev_normals_signature",
       _sig_sql("ssdn", "ssdn_micro"))
def multiscale_std_dev_normals_signature(sf_dir: str):
    return _normals_impl("ssdn", [(m,) for m in (1, 2, 3, 4, 5)],
                         anchors=_PROBES, with_scale=True, out="ssdn_micro")


@query("multiscale_roughness", _ms_sql("anvad", "rough_micro"))
def multiscale_roughness(sf_dir: str):
    """MultiscaleRoughness (terrain_analysis/multiscale_roughness.rs:
    504-540 — mean angular deviation of normals) maximized over scales
    3/5/7."""
    return _normals_impl("anvad", [(1,), (2,), (3,)], anchors=None,
                         multiscale=True, out="rough_micro")


@query("multiscale_roughness_signature", _sig_sql("anvad", "rough_micro"))
def multiscale_roughness_signature(sf_dir: str):
    return _normals_impl("anvad", [(m,) for m in (1, 2, 3, 4, 5)],
                         anchors=_PROBES, with_scale=True, out="rough_micro")


def _normals_impl(stat, scales, anchors, multiscale=False, with_scale=False,
                  out=None):
    from ..stages.raster import synth_raster_tiles, window_exchange

    mids = [s[0] for s in scales]
    kmax = max(mids) + 1
    out = out or (f"{stat}_micro")

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        k = kmax
        h, w = padded.shape
        # normals on the interior+halo ring (needs the 3x3 z window)
        zs = [padded[1 + _SAR_DY[j]:h - 1 + _SAR_DY[j],
                     1 + _SAR_DX[j]:w - 1 + _SAR_DX[j]] for j in range(9)]
        p = ((zs[2] + 2 * zs[5] + zs[8]) - (zs[0] + 2 * zs[3] + zs[6])) / 8.0
        q = ((zs[6] + 2 * zs[7] + zs[8]) - (zs[0] + 2 * zs[1] + zs[2])) / 8.0
        ln = np.sqrt(p * p + q * q + 1.0)
        nx, ny, nz = -p / ln, -q / ln, 1.0 / ln  # (nr+2(k-1), ...) shaped
        r = np.arange(r0, r0 + nr, dtype=np.int64)[:, None] \
            + np.zeros((1, nc), np.int64)
        c = np.arange(c0, c0 + nc, dtype=np.int64)[None, :] \
            + np.zeros((nr, 1), np.int64)
        cid = r * _COLS + c
        frames = []
        best = np.full((nr, nc), -1, np.int64)
        best_sc = np.zeros((nr, nc), np.int64)
        for mid in mids:
            interior = (r >= mid + 1) & (r <= _ROWS - 2 - mid) \
                & (c >= mid + 1) & (c <= _COLS - 2 - mid)
            off = k - 1  # normals array offset: index 0 == grid r0-(k-1)
            sx = np.zeros((nr, nc))
            sy = np.zeros((nr, nc))
            sz = np.zeros((nr, nc))
            n = 0
            for dr in range(-mid, mid + 1):
                for dc in range(-mid, mid + 1):
                    sub = (slice(off + dr, off + dr + nr),
                           slice(off + dc, off + dc + nc))
                    sx += np.where(np.isnan(nx[sub]), 0.0, nx[sub])
                    sy += np.where(np.isnan(ny[sub]), 0.0, ny[sub])
                    sz += np.where(np.isnan(nz[sub]), 0.0, nz[sub])
                    n += 1
            rmag = np.sqrt(sx * sx + sy * sy + sz * sz)
            if stat == "ssdn":
                with np.errstate(invalid="ignore"):
                    val = np.degrees(
                        np.sqrt(-2.0 * np.log(np.minimum(rmag / n, 1.0))))
            else:
                th = np.zeros((nr, nc))
                for dr in range(-mid, mid + 1):
                    for dc in range(-mid, mid + 1):
                        sub = (slice(off + dr, off + dr + nr),
                               slice(off + dc, off + dc + nc))
                        dot = (np.where(np.isnan(nx[sub]), 0.0, nx[sub]) * sx
                               + np.where(np.isnan(ny[sub]), 0.0, ny[sub]) * sy
                               + np.where(np.isnan(nz[sub]), 0.0, nz[sub]) * sz
                               ) / rmag
                        th += np.arccos(np.clip(dot, -1.0, 1.0))
                val = np.degrees(th / n)
            micro = np.where(interior, np.floor(val * 1e6 + 0.5), np.nan)
            mi = np.where(interior, micro, -1).astype(np.int64)
            if multiscale:
                better = interior & (mi > best)
                best = np.where(better, mi, best)
                best_sc = np.where(better, 2 * mid + 1, best_sc)
            else:
                keep = interior
                if anchors is not None:
                    keep = keep & np.isin(cid, np.asarray(anchors, np.int64))
                row = {"cell_id": cid[keep].ravel(),
                       out: mi[keep].ravel()}
                if with_scale:
                    row = {"cell_id": cid[keep].ravel(),
                           "scale": np.full(int(keep.sum()), 2 * mid + 1,
                                            np.int64),
                           out: mi[keep].ravel()}
                frames.append(pd.DataFrame(row))
        if multiscale:
            keep = best >= 0
            frames.append(pd.DataFrame({
                "cell_id": cid[keep].ravel(), out: best[keep].ravel(),
                "scale": best_sc[keep].ravel()}))
        return pd.concat(frames, ignore_index=True)

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return window_exchange(tiles, GRID1, window_fn, k=kmax)
