"""Terrain sweep #10 — the Sun et al. (2007) smoothing family:
FeaturePreservingSmoothing (terrain_analysis/feature_preserving_smoothing.rs)
and DrainagePreservingSmoothing
(terrain_analysis/drainage_preserving_smoothing.rs).

Both tools are three chained raster filters: (1) Horn-1981 plane normals
per cell (stored as (a, b) with c normalized to 1,
feature_preserving_smoothing.rs:430-445), (2) normal-field smoothing over
a filter window with weights w = (cos_diff - threshold)^2 for neighbours
whose normal cosine similarity exceeds the threshold (:516-535), and
(3) num_iter elevation-update passes pulling each cell toward its
neighbours' smoothed planes (:598-625). DrainagePreservingSmoothing adds a
per-cell ADAPTIVE threshold driven by a deviation-from-windowed-median
(DFM) raster over a double-size window with decimal-binned elevations
(drainage_preserving_smoothing.rs:370-530, 688-700): cells below the local
median (channels) get a relaxed threshold so drainage features survive.

Distributed shape: ONE k-halo tile exchange per tool — the entire chain
(normals -> smoothing -> iterations, + DFM for DPS) evaluates inside a
single fused kernel on progressively shrinking halo regions, so no
per-cell long format and no second exchange ever exist. The reference's
elevation update is an in-place row-major scan (Gauss-Seidel); the
contract here is the synchronous (Jacobi) iteration — deterministic and
parallelism-invariant — with the independent scalar oracle in
tests/test_terrain10.py implementing the same contract. The reference's
f32 arithmetic is widened to f64. Rows-only entries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..rasterdefs import _value_fn
from .queries import query

_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)


def _horn_normals(zp: np.ndarray, res_x: float, res_y: float):
    """(a, b) Horn normals for the region one ring inside ``zp``;
    off-grid/NaN neighbours fall back to the centre elevation
    (feature_preserving_smoothing.rs:424-447)."""
    z = zp[1:-1, 1:-1]
    v = []
    nr, nc = z.shape
    for i in range(8):
        zn = zp[1 + _DY[i]:1 + _DY[i] + nr, 1 + _DX[i]:1 + _DX[i] + nc]
        v.append(np.where(np.isnan(zn), z, zn))
    a = -(v[2] - v[4] + 2.0 * (v[1] - v[5]) + v[0] - v[6]) / (8.0 * res_x)
    b = -(v[6] - v[4] + 2.0 * (v[7] - v[3]) + v[0] - v[2]) / (8.0 * res_y)
    bad = np.isnan(z)
    return np.where(bad, np.nan, a), np.where(bad, np.nan, b)


def _cos_between(a1, b1, a2, b2):
    return (a1 * a2 + b1 * b2 + 1.0) / np.sqrt(
        (a1 * a1 + b1 * b1 + 1.0) * (a2 * a2 + b2 * b2 + 1.0))


def _smooth_normals(a, b, thr, mid):
    """Weighted normal averaging over the (2*mid+1)^2 window; ``thr`` is a
    scalar (FPS) or an array matching the OUTPUT region (DPS adaptive)."""
    nr, nc = a.shape[0] - 2 * mid, a.shape[1] - 2 * mid
    ac = a[mid:mid + nr, mid:mid + nc]
    bc = b[mid:mid + nr, mid:mid + nc]
    asum = np.zeros((nr, nc))
    bsum = np.zeros((nr, nc))
    wsum = np.zeros((nr, nc))
    for wr in range(2 * mid + 1):
        for wc in range(2 * mid + 1):
            an = a[wr:wr + nr, wc:wc + nc]
            bn = b[wr:wr + nr, wc:wc + nc]
            cos = _cos_between(ac, bc, an, bn)
            ok = ~np.isnan(an) & (cos > thr)
            w = np.where(ok, (cos - thr) ** 2, 0.0)
            asum += np.where(ok, an * w, 0.0)
            bsum += np.where(ok, bn * w, 0.0)
            wsum += w
    bad = np.isnan(ac)
    with np.errstate(invalid="ignore"):  # NaN-halo cells divide 0/0
        return (np.where(bad, np.nan, asum / wsum),
                np.where(bad, np.nan, bsum / wsum))


def _update_elevations(zc, sa, sb, thr, res_x, res_y):
    """One synchronous elevation-update pass on the region one ring inside
    ``zc`` (feature_preserving_smoothing.rs:598-633, Jacobi contract)."""
    nr, nc = zc.shape[0] - 2, zc.shape[1] - 2
    z = zc[1:-1, 1:-1]
    ac = sa[1:-1, 1:-1]
    bc = sb[1:-1, 1:-1]
    zsum = np.zeros((nr, nc))
    wsum = np.zeros((nr, nc))
    for n in range(8):
        sl = (slice(1 + _DY[n], 1 + _DY[n] + nr),
              slice(1 + _DX[n], 1 + _DX[n] + nc))
        zn, an, bn = zc[sl], sa[sl], sb[sl]
        cos = _cos_between(ac, bc, an, bn)
        ok = ~np.isnan(zn) & (cos > thr)
        w = np.where(ok, (cos - thr) ** 2, 0.0)
        xn = -_DX[n] * res_x
        yn = _DY[n] * res_y
        zsum += np.where(ok, -(an * xn + bn * yn - zn) * w, 0.0)
        wsum += w
    with np.errstate(invalid="ignore"):  # NaN-halo cells divide 0/0
        out = np.where(wsum > 0.0, zsum / wsum, z)
    return np.where(np.isnan(z), np.nan, out)


def _dfm_field(zp: np.ndarray, mid2: int, mult: float):
    """Deviation from the windowed binned median
    (drainage_preserving_smoothing.rs:370-530): bins = floor(z*mult);
    median = target-th smallest bin with target = floor(n/2) (n = valid
    cells in the clipped (2*mid2+1)^2 window); dfm = (bin - median)/mult.
    Output region is ``mid2`` rings inside ``zp``."""
    from numpy.lib.stride_tricks import sliding_window_view

    bins = np.floor(zp * mult)
    w = 2 * mid2 + 1
    sw = sliding_window_view(bins, (w, w)).reshape(
        zp.shape[0] - 2 * mid2, zp.shape[1] - 2 * mid2, w * w)
    n = np.sum(~np.isnan(sw), axis=2)
    k = np.maximum(n // 2, 1)
    srt = np.sort(np.where(np.isnan(sw), np.inf, sw), axis=2)
    med = np.take_along_axis(srt, (k - 1)[..., None], axis=2)[..., 0]
    centre = bins[mid2:zp.shape[0] - mid2, mid2:zp.shape[1] - mid2]
    return (centre - med) / mult


def _dps_threshold(dfm, max_norm_diff_deg: float, reduction: float,
                   dfm_threshold: float):
    """Per-cell adaptive cosine threshold
    (drainage_preserving_smoothing.rs:688-700); ``dfm_threshold`` enters
    NEGATED like the reference (:328)."""
    t = -abs(dfm_threshold)
    base = np.cos(np.radians(max_norm_diff_deg))
    ramp = np.cos(np.radians(max_norm_diff_deg * (1.0 - reduction * dfm / t)))
    floor_t = np.cos(np.radians(max_norm_diff_deg * (1.0 - reduction)))
    return np.where((dfm < 0.0) & (dfm > t), ramp,
                    np.where(dfm <= t, floor_t, base))


def smoothing_field(grid, value_fn, *, filter_size: int = 5,
                    norm_diff_deg: float = 15.0, num_iter: int = 2,
                    drainage: dict | None = None, tile: int = 64):
    """Dataset (cell_id, zs): the smoothed DEM. ``drainage`` switches on
    the DPS adaptive threshold: {"reduction": 0.8, "dfm": 0.15,
    "sig_digits": 2}."""
    from ..stages.raster import stencil_k, synth_raster_tiles

    mid = filter_size // 2
    mid2 = filter_size  # DPS: dfm window is twice the smoothing filter
    halo = 1 + mid + num_iter + (mid2 if drainage else 0)
    res_x, res_y = grid.res_x, grid.res_y
    thr_scalar = float(np.cos(np.radians(norm_diff_deg)))

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        # region bookkeeping: padded has `halo` rings; each stage consumes
        # rings as documented in the module docstring.
        if drainage:
            mult = 10.0 ** drainage["sig_digits"]
            dfm = _dfm_field(padded, mid2, mult)  # halo-(halo-mid2) region
            z0 = padded[mid2:padded.shape[0] - mid2,
                        mid2:padded.shape[1] - mid2]
            h = halo - mid2
        else:
            dfm = None
            z0 = padded
            h = halo
        # normals on the (h-1)-ring region of z0
        a, b = _horn_normals(z0, res_x, res_y)  # h-1 rings
        # smoothed normals on the (h-1-mid)-ring region == num_iter rings
        if drainage:
            thr_sm = _dps_threshold(
                dfm[mid + 1:dfm.shape[0] - mid - 1,
                    mid + 1:dfm.shape[1] - mid - 1],
                norm_diff_deg, drainage["reduction"], drainage["dfm"])
        else:
            thr_sm = thr_scalar
        sa, sb = _smooth_normals(a, b, thr_sm, mid)
        zcur = z0[1 + mid:z0.shape[0] - 1 - mid, 1 + mid:z0.shape[1] - 1 - mid]
        for it in range(num_iter):
            s = it + 1
            if drainage:
                d = dfm[mid + 1 + s:dfm.shape[0] - mid - 1 - s,
                        mid + 1 + s:dfm.shape[1] - mid - 1 - s]
                thr_up = _dps_threshold(d, norm_diff_deg,
                                        drainage["reduction"],
                                        drainage["dfm"])
            else:
                thr_up = thr_scalar
            zcur = _update_elevations(zcur, sa, sb, thr_up, res_x, res_y)
            sa = sa[1:-1, 1:-1]
            sb = sb[1:-1, 1:-1]
        assert zcur.shape == (nr, nc)
        return {"zs": zcur}

    tiles = synth_raster_tiles(grid, value_fn, tile=tile)
    return stencil_k(tiles, grid, kern, tile=tile, k=halo)


def _smoothing_sql(drainage: bool) -> str:
    """SQL twin of the Sun et al. smoothing chain, micro-quantized (the
    window folds reassociate under DuckDB; output guard bands 0.0045 FPS /
    0.0020 DPS at the 1e-6 quantum, cos-vs-threshold branch margins
    0.0024 / 0.00053 — all >> the transcendental ulp drift): Horn normals
    as exact rationals with centre fallback, weighted normal smoothing
    over the 25-offset window (chunked left folds), two Jacobi elevation
    updates; DPS adds the 11x11 binned-median DFM field (121 arm unions,
    k-th-smallest) and the per-cell adaptive cosine threshold."""
    cols, n = GRID1.cols, GRID1.rows * GRID1.cols
    mid = 2
    thr_lit = f"CAST({float(np.cos(np.radians(15.0)))!r} AS DOUBLE)"

    def nb(col: str, dr: int, dc: int, default: str) -> str:
        off = dr * cols + dc
        if off == 0:
            return col
        conds = []
        if dc < 0:
            conds.append(f"(cid % {cols}) >= {-dc}")
        if dc > 0:
            conds.append(f"(cid % {cols}) < {cols - dc}")
        pred = " AND ".join(conds) if conds else "TRUE"
        fn = "LAG" if off < 0 else "LEAD"
        return (f"COALESCE(CASE WHEN {pred} THEN {fn}({col}, {abs(off)}) "
                f"OVER (ORDER BY cid) END, {default})")

    def nbn(col: str, dr: int, dc: int) -> str:
        """NULL off-grid (no COALESCE)."""
        off = dr * cols + dc
        if off == 0:
            return col
        conds = []
        if dc < 0:
            conds.append(f"(cid % {cols}) >= {-dc}")
        if dc > 0:
            conds.append(f"(cid % {cols}) < {cols - dc}")
        pred = " AND ".join(conds) if conds else "TRUE"
        fn = "LAG" if off < 0 else "LEAD"
        return (f"CASE WHEN {pred} THEN {fn}({col}, {abs(off)}) "
                f"OVER (ORDER BY cid) END")

    # Horn normals with centre fallback: v_i = zn_i if on-grid else z
    v = [nb("z", _DY[i], _DX[i], "z") for i in range(8)]
    a_expr = (f"(-(({v[2]}) - ({v[4]}) + 2.0*(({v[1]}) - ({v[5]})) "
              f"+ ({v[0]}) - ({v[6]})) / 8.0)")
    b_expr = (f"(-(({v[6]}) - ({v[4]}) + 2.0*(({v[7]}) - ({v[3]})) "
              f"+ ({v[0]}) - ({v[2]})) / 8.0)")

    dfm_ctes, thr_col = "", thr_lit
    if drainage:
        arms = " UNION ALL ".join(
            f"SELECT a.cid, b.z*100.0 AS bin FROM dzt a JOIN dzt b "
            f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
            for dr in range(-5, 6) for dc in range(-5, 6))
        base = repr(float(np.cos(np.radians(15.0))))
        floor_t = repr(float(np.cos(np.radians(15.0 * (1.0 - 0.8)))))
        ramp = ("COS(RADIANS(15.0 * (1.0 - 0.8 * d.dfm / "
                "CAST(-0.15 AS DOUBLE))))")
        dfm_ctes = f""",
    dfma AS MATERIALIZED ({arms}),
    dfmm AS MATERIALIZED (
      SELECT cid, bin,
             row_number() OVER (PARTITION BY cid ORDER BY bin) AS rn,
             COUNT(*) OVER (PARTITION BY cid) AS nn
      FROM dfma
    ),
    dfmt AS MATERIALIZED (
      SELECT m.cid, (t.z*100.0 - m.bin)/100.0 AS dfm
      FROM dfmm m JOIN dzt t ON t.cid = m.cid
      WHERE m.rn = GREATEST(m.nn // 2, 1)
    ),
    thrt AS MATERIALIZED (
      SELECT d.cid,
             CASE WHEN d.dfm < 0.0 AND d.dfm > CAST(-0.15 AS DOUBLE)
                  THEN {ramp}
                  WHEN d.dfm <= CAST(-0.15 AS DOUBLE)
                  THEN CAST({floor_t} AS DOUBLE)
                  ELSE CAST({base} AS DOUBLE) END AS thr
      FROM dfmt d
    )"""
        thr_col = "thr"

    def cos_expr(an: str, bn: str, cac: str = "ac", cbc: str = "bc") -> str:
        return (f"(({cac}*({an}) + {cbc}*({bn}) + 1.0) / "
                f"SQRT(({cac}*{cac} + {cbc}*{cbc} + 1.0) * "
                f"(({an})*({an}) + ({bn})*({bn}) + 1.0)))")

    # smoothing folds: 25 offsets in (wr, wc) order, chunked for the
    # binder's 128-depth cap
    offsets = [(wr - mid, wc - mid) for wr in range(2 * mid + 1)
               for wc in range(2 * mid + 1)]
    carry = "iterkeep, cid, z, ac, bc, thrv"
    src = ("SELECT 0 AS iterkeep, cid, z, a AS ac, b AS bc, "
           f"{thr_col} AS thrv, 0.0 AS asum, 0.0 AS bsum, 0.0 AS wsum "
           "FROM nrm" + (" JOIN thrt USING (cid)" if drainage else ""))
    for lo in range(0, len(offsets), 9):
        af, bf, wf = "asum", "bsum", "wsum"
        for dr, dc in offsets[lo:lo + 9]:
            an = nbn("a2", dr, dc)
            bn = nbn("b2", dr, dc)
            # re-fetch normals of the neighbour: alias columns a2/b2 are
            # carried duplicates of the original a/b per row
            cosx = cos_expr(an, bn)
            ok = f"(({an}) IS NOT NULL AND {cosx} > thrv)"
            w = f"CASE WHEN {ok} THEN ({cosx} - thrv)*({cosx} - thrv) ELSE 0.0 END"
            af = f"({af} + CASE WHEN {ok} THEN ({an}) * ({w}) ELSE 0.0 END)"
            bf = f"({bf} + CASE WHEN {ok} THEN ({bn}) * ({w}) ELSE 0.0 END)"
            wf = f"({wf} + {w})"
        src = (f"SELECT {carry}, a2, b2, {af} AS asum, {bf} AS bsum, "
               f"{wf} AS wsum FROM ({src})")
    # need a2/b2 carried from nrm — rebuild the seed to include them
    src = src.replace(
        "SELECT 0 AS iterkeep, cid, z, a AS ac, b AS bc, ",
        "SELECT 0 AS iterkeep, cid, z, a AS a2, b AS b2, a AS ac, "
        "b AS bc, ", 1)

    upd_layers = []
    for it in range(2):
        zsum, wsum = "0.0", "0.0"
        for nidx in range(8):
            dr, dc = _DY[nidx], _DX[nidx]
            zn = nbn("zc", dr, dc)
            an = nbn("sa", dr, dc)
            bn = nbn("sb", dr, dc)
            cosx = cos_expr(an, bn, "sac", "sbc")
            ok = f"(({zn}) IS NOT NULL AND {cosx} > thrv)"
            w = (f"CASE WHEN {ok} THEN ({cosx} - thrv)*({cosx} - thrv) "
                 f"ELSE 0.0 END")
            xn, yn = float(-dc * 1.0), float(dr * 1.0)
            zsum = (f"({zsum} + CASE WHEN {ok} THEN "
                    f"-(({an})*{xn!r} + ({bn})*{yn!r} - ({zn})) * ({w}) "
                    f"ELSE 0.0 END)")
            wsum = f"({wsum} + {w})"
        upd_layers.append((zsum, wsum))

    upd_sql = ""
    prev = "smc"
    for it, (zsum, wsum) in enumerate(upd_layers):
        upd_sql += f""",
    upd{it} AS MATERIALIZED (
      SELECT cid, sa, sb, sac, sbc, thrv,
             CASE WHEN ({wsum}) > 0.0 THEN ({zsum}) / ({wsum})
                  ELSE zc END AS zc
      FROM {prev}
    )"""
        prev = f"upd{it}"

    return f"""
    WITH dzt AS MATERIALIZED (
      SELECT CAST(t.i AS BIGINT) AS cid, CAST(t.i // {cols} AS BIGINT) AS r,
             CAST(t.i % {cols} AS BIGINT) AS c,
             CAST((t.i*1000003)%1000 AS DOUBLE) AS z
      FROM range({n}) t(i)
    ){dfm_ctes},
    nrm AS MATERIALIZED (
      SELECT cid, z, {a_expr} AS a, {b_expr} AS b FROM dzt
    ),
    smr AS MATERIALIZED ({src}),
    smc AS MATERIALIZED (
      SELECT cid, asum/wsum AS sa, bsum/wsum AS sb,
             asum/wsum AS sac, bsum/wsum AS sbc, thrv, z AS zc
      FROM smr
    ){upd_sql}
    SELECT cid AS cell_id,
           CAST(FLOOR(zc*1e6 + 0.5) AS BIGINT) AS zs_u
    FROM {prev}
    """


@query("feature_preserving_smoothing", _smoothing_sql(False))
def feature_preserving_smoothing(sf_dir: str):
    """FeaturePreservingSmoothing
    (terrain_analysis/feature_preserving_smoothing.rs): filter=5,
    norm_diff=15 deg, num_iter=2 over the synthetic DEM. One fused
    k=1+2+2 halo exchange; Jacobi iteration contract (module docstring).
    SQL oracle: _smoothing_sql (micro-quantized); scalar-loop oracle in
    tests/test_terrain10.py. Output (cell_id, zs_u)."""
    return _quant_zs(smoothing_field(GRID1, _value_fn, filter_size=5,
                                     norm_diff_deg=15.0, num_iter=2))


@query("drainage_preserving_smoothing", _smoothing_sql(True))
def drainage_preserving_smoothing(sf_dir: str):
    """DrainagePreservingSmoothing
    (terrain_analysis/drainage_preserving_smoothing.rs): FPS plus the
    deviation-from-median adaptive threshold (reduction=80%, dfm=0.15,
    2 significant decimal digits; dfm window 11x11 = 2x filter). One fused
    k=10 halo exchange. SQL oracle: _smoothing_sql(True); scalar oracle in
    tests/test_terrain10.py. Output (cell_id, zs_u)."""
    return _quant_zs(smoothing_field(GRID1, _value_fn, filter_size=5,
                                     norm_diff_deg=15.0, num_iter=2,
                                     drainage={"reduction": 0.8,
                                               "dfm": 0.15,
                                               "sig_digits": 2}))


def _quant_zs(ds):
    def q(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "zs_u": np.floor(df["zs"].to_numpy(np.float64) * 1e6 + 0.5)
            .astype(np.int64)})

    return ds.map_batches(q, batch_format="pandas")
