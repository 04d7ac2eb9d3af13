"""Image sweep #6 — binary line morphology: LineThinning, ThickenRasterLine,
RemoveSpurs (image_analysis/{line_thin,thicken_line,remove_spurs}.rs).

The reference scans update the raster IN PLACE mid-scan (changes cascade
within one pass in row-major order) — inherently sequential. The
distributed contract here is JACOBI iteration: every structuring-element
sub-pass reads the PREVIOUS raster synchronously, applied until no cell
changes (cap 4 iterations; the reference caps at 10). SQL-exact — the
_morph_sql recursive CTE unrolls the same 4x8 sub-pass schedule with
LAG/LEAD neighbours; the dense numpy oracle in tests/test_image6.py runs
the identical Jacobi sub-passes on the whole grid at once, verifying the
tile/halo machinery independently.

Input: the binary raster of the 400 DDA-rasterized synthetic line
segments (queries_hydro6 fixture). Each sub-pass is ONE chained tile
stencil (stencil_tiles_as_input — no per-cell long format between
passes); change counts ride along as a per-tile column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)

_THIN_E1 = ((6, 7, 0, 4, 3, 2), (0, 1, 2, 4, 5, 6),
            (2, 3, 4, 6, 7, 0), (4, 5, 6, 0, 1, 2))
_THIN_E2 = ((7, 0, 1, 3, 5), (1, 2, 3, 5, 7),
            (3, 4, 5, 7, 1), (5, 6, 7, 1, 3))
_VALS1 = (0, 0, 0, 1, 1, 1)
_VALS2 = (0, 0, 0, 1, 1)
_SPUR_E = ((0, 1, 4, 5, 6, 7), (0, 1, 2, 5, 6, 7), (0, 1, 2, 3, 6, 7),
           (0, 1, 2, 3, 4, 7), (0, 1, 2, 3, 4, 5), (1, 2, 3, 4, 5, 6),
           (2, 3, 4, 5, 6, 7), (0, 3, 4, 5, 6, 7))

_MAX_ITER = 4  # contract cap (reference default 10; 4 bounds the chained-stencil rounds)


def _line_mask() -> np.ndarray:
    from .queries_hydro6 import _dda_cells

    mask = np.zeros(_ROWS * _COLS, np.float64)
    mask[_dda_cells(400)] = 1.0
    return mask


def _patterns(kind: str):
    """[(element idx tuple, required vals tuple, target, new)] sub-passes."""
    if kind == "thin":
        return ([(e, _VALS1, 1.0, 0.0) for e in _THIN_E1]
                + [(e, _VALS2, 1.0, 0.0) for e in _THIN_E2])
    if kind == "thicken":
        return ([(e, _VALS1, 0.0, 1.0) for e in _THIN_E1]
                + [(e, _VALS2, 0.0, 1.0) for e in _THIN_E2])
    # spurs: all six listed neighbours zero -> remove the centre
    return [(e, tuple([0] * 6), 1.0, 0.0) for e in _SPUR_E]


def morph_pass_dense(z: np.ndarray, elem, vals, target, new) -> np.ndarray:
    """One synchronous sub-pass over the dense (R, C) binary array —
    shared by the tiled kernel (per padded tile) and the test oracle."""
    pad = np.zeros((z.shape[0] + 2, z.shape[1] + 2))
    pad[1:-1, 1:-1] = z
    match = z == target
    for e, want in zip(elem, vals):
        nb = pad[1 + _DY[e]:1 + _DY[e] + z.shape[0],
                 1 + _DX[e]:1 + _DX[e] + z.shape[1]]
        match &= nb == want
    return np.where(match, new, z)


def _morph(kind: str):
    import ray as _ray

    from ..grid import GridSpec
    from ..stages.raster import (cells_to_tiles, stencil_k,
                                 stencil_tiles_as_input)

    mask = _line_mask()
    ref = _ray.put(mask)

    import ray.data

    from ..stages.spatial_join import _cached_get

    ids = np.arange(_ROWS * _COLS, dtype=np.int64)

    def seed(batch: dict) -> pd.DataFrame:
        m = _cached_get(ref)
        cid = np.asarray(batch["id"], np.int64)
        return pd.DataFrame({"cell_id": cid, "z": m[cid]})

    cells = ray.data.range(_ROWS * _COLS, override_num_blocks=8) \
        .map_batches(seed, batch_format="numpy")
    tiles = cells_to_tiles(cells, GRID1, "z", fill=0.0)

    # one iteration = all 8 structuring-element sub-passes FUSED into a
    # single k=8 halo exchange (each sub-pass consumes one halo ring, the
    # stencil_chain trick) — 32 materialized exchanges become 4. Halo
    # cells inside the grid evolve exactly like the per-pass version;
    # off-grid cells are pinned to 0 between sub-passes (reference border).
    P = _patterns(kind)
    K = len(P)

    for _ in range(_MAX_ITER):
        def kern(padded, nr, nc, _P=P, _K=K):
            offgrid = np.isnan(padded)
            z = np.where(offgrid, 0.0, padded)
            R, C = z.shape  # (nr + 2K, nc + 2K)
            chg = 0
            for s, (elem, vals, target, new) in enumerate(_P):
                lo = s + 1  # valid margin shrinks one ring per sub-pass
                zz = z[lo:R - lo, lo:C - lo]
                match = zz == target
                for e, want in zip(elem, vals):
                    nb = z[lo + _DY[e]:R - lo + _DY[e],
                           lo + _DX[e]:C - lo + _DX[e]]
                    match &= nb == want
                # change count restricted to the OWN tile region — counted
                # exactly once across tiles, same as the per-pass version
                chg += int(match[_K - lo:_K - lo + nr,
                                 _K - lo:_K - lo + nc].sum())
                z[lo:R - lo, lo:C - lo] = np.where(match, new, zz)
                z[offgrid] = 0.0
            return {"z": z[_K:_K + nr, _K:_K + nc],
                    "chg": np.full((nr, nc), float(chg))}

        res = stencil_k(tiles, GRID1, kern, k=K, output="tiles") \
            .materialize()
        chg = res.map_batches(
            lambda df: pd.DataFrame(
                {"n": [int(sum(np.asarray(v)[0] for v in df["chg"]))]}),
            batch_format="pandas").to_pandas()["n"].sum()
        tiles = stencil_tiles_as_input(res, GRID1, "z").materialize()
        if int(chg) == 0:
            break

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            v = np.asarray(t.data, np.float64).astype(np.int64)
            keep = v > 0
            frames.append(pd.DataFrame({
                "cell_id": (rr.ravel() * _COLS + cc.ravel())[keep.ravel()],
                "on": np.ones(int(keep.sum()), np.int64)}))
        return pd.concat(frames, ignore_index=True)

    return tiles.map_batches(explode, batch_format="pandas")


def _morph_sql(kind: str) -> str:
    """SQL twin of the Jacobi morphology contract: the 4x8 sub-pass
    schedule unrolled as ONE recursive CTE (pattern = iter mod 8, 32
    steps total — running past convergence is a no-op, so the Python
    side's early break needs no mirror). Neighbours via LAG/LEAD over
    cell order with 0 off-grid, like the padded-tile kernel."""
    from ..linedefs import _dda_walk_sql
    from .sqlgen import synth_segments_cte

    segs = synth_segments_cte(400).replace("seg_h", "lm_seg_h") \
        .replace("seg_u", "lm_seg_u").replace("seg AS", "lm_seg AS")
    nbr = []
    for e in range(8):
        off = _DY[e] * _COLS + _DX[e]
        conds = []
        if _DX[e] == -1:
            conds.append(f"(cid % {_COLS}) > 0")
        if _DX[e] == 1:
            conds.append(f"(cid % {_COLS}) < {_COLS - 1}")
        fn = "LAG" if off < 0 else "LEAD"
        pred = " AND ".join(conds) if conds else "TRUE"
        nbr.append(f"COALESCE(CASE WHEN {pred} THEN {fn}(z, {abs(off)}) "
                   f"OVER (ORDER BY cid) END, 0) AS n{e}")
    branches = []
    for p, (elem, vals, target, new) in enumerate(_patterns(kind)):
        cond = " AND ".join(
            [f"z = {int(target)}"]
            + [f"n{e} = {int(w)}" for e, w in zip(elem, vals)])
        branches.append(f"WHEN {p} THEN CASE WHEN {cond} "
                        f"THEN {int(new)} ELSE z END")
    n = _ROWS * _COLS
    return f"""
    WITH RECURSIVE {segs},
    {_dda_walk_sql(400, 42, "lm")},
    relax(iter, cid, z) AS (
      SELECT 0, CAST(t.i AS BIGINT),
             CASE WHEN m.cell_id IS NOT NULL THEN 1 ELSE 0 END
      FROM range({n}) t(i) LEFT JOIN lm m ON m.cell_id = t.i
      UNION ALL
      SELECT iter + 1, cid, CASE (iter % 8) {' '.join(branches)} END
      FROM (SELECT iter, cid, z, {', '.join(nbr)}
            FROM relax WHERE iter < {4 * 8}) s
    )
    SELECT cid AS cell_id, CAST(1 AS BIGINT) AS "on"
    FROM relax WHERE iter = {4 * 8} AND z = 1
    """


@query("line_thin", _morph_sql("thin"))
def line_thin(sf_dir: str):
    return _morph("thin")


@query("thicken_line", _morph_sql("thicken"))
def thicken_line(sf_dir: str):
    return _morph("thicken")


@query("remove_spurs", _morph_sql("spurs"))
def remove_spurs(sf_dir: str):
    return _morph("spurs")
