"""Math/stat sweep #5: TurningBandsSimulation
(math_stat_analysis/turning_bands.rs).

The reference fuses `iterations` 1-D spatially-autocorrelated random
lines ("bands") into a 2-D random field: per band, a standard-normal
line of diagonal length is filtered with the antisymmetric ramp kernel
(w = sqrt(36/(fhs*(fhs+1)*filter_size)), turning_bands.rs:265-312),
standardized, assigned a random transect through the grid (two random
points on different edges), and every grid cell adds the line value at
its perpendicular projection (:445-485); the sum is divided by
sqrt(iterations) (:500-505).

Derandomized contract: thread_rng is replaced by counter-based splitmix64
streams — normals via the shared Acklam probit over u01 draws, edge picks
and edge coordinates via modulo draws replicating the reference's
pick/re-pick control flow. Band construction is O(iterations * diagonal)
driver work (a few KB) broadcast once; the per-cell projection is one
vectorized map over the tile stream — no exchange at all. Rows-only
(probit + sqrt are libm); the scalar oracle in tests/test_mathops5.py
recomputes a band and the projection independently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..layers import GRID1
from ..sources.synthetic import splitmix64
from .queries import query

_TB_SEED = 77_1977
_TB_ITER = 16
_TB_RANGE = 24.0  # x-y units -> filter_half_size = 12 on the 1-unit grid


def _u01(idx: np.ndarray) -> np.ndarray:
    """u in [0,1) from a counter — 53-bit mantissa of splitmix64."""
    h = splitmix64(np.asarray(idx, np.uint64))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _draw(ctr: int) -> int:
    """One u64 draw from the scalar control stream."""
    return int(splitmix64(np.array([_TB_SEED * 0x1000003 + ctr],
                                   np.uint64))[0])


def tb_bands(rows: int, cols: int, res_x: float, *, iterations: int,
             rng: float, seed: int):
    """[(y_line, line_slope, line_intercept, perp_slope, slope_diff,
    start_x, start_y)] per band — the driver-side O(iter*diag) setup."""
    diag = int(np.sqrt(rows * rows + cols * cols))
    fhs = int(rng / (2.0 * res_x))
    fsz = fhs * 2 + 1
    w = np.sqrt(36.0 / (fhs * (fhs + 1) * fsz))
    offsets = np.arange(fsz) - fhs
    bands = []
    ctr = 0
    for b in range(iterations):
        t = np.zeros(diag + 2 * fhs)
        t[:diag] = _u01(np.arange(diag, dtype=np.int64)
                        + np.int64(seed + b * 1_000_003))
        from ..rasterdefs import _probit_np
        t[:diag] = _probit_np(t[:diag])
        # antisymmetric ramp filter, then standardize (population moments)
        y = np.zeros(diag)
        for k in range(fsz):
            m = offsets[k]
            y = y + m * t[k:k + diag]
        y *= w
        mean = y.sum() / diag
        stdev = np.sqrt((y * y).sum() / diag - mean * mean)
        y = (y - mean) / stdev

        # two random points on different edges (turning_bands.rs:320-392)
        def edge_point(edge):
            nonlocal ctr
            if edge == 0:
                ctr += 1
                return 0.0, float(_draw(ctr) % rows)
            if edge == 1:
                ctr += 1
                return float(_draw(ctr) % cols), 0.0
            if edge == 2:
                ctr += 1
                return float(cols - 1), float(_draw(ctr) % rows)
            ctr += 1
            return float(_draw(ctr) % cols), float(rows - 1)

        # The reference re-picks p2 on the SAME edge until both coordinates
        # differ (turning_bands.rs:368-392) — which never terminates when p1
        # landed on the corner coordinate edge2 holds fixed (e.g. p1 at
        # col 0 with edge2 = left). The derandomized contract bounds the
        # re-pick at 64 tries and then re-draws both edges and points.
        while True:
            ctr += 1
            edge1 = _draw(ctr) % 4
            edge2 = edge1
            while edge2 == edge1:
                ctr += 1
                edge2 = _draw(ctr) % 4
            p1x, p1y = edge_point(edge1)
            p2x, p2y = edge_point(edge2)
            tries = 0
            while (p1x == p2x or p1y == p2y) and tries < 64:
                p2x, p2y = edge_point(edge2)
                tries += 1
            if p1x != p2x and p1y != p2y:
                break

        ls = (p2y - p1y) / (p2x - p1x)
        li = p1y - ls * p1x
        ps = -1.0 / ls
        sd = ls - ps
        # perpendicular intersections of the four corners; the line start
        # is the corner projection with the minimum y (:405-442)
        sx, sy = None, None
        for crow, ccol in ((0, 0), (0, cols), (rows, 0), (rows, cols)):
            pi = crow - ps * ccol
            cx = (pi - li) / sd
            cy = ls * cx - li
            if sy is None or cy < sy:
                sx, sy = cx, cy
        bands.append((y, ls, li, ps, sd, sx, sy))
    return bands, diag


def _tb_sql() -> str:
    """SQL twin of the turning-bands field: band lines RECOMPUTED in SQL
    (splitmix64 u01 -> Acklam probit -> 25-tap ramp filter via windowed
    LEADs -> population standardization), transect geometry embedded as
    the 6 per-band literals (the control-flow re-pick draws), per-cell
    projection index from identical literal expression trees (floor of a
    small fixed tree — bit-stable), field micro-quantized at 1e-6: DuckDB
    reassociates float folds, but the drift (~1e-8 after x1e6) sits three
    orders under the fixture's nearest rounding boundary (4.5e-6)."""
    from ..rasterdefs import _probit_sql
    from .sqlgen import sm64

    rows, cols = GRID1.rows, GRID1.cols
    diag = int(np.sqrt(rows * rows + cols * cols))
    fhs = int(_TB_RANGE / (2.0 * GRID1.res_x))
    fsz = fhs * 2 + 1
    w = float(np.sqrt(36.0 / (fhs * (fhs + 1) * fsz)))
    bands, _diag = tb_bands(rows, cols, GRID1.res_x, iterations=_TB_ITER,
                            rng=_TB_RANGE, seed=_TB_SEED)
    assert _diag == diag
    geom = ", ".join(
        f"({b},{ls!r},{li!r},{ps!r},{sd!r},{sx!r},{sy!r})"
        for b, (_y, ls, li, ps, sd, sx, sy) in enumerate(bands))
    u01 = (f"(CAST(({sm64(f'CAST(j + {_TB_SEED} + b*1000003 AS UBIGINT)')}"
           f" >> 11) AS DOUBLE) / {float(1 << 53)!r})")
    fold = "0.0"
    for k in range(fsz):
        m = k - fhs
        lead = (f"COALESCE(LEAD(t, {k}) OVER (PARTITION BY b ORDER BY j), "
                f"0.0)" if k else "t")
        fold = f"({fold} + {float(m)!r} * {lead})"
    return f"""
    WITH bt AS MATERIALIZED (
      SELECT b.b, CAST(t.i AS BIGINT) AS j,
             {_probit_sql(u01)} AS t
      FROM range({_TB_ITER}) b(b) CROSS JOIN range({diag}) t(i)
    ),
    y0 AS MATERIALIZED (
      SELECT b, j, {w!r} * {fold} AS y FROM bt
    ),
    moms AS MATERIALIZED (
      SELECT b, SUM(y) / {diag} AS mean,
             SQRT(SUM(y*y) / {diag} - (SUM(y) / {diag}) * (SUM(y) / {diag}))
                 AS stdev
      FROM y0 GROUP BY b
    ),
    ys AS MATERIALIZED (
      SELECT y0.b, y0.j, (y0.y - m.mean) / m.stdev AS y
      FROM y0 JOIN moms m ON m.b = y0.b
    ),
    geom(b, ls, li, ps, sd, sx, sy) AS (
      SELECT * FROM (VALUES {geom}) t(a,b2,c,d,e,f,g)
    ),
    proj AS (
      SELECT CAST(t.i AS BIGINT) AS cell_id, g.b,
             LEAST(GREATEST(CAST(FLOOR(SQRT(
               (((t.i // {cols}) - g.ps * (t.i % {cols}) - g.li) / g.sd
                - g.sx)
               * (((t.i // {cols}) - g.ps * (t.i % {cols}) - g.li) / g.sd
                  - g.sx)
               + (g.ls * (((t.i // {cols}) - g.ps * (t.i % {cols}) - g.li)
                          / g.sd) - g.li - g.sy)
               * (g.ls * (((t.i // {cols}) - g.ps * (t.i % {cols}) - g.li)
                          / g.sd) - g.li - g.sy)
             )) AS BIGINT), 0), {diag - 1}) AS p
      FROM range({rows * cols}) t(i) CROSS JOIN geom g
    )
    SELECT p.cell_id,
           CAST(FLOOR(SUM(y.y) / 4.0 * 1e6 + 0.5) AS BIGINT) AS field_u
    FROM proj p JOIN ys y ON y.b = p.b AND y.j = p.p
    GROUP BY p.cell_id
    """


@query("turning_bands", _tb_sql())
def turning_bands(sf_dir: str):
    """TurningBandsSimulation (math_stat_analysis/turning_bands.rs:265-505):
    16 bands, range 24 over the synthetic grid. Output (cell_id, field_u)
    micro-quantized int64. SQL oracle: _tb_sql (bands recomputed in SQL);
    scalar band/projection oracle in tests/test_mathops5.py."""
    from ..stages.raster import synth_raster_tiles

    bands, diag = tb_bands(GRID1.rows, GRID1.cols, GRID1.res_x,
                           iterations=_TB_ITER, rng=_TB_RANGE,
                           seed=_TB_SEED)
    bands_ref = ray.put((bands, diag))
    rooted = float(np.sqrt(_TB_ITER))

    def project(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.spatial_join import _cached_get

        bds, dg = _cached_get(bands_ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            acc = np.zeros((nr, nc))
            for y, ls, li, ps, sd, sx, sy in bds:
                pi = rr - ps * cc
                ix = (pi - li) / sd
                iy = ls * ix - li
                p = np.sqrt((ix - sx) ** 2 + (iy - sy) ** 2).astype(np.int64)
                p = np.clip(p, 0, dg - 1)
                acc += y[p]
            frames.append(pd.DataFrame({
                "cell_id": (rr * GRID1.cols + cc).ravel(),
                "field_u": np.floor((acc / rooted).ravel() * 1e6 + 0.5)
                .astype(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    tiles = synth_raster_tiles(GRID1, lambda c: np.zeros(len(c)))
    return tiles.map_batches(project, batch_format="pandas")
