"""Star-polygon fixture shared by queries_overlay / queries_data2 /
queries_overlay2 (leaf module: worker closures entry-import the defining
query modules, so shared fixtures must not live in a module that imports
pipelines.queries — the hydrodefs.py rule). Bit-identical splitmix64 vertex
trees on the numpy and SQL sides."""

from __future__ import annotations

import numpy as np

from .sources.synthetic import splitmix64
from .pipelines.sqlgen import add64, sm64

N_PAIRS = 200
STAR_K = 12
_SALT = 424243
PROBE_N = 5  # 5x5 probe grid per pair

# fixed unit directions — the SAME doubles go into numpy and into the SQL
STAR_DIRS = [(float(np.cos(2.0 * np.pi * k / STAR_K)),
              float(np.sin(2.0 * np.pi * k / STAR_K))) for k in range(STAR_K)]


def _units(h: np.ndarray, off: int) -> np.ndarray:
    return (splitmix64(h + np.uint64(off)) % np.uint64(1 << 30)) \
        .astype(np.float64) / float(1 << 30)


def star_rings(pair_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, K+1, 2) closed rings for A and B of each pair."""
    h = splitmix64(pair_ids.astype(np.uint64) + np.uint64(_SALT))
    h2 = splitmix64(h + np.uint64(999))
    n = len(pair_ids)

    def ring(hh, cx, cy):
        out = np.empty((n, STAR_K + 1, 2))
        for k in range(STAR_K):
            u = _units(hh, 10 + k)
            r = np.where(k % 2 == 0, 0.4 + u * 0.5, 1.2 + u * 0.8)
            out[:, k, 0] = cx + STAR_DIRS[k][0] * r
            out[:, k, 1] = cy + STAR_DIRS[k][1] * r
        out[:, STAR_K] = out[:, 0]
        return out

    cxa = _units(h, 1) * 300.0 - 150.0
    cya = _units(h, 2) * 140.0 - 70.0
    cxb = cxa + (_units(h, 3) * 3.0 - 1.5)
    cyb = cya + (_units(h, 4) * 3.0 - 1.5)
    return ring(h, cxa, cya), ring(h2, cxb, cyb)


def probe_grid(A: np.ndarray, B: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 25) probe x/y over each pair's joint vertex bbox."""
    allv = np.concatenate([A[:, :-1], B[:, :-1]], axis=1)
    xmin = allv[:, :, 0].min(axis=1)
    xmax = allv[:, :, 0].max(axis=1)
    ymin = allv[:, :, 1].min(axis=1)
    ymax = allv[:, :, 1].max(axis=1)
    jx, jy = np.meshgrid(np.arange(PROBE_N), np.arange(PROBE_N), indexing="ij")
    fx = (jx.ravel() + 0.5) / float(PROBE_N)
    fy = (jy.ravel() + 0.5) / float(PROBE_N)
    px = xmin[:, None] + fx[None, :] * (xmax - xmin)[:, None]
    py = ymin[:, None] + fy[None, :] * (ymax - ymin)[:, None]
    return px, py


def _star_sql() -> str:
    """CTEs: verts(pair, ring, k, x, y) for ring 0 = A, 1 = B."""
    hA = sm64(add64("CAST(p AS UBIGINT)", str(_SALT)))
    dirs = ", ".join(f"({k}, {dx!r}, {dy!r})" for k, (dx, dy) in enumerate(STAR_DIRS))

    def unit(hexpr: str, off: str) -> str:
        return (f"(CAST({sm64(add64(hexpr, off))} % 1073741824 AS DOUBLE)"
                f" / 1073741824.0)")

    return f"""
    dirs(k, dx, dy) AS (VALUES {dirs}),
    ph AS MATERIALIZED (
      SELECT p, h, {sm64(add64('h', '999'))} AS h2,
             {unit('h', '1')} * 300.0 - 150.0 AS cxa,
             {unit('h', '2')} * 140.0 - 70.0 AS cya
      FROM (SELECT i AS p, {hA} AS h FROM range({N_PAIRS}) t(i))
    ),
    centres AS MATERIALIZED (
      SELECT p, h, h2, cxa, cya,
             cxa + ({unit('h', '3')} * 3.0 - 1.5) AS cxb,
             cya + ({unit('h', '4')} * 3.0 - 1.5) AS cyb
      FROM ph
    ),
    verts AS MATERIALIZED (
      SELECT c.p AS pair_id, r.ring, d.k,
             CASE r.ring WHEN 0 THEN c.cxa ELSE c.cxb END
               + d.dx * CASE WHEN d.k % 2 = 0
                 THEN 0.4 + {unit("CASE r.ring WHEN 0 THEN c.h ELSE c.h2 END", "10 + d.k")} * 0.5
                 ELSE 1.2 + {unit("CASE r.ring WHEN 0 THEN c.h ELSE c.h2 END", "10 + d.k")} * 0.8 END AS x,
             CASE r.ring WHEN 0 THEN c.cya ELSE c.cyb END
               + d.dy * CASE WHEN d.k % 2 = 0
                 THEN 0.4 + {unit("CASE r.ring WHEN 0 THEN c.h ELSE c.h2 END", "10 + d.k")} * 0.5
                 ELSE 1.2 + {unit("CASE r.ring WHEN 0 THEN c.h ELSE c.h2 END", "10 + d.k")} * 0.8 END AS y
      FROM centres c, (SELECT 0 AS ring UNION ALL SELECT 1) r, dirs d
    )
    """




# --- pivoted outer-ring SQL fragments (shared by queries_shape2 and
# queries_shape3 at decorator time — leaf-resident per the hydrodefs rule)
_PIVOT = ", ".join(
    f"MAX(CASE WHEN k = {k} THEN x END) AS x{k}, "
    f"MAX(CASE WHEN k = {k} THEN y END) AS y{k}" for k in range(12))
_VX = f"vx AS (SELECT pair_id, {_PIVOT} FROM verts WHERE ring = 0 GROUP BY pair_id)"


def _shoelace(idx) -> str:
    terms = [f"(x{i} * y{j} - x{j} * y{i})"
             for i, j in zip(idx, idx[1:] + idx[:1])]
    return f"(0.5 * ABS({' + '.join(terms)}))"


_AREA = _shoelace(list(range(12)))
_MX = f"(({' + '.join(f'x{k}' for k in range(12))}) / 12.0)"
_MY = f"(({' + '.join(f'y{k}' for k in range(12))}) / 12.0)"
_SXX = f"({' + '.join(f'(x{k} - {_MX}) * (x{k} - {_MX})' for k in range(12))})"
_SYY = f"({' + '.join(f'(y{k} - {_MY}) * (y{k} - {_MY})' for k in range(12))})"
_SXY = f"({' + '.join(f'(x{k} - {_MX}) * (y{k} - {_MY})' for k in range(12))})"


# probe-grid + even-odd membership CTEs (shared by the overlay family
# and split_with_lines — leaf-resident per the hydrodefs rule)
PROBES_SQL = f"""
    bbox AS (
      SELECT pair_id, MIN(x) AS xmin, MAX(x) AS xmax,
             MIN(y) AS ymin, MAX(y) AS ymax
      FROM verts GROUP BY pair_id
    ),
    probes AS MATERIALIZED (
      SELECT b.pair_id, CAST(g.i AS BIGINT) AS probe_id,
             b.xmin + ((g.i // {PROBE_N}) + 0.5) / {float(PROBE_N)!r} * (b.xmax - b.xmin) AS px,
             b.ymin + ((g.i % {PROBE_N}) + 0.5) / {float(PROBE_N)!r} * (b.ymax - b.ymin) AS py
      FROM bbox b, range({PROBE_N * PROBE_N}) g(i)
    ),
    edges AS (
      SELECT v0.pair_id, v0.ring, v0.x AS x0, v0.y AS y0, v1.x AS x1, v1.y AS y1
      FROM verts v0 JOIN verts v1
        ON v1.pair_id = v0.pair_id AND v1.ring = v0.ring
       AND v1.k = (v0.k + 1) % {STAR_K}
    ),
    wind AS (
      SELECT p.pair_id, p.probe_id, e.ring,
        SUM(CASE WHEN e.y0 <= p.py AND e.y1 > p.py
                  AND (e.x1 - e.x0) * (p.py - e.y0) - (p.px - e.x0) * (e.y1 - e.y0) > 0
                 THEN 1 ELSE 0 END)
        - SUM(CASE WHEN e.y0 > p.py AND e.y1 <= p.py
                    AND (e.x1 - e.x0) * (p.py - e.y0) - (p.px - e.x0) * (e.y1 - e.y0) < 0
                   THEN 1 ELSE 0 END) AS wn
      FROM probes p JOIN edges e ON e.pair_id = p.pair_id
      GROUP BY p.pair_id, p.probe_id, e.ring
    ),
    membership AS (
      SELECT pair_id, probe_id,
             MAX(CASE WHEN ring = 0 THEN abs(wn) % 2 END) = 1 AS in_a,
             MAX(CASE WHEN ring = 1 THEN abs(wn) % 2 END) = 1 AS in_b
      FROM wind GROUP BY pair_id, probe_id
    )
"""
