"""Hydro sweep #10: InsertDams (hydro_analysis/insert_dams.rs).

For each dam point, every cell of the surrounding (dam_length)^2 window is
tried as a dam centre in the 4 profile directions (N-S, NE-SW, E-W,
SE-NW); the dam profile is 'filled' with the two-sided running-max rule
(insert_dams.rs:338-358), and the candidate whose filled elevation AT the
dam point is highest wins (strict >, row-major-then-direction scan order
replicated). The winning profile raises the DEM via max-combine —
order-independent across dam points — including the reference's literal
one-row-up widening quirk (centre always, profile cells on the diagonal
directions, :381-420).

Distributed shape: dam points are embarrassingly parallel — each map task
recomputes its local z window from the synthetic surface (zero exchange)
and emits raised-cell rows; one partial_agg max against the base surface
assembles the dammed DEM. Rows-only; scalar-literal oracle in
tests/test_hydro10.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hydrodefs import _GRAPH_CTES, _pour_cells
from ..layers import GRID1
from ..rasterdefs import _value_fn
from .queries import query
from .sqlgen import add64, sm64

_ROWS, _COLS = GRID1.rows, GRID1.cols
_DX = (1, 1, 1, 0, -1, -1, -1, 0)
_DY = (-1, 0, 1, 1, 1, 0, -1, -1)
_PERP1 = (2, 3, 4, 1)
_PERP2 = (6, 7, 0, 5)
DAM_LENGTH = 15
_HDL = DAM_LENGTH // 2  # half_dam_length


def _zat(r: int, c: int) -> float:
    if 0 <= r < _ROWS and 0 <= c < _COLS:
        return float(_value_fn(np.array([r * _COLS + c], np.int64))[0])
    return np.nan  # nodata


def dam_cells_for_point(target: int) -> list[tuple[int, float]]:
    """(cell_id, dam elevation) rows raised by the dam at ``target`` —
    the reference's per-point search, literal."""
    tr, tc = target // _COLS, target % _COLS
    dam_z = _zat(tr, tc)
    plen = 2 * _HDL + 1
    best = None  # (max_height, row, col, dir, filled)
    for row in range(tr - _HDL, tr + _HDL + 1):
        for col in range(tc - _HDL, tc + _HDL + 1):
            z = _zat(row, col)
            if np.isnan(z):
                continue
            for d in range(4):
                p1, p2 = _PERP1[d], _PERP2[d]
                prof = np.zeros(plen)
                prof[_HDL] = z
                hit, tcell = False, 0
                rn, cn, rn2, cn2 = row, col, row, col
                for i in range(1, _HDL + 1):
                    rn += _DY[p1]
                    cn += _DX[p1]
                    if rn == tr and cn == tc:
                        hit, tcell = True, _HDL + i
                    zn = _zat(rn, cn)
                    prof[_HDL + i] = zn if not np.isnan(zn) else -np.inf
                    rn2 += _DY[p2]
                    cn2 += _DX[p2]
                    if rn2 == tr and cn2 == tc:
                        hit, tcell = True, _HDL - i
                    zn = _zat(rn2, cn2)
                    prof[_HDL - i] = zn if not np.isnan(zn) else -np.inf
                if not hit:
                    continue
                filled = prof.copy()
                for i in range(1, plen - 1):
                    if filled[i - 1] > prof[i]:
                        filled[i] = filled[i - 1]
                for i in range(plen - 2, 0, -1):
                    if filled[i + 1] > prof[i]:
                        if filled[i + 1] < filled[i]:
                            filled[i] = filled[i + 1]
                    else:
                        filled[i] = prof[i]
                if best is None or filled[tcell] > best[0]:
                    best = (filled[tcell], row, col, d, filled.copy())
    rows: list[tuple[int, float]] = []
    if best is None or best[0] <= dam_z:
        return rows
    _h, drow, dcol, ddir, filled = best
    p1, p2 = _PERP1[ddir], _PERP2[ddir]

    def raise_cell(r, c, v):
        if 0 <= r < _ROWS and 0 <= c < _COLS:
            rows.append((r * _COLS + c, float(v)))

    raise_cell(drow, dcol, filled[_HDL])
    raise_cell(drow - 1, dcol, filled[_HDL])  # reference widening quirk
    rn, cn, rn2, cn2 = drow, dcol, drow, dcol
    for i in range(1, _HDL + 1):
        rn += _DY[p1]
        cn += _DX[p1]
        if not np.isnan(_zat(rn, cn)):
            raise_cell(rn, cn, filled[_HDL + i])
            if ddir in (0, 2):
                raise_cell(rn - 1, cn, filled[_HDL + i])
        rn2 += _DY[p2]
        cn2 += _DX[p2]
        if not np.isnan(_zat(rn2, cn2)):
            raise_cell(rn2, cn2, filled[_HDL - i])
            if ddir in (0, 2):
                raise_cell(rn2 - 1, cn2, filled[_HDL - i])
    return rows


_POUR_SEED_H10 = 909090
_NEG = -10**15


def _dam_win_ctes() -> str:
    """CTE text through `winkeep` (the winning dam candidate per pour
    point): the reference's per-cell 4-direction search reduced to the 56
    candidates whose profile CONTAINS the target (centre = target - m*dir,
    m in ±1..7), with the two-sided running-max profile fill in closed
    form — filled[k] = min(prefix max, suffix max) (provably equal to the
    reference's forward/backward scan pair) — and the strict-first
    argmax as (fillv DESC, row, col, d). Shared by insert_dams and
    impoundment_index."""
    hdl, rows, cols = _HDL, _ROWS, _COLS
    dirvals = ", ".join(f"({d},{_DY[_PERP1[d]]},{_DX[_PERP1[d]]})"
                        for d in range(4))
    return f"""
    pour_h AS MATERIALIZED (
      SELECT CAST(t.i AS BIGINT) AS pour_id,
             {sm64(add64('CAST(t.i AS UBIGINT)', str(_POUR_SEED_H10)))} AS h
      FROM range({len(_pour_cells())}) t(i)
    ),
    dtargets AS MATERIALIZED (
      SELECT pour_id,
             (1 + CAST(h % {rows - 2} AS BIGINT)) AS tr,
             (1 + CAST({sm64('h')} % {cols - 2} AS BIGINT)) AS tc
      FROM pour_h
    ),
    ddirs(d, dy, dx) AS (SELECT * FROM (VALUES {dirvals}) t(a,b,c)),
    dms(m) AS (SELECT t.i - {hdl} FROM range({2*hdl+1}) t(i)
               WHERE t.i != {hdl}),
    dcand AS (
      SELECT g.pour_id, g.tr, g.tc, d.d, d.dy, d.dx,
             g.tr - m.m * d.dy AS row, g.tc - m.m * d.dx AS col,
             {hdl} + m.m AS tcell
      FROM dtargets g CROSS JOIN ddirs d CROSS JOIN dms m
      WHERE g.tr - m.m * d.dy BETWEEN 0 AND {rows-1}
        AND g.tc - m.m * d.dx BETWEEN 0 AND {cols-1}
    ),
    dks(k) AS (SELECT t.i FROM range({2*hdl+1}) t(i)),
    dprof AS (
      SELECT c.*, k.k,
             CASE WHEN c.row + (k.k - {hdl}) * c.dy BETWEEN 0 AND {rows-1}
                   AND c.col + (k.k - {hdl}) * c.dx BETWEEN 0 AND {cols-1}
                  THEN ((c.row + (k.k - {hdl}) * c.dy) * {cols}
                        + c.col + (k.k - {hdl}) * c.dx) * 1000003 % 1000
                  ELSE {_NEG} END AS zk
      FROM dcand c CROSS JOIN dks k
    ),
    dfilled AS (
      SELECT pour_id, tr, tc, d, dy, dx, row, col, tcell,
             LEAST(MAX(CASE WHEN k <= tcell THEN zk END),
                   MAX(CASE WHEN k >= tcell THEN zk END)) AS fillv
      FROM dprof GROUP BY ALL
    ),
    dwin AS MATERIALIZED (
      SELECT * FROM (
        SELECT f.*,
               row_number() OVER (PARTITION BY pour_id
                                  ORDER BY fillv DESC, row, col, d) AS rn
        FROM dfilled f
      ) WHERE rn = 1
    ),
    winkeep AS MATERIALIZED (
      SELECT w.* FROM dwin w
      WHERE w.fillv > (w.tr * {cols} + w.tc) * 1000003 % 1000
    )"""


_INSERT_DAMS_SQL = f"""
    WITH {_dam_win_ctes()},
    wprof AS (
      SELECT w.pour_id, w.d, w.row, w.col, k.k,
             w.row + (k.k - {_HDL}) * w.dy AS pr,
             w.col + (k.k - {_HDL}) * w.dx AS pc,
             CASE WHEN w.row + (k.k - {_HDL}) * w.dy
                       BETWEEN 0 AND {_ROWS-1}
                   AND w.col + (k.k - {_HDL}) * w.dx
                       BETWEEN 0 AND {_COLS-1}
                  THEN ((w.row + (k.k - {_HDL}) * w.dy) * {_COLS}
                        + w.col + (k.k - {_HDL}) * w.dx) * 1000003 % 1000
                  ELSE {_NEG} END AS zk
      FROM winkeep w CROSS JOIN dks k
    ),
    wfill AS MATERIALIZED (
      SELECT a.pour_id, a.d, a.pr, a.pc, a.k,
             LEAST(MAX(CASE WHEN b.k <= a.k THEN b.zk END),
                   MAX(CASE WHEN b.k >= a.k THEN b.zk END)) AS fv,
             MAX(a.zk) AS zk
      FROM wprof a JOIN wprof b
        ON b.pour_id = a.pour_id AND b.d = a.d
       AND b.row = a.row AND b.col = a.col
      GROUP BY a.pour_id, a.d, a.pr, a.pc, a.k
    ),
    raises AS (
      SELECT pr * {_COLS} + pc AS cell_id, fv AS zdam FROM wfill
      WHERE zk != {_NEG} AND pr BETWEEN 0 AND {_ROWS-1}
        AND pc BETWEEN 0 AND {_COLS-1}
      UNION ALL
      SELECT (pr - 1) * {_COLS} + pc, fv FROM wfill
      WHERE zk != {_NEG} AND pr - 1 BETWEEN 0 AND {_ROWS-1}
        AND pc BETWEEN 0 AND {_COLS-1}
        AND (k = {_HDL} OR d IN (0, 2))
    ),
    dbase AS (
      SELECT CAST(t.i AS BIGINT) AS cell_id,
             CAST(t.i * 1000003 % 1000 AS BIGINT) AS zdam
      FROM range({_ROWS * _COLS}) t(i)
    )
    SELECT cell_id, CAST(MAX(zdam) AS DOUBLE) AS zdam
    FROM (SELECT * FROM dbase UNION ALL SELECT * FROM raises)
    GROUP BY cell_id
"""


@query("insert_dams", _INSERT_DAMS_SQL)
def insert_dams(sf_dir: str):
    """InsertDams (hydro_analysis/insert_dams.rs:248-430) at the 12 pour
    points, dam_length 15. Output (cell_id, zdam) float64 for the FULL
    grid (max of base z and every dam profile covering the cell).
    SQL oracle: _dam_win_ctes closed-form water-fill search + widening
    quirk; independent scalar oracle also in tests/test_hydro10.py."""
    from ..relational import partial_agg
    from ..stages.raster import synth_raster_tiles

    pts = ray.data.from_pandas(pd.DataFrame({
        "target": _pour_cells().astype(np.int64)})).repartition(4)

    def per_point(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df["target"].tolist():
            rows = dam_cells_for_point(int(t))
            if rows:
                cid, v = zip(*rows)
                frames.append(pd.DataFrame({
                    "cell_id": np.asarray(cid, np.int64),
                    "zdam": np.asarray(v, np.float64)}))
        if not frames:
            return pd.DataFrame({"cell_id": np.empty(0, np.int64),
                                 "zdam": np.empty(0, np.float64)})
        return pd.concat(frames, ignore_index=True)

    raised = pts.map_batches(per_point, batch_format="pandas")

    def base(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = (rr * _COLS + cc).ravel()
            frames.append(pd.DataFrame({
                "cell_id": cid, "zdam": np.asarray(t.data, np.float64)}))
        return pd.concat(frames, ignore_index=True)

    base_ds = synth_raster_tiles(GRID1, _value_fn).map_batches(
        base, batch_format="pandas")
    return partial_agg(raised.union(base_ds), ["cell_id"],
                       [("zdam", "max", "zdam")])


def _best_dam(target: int):
    """(crest, row, col, dir, filled) of the winning dam at ``target`` —
    shared by insert_dams and the impoundment index."""
    # identical search loop to dam_cells_for_point, returning the winner
    tr, tc = target // _COLS, target % _COLS
    plen = 2 * _HDL + 1
    best = None
    for row in range(tr - _HDL, tr + _HDL + 1):
        for col in range(tc - _HDL, tc + _HDL + 1):
            z = _zat(row, col)
            if np.isnan(z):
                continue
            for d in range(4):
                p1, p2 = _PERP1[d], _PERP2[d]
                prof = np.zeros(plen)
                prof[_HDL] = z
                hit, tcell = False, 0
                rn, cn, rn2, cn2 = row, col, row, col
                for i in range(1, _HDL + 1):
                    rn += _DY[p1]
                    cn += _DX[p1]
                    if rn == tr and cn == tc:
                        hit, tcell = True, _HDL + i
                    zn = _zat(rn, cn)
                    prof[_HDL + i] = zn if not np.isnan(zn) else -np.inf
                    rn2 += _DY[p2]
                    cn2 += _DX[p2]
                    if rn2 == tr and cn2 == tc:
                        hit, tcell = True, _HDL - i
                    zn = _zat(rn2, cn2)
                    prof[_HDL - i] = zn if not np.isnan(zn) else -np.inf
                if not hit:
                    continue
                filled = prof.copy()
                for i in range(1, plen - 1):
                    if filled[i - 1] > prof[i]:
                        filled[i] = filled[i - 1]
                for i in range(plen - 2, 0, -1):
                    if filled[i + 1] > prof[i]:
                        if filled[i + 1] < filled[i]:
                            filled[i] = filled[i + 1]
                    else:
                        filled[i] = prof[i]
                if best is None or filled[tcell] > best[0]:
                    best = (filled[tcell], row, col, d, filled.copy())
    return best


def _d8_down_local(cells_r: np.ndarray, cells_c: np.ndarray) -> np.ndarray:
    """D8 down-cell of each (r, c) — evaluated from the synthetic surface
    (d8_pointer.rs semantics: steepest strictly positive slope, first in
    scan order wins)."""
    z0 = _value_fn(cells_r * _COLS + cells_c)
    best_s = np.full(len(cells_r), -np.inf)
    down = np.full(len(cells_r), -1, np.int64)
    diag = np.sqrt(2.0)
    for i in range(8):
        nr, nc = cells_r + _DY[i], cells_c + _DX[i]
        ok = (nr >= 0) & (nr < _ROWS) & (nc >= 0) & (nc < _COLS)
        zn = np.where(ok, _value_fn(np.where(ok, nr * _COLS + nc, 0)), np.nan)
        ln = diag if (_DX[i] and _DY[i]) else 1.0
        s = (z0 - zn) / ln
        take = ok & ~np.isnan(zn) & (s > 0) & (s > best_s)
        best_s = np.where(take, s, best_s)
        down = np.where(take, nr * _COLS + nc, down)
    return down


_ISI_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_dam_win_ctes()},
    crest AS MATERIALIZED (
      SELECT t.pour_id, t.tr * {_COLS} + t.tc AS target,
             (t.tr * {_COLS} + t.tc) * 1000003 % 1000 AS tz,
             w.fillv
      FROM dtargets t LEFT JOIN winkeep w ON w.pour_id = t.pour_id
    ),
    flood(pour_id, cell) AS (
      SELECT pour_id, target FROM crest WHERE fillv IS NOT NULL
      UNION
      SELECT f.pour_id, g.cell_id FROM flood f
      JOIN graph g ON g.down_id = f.cell
      JOIN crest ct ON ct.pour_id = f.pour_id
      WHERE (g.cell_id * 1000003 % 1000) < ct.fillv
    ),
    stats AS (
      SELECT pour_id, COUNT(*) AS area,
             SUM(CAST(c2.fillv - (f.cell * 1000003 % 1000) AS DOUBLE))
                 AS volume
      FROM flood f JOIN crest c2 USING (pour_id) GROUP BY pour_id
    )
    SELECT c.pour_id,
           CAST(COALESCE(c.fillv, c.tz) AS DOUBLE) AS crest,
           COALESCE(s.area, 0) AS area,
           COALESCE(s.volume, 0.0) AS volume
    FROM crest c LEFT JOIN stats s ON s.pour_id = c.pour_id
"""


@query("impoundment_index", _ISI_SQL)
def impoundment_index(sf_dir: str):
    """ImpoundmentSizeIndex (hydro_analysis/impoundment_index.rs, Lindsay
    2015) at the 12 sampled pour points (the sampled-viewpoint contract of
    visibility_index): per point the winning dam crest (insert_dams
    machinery) and the impounded region = upstream D8 BFS from the dam
    point over cells strictly below the crest; outputs flood area (cells)
    and volume (sum of crest - z). Each point is one parallel task; the
    BFS evaluates pointers locally from the synthetic surface (zero
    exchange). Rows-only; a whole-grid fixpoint re-derivation checks the
    flood region in tests/test_hydro10.py."""

    pts = ray.data.from_pandas(pd.DataFrame({
        "pour_id": np.arange(len(_pour_cells()), dtype=np.int64),
        "target": _pour_cells().astype(np.int64)})).repartition(4)

    def isi(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pid, t in zip(df["pour_id"].tolist(), df["target"].tolist()):
            best = _best_dam(int(t))
            tz = _zat(int(t) // _COLS, int(t) % _COLS)
            if best is None or best[0] <= tz:
                rows.append({"pour_id": pid, "crest": tz, "area": 0,
                             "volume": 0.0})
                continue
            crest = best[0]
            flood = {int(t)}
            frontier = [int(t)]
            while frontier:
                cand = []
                for cur in frontier:
                    r, c = cur // _COLS, cur % _COLS
                    for i in range(8):
                        nr, nc = r + _DY[i], c + _DX[i]
                        if 0 <= nr < _ROWS and 0 <= nc < _COLS:
                            u = nr * _COLS + nc
                            if u not in flood:
                                cand.append(u)
                if not cand:
                    break
                cand = np.unique(np.asarray(cand, np.int64))
                down = _d8_down_local(cand // _COLS, cand % _COLS)
                zc = _value_fn(cand)
                take = np.array([d in flood for d in down.tolist()]) \
                    & (zc < crest)
                nxt = cand[take]
                if not len(nxt):
                    break
                flood.update(nxt.tolist())
                frontier = nxt.tolist()
            fl = np.fromiter(flood, np.int64, len(flood))
            zf = _value_fn(fl)
            rows.append({"pour_id": pid, "crest": float(crest),
                         "area": int(len(fl)),
                         "volume": float((crest - zf).sum())})
        return pd.DataFrame(rows)

    return pts.map_batches(isi, batch_format="pandas")
