"""Plugin-crate sweep #1 (whitebox-plugins/src/): Rho8FlowAccumulation,
OtsuThresholding, MaxUpslopeValue, EdgeContamination, ConditionalEvaluation
and RasterCalculator — the highest-traffic members of the 24-tool plugin
crate (round-3 VERDICT item 5).

All run over the shared GRID1 synthetic DEM (v = (cell*1000003) % 1000),
so every oracle is a pure SQL reconstruction. Rho8's random diagonal
jitter is DERANDOMIZED with splitmix64(cell*8 + i) (the same documented
contract as the RANSAC entry) — both numpy and DuckDB derive u in (0, 1]
from identical uint64->double casts, so the float slope comparisons are
bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hydrodefs import _D8_DX, _D8_DY, _GRAPH_CTES
from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _horn_pq_sql, _value_fn
from ..sources.synthetic import splitmix64
from .queries import query
from .sqlgen import sm64, synth_segments_cte

_ROWS, _COLS = GRID1.rows, GRID1.cols
_TWO64 = 18446744073709551616.0


def _vfn_b(cells: np.ndarray) -> np.ndarray:
    """Second co-registered synthetic raster (the repo's 'values' layer)."""
    return ((np.asarray(cells, np.int64) * 7919 + 13) % 1000)


# --------------------------------------------------------------------------
# Rho8FlowAccumulation (whitebox-plugins/src/rho8_flow_accumulation/
# main.rs:255-300): single-flow pointer where diagonal slopes are divided
# by (2 - U[0,1)) — derandomized to U = splitmix64(cell*8 + i) / 2^64 —
# then the D8-style cell-count accumulation over those pointers.
# --------------------------------------------------------------------------
def rho8_down(cells: np.ndarray) -> np.ndarray:
    """Vectorized rho8 pointer: down cell id or -1 (scan-order strict-max
    tie rule, slope must be positive)."""
    cells = np.asarray(cells, np.int64)
    r = cells // _COLS
    c = cells % _COLS
    z = _value_fn(cells)
    best = np.full(len(cells), -np.inf)
    down = np.full(len(cells), -1, np.int64)
    for i in range(8):
        nr, nc = r + _D8_DY[i], c + _D8_DX[i]
        ok = (nr >= 0) & (nr < _ROWS) & (nc >= 0) & (nc < _COLS)
        u = np.where(ok, nr * _COLS + nc, 0)
        zn = _value_fn(u)
        dz = z - zn
        if _D8_DX[i] != 0 and _D8_DY[i] != 0:  # diagonal: rho jitter
            h = splitmix64((cells * 8 + i).astype(np.uint64))
            uu = h.astype(np.float64) / _TWO64
            slope = dz / (2.0 - uu)
        else:
            slope = dz.astype(np.float64)
        upd = ok & (slope > best) & (slope > 0.0)
        best = np.where(upd, slope, best)
        down = np.where(upd, u, down)
    return down


def _rho8_sql() -> str:
    arms = []
    for i in range(8):
        dx, dy = _D8_DX[i], _D8_DY[i]
        guard = (f"a.r + ({dy}) >= 0 AND a.r + ({dy}) < {_ROWS} "
                 f"AND a.c + ({dx}) >= 0 AND a.c + ({dx}) < {_COLS}")
        if dx != 0 and dy != 0:
            h = sm64(f"CAST(a.cell_id * 8 + {i} AS UBIGINT)")
            slope = (f"(CAST(a.v - b.v AS DOUBLE) "
                     f"/ (2.0 - CAST({h} AS DOUBLE) / {_TWO64!r}))")
        else:
            slope = "CAST(a.v - b.v AS DOUBLE)"
        arms.append(
            f"SELECT a.cell_id, {i} AS i, b.cell_id AS down_id, "
            f"{slope} AS slope FROM cells a JOIN cells b "
            f"ON b.r = a.r + ({dy}) AND b.c = a.c + ({dx}) WHERE {guard}")
    return f"""
    rslopes AS MATERIALIZED ({' UNION ALL '.join(arms)}),
    rbest AS MATERIALIZED (
      SELECT cell_id, down_id FROM rslopes WHERE slope > 0
      QUALIFY row_number() OVER (PARTITION BY cell_id
                                 ORDER BY slope DESC, i ASC) = 1
    ),
    rgraph AS MATERIALIZED (
      SELECT c.cell_id, CAST(COALESCE(b.down_id, -1) AS BIGINT) AS down_id
      FROM cells c LEFT JOIN rbest b ON b.cell_id = c.cell_id
    )"""


@query(
    "rho8_flow_accum",
    f"""
    WITH RECURSIVE {_CELLS_CTE},
    {_rho8_sql()},
    rwalk(start, cur) AS (
      SELECT cell_id, down_id FROM rgraph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM rwalk w
      JOIN rgraph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )
    SELECT g.cell_id, 1 + COALESCE(p.n, 0) AS acc
    FROM rgraph g
    LEFT JOIN (SELECT cur, COUNT(*) AS n FROM rwalk GROUP BY cur) p
      ON p.cur = g.cell_id
    """,
)
def rho8_flow_accum(sf_dir: str):
    """Rho8FlowAccumulation (whitebox-plugins/src/rho8_flow_accumulation/
    main.rs): Fairfield & Leymarie stochastic single-flow pointers
    (derandomized, module docstring) + cell-count accumulation on the
    Pregel shard wave."""
    from ..stages.flow import tile_of_expr
    from ..stages.pregel import flow_accumulation_pregel

    def gen(batch: dict) -> pd.DataFrame:
        cid = batch["id"].astype(np.int64)
        return pd.DataFrame({"cell_id": cid, "down_id": rho8_down(cid),
                             "tile": tile_of_expr(cid, GRID1, 64)})

    dds = ray.data.range(_ROWS * _COLS, override_num_blocks=8) \
        .map_batches(gen, batch_format="numpy")
    return flow_accumulation_pregel(dds, GRID1)


# --------------------------------------------------------------------------
# OtsuThresholding (whitebox-plugins/src/otsu_thresholding/main.rs:298-340):
# histogram -> between-class variance argmax (strict >, so ties keep the
# LOWEST bin) -> binary image. The variance ordering is computed in both
# engines from the same exactly-representable doubles:
# num = S0*(nt-n0) - (st-S0)*n0 (|num| < 2^53), var ~ num^2 / (n0*(nt-n0)).
# --------------------------------------------------------------------------
@query(
    "otsu_thresholding",
    f"""
    WITH {_CELLS_CTE},
    h AS (SELECT CAST(v AS BIGINT) AS bin, COUNT(*) AS n
          FROM cells GROUP BY 1),
    b AS (SELECT bin, SUM(n) OVER (ORDER BY bin) AS cn,
                 SUM(bin * n) OVER (ORDER BY bin) AS cs
          FROM h),
    tot AS (SELECT SUM(n) AS nt, SUM(bin * n) AS st FROM h),
    vv AS (
      SELECT bin,
             pow(CAST(cs * (nt - cn) - (st - cs) * cn AS DOUBLE), 2)
             / (CAST(cn AS DOUBLE) * (nt - cn)) AS var
      FROM b, tot WHERE cn > 0 AND cn < nt
    ),
    thr AS (SELECT bin FROM vv
            QUALIFY row_number() OVER (ORDER BY var DESC, bin ASC) = 1)
    SELECT cell_id, CAST(v > (SELECT bin FROM thr) AS BIGINT) AS fg
    FROM cells
    """,
)
def otsu_thresholding(sf_dir: str):
    """OtsuThresholding (whitebox-plugins/src/otsu_thresholding/main.rs):
    distributed histogram (partial_agg over integer bins), driver-side
    argmax over the 1000-row histogram (exact: |num| < 2^53 so the float
    variance ordering is reproducible), binary classification per cell."""
    from ..relational import partial_agg
    from ..stages.raster import synth_raster_tiles

    tiles = synth_raster_tiles(GRID1, _value_fn)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for t in df.itertuples():
            vals, cnt = np.unique(np.asarray(t.data, np.int64),
                                  return_counts=True)
            outs.append(pd.DataFrame({"bin": vals, "n": cnt}))
        return pd.concat(outs, ignore_index=True)

    hdf = partial_agg(tiles.map_batches(hist, batch_format="pandas"),
                      ["bin"], [("n", "sum", "n")]).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    n = hdf["n"].to_numpy(np.int64)
    bins = hdf["bin"].to_numpy(np.int64)
    cn = np.cumsum(n)
    cs = np.cumsum(bins * n)
    nt, st = int(cn[-1]), int(cs[-1])
    ok = (cn > 0) & (cn < nt)
    num = (cs * (nt - cn) - (st - cs) * cn).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        var = num * num / (cn.astype(np.float64) * (nt - cn))
    var = np.where(ok, var, -np.inf)
    t_bin = int(bins[np.argmax(var)])  # first max = lowest bin on ties

    def classify(batch: dict) -> pd.DataFrame:
        cid = batch["id"].astype(np.int64)
        return pd.DataFrame({"cell_id": cid,
                             "fg": (_value_fn(cid) > t_bin).astype(np.int64)})

    return ray.data.range(_ROWS * _COLS, override_num_blocks=8) \
        .map_batches(classify, batch_format="numpy")


# --------------------------------------------------------------------------
# MaxUpslopeValue + EdgeContamination: the (max) semiring on the D8 DAG.
# --------------------------------------------------------------------------
_WALK_CTE = """
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    )"""


@query(
    "max_upslope_value",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_CTE},
    vals AS (SELECT cell_id, (cell_id * 7919 + 13) % 1000 AS w FROM cells),
    up AS (SELECT w.cur AS cell_id, MAX(v.w) AS mx
           FROM walk w JOIN vals v ON v.cell_id = w.start GROUP BY w.cur)
    SELECT v.cell_id, CAST(GREATEST(v.w, COALESCE(u.mx, v.w)) AS BIGINT)
           AS max_up
    FROM vals v LEFT JOIN up u ON u.cell_id = v.cell_id
    """,
)
def max_upslope_value(sf_dir: str):
    """MaxUpslopeValue (whitebox-plugins/src/max_upslope_value/main.rs:
    276-366): output starts as the values raster and every cell pushes its
    running max down its D8 pointer — max over upslope-or-equal cells.
    In-degree-gated level wave in the max semiring
    (stages/pregel.max_value_accumulation_pregel)."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import max_value_accumulation_pregel
    from .queries_raster import d8_pointer

    dds = down_ds_from_pointer(d8_pointer(sf_dir), GRID1)
    return max_value_accumulation_pregel(dds, _vfn_b, GRID1)


@query(
    "edge_contamination",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_CTE},
    border AS (SELECT cell_id FROM cells
               WHERE r = 0 OR r = {_ROWS - 1} OR c = 0 OR c = {_COLS - 1}),
    reach AS (SELECT DISTINCT w.cur AS cell_id FROM walk w
              JOIN border b ON b.cell_id = w.start)
    SELECT c.cell_id,
           CAST(b.cell_id IS NOT NULL OR rr.cell_id IS NOT NULL AS BIGINT)
             AS contaminated
    FROM cells c
    LEFT JOIN border b ON b.cell_id = c.cell_id
    LEFT JOIN reach rr ON rr.cell_id = c.cell_id
    """,
)
def edge_contamination(sf_dir: str):
    """EdgeContamination (whitebox-plugins/src/edge_contamination/main.rs):
    cells whose upslope area touches the raster border — the same max-
    semiring wave with the border indicator as the value layer."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import max_value_accumulation_pregel
    from .queries_raster import d8_pointer

    def border_fn(cells: np.ndarray) -> np.ndarray:
        cells = np.asarray(cells, np.int64)
        r = cells // _COLS
        c = cells % _COLS
        return ((r == 0) | (r == _ROWS - 1) | (c == 0)
                | (c == _COLS - 1)).astype(np.int64)

    dds = down_ds_from_pointer(d8_pointer(sf_dir), GRID1)
    out = max_value_accumulation_pregel(dds, border_fn, GRID1)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "contaminated": df["max_up"].to_numpy(np.int64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# ConditionalEvaluation + RasterCalculator: the raster expression engine
# (stages/rastercalc.py) on real expression strings.
# --------------------------------------------------------------------------
@query(
    "conditional_evaluation",
    f"""
    WITH {_CELLS_CTE}
    SELECT cell_id,
           CAST(CASE WHEN CAST(v AS BIGINT) % 7 < 3
                     THEN CAST(v AS BIGINT) * 2
                     ELSE CAST(v AS BIGINT) - 500 END AS BIGINT) AS value
    FROM cells
    """,
)
def conditional_evaluation(sf_dir: str):
    """ConditionalEvaluation (whitebox-plugins/src/conditional_evaluation/
    main.rs): IF cond THEN a ELSE b per cell, through the tile-parallel
    expression engine (stages/rastercalc.raster_expression) — the round-3
    VERDICT item 'a real raster-expression entry'."""
    from ..stages.rastercalc import raster_expression

    return raster_expression(
        GRID1, {"z": _value_fn},
        "where(z % 7 < 3, z * 2, z - 500)")


@query(
    "raster_calculator",
    f"""
    WITH {_CELLS_CTE},
    bb AS (SELECT cell_id, (cell_id * 7919 + 13) % 1000 AS w FROM cells)
    SELECT c.cell_id,
           CAST((CAST(c.v AS BIGINT) - bb.w) * 2 + CAST(c.v AS BIGINT) % 10
                AS BIGINT) AS value
    FROM cells c JOIN bb ON bb.cell_id = c.cell_id
    """,
)
def raster_calculator(sf_dir: str):
    """RasterCalculator (whitebox-plugins/src/raster_calculator/main.rs):
    a multi-raster arithmetic expression through the same engine, two
    co-registered inputs."""
    from ..stages.rastercalc import raster_expression

    def zfn(cells: np.ndarray) -> np.ndarray:
        return _value_fn(cells).astype(np.int64)

    return raster_expression(
        GRID1, {"a": zfn, "b": _vfn_b},
        "(a - b) * 2 + a % 10")


# --------------------------------------------------------------------------
# Qin (2007) and Quinn (1995) multiple-flow-direction accumulation
# (whitebox-plugins/src/{qin,quinn}_flow_accumulation/main.rs:470-525).
# With the convergence threshold at its unbounded setting the weights are
# purely local: w_i = contour_i * slope_i^f over the downslope neighbours,
# f = max-slope-scaled exponent (Qin) or 1 (Quinn at threshold->inf).
# The *_weights entries are the SQL gate (fixed-point shares, bit-exact:
# both engines evaluate the same IEEE pow/div); the *_flow_accum entries
# run the conservation wave (rows-only, dense brute oracle in
# tests/test_plugins.py).
# --------------------------------------------------------------------------
_GL = tuple(1.4142135623730951 if (_D8_DX[i] and _D8_DY[i]) else 1.0
            for i in range(8))
_CL = tuple(0.354 if (_D8_DX[i] and _D8_DY[i]) else 0.5 for i in range(8))
_QIN_UP_EXP = 10.0
_QIN_LO_EXP = 1.1
_QIN_UP_SLOPE = 1.0  # tan(45 deg)
_ONE_FP = 1 << 20


def _mfd_weights(cells: np.ndarray, rows: int, cols: int, kind: str):
    """(ci, tgts, w_fp, pending): scan-ordered downslope edges with
    fixed-point weight shares, + upslope in-degree. kind in {qin, quinn}."""
    cells = np.asarray(cells, np.int64)
    r = cells // cols
    c = cells % cols
    z = _value_fn(cells)
    zn = np.full((len(cells), 8), np.nan)
    ncell = np.full((len(cells), 8), -1, np.int64)
    for i in range(8):
        nr, nc = r + _D8_DY[i], c + _D8_DX[i]
        ok = (nr >= 0) & (nr < rows) & (nc >= 0) & (nc < cols)
        u = nr * cols + nc
        ncell[ok, i] = u[ok]
        if ok.any():
            zn[ok, i] = _value_fn(u[ok])
    with np.errstate(invalid="ignore"):
        down = ~np.isnan(zn) & (zn < z[:, None])
        pending = (~np.isnan(zn) & (zn > z[:, None])).sum(axis=1)
        slope = (z[:, None] - zn) / np.asarray(_GL)[None, :]
    ci, ki = np.nonzero(down)
    s_e = slope[ci, ki]
    if kind == "qin":
        mx = np.where(down, slope, -np.inf).max(axis=1)
        f_c = np.minimum(mx, _QIN_UP_SLOPE) / _QIN_UP_SLOPE \
            * (_QIN_UP_EXP - _QIN_LO_EXP) + _QIN_LO_EXP
        w_e = np.asarray(_CL)[ki] * s_e ** f_c[ci]
    else:
        w_e = np.asarray(_CL)[ki] * s_e
    bounds = np.searchsorted(ci, np.arange(len(cells) + 1))
    has = bounds[1:] > bounds[:-1]
    tot = np.zeros(len(cells))
    if len(ci):
        tot[has] = np.add.reduceat(w_e, bounds[:-1][has])
    w_fp = np.floor(w_e / tot[ci] * _ONE_FP + 0.5).astype(np.int64)
    return ci, ncell[ci, ki], w_fp, pending


def _mfd_weights_sql(kind: str) -> str:
    arms = []
    for i in range(8):
        dx, dy = _D8_DX[i], _D8_DY[i]
        arms.append(
            f"SELECT a.cell_id, {i} AS i, b.cell_id AS tgt, "
            f"(CAST(a.v - b.v AS DOUBLE) / {_GL[i]!r}) AS slope, "
            f"{_CL[i]!r} AS cl "
            f"FROM cells a JOIN cells b "
            f"ON b.r = a.r + ({dy}) AND b.c = a.c + ({dx}) "
            f"WHERE b.v < a.v")
    if kind == "qin":
        fexpr = (f"(LEAST(mx.mx, {_QIN_UP_SLOPE!r}) / {_QIN_UP_SLOPE!r} "
                 f"* ({_QIN_UP_EXP!r} - {_QIN_LO_EXP!r}) + {_QIN_LO_EXP!r})")
        w = f"e.cl * pow(e.slope, {fexpr})"
        mxjoin = """,
    mx AS (SELECT cell_id, MAX(slope) AS mx FROM edges GROUP BY cell_id)"""
        join = " JOIN mx ON mx.cell_id = e.cell_id"
    else:
        w = "e.cl * e.slope"
        mxjoin = ""
        join = ""
    return f"""
    edges AS MATERIALIZED ({' UNION ALL '.join(arms)}){mxjoin},
    wts AS (
      SELECT e.cell_id, e.i, e.tgt, {w} AS w
      FROM edges e{join}
    ),
    tw AS (SELECT cell_id, SUM(w) AS tot FROM wts GROUP BY cell_id)
    SELECT w.cell_id, CAST(w.i AS BIGINT) AS i,
           CAST(floor(w.w / t.tot * {_ONE_FP} + 0.5) AS BIGINT) AS w_fp
    FROM wts w JOIN tw t ON t.cell_id = w.cell_id
    """


def _weights_entry(kind: str):
    def fn(sf_dir: str):
        def emit(batch: dict) -> pd.DataFrame:
            cid = batch["id"].astype(np.int64)
            ci, tgts, w_fp, _p = _mfd_weights(cid, _ROWS, _COLS, kind)
            # i index recovered from the target offset
            off = tgts - cid[ci]
            offs = np.array([dy * _COLS + dx
                             for dx, dy in zip(_D8_DX, _D8_DY)], np.int64)
            order = np.argsort(offs)
            k = np.searchsorted(offs[order], off)
            i = np.arange(8, dtype=np.int64)[order][np.clip(k, 0, 7)]
            return pd.DataFrame({"cell_id": cid[ci], "i": i, "w_fp": w_fp})

        return ray.data.range(_ROWS * _COLS, override_num_blocks=8) \
            .map_batches(emit, batch_format="numpy")

    return fn


def _qin_sum_sql(kind: str) -> str:
    return f"WITH {_CELLS_CTE},{_mfd_weights_sql(kind)}"


qin_weights = query("qin_weights", _qin_sum_sql("qin"))(
    _weights_entry("qin"))
qin_weights.__name__ = "qin_weights"
qin_weights.__doc__ = """QinFlowAccumulation weights
(whitebox-plugins/src/qin_flow_accumulation/main.rs:484-506): fixed-point
MFD shares with the max-slope-scaled exponent. SQL-exact (identical IEEE
pow/div in both engines)."""

quinn_weights = query("quinn_weights", _qin_sum_sql("quinn"))(
    _weights_entry("quinn"))
quinn_weights.__name__ = "quinn_weights"
quinn_weights.__doc__ = """QuinnFlowAccumulation weights
(whitebox-plugins/src/quinn_flow_accumulation/main.rs:417-432, threshold at
its unbounded setting so f = 1): contour-scaled slope shares."""


def _edge_fn_factory(kind: str):
    def edge_fn(cells, rows, cols):
        return _mfd_weights(cells, rows, cols, kind)

    return edge_fn


def _mfd_acc_sql(kind: str) -> str:
    """qin/quinn accumulation oracle: the PROVEN _mfd_weights_sql shares
    pivoted per cell + the generic remainder drain (rasterdefs.
    _mfd_drain_sql; D8-order directions, DAG depth 333 on the _value_fn
    surface, 360 steps budgeted)."""
    from ..rasterdefs import _mfd_drain_sql

    offs = tuple((dy, dx) for dx, dy in zip(_D8_DX, _D8_DY))
    piv = ", ".join(f"MAX(CASE WHEN i = {d} THEN w_fp END) AS pw{d}"
                    for d in range(8))
    wcols = ", ".join(f"COALESCE(p.pw{d}, -1) AS w{d}" for d in range(8))
    # the weights fragment ends with its own SELECT — keep only the CTEs
    # and rebuild that SELECT as the wfp CTE (identical expression)
    frag = _mfd_weights_sql(kind)
    anchor = "SELECT w.cell_id,"
    assert frag.count(anchor) == 1, "weights SQL tail changed shape"
    ctes = frag.rsplit(anchor, 1)[0]
    return f"""
    WITH RECURSIVE {_CELLS_CTE},{ctes.rstrip()},
    wfp AS MATERIALIZED (
      SELECT w.cell_id, w.i,
             CAST(floor(w.w / t.tot * {_ONE_FP} + 0.5) AS BIGINT) AS w_fp
      FROM wts w JOIN tw t ON t.cell_id = w.cell_id
    ),
    wagg AS (
      SELECT cell_id, MAX(i) AS lastd, {piv} FROM wfp GROUP BY cell_id
    ),
    wpiv AS MATERIALIZED (
      SELECT c.cell_id AS cid, COALESCE(p.lastd, -1) AS lastd, {wcols}
      FROM cells c LEFT JOIN wagg p ON p.cell_id = c.cell_id
    ),
    {_mfd_drain_sql(offs, 180, 2)}
    SELECT cell_id, acc_units FROM mfd_acc
    """


@query("qin_flow_accum", _mfd_acc_sql("qin"))
def qin_flow_accum(sf_dir: str):
    """QinFlowAccumulation (whitebox-plugins/src/qin_flow_accumulation/
    main.rs): the qin_weights shares drained on the shared conservation
    wave (stages/pregel.mfd_accumulation_pregel; exact int64 fixed-point,
    last-edge remainder). SQL oracle: _mfd_acc_sql; dense brute oracle in
    tests/test_plugins.py."""
    from ..stages.pregel import mfd_accumulation_pregel

    return mfd_accumulation_pregel(_edge_fn_factory("qin"), GRID1)


@query("quinn_flow_accum", _mfd_acc_sql("quinn"))
def quinn_flow_accum(sf_dir: str):
    """QuinnFlowAccumulation (whitebox-plugins/src/quinn_flow_accumulation/
    main.rs): same wave over the quinn_weights shares. SQL oracle:
    _mfd_acc_sql; dense brute oracle in tests/test_plugins.py."""
    from ..stages.pregel import mfd_accumulation_pregel

    return mfd_accumulation_pregel(_edge_fn_factory("quinn"), GRID1)


# --------------------------------------------------------------------------
# Lidar plugins over the events point cloud (established cents surface).
# --------------------------------------------------------------------------
_BLK = 10.0
_TREE_R2 = 100.0   # search radius^2 (= block size, so 3x3 blocks cover it)
_TREE_H = 500      # min height above the 3x3-block ground minimum (cents)


def _cloud_sql() -> str:
    from ..sources.tables import X_SQL, Y_SQL

    return f"""
    pts AS MATERIALIZED (
      SELECT event_id, {X_SQL} AS x, {Y_SQL} AS y,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    bp AS MATERIALIZED (
      SELECT *, CAST(floor((85.0 - y) / {_BLK!r}) AS BIGINT) * 1000
                + CAST(floor((x + 180.0) / {_BLK!r}) AS BIGINT) AS blk
      FROM pts
    ),
    mn AS (SELECT blk, MIN(cents) AS mn FROM bp GROUP BY blk),
    nbmin AS (
      SELECT b.blk, MIN(m.mn) AS nbmin
      FROM (SELECT DISTINCT blk FROM bp) b
      JOIN mn m ON m.blk IN ({", ".join(
          f"b.blk + ({dr} * 1000 + {dc})"
          for dr in (-1, 0, 1) for dc in (-1, 0, 1))})
      GROUP BY b.blk
    )"""


def _cloud(sf_dir: str):
    """(event_id, x, y, cents, cell_id = 10-unit block) Dataset."""
    from ..pointdefs import _lpts_df
    from ..sources.tables import read_points

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        out = _lpts_df(df)[["event_id", "x", "y", "cents"]].copy()
        x = out["x"].to_numpy(np.float64)
        y = out["y"].to_numpy(np.float64)
        out["cell_id"] = (np.floor((85.0 - y) / _BLK).astype(np.int64) * 1000
                          + np.floor((x + 180.0) / _BLK).astype(np.int64))
        return out

    return read_points(sf_dir).map_batches(conv, batch_format="pandas")


@query(
    "normalize_lidar",
    f"""
    WITH {_cloud_sql()}
    SELECT b.event_id, CAST(b.cents - n.nbmin AS BIGINT) AS nz
    FROM bp b JOIN nbmin n ON n.blk = b.blk
    """,
)
def normalize_lidar(sf_dir: str):
    """NormalizeLidar (whitebox-plugins/src/normalize_lidar/main.rs): z
    above the modeled ground surface — ground = minimum elevation over the
    3x3 10-unit block neighbourhood (the repo's established local-ground
    model, lidar4 residual machinery): two partial aggregates + a hash
    join, no driver state."""
    from ..relational import partial_agg

    pts = _cloud(sf_dir)

    def cell_mins(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64),
                             "mn": df["cents"].to_numpy(np.int64)})

    mins = partial_agg(pts.map_batches(cell_mins, batch_format="pandas"),
                       ["cell_id"], [("mn", "min", "mn")])

    def spread(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        mn = df["mn"].to_numpy(np.int64)
        return pd.concat([pd.DataFrame({"cell_id": cid + dr * 1000 + dc,
                                        "mn": mn})
                          for dr in (-1, 0, 1) for dc in (-1, 0, 1)],
                         ignore_index=True)

    nbmin = partial_agg(mins.map_batches(spread, batch_format="pandas"),
                        ["cell_id"], [("mn", "min", "nbmin")])
    j = pts.join(nbmin, join_type="inner", num_partitions=8,
                 on=("cell_id",))
    return j.map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "nz": df["cents"].to_numpy(np.int64)
            - df["nbmin"].to_numpy(np.int64)}),
        batch_format="pandas")


@query(
    "lidar_shift",
    f"""
    WITH {_cloud_sql()}
    SELECT event_id, x + 2.5 AS xs, y - 1.25 AS ys,
           CAST(cents + 150 AS BIGINT) AS zs
    FROM pts
    """,
)
def lidar_shift(sf_dir: str):
    """LidarShift (whitebox-plugins/src/lidar_shift/main.rs): constant
    x/y/z offsets applied per batch (trivially parallel)."""
    pts = _cloud(sf_dir)
    return pts.map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "xs": df["x"].to_numpy(np.float64) + 2.5,
            "ys": df["y"].to_numpy(np.float64) - 1.25,
            "zs": df["cents"].to_numpy(np.int64) + 150}),
        batch_format="pandas")


@query(
    "individual_tree_detection",
    f"""
    WITH {_cloud_sql()},
    cand AS (
      SELECT b.event_id, b.x, b.y, b.cents, b.blk
      FROM bp b JOIN nbmin n ON n.blk = b.blk
      WHERE b.cents - n.nbmin >= {_TREE_H}
    )
    SELECT c.event_id, CAST(NOT EXISTS (
      SELECT 1 FROM bp q
      WHERE q.blk IN ({", ".join(
          f"c.blk + ({dr} * 1000 + {dc})"
          for dr in (-1, 0, 1) for dc in (-1, 0, 1))})
        AND q.event_id != c.event_id
        AND (q.x - c.x) * (q.x - c.x) + (q.y - c.y) * (q.y - c.y)
            <= {_TREE_R2!r}
        AND (q.cents > c.cents
             OR (q.cents = c.cents AND q.event_id < c.event_id))
    ) AS BIGINT) AS treetop
    FROM cand c
    """,
)
def individual_tree_detection(sf_dir: str):
    """IndividualTreeDetection (whitebox-plugins/src/
    individual_tree_detection/main.rs): treetops = points >= min_height
    above the local ground that are the strict maximum (ties -> lowest
    event_id) of their fixed-radius neighbourhood — one 3x3-block co-group,
    the lidar family's replicate pattern."""
    from ..pipelines.queries_lidar4 import _replicate

    pts = _cloud(sf_dir)
    cols = ["event_id", "x", "y", "cents", "cell_id"]

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        own = g["own"].to_numpy(np.int64) == 1
        if not own.any():
            return pd.DataFrame({"event_id": np.empty(0, np.int64),
                                 "treetop": np.empty(0, np.int64)})
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        z = g["cents"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        gmin = int(z.min())  # 3x3-block ground minimum for the own block
        keep = own & (z - gmin >= _TREE_H)
        if not keep.any():
            return pd.DataFrame({"event_id": np.empty(0, np.int64),
                                 "treetop": np.empty(0, np.int64)})
        d2 = (x[None, :] - x[keep][:, None]) ** 2 \
            + (y[None, :] - y[keep][:, None]) ** 2
        higher = (z[None, :] > z[keep][:, None]) \
            | ((z[None, :] == z[keep][:, None])
               & (e[None, :] < e[keep][:, None]))
        inr = (d2 <= _TREE_R2) & (e[None, :] != e[keep][:, None])
        beaten = (inr & higher).any(axis=1)
        return pd.DataFrame({"event_id": e[keep],
                             "treetop": (~beaten).astype(np.int64)})

    rep = pts.map_batches(lambda df: _replicate(df, cols),
                          batch_format="pandas")
    return rep.groupby("grp").map_groups(kern, batch_format="pandas")


# --------------------------------------------------------------------------
# LocalQuadraticRegression (whitebox-plugins/src/local_quadratic_regression/
# main.rs:430-560, Wood 1996): z = ax^2 + by^2 + cxy + dx + ey fit over the
# 5x5 window. The symmetric window decouples the normal equations into
# closed-form INTEGER moment ratios (Sx2 = 50, Sx4 = 170, Sx2y2 = 100,
# det = 170^2 - 100^2 = 18900), so both engines evaluate identical
# rationals -> identical doubles; derived surfaces micro-quantized.
# GoF is omitted (the reference's SST convention is mean-free — documented
# scope boundary).
# --------------------------------------------------------------------------
_LQR_OFFS = [(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)]


def _lqr_formulas(prefix: str = "") -> dict[str, str]:
    """Identical formula text evaluated by DuckDB; numpy mirrors it."""
    p = prefix
    return {
        "aa": f"(170.0 * {p}sx2z - 100.0 * {p}sy2z) / 18900.0",
        "bb": f"(170.0 * {p}sy2z - 100.0 * {p}sx2z) / 18900.0",
        "cc": f"{p}sxyz / 100.0",
        "dd": f"{p}sxz / 50.0",
        "ee": f"{p}syz / 50.0",
    }


@query(
    "local_quadratic_regression",
    f"""
    WITH {_CELLS_CTE},
    arms AS (SELECT a.cell_id, n.v, 4 AS wx2, 4 AS wy2, 4 AS wxy, -2 AS wx, -2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-2) AND n.c = a.c + (-2) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 4 AS wy2, 2 AS wxy, -1 AS wx, -2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-2) AND n.c = a.c + (-1) UNION ALL SELECT a.cell_id, n.v, 0 AS wx2, 4 AS wy2, 0 AS wxy, 0 AS wx, -2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-2) AND n.c = a.c + (0) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 4 AS wy2, -2 AS wxy, 1 AS wx, -2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-2) AND n.c = a.c + (1) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 4 AS wy2, -4 AS wxy, 2 AS wx, -2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-2) AND n.c = a.c + (2) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 1 AS wy2, 2 AS wxy, -2 AS wx, -1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-1) AND n.c = a.c + (-2) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 1 AS wy2, 1 AS wxy, -1 AS wx, -1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-1) AND n.c = a.c + (-1) UNION ALL SELECT a.cell_id, n.v, 0 AS wx2, 1 AS wy2, 0 AS wxy, 0 AS wx, -1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-1) AND n.c = a.c + (0) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 1 AS wy2, -1 AS wxy, 1 AS wx, -1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-1) AND n.c = a.c + (1) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 1 AS wy2, -2 AS wxy, 2 AS wx, -1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (-1) AND n.c = a.c + (2) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 0 AS wy2, 0 AS wxy, -2 AS wx, 0 AS wy FROM cells a JOIN cells n ON n.r = a.r + (0) AND n.c = a.c + (-2) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 0 AS wy2, 0 AS wxy, -1 AS wx, 0 AS wy FROM cells a JOIN cells n ON n.r = a.r + (0) AND n.c = a.c + (-1) UNION ALL SELECT a.cell_id, n.v, 0 AS wx2, 0 AS wy2, 0 AS wxy, 0 AS wx, 0 AS wy FROM cells a JOIN cells n ON n.r = a.r + (0) AND n.c = a.c + (0) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 0 AS wy2, 0 AS wxy, 1 AS wx, 0 AS wy FROM cells a JOIN cells n ON n.r = a.r + (0) AND n.c = a.c + (1) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 0 AS wy2, 0 AS wxy, 2 AS wx, 0 AS wy FROM cells a JOIN cells n ON n.r = a.r + (0) AND n.c = a.c + (2) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 1 AS wy2, -2 AS wxy, -2 AS wx, 1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (1) AND n.c = a.c + (-2) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 1 AS wy2, -1 AS wxy, -1 AS wx, 1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (1) AND n.c = a.c + (-1) UNION ALL SELECT a.cell_id, n.v, 0 AS wx2, 1 AS wy2, 0 AS wxy, 0 AS wx, 1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (1) AND n.c = a.c + (0) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 1 AS wy2, 1 AS wxy, 1 AS wx, 1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (1) AND n.c = a.c + (1) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 1 AS wy2, 2 AS wxy, 2 AS wx, 1 AS wy FROM cells a JOIN cells n ON n.r = a.r + (1) AND n.c = a.c + (2) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 4 AS wy2, -4 AS wxy, -2 AS wx, 2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (2) AND n.c = a.c + (-2) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 4 AS wy2, -2 AS wxy, -1 AS wx, 2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (2) AND n.c = a.c + (-1) UNION ALL SELECT a.cell_id, n.v, 0 AS wx2, 4 AS wy2, 0 AS wxy, 0 AS wx, 2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (2) AND n.c = a.c + (0) UNION ALL SELECT a.cell_id, n.v, 1 AS wx2, 4 AS wy2, 2 AS wxy, 1 AS wx, 2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (2) AND n.c = a.c + (1) UNION ALL SELECT a.cell_id, n.v, 4 AS wx2, 4 AS wy2, 4 AS wxy, 2 AS wx, 2 AS wy FROM cells a JOIN cells n ON n.r = a.r + (2) AND n.c = a.c + (2)),
    mom AS (
      SELECT cell_id,
             SUM(v * wx2) AS sx2z, SUM(v * wy2) AS sy2z,
             SUM(v * wxy) AS sxyz, SUM(v * wx) AS sxz, SUM(v * wy) AS syz
      FROM arms GROUP BY cell_id HAVING COUNT(*) = 25
    ),
    co AS (
      SELECT cell_id, {_lqr_formulas()["aa"]} AS aa,
             {_lqr_formulas()["bb"]} AS bb, {_lqr_formulas()["cc"]} AS cc,
             {_lqr_formulas()["dd"]} AS dd, {_lqr_formulas()["ee"]} AS ee
      FROM mom
    )
    SELECT cell_id,
      CAST(floor(atan(sqrt(dd * dd + ee * ee)) * 1e6 + 0.5) AS BIGINT)
        AS slp_micro,
      CAST(floor(CASE WHEN ee = 0.0 OR dd = 0.0 THEN 0.0
                      ELSE atan(ee / dd) END * 1e6 + 0.5) AS BIGINT)
        AS asp_micro,
      CAST(floor(CASE WHEN (-200.0 * (aa*dd*dd + bb*ee*ee + cc*dd*ee)) = 0.0
                        OR ((ee*ee + dd*dd)
                            * pow(1.0 + dd*dd + ee*ee, 1.5)) = 0.0
                      THEN 0.0
                      ELSE (-200.0 * (aa*dd*dd + bb*ee*ee + cc*dd*ee))
                           / ((ee*ee + dd*dd)
                              * pow(1.0 + dd*dd + ee*ee, 1.5))
                 END * 1e6 + 0.5) AS BIGINT) AS proc_micro,
      CAST(floor(CASE WHEN (aa*dd*dd + bb*ee*ee + cc*dd*ee) = 0.0
                        OR (dd*dd + ee*ee) = 0.0
                      THEN 0.0
                      ELSE -2.0 * ((aa*dd*dd + bb*ee*ee + cc*dd*ee)
                                   / (dd*dd + ee*ee))
                 END * 1e6 + 0.5) AS BIGINT) AS lonc_micro,
      CAST(floor((-aa - bb - sqrt((aa - bb) * (aa - bb) + cc * cc))
                 * 1e6 + 0.5) AS BIGINT) AS prcm_micro
    FROM co
    """,
)
def local_quadratic_regression(sf_dir: str):
    """LocalQuadraticRegression (whitebox-plugins/src/
    local_quadratic_regression/main.rs): slope / aspect / profile convexity
    / longitudinal curvature / min profile convexity of the per-cell 5x5
    quadratic fit — a single k=2 halo stencil computing the five integer
    moment sums, then the closed-form coefficient rationals."""
    from ..stages.raster import stencil_k, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        sx2z = np.zeros((nr, nc))
        sy2z = np.zeros((nr, nc))
        sxyz = np.zeros((nr, nc))
        sxz = np.zeros((nr, nc))
        syz = np.zeros((nr, nc))
        for dy, dx in _LQR_OFFS:
            w = padded[2 + dy:2 + dy + nr, 2 + dx:2 + dx + nc]
            sx2z += w * (dx * dx)
            sy2z += w * (dy * dy)
            sxyz += w * (dx * dy)
            sxz += w * dx
            syz += w * dy
        aa = (170.0 * sx2z - 100.0 * sy2z) / 18900.0
        bb = (170.0 * sy2z - 100.0 * sx2z) / 18900.0
        cc = sxyz / 100.0
        dd = sxz / 50.0
        ee = syz / 50.0
        with np.errstate(invalid="ignore", divide="ignore"):
            slp = np.arctan(np.sqrt(dd * dd + ee * ee))
            asp = np.where((ee == 0.0) | (dd == 0.0), 0.0,
                           np.arctan(ee / np.where(dd == 0.0, 1.0, dd)))
            nu_p = -200.0 * (aa * dd * dd + bb * ee * ee + cc * dd * ee)
            de_p = (ee * ee + dd * dd) * (1.0 + dd * dd + ee * ee) ** 1.5
            proc = np.where((nu_p == 0.0) | (de_p == 0.0), 0.0,
                            nu_p / np.where(de_p == 0.0, 1.0, de_p))
            nu_l = aa * dd * dd + bb * ee * ee + cc * dd * ee
            de_l = dd * dd + ee * ee
            lonc = np.where((nu_l == 0.0) | (de_l == 0.0), 0.0,
                            -2.0 * (nu_l / np.where(de_l == 0.0, 1.0, de_l)))
            prcm = -aa - bb - np.sqrt((aa - bb) * (aa - bb) + cc * cc)
        return {"slp_micro": np.floor(slp * 1e6 + 0.5),
                "asp_micro": np.floor(asp * 1e6 + 0.5),
                "proc_micro": np.floor(proc * 1e6 + 0.5),
                "lonc_micro": np.floor(lonc * 1e6 + 0.5),
                "prcm_micro": np.floor(prcm * 1e6 + 0.5)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    cells = stencil_k(tiles, GRID1, kern, k=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ok = ~df["slp_micro"].isna()
        out = df.loc[ok, ["cell_id", "slp_micro", "asp_micro", "proc_micro",
                          "lonc_micro", "prcm_micro"]].copy()
        return out.astype(np.int64)

    return cells.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# ExposureTowardsWindFlux (whitebox-plugins/src/exposure_towards_wind_flux/
# main.rs): cos(E) = cos(S) sin(H) + sin(S) cos(H) cos(Az - A). Horizon
# angle H = 0 (the documented horizontal-flux variant: max_dist unused), so
# cos(E) = sin(S) cos(Az - A) with S, A the Horn slope/aspect.
# --------------------------------------------------------------------------
_WIND_AZ = 315.0


@query(
    "exposure_towards_wind_flux",
    f"""
    WITH {_CELLS_CTE},
    {_horn_pq_sql()}
    SELECT cell_id,
           CAST(floor(sin(atan(sqrt(p * p + q * q)))
                      * cos(radians({_WIND_AZ!r})
                            - (CASE WHEN atan2(q, -p) < 0
                                    THEN atan2(q, -p) + 2 * pi()
                                    ELSE atan2(q, -p) END))
                      * 1e6 + 0.5) AS BIGINT) AS expo_micro
    FROM pq
    """,
)
def exposure_towards_wind_flux(sf_dir: str):
    """ExposureTowardsWindFlux (whitebox-plugins/src/
    exposure_towards_wind_flux/main.rs): the horizontal-flux variant
    (H = 0) over the Horn gradients — one 3x3 stencil, micro-quantized."""
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    az = np.radians(_WIND_AZ)

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        z = padded
        a = z[0:nr, 0:nc]; b = z[0:nr, 1:nc + 1]; c = z[0:nr, 2:nc + 2]
        d = z[1:nr + 1, 0:nc]; f = z[1:nr + 1, 2:nc + 2]
        g = z[2:nr + 2, 0:nc]; h = z[2:nr + 2, 1:nc + 1]
        i = z[2:nr + 2, 2:nc + 2]
        p = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
        q = ((g + 2 * h + i) - (a + 2 * b + c)) / 8.0
        slope = np.arctan(np.sqrt(p * p + q * q))
        asp = np.arctan2(q, -p)
        asp = np.where(asp < 0, asp + 2 * np.pi, asp)
        return {"expo_micro": np.floor(
            np.sin(slope) * np.cos(az - asp) * 1e6 + 0.5)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    cells = stencil_3x3(tiles, GRID1, kern)
    return cells.map_batches(
        lambda df: df.dropna().astype(np.int64), batch_format="pandas")


# --------------------------------------------------------------------------
# SplitVectorLines (whitebox-plugins/src/split_vector_lines/main.rs):
# divide each line into segments of a maximum length.
# --------------------------------------------------------------------------
_SPLIT_LEN = 1.0
_SPLIT_N = 400


@query(
    "split_vector_lines",
    f"""
    WITH RECURSIVE {synth_segments_cte(_SPLIT_N)},
    lens AS (
      SELECT seg_id, x0, y0, x1, y1,
             sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) AS len
      FROM seg
    ),
    ks AS (SELECT *, CAST(ceil(len / {_SPLIT_LEN!r}) AS BIGINT) AS k
           FROM lens),
    pieces AS (
      SELECT seg_id, k, x0, y0, x1, y1, CAST(0 AS BIGINT) AS piece
      FROM ks WHERE k > 0
      UNION ALL
      SELECT seg_id, k, x0, y0, x1, y1, piece + 1 FROM pieces
      WHERE piece + 1 < k
    )
    SELECT seg_id, piece,
           x0 + (x1 - x0) * (CAST(piece AS DOUBLE) / k) AS px0,
           y0 + (y1 - y0) * (CAST(piece AS DOUBLE) / k) AS py0,
           x0 + (x1 - x0) * (CAST(piece + 1 AS DOUBLE) / k) AS px1,
           y0 + (y1 - y0) * (CAST(piece + 1 AS DOUBLE) / k) AS py1
    FROM pieces
    """,
)
def split_vector_lines(sf_dir: str):
    """SplitVectorLines (whitebox-plugins/src/split_vector_lines/main.rs):
    each synthetic segment is cut into ceil(len/maxlen) equal pieces with
    linearly interpolated endpoints — embarrassingly parallel per batch;
    the SQL twin reuses the shared synth_segments CTE bit-for-bit."""
    from ..stages.lines import synth_segments

    seg = synth_segments(_SPLIT_N, seed=42)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        x0 = df["x0"].to_numpy(np.float64)
        y0 = df["y0"].to_numpy(np.float64)
        x1 = df["x1"].to_numpy(np.float64)
        y1 = df["y1"].to_numpy(np.float64)
        ln = np.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2)
        k = np.ceil(ln / _SPLIT_LEN).astype(np.int64)
        rep = np.repeat(np.arange(len(df)), k)
        csum = np.concatenate([[0], np.cumsum(k)])
        piece = np.arange(int(k.sum()), dtype=np.int64) \
            - np.repeat(csum[:-1], k)
        t0 = piece.astype(np.float64) / k[rep]
        t1 = (piece + 1).astype(np.float64) / k[rep]
        return pd.DataFrame({
            "seg_id": df["seg_id"].to_numpy(np.int64)[rep],
            "piece": piece,
            "px0": x0[rep] + (x1 - x0)[rep] * t0,
            "py0": y0[rep] + (y1 - y0)[rep] * t0,
            "px1": x0[rep] + (x1 - x0)[rep] * t1,
            "py1": y0[rep] + (y1 - y0)[rep] * t1})

    return ray.data.from_pandas(seg).map_batches(split,
                                                 batch_format="pandas")


# --------------------------------------------------------------------------
# TravellingSalesmanProblem (whitebox-plugins/src/
# travelling_salesman_problem/main.rs): the reference runs a time-budgeted
# randomized 2-opt; the analog is DETERMINISTIC — nearest-neighbour tour
# (ties -> lowest site id) followed by first-improvement 2-opt passes in
# fixed scan order to a local optimum. Rows-only; independent scalar
# oracle + permutation/local-optimality properties in tests/test_plugins.py.
# --------------------------------------------------------------------------
_TSP_N = 48


def _tsp_sites() -> pd.DataFrame:
    ids = np.arange(_TSP_N, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64) + np.uint64(77))
    x = (splitmix64(h + np.uint64(1)) % np.uint64(1 << 30)).astype(
        np.float64) / float(1 << 30) * 360.0 - 180.0
    y = (splitmix64(h + np.uint64(2)) % np.uint64(1 << 30)).astype(
        np.float64) / float(1 << 30) * 170.0 - 85.0
    return pd.DataFrame({"site_id": ids, "x": x, "y": y})


def _tsp_tour(x: np.ndarray, y: np.ndarray) -> list[int]:
    n = len(x)
    unvisited = set(range(1, n))
    tour = [0]
    while unvisited:
        cx, cy = x[tour[-1]], y[tour[-1]]
        best = min(unvisited,
                   key=lambda s: ((x[s] - cx) ** 2 + (y[s] - cy) ** 2, s))
        tour.append(best)
        unvisited.discard(best)

    def d(a: int, b: int) -> float:
        return float(np.sqrt((x[a] - x[b]) ** 2 + (y[a] - y[b]) ** 2))

    improved = True
    while improved:
        improved = False
        for i in range(1, n - 1):
            for j in range(i + 1, n):
                a, b = tour[i - 1], tour[i]
                c, e = tour[j], tour[(j + 1) % n]
                if a == e:
                    continue
                if d(a, c) + d(b, e) < d(a, b) + d(c, e) - 1e-12:
                    tour[i:j + 1] = tour[i:j + 1][::-1]
                    improved = True
    return tour


@query("travelling_salesman_problem")
def travelling_salesman_problem(sf_dir: str):
    """TravellingSalesmanProblem (whitebox-plugins/src/
    travelling_salesman_problem/main.rs): deterministic NN + 2-opt tour
    over the synthetic site set, computed inside one Ray task (the site
    count is a bounded parameter, not data-scale). Output
    (order_idx, site_id)."""
    sites = _tsp_sites()

    def solve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("site_id").reset_index(drop=True)
        tour = _tsp_tour(df["x"].to_numpy(np.float64),
                         df["y"].to_numpy(np.float64))
        return pd.DataFrame({
            "order_idx": np.arange(len(tour), dtype=np.int64),
            "site_id": df["site_id"].to_numpy(np.int64)[tour]})

    return ray.data.from_pandas(sites).repartition(1).map_batches(
        solve, batch_format="pandas", batch_size=None)


# --------------------------------------------------------------------------
# GaussianScaleSpace (whitebox-plugins/src/gaussian_scale_space/main.rs):
# the analog computes a two-level binomial (B2, [1,2,1]/4 separable ~
# Gaussian) scale stack and per cell the difference-of-Gaussian responses
# and the max-|response| scale — INTEGER-exact by carrying unnormalized
# numerators (denominators 16 and 256; |DoG1|*16 vs |DoG2| compares on the
# common denominator). Interior cells only (margins 1 and 2).
# --------------------------------------------------------------------------
_B2 = [(dy, dx, (2 - abs(dy)) * (2 - abs(dx)))
       for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _b2_arms(src: str, val: str) -> str:
    return " UNION ALL ".join(
        f"SELECT a.cell_id, n.{val} * {w} AS t FROM {src} a JOIN {src} n "
        f"ON n.r = a.r + ({dy}) AND n.c = a.c + ({dx})"
        for dy, dx, w in _B2)


@query(
    "gaussian_scale_space",
    f"""
    WITH {_CELLS_CTE},
    v1 AS (
      SELECT t.cell_id, CAST(SUM(t.t) AS BIGINT) AS v1,
             ANY_VALUE(c.v) AS v0,
             c2.r AS r, c2.c AS c
      FROM ({_b2_arms("cells", "v")}) t
      JOIN cells c ON c.cell_id = t.cell_id
      JOIN cells c2 ON c2.cell_id = t.cell_id
      GROUP BY t.cell_id, c2.r, c2.c HAVING COUNT(*) = 9
    ),
    v2 AS (
      SELECT t.cell_id, CAST(SUM(t.t) AS BIGINT) AS v2
      FROM ({_b2_arms("v1", "v1")}) t
      GROUP BY t.cell_id HAVING COUNT(*) = 9
    )
    SELECT a.cell_id,
           CAST(a.v1 - 16 * a.v0 AS BIGINT) AS dog1_num,
           CAST(b.v2 - 16 * a.v1 AS BIGINT) AS dog2_num,
           CAST(CASE WHEN abs(a.v1 - 16 * a.v0) * 16
                          >= abs(b.v2 - 16 * a.v1)
                     THEN 1 ELSE 2 END AS BIGINT) AS best_scale
    FROM v1 a JOIN v2 b ON b.cell_id = a.cell_id
    """,
)
def gaussian_scale_space(sf_dir: str):
    """GaussianScaleSpace (whitebox-plugins/src/gaussian_scale_space/
    main.rs): two binomial scale levels + integer DoG responses + max-
    response scale (ties -> finer scale), via two fused halo stencils."""
    from ..stages.raster import stencil_k, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        # level 1 evaluated on the halo-1 ring too (level 2 needs it)
        def conv(src, nr_, nc_, pad):
            out = np.zeros((nr_, nc_))
            for dy, dx, w in _B2:
                out += w * src[pad + dy:pad + dy + nr_,
                               pad + dx:pad + dx + nc_]
            return out

        v1_full = conv(padded, nr + 2, nc + 2, 1)   # halo-1 ring kept
        v0 = padded[2:2 + nr, 2:2 + nc]
        v1 = v1_full[1:1 + nr, 1:1 + nc]
        v2 = conv(v1_full, nr, nc, 1)
        n1 = v1 - 16.0 * v0
        n2 = v2 - 16.0 * v1
        best = np.where(np.abs(n1) * 16.0 >= np.abs(n2), 1.0, 2.0)
        return {"dog1_num": n1, "dog2_num": n2, "best_scale": best}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    cells = stencil_k(tiles, GRID1, kern, k=2)
    return cells.map_batches(
        lambda df: df.dropna().astype(np.int64), batch_format="pandas")


# --------------------------------------------------------------------------
# VectorStreamNetworkAnalysis (whitebox-plugins/src/
# vector_stream_network_analysis/main.rs): per stream LINK attributes.
# The analog computes them on the D8-derived stream network (the repo's
# established stream model): link id (terminal cell), cell count,
# DIST2MOUTH (fixed-point units from the link terminal to the network
# outlet) and the link's Strahler order. Same-kernel citation also covers
# correct_stream_vector_direction/main.rs and
# repair_stream_vector_topology/main.rs: on this model directions are
# derived from the D8 pointer (always mouth-ward) and links meet exactly
# at junction nodes, i.e. the CORRECTED/REPAIRED network is computed
# directly rather than fixed after the fact.
# --------------------------------------------------------------------------
@query(
    "vector_stream_network_analysis",
    f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_CTE},
    acc AS MATERIALIZED (
      SELECT g.cell_id, 1 + COALESCE(p.n, 0) AS acc
      FROM graph g
      LEFT JOIN (SELECT cur, COUNT(*) AS n FROM walk GROUP BY cur) p
        ON p.cur = g.cell_id
    ),
    stream AS MATERIALIZED (
      SELECT cell_id FROM acc WHERE acc >= 5),
    sgraph AS MATERIALIZED (
      SELECT g.cell_id,
             CASE WHEN t.cell_id IS NOT NULL THEN g.down_id
                  ELSE CAST(-1 AS BIGINT) END AS down_id
      FROM graph g
      JOIN stream s ON s.cell_id = g.cell_id
      LEFT JOIN stream t ON t.cell_id = g.down_id
    ),
    s_indeg AS MATERIALIZED (
      SELECT s.cell_id, COUNT(p.cell_id) AS n
      FROM stream s LEFT JOIN sgraph p ON p.down_id = s.cell_id
      GROUP BY s.cell_id
    ),
    lgraph AS MATERIALIZED (
      SELECT sg.cell_id,
             CASE WHEN sg.down_id >= 0 AND ti.n < 2 THEN sg.down_id
                  ELSE -1 END AS nxt
      FROM sgraph sg LEFT JOIN s_indeg ti ON ti.cell_id = sg.down_id
    ),
    chase(start, cur) AS (
      SELECT cell_id, cell_id FROM lgraph
      UNION ALL
      SELECT c.start, l.nxt FROM chase c
      JOIN lgraph l ON l.cell_id = c.cur WHERE l.nxt >= 0
    ),
    links AS MATERIALIZED (
      SELECT c.start AS cell_id, CAST(c.cur AS BIGINT) AS link_id
      FROM chase c JOIN lgraph l ON l.cell_id = c.cur WHERE l.nxt < 0
    ),
    mouth(start, cur, units) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT)
      FROM (SELECT DISTINCT link_id AS cell_id FROM links)
      UNION ALL
      SELECT m.start, g.down_id,
             m.units + CASE WHEN (m.cur // 360) <> (g.down_id // 360) AND (m.cur % 360) <> (g.down_id % 360) THEN 1482910 ELSE 1048576 END
      FROM mouth m JOIN sgraph g ON g.cell_id = m.cur
      WHERE g.down_id >= 0
    ),
    d2m AS (
      SELECT start AS link_id, MAX(units) AS dist2mouth_units FROM mouth
      GROUP BY start
    ),
    g2 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s2(cur) AS (
      SELECT cell_id FROM g2
      UNION
      SELECT g.down_id FROM s2 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g3 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s2 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s3(cur) AS (
      SELECT cell_id FROM g3
      UNION
      SELECT g.down_id FROM s3 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g4 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s3 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s4(cur) AS (
      SELECT cell_id FROM g4
      UNION
      SELECT g.down_id FROM s4 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g5 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s4 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s5(cur) AS (
      SELECT cell_id FROM g5
      UNION
      SELECT g.down_id FROM s5 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g6 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s5 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s6(cur) AS (
      SELECT cell_id FROM g6
      UNION
      SELECT g.down_id FROM s6 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g7 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s6 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s7(cur) AS (
      SELECT cell_id FROM g7
      UNION
      SELECT g.down_id FROM s7 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g8 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s7 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s8(cur) AS (
      SELECT cell_id FROM g8
      UNION
      SELECT g.down_id FROM s8 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g9 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s8 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s9(cur) AS (
      SELECT cell_id FROM g9
      UNION
      SELECT g.down_id FROM s9 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g10 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s9 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s10(cur) AS (
      SELECT cell_id FROM g10
      UNION
      SELECT g.down_id FROM s10 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g11 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s10 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s11(cur) AS (
      SELECT cell_id FROM g11
      UNION
      SELECT g.down_id FROM s11 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    ),
    g12 AS MATERIALIZED (
      SELECT g.cell_id FROM sgraph g
      JOIN sgraph p ON p.down_id = g.cell_id JOIN s11 s ON s.cur = p.cell_id
      GROUP BY g.cell_id HAVING COUNT(*) >= 2
    ),
    s12(cur) AS (
      SELECT cell_id FROM g12
      UNION
      SELECT g.down_id FROM s12 w JOIN sgraph g ON g.cell_id = w.cur
      WHERE g.down_id >= 0
    )
    SELECT l.link_id, COUNT(*) AS n_cells,
           ANY_VALUE(d.dist2mouth_units) AS dist2mouth_units,
           CAST(1 + (SELECT COUNT(*) FROM s2 WHERE s2.cur = l.link_id) + (SELECT COUNT(*) FROM s3 WHERE s3.cur = l.link_id) + (SELECT COUNT(*) FROM s4 WHERE s4.cur = l.link_id) + (SELECT COUNT(*) FROM s5 WHERE s5.cur = l.link_id) + (SELECT COUNT(*) FROM s6 WHERE s6.cur = l.link_id) + (SELECT COUNT(*) FROM s7 WHERE s7.cur = l.link_id) + (SELECT COUNT(*) FROM s8 WHERE s8.cur = l.link_id) + (SELECT COUNT(*) FROM s9 WHERE s9.cur = l.link_id) + (SELECT COUNT(*) FROM s10 WHERE s10.cur = l.link_id) + (SELECT COUNT(*) FROM s11 WHERE s11.cur = l.link_id) + (SELECT COUNT(*) FROM s12 WHERE s12.cur = l.link_id) AS BIGINT) AS strahler
    FROM links l
    JOIN d2m d ON d.link_id = l.link_id
    GROUP BY l.link_id
    """,
)
def vector_stream_network_analysis(sf_dir: str):
    """VectorStreamNetworkAnalysis (whitebox-plugins/src/
    vector_stream_network_analysis/main.rs; module-section docstring also
    covers correct_stream_vector_direction and
    repair_stream_vector_topology): per-link cell count, distance to the
    network mouth and Strahler order — pure composition of verified
    machinery: stream_link_id labels, flowpath_length over the stream-cut
    graph, strahler_pregel over the stream graph, joined per link."""
    from ..relational import partial_agg
    from ..stages.pregel import (flowpath_length_pregel, strahler_pregel)
    from .queries_stream2 import _stream_graph

    # session-memoized (cell_id, link_id, down_id, tile): the pointer table
    # induced on stream cells. Downstream closure (a stream cell's D8 down
    # cell is itself a stream cell) makes this exactly the stream-cut graph
    # the SQL's sgraph builds — no defensive re-cut needed.
    sg = _stream_graph(sf_dir)
    links = sg  # carries link_id per stream cell
    sdds = sg.drop_columns(["link_id"])

    fpl = flowpath_length_pregel(sdds, GRID1)      # (cell_id, len_units)
    sb = strahler_pregel(sdds, GRID1)              # (cell_id, strahler)

    # per-link cell counts (junction-sized after the partial agg — the
    # same driver-size bound _link_orders relies on). The four Ray
    # hash-joins this used to run cost ~3 s each on 9.5k-row sides; a
    # broadcast terminal-set filter + driver merge is the right size.
    cnt = partial_agg(links.map_batches(
        lambda df: pd.DataFrame({
            "link_id": df["link_id"].to_numpy(np.int64),
            "one": np.ones(len(df), np.int64)}),
        batch_format="pandas"), ["link_id"],
        [("one", "sum", "n_cells")]).to_pandas()

    terms = np.sort(cnt["link_id"].to_numpy(np.int64))  # link terminal cells
    tref = ray.put(terms)

    def _at_terminals(col_in: str, col_out: str):
        def pick(df: pd.DataFrame) -> pd.DataFrame:
            from ..stages.spatial_join import _cached_get

            ts = _cached_get(tref)
            cid = df["cell_id"].to_numpy(np.int64)
            pos = np.minimum(np.searchsorted(ts, cid), len(ts) - 1)
            m = ts[pos] == cid
            return pd.DataFrame({
                "link_id": cid[m],
                col_out: df[col_in].to_numpy(np.int64)[m]})
        return pick

    d2m = fpl.map_batches(_at_terminals("len_units", "dist2mouth_units"),
                          batch_format="pandas").to_pandas()
    sbl = sb.map_batches(_at_terminals("strahler", "strahler"),
                         batch_format="pandas").to_pandas()
    out = cnt.merge(d2m, on="link_id").merge(sbl, on="link_id")
    return out[["link_id", "n_cells", "dist2mouth_units", "strahler"]]


# --------------------------------------------------------------------------
# ConditionedLatinHypercube (whitebox-plugins/src/conditioned_latin_hypercube/
# main.rs): the reference anneals a random sample toward Latin-hypercube
# stratification of the covariate distribution; the analog is its
# DETERMINISTIC limit — n equal-rank strata of the covariate (cents), each
# represented by its rank-median point (the sample that perfectly
# stratifies a single covariate). Total order (cents, event_id) makes the
# result unique and SQL row_number-exact.
# --------------------------------------------------------------------------
_CLHS_N = 32


@query(
    "conditioned_latin_hypercube",
    f"""
    WITH pts AS (
      SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    rk AS (
      SELECT event_id, cents,
             row_number() OVER (ORDER BY cents, event_id) AS rn,
             COUNT(*) OVER () AS nt
      FROM pts
    ),
    st AS (SELECT *, ((rn - 1) * {_CLHS_N}) // nt AS stratum FROM rk),
    med AS (
      SELECT stratum, event_id, cents,
             row_number() OVER (PARTITION BY stratum
                                ORDER BY rn) AS srn,
             COUNT(*) OVER (PARTITION BY stratum) AS sc
      FROM st
    )
    SELECT stratum, event_id, cents FROM med WHERE srn = (sc + 1) // 2
    """,
)
def conditioned_latin_hypercube(sf_dir: str):
    """ConditionedLatinHypercube (whitebox-plugins/src/
    conditioned_latin_hypercube/main.rs) deterministic-limit analog
    (module-section docstring): global ranks come from a broadcast
    per-value histogram + per-value group ordinals (no global sort
    materialization), then each stratum emits its rank-median point."""
    from ..relational import partial_agg
    from ..sources.tables import read_points
    from ..stages.spatial_join import _cached_get

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        e = df["event_id"].to_numpy(np.int64)
        cents = np.round(df["value"].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        return pd.DataFrame({"event_id": e, "cents": cents})

    pts = read_points(sf_dir).map_batches(conv, batch_format="pandas") \
        .materialize()

    hist = partial_agg(pts.map_batches(
        lambda df: pd.DataFrame({"cents": df["cents"].to_numpy(np.int64),
                                 "n": np.ones(len(df), np.int64)}),
        batch_format="pandas"), ["cents"], [("n", "sum", "n")]).to_pandas() \
        .sort_values("cents").reset_index(drop=True)
    vals = hist["cents"].to_numpy(np.int64)
    base = np.concatenate([[0], np.cumsum(hist["n"].to_numpy(np.int64))])
    nt = int(base[-1])
    href = ray.put((vals, base[:-1]))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every value group in the bucket: global rank =
        # count of smaller values (broadcast histogram prefix) + ordinal
        # within the value by event_id (groupby.cumcount)
        vals_b, base_b = _cached_get(href)
        g = g.sort_values(["cents", "event_id"])
        c = g["cents"].to_numpy(np.int64)
        lo = base_b[np.searchsorted(vals_b, c)]
        rn = lo + g.groupby("cents").cumcount().to_numpy(np.int64) + 1
        out = g[["event_id", "cents"]].copy()
        out["rn"] = rn
        out["stratum"] = (rn - 1) * _CLHS_N // nt
        return out

    from ..relational import keyed_map_groups

    ranked = keyed_map_groups(pts, "cents", rank_part, per_group=False)

    # the rank-median of stratum s is closed-form: the stratum covers ranks
    # (floor(s*nt/N), floor((s+1)*nt/N)], so its median RANK is known from
    # nt alone — a vectorized filter replaces the stratum shuffle entirely
    # stratum s = (rn-1)*N // nt covers rn-1 in [ceil(s*nt/N), ceil((s+1)*nt/N))
    ss = np.arange(_CLHS_N, dtype=np.int64)
    lo_s = (ss * nt + _CLHS_N - 1) // _CLHS_N
    cnt_s = ((ss + 1) * nt + _CLHS_N - 1) // _CLHS_N - lo_s
    target = lo_s + (cnt_s + 1) // 2  # median rank per stratum

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        st = df["stratum"].to_numpy(np.int64)
        m = df["rn"].to_numpy(np.int64) == target[st]
        return pd.DataFrame({
            "stratum": st[m],
            "event_id": df["event_id"].to_numpy(np.int64)[m],
            "cents": df["cents"].to_numpy(np.int64)[m]})

    return ranked.map_batches(pick, batch_format="pandas")


# --------------------------------------------------------------------------
# Multi-band GeoTIFF round trip (round-3 VERDICT item 7): the image
# composite family gets an ON-DISK path — a deterministic RGB raster is
# written as a chunky RGB24 GeoTIFF (sources/geotiff.write_geotiff,
# whitebox-raster/src/geotiff/mod.rs:1441-1456 band handling), re-read
# band-parallel by the distributed importer, and composited
# (createColourComposite / split_colour_composite analog: per-cell bands +
# the integer intensity 3I = R+G+B).
# --------------------------------------------------------------------------
_RGB_ROWS, _RGB_COLS = 96, 130


def _rgb_formula(cell: str, band: int) -> str:
    return f"(({cell} * {3 + 2 * band} + {17 * (band + 1)}) % 256)"


def _rgb_np(cells: np.ndarray, band: int) -> np.ndarray:
    return (cells * (3 + 2 * band) + 17 * (band + 1)) % 256


@query(
    "rgb_composite_file",
    f"""
    WITH cells AS (SELECT CAST(t.i AS BIGINT) AS cell_id
                   FROM range({_RGB_ROWS * _RGB_COLS}) t(i))
    SELECT cell_id,
           CAST({_rgb_formula("cell_id", 0)} AS BIGINT) AS r,
           CAST({_rgb_formula("cell_id", 1)} AS BIGINT) AS g,
           CAST({_rgb_formula("cell_id", 2)} AS BIGINT) AS b,
           CAST({_rgb_formula("cell_id", 0)}
                + {_rgb_formula("cell_id", 1)}
                + {_rgb_formula("cell_id", 2)} AS BIGINT) AS i3
    FROM cells
    """,
)
def rgb_composite_file(sf_dir: str):
    """CreateColourComposite / SplitColourComposite
    (image_analysis/{create_colour_composite,split_colour_composite}.rs) on
    a REAL multi-band file: write a deterministic RGB24 chunky GeoTIFF,
    re-read each band through the distributed tile importer, join the three
    band datasets per cell and emit the composite + integer intensity."""
    import os
    import tempfile

    from ..sources.geotiff import geotiff_to_tiles, write_geotiff

    path = os.path.join(tempfile.gettempdir(),
                        f"wbt_rgb_{_RGB_ROWS}x{_RGB_COLS}.tif")
    cells = np.arange(_RGB_ROWS * _RGB_COLS, dtype=np.int64)
    rgb = np.stack([_rgb_np(cells, b).reshape(_RGB_ROWS, _RGB_COLS)
                    for b in range(3)], axis=2).astype(np.uint8)
    write_geotiff(path, rgb, west=0.0, north=float(_RGB_ROWS), res=1.0)

    def explode(band: int):
        tiles = geotiff_to_tiles(path, tile=32, band=band)

        def cells_of(df: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for t in df.itertuples():
                nr, nc = int(t.nrows), int(t.ncols)
                r0, c0 = int(t.trow) * 32, int(t.tcol) * 32
                rr, cc = np.meshgrid(
                    np.arange(r0, r0 + nr, dtype=np.int64),
                    np.arange(c0, c0 + nc, dtype=np.int64), indexing="ij")
                outs.append(pd.DataFrame({
                    "cell_id": (rr * _RGB_COLS + cc).ravel(),
                    ("r", "g", "b")[band]:
                        np.asarray(t.data, np.float64).astype(np.int64)}))
            return pd.concat(outs, ignore_index=True)

        return tiles.map_batches(cells_of, batch_format="pandas")

    out = explode(0).join(explode(1), join_type="inner", num_partitions=8,
                          on=("cell_id",)) \
        .join(explode(2), join_type="inner", num_partitions=8,
              on=("cell_id",))
    return out.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "r": df["r"].to_numpy(np.int64),
            "g": df["g"].to_numpy(np.int64),
            "b": df["b"].to_numpy(np.int64),
            "i3": df["r"].to_numpy(np.int64) + df["g"].to_numpy(np.int64)
            + df["b"].to_numpy(np.int64)}),
        batch_format="pandas")
