"""Stream/terrain sweep #4: ExtractValleys (Peucker–Douglas),
RasterStreamsToVector, LongProfileFromPoints, SurfaceAreaRatio,
StandardDeviationOfSlope, CircularVarianceOfAspect, RelativeAspect.

Float contracts: SurfaceAreaRatio is sqrt/×/± only (Heron facets) with
one shared expression tree — bit-exact. The slope/aspect family passes
through libm atan/atan2/sin/cos and uses the mathops2 micro-unit guard
band (per-cell quantities quantized to integers BEFORE any aggregation,
so the global sums are exact and order-independent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hydrodefs import (_GRAPH_CTES, _LINK_CTES, _STREAM_CTES,
                         _WALK_UNITS_CTE, _d8_pointer, _hop_sql,
                         STREAM_ACC_T)
from ..layers import GRID1
from ..rasterdefs import _CELLS_CTE, _value_fn
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols


# --------------------------------------------------------------------------
# ExtractValleys, Peucker–Douglas variant (stream_network_analysis/
# extract_valleys.rs:457-487, line_thin=false): every 2x2 window marks its
# maximum (self preferred on ties, then the NW,N,W scan order); unmarked
# cells are potential valley bottoms.
# --------------------------------------------------------------------------
@query(
    "extract_valleys_pd",
    f"""
    WITH {_CELLS_CTE},
    cand AS (
      SELECT a.cell_id AS anchor, a.cell_id AS cand, 0 AS prio, a.v
      FROM cells a
      UNION ALL
      SELECT a.cell_id, b.cell_id, 1, b.v
      FROM cells a JOIN cells b ON b.r = a.r - 1 AND b.c = a.c - 1
      UNION ALL
      SELECT a.cell_id, b.cell_id, 2, b.v
      FROM cells a JOIN cells b ON b.r = a.r - 1 AND b.c = a.c
      UNION ALL
      SELECT a.cell_id, b.cell_id, 3, b.v
      FROM cells a JOIN cells b ON b.r = a.r AND b.c = a.c - 1
    ),
    winner AS (
      SELECT DISTINCT cand FROM (
        SELECT anchor, cand,
               row_number() OVER (PARTITION BY anchor
                                  ORDER BY v DESC, prio ASC) AS rn
        FROM cand) WHERE rn = 1
    )
    SELECT c.cell_id, CAST(1 AS BIGINT) AS valley
    FROM cells c LEFT JOIN winner w ON w.cand = c.cell_id
    WHERE w.cand IS NULL
    """,
)
def extract_valleys_pd(sf_dir: str):
    from ..stages.raster import synth_raster_tiles, window_exchange

    def window_fn(padded, nr, nc, r0, c0) -> pd.DataFrame:
        z = padded[1:nr + 1, 1:nc + 1]
        rr, cc = np.meshgrid(np.arange(r0, r0 + nr), np.arange(c0, c0 + nc),
                             indexing="ij")
        cid = rr.astype(np.int64) * _COLS + cc.astype(np.int64)
        # window anchored at each cell: candidates self(prio0), NW(1),
        # N(2), W(3); winner = max v, ties -> lowest prio
        best_v = z.copy()
        best_t = cid.copy()
        for prio, (dr, dc) in enumerate(((-1, -1), (-1, 0), (0, -1)), 1):
            w = padded[1 + dr:1 + dr + nr, 1 + dc:1 + dc + nc]
            tid = cid + dr * _COLS + dc
            better = ~np.isnan(w) & (w > best_v)
            best_v = np.where(better, w, best_v)
            best_t = np.where(better, tid, best_t)
        # marks may target halo cells of the neighbouring tile
        return pd.DataFrame({"cell_id": best_t.ravel(),
                             "marked": np.ones(nr * nc, np.int64)})

    tiles = synth_raster_tiles(GRID1, _value_fn)
    marks = window_exchange(tiles, GRID1, window_fn, k=1)

    from ..relational import partial_agg

    marked = partial_agg(marks, ["cell_id"], [("marked", "max", "marked")])
    md = marked.to_pandas()
    marked_ids = np.sort(md["cell_id"].to_numpy(np.int64))
    import ray as _ray
    ref = _ray.put(marked_ids)

    from ..stages.spatial_join import _cached_get

    def valleys(df: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(ref)
        frames = []
        for t in df.itertuples():
            nr, nc = int(t.nrows), int(t.ncols)
            r0, c0 = int(t.trow) * 64, int(t.tcol) * 64
            rr, cc = np.meshgrid(np.arange(r0, r0 + nr, dtype=np.int64),
                                 np.arange(c0, c0 + nc, dtype=np.int64),
                                 indexing="ij")
            cid = rr.ravel() * _COLS + cc.ravel()
            pos = np.minimum(np.searchsorted(m, cid), len(m) - 1)
            keep = m[pos] != cid
            frames.append(pd.DataFrame({
                "cell_id": cid[keep],
                "valley": np.ones(int(keep.sum()), np.int64)}))
        return pd.concat(frames, ignore_index=True)

    tiles2 = synth_raster_tiles(GRID1, _value_fn)
    return tiles2.map_batches(valleys, batch_format="pandas")


# --------------------------------------------------------------------------
# RasterStreamsToVector (stream_network_analysis/raster_streams_to_vector.rs):
# one vertex row per stream cell — (link_id, distance-to-link-outlet in
# fixed-point units, cell centre x/y); sorting by distance DESC yields the
# polyline vertex order. Composition: stream_link_id labels + flowpath
# length over the junction-cut link graph.
# --------------------------------------------------------------------------
_RS2V_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_STREAM_CTES},
    {_LINK_CTES},
    walklk(start, cur, units) AS (
      SELECT cell_id, cell_id, CAST(0 AS BIGINT) FROM lgraph
      UNION ALL
      SELECT w.start, l.nxt, w.units + {_hop_sql('w.cur', 'l.nxt')}
      FROM walklk w JOIN lgraph l ON l.cell_id = w.cur WHERE l.nxt >= 0
    ),
    dist AS (
      SELECT start AS cell_id, MAX(units) AS dist_units
      FROM walklk GROUP BY start
    )
    SELECT l.cell_id, l.link_id, d.dist_units,
           ({GRID1.west + GRID1.res_x / 2.0!r}
            + CAST(l.cell_id % {_COLS} AS DOUBLE) * {GRID1.res_x!r}) AS x,
           ({GRID1.north - GRID1.res_y / 2.0!r}
            - CAST(l.cell_id // {_COLS} AS DOUBLE) * {GRID1.res_y!r}) AS y
    FROM link l JOIN dist d ON d.cell_id = l.cell_id
"""


@query("raster_streams_to_vector", _RS2V_SQL)
def raster_streams_to_vector(sf_dir: str):
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import flowpath_length_pregel
    from ..stages.spatial_join import _cached_get
    from .queries_raster import stream_link_id

    link = stream_link_id(sf_dir).materialize()
    lp = link.to_pandas()
    scells = np.sort(lp["cell_id"].to_numpy(np.int64))
    # junction entries: stream cells with >= 2 stream in-edges
    import ray as _ray

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()
    # junction detection touches only stream-cell rows: pull those, not
    # the whole grid pointer
    from ..stages.flow import down_rows_touching, member_sorted

    dp = down_rows_touching(dds, scells)
    down = dp["down_id"].to_numpy(np.int64)
    down_stream_edge = member_sorted(down, scells)
    tgt, cnt = np.unique(down[down_stream_edge], return_counts=True)
    junctions = np.sort(tgt[cnt >= 2])
    sref = _ray.put((scells, junctions))

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        sc, jc = _cached_get(sref)
        cid = df["cell_id"].to_numpy(np.int64)
        down = df["down_id"].to_numpy(np.int64)

        def member(a, s):
            if not len(s):
                return np.zeros(len(a), bool)
            pos = np.minimum(np.searchsorted(s, a), len(s) - 1)
            return s[pos] == a

        is_s = member(cid, sc)
        keep = member(down, sc) & ~member(down, jc)
        out = pd.DataFrame({
            "cell_id": cid,
            "down_id": np.where(keep, down, np.int64(-1)),
            "tile": df["tile"].to_numpy(np.int64)})
        return out[is_s]

    lgraph = dds.map_batches(cut, batch_format="pandas")
    dist = flowpath_length_pregel(lgraph, GRID1)
    j = link.join(dist, join_type="inner", num_partitions=8, on=("cell_id",))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "cell_id": cid,
            "link_id": df["link_id"].to_numpy(np.int64),
            "dist_units": df["len_units"].to_numpy(np.int64),
            "x": GRID1.west + GRID1.res_x / 2.0
            + (cid % _COLS).astype(np.float64) * GRID1.res_x,
            "y": GRID1.north - GRID1.res_y / 2.0
            - (cid // _COLS).astype(np.float64) * GRID1.res_y})

    return j.map_batches(finish, batch_format="pandas")


# --------------------------------------------------------------------------
# LongProfileFromPoints (stream_network_analysis/long_profile_from_points.rs):
# the elevation profile downstream of each snapped pour point — distance
# along the D8 path (dfl(pour) - dfl(cell), both to the shared outlet) and
# surface elevation. Composition: ONE bitmask accumulation marks the path
# cells of all 12 pour points, ONE flowpath-length run supplies distances.
# --------------------------------------------------------------------------
def _lpfp_sql() -> str:
    from ..hydrodefs import _POUR_CTES

    return f"""
    WITH RECURSIVE {_GRAPH_CTES},
    walk(start, cur) AS (
      SELECT cell_id, down_id FROM graph WHERE down_id >= 0
      UNION ALL
      SELECT w.start, g.down_id FROM walk w
      JOIN graph g ON g.cell_id = w.cur WHERE g.down_id >= 0
    ),
    {_POUR_CTES},
    {_WALK_UNITS_CTE}
    SELECT s.pour_id, w.units AS dist_units,
           CAST((w.cur * 1000003) % 1000 AS BIGINT) AS z
    FROM snapped s JOIN walku w ON w.start = s.snap_cell
    """


@query("long_profile_from_points", _lpfp_sql())
def long_profile_from_points(sf_dir: str):
    from ..stages.flow import down_ds_from_pointer, tile_of_expr
    from ..stages.pregel import (flowpath_length_pregel,
                                 weighted_accumulation_pregel)
    from .queries_hydro2 import snap_pour_points

    snaps = snap_pour_points(sf_dir).to_pandas()
    cells = snaps["snap_cell"].to_numpy(np.int64)
    pids = snaps["pour_id"].to_numpy(np.int64)

    dds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1).materialize()

    def masses(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        m = np.zeros(len(cid), np.int64)
        for pid, sc in zip(pids.tolist(), cells.tolist()):
            m = np.where(cid == sc, m | (1 << pid), m)
        return pd.DataFrame({"cell_id": cid,
                             "tile": tile_of_expr(cid, GRID1, 64),
                             "mass": m})

    acc = weighted_accumulation_pregel(
        dds, dds.map_batches(masses, batch_format="pandas"), GRID1)
    dfl = flowpath_length_pregel(dds, GRID1)
    j = acc.join(dfl, join_type="inner", num_partitions=8, on=("cell_id",))

    start_len = {int(p): 0 for p in pids}
    dflp = dfl.map_batches(
        lambda df: df[df["cell_id"].isin(cells)], batch_format="pandas") \
        .to_pandas()
    cell_len = dict(zip(dflp["cell_id"].astype(int),
                        dflp["len_units"].astype(int)))
    for pid, sc in zip(pids.tolist(), cells.tolist()):
        start_len[int(pid)] = cell_len[int(sc)]

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        mask = df["acc"].to_numpy(np.int64)
        ln = df["len_units"].to_numpy(np.int64)
        z = _value_fn(cid).astype(np.int64)
        frames = []
        for pid in pids.tolist():
            on = (mask >> pid) & 1 == 1
            frames.append(pd.DataFrame({
                "pour_id": np.int64(pid),
                "dist_units": start_len[int(pid)] - ln[on],
                "z": z[on]}))
        return pd.concat(frames, ignore_index=True)

    return j.map_batches(emit, batch_format="pandas")


# --------------------------------------------------------------------------
# SurfaceAreaRatio (terrain_analysis/surface_area_ratio.rs:227-330): eight
# Heron facets over the 3x3 window half-distances; sqrt/*/± only, one
# shared expression tree — bit-exact.
# --------------------------------------------------------------------------
_SAR_DX = (-1, 0, 1, -1, 0, 1, -1, 0, 1)
_SAR_DY = (-1, -1, -1, 0, 0, 0, 1, 1, 1)
_SAR_PAIRS = ((0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8),
              (0, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8),
              (4, 0), (4, 2), (4, 6), (4, 8))
_SAR_TRIS = ((0, 7, 12), (1, 7, 13), (2, 6, 12), (3, 8, 13),
             (2, 9, 14), (3, 11, 15), (4, 10, 14), (5, 10, 15))
_SAR_DIAG2 = float(np.sqrt(2.0)) * float(np.sqrt(2.0))


def _sar_sql() -> str:
    joins = " ".join(
        f"LEFT JOIN cells n{k} ON n{k}.r = a.r + ({_SAR_DY[k]}) "
        f"AND n{k}.c = a.c + ({_SAR_DX[k]})"
        for k in range(9) if k != 4)
    z = ["n0.v", "n1.v", "n2.v", "n3.v", "a.v", "n5.v", "n6.v", "n7.v",
         "n8.v"]
    dists = []
    for k, (i, j) in enumerate(_SAR_PAIRS):
        dpp = "1.0" if k < 12 else repr(_SAR_DIAG2)
        dists.append(
            f"CASE WHEN {z[i]} IS NOT NULL AND {z[j]} IS NOT NULL THEN "
            f"sqrt({dpp} + CAST(({z[i]} - {z[j]}) * ({z[i]} - {z[j]}) "
            f"AS DOUBLE)) / 2.0 ELSE 0.0 END AS d{k}")
    heron = []
    skip = []
    for t, (p, q, r) in enumerate(_SAR_TRIS):
        s = f"((d{p} + d{q} + d{r}) / 2.0)"
        heron.append(
            f"CASE WHEN d{p} * d{q} * d{r} <> 0.0 THEN "
            f"sqrt({s} * ({s} - d{p}) * ({s} - d{q}) * ({s} - d{r})) "
            f"ELSE 0.0 END")
        skip.append(f"CASE WHEN d{p} * d{q} * d{r} <> 0.0 THEN 0.0 "
                    f"ELSE 0.125 END")
    area = " + ".join(heron)
    planar = "1.0 - (" + " + ".join(skip) + ")"
    return f"""
    WITH {_CELLS_CTE},
    d AS (
      SELECT a.cell_id, {', '.join(dists)}
      FROM cells a {joins}
    )
    SELECT cell_id, ({area}) / ({planar}) AS sar
    FROM d WHERE ({planar}) > 0.0
    """


@query("surface_area_ratio", _sar_sql())
def surface_area_ratio(sf_dir: str):
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        zs = [padded[1 + _SAR_DY[k]:1 + _SAR_DY[k] + nr,
                     1 + _SAR_DX[k]:1 + _SAR_DX[k] + nc] for k in range(9)]
        ds = []
        for k, (i, j) in enumerate(_SAR_PAIRS):
            dpp = 1.0 if k < 12 else _SAR_DIAG2
            ok = ~np.isnan(zs[i]) & ~np.isnan(zs[j])
            zd = np.where(ok, zs[i] - zs[j], 0.0)
            ds.append(np.where(ok, np.sqrt(dpp + zd * zd) / 2.0, 0.0))
        area = np.zeros((nr, nc))
        planar = np.full((nr, nc), 1.0)
        for p, q, r in _SAR_TRIS:
            dp, dq, dr = ds[p], ds[q], ds[r]
            good = dp * dq * dr != 0.0
            s = (dp + dq + dr) / 2.0
            with np.errstate(invalid="ignore"):
                a = np.sqrt(s * (s - dp) * (s - dq) * (s - dr))
            area = area + np.where(good, a, 0.0)
            planar = planar - np.where(good, 0.0, 0.125)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(planar > 0.0, area / planar, np.nan)
        return {"sar": out}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[~df["sar"].isna(), "cell_id"]
            .to_numpy(np.int64),
            "sar": df.loc[~df["sar"].isna(), "sar"].to_numpy(np.float64)}),
        batch_format="pandas")


# --------------------------------------------------------------------------
# Horn gradient fragments shared by the slope/aspect family (interior
# cells only — every 3x3 neighbour on-grid; same restriction both sides).
# z indexes row-major 0..8 like _SAR; p = dz/dx, q = dz/dy.
# --------------------------------------------------------------------------
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
      SELECT a.cell_id, {p} AS p, {q} AS q
      FROM cells a {joins}
    )"""


def _horn_pq(padded: np.ndarray, nr: int, nc: int):
    zs = [padded[1 + _SAR_DY[k]:1 + _SAR_DY[k] + nr,
                 1 + _SAR_DX[k]:1 + _SAR_DX[k] + nc] for k in range(9)]
    p = ((zs[2] + 2 * zs[5] + zs[8]) - (zs[0] + 2 * zs[3] + zs[6])) / 8.0
    q = ((zs[6] + 2 * zs[7] + zs[8]) - (zs[0] + 2 * zs[1] + zs[2])) / 8.0
    return p, q


@query(
    "std_dev_of_slope",
    f"""
    WITH {_CELLS_CTE},
    {_horn_pq_sql()},
    sm AS (
      SELECT CAST(floor(degrees(atan(sqrt(p * p + q * q))) * 1e4 + 0.5)
                  AS BIGINT) AS s
      FROM pq
    )
    SELECT COUNT(*) AS n,
           sqrt((CAST(SUM(s * s) AS DOUBLE)
                 - CAST(SUM(s) AS DOUBLE) * CAST(SUM(s) AS DOUBLE) / COUNT(*))
                / COUNT(*)) / 1e4 AS sd_deg
    FROM sm
    """,
)
def std_dev_of_slope(sf_dir: str):
    """StandardDeviationOfSlope (terrain_analysis/
    standard_deviation_of_slope.rs): micro-degree slopes (guard band)
    summed as integers — the global sd is then bit-exact."""
    from ..relational import partial_agg
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        p, q = _horn_pq(padded, nr, nc)
        # 1e4 units: (sum s^2) then fits int64 (1e6 units overflow)
        slope = np.degrees(np.arctan(np.sqrt(p * p + q * q)))
        return {"s_micro": np.floor(slope * 1e4 + 0.5)}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    cellsd = stencil_3x3(tiles, GRID1, kern)

    def sums(df: pd.DataFrame) -> pd.DataFrame:
        sm = df["s_micro"].to_numpy(np.float64)
        ok = ~np.isnan(sm)
        s = sm[ok].astype(np.int64)
        return pd.DataFrame({"k": [np.int64(0)], "n": [len(s)],
                             "ss": [int(s.sum())],
                             "ss2": [int((s * s).sum())]})

    agg = partial_agg(cellsd.map_batches(sums, batch_format="pandas"),
                      ["k"], [("n", "sum", "n"), ("ss", "sum", "ss"),
                              ("ss2", "sum", "ss2")])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64).astype(np.float64)
        ss = df["ss"].to_numpy(np.int64).astype(np.float64)
        ss2 = df["ss2"].to_numpy(np.int64).astype(np.float64)
        return pd.DataFrame({"n": df["n"].to_numpy(np.int64),
                             "sd_deg": np.sqrt((ss2 - ss * ss / n) / n) / 1e4})

    return agg.map_batches(finish, batch_format="pandas")


@query(
    "circular_variance_aspect",
    f"""
    WITH {_CELLS_CTE},
    {_horn_pq_sql()},
    asp AS (
      SELECT cell_id, cell_id // {_COLS} AS r, cell_id % {_COLS} AS c,
             sin(atan2(q, -p)) AS sa, cos(atan2(q, -p)) AS ca
      FROM pq
    ),
    nbw AS ({" UNION ALL ".join(
        f"SELECT a.cell_id, b.sa, b.ca FROM asp a JOIN asp b "
        f"ON b.r = a.r + ({dr}) AND b.c = a.c + ({dc})"
        for dr in (-1, 0, 1) for dc in (-1, 0, 1))}),
    win AS (
      SELECT cell_id, COUNT(*) AS n, SUM(sa) AS ssa, SUM(ca) AS sca
      FROM nbw GROUP BY cell_id
    )
    SELECT cell_id,
           CAST(floor((1.0 - sqrt(ssa * ssa + sca * sca) / n) * 1e6 + 0.5)
                AS BIGINT) AS cv_micro
    FROM win WHERE n = 9
    """,
)
def circular_variance_aspect(sf_dir: str):
    """CircularVarianceOfAspect (terrain_analysis/
    circular_variance_of_aspect.rs) over the 3x3 window: 1 - Rbar of the
    Horn aspect unit vectors; micro units absorb the libm sin/cos/atan2
    drift AND the 9-term sum-order drift (the bilateral precedent).
    Full-window interior cells only."""
    from ..stages.raster import stencil_k, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        # padded is k=2: compute aspect on the 1-ring interior, then sum
        # the 3x3 aspect window for the centre cells
        h, w = padded.shape
        zi = padded  # alias
        zs = [zi[1 + _SAR_DY[k]:h - 1 + _SAR_DY[k],
                 1 + _SAR_DX[k]:w - 1 + _SAR_DX[k]] for k in range(9)]
        p = ((zs[2] + 2 * zs[5] + zs[8]) - (zs[0] + 2 * zs[3] + zs[6])) / 8.0
        q = ((zs[6] + 2 * zs[7] + zs[8]) - (zs[0] + 2 * zs[1] + zs[2])) / 8.0
        asp = np.arctan2(q, -p)
        sa, ca = np.sin(asp), np.cos(asp)
        ok = ~np.isnan(asp)
        ssa = np.zeros((nr, nc))
        sca = np.zeros((nr, nc))
        cnt = np.zeros((nr, nc), np.int64)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                sub = (slice(1 + dr, 1 + dr + nr), slice(1 + dc, 1 + dc + nc))
                ssa += np.where(ok[sub], sa[sub], 0.0)
                sca += np.where(ok[sub], ca[sub], 0.0)
                cnt += ok[sub].astype(np.int64)
        with np.errstate(invalid="ignore"):
            cv = 1.0 - np.sqrt(ssa * ssa + sca * sca) / cnt.astype(np.float64)
        out = np.where(cnt == 9, np.floor(cv * 1e6 + 0.5), np.nan)
        return {"cv_micro": out}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    res = stencil_k(tiles, GRID1, kern, k=2)
    return res.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[~df["cv_micro"].isna(), "cell_id"]
            .to_numpy(np.int64),
            "cv_micro": df.loc[~df["cv_micro"].isna(), "cv_micro"]
            .to_numpy(np.int64)}),
        batch_format="pandas")


@query(
    "relative_aspect",
    f"""
    WITH {_CELLS_CTE},
    {_horn_pq_sql()},
    asp AS (
      SELECT cell_id, degrees(atan2(q, -p)) AS adeg, p, q
      FROM pq WHERE p <> 0.0 OR q <> 0.0
    ),
    fold AS (
      SELECT cell_id,
             abs(CASE WHEN adeg < 0 THEN adeg + 360.0 ELSE adeg END - 90.0)
             AS d
      FROM asp
    )
    SELECT cell_id,
           CAST(floor(CASE WHEN d > 180.0 THEN 360.0 - d ELSE d END * 1e6
                      + 0.5) AS BIGINT) AS rel_micro
    FROM fold
    """,
)
def relative_aspect(sf_dir: str):
    """RelativeAspect (terrain_analysis/relative_aspect.rs, azimuth=90):
    angular distance of the Horn aspect from east, folded to [0, 180];
    flats excluded (reference nodata). Micro-degree guard band."""
    from ..stages.raster import stencil_3x3, synth_raster_tiles

    def kern(padded: np.ndarray, nr: int, nc: int) -> dict:
        p, q = _horn_pq(padded, nr, nc)
        adeg = np.degrees(np.arctan2(q, -p))
        adeg = np.where(adeg < 0, adeg + 360.0, adeg)
        d = np.abs(adeg - 90.0)
        d = np.where(d > 180.0, 360.0 - d, d)
        flat = (p == 0.0) & (q == 0.0)
        return {"rel_micro": np.where(flat, np.nan,
                                      np.floor(d * 1e6 + 0.5))}

    tiles = synth_raster_tiles(GRID1, _value_fn)
    return stencil_3x3(tiles, GRID1, kern).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df.loc[~df["rel_micro"].isna(), "cell_id"]
            .to_numpy(np.int64),
            "rel_micro": df.loc[~df["rel_micro"].isna(), "rel_micro"]
            .to_numpy(np.int64)}),
        batch_format="pandas")
