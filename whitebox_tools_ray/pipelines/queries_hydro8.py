"""Hydro/terrain sweep #8 — the last of the flow-graph family:
FloodOrder (hydro_analysis/flood_order.rs), Isobasins
(hydro_analysis/isobasins.rs) and MaxBranchLength
(terrain_analysis/max_branch_length.rs).

FloodOrder is the priority-flood pop sequence: each cell's rank in the
nondecreasing filled-elevation order. The reference's binary heap breaks
equal-priority ties arbitrarily (flood_order.rs:296-301); the contract
here canonicalizes ties by cell id — rank over (spill elevation, cell_id)
— so the output is deterministic and parallelism-invariant. The spill
elevations come from the existing sharded priority-flood fill.

Isobasins is the pour-point cut scan (equal-area basin partition): the
in-degree-gated wave in stages/pregel (iso_*) reproduces the reference's
carried-accumulation cut rule exactly; basin ids are canonicalized to the
OUTLET CELL ID (the reference numbers outlets in heap pop order —
partition-identical, label-renamed).

MaxBranchLength (Lindsay & Seibert 2013 Bmax) is integer-exact in the
fixed-point hop units shared with the flowpath-length family (2^20 per
cardinal step): for every cardinal neighbour pair of non-pit cells, both
flowpaths are enumerated by the sharded visit walk and their first common
cell (the D8-forest merge point) resolved by a co-grouped self-merge on
the visited cell; disjoint paths fall back to the full path length —
exactly max_branch_length.rs:349-420's lock-step double walk (minus its
idx = row*rows+col marking-collision quirk, documented there). Full SQL
oracle: the shared walku CTE joined pairwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..hydrodefs import (_FILL_DEM_PITS, _GRAPH_CTES, _WALK_UNITS_CTE,
                         _d8_pointer, _fill_cte)
from ..layers import GRID1
from .queries import query

_ROWS, _COLS = GRID1.rows, GRID1.cols


# --------------------------------------------------------------------------
# FloodOrder — rank of (fill, cell_id); rows-only (the fill itself has a
# priority-flood pytest oracle; tests/test_hydro8.py re-derives the rank
# independently with a heapq flood).
# --------------------------------------------------------------------------
def _fo_zfn(cids: np.ndarray) -> np.ndarray:
    """Same planted-pit DEM as fill_depressions (queries_raster.py) so the
    flood order is non-trivial inside the depressions."""
    cids = np.asarray(cids, np.int64)
    z = 100 + (cids * 7919) % 400
    r, c = cids // _COLS, cids % _COLS
    pit1 = (r > 40) & (r < 50) & (c > 60) & (c < 75)
    pit2 = (r > 100) & (r < 115) & (c > 200) & (c < 220)
    return np.where(pit1 | pit2, 5, z).astype(np.int64)


@query(
    "flood_order",
    f"WITH RECURSIVE {_fill_cte(_FILL_DEM_PITS, 40)} "
    "SELECT cell_id, ROW_NUMBER() OVER (ORDER BY fill, cell_id) "
    "AS flood_ord FROM fillw",
)
def flood_order(sf_dir: str):
    """FloodOrder (hydro_analysis/flood_order.rs:293-335): each cell's
    1-based position in the edge-inward inundation sequence. Spill
    elevations from the sharded priority-flood fill; the global rank is a
    tiny per-level offset table (distinct spill values, driver-side cumsum,
    bounded by the value alphabet) plus a per-level groupby rank by cell id
    (plateau groups; the tie canonicalization documented above). SQL
    oracle: the hydrodefs._fill_cte relaxation ranked by (fill, cell_id).
    Output (cell_id, flood_ord) int64."""
    from ..relational import partial_agg
    from ..stages.pregel import fill_depressions_pregel

    fill_ds = fill_depressions_pregel(_fo_zfn, GRID1)  # (cell_id, fill)

    counts = partial_agg(fill_ds, ["fill"], [("cell_id", "count", "n")]) \
        .to_pandas().sort_values("fill")
    offs = dict(zip(counts["fill"].to_numpy(np.int64),
                    np.concatenate([[0], np.cumsum(
                        counts["n"].to_numpy(np.int64))[:-1]])))
    offs_ref = ray.put(offs)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["fill"].iloc[0])]
        cid = np.sort(g["cell_id"].to_numpy(np.int64))
        return pd.DataFrame({
            "cell_id": cid,
            "flood_ord": off + 1 + np.arange(len(cid), dtype=np.int64)})

    return fill_ds.groupby("fill").map_groups(rank, batch_format="pandas")


# --------------------------------------------------------------------------
# Isobasins — rows-only; dense reference scan oracle in tests/test_hydro8.
# --------------------------------------------------------------------------
ISO_TARGET = 600  # grid cells per basin (61,200-cell grid -> ~100 basins)


_ISO_OFFS = [_dy * _COLS + _dx for _dx, _dy in
             zip((1, 1, 1, 0, -1, -1, -1, 0), (-1, 0, 1, 1, 1, 0, -1, -1))]


def _iso_layer(src: str, target: int) -> str:
    """One Jacobi step of the gated cut fold: masked child out-values via
    LAG/LEAD (mask bits are STATIC child adjacency from the pointer
    graph), fa = 1 + sum, best child by key = out*8 + (7 - scan index),
    then the cut decision rewrites the value sent downstream."""
    terms_sum, terms_key = [], []
    for e in range(8):
        off = _ISO_OFFS[e]
        fn = "LAG" if off < 0 else "LEAD"
        acc = f"{fn}(outv, {abs(off)}) OVER (ORDER BY cid)"
        terms_sum.append(f"CASE WHEN (mask >> {e}) & 1 = 1 THEN {acc} "
                         f"ELSE 0 END")
        terms_key.append(f"CASE WHEN (mask >> {e}) & 1 = 1 THEN "
                         f"({acc})*8 + {7 - e} ELSE -1 END")
    l1 = (f"SELECT iter, cid, mask, 1 + ({' + '.join(terms_sum)}) AS fa, "
          f"GREATEST({', '.join(terms_key)}) AS inkey FROM ({src})")
    return (f"SELECT iter, cid, mask, CASE "
            f"WHEN fa >= {target} AND ({target} - inkey//8) < (fa - {target}) "
            f"AND (mask & 255) > 0 THEN fa - inkey//8 "
            f"WHEN fa >= {target} THEN 1 ELSE fa END AS outv FROM ({l1})")


def _iso_sql(target: int, outer: int = 80, steps: int = 4) -> str:
    """SQL twin of the isobasins wave (depth 305 on this forest; 320 Jacobi
    steps; equality with the sequential topological fold AND the Pregel
    entry asserted in tests/test_hydro8.py) + outlet derivation + the
    cut-graph chase for basin labels."""
    src = f"SELECT iter, cid, mask, outv FROM relax_iso WHERE iter < {outer}"
    for _ in range(steps):
        src = _iso_layer(src, target)
    kid_case = " ".join(f"WHEN {_ISO_OFFS[i]} THEN {1 << i}"
                        for i in range(8))
    bf_case = " ".join(f"WHEN {i} THEN cid + ({_ISO_OFFS[i]})"
                       for i in range(8))
    terms_sum, terms_key = [], []
    for e in range(8):
        off = _ISO_OFFS[e]
        fn = "LAG" if off < 0 else "LEAD"
        acc = f"{fn}(outv, {abs(off)}) OVER (ORDER BY cid)"
        terms_sum.append(f"CASE WHEN (mask >> {e}) & 1 = 1 THEN {acc} "
                         f"ELSE 0 END")
        terms_key.append(f"CASE WHEN (mask >> {e}) & 1 = 1 THEN "
                         f"({acc})*8 + {7 - e} ELSE -1 END")
    fin = (f"SELECT cid, mask, 1 + ({' + '.join(terms_sum)}) AS fa, "
           f"GREATEST({', '.join(terms_key)}) AS inkey FROM iso")
    ui = (f"(fa >= {target} AND ({target} - inkey//8) < (fa - {target}) "
          f"AND (mask & 255) > 0)")
    return f"""
    WITH RECURSIVE {_GRAPH_CTES},
    kids AS (
      SELECT g.down_id AS cell_id,
             SUM(CASE g.cell_id - g.down_id {kid_case} END) AS kmask
      FROM graph g WHERE g.down_id >= 0 GROUP BY g.down_id
    ),
    state0 AS MATERIALIZED (
      SELECT g.cell_id AS cid,
             CAST(COALESCE(k.kmask, 0)
                  + CASE WHEN g.down_id < 0 THEN 256 ELSE 0 END AS BIGINT)
                 AS mask
      FROM graph g LEFT JOIN kids k ON k.cell_id = g.cell_id
    ),
    relax_iso(iter, cid, mask, outv) AS (
      SELECT 0, cid, mask, CAST(0 AS BIGINT) FROM state0
      UNION ALL
      SELECT iter+1, cid, mask, outv FROM ({src}) s
    ),
    iso AS MATERIALIZED (SELECT cid, mask, outv FROM relax_iso
                         WHERE iter = {outer}),
    fin AS MATERIALIZED ({fin}),
    dec AS MATERIALIZED (
      SELECT cid, mask, fa, inkey, {ui} AS use_inflow,
             (fa >= {target} AND NOT {ui}) AS self_cut
      FROM fin
    ),
    outl AS MATERIALIZED (
      SELECT DISTINCT CASE (7 - (inkey % 8)) {bf_case} END AS cell
      FROM dec WHERE use_inflow
      UNION
      SELECT cid FROM dec WHERE self_cut
      UNION
      SELECT cid FROM dec WHERE (mask & 256) > 0 AND NOT self_cut
    ),
    graphc AS MATERIALIZED (
      SELECT g.cell_id, CASE WHEN o.cell IS NOT NULL THEN CAST(-1 AS BIGINT)
                             ELSE g.down_id END AS down_id
      FROM graph g LEFT JOIN outl o ON o.cell = g.cell_id
    ),
    chase(start, cur) AS (
      SELECT cell_id, cell_id FROM graphc
      UNION ALL
      SELECT c.start, g.down_id FROM chase c
      JOIN graphc g ON g.cell_id = c.cur WHERE g.down_id >= 0
    )
    SELECT c.start AS cell_id, c.cur AS basin
    FROM chase c JOIN graphc g ON g.cell_id = c.cur WHERE g.down_id < 0
    """


@query("isobasins", _iso_sql(ISO_TARGET))
def isobasins(sf_dir: str):
    """Isobasins (hydro_analysis/isobasins.rs:392-459): near-equal-area
    drainage basins. The gated cut wave (stages/pregel.isobasins_pregel)
    marks outlet cells; the pointer graph cut at the outlets feeds the
    existing basins labeling (doubling-table probe resolve), so each cell's
    basin is the first outlet at-or-downstream. Labels = outlet cell id.
    SQL oracle: _iso_sql Jacobi fold over static child masks. Output
    (cell_id, basin) int64."""
    from ..stages.flow import down_ds_from_pointer
    from ..stages.pregel import basins_pregel, isobasins_pregel

    down_ds = down_ds_from_pointer(_d8_pointer(sf_dir), GRID1)
    outlets = isobasins_pregel(down_ds, GRID1, ISO_TARGET)
    out_ref = ray.put(np.sort(outlets.to_pandas()["outlet"]
                              .to_numpy(np.int64)))

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(out_ref)
        cid = df["cell_id"].to_numpy(np.int64)
        down = np.where(np.isin(cid, o), np.int64(-1),
                        df["down_id"].to_numpy(np.int64))
        return pd.DataFrame({"cell_id": cid, "down_id": down,
                             "tile": df["tile"].to_numpy(np.int64)})

    return basins_pregel(down_ds.map_batches(cut, batch_format="pandas"),
                         GRID1)


# --------------------------------------------------------------------------
# MaxBranchLength — SQL-exact in hop units.
# --------------------------------------------------------------------------
_MBL_SQL = f"""
    WITH RECURSIVE {_GRAPH_CTES},
    {_WALK_UNITS_CTE},
    walkm AS MATERIALIZED (SELECT * FROM walku),
    np_ AS (SELECT cell_id FROM graph WHERE down_id >= 0),
    pairs AS MATERIALIZED (
      SELECT a.cell_id AS pa, b.cell_id AS pb
      FROM np_ a JOIN np_ b ON b.cell_id = a.cell_id + 1
        AND (a.cell_id % {_COLS}) < {_COLS - 1}
      UNION ALL
      SELECT a.cell_id, b.cell_id
      FROM np_ a JOIN np_ b ON b.cell_id = a.cell_id + {_COLS}
    ),
    meet AS MATERIALIZED (
      SELECT p.pa, p.pb, MIN(wa.units) AS da, MIN(wb.units) AS db
      FROM pairs p
      JOIN walkm wa ON wa.start = p.pa
      JOIN walkm wb ON wb.start = p.pb AND wb.cur = wa.cur
      GROUP BY p.pa, p.pb
    ),
    lens AS MATERIALIZED (
      SELECT start, MAX(units) AS L FROM walkm GROUP BY start),
    dists AS (
      SELECT p.pa AS cell, COALESCE(m.da, la.L) AS d
      FROM pairs p LEFT JOIN meet m ON m.pa = p.pa AND m.pb = p.pb
      JOIN lens la ON la.start = p.pa
      UNION ALL
      SELECT p.pb, COALESCE(m.db, lb.L)
      FROM pairs p LEFT JOIN meet m ON m.pa = p.pa AND m.pb = p.pb
      JOIN lens lb ON lb.start = p.pb
    )
    SELECT c.cell_id, CAST(COALESCE(MAX(d.d), 0) AS BIGINT) AS bmax_units
    FROM cells c LEFT JOIN dists d ON d.cell = c.cell_id
    GROUP BY c.cell_id
"""


@query("max_branch_length", _MBL_SQL)
def max_branch_length(sf_dir: str):
    """MaxBranchLength (terrain_analysis/max_branch_length.rs:349-440):
    Bmax — for each cardinal pair of non-pit neighbours, the flowpath
    distance from each member to the pair's first common path cell (or to
    its terminus when the paths never join); a cell's Bmax is the max over
    its pairs, 0 when it joins no pair. Stages: sharded visit walk
    (visits land on the visited cell's shard) -> per-tile self-merge finds
    the pairwise meets -> pair-key co-group fills in full-path fallbacks ->
    max per cell. Integer hop units (2^20/cardinal step) end to end.
    Brute double-walk equality on a small grid in tests/test_hydro8.py;
    the SQL oracle covers the full grid."""
    from ..stages.flow import down_ds_from_pointer

    return bmax_pipeline(
        down_ds_from_pointer(_d8_pointer(sf_dir), GRID1), GRID1)


def bmax_pipeline(down_ds, grid):
    """Grid-parametric Bmax (see max_branch_length docstring)."""
    from ..relational import partial_agg
    from ..stages.flow import tile_of_expr
    from ..stages.pregel import path_visits_pregel

    _ROWS, _COLS = grid.rows, grid.cols
    GRID1 = grid  # noqa: N806 — closures below reference the local name
    visits = path_visits_pregel(down_ds, GRID1, nonpit_only=True)

    lens = partial_agg(visits, ["origin"], [("units", "max", "L")])

    # ---- valid pairs (both members non-pit): one tile exchange ----------
    def pair_emit(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        nonpit = df["down_id"].to_numpy(np.int64) >= 0
        a = cid[nonpit]
        r, c = a // _COLS, a % _COLS
        outs = [pd.DataFrame({"cell": a, "kind": np.int64(0), "a": a})]
        right_ok = c < _COLS - 1
        outs.append(pd.DataFrame({"cell": a[right_ok] + 1,
                                  "kind": np.int64(1), "a": a[right_ok]}))
        down_ok = r < _ROWS - 1
        outs.append(pd.DataFrame({"cell": a[down_ok] + _COLS,
                                  "kind": np.int64(2), "a": a[down_ok]}))
        out = pd.concat(outs, ignore_index=True)
        out["tile"] = tile_of_expr(out["cell"].to_numpy(np.int64), GRID1, 64)
        return out

    def pair_merge(g: pd.DataFrame) -> pd.DataFrame:
        own = set(g.loc[g["kind"] == 0, "cell"].tolist())
        nb = g[g["kind"] != 0]
        ok = nb["cell"].isin(own).to_numpy()
        a = nb["a"].to_numpy(np.int64)[ok]
        b = nb["cell"].to_numpy(np.int64)[ok]
        k = nb["kind"].to_numpy(np.int64)[ok]
        return pd.DataFrame({"pk": a * 2 + (k - 1), "a": a, "b": b})

    pairs = down_ds.map_batches(pair_emit, batch_format="pandas") \
        .groupby("tile").map_groups(pair_merge, batch_format="pandas")

    # ---- meets: per-visited-cell self-merge ------------------------------
    def vis_tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["cell_id", "origin", "units"]].copy()
        out["tile"] = tile_of_expr(out["cell_id"].to_numpy(np.int64),
                                   GRID1, 64)
        return out

    def meet_merge(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for kind, step, guard in ((0, 1, (g["origin"] % _COLS) < _COLS - 1),
                                  (1, _COLS, g["origin"] // _COLS < _ROWS - 1)):
            left = g[guard].copy()
            left["bo"] = left["origin"] + step
            m = left.merge(g, left_on=["cell_id", "bo"],
                           right_on=["cell_id", "origin"],
                           suffixes=("_a", "_b"))
            if len(m):
                outs.append(pd.DataFrame({
                    "pk": m["origin_a"].to_numpy(np.int64) * 2 + kind,
                    "da": m["units_a"].to_numpy(np.int64),
                    "db": m["units_b"].to_numpy(np.int64)}))
        if not outs:
            return pd.DataFrame({"pk": np.empty(0, np.int64),
                                 "da": np.empty(0, np.int64),
                                 "db": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True)

    meet_rows = visits.map_batches(vis_tag, batch_format="pandas") \
        .groupby("tile").map_groups(meet_merge, batch_format="pandas")
    meets = partial_agg(meet_rows, ["pk"],
                        [("da", "min", "da"), ("db", "min", "db")])

    # ---- resolve: pair rows +- meets, fallbacks look up full lengths ----
    def pk_merge(g: pd.DataFrame) -> pd.DataFrame:
        pr = g[g["kind"] == 0]
        mt = g[g["kind"] == 1].set_index("pk")
        a = pr["a"].to_numpy(np.int64)
        b = pr["b"].to_numpy(np.int64)
        da = pr["pk"].map(mt["da"]).to_numpy() if len(mt) \
            else np.full(len(pr), np.nan)
        db = pr["pk"].map(mt["db"]).to_numpy() if len(mt) \
            else np.full(len(pr), np.nan)
        have = ~np.isnan(da)
        return pd.concat([
            pd.DataFrame({"cell": a[have], "kind": np.int64(0),
                          "d": da[have].astype(np.int64)}),
            pd.DataFrame({"cell": b[have], "kind": np.int64(0),
                          "d": db[have].astype(np.int64)}),
            pd.DataFrame({"cell": a[~have], "kind": np.int64(1),
                          "d": np.int64(0)}),
            pd.DataFrame({"cell": b[~have], "kind": np.int64(1),
                          "d": np.int64(0)}),
        ], ignore_index=True)

    def _ptile(pk: np.ndarray) -> np.ndarray:
        return tile_of_expr(pk // 2, GRID1, 64)

    tagged = pairs.map_batches(
        lambda df: df.assign(kind=np.int64(0), da=np.int64(0),
                             db=np.int64(0),
                             ptile=_ptile(df["pk"].to_numpy(np.int64))),
        batch_format="pandas") \
        .union(meets.map_batches(
            lambda df: pd.DataFrame({
                "pk": df["pk"].to_numpy(np.int64),
                "a": np.int64(-1), "b": np.int64(-1),
                "kind": np.int64(1),
                "da": df["da"].to_numpy(np.int64),
                "db": df["db"].to_numpy(np.int64),
                "ptile": _ptile(df["pk"].to_numpy(np.int64))}),
            batch_format="pandas"))
    need = tagged.groupby("ptile").map_groups(pk_merge, batch_format="pandas")

    # fallback rows (kind=1) need L(cell); resolved rows carry d already
    def len_tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cell": df["origin"].to_numpy(np.int64), "kind": np.int64(2),
            "d": df["L"].to_numpy(np.int64),
            "tile": tile_of_expr(df["origin"].to_numpy(np.int64), GRID1, 64)})

    def need_tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["tile"] = tile_of_expr(out["cell"].to_numpy(np.int64), GRID1, 64)
        return out

    def len_merge(g: pd.DataFrame) -> pd.DataFrame:
        ls = g[g["kind"] == 2].drop_duplicates("cell").set_index("cell")["d"]
        done = g[g["kind"] == 0][["cell", "d"]]
        fb = g[g["kind"] == 1]
        fbd = fb["cell"].map(ls)
        return pd.concat([
            done,
            pd.DataFrame({"cell": fb["cell"].to_numpy(np.int64),
                          "d": fbd.to_numpy(np.int64)}),
        ], ignore_index=True)

    dists = need.map_batches(need_tag, batch_format="pandas") \
        .union(lens.map_batches(len_tag, batch_format="pandas")) \
        .groupby("tile").map_groups(len_merge, batch_format="pandas")

    zeros = down_ds.map_batches(
        lambda df: pd.DataFrame({
            "cell": df["cell_id"].to_numpy(np.int64),
            "d": np.zeros(len(df), np.int64)}),
        batch_format="pandas")

    out = partial_agg(dists.union(zeros), ["cell"],
                      [("d", "max", "bmax_units")])
    return out.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell"].to_numpy(np.int64),
            "bmax_units": df["bmax_units"].to_numpy(np.int64)}),
        batch_format="pandas")
