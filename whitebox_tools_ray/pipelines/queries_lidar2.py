"""LiDAR sweep #2 over the events point cloud (read_points: event_id ->
x/y via the shared LCG transform, z = value).

LAS attributes the synthetic cloud lacks are derived deterministically from
event_id on BOTH sides (flightline = id%4, class = id%7, scan_angle =
(id*13)%41 - 20, num_returns = 1 + id%3, return_num = 1 + (id*31) %
num_returns, intensity = (id*97)%4096) — the whitebox LAS reader's
attribute columns re-expressed as pure functions so every oracle stays
SQL-exact. z is handled in integer CENTS (round(value*100), the
lidar_ground_classify convention).

Every entry is a column-pruned read -> vectorized map_batches ->
(optionally) one small groupby — no driver loops, no broadcast state except
the 13-vertex clip ring (a constant). Scale shape: per-cell aggregates are
partial-combined inside batches before the tiny keyed exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..layers import GRID1
from ..pointdefs import PTS_CTE, _cell_sql, _lpts_df  # noqa: F401
from ..relational import partial_agg
from ..sources.tables import read_points
from .queries import query

_c1, _r1, _CID = _cell_sql(GRID1)

_LPTS = f"""
    {PTS_CTE},
    lp AS (SELECT event_id, x, y,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents,
                  {_CID} AS cell_id,
                  event_id % 4 AS fl,
                  event_id % 7 AS cls,
                  ((event_id * 13) % 41) - 20 AS angle,
                  1 + (event_id % 3) AS nret,
                  1 + ((event_id * 31) % (1 + (event_id % 3))) AS ret,
                  (event_id * 97) % 4096 AS intensity
           FROM pts)
"""


def _points(sf_dir: str):
    return read_points(sf_dir).map_batches(_lpts_df, batch_format="pandas")


@query(
    "filter_lidar_classes",
    f"WITH {_LPTS} SELECT event_id, CAST(cls AS BIGINT) AS cls FROM lp "
    f"WHERE cls IN (2, 3)",
)
def filter_lidar_classes(sf_dir: str):
    """FilterLidarClasses (lidar_analysis/filter_lidar_classes.rs): keep
    points whose classification is in the exclusion-complement (classes 2
    ground / 3 low vegetation here). Embarrassingly parallel filter."""
    return _points(sf_dir).map_batches(
        lambda df: df.loc[df["cls"].isin([2, 3]), ["event_id", "cls"]],
        batch_format="pandas")


@query(
    "filter_lidar_scan_angles",
    f"WITH {_LPTS} SELECT event_id, CAST(angle AS BIGINT) AS angle FROM lp "
    f"WHERE ABS(angle) <= 12",
)
def filter_lidar_scan_angles(sf_dir: str):
    """FilterLidarScanAngles (lidar_analysis/filter_lidar_scan_angles.rs):
    drop points with |scan angle| above the threshold (12 deg)."""
    return _points(sf_dir).map_batches(
        lambda df: df.loc[df["angle"].abs() <= 12, ["event_id", "angle"]],
        batch_format="pandas")


@query(
    "lidar_point_density",
    f"""
    WITH {_LPTS}
    SELECT cell_id, COUNT(*) AS n,
           COUNT(*) / ({GRID1.res_x!r} * {GRID1.res_y!r}) AS density
    FROM lp GROUP BY cell_id
    """,
)
def lidar_point_density(sf_dir: str):
    """LidarPointDensity (lidar_analysis/lidar_point_density.rs): points
    per cell / cell area. Integer counts + one constant division —
    bit-exact."""
    ds = _points(sf_dir).map_batches(
        lambda df: df.groupby("cell_id", as_index=False).agg(n=("event_id", "size")),
        batch_format="pandas")
    area = GRID1.res_x * GRID1.res_y
    return partial_agg(ds, ["cell_id"], [("n", "sum", "n")]).map_batches(
        lambda df: df.assign(density=df["n"].astype(np.float64) / area),
        batch_format="pandas")


@query(
    "lidar_point_stats",
    f"""
    WITH {_LPTS}
    SELECT cell_id, COUNT(*) AS n, CAST(MIN(cents) AS BIGINT) AS zmin,
           CAST(MAX(cents) AS BIGINT) AS zmax,
           CAST(SUM(cents) AS BIGINT) AS zsum,
           CAST(MAX(intensity) AS BIGINT) AS imax
    FROM lp GROUP BY cell_id
    """,
)
def lidar_point_stats(sf_dir: str):
    """LidarPointStats (lidar_analysis/lidar_point_stats.rs): per-cell
    point count, elevation min/max/sum (integer cents) and max intensity —
    one partial-combined groupby. Integer-exact."""
    ds = _points(sf_dir).map_batches(
        lambda df: df.groupby("cell_id", as_index=False).agg(
            n=("event_id", "size"), zmin=("cents", "min"),
            zmax=("cents", "max"), zsum=("cents", "sum"),
            imax=("intensity", "max")),
        batch_format="pandas")
    return partial_agg(ds, ["cell_id"],
                       [("n", "sum", "n"), ("zmin", "min", "zmin"),
                        ("zmax", "max", "zmax"), ("zsum", "sum", "zsum"),
                        ("imax", "max", "imax")])


@query(
    "lidar_histogram",
    f"""
    WITH {_LPTS}
    SELECT cents // 100 AS z_bin, COUNT(*) AS n
    FROM lp GROUP BY 1
    """,
)
def lidar_histogram(sf_dir: str):
    """LidarHistogram (lidar_analysis/lidar_histogram.rs): elevation
    frequency table at 1-unit bins (cents // 100). Integer-exact."""
    ds = _points(sf_dir).map_batches(
        lambda df: df.assign(z_bin=df["cents"] // 100)
        .groupby("z_bin", as_index=False).agg(n=("event_id", "size")),
        batch_format="pandas")
    return partial_agg(ds, ["z_bin"], [("n", "sum", "n")])


@query(
    "lidar_info",
    f"""
    WITH {_LPTS}
    SELECT COUNT(*) AS n_points, CAST(MIN(cents) AS BIGINT) AS zmin,
           CAST(MAX(cents) AS BIGINT) AS zmax,
           COUNT(DISTINCT cls) AS n_classes,
           COUNT(DISTINCT fl) AS n_flightlines,
           CAST(SUM(CASE WHEN ret = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first_returns
    FROM lp
    """,
)
def lidar_info(sf_dir: str):
    """LidarInfo (lidar_analysis/lidar_info.rs): header-style summary —
    point count, z range, class/flightline cardinality, first-return count.
    One distributed partial aggregate. Integer-exact."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_points": [len(df)], "zmin": [df["cents"].min()],
            "zmax": [df["cents"].max()],
            "cls_mask": [int(np.bitwise_or.reduce(1 << df["cls"].to_numpy(np.int64)))
                         if len(df) else 0],
            "fl_mask": [int(np.bitwise_or.reduce(1 << df["fl"].to_numpy(np.int64)))
                        if len(df) else 0],
            "n_first": [int((df["ret"] == 1).sum())]})

    s = _points(sf_dir).map_batches(partial, batch_format="pandas").to_pandas()
    cls_mask = int(np.bitwise_or.reduce(s["cls_mask"].to_numpy(np.int64)))
    fl_mask = int(np.bitwise_or.reduce(s["fl_mask"].to_numpy(np.int64)))
    return pd.DataFrame({
        "n_points": [int(s["n_points"].sum())],
        "zmin": [int(s["zmin"].min())], "zmax": [int(s["zmax"].max())],
        "n_classes": [bin(cls_mask).count("1")],
        "n_flightlines": [bin(fl_mask).count("1")],
        "n_first_returns": [int(s["n_first"].sum())]})


@query(
    "flightline_overlap",
    f"""
    WITH {_LPTS}
    SELECT cell_id, COUNT(DISTINCT fl) AS n_flightlines
    FROM lp GROUP BY cell_id
    """,
)
def flightline_overlap(sf_dir: str):
    """FlightlineOverlap (lidar_analysis/flightline_overlap.rs): number of
    distinct flightlines contributing points to each cell. Distributed as
    per-batch flightline BITMASKS or-combined in the groupby (4 lines ->
    4-bit mask), then popcount — no distinct-shuffle. Integer-exact."""
    # distinct (cell, flightline) pairs via a tree-combined max, then a
    # per-cell count — two vectorized Arrow partial aggregates instead of
    # the sort-shuffle groupby whose per-group Python walk dominated
    # (~4k groups/s over 10k cells)
    pairs = partial_agg(_points(sf_dir).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "fl": df["fl"].to_numpy(np.int64),
            "one": np.ones(len(df), np.int64)}),
        batch_format="pandas"), ["cell_id", "fl"], [("one", "max", "one")])
    return partial_agg(pairs, ["cell_id"],
                       [("one", "sum", "n_flightlines")])


@query(
    "classify_overlap_points",
    f"""
    WITH {_LPTS},
    ov AS (SELECT cell_id FROM lp GROUP BY cell_id
           HAVING COUNT(DISTINCT fl) > 1)
    SELECT l.event_id,
           CAST(CASE WHEN o.cell_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
               AS overlap
    FROM lp l LEFT JOIN ov o ON o.cell_id = l.cell_id
    """,
)
def classify_overlap_points(sf_dir: str):
    """ClassifyOverlapPoints (lidar_analysis/classify_overlap_points.rs):
    flag points lying in cells visited by more than one flightline — the
    flightline_overlap mask joined back to the points on cell_id (a
    co-partitioned join, not a broadcast). Integer-exact."""
    pts = _points(sf_dir)
    # distinct (cell, flightline) pairs -> per-cell flightline count, both
    # tree-combined Arrow partials (same rework as flightline_overlap)
    pairs = partial_agg(pts.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "fl": df["fl"].to_numpy(np.int64),
            "one": np.ones(len(df), np.int64)}),
        batch_format="pandas"), ["cell_id", "fl"], [("one", "max", "one")])
    nfl = partial_agg(pairs, ["cell_id"], [("one", "sum", "nfl")])
    flags = nfl.map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "multi": (df["nfl"].to_numpy(np.int64) > 1).astype(np.int64)}),
        batch_format="pandas")
    j = pts.join(flags, join_type="left_outer", num_partitions=8,
                 on=("cell_id",))
    return j.map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "overlap": np.nan_to_num(df["multi"].to_numpy(np.float64))
            .astype(np.int64)}),
        batch_format="pandas")


@query(
    "lidar_dsm",
    f"""
    WITH {_LPTS}
    SELECT cell_id, CAST(MAX(cents) AS BIGINT) AS dsm_cents
    FROM lp WHERE ret = 1 GROUP BY cell_id
    """,
)
def lidar_dsm(sf_dir: str):
    """LidarDigitalSurfaceModel (lidar_analysis/lidar_dsm.rs): highest
    FIRST-return elevation per cell (the canopy/building top surface).
    Integer-exact."""
    ds = _points(sf_dir).map_batches(
        lambda df: df.loc[df["ret"] == 1, :]
        .groupby("cell_id", as_index=False).agg(dsm_cents=("cents", "max")),
        batch_format="pandas")
    return partial_agg(ds, ["cell_id"], [("dsm_cents", "max", "dsm_cents")])


@query(
    "lidar_tile_footprint",
    f"""
    WITH {_LPTS}
    SELECT CAST(FLOOR(x / 10.0) AS BIGINT) AS tx,
           CAST(FLOOR(y / 10.0) AS BIGINT) AS ty,
           COUNT(*) AS n,
           CAST(MIN(cents) AS BIGINT) AS zmin,
           CAST(MAX(cents) AS BIGINT) AS zmax
    FROM lp GROUP BY 1, 2
    """,
)
def lidar_tile_footprint(sf_dir: str):
    """LidarTileFootprint (lidar_analysis/lidar_tile_footprint.rs) +
    LidarTile (lidar_tile.rs): partition the cloud into 10x10-degree tiles
    and report each tile's point count and z range (the footprint
    attribute table). Integer-exact."""
    ds = _points(sf_dir).map_batches(
        lambda df: df.assign(tx=np.floor(df["x"] / 10.0).astype(np.int64),
                             ty=np.floor(df["y"] / 10.0).astype(np.int64))
        .groupby(["tx", "ty"], as_index=False).agg(
            n=("event_id", "size"), zmin=("cents", "min"),
            zmax=("cents", "max")),
        batch_format="pandas")
    return partial_agg(ds, ["tx", "ty"],
                       [("n", "sum", "n"), ("zmin", "min", "zmin"),
                        ("zmax", "max", "zmax")])


@query(
    "lidar_tophat_transform",
    f"""
    WITH {_LPTS},
    lrc AS (SELECT event_id, cents, {_r1} AS pr, {_c1} AS pc FROM lp),
    cellmin AS (SELECT pr, pc, MIN(cents) AS m FROM lrc GROUP BY pr, pc),
    nbmin AS (SELECT c.pr, c.pc, MIN(n.m) AS wmin
              FROM cellmin c
              JOIN cellmin n ON n.pr BETWEEN c.pr - 1 AND c.pr + 1
                            AND n.pc BETWEEN c.pc - 1 AND c.pc + 1
              GROUP BY c.pr, c.pc)
    SELECT l.event_id, CAST(l.cents - w.wmin AS BIGINT) AS tophat_cents
    FROM lrc l JOIN nbmin w ON w.pr = l.pr AND w.pc = l.pc
    """,
)
def lidar_tophat_transform(sf_dir: str):
    """LidarTophatTransform (lidar_analysis/lidar_tophat_transform.rs):
    white top-hat — each point's elevation minus the morphological opening
    approximated by the min of per-cell minima over the 3x3 cell
    neighbourhood (the height-above-ground normalisation shape). Per-cell
    minima are a tiny aggregate; the neighbourhood min is an 8-way
    self-join on cell keys, then one co-partitioned join back to points.
    Integer-exact. (Wrap-around col arithmetic matches the oracle: cell ids
    are row*cols+col on the same grid.)"""
    def with_rc(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            pr=np.floor((GRID1.north - df["y"].to_numpy(np.float64))
                        / GRID1.res_y).astype(np.int64),
            pc=np.floor((df["x"].to_numpy(np.float64) - GRID1.west)
                        / GRID1.res_x).astype(np.int64))

    pts = _points(sf_dir).map_batches(with_rc, batch_format="pandas")
    cellmin = partial_agg(pts.map_batches(
        lambda df: df.groupby(["pr", "pc"], as_index=False).agg(m=("cents", "min")),
        batch_format="pandas"), ["pr", "pc"], [("m", "min", "m")])

    def spread(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                frames.append(pd.DataFrame({
                    "pr": df["pr"].to_numpy(np.int64) + dr,
                    "pc": df["pc"].to_numpy(np.int64) + dc,
                    "m": df["m"].to_numpy(np.int64)}))
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["pr", "pc"], as_index=False)["m"].min()

    # spread each cell's min to its 9 (pr, pc) neighbours, min-combine, then
    # inner-join points back on the pair key — only pairs holding points
    # survive, exactly the oracle's BETWEEN join
    nbmin = partial_agg(cellmin.map_batches(spread, batch_format="pandas"),
                        ["pr", "pc"], [("m", "min", "wmin")])
    j = pts.join(nbmin, join_type="inner", num_partitions=8, on=("pr", "pc"))
    return j.map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "tophat_cents": (df["cents"] - df["wmin"]).to_numpy(np.int64)}),
        batch_format="pandas")


@query(
    "lidar_colourize",
    f"""
    WITH {_LPTS}
    SELECT event_id,
           CAST(1 + (cell_id * 1000003) % 255 AS BIGINT) AS red,
           CAST(1 + (cell_id * 999983 + 17) % 255 AS BIGINT) AS green,
           CAST(1 + (cell_id * 999979 + 5) % 255 AS BIGINT) AS blue
    FROM lp WHERE cell_id >= 0 AND cell_id < {GRID1.rows * GRID1.cols}
    """,
)
def lidar_colourize(sf_dir: str):
    """LidarColourize (lidar_analysis/lidar_colourize.rs): attach the RGB of
    the containing image cell (the queries_image4 synthetic bands) to each
    point — a pure function of cell_id here, a co-partitioned join against
    image tiles at scale. Integer-exact."""
    n_cells = GRID1.rows * GRID1.cols

    def f(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[(df["cell_id"] >= 0) & (df["cell_id"] < n_cells), :]
        c = d["cell_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": d["event_id"].to_numpy(np.int64),
            "red": 1 + (c * 1000003) % 255,
            "green": 1 + (c * 999983 + 17) % 255,
            "blue": 1 + (c * 999979 + 5) % 255})

    return _points(sf_dir).map_batches(f, batch_format="pandas")


@query(
    "lidar_thin_high_density",
    f"""
    WITH {_LPTS},
    ranked AS (SELECT event_id,
                      ROW_NUMBER() OVER (PARTITION BY cell_id
                                         ORDER BY event_id) AS rk
               FROM lp)
    SELECT event_id FROM ranked WHERE rk <= 5
    """,
)
def lidar_thin_high_density(sf_dir: str):
    """LidarThinHighDensity (lidar_analysis/lidar_thin_high_density.rs):
    cap each cell at 5 points, keeping the earliest by acquisition order
    (event_id = GPS-time rank) — a per-cell top-k inside map_groups, no
    global sort. Integer-exact."""

    from ..relational import tree_reduce

    # keep-5-smallest per cell is associative over row subsets, so a
    # tree-combined per-block reduction replaces the sort-shuffle groupby
    # (the root block is exactly the result — bounded by 5 x n_cells)
    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cell_id", "event_id"],
                              kind="mergesort").groupby("cell_id").head(5)

    sel = _points(sf_dir).map_batches(
        lambda df: pd.DataFrame({
            "cell_id": df["cell_id"].to_numpy(np.int64),
            "event_id": df["event_id"].to_numpy(np.int64)}),
        batch_format="pandas")
    out = tree_reduce(sel, topk, batch_format="pandas", levels=(8, 1))
    return out.map_batches(lambda df: df[["event_id"]],
                           batch_format="pandas")


@query(
    "lidar_kappa",
    f"""
    WITH {_LPTS},
    enc AS (SELECT event_id, cell_id, cents FROM lp),
    floor_z AS (SELECT cell_id, MIN(cents) AS zmin FROM enc GROUP BY cell_id),
    pred AS (SELECT e.event_id,
                    CASE WHEN e.cents - f.zmin <= 500 THEN 1 ELSE 0 END AS p,
                    CASE WHEN (e.event_id * 2654435761) % 100 < 60
                         THEN 1 ELSE 0 END AS t
             FROM enc e JOIN floor_z f USING (cell_id)),
    cm AS (SELECT CAST(SUM(CASE WHEN p = 1 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(SUM(CASE WHEN p = 1 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                  CAST(SUM(CASE WHEN p = 0 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                  CAST(SUM(CASE WHEN p = 0 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
                  COUNT(*) AS n FROM pred)
    SELECT (CAST(a + d AS DOUBLE) / n
            - (CAST(a + b AS DOUBLE) * (a + c) + CAST(c + d AS DOUBLE) * (b + d))
              / (CAST(n AS DOUBLE) * n))
           / (1.0 - (CAST(a + b AS DOUBLE) * (a + c)
                     + CAST(c + d AS DOUBLE) * (b + d))
                    / (CAST(n AS DOUBLE) * n)) AS kappa,
           a, b, c, d
    FROM cm
    """,
)
def lidar_kappa(sf_dir: str):
    """LidarKappaIndex (lidar_analysis/lidar_kappa.rs): Cohen's kappa =
    (po - pe) / (1 - pe) between the lidar_ground_classify prediction and a
    deterministic reference classification (Knuth-hash 60% positive),
    finished from the integer confusion matrix by one shared expression
    tree — bit-exact."""
    pts = _points(sf_dir)
    cellmin = partial_agg(pts.map_batches(
        lambda df: df.groupby("cell_id", as_index=False).agg(zmin=("cents", "min")),
        batch_format="pandas"), ["cell_id"], [("zmin", "min", "zmin")])
    j = pts.join(cellmin, join_type="inner", num_partitions=8, on=("cell_id",))

    def conf(df: pd.DataFrame) -> pd.DataFrame:
        p = ((df["cents"] - df["zmin"]) <= 500).to_numpy()
        t = ((df["event_id"].to_numpy(np.int64) * 2654435761) % 100 < 60)
        return pd.DataFrame({
            "a": [int((p & t).sum())], "b": [int((p & ~t).sum())],
            "c": [int((~p & t).sum())], "d": [int((~p & ~t).sum())]})

    s = j.map_batches(conf, batch_format="pandas").to_pandas()
    a, b = int(s["a"].sum()), int(s["b"].sum())
    c, d = int(s["c"].sum()), int(s["d"].sum())
    n = a + b + c + d
    po = np.float64(a + d) / n
    pe = (np.float64(a + b) * (a + c) + np.float64(c + d) * (b + d)) \
        / (np.float64(n) * n)
    return pd.DataFrame({"kappa": [(po - pe) / (1.0 - pe)],
                         "a": [a], "b": [b], "c": [c], "d": [d]})
