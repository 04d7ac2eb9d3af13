"""LiDAR sweep #4 — the plane-fitting segmentation family:
LidarSegmentation (lidar_analysis/lidar_segmentation.rs),
LidarSegmentationBasedFilter
(lidar_analysis/lidar_segmentation_based_filter.rs),
LidarRansacPlanes (lidar_analysis/lidar_ransac_planes.rs),
ClassifyBuildingsInLidar (lidar_analysis/classify_buildings.rs) and
LidarRooftopAnalysis (lidar_analysis/lidar_rooftop_analysis.rs).

Shared machinery over the events point cloud (z = cents):
1. per-point least-squares plane normals from fixed-radius neighbourhoods
   (cell + 8 adjacent cells, radius R) — one cell co-group computing
   neighbour moment sums, closed-form 2x2 covariance solve, normal
   (-alpha, -beta, 1); degenerate fits (n < 3 or |det| < 1e-12) fall back
   to the vertical normal and are flagged non-planar;
2. the proximity/normal-similarity edge set — a second cell co-group with
   normals attached: (a, b) when dist <= R, |dz| <= maxzdiff and the
   normal cosine similarity >= cos(norm_diff);
3. connected components, fully distributed (the stages/clump
   border-merge pattern): the same co-group that finds edges labels each
   block's INTRA-block components locally and emits only the CROSS-block
   edges; those are mapped to local labels with two Dataset hash joins,
   and only the distinct label-pair graph (border components, not points)
   reaches the driver for the union-find merge. The relabel map that goes
   back out is label->label; per-point labels live in a Dataset and reach
   consumers through joins, never a broadcast per-point dict.

The reference's region growing visits points in stack order but the
resulting PARTITION is exactly these connected components (similarity is
symmetric), so segment labels are canonicalized to the lowest event_id.
All five entries are rows-only with brute O(n^2) pytest oracles
(tests/test_lidar4.py) — the plane fits are libm. A round-4 SQL-oracle
attempt was reverted with measurements: at sf0.001 the base plane makes
neighbouring normals near-identical, the |cos - threshold| margin at a
few patch-boundary pairs collapses below the moment-sum reassociation
drift (DuckDB's unordered SUM vs numpy's length-dependent pairwise
order), and 3 of ~800 edges flip, merging/splitting segments — so the
family is genuinely not hash-matchable, not merely unconverted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..memo import session_memo as _session_memo
from ..sources.synthetic import splitmix64
from ..sources.tables import read_points
from ..pointdefs import _lpts_df
from .queries import query

_R = 10.0          # neighbourhood radius (x/y units)
_G = 10.0          # co-group block size (>= _R so 3x3 blocks cover R)
_MAXZ = 4000       # maxzdiff in cents (covers the base plane's tilt over R)
_COS_TH = float(np.cos(np.radians(10.0)))  # norm_diff = 10 degrees
_MIN_BLD = 5       # classify_buildings: minimum segment size
_BLD_RESID = 200   # classify_buildings: min residual (cents) to be roof
_PATCH_OFF = 8000  # synthetic roof patch lift (cents), > _MAXZ so it cuts


def z_cents(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """The family's DSM-like synthetic surface: a tilted base plane plus
    deterministic elevated 4x4-unit patches (the 'roofs')."""
    base = np.round(200.0 * (x + 180.0) + 300.0 * (85.0 - y)).astype(np.int64)
    patch = ((np.floor((x + 180.0) / 4.0).astype(np.int64) * 7
              + np.floor((85.0 - y) / 4.0).astype(np.int64) * 11) % 9) == 0
    return base + np.where(patch, np.int64(_PATCH_OFF), np.int64(0))


def _block(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    bx = np.floor((x + 180.0) / _G).astype(np.int64)
    by = np.floor((85.0 - y) / _G).astype(np.int64)
    return by * 1000 + bx


def _pts(sf_dir: str):
    def conv(df: pd.DataFrame) -> pd.DataFrame:
        out = _lpts_df(df)
        x = out["x"].to_numpy(np.float64)
        y = out["y"].to_numpy(np.float64)
        out["cents"] = z_cents(x, y)
        out["cell_id"] = _block(x, y)
        return out

    return read_points(sf_dir).map_batches(conv, batch_format="pandas")


def _replicate(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Each point lands in its own block (own=1) and its 8 neighbours."""
    outs = []
    cid = df["cell_id"].to_numpy(np.int64)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            out = df[cols].copy()
            out["grp"] = cid + dr * 1000 + dc
            out["own"] = np.int64(1 if (dr, dc) == (0, 0) else 0)
            outs.append(out)
    return pd.concat(outs, ignore_index=True)


def point_normals(pts) -> "ray.data.Dataset":
    """(event_id, x, y, cents, cell_id, nx3: a, b [normal = (-a,-b,1)],
    planar) — LSQ plane fit over the radius-R neighbourhood."""
    cols = ["event_id", "x", "y", "cents", "cell_id"]

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        # float moment sums are order-dependent: fix event_id order so the
        # result is parallelism-invariant and matches the brute oracle
        g = g.sort_values("event_id")
        own = g[g["own"] == 1]
        if not len(own):
            return pd.DataFrame({k: np.empty(0, np.float64 if k not in
                                             ("event_id", "cell_id", "cents")
                                             else np.int64)
                                 for k in [*cols, "a", "b", "planar"]})
        ax = g["x"].to_numpy(np.float64)
        ay = g["y"].to_numpy(np.float64)
        az = g["cents"].to_numpy(np.float64)
        ox = own["x"].to_numpy(np.float64)
        oy = own["y"].to_numpy(np.float64)
        d2 = (ax[None, :] - ox[:, None]) ** 2 + (ay[None, :] - oy[:, None]) ** 2
        m = d2 <= _R * _R  # includes the point itself
        n = m.sum(axis=1).astype(np.float64)
        sx = (ax[None, :] * m).sum(axis=1)
        sy = (ay[None, :] * m).sum(axis=1)
        sz = (az[None, :] * m).sum(axis=1)
        sxx = (ax[None, :] ** 2 * m).sum(axis=1)
        syy = (ay[None, :] ** 2 * m).sum(axis=1)
        sxy = (ax[None, :] * ay[None, :] * m).sum(axis=1)
        sxz = (ax[None, :] * az[None, :] * m).sum(axis=1)
        syz = (ay[None, :] * az[None, :] * m).sum(axis=1)
        cxx = sxx - sx * sx / n
        cyy = syy - sy * sy / n
        cxy = sxy - sx * sy / n
        cxz = sxz - sx * sz / n
        cyz = syz - sy * sz / n
        det = cxx * cyy - cxy * cxy
        ok = (n >= 3) & (np.abs(det) > 1e-12)
        with np.errstate(invalid="ignore", divide="ignore"):
            a = np.where(ok, (cxz * cyy - cyz * cxy) / det, 0.0)
            b = np.where(ok, (cyz * cxx - cxz * cxy) / det, 0.0)
        out = own[cols].copy()
        out["a"] = a
        out["b"] = b
        out["planar"] = ok.astype(np.int64)
        return out

    rep = pts.map_batches(lambda df: _replicate(df, cols),
                          batch_format="pandas")
    from ..relational import keyed_map_groups

    return keyed_map_groups(rep, "grp", moments)


def _cos_normals(a1, b1, a2, b2):
    return (a1 * a2 + b1 * b2 + 1.0) / np.sqrt(
        (a1 * a1 + b1 * b1 + 1.0) * (a2 * a2 + b2 * b2 + 1.0))



def _mixed_local(normals_ds, *, z_col: str = "cents"):
    """ONE co-group pass per 3x3-block neighbourhood emitting two row
    kinds: kind=0 (a=event_id, b=local label) — the INTRA-block connected
    components, label = lowest member event_id — and kind=1 (a=own
    event_id, b=cross-block neighbour event_id) — the border edges.
    Similarity: dist <= R, |dz| <= maxzdiff, normal cosine >= cos(10 deg)."""
    cols = ["event_id", "x", "y", "cents", "cell_id", "a", "b", "planar"]
    if z_col not in cols:
        cols.append(z_col)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        own = g["own"].to_numpy(np.int64) == 1
        if not own.any():
            return pd.DataFrame({"kind": np.empty(0, np.int64),
                                 "a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "c": np.empty(0, np.int64)})
        ax = g["x"].to_numpy(np.float64)
        ay = g["y"].to_numpy(np.float64)
        az = g[z_col].to_numpy(np.float64)
        aid = g["event_id"].to_numpy(np.int64)
        aa = g["a"].to_numpy(np.float64)
        ab = g["b"].to_numpy(np.float64)
        d2 = (ax[None, :] - ax[own][:, None]) ** 2 \
            + (ay[None, :] - ay[own][:, None]) ** 2
        dz = np.abs(az[None, :] - az[own][:, None])
        cos = _cos_normals(aa[own][:, None], ab[own][:, None],
                           aa[None, :], ab[None, :])
        cond = (d2 <= _R * _R) & (dz <= _MAXZ) & (cos >= _COS_TH)
        own_pos = np.nonzero(own)[0]
        oid = aid[own]
        # local union-find over the own-own subgraph (small: one block)
        parent = list(range(len(oid)))

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        ii, jj = np.nonzero(np.triu(cond[:, own_pos], 1))
        for i, j in zip(ii.tolist(), jj.tolist()):
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(len(oid))], np.int64)
        cmin: dict[int, int] = {}
        for i, r in enumerate(roots.tolist()):
            v = int(oid[i])
            cmin[r] = v if r not in cmin else min(cmin[r], v)
        lab = np.array([cmin[r] for r in roots.tolist()], np.int64)
        # c carries the OWN endpoint's local label on border rows (each
        # cross-block edge is emitted from BOTH home blocks — similarity is
        # symmetric and replication covers all 8 neighbours — so a min/max
        # aggregate over the edge key recovers both endpoint labels with no
        # per-point join); on kind=0 rows c just mirrors the label
        outs = [pd.DataFrame({"kind": np.zeros(len(oid), np.int64),
                              "a": oid, "b": lab, "c": lab})]
        nb_pos = np.nonzero(~own)[0]
        if len(nb_pos):
            bi, bj = np.nonzero(cond[:, nb_pos])
            if len(bi):
                outs.append(pd.DataFrame({
                    "kind": np.ones(len(bi), np.int64),
                    "a": oid[bi], "b": aid[nb_pos][bj],
                    "c": lab[bi]}))
        return pd.concat(outs, ignore_index=True)

    from ..relational import keyed_map_groups

    rep = normals_ds.map_batches(lambda df: _replicate(df, cols),
                                 batch_format="pandas")
    return keyed_map_groups(rep, "grp", kern).materialize()


def point_labels(normals_ds, *, z_col: str = "cents"):
    """Dataset (event_id, segment): distributed connected components of the
    similarity graph. Per-block local labels stay distributed; only the
    DISTINCT cross-block label-pair graph reaches the driver for the
    union-find merge (clump border precedent); the relabel map broadcast
    back is label->label, never point->label."""
    from ..relational import partial_agg
    from ..stages.spatial_join import _cached_get

    mixed = _mixed_local(normals_ds, z_col=z_col)
    labels0 = mixed.map_batches(
        lambda df: df.loc[df["kind"] == 0, ["a", "b"]]
        .rename(columns={"a": "event_id", "b": "lab"}),
        batch_format="pandas")
    # border rows already carry the own endpoint's LOCAL LABEL (c); each
    # cross-block edge appears from both home blocks, so the two endpoint
    # labels are exactly the min and max of c over the edge key — one
    # border-bounded tree aggregate replaces the two per-point hash joins
    def edges(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df["kind"] == 1]
        a = d["a"].to_numpy(np.int64)
        b = d["b"].to_numpy(np.int64)
        return pd.DataFrame({"lo": np.minimum(a, b),
                             "hi": np.maximum(a, b),
                             "lab": d["c"].to_numpy(np.int64)})

    pairs = partial_agg(mixed.map_batches(edges, batch_format="pandas"),
                        ["lo", "hi"], [("lab", "min", "la"),
                                       ("lab", "max", "lb")]).to_pandas()
    pairs = pairs[["la", "lb"]].rename(columns={"la": "lo", "lb": "hi"})

    # driver union-find over LABELS only (border component graph)
    parent: dict[int, int] = {}

    def find(v: int) -> int:
        parent.setdefault(v, v)
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for lo, hi in zip(pairs["lo"].tolist(), pairs["hi"].tolist()):
        parent.setdefault(int(lo), int(lo))
        parent.setdefault(int(hi), int(hi))
        ra, rb = find(int(lo)), find(int(hi))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    relab = {v: find(v) for v in list(parent)}
    mref = ray.put(relab)

    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(mref)
        lab = df["lab"].to_numpy(np.int64)
        seg = pd.Series(lab).map(m).fillna(pd.Series(lab)).to_numpy(np.int64)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(np.int64),
                             "segment": seg})

    return labels0.map_batches(relabel, batch_format="pandas")


@_session_memo
def _normals_m(sf_dir: str):
    """Materialized plane-fit normals — the shared head of five entries
    (segmentation, seg-filter, buildings, rooftop); computed once per
    (sf_dir, Ray session)."""
    return point_normals(_pts(sf_dir)).materialize()


@_session_memo
def _labels_m(sf_dir: str):
    """Materialized cents-based segmentation labels shared by the
    segmentation + building entries."""
    return point_labels(_normals_m(sf_dir)).materialize()


def _with_resid(nds):
    """Attach resid = cents - min(cents over the 3x3 cell neighbourhood),
    computed as two partial aggregates + a hash join — no driver state."""
    from ..relational import partial_agg

    def cell_mins(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64),
                             "mn": df["cents"].to_numpy(np.int64)})

    mins = partial_agg(nds.map_batches(cell_mins, batch_format="pandas"),
                       ["cell_id"], [("mn", "min", "mn")])

    def spread(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["cell_id"].to_numpy(np.int64)
        mn = df["mn"].to_numpy(np.int64)
        outs = [pd.DataFrame({"cell_id": cid + dr * 1000 + dc, "mn": mn})
                for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
        return pd.concat(outs, ignore_index=True)

    nbmin = partial_agg(mins.map_batches(spread, batch_format="pandas"),
                        ["cell_id"], [("mn", "min", "nbmin")])
    j = nds.join(nbmin, join_type="inner", num_partitions=8,
                 on=("cell_id",))

    def resid(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=["nbmin"]).copy()
        out["resid"] = df["cents"].to_numpy(np.int64) \
            - df["nbmin"].to_numpy(np.int64)
        return out

    return j.map_batches(resid, batch_format="pandas")


@_session_memo
def _resid_m(sf_dir: str):
    """Materialized normals + 3x3-cell-min residual, shared by the
    segmentation filter and the building family."""
    return _with_resid(_normals_m(sf_dir)).materialize()


@query("lidar_segmentation")
def lidar_segmentation(sf_dir: str):
    """LidarSegmentation (lidar_analysis/lidar_segmentation.rs): plane-fit
    normals + proximity/normal-similarity components (module docstring).
    Output (event_id, segment, planar) int64, segment = lowest member
    event_id. Distributed CC: per-block local labels + border-label-graph
    merge; labels joined back as a Dataset. Rows-only; brute O(n^2) oracle
    in tests/test_lidar4.py."""
    nds = _normals_m(sf_dir)
    labels = _labels_m(sf_dir)
    pl = nds.map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "planar": df["planar"].to_numpy(np.int64)}),
        batch_format="pandas")
    return labels.join(pl, join_type="inner", num_partitions=8,
                       on=("event_id",))


@query("lidar_segmentation_based_filter")
def lidar_segmentation_based_filter(sf_dir: str):
    """LidarSegmentationBasedFilter
    (lidar_analysis/lidar_segmentation_based_filter.rs:460-555): residual =
    cents minus the neighbourhood (3x3-cell) minimum; seed points (residual
    0) grow ground through |dresidual| <= maxzdiff + normal-similarity
    edges; class 2 = connected to a seed, else 1. Output (event_id, cls).
    Per-segment ground flags computed by aggregate + join (no driver
    per-point state). Rows-only; brute oracle in tests/test_lidar4.py."""
    from ..relational import partial_agg

    rds = _resid_m(sf_dir)
    labels = point_labels(rds, z_col="resid")

    er = rds.map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "resid": df["resid"].to_numpy(np.int64)}),
        batch_format="pandas")
    j = labels.join(er, join_type="inner", num_partitions=8,
                    on=("event_id",)).materialize()
    gmax = partial_agg(j.map_batches(
        lambda df: pd.DataFrame({
            "segment": df["segment"].to_numpy(np.int64),
            "g": (df["resid"].to_numpy(np.int64) == 0).astype(np.int64)}),
        batch_format="pandas"), ["segment"], [("g", "max", "g")])
    out = j.join(gmax, join_type="inner", num_partitions=8,
                 on=("segment",))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "cls": np.where(df["g"].to_numpy(np.int64) == 1,
                            np.int64(2), np.int64(1))})

    return out.map_batches(classify, batch_format="pandas")


_RANSAC_T = 8      # derandomized trials per cell
_RANSAC_EPS = 60   # vertical inlier tolerance (cents)


@query("lidar_ransac_planes")
def lidar_ransac_planes(sf_dir: str):
    """LidarRansacPlanes (lidar_analysis/lidar_ransac_planes.rs) under a
    derandomized per-cell contract: 8 splitmix64 trials pick 3 distinct
    points of the cell, the exact plane through them scores vertical
    inliers (|z - plane| < 60 cents), best trial wins (ties -> lowest
    trial). Output (event_id, inlier, trial) int64; cells with < 3 points
    emit trial -1. Rows-only; scalar oracle in tests/test_lidar4.py."""

    def ransac(g: pd.DataFrame) -> pd.DataFrame:
        e = g["event_id"].to_numpy(np.int64)
        order = np.argsort(e)
        e = e[order]
        x = g["x"].to_numpy(np.float64)[order]
        y = g["y"].to_numpy(np.float64)[order]
        z = g["cents"].to_numpy(np.float64)[order]
        n = len(e)
        cid = int(g["cell_id"].iloc[0])
        if n < 3:
            return pd.DataFrame({"event_id": e,
                                 "inlier": np.zeros(n, np.int64),
                                 "trial": np.full(n, -1, np.int64)})
        best = (-1, -1, np.zeros(n, bool))
        for t in range(_RANSAC_T):
            h = splitmix64(np.arange(3, dtype=np.uint64)
                           + np.uint64(cid * 131 + t * 7_777_777))
            idx = (h % np.uint64(n)).astype(np.int64)
            if len(set(idx.tolist())) < 3:
                continue
            p = np.stack([x[idx], y[idx], z[idx]], axis=1)
            v1, v2 = p[1] - p[0], p[2] - p[0]
            nx = v1[1] * v2[2] - v1[2] * v2[1]
            ny = v1[2] * v2[0] - v1[0] * v2[2]
            nz = v1[0] * v2[1] - v1[1] * v2[0]
            if nz == 0.0:
                continue  # vertical plane: no z = f(x, y) form
            a, b = -nx / nz, -ny / nz
            c = p[0, 2] - a * p[0, 0] - b * p[0, 1]
            inl = np.abs(z - (a * x + b * y + c)) < _RANSAC_EPS
            if int(inl.sum()) > best[0]:
                best = (int(inl.sum()), t, inl)
        return pd.DataFrame({"event_id": e,
                             "inlier": best[2].astype(np.int64),
                             "trial": np.full(n, best[1], np.int64)})

    return _pts(sf_dir).groupby("cell_id").map_groups(
        ransac, batch_format="pandas")


@_session_memo
def _building_flags(sf_dir: str):
    """(labels Dataset, per-segment building-flag Dataset): segments that
    are planar throughout, >= _MIN_BLD points, and whose MINIMUM residual
    over the 3x3-cell minimum exceeds _BLD_RESID — aggregates + joins,
    nothing driver-side."""
    from ..relational import partial_agg

    rds = _resid_m(sf_dir)
    labels = _labels_m(sf_dir)
    er = rds.map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "resid": df["resid"].to_numpy(np.int64),
            "planar": df["planar"].to_numpy(np.int64)}),
        batch_format="pandas")
    j = labels.join(er, join_type="inner", num_partitions=8,
                    on=("event_id",))
    stats = partial_agg(j.map_batches(
        lambda df: pd.DataFrame({
            "segment": df["segment"].to_numpy(np.int64),
            "resid": df["resid"].to_numpy(np.int64),
            "planar": df["planar"].to_numpy(np.int64),
            "one": np.ones(len(df), np.int64)}),
        batch_format="pandas"), ["segment"],
        [("resid", "min", "minres"), ("planar", "min", "allplan"),
         ("one", "sum", "n")])

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        bld = ((df["allplan"].to_numpy(np.int64) == 1)
               & (df["n"].to_numpy(np.int64) >= _MIN_BLD)
               & (df["minres"].to_numpy(np.int64) > _BLD_RESID))
        return pd.DataFrame({"segment": df["segment"].to_numpy(np.int64),
                             "bld": bld.astype(np.int64)})

    # materialized: tiny per-segment table, and it caps the number of
    # concurrent shuffle operators in the consumer plans (3+ joins in one
    # streaming plan deadlock the aggregator actor pools on small clusters)
    return labels, stats.map_batches(flag, batch_format="pandas") \
        .materialize()


@query("classify_buildings")
def classify_buildings(sf_dir: str):
    """ClassifyBuildingsInLidar (lidar_analysis/classify_buildings.rs)
    analog on the segmentation: planar segments of >= 5 points whose
    minimum residual (cents above the 3x3-cell minimum) exceeds 200 are
    buildings -> class 6, everything else gets the derived fallback
    class event_id % 6 (never 6, so class 6 identifies buildings).
    Output (event_id, cls). Rows-only; compositional oracle in
    tests/test_lidar4.py."""
    labels, bflag = _building_flags(sf_dir)
    out = labels.join(bflag, join_type="inner", num_partitions=8,
                      on=("segment",))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        ee = df["event_id"].to_numpy(np.int64)
        cls = np.where(df["bld"].to_numpy(np.int64) == 1, np.int64(6),
                       ee % 6)
        return pd.DataFrame({"event_id": ee, "cls": cls.astype(np.int64)})

    return out.map_batches(classify, batch_format="pandas")


@query("lidar_rooftop_analysis")
def lidar_rooftop_analysis(sf_dir: str):
    """LidarRooftopAnalysis (lidar_analysis/lidar_rooftop_analysis.rs)
    analog: per building segment (classify_buildings rule) the segment-wide
    LSQ roof plane — slope in milli-units (1000*sqrt(a^2+b^2)), point
    count, mean elevation cents (floored). Output
    (segment, n_points, slope_milli, mean_cents) via groupby(segment)
    .map_groups over building points only. Rows-only; compositional oracle
    in tests/test_lidar4.py."""
    nds = _normals_m(sf_dir)
    labels, bflag = _building_flags(sf_dir)
    xyz = nds.map_batches(
        lambda df: pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "x": df["x"].to_numpy(np.float64),
            "y": df["y"].to_numpy(np.float64),
            "cents": df["cents"].to_numpy(np.int64)}),
        batch_format="pandas")
    j = labels.join(xyz, join_type="inner", num_partitions=8,
                    on=("event_id",)).materialize()
    bj = j.join(bflag, join_type="inner", num_partitions=8,
                on=("segment",)) \
        .filter(lambda r: r["bld"] == 1)

    def roof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id")
        cx = g["x"].to_numpy(np.float64)
        cy = g["y"].to_numpy(np.float64)
        cz = g["cents"].to_numpy(np.float64)
        n = len(g)
        sxm, sym, szm = cx.mean(), cy.mean(), cz.mean()
        cxx = ((cx - sxm) ** 2).sum()
        cyy = ((cy - sym) ** 2).sum()
        cxy = ((cx - sxm) * (cy - sym)).sum()
        cxz = ((cx - sxm) * (cz - szm)).sum()
        cyz = ((cy - sym) * (cz - szm)).sum()
        det = cxx * cyy - cxy * cxy
        a = (cxz * cyy - cyz * cxy) / det if abs(det) > 1e-12 else 0.0
        b = (cyz * cxx - cxz * cxy) / det if abs(det) > 1e-12 else 0.0
        return pd.DataFrame({
            "segment": [int(g["segment"].iloc[0])], "n_points": [n],
            "slope_milli": [int(np.floor(
                1000.0 * np.sqrt(a * a + b * b)))],
            "mean_cents": [int(np.floor(szm))]}).astype(np.int64)

    return bj.groupby("segment").map_groups(roof, batch_format="pandas")
