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
3. connected components over the edge list — driver union-find on the
   vector-scale edge list (the stages/clump border-merge precedent),
   labels broadcast back.

The reference's region growing visits points in stack order but the
resulting PARTITION is exactly these connected components (similarity is
symmetric), so segment labels are canonicalized to the lowest event_id.
All five entries are rows-only with brute O(n^2) pytest oracles
(tests/test_lidar4.py) — the plane fits are libm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

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
    return rep.groupby("grp").map_groups(moments, batch_format="pandas")


def _cos_normals(a1, b1, a2, b2):
    return (a1 * a2 + b1 * b2 + 1.0) / np.sqrt(
        (a1 * a1 + b1 * b1 + 1.0) * (a2 * a2 + b2 * b2 + 1.0))


def segment_edges(normals_ds, *, z_col: str = "cents") -> pd.DataFrame:
    """Driver-side (a, b) edge list: dist <= R, |dz| <= maxzdiff, normal
    cosine >= cos(10 deg). O(total edges) — vector-scale."""
    cols = ["event_id", "x", "y", "cents", "cell_id", "a", "b", "planar"]
    if z_col not in cols:
        cols.append(z_col)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["own"] == 1]
        if not len(own) or len(g) < 2:
            return pd.DataFrame({"ea": np.empty(0, np.int64),
                                 "eb": np.empty(0, np.int64)})
        ax = g["x"].to_numpy(np.float64)
        ay = g["y"].to_numpy(np.float64)
        az = g[z_col].to_numpy(np.float64)
        aid = g["event_id"].to_numpy(np.int64)
        aa = g["a"].to_numpy(np.float64)
        ab = g["b"].to_numpy(np.float64)
        om = g["own"].to_numpy(np.int64) == 1
        d2 = (ax[None, :] - ax[om][:, None]) ** 2 \
            + (ay[None, :] - ay[om][:, None]) ** 2
        dz = np.abs(az[None, :] - az[om][:, None])
        cos = _cos_normals(aa[om][:, None], ab[om][:, None],
                           aa[None, :], ab[None, :])
        ok = (d2 <= _R * _R) & (dz <= _MAXZ) & (cos >= _COS_TH)
        # own id strictly lower dedups the edge across groups
        ok &= aid[om][:, None] < aid[None, :]
        i, j = np.nonzero(ok)
        return pd.DataFrame({"ea": aid[om][i], "eb": aid[j]})

    rep = normals_ds.map_batches(lambda df: _replicate(df, cols),
                                 batch_format="pandas")
    return rep.groupby("grp").map_groups(pairs, batch_format="pandas") \
        .to_pandas().drop_duplicates()


def _components(ids: np.ndarray, edges: pd.DataFrame) -> dict[int, int]:
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for aa, bb in zip(edges["ea"].tolist(), edges["eb"].tolist()):
        ra, rb = find(int(aa)), find(int(bb))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    lab = {i: find(i) for i in parent}
    cmin: dict[int, int] = {}
    for i, r in lab.items():
        cmin[r] = min(cmin.get(r, i), i)
    return {i: cmin[r] for i, r in lab.items()}


def _segments(sf_dir: str):
    """(normals_ds materialized, labels dict, sizes dict)."""
    nds = point_normals(_pts(sf_dir)).materialize()
    edges = segment_edges(nds)
    np_ids = nds.to_pandas()["event_id"].to_numpy(np.int64)
    labels = _components(np_ids, edges)
    sizes: dict[int, int] = {}
    for s in labels.values():
        sizes[s] = sizes.get(s, 0) + 1
    return nds, labels, sizes


@query("lidar_segmentation")
def lidar_segmentation(sf_dir: str):
    """LidarSegmentation (lidar_analysis/lidar_segmentation.rs): plane-fit
    normals + proximity/normal-similarity components (module docstring).
    Output (event_id, segment, planar) int64, segment = lowest member
    event_id. Rows-only; brute O(n^2) oracle in tests/test_lidar4.py."""
    from ..stages.spatial_join import _cached_get

    nds, labels, _sizes = _segments(sf_dir)
    lab_ref = ray.put(labels)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        lab = _cached_get(lab_ref)
        e = df["event_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "event_id": e,
            "segment": np.array([lab[int(i)] for i in e], np.int64),
            "planar": df["planar"].to_numpy(np.int64)})

    return nds.map_batches(attach, batch_format="pandas")


@query("lidar_segmentation_based_filter")
def lidar_segmentation_based_filter(sf_dir: str):
    """LidarSegmentationBasedFilter
    (lidar_analysis/lidar_segmentation_based_filter.rs:460-555): residual =
    cents minus the neighbourhood (3x3-cell) minimum; seed points (residual
    0) grow ground through |dresidual| <= maxzdiff + normal-similarity
    edges; class 2 = connected to a seed, else 1. Output
    (event_id, cls). Rows-only; brute oracle in tests/test_lidar4.py."""
    from ..relational import partial_agg
    from ..stages.spatial_join import _cached_get

    nds = point_normals(_pts(sf_dir)).materialize()

    # residual: cents - min cents over the 3x3 cell neighbourhood
    def cell_mins(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cell_id": df["cell_id"].to_numpy(np.int64),
                             "mn": df["cents"].to_numpy(np.int64)})

    mins = partial_agg(nds.map_batches(cell_mins, batch_format="pandas"),
                       ["cell_id"], [("mn", "min", "mn")]).to_pandas()
    mn = dict(zip(mins["cell_id"].to_numpy(np.int64).tolist(),
                  mins["mn"].to_numpy(np.int64).tolist()))
    nbmin: dict[int, int] = {}
    for cid in mn:
        best = None
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                v = mn.get(cid + dr * 1000 + dc)
                if v is not None and (best is None or v < best):
                    best = v
        nbmin[cid] = best
    mref = ray.put(nbmin)

    def resid(df: pd.DataFrame) -> pd.DataFrame:
        m = _cached_get(mref)
        out = df.copy()
        out["resid"] = df["cents"].to_numpy(np.int64) \
            - np.array([m[int(c)] for c in df["cell_id"]], np.int64)
        return out

    rds = nds.map_batches(resid, batch_format="pandas").materialize()
    edges = segment_edges(rds, z_col="resid")
    rp = rds.to_pandas()
    labels = _components(rp["event_id"].to_numpy(np.int64), edges)
    seeds = rp.loc[rp["resid"] == 0, "event_id"].to_numpy(np.int64)
    ground_segs = {labels[int(s)] for s in seeds}
    gref = ray.put((labels, ground_segs))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        lab, gs = _cached_get(gref)
        e = df["event_id"].to_numpy(np.int64)
        cls = np.array([2 if lab[int(i)] in gs else 1 for i in e], np.int64)
        return pd.DataFrame({"event_id": e, "cls": cls})

    return rds.map_batches(classify, batch_format="pandas")


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


@query("classify_buildings")
def classify_buildings(sf_dir: str):
    """ClassifyBuildingsInLidar (lidar_analysis/classify_buildings.rs)
    analog on the segmentation: planar segments of >= 5 points whose
    minimum residual (cents above the 3x3-cell minimum) exceeds 200 are
    buildings -> class 6, everything else gets the derived fallback
    class event_id % 6 (never 6, so class 6 identifies buildings).
    Output (event_id, cls). Rows-only; compositional oracle in
    tests/test_lidar4.py."""
    from ..stages.spatial_join import _cached_get

    nds, labels, sizes = _segments(sf_dir)
    bld = _building_segments(nds, labels, sizes)
    bref = ray.put((labels, bld))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        lab, bd = _cached_get(bref)
        ee = df["event_id"].to_numpy(np.int64)
        seg = pd.Series(ee).map(lab).to_numpy(np.int64)
        cls = np.where(pd.Series(seg).isin(bd).to_numpy(), np.int64(6),
                       ee % 6)
        return pd.DataFrame({"event_id": ee, "cls": cls.astype(np.int64)})

    return nds.map_batches(classify, batch_format="pandas")


def _building_segments(nds, labels: dict[int, int],
                       _sizes: dict[int, int]) -> set[int]:
    """Segments that are planar throughout, >= _MIN_BLD points, and whose
    MINIMUM residual over the 3x3-cell minimum exceeds _BLD_RESID —
    vectorized pandas over the materialized normals frame."""
    npd = nds.to_pandas()
    cell = npd["cell_id"].to_numpy(np.int64)
    mn = npd.groupby("cell_id")["cents"].min()
    nb = pd.concat([mn.rename_axis("c").reset_index().assign(
        c2=lambda d: d["c"] + dr * 1000 + dc)
        for dr in (-1, 0, 1) for dc in (-1, 0, 1)])
    nbmin = nb.groupby("c2")["cents"].min()
    npd["resid"] = npd["cents"].to_numpy(np.int64) \
        - pd.Series(cell).map(nbmin).to_numpy(np.int64)
    npd["segment"] = npd["event_id"].map(labels)
    agg = npd.groupby("segment").agg(minres=("resid", "min"),
                                     allplan=("planar", "min"),
                                     n=("event_id", "size"))
    return set(agg.index[(agg["allplan"] == 1) & (agg["n"] >= _MIN_BLD)
                         & (agg["minres"] > _BLD_RESID)].astype(int))


@query("lidar_rooftop_analysis")
def lidar_rooftop_analysis(sf_dir: str):
    """LidarRooftopAnalysis (lidar_analysis/lidar_rooftop_analysis.rs)
    analog: per building segment (classify_buildings rule) the segment-wide
    LSQ roof plane — slope in milli-units (1000*sqrt(a^2+b^2)), point
    count, mean elevation cents (floored). Output
    (segment, n_points, slope_milli, mean_cents). Rows-only;
    compositional oracle in tests/test_lidar4.py."""
    nds, labels, sizes = _segments(sf_dir)
    bld = _building_segments(nds, labels, sizes)
    npd = nds.to_pandas()
    seg = npd["event_id"].map(labels).to_numpy(np.int64)

    x = npd["x"].to_numpy(np.float64)
    y = npd["y"].to_numpy(np.float64)
    cents = npd["cents"].to_numpy(np.int64)
    rows = []
    for s in sorted(bld):
        m = seg == s
        n = int(m.sum())
        cx, cy, cz = x[m], y[m], cents[m].astype(np.float64)
        sxm, sym, szm = cx.mean(), cy.mean(), cz.mean()
        cxx = ((cx - sxm) ** 2).sum()
        cyy = ((cy - sym) ** 2).sum()
        cxy = ((cx - sxm) * (cy - sym)).sum()
        cxz = ((cx - sxm) * (cz - szm)).sum()
        cyz = ((cy - sym) * (cz - szm)).sum()
        det = cxx * cyy - cxy * cxy
        a = (cxz * cyy - cyz * cxy) / det if abs(det) > 1e-12 else 0.0
        b = (cyz * cxx - cxz * cxy) / det if abs(det) > 1e-12 else 0.0
        rows.append({"segment": s, "n_points": n,
                     "slope_milli": int(np.floor(
                         1000.0 * np.sqrt(a * a + b * b))),
                     "mean_cents": int(np.floor(szm))})
    if not rows:
        rows = []
    out = pd.DataFrame(rows, columns=["segment", "n_points", "slope_milli",
                                      "mean_cents"]).astype(np.int64,
                                                            errors="ignore")
    return ray.data.from_pandas(out)
