"""TIN gridding (gis_analysis/tin_gridding.rs; lidar sibling
lidar_analysis/lidar_tin_gridding.rs): Delaunay-triangulate the point layer,
linearly interpolate every cell centre inside the hull.

Distributed plan = the reference's own sharded-lidar pattern
(lidar_idw_interpolation.rs:536-600 halo re-reads): points are assigned to
coarse TIN tiles, each point is ALSO replicated to neighbouring tiles within
``buffer`` (the halo), and each tile triangulates its own + halo points and
interpolates only its interior cells. A halo >= the expected max triangle
edge makes tile edges consistent; cells outside the hull stay nodata.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.delaunay import delaunay, interpolate_linear
from ..grid import GridSpec


def tin_grid(points_ds, grid: GridSpec, *, tile_deg: float = 30.0, buffer: float = 6.0,
             x_col="x", y_col="y", value_col="value", seq_col="event_id"):
    """Output: cell_id, tin_value for every covered cell centre."""
    tcols = int(np.ceil((grid.east - grid.west) / tile_deg))
    trows = int(np.ceil((grid.north - grid.south) / tile_deg))

    def to_tiles(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        frames = []
        for dtx in (-1, 0, 1):
            for dty in (-1, 0, 1):
                # home tile, then replicate to neighbours when within buffer
                tc = np.floor((x - grid.west) / tile_deg).astype(np.int64) + dtx
                tr = np.floor((grid.north - y) / tile_deg).astype(np.int64) + dty
                ok = (tc >= 0) & (tc < tcols) & (tr >= 0) & (tr < trows)
                if dtx != 0:
                    edge = grid.west + (tc + (1 if dtx == -1 else 0)) * tile_deg
                    ok &= np.abs(x - edge) <= buffer
                if dty != 0:
                    edge = grid.north - (tr + (1 if dty == -1 else 0)) * tile_deg
                    ok &= np.abs(y - edge) <= buffer
                if not ok.any():
                    continue
                frames.append(pd.DataFrame({
                    "tin_tile": tr[ok] * tcols + tc[ok],
                    "x": x[ok], "y": y[ok],
                    "value": df[value_col].to_numpy(np.float64)[ok],
                    "seq": df[seq_col].to_numpy(np.int64)[ok],
                }))
        return pd.concat(frames) if frames else pd.DataFrame(
            columns=["tin_tile", "x", "y", "value", "seq"])

    tiled = points_ds.map_batches(to_tiles, batch_format="pandas")

    def triangulate_tile(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tin_tile"].iloc[0])
        tr, tc = tid // tcols, tid % tcols
        # dedup coincident points: keep lowest seq (reference coincident rule)
        g = g.sort_values("seq", kind="mergesort").drop_duplicates(["x", "y"])
        pts = g[["x", "y"]].to_numpy()
        vals = g["value"].to_numpy()
        if len(pts) < 3:
            return pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                                 "tin_value": pd.Series([], dtype=np.float64)})
        tris = delaunay(pts)
        # interior cell centres of this TIN tile
        x_lo = grid.west + tc * tile_deg
        x_hi = min(x_lo + tile_deg, grid.east)
        y_hi = grid.north - tr * tile_deg
        y_lo = max(y_hi - tile_deg, grid.south)
        c_lo = grid.col_from_x(np.array([x_lo]))[0]
        c_hi = min(grid.col_from_x(np.array([x_hi - 1e-9]))[0] + 1, grid.cols)
        r_lo = grid.row_from_y(np.array([y_hi]))[0]
        r_hi = min(grid.row_from_y(np.array([y_lo + 1e-9]))[0] + 1, grid.rows)
        rr, cc = np.meshgrid(np.arange(r_lo, r_hi), np.arange(c_lo, c_hi), indexing="ij")
        qx = grid.x_from_col(cc.ravel())
        qy = grid.y_from_row(rr.ravel())
        vals_i, hits = interpolate_linear(pts, vals, tris, qx, qy)
        cid = (rr.ravel().astype(np.int64) * grid.cols + cc.ravel().astype(np.int64))[hits]
        return pd.DataFrame({"cell_id": cid, "tin_value": vals_i[hits]})

    return tiled.groupby("tin_tile").map_groups(triangulate_tile, batch_format="pandas")


def natural_neighbour_grid(points_ds, grid: GridSpec, *, tile_deg: float = 30.0,
                           buffer: float = 6.0, x_col="x", y_col="y",
                           value_col="value", seq_col="event_id"):
    """Natural-neighbour gridding (gis_analysis/natural_neighbour_
    interpolation.rs; Laplace-weight variant, functions/delaunay
    .natural_neighbour) — identical tile+halo sharding to tin_grid.
    Output: cell_id, nn_value for every cell whose Bowyer–Watson cavity is
    fully real (interior of the local hull)."""
    from ..functions.delaunay import natural_neighbour

    tcols = int(np.ceil((grid.east - grid.west) / tile_deg))
    trows = int(np.ceil((grid.north - grid.south) / tile_deg))

    def to_tiles(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        frames = []
        for dtx in (-1, 0, 1):
            for dty in (-1, 0, 1):
                tc = np.floor((x - grid.west) / tile_deg).astype(np.int64) + dtx
                tr = np.floor((grid.north - y) / tile_deg).astype(np.int64) + dty
                ok = (tc >= 0) & (tc < tcols) & (tr >= 0) & (tr < trows)
                if dtx != 0:
                    edge = grid.west + (tc + (1 if dtx == -1 else 0)) * tile_deg
                    ok &= np.abs(x - edge) <= buffer
                if dty != 0:
                    edge = grid.north - (tr + (1 if dty == -1 else 0)) * tile_deg
                    ok &= np.abs(y - edge) <= buffer
                if not ok.any():
                    continue
                frames.append(pd.DataFrame({
                    "tin_tile": tr[ok] * tcols + tc[ok],
                    "x": x[ok], "y": y[ok],
                    "value": df[value_col].to_numpy(np.float64)[ok],
                    "seq": df[seq_col].to_numpy(np.int64)[ok],
                }))
        return pd.concat(frames) if frames else pd.DataFrame(
            columns=["tin_tile", "x", "y", "value", "seq"])

    tiled = points_ds.map_batches(to_tiles, batch_format="pandas")

    def interp_tile(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tin_tile"].iloc[0])
        tr, tc = tid // tcols, tid % tcols
        g = g.sort_values("seq", kind="mergesort").drop_duplicates(["x", "y"])
        pts = g[["x", "y"]].to_numpy()
        vals = g["value"].to_numpy()
        empty = pd.DataFrame({"cell_id": pd.Series([], dtype=np.int64),
                              "nn_value": pd.Series([], dtype=np.float64)})
        if len(pts) < 3:
            return empty
        tris = delaunay(pts)
        x_lo = grid.west + tc * tile_deg
        x_hi = min(x_lo + tile_deg, grid.east)
        y_hi = grid.north - tr * tile_deg
        y_lo = max(y_hi - tile_deg, grid.south)
        c_lo = grid.col_from_x(np.array([x_lo]))[0]
        c_hi = min(grid.col_from_x(np.array([x_hi - 1e-9]))[0] + 1, grid.cols)
        r_lo = grid.row_from_y(np.array([y_hi]))[0]
        r_hi = min(grid.row_from_y(np.array([y_lo + 1e-9]))[0] + 1, grid.rows)
        rr, cc = np.meshgrid(np.arange(r_lo, r_hi), np.arange(c_lo, c_hi), indexing="ij")
        qx = grid.x_from_col(cc.ravel())
        qy = grid.y_from_row(rr.ravel())
        vals_i, hits = natural_neighbour(pts, vals, tris, qx, qy)
        cid = (rr.ravel().astype(np.int64) * grid.cols + cc.ravel().astype(np.int64))[hits]
        return pd.DataFrame({"cell_id": cid, "nn_value": vals_i[hits]})

    return tiled.groupby("tin_tile").map_groups(interp_tile, batch_format="pandas")


# ---------------------------------------------------------------------------
# Exact distributed Delaunay (ConstructVectorTIN / contour TIN input;
# gis_analysis/construct_vector_tin.rs): two-level plan.
#
# Pass 1 (per tile, halo buffer b): a local triangle whose circumCENTRE
# falls inside the owner tile with circumradius < b has its whole
# circumdisk inside tile (+) halo, a region the tile saw COMPLETELY — so
# the empty-circumcircle test the local Bowyer-Watson performed is valid
# globally and the triangle IS a global Delaunay triangle (emitted once,
# by its owner). Pass 2 (cleanup, small): the remaining global triangles
# (circumradius >= b, or centre off-extent — hull slivers) have vertices
# that are locally "exposed": local-hull vertices or vertices of local
# big-circumradius triangles. Those candidate points (O(hull + tile
# boundary), not O(n)) are triangulated in one task; candidate triangles
# in the uncovered class are then VERIFIED empty against ALL points with
# one broadcast partial-OR pass, so pass-2 false positives are impossible.
# Equality with the single-task global triangulation is asserted in
# tests/test_tiled_delaunay.py; Delaunay properties in tests/test_vector3.py.
# ---------------------------------------------------------------------------
def circumcircles(pts: np.ndarray, tris: np.ndarray):
    """(ux, uy, r2, degenerate_mask) for triangle vertex-index rows."""
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    ax, ay = a[:, 0], a[:, 1]
    bx, by = b[:, 0], b[:, 1]
    cx, cy = c[:, 0], c[:, 1]
    d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    bad = d == 0
    d = np.where(bad, 1.0, d)
    ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
          + (cx**2 + cy**2) * (ay - by)) / d
    uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
          + (cx**2 + cy**2) * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2, bad


def tiled_delaunay(points_ds, *, tile_deg: float = 45.0, buffer: float = 15.0,
                   west: float = -180.0, north: float = 85.0,
                   east: float = 180.0, south: float = -85.0,
                   x_col="x", y_col="y", seq_col="event_id",
                   stats: dict | None = None):
    """Global Delaunay triangles of the point Dataset as a DATASET of
    canonical ascending seq-id triples (a, b, c). The O(points)-sized
    owned-triangle inventory never leaves the cluster: pass 1 emits it as
    Dataset blocks (materialized in the object store), and only the
    O(hull + tile boundary) candidate POINTS reach the driver for the
    pass-2 sliver triangulation, whose verified triangles are unioned
    back distributively. Owned (pass 1) and pass-2 triangle classes are
    disjoint by construction — ownership is 'circumradius < buffer AND
    circumcentre inside the (half-open) owner tile', pass 2 keeps only
    the complement, and a triangle's circumcircle is a deterministic
    float64 function of its three vertices alone — so no cross-class
    dedup shuffle is needed."""
    import ray as _ray
    import ray.data as _rd

    from .spatial_join import _cached_get

    tcols = int(np.ceil((east - west) / tile_deg))
    trows = int(np.ceil((north - south) / tile_deg))

    def to_tiles(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(np.float64)
        y = df[y_col].to_numpy(np.float64)
        s = df[seq_col].to_numpy(np.int64)
        frames = []
        for dtx in (-1, 0, 1):
            for dty in (-1, 0, 1):
                tc = np.floor((x - west) / tile_deg).astype(np.int64) + dtx
                tr = np.floor((north - y) / tile_deg).astype(np.int64) + dty
                ok = (tc >= 0) & (tc < tcols) & (tr >= 0) & (tr < trows)
                if dtx != 0:
                    edge = west + (tc + (1 if dtx == -1 else 0)) * tile_deg
                    ok &= np.abs(x - edge) <= buffer
                if dty != 0:
                    edge = north - (tr + (1 if dty == -1 else 0)) * tile_deg
                    ok &= np.abs(y - edge) <= buffer
                if not ok.any():
                    continue
                frames.append(pd.DataFrame({
                    "tin_tile": tr[ok] * tcols + tc[ok],
                    "x": x[ok], "y": y[ok], "seq": s[ok]}))
        return pd.concat(frames) if frames else pd.DataFrame(
            columns=["tin_tile", "x", "y", "seq"])

    tiled = points_ds.map_batches(to_tiles, batch_format="pandas")

    def tile_pass(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tin_tile"].iloc[0])
        tr, tc = tid // tcols, tid % tcols
        g = g.sort_values("seq", kind="mergesort")
        pts = g[["x", "y"]].to_numpy(np.float64)
        seqs = g["seq"].to_numpy(np.int64)
        if len(pts) < 3:
            return pd.DataFrame({
                "kind": np.zeros(len(pts), np.int64), "a": seqs,
                "b": seqs, "c": seqs, "x": pts[:, 0] if len(pts) else
                np.array([]), "y": pts[:, 1] if len(pts) else np.array([])})
        tris = delaunay(pts)
        ux, uy, r2, bad = circumcircles(pts, tris)
        r = np.sqrt(np.maximum(r2, 0.0))
        x_lo = west + tc * tile_deg
        x_hi = min(x_lo + tile_deg, east)
        y_hi = north - tr * tile_deg
        y_lo = max(y_hi - tile_deg, south)
        owned = (~bad & (r < buffer)
                 & (ux >= x_lo) & (ux < x_hi) & (uy > y_lo) & (uy <= y_hi))
        t = np.sort(seqs[tris], axis=1)
        rows = [pd.DataFrame({"kind": np.int64(1), "a": t[owned, 0],
                              "b": t[owned, 1], "c": t[owned, 2],
                              "x": 0.0, "y": 0.0})]
        # candidate capture: vertices of risky triangles + local hull
        risky = bad | (r >= buffer / 4.0) | (ux < west) | (ux >= east) \
            | (uy <= south) | (uy > north)
        cand = set(np.unique(tris[risky]).tolist())
        edges = {}
        for trow in tris:
            for e in ((trow[0], trow[1]), (trow[1], trow[2]),
                      (trow[2], trow[0])):
                k = (min(e), max(e))
                edges[k] = edges.get(k, 0) + 1
        for (p, q), cnt in edges.items():
            if cnt == 1:
                cand.add(int(p))
                cand.add(int(q))
        ci = np.asarray(sorted(cand), np.int64)
        rows.append(pd.DataFrame({
            "kind": np.int64(0), "a": seqs[ci], "b": seqs[ci],
            "c": seqs[ci], "x": pts[ci, 0], "y": pts[ci, 1]}))
        return pd.concat(rows, ignore_index=True)

    res = tiled.groupby("tin_tile").map_groups(
        tile_pass, batch_format="pandas").materialize()
    # pass-1 owned triangles stay distributed (each emitted exactly once,
    # by the tile whose half-open bounds contain its circumcentre)
    owned_ds = res.map_batches(
        lambda df: df.loc[df["kind"] == 1, ["a", "b", "c"]],
        batch_format="pandas")
    # only the small candidate point set (local hulls + risky-triangle
    # vertices, O(boundary) not O(n)) is pulled to the driver
    cand = res.map_batches(
        lambda df: df.loc[df["kind"] == 0, ["a", "x", "y"]],
        batch_format="pandas").to_pandas() \
        .drop_duplicates("a").sort_values("a")
    if stats is not None:
        stats["n_candidates"] = len(cand)  # the ONLY driver-side pull

    pass2 = pd.DataFrame({"a": [], "b": [], "c": []})
    if len(cand) >= 3:
        cpts = cand[["x", "y"]].to_numpy(np.float64)
        cseq = cand["a"].to_numpy(np.int64)
        ctris = delaunay(cpts)
        ux, uy, r2, bad = circumcircles(cpts, ctris)
        r = np.sqrt(np.maximum(r2, 0.0))
        target = bad | (r >= buffer) | (ux < west) | (ux >= east) \
            | (uy <= south) | (uy > north)
        ctris = ctris[target]
        ux, uy, r2 = ux[target], uy[target], r2[target]
        if len(ctris):
            # broadcast verify: a candidate triangle survives iff NO point
            # of the full dataset lies strictly inside its circumcircle
            tverts = np.sort(cseq[ctris], axis=1)
            vref = _ray.put((ux, uy, r2, tverts))

            def viol(df: pd.DataFrame) -> pd.DataFrame:
                vx, vy, vr2, tv = _cached_get(vref)
                x = df[x_col].to_numpy(np.float64)
                y = df[y_col].to_numpy(np.float64)
                s = df[seq_col].to_numpy(np.int64)
                n_bad = np.zeros(len(vx), np.int64)
                for lo in range(0, len(vx), 2048):
                    hi = min(lo + 2048, len(vx))
                    d2 = ((x[:, None] - vx[None, lo:hi]) ** 2
                          + (y[:, None] - vy[None, lo:hi]) ** 2)
                    inside = d2 < vr2[None, lo:hi] * (1 - 1e-12)
                    own = (s[:, None] == tv[None, lo:hi, 0]) \
                        | (s[:, None] == tv[None, lo:hi, 1]) \
                        | (s[:, None] == tv[None, lo:hi, 2])
                    n_bad[lo:hi] += (inside & ~own).sum(axis=0)
                return pd.DataFrame({
                    "tri": np.arange(len(vx), dtype=np.int64),
                    "n_bad": n_bad})

            from ..relational import partial_agg

            agg = partial_agg(
                points_ds.map_batches(viol, batch_format="pandas"),
                ["tri"], [("n_bad", "sum", "n_bad")]).to_pandas() \
                .sort_values("tri")
            ok = agg["n_bad"].to_numpy(np.int64) == 0
            pass2 = pd.DataFrame({"a": tverts[ok, 0], "b": tverts[ok, 1],
                                  "c": tverts[ok, 2]})

    if len(pass2):
        pass2 = pass2.astype(np.int64).drop_duplicates()
        return owned_ds.union(_rd.from_pandas(pass2))
    return owned_ds
