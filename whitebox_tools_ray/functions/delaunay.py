"""Delaunay triangulation (Bowyer-Watson) + barycentric interpolation.

From-scratch analog of whitebox-common/src/algorithms/delaunay_triangulation.rs
(the reference's 611-line int/robust implementation): incremental insertion
with vectorized in-circumcircle tests against the current triangle set.
Deterministic: points are inserted in caller order; degenerate duplicates
must be removed by the caller (the gridding stage dedups by (x, y) keeping
the lowest seq, matching the reference's coincident-point handling).
"""

from __future__ import annotations

import numpy as np


def delaunay(points: np.ndarray) -> np.ndarray:
    """points: (n, 2) float64, no exact duplicates. Returns (m, 3) int32
    vertex indices (counter-clockwise)."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), np.int32)

    # super-triangle enclosing everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 100.0
    sup = np.array([[cx - 2 * span, cy - span], [cx + 2 * span, cy - span],
                    [cx, cy + 2 * span]])
    verts = np.vstack([pts, sup])
    tris = [[n, n + 1, n + 2]]

    for i in range(n):
        T = np.asarray(tris, np.int64)
        a, b, c = verts[T[:, 0]], verts[T[:, 1]], verts[T[:, 2]]
        p = verts[i]
        # in-circumcircle determinant (positive for CCW triangles)
        ax, ay = a[:, 0] - p[0], a[:, 1] - p[1]
        bx, by = b[:, 0] - p[0], b[:, 1] - p[1]
        cx_, cy_ = c[:, 0] - p[0], c[:, 1] - p[1]
        det = ((ax * ax + ay * ay) * (bx * cy_ - cx_ * by)
               - (bx * bx + by * by) * (ax * cy_ - cx_ * ay)
               + (cx_ * cx_ + cy_ * cy_) * (ax * by - bx * ay))
        bad = det > 0.0
        bad_tris = T[bad]
        # polygon boundary = edges of bad triangles appearing exactly once
        edges = {}
        for t in bad_tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e))
                if key in edges:
                    edges.pop(key)
                else:
                    edges[key] = e  # keep orientation of first occurrence
        tris = [list(t) for t in T[~bad]]
        for e in edges.values():
            tris.append([e[0], e[1], i])

    out = [t for t in tris if max(t) < n]
    T = np.asarray(out, np.int64)
    if len(T) == 0:
        return np.empty((0, 3), np.int32)
    # normalize to CCW
    a, b, c = points[T[:, 0]], points[T[:, 1]], points[T[:, 2]]
    cwm = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - \
          (c[:, 0] - a[:, 0]) * (b[:, 1] - a[:, 1]) < 0
    T[cwm] = T[cwm][:, [0, 2, 1]]
    return T.astype(np.int32)


def interpolate_linear(points: np.ndarray, values: np.ndarray, tris: np.ndarray,
                       qx: np.ndarray, qy: np.ndarray):
    """Barycentric linear interpolation at query locations.

    Returns (vals float64, hit bool). A query on a shared edge resolves to
    the lowest-index containing triangle (deterministic). Outside the hull ->
    hit = False.
    """
    qx = np.asarray(qx, np.float64)
    qy = np.asarray(qy, np.float64)
    out = np.full(len(qx), np.nan)
    hit = np.zeros(len(qx), bool)
    if len(tris) == 0:
        return out, hit
    a = points[tris[:, 0]]
    b = points[tris[:, 1]]
    c = points[tris[:, 2]]
    # bbox prefilter per triangle
    txmin = np.minimum.reduce([a[:, 0], b[:, 0], c[:, 0]])
    txmax = np.maximum.reduce([a[:, 0], b[:, 0], c[:, 0]])
    tymin = np.minimum.reduce([a[:, 1], b[:, 1], c[:, 1]])
    tymax = np.maximum.reduce([a[:, 1], b[:, 1], c[:, 1]])
    denom = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
             + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
    for ti in range(len(tris)):  # triangles few per tile; queries vectorized
        cand = ~hit & (qx >= txmin[ti]) & (qx <= txmax[ti]) & \
            (qy >= tymin[ti]) & (qy <= tymax[ti])
        if not cand.any():
            continue
        ix = np.flatnonzero(cand)
        l1 = ((b[ti, 1] - c[ti, 1]) * (qx[ix] - c[ti, 0])
              + (c[ti, 0] - b[ti, 0]) * (qy[ix] - c[ti, 1])) / denom[ti]
        l2 = ((c[ti, 1] - a[ti, 1]) * (qx[ix] - c[ti, 0])
              + (a[ti, 0] - c[ti, 0]) * (qy[ix] - c[ti, 1])) / denom[ti]
        l3 = 1.0 - l1 - l2
        inside = (l1 >= 0) & (l2 >= 0) & (l3 >= 0)
        sel = ix[inside]
        v = (l1[inside] * values[tris[ti, 0]]
             + l2[inside] * values[tris[ti, 1]]
             + l3[inside] * values[tris[ti, 2]])
        out[sel] = v
        hit[sel] = True
    return out, hit
