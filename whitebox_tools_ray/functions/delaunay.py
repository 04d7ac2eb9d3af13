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


def _circumcenter(ax, ay, bx, by, cx, cy):
    """Circumcenter of triangle (a, b, c) — standard determinant form."""
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    return ux, uy


def natural_neighbour(points: np.ndarray, values: np.ndarray,
                      tris: np.ndarray, qx: np.ndarray, qy: np.ndarray):
    """Natural-neighbour interpolation, LAPLACE (non-Sibsonian) weights:
    for each query q, the Bowyer–Watson cavity of q yields its natural
    neighbours; the weight of neighbour v is the length of the Voronoi facet
    between q and v (the segment between the circumcenters of the two new
    triangles sharing edge q–v) divided by |q - v|. Like Sibson weights this
    has LINEAR PRECISION (reproduces planes exactly — tests/test_natural_
    neighbour.py) but needs no polygon clipping. Analog of
    gis_analysis/natural_neighbour_interpolation.rs (which uses Sibson area
    weights — the variant choice is documented, results differ only in the
    blending weights, not the neighbour set or the linear-precision
    contract).

    Returns (vals float64, hit bool); queries outside the hull (cavity
    touches no real triangle) -> hit False.
    """
    pts = np.asarray(points, np.float64)
    out = np.full(len(qx), np.nan)
    hit = np.zeros(len(qx), bool)
    if len(tris) == 0:
        return out, hit
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    for qi in range(len(qx)):
        px, py = qx[qi], qy[qi]
        axx, ayy = a[:, 0] - px, a[:, 1] - py
        bxx, byy = b[:, 0] - px, b[:, 1] - py
        cxx, cyy = c[:, 0] - px, c[:, 1] - py
        det = ((axx * axx + ayy * ayy) * (bxx * cyy - cxx * byy)
               - (bxx * bxx + byy * byy) * (axx * cyy - cxx * ayy)
               + (cxx * cxx + cyy * cyy) * (axx * byy - bxx * ayy))
        bad = det > 0.0
        if not bad.any():
            continue  # outside the hull
        # directed boundary edges of the cavity (CCW triangles -> CCW cycle)
        edge_set = set()
        for t in tris[bad]:
            for e in ((int(t[0]), int(t[1])), (int(t[1]), int(t[2])),
                      (int(t[2]), int(t[0]))):
                edge_set.add(e)
        boundary = {e[0]: e[1] for e in edge_set
                    if (e[1], e[0]) not in edge_set}
        if not boundary:
            continue
        start = next(iter(boundary))
        cycle = [start]
        while True:
            nxt = boundary.get(cycle[-1], None)
            if nxt is None or nxt == start:
                break
            cycle.append(nxt)
            if len(cycle) > len(boundary) + 1:
                break  # malformed cavity (degenerate); treat as miss
        if len(cycle) < 3 or boundary.get(cycle[-1]) != start:
            continue
        m = len(cycle)
        # circumcenters of the new fan triangles (q, a_i, a_{i+1})
        ccs = []
        for i in range(m):
            v0 = pts[cycle[i]]
            v1 = pts[cycle[(i + 1) % m]]
            ccs.append(_circumcenter(px, py, v0[0], v0[1], v1[0], v1[1]))
        wsum = 0.0
        vsum = 0.0
        ok = True
        for i in range(m):
            v = pts[cycle[i]]
            d = np.hypot(v[0] - px, v[1] - py)
            if d == 0.0:  # query coincides with a sample
                out[qi] = values[cycle[i]]
                hit[qi] = True
                ok = False
                break
            c0 = ccs[i - 1]
            c1 = ccs[i]
            w = np.hypot(c1[0] - c0[0], c1[1] - c0[1]) / d
            wsum += w
            vsum += w * values[cycle[i]]
        if ok and wsum > 0.0:
            out[qi] = vsum / wsum
            hit[qi] = True
    return out, hit
