"""General polygon boolean overlay (V family): Intersect / Union /
Difference / SymmetricDifference on NON-CONVEX simple rings.

Reference semantics: gis_analysis/{intersect,union,difference,
symmetrical_difference}.rs, built on split-at-intersections + ring
reassembly (whitebox-common/src/algorithms/line_ops.rs:138). This module
implements the same region algebra from scratch with the classic
Greiner–Hormann traversal (public-domain algorithm): intersection points are
inserted into both rings (split-at-intersections), entry/exit flags mark the
region boundary, and result rings are reassembled by walking between the two
vertex chains.

Assumptions (documented, matched by the synthetic fixtures): rings are
simple and in general position — crossings are proper, no vertex lies
exactly on the other ring's edge, no collinear overlapping edges. Degenerate
inputs are the reference's split-point dedup territory and out of scope.

Distribution: overlay is embarrassingly parallel over feature PAIRS; the
pair list comes from the cell-index candidate join (geometry.CellIndex) and
each pair's reassembly is a tiny CPU-bound kernel inside map_batches.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..geometry import point_in_poly


@dataclass
class _V:
    x: float
    y: float
    nxt: "_V | None" = None
    prv: "_V | None" = None
    neighbour: "_V | None" = None
    is_inter: bool = False
    entry: bool = False
    alpha: float = 0.0
    visited: bool = False


def _build(ring: np.ndarray) -> _V:
    """Closed ring (first == last) -> circular doubly linked list head."""
    head: _V | None = None
    prev: _V | None = None
    for x, y in ring[:-1]:
        v = _V(float(x), float(y))
        if head is None:
            head = v
        else:
            prev.nxt = v
            v.prv = prev
        prev = v
    prev.nxt = head
    head.prv = prev
    return head


def _verts(head: _V):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _insert(start: _V, inter: _V) -> None:
    """Insert intersection vertex between start and start.nxt ordered by
    alpha (several intersections may live on one edge)."""
    cur = start
    while cur.nxt.is_inter and cur.nxt.alpha < inter.alpha:
        cur = cur.nxt
    nxt = cur.nxt
    cur.nxt = inter
    inter.prv = cur
    inter.nxt = nxt
    nxt.prv = inter


def _edge_intersect(p0, p1, q0, q1):
    """Proper-crossing test + (alpha_p, alpha_q, x, y); None if no crossing.
    Same is_left primitive as geometry/lines (poly_ops.rs:21-23)."""
    d1 = (q1[0] - q0[0]) * (p0[1] - q0[1]) - (p0[0] - q0[0]) * (q1[1] - q0[1])
    d2 = (q1[0] - q0[0]) * (p1[1] - q0[1]) - (p1[0] - q0[0]) * (q1[1] - q0[1])
    d3 = (p1[0] - p0[0]) * (q0[1] - p0[1]) - (q0[0] - p0[0]) * (p1[1] - p0[1])
    d4 = (p1[0] - p0[0]) * (q1[1] - p0[1]) - (q1[0] - p0[0]) * (p1[1] - p0[1])
    if d1 * d2 < 0 and d3 * d4 < 0:
        ta = d1 / (d1 - d2)
        tb = d3 / (d3 - d4)
        x = p0[0] + ta * (p1[0] - p0[0])
        y = p0[1] + ta * (p1[1] - p0[1])
        return ta, tb, x, y
    return None


def _inside(ring: np.ndarray, x: float, y: float) -> bool:
    return bool(point_in_poly(np.array([x]), np.array([y]), ring)[0])


def greiner_hormann(A: np.ndarray, B: np.ndarray, op: str) -> list[np.ndarray]:
    """Overlay two simple closed rings. op in {intersect, union, difference,
    symdiff}. Returns closed result rings (even-odd region encoding: for the
    no-crossing containment cases of difference, BOTH rings are returned and
    the region is their even-odd combination — a ring with a hole)."""
    if op == "symdiff":
        # A xor B = (A - B) union (B - A); the pieces are disjoint so the
        # ring union is the concatenation of the two difference results
        return greiner_hormann(A, B, "difference") + greiner_hormann(B, A, "difference")
    assert op in ("intersect", "union", "difference")

    a_head = _build(A)
    b_head = _build(B)

    # phase 1: split both rings at every proper crossing
    inters = []
    a_edges = [(v, (v.x, v.y), (v.nxt.x, v.nxt.y)) for v in _verts(a_head)]
    b_edges = [(w, (w.x, w.y), (w.nxt.x, w.nxt.y)) for w in _verts(b_head)]
    for av, a0, a1 in a_edges:
        for bv, b0, b1 in b_edges:
            hit = _edge_intersect(a0, a1, b0, b1)
            if hit is None:
                continue
            ta, tb, x, y = hit
            ia = _V(x, y, is_inter=True, alpha=ta)
            ib = _V(x, y, is_inter=True, alpha=tb)
            ia.neighbour = ib
            ib.neighbour = ia
            inters.append((av, ia, bv, ib))
    for av, ia, bv, ib in inters:
        _insert(av, ia)
        _insert(bv, ib)

    if not inters:
        # no crossings: containment / disjoint cases by region algebra
        a_in_b = _inside(B, A[0, 0], A[0, 1])
        b_in_a = _inside(A, B[0, 0], B[0, 1])
        if op == "intersect":
            if a_in_b:
                return [A.copy()]
            if b_in_a:
                return [B.copy()]
            return []
        if op == "union":
            if a_in_b:
                return [B.copy()]
            if b_in_a:
                return [A.copy()]
            return [A.copy(), B.copy()]
        # difference A - B
        if a_in_b:
            return []
        if b_in_a:
            return [A.copy(), B.copy()]  # A with hole B (even-odd)
        return [A.copy()]

    # phase 2: entry/exit flags. Walking ring P, crossings alternate between
    # entering and exiting region Q; the first crossing after P's start is an
    # ENTRY iff the start lies outside Q. Op selection by flag flips:
    # intersect = (as computed, as computed); union = (flip, flip);
    # difference A-B = (flip A, as computed B) [equivalent to reversing B].
    def mark(head: _V, other_ring: np.ndarray, flip: bool) -> None:
        status = not _inside(other_ring, head.x, head.y)
        if flip:
            status = not status
        for v in _verts(head):
            if v.is_inter:
                v.entry = status
                status = not status

    mark(a_head, B, flip=(op in ("union", "difference")))
    mark(b_head, A, flip=(op == "union"))

    # phase 3: traverse and reassemble result rings
    results: list[np.ndarray] = []
    unvisited = [ia for _, ia, _, _ in inters]
    for start in unvisited:
        if start.visited:
            continue
        ring_pts: list[tuple[float, float]] = []
        cur = start
        while not cur.visited:
            cur.visited = True
            cur.neighbour.visited = True
            if cur.entry:
                while True:
                    ring_pts.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.is_inter:
                        break
            else:
                while True:
                    ring_pts.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.is_inter:
                        break
            cur = cur.neighbour
        ring = np.asarray(ring_pts + [ring_pts[0]], np.float64)
        if len(ring) >= 4:
            results.append(ring)
    return results


def region_inside(rings: list[np.ndarray], px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Even-odd membership of points in the region encoded by result rings."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    acc = np.zeros(len(px), np.int64)
    for ring in rings:
        acc += point_in_poly(px, py, ring).astype(np.int64)
    return acc % 2 == 1
