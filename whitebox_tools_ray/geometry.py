"""Vectorized polygon geometry kernels.

Reimplements the reference's point-in-polygon semantics exactly
(whitebox-common/src/algorithms/poly_ops.rs):

  * ``is_left(p0, p1, p2) = (p1.x-p0.x)*(p2.y-p0.y) - (p2.x-p0.x)*(p1.y-p0.y)``
    (poly_ops.rs:21-23)
  * winding number: upward crossing counts when start.y <= p.y < end.y and
    is_left > 0; downward when start.y > p.y >= end.y and is_left < 0
    (poly_ops.rs:41-72)
  * inside  <=>  winding_number % 2 != 0  — even-odd rule; points exactly on
    an edge are deemed OUTSIDE (poly_ops.rs:30-33)

All kernels are numpy-vectorized over a batch of points versus one ring;
multi-ring / multi-feature logic layers on top (see PackedPolygons), with the
reference's "last tested part wins" clip semantics (gis_analysis/clip.rs:314-324).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def winding_number(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Winding number of each point (px[i], py[i]) w.r.t. a closed ring.

    ring: (M, 2) float64 with ring[0] == ring[-1] (closed). Returns int64 wn.
    Vectorized translation of poly_ops.rs:41-72 (same strict comparisons).
    """
    ring = np.asarray(ring, np.float64)
    if ring.shape[0] < 2 or not (ring[0] == ring[-1]).all():
        raise ValueError("ring must be closed (first point == last point)")
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    x0, y0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x1, y1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    is_left = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)
    up = (y0 <= py) & (y1 > py) & (is_left > 0.0)
    down = (y0 > py) & (y1 <= py) & (is_left < 0.0)
    return up.sum(axis=1).astype(np.int64) - down.sum(axis=1).astype(np.int64)


def point_in_poly(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd containment, edges outside (poly_ops.rs:30-33: wn % 2 != 0)."""
    return winding_number(px, py, ring) % 2 != 0


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    ring = np.asarray(ring, np.float64)
    return float(ring[:, 0].min()), float(ring[:, 1].min()), float(ring[:, 0].max()), float(ring[:, 1].max())


def polygon_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = counter-clockwise)."""
    ring = np.asarray(ring, np.float64)
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def is_clockwise(ring: np.ndarray) -> bool:
    """Shapefile outer-ring convention: clockwise (negative shoelace area)."""
    return polygon_area(ring) < 0.0


def clip_polygon_convex(subject: np.ndarray, clip_cw: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip a (closed) subject ring to a CONVEX clockwise
    clip ring. Returns the closed clipped ring (possibly empty, shape (0, 2)).

    The overlay primitive behind the Intersect/Clip polygon branches
    (gis_analysis/{intersect,clip}.rs split-and-reassemble); boundary points
    are retained (standard S-H inclusive semantics).
    """
    subject = np.asarray(subject, np.float64)
    clip_cw = np.asarray(clip_cw, np.float64)
    out = list(map(tuple, subject[:-1])) if len(subject) else []
    for (ex0, ey0), (ex1, ey1) in zip(clip_cw[:-1], clip_cw[1:]):
        if not out:
            return np.empty((0, 2))
        inp = out
        out = []

        def side(p):
            # inside = on or right of the clockwise clip edge (is_left <= 0)
            return (ex1 - ex0) * (p[1] - ey0) - (p[0] - ex0) * (ey1 - ey0)

        def isect(a, b):
            da, db = side(a), side(b)
            t = da / (da - db)
            return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))

        prev = inp[-1]
        for cur in inp:
            if side(cur) <= 0.0:
                if side(prev) > 0.0:
                    out.append(isect(prev, cur))
                out.append(cur)
            elif side(prev) <= 0.0:
                out.append(isect(prev, cur))
            prev = cur
    if len(out) < 3:
        return np.empty((0, 2))
    ring = np.asarray(out + [out[0]], np.float64)
    return ring


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull, CCW, no repeated last point.

    points: (N, 2) float64. Same role as the hull pass inside
    whitebox-common/src/algorithms/minimum_bounding_box.rs:28-60 (which the
    elongation/MBB tools rely on); algorithm is the standard Andrew chain.
    """
    pts = np.unique(np.asarray(points, np.float64), axis=0)  # sorts lexicographically
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1], np.float64)


def min_area_bbox_axes(points: np.ndarray) -> tuple[float, float]:
    """(short_axis, long_axis) of the minimum-AREA rotated bounding box.

    Rotating calipers over the convex hull — the box minimizing area has an
    edge collinear with a hull edge. Mirrors
    whitebox-common/src/algorithms/minimum_bounding_box.rs
    (MinimizationCriterion::Area) as used by
    gis_analysis/elongation_ratio.rs:217-226.
    """
    hull = convex_hull(points)
    if len(hull) == 1:
        return 0.0, 0.0
    if len(hull) == 2:
        d = float(np.hypot(*(hull[1] - hull[0])))
        return 0.0, d
    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    theta = np.arctan2(edges[:, 1], edges[:, 0])
    best = (np.inf, 0.0, 0.0)
    for t in np.unique(np.mod(theta, np.pi / 2.0)):
        c, s = np.cos(t), np.sin(t)
        xr = hull[:, 0] * c + hull[:, 1] * s
        yr = -hull[:, 0] * s + hull[:, 1] * c
        w = float(xr.max() - xr.min())
        h = float(yr.max() - yr.min())
        if w * h < best[0]:
            best = (w * h, w, h)
    _, w, h = best
    return min(w, h), max(w, h)


@dataclass
class PackedPolygons:
    """A polygon layer packed into flat numpy arrays for broadcast.

    Mirrors the reference clip preprocessing (gis_analysis/clip.rs:244-277):
    every part of every feature flattened into a global part list with
    (bbox, is_hole, feature id), evaluated in file order so that the
    reference's "last tested part wins" rule (clip.rs:314-324) is exact.

    Built once on the driver, shipped via ``ray.put`` and held in actor-pool
    ``__init__`` — never re-serialized per batch.
    """

    rings: list = field(default_factory=list)      # list[np.ndarray (M,2) closed]
    bboxes: np.ndarray = None                      # (P, 4) xmin,ymin,xmax,ymax
    is_hole: np.ndarray = None                     # (P,) bool
    feature_id: np.ndarray = None                  # (P,) int64

    @classmethod
    def from_features(cls, features) -> "PackedPolygons":
        """features: iterable of (feature_id, [(ring_xy, is_hole), ...])."""
        rings, bbs, holes, fids = [], [], [], []
        for fid, parts in features:
            for ring, hole in parts:
                ring = np.asarray(ring, np.float64)
                if not (ring[0] == ring[-1]).all():
                    ring = np.vstack([ring, ring[:1]])
                rings.append(ring)
                bbs.append(ring_bbox(ring))
                holes.append(bool(hole))
                fids.append(int(fid))
        return cls(
            rings=rings,
            bboxes=np.asarray(bbs, np.float64).reshape(-1, 4),
            is_hole=np.asarray(holes, bool),
            feature_id=np.asarray(fids, np.int64),
        )

    def clip_mask(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Point-clip keep mask with exact reference semantics.

        For each point, parts are tested in file order over ALL features;
        on a (bbox && point_in_poly) hit, keep = !is_hole — no early break,
        so a later-tested hole overrides containment (clip.rs:299-370).
        """
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        keep = np.zeros(len(px), dtype=bool)
        for p, ring in enumerate(self.rings):
            xmin, ymin, xmax, ymax = self.bboxes[p]
            cand = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
            if not cand.any():
                continue
            idx = np.flatnonzero(cand)
            inside = point_in_poly(px[idx], py[idx], ring)
            hit = idx[inside]
            keep[hit] = not self.is_hole[p]
        return keep

    def build_cell_index(self, *, nx: int = 256, ny: int = 128) -> "CellIndex":
        return CellIndex.build(self, nx=nx, ny=ny)

    def pip_pairs(self, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(point_index, feature_id) join pairs — per-feature containment.

        A point is in a feature iff the last tested part of THAT feature
        containing it is not a hole (per-feature analog of clip_mask; used for
        zonal statistics / tagging where feature identity matters).
        """
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        n = len(px)
        out_idx, out_fid = [], []
        for fid in np.unique(self.feature_id):
            state = np.zeros(n, dtype=bool)
            for p in np.flatnonzero(self.feature_id == fid):
                xmin, ymin, xmax, ymax = self.bboxes[p]
                cand = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
                if not cand.any():
                    continue
                idx = np.flatnonzero(cand)
                inside = point_in_poly(px[idx], py[idx], self.rings[p])
                hit = idx[inside]
                state[hit] = not self.is_hole[p]
            sel = np.flatnonzero(state)
            out_idx.append(sel)
            out_fid.append(np.full(len(sel), fid, np.int64))
        if not out_idx:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_idx), np.concatenate(out_fid)


@dataclass
class CellIndex:
    """Uniform cell -> candidate-parts index over a PackedPolygons layer
    (CSR layout), the SURVEY section 2.3a mandate: per batch, points are
    bucketed into cells and tested ONLY against the parts whose bbox covers
    their cell — sublinear in part count, vs the linear scan that dies at a
    10k-part layer. Plays the role of the reference's per-record bbox
    pre-index in gis_analysis/clip.rs:244-277, packed flat for broadcast.
    """

    x0: float
    y0: float
    csx: float
    csy: float
    nx: int
    ny: int
    cell_ptr: np.ndarray    # (nx*ny + 1,) int64 CSR offsets
    cell_parts: np.ndarray  # part ids, file order within each cell

    @classmethod
    def build(cls, polys: PackedPolygons, *, nx: int = 256, ny: int = 128) -> "CellIndex":
        bb = polys.bboxes
        x0 = float(bb[:, 0].min())
        y0 = float(bb[:, 1].min())
        x1 = float(bb[:, 2].max())
        y1 = float(bb[:, 3].max())
        csx = max((x1 - x0) / nx, 1e-12)
        csy = max((y1 - y0) / ny, 1e-12)
        ix0 = np.clip(((bb[:, 0] - x0) / csx).astype(np.int64), 0, nx - 1)
        ix1 = np.clip(((bb[:, 2] - x0) / csx).astype(np.int64), 0, nx - 1)
        iy0 = np.clip(((bb[:, 1] - y0) / csy).astype(np.int64), 0, ny - 1)
        iy1 = np.clip(((bb[:, 3] - y0) / csy).astype(np.int64), 0, ny - 1)
        spans = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        total = int(spans.sum())
        cells = np.empty(total, np.int64)
        parts = np.empty(total, np.int64)
        pos = 0
        for p in range(len(bb)):  # build-once cost, vectorized per part
            gx = np.arange(ix0[p], ix1[p] + 1)
            gy = np.arange(iy0[p], iy1[p] + 1)
            cc = (gy[:, None] * nx + gx[None, :]).ravel()
            cells[pos:pos + len(cc)] = cc
            parts[pos:pos + len(cc)] = p
            pos += len(cc)
        # CSR: stable sort by cell keeps file order within each cell
        order = np.argsort(cells, kind="stable")
        cells, parts = cells[order], parts[order]
        ptr = np.zeros(nx * ny + 1, np.int64)
        np.cumsum(np.bincount(cells, minlength=nx * ny), out=ptr[1:])
        return cls(x0=x0, y0=y0, csx=csx, csy=csy, nx=nx, ny=ny,
                   cell_ptr=ptr, cell_parts=parts)

    def point_cells(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Cell id per point; -1 for points outside the layer bbox grid."""
        ix = np.floor((np.asarray(px, np.float64) - self.x0) / self.csx).astype(np.int64)
        iy = np.floor((np.asarray(py, np.float64) - self.y0) / self.csy).astype(np.int64)
        ok = (ix >= 0) & (ix < self.nx) & (iy >= 0) & (iy < self.ny)
        return np.where(ok, iy * self.nx + ix, -1)


def candidate_pairs(index: CellIndex, px: np.ndarray, py: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(point_row, part_id) candidate pairs via CSR gather — no Python loop:
    every point is paired with exactly the parts indexed under its cell."""
    cell = index.point_cells(px, py)
    ok = cell >= 0
    pts = np.flatnonzero(ok)
    c = cell[ok]
    counts = index.cell_ptr[c + 1] - index.cell_ptr[c]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pt = np.repeat(pts, counts)
    offs = np.cumsum(counts) - counts  # start of each point's span in output
    gather = (np.arange(total, dtype=np.int64)
              - np.repeat(offs, counts) + np.repeat(index.cell_ptr[c], counts))
    return pt, index.cell_parts[gather]


def _winding_pairs(rings_stack: np.ndarray, ring_row: np.ndarray,
                   px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Vectorized even-odd containment for PAIRS: ring_row[k] selects a ring
    from rings_stack (K, L, 2) for point (px[k], py[k]). Same strict
    comparisons as winding_number (poly_ops.rs:41-72)."""
    R = rings_stack[ring_row]                    # (n, L, 2)
    x0, y0 = R[:, :-1, 0], R[:, :-1, 1]
    x1, y1 = R[:, 1:, 0], R[:, 1:, 1]
    pxx, pyy = px[:, None], py[:, None]
    is_left = (x1 - x0) * (pyy - y0) - (pxx - x0) * (y1 - y0)
    up = (y0 <= pyy) & (y1 > pyy) & (is_left > 0.0)
    down = (y0 > pyy) & (y1 <= pyy) & (is_left < 0.0)
    wn = up.sum(axis=1).astype(np.int64) - down.sum(axis=1).astype(np.int64)
    return wn % 2 != 0


def pip_pairs_indexed(polys: PackedPolygons, index: CellIndex,
                      px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(point_index, feature_id) pairs with the cell index — identical
    semantics to PackedPolygons.pip_pairs (per-feature last-part-wins) but
    sublinear in part count AND loop-free: candidate (point, part) pairs come
    from a CSR gather, containment runs vectorized over pairs bucketed by
    ring length, and last-part-wins resolves with one lexsort."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    pt, part = candidate_pairs(index, px, py)
    if len(pt) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    bb = polys.bboxes[part]
    m = ((px[pt] >= bb[:, 0]) & (px[pt] <= bb[:, 2])
         & (py[pt] >= bb[:, 1]) & (py[pt] <= bb[:, 3]))
    pt, part = pt[m], part[m]
    if len(pt) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    # containment per pair, vectorized per ring-length bucket
    lens = np.asarray([len(r) for r in polys.rings], np.int64)
    inside = np.zeros(len(pt), bool)
    for L in np.unique(lens[part]):
        ring_ids = np.flatnonzero(lens == L)
        stack = np.stack([polys.rings[i] for i in ring_ids])  # (K, L, 2)
        remap = np.full(len(polys.rings), -1, np.int64)
        remap[ring_ids] = np.arange(len(ring_ids))
        sel = np.flatnonzero(lens[part] == L)
        inside[sel] = _winding_pairs(stack, remap[part[sel]], px[pt[sel]], py[pt[sel]])

    pt, part = pt[inside], part[inside]
    if len(pt) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    fid = polys.feature_id[part]
    # last-part-wins per (point, feature): keep the highest part index
    o = np.lexsort((part, fid, pt))
    pt, part, fid = pt[o], part[o], fid[o]
    last = np.ones(len(pt), bool)
    last[:-1] = (pt[1:] != pt[:-1]) | (fid[1:] != fid[:-1])
    keep = last & ~polys.is_hole[part]
    return pt[keep], fid[keep]


def clip_mask_indexed(polys: PackedPolygons, index: CellIndex,
                      px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Indexed clip keep-mask, identical to PackedPolygons.clip_mask
    (GLOBAL last-tested-part-wins across all features, clip.rs:314-324):
    for each point the highest-part-index containing ring decides."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    keep = np.zeros(len(px), bool)
    pt, part = candidate_pairs(index, px, py)
    if len(pt) == 0:
        return keep
    bb = polys.bboxes[part]
    m = ((px[pt] >= bb[:, 0]) & (px[pt] <= bb[:, 2])
         & (py[pt] >= bb[:, 1]) & (py[pt] <= bb[:, 3]))
    pt, part = pt[m], part[m]
    if len(pt) == 0:
        return keep
    lens = np.asarray([len(r) for r in polys.rings], np.int64)
    inside = np.zeros(len(pt), bool)
    for L in np.unique(lens[part]):
        ring_ids = np.flatnonzero(lens == L)
        stack = np.stack([polys.rings[i] for i in ring_ids])
        remap = np.full(len(polys.rings), -1, np.int64)
        remap[ring_ids] = np.arange(len(ring_ids))
        sel = np.flatnonzero(lens[part] == L)
        inside[sel] = _winding_pairs(stack, remap[part[sel]], px[pt[sel]], py[pt[sel]])
    pt, part = pt[inside], part[inside]
    if len(pt) == 0:
        return keep
    o = np.lexsort((part, pt))
    pt, part = pt[o], part[o]
    last = np.ones(len(pt), bool)
    last[:-1] = pt[1:] != pt[:-1]
    keep[pt[last]] = ~polys.is_hole[part[last]]
    return keep
