"""RasterToVectorPolygons phase 2: boundary ring tracing per clump.

Reference (data_tools/raster_to_vector_polygons.rs:320-681): trace cell edges
between differing clumps, assemble rings, classify holes by orientation.

Distributed plan: after :mod:`clump` labeling, ``groupby(clump_id)``
co-locates every member cell of a component; ring assembly then needs NO
halo — a boundary edge is any cell side whose neighbour is not in the group.
Edges are emitted directed with the interior on the RIGHT, so following
them yields clockwise outer rings and counter-clockwise holes (the
shapefile convention, geometry.rs:570-574 / clip.rs is_hole). At 8-connected
diagonal pinch points a vertex has two outgoing edges; the right-most-turn
rule keeps each ring simple.

Partitioning assumption: one clump's cells fit one worker (the reference
holds the entire raster in RAM; here only the largest single component
must). Output: one row per ring
(clump_id, value, ring_idx, is_hole, xs: list<float64>, ys: list<float64>).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..grid import GridSpec

# directions: 0=E,1=S,2=W,3=N represented as (dr, dc) on corner lattice
_DIR_VEC = {0: (0, 1), 1: (1, 0), 2: (0, -1), 3: (-1, 0)}
# right-most-turn preference given incoming direction d: try right, straight, left, back
_TURN_ORDER = {d: ((d + 1) % 4, d, (d + 3) % 4, (d + 2) % 4) for d in range(4)}


def _trace_rings(cells_r: np.ndarray, cells_c: np.ndarray):
    """Assemble boundary rings for one component. Corner lattice coords:
    corner (r, c) = NW corner of cell (r, c). Returns list of rings, each a
    list of (corner_r, corner_c) closed (first == last)."""
    members = set(zip(cells_r.tolist(), cells_c.tolist()))
    # directed edges keyed by start corner: edge = (start, dir)
    edges: dict[tuple[int, int], list[int]] = {}

    def add(corner, d):
        edges.setdefault(corner, []).append(d)

    for r, c in members:
        if (r - 1, c) not in members:   # top: NW -> NE, dir E
            add((r, c), 0)
        if (r, c + 1) not in members:   # right: NE -> SE, dir S
            add((r, c + 1), 1)
        if (r + 1, c) not in members:   # bottom: SE -> SW, dir W
            add((r + 1, c + 1), 2)
        if (r, c - 1) not in members:   # left: SW -> NW, dir N
            add((r + 1, c), 3)

    rings = []
    while edges:
        start = min(edges)  # deterministic ring start
        d = min(edges[start])
        ring = [start]
        cur, cdir = start, d
        while True:
            edges[cur].remove(cdir)
            if not edges[cur]:
                del edges[cur]
            dr, dc = _DIR_VEC[cdir]
            nxt = (cur[0] + dr, cur[1] + dc)
            ring.append(nxt)
            if nxt == start:
                # returning to the start closes this ring; any edges still
                # registered at the start corner (pinch point) belong to a
                # separate simple ring traced in a later iteration
                break
            # pick outgoing edge by right-most turn
            outs = edges.get(nxt)
            if not outs:
                raise RuntimeError("open boundary — labeling bug")
            for cand in _TURN_ORDER[cdir]:
                if cand in outs:
                    cdir = cand
                    break
            cur = nxt
        rings.append(ring)
    return rings


def polygonize(cells_ds, grid: GridSpec):
    """cells_ds: (cell_id, value, clump_id) from stages.clump.clump."""

    def rings_of_group(g: pd.DataFrame) -> pd.DataFrame:
        cid = g["cell_id"].to_numpy(np.int64)
        r = cid // grid.cols
        c = cid % grid.cols
        rings = _trace_rings(r, c)
        rows = []
        for i, ring in enumerate(rings):
            rr = np.array([p[0] for p in ring], np.float64)
            cc = np.array([p[1] for p in ring], np.float64)
            xs = grid.west + cc * grid.res_x
            ys = grid.north - rr * grid.res_y
            # shoelace sign: clockwise (negative area in xy with y up) = outer
            area = 0.5 * float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
            rows.append({"clump_id": int(g["clump_id"].iloc[0]),
                         "value": float(g["value"].iloc[0]),
                         "ring_idx": i, "is_hole": area > 0.0,
                         "area": area,
                         "xs": xs, "ys": ys})
        return pd.DataFrame(rows)

    return cells_ds.groupby("clump_id").map_groups(rings_of_group, batch_format="pandas")
