"""Rows-only oracles for the vector sweep #3 entries."""

import heapq

import numpy as np

from whitebox_tools_ray.layers import GRID1

SF = "/root/testdata/sf0.001"


def test_construct_vector_tin_properties(ray_session):
    """Triangles are Delaunay: (sampled) empty circumcircle + correct
    vertex ids + consistent count."""
    from whitebox_tools_ray.pipelines.queries_vector3 import \
        construct_vector_tin
    from whitebox_tools_ray.sources.tables import read_points

    tris = construct_vector_tin(SF).to_pandas()
    pts = read_points(SF, extra_cols=()).to_pandas()
    pts = pts[pts["event_id"] % 23 == 0].sort_values("event_id")
    ids = pts["event_id"].to_numpy(np.int64)
    pos = {int(e): i for i, e in enumerate(ids)}
    xy = pts[["x", "y"]].to_numpy(np.float64)
    assert len(tris) > len(ids)  # ~2n triangles for a convex cloud
    rng = np.random.default_rng(0)
    sample = tris.iloc[rng.choice(len(tris), size=min(60, len(tris)),
                                  replace=False)]
    for a, b, c in sample.itertuples(index=False):
        pa, pb, pc = xy[pos[a]], xy[pos[b]], xy[pos[c]]
        # circumcircle via the lifted determinant test for 40 random others
        others = rng.choice(len(xy), size=40, replace=False)
        ax, ay = pa
        bx, by = pb
        cx, cy = pc
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0:
            continue
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay)
              + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx)
              + (cx**2 + cy**2) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        for o in others:
            if int(ids[o]) in (a, b, c):
                continue
            d2 = (xy[o, 0] - ux) ** 2 + (xy[o, 1] - uy) ** 2
            assert d2 >= r2 * (1 - 1e-9), (a, b, c, ids[o])


def test_cost_pathway_matches_dense_backtrack(ray_session):
    from whitebox_tools_ray.pipelines.queries_vector3 import cost_pathway

    n = GRID1.rows * GRID1.cols
    cols = GRID1.cols
    cells = np.arange(n, dtype=np.int64)
    cost = 1 + (cells * 31) % 7
    sources = cells[(cells * 7919) % 509 == 0]

    INF = np.iinfo(np.int64).max
    dist = np.full(n, INF, np.int64)
    dist[sources] = 0
    heap = [(0, int(s)) for s in sources]
    while heap:
        d, v = heapq.heappop(heap)
        if d > dist[v]:
            continue
        r, c = v // cols, v % cols
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < GRID1.rows and 0 <= nc < cols:
                u = nr * cols + nc
                nd = d + int(cost[v]) + int(cost[u])
                if nd < dist[u]:
                    dist[u] = nd
                    heapq.heappush(heap, (nd, u))

    # backlink: first qualifying neighbour in N,S,E,W == ((1,0),(-1,0),(0,1),(0,-1))
    down = np.full(n, -1, np.int64)
    for v in range(n):
        r, c = v // cols, v % cols
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nr, nc = r + dr, c + dc
            if 0 <= nr < GRID1.rows and 0 <= nc < cols:
                a = nr * cols + nc
                if dist[a] + int(cost[a]) + int(cost[v]) == dist[v]:
                    down[v] = a
                    break

    want = np.zeros(n, np.int64)
    dests = cells[(cells * 104729) % 1009 == 0]
    for s in dests:
        cur = int(s)
        while cur >= 0:
            want[cur] += 1
            cur = int(down[cur])

    got = cost_pathway(SF).to_pandas().sort_values("cell_id")
    got_full = np.zeros(n, np.int64)
    got_full[got["cell_id"].to_numpy(np.int64)] = \
        got["n_paths"].to_numpy(np.int64)
    assert np.array_equal(got_full, want)
