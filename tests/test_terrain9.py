"""Independent scalar oracle for contours_from_points."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_contours_from_points_matches_scalar(ray_session):
    from whitebox_tools_ray.functions.delaunay import delaunay
    from whitebox_tools_ray.pipelines.queries_terrain9 import (
        _LEVELS, contours_from_points)
    from whitebox_tools_ray.sources.tables import read_points

    got = contours_from_points(SF).to_pandas() \
        .sort_values(["a", "b", "c", "level"]).reset_index(drop=True)

    pts = read_points(SF).to_pandas()
    pts = pts[pts["event_id"] % 23 == 0].sort_values("event_id")
    xy = pts[["x", "y"]].to_numpy(np.float64)
    z = pts["value"].to_numpy(np.float64)
    ids = pts["event_id"].to_numpy(np.int64)
    tris = np.sort(delaunay(xy), axis=1)  # canonical ascending vertex order
    # (positions are seq-sorted, so position order == seq order)

    rows = []
    for ti in range(len(tris)):
        a, b, c = (int(v) for v in tris[ti])
        vz = [z[a], z[b], z[c]]
        vv = [xy[a], xy[b], xy[c]]
        for lv in _LEVELS:
            above = [v >= lv for v in vz]
            if all(above) or not any(above):
                continue
            p = []
            for (i, j) in ((0, 1), (1, 2), (2, 0)):
                if above[i] != above[j]:
                    t = (lv - vz[i]) / (vz[j] - vz[i])
                    p.append((vv[i][0] + t * (vv[j][0] - vv[i][0]),
                              vv[i][1] + t * (vv[j][1] - vv[i][1])))
            if len(p) == 2:
                rows.append((int(ids[a]), int(ids[b]), int(ids[c]), lv,
                             p[0][0], p[0][1], p[1][0], p[1][1]))

    rows.sort()
    assert len(got) == len(rows)
    for k, (a, b, c, lv, x0, y0, x1, y1) in enumerate(rows):
        r = got.iloc[k]
        assert (int(r["a"]), int(r["b"]), int(r["c"])) == (a, b, c)
        assert r["level"] == lv
        assert (r["x0"], r["y0"], r["x1"], r["y1"]) == (x0, y0, x1, y1)
    # segments actually lie on their level (interpolation sanity)
    assert len(got) > 100
