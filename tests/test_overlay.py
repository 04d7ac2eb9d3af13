"""Sutherland-Hodgman convex clipping unit tests (incl. the pentagon cases
excluded from the SQL contract)."""

import numpy as np

from whitebox_tools_ray.geometry import clip_polygon_convex, polygon_area
from whitebox_tools_ray.layers import PENT, _rect_ring


def test_rect_rect_intersection():
    subj = _rect_ring(0.0, 0.0, 10.0, 10.0)
    clip = _rect_ring(5.0, 5.0, 20.0, 20.0)
    out = clip_polygon_convex(subj, clip)
    assert abs(abs(polygon_area(out)) - 25.0) < 1e-12  # 5x5 overlap


def test_disjoint_is_empty():
    subj = _rect_ring(0.0, 0.0, 1.0, 1.0)
    clip = _rect_ring(5.0, 5.0, 6.0, 6.0)
    assert len(clip_polygon_convex(subj, clip)) == 0


def test_subject_inside_clip_unchanged_area():
    subj = _rect_ring(1.0, 1.0, 2.0, 2.0)
    clip = _rect_ring(0.0, 0.0, 10.0, 10.0)
    out = clip_polygon_convex(subj, clip)
    assert abs(abs(polygon_area(out)) - 1.0) < 1e-12


def test_pentagon_clip_area_via_sampling():
    """Monte-Carlo-grid oracle for the non-rect case: clipped area equals
    the fraction of a fine grid inside BOTH the pentagon and the window."""
    from whitebox_tools_ray.geometry import point_in_poly

    pent = np.asarray(PENT)
    clip = _rect_ring(95.0, -20.0, 135.0, 40.0)
    out = clip_polygon_convex(pent, clip)
    area = abs(polygon_area(out))
    xs = np.linspace(80.0, 145.0, 400)
    ys = np.linspace(-30.0, 55.0, 400)
    gx, gy = np.meshgrid(xs, ys)
    inside_p = point_in_poly(gx.ravel(), gy.ravel(), pent)
    inside_c = (gx.ravel() >= 95) & (gx.ravel() <= 135) & \
        (gy.ravel() >= -20) & (gy.ravel() <= 40)
    cell_a = (xs[1] - xs[0]) * (ys[1] - ys[0])
    approx = (inside_p & inside_c).sum() * cell_a
    assert abs(area - approx) / area < 0.02


def test_greiner_hormann_dense_sampling():
    """Overlay region == pointwise region algebra on dense random samples,
    for all four ops over 60 star pairs (non-convex, crossing/contained/
    disjoint mixes)."""
    import numpy as np

    from whitebox_tools_ray.geometry import point_in_poly
    from whitebox_tools_ray.pipelines.queries_overlay import star_rings
    from whitebox_tools_ray.stages.overlay import greiner_hormann, region_inside

    rng = np.random.default_rng(11)
    ids = np.arange(60, dtype=np.int64)
    A, B = star_rings(ids)
    for i in range(len(ids)):
        allv = np.concatenate([A[i, :-1], B[i, :-1]])
        px = rng.uniform(allv[:, 0].min() - 0.5, allv[:, 0].max() + 0.5, 600)
        py = rng.uniform(allv[:, 1].min() - 0.5, allv[:, 1].max() + 0.5, 600)
        in_a = point_in_poly(px, py, A[i])
        in_b = point_in_poly(px, py, B[i])
        for op, want in [("intersect", in_a & in_b), ("union", in_a | in_b),
                         ("difference", in_a & ~in_b), ("symdiff", in_a ^ in_b)]:
            got = region_inside(greiner_hormann(A[i], B[i], op), px, py)
            assert (got == want).all(), (i, op, int((got != want).sum()))


def test_greiner_hormann_containment_cases():
    """No-crossing branches: disjoint, A inside B, B inside A."""
    import numpy as np

    from whitebox_tools_ray.stages.overlay import greiner_hormann, region_inside

    sq = np.array([[0., 0.], [4., 0.], [4., 4.], [0., 4.], [0., 0.]])
    inner = np.array([[1., 1.], [3., 1.], [3., 3.], [1., 3.], [1., 1.]])
    far = inner + 10.0
    px = np.array([2.0, 0.5, 12.0, -5.0])
    py = np.array([2.0, 0.5, 12.0, -5.0])
    # A=sq, B=inner (B inside A)
    assert (region_inside(greiner_hormann(sq, inner, "intersect"), px, py)
            == [True, False, False, False]).all()
    assert (region_inside(greiner_hormann(sq, inner, "union"), px, py)
            == [True, True, False, False]).all()
    # difference sq - inner: ring with hole
    assert (region_inside(greiner_hormann(sq, inner, "difference"), px, py)
            == [False, True, False, False]).all()
    # disjoint
    assert greiner_hormann(sq, far, "intersect") == []
    assert (region_inside(greiner_hormann(sq, far, "union"), px, py)
            == [True, True, True, False]).all()


def test_overlay_ring_outputs_match_region_and_structure(ray_session):
    """The ring-emitting entries: every ring is closed-form valid (>= 3
    vertices, nonzero area) and the encoded region matches the input
    region algebra on a dense sample grid."""
    import numpy as np

    from whitebox_tools_ray.pipelines.queries_overlay import (
        _OP_PRED, star_rings)
    from whitebox_tools_ray.pipelines.queries import QUERIES
    from whitebox_tools_ray.stages.overlay import region_inside

    sf = "/root/testdata/sf0.001"
    pids = np.arange(12, dtype=np.int64)
    A, B = star_rings(pids)
    preds = {
        "intersect": lambda a, b: a & b,
        "union": lambda a, b: a | b,
        "difference": lambda a, b: a & ~b,
        "symdiff": lambda a, b: a != b,
    }
    for op in _OP_PRED:
        df = QUERIES[f"overlay_{op}_rings"](sf).to_pandas()
        df = df[df["pair_id"] < 12]
        for pid in range(12):
            sub = df[df["pair_id"] == pid]
            rings = []
            for ri, g in sub.groupby("ring_idx"):
                g = g.sort_values("vtx_idx")
                assert len(g) >= 3
                ring = np.column_stack([
                    g["x_micro"].to_numpy(np.float64) / 1e6,
                    g["y_micro"].to_numpy(np.float64) / 1e6])
                x, y = ring[:, 0], ring[:, 1]
                a2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
                assert abs(a2) > 0
                assert int(g["area2_sign"].iloc[0]) == int(np.sign(a2))
                rings.append(ring)
            # dense region check vs input algebra (away from boundaries)
            rng = np.random.default_rng(pid)
            px = rng.uniform(-3.2, 3.2, 400) + A[pid][:, 0].mean()
            py = rng.uniform(-3.2, 3.2, 400) + A[pid][:, 1].mean()
            in_a = region_inside([A[pid]], px, py)
            in_b = region_inside([B[pid]], px, py)
            want = preds[op](in_a, in_b)
            got = region_inside(rings, px, py)
            # micro-quantization can flip points razor-close to an edge;
            # tolerate <1% disagreement at the boundary band
            assert (got != want).mean() < 0.01


def test_split_rings_cover_the_polygon(ray_session):
    """Piece rings: disjoint on either side of the line, union covers A."""
    import numpy as np

    from whitebox_tools_ray.pipelines.queries import QUERIES
    from whitebox_tools_ray.pipelines.queries_overlay import star_rings
    from whitebox_tools_ray.stages.overlay import region_inside

    sf = "/root/testdata/sf0.001"
    df = QUERIES["split_with_lines_rings"](sf).to_pandas()
    pids = np.arange(8, dtype=np.int64)
    A, _B = star_rings(pids)
    for pid in range(8):
        sub = df[df["pair_id"] == pid]
        rings = {}
        for piece, g in sub.groupby("piece"):
            g = g.sort_values("vtx_idx")
            rings[piece] = np.column_stack([
                g["x_micro"].to_numpy(np.float64) / 1e6,
                g["y_micro"].to_numpy(np.float64) / 1e6])
        rng = np.random.default_rng(100 + pid)
        px = rng.uniform(-3.2, 3.2, 300) + A[pid][:, 0].mean()
        py = rng.uniform(-3.2, 3.2, 300) + A[pid][:, 1].mean()
        in_a = region_inside([A[pid]], px, py)
        got = np.zeros(len(px), bool)
        overlap = np.zeros(len(px), np.int64)
        for ring in rings.values():
            m = region_inside([ring], px, py)
            got |= m
            overlap += m.astype(np.int64)
        assert (got != in_a).mean() < 0.01     # union covers A
        assert (overlap > 1).mean() < 0.01     # pieces essentially disjoint


def test_buffer_rings_encode_the_capsule_region(ray_session):
    import numpy as np

    from whitebox_tools_ray.pipelines.queries import QUERIES
    from whitebox_tools_ray.pipelines.queries_vector2 import (
        BUF_R, buffer_lines, capsule_inside)
    from whitebox_tools_ray.stages.overlay import region_inside

    sf = "/root/testdata/sf0.001"
    df = QUERIES["vector_buffer_rings"](sf).to_pandas()
    lids = np.arange(6, dtype=np.int64)
    v = buffer_lines(lids)
    for li in range(6):
        sub = df[df["line_id"] == li]
        assert len(sub) > 0
        rings = []
        for _ri, g in sub.groupby("ring_idx"):
            g = g.sort_values("vtx_idx")
            rings.append(np.column_stack([
                g["x_micro"].to_numpy(np.float64) / 1e6,
                g["y_micro"].to_numpy(np.float64) / 1e6]))
        rng = np.random.default_rng(li)
        px = rng.uniform(v[li, :, 0].min() - 2 * BUF_R,
                         v[li, :, 0].max() + 2 * BUF_R, 500)
        py = rng.uniform(v[li, :, 1].min() - 2 * BUF_R,
                         v[li, :, 1].max() + 2 * BUF_R, 500)
        want = capsule_inside(v[li:li + 1], px[None, :], py[None, :])[0]
        got = region_inside(rings, px, py)
        # raster-resolution boundary: tolerate a thin disagreement band
        assert (got != want).mean() < 0.06


def test_overlay_rings_shapefile_roundtrip(ray_session, tmp_path):
    """Ring rows -> .shp/.shx/.dbf -> reader: same ring structure (vertex
    sets exact modulo rotation/orientation/closure), hole flags follow the
    parity depth, and the re-read region equals the original region."""
    import numpy as np

    from whitebox_tools_ray.pipelines.queries import QUERIES
    from whitebox_tools_ray.sources.shapefile import (
        read_dbf, read_shapefile_ds, write_rings_shapefile)
    from whitebox_tools_ray.stages.overlay import region_inside

    sf = "/root/testdata/sf0.001"
    df = QUERIES["overlay_symdiff_rings"](sf).to_pandas()
    pids = sorted(df["pair_id"].unique())[:8]
    df = df[df["pair_id"].isin(pids)]
    shp = str(tmp_path / "rings.shp")
    write_rings_shapefile(shp, df)

    parts = read_shapefile_ds(shp).to_pandas()
    attrs = read_dbf(shp[:-4] + ".dbf")
    assert len(attrs) == len(pids)
    for rec, pid in enumerate(pids):
        orig = []
        for _ri, g in df[df["pair_id"] == pid].groupby("ring_idx"):
            g = g.sort_values("vtx_idx")
            orig.append(np.column_stack([
                g["x_micro"].to_numpy(np.float64) / 1e6,
                g["y_micro"].to_numpy(np.float64) / 1e6]))
        back_rows = parts[parts["feature_id"] == rec] \
            .sort_values("part_idx")
        back = [np.frombuffer(r.ring, "<f8").reshape(-1, 2)
                for r in back_rows.itertuples()]
        assert len(back) == len(orig)
        # vertex-set equality: every written ring matches one source ring
        orig_sets = [frozenset(map(tuple, r)) for r in orig]
        for b in back:
            assert frozenset(map(tuple, b)) in orig_sets
        # region equality on a dense sample (rings are closed on disk)
        ctr = np.concatenate(orig).mean(axis=0)
        rng = np.random.default_rng(int(pid))
        px = rng.uniform(-4, 4, 500) + ctr[0]
        py = rng.uniform(-4, 4, 500) + ctr[1]
        got = region_inside(back, px, py)
        want = region_inside(orig, px, py)
        np.testing.assert_array_equal(got, want)
        # winding/hole consistency (reader derives is_hole from winding)
        for r in back_rows.itertuples():
            ring = np.frombuffer(r.ring, "<f8").reshape(-1, 2)
            x, y = ring[:, 0], ring[:, 1]
            a = float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]) / 2.0)
            assert (a > 0) == bool(r.is_hole)
