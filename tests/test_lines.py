"""Segment intersection vs brute force (incl. the exactly-once cell
ownership under bbox replication)."""

import numpy as np
import pytest

from whitebox_tools_ray.stages.lines import (
    segment_intersections,
    synth_segments,
)


def test_proper_crossing_cases():
    p0 = np.array([[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    p1 = np.array([[2.0, 2.0], [2.0, 2.0], [1.0, 1.0]])
    q0 = np.array([[0.0, 2.0], [3.0, 0.0], [1.0, 1.0]])
    q1 = np.array([[2.0, 0.0], [3.0, 2.0], [2.0, 0.0]])
    mask, ix, iy = segment_intersections(p0, p1, q0, q1)
    # case 0: X crossing at (1,1); case 1: disjoint; case 2: endpoint touch
    # (NOT proper -> excluded)
    assert mask.tolist() == [True, False, False]
    assert (ix[0], iy[0]) == (1.0, 1.0)


def brute(df):
    P0 = df[["x0", "y0"]].to_numpy()
    P1 = df[["x1", "y1"]].to_numpy()
    ids = df["seg_id"].to_numpy(np.int64)
    n = len(df)
    ia, ib = np.triu_indices(n, k=1)
    mask, ix, iy = segment_intersections(P0[ia], P1[ia], P0[ib], P1[ib])
    return {(int(ids[a]), int(ids[b])): (x, y)
            for a, b, x, y in zip(ia[mask], ib[mask], ix[mask], iy[mask])}


@pytest.mark.usefixtures("ray_session")
def test_line_intersections_matches_bruteforce():
    import ray.data

    from whitebox_tools_ray.stages.lines import line_intersections

    df = synth_segments(3000)
    want = brute(df)
    assert len(want) > 20  # enough crossings to be meaningful

    ds = ray.data.from_pandas(df).repartition(4)
    got = line_intersections(ds).to_pandas()
    got_map = {(int(a), int(b)): (x, y)
               for a, b, x, y in zip(got["seg_a"], got["seg_b"], got["ix"], got["iy"])}
    assert set(got_map) == set(want)          # exactly once, none missed
    for k in want:
        assert got_map[k] == want[k]          # identical float64 points
