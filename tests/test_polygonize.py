"""Ring tracing: hand-built patterns -> known ring structure; round-trip
check (every member cell centre inside outer ring and outside holes) using
the engine's own winding kernel."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.geometry import point_in_poly
from whitebox_tools_ray.grid import GridSpec
from whitebox_tools_ray.stages.polygonize import _trace_rings

G = GridSpec(west=0.0, north=30.0, res_x=1.0, res_y=1.0, rows=30, cols=40)


def test_trace_single_cell():
    rings = _trace_rings(np.array([0]), np.array([0]))
    assert len(rings) == 1
    assert rings[0][0] == rings[0][-1]
    assert len(rings[0]) == 5  # 4 corners + closure


def test_trace_square_with_hole():
    rs, cs = [], []
    for r in range(3):
        for c in range(3):
            if (r, c) != (1, 1):
                rs.append(r)
                cs.append(c)
    rings = _trace_rings(np.array(rs), np.array(cs))
    assert len(rings) == 2
    lens = sorted(len(r) for r in rings)
    assert lens == [5, 13]  # hole (4 edges) + outer (12 edges)


def test_trace_diagonal_pinch():
    # two cells sharing only a corner (8-connected clump)
    rings = _trace_rings(np.array([0, 1]), np.array([0, 1]))
    # right-most-turn rule yields two simple 4-edge rings (the pinch splits)
    assert all(r[0] == r[-1] for r in rings)
    total_edges = sum(len(r) - 1 for r in rings)
    assert total_edges == 8


@pytest.mark.usefixtures("ray_session")
def test_polygonize_roundtrip():
    import ray.data

    from whitebox_tools_ray.stages.polygonize import polygonize

    # pattern: block with a hole + separate block
    cells = []
    for r in range(5, 12):
        for c in range(10, 20):
            if not (7 <= r <= 9 and 13 <= c <= 16):
                cells.append((r, c, 7.0))
    for r in range(20, 24):
        for c in range(30, 33):
            cells.append((r, c, 3.0))
    df = pd.DataFrame(cells, columns=["r", "c", "value"])
    df["cell_id"] = df["r"].astype(np.int64) * G.cols + df["c"].astype(np.int64)
    df["clump_id"] = np.where(df["value"] == 7.0, 1, 2).astype(np.int64)
    ds = ray.data.from_pandas(df[["cell_id", "value", "clump_id"]])

    rings = polygonize(ds, G).to_pandas()
    # clump 1: outer + hole; clump 2: outer only
    g1 = rings[rings.clump_id == 1]
    g2 = rings[rings.clump_id == 2]
    assert len(g1) == 2 and g1["is_hole"].sum() == 1
    assert len(g2) == 1 and not g2["is_hole"].any()

    # round-trip: member cell centres inside outer, outside hole
    outer = g1[~g1.is_hole].iloc[0]
    hole = g1[g1.is_hole].iloc[0]
    oring = np.column_stack([np.asarray(outer["xs"]), np.asarray(outer["ys"])])
    hring = np.column_stack([np.asarray(hole["xs"]), np.asarray(hole["ys"])])
    mem = df[df.clump_id == 1]
    cx = G.west + mem["c"].to_numpy() + 0.5
    cy = G.north - mem["r"].to_numpy() - 0.5
    assert point_in_poly(cx, cy, oring).all()
    assert not point_in_poly(cx, cy, hring).any()
    # hole interior centres: inside outer AND inside hole ring
    hx = G.west + np.array([13, 16]) + 0.5
    hy = G.north - np.array([7, 9]) - 0.5
    assert point_in_poly(hx, hy, oring).all()
    assert point_in_poly(hx, hy, hring).all()
    # areas: outer ring encloses the full 7x10 block (70), hole ring 3x4 (12)
    assert abs(outer.area) == 70.0
    assert abs(hole.area) == 12.0
