"""Structural properties of the raster_to_vector_lines chain contract
(the value-level check is the DuckDB oracle via test_oracle_parity)."""

import numpy as np


def test_chains_are_contiguous_paths(ray_session):
    from whitebox_tools_ray.pipelines.queries_data4 import _EO, \
        raster_to_vector_lines

    df = raster_to_vector_lines("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 500
    # per link: positions 0..k each step moving to an 8-adjacent cell
    # (loops revisit distances, so allow duplicate pos but check adjacency
    # between consecutive distinct levels)
    # junction records are single-row links (skipped by the len<2 guard);
    # chain links keep their pos-0 seed row
    for link, g in df.groupby("link_id"):
        g = g.sort_values("pos")
        cx = g["cell_key"].to_numpy(np.int64) % 4096 - _EO
        cy = g["cell_key"].to_numpy(np.int64) // 4096 - _EO
        pos = g["pos"].to_numpy(np.int64)
        if len(g) < 2:
            continue
        # every vertex at pos p>0 must be adjacent to SOME vertex at p-1
        for i in range(len(g)):
            if pos[i] == 0:
                continue
            prev = pos == pos[i] - 1
            assert (np.maximum(np.abs(cx[prev] - cx[i]),
                               np.abs(cy[prev] - cy[i])) == 1).any()
    # junction rows are self-labelled at pos 0
    j = df[(df["cell_key"] == df["link_id"]) & (df["pos"] == 0)]
    assert len(j) > 0
