"""Shapefile writer/reader round trip + DBF attributes + parallel reader."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.layers import builtin_features


@pytest.mark.usefixtures("ray_session")
def test_shp_round_trip(tmp_path):
    from whitebox_tools_ray.sources.shapefile import (
        packed_from_shapefile,
        read_dbf,
        read_shapefile_ds,
        write_shapefile,
    )

    shp = str(tmp_path / "layer.shp")
    feats = builtin_features()
    attrs = pd.DataFrame({"FID": [0, 1, 2, 3], "NAME": ["a", "bb", "ccc", "d"]})
    write_shapefile(shp, feats, attrs)

    parts = read_shapefile_ds(shp, records_per_block=2).to_pandas() \
        .sort_values(["feature_id", "part_idx"]).reset_index(drop=True)
    want = [(fid, i, ring, hole) for fid, ps in feats
            for i, (ring, hole) in enumerate(ps)]
    assert len(parts) == len(want)
    for row, (fid, pi, ring, hole) in zip(parts.itertuples(), want):
        assert row.feature_id == fid and row.part_idx == pi
        assert bool(row.is_hole) == hole
        got = np.frombuffer(row.ring, "<f8").reshape(-1, 2)
        ring = np.asarray(ring, np.float64)
        if not (ring[0] == ring[-1]).all():
            ring = np.vstack([ring, ring[:1]])
        assert np.array_equal(got, ring)  # float64 survives byte-exact

    dbf = read_dbf(shp[:-4] + ".dbf")
    assert list(dbf["FID"]) == [0, 1, 2, 3]
    assert list(dbf["NAME"]) == ["a", "bb", "ccc", "d"]

    # packed layer equals the in-memory builtin layer part-for-part
    from whitebox_tools_ray.layers import builtin_polygons

    imported = packed_from_shapefile(shp)
    base = builtin_polygons()
    assert np.array_equal(imported.feature_id, base.feature_id)
    assert np.array_equal(imported.is_hole, base.is_hole)
    assert np.allclose(imported.bboxes, base.bboxes, rtol=0, atol=0)
    for a, b in zip(imported.rings, base.rings):
        assert np.array_equal(a, b)
