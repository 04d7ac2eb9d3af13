"""IO family: CSV round trip + HTML report sink."""

import os

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_csv_roundtrip(tmp_path):
    import ray.data

    from whitebox_tools_ray.sources.formats import export_csv, read_csv_points
    from whitebox_tools_ray.sources.tables import read_table

    ds = read_table("/root/testdata/sf0.001", "events",
                    columns=["event_id", "event_type", "value"])
    out = str(tmp_path / "events_csv")
    export_csv(ds, out)
    back = read_csv_points(out)
    a = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    b = back.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["event_id"].to_numpy(), b["event_id"].to_numpy())
    np.testing.assert_allclose(a["value"].to_numpy(), b["value"].to_numpy(), rtol=1e-12)
    assert (a["event_type"] == b["event_type"]).all()


def test_html_report(tmp_path):
    from whitebox_tools_ray.sources.formats import write_html_report

    p = write_html_report("Zonal stats", [
        {"zone": 1, "n": 10, "mean": 2.5},
        {"zone": 2, "n": 4, "mean": 7.0},
    ], str(tmp_path / "report.html"))
    html = open(p).read()
    assert "<h1>Zonal stats</h1>" in html
    assert "<td>7.0</td>" in html and "<th>zone</th>" in html
    assert os.path.getsize(p) > 100
