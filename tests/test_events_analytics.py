"""Crafted-corpus edge cases for the event-analytics family
(queries_joins.py): as-of tie-breaks, strict funnel ordering, retention
offsets — branches the synthetic events table rarely exercises."""

import numpy as np
import pandas as pd
import pytest


def _write_events(tmp_path, rows):
    import ray.data

    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    df["ts"] = pd.to_datetime(df["ts"])
    ray.data.from_pandas(df).write_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_asof_tie_and_unmatched(tmp_path):
    from whitebox_tools_ray.pipelines.queries_joins import \
        asof_join_click_purchase

    rows = [
        # user 1: two purchases at the SAME ts before the click -> larger id
        (1, "2024-01-01 10:00:00", 1, "purchase", 0.0, ""),
        (2, "2024-01-01 10:00:00", 1, "purchase", 0.0, ""),
        (3, "2024-01-01 11:00:00", 1, "click", 0.0, ""),
        # user 2: click with no purchase -> (-1, -1)
        (4, "2024-01-01 09:00:00", 2, "click", 0.0, ""),
        # user 3: purchase exactly AT click ts -> inclusive match, gap 0
        (5, "2024-01-02 08:00:00", 3, "purchase", 0.0, ""),
        (6, "2024-01-02 08:00:00", 3, "click", 0.0, ""),
        # user 4: purchase only AFTER the click -> unmatched
        (7, "2024-01-03 12:00:00", 4, "click", 0.0, ""),
        (8, "2024-01-03 13:00:00", 4, "purchase", 0.0, ""),
    ]
    sf = _write_events(tmp_path, rows)
    out = asof_join_click_purchase(sf).to_pandas() \
        .set_index("click_id").sort_index()
    assert out.loc[3, "purchase_id"] == 2          # tie -> larger event_id
    assert out.loc[3, "gap_us"] == 3_600_000_000
    assert out.loc[4, "purchase_id"] == -1
    assert out.loc[6, "purchase_id"] == 5 and out.loc[6, "gap_us"] == 0
    assert out.loc[7, "purchase_id"] == -1


@pytest.mark.usefixtures("ray_session")
def test_funnel_strict_ordering(tmp_path):
    from whitebox_tools_ray.pipelines.queries_joins import \
        event_funnel_stages

    rows = [
        # user 1: full ordered funnel -> stage 3
        (1, "2024-01-01 08:00:00", 1, "view", 0.0, ""),
        (2, "2024-01-01 09:00:00", 1, "click", 0.0, ""),
        (3, "2024-01-01 10:00:00", 1, "purchase", 0.0, ""),
        # user 2: purchase BEFORE click -> stops at stage 2
        (4, "2024-01-02 08:00:00", 2, "view", 0.0, ""),
        (5, "2024-01-02 08:30:00", 2, "purchase", 0.0, ""),
        (6, "2024-01-02 09:00:00", 2, "click", 0.0, ""),
        # user 3: click at the SAME ts as view (not strictly after) -> 1
        (7, "2024-01-03 08:00:00", 3, "view", 0.0, ""),
        (8, "2024-01-03 08:00:00", 3, "click", 0.0, ""),
        # user 4: only an error event -> stage 0 but still counted
        (9, "2024-01-04 08:00:00", 4, "error", 0.0, ""),
        # user 5: click first, later a fresh view->click -> stage 2
        (10, "2024-01-05 07:00:00", 5, "click", 0.0, ""),
        (11, "2024-01-05 08:00:00", 5, "view", 0.0, ""),
        (12, "2024-01-05 09:00:00", 5, "click", 0.0, ""),
    ]
    sf = _write_events(tmp_path, rows)
    out = event_funnel_stages(sf).to_pandas() \
        .set_index("stage_reached")["n_users"].to_dict()
    assert out == {3: 1, 2: 2, 1: 1, 0: 1}


@pytest.mark.usefixtures("ray_session")
def test_retention_offsets(tmp_path):
    from whitebox_tools_ray.pipelines.queries_joins import retention_cohorts

    rows = [
        # user 1: days 0, 0 (dup), 2 -> cohort d0, offsets {0, 2}
        (1, "2024-01-01 01:00:00", 1, "view", 0.0, ""),
        (2, "2024-01-01 23:00:00", 1, "click", 0.0, ""),
        (3, "2024-01-03 01:00:00", 1, "view", 0.0, ""),
        # user 2: day 1 only -> cohort d1, offset {0}
        (4, "2024-01-02 12:00:00", 2, "view", 0.0, ""),
        # user 3: days 1 and 3 -> cohort d1, offsets {0, 2}
        (5, "2024-01-02 06:00:00", 3, "view", 0.0, ""),
        (6, "2024-01-04 06:00:00", 3, "view", 0.0, ""),
    ]
    sf = _write_events(tmp_path, rows)
    out = retention_cohorts(sf).to_pandas()
    d0 = 19723  # 2024-01-01 in epoch days
    cells = {(int(r.cohort_day), int(r.day_offset)): int(r.n_users)
             for r in out.itertuples()}
    assert cells == {(d0, 0): 1, (d0, 2): 1,
                     (d0 + 1, 0): 2, (d0 + 1, 2): 1}
