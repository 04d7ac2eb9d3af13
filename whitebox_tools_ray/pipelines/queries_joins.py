"""Custom join operators Ray Data lacks natively: AS-OF join and RANGE
(interval-containment) join — the two shapes the driver mandate names as
canonical custom operators (compose map_batches + keyed map_groups +
broadcast; never an all-pairs product).

Partitioning assumptions, stated per the mandate:
  * as-of join: both streams are hash-co-located on the join key
    (user_id) — one bucketed exchange; within a key the merge is a sorted
    searchsorted, O((|L|+|R|) log |R|) per key. Key skew = the hottest
    user's two streams must fit one task's memory.
  * range join: the interval side is SMALL (a policy/campaign table) and
    is broadcast once via ray.put; events stream through map_batches
    untouched by any shuffle. For interval sets too big to scan per batch
    (>10^4), swap the per-interval vectorized mask for a static interval
    tree built once per actor — the plumbing stays identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..relational import keyed_map_groups
from ..sources.tables import read_table
from .queries import query
from .sqlgen import add64, sm64

# --------------------------------------------------------------------------
# AS-OF join: each click matched to the user's most recent prior purchase
# --------------------------------------------------------------------------

_ASOF_SQL = """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
     r AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase')
SELECT l.event_id AS click_id, l.user_id,
       COALESCE(r.event_id, -1) AS purchase_id,
       COALESCE(CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT), -1) AS gap_us
FROM l LEFT JOIN r ON r.user_id = l.user_id AND r.ts <= l.ts
QUALIFY ROW_NUMBER() OVER (PARTITION BY l.event_id
                           ORDER BY r.ts DESC NULLS LAST,
                                    r.event_id DESC) = 1
"""


@query("asof_join_click_purchase", _ASOF_SQL)
def asof_join_click_purchase(sf_dir: str):
    """AS-OF join (backward, inclusive): for every 'click' event, the same
    user's latest 'purchase' with ts <= click ts; ties on ts break to the
    larger purchase event_id; unmatched clicks keep (-1, -1). Both streams
    ride ONE tagged dataset through ONE bucketed exchange on user_id; the
    per-key merge is vectorized searchsorted over the sorted right side."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("click", "purchase"))]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts_us": df["ts"].to_numpy("datetime64[us]").astype(np.int64),
            "is_right": (df["event_type"] == "purchase")
            .to_numpy(bool).astype(np.int64),
        })

    tagged = ds.map_batches(tag, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["is_right"] == 0]
        right = g[g["is_right"] == 1].sort_values(["ts_us", "event_id"])
        if not len(left):
            return pd.DataFrame({"click_id": pd.Series(dtype=np.int64),
                                 "user_id": pd.Series(dtype=np.int64),
                                 "purchase_id": pd.Series(dtype=np.int64),
                                 "gap_us": pd.Series(dtype=np.int64)})
        lts = left["ts_us"].to_numpy(np.int64)
        rts = right["ts_us"].to_numpy(np.int64)
        rid = right["event_id"].to_numpy(np.int64)
        idx = np.searchsorted(rts, lts, side="right") - 1
        hit = idx >= 0
        safe = np.maximum(idx, 0)
        return pd.DataFrame({
            "click_id": left["event_id"].to_numpy(np.int64),
            "user_id": left["user_id"].to_numpy(np.int64),
            "purchase_id": np.where(hit, rid[safe], -1),
            "gap_us": np.where(hit, lts - rts[safe], -1),
        })

    # per_group=True: `merge` needs exactly one user's rows per call (its
    # searchsorted is within-key); the empty-frame contract is satisfied by
    # the len(left) == 0 branch
    return keyed_map_groups(tagged, "user_id", merge)


# --------------------------------------------------------------------------
# RANGE join: events stabbed against a broadcast interval table
# --------------------------------------------------------------------------

_IV_N = 60
_IV_SEED = 77
_IV_BASE_US = 1_704_067_200_000_000      # 2024-01-01 00:00:00 UTC
_IV_SPAN_US = 2_505_600_000_000          # 29 days
_IV_MIN_W_US = 3_600_000_000             # 1 h
_IV_W_RANGE_US = 172_800_000_000         # + up to 48 h


def _intervals() -> tuple[np.ndarray, np.ndarray]:
    """Closed-form campaign windows (overlapping, unsorted)."""
    from ..sources.synthetic import splitmix64

    k = np.arange(_IV_N, dtype=np.uint64)
    hk = splitmix64(k + np.uint64(_IV_SEED))
    start = _IV_BASE_US + (hk % np.uint64(_IV_SPAN_US)).astype(np.int64)
    width = _IV_MIN_W_US + ((hk >> np.uint64(8))
                            % np.uint64(_IV_W_RANGE_US)).astype(np.int64)
    return start, start + width


def _range_join_sql(n: int = _IV_N, seed: int = _IV_SEED) -> str:
    hk = sm64(add64("CAST(k.k AS UBIGINT)", str(seed)))
    return f"""
    WITH iv AS (
      SELECT CAST(k.k AS BIGINT) AS interval_id,
             {_IV_BASE_US} + CAST({hk} % {_IV_SPAN_US} AS BIGINT) AS start_us,
             {_IV_BASE_US} + CAST({hk} % {_IV_SPAN_US} AS BIGINT)
               + {_IV_MIN_W_US}
               + CAST(({hk} >> 8) % {_IV_W_RANGE_US} AS BIGINT) AS end_us
      FROM range({n}) k(k)
    )
    SELECT e.event_id, iv.interval_id, e.user_id
    FROM events e JOIN iv
      ON epoch_us(e.ts) >= iv.start_us AND epoch_us(e.ts) < iv.end_us
    """


@query("event_range_join", _range_join_sql())
def event_range_join(sf_dir: str):
    """RANGE join (interval containment, [start, end)): every event paired
    with every campaign window containing its timestamp. The interval table
    is broadcast once (ray.put) and stabbed per batch with a vectorized
    per-interval mask — no shuffle touches the event stream, and
    overlapping intervals fan rows out naturally."""
    starts, ends = _intervals()
    iv_ref = ray.put((starts, ends))
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def stab(df: pd.DataFrame) -> pd.DataFrame:
        s, e = ray.get(iv_ref)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        out_e, out_i, out_u = [], [], []
        for k in range(len(s)):
            m = (ts >= s[k]) & (ts < e[k])
            if m.any():
                out_e.append(eid[m])
                out_i.append(np.full(int(m.sum()), k, np.int64))
                out_u.append(uid[m])
        if not out_e:
            return pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                                 "interval_id": pd.Series(dtype=np.int64),
                                 "user_id": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"event_id": np.concatenate(out_e),
                             "interval_id": np.concatenate(out_i),
                             "user_id": np.concatenate(out_u)})

    return ds.map_batches(stab, batch_format="pandas")
