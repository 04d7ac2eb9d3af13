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

from ..relational import keyed_map_groups, partial_agg
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
        if not len(rts):  # clicks with no purchase stream at all
            purchase = np.full(len(lts), -1, np.int64)
            gap = np.full(len(lts), -1, np.int64)
        else:
            idx = np.searchsorted(rts, lts, side="right") - 1
            hit = idx >= 0
            safe = np.maximum(idx, 0)
            purchase = np.where(hit, rid[safe], -1)
            gap = np.where(hit, lts - rts[safe], -1)
        return pd.DataFrame({
            "click_id": left["event_id"].to_numpy(np.int64),
            "user_id": left["user_id"].to_numpy(np.int64),
            "purchase_id": purchase,
            "gap_us": gap,
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


# --------------------------------------------------------------------------
# Ordered funnel analysis (view -> click -> purchase)
# --------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
       JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
       JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
            WHEN s2.user_id IS NOT NULL THEN 2
            WHEN s1.user_id IS NOT NULL THEN 1
            ELSE 0 END AS BIGINT) AS stage_reached,
       COUNT(*) AS n_users
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
GROUP BY 1
"""

_FUNNEL_STEPS = ("view", "click", "purchase")


@query("event_funnel_stages", _FUNNEL_SQL)
def event_funnel_stages(sf_dir: str):
    """Ordered funnel: how far each user progresses through
    view -> click -> purchase, where each step must STRICTLY follow the
    user's earliest completion of the previous step. One bucketed exchange
    on user_id; the per-key kernel is three vectorized masked mins; the
    output exchange is 4 rows."""
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(_FUNNEL_STEPS)]
        step = df["event_type"].map(
            {s: i for i, s in enumerate(_FUNNEL_STEPS)})
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts_us": df["ts"].to_numpy("datetime64[us]").astype(np.int64),
            "step": step.to_numpy(np.int64),
        })

    def stage(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "stage_reached": pd.Series(dtype=np.int64)})
        uid = int(g["user_id"].iloc[0])
        ts = g["ts_us"].to_numpy(np.int64)
        st = g["step"].to_numpy(np.int64)
        reached = 0
        t_prev = None
        for k in range(len(_FUNNEL_STEPS)):
            mask = (st == k) if t_prev is None else \
                ((st == k) & (ts > t_prev))
            if not mask.any():
                break
            t_prev = ts[mask].min()
            reached = k + 1
        return pd.DataFrame({"user_id": [uid],
                             "stage_reached": [reached]})

    # all-events distinct users (users with none of the 3 steps still count
    # at stage 0): aggregate stages over the step events, then union the
    # remaining users at stage 0 via the distinct-user aggregate
    stages = keyed_map_groups(ds.map_batches(enc, batch_format="pandas"),
                              "user_id", stage)
    # normalize to Arrow blocks before the union (partial_agg's combine
    # requires one block type across the unioned dataset)
    stages = stages.map_batches(lambda t: t, batch_format="pyarrow")
    users = partial_agg(ds.map_batches(
        lambda df: pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "z": np.zeros(len(df), np.int64)}), batch_format="pandas"),
        ["user_id"], [("z", "min", "stage_reached")])
    both = partial_agg(stages.union(users), ["user_id"],
                       [("stage_reached", "max", "stage_reached")])
    counts = both.map_batches(
        lambda df: pd.DataFrame({
            "stage_reached": df["stage_reached"].to_numpy(np.int64),
            "n_users": np.ones(len(df), np.int64)}), batch_format="pandas")
    return partial_agg(counts, ["stage_reached"], [("n_users", "sum", "n_users")])


# --------------------------------------------------------------------------
# Retention cohorts (first-activity day x day offset)
# --------------------------------------------------------------------------

_RETENTION_SQL = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx
  FROM events
), first AS (
  SELECT user_id, MIN(day_idx) AS cohort_day FROM d GROUP BY user_id
)
SELECT f.cohort_day, d.day_idx - f.cohort_day AS day_offset,
       COUNT(*) AS n_users
FROM d JOIN first f USING (user_id)
GROUP BY 1, 2
"""


@query("retention_cohorts", _RETENTION_SQL)
def retention_cohorts(sf_dir: str):
    """Retention matrix: users bucketed by first-activity day (cohort),
    counted per (cohort, day-offset) cell of later activity. The
    (user, day) distinct collapse happens map-side; cohort assignment is
    a per-user min carried through one more small aggregate — three
    exchanges, all on (user) or (cohort, offset) keys."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "day_idx": ts // 86_400_000_000})
        out = out.drop_duplicates()
        out["z"] = np.zeros(len(out), np.int8)
        return out

    days = partial_agg(ds.map_batches(enc, batch_format="pandas"),
                       ["user_id", "day_idx"], [("z", "min", "z")]) \
        .drop_columns(["z"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"cohort_day": pd.Series(dtype=np.int64),
                                 "day_offset": pd.Series(dtype=np.int64),
                                 "n_users": pd.Series(dtype=np.int64)})
        d = g["day_idx"].to_numpy(np.int64)
        first = d.min()
        return pd.DataFrame({"cohort_day": np.full(len(d), first),
                             "day_offset": d - first,
                             "n_users": np.ones(len(d), np.int64)})

    cells = keyed_map_groups(days, "user_id", per_user)
    return partial_agg(cells, ["cohort_day", "day_offset"],
                       [("n_users", "sum", "n_users")])


# --------------------------------------------------------------------------
# Distributed semi-join / anti-join (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------

_QTY_HI = 45

_ANTI_SQL = f"""
SELECT o.o_orderkey, o.o_custkey
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity > {_QTY_HI})
"""

_SEMI_SQL = f"""
SELECT o.o_orderkey, o.o_custkey
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_quantity > {_QTY_HI})
"""


def _hiqty_keys(sf_dir: str):
    """Distinct order keys owning a high-quantity lineitem (the probe side
    of both joins): filtered at the read, collapsed map-side, one small
    exchange on the key."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["l_quantity"] > _QTY_HI, "l_orderkey"] \
            .drop_duplicates().to_numpy(np.int64)
        return pd.DataFrame({"o_orderkey": k,
                             "hit": np.ones(len(k), np.int8)})

    return partial_agg(li.map_batches(keys, batch_format="pandas"),
                       ["o_orderkey"], [("hit", "min", "hit")])


def _exists_join(sf_dir: str, *, want_match: bool):
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    probe = _hiqty_keys(sf_dir)
    joined = orders.join(probe, join_type="left_outer", num_partitions=16,
                         on=("o_orderkey",))

    def sieve(t):
        import pyarrow.compute as pc

        mask = pc.is_valid(t["hit"]) if want_match \
            else pc.is_null(t["hit"])
        return t.filter(mask).select(["o_orderkey", "o_custkey"])

    return joined.map_batches(sieve, batch_format="pyarrow")


@query("orders_anti_join_hiqty", _ANTI_SQL)
def orders_anti_join_hiqty(sf_dir: str):
    """Distributed ANTI-join (NOT EXISTS): orders with no high-quantity
    lineitem. The probe side is a distinct-key collapse (never the
    lineitem rows); the left-outer + null-sieve runs as one keyed
    exchange. When the probe side is small enough it should flip to the
    broadcast filter (source_blocklist_filter's shape) — this entry keeps
    the shuffle form as the general-cardinality path."""
    return _exists_join(sf_dir, want_match=False)


@query("orders_semi_join_hiqty", _SEMI_SQL)
def orders_semi_join_hiqty(sf_dir: str):
    """Distributed SEMI-join (EXISTS): the matching orders, same plan as
    the anti-join with the sieve inverted — multiplicity-safe because the
    probe side is distinct keys, so the join never duplicates orders."""
    return _exists_join(sf_dir, want_match=True)
