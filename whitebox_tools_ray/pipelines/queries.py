"""The operator/pipeline registry: every implemented operator from
SURVEY.md section 2, each as a callable(sf_dir) -> Dataset/DataFrame/Table,
with a matching DuckDB oracle SQL where the semantics are SQL-expressible.

Determinism rules (north rule: N-CPU and 4N-CPU runs byte-identical):
  * money/value sums in integer cents (relational.cents) — order-independent
  * first/last/record-order semantics via explicit seq columns
    (arg_extreme_reduce), never via block order
  * all coordinate/cell arithmetic bit-identical between numpy and SQL
    (sources.tables derivation)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..relational import arg_extreme_reduce, cents, partial_agg
from ..sources.tables import read_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# --------------------------------------------------------------------------
# Relational / aggregate operators (SURVEY.md section 2.4: A1, A2, M1, J1,
# U, S1, SA patterns over the driver test tables)
# --------------------------------------------------------------------------

@query(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(sf_dir: str):
    """A2 grouped aggregate (ZonalStatistics pattern,
    math_stat_analysis/zonal_statistics.rs:385-460) with map-side combine."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    ds = ds.map_batches(lambda t: cents(t, "l_extendedprice", "sum_price_cents")
                        .append_column("n", pa.array(np.ones(len(t), np.int64))),
                        batch_format="pyarrow")
    return partial_agg(
        ds, ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum", "sum_qty"), ("sum_price_cents", "sum", "sum_price_cents"),
         ("n", "sum", "n")],
    )


@query(
    "region_customer_rollup",
    """
    SELECT r_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def region_customer_rollup(sf_dir: str):
    """J1 broadcast join (JoinTables pattern, data_tools/join_tables.rs:282-294):
    dimension tables resolved on the driver, shipped once, probed per batch."""
    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    lut = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    key_to_region = dict(zip(lut["n_nationkey"].astype(np.int64), lut["r_name"]))

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rname = np.array([key_to_region[k] for k in keys], dtype=object)
        out = cents(batch, "c_acctbal", "acctbal_cents")
        out = out.append_column("r_name", pa.array(rname, pa.string()))
        return out.append_column("n_customers", pa.array(np.ones(len(batch), np.int64)))

    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    ds = ds.map_batches(tag, batch_format="pyarrow")
    return partial_agg(ds, ["r_name"],
                       [("n_customers", "sum", "n_customers"),
                        ("acctbal_cents", "sum", "acctbal_cents")])


@query(
    "filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity >= 48 AND l_discount < 0.02
    """,
)
def filter_project(sf_dir: str):
    """M1 predicate filter (ExtractByAttribute plugin analog) — vectorized
    arrow filter inside map_batches, columns pruned at the read."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])

    def flt(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater_equal(t["l_quantity"], 48.0), pc.less(t["l_discount"], 0.02))
        return t.filter(mask).select(["l_orderkey", "l_linenumber", "l_quantity"])

    return ds.map_batches(flt, batch_format="pyarrow")


@query(
    "topk_orders",
    """
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
    FROM orders
    ORDER BY total_cents DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_orders(sf_dir: str):
    """S1 top-k: distributed sort + limit (Quantiles family)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: cents(t, "o_totalprice", "total_cents").select(["o_orderkey", "total_cents"]),
        batch_format="pyarrow")
    return ds.sort(["total_cents", "o_orderkey"], descending=[True, False]).limit(10)


@query(
    "distinct_flag_status",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flag_status(sf_dir: str):
    """Unique values (ListUniqueValues, math_stat_analysis/list_unique_values.rs)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    out = partial_agg(ds, ["l_returnflag", "l_linestatus"], [("l_returnflag", "count", "_n")])
    return out.drop_columns(["_n"])


@query(
    "union_parties_by_nation",
    """
    SELECT nationkey, COUNT(*) AS n
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def union_parties_by_nation(sf_dir: str):
    """U union-all concat (MergeVectors, data_tools/merge_vectors.rs:300)."""
    c = read_table(sf_dir, "customer", columns=["c_nationkey"]) \
        .map_batches(lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow")
    s = read_table(sf_dir, "supplier", columns=["s_nationkey"]) \
        .map_batches(lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow")
    u = c.union(s)
    u = u.map_batches(lambda t: t.append_column("n", pa.array(np.ones(len(t), np.int64))),
                      batch_format="pyarrow")
    return partial_agg(u, ["nationkey"], [("n", "sum", "n")])


@query(
    "zonal_stats_events",
    """
    SELECT event_type,
           COUNT(*) AS n,
           MIN(value) AS vmin,
           MAX(value) AS vmax,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY event_type
    """,
)
def zonal_stats_events(sf_dir: str):
    """A1/A2 summary statistics (RasterSummaryStats partial-merge pattern,
    math_stat_analysis/raster_summary_stats.rs:232-263)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    ds = ds.map_batches(
        lambda t: cents(t, "value", "sum_cents")
        .append_column("n", pa.array(np.ones(len(t), np.int64))),
        batch_format="pyarrow")
    return partial_agg(ds, ["event_type"],
                       [("n", "sum", "n"), ("value", "min", "vmin"),
                        ("value", "max", "vmax"), ("sum_cents", "sum", "sum_cents")])


@query(
    "quantiles_quantity",
    """
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.25) AS q25,
           quantile_disc(l_quantity, 0.50) AS q50,
           quantile_disc(l_quantity, 0.75) AS q75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def quantiles_quantity(sf_dir: str):
    """S1 quantiles (math_stat_analysis/quantiles.rs): per-group sort inside
    map_groups; discrete quantile index = ceil(q*n)-1 (DuckDB quantile_disc)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["l_quantity"].to_numpy())
        n = len(v)
        idx = lambda q: v[int(np.ceil(q * n)) - 1]  # noqa: E731
        return pd.DataFrame({"l_returnflag": [g["l_returnflag"].iloc[0]],
                             "q25": [idx(0.25)], "q50": [idx(0.50)], "q75": [idx(0.75)]})

    return ds.groupby("l_returnflag").map_groups(quant, batch_format="pandas")


@query(
    "orders_crosstab",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def orders_crosstab(sf_dir: str):
    """A2 cross-tabulation (math_stat_analysis/cross_tabulation.rs)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus"])
    ds = ds.map_batches(lambda t: t.append_column("n", pa.array(np.ones(len(t), np.int64))),
                        batch_format="pyarrow")
    return partial_agg(ds, ["o_orderpriority", "o_orderstatus"], [("n", "sum", "n")])


@query(
    "price_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 60000.0) AS BIGINT) AS bin, COUNT(*) AS n
    FROM orders
    GROUP BY bin
    """,
)
def price_histogram(sf_dir: str):
    """A1 histogram (AttributeHistogram / RasterHistogram) with fixed
    equal-interval bins; floor arithmetic identical to the oracle."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def binit(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.floor(v / 60000.0).astype(np.int64)
        return pa.table({"bin": b, "n": np.ones(len(b), np.int64)})

    return partial_agg(ds.map_batches(binit, batch_format="pyarrow"),
                       ["bin"], [("n", "sum", "n")])


@query(
    "events_window_daily",
    """
    SELECT event_type,
           CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day_idx,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY event_type, day_idx
    """,
)
def events_window_daily(sf_dir: str):
    """Tumbling event-time window as a grouped aggregate (Ray Data has no
    watermarks; a window IS a groupby on floor(ts/size) — ray_guide.md)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = np.floor(us / 86400000000.0).astype(np.int64)
        out = cents(t, "value", "sum_cents")
        out = out.append_column("day_idx", pa.array(day))
        return out.append_column("n", pa.array(np.ones(len(t), np.int64))) \
                  .select(["event_type", "day_idx", "n", "sum_cents"])

    return partial_agg(ds.map_batches(win, batch_format="pyarrow"),
                       ["event_type", "day_idx"],
                       [("n", "sum", "n"), ("sum_cents", "sum", "sum_cents")])


@query(
    "reclass_quantity",
    """
    SELECT CAST(CASE WHEN l_quantity < 10 THEN 1 WHEN l_quantity < 20 THEN 2
                WHEN l_quantity < 30 THEN 3 WHEN l_quantity < 40 THEN 4
                ELSE 5 END AS BIGINT) AS class, COUNT(*) AS n
    FROM lineitem
    GROUP BY class
    """,
)
def reclass_quantity(sf_dir: str):
    """M1 reclass (gis_analysis/reclass.rs): vectorized np.digitize with the
    same half-open [lo, hi) intervals as the CASE ladder."""
    ds = read_table(sf_dir, "lineitem", columns=["l_quantity"])

    def rc(t: pa.Table) -> pa.Table:
        v = t["l_quantity"].to_numpy(zero_copy_only=False)
        cls = np.digitize(v, [10.0, 20.0, 30.0, 40.0]) + 1
        return pa.table({"class": cls.astype(np.int64), "n": np.ones(len(v), np.int64)})

    return partial_agg(ds.map_batches(rc, batch_format="pyarrow"), ["class"],
                       [("n", "sum", "n")])


@query(
    "sample_hash",
    """
    SELECT event_id FROM events
    WHERE (event_id * 2654435761) % 1000 < 50
    """,
)
def sample_hash(sf_dir: str):
    """SA deterministic sampling (RandomSample analog): counter-based hash
    filter keyed on the id — identical membership at any parallelism."""
    ds = read_table(sf_dir, "events", columns=["event_id"])

    def samp(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        keep = (ids * np.int64(2654435761)) % np.int64(1000) < 50
        return t.filter(pa.array(keep))

    return ds.map_batches(samp, batch_format="pyarrow")


@query(
    "exact_quantiles_value",
    """
    SELECT quantile_disc(value, 0.01) AS q01, quantile_disc(value, 0.25) AS q25,
           quantile_disc(value, 0.50) AS q50, quantile_disc(value, 0.75) AS q75,
           quantile_disc(value, 0.99) AS q99
    FROM events
    """,
)
def exact_quantiles_value(sf_dir: str):
    """EXACT distributed quantiles over an unbounded column: global
    ``ds.sort`` (range-partitioned shuffle) + ``split_at_indices`` row picks
    — scales where a per-group in-memory sort cannot (Quantiles,
    math_stat_analysis/quantiles.rs). Discrete index = ceil(q*n)-1
    (DuckDB quantile_disc semantics)."""
    ds = read_table(sf_dir, "events", columns=["value"]).sort("value")
    n = ds.count()
    qs = [0.01, 0.25, 0.50, 0.75, 0.99]
    idxs = [int(np.ceil(q * n)) - 1 for q in qs]
    vals = []
    pieces = ds.split_at_indices(idxs)
    # the target row is the FIRST row of each piece after the split point
    for piece in pieces[1:]:
        vals.append(piece.take(1)[0]["value"])
    # split_at_indices gives pieces starting AT idx; element idx = first of piece i+1
    out = {f"q{int(q * 100):02d}": [v] for q, v in zip(qs, vals)}
    return pd.DataFrame(out)


# populate the registry with the other operator families
from . import queries_spatial  # noqa: E402,F401
from . import queries_text  # noqa: E402,F401
from . import queries_raster  # noqa: E402,F401
from . import queries_more  # noqa: E402,F401
from . import queries_overlay  # noqa: E402,F401
from . import queries_filters  # noqa: E402,F401
from . import queries_filters2  # noqa: E402,F401
from . import queries_hydro2  # noqa: E402,F401
from . import queries_vector2  # noqa: E402,F401
from . import queries_overlay2  # noqa: E402,F401
from . import queries_mathops  # noqa: E402,F401
from . import queries_filters3  # noqa: E402,F401
from . import queries_stream2  # noqa: E402,F401
from . import queries_text2  # noqa: E402,F401
from . import queries_hydro3  # noqa: E402,F401
from . import queries_mathops2  # noqa: E402,F401
from . import queries_image4  # noqa: E402,F401
from . import queries_data2  # noqa: E402,F401
from . import queries_terrain2  # noqa: E402,F401
from . import queries_lidar2  # noqa: E402,F401
from . import queries_shape2  # noqa: E402,F401
from . import queries_clip2  # noqa: E402,F401
from . import queries_hydro4  # noqa: E402,F401
from . import queries_terrain3  # noqa: E402,F401
from . import queries_data3  # noqa: E402,F401
from . import queries_mathops3  # noqa: E402,F401
from . import queries_vector3  # noqa: E402,F401
from . import queries_hydro5  # noqa: E402,F401
from . import queries_terrain4  # noqa: E402,F401
from . import queries_terrain5  # noqa: E402,F401
from . import queries_terrain6  # noqa: E402,F401
from . import queries_image5  # noqa: E402,F401
from . import queries_hydro6  # noqa: E402,F401
from . import queries_lidar3  # noqa: E402,F401
from . import queries_terrain7  # noqa: E402,F401
from . import queries_image6  # noqa: E402,F401
from . import queries_shape3  # noqa: E402,F401
from . import queries_terrain8  # noqa: E402,F401
from . import queries_hydro7  # noqa: E402,F401
from . import queries_terrain9  # noqa: E402,F401
from . import queries_mathops4  # noqa: E402,F401
from . import queries_hydro8  # noqa: E402,F401
from . import queries_terrain10  # noqa: E402,F401
from . import queries_hydro9  # noqa: E402,F401
from . import queries_data4  # noqa: E402,F401
from . import queries_mathops5  # noqa: E402,F401
from . import queries_terrain11  # noqa: E402,F401
from . import queries_lidar4  # noqa: E402,F401
from . import queries_terrain12  # noqa: E402,F401
from . import queries_hydro10  # noqa: E402,F401
from . import queries_terrain13  # noqa: E402,F401
from . import queries_vector4  # noqa: E402,F401
from . import queries_plugins  # noqa: E402,F401
from . import queries_media2  # noqa: E402,F401
from . import queries_curation  # noqa: E402,F401
from . import queries_joins  # noqa: E402,F401
