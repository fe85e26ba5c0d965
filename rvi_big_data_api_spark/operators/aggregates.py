"""Aggregation operators (SURVEY.md §2.4).

The reference's fleet rollups were per-VIN RDD aggregations written back to
Cassandra (SURVEY.md §3.1 [P:med]); every operator here is a declarative
groupBy/agg so Catalyst plans a partial (map-side) + final HashAggregate —
the shuffle carries pre-combined groups, not raw rows, which is what keeps a
100 TB aggregation's shuffle volume proportional to group cardinality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..io import load
from ..registry import query

# Flagship: TPC-H Q1 shape — the fixture analogue of the reference's daily
# fleet rollup (per-channel sums/averages over a time-bounded scan).
PRICING_SUMMARY_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 4)                                        AS avg_qty,
  round(avg(l_extendedprice), 4)                                   AS avg_price,
  round(avg(l_discount), 4)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_pricing_summary", oracle=PRICING_SUMMARY_ORACLE, tags=("agg", "flagship"))
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary rollup (TPC-H Q1 shape): grouped sums/avgs/count over a
    shipdate-bounded lineitem scan. Filter + column pruning reach the parquet
    scan; one shuffle on the 6-value group key."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_basic",
    oracle="""
    SELECT user_id,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value,
           round(avg(value), 4) AS avg_value,
           min(value)           AS min_value,
           max(value)           AS max_value
    FROM events GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key stats (per-VIN report stats in the reference). min/max are
    order-independent so stay unrounded; sum/avg are rounded (§1 gotcha 2)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group (distinct active VINs per channel). Catalyst
    expands this to a two-phase aggregate; at 100 TB prefer
    `agg_approx_distinct` unless exactness is contractual."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events"))
    )


@query("agg_approx_distinct", oracle=None, tags=("agg", "rows-only"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct at scale (rows-only: approximate result has no exact SQL
    twin). rsd=0.02 — constant-size sketch per group regardless of data
    volume, the 100 TB answer to count-distinct."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_value,
           count(CASE WHEN event_type = 'click' THEN 1 END)               AS n_clicks,
           count(CASE WHEN event_type = 'error' THEN 1 END)               AS n_errors,
           round(avg(CASE WHEN event_type = 'view' THEN value END), 4)    AS avg_view_value
    FROM events GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates — one pass builds a wide per-channel metric row
    (the reference's per-channel columns) instead of N filtered scans."""
    ev = load(spark, sf_dir, "events")
    t = F.col("event_type")
    return ev.groupBy("user_id").agg(
        F.round(F.sum(F.when(t == "purchase", F.col("value"))), 2).alias("purchase_value"),
        F.count(F.when(t == "click", F.lit(1))).alias("n_clicks"),
        F.count(F.when(t == "error", F.lit(1))).alias("n_errors"),
        F.round(F.avg(F.when(t == "view", F.col("value"))), 4).alias("avg_view_value"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(r.r_name, 'ALL')  AS region_name,
           coalesce(n.n_name, 'ALL')  AS nation_name,
           grouping(r.r_name)         AS g_region,
           grouping(n.n_name)         AS g_nation,
           count(*)                   AS n_customers,
           round(sum(c.c_acctbal), 2) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region → nation → grand total; grouping() flags
    distinguish subtotal rows from data rows."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    ).select(
        F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
        F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
        "g_region",
        "g_nation",
        "n_customers",
        "sum_acctbal",
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(c.c_mktsegment, 'ALL')    AS segment,
           coalesce(o.o_orderpriority, 'ALL') AS priority,
           grouping(c.c_mktsegment)           AS g_segment,
           grouping(o.o_orderpriority)        AS g_priority,
           count(*)                           AS n_orders,
           round(sum(o.o_totalprice), 2)      AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY CUBE (c.c_mktsegment, o.o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-combination subtotals over segment × priority."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return joined.cube("c_mktsegment", "o_orderpriority").agg(
        F.grouping("c_mktsegment").cast("int").alias("g_segment"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    ).select(
        F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
        "g_segment",
        "g_priority",
        "n_orders",
        "total_price",
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(event_type, 'ALL')                       AS event_type,
           coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           count(*)                                          AS n_events,
           round(sum(value), 2)                              AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL entry point (SURVEY.md §3.3): totals
    by type, by day, and grand total in one pass."""
    load(spark, sf_dir, "events").createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL')                              AS event_type,
               coalesce(date_format(date_trunc('day', ts), 'yyyy-MM-dd'), 'ALL') AS day,
               count(*)                                                 AS n_events,
               round(sum(value), 2)                                     AS sum_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
        """
    )


@query(
    "agg_grouping_sets_df",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
           count(*)::BIGINT AS n_items,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets via the Spark 4 DataFrame API (`DataFrame.groupingSets`,
    added in 4.0 — VERDICT r4 item 8's named gap): the same multi-set
    aggregation `agg_grouping_sets` declares through SQL, expressed without
    a temp view, plus `grouping_id()` to disambiguate which set produced
    each row (a coalesced 'ALL' cannot distinguish a genuine NULL group from
    a rollup row; the bitmask can — both engines define it as one bit per
    grouping column, MSB-first).

    Plan is identical to the SQL form: ONE scan + Expand (one row per
    grouping set per input row) + a single partial/final hash aggregate —
    grouping sets add replication factor, never extra passes; at 100 TB the
    Expand×3 cost is the declared price of three rollup granularities in
    one shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_items",
            "sum_price",
        )
    )


@query(
    "agg_collect",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type, event_id) AS type_trace,
           count(*) AS n_events
    FROM events
    WHERE user_id < 20
    GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordered trace assembly (trip trace in the reference).
    collect_list is shuffle-order-nondeterministic, so the list is sorted
    before joining to a string (§1 gotcha 3)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.struct("event_type", "event_id"))).getField("event_type"),
            ",",
        ).alias("type_trace"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per channel (speed percentiles in the
    reference). Exact percentile sorts per group — fine for bounded group
    count; at 100 TB switch to percentile_approx (rows-only twin)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.9), 4).alias("p90"),
        F.round(F.percentile("value", 0.99), 4).alias("p99"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 4) AS sd_value,
           round(var_samp(value), 4)    AS var_value,
           round(corr(value, json_extract_string(props, '$.k')::INT), 4)  AS corr_vk,
           round(covar_samp(value, json_extract_string(props, '$.k')::INT), 4) AS covar_vk
    FROM events GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics, with the JSON payload field as the second
    variable (channel reading vs payload k)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(F.corr("value", "k"), 4).alias("corr_vk"),
        F.round(F.covar_samp("value", "k"), 4).alias("covar_vk"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    WITH mx AS (
        SELECT user_id, max(value) AS peak_value, min(value) AS low_value
        FROM events GROUP BY user_id
    )
    SELECT mx.user_id,
           max(CASE WHEN e.value = mx.peak_value THEN e.event_id END) AS peak_event,
           mx.peak_value,
           max(CASE WHEN e.value = mx.low_value THEN e.event_id END) AS low_event,
           mx.low_value
    FROM events e JOIN mx ON e.user_id = mx.user_id
    GROUP BY mx.user_id, mx.peak_value, mx.low_value
    """,
    tags=("agg",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row achieving the extreme (peak-speed report per vehicle) — max_by /
    min_by, no self-join needed.

    `value` has duplicate readings, so a bare max_by is nondeterministic under
    ties; a lexicographic struct key pins the winner to the highest event_id.
    DuckDB 1.0's arg_max has no composite-key form, so the twin uses the
    group-max + conditional-max formulation instead."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", F.struct("value", "event_id")).alias("peak_event"),
        F.max("value").alias("peak_value"),
        F.min_by("event_id", F.struct("value", (-F.col("event_id")).alias("neg_id"))).alias("low_event"),
        F.min("value").alias("low_value"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           count(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           count(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot channel → columns (the reference's channel matrix). Pivot values
    are passed explicitly — never let Spark scan for them at 100 TB."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@query(
    "agg_global",
    oracle="""
    SELECT count(*)                      AS n_lines,
           round(sum(l_extendedprice), 2) AS sum_price,
           round(avg(l_discount), 6)      AS avg_discount,
           count(DISTINCT l_orderkey)     AS n_orders
    FROM lineitem
    """,
    tags=("agg",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand totals, no grouping — partial aggregation reduces each partition
    to one row before the single-row final combine."""
    return load(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT event_type,
           least(floor(value / 50.0)::INT, 9) AS bin,
           count(*)                           AS n,
           round(min(value), 6)               AS bin_min,
           round(max(value), 6)               AS bin_max
    FROM events
    GROUP BY event_type, bin
    """,
    tags=("agg",),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (10 bins of 50, top bin open-ended) of readings
    per channel — the dashboard distribution view, computed as a plain
    grouped aggregate so the shuffle carries one row per (channel, bin)."""
    ev = load(spark, sf_dir, "events")
    bin_col = F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(9))
    return ev.groupBy("event_type", bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("bin_min"),
        F.round(F.max("value"), 6).alias("bin_max"),
    )


@query(
    "agg_unpivot",
    oracle="""
    WITH wide AS (
        SELECT user_id,
               count(CASE WHEN event_type = 'click'    THEN 1 END)::BIGINT AS n_click,
               count(CASE WHEN event_type = 'view'     THEN 1 END)::BIGINT AS n_view,
               count(CASE WHEN event_type = 'purchase' THEN 1 END)::BIGINT AS n_purchase
        FROM events GROUP BY user_id
    )
    SELECT user_id, metric, n FROM wide
    UNPIVOT (n FOR metric IN (n_click, n_view, n_purchase))
    """,
    tags=("agg",),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — the inverse of agg_pivot: a wide per-vehicle metric row
    back to tidy (key, metric, value) triples, the shape every downstream
    plotting/ML pipeline wants. Spark's `unpivot` (melt) plans as a
    generator Expand — map-only over the aggregated input, no extra
    shuffle. NB: UNPIVOT drops NULL cells in both engines; the counts here
    are never NULL, so the twin stays exact."""
    ev = load(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["n_click", "n_view", "n_purchase"],
        variableColumnName="metric",
        valueColumnName="n",
    )


PROFILE_NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount")
PROFILE_STR_COLS = ("l_returnflag", "l_linestatus")


@query(
    "profile_table",
    oracle="""
    SELECT 'l_quantity' AS column_name, count(*) AS n_rows,
           sum((l_quantity IS NULL)::INT)::BIGINT AS n_nulls,
           count(DISTINCT l_quantity)::BIGINT AS n_distinct,
           min(l_quantity)::DECIMAL(18,2)::VARCHAR AS min_repr,
           max(l_quantity)::DECIMAL(18,2)::VARCHAR AS max_repr
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*), sum((l_extendedprice IS NULL)::INT)::BIGINT,
           count(DISTINCT l_extendedprice)::BIGINT,
           min(l_extendedprice)::DECIMAL(18,2)::VARCHAR,
           max(l_extendedprice)::DECIMAL(18,2)::VARCHAR
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*), sum((l_discount IS NULL)::INT)::BIGINT,
           count(DISTINCT l_discount)::BIGINT,
           min(l_discount)::DECIMAL(18,2)::VARCHAR,
           max(l_discount)::DECIMAL(18,2)::VARCHAR
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), sum((l_returnflag IS NULL)::INT)::BIGINT,
           count(DISTINCT l_returnflag)::BIGINT, min(l_returnflag), max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_linestatus', count(*), sum((l_linestatus IS NULL)::INT)::BIGINT,
           count(DISTINCT l_linestatus)::BIGINT, min(l_linestatus), max(l_linestatus)
    FROM lineitem
    """,
    tags=("agg",),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass — the first query anyone runs on an unknown 100 TB
    table: per-column row/null/distinct counts and min/max, as tidy rows.

    One SKINNY aggregate per column, unioned: each pass reads exactly one
    column (columnar pruning), so a single countDistinct plans as an
    ordinary two-stage hash distinct. The tempting "one wide agg with five
    countDistincts + stack()" formulation is 10-30× SLOWER: Catalyst
    rewrites multi-distinct via Expand ×(n+1) and falls back to
    SortAggregate over the expanded rows (measured 9-10 s vs 0.3-2.7 s at
    sf0.1). The truly-single-pass variant swaps in approx_count_distinct.
    Numeric extremes are rendered through DECIMAL(18,2) so both engines
    print identical strings (bare double→string formatting differs between
    JVM and DuckDB)."""
    import functools

    li = load(spark, sf_dir, "lineitem")

    def profile_col(c: str, numeric: bool) -> DataFrame:
        mn: Column = F.min(c)
        mx: Column = F.max(c)
        if numeric:
            mn = mn.cast("decimal(18,2)").cast("string")
            mx = mx.cast("decimal(18,2)").cast("string")
        return (
            li.select(c)
            .agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("int")).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                mn.alias("min_repr"),
                mx.alias("max_repr"),
            )
            .select("column_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")
        )

    parts = [profile_col(c, True) for c in PROFILE_NUM_COLS] + [
        profile_col(c, False) for c in PROFILE_STR_COLS
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


@query(
    "agg_moments",
    oracle="""
    WITH raw AS (
        SELECT event_type,
               count(*) AS n,
               avg(value)                         AS m1,
               avg(value * value)                 AS ex2,
               avg(value * value * value)         AS ex3,
               avg(value * value * value * value) AS ex4
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(m1, 4) AS mean,
           round(ex2 - m1 * m1, 4) AS var_pop,
           round((ex3 - 3 * m1 * ex2 + 2 * m1 * m1 * m1)
                 / nullif(pow(ex2 - m1 * m1, 1.5), 0), 4) AS skewness,
           round((ex4 - 4 * m1 * ex3 + 6 * m1 * m1 * ex2 - 3 * m1 * m1 * m1 * m1)
                 / nullif(pow(ex2 - m1 * m1, 2.0), 0) - 3, 4) AS kurtosis_excess
    FROM raw
    """,
    tags=("agg",),
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment statistics (variance, skewness, excess kurtosis) per
    channel — computed from RAW power sums in ONE pass, not Spark's
    skewness()/kurtosis() builtins: the builtins' estimator conventions
    (population vs sample, excess vs raw) differ between engines, while
    E[x^k] raw moments are the same arithmetic everywhere, so the twin is
    exact. Single partial-agg pass; divisions nullif-guarded; rounded at
    4 dp to absorb summation-order drift (the cancellation in m3/m4 is
    benign at fixture magnitudes)."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    raw = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("m1"),
        F.avg(v * v).alias("ex2"),
        F.avg(v * v * v).alias("ex3"),
        F.avg(v * v * v * v).alias("ex4"),
    )
    m1, ex2, ex3, ex4 = F.col("m1"), F.col("ex2"), F.col("ex3"), F.col("ex4")
    var = ex2 - m1 * m1
    m3 = ex3 - 3 * m1 * ex2 + 2 * m1 * m1 * m1
    m4 = ex4 - 4 * m1 * ex3 + 6 * m1 * m1 * ex2 - 3 * m1 * m1 * m1 * m1
    return raw.select(
        "event_type",
        "n",
        F.round(m1, 4).alias("mean"),
        F.round(var, 4).alias("var_pop"),
        F.round(m3 / F.nullif(F.pow(var, F.lit(1.5)), F.lit(0.0)), 4).alias("skewness"),
        F.round(m4 / F.nullif(F.pow(var, F.lit(2.0)), F.lit(0.0)) - 3, 4).alias(
            "kurtosis_excess"
        ),
    )


@query(
    "agg_entropy",
    oracle="""
    WITH cu AS (
        SELECT event_type, user_id, count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, sum(n)::BIGINT AS total, count(*)::BIGINT AS n_users
        FROM cu GROUP BY 1
    )
    SELECT c.event_type AS event_type,
           t.n_users AS n_users,
           round(-sum((c.n::DOUBLE / t.total) * ln(c.n::DOUBLE / t.total)), 6)
               AS entropy_nats
    FROM cu c JOIN tot t ON c.event_type = t.event_type
    GROUP BY 1, 2
    """,
    tags=("agg",),
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each channel's per-vehicle event distribution —
    the information-theoretic profile a training-mix planner reads (a
    uniform channel carries max entropy; a channel dominated by one vehicle
    is near zero).

    ONE shuffle, ONE scan: the (type,user) counts, the per-type totals
    (a window over the SAME event_type partitioning — no new exchange),
    and the entropy fold (a groupBy on the same key) all ride one
    hash-partition of the data. ln() is libm-identical in both engines on
    identical count-ratio doubles; the final 6-dp round absorbs
    summation-order drift (PARITY.md #8)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    cu = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    p = F.col("n") / F.col("total")
    return (
        cu.withColumn("total", F.sum("n").over(w))
        .withColumn("n_users", F.count(F.lit(1)).over(w))
        .groupBy("event_type", "n_users")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"))
    )


@query("agg_sketch_rollup", oracle=None, tags=("agg", "sketch", "rows-only"))
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the pre-aggregation pattern that makes
    100 TB distinct-count dashboards cheap: build one HyperLogLog sketch per
    (channel, day) cell ONCE (`hll_sketch_agg`), then answer the coarser
    per-channel question by UNIONING the stored binary sketches
    (`hll_union_agg`) instead of rescanning raw events. The per-cell sketch
    table is what a real pipeline persists; re-aggregation touches
    n_days × n_channels rows regardless of event volume.

    Emits per channel: exact distinct vehicles, the sketch-union estimate,
    and the summed per-day estimates (which OVERCOUNT revisiting vehicles —
    the error the mergeable union exists to avoid). Rows-only by design:
    DuckDB's approx_distinct is a different HLL implementation; Spark's
    Datasketches binary is seed-stable, so the output is deterministic
    across runs (the driver's re-run check still binds)."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct(F.col("user_id")).alias("exact_cell"),
    )
    return (
        cells.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_union"),
            F.sum(F.hll_sketch_estimate("sketch")).alias("est_summed_cells"),
        )
        .join(
            ev.groupBy("event_type").agg(
                F.count_distinct(F.col("user_id")).alias("exact_users")
            ),
            "event_type",
        )
        .select("event_type", "exact_users", "est_union", "est_summed_cells")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    WITH words AS (
        -- 63-bit words: bit 63 would overflow DuckDB's checked << (Spark
        -- wraps to the sign bit); 0..62 shifts are safe in both engines
        SELECT event_type, user_id // 63 AS word_idx,
               bit_or(1::BIGINT << (user_id % 63)::INT) AS word
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           sum(bit_count(word))::BIGINT AS n_distinct_users,
           count(*)::BIGINT AS n_words
    FROM words GROUP BY 1
    """,
    tags=("agg", "sketch"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps — the third point on
    the distinct-count spectrum after exact count_distinct (full shuffle of
    keys) and HLL (approximate, fixed size): dense integer keys pack into
    63-bit words with bit_or (bit 63 avoided: DuckDB's checked shift raises
    where Java wraps), a MERGEABLE aggregate, so pre-aggregated
    per-segment words re-aggregate into exact global counts without ever
    re-touching raw rows — same pattern as agg_sketch_rollup but exact
    (ClickHouse's groupBitmap / Roaring-bitmap trick in plain SQL).

    Shuffle carries one long per (group, word) — for a 10M-vehicle fleet
    that's 160 k words/group regardless of event volume. Pure integer bit
    math, identical in both engines."""
    ev = load(spark, sf_dir, "events")
    # `div` = exact integer floor division, matching DuckDB `//`; the
    # double-divide-then-cast form truncates instead of flooring for
    # negative ids and loses exactness above 2^53. Fixture ids are
    # non-negative, but the sketch shouldn't rely on that invariant.
    words = ev.groupBy(
        "event_type", F.expr("user_id div 63").alias("word_idx")
    ).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(user_id % 63 AS INT))")).alias("word")
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).alias("n_distinct_users"),
        F.count(F.lit(1)).alias("n_words"),
    )


@query(
    "agg_correlation",
    oracle="""
    WITH cells AS (
        SELECT user_id, day(ts) AS d,
               avg(CASE WHEN event_type = 'click' THEN value END) AS x,
               avg(CASE WHEN event_type = 'view'  THEN value END) AS y
        FROM events GROUP BY 1, 2
    ),
    sums AS (
        SELECT count(*)::BIGINT AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM cells WHERE x IS NOT NULL AND y IS NOT NULL
    )
    SELECT n,
           round((n * sxy - sx * sy)
                 / nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0.0),
                 6) AS corr_click_view
    FROM sums
    """,
    tags=("agg", "stats"),
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-channel correlation (does click intensity track view intensity
    per vehicle-day?) — computed from RAW power sums in one pass, NOT
    Spark's corr()/DuckDB's corr() builtins, whose estimator pipelines
    differ in evaluation order; Σx, Σy, Σxy, Σx², Σy² are the same
    arithmetic everywhere (the agg_moments discipline), so the twin is
    exact to the 6-dp round.

    Two partial-agg passes: (vehicle, day) cell averages, then one global
    fold of five sums — shuffle volume is cell count then one row."""
    ev = load(spark, sf_dir, "events")
    t = F.col("event_type")
    cells = ev.groupBy("user_id", F.dayofmonth("ts").alias("d")).agg(
        F.avg(F.when(t == "click", F.col("value"))).alias("x"),
        F.avg(F.when(t == "view", F.col("value"))).alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    sums = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)
    return sums.select(
        "n", F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("corr_click_view")
    )


# --- round 4: ordered string aggregation + in-flight query metrics ---------


@query(
    "agg_listagg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           len(string_split(string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus),
                            ','))::BIGINT AS n_statuses,
           count(*)::BIGINT AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("aggregation",),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — Spark 4's `listagg(DISTINCT x, sep)
    WITHIN GROUP (ORDER BY x)` (ANSI LISTAGG, = DuckDB string_agg): the
    report-friendly sibling of agg_collect's sorted array. The WITHIN GROUP
    clause is what makes the result deterministic under shuffle — bare
    listagg would concatenate in partition-arrival order, the exact
    nondeterminism a driver hash catches (PARITY.md #14 for collect_list).

    Plan: ObjectHashAggregate with a partial that carries per-group distinct
    sets; group count is small (5 priorities × ≤3 statuses), so the shuffled
    partial state is bytes per group regardless of input size. Engine
    caveat pinned here: Spark 4.1's RewriteDistinctAggregates miscompiles
    LISTAGG DISTINCT when MIXED with another distinct aggregate in the same
    group (AttributeReference→SortOrder ClassCastException), so the distinct
    cardinality is derived from the listagg string itself instead of a
    second count(DISTINCT) — same answer, one distinct rewrite."""
    o = load(spark, sf_dir, "orders")
    agged = spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               count(*) AS n_orders
        FROM {o} GROUP BY o_orderpriority
        """,
        o=o,
    )
    return agged.select(
        "o_orderpriority",
        "statuses",
        F.size(F.split("statuses", ",")).cast("long").alias("n_statuses"),
        "n_orders",
    )


@query(
    "observe_metrics",
    oracle="""
    SELECT count(*)::BIGINT AS n_rows,
           round(sum(value), 2) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("aggregation", "observability"),
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight query metrics via the Observation API (`df.observe`) — the
    production pattern for data-quality counters: metrics are computed as
    ACCUMULATORS inside the job that is already running (here a noop-sink
    pass over the filtered stage), costing zero extra scans — vs the naive
    `df.count(); df.agg(...)` re-run pattern, which at 100 TB doubles the
    read. The observed stage keeps its pushdown/pruning (the observe node
    is transparent to Catalyst's scan planning).

    The returned one-row frame is built from the observation result on the
    driver — metrics are driver-side by API design (accumulator merge), not
    a `.collect()` of data rows. The oracle recomputes the same aggregates
    relationally, proving the accumulator path exact."""
    from pyspark.sql import Observation

    ev = load(spark, sf_dir, "events")
    obs = Observation("quality_metrics")
    observed = ev.filter(F.col("event_type") == "purchase").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_value"], m["min_value"], m["max_value"])],
        "n_rows bigint, sum_value double, min_value double, max_value double",
    )


@query(
    "agg_boolean",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value > 200)::BIGINT AS n_over_200,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 400) AS any_extreme,
           round(count(*) FILTER (WHERE value > 200) / count(*), 4) AS frac_over_200
    FROM events GROUP BY event_type
    """,
    tags=("aggregation",),
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate family — `count_if`, `bool_and`
    (ANSI EVERY), `bool_or` (ANSI ANY): the data-quality assertion
    aggregates (\"are ALL readings non-negative? did ANY spike past the
    sensor ceiling?\") computed in one partial-aggregable pass. DuckDB's
    twin spells count_if as the ANSI FILTER clause — same semantics, both
    plan as conditional partial aggs; boolean partial state is one byte
    per group per predicate, so the 100 TB shuffle carries nothing."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 200).alias("n_over_200"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 400).alias("any_extreme"),
        F.round(
            F.count_if(F.col("value") > 200) / F.count(F.lit(1)), 4
        ).alias("frac_over_200"),
    )


# --- round 4 (third wave): deterministic mode ------------------------------


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
        SELECT event_type, floor(value)::BIGINT AS bucket, count(*)::BIGINT AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    ranked AS (
        SELECT event_type, bucket, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, bucket ASC) AS rn
        FROM counts
    )
    SELECT event_type, bucket AS mode_bucket, n AS n_occurrences
    FROM ranked WHERE rn = 1
    """,
    tags=("aggregation", "stats"),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode — the most frequent value bucket per
    channel, computed WITHOUT Spark's `mode()` / DuckDB's `mode()` builtins
    because both leave ties implementation-defined; here the tie-break is
    pinned (highest count, then smallest bucket) so the two engines cannot
    legally disagree. The same discipline agg_correlation applies to
    estimator pipelines, applied to order-sensitive aggregates.

    Scale shape: count groupBy with map-side partials (the bucket cast
    collapses the domain first), then a per-group rank over the tiny
    (group × bucket) count table — the heavy shuffle carries count
    partials, the window runs on the reduced frame."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    counts = ev.groupBy(
        "event_type", F.floor("value").cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("bucket"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bucket").alias("mode_bucket"),
            F.col("n").alias("n_occurrences"),
        )
    )


@query(
    "agg_transpose",
    oracle="""
    SELECT 'sum_value' AS key,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
    FROM events
    UNION ALL
    SELECT 'avg_value',
           round(avg(CASE WHEN event_type = 'click'    THEN value END), 4),
           round(avg(CASE WHEN event_type = 'error'    THEN value END), 4),
           round(avg(CASE WHEN event_type = 'purchase' THEN value END), 4),
           round(avg(CASE WHEN event_type = 'signup'   THEN value END), 4),
           round(avg(CASE WHEN event_type = 'view'     THEN value END), 4)
    FROM events
    UNION ALL
    SELECT 'n_events',
           sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::DOUBLE,
           sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::DOUBLE,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE,
           sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::DOUBLE,
           sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::DOUBLE
    FROM events
    """,
    tags=("agg", "reshape"),
)
def agg_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-matrix transpose — `DataFrame.transpose` (Spark 4), the
    reshape that turns a (group × metrics) summary into the
    (metric × groups) layout dashboards and diff reports want. The input
    is first reduced to one row per channel (partial-agg groupBy), so the
    transpose operates on a tiny driver-sized frame — transpose is a
    PRESENTATION op for reduced summaries, never for raw data (its column
    count is the row count of its input).

    The channel domain {click,error,purchase,signup,view} is a fixture
    invariant [F]; the twin pivots the same five columns with conditional
    aggregates and stacks the metric rows with UNION ALL. All metric cells
    are cast/rounded to DOUBLE on both sides (transpose requires one
    common value type — the least-common-type coercion is the API's
    documented contract)."""
    stats = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count(F.lit(1)).cast("double").alias("n_events"),
        )
    )
    return stats.transpose()


DISTINCT_SALT_N = 32  # phase-1 fan-out for the exact-distinct rewrite


@query(
    "agg_distinct_salted",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS n_users,
           count(*)::BIGINT AS n_events
    FROM events GROUP BY event_type
    """,
    tags=("agg", "scale"),
)
def agg_distinct_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) via the two-phase salted rewrite — the
    skew-proof form of `agg_count_distinct` for hot grouping keys: a plain
    per-type distinct forces every (type, user) pair of a hot type through
    ONE reducer; salting by hash(user_id) % DISTINCT_SALT_N splits each
    type's distinct-set across DISTINCT_SALT_N reducers, each counting its
    OWN users exactly (a user lands in exactly one salt bucket, so the
    phase-2 sum over buckets is exact, not approximate — the property that
    makes this rewrite correct where salting a MAX or a MEDIAN would not
    be). Phase 2 aggregates a (n_types × SALT_N)-row table — negligible.

    The salt must hash the DISTINCT column, never a random number: rand()
    would scatter one user across buckets and double-count. The plain
    count(*) rides along in phase 1 to show the rewrite composes with
    algebraic aggregates at zero extra cost. events has 5 event types ×
    10⁴⁺ users each — exactly the hot-key shape; at 100 TB the same two
    shuffles carry (type, salt)-sized then SALT_N-sized rows."""
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn(
        "salt", F.pmod(F.xxhash64("user_id"), F.lit(DISTINCT_SALT_N))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.countDistinct("user_id").alias("nd"),
        F.count(F.lit(1)).alias("nr"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("nd").alias("n_users"),
        F.sum("nr").alias("n_events"),
    )


@query(
    "agg_theta_retention",
    oracle="""
    WITH du AS (SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                       user_id
                FROM events),
    days AS (SELECT day, lead(day) OVER (ORDER BY day) AS nday
             FROM (SELECT DISTINCT day FROM du)),
    pair AS (SELECT day, nday FROM days WHERE nday IS NOT NULL),
    cur AS (SELECT p.day, u.user_id FROM pair p JOIN du u ON u.day = p.day),
    nxt AS (SELECT p.day, u.user_id FROM pair p JOIN du u ON u.day = p.nday),
    f AS (SELECT coalesce(c.day, n.day) AS day,
                 coalesce(c.user_id, n.user_id) AS user_id,
                 (c.user_id IS NOT NULL) AS in_cur,
                 (n.user_id IS NOT NULL) AS in_nxt
          FROM cur c FULL JOIN nxt n
            ON c.day = n.day AND c.user_id = n.user_id)
    SELECT day,
           count(*)::BIGINT AS n_union,
           sum((in_cur AND in_nxt)::INT)::BIGINT AS n_retained,
           sum((in_cur AND NOT in_nxt)::INT)::BIGINT AS n_churned,
           sum((in_nxt AND NOT in_cur)::INT)::BIGINT AS n_new
    FROM f GROUP BY day
    """,
    tags=("agg", "sketch", "spark4"),
)
def agg_theta_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience set algebra via Theta sketches — the operation
    HLL cannot do: HLL unions but never intersects/differences, while Theta
    (Datasketches) supports the full algebra, so retained / churned / new
    audiences come from STORED per-day sketches instead of re-joining raw
    events (`theta_union` / `theta_intersection` / `theta_difference`).

    100 TB shape: the only pass over raw events is the per-day
    `theta_sketch_agg` partial aggregate — the shuffle carries ~4 KB sketch
    payloads per (day) cell, not user-id sets. The adjacent-day pairing is a
    `lead()` window over n_days sketch rows (driver-scale; a real pipeline
    persists the sketch table and pairs arbitrary date ranges the same way).
    Contrast with `retention_cohort` (exact self-join formulation) and
    `agg_sketch_rollup` (HLL union-only rollup).

    Exactness contract: Theta sketches are EXACT below their nominal-entries
    threshold (default lgK=12 → 4096 retained hashes). The fixture's daily
    audiences (≤1500 distinct users at sf0.1) stay in exact mode, so the
    estimates equal the exact set sizes and the DuckDB full-join oracle
    hash-matches; past ~4k distinct users per cell the op degrades
    gracefully to ±1.6 % estimates (the production trade at 100 TB)."""
    ev = load(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    sk = ev.groupBy("day").agg(F.theta_sketch_agg("user_id").alias("sk"))
    w = Window.orderBy("day")
    pair = sk.withColumn("nsk", F.lead("sk").over(w)).filter(F.col("nsk").isNotNull())
    est = lambda c: F.round(F.theta_sketch_estimate(c)).cast("long")  # noqa: E731
    return pair.select(
        "day",
        est(F.theta_union("sk", "nsk")).alias("n_union"),
        est(F.theta_intersection("sk", "nsk")).alias("n_retained"),
        est(F.theta_difference("sk", "nsk")).alias("n_churned"),
        est(F.theta_difference("nsk", "sk")).alias("n_new"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH wts AS (
        SELECT event_type, event_id, value, 1 + user_id % 3 AS w
        FROM events
    ),
    cum AS (
        SELECT event_type, value, w,
               sum(w) OVER (PARTITION BY event_type ORDER BY value, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cw,
               sum(w) OVER (PARTITION BY event_type)::BIGINT AS tot
        FROM wts
    )
    SELECT event_type,
           min(CASE WHEN cw >= tot / 2.0 THEN value END) AS w_median,
           min(tot)::BIGINT AS total_weight
    FROM cum GROUP BY event_type
    """,
    tags=("agg",),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per channel — the robust center percentile()/median()
    cannot give when observations carry unequal weights (sampling weights,
    dwell times, repetition counts; here a deterministic 1 + user_id % 3
    stands in): the smallest value whose cumulative weight reaches half the
    group's total. No built-in computes this in either engine — it falls
    out of window algebra: ordered running weight sum + per-group total
    (two frames over ONE event_type shuffle, the win_running discipline),
    then a conditional min. The selected value is an exact row passthrough
    and the cw >= tot/2 comparison is integer-vs-exact-half — no float
    rounding anywhere (PARITY rule 1). Ties on value order by event_id
    identically in both dialects.

    At 100 TB: same single shuffle on the group key; for a driver-sized
    group count the alternative two-pass percentile_approx-style estimate
    trades exactness for one less sort — this exact form is the oracle-able
    contract."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "event_id", "value", (1 + F.col("user_id") % 3).alias("w")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = ev.select(
        "event_type",
        "value",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_all).alias("tot"),
    )
    return cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cw") >= F.col("tot") / 2.0, F.col("value"))).alias("w_median"),
        F.min("tot").alias("total_weight"),
    )


@query(
    "agg_gini",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value ASC, event_id ASC) AS i
        FROM events
    )
    SELECT event_type,
           count(*)::BIGINT AS n,
           round((2.0 * sum(i * value) - (count(*) + 1) * sum(value))
                 / (count(*) * sum(value)), 6) AS gini
    FROM ranked GROUP BY event_type
    """,
    tags=("agg", "stats"),
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient per channel — the concentration summary behind
    source-mix and contribution-inequality monitors (is 1% of vehicles
    producing 90% of the volume? is one source dominating the token
    budget?): G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) over the ascending sort,
    the exact finite-sample formula — no builtin computes it in either
    engine, but it falls out of one rank window + one aggregate.

    Tie order among equal values cannot change the statistic (Σ i·x over a
    run of equal x is order-invariant), so the event_id tiebreak is for the
    window's determinism, not the result's. One shuffle on the group key
    (the win_running discipline); the multiply-accumulate stays integer ×
    double until the single final division, rounded 6 dp."""
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    ranked = (
        load(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .withColumn("i", F.row_number().over(w))
    )
    n = F.count(F.lit(1))
    return ranked.groupBy("event_type").agg(
        n.alias("n"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("value")) - (n + 1) * F.sum("value"))
            / (n * F.sum("value")),
            6,
        ).alias("gini"),
    )


APPROX_TOPK_K = 3  # channels reported by the sketch rollup


@query(
    "agg_approx_top_k",
    oracle=f"""
    SELECT event_type AS item, count(*)::BIGINT AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, item LIMIT {APPROX_TOPK_K}
    """,
    tags=("aggregate", "sketch"),
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter top-k via Spark 4's `approx_top_k` sketch — the
    mergeable frequent-items summary (Apache DataSketches frequent-items
    under the hood) that answers "top channels/domains/tokens" over 100 TB
    WITHOUT shuffling the full key space: each partition folds into a
    bounded sketch, sketches merge associatively on the reduce side, and
    only the k winners materialize.

    Exactness contract that makes this oracle-checkable: with
    maxItemsTracked ≥ the number of distinct keys (5 channels here,
    bounded by the fixture schema), the sketch degenerates to exact
    counting, so the top-k equals the exact groupBy top-k — verified
    tie-free at sf 0.001/0.01/0.1 so the selection is unambiguous.
    Production sizing keeps maxItemsTracked ≥ ~k·ε⁻¹ and accepts
    approximate counts; profile_key_skew is the exact-audit twin."""
    ev = load(spark, sf_dir, "events")
    sk = ev.agg(
        F.expr(f"approx_top_k(event_type, {APPROX_TOPK_K}, 1000)").alias("topk")
    )
    return (
        sk.select(F.explode("topk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("n"),
        )
    )


@query(
    "profile_crosstab",
    oracle="""
    SELECT event_type AS event_type_dow,
           sum(CASE WHEN dayofweek(ts) + 1 = 1 THEN 1 ELSE 0 END)::BIGINT AS "1",
           sum(CASE WHEN dayofweek(ts) + 1 = 2 THEN 1 ELSE 0 END)::BIGINT AS "2",
           sum(CASE WHEN dayofweek(ts) + 1 = 3 THEN 1 ELSE 0 END)::BIGINT AS "3",
           sum(CASE WHEN dayofweek(ts) + 1 = 4 THEN 1 ELSE 0 END)::BIGINT AS "4",
           sum(CASE WHEN dayofweek(ts) + 1 = 5 THEN 1 ELSE 0 END)::BIGINT AS "5",
           sum(CASE WHEN dayofweek(ts) + 1 = 6 THEN 1 ELSE 0 END)::BIGINT AS "6",
           sum(CASE WHEN dayofweek(ts) + 1 = 7 THEN 1 ELSE 0 END)::BIGINT AS "7"
    FROM events GROUP BY event_type
    """,
    tags=("aggregate", "profiling"),
)
def profile_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table via `DataFrameStatFunctions.crosstab` — the
    channel × day-of-week activity matrix, i.e. the chi-square
    independence input and the quick categorical-drift eyeball every
    pipeline report carries. Spark pivots the second categorical into
    columns named by its VALUES ("1".."7" — Sunday=1, Spark's dayofweek
    convention; DuckDB's is Sunday=0, shifted in the twin).

    crosstab is a groupBy(both keys)+pivot under the hood: partial-agg
    friendly, one shuffle on the pair key, output bounded by
    |channels|×|weekdays|. The column-per-value shape is only sane for
    SMALL second cardinalities — for unbounded keys use the long-form
    groupBy (agg_pivot's documented rule)."""
    ev = load(spark, sf_dir, "events").withColumn("dow", F.dayofweek("ts"))
    ct = ev.stat.crosstab("event_type", "dow")
    return ct.select(
        "event_type_dow", *[F.col(f"`{d}`").cast("long").alias(str(d)) for d in range(1, 8)]
    )


@query(
    "agg_bitops",
    oracle="""
    SELECT event_type,
           bit_and(event_id % 4096)::BIGINT AS flags_all,
           bit_or(event_id % 4096)::BIGINT AS flags_any,
           bit_xor(event_id % 4096)::BIGINT AS flags_parity,
           count(*)::BIGINT AS n
    FROM events GROUP BY event_type
    """,
    tags=("aggregate", "bitwise"),
)
def agg_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AGGREGATES (bit_and / bit_or / bit_xor) — the flag-word
    rollup: given a per-event permission/feature bitmask, which bits hold
    for EVERY event of a channel (and-fold), for ANY event (or-fold), and
    the xor parity word (the checksum shape CDC reconciliation uses to
    detect dropped-or-duplicated rows cheaply: xor of a multiset is
    order-free and self-canceling).

    All three are commutative/associative single-word folds — perfect
    partial aggregation, the shuffle carries one 8-byte word per
    (partition, group). Both engines implement them natively; the mask is
    integer arithmetic so the fold is exact. fn_bitwise covers the scalar
    operators; this is the aggregate half of that family."""
    ev = load(spark, sf_dir, "events")
    mask = (F.col("event_id") % 4096).alias("mask")
    return ev.select("event_type", mask).groupBy("event_type").agg(
        F.bit_and("mask").cast("long").alias("flags_all"),
        F.bit_or("mask").cast("long").alias("flags_any"),
        F.bit_xor("mask").cast("long").alias("flags_parity"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Hash sketches with EXACT SQL twins (round 7). Most sketch literature stops
# at "approximate, so unverifiable"; these two are deterministic given the
# md5 hash discipline (PARITY rule 18 family), so the full sketch —
# build, probe, and error — hash-matches DuckDB exactly. That turns the
# sketch itself into a contract-checkable operator instead of a rows-only
# demo (the agg_approx_distinct / agg_sketch_rollup caveat, PARITY rule 22,
# does not apply: nothing here estimates — CMS/Bloom arithmetic is exact
# integer math over deterministic hashes; only the INTERPRETATION is
# approximate, and the error columns quantify it).
# ---------------------------------------------------------------------------

CMS_D = 4  # count-min depth (independent hash rows)
CMS_W = 64  # count-min width (buckets per row) — deliberately << n_keys so
#             collisions (and hence visible over-estimates) occur at sf0.01
CMS_PROBES = 25  # heavy-hitter keys probed against the sketch


# CMS row-hash discipline: hex slice [8j+1, 8j+8] of ONE md5('c:'||key) mod
# CMS_W — the 32 md5 hex chars carry four independent 32-bit words, so all
# CMS_D row-hashes cost a single digest per input row (measured at the 100x
# decade: a per-(row, j) md5 formulation spent 117 s hashing 10M events x 4
# rows; one-digest slicing removes 3/4 of the digest work and the string
# building). Each slice is BIGINT-safe (< 2^32) and byte-identical to the
# DuckDB twin (feature_hashing's discipline).


@query(
    "agg_countmin",
    oracle=f"""
    WITH ev AS (SELECT user_id, md5('c:' || user_id::VARCHAR) AS h FROM events),
    cells AS (
        SELECT j,
               (('0x' || substr(h, j * 8 + 1, 8))::BIGINT % {CMS_W}) AS bucket,
               count(*)::BIGINT AS cell_n
        FROM ev CROSS JOIN range({CMS_D}) AS r(j)
        GROUP BY 1, 2
    ),
    truth AS (SELECT user_id, any_value(h) AS h, count(*)::BIGINT AS true_n
              FROM ev GROUP BY 1),
    probes AS (
        SELECT user_id, h, true_n FROM (
            SELECT user_id, h, true_n,
                   row_number() OVER (ORDER BY true_n DESC, user_id ASC) AS rk
            FROM truth
        ) WHERE rk <= {CMS_PROBES}
    )
    SELECT p.user_id, p.true_n, min(c.cell_n)::BIGINT AS cms_n,
           (min(c.cell_n) - p.true_n)::BIGINT AS over_n
    FROM probes p
    CROSS JOIN range({CMS_D}) AS r(j)
    JOIN cells c
      ON c.j = r.j
     AND c.bucket = (('0x' || substr(p.h, r.j * 8 + 1, 8))::BIGINT % {CMS_W})
    GROUP BY p.user_id, p.true_n
    """,
    tags=("agg", "sketch"),
)
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch — the constant-memory frequency table: d={CMS_D}
    hash rows x w={CMS_W} buckets of exact counters, point-queried as
    est(key) = min over rows of cell[j][h_j(key)]. The estimate can only
    OVER-count (collisions add, never subtract), so `over_n >= 0` always
    — pinned by a property test — and the probe emits (true_n, cms_n,
    over_n) side by side so the collision error is itself hash-checked.

    Why this matters at 100 TB: the sketch build is ONE groupBy over
    (row, bucket) — d*w = {CMS_D}*{CMS_W} cells REGARDLESS of corpus
    size, perfect partial aggregation (each executor folds its partition
    into the same 256 cells map-side; the shuffle carries 256 rows per
    partition, total). Frequency estimation over any key universe at any
    scale costs a constant-size state merge — the same monoid shape
    Spark's own partial aggs use, expressed in plan algebra. Probing
    broadcasts the 256-cell table; probe keys here are the fixture's top
    heavy hitters (a window-top-{CMS_PROBES} — in production the probe
    list arrives as its own input). The estimate-vs-truth comparison is
    only possible at test scale, which is exactly the point of the
    oracle: the sketch ARITHMETIC (deterministic md5 row-hashes, integer
    cells, min-fold) is verified exactly; at 100 TB only the truth side
    grows."""
    digest = F.md5(
        F.concat(F.lit("c:"), F.col("user_id").cast("string")).cast("binary")
    )
    ev = load(spark, sf_dir, "events").select("user_id", digest.alias("h"))
    js = F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j")
    slice_bucket = (
        F.conv(F.substring(F.col("h"), F.col("j") * 8 + 1, 8), 16, 10).cast("long")
        % CMS_W
    )
    cells = (
        ev.select("h", js)
        .groupBy("j", slice_bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )
    truth = ev.groupBy("user_id").agg(
        F.first("h").alias("h"), F.count(F.lit(1)).alias("true_n")
    )
    # top-N probe selection as a bounded heap (TakeOrderedAndProject), NOT a
    # global row_number window: at the 1000x decade (1.5M truth rows) the
    # single-partition window spent most of the op's 178 s; the heap is
    # fully parallel and the deterministic tiebreak is identical
    probes = truth.orderBy(F.col("true_n").desc(), F.col("user_id").asc()).limit(
        CMS_PROBES
    )
    probe_cells = probes.select("user_id", "true_n", "h", js).withColumn(
        "bucket", slice_bucket
    )
    return (
        probe_cells.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cell_n").alias("cms_n"))
        .select(
            "user_id",
            "true_n",
            "cms_n",
            (F.col("cms_n") - F.col("true_n")).alias("over_n"),
        )
    )


BLOOM_M = 128  # bloom bit-array size — deliberately small so false
#                positives occur (and are measured) at fixture scale
BLOOM_K = 3  # hash functions per element
BLOOM_MEMBERS = 30  # member-set size: top-N purchase-revenue users ("whales")


def _bloom_pos(k: Column, key: Column) -> Column:
    """Bit position k for a key — 'b' salt keeps the hash family disjoint
    from the CMS row hashes."""
    s = F.concat(F.lit("b"), k.cast("string"), F.lit(":"), key.cast("string"))
    return F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long") % BLOOM_M


@query(
    "agg_bloom_filter",
    oracle=f"""
    WITH rev AS (
        SELECT user_id,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    members AS (
        SELECT user_id FROM (
            SELECT user_id,
                   row_number() OVER (ORDER BY rev_cents DESC, user_id ASC) AS rk
            FROM rev
        ) WHERE rk <= {BLOOM_MEMBERS}
    ),
    posset AS (
        SELECT DISTINCT
               (('0x' || substr(md5('b' || k::VARCHAR || ':' || user_id::VARCHAR),
                                1, 8))::BIGINT % {BLOOM_M}) AS pos
        FROM members CROSS JOIN range({BLOOM_K}) AS r(k)
    ),
    probes AS (SELECT DISTINCT user_id FROM events),
    probe_hits AS (
        SELECT p.user_id,
               sum(CASE WHEN s.pos IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit
        FROM probes p
        CROSS JOIN range({BLOOM_K}) AS r(k)
        LEFT JOIN posset s
          ON s.pos = (('0x' || substr(md5('b' || r.k::VARCHAR || ':'
                                          || p.user_id::VARCHAR), 1, 8))::BIGINT
                      % {BLOOM_M})
        GROUP BY p.user_id
    ),
    flags AS (
        SELECT h.user_id,
               CASE WHEN h.n_hit = {BLOOM_K} THEN 1 ELSE 0 END AS bloom_pos,
               CASE WHEN m.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_member
        FROM probe_hits h LEFT JOIN members m ON m.user_id = h.user_id
    )
    SELECT count(*)::BIGINT AS n_probed,
           sum(is_member)::BIGINT AS n_members,
           (SELECT count(*) FROM posset)::BIGINT AS bits_set,
           sum(bloom_pos)::BIGINT AS n_bloom_pos,
           sum(CASE WHEN bloom_pos = 1 AND is_member = 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_false_pos,
           sum(CASE WHEN bloom_pos = 0 AND is_member = 1 THEN 1 ELSE 0 END)::BIGINT
               AS n_false_neg,
           (sum(CASE WHEN bloom_pos = 1 AND is_member = 0 THEN 1 ELSE 0 END)
            * 1000000 // nullif(count(*) - sum(is_member), 0))::BIGINT AS fp_ppm
    FROM flags
    """,
    tags=("agg", "sketch"),
)
def agg_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter build + probe + error census, exactly twinned. The
    member set is the top-{BLOOM_MEMBERS} purchase-revenue users; the
    filter is k={BLOOM_K} md5-derived bit positions in an m={BLOOM_M}
    array, represented RELATIONALLY as the distinct set-bit positions
    (<= m rows no matter how many members) so both engines compute the
    identical structure. Every distinct user is then probed: member iff
    all k positions are set. The one-row report carries the full
    confusion: `n_false_neg` MUST be 0 (Bloom's no-false-negative
    guarantee — a property test pins it) while `n_false_pos`/`fp_ppm`
    measure the saturation-driven error (m is sized small on purpose so
    the error is nonzero and therefore actually verified).

    100 TB shape: the build is one distinct over at most m positions —
    a broadcastable, constant-size structure derived from an arbitrarily
    large member set (this is what a runtime semi-join filter IS:
    join_bloom_pruned demos Spark's conf-driven InjectRuntimeFilter; this
    op is the same structure as an explicit, engine-portable plan). The
    probe is a broadcast left join against <= {BLOOM_M} rows, map-side
    only — no shuffle grows with the probe stream."""
    ev = load(spark, sf_dir, "events")
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("rev_cents")
        )
    )
    rkw = Window.orderBy(F.col("rev_cents").desc(), F.col("user_id").asc())
    members = (
        rev.withColumn("rk", F.row_number().over(rkw))
        .filter(F.col("rk") <= BLOOM_MEMBERS)
        .select("user_id")
    )
    ks = F.explode(F.array(*[F.lit(k) for k in range(BLOOM_K)])).alias("k")
    posset = (
        members.select(ks, "user_id")
        .select(_bloom_pos(F.col("k"), F.col("user_id")).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    bits_set = posset.agg(F.count(F.lit(1)).alias("bits_set"))
    probes = ev.select("user_id").distinct()
    probe_hits = (
        probes.select("user_id", ks)
        .withColumn("pos", _bloom_pos(F.col("k"), F.col("user_id")))
        .join(F.broadcast(posset), "pos", "left")
        .groupBy("user_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"))
    )
    flags = probe_hits.join(
        F.broadcast(members.withColumn("is_member", F.lit(1))), "user_id", "left"
    ).select(
        F.when(F.col("n_hit") == BLOOM_K, 1).otherwise(0).alias("bloom_pos"),
        F.coalesce(F.col("is_member"), F.lit(0)).alias("is_member"),
    )
    report = flags.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("is_member").alias("n_members"),
        F.sum("bloom_pos").alias("n_bloom_pos"),
        F.sum(
            F.when((F.col("bloom_pos") == 1) & (F.col("is_member") == 0), 1).otherwise(0)
        ).alias("n_false_pos"),
        F.sum(
            F.when((F.col("bloom_pos") == 0) & (F.col("is_member") == 1), 1).otherwise(0)
        ).alias("n_false_neg"),
    )
    return (
        report.crossJoin(F.broadcast(bits_set))
        .select(
            "n_probed",
            "n_members",
            "bits_set",
            "n_bloom_pos",
            "n_false_pos",
            "n_false_neg",
            F.expr(
                "n_false_pos * 1000000 div nullif(n_probed - n_members, 0)"
            ).alias("fp_ppm"),
        )
    )


INCR_SHARDS = 3  # simulated independent state maintainers (sources/shards)


@query(
    "agg_incremental_merge",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
           count(*)::BIGINT AS n,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents,
           min(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS vmin_cents,
           max(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS vmax_cents
    FROM events
    GROUP BY 1, 2
    """,
    tags=("agg", "pipeline", "scale"),
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-aggregate state merge — the materialized-view
    maintenance primitive: three independently-maintained PARTIAL state
    tables (shard = event_id % 3, simulating per-source/per-ingest-batch
    aggregators that never see each other's rows) are merged at read time
    by re-aggregating the partials, and the oracle verifies the merge
    law: merge(partials) == recompute(all rows). The merge functions are
    the monoid folds (sum of counts, sum of sums, min of mins, max of
    maxes) — commutative and associative, so the result is independent of
    shard count, arrival order, and merge tree shape.

    This is the algebra that makes 100 TB incremental pipelines possible
    at all: a new data batch folds into yesterday's state table in time
    proportional to the BATCH (state rows = |groups|, not |events|), and
    re-shards/backfills can merge state tables wholesale instead of
    re-scanning history. It is also exactly what Spark's partial
    aggregation does inside one job (map-side combine -> final merge) —
    expressed here across jobs, as data. Both aggregation levels are
    plain hash aggs; the shuffle carries |groups|x{INCR_SHARDS} partial
    rows, never events. Metrics are exact integers (cents via
    floor(x*100+0.5), rule 17b) so partial+merge vs recompute is
    bit-identical — a float sum would NOT be (fold order differs), which
    is why money-grade MV maintenance is integer-or-decimal only."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    partials = (
        ev.select(
            (F.col("event_id") % INCR_SHARDS).alias("shard"),
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
            cents.alias("cents"),
        )
        .groupBy("shard", "day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("rev_cents"),
            F.min("cents").alias("vmin_cents"),
            F.max("cents").alias("vmax_cents"),
        )
    )
    return partials.groupBy("day", "event_type").agg(
        F.sum("n").alias("n"),
        F.sum("rev_cents").alias("rev_cents"),
        F.min("vmin_cents").alias("vmin_cents"),
        F.max("vmax_cents").alias("vmax_cents"),
    )


@query(
    "agg_quantile_histogram",
    oracle="""
    WITH hist AS (
        SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS cents,
               count(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, cents, cnt,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS cum_n,
               sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
        FROM hist
    )
    SELECT event_type, max(n)::BIGINT AS n,
           min(CASE WHEN cum_n >= (n + 1) // 2 THEN cents END)::BIGINT
               AS p50_cents,
           min(CASE WHEN cum_n >= (9 * n + 9) // 10 THEN cents END)::BIGINT
               AS p90_cents,
           min(CASE WHEN cum_n >= (99 * n + 99) // 100 THEN cents END)::BIGINT
               AS p99_cents
    FROM cum GROUP BY event_type
    """,
    tags=("agg", "scale"),
)
def agg_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed quantiles WITHOUT a sort — the third point in the
    percentile trade-space the engine now covers end to end:
    agg_percentile is exact-but-sorts (per-group sort, fine for bounded
    groups), agg_approx_distinct/percentile_approx is mergeable-but-
    approximate, and THIS is exact AND mergeable: values quantize to
    cents (floor(x*100+0.5), rule 17b — the money domain is already
    discrete), the per-(group, cents) histogram is a partial agg whose
    state is bounded by the value domain, and the q-th discrete quantile
    is the smallest cents whose running count reaches ceil(q*n) —
    computed with INTEGER ceilings ((n+1)//2, (9n+9)//10, (99n+99)//100),
    so no float touches the pipeline and the answer is the true
    order-statistic, not an interpolation.

    This is how exact p99s actually get computed over 100 TB: the
    histogram merge is the same monoid shape as agg_incremental_merge
    (new batches fold in; shards union), and the cumulative pass runs
    over |distinct cents| rows per group, never over events. The prefix
    window partitions by group — fully parallel across groups; within a
    huge single group the two-pass distributed prefix-sum applies (the
    stats_kruskal_wallis note)."""
    ev = load(spark, sf_dir, "events")
    hist = (
        ev.select(
            "event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents")
        )
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "cents",
        F.sum("cnt").over(wcum).alias("cum_n"),
        F.sum("cnt").over(wall).alias("n"),
    )
    return cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.expr("CASE WHEN cum_n >= (n + 1) div 2 THEN cents END")).alias(
            "p50_cents"
        ),
        F.min(F.expr("CASE WHEN cum_n >= (9 * n + 9) div 10 THEN cents END")).alias(
            "p90_cents"
        ),
        F.min(F.expr("CASE WHEN cum_n >= (99 * n + 99) div 100 THEN cents END")).alias(
            "p99_cents"
        ),
    )


# --- round 8: relative-error log-bucketed quantile sketch -------------------


@query(
    "agg_log_histogram_quantile",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority,
               floor(o_totalprice * 100 + 0.5)::BIGINT AS c
        FROM orders
    ),
    coded AS (
        SELECT o_orderpriority,
               2 * (length(to_base(c, 2)) - 1)
                 + CASE WHEN c * c >= (1::BIGINT << (2 * (length(to_base(c, 2)) - 1) + 1))
                        THEN 1 ELSE 0 END AS bucket
        FROM cents
    ),
    hist AS (
        SELECT o_orderpriority, bucket, count(*)::BIGINT AS cnt
        FROM coded GROUP BY 1, 2
    ),
    cum AS (
        SELECT o_orderpriority, bucket, cnt,
               sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_n,
               sum(cnt) OVER (PARTITION BY o_orderpriority)::BIGINT AS n
        FROM hist
    ),
    picked AS (
        SELECT o_orderpriority, max(n)::BIGINT AS n,
               min(CASE WHEN cum_n >= (n + 1) // 2 THEN bucket END)::BIGINT AS p50_bucket,
               min(CASE WHEN cum_n >= (9 * n + 9) // 10 THEN bucket END)::BIGINT AS p90_bucket,
               min(CASE WHEN cum_n >= (99 * n + 99) // 100 THEN bucket END)::BIGINT AS p99_bucket
        FROM cum GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           p50_bucket,
           (floor(sqrt((1::BIGINT << p50_bucket)::DOUBLE)) + p50_bucket % 2)::BIGINT
               AS p50_lo_cents,
           p90_bucket,
           (floor(sqrt((1::BIGINT << p90_bucket)::DOUBLE)) + p90_bucket % 2)::BIGINT
               AS p90_lo_cents,
           p99_bucket,
           (floor(sqrt((1::BIGINT << p99_bucket)::DOUBLE)) + p99_bucket % 2)::BIGINT
               AS p99_lo_cents
    FROM picked
    """,
    tags=("agg", "sketch", "scale"),
)
def agg_log_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIVE-error mergeable quantiles — the DDSketch shape, twinned
    exactly: agg_quantile_histogram's cents histogram is exact but its
    state is O(|value domain|), which for a heavy-tailed metric (latency,
    price) is millions of cells; the log-bucketed sketch collapses that to
    one cell per HALF-OCTAVE (gamma = sqrt(2), relative error
    (gamma-1)/(gamma+1) ~ 17%), i.e. <= 2*53 cells for any BIGINT domain
    -- the constant-state family agg_countmin/agg_bloom_filter belong to.

    Every step is INTEGER arithmetic so the twin is exact (no rule-17b /
    libm drift anywhere a bucket boundary could flip):
      * octave  b  = floor(log2(cents)) via the BINARY-STRING LENGTH
        (`length(conv(c, 10, 2)) - 1` == `length(to_base(c, 2)) - 1`) --
        never float log2, whose `log(x)/log(2)` lowering lands BELOW the
        exact integer at powers of two and misbuckets them;
      * half-octave bit = [c^2 >= 2^(2b+1)], exact while c < 2^31;
      * bucket readout lower bound = floor(sqrt(2^bucket)) + (bucket % 2):
        even buckets hit the exact power of two (sqrt of an exact square
        is exact), odd buckets get the smallest integer whose square
        reaches 2^bucket -- sqrt is IEEE correctly-rounded in BOTH engines
        on an exactly-representable power-of-two input (bucket <= 53), so
        the twin is bit-identical, not approximately equal.
    Quantile selection reuses the integer-ceiling order-statistic rule of
    agg_quantile_histogram ((n+1)//2 etc.), so the reported bucket is the
    true discrete quantile's bucket.

    At 100 TB: the per-(group, bucket) partial agg is the whole job -- the
    shuffle carries <= ~106 cells per group, merges are count additions
    (the same monoid as agg_incremental_merge), and the final window runs
    over bucket counts, never rows. This is the sketch you deploy when
    agg_quantile_histogram's domain-bounded state no longer fits."""
    o = load(spark, sf_dir, "orders")
    c = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    coded = o.select(
        "o_orderpriority",
        F.expr(
            "2 * (length(conv(cast(floor(o_totalprice * 100 + 0.5) as bigint), 10, 2)) - 1)"
            " + CASE WHEN cast(floor(o_totalprice * 100 + 0.5) as bigint)"
            "            * cast(floor(o_totalprice * 100 + 0.5) as bigint)"
            "         >= shiftleft(cast(1 as bigint),"
            "  cast(2 * (length(conv(cast(floor(o_totalprice * 100 + 0.5) as bigint), 10, 2)) - 1) + 1 as int))"
            "    THEN 1 ELSE 0 END"
        ).cast("long").alias("bucket"),
    )
    hist = coded.groupBy("o_orderpriority", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("o_orderpriority")
    cum = hist.select(
        "o_orderpriority",
        "bucket",
        F.sum("cnt").over(wcum).alias("cum_n"),
        F.sum("cnt").over(wall).alias("n"),
    )
    picked = cum.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        F.min(F.expr("CASE WHEN cum_n >= (n + 1) div 2 THEN bucket END")).alias("p50_bucket"),
        F.min(F.expr("CASE WHEN cum_n >= (9 * n + 9) div 10 THEN bucket END")).alias("p90_bucket"),
        F.min(F.expr("CASE WHEN cum_n >= (99 * n + 99) div 100 THEN bucket END")).alias("p99_bucket"),
    )

    def lo(bucket_col: str) -> Column:
        return F.expr(
            f"cast(floor(sqrt(cast(shiftleft(cast(1 as bigint), cast({bucket_col} as int))"
            f" as double))) + {bucket_col} % 2 as bigint)"
        )

    return picked.select(
        "o_orderpriority",
        "n",
        "p50_bucket",
        lo("p50_bucket").alias("p50_lo_cents"),
        "p90_bucket",
        lo("p90_bucket").alias("p90_lo_cents"),
        "p99_bucket",
        lo("p99_bucket").alias("p99_lo_cents"),
    )


@query(
    "agg_distinct_growth",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               min(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS first_day
        FROM events GROUP BY user_id
    ),
    daily_users AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(DISTINCT user_id)::BIGINT AS active_users
        FROM events GROUP BY 1
    ),
    new_per_day AS (
        SELECT first_day AS day, count(*)::BIGINT AS new_users
        FROM first_seen GROUP BY first_day
    )
    SELECT d.day, d.active_users,
           COALESCE(n.new_users, 0)::BIGINT AS new_users,
           (d.active_users - COALESCE(n.new_users, 0))::BIGINT AS returning_users,
           sum(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
               AS cumulative_distinct
    FROM daily_users d LEFT JOIN new_per_day n ON n.day = d.day
    """,
    tags=("agg", "analytics"),
)
def agg_distinct_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-cardinality GROWTH curve — the audience-accounting query
    behind every 'cumulative unique users' dashboard, computed EXACTLY
    without re-scanning history per day: a naive implementation runs one
    count-distinct per day over all data up to that day (quadratic in the
    calendar); this op derives each user's FIRST-SEEN day once (one
    partial agg), so new-user counts per day are a second tiny agg and
    the cumulative distinct curve is a prefix sum over the calendar —
    the classic first-touch decomposition: active = new + returning,
    cumulative(d) = sum of new through d.

    All exact BIGINT counts; the only window is the prefix sum over the
    day support. The per-day count(DISTINCT user) is the one shuffle-wide
    term and it partial-aggs on (day, user) first.

    At 100 TB: two passes (first-seen fold; daily activity fold), both
    partial-agg friendly; the growth curve itself lives on the
    calendar-bounded frame. This exact shape replaces an HLL union chain
    when exactness is required (agg_sketch_rollup is the sketch
    alternative when it is not)."""
    ev = load(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    first_seen = ev.groupBy("user_id").agg(F.min(day.alias("d")).alias("first_day"))
    daily_users = ev.groupBy(day.alias("day")).agg(
        F.count_distinct("user_id").alias("active_users")
    )
    new_per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = daily_users.join(new_per_day, "day", "left").select(
        "day",
        "active_users",
        F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
    )
    return joined.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(wcum).alias("cumulative_distinct"),
    )
