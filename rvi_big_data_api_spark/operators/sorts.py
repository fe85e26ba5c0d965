"""Sort / limit / top-k operators (SURVEY.md §2.6).

The reference returned ordered telemetry traces and most-recent-N report
lists (SURVEY.md §2.6 [P:med]). Spark-first notes:
- `orderBy(...).limit(n)` plans as TakeOrderedAndProject — each task keeps a
  bounded heap and the driver merges, so a global top-N over 100 TB never
  materializes a full sort;
- per-group top-k uses a rank window, which sorts only within each key's
  partition after one shuffle on the key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load
from ..registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_returnflag ASC, l_extendedprice DESC NULLS LAST, l_orderkey ASC
    """,
    tags=("sort",),
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with direction + nulls placement (range-partitioned
    global sort; the driver's compare is order-insensitive but the plan is the
    point)."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_extendedprice").desc_nulls_last(),
            F.col("l_orderkey").asc(),
        )
    )


@query(
    "limit_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 10
    """,
    tags=("sort",),
)
def limit_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY ... LIMIT — TakeOrderedAndProject (bounded heap per
    task, no full sort). Unique (orderkey, linenumber) tiebreak keeps the
    top-10 deterministic for the oracle."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc())
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    tags=("sort", "window"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: rank window + filter. One shuffle on the
    group key; AQE splits skewed customers. Deterministic tiebreak on
    o_orderkey."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "topk_global_agg",
    oracle="""
    SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY total_value DESC, user_id ASC
    LIMIT 10
    """,
    tags=("sort", "agg"),
)
def topk_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard: agg → sort → limit. Partial aggregation shrinks the
    shuffle to one row per user; the final top-10 is a bounded heap."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("total_value"), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("total_value").desc(), F.col("user_id").asc())
        .limit(10)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10 OFFSET 20
    """,
    tags=("sort",),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: ORDER BY ... LIMIT k OFFSET m (`DataFrame.offset`,
    Spark ≥ 3.4 / SQL OFFSET clause). Plans as TakeOrderedAndProject with
    limit = m + k and the first m rows dropped at the driver merge — each
    task still keeps only a bounded (m + k)-heap, so page N of a 100 TB
    result never materializes a global sort. Deep pagination (m in the
    millions) would make that heap the bottleneck; the production pattern
    for deep pages is keyset pagination (WHERE key > last_seen ORDER BY
    key LIMIT k — the filter prunes at the scan), which `filter_range_time`
    + `limit_global` compose. Unique o_orderkey tiebreak keeps the page
    deterministic for the oracle."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(20)
        .limit(10)
    )
