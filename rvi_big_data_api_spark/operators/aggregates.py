"""Aggregation operators (SURVEY.md §2.4).

The reference's fleet rollups were per-VIN RDD aggregations written back to
Cassandra (SURVEY.md §3.1 [P:med]); every operator here is a declarative
groupBy/agg so Catalyst plans a partial (map-side) + final HashAggregate —
the shuffle carries pre-combined groups, not raw rows, which is what keeps a
100 TB aggregation's shuffle volume proportional to group cardinality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
