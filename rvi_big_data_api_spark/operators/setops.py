"""Set operators (SURVEY.md §2.7): union / intersect / except over event
slices (the reference merged ingest batches and diffed active-vehicle sets —
SURVEY.md §2.7 [P:med/low]).

`unionByName` is a zero-shuffle concatenation of partitions; the distinct
variants add one hash-aggregate shuffle. INTERSECT/EXCEPT plan as left-semi /
left-anti hash joins under Catalyst — no custom work (SURVEY.md §4.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load
from ..registry import query


def _events_slice(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    return load(spark, sf_dir, "events").filter(F.col("event_type") == event_type)


@query(
    "set_union_all",
    oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'view'
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two ingest slices (no shuffle, partition concat)."""
    a = _events_slice(spark, sf_dir, "click").select("event_id", "user_id", "event_type")
    b = _events_slice(spark, sf_dir, "view").select("event_id", "user_id", "event_type")
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: concat + hash-distinct (one shuffle on the full row)."""
    a = _events_slice(spark, sf_dir, "click").select("user_id")
    b = _events_slice(spark, sf_dir, "error").select("user_id")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users active in both slices — plans as aggregate + left-semi join."""
    a = _events_slice(spark, sf_dir, "purchase").select("user_id")
    b = _events_slice(spark, sf_dir, "signup").select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 300
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 300
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-style diff: users with high-value clicks but no high-value
    purchase (EXCEPT DISTINCT → left-anti join). The value threshold keeps
    the result non-degenerate: without it every fixture user has every event
    type, so the plain type-level EXCEPT is always empty."""
    a = _events_slice(spark, sf_dir, "click").filter(F.col("value") > 300).select("user_id")
    b = _events_slice(spark, sf_dir, "purchase").filter(F.col("value") > 300).select("user_id")
    return a.subtract(b)


@query(
    "set_multiset_ops",
    oracle="""
    WITH isect AS (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    ),
    exc AS (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT 'intersect_all' AS op, user_id, count(*)::BIGINT AS multiplicity
    FROM isect GROUP BY user_id
    UNION ALL
    SELECT 'except_all', user_id, count(*)::BIGINT
    FROM exc GROUP BY user_id
    """,
    tags=("setop", "multiset"),
)
def set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — `intersectAll` / `exceptAll`, the ALL
    variants §2.7's distinct ops deliberately don't cover: INTERSECT ALL
    keeps min(countA, countB) copies per value and EXCEPT ALL keeps
    max(countA − countB, 0), so per-user CLICK vs PURCHASE activity
    compares by VOLUME, not mere presence (the distinct variants collapse
    every fixture user to one row — multiplicity is the whole signal
    here). Output rolls the surviving copies back up per user so the
    multiplicity arithmetic itself is what hash-checks.

    Plan shape: both ALL variants compile to count-aggregate + generate
    (re-expand to the surviving multiplicity) — two partial-agg shuffles
    on user_id, never a join explosion; at 100 TB that is the same cost
    class as the count aggregate a hand-rolled version would write."""
    clicks = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id")
    )
    purchases = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
    )
    isect = (
        clicks.intersectAll(purchases)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .select(F.lit("intersect_all").alias("op"), "user_id", "multiplicity")
    )
    exc = (
        clicks.exceptAll(purchases)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .select(F.lit("except_all").alias("op"), "user_id", "multiplicity")
    )
    return isect.unionByName(exc)
