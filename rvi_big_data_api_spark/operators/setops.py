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
