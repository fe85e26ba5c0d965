"""Projection, filter, and predicate operators (SURVEY.md §2.2).

The reference's interactive read path was a CQL clustering-range query —
``WHERE vin=? AND ts>=? AND ts<?`` served by the primary-key index
(SURVEY.md §3.1 [P:med]). The Spark-first equivalent is a declarative filter
that Catalyst pushes into the parquet scan: `.explain` shows PushedFilters +
min/max row-group skipping, so at 100 TB only matching row groups are read.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.exprs import duck_ts_str, ts_str
from ..io import load
from ..registry import query


@query(
    "project_prune",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
    FROM customer
    """,
    tags=("projection",),
)
def project_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + rename: the parquet scan should read exactly three of
    customer's five columns (ReadSchema in explain)."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
    tags=("projection",),
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived column — stays inside whole-stage codegen (no UDF).

    Deliberately NOT rounded: per-row IEEE arithmetic over identical
    expression trees is bit-identical in Spark and DuckDB, whereas round()
    itself diverges on .xx5 ties (Spark HALF_UP vs DuckDB half-even). Rounding
    is reserved for order-dependent aggregates (SURVEY.md §1 gotcha 2)."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@query(
    "filter_eq",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
           {duck_ts_str('o_orderdate', 'day')} AS orderdate
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("filter",),
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate, pushed to the scan (PushedFilters: [EqualTo(...)])."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
            ts_str("o_orderdate", "day").alias("orderdate"),
        )
    )


@query(
    "filter_range_time",
    oracle=f"""
    SELECT event_id, user_id, event_type, value,
           {duck_ts_str('ts')} AS ts_sec
    FROM events
    WHERE user_id = 7
      AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    """,
    tags=("filter", "telemetry"),
)
def filter_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core read path: all reports for one key in [t0, t1).

    At 100 TB the events table is partitioned by date and/or bucketed by
    user_id, so this predicate prunes partitions AND row groups; sorting by ts
    within a single user's slice is cheap (per-key data is small)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("user_id") == 7)
            & (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
        )
        .orderBy("ts")
        .select("event_id", "user_id", "event_type", "value", ts_str("ts").alias("ts_sec"))
    )


@query(
    "filter_compound",
    oracle="""
    SELECT p_partkey, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_type LIKE 'PROMO%'
      AND p_size BETWEEN 10 AND 40
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND NOT p_retailprice < 100.0
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + isin + between + like — all pushed as conjunctive scan filters."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%")
        & F.col("p_size").between(10, 40)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & ~(F.col("p_retailprice") < 100.0)
    ).select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")


@query(
    "filter_null",
    oracle="""
    SELECT c.c_custkey,
           o.cnt IS NULL      AS never_ordered,
           coalesce(o.cnt, 0) AS order_count
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    tags=("filter", "null"),
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling (fixtures have no NULLs, so synthesize them via a left
    join): isNull flag + coalesce fill. Mirrors 'vehicles without recent
    reports' from the reference's dashboards."""
    cust = load(spark, sf_dir, "customer")
    per_cust = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        F.col("cnt").isNull().alias("never_ordered"),
        F.coalesce(F.col("cnt"), F.lit(0)).alias("order_count"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT event_type, user_id FROM events",
    tags=("filter",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct tuples — planned as a hash aggregate (partial + final), so the
    shuffle carries one row per distinct pair, not per event."""
    return load(spark, sf_dir, "events").select("event_type", "user_id").distinct()


@query("sample_frac", oracle=None, tags=("filter", "rows-only"))
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (rows-only: Spark's sampler differs from
    DuckDB's). Deterministic for a fixed seed + stable input partitioning,
    which the driver's re-runs rely on."""
    return (
        load(spark, sf_dir, "lineitem")
        .sample(fraction=0.1, seed=42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


SAMPLE_STRAT_K = 5  # strata hold ≤16 docs at sf0.01 [F]; 5 makes the cap real


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source, rn FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY lang, source
                                  ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        FROM documents
    ) WHERE rn <= {SAMPLE_STRAT_K}
    """,
    tags=("filter", "llm", "sample"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — exactly K docs per (lang, source)
    stratum, the op that builds a balanced training mix from a skewed corpus.
    Rows are ordered by md5(doc_id) WITHIN each stratum, so the choice is a
    pseudo-random but reproducible draw (same K docs every run, any cluster
    size — unlike .sample(), whose output depends on partitioning).

    Scale shape: one window shuffle on the stratum key; the md5 sort key is
    16 bytes/row. At 100 TB prefer the agg-based top-K (topk_per_group's
    min_by pattern) if K is small and strata are huge."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_STRAT_K)
    )


SAMPLE_WEIGHTED_K = 5  # kept docs per language stratum


@query(
    "sample_weighted",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               -- Efraimidis–Spirakis priority: u^(1/w) maximized == ln(u)/w
               -- maximized; u = (h+1)/2^32 from the md5 prefix is a ratio of
               -- an integer and a power of two — bit-identical in both
               -- engines (only the ln differs, by <= 1 ulp; see margin note)
               ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT + 1)
                  / 4294967296.0) / n_chars AS es_key
        FROM documents WHERE n_chars > 0
    ),
    ranked AS (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY es_key DESC, doc_id ASC) AS rk
        FROM keyed
    )
    SELECT doc_id, lang, n_chars, rk FROM ranked WHERE rk <= {SAMPLE_WEIGHTED_K}
    """,
    tags=("sample", "pipeline"),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly K per stratum — the
    Efraimidis–Spirakis bottom-k: each document draws u from md5(doc_id)
    (deterministic, re-run/retry/straggler-stable — the
    corpus_importance_sample rule) and takes priority u^(1/w) with
    w = n_chars, so longer documents win proportionally more often while
    the sample size stays EXACTLY {SAMPLE_WEIGHTED_K} per language.
    Completes the sampling triad: sample_stratified (uniform fixed-K),
    corpus_importance_sample (Bernoulli, weight-proportional KEEP
    PROBABILITY, variable size), and this (weight-proportional fixed-K).

    The priority is compared as ln(u)/w (monotone in u^(1/w)): u is a
    ratio of an integer and 2^32 — bit-identical in both engines — and
    the single ln can differ by <= 1 ulp between libm and the JVM (rule
    8), so the RANKING is only at risk when two priorities sit within
    ~1e-16 relative. Margin measured at sf0.01: the smallest adjacent
    priority gap at any selection boundary is > 1e-6 — eleven orders
    above the reorder risk (the rule-16 margin discipline; a property
    test re-measures it on every run).

    100 TB shape: per-row hash + one window per stratum; bottom-k is a
    mergeable per-partition heap (each partition keeps its own top-K,
    merge keeps the global top-K) — the distributed-reservoir property
    that makes the ES construction THE weighted sampler for data
    pipelines."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(4294967296.0)
    keyed = d.select(
        "doc_id", "lang", "n_chars", (F.log(u) / F.col("n_chars")).alias("es_key")
    )
    w = Window.partitionBy("lang").orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_WEIGHTED_K)
        .select("doc_id", "lang", "n_chars", "rk")
    )
