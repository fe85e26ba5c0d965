"""Composite analytics suite — multi-operator TPC-H-shaped queries.

SURVEY.md §2's inventory is one-operator-per-query by design; real workloads
against the reference chained them (filter → star join → agg → top-k in one
request). This module registers eight composite pipelines modeled on the
classic TPC-H shapes the fixture schema supports (no partsupp / commitdate /
receiptdate, so Q4/Q8/Q15 are adapted to the columns that exist —
FIXTURES.md §A).

Scale posture (the point of the suite):
- genuinely small dims (region 5, nation 25, supplier ≤1k/sf, part) carry an
  explicit ``F.broadcast`` hint — the fact side never shuffles for them;
- customer and orders are treated as LARGE (no hint): at the 100 TB target
  customer is itself fact-sized, so those joins stay sort-merge/AQE where
  runtime stats can still demote them to broadcast when small;
- every aggregate is partial-agg friendly (plain sum/count over the join),
  and top-k endings are `ORDER BY … LIMIT k` → TakeOrderedAndProject, never
  a global sort;
- ties under LIMIT are always broken by a unique key so results are
  deterministic across engines (SURVEY.md §1 gotcha 3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load
from ..registry import query

def _rev():
    """Per-line revenue expression (built lazily: Column construction needs
    an active SparkContext in classic mode)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _rev_exact():
    """Per-line revenue as DECIMAL(18,4) for EXACT, order-independent sums.

    l_extendedprice and l_discount are exact 2-dp multiples (measured:
    |x*100 - round(x*100)| < 1e-9 on the fixture), so the true per-line
    revenue is an exact 4-dp multiple; the double holding it sits ~1e-9 from
    that multiple, never halfway, so Spark's and DuckDB's double→decimal
    casts agree. Small-group revenue sums (per order / per customer) MUST
    use this instead of round(sum(double), 2): with 3–8 addends the float
    sum lands on genuine .xx5 ties where Spark (HALF_UP on the shortest
    decimal string) and DuckDB (half-even on the true binary value) round
    differently — PARITY.md #1 observed live on this fixture."""
    return _rev().cast("decimal(18,4)")


@query(
    "composite_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,4))::DOUBLE
               AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("analytics", "composite"),
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 for one market segment.

    Filter → 3-way join → agg → top-k in one pipeline. customer/orders join
    unhinted (both are fact-sized at the 100 TB target; AQE decides), filters
    push to all three scans, and the `ORDER BY … LIMIT 10` compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev_exact()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "composite_order_priority",
    oracle="""
    SELECT o.o_orderpriority AS o_orderpriority,
           count(*) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o.o_orderpriority
    """,
    tags=("analytics", "composite"),
)
def composite_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: no commit/receipt dates — "late" = any line
    shipped >90 days after the order date): order counts per priority where
    at least one line was late.

    EXISTS compiles to a left-semi join — the lineitem probe side is never
    materialized into the output, and the per-orderkey match short-circuits."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late_orders"))


@query(
    "composite_local_supplier_revenue",
    oracle="""
    SELECT n.n_name AS n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_nationkey = c.c_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("analytics", "composite"),
)
def composite_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue served by LOCAL suppliers (supplier nation = customer
    nation) per Asian nation for one order-year.

    Distinct from join_multiway by the s_nationkey = c_nationkey residual —
    the classic "local supplier" correlation. supplier/nation/region are
    broadcast; lineitem⋈orders is the only real shuffle (customer unhinted,
    AQE decides)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "composite_promo_revenue",
    oracle="""
    SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m-%d') AS ship_month,
           round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / nullif(sum(l.l_extendedprice * (1 - l.l_discount)), 0), 4)
               AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY date_trunc('month', l.l_shipdate)
    """,
    tags=("analytics", "composite"),
)
def composite_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of revenue per ship-month.

    Conditional aggregation over a broadcast fact⋈part join — the share is
    computed in ONE pass (no self-join), division nullif-guarded in both
    dialects, rounded only at the end (SURVEY.md §1 gotchas 2/4)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    promo = F.when(F.col("p_type").like("PROMO%"), _rev()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("_m"))
        .agg(
            F.round(
                100.0 * F.sum(promo) / F.nullif(F.sum(_rev()), F.lit(0.0)), 4
            ).alias("promo_pct")
        )
        .select(F.date_format("_m", "yyyy-MM-dd").alias("ship_month"), "promo_pct")
    )


@query(
    "composite_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,4))::DOUBLE
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, r.total_revenue AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("analytics", "composite"),
)
def composite_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.

    The quarterly revenue-per-supplier aggregate is computed ONCE and joined
    against its own 1-row max via a broadcast cross join (no window-over-()
    single-partition trap, no recompute of the CTE). Revenue is an exact
    decimal sum (see _rev_exact) so the max-equality join is engine-stable."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_exact()).cast("double").alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("_max_rev"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev._max_rev)
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "composite_customer_dist",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count AS c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    tags=("analytics", "composite"),
)
def composite_customer_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count (left join
    keeps zero-order customers).

    Two stacked aggregations: the first shuffles on c_custkey (high
    cardinality — partitions freely), the second on the tiny c_count domain;
    both get map-side partials."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "composite_returned_revenue",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,4))::DOUBLE
               AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name AS n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("analytics", "composite"),
)
def composite_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned items in
    one quarter.

    Return-flag and date filters push to the scans; nation broadcasts; the
    top-k ends in TakeOrderedAndProject with a unique tie-break key."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_exact()).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name"
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "composite_market_share",
    oracle="""
    WITH region_rev AS (
        SELECT year(o.o_orderdate)::INT AS yr,
               l.l_extendedprice * (1 - l.l_discount) AS rev,
               s.s_nationkey AS supp_nation
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT yr,
           round(sum(CASE WHEN supp_nation = 3 THEN rev ELSE 0 END)
                 / nullif(sum(rev), 0), 4) AS mkt_share
    FROM region_rev
    GROUP BY yr
    """,
    tags=("analytics", "composite"),
)
def composite_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (adapted: no partsupp): NATION_3's share of supplier
    revenue into EUROPE-region customers, per order year.

    The share is a conditional-sum ratio in ONE aggregation pass — no
    numerator/denominator self-join. Dims broadcast, division nullif-guarded,
    year() cast to INT in both dialects."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = load(spark, sf_dir, "supplier")
    rev = _rev()
    national = F.when(F.col("s_nationkey") == 3, rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(F.sum(national) / F.nullif(F.sum(rev), F.lit(0.0)), 4).alias(
                "mkt_share"
            )
        )
    )


# --- round 4 (third wave): declarative data-quality expectations ------------


@query(
    "data_quality_checks",
    oracle="""
    SELECT 'orders.totalprice_positive' AS rule,
           count(*)::BIGINT AS n_checked,
           sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders.custkey_not_null',
           count(*)::BIGINT,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
    FROM orders
    UNION ALL
    SELECT 'orders.pk_unique',
           count(*)::BIGINT,
           (count(*) - count(DISTINCT o_orderkey))::BIGINT
    FROM orders
    UNION ALL
    SELECT 'lineitem.quantity_range',
           count(*)::BIGINT,
           sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.discount_range',
           count(*)::BIGINT,
           sum(CASE WHEN l_discount < 0 OR l_discount > 0.2 THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.orphan_orderkey',
           count(*)::BIGINT,
           sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'lineitem.shipdate_after_order',
           count(*)::BIGINT,
           sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    tags=("quality", "pipeline"),
)
def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations — the Deequ-style constraint
    audit a production pipeline runs BEFORE publishing a table: each rule
    (positivity, null-rate, key uniqueness, domain range, referential
    integrity, cross-table ordering) is evaluated as an aggregate over the
    full table and emitted as one report row (rule, n_checked,
    n_violations). Every rule is a sum of CASE flags, so adding a rule
    never adds a scan: Catalyst collapses all same-table rules into ONE
    pass over that table.

    Scale shape: column-pruned scans + partial aggs (violation counters
    combine map-side); the two referential rules are equi-joins on the
    orderkey — shuffle-hash at fact×fact scale. A single tiny report row
    set comes back per rule, never row-level violation payloads (those
    would be a separate quarantine sink in production)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def rule(df: DataFrame, name: str, violated) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(violated, 1).otherwise(0)).alias("n_violations"),
        ).select("rule", "n_checked", "n_violations")

    pk = orders.agg(
        F.lit("orders.pk_unique").alias("rule"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations"),
    ).select("rule", "n_checked", "n_violations")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
    report = (
        rule(orders, "orders.totalprice_positive", F.col("o_totalprice") <= 0)
        .unionByName(rule(orders, "orders.custkey_not_null", F.col("o_custkey").isNull()))
        .unionByName(pk)
        .unionByName(
            rule(li, "lineitem.quantity_range", (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
        )
        .unionByName(
            rule(li, "lineitem.discount_range", (F.col("l_discount") < 0) | (F.col("l_discount") > 0.2))
        )
        .unionByName(rule(joined, "lineitem.orphan_orderkey", F.col("o_orderkey").isNull()))
        .unionByName(
            rule(
                li.join(orders, li.l_orderkey == orders.o_orderkey),
                "lineitem.shipdate_after_order",
                F.col("l_shipdate") < F.col("o_orderdate"),
            )
        )
    )
    return report


@query(
    "ab_experiment_report",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                    THEN 'control' ELSE 'treatment' END AS arm,
               max(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, count(*)::BIGINT AS n_users,
               sum(converted)::BIGINT AS n_converted,
               sum(converted) / count(*) AS rate
        FROM assigned GROUP BY arm
    ),
    wide AS (
        SELECT
            max(CASE WHEN arm = 'control' THEN n_users END)::BIGINT AS n_c,
            max(CASE WHEN arm = 'control' THEN n_converted END)::BIGINT AS x_c,
            max(CASE WHEN arm = 'control' THEN rate END) AS r_c,
            max(CASE WHEN arm = 'treatment' THEN n_users END)::BIGINT AS n_t,
            max(CASE WHEN arm = 'treatment' THEN n_converted END)::BIGINT AS x_t,
            max(CASE WHEN arm = 'treatment' THEN rate END) AS r_t
        FROM arms
    )
    SELECT n_c, x_c, round(r_c, 6) AS rate_control,
           n_t, x_t, round(r_t, 6) AS rate_treatment,
           round(r_t - r_c, 6) + 0.0 AS lift,
           round((r_t - r_c) / nullif(sqrt(
               ((x_c + x_t) / (n_c + n_t)) * (1 - (x_c + x_t) / (n_c + n_t))
               * (1.0 / n_c + 1.0 / n_t)), 0), 4) + 0.0 AS z_score
    FROM wide
    """,
    tags=("analytics", "experiment"),
)
def ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — deterministic hash assignment plus the
    two-proportion pooled z-test, the analysis loop every product/fleet
    experiment runs: users bucket to arms by an md5 nibble of the STABLE
    user key (corpus_shard_split's rule — re-runs and late events never
    migrate a user between arms; never rand()), per-user conversion is a
    max-flag rollup, and the readout is conversion rates, absolute lift,
    and the pooled z-score (|z| > 1.96 ⇒ 95 % significance).

    Shape: one partial-agg groupBy(user) → one 2-row arm aggregate → a
    conditional-max pivot to one row (agg_pivot's trick) — the z arithmetic
    runs on a single driver-sized row, all heavy lifting is two partial
    aggs. Integer counts until the final divisions; sqrt is libm (PARITY
    rule 8, 4-dp round; + 0.0 collapses a potential -0.0 lift)."""
    ev = load(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1) < "8",
        "control",
    ).otherwise("treatment")
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("converted"),
    ).withColumn("arm", arm)
    arms = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        (F.sum("converted") / F.count(F.lit(1))).alias("rate"),
    )
    def pick(col: str, a: str):
        return F.max(F.when(F.col("arm") == a, F.col(col)))
    wide = arms.agg(
        pick("n_users", "control").alias("n_c"),
        pick("n_converted", "control").alias("x_c"),
        pick("rate", "control").alias("r_c"),
        pick("n_users", "treatment").alias("n_t"),
        pick("n_converted", "treatment").alias("x_t"),
        pick("rate", "treatment").alias("r_t"),
    )
    pooled = (F.col("x_c") + F.col("x_t")) / (F.col("n_c") + F.col("n_t"))
    se = F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n_c") + 1.0 / F.col("n_t")))
    return wide.select(
        "n_c", "x_c", F.round("r_c", 6).alias("rate_control"),
        "n_t", "x_t", F.round("r_t", 6).alias("rate_treatment"),
        (F.round(F.col("r_t") - F.col("r_c"), 6) + F.lit(0.0)).alias("lift"),
        (F.round((F.col("r_t") - F.col("r_c")) / F.nullif(se, F.lit(0.0)), 4) + F.lit(0.0)).alias("z_score"),
    )


@query(
    "privacy_pseudonymize",
    oracle="""
    SELECT substr(md5('pepper:' || user_id::VARCHAR), 1, 16) AS token,
           count(*)::BIGINT AS n_events,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
               AS n_purchases,
           sum(value::DECIMAL(18,6))::DOUBLE AS total_value,
           floor(epoch(min(ts)))::BIGINT AS first_sec,
           floor(epoch(max(ts)))::BIGINT AS last_sec
    FROM events
    GROUP BY 1
    """,
    tags=("analytics", "privacy"),
)
def privacy_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent pseudonymization — the PII-safe sharing transform that
    pairs with privacy_k_anonymity's audit: replace the direct identifier
    with a peppered-hash token BEFORE analytics leave the trust boundary,
    keeping referential integrity (same user -> same token, so joins,
    retention and funnel math still work on the shared extract) while the
    raw id never appears in the output. The pepper is a pipeline secret;
    rotating it unlinks all history — the standard re-identification
    tradeoff, stated in the runbook not the engine.

    Spark shape: token is a map-side scalar expression (md5 + substr, all
    JVM codegen), and the per-token profile is one partial agg — at
    100 TB this is byte-for-byte the cost of the same rollup on the raw
    id. Money sums use exact decimal (rule 15); timestamps leave as epoch
    BIGINT (rule 3)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.substring(
                F.md5(F.concat(F.lit("pepper:"), F.col("user_id").cast("string"))), 1, 16
            ).alias("token"),
            "event_type",
            "value",
            "ts",
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            ),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            F.unix_timestamp(F.min("ts")).alias("first_sec"),
            F.unix_timestamp(F.max("ts")).alias("last_sec"),
        )
    )


DP_EPSILON_X1000 = 1000  # epsilon = 1.0, stated in integer milli-units
DP_U_LATTICE = 16777216  # 16^6 — md5-derived uniform resolution


@query(
    "privacy_dp_histogram",
    oracle=f"""
    WITH counts AS (
        SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY 1
    ),
    noised AS (
        SELECT event_type, n,
               (('0x' || substr(md5('dp:' || event_type), 1, 6))::BIGINT + 0.5)
                   / {DP_U_LATTICE} AS u
        FROM counts
    )
    SELECT event_type,
           {DP_EPSILON_X1000} AS epsilon_x1000,
           round(n + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                     * ln(1.0 - 2.0 * abs(u - 0.5))
                     * (1000.0 / {DP_EPSILON_X1000}), 4) + 0.0 AS noisy_n
    FROM noised
    """,
    tags=("analytics", "privacy"),
)
def privacy_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release — per-type counts with
    Laplace(sensitivity/epsilon) noise via inverse-CDF sampling, the
    third privacy member (k-anonymity audits, pseudonymization unlinks,
    DP bounds what any single user can reveal). The raw count never
    leaves: only epsilon and the noised value ship.

    Determinism discipline: the uniform draw is the first 6 md5 nibbles
    of the cell key parsed as an integer lattice point (feature_hashing's
    proven hex-parse pairing: Spark conv(,16,10) = DuckDB
    ('0x'||…)::BIGINT), +0.5 to stay strictly inside (0,1) so ln() never
    sees 0 — identical doubles both engines, then one libm ln → 4 dp
    aggregate round (rule 8). A PRODUCTION release must draw fresh
    randomness per publication (a fixed seed leaks by averaging
    re-releases); the seeded form here is the engine-testable mechanism,
    the same trade every sampler in this repo documents.

    Scale: one partial agg; noise is a scalar expression on the
    |types|-row result — DP costs nothing at 100 TB."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 6), 16, 10
        ).cast("long")
        + 0.5
    ) / DP_U_LATTICE
    noise = (
        F.when(u < 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
        * (1000.0 / DP_EPSILON_X1000)
    )
    return counts.select(
        "event_type",
        F.lit(DP_EPSILON_X1000).alias("epsilon_x1000"),
        (F.round(F.col("n") + noise, 4) + F.lit(0.0)).alias("noisy_n"),
    )


# --- round 8: DP mean with clamping ------------------------------------------

DP_MEAN_CLAMP_CENTS = 20_000  # contribution bound C: values clamp to [0, C]


@query(
    "privacy_dp_mean",
    oracle=f"""
    WITH clamped AS (
        SELECT event_type,
               least(greatest(floor(value * 100 + 0.5)::BIGINT, 0),
                     {DP_MEAN_CLAMP_CENTS}) AS c
        FROM events
    ),
    agged AS (
        SELECT event_type, sum(c)::BIGINT AS s, count(*)::BIGINT AS n
        FROM clamped GROUP BY event_type
    ),
    noised AS (
        SELECT event_type, s, n,
               (('0x' || substr(md5('dpsum:' || event_type), 1, 6))::BIGINT + 0.5)
                   / {DP_U_LATTICE} AS us,
               (('0x' || substr(md5('dpcnt:' || event_type), 1, 6))::BIGINT + 0.5)
                   / {DP_U_LATTICE} AS uc
        FROM agged
    ),
    released AS (
        SELECT event_type,
               s + (CASE WHEN us < 0.5 THEN 1.0 ELSE -1.0 END)
                   * ln(1.0 - 2.0 * abs(us - 0.5))
                   * ({DP_MEAN_CLAMP_CENTS} * 2000.0 / {DP_EPSILON_X1000}) AS ns,
               n + (CASE WHEN uc < 0.5 THEN 1.0 ELSE -1.0 END)
                   * ln(1.0 - 2.0 * abs(uc - 0.5))
                   * (2000.0 / {DP_EPSILON_X1000}) AS nn
        FROM noised
    )
    SELECT event_type,
           {DP_EPSILON_X1000} AS epsilon_x1000,
           {DP_MEAN_CLAMP_CENTS} AS clamp_cents,
           round(ns, 4) + 0.0 AS noisy_sum_cents,
           round(nn, 4) + 0.0 AS noisy_n,
           round(ns / nn, 4) + 0.0 AS noisy_mean_cents
    FROM released
    """,
    tags=("analytics", "privacy"),
)
def privacy_dp_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private MEAN release — the fourth privacy member,
    and the one that forces the two design decisions every DP aggregate
    inherits: CLAMP the per-record contribution to a stated bound C
    (without it, sensitivity — and thus noise — is unbounded; the clamp
    bias vs noise variance trade is the analyst's knob), then noise the
    clamped SUM (sensitivity C) and the COUNT (sensitivity 1)
    independently, each by half the budget (sequential composition:
    eps/2 + eps/2 — the 2000/eps_x1000 scale factor is 1/(eps/2)), and
    release their ratio. Raw sum, count, and mean never ship.

    Mechanism and determinism discipline are privacy_dp_histogram's:
    inverse-CDF Laplace on an md5-lattice uniform (distinct seeds for
    the sum and count draws), identical doubles in both engines, one
    libm ln per draw, 4-dp aggregate round + 0.0 (rules 8/17). The same
    production caveat applies: real releases draw fresh randomness;
    the seeded form is the engine-testable mechanism.

    Scale: one clamped partial agg over the corpus; the DP arithmetic
    runs on the |types|-row result — free at 100 TB."""
    ev = load(spark, sf_dir, "events")
    clamped = ev.select(
        "event_type",
        F.least(
            F.greatest(F.floor(F.col("value") * 100 + 0.5).cast("long"), F.lit(0)),
            F.lit(DP_MEAN_CLAMP_CENTS),
        ).alias("c"),
    )
    agged = clamped.groupBy("event_type").agg(
        F.sum("c").alias("s"), F.count(F.lit(1)).alias("n")
    )

    def lap(seed_prefix: str, scale: float):
        u = (
            F.expr(
                f"conv(substr(md5(concat('{seed_prefix}:', event_type)), 1, 6), 16, 10)"
            ).cast("long")
            + 0.5
        ) / DP_U_LATTICE
        return (
            F.when(u < 0.5, 1.0).otherwise(-1.0)
            * F.log(1.0 - 2.0 * F.abs(u - 0.5))
            * scale
        )

    ns = F.col("s") + lap("dpsum", DP_MEAN_CLAMP_CENTS * 2000.0 / DP_EPSILON_X1000)
    nn = F.col("n") + lap("dpcnt", 2000.0 / DP_EPSILON_X1000)
    return agged.select(
        "event_type",
        F.lit(DP_EPSILON_X1000).alias("epsilon_x1000"),
        F.lit(DP_MEAN_CLAMP_CENTS).alias("clamp_cents"),
        (F.round(ns, 4) + 0.0).alias("noisy_sum_cents"),
        (F.round(nn, 4) + 0.0).alias("noisy_n"),
        (F.round(ns / nn, 4) + 0.0).alias("noisy_mean_cents"),
    )


# --- round 9: DP quantile via the exponential mechanism ----------------------

DP_Q_BUCKET_CENTS = 500   # candidate lattice pitch over the clamped domain
DP_Q_N_BUCKETS = 40       # candidates 0..40 cover [0, DP_MEAN_CLAMP_CENTS]


@query(
    "privacy_dp_quantile",
    oracle=f"""
    WITH types AS (SELECT DISTINCT event_type FROM events),
    cand AS (
        SELECT event_type, unnest(generate_series(0, {DP_Q_N_BUCKETS})) AS b
        FROM types
    ),
    bucketed AS (
        SELECT event_type,
               least(greatest(floor(value * 100 + 0.5)::BIGINT, 0),
                     {DP_MEAN_CLAMP_CENTS}) // {DP_Q_BUCKET_CENTS} AS b,
               count(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT c.event_type, c.b,
               sum(coalesce(h.cnt, 0)) OVER (
                   PARTITION BY c.event_type ORDER BY c.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )::BIGINT AS rk,
               sum(coalesce(h.cnt, 0)) OVER (PARTITION BY c.event_type)::BIGINT
                   AS n
        FROM cand c LEFT JOIN bucketed h
          ON c.event_type = h.event_type AND c.b = h.b
    ),
    scored AS (
        SELECT event_type, b, n,
               -abs(2 * rk - n) * {DP_EPSILON_X1000} / 4000.0
               - ln(-ln((('0x' || substr(md5('dpq:' || event_type || ':' || b::VARCHAR),
                          1, 6))::BIGINT + 0.5) / {DP_U_LATTICE})) AS score
        FROM ranked
    )
    SELECT event_type,
           {DP_EPSILON_X1000} AS epsilon_x1000,
           (b * {DP_Q_BUCKET_CENTS})::BIGINT AS dp_median_cents
    FROM (
        SELECT event_type, b,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY score DESC, b ASC) AS rn
        FROM scored
    ) z WHERE rn = 1
    """,
    tags=("analytics", "privacy"),
)
def privacy_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private MEDIAN release via the EXPONENTIAL MECHANISM
    (Smith 2011's DP quantile) — the fifth privacy member, and the one
    Laplace noise cannot deliver: a quantile's value has unbounded
    sensitivity to one record, so instead of noising the answer we noise
    the SELECTION. Candidates are the DP_Q_BUCKET_CENTS lattice over the
    clamped domain (a PUBLIC, data-independent set — required for
    privacy); each candidate's utility is -|2·rank - n| (how far its
    cumulative rank sits from the median, doubled to stay integer);
    selection samples ∝ exp(eps·u/(2·2)) realized by the GUMBEL-MAX
    trick: argmax of score = eps·u/4 + Gumbel, where Gumbel =
    -ln(-ln(U)) on the md5-lattice uniform (privacy_dp_histogram's
    proven hex-parse pairing, distinct 'dpq' seed per (type, candidate)).
    Only the winning lattice value and epsilon ship — rank, n, and the
    losing scores never leave.

    Exactness: utilities and ranks are exact BIGINT off one bucketed
    partial agg; the only floats are the shared score expression's
    (identical expression trees both engines — two libm ln calls, rule
    16), and the OUTPUT is an exact integer lattice value, so no
    rounding ships. Argmax stability is the sample_weighted discipline:
    a property test measures the adjacent score margin.

    Scale: one clamped bucket agg over the corpus (partial, |types| x 41
    cells), then scalar work on the 205-row candidate frame — the
    mechanism costs nothing at 100 TB, which is exactly why the
    histogram-candidate form (vs per-record candidates) is the
    production shape."""
    ev = load(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    cand = types.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(DP_Q_N_BUCKETS))).alias("b"),
    )
    bucketed = ev.select(
        "event_type",
        (
            F.least(
                F.greatest(F.floor(F.col("value") * 100 + 0.5).cast("long"), F.lit(0)),
                F.lit(DP_MEAN_CLAMP_CENTS),
            )
            / F.lit(DP_Q_BUCKET_CENTS)
        ).cast("long").alias("b"),
    ).groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        cand.join(bucketed, ["event_type", "b"], "left")
        .select(
            "event_type",
            "b",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
        .select(
            "event_type",
            "b",
            F.sum("cnt").over(wcum).alias("rk"),
            F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
        )
    )
    u = (
        F.expr(
            "conv(substr(md5(concat('dpq:', event_type, ':', cast(b as string))), 1, 6),"
            " 16, 10)"
        ).cast("long")
        + 0.5
    ) / DP_U_LATTICE
    score = (
        -F.abs(2 * F.col("rk") - F.col("n")) * DP_EPSILON_X1000 / 4000.0
        - F.log(-F.log(u))
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.col("score").desc(), F.col("b").asc()
    )
    return (
        ranked.select("event_type", "b", score.alias("score"))
        .withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.lit(DP_EPSILON_X1000).alias("epsilon_x1000"),
            (F.col("b") * DP_Q_BUCKET_CENTS).cast("long").alias("dp_median_cents"),
        )
    )


# --- round 9: CUPED variance reduction ---------------------------------------

# The float algebra applied to the per-arm integer sums — ONE text, consumed
# verbatim by both engines (rule 9: identical expression trees over exact
# integers are bit-identical), rounded 6dp only at the end (rule 8).
# theta-laden floats only: theta is a ratio of large mixed products, so a
# .xxxxx5 tie at 6 dp is measure-zero (rule 8's transcendental argument);
# the PURELY RATIONAL columns (raw mean/variance — denominator n or n², where
# a 6-dp round tie is reachable and WAS hit on this fixture) ship as exact
# integer-scaled values instead, per-engine div (Spark `div` / DuckDB `//`).
_CUPED_FLOAT_EXPRS = [
    "round((sy - theta * (sx - n * mx)) / n, 6) + 0.0 AS mean_cuped",
    "round((syy - 2 * theta * (sxy - mx * sy)"
    "       + theta * theta * (sxx - 2 * mx * sx + n * mx * mx)) / n"
    "      - ((sy - theta * (sx - n * mx)) / n)"
    "        * ((sy - theta * (sx - n * mx)) / n), 6) + 0.0 AS var_cuped",
]


@query(
    "eval_ab_cuped",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               sum(CASE WHEN epoch(date_trunc('day', ts))::BIGINT // 86400 % 2 = 0
                        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS x,
               sum(CASE WHEN epoch(date_trunc('day', ts))::BIGINT // 86400 % 2 = 1
                        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS y
        FROM events GROUP BY 1, 2
    ),
    arm_sums AS (
        SELECT arm, count(*)::BIGINT AS n,
               sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
               sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy,
               sum(y * y)::BIGINT AS syy
        FROM per_user GROUP BY arm
    ),
    gstats AS (
        SELECT count(*)::BIGINT AS gn, sum(x)::BIGINT AS gsx,
               sum(y)::BIGINT AS gsy, sum(x * x)::BIGINT AS gsxx,
               sum(x * y)::BIGINT AS gsxy
        FROM per_user
    ),
    scored AS (
        SELECT a.arm, a.n, a.sx AS sum_pre_cents, a.sy AS sum_post_cents,
               a.syy AS syy_i,
               cast(a.sx as double) AS sx, cast(a.sy as double) AS sy,
               cast(a.sxx as double) AS sxx, cast(a.sxy as double) AS sxy,
               cast(a.syy as double) AS syy,
               (cast(g.gn as double) * g.gsxy - cast(g.gsx as double) * g.gsy)
                   / (cast(g.gn as double) * g.gsxx
                      - cast(g.gsx as double) * g.gsx) AS theta,
               cast(g.gsx as double) / g.gn AS mx
        FROM arm_sums a CROSS JOIN gstats g
    )
    SELECT arm, n, sum_pre_cents, sum_post_cents,
           (sum_post_cents * 1000 // n)::BIGINT AS mean_post_milli,
           ((n * syy_i - sum_post_cents * sum_post_cents) * 1000
               // (n * n))::BIGINT AS var_post_milli,
           {", ".join(_CUPED_FLOAT_EXPRS)}
    FROM scored
    """,
    tags=("analytics", "eval", "experiment"),
)
def eval_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013 — Controlled-experiment
    Using Pre-Experiment Data), the estimator every experimentation
    platform ships because it cuts A/B variance for free: the adjusted
    metric Y' = Y − θ(X − E[X]) uses each unit's PRE-period covariate X
    (here: even-day spend cents vs odd-day spend as post — a deterministic
    stand-in for the pre/post cutover), with θ = cov(X,Y)/var(X) pooled
    across arms; any θ leaves the treatment-effect estimate unbiased
    (X is pre-assignment) while the optimal θ removes all X-explained
    variance. Output per arm: raw and CUPED means and variances — the
    variance-shrink readout that decides how much traffic/runtime an
    experiment saves.

    Exactness discipline: everything aggregate is an EXACT BIGINT sum of
    cents (x, y, xx, xy, yy — 2nd-moment state, the agg_moments shape).
    Stated overflow bound: the second moments are Σy² ≤ n·y_max², under
    2^63 for n ≲ 2·10⁸ users at y ≤ 2·10⁵ cents — promote the sums to
    DECIMAL(38) past that population (Spark ANSI off would wrap silently;
    DuckDB errors loudly, so the twin cannot silently diverge). The raw
    BIGINT second moment (syy_i) is carried through the `scored`
    projection alongside its double copy, and var_post_milli is computed
    from the INTEGER column on both engines (ADVICE r9: the previous
    BIGINT→double→BIGINT round-trip silently lost integer exactness past
    2^53, a thousand-fold earlier than the 2^63 bound above; the double
    copy now feeds only the θ-laden float expressions).
    The RAW mean/variance are pure rationals with denominator n/n², where
    a 6-dp round tie is reachable — and was HIT on this fixture (Spark
    HALF_UP vs DuckDB half-even at the last ulp of var_post) — so they
    ship as EXACT integer milli-units. Only the θ-adjusted statistics
    are floats: one expression tree shared verbatim between engines
    (_CUPED_FLOAT_EXPRS), rounded 6dp at the output, where the tie set
    is measure-zero because θ is a ratio of large mixed products (rules
    8/9).

    Scale: one corpus scan -> per-user partial agg; arm/global sums are
    5-counter states; all float work runs on a 2-row frame."""
    ev = load(spark, sf_dir, "events")
    day_parity = F.expr("unix_timestamp(date_trunc('day', ts)) div 86400 % 2")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = ev.groupBy(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) >= "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
    ).agg(
        F.sum(F.when(day_parity == 0, cents).otherwise(0)).alias("x"),
        F.sum(F.when(day_parity == 1, cents).otherwise(0)).alias("y"),
    )
    arm_sums = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx_i"),
        F.sum("y").alias("sy_i"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_i"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_i"),
        F.sum(F.col("y") * F.col("y")).alias("syy_i"),
    )
    glob = per_user.agg(
        F.count(F.lit(1)).alias("gn"),
        F.sum("x").alias("gsx"),
        F.sum("y").alias("gsy"),
        F.sum(F.col("x") * F.col("x")).alias("gsxx"),
        F.sum(F.col("x") * F.col("y")).alias("gsxy"),
    )
    scored = arm_sums.crossJoin(F.broadcast(glob)).selectExpr(
        "arm",
        "n",
        "sx_i AS sum_pre_cents",
        "sy_i AS sum_post_cents",
        "syy_i",
        "cast(sx_i as double) AS sx",
        "cast(sy_i as double) AS sy",
        "cast(sxx_i as double) AS sxx",
        "cast(sxy_i as double) AS sxy",
        "cast(syy_i as double) AS syy",
        "(cast(gn as double) * gsxy - cast(gsx as double) * gsy)"
        " / (cast(gn as double) * gsxx - cast(gsx as double) * gsx) AS theta",
        "cast(gsx as double) / gn AS mx",
    )
    return scored.selectExpr(
        "arm",
        "n",
        "sum_pre_cents",
        "sum_post_cents",
        "sum_post_cents * 1000 div n AS mean_post_milli",
        "(n * syy_i - sum_post_cents * sum_post_cents) * 1000"
        " div (n * n) AS var_post_milli",
        *_CUPED_FLOAT_EXPRS,
    )


# --- round 9: experiment power / minimum detectable effect -------------------

POWER_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
POWER_Z_BETA = 0.841621   # power = 0.80


@query(
    "eval_experiment_power",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS y
        FROM events GROUP BY 1, 2
    ),
    arms AS (
        SELECT arm, count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
               sum(y * y)::BIGINT AS syy
        FROM per_user GROUP BY arm
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 'control' THEN n END)::BIGINT AS n_c,
               max(CASE WHEN arm = 'control' THEN sy END)::BIGINT AS sy_c,
               max(CASE WHEN arm = 'control' THEN syy END)::BIGINT AS syy_c,
               max(CASE WHEN arm = 'treatment' THEN n END)::BIGINT AS n_t,
               max(CASE WHEN arm = 'treatment' THEN sy END)::BIGINT AS sy_t,
               max(CASE WHEN arm = 'treatment' THEN syy END)::BIGINT AS syy_t
        FROM arms
    )
    SELECT n_c, n_t,
           (sy_c * 1000 // n_c)::BIGINT AS mean_c_milli,
           ((n_c * syy_c - sy_c * sy_c) * 1000 // (n_c * n_c))::BIGINT
               AS var_c_milli,
           ((n_t * syy_t - sy_t * sy_t) * 1000 // (n_t * n_t))::BIGINT
               AS var_t_milli,
           round(({POWER_Z_ALPHA} + {POWER_Z_BETA})
                 * sqrt((cast(n_c as double) * syy_c - cast(sy_c as double) * sy_c)
                            / (cast(n_c as double) * n_c) / n_c
                        + (cast(n_t as double) * syy_t - cast(sy_t as double) * sy_t)
                            / (cast(n_t as double) * n_t) / n_t), 6) + 0.0
               AS mde_cents,
           round(({POWER_Z_ALPHA} + {POWER_Z_BETA})
                 * sqrt((cast(n_c as double) * syy_c - cast(sy_c as double) * sy_c)
                            / (cast(n_c as double) * n_c) / n_c
                        + (cast(n_t as double) * syy_t - cast(sy_t as double) * sy_t)
                            / (cast(n_t as double) * n_t) / n_t)
                 / (cast(sy_c as double) / n_c) * 100, 6) + 0.0 AS mde_pct
    FROM wide
    """,
    tags=("analytics", "eval", "experiment"),
)
def eval_experiment_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment POWER readout — the minimum detectable effect (MDE) at
    the standard alpha=0.05 two-sided / power=0.80 operating point:
    MDE = (z_alpha + z_beta) * sqrt(var_c/n_c + var_t/n_t), the number a
    platform shows BEFORE a test launches ('with this traffic and this
    metric variance you can detect a 1.4% lift; smaller real effects
    will read as noise'). Sits beside eval_ab_cuped: CUPED shrinks the
    variances, so rerunning this op on the adjusted metric quantifies
    the runtime CUPED buys.

    Exactness: arm sums are exact BIGINT second moments (same Σy² < 2^63
    population bound as eval_ab_cuped — n ≲ 2·10⁸ users at these cents,
    DECIMAL(38) beyond); the rational
    pieces (means, variances) ship integer milli-scaled (PARITY rule 28,
    learned one op earlier); only MDE itself — an irrational sqrt — is a
    6-dp-rounded float over one shared expression tree (rules 8/9), with
    z constants pinned as literals so no CDF inversion enters either
    engine. One corpus scan, 2-row state."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) >= "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("y"))
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("arm") == "control", F.col("sy"))).alias("sy_c"),
        F.max(F.when(F.col("arm") == "control", F.col("syy"))).alias("syy_c"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("sy"))).alias("sy_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("syy"))).alias("syy_t"),
    )
    mde = (
        f"round(({POWER_Z_ALPHA} + {POWER_Z_BETA})"
        " * sqrt((cast(n_c as double) * syy_c - cast(sy_c as double) * sy_c)"
        " / (cast(n_c as double) * n_c) / n_c"
        " + (cast(n_t as double) * syy_t - cast(sy_t as double) * sy_t)"
        " / (cast(n_t as double) * n_t) / n_t), 6) + 0.0"
    )
    return wide.selectExpr(
        "n_c",
        "n_t",
        "sy_c * 1000 div n_c AS mean_c_milli",
        "(n_c * syy_c - sy_c * sy_c) * 1000 div (n_c * n_c) AS var_c_milli",
        "(n_t * syy_t - sy_t * sy_t) * 1000 div (n_t * n_t) AS var_t_milli",
        f"{mde} AS mde_cents",
        f"round(({POWER_Z_ALPHA} + {POWER_Z_BETA})"
        " * sqrt((cast(n_c as double) * syy_c - cast(sy_c as double) * sy_c)"
        " / (cast(n_c as double) * n_c) / n_c"
        " + (cast(n_t as double) * syy_t - cast(sy_t as double) * sy_t)"
        " / (cast(n_t as double) * n_t) / n_t)"
        " / (cast(sy_c as double) / n_c) * 100, 6) + 0.0 AS mde_pct",
    )


@query(
    "profile_activity_matrix",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               (dayofweek(ts) + 1)::BIGINT AS dow,
               hour(ts)::BIGINT AS hod,
               count(*)::BIGINT AS n
        FROM events GROUP BY 1, 2, 3
    ),
    typed AS (
        SELECT event_type, dow, hod, n,
               sum(n) OVER (PARTITION BY event_type)::BIGINT AS type_total,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, dow ASC, hod ASC) AS rk
        FROM cells
    )
    SELECT event_type, dow, hod, n,
           (n * 1000000 // type_total)::BIGINT AS share_ppm,
           (rk = 1) AS is_peak
    FROM typed
    """,
    tags=("analytics", "profiling"),
)
def profile_activity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week activity matrix per channel — the fleet
    heat-map behind every ops dashboard ('when do purchases actually
    happen?'): per (channel, weekday, hour) cell, event count, integer-ppm
    share of the channel's traffic, and the channel's peak cell flagged
    with a full tiebreak (count desc, then dow/hod — rule 10). Calendar
    trap caught by the hash compare: Spark dayofweek is 1-7 Sunday-first,
    DuckDB's is 0-6 Sunday-first — the oracle carries the +1, and the
    mismatch fired on every row until it did (now a pinned example of why
    temporal extractors are never assumed engine-neutral).

    One partial agg whose state is ≤ |types|·168 cells; the share window
    partitions by type over that tiny frame. Free at 100 TB."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("dow").asc(), F.col("hod").asc()
    )
    return cells.select(
        "event_type",
        "dow",
        "hod",
        "n",
        F.expr(
            "n * 1000000 div sum(n) OVER (PARTITION BY event_type)"
        ).alias("share_ppm"),
        (F.row_number().over(wr) == 1).alias("is_peak"),
    )


# --- round 9: robust (trimmed / winsorized) experiment means ------------------

TRIM_PCT = 5  # percent trimmed from EACH tail


@query(
    "eval_trimmed_mean",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS y
        FROM events GROUP BY 1, 2
    ),
    hist AS (
        SELECT arm, y, count(*)::BIGINT AS cnt FROM per_user GROUP BY arm, y
    ),
    cum AS (
        SELECT arm, y, cnt,
               sum(cnt) OVER (PARTITION BY arm ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS cum_n,
               sum(cnt) OVER (PARTITION BY arm)::BIGINT AS n
        FROM hist
    ),
    bounds AS (
        SELECT arm, max(n)::BIGINT AS n,
               min(CASE WHEN cum_n * 100 >= n * {TRIM_PCT} THEN y END)::BIGINT
                   AS lo,
               min(CASE WHEN cum_n * 100 >= n * (100 - {TRIM_PCT}) THEN y END
                   )::BIGINT AS hi
        FROM cum GROUP BY arm
    )
    SELECT p.arm, max(b.n)::BIGINT AS n, max(b.lo)::BIGINT AS lo_cents,
           max(b.hi)::BIGINT AS hi_cents,
           count(CASE WHEN p.y BETWEEN b.lo AND b.hi THEN 1 END)::BIGINT
               AS n_kept,
           (sum(CASE WHEN p.y BETWEEN b.lo AND b.hi THEN p.y ELSE 0 END)
               * 1000 // nullif(count(CASE WHEN p.y BETWEEN b.lo AND b.hi
                                           THEN 1 END), 0))::BIGINT
               AS trimmed_mean_milli,
           (sum(least(greatest(p.y, b.lo), b.hi)) * 1000 // max(b.n))::BIGINT
               AS winsorized_mean_milli
    FROM per_user p JOIN bounds b ON p.arm = b.arm
    GROUP BY p.arm
    """,
    tags=("analytics", "eval", "experiment"),
)
def eval_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST experiment means — trimmed (drop both TRIM_PCT tails) and
    winsorized (clamp to the tail boundaries) per-arm spend, the metrics
    platforms report when whales would otherwise decide every test: a
    single outlier user moves the raw mean arbitrarily but moves these
    boundedly. Tail boundaries come from the per-arm cents HISTOGRAM's
    cumulative counts (the round's histogram-boundary discipline — the
    value at the smallest cumulative rank reaching p% — an exact integer
    order statistic, no interpolation, no sort of the user frame), and
    both robust means ship as exact integer milli-units via one floor
    division (PARITY rules 25/28).

    Shape: per-user rollup, per-(arm, cents) histogram, cumulative window
    over the arm's value SUPPORT, then one boundary-joined conditional
    agg. No global sort, nothing float."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) >= "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("y"))
    hist = per_user.groupBy("arm", "y").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("arm")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "arm",
        "y",
        F.sum("cnt").over(wcum).alias("cum_n"),
        F.sum("cnt").over(Window.partitionBy("arm")).alias("n"),
    )
    bounds = cum.groupBy("arm").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum_n") * 100 >= F.col("n") * TRIM_PCT, F.col("y"))
        ).alias("lo"),
        F.min(
            F.when(F.col("cum_n") * 100 >= F.col("n") * (100 - TRIM_PCT), F.col("y"))
        ).alias("hi"),
    )
    return (
        per_user.join(bounds, "arm")
        .groupBy("arm")
        .agg(
            F.max("n").alias("n"),
            F.max("lo").alias("lo_cents"),
            F.max("hi").alias("hi_cents"),
            F.count(
                F.when((F.col("y") >= F.col("lo")) & (F.col("y") <= F.col("hi")), 1)
            ).alias("n_kept"),
            F.expr(
                "sum(CASE WHEN y BETWEEN lo AND hi THEN y ELSE 0 END) * 1000"
                " div nullif(count(CASE WHEN y BETWEEN lo AND hi THEN 1 END), 0)"
            ).alias("trimmed_mean_milli"),
            F.expr(
                "sum(least(greatest(y, lo), hi)) * 1000 div max(n)"
            ).alias("winsorized_mean_milli"),
        )
    )


PVM_Y0, PVM_Y1 = 1996, 1997  # the compared fiscal years


@query(
    "composite_price_volume_mix",
    oracle=f"""
    WITH cells AS (
        SELECT p.p_brand AS brand, year(o.o_orderdate)::BIGINT AS yr,
               sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                         + 0.5)::BIGINT)::BIGINT AS rev_cents,
               sum(floor(l.l_quantity * 100 + 0.5)::BIGINT)::BIGINT AS qty_c
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(o.o_orderdate) IN ({PVM_Y0}, {PVM_Y1})
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT brand,
               max(CASE WHEN yr = {PVM_Y0} THEN rev_cents END)::BIGINT AS r0,
               max(CASE WHEN yr = {PVM_Y0} THEN qty_c END)::BIGINT AS q0,
               max(CASE WHEN yr = {PVM_Y1} THEN rev_cents END)::BIGINT AS r1,
               max(CASE WHEN yr = {PVM_Y1} THEN qty_c END)::BIGINT AS q1
        FROM cells GROUP BY brand
        HAVING count(*) = 2
    )
    SELECT brand, r0 AS rev0_cents, r1 AS rev1_cents,
           (r1 - r0)::BIGINT AS delta_cents,
           round((r1::DOUBLE / q1 - r0::DOUBLE / q0) * q0, 4) + 0.0
               AS price_effect,
           round(r0::DOUBLE / q0 * (q1 - q0), 4) + 0.0 AS volume_effect,
           round((r1::DOUBLE / q1 - r0::DOUBLE / q0) * (q1 - q0), 4) + 0.0
               AS cross_effect
    FROM wide
    """,
    tags=("composite", "analytics"),
)
def composite_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix decomposition — the finance-review question every
    revenue dashboard eventually answers: of each brand's year-over-year
    revenue change, how much came from charging MORE (price effect at
    base volume), selling MORE (volume effect at base price), and the
    interaction (cross effect)? The Laspeyres identity
    delta = (p1-p0)*q0 + p0*(q1-q0) + (p1-p0)*(q1-q0) holds EXACTLY per
    brand — pinned as a property — so the three effects are an audit, not
    an approximation. Brands must trade in both years (HAVING count = 2,
    stated).

    Exactness: per-(brand, year) revenue and centi-quantity fold map-side
    to exact BIGINTs; delta_cents is pure integer; unit prices are
    rationals of those ints evaluated only in the |brands|-row readout,
    effects rounded 4dp (rules 1/6/8).

    At 100 TB: one partial agg over the fact join (the year filter prunes
    partitions at scan), then a |brands|-row pivot — the standard
    star-join decomposition shape."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p.select("p_partkey", "p_brand")), li.l_partkey == p.p_partkey)
        .filter(F.year("o_orderdate").isin(PVM_Y0, PVM_Y1))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + 0.5
                ).cast("long")
            ).alias("rev_cents"),
            F.sum(
                F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")
            ).alias("qty_c"),
        )
    )
    wide = (
        cells.groupBy("brand")
        .agg(
            F.max(F.when(F.col("yr") == PVM_Y0, F.col("rev_cents"))).alias("r0"),
            F.max(F.when(F.col("yr") == PVM_Y0, F.col("qty_c"))).alias("q0"),
            F.max(F.when(F.col("yr") == PVM_Y1, F.col("rev_cents"))).alias("r1"),
            F.max(F.when(F.col("yr") == PVM_Y1, F.col("qty_c"))).alias("q1"),
            F.count(F.lit(1)).alias("_c"),
        )
        .filter(F.col("_c") == 2)
    )
    p1 = F.col("r1").cast("double") / F.col("q1")
    p0 = F.col("r0").cast("double") / F.col("q0")
    return wide.select(
        "brand",
        F.col("r0").alias("rev0_cents"),
        F.col("r1").alias("rev1_cents"),
        (F.col("r1") - F.col("r0")).alias("delta_cents"),
        (F.round((p1 - p0) * F.col("q0"), 4) + F.lit(0.0)).alias("price_effect"),
        (F.round(p0 * (F.col("q1") - F.col("q0")), 4) + F.lit(0.0)).alias(
            "volume_effect"
        ),
        (
            F.round((p1 - p0) * (F.col("q1") - F.col("q0")), 4) + F.lit(0.0)
        ).alias("cross_effect"),
    )
