"""Subquery-shape suite — the TPC-H query shapes built on scalar subqueries,
correlated aggregates, EXISTS / NOT EXISTS, and HAVING-over-global patterns.

Completes the composite coverage begun in operators/analytics.py (Q3/4/5/8/
10/13/14/15 shapes) with the remaining TPC-H shapes the fixture schema
supports: Q2, Q6, Q7, Q9, Q11, Q12, Q16, Q17, Q18, Q19, Q20, Q21, Q22 —
adapted where the classic columns don't exist (no partsupp, l_commitdate,
l_receiptdate, p_container; FIXTURES.md §A).

Why this family matters for a Spark-first engine: none of these shapes need
hand-written subquery machinery. Catalyst decorrelates correlated aggregate
subqueries into joins (RewriteCorrelatedScalarSubquery), turns scalar
subqueries into broadcast single-row cross joins, and EXISTS/NOT EXISTS into
left-semi/left-anti joins — the DataFrame code below simply declares the
same plan directly (explicit semi/anti joins, window-min for correlated min,
one-row broadcast for scalars), so the physical plan is exactly what SQL
decorrelation would produce, with no Python in the loop.

Scale posture (same rules as operators/analytics.py): small dims broadcast
explicitly, fact-fact joins shuffle on their keys, aggregates are
partial-agg friendly, every LIMIT ends in TakeOrderedAndProject with a
unique-key tie-break, and float outputs go through the exact-decimal
summation pattern (`_rev_exact`) so hashes match the DuckDB twin.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load
from ..registry import query
from .analytics import _rev_exact


@query(
    "composite_forecast_revenue",
    oracle="""
    SELECT round(sum((l_extendedprice * l_discount)::DECIMAL(18,4))::DOUBLE, 2)
               AS forecast_rev,
           count(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE year(l_shipdate) = 1996
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue increase if small-quantity discounts in a
    band had been eliminated — a pure filter + global aggregate.

    The whole query is one scan: all three predicates push into the parquet
    reader (year-range on the shipdate min/max stats, discount band,
    quantity), and the aggregate is a map-side partial + 1-row final. This
    is the cheapest possible shape at 100 TB — no shuffle wider than one
    row. Discounts/prices are exact 2-dp multiples, so the product is an
    exact 4-dp multiple and the DECIMAL(18,4) sum is order-independent."""
    li = load(spark, sf_dir, "lineitem")
    promo = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
    return (
        li.filter(
            (F.year("l_shipdate") == 1996)
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(promo).cast("double"), 2).alias("forecast_rev"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "composite_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate)::INT AS yr,
           round(sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,4))::DOUBLE, 2)
               AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations per ship
    year, in both directions.

    The nation pair predicate is an OR across two dimension branches, so it
    can't push below the joins — but both nation joins are broadcasts, so
    the filter runs map-side right after the (cheap) hash probes; only
    matching rows reach the orders/customer shuffle joins."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.round(F.sum(_rev_exact()).cast("double"), 2).alias("volume"))
    )


@query(
    "composite_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           year(o.o_orderdate)::INT AS yr,
           round(sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,4))::DOUBLE
                 - 0.1 * sum((l.l_quantity * p.p_retailprice)::DECIMAL(18,4))::DOUBLE,
                 2) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey  = p.p_partkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so supply cost is proxied as
    10% of retail value): profit on gear-like parts by supplier nation and
    order year.

    Part, supplier, and nation broadcast; the only real shuffle is
    lineitem ⋈ orders on orderkey plus the final small groupBy. Both sums
    are exact decimals (quantity is integral, retailprice a 2-dp multiple);
    the 0.1 factor is applied once per GROUP — after the exact sums — so
    engines agree bit-for-bit before the final 2-dp round."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    cost = (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.round(
                F.sum(_rev_exact()).cast("double")
                - F.lit(0.1) * F.sum(cost).cast("double"),
                2,
            ).alias("profit")
        )
    )


@query(
    "composite_important_parts",
    oracle="""
    WITH part_value AS (
        SELECT l.l_partkey AS p_partkey,
               sum((l.l_quantity * p.p_retailprice)::DECIMAL(18,4)) AS val
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    )
    SELECT p_partkey, round(val::DOUBLE, 2) AS part_value
    FROM part_value
    WHERE val::DOUBLE > 0.0008 * (SELECT sum(val)::DOUBLE FROM part_value)
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: shipped value instead of stock value):
    parts whose total shipped value exceeds a fraction of the corpus-wide
    total — a HAVING-over-a-global-scalar-subquery.

    Spark expresses the decorrelated form directly: one per-part aggregate,
    a 1-row re-aggregate of that SAME frame for the global total, and a
    broadcast cross join to apply the threshold — the part-value frame is
    computed once per branch but both branches are partial-agg friendly and
    the threshold compare is map-side. Sums are exact decimals; both
    engines compare in double with an identical multiply."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    val = (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(18,4)")
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(val).alias("val"))
    )
    total = per_part.agg(F.sum("val").cast("double").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.lit(0.0008) * F.col("total"))
        .select("p_partkey", F.round(F.col("val").cast("double"), 2).alias("part_value"))
    )


@query(
    "composite_shipmode_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 30 THEN '0-29'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 60 THEN '30-59'
                ELSE '60+' END AS delay_bucket,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode/receiptdate, so lines bucket
    by order→ship delay): how order priority distributes across shipping
    delay buckets, as a single conditional-aggregation pass.

    One shuffle join on orderkey, then a 3-group conditional agg — the
    numerator/denominator split never becomes a self-join."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "0-29").when(delay < 60, "30-59").otherwise("60+")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "composite_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_brand NOT IN ('Brand#1', 'Brand#5')
      AND s.s_acctbal >= 0
    GROUP BY 1, 2, 3
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier participation measured from
    shipped lines, negative-balance suppliers standing in for the complaints
    exclusion): distinct supplier counts per (brand, type, size).

    count(DISTINCT supplier) expands to a two-phase aggregate (partial
    distinct on (group, suppkey), then final count) — no row ever carries a
    set, so the shape survives arbitrary group fan-out. The NOT IN is a
    static literal filter, pushed to the part dimension BEFORE its
    broadcast."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin("Brand#1", "Brand#5")
    )
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "composite_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey, avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY 1
    )
    SELECT round((sum(l.l_extendedprice::DECIMAL(18,4))::DOUBLE) / 7.0, 2)
               AS avg_yearly,
           count(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part_avg pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.2 * pa.avg_qty
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to below-one-fifth-of-average-quantity
    orders — the classic correlated aggregate subquery (avg per part,
    compared per line).

    Catalyst decorrelates this into exactly what's written here: a per-part
    aggregate joined back to lineitem on partkey. The join is shuffle-on-
    partkey both sides (the aggregate is fact-derived, NOT broadcastable at
    scale); quantities are small integers so the avg is exact and the
    0.2× threshold computes identically in both engines."""
    li = load(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / F.lit(7.0),
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "composite_large_orders",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           o.o_custkey AS o_custkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_totalprice AS o_totalprice,
           sum(l.l_quantity) AS sum_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3, 4
    HAVING sum(l.l_quantity) > 200
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the top large-volume orders (sum of line quantities
    above a threshold) — GROUP BY + HAVING + top-k.

    The quantity rollup shuffles once on orderkey (partial sums map-side);
    HAVING is a post-agg filter; the LIMIT compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort), with
    orderkey breaking totalprice ties deterministically."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "composite_discounted_revenue",
    oracle="""
    SELECT round(sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,4))::DOUBLE, 2)
               AS revenue,
           count(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#4'  AND l.l_quantity BETWEEN 1  AND 11 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#14' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#24' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/quantity/size bands —
    a disjunctive predicate spanning both join sides.

    The join key stays a clean equi-join on partkey (broadcast); the OR
    lands as a post-join filter. Catalyst still prunes: only the three
    brands' rows survive the dimension side because the OR's part-only
    conjuncts (brand, size) are inferred as a dimension filter before the
    broadcast."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    band = (
        (F.col("p_brand") == "Brand#4")
        & F.col("l_quantity").between(1, 11)
        & F.col("p_size").between(1, 5)
    ) | (
        (F.col("p_brand") == "Brand#14")
        & F.col("l_quantity").between(10, 20)
        & F.col("p_size").between(1, 10)
    ) | (
        (F.col("p_brand") == "Brand#24")
        & F.col("l_quantity").between(20, 30)
        & F.col("p_size").between(1, 15)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            F.round(F.sum(_rev_exact()).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "composite_excess_suppliers",
    oracle="""
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, n.n_name AS n_name,
           t.total_qty AS total_qty
    FROM (
        SELECT l.l_suppkey, sum(l.l_quantity) AS total_qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'red%' AND year(l.l_shipdate) = 1997
        GROUP BY 1
        HAVING sum(l.l_quantity) > 400
    ) t
    JOIN supplier s ON t.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: shipped quantity stands in for partsupp
    availability): suppliers who moved an outsized volume of red parts in
    one year, with their nation.

    The semi-join chain decorrelates into: filtered fact aggregate (the
    part filter broadcasts, the year predicate pushes to the scan) →
    HAVING → two broadcast hash joins to decorate with supplier/nation.
    Nothing after the first aggregate is larger than the supplier count."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    agg = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 400)
    )
    return (
        agg.join(F.broadcast(supp), agg.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "total_qty")
    )


@query(
    "composite_sole_supplier",
    oracle="""
    WITH sole AS (
        SELECT l_orderkey, min(l_suppkey) AS s_key
        FROM lineitem
        GROUP BY 1
        HAVING count(*) >= 2 AND count(DISTINCT l_suppkey) = 1
    )
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           count(*)::BIGINT AS n_orders
    FROM sole JOIN supplier s ON sole.s_key = s.s_suppkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, s.s_suppkey
    LIMIT 10
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no receipt/commit dates, so "the one
    supplier who held up a multi-line order" becomes "the sole supplier of
    a multi-line order"): which suppliers single-handedly fill orders.

    The classic double-EXISTS/NOT-EXISTS formulation collapses into ONE
    aggregation over lineitem — count(*) ≥ 2 supplies the EXISTS (another
    line exists), count(DISTINCT supp) = 1 the NOT EXISTS (no line from a
    different supplier) — then a broadcast decorate + top-k. One shuffle
    total; the per-order state is two counters, never a list."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    sole = (
        li.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("s_key"),
            F.count(F.lit(1)).alias("n_lines"),
            F.count_distinct(F.col("l_suppkey")).alias("n_supps"),
        )
        .filter((F.col("n_lines") >= 2) & (F.col("n_supps") == 1))
    )
    return (
        sole.join(F.broadcast(supp), sole.s_key == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("s_suppkey"))
        .limit(10)
    )


@query(
    "composite_segment_opportunity",
    oracle="""
    WITH threshold AS (
        SELECT sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS c_mktsegment,
           count(*)::BIGINT AS n_cust,
           round(sum(c.c_acctbal::DECIMAL(18,2))::DOUBLE, 2) AS total_bal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY 1
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_segment_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: "no recent orders" replaces "no orders",
    market segment replaces phone country code): well-funded customers gone
    quiet, by segment.

    Three decorrelated pieces, exactly as Catalyst would plan the SQL: the
    scalar subquery (global positive-balance average) is a 1-row broadcast
    cross join; NOT EXISTS is a left-anti join against date-filtered
    orders (the date predicate pushes to the scan, shrinking the anti
    build side); the final rollup is a 5-group partial agg. The average is
    an exact-decimal sum divided in double — identical in both engines."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    threshold = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2
            ).alias("total_bal"),
        )
    )


@query(
    "composite_min_price_supplier",
    oracle="""
    WITH euro_lines AS (
        SELECT l.l_partkey, l.l_suppkey,
               l.l_extendedprice / l.l_quantity AS unit_price
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT l_partkey, l_suppkey, unit_price,
               min(unit_price) OVER (PARTITION BY l_partkey) AS min_price
        FROM euro_lines
    )
    SELECT p.p_partkey AS p_partkey, p.p_brand AS p_brand,
           round(r.min_price, 4) AS unit_price,
           min(r.l_suppkey)::BIGINT AS s_suppkey
    FROM ranked r
    JOIN part p ON r.l_partkey = p.p_partkey
    WHERE r.unit_price = r.min_price AND p.p_size = 15
    GROUP BY 1, 2, 3
    """,
    tags=("analytics", "composite", "subquery"),
)
def composite_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: observed unit price from lineitem replaces
    partsupp supply cost): the cheapest European supplier for each
    size-15 part — the classic correlated-min subquery.

    Decorrelated as a window-min over the region-filtered lines: one
    shuffle on partkey computes min(unit_price) per part AND keeps the rows
    to match against it — no second pass over the fact. Supplier/nation/
    region broadcast ahead of the window; ties on the min price resolve to
    the lowest suppkey, so the result is deterministic in both engines.
    unit_price is one IEEE division of identical doubles — bit-equal across
    engines, so the equality match never flaps."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    euro = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("l_partkey", "l_suppkey", unit)
    )
    w = Window.partitionBy("l_partkey")
    ranked = euro.withColumn("min_price", F.min("unit_price").over(w))
    return (
        ranked.filter(F.col("unit_price") == F.col("min_price"))
        .join(F.broadcast(part), ranked.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_brand", F.round("min_price", 4).alias("unit_price"))
        .agg(F.min("l_suppkey").alias("s_suppkey"))
    )


@query(
    "sql_lateral",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           t.l_linenumber AS top_linenumber,
           t.l_extendedprice AS top_price
    FROM orders o,
    LATERAL (
        SELECT l.l_linenumber, l.l_extendedprice
        FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
        ORDER BY l.l_extendedprice DESC, l.l_linenumber
        LIMIT 1
    ) t
    WHERE o.o_totalprice > 400000
    """,
    tags=("analytics", "subquery", "sql"),
)
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL entry point — the
    per-row-subquery syntax users reach for before they know window
    functions: "for each big order, its priciest line".

    Catalyst decorrelates the LATERAL ... LIMIT 1 into a partitioned
    rank-and-filter (DecorrelateInnerQuery) — the physical plan is the same
    window top-1 that `topk_per_group` declares directly, NOT a per-row
    re-execution; this query pins that the SQL sugar and the DataFrame
    idiom land on one plan. Identical LATERAL syntax runs in the DuckDB
    twin."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey AS o_orderkey,
               t.l_linenumber AS top_linenumber,
               t.l_extendedprice AS top_price
        FROM {orders} o,
        LATERAL (
            SELECT l.l_linenumber, l.l_extendedprice
            FROM {li} l
            WHERE l.l_orderkey = o.o_orderkey
            ORDER BY l.l_extendedprice DESC, l.l_linenumber
            LIMIT 1
        ) t
        WHERE o.o_totalprice > 400000
        """,
        orders=orders,
        li=li,
    )


@query(
    "sql_recursive",
    oracle="""
    WITH RECURSIVE vehicles AS (
        SELECT DISTINCT user_id FROM events WHERE user_id >= 1
    ),
    chain(u, cur, depth) AS (
        SELECT user_id, user_id, 0 FROM vehicles
        UNION ALL
        SELECT u, cur // 2, depth + 1 FROM chain WHERE cur > 1
    ),
    depths AS (
        SELECT u AS user_id, max(depth) AS escalation_depth,
               sum(cur)::BIGINT AS chain_sum
        FROM chain GROUP BY u
    )
    SELECT escalation_depth,
           count(*)::BIGINT AS n_vehicles,
           min(user_id) AS min_user,
           max(user_id) AS max_user,
           sum(chain_sum)::BIGINT AS total_chain_sum
    FROM depths GROUP BY 1
    """,
    tags=("analytics", "subquery", "sql", "recursive"),
)
def sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL entry point — new in Spark 4 (the
    hierarchy/BOM-explosion surface DuckDB answers with WITH RECURSIVE, now
    answerable in BOTH engines with the SAME text): each vehicle escalates
    to hub `id // 2` until the root, and the query walks every chain,
    reporting the fleet's escalation-depth distribution.

    Spark executes the recursion as iterated UNION ALL expansion with a
    per-level plan (conf spark.sql.cteRecursionLevelLimit bounds runaway
    recursion; this chain is ≤ ⌈log2(max user)⌉ ≈ 11 levels). Only
    UNION ALL recursion is supported as of 4.1 — cyclic closures (the
    dedup_cluster oracle's UNION form) still need the iterative DataFrame
    loop; documented boundary, same text both engines here because the walk
    is acyclic. The DataFrame is bound via the {df} template slot (same as
    sql_lateral/sql_parameterized) — no temp-view catalog state leaks onto
    the shared session."""
    ev = load(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH RECURSIVE vehicles AS (
            SELECT DISTINCT user_id FROM {ev} WHERE user_id >= 1
        ),
        chain(u, cur, depth) AS (
            SELECT user_id, user_id, 0 FROM vehicles
            UNION ALL
            SELECT u, cur DIV 2, depth + 1 FROM chain WHERE cur > 1
        ),
        depths AS (
            SELECT u AS user_id, max(depth) AS escalation_depth,
                   sum(cur) AS chain_sum
            FROM chain GROUP BY u
        )
        SELECT escalation_depth,
               count(*) AS n_vehicles,
               min(user_id) AS min_user,
               max(user_id) AS max_user,
               sum(chain_sum) AS total_chain_sum
        FROM depths GROUP BY 1
        """,
        ev=ev,
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*)::BIGINT AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY 1, 2
    """,
    tags=("analytics", "sql", "pipe"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>`): the pricing-summary shape written as
    a linear dataflow — FROM |> WHERE |> EXTEND |> AGGREGATE — instead of
    the inside-out SELECT nesting. Each `|>` stage is closed under
    relational semantics, so long pipelines read top-to-bottom the way the
    DataFrame API does; Catalyst parses both to the SAME logical plan (this
    query and `agg_pricing_summary`'s DataFrame build land on one plan
    shape: scan → filter → partial agg → exchange → final agg), making the
    pipe surface a third equivalent entry point after DataFrame and
    classic SQL. AGGREGATE emits grouping keys first, then aggregates —
    aliased to match the twin exactly. The DataFrame is bound via the {df}
    template slot (no temp-view catalog state)."""
    li = load(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM {li}
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE count(*) AS n_rows,
                     round(sum(l_quantity), 2) AS sum_qty,
                     round(sum(disc_price), 2) AS sum_disc_price,
                     round(avg(l_discount), 6) AS avg_disc
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_rows, sum_qty, sum_disc_price, avg_disc
        """,
        li=li,
    )


@query(
    "sql_exec_immediate",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           round(avg(value), 4) AS avg_value
    FROM events
    WHERE value > 150.0
    GROUP BY event_type
    """,
    tags=("analytics", "sql", "dynamic"),
)
def sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL through EXECUTE IMMEDIATE (Spark 4) — the entry point for
    query text assembled at runtime (stored templates, generated reports),
    with the parameter passed via USING, not string concatenation — the
    injection-safe half of dynamic SQL; `sql_parameterized` covers the
    static-template half with named markers.

    EXECUTE IMMEDIATE parses its string in a fresh context, so {df} template
    binding can't reach it — the input is exposed as a temp view and dropped
    in `finally` (the sql_recursive contract: no catalog state survives the
    call)."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_exec_imm_events")
    try:
        return spark.sql(
            """
            EXECUTE IMMEDIATE
              'SELECT event_type, count(*) AS n_events,
                      round(avg(value), 4) AS avg_value
               FROM _exec_imm_events WHERE value > ? GROUP BY event_type'
              USING 150.0
            """
        )
    finally:
        spark.catalog.dropTempView("_exec_imm_events")


@query(
    "sql_udf",
    oracle="""
    SELECT l_returnflag,
           count(*)::BIGINT AS n_rows,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS net_revenue,
           round(avg(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS avg_net
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("analytics", "sql", "udf"),
)
def sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 `CREATE FUNCTION … RETURN expr`)
    — the zero-cost UDF: the body is a SQL EXPRESSION, so Catalyst inlines
    it at plan time and the call sites compile into whole-stage codegen
    exactly like hand-written expressions — none of the serialization tax a
    Python UDF pays. This is the right home for shared business formulas
    (here: the net-revenue formula every composite_* query repeats);
    pricing logic changes in ONE place, every query picks it up, and the
    plan is identical to writing the expression inline (the twin IS the
    inlined expression).

    The function is TEMPORARY and dropped in `finally` — the sql_recursive
    contract: no catalog state survives the call."""
    li = load(spark, sf_dir, "lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_price(
            ep DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS DOUBLE
        RETURN ep * (1 - disc) * (1 + tax)
        """
    )
    try:
        return spark.sql(
            """
            SELECT l_returnflag,
                   count(*) AS n_rows,
                   round(sum(net_price(l_extendedprice, l_discount, l_tax)), 2)
                       AS net_revenue,
                   round(avg(net_price(l_extendedprice, l_discount, l_tax)), 4)
                       AS avg_net
            FROM {li}
            GROUP BY l_returnflag
            """,
            li=li,
        )
    finally:
        spark.sql("DROP TEMPORARY FUNCTION IF EXISTS net_price")


@query(
    "sql_table_fn",
    oracle="""
    WITH thresholds(thr) AS (VALUES (150.0), (190.0))
    SELECT t.thr::DOUBLE AS thr, e.event_type, count(*)::BIGINT AS n_events
    FROM thresholds t JOIN events e ON e.value > t.thr
    GROUP BY 1, e.event_type
    """,
    tags=("analytics", "sql", "udf", "table-function"),
)
def sql_table_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined TABLE function (Spark 4 `CREATE FUNCTION … RETURNS
    TABLE`) — sql_udf's set-returning sibling and the catalog-native way to
    publish a parameterized VIEW: the function body is a full SELECT, and
    call sites compose it relationally, including the LATERAL per-row-
    argument form shown here (each threshold row drives one invocation).
    Catalyst inlines the body and decorrelates the lateral apply, so the
    plan is the same join + aggregate a hand-written query gets — a
    reusable query template with zero runtime indirection.

    The function is TEMPORARY, parameterized over the event table path at
    CREATE time, and dropped in `finally` (no catalog state survives;
    the sql_recursive contract)."""
    path = f"{sf_dir}/events.parquet"
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION channel_counts(min_v DOUBLE)
        RETURNS TABLE (event_type STRING, n_events BIGINT)
        RETURN SELECT event_type, count(*)
               FROM parquet.`{path}` WHERE value > min_v GROUP BY event_type
        """
    )
    try:
        return spark.sql(
            """
            -- literal 150.0 parses as DECIMAL(4,1) in BOTH engines; cast to
            -- DOUBLE so the emitted dtype matches the twin (decimal surfaces
            -- as object dtype in pandas and fails the strict kind compare)
            SELECT CAST(t.thr AS DOUBLE) AS thr, f.event_type, f.n_events
            FROM VALUES (150.0), (190.0) AS t(thr),
                 LATERAL channel_counts(t.thr) f
            """
        )
    finally:
        spark.sql("DROP TEMPORARY FUNCTION IF EXISTS channel_counts")


SCRIPT_T0 = 50000.0    # starting price threshold
SCRIPT_TAIL_FRAC = 0.25  # loop doubles t until ≤ this fraction of orders remain


@query(
    "sql_scripting",
    oracle=f"""
    WITH tot AS (SELECT count(*)::BIGINT AS n_all FROM orders),
    cnts AS (
        SELECT {SCRIPT_T0} * power(2, k) AS t,
               (SELECT count(*) FROM orders WHERE o_totalprice > {SCRIPT_T0} * power(2, k)) AS n
        FROM generate_series(0, 40) s(k)
    ),
    sel AS (SELECT min(t) AS t FROM cnts, tot WHERE n <= {SCRIPT_TAIL_FRAC} * n_all)
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           sel.t AS threshold
    FROM orders, sel
    WHERE o_totalprice > sel.t
    GROUP BY o_orderpriority, sel.t
    """,
    tags=("analytics", "sql", "scripting"),
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4.0 compound statements — BEGIN/DECLARE/WHILE/
    SET/END): procedural control flow executed ENGINE-side, the migration
    target for stored-procedure workloads. The script doubles a price
    threshold until at most SCRIPT_TAIL_FRAC of the orders remain above it
    (a data-dependent fixpoint a static query can't express), then
    aggregates the surviving orders — the classic "find the knob value,
    then report at it" ops pattern. The exit condition is RELATIVE to the
    table size so the loop finds a non-degenerate threshold at every scale
    factor (a fixed row count goes empty once the table outgrows it).

    The DuckDB twin replays the loop declaratively: counts at every
    candidate threshold 50000·2^k via generate_series, picks the minimum
    threshold meeting the exit condition (counts are monotone in t, so
    min ≡ first), and aggregates there — loop-as-scan, same fixpoint.

    Scripting is gated behind spark.sql.scripting.enabled; the conf is set
    for the call and restored after (same discipline as the RocksDB
    provider demo). Each WHILE iteration is one COUNT job over the orders
    view — at 100 TB you'd run the fixpoint search on a sampled/sketched
    aggregate first; the pattern here is the API surface."""
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_script_orders")
    try:
        return spark.sql(
            f"""
            BEGIN
              DECLARE t DOUBLE DEFAULT {SCRIPT_T0};
              -- DECLARE defaults may not contain subqueries; SET may
              DECLARE n_all BIGINT DEFAULT 0;
              SET n_all = (SELECT count(*) FROM _script_orders);
              WHILE (SELECT count(*) FROM _script_orders
                     WHERE o_totalprice > t) > {SCRIPT_TAIL_FRAC} * n_all DO
                SET t = t * 2;
              END WHILE;
              SELECT o_orderpriority,
                     count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS sum_price,
                     max(t) AS threshold
              FROM _script_orders
              WHERE o_totalprice > t
              GROUP BY o_orderpriority;
            END
            """
        )
    finally:
        spark.catalog.dropTempView("_script_orders")
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


@query(
    "subquery_scalar_df",
    oracle="""
    SELECT n.n_name AS nation,
           count(*)::BIGINT AS n_cust,
           round(avg(c.c_acctbal), 2) AS avg_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
    GROUP BY n.n_name
    """,
    tags=("subquery", "spark4"),
)
def subquery_scalar_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's subquery-expression DataFrame API — ``DataFrame.scalar()``
    (non-correlated scalar subquery as a Column) and ``DataFrame.exists()``
    with ``Column.outer()`` correlation — exercised end-to-end: per-nation
    rollup of above-average-balance customers who have at least one order
    on the books and none in 'F' (finished) status.

    Everything else in this family declares the decorrelated plan by hand
    (explicit semi/anti joins, one-row broadcast scalars — see the module
    docstring); this query instead hands Catalyst the *correlated* form
    through the 4.x API and lets RewriteSubquery produce the same physical
    shapes: the scalar() becomes a single-row broadcast (Subquery scalar →
    BroadcastExchange), the exists() a left-semi and the ~exists() a
    left-anti shuffle join on o_custkey. At 100 TB those are exactly the
    plans you'd write — the correlated form costs nothing extra and keeps
    the intent declarative.

    Column-name contract: aggregate aliases (nation, n_cust, avg_bal) match
    the oracle exactly; avg rounded per the §1 float convention."""
    cust = load(spark, sf_dir, "customer").alias("c")
    nat = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")

    avg_bal_all = cust.select(F.avg("c_acctbal")).scalar()
    has_order = (
        orders.alias("o")
        .where(F.col("o.o_custkey") == F.col("c.c_custkey").outer())
        .exists()
    )
    has_finished = (
        orders.alias("o2")
        .where(
            (F.col("o2.o_custkey") == F.col("c.c_custkey").outer())
            & (F.col("o2.o_orderstatus") == "F")
        )
        .exists()
    )
    return (
        cust.where((F.col("c_acctbal") > avg_bal_all) & has_order & ~has_finished)
        .join(F.broadcast(nat), F.col("c.c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
    )


@query(
    "sql_identifier_dynamic",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("analytics", "sql", "dynamic"),
)
def sql_identifier_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTIFIER() clause (Spark 4) — the injection-safe path for
    dynamic IDENTIFIERS, completing the dynamic-SQL triad: named value
    markers (`sql_parameterized`), runtime query text (`sql_exec_immediate`),
    and here runtime table/column NAMES bound through parameters instead of
    string concatenation (the metric column and source table of a generic
    rollup template chosen at call time — the multi-tenant report-template
    shape). A value marker cannot name a column; IDENTIFIER() promotes a
    parameter to an identifier under the parser's quoting rules, so
    `value; DROP TABLE` is a resolution error, not an injection.

    Also exercises GROUP BY ALL (the grouping set inferred from the
    non-aggregate select list — template-friendly because the template
    needn't repeat its dimension columns). Plans identically to the static
    query: identifier resolution happens at parse time, zero runtime cost
    at any scale."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_ident_events")
    try:
        return spark.sql(
            """
            SELECT event_type,
                   count(*) AS n_events,
                   round(sum(IDENTIFIER(:metric_col)), 2) AS total_value
            FROM IDENTIFIER(:src_table)
            GROUP BY ALL
            """,
            args={"metric_col": "value", "src_table": "_ident_events"},
        )
    finally:
        spark.catalog.dropTempView("_ident_events")


@query(
    "sql_pivot_unpivot",
    oracle="""
    SELECT (user_id % 10)::BIGINT AS bucket, event_type AS etype,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS vc_sum
    FROM events
    GROUP BY 1, 2
    """,
    tags=("analytics", "sql", "pivot"),
)
def sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT / UNPIVOT clause surface (round 6) — the relational
    syntax twins of agg_pivot (DataFrame .pivot) and agg_unpivot
    (DataFrame .unpivot/melt): long → wide with PIVOT's aggregate-per-
    IN-value, then wide → long again with UNPIVOT, landing back on the
    plain GROUP BY the oracle states. The round trip pins both clauses'
    semantics at once: PIVOT fills absent cells with NULL, and UNPIVOT's
    default EXCLUDE NULLS drops exactly those, so the composition is the
    identity on present groups — no special-casing in the twin. Value
    column is integer cents (rule 17b) so sums hash exactly.

    Catalyst rewrites PIVOT into the same Expand/first-agg plan the
    DataFrame pivot builds and UNPIVOT into Expand+filter — pure JVM
    codegen, one key shuffle; the clauses are parse-time sugar, so the
    scale posture is agg_pivot's. DataFrames bind via {df} template slots
    (no temp-view catalog state)."""
    ev = load(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT bucket, etype, vc_sum FROM (
            SELECT * FROM (
                SELECT user_id % 10 AS bucket, event_type,
                       floor(value * 100 + 0.5) AS vc
                FROM {ev}
            )
            PIVOT (sum(vc) FOR event_type IN
                   ('click' AS click, 'view' AS view, 'purchase' AS purchase,
                    'signup' AS signup, 'error' AS error))
        )
        UNPIVOT (vc_sum FOR etype IN (click, view, purchase, signup, error))
        """,
        ev=ev,
    )


@query(
    "sql_group_order_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*)::BIGINT AS n,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql", "conformance"),
)
def sql_group_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the Spark-4 SQL ergonomics pair
    (adopted from the DuckDB dialect, so the twin is literally the same
    query text): every non-aggregate select item becomes a grouping key,
    and the result orders by the full select list. The conformance
    point is the INFERENCE — a refactor that adds a projected column
    must automatically join the grouping key set in both engines, which
    this op would catch as a schema/hash mismatch.

    Semantics under the hood are unchanged (plain partial+final hash
    aggregate, a bounded sort over the group rows), so the 100 TB plan
    is identical to the explicit-columns form — ALL is sugar the
    analyzer resolves before Catalyst ever sees the plan."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("sql_all_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM sql_all_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )
