"""Scale-technique demonstrations (SCALE.md): the levers the fixtures are too
small to force — bucketed co-located joins, salted skew joins — proven
correct and plan-shaped here so the 100 TB recipes in SCALE.md are executable
fact, not prose."""

from __future__ import annotations

import pyspark.sql.functions as F

from rvi_big_data_api_spark.io import load


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Bucketing both sides of a fact⋈fact join on the join key removes the
    Exchange entirely — the SCALE.md answer to lineitem⋈orders at 100 TB.
    (saveAsTable is required for bucket metadata; plain parquet loses it.)"""
    # warehouse dir is pinned to a tmp path in session.py (static conf);
    # clear table metadata AND any stale location from interrupted runs
    import shutil
    import tempfile

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    for t in ("li_b", "o_b"):
        shutil.rmtree(f"{tempfile.gettempdir()}/rvi_spark_warehouse/{t}", ignore_errors=True)
    load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("o_b")

    # at fixture scale the planner would broadcast the small side (bucketing
    # moot); disable broadcast to model the 100 TB case where BOTH sides are
    # too big — then bucketing must remove the shuffle from the sort-merge join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(
            spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        assert "Bucketed: true" in plan, f"bucket metadata unused:\n{plan[:2000]}"

        # and it computes the same result as the plain shuffled join
        plain = load(spark, sf_dir, "lineitem").join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Key-salting (the manual fallback when one key is pathologically hot
    and AQE's skew split isn't enough): explode the dim side over S salts,
    add a random-free deterministic salt on the fact side, join on
    (key, salt). Must be result-identical to the plain join."""
    S = 8
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_extendedprice")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")

    plain = li.join(part, li.l_partkey == part.p_partkey).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s")
    )

    salted_fact = li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(S)).cast("int"))
    salted_dim = part.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1))))
    salted = (
        salted_fact.join(
            salted_dim,
            (salted_fact.l_partkey == salted_dim.p_partkey)
            & (salted_fact.salt == salted_dim.salt),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )

    from .parity import canon_rows

    assert canon_rows(plain.toPandas()) == canon_rows(salted.toPandas())


def test_aqe_coalesces_small_shuffle(spark, sf_dir):
    """AQE must shrink the 32 configured shuffle partitions to a handful for
    a small aggregate — the runtime right-sizing SCALE.md leans on."""
    df = load(spark, sf_dir, "events").groupBy("event_type").count()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan or "coalesced" in plan, plan[:2000]


def test_aqe_splits_skewed_join(spark, sf_dir):
    """AQE skew-join handling, demonstrated as executed-plan fact: a join
    whose left side puts ~90 % of rows on ONE key must come back from
    execution with the hot partition SPLIT (SortMergeJoin(skew=true) +
    AQEShuffleRead skewed) — the runtime defense SCALE.md pairs with manual
    salting (test_salted_join_equals_plain_join) for the 100 TB skew story.
    Thresholds are lowered per-query so fixture-scale bytes trip the same
    code path production sizes would; results must be identical to the
    plain join regardless of the split."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(0, 300_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(
                    (F.col("id") % 50).cast("long")
                ),
            )
            .withColumn("pay", F.md5(F.col("id").cast("string")))
        )
        right = (
            spark.range(0, 50)
            .withColumnRenamed("id", "k")
            .withColumn("rv", F.col("k") * 2)
        )
        j = left.join(right, "k")
        pdf = j.toPandas()  # executes THIS query execution (AQE final plan)
        plan = j._jdf.queryExecution().executedPlan().toString()
        # correctness first: every row of the skewed side survives the split
        got = pdf.groupby("k")["id"].count().to_dict()
        assert got[7] == 270_000, got.get(7)  # ids with id%10 == 9 go to id%50
        assert len(pdf) == 300_000
        # then the plan fact: the hot partition was actually split
        assert "skew=true" in plan, plan[:3000]
        assert "AQEShuffleRead skewed" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
