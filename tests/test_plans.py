"""Physical-plan assertions (SURVEY.md §4.2): the optimizations Catalyst
gives for free must actually appear — a regression here means a 100 TB run
reads/shuffles orders of magnitude more than it should, even though results
stay correct."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rvi_big_data_api_spark.io import load
from rvi_big_data_api_spark.registry import REGISTRY


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString() + "\n" + df._jdf.queryExecution().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = REGISTRY["filter_eq"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "EqualTo(o_orderstatus,F)" in plan, plan[:2000]


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = REGISTRY["project_prune"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "ReadSchema" in plan
    # customer has 5 columns; the scan must read exactly the 3 projected ones
    read_schema = [line for line in plan.splitlines() if "ReadSchema" in line][0]
    assert "c_acctbal" not in read_schema and "c_nationkey" not in read_schema, read_schema


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = plan_of(REGISTRY["join_broadcast"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = plan_of(REGISTRY["join_multiway"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan[:3000]


def test_semi_anti_plan_as_joins_not_materialization(spark, sf_dir):
    assert "LeftSemi" in plan_of(REGISTRY["join_semi"].fn(spark, sf_dir))
    assert "LeftAnti" in plan_of(REGISTRY["join_anti"].fn(spark, sf_dir))


def test_partition_pruning(spark, sf_dir):
    df = REGISTRY["scan_partitioned"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "PartitionFilters: [" in plan and "event_type" in plan.split("PartitionFilters:")[1][:200], (
        plan[:2000]
    )


def test_topk_uses_bounded_heap(spark, sf_dir):
    plan = plan_of(REGISTRY["limit_global"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_agg_has_partial_final_split(spark, sf_dir):
    plan = plan_of(REGISTRY["agg_basic"].fn(spark, sf_dir))
    assert "partial_count" in plan or plan.count("HashAggregate") >= 2, plan[:2000]


def test_asof_join_is_linear_not_quadratic(spark, sf_dir):
    """The carry-forward as-of join must NOT plan a nested-loop/cartesian
    product — that is the whole point of the union+window formulation."""
    plan = plan_of(REGISTRY["join_asof"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:2000]


def test_whole_stage_codegen_covers_flagship(spark, sf_dir):
    """Under AQE, codegen subtrees materialize per stage at runtime, so probe
    with AQE off: the whole filter→project→partial-agg pipeline must fuse."""
    import contextlib
    import io

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["agg_pricing_summary"].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
        header = buf.getvalue().splitlines()[0]
        n = int(header.split("Found ")[1].split(" WholeStageCodegen")[0])
        assert n >= 1, buf.getvalue()[:1500]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_events_time_filter_pushdown(spark, sf_dir):
    """Time-range predicates push down on the derived ts? The ts column is
    computed (ns→µs), so pushdown applies to user_id only — assert the
    user_id predicate reaches the scan (the partition/bucket story at scale
    lives in SCALE.md)."""
    df = REGISTRY["filter_range_time"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters:")[1][:300], plan[:2000]


@pytest.mark.parametrize("name", ["agg_basic", "join_broadcast", "trip_sessionize"])
def test_no_python_udf_in_hot_paths(spark, sf_dir, name):
    """Relational/telemetry cores must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes)."""
    plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
    assert "EvalPython" not in plan, plan[:2000]


def test_sessionize_single_shuffle(spark, sf_dir):
    """The full trip pipeline (lag window → running-sum window → per-session
    agg) must reuse ONE user_id exchange — stacked windows + aggregation over
    compatible keys shuffle once (SCALE.md telemetry notes)."""
    plan = plan_of(REGISTRY["trip_sessionize"].fn(spark, sf_dir))
    n_exchanges = plan.split("\n== ")[0].count("Exchange ")
    assert n_exchanges == 1, f"expected 1 Exchange, found {n_exchanges}:\n{plan[:2500]}"


def test_sim_pairs_salted_block_join(spark, sf_dir):
    """The blocked similarity self-join must be an equi-join whose key
    includes the SALT (so a ~10-key label block splits across S tasks rather
    than serializing onto one), and must never degrade to a nested-loop /
    cartesian plan. Whether the small side is broadcast is left to Catalyst's
    size gate — that IS the sanctioned fast path at fixture scale; at 100 TB
    the same plan shuffles on (label, salt)."""
    plan = plan_of(REGISTRY["sim_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:2500]
    # the equi-join keys must carry the salt column next to the label
    assert "salt" in plan and "rep" in plan, plan[:2500]


def test_dedup_embed_adaptive_bucket_join(spark, sf_dir):
    """Embedding near-dup must join within LSH buckets via an equi-join on
    the ADAPTIVE-width bucket (round 8: n_bits sized from the corpus count,
    VERDICT r7 item 3) — never a cartesian/nested-loop pass. The corpus
    count folds in as a broadcast 1-row params frame, so the only BHJ side
    is scalar-sized; the pair join itself stays a shuffled equi-join."""
    plan = plan_of(REGISTRY["dedup_embed"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan[:2500]
    assert "bucket" in plan, plan[:2500]
    # the adaptive width is computed in-plan (no driver-side count action)
    assert "n_bits" in plan, plan[:2500]


def test_dedup_near_no_cartesian(spark, sf_dir):
    """LSH candidate generation must be equi-join on (band, hash) — a
    cartesian/nested-loop node would mean the blocking failed."""
    plan = plan_of(REGISTRY["dedup_near"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan[:2500]


def test_bandor_band_join_is_skinny_equi(spark, sf_dir):
    """Band-OR candidate generation must be an equi-join on (table, bucket)
    over SKINNY rows: no cartesian/BNLJ, and the 64-float embedding column
    must NOT flow through the candidate shuffle — it rejoins only after the
    pair groupBy (the band-join contract from SCALE.md's skew probe, where
    this shape absorbed a 3000-deep clique at 1.4x)."""
    plan = plan_of(REGISTRY["dedup_embed_bandor"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:2500]
    body = plan.split("\n== ")[0]
    # candidate join keys present...
    assert "bucket" in body, body[:2500]
    # ...and the groupBy on the pair precedes the embedding rejoin: the
    # aggregate over (vec_a, vec_b) must not reference the embedding column.
    import re
    aggs = [ln for ln in body.split("\n") if "HashAggregate" in ln and "n_tables" in ln]
    assert aggs and all("embedding" not in ln for ln in aggs), body[:2500]


def test_tfidf_broadcasts_df_table(spark, sf_dir):
    plan = plan_of(REGISTRY["text_tfidf"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_threshold_runs_single_shuffle(spark, sf_dir):
    """Gaps-and-islands with a running-count flag rank (not a second
    per-flag window partitioning) must shuffle once."""
    plan = plan_of(REGISTRY["threshold_runs"].fn(spark, sf_dir))
    n = plan.split("\n== ")[0].count("Exchange ")
    assert n == 1, f"expected 1 Exchange, found {n}:\n{plan[:2500]}"


def test_composite_topk_uses_bounded_heap(spark, sf_dir):
    """Q3/Q10-shaped composites end in ORDER BY … LIMIT k — must compile to
    TakeOrderedAndProject (per-partition heaps), never a global Sort."""
    for name in ("composite_shipping_priority", "composite_returned_revenue"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, (name, plan[:2000])


def test_composite_order_priority_is_semi_join(spark, sf_dir):
    """The EXISTS formulation must plan as LeftSemi — lineitem is probed,
    never materialized into the output."""
    plan = plan_of(REGISTRY["composite_order_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in plan, plan[:2000]


def test_composite_star_joins_broadcast_dims(spark, sf_dir):
    """Q5/Q8-shaped composites must broadcast their hinted dims (supplier /
    nation / region) so only the fact-side joins shuffle."""
    for name, min_bcast in (
        ("composite_local_supplier_revenue", 3),
        ("composite_market_share", 3),
        ("composite_promo_revenue", 1),
    ):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= min_bcast, (name, plan[:3000])


def test_composite_share_is_single_pass(spark, sf_dir):
    """Ratio-of-sums composites (Q8/Q14 shapes) must compute numerator and
    denominator as conditional aggregates in ONE aggregation — no self-join
    of the fact table (the join would double the 100 TB scan)."""
    for name in ("composite_market_share", "composite_promo_revenue"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        scans = plan.split("\n== ")[0].count("Scan parquet")
        assert scans <= 6, (name, f"{scans} scans", plan[:2500])


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    """Decontamination must broadcast the (small) benchmark gram set — the
    training side never shuffles for the semi-join."""
    plan = plan_of(REGISTRY["text_contamination"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2500]


def test_llm_vector_ops_stay_jvm_side(spark, sf_dir):
    """Centroid/k-means pipelines are HOF column algebra — no Python eval
    nodes anywhere in the plan."""
    for name in ("embed_centroids", "sim_ivf_kmeans"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "EvalPython" not in plan, (name, plan[:2500])


def test_anomaly_zscore_single_shuffle(spark, sf_dir):
    """Mean + stddev + z-filter must reuse ONE user_id exchange (window
    frames over the same partitioning, no groupBy+join rescan)."""
    plan = plan_of(REGISTRY["anomaly_zscore"].fn(spark, sf_dir))
    n = plan.split("\n== ")[0].count("Exchange ")
    assert n == 1, f"expected 1 Exchange, found {n}:\n{plan[:2500]}"


def test_event_funnel_two_exchanges(spark, sf_dir):
    """Three stacked step windows + the per-user collapse share one user_id
    exchange; the only other exchange is the final single-row rollup."""
    plan = plan_of(REGISTRY["event_funnel"].fn(spark, sf_dir))
    n = plan.split("\n== ")[0].count("Exchange ")
    assert n == 2, f"expected 2 Exchanges, found {n}:\n{plan[:2500]}"


def test_sink_bucketed_join_is_shuffle_free(spark, sf_dir):
    """With broadcast disabled (modeling two fact-sized sides), the bucketed
    join must read bucket metadata and plan NO hash-partitioning exchange."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["sink_bucketed"].fn(spark, sf_dir)
        plan = plan_of(df)
        assert "Bucketed: true" in plan, plan[:2500]
        # the only exchange allowed is the final aggregation's
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" not in join_part, plan[:2500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))


def test_scan_dpp_inserts_dynamic_pruning(spark, sf_dir):
    """The join-delivered partition filter must become a
    DynamicPruningExpression on the fact scan — runtime directory pruning,
    not a full scan + post-filter."""
    df = REGISTRY["scan_dpp"].fn(spark, sf_dir)
    full = plan_of(df) + df._jdf.queryExecution().toString()
    assert "dynamicpruning" in full.lower(), full[:2500]


def test_join_interval_is_bucketed_hash_join(spark, sf_dir):
    """Point-in-interval carries the day equi-key (VERDICT r3 item 2): the
    plan must be a hash join on the date bucket with the range condition as
    a residual — never a nested-loop points × intervals product."""
    plan = plan_of(REGISTRY["join_interval"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:2500]
    assert "BroadcastHashJoin" in plan, plan[:2500]


def test_join_self_is_bucketed_equi_join(spark, sf_dir):
    """The successor self-join must carry the SLA time bucket as an
    equi-key (VERDICT r4 item 3): a hash/merge join on (user_id, bucket)
    with the time residual inside the bucket — never an equi-join on
    user_id alone whose per-user pair enumeration is quadratic, and never
    a nested-loop product. WindowGroupLimit should also push rn=1 into the
    join output."""
    plan = plan_of(REGISTRY["join_self"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:2500]
    assert "probe_bucket" in plan and "bucket" in plan, plan[:2500]
    assert "WindowGroupLimit" in plan, plan[:2500]


def test_interval_overlap_is_bucketed_not_quadratic(spark, sf_dir):
    """The overlap join must be the exploded day-bucket formulation — no
    cartesian/BNLJ trips × windows product in the plan."""
    plan = plan_of(REGISTRY["join_interval_overlap"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:2500]


def test_state_intervals_single_shuffle(spark, sf_dir):
    """The categorical gaps-and-islands build (row_number + 5 running
    per-type counts + final aggregate) must reuse ONE user_id exchange."""
    plan = plan_of(REGISTRY["state_intervals"].fn(spark, sf_dir))
    n = plan.split("\n== ")[0].count("Exchange ")
    assert n == 1, f"expected 1 Exchange, found {n}:\n{plan[:2500]}"


def test_winsorize_broadcasts_fences(spark, sf_dir):
    """The per-channel fence table (5 rows) must broadcast — the event
    stream never shuffles for the clip join."""
    plan = plan_of(REGISTRY["clean_winsorize"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2500]


def test_subquery_large_orders_bounded_heap(spark, sf_dir):
    plan = plan_of(REGISTRY["composite_large_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_subquery_scalar_broadcasts_one_row(spark, sf_dir):
    """Q22 shape: the scalar-subquery threshold must be a broadcast nested
    loop over ONE row plus a left-anti for NOT EXISTS — never a shuffle."""
    plan = plan_of(REGISTRY["composite_segment_opportunity"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]


def test_subquery_correlated_min_is_window(spark, sf_dir):
    """Q2 shape: the correlated min decorrelates to a window over one
    shuffle, not a second scan of the fact."""
    df = REGISTRY["composite_min_price_supplier"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan[:2000]
    assert plan.count("FileScan parquet") <= 5  # li + 3 dims + part, no re-scan


def test_gemm_pairs_is_arrow_not_join(spark, sf_dir):
    """sim_pairs_gemm runs as FlatMapGroupsInPandas (Arrow), with no
    pair-level join and no cartesian anywhere."""
    plan = plan_of(REGISTRY["sim_pairs_gemm"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_triangle_count_equi_joins_only(spark, sf_dir):
    plan = plan_of(REGISTRY["graph_triangle_count"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_gemm_chunk_count_invariance(spark, sf_dir):
    """The chunk fan-out C is an execution knob, not a semantic one: pair
    sets (and dots) must be identical for different C."""
    from rvi_big_data_api_spark.operators import llm_sim
    from rvi_big_data_api_spark.operators.llm_sim import block_pairs_gemm

    e = load(spark, sf_dir, "embeddings")
    tau = llm_sim.SIM_PAIRS_TAU

    def rows(df):
        return sorted(
            (r["blk"], r["vec_a"], r["vec_b"], round(r["raw_dot"], 4))
            for r in df.collect()
        )

    old = llm_sim.GEMM_CHUNKS
    try:
        llm_sim.GEMM_CHUNKS = 2
        r2 = rows(block_pairs_gemm(e, "label", tau))
        llm_sim.GEMM_CHUNKS = 5
        r5 = rows(block_pairs_gemm(e, "label", tau))
    finally:
        llm_sim.GEMM_CHUNKS = old
    assert r2 == r5 and len(r2) > 0


def test_asof_nearest_is_linear_not_quadratic(spark, sf_dir):
    plan = plan_of(REGISTRY["join_asof_nearest"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # union + two window passes over one sort; no join at all
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_trip_distance_single_shuffle(spark, sf_dir):
    """Sessionize's two windows AND the per-trip lag all ride ONE user_id
    exchange — adding the trip dimension must not re-shuffle.

    The round-12 session memo checkpoints the sessionize frame, so the
    registered query plans against the materialization; to pin the
    UNDERLYING build shape, bypass the memo with a pass-through loader
    (the memo engages only on the real io.load — see sessionized_events)."""
    import rvi_big_data_api_spark.operators.telemetry as T
    from unittest import mock

    from rvi_big_data_api_spark import io

    with mock.patch.object(T, "load", lambda s, d, n: io.load(s, d, n)):
        df = REGISTRY["trip_distance"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange ") == 1, plan[:1500]
    assert plan.count("FileScan") == 1


def test_sessionized_events_memo_contract(spark, sf_dir):
    """Round-12 memo pin: one sessionize computation per (session, sf_dir,
    gap) — repeated calls return the SAME checkpointed frame, and consumers
    scan the materialization instead of re-running the double window."""
    import rvi_big_data_api_spark.operators.telemetry as T

    a = T.sessionized_events(spark, sf_dir)
    assert T.sessionized_events(spark, sf_dir) is a
    aplan = a._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in aplan  # checkpoint-backed
    cplan = (
        REGISTRY["trip_distance"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # consumer reads the checkpoint: no parquet re-scan, one trip exchange
    assert cplan.count("FileScan") == 0 and "ExistingRDD" in cplan
    assert cplan.count("Exchange ") == 1, cplan[:1500]


def test_agg_entropy_single_scan_two_exchanges(spark, sf_dir):
    """Counts, totals (window over the same key), and the entropy fold ride
    one partitioning: one scan, no broadcast re-computation branch."""
    df = REGISTRY["agg_entropy"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan[:1500]
    assert plan.count("Exchange ") <= 2


def test_bloom_filter_injected_on_probe_side(spark, sf_dir):
    """Under the operator's conf scope, InjectRuntimeFilter must add a
    `might_contain` bloom probe to the lineitem side — the scan-level
    semi-join pruning the operator exists to demonstrate."""
    from rvi_big_data_api_spark.operators.joins import BLOOM_CONFS, bloom_join_frame

    old = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    try:
        for k, v in BLOOM_CONFS.items():
            spark.conf.set(k, v)
        plan = bloom_join_frame(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2500]
    finally:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_cdc_merge_is_single_full_outer(spark, sf_dir):
    df = REGISTRY["cdc_merge"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FullOuter") == 1, plan[:1500]
    assert "CartesianProduct" not in plan


def test_join_hinted_forces_shuffled_hash(spark, sf_dir):
    """The SHUFFLE_HASH hint must override the planner's size-based pick
    (broadcast at fixture scale) — the contract that makes the at-scale
    sort-skip override predictable."""
    plan = plan_of(REGISTRY["join_hinted"].fn(spark, sf_dir))
    assert "ShuffledHashJoin" in plan, plan[:1500]
    assert "BroadcastHashJoin" not in plan


def test_span_dedup_windows_on_hash_key(spark, sf_dir):
    """text_span_dedup's dedup window must partition on md5(chunk) — a
    16-byte shuffle key — and never plan a join (pure window + two aggs)."""
    plan = plan_of(REGISTRY["text_span_dedup"].fn(spark, sf_dir))
    assert "md5" in plan, plan[:1500]
    assert "Join" not in plan


def test_pack_sequences_single_partitioning(spark, sf_dir):
    """corpus_pack_sequences: the prefix-sum window and the (lang, seq_id)
    rollup must ride lang-compatible partitionings — one scan, ≤2
    exchanges, no join."""
    df = REGISTRY["corpus_pack_sequences"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan[:1500]
    assert plan.count("Exchange ") <= 2
    assert "Join" not in plan


def test_chunk_overlap_has_no_shuffle(spark, sf_dir):
    """Chunking is pure per-row explode algebra — any Exchange would mean a
    100 TB chunking job shuffles the whole corpus for nothing."""
    plan = plan_of(REGISTRY["text_chunk_overlap"].fn(spark, sf_dir))
    assert "Exchange" not in plan.split("\n== ")[0], plan[:2000]


def test_shard_split_single_partial_agg(spark, sf_dir):
    """The split tag is per-row hashing; the only exchange carries
    (split, lang) partials."""
    plan = plan_of(REGISTRY["corpus_shard_split"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert exec_plan.count("Exchange ") <= 1, exec_plan[:2000]
    assert "HashAggregate" in exec_plan


def test_data_quality_checks_no_cartesian(spark, sf_dir):
    """Referential rules must plan as equi-joins, never nested-loop."""
    plan = plan_of(REGISTRY["data_quality_checks"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sql_udf_inlines_to_codegen(spark, sf_dir):
    """The SQL UDF body must be inlined at plan time — no EvalPython, no
    udf-invoke node; the plan should look like the hand-written expression."""
    plan = plan_of(REGISTRY["sql_udf"].fn(spark, sf_dir))
    assert "EvalPython" not in plan and "Invoke" not in plan.split("\n== ")[0], plan[:2000]
    assert "HashAggregate" in plan


def test_lateral_df_decorrelates_to_group_limit(spark, sf_dir):
    """DataFrame.lateralJoin's correlated LIMIT-2 subquery must decorrelate
    into a bounded per-group top-k (WindowGroupLimit: partial map-side +
    final) joined back — never a per-outer-row re-execution or nested loop."""
    plan = plan_of(REGISTRY["join_lateral_df"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "WindowGroupLimit" in exec_plan, exec_plan[:2000]
    assert "CartesianProduct" not in exec_plan
    assert "BroadcastNestedLoopJoin" not in exec_plan


def test_distinct_salted_is_two_phase(spark, sf_dir):
    """agg_distinct_salted must plan as TWO hash-partitioned exchanges —
    the (type, salt) phase then the type-only phase — with the salt derived
    from a hash of the distinct column (never rand(), which would
    double-count)."""
    plan = plan_of(REGISTRY["agg_distinct_salted"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    # Spark expands the inner countDistinct into its own dedup exchange, so
    # the full ladder is (type, salt, user) -> (type, salt) -> (type): every
    # pre-final exchange carries the salt, which is the skew-proof property.
    n = exec_plan.count("Exchange hashpartitioning")
    assert n == 3, f"expected 3 hash exchanges, found {n}:\n{exec_plan[:2500]}"
    assert "hashpartitioning(event_type" in exec_plan and "salt" in exec_plan
    assert "xxhash64" in exec_plan
    assert "rand(" not in exec_plan


def test_perplexity_filter_no_cartesian_no_python(spark, sf_dir):
    """The LM-scoring join must be a hash join (vocab side broadcast at
    fixture scale); the two corpus scalars are broadcast 1-row frames (the
    only BNLJ allowed); nothing drops to Python."""
    plan = plan_of(REGISTRY["corpus_perplexity_filter"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "BroadcastHashJoin" in exec_plan, exec_plan[:2500]
    assert "CartesianProduct" not in exec_plan
    assert "EvalPython" not in exec_plan


def test_grouping_sets_df_is_single_pass(spark, sf_dir):
    """DataFrame.groupingSets must plan as Expand + ONE partial/final
    aggregate pair — one scan, one shuffle, never one pass per set."""
    plan = plan_of(REGISTRY["agg_grouping_sets_df"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "Expand" in exec_plan, exec_plan[:2000]
    assert exec_plan.count("Scan parquet") == 1, exec_plan[:2000]
    n = exec_plan.count("Exchange hashpartitioning")
    assert n == 1, f"expected 1 hash exchange, found {n}:\n{exec_plan[:2500]}"


def test_geo_grid_density_single_aggregate_no_join(spark, sf_dir):
    """Tile ids are map-side row-local math: the plan must contain no join
    and push the whole rollup through hash aggregates."""
    plan = plan_of(REGISTRY["geo_grid_density"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "Join" not in exec_plan, exec_plan[:2000]
    assert "HashAggregate" in exec_plan


def test_geo_od_matrix_no_joins(spark, sf_dir):
    """Trip endpoints ride the sessionize window's user_id exchange via
    min_by/max_by — the whole OD matrix must plan without any join.

    Pin the underlying build shape through a pass-through loader (bypasses
    the round-12 sessionize memo — same rationale as
    test_trip_distance_single_shuffle)."""
    import rvi_big_data_api_spark.operators.telemetry as T
    from unittest import mock

    from rvi_big_data_api_spark import io

    with mock.patch.object(T, "load", lambda s, d, n: io.load(s, d, n)):
        plan = plan_of(REGISTRY["geo_od_matrix"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "Join" not in exec_plan, exec_plan[:2000]
    assert "Window" in exec_plan and "HashAggregate" in exec_plan


def test_subquery_api_decorrelates_to_semi_anti_pushed_scalar(spark, sf_dir):
    """The Spark 4 subquery-expression API (DataFrame.scalar/.exists with
    Column.outer) must decorrelate to the same physical shapes the
    hand-written composites declare: EXISTS → LeftSemi, ~EXISTS → LeftAnti,
    the non-correlated scalar pushed into the customer scan as a runtime
    filter — and never a cartesian/BNLJ fallback."""
    plan = plan_of(REGISTRY["subquery_scalar_df"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "LeftSemi" in exec_plan, exec_plan[:2000]
    assert "LeftAnti" in exec_plan, exec_plan[:2000]
    assert "GreaterThan(c_acctbal,ScalarSubquery" in exec_plan, exec_plan[:2000]
    assert "BroadcastNestedLoopJoin" not in exec_plan, exec_plan[:2000]
    assert "CartesianProduct" not in exec_plan, exec_plan[:2000]


def test_theta_retention_single_event_pass_no_join(spark, sf_dir):
    """The Theta-sketch retention rollup must touch raw events exactly once
    (one scan, one partial-agg exchange into the per-day sketch table); the
    adjacent-day set algebra is a window over sketch rows, never a
    user-level self-join (the exact formulation its own oracle uses)."""
    plan = plan_of(REGISTRY["agg_theta_retention"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "Join" not in exec_plan, exec_plan[:2000]
    assert exec_plan.count("Scan parquet") == 1, exec_plan[:2000]
    assert "Window" in exec_plan and "HashAggregate" in exec_plan


def test_global_shuffle_no_join_single_scan(spark, sf_dir):
    """The training-order interleave is the range-exchange plan (VERDICT r9
    item 3): per-range offsets fold in over a BROADCAST hash join on the
    256-value key prefix — never a shuffle join — and the only joins are
    that one; ranks come from windows + aggregates."""
    plan = plan_of(REGISTRY["corpus_global_shuffle"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "BroadcastHashJoin" in exec_plan, exec_plan[:2000]
    assert "SortMergeJoin" not in exec_plan, exec_plan[:2000]
    assert "ShuffledHashJoin" not in exec_plan, exec_plan[:2000]
    assert "CartesianProduct" not in exec_plan, exec_plan[:2000]
    assert "Window" in exec_plan and "HashAggregate" in exec_plan


def test_fleet_report_assembles_broadcast_day_aggregates(spark, sf_dir):
    """The daily report's three subsystem rollups must assemble on
    day-cardinality BROADCAST joins (never a shuffle join on the report
    key) and keep the telemetry discipline of no cartesians."""
    plan = plan_of(REGISTRY["fleet_daily_report"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert exec_plan.count("BroadcastHashJoin") == 2, exec_plan[:2500]
    assert "SortMergeJoin" not in exec_plan, exec_plan[:2500]
    assert "CartesianProduct" not in exec_plan


def test_geo_flow_matrix_single_window_no_join(spark, sf_dir):
    """Flow transitions ride ONE user-keyed window exchange plus the final
    pair-keyed aggregate — no join in the plan."""
    plan = plan_of(REGISTRY["geo_flow_matrix"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "Join" not in exec_plan, exec_plan[:2000]
    assert "Window" in exec_plan and "HashAggregate" in exec_plan


def test_embed_hygiene_single_pass_no_join(spark, sf_dir):
    """The hygiene audit is map-side HOF folds + one label-keyed aggregate:
    one scan, no join, no Python in the plan."""
    plan = plan_of(REGISTRY["embed_hygiene_audit"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "Join" not in exec_plan, exec_plan[:2000]
    assert exec_plan.count("Scan parquet") == 1, exec_plan[:2000]
    assert "BatchEvalPython" not in exec_plan and "ArrowEvalPython" not in exec_plan


def test_limit_offset_bounded_heap(spark, sf_dir):
    """Pagination must keep the TakeOrderedAndProject shape (bounded per-task
    heap with the offset absorbed into the limit), not a global sort."""
    plan = plan_of(REGISTRY["limit_offset"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "TakeOrderedAndProject" in exec_plan, exec_plan[:1500]


def test_clean_impute_broadcasts_fill_table(spark, sf_dir):
    """The per-channel fill medians broadcast back onto the stream; the big
    side never shuffles and no Python touches the plan."""
    plan = plan_of(REGISTRY["clean_impute"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "BroadcastHashJoin" in exec_plan, exec_plan[:2000]
    assert "BatchEvalPython" not in exec_plan and "ArrowEvalPython" not in exec_plan


def test_knn_graph_candidates_are_equi_join(spark, sf_dir):
    """Candidate generation must stay an equi-join on the quantizer bucket
    and the mutuality check an equi-join on the reversed pair — no
    data-by-data cartesian anywhere."""
    plan = plan_of(REGISTRY["knn_graph_mutual"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "BroadcastNestedLoopJoin" not in exec_plan, exec_plan[:3000]
    assert "CartesianProduct" not in exec_plan, exec_plan[:3000]


def test_embed_pca_power_no_collect_shape(spark, sf_dir):
    """Power iteration stays declarative: d-row vectors and 1-row norms join
    back as broadcasts (scalar BNLJ rows are the accepted pattern), the
    cov cells come from the vec_id equi-join, and no Python appears."""
    plan = plan_of(REGISTRY["embed_pca_power"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "CartesianProduct" not in exec_plan, exec_plan[:3000]
    assert "BatchEvalPython" not in exec_plan and "ArrowEvalPython" not in exec_plan
    assert "BroadcastHashJoin" in exec_plan or "BroadcastExchange" in exec_plan


def test_label_propagation_no_cartesian_no_python(spark, sf_dir):
    """Vote rounds are edge-list equi-joins + partial-agg votes; nothing may
    plan a data-by-data cartesian or drop into Python."""
    plan = plan_of(REGISTRY["graph_label_propagation"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "CartesianProduct" not in exec_plan, exec_plan[:3000]
    assert "BroadcastNestedLoopJoin" not in exec_plan, exec_plan[:3000]
    assert "BatchEvalPython" not in exec_plan and "ArrowEvalPython" not in exec_plan


def test_containment_joins_on_gram_hash(spark, sf_dir):
    """The pair count must come from the xxhash64 gram equi-join (8-byte
    shuffle keys), not a document cross product."""
    plan = plan_of(REGISTRY["dedup_containment"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "CartesianProduct" not in exec_plan and "BroadcastNestedLoopJoin" not in exec_plan
    assert "xxhash64" in plan, plan[:3000]


def test_maxsim_broadcasts_query_subvectors(spark, sf_dir):
    """The query batch must broadcast; the doc side explodes linearly (its
    bare not-equal join against the broadcast batch is the accepted
    broadcast-tiny BNLJ, never a shuffle of doc pairs)."""
    plan = plan_of(REGISTRY["sim_maxsim_multivector"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert "BroadcastExchange" in exec_plan, exec_plan[:3000]
    assert "CartesianProduct" not in exec_plan


def test_cusum_two_frames_one_exchange(spark, sf_dir):
    """The CUSUM closed form must cost exactly ONE user-keyed shuffle: both
    window frames (running sum, running min over it) stack on the same
    partitioning, and no join/second scan may creep in."""
    plan = plan_of(REGISTRY["anomaly_cusum"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert exec_plan.count("Exchange") == 1, exec_plan[:3000]
    assert "Join" not in exec_plan


def test_scd2_single_key_shuffle(spark, sf_dir):
    """SCD2 interval construction is one lead() window — a single exchange,
    no self-join of changes to changes (the naive build)."""
    plan = plan_of(REGISTRY["cdc_scd2"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert exec_plan.count("Exchange") == 1, exec_plan[:3000]
    assert "Join" not in exec_plan


def test_roc_and_pr_curves_single_scan(spark, sf_dir):
    """Totals must ride the support window, not a broadcast self-aggregate
    re-reading events: exactly one FileScan, no join."""
    for name in ("eval_roc_curve", "eval_pr_curve"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        exec_plan = plan.split("\n== ")[0]
        assert exec_plan.count("Scan parquet") + exec_plan.count(
            "FileScan"
        ) >= 1
        assert exec_plan.count("FileScan") <= 1, (name, exec_plan[:3000])
        assert "Join" not in exec_plan, name


def test_key_skew_audit_rank_is_group_limited(spark, sf_dir):
    """The rank<=K filter over the global order must plan as a bounded
    top-K (WindowGroupLimit, or the Local/GlobalLimit pushdown Spark
    prefers for single-partition rank windows) — never a full sort kept
    past K — and the totals fold in by broadcast."""
    plan = plan_of(REGISTRY["profile_key_skew"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert (
        "WindowGroupLimit" in exec_plan
        or ("GlobalLimit 10" in exec_plan and "LocalLimit 10" in exec_plan)
    ), exec_plan[:3000]
    assert "BroadcastExchange" in exec_plan


def test_transition_matrix_normalizes_on_matrix_not_rows(spark, sf_dir):
    """Row normalization must window over the aggregated matrix (25 rows),
    never re-shuffle raw events: exactly one scan, exchanges bounded."""
    plan = plan_of(REGISTRY["seq_transition_matrix"].fn(spark, sf_dir))
    exec_plan = plan.split("\n== ")[0]
    assert exec_plan.count("FileScan") <= 1, exec_plan[:3000]
    assert "Join" not in exec_plan


def test_hard_negatives_broadcast_anchor_batch(spark, sf_dir):
    """sim_hard_negatives: the anchor batch is broadcast (corpus never
    shuffles for scoring) and the cross-label filter stays map-side — no
    SortMergeJoin, no Python eval."""
    plan = plan_of(REGISTRY["sim_hard_negatives"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_onehot_vocab_joins_are_broadcast(spark, sf_dir):
    """feature_onehot: both fitted vocab tables and the offset scalar reach
    the corpus as broadcasts — the fact table is never shuffle-joined."""
    plan = plan_of(REGISTRY["feature_onehot"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    assert "SortMergeJoin" not in plan


def test_near_verify_pushes_shingle_joins_to_hash(spark, sf_dir):
    """dedup_near_verify: the verify stage is equi-joins + one group-count —
    no cartesian anywhere (the inverted index IS the candidate generator)."""
    plan = plan_of(REGISTRY["dedup_near_verify"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_simhash_verify_chunk_equijoin_no_python(spark, sf_dir):
    """dedup_simhash_verify: candidates come from the (chunk_idx, chunk)
    equi-join on the pigeonhole chunks — never an all-pairs cartesian —
    and the whole pipeline (md5 halves, bit votes, xor+bit_count Hamming)
    stays JVM-side."""
    plan = plan_of(REGISTRY["dedup_simhash_verify"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_bfs_distance_is_single_grouped_arrow_pass(spark, sf_dir):
    """graph_bfs_distance: one FlatMapGroupsInPandas over the label-grouped
    edge list (per-block vectorized BFS), never a row-wise Python eval and
    never a driver-round join loop in the plan."""
    plan = plan_of(REGISTRY["graph_bfs_distance"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert "EvalPython" not in plan


def test_matryoshka_folds_dims_into_one_corpus_scan(spark, sf_dir):
    """eval_matryoshka_recall: the three truncations ride ONE corpus scan
    (exploded constant dim table + broadcast queries) — the parquet
    embeddings scan appears a bounded number of times (exact + trunc arms),
    not once per dimension."""
    df = REGISTRY["eval_matryoshka_recall"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    n_scans = executed.count("Scan parquet")
    # exact arm (corpus + broadcast queries) + trunc arm (same) = 4 scans of
    # the small embeddings file; the three truncations add NO extra scan.
    assert n_scans <= 4, f"{n_scans} scans\n{executed[:2000]}"
    assert "EvalPython" not in executed


def test_variant_explode_is_generator_not_python(spark, sf_dir):
    """fn_variant_explode: the lateral TVF plans as a JVM Generate node."""
    plan = plan_of(REGISTRY["fn_variant_explode"].fn(spark, sf_dir))
    assert "Generate" in plan, plan[:1500]
    assert "EvalPython" not in plan


def test_anova_levene_never_shuffle_the_fact(spark, sf_dir):
    """stats_anova_oneway / stats_levene: the segment dim and every
    K-row/scalar stats table reach the fact rows as broadcasts — orders
    rows are never shuffle-joined, and no Python eval enters the plan."""
    for name in ("stats_anova_oneway", "stats_levene"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
            name,
            plan[:2000],
        )
        assert "SortMergeJoin" not in plan, name
        assert "EvalPython" not in plan, name


def test_acf_is_one_scan_no_join(spark, sf_dir):
    """ts_autocorrelation: ONE orders scan collapses to the daily series;
    the lag window and the 7 corr aggregates run over that aggregated
    frame — no join, no second scan."""
    df = REGISTRY["ts_autocorrelation"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]
    assert "Join" not in executed, executed[:3000]


def test_holt_is_single_grouped_arrow_pass(spark, sf_dir):
    """ts_holt_linear: the sequential recursion is ONE FlatMapGroupsInPandas
    over the per-type daily series (already aggregated — the Arrow batch is
    days, not events), never a row-wise Python eval."""
    df = REGISTRY["ts_holt_linear"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "FlatMapGroupsInPandas" in plan, plan[:2000]
    assert "EvalPython" not in plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]


def test_nearest_poi_argmin_is_mapside_in_both_gears(spark, sf_dir, monkeypatch):
    """geo_nearest_poi: the O(N·|poi|) argmin runs MAP-SIDE in both gears
    (round 13) — fact rows never shuffle; the only exchange is the
    |poi|-key rollup. Default gear (|poi| <= POI_LEAST_MAX): least() over
    literal candidate structs — a join-FREE codegen'd scalar tree (no
    BNLJ at all). Forced HOF gear: the POI dim collapses to a one-row
    broadcast array consumed via transform+array_min (the BNLJ is that
    1-row broadcast, the established scalar-fold shape)."""
    from rvi_big_data_api_spark.operators import telemetry

    plan = plan_of(REGISTRY["geo_nearest_poi"].fn(spark, sf_dir))
    assert "Join" not in plan, plan[:2000]  # literal gear: no join operator
    assert "least(" in plan, plan[:2000]   # the codegen'd literal argmin
    assert "EvalPython" not in plan
    monkeypatch.setattr(telemetry, "POI_LEAST_MAX", 0)
    plan = plan_of(REGISTRY["geo_nearest_poi"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_clustering_coefficient_equijoins_only(spark, sf_dir):
    """graph_clustering_coefficient: wedge close + degree join are
    (label, endpoint) equi-joins over the checkpointed pair list — no
    cartesian, no broadcast-NL fallback, no Python eval."""
    plan = plan_of(REGISTRY["graph_clustering_coefficient"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_bootstrap_is_one_scan_explode(spark, sf_dir):
    """stats_bootstrap_ci: all B replicates ride ONE orders scan (explode×B
    is a Generate node, the replicate agg is partial) — plus the tiny
    point-estimate scan joined as a broadcast; no Python eval."""
    df = REGISTRY["stats_bootstrap_ci"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in executed, executed[:2000]
    assert executed.count("Scan parquet") <= 2, executed[:3000]
    assert "EvalPython" not in executed


def test_pseudonymize_is_map_side_token_plus_one_agg(spark, sf_dir):
    """privacy_pseudonymize: the token is scalar codegen (no join, no
    window); the profile is one hash aggregate over one scan."""
    df = REGISTRY["privacy_pseudonymize"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]
    assert "Join" not in executed
    assert "EvalPython" not in executed


def test_mm_content_dedup_shuffles_fingerprints_only(spark, sf_dir):
    """mm_content_dedup: the blob hash is computed at scan projection
    (binary content never reaches the exchange — the shuffle carries
    hash/doc/shard only) and the group is a hash aggregate."""
    df = REGISTRY["mm_content_dedup"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    # content column must not survive past the project under the aggregate
    agg_side = executed.split("Exchange")[0]
    assert "content#" not in agg_side.split("Scan ")[0], agg_side[:2000]
    assert "EvalPython" not in executed


def test_jsd_vocab_is_broadcast_not_shuffle_join(spark, sf_dir):
    """text_jsd_drift: the top-V vocabulary reaches the token stream as a
    BROADCAST (full-vocab shuffle join would be the 100 TB mistake); the
    final JSD window runs over the bounded bucket report."""
    plan = plan_of(REGISTRY["text_jsd_drift"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_pop_is_one_scan_one_window(spark, sf_dir):
    """ts_period_over_period: one orders scan collapses to the daily
    series; both lags share ONE window over it — no join, no second
    scan."""
    df = REGISTRY["ts_period_over_period"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]
    assert "Join" not in executed
    assert executed.count("Window") <= 1, executed[:3000]


def test_assortativity_equijoins_only(spark, sf_dir):
    """graph_assortativity: degree decoration is two (label, endpoint)
    equi-joins over the checkpointed pairs — no cartesian/BNLJ, no
    Python eval."""
    plan = plan_of(REGISTRY["graph_assortativity"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_decompose_single_scan_broadcast_seasonal(spark, sf_dir):
    """ts_decompose_classical: the fact collapses once; the 24-row
    seasonal profile rejoins as a broadcast; no Python eval."""
    plan = plan_of(REGISTRY["ts_decompose_classical"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_fairness_is_two_partial_aggs(spark, sf_dir):
    """eval_fairness_report: user rollup then cohort rollup — one scan,
    no join; the DI window runs over the cohort rows."""
    df = REGISTRY["eval_fairness_report"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]
    assert "Join" not in executed
    assert "EvalPython" not in executed


def test_csv_gzip_read_parallelism(spark, sf_dir):
    """scan_csv_gzip: the staged lake is multiple .gz parts, so the
    non-splittable codec still yields parallel input tasks."""
    import glob
    import os
    import tempfile

    REGISTRY["scan_csv_gzip"].fn(spark, sf_dir).count()
    root = os.path.join(tempfile.gettempdir(), "rvi_spark_scratch")
    parts = glob.glob(os.path.join(root, "csv_gz-*", "*.csv.gz"))
    assert len(parts) >= 2, parts


def test_projection_matrix_is_broadcast(spark, sf_dir):
    """embed_random_projection: the sign matrix reaches the exploded
    vectors as a broadcast; the projection is a partial agg — no
    SortMergeJoin, no Python eval."""
    plan = plan_of(REGISTRY["embed_random_projection"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_track_simplify_single_exchange(spark, sf_dir):
    """geo_track_simplify: the user window and the per-user agg share ONE
    user_id exchange (the telemetry single-shuffle rule)."""
    plan = plan_of(REGISTRY["geo_track_simplify"].fn(spark, sf_dir))
    n_exchanges = plan.split("\n== ")[0].count("Exchange ")
    assert n_exchanges == 1, f"expected 1 Exchange, found {n_exchanges}:\n{plan[:2500]}"


def test_dp_histogram_one_scan_no_join(spark, sf_dir):
    """privacy_dp_histogram: noise is a scalar expression on the
    aggregated rows — one scan, no join, no Python eval."""
    df = REGISTRY["privacy_dp_histogram"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]
    assert "Join" not in executed
    assert "EvalPython" not in executed


def test_threshold_sweep_gemm_prefilter_exact_verify(spark, sf_dir):
    """dedup_threshold_sweep: candidates come from the chunk-pair GEMM
    (FlatMapGroupsInPandas), the exact fold re-verification is equi-joined
    by id, and the five thresholds are conditional aggregates — never a
    cartesian, never the fold-inside-self-join cliff."""
    plan = plan_of(REGISTRY["dedup_threshold_sweep"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan[:2500]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mmr_reranks_candidates_only(spark, sf_dir):
    """eval_mmr_diversify: the corpus is scanned a bounded number of times
    (stage-1 arms), and picks 2/3 decorate the candidate set via
    broadcasts — no SortMergeJoin anywhere."""
    plan = plan_of(REGISTRY["eval_mmr_diversify"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan[:2500]
    assert "EvalPython" not in plan


def test_auc_shares_support_windows(spark, sf_dir):
    """eval_auc_trapezoid: one events scan, windows over the score
    support, no join, no Python eval."""
    df = REGISTRY["eval_auc_trapezoid"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]
    assert "Join" not in executed
    assert "EvalPython" not in executed


def test_centroid_drift_single_expand(spark, sf_dir):
    """embed_centroid_drift: one corpus scan exploded map-side; snapshots
    are conditional aggregates, never a self-join."""
    df = REGISTRY["embed_centroid_drift"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]
    assert "Join" not in executed
    assert "Generate" in executed, executed[:2000]


# --- round-7 wave: sketches, changesets, stats, density clustering ---------


def test_countmin_broadcasts_cells_no_cartesian(spark, sf_dir):
    """agg_countmin: the 256-cell sketch table reaches the probe rows as a
    broadcast hash join on (j, bucket); the build is a partial agg (the
    shuffle carries cells, not events); never a cartesian."""
    plan = plan_of(REGISTRY["agg_countmin"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2500]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_bloom_probe_is_broadcast_joins_only(spark, sf_dir):
    """agg_bloom_filter: the set-bit position table and the member list are
    broadcasts; the only nested-loop is the final 1-row bits_set
    decoration (the scalar-crossJoin convention)."""
    executed = (
        REGISTRY["agg_bloom_filter"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert executed.count("BroadcastHashJoin") >= 2, executed[:2500]
    assert "CartesianProduct" not in executed
    assert executed.count("BroadcastNestedLoopJoin") <= 1, executed[:2500]
    assert "EvalPython" not in executed


def test_snapshot_diff_is_two_partial_aggs_one_join(spark, sf_dir):
    """cdc_snapshot_diff: each snapshot reduces map-side to per-user state
    BEFORE the full-outer join — the join sees state rows, never events;
    no cartesian, no Python eval."""
    plan = plan_of(REGISTRY["cdc_snapshot_diff"].fn(spark, sf_dir))
    assert "FullOuter" in plan, plan[:2500]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_incremental_merge_two_level_hash_agg_no_join(spark, sf_dir):
    """agg_incremental_merge: shard partials then merge — all hash
    aggregates over ONE scan, no join anywhere."""
    df = REGISTRY["agg_incremental_merge"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 1, executed[:3000]
    assert "Join" not in executed
    assert executed.count("HashAggregate") >= 2, executed[:3000]


def test_kruskal_histogram_ranking_no_row_sort(spark, sf_dir):
    """stats_kruskal_wallis: histogram ranking — rows reduce to (segment,
    value) counts before ANY ranking, the mid-rank join is an equi-join
    on the value table, and the only nested-loop is the 1-row ties
    decoration. A global row_number over N rows (the sort-based textbook
    formulation) would triple-scan the fact join — pinned out."""
    df = REGISTRY["stats_kruskal_wallis"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in executed
    assert executed.count("BroadcastNestedLoopJoin") <= 1, executed[:2500]
    assert "EvalPython" not in executed
    # ranking runs on the aggregated value frame: the window input must be
    # a HashAggregate, and no row_number window exists at all
    assert "row_number" not in executed, executed[:2500]


def test_woe_encoder_single_fact_scan_window_totals(spark, sf_dir):
    """feature_woe: orders join customers once, two partial-agg levels,
    class totals ride a window over the K-row segment frame — no second
    scan of either fact table."""
    df = REGISTRY["feature_woe"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 2, executed[:3000]
    assert "CartesianProduct" not in executed
    assert "EvalPython" not in executed


def test_suppression_aggregates_only_single_scan(spark, sf_dir):
    """privacy_suppression: the lattice walk re-aggregates the GROUP
    table; the corpus is scanned once per union branch at most and no
    join appears anywhere."""
    df = REGISTRY["privacy_suppression"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in executed, executed[:3000]
    assert "EvalPython" not in executed


def test_dbscan_adjacency_is_equijoin(spark, sf_dir):
    """geo_dbscan_grid: neighbor discovery is the exploded-key equi-join
    (hash join on the packed cell key), never a theta/cartesian pair
    enumeration — the pin that keeps the op linear in cells."""
    plan = plan_of(REGISTRY["geo_dbscan_grid"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan  # no row-at-a-time python
    # components are ONE Arrow union-find task over the geometry-bounded
    # edge list; the neighbor discovery feeding it is the exploded-key
    # equi-join (Generate + hash join), all visible in one plan now that
    # no checkpoint truncates it
    assert "FlatMapGroupsInPandas" in plan, plan[:2500]
    assert "Generate" in plan, plan[:2500]


def test_xcorr_is_daily_frame_self_join(spark, sf_dir):
    """ts_cross_correlation: events reduce to the daily frame FIRST; the
    lag join runs on |days| rows as an equi-join on the shifted day key;
    power sums are one hash agg."""
    plan = plan_of(REGISTRY["ts_cross_correlation"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_cotravel_stamp_join_no_cartesian(spark, sf_dir):
    """geo_cotravel: the pair enumeration is the stamp-keyed equi-self-join
    (inverted-index shape), the size decorations are broadcasts — never a
    cartesian over users."""
    plan = plan_of(REGISTRY["geo_cotravel"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_seasonal_strength_single_scan_hourly_frame(spark, sf_dir):
    """ts_seasonal_strength: one events scan collapses to the hourly frame;
    the seasonal join is a broadcast over 24 rows; power sums are one
    fold."""
    df = REGISTRY["ts_seasonal_strength"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Scan parquet") <= 2, executed[:3000]
    assert "CartesianProduct" not in executed
    assert "SortMergeJoin" not in executed
    assert "EvalPython" not in executed


def test_quantile_histogram_no_sort_of_rows(spark, sf_dir):
    """agg_quantile_histogram: rows fold map-side into the (group, cents)
    histogram BEFORE any ordering — the only Sort in the plan orders the
    histogram window, and no global row sort / per-group percentile sort
    exists."""
    df = REGISTRY["agg_quantile_histogram"].fn(spark, sf_dir)
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in executed, executed[:3000]
    assert "percentile" not in executed, executed[:3000]
    assert executed.count("HashAggregate") >= 2, executed[:3000]
    assert "EvalPython" not in executed


def test_mcnemar_shares_one_ranking_subtree(spark, sf_dir):
    """eval_mcnemar_paired: the corpus-side work is the one broadcast
    ranking scan (query side broadcast, never corpus x corpus); the only
    merge join allowed is the qid-keyed pairing of the two tiny
    prediction frames (both already qid-partitioned by their windows)."""
    executed = (
        REGISTRY["eval_mcnemar_paired"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in executed
    assert executed.count("SortMergeJoin") <= 1, executed[:2500]
    assert "BroadcastNestedLoopJoin" in executed or "BroadcastHashJoin" in executed, (
        executed[:2500]
    )
    assert "EvalPython" not in executed


def test_markov_holdout_model_joins_are_broadcast(spark, sf_dir):
    """seq_markov_holdout: after the two lag windows, every join runs on
    the <= S^2-row transition tables as broadcasts; no cartesian beyond
    the 1-row states/n_train decorations."""
    executed = (
        REGISTRY["seq_markov_holdout"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in executed
    assert "SortMergeJoin" not in executed, executed[:2500]
    assert "EvalPython" not in executed


def test_correlation_matrix_pairs_on_cells_not_events(spark, sf_dir):
    """profile_correlation_matrix: the pair self-join keys on the cell row
    id (equi-join after the explode) — events fold to cells first, and no
    nested-loop pairing of measures exists."""
    executed = (
        REGISTRY["profile_correlation_matrix"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in executed
    assert "BroadcastNestedLoopJoin" not in executed
    assert "EvalPython" not in executed
    assert "Generate" in executed, executed[:2500]


def test_dwell_segments_single_user_exchange(spark, sf_dir):
    """geo_dwell_segments: lag, flag, running sum and both aggs share ONE
    user_id exchange (the telemetry single-shuffle rule) — the second agg
    rides the same partitioning because its keys extend the first's."""
    plan = plan_of(REGISTRY["geo_dwell_segments"].fn(spark, sf_dir))
    n_exchanges = plan.split("\n== ")[0].count("Exchange ")
    assert n_exchanges <= 2, f"expected <=2 Exchange, found {n_exchanges}:\n{plan[:2500]}"
    assert "EvalPython" not in plan


def test_phash_band_join_is_chunk_keyed(spark, sf_dir):
    """mm_phash_band: the candidate join keys on (k, chunk-hash) — an
    equi-join over 16-byte fingerprints; blobs never shuffle and no
    cartesian appears."""
    executed = (
        REGISTRY["mm_phash_band"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in executed
    assert "BroadcastNestedLoopJoin" not in executed
    assert "EvalPython" not in executed


def test_pinned_embed_dedup_bucket_equijoin(spark, sf_dir):
    """dedup_embed_pinned8: the candidate join is the 8-bit-bucket
    equi-join — no cartesian, no nested loop, no python eval."""
    executed = (
        REGISTRY["dedup_embed_pinned8"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in executed
    assert "BroadcastNestedLoopJoin" not in executed
    assert "EvalPython" not in executed


def test_multimodal_pipeline_blobs_never_shuffle(spark, sf_dir):
    """corpus_multimodal_pipeline: every join keys on hashes or doc ids —
    no cartesian, no nested loop, no python eval anywhere in the curation
    funnel."""
    executed = (
        REGISTRY["corpus_multimodal_pipeline"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in executed
    assert "BroadcastNestedLoopJoin" not in executed
    assert "EvalPython" not in executed


def test_record_linkage_joins_on_deletion_keys(spark, sf_dir):
    """er_record_linkage: candidates come from the (nation, delkey)
    equi-join — no cartesian, no nested loop, no python eval; the verify
    stage never re-scans the customer table (two base scans total: one
    per side of the dirty union, re-used by both key emissions)."""
    executed = (
        REGISTRY["er_record_linkage"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in executed
    assert "BroadcastNestedLoopJoin" not in executed
    assert "EvalPython" not in executed


def test_graph_hits_chain_is_truncated(spark, sf_dir):
    """graph_hits: the per-level eager checkpoint must keep the doubly-
    referenced score chain from re-planning 2^levels subtrees — the first
    cut planned 109 exchanges / 46 scans; the pin allows a small constant
    (one exchange per half-step plus the final joins)."""
    plan = (
        REGISTRY["graph_hits"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 12, plan.count("Exchange")
    assert "EvalPython" not in plan


def test_bloom_sink_lookup_is_pushed_down(spark, sf_dir):
    """sink_parquet_bloom: the IN-list point lookup must reach the parquet
    reader as a pushed filter (PushedFilters carries In(o_custkey, ...)),
    else the scan reads every row group and the bloom layout is wasted."""
    plan = (
        REGISTRY["sink_parquet_bloom"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [In(o_custkey" in plan, "lookup not pushed to scan"


def test_audio_energy_frames_map_side(spark, sf_dir):
    """mm_audio_energy: framing fans out map-side — ZERO exchanges before
    the frames exist (the executed plan has no shuffle at all; downstream
    consumers pay the first one)."""
    plan = (
        REGISTRY["mm_audio_energy"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "audio framing must not shuffle"


def test_permutation_test_single_corpus_scan_per_side(spark, sf_dir):
    """stats_permutation_test: the K relabelings must NOT multiply corpus
    scans — the plan reads events at most twice (observed side + permuted
    side), never K times."""
    plan = (
        REGISTRY["stats_permutation_test"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") <= 2, plan.count("Scan parquet")
    assert "EvalPython" not in plan


@pytest.mark.parametrize("name", ["eval_lift_table", "corpus_curriculum_order"])
def test_rank_windows_are_partitioned(spark, sf_dir, name):
    """VERDICT r8 item 2: the decile/phase assignment must come from the
    score-histogram boundary plan — any row_number() in the optimized plan
    must be PARTITIONED (by the score group), never an unpartitioned window
    over the corpus-sized frame. An unpartitioned Window prints one bracket
    group after the exprs (`], [order]`); a partitioned one prints two
    (`], [part], [order]`)."""
    plan = (
        REGISTRY[name].fn(spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    rank_lines = [l for l in plan.splitlines() if "row_number()" in l]
    assert rank_lines, "histogram-boundary plan still needs the straddle rank"
    for line in rank_lines:
        assert line.count("], [") >= 2, f"unpartitioned row_number: {line.strip()[:200]}"


@pytest.mark.parametrize(
    "name", ["corpus_perplexity_filter", "corpus_global_shuffle"]
)
def test_round10_rank_windows_are_partitioned(spark, sf_dir, name):
    """VERDICT r9 item 3: the quintile/rank assignment must come from the
    histogram-boundary / range-exchange plan — any row_number() in the
    optimized plan must be PARTITIONED (by score key / key-prefix range),
    never an unpartitioned window over the corpus-sized doc frame; ntile
    must be gone entirely."""
    plan = (
        REGISTRY[name].fn(spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "ntile" not in plan, name
    rank_lines = [l for l in plan.splitlines() if "row_number()" in l]
    assert rank_lines, "boundary plan still needs the partitioned straddle/range rank"
    for line in rank_lines:
        assert line.count("], [") >= 2, f"unpartitioned row_number: {line.strip()[:200]}"


@pytest.mark.parametrize(
    "name", ["agg_mannwhitney_u", "stats_effect_sizes", "stats_wilcoxon_signrank"]
)
def test_round10_midranks_have_no_row_rank(spark, sf_dir, name):
    """VERDICT r9 item 2: midranks must come from the support-histogram
    algebra (stats_kruskal_wallis's 2·midrank = 2·(cum−t)+t+1 over the
    spend_cents SUPPORT) — no row-level rank function anywhere in the plan;
    the only window is the prefix sum over distinct cents values."""
    plan = (
        REGISTRY[name].fn(spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "row_number()" not in plan, name
    assert "ntile" not in plan, name
    assert "rank(" not in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "mm_cdc_clamped",
        "text_unigram_train",
        "text_unigram_apply",
        "corpus_tokenizer_compare",
        "stats_wilcoxon_signrank",
        "eval_sequential_msprt",
        "eval_ratio_delta_ci",
        "stats_kaplan_meier",
        "ts_forecast_backtest",
    ],
)
def test_round10_ops_never_nested_loop_on_data(spark, sf_dir, name):
    """Round-10 additions plan pure equi-joins on their data paths: no
    cartesian products, no Python eval; broadcast nested loops are allowed
    only for 1-row scalar folds (the established crossJoin(broadcast(agg))
    convention) — pinned by asserting every BNLJ input is a broadcast of a
    single-row aggregate, which the plans express as BroadcastNestedLoopJoin
    over an Aggregate with no grouping keys. We approximate that here by
    bounding the BNLJ count to the op's declared scalar folds (<= 3)."""
    plan = (
        REGISTRY[name].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, name
    assert "EvalPython" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= 3, name


@pytest.mark.parametrize(
    "name",
    ["ts_motif_discovery", "mm_cdc_dedup", "text_substring_dedup", "mm_cdc_containment"],
)
def test_round9_heavy_ops_never_nested_loop(spark, sf_dir, name):
    """The round-9 candidate-generation ops must plan pure equi-joins: no
    cartesian, no broadcast nested loop, no Python eval — the banded/bucketed
    geometry is the point of each op."""
    plan = (
        REGISTRY[name].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "EvalPython" not in plan, name


@pytest.mark.parametrize(
    "name,max_bnlj",
    [
        ("eval_bradley_terry", 0),
        # text_lang_id's one allowed BNLJ is the broadcast of the
        # checkpointed |langs|-row model against doclen (every classifier
        # scores every class); the data-path joins (profile scoring on the
        # word key) are equi-joins and the model's scalar folds run once
        # inside the eager checkpoint, not in the registered plan.
        ("text_lang_id", 1),
    ],
)
def test_round11_ops_never_nested_loop_on_data(spark, sf_dir, name, max_bnlj):
    """Round-11 additions plan pure equi-joins on their data paths: no
    cartesian products, no Python eval, BNLJ only as broadcasts of
    model-sized/scalar frames, and every rank window PARTITIONED — never
    an unpartitioned window over a corpus-sized frame."""
    qe = REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "EvalPython" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj, name
    opt = qe.optimizedPlan().toString()
    for line in (l for l in opt.splitlines() if "row_number()" in l):
        # Window prints [exprs], [part], [sort] (>= 2 bracket pairs when
        # partitioned); WindowGroupLimit prints [part], [sort], fn, k (1 pair,
        # and an empty partition spec would print as "[], [").
        if "WindowGroupLimit" in line:
            assert "], [" in line and "[], [" not in line, (
                f"unpartitioned rank limit: {line.strip()[:200]}"
            )
        else:
            assert line.count("], [") >= 2, (
                f"unpartitioned row_number: {line.strip()[:200]}"
            )


@pytest.mark.parametrize(
    "name,max_bnlj",
    [
        # spearman/brier/periodogram end in 1-row scalar folds (the
        # crossJoin(broadcast(agg)) convention); readability is pure agg
        ("stats_spearman", 2),
        ("text_readability", 0),
        ("eval_brier_decomposition", 1),
        ("ts_periodogram", 0),
    ],
)
def test_round11_wave2_plans(spark, sf_dir, name, max_bnlj):
    """Wave-2 additions: no cartesian, no Python eval, BNLJ bounded to the
    declared scalar folds, rank windows partitioned (periodogram's argmax
    is per-channel; spearman's prefix sums run over value supports)."""
    qe = REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "EvalPython" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj, name


@pytest.mark.parametrize(
    "name,max_bnlj",
    [
        # friedman ends in scalar folds (k + tie totals); the isotonic
        # minimax's j<=k / j<=i<=k interval joins are non-equi over the
        # <= BRIER_BINS-row bin frame — model-sized by construction, the
        # one place a bounded BNLJ is the honest plan
        ("stats_friedman", 3),
        ("eval_isotonic_calibration", 3),
        ("privacy_entropy_ldiv", 0),
    ],
)
def test_round11_wave3_plans(spark, sf_dir, name, max_bnlj):
    """Wave-3 additions: no cartesian, no Python eval, BNLJ bounded to the
    declared scalar folds / bin-frame interval joins."""
    qe = REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "EvalPython" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj, name


@pytest.mark.parametrize(
    "name,max_bnlj",
    [
        ("agg_distinct_growth", 0),
        ("stats_proportion_ztest", 0),
    ],
)
def test_round11_wave4_plans(spark, sf_dir, name, max_bnlj):
    """Wave-4 additions plan pure partial-agg + equi-join shapes."""
    qe = REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "EvalPython" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj, name


@pytest.mark.parametrize(
    "name,max_bnlj",
    [
        ("win_skyline_pareto", 0),
        # the one BNLJ is the broadcast 1-row global type count
        ("text_kneser_ney", 1),
        ("composite_price_volume_mix", 0),
    ],
)
def test_round11_wave7_plans(spark, sf_dir, name, max_bnlj):
    """Wave-7 additions: no cartesian/PyEval; skyline's window is
    partitioned by brand; kneser-ney's global rank runs on the bigram-
    type table (WindowGroupLimit-prunable)."""
    qe = REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "EvalPython" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj, name


def test_heaps_law_rank_is_distributed(spark, sf_dir):
    """VERDICT r11 item 1: text_heaps_law's doc_id rank must be the
    range-exchange plan (bucket by doc_id range, broadcast cumulative
    offsets, row_number PARTITIONED by bucket) — never a single
    unpartitioned Window over the full documents table, and the windowed
    frame must NOT carry the text payload (only doc_id/bucket ride the
    exchange; text joins back on doc_id)."""
    qe = REGISTRY["text_heaps_law"].fn(spark, sf_dir)._jdf.queryExecution()
    opt = qe.optimizedPlan().toString()
    rank_lines = [l for l in opt.splitlines() if "row_number()" in l]
    assert rank_lines, "range-exchange plan still needs the partitioned rank"
    for line in rank_lines:
        assert line.count("], [") >= 2, (
            f"unpartitioned row_number: {line.strip()[:200]}"
        )
        assert "text" not in line, (
            f"text payload carried through the rank window: {line.strip()[:200]}"
        )
    plan = qe.executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
