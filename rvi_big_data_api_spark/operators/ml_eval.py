"""Model-evaluation and feature-engineering operators — the measurement
layer a training-data pipeline runs AFTER retrieval/dedup/labeling and the
feature-preparation steps it runs BEFORE training.

Reference note: `/root/reference/` is empty (SURVEY.md §0); these extend the
SURVEY §2.13 LLM-pipeline mandate with the standard evaluation loop
(ranking metrics, classification report, two-sample tests) and the two
feature transforms (hashing trick, scaling) every tabular/embedding
training set needs. All metrics are hash-checked against DuckDB twins —
an eval metric that is itself unverified is a silent-quality bug
(eval_ann_recall's rule, applied to the whole family).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load
from ..registry import query
from .llm_sim import (
    KNN_K,
    KNN_NQUERIES,
    SIM_TOPK_K,
    SIM_TOPK_NQUERIES,
    block_pairs_gemm,
    dot,
    knn_label,
    signbit_bucket,
)

RET_DEPTH = 10  # system retrieval depth for ranking metrics (> truth K)
# Binary-gain ideal DCG for SIM_TOPK_K relevant items at the top of the
# list: a Python-computed constant embedded as the SAME decimal literal in
# both dialects (repr round-trips exactly to the double both engines parse).
RET_IDCG = sum(1.0 / math.log2(i + 1) for i in range(1, SIM_TOPK_K + 1))


@query(
    "eval_retrieval_metrics",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               ((embedding[1] > 0)::INT * 1 + (embedding[2] > 0)::INT * 2
                + (embedding[3] > 0)::INT * 4 + (embedding[4] > 0)::INT * 8) AS bucket
        FROM embeddings
    ),
    truth AS (
        SELECT qid, vec_id FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {SIM_TOPK_K}
    ),
    retrieved AS (
        SELECT qid, vec_id, rank FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM bucketed q JOIN bucketed e
              ON q.bucket = e.bucket AND e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {RET_DEPTH}
    ),
    marked AS (
        SELECT r.qid, r.rank,
               CASE WHEN t.vec_id IS NULL THEN 0 ELSE 1 END AS hit
        FROM retrieved r LEFT JOIN truth t
          ON r.qid = t.qid AND r.vec_id = t.vec_id
    )
    SELECT qid,
           round(coalesce(1.0 / min(CASE WHEN hit = 1 THEN rank END), 0.0), 4)
               AS mrr,
           round(sum(hit) / {RET_DEPTH}.0, 4) AS precision_at_k,
           round(sum(CASE WHEN hit = 1 THEN 1.0 / log2(rank + 1) ELSE 0 END)
                 / {RET_IDCG!r}, 4) AS ndcg_at_k
    FROM marked GROUP BY qid
    """,
    tags=("llm", "similarity", "eval"),
)
def eval_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality metrics (MRR, precision@k, NDCG@k) of the sign-bit
    ANN arm against exhaustive-cosine ground truth, per query — the
    position-aware companion to eval_ann_recall's set-overlap recall.
    Recall says WHETHER the true neighbors were retrieved; NDCG/MRR say
    WHERE in the list they landed, which is what a reranker or a RAG
    context-window cutoff actually consumes.

    Gains are binary (membership in the exact top-K), IDCG is therefore the
    constant best-case prefix sum, embedded as the same decimal literal in
    both dialects. Scale shape is eval_ann_recall's: the ground-truth arm
    runs over a SAMPLED query batch (broadcast, corpus never shuffles);
    the retrieved arm is the production bucket-equi-join. log2 is libm in
    both engines (PARITY rule 8; 4-dp round)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        signbit_bucket(F.col("embedding")).alias("q_bucket"),
    )
    corpus = e.withColumn("bucket", signbit_bucket(F.col("embedding")))
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())

    truth = (
        corpus.crossJoin(F.broadcast(q.select("qid", "q_emb")))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SIM_TOPK_K)
        .select("qid", "vec_id")
    )
    retrieved = (
        corpus.join(F.broadcast(q), corpus.bucket == q.q_bucket)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RET_DEPTH)
        .select("qid", "vec_id", "rank")
    )
    marked = retrieved.join(
        truth.withColumn("hit", F.lit(1)), ["qid", "vec_id"], "left"
    ).select("qid", "rank", F.coalesce(F.col("hit"), F.lit(0)).alias("hit"))
    return marked.groupBy("qid").agg(
        F.round(
            F.coalesce(
                F.lit(1.0) / F.min(F.when(F.col("hit") == 1, F.col("rank"))),
                F.lit(0.0),
            ),
            4,
        ).alias("mrr"),
        F.round(F.sum("hit") / F.lit(float(RET_DEPTH)), 4).alias("precision_at_k"),
        F.round(
            F.sum(
                F.when(F.col("hit") == 1, F.lit(1.0) / F.log2(F.col("rank") + 1)).otherwise(
                    F.lit(0.0)
                )
            )
            / F.lit(RET_IDCG),
            4,
        ).alias("ndcg_at_k"),
    )


@query(
    "eval_classification_report",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS qid, e.label,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings e ON e.vec_id >= {KNN_NQUERIES}
        WHERE q.vec_id < {KNN_NQUERIES}
    ),
    votes AS (
        SELECT qid, label, count(*)::BIGINT AS n_votes
        FROM scored WHERE rank <= {KNN_K}
        GROUP BY qid, label
    ),
    preds AS (
        SELECT qid, label AS pred FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                                         ORDER BY n_votes DESC, label ASC) AS vr
            FROM votes
        ) WHERE vr = 1
    ),
    pairs AS (
        SELECT p.qid, e.label AS truth, p.pred
        FROM preds p JOIN embeddings e ON p.qid = e.vec_id
    ),
    by_truth AS (
        SELECT truth AS label,
               sum(CASE WHEN pred = truth THEN 1 ELSE 0 END)::BIGINT AS tp,
               sum(CASE WHEN pred != truth THEN 1 ELSE 0 END)::BIGINT AS fn
        FROM pairs GROUP BY truth
    ),
    by_pred AS (
        SELECT pred AS label,
               sum(CASE WHEN pred != truth THEN 1 ELSE 0 END)::BIGINT AS fp
        FROM pairs GROUP BY pred
    )
    SELECT coalesce(t.label, p.label) AS label,
           coalesce(t.tp, 0)::BIGINT AS tp,
           coalesce(p.fp, 0)::BIGINT AS fp,
           coalesce(t.fn, 0)::BIGINT AS fn,
           round(coalesce(t.tp, 0) / nullif(coalesce(t.tp, 0) + coalesce(p.fp, 0), 0), 4)
               AS precision,
           round(coalesce(t.tp, 0) / nullif(coalesce(t.tp, 0) + coalesce(t.fn, 0), 0), 4)
               AS recall
    FROM by_truth t FULL JOIN by_pred p ON t.label = p.label
    """,
    tags=("llm", "similarity", "eval"),
)
def eval_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall confusion report for knn_label's
    classification-by-retrieval — the quality gate on any auto-labeling
    pass before its labels enter a training set. Reuses knn_label's exact
    registered plan for the predictions (one contract, two consumers), joins
    the held-out true labels back, and derives per-class TP/FN from a
    group-by on the true label plus FP from a group-by on the predicted
    label, stitched with a FULL join so classes that are never predicted
    (recall but no precision) and never true (precision but no recall)
    both surface with NULL for the undefined metric (nullif guard).

    Scale shape: the prediction subtree is knn_label's broadcast-query
    pattern and is the expensive arm; it feeds BOTH aggregate branches, so
    it is eagerly checkpointed once (graph_triangle_count's rule — without
    truncation the kNN scoring job would run under each branch). The
    report itself aggregates Q rows twice and full-joins two label-sized
    sides — driver-trivial."""
    e = load(spark, sf_dir, "embeddings")
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    truth = e.filter(F.col("vec_id") < KNN_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("truth")
    )
    pairs = (
        knn_label(spark, sf_dir)
        .select("qid", F.col("predicted_label").alias("pred"))
        .join(F.broadcast(truth), "qid")
        .checkpoint(eager=True)
    )
    by_truth = pairs.groupBy(F.col("truth").alias("label")).agg(
        F.sum(F.when(F.col("pred") == F.col("truth"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") != F.col("truth"), 1).otherwise(0)).alias("fn"),
    )
    by_pred = pairs.groupBy(F.col("pred").alias("label")).agg(
        F.sum(F.when(F.col("pred") != F.col("truth"), 1).otherwise(0)).alias("fp"),
    )
    joined = by_truth.join(by_pred, "label", "full").select(
        "label",
        F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
        F.coalesce(F.col("fp"), F.lit(0)).alias("fp"),
        F.coalesce(F.col("fn"), F.lit(0)).alias("fn"),
    )
    return joined.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 4
        ).alias("precision"),
        F.round(
            F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 4
        ).alias("recall"),
    )


FEATURE_HASH_BUCKETS = 64  # hashed feature-vector width


@query(
    "feature_hashing",
    oracle=f"""
    WITH feats AS (
        SELECT c_custkey AS entity_id, 'seg=' || c_mktsegment AS feat FROM customer
        UNION ALL
        SELECT c_custkey, 'nat=' || c_nationkey::VARCHAR FROM customer
        UNION ALL
        SELECT o_custkey, 'prio=' || o_orderpriority FROM orders
    )
    SELECT entity_id,
           (('0x' || substr(md5(feat), 1, 8))::BIGINT % {FEATURE_HASH_BUCKETS})::INT
               AS bucket,
           count(*)::BIGINT AS weight
    FROM feats
    GROUP BY entity_id, bucket
    """,
    tags=("feature", "pipeline"),
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick — categorical features mapped to a fixed-width
    sparse vector without a fitted vocabulary: bucket = md5(feature
    string) mod D. The property that matters for a 100 TB feature
    pipeline is that the encoding is STATELESS — no dictionary to build,
    broadcast, or version; any executor (and any engine — hence the exact
    DuckDB twin) maps the same feature to the same bucket forever, so
    train/serve skew by vocabulary drift is structurally impossible.
    Multiplicity is preserved (a customer with five URGENT orders gets
    weight 5 in that bucket) — the count IS the feature value.

    Emitted in long/COO form (entity, bucket, weight) — the shape a
    sparse trainer ingests and a groupBy-pivot densifies on demand.
    Scale: one union of column-pruned scans, one partial-agg groupBy on
    (entity, bucket); the md5 is per-row JVM code-gen. Bucket id uses the
    first 8 md5 hex chars (< 2^32, so BIGINT-safe in both dialects) mod a
    power-of-two width."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    feats = (
        c.select(
            F.col("c_custkey").alias("entity_id"),
            F.concat(F.lit("seg="), F.col("c_mktsegment")).alias("feat"),
        )
        .unionAll(
            c.select(
                F.col("c_custkey").alias("entity_id"),
                F.concat(F.lit("nat="), F.col("c_nationkey").cast("string")).alias("feat"),
            )
        )
        .unionAll(
            o.select(
                F.col("o_custkey").alias("entity_id"),
                F.concat(F.lit("prio="), F.col("o_orderpriority")).alias("feat"),
            )
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % FEATURE_HASH_BUCKETS
    ).cast("int")
    return feats.groupBy("entity_id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("weight")
    )


@query(
    "feature_scaling",
    oracle="""
    WITH seg AS (
        SELECT o_orderkey, o_totalprice, c_mktsegment AS segment
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    stats AS (
        SELECT segment,
               avg(o_totalprice) AS mu,
               stddev_samp(o_totalprice) AS sigma,
               min(o_totalprice) AS lo,
               max(o_totalprice) AS hi,
               quantile_cont(o_totalprice, 0.5) AS med,
               quantile_cont(o_totalprice, 0.75) - quantile_cont(o_totalprice, 0.25)
                   AS iqr
        FROM seg GROUP BY segment
    )
    SELECT s.o_orderkey, s.segment,
           round((s.o_totalprice - t.mu) / nullif(t.sigma, 0), 4) + 0.0 AS zscore,
           round((s.o_totalprice - t.lo) / nullif(t.hi - t.lo, 0), 4) + 0.0 AS minmax,
           round((s.o_totalprice - t.med) / nullif(t.iqr, 0), 4) + 0.0 AS robust
    FROM seg s JOIN stats t ON s.segment = t.segment
    """,
    tags=("feature", "pipeline"),
)
def feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature scaling — the three standard normalizations
    (z-score, min-max, robust median/IQR) of order value within each market
    segment, computed as ONE stats pass per group broadcast back onto the
    rows. This is the fit/transform split done Spark-shaped: the "fitted
    scaler" is a group-count-sized DataFrame (the broadcast side), so
    transform is a map-side join — rows never shuffle, only stats do.

    Exact percentiles (`percentile` ↔ `quantile_cont`, the proven
    agg_percentile pairing) for the robust arm; sample stddev in both
    dialects; every division nullif-guarded (a constant-valued group keeps
    NULL scale scores rather than ±inf). At 100 TB the stats pass is a
    partial agg over the grouping key; percentile is the one non-partial
    aggregate — swap to approx_percentile and drop the oracle to
    rows-only if exactness is traded for one-pass speed."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    seg = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    ).select("o_orderkey", "o_totalprice", F.col("c_mktsegment").alias("segment"))
    stats = seg.groupBy("segment").agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sigma"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.expr("percentile(o_totalprice, 0.5)").alias("med"),
        (
            F.expr("percentile(o_totalprice, 0.75)")
            - F.expr("percentile(o_totalprice, 0.25)")
        ).alias("iqr"),
    )
    return seg.join(F.broadcast(stats), "segment").select(
        "o_orderkey",
        "segment",
        (
            F.round(
                (F.col("o_totalprice") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("zscore"),
        (
            F.round(
                (F.col("o_totalprice") - F.col("lo"))
                / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("minmax"),
        (
            F.round(
                (F.col("o_totalprice") - F.col("med")) / F.nullif(F.col("iqr"), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("robust"),
    )


@query(
    "stats_ttest_welch",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                    THEN 'control' ELSE 'treatment' END AS arm,
               sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                   AS spend
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, count(*)::BIGINT AS n, avg(spend) AS m, var_samp(spend) AS v
        FROM per_user GROUP BY arm
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 'control' THEN n END)::BIGINT AS n_c,
               max(CASE WHEN arm = 'control' THEN m END) AS m_c,
               max(CASE WHEN arm = 'control' THEN v END) AS v_c,
               max(CASE WHEN arm = 'treatment' THEN n END)::BIGINT AS n_t,
               max(CASE WHEN arm = 'treatment' THEN m END) AS m_t,
               max(CASE WHEN arm = 'treatment' THEN v END) AS v_t
        FROM arms
    )
    SELECT n_c, round(m_c, 4) AS mean_control,
           n_t, round(m_t, 4) AS mean_treatment,
           round((m_t - m_c) / nullif(sqrt(v_c / n_c + v_t / n_t), 0), 4)
               AS t_stat,
           round(pow(v_c / n_c + v_t / n_t, 2)
                 / nullif(pow(v_c / n_c, 2) / (n_c - 1)
                          + pow(v_t / n_t, 2) / (n_t - 1), 0), 2) AS df
    FROM wide
    """,
    tags=("analytics", "experiment"),
)
def stats_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on a continuous per-user metric
    (purchase spend) — the companion to ab_experiment_report's
    two-proportion z-test: conversion answers "did more users buy",
    Welch answers "did users spend more", and a real experiment readout
    runs both. Same deterministic md5-nibble arm assignment (stable under
    re-runs and late events; never rand()); Satterthwaite df so unequal
    arm sizes (the 8/16 nibble split is deliberately unbalanced) don't
    overstate significance.

    Shape: groupBy(user) partial agg → 2-row arm aggregate →
    conditional-max pivot to one row; all t/df arithmetic runs on that
    single row. var_samp in both dialects; divisions nullif-guarded
    (a single-user arm has undefined variance → NULL t, not a crash)."""
    ev = load(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1) < "8",
        "control",
    ).otherwise("treatment")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("spend")
    ).withColumn("arm", arm)
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("spend").alias("m"),
        F.var_samp("spend").alias("v"),
    )

    def pick(col: str, a: str):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    wide = arms.agg(
        pick("n", "control").alias("n_c"),
        pick("m", "control").alias("m_c"),
        pick("v", "control").alias("v_c"),
        pick("n", "treatment").alias("n_t"),
        pick("m", "treatment").alias("m_t"),
        pick("v", "treatment").alias("v_t"),
    )
    se2 = F.col("v_c") / F.col("n_c") + F.col("v_t") / F.col("n_t")
    return wide.select(
        "n_c",
        F.round("m_c", 4).alias("mean_control"),
        "n_t",
        F.round("m_t", 4).alias("mean_treatment"),
        F.round(
            (F.col("m_t") - F.col("m_c")) / F.nullif(F.sqrt(se2), F.lit(0.0)), 4
        ).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / F.nullif(
                F.pow(F.col("v_c") / F.col("n_c"), 2) / (F.col("n_c") - 1)
                + F.pow(F.col("v_t") / F.col("n_t"), 2) / (F.col("n_t") - 1),
                F.lit(0.0),
            ),
            2,
        ).alias("df"),
    )


CALIB_BINS = 5  # reliability-diagram resolution over vote-fraction confidence


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS qid, e.label,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings e ON e.vec_id >= {KNN_NQUERIES}
        WHERE q.vec_id < {KNN_NQUERIES}
    ),
    votes AS (
        SELECT qid, label, count(*)::BIGINT AS n_votes
        FROM scored WHERE rank <= {KNN_K}
        GROUP BY qid, label
    ),
    preds AS (
        SELECT qid, label AS pred, n_votes FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                                         ORDER BY n_votes DESC, label ASC) AS vr
            FROM votes
        ) WHERE vr = 1
    ),
    judged AS (
        SELECT p.qid,
               p.n_votes / {KNN_K}.0 AS conf,
               least(ceil(p.n_votes * {CALIB_BINS}.0 / {KNN_K}),
                     {CALIB_BINS})::INT AS bin,
               CASE WHEN p.pred = e.label THEN 1 ELSE 0 END AS correct
        FROM preds p JOIN embeddings e ON p.qid = e.vec_id
    )
    SELECT bin,
           count(*)::BIGINT AS n,
           round(avg(conf), 4) AS mean_confidence,
           round(avg(correct), 4) AS accuracy,
           round(avg(conf) - avg(correct), 4) + 0.0 AS gap
    FROM judged GROUP BY bin
    """,
    tags=("llm", "similarity", "eval"),
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for knn_label's confidence — vote fraction
    (n_votes/K) binned, with empirical accuracy per bin. A labeler whose
    0.9-confidence bin is only 0.6 accurate is overconfident, and every
    downstream consumer of auto-labels (filtering thresholds, loss
    weighting, active-learning pickers) silently inherits that bias; this
    report is the check that makes a confidence score mean something.

    Integer-safe binning: bin = ceil(n_votes·B/K) on INTEGER vote counts
    (never binning the float), so the bucket boundary is exact in both
    dialects. Same broadcast-query kNN subtree as the report op; the
    rollup is B rows. gap > 0 ⇒ overconfident (+0.0 collapses -0.0)."""
    e = load(spark, sf_dir, "embeddings")
    truth = e.filter(F.col("vec_id") < KNN_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("truth")
    )
    preds = knn_label(spark, sf_dir).join(F.broadcast(truth), "qid")
    judged = preds.select(
        (F.col("n_votes") / F.lit(float(KNN_K))).alias("conf"),
        F.least(
            F.ceil(F.col("n_votes") * F.lit(float(CALIB_BINS)) / F.lit(KNN_K)),
            F.lit(CALIB_BINS),
        )
        .cast("int")
        .alias("bin"),
        F.when(F.col("predicted_label") == F.col("truth"), 1).otherwise(0).alias("correct"),
    )
    return judged.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("conf"), 4).alias("mean_confidence"),
        F.round(F.avg("correct"), 4).alias("accuracy"),
        (F.round(F.avg("conf") - F.avg("correct"), 4) + F.lit(0.0)).alias("gap"),
    )


TARGET_ENCODE_M = 10.0  # m-estimate smoothing weight (pseudo-observations)


@query(
    "feature_target_encode",
    oracle=f"""
    WITH seg AS (
        SELECT o_orderkey, o_totalprice, c_mktsegment AS segment
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    g AS (SELECT avg(o_totalprice) AS gmean FROM seg),
    stats AS (
        SELECT segment, count(*)::BIGINT AS n_seg, sum(o_totalprice) AS sum_seg
        FROM seg GROUP BY segment
    )
    SELECT s.o_orderkey, s.segment,
           round((t.sum_seg - s.o_totalprice + {TARGET_ENCODE_M!r} * g.gmean)
                 / (t.n_seg - 1 + {TARGET_ENCODE_M!r}), 4) AS encoded
    FROM seg s
    JOIN stats t ON s.segment = t.segment
    CROSS JOIN g
    """,
    tags=("feature", "pipeline"),
)
def feature_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-aware target encoding — the categorical-to-numeric transform
    gradient-boosting pipelines lean on, done the only way that is safe to
    train on: leave-one-out (each row's own target is SUBTRACTED from its
    category's sum before averaging, so a row never sees itself) plus
    m-estimate smoothing toward the global mean (rare categories shrink to
    the prior instead of memorizing their few targets). Naive target
    encoding without both is a target-leakage bug that inflates offline
    metrics and collapses in production.

    Shape: one groupBy builds the per-category (n, sum) "fitted state" —
    category-cardinality-sized, broadcast back (feature_scaling's
    fit/transform split); the global mean folds in as a broadcast 1-row
    cross join (never a driver-side collect). LOO is then pure per-row
    arithmetic — no window, no second shuffle."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    seg = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    ).select("o_orderkey", "o_totalprice", F.col("c_mktsegment").alias("segment"))
    g = seg.agg(F.avg("o_totalprice").alias("gmean"))
    stats = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_seg"), F.sum("o_totalprice").alias("sum_seg")
    )
    return (
        seg.join(F.broadcast(stats), "segment")
        .crossJoin(F.broadcast(g))
        .select(
            "o_orderkey",
            "segment",
            F.round(
                (F.col("sum_seg") - F.col("o_totalprice") + F.lit(TARGET_ENCODE_M) * F.col("gmean"))
                / (F.col("n_seg") - 1 + F.lit(TARGET_ENCODE_M)),
                4,
            ).alias("encoded"),
        )
    )


@query(
    "eval_regression_metrics",
    oracle="""
    WITH pts AS (
        SELECT l_quantity::DOUBLE AS x, l_extendedprice AS y FROM lineitem
    ),
    fit AS (
        SELECT regr_slope(y, x) AS b, regr_intercept(y, x) AS a,
               avg(y) AS ybar
        FROM pts
    )
    SELECT round(b, 4) AS slope,
           round(a, 4) AS intercept,
           round(sqrt(avg(pow(y - (a + b * x), 2))), 4) AS rmse,
           round(avg(abs(y - (a + b * x))), 4) AS mae,
           round(1 - sum(pow(y - (a + b * x), 2))
                     / nullif(sum(pow(y - ybar, 2)), 0), 4) AS r2
    FROM pts CROSS JOIN fit
    GROUP BY a, b
    """,
    tags=("analytics", "eval"),
)
def eval_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit + goodness-of-fit report (slope, intercept, RMSE, MAE, R²)
    for price-on-quantity — the evaluation loop of any regression baseline,
    expressed as two passes with NO driver scalar: pass 1 is the moment
    aggregate (regr_slope/regr_intercept — both engines implement the same
    closed form), folded back as a broadcast 1-row cross join; pass 2 scores
    residuals row-wise and aggregates the three metrics. The GROUP BY on the
    fitted coefficients keeps the final aggregate a plain partial agg.

    R² is computed from residual/total sum of squares (not corr²) so it
    stays correct if the model form changes; the division is nullif-guarded
    (a constant target makes SST 0 → NULL R², not a crash). At 100 TB both
    passes are single-shuffle partial aggregates over the fact table."""
    li = load(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("double").alias("x"), F.col("l_extendedprice").alias("y")
    )
    fit = pts.agg(
        F.regr_slope("y", "x").alias("b"),
        F.regr_intercept("y", "x").alias("a"),
        F.avg("y").alias("ybar"),
    )
    resid = F.col("y") - (F.col("a") + F.col("b") * F.col("x"))
    return (
        pts.crossJoin(F.broadcast(fit))
        .groupBy("a", "b")
        .agg(
            F.round(F.first("b"), 4).alias("slope"),
            F.round(F.first("a"), 4).alias("intercept"),
            F.round(F.sqrt(F.avg(F.pow(resid, 2))), 4).alias("rmse"),
            F.round(F.avg(F.abs(resid)), 4).alias("mae"),
            F.round(
                F.lit(1)
                - F.sum(F.pow(resid, 2))
                / F.nullif(F.sum(F.pow(F.col("y") - F.col("ybar"), 2)), F.lit(0.0)),
                4,
            ).alias("r2"),
        )
        .select("slope", "intercept", "rmse", "mae", "r2")
    )


@query(
    "eval_ab_srm_check",
    oracle="""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                    THEN 'control' ELSE 'treatment' END AS arm
        FROM events
    ),
    counts AS (
        SELECT sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)::BIGINT AS n_c,
               sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)::BIGINT AS n_t
        FROM assigned
    )
    SELECT n_c, n_t,
           round((n_c + n_t) / 2.0, 1) AS expected_each,
           round(pow(n_c - (n_c + n_t) / 2.0, 2) / ((n_c + n_t) / 2.0)
                 + pow(n_t - (n_c + n_t) / 2.0, 2) / ((n_c + n_t) / 2.0), 4)
               AS chi2,
           (pow(n_c - (n_c + n_t) / 2.0, 2) / ((n_c + n_t) / 2.0)
            + pow(n_t - (n_c + n_t) / 2.0, 2) / ((n_c + n_t) / 2.0)) > 3.841
               AS srm_flag
    FROM counts
    """,
    tags=("analytics", "experiment"),
)
def eval_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard — the chi-square goodness-of-fit test
    every experiment platform runs BEFORE reading a single metric: the
    md5-nibble assignment promises a 50/50 split (8 of 16 first-nibble
    values each), so an observed arm imbalance beyond chi²(1df) > 3.841
    (p < 0.05) means the assignment or logging pipeline is broken and the
    z-test / Welch readouts (ab_experiment_report, stats_ttest_welch)
    must not be trusted. SRM is the canonical silent-bug detector for
    A/B infrastructure.

    Shape: one DISTINCT user pass (partial-agg) → a 1-row conditional-sum
    pivot; the chi² arithmetic runs on that single row. Counts stay BIGINT
    until the final divisions; the flag compares the UNROUNDED statistic
    so rounding can't flip the alarm at the boundary."""
    ev = load(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1) < "8",
        "control",
    ).otherwise("treatment")
    assigned = ev.select("user_id").distinct().withColumn("arm", arm)
    counts = assigned.agg(
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("arm") == "treatment", 1).otherwise(0)).alias("n_t"),
    )
    exp = (F.col("n_c") + F.col("n_t")) / 2.0
    chi2 = F.pow(F.col("n_c") - exp, 2) / exp + F.pow(F.col("n_t") - exp, 2) / exp
    return counts.select(
        "n_c",
        "n_t",
        F.round(exp, 1).alias("expected_each"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    )


BIN_COUNT = 8  # equal-width bins for the fitted-binning transform


@query(
    "feature_quantile_bin",
    oracle=f"""
    WITH stats AS (
        SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
               quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.50) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT o.o_orderkey,
           least(floor((o.o_totalprice - s.lo) / nullif(s.hi - s.lo, 0)
                       * {BIN_COUNT}), {BIN_COUNT} - 1)::INT AS width_bin,
           (CASE WHEN o.o_totalprice <= s.q1 THEN 1
                 WHEN o.o_totalprice <= s.q2 THEN 2
                 WHEN o.o_totalprice <= s.q3 THEN 3
                 ELSE 4 END)::INT AS quartile_bin
    FROM orders o CROSS JOIN stats s
    """,
    tags=("feature", "pipeline"),
)
def feature_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted discretization — equal-width and quartile binning of order
    value, the continuous-to-categorical transform trees and embedding
    tables want. Same fit/transform split as feature_scaling: the "fitted
    binner" is ONE broadcast row (min/max + three exact quartile cuts), so
    the transform is per-row CASE/floor arithmetic — rows never shuffle.

    Determinism at the edges: the max value clamps into the top width bin
    (least(…, B-1)); quartile boundaries use <= so a value exactly on a cut
    lands in the lower bin in BOTH dialects (the cuts are bit-identical —
    percentile ↔ quantile_cont, agg_percentile's proven pairing); the
    width division is nullif-guarded for a constant column. At 100 TB the
    one non-partial piece is the exact percentile fit — swap to
    approx_percentile and re-oracle rows-only if one-pass matters more
    than exact cuts."""
    o = load(spark, sf_dir, "orders")
    stats = o.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.50)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    return (
        o.crossJoin(F.broadcast(stats))
        .select(
            "o_orderkey",
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0))
                    * BIN_COUNT
                ),
                F.lit(BIN_COUNT - 1),
            )
            .cast("int")
            .alias("width_bin"),
            F.when(F.col("o_totalprice") <= F.col("q1"), 1)
            .when(F.col("o_totalprice") <= F.col("q2"), 2)
            .when(F.col("o_totalprice") <= F.col("q3"), 3)
            .otherwise(4)
            .cast("int")
            .alias("quartile_bin"),
        )
    )


@query(
    "eval_rank_correlation",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               ((embedding[1] > 0)::INT * 1 + (embedding[2] > 0)::INT * 2
                + (embedding[3] > 0)::INT * 4 + (embedding[4] > 0)::INT * 8) AS bucket
        FROM embeddings
    ),
    exact AS (
        SELECT qid, vec_id, rank FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {RET_DEPTH}
    ),
    ann AS (
        SELECT qid, vec_id, rank FROM (
            SELECT q.vec_id AS qid, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                                e.vec_id ASC) AS rank
            FROM bucketed q JOIN bucketed e
              ON q.bucket = e.bucket AND e.vec_id != q.vec_id
            WHERE q.vec_id < {SIM_TOPK_NQUERIES}
        ) WHERE rank <= {RET_DEPTH}
    ),
    shared AS (
        SELECT x.qid, x.vec_id,
               row_number() OVER (PARTITION BY x.qid ORDER BY x.rank) AS r_exact,
               row_number() OVER (PARTITION BY x.qid ORDER BY a.rank) AS r_ann
        FROM exact x JOIN ann a ON x.qid = a.qid AND x.vec_id = a.vec_id
    )
    SELECT qid, count(*)::BIGINT AS n_common,
           CASE WHEN count(*) > 1 THEN
               round(1 - 6.0 * sum(pow(r_exact - r_ann, 2))
                         / (count(*) * (pow(count(*), 2) - 1)), 4) + 0.0
           END AS spearman_rho
    FROM shared GROUP BY qid
    """,
    tags=("llm", "similarity", "eval"),
)
def eval_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the exact and ANN retrieval
    orderings, per query — the third lens on index quality after recall
    (set overlap) and NDCG (position-weighted hits): even when the ANN arm
    retrieves the right items, a reranker-free consumer cares whether it
    ORDERS them like exhaustive search would. Candidates are the
    intersection of the two top-depth lists, re-ranked densely 1..n within
    the intersection by each arm's original order (row_number — all ranks
    distinct, so the closed form 1 − 6Σd²/(n(n²−1)) is exact Spearman, no
    tie correction needed). n ≤ 1 leaves rho NULL (undefined, not 1).

    Scale shape: both arms are the established broadcast-query patterns;
    the correlation itself runs on ≤ depth rows per query. +0.0 collapses
    a −0.0 rho (PARITY rule 17)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < SIM_TOPK_NQUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        signbit_bucket(F.col("embedding")).alias("q_bucket"),
    )
    corpus = e.withColumn("bucket", signbit_bucket(F.col("embedding")))
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())

    def topd(scored):
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= RET_DEPTH)
            .select("qid", "vec_id", "rank")
        )

    exact = topd(
        corpus.crossJoin(F.broadcast(q.select("qid", "q_emb")))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
    )
    ann = topd(
        corpus.join(F.broadcast(q), corpus.bucket == q.q_bucket)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"))
    )
    joined = exact.withColumnRenamed("rank", "rank_exact").join(
        ann.withColumnRenamed("rank", "rank_ann"), ["qid", "vec_id"]
    )
    shared = joined.select(
        "qid",
        "vec_id",
        F.row_number()
        .over(Window.partitionBy("qid").orderBy("rank_exact"))
        .alias("r_exact"),
        F.row_number().over(Window.partitionBy("qid").orderBy("rank_ann")).alias("r_ann"),
    )
    n = F.count(F.lit(1))
    rho = F.lit(1) - F.lit(6.0) * F.sum(
        F.pow(F.col("r_exact") - F.col("r_ann"), 2)
    ) / (n * (F.pow(n, 2) - 1))
    return shared.groupBy("qid").agg(
        n.alias("n_common"),
        F.when(n > 1, F.round(rho, 4) + F.lit(0.0)).alias("spearman_rho"),
    )


@query(
    "agg_benford_check",
    oracle="""
    WITH digits AS (
        SELECT floor(o_totalprice / pow(10, floor(log10(o_totalprice))))::INT
                   AS digit
        FROM orders WHERE o_totalprice > 0
    ),
    obs AS (
        SELECT digit, count(*)::BIGINT AS n_obs FROM digits GROUP BY digit
    ),
    tot AS (SELECT sum(n_obs)::BIGINT AS n_total FROM obs)
    SELECT o.digit, o.n_obs,
           round(t.n_total * log10(1 + 1.0 / o.digit), 2) AS n_expected,
           round(pow(o.n_obs - t.n_total * log10(1 + 1.0 / o.digit), 2)
                 / (t.n_total * log10(1 + 1.0 / o.digit)), 4) AS chi2_term
    FROM obs o CROSS JOIN tot t
    """,
    tags=("quality", "analytics"),
)
def agg_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit — the data-forensics screen for
    fabricated or unit-mangled numeric columns: naturally-occurring
    multiplicative quantities put digit d first with probability
    log10(1 + 1/d) (30.1 % ones down to 4.6 % nines), and a column that
    deviates hard (large Σχ² over 8 df) was truncated, capped, synthesized,
    or double-converted somewhere upstream. Emits the per-digit
    observed/expected/χ²-term rows — the caller sums terms against the
    15.51 (p=0.05) cutoff.

    First digit extracted arithmetically (x / 10^⌊log10 x⌋ — never via
    string formatting, which diverges between engines on float repr);
    the total folds in as a broadcast 1-row cross join (no driver scalar,
    the corpus_epoch_schedule pattern). One partial-agg groupBy over a
    9-value key; log10 is libm in both engines (PARITY rule 8)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    obs = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").alias("n_total"))
    expected = F.col("n_total") * F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        F.round(expected, 2).alias("n_expected"),
        F.round(F.pow(F.col("n_obs") - expected, 2) / expected, 4).alias("chi2_term"),
    )


@query(
    "corpus_dedup_report",
    oracle="""
    WITH keyed AS (
        SELECT source,
               md5(text) AS exact_key,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                       ' +', ' ', 'g'))) AS norm_key,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS bag_key
        FROM documents
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT exact_key)::BIGINT AS n_exact_unique,
           count(DISTINCT norm_key)::BIGINT AS n_norm_unique,
           count(DISTINCT bag_key)::BIGINT AS n_bag_unique,
           round(1 - count(DISTINCT exact_key) / count(*), 4) AS exact_dup_rate,
           round(1 - count(DISTINCT norm_key) / count(*), 4) AS norm_dup_rate,
           round(1 - count(DISTINCT bag_key) / count(*), 4) AS bag_dup_rate
    FROM keyed GROUP BY source
    """,
    tags=("llm", "corpus", "quality"),
)
def corpus_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-funnel audit per source — the dashboard row a corpus pipeline
    publishes before anyone trusts its dedup: unique counts at each rung of
    the canonicalization ladder (raw bytes → normalized text → token BAG),
    each rung strictly ≤ the last, so the GAPS between rungs localize
    where duplication lives (byte-identical mirrors vs punctuation/case
    rewrites vs word-order shuffles). text_normalize's and
    text_fingerprint's exact key expressions are reused verbatim, so this
    report is consistent with the dedup ops it audits.

    Scale shape: ONE pass — three md5 keys computed per row map-side, one
    groupBy(source) with three count-distincts (Expand ×3, each distinct
    over a 16-byte hash, never the text). At 100 TB the same report runs
    as three partial count-distinct rollups; no joins, no pairs."""
    d = load(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    bag = F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    keyed = d.select(
        "source",
        F.md5(F.col("text").cast("binary")).alias("exact_key"),
        F.md5(normalized.cast("binary")).alias("norm_key"),
        F.md5(bag.cast("binary")).alias("bag_key"),
    )
    n = F.count(F.lit(1))
    return keyed.groupBy("source").agg(
        n.alias("n_docs"),
        F.countDistinct("exact_key").alias("n_exact_unique"),
        F.countDistinct("norm_key").alias("n_norm_unique"),
        F.countDistinct("bag_key").alias("n_bag_unique"),
        F.round(F.lit(1) - F.countDistinct("exact_key") / n, 4).alias("exact_dup_rate"),
        F.round(F.lit(1) - F.countDistinct("norm_key") / n, 4).alias("norm_dup_rate"),
        F.round(F.lit(1) - F.countDistinct("bag_key") / n, 4).alias("bag_dup_rate"),
    )


@query(
    "eval_lsh_candidate_quality",
    oracle="""
    WITH tabs AS (
        SELECT vec_id, t,
               ((embedding[t * 8 + 1] > 0)::INT * 1 + (embedding[t * 8 + 2] > 0)::INT * 2
                + (embedding[t * 8 + 3] > 0)::INT * 4 + (embedding[t * 8 + 4] > 0)::INT * 8
                + (embedding[t * 8 + 5] > 0)::INT * 16 + (embedding[t * 8 + 6] > 0)::INT * 32
                + (embedding[t * 8 + 7] > 0)::INT * 64 + (embedding[t * 8 + 8] > 0)::INT * 128)
                   AS bucket
        FROM embeddings, (VALUES (0), (1), (2), (3)) tt(t)
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM tabs a JOIN tabs b
          ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    truth AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
    ),
    hits AS (
        SELECT count(*)::BIGINT AS n_hits
        FROM cand c JOIN truth t ON c.vec_a = t.vec_a AND c.vec_b = t.vec_b
    ),
    nc AS (SELECT count(*)::BIGINT AS n_candidates FROM cand),
    nt AS (SELECT count(*)::BIGINT AS n_true FROM truth)
    SELECT nt.n_true, nc.n_candidates, h.n_hits,
           round(h.n_hits / nullif(nc.n_candidates, 0), 4) AS precision,
           round(h.n_hits / nullif(nt.n_true, 0), 4) AS recall
    FROM nt CROSS JOIN nc CROSS JOIN hits h
    """,
    tags=("llm", "dedup", "eval"),
)
def eval_lsh_candidate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-set precision/recall of the band-OR sign-LSH index
    (dedup_embed_bandor's L=4, b=8 tables) against EXACT all-pairs cosine
    truth at τ=0.3 — the registered, hash-checked instance of SCALE.md's
    analytic collision model (recall = 1 − (1 − p^b)^L). eval_ann_recall
    gates top-k retrieval; this gates the PAIR-GENERATION stage every
    dedup pipeline runs — an LSH index whose candidate recall was never
    measured silently under-deduplicates forever.

    The truth arm is exact all-pairs, executed as UNBLOCKED chunk-pair
    GEMMs (block_pairs_gemm under a constant block key): C·(C+1)/2
    bounded Arrow tasks, never a row-cartesian in the plan. That is the
    honest cost of a recall denominator — at 100 TB you run it on a
    SAMPLED slice and extrapolate via the collision model this op
    validates; the candidate arm is the production band join (skinny
    (table, bucket) keys). Precision/recall round 4-dp; nullif guards."""
    e = load(spark, sf_dir, "embeddings")
    tabs = []
    for t in range(4):
        bucket = sum(
            (F.element_at(F.col("embedding"), t * 8 + i + 1) > 0).cast("int")
            * F.lit(2**i)
            for i in range(8)
        )
        tabs.append(
            e.select("vec_id", F.lit(t).alias("t"), bucket.alias("bucket"))
        )
    tab = tabs[0].unionAll(tabs[1]).unionAll(tabs[2]).unionAll(tabs[3])
    a = tab.select(F.col("vec_id").alias("vec_a"), "t", "bucket")
    b = tab.select(F.col("vec_id").alias("vec_b"), "t", "bucket")
    cand = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    truth = block_pairs_gemm(
        e.withColumn("all_blk", F.lit(1)), "all_blk", 0.3
    ).select("vec_a", "vec_b")
    hits = cand.join(truth, ["vec_a", "vec_b"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    nt = truth.agg(F.count(F.lit(1)).alias("n_true"))
    return (
        nt.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(hits))
        .select(
            "n_true",
            "n_candidates",
            "n_hits",
            F.round(
                F.col("n_hits") / F.nullif(F.col("n_candidates"), F.lit(0)), 4
            ).alias("precision"),
            F.round(F.col("n_hits") / F.nullif(F.col("n_true"), F.lit(0)), 4).alias(
                "recall"
            ),
        )
    )


@query(
    "agg_ks_test",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                    THEN 'control' ELSE 'treatment' END AS arm,
               floor(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                     * 100 + 0.5)::BIGINT AS spend_cents
        FROM events GROUP BY user_id
    ),
    by_value AS (
        SELECT spend_cents,
               sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)::BIGINT AS c,
               sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)::BIGINT AS t
        FROM per_user GROUP BY spend_cents
    ),
    tot AS (
        SELECT sum(c)::BIGINT AS n_c, sum(t)::BIGINT AS n_t FROM by_value
    ),
    ecdf AS (
        SELECT sum(c) OVER (ORDER BY spend_cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
               sum(t) OVER (ORDER BY spend_cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_t
        FROM by_value
    )
    SELECT tot.n_c, tot.n_t,
           round(max(abs(ecdf.cum_c * 1.0 / tot.n_c - ecdf.cum_t * 1.0 / tot.n_t)), 4)
               AS ks_stat
    FROM ecdf CROSS JOIN tot
    GROUP BY tot.n_c, tot.n_t
    """,
    tags=("analytics", "experiment"),
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the experiment arms'
    per-user spend distributions — the DISTRIBUTION-shape companion to
    stats_ttest_welch's mean test: a treatment that moves the tails but
    not the mean (or vice versa) shows up here first. D = max over x of
    |F̂_c(x) − F̂_t(x)|, computed exactly on the pooled empirical support.

    Engine-exactness: spend is quantized to integer cents with the
    floor(x·100 + 0.5) trick (PARITY rule 17b) BEFORE grouping — grouping
    raw float aggregates would let partial-agg fold-order epsilon split
    one support point into two. The ECDF is one global-ordered cumulative
    window over the DISTINCT support (|support| rows, not |users|); at
    100 TB you'd quantize to a coarser grid first — same plan, bounded
    support, D then a grid-resolution lower bound. Arm totals fold in as
    a broadcast 1-row cross join."""
    ev = load(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1) < "8",
        "control",
    ).otherwise("treatment")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            )
            * 100
            + 0.5
        )
        .cast("long")
        .alias("spend_cents")
    ).withColumn("arm", arm)
    by_value = per_user.groupBy("spend_cents").agg(
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("arm") == "treatment", 1).otherwise(0)).alias("t"),
    )
    tot = by_value.agg(
        F.sum("c").alias("n_c"), F.sum("t").alias("n_t")
    )
    w = Window.orderBy("spend_cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ecdf = by_value.select(
        F.sum("c").over(w).alias("cum_c"), F.sum("t").over(w).alias("cum_t")
    )
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .groupBy("n_c", "n_t")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_c") * F.lit(1.0) / F.col("n_c")
                        - F.col("cum_t") * F.lit(1.0) / F.col("n_t")
                    )
                ),
                4,
            ).alias("ks_stat")
        )
    )


@query(
    "agg_mannwhitney_u",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                    THEN 'control' ELSE 'treatment' END AS arm,
               floor(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                     * 100 + 0.5)::BIGINT AS spend_cents
        FROM events GROUP BY user_id
    ),
    cnt AS (
        SELECT arm, spend_cents, count(*)::BIGINT AS n_av
        FROM per_user GROUP BY arm, spend_cents
    ),
    -- histogram ranking over the spend SUPPORT (stats_kruskal_wallis's
    -- construction): value v spans ranks [cum-t+1, cum], so
    -- 2*midrank = 2*(cum-t) + t + 1 — an exact BIGINT, no global row sort
    vrank AS (
        SELECT spend_cents, t, (2 * (cum - t) + t + 1)::BIGINT AS r2
        FROM (
            SELECT spend_cents, sum(n_av)::BIGINT AS t,
                   sum(sum(n_av)) OVER (ORDER BY spend_cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS cum
            FROM cnt GROUP BY spend_cents
        )
    ),
    ties AS (
        SELECT sum(t * t * t - t)::BIGINT AS tie_term, sum(t)::BIGINT AS n
        FROM vrank
    ),
    arms AS (
        SELECT sum(CASE WHEN c.arm = 'control' THEN c.n_av * k.r2 ELSE 0 END)
                   ::BIGINT AS r2_c,
               sum(CASE WHEN c.arm = 'control' THEN c.n_av ELSE 0 END)
                   ::BIGINT AS n_c,
               sum(CASE WHEN c.arm = 'treatment' THEN c.n_av ELSE 0 END)
                   ::BIGINT AS n_t
        FROM cnt c JOIN vrank k ON c.spend_cents = k.spend_cents
    )
    SELECT a.n_c, a.n_t,
           round(a.r2_c / 2.0 - a.n_c * (a.n_c + 1) / 2.0, 1) AS u_control,
           round((a.r2_c / 2.0 - a.n_c * (a.n_c + 1) / 2.0 - a.n_c * a.n_t / 2.0)
                 / nullif(sqrt(a.n_c * a.n_t / 12.0
                               * ((t.n + 1) - t.tie_term / (t.n * (t.n - 1.0)))), 0),
                 4) + 0.0 AS z_score
    FROM arms a CROSS JOIN ties t
    """,
    tags=("analytics", "experiment"),
)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the experiment arms —
    the nonparametric location test that completes the experiment suite
    (z-proportion, Welch mean, KS shape, SRM trust-gate): robust to the
    heavy-tailed spend distributions that break the t-test's normality
    assumption. Ties get MIDRANKS, U_c = R_c − n_c(n_c+1)/2, and the
    normal approximation uses the tie-CORRECTED variance
    n_c·n_t/12·((N+1) − Σ(t³−t)/(N(N−1))) — with cents quantization ties
    are common, so the uncorrected variance would overstate |z|.

    Exactness AND scale from HISTOGRAM ranking (stats_kruskal_wallis's
    construction, ported per VERDICT r9 item 2): rows reduce map-side to
    (arm, spend_cents) counts, value v's doubled mid-rank comes from the
    running total over the value SUPPORT (v spans ranks [cum−t+1, cum],
    so 2·midrank = 2·(cum−t)+t+1 — an exact BIGINT; R_c = Σ n_av·r2 / 2
    is a halved integer, never a float fold), and the only remaining
    global structure is the prefix sum over DISTINCT cents values (|V|
    rows, bounded by the cents domain — not |users|). No corpus-sized
    Window.orderBy anywhere in the plan (pinned in tests/test_plans.py);
    same cents quantization as agg_ks_test (PARITY rule 17b) so float
    fold-order can't split a support point. Scalars fold in by broadcast
    cross join; division nullif-guarded; +0.0 collapses −0.0 z (rule
    17)."""
    ev = load(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1) < "8",
        "control",
    ).otherwise("treatment")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            )
            * 100
            + 0.5
        )
        .cast("long")
        .alias("spend_cents")
    ).withColumn("arm", arm)
    cnt = per_user.groupBy("arm", "spend_cents").agg(F.count(F.lit(1)).alias("n_av"))
    wcum = Window.orderBy("spend_cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vrank = (
        cnt.groupBy("spend_cents")
        .agg(F.sum("n_av").alias("t"))
        .select("spend_cents", "t", F.sum("t").over(wcum).alias("cum"))
        .select(
            "spend_cents",
            "t",
            (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1).alias("r2"),
        )
    )
    ties = vrank.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_term"),
        F.sum("t").alias("n"),
    )
    arms = cnt.join(vrank.select("spend_cents", "r2"), "spend_cents").agg(
        F.sum(
            F.when(F.col("arm") == "control", F.col("n_av") * F.col("r2")).otherwise(0)
        ).alias("r2_c"),
        F.sum(F.when(F.col("arm") == "control", F.col("n_av")).otherwise(0)).alias(
            "n_c"
        ),
        F.sum(F.when(F.col("arm") == "treatment", F.col("n_av")).otherwise(0)).alias(
            "n_t"
        ),
    )
    u_c = F.col("r2_c") / 2.0 - F.col("n_c") * (F.col("n_c") + 1) / 2.0
    var = (
        F.col("n_c")
        * F.col("n_t")
        / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie_term") / (F.col("n") * (F.col("n") - F.lit(1.0)))
        )
    )
    return arms.crossJoin(F.broadcast(ties)).select(
        "n_c",
        "n_t",
        F.round(u_c, 1).alias("u_control"),
        (
            F.round(
                (u_c - F.col("n_c") * F.col("n_t") / 2.0)
                / F.nullif(F.sqrt(var), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("z_score"),
    )


@query(
    "eval_roc_curve",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               floor(sum(CASE WHEN event_type IN ('view', 'click')
                              THEN value ELSE 0 END) * 100 + 0.5)::BIGINT
                   AS score_cents,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    support AS (
        SELECT score_cents,
               sum(label)::BIGINT AS n_pos,
               sum(1 - label)::BIGINT AS n_neg
        FROM per_user GROUP BY score_cents
    ),
    curve AS (
        SELECT score_cents,
               sum(n_pos) OVER (ORDER BY score_cents DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_tp,
               sum(n_neg) OVER (ORDER BY score_cents DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_fp,
               sum(n_pos) OVER () AS total_pos,
               sum(n_neg) OVER () AS total_neg
        FROM support
    )
    SELECT score_cents AS threshold_cents,
           cum_tp::BIGINT AS cum_tp, cum_fp::BIGINT AS cum_fp,
           round(cum_tp / nullif(total_pos * 1.0, 0), 4) AS tpr,
           round(cum_fp / nullif(total_neg * 1.0, 0), 4) AS fpr
    FROM curve
    """,
    tags=("analytics", "eval"),
)
def eval_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC curve of a binary whale-vs-not classifier — score = each
    user's cents-quantized engagement spend (view+click value), label =
    did the user ever make a single purchase above 150.00 (a ~45/55
    class split at every fixture SF; "ever purchased" is degenerate —
    every fixture user converts). One curve point per distinct score
    threshold: cumulative TP/FP scanning thresholds from high to low,
    normalized to TPR/FPR. tests/test_audit_wave.py pins the trapezoid
    AUC of this curve to the Mann-Whitney U statistic of the same
    (score, label) pairs — the rank-sum/AUC identity.

    Spark-first scale shape: the global cumulative window runs over the
    score SUPPORT (distinct quantized values — the groupBy reduces users
    to support first with partial aggs), never over raw users; at 100 TB
    the support of a cents-quantized score is bounded (≈10^6 rows) no
    matter how many users feed it, so the single-partition ORDER BY
    window that a global ROC scan fundamentally needs stays tiny.
    Totals ride the SAME window partition as a full-frame sum (one scan,
    one window exchange — no broadcast self-aggregate re-reading the
    events subtree); cents quantization (PARITY rule 17b) keeps
    float fold-order from splitting support points across engines."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(
                    F.col("event_type").isin("view", "click"), F.col("value")
                ).otherwise(0.0)
            )
            * 100
            + 0.5
        )
        .cast("long")
        .alias("score_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("label"),
    )
    support = per_user.groupBy("score_cents").agg(
        F.sum("label").alias("n_pos"),
        F.sum(1 - F.col("label")).alias("n_neg"),
    )
    w = (
        Window.orderBy(F.col("score_cents").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = support.select(
        "score_cents",
        F.sum("n_pos").over(w).alias("cum_tp"),
        F.sum("n_neg").over(w).alias("cum_fp"),
        F.sum("n_pos").over(wf).alias("total_pos"),
        F.sum("n_neg").over(wf).alias("total_neg"),
    )
    return curve.select(
        F.col("score_cents").alias("threshold_cents"),
        F.col("cum_tp").cast("long").alias("cum_tp"),
        F.col("cum_fp").cast("long").alias("cum_fp"),
        F.round(
            F.col("cum_tp") / F.nullif(F.col("total_pos") * 1.0, F.lit(0.0)), 4
        ).alias("tpr"),
        F.round(
            F.col("cum_fp") / F.nullif(F.col("total_neg") * 1.0, F.lit(0.0)), 4
        ).alias("fpr"),
    )


@query(
    "eval_cohens_kappa",
    oracle="""
    WITH rated AS (
        SELECT CASE WHEN n_chars > 400 THEN 1 ELSE 0 END AS rater_a,
               CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 > 60
                    THEN 1 ELSE 0 END AS rater_b
        FROM documents
    ),
    counts AS (
        SELECT count(*)::BIGINT AS n,
               sum(rater_a * rater_b)::BIGINT AS n_kk,
               sum((1 - rater_a) * (1 - rater_b))::BIGINT AS n_dd,
               sum(rater_a)::BIGINT AS a_keep,
               sum(rater_b)::BIGINT AS b_keep
        FROM rated
    )
    SELECT n AS n_docs, n_kk AS n_both_keep, n_dd AS n_both_drop,
           round((n_kk + n_dd) / (n * 1.0), 4) AS po,
           round((a_keep * b_keep + (n - a_keep) * (n - b_keep))
                 / (n * n * 1.0), 4) AS pe,
           round(((n_kk + n_dd) / (n * 1.0)
                  - (a_keep * b_keep + (n - a_keep) * (n - b_keep))
                    / (n * n * 1.0))
                 / nullif(1.0 - (a_keep * b_keep + (n - a_keep) * (n - b_keep))
                          / (n * n * 1.0), 0), 4) AS kappa
    FROM counts
    """,
    tags=("analytics", "eval", "llm"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two keep/drop labeling heuristics over the
    document corpus — the inter-annotator-agreement gate a labeling
    pipeline runs before trusting any single rater (human or model):
    rater A keeps long docs (n_chars > 400), rater B keeps wordy docs
    (> 60 whitespace-delimited words). kappa = (po − pe) / (1 − pe)
    corrects raw agreement po for the agreement pe expected by chance
    from each rater's marginal keep-rate.

    One full-corpus pass folding to FIVE counters (n, both-keep,
    both-drop, each rater's keep count) — pure partial aggregation, no
    shuffle wider than one reduce row, so the cost at 100 TB is the scan
    itself. Word count uses the same length-difference formula in both
    engines (no regex/split semantics to diverge); division nullif-
    guarded against the degenerate pe = 1 corpus."""
    docs = load(spark, sf_dir, "documents")
    rater_a = F.when(F.col("n_chars") > 400, 1).otherwise(0)
    words = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    rater_b = F.when(words > 60, 1).otherwise(0)
    counts = docs.select(
        rater_a.alias("rater_a"), rater_b.alias("rater_b")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rater_a") * F.col("rater_b")).alias("n_kk"),
        F.sum((1 - F.col("rater_a")) * (1 - F.col("rater_b"))).alias("n_dd"),
        F.sum("rater_a").alias("a_keep"),
        F.sum("rater_b").alias("b_keep"),
    )
    n = F.col("n") * 1.0
    po = (F.col("n_kk") + F.col("n_dd")) / n
    pe = (
        F.col("a_keep") * F.col("b_keep")
        + (F.col("n") - F.col("a_keep")) * (F.col("n") - F.col("b_keep"))
    ) / (n * n)
    return counts.select(
        F.col("n").alias("n_docs"),
        F.col("n_kk").alias("n_both_keep"),
        F.col("n_dd").alias("n_both_drop"),
        F.round(po, 4).alias("po"),
        F.round(pe, 4).alias("pe"),
        F.round((po - pe) / F.nullif(1.0 - pe, F.lit(0.0)), 4).alias("kappa"),
    )


@query(
    "stats_chi2_independence",
    oracle="""
    WITH cells AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow, count(*)::BIGINT AS o
        FROM events GROUP BY event_type, dow
    ),
    margins AS (
        SELECT event_type, dow, o,
               sum(o) OVER (PARTITION BY event_type) AS row_tot,
               sum(o) OVER (PARTITION BY dow) AS col_tot,
               sum(o) OVER () AS n
        FROM cells
    )
    SELECT count(*)::BIGINT AS n_cells,
           round(sum(pow(o - row_tot * col_tot / (n * 1.0), 2)
                     / nullif(row_tot * col_tot / (n * 1.0), 0)), 4)
               AS chi2,
           (count(DISTINCT event_type) - 1)
               * (count(DISTINCT dow) - 1) AS dof
    FROM margins
    """,
    tags=("analytics", "experiment"),
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence over the channel × day-of-week
    contingency table (profile_crosstab made inferential): expected cell
    counts from the margins, χ² = Σ(O−E)²/E, degrees of freedom
    (r−1)(c−1) — the categorical drift detector that says whether the
    weekly activity MIX changed, complementing corpus_drift_psi's
    per-bucket score.

    One pair-key groupBy collapses 100 TB to |channels|×|weekdays| cells;
    margins are windows over that TINY cell table (three frames, zero
    extra scans), so the statistic costs exactly one shuffle. Expected
    counts stay un-rounded until the final aggregate (PARITY rule 17b);
    the identical float expression tree on both sides keeps the 4-dp
    round stable."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("o")
        .over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / (F.col("n") * 1.0)
    return margins.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum(F.pow(F.col("o") - e, 2) / F.nullif(e, F.lit(0.0))), 4
        ).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).alias("dof"),
    )


@query(
    "eval_pr_curve",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               floor(sum(CASE WHEN event_type IN ('view', 'click')
                              THEN value ELSE 0 END) * 100 + 0.5)::BIGINT
                   AS score_cents,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    support AS (
        SELECT score_cents,
               sum(label)::BIGINT AS n_pos,
               count(*)::BIGINT AS n_all
        FROM per_user GROUP BY score_cents
    ),
    curve AS (
        SELECT score_cents,
               sum(n_pos) OVER w AS cum_tp,
               sum(n_all) OVER w AS cum_pred,
               sum(n_pos) OVER () AS total_pos
        FROM support
        WINDOW w AS (ORDER BY score_cents DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT score_cents AS threshold_cents,
           cum_tp::BIGINT AS cum_tp, cum_pred::BIGINT AS cum_pred,
           round(cum_tp / nullif(cum_pred * 1.0, 0), 4) AS precision,
           round(cum_tp / nullif(total_pos * 1.0, 0), 4) AS recall
    FROM curve
    """,
    tags=("analytics", "eval"),
)
def eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve for the same whale classifier as
    eval_roc_curve — the view that matters when positives are rare and
    ROC's false-positive-rate axis hides poor precision: at each score
    threshold (high→low), precision = TP/predicted-positive and recall =
    TP/total-positive.

    Identical scale shape to the ROC twin: users reduce to the quantized
    score SUPPORT with partial aggs, the single-partition cumulative
    window runs over that bounded support, and totals ride the same
    window partition full-frame — one scan, one window exchange. The two
    curves share the per-user subtree at a cluster (DataFrame reuse);
    registered separately so each is independently hash-checked."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(
                    F.col("event_type").isin("view", "click"), F.col("value")
                ).otherwise(0.0)
            )
            * 100
            + 0.5
        )
        .cast("long")
        .alias("score_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("label"),
    )
    support = per_user.groupBy("score_cents").agg(
        F.sum("label").alias("n_pos"),
        F.count(F.lit(1)).alias("n_all"),
    )
    w = Window.orderBy(F.col("score_cents").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = support.select(
        "score_cents",
        F.sum("n_pos").over(w).alias("cum_tp"),
        F.sum("n_all").over(w).alias("cum_pred"),
        F.sum("n_pos").over(wf).alias("total_pos"),
    )
    return curve.select(
        F.col("score_cents").alias("threshold_cents"),
        F.col("cum_tp").cast("long").alias("cum_tp"),
        F.col("cum_pred").cast("long").alias("cum_pred"),
        F.round(
            F.col("cum_tp") / F.nullif(F.col("cum_pred") * 1.0, F.lit(0.0)), 4
        ).alias("precision"),
        F.round(
            F.col("cum_tp") / F.nullif(F.col("total_pos") * 1.0, F.lit(0.0)), 4
        ).alias("recall"),
    )


@query(
    "feature_onehot",
    oracle="""
    WITH lang_vocab AS (
        SELECT lang AS val,
               (row_number() OVER (ORDER BY count(*) DESC, lang ASC) - 1)::INT AS idx
        FROM documents GROUP BY lang
    ),
    nlang AS (SELECT count(*)::INT AS n FROM lang_vocab),
    src_vocab AS (
        SELECT source AS val,
               (row_number() OVER (ORDER BY count(*) DESC, source ASC) - 1)::INT AS idx
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, lv.idx AS feature_idx, 'lang=' || d.lang AS feature_name
    FROM documents d JOIN lang_vocab lv ON d.lang = lv.val
    UNION ALL
    SELECT d.doc_id, (sv.idx + n.n)::INT, 'source=' || d.source
    FROM documents d JOIN src_vocab sv ON d.source = sv.val CROSS JOIN nlang n
    """,
    tags=("feature", "pipeline"),
)
def feature_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fitted one-hot encoding in COO form — the DICTIONARY twin of
    feature_hashing: each categorical column gets a fitted vocabulary
    (index = rank by frequency DESC then value ASC — frequency-ordered so
    truncating the tail indices is a meaningful rare-category cutoff), and
    multi-column encodings stack into one feature space by offsetting each
    column's block by the preceding vocabulary sizes (lang occupies
    [0, n_lang), source [n_lang, n_lang+n_source)) — the layout a linear
    model or embedding table consumes directly.

    Scale shape: the fit is two tiny distinct-aggregates; the transform is
    two BROADCAST joins of driver-sized vocab tables onto the corpus — the
    fact table never shuffles (contrast feature_target_encode, whose fit
    must shuffle per-key stats). The vocab rank window is a single
    partition by construction: it runs over the AGGREGATED category table
    (|categories| rows, never |rows|) — the bounded-cardinality global
    window rule (eval_roc_curve's). Determinism: frequency ties break on
    the value string, identical byte order in both engines."""
    d = load(spark, sf_dir, "documents")

    def vocab(col: str) -> DataFrame:
        w = Window.orderBy(F.col("cnt").desc(), F.col("val").asc())
        return (
            d.groupBy(F.col(col).alias("val"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select("val", (F.row_number().over(w) - 1).cast("int").alias("idx"))
        )

    lang_v, src_v = vocab("lang"), vocab("source")
    n_lang = lang_v.agg(F.count(F.lit(1)).cast("int").alias("n"))
    lang_feats = d.join(
        F.broadcast(lang_v), d.lang == lang_v.val
    ).select(
        "doc_id",
        F.col("idx").alias("feature_idx"),
        F.concat(F.lit("lang="), F.col("lang")).alias("feature_name"),
    )
    src_feats = (
        d.join(F.broadcast(src_v), d.source == src_v.val)
        .crossJoin(F.broadcast(n_lang))
        .select(
            "doc_id",
            (F.col("idx") + F.col("n")).cast("int").alias("feature_idx"),
            F.concat(F.lit("source="), F.col("source")).alias("feature_name"),
        )
    )
    return lang_feats.unionAll(src_feats)


@query(
    "stats_anova_oneway",
    oracle="""
    WITH seg AS (
        SELECT c.c_mktsegment AS segment, o.o_totalprice AS v
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (
        SELECT segment, count(*)::BIGINT AS n_g, avg(v) AS m_g,
               var_samp(v) AS v_g
        FROM seg GROUP BY 1
    ),
    tot AS (
        SELECT count(*)::BIGINT AS k, sum(n_g)::BIGINT AS n,
               sum(n_g * m_g) / sum(n_g) AS grand_m
        FROM g
    ),
    ss AS (
        SELECT max(t.k)::BIGINT AS k, max(t.n)::BIGINT AS n,
               sum(g.n_g * (g.m_g - t.grand_m) * (g.m_g - t.grand_m)) AS ssb,
               sum((g.n_g - 1) * g.v_g) AS ssw
        FROM g, tot t
    )
    SELECT k, n, (k - 1)::BIGINT AS df_between, (n - k)::BIGINT AS df_within,
           round((ssb / (k - 1)) / nullif(ssw / (n - k), 0), 4) + 0.0 AS f_stat,
           round(ssb / nullif(ssb + ssw, 0), 6) + 0.0 AS eta_sq
    FROM ss
    """,
    tags=("analytics", "experiment"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test — does mean order value differ across the five
    market segments? Completes the two-sample suite (Welch t, Mann-Whitney,
    KS, chi-square) with the K-SAMPLE mean test: the question every
    segmentation readout asks before trusting per-segment differences.

    Decomposition runs on per-group sufficient statistics, never raw rows
    twice: one partial agg to (n_g, mean_g, var_samp_g) per segment, then
    all sums-of-squares arithmetic on the K-row table — SSB from group
    means vs the weighted grand mean, SSW from (n_g-1)*var_g (numerically
    stabler than sumsq - sum^2/n, and each engine computes its own
    var_samp the same way). F and eta-squared are the only floats emitted,
    rounded at the aggregate level (PARITY rule 1/6) with the -0.0 guard
    (rule 17). Divisions nullif-guarded: a single-group or zero-variance
    corpus yields NULL F, not a crash.

    At 100 TB: the segment agg is a partial (map-side combine) over a
    5-value key; everything after runs on 5 rows crossed with one scalar
    row — driver-sized, no second fact scan."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    seg = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    ).select(F.col("c_mktsegment").alias("segment"), F.col("o_totalprice").alias("v"))
    g = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.avg("v").alias("m_g"),
        F.var_samp("v").alias("v_g"),
    )
    # Totals as window functions over the K-row frame, NOT a separate agg
    # crossed back in: DataFrame reuse re-executes the subtree, so the
    # tot-then-crossJoin form re-derived seg/g once per consumer (4 scans);
    # this keeps ONE g subtree (plan-audit verified).
    wall = Window.partitionBy()
    g2 = g.select(
        "n_g",
        "m_g",
        "v_g",
        F.count(F.lit(1)).over(wall).alias("k"),
        F.sum("n_g").over(wall).alias("n"),
        (
            F.sum(F.col("n_g") * F.col("m_g")).over(wall) / F.sum("n_g").over(wall)
        ).alias("grand_m"),
    )
    ss = g2.groupBy("k", "n").agg(
        F.sum(
            F.col("n_g") * (F.col("m_g") - F.col("grand_m")) * (F.col("m_g") - F.col("grand_m"))
        ).alias("ssb"),
        F.sum((F.col("n_g") - 1) * F.col("v_g")).alias("ssw"),
    )
    return ss.select(
        "k",
        "n",
        (F.col("k") - 1).alias("df_between"),
        (F.col("n") - F.col("k")).alias("df_within"),
        (
            F.round(
                (F.col("ssb") / (F.col("k") - 1))
                / F.nullif(F.col("ssw") / (F.col("n") - F.col("k")), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("f_stat"),
        (
            F.round(
                F.col("ssb") / F.nullif(F.col("ssb") + F.col("ssw"), F.lit(0.0)), 6
            )
            + F.lit(0.0)
        ).alias("eta_sq"),
    )


@query(
    "stats_levene",
    oracle="""
    WITH seg AS (
        SELECT c.c_mktsegment AS segment, o.o_totalprice AS v
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    ctr AS (
        SELECT segment, avg(v) AS m_g FROM seg GROUP BY 1
    ),
    z AS (
        SELECT s.segment, abs(s.v - c.m_g) AS z
        FROM seg s JOIN ctr c ON s.segment = c.segment
    ),
    g AS (
        SELECT segment, count(*)::BIGINT AS n_g, avg(z) AS zm_g,
               var_samp(z) AS zv_g
        FROM z GROUP BY 1
    ),
    tot AS (
        SELECT count(*)::BIGINT AS k, sum(n_g)::BIGINT AS n,
               sum(n_g * zm_g) / sum(n_g) AS grand_zm
        FROM g
    ),
    ss AS (
        SELECT max(t.k)::BIGINT AS k, max(t.n)::BIGINT AS n,
               sum(g.n_g * (g.zm_g - t.grand_zm) * (g.zm_g - t.grand_zm)) AS ssb,
               sum((g.n_g - 1) * g.zv_g) AS ssw
        FROM g, tot t
    )
    SELECT k, n, (k - 1)::BIGINT AS df_between, (n - k)::BIGINT AS df_within,
           round((ssb / (k - 1)) / nullif(ssw / (n - k), 0), 4) + 0.0 AS w_stat
    FROM ss
    """,
    tags=("analytics", "experiment"),
)
def stats_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test for homogeneity of variance (mean-centered form) —
    the gatekeeper stats_anova_oneway assumes: classic ANOVA requires
    equal group variances, and Levene IS an ANOVA run on the absolute
    deviations z_ij = |x_ij − mean_g|, so a significant W says "use
    Welch, not pooled-variance tests". Mean centering (original Levene)
    keeps both dialects exact; the Brown-Forsythe median variant would
    re-open the exact-median pairing but adds nothing to the operator
    shape.

    Two aggregation passes, one fact scan each way: group means (a tiny
    K-row dim) broadcast back onto the rows to form z, then the same
    sufficient-statistics ANOVA as stats_anova_oneway on the K-row z
    summary. W is the only float emitted — aggregate-level round (rule
    1/6), -0.0 guard (rule 17), nullif-guarded divisions.

    At 100 TB: both passes are partial aggs on a 5-value key; the join
    is a broadcast of 5 rows — rows never shuffle."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    seg = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    ).select(F.col("c_mktsegment").alias("segment"), F.col("o_totalprice").alias("v"))
    ctr = seg.groupBy("segment").agg(F.avg("v").alias("m_g"))
    z = seg.join(F.broadcast(ctr), "segment").select(
        "segment", F.abs(F.col("v") - F.col("m_g")).alias("z")
    )
    g = z.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.avg("z").alias("zm_g"),
        F.var_samp("z").alias("zv_g"),
    )
    # Same one-subtree totals trick as stats_anova_oneway (window over the
    # K-row frame, never a crossJoin of a second aggregate of g).
    wall = Window.partitionBy()
    g2 = g.select(
        "n_g",
        "zm_g",
        "zv_g",
        F.count(F.lit(1)).over(wall).alias("k"),
        F.sum("n_g").over(wall).alias("n"),
        (
            F.sum(F.col("n_g") * F.col("zm_g")).over(wall) / F.sum("n_g").over(wall)
        ).alias("grand_zm"),
    )
    ss = g2.groupBy("k", "n").agg(
        F.sum(
            F.col("n_g")
            * (F.col("zm_g") - F.col("grand_zm"))
            * (F.col("zm_g") - F.col("grand_zm"))
        ).alias("ssb"),
        F.sum((F.col("n_g") - 1) * F.col("zv_g")).alias("ssw"),
    )
    return ss.select(
        "k",
        "n",
        (F.col("k") - 1).alias("df_between"),
        (F.col("n") - F.col("k")).alias("df_within"),
        (
            F.round(
                (F.col("ssb") / (F.col("k") - 1))
                / F.nullif(F.col("ssw") / (F.col("n") - F.col("k")), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("w_stat"),
    )


BOOT_B = 32  # bootstrap replicates
# Poisson(1) CDF thresholds over the first 6 md5 nibbles (16^6 lattice):
# cum pmf .36788/.73576/.91970/.98101/.99634 -> hex cutoffs. The >=5 tail
# (8.3e-5 mass) folds into w=5 — a documented truncation, irrelevant at
# any n. String compares on lowercase hex are exact in both engines.
BOOT_CUTS = [("5e2d58", 0), ("bc5ab1", 1), ("eb715e", 2), ("fb2397", 3), ("ff1025", 4)]


@query(
    "stats_bootstrap_ci",
    oracle=f"""
    WITH rows_cents AS (
        SELECT o_orderkey, floor(o_totalprice * 100 + 0.5)::BIGINT AS vc
        FROM orders
    ),
    drawn AS (
        SELECT r.b, rc.vc,
               CASE {' '.join(f"WHEN substr(md5(rc.o_orderkey::VARCHAR || ':' || r.b::VARCHAR), 1, 6) < '{cut}' THEN {w}" for cut, w in BOOT_CUTS)}
                    ELSE 5 END AS w
        FROM rows_cents rc, range({BOOT_B}) r(b)
    ),
    reps AS (
        SELECT b, sum(w * vc)::BIGINT AS swc, sum(w)::BIGINT AS sw
        FROM drawn GROUP BY b
    ),
    ci AS (
        SELECT count(*)::BIGINT AS n_replicates,
               round(quantile_cont(swc::DOUBLE / sw, 0.025), 4) + 0.0 AS ci_lo_cents,
               round(quantile_cont(swc::DOUBLE / sw, 0.5), 4) + 0.0 AS ci_mid_cents,
               round(quantile_cont(swc::DOUBLE / sw, 0.975), 4) + 0.0 AS ci_hi_cents
        FROM reps
    ),
    pt AS (
        SELECT round(sum(vc)::BIGINT / count(*)::DOUBLE, 4) + 0.0 AS mean_full_cents
        FROM rows_cents
    )
    SELECT n_replicates, mean_full_cents, ci_lo_cents, ci_mid_cents, ci_hi_cents
    FROM ci, pt
    """,
    tags=("analytics", "experiment"),
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value — THE
    resampling recipe that works at 100 TB: classic bootstrap resamples n
    rows with replacement B times (B shuffles of the fact — impossible);
    the Poisson approximation draws each row's multiplicity per replicate
    as an independent Poisson(1), so all B replicates ride ONE scan as a
    map-side explode×B followed by a B-key partial agg. No shuffle ever
    carries raw rows.

    Determinism discipline: multiplicities come from the first 6 md5
    nibbles of (orderkey:replicate) against precomputed Poisson-CDF hex
    cutoffs — pure string compares, identical in both engines, never
    rand() (the seeded-hash rule every sampler here follows). Replicate
    sums are exact integers (cents × weight), so each replicate mean is
    the same double on both sides; the CI quantiles use the proven
    percentile <-> quantile_cont interpolation pairing, rounded at the
    aggregate level with the -0.0 guard."""
    o = load(spark, sf_dir, "orders")
    rows_cents = o.select(
        "o_orderkey", F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("vc")
    )
    u = F.substring(
        F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":"), F.col("b").cast("string"))),
        1,
        6,
    )
    w_col = None
    for cut, w in BOOT_CUTS:
        cond = u < cut
        w_col = F.when(cond, w) if w_col is None else w_col.when(cond, w)
    w_col = w_col.otherwise(5)
    drawn = rows_cents.select(
        "o_orderkey", "vc", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    ).select("b", "vc", w_col.alias("w"))
    reps = drawn.groupBy("b").agg(
        F.sum(F.col("w") * F.col("vc")).alias("swc"), F.sum("w").alias("sw")
    )
    mean_b = (F.col("swc").cast("double") / F.col("sw")).alias("m")
    ci = reps.select(mean_b).agg(
        F.count(F.lit(1)).alias("n_replicates"),
        (F.round(F.expr("percentile(m, 0.025)"), 4) + F.lit(0.0)).alias("ci_lo_cents"),
        (F.round(F.expr("percentile(m, 0.5)"), 4) + F.lit(0.0)).alias("ci_mid_cents"),
        (F.round(F.expr("percentile(m, 0.975)"), 4) + F.lit(0.0)).alias("ci_hi_cents"),
    )
    pt = rows_cents.agg(
        (F.round(F.sum("vc").cast("double") / F.count(F.lit(1)), 4) + F.lit(0.0)).alias(
            "mean_full_cents"
        )
    )
    return ci.crossJoin(F.broadcast(pt)).select(
        "n_replicates", "mean_full_cents", "ci_lo_cents", "ci_mid_cents", "ci_hi_cents"
    )


FAIR_N_GROUPS = 4            # protected-attribute stand-in: user_id % 4 cohorts
FAIR_THRESHOLD_CENTS = 130000  # fixed decision threshold (~median engagement)


@query(
    "eval_fairness_report",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id % {FAIR_N_GROUPS} AS grp,
               floor(sum(CASE WHEN event_type IN ('view', 'click')
                              THEN value ELSE 0 END) * 100 + 0.5)::BIGINT
                   AS score_cents,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    conf AS (
        SELECT grp,
               count(*)::BIGINT AS n,
               sum(label)::BIGINT AS n_pos,
               sum(1 - label)::BIGINT AS n_neg,
               sum(CASE WHEN label = 1 AND score_cents >= {FAIR_THRESHOLD_CENTS}
                        THEN 1 ELSE 0 END)::BIGINT AS tp,
               sum(CASE WHEN label = 0 AND score_cents >= {FAIR_THRESHOLD_CENTS}
                        THEN 1 ELSE 0 END)::BIGINT AS fp,
               sum(CASE WHEN score_cents >= {FAIR_THRESHOLD_CENTS}
                        THEN 1 ELSE 0 END)::BIGINT AS selected
        FROM per_user GROUP BY grp
    )
    SELECT grp, n, n_pos, tp, fp, selected,
           (tp * 1000000 // nullif(n_pos, 0))::BIGINT AS tpr_ppm,
           (fp * 1000000 // nullif(n_neg, 0))::BIGINT AS fpr_ppm,
           (selected * 1000000 // nullif(n, 0))::BIGINT AS sel_ppm,
           ((selected * 1000000 // nullif(n, 0)) * 1000000
            // nullif(max(selected * 1000000 // nullif(n, 0)) OVER (), 0))::BIGINT
               AS disparate_impact_ppm
    FROM conf
    """,
    tags=("analytics", "eval", "privacy"),
)
def eval_fairness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of the whale classifier at a FIXED decision
    threshold — per-cohort TPR (equal opportunity), FPR (equalized odds'
    second leg), selection rate, and the disparate-impact ratio against
    the most-selected cohort (the four-fifths-rule number). The eval
    family measured ranking and calibration; this is the slice every
    deployment review asks for next, and the same per-group confusion
    shape audits a DATA pipeline's keep/drop filter for source bias.
    Cohort = user_id % {FAIR_N_GROUPS}, the fixture's protected-attribute
    stand-in (a real pipeline joins a demographic dim here — same plan).

    All-integer discipline: confusion cells are exact counts, every rate
    ships as ppm integer division (rule 25), the DI ratio is ppm-of-ppm
    — nothing can flip on a float tie; nullif guards empty cohorts and
    the max-selection window runs over {FAIR_N_GROUPS} rows.

    Scale: one partial agg to users, one to cohorts; the audit costs two
    map-side combines at any corpus size."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(F.col("event_type").isin("view", "click"), F.col("value")).otherwise(
                    0.0
                )
            )
            * 100
            + 0.5
        )
        .cast("long")
        .alias("score_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("label"),
    ).select((F.col("user_id") % FAIR_N_GROUPS).alias("grp"), "score_cents", "label")
    sel = F.col("score_cents") >= FAIR_THRESHOLD_CENTS
    conf = per_user.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").alias("n_pos"),
        F.sum(1 - F.col("label")).alias("n_neg"),
        F.sum(F.when((F.col("label") == 1) & sel, 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("label") == 0) & sel, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(sel, 1).otherwise(0)).alias("selected"),
    )
    sel_ppm = F.expr("selected * 1000000 div nullif(n, 0)")
    return conf.select(
        "grp",
        "n",
        "n_pos",
        "tp",
        "fp",
        "selected",
        F.expr("CAST(tp * 1000000 DIV nullif(n_pos, 0) AS BIGINT)").alias("tpr_ppm"),
        F.expr("CAST(fp * 1000000 DIV nullif(n_neg, 0) AS BIGINT)").alias("fpr_ppm"),
        sel_ppm.cast("long").alias("sel_ppm"),
        F.expr(
            "CAST((selected * 1000000 div nullif(n, 0)) * 1000000"
            " DIV nullif(max(selected * 1000000 div nullif(n, 0)) OVER (), 0) AS BIGINT)"
        ).alias("disparate_impact_ppm"),
    )


@query(
    "eval_auc_trapezoid",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               floor(sum(CASE WHEN event_type IN ('view', 'click')
                              THEN value ELSE 0 END) * 100 + 0.5)::BIGINT
                   AS score_cents,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    support AS (
        SELECT score_cents,
               sum(label)::BIGINT AS n_pos,
               sum(1 - label)::BIGINT AS n_neg
        FROM per_user GROUP BY score_cents
    ),
    curve AS (
        SELECT (sum(n_pos) OVER w)::BIGINT AS ctp,
               (sum(n_neg) OVER w)::BIGINT AS cfp,
               (sum(n_pos) OVER ())::BIGINT AS p,
               (sum(n_neg) OVER ())::BIGINT AS nn
        FROM support
        WINDOW w AS (ORDER BY score_cents DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    terms AS (
        SELECT p, nn,
               (cfp - lag(cfp, 1, 0::BIGINT) OVER (ORDER BY cfp, ctp))
                   * (ctp + lag(ctp, 1, 0::BIGINT) OVER (ORDER BY cfp, ctp)) AS term
        FROM curve
    ),
    trap AS (
        SELECT max(p)::BIGINT AS n_pos, max(nn)::BIGINT AS n_neg,
               sum(term)::BIGINT AS auc_x2pn
        FROM terms
    )
    SELECT n_pos, n_neg,
           (auc_x2pn * 1000000 // nullif(2 * n_pos * n_neg, 0))::BIGINT AS auc_ppm
    FROM trap
    """,
    tags=("analytics", "eval"),
)
def eval_auc_trapezoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC as ONE exact number — the trapezoid integral of
    eval_roc_curve's support, kept ENTIRELY in integers: with cumulative
    counts ctp/cfp, twice-the-area-times-P*N is
    Σ (Δcfp)·(ctp + ctp_prev), an integer; AUC ships as ppm integer
    division (rule 25). No float ever enters, so the headline ranking
    metric can never drift on a fold order — the same
    exactness-by-integerization discipline as Mann-Whitney U (AUC is
    U/(P·N), and a property test could pin that identity).

    Scale: user rollup (partial agg) → per-score support (partial agg)
    → two windows over the support rows (distinct score values, not
    users) → one row. The curve frame is score-cardinality-bounded; at
    100 TB quantize scores (integer cents already does) to cap it."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(F.col("event_type").isin("view", "click"), F.col("value")).otherwise(0.0)
            )
            * 100
            + 0.5
        )
        .cast("long")
        .alias("score_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("label"),
    )
    support = per_user.groupBy("score_cents").agg(
        F.sum("label").alias("n_pos"), F.sum(1 - F.col("label")).alias("n_neg")
    )
    w = Window.orderBy(F.col("score_cents").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    curve = support.select(
        F.sum("n_pos").over(w).alias("ctp"),
        F.sum("n_neg").over(w).alias("cfp"),
        F.sum("n_pos").over(wall).alias("p"),
        F.sum("n_neg").over(wall).alias("nn"),
    )
    wl = Window.orderBy("cfp", "ctp")
    trap = curve.select(
        "p",
        "nn",
        (
            (F.col("cfp") - F.lag("cfp", 1, 0).over(wl))
            * (F.col("ctp") + F.lag("ctp", 1, 0).over(wl))
        ).alias("term"),
    ).agg(
        F.max("p").alias("n_pos"),
        F.max("nn").alias("n_neg"),
        F.sum("term").alias("auc_x2pn"),
    )
    return trap.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CAST(auc_x2pn * 1000000 DIV nullif(2 * n_pos * n_neg, 0) AS BIGINT)"
        ).alias("auc_ppm"),
    )


@query(
    "eval_brier_score",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS qid, e.label,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings e ON e.vec_id >= {KNN_NQUERIES}
        WHERE q.vec_id < {KNN_NQUERIES}
    ),
    votes AS (
        SELECT qid, label, count(*)::BIGINT AS n_votes
        FROM scored WHERE rank <= {KNN_K}
        GROUP BY qid, label
    ),
    pred AS (
        SELECT qid, label AS predicted_label, n_votes FROM (
            SELECT qid, label, n_votes,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY n_votes DESC, label ASC) AS r
            FROM votes
        ) WHERE r = 1
    ),
    judged AS (
        SELECT p.n_votes::DOUBLE / {KNN_K} AS conf,
               CASE WHEN p.predicted_label = t.label THEN 1 ELSE 0 END AS correct
        FROM pred p JOIN embeddings t ON p.qid = t.vec_id
    )
    SELECT count(*)::BIGINT AS n,
           round(avg((conf - correct) * (conf - correct)), 6) + 0.0 AS brier,
           round(avg(correct), 4) + 0.0 AS accuracy
    FROM judged
    """,
    tags=("analytics", "eval"),
)
def eval_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of knn_label's confidence — the PROPER scoring rule
    the calibration family was missing: eval_calibration_bins shows
    WHERE confidence is miscalibrated, the Brier score is the single
    number that penalizes it (mean squared error of the vote-fraction
    probability against the 0/1 outcome), decomposable into exactly the
    calibration + refinement the bins visualize.

    Confidence is the exact integer ratio n_votes/K (identical double
    both engines); the mean over queries is the only fold-order float →
    aggregate-level round. Same broadcast-query kNN subtree as the
    report/calibration ops — the metric rides an existing candidate
    pipeline, no new corpus pass at scale."""
    e = load(spark, sf_dir, "embeddings")
    truth = e.filter(F.col("vec_id") < KNN_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("truth")
    )
    preds = knn_label(spark, sf_dir).join(F.broadcast(truth), "qid")
    judged = preds.select(
        (F.col("n_votes").cast("double") / KNN_K).alias("conf"),
        F.when(F.col("predicted_label") == F.col("truth"), 1).otherwise(0).alias("correct"),
    )
    return judged.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.round(
                F.avg((F.col("conf") - F.col("correct")) * (F.col("conf") - F.col("correct"))),
                6,
            )
            + F.lit(0.0)
        ).alias("brier"),
        (F.round(F.avg("correct"), 4) + F.lit(0.0)).alias("accuracy"),
    )


@query(
    "stats_kruskal_wallis",
    oracle="""
    WITH cnt AS (
        SELECT c_mktsegment AS segment, o_totalprice AS v,
               count(*)::BIGINT AS n_sv
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    -- histogram ranking: value v (ascending) occupies ranks
    -- [cum_before + 1, cum_before + t], so 2 * mid-rank = 2*cum + t + 1 —
    -- an exact BIGINT in both engines (no float fold-order risk, no
    -- global row sort)
    vrank AS (
        SELECT v, t,
               (2 * (cum - t) + t + 1)::BIGINT AS r2
        FROM (
            SELECT v, sum(n_sv)::BIGINT AS t,
                   sum(sum(n_sv)) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS cum
            FROM cnt GROUP BY v
        )
    ),
    grp AS (
        SELECT c.segment, sum(c.n_sv)::BIGINT AS n_g,
               sum(c.n_sv * k.r2)::BIGINT AS sum_r2_g
        FROM cnt c JOIN vrank k ON c.v = k.v
        GROUP BY c.segment
    ),
    ties AS (
        SELECT sum(t * t * t - t)::BIGINT AS tie_sum,
               sum(CASE WHEN t > 1 THEN 1 ELSE 0 END)::BIGINT AS n_tied_values
        FROM vrank
    ),
    tot AS (
        SELECT count(*)::BIGINT AS k, sum(n_g)::BIGINT AS n,
               sum((sum_r2_g / 2.0) * (sum_r2_g / 2.0) / n_g) AS ssq
        FROM grp
    )
    SELECT t.k, t.n,
           round(12.0 * t.ssq / (t.n * (t.n + 1)) - 3.0 * (t.n + 1), 4) + 0.0
               AS h_stat,
           round((12.0 * t.ssq / (t.n * (t.n + 1)) - 3.0 * (t.n + 1))
                 / nullif(1.0 - ties.tie_sum
                          / (t.n::DOUBLE * t.n * t.n - t.n), 0.0), 4) + 0.0
               AS h_corrected,
           ties.n_tied_values
    FROM tot t CROSS JOIN ties
    """,
    tags=("analytics", "experiment"),
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank test — the distribution-free sibling of
    stats_anova_oneway for the same question (do the five market
    segments' order values differ?) when normality can't be assumed:
    H = 12/(N(N+1)) * sum_g R_g^2/n_g - 3(N+1) over AVERAGE ranks, with
    the standard tie correction C = 1 - sum(t^3-t)/(N^3-N). Completes the
    nonparametric suite (agg_mannwhitney_u is its two-group special
    case — a property test pins that identity on a two-group slice).

    Exactness AND scale from one construction — HISTOGRAM ranking: rows
    reduce map-side to (segment, value) counts, value v's mid-rank comes
    from the running total of value counts (value v spans ranks
    [cum_before+1, cum_before+t], so 2*midrank = 2*cum_before + t + 1 —
    an exact BIGINT; mid-ranks are multiples of 0.5, never a float), and
    group rank sums are count-weighted folds over the VALUE table. No
    global row sort, no join back to rows: the classic sort-based ranking
    would range-partition-sort all N rows and re-join them; this plan
    touches rows once (partial agg) and ranks the distinct-value frame.
    Floats appear only in the final K-row fold, aggregate-rounded (rules
    1/6) with the -0.0 guard (rule 17). The squaring happens in DOUBLE
    because sum_r2_g^2 overflows BIGINT around N~10^5 (noted, not hit:
    the docstring constraint the differential fuzzer checks).

    The one remaining global structure is the prefix sum over distinct
    values — a window ordered by v over the value histogram (|V| rows,
    not N). At 100 TB with a near-unique value domain |V|~N, the same
    two-pass distributed prefix-sum (per-partition subtotals broadcast as
    offsets) applies; the fixture's |V| makes the single window exact and
    cheap."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cnt = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("o_totalprice").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n_sv"))
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vrank = (
        cnt.groupBy("v")
        .agg(F.sum("n_sv").alias("t"))
        .select("v", "t", F.sum("t").over(wcum).alias("cum"))
        .select("v", "t", (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1).alias("r2"))
    )
    grp = (
        cnt.join(vrank.select("v", "r2"), "v")
        .groupBy("segment")
        .agg(
            F.sum("n_sv").alias("n_g"),
            F.sum(F.col("n_sv") * F.col("r2")).alias("sum_r2_g"),
        )
    )
    ties = vrank.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_sum"),
        F.sum(F.when(F.col("t") > 1, 1).otherwise(0)).alias("n_tied_values"),
    )
    tot = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.sum(
            (F.col("sum_r2_g") / 2.0) * (F.col("sum_r2_g") / 2.0) / F.col("n_g")
        ).alias("ssq"),
    )
    h = 12.0 * F.col("ssq") / (F.col("n") * (F.col("n") + 1)) - 3.0 * (F.col("n") + 1)
    c_corr = 1.0 - F.col("tie_sum") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return tot.crossJoin(F.broadcast(ties)).select(
        "k",
        "n",
        (F.round(h, 4) + F.lit(0.0)).alias("h_stat"),
        (F.round(h / F.nullif(c_corr, F.lit(0.0)), 4) + F.lit(0.0)).alias("h_corrected"),
        "n_tied_values",
    )


WOE_PRIOR = 0.5  # Laplace smoothing pseudo-count per class


@query(
    "feature_woe",
    oracle=f"""
    WITH lab AS (
        SELECT c.c_custkey, c.c_mktsegment AS segment,
               max(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                   AS label
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment
    ),
    seg AS (
        SELECT segment, count(*)::BIGINT AS n,
               sum(label)::BIGINT AS n_pos,
               sum(1 - label)::BIGINT AS n_neg
        FROM lab GROUP BY segment
    ),
    tot AS (
        SELECT segment, n, n_pos, n_neg,
               sum(n_pos) OVER ()::BIGINT AS pos_tot,
               sum(n_neg) OVER ()::BIGINT AS neg_tot
        FROM seg
    )
    SELECT segment, n, n_pos, n_neg,
           round(ln(((n_pos + {WOE_PRIOR}) / (pos_tot + {WOE_PRIOR}))
                    / ((n_neg + {WOE_PRIOR}) / (neg_tot + {WOE_PRIOR}))), 6) + 0.0
               AS woe,
           round((n_pos::DOUBLE / pos_tot - n_neg::DOUBLE / neg_tot)
                 * ln(((n_pos + {WOE_PRIOR}) / (pos_tot + {WOE_PRIOR}))
                      / ((n_neg + {WOE_PRIOR}) / (neg_tot + {WOE_PRIOR}))), 6) + 0.0
               AS iv_term
    FROM tot
    """,
    tags=("feature", "pipeline"),
)
def feature_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + information value — the
    risk-modeling-standard categorical encoder feature_target_encode's
    mean-encoding doesn't cover: WOE_g = ln((P(g|pos)/P(g|neg))), a
    log-odds-scaled embedding of each category that is monotone in the
    target rate and additive in a logistic model; the per-category IV
    term (summed = the feature's screening score) ranks features before
    training. Label = customer placed at least one URGENT order; the
    left join keeps order-less customers as clean negatives.

    Laplace smoothing ({WOE_PRIOR} pseudo-count, both classes both
    dialects) keeps the log finite when a category has zero
    positives/negatives — the classic WOE failure mode. Transcendental
    output → 6-dp aggregate rounding (rule 8), -0.0 guard (rule 17);
    counts stay BIGINT-exact; class totals ride a window over the K-row
    group frame (the stats_anova one-subtree trick), never a second scan.

    Scale: one partial-agg reduction to customers, one to categories;
    the encoder table that ships to training is K rows — broadcast-sized
    by construction, no vocabulary state (the fitted-dictionary contrast
    to feature_hashing's stateless trick)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    lab = (
        c.select("c_custkey", F.col("c_mktsegment").alias("segment"))
        .join(
            o.select(
                "o_custkey",
                F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                .otherwise(0)
                .alias("is_urgent"),
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey", "segment")
        .agg(F.coalesce(F.max("is_urgent"), F.lit(0)).alias("label"))
    )
    seg = lab.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").alias("n_pos"),
        F.sum(1 - F.col("label")).alias("n_neg"),
    )
    wall = Window.partitionBy()
    tot = seg.select(
        "segment",
        "n",
        "n_pos",
        "n_neg",
        F.sum("n_pos").over(wall).alias("pos_tot"),
        F.sum("n_neg").over(wall).alias("neg_tot"),
    )
    woe = F.log(
        ((F.col("n_pos") + WOE_PRIOR) / (F.col("pos_tot") + WOE_PRIOR))
        / ((F.col("n_neg") + WOE_PRIOR) / (F.col("neg_tot") + WOE_PRIOR))
    )
    iv = (
        F.col("n_pos").cast("double") / F.col("pos_tot")
        - F.col("n_neg").cast("double") / F.col("neg_tot")
    ) * woe
    return tot.select(
        "segment",
        "n",
        "n_pos",
        "n_neg",
        (F.round(woe, 6) + F.lit(0.0)).alias("woe"),
        (F.round(iv, 6) + F.lit(0.0)).alias("iv_term"),
    )


@query(
    "eval_mcnemar_paired",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS qid, q.label AS truth, e.label,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.embedding::DOUBLE[],
                                             e.embedding::DOUBLE[]) DESC,
                            e.vec_id ASC) AS rank
        FROM embeddings q JOIN embeddings e ON e.vec_id >= {KNN_NQUERIES}
        WHERE q.vec_id < {KNN_NQUERIES}
    ),
    votes AS (
        SELECT qid, label, count(*)::BIGINT AS n_votes
        FROM scored WHERE rank <= {KNN_K}
        GROUP BY qid, label
    ),
    pred_a AS (
        SELECT qid, label AS a_label FROM (
            SELECT *, row_number() OVER (PARTITION BY qid
                                         ORDER BY n_votes DESC, label ASC) AS vr
            FROM votes
        ) WHERE vr = 1
    ),
    pred_b AS (SELECT qid, label AS b_label, truth FROM scored WHERE rank = 1),
    paired AS (
        SELECT CASE WHEN a.a_label = b.truth THEN 1 ELSE 0 END AS a_ok,
               CASE WHEN b.b_label = b.truth THEN 1 ELSE 0 END AS b_ok
        FROM pred_a a JOIN pred_b b ON a.qid = b.qid
    )
    SELECT count(*)::BIGINT AS n,
           sum(a_ok)::BIGINT AS n_a_correct,
           sum(b_ok)::BIGINT AS n_b_correct,
           sum(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END)::BIGINT AS b_cell,
           sum(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END)::BIGINT AS c_cell,
           round(CASE WHEN sum(CASE WHEN a_ok != b_ok THEN 1 ELSE 0 END) = 0
                      THEN 0.0
                      ELSE power(abs(sum(CASE WHEN a_ok = 1 AND b_ok = 0
                                              THEN 1 ELSE 0 END)
                                     - sum(CASE WHEN a_ok = 0 AND b_ok = 1
                                                THEN 1 ELSE 0 END))::DOUBLE - 1.0,
                                 2)
                           / sum(CASE WHEN a_ok != b_ok THEN 1 ELSE 0 END)
                 END, 6) + 0.0 AS chi2_cc
    FROM paired
    """,
    tags=("eval", "experiment"),
)
def eval_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test — the PAIRED model comparison the eval family was
    missing: two classifiers judged on the SAME examples (A = {KNN_K}-NN
    majority vote, exactly knn_label's rule; B = 1-NN, the rank-1 label),
    truth = the query's own label. Unpaired accuracy comparison wastes
    the pairing; McNemar looks only at the DISCORDANT cells — b = A
    right/B wrong, c = A wrong/B right — and chi2_cc = (|b-c|-1)^2 /
    (b+c) with the standard continuity correction (0 when no
    discordance). This is the statistically correct way to decide 'is
    the k-vote worth it over nearest-neighbor' from one eval set.

    Both predictions derive from ONE scored ranking (the knn_label
    subtree, shared CTE in both dialects): the k-NN vote aggregates
    rank<=k, the 1-NN reads rank=1 — no second retrieval pass. Counts
    are exact integers; chi2 is the only float, aggregate-rounded (rule
    6) with -0.0 guard (rule 17). Scale: the ranking is the bounded
    {KNN_NQUERIES}-query x corpus scan knn_label already pays; the
    McNemar fold is one row."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < KNN_NQUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("truth"),
        F.col("embedding").alias("q_emb"),
    )
    corpus = e.filter(F.col("vec_id") >= KNN_NQUERIES)
    w = Window.partitionBy("qid").orderBy(F.col("raw_dot").desc(), F.col("vec_id").asc())
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .select(
            "qid",
            "truth",
            "vec_id",
            "label",
            dot(F.col("q_emb"), F.col("embedding")).alias("raw_dot"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
    )
    votes = scored.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("n_votes"))
    wv = Window.partitionBy("qid").orderBy(F.col("n_votes").desc(), F.col("label").asc())
    pred_a = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("qid", F.col("label").alias("a_label"))
    )
    pred_b = scored.filter(F.col("rank") == 1).select(
        "qid", F.col("label").alias("b_label"), "truth"
    )
    paired = pred_a.join(pred_b, "qid").select(
        F.when(F.col("a_label") == F.col("truth"), 1).otherwise(0).alias("a_ok"),
        F.when(F.col("b_label") == F.col("truth"), 1).otherwise(0).alias("b_ok"),
    )
    agg = paired.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a_ok").alias("n_a_correct"),
        F.sum("b_ok").alias("n_b_correct"),
        F.sum(F.when((F.col("a_ok") == 1) & (F.col("b_ok") == 0), 1).otherwise(0)).alias(
            "b_cell"
        ),
        F.sum(F.when((F.col("a_ok") == 0) & (F.col("b_ok") == 1), 1).otherwise(0)).alias(
            "c_cell"
        ),
    )
    disc = F.col("b_cell") + F.col("c_cell")
    chi2 = F.when(disc == 0, F.lit(0.0)).otherwise(
        F.pow(F.abs(F.col("b_cell") - F.col("c_cell")).cast("double") - 1.0, 2)
        / disc
    )
    return agg.select(
        "n",
        "n_a_correct",
        "n_b_correct",
        "b_cell",
        "c_cell",
        (F.round(chi2, 6) + F.lit(0.0)).alias("chi2_cc"),
    )


@query(
    "stats_effect_sizes",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                    THEN 'control' ELSE 'treatment' END AS arm,
               sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                   AS spend,
               floor(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                     * 100 + 0.5)::BIGINT AS spend_cents
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, count(*)::BIGINT AS n, avg(spend) AS m, var_samp(spend) AS v
        FROM per_user GROUP BY arm
    ),
    cnt AS (
        SELECT arm, spend_cents, count(*)::BIGINT AS n_av
        FROM per_user GROUP BY arm, spend_cents
    ),
    -- histogram ranking over the spend SUPPORT (stats_kruskal_wallis's
    -- construction): 2*midrank of value v = 2*(cum-t) + t + 1, exact BIGINT
    vrank AS (
        SELECT spend_cents, (2 * (cum - t) + t + 1)::BIGINT AS r2
        FROM (
            SELECT spend_cents, sum(n_av)::BIGINT AS t,
                   sum(sum(n_av)) OVER (ORDER BY spend_cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS cum
            FROM cnt GROUP BY spend_cents
        )
    ),
    u AS (
        SELECT sum(CASE WHEN c.arm = 'treatment' THEN c.n_av * k.r2 ELSE 0 END)
                   ::BIGINT / 2.0 AS rank_sum_t
        FROM cnt c JOIN vrank k ON c.spend_cents = k.spend_cents
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 'control' THEN n END)::BIGINT AS n_c,
               max(CASE WHEN arm = 'control' THEN m END) AS m_c,
               max(CASE WHEN arm = 'control' THEN v END) AS v_c,
               max(CASE WHEN arm = 'treatment' THEN n END)::BIGINT AS n_t,
               max(CASE WHEN arm = 'treatment' THEN m END) AS m_t,
               max(CASE WHEN arm = 'treatment' THEN v END) AS v_t
        FROM arms
    )
    SELECT n_c, n_t,
           round((m_t - m_c)
                 / nullif(sqrt(((n_c - 1) * v_c + (n_t - 1) * v_t)
                               / (n_c + n_t - 2)), 0.0), 6) + 0.0 AS cohens_d,
           round(((m_t - m_c)
                  / nullif(sqrt(((n_c - 1) * v_c + (n_t - 1) * v_t)
                                / (n_c + n_t - 2)), 0.0))
                 * (1.0 - 3.0 / (4.0 * (n_c + n_t) - 9.0)), 6) + 0.0 AS hedges_g,
           round(2.0 * (u.rank_sum_t - n_t * (n_t + 1) / 2.0)::DOUBLE
                 / nullif((n_c * n_t)::DOUBLE, 0.0) - 1.0, 6) + 0.0
               AS rank_biserial
    FROM wide CROSS JOIN u
    """,
    tags=("analytics", "experiment"),
)
def stats_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect sizes for the control/treatment split — the numbers a
    significance test does NOT give: stats_ttest_welch says whether the
    arms differ; these say by HOW MUCH, unit-free. Cohen's d (pooled-SD
    standardized mean difference), Hedges' g (d with the small-sample
    bias factor 1 − 3/(4N−9)), and the rank-biserial correlation
    (2U/(n_c·n_t) − 1 — the effect size of agg_mannwhitney_u's U, robust
    to the spend skew). Same md5 arm assignment as the t-test, so the
    suite reads as one experiment report.

    Rank sums quantize spend to integer CENTS and use MIDRANKS from
    HISTOGRAM ranking (stats_kruskal_wallis's construction, ported per
    VERDICT r9 item 2), exactly as agg_mannwhitney_u does (PARITY rule
    17b): (arm, cents) counts reduce map-side, 2·midrank of value v =
    2·(cum−t)+t+1 over the value SUPPORT is an exact BIGINT, and
    rank_sum_t = Σ n_av·r2 / 2 is a halved integer — ranking the raw
    float sum would let cross-engine fold-order ulp drift split a
    support point, and row_number-with-tiebreak would make U depend on
    the arbitrary tiebreak under ties (the zero-spend block is one huge
    tie). Moments keep the raw float spend (var_samp/avg over the
    per-user frame — quantization would bias d/g); the three statistics
    are the only floats, aggregate-rounded (rule 6/8) with -0.0 guards
    (rule 17).

    Scale: one partial agg to users, one tiny arm rollup; the only
    global structure is the prefix sum over DISTINCT cents values (|V|
    rows, not |users| — no corpus-sized Window.orderBy, pinned in
    tests/test_plans.py)."""
    ev = load(spark, sf_dir, "events")
    spend = F.sum(
        F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
    )
    per_user = ev.groupBy("user_id").agg(
        spend.alias("spend"),
        (F.floor(spend * 100 + 0.5)).cast("long").alias("spend_cents"),
    ).select(
        "user_id",
        "spend",
        "spend_cents",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1)
            < "8",
            "control",
        )
        .otherwise("treatment")
        .alias("arm"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("spend").alias("m"),
        F.var_samp("spend").alias("v"),
    )
    cnt = per_user.groupBy("arm", "spend_cents").agg(F.count(F.lit(1)).alias("n_av"))
    wcum = Window.orderBy("spend_cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vrank = (
        cnt.groupBy("spend_cents")
        .agg(F.sum("n_av").alias("t"))
        .select("spend_cents", "t", F.sum("t").over(wcum).alias("cum"))
        .select(
            "spend_cents",
            (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1).alias("r2"),
        )
    )
    u = cnt.join(vrank, "spend_cents").agg(
        (
            F.sum(
                F.when(
                    F.col("arm") == "treatment", F.col("n_av") * F.col("r2")
                ).otherwise(0)
            )
            / 2.0
        ).alias("rank_sum_t")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("arm") == "control", F.col("m"))).alias("m_c"),
        F.max(F.when(F.col("arm") == "control", F.col("v"))).alias("v_c"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("m"))).alias("m_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("v"))).alias("v_t"),
    )
    n_c, n_t = F.col("n_c"), F.col("n_t")
    pooled_sd = F.sqrt(
        ((n_c - 1) * F.col("v_c") + (n_t - 1) * F.col("v_t")) / (n_c + n_t - 2)
    )
    d = (F.col("m_t") - F.col("m_c")) / F.nullif(pooled_sd, F.lit(0.0))
    g = d * (1.0 - 3.0 / (4.0 * (n_c + n_t) - 9.0))
    rb = (
        2.0
        * (F.col("rank_sum_t") - n_t * (n_t + 1) / 2.0).cast("double")
        / F.nullif((n_c * n_t).cast("double"), F.lit(0.0))
        - 1.0
    )
    return wide.crossJoin(F.broadcast(u)).select(
        "n_c",
        "n_t",
        (F.round(d, 6) + F.lit(0.0)).alias("cohens_d"),
        (F.round(g, 6) + F.lit(0.0)).alias("hedges_g"),
        (F.round(rb, 6) + F.lit(0.0)).alias("rank_biserial"),
    )


# --- round 8: decile lift/gains table ---------------------------------------


@query(
    "eval_lift_table",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               floor(sum(CASE WHEN event_type IN ('view', 'click')
                              THEN value ELSE 0 END) * 100 + 0.5)::BIGINT
                   AS score_cents,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT label,
               row_number() OVER (ORDER BY score_cents DESC, user_id ASC) AS rn,
               count(*) OVER ()::BIGINT AS n_total,
               sum(label) OVER ()::BIGINT AS pos_total
        FROM per_user
    ),
    deciles AS (
        SELECT ((rn - 1) * 10) // n_total AS decile,
               count(*)::BIGINT AS n,
               sum(label)::BIGINT AS n_pos,
               max(n_total)::BIGINT AS n_total,
               max(pos_total)::BIGINT AS pos_total
        FROM ranked GROUP BY 1
    )
    SELECT decile::BIGINT AS decile, n, n_pos,
           (n_pos * 1000000 // n)::BIGINT AS rate_ppm,
           (sum(n_pos) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
               AS cum_pos,
           ((sum(n_pos) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                * 1000000 // nullif(pos_total, 0))::BIGINT AS capture_ppm,
           (n_pos * n_total * 1000000 // nullif(n * pos_total, 0))::BIGINT
               AS lift_ppm
    FROM deciles
    """,
    tags=("analytics", "eval"),
)
def eval_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift & gains table — the campaign-targeting readout that sits
    next to eval_auc_trapezoid (same deterministic score = engagement
    cents, same label = big-purchase flag): users are ranked by score,
    cut into ten equal-population deciles (ties broken by user_id so the
    cut is reproducible — ntile() without a full tiebreak is
    run-dependent, rule 10's lesson), and each decile reports its response
    rate, cumulative capture of all positives (the gains curve), and lift
    over the base rate — all integer ppm (rule 25), so the twin is exact.

    The registered plan is the histogram-boundary one (VERDICT r8 item 2 —
    previously only described here, now the default): per-score-group
    counts plus a cumulative window over the SCORE SUPPORT (a bounded
    discrete domain — cents-quantized scores, the agg_quantile_histogram
    trick / eval_auc_trapezoid's curve construction) locate every decile
    boundary without ranking the corpus-sized frame. Score groups that
    straddle no boundary contribute their (count, positives) to one decile
    wholesale; only the ≤9 boundary-straddling groups rejoin the per-user
    frame for the (score, user_id) tiebreak rank — and that row_number is
    PARTITIONED by score_cents, so no corpus-sized unpartitioned window
    remains (pinned by tests/test_plans.py). Exact-integer algebra
    throughout, so the result is bit-identical to the naive global rank.
    Downstream: capture_ppm at decile 2 is the 'top-20%' number every
    targeting deck quotes; lift_ppm < 1e6 marks deciles worse than random."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(F.col("event_type").isin("view", "click"), F.col("value")).otherwise(
                    0.0
                )
            )
            * 100
            + 0.5
        )
        .cast("long")
        .alias("score_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("label"),
    )
    # Score-support histogram: one row per distinct score_cents. The
    # cumulative window below runs over score SUPPORT, not users.
    hist = per_user.groupBy("score_cents").agg(
        F.count(F.lit(1)).alias("g_n"), F.sum("label").alias("g_pos")
    )
    whist = Window.orderBy(F.col("score_cents").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hist = hist.select(
        "score_cents",
        "g_n",
        "g_pos",
        (F.sum("g_n").over(whist) - F.col("g_n")).alias("cum_before"),
    )
    totals = per_user.agg(
        F.count(F.lit(1)).alias("n_total"), F.sum("label").alias("pos_total")
    )
    h = hist.crossJoin(F.broadcast(totals)).select(
        "*",
        F.expr("cum_before * 10 div n_total").alias("d_first"),
        F.expr("(cum_before + g_n - 1) * 10 div n_total").alias("d_last"),
    )
    whole = h.filter(F.col("d_first") == F.col("d_last")).select(
        F.col("d_first").alias("decile"),
        F.col("g_n").alias("n"),
        F.col("g_pos").alias("n_pos"),
        "n_total",
        "pos_total",
    )
    # ≤9 straddling score groups: per-row tiebreak rank, PARTITIONED by the
    # score group (never an unpartitioned corpus-sized window).
    strad = h.filter(F.col("d_first") != F.col("d_last")).select(
        "score_cents", "cum_before", "n_total", "pos_total"
    )
    wgrp = Window.partitionBy("score_cents").orderBy(F.col("user_id").asc())
    split = (
        per_user.join(F.broadcast(strad), "score_cents")
        .select(
            "label",
            "n_total",
            "pos_total",
            (
                (F.col("cum_before") + F.row_number().over(wgrp) - F.lit(1))
                * F.lit(10)
            ).alias("scaled_rank"),
        )
        .groupBy(F.expr("scaled_rank div n_total").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("n_pos"),
            F.max("n_total").alias("n_total"),
            F.max("pos_total").alias("pos_total"),
        )
    )
    deciles = whole.unionByName(split).groupBy("decile").agg(
        F.sum("n").alias("n"),
        F.sum("n_pos").alias("n_pos"),
        F.max("n_total").alias("n_total"),
        F.max("pos_total").alias("pos_total"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_pos = F.sum("n_pos").over(wcum)
    return deciles.select(
        F.col("decile").cast("long").alias("decile"),
        "n",
        "n_pos",
        F.expr("n_pos * 1000000 div n").alias("rate_ppm"),
        cum_pos.alias("cum_pos"),
        F.expr(
            "sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND"
            " CURRENT ROW) * 1000000 div nullif(pos_total, 0)"
        ).alias("capture_ppm"),
        F.expr("n_pos * n_total * 1000000 div nullif(n * pos_total, 0)").alias("lift_ppm"),
    )


# --- round 8: permutation test ----------------------------------------------

PERM_K = 100  # permutation replicates; p-value resolution = 1/(K+1)


@query(
    "stats_permutation_test",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    obs AS (
        SELECT
            abs(
              sum(CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                       THEN converted ELSE 0 END) * 1000000
                // nullif(sum(CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                            THEN 1 ELSE 0 END), 0)
              - sum(CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                         THEN converted ELSE 0 END) * 1000000
                // nullif(sum(CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                            THEN 1 ELSE 0 END), 0)
            )::BIGINT AS obs_diff_ppm
        FROM per_user
    ),
    perms AS (
        SELECT k,
               abs(
                 sum(CASE WHEN substr(md5(user_id::VARCHAR || ':' || k::VARCHAR), 1, 1) >= '8'
                          THEN converted ELSE 0 END) * 1000000
                   // nullif(sum(CASE WHEN substr(md5(user_id::VARCHAR || ':' || k::VARCHAR), 1, 1) >= '8'
                               THEN 1 ELSE 0 END), 0)
                 - sum(CASE WHEN substr(md5(user_id::VARCHAR || ':' || k::VARCHAR), 1, 1) < '8'
                            THEN converted ELSE 0 END) * 1000000
                   // nullif(sum(CASE WHEN substr(md5(user_id::VARCHAR || ':' || k::VARCHAR), 1, 1) < '8'
                               THEN 1 ELSE 0 END), 0)
               )::BIGINT AS diff_ppm
        FROM per_user, unnest(range(1, {PERM_K} + 1)) t(k)
        GROUP BY k
    )
    SELECT o.obs_diff_ppm,
           {PERM_K}::BIGINT AS n_perms,
           sum(CASE WHEN p.diff_ppm >= o.obs_diff_ppm THEN 1 ELSE 0 END)::BIGINT
               AS n_ge,
           ((1 + sum(CASE WHEN p.diff_ppm >= o.obs_diff_ppm THEN 1 ELSE 0 END))
               * 1000000 // ({PERM_K} + 1))::BIGINT AS p_value_ppm
    FROM perms p CROSS JOIN obs o
    GROUP BY o.obs_diff_ppm
    """,
    tags=("analytics", "stats"),
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the A/B conversion lift — the assumption-free
    sibling of ab_experiment_report's pooled z-test: the null distribution
    is built by RE-RANDOMIZING users into arms PERM_K times and recomputing
    the |rate difference| each time; the p-value is the add-one-smoothed
    fraction of permutations at least as extreme as the observed split
    ((1+n_ge)/(K+1), Phipson–Smyth). Every replicate's assignment is a
    deterministic md5 of (user, k) — the corpus_shard_split arming rule —
    so the 'random' relabeling is exactly reproducible in both engines and
    across reruns: a permutation test you cannot replay is not evidence.
    Statistics are integer ppm throughout (rule 25), so the twin is exact.

    Scale shape — why permutation tests are FEASIBLE at 100 TB when done
    this way: the corpus is scanned ONCE into per-user flags; the K
    replicates are a map-side explode of K tiny (k, arm) keys per user
    followed by ONE partial-agg groupBy(k) whose state is 2K counters —
    work is K x |users| cheap hash updates, not K corpus scans, and K
    bounds the p-value resolution, not the data volume. The observed stat
    reuses the same single-pass aggregate under the real assignment."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("converted")
    )
    # nullif on BOTH obs-side denominators, matching the perms CTE (ADVICE r8
    # item 4): a degenerate fixture with one empty md5-nibble arm must yield
    # NULL on both engines, not a DuckDB division-by-zero error.
    obs = per_user.agg(
        F.abs(
            F.expr(
                "sum(CASE WHEN substr(md5(cast(user_id as string)), 1, 1) >= '8'"
                " THEN converted ELSE 0 END) * 1000000"
                " div nullif(sum(CASE WHEN substr(md5(cast(user_id as string)), 1, 1) >= '8'"
                " THEN 1 ELSE 0 END), 0)"
                " - sum(CASE WHEN substr(md5(cast(user_id as string)), 1, 1) < '8'"
                " THEN converted ELSE 0 END) * 1000000"
                " div nullif(sum(CASE WHEN substr(md5(cast(user_id as string)), 1, 1) < '8'"
                " THEN 1 ELSE 0 END), 0)"
            )
        ).alias("obs_diff_ppm")
    )
    perms = (
        per_user.select(
            "user_id",
            "converted",
            F.explode(F.sequence(F.lit(1), F.lit(PERM_K))).alias("k"),
        )
        .withColumn(
            "treat",
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":"), F.col("k").cast("string"))),
                1,
                1,
            )
            >= "8",
        )
        .groupBy("k")
        .agg(
            F.abs(
                F.expr(
                    "sum(CASE WHEN treat THEN converted ELSE 0 END) * 1000000"
                    " div nullif(sum(CASE WHEN treat THEN 1 ELSE 0 END), 0)"
                    " - sum(CASE WHEN NOT treat THEN converted ELSE 0 END) * 1000000"
                    " div nullif(sum(CASE WHEN NOT treat THEN 1 ELSE 0 END), 0)"
                )
            ).alias("diff_ppm")
        )
    )
    return (
        perms.crossJoin(F.broadcast(obs))
        .groupBy("obs_diff_ppm")
        .agg(
            F.lit(PERM_K).cast("long").alias("n_perms"),
            F.sum(F.when(F.col("diff_ppm") >= F.col("obs_diff_ppm"), 1).otherwise(0)).alias(
                "n_ge"
            ),
            F.expr(
                f"(1 + sum(CASE WHEN diff_ppm >= obs_diff_ppm THEN 1 ELSE 0 END))"
                f" * 1000000 div ({PERM_K} + 1)"
            ).alias("p_value_ppm"),
        )
        .select("obs_diff_ppm", "n_perms", "n_ge", "p_value_ppm")
    )


# --- round 8: unbiased pass@k ------------------------------------------------

PASS_AT_KS = (1, 5)        # report pass@1 and pass@5
PASS_CENTS = 12_000        # a "sample passes" iff its value exceeds $120
PASS_MIN_N = 5             # estimator needs n >= max(k)


def _pass_at_k_ppm(k: int):
    """1e6 * (1 - C(n-c, k)/C(n, k)) as EXACT integer ppm: the ratio is
    prod_{i<k}(n-c-i) / prod_{i<k}(n-i); factors are small ints (n is a
    per-task sample count), so the products are exact in BIGINT and the
    division is one integer floor-div (rule 25). c > n-k forces the
    numerator's zero factor -> pass@k = 1e6 exactly."""
    num = f"aggregate(sequence(0, {k} - 1), cast(1 as bigint), (acc, i) -> acc * (n - c - i))"
    den = f"aggregate(sequence(0, {k} - 1), cast(1 as bigint), (acc, i) -> acc * (n - i))"
    return (
        f"CASE WHEN c >= n THEN cast(1000000 as bigint)"
        f" WHEN n - c < {k} THEN cast(1000000 as bigint)"
        f" ELSE cast(1000000 - ({num}) * 1000000 div ({den}) as bigint) END"
    )


@query(
    "eval_pass_at_k",
    oracle=f"""
    WITH per_task AS (
        SELECT user_id AS task_id,
               count(*)::BIGINT AS n,
               sum(CASE WHEN floor(value * 100 + 0.5)::BIGINT > {PASS_CENTS}
                        THEN 1 ELSE 0 END)::BIGINT AS c
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id HAVING count(*) >= {PASS_MIN_N}
    )
    SELECT task_id, n, c,
           (CASE WHEN c >= n OR n - c < 1 THEN 1000000
                 ELSE 1000000 - (n - c) * 1000000 // n
            END)::BIGINT AS pass1_ppm,
           (CASE WHEN c >= n OR n - c < 5 THEN 1000000
                 ELSE 1000000
                      - ((n-c) * (n-c-1) * (n-c-2) * (n-c-3) * (n-c-4)) * 1000000
                        // (n * (n-1) * (n-2) * (n-3) * (n-4))
            END)::BIGINT AS pass5_ppm
    FROM per_task
    """,
    tags=("analytics", "eval"),
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (the Codex/HumanEval estimator): per task with n
    samples of which c pass, pass@k = 1 − C(n−c, k)/C(n, k) — the
    probability that a random size-k draw contains at least one pass,
    which the naive (c/n)^k-style plug-ins get wrong at small n (the
    reason the unbiased form is the reporting standard for code-model
    evals). Tasks here are users, samples their purchase events, a pass
    a big-ticket purchase — the fixture stand-in for (problem,
    completion, unit-test) triples.

    Exactness: the binomial ratio telescopes to prod(n−c−i)/prod(n−i)
    over i < k — k≤5 small-integer factors, computed as exact BIGINT
    products on both engines (Spark `aggregate` fold ≡ DuckDB explicit
    integer products — never list_product, whose DOUBLE return loses
    exactness past 2^53, ADVICE r8 item 1) and divided ONCE as an
    integer ppm (rule 25). Stated bound: the ppm numerator is
    prod(n−c−i) · 1e6 ≤ n^k · 1e6, which must stay under 2^63 — exact
    for n ≤ ~389 at k=5 (far above PASS_MIN_N-filtered fixture task
    sizes); beyond it Spark (ANSI off) would wrap silently while DuckDB
    errors loudly, so the twin can never silently diverge. Degenerate
    tails (c ≥ n, or fewer than k failures) short-circuit to exactly
    1e6 before any arithmetic.

    Scale: one partial-agg groupBy(task) over the corpus; the estimator
    is a scalar expression per task row. The aggregate-of-tasks mean is
    one more tiny agg a dashboard adds on top."""
    ev = load(spark, sf_dir, "events")
    per_task = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("task_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.floor(F.col("value") * 100 + 0.5) > PASS_CENTS, 1).otherwise(0)
            ).alias("c"),
        )
        .filter(F.col("n") >= PASS_MIN_N)
    )
    return per_task.select(
        "task_id",
        "n",
        "c",
        F.expr(_pass_at_k_ppm(1)).alias("pass1_ppm"),
        F.expr(_pass_at_k_ppm(5)).alias("pass5_ppm"),
    )


# --- round 9: pinball-loss quantile-forecast bake-off -------------------------


@query(
    "eval_pinball_loss",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
        FROM events GROUP BY 1, 2
    ),
    preds AS (
        SELECT user_id, day, cents AS y,
               lag(cents) OVER w AS naive,
               (lag(cents, 1) OVER w + lag(cents, 2) OVER w
                + lag(cents, 3) OVER w) // 3 AS trail3
        FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ),
    scored AS (
        SELECT m.model, q.q10, p.y,
               CASE m.model WHEN 'naive_lag1' THEN p.naive ELSE p.trail3 END
                   AS yhat
        FROM preds p,
             (VALUES ('naive_lag1'), ('trailing3_mean')) m(model),
             (VALUES (5), (9)) q(q10)
        WHERE p.naive IS NOT NULL AND p.trail3 IS NOT NULL
    )
    SELECT model, q10::BIGINT AS q10,
           count(*)::BIGINT AS n,
           sum(CASE WHEN y >= yhat THEN q10 * (y - yhat)
                    ELSE (10 - q10) * (yhat - y) END)::BIGINT AS loss_x10,
           (sum(CASE WHEN y >= yhat THEN q10 * (y - yhat)
                     ELSE (10 - q10) * (yhat - y) END) * 100
               // count(*))::BIGINT AS mean_loss_centi
    FROM scored GROUP BY model, q10
    """,
    tags=("analytics", "eval", "timeseries"),
)
def eval_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PINBALL (quantile) LOSS bake-off — the proper scoring rule for
    quantile forecasts (the metric quantile-regression and probabilistic
    demand forecasting are judged by; M5-Uncertainty's metric): for
    target quantile q, loss = q·(y−ŷ) when the outcome overshoots the
    forecast, (1−q)·(ŷ−y) when it undershoots — asymmetric exactly so
    that the loss-minimizing constant IS the q-quantile. Two
    deterministic baseline forecasters of next-day user spend (naive
    lag-1; trailing-3 floor-mean) are scored at q=0.5 and q=0.9; the
    output is the model × quantile league table a forecast bake-off
    publishes. Integer discipline: q·loss is scaled ×10 so both branches
    stay exact BIGINT (q10 ∈ {5, 9}), summed exactly, and the per-row
    mean ships once as integer centi-units (rule 25) — no float touches
    the metric.

    Scale: one day rollup, one lag window, then a 4-way constant
    cross-join (2 models × 2 quantiles — literal VALUES, broadcast) and
    one partial agg whose state is 4 rows. The eval costs one corpus
    pass at any scale."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    preds = daily.select(
        F.col("cents").alias("y"),
        F.lag("cents", 1).over(w).alias("naive"),
        F.expr(
            "(lag(cents, 1) OVER (PARTITION BY user_id ORDER BY day)"
            " + lag(cents, 2) OVER (PARTITION BY user_id ORDER BY day)"
            " + lag(cents, 3) OVER (PARTITION BY user_id ORDER BY day)) div 3"
        ).alias("trail3"),
    ).filter(F.col("naive").isNotNull() & F.col("trail3").isNotNull())
    grid = spark.createDataFrame(
        [("naive_lag1", 5), ("naive_lag1", 9), ("trailing3_mean", 5), ("trailing3_mean", 9)],
        "model string, q10 int",
    )
    scored = preds.crossJoin(F.broadcast(grid)).select(
        "model",
        F.col("q10").cast("long").alias("q10"),
        "y",
        F.when(F.col("model") == "naive_lag1", F.col("naive"))
        .otherwise(F.col("trail3"))
        .alias("yhat"),
    )
    loss = F.when(
        F.col("y") >= F.col("yhat"), F.col("q10") * (F.col("y") - F.col("yhat"))
    ).otherwise((10 - F.col("q10")) * (F.col("yhat") - F.col("y")))
    return scored.groupBy("model", "q10").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(loss).alias("loss_x10"),
        F.expr(
            "sum(CASE WHEN y >= yhat THEN q10 * (y - yhat)"
            " ELSE (10 - q10) * (yhat - y) END) * 100 div count(*)"
        ).alias("mean_loss_centi"),
    )


# --- round 10: paired Wilcoxon signed-rank -----------------------------------


@query(
    "stats_wilcoxon_signrank",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               sum(CASE WHEN epoch(date_trunc('day', ts))::BIGINT // 86400 % 2 = 0
                        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT
                   AS x,
               sum(CASE WHEN epoch(date_trunc('day', ts))::BIGINT // 86400 % 2 = 1
                        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT
                   AS y
        FROM events GROUP BY user_id
    ),
    d AS (SELECT y - x AS d FROM per_user),
    nz AS (SELECT count(*)::BIGINT AS n_zero FROM d WHERE d = 0),
    cnt AS (
        SELECT abs(d) AS v,
               sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
               sum(CASE WHEN d < 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg,
               count(*)::BIGINT AS t
        FROM d WHERE d <> 0 GROUP BY abs(d)
    ),
    vrank AS (
        SELECT n_pos, n_neg, t, (2 * (cum - t) + t + 1)::BIGINT AS r2
        FROM (
            SELECT n_pos, n_neg, t,
                   sum(t) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS cum
            FROM cnt
        ) z
    ),
    agg AS (
        SELECT sum(n_pos * r2)::BIGINT AS w2_plus,
               sum(n_neg * r2)::BIGINT AS w2_minus,
               sum(t)::BIGINT AS n,
               sum(t * t * t - t)::BIGINT AS tie_sum
        FROM vrank
    )
    SELECT a.n AS n_pairs, z.n_zero,
           round(a.w2_plus / 2.0, 1) AS w_plus,
           round(a.w2_minus / 2.0, 1) AS w_minus,
           round((a.w2_plus / 2.0 - a.n * (a.n + 1) / 4.0)
                 / nullif(sqrt((a.n * 1.0) * (a.n + 1) * (2 * a.n + 1) / 24.0
                               - a.tie_sum / 48.0), 0), 4) + 0.0 AS z_score
    FROM agg a CROSS JOIN nz z
    """,
    tags=("analytics", "experiment"),
)
def stats_wilcoxon_signrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired Wilcoxon signed-rank test — the nonparametric PAIRED
    location test the suite lacked (agg_mannwhitney_u is the independent
    two-sample rank test; eval_mcnemar_paired covers paired BINARY
    outcomes): does each user's odd-day spend differ from their even-day
    spend (the eval_ab_cuped x/y pairing), robust to the heavy-tailed
    spend distribution a paired t-test would choke on? Zero differences
    drop (the standard Wilcoxon convention, reported as n_zero); |diff|
    gets MIDRANKS from the support-histogram algebra this round ported
    everywhere (2·midrank = 2·(cum−t)+t+1 over the |diff| SUPPORT — exact
    BIGINT, no corpus-sized rank window); W+ = Σ n_pos·r2/2 is a halved
    integer; the normal approximation uses the tie-corrected variance
    n(n+1)(2n+1)/24 − Σ(t³−t)/48.

    Exactness bounds (the eval_ab_cuped discipline): rank sums are exact
    BIGINTs for n ≲ 10⁹ pairs (w2 ≤ n·2N ≈ 2n²); the tie term t³
    overflows 2^63 only past t ≈ 2·10⁶ identical nonzero diffs; the
    variance product is computed in DOUBLE (first factor promoted) so it
    never wraps. The only window is the prefix sum over DISTINCT |diff|
    cents values — support-sized, never user-sized (the VERDICT r9
    item 2 plan shape, pinned in tests/test_plans.py). z rounded 4dp
    with the −0.0 guard (rule 17); W halves rounded 1dp are exact."""
    ev = load(spark, sf_dir, "events")
    day_parity = F.expr("unix_timestamp(date_trunc('day', ts)) div 86400 % 2")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(day_parity == 0, cents).otherwise(0)).alias("x"),
        F.sum(F.when(day_parity == 1, cents).otherwise(0)).alias("y"),
    )
    d = per_user.select((F.col("y") - F.col("x")).alias("d"))
    nz = d.filter(F.col("d") == 0).agg(F.count(F.lit(1)).alias("n_zero"))
    cnt = (
        d.filter(F.col("d") != 0)
        .groupBy(F.abs(F.col("d")).alias("v"))
        .agg(
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("n_pos"),
            F.sum(F.when(F.col("d") < 0, 1).otherwise(0)).alias("n_neg"),
            F.count(F.lit(1)).alias("t"),
        )
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    vrank = cnt.select(
        "n_pos",
        "n_neg",
        "t",
        (2 * (F.sum("t").over(wcum) - F.col("t")) + F.col("t") + 1).alias("r2"),
    )
    agg = vrank.agg(
        F.sum(F.col("n_pos") * F.col("r2")).alias("w2_plus"),
        F.sum(F.col("n_neg") * F.col("r2")).alias("w2_minus"),
        F.sum("t").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_sum"),
    )
    w_plus = F.col("w2_plus") / 2.0
    var = (F.col("n") * F.lit(1.0)) * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24.0 - F.col(
        "tie_sum"
    ) / 48.0
    return agg.crossJoin(F.broadcast(nz)).select(
        F.col("n").alias("n_pairs"),
        "n_zero",
        F.round(w_plus, 1).alias("w_plus"),
        F.round(F.col("w2_minus") / 2.0, 1).alias("w_minus"),
        (
            F.round(
                (w_plus - F.col("n") * (F.col("n") + 1) / 4.0)
                / F.nullif(F.sqrt(var), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("z_score"),
    )


# --- round 10: always-valid sequential A/B monitoring (mSPRT) -----------------

MSPRT_TAU2 = 10000.0  # mixture variance tau^2 in cents^2 (tau = 1.00 dollar)


@query(
    "eval_sequential_msprt",
    oracle=f"""
    WITH obs AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               floor(value * 100 + 0.5)::BIGINT AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    daily AS (
        SELECT day, arm, count(*)::BIGINT AS n,
               sum(cents)::BIGINT AS s, sum(cents * cents)::BIGINT AS ss
        FROM obs GROUP BY day, arm
    ),
    cum AS (
        SELECT day, arm,
               sum(n) OVER w::BIGINT AS cn,
               sum(s) OVER w::BIGINT AS cs,
               sum(ss) OVER w::BIGINT AS css
        FROM daily
        WINDOW w AS (PARTITION BY arm ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    wide AS (
        SELECT day,
               max(CASE WHEN arm = 'control' THEN cn END)::BIGINT AS n_c,
               max(CASE WHEN arm = 'control' THEN cs END)::BIGINT AS s_c,
               max(CASE WHEN arm = 'control' THEN css END)::BIGINT AS ss_c,
               max(CASE WHEN arm = 'treatment' THEN cn END)::BIGINT AS n_t,
               max(CASE WHEN arm = 'treatment' THEN cs END)::BIGINT AS s_t,
               max(CASE WHEN arm = 'treatment' THEN css END)::BIGINT AS ss_t
        FROM cum GROUP BY day
    ),
    stat AS (
        SELECT day, n_c, n_t, s_c, s_t,
               (s_t::DOUBLE / n_t - s_c::DOUBLE / n_c) AS theta,
               ((ss_c - s_c::DOUBLE * s_c / n_c) / nullif(n_c - 1, 0)) / n_c
               + ((ss_t - s_t::DOUBLE * s_t / n_t) / nullif(n_t - 1, 0)) / n_t
                   AS v
        FROM wide
        WHERE n_c >= 2 AND n_t >= 2
    ),
    lam AS (
        SELECT day, n_c, n_t,
               (s_t * 1000 // n_t - s_c * 1000 // n_c)::BIGINT AS theta_milli,
               least(1.0, round(
                   1.0 / (sqrt(v / (v + {MSPRT_TAU2}))
                          * exp(theta * theta * {MSPRT_TAU2}
                                / (2.0 * v * (v + {MSPRT_TAU2})))), 6)) + 0.0
                   AS p_day
        FROM stat WHERE v > 0
    )
    SELECT day, n_c, n_t, theta_milli, p_day,
           min(p_day) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 0.0
               AS p_always_valid
    FROM lam
    """,
    tags=("analytics", "experiment", "eval"),
)
def eval_sequential_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B monitoring — the mixture sequential
    probability ratio test (mSPRT, Johari et al.'s 'peeking' fix) every
    experimentation platform ships so analysts can look at a running test
    daily without inflating false positives: at each day t the mixture
    likelihood ratio Λ_t = sqrt(V/(V+τ²))·exp(θ̂²τ²/(2V(V+τ²))) converts
    the CUMULATIVE treatment/control mean difference θ̂ (purchase cents;
    per-event unit) and its variance V into an always-valid p-value
    p_t = min_{{s<=t}} min(1, 1/Λ_s) — a supermartingale bound, so the
    running-min sequence is itself the decision boundary (stop when it
    crosses alpha). The reported effect ships as theta_milli — the
    per-arm integer-div milli-cent means differenced — because the raw
    θ̂ is a PURE RATIONAL of integer sums and a 4-dp round can tie
    (rule 28); the float θ̂ feeds only the Λ expression, whose exp/sqrt
    make its 6-dp tie set measure-zero (rule 8).

    Exactness discipline: cumulative first/second moments are exact
    BIGINT cents sums per (arm, day) — the cumulative windows are
    PARTITIONED by arm and ordered over the DAY support (never a
    user- or event-sized window); Σcents² stays under 2^63 for ~2·10⁹
    purchase events at <= 200.00 (the eval_ab_cuped bound class). All
    float work (θ̂, V, Λ) is identical expression trees over those exact
    integers (rule 9); the per-day p is rounded 6dp BEFORE the running
    min so the min compares identical rounded values on both engines
    (libm exp/sqrt at 6dp, rule 8); −0.0 guards on every float output
    (rule 17). Same md5 arm split as the rest of the experiment suite —
    the homogeneous fixture should never cross a 0.05 boundary, which
    the property test pins.

    100 TB shape: one partial agg over events to (day, arm) cells, two
    day-support windows, a 2-way pivot — nothing scales with users."""
    ev = load(spark, sf_dir, "events")
    obs = ev.filter(F.col("event_type") == "purchase").select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1)
            >= "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    daily = obs.groupBy("day", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    warm = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "day",
        "arm",
        F.sum("n").over(warm).alias("cn"),
        F.sum("s").over(warm).alias("cs"),
        F.sum("ss").over(warm).alias("css"),
    )
    wide = cum.groupBy("day").agg(
        F.max(F.when(F.col("arm") == "control", F.col("cn"))).alias("n_c"),
        F.max(F.when(F.col("arm") == "control", F.col("cs"))).alias("s_c"),
        F.max(F.when(F.col("arm") == "control", F.col("css"))).alias("ss_c"),
        F.max(F.when(F.col("arm") == "treatment", F.col("cn"))).alias("n_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("cs"))).alias("s_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("css"))).alias("ss_t"),
    )
    theta = F.col("s_t").cast("double") / F.col("n_t") - F.col("s_c").cast(
        "double"
    ) / F.col("n_c")
    v = (
        (F.col("ss_c") - F.col("s_c").cast("double") * F.col("s_c") / F.col("n_c"))
        / F.nullif(F.col("n_c") - 1, F.lit(0))
    ) / F.col("n_c") + (
        (F.col("ss_t") - F.col("s_t").cast("double") * F.col("s_t") / F.col("n_t"))
        / F.nullif(F.col("n_t") - 1, F.lit(0))
    ) / F.col("n_t")
    stat = wide.filter((F.col("n_c") >= 2) & (F.col("n_t") >= 2)).select(
        "day", "n_c", "n_t", "s_c", "s_t", theta.alias("theta"), v.alias("v")
    )
    tau2 = F.lit(MSPRT_TAU2)
    lam_inv = 1.0 / (
        F.sqrt(F.col("v") / (F.col("v") + tau2))
        * F.exp(
            F.col("theta")
            * F.col("theta")
            * tau2
            / (2.0 * F.col("v") * (F.col("v") + tau2))
        )
    )
    lam = stat.filter(F.col("v") > 0).select(
        "day",
        "n_c",
        "n_t",
        F.expr("s_t * 1000 div n_t - s_c * 1000 div n_c").alias("theta_milli"),
        (F.least(F.lit(1.0), F.round(lam_inv, 6)) + F.lit(0.0)).alias("p_day"),
    )
    wmin = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return lam.select(
        "day",
        "n_c",
        "n_t",
        "theta_milli",
        "p_day",
        (F.min("p_day").over(wmin) + F.lit(0.0)).alias("p_always_valid"),
    )


# --- round 10: delta-method inference for ratio metrics -----------------------


@query(
    "eval_ratio_delta_ci",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS x,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS y
        FROM events GROUP BY 1, 2
    ),
    arms AS (
        SELECT arm, count(*)::BIGINT AS n,
               sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
               sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
               sum(x * y)::BIGINT AS sxy
        FROM per_user GROUP BY arm
    ),
    var_arm AS (
        SELECT arm, n, sx, sy,
               (sx * 1000000 // nullif(sy, 0))::BIGINT AS ratio_ppm,
               -- delta-method variance of R = sum(x)/sum(y) under user
               -- clustering: (s_xx - 2R s_xy + R^2 s_yy) / (n ybar^2) / n
               -- with s_** the sample (co)variances — all from exact sums
               ((sxx - sx::DOUBLE * sx / n)
                - 2.0 * (sx::DOUBLE / sy)
                      * (sxy - sx::DOUBLE * sy / n)
                + (sx::DOUBLE / sy) * (sx::DOUBLE / sy)
                      * (syy - sy::DOUBLE * sy / n))
               / nullif(n - 1, 0) / n
               / nullif((sy::DOUBLE / n) * (sy::DOUBLE / n), 0) AS var_r
        FROM arms
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 'control' THEN n END)::BIGINT AS n_c,
               max(CASE WHEN arm = 'treatment' THEN n END)::BIGINT AS n_t,
               max(CASE WHEN arm = 'control' THEN ratio_ppm END)::BIGINT
                   AS ratio_c_ppm,
               max(CASE WHEN arm = 'treatment' THEN ratio_ppm END)::BIGINT
                   AS ratio_t_ppm,
               max(CASE WHEN arm = 'control' THEN sx::DOUBLE / sy END) AS r_c,
               max(CASE WHEN arm = 'treatment' THEN sx::DOUBLE / sy END) AS r_t,
               max(CASE WHEN arm = 'control' THEN var_r END) AS v_c,
               max(CASE WHEN arm = 'treatment' THEN var_r END) AS v_t
        FROM var_arm
    )
    SELECT n_c, n_t, ratio_c_ppm, ratio_t_ppm,
           round(sqrt(v_c), 6) + 0.0 AS se_c,
           round(sqrt(v_t), 6) + 0.0 AS se_t,
           round((r_t - r_c) / nullif(sqrt(v_c + v_t), 0), 4) + 0.0 AS z_score,
           round((r_t - r_c) - 1.959964 * sqrt(v_c + v_t), 6) + 0.0 AS ci_lo,
           round((r_t - r_c) + 1.959964 * sqrt(v_c + v_t), 6) + 0.0 AS ci_hi
    FROM wide
    """,
    tags=("analytics", "experiment", "eval"),
)
def eval_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method inference for a RATIO metric (clicks per view) — the
    estimator experimentation platforms need for any metric whose unit of
    analysis differs from the randomization unit: R = Σx/Σy is a ratio of
    user-level sums, so the naive per-event binomial variance is wrong
    (events within a user are correlated); the delta method gives
    var(R) ≈ (s_xx − 2R·s_xy + R²·s_yy) / (n·ȳ²·(n−1)) from user-level
    (co)moments. Output: per-arm click-through as EXACT integer ppm, the
    delta-method standard errors, and the z / 95% CI of the treatment
    difference (z-pin at POWER_Z_ALPHA's constant).

    Exactness: the five moments per arm are exact BIGINT sums of event
    COUNTS (bounded by events-per-user ≈ 10³, so Σx² stays under 2^63 to
    ~10¹² users); ratios ship as integer ppm (rule 25); the float algebra
    runs on a 2-row frame with identical expression trees (rule 9),
    rounded 4/6dp with −0.0 guards (rule 17). Same md5 arm split as the
    suite.

    100 TB shape: one partial agg to users, one 5-counter arm rollup,
    all inference on 2 rows — the same free-at-scale class as
    stats_ttest_welch."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy(
        "user_id",
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1)
            >= "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("y"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r = F.col("sx").cast("double") / F.col("sy")
    var_r = (
        (
            (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
            - 2.0 * r * (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
            + r * r * (F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col("n"))
        )
        / F.nullif(F.col("n") - 1, F.lit(0))
        / F.col("n")
        / F.nullif(
            (F.col("sy").cast("double") / F.col("n"))
            * (F.col("sy").cast("double") / F.col("n")),
            F.lit(0.0),
        )
    )
    var_arm = arms.select(
        "arm",
        "n",
        F.expr("sx * 1000000 div nullif(sy, 0)").alias("ratio_ppm"),
        r.alias("r"),
        var_r.alias("var_r"),
    )
    wide = var_arm.agg(
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("arm") == "control", F.col("ratio_ppm"))).alias(
            "ratio_c_ppm"
        ),
        F.max(F.when(F.col("arm") == "treatment", F.col("ratio_ppm"))).alias(
            "ratio_t_ppm"
        ),
        F.max(F.when(F.col("arm") == "control", F.col("r"))).alias("r_c"),
        F.max(F.when(F.col("arm") == "treatment", F.col("r"))).alias("r_t"),
        F.max(F.when(F.col("arm") == "control", F.col("var_r"))).alias("v_c"),
        F.max(F.when(F.col("arm") == "treatment", F.col("var_r"))).alias("v_t"),
    )
    dse = F.sqrt(F.col("v_c") + F.col("v_t"))
    diff = F.col("r_t") - F.col("r_c")
    return wide.select(
        "n_c",
        "n_t",
        "ratio_c_ppm",
        "ratio_t_ppm",
        (F.round(F.sqrt("v_c"), 6) + F.lit(0.0)).alias("se_c"),
        (F.round(F.sqrt("v_t"), 6) + F.lit(0.0)).alias("se_t"),
        (F.round(diff / F.nullif(dse, F.lit(0.0)), 4) + F.lit(0.0)).alias("z_score"),
        (F.round(diff - 1.959964 * dse, 6) + F.lit(0.0)).alias("ci_lo"),
        (F.round(diff + 1.959964 * dse, 6) + F.lit(0.0)).alias("ci_hi"),
    )


# --- round 10: Kaplan-Meier survival estimator ---------------------------------

KM_CENSOR_GAP_DAYS = 7  # users last seen within this gap of corpus end are
                        # censored (still alive), not churned


@query(
    "stats_kaplan_meier",
    oracle=f"""
    WITH spans AS (
        SELECT user_id,
               date_diff('day', min(date_trunc('day', ts)),
                         max(date_trunc('day', ts)))::BIGINT AS dur,
               max(date_trunc('day', ts)) AS last_day
        FROM events GROUP BY user_id
    ),
    horizon AS (SELECT max(last_day) AS h FROM spans),
    labeled AS (
        SELECT dur,
               CASE WHEN date_diff('day', last_day, h.h) > {KM_CENSOR_GAP_DAYS}
                    THEN 1 ELSE 0 END AS churned
        FROM spans CROSS JOIN horizon h
    ),
    cells AS (
        SELECT dur, sum(churned)::BIGINT AS d,
               sum(1 - churned)::BIGINT AS c
        FROM labeled GROUP BY dur
    ),
    risk AS (
        SELECT dur, d, c,
               (sum(d + c) OVER (ORDER BY dur
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - d - c
                )::BIGINT AS before_t,
               sum(d + c) OVER ()::BIGINT AS n_total
        FROM cells
    ),
    curve AS (
        SELECT dur, d, c, (n_total - before_t)::BIGINT AS n_risk,
               sum(CASE WHEN d = n_total - before_t THEN 1 ELSE 0 END)
                   OVER (ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS dead_end,
               sum(CASE WHEN d < n_total - before_t
                        THEN ln((n_total - before_t - d)::DOUBLE
                                / (n_total - before_t)) ELSE 0 END)
                   OVER (ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ln_surv
        FROM risk
    )
    SELECT dur AS duration_days, n_risk, d AS n_churned, c AS n_censored,
           CASE WHEN dead_end > 0 THEN 0.0
                ELSE round(exp(ln_surv), 6) + 0.0 END AS survival
    FROM curve
    """,
    tags=("analytics", "stats"),
)
def stats_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator — the right-censoring-aware
    retention curve retention_cohort cannot give: each user's lifetime is
    the span from first to last event; users still active near the
    corpus horizon (within KM_CENSOR_GAP_DAYS) are CENSORED, not
    churned — dropping them (or calling them churned) biases every naive
    retention number, which is the whole reason KM exists. S(t) =
    Π_{{s<=t}} (1 − d_s/n_s) over the observed-duration support, with
    n_s the at-risk count (users whose span reaches s).

    Exactness: death/censor counts and at-risk counts are exact BIGINTs
    from two support-sized cumulative windows (n_risk = total − all
    spans ENDING before t); the product telescopes as exp(Σ ln((n−d)/n))
    where each ln term is an identical expression tree over exact
    integers and the cumulative float sum accumulates in the SAME
    support order on both engines (rule 9's running-window corollary);
    the d = n_risk terminal case (survival exactly 0, where ln is
    undefined) is handled by an integer dead-end flag, never a NaN.
    Output rounded 6dp with −0.0 guards (rule 17).

    100 TB shape: one partial agg to user spans, one tiny duration-
    support frame (bounded by the calendar) for everything else — the
    same free-at-scale class as the experiment suite."""
    ev = load(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.date_trunc("day", F.col("ts"))),
            F.min(F.date_trunc("day", F.col("ts"))),
        )
        .cast("long")
        .alias("dur"),
        F.max(F.date_trunc("day", F.col("ts"))).alias("last_day"),
    )
    horizon = spans.agg(F.max("last_day").alias("h"))
    labeled = spans.crossJoin(F.broadcast(horizon)).select(
        "dur",
        F.when(
            F.datediff(F.col("h"), F.col("last_day")) > KM_CENSOR_GAP_DAYS, 1
        )
        .otherwise(0)
        .alias("churned"),
    )
    cells = labeled.groupBy("dur").agg(
        F.sum("churned").alias("d"),
        F.sum(1 - F.col("churned")).alias("c"),
    )
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    risk = cells.select(
        "dur",
        "d",
        "c",
        (F.sum(F.col("d") + F.col("c")).over(wcum) - F.col("d") - F.col("c")).alias(
            "before_t"
        ),
        F.sum(F.col("d") + F.col("c")).over(wall).alias("n_total"),
    )
    n_risk = F.col("n_total") - F.col("before_t")
    curve = risk.select(
        "dur",
        "d",
        "c",
        n_risk.alias("n_risk"),
        F.sum(F.when(F.col("d") == n_risk, 1).otherwise(0)).over(wcum).alias(
            "dead_end"
        ),
        F.sum(
            F.when(
                F.col("d") < n_risk,
                F.log((n_risk - F.col("d")).cast("double") / n_risk),
            ).otherwise(0.0)
        )
        .over(wcum)
        .alias("ln_surv"),
    )
    return curve.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        F.when(F.col("dead_end") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("ln_surv")), 6) + F.lit(0.0))
        .alias("survival"),
    )


# --- round 10: in-plan logistic-regression training ----------------------------

LR_ITERS = 5          # full-batch gradient steps
LR_STEP_X1M = 10000   # lr * 1e6: micro-unit step quantizer => lr = 0.01
# Fixed, data-independent feature centering (stated constants, not fitted):
# x1 = views - 13, x2 = clicks - 13, x3 = spend_cents div 10000 - 6.
LR_FEATURES_SQL = (
    "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) - 13",
    "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) - 13",
    "floor(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)"
    " * 100 + 0.5)::BIGINT // 10000 - 6",
)


def _logreg_oracle_sql() -> str:
    """Generated chained-CTE twin of ml_logreg_train: one (grad, weight)
    CTE pair per unrolled gradient step, weights as exact micro-unit
    BIGINTs, gradient deltas quantized floor(g*lr*1e6 + 0.5)."""
    f1, f2, f3 = LR_FEATURES_SQL
    parts = [
        f"""WITH pu AS MATERIALIZED (
        SELECT user_id,
               ({f1})::BIGINT AS x1,
               ({f2})::BIGINT AS x2,
               ({f3})::BIGINT AS x3,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END)::BIGINT AS y
        FROM events GROUP BY user_id
    ),
    n AS (SELECT count(*)::BIGINT AS n FROM pu),
    w_0 AS (SELECT 0::BIGINT AS w0m, 0::BIGINT AS w1m,
                   0::BIGINT AS w2m, 0::BIGINT AS w3m)"""
    ]
    for t in range(1, LR_ITERS + 1):
        parts.append(
            f""",
    z_{t} AS (
        SELECT p.user_id, p.x1, p.x2, p.x3, p.y,
               (w.w0m + w.w1m * p.x1 + w.w2m * p.x2 + w.w3m * p.x3)::BIGINT
                   AS zm
        FROM pu p CROSS JOIN w_{t - 1} w
    ),
    g_{t} AS (
        SELECT
            floor(sum(1.0 / (1.0 + exp(-(zm / 1000000.0))) - y) / n.n
                  * {LR_STEP_X1M} + 0.5)::BIGINT AS d0,
            floor(sum((1.0 / (1.0 + exp(-(zm / 1000000.0))) - y) * x1) / n.n
                  * {LR_STEP_X1M} + 0.5)::BIGINT AS d1,
            floor(sum((1.0 / (1.0 + exp(-(zm / 1000000.0))) - y) * x2) / n.n
                  * {LR_STEP_X1M} + 0.5)::BIGINT AS d2,
            floor(sum((1.0 / (1.0 + exp(-(zm / 1000000.0))) - y) * x3) / n.n
                  * {LR_STEP_X1M} + 0.5)::BIGINT AS d3
        FROM z_{t} CROSS JOIN n GROUP BY n.n
    ),
    w_{t} AS MATERIALIZED (
        SELECT w.w0m - g.d0 AS w0m, w.w1m - g.d1 AS w1m,
               w.w2m - g.d2 AS w2m, w.w3m - g.d3 AS w3m
        FROM w_{t - 1} w CROSS JOIN g_{t} g
    ),
    m_{t} AS (
        SELECT {t}::BIGINT AS iteration, w.w0m, w.w1m, w.w2m, w.w3m,
               (sum(CASE WHEN (zm >= 0) = (y = 1) THEN 1 ELSE 0 END)
                   * 1000000 // count(*))::BIGINT AS accuracy_ppm,
               round(avg(ln(1.0 + exp(-(2 * y - 1) * (zm / 1000000.0)))), 6)
                   + 0.0 AS logloss
        FROM (
            SELECT p.y,
                   (w.w0m + w.w1m * p.x1 + w.w2m * p.x2 + w.w3m * p.x3)::BIGINT
                       AS zm
            FROM pu p CROSS JOIN w_{t} w
        ) q CROSS JOIN w_{t} w
        GROUP BY w.w0m, w.w1m, w.w2m, w.w3m
    )"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM m_{t}" for t in range(1, LR_ITERS + 1))
    parts.append(f"\n    {union}")
    return "".join(parts)


@query(
    "ml_logreg_train",
    oracle=_logreg_oracle_sql(),
    tags=("analytics", "ml", "flagship"),
)
def ml_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression TRAINED IN-ENGINE — full-batch gradient descent
    over the user feature frame, no MLlib: the op that shows the engine
    can fit a simple model, not just evaluate one (eval_* consume scores;
    this PRODUCES them). Features are integer-centered engagement counts
    and spend deciles (fixed, stated constants — never fitted), label is
    the suite's big-purchaser flag. Each of LR_ITERS steps aggregates the
    exact per-user gradient of the log-loss and updates MICRO-QUANTIZED
    integer weights: delta = floor(mean_grad * LR_STEP_X1M + 0.5) with
    LR_STEP_X1M = lr * 1e6 (lr = 0.01), so the
    weight trajectory is a sequence of exact BIGINTs — cross-engine ulp
    noise in the float gradient sum dies at the quantizer instead of
    compounding across iterations (the corpus_perplexity_filter
    convention applied to training state). Per-iteration readout: the
    weight vector, accuracy from the SIGN of the exact integer logit
    (no float threshold), and 6dp-rounded log-loss.

    Execution shape is production SGD-on-a-cluster: executors compute
    the distributed gradient aggregate; the driver folds the ONE 4-value
    row into the next iterate and broadcasts it back as literals —
    exactly MLlib's treeAggregate loop, with the driver touching only
    O(features) state per step (never row data). The per-user frame is
    checkpointed once; each step is one aggregate over it.

    At 100 TB: the feature frame build is the only corpus pass;
    LR_ITERS * 2 aggregates over the user frame (partial aggs carry
    everything); driver state is 4 integers."""
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    ev = load(spark, sf_dir, "events")
    pu = (
        ev.groupBy("user_id")
        .agg(
            (
                F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)) - 13
            ).alias("x1"),
            (
                F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)) - 13
            ).alias("x2"),
            (
                F.expr(
                    "floor(sum(CASE WHEN event_type = 'purchase' THEN value"
                    " ELSE 0 END) * 100 + 0.5) div 10000 - 6"
                )
            ).alias("x3"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
        .checkpoint(eager=True)
    )
    n = pu.count()
    w = [0, 0, 0, 0]  # micro-unit integer weights; driver state = O(features)
    out_rows = []
    import math

    def _zm(wv):
        return (
            F.lit(wv[0])
            + F.lit(wv[1]) * F.col("x1")
            + F.lit(wv[2]) * F.col("x2")
            + F.lit(wv[3]) * F.col("x3")
        )

    def _grad_exprs(zm):
        p = 1.0 / (1.0 + F.exp(-(zm / 1000000.0)))
        return [
            F.sum(p - F.col("y")).alias("g0"),
            F.sum((p - F.col("y")) * F.col("x1")).alias("g1"),
            F.sum((p - F.col("y")) * F.col("x2")).alias("g2"),
            F.sum((p - F.col("y")) * F.col("x3")).alias("g3"),
        ]

    def _metric_exprs(zm):
        return [
            F.sum(
                F.when((zm >= 0) == (F.col("y") == 1), 1).otherwise(0)
            ).alias("n_correct"),
            F.count(F.lit(1)).alias("n"),
            (
                F.round(
                    F.avg(F.log(1.0 + F.exp(-(2 * F.col("y") - 1) * (zm / 1000000.0)))),
                    6,
                )
                + F.lit(0.0)
            ).alias("logloss"),
        ]

    # Step t's post-update metrics and step t+1's gradient are both
    # evaluated at the same weight vector, so one fused aggregate pass
    # serves both (guide §1.2: fewer full passes over the checkpointed
    # frame): LR_ITERS+1 jobs instead of 2*LR_ITERS. Every sum keeps its
    # own expression tree; the micro-unit quantizer absorbs fold-order
    # noise exactly as before (the DuckDB twin sums in its own order).
    g = pu.agg(*_grad_exprs(_zm(w))).collect()[0]
    for t in range(1, LR_ITERS + 1):
        for k in range(4):
            w[k] -= math.floor(g[f"g{k}"] / n * LR_STEP_X1M + 0.5)
        zm2 = _zm(w)
        if t < LR_ITERS:
            m = pu.agg(*_metric_exprs(zm2), *_grad_exprs(zm2)).collect()[0]
            g = m
        else:
            m = pu.agg(*_metric_exprs(zm2)).collect()[0]
        out_rows.append(
            (
                t,
                w[0],
                w[1],
                w[2],
                w[3],
                m["n_correct"] * 1_000_000 // m["n"],
                float(m["logloss"]),
            )
        )
    return spark.createDataFrame(
        out_rows,
        "iteration long, w0m long, w1m long, w2m long, w3m long,"
        " accuracy_ppm long, logloss double",
    )


# --- round 10: counterfactual off-policy evaluation (IPS/SNIPS) ----------------

IPS_N_ACTIONS = 5  # logging policy: uniform over the five event types


@query(
    "eval_counterfactual_ips",
    oracle=f"""
    WITH logged AS (
        SELECT event_type AS action,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                    THEN 'click' ELSE 'view' END AS target_action,
               CASE WHEN event_type = 'purchase'
                    THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END AS r_cents
        FROM events
    ),
    weighted AS (
        SELECT r_cents,
               CASE WHEN action = target_action
                    THEN {IPS_N_ACTIONS} ELSE 0 END::BIGINT AS w
        FROM logged
    ),
    agg AS (
        SELECT count(*)::BIGINT AS n_logged,
               sum(CASE WHEN w > 0 THEN 1 ELSE 0 END)::BIGINT AS n_matched,
               sum(w)::BIGINT AS sw,
               sum(w * w)::BIGINT AS sww,
               sum(r_cents * w)::BIGINT AS srw,
               sum(r_cents)::BIGINT AS sr
        FROM weighted
    )
    SELECT n_logged, n_matched,
           (sr * 1000 // n_logged)::BIGINT AS logged_value_milli,
           (srw * 1000 // n_logged)::BIGINT AS ips_value_milli,
           (srw * 1000 // nullif(sw, 0))::BIGINT AS snips_value_milli,
           (sw * sw * 1000000 // nullif(n_logged * sww, 0))::BIGINT
               AS ess_ppm
    FROM agg
    """,
    tags=("analytics", "eval", "experiment"),
)
def eval_counterfactual_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counterfactual OFF-POLICY evaluation (IPS / SNIPS) — the estimator
    recommender and ads platforms use to score a NEW policy from logs of
    an old one, without an experiment: each logged impression (action =
    its event type) was served by a uniform logging policy (propensity
    1/IPS_N_ACTIONS — stated, exact), the target policy is a
    deterministic md5-keyed rule (recommend 'click' to half the users,
    'view' to the rest), and the inverse-propensity weight is therefore
    the exact INTEGER {{0, IPS_N_ACTIONS}}. Reports the logged policy's
    value, the IPS estimate of the target policy's value, the
    self-normalized SNIPS estimate (lower variance, small bias), and the
    effective sample size ratio (Σw)²/(n·Σw²) — THE diagnostic that says
    whether the overlap between policies supports the estimate at all.

    Everything is exact integer algebra (rule 28 applied from birth):
    cents rewards, integer weights, and the four reported statistics are
    single floor divisions of BIGINT products (milli-cents / ppm) — no
    float exists anywhere in the op, so no rounding can tie. Overflow
    bounds: srw ≤ 5·Σcents ≈ 5·10¹⁴ at 10⁹ purchase events; sw·sw ≤
    (5n)² needs n ≲ 6·10⁸ before the ×1e6 — promote to DECIMAL(38) past
    that (the eval_ab_cuped bound class).

    100 TB shape: one map-side weight projection + one 6-counter global
    aggregate — the cheapest possible estimator class."""
    ev = load(spark, sf_dir, "events")
    logged = ev.select(
        F.col("event_type").alias("action"),
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1)
            < "8",
            "click",
        )
        .otherwise("view")
        .alias("target_action"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100 + 0.5).cast("long"),
        )
        .otherwise(0)
        .alias("r_cents"),
    )
    weighted = logged.select(
        "r_cents",
        F.when(F.col("action") == F.col("target_action"), IPS_N_ACTIONS)
        .otherwise(0)
        .cast("long")
        .alias("w"),
    )
    agg = weighted.agg(
        F.count(F.lit(1)).alias("n_logged"),
        F.sum(F.when(F.col("w") > 0, 1).otherwise(0)).alias("n_matched"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
        F.sum(F.col("r_cents") * F.col("w")).alias("srw"),
        F.sum("r_cents").alias("sr"),
    )
    return agg.select(
        "n_logged",
        "n_matched",
        F.expr("sr * 1000 div n_logged").alias("logged_value_milli"),
        F.expr("srw * 1000 div n_logged").alias("ips_value_milli"),
        F.expr("srw * 1000 div nullif(sw, 0)").alias("snips_value_milli"),
        F.expr("sw * sw * 1000000 div nullif(n_logged * sww, 0)").alias("ess_ppm"),
    )


# --- round 10: difference-in-differences ---------------------------------------

DID_CUTOVER_DAYS = 15  # post period starts this many days after the corpus min


@query(
    "eval_diff_in_differences",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('day', min(ts)) AS d0 FROM events
    ),
    obs AS (
        SELECT CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               CASE WHEN date_trunc('day', ts)
                         >= d0 + INTERVAL {DID_CUTOVER_DAYS} DAY
                    THEN 'post' ELSE 'pre' END AS period,
               floor(value * 100 + 0.5)::BIGINT AS cents
        FROM events CROSS JOIN bounds WHERE event_type = 'purchase'
    ),
    cells AS (
        SELECT arm, period, count(*)::BIGINT AS n,
               sum(cents)::BIGINT AS s, sum(cents * cents)::BIGINT AS ss
        FROM obs GROUP BY arm, period
    ),
    wide AS (
        SELECT
          max(CASE WHEN arm='control' AND period='pre' THEN n END)::BIGINT AS n_cp,
          max(CASE WHEN arm='control' AND period='pre' THEN s END)::BIGINT AS s_cp,
          max(CASE WHEN arm='control' AND period='pre' THEN ss END)::BIGINT AS ss_cp,
          max(CASE WHEN arm='control' AND period='post' THEN n END)::BIGINT AS n_co,
          max(CASE WHEN arm='control' AND period='post' THEN s END)::BIGINT AS s_co,
          max(CASE WHEN arm='control' AND period='post' THEN ss END)::BIGINT AS ss_co,
          max(CASE WHEN arm='treatment' AND period='pre' THEN n END)::BIGINT AS n_tp,
          max(CASE WHEN arm='treatment' AND period='pre' THEN s END)::BIGINT AS s_tp,
          max(CASE WHEN arm='treatment' AND period='pre' THEN ss END)::BIGINT AS ss_tp,
          max(CASE WHEN arm='treatment' AND period='post' THEN n END)::BIGINT AS n_to,
          max(CASE WHEN arm='treatment' AND period='post' THEN s END)::BIGINT AS s_to,
          max(CASE WHEN arm='treatment' AND period='post' THEN ss END)::BIGINT AS ss_to
        FROM cells
    )
    SELECT n_cp, n_co, n_tp, n_to,
           (s_cp * 1000 // n_cp)::BIGINT AS mean_c_pre_milli,
           (s_co * 1000 // n_co)::BIGINT AS mean_c_post_milli,
           (s_tp * 1000 // n_tp)::BIGINT AS mean_t_pre_milli,
           (s_to * 1000 // n_to)::BIGINT AS mean_t_post_milli,
           ((s_to * 1000 // n_to) - (s_tp * 1000 // n_tp)
            - (s_co * 1000 // n_co) + (s_cp * 1000 // n_cp))::BIGINT
               AS did_milli,
           round(((s_to::DOUBLE / n_to - s_tp::DOUBLE / n_tp)
                  - (s_co::DOUBLE / n_co - s_cp::DOUBLE / n_cp))
                 / nullif(sqrt(
                     ((ss_cp - s_cp::DOUBLE*s_cp/n_cp)/nullif(n_cp-1,0))/n_cp
                   + ((ss_co - s_co::DOUBLE*s_co/n_co)/nullif(n_co-1,0))/n_co
                   + ((ss_tp - s_tp::DOUBLE*s_tp/n_tp)/nullif(n_tp-1,0))/n_tp
                   + ((ss_to - s_to::DOUBLE*s_to/n_to)/nullif(n_to-1,0))/n_to
                   ), 0), 4) + 0.0 AS z_score
    FROM wide
    """,
    tags=("analytics", "experiment", "eval"),
)
def eval_diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the quasi-experimental workhorse for
    when randomization is impossible (a rollout hit one group at a known
    time): the effect estimate is (T_post − T_pre) − (C_post − C_pre),
    which cancels both the group-level baseline difference and the
    common time trend, under the parallel-trends assumption the analyst
    must defend. Groups are the suite's md5 arms; the post period opens
    DID_CUTOVER_DAYS after the corpus' first day (derived once from a
    1-row broadcast bound — deterministic for any fixture span). The
    z-score uses the four-cell independent-variance SE (the standard
    2x2 DiD normal approximation).

    Exactness: cell moments are exact BIGINT cents; the four cell means
    and did_milli ship as single floor divisions (rule 28 — pure
    rationals never meet a float round); only the z is float (sqrt-laden,
    4dp + −0.0 guard). On the homogeneous fixture with a time-neutral
    split, DiD should straddle zero — the property test pins |z| < 3.5.

    100 TB shape: one 1-row bound, one partial agg to 4 cells, all
    inference on 1 row."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    obs = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(bounds))
        .select(
            F.when(
                F.substring(
                    F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1
                )
                >= "8",
                "treatment",
            )
            .otherwise("control")
            .alias("arm"),
            F.when(
                F.date_trunc("day", F.col("ts"))
                >= F.col("d0") + F.expr(f"INTERVAL {DID_CUTOVER_DAYS} DAY"),
                "post",
            )
            .otherwise("pre")
            .alias("period"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
    )
    cells = obs.groupBy("arm", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )

    def pick(col, arm, period):
        return F.max(
            F.when((F.col("arm") == arm) & (F.col("period") == period), F.col(col))
        )

    wide = cells.agg(
        *[
            pick(c, a, p).alias(f"{c}_{a[0]}{'o' if p == 'post' else 'p'}")
            for a in ("control", "treatment")
            for p in ("pre", "post")
            for c in ("n", "s", "ss")
        ]
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    var_over_n = lambda ss, s, n: (  # noqa: E731
        (F.col(ss) - F.col(s).cast("double") * F.col(s) / F.col(n))
        / F.nullif(F.col(n) - 1, F.lit(0))
    ) / F.col(n)
    did_f = (mean("s_to", "n_to") - mean("s_tp", "n_tp")) - (
        mean("s_co", "n_co") - mean("s_cp", "n_cp")
    )
    se = F.sqrt(
        var_over_n("ss_cp", "s_cp", "n_cp")
        + var_over_n("ss_co", "s_co", "n_co")
        + var_over_n("ss_tp", "s_tp", "n_tp")
        + var_over_n("ss_to", "s_to", "n_to")
    )
    return wide.select(
        "n_cp",
        "n_co",
        "n_tp",
        "n_to",
        F.expr("s_cp * 1000 div n_cp").alias("mean_c_pre_milli"),
        F.expr("s_co * 1000 div n_co").alias("mean_c_post_milli"),
        F.expr("s_tp * 1000 div n_tp").alias("mean_t_pre_milli"),
        F.expr("s_to * 1000 div n_to").alias("mean_t_post_milli"),
        F.expr(
            "(s_to * 1000 div n_to) - (s_tp * 1000 div n_tp)"
            " - (s_co * 1000 div n_co) + (s_cp * 1000 div n_cp)"
        ).alias("did_milli"),
        (F.round(did_f / F.nullif(se, F.lit(0.0)), 4) + F.lit(0.0)).alias("z_score"),
    )


# --- round 10: DeLong variance for AUC ------------------------------------------


@query(
    "eval_auc_delong",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               floor(sum(CASE WHEN event_type IN ('view', 'click')
                              THEN value ELSE 0 END) * 100 + 0.5)::BIGINT
                   AS score_cents,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    support AS (
        SELECT score_cents AS v,
               sum(label)::BIGINT AS pos_v,
               sum(1 - label)::BIGINT AS neg_v
        FROM per_user GROUP BY score_cents
    ),
    cum AS (
        SELECT v, pos_v, neg_v,
               (sum(pos_v) OVER w - pos_v)::BIGINT AS pos_below,
               (sum(neg_v) OVER w - neg_v)::BIGINT AS neg_below
        FROM support
        WINDOW w AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (
        SELECT sum(pos_v)::BIGINT AS m, sum(neg_v)::BIGINT AS n FROM cum
    ),
    -- doubled placements: u10 = 2*neg_below + neg_eq (positive at v beats
    -- u10/(2n) of negatives); u01 symmetric. Exact BIGINTs everywhere.
    pl AS (
        SELECT c.pos_v, c.neg_v,
               (2 * c.neg_below + c.neg_v)::BIGINT AS u10,
               (2 * (t.m - c.pos_below - c.pos_v) + c.pos_v)::BIGINT AS u01,
               t.m, t.n
        FROM cum c CROSS JOIN tot t
    ),
    sums AS (
        SELECT max(m)::BIGINT AS m, max(n)::BIGINT AS n,
               sum(pos_v * u10)::BIGINT AS s10_1,
               sum(pos_v * u10 * u10)::BIGINT AS s10_2,
               sum(neg_v * u01)::BIGINT AS s01_1,
               sum(neg_v * u01 * u01)::BIGINT AS s01_2
        FROM pl
    )
    SELECT m, n,
           (s10_1 * 1000000 // (2 * m * n))::BIGINT AS auc_ppm,
           round(sqrt(
               ((s10_2 / (2.0 * n) / (2.0 * n) - (s10_1 / (2.0 * n))
                     * (s10_1 / (2.0 * n)) / m) / nullif(m - 1, 0)) / m
             + ((s01_2 / (2.0 * m) / (2.0 * m) - (s01_1 / (2.0 * m))
                     * (s01_1 / (2.0 * m)) / n) / nullif(n - 1, 0)) / n
           ), 6) + 0.0 AS se_delong,
           round((s10_1 / (2.0 * m * n) - 0.5)
                 / nullif(sqrt(
               ((s10_2 / (2.0 * n) / (2.0 * n) - (s10_1 / (2.0 * n))
                     * (s10_1 / (2.0 * n)) / m) / nullif(m - 1, 0)) / m
             + ((s01_2 / (2.0 * m) / (2.0 * m) - (s01_1 / (2.0 * m))
                     * (s01_1 / (2.0 * m)) / n) / nullif(n - 1, 0)) / n
           ), 0), 4) + 0.0 AS z_vs_chance
    FROM sums
    """,
    tags=("analytics", "eval"),
)
def eval_auc_delong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC with the DeLong (1988) standard error — the inference layer
    eval_auc_trapezoid lacks: a point AUC without its sampling variance
    cannot say whether a classifier beats chance (or another model), and
    DeLong's placement-value estimator is THE standard the clinical/ML
    literature reports. Same deterministic score/label as the ROC suite.

    Everything rides the round's support-histogram algebra: placements
    are midranks in disguise — a positive at score v beats u10/(2n) of
    negatives where u10 = 2·neg_below + neg_eq is an exact BIGINT over
    the score SUPPORT (and symmetrically u01 for negatives) — so the
    placement first/second moments are exact integer sums, AUC ships as
    exact integer ppm via the rank-sum identity (Σpos_v·u10 = 2·m·n·AUC),
    and the only floats are the two variance terms (identical trees over
    exact ints, rule 9) inside one sqrt (6dp/4dp rounds, rule 8). On
    this synthetic fixture the verdict is AT CHANCE (AUC ~ 0.5,
    |z| < 2) — which is exactly why the SE matters: a point AUC of
    0.49 reads as 'slightly worse than random' until the CI says the
    data cannot distinguish it from chance, with the tie-aware variance
    a naive binomial SE would understate.

    100 TB shape: one partial agg to users, one to the bounded
    cents-support, one support-sized cumulative window (the
    eval_roc_curve scale argument), a 1-row fold."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            F.sum(
                F.when(
                    F.col("event_type").isin("view", "click"), F.col("value")
                ).otherwise(0.0)
            )
            * 100
            + 0.5
        )
        .cast("long")
        .alias("score_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("label"),
    )
    support = per_user.groupBy(F.col("score_cents").alias("v")).agg(
        F.sum("label").alias("pos_v"),
        F.sum(1 - F.col("label")).alias("neg_v"),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = support.select(
        "v",
        "pos_v",
        "neg_v",
        (F.sum("pos_v").over(wcum) - F.col("pos_v")).alias("pos_below"),
        (F.sum("neg_v").over(wcum) - F.col("neg_v")).alias("neg_below"),
    )
    tot = cum.agg(F.sum("pos_v").alias("m"), F.sum("neg_v").alias("n"))
    pl = cum.crossJoin(F.broadcast(tot)).select(
        "pos_v",
        "neg_v",
        "m",
        "n",
        (2 * F.col("neg_below") + F.col("neg_v")).alias("u10"),
        (
            2 * (F.col("m") - F.col("pos_below") - F.col("pos_v")) + F.col("pos_v")
        ).alias("u01"),
    )
    sums = pl.agg(
        F.max("m").alias("m"),
        F.max("n").alias("n"),
        F.sum(F.col("pos_v") * F.col("u10")).alias("s10_1"),
        F.sum(F.col("pos_v") * F.col("u10") * F.col("u10")).alias("s10_2"),
        F.sum(F.col("neg_v") * F.col("u01")).alias("s01_1"),
        F.sum(F.col("neg_v") * F.col("u01") * F.col("u01")).alias("s01_2"),
    )
    v10 = (
        F.col("s10_2") / (2.0 * F.col("n")) / (2.0 * F.col("n"))
        - (F.col("s10_1") / (2.0 * F.col("n")))
        * (F.col("s10_1") / (2.0 * F.col("n")))
        / F.col("m")
    ) / F.nullif(F.col("m") - 1, F.lit(0)) / F.col("m")
    v01 = (
        F.col("s01_2") / (2.0 * F.col("m")) / (2.0 * F.col("m"))
        - (F.col("s01_1") / (2.0 * F.col("m")))
        * (F.col("s01_1") / (2.0 * F.col("m")))
        / F.col("n")
    ) / F.nullif(F.col("n") - 1, F.lit(0)) / F.col("n")
    se = F.sqrt(v10 + v01)
    auc_f = F.col("s10_1") / (2.0 * F.col("m") * F.col("n"))
    return sums.select(
        "m",
        "n",
        F.expr("s10_1 * 1000000 div (2 * m * n)").alias("auc_ppm"),
        (F.round(se, 6) + F.lit(0.0)).alias("se_delong"),
        (
            F.round((auc_f - 0.5) / F.nullif(se, F.lit(0.0)), 4) + F.lit(0.0)
        ).alias("z_vs_chance"),
    )


# --- round 11: Bradley-Terry preference ranking trained in-engine --------------

BT_ITERS = 8           # full-batch gradient steps on the pairwise log-loss
BT_STEP_X1M = 500000   # lr * 1e6: micro-unit step quantizer => lr = 0.5.
                       # The MEAN pairwise logistic loss is L-smooth with
                       # L <= 1/2 (sum w*p*(1-p)*||e_i - e_j||^2 / n <= 1/2),
                       # so lr = 0.5 < 1/L = 2 guarantees monotone descent —
                       # pinned by tests/test_round11_properties.py.
BT_MIN_MARGIN_PPM = 20_000  # same signal floor as corpus_preference_pairs

# The cross-source preference-pair CTEs shared by the oracle generator: the
# corpus_preference_pairs construction (llm_text.py) with source REMOVED from
# the bucket key, so the best/worst documents of a (lang, md5-nibble) bucket
# come from DIFFERENT sources and the pair votes winner-source over
# loser-source. Parametrized by src so the differential fuzzer can swap in
# corpus slices or a literal edge table.
_BT_PAIRS_SQL = f"""WITH scored AS MATERIALIZED (
        SELECT doc_id, lang, source,
               substr(md5(doc_id::VARCHAR), 1, 1) AS bucket,
               len(list_distinct(string_split(text, ' '))) * 1000000
                   // len(string_split(text, ' ')) AS score_ppm
        FROM documents
    ),
    ranked AS MATERIALIZED (
        SELECT *,
               row_number() OVER (PARTITION BY lang, bucket
                                  ORDER BY score_ppm DESC, doc_id ASC) AS rb,
               row_number() OVER (PARTITION BY lang, bucket
                                  ORDER BY score_ppm ASC, doc_id ASC) AS rw
        FROM scored
    ),
    edges AS MATERIALIZED (
        SELECT b.source AS winner, w.source AS loser, count(*)::BIGINT AS w
        FROM ranked b
        JOIN ranked w ON b.lang = w.lang AND b.bucket = w.bucket
        WHERE b.rb = 1 AND w.rw = 1 AND b.doc_id != w.doc_id
          AND b.score_ppm - w.score_ppm >= {BT_MIN_MARGIN_PPM}
          AND b.source != w.source
        GROUP BY b.source, w.source
    )"""


def _bt_chain_sql(edges_with_sql: str = _BT_PAIRS_SQL,
                  iters: int = BT_ITERS, step_x1m: int = BT_STEP_X1M) -> str:
    """Generated chained-CTE twin of eval_bradley_terry's training loop —
    the _logreg_oracle_sql discipline (PARITY rule 29): one (g, s) CTE pair
    per unrolled gradient step, strengths as exact micro-unit BIGINTs,
    deltas quantized floor(mean_grad * step_x1m + 0.5), gauge fixed after
    every step by subtracting the lexicographically-first item's strength
    (BT strengths are translation-invariant; integer recentering is exact).
    `edges_with_sql` must end with an `edges(winner, loser, w)` CTE so the
    fuzzer can replace the corpus pair construction with literal edges."""
    parts = [
        edges_with_sql,
        """,
    items AS MATERIALIZED (
        SELECT DISTINCT item FROM (
            SELECT winner AS item FROM edges
            UNION ALL SELECT loser FROM edges
        )
    ),
    ref AS (SELECT min(item) AS ref_item FROM items),
    np AS (SELECT sum(w)::BIGINT AS n FROM edges),
    s_0 AS MATERIALIZED (SELECT item, 0::BIGINT AS sm FROM items)""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
    g_{t} AS (
        SELECT c.item,
               floor(sum(c.contrib) / np.n * {step_x1m} + 0.5)::BIGINT AS d
        FROM (
            SELECT e.winner AS item,
                   -(e.w * (1.0 - 1.0 / (1.0 + exp(-((sw.sm - sl.sm)
                       / 1000000.0))))) AS contrib
            FROM edges e
            JOIN s_{t - 1} sw ON sw.item = e.winner
            JOIN s_{t - 1} sl ON sl.item = e.loser
            UNION ALL
            SELECT e.loser AS item,
                   (e.w * (1.0 - 1.0 / (1.0 + exp(-((sw.sm - sl.sm)
                       / 1000000.0))))) AS contrib
            FROM edges e
            JOIN s_{t - 1} sw ON sw.item = e.winner
            JOIN s_{t - 1} sl ON sl.item = e.loser
        ) c CROSS JOIN np
        GROUP BY c.item, np.n
    ),
    sr_{t} AS (
        SELECT s.item, (s.sm - COALESCE(g.d, 0))::BIGINT AS sm
        FROM s_{t - 1} s LEFT JOIN g_{t} g ON g.item = s.item
    ),
    s_{t} AS MATERIALIZED (
        SELECT s.item,
               (s.sm - (SELECT r.sm FROM sr_{t} r CROSS JOIN ref
                        WHERE r.item = ref.ref_item))::BIGINT AS sm
        FROM sr_{t} s
    )"""
        )
    return "".join(parts)


def _bt_oracle_sql() -> str:
    """eval_bradley_terry's full twin: the shared chain + the readout tail
    (observed win counts, exact win-rate ppm, final strengths, and the
    round-trip calibration column pred_wins = sum of the fitted win
    probabilities over every game the item played)."""
    t = BT_ITERS
    return (
        _bt_chain_sql()
        + f""",
    stats AS (
        SELECT item, sum(wins)::BIGINT AS n_wins, sum(games)::BIGINT AS n_games
        FROM (
            SELECT winner AS item, w AS wins, w AS games FROM edges
            UNION ALL
            SELECT loser AS item, 0 AS wins, w AS games FROM edges
        ) GROUP BY item
    ),
    pred AS (
        SELECT u.item, round(sum(u.pw), 6) + 0.0 AS pred_wins
        FROM (
            SELECT e.winner AS item,
                   e.w * (1.0 / (1.0 + exp(-((sw.sm - sl.sm)
                       / 1000000.0)))) AS pw
            FROM edges e
            JOIN s_{t} sw ON sw.item = e.winner
            JOIN s_{t} sl ON sl.item = e.loser
            UNION ALL
            SELECT e.loser AS item,
                   e.w * (1.0 - 1.0 / (1.0 + exp(-((sw.sm - sl.sm)
                       / 1000000.0)))) AS pw
            FROM edges e
            JOIN s_{t} sw ON sw.item = e.winner
            JOIN s_{t} sl ON sl.item = e.loser
        ) u GROUP BY u.item
    )
    SELECT st.item AS source, st.n_wins, st.n_games,
           (st.n_wins * 1000000 // st.n_games)::BIGINT AS win_rate_ppm,
           s.sm AS strength_micro,
           p.pred_wins
    FROM stats st
    JOIN s_{t} s ON s.item = st.item
    JOIN pred p ON p.item = st.item"""
    )


# Session memo: BT edge frame + trained strengths, paid once per
# (applicationId, sf_dir) — the _unigram_frames convention, so consumers
# (eval_bradley_terry, corpus_reward_mix) share one training run.
_BT_FRAMES: dict = {}


def _bt_strengths(spark: SparkSession, sf_dir: str):
    """Build the cross-source preference edge frame (checkpointed) and run
    the BT_ITERS quantized gradient loop once per (session, sf_dir).
    Returns (edges, items, strengths, n_pairs)."""
    import math

    from ..session import ensure_checkpoint_dir

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _BT_FRAMES:
        return _BT_FRAMES[key]
    ensure_checkpoint_dir(spark)
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' '))"
        ).alias("score_ppm"),
    )
    wb = Window.partitionBy("lang", "bucket").orderBy(
        F.col("score_ppm").desc(), F.col("doc_id").asc()
    )
    ww = Window.partitionBy("lang", "bucket").orderBy(
        F.col("score_ppm").asc(), F.col("doc_id").asc()
    )
    ranked = scored.select(
        "*",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    best = ranked.filter(F.col("rb") == 1).select(
        "lang", "bucket",
        F.col("doc_id").alias("b_doc"),
        F.col("source").alias("winner"),
        F.col("score_ppm").alias("b_score"),
    )
    worst = ranked.filter(F.col("rw") == 1).select(
        "lang", "bucket",
        F.col("doc_id").alias("w_doc"),
        F.col("source").alias("loser"),
        F.col("score_ppm").alias("w_score"),
    )
    edge_agg = (
        best.join(worst, ["lang", "bucket"])
        .filter(
            (F.col("b_doc") != F.col("w_doc"))
            & (F.col("b_score") - F.col("w_score") >= BT_MIN_MARGIN_PPM)
            & (F.col("winner") != F.col("loser"))
        )
        .groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # The aggregated edge frame is <= |sources|^2 rows BY CONSTRUCTION
    # (groupBy winner,loser over the source vocabulary) — a metadata-scale
    # artifact that stops scaling with the corpus. Collect it ONCE and run
    # the BT_ITERS gradient loop on the driver (guide §1.2: the distributed
    # algorithm already reduced the corpus to O(K^2); §5: O(K^2) driver
    # state). The round-12 bench measured the previous formulation's
    # BT_ITERS distributed aggregates at ~0.6-1.3 s EACH over this 70-row
    # frame — pure per-iteration planning + codegen of the |items|-branch
    # CASE WHEN literal trees, not data. The driver loop folds the same
    # +-w*(1-p) contributions; the micro-unit quantizer (floor(mean_grad *
    # BT_STEP_X1M + 0.5)) that already absorbs Spark-vs-DuckDB float sum
    # order absorbs the driver's sum order the same way, so the integer
    # trajectory is unchanged (parity-verified at sf0.001/0.01/0.1).
    # The collect IS the materialization: the corpus pass runs exactly once
    # (one collect job instead of checkpoint-write + collect-read), and the
    # shared `edges` frame handed to consumers is the parallelized driver
    # rows (plans as Scan ExistingRDD — ADVICE r12) of the
    # collected K^2-bounded rows (the DRIVER_FRAME_CHECKPOINT_MIN_ROWS
    # rationale — an eager checkpoint of a tiny frame is pure task/write
    # overhead).
    edge_rows = [
        (r["winner"], r["loser"], r["w"])
        for r in edge_agg.select("winner", "loser", "w").collect()
    ]
    edges = spark.createDataFrame(
        sorted(edge_rows), "winner string, loser string, w long"
    )
    items = sorted({w for w, _, _ in edge_rows} | {l for _, l, _ in edge_rows})
    if not items:
        # Degenerate corpus (one source, or no pair clears BT_MIN_MARGIN_PPM):
        # no preference evidence exists, so the trained artifact is EMPTY —
        # consumers emit empty frames rather than crashing on items[0] /
        # dividing by a None pair count (ADVICE r11 item 1).
        _BT_FRAMES[key] = (edges, [], {}, 0)
        return _BT_FRAMES[key]
    ref = items[0]
    n_pairs = sum(w for _, _, w in edge_rows)
    s = {it: 0 for it in items}

    for _ in range(BT_ITERS):
        g = dict.fromkeys(items, 0.0)
        for winner, loser, w in edge_rows:
            p = 1.0 / (1.0 + math.exp(-((s[winner] - s[loser]) / 1000000.0)))
            c = w * (1.0 - p)
            g[winner] -= c
            g[loser] += c
        for it in items:
            s[it] -= math.floor(g[it] / n_pairs * BT_STEP_X1M + 0.5)
        off = s[ref]
        for it in items:
            s[it] -= off
    _BT_FRAMES[key] = (edges, items, dict(s), n_pairs)
    return _BT_FRAMES[key]



@query(
    "eval_bradley_terry",
    oracle=_bt_oracle_sql(),
    tags=("analytics", "ml", "preference", "flagship"),
)
def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry reward ranking TRAINED IN-ENGINE — the consumer of the
    corpus_preference_pairs data shape (VERDICT r10 item 3): which SOURCE
    produces preferred documents? Pairs are the corpus_preference_pairs
    construction with source removed from the bucket key, so each
    (lang, md5-nibble) bucket's best-vs-worst document votes its winner's
    source over its loser's source; the votes aggregate to a tiny
    (winner, loser, w) edge frame and BT strengths are fit by full-batch
    gradient descent on the pairwise logistic loss
    -sum w * ln sigmoid(s_w - s_l), the ml_logreg_train machinery
    (PARITY rule 29): MICRO-QUANTIZED integer strengths, delta =
    floor(mean_grad * BT_STEP_X1M + 0.5), so the trajectory is a sequence
    of exact BIGINT vectors and cross-engine ulp noise in the float
    gradient sum dies at each step's quantizer. BT strengths are
    translation-invariant, so the gauge is fixed after every step by
    subtracting the lexicographically-first item's strength — an exact
    integer recentering that keeps the trajectory deterministic. lr = 0.5
    is below the 1/L = 2 monotone-descent bound of the mean pairwise
    loss (L <= 1/2), so log-loss decreases every step — pinned as a
    property test. Readout per item: observed wins/games, exact integer
    win-rate ppm, final strength, and pred_wins (sum of fitted win
    probabilities over the item's games) — the round-trip calibration a
    converged BT fit must satisfy (pred_wins ~= n_wins).

    Execution shape is the treeAggregate loop: ONE corpus pass builds the
    pair votes (two rank windows per (lang, bucket) partition, argmax
    rows only into the bucket self-join — the corpus_preference_pairs
    plan); the aggregated edge frame is eagerly checkpointed and each of
    BT_ITERS steps is one distributed aggregate over it, with the driver
    folding K strength integers (K = |items|) and broadcasting them back
    as literals. Driver state is O(items); row data never leaves the
    cluster.

    At 100 TB: the corpus pass dominates and is exactly the preference-
    pair plan; the edge frame is |items|^2 at most, so the training loop
    costs BT_ITERS aggregates over a frame that no longer scales with the
    corpus. The edge frame + trained strengths are memoized per
    (session, sf_dir) via _bt_strengths, so corpus_reward_mix rides the
    same training run."""
    edges, items, s, n_pairs = _bt_strengths(spark, sf_dir)

    def s_lit(col):  # strengths broadcast back as literals, logreg-style
        expr = F.lit(None).cast("long")
        for it in items:
            expr = F.when(F.col(col) == it, F.lit(s[it])).otherwise(expr)
        return expr

    def p_win():  # fitted P(winner beats loser) from exact integer strengths
        return 1.0 / (
            1.0 + F.exp(-((s_lit("winner") - s_lit("loser")) / 1000000.0))
        )

    stats = (
        edges.select(
            F.col("winner").alias("item"),
            F.col("w").alias("wins"),
            F.col("w").alias("games"),
        )
        .union(
            edges.select(
                F.col("loser").alias("item"),
                F.lit(0).cast("long").alias("wins"),
                F.col("w").alias("games"),
            )
        )
        .groupBy("item")
        .agg(F.sum("wins").alias("n_wins"), F.sum("games").alias("n_games"))
    )
    pred = (
        edges.select(
            F.col("winner").alias("item"), (F.col("w") * p_win()).alias("pw")
        )
        .union(
            edges.select(
                F.col("loser").alias("item"),
                (F.col("w") * (1.0 - p_win())).alias("pw"),
            )
        )
        .groupBy("item")
        .agg((F.round(F.sum("pw"), 6) + F.lit(0.0)).alias("pred_wins"))
    )
    return (
        stats.join(pred, "item")
        .select(
            F.col("item").alias("source"),
            "n_wins",
            "n_games",
            F.expr("n_wins * 1000000 div n_games").alias("win_rate_ppm"),
            s_lit("item").alias("strength_micro"),
            "pred_wins",
        )
    )


SPEARMAN_N_MAX = 1_000_000  # sum(rx2*ry2) <= 4N^3 stays under 2^63 only for
                            # N <~ 1.3e6; the readout raise_error()s past this
                            # instead of returning a silently-overflowed rho


@query(
    "stats_spearman",
    oracle="""
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
               sum(CASE WHEN event_type = 'purchase'
                        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS y
        FROM events GROUP BY user_id
    ),
    xr AS (
        SELECT v, t, (2 * (cum - t) + t + 1)::BIGINT AS r2 FROM (
            SELECT x AS v, count(*)::BIGINT AS t,
                   sum(count(*)) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS cum
            FROM pu GROUP BY x
        )
    ),
    yr AS (
        SELECT v, t, (2 * (cum - t) + t + 1)::BIGINT AS r2 FROM (
            SELECT y AS v, count(*)::BIGINT AS t,
                   sum(count(*)) OVER (ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                       AS cum
            FROM pu GROUP BY y
        )
    ),
    joined AS (
        SELECT p.user_id, xr.r2 AS rx2, yr.r2 AS ry2
        FROM pu p JOIN xr ON xr.v = p.x JOIN yr ON yr.v = p.y
    ),
    sums AS (
        SELECT count(*)::BIGINT AS n,
               sum(rx2)::BIGINT AS sx, sum(ry2)::BIGINT AS sy,
               sum(rx2 * rx2)::BIGINT AS sxx, sum(ry2 * ry2)::BIGINT AS syy,
               sum(rx2 * ry2)::BIGINT AS sxy
        FROM joined
    ),
    tiex AS (SELECT sum(CASE WHEN t > 1 THEN 1 ELSE 0 END)::BIGINT AS n_tied_x
             FROM xr),
    tiey AS (SELECT sum(CASE WHEN t > 1 THEN 1 ELSE 0 END)::BIGINT AS n_tied_y
             FROM yr)
    SELECT s.n, tx.n_tied_x, ty.n_tied_y,
           round((s.n::DOUBLE * s.sxy - s.sx::DOUBLE * s.sy)
                 / nullif(sqrt((s.n::DOUBLE * s.sxx - s.sx::DOUBLE * s.sx)
                               * (s.n::DOUBLE * s.syy - s.sy::DOUBLE * s.sy)), 0),
                 6) + 0.0 AS rho_spearman
    FROM sums s CROSS JOIN tiex tx CROSS JOIN tiey ty
    """,
    tags=("analytics", "stats"),
)
def stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation with tie midranks — does engagement
    (per-user view count) MONOTONICALLY track spend (per-user purchase
    cents)? The distribution-free complement of agg_correlation's
    Pearson: rho is Pearson over RANKS, immune to the heavy right tail
    of spend. Completes the nonparametric suite (mannwhitney = 2-group
    location, kruskal = k-group location, wilcoxon = paired location,
    spearman = association).

    Exactness AND scale from the support-histogram midrank construction
    (stats_kruskal_wallis's): each variable ranks over its own VALUE
    SUPPORT (distinct view counts / distinct spend cents) via the
    2*midrank = 2*(cum - t) + t + 1 prefix-sum identity — exact BIGINTs,
    never a global row sort. Unlike the location tests, Spearman needs
    per-PAIR rank products, so the user frame joins back to the two
    support tables (hash equi-joins on the value key — rows touched
    once, supports bounded) and one aggregate folds the exact integer
    sums; rho is computed in the final 1-row fold only (rules 1/6, 6dp,
    -0.0 guard). Doubled-rank products bound: sum(rx2*ry2) <= 4N^3
    overflows BIGINT near N ~ 1.3e6 — ENFORCED (ADVICE r11 item 3): the
    readout raise_error()s when n exceeds SPEARMAN_N_MAX instead of
    returning a silently-corrupted rho; past that the fold runs
    per-range with DOUBLE partials (the documented migration).

    At 100 TB: one partial agg to the user frame, two support windows
    (|V| rows each), two equi-joins, one fold — no corpus-sized sort or
    window anywhere."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )

    def support_ranks(col: str):
        wcum = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            pu.groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).alias("t"))
            .select("v", "t", F.sum("t").over(wcum).alias("cum"))
            .select(
                "v",
                "t",
                (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1).alias("r2"),
            )
        )

    xr = support_ranks("x")
    yr = support_ranks("y")
    joined = (
        pu.join(xr.select(F.col("v").alias("x"), F.col("r2").alias("rx2")), "x")
        .join(yr.select(F.col("v").alias("y"), F.col("r2").alias("ry2")), "y")
    )
    sums = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    tiex = xr.agg(
        F.sum(F.when(F.col("t") > 1, 1).otherwise(0)).alias("n_tied_x")
    )
    tiey = yr.agg(
        F.sum(F.when(F.col("t") > 1, 1).otherwise(0)).alias("n_tied_y")
    )
    num = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    den = F.sqrt(
        (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (F.col("n").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    n_guarded = (
        F.when(
            F.col("n") > F.lit(SPEARMAN_N_MAX),
            F.raise_error(
                F.lit(
                    "stats_spearman: n exceeds the BIGINT-safe doubled-rank"
                    " bound (4N^3 < 2^63); shard the fold with DOUBLE partials"
                )
            ).cast("long"),
        )
        .otherwise(F.col("n"))
    )
    return (
        sums.crossJoin(F.broadcast(tiex))
        .crossJoin(F.broadcast(tiey))
        .select(
            n_guarded.alias("n"),
            "n_tied_x",
            "n_tied_y",
            (F.round(num / F.nullif(den, F.lit(0.0)), 6) + F.lit(0.0)).alias(
                "rho_spearman"
            ),
        )
    )


BRIER_BIN_W = 5     # fixed-width view-count bins (stated, never fitted)
BRIER_BINS = 10     # bins 0..9; the top bin absorbs the tail


@query(
    "eval_brier_decomposition",
    oracle=f"""
    WITH pu AS (
        SELECT user_id,
               least(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                     // {BRIER_BIN_W}, {BRIER_BINS - 1})::BIGINT AS bin,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END)::BIGINT AS y
        FROM events GROUP BY user_id
    ),
    b AS (
        SELECT bin, count(*)::BIGINT AS nb, sum(y)::BIGINT AS nb_pos
        FROM pu GROUP BY bin
    ),
    tot AS (SELECT sum(nb)::BIGINT AS n, sum(nb_pos)::BIGINT AS n_pos FROM b),
    terms AS (
        SELECT b.bin, b.nb, b.nb_pos, t.n, t.n_pos,
               (b.nb_pos + 1)::DOUBLE / (b.nb + 2) AS f,
               b.nb_pos::DOUBLE / b.nb AS o,
               t.n_pos::DOUBLE / t.n AS obar
        FROM b CROSS JOIN tot t
    )
    SELECT any_value(n)::BIGINT AS n,
           count(*)::BIGINT AS n_bins,
           (any_value(n_pos) * 1000000 // any_value(n))::BIGINT AS pos_rate_ppm,
           round(sum(nb_pos * (1.0 - f) * (1.0 - f)
                     + (nb - nb_pos) * f * f) / any_value(n), 6) + 0.0 AS brier,
           round(sum(nb * (f - o) * (f - o)) / any_value(n), 6) + 0.0
               AS reliability,
           round(sum(nb * (o - obar) * (o - obar)) / any_value(n), 6) + 0.0
               AS resolution,
           round(any_value(obar) * (1.0 - any_value(obar)), 6) + 0.0
               AS uncertainty,
           round(sum(nb * abs(f - o)) / any_value(n), 6) + 0.0 AS ece,
           round(max(abs(f - o)), 6) + 0.0 AS mce
    FROM terms
    """,
    tags=("analytics", "ml", "eval"),
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score — the calibration audit
    every probabilistic classifier deploy runs: bin users by a stated
    fixed-width engagement feature (view count div BRIER_BIN_W, capped at
    BRIER_BINS), forecast each bin's big-purchaser probability with the
    LAPLACE-smoothed in-bin rate (nb_pos+1)/(nb+2) — deliberately not the
    raw rate, whose in-sample reliability is zero by construction — and
    decompose BS = REL - RES + UNC over the bin frame. REL (how far
    forecasts sit from observed rates) is the term smoothing perturbs;
    RES (how much the bins separate the base rate) is what the feature
    earns; UNC is the base rate's own variance. The identity holds
    EXACTLY for binned forecasts (Murphy 1973) and is pinned as a
    property test. ECE/MCE (expected / maximum calibration error — the
    deployment dashboard numbers) ride the same bin frame.

    Exactness: every input to every float is an exact BIGINT count folded
    map-side; f/o/obar are rationals of those ints (identical expression
    trees — rule 9), all four readouts are aggregate-rounded 6dp over the
    <= BRIER_BINS-row bin frame (rules 1/6/8), pos_rate_ppm is integer
    ppm (rule 25).

    At 100 TB: one partial agg to users, one to bins; the decomposition
    runs on a frame that never exceeds BRIER_BINS rows."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.expr(
            f"least(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
            f" div {BRIER_BIN_W}, {BRIER_BINS - 1})"
        ).alias("bin"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("y"),
    )
    b = pu.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("y").alias("nb_pos")
    )
    tot = b.agg(F.sum("nb").alias("n"), F.sum("nb_pos").alias("n_pos"))
    terms = b.crossJoin(F.broadcast(tot)).select(
        "bin",
        "nb",
        "nb_pos",
        "n",
        "n_pos",
        ((F.col("nb_pos") + 1).cast("double") / (F.col("nb") + 2)).alias("f"),
        (F.col("nb_pos").cast("double") / F.col("nb")).alias("o"),
        (F.col("n_pos").cast("double") / F.col("n")).alias("obar"),
    )
    return terms.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("n_bins"),
        F.expr("max(n_pos) * 1000000 div max(n)").alias("pos_rate_ppm"),
        (
            F.round(
                F.sum(
                    F.col("nb_pos") * (1.0 - F.col("f")) * (1.0 - F.col("f"))
                    + (F.col("nb") - F.col("nb_pos")) * F.col("f") * F.col("f")
                )
                / F.max("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("brier"),
        (
            F.round(
                F.sum(
                    F.col("nb")
                    * (F.col("f") - F.col("o"))
                    * (F.col("f") - F.col("o"))
                )
                / F.max("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("reliability"),
        (
            F.round(
                F.sum(
                    F.col("nb")
                    * (F.col("o") - F.col("obar"))
                    * (F.col("o") - F.col("obar"))
                )
                / F.max("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("resolution"),
        (
            F.round(F.max("obar") * (1.0 - F.max("obar")), 6) + F.lit(0.0)
        ).alias("uncertainty"),
        (
            F.round(
                F.sum(F.col("nb") * F.abs(F.col("f") - F.col("o"))) / F.max("n"),
                6,
            )
            + F.lit(0.0)
        ).alias("ece"),
        (
            F.round(F.max(F.abs(F.col("f") - F.col("o"))), 6) + F.lit(0.0)
        ).alias("mce"),
    )


@query(
    "stats_friedman",
    oracle="""
    WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    k AS (SELECT count(DISTINCT event_type)::BIGINT AS k FROM daily),
    blocks AS MATERIALIZED (
        SELECT d.* FROM daily d
        JOIN (SELECT day FROM daily GROUP BY day
              HAVING count(*) = (SELECT k FROM k)) c ON c.day = d.day
    ),
    vals AS (
        SELECT day, xc, count(*)::BIGINT AS t,
               sum(count(*)) OVER (PARTITION BY day ORDER BY xc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS cum
        FROM blocks GROUP BY day, xc
    ),
    ranked AS (
        SELECT b.event_type, b.day,
               (2 * (v.cum - v.t) + v.t + 1)::BIGINT AS r2, v.t
        FROM blocks b JOIN vals v ON v.day = b.day AND v.xc = b.xc
    ),
    per_ch AS (
        SELECT event_type, sum(r2)::BIGINT AS s2 FROM ranked GROUP BY event_type
    ),
    tot AS (
        SELECT count(DISTINCT day)::BIGINT AS n,
               sum(r2 * r2)::BIGINT AS a2,
               sum(CASE WHEN t > 1 THEN 1 ELSE 0 END)::BIGINT AS n_tied_cells
        FROM ranked
    )
    SELECT kk.k, t.n AS n_blocks, t.n_tied_cells,
           round((kk.k - 1) * (SELECT sum((p.s2 / 2.0 - t.n * (kk.k + 1) / 2.0)
                                          * (p.s2 / 2.0 - t.n * (kk.k + 1) / 2.0))
                               FROM per_ch p)
                 / nullif(t.a2 / 4.0
                          - t.n * kk.k * (kk.k + 1.0) * (kk.k + 1.0) / 4.0, 0),
                 4) + 0.0 AS chi2_friedman
    FROM tot t CROSS JOIN k kk
    """,
    tags=("analytics", "stats"),
)
def stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test — the repeated-measures nonparametric: do the
    channels' daily revenues differ when each DAY is its own block
    (removing day-level shocks the unpaired kruskal would absorb as
    noise)? Ranks are assigned WITHIN each complete block (days carrying
    all k channels — incomplete blocks are excluded, stated), with tie
    midranks, and the tie-corrected statistic
    chi2 = (k-1) * sum_j (R_j - n(k+1)/2)^2 / (A - nk(k+1)^2/4) uses
    A = sum r_ij^2 over all cells. Completes the location suite:
    mannwhitney (2 unpaired), kruskal (k unpaired), wilcoxon (2 paired),
    friedman (k blocked).

    Exactness AND scale from the kruskal construction applied PER BLOCK:
    cells fold map-side to (day, channel, cents); each block's midranks
    come from the prefix sum over its own value support (2*midrank =
    2*(cum - t) + t + 1, exact BIGINT; the window is PARTITIONED by day
    — never a global sort); rank sums and the A-term are exact integer
    folds, floats appear only in the 1-row readout (rules 1/6, 4dp,
    -0.0 guard).

    At 100 TB: one partial agg to cells, one per-block support window,
    two folds — block count scales with the calendar, not the rows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))
    kdf = daily.agg(F.count_distinct("event_type").alias("k"))
    complete = (
        daily.groupBy("day")
        .agg(F.count(F.lit(1)).alias("nch"))
        .crossJoin(F.broadcast(kdf))
        .filter(F.col("nch") == F.col("k"))
        .select("day")
    )
    blocks = daily.join(complete, "day")
    wcum = (
        Window.partitionBy("day")
        .orderBy("xc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vals = (
        blocks.groupBy("day", "xc")
        .agg(F.count(F.lit(1)).alias("t"))
        .select("day", "xc", "t", F.sum("t").over(wcum).alias("cum"))
    )
    ranked = blocks.join(vals, ["day", "xc"]).select(
        "event_type",
        "day",
        (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1).alias("r2"),
        "t",
    )
    per_ch = ranked.groupBy("event_type").agg(F.sum("r2").alias("s2"))
    tot = ranked.agg(
        F.count_distinct("day").alias("n"),
        F.sum(F.col("r2") * F.col("r2")).alias("a2"),
        F.sum(F.when(F.col("t") > 1, 1).otherwise(0)).alias("n_tied_cells"),
    )
    dev = per_ch.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(kdf)).agg(
        F.sum(
            (F.col("s2") / 2.0 - F.col("n") * (F.col("k") + 1) / 2.0)
            * (F.col("s2") / 2.0 - F.col("n") * (F.col("k") + 1) / 2.0)
        ).alias("ssq"),
        F.max("n").alias("n"),
        F.max("a2").alias("a2"),
        F.max("n_tied_cells").alias("n_tied_cells"),
        F.max("k").alias("k"),
    )
    chi2 = (
        (F.col("k") - 1)
        * F.col("ssq")
        / F.nullif(
            F.col("a2") / 4.0
            - F.col("n")
            * F.col("k")
            * (F.col("k") + 1.0)
            * (F.col("k") + 1.0)
            / 4.0,
            F.lit(0.0),
        )
    )
    return dev.select(
        "k",
        F.col("n").alias("n_blocks"),
        "n_tied_cells",
        (F.round(chi2, 4) + F.lit(0.0)).alias("chi2_friedman"),
    )


def _iso_minimax_sql(bins_sql: str) -> str:
    """Generate the minimax-PAV CTE chain over any `b(bin, nb, npos)`
    relation (bins_sql must end with a CTE named b) — shared by
    eval_isotonic_calibration's oracle and the differential fuzzer,
    which feeds literal VALUES histograms and compares against a
    sequential pool-adjacent-violators replica."""
    return (
        bins_sql
        + """,
    pref AS (
        SELECT bin, nb, npos,
               sum(nb) OVER w::BIGINT AS cn,
               sum(npos) OVER w::BIGINT AS cp
        FROM b WINDOW w AS (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    iv AS (
        SELECT j.bin AS j, k.bin AS k,
               (k.cn - j.cn + j.nb)::BIGINT AS n_jk,
               (k.cp - j.cp + j.npos)::BIGINT AS p_jk
        FROM pref j JOIN pref k ON j.bin <= k.bin
    ),
    mm AS (
        SELECT i.bin, v.j, min(v.p_jk::DOUBLE / v.n_jk) AS m
        FROM b i JOIN iv v ON v.j <= i.bin AND v.k >= i.bin
        GROUP BY i.bin, v.j
    ),
    fit AS (SELECT bin, max(m) AS f FROM mm GROUP BY bin)
    SELECT b.bin, b.nb, b.npos,
           (b.npos * 1000000 // b.nb)::BIGINT AS rate_ppm,
           round(f.f, 6) + 0.0 AS iso_fit
    FROM b JOIN fit f ON f.bin = b.bin"""
    )



@query(
    "eval_isotonic_calibration",
    oracle=_iso_minimax_sql(f"""
    WITH pu AS (
        SELECT user_id,
               least(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                     // {BRIER_BIN_W}, {BRIER_BINS - 1})::BIGINT AS bin,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END)::BIGINT AS y
        FROM events GROUP BY user_id
    ),
    b AS (
        SELECT bin, count(*)::BIGINT AS nb, sum(y)::BIGINT AS npos
        FROM pu GROUP BY bin
    )"""),
    tags=("analytics", "ml", "eval"),
)
def eval_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration by the MINIMAX identity — pool-adjacent-
    violators without the sequential pooling loop: the PAV solution obeys
    f_i = max_(j<=i) min_(k>=i) mean(y[j..k]) (Ayer et al. 1955), and over
    a BINNED score axis that minimax is a bounded relational computation
    — interval sums from one prefix-sum window, |bins|^2/2 interval rows,
    two grouped folds — where textbook PAV is an inherently sequential
    pool-merge loop. The op that turns eval_brier_decomposition's
    diagnosis (reliability > 0) into the fix: the L2-optimal monotone
    recalibration of the same engagement bins.

    Exactness: bins/counts/interval sums are exact BIGINTs; the interval
    means are rationals of those ints (identical trees — rule 9), so the
    min/max lattice selects identical values on both engines; the fitted
    probability rounds 6dp at output (rule 8), the raw rate ships as
    integer ppm (rule 25). Property pins: the fit is non-decreasing in
    the bin order, pools preserve mass (sum nb*f = sum npos), and its
    weighted MSE never exceeds the best constant's (obar) — PAV
    optimality against the constant monotone baseline.

    At 100 TB: one partial agg to users, one to bins; everything after
    runs on frames bounded by BRIER_BINS^2 rows."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.expr(
            f"least(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
            f" div {BRIER_BIN_W}, {BRIER_BINS - 1})"
        ).alias("bin"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("y"),
    )
    b = pu.groupBy("bin").agg(
        F.count(F.lit(1)).alias("nb"), F.sum("y").alias("npos")
    )
    wpre = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = b.select(
        "bin",
        "nb",
        "npos",
        F.sum("nb").over(wpre).alias("cn"),
        F.sum("npos").over(wpre).alias("cp"),
    )
    j = pref.select(
        F.col("bin").alias("j"),
        F.col("cn").alias("jcn"),
        F.col("cp").alias("jcp"),
        F.col("nb").alias("jnb"),
        F.col("npos").alias("jnp"),
    )
    k = pref.select(
        F.col("bin").alias("k"), F.col("cn").alias("kcn"), F.col("cp").alias("kcp")
    )
    iv = (
        j.join(k, F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (F.col("kcn") - F.col("jcn") + F.col("jnb")).alias("n_jk"),
            (F.col("kcp") - F.col("jcp") + F.col("jnp")).alias("p_jk"),
        )
    )
    mm = (
        b.select(F.col("bin").alias("i"))
        .join(iv, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min(F.col("p_jk").cast("double") / F.col("n_jk")).alias("m"))
    )
    fit = mm.groupBy("i").agg(F.max("m").alias("f"))
    return b.join(fit, b.bin == fit.i).select(
        "bin",
        "nb",
        "npos",
        F.expr("npos * 1000000 div nb").alias("rate_ppm"),
        (F.round(F.col("f"), 6) + F.lit(0.0)).alias("iso_fit"),
    )


@query(
    "stats_proportion_ztest",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END)::BIGINT AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, count(*)::BIGINT AS n, sum(converted)::BIGINT AS x
        FROM pu GROUP BY arm
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 'control' THEN n END)::BIGINT AS n_c,
               max(CASE WHEN arm = 'control' THEN x END)::BIGINT AS x_c,
               max(CASE WHEN arm = 'treatment' THEN n END)::BIGINT AS n_t,
               max(CASE WHEN arm = 'treatment' THEN x END)::BIGINT AS x_t
        FROM arms
    )
    SELECT n_c, x_c, n_t, x_t,
           (x_c * 1000000 // n_c)::BIGINT AS rate_c_ppm,
           (x_t * 1000000 // n_t)::BIGINT AS rate_t_ppm,
           round((x_t::DOUBLE / n_t - x_c::DOUBLE / n_c)
                 / nullif(sqrt(((x_c + x_t)::DOUBLE / (n_c + n_t))
                               * (1.0 - (x_c + x_t)::DOUBLE / (n_c + n_t))
                               * (1.0 / n_c + 1.0 / n_t)), 0), 4) + 0.0 AS z_pooled,
           round(greatest(abs(x_t::DOUBLE / n_t - x_c::DOUBLE / n_c)
                          - (0.5 / n_c + 0.5 / n_t), 0.0)
                 / nullif(sqrt(((x_c + x_t)::DOUBLE / (n_c + n_t))
                               * (1.0 - (x_c + x_t)::DOUBLE / (n_c + n_t))
                               * (1.0 / n_c + 1.0 / n_t)), 0), 4) + 0.0
               AS z_continuity
    FROM wide
    """,
    tags=("analytics", "stats", "eval"),
)
def stats_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on conversion — the first test every A/B
    readout runs (eval_ab_cuped adjusts a MEAN; this tests a RATE): did
    treatment change the share of users who purchase at all? Pooled-SE z
    plus Yates' continuity-corrected |z| (the small-sample guard), both
    from exact per-arm BIGINT counts; the deterministic md5-nibble arm
    assignment is the suite's standard (stream_msprt_monitor /
    eval_ratio_delta_ci use the same hash, so the experiment family reads
    one consistent randomization).

    Exactness: counts fold map-side; rates ship as integer ppm (rule
    25); the z statistics are rationals of exact ints evaluated in the
    1-row readout only, rounded 4dp (rules 1/6/8) with nullif guards on
    degenerate arms.

    At 100 TB: one partial agg to users, one to arms — the cheapest
    experiment-analysis shape there is."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) >= "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
        "converted",
    )
    arms = pu.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("x")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("arm") == "control", F.col("x"))).alias("x_c"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("x"))).alias("x_t"),
    )
    p_pool = (F.col("x_c") + F.col("x_t")).cast("double") / (
        F.col("n_c") + F.col("n_t")
    )
    se = F.sqrt(
        p_pool * (1.0 - p_pool) * (1.0 / F.col("n_c") + 1.0 / F.col("n_t"))
    )
    diff = F.col("x_t").cast("double") / F.col("n_t") - F.col("x_c").cast(
        "double"
    ) / F.col("n_c")
    cc = 0.5 / F.col("n_c") + 0.5 / F.col("n_t")
    return wide.select(
        "n_c",
        "x_c",
        "n_t",
        "x_t",
        F.expr("x_c * 1000000 div n_c").alias("rate_c_ppm"),
        F.expr("x_t * 1000000 div n_t").alias("rate_t_ppm"),
        (F.round(diff / F.nullif(se, F.lit(0.0)), 4) + F.lit(0.0)).alias(
            "z_pooled"
        ),
        (
            F.round(
                F.greatest(F.abs(diff) - cc, F.lit(0.0))
                / F.nullif(se, F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("z_continuity"),
    )


def _reward_mix_oracle_sql() -> str:
    """corpus_reward_mix's twin: the BT chain + the softmax-mix tail."""
    t = BT_ITERS
    return (
        _bt_chain_sql()
        + f""",
    wq AS (
        SELECT item, sm,
               floor(exp(sm / 1000000.0) * 1000000)::BIGINT AS w_x1m
        FROM s_{t}
    ),
    tot AS (SELECT sum(w_x1m)::BIGINT AS tw FROM wq),
    nd AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents
           GROUP BY source)
    SELECT w.item AS source, w.sm AS strength_micro, d.n_docs,
           w.w_x1m AS softmax_w_x1m,
           (w.w_x1m * 1000000 // t.tw)::BIGINT AS mix_weight_ppm
    FROM wq w JOIN nd d ON d.source = w.item CROSS JOIN tot t"""
    )


@query(
    "corpus_reward_mix",
    oracle=_reward_mix_oracle_sql(),
    tags=("llm", "corpus", "preference"),
)
def corpus_reward_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reward-weighted training-mix planner — the SECOND consumer of the
    Bradley-Terry strengths (corpus_mix_weights plans by token budget;
    this plans by LEARNED PREFERENCE): softmax the fitted source
    strengths at unit temperature into sampling weights, so sources that
    win preference comparisons are upsampled in the next training mix —
    the reward-model-guided data-curation loop (preference pairs -> BT
    reward -> mix reweighting) closed end-to-end in-engine.

    Exactness: strengths are the memoized exact-BIGINT BT fit
    (_bt_strengths — one training run per session, eval_bradley_terry
    rides the same memo); the softmax is QUANTIZED (floor(exp(s/1e6) *
    1e6) — exp over identical integer inputs is bit-identical, rule 29's
    quantize-the-model discipline) so mix weights ship as exact integer
    ppm of exact integer weights (rule 25). Only sources that appeared in
    a preference comparison are ranked and mixed (stated).

    At 100 TB: the corpus pass is the memoized pair construction; this op
    adds one |items|-row readout and a per-source doc count."""
    edges, items, s, n_pairs = _bt_strengths(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    nd = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    import math

    wq = {it: math.floor(math.exp(s[it] / 1e6) * 1e6) for it in items}
    tw = sum(wq.values())
    rows = [(it, s[it], wq[it], wq[it] * 1_000_000 // tw) for it in items]
    mix = spark.createDataFrame(
        rows,
        "source string, strength_micro long, softmax_w_x1m long,"
        " mix_weight_ppm long",
    )
    return mix.join(nd, "source").select(
        "source", "strength_micro", "n_docs", "softmax_w_x1m", "mix_weight_ppm"
    )


@query(
    "stats_bartlett",
    oracle="""
    WITH joined AS (
        SELECT c.c_mktsegment AS segment,
               floor(o.o_totalprice * 100 + 0.5)::BIGINT AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    grp AS (
        SELECT segment, count(*)::BIGINT AS n,
               sum(cents)::BIGINT AS s, sum(cents * cents)::BIGINT AS ss
        FROM joined GROUP BY segment
    ),
    gv AS (
        SELECT segment, n,
               (ss - s::DOUBLE * s / n) / (n - 1) AS v
        FROM grp WHERE n >= 2
    ),
    tot AS (
        SELECT count(*)::BIGINT AS k, sum(n)::BIGINT AS nn,
               sum((n - 1) * v) AS pooled_num,
               sum((n - 1) * ln(v)) AS sum_lnv,
               sum(1.0 / (n - 1)) AS sum_inv
        FROM gv
    )
    SELECT k, nn AS n,
           round(((nn - k) * ln(pooled_num / (nn - k)) - sum_lnv)
                 / (1.0 + (sum_inv - 1.0 / (nn - k)) / (3.0 * (k - 1))), 4)
               + 0.0 AS bartlett_stat
    FROM tot
    """,
    tags=("analytics", "stats"),
)
def stats_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for homogeneity of variances — the parametric
    sibling of stats_levene on the same question (do the five market
    segments' order-value variances differ?): T = [(N-k) ln s_p^2 -
    sum (n_i-1) ln s_i^2] / C with the standard small-sample correction
    C = 1 + (sum 1/(n_i-1) - 1/(N-k)) / (3(k-1)). Levene is the robust
    choice under non-normality; Bartlett is the more powerful one when
    normality holds — shipping both is what a stats toolkit means.

    Exactness: per-group counts and both moments are exact BIGINT folds
    (one partial agg over the broadcast-joined fact); variances are
    rationals of those ints; ln and the statistic evaluate only in the
    1-row readout, rounded 4dp (rules 1/6/8).

    At 100 TB: one partial agg; everything after is k-row arithmetic."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    grp = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == c.c_custkey,
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    v = (
        F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    gv = grp.select("segment", "n", v.alias("v"))
    tot = gv.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum((F.col("n") - 1) * F.col("v")).alias("pooled_num"),
        F.sum((F.col("n") - 1) * F.log(F.col("v"))).alias("sum_lnv"),
        F.sum(1.0 / (F.col("n") - 1)).alias("sum_inv"),
    )
    stat = (
        (F.col("nn") - F.col("k"))
        * F.log(F.col("pooled_num") / (F.col("nn") - F.col("k")))
        - F.col("sum_lnv")
    ) / (
        1.0
        + (F.col("sum_inv") - 1.0 / (F.col("nn") - F.col("k")))
        / (3.0 * (F.col("k") - 1))
    )
    return tot.select(
        "k",
        F.col("nn").alias("n"),
        (F.round(stat, 4) + F.lit(0.0)).alias("bartlett_stat"),
    )


@query(
    "stats_cochran_q",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS t1,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS t2,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END)::BIGINT AS t3,
               max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS t4
        FROM events GROUP BY user_id
    ),
    rows_s AS (
        SELECT user_id, (t1 + t2 + t3 + t4)::BIGINT AS r FROM pu
    ),
    sums AS (
        SELECT count(*)::BIGINT AS n,
               (SELECT sum(t1)::BIGINT FROM pu) AS c1,
               (SELECT sum(t2)::BIGINT FROM pu) AS c2,
               (SELECT sum(t3)::BIGINT FROM pu) AS c3,
               (SELECT sum(t4)::BIGINT FROM pu) AS c4,
               sum(r)::BIGINT AS sr, sum(r * r)::BIGINT AS srr
        FROM rows_s
    )
    SELECT n, c1, c2, c3, c4,
           round(4 * 3 * ((c1 - sr / 4.0) * (c1 - sr / 4.0)
                          + (c2 - sr / 4.0) * (c2 - sr / 4.0)
                          + (c3 - sr / 4.0) * (c3 - sr / 4.0)
                          + (c4 - sr / 4.0) * (c4 - sr / 4.0))
                 / nullif(4.0 * sr - srr, 0), 4) + 0.0 AS cochran_q
    FROM sums
    """,
    tags=("analytics", "stats"),
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q — the k-treatment extension of eval_mcnemar_paired for
    BLOCKED BINARY outcomes: does the share of users exhibiting each of
    four behaviors (viewed, clicked, big-purchased, signed up — stated
    treatment set) differ, with each USER as their own block? Q =
    k(k-1) * sum_j (C_j - R/k)^2 / (k*sum R_i - sum R_i^2), chi2(k-1)
    under the null. Completes the paired family: mcnemar (2 binary),
    cochran_q (k binary), wilcoxon (2 continuous), friedman (k
    continuous).

    EVERY term is an exact BIGINT: per-user flags fold map-side, column
    totals and the row-sum moments are single-pass sums, and the only
    float is the 1-row readout (4dp, rules 1/6/8). Users whose row sum
    is 0 or k contribute nothing to the denominator (the standard
    all-concordant cancellation) and need no exclusion.

    At 100 TB: one partial agg to users, one fold."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("t1"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("t2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("t3"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("t4"),
    )
    r = (F.col("t1") + F.col("t2") + F.col("t3") + F.col("t4")).alias("r")
    sums = pu.select("t1", "t2", "t3", "t4", r).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t1").alias("c1"),
        F.sum("t2").alias("c2"),
        F.sum("t3").alias("c3"),
        F.sum("t4").alias("c4"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
    )
    dev = sum(
        (F.col(c) - F.col("sr") / 4.0) * (F.col(c) - F.col("sr") / 4.0)
        for c in ("c1", "c2", "c3", "c4")
    )
    q = 4 * 3 * dev / F.nullif(4.0 * F.col("sr") - F.col("srr"), F.lit(0.0))
    return sums.select(
        "n",
        "c1",
        "c2",
        "c3",
        "c4",
        (F.round(q, 4) + F.lit(0.0)).alias("cochran_q"),
    )


TOST_MARGIN_PPM = 50_000   # equivalence margin: +/- 5 points of rate
TOST_Z_X1000 = 1645        # one-sided 5% normal quantile, stated x1000


@query(
    "eval_tost_equivalence",
    oracle=f"""
    WITH pu AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               max(CASE WHEN event_type = 'purchase'
                        AND floor(value * 100 + 0.5) > 15000
                        THEN 1 ELSE 0 END)::BIGINT AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, count(*)::BIGINT AS n, sum(converted)::BIGINT AS x
        FROM pu GROUP BY arm
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 'control' THEN n END)::BIGINT AS n_c,
               max(CASE WHEN arm = 'control' THEN x END)::BIGINT AS x_c,
               max(CASE WHEN arm = 'treatment' THEN n END)::BIGINT AS n_t,
               max(CASE WHEN arm = 'treatment' THEN x END)::BIGINT AS x_t
        FROM arms
    ),
    stat AS (
        SELECT n_c, x_c, n_t, x_t,
               x_t::DOUBLE / n_t - x_c::DOUBLE / n_c AS diff,
               sqrt(x_c::DOUBLE / n_c * (1.0 - x_c::DOUBLE / n_c) / n_c
                    + x_t::DOUBLE / n_t * (1.0 - x_t::DOUBLE / n_t) / n_t)
                   AS se
        FROM wide
    )
    SELECT n_c, x_c, n_t, x_t,
           round(diff * 1000000) ::BIGINT AS diff_ppm_rounded,
           round((diff + {TOST_MARGIN_PPM} / 1000000.0) / nullif(se, 0), 4)
               + 0.0 AS z_lower,
           round(({TOST_MARGIN_PPM} / 1000000.0 - diff) / nullif(se, 0), 4)
               + 0.0 AS z_upper,
           (least((diff + {TOST_MARGIN_PPM} / 1000000.0) / nullif(se, 0),
                  ({TOST_MARGIN_PPM} / 1000000.0 - diff) / nullif(se, 0))
            > {TOST_Z_X1000} / 1000.0) AS equivalent_5pct
    FROM stat
    """,
    tags=("analytics", "stats", "eval"),
)
def eval_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test — the experiment readout the superiority
    tests cannot give: is treatment's big-purchaser rate PROVABLY WITHIN
    +/- TOST_MARGIN of control's (the non-inferiority launch criterion
    for a refactor that must not hurt)? Two one-sided z tests against
    the margin ends — z_lower = (diff + m)/se, z_upper = (m - diff)/se,
    equivalent at 5% iff BOTH exceed the stated one-sided 1.645 quantile
    (min > z*). Failing to reject a superiority null is NOT evidence of
    equivalence; TOST is, which is why it completes the A/B family
    (ztest = difference, msprt = always-valid monitoring, cuped =
    variance reduction, TOST = sameness).

    Exactness: exact per-arm counts (one partial agg), unpooled SE and
    both z from rationals of those ints in the 1-row readout (4dp,
    rules 1/6/8); the verdict compares min(z) to an exact stated
    constant — measure-zero boundary, fixture verdict far from it
    (pinned). The rounded diff ships alongside for the dashboard.

    At 100 TB: one partial agg to users, one to arms."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) >= "8",
            "treatment",
        )
        .otherwise("control")
        .alias("arm"),
        "converted",
    )
    wide = (
        pu.groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("converted").alias("x"))
        .agg(
            F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("n_c"),
            F.max(F.when(F.col("arm") == "control", F.col("x"))).alias("x_c"),
            F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("n_t"),
            F.max(F.when(F.col("arm") == "treatment", F.col("x"))).alias("x_t"),
        )
    )
    p_c = F.col("x_c").cast("double") / F.col("n_c")
    p_t = F.col("x_t").cast("double") / F.col("n_t")
    diff = p_t - p_c
    se = F.sqrt(
        p_c * (1.0 - p_c) / F.col("n_c") + p_t * (1.0 - p_t) / F.col("n_t")
    )
    m = TOST_MARGIN_PPM / 1000000.0
    z_lo = (diff + m) / F.nullif(se, F.lit(0.0))
    z_hi = (m - diff) / F.nullif(se, F.lit(0.0))
    return wide.select(
        "n_c",
        "x_c",
        "n_t",
        "x_t",
        F.round(diff * 1000000).cast("long").alias("diff_ppm_rounded"),
        (F.round(z_lo, 4) + F.lit(0.0)).alias("z_lower"),
        (F.round(z_hi, 4) + F.lit(0.0)).alias("z_upper"),
        (F.least(z_lo, z_hi) > TOST_Z_X1000 / 1000.0).alias("equivalent_5pct"),
    )


# --- round 12: in-engine unsupervised trainer (2-component Gaussian EM) -------

GMM_ITERS = 5            # full-batch EM steps (unrolled in the oracle twin)
GMM_MU1_0 = 400000       # init means in micro-units of the [0,1] score axis:
GMM_MU2_0 = 750000       # low component at 0.40, high at 0.75 (stated, the
                         # score distribution's two visible lobes)
GMM_VAR_0 = 10000        # init variance 0.01 for both components
GMM_PI1_0 = 500000       # init mixing weight ppm (uninformative half/half)
GMM_VAR_MIN_MICRO = 100  # variance floor 1e-4 — EM collapse guard (stated)
GMM_PI_MIN_PPM = 1000    # mixing-weight floor 0.001 — degenerate-fit guard
GMM_TWO_PI = 6.283185307179586  # 2*pi as ONE shared double literal so both
                                # engines' densities use the identical constant

# Session memo: quality-score frame + trained EM trajectory, paid once per
# (applicationId, sf_dir) — the _bt_strengths convention, so the posterior
# consumer rides the same training run as the trajectory readout.
_GMM_FRAMES: dict = {}

_GMM_XPPM_SQL = (
    "(len(list_distinct(string_split(text, ' '))) * 1000000"
    " // len(string_split(text, ' ')))::BIGINT"
)


def _gmm_dens_sql(m: str, v: str, p: str) -> str:
    """Weighted normal density p*N(xppm/1e6; m/1e6, v/1e6) as DuckDB SQL —
    generated from the same constants as the Spark expression so the two
    geometries cannot drift (rule 29 corollary)."""
    return (
        f"({p} / 1000000.0)"
        f" * exp(-pow(xppm / 1000000.0 - {m} / 1000000.0, 2)"
        f" / (2 * ({v} / 1000000.0)))"
        f" / sqrt({GMM_TWO_PI} * ({v} / 1000000.0))"
    )


def _gmm_chain_sql(pu_sql: str | None = None, iters: int = GMM_ITERS,
                   mu1_0: int = GMM_MU1_0, mu2_0: int = GMM_MU2_0,
                   var_0: int = GMM_VAR_0, pi1_0: int = GMM_PI1_0) -> str:
    """The shared WITH-clause chain replaying the exact integer EM
    trajectory: one (e, g, w MATERIALIZED, m) CTE quartet per step, all in
    the disjoint gmm_ namespace so consumers can splice the chain.
    `pu_sql` must be a SELECT yielding one BIGINT column `xppm` (defaults
    to the corpus quality score); the geometry params let the fuzzer
    instantiate random score distributions and step counts (the
    _bt_chain_sql convention)."""
    if pu_sql is None:
        pu_sql = f"SELECT {_GMM_XPPM_SQL} AS xppm FROM documents"
    parts = [
        f"""gmm_pu AS MATERIALIZED (
        {pu_sql}
    ),
    gmm_n AS (
        SELECT count(*)::BIGINT AS n, sum(xppm)::BIGINT AS sx,
               sum(xppm * xppm)::BIGINT AS sxx
        FROM gmm_pu
    ),
    gmm_w_0 AS (
        SELECT {mu1_0}::BIGINT AS m1, {mu2_0}::BIGINT AS m2,
               {var_0}::BIGINT AS v1, {var_0}::BIGINT AS v2,
               {pi1_0}::BIGINT AS p1
    )"""
    ]
    for t in range(1, iters + 1):
        d1 = _gmm_dens_sql("w.m1", "w.v1", "w.p1")
        d2 = _gmm_dens_sql("w.m2", "w.v2", "(1000000 - w.p1)")
        parts.append(
            f""",
    gmm_e_{t} AS (
        SELECT xppm, {d1} AS a1, {d2} AS a2
        FROM gmm_pu CROSS JOIN gmm_w_{t - 1} w
    ),
    gmm_g_{t} AS (
        SELECT sum(a1 / (a1 + a2)) AS sr,
               sum(a1 / (a1 + a2) * (xppm / 1000000.0)) AS srx,
               sum(a1 / (a1 + a2) * pow(xppm / 1000000.0, 2)) AS srxx
        FROM gmm_e_{t}
    ),
    gmm_w_{t} AS MATERIALIZED (
        SELECT floor(g.srx / g.sr * 1000000 + 0.5)::BIGINT AS m1,
               floor((n.sx / 1000000.0 - g.srx) / (n.n - g.sr) * 1000000
                     + 0.5)::BIGINT AS m2,
               greatest(floor((g.srxx / g.sr - pow(g.srx / g.sr, 2)) * 1000000
                              + 0.5)::BIGINT, {GMM_VAR_MIN_MICRO}) AS v1,
               greatest(floor(((n.sxx / 1000000000000.0 - g.srxx) / (n.n - g.sr)
                               - pow((n.sx / 1000000.0 - g.srx) / (n.n - g.sr),
                                     2)) * 1000000 + 0.5)::BIGINT,
                        {GMM_VAR_MIN_MICRO}) AS v2,
               least(greatest(floor(g.sr / n.n * 1000000 + 0.5)::BIGINT,
                              {GMM_PI_MIN_PPM}),
                     {1000000 - GMM_PI_MIN_PPM}) AS p1
        FROM gmm_g_{t} g CROSS JOIN gmm_n n
    ),
    gmm_m_{t} AS (
        SELECT {t}::BIGINT AS iteration, w.m1 AS mu1_micro, w.m2 AS mu2_micro,
               w.v1 AS var1_micro, w.v2 AS var2_micro, w.p1 AS pi1_ppm,
               round(avg(ln({_gmm_dens_sql("w.m1", "w.v1", "w.p1")}
                            + {_gmm_dens_sql("w.m2", "w.v2", "(1000000 - w.p1)")})),
                     6) + 0.0 AS loglik
        FROM gmm_pu CROSS JOIN gmm_w_{t} w
        GROUP BY w.m1, w.m2, w.v1, w.v2, w.p1
    )"""
        )
    return "".join(parts)


def _gmm_dens_col(x, m: int, v: int, p: int):
    """Spark twin of _gmm_dens_sql with the trained integer params inlined
    as literals (the broadcast-back-as-literals convention)."""
    mu = F.lit(m) / 1000000.0
    var = F.lit(v) / 1000000.0
    return (
        (F.lit(p) / 1000000.0)
        * F.exp(-F.pow(x - mu, F.lit(2.0)) / (2 * var))
        / F.sqrt(F.lit(GMM_TWO_PI) * var)
    )


def _gmm_params(spark: SparkSession, sf_dir: str):
    """Checkpoint the quality-score frame and run the GMM_ITERS quantized
    EM loop once per (session, sf_dir). Returns (pu, trajectory) where
    trajectory rows are (t, m1, m2, v1, v2, p1ppm, loglik) and
    trajectory[-1] carries the trained params."""
    from ..session import ensure_checkpoint_dir

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _GMM_FRAMES:
        return _GMM_FRAMES[key]
    ensure_checkpoint_dir(spark)
    d = load(spark, sf_dir, "documents")
    pu = d.select(
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' '))"
        ).alias("xppm")
    ).checkpoint(eager=True)
    base = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xppm").alias("sx"),
        F.sum(F.col("xppm") * F.col("xppm")).alias("sxx"),
    ).collect()[0]
    n, sx, sxx = base["n"], base["sx"], base["sxx"]
    m1, m2, v1, v2, p1 = GMM_MU1_0, GMM_MU2_0, GMM_VAR_0, GMM_VAR_0, GMM_PI1_0
    x = F.col("xppm") / 1000000.0
    traj = []

    def _e_exprs(mm1, mm2, vv1, vv2, pp1):
        a1 = _gmm_dens_col(x, mm1, vv1, pp1)
        a2 = _gmm_dens_col(x, mm2, vv2, 1000000 - pp1)
        r = a1 / (a1 + a2)
        return [
            F.sum(r).alias("sr"),
            F.sum(r * x).alias("srx"),
            F.sum(r * F.pow(x, F.lit(2.0))).alias("srxx"),
        ]

    def _ll_expr(mm1, mm2, vv1, vv2, pp1):
        b1 = _gmm_dens_col(x, mm1, vv1, pp1)
        b2 = _gmm_dens_col(x, mm2, vv2, 1000000 - pp1)
        return (F.round(F.avg(F.log(b1 + b2)), 6) + F.lit(0.0)).alias("ll")

    # The likelihood readout at the NEW params and the NEXT iteration's
    # E-step at those same params fuse into one aggregate pass over the
    # checkpointed score frame (guide §1.2: fewer full passes):
    # GMM_ITERS+1 jobs instead of 2*GMM_ITERS. Each float fold keeps its
    # own expression tree; the per-step quantizer absorbs fold-order noise
    # exactly as before.
    g = pu.agg(*_e_exprs(m1, m2, v1, v2, p1)).collect()[0]
    for t in range(1, GMM_ITERS + 1):
        sr, srx, srxx = g["sr"], g["srx"], g["srxx"]
        sr2 = n - sr
        srx2 = sx / 1000000.0 - srx
        srxx2 = sxx / 1000000000000.0 - srxx
        m1 = math.floor(srx / sr * 1000000 + 0.5)
        m2 = math.floor(srx2 / sr2 * 1000000 + 0.5)
        v1 = max(
            math.floor((srxx / sr - (srx / sr) ** 2) * 1000000 + 0.5),
            GMM_VAR_MIN_MICRO,
        )
        v2 = max(
            math.floor((srxx2 / sr2 - (srx2 / sr2) ** 2) * 1000000 + 0.5),
            GMM_VAR_MIN_MICRO,
        )
        p1 = min(
            max(math.floor(sr / n * 1000000 + 0.5), GMM_PI_MIN_PPM),
            1000000 - GMM_PI_MIN_PPM,
        )
        if t < GMM_ITERS:
            row = pu.agg(
                _ll_expr(m1, m2, v1, v2, p1), *_e_exprs(m1, m2, v1, v2, p1)
            ).collect()[0]
            ll = row["ll"]
            g = row
        else:
            ll = pu.agg(_ll_expr(m1, m2, v1, v2, p1)).collect()[0]["ll"]
        traj.append((t, m1, m2, v1, v2, p1, float(ll)))
    _GMM_FRAMES[key] = (pu, traj)
    return _GMM_FRAMES[key]


@query(
    "ml_gmm_quality",
    oracle=f"""
    WITH {_gmm_chain_sql()}
    {" UNION ALL ".join(f"SELECT * FROM gmm_m_{t}" for t in range(1, GMM_ITERS + 1))}
    """,
    tags=("analytics", "ml", "flagship"),
)
def ml_gmm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-component Gaussian-mixture EM TRAINED IN-ENGINE over per-doc
    quality scores — the iterative-training family's first UNSUPERVISED
    member (logreg = supervised, Bradley-Terry = pairwise, QC gate =
    supervised; this fits a density with no labels at all): which
    documents belong to the low-quality lobe of the lexical-diversity
    distribution, and with what posterior?

    The score is the BT/QC suite's exact lexical-diversity ppm
    (distinct-token share of tokens, integer in [0, 1e6]). Each EM step
    is rule-29 machinery end-to-end: the E-step responsibilities are
    float expressions of EXACT integer params (micro-unit means and
    variances, ppm mixing weight — broadcast back as literals), the
    M-step is ONE distributed aggregate whose three float folds
    (sum r, sum r*x, sum r*x^2; the complement sums derive exactly from
    the BIGINT corpus moments) quantize straight back to integers:
    mu' = floor(srx/sr * 1e6 + 0.5), var' floored at GMM_VAR_MIN_MICRO
    (the EM collapse guard), pi' clamped to [GMM_PI_MIN_PPM, 1-eps].
    Cross-engine fold noise dies at each step's quantizer, so the
    trajectory is a sequence of exact BIGINT 5-vectors and the DuckDB
    twin — one MATERIALIZED CTE per step, generated from the SAME Python
    constants as the Spark loop — replays the identical integer path.
    Per-iteration readout: the param vector plus the 6dp-rounded mean
    log-likelihood under the NEW params (the logreg readout convention);
    EM's monotone-ascent guarantee on it is property-pinned.

    Execution shape is the treeAggregate loop: the score frame is
    checkpointed once; each step is two aggregates over it (M-step fold +
    likelihood readout) with the driver holding O(params) = 5 integers.

    At 100 TB: the corpus pass is the checkpoint build; 2*GMM_ITERS
    partial aggregates over a 1-column BIGINT frame; driver state is 5
    integers. The trained params + score frame are memoized per
    (session, sf_dir) via _gmm_params, so corpus_gmm_posterior_sample
    rides the same training run."""
    _, traj = _gmm_params(spark, sf_dir)
    return spark.createDataFrame(
        traj,
        "iteration long, mu1_micro long, mu2_micro long, var1_micro long,"
        " var2_micro long, pi1_ppm long, loglik double",
    )


@query(
    "corpus_gmm_posterior_sample",
    oracle=f"""
    WITH {_gmm_chain_sql()},
    gmm_docs AS (
        SELECT source, text, {_GMM_XPPM_SQL} AS xppm FROM documents
    ),
    gmm_post AS (
        SELECT source,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               substr(md5(text), 1, 8) AS u_hex,
               floor({_gmm_dens_sql("w.m2", "w.v2", "(1000000 - w.p1)")}
                     / ({_gmm_dens_sql("w.m1", "w.v1", "w.p1")}
                        + {_gmm_dens_sql("w.m2", "w.v2", "(1000000 - w.p1)")})
                     * 1000000 + 0.5)::BIGINT AS post_ppm
        FROM gmm_docs CROSS JOIN gmm_w_{GMM_ITERS} w
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN u_hex < lpad(lower(to_hex(post_ppm * 4294967295
                                                   // 1000000)), 8, '0')
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN u_hex < lpad(lower(to_hex(post_ppm * 4294967295
                                                   // 1000000)), 8, '0')
                    THEN n_tokens ELSE 0 END)::BIGINT AS kept_tokens,
           (sum(post_ppm)::BIGINT // count(*)) AS mean_posterior_ppm
    FROM gmm_post GROUP BY source
    """,
    tags=("llm", "corpus", "ml"),
)
def corpus_gmm_posterior_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posterior-weighted corpus subsampling — the GMM consumer that turns
    the unsupervised fit into a SOFT quality gate (VERDICT r11 item 5):
    each document is kept with probability equal to its posterior of
    belonging to the HIGH-quality component, deterministically — the
    corpus_importance_sample draw (md5-of-content uniform, hex-string
    compare, no rand()) with the learned posterior as the weight. Where
    corpus_classifier_filter hard-gates on a supervised score, this
    downsamples in proportion to an unlabeled density fit — the
    importance-sampling shape a mixture-curation pipeline actually runs.

    Exactness: the posterior is quantized per-row to integer ppm
    (floor(a2/(a1+a2) * 1e6 + 0.5) of densities whose params are the
    memoized exact-BIGINT EM fit — the corpus_perplexity_filter
    convention), so the keep threshold post_ppm * (2^32-1) div 1e6 is
    exact integer arithmetic rendered as 8 hex digits, byte-identical in
    both engines; the readout's mean posterior is an exact integer ppm.

    At 100 TB: the training chain is memoized (one pass + param-sized
    aggregates); this op adds one corpus pass of per-row hashing and a
    (source)-partial aggregate — the shuffle carries source partials
    only."""
    _, traj = _gmm_params(spark, sf_dir)
    _, m1, m2, v1, v2, p1, _ = traj[-1]
    d = load(spark, sf_dir, "documents")
    x = (
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' '))"
        )
        / 1000000.0
    )
    a1 = _gmm_dens_col(x, m1, v1, p1)
    a2 = _gmm_dens_col(x, m2, v2, 1000000 - p1)
    post = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.substring(F.md5("text"), 1, 8).alias("u_hex"),
        F.floor(a2 / (a1 + a2) * 1000000 + 0.5).cast("long").alias("post_ppm"),
    )
    thr = F.lpad(
        F.lower(F.hex(F.expr("post_ppm * 4294967295 div 1000000"))), 8, "0"
    )
    keep = (F.col("u_hex") < thr).cast("long")
    return post.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep).alias("n_kept"),
        F.sum(F.col("n_tokens") * keep).alias("kept_tokens"),
        F.expr("sum(post_ppm) div count(1)").alias("mean_posterior_ppm"),
    )


@query(
    "stats_kendall_tau",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS x,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS y
        FROM events GROUP BY user_id
    ),
    cells AS (SELECT x, y, count(*)::BIGINT AS c FROM pu GROUP BY x, y),
    conc AS (
        SELECT COALESCE(sum(a.c * b.c), 0)::BIGINT AS cc
        FROM cells a JOIN cells b ON b.x < a.x AND b.y < a.y
    ),
    disc AS (
        SELECT COALESCE(sum(a.c * b.c), 0)::BIGINT AS dd
        FROM cells a JOIN cells b ON b.x < a.x AND b.y > a.y
    ),
    tx AS (
        SELECT sum(t * (t - 1) / 2)::BIGINT AS n1
        FROM (SELECT sum(c)::BIGINT AS t FROM cells GROUP BY x)
    ),
    ty AS (
        SELECT sum(t * (t - 1) / 2)::BIGINT AS n2
        FROM (SELECT sum(c)::BIGINT AS t FROM cells GROUP BY y)
    ),
    nn AS (SELECT sum(c)::BIGINT AS n, (sum(c) * (sum(c) - 1) / 2)::BIGINT AS n0
           FROM cells)
    SELECT nn.n, nn.n0 AS n_pairs, conc.cc AS concordant, disc.dd AS discordant,
           tx.n1 AS tied_x, ty.n2 AS tied_y,
           round((conc.cc - disc.dd)
                 / nullif(sqrt((nn.n0 - tx.n1)::DOUBLE * (nn.n0 - ty.n2)), 0),
                 6) + 0.0 AS tau_b
    FROM nn CROSS JOIN conc CROSS JOIN disc CROSS JOIN tx CROSS JOIN ty
    """,
    tags=("analytics", "stats"),
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b with tie correction — does engagement (per-user view
    count) CONCORDANTLY track clicks? The third association measure of the
    nonparametric suite (Pearson = linear, Spearman = monotone-via-ranks,
    Kendall = pairwise concordance — the most robust of the three and the
    one whose confidence behavior under ties is best understood).

    Exactness AND scale from the JOINT-SUPPORT decomposition (the
    stats_spearman support-histogram discipline taken to two dimensions):
    the corpus folds to one cell per distinct (views, clicks) pair, and
    concordant/discordant pair counts are exact BIGINT dominance sums
    over the CELL GRID — sum(a.c * b.c) over cells with b < a in both /
    opposite axes — never an O(n^2) user-pair enumeration. Tie terms n1 =
    sum t(t-1)/2 per marginal fold from the same cells. tau_b evaluates
    in the final 1-row float readout only (rules 1/6, 6dp).

    Both count variables are event-type tallies with a small bounded
    support (stated — the spearman bound convention), so the dominance
    self-join is a broadcast of a support-sized frame; at 100 TB the only
    corpus-sized work is the two partial aggs (user fold, cell fold)."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    cells = pu.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    conc = (
        a.join(
            F.broadcast(b),
            (F.col("bx") < F.col("ax")) & (F.col("by") < F.col("ay")),
        )
        .agg(F.coalesce(F.sum(F.col("ac") * F.col("bc")), F.lit(0)).alias("cc"))
    )
    disc = (
        a.join(
            F.broadcast(b),
            (F.col("bx") < F.col("ax")) & (F.col("by") > F.col("ay")),
        )
        .agg(F.coalesce(F.sum(F.col("ac") * F.col("bc")), F.lit(0)).alias("dd"))
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).alias("n1"))
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).alias("n2"))
    )
    nn = cells.agg(
        F.sum("c").alias("n"),
        F.expr("sum(c) * (sum(c) - 1) div 2").alias("n0"),
    )
    tau = (F.col("cc") - F.col("dd")) / F.nullif(
        F.sqrt(
            (F.col("n0") - F.col("n1")).cast("double")
            * (F.col("n0") - F.col("n2"))
        ),
        F.lit(0.0),
    )
    return (
        nn.crossJoin(F.broadcast(conc))
        .crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "n",
            F.col("n0").alias("n_pairs"),
            F.col("cc").alias("concordant"),
            F.col("dd").alias("discordant"),
            F.col("n1").alias("tied_x"),
            F.col("n2").alias("tied_y"),
            (F.round(tau, 6) + F.lit(0.0)).alias("tau_b"),
        )
    )


@query(
    "ml_gmm_bic",
    oracle=f"""
    WITH {_gmm_chain_sql()},
    bic_k1 AS (
        SELECT n.n,
               (n.sx // n.n)::BIGINT AS mu_micro,
               greatest(floor((n.sxx / 1000000000000.0 / n.n
                      - pow(n.sx / 1000000.0 / n.n, 2)) * 1000000
                     + 0.5)::BIGINT, 1) AS var_micro
        FROM gmm_n n
    ),
    bic_ll1 AS (
        SELECT k.n, k.mu_micro, k.var_micro,
               round(-(n.sxx / 1000000000000.0 / n.n
                       - 2 * (k.mu_micro / 1000000.0) * (n.sx / 1000000.0 / n.n)
                       + pow(k.mu_micro / 1000000.0, 2))
                     / (2 * (k.var_micro / 1000000.0))
                     - 0.5 * ln({GMM_TWO_PI} * (k.var_micro / 1000000.0)),
                     6) + 0.0 AS loglik1
        FROM bic_k1 k CROSS JOIN gmm_n n
    )
    SELECT l.n, l.mu_micro, l.var_micro, l.loglik1, m.loglik AS loglik2,
           round((2 * ln(l.n) - 2 * l.n * l.loglik1)
                 - (5 * ln(l.n) - 2 * l.n * m.loglik), 4) + 0.0 AS delta_bic
    FROM bic_ll1 l CROSS JOIN gmm_m_{GMM_ITERS} m
    """,
    tags=("analytics", "ml"),
)
def ml_gmm_bic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-order selection by BIC — is the 2-component quality mixture
    JUSTIFIED over a single Gaussian? The model-selection readout every
    density-based curation gate needs before trusting its posterior
    (a unimodal score distribution makes corpus_gmm_posterior_sample's
    soft gate a no-op, and BIC is the standard evidence): delta_bic =
    BIC(k=1) - BIC(k=2) with BIC = p*ln(n) - 2*n*avg_loglik, p = 2 vs 5
    free parameters; positive delta means the mixture earns its extra
    parameters.

    Exactness: the k=1 MLE derives from the EXACT BIGINT corpus moments
    (mu in integer micro via sx div n; variance single-step quantized
    from exact ints — no fold noise anywhere, both engines compute
    identical doubles), its mean log-likelihood has the closed quadratic
    form under the quantized params, and the k=2 likelihood is the
    memoized trajectory's final 6dp readout — so the comparison consumes
    only already-pinned quantities; the quantized k=1 variance floors at
    1 micro so a degenerate all-equal score column cannot divide by zero
    (GMM_VAR_MIN_MICRO's k=1 sibling). Readouts 6dp/4dp (rules 1/6).

    At 100 TB: zero additional corpus passes — one O(1) aggregate over
    the checkpointed score frame for the moments; the training cost was
    paid once by _gmm_params."""
    pu, traj = _gmm_params(spark, sf_dir)
    ll2 = traj[-1][6]
    base = pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xppm").alias("sx"),
        F.sum(F.col("xppm") * F.col("xppm")).alias("sxx"),
    ).collect()[0]
    n, sx, sxx = base["n"], base["sx"], base["sxx"]
    mu_micro = sx // n
    var_micro = max(
        math.floor((sxx / 1e12 / n - (sx / 1e6 / n) ** 2) * 1e6 + 0.5), 1
    )
    ll1 = round(
        -(
            sxx / 1e12 / n
            - 2 * (mu_micro / 1e6) * (sx / 1e6 / n)
            + (mu_micro / 1e6) ** 2
        )
        / (2 * (var_micro / 1e6))
        - 0.5 * math.log(GMM_TWO_PI * (var_micro / 1e6)),
        6,
    )
    delta = round(
        (2 * math.log(n) - 2 * n * ll1) - (5 * math.log(n) - 2 * n * ll2), 4
    )
    return spark.createDataFrame(
        [(n, mu_micro, var_micro, float(ll1), float(ll2), float(delta))],
        "n long, mu_micro long, var_micro long, loglik1 double,"
        " loglik2 double, delta_bic double",
    )


# --- round 12: Cox proportional hazards trained in-engine ---------------------

COX_ITERS = 5           # full-batch Newton-free ascent steps (unrolled twin)
COX_STEP_X1M = 200000   # lr * 1e6 => lr = 0.2 in the micro-unit quantizer

_COX_PU_SQL = """cox_pu AS MATERIALIZED (
        SELECT date_diff('day', first_day,
                         COALESCE(purch_day, last_day))::BIGINT AS dur,
               CASE WHEN purch_day IS NOT NULL THEN 1 ELSE 0 END AS ev,
               (views // 10 - 4)::BIGINT AS x
        FROM (
            SELECT user_id, min(date_trunc('day', ts)) AS first_day,
                   max(date_trunc('day', ts)) AS last_day,
                   min(CASE WHEN event_type = 'purchase'
                            THEN date_trunc('day', ts) END) AS purch_day,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views
            FROM events GROUP BY user_id
        )
    )"""


def _cox_chain_sql(iters: int = COX_ITERS, step_x1m: int = COX_STEP_X1M,
                   pu_with_sql: str = _COX_PU_SQL) -> str:
    """Generated chained-CTE twin of ml_cox_ph's ascent loop (rule 29):
    per step, per-duration exp(beta*x) partials, suffix-sum risk sets over
    the bounded duration support, one gradient fold, quantized beta update,
    and the mean partial log-likelihood readout under the NEW beta. All
    CTEs in the disjoint cox_ namespace; `pu_with_sql` must yield
    cox_pu(dur, ev, x) so the fuzzer can instantiate literal cohorts."""
    parts = [
        "WITH ",
        pu_with_sql,
        """,
    cox_ne AS (SELECT sum(ev)::BIGINT AS ne FROM cox_pu),
    cox_w_0 AS (SELECT 0::BIGINT AS bm)""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
    cox_cells_{t} AS (
        SELECT p.dur,
               sum(exp(w.bm * p.x / 1000000.0)) AS s0d,
               sum(p.x * exp(w.bm * p.x / 1000000.0)) AS s1d,
               sum(p.ev)::BIGINT AS d,
               sum(p.ev * p.x)::BIGINT AS sx
        FROM cox_pu p CROSS JOIN cox_w_{t - 1} w
        GROUP BY p.dur
    ),
    cox_risk_{t} AS (
        SELECT dur, d, sx,
               sum(s0d) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s0,
               sum(s1d) OVER (ORDER BY dur DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1
        FROM cox_cells_{t}
    ),
    cox_g_{t} AS (
        SELECT floor(sum(sx - d * s1 / s0) / ne.ne * {step_x1m}
                     + 0.5)::BIGINT AS gq
        FROM cox_risk_{t} CROSS JOIN cox_ne ne
        WHERE d > 0 GROUP BY ne.ne
    ),
    cox_w_{t} AS MATERIALIZED (
        SELECT (w.bm + g.gq)::BIGINT AS bm
        FROM cox_w_{t - 1} w CROSS JOIN cox_g_{t} g
    ),
    cox_cc_{t} AS (
        SELECT p.dur,
               sum(exp(w.bm * p.x / 1000000.0)) AS s0d,
               sum(p.ev)::BIGINT AS d,
               sum(p.ev * p.x)::BIGINT AS sx
        FROM cox_pu p CROSS JOIN cox_w_{t} w
        GROUP BY p.dur
    ),
    cox_m_{t} AS (
        SELECT {t}::BIGINT AS iteration, w.bm AS beta_micro, ne.ne AS n_events,
               round(sum((w.bm / 1000000.0) * r.sx - r.d * ln(r.s0)) / ne.ne,
                     6) + 0.0 AS loglik
        FROM (
            SELECT dur, d, sx,
                   sum(s0d) OVER (ORDER BY dur DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s0
            FROM cox_cc_{t}
        ) r CROSS JOIN cox_w_{t} w CROSS JOIN cox_ne ne
        WHERE r.d > 0
        GROUP BY w.bm, ne.ne
    )"""
        )
    return "".join(parts)


@query(
    "ml_cox_ph",
    oracle=_cox_chain_sql()
    + f"""
    {" UNION ALL ".join(f"SELECT * FROM cox_m_{t}" for t in range(1, COX_ITERS + 1))}
    """,
    tags=("analytics", "ml", "stats", "flagship"),
)
def ml_cox_ph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional-hazards regression TRAINED IN-ENGINE — the
    REGRESSION partner of stats_kaplan_meier on the identical cohort
    (the estimator/test pairing convention: KM says WHAT the survival
    curve is, Cox says which covariate MOVES the hazard and by how
    much): does engagement (centered view count) change churn risk?
    Breslow partial likelihood with tied event days, one covariate,
    full-batch gradient ascent.

    Survival frame: TIME TO FIRST PURCHASE — duration from a user's
    first active day to their first purchase day (event), censored at
    the last active day for users who never purchase (stated; the
    stats_kaplan_meier duration algebra pointed at conversion instead of
    churn, where the fixture cohort actually has events); covariate is
    the logreg suite's integer centering (views div 10 - 4) — does
    engagement accelerate conversion?

    The scale insight: risk sets never materialize. Each step folds the
    corpus to per-DURATION partials (sum exp(b*x), sum x*exp(b*x), event
    count/covariate sum) and the risk-set sums S0(t)/S1(t) are SUFFIX
    sums over the duration support — a window over a calendar-bounded
    frame (the stats_kaplan_meier cumulative construction run backward),
    never a per-user risk-set join. The gradient sum_t [sx_t - d_t *
    S1/S0] folds in the same support frame; beta is MICRO-QUANTIZED each
    step (floor(mean_grad * COX_STEP_X1M + 0.5) — rule 29), so the
    trajectory is exact BIGINTs and the generated chained-CTE twin
    replays the identical integer path. Per-iteration readout: beta,
    event count, and the 6dp mean partial log-likelihood under the NEW
    beta (ascent property-pinned).

    At 100 TB: one corpus pass builds the checkpointed user frame;
    each of COX_ITERS steps is two partial aggs to the |durations|-row
    support + O(1) driver state (one integer beta)."""
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    ev = load(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day"),
        F.max(F.date_trunc("day", "ts")).alias("last_day"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.date_trunc("day", "ts")
            )
        ).alias("purch_day"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "views"
        ),
    )
    pu = (
        spans.select(
            F.datediff(
                F.coalesce("purch_day", "last_day"), F.col("first_day")
            )
            .cast("long")
            .alias("dur"),
            F.when(F.col("purch_day").isNotNull(), 1).otherwise(0).alias("ev"),
            F.expr("views div 10 - 4").cast("long").alias("x"),
        )
        .checkpoint(eager=True)
    )
    ne = pu.agg(F.sum("ev")).collect()[0][0]
    if not ne:
        # Degenerate cohort (no purchase events anywhere): no partial
        # likelihood exists — emit an empty trajectory instead of
        # dividing by a zero event count (the _bt_strengths guard's
        # sibling; the oracle's per-step GROUP BY ne also yields no rows).
        return spark.createDataFrame(
            [], "iteration long, beta_micro long, n_events long, loglik double"
        )
    wsuf = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bm = 0
    out = []

    def _risk(bmv):
        eta = F.exp(F.lit(bmv) * F.col("x") / 1000000.0)
        cells = pu.groupBy("dur").agg(
            F.sum(eta).alias("s0d"),
            F.sum(F.col("x") * eta).alias("s1d"),
            F.sum("ev").alias("d"),
            F.sum(F.col("ev") * F.col("x")).alias("sx"),
        )
        return cells.select(
            "dur",
            "d",
            "sx",
            F.sum("s0d").over(wsuf).alias("s0"),
            F.sum("s1d").over(wsuf).alias("s1"),
        ).filter(F.col("d") > 0)

    _g_expr = F.sum(
        F.col("sx") - F.col("d") * F.col("s1") / F.col("s0")
    ).alias("g")

    def _ll_expr(bmv):
        return (
            F.round(
                F.sum(
                    (F.lit(bmv) / 1000000.0) * F.col("sx")
                    - F.col("d") * F.log("s0")
                )
                / F.lit(ne),
                6,
            )
            + F.lit(0.0)
        ).alias("ll")

    # The log-likelihood readout at the UPDATED beta and the next step's
    # gradient at that same beta share one risk-set pass (per-dur eta
    # cells + suffix window), so they fuse into a single job (guide §1.2):
    # COX_ITERS+1 risk-set passes instead of 2*COX_ITERS. Each float fold
    # keeps its own expression tree (adding s1d to the ll pass's groupBy
    # changes no other column), and the per-step quantizer absorbs fold
    # order as before.
    g = _risk(bm).agg(_g_expr).collect()[0]["g"]
    for t in range(1, COX_ITERS + 1):
        bm += math.floor(g / ne * COX_STEP_X1M + 0.5)
        if t < COX_ITERS:
            row = _risk(bm).agg(_ll_expr(bm), _g_expr).collect()[0]
            ll, g = row["ll"], row["g"]
        else:
            ll = _risk(bm).agg(_ll_expr(bm)).collect()[0]["ll"]
        out.append((t, bm, ne, float(ll)))
    return spark.createDataFrame(
        out, "iteration long, beta_micro long, n_events long, loglik double"
    )


@query(
    "stats_g_test",
    oracle="""
    WITH cells AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
               count(*)::BIGINT AS o
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY seg, pri
    ),
    margins AS (
        SELECT seg, pri, o,
               sum(o) OVER (PARTITION BY seg) AS row_tot,
               sum(o) OVER (PARTITION BY pri) AS col_tot,
               sum(o) OVER () AS n
        FROM cells
    ),
    folded AS (
        SELECT count(*)::BIGINT AS n_cells,
               any_value(n)::BIGINT AS n,
               (count(DISTINCT seg) - 1) * (count(DISTINCT pri) - 1)
                   AS dof,
               least(count(DISTINCT seg), count(DISTINCT pri)) - 1 AS minrc,
               sum(2.0 * o * ln(o / (row_tot * col_tot / (n * 1.0)))) AS g,
               sum(pow(o - row_tot * col_tot / (n * 1.0), 2)
                   / (row_tot * col_tot / (n * 1.0))) AS chi2
        FROM margins
    )
    SELECT n_cells, n, dof,
           round(g, 4) + 0.0 AS g_stat,
           round(sqrt(chi2 / (n * greatest(minrc, 1))), 6) + 0.0 AS cramers_v
    FROM folded
    """,
    tags=("analytics", "stats"),
)
def stats_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood-ratio chi-square) with Cramér's V effect
    size over the market-segment × order-priority contingency — the
    information-theoretic sibling of stats_chi2_independence (G = 2 sum
    O ln(O/E) is additive under table partitioning and is 2N times the
    mutual information, which Pearson's X² only approximates) plus the
    EFFECT SIZE the test alone omits: V = sqrt(X²/(N·(min(r,c)−1))), so
    a huge-N significant-but-tiny association reads as the tiny V it is.

    Exactness: observed cells and all margins are exact BIGINT partials
    (margin windows over the |segments|×|priorities|-bounded cell frame);
    G, X² and V evaluate in the 1-row fold only (rules 1/6, 4dp/6dp).
    Zero cells never enter (GROUP BY emits observed cells only — the
    G-test convention; expected counts are all positive).

    At 100 TB: one broadcast-joined partial agg to the bounded cell
    frame; everything after is cell-count-sized."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cells = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    margins = cells.select(
        "seg",
        "pri",
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("pri")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / (F.col("n") * 1.0)
    folded = margins.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.any_value("n").alias("n"),
        (
            (F.count_distinct("seg") - 1) * (F.count_distinct("pri") - 1)
        ).alias("dof"),
        (
            F.least(F.count_distinct("seg"), F.count_distinct("pri")) - 1
        ).alias("minrc"),
        F.sum(2.0 * F.col("o") * F.log(F.col("o") / e)).alias("g"),
        F.sum(F.pow(F.col("o") - e, F.lit(2.0)) / e).alias("chi2"),
    )
    return folded.select(
        "n_cells",
        "n",
        "dof",
        (F.round(F.col("g"), 4) + F.lit(0.0)).alias("g_stat"),
        (
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * F.greatest(F.col("minrc"), F.lit(1)))
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("cramers_v"),
    )


# --- round 12: multi-epoch mix annealing ---------------------------------------

ANNEAL_EPOCHS = 4  # epoch 0 = pure BT mix, last epoch = uniform (stated)


def _mix_anneal_oracle_sql() -> str:
    return (
        _bt_chain_sql()
        + f""",
    an_wq AS (
        SELECT item, floor(exp(sm / 1000000.0) * 1000000)::BIGINT AS w_x1m
        FROM s_{BT_ITERS}
    ),
    an_tot AS (SELECT sum(w_x1m)::BIGINT AS tw, count(*)::BIGINT AS k
               FROM an_wq),
    an_mix AS (
        SELECT item AS source,
               (w_x1m * 1000000 // t.tw)::BIGINT AS mix_ppm,
               (1000000 // t.k)::BIGINT AS uni_ppm
        FROM an_wq CROSS JOIN an_tot t
    ),
    an_epochs AS (SELECT unnest(generate_series(0, {ANNEAL_EPOCHS - 1})) AS epoch)
    SELECT e.epoch::BIGINT AS epoch, m.source,
           ((m.mix_ppm * ({ANNEAL_EPOCHS - 1} - e.epoch)
             + m.uni_ppm * e.epoch)
            // {ANNEAL_EPOCHS - 1})::BIGINT AS weight_ppm
    FROM an_mix m CROSS JOIN an_epochs e"""
    )


@query(
    "corpus_mix_anneal",
    oracle=_mix_anneal_oracle_sql(),
    tags=("llm", "corpus", "ml"),
)
def corpus_mix_anneal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch mix annealing schedule — the curriculum move a
    multi-epoch training run applies to corpus_reward_mix's weights:
    epoch 0 trains on the pure BT-preference mix (exploit the reward
    signal), the final epoch on the uniform mix (cover every source),
    with LINEAR interpolation between (stated; corpus_epoch_schedule
    orders documents within an epoch, this plans the mix ACROSS epochs).

    Exactness: the interpolation is pure integer arithmetic on the
    memoized mix ppm in the NON-NEGATIVE form w_e = (mix*(E-1-e) +
    uniform*e) div (E-1) — every operand positive, because Python/Spark
    floor negative quotients while DuckDB truncates them (found live by
    this op's first parity drive; the subtractive form was off by one
    ppm wherever mix > uniform). Every scheduled weight is an exact
    BIGINT on both engines; floor division makes intermediate epochs sum
    to slightly under 1e6 ppm, the corpus_reward_mix convention
    (stated).

    At 100 TB: |sources| x |epochs| rows of driver-side arithmetic on
    the memoized fit; zero corpus passes."""
    _, items, s, _ = _bt_strengths(spark, sf_dir)
    wq = {it: math.floor(math.exp(s[it] / 1e6) * 1e6) for it in items}
    tw = sum(wq.values())
    k = len(items)
    rows = []
    for e in range(ANNEAL_EPOCHS):
        for it in items:
            mix = wq[it] * 1_000_000 // tw
            uni = 1_000_000 // k
            rows.append(
                (
                    e,
                    it,
                    (mix * (ANNEAL_EPOCHS - 1 - e) + uni * e)
                    // (ANNEAL_EPOCHS - 1),
                )
            )
    return spark.createDataFrame(
        rows, "epoch long, source string, weight_ppm long"
    )


# --- round 12: closed-form ridge regression ------------------------------------

RIDGE_LAMBDA_X1M = 2_000_000  # lambda = 2.0 in micro-units (stated; the
                              # intercept is conventionally unpenalized)

_RIDGE_SOLVE_SQL = f"""
    rr_pu AS (
        SELECT (sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                - 13)::BIGINT AS x1,
               (sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                - 13)::BIGINT AS x2,
               sum(CASE WHEN event_type = 'purchase'
                        THEN floor(value * 100 + 0.5)::BIGINT
                        ELSE 0 END)::BIGINT AS y
        FROM events GROUP BY user_id
    ),
    rr_m AS (
        SELECT count(*)::BIGINT AS n,
               sum(x1)::BIGINT AS s1, sum(x2)::BIGINT AS s2,
               sum(x1 * x1)::BIGINT AS s11, sum(x2 * x2)::BIGINT AS s22,
               sum(x1 * x2)::BIGINT AS s12,
               sum(y)::BIGINT AS sy, sum(x1 * y)::BIGINT AS s1y,
               sum(x2 * y)::BIGINT AS s2y, sum(y * y)::BIGINT AS syy
        FROM rr_pu
    ),
    rr_w AS (
        SELECT *,
               (n + 0.0) * ((s11 + lam) * (s22 + lam) - (s12 + 0.0) * s12)
               - (s1 + 0.0) * ((s1 + 0.0) * (s22 + lam) - (s12 + 0.0) * s2)
               + (s2 + 0.0) * ((s1 + 0.0) * s12 - (s11 + lam) * s2) AS det,
               (sy + 0.0) * ((s11 + lam) * (s22 + lam) - (s12 + 0.0) * s12)
               - (s1 + 0.0) * ((s1y + 0.0) * (s22 + lam) - (s12 + 0.0) * s2y)
               + (s2 + 0.0) * ((s1y + 0.0) * s12 - (s11 + lam) * s2y) AS det0,
               (n + 0.0) * ((s1y + 0.0) * (s22 + lam) - (s2y + 0.0) * s12)
               - (sy + 0.0) * ((s1 + 0.0) * (s22 + lam) - (s12 + 0.0) * s2)
               + (s2 + 0.0) * ((s1 + 0.0) * s2y - (s1y + 0.0) * s2) AS det1,
               (n + 0.0) * ((s11 + lam) * s2y - (s12 + 0.0) * s1y)
               - (s1 + 0.0) * ((s1 + 0.0) * s2y - (s1y + 0.0) * s2)
               + (sy + 0.0) * ((s1 + 0.0) * s12 - (s11 + lam) * s2) AS det2
        FROM (SELECT *, {RIDGE_LAMBDA_X1M} / 1000000.0 AS lam FROM rr_m)
    ),
    rr_fit AS (
        SELECT n, syy, sy,
               det0 / det AS w0, det1 / det AS w1, det2 / det AS w2,
               syy + (det0 / det) * (det0 / det) * n
                   + (det1 / det) * (det1 / det) * s11
                   + (det2 / det) * (det2 / det) * s22
                   - 2 * (det0 / det) * sy
                   - 2 * (det1 / det) * s1y
                   - 2 * (det2 / det) * s2y
                   + 2 * (det0 / det) * (det1 / det) * s1
                   + 2 * (det0 / det) * (det2 / det) * s2
                   + 2 * (det1 / det) * (det2 / det) * s12 AS rss
        FROM rr_w
    )"""


@query(
    "ml_ridge_regression",
    oracle="WITH" + _RIDGE_SOLVE_SQL + """
    SELECT n,
           round(w0, 6) + 0.0 AS w_intercept,
           round(w1, 6) + 0.0 AS w_views,
           round(w2, 6) + 0.0 AS w_clicks,
           round(1.0 - rss / nullif(syy - sy / (n * 1.0) * sy, 0), 6) + 0.0
               AS r2
    FROM rr_fit
    """,
    tags=("analytics", "ml"),
)
def ml_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression SOLVED IN CLOSED FORM — the trainer family's
    zero-iteration member (logreg/BT/QC/GMM/Cox iterate; ridge's normal
    equations (X'X + lambda*I_feat) w = X'y need only the ten exact
    moment sums, so the whole fit is ONE distributed aggregate + a 3x3
    Cramer solve in the readout row): does engagement (centered views,
    clicks) linearly predict spend cents, with an L2 penalty on the
    slopes (intercept unpenalized — the standard convention, stated)?

    Exactness: all ten moments are exact BIGINT partials; the
    determinant expansions and RSS quadratic form are deterministic
    float arithmetic over those exact integers — identical on both
    engines with no fold-order anywhere (the ts_granger_lag1 discipline
    one matrix-order up); readouts 6dp (rules 1/6). R^2 is reported
    against the unpenalized TSS (stated).

    At 100 TB: one partial agg over the user frame; the solve is O(1).
    p features cost a p^2-moment fold and a p^3 driver solve — the
    classical big-data regression recipe (normal equations beat SGD
    until p^2 outgrows memory)."""
    ev = load(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)) - 13
        ).alias("x1"),
        (
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)) - 13
        ).alias("x2"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            ).otherwise(0)
        ).alias("y"),
    )
    return ridge_readout(ridge_moments(pu))


def ridge_moments(pu: DataFrame) -> DataFrame:
    """Fold a (x1, x2, y) frame to the ten exact ridge moments."""
    return pu.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )


def ridge_readout(m: DataFrame) -> DataFrame:
    """Shared Cramer solve + RSS readout over a 1-row moment frame — ONE
    code path for ml_ridge_regression and its streaming twin."""
    lam = RIDGE_LAMBDA_X1M / 1000000.0
    n, s1, s2 = F.col("n") + 0.0, F.col("s1") + 0.0, F.col("s2") + 0.0
    s11, s22, s12 = F.col("s11") + lam, F.col("s22") + lam, F.col("s12") + 0.0
    sy, s1y, s2y = F.col("sy") + 0.0, F.col("s1y") + 0.0, F.col("s2y") + 0.0
    det = (
        n * (s11 * s22 - s12 * F.col("s12"))
        - s1 * (s1 * s22 - s12 * F.col("s2"))
        + s2 * (s1 * s12 - s11 * F.col("s2"))
    )
    det0 = (
        sy * (s11 * s22 - s12 * F.col("s12"))
        - s1 * (s1y * s22 - s12 * F.col("s2y"))
        + s2 * (s1y * s12 - s11 * F.col("s2y"))
    )
    det1 = (
        n * (s1y * s22 - s2y * F.col("s12"))
        - sy * (s1 * s22 - s12 * F.col("s2"))
        + s2 * (s1 * F.col("s2y") - s1y * F.col("s2"))
    )
    det2 = (
        n * (s11 * s2y - s12 * F.col("s1y"))
        - s1 * (s1 * F.col("s2y") - s1y * F.col("s2"))
        + sy * (s1 * s12 - s11 * F.col("s2"))
    )
    w0, w1, w2 = det0 / det, det1 / det, det2 / det
    rss = (
        F.col("syy")
        + w0 * w0 * F.col("n")
        + w1 * w1 * F.col("s11")
        + w2 * w2 * F.col("s22")
        - 2 * w0 * F.col("sy")
        - 2 * w1 * F.col("s1y")
        - 2 * w2 * F.col("s2y")
        + 2 * w0 * w1 * F.col("s1")
        + 2 * w0 * w2 * F.col("s2")
        + 2 * w1 * w2 * F.col("s12")
    )
    tss = F.col("syy") - F.col("sy") / (F.col("n") * 1.0) * F.col("sy")
    return m.select(
        "n",
        (F.round(w0, 6) + F.lit(0.0)).alias("w_intercept"),
        (F.round(w1, 6) + F.lit(0.0)).alias("w_views"),
        (F.round(w2, 6) + F.lit(0.0)).alias("w_clicks"),
        (F.round(1.0 - rss / F.nullif(tss, F.lit(0.0)), 6) + F.lit(0.0)).alias(
            "r2"
        ),
    )
