"""Cross-operator invariants for the round-6 continuation wave.

Each test pins a mathematical identity BETWEEN two independently-oracled
operators (the BFS/closeness discipline): a regression in either
implementation breaks the identity even if both still match their own
DuckDB twins on some future fixture drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rvi_big_data_api_spark.registry import REGISTRY


def _df(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_triangle_corner_sum_is_three_per_triangle(spark, sf_dir):
    """Every triangle has exactly 3 corners: per label,
    sum(graph_clustering_coefficient.n_tri) == 3 * n_triangles from
    graph_triangle_count."""
    corners = (
        _df("graph_clustering_coefficient", spark, sf_dir)
        .groupBy("label")
        .agg(F.sum("n_tri").alias("corner_sum"))
    )
    tri = _df("graph_triangle_count", spark, sf_dir).select("label", "n_triangles")
    joined = {r["label"]: (r["corner_sum"], r["n_triangles"]) for r in
              corners.join(tri, "label").collect()}
    assert joined, "no labels compared"
    for label, (corner_sum, n_tri) in joined.items():
        assert corner_sum == 3 * n_tri, (label, corner_sum, n_tri)


def test_assortativity_edges_match_triangle_count_edges(spark, sf_dir):
    """graph_assortativity and graph_triangle_count enumerate the SAME
    pair list, so per-label undirected edge counts must agree."""
    a = {r["label"]: r["n_edges"] for r in
         _df("graph_assortativity", spark, sf_dir).collect()}
    t = {r["label"]: r["n_edges"] for r in
         _df("graph_triangle_count", spark, sf_dir).collect()}
    assert a == t, (a, t)


def test_decomposition_components_recompose(spark, sf_dir):
    """ts_decompose_classical: wherever trend is defined,
    xc == trend + seasonal + residual EXACTLY (all-integer identity)."""
    rows = _df("ts_decompose_classical", spark, sf_dir).collect()
    defined = [r for r in rows if r["trend"] is not None]
    assert defined, "no full-window rows"
    for r in defined:
        assert r["xc"] == r["trend"] + r["seasonal"] + r["residual"], r
    # edge rows (partial window) carry NULL seasonal/residual too
    for r in rows:
        if r["trend"] is None:
            assert r["seasonal"] is None and r["residual"] is None, r


def test_threshold_sweep_is_monotone_and_anchored(spark, sf_dir):
    """dedup_threshold_sweep: per label, pair counts are non-increasing
    in tau (a count that rises with a stricter threshold is impossible)."""
    rows = _df("dedup_threshold_sweep", spark, sf_dir).collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["label"], {})[r["tau_x100"]] = r["n_pairs"]
    assert by_label
    for label, curve in by_label.items():
        taus = sorted(curve)
        for lo, hi in zip(taus, taus[1:]):
            assert curve[lo] >= curve[hi], (label, curve)


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    """stats_bootstrap_ci: lo <= mid <= hi, and the full-data mean falls
    inside the 95% interval on this fixture (B=32 Poisson replicates of
    a 15k-row mean are far tighter than the interval width)."""
    r = _df("stats_bootstrap_ci", spark, sf_dir).collect()[0]
    assert r["ci_lo_cents"] <= r["ci_mid_cents"] <= r["ci_hi_cents"], r
    assert r["ci_lo_cents"] <= r["mean_full_cents"] <= r["ci_hi_cents"], r


def test_levene_and_anova_share_support(spark, sf_dir):
    """stats_levene and stats_anova_oneway run on the same segmentation:
    k, n and both df columns must be identical."""
    a = _df("stats_anova_oneway", spark, sf_dir).collect()[0]
    l = _df("stats_levene", spark, sf_dir).collect()[0]
    for col in ("k", "n", "df_between", "df_within"):
        assert a[col] == l[col], (col, a[col], l[col])


def test_pop_growth_recomputes_from_series(spark, sf_dir):
    """ts_period_over_period: dod_ppm re-derives exactly from consecutive
    rev_cents (integer identity), and the first row has NULL growth."""
    rows = sorted(
        _df("ts_period_over_period", spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    assert rows[0]["dod_ppm"] is None and rows[0]["wow_ppm"] is None
    for prev, cur in zip(rows, rows[1:]):
        if prev["rev_cents"] != 0:
            want = (cur["rev_cents"] - prev["rev_cents"]) * 1_000_000
            # Spark/DuckDB div truncates toward zero; compute the expected
            # quotient in pure integer math (ADVICE r6: float division here
            # goes off-by-one once |want| approaches 2^53 at bigger SF).
            q_mag = abs(want) // abs(prev["rev_cents"])
            q = q_mag if (want >= 0) == (prev["rev_cents"] > 0) else -q_mag
            assert cur["dod_ppm"] == q, (prev, cur, q)


def test_fairness_counts_are_consistent(spark, sf_dir):
    """eval_fairness_report: per cohort, tp <= n_pos, fp <= n_neg,
    selected == tp + fp, n == n_pos + n_neg, and disparate_impact_ppm ==
    1_000_000 for exactly the cohorts sharing the max sel_ppm (one
    reference cohort unless sel_ppm ties)."""
    rows = _df("eval_fairness_report", spark, sf_dir).collect()
    assert len(rows) == 4
    # DI == 1_000_000 exactly for the cohorts sharing the max sel_ppm (ppm
    # ties each become a reference cohort; ADVICE r6 — assert the exact
    # count, not just >= 1, so a regression emitting extra 1.0 DIs fails).
    max_sel = max(r["sel_ppm"] for r in rows)
    n_ref = sum(1 for r in rows if r["sel_ppm"] == max_sel)
    assert (
        sum(1 for r in rows if r["disparate_impact_ppm"] == 1_000_000) == n_ref
    ), rows
    for r in rows:
        n_neg = r["n"] - r["n_pos"]
        assert r["tp"] <= r["n_pos"] and r["fp"] <= n_neg, r
        assert r["selected"] == r["tp"] + r["fp"], r


def test_mmr_first_pick_is_plain_top1(spark, sf_dir):
    """eval_mmr_diversify rank-1 equals exact top-1 by relevance — MMR
    only re-ranks from the second pick onward."""
    from rvi_big_data_api_spark.operators.llm_sim import MMR_NQUERIES

    mmr1 = {
        r["qid"]: r["vec_id"]
        for r in _df("eval_mmr_diversify", spark, sf_dir).collect()
        if r["rank"] == 1
    }
    assert len(mmr1) == MMR_NQUERIES
    # independent exact top-1 via sim_topk-style brute force
    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.llm_sim import dot
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < MMR_NQUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    w = Window.partitionBy("qid").orderBy(F.col("d").desc(), F.col("vec_id").asc())
    top1 = {
        r["qid"]: r["vec_id"]
        for r in (
            e.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("d"))
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .collect()
        )
    }
    assert mmr1 == top1, (mmr1, top1)


def test_jsd_drift_totals_and_bounds(spark, sf_dir):
    """text_jsd_drift: jsd_total equals the sum of jsd_term (within
    rounding slack) and sits in [0, ln 2]; token support is preserved
    (sum n_ref + n_cur == total tokens)."""
    import math

    rows = _df("text_jsd_drift", spark, sf_dir).collect()
    total = rows[0]["jsd_total"]
    assert all(abs(r["jsd_total"] - total) < 1e-9 for r in rows)
    assert -1e-6 <= total <= math.log(2) + 1e-6, total
    term_sum = sum(r["jsd_term"] for r in rows)
    assert abs(term_sum - total) <= len(rows) * 5e-7 + 1e-9, (term_sum, total)


def test_auc_recomposes_from_roc_curve(spark, sf_dir):
    """eval_auc_trapezoid must equal the trapezoid integral of
    eval_roc_curve's (fpr, tpr) points (same support, independently
    computed; curve emits 4-dp-rounded rates, so tolerance is the
    accumulated rounding slack)."""
    curve = sorted(
        _df("eval_roc_curve", spark, sf_dir).collect(),
        key=lambda r: (r["fpr"], r["tpr"]),
    )
    auc = 0.0
    prev_f, prev_t = 0.0, 0.0
    for r in curve:
        auc += (r["fpr"] - prev_f) * (r["tpr"] + prev_t) / 2.0
        prev_f, prev_t = r["fpr"], r["tpr"]
    got = _df("eval_auc_trapezoid", spark, sf_dir).collect()[0]
    assert abs(got["auc_ppm"] / 1e6 - auc) < len(curve) * 1e-4 + 1e-6, (
        got["auc_ppm"],
        auc,
    )
