"""Cross-operator and structural invariants for the round-7 wave.

Same discipline as tests/test_continuation_properties.py: each test pins a
mathematical identity the oracle compare alone can't see — either BETWEEN
two independently-oracled operators, or a law internal to one operator
(Bloom's no-false-negative guarantee, CMS's one-sided error, the
changeset-apply law) that must hold on ANY fixture, not just this one.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rvi_big_data_api_spark.registry import REGISTRY


def _df(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_countmin_never_undercounts(spark, sf_dir):
    """CMS point estimates are one-sided: cms_n >= true_n for EVERY probe
    (collisions add counts, never remove them), and at least one probe
    exists. The fixture's w << n_keys sizing should also produce at least
    one genuine over-estimate — otherwise the error column is untested."""
    rows = _df("agg_countmin", spark, sf_dir).collect()
    assert rows, "no probes"
    for r in rows:
        assert r["cms_n"] >= r["true_n"], r
        assert r["over_n"] == r["cms_n"] - r["true_n"], r
    assert any(r["over_n"] > 0 for r in rows), (
        "no collisions observed — CMS_W is too wide for the fixture to "
        "exercise the over-estimate path"
    )


def test_bloom_no_false_negatives_and_counts_reconcile(spark, sf_dir):
    """Bloom's structural guarantee: a true member can never probe
    negative (every one of its k positions was set at build time), so
    n_false_neg == 0 identically; positives split exactly into members +
    false positives; and the filter actually saturates enough to emit a
    measured false positive (else fp_ppm is untested)."""
    from rvi_big_data_api_spark.operators.aggregates import BLOOM_K, BLOOM_M, BLOOM_MEMBERS

    r = _df("agg_bloom_filter", spark, sf_dir).collect()[0]
    assert r["n_false_neg"] == 0, r
    assert r["n_bloom_pos"] == r["n_members"] + r["n_false_pos"], r
    assert r["n_members"] == min(BLOOM_MEMBERS, r["n_probed"]), r
    assert 0 < r["bits_set"] <= min(BLOOM_M, BLOOM_K * BLOOM_MEMBERS), r
    assert r["n_false_pos"] > 0, (
        "no false positives — BLOOM_M is too large for the fixture to "
        "exercise the error-measurement path"
    )


def test_snapshot_diff_apply_law(spark, sf_dir):
    """Applying the derived changeset to snapshot A reproduces snapshot B
    exactly — the law that makes a snapshot diff a CDC feed. Recomputes
    both snapshots independently of the operator and replays inserts/
    updates/deletes over A."""
    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.telemetry import (
        SNAPDIFF_T1,
        SNAPDIFF_T2,
        SNAPDIFF_WIN,
    )

    ev = load(spark, sf_dir, "events")

    def snap(t):
        rows = (
            ev.filter((F.dayofmonth("ts") >= t - SNAPDIFF_WIN) & (F.dayofmonth("ts") < t))
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("rev"),
            )
            .collect()
        )
        return {r["user_id"]: (r["n"], r["rev"]) for r in rows}

    a, b = snap(SNAPDIFF_T1), snap(SNAPDIFF_T2)
    state = dict(a)
    changes = _df("cdc_snapshot_diff", spark, sf_dir).collect()
    assert changes, "empty changeset"
    for ch in changes:
        k = ch["user_id"]
        if ch["change_type"] == "delete":
            assert k in state and ch["new_n"] is None, ch
            del state[k]
        elif ch["change_type"] == "insert":
            assert k not in state and ch["old_n"] is None, ch
            state[k] = (ch["new_n"], ch["new_rev_cents"])
        else:
            assert k in state and state[k] == (ch["old_n"], ch["old_rev_cents"]), ch
            assert (ch["new_n"], ch["new_rev_cents"]) != (ch["old_n"], ch["old_rev_cents"]), (
                "phantom update",
                ch,
            )
            state[k] = (ch["new_n"], ch["new_rev_cents"])
    assert state == b, "applying the changeset to A did not reproduce B"


def test_incremental_merge_is_shard_count_invariant(spark, sf_dir):
    """The merge law: re-aggregating per-shard partials equals the direct
    computation for ANY shard count — checked here by comparing the
    registered 3-shard op against an independent direct groupBy."""
    from rvi_big_data_api_spark.io import load

    direct = (
        load(spark, sf_dir, "events")
        .select(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("rev_cents"),
            F.min("cents").alias("vmin_cents"),
            F.max("cents").alias("vmax_cents"),
        )
        .collect()
    )
    want = {(r["day"], r["event_type"]): (r["n"], r["rev_cents"], r["vmin_cents"], r["vmax_cents"]) for r in direct}
    got_rows = _df("agg_incremental_merge", spark, sf_dir).collect()
    got = {(r["day"], r["event_type"]): (r["n"], r["rev_cents"], r["vmin_cents"], r["vmax_cents"]) for r in got_rows}
    assert got == want


def test_kruskal_tie_correction_inflates_h(spark, sf_dir):
    """With ties present the correction factor C = 1 - sum(t^3-t)/(N^3-N)
    is strictly < 1, so h_corrected > h_stat; with no ties they are
    equal. Also H must be non-negative up to the 4-dp rounding grain."""
    r = _df("stats_kruskal_wallis", spark, sf_dir).collect()[0]
    assert r["h_stat"] >= -0.0001, r
    if r["n_tied_values"] > 0:
        assert r["h_corrected"] >= r["h_stat"], r
    else:
        assert r["h_corrected"] == r["h_stat"], r


def test_woe_totals_and_sign_convention(spark, sf_dir):
    """Segment counts sum to the customer-table row count (left join keeps
    order-less customers), n = n_pos + n_neg per segment, and WOE is
    positive exactly for segments whose smoothed positive share exceeds
    their smoothed negative share."""
    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.ml_eval import WOE_PRIOR

    rows = _df("feature_woe", spark, sf_dir).collect()
    n_cust = load(spark, sf_dir, "customer").count()
    assert sum(r["n"] for r in rows) == n_cust
    pos_tot = sum(r["n_pos"] for r in rows)
    neg_tot = sum(r["n_neg"] for r in rows)
    for r in rows:
        assert r["n"] == r["n_pos"] + r["n_neg"], r
        share_pos = (r["n_pos"] + WOE_PRIOR) / (pos_tot + WOE_PRIOR)
        share_neg = (r["n_neg"] + WOE_PRIOR) / (neg_tot + WOE_PRIOR)
        if share_pos > share_neg:
            assert r["woe"] >= 0, r
        else:
            assert r["woe"] <= 0, r


def test_suppression_enforces_k_and_conserves_docs(spark, sf_dir):
    """Every RELEASED class (gen_level <= 1) satisfies k-anonymity; the
    three levels together conserve the corpus row count; and released
    classes never overlap (a (source, lang) pair coarsened at level 1 has
    no level-0 row for the same size_band it merged)."""
    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.llm_text import K_ANON_K

    rows = _df("privacy_suppression", spark, sf_dir).collect()
    released = [r for r in rows if r["gen_level"] <= 1]
    assert released, "nothing released"
    for r in released:
        assert r["n_docs"] >= K_ANON_K, r
    total = sum(r["n_docs"] for r in rows)
    assert total == load(spark, sf_dir, "documents").count()
    # the audit op must agree: level-0 classes are exactly the non-violating
    # groups of privacy_k_anonymity
    audit = _df("privacy_k_anonymity", spark, sf_dir).collect()
    ok_groups = {
        (r["source"], r["lang"], r["size_band"])
        for r in audit
        if not r["violates_k"]
    }
    lvl0 = {(r["source"], r["lang"], r["size_band"]) for r in rows if r["gen_level"] == 0}
    assert lvl0 == ok_groups


def test_dbscan_grid_clusters_are_dense_and_connected(spark, sf_dir):
    """Every emitted cell is core (n_pts >= MINPTS); cluster aggregates
    reconcile with their members; and 8-adjacent core cells always share
    a cluster id (the defining property of the grid components)."""
    from rvi_big_data_api_spark.operators.telemetry import DBSCAN_MINPTS

    rows = _df("geo_dbscan_grid", spark, sf_dir).collect()
    assert rows, "no core cells"
    by_cluster = {}
    cell = {}
    for r in rows:
        assert r["n_pts"] >= DBSCAN_MINPTS, r
        by_cluster.setdefault(r["cluster_id"], []).append(r)
        cell[(r["lat_cell"], r["lon_cell"])] = r["cluster_id"]
    for cid, members in by_cluster.items():
        assert all(m["cluster_cells"] == len(members) for m in members), cid
        pts = sum(m["n_pts"] for m in members)
        assert all(m["cluster_pts"] == pts for m in members), cid
        # cluster id is the min packed key of its members
        from rvi_big_data_api_spark.operators.telemetry import (
            _DB_LAT_OFF,
            _DB_LON_OFF,
            _DB_PACK,
        )

        keys = [
            (m["lat_cell"] + _DB_LAT_OFF) * _DB_PACK + m["lon_cell"] + _DB_LON_OFF
            for m in members
        ]
        assert cid == min(keys), (cid, min(keys))
    for (la, lo), cid in cell.items():
        for dla in (-1, 0, 1):
            for dlo in (-1, 0, 1):
                nb = cell.get((la + dla, lo + dlo))
                if nb is not None:
                    assert nb == cid or (dla, dlo) == (0, 0) or nb == cid, (la, lo)
                    assert nb == cid, ((la, lo), (dla, dlo), nb, cid)


def test_xcorr_overlap_lengths_and_lag0_matches_direct(spark, sf_dir):
    """n_days per lag equals |days| - |lag| (contiguous daily series), and
    the lag-0 coefficient equals an independently computed Pearson r over
    the same two integer series."""
    import math

    from rvi_big_data_api_spark.io import load

    rows = {r["lag"]: r for r in _df("ts_cross_correlation", spark, sf_dir).collect()}
    n_days_total = (
        load(spark, sf_dir, "events").select(F.dayofmonth("ts")).distinct().count()
    )
    for lag, r in rows.items():
        assert r["n_days"] == n_days_total - abs(lag), r
    # independent lag-0 Pearson from collected daily integers
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("x"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("y"),
        )
        .collect()
    )
    xs = [r["x"] for r in daily]
    ys = [r["y"] for r in daily]
    n = len(xs)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = math.sqrt(n * sum(a * a for a in xs) - sum(xs) ** 2) * math.sqrt(
        n * sum(b * b for b in ys) - sum(ys) ** 2
    )
    want = round(num / den, 6) + 0.0
    assert rows[0]["xcorr"] == want, (rows[0]["xcorr"], want)


def test_cotravel_pairs_are_canonical_and_bounded(spark, sf_dir):
    """geo_cotravel: pairs are emitted once in canonical (a < b) order,
    n_shared respects the floor, and the Jaccard score is a valid ppm
    share (0 < j <= 1e6, with 1e6 exactly when the stamp sets are
    identical)."""
    from rvi_big_data_api_spark.operators.telemetry import COTRAVEL_MIN_SHARED

    rows = _df("geo_cotravel", spark, sf_dir).collect()
    assert rows, "no co-travel pairs at fixture scale"
    seen = set()
    for r in rows:
        assert r["user_a"] < r["user_b"], r
        assert (r["user_a"], r["user_b"]) not in seen
        seen.add((r["user_a"], r["user_b"]))
        assert r["n_shared"] >= COTRAVEL_MIN_SHARED, r
        assert 0 < r["jaccard_ppm"] <= 1_000_000, r


def test_seasonal_strength_bounded_and_consistent_with_decompose(spark, sf_dir):
    """ts_seasonal_strength: both strengths live in [0, 1], and the
    residual variance it implies is consistent with recomputing the
    variances directly from ts_decompose_classical's emitted parts."""
    r = _df("ts_seasonal_strength", spark, sf_dir).collect()[0]
    assert 0.0 <= r["strength_seasonal"] <= 1.0, r
    assert 0.0 <= r["strength_trend"] <= 1.0, r
    parts = [
        (p["xc"], p["trend"], p["seasonal"])
        for p in _df("ts_decompose_classical", spark, sf_dir).collect()
        if p["trend"] is not None
    ]
    assert len(parts) == r["n"]

    def var(xs):
        n = len(xs)
        return (n * sum(x * x for x in xs) - sum(xs) ** 2) / 1.0

    resid = [x - t - s for x, t, s in parts]
    sr = [x - t for x, t, _ in parts]
    tr = [x - s for x, _, s in parts]
    want_season = round(max(0.0, 1.0 - var(resid) / var(sr)), 6) + 0.0
    want_trend = round(max(0.0, 1.0 - var(resid) / var(tr)), 6) + 0.0
    assert r["strength_seasonal"] == want_season, (r, want_season)
    assert r["strength_trend"] == want_trend, (r, want_trend)


def test_histogram_quantiles_match_sorted_order_statistics(spark, sf_dir):
    """agg_quantile_histogram equals the discrete order statistic computed
    by literally sorting the collected cents per group — and the three
    quantiles are monotone."""
    from rvi_big_data_api_spark.io import load

    rows = {r["event_type"]: r for r in _df("agg_quantile_histogram", spark, sf_dir).collect()}
    data = (
        load(spark, sf_dir, "events")
        .select("event_type", F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"))
        .collect()
    )
    by_type: dict = {}
    for r in data:
        by_type.setdefault(r["event_type"], []).append(r["c"])
    assert set(by_type) == set(rows)
    for t, cs in by_type.items():
        cs.sort()
        n = len(cs)
        got = rows[t]
        assert got["n"] == n
        assert got["p50_cents"] == cs[(n + 1) // 2 - 1], t
        assert got["p90_cents"] == cs[(9 * n + 9) // 10 - 1], t
        assert got["p99_cents"] == cs[(99 * n + 99) // 100 - 1], t
        assert got["p50_cents"] <= got["p90_cents"] <= got["p99_cents"], got


def test_mcnemar_cells_reconcile_with_per_classifier_accuracy(spark, sf_dir):
    """The discordant cells and the marginal accuracies must satisfy
    n_a_correct - n_b_correct == b_cell - c_cell (both sides count the
    same concordant core), and chi2 is 0 iff no discordance."""
    r = _df("eval_mcnemar_paired", spark, sf_dir).collect()[0]
    assert r["n_a_correct"] - r["n_b_correct"] == r["b_cell"] - r["c_cell"], r
    assert r["b_cell"] + r["c_cell"] <= r["n"], r
    if r["b_cell"] + r["c_cell"] == 0:
        assert r["chi2_cc"] == 0.0, r
    else:
        want = round(
            (abs(r["b_cell"] - r["c_cell"]) - 1.0) ** 2 / (r["b_cell"] + r["c_cell"]), 6
        ) + 0.0
        assert r["chi2_cc"] == want, (r, want)


def test_markov_holdout_smoothed_probs_are_proper(spark, sf_dir):
    """seq_markov_holdout: the train split is disjoint from test by the
    day cutoff, n_train + n_test <= total transitions (boundary pairs are
    dropped, never double counted), and perplexity == exp(avg_nll) with
    avg_nll >= 0 (probabilities <= 1) and perplexity <= S^2-ish upper
    bound sanity (never below 1)."""
    import math

    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.telemetry import MARKOV_CUTOFF_DAY

    r = _df("seq_markov_holdout", spark, sf_dir).collect()[0]
    assert r["avg_nll"] >= 0.0, r
    assert r["perplexity"] >= 1.0, r
    assert abs(r["perplexity"] - round(math.exp(r["avg_nll"]), 6)) < 2e-5, r
    # the two splits never share a transition: total lag pairs across the
    # whole series >= train + test (the straddling pairs are dropped)
    ev = load(spark, sf_dir, "events")
    total_pairs = ev.count() - ev.select("user_id").distinct().count()
    assert r["n_train"] + r["n_test"] <= total_pairs, (r, total_pairs)
    assert r["n_train"] > 0 and r["n_test"] > 0, r


def test_correlation_matrix_is_upper_triangle_and_bounded(spark, sf_dir):
    """profile_correlation_matrix: exactly C(4,2)=6 canonical pairs, every
    coefficient in [-1, 1], all pairs share the same n (same cell frame),
    and the matrix agrees with agg_correlation's discipline on a
    recomputed spot pair."""
    rows = _df("profile_correlation_matrix", spark, sf_dir).collect()
    assert len(rows) == 6, rows
    ns = {r["n"] for r in rows}
    assert len(ns) == 1, rows
    seen = set()
    for r in rows:
        assert r["m1"] < r["m2"], r
        assert (r["m1"], r["m2"]) not in seen
        seen.add((r["m1"], r["m2"]))
        assert -1.0 <= r["corr"] <= 1.0, r


def test_stream_quantiles_equal_batch_quantiles_globally(spark, sf_dir):
    """stream_quantile_histogram's per-window order statistics are exact:
    recompute the discrete quantile for one (window, channel) slice from
    raw collected cents and compare; also every p50 <= p90."""
    rows = _df("stream_quantile_histogram", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_cents"] <= r["p90_cents"], r
    from rvi_big_data_api_spark.io import load

    pick = max(rows, key=lambda r: r["n"])
    day = pick["win_start"][:10]
    cs = sorted(
        r["c"]
        for r in load(spark, sf_dir, "events")
        .filter(
            (F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == day)
            & (F.col("event_type") == pick["event_type"])
        )
        .select(F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"))
        .collect()
    )
    n = len(cs)
    assert pick["n"] == n
    assert pick["p50_cents"] == cs[(n + 1) // 2 - 1]
    assert pick["p90_cents"] == cs[(9 * n + 9) // 10 - 1]


def test_dwell_segments_reconcile_with_fix_count(spark, sf_dir):
    """geo_dwell_segments: per user, fixes across all visited cells sum to
    the user's event count; visits >= 1 wherever fixes exist; dwell
    bounds: max_dwell <= total_dwell and both non-negative."""
    from rvi_big_data_api_spark.io import load

    rows = _df("geo_dwell_segments", spark, sf_dir).collect()
    per_user: dict = {}
    for r in rows:
        assert r["n_visits"] >= 1 and r["n_fixes"] >= r["n_visits"], r
        assert 0 <= r["max_dwell_sec"] <= r["total_dwell_sec"], r
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + r["n_fixes"]
    want = {
        r["user_id"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_user == want


def test_union_find_golden_graphs(spark, sf_dir):
    """union_find_min_label on hand-built graphs: a chain, two disjoint
    triangles, a star, and a merge-order trap (descending edges) — labels
    must equal the component minimum for every node regardless of edge
    order."""
    import pandas as pd

    from rvi_big_data_api_spark.operators.telemetry import union_find_min_label

    def run(edges):
        pdf = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
        out = union_find_min_label(pdf)
        return dict(zip(out["key"], out["cid"]))

    # chain 5-4-3-2-1 presented in the worst (descending) order
    assert run([(5, 4), (4, 3), (3, 2), (2, 1)]) == {n: 1 for n in (1, 2, 3, 4, 5)}
    # two disjoint triangles
    got = run([(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    # star with the hub having the largest id
    assert run([(9, 1), (9, 2), (9, 3)]) == {1: 1, 2: 1, 3: 1, 9: 1}
    # merge-order trap: two chains meet last, label must re-resolve to the
    # global min through the late union
    got = run([(7, 8), (5, 6), (6, 7), (1, 8)])
    assert got == {n: 1 for n in (1, 5, 6, 7, 8)}


def test_effect_sizes_consistency(spark, sf_dir):
    """stats_effect_sizes: Hedges' g shrinks d toward zero (|g| < |d|
    when d != 0), rank-biserial lives in [-1, 1], and the arm sizes sum
    to the distinct user count (same md5 split as stats_ttest_welch)."""
    from rvi_big_data_api_spark.io import load

    r = _df("stats_effect_sizes", spark, sf_dir).collect()[0]
    assert -1.0 <= r["rank_biserial"] <= 1.0, r
    if r["cohens_d"] != 0.0:
        assert abs(r["hedges_g"]) < abs(r["cohens_d"]), r
        assert (r["hedges_g"] > 0) == (r["cohens_d"] > 0), r
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert r["n_c"] + r["n_t"] == n_users, r


def test_phash_band_pairs_are_orig_variant(spark, sf_dir):
    """mm_phash_band: every emitted pair links an original (shard 0) to
    its own doc's mutated variant (shard 2) — tail mutation can't create
    cross-doc collisions on 32-byte chunk hashes — and the signature
    Jaccard is a valid ppm share with n_shared >= the band floor."""
    from rvi_big_data_api_spark.operators.multimodal import (
        MM_NEAR_MUTATED,
        MM_NEAR_T,
    )

    rows = _df("mm_phash_band", spark, sf_dir).collect()
    assert rows, "no near-dup pairs surfaced"
    for r in rows:
        assert r["eid_a"] < r["eid_b"], r
        doc_a, shard_a = divmod(r["eid_a"], 10)
        doc_b, shard_b = divmod(r["eid_b"], 10)
        assert doc_a == doc_b and (shard_a, shard_b) == (0, 2), r
        assert doc_a < MM_NEAR_MUTATED, r
        assert r["n_shared"] >= MM_NEAR_T, r
        assert 0 < r["sig_jaccard_ppm"] <= 1_000_000, r


def test_pinned_embed_dedup_is_subset_of_default(spark, sf_dir):
    """dedup_embed_pinned8's candidates are a strict refinement of
    dedup_embed's WHENEVER the default's adaptive width resolves to <= 8
    bits (the fixture corpora all do: N <= 2000 -> n_bits <= 5): sign-bit
    prefixes are shared, so the 8-bit bucket can only SPLIT the adaptive
    bucket — every scaled pair survives in the default op; per vec_id,
    n_similar and max_cosine can only shrink, and dup_of can only move up
    (the minimum is taken over fewer candidates)."""
    import math

    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.llm_dedup import DEDUP_EMBED_PINNED_BITS
    from rvi_big_data_api_spark.operators.llm_sim import EMBED_TARGET_BUCKET_ROWS

    n = load(spark, sf_dir, "embeddings").count()
    adaptive_bits = max(4, min(16, max(1, math.ceil(n / EMBED_TARGET_BUCKET_ROWS) - 1).bit_length()))
    assert adaptive_bits <= DEDUP_EMBED_PINNED_BITS, (
        f"fixture grew past the refinement regime (adaptive {adaptive_bits} bits)"
    )
    scaled = {r["vec_id"]: r for r in _df("dedup_embed_pinned8", spark, sf_dir).collect()}
    base = {r["vec_id"]: r for r in _df("dedup_embed", spark, sf_dir).collect()}
    assert scaled, "scaled op found nothing"
    assert set(scaled) <= set(base), "scaled emitted a vec_id the default lacks"
    for vid, s in scaled.items():
        b = base[vid]
        assert s["n_similar"] <= b["n_similar"], (vid, s, b)
        assert s["max_cosine"] <= b["max_cosine"] + 1e-9, (vid, s, b)
        assert s["dup_of"] >= b["dup_of"], (vid, s, b)


def test_stream_geo_sessions_reconcile_with_dwell_segments(spark, sf_dir):
    """stream_geo_sessions vs geo_dwell_segments: both partition fixes
    over the same (user, 10-degree cell) grid, so the key sets and the
    per-key fix totals must agree EXACTLY (they count the same rows two
    ways); visit counts follow different break rules (time gap vs cell
    change) and are only bounded: 1 <= n_visits <= n_fixes."""
    stream = {
        (r["user_id"], r["latc"], r["lonc"]): r
        for r in _df("stream_geo_sessions", spark, sf_dir).collect()
    }
    batch = {
        (r["user_id"], r["latc"], r["lonc"]): r
        for r in _df("geo_dwell_segments", spark, sf_dir).collect()
    }
    assert set(stream) == set(batch)
    for k, s in stream.items():
        assert s["n_fixes"] == batch[k]["n_fixes"], (k, s, batch[k])
        assert 1 <= s["n_visits"] <= s["n_fixes"], (k, s)


def test_weighted_sample_margin_and_shape(spark, sf_dir):
    """sample_weighted: exactly K rows per language (or the stratum size if
    smaller), ranks contiguous from 1, and — the rule-16 margin — the
    smallest adjacent-priority gap at every selection boundary is many
    orders above the 1-ulp ln() reorder risk, so the ranking cannot flip
    between engines."""
    import math

    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.filters import SAMPLE_WEIGHTED_K

    rows = _df("sample_weighted", spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["rk"])
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0).collect()
    sizes: dict = {}
    for d in docs:
        sizes[d["lang"]] = sizes.get(d["lang"], 0) + 1
    assert set(by_lang) == set(sizes)
    for lang, rks in by_lang.items():
        want = min(SAMPLE_WEIGHTED_K, sizes[lang])
        assert sorted(rks) == list(range(1, want + 1)), (lang, rks)
    # margin: recompute every priority in python and check the gap around
    # each stratum's K-th rank
    import hashlib

    pri: dict = {}
    for d in docs:
        h = int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:8], 16)
        key = math.log((h + 1) / 4294967296.0) / d["n_chars"]
        pri.setdefault(d["lang"], []).append(key)
    for lang, keys in pri.items():
        keys.sort(reverse=True)
        k = min(SAMPLE_WEIGHTED_K, len(keys))
        if k < len(keys):
            gap = keys[k - 1] - keys[k]
            rel = abs(gap) / max(abs(keys[k - 1]), 1e-300)
            assert rel > 1e-9, (lang, gap, rel)


def test_quantile_ceiling_arithmetic_is_exact():
    """The integer ceilings agg_quantile_histogram / stream_quantile_
    histogram embed — (n+1)//2, (9n+9)//10, (99n+99)//100 — equal
    ceil(q*n) for every n up to 10^6 and the generated-fuzz form
    (q*n+99)//100 equals ceil(q*n/100) for all q in 1..99 on a grid:
    the discrete quantile index can never be off by one."""
    import math

    for n in list(range(1, 5000)) + [10**5, 10**6 - 1, 10**6]:
        # exact integer ceil: ceil(a/b) == -((-a)//b), no float anywhere
        assert (n + 1) // 2 == -((-n) // 2), n
        assert (9 * n + 9) // 10 == -((-9 * n) // 10), n
        assert (99 * n + 99) // 100 == -((-99 * n) // 100), n
        # and agreement with math.ceil where the float is still exact
        if n < 2**50:
            assert (9 * n + 9) // 10 == math.ceil(9 * n / 10), n
            assert (99 * n + 99) // 100 == math.ceil(99 * n / 100), n
    for n in range(1, 2000):
        for q in (1, 7, 25, 50, 75, 90, 99):
            assert (q * n + 99) // 100 == -((-q * n) // 100), (q, n)


def test_multimodal_pipeline_funnel_reconciles_with_stage_ops(spark, sf_dir):
    """corpus_multimodal_pipeline vs its standalone stages: all originals
    survive (each is its content's min eid), NO exact re-upload survives
    (the original outranks it), the near pass drops EXACTLY the mutants
    mm_phash_band pairs (its eid_b side — the two ops must agree on the
    band verdict), shard ids stay in range, and embedding flags match the
    embeddings table row for row."""
    from rvi_big_data_api_spark.io import load
    from rvi_big_data_api_spark.operators.multimodal import (
        MM_NEAR_DOCS,
        MM_NEAR_MUTATED,
        MM_PIPE_SHARDS,
    )

    rows = _df("corpus_multimodal_pipeline", spark, sf_dir).collect()
    eids = {r["eid"] for r in rows}
    assert len(eids) == len(rows)
    # all originals survive (they are each content's min eid)
    for doc in range(MM_NEAR_DOCS):
        assert doc * 10 + 0 in eids, doc
    # no exact re-upload (shard 1) can survive — the original outranks it
    assert not any(e % 10 == 1 for e in eids)
    # surviving mutants are exactly those mm_phash_band does NOT pair
    banded = {r["eid_b"] for r in _df("mm_phash_band", spark, sf_dir).collect()}
    surviving_mutants = {e for e in eids if e % 10 == 2}
    all_mutants = {d * 10 + 2 for d in range(MM_NEAR_MUTATED)}
    assert surviving_mutants == all_mutants - banded
    vec_ids = {
        r["vec_id"] for r in load(spark, sf_dir, "embeddings").select("vec_id").collect()
    }
    for r in rows:
        assert 0 <= r["shard"] < MM_PIPE_SHARDS, r
        assert r["has_embedding"] == (1 if r["doc_id"] in vec_ids else 0), r
