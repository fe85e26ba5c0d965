"""Cross-operator and structural invariants for the round-8 wave.

Same discipline as tests/test_round7_properties.py: each test pins a law
the oracle compare alone can't see — a bracketing guarantee against an
independently-computed exact answer (log-histogram quantiles vs the true
order statistic), a recall guarantee over a known-truth universe (record
linkage), or an internal conservation law (lift-table partitioning, L1
normalization, SAX word algebra).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rvi_big_data_api_spark.registry import REGISTRY


def _df(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_log_histogram_brackets_true_quantile(spark, sf_dir, duck):
    """The sketch's guarantee, checked against the independently-computed
    EXACT discrete quantile: for each priority and each q, the true
    q-quantile in cents lies inside [lo, next_lo) of the reported bucket —
    i.e. lo <= true_q < lo * gamma^2 (one full bucket step, gamma^2 = 2
    per two half-octave buckets). This is the relative-error contract
    DDSketch sells; if bucket coding ever drifted off floor(log2) the
    bracket would break long before the oracle hash did."""
    rows = {r["o_orderpriority"]: r for r in _df("agg_log_histogram_quantile", spark, sf_dir).collect()}
    exact = duck.execute(
        """
        SELECT o_orderpriority,
               quantile_disc(floor(o_totalprice * 100 + 0.5)::BIGINT, 0.50) AS q50,
               quantile_disc(floor(o_totalprice * 100 + 0.5)::BIGINT, 0.90) AS q90,
               quantile_disc(floor(o_totalprice * 100 + 0.5)::BIGINT, 0.99) AS q99
        FROM orders GROUP BY 1
        """
    ).fetchall()
    assert rows and len(exact) == len(rows)
    for prio, q50, q90, q99 in exact:
        r = rows[prio]
        for qv, lo_col, b_col in (
            (q50, "p50_lo_cents", "p50_bucket"),
            (q90, "p90_lo_cents", "p90_bucket"),
            (q99, "p99_lo_cents", "p99_bucket"),
        ):
            lo, b = r[lo_col], r[b_col]
            # exact bucket membership: 2^b <= qv^2 ... expressed via lo:
            # lo is the smallest integer in the bucket; the next bucket's
            # lo is < lo * sqrt(2) + 1, so qv < 2 * lo always brackets.
            assert lo <= qv < 2 * lo, (prio, lo_col, lo, qv)


def test_preference_pairs_are_true_extremes(spark, sf_dir):
    """Within every emitted bucket the chosen doc carries the bucket's max
    score and the rejected doc its min (ties broken low-doc_id), and the
    margin gate holds — recomputed from raw scores, independent of the
    operator's window plan."""
    from rvi_big_data_api_spark.operators.llm_text import PREF_MIN_MARGIN_PPM
    from rvi_big_data_api_spark.io import load

    pairs = _df("corpus_preference_pairs", spark, sf_dir).collect()
    assert pairs, "no preference pairs emitted — margin gate too strict for fixture"
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("bucket"),
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L div size(split(text, ' '))"
        ).alias("score_ppm"),
    ).collect()
    by_bucket: dict = {}
    for r in scored:
        by_bucket.setdefault((r["lang"], r["source"], r["bucket"]), []).append(r)
    for p in pairs:
        grp = by_bucket[(p["lang"], p["source"], p["bucket"])]
        best = min(grp, key=lambda r: (-r["score_ppm"], r["doc_id"]))
        worst = min(grp, key=lambda r: (r["score_ppm"], r["doc_id"]))
        assert p["chosen_doc"] == best["doc_id"], p
        assert p["rejected_doc"] == worst["doc_id"], p
        assert p["margin_ppm"] == p["chosen_score_ppm"] - p["rejected_score_ppm"] >= 0
        assert p["margin_ppm"] >= PREF_MIN_MARGIN_PPM


def test_length_buckets_cover_and_bound(spark, sf_dir):
    """Power-of-two capacity law: every bucket's doc lengths satisfy
    cap/2 < len <= cap (cap=1 holds len==1), buckets partition the corpus
    (doc counts and token sums reconcile with the raw table), and waste is
    the exact integer ppm of capacity minus payload."""
    from rvi_big_data_api_spark.io import load

    rows = _df("corpus_length_buckets", spark, sf_dir).collect()
    assert rows
    total_docs = sum(r["n_docs"] for r in rows)
    total_tokens = sum(r["sum_tokens"] for r in rows)
    d = load(spark, sf_dir, "documents")
    raw = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("t"),
    ).collect()[0]
    assert total_docs == raw["n"] and total_tokens == raw["t"]
    for r in rows:
        cap = r["bucket_cap"]
        assert r["max_tokens"] <= cap, r
        if cap > 1:
            assert r["min_tokens"] > cap // 2, r
        expected_waste = (cap * r["n_docs"] - r["sum_tokens"]) * 1_000_000 // (cap * r["n_docs"])
        assert r["pad_waste_ppm"] == expected_waste, r


def test_record_linkage_full_recall(spark, sf_dir):
    """Multi-pass blocking recall guarantee: EVERY generated variant is
    matched back to its base record (the whole point of the two-pass
    block design — a missed true pair means a mutation position escaped
    both keys), every true pair sits at exactly dist 1, and false
    positives are confined to the deletion-collision class (also dist 1,
    lengths 18 vs 17)."""
    from rvi_big_data_api_spark.operators.llm_text import ER_VARIANT_BASE
    from rvi_big_data_api_spark.io import load

    rows = _df("er_record_linkage", spark, sf_dir).collect()
    cust = load(spark, sf_dir, "customer")
    expected_variants = cust.filter(F.col("c_custkey") % 3 == 0).count()
    true_pairs = {(r["id_a"], r["id_b"]) for r in rows if r["true_match"]}
    assert len(true_pairs) == expected_variants, (
        f"recall broken: {len(true_pairs)} of {expected_variants} variants linked"
    )
    for r in rows:
        assert r["dist"] == 1, r
    assert any(not r["true_match"] for r in rows), (
        "no deletion-collision false positives — the precision column is untested"
    )


def test_sax_words_well_formed(spark, sf_dir):
    """Every emitted word is exactly SAX_W symbols over {a,b,c,d}; only
    users with >= SAX_W active days are symbolized; and the alphabet's
    center-heavy shape appears (z-normalization forces both tails to be
    rarer than the center on any non-degenerate series set)."""
    from rvi_big_data_api_spark.operators.telemetry import SAX_W
    from rvi_big_data_api_spark.io import load

    rows = _df("ts_sax", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert len(r["sax_word"]) == SAX_W, r
        assert set(r["sax_word"]) <= set("abcd"), r
        assert r["n_days"] >= SAX_W, r
    ev = load(spark, sf_dir, "events")
    eligible = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= SAX_W)
        .count()
    )
    assert len(rows) == eligible


def test_lift_table_conservation(spark, sf_dir):
    """The decile partition conserves population and positives, decile
    sizes are balanced to within one user, capture is monotone and ends at
    exactly 1e6 ppm, and rate/lift reconcile with the decile's own
    counts."""
    rows = sorted(_df("eval_lift_table", spark, sf_dir).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(10))
    n_total = sum(r["n"] for r in rows)
    pos_total = sum(r["n_pos"] for r in rows)
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    cum = 0
    last_capture = -1
    for r in rows:
        cum += r["n_pos"]
        assert r["cum_pos"] == cum, r
        assert r["rate_ppm"] == r["n_pos"] * 1_000_000 // r["n"], r
        assert r["capture_ppm"] == cum * 1_000_000 // pos_total, r
        assert r["capture_ppm"] >= last_capture
        last_capture = r["capture_ppm"]
        assert r["lift_ppm"] == r["n_pos"] * n_total * 1_000_000 // (r["n"] * pos_total), r
    assert rows[-1]["capture_ppm"] == 1_000_000


def test_hits_l1_normalized_and_covers_graph(spark, sf_dir):
    """Both score vectors are L1-normalized (sums reconcile to 1 within
    rounding of the 6-dp emit), every node of the edge set appears exactly
    once, and the directed orientation separates the roles: at least one
    node has hub != authority (on the symmetrized graph they'd collapse)."""
    rows = _df("graph_hits", spark, sf_dir).collect()
    assert rows
    hub_sum = sum(r["hub"] for r in rows)
    auth_sum = sum(r["authority"] for r in rows)
    assert abs(hub_sum - 1.0) < 1e-3, hub_sum
    assert abs(auth_sum - 1.0) < 1e-3, auth_sum
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert any(abs(r["hub"] - r["authority"]) > 1e-6 for r in rows)


def test_dataset_card_reconciles(spark, sf_dir, duck):
    """The card's one row must agree with independently-computed corpus
    facts — the release-gate property: a card that drifts from the corpus
    it describes is worse than no card."""
    r = _df("corpus_dataset_card", spark, sf_dir).collect()[0]
    n_docs, n_tokens, p50 = duck.execute(
        """
        SELECT count(*),
               sum(len(string_split(text, ' '))),
               quantile_disc(len(string_split(text, ' ')), 0.5)
        FROM documents
        """
    ).fetchone()
    assert r["n_docs"] == n_docs
    assert r["n_tokens"] == n_tokens
    assert r["p50_tokens"] == p50
    assert r["mean_tokens_ppm"] == n_tokens * 1_000_000 // n_docs
    assert 0 <= r["dup_ppm"] < 1_000_000


def test_permutation_test_laws(spark, sf_dir):
    """Permutation-test structure: p is the add-one-smoothed rank of the
    observed stat ((1+n_ge)/(K+1) in ppm), n_ge is bounded by K, and the
    test is REPLAYABLE — a second run returns the identical row (md5
    arming means there is no RNG state to drift)."""
    from rvi_big_data_api_spark.operators.ml_eval import PERM_K

    r1 = _df("stats_permutation_test", spark, sf_dir).collect()
    r2 = _df("stats_permutation_test", spark, sf_dir).collect()
    assert r1 == r2
    r = r1[0]
    assert r["n_perms"] == PERM_K
    assert 0 <= r["n_ge"] <= PERM_K
    assert r["p_value_ppm"] == (1 + r["n_ge"]) * 1_000_000 // (PERM_K + 1)
    assert r["obs_diff_ppm"] >= 0


def test_changepoint_is_argmax(spark, sf_dir, duck):
    """The reported split truly maximizes the between-segment objective:
    brute-force every candidate split in DuckDB and compare the argmax
    (score desc, earlier day wins ties) — the property the oracle's hash
    can only confirm, not explain."""
    rows = {r["event_type"]: r for r in _df("ts_changepoint_binseg", spark, sf_dir).collect()}
    brute = duck.execute(
        """
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, day, row_number() OVER w AS i,
                   sum(cents) OVER (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS s,
                   sum(cents) OVER (PARTITION BY event_type)::BIGINT AS st,
                   count(*) OVER (PARTITION BY event_type) AS t
            FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
        )
        SELECT event_type, i,
               ((s*t - st*i)::DOUBLE * (s*t - st*i)::DOUBLE) / (i * (t - i)) AS score
        FROM cum WHERE i < t
        """
    ).fetchall()
    best: dict = {}
    for et, i, score in brute:
        cur = best.get(et)
        if cur is None or score > cur[1] or (score == cur[1] and i < cur[0]):
            best[et] = (i, score)
    assert set(best) == set(rows)
    for et, (i, _) in best.items():
        assert rows[et]["tau_i"] == i, (et, i, rows[et])


def test_audio_frames_conserve_payload(spark, sf_dir):
    """Framing conservation: per doc, frame byte counts sum to the payload
    length, frame indices are dense from 0, all but the tail frame are
    full-width, and total energy equals the payload's byte sum."""
    from rvi_big_data_api_spark.operators.multimodal import AUDIO_FRAME_BYTES
    from rvi_big_data_api_spark.io import load

    rows = _df("mm_audio_energy", spark, sf_dir).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    assert set(per_doc) == {d for d, t in docs.items() if len(t) > 0}
    for doc_id, frames in per_doc.items():
        frames.sort(key=lambda r: r["frame_idx"])
        text = docs[doc_id]
        assert [f["frame_idx"] for f in frames] == list(range(len(frames)))
        assert sum(f["frame_bytes"] for f in frames) == len(text)
        for f in frames[:-1]:
            assert f["frame_bytes"] == AUDIO_FRAME_BYTES
        assert sum(f["energy"] for f in frames) == sum(text.encode("utf-8"))
    assert any(r["is_silent"] for r in rows) and any(not r["is_silent"] for r in rows)


def test_funnel_depth_monotone_semantics(spark, sf_dir):
    """Funnel depths are in {0,1,2,3}; every depth >= 1 session contains a
    view; and the depth histogram is monotone in the funnel sense: sessions
    reaching stage k+1 can never outnumber sessions reaching stage k."""
    rows = _df("stream_funnel_sessions", spark, sf_dir).collect()
    assert rows
    counts = [0, 0, 0, 0]
    for r in rows:
        assert 0 <= r["funnel_depth"] <= 3, r
        counts[r["funnel_depth"]] += 1
    reached = [sum(counts[k:]) for k in range(4)]
    assert reached[1] >= reached[2] >= reached[3]
    assert reached[3] > 0, "no full-funnel session — fixture should contain some"


def test_bloom_sink_point_lookup_roundtrip(spark, sf_dir, duck):
    """Bloom filters are I/O-only: the probed result must equal the raw
    table's answer key-for-key (no-false-negative law at the query level),
    absent probes return exactly zero, and the probe set covers both
    classes."""
    from rvi_big_data_api_spark.sources.formats import BLOOM_SINK_PROBES

    rows = {r["probe_key"]: r for r in _df("sink_parquet_bloom", spark, sf_dir).collect()}
    assert len(rows) == BLOOM_SINK_PROBES
    truth = dict(
        duck.execute(
            "SELECT o_custkey, count(*) FROM orders GROUP BY o_custkey"
        ).fetchall()
    )
    n_present = n_absent = 0
    for key, r in rows.items():
        if key >= 900000000:
            assert r["n_orders"] == 0 and r["total_cents"] == 0, r
            n_absent += 1
        else:
            assert r["n_orders"] == truth.get(key, 0), r
            n_present += 1
    assert n_absent == BLOOM_SINK_PROBES // 2
    assert any(r["n_orders"] > 0 for r in rows.values())


def test_stream_linkage_recall_and_precision_classes(spark, sf_dir):
    """Every signup event resolves to its claimed identity (the deletion
    key of the true base always contains the typo'd window — recall floor
    = one true match per event), and collisions exist but stay within the
    md5-region block (precision class is visible, not silent)."""
    rows = _df("stream_dirty_linkage", spark, sf_dir).collect()
    from rvi_big_data_api_spark.io import load
    import pyspark.sql.functions as F2

    n_signups = (
        load(spark, sf_dir, "events").filter(F2.col("event_type") == "signup").count()
    )
    true_rows = [r for r in rows if r["true_match"]]
    assert len(true_rows) == n_signups, (len(true_rows), n_signups)
    for r in rows:
        assert r["dist"] == 1, r
        assert r["matched_custkey"] % 1 == 0
    assert any(not r["true_match"] for r in rows), "no collision class surfaced"


def test_log_histogram_is_mergeable_monoid(spark, sf_dir, duck):
    """The sketch's 100 TB claim IS the monoid law: building per-shard
    (bucket, count) partials over an arbitrary 8-way split of orders and
    merging them by count addition yields byte-identical quantile readouts
    to the single-pass build — the agg_incremental_merge discipline
    applied to the log histogram. Verified end-to-end in DuckDB arithmetic
    (the same integer bucket coding), independent of the Spark plan."""
    merged = duck.execute(
        """
        WITH coded AS (
            SELECT o_orderpriority, o_orderkey % 8 AS shard,
                   2 * (length(to_base(floor(o_totalprice * 100 + 0.5)::BIGINT, 2)) - 1)
                     + CASE WHEN floor(o_totalprice * 100 + 0.5)::BIGINT
                                 * floor(o_totalprice * 100 + 0.5)::BIGINT
                            >= (1::BIGINT << (2 * (length(to_base(
                                  floor(o_totalprice * 100 + 0.5)::BIGINT, 2)) - 1) + 1))
                            THEN 1 ELSE 0 END AS bucket
            FROM orders
        ),
        partials AS (  -- per-shard sketch state
            SELECT o_orderpriority, shard, bucket, count(*)::BIGINT AS cnt
            FROM coded GROUP BY 1, 2, 3
        ),
        merged AS (    -- monoid merge: add counts per cell
            SELECT o_orderpriority, bucket, sum(cnt)::BIGINT AS cnt
            FROM partials GROUP BY 1, 2
        ),
        cum AS (
            SELECT o_orderpriority, bucket,
                   sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_n,
                   sum(cnt) OVER (PARTITION BY o_orderpriority)::BIGINT AS n
            FROM merged
        )
        SELECT o_orderpriority,
               min(CASE WHEN cum_n >= (n + 1) // 2 THEN bucket END)::BIGINT AS p50_bucket,
               min(CASE WHEN cum_n >= (9 * n + 9) // 10 THEN bucket END)::BIGINT AS p90_bucket,
               min(CASE WHEN cum_n >= (99 * n + 99) // 100 THEN bucket END)::BIGINT AS p99_bucket
        FROM cum GROUP BY o_orderpriority
        """
    ).fetchall()
    direct = {
        r["o_orderpriority"]: r
        for r in _df("agg_log_histogram_quantile", spark, sf_dir).collect()
    }
    assert len(merged) == len(direct)
    for prio, p50, p90, p99 in merged:
        r = direct[prio]
        assert (r["p50_bucket"], r["p90_bucket"], r["p99_bucket"]) == (p50, p90, p99), prio


def test_stream_log_histogram_matches_batch_coding(spark, sf_dir, duck):
    """Streaming ≡ batch for the log sketch: the stream's complete-mode
    readout must agree with a direct batch recomputation of the same
    bucket coding (the monoid-through-watermark law), and every group's
    cell count must respect the constant-state bound (≤ 2*53 buckets)."""
    rows = _df("stream_log_histogram", spark, sf_dir).collect()
    assert rows
    batch = {
        (d, et): (p50, p99)
        for d, et, p50, p99 in duck.execute(
            """
            WITH coded AS (
                SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
                       2 * (length(to_base(floor(value * 100 + 0.5)::BIGINT, 2)) - 1)
                         + CASE WHEN floor(value * 100 + 0.5)::BIGINT
                                     * floor(value * 100 + 0.5)::BIGINT
                                >= (1::BIGINT << (2 * (length(to_base(
                                      floor(value * 100 + 0.5)::BIGINT, 2)) - 1) + 1))
                                THEN 1 ELSE 0 END AS bucket
                FROM events WHERE value > 0
            ),
            hist AS (SELECT day, event_type, bucket, count(*)::BIGINT AS cnt
                     FROM coded GROUP BY 1, 2, 3),
            cum AS (SELECT day, event_type, bucket,
                           sum(cnt) OVER (PARTITION BY day, event_type ORDER BY bucket
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS c,
                           sum(cnt) OVER (PARTITION BY day, event_type)::BIGINT AS n
                    FROM hist)
            SELECT day, event_type,
                   min(CASE WHEN c >= (n + 1) // 2 THEN bucket END),
                   min(CASE WHEN c >= (99 * n + 99) // 100 THEN bucket END)
            FROM cum GROUP BY day, event_type
            """
        ).fetchall()
    }
    for r in rows:
        assert batch[(r["day"], r["event_type"])] == (r["p50_bucket"], r["p99_bucket"]), r
        assert 0 <= r["p50_bucket"] <= r["p99_bucket"] <= 106, r


def test_dp_mean_release_laws(spark, sf_dir, duck):
    """DP release sanity: the noised sum/count sit within a generous
    Laplace envelope of the clamped truth (20 scale units — probability
    of a violation under the mechanism is ~2e-9, so a failure means the
    arithmetic drifted, not bad luck), the released mean is their exact
    ratio, and a re-run releases the identical row (seeded mechanism)."""
    from rvi_big_data_api_spark.operators.analytics import (
        DP_MEAN_CLAMP_CENTS,
        DP_EPSILON_X1000,
    )

    rows = {r["event_type"]: r for r in _df("privacy_dp_mean", spark, sf_dir).collect()}
    again = {r["event_type"]: r for r in _df("privacy_dp_mean", spark, sf_dir).collect()}
    assert rows == again
    truth = {
        et: (s, n)
        for et, s, n in duck.execute(
            f"""
            SELECT event_type,
                   sum(least(greatest(floor(value * 100 + 0.5)::BIGINT, 0),
                             {DP_MEAN_CLAMP_CENTS}))::BIGINT,
                   count(*)::BIGINT
            FROM events GROUP BY event_type
            """
        ).fetchall()
    }
    sum_scale = DP_MEAN_CLAMP_CENTS * 2000.0 / DP_EPSILON_X1000
    cnt_scale = 2000.0 / DP_EPSILON_X1000
    for et, r in rows.items():
        s, n = truth[et]
        assert abs(r["noisy_sum_cents"] - s) <= 20 * sum_scale, (et, r, s)
        assert abs(r["noisy_n"] - n) <= 20 * cnt_scale, (et, r, n)
        assert abs(r["noisy_mean_cents"] - round(r["noisy_sum_cents"] / r["noisy_n"], 4)) <= 1e-3


def test_stream_ab_matches_batch_experiment(spark, sf_dir):
    """The live readout must agree with the batch report on every shared
    quantity — counts exactly, z to the shared 4-dp round (streaming
    state ≡ batch per-user rollup)."""
    live = _df("stream_ab_experiment", spark, sf_dir).collect()[0]
    batch = _df("ab_experiment_report", spark, sf_dir).collect()[0]
    assert (live["n_c"], live["x_c"], live["n_t"], live["x_t"]) == (
        batch["n_c"], batch["x_c"], batch["n_t"], batch["x_t"],
    )
    assert live["z_score"] == batch["z_score"]


def test_curriculum_phases_partition_and_order(spark, sf_dir, duck):
    """Phases partition the corpus (docs and tokens conserve), are
    balanced to within one doc, score ranges are non-overlapping and
    ascending (phase k's max <= phase k+1's min), and cumulative budgets
    telescope."""
    rows = sorted(_df("corpus_curriculum_order", spark, sf_dir).collect(), key=lambda r: r["phase"])
    n_docs, n_tokens = duck.execute(
        "SELECT count(*), sum(len(string_split(text, ' '))) FROM documents"
    ).fetchone()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["phase_tokens"] for r in rows) == n_tokens
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    cum = 0
    for i, r in enumerate(rows):
        cum += r["phase_tokens"]
        assert r["cum_tokens"] == cum
        assert r["min_score_ppm"] <= r["max_score_ppm"]
        if i:
            assert rows[i - 1]["max_score_ppm"] <= r["min_score_ppm"]


def test_poisson_surprise_gates_on_integer_spike(spark, sf_dir):
    """The surprise score is zero exactly when the day is at or below the
    mean rate (integer gate k*n_days <= total), positive otherwise, and
    every flagged day clears the threshold with k above its own lambda."""
    from rvi_big_data_api_spark.operators.telemetry import POISSON_SURPRISE_MIN

    rows = _df("anomaly_rate_poisson", spark, sf_dir).collect()
    assert rows
    for r in rows:
        above = r["k"] * 1_000_000 > r["lambda_ppm"]
        if not above:
            assert r["surprise"] == 0.0, r
        assert r["surprise"] >= 0.0
        if r["is_anomaly"]:
            assert r["surprise"] > POISSON_SURPRISE_MIN and above, r


def test_pass_at_k_matches_exact_combinatorics(spark, sf_dir):
    """The ppm values equal the exact Fraction arithmetic of the unbiased
    estimator for every task, pass@5 >= pass@1 always (larger draws can
    only help), and both degenerate tails occur in the fixture."""
    from fractions import Fraction
    from math import comb

    rows = _df("eval_pass_at_k", spark, sf_dir).collect()
    assert rows
    saw_all_pass = saw_mid = False
    for r in rows:
        n, c = r["n"], r["c"]
        for k, col in ((1, "pass1_ppm"), (5, "pass5_ppm")):
            if c >= n or n - c < k:
                expect = 1_000_000
            else:
                frac = Fraction(comb(n - c, k), comb(n, k))
                expect = 1_000_000 - (frac.numerator * 1_000_000) // frac.denominator
            assert r[col] == expect, (r, k, expect)
        assert r["pass5_ppm"] >= r["pass1_ppm"], r
        saw_all_pass |= r["pass1_ppm"] == 1_000_000
        saw_mid |= 0 < r["pass1_ppm"] < 1_000_000
    assert saw_mid, "no non-degenerate tasks — estimator untested"


def test_bpe_round_one_matches_python_replay(spark, sf_dir):
    """Round 1 of the relational BPE equals a direct Python replay of the
    textbook algorithm over the whole corpus: same argmax pair (count
    desc, pair asc) and same token count after a greedy leftmost
    non-overlapping merge — the sequential semantics the gaps-and-islands
    odd-rank trick must reproduce exactly, including overlap runs."""
    from collections import Counter
    from rvi_big_data_api_spark.io import load

    rows = sorted(_df("text_bpe_train", spark, sf_dir).collect(), key=lambda r: r["merge_rank"])
    docs = [r["text"].split(" ") for r in load(spark, sf_dir, "documents").select("text").collect()]
    counts = Counter()
    for toks in docs:
        counts.update(zip(toks, toks[1:]))
    (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (rows[0]["left_tok"], rows[0]["right_tok"], rows[0]["pair_count"]) == (l, r, c)
    total_after = 0
    for toks in docs:
        out = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                out.append(toks[i] + toks[i + 1])
                i += 2
            else:
                out.append(toks[i])
                i += 1
        total_after += len(out)
    assert rows[0]["tokens_after"] == total_after
    # merge ranks are strictly decreasing in count (ties broken by pair
    # order, but a later round can never beat an earlier count: merging
    # only removes bigrams of the merged pair and creates new ones whose
    # count is bounded by the selected occurrences)
    assert rows[0]["pair_count"] >= rows[1]["pair_count"] >= rows[2]["pair_count"]
    assert rows[0]["tokens_after"] > rows[1]["tokens_after"] > rows[2]["tokens_after"]


def test_snapshot_manifest_isolation_laws(spark, sf_dir, duck):
    """Table-format invariants: snapshots share the surviving file's rows
    (v1 ∩ v2 = slice B, verified through the totals' overlap identity:
    v1 + v2 − full = B, since v1 = A∪B, v2 = B∪C and A,B,C partition the
    table), each snapshot's audit matches the raw-table recomputation,
    and re-reading a snapshot after the 'later commit' returns identical
    numbers (immutability — time travel is just picking a manifest)."""
    rows = {r["snapshot_id"]: r for r in _df("scan_snapshot_manifest", spark, sf_dir).collect()}
    again = {r["snapshot_id"]: r for r in _df("scan_snapshot_manifest", spark, sf_dir).collect()}
    assert rows == again
    full_n, full_c = duck.execute(
        "SELECT count(*), sum(floor(o_totalprice * 100 + 0.5)::BIGINT) FROM orders"
    ).fetchone()
    b_n, b_c = duck.execute(
        "SELECT count(*), sum(floor(o_totalprice * 100 + 0.5)::BIGINT) FROM orders WHERE o_orderkey % 3 = 1"
    ).fetchone()
    v1, v2 = rows[1], rows[2]
    assert v1["n_files"] == v2["n_files"] == 2
    assert v1["n_rows"] + v2["n_rows"] - full_n == b_n
    assert v1["total_cents"] + v2["total_cents"] - full_c == b_c


def test_bpe_apply_reconciles_with_training(spark, sf_dir):
    """Cross-op conservation: the per-doc apply ledger must sum to the
    training op's final corpus count, per-doc compression is bounded by
    the three-merge maximum (each merge halves at most), and every doc
    appears exactly once with before >= after."""
    apply_rows = _df("text_bpe_apply", spark, sf_dir).collect()
    train_rows = sorted(_df("text_bpe_train", spark, sf_dir).collect(), key=lambda r: r["merge_rank"])
    assert sum(r["tokens_after"] for r in apply_rows) == train_rows[-1]["tokens_after"]
    ids = [r["doc_id"] for r in apply_rows]
    assert len(ids) == len(set(ids))
    for r in apply_rows:
        assert r["tokens_before"] >= r["tokens_after"] > 0
        assert r["compression_ppm"] == (
            (r["tokens_before"] - r["tokens_after"]) * 1_000_000 // r["tokens_before"]
        )
        # 3 merges of disjoint pairs can at most remove floor(n/2)*3... but
        # never more than half per round compounded: after >= before / 8
        assert r["tokens_after"] * 8 >= r["tokens_before"]


def test_modularity_conservation_laws(spark, sf_dir):
    """Graph-accounting identities: within-edges sum to m (the candidate
    graph is same-label by construction — the docstring states it),
    degree totals sum to 2m, every q contribution equals its two ppm
    terms' difference, and each label's expected term is positive."""
    rows = _df("graph_modularity", spark, sf_dir).collect()
    assert rows
    from rvi_big_data_api_spark.operators.llm_sim import sim_pair_edges

    m = sim_pair_edges(spark, sf_dir).count()
    assert sum(r["e_within"] for r in rows) == m
    assert sum(r["d_tot"] for r in rows) == 2 * m
    for r in rows:
        assert r["q_contrib_ppm"] == r["e_frac_ppm"] - r["expected_ppm"], r
        assert r["expected_ppm"] > 0 and r["e_frac_ppm"] >= 0, r
