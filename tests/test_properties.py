"""Property / metamorphic tests (SURVEY.md §5.2/4): algebraic invariants
that hold regardless of data values — they catch formulation bugs the oracle
can't (the oracle would faithfully mirror a wrong-but-consistent query).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from rvi_big_data_api_spark.io import load
from rvi_big_data_api_spark.operators.llm_sim import SIM_TOPK_K, SIM_TOPK_NQUERIES
from rvi_big_data_api_spark.operators.telemetry import SESSION_GAP_S, sessionized_events
from rvi_big_data_api_spark.registry import REGISTRY

from .parity import canon_rows


def rows_of(df):
    return canon_rows(df.toPandas())


class TestJoinAlgebra:
    def test_join_commutes(self, spark, sf_dir):
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
        ab = li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey", "o_orderpriority")
        ba = o.join(li, o.o_orderkey == li.l_orderkey).select("l_orderkey", "o_orderpriority")
        assert rows_of(ab) == rows_of(ba)

    def test_filter_pushes_through_join(self, spark, sf_dir):
        """filter∘join ≡ join∘filter — what Catalyst's pushdown asserts is
        semantics-preserving, checked at the result level."""
        li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
        o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
        pred = F.col("o_orderstatus") == "F"
        after = li.join(o, li.l_orderkey == o.o_orderkey).filter(pred)
        before = li.join(o.filter(pred), li.l_orderkey == o.o_orderkey)
        assert rows_of(after.select("l_orderkey", "o_orderstatus")) == rows_of(
            before.select("l_orderkey", "o_orderstatus")
        )

    def test_semi_join_is_filtered_projection(self, spark, sf_dir):
        """left_semi(A, B) ≡ A ∩ keys(B) — row multiset of A preserved."""
        cust = load(spark, sf_dir, "customer")
        urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        semi = cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select("c_custkey")
        via_in = cust.join(
            urgent.select("o_custkey").distinct(), cust.c_custkey == F.col("o_custkey")
        ).select("c_custkey")
        assert rows_of(semi) == rows_of(via_in)


class TestSessionInvariants:
    def test_sessions_partition_events(self, spark, sf_dir):
        s = sessionized_events(spark, sf_dir)
        assert s.count() == load(spark, sf_dir, "events").count()

    def test_intra_session_gaps_bounded(self, spark, sf_dir):
        """Within a session, consecutive gaps are ≤ G (the defining property)."""
        from pyspark.sql import Window

        s = sessionized_events(spark, sf_dir)
        w = Window.partitionBy("user_id", "session_id").orderBy("sec", "event_id")
        bad = (
            s.withColumn("gap", F.col("sec") - F.lag("sec").over(w))
            .filter(F.col("gap") > SESSION_GAP_S)
            .count()
        )
        assert bad == 0

    def test_session_ids_dense_from_one(self, spark, sf_dir):
        per_user = sessionized_events(spark, sf_dir).groupBy("user_id").agg(
            F.min("session_id").alias("lo"),
            F.max("session_id").alias("hi"),
            F.countDistinct("session_id").alias("n"),
        )
        bad = per_user.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count()
        assert bad == 0


class TestDedupInvariants:
    def test_exact_dedup_idempotent_and_minimal(self, spark, sf_dir):
        kept = REGISTRY["dedup_exact"].fn(spark, sf_dir)
        n_kept = kept.count()
        n_distinct_texts = load(spark, sf_dir, "documents").select("text").distinct().count()
        assert n_kept == n_distinct_texts

    def test_hash_dedup_agrees_with_exact(self, spark, sf_dir):
        """md5 collisions aside, hash-keyed dedup must keep the same doc ids."""
        a = rows_of(REGISTRY["dedup_exact"].fn(spark, sf_dir).select("doc_id"))
        b = rows_of(REGISTRY["dedup_hash"].fn(spark, sf_dir).select("doc_id"))
        assert a == b

    def test_lsh_pairs_subset_of_exact_verify(self, spark, sf_dir):
        """dedup_near (MinHash-LSH candidates → Jaccard verify) against
        dedup_near_verify (EXACT inverted-index candidates → same verify):
        the LSH output must be a subset with identical jaccard values —
        banding can only lose candidates, never invent pairs or change the
        verified score. This is the LSH recall gate that lets the rows-only
        banding stage ride on the oracled verify stage's hash check."""
        lsh = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in REGISTRY["dedup_near"].fn(spark, sf_dir).collect()
        }
        exact = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in REGISTRY["dedup_near_verify"].fn(spark, sf_dir).collect()
        }
        assert set(lsh) <= set(exact), set(lsh) - set(exact)
        for pair, j in lsh.items():
            assert exact[pair] == j, (pair, j, exact[pair])

    def test_simhash_verify_structural_invariants(self, spark, sf_dir):
        """dedup_simhash_verify shares dedup_simhash's pipeline but swaps
        the term hash (md5 halves vs seeded xxhash64), so pair sets are NOT
        comparable across the two (different signatures → different
        candidates); what must hold for BOTH are the pipeline's structural
        contracts: canonical doc_a < doc_b orientation, unique pairs,
        0 <= hamming <= SIMHASH_MAX_HAMMING, and the ±20% length band."""
        from rvi_big_data_api_spark.operators.llm_dedup import SIMHASH_MAX_HAMMING

        docs = {
            r.doc_id: r.n_chars
            for r in load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
        }
        for name in ("dedup_simhash", "dedup_simhash_verify"):
            rows = REGISTRY[name].fn(spark, sf_dir).collect()
            pairs = [(r.doc_a, r.doc_b) for r in rows]
            assert len(pairs) == len(set(pairs)), name
            for r in rows:
                assert r.doc_a < r.doc_b, (name, r)
                assert 0 <= r.hamming <= SIMHASH_MAX_HAMMING, (name, r)
                na, nb = docs[r.doc_a], docs[r.doc_b]
                assert abs(na - nb) <= max(na, nb) * 0.2, (name, r, na, nb)


class TestTopKProperties:
    def test_ann_is_subset_scored_like_exact(self, spark, sf_dir):
        """Approximate top-k must (a) never invent scores — every (qid,
        vec_id, dot) it returns appears in the exact operator's full scoring;
        (b) achieve nonzero recall against exact top-k."""
        exact = REGISTRY["sim_topk"].fn(spark, sf_dir).toPandas()
        ann = REGISTRY["sim_topk_ann"].fn(spark, sf_dir).toPandas()
        exact_pairs = {(r.qid, r.vec_id): r.dot for r in exact.itertuples()}
        ann_pairs = {(r.qid, r.vec_id): r.dot for r in ann.itertuples()}
        # scores for overlapping pairs must be identical (same scorer)
        for k, v in ann_pairs.items():
            if k in exact_pairs:
                assert exact_pairs[k] == v
        recall = len(set(ann_pairs) & set(exact_pairs)) / max(len(exact_pairs), 1)
        assert 0.0 < recall <= 1.0
        assert len(ann) <= SIM_TOPK_NQUERIES * SIM_TOPK_K

    def test_knn_votes_sum_to_k(self, spark, sf_dir):
        votes = REGISTRY["knn_label"].fn(spark, sf_dir)
        assert votes.filter(F.col("n_votes") < 1).count() == 0
        assert votes.count() == 20  # one prediction per query


class TestStreamBatchEquivalence:
    def test_tumbling_stream_equals_batch(self, spark, sf_dir):
        """The streaming tumbling window (complete mode, availableNow) must
        equal the same aggregation computed in batch — Structured Streaming's
        unification property, asserted end-to-end."""
        stream_result = rows_of(REGISTRY["stream_tumbling"].fn(spark, sf_dir))
        from rvi_big_data_api_spark.functions.exprs import ts_str

        ev = load(spark, sf_dir, "events")
        batch = (
            ev.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(ts_str(F.col("win.start")).alias("win_start"), "event_type", "n")
        )
        assert stream_result == rows_of(batch)


class TestApproxAccuracy:
    def test_hll_within_rsd_of_exact(self, spark, sf_dir):
        """approx_count_distinct(rsd=0.02) must land within a few rsd of the
        exact distinct count — the contract that makes it usable at 100 TB."""
        approx = {
            r.event_type: r.approx_users
            for r in REGISTRY["agg_approx_distinct"].fn(spark, sf_dir).collect()
        }
        exact = {
            r.event_type: r.n_users
            for r in REGISTRY["agg_count_distinct"].fn(spark, sf_dir).collect()
        }
        for t, n in exact.items():
            rel_err = abs(approx[t] - n) / n
            assert rel_err <= 0.10, (t, approx[t], n, rel_err)


class TestAnalyticsInvariants:
    def test_funnel_counts_monotone(self, spark, sf_dir):
        """Ordered-funnel step counts can only shrink down the funnel."""
        r = REGISTRY["event_funnel"].fn(spark, sf_dir).collect()[0]
        assert r.n_view >= r.n_click >= r.n_purchase >= 0, r

    def test_funnel_bounded_by_presence(self, spark, sf_dir):
        """Ordered conversion is at most unordered presence: users counted at
        the click step must be a subset of users with any click at all."""
        r = REGISTRY["event_funnel"].fn(spark, sf_dir).collect()[0]
        ev = load(spark, sf_dir, "events")
        present = (
            ev.filter(F.col("event_type") == "click").select("user_id").distinct().count()
        )
        assert r.n_click <= present

    def test_retention_cohort_day0_covers_all_users(self, spark, sf_dir):
        """Every user is active on their own cohort day, so Σ n_active at
        offset 0 = total distinct users, and no offset is negative."""
        df = REGISTRY["retention_cohort"].fn(spark, sf_dir)
        day0 = df.filter(F.col("day_offset") == 0).agg(F.sum("n_active")).collect()[0][0]
        total = load(spark, sf_dir, "events").select("user_id").distinct().count()
        assert day0 == total
        assert df.filter(F.col("day_offset") < 0).count() == 0

    def test_zscore_outliers_are_rare_and_extreme(self, spark, sf_dir):
        """|z| > 3 rows are a small fraction and every reported z clears the
        threshold."""
        out = REGISTRY["anomaly_zscore"].fn(spark, sf_dir)
        n_total = load(spark, sf_dir, "events").count()
        rows = out.collect()
        assert all(abs(r.zscore) > 3.0 for r in rows)
        assert len(rows) < 0.05 * n_total, f"{len(rows)}/{n_total} flagged"

    def test_kmeans_partitions_corpus(self, spark, sf_dir):
        """Cluster sizes sum to the corpus; ids stay in [0, K); cohesion is a
        valid cosine."""
        from rvi_big_data_api_spark.operators.llm_sim import KMEANS_K

        rows = REGISTRY["sim_ivf_kmeans"].fn(spark, sf_dir).collect()
        n_corpus = load(spark, sf_dir, "embeddings").count()
        assert sum(r.n_vecs for r in rows) == n_corpus
        assert all(0 <= r.cluster < KMEANS_K for r in rows)
        assert all(-1.0001 <= r.avg_cos_to_centroid <= 1.0001 for r in rows)

    def test_centroid_norm_bounded_by_unit_vectors(self, spark, sf_dir):
        """The mean of unit vectors has norm <= 1 (Jensen); group sizes sum to
        the corpus."""
        rows = REGISTRY["embed_centroids"].fn(spark, sf_dir).collect()
        n_corpus = load(spark, sf_dir, "embeddings").count()
        assert sum(r.n_vecs for r in rows) == n_corpus
        assert all(0.0 <= r.centroid_norm <= 1.0001 for r in rows)

    def test_contamination_ratio_valid(self, spark, sf_dir):
        """Shared grams never exceed the doc's grams; ratio in (0, 1]."""
        rows = REGISTRY["text_contamination"].fn(spark, sf_dir).collect()
        assert rows, "fixture corpus shares vocabulary; expected hits"
        assert all(0 < r.n_shared <= r.n_grams for r in rows)
        assert all(0.0 < r.contamination <= 1.0 for r in rows)

    def test_normalize_never_grows(self, spark, sf_dir):
        """Canonicalization (replace + collapse + trim) cannot lengthen."""
        out = REGISTRY["text_normalize"].fn(spark, sf_dir)
        d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        joined = out.join(d, "doc_id")
        assert joined.filter(F.col("n_chars_norm") > F.col("n_chars")).count() == 0

    def test_repetition_bounds(self, spark, sf_dir):
        """distinct <= words; heaviest term <= words; ratio in (0, 1]."""
        rows = REGISTRY["text_repetition"].fn(spark, sf_dir).collect()
        assert all(0 < r.n_distinct <= r.n_words for r in rows)
        assert all(0 < r.top_tf <= r.n_words for r in rows)
        assert all(0.0 < r.distinct_ratio <= 1.0 for r in rows)

    def test_market_share_bounded(self, spark, sf_dir):
        """A conditional-sum share is a proper fraction of the total."""
        rows = REGISTRY["composite_market_share"].fn(spark, sf_dir).collect()
        assert rows and all(0.0 <= r.mkt_share <= 1.0 for r in rows)

    def test_customer_dist_accounts_for_everyone(self, spark, sf_dir):
        """Q13: the histogram's customer total equals the customer table."""
        rows = REGISTRY["composite_customer_dist"].fn(spark, sf_dir).collect()
        n_cust = load(spark, sf_dir, "customer").count()
        assert sum(r.custdist for r in rows) == n_cust


class TestRound3Invariants:
    def test_bitmap_distinct_equals_exact(self, spark, sf_dir):
        """The bitmap formulation is exact: per-channel counts must equal
        count_distinct bit for bit."""
        got = {
            r["event_type"]: r["n_distinct_users"]
            for r in REGISTRY["agg_bitmap_distinct"].fn(spark, sf_dir).collect()
        }
        exact = {
            r["event_type"]: r["n"]
            for r in load(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert got == exact

    def test_cdc_merge_covers_every_key_once(self, spark, sf_dir):
        out = REGISTRY["cdc_merge"].fn(spark, sf_dir)
        n_keys = load(spark, sf_dir, "events").select("user_id").distinct().count()
        assert out.count() == n_keys
        assert out.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0

    def test_cdc_merge_update_means_key_on_both_sides(self, spark, sf_dir):
        from rvi_big_data_api_spark.operators.telemetry import CDC_CUTOFF_DAY

        ev = load(spark, sf_dir, "events")
        base_keys = {
            r["user_id"]
            for r in ev.filter(F.dayofmonth("ts") < CDC_CUTOFF_DAY)
            .select("user_id").distinct().collect()
        }
        chg_keys = {
            r["user_id"]
            for r in ev.filter(F.dayofmonth("ts") >= CDC_CUTOFF_DAY)
            .select("user_id").distinct().collect()
        }
        for r in REGISTRY["cdc_merge"].fn(spark, sf_dir).collect():
            u, act = r["user_id"], r["merge_action"]
            expected = (
                "update" if u in base_keys and u in chg_keys
                else "insert" if u in chg_keys
                else "unchanged"
            )
            assert act == expected, (u, act, expected)

    def test_sim_range_agrees_with_topk_scoring(self, spark, sf_dir):
        """Every in-radius neighbor of a query must score >= the radius when
        re-scored by the top-k machinery (shared dot fold)."""
        from rvi_big_data_api_spark.operators.llm_sim import SIM_RANGE_R

        out = REGISTRY["sim_range"].fn(spark, sf_dir)
        assert out.filter(F.col("dot") < SIM_RANGE_R - 1e-4).count() == 0

    def test_gemm_pair_set_equals_hof_pair_set(self, spark, sf_dir):
        """The Arrow GEMM twin and the JVM fold must produce the SAME pair
        set (metamorphic: two executions of one spec)."""
        a = rows_of(REGISTRY["sim_pairs"].fn(spark, sf_dir).select("vec_a", "vec_b"))
        b = rows_of(REGISTRY["sim_pairs_gemm"].fn(spark, sf_dir).select("vec_a", "vec_b"))
        assert a == b

    def test_trip_distance_trips_subset_of_sessionize(self, spark, sf_dir):
        """Every multi-fix trip reported by trip_distance must exist in
        trip_sessionize with n_events = n_legs + 1."""
        td = {
            (r["user_id"], r["session_id"]): r["n_legs"]
            for r in REGISTRY["trip_distance"].fn(spark, sf_dir).collect()
        }
        ts_ = {
            (r["user_id"], r["session_id"]): r["n_events"]
            for r in REGISTRY["trip_sessionize"].fn(spark, sf_dir).collect()
        }
        for key, n_legs in td.items():
            assert key in ts_ and ts_[key] == n_legs + 1, key


class TestRound4CorpusOps:
    def test_pack_sequences_conserves_tokens_and_ids_contiguous(self, spark, sf_dir):
        """Packing is a partition of the corpus: per lang, sum of packed
        tokens equals the corpus token count and seq_ids are contiguous
        from 0 (a doc is assigned to exactly one sequence)."""
        packed = REGISTRY["corpus_pack_sequences"].fn(spark, sf_dir)
        per_lang = {
            r.lang: r
            for r in packed.groupBy("lang")
            .agg(
                F.sum("n_tokens").alias("tok"),
                F.sum("n_docs").alias("docs"),
                F.min("seq_id").alias("lo"),
                F.max("seq_id").alias("hi"),
                F.countDistinct("seq_id").alias("n_seq"),
            )
            .collect()
        }
        truth = {
            r.lang: r
            for r in load(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(
                F.sum(F.size(F.split("text", " "))).alias("tok"),
                F.count(F.lit(1)).alias("docs"),
            )
            .collect()
        }
        assert set(per_lang) == set(truth)
        for lang, row in per_lang.items():
            assert row.tok == truth[lang].tok, lang
            assert row.docs == truth[lang].docs, lang
            assert row.lo == 0 and row.n_seq == row.hi + 1, lang  # contiguous

    def test_quality_pipeline_covers_every_doc_once(self, spark, sf_dir):
        """The filter manifest has exactly one verdict per input document,
        and its per-rule counts agree with the standalone operators it
        composes (duplicates with dedup_exact's complement, length/stopword
        verdicts with text_quality's on the non-duplicate slice)."""
        manifest = REGISTRY["corpus_quality_pipeline"].fn(spark, sf_dir)
        docs = load(spark, sf_dir, "documents")
        assert manifest.count() == docs.count()
        assert manifest.select("doc_id").distinct().count() == docs.count()
        n_dup = manifest.filter(F.col("verdict") == "duplicate").count()
        n_kept_exact = REGISTRY["dedup_exact"].fn(spark, sf_dir).count()
        assert n_dup == docs.count() - n_kept_exact
        # every non-duplicate length/stopword verdict matches text_quality
        tq = {
            r.doc_id: r.verdict
            for r in REGISTRY["text_quality"].fn(spark, sf_dir).collect()
        }
        for r in manifest.filter(
            F.col("verdict").isin("too_short", "too_long", "stopword_heavy")
        ).collect():
            assert tq[r.doc_id] == r.verdict, r.doc_id

    def test_embed_quantize_error_bound(self, spark, sf_dir):
        """Symmetric int8 quantization of a 64-dim unit vector has per-dim
        error ≤ 1/(2·127), so L2 error ≤ sqrt(64)·(1/254) ≈ 0.0315 — and
        self-similarity of unit vectors stays near 1."""
        rows = REGISTRY["embed_quantize"].fn(spark, sf_dir).collect()
        assert len(rows) == 10
        for r in rows:
            assert 0.0 <= r.max_err <= 0.0315, r
            assert r.min_self_dot >= 0.99, r


class TestRound4ThirdWave:
    def test_cc_formulations_agree(self, spark, sf_dir):
        """dedup_cluster (1-hop min-label) and dedup_cluster_pd (pointer
        doubling) label the SAME gram graph — their outputs must be
        identical row-for-row, not merely both plausible."""
        a = sorted(
            map(tuple, REGISTRY["dedup_cluster"].fn(spark, sf_dir).collect())
        )
        b = sorted(
            map(tuple, REGISTRY["dedup_cluster_pd"].fn(spark, sf_dir).collect())
        )
        assert a == b

    def test_embed_cluster_consistent_with_pair_graph(self, spark, sf_dir):
        """Every cosine-≥-CLUSTER_TAU bucket pair must land both endpoints in
        the same cluster with a representative ≤ both ids, and every cluster
        id must be one of its own members (the min, by construction)."""
        import pyspark.sql.functions as F

        from rvi_big_data_api_spark.io import load
        from rvi_big_data_api_spark.operators.llm_dedup import (
            DEDUP_EMBED_CLUSTER_TAU,
        )
        from rvi_big_data_api_spark.operators.llm_sim import dot, signbit_bucket

        clusters = {
            r.vec_id: r.cluster_id
            for r in REGISTRY["dedup_embed_cluster"].fn(spark, sf_dir).collect()
        }
        e = load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding", signbit_bucket(F.col("embedding")).alias("b")
        )
        a, b = e.alias("a"), e.alias("b")
        pairs = (
            a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.vec_id") < F.col("b.vec_id")))
            .filter(dot(F.col("a.embedding"), F.col("b.embedding")) >= DEDUP_EMBED_CLUSTER_TAU)
            .select(F.col("a.vec_id").alias("u"), F.col("b.vec_id").alias("v"))
            .collect()
        )
        assert pairs, "fixture should contain semantic near-dups at cluster tau"
        for r in pairs:
            assert clusters[r.u] == clusters[r.v], r
            assert clusters[r.u] <= r.u, r
        members = set(clusters)
        assert set(clusters.values()) <= members

    def test_shard_split_partitions_the_corpus(self, spark, sf_dir):
        """The three splits are disjoint by construction (a doc's split is a
        pure function of doc_id); their doc counts must sum to the corpus."""
        from rvi_big_data_api_spark.io import load

        split_rows = REGISTRY["corpus_shard_split"].fn(spark, sf_dir).collect()
        assert sum(r.n_docs for r in split_rows) == load(spark, sf_dir, "documents").count()
        splits = {r.split for r in split_rows}
        assert splits == {"train", "val", "test"}
        n_train = sum(r.n_docs for r in split_rows if r.split == "train")
        # 12/16 nibble share; binomial 3σ at n=500 is ~±0.06
        assert 0.65 <= n_train / sum(r.n_docs for r in split_rows) <= 0.85

    def test_importance_sample_is_quality_monotone(self, spark, sf_dir):
        """Full-weight docs (n_chars ≥ IMPORTANCE_FULL_CHARS) are ALWAYS
        kept: their threshold is ffffffff and every md5 prefix sorts below
        it — the deterministic analogue of 'probability 1'."""
        from rvi_big_data_api_spark.io import load
        from rvi_big_data_api_spark.operators.llm_text import IMPORTANCE_FULL_CHARS

        d = load(spark, sf_dir, "documents")
        full = d.filter(F.col("n_chars") >= IMPORTANCE_FULL_CHARS)
        kept = REGISTRY["corpus_importance_sample"].fn(spark, sf_dir)
        n_full = full.count()
        n_kept = kept.agg(F.sum("n_kept")).collect()[0][0]
        assert n_kept >= n_full, (n_kept, n_full)

    def test_multiprobe_recall_dominates_single_probe(self, spark, sf_dir):
        """Multi-probe searches a superset of the single-probe bucket, so
        per-query recall@k against exhaustive ground truth can only rise."""
        exact = {}
        for r in REGISTRY["sim_topk"].fn(spark, sf_dir).collect():
            exact.setdefault(r.qid, set()).add(r.vec_id)

        def recall(name):
            got = {}
            for r in REGISTRY[name].fn(spark, sf_dir).collect():
                got.setdefault(r.qid, set()).add(r.vec_id)
            return {q: len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact}

        single, multi = recall("sim_topk_ann"), recall("sim_topk_multiprobe")
        for q in exact:
            assert multi[q] >= single[q], (q, single[q], multi[q])
        assert sum(multi.values()) > sum(single.values()), (single, multi)


class TestRound5Invariants:
    def test_salted_distinct_agrees_with_plain(self, spark, sf_dir):
        """The two-phase salted rewrite is EXACT — it must agree with the
        single-pass countDistinct bit-for-bit on every group."""
        plain = {
            r.event_type: (r.n_users, r.n_events)
            for r in REGISTRY["agg_count_distinct"].fn(spark, sf_dir).collect()
        }
        salted = {
            r.event_type: (r.n_users, r.n_events)
            for r in REGISTRY["agg_distinct_salted"].fn(spark, sf_dir).collect()
        }
        assert plain == salted

    def test_incremental_dedup_statuses_partition_batch(self, spark, sf_dir):
        """Statuses are exhaustive and consistent with the match counts, and
        every batch doc appears exactly once."""
        from rvi_big_data_api_spark.operators.llm_dedup import INCR_CUTOFF

        rows = REGISTRY["dedup_incremental"].fn(spark, sf_dir).collect()
        n_batch = (
            load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") >= INCR_CUTOFF)
            .count()
        )
        assert len(rows) == n_batch
        assert len({r.doc_id for r in rows}) == n_batch
        for r in rows:
            if r.status == "exact_dup":
                assert r.n_exact > 0
            elif r.status == "near_dup":
                assert r.n_exact == 0 and r.n_near > 0
            else:
                assert r.status == "new" and r.n_exact == 0 and r.n_near == 0

    def test_perplexity_buckets_cover_corpus_and_order(self, spark, sf_dir):
        """Quintiles are dense 1..5, doc counts sum to the corpus, and the
        cross-entropy envelope is non-decreasing across buckets."""
        from rvi_big_data_api_spark.operators.llm_text import PPL_BUCKETS

        rows = sorted(
            REGISTRY["corpus_perplexity_filter"].fn(spark, sf_dir).collect(),
            key=lambda r: r.bucket,
        )
        assert [r.bucket for r in rows] == list(range(1, PPL_BUCKETS + 1))
        n_docs = load(spark, sf_dir, "documents").count()
        assert sum(r.n_docs for r in rows) == n_docs
        for lo, hi in zip(rows, rows[1:]):
            assert hi.min_xent >= lo.max_xent - 1e-9, (lo, hi)

    def test_dedup_watermark_emits_each_event_once(self, spark, sf_dir):
        out = REGISTRY["stream_dedup_watermark"].fn(spark, sf_dir)
        n_events = load(spark, sf_dir, "events").count()
        assert out.count() == n_events
        assert out.select("event_id").distinct().count() == n_events

    def test_crypto_roundtrip_is_identity(self, spark, sf_dir):
        out = REGISTRY["fn_crypto"].fn(spark, sf_dir)
        orig = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 100)
            .select(F.col("c_custkey"), F.col("c_name"))
        )
        joined = out.join(orig, "c_custkey")
        assert joined.filter(F.col("name_roundtrip") != F.col("c_name")).count() == 0
        assert joined.filter(~F.col("wrong_key_is_null")).count() == 0

    def test_pq_codebook_partitions_subspaces(self, spark, sf_dir):
        """Every (subspace, code) cell is populated, codes stay in range,
        and populations sum to corpus size per subspace."""
        from rvi_big_data_api_spark.operators.llm_sim import PQ_K, PQ_M

        rows = REGISTRY["embed_pq_codebook"].fn(spark, sf_dir).collect()
        assert len(rows) == PQ_M * PQ_K
        n_vecs = load(spark, sf_dir, "embeddings").count()
        per_m = {}
        for r in rows:
            assert 0 <= r.code < PQ_K and 0 <= r.m < PQ_M
            assert r.avg_dist2 >= 0
            per_m[r.m] = per_m.get(r.m, 0) + r.n_vecs
        assert all(v == n_vecs for v in per_m.values()), per_m

    def test_adc_topk_shape_and_nonnegative(self, spark, sf_dir):
        from rvi_big_data_api_spark.operators.llm_sim import (
            SIM_TOPK_K,
            SIM_TOPK_NQUERIES,
        )

        rows = REGISTRY["sim_adc_topk"].fn(spark, sf_dir).collect()
        assert len(rows) == SIM_TOPK_K * SIM_TOPK_NQUERIES
        for r in rows:
            assert r.adist2 >= -1e-9 and 1 <= r.rank <= SIM_TOPK_K
            assert r.vec_id != r.qid


class TestContinuationInvariants:
    """Cross-op consistency for the round-5 continuation operators."""

    def test_global_shuffle_blocks_partition_corpus(self, spark, sf_dir):
        """Every document lands in exactly one block; all blocks are full
        (the fixture's corpus size is a multiple of SHUFFLE_BLOCK) and the
        mix audit's shares are well-formed."""
        from rvi_big_data_api_spark.operators.llm_text import SHUFFLE_BLOCK

        rows = REGISTRY["corpus_global_shuffle"].fn(spark, sf_dir).collect()
        n_docs_total = load(spark, sf_dir, "documents").count()
        assert sum(r["n_docs"] for r in rows) == n_docs_total
        assert sorted(r["block"] for r in rows) == list(range(len(rows)))
        for r in rows:
            assert r["n_docs"] == SHUFFLE_BLOCK
            assert 0 < r["max_source_frac"] <= 1.0
            assert r["n_sources"] <= r["n_docs"]

    def test_fleet_report_consistent_with_subsystems(self, spark, sf_dir):
        """The daily report's columns must re-aggregate to the standalone
        subsystem totals: trip starts sum to the sessionize trip count,
        event volume sums to the table size, and active counts stay within
        the fleet size."""
        rep = REGISTRY["fleet_daily_report"].fn(spark, sf_dir).collect()
        n_trips = (
            sessionized_events(spark, sf_dir)
            .select("user_id", "session_id")
            .distinct()
            .count()
        )
        ev = load(spark, sf_dir, "events")
        assert sum(r["n_trip_starts"] for r in rep) == n_trips
        assert sum(r["n_events"] for r in rep) == ev.count()
        fleet = ev.select("user_id").distinct().count()
        assert all(0 < r["n_active"] <= fleet for r in rep)

    def test_flow_matrix_conserves_movements(self, spark, sf_dir):
        """Total directed moves = (fixes - vehicles) - same-cell hops: each
        vehicle contributes exactly n_fixes - 1 transitions, and the matrix
        drops only the same-cell ones — nothing else may vanish."""
        from rvi_big_data_api_spark.operators.telemetry import GRID_CELL_DEG

        ev = load(spark, sf_dir, "events")
        n_fixes = ev.count()
        n_vehicles = ev.select("user_id").distinct().count()
        rows = REGISTRY["geo_flow_matrix"].fn(spark, sf_dir).collect()
        n_moves = sum(r["n_moves"] for r in rows)
        assert n_moves <= n_fixes - n_vehicles
        # movements dominate at fixture scale (cells are coarse but fixes
        # jump cells almost every report) — guard against an accidentally
        # inverted same-cell filter dropping everything
        assert n_moves > (n_fixes - n_vehicles) * 0.5

    def test_incremental_resume_processes_only_new_files(self, spark, sf_dir):
        """The exactly-once sharp edge: after the checkpointed restart, the
        second pass's input volume must be ONLY the newly-landed half of
        the corpus — replaying old files would double it, losing state
        would still show in the (oracle-checked) totals. Asserted from the
        streams' own progress counters."""
        import glob
        import json
        import os
        import tempfile

        before = set(glob.glob(os.path.join(tempfile.gettempdir(), "inc_ckpt_*")))
        out = REGISTRY["stream_incremental_resume"].fn(spark, sf_dir).collect()
        n_total = load(spark, sf_dir, "events").count()
        assert sum(r["n_events"] for r in out) == n_total
        (ckpt,) = set(glob.glob(os.path.join(tempfile.gettempdir(), "inc_ckpt_*"))) - before
        # the file-source commit log: one file per completed micro-batch
        commits = sorted(
            f for f in os.listdir(os.path.join(ckpt, "sources", "0"))
            if f.isdigit()
        )
        assert len(commits) >= 2  # at least one batch per pass
        seen_per_batch = []
        for c in commits:
            with open(os.path.join(ckpt, "sources", "0", c)) as fh:
                lines = [ln for ln in fh if ln.strip().startswith("{")]
            seen_per_batch.append(len(lines))
        # every staged file is ingested exactly once across all batches
        n_halves = 2
        assert sum(seen_per_batch) == n_halves


class TestBandOrLsh:
    def test_bandor_membership_and_bounds(self, spark, sf_dir):
        """Every emitted pair must (a) order vec_a < vec_b uniquely, (b) pass
        the cosine gate, and (c) report n_tables equal to the number of
        8-dim sign slices the two vectors actually agree on — recomputed
        independently in Python from the raw embeddings."""
        import numpy as np

        from rvi_big_data_api_spark.operators.llm_dedup import (
            BANDOR_BITS,
            BANDOR_TABLES,
            DEDUP_EMBED_TAU,
        )

        emb = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in load(spark, sf_dir, "embeddings").collect()
        }
        rows = REGISTRY["dedup_embed_bandor"].fn(spark, sf_dir).collect()
        seen = set()
        for r in rows:
            assert r.vec_a < r.vec_b
            assert (r.vec_a, r.vec_b) not in seen
            seen.add((r.vec_a, r.vec_b))
            assert 1 <= r.n_tables <= BANDOR_TABLES
            a, b = emb[r.vec_a], emb[r.vec_b]
            assert float(a @ b) >= DEDUP_EMBED_TAU
            n_agree = sum(
                1
                for t in range(BANDOR_TABLES)
                if all(
                    (a[t * BANDOR_BITS + i] > 0) == (b[t * BANDOR_BITS + i] > 0)
                    for i in range(BANDOR_BITS)
                )
            )
            assert r.n_tables == n_agree, (r.vec_a, r.vec_b, r.n_tables, n_agree)

    def test_bandor_catches_every_table0_pair(self, spark, sf_dir):
        """OR semantics: any tau-pair bucketed together by table 0 alone must
        appear in the band-OR output (single-table results are a subset)."""
        import numpy as np

        from rvi_big_data_api_spark.operators.llm_dedup import (
            BANDOR_BITS,
            DEDUP_EMBED_TAU,
        )

        vecs = [
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
            for r in load(spark, sf_dir, "embeddings").collect()
        ]
        got = {
            (r.vec_a, r.vec_b)
            for r in REGISTRY["dedup_embed_bandor"].fn(spark, sf_dir).collect()
        }
        for i in range(len(vecs)):
            for j in range(i + 1, len(vecs)):
                ia, a = vecs[i]
                ib, b = vecs[j]
                if ia > ib:
                    ia, ib, a, b = ib, ia, b, a
                same_bucket = all(
                    (a[k] > 0) == (b[k] > 0) for k in range(BANDOR_BITS)
                )
                if same_bucket and float(a @ b) >= DEDUP_EMBED_TAU:
                    assert (ia, ib) in got, (ia, ib)


class TestRound5ContinuationOps:
    """Invariants for the round-5 continuation block (pagination, imputation,
    corpus monitors, kNN graph, PCA)."""

    def test_limit_offset_is_the_page_after_the_head(self, spark, sf_dir):
        """OFFSET 20 LIMIT 10 must equal rows 21-30 of the head-30."""
        page = [r.o_orderkey for r in REGISTRY["limit_offset"].fn(spark, sf_dir).collect()]
        head30 = (
            load(spark, sf_dir, "orders")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(30)
            .collect()
        )
        assert page == [r.o_orderkey for r in head30[20:]]

    def test_clean_impute_preserves_observed_values(self, spark, sf_dir):
        """Non-masked rows pass through bit-identically; imputed rows take
        their channel's median of the observed values."""
        out = {r.event_id: r for r in REGISTRY["clean_impute"].fn(spark, sf_dir).collect()}
        orig = {r.event_id: r.value for r in load(spark, sf_dir, "events").collect()}
        n_imputed = 0
        for eid, r in out.items():
            if r.was_imputed:
                n_imputed += 1
            else:
                assert abs(r.value_filled - round(orig[eid], 6)) < 1e-9, eid
        # the md5 mask hits ~1/16 of rows
        assert 0.02 < n_imputed / len(out) < 0.12

    def test_zipf_slope_is_negative_and_fit_tight(self, spark, sf_dir):
        """Frequency must fall with rank (slope < 0) for every language."""
        for r in REGISTRY["text_zipf_fit"].fn(spark, sf_dir).collect():
            assert r.zipf_slope < 0, r
            assert 0 <= r.zipf_r2 <= 1, r

    def test_psi_terms_nonnegative_and_total_consistent(self, spark, sf_dir):
        """Each PSI contribution is >= 0 by construction ((p-q) and ln(p/q)
        share sign) and the emitted total equals the sum of terms."""
        rows = REGISTRY["corpus_drift_psi"].fn(spark, sf_dir).collect()
        total = rows[0].psi_total
        assert all(abs(r.psi_total - total) < 1e-9 for r in rows)
        assert all(r.psi_term >= 0 for r in rows)
        assert abs(sum(r.psi_term for r in rows) - total) < 1e-4
        # even/odd split of one corpus: distributions near-identical
        assert total < 0.1, total

    def test_knn_graph_edges_are_mutual_and_canonical(self, spark, sf_dir):
        """Every emitted edge is canonically oriented and appears in BOTH
        endpoints' directed top-k lists (recomputed exactly per bucket)."""
        from rvi_big_data_api_spark.operators.llm_sim import KNN_GRAPH_K

        import numpy as np

        vecs = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in load(spark, sf_dir, "embeddings").collect()
        }
        bucket = {
            vid: sum((1 << k) for k in range(4) if v[k] > 0) for vid, v in vecs.items()
        }
        # directed exact top-k within bucket
        topk = {}
        for vid, v in vecs.items():
            cands = [
                (-(v @ vecs[o]), o)
                for o in vecs
                if o != vid and bucket[o] == bucket[vid]
            ]
            cands.sort()
            topk[vid] = {o for _, o in cands[:KNN_GRAPH_K]}
        got = REGISTRY["knn_graph_mutual"].fn(spark, sf_dir).collect()
        assert len(got) > 0
        for r in got:
            assert r.vec_a < r.vec_b, r
            assert r.vec_b in topk[r.vec_a] and r.vec_a in topk[r.vec_b], r
        # completeness: every mutual pair is emitted
        expect = {
            (a, b)
            for a in vecs
            for b in topk[a]
            if a < b and a in topk[b]
        }
        assert {(r.vec_a, r.vec_b) for r in got} == expect

    def test_pca_scores_centered_with_dominant_variance(self, spark, sf_dir):
        """PC1 scores are mean-zero and carry at least as much variance as
        any single raw dimension (the dominant-direction property survives
        the fixed 2-round approximation on the fixture)."""
        import numpy as np

        scores = np.array(
            [r.pc1 for r in REGISTRY["embed_pca_power"].fn(spark, sf_dir).collect()]
        )
        X = np.array(
            [r.embedding for r in load(spark, sf_dir, "embeddings").collect()],
            dtype=np.float64,
        )
        assert abs(scores.mean()) < 1e-3
        per_dim_var = ((X - X.mean(axis=0)) ** 2).mean(axis=0).max()
        assert scores.var() >= per_dim_var * 0.99, (scores.var(), per_dim_var)

    def test_leakage_safe_split_never_splits_a_cluster(self, spark, sf_dir):
        """Every near-dup cluster lands in exactly one split, members of the
        same cluster agree with dedup_cluster's labeling, and all three
        splits are populated roughly per the 12/2/2 nibble thresholds."""
        rows = REGISTRY["corpus_split_leakage_safe"].fn(spark, sf_dir).collect()
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, set()).add(r.split)
        assert all(len(s) == 1 for s in by_cluster.values())
        n = len(rows)
        frac_train = sum(r.split == "train" for r in rows) / n
        assert 0.55 < frac_train < 0.9, frac_train
        assert {r.split for r in rows} == {"train", "val", "test"}
        # consistency with the canonical CC labeling
        cc = {
            r.doc_id: r.cluster_id
            for r in REGISTRY["dedup_cluster"].fn(spark, sf_dir).collect()
        }
        for r in rows:
            assert cc.get(r.doc_id, r.doc_id) == r.cluster_id, r

    def test_label_propagation_seeds_clamped_and_rounds_monotone(self, spark, sf_dir):
        """Seeds keep ground truth, each node is labeled at most once, and a
        round-2 node must have had no labeled neighbor after round 1."""
        from rvi_big_data_api_spark.operators.llm_sim import LP_SEEDS

        rows = REGISTRY["graph_label_propagation"].fn(spark, sf_dir).collect()
        seen = {}
        truth = {
            r.vec_id: r.label for r in load(spark, sf_dir, "embeddings").collect()
        }
        for r in rows:
            assert r.vec_id not in seen, f"{r.vec_id} labeled twice"
            seen[r.vec_id] = r
            if r.vec_id < LP_SEEDS:
                assert r.src_round == 0 and r.pred_label == truth[r.vec_id], r
            else:
                assert r.src_round in (1, 2), r
        # propagation actually reached beyond the seeds
        assert any(r.src_round == 1 for r in rows)

    def test_containment_dominates_jaccard_and_is_directional(self, spark, sf_dir):
        """For every emitted (contained, container) pair the containment is
        >= that pair's Jaccard, and containment is correctly normalized by
        the contained side."""
        cont = REGISTRY["dedup_containment"].fn(spark, sf_dir).collect()
        assert len(cont) > 0
        jac = {
            tuple(sorted((r.doc_a, r.doc_b))): r.jaccard
            for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).collect()
        }
        for r in cont:
            assert 0 < r.containment <= 1.0001, r
            assert abs(r.containment - round(r.n_common / r.n_grams_contained, 4)) < 1e-9
            key = tuple(sorted((r.doc_contained, r.doc_container)))
            if key in jac:
                assert r.containment >= jac[key] - 1e-9, (r, jac[key])

    def test_maxsim_bounds_single_vector_dot(self, spark, sf_dir):
        """MaxSim with the full-vector split is >= the plain dot product of
        the same pair (each subspace's best match is at least the aligned
        one), and ranks are a permutation of 1..k per query."""
        import numpy as np

        from rvi_big_data_api_spark.operators.llm_sim import PQ_M, PQ_SUB

        vecs = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in load(spark, sf_dir, "embeddings").collect()
        }
        out = REGISTRY["sim_maxsim_multivector"].fn(spark, sf_dir).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r.qid, []).append(r.rank)
            plain = float(vecs[r.qid] @ vecs[r.vec_id])
            assert r.maxsim >= plain - 1e-6, r
            # and bounded by sum of subspace norms products
            q, d = vecs[r.qid], vecs[r.vec_id]
            ub = sum(
                np.linalg.norm(q[m * PQ_SUB:(m + 1) * PQ_SUB])
                * max(
                    np.linalg.norm(d[j * PQ_SUB:(j + 1) * PQ_SUB])
                    for j in range(PQ_M)
                )
                for m in range(PQ_M)
            )
            assert r.maxsim <= ub + 1e-6, r
        for q, ranks in per_q.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))

    def test_seq_pattern_counts_against_python_regex(self, spark, sf_dir):
        """Recompute a sample of session strings in Python and compare the
        regex occurrence counts; totals stay session-conserving."""
        import re

        from rvi_big_data_api_spark.operators.telemetry import (
            SEQ_FUNNEL_PATTERN,
            sessionized_events,
        )

        out = REGISTRY["seq_pattern_detect"].fn(spark, sf_dir).collect()
        ev = (
            sessionized_events(spark, sf_dir)
            .withColumn("ch", F.substring("event_type", 1, 1))
            .collect()
        )
        seqs = {}
        for r in sorted(ev, key=lambda r: (r.user_id, r.session_id, r.sec, r.event_id)):
            seqs.setdefault((r.user_id, r.session_id), []).append(r.ch)
        assert len(out) == len(seqs)
        pat = re.compile(SEQ_FUNNEL_PATTERN)
        for r in out:
            s = "".join(seqs[(r.user_id, r.session_id)])
            assert r.n_events == len(s), r
            assert r.n_funnels == len(pat.findall(s)), (r, s)
            assert r.has_error == ("e" in s), r

    def test_stream_psi_self_reference_near_zero_on_dense_windows(self, spark, sf_dir):
        """Scoring the stream against its own whole-corpus reference: windows with
        many events must sit near zero PSI (the smoothed histogram converges
        to the reference), and every PSI is >= 0."""
        rows = REGISTRY["stream_psi_drift"].fn(spark, sf_dir).collect()
        assert all(r.psi >= 0 for r in rows)
        dense = [r for r in rows if r.n_events >= 50]
        if dense:
            assert all(r.psi < 0.5 for r in dense)

    def test_outlier_score_matches_numpy_and_flag_consistent(self, spark, sf_dir):
        """Recompute diagonal Mahalanobis in numpy; scores agree to 4 dp and
        the flag equals (rounded score > fence)."""
        import numpy as np

        from rvi_big_data_api_spark.operators.llm_sim import OUTLIER_MD_TAU

        X = np.array(
            [
                (r.vec_id, *r.embedding)
                for r in load(spark, sf_dir, "embeddings").collect()
            ],
            dtype=np.float64,
        )
        ids, V = X[:, 0].astype(int), X[:, 1:]
        mu, var = V.mean(axis=0), V.var(axis=0)
        md = np.sqrt(((V - mu) ** 2 / var).sum(axis=1) / V.shape[1])
        expect = dict(zip(ids.tolist(), md.tolist()))
        rows = REGISTRY["embed_outlier_score"].fn(spark, sf_dir).collect()
        for r in rows:
            assert abs(r.md - round(expect[r.vec_id], 4)) <= 1e-4, r
            assert r.is_outlier == (r.md > OUTLIER_MD_TAU), r

    def test_weighted_median_defining_property(self, spark, sf_dir):
        """The weighted median m of each group satisfies the defining
        inequality: weight of {value < m} < tot/2 and weight of
        {value <= m} >= tot/2."""
        rows = REGISTRY["agg_weighted_median"].fn(spark, sf_dir).collect()
        ev = load(spark, sf_dir, "events").collect()
        groups = {}
        for e in ev:
            groups.setdefault(e.event_type, []).append((e.value, 1 + e.user_id % 3))
        assert len(rows) == len(groups)
        for r in rows:
            vw = groups[r.event_type]
            tot = sum(w for _, w in vw)
            assert r.total_weight == tot
            below = sum(w for v, w in vw if v < r.w_median)
            at_or_below = sum(w for v, w in vw if v <= r.w_median)
            assert below < tot / 2.0 <= at_or_below, r

    def test_novelty_bounds_and_dup_docs_score_low(self, spark, sf_dir):
        """Novelty is a valid fraction everywhere, and documents that near-dup
        ops pair up score strictly lower novelty than the corpus median."""
        rows = REGISTRY["text_novelty_score"].fn(spark, sf_dir).collect()
        by_doc = {r.doc_id: r for r in rows}
        for r in rows:
            assert 0 <= r.novelty <= 1 and r.n_unique <= r.n_grams, r
        novs = sorted(r.novelty for r in rows)
        median = novs[len(novs) // 2]
        dup_docs = set()
        for r in REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).collect():
            dup_docs.add(r.doc_a); dup_docs.add(r.doc_b)
        assert dup_docs
        for d in dup_docs:
            assert by_doc[d].novelty < median, (d, by_doc[d].novelty, median)

    def test_diverse_sample_covers_buckets_with_topk_property(self, spark, sf_dir):
        """Per bucket: ranks are 1..k, lengths are the bucket's true top-k,
        and the sample spans many buckets (the diversity point)."""
        rows = REGISTRY["corpus_diverse_sample"].fn(spark, sf_dir).collect()
        from rvi_big_data_api_spark.operators.llm_sim import DIVERSE_K, signbit_bucket

        per_bucket = {}
        for r in rows:
            per_bucket.setdefault(r.bucket, []).append(r)
        assert len(per_bucket) >= 8  # 4-bit quantizer: most of 16 buckets hit
        docs = {
            r.doc_id: r.n_chars for r in load(spark, sf_dir, "documents").collect()
        }
        buckets = {
            r.vec_id: sum(
                (1 << k) for k in range(4) if r.embedding[k] > 0
            )
            for r in load(spark, sf_dir, "embeddings").collect()
        }
        for b, rs in per_bucket.items():
            assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
            expect = sorted(
                ((-docs[v], v) for v, bb in buckets.items() if bb == b),
            )[: len(rs)]
            got = sorted((-r.n_chars, r.doc_id) for r in rs)
            assert got == expect, (b, got, expect)

    def test_gini_matches_numpy_and_bounds(self, spark, sf_dir):
        """Recompute the Gini coefficient per channel in numpy; values agree
        to 6 dp and sit in [0, 1) for positive data."""
        import numpy as np

        rows = REGISTRY["agg_gini"].fn(spark, sf_dir).collect()
        ev = load(spark, sf_dir, "events").collect()
        groups = {}
        for e in ev:
            groups.setdefault(e.event_type, []).append(e.value)
        for r in rows:
            x = np.sort(np.array(groups[r.event_type]))
            n = len(x)
            g = (2 * np.sum(np.arange(1, n + 1) * x) - (n + 1) * x.sum()) / (n * x.sum())
            assert abs(r.gini - round(float(g), 6)) <= 2e-6, (r, g)
            assert 0 <= r.gini < 1, r

    def test_attribution_conserves_purchases(self, spark, sf_dir):
        """Attributed purchase counts sum to the total purchase count, the
        channel set is only {click,error,signup,view,none}, and a Python
        replay of the last-touch rule agrees per channel."""
        rows = REGISTRY["event_attribution"].fn(spark, sf_dir).collect()
        from rvi_big_data_api_spark.operators.telemetry import ATTRIB_WINDOW_S

        ev = sorted(
            load(spark, sf_dir, "events")
            .selectExpr(
                "user_id", "event_id", "event_type",
                "unix_timestamp(date_trunc('second', ts)) AS sec",
            )
            .collect(),
            key=lambda r: (r.user_id, r.sec, r.event_id),
        )
        expect = {}
        last_touch = {}
        for e in ev:
            if e.event_type == "purchase":
                t = last_touch.get(e.user_id)
                ch = (
                    t[1]
                    if t is not None and e.sec - t[0] <= ATTRIB_WINDOW_S
                    else "none"
                )
                expect[ch] = expect.get(ch, 0) + 1
            else:
                last_touch[e.user_id] = (e.sec, e.event_type)
        got = {r.attributed_channel: r.n_purchases for r in rows}
        assert got == expect
        assert set(got) <= {"click", "error", "signup", "view", "none"}

    def test_ab_report_is_consistent_and_aa_insignificant(self, spark, sf_dir):
        """Counts reconcile with a Python replay of the assignment + metric,
        rates equal x/n, and the A/A hash split stays statistically
        insignificant (|z| < 1.96) — the fixture has no real treatment."""
        import hashlib

        r = REGISTRY["ab_experiment_report"].fn(spark, sf_dir).collect()[0]
        ev = load(spark, sf_dir, "events").collect()
        users = {}
        for e in ev:
            conv = e.event_type == "purchase" and e.value > 150
            users[e.user_id] = users.get(e.user_id, False) or conv
        n = {"control": 0, "treatment": 0}
        x = {"control": 0, "treatment": 0}
        for uid, conv in users.items():
            arm = "control" if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8" else "treatment"
            n[arm] += 1
            x[arm] += int(conv)
        assert (r.n_c, r.x_c, r.n_t, r.x_t) == (
            n["control"], x["control"], n["treatment"], x["treatment"]
        )
        assert abs(r.rate_control - round(x["control"] / n["control"], 6)) < 1e-9
        assert abs(r.rate_treatment - round(x["treatment"] / n["treatment"], 6)) < 1e-9
        assert abs(r.z_score) < 1.96, r.z_score


class TestMlEvalFamily:
    """Invariants for the ML-eval / feature-engineering family (round-5
    continuation): metric ranges, count conservation, scaling algebra."""

    def test_retrieval_metrics_bounded_and_consistent(self, spark, sf_dir):
        """All three metrics live in [0, 1]; a query whose top-ranked
        retrieved item is relevant has mrr == 1; precision > 0 ⟺ ndcg > 0
        (both are sums over the same hit set)."""
        rows = REGISTRY["eval_retrieval_metrics"].fn(spark, sf_dir).collect()
        from rvi_big_data_api_spark.operators.llm_sim import SIM_TOPK_NQUERIES

        assert len(rows) == SIM_TOPK_NQUERIES
        for r in rows:
            assert 0 <= r.mrr <= 1, r
            assert 0 <= r.precision_at_k <= 1, r
            assert 0 <= r.ndcg_at_k <= 1, r
            assert (r.precision_at_k > 0) == (r.ndcg_at_k > 0), r
            assert (r.precision_at_k > 0) == (r.mrr > 0), r

    def test_retrieval_mrr_dominates_when_first_hit(self, spark, sf_dir):
        """MRR is 1/rank-of-first-hit so it can never be smaller than the
        binary-NDCG contribution of that single first hit."""
        from rvi_big_data_api_spark.operators.ml_eval import RET_IDCG

        import math

        for r in REGISTRY["eval_retrieval_metrics"].fn(spark, sf_dir).collect():
            if r.mrr > 0:
                first_rank = round(1.0 / r.mrr)
                single_hit_ndcg = (1.0 / math.log2(first_rank + 1)) / RET_IDCG
                assert r.ndcg_at_k >= round(single_hit_ndcg, 4) - 1e-9, r

    def test_classification_report_conserves_counts(self, spark, sf_dir):
        """sum(tp) + sum(fn) over classes = number of queries (every query
        has exactly one true label); sum(fp) = sum(fn) (each mistake is one
        fn for the true class and one fp for the predicted class)."""
        from rvi_big_data_api_spark.operators.llm_sim import KNN_NQUERIES

        rows = REGISTRY["eval_classification_report"].fn(spark, sf_dir).collect()
        assert sum(r.tp for r in rows) + sum(r.fn for r in rows) == KNN_NQUERIES
        assert sum(r.fp for r in rows) == sum(r.fn for r in rows)
        for r in rows:
            if r.precision is not None:
                assert 0 <= r.precision <= 1, r
            if r.recall is not None:
                assert 0 <= r.recall <= 1, r

    def test_feature_hashing_conserves_multiplicity(self, spark, sf_dir):
        """Total hashed weight = 2·|customer| + |orders| (two customer
        features + one per order), and every bucket is inside the table."""
        from rvi_big_data_api_spark.operators.ml_eval import FEATURE_HASH_BUCKETS

        rows = REGISTRY["feature_hashing"].fn(spark, sf_dir).collect()
        n_cust = load(spark, sf_dir, "customer").count()
        n_ord = load(spark, sf_dir, "orders").count()
        assert sum(r.weight for r in rows) == 2 * n_cust + n_ord
        assert all(0 <= r.bucket < FEATURE_HASH_BUCKETS for r in rows)

    def test_feature_hashing_is_stateless(self, spark, sf_dir):
        """Same feature string → same bucket across independent plans: the
        encoding carries no fitted state, so two runs agree bucket-for-bucket."""
        a = REGISTRY["feature_hashing"].fn(spark, sf_dir)
        b = REGISTRY["feature_hashing"].fn(spark, sf_dir)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_feature_scaling_algebra(self, spark, sf_dir):
        """Per segment: z-scores average to ~0, minmax spans exactly [0, 1],
        and the robust score is 0 at the median by construction."""
        import collections

        rows = REGISTRY["feature_scaling"].fn(spark, sf_dir).collect()
        by_seg = collections.defaultdict(list)
        for r in rows:
            by_seg[r.segment].append(r)
        for seg, rs in by_seg.items():
            zs = [r.zscore for r in rs]
            assert abs(sum(zs) / len(zs)) < 1e-3, seg
            mms = [r.minmax for r in rs]
            assert min(mms) == 0.0 and max(mms) == 1.0, seg
            assert all(0 <= m <= 1 for m in mms), seg

    def test_welch_t_matches_numpy(self, spark, sf_dir):
        """Recompute Welch's t and the Satterthwaite df driver-side from the
        same md5 arm assignment and compare to 4/2 dp."""
        import hashlib

        import numpy as np

        r = REGISTRY["stats_ttest_welch"].fn(spark, sf_dir).collect()[0]
        spend = {}
        for e in load(spark, sf_dir, "events").collect():
            spend.setdefault(e.user_id, 0.0)
            if e.event_type == "purchase":
                spend[e.user_id] += e.value
        arms = {"control": [], "treatment": []}
        for uid, s in spend.items():
            a = "control" if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8" else "treatment"
            arms[a].append(s)
        c, t = np.array(arms["control"]), np.array(arms["treatment"])
        se2 = c.var(ddof=1) / len(c) + t.var(ddof=1) / len(t)
        t_stat = (t.mean() - c.mean()) / np.sqrt(se2)
        df = se2**2 / (
            (c.var(ddof=1) / len(c)) ** 2 / (len(c) - 1)
            + (t.var(ddof=1) / len(t)) ** 2 / (len(t) - 1)
        )
        assert (r.n_c, r.n_t) == (len(c), len(t))
        assert abs(r.t_stat - round(t_stat, 4)) < 1e-9
        assert abs(r.df - round(df, 2)) < 1e-9

    def test_calibration_bins_conserve_queries(self, spark, sf_dir):
        """Bin populations sum to the query count; confidences live in the
        bin's interval; gap = mean_confidence - accuracy to rounding."""
        from rvi_big_data_api_spark.operators.llm_sim import KNN_NQUERIES
        from rvi_big_data_api_spark.operators.ml_eval import CALIB_BINS

        rows = REGISTRY["eval_calibration_bins"].fn(spark, sf_dir).collect()
        assert sum(r.n for r in rows) == KNN_NQUERIES
        for r in rows:
            assert 1 <= r.bin <= CALIB_BINS, r
            lo, hi = (r.bin - 1) / CALIB_BINS, r.bin / CALIB_BINS
            assert lo < r.mean_confidence <= hi + 1e-9, r
            assert abs(r.gap - round(r.mean_confidence - r.accuracy, 4)) <= 1e-4, r

    def test_target_encode_excludes_own_row(self, spark, sf_dir):
        """Leave-one-out: recompute one segment's encoding driver-side and
        check a sampled row's encoded value excludes its own target."""
        from rvi_big_data_api_spark.operators.ml_eval import TARGET_ENCODE_M

        seg_rows = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "o_totalprice", "c_mktsegment")
            .collect()
        )
        gmean = sum(r.o_totalprice for r in seg_rows) / len(seg_rows)
        by_seg = {}
        for r in seg_rows:
            by_seg.setdefault(r.c_mktsegment, []).append(r)
        out = {r.o_orderkey: r.encoded for r in REGISTRY["feature_target_encode"].fn(spark, sf_dir).collect()}
        for seg, rs in by_seg.items():
            tot = sum(r.o_totalprice for r in rs)
            r0 = rs[0]
            expect = (tot - r0.o_totalprice + TARGET_ENCODE_M * gmean) / (
                len(rs) - 1 + TARGET_ENCODE_M
            )
            assert abs(out[r0.o_orderkey] - round(expect, 4)) < 1e-6, seg

    def test_regression_metrics_match_numpy_ols(self, spark, sf_dir):
        """Slope/intercept/RMSE/MAE/R² recomputed with numpy lstsq."""
        import numpy as np

        r = REGISTRY["eval_regression_metrics"].fn(spark, sf_dir).collect()[0]
        pts = (
            load(spark, sf_dir, "lineitem")
            .select(
                F.col("l_quantity").cast("double").alias("x"),
                F.col("l_extendedprice").alias("y"),
            )
            .collect()
        )
        x = np.array([p.x for p in pts])
        y = np.array([p.y for p in pts])
        b, a = np.polyfit(x, y, 1)
        pred = a + b * x
        assert abs(r.slope - round(b, 4)) < 1e-3, (r.slope, b)
        assert abs(r.intercept - round(a, 4)) < 1e-2, (r.intercept, a)
        assert abs(r.rmse - np.sqrt(np.mean((y - pred) ** 2))) < 1e-2
        assert abs(r.mae - np.mean(np.abs(y - pred))) < 1e-2
        sse = np.sum((y - pred) ** 2)
        sst = np.sum((y - y.mean()) ** 2)
        assert abs(r.r2 - (1 - sse / sst)) < 1e-4
        assert 0 <= r.r2 <= 1

    def test_srm_check_counts_and_flag(self, spark, sf_dir):
        """Arm counts = the z-test op's arm counts; chi2 recomputed; the
        nibble split is genuinely 50/50 so no SRM alarm on the fixture."""
        r = REGISTRY["eval_ab_srm_check"].fn(spark, sf_dir).collect()[0]
        ab = REGISTRY["ab_experiment_report"].fn(spark, sf_dir).collect()[0]
        assert (r.n_c, r.n_t) == (ab.n_c, ab.n_t)
        exp = (r.n_c + r.n_t) / 2.0
        chi2 = (r.n_c - exp) ** 2 / exp + (r.n_t - exp) ** 2 / exp
        assert abs(r.chi2 - round(chi2, 4)) < 1e-9
        assert r.srm_flag == (chi2 > 3.841)
        assert not r.srm_flag  # md5 nibbles are uniform; a flag here = bug

    def test_quantile_bin_populations(self, spark, sf_dir):
        """Quartile bins hold ~25 % each (exact-percentile cuts); width bins
        stay inside [0, B); both bin columns are monotone in the value."""
        from rvi_big_data_api_spark.operators.ml_eval import BIN_COUNT

        rows = REGISTRY["feature_quantile_bin"].fn(spark, sf_dir).collect()
        n = len(rows)
        from collections import Counter

        quart = Counter(r.quartile_bin for r in rows)
        assert set(quart) == {1, 2, 3, 4}
        for b, c in quart.items():
            assert abs(c / n - 0.25) < 0.01, (b, c / n)
        assert all(0 <= r.width_bin < BIN_COUNT for r in rows)
        price = {
            r.o_orderkey: r.o_totalprice
            for r in load(spark, sf_dir, "orders").collect()
        }
        ordered = sorted(rows, key=lambda r: price[r.o_orderkey])
        for a, b in zip(ordered, ordered[1:]):
            assert a.width_bin <= b.width_bin
            assert a.quartile_bin <= b.quartile_bin


class TestGraphSecondOrder:
    """k-core peeling and neighborhood-Jaccard invariants."""

    def _edges(self, spark, sf_dir):
        import numpy as np

        rows = load(spark, sf_dir, "embeddings").collect()
        from rvi_big_data_api_spark.operators.llm_sim import SIM_PAIRS_TAU

        by_label = {}
        for r in rows:
            by_label.setdefault(r.label, []).append(
                (r.vec_id, np.array(r.embedding, dtype=np.float64))
            )
        edges = set()
        for label, vs in by_label.items():
            ids = [v[0] for v in vs]
            mat = np.stack([v[1] for v in vs])
            dots = mat @ mat.T
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if dots[i, j] >= SIM_PAIRS_TAU:
                        edges.add((label, ids[i], ids[j]))
        return edges

    def test_kcore_is_fixpoint_and_degrees_hold(self, spark, sf_dir):
        """One more peel round changes nothing (the unrolled depth IS the
        fixpoint on the fixture) and every survivor keeps >= k neighbors
        INSIDE the surviving set — recomputed from scratch driver-side."""
        from rvi_big_data_api_spark.operators.llm_sim import (
            KCORE_K,
            KCORE_ORACLE_PEELS,
        )

        out = {
            (r.label, r.vec_id): r.core_degree
            for r in REGISTRY["graph_kcore"].fn(spark, sf_dir).collect()
        }
        edges = self._edges(spark, sf_dir)
        # driver-side peel to TRUE fixpoint
        alive = {(l, a) for l, a, b in edges} | {(l, b) for l, a, b in edges}
        shrinking_rounds = 0
        while True:
            deg = {}
            for l, a, b in edges:
                if (l, a) in alive and (l, b) in alive:
                    deg[(l, a)] = deg.get((l, a), 0) + 1
                    deg[(l, b)] = deg.get((l, b), 0) + 1
            nxt = {n for n in alive if deg.get(n, 0) >= KCORE_K}
            if nxt == alive:
                break
            alive = nxt
            shrinking_rounds += 1
        # Depth guard (ADVICE r5): the DuckDB oracle unrolls a FIXED
        # KCORE_ORACLE_PEELS rounds while Spark peels to convergence. If a
        # fixture/SF ever needs more peels than the oracle unrolls, the two
        # engines would silently disagree — surface that as a loud test
        # failure here instead of an opaque hash mismatch.
        assert shrinking_rounds <= KCORE_ORACLE_PEELS, (
            f"fixture peel depth {shrinking_rounds} exceeds the oracle's "
            f"unrolled KCORE_ORACLE_PEELS={KCORE_ORACLE_PEELS}; raise the "
            "constant so the oracle reaches the fixpoint"
        )
        assert set(out) == alive  # unrolled rounds reached the fixpoint
        for n, d in out.items():
            assert d == deg[n] and d >= KCORE_K, (n, d)

    def test_jaccard_bounds_and_common_cap(self, spark, sf_dir):
        """jaccard in (0, 1]; n_common <= min(deg_a, deg_b); every emitted
        pair genuinely shares >= 1 neighbor in the recomputed graph."""
        edges = self._edges(spark, sf_dir)
        nbrs = {}
        for l, a, b in edges:
            nbrs.setdefault((l, a), set()).add(b)
            nbrs.setdefault((l, b), set()).add(a)
        rows = REGISTRY["graph_jaccard_neighbors"].fn(spark, sf_dir).collect()
        for r in rows:
            na, nb = nbrs[(r.label, r.vec_a)], nbrs[(r.label, r.vec_b)]
            inter = len(na & nb)
            assert r.n_common == inter and inter >= 1, r
            assert 0 < r.jaccard <= 1, r
            expect = inter / (len(na) + len(nb) - inter)
            assert abs(r.jaccard - round(expect, 4)) < 1e-9, r


class TestFourthWaveAudits:
    """Rank correlation, Benford audit, dedup-funnel report invariants."""

    def test_rank_correlation_matches_numpy(self, spark, sf_dir):
        """Recompute both rankings and exact Spearman driver-side."""
        import numpy as np

        from rvi_big_data_api_spark.operators.ml_eval import RET_DEPTH
        from rvi_big_data_api_spark.operators.llm_sim import SIM_TOPK_NQUERIES

        rows = load(spark, sf_dir, "embeddings").collect()
        vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
        bucket = {
            vid: sum((1 << k) for k in range(4) if v[k] > 0) for vid, v in vecs.items()
        }

        def topd(qid, restrict):
            scored = sorted(
                (
                    (-(vecs[qid] @ v), vid)
                    for vid, v in vecs.items()
                    if vid != qid and (not restrict or bucket[vid] == bucket[qid])
                ),
            )[:RET_DEPTH]
            return [vid for _, vid in scored]

        out = {
            r.qid: r
            for r in REGISTRY["eval_rank_correlation"].fn(spark, sf_dir).collect()
        }
        seen_qids = set()
        for qid in range(SIM_TOPK_NQUERIES):
            exact, ann = topd(qid, False), topd(qid, True)
            common = [v for v in exact if v in ann]
            if not common:
                assert qid not in out
                continue
            seen_qids.add(qid)
            r = out[qid]
            assert r.n_common == len(common)
            if len(common) == 1:
                assert r.spearman_rho is None
                continue
            rx = {v: i + 1 for i, v in enumerate([v for v in exact if v in ann])}
            ra = {v: i + 1 for i, v in enumerate([v for v in ann if v in exact])}
            n = len(common)
            d2 = sum((rx[v] - ra[v]) ** 2 for v in common)
            rho = 1 - 6.0 * d2 / (n * (n * n - 1))
            assert abs(r.spearman_rho - round(rho, 4)) < 1e-9, (qid, r, rho)
            assert -1 <= r.spearman_rho <= 1
        assert seen_qids == set(out)

    def test_benford_conserves_and_is_plausible(self, spark, sf_dir):
        """Digits 1..9 only; observed counts sum to the positive-row count;
        expected counts sum to ~the same total (Benford masses sum to 1)."""
        rows = REGISTRY["agg_benford_check"].fn(spark, sf_dir).collect()
        n_pos = (
            load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0).count()
        )
        assert {r.digit for r in rows} <= set(range(1, 10))
        assert sum(r.n_obs for r in rows) == n_pos
        assert abs(sum(r.n_expected for r in rows) - n_pos) < 1.0
        assert all(r.chi2_term >= 0 for r in rows)

    def test_dedup_report_rungs_are_monotone(self, spark, sf_dir):
        """Canonicalization only merges: n_docs >= exact >= norm >= bag,
        rates in [0, 1), and per-source docs sum to the corpus size."""
        rows = REGISTRY["corpus_dedup_report"].fn(spark, sf_dir).collect()
        assert sum(r.n_docs for r in rows) == load(spark, sf_dir, "documents").count()
        for r in rows:
            assert r.n_docs >= r.n_exact_unique >= r.n_norm_unique >= r.n_bag_unique, r
            for rate in (r.exact_dup_rate, r.norm_dup_rate, r.bag_dup_rate):
                assert 0 <= rate < 1, r
            assert r.exact_dup_rate <= r.norm_dup_rate <= r.bag_dup_rate, r

    def test_lsh_candidate_quality_consistency(self, spark, sf_dir):
        """Hits bounded by both arms; ratios are exactly hits/arm; the
        candidate count equals the distinct band-OR pair count recomputed
        driver-side from the sign patterns."""
        import numpy as np

        r = REGISTRY["eval_lsh_candidate_quality"].fn(spark, sf_dir).collect()[0]
        assert r.n_hits <= min(r.n_true, r.n_candidates)
        assert abs(r.precision - round(r.n_hits / r.n_candidates, 4)) < 1e-9
        assert abs(r.recall - round(r.n_hits / r.n_true, 4)) < 1e-9
        vecs = {
            v.vec_id: np.array(v.embedding, dtype=np.float64)
            for v in load(spark, sf_dir, "embeddings").collect()
        }
        cand = set()
        for t in range(4):
            buckets = {}
            for vid, v in vecs.items():
                b = sum((1 << i) for i in range(8) if v[t * 8 + i] > 0)
                buckets.setdefault(b, []).append(vid)
            for ids in buckets.values():
                ids.sort()
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        cand.add((ids[i], ids[j]))
        assert r.n_candidates == len(cand)

    def test_ks_stat_matches_driver_recompute(self, spark, sf_dir):
        """Exact D recomputed from the same cents-quantized per-user spend."""
        import hashlib
        import math

        r = REGISTRY["agg_ks_test"].fn(spark, sf_dir).collect()[0]
        spend = {}
        for e in load(spark, sf_dir, "events").collect():
            spend.setdefault(e.user_id, 0.0)
            if e.event_type == "purchase":
                spend[e.user_id] += e.value
        arms = {"control": [], "treatment": []}
        for uid, s in spend.items():
            a = "control" if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8" else "treatment"
            arms[a].append(math.floor(s * 100 + 0.5))
        c, t = sorted(arms["control"]), sorted(arms["treatment"])
        assert (r.n_c, r.n_t) == (len(c), len(t))
        import bisect

        support = sorted(set(c) | set(t))
        d = max(
            abs(
                bisect.bisect_right(c, x) / len(c)
                - bisect.bisect_right(t, x) / len(t)
            )
            for x in support
        )
        assert abs(r.ks_stat - round(d, 4)) < 1e-9
        assert 0 <= r.ks_stat <= 1

    def test_mannwhitney_matches_scipy_formula(self, spark, sf_dir):
        """Recompute U and tie-corrected z driver-side (scipy-free midrank
        formulation) from the same cents-quantized spend."""
        import hashlib
        import math
        from collections import Counter

        r = REGISTRY["agg_mannwhitney_u"].fn(spark, sf_dir).collect()[0]
        spend = {}
        for e in load(spark, sf_dir, "events").collect():
            spend.setdefault(e.user_id, 0.0)
            if e.event_type == "purchase":
                spend[e.user_id] += e.value
        rows = [
            (
                "control"
                if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8"
                else "treatment",
                math.floor(s * 100 + 0.5),
            )
            for uid, s in spend.items()
        ]
        values = sorted(v for _, v in rows)
        # midrank of value v = average of its 1-based positions
        first = {}
        for i, v in enumerate(values):
            first.setdefault(v, i + 1)
        cnt = Counter(values)
        midrank = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
        r_c = sum(midrank[v] for a, v in rows if a == "control")
        n_c = sum(1 for a, _ in rows if a == "control")
        n_t = len(rows) - n_c
        n = len(rows)
        u_c = r_c - n_c * (n_c + 1) / 2.0
        tie = sum(c**3 - c for c in cnt.values())
        var = n_c * n_t / 12.0 * ((n + 1) - tie / (n * (n - 1.0)))
        z = (u_c - n_c * n_t / 2.0) / math.sqrt(var)
        assert (r.n_c, r.n_t) == (n_c, n_t)
        assert abs(r.u_control - round(u_c, 1)) < 1e-9
        assert abs(r.z_score - round(z, 4)) < 1e-9
        # same fixture, same split: agree with Welch/KS that there is no
        # true arm effect (md5 assignment of a homogeneous population)
        assert abs(r.z_score) < 1.96


class TestGraphDistanceInvariants:
    def test_bfs_distance_agrees_with_closeness_source_row(self, spark, sf_dir):
        """Cross-implementation invariant: graph_bfs_distance (vector
        frontier from the min-node seed) and graph_closeness (matrix
        frontier, all sources) are independent sweeps over the SAME edge
        set — the closeness row for each block's min node must report
        exactly the BFS leg's reachable count and distance sum."""
        bfs = REGISTRY["graph_bfs_distance"].fn(spark, sf_dir).collect()
        by_label: dict = {}
        for r in bfs:
            agg = by_label.setdefault(r.label, {"n": 0, "s": 0, "seed": None})
            agg["n"] += 1
            agg["s"] += r.dist
            if r.dist == 0:
                agg["seed"] = r.vec_id
        close = {
            (r.label, r.vec_id): (r.n_reachable, r.sum_dist)
            for r in REGISTRY["graph_closeness"].fn(spark, sf_dir).collect()
        }
        for label, agg in by_label.items():
            assert agg["seed"] is not None, label
            n_reach, sum_dist = close[(label, agg["seed"])]
            # BFS emits the seed itself (dist 0); closeness excludes self
            assert n_reach == agg["n"] - 1, (label, n_reach, agg)
            assert sum_dist == agg["s"], (label, sum_dist, agg)
