"""Cross-op invariants for the round-5 audit/eval wave.

Each test checks a mathematical identity BETWEEN operators (or between an
operator and a brute-force re-derivation) — stronger than oracle parity,
which only proves both engines compute the same thing, not that the thing
is right.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from rvi_big_data_api_spark.operators.ml_eval import eval_roc_curve
from rvi_big_data_api_spark.operators.telemetry import (
    CUSUM_ALARM_CENTS,
    CUSUM_SLACK_CENTS,
    CUSUM_TARGET_CENTS,
    anomaly_cusum,
    cdc_scd2,
    profile_key_skew,
    seq_transition_matrix,
)
from rvi_big_data_api_spark.operators.llm_text import privacy_k_anonymity


class TestCusumClosedForm:
    """The window formulation S_i = C_i − min(0, min_{j≤i} C_j) must equal
    the textbook recursion S_i = max(0, S_{i-1} + y_i)."""

    @given(
        ys=st.lists(
            st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=60
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_closed_form_equals_recursion(self, ys):
        # textbook recursion
        s, rec = 0, []
        for y in ys:
            s = max(0, s + y)
            rec.append(s)
        # closed form
        c, cmin, closed = 0, 0, []
        for y in ys:
            c += y
            cmin = min(cmin, c)
            closed.append(c - min(0, cmin))
        assert rec == closed

    def test_spark_alarms_match_brute_force(self, spark, sf_dir):
        alarms = {
            (r.user_id, r.event_id)
            for r in anomaly_cusum(spark, sf_dir).collect()
        }
        rows = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select(
                "user_id",
                "event_id",
                F.unix_timestamp("ts").alias("sec"),
                F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vc"),
            )
            .collect()
        )
        byuser: dict = {}
        for r in rows:
            byuser.setdefault(r.user_id, []).append(r)
        expect = set()
        drift = CUSUM_TARGET_CENTS + CUSUM_SLACK_CENTS
        for uid, evs in byuser.items():
            evs.sort(key=lambda r: (r.sec, r.event_id))
            s = 0
            for r in evs:
                s = max(0, s + (r.vc - drift))
                if s > CUSUM_ALARM_CENTS:
                    expect.add((uid, r.event_id))
        assert alarms == expect


class TestRocMannWhitneyIdentity:
    """Trapezoid AUC of the ROC curve equals the Mann-Whitney statistic
    U/(n_pos*n_neg) computed from the same (score, label) pairs — the
    standard rank-sum/AUC equivalence, with midranks handling ties the
    same way the trapezoid handles vertical+horizontal steps."""

    def test_auc_identity(self, spark, sf_dir):
        pts = (
            eval_roc_curve(spark, sf_dir)
            .select("cum_tp", "cum_fp", "tpr", "fpr")
            .orderBy("cum_tp", "cum_fp")
            .collect()
        )
        total_pos, total_neg = pts[-1].cum_tp, pts[-1].cum_fp
        # trapezoid over exact counts (not the rounded tpr/fpr columns)
        auc_num, prev_tp, prev_fp = 0, 0, 0
        for p in pts:
            auc_num += (p.cum_fp - prev_fp) * (p.cum_tp + prev_tp)
            prev_tp, prev_fp = p.cum_tp, p.cum_fp
        auc = auc_num / (2.0 * total_pos * total_neg)

        per_user = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(
                F.floor(
                    F.sum(
                        F.when(
                            F.col("event_type").isin("view", "click"),
                            F.col("value"),
                        ).otherwise(0.0)
                    )
                    * 100
                    + 0.5
                )
                .cast("long")
                .alias("score"),
                F.max(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.floor(F.col("value") * 100 + 0.5) > 15000),
                        1,
                    ).otherwise(0)
                ).alias("label"),
            )
            .collect()
        )
        scores = sorted((r.score, r.label) for r in per_user)
        # midranks
        u = 0.0
        i = 0
        rank = 1
        while i < len(scores):
            j = i
            while j < len(scores) and scores[j][0] == scores[i][0]:
                j += 1
            mid = (rank + rank + (j - i) - 1) / 2.0
            for k in range(i, j):
                if scores[k][1] == 1:
                    u += mid
            rank += j - i
            i = j
        n_pos = sum(1 for _, l in scores if l == 1)
        n_neg = len(scores) - n_pos
        u_stat = u - n_pos * (n_pos + 1) / 2.0
        assert abs(auc - u_stat / (n_pos * n_neg)) < 1e-9


class TestTransitionMatrix:
    def test_rows_normalize_to_ppm(self, spark, sf_dir):
        rows = seq_transition_matrix(spark, sf_dir).collect()
        from collections import defaultdict

        by_from = defaultdict(list)
        for r in rows:
            assert 0 <= r.prob_ppm <= 1_000_000
            by_from[r.from_type].append(r)
        for frm, rs in by_from.items():
            total_ppm = sum(r.prob_ppm for r in rs)
            # floor division loses < 1 ppm per cell
            assert 1_000_000 - len(rs) <= total_ppm <= 1_000_000, frm

    def test_transition_count_conservation(self, spark, sf_dir):
        rows = seq_transition_matrix(spark, sf_dir).collect()
        n_pairs = sum(r.n_transitions for r in rows)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()
        assert n_pairs == n_events - n_users  # one lag-null per user


class TestSkewAudit:
    def test_top_shares_ordered_and_bounded(self, spark, sf_dir):
        rows = sorted(profile_key_skew(spark, sf_dir).collect(), key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.n_events >= b.n_events
            assert b.cum_share_ppm >= a.cum_share_ppm
        assert rows[-1].cum_share_ppm <= 1_000_000
        assert all(r.skew_max_avg_x1000 >= 1000 for r in rows)  # max ≥ avg


class TestScd2:
    def test_intervals_partition_history(self, spark, sf_dir):
        rows = cdc_scd2(spark, sf_dir).collect()
        from collections import defaultdict

        by_user = defaultdict(list)
        for r in rows:
            by_user[r.user_id].append(r)
        for uid, vs in by_user.items():
            vs.sort(key=lambda r: r.version)
            assert [v.version for v in vs] == list(range(1, len(vs) + 1))
            currents = [v for v in vs if v.is_current]
            assert len(currents) == 1 and currents[0] is vs[-1]
            for a, b in zip(vs, vs[1:]):
                assert a.valid_to_sec == b.valid_from_sec  # contiguous
            assert all(v.valid_to_sec is not None for v in vs[:-1])


class TestKAnonymity:
    def test_group_mass_conservation(self, spark, sf_dir):
        rows = privacy_k_anonymity(spark, sf_dir).collect()
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert sum(r.group_size for r in rows) == n_docs
        for r in rows:
            assert 1 <= r.l_diversity <= min(r.group_size, 10)
            assert r.violates_k == (r.group_size < 5)
