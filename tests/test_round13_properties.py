"""Round-13 (optimization round 2) pins.

Every driver fast path added by the optimization rounds must keep its
distributed formulation alive and bit-equal above the scale gate — these
tests force each gate shut (bound = 0 / monkeypatched constant) and compare
against the driver fold, the TestDriverCCEquivalence discipline. Plus the
ADVICE r12 items: the >= DRIVER_FRAME_CHECKPOINT_MIN_ROWS checkpoint branch
must actually checkpoint, and the `pass 0 to force distributed` contract
must hold on empty inputs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


class TestESDDistributedEquivalence:
    """Optimization round 13 (VERDICT r12 item 1): _esd_extract's driver
    fold is gated by ESD_DRIVER_MAX_CELLS with the distributed
    driver-coordinated rounds restored above the bound. Both paths must
    emit bit-identical rows — same integer moments, same long->double
    casts, same (z desc, day asc) argmax."""

    def _daily(self, spark, sf_dir):
        from rvi_big_data_api_spark.io import load

        ev = load(spark, sf_dir, "events")
        return ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("d"),
            (F.expr("unix_timestamp(date_trunc('day', ts)) div 86400") % 7).alias(
                "dow"
            ),
        ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))

    def test_forced_distributed_matches_driver_fold(self, spark, sf_dir):
        from rvi_big_data_api_spark.operators.telemetry import _esd_extract

        daily = self._daily(spark, sf_dir)
        fast = sorted(map(tuple, _esd_extract(spark, daily).collect()))
        slow = sorted(
            map(tuple, _esd_extract(spark, daily, driver_max_cells=0).collect())
        )
        assert fast == slow
        assert len(fast) > 0  # the fixture produces extractions

    def test_empty_frame_takes_distributed_path_and_is_empty(self, spark):
        # 0 < count() is false on an empty cell frame, so the gate must fall
        # through to the distributed rounds (never collect a degenerate
        # frame on the `count()==0 <= bound` trap — ADVICE r12) and both
        # formulations agree on the empty output.
        from rvi_big_data_api_spark.operators.telemetry import _esd_extract

        daily = spark.createDataFrame(
            [], "event_type string, d timestamp, dow long, xc long"
        )
        assert _esd_extract(spark, daily).count() == 0


class TestKcoreDistributedEquivalence:
    """Optimization round 13 (VERDICT r12 item 5): graph_kcore's driver
    peel got a dedicated, memory-sized bound (KCORE_DRIVER_MAX_EDGES).
    Forcing the bound to 0 must run the distributed peel loop and reach
    the identical k-core (unique maximal subgraph with min-degree >= K)."""

    def test_forced_distributed_matches_driver_peel(self, spark, sf_dir, monkeypatch):
        from rvi_big_data_api_spark.operators import llm_sim

        fast = sorted(
            map(tuple, llm_sim.graph_kcore(spark, sf_dir).collect())
        )
        monkeypatch.setattr(llm_sim, "KCORE_DRIVER_MAX_EDGES", 0)
        slow = sorted(
            map(tuple, llm_sim.graph_kcore(spark, sf_dir).collect())
        )
        assert fast == slow
        assert len(fast) > 0


class TestDriverFrameCheckpointBranch:
    """ADVICE r12 item 2: the >= DRIVER_FRAME_CHECKPOINT_MIN_ROWS branch of
    the driver-built-frame materialization rule had no test actually
    exercising the checkpoint (both branches plan as Scan ExistingRDD, so
    the plan assertion cannot distinguish them). Record DataFrame.checkpoint
    calls and pin the branch on both sides of the bound."""

    @pytest.fixture()
    def checkpoint_calls(self, spark, monkeypatch):
        # Patch the CONCRETE DataFrame class (Spark 4 splits the abstract
        # pyspark.sql.DataFrame from pyspark.sql.classic.dataframe.DataFrame,
        # which overrides checkpoint — patching the base records nothing).
        cls = type(spark.range(1))
        calls: list[int] = []
        original = cls.checkpoint

        def recording(self, eager=True):
            calls.append(1)
            return original(self, eager=eager)

        monkeypatch.setattr(cls, "checkpoint", recording)
        return calls

    def test_cc_labels_checkpoint_at_bound(self, spark, monkeypatch, checkpoint_calls):
        from rvi_big_data_api_spark.operators import llm_dedup

        edges = spark.createDataFrame(
            [(1, 2), (3, 4)], "doc_a long, doc_b long"
        )
        monkeypatch.setattr(llm_dedup, "DRIVER_FRAME_CHECKPOINT_MIN_ROWS", 4)
        out = llm_dedup.min_label_components(spark, edges)
        # 4 labeled nodes >= bound 4 -> the checkpoint branch must fire
        assert out.count() == 4
        assert len(checkpoint_calls) >= 1
        assert sorted(map(tuple, out.collect())) == [
            (1, 1), (2, 1), (3, 3), (4, 3),
        ]

    def test_cc_labels_no_checkpoint_below_bound(
        self, spark, monkeypatch, checkpoint_calls
    ):
        from rvi_big_data_api_spark.operators import llm_dedup

        edges = spark.createDataFrame(
            [(1, 2), (3, 4)], "doc_a long, doc_b long"
        )
        monkeypatch.setattr(llm_dedup, "DRIVER_FRAME_CHECKPOINT_MIN_ROWS", 5)
        out = llm_dedup.min_label_components(spark, edges)
        assert out.count() == 4
        assert len(checkpoint_calls) == 0  # parallelized driver rows as-is

    def test_collect_materialize_branches(self, spark, monkeypatch, checkpoint_calls):
        from rvi_big_data_api_spark.operators import llm_dedup

        df = spark.range(3).selectExpr("id", "id * 2 AS v")
        monkeypatch.setattr(llm_dedup, "DRIVER_FRAME_CHECKPOINT_MIN_ROWS", 4)
        out = llm_dedup.collect_materialize(spark, df)
        assert sorted(map(tuple, out.collect())) == [(0, 0), (1, 2), (2, 4)]
        assert len(checkpoint_calls) == 0  # 3 rows < bound 4
        monkeypatch.setattr(llm_dedup, "DRIVER_FRAME_CHECKPOINT_MIN_ROWS", 3)
        out = llm_dedup.collect_materialize(spark, df)
        assert sorted(map(tuple, out.collect())) == [(0, 0), (1, 2), (2, 4)]
        assert len(checkpoint_calls) == 1  # at bound -> checkpoint fires


class TestPOIArgminGears:
    """Round 13: geo_nearest_poi's argmin is two-geared — least() over
    literal candidate structs at or below POI_LEAST_MAX collected POIs
    (whole-stage-codegen'd), the broadcast-array transform/array_min shape
    above it. Both gears must emit bit-identical rows (the literals are
    collect-roundtripped doubles — the same IEEE values the array holds)."""

    def test_gears_bit_identical(self, spark, sf_dir, monkeypatch):
        from rvi_big_data_api_spark.operators import telemetry

        fast = sorted(
            map(tuple, telemetry.geo_nearest_poi(spark, sf_dir).collect())
        )
        monkeypatch.setattr(telemetry, "POI_LEAST_MAX", 0)
        slow = sorted(
            map(tuple, telemetry.geo_nearest_poi(spark, sf_dir).collect())
        )
        assert fast == slow
        assert len(fast) > 0


class TestUnigramForcedDistributedContract:
    """ADVICE r12 item 4: `driver_max_words=0` must force the distributed
    DP even on an empty vocabulary (count()==0 <= 0 silently took the
    driver path before). The distributed levels over an empty histogram
    must come back empty, not crash."""

    def test_empty_vocab_forced_distributed_is_empty(self, spark, monkeypatch):
        from rvi_big_data_api_spark.operators import llm_text

        called = []
        monkeypatch.setattr(
            llm_text,
            "_driver_viterbi_used",
            lambda *a, **k: called.append(1),
        )
        words = spark.createDataFrame([], "word string, wcnt long, wlen long")
        pcost = spark.createDataFrame(
            [], "piece string, init_cnt long, cost_micro long"
        )
        out = llm_text._unigram_used_frame(
            spark, words, pcost, driver_max_words=0
        )
        assert called == []  # the driver DP must NOT be taken
        assert out.count() == 0
