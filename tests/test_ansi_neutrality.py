"""ANSI-neutrality sweep: the DRIVER owns the SparkSession handed to
`queries()` — Spark 4 defaults ANSI ON, while the engine's own session pins
it off. Every query must therefore be total (no runtime cast/arithmetic
errors) under BOTH modes; failing casts must use try_cast explicitly rather
than relying on the session's leniency.

This caught a real bug: fn_cast's event_type→int demo errored under ANSI
(CAST_INVALID_INPUT) because column pruning hid it from count()-style smokes
— only a full collect() evaluates every projected column."""

from __future__ import annotations

import pytest

from rvi_big_data_api_spark.registry import REGISTRY

SMOKE_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ansi_spark(spark):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", "false")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_total_under_ansi(ansi_spark, name):
    REGISTRY[name].fn(ansi_spark, SMOKE_SF).collect()
