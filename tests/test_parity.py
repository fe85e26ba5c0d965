"""Driver-t2 replica: every registered query with an oracle must match DuckDB
exactly (row count + column names + values, order-insensitive) at sf0.01.

Queries without an oracle get a weaker smoke check (runs, stable schema,
deterministic across two executions) — mirroring the driver's rows-only path.
"""

from __future__ import annotations

import pytest

from rvi_big_data_api_spark.registry import REGISTRY

from .parity import assert_frames_match, canon_rows

ALL = sorted(REGISTRY)
WITH_ORACLE = [n for n in ALL if REGISTRY[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if REGISTRY[n].oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df1 = spec.fn(spark, sf_dir)
    pdf1 = df1.toPandas()
    assert pdf1 is not None
    # determinism: second run must produce the identical multiset of rows
    pdf2 = spec.fn(spark, sf_dir).toPandas()
    assert canon_rows(pdf1) == canon_rows(pdf2), f"{name}: nondeterministic result"
