"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``rvi_big_data_api_spark/``; this module only wires
the registry to the driver's three entry points.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import rvi_big_data_api_spark as engine


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2.4 `agg_pricing_summary`) on sf0.001."""
    return engine.queries()["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return engine.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; rows-only ops omitted."""
    return engine.oracles()
