"""Table loaders and write helpers.

The reference's read path was a Cassandra connector scan with partition-key
pushdown (SURVEY.md §3.1 [P:med]); here the equivalent is a schema'd parquet
scan — Catalyst pushes predicates into the DataSourceV2 parquet reader
(row-group min/max skipping) and prunes columns, which `.explain` perf tests
assert (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its authoritative schema.

    An explicit schema (never inference) keeps the scan plan stable and lets
    the vectorized parquet reader project exactly the referenced columns.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {sorted(SCHEMAS)}")
    return spark.read.schema(SCHEMAS[name]).parquet(table_path(sf_dir, name))


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Derived-table sink (the reference wrote Spark results back to Cassandra;
    we write parquet — SURVEY.md §2.1 `sink_parquet`)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
