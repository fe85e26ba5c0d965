"""Shared fixtures: one SparkSession + one DuckDB connection per test run.

The DuckDB connection registers the same parquet views the driver registers
(``__spark_entry__.py`` docstring), so ``tests/test_parity.py`` is a local
replica of the driver's t2 correctness gate.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from rvi_big_data_api_spark.schemas import TABLES
from rvi_big_data_api_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("rvi-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()
