"""Driver-shaped-session conformance (VERDICT r7 item 4).

The external driver's correctness harness runs registry queries on its OWN
SparkSession — none of `get_spark()`'s conf pins (ANSI off, UTC, Arrow, AQE,
`spark.sql.geospatial.enabled`, checkpoint dir) exist there. An op that
silently depends on a pin passes every `get_spark()`-based drive and then
errors only on the driver: `fn_geospatial` did exactly that in
CORRECTNESS_r07 (`UNSUPPORTED_FEATURE.GEOSPATIAL_DISABLED` — the single red
row in 349 driver-sampled queries across 7 rounds).

This test spawns a SUBPROCESS (the session fixture in this suite is
get_spark()'s; a second getOrCreate in-process would inherit its pinned
SparkConf and prove nothing) that builds a truly bare
`SparkSession.builder.master(local[N]).getOrCreate()` — Spark 4.1 defaults:
ANSI **true**, Arrow **false**, no checkpoint dir — and executes the
conf-sensitive core of the registry:

- `fn_geospatial` — requires the geospatial flag; must set it sticky in-op.
- `fn_cast` / `fn_try` / `fn_math` — NULL-on-error semantics vs bare ANSI.
- `fn_datetime` / `filter_range_time` — timestamp reads under default tz.
- `udf_pandas_scalar` / `udaf_pandas_agg` / `udtf_grouped_map` — pandas
  exchange with Arrow at its bare default (false → pickle fallback).
- `dedup_cluster` / `graph_kcore` — iterative checkpointers; must call
  `ensure_checkpoint_dir` rather than assume the session has one.
- `dedup_embed` — the round-8 adaptive-bucket plan (broadcast params join)
  under bare AQE defaults.

The FULL-registry version of this pass is `scripts/bare_session_drive.py`
(run per-round; round-8 result recorded in COVERAGE.md). Checks here are
execution-level (analyze + run + stable count); value parity is the oracle
drives' job.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONF_SENSITIVE = [
    "fn_geospatial",
    "fn_cast",
    "fn_try",
    "fn_math",
    "fn_datetime",
    "filter_range_time",
    "udf_pandas_scalar",
    "udaf_pandas_agg",
    "udtf_grouped_map",
    "dedup_cluster",
    "graph_kcore",
    "dedup_embed",
    "agg_pricing_summary",
]


def test_conf_sensitive_ops_run_on_bare_session(sf_dir):
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {ROOT!r})
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[8]").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.conf.get("spark.sql.ansi.enabled") == "true", "not a bare session"
        import rvi_big_data_api_spark as engine
        qs = engine.queries()
        failed = []
        for name in {CONF_SENSITIVE!r}:
            try:
                df = qs[name](spark, {sf_dir!r})
                n = df.count()
                assert n == df.count()
            except Exception as e:
                failed.append((name, type(e).__name__, str(e)[:200]))
        print("BARE_RESULT:", failed)
        sys.exit(1 if failed else 0)
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, f"bare-session failures:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
