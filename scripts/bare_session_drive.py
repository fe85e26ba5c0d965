#!/usr/bin/env python3
"""Run registry queries on a BARE SparkSession — the driver-conformance pass.

Why this exists (VERDICT r7 item 4 / the fn_geospatial lesson): the external
driver's correctness harness builds its own SparkSession WITHOUT this
engine's conf pins (`get_spark()` sets ANSI off, UTC, Arrow, AQE, the
geospatial flag, a checkpoint dir). An op that silently depends on one of
those pins passes every `get_spark()`-based replica drive and then errors on
the driver — exactly how `fn_geospatial` produced the only red row in 349
driver-sampled queries (CORRECTNESS_r07). This script is the only harness in
the repo that executes queries the way the driver does.

Bare means bare: `SparkSession.builder.master(local[N]).getOrCreate()` with
zero `.config(...)` calls — Spark 4.1 defaults (ANSI **true**, Arrow
**false**, system timezone, no checkpoint dir). Each query must either work
under those defaults or set what it needs sticky in-op (fn_geospatial's
conf set, `ensure_checkpoint_dir` in the iterative family).

Checks are execution-level (the op analyzes, runs, and returns rows twice
with the same count) — value parity belongs to the oracle drives; this pass
exists to catch resolution/runtime failures that only a driver-shaped
session produces.

Usage:
  python scripts/bare_session_drive.py            # full registry (batch)
  python scripts/bare_session_drive.py name1 ...  # subset
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import rvi_big_data_api_spark as engine

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = engine.queries()
    if not names:
        names = list(qs)
    failed: list[str] = []
    t0 = time.time()
    for name in names:
        try:
            df = qs[name](spark, sf)
            n = df.count()
            n2 = df.count()  # driver re-counts the returned frame
            assert n == n2, f"unstable count {n} != {n2}"
            print(f"{name}: OK rows={n}", flush=True)
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            msg = str(e).replace("\n", " ")[:300]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
    print(
        f"== bare-session drive: {len(names) - len(failed)}/{len(names)} OK "
        f"in {time.time() - t0:.1f}s; failures: {failed}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
