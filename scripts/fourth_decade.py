"""Fourth-decade (1B-row) probe for the constant-state sketch family
(VERDICT r10 item 5): push the agg_log_histogram_quantile mechanism —
half-octave integer log-bucket coding + per-group histogram + integer-
ceiling quantile readout — through 10^9 in-plan generated rows (no fixture
IO, the r7 constant-state ritual at one more decade) and record wall time
plus the total sketch-cell count, the state-size evidence the 100 TB claim
ships on.

Usage: python scripts/fourth_decade.py [rows ...]   (default 1e8 then 1e9)
Prints one JSON line per leg: {"rows": N, "wall_sec": s, "cells": c,
"groups": g, "result_rows": r}.
"""

from __future__ import annotations

import json
import sys
import time

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, ".")
from rvi_big_data_api_spark.session import get_spark  # noqa: E402


def leg(spark, n_rows: int) -> dict:
    """One decade leg: generate n_rows in-plan, run the exact half-octave
    sketch of agg_log_histogram_quantile (aggregates.py) over 5 groups of a
    deterministic xxhash64-derived cents value in [1, 10^7]."""
    rows = spark.range(n_rows).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000_000)) + 1).alias("c"),
    )
    coded = rows.select(
        "grp",
        F.expr(
            "2 * (length(conv(c, 10, 2)) - 1)"
            " + CASE WHEN c * c >= shiftleft(cast(1 as bigint),"
            "   cast(2 * (length(conv(c, 10, 2)) - 1) + 1 as int))"
            "   THEN 1 ELSE 0 END"
        ).cast("long").alias("bucket"),
    )
    hist = coded.groupBy("grp", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "bucket",
        F.sum("cnt").over(wcum).alias("cum_n"),
        F.sum("cnt").over(wall).alias("n"),
    )
    picked = cum.groupBy("grp").agg(
        F.max("n").alias("n"),
        F.min(F.expr("CASE WHEN cum_n >= (n + 1) div 2 THEN bucket END")).alias("p50_bucket"),
        F.min(F.expr("CASE WHEN cum_n >= (9 * n + 9) div 10 THEN bucket END")).alias("p90_bucket"),
        F.min(F.expr("CASE WHEN cum_n >= (99 * n + 99) div 100 THEN bucket END")).alias("p99_bucket"),
    )
    t0 = time.time()
    out = picked.collect()
    wall_sec = round(time.time() - t0, 2)
    cells = hist.count()  # total sketch state across all groups
    return {
        "rows": n_rows,
        "wall_sec": wall_sec,
        "cells": cells,
        "groups": len(out),
        "result_rows": len(out),
        "p50_buckets": sorted(r["p50_bucket"] for r in out),
    }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000_000, 1_000_000_000]
    spark = get_spark("fourth-decade")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(leg(spark, n)))


if __name__ == "__main__":
    main()
