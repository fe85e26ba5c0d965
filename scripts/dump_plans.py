#!/usr/bin/env python3
"""Dump .explain('formatted') for the named queries to <outdir>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py --out plans/r12 --suffix after name1 name2 ...
Runs at sf0.01 by default (plan SHAPE, not timing — the gen_plan_audit convention).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    a = ap.parse_args()
    from rvi_big_data_api_spark.registry import REGISTRY
    from rvi_big_data_api_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(a.out, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in a.names:
        df = REGISTRY[name].fn(spark, a.sf)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(a.out, f"{name}_{a.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
