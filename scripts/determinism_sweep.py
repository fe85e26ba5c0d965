#!/usr/bin/env python3
"""Determinism sweep: run every batch query TWICE in one session at sf0.01
and compare canonical (sorted, stringified) rows.

Why: the driver re-runs queries across rounds and hash-compares values, so
any run-to-run nondeterminism — an unsorted collect_list, a tie-broken-by-
partition window, a float reduction whose order leaks into a ROUNDED
emitted value — is a latent correctness failure even if both runs are
"right". The oracle can't catch it (it compares one Spark run against one
DuckDB run); this sweep does. Registry discipline says every query is
deterministic by construction (no rand(), sorted collects, total-order
tie-breaks); this measures the claim over the whole surface.

Run: python3 scripts/determinism_sweep.py [sf_dir]
Exit code 1 if any query diverges between its two runs.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SKIP_PREFIXES = ("stream_", "source_stream", "sink_stream")


def canon(df) -> list[tuple]:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return sorted(map(tuple, pdf[cols].astype(str).itertuples(index=False, name=None)))


def main() -> int:
    import rvi_big_data_api_spark as engine

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = engine.get_spark("rvi-determinism-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = engine.queries()
    diverged = []
    for name in sorted(qs):
        if name.startswith(SKIP_PREFIXES):
            continue
        a = canon(qs[name](spark, sf_dir))
        b = canon(qs[name](spark, sf_dir))
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) if len(a) == len(b) else -1
            diverged.append(name)
            print(f"DIVERGED {name}: rows {len(a)} vs {len(b)}, first diff idx {bad}", flush=True)
        else:
            print(f"ok {name} ({len(a)} rows)", flush=True)
    print("DONE. DIVERGED:", diverged)
    return 1 if diverged else 0


if __name__ == "__main__":
    raise SystemExit(main())
