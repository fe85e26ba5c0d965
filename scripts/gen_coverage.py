#!/usr/bin/env python3
"""Regenerate COVERAGE.md from the live query registry (one row per
queries() entry with its module, check type, and docstring summary)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rvi_big_data_api_spark.registry import REGISTRY  # noqa: E402

SECTIONS = {
    "scan_": "§2.1 Scans/sources/sinks", "sink_": "§2.1 Scans/sources/sinks",
    "source_": "§2.1 Scans/sources/sinks",
    "project_": "§2.2 Projection/filter", "filter_": "§2.2 Projection/filter",
    "distinct_": "§2.2 Projection/filter", "sample_": "§2.2 Projection/filter",
    "join_": "§2.3 Joins", "agg_": "§2.4 Aggregations", "win_": "§2.5 Windows",
    "sort_": "§2.6 Sort/top-k", "limit_": "§2.6 Sort/top-k", "topk_": "§2.6 Sort/top-k",
    "set_": "§2.7 Set ops", "fn_": "§2.8 Scalar suites",
    "trip_": "§2.9 Telemetry", "latest_": "§2.9 Telemetry", "resample_": "§2.9 Telemetry",
    "threshold_": "§2.9 Telemetry", "gap_": "§2.9 Telemetry", "haversine_": "§2.9 Telemetry",
    "daily_": "§2.9 Telemetry",
    "dedup_": "§2.10 LLM ops", "sim_": "§2.10 LLM ops", "knn_": "§2.10 LLM ops",
    "text_": "§2.10 LLM ops", "multimodal_": "§2.10 LLM ops", "mm_": "§2.10 LLM ops (ext)",
    "corpus_": "§2.10 LLM ops",
    "stream_": "§2.11 Streaming", "udf_": "§2.12 UDF surface", "udaf_": "§2.12 UDF surface",
    "udtf_": "§2.12 UDF surface",
    # §2.13 extension families (rounds 2-3)
    "composite_": "§2.13 Composite/subquery suite",
    "sql_": "§2.13 SQL entry points (lateral/recursive/parameterized)",
    "graph_": "§2.13 Graph ops",
    "anomaly_": "§2.9 Telemetry", "event_": "§2.9 Telemetry",
    "seq_": "§2.9 Telemetry",
    "retention_": "§2.9 Telemetry", "state_": "§2.9 Telemetry",
    "clean_": "§2.9 Telemetry", "cdc_": "§2.9 Telemetry",
    "embed_": "§2.10 LLM ops", "profile_": "§2.13 Profiling",
    "pandas_": "§2.13 pandas-on-Spark API",
    # §2.13 round-5/6 families (VERDICT r6 item 9: keep "other" navigable)
    "eval_": "§2.13 ML evaluation",
    "feature_": "§2.13 Feature engineering",
    "stats_": "§2.13 Statistical tests",
    "ts_": "§2.13 Time series",
    "privacy_": "§2.13 Privacy",
    "geo_": "§2.13 Geospatial",
    "ab_experiment": "§2.13 Statistical tests",
    "fleet_": "§2.13 Composite/subquery suite",
    "data_quality": "§2.13 Profiling",
    "observe_": "§2.13 Profiling",
    "subquery_": "§2.13 Composite/subquery suite",
    # entity-resolution family groups with the LLM-data ops
    "er_": "§2.10 LLM ops",
}


def section(name: str) -> str:
    for p, s in sorted(SECTIONS.items(), key=lambda kv: -len(kv[0])):
        if name.startswith(p):
            return s
    return "other"


def main() -> None:
    rows = []
    for name, spec in sorted(REGISTRY.items(), key=lambda kv: (section(kv[0]), kv[0])):
        mod = spec.fn.__module__.replace("rvi_big_data_api_spark.", "")
        oracle = "SQL-hash" if spec.oracle else "rows-only"
        doc = (spec.doc or "").strip().split("\n")[0][:84]
        rows.append((section(name), name, mod, oracle, doc))

    lines = [
        "# COVERAGE — generated operator inventory (from the live registry)",
        "",
        "One row per `queries()` entry. `SQL-hash` = DuckDB oracle twin registered",
        "(driver hash-checks values); `rows-only` = deterministic but not",
        "SQL-expressible (justification pinned in tests/test_coverage.py).",
        "Regenerate: `python3 scripts/gen_coverage.py` (this file is its output).",
        "",
        "| Section | Query | Module | Check | Summary |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(r) + " |")
    n_sql = sum(1 for _, s in REGISTRY.items() if s.oracle)
    lines += ["", f"**{len(REGISTRY)} operators: {n_sql} SQL-hash-checked, {len(REGISTRY) - n_sql} rows-only.**"]
    out = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} rows")


if __name__ == "__main__":
    main()
