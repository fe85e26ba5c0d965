"""Regression guard for registry order (VERDICT.md round 1, item 8).

The driver's correctness pass walks ``queries()`` in registration order and
round 1 recorded exactly the first 50 entries, leaving 64 queries with no
driver row. ``rvi_big_data_api_spark.REGISTRY_PRIORITY`` now pins a
query-granular order with the never-verified families first; these tests make
sure a refactor can't silently undo that.
"""

from __future__ import annotations

import rvi_big_data_api_spark as engine

# Driver-green in CORRECTNESS_r01.json (50 rows: 47 oracle-pass + 3
# sanctioned rows-only). Everything NOT in this set must register first.
ROUND1_DRIVER_GREEN = {
    "fn_string", "fn_datetime", "fn_math", "fn_conditional", "fn_array",
    "fn_map", "fn_json", "fn_hash", "fn_cast", "fn_bitwise",
    "udf_row", "udf_pandas_scalar", "udaf_pandas_agg", "udtf_grouped_map",
    "udtf_map_partitions", "udtf_python",
    "scan_parquet", "scan_csv", "scan_json", "scan_partitioned",
    "sink_parquet", "source_inmemory",
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "stream_static_join", "stream_stream_join", "stream_output_modes",
    "source_stream_files", "sink_stream_foreachbatch", "stream_stateful",
    "stream_late_data", "stream_resample",
    "agg_pricing_summary", "agg_basic", "agg_count_distinct",
    "agg_approx_distinct", "agg_filtered", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_collect", "agg_percentile", "agg_stats",
    "agg_minmax_by", "agg_pivot", "agg_global", "agg_histogram",
    "project_prune",
}


def test_priority_list_is_exhaustive():
    names = set(engine.queries())
    listed = set(engine.REGISTRY_PRIORITY)
    # Stragglers (new queries not yet prioritised) are allowed by the
    # reordering code, but should be added to the list promptly.
    assert listed <= names, f"priority list names missing queries: {listed - names}"


def test_registry_order_matches_priority():
    names = list(engine.queries())
    stragglers = [n for n in names if n not in set(engine.REGISTRY_PRIORITY)]
    expected = engine.PRIORITY_UNVERIFIED + stragglers + engine.PRIORITY_VERIFIED
    assert names == expected


def test_unverified_queries_register_before_verified_ones():
    """Every round-1 driver-green query sits AFTER every never-verified one,
    so a capped driver pass spends its budget on new information."""
    names = list(engine.queries())
    first_unverified_block = [n for n in names if n not in ROUND1_DRIVER_GREEN]
    boundary = names.index(first_unverified_block[-1])
    greens_before_boundary = [
        n for n in names[: boundary + 1] if n in ROUND1_DRIVER_GREEN
    ]
    assert not greens_before_boundary, (
        "round-1-green queries registered ahead of never-verified ones: "
        f"{greens_before_boundary}"
    )


def test_first_50_are_all_never_verified():
    names = list(engine.queries())[:50]
    already_green = [n for n in names if n in ROUND1_DRIVER_GREEN]
    assert not already_green, already_green
