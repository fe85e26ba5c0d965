"""Resource-hygiene guards (VERDICT r1 item 4): iterative operators must not
leak cached relations across invocations — repeated calls on a long-lived
session (the driver, a notebook, a service) must hold executor memory flat."""

from __future__ import annotations

from rvi_big_data_api_spark.registry import REGISTRY


def n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_dedup_cluster_releases_all_caches(spark, sf_dir):
    before = n_persistent_rdds(spark)
    for _ in range(2):
        df = REGISTRY["dedup_cluster"].fn(spark, sf_dir)
        assert df.count() > 0
    assert n_persistent_rdds(spark) == before, (
        "dedup_cluster left cached relations behind: "
        f"{before} -> {n_persistent_rdds(spark)}"
    )


def test_dedup_cluster_result_survives_unpersist(spark, sf_dir):
    """The returned DataFrame must stay collectable after the operator's
    internal caches are gone (it reads its own checkpoint)."""
    df = REGISTRY["dedup_cluster"].fn(spark, sf_dir)
    a = df.count()
    b = df.count()  # second action would recompute a broken lineage
    assert a == b > 0


def test_iterative_and_stateful_ops_repeat_cleanly(spark, sf_dir):
    """Round-3 sweep: every operator that caches, checkpoints, writes
    scratch, or registers a connector must be re-invokable with identical
    results and ZERO persisted relations left behind (the driver and any
    long-lived service call these repeatedly on one session)."""
    names = [
        "corpus_dedup_pipeline", "graph_pagerank", "graph_triangle_count",
        "source_python_datasource", "stream_python_source", "cdc_merge",
        "sql_recursive",
    ]
    before = n_persistent_rdds(spark)
    for name in names:
        first = REGISTRY[name].fn(spark, sf_dir).count()
        second = REGISTRY[name].fn(spark, sf_dir).count()
        assert first == second, (name, first, second)
    assert n_persistent_rdds(spark) == before


def test_dbscan_grid_repeats_cleanly_no_cache_leak(spark, sf_dir):
    """geo_dbscan_grid memoizes its core-cell table via an eager
    checkpoint (never .cache()), so repeated invocations return identical
    results and leave ZERO persisted relations behind."""
    before = n_persistent_rdds(spark)
    first = REGISTRY["geo_dbscan_grid"].fn(spark, sf_dir).count()
    second = REGISTRY["geo_dbscan_grid"].fn(spark, sf_dir).count()
    assert first == second > 0
    assert n_persistent_rdds(spark) == before
