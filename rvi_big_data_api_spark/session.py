"""SparkSession factory for the engine.

Capability parity target: PDXostc/rvi_big-data_api (see SURVEY.md §0 — the
reference checkout is empty; capabilities are reconstructed from public
knowledge of the RVI Big Data demo). The reference ran hand-ordered RDD jobs
against Cassandra with no optimizer (SURVEY.md §4.1); this engine instead
declares every query through the DataFrame API and leans on Catalyst + AQE.

Pinned decisions (SURVEY.md §7):
- ``spark.sql.ansi.enabled = false``: cast/parse failures and x/0 yield NULL,
  which pairs with DuckDB ``TRY_CAST`` / ``nullif`` guards in the oracle twins.
- ``spark.sql.session.timeZone = UTC``: parquet fixture timestamps are naive;
  pinning UTC makes Spark and DuckDB agree on wall-clock values.
- Arrow enabled: vectorized Python<->JVM exchange for pandas UDFs / toPandas.
- AQE on (Spark default) with shuffle-partition coalescing: the key 100 TB
  lever — skew-join splitting and runtime partition sizing come free.

At 100 TB the same builder works cluster-side: only ``master`` and memory
sizing change; ``shuffle.partitions`` here is a local-mode floor, AQE
re-coalesces at runtime from observed shuffle stats.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Conservative local-mode heap: ~1/8 of detected RAM, clamped to
    [2g, 16g]. Reads /proc/meminfo (Linux); falls back to 4g where that's
    unavailable rather than guessing the host size."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(2, min(16, int(total_gib // 8)))}g"
    except OSError:
        pass
    return "4g"


def ensure_checkpoint_dir(spark: SparkSession) -> None:
    """Idempotently pin a checkpoint directory on a session that lacks one.

    Iterative/shared-subtree operators eagerly checkpoint converged edge
    lists (dedup_cluster, graph_kcore, the sim_pair_edges memo); a bare
    SparkSession built outside get_spark() has no checkpoint dir, so every
    such operator guards with this helper (ADVICE r6: previously 9 inline
    copies of this boilerplate)."""
    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        spark.sparkContext.setCheckpointDir(
            os.path.join(tempfile.gettempdir(), "rvi_spark_checkpoints")
        )


def get_spark(app_name: str = "rvi-big-data-api-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode parallelism is taken from ``$SPARK_GRAFT_CPUS`` (default ``*``),
    matching the driver's bench harness contract.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # GEOMETRY/GEOGRAPHY types (fn_geospatial): a static feature flag —
        # per-query set/restore breaks on re-analysis (count() over the
        # returned frame re-resolves ST expressions after the restore).
        .config("spark.sql.geospatial.enabled", "true")
        # Local mode runs driver AND all executor threads in ONE JVM: 4g was
        # GC-bound once the registry passed ~200 queries (round-4 bench:
        # dedup_cluster 15.5 s GC spike, then hard OOM at 218 queries). Size
        # the heap FROM THE HOST (ADVICE r4 — a hardcoded 16g over-commits or
        # fails to launch on smaller boxes): ~1/8 of detected RAM, clamped to
        # [2g, 16g]; $SPARK_GRAFT_DRIVER_MEM stays the primary override.
        # Full-registry runs on a big box want 16g (this 128-GiB host: 16g).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # static conf; keep bucketed-table demos (tests/test_scale.py) out of
        # the repo tree
        .config("spark.sql.warehouse.dir", os.path.join(tempfile.gettempdir(), "rvi_spark_warehouse"))
        # iterative operators (dedup_cluster) checkpoint their converged
        # result so caches can be released eagerly; GC'd checkpoints are
        # cleaned by the context cleaner
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    spark = builder.getOrCreate()
    ensure_checkpoint_dir(spark)
    return spark
