"""Structured Streaming operators (SURVEY.md §2.11).

The reference's ingest was streaming-shaped (reports arriving over RVI) but
processed as periodic batch jobs (SURVEY.md §1.1 [P:med]); here each pattern
is a real incremental query. Harness (SURVEY.md §5.2/3): the driver fixtures
are static, so streams run with trigger(availableNow=True) into an in-memory
sink and the RESULT TABLE is returned — aggregations use complete mode, which
makes the final table equal the batch answer and therefore DuckDB-oracle
checkable (stronger than the rows-only minimum).

At scale: these exact plans run against a file/Kafka source with RocksDB
state stores; watermarks bound state, and `availableNow` becomes a real
trigger. Nothing in the query bodies changes — that is the point of
Structured Streaming's batch/stream unification.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.exprs import ts_str
from ..io import load, table_path
from ..operators.llm_text import _lang_drift_oracle_sql
from ..operators.ml_eval import MSPRT_TAU2
from ..operators.telemetry import _esd_extract, _esd_oracle_sql
from ..registry import query
from ..schemas import EVENTS


def _stream_src_dir(sf_dir: str) -> str:
    """Spark's file stream source requires a DIRECTORY; stage the events
    parquet into a per-sf scratch dir once (idempotent — the file is copied
    only if absent, so repeated runs see an identical listing)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "rvi_stream_src", key)
    os.makedirs(d, exist_ok=True)
    dst = os.path.join(d, "events.parquet")
    if not os.path.exists(dst):
        shutil.copyfile(table_path(sf_dir, "events"), dst)
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file stream (native timestamp[us] ts, same as io.load)."""
    return spark.readStream.schema(EVENTS).parquet(_stream_src_dir(sf_dir))


def run_to_table(sdf: DataFrame, sf_dir: str, tag: str, mode: str) -> DataFrame:
    """Execute a streaming frame to completion (availableNow) into a memory
    sink; returns the final result table."""
    name = f"st_{tag}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{tag}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


@query(
    "stream_tumbling",
    oracle="""
    SELECT strftime(make_timestamp(((epoch(date_trunc('second', ts))::BIGINT // 600) * 600)
                                   * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, count(*) AS n
    FROM events GROUP BY win_start, event_type
    """,
    tags=("streaming",),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling-window counts per channel with a 30-minute
    watermark — the reference's periodic fleet rollup as an incremental
    query. Complete mode ⇒ final table ≡ batch ⇒ exact oracle."""
    sdf = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(ts_str(F.col("win.start")).alias("win_start"), "event_type", "n")
    )
    return run_to_table(sdf, sf_dir, "tumbling", "complete")


@query(
    "stream_sliding",
    oracle="""
    SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n
    FROM (
        SELECT (epoch(date_trunc('second', ts))::BIGINT // 300 - i.i) * 300 AS ws
        FROM events CROSS JOIN (VALUES (0), (1)) i(i)
    )
    GROUP BY ws
    """,
    tags=("streaming",),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5: each event lands in exactly two
    windows (the twin materializes both via the i∈{0,1} trick)."""
    sdf = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(ts_str(F.col("win.start")).alias("win_start"), "n")
    )
    return run_to_table(sdf, sf_dir, "sliding", "complete")


@query(
    "stream_session",
    oracle="""
    WITH ordered AS (
        SELECT user_id, epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    flagged AS (
        -- session_window semantics: next event merges iff diff < gap
        -- (STRICT), unlike trip_sessionize's diff > gap boundary
        SELECT *, CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w >= 1800
                       THEN 1 ELSE 0 END AS new_flag
        FROM ordered WINDOW w AS (PARTITION BY user_id ORDER BY sec)
    ),
    sess AS (
        SELECT user_id, sec,
               sum(new_flag) OVER (PARTITION BY user_id ORDER BY sec
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(make_timestamp(min(sec) * 1000000), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("streaming",),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30-min gap) — the streaming form of trip
    derivation. Runs on second-truncated ts so the boundary rule (merge iff
    gap < 30 min, STRICT — note the difference from trip_sessionize's > G
    split rule) is decidable identically in the window-algebra twin."""
    sdf = (
        stream_events(spark, sf_dir)
        .withColumn("tsec", F.date_trunc("second", "ts"))
        .withWatermark("tsec", "30 minutes")
        .groupBy(F.session_window("tsec", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", ts_str(F.col("sw.start")).alias("session_start"), "n_events")
    )
    return run_to_table(sdf, sf_dir, "session", "complete")


@query(
    "stream_dedup",
    oracle="SELECT event_id, event_type FROM events",
    tags=("streaming",),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent ingest: the stream unioned with itself (every event arrives
    twice) then dropDuplicates on the key within the watermark — output is
    each event exactly once."""
    ev = stream_events(spark, sf_dir).select("event_id", "event_type", "ts")
    doubled = ev.unionByName(stream_events(spark, sf_dir).select("event_id", "event_type", "ts"))
    sdf = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id", "event_type")
    )
    return run_to_table(sdf, sf_dir, "dedup", "append")


@query(
    "stream_static_join",
    oracle="""
    SELECT b.band, count(*) AS n_events
    FROM events e
    JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1000000.0))
         b(band, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
    tags=("streaming",),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static dimension (metadata enrichment at ingest): the static
    side is planned once and broadcast into every micro-batch."""
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1_000_000.0)],
        "band string, lo double, hi double",
    )
    ev = stream_events(spark, sf_dir)
    sdf = (
        ev.join(F.broadcast(bands), (ev.value >= bands.lo) & (ev.value < bands.hi))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return run_to_table(sdf, sf_dir, "static_join", "complete")


@query(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
    tags=("streaming",),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases matched to same-user clicks in
    the trailing hour; watermarks bound both sides' state. One availableNow
    pass sees all data, so the append result equals the batch join."""
    ev = stream_events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("interval 1 hour")),
    ).select("purchase_id", "click_id")
    return run_to_table(joined, sf_dir, "ss_join", "append")


@query(
    "stream_output_modes",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    tags=("streaming",),
)
def stream_output_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-mode semantics on one aggregation: update mode emits changed
    groups per batch; with a single availableNow batch the union of updates
    equals the complete/batch answer — which is exactly what the oracle
    asserts."""
    sdf = stream_events(spark, sf_dir).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_to_table(sdf, sf_dir, "outmodes", "update")


@query(
    "source_stream_files",
    oracle="SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type",
    tags=("streaming", "source"),
)
def source_stream_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream (SURVEY.md §2.1): the events parquet treated as a
    continuously-arriving directory — the reference's RVI ingest shape."""
    sdf = stream_events(spark, sf_dir).groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return run_to_table(sdf, sf_dir, "src_files", "complete")


@query(
    "sink_stream_foreachbatch",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, count(*) AS n
    FROM events GROUP BY day
    """,
    tags=("streaming", "sink"),
)
def sink_stream_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch sink via foreachBatch (SURVEY.md §2.1): each batch is
    appended to a parquet derived table (the reference's periodic job writing
    aggregates back); the query output is read FROM THE SINK."""
    from ..sources.formats import scratch_dir

    out = scratch_dir(sf_dir, "febatch")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    sdf = stream_events(spark, sf_dir).select(
        "event_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    )
    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_febatch_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).groupBy("day").agg(F.count(F.lit(1)).alias("n"))


@query(
    "stream_stateful",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value,
           round(max(value), 6) AS peak_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key state (applyInPandasWithState): a running per-vehicle
    accumulator (count / sum / peak) updated batch-by-batch — the reference's
    stateful trip builder shape. Each batch updates the persisted state and
    emits the key's current snapshot; with one availableNow batch the final
    snapshot equals the batch aggregate, which the oracle checks exactly.

    At scale this state lives in the RocksDB state store, partitioned by key,
    with timeouts evicting idle vehicles.

    Note on Spark 4's successor API: `transformWithStateInPandas` (ValueState/
    ListState/MapState + timers) was probed in round 1 and re-checked every
    round since (round 7, 2026-08-15: `import google.protobuf` →
    `ModuleNotFoundError: No module named 'google'`): its Python runner
    requires `google.protobuf`, which is still not importable in this
    container (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE) —
    applyInPandasWithState is the supported path here and carries the same
    per-key-state semantics."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, total, peak = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            peak = max(peak, float(pdf["value"].max()))
        state.update((n, total, peak))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [round(total, 2)],
                "peak_value": [round(peak, 6)],
            }
        )

    sdf = (
        stream_events(spark, sf_dir)
        .select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, sum_value double, peak_value double",
            stateStructType="n long, total double, peak double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_table(sdf, sf_dir, "stateful", "update")


@query("stream_late_data", oracle=None, tags=("streaming", "rows-only"))
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-row semantics, demonstrated deterministically:

    phase A: days 1-19 arrive, processAllAvailable → watermark ≈ max(A) - 1h;
    phase B: three LATE rows (day 2) + on-time rows arrive → the late rows
    fall below the watermark and must be EXCLUDED from their (closed) windows.

    Append mode emits only watermark-closed daily windows, so the result is
    exactly the phase-A days with phase-A counts — late adds dropped. Batch
    boundaries are explicit (two processAllAvailable calls), so the driver's
    re-runs see identical results. Rows-only: no batch twin models watermark
    dropping."""
    from ..sources.formats import scratch_dir

    src = scratch_dir(sf_dir, "late_src")
    events = (
        spark.read.schema(EVENTS)
        .parquet(table_path(sf_dir, "events"))
        .select("event_id", "ts", "user_id", "value")
    )
    cutoff = "2024-01-20 00:00:00"
    early = events.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
    # late rows: shift three post-cutoff events back to day 2
    late = (
        events.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
        .limit(3)
        .withColumn("ts", F.lit("2024-01-02 12:00:00").cast("timestamp"))
    )
    ontime = events.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp")).limit(50)

    early.write.mode("overwrite").parquet(f"{src}/batchA")
    sdf = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .parquet(f"{src}/batchA")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(ts_str(F.col("win.start")).alias("day_start"), "n")
    )
    name = f"st_late_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_late_"))
        .start()
    )
    q.processAllAvailable()  # batch A: advances watermark past early days
    late.unionByName(ontime).write.mode("append").parquet(f"{src}/batchA")
    q.processAllAvailable()  # batch B: late rows dropped below watermark
    q.stop()
    return spark.table(name)


@query(
    "stream_resample",
    oracle="""
    SELECT user_id,
           (epoch(date_trunc('second', ts))::BIGINT // 300) * 300 AS bucket_epoch,
           count(*)             AS n_events,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY user_id, bucket_epoch
    """,
    tags=("streaming", "telemetry"),
)
def stream_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch resample_bucket (SURVEY.md §2.9): per-
    vehicle 5-minute rollup as an incremental windowed aggregation — the
    batch/stream pair that proves the same logical plan serves both modes."""
    sdf = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy("user_id", F.window(F.date_trunc("second", "ts"), "5 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("win.start")).alias("bucket_epoch"),
            "n_events",
            "avg_value",
        )
    )
    return run_to_table(sdf, sf_dir, "resample", "complete")


STREAM_ANOMALY_MIN_PRIOR = 5
STREAM_ANOMALY_TAU = 3.0


@query(
    "stream_anomaly",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, value,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    stats AS (
        SELECT user_id, event_id, value,
               count(*)      OVER w AS n_prior,
               avg(value)    OVER w AS mu,
               stddev(value) OVER w AS sigma
        FROM ordered
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, value,
           round((value - mu) / sigma, 4) AS zscore
    FROM stats
    WHERE n_prior >= {STREAM_ANOMALY_MIN_PRIOR} AND sigma > 0
      AND abs((value - mu) / sigma) > {STREAM_ANOMALY_TAU}
    """,
    tags=("streaming", "stateful"),
)
def stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE per-vehicle anomaly detection — the streaming counterpart of
    the batch anomaly_zscore, with causally-correct semantics: each reading
    is scored against the running Welford (n, mean, M2) state of its OWN
    PREFIX only (no peeking at later data), state carried across micro-
    batches per key. Readings with fewer than STREAM_ANOMALY_MIN_PRIOR
    predecessors are unscored (cold-start guard).

    The prefix order is (sec, event_id) — a total order, so results are
    identical for any batch slicing; the twin is the same prefix computed as
    an UNBOUNDED PRECEDING..1 PRECEDING window, making a stateful streaming
    operator exactly SQL-hash-checkable. Welford vs the twin's windowed
    moments differ only in float addition order; round(z, 4) absorbs it
    (PARITY.md #6).

    At scale: state is three doubles per vehicle in RocksDB; each batch
    touches only keys present in the batch. Timeout-evict idle vehicles for
    bounded state."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def score(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        batch = pd.concat(list(pdf_iter), ignore_index=True).sort_values(
            ["sec", "event_id"], kind="mergesort"
        )
        out_ids, out_vals, out_z = [], [], []
        for event_id, value in zip(batch["event_id"], batch["value"]):
            v = float(value)
            if n >= STREAM_ANOMALY_MIN_PRIOR:
                sigma = math.sqrt(m2 / (n - 1)) if n > 1 else 0.0
                if sigma > 0:
                    z = (v - mean) / sigma
                    if abs(z) > STREAM_ANOMALY_TAU:
                        out_ids.append(int(event_id))
                        out_vals.append(v)
                        out_z.append(round(z, 4))
            # Welford update AFTER scoring: the state a reading sees is its
            # strict prefix
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_ids),
                "event_id": out_ids,
                "value": out_vals,
                "zscore": out_z,
            }
        )

    sdf = (
        stream_events(spark, sf_dir)
        .select(
            "user_id",
            "event_id",
            "value",
            F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("sec"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            score,
            outputStructType="user_id long, event_id long, value double, zscore double",
            stateStructType="n long, mean double, m2 double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_table(sdf, sf_dir, "anomaly", "append")


@query(
    "stream_latest_per_key",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch(date_trunc('second', ts))::BIGINT DESC,
                                           event_id DESC) AS rn
        FROM events
    )
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM ranked WHERE rn = 1
    """,
    tags=("streaming",),
)
def stream_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live current-state table — the reference's dashboard lookup as an
    incremental query: per-vehicle max_by over a composite (sec, event_id)
    key, update-on-every-batch. The streaming state is ONE row per vehicle
    (the running argmax), and with availableNow the final table equals the
    batch latest_per_key, giving a stateful streaming op an exact batch
    twin.

    max_by(x, struct(sec, event_id)) — not row_number — because streaming
    aggregation state must be a pure aggregate; the composite key pins tie
    semantics to the batch twin (PARITY.md #7)."""
    sdf = (
        stream_events(spark, sf_dir)
        .select(
            "user_id",
            "event_id",
            "value",
            F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("sec"),
        )
        .groupBy("user_id")
        .agg(
            F.max_by("event_id", F.struct("sec", "event_id")).alias("last_event_id"),
            F.max_by("value", F.struct("sec", "event_id")).alias("last_value"),
        )
    )
    return run_to_table(sdf, sf_dir, "latest", "complete")


STREAM_TOPK_N = 10


@query(
    "stream_topk",
    oracle=f"""
    SELECT user_id, n_events, total_value FROM (
        SELECT user_id, count(*) AS n_events,
               round(sum(value), 2) AS total_value,
               row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rn
        FROM events GROUP BY user_id
    ) WHERE rn <= {STREAM_TOPK_N}
    """,
    tags=("streaming",),
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live leaderboard — top-{STREAM_TOPK_N} vehicles by event volume as an
    incremental query. Complete output mode is what makes sorting legal in
    a stream (the whole result table is re-emitted per trigger, so a total
    order exists); with availableNow the final table equals the batch
    leaderboard. Ties break on user_id so driver re-runs are stable.

    At scale the aggregation state is one row per vehicle; the sort+limit
    runs over the (small) aggregate result each trigger, not the stream."""
    sdf = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(STREAM_TOPK_N)
    )
    return run_to_table(sdf, sf_dir, "topk", "complete")


# --- Spark 4 Python DataSource: custom STREAMING source -----------------------
STREAM_SIM_BATCHES = 3
STREAM_SIM_ROWS = 1000  # rows per micro-batch
STREAM_SIM_VINS = 40


def _register_rvi_sim_stream(spark: SparkSession) -> None:
    """Custom streaming connector via the Python DataSource API: a
    SimpleDataSourceStreamReader whose offset is the micro-batch index —
    the structure a queue/REST poller has (read from offset, return rows +
    next offset, replay any offset range for recovery)."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    def _batch_rows(b: int) -> list:
        # plain list, not a generator: the runner pickles the returned rows
        # into its prefetch cache
        base = b * STREAM_SIM_ROWS
        return [
            (rid, f"vin-{rid % STREAM_SIM_VINS}", ((rid * 31) % 500) / 10.0)
            for rid in range(base, base + STREAM_SIM_ROWS)
        ]

    class SimStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"batch": 0}

        def read(self, start):
            b = start["batch"]
            if b >= STREAM_SIM_BATCHES:
                return iter([]), start  # dry — offset stops advancing
            # iter() over a list: the runner requires an iterator, and
            # list_iterator pickles into the prefetch cache (a generator
            # would not)
            return iter(_batch_rows(b)), {"batch": b + 1}

        def readBetweenOffsets(self, start, end):
            rows: list = []
            for b in range(start["batch"], end["batch"]):
                rows.extend(_batch_rows(b))
            return iter(rows)

    class RviSimStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "rvi_sim_stream"

        def schema(self):
            return "report_id bigint, vin string, reading double"

        def simpleStreamReader(self, schema):
            return SimStreamReader()

    spark.dataSource.register(RviSimStreamSource)


@query(
    "stream_python_source",
    oracle=f"""
    WITH sim AS (
        SELECT g AS report_id,
               'vin-' || (g % {STREAM_SIM_VINS}) AS vin,
               ((g * 31) % 500) / 10.0 AS reading
        FROM generate_series(0, {STREAM_SIM_BATCHES * STREAM_SIM_ROWS - 1}) t(g)
    )
    SELECT vin,
           count(*)::BIGINT AS n_reports,
           round(sum(reading), 2) AS sum_reading
    FROM sim GROUP BY 1
    """,
    tags=("streaming",),
)
def stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming over the CUSTOM Python connector — completing
    the connector matrix (batch custom source: `source_python_datasource`):
    offsets advance one micro-batch per trigger exactly as a queue poller's
    would, the checkpoint records them, and recovery replays
    readBetweenOffsets. The deterministic stream dries up after a fixed
    offset, so repeated AvailableNow starts against one checkpoint drain it
    completely; the aggregate is served from the accumulated sink and
    hash-verified against a generate_series twin of the whole stream."""
    _register_rvi_sim_stream(spark)
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    name = f"st_pysrc_{key}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_pysrc_")
    sink = tempfile.mkdtemp(prefix="sink_pysrc_")
    # each AvailableNow start consumes the offsets available at start (one
    # simple-reader prefetch); loop until the offset stops advancing — the
    # restart-with-same-checkpoint cycle every production stream exercises
    for _ in range(STREAM_SIM_BATCHES + 1):
        q = (
            spark.readStream.format("rvi_sim_stream")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    acc = spark.read.schema("report_id long, vin string, reading double").parquet(sink)
    _ = name  # memory-sink naming convention kept for grep-ability
    return acc.groupBy("vin").agg(
        F.count(F.lit(1)).alias("n_reports"),
        F.round(F.sum("reading"), 2).alias("sum_reading"),
    )


@query(
    "stream_merge_sink",
    oracle="""
    WITH keyed AS (
        -- (ts, event_id) tie-break packed into one BIGINT; date_trunc
        -- before epoch so both engines truncate (PARITY.md #3, #7)
        SELECT *, epoch(date_trunc('second', ts))::BIGINT * 2097152 + event_id AS ord
        FROM events
    )
    SELECT user_id,
           arg_max(value, ord) AS value,
           arg_max(event_id, ord) AS src_event
    FROM keyed GROUP BY user_id
    """,
    tags=("streaming", "sink", "cdc"),
)
def stream_merge_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE upsert via foreachBatch — the lakehouse write pattern
    (VERDICT r3 item 7): each micro-batch reduces to latest-per-key, then
    MERGEs into the persisted state table keyed by user_id (insert new keys,
    update keys whose ord advances). Composes `cdc_merge`'s batch semantics
    with a real multi-batch stream: the source directory is staged as three
    file generations and maxFilesPerTrigger=1 makes each its own batch.

    IDEMPOTENT by construction — the two rules a production foreachBatch
    MERGE must follow, both demonstrated here:
    1. the merge itself is a commutative re-reduction (union + max_by over
       a total order), so replays and batch reordering cannot change the
       fixed point;
    2. every write is keyed by batch_id (state version directory v{n},
       mode=overwrite): a batch replayed after a failure overwrites its own
       versioned output deterministically instead of double-applying.
    A real deployment swaps the versioned-parquet state for a Delta/Iceberg
    MERGE INTO; the plan inside each batch — partial-agg reduce, union with
    ~key-count state, one re-reduce — is unchanged. State shuffles on the
    merge key only; payloads never re-shuffle.

    Final state equals latest-per-key over the whole corpus regardless of
    file→batch assignment, so the oracle is exact."""
    from ..sources.formats import scratch_dir

    src = scratch_dir(sf_dir, "merge_sink_src")
    state_root = scratch_dir(sf_dir, "merge_sink_state")
    ev = spark.read.schema(EVENTS).parquet(table_path(sf_dir, "events")).select(
        "event_id", "ts", "user_id", "value"
    )
    # three deterministic file generations (early / mid / late days)
    for i, (lo, hi) in enumerate(((0, 11), (11, 21), (21, 32))):
        gen = ev.filter(
            (F.dayofmonth("ts") >= lo) & (F.dayofmonth("ts") < hi)
        )
        gen.coalesce(1).write.mode("overwrite").parquet(f"{src}/stage{i}")
        part = next(
            f for f in os.listdir(f"{src}/stage{i}") if f.endswith(".parquet")
        )
        shutil.move(os.path.join(src, f"stage{i}", part), os.path.join(src, f"gen{i}.parquet"))
        shutil.rmtree(os.path.join(src, f"stage{i}"), ignore_errors=True)

    latest_version: list[int] = [-1]

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        ord_key = F.unix_timestamp("ts") * 2097152 + F.col("event_id")
        batch_latest = batch_df.groupBy("user_id").agg(
            F.max_by("value", ord_key).alias("value"),
            F.max_by("event_id", ord_key).alias("src_event"),
            F.max(ord_key).alias("ord"),
        )
        prev = os.path.join(state_root, f"v{latest_version[0]}")
        if latest_version[0] >= 0 and os.path.exists(prev):
            # MERGE = union with current state + re-reduce on the key (the
            # mergeable-aggregate form of upsert; ord totally orders writes)
            merged = (
                sp.read.parquet(prev)
                .unionByName(batch_latest)
                .groupBy("user_id")
                .agg(
                    F.max_by("value", F.col("ord")).alias("value"),
                    F.max_by("src_event", F.col("ord")).alias("src_event"),
                    F.max("ord").alias("ord"),
                )
            )
        else:
            merged = batch_latest
        merged.write.mode("overwrite").parquet(os.path.join(state_root, f"v{batch_id}"))
        latest_version[0] = batch_id

    q = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_mergesink_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = os.path.join(state_root, f"v{latest_version[0]}")
    return spark.read.parquet(final).select("user_id", "value", "src_event")


@query(
    "stream_stream_outer_join",
    oracle="""
    WITH cutoff AS (SELECT max(ts) - INTERVAL 4 HOUR AS c FROM events)
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p
    LEFT JOIN events c
      ON c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
      AND p.ts <= (SELECT c FROM cutoff)
    """,
    tags=("streaming",),
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join — the semantics inner joins don't have:
    an unmatched left row must be HELD IN STATE until the watermark proves
    no matching right row can still arrive, then emitted with nulls. This
    is the attribution join that keeps unconverted purchases (click_id
    NULL) instead of dropping them.

    Determinism contract: outer-null emission depends on the FINAL
    watermark, so purchases near the end of the timeline would be
    data-dependently held forever (stream ends before their state
    finalizes). The query therefore bounds the left side to
    max(ts) − 4 h — strictly older than the final watermark (max(ts) − 2 h)
    minus the 1 h join window — making every retained purchase finalizable
    before termination and the result equal to the batch left join the
    oracle runs. The bound itself comes from a one-scalar batch read of the
    same fixture (bound derivation, same pattern as join_interval's
    min/max). At scale the same rule applies operationally: an outer
    stream-stream join's tail rows resolve only as the watermark advances —
    a real deployment reads them from the NEXT trigger, not at shutdown."""
    bounds = (
        spark.read.schema(EVENTS)
        .parquet(os.path.join(_stream_src_dir(sf_dir), "events.parquet"))
        .agg((F.max("ts") - F.expr("interval 4 hours")).alias("c"))
        .collect()[0]["c"]
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
        # cutoff AFTER the watermark node: the watermark must track the FULL
        # purchase stream (global watermark = min over both sides); filtering
        # first would drag this side's watermark back to cutoff − 2 h and
        # strand unmatched purchases in the (cutoff − 2 h, cutoff] band
        .filter(F.col("p_ts") <= F.lit(bounds))
    )
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("interval 1 hour")),
        "leftOuter",
    ).select("purchase_id", "click_id")
    return run_to_table(joined, sf_dir, "ss_outer", "append")


# Checkpoint dirs of the most recent RocksDB-backed runs, keyed by query
# name — inspected by tests/test_golden.py to prove the RocksDB provider
# actually engaged (``.sst``/``.zip`` artifacts), not just that the answer
# happened to match.
_LAST_ROCKSDB_CKPT: dict[str, str] = {}

_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _run_with_rocksdb(spark: SparkSession, sdf: DataFrame, tag: str, mode: str) -> tuple[DataFrame, str]:
    """Execute a stateful streaming frame to completion with the RocksDB
    state store provider, returning (result table, checkpoint dir).

    The provider class is a SESSION conf read at query start (a per-query
    writeStream option is silently ignored — probed in round 5), so it is
    set just for the start/await window and restored after; queries in this
    engine run sequentially, so nothing else observes the change."""
    name = f"st_{tag}_{hashlib.md5(tag.encode()).hexdigest()[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{tag}_")
    prev = spark.conf.get(_PROVIDER_CONF, None)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(_PROVIDER_CONF, _ROCKSDB_PROVIDER)
    # One RocksDB INSTANCE (memtable + SST dir + snapshot upload) per state
    # partition, fixed for the checkpoint's life — size to the demo keyspace
    # (scan_state_store's knob rationale), not the session shuffle default.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prev)
    return spark.table(name), ckpt


@query(
    "stream_rocksdb_state",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_rocksdb_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running aggregate on the RocksDB state store provider — the
    production state backend for large keyspaces (VERDICT r4 item 8): the
    default HDFS-backed provider holds every key's state in executor HEAP,
    so state size is bounded by memory; RocksDB spills to local SSD with
    changelog/snapshot checkpointing, which is what makes 10⁸-vehicle
    keyspaces feasible. Same complete-mode availableNow harness as
    stream_tumbling, so the final table equals the batch aggregate and the
    oracle is exact; a golden test separately asserts the checkpoint
    contains RocksDB artifacts (.zip snapshots / .sst files) so this can't
    silently degrade to the heap provider."""
    sdf = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    out, ckpt = _run_with_rocksdb(spark, sdf, "rocksdb_state", "complete")
    _LAST_ROCKSDB_CKPT["stream_rocksdb_state"] = ckpt
    return out


@query(
    "scan_state_store",
    oracle="""
    SELECT user_id,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events WHERE user_id < 50 GROUP BY user_id
    """,
    tags=("source", "streaming", "stateful"),
)
def scan_state_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store BATCH reader (`spark.read.format("statestore")`, Spark 4's
    state data source): read the per-key state of a finished streaming
    checkpoint back as an ordinary DataFrame — the ops tool for inspecting,
    validating, or repairing live streaming state without stopping the job
    (at 100 TB of state, "just rerun the stream" is not a debugging
    strategy). The op runs a small keyed count/sum aggregate to completion,
    then reads the checkpoint's state rows and verifies they equal the batch
    aggregate — which is exactly the invariant an on-call engineer checks
    against a suspect production checkpoint.

    The state value schema is the aggregate's internal buffer (count, sum —
    unaliased accumulator names), so the projection maps buffer fields to
    the public columns; rounding happens on read, state holds raw sums.

    State-partition sizing: a streaming aggregate creates one state store
    per shuffle partition, FIXED for the checkpoint's lifetime — each pays
    per-batch commit overhead regardless of how many keys it holds. 50
    keys across the session default of 32 stores is waste (measured ~3.2 s
    of the op's bench cost was store commits); the query pins 4 for its
    own checkpoint and restores the conf. At 100 TB the same knob is sized
    UP (keys × state size ÷ executor memory) — the point is that it is a
    deliberate per-pipeline decision frozen into the checkpoint, not an
    inherited session default."""
    sdf = (
        stream_events(spark, sf_dir)
        .filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    name = "st_statestore_src"
    ckpt = tempfile.mkdtemp(prefix="ckpt_statestore_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.count").alias("n_events"),
        F.round(F.col("value.sum"), 2).alias("sum_value"),
    )


@query(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_id, event_type, value FROM events
    """,
    tags=("streaming",),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dropDuplicatesWithinWatermark` (Spark 3.5+/4) — the BOUNDED-STATE
    dedup `stream_dedup` can't give you: plain dropDuplicates keeps every
    seen key in state FOREVER (the watermark only filters late input), so a
    year-long stream accumulates a year of keys; the WithinWatermark variant
    stores an expiration timestamp per key and EVICTS once the watermark
    passes it — state is bounded by (dup-arrival window × ingest rate), the
    contract a 100 TB ingest actually wants ("retries land within an hour",
    not "no key ever repeats"). Same doubled-stream harness as stream_dedup:
    every event arrives twice, must come out exactly once; rows are
    byte-identical so first-wins is deterministic."""
    cols = ("event_id", "event_type", "value", "ts")
    doubled = stream_events(spark, sf_dir).select(*cols).unionByName(
        stream_events(spark, sf_dir).select(*cols)
    )
    sdf = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type", "value")
    )
    return run_to_table(sdf, sf_dir, "dedup_wm", "append")


def _register_rvi_jsonl_stream_sink(spark: SparkSession) -> None:
    """Define + register the `rvi_jsonl_stream_sink` Python data source
    (STREAMING writer — the fourth quadrant of the connector matrix:
    sources/formats.py has the batch reader + batch writer, streams.py has
    the streaming reader). Lazy and idempotent."""
    import json as _json

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    class BatchCommit(WriterCommitMessage):
        def __init__(self, staging: str, final: str):
            self.staging = staging
            self.final = final

    class JsonlStreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            from pyspark import TaskContext

            # Same attempt-unique staging discipline as the batch JsonlWriter
            # (ADVICE r4), but keyed by (batch, partition): exactly-once
            # output relies on commit(batchId) publishing one attempt per
            # partition per micro-batch.
            ctx = TaskContext.get()
            pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
            final = os.path.join(self.path, f"part-{pid:05d}-{attempt}.jsonl")
            staging = final + ".tmp"
            n = 0
            with open(staging, "w") as f:
                for row in iterator:
                    f.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return BatchCommit(staging, final)

        def commit(self, messages, batchId):
            for m in messages:
                os.replace(m.staging, m.final)

        def abort(self, messages, batchId):
            import glob as _glob

            for leftover in _glob.glob(os.path.join(self.path, "*.jsonl.tmp")):
                os.remove(leftover)

    class RviJsonlStreamSink(DataSource):
        @classmethod
        def name(cls):
            return "rvi_jsonl_stream_sink"

        def streamWriter(self, schema, overwrite):
            return JsonlStreamWriter(self.options)

    spark.dataSource.register(RviJsonlStreamSink)


@query(
    "sink_stream_python_datasource",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events WHERE event_id < 2500
    GROUP BY event_type
    """,
    tags=("sink", "streaming"),
)
def sink_stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING sink via the Python DataSource API
    (`DataSourceStreamWriter`) — completes the connector matrix: batch
    reader (source_python_datasource), batch writer
    (sink_python_datasource), streaming reader (stream_python_source), and
    now the streaming writer a bespoke egress (queue producer, REST batch
    POST) plugs into. Per micro-batch, each task streams its partition to a
    staging artifact; `commit(messages, batchId)` publishes them atomically
    once ALL tasks of that batch succeed — the per-batch two-phase hook
    that makes custom streaming sinks idempotent under retries (a replayed
    batch re-publishes the same batchId deterministically).

    Round-trip proof: 2.5k events stream out through the custom writer as
    JSONL, come back through the ordinary JSON reader, and the aggregate
    must equal the clean table."""
    _register_rvi_jsonl_stream_sink(spark)
    from ..sources.formats import scratch_dir

    out = scratch_dir(sf_dir, "pystreamsink")
    sdf = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_id") < 2500)
        .select("event_id", "event_type", "value")
    )
    q = (
        sdf.writeStream.format("rvi_jsonl_stream_sink")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_pystreamsink_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    re_read = spark.read.schema("event_id long, event_type string, value double").json(
        out, pathGlobFilter="*.jsonl"
    )
    return re_read.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "stream_sketch_distinct",
    oracle="""
    SELECT strftime(make_timestamp(((epoch(date_trunc('second', ts))::BIGINT // 3600) * 3600)
                                   * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
           count(DISTINCT user_id)::BIGINT AS n_vehicles
    FROM events GROUP BY win_start
    """,
    tags=("streaming", "sketch"),
)
def stream_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-count via a MERGEABLE sketch in streaming state —
    the production pattern for "unique vehicles per window" over an
    unbounded stream: the aggregation state per window is a Theta sketch
    buffer (bounded bytes), updated batch-by-batch, never a grows-forever
    distinct set. Contrast stream_tumbling (additive counts — trivially
    incremental) and batch agg_theta_retention (the same sketch family at
    rest): this op puts the sketch INSIDE the streaming state store.

    Exactness contract (same as agg_theta_retention): below 4096 distinct
    vehicles per hourly window the sketch is exact, so the final table
    equals the batch COUNT(DISTINCT) oracle; at true fleet scale it
    degrades to ±1.6 % while state stays ~4 KB per window — the trade that
    makes per-window distinct viable in a stream at all. 1-hour tumbling
    windows with a 30-minute watermark; complete mode ⇒ final table ≡
    batch ⇒ exact oracle."""
    sdf = (
        stream_events(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(
            F.round(F.theta_sketch_estimate(F.theta_sketch_agg("user_id")))
            .cast("long")
            .alias("n_vehicles")
        )
        .select(ts_str(F.col("win.start")).alias("win_start"), "n_vehicles")
    )
    return run_to_table(sdf, sf_dir, "sketchdist", "complete")


@query(
    "stream_observe_metrics",
    oracle="""
    SELECT count(*)::BIGINT AS n_rows,
           round(sum(value), 2) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("streaming", "observability"),
)
def stream_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming in-flight metrics — `observe()` on an UNBOUNDED frame: the
    data-quality counters ride each micro-batch as accumulators and surface
    per batch in the query's progress events (`observedMetrics`), which is
    how a production pipeline alerts on a bad batch WITHOUT a second pass
    (the monitoring listener reads progress; nothing re-scans the stream).
    Batch twin: `observe_metrics` (same counters, Observation API).

    Metrics are merged ACROSS batches here (counts/sums add, min/max fold,
    rounding only after the merge — a per-batch round would double-round),
    so the result is batch-count invariant: one availableNow batch or
    fifty, the merged metrics equal the batch aggregate, which the oracle
    checks exactly."""
    import math as _math

    sdf = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .observe(
            "stream_quality",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("sum_raw"),
            F.min("value").alias("min_raw"),
            F.max("value").alias("max_raw"),
        )
    )
    q = (
        sdf.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_obs_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n, total, lo, hi = 0, 0.0, _math.inf, -_math.inf
    for prog in q.recentProgress:
        om = (prog.get("observedMetrics") or {}).get("stream_quality")
        if om is not None and not isinstance(om, dict):
            om = om.asDict()  # progress surfaces metrics as a Row
        if not om or not om.get("n_rows"):
            continue  # empty batch contributes nothing (its min/max are NULL)
        n += om["n_rows"]
        total += om["sum_raw"]
        lo = min(lo, om["min_raw"])
        hi = max(hi, om["max_raw"])
    return spark.createDataFrame(
        [(n, round(total, 2), round(lo, 2), round(hi, 2))],
        "n_rows bigint, sum_value double, min_value double, max_value double",
    )


@query(
    "stream_incremental_resume",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "exactly-once"),
)
def stream_incremental_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once incremental processing across a RESTART — the streaming
    guarantee the other stream ops take as given, demonstrated end-to-end:
    run 1 ingests the first half of the corpus (availableNow) into a
    checkpointed stateful aggregation and stops; new files then land in the
    source directory; run 2 starts FROM THE SAME CHECKPOINT, and the file
    source's seen-files log + the state store's recovered aggregation mean
    it processes ONLY the new files while the final complete-mode output
    still equals the batch aggregate over everything — no double counting
    (file A replayed) and no gap (state lost). The oracle checks exactly
    that equality.

    At scale this is the nightly-ingest pattern: the checkpoint IS the
    pipeline's memory (offsets + state), restarts are free, and
    reprocessing cost is proportional to NEW data only. Fresh scratch dirs
    per call keep the driver's re-run deterministic."""
    import glob as _glob

    from ..io import load

    ev = load(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="inc_src_")
    ckpt = tempfile.mkdtemp(prefix="inc_ckpt_")

    def stage(df, tag: str) -> None:
        tmp = tempfile.mkdtemp(prefix=f"inc_stage_{tag}_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for i, f in enumerate(sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))):
            shutil.move(f, os.path.join(src, f"{tag}_{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    agg_name = f"inc_{hashlib.md5((src + ckpt).encode()).hexdigest()[:8]}"

    def run_pass(suffix: str) -> None:
        sdf = (
            spark.readStream.schema(EVENTS)
            .parquet(src)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
        )
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"{agg_name}_{suffix}")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: first half only (even event_ids), checkpointed
    stage(ev.filter(F.col("event_id") % 2 == 0), "a")
    run_pass("r1")
    # new data lands; run 2 resumes from the SAME checkpoint
    stage(ev.filter(F.col("event_id") % 2 == 1), "b")
    run_pass("r2")
    return spark.table(f"{agg_name}_r2")


PSI_VALUE_WIDTH = 50   # events.value per bucket
PSI_VALUE_BUCKETS = 10 # fixed smoothing denominator
PSI_WINDOW = "30 minutes"


@query(
    "stream_psi_drift",
    oracle=f"""
    WITH cur AS (
        SELECT ((epoch(date_trunc('second', ts))::BIGINT // 1800) * 1800) AS ws,
               least(floor(value / {PSI_VALUE_WIDTH})::BIGINT, {PSI_VALUE_BUCKETS - 1}) AS bucket,
               count(*)::BIGINT AS n_cur
        FROM events GROUP BY 1, 2
    ),
    ref AS (
        SELECT least(floor(value / {PSI_VALUE_WIDTH})::BIGINT, {PSI_VALUE_BUCKETS - 1}) AS bucket,
               count(*)::BIGINT AS n_ref
        FROM events GROUP BY 1
    ),
    reftot AS (SELECT sum(n_ref)::BIGINT AS nt FROM ref),
    p AS (
        SELECT cur.ws, cur.bucket,
               cur.n_cur,
               (cur.n_cur + 0.5)
                   / (sum(cur.n_cur) OVER (PARTITION BY cur.ws) + 0.5 * {PSI_VALUE_BUCKETS}) AS p_cur,
               (ref.n_ref + 0.5) / (reftot.nt + 0.5 * {PSI_VALUE_BUCKETS}) AS p_ref
        FROM cur JOIN ref ON cur.bucket = ref.bucket CROSS JOIN reftot
    )
    SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
           sum(n_cur)::BIGINT AS n_events,
           round(sum((p_cur - p_ref) * ln(p_cur / p_ref)), 6) + 0.0 AS psi
    FROM p GROUP BY ws
    """,
    tags=("streaming", "stats"),
)
def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distribution-drift monitor — corpus_drift_psi's online
    twin: the stream maintains per-30-minute value histograms (ONE windowed
    stateful aggregation, complete mode ⇒ final table ≡ batch ⇒ exact
    oracle), and the drift score against the static reference histogram is
    computed on the RESULT table, not inside the stream — chaining a second
    stateful aggregation onto a windowed stream is exactly what Structured
    Streaming restricts, so the scoring stage is batch post-processing of
    the continuously-maintained state (the production deployment would put
    it in foreachBatch, stream_merge_sink's pattern).

    Emits one row per window: event count and Laplace-smoothed PSI against
    the whole-corpus reference — an alert threshold (PSI > 0.2) away from a
    pager. The reference here is the same events table (so windows score
    near zero); production swaps any pinned baseline histogram — the
    broadcast-join shape is identical."""
    ev = stream_events(spark, sf_dir)
    bucket = F.least(
        F.floor(F.col("value") / PSI_VALUE_WIDTH).cast("bigint"),
        F.lit(PSI_VALUE_BUCKETS - 1),
    )
    sdf = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", PSI_WINDOW).alias("win"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .select(ts_str(F.col("win.start")).alias("win_start"), "bucket", "n_cur")
    )
    hist = run_to_table(sdf, sf_dir, "psi_drift", "complete")

    # Batch scoring stage over the final histogram table.
    spark_b = hist.sparkSession
    ref = (
        load(spark_b, sf_dir, "events")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    reftot = ref.agg(F.sum("n_ref").alias("nt"))
    w_win = Window.partitionBy("win_start")
    p_cur = (F.col("n_cur") + 0.5) / (
        F.sum("n_cur").over(w_win) + 0.5 * PSI_VALUE_BUCKETS
    )
    p_ref = (F.col("n_ref") + 0.5) / (F.col("nt") + 0.5 * PSI_VALUE_BUCKETS)
    scored = (
        hist.join(F.broadcast(ref), "bucket")
        .crossJoin(F.broadcast(reftot))
        .select(
            "win_start",
            "n_cur",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("term"),
        )
    )
    return scored.groupBy("win_start").agg(
        F.sum("n_cur").alias("n_events"),
        (F.round(F.sum("term"), 6) + F.lit(0.0)).alias("psi"),
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@query(
    "stream_stateful_rocksdb",
    oracle="""
    SELECT user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(DISTINCT event_id)::BIGINT AS n_unique
    FROM events
    WHERE user_id < 50
    GROUP BY user_id, day
    """,
    tags=("streaming", "stateful", "rocksdb"),
)
def stream_stateful_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-scale state backend, actually exercised: the same
    stateful-pipeline shape as the HDFS-backed ops (dropDuplicates state +
    aggregation state, chained) but running on the RocksDB state store
    provider with changelog checkpointing — the configuration a 100 TB /
    1000-executor deployment runs, where per-key state exceeds executor
    heap and the HDFSBackedStateStore's in-memory map ceases to be an
    option. Two stateful operators share the backend in one query:
    dropDuplicates("event_id") (exactly-once repair of an at-least-once
    source) feeding a per-vehicle-per-day count. Results must be
    state-backend-invariant — the DuckDB oracle pins that, making this a
    provider-conformance check, not just a demo.

    The provider class is a session conf read at query START, so it is set
    just for this query and restored in a finally (registry queries run
    sequentially in one driver). Changelog checkpointing writes per-batch
    deltas instead of full RocksDB snapshots — the knob that makes
    large-state checkpointing incremental at scale."""
    before = {
        "spark.sql.streaming.stateStore.providerClass": spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
            spark.conf.get(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                None,
            ),
    }
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    try:
        sdf = (
            stream_events(spark, sf_dir)
            .filter(F.col("user_id") < 50)
            .select("event_id", "user_id", "ts")
            .dropDuplicates(["event_id"])
            .groupBy(
                "user_id",
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                    "day"
                ),
            )
            .agg(F.count(F.lit(1)).alias("n_unique"))
        )
        return run_to_table(sdf, sf_dir, "rocksdb", "complete")
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _stream_docs_dir(sf_dir: str) -> str:
    """Stage the documents parquet into a scratch dir for the file stream
    source (same idempotent convention as _stream_src_dir)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "rvi_stream_docs", key)
    os.makedirs(d, exist_ok=True)
    dst = os.path.join(d, "documents.parquet")
    if not os.path.exists(dst):
        shutil.copyfile(table_path(sf_dir, "documents"), dst)
    return d


STREAM_CORPUS_MIN_CHARS = 100  # ingest quality floor


@query(
    "stream_corpus_pipeline",
    oracle=f"""
    SELECT source,
           count(DISTINCT md5(text))::BIGINT AS n_kept,
           min(n_chars)::BIGINT AS min_chars,
           max(n_chars)::BIGINT AS max_chars
    FROM documents
    WHERE n_chars >= {STREAM_CORPUS_MIN_CHARS}
    GROUP BY source
    """,
    tags=("streaming", "llm", "pipeline"),
)
def stream_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion — the STREAMING form of the
    quality→dedup→rollup funnel (corpus_quality_pipeline /
    corpus_dedup_report are its batch kin): crawl snapshots arrive as
    files, each micro-batch quality-gates new documents, streaming
    dropDuplicates suppresses re-crawled content against ALL state seen
    so far (keyed on (source, content-md5) so the survivor's attribution
    is deterministic — an md5-only key would leave per-source counts
    dependent on arrival order), and the running per-source acceptance
    report updates in complete mode.

    At 100 TB this is the shape that replaces nightly full-corpus dedup
    jobs: state is the md5 key set (RocksDB-backed, see
    stream_stateful_rocksdb), each snapshot pays only its own scan, and
    the watermark policy decides how long re-crawl suppression history
    lives. With one availableNow pass the final table equals the batch
    distinct-count twin, which the oracle pins."""
    sdf = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .parquet(_stream_docs_dir(sf_dir))
        .filter(F.col("n_chars") >= STREAM_CORPUS_MIN_CHARS)
        .withColumn("content_md5", F.md5(F.col("text").cast("binary")))
        .dropDuplicates(["source", "content_md5"])
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
    return run_to_table(sdf, sf_dir, "corpus", "complete")


@query(
    "stream_quantile_histogram",
    oracle="""
    WITH hist AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
               event_type,
               floor(value * 100 + 0.5)::BIGINT AS cents,
               count(*)::BIGINT AS cnt
        FROM events GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT win_start, event_type, cents, cnt,
               sum(cnt) OVER (PARTITION BY win_start, event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS cum_n,
               sum(cnt) OVER (PARTITION BY win_start, event_type)::BIGINT AS n
        FROM hist
    )
    SELECT win_start, event_type, max(n)::BIGINT AS n,
           min(CASE WHEN cum_n >= (n + 1) // 2 THEN cents END)::BIGINT
               AS p50_cents,
           min(CASE WHEN cum_n >= (9 * n + 9) // 10 THEN cents END)::BIGINT
               AS p90_cents
    FROM cum GROUP BY win_start, event_type
    """,
    tags=("streaming", "scale"),
)
def stream_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT percentiles — agg_quantile_histogram's online twin,
    and the proof that the histogram-quantile monoid is a legal streaming
    state: the stream maintains per-(day window, channel, cents) counts
    as ONE windowed stateful aggregation (complete mode ⇒ the final table
    equals the batch histogram ⇒ exact oracle), and the order-statistic
    extraction (cumulative counts + integer ceilings — no interpolation,
    no float) runs on the RESULT table as batch post-processing, exactly
    stream_psi_drift's two-stage rule (a second stateful pass inside the
    stream is what Structured Streaming restricts; in production the
    extraction lives in foreachBatch).

    Why this matters: percentile_approx is the usual streaming answer
    because sort-based exact percentiles are unmaintainable online — but
    the cents histogram is a bounded-domain COMMUTATIVE MONOID, so the
    stream carries exact quantile state at |windows x channels x distinct
    cents| rows, updated by pure addition, mergeable across shards and
    restarts. p50/p90 per channel per day are then exact order
    statistics, not sketches. State is bounded by the value domain, not
    the event count — the same argument agg_quantile_histogram makes for
    batch, carried through the watermark machinery."""
    ev = stream_events(spark, sf_dir)
    sdf = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "1 day").alias("win"),
            "event_type",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(ts_str(F.col("win.start")).alias("win_start"), "event_type", "cents", "cnt")
    )
    hist = run_to_table(sdf, sf_dir, "quantile_hist", "complete")
    wcum = (
        Window.partitionBy("win_start", "event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("win_start", "event_type")
    cum = hist.select(
        "win_start",
        "event_type",
        "cents",
        F.sum("cnt").over(wcum).alias("cum_n"),
        F.sum("cnt").over(wall).alias("n"),
    )
    return cum.groupBy("win_start", "event_type").agg(
        F.max("n").alias("n"),
        F.min(F.expr("CASE WHEN cum_n >= (n + 1) div 2 THEN cents END")).alias(
            "p50_cents"
        ),
        F.min(F.expr("CASE WHEN cum_n >= (9 * n + 9) div 10 THEN cents END")).alias(
            "p90_cents"
        ),
    )


GEO_SESS_CELL = 10.0  # spatial cell (degrees) keying the streamed visits
GEO_SESS_GAP_S = 7200  # visit gap: a fix merges iff < 2 h after the last


@query(
    "stream_geo_sessions",
    oracle=f"""
    WITH fixes AS (
        SELECT user_id,
               floor((fmod(value, 170.0) - 85.0) / {GEO_SESS_CELL})::BIGINT AS latc,
               floor((fmod(event_id::DOUBLE, 360.0) - 180.0)
                     / {GEO_SESS_CELL})::BIGINT AS lonc,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    flagged AS (
        -- session_window semantics: merge iff diff < gap (STRICT)
        SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                            OR sec - lag(sec) OVER w >= {GEO_SESS_GAP_S}
                       THEN 1 ELSE 0 END AS new_flag
        FROM fixes
        WINDOW w AS (PARTITION BY user_id, latc, lonc ORDER BY sec)
    ),
    sess AS (
        SELECT user_id, latc, lonc,
               sum(new_flag) OVER (PARTITION BY user_id, latc, lonc ORDER BY sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS visit_id
        FROM flagged
    )
    SELECT user_id, latc, lonc,
           count(DISTINCT visit_id)::BIGINT AS n_visits,
           count(*)::BIGINT AS n_fixes
    FROM sess GROUP BY user_id, latc, lonc
    """,
    tags=("streaming", "geo"),
)
def stream_geo_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMED spatial visits — geo_dwell_segments' online sibling with
    gap-bounded semantics: session windows keyed by (vehicle,
    {GEO_SESS_CELL}-degree cell), so a visit is a run of fixes in one
    cell with < {GEO_SESS_GAP_S // 3600} h between consecutive fixes (the
    batch op's visits break on cell CHANGE; the streaming form must also
    break on time gaps because state cannot wait forever — exactly why
    session windows exist). ONE stateful session aggregation in complete
    mode (final table ≡ batch window algebra ⇒ exact oracle, PARITY rule
    13's strict-gap discipline on second-truncated ts), then a batch
    rollup to per-(vehicle, cell) visit/fix counts — the two-stage rule
    every windowed stream op here follows.

    At 100 TB-scale streaming the state is one open session per active
    (vehicle, cell) — watermark-bounded, keyed exactly like the batch
    partitioning; the rollup stage reads the session table, never the
    fix stream."""
    cell_lat = F.floor((F.col("value") % 170.0 - 85.0) / GEO_SESS_CELL)
    cell_lon = F.floor(
        (F.col("event_id").cast("double") % 360.0 - 180.0) / GEO_SESS_CELL
    )
    sdf = (
        stream_events(spark, sf_dir)
        .withColumn("latc", cell_lat)
        .withColumn("lonc", cell_lon)
        .withColumn("tsec", F.date_trunc("second", "ts"))
        .withWatermark("tsec", "2 hours")
        .groupBy(
            F.session_window("tsec", f"{GEO_SESS_GAP_S} seconds").alias("sw"),
            "user_id",
            "latc",
            "lonc",
        )
        .agg(F.count(F.lit(1)).alias("n_fixes"))
    )
    visits = run_to_table(
        sdf.select("user_id", "latc", "lonc", "n_fixes"), sf_dir, "geo_sess", "complete"
    )
    return visits.groupBy("user_id", "latc", "lonc").agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum("n_fixes").alias("n_fixes"),
    )


# --- round 8: sessionized funnel depth --------------------------------------


@query(
    "stream_funnel_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    flagged AS (
        SELECT *, CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w >= 43200
                       THEN 1 ELSE 0 END AS new_flag
        FROM ordered WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_type)
    ),
    sess AS (
        SELECT user_id, event_type, sec,
               sum(new_flag) OVER (PARTITION BY user_id ORDER BY sec, event_type
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS session_id
        FROM flagged
    ),
    agged AS (
        SELECT user_id, session_id,
               min(sec)::BIGINT AS start_sec,
               count(*)::BIGINT AS n_events,
               min(CASE WHEN event_type = 'view' THEN sec END) AS v,
               min(CASE WHEN event_type = 'click' THEN sec END) AS c,
               min(CASE WHEN event_type = 'purchase' THEN sec END) AS p
        FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id,
           strftime(make_timestamp(start_sec * 1000000), '%Y-%m-%d %H:%M:%S')
               AS session_start,
           n_events,
           (CASE WHEN v IS NULL THEN 0
                 WHEN c IS NULL OR c < v THEN 1
                 WHEN p IS NULL OR p < c THEN 2
                 ELSE 3 END)::BIGINT AS funnel_depth
    FROM agged
    """,
    tags=("streaming", "funnel"),
)
def stream_funnel_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized funnel depth on the live stream — event_funnel answers
    'how far do users get?' over batch history; THIS answers it per
    in-flight visit episode: native session windows (12-HOUR inactivity
    gap — the fixture's inter-event spacing is ~11 h, so a 30-min web gap
    would shred every funnel into single-event sessions; the gap is the
    episode definition, stream_session's strict-merge rule regardless) aggregate each session's first-view / first-click /
    first-purchase timestamps as three conditional mins — per-session
    scalars a streaming state store can hold — and the funnel stage is a
    pure CASE over their ordering (view -> click -> purchase must occur in
    order; an out-of-order click belongs to browsing, not the funnel).
    Depth is decidable the moment the session closes, so the operator
    emits final rows under watermark semantics with bounded state: three
    BIGINTs + a count per open session, regardless of session length.

    Twin = the window-algebra session reconstruction (PARITY rule 13:
    second-truncated ts, new session at gap >= G) + identical conditional
    mins and CASE. The (sec, event_type) sort tiebreak pins same-second
    event ordering so both engines see identical session membership.

    At 100 TB/day this is the canonical streaming-state shape: state per
    KEY not per event, session_window merges handled by the engine, and
    the downstream conversion dashboard reads a per-depth count rollup of
    this table."""
    sdf = (
        stream_events(spark, sf_dir)
        .withColumn("tsec", F.date_trunc("second", "ts"))
        .withWatermark("tsec", "12 hours")
        .groupBy(F.session_window("tsec", "12 hours").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.when(F.col("event_type") == "view", F.unix_timestamp("tsec"))).alias("v"),
            F.min(F.when(F.col("event_type") == "click", F.unix_timestamp("tsec"))).alias("c"),
            F.min(F.when(F.col("event_type") == "purchase", F.unix_timestamp("tsec"))).alias("p"),
        )
        .select(
            "user_id",
            ts_str(F.col("sw.start")).alias("session_start"),
            "n_events",
            F.when(F.col("v").isNull(), 0)
            .when(F.col("c").isNull() | (F.col("c") < F.col("v")), 1)
            .when(F.col("p").isNull() | (F.col("p") < F.col("c")), 2)
            .otherwise(3)
            .cast("long")
            .alias("funnel_depth"),
        )
    )
    return run_to_table(sdf, sf_dir, "funnel", "complete")


# --- round 8: streaming dirty-record linkage --------------------------------


@query(
    "stream_dirty_linkage",
    oracle="""
    WITH base AS (
        SELECT c_custkey, lower(c_name) AS base_name,
               substr(lower(c_name), 10, 50) AS w
        FROM customer
    ),
    idx AS (
        SELECT DISTINCT c_custkey, base_name, substr(md5(c_custkey::VARCHAR), 1, 1) AS region,
               substr(w, 1, i) || substr(w, i + 2, 50) AS delkey
        FROM base, unnest(range(len(w))) t(i)
    ),
    submitted AS (
        SELECT event_id, event_id % 1500 AS claimed_key,
               'customer#' || lpad((event_id % 1500)::VARCHAR, 9, '0') AS clean_name,
               13 + user_id % 6 AS p
        FROM events WHERE event_type = 'signup'
    ),
    typo AS (
        SELECT event_id, claimed_key,
               substr(clean_name, 1, p - 1) || substr(clean_name, p + 1, 50)
                   AS submitted_name
        FROM submitted
    )
    SELECT t.event_id, t.claimed_key, i.c_custkey AS matched_custkey,
           levenshtein(t.submitted_name, i.base_name) AS dist,
           (i.c_custkey = t.claimed_key) AS true_match
    FROM typo t
    JOIN idx i ON substr(t.submitted_name, 10, 50) = i.delkey
              AND i.region = substr(md5(t.claimed_key::VARCHAR), 1, 1)
    WHERE levenshtein(t.submitted_name, i.base_name) = 1
    """,
    tags=("streaming", "linkage"),
)
def stream_dirty_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-TIME entity resolution — er_record_linkage's deletion-
    neighborhood index turned into a stream-static join: signup events
    arrive carrying a mistyped registration name (one digit dropped at a
    deterministic event-derived position — the same single-deletion error
    model), and each — blocked additionally on a derived registration
    region (an md5 nibble of the key; the batch op blocks on nation, which
    events don't carry — a second blocking attribute is what keeps
    low-entropy digit windows from colliding ~25-fold, and it must be
    HASH-derived: key % 25 was measured to preserve most collisions
    because digit-deletion neighbors differ by multiples of 100) — is
    matched against the STATIC customer base through
    the precomputed SymSpell index (every base record's deletion keys).
    The stream side is stateless — one equi-join key per arriving record,
    no watermark, no state store — because all the combinatorics
    (deletion expansion) were pushed to the static side at index-build
    time: exactly how an online identity-matching service shapes the
    work (index once, probe per event). The levenshtein verify and the
    true_match precision column mirror the batch op; collisions (distinct
    bases whose neighborhoods overlap) surface as false positives here
    too, which is what a production match queue routes to review.

    The static index is corpus-sized — joined, NOT broadcast-hinted (the
    multimodal-flagship lesson): at 100 TB the index shards by delkey and
    the stream shuffles each probe to its key's shard; AQE broadcasts it
    only while it genuinely fits. Twin: the identical algebra as batch
    SQL over the same two tables (append mode ≡ batch for a stateless
    join)."""
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        F.lower(F.col("c_name")).alias("base_name"),
        F.expr("substr(lower(c_name), 10, 50)").alias("w"),
    )
    idx = base.select(
        "c_custkey",
        "base_name",
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1).alias("region"),
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, length(w) - 1),"
                    " i -> concat(substr(w, 1, i), substr(w, i + 2, 50)))"
                )
            )
        ).alias("delkey"),
    )
    submitted = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "signup")
        .select(
            "event_id",
            (F.col("event_id") % 1500).alias("claimed_key"),
            F.concat(
                F.lit("customer#"),
                F.lpad((F.col("event_id") % 1500).cast("string"), 9, "0"),
            ).alias("clean_name"),
            (13 + F.col("user_id") % 6).cast("int").alias("p"),
        )
        .select(
            "event_id",
            "claimed_key",
            F.expr(
                "concat(substr(clean_name, 1, p - 1), substr(clean_name, p + 1, 50))"
            ).alias("submitted_name"),
        )
    )
    joined = submitted.join(
        idx,
        (F.expr("substr(submitted_name, 10, 50)") == F.col("delkey"))
        & (F.col("region") == F.substring(F.md5(F.col("claimed_key").cast("string")), 1, 1)),
    )
    dist = F.levenshtein("submitted_name", "base_name")
    sdf = joined.filter(dist == 1).select(
        "event_id",
        "claimed_key",
        F.col("c_custkey").alias("matched_custkey"),
        dist.alias("dist"),
        (F.col("c_custkey") == F.col("claimed_key")).alias("true_match"),
    )
    return run_to_table(sdf, sf_dir, "dirtylink", "append")


# --- round 8: streaming log-bucket quantile sketch ---------------------------


@query(
    "stream_log_histogram",
    oracle="""
    WITH coded AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
               2 * (length(to_base(floor(value * 100 + 0.5)::BIGINT, 2)) - 1)
                 + CASE WHEN floor(value * 100 + 0.5)::BIGINT
                             * floor(value * 100 + 0.5)::BIGINT
                        >= (1::BIGINT << (2 * (length(to_base(
                              floor(value * 100 + 0.5)::BIGINT, 2)) - 1) + 1))
                        THEN 1 ELSE 0 END AS bucket
        FROM events WHERE value > 0
    ),
    hist AS (
        SELECT day, event_type, bucket, count(*)::BIGINT AS cnt
        FROM coded GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT day, event_type, bucket, cnt,
               sum(cnt) OVER (PARTITION BY day, event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_n,
               sum(cnt) OVER (PARTITION BY day, event_type)::BIGINT AS n
        FROM hist
    )
    SELECT day, event_type, max(n)::BIGINT AS n,
           min(CASE WHEN cum_n >= (n + 1) // 2 THEN bucket END)::BIGINT AS p50_bucket,
           min(CASE WHEN cum_n >= (99 * n + 99) // 100 THEN bucket END)::BIGINT
               AS p99_bucket
    FROM cum GROUP BY day, event_type
    """,
    tags=("streaming", "sketch"),
)
def stream_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The log-bucketed quantile sketch as STREAMING state —
    agg_log_histogram_quantile's relative-error monoid carried through the
    watermark machinery, and the constant-state endpoint of the streaming
    percentile trade-space: stream_quantile_histogram's exact cents
    histogram holds |distinct values| cells per (window, channel), which
    for a heavy-tailed metric is unbounded-in-practice; THIS holds ≤ ~106
    cells per group for ANY value domain (half-octave buckets, gamma =
    sqrt(2), 17% relative error), updated by pure count addition —
    mergeable across shards, restarts, and late data. Same two-stage rule
    as its cents sibling: the stateful pass maintains per-(day, channel,
    bucket) counts (complete mode ⇒ final table ≡ batch ⇒ exact oracle);
    the integer-ceiling order-statistic readout runs as batch
    post-processing on the result table (foreachBatch in production).

    The bucket coding is the same exact-integer arithmetic as the batch
    op (binary-string length, never float log2), so the oracle checks the
    sketch cell-for-cell, not just the readout. Zero/negative values are
    excluded (log buckets are defined on positive cents; the fixture's
    'error' channel carries value 0 rows)."""
    ev = stream_events(spark, sf_dir).filter(F.col("value") > 0)
    bucket = F.expr(
        "2 * (length(conv(cast(floor(value * 100 + 0.5) as bigint), 10, 2)) - 1)"
        " + CASE WHEN cast(floor(value * 100 + 0.5) as bigint)"
        "            * cast(floor(value * 100 + 0.5) as bigint)"
        "         >= shiftleft(cast(1 as bigint),"
        "  cast(2 * (length(conv(cast(floor(value * 100 + 0.5) as bigint), 10, 2)) - 1) + 1 as int))"
        "    THEN 1 ELSE 0 END"
    ).cast("long")
    sdf = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "1 day").alias("win"),
            "event_type",
            bucket.alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "bucket",
            "cnt",
        )
    )
    hist = run_to_table(sdf, sf_dir, "loghist", "complete")
    wcum = (
        Window.partitionBy("day", "event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("day", "event_type")
    cum = hist.select(
        "day",
        "event_type",
        "bucket",
        F.sum("cnt").over(wcum).alias("cum_n"),
        F.sum("cnt").over(wall).alias("n"),
    )
    return cum.groupBy("day", "event_type").agg(
        F.max("n").alias("n"),
        F.min(F.expr("CASE WHEN cum_n >= (n + 1) div 2 THEN bucket END")).alias("p50_bucket"),
        F.min(F.expr("CASE WHEN cum_n >= (99 * n + 99) div 100 THEN bucket END")).alias(
            "p99_bucket"
        ),
    )


# --- round 8: live experiment readout ----------------------------------------


@query(
    "stream_ab_experiment",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) < '8'
                    THEN 'control' ELSE 'treatment' END AS arm,
               max(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm, count(*)::BIGINT AS n_users,
               sum(converted)::BIGINT AS n_converted
        FROM assigned GROUP BY arm
    ),
    wide AS (
        SELECT
            max(CASE WHEN arm = 'control' THEN n_users END)::BIGINT AS n_c,
            max(CASE WHEN arm = 'control' THEN n_converted END)::BIGINT AS x_c,
            max(CASE WHEN arm = 'treatment' THEN n_users END)::BIGINT AS n_t,
            max(CASE WHEN arm = 'treatment' THEN n_converted END)::BIGINT AS x_t
        FROM arms
    )
    SELECT n_c, x_c, n_t, x_t,
           (x_t * 1000000 // n_t - x_c * 1000000 // n_c)::BIGINT AS lift_ppm,
           round((x_t / n_t - x_c / n_c) / nullif(sqrt(
               ((x_c + x_t) / (n_c + n_t)) * (1 - (x_c + x_t) / (n_c + n_t))
               * (1.0 / n_c + 1.0 / n_t)), 0), 4) + 0.0 AS z_score
    FROM wide
    """,
    tags=("streaming", "experiment"),
)
def stream_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE A/B experiment readout — ab_experiment_report as the streaming
    job a real experiment dashboard actually runs: per-user conversion
    state (one max-flag per user, the md5-armed assignment never stored —
    it is a pure function of the stable key, recomputable at read time)
    is maintained by the stream in complete mode; the arm rollup, lift,
    and pooled two-proportion z-score run as batch post-processing on the
    state table each refresh (the stream_quantile_histogram two-stage
    rule — Structured Streaming allows one stateful aggregation, and
    per-user dedup IS the aggregation that needs the state).

    Why per-user state and not per-arm counters: conversion is a per-user
    max over time — a user who converts twice must count once, and a
    counter-only design double-counts late purchases. State is one row
    per ACTIVE user (bounded by the population, not the event volume),
    exactly the cardinality argument stream_latest_per_key makes.

    Twin: ab_experiment_report's algebra (integer counts, ppm lift per
    rule 25, one sqrt + 4-dp round per rule 8)."""
    sdf = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
                ).otherwise(0)
            ).alias("converted")
        )
    )
    per_user = run_to_table(sdf, sf_dir, "abexp", "complete")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "control"
    ).otherwise("treatment")
    arms = per_user.withColumn("arm", arm).groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )

    def pick(col: str, a: str):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    wide = arms.agg(
        pick("n_users", "control").alias("n_c"),
        pick("n_converted", "control").alias("x_c"),
        pick("n_users", "treatment").alias("n_t"),
        pick("n_converted", "treatment").alias("x_t"),
    )
    pooled = (F.col("x_c") + F.col("x_t")) / (F.col("n_c") + F.col("n_t"))
    se = F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n_c") + 1.0 / F.col("n_t")))
    return wide.select(
        "n_c",
        "x_c",
        "n_t",
        "x_t",
        F.expr("x_t * 1000000 div n_t - x_c * 1000000 div n_c").alias("lift_ppm"),
        (
            F.round(
                ((F.col("x_t") / F.col("n_t")) - (F.col("x_c") / F.col("n_c")))
                / F.nullif(se, F.lit(0.0)),
                4,
            )
            + 0.0
        ).alias("z_score"),
    )


# --- round 9: streaming CDC ingest ------------------------------------------


@query(
    "stream_cdc_ingest",
    oracle="""
    WITH docs AS (
        SELECT doc_id, text, length(text) AS len
        FROM documents WHERE length(text) >= 1
    ),
    bnd AS (
        SELECT doc_id, i
        FROM docs, unnest(generate_series(8, len - 1)) t(i)
        WHERE substr(md5(substring(text, i - 7, 8)), 1, 1) = '0'
        UNION ALL
        SELECT doc_id, len AS i FROM docs
    ),
    spans AS (
        SELECT doc_id,
               coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s,
               i AS e
        FROM bnd
    ),
    chunks AS (
        SELECT sp.doc_id, sp.s,
               (sp.e - sp.s)::BIGINT AS chunk_bytes,
               md5(substring(d.text, sp.s + 1, sp.e - sp.s)) AS chunk_md5
        FROM spans sp JOIN docs d ON sp.doc_id = d.doc_id
    ),
    store AS (
        SELECT DISTINCT chunk_md5 FROM chunks WHERE doc_id % 2 = 0
    )
    SELECT c.doc_id,
           count(*)::BIGINT AS n_chunks,
           sum(c.chunk_bytes)::BIGINT AS n_bytes,
           sum(CASE WHEN st.chunk_md5 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS reused_chunks,
           sum(CASE WHEN st.chunk_md5 IS NOT NULL THEN c.chunk_bytes
                    ELSE 0 END)::BIGINT AS reused_bytes,
           sum(CASE WHEN st.chunk_md5 IS NULL THEN c.chunk_bytes
                    ELSE 0 END)::BIGINT AS new_bytes,
           (sum(CASE WHEN st.chunk_md5 IS NULL THEN c.chunk_bytes ELSE 0 END)
               * 1000000 // sum(c.chunk_bytes))::BIGINT AS upload_ppm
    FROM chunks c LEFT JOIN store st ON c.chunk_md5 = st.chunk_md5
    WHERE c.doc_id % 2 = 1
    GROUP BY c.doc_id
    """,
    tags=("streaming", "multimodal", "cdc"),
)
def stream_cdc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-TIME content-defined-chunking ingest — mm_cdc_incremental's
    streaming twin: blobs arrive as files and each micro-batch chunks
    them and probes the STATIC base chunk store (even doc_ids, built by
    the batch side via the same cdc_chunk_frame geometry) to decide what
    to upload. Two deliberate differences from the batch op, both
    stream-architectural:

    (1) WINDOW-FREE CHUNKING: Structured Streaming forbids non-time
    windows (the batch op's per-doc lag()), so boundaries are computed
    per ROW as an array expression — filter(sequence(W, len-1), i ->
    md5-nibble predicate) plus the forced end, then the span list by
    zipping the boundary array with its own 0-prepended shift, then
    posexplode. Entirely map-side JVM HOFs (no state, no shuffle before
    the store probe) — at 100 TB each arriving blob chunks inside its
    own task, which is also the plan a batch rewrite would want.

    (2) STATELESS REUSE: the probe answers 'is this chunk in the
    COMMITTED store' only — intra-stream duplicate collapse (the batch
    op's keep-first window) is the compaction job's business; a live
    ingest path that tried to dedup against in-flight uploads would need
    a coordination layer (the store itself is that layer in production).
    The twin therefore checks base membership only.

    Complete-mode groupBy(doc_id) over the stream-static join ==> the
    final table equals the batch algebra, which the oracle pins."""
    base = cdc_chunk_frame_docs(spark, sf_dir).filter(F.col("doc_id") % 2 == 0)
    store = base.select("chunk_md5").distinct().withColumn("in_base", F.lit(True))
    w = 8
    sdf = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .parquet(_stream_docs_dir(sf_dir))
        .filter((F.col("doc_id") % 2 == 1) & (F.length("text") >= 1))
        .select("doc_id", "text", F.length("text").cast("long").alias("len"))
        .withColumn(
            "bnd",
            F.concat(
                F.filter(
                    F.sequence(F.lit(w), F.greatest(F.col("len") - 1, F.lit(w))),
                    lambda i: (i <= F.col("len") - 1)
                    & (
                        F.substring(
                            F.md5(
                                F.col("text").substr(
                                    (i - F.lit(w - 1)).cast("int"), F.lit(w)
                                )
                            ),
                            1,
                            1,
                        )
                        == "0"
                    ),
                ),
                F.array(F.col("len")),
            ),
        )
        .withColumn(
            "span",
            F.explode(
                F.arrays_zip(
                    F.concat(
                        F.array(F.lit(0).cast("long")),
                        F.slice(F.col("bnd"), 1, F.size("bnd") - 1),
                    ).alias("s"),
                    F.col("bnd").alias("e"),
                )
            ),
        )
        .select(
            "doc_id",
            (F.col("span.e") - F.col("span.s")).alias("chunk_bytes"),
            F.md5(F.expr("substring(text, span.s + 1, span.e - span.s)")).alias(
                "chunk_md5"
            ),
        )
        .join(store, "chunk_md5", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_bytes").alias("n_bytes"),
            F.sum(F.when(F.col("in_base"), 1).otherwise(0)).alias("reused_chunks"),
            F.sum(F.when(F.col("in_base"), F.col("chunk_bytes")).otherwise(0)).alias(
                "reused_bytes"
            ),
            F.sum(
                F.when(F.col("in_base").isNull(), F.col("chunk_bytes")).otherwise(0)
            ).alias("new_bytes"),
            F.expr(
                "sum(CASE WHEN in_base IS NULL THEN chunk_bytes ELSE 0 END)"
                " * 1000000 div sum(chunk_bytes)"
            ).alias("upload_ppm"),
        )
    )
    return run_to_table(sdf, sf_dir, "cdcingest", "complete")


def cdc_chunk_frame_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-side CDC chunks of the documents lake (the shared geometry)."""
    from ..operators.multimodal import _with_binary, cdc_chunk_frame

    return cdc_chunk_frame(
        _with_binary(load_docs(spark, sf_dir)).select("doc_id", "payload")
    )


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io import load

    return load(spark, sf_dir, "documents")


# --- round 9: streaming benchmark-contamination guard ------------------------

GUARD_QUARANTINE_PPM = 100_000  # >=10% shared grams -> quarantine, else review


@query(
    "stream_contamination_guard",
    oracle="""
    WITH grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(toks[i:i+2], ' ') AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             unnest(generate_series(1, greatest(len(toks) - 2, 1))) t(i)
    ),
    bench AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id < 50
    ),
    train AS (SELECT * FROM grams WHERE doc_id >= 50),
    sizes AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM train GROUP BY doc_id),
    hits AS (
        SELECT t.doc_id, count(*)::BIGINT AS n_shared
        FROM train t JOIN bench b ON t.gram = b.gram
        GROUP BY t.doc_id
    )
    SELECT h.doc_id, s.n_grams, h.n_shared,
           (h.n_shared * 1000000 // s.n_grams)::BIGINT AS shared_ppm,
           CASE WHEN h.n_shared * 1000000 // s.n_grams >= 100000
                THEN 'quarantine' ELSE 'review' END AS verdict
    FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
    """,
    tags=("streaming", "llm", "text"),
)
def stream_contamination_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-TIME benchmark-contamination guard — text_contamination moved to
    the ingest door: crawled documents arrive as a stream, each is cut into
    its DISTINCT word trigrams PER ROW (array_distinct over the gram
    transform — no stream-level distinct, so no state; dedup within a doc
    is a row-local array op), and every gram probes the STATIC benchmark
    gram set. Docs sharing grams get a ledger row with an integer-ppm share
    and a routing verdict: >= GUARD_QUARANTINE_PPM -> 'quarantine' (likely
    verbatim benchmark text; never reaches the training lake), else
    'review'. This is the guard that makes eval integrity an INGEST
    property rather than a nightly sweep — by the time a batch
    decontamination job runs, a contaminated shard may already be in a
    training mix.

    Scale: the benchmark gram set is KBs against TBs of crawl (the batch
    op's broadcast rationale, inherited); the stream side is stateless
    map + broadcast probe + one complete-mode per-doc agg. Twin: the
    identical algebra as batch SQL (CONTAM_NGRAM=3, bench = doc_id < 50
    slice — the batch op's fixture convention)."""
    from ..operators.llm_text import CONTAM_BENCH_MAX_ID, CONTAM_NGRAM

    docs = load_docs(spark, sf_dir)
    grams_expr = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(toks) - {CONTAM_NGRAM - 1}, 1)),"
        f" i -> array_join(slice(toks, i, {CONTAM_NGRAM}), ' ')))"
    )
    bench = (
        docs.filter(F.col("doc_id") < CONTAM_BENCH_MAX_ID)
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select(F.explode(grams_expr).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    sdf = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .parquet(_stream_docs_dir(sf_dir))
        .filter(F.col("doc_id") >= CONTAM_BENCH_MAX_ID)
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.explode(grams_expr).alias("gram"))
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_shared"),
        )
        .filter(F.col("n_shared") >= 1)
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            F.expr("n_shared * 1000000 div n_grams").alias("shared_ppm"),
            F.when(
                F.expr("n_shared * 1000000 div n_grams") >= GUARD_QUARANTINE_PPM,
                "quarantine",
            )
            .otherwise("review")
            .alias("verdict"),
        )
    )
    return run_to_table(sdf, sf_dir, "contamguard", "complete")


# --- round 9: streaming deterministic reservoir sample -----------------------

RESERVOIR_K = 10  # sample size per stratum


@query(
    "stream_reservoir_sample",
    oracle=f"""
    SELECT event_type, event_id, substr(md5(event_id::VARCHAR), 1, 8) AS draw
    FROM (
        SELECT event_type, event_id,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(event_id::VARCHAR), event_id
               ) AS rn
        FROM events
    ) z WHERE rn <= {RESERVOIR_K}
    """,
    tags=("streaming", "sampling"),
)
def stream_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming RESERVOIR SAMPLE as custom per-key state
    (applyInPandasWithState) — the online form of bottom-k sampling: per
    stratum (event_type), keep the RESERVOIR_K events with the smallest
    deterministic draw (md5 of the event id — the seeded-draw discipline
    every sampler in this repo uses, so the 'random' reservoir is exactly
    replayable), merging each micro-batch's candidates into the persisted
    top-k state. Bottom-k is an online-mergeable monoid — merge(A, B) =
    bottomK(A ∪ B) — which is precisely why bottom-k sketches are THE
    streaming sampling primitive (distinct-counting and weighted sampling
    fall out of the same state shape); a classic Vitter reservoir with a
    live RNG could not be oracle-checked, the deterministic draw makes
    the stream ≡ the batch bottom-k, which the twin pins exactly.

    State per key: two K-bounded arrays (draws, ids) — fixed-size
    regardless of stream length; at scale it lives in the RocksDB state
    store partitioned by stratum. Update mode appends each trigger's
    reservoir snapshot to the memory sink, so the final table is
    POST-PROCESSED by re-applying the bottom-k over the union of emitted
    snapshots (ADVICE r9): bottomK(R_1 ∪ … ∪ R_final) = R_final because
    an element evicted from an earlier snapshot is by construction
    larger than the final k-th draw — the same mergeability law the
    state update relies on, so correctness no longer depends on
    availableNow producing exactly one micro-batch. The post-process
    recomputes the FULL md5 draw from event_id (the emitted draw is the
    8-char display prefix, not the sort key)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        (event_type,) = key
        draws, ids = state.get if state.exists else ([], [])
        pool = list(zip(draws, ids))
        for pdf in pdf_iter:
            pool.extend(zip(pdf["draw"].tolist(), pdf["event_id"].tolist()))
        pool.sort()
        pool = pool[:RESERVOIR_K]
        state.update(([d for d, _ in pool], [i for _, i in pool]))
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(pool),
                "event_id": [i for _, i in pool],
                "draw": [d[:8] for d, _ in pool],
            }
        )

    sdf = (
        stream_events(spark, sf_dir)
        .select(
            "event_type",
            "event_id",
            F.md5(F.col("event_id").cast("string")).alias("draw"),
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType="event_type string, event_id long, draw string",
            stateStructType="draws array<string>, ids array<long>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    emitted = run_to_table(sdf, sf_dir, "reservoir", "update")
    wk = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        emitted.select("event_type", "event_id")
        .distinct()
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= RESERVOIR_K)
        .select(
            "event_type",
            "event_id",
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8).alias("draw"),
        )
    )


# --- round 10: live always-valid experiment monitor ---------------------------


@query(
    "stream_msprt_monitor",
    oracle=f"""
    WITH obs AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CASE WHEN substr(md5(user_id::VARCHAR), 1, 1) >= '8'
                    THEN 'treatment' ELSE 'control' END AS arm,
               floor(value * 100 + 0.5)::BIGINT AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    daily AS (
        SELECT day, arm, count(*)::BIGINT AS n,
               sum(cents)::BIGINT AS s, sum(cents * cents)::BIGINT AS ss
        FROM obs GROUP BY day, arm
    ),
    cum AS (
        SELECT day, arm,
               sum(n) OVER w::BIGINT AS cn,
               sum(s) OVER w::BIGINT AS cs,
               sum(ss) OVER w::BIGINT AS css
        FROM daily
        WINDOW w AS (PARTITION BY arm ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    wide AS (
        SELECT day,
               max(CASE WHEN arm = 'control' THEN cn END)::BIGINT AS n_c,
               max(CASE WHEN arm = 'control' THEN cs END)::BIGINT AS s_c,
               max(CASE WHEN arm = 'control' THEN css END)::BIGINT AS ss_c,
               max(CASE WHEN arm = 'treatment' THEN cn END)::BIGINT AS n_t,
               max(CASE WHEN arm = 'treatment' THEN cs END)::BIGINT AS s_t,
               max(CASE WHEN arm = 'treatment' THEN css END)::BIGINT AS ss_t
        FROM cum GROUP BY day
    ),
    stat AS (
        SELECT day, n_c, n_t,
               (s_t::DOUBLE / n_t - s_c::DOUBLE / n_c) AS theta,
               ((ss_c - s_c::DOUBLE * s_c / n_c) / nullif(n_c - 1, 0)) / n_c
               + ((ss_t - s_t::DOUBLE * s_t / n_t) / nullif(n_t - 1, 0)) / n_t
                   AS v
        FROM wide
        WHERE n_c >= 2 AND n_t >= 2
    ),
    lam AS (
        SELECT day, n_c, n_t,
               least(1.0, round(
                   1.0 / (sqrt(v / (v + {MSPRT_TAU2}))
                          * exp(theta * theta * {MSPRT_TAU2}
                                / (2.0 * v * (v + {MSPRT_TAU2})))), 6)) + 0.0
                   AS p_day
        FROM stat WHERE v > 0
    )
    SELECT day, n_c, n_t, p_day,
           min(p_day) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 0.0
               AS p_always_valid,
           (min(p_day) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) < 0.05)
               AS stop_signal
    FROM lam
    """,
    tags=("streaming", "experiment", "eval"),
)
def stream_msprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE always-valid experiment monitor — eval_sequential_msprt as the
    streaming job it exists to be: the mSPRT was built so a dashboard can
    refresh CONTINUOUSLY without alpha inflation, so the streaming form
    is the production deployment, not a demo. The stream maintains the
    per-(day, arm) exact-cents moment cells in complete mode (the
    stream_ab_experiment two-stage rule: one stateful aggregation owns
    the state — day×arm cells, bounded by the calendar, not the event
    volume); each refresh re-derives the cumulative moments, the mixture
    likelihood ratio, and the running-min always-valid p as batch
    post-processing over those cells, plus the stop_signal boolean a
    pager would key on (p < 0.05).

    Twin: eval_sequential_msprt's algebra verbatim (MSPRT_TAU2 interpolated, shared with the batch op);
    complete mode over an availableNow drain makes the final table ≡ the
    batch computation, which the oracle pins exactly. At 100 TB the
    state is |days|×2 rows of five counters — the cheapest possible
    streaming experiment state."""
    sdf = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            ),
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) >= "8",
                "treatment",
            )
            .otherwise("control")
            .alias("arm"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("day", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).alias("ss"),
        )
    )
    daily = run_to_table(sdf, sf_dir, "msprt", "complete")
    warm = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "day",
        "arm",
        F.sum("n").over(warm).alias("cn"),
        F.sum("s").over(warm).alias("cs"),
        F.sum("ss").over(warm).alias("css"),
    )
    wide = cum.groupBy("day").agg(
        F.max(F.when(F.col("arm") == "control", F.col("cn"))).alias("n_c"),
        F.max(F.when(F.col("arm") == "control", F.col("cs"))).alias("s_c"),
        F.max(F.when(F.col("arm") == "control", F.col("css"))).alias("ss_c"),
        F.max(F.when(F.col("arm") == "treatment", F.col("cn"))).alias("n_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("cs"))).alias("s_t"),
        F.max(F.when(F.col("arm") == "treatment", F.col("css"))).alias("ss_t"),
    )
    theta = F.col("s_t").cast("double") / F.col("n_t") - F.col("s_c").cast(
        "double"
    ) / F.col("n_c")
    v = (
        (F.col("ss_c") - F.col("s_c").cast("double") * F.col("s_c") / F.col("n_c"))
        / F.nullif(F.col("n_c") - 1, F.lit(0))
    ) / F.col("n_c") + (
        (F.col("ss_t") - F.col("s_t").cast("double") * F.col("s_t") / F.col("n_t"))
        / F.nullif(F.col("n_t") - 1, F.lit(0))
    ) / F.col("n_t")
    stat = wide.filter((F.col("n_c") >= 2) & (F.col("n_t") >= 2)).select(
        "day", "n_c", "n_t", theta.alias("theta"), v.alias("v")
    )
    tau2 = F.lit(MSPRT_TAU2)
    lam_inv = 1.0 / (
        F.sqrt(F.col("v") / (F.col("v") + tau2))
        * F.exp(
            F.col("theta")
            * F.col("theta")
            * tau2
            / (2.0 * F.col("v") * (F.col("v") + tau2))
        )
    )
    lam = stat.filter(F.col("v") > 0).select(
        "day",
        "n_c",
        "n_t",
        (F.least(F.lit(1.0), F.round(lam_inv, 6)) + F.lit(0.0)).alias("p_day"),
    )
    wmin = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pmin = F.min("p_day").over(wmin)
    return lam.select(
        "day",
        "n_c",
        "n_t",
        "p_day",
        (pmin + F.lit(0.0)).alias("p_always_valid"),
        (pmin < 0.05).alias("stop_signal"),
    )


# --- round 10: streaming seasonal-naive forecast monitor -----------------------

FCST_ALARM_PPM = 500_000  # alarm when |residual| > 50% of the forecast


@query(
    "stream_forecast_anomaly",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT event_type, strftime(d, '%Y-%m-%d') AS day, xc,
               lag(xc, 7) OVER (PARTITION BY event_type ORDER BY d) AS fc
        FROM daily
    )
    SELECT event_type, day, xc AS actual_cents, fc AS forecast_cents,
           (xc - fc)::BIGINT AS resid_cents,
           (abs(xc - fc) * 1000000 // nullif(fc, 0))::BIGINT AS resid_ppm,
           (abs(xc - fc) * 1000000 // nullif(fc, 0) > {FCST_ALARM_PPM})
               AS alarm
    FROM scored WHERE fc IS NOT NULL
    """,
    tags=("streaming", "timeseries", "anomaly"),
)
def stream_forecast_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE forecast-residual monitor — the streaming consumer of
    ts_forecast_backtest's seasonal-naive baseline: the stream maintains
    per-(channel, day) revenue cells in complete mode (calendar-bounded
    state, the stream_msprt_monitor rule), and each refresh re-derives
    every day's lag-7 forecast, exact integer residual, relative
    residual in ppm, and an alarm flag at FCST_ALARM_PPM — the pager
    wiring for 'today's revenue is half of last week's'. A real deploy
    alerts on the LATEST day; emitting the full scored ledger makes the
    twin exact and gives the on-call the history in one table.

    All integer algebra (cents, ppm via floor div — rule 25/28); the
    only window is lag-7 PARTITIONED by channel over the day support.
    Reconciled with ts_forecast_backtest's scored frame by a property
    test (same cells, same lag — the batch op aggregates what this one
    emits)."""
    sdf = (
        stream_events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))
    )
    daily = run_to_table(sdf, sf_dir, "fcstmon", "complete")
    wday = Window.partitionBy("event_type").orderBy("day")
    scored = daily.select(
        "event_type",
        "day",
        "xc",
        F.lag("xc", 7).over(wday).alias("fc"),
    ).filter(F.col("fc").isNotNull())
    resid_ppm = F.expr("abs(xc - fc) * 1000000 div nullif(fc, 0)")
    return scored.select(
        "event_type",
        "day",
        F.col("xc").alias("actual_cents"),
        F.col("fc").alias("forecast_cents"),
        (F.col("xc") - F.col("fc")).alias("resid_cents"),
        resid_ppm.alias("resid_ppm"),
        (resid_ppm > FCST_ALARM_PPM).alias("alarm"),
    )


# --- round 11: streaming seasonal-ESD anomaly twin -----------------------------


@query(
    "stream_seasonal_esd",
    oracle=_esd_oracle_sql(),
    tags=("streaming", "timeseries", "anomaly"),
)
def stream_seasonal_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE seasonal-ESD anomaly extraction — the streaming twin of
    anomaly_seasonal_esd (VERDICT r10 item 6): the stream maintains
    per-(channel, day, weekday) revenue cells in complete mode
    (calendar-bounded state, the stream_msprt_monitor rule), and every
    refresh re-runs the IDENTICAL deseasonalize + ESD_K max-deviate
    extraction via the shared _esd_extract helper (telemetry.py) — one
    code path for the live and offline anomaly pipelines, so they cannot
    drift; tests pin stream ≡ batch row-for-row and the oracle is the
    same generated chained-CTE twin. Weekday comes from epoch-day % 7
    inside the streaming aggregation (the profile_activity_matrix trap),
    cents are exact BIGINTs, and the extraction's per-round argmax
    collects stay O(channels) — coordinator-plane, never row data.

    At 100 TB: streaming state is |channels| x |calendar days| cells; the
    extraction runs on that bounded frame per refresh, exactly the batch
    op's shape."""
    sdf = (
        stream_events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("d"),
            (
                F.expr("unix_timestamp(date_trunc('day', ts)) div 86400") % 7
            ).alias("dow"),
        )
        .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))
    )
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    # the memory-sink view keeps stable attribute ids, so the helper's
    # daily-vs-season self-join would hit conflicting-reference resolution;
    # checkpointing the calendar-bounded cell frame re-roots the lineage
    daily = run_to_table(sdf, sf_dir, "sesd", "complete").checkpoint(eager=True)
    return _esd_extract(spark, daily)


# --- round 11: streaming language-mix drift monitor ----------------------------


@query(
    "stream_lang_drift",
    oracle=_lang_drift_oracle_sql(),
    tags=("streaming", "llm", "corpus"),
)
def stream_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE language-mix drift monitor — the streaming consumer of
    text_lang_id's quantized NB model (VERDICT r10 item 8's consumer
    discipline): documents arrive as files, each micro-batch explodes
    words and stream-static joins the BATCH-TRAINED profile (the
    standard model-enrichment shape — the model is the small static
    side, broadcast), maintaining per-(doc, lang) score partials and
    doc lengths in complete mode; the post-stream readout runs the
    IDENTICAL argmax via the shared _lang_id_pick helper and emits the
    predicted language mix against the labeled training mix in exact
    integer ppm — the alarm wiring for 'the crawl's language balance is
    shifting'. One model, one argmax code path: the live monitor cannot
    drift from the batch classifier (property: predicted counts ==
    text_lang_id's confusion-matrix column sums).

    Streaming state is |in-flight docs| x |langs| partials — bounded by
    the micro-batch horizon at 100 TB (append mode + watermark in a real
    deploy; complete mode here makes the availableNow table equal the
    batch answer, which the oracle pins)."""
    from ..operators.llm_text import _lang_id_model, _lang_id_pick

    d = load(spark, sf_dir, "documents")
    lang_model, prof = _lang_id_model(spark, d, memo_key=sf_dir)
    sdocs = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(_stream_docs_dir(sf_dir))
    words = sdocs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("f")
    ).filter(F.length("f") >= 1)
    part_s = (
        words.join(prof, "f")  # stream-static: model is the broadcast side
        .groupBy("doc_id", "plang")
        .agg(F.sum("dllq").alias("sw"))
    )
    len_s = words.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_feats")
    )
    part = run_to_table(part_s, sf_dir, "langdrift_part", "complete")
    doclen = run_to_table(len_s, sf_dir, "langdrift_len", "complete")
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    # memory-sink views keep stable attribute ids (the stream_seasonal_esd
    # lesson); checkpoint re-roots lineage before the shared pick helper
    part = part.checkpoint(eager=True)
    doclen = doclen.checkpoint(eager=True)
    pick = _lang_id_pick(doclen, part, lang_model)
    pcounts = pick.groupBy("pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))
    ptot = pcounts.agg(F.sum("n_docs").alias("n"))
    train = d.groupBy(F.col("lang").alias("pred_lang")).agg(
        F.count(F.lit(1)).alias("tn")
    )
    ttot = train.agg(F.sum("tn").alias("tt"))
    return (
        pcounts.crossJoin(F.broadcast(ptot))
        .join(train, "pred_lang")
        .crossJoin(F.broadcast(ttot))
        .select(
            "pred_lang",
            "n_docs",
            F.expr("n_docs * 1000000 div n").alias("pred_share_ppm"),
            F.expr("tn * 1000000 div tt").alias("label_share_ppm"),
            F.expr(
                "n_docs * 1000000 div n - tn * 1000000 div tt"
            ).alias("drift_ppm"),
        )
    )


# --- round 11: streaming distinct-growth (first-touch) monitor ------------------


@query(
    "stream_distinct_growth",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               min(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS first_day
        FROM events GROUP BY user_id
    ),
    daily_users AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(DISTINCT user_id)::BIGINT AS active_users
        FROM events GROUP BY 1
    ),
    new_per_day AS (
        SELECT first_day AS day, count(*)::BIGINT AS new_users
        FROM first_seen GROUP BY first_day
    )
    SELECT d.day, d.active_users,
           COALESCE(n.new_users, 0)::BIGINT AS new_users,
           (d.active_users - COALESCE(n.new_users, 0))::BIGINT AS returning_users,
           sum(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
               AS cumulative_distinct
    FROM daily_users d LEFT JOIN new_per_day n ON n.day = d.day
    """,
    tags=("streaming", "agg", "analytics"),
)
def stream_distinct_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE audience-growth monitor — agg_distinct_growth's streaming
    twin: the stream maintains TWO bounded state tables in complete mode
    (per-user first-seen day — state bounded by the population, the
    stream_ab_experiment rule; and per-(day, user) activity cells —
    calendar x population bounded), and each refresh re-derives the
    first-touch decomposition: active = new + returning, cumulative
    distinct = prefix sum of new. This is how a real dashboard gets an
    EXACT cumulative-unique-users curve without re-scanning history per
    refresh — the naive per-day count-distinct-over-all-history is
    quadratic in the calendar; the first-touch state is one row per
    user, updated monotonically (min is the idempotent fold, so late or
    replayed events cannot corrupt it).

    One availableNow pass makes both tables equal the batch answer, which
    the shared oracle pins (stream == batch by construction; property
    test pins it row-for-row against agg_distinct_growth)."""
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    fs_s = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.min(day).alias("first_day"))
    )
    act_s = (
        stream_events(spark, sf_dir)
        .groupBy(day.alias("day"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    first_seen = run_to_table(fs_s, sf_dir, "growth_first", "complete")
    activity = run_to_table(act_s, sf_dir, "growth_act", "complete")
    daily_users = activity.groupBy("day").agg(
        F.count_distinct("user_id").alias("active_users")
    )
    new_per_day = first_seen.groupBy(
        F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    wcum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = daily_users.join(new_per_day, "day", "left").select(
        "day",
        "active_users",
        F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
    )
    return joined.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(wcum).alias("cumulative_distinct"),
    )


DECAY_TOPK_K = 10      # leaderboard size
DECAY_MAX_AGE = 30     # ages clamp here; 2^(30 - age) stays in BIGINT


@query(
    "stream_decayed_topk",
    oracle=f"""
    WITH cells AS (
        SELECT user_id, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, date_trunc('day', ts)
    ),
    anchor AS (SELECT max(d) AS amax FROM cells),
    decayed AS (
        SELECT c.user_id,
               sum(c.cents * (1::BIGINT << ({DECAY_MAX_AGE}
                   - least(date_diff('day', c.d, a.amax),
                           {DECAY_MAX_AGE})::INT)))::BIGINT AS score_x2_30,
               sum(c.cents)::BIGINT AS raw_cents
        FROM cells c CROSS JOIN anchor a
        GROUP BY c.user_id
    ),
    ranked AS (
        SELECT user_id, score_x2_30, raw_cents,
               row_number() OVER (ORDER BY score_x2_30 DESC, user_id ASC)
                   AS rnk
        FROM decayed
    )
    SELECT rnk, user_id, score_x2_30, raw_cents
    FROM ranked WHERE rnk <= {DECAY_TOPK_K}
    """,
    tags=("streaming", "analytics"),
)
def stream_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed revenue leaderboard — stream_topk ranks
    all-time totals, which a leaderboard that should reflect RECENT
    behavior must not: here each purchase's weight halves per day of age
    (half-life = 1 day, anchored at the newest day IN THE DATA — never
    wall clock, so the result is replay-deterministic). The stream
    maintains per-(user, day) cells in complete mode (population x
    calendar bounded — the decay re-anchors every refresh, which is
    exactly why the state must keep the day dimension rather than a
    single decayed scalar per user: a scalar state would bake in a stale
    anchor).

    EXACT INTEGER decay: weight = 2^(MAX_AGE - age) (ages clamped at
    DECAY_MAX_AGE), so the score is a BIGINT in units of cents/2^30 —
    no float exists in the op and the twin hashes bit-exactly (the
    agg_log_histogram power-of-two discipline). Top-K by (score desc,
    user asc) via sort+limit — the bounded-heap TakeOrderedAndProject
    plan, never a global row_number window.

    At 100 TB: streaming state is the (user, day) cell table; the
    re-rank per refresh is one fold + a K-bounded heap."""
    cells_s = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("cents"))
    )
    cells = run_to_table(cells_s, sf_dir, "decaytopk", "complete")
    anchor = cells.agg(F.max("d").alias("amax"))
    decayed = (
        cells.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            "cents",
            F.least(
                F.datediff(F.col("amax"), F.col("d")),
                F.lit(DECAY_MAX_AGE),
            ).alias("age"),
        )
        .select(
            "user_id",
            F.expr(
                f"cents * shiftleft(cast(1 as bigint),"
                f" cast({DECAY_MAX_AGE} - age as int))"
            ).alias("wcents"),
            "cents",
        )
        .groupBy("user_id")
        .agg(
            F.sum("wcents").alias("score_x2_30"),
            F.sum("cents").alias("raw_cents"),
        )
    )
    top = (
        decayed.orderBy(F.col("score_x2_30").desc(), F.col("user_id").asc())
        .limit(DECAY_TOPK_K)
    )
    w = Window.orderBy(F.col("score_x2_30").desc(), F.col("user_id").asc())
    return top.select(
        F.row_number().over(w).alias("rnk"),
        "user_id",
        "score_x2_30",
        "raw_cents",
    )


# --- round 12: streaming GMM quality gate --------------------------------------


def _gmm_gate_oracle_sql() -> str:
    from ..operators.ml_eval import _GMM_XPPM_SQL, _gmm_chain_sql, _gmm_dens_sql, GMM_ITERS

    d1 = _gmm_dens_sql("w.m1", "w.v1", "w.p1")
    d2 = _gmm_dens_sql("w.m2", "w.v2", "(1000000 - w.p1)")
    return f"""
    WITH {_gmm_chain_sql()},
    gmm_docs AS (
        SELECT source, text, {_GMM_XPPM_SQL} AS xppm FROM documents
    ),
    gmm_post AS (
        SELECT source,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               substr(md5(text), 1, 8) AS u_hex,
               floor({d2} / ({d1} + {d2}) * 1000000 + 0.5)::BIGINT AS post_ppm
        FROM gmm_docs CROSS JOIN gmm_w_{GMM_ITERS} w
    )
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN u_hex < lpad(lower(to_hex(post_ppm * 4294967295
                                                   // 1000000)), 8, '0')
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN u_hex < lpad(lower(to_hex(post_ppm * 4294967295
                                                   // 1000000)), 8, '0')
                    THEN n_tokens ELSE 0 END)::BIGINT AS kept_tokens,
           (sum(post_ppm)::BIGINT // count(*)) AS mean_posterior_ppm
    FROM gmm_post GROUP BY source"""


@query(
    "stream_gmm_quality_gate",
    oracle=_gmm_gate_oracle_sql(),
    tags=("streaming", "llm", "corpus", "ml"),
)
def stream_gmm_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE posterior quality gate — the streaming twin of
    corpus_gmm_posterior_sample (the round-12 member of the batch≡stream
    reconciliation family): documents arrive as files, each micro-batch
    scores the BATCH-TRAINED mixture posterior map-side (the five exact
    integer params ride into the plan as literals — the
    model-enrichment shape with an O(1) model), draws the deterministic
    md5 keep verdict per document, and the stream maintains only the
    per-source ledger (n_docs, n_kept, kept tokens, posterior sum) in
    complete mode — state is |sources| cells, invariant in corpus size.

    One scoring expression, shared constants, one quantizer: the live
    gate cannot drift from the batch sampler (pinned stream ≡ batch
    row-for-row; the oracle is the same spliced EM chain + ledger tail).

    At 100 TB: per-row hashing + density arithmetic is stateless
    map-side work; the shuffle carries source partials; training was
    paid once by the memoized batch fit."""
    from ..operators.ml_eval import _gmm_dens_col, _gmm_params

    _, traj = _gmm_params(spark, sf_dir)
    _, m1, m2, v1, v2, p1, _ = traj[-1]
    sdocs = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(_stream_docs_dir(sf_dir))
    x = (
        F.expr(
            "size(array_distinct(split(text, ' '))) * 1000000L"
            " div size(split(text, ' '))"
        )
        / 1000000.0
    )
    a1 = _gmm_dens_col(x, m1, v1, p1)
    a2 = _gmm_dens_col(x, m2, v2, 1000000 - p1)
    post = sdocs.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.substring(F.md5("text"), 1, 8).alias("u_hex"),
        F.floor(a2 / (a1 + a2) * 1000000 + 0.5).cast("long").alias("post_ppm"),
    )
    thr = F.lpad(
        F.lower(F.hex(F.expr("post_ppm * 4294967295 div 1000000"))), 8, "0"
    )
    keep = (F.col("u_hex") < thr).cast("long")
    ledger = post.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep).alias("n_kept"),
        F.sum(F.col("n_tokens") * keep).alias("kept_tokens"),
        F.sum("post_ppm").alias("sum_post_ppm"),
    )
    out = run_to_table(ledger, sf_dir, "gmmgate", "complete")
    return out.select(
        "source",
        "n_docs",
        "n_kept",
        "kept_tokens",
        F.expr("sum_post_ppm div n_docs").alias("mean_posterior_ppm"),
    )


# --- round 12: streaming drawdown monitor --------------------------------------


def _stream_drawdown_oracle_sql() -> str:
    from ..operators.windows import _DRAWDOWN_ORACLE_SQL

    return _DRAWDOWN_ORACLE_SQL


@query(
    "stream_drawdown_monitor",
    oracle=_stream_drawdown_oracle_sql(),
    tags=("streaming", "telemetry", "timeseries"),
)
def stream_drawdown_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE max-drawdown monitor — the streaming twin of win_drawdown
    (the round-12 member of the batch≡stream reconciliation family): the
    stream maintains per-(channel, day) cents cells in complete mode
    (calendar-bounded state, the stream_msprt_monitor rule) and every
    refresh re-runs the IDENTICAL running-peak/worst-trough extraction
    via the shared drawdown_extract helper — one code path, so the live
    risk readout cannot drift from the batch metric (pinned row-for-row;
    the oracle IS win_drawdown's).

    Rule 30 applies: the memory-sink daily frame is referenced twice by
    the extraction (the dd/worst equi-join), so it is eagerly
    checkpointed to re-root lineage before the helper runs.

    At 100 TB: streaming state is |channels| x |calendar days| exact
    BIGINT cells; the extraction runs on that bounded frame per refresh."""
    from ..operators.windows import drawdown_extract
    from ..session import ensure_checkpoint_dir

    sdf = (
        stream_events(spark, sf_dir)
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc")
        )
    )
    ensure_checkpoint_dir(spark)
    daily = run_to_table(sdf, sf_dir, "ddmon", "complete").checkpoint(
        eager=True
    )
    return drawdown_extract(daily)


# --- round 12: streaming closed-form ridge (online moment accumulation) --------


def _stream_ridge_oracle_sql() -> str:
    from ..operators.ml_eval import _RIDGE_SOLVE_SQL

    return (
        "WITH" + _RIDGE_SOLVE_SQL + """
    SELECT n,
           round(w0, 6) + 0.0 AS w_intercept,
           round(w1, 6) + 0.0 AS w_views,
           round(w2, 6) + 0.0 AS w_clicks,
           round(1.0 - rss / nullif(syy - sy / (n * 1.0) * sy, 0), 6) + 0.0
               AS r2
    FROM rr_fit
    """
    )


@query(
    "stream_ridge_online",
    oracle=_stream_ridge_oracle_sql(),
    tags=("streaming", "ml", "analytics"),
)
def stream_ridge_online(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE closed-form ridge — the streaming twin of
    ml_ridge_regression and the engine's demonstration that a
    moment-expressible model needs NO retraining loop under streaming
    ingest: the stream maintains the per-user feature cells in complete
    mode (population-bounded state, the stream_msprt_monitor rule), and
    every refresh re-solves the SAME normal equations via the shared
    ridge_moments + ridge_readout code path — the model is always exactly
    the batch fit on data-so-far, because sufficient statistics are
    associative (the entire point of the moment-fold trainer class).

    Pinned stream == batch row-for-row; the oracle IS the batch twin.
    Rule 30 applies (the memory-sink user frame is checkpointed before
    the moment fold).

    At 100 TB: streaming state is |users| cells; a production deploy
    folds straight to the ten moments with a custom stateful aggregate,
    making state O(1) — the per-user table here keeps the demo's state
    inspectable and matches the batch construction exactly."""
    from ..operators.ml_eval import ridge_moments, ridge_readout
    from ..session import ensure_checkpoint_dir

    sdf = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
                - 13
            ).alias("x1"),
            (
                F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
                - 13
            ).alias("x2"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + 0.5).cast("long"),
                ).otherwise(0)
            ).alias("y"),
        )
    )
    ensure_checkpoint_dir(spark)
    pu = run_to_table(sdf, sf_dir, "ridgeon", "complete").checkpoint(
        eager=True
    )
    return ridge_readout(ridge_moments(pu))
