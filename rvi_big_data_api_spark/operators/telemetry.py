"""Telemetry / domain operators (SURVEY.md §2.9) — the reference's derived
products, re-expressed on the events fixture (user_id≈VIN, ts≈report time,
value≈reading).

The reference computed trips with per-VIN RDD groupBy → client-side sort →
imperative gap scan, written back to Cassandra (SURVEY.md §3.1 [P:med]). Here
every derivation is window algebra: ONE shuffle on user_id, per-key sorted
streams, no driver-side loops — the formulation that scales to 100 TB because
work per key is linear and keys partition freely across executors.

All timestamps are second-truncated before arithmetic and rendered as strings
on output (SURVEY.md §1 gotcha 1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row, SparkSession, Window

from ..functions.exprs import ts_str
from ..io import load
from ..registry import query

SESSION_GAP_S = 30 * 60  # 30-minute trip gap, SURVEY.md §2.9

# Shared DuckDB fragment: per-event session ids via the same window algebra.
_DUCK_SESSIONS = f"""
    WITH ordered AS (
        SELECT user_id, event_id, value,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN lag(sec) OVER w IS NULL
                         OR sec - lag(sec) OVER w > {SESSION_GAP_S}
                    THEN 1 ELSE 0 END AS gap_flag
        FROM ordered
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sessions AS (
        SELECT * EXCLUDE (gap_flag),
               -- ::BIGINT: DuckDB sum(int) yields HUGEINT, which lands as
               -- float64 in pandas and breaks the type-strict hash
               sum(gap_flag) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS session_id
        FROM flagged
    )
"""


# Session-scoped memo of the sessionized event frame: SEVEN registered
# telemetry consumers re-ran the identical lag→flag→running-sum double
# window over the events table (~0.3-0.5 s each at sf0.1 in the round-12
# bench). The assignment is the "sessions table" every real telemetry
# warehouse materializes once; one eager checkpoint per (session, sf_dir,
# gap) serves all consumers and a fresh process recomputes on demand (the
# sim_pair_edges convention).
_SESSIONIZED: dict[tuple[str, str, int], DataFrame] = {}


def sessionized_events(spark: SparkSession, sf_dir: str, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Per-event session assignment: gap > `gap_s` starts a new session.

    lag → gap flag → running sum of flags = session id (two stacked windows
    over one user_id shuffle). Reused by trip_sessionize / trip_stats and the
    streaming session twin (SURVEY.md §2.11); memoized + eagerly
    checkpointed per (session, sf_dir, gap_s).

    The memo assumes sf_dir NAMES THE DATA. Tests monkey-patch this
    module's `load` to inject synthetic frames under one placeholder
    sf_dir, which breaks that assumption — so the memo (and the
    checkpoint, whose point is cross-consumer reuse) engages only when
    the loader is the real io.load.
    """
    from .. import io
    from ..session import ensure_checkpoint_dir

    memoable = load is io.load
    key = (spark.sparkContext.applicationId, sf_dir, gap_s)
    if memoable and key in _SESSIONIZED:
        return _SESSIONIZED[key]
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_flag = F.when(
        F.lag("sec").over(w).isNull() | ((F.col("sec") - F.lag("sec").over(w)) > gap_s), 1
    ).otherwise(0)
    out = ev.withColumn("gap_flag", gap_flag).withColumn(
        "session_id", F.sum("gap_flag").over(w_run)
    )
    if not memoable:
        return out
    ensure_checkpoint_dir(spark)
    _SESSIONIZED[key] = out.checkpoint(eager=True)
    return _SESSIONIZED[key]


@query(
    "trip_sessionize",
    oracle=_DUCK_SESSIONS
    + """
    SELECT user_id, session_id,
           count(*)                 AS n_events,
           min(sec)                 AS start_sec,
           max(sec)                 AS end_sec,
           max(sec) - min(sec)      AS duration_s,
           round(sum(value), 2)     AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("telemetry",),
)
def trip_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference capability: gap-based trip derivation (30-min gap), one
    row per (vehicle, trip) with span/size/accumulated reading."""
    s = sessionized_events(spark, sf_dir)
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("sec").alias("start_sec"),
        F.max("sec").alias("end_sec"),
        (F.max("sec") - F.min("sec")).alias("duration_s"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "trip_stats",
    oracle=_DUCK_SESSIONS
    + """
    , trips AS (
        SELECT user_id, session_id,
               max(sec) - min(sec) AS duration_s,
               count(*)            AS n_events
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           count(*)                       AS n_sessions,
           round(avg(duration_s), 4)      AS avg_duration_s,
           max(duration_s)                AS max_duration_s,
           round(avg(n_events), 4)        AS avg_events_per_session,
           sum(n_events)::BIGINT          AS total_events
    FROM trips GROUP BY user_id
    """,
    tags=("telemetry",),
)
def trip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-level rollup over derived trips: session counts/durations per
    vehicle (the fleet dashboard's per-vehicle summary)."""
    trips = (
        sessionized_events(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(
            (F.max("sec") - F.min("sec")).alias("duration_s"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return trips.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("duration_s"), 4).alias("avg_duration_s"),
        F.max("duration_s").alias("max_duration_s"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        F.sum("n_events").alias("total_events"),
    )


@query(
    "latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("telemetry",),
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state per vehicle: the most recent report (reference's live
    dashboard lookup). row_number keeps exact tie semantics; at 100 TB the
    same result comes from max_by(struct(...)) with a single partial agg —
    see agg_minmax_by for that pattern."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", ts_str("ts").alias("last_ts"))
    )


@query(
    "resample_bucket",
    oracle="""
    SELECT user_id,
           (epoch(date_trunc('second', ts))::BIGINT // 300) * 300 AS bucket_epoch,
           strftime(make_timestamp(((epoch(date_trunc('second', ts))::BIGINT // 300) * 300)
                                   * 1000000), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           count(*)             AS n_events,
           round(avg(value), 4) AS avg_value,
           max(value)           AS max_value
    FROM events
    GROUP BY user_id, bucket_epoch
    """,
    tags=("telemetry",),
)
def resample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize the time-series: per vehicle per 5-minute tumbling bucket.
    Uses Spark's native window(ts, '5 minutes') — epoch-aligned, identical to
    the twin's integer-division bucketing; streaming variant shares this exact
    logical plan (SURVEY.md §2.11)."""
    ev = load(spark, sf_dir, "events")
    bucketed = ev.groupBy("user_id", F.window(F.date_trunc("second", "ts"), "5 minutes").alias("win")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.max("value").alias("max_value"),
    )
    return bucketed.select(
        "user_id",
        F.unix_timestamp(F.col("win.start")).alias("bucket_epoch"),
        ts_str(F.col("win.start")).alias("bucket_start"),
        "n_events",
        "avg_value",
        "max_value",
    )


@query(
    "threshold_runs",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, value,
               epoch(date_trunc('second', ts))::BIGINT AS sec,
               (value > 150.0) AS over_t,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_all,
               row_number() OVER (PARTITION BY user_id, (value > 150.0)
                                  ORDER BY ts, event_id) AS rn_flag
        FROM events
    )
    SELECT user_id,
           rn_all - rn_flag         AS run_grp,
           count(*)                 AS run_len,
           min(sec)                 AS run_start_sec,
           max(sec)                 AS run_end_sec,
           round(max(value), 6)     AS peak_value
    FROM marked
    WHERE over_t
    GROUP BY user_id, run_grp
    """,
    tags=("telemetry",),
)
def threshold_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speeding-episode detection: maximal runs of consecutive over-threshold
    reports via the gaps-and-islands trick (row_number minus per-flag rank is
    constant within a run).

    The per-flag rank is computed as a RUNNING COUNT of flagged rows over the
    same user_id window — not a second window partitioned by (user_id, flag),
    which would add a second shuffle. The whole operator (both windows + the
    final per-run aggregate, whose (user_id, run_grp) grouping is satisfied
    by the user_id clustering) runs on ONE exchange; tests/test_plans.py
    pins that. The oracle keeps the classic two-row_number formulation — the
    values are identical, only the plan differs."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    ).withColumn("over_t", F.col("value") > 150.0)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_all.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("rn_all", F.row_number().over(w_all))
        .withColumn("rn_flag", F.sum(F.col("over_t").cast("int")).over(w_run))
        .filter(F.col("over_t"))
        .withColumn("run_grp", F.col("rn_all") - F.col("rn_flag"))
        .groupBy("user_id", "run_grp")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("sec").alias("run_start_sec"),
            F.max("sec").alias("run_end_sec"),
            F.round(F.max("value"), 6).alias("peak_value"),
        )
    )


@query(
    "gap_report",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id,
               epoch(date_trunc('second', ts))::BIGINT
                 - lag(epoch(date_trunc('second', ts))::BIGINT)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        FROM events
    )
    SELECT user_id,
           count(gap_s)                          AS n_gaps,
           max(gap_s)                            AS max_gap_s,
           round(avg(gap_s), 4)                  AS avg_gap_s,
           count(CASE WHEN gap_s > 3600 THEN 1 END) AS n_sla_breaches
    FROM gaps GROUP BY user_id
    """,
    tags=("telemetry",),
)
def gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality report: inter-report gap stats + SLA breaches (>1 h)
    per vehicle."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn("gap_s", F.col("sec") - F.lag("sec").over(w))
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.max("gap_s").alias("max_gap_s"),
        F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
        F.count(F.when(F.col("gap_s") > 3600, F.lit(1))).alias("n_sla_breaches"),
    )


@query(
    "haversine_dist",
    oracle="""
    WITH pts AS (
        SELECT user_id, event_id, ts,
               fmod(value, 170.0) - 85.0            AS lat,
               fmod(event_id::DOUBLE, 360.0) - 180.0 AS lon
        FROM events
    ),
    pairs AS (
        SELECT user_id, event_id,
               lat, lon,
               lag(lat) OVER w AS prev_lat,
               lag(lon) OVER w AS prev_lon
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           round(2 * 6371.0 * asin(least(1.0, sqrt(
               power(sin(radians(lat - prev_lat) / 2), 2)
               + cos(radians(prev_lat)) * cos(radians(lat))
                 * power(sin(radians(lon - prev_lon) / 2), 2)
           ))), 3) AS dist_km
    FROM pairs
    WHERE prev_lat IS NOT NULL
    """,
    tags=("telemetry",),
)
def haversine_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance between consecutive fixes per vehicle — pure
    column math (2·R·asin(√…)), NO UDF. Fixtures lack lat/lon, so pseudo-
    coordinates derive deterministically from value/event_id (SURVEY.md §2.9);
    the formula itself is textually identical in both dialects."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value") % 170.0 - 85.0).alias("lat"),
        (F.col("event_id").cast("double") % 360.0 - 180.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = pts.select(
        "user_id",
        "event_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("prev_lat"),
        F.lag("lon").over(w).alias("prev_lon"),
    ).filter(F.col("prev_lat").isNotNull())
    dlat = F.radians(F.col("lat") - F.col("prev_lat")) / 2
    dlon = F.radians(F.col("lon") - F.col("prev_lon")) / 2
    a = F.pow(F.sin(dlat), 2) + F.cos(F.radians("prev_lat")) * F.cos(F.radians("lat")) * F.pow(
        F.sin(dlon), 2
    )
    dist = 2 * 6371.0 * F.asin(F.least(F.lit(1.0), F.sqrt(a)))
    return pairs.select("user_id", "event_id", F.round(dist, 3).alias("dist_km"))


@query(
    "daily_active",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           count(DISTINCT user_id) AS active_users,
           count(*)                AS n_events,
           round(sum(value), 2)    AS sum_value
    FROM events
    GROUP BY day, event_type
    """,
    tags=("telemetry",),
)
def daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet rollup: daily active vehicles and event volume per channel —
    the reference's headline dashboard aggregate."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(
        F.countDistinct("user_id").alias("active_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "resample_ffill",
    oracle="""
    WITH grid AS (
        SELECT u.user_id, g.h::TIMESTAMP AS bucket
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (SELECT unnest(generate_series(
                        (SELECT date_trunc('hour', min(ts)) FROM events),
                        (SELECT date_trunc('hour', max(ts)) FROM events),
                        INTERVAL 1 HOUR)) AS h) g
    ),
    observed AS (
        SELECT user_id, date_trunc('hour', ts)::TIMESTAMP AS bucket,
               round(avg(value), 4) AS avg_value
        FROM events GROUP BY 1, 2
    )
    SELECT grid.user_id,
           epoch(grid.bucket)::BIGINT AS bucket_epoch,
           last_value(o.avg_value IGNORE NULLS)
               OVER (PARTITION BY grid.user_id ORDER BY grid.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           (o.avg_value IS NULL) AS is_gap
    FROM grid LEFT JOIN observed o
      ON grid.user_id = o.user_id AND grid.bucket = o.bucket
    """,
    tags=("telemetry",),
)
def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling resample: regularize each vehicle's series onto an hourly
    grid and forward-fill missing hours with the last observation (the
    standard telemetry gap treatment; `is_gap` marks imputed points).

    Plan: the hourly grid spans the observed min..max hour DERIVED FROM THE
    DATA (VERDICT r1 item 5 — no hardcoded fixture dates; the bounds agg is a
    cheap columnar min/max), generated with sequence+explode (no data
    shuffle); observed buckets come from one aggregation, and the fill is an
    ignore-nulls last() window — one shuffle on user_id total. Hours before
    a vehicle's first report stay NULL (nothing to carry forward)."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(
        F.broadcast(
            ev.agg(
                F.date_trunc("hour", F.min("ts")).alias("t0"),
                F.date_trunc("hour", F.max("ts")).alias("t1"),
            ).select(
                F.explode(F.sequence("t0", "t1", F.expr("interval 1 hour"))).alias("bucket")
            )
        )
    )
    observed = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.round(F.avg("value"), 4).alias("avg_value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(observed, ["user_id", "bucket"], "left")
    return joined.select(
        "user_id",
        F.unix_timestamp("bucket").alias("bucket_epoch"),
        F.last("avg_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("avg_value").isNull().alias("is_gap"),
    )


ZSCORE_THRESHOLD = 3.0


@query(
    "anomaly_zscore",
    oracle=f"""
    WITH stats AS (
        SELECT event_id, user_id, event_type, value,
               avg(value)    OVER (PARTITION BY user_id) AS mu,
               stddev(value) OVER (PARTITION BY user_id) AS sigma
        FROM events
    )
    SELECT event_id, user_id, event_type, value,
           round((value - mu) / nullif(sigma, 0), 4) AS zscore
    FROM stats
    WHERE abs((value - mu) / nullif(sigma, 0)) > {ZSCORE_THRESHOLD}
    """,
    tags=("telemetry",),
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vehicle anomaly detection: readings more than ZSCORE_THRESHOLD
    sample standard deviations from that vehicle's own mean (the reference's
    outlier-report capability, as one declarative pass).

    One shuffle on user_id; mean and stddev come from full-partition window
    frames over the SAME partitioning (no second exchange, no groupBy+join
    rescan). stddev is the sample estimator in both engines; the z-score is
    nullif-guarded (single-report vehicles have NULL sigma) and rounded so
    last-ulp Welford drift cannot flip the hash."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    z = (F.col("value") - F.avg("value").over(w)) / F.nullif(
        F.stddev("value").over(w), F.lit(0.0)
    )
    return (
        ev.select("event_id", "user_id", "event_type", "value", z.alias("z_raw"))
        .filter(F.abs(F.col("z_raw")) > ZSCORE_THRESHOLD)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.round("z_raw", 4).alias("zscore"),
        )
    )


FUNNEL_STEPS = ("view", "click", "purchase")


@query(
    "event_funnel",
    oracle="""
    WITH base AS (
        SELECT user_id, event_type,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    s1 AS (
        SELECT *, min(CASE WHEN event_type = 'view' THEN sec END)
                      OVER (PARTITION BY user_id) AS t_view
        FROM base
    ),
    s2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND sec >= t_view THEN sec END)
                      OVER (PARTITION BY user_id) AS t_click
        FROM s1
    ),
    s3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND sec >= t_click THEN sec END)
                      OVER (PARTITION BY user_id) AS t_purchase
        FROM s2
    ),
    per_user AS (
        SELECT user_id, any_value(t_view) AS t_view, any_value(t_click) AS t_click,
               any_value(t_purchase) AS t_purchase
        FROM s3 GROUP BY user_id
    )
    SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END)::BIGINT     AS n_view,
           count(CASE WHEN t_click IS NOT NULL THEN 1 END)::BIGINT    AS n_click,
           count(CASE WHEN t_purchase IS NOT NULL THEN 1 END)::BIGINT AS n_purchase,
           round(count(CASE WHEN t_click IS NOT NULL THEN 1 END)
                 / nullif(count(CASE WHEN t_view IS NOT NULL THEN 1 END), 0), 4)
               AS view_to_click,
           round(count(CASE WHEN t_purchase IS NOT NULL THEN 1 END)
                 / nullif(count(CASE WHEN t_click IS NOT NULL THEN 1 END), 0), 4)
               AS click_to_purchase
    FROM per_user
    """,
    tags=("telemetry",),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user advances a
    step only with an event AT/AFTER their entry to the previous step —
    sequence matters, not mere presence (distinct from a per-type count).

    Three stacked full-partition windows over ONE user_id exchange compute
    the per-user step-entry times (each conditional min depends on the
    previous — exactly the dependency windows express without rescanning);
    a per-user collapse then one global partial-agg row. Scales as a single
    wide pass over events."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("sec"),
    )
    w = Window.partitionBy("user_id")
    s = ev.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("sec"))).over(w)
    )
    s = s.withColumn(
        "t_click",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("sec") >= F.col("t_view")), F.col("sec"))
        ).over(w),
    )
    s = s.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("sec") >= F.col("t_click")),
                F.col("sec"),
            )
        ).over(w),
    )
    per_user = s.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    n_view = F.count(F.when(F.col("t_view").isNotNull(), 1))
    n_click = F.count(F.when(F.col("t_click").isNotNull(), 1))
    n_purchase = F.count(F.when(F.col("t_purchase").isNotNull(), 1))
    return per_user.agg(
        n_view.alias("n_view"),
        n_click.alias("n_click"),
        n_purchase.alias("n_purchase"),
        F.round(n_click / F.nullif(n_view, F.lit(0)), 4).alias("view_to_click"),
        F.round(n_purchase / F.nullif(n_click, F.lit(0)), 4).alias("click_to_purchase"),
    )


@query(
    "retention_cohort",
    oracle="""
    WITH days AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               min(date_trunc('day', ts)) OVER (PARTITION BY user_id) AS cohort_day
        FROM events
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           date_diff('day', cohort_day, day)::INT AS day_offset,
           count(DISTINCT user_id)::BIGINT AS n_active
    FROM days
    GROUP BY cohort_day, date_diff('day', cohort_day, day)
    """,
    tags=("telemetry",),
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: vehicles grouped by first-seen day, activity
    counted per day-offset since onboarding — the standard triangle chart
    behind fleet (or user-base) retention.

    First-seen day is a full-partition window over the user_id exchange; the
    cohort × offset aggregation then shuffles (cohort_day, offset) partials.
    count(DISTINCT) re-shuffles by (key, user) — at 100 TB swap in
    approx_count_distinct or pre-dedup (user, day) pairs first; the exact
    form here is the oracle-checkable contract."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    w = Window.partitionBy("user_id")
    days = ev.withColumn("cohort_day", F.min("day").over(w))
    return (
        days.groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "resample_interp",
    oracle="""
    WITH fixes AS (
        SELECT user_id, event_id,
               epoch(date_trunc('second', ts))::BIGINT AS sec, value
        FROM events
    ),
    bounds AS (
        SELECT user_id,
               (min(sec) // 3600) * 3600 AS h0,
               (max(sec) // 3600) * 3600 AS h1
        FROM fixes GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, 3600)) AS sec
        FROM bounds
    ),
    merged AS (
        SELECT user_id, sec, 1 AS is_grid, -1::BIGINT AS eid, NULL::DOUBLE AS value
        FROM grid
        UNION ALL
        SELECT user_id, sec, 0, event_id, value FROM fixes
    ),
    carried AS (
        SELECT user_id, sec, is_grid,
               last_value(CASE WHEN is_grid = 0 THEN sec END IGNORE NULLS)
                   OVER wp AS prev_sec,
               last_value(value IGNORE NULLS) OVER wp AS prev_v,
               first_value(CASE WHEN is_grid = 0 THEN sec END IGNORE NULLS)
                   OVER wf AS next_sec,
               first_value(value IGNORE NULLS) OVER wf AS next_v
        FROM merged
        WINDOW
          wp AS (PARTITION BY user_id ORDER BY sec, is_grid, eid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY user_id ORDER BY sec, is_grid, eid
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, sec AS grid_sec,
           CASE WHEN prev_sec = sec THEN prev_v
                ELSE prev_v + (next_v - prev_v) * (sec - prev_sec)
                              / (next_sec - prev_sec) END AS value_interp
    FROM carried
    WHERE is_grid = 1 AND prev_sec IS NOT NULL AND next_sec IS NOT NULL
    """,
    tags=("telemetry",),
)
def resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resample — the upgrade of resample_ffill for
    continuous signals (odometer, fuel level): each vehicle's series lands
    on an hourly grid, every grid point valued by linear interpolation
    between its surrounding fixes. Grid points outside a vehicle's observed
    span are dropped (interpolation needs both neighbors); a fix exactly on
    the hour passes through unchanged.

    Plan: union(grid, fixes) then TWO frames over ONE user_id exchange — a
    carry-forward (prev fix) and a carry-backward (next fix), both
    ignore-nulls; the interpolation itself is arithmetic. The total order
    (sec, is_grid, event_id) is pinned identically in both engines — fixes
    sort before the grid point at the same second, so prev catches an
    exact-hour fix and the CASE emits it verbatim. Per-vehicle grids span
    that vehicle's own min..max hour (data-derived, never hardcoded)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("eid"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("sec"),
        "value",
    )
    bounds = ev.groupBy("user_id").agg(
        (F.floor(F.min("sec") / 3600) * 3600).alias("h0"),
        (F.floor(F.max("sec") / 3600) * 3600).alias("h1"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("h0", "h1", F.lit(3600))).alias("sec")
    )
    merged = grid.select(
        "user_id", "sec", F.lit(1).alias("is_grid"), F.lit(-1).cast("long").alias("eid"),
        F.lit(None).cast("double").alias("value"),
    ).unionByName(ev.select("user_id", "sec", F.lit(0).alias("is_grid"), "eid", "value"))
    order = [F.col("sec"), F.col("is_grid"), F.col("eid")]
    wp = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    fix_sec = F.when(F.col("is_grid") == 0, F.col("sec"))
    carried = merged.select(
        "user_id", "sec", "is_grid",
        F.last(fix_sec, ignorenulls=True).over(wp).alias("prev_sec"),
        F.last("value", ignorenulls=True).over(wp).alias("prev_v"),
        F.first(fix_sec, ignorenulls=True).over(wf).alias("next_sec"),
        F.first("value", ignorenulls=True).over(wf).alias("next_v"),
    )
    interp = F.when(F.col("prev_sec") == F.col("sec"), F.col("prev_v")).otherwise(
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v"))
        * (F.col("sec") - F.col("prev_sec"))
        / (F.col("next_sec") - F.col("prev_sec"))
    )
    return (
        carried.filter(
            (F.col("is_grid") == 1)
            & F.col("prev_sec").isNotNull()
            & F.col("next_sec").isNotNull()
        )
        .select(
            "user_id",
            F.col("sec").alias("grid_sec"),
            interp.alias("value_interp"),
        )
    )


OVERLAP_WIN_START_H = 8
OVERLAP_WIN_END_H = 11


@query(
    "join_interval_overlap",
    oracle=_DUCK_SESSIONS
    + f"""
    , trips AS (
        SELECT user_id, session_id,
               min(sec) AS t0, max(sec) AS t1
        FROM sessions GROUP BY user_id, session_id
    ),
    bounds AS (SELECT (min(sec) // 86400) AS d0, (max(sec) // 86400) AS d1 FROM sessions),
    wins AS (
        SELECT unnest(generate_series(d0, d1)) * 86400 + {OVERLAP_WIN_START_H} * 3600 AS w0,
               unnest(generate_series(d0, d1)) * 86400 + {OVERLAP_WIN_END_H} * 3600 AS w1
        FROM bounds
    )
    SELECT strftime(make_timestamp((w.w0 - {OVERLAP_WIN_START_H} * 3600) * 1000000),
                    '%Y-%m-%d') AS day,
           count(*) AS n_trips,
           sum(least(t.t1, w.w1) - greatest(t.t0, w.w0))::BIGINT AS total_overlap_s
    FROM trips t JOIN wins w ON t.t0 < w.w1 AND w.w0 < t.t1
    GROUP BY w.w0
    """,
    tags=("join", "telemetry"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval OVERLAP join — the genuinely hard join shape
    (join_interval is point-in-interval): trips [t0, t1) against daily
    08:00–11:00 maintenance windows, half-open overlap t0 < w1 AND w0 < t1,
    reporting per-day overlapping-trip counts and total overlap seconds.

    Scale formulation: a trip is EXPLODED onto the days it spans
    (sequence(day(t0), day(t1))) and joined to the window dim on the DAY
    equi-key with the overlap condition as a residual — each task sees one
    day's trips, never the quadratic trips × windows product. A window lives
    inside one day, so the bucketed join produces each overlapping pair
    exactly once (no dedup pass). The twin is the direct quadratic overlap
    join, oracle-only. Day bounds derive from the data."""
    trips = (
        sessionized_events(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(F.min("sec").alias("t0"), F.max("sec").alias("t1"))
    )
    exploded = trips.withColumn(
        "day", F.explode(F.sequence(F.floor(F.col("t0") / 86400), F.floor(F.col("t1") / 86400)))
    )
    w0 = F.col("day") * 86400 + OVERLAP_WIN_START_H * 3600
    w1 = F.col("day") * 86400 + OVERLAP_WIN_END_H * 3600
    overlapped = exploded.filter((F.col("t0") < w1) & (w0 < F.col("t1")))
    return (
        overlapped.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.sum(F.least(F.col("t1"), w1) - F.greatest(F.col("t0"), w0)).alias(
                "total_overlap_s"
            ),
        )
        .select(
            F.date_format(F.timestamp_seconds(F.col("day") * 86400), "yyyy-MM-dd").alias("day"),
            "n_trips",
            "total_overlap_s",
        )
    )


@query(
    "state_intervals",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_type,
               epoch(date_trunc('second', ts))::BIGINT AS sec,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_all,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    )
    SELECT user_id, event_type,
           min(sec) AS valid_from_sec,
           max(sec) AS valid_to_sec,
           count(*) AS n_reports
    FROM marked
    GROUP BY user_id, event_type, rn_all - rn_type
    """,
    tags=("telemetry",),
)
def state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-channel compression (SCD2-style history build): consecutive
    reports of the SAME channel per vehicle collapse into one validity
    interval [valid_from, valid_to] — the standard way a 100 TB raw feed
    becomes a compact state-history table (threshold_runs is the boolean
    special case; this is the general categorical one).

    Same single-exchange gaps-and-islands shape: global row_number minus a
    per-value running count is constant within a run, and the final
    (user_id, grp) aggregate reuses the user_id clustering. The oracle uses
    the classic two-row_number formulation."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # per-type running count over the SAME user_id window (no second shuffle):
    # count of rows of MY type seen so far
    counts = {
        t: F.sum((F.col("event_type") == t).cast("int")).over(
            w_all.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for t in ("click", "error", "purchase", "signup", "view")
    }
    rn_type = (
        F.when(F.col("event_type") == "click", counts["click"])
        .when(F.col("event_type") == "error", counts["error"])
        .when(F.col("event_type") == "purchase", counts["purchase"])
        .when(F.col("event_type") == "signup", counts["signup"])
        .otherwise(counts["view"])
    )
    return (
        ev.withColumn("rn_all", F.row_number().over(w_all))
        .withColumn("grp", F.col("rn_all") - rn_type)
        .groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("sec").alias("valid_from_sec"),
            F.max("sec").alias("valid_to_sec"),
            F.count(F.lit(1)).alias("n_reports"),
        )
        .drop("grp")
    )


WINSOR_LO = 0.01
WINSOR_HI = 0.99


@query(
    "clean_winsorize",
    oracle=f"""
    WITH cuts AS (
        SELECT event_type,
               quantile_cont(value, {WINSOR_LO}) AS lo,
               quantile_cont(value, {WINSOR_HI}) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           round(CASE WHEN e.value < c.lo THEN c.lo
                      WHEN e.value > c.hi THEN c.hi
                      ELSE e.value END, 6) AS value_winsor,
           (e.value < c.lo OR e.value > c.hi) AS clipped
    FROM events e JOIN cuts c ON e.event_type = c.event_type
    """,
    tags=("telemetry",),
)
def clean_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the standard outlier treatment before training or
    averaging: per-channel p01/p99 cut points, values outside clipped to the
    fence (vs anomaly_zscore, which REPORTS outliers; this REPAIRS them).

    Two-pass by necessity (the fences are global per channel): a tiny
    percentile aggregate — one row per channel — broadcasts back onto the
    stream, so the big side never shuffles. Exact percentiles match DuckDB's
    quantile_cont interpolation (PARITY-proven in agg_percentile); at 100 TB
    swap in percentile_approx and accept the fence estimate."""
    ev = load(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", WINSOR_LO).alias("lo"),
        F.percentile("value", WINSOR_HI).alias("hi"),
    )
    clipped = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(
                F.when(F.col("value") < F.col("lo"), F.col("lo"))
                .when(F.col("value") > F.col("hi"), F.col("hi"))
                .otherwise(F.col("value")),
                6,
            ).alias("value_winsor"),
            clipped.alias("clipped"),
        )
    )


_HAVERSINE_DUCK = """2 * 6371.0 * asin(least(1.0, sqrt(
               pow(sin(radians(lat - prev_lat) / 2), 2)
               + cos(radians(prev_lat)) * cos(radians(lat))
               * pow(sin(radians(lon - prev_lon) / 2), 2))))"""


@query(
    "trip_distance",
    oracle=_DUCK_SESSIONS
    + f"""
    , pts AS (
        SELECT user_id, session_id, sec, event_id,
               value % 170.0 - 85.0 AS lat,
               event_id::DOUBLE % 360.0 - 180.0 AS lon
        FROM sessions
    ),
    legs AS (
        SELECT user_id, session_id, lat, lon,
               lag(lat) OVER w AS prev_lat,
               lag(lon) OVER w AS prev_lon
        FROM pts
        WINDOW w AS (PARTITION BY user_id, session_id ORDER BY sec, event_id)
    )
    SELECT user_id, session_id,
           count(*)::BIGINT AS n_legs,
           round(sum({_HAVERSINE_DUCK}), 2) AS dist_km
    FROM legs WHERE prev_lat IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("telemetry",),
)
def trip_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-trip path length — the odometer product the reference derived
    from raw fixes: sessionize (30-min gap), order each trip's fixes, sum
    consecutive great-circle legs. One row per multi-fix (vehicle, trip).

    Composition stays linear: the SAME user_id shuffle serves sessionize's
    two windows AND the per-trip lag (session_id is a function of the sort
    the partition already has), then legs absorb into a partial-agg sum.
    Pseudo-coordinates derive from value/event_id exactly as haversine_dist;
    the leg formula is textually identical in both dialects, and the per-
    trip sum (~70 legs max) rounds at 2 dp — far above double reorder
    noise."""
    s = sessionized_events(spark, sf_dir).select(
        "user_id",
        "session_id",
        "sec",
        "event_id",
        (F.col("value") % 170.0 - 85.0).alias("lat"),
        (F.col("event_id").cast("double") % 360.0 - 180.0).alias("lon"),
    )
    w = Window.partitionBy("user_id", "session_id").orderBy("sec", "event_id")
    legs = s.select(
        "user_id",
        "session_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("prev_lat"),
        F.lag("lon").over(w).alias("prev_lon"),
    ).filter(F.col("prev_lat").isNotNull())
    dlat = F.radians(F.col("lat") - F.col("prev_lat")) / 2
    dlon = F.radians(F.col("lon") - F.col("prev_lon")) / 2
    a = F.pow(F.sin(dlat), 2) + F.cos(F.radians("prev_lat")) * F.cos(
        F.radians("lat")
    ) * F.pow(F.sin(dlon), 2)
    leg_km = 2 * 6371.0 * F.asin(F.least(F.lit(1.0), F.sqrt(a)))
    return legs.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_legs"),
        F.round(F.sum(leg_km), 2).alias("dist_km"),
    )


GEOFENCE_ZONES = [
    (1, 0.0, 0.0, 3000.0),
    (2, 45.0, 90.0, 2500.0),
    (3, -45.0, -90.0, 2000.0),
    (4, 60.0, -150.0, 1500.0),
    (5, -70.0, 120.0, 1000.0),
]


@query(
    "geo_geofence",
    oracle=f"""
    WITH zones(zone_id, zlat, zlon, radius_km) AS (
        VALUES {", ".join(f"({z}, {la}, {lo}, {r})" for z, la, lo, r in GEOFENCE_ZONES)}
    ),
    pts AS (
        SELECT event_id, user_id, event_type,
               value % 170.0 - 85.0 AS lat,
               event_id::DOUBLE % 360.0 - 180.0 AS lon
        FROM events
    ),
    scored AS (
        SELECT p.event_id, p.user_id, z.zone_id,
               2 * 6371.0 * asin(least(1.0, sqrt(
                   pow(sin(radians(p.lat - z.zlat) / 2), 2)
                   + cos(radians(z.zlat)) * cos(radians(p.lat))
                   * pow(sin(radians(p.lon - z.zlon) / 2), 2)))) AS dist_km,
               z.radius_km
        FROM pts p CROSS JOIN zones z
    ),
    nearest AS (
        SELECT *, row_number() OVER (PARTITION BY event_id
                                     ORDER BY dist_km, zone_id) AS rn
        FROM scored WHERE dist_km <= radius_km
    )
    SELECT zone_id,
           count(*)::BIGINT AS n_fixes,
           count(DISTINCT user_id)::BIGINT AS n_vehicles,
           round(avg(dist_km), 3) AS avg_dist_km
    FROM nearest WHERE rn = 1
    GROUP BY 1
    """,
    tags=("telemetry", "geo"),
)
def geo_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence classification — the fleet-ops staple: assign every fix to
    the nearest zone whose radius contains it, then report per-zone traffic
    (fix count, distinct vehicles, mean distance to center).

    The zone table is a literal broadcast (5 rows — at scale still only
    thousands, always broadcastable): the 'cross join' is a map-side loop
    over a handful of centers with zero shuffle (codegen'd haversine in
    the join condition); the rank window plans WindowGroupLimit
    PARTIAL+Final (Spark 3.5+), so the top-1-per-fix reduction already
    happens MAP-SIDE before the exchange — see plan ops (8)-(12) in
    plans/r13/geo_geofence_before.txt. Round-13 examination (guide §1.1,
    both counter-experiments measured and DISCARDED, the dedup_simhash
    discipline): (a) a join-free transform/filter/array_min argmin —
    1.20 s vs 0.89 s median at sf0.1, interpreted higher-order functions
    lose to the codegen'd join; (b) a min(struct(dist, zone, user))
    aggregate — wall-equal (0.817 vs 0.821 median) and plan-equivalent,
    because WindowGroupLimit Partial already gives the window the same
    map-side pre-reduction partial aggregation would. Plan already
    minimal; unchanged. Containment (dist ≤ radius) compares
    IEEE-identical expression trees in both engines, so the boundary
    never flaps; nearest ties break on zone_id."""
    ev = load(spark, sf_dir, "events")
    zones = spark.createDataFrame(
        GEOFENCE_ZONES, "zone_id int, zlat double, zlon double, radius_km double"
    )
    pts = ev.select(
        "event_id",
        "user_id",
        (F.col("value") % 170.0 - 85.0).alias("lat"),
        (F.col("event_id").cast("double") % 360.0 - 180.0).alias("lon"),
    )
    dlat = F.radians(F.col("lat") - F.col("zlat")) / 2
    dlon = F.radians(F.col("lon") - F.col("zlon")) / 2
    a = F.pow(F.sin(dlat), 2) + F.cos(F.radians("zlat")) * F.cos(
        F.radians("lat")
    ) * F.pow(F.sin(dlon), 2)
    dist = 2 * 6371.0 * F.asin(F.least(F.lit(1.0), F.sqrt(a)))
    scored = (
        pts.crossJoin(F.broadcast(zones))
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= F.col("radius_km"))
    )
    w = Window.partitionBy("event_id").orderBy("dist_km", "zone_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.countDistinct("user_id").alias("n_vehicles"),
            F.round(F.avg("dist_km"), 3).alias("avg_dist_km"),
        )
    )


CDC_CUTOFF_DAY = 20  # base snapshot = days < 20; change batch = days >= 20


@query(
    "cdc_merge",
    oracle=f"""
    WITH keyed AS (
        -- composite (ts, event_id) tie-break packed into ONE BIGINT
        -- (DuckDB 1.0 lacks composite arg_max — PARITY.md #7):
        -- epoch seconds * 2^21 + event_id, collision-free while
        -- event_id < 2^21 (max observed ~10^5 at sf0.1).
        -- date_trunc before epoch: DuckDB epoch() yields DOUBLE with
        -- fractional seconds and ::BIGINT rounds-to-nearest, while Spark
        -- unix_timestamp() truncates (PARITY.md #3) — truncate both sides.
        SELECT *, epoch(date_trunc('second', ts))::BIGINT * 2097152 + event_id AS ord
        FROM events
    ),
    base AS (
        SELECT user_id, arg_max(value, ord) AS value,
               arg_max(event_id, ord) AS src_event
        FROM keyed WHERE day(ts) < {CDC_CUTOFF_DAY}
        GROUP BY user_id
    ),
    changes AS (
        SELECT user_id, arg_max(value, ord) AS value,
               arg_max(event_id, ord) AS src_event
        FROM keyed WHERE day(ts) >= {CDC_CUTOFF_DAY}
        GROUP BY user_id
    )
    SELECT coalesce(c.user_id, b.user_id) AS user_id,
           coalesce(c.value, b.value) AS value,
           coalesce(c.src_event, b.src_event) AS src_event,
           CASE WHEN b.user_id IS NULL THEN 'insert'
                WHEN c.user_id IS NULL THEN 'unchanged'
                ELSE 'update' END AS merge_action
    FROM base b FULL JOIN changes c ON b.user_id = c.user_id
    """,
    tags=("telemetry", "cdc"),
)
def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (CDC upsert) — the incremental-pipeline primitive: a base
    snapshot (latest reading per vehicle before the cutoff) merged with a
    change batch (latest after), emitting the new state plus the merge
    action (insert / update / unchanged) per key.

    The MERGE INTO shape without a table format: both sides reduce to
    latest-per-key first (max_by on a (ts, event_id) tie-break packed into
    one BIGINT — PARITY.md #7), so the full-outer join matches one row per
    key per side;
    at 100 TB both reductions are partial-agg friendly and the join shuffles
    on the merge key exactly once. A real deployment points the same plan at
    a Delta/Iceberg MERGE; the semantics here are engine-level and
    format-free.

    Spark 4's `DataFrame.mergeInto` API (the declarative twin of this op)
    was probed in round 5 (re-probed round 6, 2026-08-15 — unchanged):
    the builder/analyzer work, but executing MERGE
    requires a v2 table with row-level-operation support —
    `spark_catalog` parquet tables raise UNSUPPORTED_FEATURE.TABLE_OPERATION
    ("does not support MERGE INTO TABLE"), and no Delta/Iceberg runtime
    exists offline in this container. Environment-blocked, same class as
    transformWithStateInPandas (streams.py); this op carries the
    semantics."""
    ev = load(spark, sf_dir, "events")
    key = F.unix_timestamp(F.col("ts")) * 2097152 + F.col("event_id")

    def latest(side: DataFrame) -> DataFrame:
        return side.groupBy("user_id").agg(
            F.max_by("value", key).alias("value"),
            F.max_by("event_id", key).alias("src_event"),
        )

    base = latest(ev.filter(F.dayofmonth("ts") < CDC_CUTOFF_DAY)).alias("b")
    changes = latest(ev.filter(F.dayofmonth("ts") >= CDC_CUTOFF_DAY)).alias("c")
    return base.join(changes, F.col("b.user_id") == F.col("c.user_id"), "full").select(
        F.coalesce(F.col("c.user_id"), F.col("b.user_id")).alias("user_id"),
        F.coalesce(F.col("c.value"), F.col("b.value")).alias("value"),
        F.coalesce(F.col("c.src_event"), F.col("b.src_event")).alias("src_event"),
        F.when(F.col("b.user_id").isNull(), "insert")
        .when(F.col("c.user_id").isNull(), "unchanged")
        .otherwise("update")
        .alias("merge_action"),
    )


@query(
    "feature_pit_training",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, ts, event_type, value,
               CASE WHEN event_type = 'view' THEN value END AS v_view,
               CASE WHEN event_type = 'click' THEN value END AS v_click
        FROM events
    ),
    feat AS (
        SELECT event_id, user_id, event_type, value,
               epoch(date_trunc('second', ts))::BIGINT AS sec,
               last_value(v_view IGNORE NULLS) OVER w AS prior_view,
               last_value(v_click IGNORE NULLS) OVER w AS prior_click,
               count(*) OVER w AS n_prior
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, sec, value AS label_value,
           prior_view, prior_click, n_prior
    FROM feat WHERE event_type = 'purchase'
    """,
    tags=("telemetry", "ml", "feature-store"),
)
def feature_pit_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct training-set assembly — the feature-store join
    every supervised pipeline needs and most get WRONG by leaking future
    data: for each label event (a purchase), attach each feature's value
    as of STRICTLY BEFORE the label timestamp (latest prior view value,
    latest prior click value, prior event count). The
    UNBOUNDED PRECEDING → 1 PRECEDING frame is the leakage guard: the
    label row itself and anything after it can never feed its own
    features.

    Spark-first shape: NOT one as-of join per feature table (N shuffles) —
    labels and features ride ONE per-user window over the unified event
    stream, so the whole training set costs a single shuffle on user_id
    regardless of feature count; `last(col, ignorenulls=True)` per feature
    channel is the per-column as-of. Ordering is total (ts, event_id), so
    both engines' frames contain identical rows and the IGNORE NULLS fold
    picks identical values. At 100 TB with features in separate tables,
    the same plan applies after a unionByName of (entity, ts, channel,
    value) feature streams — the union replaces N join pipelines."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col("event_type")
    base = ev.select(
        "event_id", "user_id", "ts", "event_type", "value",
        F.when(t == "view", F.col("value")).alias("v_view"),
        F.when(t == "click", F.col("value")).alias("v_click"),
    )
    return (
        base.select(
            "event_id", "user_id", "event_type", "value",
            F.unix_timestamp("ts").alias("sec"),
            F.last("v_view", ignorenulls=True).over(w).alias("prior_view"),
            F.last("v_click", ignorenulls=True).over(w).alias("prior_click"),
            F.count(F.lit(1)).over(w).alias("n_prior"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", "sec",
            F.col("value").alias("label_value"),
            "prior_view", "prior_click", "n_prior",
        )
    )


@query(
    "feature_rolling_windows",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, epoch(date_trunc('second', ts))::BIGINT AS sec, value
        FROM events
    )
    SELECT event_id, user_id, sec,
           round(coalesce(sum(value) OVER w1, 0.0), 2) AS sum_1h,
           count(*) OVER w1 AS n_1h,
           round(coalesce(sum(value) OVER w24, 0.0), 2) AS sum_24h,
           count(*) OVER w24 AS n_24h
    FROM base
    WINDOW w1 AS (PARTITION BY user_id ORDER BY sec
                  RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING),
           w24 AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING)
    QUALIFY user_id < 10
    """,
    tags=("telemetry", "ml", "feature-store"),
)
def feature_rolling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon rolling feature vectors — feature_pit_training's
    continuous sibling: per event, activity sums/counts over trailing 1 h
    and 24 h VALUE-RANGE frames ending strictly before the row (the
    `RANGE … 1 PRECEDING` bound keeps same-second events out of their own
    features — the same leakage guard, expressed on the time axis). This
    is the velocity/recency feature family every fraud & engagement model
    consumes.

    One shuffle serves every horizon: all frames share the (user_id, sec)
    sort, so adding a horizon adds a window FUNCTION, not a pass — at
    100 TB you widen the feature vector for free instead of re-joining
    per horizon. RANGE frames are value-based, so tie seconds resolve
    identically in both engines (all rows with sec in [lo, row−1]
    included, own-second rows excluded). Output is cut to the first 10
    vehicles — the manifest shape, not a fixture-size dodge (the window
    runs before the cut; Catalyst pushes the partition-key filter below
    the window, so executed work is pruned, semantics aren't)."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("sec"), "value"
    )

    def trailing(hours: int):
        return (
            Window.partitionBy("user_id")
            .orderBy("sec")
            .rangeBetween(-hours * 3600, -1)
        )

    w1, w24 = trailing(1), trailing(24)
    return base.select(
        "event_id", "user_id", "sec",
        F.round(F.coalesce(F.sum("value").over(w1), F.lit(0.0)), 2).alias("sum_1h"),
        F.count(F.lit(1)).over(w1).alias("n_1h"),
        F.round(F.coalesce(F.sum("value").over(w24), F.lit(0.0)), 2).alias("sum_24h"),
        F.count(F.lit(1)).over(w24).alias("n_24h"),
    ).filter(F.col("user_id") < 10)


MAD_K = 3.0  # flag |v - median| > MAD_K * 1.4826 * MAD (the robust 3-sigma)


@query(
    "anomaly_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(d.med, 4) AS med,
           round(mad.mad, 4) AS mad,
           count(*)::BIGINT AS n_events,
           sum(CASE WHEN d.ad > {MAD_K} * 1.4826 * mad.mad THEN 1 ELSE 0 END)::BIGINT
               AS n_outliers
    FROM dev d JOIN mad ON d.event_type = mad.event_type
    GROUP BY d.event_type, d.med, mad.mad
    """,
    tags=("telemetry", "quality", "stats"),
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation —
    anomaly_zscore's breakdown-resistant twin: mean/stddev fences MOVE when
    the outliers they should catch contaminate them (one stuck sensor
    inflates σ until nothing is anomalous); the median and MAD have a 50%
    breakdown point, so the fence holds. 1.4826·MAD estimates σ for
    Gaussian data, making MAD_K directly comparable to a z-score cut.

    Two grouped percentile passes (median, then median of absolute
    deviations) with the tiny per-channel fence tables broadcast back —
    the clean_winsorize join discipline; the event stream never shuffles.
    Exact grouped percentiles sort per group — fine for bounded channel
    count; at 100 TB swap `percentile` for `percentile_approx` (the
    agg_percentile note) without changing the fence algebra."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(F.percentile("ad", 0.5).alias("mad"))
    fenced = dev.join(F.broadcast(mad), "event_type")
    return fenced.groupBy("event_type").agg(
        F.round(F.first("med"), 4).alias("med"),
        F.round(F.first("mad"), 4).alias("mad"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("ad") > MAD_K * 1.4826 * F.col("mad"), 1).otherwise(0)
        ).alias("n_outliers"),
    )


@query(
    "agg_session_window",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq
    )
    SELECT user_id,
           epoch(date_trunc('second', min(ts)))::BIGINT AS start_sec,
           epoch(date_trunc('second', max(ts)))::BIGINT + 1800 AS end_sec,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    tags=("telemetry", "session", "agg"),
)
def agg_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native batch `session_window` aggregation — the BUILT-IN gap-merge
    operator cross-validated against the hand-built gaps-and-islands
    algebra (trip_sessionize's formulation, here living in the ORACLE): the
    two must produce identical sessions, pinning the builtin's exact merge
    semantics (events merge while diff ≤ gap — a boundary event exactly
    gap seconds later still merges; session end = last event + gap).

    This is the operator a migration actually needs checked: pipelines
    that hand-rolled sessionization switch to session_window for the
    planner-native merging (and the streaming unification — stream_session
    is the same operator under watermarks); a silent off-by-boundary
    difference would corrupt every downstream trip metric. One shuffle on
    the session key; the builtin merges sessions inside the aggregation
    operator, no self-join."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).alias("start_sec"),
            F.unix_timestamp(F.col("sw.end")).alias("end_sec"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "resample_ohlc",
    oracle="""
    WITH b AS (
        SELECT user_id, value,
               (epoch(date_trunc('second', ts))::BIGINT // 900) * 900 AS bucket,
               epoch(date_trunc('second', ts))::BIGINT AS sec, event_id
        FROM events
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY user_id, bucket
                                  ORDER BY sec, event_id) AS rn_a,
               row_number() OVER (PARTITION BY user_id, bucket
                                  ORDER BY sec DESC, event_id DESC) AS rn_d
        FROM b
    )
    SELECT user_id, bucket,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*)::BIGINT AS n_events
    FROM ranked GROUP BY user_id, bucket
    """,
    tags=("telemetry", "resample"),
)
def resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling — the open/high/low/close summary every
    telemetry dashboard renders (candlesticks for sensor channels, not
    just stock prices): per vehicle per 15-minute bar, the FIRST reading,
    the extremes, and the LAST reading. Open/close are the order-sensitive
    half — `first()/last()` aggregates are partition-order-dependent (the
    dropDuplicates trap), so both ends come from explicit rank windows
    with a total (sec, event_id) order, which is what makes the bar
    reproducible and hash-checkable.

    Plan shape: both rank windows AND the final aggregate share the one
    (user_id, bucket) partitioning — Catalyst plans a single Exchange with
    stacked Window operators ahead of the partial agg (the sessionize
    discipline); high/low/count combine map-side."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "user_id", "value", "event_id",
        F.unix_timestamp("ts").alias("sec"),
        (F.floor(F.unix_timestamp("ts") / 900) * 900).alias("bucket"),
    )
    w_a = Window.partitionBy("user_id", "bucket").orderBy("sec", "event_id")
    w_d = Window.partitionBy("user_id", "bucket").orderBy(
        F.desc("sec"), F.desc("event_id")
    )
    ranked = b.select(
        "user_id", "bucket", "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return ranked.groupBy("user_id", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


GRID_CELL_DEG = 10.0  # heatmap cell size in degrees


@query(
    "geo_grid_density",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, value,
               fmod(value, 170.0) - 85.0             AS lat,
               fmod(event_id::DOUBLE, 360.0) - 180.0 AS lon
        FROM events
    )
    SELECT floor(lat / {GRID_CELL_DEG})::BIGINT AS lat_cell,
           floor(lon / {GRID_CELL_DEG})::BIGINT AS lon_cell,
           count(*)::BIGINT AS n_fixes,
           count(DISTINCT user_id)::BIGINT AS n_vehicles,
           sum(value::DECIMAL(18,6))::DOUBLE AS sum_value
    FROM pts GROUP BY lat_cell, lon_cell
    """,
    tags=("telemetry", "geo"),
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density heatmap rollup — the aggregate behind the reference's
    map dashboard (fix density + active-vehicle count per map tile): every
    GPS fix bins into a GRID_CELL_DEG° cell by pure floor-division (the
    integer-zoom analogue of geohash; finer zooms are just smaller cells —
    same plan), then one aggregate per cell. Same deterministic
    pseudo-coordinate convention as haversine_dist / geo_geofence
    (fixtures lack real lat/lon — SURVEY.md §2.9).

    Scale shape: cell ids are computed map-side from each row alone (no
    join, no window), so the ONLY shuffle is the per-cell aggregate whose
    key cardinality is the tile count — the heatmap for 100 TB of fixes
    shuffles kilobytes. Distinct-vehicle counts ride in the same pass;
    at extreme per-cell skew the agg_distinct_salted rewrite applies
    unchanged."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "value",
        (F.col("value") % 170.0 - 85.0).alias("lat"),
        (F.col("event_id").cast("double") % 360.0 - 180.0).alias("lon"),
    )
    return (
        pts.select(
            "user_id",
            "value",
            F.floor(F.col("lat") / GRID_CELL_DEG).alias("lat_cell"),
            F.floor(F.col("lon") / GRID_CELL_DEG).alias("lon_cell"),
        )
        .groupBy("lat_cell", "lon_cell")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.countDistinct("user_id").alias("n_vehicles"),
            # exact-decimal sum (PARITY rule 15): order-independent, no
            # rounding step — small per-cell groups make float-avg rounding
            # ties a real hazard at 4 dp
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "geo_od_matrix",
    oracle=_DUCK_SESSIONS
    + f"""
    , ends AS (
        SELECT user_id, session_id,
               arg_min(floor((fmod(value, 170.0) - 85.0) / {GRID_CELL_DEG})::BIGINT,
                       sec * 2097152 + event_id) AS o_lat_cell,
               arg_min(floor((fmod(event_id::DOUBLE, 360.0) - 180.0) / {GRID_CELL_DEG})::BIGINT,
                       sec * 2097152 + event_id) AS o_lon_cell,
               arg_max(floor((fmod(value, 170.0) - 85.0) / {GRID_CELL_DEG})::BIGINT,
                       sec * 2097152 + event_id) AS d_lat_cell,
               arg_max(floor((fmod(event_id::DOUBLE, 360.0) - 180.0) / {GRID_CELL_DEG})::BIGINT,
                       sec * 2097152 + event_id) AS d_lon_cell
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT o_lat_cell, o_lon_cell, d_lat_cell, d_lon_cell,
           count(*)::BIGINT AS n_trips,
           count(DISTINCT user_id)::BIGINT AS n_vehicles
    FROM ends
    GROUP BY o_lat_cell, o_lon_cell, d_lat_cell, d_lon_cell
    """,
    tags=("telemetry", "geo"),
)
def geo_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin→destination matrix — the fleet-planning product built on top
    of trip derivation: each trip (gap-sessionized, the trip_sessionize
    contract) contributes one (origin tile → destination tile) edge, where
    origin/destination are the grid cells (geo_grid_density's tiling) of
    the trip's first and last fix; the matrix aggregates trip counts and
    distinct vehicles per OD pair. This is the "where do trips that start
    here end" rollup a map UI draws as flow arcs.

    Scale shape: trip endpoints come from min_by/max_by on the packed
    (sec, event_id) BIGINT order key (PARITY rule 7 — DuckDB arg_min twin)
    inside the SAME per-user aggregation that trip_stats uses — the
    endpoint extraction rides the one user_id-keyed exchange the
    sessionize pipeline already pays; the OD aggregation then shuffles
    session-count rows on a tile-pair key whose cardinality is (cells)² at
    most. No joins at all."""
    sess = sessionized_events(spark, sf_dir)
    lat_cell = F.floor((F.col("value") % 170.0 - 85.0) / GRID_CELL_DEG)
    lon_cell = F.floor((F.col("event_id").cast("double") % 360.0 - 180.0) / GRID_CELL_DEG)
    ordk = F.col("sec") * 2097152 + F.col("event_id")
    ends = (
        sess.select(
            "user_id", "session_id",
            lat_cell.alias("lat_cell"), lon_cell.alias("lon_cell"),
            ordk.alias("ordk"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min_by("lat_cell", "ordk").alias("o_lat_cell"),
            F.min_by("lon_cell", "ordk").alias("o_lon_cell"),
            F.max_by("lat_cell", "ordk").alias("d_lat_cell"),
            F.max_by("lon_cell", "ordk").alias("d_lon_cell"),
        )
    )
    return ends.groupBy("o_lat_cell", "o_lon_cell", "d_lat_cell", "d_lon_cell").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.countDistinct("user_id").alias("n_vehicles"),
    )


@query(
    "fleet_daily_report",
    oracle=_DUCK_SESSIONS
    + f"""
    , base AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*)::BIGINT AS n_events,
               count(DISTINCT user_id)::BIGINT AS n_active,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1
    ),
    starts AS (
        SELECT user_id, session_id, min(sec) AS start_sec
        FROM sessions GROUP BY user_id, session_id
    ),
    sd AS (
        SELECT strftime(make_timestamp(start_sec * 1000000), '%Y-%m-%d') AS day,
               count(*)::BIGINT AS n_trip_starts
        FROM starts GROUP BY 1
    ),
    zstats AS (
        SELECT ts, value,
               avg(value)    OVER (PARTITION BY user_id) AS mu,
               stddev(value) OVER (PARTITION BY user_id) AS sigma
        FROM events
    ),
    an AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*)::BIGINT AS n_anomalies
        FROM zstats
        WHERE abs((value - mu) / nullif(sigma, 0)) > {ZSCORE_THRESHOLD}
        GROUP BY 1
    )
    SELECT b.day, b.n_active, b.n_events, b.sum_value,
           coalesce(sd.n_trip_starts, 0)::BIGINT AS n_trip_starts,
           coalesce(an.n_anomalies, 0)::BIGINT AS n_anomalies
    FROM base b
    LEFT JOIN sd ON b.day = sd.day
    LEFT JOIN an ON b.day = an.day
    """,
    tags=("telemetry", "composite"),
)
def fleet_daily_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fleet dashboard's daily rollup — the reference's headline report
    composed from three derived subsystems in ONE query: per-day activity
    (active vehicles, event volume, accumulated reading), trips STARTED
    that day (gap-based sessionization, trip_sessionize's exact contract),
    and anomalous readings that day (per-vehicle z-score, anomaly_zscore's
    exact contract). The composition is the point: each subsystem keeps
    its own partitioning (day / (user, session) / user), and the final
    assembly joins three DAY-cardinality aggregates — broadcast-sized no
    matter how large the fleet, so the report costs its three partial
    aggregates and nothing more.

    100 TB shape: three parallel subtrees over the same events table (one
    scan each; a real deployment computes them from the persisted derived
    tables instead), each reducing to ~n_days rows before any join; the
    left joins preserve days with zero trips/anomalies (coalesce 0 — a
    quiet day is a row, not a gap in the report)."""
    ev = load(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    base = ev.groupBy(day.alias("day")).agg(
        F.count_distinct(F.col("user_id")).alias("n_active"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    starts = (
        sessionized_events(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(F.min("sec").alias("start_sec"))
        .groupBy(
            F.date_format(F.timestamp_seconds(F.col("start_sec")), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n_trip_starts"))
    )
    wu = Window.partitionBy("user_id")
    z = (F.col("value") - F.avg("value").over(wu)) / F.nullif(
        F.stddev("value").over(wu), F.lit(0)
    )
    anomalies = (
        ev.withColumn("z", z)
        .filter(F.abs(F.col("z")) > ZSCORE_THRESHOLD)
        .groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).alias("n_anomalies"))
    )
    return (
        base.join(F.broadcast(starts), "day", "left")
        .join(F.broadcast(anomalies), "day", "left")
        .select(
            "day", "n_active", "n_events", "sum_value",
            F.coalesce("n_trip_starts", F.lit(0)).alias("n_trip_starts"),
            F.coalesce("n_anomalies", F.lit(0)).alias("n_anomalies"),
        )
    )


@query(
    "geo_flow_matrix",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               floor((fmod(value, 170.0) - 85.0) / {GRID_CELL_DEG})::BIGINT
                   AS lat_cell,
               floor((fmod(event_id::DOUBLE, 360.0) - 180.0) / {GRID_CELL_DEG})::BIGINT
                   AS lon_cell
        FROM events
    ),
    hops AS (
        SELECT user_id, lat_cell, lon_cell,
               lag(lat_cell) OVER w AS from_lat,
               lag(lon_cell) OVER w AS from_lon
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT from_lat, from_lon,
           lat_cell AS to_lat, lon_cell AS to_lon,
           count(*)::BIGINT AS n_moves,
           count(DISTINCT user_id)::BIGINT AS n_vehicles
    FROM hops
    WHERE from_lat IS NOT NULL
      AND (from_lat <> lat_cell OR from_lon <> lon_cell)
    GROUP BY from_lat, from_lon, to_lat, to_lon
    """,
    tags=("telemetry", "geo"),
)
def geo_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-to-tile traffic flow — the map dashboard's flow layer (how many
    vehicles moved from zone A to zone B): consecutive fixes per vehicle
    become directed tile transitions via lag(), same-cell hops drop (a
    parked vehicle is density — geo_grid_density — not flow), and the
    remaining movements aggregate per (from, to) cell pair with distinct
    vehicle counts. Completes the geo suite: density (where), OD matrix
    (trip endpoints), flow (how traffic moves between them). Same
    deterministic pseudo-coordinate convention as the rest of the suite.

    Scale shape: one user-keyed exchange for the lag window (the telemetry
    single-shuffle discipline), then a (from, to)-keyed partial agg whose
    cardinality is at most tiles² — kilobytes of shuffle for any fleet
    size. No join anywhere."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id", "ts", "event_id",
        F.floor((F.col("value") % 170.0 - 85.0) / GRID_CELL_DEG).alias("lat_cell"),
        F.floor(
            (F.col("event_id").cast("double") % 360.0 - 180.0) / GRID_CELL_DEG
        ).alias("lon_cell"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = pts.select(
        "user_id", "lat_cell", "lon_cell",
        F.lag("lat_cell").over(w).alias("from_lat"),
        F.lag("lon_cell").over(w).alias("from_lon"),
    )
    return (
        hops.filter(
            F.col("from_lat").isNotNull()
            & (
                (F.col("from_lat") != F.col("lat_cell"))
                | (F.col("from_lon") != F.col("lon_cell"))
            )
        )
        .groupBy(
            "from_lat", "from_lon",
            F.col("lat_cell").alias("to_lat"),
            F.col("lon_cell").alias("to_lon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.count_distinct(F.col("user_id")).alias("n_vehicles"),
        )
    )


@query(
    "clean_impute",
    oracle="""
    WITH masked AS (
        SELECT event_id, event_type,
               CASE WHEN substr(md5(event_id::VARCHAR), 1, 1) = '0'
                    THEN NULL ELSE value END AS value_masked
        FROM events
    ),
    fills AS (
        SELECT event_type,
               quantile_cont(value_masked, 0.5) AS fill_median,
               count(value_masked)::BIGINT AS n_observed
        FROM masked GROUP BY event_type
    )
    SELECT m.event_id, m.event_type,
           round(coalesce(m.value_masked, f.fill_median), 6) AS value_filled,
           m.value_masked IS NULL AS was_imputed,
           f.n_observed
    FROM masked m JOIN fills f ON m.event_type = f.event_type
    """,
    tags=("telemetry", "cleaning"),
)
def clean_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL imputation — the third leg of the cleaning suite (anomaly_*
    REPORTS, clean_winsorize CLIPS, this FILLS): missing readings replaced
    by their channel's median. Fixtures carry no NULLs (TESTDATA.md), so
    missingness is synthesized deterministically — an md5-keyed ~1/16
    dropout mask on event_id, the filter_null convention — identically in
    both dialects.

    Shape: the fill table is one row per channel (aggregate ignores NULLs
    in both engines), broadcast back onto the stream — the clean_winsorize
    two-pass, so the big side never shuffles. Exact median interpolation
    matches quantile_cont (PARITY agg_percentile); at 100 TB swap
    percentile_approx, or a per-window median for non-stationary channels
    (feature_rolling_windows composes)."""
    ev = load(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "event_type",
        F.when(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) == "0", None
        )
        .otherwise(F.col("value"))
        .alias("value_masked"),
    )
    fills = masked.groupBy("event_type").agg(
        F.percentile("value_masked", 0.5).alias("fill_median"),
        F.count("value_masked").alias("n_observed"),
    )
    return masked.join(F.broadcast(fills), "event_type").select(
        "event_id",
        "event_type",
        F.round(F.coalesce(F.col("value_masked"), F.col("fill_median")), 6).alias("value_filled"),
        F.col("value_masked").isNull().alias("was_imputed"),
        "n_observed",
    )


SEQ_FUNNEL_PATTERN = "v[ce]*p"  # view → (clicks/errors)* → purchase


@query(
    "seq_pattern_detect",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, substr(event_type, 1, 1) AS ch,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN lag(sec) OVER w IS NULL
                         OR sec - lag(sec) OVER w > {{gap}}
                    THEN 1 ELSE 0 END AS gap_flag
        FROM ordered
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ch, sec,
               sum(gap_flag) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS session_id
        FROM flagged
    ),
    seqs AS (
        SELECT user_id, session_id,
               count(*)::BIGINT AS n_events,
               string_agg(ch, '' ORDER BY sec, event_id) AS seq
        FROM sessions GROUP BY 1, 2
    )
    SELECT user_id, session_id, n_events,
           len(regexp_extract_all(seq, '{{pat}}'))::BIGINT AS n_funnels,
           contains(seq, 'e') AS has_error
    FROM seqs
    """.format(gap=SESSION_GAP_S, pat=SEQ_FUNNEL_PATTERN),
    tags=("telemetry", "cep"),
)
def seq_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (CEP-lite / MATCH_RECOGNIZE territory):
    per session, the ordered event-type sequence is folded to a compact
    symbol string (the five fixture channels have unique initials) and a
    regex counts non-overlapping funnel occurrences — view, any clicks or
    errors, ending in purchase. event_funnel measures ONE step-ordered
    conversion per user; this counts every completed pattern instance and
    flags error-tainted sessions, the shape behind abandonment, retry-storm,
    and fraud-sequence detectors.

    Scale shape: sessionize first (sessionized_events — one user-keyed
    shuffle), THEN build strings, so the regex input is bounded by session
    length, never by a user's full history; the per-session fold is a
    sorted-struct collect (the repo's only sanctioned collect_list form) and
    the regex is a JVM-side single pass per session. Both engines scan
    left-to-right non-overlapping with greedy [ce]*, so counts agree
    exactly."""
    sess = sessionized_events(spark, sf_dir).withColumn(
        "ch", F.substring("event_type", 1, 1)
    )
    seqs = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sec", "event_id", "ch"))
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("seq"),
    )
    return seqs.select(
        "user_id",
        "session_id",
        "n_events",
        F.size(F.regexp_extract_all("seq", F.lit(SEQ_FUNNEL_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_funnels"),
        F.col("seq").contains("e").alias("has_error"),
    )


ATTRIB_WINDOW_S = 30 * 60  # last-touch lookback


@query(
    "event_attribution",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, value,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    carried AS (
        SELECT *,
               last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                          IGNORE NULLS) OVER wp AS touch_type,
               last_value(CASE WHEN event_type <> 'purchase' THEN sec END
                          IGNORE NULLS) OVER wp AS touch_sec
        FROM ordered
        WINDOW wp AS (PARTITION BY user_id ORDER BY sec, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN touch_sec IS NOT NULL AND sec - touch_sec <= {{win}}
                THEN touch_type ELSE 'none' END AS attributed_channel,
           count(*)::BIGINT AS n_purchases,
           count(DISTINCT user_id)::BIGINT AS n_users,
           round(sum(value), 2) AS attributed_value
    FROM carried WHERE event_type = 'purchase'
    GROUP BY 1
    """.format(win=ATTRIB_WINDOW_S),
    tags=("telemetry",),
)
def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — for every purchase, credit the user's most
    recent non-purchase event within the lookback window (the conversion-
    credit primitive under marketing/funnel reporting; event_funnel measures
    step completion, this assigns VALUE to the step that preceded
    conversion). Purchases with no touch inside the window credit 'none'.

    Shape: one user-keyed window carries the last non-purchase (type, sec)
    pair forward via IGNORE NULLS over the 1-PRECEDING frame (the
    resample_ffill discipline — both carried columns null out on exactly
    the same rows, so they always describe ONE touch event); the purchase
    filter and channel rollup are a partial agg. One shuffle total, and the
    same plan at 100 TB — an as-of join would shuffle both sides; the
    window formulation pays one."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    carried = ev.select(
        "user_id",
        "event_type",
        "value",
        "sec",
        F.last(F.when(not_purchase, F.col("event_type")), ignorenulls=True)
        .over(wp)
        .alias("touch_type"),
        F.last(F.when(not_purchase, F.col("sec")), ignorenulls=True)
        .over(wp)
        .alias("touch_sec"),
    )
    attributed = F.when(
        F.col("touch_sec").isNotNull()
        & ((F.col("sec") - F.col("touch_sec")) <= ATTRIB_WINDOW_S),
        F.col("touch_type"),
    ).otherwise("none")
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(attributed.alias("attributed_channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@query(
    "seq_transition_matrix",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               epoch(date_trunc('second', ts))::BIGINT AS sec, event_id
        FROM events
    ),
    pairs AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY sec, event_id) AS from_type,
               event_type AS to_type
        FROM ordered
    ),
    counts AS (
        SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
        FROM pairs WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_transitions,
           ((n_transitions * 1000000)
               // sum(n_transitions) OVER (PARTITION BY from_type))::BIGINT
               AS prob_ppm
    FROM counts
    """,
    tags=("telemetry", "cep", "markov"),
)
def seq_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event streams —
    the behavioral model behind next-action prediction, anomalous-sequence
    scoring (low-probability transitions), and synthetic session
    generation: lag() pairs each event with its predecessor within the
    user's (sec, event_id)-ordered history, pair counts fold to a
    |channels|² matrix, and each row normalizes to transition
    probabilities.

    Scale shape: ONE user-keyed window shuffle produces the pairs, the
    pair groupBy partial-aggregates to at most |channels|² rows (25 here)
    before the final exchange, and row-normalization is a window over the
    already-tiny matrix — the 100 TB cost is the single events shuffle.
    Probabilities are emitted as exact integer parts-per-million
    ((n × 10⁶) div row-total) so both engines hash identically — no
    float division or rounding mode in the contract (PARITY rule 17)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.col("n_transitions") * 1000000).alias("_num"),
        F.sum("n_transitions").over(row_tot).alias("_den"),
    ).select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("_num div _den").alias("prob_ppm"),
    )


CUSUM_TARGET_CENTS = 5_000  # in-control process level (value = 50.00)
CUSUM_SLACK_CENTS = 200     # one-sided slack k (2.00)
CUSUM_ALARM_CENTS = 50_000  # alarm threshold h (500.00 cumulative excess)


@query(
    "anomaly_cusum",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id,
               epoch(date_trunc('second', ts))::BIGINT AS sec,
               floor(value * 100 + 0.5)::BIGINT
                   - {CUSUM_TARGET_CENTS + CUSUM_SLACK_CENTS} AS y_cents
        FROM events
    ),
    cum AS (
        SELECT user_id, event_id, sec,
               sum(y_cents) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)::BIGINT AS c_run
        FROM ordered
    ),
    summed AS (
        SELECT user_id, event_id, sec, c_run,
               min(c_run) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS c_min
        FROM cum
    )
    SELECT user_id, event_id, sec,
           (c_run - least(0, c_min))::BIGINT AS s_cents
    FROM summed
    WHERE c_run - least(0, c_min) > {CUSUM_ALARM_CENTS}
    """,
    tags=("telemetry", "anomaly"),
)
def anomaly_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detector per vehicle — the classic
    sequential drift alarm (Page 1954) that catches slow upward shifts
    z-score and MAD point-outlier tests miss: S_i = max(0, S_{{i-1}} +
    (x_i − target − slack)), alarm while S_i exceeds h.

    The recursive max() has a closed form that makes it WINDOW-expressible
    (no iterative loop, no applyInPandas): with C_i the running sum of
    deviations, S_i = C_i − min(0, min_{{j≤i}} C_j) — a cumulative sum plus
    a running-min-over-the-cumulative-sum, i.e. two stacked frames on ONE
    per-user (sec, event_id)-ordered window partition. At 100 TB that is a
    single user-keyed shuffle, embarrassingly parallel across vehicles,
    where the textbook formulation looks like a sequential scan.

    All arithmetic is integer cents against a FIXED in-control target
    (industrial CUSUM monitors a spec, not a fitted mean), so both engines'
    ordered fold is exact — no float fold-order or rounding mode in the
    hash contract."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        (
            F.floor(F.col("value") * 100 + 0.5).cast("long")
            - F.lit(CUSUM_TARGET_CENTS + CUSUM_SLACK_CENTS)
        ).alias("y_cents"),
    )
    wu = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    summed = ev.select(
        "user_id",
        "event_id",
        "sec",
        F.sum("y_cents").over(wu).alias("c_run"),
    ).withColumn("c_min", F.min("c_run").over(wu))
    s = F.col("c_run") - F.least(F.lit(0).cast("long"), F.col("c_min"))
    return summed.filter(s > CUSUM_ALARM_CENTS).select(
        "user_id", "event_id", "sec", s.cast("long").alias("s_cents")
    )


SKEW_TOP_K = 10  # heavy hitters reported by the shuffle-skew audit


@query(
    "profile_key_skew",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, count(*)::BIGINT AS n_events
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT user_id, n_events,
               row_number() OVER (ORDER BY n_events DESC, user_id) AS rank,
               sum(n_events) OVER (ORDER BY n_events DESC, user_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_n
        FROM counts
    ),
    tot AS (
        SELECT sum(n_events)::BIGINT AS total_events,
               count(*)::BIGINT AS n_keys,
               max(n_events)::BIGINT AS max_n
        FROM counts
    )
    SELECT r.rank, r.user_id, r.n_events,
           ((r.n_events * 1000000) // t.total_events)::BIGINT AS share_ppm,
           ((r.cum_n * 1000000) // t.total_events)::BIGINT AS cum_share_ppm,
           ((t.max_n * t.n_keys * 1000) // t.total_events)::BIGINT
               AS skew_max_avg_x1000
    FROM ranked r CROSS JOIN tot t
    WHERE r.rank <= {SKEW_TOP_K}
    """,
    tags=("analytics", "profiling", "skew"),
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit of a join/groupBy key — the diagnostic you run
    BEFORE choosing a salting factor or enabling AQE skew handling: per-key
    frequencies reduce to the top-{SKEW_TOP_K} heavy hitters with exact
    share and cumulative share of all rows, plus the max/avg skew ratio
    (1000 = perfectly uniform) that decides whether the key needs salting
    at all.

    Scale shape: the per-key count is one partial-agg-friendly shuffle on
    the audited key (the same shuffle the production join would pay — the
    audit is strictly cheaper); ranking then runs over the KEY-COUNT table,
    not raw rows, and only the top slice survives. Shares are exact integer
    parts-per-million (BIGINT div), so no float division enters the hash
    contract. At 100 TB the count table may itself be large — the rank
    window orders by (n_events DESC, key), which TakeOrdered-style
    truncates under the rank≤K filter rather than fully sorting."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    wr = Window.orderBy(F.col("n_events").desc(), F.col("user_id"))
    ranked = counts.select(
        "user_id",
        "n_events",
        F.row_number().over(wr).alias("rank"),
        F.sum("n_events")
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_n"),
    ).filter(F.col("rank") <= SKEW_TOP_K)
    tot = counts.agg(
        F.sum("n_events").alias("total_events"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_events").alias("max_n"),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rank",
        "user_id",
        "n_events",
        F.expr("(n_events * 1000000) div total_events").alias("share_ppm"),
        F.expr("(cum_n * 1000000) div total_events").alias("cum_share_ppm"),
        F.expr("(max_n * n_keys * 1000) div total_events").alias(
            "skew_max_avg_x1000"
        ),
    )


@query(
    "cdc_scd2",
    oracle="""
    WITH changes AS (
        SELECT user_id, event_id, value,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events WHERE event_type = 'purchase'
    ),
    versioned AS (
        SELECT user_id, event_id, value, sec AS valid_from_sec,
               lead(sec) OVER (PARTITION BY user_id
                               ORDER BY sec, event_id) AS valid_to_sec,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY sec, event_id) AS version
        FROM changes
    )
    SELECT user_id, version, event_id AS src_event,
           round(value, 6) AS value,
           valid_from_sec, valid_to_sec,
           (valid_to_sec IS NULL) AS is_current
    FROM versioned
    """,
    tags=("telemetry", "cdc", "scd2"),
)
def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build — the history-preserving twin
    of cdc_merge's type-1 upsert: every change event becomes a dimension
    VERSION with a [valid_from, valid_to) interval, the open row
    (valid_to NULL) is current, and downstream point-in-time joins
    (feature_pit_training's territory) can reconstruct the dimension as of
    any instant. One lead() per user closes each version with its
    successor's start — the interval construction is purely local to the
    key partition.

    Scale shape: ONE user-keyed window shuffle builds all intervals — no
    self-join of changes to changes (the naive SCD2 build), no global sort;
    at 100 TB the change stream partitions by the dimension key and each
    version chain orders independently. A real deployment MERGEs these
    rows into a Delta/Iceberg dimension table; the interval semantics —
    the hard part — are format-free (same environment note as cdc_merge:
    no v2 row-level-operation table exists offline)."""
    ev = load(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "value",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("event_id").alias("src_event"),
        F.round("value", 6).alias("value"),
        F.col("sec").alias("valid_from_sec"),
        F.lead("sec").over(w).alias("valid_to_sec"),
    ).withColumn("is_current", F.col("valid_to_sec").isNull())


SEASONAL_FENCE_CENTS = 4000  # fixed residual fence (integer cents, rule 17b)


@query(
    "anomaly_seasonal_naive",
    oracle=f"""
    WITH base AS (
        SELECT event_type, extract(hour FROM ts)::INT AS hr,
               floor(value * 100 + 0.5)::BIGINT AS vc
        FROM events
    ),
    profile AS (
        SELECT event_type, hr,
               (sum(vc)::BIGINT // count(*))::BIGINT AS avg_cents,
               count(*)::BIGINT AS n
        FROM base GROUP BY 1, 2
    )
    SELECT p.event_type, p.hr, p.n, p.avg_cents,
           sum(CASE WHEN abs(b.vc - p.avg_cents) > {SEASONAL_FENCE_CENTS}
                    THEN 1 ELSE 0 END)::BIGINT AS n_anom
    FROM base b JOIN profile p ON b.event_type = p.event_type AND b.hr = p.hr
    GROUP BY 1, 2, 3, 4
    """,
    tags=("telemetry", "anomaly"),
)
def anomaly_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly detection — the fourth member of the anomaly
    suite and the first with a SEASONAL baseline: zscore/MAD fence against
    a global distribution and CUSUM detects drift, but a metric with a
    daily rhythm (payments spike at noon, telemetry dips overnight) needs
    its residual taken against the same-hour-of-day profile or every peak
    hour reads as an anomaly. Baseline = integer-cents mean per
    (event_type, hour-of-day) cell; a row is anomalous when its residual
    against ITS OWN cell's baseline exceeds a fixed fence.

    Exactness discipline: the baseline is integer division of cents sums
    (PARITY rule 25) and the fence a constant, so the flag can never flip
    on a float ulp — the stddev-scaled variant would re-enter rule 17b
    territory at the fence boundary. Scale shape: profile is one partial
    agg to ≤ |types|·24 rows, BROADCAST back onto the stream of rows —
    one fact scan, one tiny dim, no window; the 100 TB form of
    "join each row to its seasonal cell"."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.hour("ts").cast("int").alias("hr"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("vc"),
    )
    profile = base.groupBy("event_type", "hr").agg(
        F.expr("sum(vc) div count(*)").cast("long").alias("avg_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        base.join(F.broadcast(profile), ["event_type", "hr"])
        .groupBy("event_type", "hr", "n", "avg_cents")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("vc") - F.col("avg_cents")) > SEASONAL_FENCE_CENTS, 1
                ).otherwise(0)
            ).alias("n_anom")
        )
    )


ACF_MAX_LAG = 7  # autocorrelation horizon (days)


@query(
    "ts_autocorrelation",
    oracle=f"""
    WITH daily AS MATERIALIZED (
        SELECT date_trunc('day', o_orderdate) AS d,
               sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
        FROM orders GROUP BY 1
    ),
    lagged AS MATERIALIZED (
        SELECT rev_cents,
               {', '.join(f'lag(rev_cents, {k}) OVER (ORDER BY d) AS l{k}' for k in range(1, 8))}
        FROM daily
    )
    SELECT lag, n_pairs, round(acf, 4) + 0.0 AS acf FROM (
        {' UNION ALL '.join(
            f"SELECT {k}::INT AS lag, count(l{k})::BIGINT AS n_pairs,"
            f" corr(rev_cents, l{k}) AS acf FROM lagged"
            for k in range(1, 8)
        )}
    ) ORDER BY lag
    """,
    tags=("telemetry", "timeseries"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily-revenue series at lags 1–7 —
    the seasonality probe every forecasting pipeline runs before choosing
    a model (a spike at lag 7 says weekly rhythm; geometric decay says
    AR(1); anomaly_seasonal_naive's hour-of-day profile is the hourly
    cousin of what this measures daily).

    Exactness: the series itself is integer cents (floor(x*100+0.5), rule
    17b — never a per-row float round), so both engines correlate the
    IDENTICAL integer sequence and only corr's internal fold order can
    drift — rounded at the aggregate level (rule 6) with the -0.0 guard.
    Pearson corr of (x_t, x_{{t-k}}) skips NULL lag pairs identically in
    both engines; n_pairs pins the support so a silent series truncation
    can't pass.

    Scale shape: the fact scan collapses to ONE partial agg keyed by day;
    the lag window runs over the AGGREGATED series (rows = distinct days
    — thousands at any SF, not the fact cardinality), so the unpartitioned
    window is driver-trivial by construction; the 7 corr aggregates fold
    in one pass over that tiny frame. At 100 TB nothing changes: day
    cardinality is calendar-bounded."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("d")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("rev_cents")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "rev_cents",
        *[F.lag("rev_cents", k).over(w).alias(f"l{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    agg = lagged.agg(
        *[F.corr("rev_cents", f"l{k}").alias(f"a{k}") for k in range(1, ACF_MAX_LAG + 1)],
        *[F.count(f"l{k}").alias(f"n{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    stack_args = ", ".join(
        f"{k}, a{k}, n{k}" for k in range(1, ACF_MAX_LAG + 1)
    )
    return agg.select(
        F.expr(f"stack({ACF_MAX_LAG}, {stack_args}) AS (lag, acf_raw, n_pairs)")
    ).select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        (F.round("acf_raw", 4) + F.lit(0.0)).alias("acf"),
    )


# Gear bound for geo_nearest_poi's literal-least argmin (round 13): at or
# below this many collected POIs the per-fix argmin is a least() over
# literal candidate structs — a scalar expression tree that whole-stage-
# codegens (~1.4x the interpreted transform/array_min at sf0.1). Above it
# a literal tree risks codegen's per-method size limits (and linear plan
# growth), so the broadcast-array HOF shape takes over. 64 structs ≈ a few
# hundred expression nodes — comfortably inside codegen budgets.
POI_LEAST_MAX = 64


@query(
    "geo_nearest_poi",
    oracle="""
    WITH poi AS (
        SELECT n_nationkey AS poi_id,
               fmod(n_nationkey * 37.0, 170.0) - 85.0 AS plat,
               fmod(n_nationkey * 73.0, 360.0) - 180.0 AS plon
        FROM nation
    ),
    pts AS (
        SELECT event_id,
               fmod(value, 170.0) - 85.0 AS lat,
               fmod(event_id::DOUBLE, 360.0) - 180.0 AS lon
        FROM events
    ),
    scored AS (
        SELECT p.event_id, q.poi_id,
               (p.lat - q.plat) * (p.lat - q.plat)
               + (p.lon - q.plon) * (p.lon - q.plon) AS d2,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY (p.lat - q.plat) * (p.lat - q.plat)
                            + (p.lon - q.plon) * (p.lon - q.plon),
                            q.poi_id) AS rn
        FROM pts p CROSS JOIN poi q
    )
    SELECT poi_id, count(*)::BIGINT AS n_points,
           min(d2) AS min_d2,
           round(avg(d2), 4) + 0.0 AS avg_d2
    FROM scored WHERE rn = 1
    GROUP BY poi_id
    """,
    tags=("telemetry", "geo"),
)
def geo_nearest_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-POI assignment — every GPS fix snapped to its closest
    point-of-interest (depot / charging station / service hub), rolled up
    to a per-POI demand report. The spatial-join primitive under
    geofencing dashboards and depot-placement studies; POIs derive from
    the nation dim under the repo's deterministic pseudo-coordinate
    convention (SURVEY.md §2.9 — fixtures lack real lat/lon).

    Exactness by construction: the WINNER is selected on squared planar
    distance — subtract/multiply/add on identical doubles is
    bit-identical in both engines (no libm, rule 8 never enters), so the
    argmin can never flip on a ulp; the (d2, poi_id) composite key makes
    genuine ties deterministic (rule 7: Spark min(struct), DuckDB
    row_number — DuckDB 1.0 lacks composite arg_min). min_d2 ships RAW
    (same double on both sides); only the order-dependent avg is rounded.

    Scale shape: fact rows NEVER shuffle; the only exchange is the
    25-key POI rollup (the first formulation grouped by event_id and
    shuffled 1.5M argmin groups at sf0.1 — 10.8 s vs ~2 s for the
    map-side shapes). The per-fix argmin is two-geared (round 13, guide
    §1.2/§4 — codegen'd scalar expressions over interpreted higher-order
    functions): at or below POI_LEAST_MAX collected POIs, `least()` over
    literal candidate structs — a pure scalar expression tree that
    whole-stage-codegens (measured 0.86 s vs 1.21 s interleaved median
    at sf0.1 for the array shape; struct compare (d2, poi_id) = the same
    argmin either way, rows identical x3 SFs); above the bound (where a
    literal tree would blow past codegen's method-size limits), the
    previous ONE-ROW broadcast array + `transform`/`array_min` shape —
    still broadcast-sized for thousands of POIs. At millions of POIs
    swap the broadcast for the grid-cell bucket + neighbor-probe join
    (geo_grid_density's cells), same downstream plan."""
    n = load(spark, sf_dir, "nation")
    ev = load(spark, sf_dir, "events")
    poi = n.select(
        F.col("n_nationkey").alias("poi_id"),
        (F.col("n_nationkey") * 37.0 % 170.0 - 85.0).alias("plat"),
        (F.col("n_nationkey") * 73.0 % 360.0 - 180.0).alias("plon"),
    )
    pts = ev.select(
        "event_id",
        (F.col("value") % 170.0 - 85.0).alias("lat"),
        (F.col("event_id").cast("double") % 360.0 - 180.0).alias("lon"),
    )

    def cand(p):
        # p: a collected Row (literal gear) or an array element (HOF gear);
        # identical (d2, poi_id) struct either way — lat/plat doubles are
        # the same IEEE values (collect round-trips doubles exactly), so
        # the argmin and every d2 are bit-identical across gears.
        plat = F.lit(p["plat"]) if isinstance(p, Row) else p["plat"]
        plon = F.lit(p["plon"]) if isinstance(p, Row) else p["plon"]
        pid = F.lit(p["poi_id"]) if isinstance(p, Row) else p["poi_id"]
        dlat = F.col("lat") - plat
        dlon = F.col("lon") - plon
        return F.struct(
            (dlat * dlat + dlon * dlon).alias("d2"), pid.alias("poi_id")
        )

    pois = poi.collect()  # bounded by the nation dim (25 rows)
    if len(pois) <= POI_LEAST_MAX:
        win = F.least(*[cand(p) for p in pois]) if len(pois) > 1 else cand(pois[0])
        nearest = pts.select(win.alias("win")).select(
            F.col("win.poi_id").alias("poi_id"), F.col("win.d2").alias("d2")
        )
    else:
        poi_arr = poi.agg(
            F.collect_list(F.struct("poi_id", "plat", "plon")).alias("pois")
        )
        nearest = (
            pts.crossJoin(F.broadcast(poi_arr))
            .select(F.array_min(F.transform("pois", cand)).alias("win"))
            .select(F.col("win.poi_id").alias("poi_id"), F.col("win.d2").alias("d2"))
        )
    return nearest.groupBy("poi_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("d2").alias("min_d2"),
        (F.round(F.avg("d2"), 4) + F.lit(0.0)).alias("avg_d2"),
    )


# Holt smoothing constants: exactly-representable binary fractions so the
# recursion is the SAME IEEE arithmetic in Python floats and DuckDB doubles.
HOLT_ALPHA = 0.5   # level gain  (1 - alpha = 0.5, both exact)
HOLT_BETA = 0.25   # trend gain  (1 - beta = 0.75, exact)


@query(
    "ts_holt_linear",
    oracle="""
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    idx AS MATERIALIZED (
        SELECT event_type, strftime(d, '%Y-%m-%d') AS day, xc,
               xc::DOUBLE AS x,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    holt AS (
        SELECT event_type, day, xc, x, rn, x AS lvl, 0.0::DOUBLE AS trd
        FROM idx WHERE rn = 1
        UNION ALL
        SELECT i.event_type, i.day, i.xc, i.x, i.rn,
               0.5 * i.x + 0.5 * (h.lvl + h.trd) AS lvl,
               0.25 * ((0.5 * i.x + 0.5 * (h.lvl + h.trd)) - h.lvl)
                   + 0.75 * h.trd AS trd
        FROM holt h JOIN idx i
          ON i.event_type = h.event_type AND i.rn = h.rn + 1
    )
    SELECT event_type, day, xc,
           round(lvl, 4) + 0.0 AS level,
           round(trd, 4) + 0.0 AS trend
    FROM holt
    """,
    tags=("telemetry", "timeseries"),
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) of each event
    type's daily-cents series — the recursive smoother behind every
    "current run-rate and trend" KPI tile; win_ewma is the memoryless
    single-constant cousin, Holt adds the trend state that makes h-step
    forecasts (level + h*trend) honest on drifting series.

    The recursion l_t = alpha*x_t + (1-alpha)*(l_{t-1}+b_{t-1}),
    b_t = beta*(l_t-l_{t-1}) + (1-beta)*b_{t-1} is inherently sequential
    per series — exactly the shape Spark expresses as a grouped
    applyInPandas (one Arrow batch per event_type, a vectorized scan
    inside). The DuckDB twin is a linear recursive CTE stepping rn -> rn+1
    per type. Bit-parity by construction: the series is integer cents,
    the gains are exact binary fractions (0.5/0.25), and both engines
    evaluate the SAME operation sequence on doubles — only the displayed
    level/trend are rounded (aggregate-level, rules 1/6/17).

    At 100 TB: series are partitioned by key (here 5 types; real fleets
    millions of VINs), each group is calendar-bounded (~thousands of
    rows), so the Arrow batch per group stays KB-sized and groups fan
    out across executors — the canonical stateful-sequential pattern
    (same shape as anomaly_cusum's oracle, Spark side vectorized)."""
    import numpy as np
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))

    def holt_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        x = pdf["xc"].to_numpy(dtype=np.float64)
        n = len(x)
        lvl = np.empty(n, dtype=np.float64)
        trd = np.empty(n, dtype=np.float64)
        lvl[0], trd[0] = x[0], 0.0
        for t in range(1, n):
            # same literal op order as the CTE: 0.5*x + 0.5*(l+b)
            new_l = 0.5 * x[t] + 0.5 * (lvl[t - 1] + trd[t - 1])
            trd[t] = 0.25 * (new_l - lvl[t - 1]) + 0.75 * trd[t - 1]
            lvl[t] = new_l
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "day": pdf["day"],
                "xc": pdf["xc"],
                "lvl": lvl,
                "trd": trd,
            }
        )

    fitted = daily.groupBy("event_type").applyInPandas(
        holt_block,
        schema="event_type string, day string, xc long, lvl double, trd double",
    )
    return fitted.select(
        "event_type",
        "day",
        "xc",
        (F.round("lvl", 4) + F.lit(0.0)).alias("level"),
        (F.round("trd", 4) + F.lit(0.0)).alias("trend"),
    )


@query(
    "ts_period_over_period",
    oracle="""
    WITH daily AS (
        SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
               sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
        FROM orders GROUP BY 1
    )
    SELECT day, rev_cents,
           ((rev_cents - lag(rev_cents, 1) OVER (ORDER BY day)) * 1000000
            // nullif(lag(rev_cents, 1) OVER (ORDER BY day), 0))::BIGINT AS dod_ppm,
           ((rev_cents - lag(rev_cents, 7) OVER (ORDER BY day)) * 1000000
            // nullif(lag(rev_cents, 7) OVER (ORDER BY day), 0))::BIGINT AS wow_ppm
    FROM daily
    """,
    tags=("telemetry", "timeseries"),
)
def ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth — the day-over-day and week-over-week
    deltas every revenue dashboard leads with; the lag-7 comparison is
    the seasonality-honest one (Monday vs last Monday), which
    ts_autocorrelation's lag-7 spike justifies. Completes the ts trio:
    ACF diagnoses rhythm, Holt extracts trend, PoP reports it.

    All-integer discipline end to end: the daily series is exact cents
    (rule 17b floor), deltas ship as parts-per-million integer division
    (rule 25 — float share + round would re-enter tie territory),
    nullif-guarded so a zero-revenue prior day yields NULL growth. First
    rows have no prior period → NULL, identically in both engines.

    Scale shape: one partial agg keyed by day collapses the fact; both
    lags ride ONE unpartitioned window over the calendar-bounded daily
    series (thousands of rows at any SF). At 100 TB with per-entity
    series, partition the window by the entity key — same plan."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("day", "o_orderdate"), "yyyy-MM-dd").alias("day")
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("rev_cents"))
    return daily.select(
        "day",
        "rev_cents",
        F.expr(
            "CAST((rev_cents - lag(rev_cents, 1) OVER (ORDER BY day)) * 1000000"
            " DIV nullif(lag(rev_cents, 1) OVER (ORDER BY day), 0) AS BIGINT)"
        ).alias("dod_ppm"),
        F.expr(
            "CAST((rev_cents - lag(rev_cents, 7) OVER (ORDER BY day)) * 1000000"
            " DIV nullif(lag(rev_cents, 7) OVER (ORDER BY day), 0) AS BIGINT)"
        ).alias("wow_ppm"),
    )


DECOMP_HALF = 12  # centered moving-average half-width (full window = 25 h)


@query(
    "ts_decompose_classical",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1
    ),
    trended AS (
        SELECT h, xc,
               CASE WHEN count(*) OVER w = {2 * DECOMP_HALF + 1}
                    THEN (sum(xc) OVER w)::BIGINT // {2 * DECOMP_HALF + 1}
               END::BIGINT AS trend
        FROM hourly
        WINDOW w AS (ORDER BY h ROWS BETWEEN {DECOMP_HALF} PRECEDING
                     AND {DECOMP_HALF} FOLLOWING)
    ),
    seasonal AS (
        SELECT extract(hour FROM h)::INT AS hod,
               (sum(xc - trend)::BIGINT // count(xc - trend))::BIGINT AS s_cents
        FROM trended WHERE trend IS NOT NULL
        GROUP BY 1
    )
    SELECT strftime(t.h, '%Y-%m-%d %H:00') AS hour, t.xc, t.trend,
           CASE WHEN t.trend IS NOT NULL THEN s.s_cents END::BIGINT AS seasonal,
           (t.xc - t.trend - s.s_cents)::BIGINT AS residual
    FROM trended t JOIN seasonal s ON extract(hour FROM t.h)::INT = s.hod
    """,
    tags=("telemetry", "timeseries"),
)
def ts_decompose_classical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the hourly-cents series —
    x = trend + seasonal + residual, the diagnostic that splits
    anomaly_seasonal_naive's one fence into its three parts: trend is a
    centered {2 * DECOMP_HALF + 1}-hour moving average (NULL where the
    window is partial, the textbook edge rule), seasonal is the per
    hour-of-day mean of the detrended series, residual is what an
    anomaly detector should actually fence.

    ALL-INTEGER discipline end to end (the decomposition's novelty here):
    the series is exact cents, the moving average and the seasonal means
    are integer division (both engines truncate toward zero —
    verified -7 div 2 = -3 on each), so trend/seasonal/residual are
    BIGINTs that can never hash-diverge on a float ulp. DuckDB window
    sums of BIGINT surface as HUGEINT — ::BIGINT per rule 25.

    Scale shape: the fact collapses to the calendar-bounded hourly frame
    in one partial agg; the centered window and the 24-row seasonal
    profile (rejoined as a broadcast) run over that tiny series. Per-key
    decomposition at 100 TB = partition the window by the key."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc")
    )
    full = 2 * DECOMP_HALF + 1
    w = Window.orderBy("h").rowsBetween(-DECOMP_HALF, DECOMP_HALF)
    trended = hourly.select(
        "h",
        "xc",
        F.when(
            F.count(F.lit(1)).over(w) == full,
            F.expr(f"sum(xc) OVER (ORDER BY h ROWS BETWEEN {DECOMP_HALF} PRECEDING"
                   f" AND {DECOMP_HALF} FOLLOWING) div {full}"),
        ).cast("long").alias("trend"),
    )
    seasonal = (
        trended.filter(F.col("trend").isNotNull())
        .groupBy(F.hour("h").cast("int").alias("hod"))
        .agg(
            F.expr("sum(xc - trend) div count(xc - trend)").cast("long").alias("s_cents")
        )
    )
    return (
        trended.join(
            F.broadcast(seasonal), F.hour(trended.h).cast("int") == seasonal.hod
        )
        .select(
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            "xc",
            "trend",
            F.when(F.col("trend").isNotNull(), F.col("s_cents")).cast("long").alias("seasonal"),
            (F.col("xc") - F.col("trend") - F.col("s_cents")).cast("long").alias("residual"),
        )
    )


@query(
    "geo_track_simplify",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, event_id,
               floor(epoch(ts))::BIGINT AS sec,
               floor((fmod(value, 170.0) - 85.0) / {GRID_CELL_DEG})::BIGINT AS lat_cell,
               floor((fmod(event_id::DOUBLE, 360.0) - 180.0) / {GRID_CELL_DEG})::BIGINT
                   AS lon_cell
        FROM events
    ),
    flagged AS (
        SELECT user_id,
               CASE WHEN lag(lat_cell) OVER w IS NULL
                         OR lat_cell != lag(lat_cell) OVER w
                         OR lon_cell != lag(lon_cell) OVER w
                    THEN 1 ELSE 0 END AS keep
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    )
    SELECT user_id, count(*)::BIGINT AS n_fixes,
           sum(keep)::BIGINT AS n_kept,
           (sum(keep)::BIGINT * 1000000 // count(*))::BIGINT AS keep_ppm
    FROM flagged GROUP BY user_id
    """,
    tags=("telemetry", "geo"),
)
def geo_track_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory simplification by cell-run collapse — consecutive GPS
    fixes that stay inside the same map cell carry no route information,
    so only the FIRST fix of each cell-run survives (the streaming-safe
    cousin of Douglas-Peucker: DP needs the whole track and recursion;
    run-collapse is a pure lag comparison, so it works incrementally and
    distributes). The report is the compression audit per vehicle —
    total fixes, kept fixes, keep rate in ppm — the number that sizes
    the map-matching bill downstream.

    Same pseudo-coordinate + {GRID_CELL_DEG}° cell convention as
    geo_grid_density; the keep flag is exact integer/cell algebra (cells
    are floor-divided BIGINTs, rule 17b territory never entered), the
    rate integer-ppm (rule 25), the tie order pinned by (sec, event_id).

    Scale shape: ONE user-keyed window (the telemetry single-exchange
    rule) then a partial agg on the same key — at 100 TB the track of
    each vehicle is one partition's worth of ordered rows, exactly how
    trip_sessionize already shuffles."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
        F.floor((F.col("value") % 170.0 - 85.0) / GRID_CELL_DEG).alias("lat_cell"),
        F.floor((F.col("event_id").cast("double") % 360.0 - 180.0) / GRID_CELL_DEG).alias(
            "lon_cell"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    keep = F.when(
        F.lag("lat_cell").over(w).isNull()
        | (F.col("lat_cell") != F.lag("lat_cell").over(w))
        | (F.col("lon_cell") != F.lag("lon_cell").over(w)),
        1,
    ).otherwise(0)
    return (
        pts.select("user_id", keep.alias("keep"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_fixes"),
            F.sum("keep").alias("n_kept"),
            F.expr("CAST(sum(keep) * 1000000 DIV count(1) AS BIGINT)").alias("keep_ppm"),
        )
    )


SNAPDIFF_T1 = 20  # snapshot A taken as of day 20 (state window [19, 20))
SNAPDIFF_T2 = 28  # snapshot B taken as of day 28 (state window [27, 28))
SNAPDIFF_WIN = 1  # trailing-activity window width (days) — sized so all
#                   three verbs occur at sf0.01 (16 inserts / 9 deletes /
#                   124 updates measured; a 2-day window degenerates to
#                   updates-only because every user stays active)


@query(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, count(*)::BIGINT AS n,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
        FROM events
        WHERE day(ts) >= {SNAPDIFF_T1 - SNAPDIFF_WIN} AND day(ts) < {SNAPDIFF_T1}
        GROUP BY user_id
    ),
    s2 AS (
        SELECT user_id, count(*)::BIGINT AS n,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS rev_cents
        FROM events
        WHERE day(ts) >= {SNAPDIFF_T2 - SNAPDIFF_WIN} AND day(ts) < {SNAPDIFF_T2}
        GROUP BY user_id
    )
    SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
           CASE WHEN s1.user_id IS NULL THEN 'insert'
                WHEN s2.user_id IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           s1.n AS old_n, s2.n AS new_n,
           s1.rev_cents AS old_rev_cents, s2.rev_cents AS new_rev_cents
    FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
    WHERE s1.user_id IS NULL OR s2.user_id IS NULL
       OR s1.n != s2.n OR s1.rev_cents != s2.rev_cents
    """,
    tags=("cdc", "pipeline"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — DERIVE a changeset from two keyed state
    snapshots (cdc_merge APPLIES one; this is its inverse, the op a
    pipeline runs when the upstream gives it full dumps instead of a
    change feed). State = per-user activity over a {SNAPDIFF_WIN}-day
    trailing window, snapshotted as of day {SNAPDIFF_T1} and day
    {SNAPDIFF_T2}; the trailing window makes all three verbs occur
    naturally (a user active only in the old window DELETEs, only in the
    new INSERTs, in both with different counts UPDATEs). Unchanged rows
    are dropped — the changeset is the minimal delta whose apply (cdc_merge
    semantics) maps snapshot A to snapshot B exactly, an invariant the
    property suite replays.

    Exactness: state metrics are integer (count + cents via
    floor(x*100+0.5), rule 17b), so 'unchanged' is an exact integer
    equality — no float tie can leak a phantom update. Scale: two
    partial-agg reductions (map-side combine to one row per user per
    side) and ONE full-outer shuffle join on the state key; nothing else
    moves. At 100 TB both snapshot scans partition-prune to their
    {SNAPDIFF_WIN}-day windows (the day predicate reaches the parquet
    scan) and the join shuffles state rows, not events."""
    ev = load(spark, sf_dir, "events")

    def snap(t: int) -> DataFrame:
        return (
            ev.filter(
                (F.dayofmonth("ts") >= t - SNAPDIFF_WIN) & (F.dayofmonth("ts") < t)
            )
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias(
                    "rev_cents"
                ),
            )
        )

    s1 = snap(SNAPDIFF_T1).alias("s1")
    s2 = snap(SNAPDIFF_T2).alias("s2")
    j = s1.join(s2, F.col("s1.user_id") == F.col("s2.user_id"), "full_outer")
    return j.select(
        F.coalesce(F.col("s1.user_id"), F.col("s2.user_id")).alias("user_id"),
        F.when(F.col("s1.user_id").isNull(), "insert")
        .when(F.col("s2.user_id").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.col("s1.n").alias("old_n"),
        F.col("s2.n").alias("new_n"),
        F.col("s1.rev_cents").alias("old_rev_cents"),
        F.col("s2.rev_cents").alias("new_rev_cents"),
    ).filter(
        F.col("s1.user_id").isNull()
        | F.col("s2.user_id").isNull()
        | (F.col("s1.n") != F.col("s2.n"))
        | (F.col("s1.rev_cents") != F.col("s2.rev_cents"))
    )


def union_find_min_label(pdf):
    """Min-label union-find over an Arrow edge batch (doc_a, doc_b) —
    returns (key, cid) with cid = the minimum node id of each component.
    Union-by-min keeps the smaller root as the merged root, so the final
    root IS the component minimum by induction; path compression bounds
    the walk. Runs as ONE applyInPandas task for graphs whose node
    universe is bounded by construction (geo_dbscan_grid's cells) — the
    documented counterpoint to pointer_doubling_components, which handles
    node sets that grow with the data. Golden-tested on hand-built graphs
    (tests/test_round7_properties.py)."""
    import pandas as pd

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a_key, b_key in zip(pdf["doc_a"], pdf["doc_b"]):
        ra, rb = find(int(a_key)), find(int(b_key))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(parent)
    return pd.DataFrame({"key": nodes, "cid": [find(n) for n in nodes]})


DBSCAN_CELL_DEG = 5.0  # density-grid cell size (finer than GRID_CELL_DEG)
DBSCAN_MINPTS = 8  # core-cell threshold: cells with >= MINPTS fixes
# cell-key packing: lat_cell in [-18, 18), lon_cell in [-36, 36) at 5 deg —
# shift both non-negative and pack into one BIGINT so the component label is
# a single orderable key in both engines
_DB_LAT_OFF, _DB_LON_OFF, _DB_PACK = 100, 500, 1000
# session-scoped memo of the checkpointed core-cell table, keyed by
# (applicationId, sf_dir) — one entry per fixture per session, so repeated
# invocations (driver re-runs, bench, notebooks) never re-fold the points
_DBSCAN_CORE_CELLS: dict[tuple[str, str], DataFrame] = {}


@query(
    "geo_dbscan_grid",
    oracle=f"""
    WITH RECURSIVE pts AS (
        SELECT fmod(value, 170.0) - 85.0             AS lat,
               fmod(event_id::DOUBLE, 360.0) - 180.0 AS lon
        FROM events
    ),
    cells AS (
        SELECT floor(lat / {DBSCAN_CELL_DEG})::BIGINT AS lat_cell,
               floor(lon / {DBSCAN_CELL_DEG})::BIGINT AS lon_cell,
               count(*)::BIGINT AS n_pts
        FROM pts GROUP BY 1, 2
    ),
    core AS (
        SELECT lat_cell, lon_cell, n_pts,
               (lat_cell + {_DB_LAT_OFF}) * {_DB_PACK} + lon_cell + {_DB_LON_OFF}
                   AS key
        FROM cells WHERE n_pts >= {DBSCAN_MINPTS}
    ),
    sim_edges AS (
        SELECT a.key AS ka, b.key AS kb
        FROM core a JOIN core b
          ON abs(a.lat_cell - b.lat_cell) <= 1
         AND abs(a.lon_cell - b.lon_cell) <= 1
         AND a.key < b.key
    ),
    edges AS (SELECT ka AS a, kb AS b FROM sim_edges
              UNION ALL SELECT kb, ka FROM sim_edges),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(node, r) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT edges.b, reach.r FROM edges JOIN reach ON edges.a = reach.node
    ),
    labels AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
    SELECT c.lat_cell, c.lon_cell, c.n_pts,
           coalesce(l.cluster_id, c.key) AS cluster_id,
           count(*) OVER (PARTITION BY coalesce(l.cluster_id, c.key))::BIGINT
               AS cluster_cells,
           sum(c.n_pts) OVER (PARTITION BY coalesce(l.cluster_id, c.key))::BIGINT
               AS cluster_pts
    FROM core c LEFT JOIN labels l ON l.node = c.key
    """,
    tags=("telemetry", "geo", "scale"),
)
def geo_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN — density-based spatial clustering made
    shuffle-partitionable: raw fixes aggregate map-side into
    {DBSCAN_CELL_DEG}-degree cells, cells with >= {DBSCAN_MINPTS} fixes
    are CORE (everything else is noise, exactly DBSCAN's role for
    sparse points), and clusters are connected components over 8-neighbor
    adjacency of core cells. This is the standard scale-out answer to
    DBSCAN's quadratic neighbor search: the corpus is touched ONCE
    (partial-agg to cells — constant-size state bounded by the grid, not
    the data), and everything after runs on the cell table.

    Adjacency is an EQUI-join in the Spark plan: each core cell emits its
    4 forward neighbor keys (E/NE/N/NW — each undirected edge generated
    once) and hash-joins on the packed key — no theta join, no cartesian;
    the oracle spells the same adjacency as |dlat|<=1 AND |dlon|<=1 over
    the tiny cell table. Components run as ONE Arrow-batched union-find
    task over the edge list (see inline note: the cell graph is bounded
    by geometry, so iterative distributed CC is the wrong plan at every
    scale — the doc/embedding graphs, whose node sets GROW with data,
    keep pointer_doubling_components). Isolated core cells — union-find
    only sees edge endpoints — rejoin with their own key as singleton
    clusters. cluster_id = min packed key reachable, an orderable BIGINT
    in both engines."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        (F.col("value") % 170.0 - 85.0).alias("lat"),
        (F.col("event_id").cast("double") % 360.0 - 180.0).alias("lon"),
    )
    cells = (
        pts.select(
            F.floor(F.col("lat") / DBSCAN_CELL_DEG).alias("lat_cell"),
            F.floor(F.col("lon") / DBSCAN_CELL_DEG).alias("lon_cell"),
        )
        .groupBy("lat_cell", "lon_cell")
        .agg(F.count(F.lit(1)).alias("n_pts"))
    )
    key = (F.col("lat_cell") + _DB_LAT_OFF) * _DB_PACK + F.col("lon_cell") + _DB_LON_OFF
    # core feeds three consumers (neighbor explode, the adjacency probe
    # side, the final labeling join) — materialize the geometry-bounded
    # cell table ONCE per (session, sf_dir) so the events scan + agg never
    # repeats, using the session-memo + eager-checkpoint pattern
    # (sim_pair_edges' rule: disk-backed, plan-truncated, zero persistent
    # RDD handles left behind — tests/test_hygiene.py's contract)
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key not in _DBSCAN_CORE_CELLS:
        from ..session import ensure_checkpoint_dir

        ensure_checkpoint_dir(spark)
        _DBSCAN_CORE_CELLS[memo_key] = (
            cells.filter(F.col("n_pts") >= DBSCAN_MINPTS)
            .withColumn("key", key)
            .checkpoint(eager=True)
        )
    core = _DBSCAN_CORE_CELLS[memo_key]
    # forward 8-neighborhood: E, NE, N, NW — each undirected edge once
    fwd = [(0, 1), (1, 1), (1, 0), (1, -1)]
    nbrs = core.select(
        F.col("key").alias("src_key"),
        F.explode(
            F.array(
                *[
                    ((F.col("lat_cell") + dlat + _DB_LAT_OFF) * _DB_PACK
                     + F.col("lon_cell") + dlon + _DB_LON_OFF)
                    for dlat, dlon in fwd
                ]
            )
        ).alias("nbr_key"),
    )
    edges = nbrs.join(
        core.select(F.col("key").alias("nbr_key")), "nbr_key"
    ).select(F.col("src_key").alias("doc_a"), F.col("nbr_key").alias("doc_b"))
    # CC on the CELL graph — which, unlike the document/embedding graphs
    # (pointer_doubling_components territory), is bounded by GEOMETRY:
    # <= (360/cell)x(170/cell) cells exist no matter how many points feed
    # them. A constant-size graph makes iterative distributed CC (N jobs +
    # checkpoints — measured 15.8 s of fixed cost here) the wrong plan at
    # EVERY scale; the right plan is one Arrow-batched union-find task over
    # the edge list, executor-side (never a driver collect), after the
    # genuinely data-sized work (points -> cells) reduced map-side.
    labels = (
        edges.groupBy(F.lit(1).alias("g"))
        .applyInPandas(union_find_min_label, "key long, cid long")
    )
    lab = core.join(labels, "key", "left").select(
        "lat_cell",
        "lon_cell",
        "n_pts",
        F.coalesce(F.col("cid"), F.col("key")).alias("cluster_id"),
    )
    wc = Window.partitionBy("cluster_id")
    return lab.select(
        "lat_cell",
        "lon_cell",
        "n_pts",
        "cluster_id",
        F.count(F.lit(1)).over(wc).alias("cluster_cells"),
        F.sum("n_pts").over(wc).alias("cluster_pts"),
    )


XCORR_MAX_LAG = 3  # cross-correlation window: lags -3..+3 days


@query(
    "ts_cross_correlation",
    oracle=f"""
    WITH daily AS (
        SELECT day(ts) AS d,
               sum(CASE WHEN event_type = 'purchase'
                        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT
                   AS rev_cents,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
                   AS n_clicks
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT l.lag, a.rev_cents AS x, b.n_clicks AS y
        FROM generate_series(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG}) AS l(lag)
        JOIN daily a ON true
        JOIN daily b ON b.d = a.d + l.lag
    ),
    sums AS (
        SELECT lag, count(*)::BIGINT AS n_days,
               sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
               sum(x * y)::BIGINT AS sxy,
               sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
        FROM pairs GROUP BY lag
    )
    SELECT lag, n_days,
           round((n_days * sxy - sx * sy)
                 / nullif(sqrt(n_days::DOUBLE * sxx - sx::DOUBLE * sx)
                          * sqrt(n_days::DOUBLE * syy - sy::DOUBLE * sy), 0.0),
                 6) + 0.0 AS xcorr
    FROM sums
    """,
    tags=("telemetry", "ts"),
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation — does click volume LEAD purchase
    revenue (ad-effect) or LAG it (confirmation-browsing)? CCF(l) =
    Pearson corr(revenue_t, clicks_{t+l}) for l in -{XCORR_MAX_LAG}..
    +{XCORR_MAX_LAG}; the argmax lag is the attribution offset an
    event_attribution pipeline would use as its window. Completes the ts
    family: ts_autocorrelation is this op's X==Y diagonal.

    Exactness (the agg_correlation discipline, strengthened): both daily
    series are exact BIGINTs (cents via floor(x*100+0.5), counts), so
    every power sum is exact INTEGER arithmetic in both engines — the
    only floats are the final 7-row divisions, aggregate-rounded (6 dp,
    rule 8) with -0.0 guard (rule 17). BIGINT power sums overflow around
    daily revenue ~3e9 cents x 30 days (documented bound, far above any
    fixture); the overflow-proof variant centers x first.

    Scale: one partial-agg scan to the daily frame (|days| rows), then a
    7-lag x |days| self-join on the day key — work is O(lags x days),
    independent of event count. The lag dimension rides a broadcast-able
    generate_series/explode, never a shuffle."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("rev_cents"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_clicks"),
    )
    lags = F.explode(
        F.array(*[F.lit(l) for l in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)])
    ).alias("lag")
    a = daily.select(F.col("d"), F.col("rev_cents").alias("x"), lags)
    b = daily.select(F.col("d").alias("d2"), F.col("n_clicks").alias("y"))
    pairs = a.join(b, F.col("d2") == F.col("d") + F.col("lag")).select("lag", "x", "y")
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_days")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        n.cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(
        n.cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return sums.select(
        "lag",
        "n_days",
        (F.round(num / F.nullif(den, F.lit(0.0)), 6) + F.lit(0.0)).alias("xcorr"),
    )


COTRAVEL_CELL_DEG = 10.0  # co-presence cell size (coarser than DBSCAN grid)
COTRAVEL_MIN_SHARED = 3  # minimum shared (cell, day) stamps to emit a pair


@query(
    "geo_cotravel",
    oracle=f"""
    WITH stamps AS (
        SELECT DISTINCT user_id,
               floor((fmod(value, 170.0) - 85.0) / {COTRAVEL_CELL_DEG})::BIGINT
                   AS latc,
               floor((fmod(event_id::DOUBLE, 360.0) - 180.0)
                     / {COTRAVEL_CELL_DEG})::BIGINT AS lonc,
               date_trunc('day', ts) AS tb
        FROM events
    ),
    sizes AS (SELECT user_id, count(*)::BIGINT AS n_stamps FROM stamps GROUP BY 1),
    pairs AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               count(*)::BIGINT AS n_shared
        FROM stamps a JOIN stamps b
          ON a.latc = b.latc AND a.lonc = b.lonc AND a.tb = b.tb
         AND a.user_id < b.user_id
        GROUP BY 1, 2
        HAVING count(*) >= {COTRAVEL_MIN_SHARED}
    )
    SELECT p.user_a, p.user_b, p.n_shared,
           (p.n_shared * 1000000
            // nullif(sa.n_stamps + sb.n_stamps - p.n_shared, 0))::BIGINT
               AS jaccard_ppm
    FROM pairs p
    JOIN sizes sa ON sa.user_id = p.user_a
    JOIN sizes sb ON sb.user_id = p.user_b
    """,
    tags=("telemetry", "geo"),
)
def geo_cotravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-travel / co-presence detection — which vehicle pairs repeatedly
    occupy the same ({COTRAVEL_CELL_DEG}-degree cell, day) stamps? The
    spatio-temporal JOIN operator of fleet analytics (convoy mining,
    shared-route discovery, contact tracing), and structurally the
    dedup_near inverted-index pattern applied to trajectories: users
    never compare all-pairs — the stamp IS the LSH bucket (two users can
    only pair through a stamp both visited), pairs aggregate per stamp
    and filter at >= {COTRAVEL_MIN_SHARED} shared stamps, and the
    Jaccard score (shared / union of stamp sets, ppm integer division —
    rule 25) ranks persistent companions above chance collisions.

    Scale shape: one map-side distinct to stamps (16-byte keys), one
    self-equi-join keyed on the stamp — shuffle-partitionable by stamp
    hash, fan-out bounded by users-per-stamp (a hub stamp — a depot cell
    on a busy day — is the skew risk; production caps or salts stamps
    above a fan-out bound exactly as dedup_near documents for its
    bands). Pair aggregation and the two size joins run on pair rows,
    which the HAVING floor keeps sparse. Never quadratic in users."""
    ev = load(spark, sf_dir, "events")
    stamps = ev.select(
        "user_id",
        F.floor((F.col("value") % 170.0 - 85.0) / COTRAVEL_CELL_DEG).alias("latc"),
        F.floor(
            (F.col("event_id").cast("double") % 360.0 - 180.0) / COTRAVEL_CELL_DEG
        ).alias("lonc"),
        F.date_trunc("day", "ts").alias("tb"),
    ).distinct()
    sizes = stamps.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_stamps"))
    a = stamps.alias("a")
    b = stamps.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.latc") == F.col("b.latc"))
            & (F.col("a.lonc") == F.col("b.lonc"))
            & (F.col("a.tb") == F.col("b.tb"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= COTRAVEL_MIN_SHARED)
    )
    sa = sizes.select(F.col("user_id").alias("user_a"), F.col("n_stamps").alias("na"))
    sb = sizes.select(F.col("user_id").alias("user_b"), F.col("n_stamps").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "user_a")
        .join(F.broadcast(sb), "user_b")
        .select(
            "user_a",
            "user_b",
            "n_shared",
            F.expr(
                "n_shared * 1000000 div nullif(na + nb - n_shared, 0)"
            ).alias("jaccard_ppm"),
        )
    )


@query(
    "ts_seasonal_strength",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1
    ),
    trended AS (
        SELECT h, xc,
               CASE WHEN count(*) OVER w = {2 * DECOMP_HALF + 1}
                    THEN (sum(xc) OVER w)::BIGINT // {2 * DECOMP_HALF + 1}
               END::BIGINT AS trend
        FROM hourly
        WINDOW w AS (ORDER BY h ROWS BETWEEN {DECOMP_HALF} PRECEDING
                     AND {DECOMP_HALF} FOLLOWING)
    ),
    seasonal AS (
        SELECT extract(hour FROM h)::INT AS hod,
               (sum(xc - trend)::BIGINT // count(xc - trend))::BIGINT AS s_cents
        FROM trended WHERE trend IS NOT NULL
        GROUP BY 1
    ),
    parts AS (
        SELECT t.xc - t.trend - s.s_cents AS r,
               t.xc - t.trend             AS sr,
               t.xc - s.s_cents           AS tr
        FROM trended t JOIN seasonal s ON extract(hour FROM t.h)::INT = s.hod
        WHERE t.trend IS NOT NULL
    ),
    sums AS (
        SELECT count(*)::BIGINT AS n,
               sum(r)::BIGINT AS s_r,   sum(r * r)::BIGINT AS ss_r,
               sum(sr)::BIGINT AS s_sr, sum(sr * sr)::BIGINT AS ss_sr,
               sum(tr)::BIGINT AS s_tr, sum(tr * tr)::BIGINT AS ss_tr
        FROM parts
    )
    SELECT n,
           round(greatest(0.0,
               1.0 - (n * ss_r - s_r * s_r)::DOUBLE
                     / nullif((n * ss_sr - s_sr * s_sr)::DOUBLE, 0.0)), 6) + 0.0
               AS strength_seasonal,
           round(greatest(0.0,
               1.0 - (n * ss_r - s_r * s_r)::DOUBLE
                     / nullif((n * ss_tr - s_tr * s_tr)::DOUBLE, 0.0)), 6) + 0.0
               AS strength_trend
    FROM sums
    """,
    tags=("telemetry", "ts"),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality/trend strength (Hyndman's STL diagnostic, on the
    classical decomposition): strength_seasonal = max(0, 1 -
    Var(residual)/Var(seasonal + residual)) and strength_trend = max(0,
    1 - Var(residual)/Var(trend + residual)) — the two numbers that tell
    a forecasting pipeline whether ts_holt_linear needs a seasonal term
    and whether anomaly fences should be seasonal
    (anomaly_seasonal_naive) or flat (anomaly_zscore). Reuses
    ts_decompose_classical's ALL-INTEGER decomposition verbatim (same
    moving average, same hour-of-day means, same edge rule), so the only
    floats are the two final variance ratios — computed from exact
    BIGINT power sums (n*Σx² − (Σx)², the agg_correlation discipline)
    and aggregate-rounded (rule 6) with -0.0 guard (rule 17). BIGINT
    power-sum headroom: hourly cents ~1e7 at sf1 squares to 1e14 × ~1e4
    hours = 1e18, inside BIGINT; beyond that, center on the series mean
    first (documented bound).

    Scale: identical to ts_decompose_classical — the fact collapses to
    the calendar-bounded hourly frame map-side; every window and join
    after that is over |hours| rows."""
    ev = load(spark, sf_dir, "events")
    full = 2 * DECOMP_HALF + 1
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc")
    )
    w = Window.orderBy("h").rowsBetween(-DECOMP_HALF, DECOMP_HALF)
    trended = hourly.select(
        "h",
        "xc",
        F.when(
            F.count(F.lit(1)).over(w) == full,
            F.expr(f"sum(xc) OVER (ORDER BY h ROWS BETWEEN {DECOMP_HALF} PRECEDING"
                   f" AND {DECOMP_HALF} FOLLOWING) div {full}"),
        ).alias("trend"),
    )
    seasonal = (
        trended.filter(F.col("trend").isNotNull())
        .groupBy(F.hour("h").alias("hod"))
        .agg(F.expr("sum(xc - trend) div count(xc - trend)").alias("s_cents"))
    )
    parts = (
        trended.filter(F.col("trend").isNotNull())
        .join(F.broadcast(seasonal), F.hour("h") == F.col("hod"))
        .select(
            (F.col("xc") - F.col("trend") - F.col("s_cents")).alias("r"),
            (F.col("xc") - F.col("trend")).alias("sr"),
            (F.col("xc") - F.col("s_cents")).alias("tr"),
        )
    )
    sums = parts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("s_r"),
        F.sum(F.col("r") * F.col("r")).alias("ss_r"),
        F.sum("sr").alias("s_sr"),
        F.sum(F.col("sr") * F.col("sr")).alias("ss_sr"),
        F.sum("tr").alias("s_tr"),
        F.sum(F.col("tr") * F.col("tr")).alias("ss_tr"),
    )
    n = F.col("n")
    var_r = (n * F.col("ss_r") - F.col("s_r") * F.col("s_r")).cast("double")
    var_sr = (n * F.col("ss_sr") - F.col("s_sr") * F.col("s_sr")).cast("double")
    var_tr = (n * F.col("ss_tr") - F.col("s_tr") * F.col("s_tr")).cast("double")
    return sums.select(
        "n",
        (
            F.round(F.greatest(F.lit(0.0), 1.0 - var_r / F.nullif(var_sr, F.lit(0.0))), 6)
            + F.lit(0.0)
        ).alias("strength_seasonal"),
        (
            F.round(F.greatest(F.lit(0.0), 1.0 - var_r / F.nullif(var_tr, F.lit(0.0))), 6)
            + F.lit(0.0)
        ).alias("strength_trend"),
    )


MARKOV_CUTOFF_DAY = 20  # transition model trains on days < 20, evaluates on >= 20


@query(
    "seq_markov_holdout",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_type, day(ts) AS d,
               epoch(date_trunc('second', ts))::BIGINT AS sec, event_id
        FROM events
    ),
    train_pairs AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id)
                   AS from_type,
               event_type AS to_type
        FROM ordered WHERE d < {MARKOV_CUTOFF_DAY}
    ),
    train AS (
        SELECT from_type, to_type, count(*)::BIGINT AS n_ft
        FROM train_pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
    ),
    train_from AS (
        SELECT from_type, sum(n_ft)::BIGINT AS n_f FROM train GROUP BY 1
    ),
    states AS (SELECT count(DISTINCT event_type)::BIGINT AS s FROM events),
    test_pairs AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id)
                   AS from_type,
               event_type AS to_type
        FROM ordered WHERE d >= {MARKOV_CUTOFF_DAY}
    ),
    test AS (
        SELECT from_type, to_type, count(*)::BIGINT AS n_obs
        FROM test_pairs WHERE from_type IS NOT NULL GROUP BY 1, 2
    ),
    scored AS (
        SELECT t.n_obs,
               t.n_obs * ln((coalesce(tr.n_ft, 0) + 1)::DOUBLE
                            / (coalesce(tf.n_f, 0) + s)) AS ll
        FROM test t
        LEFT JOIN train tr ON tr.from_type = t.from_type AND tr.to_type = t.to_type
        LEFT JOIN train_from tf ON tf.from_type = t.from_type
        CROSS JOIN states
    )
    SELECT (SELECT sum(n_ft)::BIGINT FROM train) AS n_train,
           sum(n_obs)::BIGINT AS n_test,
           round(-sum(ll) / sum(n_obs), 6) + 0.0 AS avg_nll,
           round(exp(-sum(ll) / sum(n_obs)), 6) + 0.0 AS perplexity
    FROM scored
    """,
    tags=("telemetry", "cep", "markov"),
)
def seq_markov_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the first-order transition model — the
    train/test hygiene seq_transition_matrix doesn't exercise: fit
    Laplace-smoothed transition probabilities p(to|from) = (n_ft + 1) /
    (n_f + S) on days < {MARKOV_CUTOFF_DAY}, score the average negative
    log-likelihood and perplexity of transitions on days >=
    {MARKOV_CUTOFF_DAY}. Perplexity is THE number a sequence model
    reports (corpus_perplexity_filter consumes exactly this quantity per
    document); computing it with a time-based split — never trained-on
    data — is the evaluation-leakage rule corpus_split_leakage_safe
    enforces for text, applied to event sequences. Smoothing keeps
    unseen test transitions finite (S = observed state count, computed
    from the data, not hardcoded).

    Sequences split BEFORE the lag window, so no transition straddles
    the cutoff (a straddling pair would leak one trained timestamp into
    test). Everything is counts until the final ln/exp fold —
    transcendental outputs, 6-dp aggregate round (rule 8), -0.0 guard
    (rule 17). Scale: two user-partitioned lag windows (the
    seq_transition_matrix shuffle), then all joins run on the <= S^2-row
    transition tables — model size is S^2 regardless of corpus."""
    ev = load(spark, sf_dir, "events")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.dayofmonth("ts").alias("d"),
        F.unix_timestamp(F.date_trunc("second", "ts")).alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")

    def pairs(frame: DataFrame) -> DataFrame:
        return (
            frame.select(
                F.lag("event_type").over(w).alias("from_type"),
                F.col("event_type").alias("to_type"),
            )
            .filter(F.col("from_type").isNotNull())
            .groupBy("from_type", "to_type")
        )

    train = pairs(ordered.filter(F.col("d") < MARKOV_CUTOFF_DAY)).agg(
        F.count(F.lit(1)).alias("n_ft")
    )
    train_from = train.groupBy("from_type").agg(F.sum("n_ft").alias("n_f"))
    states = ev.agg(F.countDistinct("event_type").alias("s"))
    test = pairs(ordered.filter(F.col("d") >= MARKOV_CUTOFF_DAY)).agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    scored = (
        test.join(F.broadcast(train), ["from_type", "to_type"], "left")
        .join(F.broadcast(train_from), "from_type", "left")
        .crossJoin(F.broadcast(states))
        .select(
            "n_obs",
            (
                F.col("n_obs")
                * F.log(
                    (F.coalesce(F.col("n_ft"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("n_f"), F.lit(0)) + F.col("s"))
                )
            ).alias("ll"),
        )
    )
    n_train = train.agg(F.sum("n_ft").alias("n_train"))
    avg_nll = -F.sum("ll") / F.sum("n_obs")
    return (
        scored.agg(
            F.sum("n_obs").alias("n_test"),
            (F.round(avg_nll, 6) + F.lit(0.0)).alias("avg_nll"),
            (F.round(F.exp(avg_nll), 6) + F.lit(0.0)).alias("perplexity"),
        )
        .crossJoin(F.broadcast(n_train))
        .select("n_train", "n_test", "avg_nll", "perplexity")
    )


# the four per-(user, day) activity measures the correlation matrix spans
_CORR_MEASURES = ("n_clicks", "n_views", "rev_cents", "n_errors")


@query(
    "profile_correlation_matrix",
    oracle="""
    WITH cells AS (
        SELECT user_id, day(ts) AS d,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
                   AS n_clicks,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
                   AS n_views,
               sum(CASE WHEN event_type = 'purchase'
                        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT
                   AS rev_cents,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
                   AS n_errors
        FROM events GROUP BY 1, 2
    ),
    long AS (
        SELECT user_id, d, m, x
        FROM cells UNPIVOT (x FOR m IN (n_clicks, n_views, rev_cents, n_errors))
    ),
    sums AS (
        SELECT a.m AS m1, b.m AS m2, count(*)::BIGINT AS n,
               sum(a.x)::BIGINT AS sx, sum(b.x)::BIGINT AS sy,
               sum(a.x * b.x)::BIGINT AS sxy,
               sum(a.x * a.x)::BIGINT AS sxx, sum(b.x * b.x)::BIGINT AS syy
        FROM long a
        JOIN long b ON a.user_id = b.user_id AND a.d = b.d AND a.m < b.m
        GROUP BY 1, 2
    )
    SELECT m1, m2, n,
           round((n * sxy - sx * sy)
                 / nullif(sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx)
                          * sqrt(n::DOUBLE * syy - sy::DOUBLE * sy), 0.0),
                 6) + 0.0 AS corr
    FROM sums
    """,
    tags=("profile", "stats"),
)
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix over the per-(user, day) activity
    measures — the profiling step that finds redundant features before
    training (two measures correlating at 0.98 shouldn't both enter a
    model) and surfaces behavioral structure (do errors track clicks?).
    Emits the upper triangle (m1 < m2 lexicographically, 6 pairs over 4
    measures) with exact BIGINT power sums per pair: the measures are
    integer counts/cents by construction, so n*Σxy − ΣxΣy is exact in
    both engines and the only float is the final 6-pair division
    (6-dp aggregate round, rule 8; -0.0 guard, rule 17 — the
    agg_correlation discipline, vectorized to a matrix).

    Shape: ONE partial-agg pass folds events into cells; the cells frame
    unpivots to long form map-side (explode — no shuffle) and the pair
    join keys on the NATURAL cell key (user_id, day) with m1 < m2 — a
    self-equi-join whose fan-out is exactly the 4-measure width, fully
    hash-partitionable (the first cut minted a surrogate row id with a
    global row_number window — a single-partition pass over all cells
    that measured 3.2x at the 10x decade; keying on the composite
    eliminated it, re-measured flat at 1.0x). Then one hash agg to 6
    rows. At 100 TB the
    measure width stays constant, so work is O(cells x width^2) with
    cells already reduced — the matrix never sees raw events."""
    ev = load(spark, sf_dir, "events")
    t = F.col("event_type")
    cells = ev.groupBy("user_id", F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.when(t == "click", 1).otherwise(0)).alias("n_clicks"),
        F.sum(F.when(t == "view", 1).otherwise(0)).alias("n_views"),
        F.sum(
            F.when(t == "purchase", F.floor(F.col("value") * 100 + 0.5).cast("long"))
            .otherwise(F.lit(0))
        ).alias("rev_cents"),
        F.sum(F.when(t == "error", 1).otherwise(0)).alias("n_errors"),
    )
    long = cells.select(
        "user_id",
        "d",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("m"), F.col(m).alias("x"))
                    for m in _CORR_MEASURES
                ]
            )
        ).alias("e"),
    ).select("user_id", "d", "e.m", "e.x")
    a = long.alias("a")
    b = long.alias("b")
    sums = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.d") == F.col("b.d"))
            & (F.col("a.m") < F.col("b.m")),
        )
        .groupBy(F.col("a.m").alias("m1"), F.col("b.m").alias("m2"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a.x").alias("sx"),
            F.sum("b.x").alias("sy"),
            F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"),
            F.sum(F.col("a.x") * F.col("a.x")).alias("sxx"),
            F.sum(F.col("b.x") * F.col("b.x")).alias("syy"),
        )
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        n.cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(
        n.cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    )
    return sums.select(
        "m1",
        "m2",
        "n",
        (F.round(num / F.nullif(den, F.lit(0.0)), 6) + F.lit(0.0)).alias("corr"),
    )


@query(
    "geo_dwell_segments",
    oracle=f"""
    WITH fixes AS (
        SELECT user_id,
               floor((fmod(value, 170.0) - 85.0) / {COTRAVEL_CELL_DEG})::BIGINT
                   AS latc,
               floor((fmod(event_id::DOUBLE, 360.0) - 180.0)
                     / {COTRAVEL_CELL_DEG})::BIGINT AS lonc,
               floor(epoch(ts))::BIGINT AS sec, event_id
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN lag(latc) OVER w IS NULL
                         OR lag(latc) OVER w != latc
                         OR lag(lonc) OVER w != lonc
                    THEN 1 ELSE 0 END AS new_seg
        FROM fixes WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    segs AS (
        SELECT user_id, latc, lonc,
               sum(new_seg) OVER (PARTITION BY user_id ORDER BY sec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS seg_id,
               sec
        FROM flagged
    ),
    dwell AS (
        SELECT user_id, latc, lonc, seg_id,
               (max(sec) - min(sec))::BIGINT AS dwell_sec,
               count(*)::BIGINT AS n_fixes
        FROM segs GROUP BY 1, 2, 3, 4
    )
    SELECT user_id, latc, lonc,
           count(*)::BIGINT AS n_visits,
           sum(dwell_sec)::BIGINT AS total_dwell_sec,
           max(dwell_sec)::BIGINT AS max_dwell_sec,
           sum(n_fixes)::BIGINT AS n_fixes
    FROM dwell GROUP BY 1, 2, 3
    """,
    tags=("telemetry", "geo"),
)
def geo_dwell_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time extraction — gaps-and-islands applied to SPACE: a visit
    is a maximal run of consecutive fixes in the same
    {COTRAVEL_CELL_DEG}-degree cell, and each (vehicle, cell) reports its
    visit count, total and longest dwell. The stop-detection primitive
    under trip segmentation, depot discovery (long max_dwell), and
    geofence billing — threshold_runs' island machinery with the run key
    being spatial instead of a numeric threshold.

    Same island algebra in both engines: a new segment opens when the
    lagged cell differs (or at the first fix), the running sum of flags
    names the segment, dwell = max(sec) − min(sec) per segment — all
    BIGINT (floor(epoch()) per rule 27). One user-keyed window shuffle
    does everything: lag, flag, running sum share the (user_id; sec,
    event_id) frame, then two hash aggs ride the same partitioning. At
    100 TB this partitions by vehicle exactly like trip_sessionize —
    embarrassingly parallel across the fleet."""
    ev = load(spark, sf_dir, "events")
    fixes = ev.select(
        "user_id",
        F.floor((F.col("value") % 170.0 - 85.0) / COTRAVEL_CELL_DEG).alias("latc"),
        F.floor(
            (F.col("event_id").cast("double") % 360.0 - 180.0) / COTRAVEL_CELL_DEG
        ).alias("lonc"),
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    new_seg = F.when(
        F.lag("latc").over(w).isNull()
        | (F.lag("latc").over(w) != F.col("latc"))
        | (F.lag("lonc").over(w) != F.col("lonc")),
        1,
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    segs = fixes.select(
        "user_id",
        "latc",
        "lonc",
        "sec",
        F.sum(new_seg).over(wrun).alias("seg_id"),
    )
    dwell = segs.groupBy("user_id", "latc", "lonc", "seg_id").agg(
        (F.max("sec") - F.min("sec")).alias("dwell_sec"),
        F.count(F.lit(1)).alias("n_fixes"),
    )
    return dwell.groupBy("user_id", "latc", "lonc").agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum("dwell_sec").alias("total_dwell_sec"),
        F.max("dwell_sec").alias("max_dwell_sec"),
        F.sum("n_fixes").alias("n_fixes"),
    )


# --- round 8: symbolic series (SAX) -----------------------------------------

SAX_W = 8  # PAA segments per user series == symbols per word


@query(
    "ts_sax",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
        FROM events GROUP BY 1, 2
    ),
    indexed AS (
        SELECT user_id, cents,
               row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS r,
               count(*) OVER (PARTITION BY user_id) AS n_days
        FROM daily
    ),
    paa AS (
        SELECT user_id, max(n_days)::BIGINT AS n_days,
               (r * {SAX_W}) // n_days AS seg,
               sum(cents) // count(*) AS m
        FROM indexed WHERE n_days >= {SAX_W}
        GROUP BY user_id, (r * {SAX_W}) // n_days
    ),
    stats AS (
        SELECT user_id, max(n_days)::BIGINT AS n_days,
               sum(m)::BIGINT AS s, sum(m * m)::BIGINT AS s2
        FROM paa GROUP BY user_id
    ),
    symbols AS (
        SELECT p.user_id, st.n_days, p.seg,
               CASE WHEN (st.s2 - st.s / {SAX_W}.0 * st.s) <= 0 THEN 'c'
                    WHEN (p.m - st.s / {SAX_W}.0)
                         < -0.6745 * sqrt((st.s2 - st.s / {SAX_W}.0 * st.s) / {SAX_W}.0)
                         THEN 'a'
                    WHEN (p.m - st.s / {SAX_W}.0) < 0 THEN 'b'
                    WHEN (p.m - st.s / {SAX_W}.0)
                         < 0.6745 * sqrt((st.s2 - st.s / {SAX_W}.0 * st.s) / {SAX_W}.0)
                         THEN 'c'
                    ELSE 'd' END AS sym
        FROM paa p JOIN stats st ON p.user_id = st.user_id
    )
    SELECT user_id, max(n_days)::BIGINT AS n_days,
           string_agg(sym, '' ORDER BY seg) AS sax_word
    FROM symbols GROUP BY user_id
    """,
    tags=("timeseries", "telemetry"),
)
def ts_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin/Keogh's Symbolic Aggregate approXimation) —
    each user's daily-spend series becomes an 8-letter word over {a,b,c,d}:
    PAA (piecewise aggregate) means per segment, z-normalized per series,
    then mapped to symbols at the standard-normal quartile breakpoints
    (±0.6745, 0). Words feed motif mining, series clustering, and
    anomaly-by-rare-word — the discrete handle on 100 TB of telemetry that
    makes shape questions ("which vehicles idle-spike-idle?") a GROUP BY.

    Cross-engine float discipline, stated because it is load-bearing:
    every input to the float stage is an EXACT integer (cents via rule
    17b, PAA means via integer floor-division, segment assignment via
    (r*W) div n), and from there the mean / variance / breakpoint
    comparisons are the SAME expression tree over the same 8 integers in
    both engines — bit-identical per rule 9's identical-fold argument, so
    the word column hash-matches without any rounding step. A zero
    -variance series (all segments equal) short-circuits to the center
    symbol before any division. Series shorter than SAX_W days are
    dropped (every segment must be non-empty for (r*W) div n to cover all
    W segments).

    Scale shape: two keyed aggregations (user-day rollup, then per-user
    segment PAA) and two tiny per-user reductions — everything partitions
    by user; no global sort, no window wider than one user's ≤ W segment
    rows after the day rollup."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    wday = Window.partitionBy("user_id").orderBy("day")
    indexed = daily.select(
        "user_id",
        "cents",
        (F.row_number().over(wday) - 1).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_days"),
    )
    paa = (
        indexed.filter(F.col("n_days") >= SAX_W)
        .groupBy("user_id", F.expr(f"r * {SAX_W} div n_days").alias("seg"))
        .agg(
            F.max("n_days").alias("n_days"),
            F.expr("sum(cents) div count(*)").alias("m"),
        )
    )
    stats = paa.groupBy("user_id").agg(
        F.max("n_days").alias("n_days"),
        F.sum("m").alias("s"),
        F.sum(F.col("m") * F.col("m")).alias("s2"),
    )
    joined = paa.drop("n_days").join(stats, "user_id")
    var_num = F.col("s2") - F.col("s") / float(SAX_W) * F.col("s")
    dev = F.col("m") - F.col("s") / float(SAX_W)
    sigma = F.sqrt(var_num / float(SAX_W))
    sym = (
        F.when(var_num <= 0, "c")
        .when(dev < -0.6745 * sigma, "a")
        .when(dev < 0, "b")
        .when(dev < 0.6745 * sigma, "c")
        .otherwise("d")
    )
    symbols = joined.select("user_id", "n_days", "seg", sym.alias("sym"))
    return symbols.groupBy("user_id").agg(
        F.max("n_days").alias("n_days"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "sym"))), lambda x: x["sym"]
            ),
            "",
        ).alias("sax_word"),
    )


# --- round 8: single-split changepoint (binary segmentation step) ----------


@query(
    "ts_changepoint_binseg",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
        FROM events GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, day, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
               sum(cents) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS s,
               sum(cents) OVER (PARTITION BY event_type)::BIGINT AS s_tot,
               count(*) OVER (PARTITION BY event_type) AS t
        FROM daily
    ),
    scored AS (
        SELECT event_type, day, i, s, s_tot, t,
               (s * t - s_tot * i) AS num,
               ((s * t - s_tot * i)::DOUBLE * (s * t - s_tot * i)::DOUBLE)
                   / (i * (t - i)) AS score
        FROM cum WHERE i < t
    ),
    best AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY score DESC, i ASC) AS rn
        FROM scored
    )
    SELECT event_type, t::BIGINT AS n_days, i::BIGINT AS tau_i,
           strftime(day, '%Y-%m-%d') AS tau_day,
           (s // i)::BIGINT AS left_mean_cents,
           ((s_tot - s) // (t - i))::BIGINT AS right_mean_cents,
           num::BIGINT AS split_num
    FROM best WHERE rn = 1
    """,
    tags=("timeseries", "telemetry"),
)
def ts_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-split changepoint detection — one step of binary segmentation
    (the classic recursive changepoint algorithm): for each event type's
    daily-revenue series, find the split day τ that maximizes the
    between-segment sum-of-squares reduction. With prefix sums S_i the
    CUSUM-style objective collapses to score(i) = (S_i·T − S_T·i)² /
    (i·(T−i)) — anomaly_cusum ALARMS when a drift crosses a threshold;
    this op LOCATES the structural break a fleet review asks about
    ("revenue regime changed on which day?"). Recursing on each side
    yields multi-changepoint segmentation; each recursion level is this
    same window pass over the previous level's segments.

    Determinism across engines: S_i, S_T, i, T and the split numerator
    are exact BIGINTs (cents, rule 17b); the only float is the score,
    built by the IDENTICAL expression tree from those exact integers in
    both engines (rule 9's identical-fold argument — num stays below 2^53
    here; production recentres the series by its global mean first, which
    keeps the numerator small at any scale, or lifts to DECIMAL), so the
    argmax row_number agrees bit-for-bit; exact score ties break on the
    earlier day. Output keeps only integer columns (segment means via
    floor division) — no float ever reaches the emitted schema.

    Scale shape: the series is |group|×|days| AFTER a partial-agg day
    rollup of the raw events — windows run per event_type over day counts
    (tiny), so the expensive part is one corpus scan + one keyed shuffle,
    identical to agg_quantile_histogram's cost model."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    word = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.row_number().over(word).alias("i"),
        F.sum("cents").over(word.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("s"),
        F.sum("cents").over(wall).alias("s_tot"),
        F.count(F.lit(1)).over(wall).alias("t"),
    )
    scored = cum.filter(F.col("i") < F.col("t")).select(
        "*",
        (F.col("s") * F.col("t") - F.col("s_tot") * F.col("i")).alias("num"),
        (
            (F.col("s") * F.col("t") - F.col("s_tot") * F.col("i")).cast("double")
            * (F.col("s") * F.col("t") - F.col("s_tot") * F.col("i")).cast("double")
            / (F.col("i") * (F.col("t") - F.col("i")))
        ).alias("score"),
    )
    wbest = Window.partitionBy("event_type").orderBy(F.col("score").desc(), F.col("i").asc())
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("t").cast("long").alias("n_days"),
            F.col("i").cast("long").alias("tau_i"),
            F.date_format("day", "yyyy-MM-dd").alias("tau_day"),
            F.expr("s div i").alias("left_mean_cents"),
            F.expr("(s_tot - s) div (t - i)").alias("right_mean_cents"),
            F.col("num").alias("split_num"),
        )
    )


# --- round 8: Poisson rate-surprise anomaly ----------------------------------

POISSON_SURPRISE_MIN = 3.0  # Chernoff-bound surprise threshold (~p < 0.05)


@query(
    "anomaly_rate_poisson",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*)::BIGINT AS k
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT event_type, day, k,
               sum(k) OVER (PARTITION BY event_type)::BIGINT AS total,
               count(*) OVER (PARTITION BY event_type) AS n_days
        FROM daily
    ),
    scored AS (
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, k,
               (total * 1000000 // n_days)::BIGINT AS lambda_ppm,
               CASE WHEN k * n_days > total
                    THEN k * ln(k * n_days / total::DOUBLE)
                         - (k - total / n_days::DOUBLE)
                    ELSE 0.0 END AS surprise
        FROM base
    )
    SELECT event_type, day, k, lambda_ppm,
           round(surprise, 6) + 0.0 AS surprise,
           (surprise > {POISSON_SURPRISE_MIN}) AS is_anomaly
    FROM scored
    """,
    tags=("timeseries", "anomaly"),
)
def anomaly_rate_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson rate-surprise anomaly — the COUNT-side member of the anomaly
    family (z-score and MAD watch values, CUSUM watches drift, seasonal
    naive watches calendar shape; THIS watches event RATES): each (type,
    day) count k is scored against the type's mean daily rate λ by the
    Poisson large-deviation exponent k·ln(k/λ) − (k − λ) — the Chernoff
    upper-bound exponent on P(X ≥ k), so `surprise > 3` ≈ tail
    probability below e⁻³ without any per-day variance estimate (rates
    are their own variance under Poisson — the property that makes this
    the standard alert rule for arrival streams).

    Cross-engine float discipline: k, total, n_days are exact integers;
    λ enters only through identical expression trees (k·n_days > total
    as the INTEGER spike gate, then one libm ln per flagged day), and the
    surprise is rounded at 6 dp with the −0.0 guard (rules 8/17). λ ships
    as integer ppm (rule 25).

    Scale: one day-rollup partial agg, two per-type window scalars over
    |days| rows — agg_quantile_histogram's cost model; the alert table
    is |types × days| regardless of event volume."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    wall = Window.partitionBy("event_type")
    base = daily.select(
        "event_type",
        "day",
        "k",
        F.sum("k").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
    )
    surprise = F.when(
        F.col("k") * F.col("n_days") > F.col("total"),
        F.col("k")
        * F.log(F.col("k") * F.col("n_days") / F.col("total").cast("double"))
        - (F.col("k") - F.col("total") / F.col("n_days").cast("double")),
    ).otherwise(F.lit(0.0))
    return base.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "k",
        F.expr("total * 1000000 div n_days").alias("lambda_ppm"),
        (F.round(surprise, 6) + 0.0).alias("surprise"),
        (surprise > POISSON_SURPRISE_MIN).alias("is_anomaly"),
    )


# --- round 9: blocked approximate matrix profile (motif discovery) -----------

MP_M = 4     # subsequence length (days) — the motif window
MP_SNM_W = 16  # sorted-neighborhood width within a block (candidates per row)


_MOTIF_BEST: dict[tuple[str, str], DataFrame] = {}


def motif_best_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-position nearest-neighbor frame (user_id, r, partner_user,
    partner_pos, ssd) — the approximate matrix profile itself, computed
    once per (session, sf_dir) and eagerly checkpointed (the graph-memo
    discipline): ts_motif_discovery reads its per-user MIN and
    anomaly_subsequence_discord its per-user MAX, so the candidate pass
    is paid once for both consumers.

    The octave block key wraps the 4-day cents sum in greatest(..., 1)
    in BOTH dialects (ADVICE r9): Spark's conv() treats a negative input
    as unsigned 64-bit (length ~64) while DuckDB's to_base() does not,
    so without the clamp the keys would diverge if a window's cents sum
    could reach <= -1 (fixture values are non-negative, but the key is
    now total rather than precondition-dependent)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _MOTIF_BEST:
        return _MOTIF_BEST[key]
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    wday = Window.partitionBy("user_id").orderBy("day")
    sub = daily.select(
        "user_id",
        (F.row_number().over(wday) - 1).alias("r"),
        F.col("cents").alias("c0"),
        F.lead("cents", 1).over(wday).alias("c1"),
        F.lead("cents", 2).over(wday).alias("c2"),
        F.lead("cents", 3).over(wday).alias("c3"),
    ).filter(F.col("c3").isNotNull())
    step = lambda a, b: (  # noqa: E731 — tiny local sign-symbol builder
        F.when(F.col(b) > F.col(a), "u").when(F.col(b) < F.col(a), "d").otherwise("f")
    )
    keyed = sub.select(
        "user_id",
        "r",
        "c0",
        "c1",
        "c2",
        "c3",
        F.concat(
            step("c0", "c1"),
            step("c1", "c2"),
            step("c2", "c3"),
            F.lit("|"),
            F.length(F.expr("conv(greatest(c0 + c1 + c2 + c3 + 1, 1), 10, 2)")).cast("string"),
        ).alias("blk"),
    )
    wblk = Window.partitionBy("blk").orderBy("c0", "c1", "c2", "c3", "user_id", "r")
    # idxed feeds BOTH sides of the band join below, and the a/b projections
    # differ, so ReusedExchange never fires — without a cache the whole
    # subtree (daily agg + two windows) executes twice. Caching it halves
    # the build (round 13, guide §1.2: interleaved A/B medians at sf0.1 —
    # 1.31 s cached vs 1.95 s uncached, rows identical); unpersisted after
    # the eager checkpoint materializes (the min_label_components hygiene
    # contract). Two join-free reformulations were measured SLOWER and
    # discarded (the dedup_simhash counter-experiment discipline): ±W
    # struct lead/lags (2W window frame processors, 6.8 s) and a
    # collect_list sliding frame + map-side array_min (2.8 s) — the
    # interpreted higher-order functions cost more than the exchanges
    # they remove at any SF the bench sees.
    idxed = keyed.withColumn("idx", F.row_number().over(wblk)).cache()
    # banded equi-join: probe side fans out to rank-buckets g-1, g, g+1 so
    # |idx_a - idx_b| <= W pairs all share an equi-key; never a block cross
    # product (the chunk-band / er_record_linkage discipline)
    a = idxed.select(
        F.col("user_id").alias("a_user"),
        F.col("r").alias("a_r"),
        F.col("c0").alias("a_c0"),
        F.col("c1").alias("a_c1"),
        F.col("c2").alias("a_c2"),
        F.col("c3").alias("a_c3"),
        "blk",
        F.col("idx").alias("a_idx"),
        F.explode(
            F.expr(
                f"array(idx div {MP_SNM_W} - 1, idx div {MP_SNM_W},"
                f" idx div {MP_SNM_W} + 1)"
            )
        ).alias("g"),
    )
    b = idxed.select(
        F.col("user_id").alias("partner_user"),
        F.col("r").alias("partner_pos"),
        F.col("c0").alias("b_c0"),
        F.col("c1").alias("b_c1"),
        F.col("c2").alias("b_c2"),
        F.col("c3").alias("b_c3"),
        F.col("blk").alias("b_blk"),
        F.col("idx").alias("b_idx"),
        F.expr(f"idx div {MP_SNM_W}").alias("b_g"),
    )
    ssd = sum(
        (F.col(f"a_c{i}") - F.col(f"b_c{i}")) * (F.col(f"a_c{i}") - F.col(f"b_c{i}"))
        for i in range(MP_M)
    )
    pairs = (
        a.join(b, (F.col("blk") == F.col("b_blk")) & (F.col("g") == F.col("b_g")))
        .filter(F.abs(F.col("a_idx") - F.col("b_idx")) <= MP_SNM_W)
        .filter(
            ~((F.col("a_user") == F.col("partner_user")) & (F.col("a_r") == F.col("partner_pos")))
        )
        .filter(
            ~(
                (F.col("a_user") == F.col("partner_user"))
                & (F.abs(F.col("a_r") - F.col("partner_pos")) < MP_M)
            )
        )
        .select(
            F.col("a_user").alias("user_id"),
            F.col("a_r").alias("r"),
            "partner_user",
            "partner_pos",
            ssd.cast("long").alias("ssd"),
        )
        # No dropDuplicates: a pair emitted from two shared g-buckets is a
        # FULL-ROW duplicate (ssd is a function of the pair), and the rn=1
        # window below orders by every output column, so duplicates can only
        # occupy rn=2+ of the same (user_id, r) partition — the kept row is
        # identical. Removing the dedup removes one full Exchange of the
        # pairs frame (guide §2.4; isolated build 3.09 -> 2.17 s at sf0.1,
        # output rows bit-identical).
    )
    wbest = Window.partitionBy("user_id", "r").orderBy(
        "ssd", "partner_user", "partner_pos"
    )
    best = pairs.withColumn("rn", F.row_number().over(wbest)).filter(F.col("rn") == 1)
    try:
        _MOTIF_BEST[key] = best.select(
            "user_id", "r", "partner_user", "partner_pos", "ssd"
        ).checkpoint(eager=True)
    finally:
        idxed.unpersist()
    return _MOTIF_BEST[key]


@query(
    "ts_motif_discovery",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
        FROM events GROUP BY 1, 2
    ),
    sub AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS r,
               cents AS c0,
               lead(cents, 1) OVER (PARTITION BY user_id ORDER BY day) AS c1,
               lead(cents, 2) OVER (PARTITION BY user_id ORDER BY day) AS c2,
               lead(cents, 3) OVER (PARTITION BY user_id ORDER BY day) AS c3
        FROM daily
    ),
    keyed AS (
        SELECT user_id, r, c0, c1, c2, c3,
               concat(
                   CASE WHEN c1 > c0 THEN 'u' WHEN c1 < c0 THEN 'd' ELSE 'f' END,
                   CASE WHEN c2 > c1 THEN 'u' WHEN c2 < c1 THEN 'd' ELSE 'f' END,
                   CASE WHEN c3 > c2 THEN 'u' WHEN c3 < c2 THEN 'd' ELSE 'f' END,
                   '|', length(to_base(greatest(c0 + c1 + c2 + c3 + 1, 1), 2))::VARCHAR
               ) AS blk
        FROM sub WHERE c3 IS NOT NULL
    ),
    idxed AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY blk ORDER BY c0, c1, c2, c3, user_id, r
               ) AS idx
        FROM keyed
    ),
    pairs AS (
        SELECT a.user_id, a.r,
               b.user_id AS partner_user, b.r AS partner_pos,
               ((a.c0 - b.c0) * (a.c0 - b.c0) + (a.c1 - b.c1) * (a.c1 - b.c1)
                + (a.c2 - b.c2) * (a.c2 - b.c2)
                + (a.c3 - b.c3) * (a.c3 - b.c3))::BIGINT AS ssd
        FROM idxed a JOIN idxed b
          ON a.blk = b.blk AND abs(a.idx - b.idx) <= {MP_SNM_W}
             AND NOT (a.user_id = b.user_id AND a.r = b.r)
        WHERE NOT (a.user_id = b.user_id AND abs(a.r - b.r) < {MP_M})
    ),
    best AS (
        SELECT user_id, r, partner_user, partner_pos, ssd,
               row_number() OVER (
                   PARTITION BY user_id, r
                   ORDER BY ssd, partner_user, partner_pos
               ) AS rn
        FROM pairs
    )
    SELECT user_id, r AS pos, partner_user, partner_pos, ssd AS ssd_cents2
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ssd, r, partner_user, partner_pos
               ) AS mrn
        FROM best WHERE rn = 1
    ) z WHERE mrn = 1
    """,
    tags=("timeseries", "telemetry", "similarity"),
)
def ts_motif_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked approximate MATRIX PROFILE (Yeh/Keogh's motif-discovery
    primitive) over per-user daily-spend series: for every length-MP_M
    subsequence, the nearest non-trivial neighbor (trivial = same series
    within MP_M positions, the standard exclusion zone); per user, the
    POSITION WHOSE NEIGHBOR IS CLOSEST is the series' top motif — 'this
    4-day spending shape recurs, here and there'. Exact STOMP is O(n²);
    the first cut of this op blocked on shape+octave alone and the
    decade probe TIMED OUT at sf0.1 — magnitude octaves concentrate, so
    in-block pairs went quadratic (the er_record_linkage lesson, caught
    by the per-op ritual). The registered plan therefore adds SORTED-
    NEIGHBORHOOD candidates (Hernandez-Stolfo SNM, the classic ER move):
    within each block — delta-sign pattern (27 shapes) concatenated with
    the total's octave coded as binary-string length (never float log2)
    — members are ranked lexicographically by (c0..c3), and each row is
    compared ONLY to the MP_SNM_W nearest ranks. Candidate volume is
    O(N·W) by construction at any scale; close subsequences sort
    adjacently (lex order on the raw values is a 4-D locality proxy
    inside a fixed shape/octave class), and a true nearest neighbor
    farther than W ranks away is missed BY DESIGN — the same priced
    trade as sim_topk_ann, stated not hidden.

    Exactness: distances are exact BIGINT sums of squared cents deltas
    (z-normalized MP needs per-window float stats; the un-normalized
    integer form is the hash-checkable twin); argmin and per-user motif
    selection carry full deterministic tiebreaks (rule 10). lead()
    windows build subsequences in ONE per-user pass; no arrays, no UDFs.

    Scale shape: day rollup and lead windows ride one user partitioning;
    the rank window partitions by block; the band join is an equi-join
    on (blk, rank-bucket) with ±1 probe groups (the chunk-band
    discipline) so candidates never enumerate a block's cross product.
    The twin uses the plain |Δidx| <= W predicate — same pairs, oracle
    clarity over oracle speed."""
    best = motif_best_frame(spark, sf_dir)
    wmotif = Window.partitionBy("user_id").orderBy(
        "ssd", "r", "partner_user", "partner_pos"
    )
    return (
        best.withColumn("mrn", F.row_number().over(wmotif))
        .filter(F.col("mrn") == 1)
        .select(
            "user_id",
            F.col("r").alias("pos"),
            "partner_user",
            "partner_pos",
            F.col("ssd").alias("ssd_cents2"),
        )
    )


@query(
    "anomaly_subsequence_discord",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
        FROM events GROUP BY 1, 2
    ),
    sub AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS r,
               cents AS c0,
               lead(cents, 1) OVER (PARTITION BY user_id ORDER BY day) AS c1,
               lead(cents, 2) OVER (PARTITION BY user_id ORDER BY day) AS c2,
               lead(cents, 3) OVER (PARTITION BY user_id ORDER BY day) AS c3
        FROM daily
    ),
    keyed AS (
        SELECT user_id, r, c0, c1, c2, c3,
               concat(
                   CASE WHEN c1 > c0 THEN 'u' WHEN c1 < c0 THEN 'd' ELSE 'f' END,
                   CASE WHEN c2 > c1 THEN 'u' WHEN c2 < c1 THEN 'd' ELSE 'f' END,
                   CASE WHEN c3 > c2 THEN 'u' WHEN c3 < c2 THEN 'd' ELSE 'f' END,
                   '|', length(to_base(greatest(c0 + c1 + c2 + c3 + 1, 1), 2))::VARCHAR
               ) AS blk
        FROM sub WHERE c3 IS NOT NULL
    ),
    idxed AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY blk ORDER BY c0, c1, c2, c3, user_id, r
               ) AS idx
        FROM keyed
    ),
    pairs AS (
        SELECT a.user_id, a.r,
               b.user_id AS partner_user, b.r AS partner_pos,
               ((a.c0 - b.c0) * (a.c0 - b.c0) + (a.c1 - b.c1) * (a.c1 - b.c1)
                + (a.c2 - b.c2) * (a.c2 - b.c2)
                + (a.c3 - b.c3) * (a.c3 - b.c3))::BIGINT AS ssd
        FROM idxed a JOIN idxed b
          ON a.blk = b.blk AND abs(a.idx - b.idx) <= {MP_SNM_W}
             AND NOT (a.user_id = b.user_id AND a.r = b.r)
        WHERE NOT (a.user_id = b.user_id AND abs(a.r - b.r) < {MP_M})
    ),
    best AS (
        SELECT user_id, r, partner_user, partner_pos, ssd,
               row_number() OVER (
                   PARTITION BY user_id, r
                   ORDER BY ssd, partner_user, partner_pos
               ) AS rn
        FROM pairs
    )
    SELECT user_id, r AS pos, partner_user, partner_pos, ssd AS ssd_cents2
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ssd DESC, r, partner_user, partner_pos
               ) AS mrn
        FROM best WHERE rn = 1
    ) z WHERE mrn = 1
    """,
    tags=("timeseries", "telemetry", "anomaly"),
)
def anomaly_subsequence_discord(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsequence DISCORD — the matrix profile's anomaly reading, the
    complement of ts_motif_discovery off the SAME memoized per-position
    nearest-neighbor frame (motif_best_frame — the candidate join is paid
    once per session for both consumers): per user, the position whose
    NEAREST neighbor is FARTHEST is the series' most anomalous 4-day
    shape ("nothing else ever looked like this week"), Keogh's discord
    definition. Approximation bound stated: candidates come from the SNM
    band, so a position with NO in-band candidate (so anomalous it sits
    alone in its shape/octave block) is absent from the frame and cannot
    be reported — the discord here is the max over MATCHED positions, a
    lower bound on the true discord distance; the blocking that makes the
    op linear is the same reason the most extreme outliers need the
    separate embed_outlier_score-style audit. Same exact-BIGINT SSD,
    same full tiebreaks (ssd DESC, then position/partner ids)."""
    best = motif_best_frame(spark, sf_dir)
    wdisc = Window.partitionBy("user_id").orderBy(
        F.col("ssd").desc(), F.col("r").asc(), "partner_user", "partner_pos"
    )
    return (
        best.withColumn("mrn", F.row_number().over(wdisc))
        .filter(F.col("mrn") == 1)
        .select(
            "user_id",
            F.col("r").alias("pos"),
            "partner_user",
            "partner_pos",
            F.col("ssd").alias("ssd_cents2"),
        )
    )


@query(
    "seq_longest_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               epoch(date_trunc('day', ts))::BIGINT // 86400 AS d
        FROM events
    ),
    islands AS (
        SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS isl
        FROM days
    ),
    streaks AS (
        SELECT user_id, isl,
               count(*)::BIGINT AS len,
               min(d)::BIGINT AS start_d
        FROM islands GROUP BY user_id, isl
    )
    SELECT user_id,
           count(*)::BIGINT AS n_streaks,
           sum(len)::BIGINT AS n_active_days,
           max(len)::BIGINT AS longest_streak,
           min(CASE WHEN len = (SELECT max(s2.len) FROM streaks s2
                                WHERE s2.user_id = streaks.user_id)
                    THEN start_d END)::BIGINT AS longest_start_day
    FROM streaks GROUP BY user_id
    """,
    tags=("telemetry", "sequence"),
)
def seq_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity STREAK per user — the engagement
    metric every retention dashboard carries (and the canonical
    gaps-and-islands exercise): distinct active days per user, islands of
    consecutive day indices keyed by d − row_number (consecutive days
    share the key because both advance by 1), island lengths, and per
    user the streak count, total active days, longest streak, and the
    day the longest streak began (earliest start on ties — rule 10). All
    exact integers: day index = floor epoch days (rule 27), no date
    arithmetic crosses an engine boundary.

    Shape: one distinct (user, day) rollup, one user-partitioned rank
    window riding the same partitioning, two keyed partial aggs. The
    same plan at 100 TB — nothing global, no window wider than one
    user's day list."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.expr("unix_timestamp(date_trunc('day', ts)) div 86400").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id", "d", (F.col("d") - F.row_number().over(w)).alias("isl")
    )
    streaks = islands.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("start_d")
    )
    wmax = Window.partitionBy("user_id")
    return (
        streaks.withColumn("max_len", F.max("len").over(wmax))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum("len").alias("n_active_days"),
            F.max("len").alias("longest_streak"),
            F.min(F.when(F.col("len") == F.col("max_len"), F.col("start_d"))).alias(
                "longest_start_day"
            ),
        )
    )


# --- round 10: seasonal-naive forecast backtest -------------------------------

FCST_SEASON = 7    # seasonal-naive lag (weekly)
FCST_HOLDOUT = 14  # trailing days scored as the holdout


@query(
    "ts_forecast_backtest",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, xc,
               lag(xc, {FCST_SEASON}) OVER (PARTITION BY event_type ORDER BY d)
                   AS fc,
               row_number() OVER (PARTITION BY event_type ORDER BY d DESC)
                   AS rev_rn
        FROM daily
    ),
    scored AS (SELECT * FROM idx WHERE fc IS NOT NULL),
    train AS (
        SELECT event_type, count(*)::BIGINT AS n_train,
               sum(abs(xc - fc))::BIGINT AS train_ae
        FROM scored WHERE rev_rn > {FCST_HOLDOUT} GROUP BY event_type
    ),
    hold AS (
        SELECT event_type, count(*)::BIGINT AS n_holdout,
               sum(abs(xc - fc))::BIGINT AS hold_ae,
               sum(2.0 * abs(xc - fc) / nullif(xc + fc, 0)) AS smape_sum
        FROM scored WHERE rev_rn <= {FCST_HOLDOUT} GROUP BY event_type
    )
    SELECT h.event_type, t.n_train, h.n_holdout,
           (h.hold_ae * 100 // h.n_holdout)::BIGINT AS mae_centicents,
           (h.hold_ae * t.n_train * 1000000
               // nullif(h.n_holdout * t.train_ae, 0))::BIGINT AS mase_ppm,
           round(h.smape_sum / h.n_holdout, 6) + 0.0 AS smape
    FROM hold h JOIN train t ON t.event_type = h.event_type
    """,
    tags=("telemetry", "timeseries", "eval"),
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST of the seasonal-naive baseline (ŷ_d = y_{{d-7}})
    — the evaluation harness every forecasting deployment runs before
    trusting a model: score the trailing FCST_HOLDOUT days per channel
    with MAE (exact integer centi-cents), MASE (holdout MAE over the
    IN-SAMPLE seasonal-naive MAE — Hyndman's scale-free standard: < 1
    beats the naive baseline ON TRAIN, the number that makes channels
    comparable), and sMAPE. Complements ts_holt_linear (which FITS a
    model) with the op that JUDGES one; the seasonal-naive forecaster
    is both the baseline and the MASE denominator, so the op is fully
    self-contained and deterministic.

    Exactness: daily revenue and absolute errors are exact BIGINT cents;
    MAE ships integer (centi-cents via ×100 div); MASE is a PURE RATIONAL
    of two exact-integer means, so it ships integer ppm (rule 28 — a 6dp
    float round could tie across the engines' HALF_UP/half-even split;
    exact for hold_ae·n_train ≲ 9·10¹² before the ×1e6); sMAPE's per-row
    2|a−f|/(a+f) is an exact-rational double per row (unrounded per-row
    per rule 5 — identical expression trees over exact ints are
    bit-identical), aggregate-rounded 6dp. Train/holdout split by a
    REVERSE rank per channel — all windows PARTITIONED by event_type
    over the day support.

    100 TB shape: one partial agg to (channel, day) cells; everything
    after runs on the calendar-bounded cell table."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))
    wday = Window.partitionBy("event_type").orderBy("d")
    wrev = Window.partitionBy("event_type").orderBy(F.col("d").desc())
    idx = daily.select(
        "event_type",
        "xc",
        F.lag("xc", FCST_SEASON).over(wday).alias("fc"),
        F.row_number().over(wrev).alias("rev_rn"),
    ).filter(F.col("fc").isNotNull())
    ae = F.abs(F.col("xc") - F.col("fc"))
    train = (
        idx.filter(F.col("rev_rn") > FCST_HOLDOUT)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_train"), F.sum(ae).alias("train_ae"))
    )
    hold = (
        idx.filter(F.col("rev_rn") <= FCST_HOLDOUT)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_holdout"),
            F.sum(ae).alias("hold_ae"),
            F.sum(
                2.0 * ae / F.expr("nullif(xc + fc, 0)")
            ).alias("smape_sum"),
        )
    )
    return hold.join(train, "event_type").select(
        "event_type",
        "n_train",
        "n_holdout",
        F.expr("hold_ae * 100 div n_holdout").alias("mae_centicents"),
        F.expr(
            "hold_ae * n_train * 1000000 div nullif(n_holdout * train_ae, 0)"
        ).alias("mase_ppm"),
        (F.round(F.col("smape_sum") / F.col("n_holdout"), 6) + F.lit(0.0)).alias(
            "smape"
        ),
    )


# --- round 10: seasonal ESD-style iterative anomaly removal -------------------

ESD_K = 5            # candidate anomalies removed per channel
ESD_THRESHOLD = 3.0  # |z| above this at removal time is flagged anomalous


def _esd_oracle_sql() -> str:
    """Generated chained-CTE twin of anomaly_seasonal_esd (the unigram /
    holt discipline): one (stats_k, flag_k, rem_k) CTE triple per unrolled
    removal round, derived from the same ESD_K constant as the Spark loop."""
    parts = [
        """WITH daily AS MATERIALIZED (
        SELECT event_type, date_trunc('day', ts) AS d,
               (epoch(date_trunc('day', ts))::BIGINT // 86400) % 7 AS dow,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2, 3
    ),
    season AS MATERIALIZED (
        SELECT event_type, dow,
               round(2 * median(xc))::BIGINT AS med2
        FROM daily GROUP BY event_type, dow
    ),
    rem_0 AS MATERIALIZED (
        SELECT d.event_type, strftime(d.d, '%Y-%m-%d') AS day,
               (2 * d.xc - s.med2)::BIGINT AS r2
        FROM daily d JOIN season s
          ON s.event_type = d.event_type AND s.dow = d.dow
    )"""
    ]
    for k in range(1, ESD_K + 1):
        parts.append(
            f""",
    stats_{k} AS MATERIALIZED (
        SELECT event_type, count(*)::BIGINT AS n,
               sum(r2)::BIGINT AS sr, sum(r2 * r2)::BIGINT AS srr
        FROM rem_{k - 1} GROUP BY event_type
    ),
    flag_{k} AS MATERIALIZED (
        SELECT event_type, day, r2, z
        FROM (
            SELECT r.event_type, r.day, r.r2,
                   abs(r.r2 - s.sr::DOUBLE / s.n)
                   / nullif(sqrt((s.srr - s.sr::DOUBLE * s.sr / s.n)
                                 / nullif(s.n - 1, 0)), 0) AS z,
                   row_number() OVER (
                       PARTITION BY r.event_type
                       ORDER BY abs(r.r2 - s.sr::DOUBLE / s.n)
                                / nullif(sqrt((s.srr - s.sr::DOUBLE * s.sr / s.n)
                                              / nullif(s.n - 1, 0)), 0) DESC,
                                r.day ASC) AS rn
            FROM rem_{k - 1} r JOIN stats_{k} s ON s.event_type = r.event_type
        ) q WHERE rn = 1 AND z IS NOT NULL
    ),
    rem_{k} AS MATERIALIZED (
        SELECT r.* FROM rem_{k - 1} r
        LEFT JOIN flag_{k} f ON f.event_type = r.event_type AND f.day = r.day
        WHERE f.day IS NULL
    )"""
        )
    flags = " UNION ALL ".join(
        f"SELECT event_type, day, r2, z, {k}::BIGINT AS iteration FROM flag_{k}"
        for k in range(1, ESD_K + 1)
    )
    parts.append(
        f"""
    SELECT event_type, iteration, day, r2 AS resid2,
           round(z, 4) + 0.0 AS z_score,
           (z > {ESD_THRESHOLD}) AS is_anomaly
    FROM ({flags}) u"""
    )
    return "".join(parts)



# Scale probe for the ESD driver fold (optimization round 13, VERDICT r12
# item 1 — the CC_DRIVER_MAX_EDGES / UNI_DRIVER_MAX_WORDS contract): the
# residual frame is |channels| x |days| cells after the daily partial agg —
# calendar-bounded for a fixed channel universe, but an IoT-style channel
# explosion at 100 TB makes |channels| corpus-scale, so the collect must be
# gated, not assumed. Memory rationale for the bound: each collected cell is
# a (event_type str, day str, int) tuple ≈ ~220 B of Python objects, so
# 500 k cells ≈ ~110 MB driver RSS (plus the per-channel stats dict, which
# is |channels|-sized) — comfortably inside the local driver and far below
# spark.driver.maxResultSize. Above the bound the distributed
# driver-coordinated rounds below run instead (per round: one groupBy over
# the checkpointed cells + ONE |channels|-row argmax collect — coordinator-
# plane data only, never cell rows).
ESD_DRIVER_MAX_CELLS = 500_000


def _esd_extract(
    spark: SparkSession,
    daily: DataFrame,
    driver_max_cells: int = ESD_DRIVER_MAX_CELLS,
) -> DataFrame:
    """The shared ESD extraction consumed by anomaly_seasonal_esd (batch)
    and stream_seasonal_esd (streaming twin): given (event_type, d, dow, xc)
    daily cells, deseasonalize by the per-weekday doubled median and run
    ESD_K driver-coordinated max-deviate removal rounds. Both ops riding
    ONE helper is the no-drift guarantee the reconciliation property pins
    (VERDICT r10 item 6).

    ``driver_max_cells``: cell bound for the driver fold (see
    ESD_DRIVER_MAX_CELLS); pass 0 to force the distributed rounds (the
    forced-path equivalence test does — `> 0 and` keeps the forcing
    contract honest on an empty frame, the ADVICE r12 count()==0 trap)."""
    from ..session import ensure_checkpoint_dir

    ensure_checkpoint_dir(spark)
    season = daily.groupBy("event_type", "dow").agg(
        F.round(2 * F.median("xc")).cast("long").alias("med2")
    )
    rem = (
        daily.join(season, ["event_type", "dow"])
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            (2 * F.col("xc") - F.col("med2")).alias("r2"),
        )
        .checkpoint(eager=True)
    )
    # The count doubles as the scale probe — one cheap job over the frame
    # the rounds read anyway (the min_label_components discipline).
    if not (0 < rem.count() <= driver_max_cells):
        return _esd_extract_distributed(spark, rem)
    # Below the bound: collect the cell frame ONCE and run the ESD_K
    # max-deviate rounds on the driver (guide §1.2/§5: the distributed pass
    # already reduced the corpus to metadata scale; the round-12 bench
    # measured the previous per-round Spark jobs at ~0.6-0.9 s EACH over
    # this ~200-row frame — pure planning/codegen, not data). Every float op
    # below replicates the distributed expression tree exactly (long->double
    # casts, division order, IEEE sqrt/abs), and all sums are exact
    # integers, so each round's z values and argmax are bit-identical —
    # pinned by the forced-path equivalence test (tests/test_round13).
    import math

    cells = [
        (r["event_type"], r["day"], r["r2"]) for r in rem.collect()
    ]
    excluded: set[tuple[str, str]] = set()
    out_rows = []
    for k in range(1, ESD_K + 1):
        stats: dict[str, tuple[int, int, int]] = {}
        for et, day, r2 in cells:
            if (et, day) in excluded:
                continue
            n_, sr, srr = stats.get(et, (0, 0, 0))
            stats[et] = (n_ + 1, sr + r2, srr + r2 * r2)
        best: dict[str, tuple[float, str, int]] = {}
        for et, day, r2 in cells:
            if (et, day) in excluded:
                continue
            n_, sr, srr = stats[et]
            if n_ <= 1:
                continue  # nullif(n-1, 0) -> null z in the Spark tree
            var = (float(srr) - float(sr) * float(sr) / n_) / (n_ - 1)
            if var < 0:
                continue  # sqrt(neg) -> NaN never occurs on integer moments
            sd = math.sqrt(var)
            if sd == 0.0:
                continue  # nullif(sd, 0.0) -> null z in the Spark tree
            z = abs(float(r2) - float(sr) / n_) / sd
            cur = best.get(et)
            if cur is None or z > cur[0] or (z == cur[0] and day < cur[1]):
                best[et] = (z, day, r2)
        for et in best:
            z, day, r2 = best[et]
            excluded.add((et, day))
            out_rows.append((et, k, day, r2, z))
    out = spark.createDataFrame(
        out_rows, "event_type string, iteration long, day string,"
        " resid2 long, z double"
    )
    return out.select(
        "event_type",
        "iteration",
        "day",
        "resid2",
        (F.round(F.col("z"), 4) + F.lit(0.0)).alias("z_score"),
        (F.col("z") > ESD_THRESHOLD).alias("is_anomaly"),
    )


def _esd_extract_distributed(spark: SparkSession, rem: DataFrame) -> DataFrame:
    """The above-bound ESD path (restored behind the ESD_DRIVER_MAX_CELLS
    gate — VERDICT r12 item 1): ESD_K driver-COORDINATED rounds over the
    checkpointed (event_type, day, r2) cell frame. Each round is one
    groupBy-moments aggregate + broadcast join + per-channel rank window,
    and collects only the |channels|-row argmax flags (coordinator-plane
    literals for the next round's exclusion filter — never cell data), so
    driver state is O(ESD_K * |channels|) regardless of cell count. The
    expression tree is the one the driver fold replicates (exact integer
    moments, long->double casts, IEEE sqrt/abs, (z desc, day asc) argmax),
    so both paths emit bit-identical rows — pinned by the forced-path
    equivalence test."""
    excluded: list[tuple[str, str]] = []  # (event_type, day) literals
    out_rows = []
    for k in range(1, ESD_K + 1):
        cur = rem
        for et, day in excluded:
            cur = cur.filter(
                ~((F.col("event_type") == et) & (F.col("day") == day))
            )
        stats = cur.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("r2").alias("sr"),
            F.sum(F.col("r2") * F.col("r2")).alias("srr"),
        )
        z = F.abs(F.col("r2") - F.col("sr").cast("double") / F.col("n")) / F.nullif(
            F.sqrt(
                (F.col("srr") - F.col("sr").cast("double") * F.col("sr") / F.col("n"))
                / F.nullif(F.col("n") - 1, F.lit(0))
            ),
            F.lit(0.0),
        )
        wch = Window.partitionBy("event_type").orderBy(
            F.col("z").desc(), F.col("day").asc()
        )
        flag_rows = (
            cur.join(F.broadcast(stats), "event_type")
            .select("event_type", "day", "r2", z.alias("z"))
            .withColumn("rn", F.row_number().over(wch))
            .filter((F.col("rn") == 1) & F.col("z").isNotNull())
            .select("event_type", "day", "r2", "z")
            .collect()
        )
        for r in flag_rows:
            excluded.append((r["event_type"], r["day"]))
            out_rows.append(
                (r["event_type"], k, r["day"], r["r2"], float(r["z"]))
            )
    out = spark.createDataFrame(
        out_rows, "event_type string, iteration long, day string,"
        " resid2 long, z double"
    )
    return out.select(
        "event_type",
        "iteration",
        "day",
        "resid2",
        (F.round(F.col("z"), 4) + F.lit(0.0)).alias("z_score"),
        (F.col("z") > ESD_THRESHOLD).alias("is_anomaly"),
    )


@query(
    "anomaly_seasonal_esd",
    oracle=_esd_oracle_sql(),
    tags=("telemetry", "timeseries", "anomaly"),
)
def anomaly_seasonal_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal ESD-style anomaly extraction (the Twitter
    AnomalyDetection shape): deseasonalize daily channel revenue by the
    per-weekday MEDIAN (robust — a mean would absorb the very anomalies
    we hunt), then run ESD_K rounds of iterative max-deviate removal —
    each round recomputes mean/σ over the REMAINING residuals and
    extracts the largest |z| point, which is the property that makes ESD
    robust to masking (one huge outlier inflating σ and hiding the
    second). Emits every extracted candidate with its removal-time z and
    an is_anomaly flag at |z| > ESD_THRESHOLD (the textbook critical
    values need t-quantiles; the fixed threshold is stated, not hidden).

    Exactness: daily cents and DOUBLED residuals r2 = 2·x − 2·median are
    exact BIGINTs (the ×2 absorbs the even-count median's .5 — both
    engines average the two middle values identically); weekday comes
    from epoch-day % 7 (NEVER dayofweek — Spark is 1-7, DuckDB 0-6, the
    profile_activity_matrix trap); per-round mean/σ from exact integer
    moment sums (identical trees, rule 9); z rounded 4dp at output only
    (rule 8); argmax tie-broken by day ASC. The unroll is ESD_K chained
    (stats, flag, remainder) frames over the channel×day cell table —
    calendar-bounded, each round eagerly checkpointed (the unigram /
    graph_hits lesson: flag_k is referenced by both the output union and
    rem_k). Oracle is the generated chained-CTE twin from the same
    constant.

    Execution shape (the ml_logreg_train driver-coordination pattern):
    the residual cell frame is checkpointed ONCE; each round's argmax
    flag is ONE |channels|-row collect (coordinator-plane — O(K·C) rows
    total, never row data), and the next round filters by those literal
    (channel, day) exclusions against the SAME checkpointed frame — so
    the plan stays depth-1 instead of a 3·ESD_K checkpoint chain.

    100 TB shape: one partial agg to (channel, day, dow) cells;
    everything after runs on the calendar-bounded frame."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("d"),
        (F.expr("unix_timestamp(date_trunc('day', ts)) div 86400") % 7).alias("dow"),
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))
    return _esd_extract(spark, daily)


PGRAM_PMIN = 2    # candidate periods (days) swept by the periodogram
PGRAM_PMAX = 14   # covers the weekly cycle and its neighbors

# 2*pi as an exact double literal shared by BOTH dialects (Spark has no pi();
# an identical literal guarantees identical cos/sin inputs, the haversine
# bit-identical-tree precedent)
TWO_PI = "6.283185307179586"


@query(
    "ts_periodogram",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, xc,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
        FROM daily
    ),
    st AS (
        SELECT event_type, count(*)::BIGINT AS n, sum(xc)::BIGINT AS sr
        FROM idx GROUP BY event_type
    ),
    proj AS (
        SELECT i.event_type, p.period,
               sum((i.xc - s.sr::DOUBLE / s.n)
                   * cos({TWO_PI} * i.t / p.period)) AS sc,
               sum((i.xc - s.sr::DOUBLE / s.n)
                   * sin({TWO_PI} * i.t / p.period)) AS ss
        FROM idx i
        JOIN st s ON s.event_type = i.event_type
        CROSS JOIN (SELECT unnest(generate_series({PGRAM_PMIN}, {PGRAM_PMAX}))
                    AS period) p
        GROUP BY i.event_type, p.period
    ),
    pw AS (
        SELECT event_type, period, sc * sc + ss * ss AS power,
               sum(sc * sc + ss * ss) OVER (PARTITION BY event_type) AS tot,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY sc * sc + ss * ss DESC,
                                           period ASC) AS rn
        FROM proj
    )
    SELECT event_type, period::BIGINT AS period,
           round(power / nullif(tot, 0), 6) + 0.0 AS power_share,
           (rn = 1) AS is_dominant
    FROM pw
    """,
    tags=("telemetry", "timeseries"),
)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram over candidate integer periods — the FREQUENCY-domain
    lens the time-series suite lacked (ts_autocorrelation answers "is
    yesterday informative", ts_seasonal_strength assumes the weekly cycle;
    this op DETECTS the cycle): per channel, project the mean-centered
    daily revenue onto cos/sin at periods PGRAM_PMIN..PGRAM_PMAX and emit
    each period's share of total sweep power plus the dominant-period
    flag — the Schuster periodogram restricted to the integer periods a
    calendar process can express.

    Cross-engine discipline: day index and period are exact integers, the
    centered value is a rational of exact BIGINT sums (rule 9), and the
    cos/sin inputs are built from ONE shared 2*pi literal so both engines
    evaluate identical expression trees (the haversine precedent; Spark
    has no pi()); power shares are aggregate-rounded 6dp (rules 1/6/8)
    and the argmax tie-breaks (power desc, period asc) over the
    |periods|-row frame.

    At 100 TB: one partial agg to (channel, day) cells; the projection is
    |cells| x |periods| rows map-side into a per-(channel, period) fold;
    windows run over |channels| x |periods| rows. Nothing scales with raw
    events."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))
    widx = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type", "xc", F.row_number().over(widx).alias("t")
    )
    st = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xc").alias("sr")
    )
    proj = (
        idx.join(st, "event_type")
        .select(
            "event_type",
            "xc",
            "t",
            "n",
            "sr",
            F.explode(
                F.sequence(F.lit(PGRAM_PMIN), F.lit(PGRAM_PMAX))
            ).alias("period"),
        )
        .groupBy("event_type", "period")
        .agg(
            F.sum(
                (F.col("xc") - F.col("sr").cast("double") / F.col("n"))
                * F.expr(f"cos({TWO_PI} * t / period)")
            ).alias("sc"),
            F.sum(
                (F.col("xc") - F.col("sr").cast("double") / F.col("n"))
                * F.expr(f"sin({TWO_PI} * t / period)")
            ).alias("ss"),
        )
    )
    power = F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")
    wtot = Window.partitionBy("event_type")
    wrank = Window.partitionBy("event_type").orderBy(
        power.desc(), F.col("period").asc()
    )
    pw = proj.select(
        "event_type",
        F.col("period").cast("long").alias("period"),
        power.alias("power"),
        F.sum(power).over(wtot).alias("tot"),
        F.row_number().over(wrank).alias("rn"),
    )
    return pw.select(
        "event_type",
        "period",
        (
            F.round(F.col("power") / F.nullif(F.col("tot"), F.lit(0.0)), 6)
            + F.lit(0.0)
        ).alias("power_share"),
        (F.col("rn") == 1).alias("is_dominant"),
    )


FUNNEL_W_SEC = 3600  # the whole chain must fit in one hour


@query(
    "seq_window_funnel",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS t
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (SELECT user_id, t AS tv FROM ev WHERE event_type = 'view'),
    c AS (SELECT user_id, t AS tc FROM ev WHERE event_type = 'click'),
    p AS (SELECT user_id, t AS tp FROM ev WHERE event_type = 'purchase'),
    vc AS (
        SELECT v.user_id, v.tv, min(c.tc)::BIGINT AS ec
        FROM v JOIN c ON c.user_id = v.user_id AND c.tc > v.tv
        GROUP BY v.user_id, v.tv
    ),
    vcp AS (
        SELECT vc.user_id, vc.tv, vc.ec, min(p.tp)::BIGINT AS ep
        FROM vc JOIN p ON p.user_id = vc.user_id AND p.tp > vc.ec
        GROUP BY vc.user_id, vc.tv, vc.ec
    ),
    per_view AS (
        SELECT v.user_id, v.tv,
               CASE WHEN vcp.ep IS NOT NULL
                         AND vcp.ep <= v.tv + {FUNNEL_W_SEC} THEN 3
                    WHEN vc.ec IS NOT NULL
                         AND vc.ec <= v.tv + {FUNNEL_W_SEC} THEN 2
                    ELSE 1 END AS depth
        FROM v
        LEFT JOIN vc ON vc.user_id = v.user_id AND vc.tv = v.tv
        LEFT JOIN vcp ON vcp.user_id = v.user_id AND vcp.tv = v.tv
    ),
    per_user AS (
        SELECT u.user_id, COALESCE(max(pv.depth), 0)::BIGINT AS depth
        FROM (SELECT DISTINCT user_id FROM ev) u
        LEFT JOIN per_view pv ON pv.user_id = u.user_id
        GROUP BY u.user_id
    ),
    tot AS (SELECT count(*)::BIGINT AS n FROM per_user)
    SELECT pu.depth, count(*)::BIGINT AS n_users,
           (count(*) * 1000000 // any_value(t.n))::BIGINT AS share_ppm
    FROM per_user pu CROSS JOIN tot t
    GROUP BY pu.depth
    """,
    tags=("telemetry", "sequence", "funnel"),
)
def seq_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-CONSTRAINED funnel (the ClickHouse windowFunnel semantics —
    event_funnel's ordered conversion has no deadline; real funnels do):
    a user reaches depth 3 iff some view < click < purchase chain with
    strictly increasing timestamps FITS INSIDE FUNNEL_W_SEC of the chain's
    first event; depth 2 for view -> click inside the window; depth 1 for
    any view; 0 otherwise. Emits the depth histogram with exact share ppm.

    The chain search is GREEDY-EARLIEST and provably optimal: for a fixed
    view, taking the EARLIEST later click (and then the earliest later
    purchase) can only leave more room under the deadline, so a chain
    exists iff the greedy one fits — pinned against a brute-force python
    replica over all triples. That turns the exponential chain search
    into two (join + min) stages: per (user, view) the earliest later
    click, per that the earliest later purchase — every join an equi-join
    on user_id with a time residual, every timestamp an exact epoch-
    second BIGINT (rule 27: floor(epoch)).

    At 100 TB the per-user view x click pairing bounds at (events per
    user)^2 before the min collapses it; heavy-hitter users get the
    SNM-style time banding (join on (user, hour-bucket +/- 1) — the
    geo_cotravel convention) without changing semantics."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("t"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("t").alias("tv")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("t").alias("tc")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("t").alias("tp")
    )
    vc = (
        v.join(c, (F.col("c_uid") == F.col("user_id")) & (F.col("tc") > F.col("tv")))
        .groupBy("user_id", "tv")
        .agg(F.min("tc").alias("ec"))
    )
    vcp = (
        vc.join(
            p, (F.col("p_uid") == F.col("user_id")) & (F.col("tp") > F.col("ec"))
        )
        .groupBy("user_id", "tv", "ec")
        .agg(F.min("tp").alias("ep"))
    )
    per_view = (
        v.join(vc, ["user_id", "tv"], "left")
        .join(vcp.select("user_id", "tv", "ep"), ["user_id", "tv"], "left")
        .select(
            "user_id",
            F.when(
                F.col("ep").isNotNull()
                & (F.col("ep") <= F.col("tv") + FUNNEL_W_SEC),
                3,
            )
            .when(
                F.col("ec").isNotNull()
                & (F.col("ec") <= F.col("tv") + FUNNEL_W_SEC),
                2,
            )
            .otherwise(1)
            .alias("depth"),
        )
    )
    per_user = (
        ev.select("user_id")
        .distinct()
        .join(per_view, "user_id", "left")
        .groupBy("user_id")
        .agg(F.coalesce(F.max("depth"), F.lit(0)).cast("long").alias("depth"))
    )
    tot = per_user.agg(F.count(F.lit(1)).alias("n"))
    return (
        per_user.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "depth",
            "n_users",
            F.expr("n_users * 1000000 div n").alias("share_ppm"),
        )
    )


@query(
    "ts_theil_sen",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, xc,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
        FROM daily
    ),
    pairs AS (
        SELECT a.event_type,
               (b.xc - a.xc)::DOUBLE / (b.t - a.t) AS slope,
               a.t AS t1, b.t AS t2
        FROM idx a JOIN idx b
          ON b.event_type = a.event_type AND b.t > a.t
    ),
    ranked AS (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope, t1, t2) AS rn,
               count(*) OVER (PARTITION BY event_type)::BIGINT AS np
        FROM pairs
    ),
    med AS (
        SELECT event_type, any_value(np)::BIGINT AS n_pairs,
               avg(slope) AS ts_slope
        FROM ranked
        WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
        GROUP BY event_type
    ),
    ols AS (
        SELECT event_type, count(*)::BIGINT AS n_days,
               sum(t)::BIGINT AS st, sum(xc)::BIGINT AS sx,
               sum(t * t)::BIGINT AS stt, sum(t * xc)::BIGINT AS stx
        FROM idx GROUP BY event_type
    )
    SELECT m.event_type, o.n_days, m.n_pairs,
           round(m.ts_slope, 6) + 0.0 AS slope_theilsen,
           round((o.n_days::DOUBLE * o.stx - o.st::DOUBLE * o.sx)
                 / nullif(o.n_days::DOUBLE * o.stt - o.st::DOUBLE * o.st, 0),
                 6) + 0.0 AS slope_ols
    FROM med m JOIN ols o ON o.event_type = m.event_type
    """,
    tags=("telemetry", "timeseries", "stats"),
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend — the median of ALL pairwise slopes, the
    estimator that survives ~29% contamination where OLS (win_regression_
    slope's machinery) chases a single corrupted day; emitted next to the
    OLS slope so the robust-vs-classical gap is the anomaly signal
    itself. Exactly the textbook estimator, not an approximation: every
    pairwise slope is a rational of exact BIGINTs over the CALENDAR-
    BOUNDED day support (days^2/2 pairs per channel — the self-join never
    touches raw events), slopes are bit-identical across engines, and the
    median is an order-statistic pick (rank window PARTITIONED by
    channel, ties broken (t1, t2)) of those identical values — averaging
    the two middles on even counts, 6dp at output (rules 1/6/8).

    At 100 TB: one partial agg to (channel, day) cells; the pair
    self-join is |days|^2 per channel, a constant of the calendar, and
    the rank window is channel-partitioned."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))
    widx = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type", "xc", F.row_number().over(widx).alias("t")
    )
    b = idx.select(
        F.col("event_type").alias("b_et"),
        F.col("xc").alias("b_xc"),
        F.col("t").alias("t2"),
    )
    pairs = idx.join(
        b, (F.col("b_et") == F.col("event_type")) & (F.col("t2") > F.col("t"))
    ).select(
        "event_type",
        ((F.col("b_xc") - F.col("xc")).cast("double") / (F.col("t2") - F.col("t"))).alias("slope"),
        F.col("t").alias("t1"),
        "t2",
    )
    wrank = Window.partitionBy("event_type").orderBy("slope", "t1", "t2")
    wall = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("np"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.expr("(np + 1) div 2"))
            | (F.col("rn") == F.expr("np div 2 + 1"))
        )
        .groupBy("event_type")
        .agg(F.max("np").alias("n_pairs"), F.avg("slope").alias("ts_slope"))
    )
    ols = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("t").alias("st"),
        F.sum("xc").alias("sx"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("xc")).alias("stx"),
    )
    ols_slope = (
        F.col("n_days").cast("double") * F.col("stx")
        - F.col("st").cast("double") * F.col("sx")
    ) / F.nullif(
        F.col("n_days").cast("double") * F.col("stt")
        - F.col("st").cast("double") * F.col("st"),
        F.lit(0.0),
    )
    return med.join(ols, "event_type").select(
        "event_type",
        "n_days",
        "n_pairs",
        (F.round(F.col("ts_slope"), 6) + F.lit(0.0)).alias("slope_theilsen"),
        (F.round(ols_slope, 6) + F.lit(0.0)).alias("slope_ols"),
    )


DF_CRIT_5PCT_X100 = -286  # Dickey-Fuller 5% critical value (no trend), x100


@query(
    "ts_unit_root_df",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, xc,
               lag(xc) OVER (PARTITION BY event_type ORDER BY d) AS xl
        FROM daily
    ),
    obs AS (
        SELECT event_type, (xc - xl)::BIGINT AS dy, xl AS x
        FROM idx WHERE xl IS NOT NULL
    ),
    sums AS (
        SELECT event_type, count(*)::BIGINT AS n,
               sum(x)::BIGINT AS sx, sum(dy)::BIGINT AS sy,
               sum(x * x)::BIGINT AS sxx, sum(x * dy)::BIGINT AS sxy,
               sum(dy * dy)::BIGINT AS syy
        FROM obs GROUP BY event_type
    )
    SELECT event_type, n,
           round((n::DOUBLE * sxy - sx::DOUBLE * sy)
                 / nullif(n::DOUBLE * sxx - sx::DOUBLE * sx, 0), 6) + 0.0
               AS gamma_hat,
           round(((n::DOUBLE * sxy - sx::DOUBLE * sy)
                  / nullif(n::DOUBLE * sxx - sx::DOUBLE * sx, 0))
                 / nullif(sqrt(
                     ((syy - sy::DOUBLE * sy / n)
                      - ((n::DOUBLE * sxy - sx::DOUBLE * sy)
                         / nullif(n::DOUBLE * sxx - sx::DOUBLE * sx, 0))
                        * (sxy - sx::DOUBLE * sy / n))
                     / (n - 2)
                     / (sxx - sx::DOUBLE * sx / n)), 0), 4) + 0.0 AS t_stat,
           (((n::DOUBLE * sxy - sx::DOUBLE * sy)
             / nullif(n::DOUBLE * sxx - sx::DOUBLE * sx, 0))
            / nullif(sqrt(
                ((syy - sy::DOUBLE * sy / n)
                 - ((n::DOUBLE * sxy - sx::DOUBLE * sy)
                    / nullif(n::DOUBLE * sxx - sx::DOUBLE * sx, 0))
                   * (sxy - sx::DOUBLE * sy / n))
                / (n - 2)
                / (sxx - sx::DOUBLE * sx / n)), 0)
            < {DF_CRIT_5PCT_X100} / 100.0) AS stationary_5pct
    FROM sums
    """,
    tags=("telemetry", "timeseries", "stats"),
)
def ts_unit_root_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (drift form, no augmentation) — the
    stationarity gate a forecasting pipeline runs before trusting
    mean-reverting models (ts_holt_linear fits a trend; this asks
    whether differencing is needed at all): regress the day-over-day
    change on the lagged level, dy_t = alpha + gamma * x_(t-1) + e_t;
    gamma == 0 is the random-walk null, and the t-statistic on gamma is
    compared against the stated DF 5% critical value (-2.86 for the
    drift case — a DF table constant, not a normal quantile; stated x100
    integer).

    Exactness: daily cents, differences and all five regression moments
    are exact BIGINT folds per channel; gamma/t are rationals of those
    ints in the |channels|-row readout (6dp/4dp, rules 1/6/8); the
    verdict is a float comparison against an exact constant — ulp-safe
    because a t-stat landing exactly on -2.86 has measure zero and the
    fixture's verdicts sit far from the boundary (pinned).

    At 100 TB: one partial agg to cells, one lag window over the
    calendar-bounded day support per channel, one fold."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))
    widx = Window.partitionBy("event_type").orderBy("d")
    obs = (
        daily.select(
            "event_type", "xc", F.lag("xc").over(widx).alias("xl")
        )
        .filter(F.col("xl").isNotNull())
        .select(
            "event_type",
            (F.col("xc") - F.col("xl")).alias("dy"),
            F.col("xl").alias("x"),
        )
    )
    sums = obs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    nf = F.col("n").cast("double")
    gamma = (nf * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / F.nullif(
        nf * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"), F.lit(0.0)
    )
    sse = (
        (F.col("syy") - F.col("sy").cast("double") * F.col("sy") / F.col("n"))
        - gamma * (F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
    )
    se = F.sqrt(
        sse
        / (F.col("n") - 2)
        / (F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
    )
    t_stat = gamma / F.nullif(se, F.lit(0.0))
    return sums.select(
        "event_type",
        "n",
        (F.round(gamma, 6) + F.lit(0.0)).alias("gamma_hat"),
        (F.round(t_stat, 4) + F.lit(0.0)).alias("t_stat"),
        (t_stat < DF_CRIT_5PCT_X100 / 100.0).alias("stationary_5pct"),
    )


@query(
    "ts_holt_winters",
    oracle="""
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    idx AS MATERIALIZED (
        SELECT event_type, strftime(d, '%Y-%m-%d') AS day, xc,
               xc::DOUBLE AS x,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        FROM daily
    ),
    hw AS (
        SELECT event_type, day, xc, x, rn,
               x AS lvl, 0.0::DOUBLE AS trd, 0.0::DOUBLE AS sea,
               [0.0::DOUBLE, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS sh
        FROM idx WHERE rn = 1
        UNION ALL
        SELECT i.event_type, i.day, i.xc, i.x, i.rn,
               0.5 * (i.x - h.sh[1]) + 0.5 * (h.lvl + h.trd) AS lvl,
               0.25 * ((0.5 * (i.x - h.sh[1]) + 0.5 * (h.lvl + h.trd))
                       - h.lvl) + 0.75 * h.trd AS trd,
               0.5 * (i.x - (0.5 * (i.x - h.sh[1]) + 0.5 * (h.lvl + h.trd)))
                   + 0.5 * h.sh[1] AS sea,
               sh[2:] || [
                   0.5 * (i.x - (0.5 * (i.x - h.sh[1])
                                 + 0.5 * (h.lvl + h.trd)))
                       + 0.5 * h.sh[1]
               ] AS sh
        FROM hw h JOIN idx i
          ON i.event_type = h.event_type AND i.rn = h.rn + 1
    )
    SELECT event_type, day, xc,
           round(lvl, 4) + 0.0 AS level,
           round(trd, 4) + 0.0 AS trend,
           round(sea, 4) + 0.0 AS seasonal,
           round(lvl + trd + sh[1], 4) + 0.0 AS forecast_1
    FROM hw
    """,
    tags=("telemetry", "timeseries"),
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing — the standard forecasting
    baseline ts_holt_linear lacks the third state for: level + trend +
    a 7-slot weekly seasonal, l_t = alpha*(x_t - s_(t-7)) + (1-alpha)*
    (l_(t-1)+b_(t-1)), b_t = beta*(l_t-l_(t-1)) + (1-beta)*b_(t-1),
    s_t = gamma*(x_t - l_t) + (1-gamma)*s_(t-7), self-starting from
    zeroed seasonals (stated — the first week's seasonals build up from
    the data rather than a separate init pass, so the recursion has ONE
    deterministic state path). Emits per day: level, trend, seasonal,
    and the one-step-ahead forecast l + b + s_(t-6). Honest fixture
    note: the synthetic weekly signal is weak and the gains are fixed,
    so the seasonal model does NOT beat ts_holt_linear's one-step error
    here (aggregate ratio ~1.1 measured) — the op ships the mechanism,
    and the property pin is replica exactness + error-band stability.

    Bit-parity by the ts_holt_linear construction: integer-cents input,
    exact binary-fraction gains (0.5/0.25/0.5), IDENTICAL literal op
    order on both engines; the 7-slot seasonal STATE rides the recursion
    as a DuckDB list column (sh[2:] || [s_new] — rule 28's base-case
    casts apply to the list too) and as a python deque inside the
    grouped applyInPandas on the Spark side. Only the displayed values
    round (4dp, rules 1/6/17).

    At 100 TB: one partial agg to cells; each series is calendar-bounded
    and groups fan out across executors — the canonical
    stateful-sequential pattern, state O(season length) per series."""
    import numpy as np
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc"))

    def hw_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        x = pdf["xc"].to_numpy(dtype=np.float64)
        n = len(x)
        lvl = np.empty(n)
        trd = np.empty(n)
        sea = np.empty(n)
        fc1 = np.empty(n)
        sh = [0.0] * 7
        lvl[0], trd[0], sea[0] = x[0], 0.0, 0.0
        fc1[0] = lvl[0] + trd[0] + sh[0]
        for t in range(1, n):
            s_lag = sh[0]
            # identical literal op order as the recursive CTE
            new_l = 0.5 * (x[t] - s_lag) + 0.5 * (lvl[t - 1] + trd[t - 1])
            new_b = 0.25 * (new_l - lvl[t - 1]) + 0.75 * trd[t - 1]
            new_s = 0.5 * (x[t] - new_l) + 0.5 * s_lag
            sh = sh[1:] + [new_s]
            lvl[t], trd[t], sea[t] = new_l, new_b, new_s
            fc1[t] = new_l + new_b + sh[0]
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "day": pdf["day"],
                "xc": pdf["xc"],
                "lvl": lvl,
                "trd": trd,
                "sea": sea,
                "fc1": fc1,
            }
        )

    fitted = daily.groupBy("event_type").applyInPandas(
        hw_block,
        "event_type string, day string, xc long, lvl double,"
        " trd double, sea double, fc1 double",
    )
    # round JVM-side with F.round (HALF_UP == DuckDB round-half-away) —
    # np.round is half-even and diverged on 3 of 150 rows (the
    # ts_holt_linear convention)
    return fitted.select(
        "event_type",
        "day",
        "xc",
        (F.round("lvl", 4) + F.lit(0.0)).alias("level"),
        (F.round("trd", 4) + F.lit(0.0)).alias("trend"),
        (F.round("sea", 4) + F.lit(0.0)).alias("seasonal"),
        (F.round("fc1", 4) + F.lit(0.0)).alias("forecast_1"),
    )


@query(
    "ts_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, xc,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
        FROM daily
    ),
    s AS (
        SELECT a.event_type,
               sum(CASE WHEN b.xc > a.xc THEN 1
                        WHEN b.xc < a.xc THEN -1 ELSE 0 END)::BIGINT AS s_stat
        FROM idx a JOIN idx b
          ON b.event_type = a.event_type AND b.t > a.t
        GROUP BY a.event_type
    ),
    ties AS (
        SELECT event_type,
               COALESCE(sum(tt * (tt - 1) * (2 * tt + 5)), 0)::BIGINT AS tie_term
        FROM (
            SELECT event_type, count(*)::BIGINT AS tt
            FROM daily GROUP BY event_type, xc
        ) GROUP BY event_type
    ),
    nd AS (SELECT event_type, count(*)::BIGINT AS n_days FROM daily GROUP BY event_type),
    v AS (
        SELECT nd.event_type, nd.n_days,
               (nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                - ti.tie_term)::BIGINT AS var_x18
        FROM nd JOIN ties ti ON ti.event_type = nd.event_type
    )
    SELECT v.event_type, v.n_days, s.s_stat, v.var_x18,
           round(CASE WHEN s.s_stat > 0
                      THEN (s.s_stat - 1) / nullif(sqrt(v.var_x18 / 18.0), 0)
                      WHEN s.s_stat < 0
                      THEN (s.s_stat + 1) / nullif(sqrt(v.var_x18 / 18.0), 0)
                      ELSE 0.0 END, 4) + 0.0 AS z_mk
    FROM v JOIN s ON s.event_type = v.event_type
    """,
    tags=("telemetry", "timeseries", "stats"),
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type — the HYPOTHESIS-TEST
    companion to ts_theil_sen's estimator (the pairing every monitoring
    stack ships together: Theil-Sen says HOW steep, Mann-Kendall says
    whether the monotone trend is SIGNIFICANT): S = sum of pairwise
    value-difference signs over the day-indexed daily series, tie-corrected
    variance 18*Var = n(n-1)(2n+5) - sum t(t-1)(2t+5), and the
    continuity-corrected Z = (S -/+ 1)/sqrt(Var) readout.

    Exactness: daily cents totals are exact BIGINTs, S and the variance
    numerator are exact integer folds (the dominance-pair algebra of
    stats_kendall_tau applied to the time axis); only Z is float, in the
    per-type readout row (rules 1/6, 4dp).

    Scale: the pair join runs on the DAY-INDEXED support (bounded by the
    calendar span — the ts_theil_sen bound, stated), partitioned per
    event_type; the only corpus-sized work is the daily partial agg."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc")
    )
    wt = Window.partitionBy("event_type").orderBy("d")
    idx = daily.select(
        "event_type", "xc", F.row_number().over(wt).alias("t")
    )
    a = idx.select(
        F.col("event_type").alias("et"), F.col("xc").alias("axc"),
        F.col("t").alias("at"),
    )
    b = idx.select(
        F.col("event_type").alias("et"), F.col("xc").alias("bxc"),
        F.col("t").alias("bt"),
    )
    s = (
        a.join(b, "et")
        .filter(F.col("bt") > F.col("at"))
        .groupBy(F.col("et").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("bxc") > F.col("axc"), 1)
                .when(F.col("bxc") < F.col("axc"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "xc")
        .agg(F.count(F.lit(1)).alias("tt"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(F.expr("tt * (tt - 1) * (2 * tt + 5)")), F.lit(0)
            ).alias("tie_term")
        )
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    v = nd.join(ties, "event_type").select(
        "event_type",
        "n_days",
        F.expr(
            "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"
        ).alias("var_x18"),
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1)
            / F.nullif(F.sqrt(F.col("var_x18") / 18.0), F.lit(0.0)),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1)
            / F.nullif(F.sqrt(F.col("var_x18") / 18.0), F.lit(0.0)),
        )
        .otherwise(F.lit(0.0))
    )
    return v.join(s, "event_type").select(
        "event_type",
        "n_days",
        "s_stat",
        "var_x18",
        (F.round(z, 4) + F.lit(0.0)).alias("z_mk"),
    )


@query(
    "ts_granger_lag1",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS vx,
               sum(CASE WHEN event_type = 'purchase'
                        THEN floor(value * 100 + 0.5)::BIGINT ELSE 0 END)::BIGINT AS pc
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT vx, pc,
               lag(vx) OVER (ORDER BY d) AS lvx,
               lag(pc) OVER (ORDER BY d) AS lpc
        FROM daily
    ),
    both_dirs AS (
        SELECT 'views->purchases' AS direction, pc AS y, lpc AS ly, lvx AS lx
        FROM lagged WHERE lvx IS NOT NULL
        UNION ALL
        SELECT 'purchases->views' AS direction, vx AS y, lvx AS ly, lpc AS lx
        FROM lagged WHERE lvx IS NOT NULL
    ),
    m AS (
        SELECT direction, count(*)::BIGINT AS n,
               sum(y)::BIGINT AS sy, sum(ly)::BIGINT AS sl, sum(lx)::BIGINT AS sx,
               sum(y * y)::BIGINT AS syy, sum(ly * ly)::BIGINT AS sll,
               sum(lx * lx)::BIGINT AS sxx, sum(y * ly)::BIGINT AS syl,
               sum(y * lx)::BIGINT AS syx, sum(ly * lx)::BIGINT AS slx
        FROM both_dirs GROUP BY direction
    ),
    c AS (
        SELECT direction, n,
               syy - sy::DOUBLE * sy / n AS cyy,
               sll - sl::DOUBLE * sl / n AS cll,
               sxx - sx::DOUBLE * sx / n AS cxx,
               syl - sy::DOUBLE * sl / n AS cyl,
               syx - sy::DOUBLE * sx / n AS cyx,
               slx - sl::DOUBLE * sx / n AS clx
        FROM m
    )
    SELECT direction, n AS n_obs,
           round(CASE WHEN cll * cxx - clx * clx = 0 OR n <= 3 THEN 0.0
                 ELSE greatest(
                   ((cyy - cyl * cyl / nullif(cll, 0))
                    - (cyy - (cyl * (cxx * cyl - clx * cyx)
                              + cyx * (cll * cyx - clx * cyl))
                             / (cll * cxx - clx * clx)))
                   / nullif((cyy - (cyl * (cxx * cyl - clx * cyx)
                                    + cyx * (cll * cyx - clx * cyl))
                                   / (cll * cxx - clx * clx))
                            / (n - 3), 0), 0.0) END, 4) + 0.0 AS f_stat,
           round(CASE WHEN cyy = 0 OR cll * cxx - clx * clx = 0 THEN 0.0
                 ELSE (cyl * (cxx * cyl - clx * cyx)
                       + cyx * (cll * cyx - clx * cyl))
                      / (cll * cxx - clx * clx) / cyy END, 6) + 0.0 AS r2_unrestricted
    FROM c
    """,
    tags=("telemetry", "timeseries", "stats"),
)
def ts_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality screen at lag 1, both directions — does yesterday's
    view count predict today's purchase revenue beyond revenue's own
    lag (and vice versa)? The F-test comparing the restricted AR(1)
    (y ~ y_lag) against the unrestricted (y ~ y_lag + x_lag): F =
    (RSS_r - RSS_u) / (RSS_u / (n - 3)) with one added regressor, the
    standard lead-lag triage a metrics team runs before any causal claim
    (eval_diff_in_differences is the design-based follow-up).

    Exactness: daily counts/cents are exact BIGINTs and ALL ten raw
    moments fold as exact integer sums; centering, the 2x2 Cramer solve
    for the unrestricted fit, and F evaluate only in the per-direction
    readout row (rules 1/6, 4dp/6dp; degenerate collinear supports read
    0 via the nullif guards, F clamped at 0 since a quantized RSS_r can
    sit an ulp below RSS_u).

    Scale: one partial agg to the calendar-bounded daily frame; the lag
    window runs on that support (the ts_theil_sen bound); the moment
    fold is one more support-sized aggregate. Nothing corpus-sized
    beyond the first groupBy."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("vx"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            ).otherwise(0)
        ).alias("pc"),
    )
    wd = Window.orderBy("d")
    lagged = daily.select(
        "vx",
        "pc",
        F.lag("vx").over(wd).alias("lvx"),
        F.lag("pc").over(wd).alias("lpc"),
    ).filter(F.col("lvx").isNotNull())
    dirs = lagged.select(
        F.lit("views->purchases").alias("direction"),
        F.col("pc").alias("y"),
        F.col("lpc").alias("ly"),
        F.col("lvx").alias("lx"),
    ).unionAll(
        lagged.select(
            F.lit("purchases->views").alias("direction"),
            F.col("vx").alias("y"),
            F.col("lvx").alias("ly"),
            F.col("lpc").alias("lx"),
        )
    )
    m = dirs.groupBy("direction").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("ly").alias("sl"),
        F.sum("lx").alias("sx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("ly") * F.col("ly")).alias("sll"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("y") * F.col("ly")).alias("syl"),
        F.sum(F.col("y") * F.col("lx")).alias("syx"),
        F.sum(F.col("ly") * F.col("lx")).alias("slx"),
    )
    nD = F.col("n").cast("double")
    cyy = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / nD
    cll = F.col("sll") - F.col("sl").cast("double") * F.col("sl") / nD
    cxx = F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / nD
    cyl = F.col("syl") - F.col("sy").cast("double") * F.col("sl") / nD
    cyx = F.col("syx") - F.col("sy").cast("double") * F.col("sx") / nD
    clx = F.col("slx") - F.col("sl").cast("double") * F.col("sx") / nD
    det = cll * cxx - clx * clx
    ess_u = cyl * (cxx * cyl - clx * cyx) + cyx * (cll * cyx - clx * cyl)
    rss_r = cyy - cyl * cyl / F.nullif(cll, F.lit(0.0))
    rss_u = cyy - ess_u / det
    f_stat = F.when(
        (det == 0) | (F.col("n") <= 3), F.lit(0.0)
    ).otherwise(
        F.greatest(
            (rss_r - rss_u)
            / F.nullif(rss_u / (nD - 3), F.lit(0.0)),
            F.lit(0.0),
        )
    )
    r2 = F.when((cyy == 0) | (det == 0), F.lit(0.0)).otherwise(
        ess_u / det / cyy
    )
    return m.select(
        "direction",
        F.col("n").alias("n_obs"),
        (F.round(f_stat, 4) + F.lit(0.0)).alias("f_stat"),
        (F.round(r2, 6) + F.lit(0.0)).alias("r2_unrestricted"),
    )


# --- round 12: Hurst exponent via rescaled range -------------------------------

HURST_SCALES = (5, 10, 15)  # non-overlapping block sizes over the daily series


@query(
    "ts_hurst_rs",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT xc, row_number() OVER (ORDER BY d) - 1 AS t FROM daily
    ),
    scales AS (SELECT unnest(ARRAY{list(HURST_SCALES)}) AS w),
    blocks AS (
        SELECT s.w, i.t // s.w AS blk, i.t % s.w AS pos, i.xc
        FROM idx i CROSS JOIN scales s
        WHERE i.t < (SELECT count(*) FROM idx) // s.w * s.w
    ),
    cum AS (
        SELECT w, blk, pos, xc,
               sum(xc) OVER (PARTITION BY w, blk ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx,
               sum(xc) OVER (PARTITION BY w, blk) AS sw,
               sum(xc * xc) OVER (PARTITION BY w, blk) AS sxx
        FROM blocks
    ),
    dev AS (
        SELECT w, blk,
               max(w * cx - (pos + 1) * sw)
                   - min(w * cx - (pos + 1) * sw) AS r_scaled,
               any_value(w * sxx - sw * sw) AS v_scaled
        FROM cum GROUP BY w, blk
    ),
    per_scale AS (
        SELECT w, count(*)::BIGINT AS n_blocks,
               avg(ln(r_scaled / nullif(sqrt(v_scaled::DOUBLE), 0)))
                   AS mean_log_rs
        FROM dev WHERE v_scaled > 0 AND r_scaled > 0
        GROUP BY w
    ),
    fit AS (
        SELECT count(*)::BIGINT AS k,
               sum(ln(w::DOUBLE)) AS sx, sum(mean_log_rs) AS sy,
               sum(ln(w::DOUBLE) * ln(w::DOUBLE)) AS sxx,
               sum(ln(w::DOUBLE) * mean_log_rs) AS sxy
        FROM per_scale
    )
    SELECT p.w AS scale_days, p.n_blocks,
           round(p.mean_log_rs, 6) + 0.0 AS mean_log_rs,
           round((f.k * f.sxy - f.sx * f.sy)
                 / nullif(f.k * f.sxx - f.sx * f.sx, 0), 4) + 0.0 AS hurst
    FROM per_scale p CROSS JOIN fit f
    """,
    tags=("telemetry", "timeseries", "stats"),
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis over the daily
    revenue series — the long-memory diagnostic that separates trending
    (H > 0.5), mean-reverting (H < 0.5) and random-walk (H ~ 0.5)
    behavior; the capacity-planning question ('do busy days cluster?')
    that autocorrelation at a single lag cannot answer.

    The integer trick: within each block of w days, the mean-adjusted
    cumulative deviation scales to z_i = w*cumsum(x)_i - (i+1)*S_w —
    EXACT BIGINTs (no float mean subtraction) — so the range R_scaled =
    max z - min z is exact, the scaled variance V_scaled = w*sum(x^2) -
    S_w^2 = w^2 * sigma^2 is exact, and R/S = R_scaled / sqrt(V_scaled)
    touches floats only at one sqrt per block. Per scale the log-R/S
    mean folds over the handful of blocks; the Hurst slope is the
    log-log OLS over |HURST_SCALES| points in the final fold (rules 1/6,
    6dp/4dp). Degenerate blocks (zero variance or zero range) are
    excluded on both engines (stated).

    Scale: one partial agg to the calendar-bounded daily frame; block
    assignment, prefix sums and block stats are windows over that
    support times |scales| (the ts_theil_sen bound); the fit is
    |scales| rows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc")
    )
    wd = Window.orderBy("d")
    idx = daily.select(
        "xc", (F.row_number().over(wd) - 1).alias("t")
    )
    nd = idx.agg(F.count(F.lit(1)).alias("n"))
    scales = spark.createDataFrame(
        [(w,) for w in HURST_SCALES], "w long"
    )
    blocks = (
        idx.crossJoin(F.broadcast(scales))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("t") < F.expr("n div w * w"))
        .select(
            "w",
            F.expr("t div w").alias("blk"),
            (F.col("t") % F.col("w")).alias("pos"),
            "xc",
        )
    )
    wcum = (
        Window.partitionBy("w", "blk")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("w", "blk")
    cum = blocks.select(
        "w",
        "blk",
        "pos",
        F.sum("xc").over(wcum).alias("cx"),
        F.sum("xc").over(wall).alias("sw"),
        F.sum(F.col("xc") * F.col("xc")).over(wall).alias("sxx"),
    )
    z = F.col("w") * F.col("cx") - (F.col("pos") + 1) * F.col("sw")
    dev = cum.groupBy("w", "blk").agg(
        (F.max(z) - F.min(z)).alias("r_scaled"),
        F.any_value(
            F.col("w") * F.col("sxx") - F.col("sw") * F.col("sw")
        ).alias("v_scaled"),
    )
    per_scale = (
        dev.filter((F.col("v_scaled") > 0) & (F.col("r_scaled") > 0))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.avg(
                F.log(
                    F.col("r_scaled")
                    / F.nullif(
                        F.sqrt(F.col("v_scaled").cast("double")), F.lit(0.0)
                    )
                )
            ).alias("mean_log_rs"),
        )
    )
    lw = F.log(F.col("w").cast("double"))
    fit = per_scale.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(lw).alias("sx"),
        F.sum("mean_log_rs").alias("sy"),
        F.sum(lw * lw).alias("sxx"),
        F.sum(lw * F.col("mean_log_rs")).alias("sxy"),
    )
    hurst = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return per_scale.crossJoin(F.broadcast(fit)).select(
        F.col("w").alias("scale_days"),
        "n_blocks",
        (F.round(F.col("mean_log_rs"), 6) + F.lit(0.0)).alias("mean_log_rs"),
        (F.round(hurst, 4) + F.lit(0.0)).alias("hurst"),
    )
