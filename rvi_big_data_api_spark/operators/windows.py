"""Window-function operators (SURVEY.md §2.5).

Window algebra is the engine's substitute for the reference's per-VIN
imperative loops: consecutive-report deltas, running accumulations, and
first/last fixes were RDD groupBy-then-sort code there (SURVEY.md §3.1
[P:med]); here each is ONE shuffle on the partition key followed by a
per-partition sort that Tungsten spills if a key's slice exceeds memory.
Skewed keys are the 100 TB hazard — AQE cannot split a window partition, so
key choice (user_id, not a constant) is what keeps partitions bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.exprs import ts_str
from ..io import load
from ..registry import query


@query(
    "win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
    tags=("window",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per customer. row_number gets a unique
    tiebreak (o_orderkey) for determinism; rank/dense_rank are tie-stable."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    w_rn = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w_rn).alias("rn"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile
    FROM orders
    """,
    tags=("window",),
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing. Unpartitioned window = single-task sort: acceptable
    for ranked reports, but at 100 TB bucket within a partition key instead."""
    orders = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return orders.select("o_orderkey", "o_totalprice", F.ntile(4).over(w).alias("quartile"))


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           (epoch(date_trunc('second', ts))
             - epoch(date_trunc('second', lag(ts) OVER w)))::BIGINT AS gap_seconds
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "telemetry"),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Δvalue / Δts vs the previous report per vehicle — the building block of
    trip sessionization (SURVEY.md §2.9)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    prev_sec = F.unix_timestamp(F.date_trunc("second", F.lag("ts").over(w)))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (sec - prev_sec).alias("gap_seconds"),
    )


@query(
    "win_running",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_n
    FROM events
    """,
    tags=("window", "telemetry"),
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odometer-style running accumulation per vehicle. Rounded: DuckDB
    evaluates cumulative frames with a segment tree, so its addition order
    (and last-ulp result) differs from Spark's sequential prefix sum."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "win_sliding_rows",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg3
    FROM events
    """,
    tags=("window", "telemetry"),
)
def win_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average (signal smoothing). Rounded: sliding-frame
    aggregation order differs between engines (DuckDB uses segment trees)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, Window.currentRow)
    return ev.select("event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("moving_avg3"))


@query(
    "win_range_time",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch(date_trunc('second', ts))::BIGINT
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
               AS trailing_1h_value
    FROM events
    """,
    tags=("window", "telemetry"),
)
def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour sum per vehicle: a RANGE frame over epoch seconds.
    Both dialects order by second-truncated epoch so frame membership agrees
    exactly (§1 gotcha 1)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, Window.currentRow)
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("trailing_1h_value")
    )


@query(
    "win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           strftime(date_trunc('second', first_value(ts) OVER w),
                    '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(date_trunc('second', last_value(ts) OVER w),
                    '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "telemetry"),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last fix per vehicle (trip endpoints): full-partition frame so
    last_value sees the real end, then one distinct row per user."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        ts_str(F.first("ts").over(w)).alias("first_ts"),
        ts_str(F.last("ts").over(w)).alias("last_ts"),
    ).distinct()


@query(
    "win_pct",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    """,
    tags=("window",),
)
def win_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist within each priority class — tie-stable, and
    the k/(n-1) arithmetic is identical in both engines so values are exact."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "win_median",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, value,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    )
    SELECT user_id, event_id, value,
           round(median(value) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                     ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4)
               AS rolling_median
    FROM ordered
    """,
    tags=("window",),
)
def win_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 5-row median per vehicle — the robust-smoothing twin of
    win_sliding_rows' moving average (medians shrug off the spikes
    anomaly_zscore flags).

    Spark rejects median()/percentile() over a ROWS frame
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame's values are
    gathered with collect_list (frame aggregation IS allowed), sorted, and
    the middle extracted with element_at — all JVM-side column algebra, one
    user_id shuffle like every other window op. Even-sized edge frames
    (3-4 rows at partition boundaries) average the middle pair, matching
    DuckDB's quantile_cont(0.5) exactly."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id").rowsBetween(-2, 2)
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    mid = F.floor((n + 1) / 2).cast("int")
    median = F.when(
        n % 2 == 1, F.element_at(vals, mid)
    ).otherwise((F.element_at(vals, mid) + F.element_at(vals, mid + 1)) / 2.0)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.round(median, 4).alias("rolling_median"),
    )


EWMA_ALPHA = 0.7  # weight decay per step back; window bounded to 20 rows
EWMA_SPAN = 20


@query(
    "win_ewma",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, value,
               epoch(date_trunc('second', ts))::BIGINT AS sec
        FROM events
    ),
    framed AS (
        SELECT user_id, event_id, value,
               list(value) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                 ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING AND CURRENT ROW)
                   AS vals
        FROM ordered
    )
    SELECT user_id, event_id, value,
           round(list_sum(list_transform(vals, (x, i) -> x * pow({EWMA_ALPHA}, len(vals) - i)))
                 / list_sum(list_transform(vals, (x, i) -> pow({EWMA_ALPHA}, len(vals) - i))),
                 6) AS ewma
    FROM framed
    """,
    tags=("window",),
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per vehicle — the recency-
    weighted smoother (newest reading weighted 1, each step back decayed by
    EWMA_ALPHA, window truncated at EWMA_SPAN rows where the residual weight
    is alpha^20 ≈ 0.08%).

    EWMA's recurrence looks anti-relational, but over a bounded frame it is
    a weighted dot product: gather the frame with collect_list (the
    win_median pattern), weight by position with a transform index lambda,
    fold — all JVM column algebra, one user_id shuffle. Spark's transform
    index is 0-based, DuckDB's 1-based: both weight exponents reduce to
    (frame_len - 1 - i₀) ≡ (len - i₁), pinned identical. Rounded at 6 dp
    for fold-order drift (PARITY.md #6)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(-(EWMA_SPAN - 1), Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    framed = ev.select("user_id", "event_id", "value", vals.alias("vals"))
    n = F.size("vals")
    num = F.aggregate(
        F.transform("vals", lambda x, i: x * F.pow(F.lit(EWMA_ALPHA), n - 1 - i)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform("vals", lambda x, i: F.pow(F.lit(EWMA_ALPHA), n - 1 - i)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return framed.select(
        "user_id", "event_id", "value", F.round(num / den, 6).alias("ewma")
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT event_id, user_id,
           sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING)::BIGINT
               AS distinct_channels_so_far
    FROM flagged
    """,
    tags=("window", "distinct"),
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per entity over time — "how many distinct
    channels has this vehicle used so far" — which NEITHER engine supports
    as `count(DISTINCT …) OVER (… ROWS UNBOUNDED PRECEDING)`. The
    formulation that works everywhere AND scales: flag each (entity,
    value)'s FIRST occurrence with one rank window, then a plain running
    sum of flags — two stacked windows over the same entity partitioning.

    The naive alternative (size(collect_set(...) OVER ...)) materializes a
    growing set per ROW — O(k) state per row, O(n·k) per partition — and
    is the formulation that dies on a 100 TB event stream. The first-seen
    flag is O(1) per row. Two exchanges by construction — the rank window
    keys on (user_id, event_type), the running sum on user_id — but the
    second shuffle carries only (id, key, flag) rows, and the
    finer-to-coarser key order means the re-partition is a local merge
    under AQE coalescing."""
    ev = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_id", "user_id", "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "event_id", "user_id",
        F.sum("first_seen").over(w_run).alias("distinct_channels_so_far"),
    )


VALUE_BAND = 10  # numeric range-frame width (value units)


@query(
    "win_range_numeric",
    oracle=f"""
    SELECT event_id, event_type, value,
           count(*) OVER w AS n_within,
           round(sum(value) OVER w, 2) AS sum_within
    FROM events
    WHERE user_id < 30
    WINDOW w AS (PARTITION BY event_type ORDER BY value
                 RANGE BETWEEN {VALUE_BAND} PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def win_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a NUMERIC order key — the window feature
    win_range_time exercises on epochs, here on a measurement axis: for
    each reading, aggregate every same-channel reading within VALUE_BAND
    units BELOW it (local density / "how crowded is this value region" —
    the banding primitive behind histogram-free outlier context). RANGE
    (unlike ROWS) includes ALL peers at equal order values, which is what
    makes the result deterministic under duplicate readings without a
    tie-break column.

    One shuffle on the partition key; the frame is evaluated by a single
    ordered sweep per partition in both engines. The windowed float sum
    is rounded (PARITY rule 6: segment-tree vs running addition order)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(-VALUE_BAND, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.count(F.lit(1)).over(w).alias("n_within"),
        F.round(F.sum("value").over(w), 2).alias("sum_within"),
    )


# --- round 9: rolling OLS trend ----------------------------------------------

SLOPE_W = 8  # trailing days per regression window


@query(
    "win_regression_slope",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS cents
        FROM events GROUP BY 1, 2
    ),
    indexed AS (
        SELECT user_id, day, cents,
               (row_number() OVER (PARTITION BY user_id ORDER BY day) - 1)::BIGINT
                   AS r
        FROM daily
    ),
    sums AS (
        SELECT user_id, day,
               count(*) OVER w::BIGINT AS n,
               sum(r) OVER w::BIGINT AS sx,
               sum(r * r) OVER w::BIGINT AS sxx,
               sum(cents) OVER w::BIGINT AS sy,
               sum(r * cents) OVER w::BIGINT AS sxy
        FROM indexed
        WINDOW w AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN {SLOPE_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, strftime(day, '%Y-%m-%d %H:%M:%S') AS day, n,
           ((n * sxy - sx * sy) * 1000000
               // nullif(n * sxx - sx * sx, 0))::BIGINT AS slope_ppm
    FROM sums
    """,
    tags=("windows", "timeseries"),
)
def win_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS TREND — per user, the least-squares slope of daily spend
    over the trailing SLOPE_W days, the window-native form of trend
    detection (ts_holt_linear smooths globally; this emits a per-day
    local slope a monitoring rule can threshold). The whole regression
    is FOUR integer window sums over one frame: slope = (n·Σxy − Σx·Σy)
    / (n·Σx² − (Σx)²) with x = the absolute day index — OLS slope is
    shift-invariant in x, so the absolute index works in a sliding frame
    without per-frame re-centering, which is what makes the plan one
    window pass instead of a self-join. All inputs are exact BIGINT
    (cents, indices), the ratio ships once as integer ppm (rule 25),
    and the single-row frame short-circuits to NULL via nullif (den = 0
    iff all x equal iff n = 1, since day indices are distinct).

    Scale: one day rollup + one user-partitioned frame — the win_ewma
    cost class; nothing global."""
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
        "day",
        "cents",
        (F.row_number().over(wday) - 1).cast("long").alias("r"),
    )
    wf = wday.rowsBetween(-(SLOPE_W - 1), Window.currentRow)
    sums = indexed.select(
        "user_id",
        "day",
        F.count(F.lit(1)).over(wf).alias("n"),
        F.sum("r").over(wf).alias("sx"),
        F.sum(F.col("r") * F.col("r")).over(wf).alias("sxx"),
        F.sum("cents").over(wf).alias("sy"),
        F.sum(F.col("r") * F.col("cents")).over(wf).alias("sxy"),
    )
    return sums.select(
        "user_id",
        ts_str(F.col("day")).alias("day"),
        "n",
        F.expr(
            "(n * sxy - sx * sy) * 1000000 div nullif(n * sxx - sx * sx, 0)"
        ).alias("slope_ppm"),
    )


@query(
    "win_skyline_pareto",
    oracle="""
    WITH pts AS (
        SELECT p_brand AS brand, p_partkey,
               floor(p_retailprice * 100 + 0.5)::BIGINT AS price_cents,
               p_size::BIGINT AS size
        FROM part
    ),
    scored AS (
        SELECT brand, p_partkey, price_cents, size,
               max(size) OVER (PARTITION BY brand ORDER BY price_cents
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS best_cheaper
        FROM pts
    )
    SELECT brand, p_partkey, price_cents, size
    FROM scored
    WHERE best_cheaper IS NULL OR size >= best_cheaper
    """,
    tags=("window", "analytics"),
)
def win_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto frontier) per brand — the classic multi-criteria
    operator (Borzsony/Kossmann/Stocker's SKYLINE OF): keep each part
    that no strictly-cheaper part strictly out-sizes, i.e. the
    (min price, max size) frontier a buyer actually chooses from.
    Dominance here is STRICT in both axes (stated): p survives iff
    max(size) over parts with price_cents < p.price_cents is not above
    p.size (equal-size survives — only a strictly-cheaper AND
    strictly-larger part dominates; ADVICE r11 item 2). That reduces the quadratic exists-check to ONE range-frame
    window — max over RANGE UNBOUNDED PRECEDING .. 1 PRECEDING on the
    integer price axis — the textbook sort-filter skyline, PARTITIONED
    by brand so no global sort exists.

    Exactness: price in exact cents, size integer; the range frame's
    1-PRECEDING bound on an integer key is exact in both engines (no
    float range arithmetic); survivors are an integer comparison.

    At 100 TB: one window per brand partition (the sort is the shuffle);
    the frontier output is tiny. The same plan computes any 2-criteria
    skyline; higher dimensions need the block-nested-loop algorithms the
    docstring deliberately avoids claiming."""
    p = load(spark, sf_dir, "part")
    pts = p.select(
        F.col("p_brand").alias("brand"),
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias(
            "price_cents"
        ),
        F.col("p_size").cast("long").alias("size"),
    )
    w = (
        Window.partitionBy("brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    scored = pts.select(
        "brand",
        "p_partkey",
        "price_cents",
        "size",
        F.max("size").over(w).alias("best_cheaper"),
    )
    return scored.filter(
        F.col("best_cheaper").isNull() | (F.col("size") >= F.col("best_cheaper"))
    ).select("brand", "p_partkey", "price_cents", "size")


_DRAWDOWN_ORACLE_SQL = """
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS xc
        FROM events GROUP BY 1, 2
    ),
    runmax AS (
        SELECT event_type, d, xc,
               max(xc) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM daily
    ),
    dd AS (
        SELECT event_type, d, xc, peak, (peak - xc)::BIGINT AS drawdown
        FROM runmax
    ),
    worst AS (
        SELECT event_type, count(*)::BIGINT AS n_days,
               max(peak)::BIGINT AS max_cents,
               max(drawdown)::BIGINT AS max_drawdown_cents
        FROM dd GROUP BY event_type
    ),
    trough AS (
        SELECT d.event_type,
               min(d.d) AS trough_day,
               any_value(w.max_drawdown_cents) AS mdc
        FROM dd d JOIN worst w ON w.event_type = d.event_type
                  AND d.drawdown = w.max_drawdown_cents
        GROUP BY d.event_type
    )
    SELECT w.event_type, w.n_days, w.max_cents, w.max_drawdown_cents,
           strftime(t.trough_day, '%Y-%m-%d') AS trough_day,
           (w.max_drawdown_cents * 1000000
            // nullif(w.max_cents, 0))::BIGINT AS drawdown_ppm
    FROM worst w JOIN trough t ON t.event_type = w.event_type
    """
# ^ shared by win_drawdown and stream_drawdown_monitor: the twin readout
# is identical because both ops run drawdown_extract on the same daily agg.


@query(
    "win_drawdown",
    oracle=_DRAWDOWN_ORACLE_SQL,
    tags=("window", "telemetry", "timeseries"),
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per channel — the running-peak-to-trough drop the
    capacity/revenue dashboards watch (the risk metric finance calls
    MDD): running max over the daily cents series, drawdown = peak -
    value, the worst drawdown with its EARLIEST trough day (stated
    tie-break) and its share of the all-time peak in exact ppm.

    Exactness: cents, running peaks, drawdowns and the ppm share are all
    exact BIGINTs — no floats anywhere in this op.

    Scale: one partial agg to the calendar-bounded daily frame; the
    running-max window is partitioned per event_type over that support
    (the ts_theil_sen bound); the trough argmin is an equi-join on the
    |channels|-row worst frame."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("xc")
    )
    return drawdown_extract(daily)


def drawdown_extract(daily: DataFrame) -> DataFrame:
    """Shared running-peak/worst-drawdown readout over a (event_type, d,
    xc) daily frame — ONE code path for win_drawdown and its streaming
    twin (the _esd_extract discipline), so the live monitor cannot drift
    from the batch metric."""
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.select(
        "event_type",
        "d",
        "xc",
        F.max("xc").over(wrun).alias("peak"),
    ).withColumn("drawdown", F.col("peak") - F.col("xc"))
    worst = dd.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("peak").alias("max_cents"),
        F.max("drawdown").alias("max_drawdown_cents"),
    )
    trough = (
        dd.join(
            worst.select(
                "event_type", F.col("max_drawdown_cents").alias("mdc")
            ),
            "event_type",
        )
        .filter(F.col("drawdown") == F.col("mdc"))
        .groupBy("event_type")
        .agg(F.min("d").alias("trough_day"))
    )
    return worst.join(trough, "event_type").select(
        "event_type",
        "n_days",
        "max_cents",
        "max_drawdown_cents",
        F.date_format("trough_day", "yyyy-MM-dd").alias("trough_day"),
        F.expr(
            "max_drawdown_cents * 1000000 div nullif(max_cents, 0)"
        ).alias("drawdown_ppm"),
    )
