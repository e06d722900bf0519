"""Window-function surface (SURVEY.md §2 Table B): ranking, analytic,
and frame-based windows.

Every window here partitions by a real key (customer/user) -- a window
without PARTITION BY collapses to a single task and is forbidden in
this engine outside deliberately-filtered small inputs (see
``monotonic_sequence``).  One shuffle per distinct partitioning serves
all windows sharing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io_utils import load
from .catalog import register


@register(
    "window_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("window", "topk"),
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number -- the scalable top-k: per-group
    state is k rows, no global sort.  Deterministic tiebreak on key."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).cast("long").alias("rn")
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_rank_functions",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderstatus, rnk
    LIMIT 500
    """,
    tags=("window", "ranking"),
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking battery over one shared window spec (single sort)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderstatus",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        )
        .orderBy("o_orderstatus", "rnk")
        .limit(500)
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    tags=("window", "analytic"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead (Table B analytic): event-over-event deltas per device --
    the engine form of the reference's 'change of temperature over time'
    chart (A22).  Subtraction of raw doubles is exact; no rounding."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.where(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            (F.col("value") - F.lag("value").over(w)).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
               AS moving_avg_7,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_in_frame
    FROM events
    WHERE user_id < 10
    ORDER BY user_id, event_id
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing moving average (rowsBetween frame) -- the natural
    smoothing extension of the reference's hourly-average charts."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return (
        events.where(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            F.round(F.avg("value").over(w), 6).alias("moving_avg_7"),
            F.count(F.lit(1)).over(w).alias("n_in_frame"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_cumulative",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER w, 4) AS running_total,
           count(*) OVER w AS running_count,
           max(value) OVER w AS running_max
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
    ORDER BY user_id, event_id
    """,
    tags=("window", "frame"),
)
def window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (running) aggregates over an unbounded-preceding frame."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.where(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 4).alias("running_total"),
            F.count(F.lit(1)).over(w).alias("running_count"),
            F.max("value").over(w).alias("running_max"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_range_trailing_hour",
    oracle="""
    SELECT user_id, event_id,
           count(*) OVER w AS events_last_hour,
           round(sum(value) OVER w, 4) AS value_last_hour
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("window", "frame", "range"),
)
def window_range_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on event time: per row, activity in the trailing hour
    (epoch-second order key so Spark and the oracle share the exact
    frame boundary semantics)."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3599, Window.currentRow)
    )
    return (
        events.where(F.col("user_id") < 10)
        .select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("events_last_hour"),
            F.round(F.sum("value").over(w), 4).alias("value_last_hour"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    tags=("window", "analytic"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over the full-partition frame (the frame
    must be explicit: Spark's default frame stops at CURRENT ROW, which
    silently breaks last_value)."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        events.select(
            "user_id",
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w).alias("last_val"),
            F.nth_value("value", 2).over(w).alias("second_val"),
        )
        .distinct()
        .orderBy("user_id")
    )


@register(
    "downsample_ohlc_10min",
    oracle="""
    SELECT strftime(date_trunc('hour', ts)
             + to_minutes(10 * (minute(ts) // 10)), '%Y-%m-%d %H:%M') AS bucket,
           event_type,
           arg_min(value, ts) AS open_value,
           max(value) AS high_value,
           min(value) AS low_value,
           arg_max(value, ts) AS close_value,
           count(*) AS n
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    """,
    tags=("window", "downsample", "timeseries"),
)
def downsample_ohlc_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket downsampling: 10-minute OHLC bars
    per series (the continuous-aggregate shape -- the reference's
    hourly rollup generalized to arbitrary buckets with first/last
    semantics via min_by/max_by).  Single partial+final aggregate; at
    scale this is the materialized rollup a retention policy would
    replace raw data with."""
    events = load(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp")
    )
    bucket = F.date_format(
        F.timestamp_seconds((F.col("ts").cast("long") / 600).cast("long") * 600),
        "yyyy-MM-dd HH:mm",
    ).alias("bucket")
    return (
        events.groupBy(bucket, F.col("event_type"))
        .agg(
            F.min_by("value", "ts").alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", "ts").alias("close_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bucket", "event_type")
    )


@register(
    "downsample_lttb_value",
    # The selection recurrence (each bucket's pick depends on the
    # previous pick) is replayed with a recursive CTE: one recursion
    # step per bucket, a correlated argmax subquery per (series, step).
    # The edge formula mirrors np.linspace's FP op order exactly
    # (step computed once, k * step + 1, endpoint pinned to n-1) so
    # bucket boundaries are bit-identical.  Residual cross-engine risk:
    # np.mean (pairwise sum) vs avg() (sequential) can differ ~1 ulp in
    # a bucket centroid and flip an argmax between two near-equal-area
    # points -- not observed at this data scale.
    oracle="""
    WITH RECURSIVE base AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS DOUBLE) AS x,
             value AS y
      FROM events
    ),
    pts AS (
      SELECT event_type, x, y,
             row_number() OVER (PARTITION BY event_type ORDER BY x, y) - 1 AS idx,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM base
    ),
    grp AS (SELECT DISTINCT event_type, n FROM pts),
    edges AS (
      SELECT g.event_type, g.n, t.k,
             CASE WHEN t.k = 48 THEN g.n - 1
                  ELSE CAST(floor(1.0 + t.k * ((g.n - 2.0) / 48.0)) AS BIGINT)
             END AS e
      FROM grp g CROSS JOIN range(49) t(k)
      WHERE g.n > 50
    ),
    cent AS (
      SELECT b.event_type, b.b, b.lo, b.hi, avg(p.x) AS cx, avg(p.y) AS cy
      FROM (
        SELECT e1.event_type, e1.k AS b, e1.e AS lo, e2.e AS hi,
               e2.e AS nlo, COALESCE(e3.e, e1.n) AS nhi
        FROM edges e1
        JOIN edges e2 ON e2.event_type = e1.event_type AND e2.k = e1.k + 1
        LEFT JOIN edges e3 ON e3.event_type = e1.event_type AND e3.k = e1.k + 2
        WHERE e1.k <= 47
      ) b
      JOIN pts p ON p.event_type = b.event_type
                AND p.idx >= b.nlo AND p.idx < b.nhi
      GROUP BY b.event_type, b.b, b.lo, b.hi
    ),
    sel AS (
      SELECT event_type, -1 AS b, CAST(0 AS BIGINT) AS sel_idx
      FROM grp WHERE n > 50
      UNION ALL
      SELECT c.event_type, c.b,
             (SELECT p.idx
              FROM pts p
              WHERE p.event_type = c.event_type
                AND p.idx >= c.lo AND p.idx < c.hi
              ORDER BY abs((a.x - c.cx) * (p.y - a.y)
                           - (a.x - p.x) * (c.cy - a.y)) DESC,
                       p.idx
              LIMIT 1)
      FROM sel s
      JOIN cent c ON c.event_type = s.event_type AND c.b = s.b + 1
      JOIN pts a ON a.event_type = s.event_type AND a.idx = s.sel_idx
    ),
    picked AS (
      SELECT s.event_type, p.x, p.y
      FROM sel s
      JOIN pts p ON p.event_type = s.event_type AND p.idx = s.sel_idx
      UNION ALL
      SELECT event_type, x, y FROM pts WHERE n > 50 AND idx = n - 1
      UNION ALL
      SELECT event_type, x, y FROM pts WHERE n <= 50
    )
    SELECT event_type, x, y FROM picked ORDER BY event_type, x, y
    """,
    tags=("window", "downsample", "timeseries", "lttb"),
)
def downsample_lttb_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB chart downsampling (Steinarsson 2013) of each event_type's
    (ts, value) series to 50 visually-representative points.  The
    selected-point recurrence is sequential per series, so the Spark
    side is an ``applyInPandas`` operator by necessity; the recurrence
    IS SQL-expressible as a recursive CTE (one step per bucket), which
    the oracle exploits -- see the registration comment.  The algorithm
    is additionally pytest-verified against a pure-Python reference --
    tests/test_operators.py::test_lttb_matches_python_reference."""
    from ..operators.timeseries import lttb_downsample

    events = load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    return lttb_downsample(events, 50, ["event_type"], "x", "y").orderBy(
        "event_type", "x", "y"
    )
