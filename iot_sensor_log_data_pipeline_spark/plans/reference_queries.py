"""Reference-parity analytics queries (SURVEY.md §2 Table A) over ``events``.

The reference's entire published query surface is four Kibana/OpenSearch
aggregations plus the producer/compactor row transforms.  ``events``
(timestamped numeric measurements + JSON props) is the driver corpus's
sensor-stream analogue, so each Table-A operator is expressed here over
it as a one-pass DataFrame plan:

- A20/A21 hourly averages  -> groupBy(hour-bucket).agg(avg)
- A22/A23 histogram max    -> groupBy(floor(id/500)*500).agg(max)
- A24 ascending group sort -> orderBy on the group key
- A25 correlation          -> corr() (the reference eyeballed this)
- A2/A3/A5 row transforms  -> struct flatten, ts format, to_json
- A4 monotonic counter     -> row_number
- A6-fix dedup             -> dropDuplicates on the natural key
- A14 compaction SELECT    -> column projection

Scale notes: every aggregation here is a partial+final hash aggregate
(map-side combine, one shuffle on the group key); group-key cardinality
is bounded (hours, 500-wide buckets), so state stays tiny at any data
volume.  No collects, no cartesian products, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load, parallelize_small
from ._numeric import dec_avg, dec_avg_sql, dec_sum, round_half_up
from .catalog import register

#: Reference hourly-index naming: OpenSearch rotation "Every hour"
#: produces ``sensor-log-YYYY-MM-DD-HH`` (README.md:110); we keep the
#: same ``YYYY-MM-DD-HH`` bucket as a partition-friendly string.
HOUR_FMT_SPARK = "yyyy-MM-dd-HH"
HOUR_FMT_DUCK = "%Y-%m-%d-%H"


def log_hour(col: str = "ts") -> F.Column:
    """Event-ingest-hour partition key (Table A11 rotation analogue)."""
    return F.date_format(F.col(col), HOUR_FMT_SPARK).alias("log_hour")


@register(
    "hourly_avg_value",
    oracle=f"""
    SELECT strftime(ts, '{HOUR_FMT_DUCK}') AS log_hour,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    ORDER BY log_hour
    """,
    tags=("reference", "A20", "aggregation"),
)
def hourly_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly AVG -- the reference's headline chart (Table A20/A21,
    ``assets/220715_average_temperature_bar.png``), ascending hour (A24)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(log_hour())
        .agg(
            dec_avg("value").alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("log_hour")
    )


@register(
    "hourly_avg_by_type",
    oracle=f"""
    SELECT strftime(ts, '{HOUR_FMT_DUCK}') AS log_hour,
           event_type,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY log_hour, event_type
    """,
    tags=("reference", "A20", "A21", "aggregation"),
)
def hourly_avg_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20/A21 generalized to multiple measures: hourly average per
    event_type (the reference ran one chart per metric; one grouped
    plan covers all metrics in a single shuffle)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(log_hour(), F.col("event_type"))
        .agg(dec_avg("value").alias("avg_value"))
        .orderBy("log_hour", "event_type")
    )


@register(
    "histogram_max_value",
    oracle="""
    SELECT CAST(floor(event_id / 500) * 500 AS BIGINT) AS bucket,
           max(value) AS max_value,
           min(value) AS min_value
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("reference", "A22", "A23", "aggregation"),
)
def histogram_max_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-bucket MAX (Table A22/A23): the reference's Kibana line
    chart buckets the monotonic ``count`` field into ~500-wide bins and
    plots max(temperature).  ``event_id`` is the corpus's monotonic
    counter.  min/max need no float rounding (no accumulation)."""
    events = load(spark, sf_dir, "events")
    bucket = (F.floor(F.col("event_id") / 500) * 500).cast("long").alias("bucket")
    return (
        events.groupBy(bucket)
        .agg(F.max("value").alias("max_value"), F.min("value").alias("min_value"))
        .orderBy("bucket")
    )


@register(
    "value_props_corr",
    oracle="""
    SELECT round(corr(value, CAST(props ->> '$.k' AS DOUBLE)), 6) + 0.0 AS corr_value_k,
           count(*) AS n
    FROM events
    """,
    tags=("reference", "A25", "aggregation", "json"),
)
def value_props_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (Table A25): the reference's stated analytic
    objective (temp/humidity inverse relation, README.md:122-123) was
    eyeballed from charts; the engine computes it.  Also exercises JSON
    extraction from ``props`` (Table A5 inverse)."""
    events = parallelize_small(load(spark, sf_dir, "events"))
    k = F.get_json_object("props", "$.k").cast("double")
    return events.agg(
        F.round(F.corr(F.col("value"), k), 6).alias("corr_value_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "hourly_corr",
    oracle=f"""
    SELECT strftime(ts, '{HOUR_FMT_DUCK}') AS log_hour,
           round(corr(value, CAST(props ->> '$.k' AS DOUBLE)), 6) + 0.0 AS corr_value_k
    FROM events
    GROUP BY 1
    HAVING count(*) >= 5
    ORDER BY log_hour
    """,
    tags=("reference", "A25", "aggregation"),
)
def hourly_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour correlation (A25 x A20): what the reference would have
    needed to actually quantify its hourly temp/humidity claim.

    Pearson r from its sum-form moments with ``try_divide``: groups
    with zero variance (single-row / constant hours, present at small
    SFs) yield NULL instead of ANSI-mode division-by-zero -- matching
    DuckDB's corr() NULL semantics.
    """
    events = parallelize_small(load(spark, sf_dir, "events"))
    k = F.get_json_object("props", "$.k").cast("double")
    v = F.col("value")
    agged = events.groupBy(log_hour()).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(v).alias("_sx"),
        F.sum(k).alias("_sy"),
        F.sum(v * v).alias("_sxx"),
        F.sum(k * k).alias("_syy"),
        F.sum(v * k).alias("_sxy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.sqrt(F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")) * F.sqrt(
        F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    )
    return (
        agged.where(F.col("_n") >= 5)
        .select(
            "log_hour", F.round(F.try_divide(num, den), 6).alias("corr_value_k")
        )
        .orderBy("log_hour")
    )


@register(
    "row_transform_flatten",
    oracle="""
    SELECT event_id,
           user_id,
           event_type,
           value,
           CAST(props ->> '$.k' AS BIGINT) AS prop_k,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    ORDER BY event_id
    """,
    tags=("reference", "A2", "A3", "A5", "projection"),
)
def row_transform_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer row construction (Table A2/A3/A5): nest measurements into
    a struct (the SenseHAT ``orientation`` dict analogue), then flatten
    by struct-field projection -- exactly the ``sensor_publish.py:59-75``
    un-nesting -- plus the ``'%Y-%m-%d %H:%M:%S'`` event-time formatting
    of ``sensor_publish.py:62-63``.  Pure narrow projection: no shuffle."""
    events = load(spark, sf_dir, "events")
    nested = events.select(
        "event_id",
        F.struct(
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        ).alias("payload"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )
    return nested.select(
        "event_id",
        F.col("payload.user_id").alias("user_id"),
        F.col("payload.event_type").alias("event_type"),
        F.col("payload.value").alias("value"),
        F.col("payload.prop_k").alias("prop_k"),
        "ts_str",
    ).orderBy("event_id")


@register(
    "json_serialize",
    oracle="""
    SELECT event_id,
           '{"event_type":"' || event_type || '","user_id":' || user_id || '}'
               AS payload_json
    FROM events
    WHERE event_type IN ('purchase', 'error')
    ORDER BY event_id
    """,
    tags=("reference", "A5", "json"),
)
def json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON sink-encode (Table A5, ``json.dumps`` at sensor_publish.py:80):
    ``to_json(struct(...))`` -- the JVM-side serializer, not a Python UDF.
    Filter comes first so Catalyst pushes it into the parquet scan."""
    events = load(spark, sf_dir, "events")
    return (
        events.where(F.col("event_type").isin("purchase", "error"))
        .select(
            "event_id",
            F.to_json(F.struct("event_type", "user_id")).alias("payload_json"),
        )
        .orderBy("event_id")
    )


@register(
    "monotonic_sequence",
    oracle="""
    SELECT event_id,
           row_number() OVER (ORDER BY ts, event_id) - 1 AS seq
    FROM events
    WHERE user_id = 7
    ORDER BY event_id
    """,
    tags=("reference", "A4", "window"),
)
def monotonic_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic publish counter (Table A4, ``count`` at
    sensor_publish.py:47,74,83) as a batch sequence: row_number over
    event time.  Filtered to one device/user first -- a global
    unpartitioned window is a single-task sort, so the scalable form
    always sequences per device (as the producer does)."""
    events = load(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.orderBy("ts", "event_id")
    return (
        events.where(F.col("user_id") == 7)
        .select("event_id", (F.row_number().over(w) - 1).cast("long").alias("seq"))
        .orderBy("event_id")
    )


@register(
    "dedup_at_least_once",
    oracle="""
    WITH doubled AS (SELECT * FROM events UNION ALL SELECT * FROM events)
    SELECT count(*) AS n_after_dedup,
           (SELECT count(*) FROM doubled) AS n_before_dedup
    FROM (SELECT DISTINCT event_id FROM doubled)
    """,
    tags=("reference", "A6", "dedup"),
)
def dedup_at_least_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once correction (Table A6): MQTT QoS1
    (``sensor_publish.py:81``) admits duplicate deliveries; the reference
    never dedups.  Simulate redelivery (union with self) and collapse on
    the natural key with dropDuplicates -- the batch analogue of
    streaming ``dropDuplicatesWithinWatermark``."""
    events = load(spark, sf_dir, "events")
    doubled = events.unionByName(events)
    n_before = doubled.count()
    deduped = doubled.dropDuplicates(["event_id"])
    return deduped.agg(
        F.count(F.lit(1)).alias("n_after_dedup"),
        F.lit(n_before).cast("long").alias("n_before_dedup"),
    )


@register(
    "compaction_projection",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY event_id
    """,
    tags=("reference", "A14", "projection"),
)
def compaction_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CTAS compaction's ``SELECT {columns}`` projection (Table A14,
    ``sensor-log-compactor.py:24,34-35``): column-pruned scan -- the
    parquet reader reads only these columns (check ReadSchema in
    explain).  The write/coalesce half lives in
    ``operators/compaction.py`` and is exercised by tests."""
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH stage1 AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    stage2 AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN stage1 s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id
    ),
    stage3 AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN stage2 s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.click_ts
      GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, count(*) AS n_users FROM stage1
    UNION ALL SELECT 'signup>click', count(*) FROM stage2
    UNION ALL SELECT 'signup>click>purchase', count(*) FROM stage3
    ORDER BY stage
    """,
    tags=("analytics", "funnel", "events"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: users progressing signup -> later click ->
    later purchase.  Each stage is a keyed min-aggregate semi-joined to
    the previous stage's earliest-time -- one shuffle per stage, no
    per-user iteration."""
    events = load(spark, sf_dir, "events")

    def first_after(event_type: str, prev, prev_ts: str, out_ts: str):
        src = events.where(F.col("event_type") == event_type).select(
            "user_id", "ts"
        )
        if prev is not None:
            src = src.join(prev, "user_id").where(F.col("ts") > F.col(prev_ts))
        return src.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    s1 = first_after("signup", None, "", "signup_ts")
    s2 = first_after("click", s1, "signup_ts", "click_ts")
    s3 = first_after("purchase", s2, "click_ts", "purchase_ts")

    def tally(df, stage):
        return df.agg(
            F.lit(stage).alias("stage"), F.count(F.lit(1)).alias("n_users")
        ).select("stage", "n_users")

    return (
        tally(s1, "signup")
        .unionByName(tally(s2, "signup>click"))
        .unionByName(tally(s3, "signup>click>purchase"))
        .orderBy("stage")
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
             CAST(date_diff('day', date_trunc('week', f.first_ts),
                            date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, count(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    tags=("analytics", "cohort", "events"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, counted
    per subsequent active week -- the standard retention triangle.  One
    keyed min-aggregate + one distinct per (user, week) + one count."""
    events = load(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohort_start = F.date_trunc("week", F.col("first_ts"))
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            F.date_format(cohort_start, "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), cohort_start) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "gapfill_10min_interpolated",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(to_timestamp(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600)
                  AS TIMESTAMP) AS bucket,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v_raw
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(min(bucket), max(bucket),
                                    INTERVAL 600 SECOND)) AS bucket
      FROM b GROUP BY event_type
    ),
    j AS (
      SELECT s.event_type, s.bucket, coalesce(b.n, 0) AS n, b.v_raw
      FROM spine s LEFT JOIN b ON s.event_type = b.event_type
                               AND s.bucket = b.bucket
    ),
    f AS (
      SELECT event_type, bucket, n, v_raw,
        last_value(v_raw IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v_raw IS NOT NULL THEN CAST(epoch(bucket) AS DOUBLE) END
                   IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        first_value(v_raw IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v_raw IS NOT NULL THEN CAST(epoch(bucket) AS DOUBLE) END
                    IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM j
    )
    SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M') AS bucket, n,
           floor(v_raw * 1000000.0 + 0.5) / 1000000.0 AS v_avg,
           floor(pv * 1000000.0 + 0.5) / 1000000.0 AS v_locf,
           floor((CASE WHEN v_raw IS NOT NULL THEN v_raw
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv) * ((CAST(epoch(bucket) AS DOUBLE) - pb) / (nb - pb))
                  END) * 1000000.0 + 0.5) / 1000000.0 AS v_interp
    FROM f
    ORDER BY event_type, bucket
    """,
    tags=("reference", "timeseries", "gapfill", "window"),
)
def gapfill_10min_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 10-minute sensor averages with LOCF and linear
    interpolation -- the hypertable `time_bucket_gapfill`/`locf`/
    `interpolate` trio the reference's Kibana charts silently lack
    (missing buckets simply vanish from an OpenSearch date_histogram;
    README.md:113-123 charts).  Spine via per-series `sequence` +
    `explode`, fills via IGNORE-NULLS windows -- all JVM-side, windows
    partitioned per series (see operators/timeseries.py scale notes)."""
    from ..operators import timeseries as TS

    events = load(spark, sf_dir, "events")
    bucketed = events.groupBy(
        "event_type", TS.time_bucket("ts", 600).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (dec_sum("value") / F.count(F.lit(1))).alias("v_raw"),
    )
    spine = TS.gapfill_spine(bucketed, ["event_type"], "bucket", 600)
    dense = spine.join(bucketed, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("n", F.lit(0)).alias("n"), "v_raw"
    )
    # Fills run on the UNROUNDED (but cross-engine bit-identical,
    # exact-decimal-numerator) averages, and outputs round via
    # round_half_up: interpolation of scale-2 inputs lands on exact
    # .5 rounding ties (fractions like m/32 -> 7-digit terminating
    # decimals), where Spark round() and DuckDB round() disagree.
    filled = dense.select(
        "event_type",
        "bucket",
        "n",
        round_half_up(F.col("v_raw")).alias("v_avg"),
        round_half_up(TS.locf("v_raw", ["event_type"], "bucket")).alias("v_locf"),
        round_half_up(
            TS.linear_interpolate("v_raw", ["event_type"], "bucket")
        ).alias("v_interp"),
    )
    return filled.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm").alias("bucket"),
        "n",
        "v_avg",
        "v_locf",
        "v_interp",
    ).orderBy("event_type", "bucket")


@register(
    "anomaly_rolling_zscore",
    oracle="""
    WITH r AS (
      SELECT event_type, event_id, value,
             count(*) OVER w AS n,
             sum(value) OVER w AS s,
             sum(value * value) OVER w AS ss
      FROM events
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id, value,
           round((value - s / n) / sqrt((ss - s * s / n) / (n - 1)), 4) + 0.0 AS z
    FROM r
    WHERE n >= 5
    ORDER BY abs((value - s / n) / sqrt((ss - s * s / n) / (n - 1))) DESC, event_id
    LIMIT 100
    """,
    tags=("reference", "timeseries", "anomaly", "window"),
)
def anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly scoring: each reading's z-score against
    its series' trailing-hour mean/std (RANGE frame on epoch seconds,
    same boundary discipline as window_range_trailing_hour), top-100
    most anomalous readings -- the alerting pass an IoT sensor pipeline
    runs that the reference's dashboards leave to the human eye.
    Sum-form variance (same try_divide discipline as hourly_corr) so
    thin windows yield NULL z instead of ANSI division errors, and the
    oracle shares the exact operand tree."""
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3599, Window.currentRow)
    )
    v = F.col("value")
    r = events.select(
        "event_type",
        "event_id",
        v.alias("value"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(v).over(w).alias("s"),
        F.sum(v * v).over(w).alias("ss"),
    )
    z = F.try_divide(
        F.col("value") - F.col("s") / F.col("n"),
        F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)),
    )
    # Rank on the UNROUNDED score (the oracle does too): ordering by the
    # rounded z would make the rank-100 cutoff depend on 4dp ties.
    top = (
        r.where(F.col("n") >= 5)
        .select("event_type", "event_id", "value", z.alias("z_raw"))
        .orderBy(F.abs(F.col("z_raw")).desc(), F.col("event_id"))
        .limit(100)
    )
    return top.select(
        "event_type", "event_id", "value", F.round("z_raw", 4).alias("z")
    )


@register(
    "events_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             lag(event_type, 2) OVER w AS p2,
             lag(event_type, 1) OVER w AS p1,
             event_type AS et
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 || ' > ' || p1 || ' > ' || et AS path,
           count(*) AS n_occurrences
    FROM seq
    WHERE p2 IS NOT NULL AND p1 IS NOT NULL
    GROUP BY path
    ORDER BY n_occurrences DESC, path
    LIMIT 20
    """,
    tags=("analytics", "events", "paths"),
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: the 20 most common 3-step event-type
    sequences across users (the 'common journeys' query behind funnel
    design).  Per-user lag windows form the trigrams (partitioned --
    never a global sort), a path-keyed hash agg counts them (map-side
    combined), and the top-20 is TakeOrderedAndProject.  Deterministic:
    ts ties broken by event_id, count ties by path string."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("event_type", 1).over(w).alias("p1"),
        F.col("event_type").alias("et"),
    )
    return (
        seq.where(F.col("p2").isNotNull() & F.col("p1").isNotNull())
        .select(F.concat_ws(" > ", "p2", "p1", "et").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(20)
    )


@register(
    "basket_part_cooccurrence",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_orders
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, n_orders
    FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
    tags=("analytics", "basket", "cooccurrence"),
)
def basket_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the frequent-itemset pair pass):
    the 20 part pairs most often bought in the same order.  The
    self-join is ORDER-keyed, so cost is the sum of per-basket squares
    (baskets are bounded, ~4-13 items) -- never a corpus cross join;
    the pair rollup is a hash agg with map-side combine, and top-20 is
    TakeOrderedAndProject.  Deterministic tie-break on the part ids."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


#: Truncated-EWMA lag weights: alpha * (1 - alpha)^j for lags j = 0..9.
#: The closed-form infinite EWMA needs (1-a)^(-i) factors that overflow
#: at series length ~10^4, so production TSDBs (and this engine) window
#: it: with alpha = 0.3 the lag-10 tail carries (1-a)^10 < 3% of the
#: mass.  The literals are interpolated into BOTH the Spark plan and
#: the oracle SQL from this one list, folded in the same lag order, so
#: the doubles agree bit-for-bit before the shared rounding.
_EWMA_ALPHA = 0.3
_EWMA_WEIGHTS = tuple(_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** j for j in range(10))

_EWMA_NUM_SQL = " + ".join(
    f"coalesce(lag(value, {j}) OVER w, 0.0) * {w!r}"
    for j, w in enumerate(_EWMA_WEIGHTS)
)
_EWMA_DEN_SQL = " + ".join(
    f"(CASE WHEN lag(value, {j}) OVER w IS NOT NULL THEN {w!r} ELSE 0.0 END)"
    for j, w in enumerate(_EWMA_WEIGHTS)
)


@register(
    "timeseries_ewma_smooth",
    oracle=f"""
    SELECT event_type, event_id, value,
           round(({_EWMA_NUM_SQL}) / ({_EWMA_DEN_SQL}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ORDER BY event_type, event_id
    """,
    tags=("reference", "timeseries", "window"),
)
def timeseries_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per series -- the
    smoothing pass behind every sensor dashboard trend line (the
    reference's Kibana charts plot raw hourly means).  Expressed as a
    10-lag weighted sum over an ordered window: pure JVM window
    expressions, one shuffle on the series key, weights renormalized
    over the lags that exist so the series head is unbiased."""
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j, wt in enumerate(_EWMA_WEIGHTS):
        lagged = F.lag("value", j).over(w)
        num = num + F.coalesce(lagged, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return events.select(
        "event_type",
        "event_id",
        "value",
        F.round(num / den, 6).alias("ewma"),
    ).orderBy("event_type", "event_id")


@register(
    "timeseries_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT event_type, value,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_s,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             CAST(floor(epoch(lead(ts) OVER (PARTITION BY event_type
                                             ORDER BY ts, event_id))) AS BIGINT)
               AS next_s
      FROM events
    ),
    d AS (
      SELECT event_type, bucket_s, value,
             least(coalesce(next_s, bucket_s + 3600), bucket_s + 3600) - ts_s
               AS dt
      FROM s
    )
    SELECT event_type,
           strftime(make_timestamp(bucket_s * 1000000), '%Y-%m-%d %H:%M') AS bucket,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2)) * dt) AS DOUBLE)
                 / sum(dt), 6) AS twa
    FROM d
    GROUP BY event_type, bucket_s
    HAVING sum(dt) > 0
    ORDER BY event_type, bucket_s
    """,
    tags=("reference", "timeseries", "window"),
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted hourly average per series (the TSDB
    ``time_weight`` aggregate): each reading holds (LOCF) until the
    next same-series reading or the end of its hour bucket, so
    irregular sampling does not bias the hourly mean toward bursts --
    the statistic the reference's count-weighted Kibana averages get
    wrong whenever devices report at different rates.  One lead()
    window plus one hash agg; the value*seconds numerator accumulates
    in exact decimal (``plans/_numeric`` discipline) so both engines
    agree bit-for-bit."""
    from pyspark.sql.window import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = events.select(
        "event_type",
        "value",
        F.date_trunc("hour", F.col("ts")).cast("long").alias("bucket_s"),
        F.col("ts").cast("long").alias("ts_s"),
        F.lead("ts").over(w).cast("long").alias("next_s"),
    )
    d = s.select(
        "event_type",
        "bucket_s",
        "value",
        (
            F.least(
                F.coalesce(F.col("next_s"), F.col("bucket_s") + 3600),
                F.col("bucket_s") + 3600,
            )
            - F.col("ts_s")
        ).alias("dt"),
    )
    return (
        d.groupBy("event_type", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)") * F.col("dt"))
                .cast("double")
                / F.sum("dt"),
                6,
            ).alias("twa"),
            F.sum("dt").alias("__sum_dt"),
        )
        .where(F.col("__sum_dt") > 0)
        .select(
            "event_type",
            F.date_format(F.timestamp_seconds("bucket_s"), "yyyy-MM-dd HH:mm").alias(
                "bucket"
            ),
            "n",
            "twa",
            "bucket_s",
        )
        .orderBy("event_type", "bucket_s")
        .drop("bucket_s")
    )


@register(
    "anomaly_robust_zscore",
    oracle="""
    WITH m1 AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    m2 AS (
      SELECT e.event_type, min(m1.med) AS med,
             quantile_cont(abs(e.value - m1.med), 0.5) AS mad
      FROM events e JOIN m1 USING (event_type)
      GROUP BY e.event_type
    )
    SELECT event_type, event_id, value,
           round(0.6745 * (value - med) / mad, 4) + 0.0 AS robust_z
    FROM events JOIN m2 USING (event_type)
    WHERE mad > 0
    ORDER BY abs(0.6745 * (value - med) / mad) DESC, event_id
    LIMIT 100
    """,
    tags=("reference", "timeseries", "anomaly"),
)
def anomaly_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier scoring (0.6745 * (x - median) / MAD -- the
    robust z-score): unlike ``anomaly_rolling_zscore``'s mean/std, a
    burst of outliers cannot inflate the scale estimate and mask
    itself (50% breakdown point vs 0).  Two exact-percentile hash aggs
    over the 5-series key plus two 5-row broadcast joins -- the
    per-series statistics are sketch-sized at any corpus scale; ranked
    on the unrounded score, event-id tiebreak, top 100."""
    events = load(spark, sf_dir, "events")
    m1 = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    m2 = (
        events.join(F.broadcast(m1), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            ),
        )
    )
    z = 0.6745 * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        events.join(F.broadcast(m2), "event_type")
        .where(F.col("mad") > 0)
        .select("event_type", "event_id", "value", z.alias("__z"))
        .orderBy(F.abs(F.col("__z")).desc(), "event_id")
        .limit(100)
        .select("event_type", "event_id", "value", F.round("__z", 4).alias("robust_z"))
    )


@register(
    "logs_clf_parse_roundtrip",
    oracle=r"""
    WITH lines AS (
      SELECT printf('10.0.%d.%d - user%d [%s +0000] "GET /api/%s HTTP/1.1" %d %s',
                    user_id % 250, event_id % 250, user_id,
                    strftime(ts, '%d/%b/%Y:%H:%M:%S'),
                    event_type,
                    200 + (event_id % 3) * 100,
                    CASE WHEN event_id % 10 = 0 THEN '-'
                         ELSE CAST(CAST(floor(abs(value) * 100) AS BIGINT)
                                   AS VARCHAR) END) AS line
      FROM events
    ),
    p AS (
      SELECT regexp_extract(line,
               '^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)$',
               6) AS path,
             CAST(regexp_extract(line,
               '^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)$',
               8) AS INT) AS status,
             CASE WHEN regexp_extract(line,
               '^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)$',
               9) = '-' THEN NULL
             ELSE CAST(regexp_extract(line,
               '^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+|-)$',
               9) AS BIGINT) END AS n_bytes
      FROM lines
    )
    SELECT path, status,
           count(*) AS n_requests,
           CAST(coalesce(sum(n_bytes), 0) AS BIGINT) AS total_bytes,
           CAST(sum(CASE WHEN n_bytes IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_no_content
    FROM p GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("reference", "logs", "parsing"),
)
def logs_clf_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Log-Format parse roundtrip
    (``operators/text.py:parse_common_log``): events are formatted as
    CLF access-log lines JVM-side (deterministic host/user/status/
    bytes derivations, '-' no-content markers included), parsed back
    through the grok-style nine-group regex struct, and aggregated per
    (path, status) -- the scan-side extraction every log-analytics
    ingest runs first, proven against DuckDB replaying the identical
    format + regex + aggregate.  Pure codegen end to end: one regex
    program per row, no UDF."""
    from ..operators.text import parse_common_log

    ev = load(spark, sf_dir, "events")
    bytes_s = (
        F.when(F.col("event_id") % 10 == 0, F.lit("-"))
        .otherwise(
            F.floor(F.abs(F.col("value")) * 100).cast("long").cast("string")
        )
    )
    line = F.format_string(
        '10.0.%d.%d - user%d [%s +0000] "GET /api/%s HTTP/1.1" %d %s',
        F.col("user_id") % 250,
        F.col("event_id") % 250,
        F.col("user_id"),
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
        F.col("event_type"),
        (F.lit(200) + (F.col("event_id") % 3) * 100).cast("int"),
        bytes_s,
    )
    parsed = ev.select(parse_common_log(line).alias("p"))
    return (
        parsed.groupBy(
            F.col("p.path").alias("path"), F.col("p.status").alias("status")
        )
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.coalesce(F.sum("p.n_bytes"), F.lit(0)).alias("total_bytes"),
            F.sum(F.col("p.n_bytes").isNull().cast("long")).alias("n_no_content"),
        )
        .orderBy("path", "status")
    )


@register(
    "anomaly_seasonal_residual",
    oracle="""
    WITH base AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS h,
             avg(value) AS mu, stddev_pop(value) AS sd
      FROM events GROUP BY 1, 2
    )
    SELECT e.event_type, e.event_id, e.value,
           CAST(EXTRACT(hour FROM e.ts) AS INT) AS season_hour,
           round((e.value - b.mu) / b.sd, 4) + 0.0 AS residual_z
    FROM events e
    JOIN base b ON e.event_type = b.event_type
               AND EXTRACT(hour FROM e.ts) = b.h
    WHERE b.sd > 0
    ORDER BY abs((e.value - b.mu) / b.sd) DESC, e.event_id
    LIMIT 100
    """,
    tags=("reference", "timeseries", "anomaly", "seasonal"),
)
def anomaly_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline residual anomalies
    (``operators/timeseries.py:seasonal_residual_anomalies``): per
    (series, hour-of-day) mean/std baseline, residual z-score, top-100
    by |z| -- the detector diurnal telemetry needs, where a reading
    normal at 14:00 is an outlier at 03:00 and a global z-score
    averages the cycle into both the mean and an inflated sigma.  The
    baseline table is series x 24 rows (seasonality-sized, broadcast)
    whatever the corpus size; one hash agg + one in-row residual."""
    from ..operators.timeseries import seasonal_residual_anomalies

    events = load(spark, sf_dir, "events")
    scored = seasonal_residual_anomalies(
        events, ts_col="ts", value_col="value", series_col="event_type"
    )
    return (
        scored.orderBy(F.abs(F.col("residual_z")).desc(), "event_id")
        .limit(100)
        .select(
            "event_type",
            "event_id",
            "value",
            F.col("season_hour").cast("int").alias("season_hour"),
            F.round("residual_z", 4).alias("residual_z"),
        )
    )


@register(
    "copurchase_triangles",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM po a JOIN po b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM e e1
      JOIN e e2 ON e1.pb = e2.pa
      JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    parts AS (
      SELECT a AS part FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT part AS l_partkey, count(*) AS n_triangles
    FROM parts
    GROUP BY part
    ORDER BY n_triangles DESC, part
    LIMIT 100
    """,
    tags=("reference", "graph"),
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts bought
    together in >= 2 orders are edges; a triangle is a stable product
    trio) -- the classic distributed-graph aggregate, expressed as the
    oriented-edge two-join chain: every edge is stored only as
    (low id -> high id), so each triangle is enumerated exactly once
    and the join fan-out is bounded by the support-2 edge list, never
    the raw basket pairs.  At 100 TB the support threshold is the
    degree bound: frequent-pair pruning (>= 2 co-orders) runs first as
    a hash agg, and the two equi-joins shuffle only the surviving
    edges on their endpoint keys."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("pa", "pb")
    )
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    parts = (
        tri.select(F.col("a").alias("part"))
        .unionAll(tri.select(F.col("b").alias("part")))
        .unionAll(tri.select(F.col("c").alias("part")))
    )
    return (
        parts.groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "part")
        .limit(100)
        .select(F.col("part").alias("l_partkey"), "n_triangles")
    )


@register(
    "anomaly_cusum_shifts",
    oracle="""
    WITH RECURSIVE stats AS (
      SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY user_id
    ),
    seq AS (
      SELECT e.user_id, e.event_id,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn,
             CASE WHEN s.sd IS NULL OR s.sd = 0.0 THEN 0.0
                  ELSE round((e.value - s.mu) / s.sd, 6) END AS z
      FROM events e JOIN stats s USING (user_id)
    ),
    rec AS (
      SELECT user_id, event_id, rn,
             greatest(0.0, z - 0.5) AS s_hi,
             least(0.0, z + 0.5) AS s_lo,
             (greatest(0.0, z - 0.5) > 4.0
              OR least(0.0, z + 0.5) < -4.0) AS alarm,
             CASE WHEN greatest(0.0, z - 0.5) > 4.0
                    OR least(0.0, z + 0.5) < -4.0
                  THEN 0.0 ELSE greatest(0.0, z - 0.5) END AS carry_hi,
             CASE WHEN greatest(0.0, z - 0.5) > 4.0
                    OR least(0.0, z + 0.5) < -4.0
                  THEN 0.0 ELSE least(0.0, z + 0.5) END AS carry_lo
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn,
             greatest(0.0, r.carry_hi + s.z - 0.5),
             least(0.0, r.carry_lo + s.z + 0.5),
             (greatest(0.0, r.carry_hi + s.z - 0.5) > 4.0
              OR least(0.0, r.carry_lo + s.z + 0.5) < -4.0),
             CASE WHEN greatest(0.0, r.carry_hi + s.z - 0.5) > 4.0
                    OR least(0.0, r.carry_lo + s.z + 0.5) < -4.0
                  THEN 0.0 ELSE greatest(0.0, r.carry_hi + s.z - 0.5) END,
             CASE WHEN greatest(0.0, r.carry_hi + s.z - 0.5) > 4.0
                    OR least(0.0, r.carry_lo + s.z + 0.5) < -4.0
                  THEN 0.0 ELSE least(0.0, r.carry_lo + s.z + 0.5) END
      FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id,
           round(s_hi, 6) AS s_hi, round(s_lo, 6) + 0.0 AS s_lo, alarm
    FROM rec
    ORDER BY user_id, rn
    """,
    tags=("timeseries", "anomaly", "cusum", "changepoint"),
)
def anomaly_cusum_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point chart (Page 1954;
    ``operators/timeseries.py:cusum_alarms``): per user, the running
    high/low cumulative sums of the standardized value with
    slack k = 0.5 sigma, alarm at h = 4, reset after alarm -- the
    sequential detector for SUSTAINED mean shifts that per-row
    z-scores miss.  The recurrence-with-reset is not a window
    function, so it runs as one grouped Arrow fold per series; z is
    rounded to 6dp BEFORE the fold so the oracle's recursive-CTE
    replay folds bit-identical doubles."""
    from ..operators import timeseries as TS

    ev = parallelize_small(load(spark, sf_dir, "events"))
    out = TS.cusum_alarms(
        ev.select("user_id", "event_id", "ts", "value"),
        "value",
        ["user_id"],
        ["ts", "event_id"],
        k=0.5,
        h=4.0,
    )
    return out.select("user_id", "event_id", "s_hi", "s_lo", "alarm").orderBy(
        "user_id", "ts", "event_id"
    )


@register(
    "funnel_time_bound",
    oracle="""
    WITH stage1 AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    stage2 AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN stage1 s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
        AND e.ts <= s.signup_ts + INTERVAL 48 HOUR
      GROUP BY e.user_id
    ),
    stage3 AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN stage2 s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.click_ts
        AND e.ts <= s.click_ts + INTERVAL 48 HOUR
      GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, count(*) AS n_users FROM stage1
    UNION ALL SELECT 'signup>click<=48h', count(*) FROM stage2
    UNION ALL SELECT 'signup>click<=48h>purchase<=48h', count(*) FROM stage3
    ORDER BY stage
    """,
    tags=("analytics", "funnel", "events", "conversion-window"),
)
def funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: like ``funnel_conversion`` but each
    stage must land within 48 h of the previous stage's first event --
    the product-analytics semantics ('converted within N days'), where
    the unbounded funnel overstates late conversions.  Same plan
    shape: one keyed min-agg + previous-stage equi-join per stage; the
    window is an extra in-row predicate, not an extra shuffle."""
    events = load(spark, sf_dir, "events")
    gap = F.expr("INTERVAL 48 HOURS")

    def first_within(event_type: str, prev, prev_ts: str, out_ts: str):
        src = events.where(F.col("event_type") == event_type).select(
            "user_id", "ts"
        )
        if prev is not None:
            src = (
                src.join(prev, "user_id")
                .where(F.col("ts") > F.col(prev_ts))
                .where(F.col("ts") <= F.col(prev_ts) + gap)
            )
        return src.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    s1 = first_within("signup", None, "", "signup_ts")
    s2 = first_within("click", s1, "signup_ts", "click_ts")
    s3 = first_within("purchase", s2, "click_ts", "purchase_ts")

    def tally(df, stage):
        return df.agg(
            F.lit(stage).alias("stage"), F.count(F.lit(1)).alias("n_users")
        ).select("stage", "n_users")

    return (
        tally(s1, "signup")
        .unionByName(tally(s2, "signup>click<=48h"))
        .unionByName(tally(s3, "signup>click<=48h>purchase<=48h"))
        .orderBy("stage")
    )
