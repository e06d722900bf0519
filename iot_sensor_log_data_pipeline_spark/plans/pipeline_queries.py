"""Pipeline-lifecycle catalog queries: source-format scans (JSON/CSV
roundtrips), the compaction job end-to-end, and the sensor simulator's
golden-shape analytics -- each verified against the DuckDB oracle on
the ORIGINAL corpus (so the whole write->read->aggregate cycle must be
lossless to pass).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load
from ..operators.compaction import compact_json_logs
from ..schemas import EVENTS
from ..sources.sensor import sensor_batch
from ._numeric import dec_avg
from .catalog import register

# Per-process scratch root: a PID suffix keeps concurrent runs (driver
# verify alongside pytest/bench) from rmtree-ing each other's inputs.
SCRATCH = os.path.join(
    os.environ.get("ENGINE_SCRATCH_DIR", "/tmp/engine_scratch"), f"pid{os.getpid()}"
)


def _scratch(name: str) -> str:
    path = os.path.join(SCRATCH, name)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


@register(
    "scan_json_roundtrip",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("pipeline", "source", "json"),
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+scan (Table A10/A14 storage layout): write the
    events table as JSON files, scan them back with the explicit schema,
    aggregate -- must equal aggregating the original parquet, proving
    the JSON codec is lossless for every column type (timestamps
    included, micros preserved)."""
    path = _scratch("json_roundtrip")
    # Default JSON timestampFormat is millis -- write/read micros
    # explicitly or the roundtrip silently truncates event times.
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    (
        load(spark, sf_dir, "events")
        .write.mode("overwrite")
        .option("timestampFormat", ts_fmt)
        .json(path)
    )
    back = spark.read.schema(EVENTS).option("timestampFormat", ts_fmt).json(path)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("min_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "scan_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("pipeline", "source", "csv"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+scan (Table B CSV source): header=true write, explicit-
    schema read (never inferSchema -- it double-scans the input)."""
    path = _scratch("csv_roundtrip")
    (
        load(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )
    from ..schemas import ORDERS

    back = (
        spark.read.schema(ORDERS)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "compaction_roundtrip",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d-%H') AS log_hour,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY log_hour
    """,
    tags=("pipeline", "compaction", "A14"),
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's compaction job end-to-end (Table A13-A17): land
    events as many small JSON files ('logs/', the Firehose flushes),
    fire the count-gated compactor (parity mode: coalesce(1) + GZIP,
    timestamped dest), scan the compacted output, and run the A20
    hourly aggregate -- which must match aggregating the pristine
    corpus.  Exercises trigger predicate, projection, single-file GZIP
    write, source truncation, and lossless re-scan in one query."""
    from datetime import datetime

    logs = _scratch("compaction_logs")
    dest_root = _scratch("compaction_out")

    events = load(spark, sf_dir, "events")
    wire = events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    wire.repartition(10).write.mode("overwrite").json(logs)

    import pyspark.sql.types as T

    wire_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    result = compact_json_logs(
        spark,
        logs,
        os.path.join(dest_root, "events_compacted"),
        run_ts=datetime(2022, 7, 15, 5, 0),  # deterministic dest suffix
        schema=wire_schema,
        mode="parity",
    )
    back = spark.read.schema(wire_schema).json(result.dest)
    return (
        back.select(F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"), "value")
        .groupBy(F.date_format("ts", "yyyy-MM-dd-HH").alias("log_hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_avg("value").alias("avg_value"),
        )
        .orderBy("log_hour")
    )


@register(
    "sensor_hourly_golden",
    oracle="""
    WITH g AS (SELECT unnest(generate_series(0, 49999)) AS id),
    s AS (
      SELECT TIMESTAMP '2022-07-14 15:00:00' + to_seconds(id) AS ts,
             34.0 + 6.0 * sin(CAST(id AS DOUBLE) / 3600.0 * 2 * pi() / 14.0)
               AS temperature,
             58.0 - 15.0 * sin(CAST(id AS DOUBLE) / 3600.0 * 2 * pi() / 14.0)
               AS humidity
      FROM g
    )
    SELECT strftime(ts, '%Y-%m-%d-%H') AS log_hour,
           round(avg(temperature), 6) AS avg_temperature,
           round(avg(humidity), 6) AS avg_humidity,
           count(*) AS n
    FROM s
    GROUP BY 1
    ORDER BY log_hour
    """,
    tags=("pipeline", "sensor", "A20", "A21"),
)
def sensor_hourly_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's published run, reproduced: ~50,000 messages at
    1 Hz from 2022-07-14 15:00 UTC (BASELINE.md run volume + index
    names), aggregated into the A20/A21 hourly bar charts.  The oracle
    regenerates the same deterministic sensor series in SQL -- engine
    and oracle must agree on generator AND aggregate."""
    sensors = sensor_batch(spark, 50_000)
    return (
        sensors.groupBy(F.date_format("timestamp", "yyyy-MM-dd-HH").alias("log_hour"))
        .agg(
            F.round(F.avg("temperature"), 6).alias("avg_temperature"),
            F.round(F.avg("humidity"), 6).alias("avg_humidity"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("log_hour")
    )


@register(
    "sensor_wire_roundtrip",
    oracle="""
    WITH g AS (SELECT unnest(generate_series(0, 4999)) AS id)
    SELECT strftime(TIMESTAMP '2022-07-14 15:00:00' + to_seconds(id),
                    '%Y-%m-%d-%H') AS log_hour,
           count(*) AS n
    FROM g
    GROUP BY 1
    ORDER BY log_hour
    """,
    tags=("pipeline", "sensor", "A5", "A6"),
)
def sensor_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer wire-format cycle (Table A5): rows -> to_json wire ->
    from_json rows, then the QoS1 dedup (A6 fix) over a doubled stream;
    returns per-hour counts after dedup -- the oracle regenerates the
    undoubled series independently, so any wire-codec loss or dedup
    failure breaks the match."""
    from ..sources.sensor import from_wire, to_wire

    sensors = sensor_batch(spark, 5_000)
    wire = to_wire(sensors)
    decoded = from_wire(wire.unionByName(wire))  # QoS1 redelivery
    deduped = decoded.dropDuplicates(["client_id", "count"])
    return (
        deduped.groupBy(
            F.date_format("timestamp", "yyyy-MM-dd-HH").alias("log_hour")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("log_hour")
    )


@register(
    "maintenance_compaction_roundtrip",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d-%H') AS log_hour,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY log_hour
    """,
    tags=("pipeline", "maintenance", "A14"),
)
def maintenance_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-format maintenance (A14 generalized): land events as a
    log_hour-partitioned parquet table with many small files per
    partition (the micro-batch-sink layout), run the OPTIMIZE-style
    size-targeted compactor over every partition, then aggregate the
    compacted table -- which must match aggregating the pristine
    corpus, proving the rewrite is row-lossless."""
    from ..operators.compaction import optimize_parquet_table

    from ..session import default_parallelism

    path = _scratch("maintenance_roundtrip")
    events = load(spark, sf_dir, "events")
    (
        events.withColumn("log_hour", F.date_format("ts", "yyyy-MM-dd-HH"))
        # Up to 8 small files per hour partition (the micro-batch-sink
        # layout), produced by a (log_hour, deterministic salt 0-7)
        # hash repartition: every task holds a few WHOLE (hour, salt)
        # groups, so the sorted dynamic-partition writer emits its
        # files from all cores at once.  The old ``repartition(8)``
        # gave 8 round-robin tasks that each wrote EVERY hour's file
        # sequentially -- measured 56 s of this row's 77 s at sf0.01,
        # pure writer serialization (round 15; guide §2.5 on synthetic
        # partition keys: the salt is derived from event_id, never
        # rand()).  The partition count is pinned (AQE would coalesce
        # the tiny exchange back to one task), scale-adaptive via the
        # core count.
        .repartition(
            default_parallelism(),
            F.col("log_hour"),
            F.pmod(F.xxhash64("event_id"), F.lit(8)),
        )
        .write.partitionBy("log_hour")
        .mode("overwrite")
        .parquet(path)
    )
    result = optimize_parquet_table(spark, path, min_files=2)
    if result.files_after >= result.files_before:
        raise RuntimeError(f"maintenance compaction did not reduce files: {result}")

    back = spark.read.parquet(path)
    from ._numeric import dec_avg

    return (
        back.groupBy("log_hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_avg("value").alias("avg_value"),
        )
        .orderBy("log_hour")
    )


@register(
    "scan_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("pipeline", "source", "orc"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+scan (columnar-format breadth beyond parquet: Spark
    ships the ORC reader/writer natively): write lineitem as zstd ORC,
    scan it back, aggregate -- must equal aggregating the original
    parquet, proving the codec is lossless for the types used
    (timestamps included)."""
    path = _scratch("orc_roundtrip")
    (
        load(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .orc(path)
    )
    back = spark.read.orc(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "scan_xml_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(sum(c_acctbal), 2) + 0.0 AS sum_acctbal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("pipeline", "source", "xml"),
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink+scan (Spark 4 built-in XML source, the
    spark-xml package folded into core): write customer as row-tagged
    XML, read back with the explicit schema, aggregate -- proves the
    XML codec roundtrips strings/longs/doubles losslessly.  Explicit
    schema on read, same discipline as CSV (no double-scan inference)."""
    from ..schemas import CUSTOMER

    path = _scratch("xml_roundtrip")
    (
        load(spark, sf_dir, "customer")
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "customers")
        .option("rowTag", "customer")
        .save(path)
    )
    back = (
        spark.read.schema(CUSTOMER)
        .format("xml")
        .option("rowTag", "customer")
        .load(path)
    )
    return (
        back.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "scan_merge_schema",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    b AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
    SELECT count(*) AS n,
           CAST(count(o_orderstatus) AS BIGINT) AS n_with_status,
           round(sum(o_totalprice), 2) AS sum_price
    FROM u
    """,
    tags=("pipeline", "source", "schema-evolution"),
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the scan (the table whose newer files
    carry columns older files lack): two parquet batches with
    different schemas under one root, read back with
    ``mergeSchema=true`` -- the union schema materializes, old files
    yield NULL for the missing column, and nothing is re-written.
    The aggregate proves row-completeness and NULL accounting."""
    path = _scratch("merge_schema")
    orders = load(spark, sf_dir, "orders")
    (
        orders.where(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "batch=a"))
    )
    (
        orders.where(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "batch=b"))
    )
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderstatus").alias("n_with_status"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "maintenance_bucketed_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("pipeline", "maintenance", "bucketing", "layout", "scale"),
)
def maintenance_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join
    (``operators/compaction.py:write_bucketed_table``): orders and
    customer are persisted as same-spec Hive-bucketed tables (16
    buckets on the customer key), then joined THROUGH THE CATALOG --
    the layout under which this join, and every future join on the
    key, runs with no exchange on either side (plan-asserted in
    ``test_bucketed_tables_join_without_exchange``; this row proves
    the bucketed write+read is value-lossless against the raw-table
    oracle).  The pay-once distribution layout a 100 TB fact table
    uses for its hottest join key."""
    import os as _os

    from ..operators.compaction import write_bucketed_table

    pid = _os.getpid()
    ta, tb = f"eng_bkt_orders_{pid}", f"eng_bkt_customer_{pid}"
    write_bucketed_table(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                             "o_totalprice"),
        ta, "o_custkey", 16, _scratch("bucketed_orders"),
    )
    write_bucketed_table(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        tb, "c_custkey", 16, _scratch("bucketed_customer"),
    )
    return (
        spark.table(ta)
        .join(spark.table(tb), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "maintenance_zorder_roundtrip",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
           min(user_id) AS min_user,
           max(user_id) AS max_user
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("pipeline", "maintenance", "zorder", "layout"),
)
def maintenance_zorder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout maintenance
    (``operators/compaction.py:zorder_write``): rewrite events
    clustered on the Morton-interleaved (user_id, value) key -- the
    multi-dimension data-skipping layout -- then aggregate the
    rewritten table, which must match aggregating the pristine corpus
    (row-lossless rewrite).  The layout benefit itself (per-file
    min/max selectivity on BOTH clustered columns vs a lexicographic
    sort) is footer-asserted in
    ``test_zorder_write_multi_column_skipping``."""
    from ..operators.compaction import zorder_write

    path = _scratch("zorder_roundtrip")
    events = load(spark, sf_dir, "events")
    n_files = zorder_write(events, path, ["user_id", "value"], n_files=8)
    if n_files != 8:
        raise RuntimeError(f"zorder_write produced {n_files} files, wanted 8")
    back = spark.read.parquet(path)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
        )
        .orderBy("event_type")
    )
