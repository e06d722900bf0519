"""Sensor-stream source: the engine's analogue of the reference
producer (``data-publish/sensor_publish.py:46-83``).

The reference reads SenseHAT humidity/temperature/pressure/orientation
at 1 Hz, stamps wall-clock seconds, counts messages, and publishes
JSON over MQTT QoS1.  Here the same record stream is generated from
Spark's ``rate`` source (1 row/s default = the producer's
``time.sleep(1)`` cadence), with measurements as smooth deterministic
functions of the counter -- matching the reference data's character
(diurnal drift, temp/humidity inverse correlation per README.md:122).

``sensor_batch`` builds the identical frame from ``spark.range`` for
deterministic batch tests; both share ``_measurements`` so streaming
and batch rows agree for a given counter value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SENSOR_TS_FORMAT


def _measurements(count: Column, client_id: Column) -> list[Column]:
    """Deterministic pseudo-sensor readings for counter value ``count``.

    Shapes mirror the published run (BASELINE.md golden values):
    temperature ~28-40 degC and humidity ~44-73 %rH in inverse phase
    (sin/-sin), pressure ~1000-1020 mb, orientation wrapping 0-360.
    """
    phase = count.cast("double") / 3600.0 * 2 * 3.141592653589793 / 14.0
    temp = 34.0 + 6.0 * F.sin(phase)
    return [
        client_id.alias("client_id"),
        (58.0 - 15.0 * F.sin(phase)).alias("humidity"),
        temp.alias("temperature"),
        (1010.0 + 10.0 * F.sin(phase * 3.0)).alias("pressure"),
        (count.cast("double") * 1.7 % 360.0).alias("pitch"),
        (count.cast("double") * 2.3 % 360.0).alias("roll"),
        (count.cast("double") * 3.1 % 360.0).alias("yaw"),
        count.cast("long").alias("count"),
    ]


def sensor_stream(
    spark: SparkSession,
    rows_per_second: int = 1,
    client_id: str = "raspberrypi",
) -> DataFrame:
    """Unbounded sensor stream (Table A1/A2/A3/A4).

    rate source ``value`` is the monotonic publish counter (A4);
    ``timestamp`` is the event-time stamp the producer formats at
    ``sensor_publish.py:62-63`` (kept as a proper timestamp; the string
    form is a ``date_format`` away, see ``to_wire``).
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        F.col("timestamp").alias("timestamp"),
        *_measurements(F.col("value"), F.lit(client_id)),
    ).select(
        "client_id", "timestamp", "humidity", "temperature", "pressure",
        "pitch", "roll", "yaw", "count",
    )


def sensor_batch(
    spark: SparkSession,
    n_rows: int,
    client_id: str = "raspberrypi",
    start_ts: str = "2022-07-14 15:00:00",
) -> DataFrame:
    """Deterministic batch twin of ``sensor_stream`` (for tests and the
    compaction job's input fixtures): one row per second from
    ``start_ts`` -- the published run began 2022-07-14 15h UTC
    (BASELINE.md index names)."""
    base = spark.range(n_rows)
    ts = F.to_timestamp(F.lit(start_ts)) + F.make_dt_interval(
        secs=F.col("id").cast("double")
    )
    return base.select(
        ts.alias("timestamp"), *_measurements(F.col("id"), F.lit(client_id))
    ).select(
        "client_id", "timestamp", "humidity", "temperature", "pressure",
        "pitch", "roll", "yaw", "count",
    )


def to_wire(df: DataFrame) -> DataFrame:
    """Encode rows to the producer's wire format (Table A5: ``json.dumps``
    at sensor_publish.py:80): timestamp as the ``'%Y-%m-%d %H:%M:%S'``
    string, whole record as one JSON text column."""
    wire_struct = F.struct(
        F.col("client_id"),
        F.date_format("timestamp", SENSOR_TS_FORMAT).alias("timestamp"),
        "humidity", "temperature", "pressure", "pitch", "roll", "yaw", "count",
    )
    return df.select(F.to_json(wire_struct).alias("value"))


def from_wire(df: DataFrame) -> DataFrame:
    """Decode wire JSON back to typed rows (the ingest side: what the
    IoT Rule/Firehose consumers see)."""
    from ..schemas import SENSOR_LOG_WIRE

    parsed = df.select(F.from_json("value", SENSOR_LOG_WIRE).alias("r")).select("r.*")
    return parsed.withColumn(
        "timestamp", F.to_timestamp("timestamp", SENSOR_TS_FORMAT)
    )
