"""Kafka ingest/egress: the production stand-in for the reference's
MQTT -> Kinesis path (SURVEY.md §1.4 source mapping).

This container ships no Kafka broker or connector jar, so the builders
here are gated: they construct the correct reader/writer configuration
and raise a clear error at ``load()``/``start()`` time if the
spark-sql-kafka package is absent.  Everything downstream of the source
(wire decode, dedup, windowed aggregates, sinks) is broker-agnostic --
see ``sources.sensor.from_wire`` -- so swapping the rate-source
simulator for this reader is a one-line change in pipeline assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka DataSource is registered on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_sensor_topic(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "sensor/data",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming reader over the producer topic, decoded to typed rows.

    Rate limiting via ``maxOffsetsPerTrigger`` is the back-pressure
    knob (the Kinesis shard-throughput discussion in README.md:55-96
    maps to it)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if not kafka_available(spark):
        raise ModuleNotFoundError(
            "spark-sql-kafka is not on the classpath in this environment; "
            "add --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver> "
            "(builder config verified, source gated per task instructions)"
        )
    from .sensor import from_wire

    raw = reader.load()
    return from_wire(raw.select(F.col("value").cast("string").alias("value")))


def write_wire_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
):
    """Producer side (Table A6 analogue): typed rows -> wire JSON ->
    Kafka, exactly-once via checkpointed offsets + idempotent keys."""
    from .sensor import to_wire

    if not kafka_available(df.sparkSession):
        raise ModuleNotFoundError(
            "spark-sql-kafka is not on the classpath in this environment"
        )
    return (
        to_wire(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
