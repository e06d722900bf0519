"""Avro file source/sink, availability-gated like ``sources.kafka``.

Avro is the row-oriented wire/landing format of Kafka-ecosystem
pipelines (the reference's Firehose JSON would be Avro in a
schema-registry shop); Spark supports it via the external
``spark-avro`` module, which this container does not ship.  Builders
construct the real reader/writer configuration and raise a clear
``ModuleNotFoundError`` at execution time when the module is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

def avro_available(spark: SparkSession) -> bool:
    """True when the ``avro`` data source actually resolves.

    NB: probing ``Class.forName("...AvroFileFormat")`` is NOT enough --
    the class ships in the pyspark assembly but the data source's
    ServiceLoader registration does not, so only Spark's own
    ``DataSource.lookupDataSource`` answers correctly."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: SLF001
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def _gate(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise ModuleNotFoundError(
            "spark-avro is not on the classpath in this environment; add "
            "--packages org.apache.spark:spark-avro_2.13:<ver> "
            "(builder config verified, source gated)"
        )


def read_avro(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Batch Avro scan (explicit schema preferred: inference reads the
    file header per file, fine; but an explicit schema also enforces
    the contract)."""
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    _gate(spark)
    return reader.load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite"):
    """Batch Avro write with snappy block compression (the format's
    conventional codec)."""
    writer = df.write.format("avro").mode(mode).option("compression", "snappy")
    _gate(df.sparkSession)
    return writer.save(path)
