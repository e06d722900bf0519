"""Table-format writers (Delta Lake / Apache Iceberg), availability-
gated like ``sources.kafka``.

Why they matter at 100 TB: the maintenance compactor
(``operators.compaction.optimize_parquet_table``) commits by
delete+rename, which is atomic on local/HDFS filesystems but NOT on
object stores -- there, compaction, schema evolution and concurrent
writers all need a snapshot/commit protocol, which is exactly what the
table formats provide (OPTIMIZE / rewrite_data_files are their native
versions of our maintenance job).

This container ships neither connector jar, so the builders construct
the correct writer configuration and raise a clear ``ModuleNotFoundError``
at write time when the format is absent -- the same honest gating as
the Kafka source: config is real and testable, execution requires the
package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMAT_PROBES = {
    # DataSource registration classes, probed on the JVM classpath.
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
}

_INSTALL_HINT = {
    "delta": "--packages io.delta:delta-spark_2.13:<ver> plus the "
    "spark.sql.extensions / catalog confs from the Delta docs",
    "iceberg": "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
    "plus a spark.sql.catalog.<name> configuration",
}


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True when the ``fmt`` DataSource is registered on the classpath."""
    probe = _FORMAT_PROBES[fmt]
    try:
        spark._jvm.java.lang.Class.forName(probe)  # noqa: SLF001
        return True
    except Exception:
        return False


def _gate(spark: SparkSession, fmt: str) -> None:
    if fmt not in _FORMAT_PROBES:
        raise ValueError(f"unknown table format {fmt!r}; one of {sorted(_FORMAT_PROBES)}")
    if not format_available(spark, fmt):
        raise ModuleNotFoundError(
            f"{fmt} is not on the classpath in this environment; add "
            f"{_INSTALL_HINT[fmt]} (writer config verified, sink gated)"
        )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "delta",
    mode: str = "append",
    partition_by: list[str] | None = None,
):
    """Batch write to a table-format path.  Partitioning mirrors the
    hourly file-sink layout (``streaming.pipeline``): the format's
    metadata layer then gives partition pruning without directory
    listing -- the piece plain parquet lacks on object stores."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    _gate(df.sparkSession, fmt)
    return writer.save(path)


def write_stream_table(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "delta",
    partition_by: list[str] | None = None,
):
    """Streaming append sink: exactly-once via checkpointed offsets +
    the format's transactional commit (replacing the idempotent-landing
    protocol the plain file sink needs)."""
    writer = (
        df.writeStream.format(fmt)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    _gate(df.sparkSession, fmt)
    return writer.start(path)
