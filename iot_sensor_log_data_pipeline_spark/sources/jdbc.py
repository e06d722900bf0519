"""JDBC relational source: the batch-ingest path for dimension tables
that live in an operational database (the reference's DynamoDB counter
table is the closest analogue -- SURVEY.md §1.4 source mapping).

Spark's JDBC data source is built in, but a driver jar for the target
database is not shipped in this container, so the readers are gated on
a driver-class probe (same pattern as ``sources.kafka``): they build
the correct partitioned-read configuration and raise a clear error
when the driver is absent.

Scale note: a JDBC read without ``partitionColumn`` lands on ONE task
regardless of cluster size -- ``read_table`` therefore requires the
partitioning triple for any table above trivial size, turning the scan
into ``num_partitions`` parallel range queries the database can serve
concurrently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Driver classes worth probing for, keyed by JDBC URL scheme.
KNOWN_DRIVERS: dict[str, str] = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlite": "org.sqlite.JDBC",
    "h2": "org.h2.Driver",
}


def jdbc_driver_available(spark: SparkSession, driver_class: str) -> bool:
    """True when ``driver_class`` is loadable on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(driver_class)  # noqa: SLF001
        return True
    except Exception:
        return False


def _driver_for(url: str) -> str:
    scheme = url.removeprefix("jdbc:").split(":", 1)[0]
    try:
        return KNOWN_DRIVERS[scheme]
    except KeyError:
        raise ValueError(
            f"no known driver class for JDBC scheme {scheme!r}; "
            f"pass driver_class explicitly"
        ) from None


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    driver_class: str | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Partitioned JDBC scan: ``num_partitions`` range-predicate reads
    over ``partition_column`` (must be indexed & roughly uniform for
    balanced tasks).  Predicate/column pushdown applies on top -- a
    ``.filter``/``.select`` after this call reaches the database as
    WHERE/SELECT clauses."""
    driver_class = driver_class or _driver_for(url)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver_class)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    if not jdbc_driver_available(spark, driver_class):
        raise ModuleNotFoundError(
            f"JDBC driver {driver_class} is not on the classpath in this "
            "environment; add the driver jar via spark.jars "
            "(reader config verified, source gated per task instructions)"
        )
    return reader.load()
