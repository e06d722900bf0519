"""Readers over the test corpus and generic file sources.

All batch scans are plain ``spark.read.parquet`` so Catalyst gets
predicate pushdown + column pruning at the reader level for free
(SURVEY.md §4).  At 100 TB the same call reads a partitioned table
directory; nothing here assumes single files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TABLE_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = tuple(TABLE_SCHEMAS)


_SCRATCH_CLEANUP_PID: int | None = None


def scratch_dir(*parts: str) -> str:
    """Per-process scratch root for artifacts persisted during a run
    (ANN/text indexes, drift logs).  The pid component keeps two
    concurrent runs on the same host from overwriting each other's
    artifacts mid-probe, and avoids cross-user collisions in a shared
    temp dir; within ONE process, re-runs deliberately overwrite in
    place (build-once/probe-many reuse).  The first call registers an
    ``atexit`` removal of the whole pid root, so a run cleans up after
    itself instead of leaking one index tree per process into /tmp
    (cross-RUN index reuse is a service concern -- services pass their
    own durable paths to the ``build_*_index`` functions)."""
    import tempfile

    root = os.path.join(tempfile.gettempdir(), f"engine_scratch_pid{os.getpid()}")
    global _SCRATCH_CLEANUP_PID
    if _SCRATCH_CLEANUP_PID != os.getpid():  # re-register after fork
        import atexit
        import shutil

        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _SCRATCH_CLEANUP_PID = os.getpid()
    return os.path.join(root, *parts)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one corpus table (columnar parquet, pushdown-capable).

    The corpus stores timestamps as TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as raw nanos
    longs, converted here with ``timestamp_micros(c div 1000)`` --
    integer division, so no double-precision drift, and exactly the
    nanos->micros truncation DuckDB (the oracle) applies.  The cast is
    monotonic, so time-range predicates still prune row groups on the
    underlying long column.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; have {sorted(TABLE_SCHEMAS)}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    expected = TABLE_SCHEMAS[name]
    read_types = dict(df.dtypes)
    for field in expected.fields:
        if isinstance(field.dataType, T.TimestampType):
            read_type = read_types.get(field.name)
            if read_type == "bigint":
                df = df.withColumn(
                    field.name, F.expr(f"timestamp_micros({field.name} div 1000)")
                )
            elif read_type == "timestamp_ntz":
                # Session TZ is pinned to UTC, so NTZ -> LTZ is a pure
                # type change (no instant shift) and matches the
                # oracle's naive-UTC timestamps.
                df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in names}


def parallelize_small(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the scan under-parallelizes.

    The test corpus ships one small parquet file per table -> one input
    split -> expression-heavy operators (JSON parse, regex, simhash)
    run on a single core.  At production scale the scan already yields
    ~one split per 128MB and this is a no-op (the partition check keeps
    it adaptive); the repartition is only ever applied to inputs small
    enough that shuffling them is trivially cheap.
    """
    from .session import default_parallelism

    target = min_partitions or default_parallelism()
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_temp_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose corpus tables to ``spark.sql`` under their bare names."""
    for name in names or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def read_json_logs(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines scan with an explicit schema (Table A10/A14 input shape).

    Mirrors the Athena source table over Firehose's ``logs/`` prefix
    (``sensor-log-compactor.py:34-35``) -- but schema-explicit, because
    inference re-reads the whole input (unacceptable at scale) and
    streaming sources require it anyway.
    """
    return spark.read.schema(schema).json(path)


def read_csv(spark: SparkSession, path: str, schema, header: bool = True) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)
