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
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
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
    # Source-size hint for ``parallelize_small``'s file-size fast path
    # (local paths only; attribute, so transformations built ON TOP of
    # the returned frame naturally drop it).
    sizes = _local_parquet_sizes(path)
    if sizes is not None:
        df._engine_scan_sizes = sizes
    return df


def _local_parquet_sizes(path: str) -> tuple[int, int] | None:
    """(total_bytes, n_files) of a LOCAL parquet file/directory, or None
    when the path is a non-local URI (caller falls back to asking
    Spark)."""
    p = path
    if p.startswith("file://"):
        p = p[len("file://"):]
    if "://" in p:
        return None
    if os.path.isfile(p):
        return os.path.getsize(p), 1
    if not os.path.isdir(p):
        return None
    total = n = 0
    for root, _dirs, files in os.walk(p):
        for f in files:
            if f.startswith((".", "_")):
                continue
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                return None
            n += 1
    return total, n


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
    n = _estimated_scan_partitions(df, target)
    if n is None:
        # No size hint (derived frame, non-local source): ask Spark.
        # This converts the frame to an RDD -- a full QueryExecution
        # (analyze/optimize/plan) per call, ~tens of ms of driver time.
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df


def _estimated_scan_partitions(df: DataFrame, target: int) -> int | None:
    """Scan-split estimate from the ``load()`` size hint, replaying
    Spark's file-packing arithmetic (``FilePartition.maxSplitBytes``:
    ``min(maxPartitionBytes, max(openCostInBytes, bytesPerCore))`` over
    the open-cost-padded total) -- so the repartition decision no
    longer spends one QueryExecution per call site (~150 calls/bench,
    round-14 verdict item).  The estimate only has to be right about
    WHICH SIDE of ``target`` the split count lands on: tiny corpus
    tables land orders of magnitude below it, production tables orders
    of magnitude above; near the boundary a one-split misestimate costs
    at most one cheap extra repartition of a ~target-splits table."""
    from .session import default_parallelism

    sizes = getattr(df, "_engine_scan_sizes", None)
    if sizes is None:
        return None
    total_bytes, n_files = sizes
    # Spark's own minPartitionNum is the leaf-node default parallelism,
    # not the caller's floor -- replay that.
    target = default_parallelism()
    conf = df.sparkSession.conf
    try:
        max_part = int(conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        max_part = 128 * 1024 * 1024
    try:
        open_cost = int(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    except Exception:
        open_cost = 4 * 1024 * 1024
    padded = total_bytes + n_files * open_cost
    bytes_per_core = padded // max(target, 1)
    max_split = min(max_part, max(open_cost, bytes_per_core))
    return max(1, -(-padded // max(max_split, 1)))


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
