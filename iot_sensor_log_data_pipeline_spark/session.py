"""SparkSession factory tuned for this engine.

Scale stance: these configs are chosen so the same logical plans run
correctly on ``local[32]`` for tests AND survive a 1000-executor cluster
at ~100 TB:

- AQE on (runtime partition coalescing, skew-join splitting) so the
  shuffle layout self-corrects at any scale factor.
- ``spark.sql.shuffle.partitions`` defaults to the local core count for
  tests; on a real cluster you'd set ~2-3x total cores (AQE coalesces
  the excess, so over-provisioning is the safe direction).
- Session timezone pinned to UTC: the reference's timestamps are
  tz-naive strings (``sensor_publish.py:62-63``); DuckDB (the
  correctness oracle) is UTC-naive.  Pinning removes an entire class of
  hour-bucket disagreements (SURVEY.md §7 risk register).
- Arrow on for any pandas-UDF path (similarity / multimodal operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs every engine entry point re-asserts, so the
#: engine behaves identically even on a driver-provided session whose
#: builder confs we do not control.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver corpus parquet stores TIMESTAMP(NANOS), which the Spark
    # reader rejects outright; read as raw nanos and convert explicitly
    # in io_utils.load (DuckDB, the oracle, truncates nanos->micros; the
    # conversion reproduces that exactly).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Assert engine-required runtime confs on an existing session.

    Called at the top of every catalog query so correctness (UTC
    timestamps, AQE) does not depend on who built the session.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf not settable at runtime on this build -- leave as-is.
            pass
    try:
        # Replace only the stock default (200): wrong in both directions
        # on local sessions; a deliberately configured value is kept.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(default_parallelism())
            )
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "iot-sensor-log-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    par = shuffle_partitions or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(par))
        .config("spark.default.parallelism", str(par))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Files: pack small test files; on a real cluster maxPartitionBytes
        # keeps scan tasks ~128MB so 100TB -> ~800k tasks, a sane number.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{default_parallelism()}]")
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
