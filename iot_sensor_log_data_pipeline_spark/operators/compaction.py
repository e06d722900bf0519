"""Small-file compaction: the reference's Athena CTAS maintenance job
(Table A14-A19, ``data-compactor/sensor-log-compactor.py``).

The reference's Lambda: when 100 Firehose files accumulate under
``logs/`` (DynamoDB counter > 99, :67), run an async CTAS projecting
``COLUMN_NAMES`` into ONE GZIP JSON file under ``<table>_<yyyyMMddHHmm>/``
(:28-36,73-103), empty the input prefix (:125-139), reset the counter
(:142-155), drop the tmp table (:106-123).  Its known races/bugs
(async CTAS vs cleanup, single list page, crash on empty prefix --
SURVEY.md §2 notes) are all fixed here for free: Spark actions are
synchronous, listings are recursive, empty input is a no-op.

Two output modes:
- ``parity``   : ``coalesce(1)`` + GZIP JSON -- byte-compatible with the
                 reference's layout.  Deliberately anti-scale (one file
                 = one writer), kept only for parity.
- ``idiomatic``: size-targeted zstd Parquet via ``maxRecordsPerFile``
                 and natural parallelism -- what a 100 TB compactor
                 actually does.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from ..schemas import SENSOR_LOG_WIRE


@dataclass
class CompactionResult:
    dest: str
    n_rows: int
    n_input_files: int
    cleaned: bool


def list_log_files(src_dir: str) -> list[str]:
    """Recursive input listing (fixes the reference's single
    ``list_objects_v2`` page, ``sensor-log-compactor.py:128-133``)."""
    if not os.path.isdir(src_dir):
        return []
    out: list[str] = []
    for root, _dirs, files in os.walk(src_dir):
        out.extend(
            os.path.join(root, f)
            for f in files
            if not f.startswith((".", "_"))
        )
    return sorted(out)


def should_compact(src_dir: str, threshold: int = 100) -> bool:
    """Count trigger (Table A13): fire when >= ``threshold`` input files.

    The reference kept this count in DynamoDB, incremented per S3
    event (:38-54) and compared with ``> 99`` (:67); counting the
    actual files is both simpler and crash-consistent (the listing IS
    the state -- no A18-style reset races)."""
    return len(list_log_files(src_dir)) >= threshold


def compact_json_logs(
    spark: SparkSession,
    src_dir: str,
    dest_base: str,
    columns: list[str] | None = None,
    run_ts: datetime | None = None,
    schema=SENSOR_LOG_WIRE,
    mode: str = "parity",
    cleanup: bool = True,
) -> CompactionResult:
    """The CTAS replacement (Table A14/A15/A16/A17).

    ``spark.read.json -> select(columns) -> write`` with a timestamped
    destination ``{dest_base}_{yyyyMMddHHmm}`` exactly like
    ``sensor-log-compactor.py:74-80``.  Synchronous, so cleanup runs
    strictly after the write commits (the reference's race, fixed).
    No DROP TABLE needed: no temporary catalog object is ever created.
    """
    files = list_log_files(src_dir)
    if not files:
        return CompactionResult(dest="", n_rows=0, n_input_files=0, cleaned=False)

    run_ts = run_ts or datetime.now(timezone.utc)
    dest = f"{dest_base}_{run_ts.strftime('%Y%m%d%H%M')}"

    # Read the exact snapshot we listed (not the directory): new files
    # arriving mid-compaction are neither compacted nor deleted, and
    # nested batch subdirectories are picked up without relying on
    # partition discovery.
    df = spark.read.schema(schema).json(files)
    if columns:  # the CTAS `SELECT {columns}` projection (env COLUMN_NAMES, :24)
        df = df.select(*columns)

    if mode == "parity":
        # bucket_count=1 + GZIP (:32-33, README.md:8) == coalesce(1)+gzip.
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("compression", "gzip")
            .json(dest)
        )
    elif mode == "idiomatic":
        (
            df.write.mode("overwrite")
            .option("compression", "zstd")
            .option("maxRecordsPerFile", 5_000_000)
            .parquet(dest)
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")

    n_rows = spark.read.schema(schema).json(dest).count() if mode == "parity" else (
        spark.read.parquet(dest).count()
    )

    cleaned = False
    if cleanup:  # A17 source truncation -- strictly after the write.
        for f in files:
            os.remove(f)
        cleaned = True

    return CompactionResult(
        dest=dest, n_rows=n_rows, n_input_files=len(files), cleaned=cleaned
    )


def run_compaction_cycle(
    spark: SparkSession,
    src_dir: str,
    dest_base: str,
    threshold: int = 100,
    **kwargs,
) -> CompactionResult | None:
    """The full Lambda control flow (Table A19): check the count
    trigger; below threshold do nothing (the reference increments its
    counter -- here the file listing is the counter); at threshold,
    compact + clean."""
    if not should_compact(src_dir, threshold):
        return None
    return compact_json_logs(spark, src_dir, dest_base, **kwargs)


def drop_output(dest: str) -> None:
    """A16 analogue for tests: remove a compaction output directory."""
    if dest and os.path.isdir(dest):
        shutil.rmtree(dest)
