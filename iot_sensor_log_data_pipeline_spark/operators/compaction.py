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


@dataclass
class MaintenanceResult:
    partitions_seen: int
    partitions_compacted: int
    files_before: int
    files_after: int


def _partition_dirs(table_dir: str) -> list[str]:
    """Leaf directories holding data files (hive-style ``key=value``
    partition layout, or the table root itself for unpartitioned)."""
    leaves: list[str] = []
    for root, _dirs, files in os.walk(table_dir):
        if any(not f.startswith((".", "_")) for f in files):
            leaves.append(root)
    return sorted(leaves)


def optimize_parquet_table(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 4,
    cluster_by: list[str] | None = None,
) -> MaintenanceResult:
    """OPTIMIZE-style maintenance over a partitioned parquet directory:
    the reference's A14 compaction generalized from one JSON prefix to
    every partition of a streaming-sink table (micro-batch sinks write
    one file per trigger per partition -- the small-file problem this
    exists to fix).

    Per leaf partition: if >= ``min_files`` data files and the current
    layout has more files than ``ceil(bytes / target_file_bytes)``,
    rewrite those exact files into the target count (bin-packed by
    Spark's round-robin repartition) and swap them in.  Rows are
    preserved exactly -- only the file layout changes.

    ``cluster_by`` additionally sorts rows within each rewritten file
    on the given keys, so min/max row-group statistics become selective
    (data skipping) for those columns.

    Scale notes: each partition rewrite is an independent narrow job
    (read N small files, write M big ones -- no shuffle wider than the
    repartition), so a 1000-executor cluster compacts partitions
    concurrently by looping this per partition or running one job over
    many partitions.  The delete+rename commit below assumes a
    filesystem with atomic rename (local/HDFS); on object stores this
    is exactly the job of a table format's snapshot commit -- see
    ``sinks/table_format.py`` for the gated Delta path.
    """
    parts = _partition_dirs(table_dir)

    def compact_one(part_dir: str) -> tuple[int, int, bool]:
        """(files_before, files_after, compacted) for one partition --
        unchanged per-partition logic, run concurrently below."""
        files = [
            os.path.join(part_dir, f)
            for f in os.listdir(part_dir)
            if not f.startswith((".", "_"))
            and os.path.isfile(os.path.join(part_dir, f))
        ]
        total_bytes = sum(os.path.getsize(f) for f in files)
        n_out = max(1, -(-total_bytes // target_file_bytes))
        if len(files) < min_files or n_out >= len(files):
            return len(files), len(files), False

        # Rewrite the exact listed snapshot (files arriving mid-run are
        # untouched), then commit by delete+rename.
        tmp = os.path.join(part_dir, f"_compact_tmp_{os.getpid()}")
        df = spark.read.parquet(*files)
        out = df.repartition(n_out)
        if cluster_by:
            # Z-order-lite: sort rows inside each output file on the
            # clustering keys so parquet row-group min/max stats become
            # selective for those columns (scan-level data skipping) --
            # the layout half of what table formats' OPTIMIZE ZORDER
            # does, without the space-filling-curve interleave.
            out = out.sortWithinPartitions(*cluster_by)
        out.write.mode("overwrite").parquet(tmp)
        new_files = sorted(
            f for f in os.listdir(tmp) if not f.startswith((".", "_"))
        )
        for f in files:
            os.remove(f)
        stamp = datetime.now(timezone.utc).strftime("%Y%m%d%H%M%S")
        for i, f in enumerate(new_files):
            shutil.move(
                os.path.join(tmp, f),
                os.path.join(part_dir, f"compacted-{stamp}-{i:05d}.parquet"),
            )
        shutil.rmtree(tmp)
        return len(files), len(new_files), True

    # Partition rewrites are independent narrow jobs on disjoint
    # directories (each commit is local to its partition dir), so they
    # run from a small driver thread pool (guide §2.6): a streaming-sink
    # table has MANY tiny partitions (720 log_hours in the bench
    # corpus), and one sequential ~0.2 s Spark job per partition made
    # the driver the bottleneck -- measured 166 s for the
    # maintenance_compaction_roundtrip row at sf0.01, job-launch bound.
    # Crash-consistency is unchanged: every partition still commits
    # independently via delete+rename, and re-running compacts whatever
    # a crash left behind, exactly as the sequential loop did.
    files_before = files_after = compacted = 0
    if parts:
        from concurrent.futures import ThreadPoolExecutor

        n_workers = min(32, max(1, os.cpu_count() or 8), len(parts))
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            for before, after, did in pool.map(compact_one, parts):
                files_before += before
                files_after += after
                compacted += 1 if did else 0
    return MaintenanceResult(
        partitions_seen=len(parts),
        partitions_compacted=compacted,
        files_before=files_before,
        files_after=files_after,
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> "Column":
    """Z-order (Morton) key over ``cols``: each column is rank-bucketed
    into ``2**bits`` EQUI-DEPTH buckets (edges from ``approxQuantile``,
    so skewed columns still spread over the full bucket range -- the
    failure mode of equi-width normalization), then the bucket ids'
    bits are interleaved into one integer.  Sorting by this key gives
    every clustered column locality at once: a range predicate on ANY
    of them prunes ~N^((d-1)/d) of N files via parquet min/max stats,
    where a plain lexicographic sort serves only its leading column
    (trailing columns span the full range in every file).

    The space-filling-curve half that ``optimize_parquet_table``'s
    ``cluster_by`` (sort-only, "Z-order-lite") deliberately omits --
    same layout idea as table formats' OPTIMIZE ZORDER.

    Scale shape: the only driver-side pull is the quantile edge list
    (``cols x (2**bits - 1)`` doubles -- model geometry, not data);
    bucketing is a JVM-side fold over that broadcast literal array and
    the interleave is pure integer bit arithmetic, so the key costs one
    projection, no shuffle, no Python.  NULLs bucket to 0 (sort first,
    one file's stats absorb them).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = []
    for c in cols:
        edges = df.select(F.col(c).cast("double").alias("__v")).approxQuantile(
            "__v", probs, 0.001
        )
        # Distinct edges only: repeated quantiles (low-cardinality or
        # heavily-skewed columns) would otherwise burn several bucket
        # ids on one value.
        uniq = sorted(set(edges))
        v = F.col(c).cast("double")
        b = F.aggregate(
            F.array(*[F.lit(float(e)) for e in uniq]),
            F.lit(0),
            lambda acc, e: acc + F.when(v >= e, 1).otherwise(0),
        )
        # Rescale distinct-edge rank onto the full bit range so the
        # interleave below always consumes ``bits`` meaningful bits.
        if len(uniq) < n_buckets - 1:
            b = F.floor(b * ((n_buckets - 1) / max(len(uniq), 1))).cast("int")
        buckets.append(F.coalesce(b, F.lit(0)).cast("long"))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * n + ci
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 8,
) -> int:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order key over ``cols``: range-repartition by the key (file
    boundaries = key quantiles, so files get even row counts even on
    skewed keys), sort within each file, drop the key before writing.
    Returns the number of data files written.

    One shuffle (the range exchange).  The layout is what makes a
    100 TB fact table scannable by more than one dimension: after
    this, predicates on ANY clustered column skip most row groups via
    min/max stats, which ``tests`` assert by reading the written
    footers."""
    zdf = df.withColumn("__z", zorder_key(df, cols, bits=bits))
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a Hive-bucketed parquet table: rows are
    hash-distributed into ``n_buckets`` files by ``bucket_col`` (and
    sorted within each bucket when ``sort``), with the bucket spec
    recorded in the session catalog.  THE co-location layout for a
    100 TB warehouse: two tables bucketed the same way join with NO
    exchange on either side -- the scan's output partitioning already
    satisfies the join's distribution requirement, so the cluster
    never moves either table again for any join on that key
    (asserted on the physical plan in
    ``tests/test_plans.py::test_bucketed_tables_join_without_exchange``).
    Amortization math: one bucketed write (a single hash exchange)
    replaces the per-query shuffle of EVERY subsequent join/agg on the
    key -- the same pay-once-scan-many contract as ``zorder_write``,
    but for distribution instead of clustering.

    ``path`` makes it an external table (data in the caller's scratch
    or lake location, not the warehouse dir); the DROP handles
    re-registration across runs.  Plain parquet directory reads do NOT
    see bucket specs -- consumers must read via ``spark.table``."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def table_layout_report(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Per-partition file-layout audit -- the read that DECIDES whether
    ``optimize_parquet_table`` / ``zorder_write`` is worth a run, the
    way ``join_skew_report`` decides a skew strategy before paying for
    the join.  For every leaf partition: file count, total bytes,
    min/avg/max file bytes, the small-file count (< half the target --
    the files whose per-task scheduling + open overhead dominates at
    1000 executors), the file count a compaction WOULD produce
    (ceil(total / target)), and the verdict: ``compact`` when the
    current layout carries more than 2x the post-compaction file count
    AND at least 2 surplus files, else ``ok``.

    Cost shape: filesystem METADATA only (one recursive listing -- the
    same listing `optimize_parquet_table` itself does; on an object
    store this is the LIST call, never a data read), returned as a
    partition-count-sized DataFrame.  ``target_file_bytes`` defaults
    to the classic 128 MiB scan-split sweet spot; pass the store's
    actual block/split size.

    Extends the reference's threshold trigger
    (``sensor-log-compactor.py:67`` -- compact when the COUNTER passes
    100 files) with the size awareness the counter lacks: 100 files of
    127 MiB each are healthy; 100 files of 40 KiB are the problem."""
    rows = []
    base = table_dir.rstrip("/")
    for part_dir in _partition_dirs(table_dir):
        files = [
            os.path.join(part_dir, f)
            for f in os.listdir(part_dir)
            if not f.startswith((".", "_"))
            and os.path.isfile(os.path.join(part_dir, f))
        ]
        if not files:
            continue
        sizes = sorted(os.path.getsize(f) for f in files)
        total = sum(sizes)
        n = len(sizes)
        ideal = max(1, -(-total // target_file_bytes))  # ceil
        rel = os.path.relpath(part_dir, base)
        rows.append(
            (
                "." if rel == "." else rel,
                n,
                int(total),
                int(sizes[0]),
                int(total / n),
                int(sizes[-1]),
                sum(1 for s in sizes if s < target_file_bytes // 2),
                int(ideal),
                "compact" if (n > 2 * ideal and n - ideal >= 2) else "ok",
            )
        )
    return spark.createDataFrame(
        rows,
        "partition string, n_files long, total_bytes long, min_bytes long,"
        " avg_bytes long, max_bytes long, n_small long,"
        " ideal_n_files long, verdict string",
    ).orderBy("partition")


def expire_partitions(
    spark: SparkSession,
    table_dir: str,
    partition_col: str,
    cutoff: str,
    dry_run: bool = True,
) -> DataFrame:
    """Retention for a hive-partitioned table: drop every
    ``<partition_col>=<value>`` directory whose value sorts strictly
    below ``cutoff`` -- the generalized form of the reference's A17
    source truncation (``sensor-log-compactor.py:125-139``), applied to
    time-partitioned layouts (``log_hour=2024-01-01-03`` etc.) instead
    of a flat prefix, and DETERMINISTIC: the caller passes the cutoff
    explicitly (derive it from the data's own max partition or a policy
    job), never a wall clock inside the operator.

    ``dry_run=True`` (the default) only REPORTS what would go --
    (partition_value, n_files, total_bytes, action) -- the review step
    a retention job runs first; ``dry_run=False`` deletes the listed
    directories and returns the same report with action='deleted'.
    Values compare as strings, which is correct exactly when the
    partition format is zero-padded lexicographic-chronological (the
    engine's ``log_hour`` format is); numeric partition schemes should
    pass zero-padded cutoffs of the same width.

    Cost: one directory listing + per-partition file stats (metadata
    only, the ``table_layout_report`` contract); the delete is a
    filesystem remove of whole partition directories -- no data pass,
    no rewrite, partition pruning's storage-side twin."""
    prefix = f"{partition_col}="
    rows = []
    doomed: list[str] = []
    base = table_dir.rstrip("/")
    for name in sorted(os.listdir(base)):
        full = os.path.join(base, name)
        if not (os.path.isdir(full) and name.startswith(prefix)):
            continue
        value = name[len(prefix):]
        if value >= cutoff:
            continue
        files = [
            os.path.join(full, f)
            for f in os.listdir(full)
            if not f.startswith((".", "_")) and os.path.isfile(os.path.join(full, f))
        ]
        rows.append(
            (
                value,
                len(files),
                int(sum(os.path.getsize(f) for f in files)),
                "would-delete" if dry_run else "deleted",
            )
        )
        doomed.append(full)
    if not dry_run:
        for full in doomed:
            shutil.rmtree(full)
    return spark.createDataFrame(
        rows,
        "partition_value string, n_files long, total_bytes long, action string",
    ).orderBy("partition_value")
