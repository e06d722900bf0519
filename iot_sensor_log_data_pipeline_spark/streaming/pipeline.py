"""Structured-Streaming pipeline assembly: the reference's cloud path
(MQTT -> Kinesis fan-out -> {file sink, hourly indices + aggregates})
as streaming DataFrame queries (SURVEY.md §3.1 Spark restatement).

Kappa layout: ONE source stream, N independent ``writeStream`` queries
with separate checkpoints = the Kinesis multi-consumer fan-out (Table
A9).  Watermarks bound state so every windowed aggregate here runs
indefinitely at any rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window


def with_log_hour(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Attach the hourly partition key (Table A11: OpenSearch 'Every
    hour' index rotation, README.md:110 -> ``partitionBy("log_hour")``)."""
    return df.withColumn("log_hour", F.date_format(ts_col, "yyyy-MM-dd-HH"))


def dedup_qos1(
    df: DataFrame, ts_col: str = "timestamp", watermark: str = "10 minutes"
) -> DataFrame:
    """Correct the reference's at-least-once delivery (Table A6: MQTT
    QoS1, ``sensor_publish.py:81``): exactly-once-equivalent rows via
    keyed dedup within a watermark.  State = one entry per (client_id,
    count) inside the watermark horizon -- bounded, scale-safe."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["client_id", "count"]
    )


def hourly_rollup(
    df: DataFrame, ts_col: str = "timestamp", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming A20/A21: tumbling 1-hour window avg per device.
    Partial aggregation happens per micro-batch; the watermark lets
    Spark emit+evict closed windows (append mode)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), F.col("client_id"))
        .agg(
            F.round(F.avg("temperature"), 6).alias("avg_temperature"),
            F.round(F.avg("humidity"), 6).alias("avg_humidity"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd-HH").alias("log_hour"),
            "client_id", "avg_temperature", "avg_humidity", "n_rows",
        )
    )


def sliding_window_stats(
    df: DataFrame,
    ts_col: str = "timestamp",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window extension (Table B): overlapping windows -- the
    smoothed version of the hourly chart."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.round(F.avg("temperature"), 6).alias("avg_temperature"),
            F.max("temperature").alias("max_temperature"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "avg_temperature",
            "max_temperature",
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "timestamp",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session-window extension (Table B): activity sessions closed by
    a 30-minute gap (streaming twin of the batch ``sessionize_events``)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col("client_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "client_id",
            "n_rows",
        )
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join (Table B): pair each left event with
    right events of the same key within a trailing time window.  Both
    sides carry watermarks + the time-range predicate, so Spark can
    bound join state and evict expired rows -- the requirements for an
    unbounded-safe stream-stream join."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    return l.join(
        r,
        F.expr(
            f"l.{key} = r.{key} AND r.{right_ts} >= l.{left_ts} - INTERVAL {lookback}"
            f" AND r.{right_ts} <= l.{left_ts}"
        ),
    )


def start_partitioned_file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "json",
    trigger_seconds: int = 60,
) -> StreamingQuery:
    """Table A10+A11: the Firehose-style micro-batch buffered file sink,
    partitioned by ingest hour.  Each micro-batch flush = one Firehose
    buffer flush; ``partitionBy`` = the hourly index rotation."""
    return (
        with_log_hour(df)
        .writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("log_hour")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .outputMode("append")
        .start()
    )


def start_memory_sink(
    df: DataFrame, name: str, output_mode: str = "append"
) -> StreamingQuery:
    """Dev/test sink (Table B console/memory row)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )


def start_fanout(
    df: DataFrame, sinks: list, checkpoints: list[str]
) -> list[StreamingQuery]:
    """Table A9: N consumers of one stream = N independent queries with
    independent checkpoints (their offsets are the consumer positions)."""
    queries = []
    for build_sink, _cp in zip(sinks, checkpoints):
        queries.append(build_sink(df))
    return queries


def start_cdc_merge_sink(
    changes: DataFrame,
    table_dir: str,
    keys: list[str],
    seq_col: str,
    checkpoint: str,
):
    """Streaming CDC apply: each micro-batch of change rows is merged
    into a parquet table via ``operators.scd.merge_upsert`` inside
    ``foreachBatch`` -- the plain-parquet stand-in for a table format's
    streaming MERGE INTO (exactly-once per batch via the checkpointed
    batch id; the rewrite below is last-writer-wins at file level, so
    run ONE merge stream per table, the same single-writer contract
    Delta's OPTIMISTIC transaction would otherwise enforce).

    Within a batch, several versions of the same key may arrive; the
    highest-``seq_col`` row wins deterministically before the merge
    (dedup inside the batch, anti-join against the table for the rest).

    Failure contract: only a genuinely-absent table (first batch) skips
    the merge -- the existence probe is an explicit directory check,
    never an exception swallow.  A corrupt footer, permission error, or
    transient FS failure RAISES and fails the batch, so Structured
    Streaming retries it from the checkpoint with the table intact;
    falling through would rewrite the table with only the current
    batch's rows (silent truncation of everything previously merged).
    """
    import os

    from ..operators.scd import merge_upsert

    spark = changes.sparkSession

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
        latest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if os.path.isdir(table_dir):
            # Explicit schema: the maintained table must parse as the
            # change stream's shape; schema drift or unreadable files
            # surface here as a batch error, not a truncating rewrite.
            current = spark.read.schema(latest.schema).parquet(table_dir)
            merged = merge_upsert(current, latest, keys)
        else:
            merged = latest
        # two-phase: write next version, swap in (atomic dir rename on
        # local/HDFS; a table format's snapshot commit on object stores)
        import shutil

        tmp = f"{table_dir}__next_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(table_dir, ignore_errors=True)
        shutil.move(tmp, table_dir)

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def start_scd2_sink(
    changes: DataFrame,
    dim_dir: str,
    keys: list[str],
    compare_cols: list[str],
    effective_ts_col: str,
    checkpoint: str,
):
    """Streaming SCD Type-2 maintenance: each micro-batch of dimension
    changes closes the affected current rows (``valid_to`` = change
    ts) and appends new current versions via ``operators.scd.
    scd2_apply`` inside ``foreachBatch`` -- the history-keeping sibling
    of ``start_cdc_merge_sink`` (which keeps only latest-wins state).

    Replay idempotency comes from SCD2's own semantics, not a ledger:
    when the table already reflects a batch, replaying it finds every
    changed key's current row EQUAL to the incoming values (-> classed
    'unchanged', nothing closes or opens) and every insert key already
    present (-> anti-join drops it), so a crash between write and
    checkpoint commit replays to the identical table.  Within a batch,
    the highest-``effective_ts_col`` row per key wins before the apply
    (sub-batch intermediate versions collapse -- use a smaller trigger
    when every intermediate version must be kept; ties broken by the
    row's compare tuple for determinism).  Same single-writer,
    explicit-schema, fail-don't-truncate, and two-phase-swap contracts
    as the CDC sink."""
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        scd2_sink_apply_batch(
            batch, batch_id, dim_dir, keys, compare_cols, effective_ts_col
        )

    return (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )


def scd2_sink_apply_batch(
    batch: DataFrame,
    batch_id: int,
    dim_dir: str,
    keys: list[str],
    compare_cols: list[str],
    effective_ts_col: str,
) -> None:
    """One micro-batch of ``start_scd2_sink`` -- module-level so the
    replay-idempotency and bootstrap contracts are directly testable
    (the ``cms_apply_batch`` convention)."""
    import os
    import shutil

    from ..operators.scd import OPEN_END, scd2_apply

    if not batch.take(1):
        return
    spark = batch.sparkSession

    def bootstrap(latest: DataFrame) -> DataFrame:
        return latest.select(
            *keys,
            *compare_cols,
            F.col(effective_ts_col).alias("valid_from"),
            F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    w = Window.partitionBy(*keys).orderBy(
        F.desc(effective_ts_col), *[F.desc(c) for c in compare_cols]
    )
    latest = (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if os.path.isdir(dim_dir):
        # Explicit schema (the CDC sink's failure contract): drift or
        # unreadable files fail the batch for a checkpointed retry
        # instead of truncating the history.
        dim = spark.read.schema(bootstrap(latest).schema).parquet(dim_dir)
        merged = scd2_apply(dim, latest, keys, compare_cols, effective_ts_col)
    else:
        merged = bootstrap(latest)
    tmp = f"{dim_dir}__next_{batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(dim_dir, ignore_errors=True)
    shutil.move(tmp, dim_dir)


def near_dup_match_stream(
    stream_docs: DataFrame,
    corpus_bands: DataFrame,
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """In-flight near-duplicate detection: an unbounded document stream
    probed against a PERSISTED corpus LSH index (``operators/dedup.py:
    minhash_bands`` output: (doc_id, band_id, band_val)) -- the
    streaming member of the dedup family, for pipelines that must
    reject near-copies at ingest rather than in a nightly batch.

    Scale shape: band keys are computed per-row with
    ``row_minhash_bands`` (shuffle-free, no stateful aggregation on the
    stream), the probe is a stream-static equi-join on (band_id,
    band_val) -- broadcast when the index fits, shuffle-on-static
    otherwise -- and the only streaming state is the within-watermark
    pair dedup (a doc matching k bands should be flagged once).
    Emits (doc_id, ts, corpus_id) in append mode.
    """
    from ..operators.dedup import row_minhash_bands
    from ..operators.text import tokens

    bands = row_minhash_bands(F.col(text_col))
    # Gate on the SAME tokenizer the shingles use (empty strings from
    # leading/trailing spaces must not count toward the >= 3-token
    # contract, or a short doc slips through and emits md5('')-derived
    # band values).
    probes = (
        stream_docs.where(F.size(tokens(F.col(text_col))) >= 3)
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.posexplode(bands).alias("band_id", "band_val"),
        )
    )
    index = corpus_bands.select(
        F.col("doc_id").alias("corpus_id"), "band_id", "band_val"
    )
    return (
        probes.join(index, ["band_id", "band_val"])
        .select(id_col, ts_col, "corpus_id")
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([id_col, "corpus_id"])
    )


def ann_match_stream(
    stream_vecs: DataFrame,
    index_path: str,
    threshold: float = 0.9,
    ts_col: str = "ts",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    watermark: str = "10 minutes",
) -> DataFrame:
    """In-flight EMBEDDING similarity match against a persisted SRP-LSH
    index (``operators/ann_index.py``): the vector-space twin of
    ``near_dup_match_stream``, for pipelines that must flag
    semantically near-identical arrivals (paraphrase spam, re-uploads)
    at ingest.

    Scale shape: band keys are computed per row with the index's OWN
    persisted hyperplanes (stateless Arrow UDF, no stream-side
    aggregation); candidates come from a stream-static equi-join on
    (band_id, bucket); exact cosine against the stored vectors keeps
    only matches >= ``threshold``; the only streaming state is the
    within-watermark (arrival, corpus) dedup.  Emits
    (vec_id, ts, corpus_id, cos_sim) in append mode.
    """
    from ..operators.ann_index import _sub
    from ..operators.similarity import _srp_bands_udf, cosine

    spark = stream_vecs.sparkSession
    cfg = spark.read.parquet(_sub(index_path, "config")).collect()[0]
    if cfg["kind"] != "lsh":
        raise ValueError(f"index at {index_path} is {cfg['kind']!r}, not lsh")
    plane_rows = (
        spark.read.parquet(_sub(index_path, "planes")).orderBy("plane_id").collect()
    )
    planes = [list(r["w"]) for r in plane_rows]
    bands_udf = _srp_bands_udf(planes, cfg["bands"], cfg["rows_per_band"])

    probes = stream_vecs.select(
        F.col(id_col),
        F.col(ts_col),
        F.col(vec_col).alias("query_vec"),
        F.posexplode(bands_udf(F.col(vec_col))).alias("band_id", "bucket"),
    )
    entries = spark.read.parquet(_sub(index_path, "entries")).select(
        F.col("id").alias("corpus_id"), "band_id", "bucket"
    )
    vecs = spark.read.parquet(_sub(index_path, "vectors")).select(
        F.col("id").alias("corpus_id"), "vec"
    )
    # Filter on the UNROUNDED cosine, round only in the output
    # projection -- same order as the batch twins
    # (embedding_cosine_pairs / lsh_topk), so a vector 5e-7 below the
    # threshold is rejected identically in stream and batch.
    return (
        probes.join(entries, ["band_id", "bucket"])
        .join(vecs, "corpus_id")
        .select(
            id_col,
            ts_col,
            "corpus_id",
            cosine(F.col("query_vec"), F.col("vec")).alias("__cos_raw"),
        )
        .where(F.col("__cos_raw") >= threshold)
        .select(
            id_col, ts_col, "corpus_id", F.round("__cos_raw", 6).alias("cos_sim")
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([id_col, "corpus_id"])
    )


def ks_score_batch(
    batch: DataFrame,
    batch_id: int,
    reference: DataFrame,
    value_col: str,
    out_dir: str,
    n_bins: int = 100,
) -> None:
    """One micro-batch of the streaming KS monitor (module-level so the
    scoring path is directly testable): label the static reference and
    the batch as two groups, run the binned two-sample KS
    (``operators/profiling.py:ks_drift_report`` -- group-vs-rest over
    two groups IS the two-sample statistic), and overwrite one
    (ks_stat, n_rows) row into ``batch_id=<id>/`` (the PSI monitor's
    idempotent per-batch layout).  Bin edges derive from the UNION's
    min/max, so range drift beyond the reference shows as edge mass,
    never as clamped-away signal."""
    import os

    from ..operators.profiling import ks_drift_report

    if not batch.take(1):
        return
    spark = batch.sparkSession
    u = reference.select(
        F.lit("ref").alias("__side"), F.col(value_col).alias("__v")
    ).unionByName(
        batch.select(F.lit("cur").alias("__side"), F.col(value_col).alias("__v"))
    )
    rows = (
        ks_drift_report(u, "__v", "__side", n_bins=n_bins)
        .where(F.col("__side") == "cur")
        .collect()
    )
    ks = float(rows[0]["ks_stat"]) if rows else 0.0
    n = int(rows[0]["n"]) if rows else 0
    spark.createDataFrame(
        spark.sparkContext.parallelize([(ks, n)], 1),
        "ks_stat double, n_rows long",
    ).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch_id={int(batch_id)}")
    )


def start_ks_monitor(
    stream: DataFrame,
    reference: DataFrame,
    value_col: str,
    out_dir: str,
    checkpoint: str,
    n_bins: int = 100,
) -> StreamingQuery:
    """Streaming nonparametric drift monitor: per micro-batch the
    binned two-sample Kolmogorov-Smirnov distance against a static
    reference snapshot, appended as an idempotent per-batch drift log
    -- the KS twin of ``start_psi_monitor`` (KS is a sup over the CDF:
    a shift concentrated anywhere shows at full strength where PSI's
    per-bin log-ratio dilutes it; run both, they catch different
    shapes).  Cache ``reference`` upstream for long-running monitors.
    Only a scalar leaves each batch."""

    def score_batch(batch: DataFrame, batch_id: int) -> None:
        ks_score_batch(
            batch, batch_id, reference, value_col, out_dir, n_bins=n_bins
        )

    return (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def lateness_score_batch(
    batch: DataFrame,
    batch_id: int,
    ts_col: str,
    out_dir: str,
) -> None:
    """One micro-batch of the lateness monitor: quantiles of
    (batch_max_ts - ts) in seconds -- how far behind the stream's own
    frontier each event arrived, the number `withWatermark` delays
    should be DERIVED from instead of guessed.  p50/p95/p99/max per
    batch into the idempotent ``batch_id=<id>`` log layout.  The
    frontier is the batch's own max event time (deterministic given
    batch content -- no wall clock, so replays log identical rows)."""
    import os

    if not batch.take(1):
        return
    spark = batch.sparkSession
    ts = F.col(ts_col).cast("timestamp").cast("double")
    row = (
        batch.select(ts.alias("__ts"))
        .where(F.col("__ts").isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("__ts").alias("__mx"),
        )
        .collect()[0]
    )
    mx = row["__mx"]
    if mx is None:
        # Non-empty batch whose ts values are all NULL (or uncastable):
        # there is no event-time frontier to lag against, and letting
        # it through would percentile an empty set (None) and raise
        # TypeError on the float() casts below, killing the whole
        # streaming query.  Skip the batch like an empty one -- rows
        # with no event time are invisible to a lateness audit.
        return
    q = (
        batch.select((F.lit(mx) - ts).alias("lag_s"))
        .where(F.col("lag_s").isNotNull())
        .agg(
            F.expr("percentile(lag_s, 0.5)").alias("p50"),
            F.expr("percentile(lag_s, 0.95)").alias("p95"),
            F.expr("percentile(lag_s, 0.99)").alias("p99"),
            F.max("lag_s").alias("max_s"),
        )
        .collect()[0]
    )
    spark.createDataFrame(
        spark.sparkContext.parallelize(
            [
                (
                    int(row["n"]),
                    float(q["p50"]),
                    float(q["p95"]),
                    float(q["p99"]),
                    float(q["max_s"]),
                )
            ],
            1,
        ),
        "n_rows long, p50_s double, p95_s double, p99_s double, max_s double",
    ).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch_id={int(batch_id)}")
    )


def start_lateness_monitor(
    stream: DataFrame,
    ts_col: str,
    out_dir: str,
    checkpoint: str,
) -> StreamingQuery:
    """Event-time lateness monitor: per micro-batch the p50/p95/p99/max
    of how far each event trails the batch's own event-time frontier --
    the measurement a watermark delay is sized from ('p99 lateness is
    40 s, so withWatermark 1 minute holds state long enough and drops
    almost nothing').  Guessed watermarks either leak state (too long)
    or silently drop the late tail (too short); this log replaces the
    guess with the stream's own distribution, and re-checking it over
    time catches lateness REGIME changes (a new upstream buffer, a
    slow region) before they become dropped data."""

    def score_batch(batch: DataFrame, batch_id: int) -> None:
        lateness_score_batch(batch, batch_id, ts_col, out_dir)

    return (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def watermark_from_lateness(
    spark: SparkSession,
    lateness_dir: str,
    margin_factor: float = 1.5,
    floor_seconds: int = 10,
) -> str:
    """Size a ``withWatermark`` delay FROM a recorded lateness profile
    (``start_lateness_monitor``'s log) instead of guessing: take the
    worst per-batch p99 event-time lag observed, multiply by
    ``margin_factor``, round up to whole seconds, floor at
    ``floor_seconds``.  The sizing rule (documented in SCALE.md):

        watermark = max(floor, ceil(max_batches(p99_s) * 1.5))

    p99 (not max) so one pathological replayed event cannot inflate
    state retention unboundedly; MAX over batches so the delay covers
    the worst lateness REGIME seen, not the average batch; the 1.5x
    margin absorbs regime drift between re-profilings.  Too-short
    watermarks silently drop the late tail; too-long ones hold
    watermark-bounded state (dedup/session/window) proportionally
    longer -- this turns that trade-off into a measured number.
    Returns a ``'<n> seconds'`` string accepted by every sink's
    ``watermark=`` parameter.  Driver-side cost: one tiny aggregate
    over the batches x 1-row log."""
    import math

    row = (
        spark.read.option("basePath", lateness_dir)
        .parquet(lateness_dir)
        .agg(F.max("p99_s").alias("p99"))
        .collect()[0]
    )
    p99 = row["p99"]
    if p99 is None:
        raise ValueError(
            f"lateness log at {lateness_dir!r} is empty -- run "
            "start_lateness_monitor over a representative stream first"
        )
    secs = max(int(floor_seconds), int(math.ceil(float(p99) * margin_factor)))
    return f"{secs} seconds"


def start_psi_monitor(
    stream: DataFrame,
    reference: DataFrame,
    value_col: str,
    out_dir: str,
    checkpoint: str,
    n_bins: int = 10,
) -> StreamingQuery:
    """Streaming distribution-drift monitor: each micro-batch's
    ``value_col`` distribution is scored against the static
    ``reference`` snapshot with ``operators/profiling.py:psi_drift``
    inside ``foreachBatch``, appending one (batch_id, psi, n_rows) row
    per batch to a parquet drift log -- the alerting feed a pipeline
    health dashboard tails.

    Scale shape: the reference's bin fences derive from a 1-row
    stats broadcast (computed per batch against the static frame --
    cache ``reference`` upstream for long-running monitors); the batch
    side is one binned hash agg; only a scalar PSI leaves each batch.

    Idempotence: ``foreachBatch`` is at-least-once, so each batch's
    row is written with OVERWRITE to a deterministic per-batch
    partition directory (``batch_id=N``) -- a retried batch replaces
    its own row instead of appending a duplicate, and readers see the
    batch id back as a partition column of ``out_dir``.
    """
    import os

    from ..operators.profiling import psi_drift

    spark = stream.sparkSession

    def score_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        psi_row = (
            psi_drift(reference, batch, value_col, n_bins=n_bins)
            .agg(F.sum("psi_contrib").alias("psi"))
            .collect()[0]
        )
        n_rows = batch.count()
        spark.createDataFrame(
            spark.sparkContext.parallelize(
                [(float(psi_row["psi"]), int(n_rows))], 1
            ),
            "psi double, n_rows long",
        ).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={int(batch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def curation_ingest_stream(
    stream: DataFrame,
    min_quality: float = 0.5,
    lang: str | None = "en",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    watermark: str = "10 minutes",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Ingest-time corpus curation: the batch curation pipeline's
    gates (language-ID, quality floor, blocklist, exact dedup) applied
    IN FLIGHT so junk and duplicates never land in the raw zone -- the
    streaming front door to the ``operators/curation.py`` family.

    Stages, all stateless column expressions except the final dedup:
    predicted language filter (``text.predicted_language`` marker
    argmax), quality floor (``text.quality_score`` blend), optional
    token blocklist drop (``text.blocklist_hits``'s C4 badwords rule:
    any whole-token hit rejects the document; the list rides the plan
    as an array literal, same zero-state cost as the other gates), and
    fingerprint-keyed ``dropDuplicatesWithinWatermark`` (canonical
    md5 over the sorted token set, so reordered copies of a document
    within the watermark window dedup too -- state is bounded by the
    watermark, never corpus-sized).  Emits the surviving rows with
    (lang_pred, quality, fingerprint) columns in append mode.
    """
    from ..operators.text import (
        blocklist_hit_tokens,
        fingerprint,
        predicted_language,
        quality_score,
    )

    out = stream.select(
        "*",
        predicted_language(F.col(text_col)).alias("lang_pred"),
        F.round(quality_score(F.col(text_col)), 6).alias("quality"),
        fingerprint(F.col(text_col)).alias("fingerprint"),
    ).where(F.col("quality") >= min_quality)
    if lang is not None:
        out = out.where(F.col("lang_pred") == lang)
    if blocklist:
        out = out.where(
            F.size(blocklist_hit_tokens(text_col, blocklist)) == 0
        )
    return (
        out.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


#: Read schema for the history-dedup fingerprint store.  Explicit so a
#: created-but-empty store directory reads as zero rows instead of
#: failing schema inference, and so a REAL read error (corrupt footer,
#: permissions) still fails the batch loudly -- the checkpoint retries
#: it rather than admitting duplicates forever.
_HISTORY_STATE_SCHEMA = "fingerprint string, fp_bucket int, batch long"

#: Bucket ids derive from the fingerprint's first 4 hex chars -- a
#: 16-bit space, so a modulus beyond it stops adding spread.
_HISTORY_MAX_BUCKETS = 65_536


def _history_fp_bucket(fp: Column, n_buckets: int) -> Column:
    """Uniform bucket id from the md5-hex fingerprint's first 4 hex
    chars (16-bit space; md5 uniformity makes any modulus balanced)."""
    return F.pmod(
        F.conv(F.substring(fp, 1, 4), 16, 10).cast("long"), F.lit(n_buckets)
    ).cast("int")


def _history_store_config_path(state_dir: str) -> str:
    import os

    # Leading underscore: parquet directory listings skip _-prefixed
    # files, so the sidecar never collides with the data scan.
    return os.path.join(state_dir, "_store_config.json")


def _read_history_store_n_buckets(state_dir: str) -> int | None:
    """The store's persisted bucket modulus, or None for a store
    created before the config sidecar existed (legacy layout)."""
    import json
    import os

    path = _history_store_config_path(state_dir)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return int(json.load(f)["n_buckets"])


def _write_history_store_config(state_dir: str, n_buckets: int) -> None:
    """Persist the bucket modulus next to the data (write-then-rename,
    so a crash never leaves a half-written config)."""
    import json
    import os

    path = _history_store_config_path(state_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"n_buckets": int(n_buckets)}, f)
    os.replace(tmp, path)


def history_dedup_apply_batch(
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> None:
    """One micro-batch of the history-complete dedup gate -- module
    level so replay idempotency is directly testable (call twice with
    the same ``batch_id``; output and state must not change).

    Plan: canonical fingerprint per row (``text.fingerprint`` -- md5
    over the sorted token set, so reordered copies dedup too),
    within-batch survivor = min id per fingerprint, LEFT ANTI join
    against the persisted store, then per-batch OVERWRITE of both the
    ``ingest_batch=<id>`` output directory and the
    ``batch=<id>/fp_bucket=*`` state directory.

    Bounded store probe: the store is directory-partitioned on
    ``fp_bucket`` (md5-prefix modulus), the batch's distinct buckets
    are collected (<= ``n_buckets`` ints -- the bounded
    sketch-to-closure pattern) into an IN-list partition filter, so
    the anti-join reads <= store_size * |touched buckets| / n_buckets
    instead of the whole store: a small steady-state micro-batch of b
    docs scans ~b/n_buckets of the store, and per ingested ROW the
    probe cost is capped at store_size / n_buckets regardless of
    corpus age.

    The bucket modulus is part of the STORE, not the call: it is
    persisted in a ``_store_config.json`` sidecar at creation and
    validated on every batch -- a caller passing a different
    ``n_buckets`` against an existing store raises instead of
    silently partition-filtering on bucket ids the stored rows don't
    have (which would admit every previously-seen duplicate).  To
    grow the modulus as the corpus grows, re-bucket through
    ``optimize_history_store(..., n_buckets=new)`` with the stream
    stopped; ``optimize_history_store`` also keeps the file count at
    one sorted file per bucket.

    Replay idempotency (retries re-run a batch id): state rows carry
    their writing ``batch`` (a directory-partition column), the
    anti-join excludes rows written by THIS batch id (a prior failed
    attempt), and both writes are whole-directory overwrites keyed by
    the batch id -- so a crash between the two writes replays to the
    identical result in either order, never duplicating output rows
    and never losing fresh ones.
    """
    import os

    from ..operators.text import fingerprint

    spark = batch.sparkSession
    if not (1 <= n_buckets <= _HISTORY_MAX_BUCKETS):
        raise ValueError(
            f"n_buckets must be in [1, {_HISTORY_MAX_BUCKETS}] (bucket ids "
            f"derive from 4 hex chars of the fingerprint), got {n_buckets}"
        )
    store_exists = os.path.exists(state_dir)
    if store_exists:
        stored = _read_history_store_n_buckets(state_dir)
        if stored is None:
            # Legacy store (predates the sidecar): adopt the caller's
            # modulus as the store's -- the store was built by this
            # same sink configuration, so the parameter is the only
            # (and best) record of its geometry.
            _write_history_store_config(state_dir, n_buckets)
        elif stored != n_buckets:
            raise ValueError(
                f"history store at {state_dir} was built with "
                f"n_buckets={stored}, caller passed {n_buckets}; "
                "probing with a different modulus would miss stored "
                "fingerprints and admit duplicates.  Re-bucket with "
                "optimize_history_store(spark, state_dir, "
                f"n_buckets={n_buckets}) (stream stopped) instead."
            )
    if not batch.take(1):
        return
    fp = batch.withColumn("fingerprint", fingerprint(F.col(text_col))).withColumn(
        "fp_bucket", _history_fp_bucket(F.col("fingerprint"), n_buckets)
    )
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    batch_survivors = (
        fp.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if store_exists:
        touched = [
            r["fp_bucket"]
            for r in batch_survivors.select("fp_bucket").distinct().collect()
        ]
        seen = (
            spark.read.schema(_HISTORY_STATE_SCHEMA)
            .parquet(state_dir)
            .where(F.col("fp_bucket").isin(touched))
            .where(F.col("batch") != int(batch_id))
            .select("fingerprint")
        )
        fresh = batch_survivors.join(seen, "fingerprint", "left_anti")
    else:
        fresh = batch_survivors
    fresh = fresh.localCheckpoint()  # one computation feeds both writes
    fresh.drop("fp_bucket").write.mode("overwrite").parquet(
        os.path.join(out_dir, f"ingest_batch={int(batch_id)}")
    )
    (
        fresh.select("fingerprint", "fp_bucket")
        .write.mode("overwrite")
        .partitionBy("fp_bucket")
        .parquet(os.path.join(state_dir, f"batch={int(batch_id)}"))
    )
    if not store_exists:
        # First batch created the store: stamp its bucket geometry.
        # (A crash before this line leaves no sidecar; the next batch
        # takes the legacy-adopt path above with the same modulus.)
        _write_history_store_config(state_dir, n_buckets)


def start_history_dedup_sink(
    stream_docs: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> StreamingQuery:
    """HISTORY-complete streaming exact dedup: unlike
    ``curation_ingest_stream``'s watermark-bounded
    ``dropDuplicatesWithinWatermark`` (state evicts after the
    watermark horizon), this gate rejects a document that duplicates
    ANYTHING ever ingested -- the semantics a raw-zone loader
    actually needs -- by keeping the seen-fingerprint set in STORAGE
    (an ``fp_bucket``-partitioned parquet fingerprint table) instead
    of in operator state.  State is content-addressed,
    corpus-lifetime, and storage-resident: executor memory holds only
    the per-batch anti-join, the store probe is partition-pruned to
    the batch's buckets (see ``history_dedup_apply_batch`` for the
    cost bound), and any batch job can read the store directly.

    Output lands under ``out_dir/ingest_batch=<id>/`` (read the root
    with partition discovery); replayed batch ids overwrite their own
    directories, so the sink is idempotent per batch with no
    cross-batch append races (single-writer contract, like the CDC
    sink).  Run ``optimize_history_store`` periodically -- with the
    stream stopped and no in-flight batch -- to compact the per-batch
    state directories into one sorted file per bucket."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        history_dedup_apply_batch(
            batch,
            batch_id,
            out_dir,
            state_dir,
            id_col=id_col,
            text_col=text_col,
            n_buckets=n_buckets,
        )

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def optimize_history_store(
    spark, state_dir: str, n_buckets: int | None = None
) -> None:
    """Compact an ingest-grown history-dedup fingerprint store: the
    per-batch ``batch=<id>/fp_bucket=*`` directories (one small file
    per touched bucket per batch -- the append-path layout that makes
    replays idempotent) are rewritten as a single ``batch=-1`` tree
    with ONE fingerprint-sorted file per bucket, so the per-micro-batch
    partition-pruned probe reads one compact file per touched bucket
    and parquet min/max stats order the fingerprints within it.

    ``n_buckets`` (optional) RE-BUCKETS during the rewrite -- the one
    supported way to grow the modulus as the corpus grows: every
    stored ``fp_bucket`` is recomputed from the fingerprint with the
    new modulus and the ``_store_config.json`` sidecar is updated in
    the same swap, so the store and its geometry change atomically
    (the ingest sink validates the sidecar per batch and would reject
    a half-changed store).  Omitted, the stored bucket values and
    sidecar carry over unchanged.

    ``-1`` can never collide with a real (non-negative) streaming
    batch id, so the replay-exclusion filter ``batch != current`` in
    ``history_dedup_apply_batch`` keeps compacted rows visible.

    Contract (same as the other optimize jobs): single writer -- run
    only while the ingest stream is STOPPED with no in-flight batch
    (a mid-batch crash replayed AFTER compaction would find its own
    half-written state rows re-labeled ``batch=-1`` and reject the
    whole replay).  The directory swap is ``rmtree`` + ``rename`` --
    a local/posix-rename filesystem contract, like the parquet
    compactor; object stores need a copy-based swap instead."""
    import os
    import shutil

    if n_buckets is not None and not (1 <= n_buckets <= _HISTORY_MAX_BUCKETS):
        raise ValueError(
            f"n_buckets must be in [1, {_HISTORY_MAX_BUCKETS}], got {n_buckets}"
        )
    keep_n_buckets = (
        n_buckets
        if n_buckets is not None
        else _read_history_store_n_buckets(state_dir)
    )
    store = (
        spark.read.schema(_HISTORY_STATE_SCHEMA)
        .parquet(state_dir)
        .select("fingerprint", "fp_bucket")
    )
    if n_buckets is not None:
        store = store.select(
            "fingerprint",
            _history_fp_bucket(F.col("fingerprint"), n_buckets).alias("fp_bucket"),
        )
    tmp = state_dir.rstrip("/") + "__next"
    (
        store.repartition("fp_bucket")
        .sortWithinPartitions("fingerprint")
        .write.mode("overwrite")
        .partitionBy("fp_bucket")
        .parquet(os.path.join(tmp, "batch=-1"))
    )
    if keep_n_buckets is not None:
        _write_history_store_config(tmp, keep_n_buckets)
    shutil.rmtree(state_dir)
    os.rename(tmp, state_dir)


def winnowing_match_stream(
    stream_docs: DataFrame,
    corpus_fps: DataFrame | None = None,
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    watermark: str = "10 minutes",
    max_fp_df: int | None = 50,
    k: int = 4,
    w: int = 4,
    index_path: str | None = None,
) -> DataFrame:
    """In-flight LOCAL-overlap detection: each arriving document's
    winnowing fingerprints (``operators/dedup.py:
    winnowing_fingerprints``, Arrow path) are probed against a
    precomputed corpus fingerprint table -- the streaming member of
    the winnowing family, completing the ingest-gate set (exact
    fingerprint / MinHash bands / ANN / verbatim anchors / winnowing).
    A match means the arrival shares a token run of length
    >= w + k - 1 with an indexed document (the winnowing guarantee) --
    template reuse and partial copies are flagged at ingest, span
    triage deferred to the batch verbatim machinery.

    Two static sides, pick one:

    - ``index_path``: a ``dedup.build_winnowing_index`` root.  The
      PERSISTED postings are already stop-fp pruned and
      range-partitioned at build time, and the stored (k, w) geometry
      is used automatically -- so per micro-batch Spark re-reads a
      pruned parquet table instead of re-executing a stop-fp
      aggregation over the raw fingerprint DataFrame (foreachBatch
      replans the static side every batch; a pre-pruned scan is the
      production shape, like ``near_dup_match_stream``/
      ``ann_match_stream``).  ``max_fp_df`` is honored here too: when
      the caller's cap is TIGHTER than the cap persisted in the index
      config, an extra df prune runs over the (already-pruned)
      postings so the streaming fan-out bound the caller asked for
      holds regardless of how the index was built; a looser or equal
      cap is a no-op (the build prune already guarantees it).
    - ``corpus_fps`` (ad-hoc): a raw (doc_id, fp) DataFrame; hot
      fingerprints are pruned here by ``max_fp_df``, and ``k``/``w``
      must match whatever geometry produced it (defaults 4/4 -- the
      probe side must reproduce the build geometry or matches are
      meaningless).

    Scale shape: fingerprints are per-row (no stream-side state), the
    probe is a stream-static equi-join on the fingerprint, and the
    only streaming state is the within-watermark pair dedup.  Emits
    (doc_id, ts, corpus_id) in append mode.
    """
    from ..operators.dedup import load_winnowing_index, winnowing_fp_array

    if (corpus_fps is None) == (index_path is None):
        raise ValueError("pass exactly one of corpus_fps or index_path")
    if index_path is not None:
        import os as _os

        postings, k, w = load_winnowing_index(
            stream_docs.sparkSession, index_path
        )
        index = postings.select(F.col("doc_id").alias("corpus_id"), "fp")
        stored_cap = int(
            stream_docs.sparkSession.read.parquet(
                _os.path.join(index_path, "config")
            ).head()["max_fp_df"]
        )
        if max_fp_df is not None and max_fp_df < stored_cap:
            # The caller's fan-out bound is tighter than the build
            # prune: re-prune the (already small) postings so hot
            # fingerprints can't fan a micro-batch out past the cap.
            rare = (
                index.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("__df"))
                .where(F.col("__df") <= max_fp_df)
                .select("fp")
            )
            index = index.join(rare, "fp")
    else:
        index = corpus_fps.select(F.col("doc_id").alias("corpus_id"), "fp")
        if max_fp_df is not None:
            rare = (
                index.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("__df"))
                .where(F.col("__df") <= max_fp_df)
                .select("fp")
            )
            index = index.join(rare, "fp")
    probes = stream_docs.select(
        F.col(id_col),
        F.col(ts_col),
        F.explode(winnowing_fp_array(F.col(text_col), k, w)).alias("fp"),
    )
    return (
        probes.join(index, "fp")
        .select(id_col, ts_col, "corpus_id")
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([id_col, "corpus_id"])
    )


def nb_quality_stream(
    stream: DataFrame,
    model: DataFrame,
    stats: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_only: bool = False,
) -> DataFrame:
    """Ingest-time model-based quality scoring: every arriving
    document is scored with a TRAINED Naive-Bayes quality classifier
    (``operators/text.py:nb_quality_model``) -- the streaming twin of
    ``nb_quality_scores`` and the classifier-gate complement of the
    heuristic ``curation_ingest_stream``.

    Plan: token explode (stateless) -> stream-static LEFT join to the
    vocabulary-sized model on the term (no state: the static side is
    rebroadcast per micro-batch) -> watermarked (window, id) aggregate
    summing the log-ratios.  The 1-row ``stats`` frame (log-prior,
    OOV constant) is collected once into literals -- the engine's
    bounded sketch-to-closure pattern.  State is bounded by the
    watermark: one sum per in-flight (window, doc), never
    vocabulary- or corpus-sized.

    Append-mode semantics: a document's score row emits when the
    watermark passes its window end (finalized, exactly once).
    Token-less documents produce no row (nothing to explode) --
    unlike the batch operator, which reports them with the bare
    prior; gate empties upstream.  Returns (id, window_start,
    n_tokens, nb_logit, keep); ``keep_only`` drops rejected rows in
    flight.
    """
    from ..operators.text import tokens

    srow = stats.head()
    prior = float(srow["log_prior"])
    oov = float(srow["oov_log_ratio"])
    tok = stream.withWatermark(ts_col, watermark).select(
        F.col(id_col), F.col(ts_col), F.explode(tokens(text_col)).alias("term")
    )
    agg = (
        tok.join(model, "term", "left")
        .groupBy(F.window(ts_col, window).alias("w"), F.col(id_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.coalesce("log_ratio", F.lit(oov))).alias("token_sum"),
        )
    )
    out = agg.select(
        id_col,
        F.col("w.start").alias("window_start"),
        "n_tokens",
        F.round(F.lit(prior) + F.col("token_sum"), 6).alias("nb_logit"),
    ).withColumn("keep", F.col("nb_logit") > 0)
    if keep_only:
        out = out.where(F.col("keep"))
    return out


def start_verbatim_match_sink(
    stream: DataFrame,
    anchor_index_path: str,
    out_dir: str,
    checkpoint: str,
    min_len: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Ingest-time EXACT substring matching: each arriving document is
    checked against a persisted corpus anchor index
    (``operators/dedup.py:build_anchor_index``) and every maximal
    shared verbatim run >= ``min_len`` tokens is appended to a parquet
    match log -- the verbatim member of the streaming dedup trio
    (MinHash ``near_dup_match_stream``, embedding ``ann_match_stream``,
    and this).

    Per micro-batch (``foreachBatch``): the batch's k-gram positions
    are an in-row transform; candidates come from an equi-join against
    the gram-pruned static anchors; maximal runs fall out of the same
    gaps-and-islands window as the batch operator, partitioned by
    (arriving doc, corpus doc, diagonal) -- batch-sized state, no
    streaming aggregation.  The log write overwrites a deterministic
    per-batch partition (``batch_id=N``), so at-least-once retries are
    idempotent (same contract as ``start_psi_monitor``).  Emits
    (id, corpus_id, a_start, b_start, run_len).
    """
    import os

    from pyspark.sql.window import Window as W

    from ..operators.text import tokens

    spark = stream.sparkSession
    k = int(
        spark.read.parquet(os.path.join(anchor_index_path, "config")).collect()[0][
            "k"
        ]
    )
    eff_min = min_len if min_len is not None else 2 * k - 1
    if eff_min < k:
        raise ValueError(f"min_len ({eff_min}) must be >= k ({k})")
    anchors = spark.read.parquet(os.path.join(anchor_index_path, "anchors")).select(
        F.col("id").alias("corpus_id"),
        F.col("pos").alias("pb"),
        "gram",
    )

    def match_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        toked = batch.select(
            F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
        )
        pg = (
            toked.where(F.size("__toks") >= k)
            .select(
                "id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("__toks") - k),
                        lambda i: F.struct(
                            i.cast("long").alias("pa"),
                            F.concat_ws(
                                " ", F.slice("__toks", i + 1, k)
                            ).alias("gram"),
                        ),
                    )
                ).alias("pg"),
            )
            .select("id", F.col("pg.pa").alias("pa"), F.col("pg.gram").alias("gram"))
        )
        cand = pg.join(anchors, "gram").select(
            "id", "corpus_id", (F.col("pa") - F.col("pb")).alias("diag"), "pa"
        )
        w = W.partitionBy("id", "corpus_id", "diag").orderBy("pa")
        runs = (
            cand.withColumn("__prev", F.lag("pa").over(w))
            .withColumn(
                "__brk",
                F.when(
                    F.col("pa") - F.coalesce("__prev", F.lit(-2)) == 1, 0
                ).otherwise(1),
            )
            .withColumn(
                "__island",
                F.sum("__brk").over(w.rowsBetween(W.unboundedPreceding, 0)),
            )
            .groupBy("id", "corpus_id", "diag", "__island")
            .agg(F.min("pa").alias("a_start"), F.count(F.lit(1)).alias("__n"))
            .select(
                "id",
                "corpus_id",
                "a_start",
                (F.col("a_start") - F.col("diag")).alias("b_start"),
                (F.col("__n") + F.lit(k - 1)).cast("long").alias("run_len"),
            )
            .where(F.col("run_len") >= eff_min)
        )
        runs.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={int(batch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(match_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def cms_apply_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    key_col: str = "key",
    depth: int | None = None,
    width: int | None = None,
) -> None:
    """One micro-batch of the streaming Count-Min maintenance sink --
    module-level so replay idempotency is directly testable (same
    ``batch_id`` twice must not change the merged totals).

    Each batch's exact (key, count) pairs become CMS cells
    (``operators/sketch.py:cms_build``) written as a whole-directory
    OVERWRITE of ``batch=<id>/`` -- the same per-batch-id idempotent
    layout as the history-dedup store.  Cells are mergeable by
    addition, so the live sketch is just ``sum(cell_count)`` over all
    batch directories (``load_cms_store``) and compaction
    (``optimize_cms_store``) can pre-fold them at any time without
    changing any estimate."""
    import os

    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH, cms_build

    depth = CMS_DEPTH if depth is None else depth
    width = CMS_WIDTH if width is None else width
    if not batch.take(1):
        return
    counts = batch.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    cells = cms_build(counts, key_col=key_col, count_col="n", depth=depth, width=width)
    cells.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={int(batch_id)}")
    )


def start_cms_sink(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    key_col: str = "key",
    depth: int | None = None,
    width: int | None = None,
) -> StreamingQuery:
    """Streaming sketch maintenance: keep a PERSISTED Count-Min sketch
    of key frequencies over everything ever ingested -- the streaming
    member of the sketch family, for "how often has this token/URL/
    user appeared, ever?" point queries without storing per-key state.

    Contracts shared with the history-dedup store: per-batch-id
    directory overwrite (replay-idempotent in any crash order),
    single writer, and run ``optimize_cms_store`` only with the stream
    stopped.  Unlike per-key state stores, the sketch's size is fixed
    geometry (depth x width cells per batch, pre-folded by
    compaction) no matter how many distinct keys flow through --
    that's the point of maintaining a sketch instead of a table."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        cms_apply_batch(
            batch, batch_id, store_dir, key_col=key_col, depth=depth, width=width
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def load_cms_store(spark, store_dir: str) -> DataFrame:
    """The live merged sketch: cells summed across every batch
    directory (CMS cells merge by addition).  Feed the result to
    ``operators/sketch.py:cms_estimate``."""
    return (
        spark.read.schema("row int, bucket long, cell_count long, batch long")
        .option("basePath", store_dir)
        .parquet(store_dir)
        .groupBy("row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )


def optimize_cms_store(spark, store_dir: str) -> None:
    """Compact an ingest-grown CMS store: fold every per-batch cell
    directory into a single pre-merged ``batch=-1`` tree (one file --
    the sketch is KB-scale by construction).  Estimates are unchanged
    (addition is associative); same single-writer / stream-stopped
    contract and rmtree+rename swap as ``optimize_history_store`` --
    a batch id replayed AFTER compaction would double-fold its cells.
    """
    import os
    import shutil

    merged = load_cms_store(spark, store_dir).coalesce(1)
    tmp = store_dir.rstrip("/") + "__next"
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "batch=-1"))
    shutil.rmtree(store_dir)
    os.rename(tmp, store_dir)


def hll_apply_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    key_col: str = "key",
    group_col: str | None = None,
) -> None:
    """One micro-batch of the streaming HyperLogLog maintenance sink
    (module-level so replay idempotency is directly testable).

    The batch folds to its (optionally grouped) register table
    (``operators/sketch.py:hll_registers`` -- <= groups x 2^p rows no
    matter the batch size) written as a whole-directory overwrite of
    ``batch=<id>/``.  Registers merge by MAX, which is idempotent as
    well as associative -- even a hypothetical double-fold could not
    change an estimate -- but the per-batch-id overwrite layout is
    kept anyway so every store in this module honors one contract."""
    import os

    from ..operators.sketch import hll_registers

    if not batch.take(1):
        return
    groups = (group_col,) if group_col else ()
    regs = hll_registers(batch, key_col, group_cols=groups)
    regs.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={int(batch_id)}")
    )


def start_hll_sink(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    key_col: str = "key",
    group_col: str | None = None,
) -> StreamingQuery:
    """Streaming distinct-count maintenance: keep a PERSISTED
    HyperLogLog register store (optionally per group) over everything
    ever ingested -- "how many distinct users/tokens/ids has each
    source seen, ever?" without per-key state.  Completes the
    streaming sketch-sink family (CMS = frequencies, MG = heavy
    hitters, DDSketch = quantiles, HLL = cardinalities).

    The merged store feeds ``hll_estimate`` for the counts and
    ``hll_set_overlap``'s register algebra for cross-group overlap --
    a LIVE source-overlap dashboard from bounded state.  Same
    contracts as the sibling sinks: per-batch-id directory overwrite,
    single writer, compact only with the stream stopped."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        hll_apply_batch(
            batch, batch_id, store_dir, key_col=key_col, group_col=group_col
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def load_hll_store(spark, store_dir: str, group_col: str | None = None) -> DataFrame:
    """The live merged register table: max over every batch directory
    (HLL registers merge by max).  Feed the result to
    ``operators/sketch.py:hll_estimate`` (with ``group_cols=(group,)``
    when grouped)."""
    prefix = f"{group_col} string, " if group_col else ""
    regs = (
        spark.read.schema(f"{prefix}register long, max_rank long, batch long")
        .option("basePath", store_dir)
        .parquet(store_dir)
    )
    keys = ([group_col] if group_col else []) + ["register"]
    return regs.groupBy(*keys).agg(F.max("max_rank").alias("max_rank"))


def optimize_hll_store(
    spark, store_dir: str, group_col: str | None = None
) -> None:
    """Compact an ingest-grown HLL store to a single pre-merged
    ``batch=-1`` tree (<= groups x 2^p rows).  Estimates are unchanged
    (max is associative); same single-writer / stream-stopped contract
    and rmtree+rename swap as ``optimize_cms_store``."""
    import os
    import shutil

    merged = load_hll_store(spark, store_dir, group_col=group_col).coalesce(1)
    tmp = store_dir.rstrip("/") + "__next"
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "batch=-1"))
    shutil.rmtree(store_dir)
    os.rename(tmp, store_dir)


def _mg_merge_cap(pairs: list[tuple], k: int) -> list[tuple]:
    """Merge (key, count) pairs by summation, then re-cap to at most
    ``k`` rows with the mergeable-summaries rule (Agarwal et al. 2012):
    subtract the (k+1)-th largest merged count from every count and
    drop the non-positive remainder.  Error bounds add across the
    merged inputs -- the property that lets per-partition and
    per-batch summaries fold without re-scanning anything."""
    merged: dict = {}
    for key, c in pairs:
        merged[key] = merged.get(key, 0) + int(c)
    if len(merged) > k:
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {key: c - cut for key, c in merged.items() if c > cut}
    return sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))


def hh_apply_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    key_col: str = "key",
    k: int = 256,
) -> None:
    """One micro-batch of the streaming heavy-hitter maintenance sink
    (module-level so replay idempotency is directly testable).

    The batch folds to ONE Misra-Gries summary of <= ``k`` (key,
    count_lo) rows: per-partition summaries from
    ``operators/sketch.py:misra_gries_summaries`` (Arrow pass, no
    shuffle), then a driver-side merge+re-cap of the <= k * partitions
    summary rows -- a bounded sketch-to-closure pull, never data-scaled.
    Written as a whole-directory overwrite of ``batch=<id>/`` (the
    history-store layout), so replaying a batch id in any crash order
    cannot double-count."""
    import os

    from ..operators.sketch import misra_gries_summaries

    if not batch.take(1):
        return
    rows = misra_gries_summaries(batch.select(key_col), key_col=key_col, k=k).collect()
    capped = _mg_merge_cap([(r[key_col], r["count_lo"]) for r in rows], k)
    spark = batch.sparkSession
    # Stored under the fixed column name ``key`` whatever the source
    # column was called -- ``load_hh_store`` reads one stable schema.
    out = spark.createDataFrame(
        capped,
        schema=f"key {batch.schema[key_col].dataType.simpleString()}, count_lo long",
    )
    out.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={int(batch_id)}")
    )


def start_heavy_hitters_sink(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    key_col: str = "key",
    k: int = 256,
) -> StreamingQuery:
    """Streaming heavy-hitter maintenance: a PERSISTED Misra-Gries
    summary of the most frequent keys over everything ever ingested --
    "what's trending, ever / lately?" without per-key state.  Store
    size is <= k rows per batch until ``optimize_hh_store`` pre-folds
    to one <= k-row summary, however many distinct keys flow through.

    Guarantee carried by the store (and pinned in pytest): summed
    ``count_lo`` underestimates any key's true all-time count by at
    most n_total/(k+1), and every key whose true count exceeds that
    bound appears in the store -- so downstream can nominate
    candidates from the store and exact-recount only those, exactly
    like the batch ``heavy_hitters`` operator.  Same single-writer /
    stream-stopped-compaction contracts as the CMS store."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        hh_apply_batch(batch, batch_id, store_dir, key_col=key_col, k=k)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def load_hh_store(spark, store_dir: str, key_type: str = "string") -> DataFrame:
    """The live merged summary: per-key SUM of ``count_lo`` across
    batch directories.  Summing preserves the lower-bound property
    (each batch only ever under-counts), and per-batch error bounds
    add to <= n_total/(k+1)."""
    return (
        spark.read.schema(f"key {key_type}, count_lo long, batch long")
        .option("basePath", store_dir)
        .parquet(store_dir)
        .groupBy("key")
        .agg(F.sum("count_lo").alias("count_lo"))
    )


def optimize_hh_store(spark, store_dir: str, k: int = 256, key_type: str = "string") -> None:
    """Compact an ingest-grown heavy-hitter store: fold every batch
    directory into one ``batch=-1`` summary re-capped to <= k rows
    with the mergeable-summaries subtract rule.  Lower bounds can
    only tighten DOWNWARD by the re-cap (never invent count), and the
    cumulative error stays <= n_total/(k+1).  Single-writer,
    stream-stopped; rmtree+rename swap as the other stores -- a batch
    id replayed after compaction would double-fold."""
    import os
    import shutil

    rows = load_hh_store(spark, store_dir, key_type=key_type).collect()
    capped = _mg_merge_cap([(r["key"], r["count_lo"]) for r in rows], k)
    tmp = store_dir.rstrip("/") + "__next"
    spark.createDataFrame(
        capped, schema=f"key {key_type}, count_lo long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "batch=-1"))
    shutil.rmtree(store_dir)
    os.rename(tmp, store_dir)


def dd_apply_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    value_col: str = "value",
    alpha: float = 0.01,
) -> None:
    """One micro-batch of the streaming DDSketch quantile sink
    (module-level so replay idempotency is directly testable).

    The batch folds to its DDSketch bucket counts -- boundaries depend
    only on ``alpha``, so every batch's table merges with every other
    by per-idx addition and the relative-error bound NEVER degrades
    (unlike MG summaries, whose error bounds add).  Whole-directory
    overwrite of ``batch=<id>/``: replaying a batch id in any crash
    order cannot double-count."""
    import os

    from ..operators.sketch import ddsketch_buckets

    if not batch.take(1):
        return
    buckets = ddsketch_buckets(batch, value_col, alpha=alpha)
    buckets.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={int(batch_id)}")
    )


def start_dd_quantile_sink(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    value_col: str = "value",
    alpha: float = 0.01,
) -> StreamingQuery:
    """Streaming quantile maintenance: a PERSISTED DDSketch over
    everything ever ingested -- "what is all-time p99 latency?"
    answered from a bucket table bounded by dynamic range (values
    spanning 1e-9..1e9 fit ~2,100 buckets at alpha=0.01), not by rows
    or distinct keys.  Completes the persisted-sketch-store trio:
    Count-Min (per-key counts), Misra-Gries (top keys), DDSketch
    (distribution).  Same single-writer / stream-stopped-compaction
    contracts as the other two."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        dd_apply_batch(batch, batch_id, store_dir, value_col=value_col, alpha=alpha)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def load_dd_store(spark, store_dir: str) -> DataFrame:
    """The live merged sketch: per-idx SUM of counts across batch
    directories -- an EXACT merge (bucket boundaries are
    alpha-determined, so addition loses nothing and the alpha
    relative-error guarantee holds over the union)."""
    return (
        spark.read.schema("idx long, cnt long, batch long")
        .option("basePath", store_dir)
        .parquet(store_dir)
        .groupBy("idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


def dd_store_quantiles(
    spark,
    store_dir: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
) -> DataFrame:
    """Quantile estimates over everything the store has ever ingested,
    within ``alpha`` relative error (``sketch.ddsketch_quantiles`` on
    the merged bucket table)."""
    from ..operators.sketch import ddsketch_quantiles

    return ddsketch_quantiles(
        load_dd_store(spark, store_dir), quantiles=quantiles, alpha=alpha
    )


def optimize_dd_store(spark, store_dir: str) -> None:
    """Compact an ingest-grown DDSketch store to one ``batch=-1``
    bucket table.  Pure re-sum -- estimates before and after are
    IDENTICAL (pinned in pytest), because the merge is exact.
    Single-writer, stream-stopped; rmtree+rename swap as the other
    stores -- a batch id replayed after compaction would double-fold."""
    import os
    import shutil

    merged = load_dd_store(spark, store_dir)
    tmp = store_dir.rstrip("/") + "__next"
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "batch=-1")
    )
    shutil.rmtree(store_dir)
    os.rename(tmp, store_dir)


def sample_apply_batch(
    batch: DataFrame,
    batch_id: int,
    store_dir: str,
    k: int,
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the streaming bottom-k sample sink: the
    batch's own bottom-``k`` candidates (full rows + ``sample_key``)
    land as an idempotent ``batch=<id>/`` overwrite.  Correctness
    rests on min-wise mergeability: any corpus-wide bottom-k member is
    necessarily in its own batch's bottom-k, so the union of per-batch
    candidate sets always contains the true sample and
    ``load_sample_store`` just takes the global bottom-k over
    <= k x batches candidate rows -- a uniform fixed-size sample over
    everything EVER ingested with no per-key state and no rescan."""
    import os

    from ..operators.curation import bottomk_sample

    if not batch.take(1):
        return
    bottomk_sample(batch, k, id_col=id_col).write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch={int(batch_id)}")
    )


def start_sample_sink(
    stream: DataFrame,
    store_dir: str,
    checkpoint: str,
    k: int,
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Streaming uniform-sample maintenance: keep a content-addressed
    bottom-``k`` sample (``operators/curation.py:bottomk_sample``) of
    an unbounded ingest stream -- the sample-family member of the
    persisted-store sinks (CMS / heavy hitters / DDSketch / budget
    ledger / this).  Per-batch-id idempotent overwrites, single
    writer, compaction via ``optimize_sample_store`` with the stream
    stopped -- the family contract."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        sample_apply_batch(batch, batch_id, store_dir, k, id_col=id_col)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def load_sample_store(spark, store_dir: str, k: int) -> DataFrame:
    """The live sample: global bottom-``k`` over every batch's
    candidate rows (bottom-k of bottom-ks == bottom-k of the union)."""
    return (
        spark.read.option("basePath", store_dir)
        .parquet(store_dir)
        .drop("batch")
        .orderBy(F.asc("sample_key"))
        .limit(k)
    )


def optimize_sample_store(spark, store_dir: str, k: int) -> None:
    """Compact an ingest-grown sample store to exactly the current
    ``k`` winners under ``batch=-1`` (displaced candidates can never
    re-enter -- keys only compete downward -- so dropping them changes
    no future sample).  rmtree + rename swap, single-writer, stream
    stopped: the store family contract."""
    import os
    import shutil

    merged = load_sample_store(spark, store_dir, k).coalesce(1)
    tmp = store_dir.rstrip("/") + "__next"
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "batch=-1"))
    shutil.rmtree(store_dir)
    os.rename(tmp, store_dir)


def index_ingest_apply_batch(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One micro-batch of the streaming index ingest sink, dispatching
    on the index's persisted ``kind`` (lsh / ivf / pq): encode the
    arriving vectors against the index's PERSISTED quantizer state
    (planes / centroids / codebooks+rotation -- frozen, the append-*
    contract: routing never drifts between build and ingest) and
    write the batch's encoded rows and re-rank vectors as
    whole-directory OVERWRITES of ``<table>_stream/batch=<id>/``
    under the index root -- the per-batch-id idempotent segment
    layout every persisted store here uses (a replayed batch rewrites
    its own directories, in any crash order).  The probe paths union
    the stream segments with the built tables automatically
    (``ann_index._read_with_segments``), so a vector is findable the
    micro-batch after it arrives; caller contract: ids disjoint from
    everything already indexed (ingest never dedups -- put a dedup
    gate upstream).  Vectors are cast to the PERSISTED element type
    so a double-typed stream cannot corrupt a float table."""
    import os

    from ..operators import ann_index as AI

    if not batch.take(1):
        return
    spark = batch.sparkSession
    cfg = spark.read.parquet(AI._sub(index_path, "config")).collect()[0]
    kind = cfg["kind"]

    def seg(table: str) -> str:
        return os.path.join(
            AI._sub(index_path, f"{table}_stream"), f"batch={int(batch_id)}"
        )

    stored_t = spark.read.parquet(AI._sub(index_path, "vectors")).schema[
        "vec"
    ].dataType
    base = batch.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast(stored_t).alias("vec")
    ).localCheckpoint(eager=True)  # one computation, two writes

    if kind == "ivf":
        assign_cells, _ = AI._top_cells_udf_from_path(spark, index_path)
        base.select(
            "id", F.explode(assign_cells(F.col("vec"))).alias("cell")
        ).write.mode("overwrite").parquet(seg("entries"))
        base.write.mode("overwrite").parquet(seg("vectors"))
    elif kind == "lsh":
        from ..operators.similarity import _srp_bands_udf

        plane_rows = (
            spark.read.parquet(AI._sub(index_path, "planes"))
            .orderBy("plane_id")
            .collect()
        )
        planes = [list(r["w"]) for r in plane_rows]
        bands_udf = _srp_bands_udf(planes, cfg["bands"], cfg["rows_per_band"])
        base.select(
            "id", F.posexplode(bands_udf(F.col("vec"))).alias("band_id", "bucket")
        ).write.mode("overwrite").parquet(seg("entries"))
        base.write.mode("overwrite").parquet(seg("vectors"))
    elif kind == "pq":
        from ..operators.similarity import _apply_projection, _pq_codes_udf

        _, codebooks, rotation = AI._load_pq_meta(spark, index_path)
        enc_src = base
        if rotation is not None:
            mu, R = rotation
            enc_src = _apply_projection(
                base, mu, R, id_col="id", vec_col="vec"
            ).localCheckpoint(eager=True)
        codes_udf = _pq_codes_udf(codebooks)
        enc_src.select("id", codes_udf(F.col("vec")).alias("codes")).write.mode(
            "overwrite"
        ).parquet(seg("codes"))
        base.write.mode("overwrite").parquet(seg("vectors"))
    elif kind == "ivfpq":
        cfg, centroids, codebooks, rotation = AI._load_ivfpq_meta(
            spark, index_path
        )
        AI._ivfpq_encode(
            base, centroids, codebooks, id_col="id", vec_col="vec",
            n_assign=int(cfg.get("n_assign", 1) or 1),
            rotation=rotation,
        ).write.mode("overwrite").parquet(seg("codes"))
        base.write.mode("overwrite").parquet(seg("vectors"))
    else:
        raise ValueError(f"no streaming ingest for index kind {kind!r}")


def start_index_ingest_sink(
    stream_vectors: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Streaming index maintenance for the whole persisted ANN family
    (lsh / ivf / pq, dispatched on the index's own config): keep a
    persisted index CURRENT from an unbounded embedding stream -- the
    ingest-side complement of ``ann_match_stream`` (which probes; this
    one indexes).  Semantics, segment layout, and replay contract in
    ``index_ingest_apply_batch``; compact the grown segment trees with
    ``ann_index.optimize_stream_segments`` (stream stopped,
    single-writer -- the family contract), and re-balance IVF hot
    cells with ``optimize_ivf_index`` as usual (it refuses while
    segments exist)."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        index_ingest_apply_batch(
            batch, batch_id, index_path, id_col=id_col, vec_col=vec_col
        )

    return (
        stream_vectors.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def chunk_vec_ids(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Project ``chunk_documents`` output to the family chunk-key
    space: ``vec_id = doc_id * 10^6 + chunk_id``.  The id expression
    ASSERTS ``chunk_id < 10^6`` (``assert_true`` fused into the
    projection -- no extra pass, and Catalyst cannot prune it because
    vec_id depends on it): an overflowing document would otherwise
    silently collide into the next doc's vec_id space, corrupting
    retrieval and any later tombstone takedown of the collided doc."""
    guard = F.assert_true(
        F.col("chunk_id") < 1_000_000,
        F.concat(
            F.lit("chunk_id overflow for doc_id="),
            F.col(id_col).cast("string"),
            F.lit(": >= 1_000_000 chunks collides into the next "
                  "doc's vec_id space"),
        ),
    )
    return chunks.select(
        F.when(
            guard.isNull(),
            F.col(id_col) * 1_000_000 + F.col("chunk_id"),
        ).alias("vec_id"),
        "chunk_text",
    )


def start_chunk_embed_ingest_sink(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint: str,
    chunk_tokens: int = 32,
    stride: int = 24,
    embed_dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """The RAG WRITE path as one streaming sink: documents stream in,
    each micro-batch is chunked (``operators/text.py:chunk_documents``
    -- a narrow, shuffle-free transform), every chunk is hash-embedded
    (``hash_embedding``, the engine's trained-model-free text->vector
    producer), and the chunk vectors land in a persisted ANN index via
    ``index_ingest_apply_batch`` -- so a document's chunks are
    probe-findable the micro-batch after the document arrives, against
    any index kind in the family (lsh / ivf / pq).

    Chunk ids are ``doc_id * 10^6 + chunk_id`` (recover the document
    as ``id div 10^6``); caller contract: doc ids disjoint from
    everything already indexed.  A document with >= 10^6 chunks
    (~10^6 * stride tokens) would silently collide into the NEXT
    doc's vec_id space -- corrupting retrieval and any later
    tombstone takedown for the collided doc -- so the id expression
    itself asserts ``chunk_id < 10^6`` (``assert_true`` fused into the
    projection: no extra pass, and the batch FAILS LOUDLY instead of
    folding).  The read side of this path is the batch
    ``text_chunk_retrieval`` catalog query; this sink is its streaming
    write twin."""
    from ..operators.text import chunk_documents, hash_embedding

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        chunks = chunk_vec_ids(
            chunk_documents(
                batch, chunk_tokens=chunk_tokens, stride=stride,
                id_col=id_col, text_col=text_col,
            ),
            id_col=id_col,
        )
        vecs = hash_embedding(
            chunks, dim=embed_dim, id_col="vec_id", text_col="chunk_text"
        )
        index_ingest_apply_batch(vecs, batch_id, index_path)

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


#: Back-compat aliases (round-9 names before the sink went family-wide).
ivf_ingest_apply_batch = index_ingest_apply_batch
start_ivf_ingest_sink = start_index_ingest_sink


def start_graph_ingest_sink(
    stream_vectors: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    beam: int = 32,
    hops: int = 5,
) -> StreamingQuery:
    """Streaming maintenance for the persisted k-NN graph index --
    HNSW-style search-then-link insertion per micro-batch: each
    arriving vector is beam-findable the batch after it arrives.
    Semantics, bidirectional-edge reachability, and the
    reads-exclude-own-batch replay contract in
    ``operators/graph_ann.py:graph_ingest_apply_batch``;
    ``optimize_graph_index`` absorbs the segments (and extends its
    refinement to the streamed nodes) on the maintenance cadence."""
    from ..operators.graph_ann import graph_ingest_apply_batch

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        graph_ingest_apply_batch(
            batch, batch_id, index_path,
            beam=beam, hops=hops, id_col=id_col, vec_col=vec_col,
        )

    return (
        stream_vectors.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def start_text_index_ingest_sink(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Streaming maintenance for the persisted BM25 text index: keep
    it current from an unbounded document stream -- a document is
    searchable the micro-batch after it arrives, with live N/avgdl.
    Semantics, segment layout, and replay contract in
    ``operators/text_index.py:text_ingest_apply_batch``; compact the
    grown segment trees with ``optimize_text_stream_segments`` and
    re-evaluate the stop-term policy with ``optimize_text_index``
    (stream stopped, single-writer -- the family contract)."""
    from ..operators.text_index import text_ingest_apply_batch

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        text_ingest_apply_batch(
            batch, batch_id, index_path, id_col=id_col, text_col=text_col
        )

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def start_winnowing_ingest_sink(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Streaming maintenance for the persisted winnowing fingerprint
    index: arriving documents' fingerprints are probe-matchable (by
    ``winnowing_match_stream`` and batch pair mining, both of which
    read through ``load_winnowing_index``) the micro-batch after they
    arrive.  Semantics, df-cap replay contract, and segment layout in
    ``operators/dedup.py:winnowing_ingest_apply_batch``; compact with
    ``optimize_winnowing_stream_segments``."""
    from ..operators.dedup import winnowing_ingest_apply_batch

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        winnowing_ingest_apply_batch(
            batch, batch_id, index_path, id_col=id_col, text_col=text_col
        )

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def with_observed_quality(
    df: DataFrame, value_col: str = "value", name: str = "quality"
) -> DataFrame:
    """Attach ZERO-COST per-batch quality counters to a plan via
    Spark's ``observe`` (CollectMetrics): row count, null count, and
    min/max/avg of ``value_col`` are computed INLINE while the batch's
    own operators run -- no second aggregation pass, no extra scan,
    no state.  Compare ``start_psi_monitor``, which pays a per-batch
    aggregation job for its reference comparison; these counters are
    the free tier of streaming observability, and at 100 TB "free vs a
    second scan" is the entire decision.

    Works on batch DataFrames too (metrics surface through
    ``QueryExecutionListener``); on streams they ride every
    ``StreamingQueryProgress`` -- read them with
    ``observed_metrics_history``.
    """
    v = F.col(value_col)
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v.isNull().cast("long")).alias("n_null"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
        F.avg(v).alias("avg_value"),
    )


def observed_metrics_history(query: StreamingQuery, name: str = "quality") -> list[dict]:
    """Per-micro-batch observed-metric rows for ``name`` from the
    query's retained progress events, oldest first.  Zero-row batches
    report metrics too (count 0) -- callers aggregating across batches
    should fold counts, not average the averages."""
    out = []
    for p in query.recentProgress:
        m = (p.get("observedMetrics") or {}).get(name)
        if m is not None:
            out.append(m)
    return out


_BUDGET_STATE_SCHEMA = "source string, admitted_tokens long, batch long"


def token_budget_apply_batch(
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    state_dir: str,
    caps: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch of the streaming token-budget assembler (the
    streaming twin of ``curation.token_budget_sample``): admit each
    source's documents until that source's LIFETIME admitted-token
    total reaches its cap, carrying the spend across micro-batches in
    a tiny persisted ledger instead of operator state.

    Admission is greedy-prefix inside the batch in a deterministic
    content order (md5 of the id), so a replay admits the identical
    rows; across batches it is arrival order -- the only order a
    stream has.  Sources absent from ``caps`` are REJECTED (a budget
    assembly admits only the domains the mixture asked for; route
    pass-through sources around the gate).

    Ledger: ``state_dir/batch=<id>/`` holds one (source,
    admitted_tokens) row per source the batch admitted from --
    per-source partial sums, never documents, so the ledger stays
    sources x batches rows at any corpus scale and the per-batch read
    is one tiny aggregate.  Replay idempotency follows the history
    store's contract: the spend read excludes rows written by THIS
    batch id (a prior failed attempt), and both writes are
    whole-directory overwrites keyed by the batch id, so a crash
    between the two writes replays to the identical result in either
    order.
    """
    import os

    from ..operators.text import token_count

    spark = batch.sparkSession
    if not batch.take(1):
        return
    caps_df = F.broadcast(
        spark.createDataFrame(
            [(s, int(c)) for s, c in sorted(caps.items())],
            f"{source_col} string, __cap long",
        )
    )
    # The ledger stores a FIXED 'source' column whatever the caller's
    # source_col is (same normalization as the HH store's fixed 'key'),
    # so readers never depend on writer-side naming; rename back to
    # source_col only for the in-batch join.
    spent = (
        spark.read.schema(_BUDGET_STATE_SCHEMA)
        .parquet(state_dir)
        .where(F.col("batch") != int(batch_id))
        .groupBy("source")
        .agg(F.sum("admitted_tokens").alias("__spent"))
        .withColumnRenamed("source", source_col)
        if os.path.exists(state_dir)
        else spark.createDataFrame([], f"{source_col} string, __spent long")
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    admitted = (
        batch.withColumn("__ntok", token_count(F.col(text_col)))
        .join(caps_df, source_col)  # inner: uncapped sources rejected
        .join(F.broadcast(spent), source_col, "left")
        .withColumn("__cum", F.sum("__ntok").over(w))
        .where(
            F.coalesce(F.col("__spent"), F.lit(0)) + F.col("__cum")
            <= F.col("__cap")
        )
    )
    admitted = admitted.localCheckpoint()  # one computation, two writes
    (
        admitted.drop("__cap", "__spent", "__cum")
        .withColumnRenamed("__ntok", "n_tokens")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, f"ingest_batch={int(batch_id)}"))
    )
    (
        admitted.groupBy(F.col(source_col).alias("source"))
        .agg(F.sum("__ntok").alias("admitted_tokens"))
        .write.mode("overwrite")
        .parquet(os.path.join(state_dir, f"batch={int(batch_id)}"))
    )


def start_token_budget_sink(
    stream_docs: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint: str,
    caps: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """Streaming per-source token-budget gate: admit documents from an
    unbounded ingest stream until each source's cap is spent, then
    reject that source forever -- 'assemble exactly this mixture from
    the firehose'.  Semantics, ledger layout, and replay contract in
    ``token_budget_apply_batch``; output lands under
    ``out_dir/ingest_batch=<id>/`` (read the root with partition
    discovery).  Single-writer, like every persisted-store sink here."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        token_budget_apply_batch(
            batch,
            batch_id,
            out_dir,
            state_dir,
            caps,
            source_col=source_col,
            id_col=id_col,
            text_col=text_col,
        )

    return (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def load_budget_ledger(spark, state_dir: str) -> DataFrame:
    """Live per-source spend view of a token-budget ledger: SUM of the
    per-batch partial sums (the mergeable-ledger property -- spends
    add)."""
    return (
        spark.read.schema(_BUDGET_STATE_SCHEMA)
        .parquet(state_dir)
        .groupBy("source")
        .agg(F.sum("admitted_tokens").alias("admitted_tokens"))
    )


def optimize_budget_ledger(spark, state_dir: str) -> None:
    """Compact an ingest-grown token-budget ledger: the per-batch
    ``batch=<id>`` partial-sum directories fold to ONE row per source
    under ``batch=-1`` (spends merge by addition -- the mergeable-
    ledger property), so the per-micro-batch spend read scans one
    tiny file however long the stream has run.  ``-1`` can never
    collide with a real batch id, so the replay-exclusion filter
    keeps compacted rows visible.  Single-writer contract and
    rmtree+rename swap exactly as ``optimize_history_store``."""
    import os
    import shutil

    folded = (
        spark.read.schema(_BUDGET_STATE_SCHEMA)
        .parquet(state_dir)
        .groupBy("source")
        .agg(F.sum("admitted_tokens").alias("admitted_tokens"))
    )
    tmp = state_dir.rstrip("/") + "__next"
    folded.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "batch=-1")
    )
    shutil.rmtree(state_dir)
    os.rename(tmp, state_dir)
