"""Structured-Streaming semantics tests (SURVEY.md §5 point 5):
file-source streams driven to completion with memory sinks, the QoS1
dedup, windowed rollups vs their batch twins, and the count-based
compaction trigger end-to-end."""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iot_sensor_log_data_pipeline_spark.schemas import SENSOR_LOG
from iot_sensor_log_data_pipeline_spark.sources.sensor import sensor_batch
from iot_sensor_log_data_pipeline_spark.streaming import pipeline as P
from iot_sensor_log_data_pipeline_spark.streaming.trigger import (
    CountTriggeredCompactor,
    attach,
)


@pytest.fixture
def scratch(tmp_path_factory):
    return str(tmp_path_factory.mktemp("stream"))


def _sensor_stream_from_dir(spark, path):
    return spark.readStream.schema(SENSOR_LOG).parquet(path)


def _run_to_memory(df, name, mode="append"):
    q = P.start_memory_sink(df, name, output_mode=mode)
    q.processAllAvailable()
    q.stop()


def test_hourly_rollup_matches_batch(spark, scratch):
    data_dir = os.path.join(scratch, "in")
    batch = sensor_batch(spark, 10_000)  # ~2.8 hours of 1 Hz data
    batch.write.mode("overwrite").parquet(data_dir)

    name = f"rollup_{uuid.uuid4().hex[:8]}"
    stream = _sensor_stream_from_dir(spark, data_dir)
    _run_to_memory(P.hourly_rollup(stream), name, mode="complete")
    got = {
        (r["log_hour"], r["client_id"]): (r["avg_temperature"], r["n_rows"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    expected = {
        (r["log_hour"], r["client_id"]): (r["avg_temperature"], r["n_rows"])
        for r in (
            batch.groupBy(
                F.date_format("timestamp", "yyyy-MM-dd-HH").alias("log_hour"),
                "client_id",
            )
            .agg(
                F.round(F.avg("temperature"), 6).alias("avg_temperature"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .collect()
        )
    }
    assert got == expected


def test_dedup_qos1_drops_redeliveries(spark, scratch):
    data_dir = os.path.join(scratch, "in")
    batch = sensor_batch(spark, 500)
    doubled = batch.unionByName(batch)  # QoS1 redelivery of every message
    doubled.write.mode("overwrite").parquet(data_dir)

    name = f"dedup_{uuid.uuid4().hex[:8]}"
    stream = _sensor_stream_from_dir(spark, data_dir)
    _run_to_memory(P.dedup_qos1(stream), name)
    rows = spark.sql(f"SELECT count(*) AS n, count(DISTINCT count) AS d FROM {name}").collect()[0]
    assert rows["n"] == 500  # every duplicate dropped
    assert rows["d"] == 500


def test_sliding_and_session_windows_run(spark, scratch):
    data_dir = os.path.join(scratch, "in")
    sensor_batch(spark, 3_000).write.mode("overwrite").parquet(data_dir)
    stream = _sensor_stream_from_dir(spark, data_dir)

    name = f"slide_{uuid.uuid4().hex[:8]}"
    _run_to_memory(P.sliding_window_stats(stream), name, mode="complete")
    slide_rows = spark.sql(f"SELECT * FROM {name}").collect()
    # 3000s of data / 5-min slide -> ~11 overlapping windows
    assert len(slide_rows) >= 9
    assert all(r["max_temperature"] >= r["avg_temperature"] for r in slide_rows)

    name2 = f"sess_{uuid.uuid4().hex[:8]}"
    _run_to_memory(P.session_windows(stream), name2, mode="complete")
    sess = spark.sql(f"SELECT * FROM {name2}").collect()
    # Continuous 1 Hz data with a 30-min gap -> exactly one session.
    assert len(sess) == 1 and sess[0]["n_rows"] == 3_000


def test_partitioned_file_sink_layout(spark, scratch):
    data_dir = os.path.join(scratch, "in")
    out_dir = os.path.join(scratch, "out")
    cp = os.path.join(scratch, "cp")
    sensor_batch(spark, 7_200).write.mode("overwrite").parquet(data_dir)

    stream = _sensor_stream_from_dir(spark, data_dir)
    q = P.start_partitioned_file_sink(stream, out_dir, cp, trigger_seconds=1)
    q.processAllAvailable()
    q.stop()

    # Hourly directory layout (Table A11) + lossless re-read: 7200 s
    # from 15:00:00 spans exactly hours 15 and 16.
    parts = sorted(d for d in os.listdir(out_dir) if d.startswith("log_hour="))
    assert parts == ["log_hour=2022-07-14-15", "log_hour=2022-07-14-16"]
    back = spark.read.schema(SENSOR_LOG).json(out_dir)
    assert back.count() == 7_200


def test_stream_stream_interval_join_matches_batch(spark, scratch):
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.schemas import EVENTS

    data_dir = os.path.join(scratch, "events")
    events = load(spark, "/root/testdata/sf0.001", "events")
    events.write.mode("overwrite").parquet(data_dir)

    def side(event_type):
        return (
            spark.readStream.schema(EVENTS)
            .parquet(data_dir)
            .where(F.col("event_type") == event_type)
            .select("user_id", "ts", "event_id", "value")
        )

    purchases = side("purchase").withColumnsRenamed(
        {"ts": "p_ts", "event_id": "p_id", "value": "p_value"}
    )
    clicks = side("click").withColumnsRenamed(
        {"ts": "c_ts", "event_id": "c_id", "value": "c_value"}
    )
    joined = P.stream_stream_interval_join(
        purchases, clicks, key="user_id", left_ts="p_ts", right_ts="c_ts"
    ).select("l.user_id", "p_id", "c_id")

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    _run_to_memory(joined, name)
    got = {
        (r["p_id"], r["c_id"]) for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    # Batch equivalent of the same interval predicate.
    p = events.where("event_type = 'purchase'").selectExpr(
        "user_id", "ts AS p_ts", "event_id AS p_id"
    )
    c = events.where("event_type = 'click'").selectExpr(
        "user_id u2", "ts AS c_ts", "event_id AS c_id"
    )
    expected = {
        (r["p_id"], r["c_id"])
        for r in p.join(
            c,
            F.expr(
                "user_id = u2 AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"
            ),
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_count_triggered_compactor(spark, scratch):
    data_dir = os.path.join(scratch, "in")
    logs = os.path.join(scratch, "logs")
    dest = os.path.join(scratch, "compacted")
    cp = os.path.join(scratch, "cp")
    sensor_batch(spark, 1_000).repartition(6).write.mode("overwrite").parquet(data_dir)

    compactor = CountTriggeredCompactor(
        logs_dir=logs, dest_base=dest, threshold=3, mode="parity"
    )
    stream = _sensor_stream_from_dir(spark, data_dir)
    q = attach(stream, compactor, cp)
    q.processAllAvailable()
    q.stop()

    # The batch landed >=3 files -> the gate fired at least once.
    assert compactor.results, "count trigger never fired"
    res = compactor.results[-1]
    assert res.n_rows == 1_000
    assert res.cleaned
    # GZIP single-file parity output (bucket_count=1 + GZIP).
    gz = [f for f in os.listdir(res.dest) if f.endswith(".json.gz")]
    assert len(gz) == 1
    # Input prefix truncated (Table A17) -- no data files remain.
    from iot_sensor_log_data_pipeline_spark.operators.compaction import list_log_files

    assert list_log_files(logs) == []


def test_stateful_count_trigger(spark, scratch):
    from iot_sensor_log_data_pipeline_spark.streaming.stateful import (
        count_trigger_stream,
    )

    data_dir = os.path.join(scratch, "in")
    # Two devices, 230 and 170 rows -> with threshold 100: 2 fires + 1.
    a = sensor_batch(spark, 230, client_id="dev_a")
    b = sensor_batch(spark, 170, client_id="dev_b")
    a.unionByName(b).write.mode("overwrite").parquet(data_dir)

    stream = _sensor_stream_from_dir(spark, data_dir)
    fires = count_trigger_stream(stream, threshold=100)
    name = f"fires_{uuid.uuid4().hex[:8]}"
    _run_to_memory(fires, name)
    rows = spark.sql(f"SELECT client_id, count(*) AS n FROM {name} GROUP BY 1").collect()
    got = {r["client_id"]: r["n"] for r in rows}
    assert got == {"dev_a": 2, "dev_b": 1}


def test_foreachbatch_replay_is_idempotent(spark, scratch):
    """Checkpoint-recovery semantics: re-delivering the same batch_id
    must not duplicate landed rows (exactly-once to the logs sink)."""
    logs = os.path.join(scratch, "logs")
    dest = os.path.join(scratch, "out")
    batch = sensor_batch(spark, 200)

    compactor = CountTriggeredCompactor(
        logs_dir=logs, dest_base=dest, threshold=10_000  # never fires
    )
    compactor(batch, 7)
    compactor(batch, 7)  # replay of the SAME batch id
    landed = spark.read.json(os.path.join(logs, "batch_7"))
    assert landed.count() == 200


def test_watermark_drops_late_data(spark, scratch):
    """Watermark semantics (Table B 'watermark + late data'): a row
    arriving in a later micro-batch but event-timed far behind the
    advanced watermark must be dropped by the windowed-aggregation
    state, and append mode must emit exactly the closed windows."""
    from datetime import datetime

    data_dir = os.path.join(scratch, "in")
    os.makedirs(data_dir, exist_ok=True)
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731

    def write_rows(sub, specs):
        spark.createDataFrame(
            [("dev", ts(t), 50.0, 30.0, 1010.0, 0.0, 0.0, 0.0, c) for t, c in specs],
            SENSOR_LOG,
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(data_dir, sub))

    # Batch 1: one hour of on-time data.
    write_rows("f0", [("2022-07-14T10:00:00", 0), ("2022-07-14T10:59:00", 1)])

    stream = spark.readStream.schema(SENSOR_LOG).parquet(data_dir + "/*/")
    agg = (
        stream.withWatermark("timestamp", "10 minutes")
        .groupBy(F.window("timestamp", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH").alias("hour"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = P.start_memory_sink(agg, name, output_mode="append")
    q.processAllAvailable()  # batch 1 -> watermark advances to 10:49

    # Batch 2 arrives strictly later: fresh row + a VERY late 9:00 row
    # (its window [09:00,10:00) already ended before the watermark).
    write_rows("f1", [("2022-07-14T11:30:00", 2), ("2022-07-14T09:00:00", 99)])
    q.processAllAvailable()
    # Batch 3: push event time ahead so the [10,11) window also closes.
    write_rows("f2", [("2022-07-14T12:30:00", 3)])
    q.processAllAvailable()
    q.stop()

    emitted = {r["hour"]: r["n"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # [10,11) closed with exactly its 2 on-time rows; the late 9:00 row
    # was dropped (no '09' window ever emitted, no reopening).
    assert emitted.get("10") == 2, emitted
    assert "09" not in emitted, emitted


def test_stream_static_join(spark, scratch):
    """Stream-static join (Table B): the streaming side joins a static
    broadcast dimension per micro-batch (no watermark needed on the
    static side)."""
    data_dir = os.path.join(scratch, "in")
    sensor_batch(spark, 100, client_id="dev_a").unionByName(
        sensor_batch(spark, 50, client_id="dev_b")
    ).write.mode("overwrite").parquet(data_dir)

    device_dim = spark.createDataFrame(
        [("dev_a", "lab"), ("dev_b", "field"), ("dev_c", "unused")],
        "client_id string, site string",
    )
    stream = _sensor_stream_from_dir(spark, data_dir)
    enriched = stream.join(F.broadcast(device_dim), "client_id").groupBy("site").count()

    name = f"ss_{uuid.uuid4().hex[:8]}"
    _run_to_memory(enriched, name, mode="complete")
    got = {r["site"]: r["count"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == {"lab": 100, "field": 50}


def test_stateful_sessionization_matches_batch(spark, scratch):
    """Streaming sessionization (applyInPandasWithState, 30-min gap)
    must emit exactly the sessions the batch lag+cumsum computation
    finds on the same events: arrival-driven closes within and across
    micro-batches, and a watermark flush closes the trailing sessions."""
    from datetime import datetime, timedelta

    from iot_sensor_log_data_pipeline_spark.streaming.stateful import (
        sessionize_stream,
    )

    base = datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions (3 events, gap > 30 min, 2 events)
    for m in (0, 5, 10, 70, 75):
        rows.append((1, base + timedelta(minutes=m)))
    # user 2: one long session (gaps < 30 min)
    for m in (0, 20, 40, 60):
        rows.append((2, base + timedelta(minutes=m)))
    # user 3: three single-event sessions
    for m in (0, 60, 120):
        rows.append((3, base + timedelta(minutes=m)))
    data_dir = os.path.join(scratch, "sessions_in")
    os.makedirs(data_dir, exist_ok=True)
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    df.coalesce(1).write.mode("append").parquet(data_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(data_dir)
    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = P.start_memory_sink(sessionize_stream(stream, gap_seconds=1800), name)
    q.processAllAvailable()
    # Flush batch: one far-future event per user closes every open
    # session (arrival-driven) and advances the watermark.
    flush_ts = base + timedelta(days=2)
    flush = spark.createDataFrame(
        [(u, flush_ts) for u in (1, 2, 3)], "user_id long, ts timestamp"
    )
    flush.coalesce(1).write.mode("append").parquet(data_dir)
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r["session_start"] < flush_ts  # exclude the flush session itself
    }

    # Batch twin: lag+cumsum sessionization over the same (pre-flush) rows.
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = df.select(
        "user_id", "ts", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_s")
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.select("user_id", "ts", F.sum("new_s").over(cum).alias("sid"))
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessions.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert got == expected
    assert len(got) == 6  # 2 + 1 + 3 sessions


def test_stateful_count_trigger_tws_matches_classic(spark, scratch):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) must
    produce the same fires as the applyInPandasWithState counter --
    gated: the API needs protobuf, which this container does not ship,
    so without it the builder must fail with a clear gate error
    instead of crashing the streaming query at runtime."""
    from iot_sensor_log_data_pipeline_spark.streaming.stateful import (
        count_trigger_stream_tws,
        tws_available,
    )

    data_dir = os.path.join(scratch, "in_tws")
    a = sensor_batch(spark, 230, client_id="dev_a")
    b = sensor_batch(spark, 170, client_id="dev_b")
    a.unionByName(b).write.mode("overwrite").parquet(data_dir)

    stream = _sensor_stream_from_dir(spark, data_dir)
    if not tws_available():
        with pytest.raises(ModuleNotFoundError):
            count_trigger_stream_tws(stream, threshold=100)
        return
    fires = count_trigger_stream_tws(stream, threshold=100)
    name = f"fires_tws_{uuid.uuid4().hex[:8]}"
    _run_to_memory(fires, name)
    rows = spark.sql(f"SELECT client_id, count(*) AS n FROM {name} GROUP BY 1").collect()
    got = {r["client_id"]: r["n"] for r in rows}
    assert got == {"dev_a": 2, "dev_b": 1}


def test_streaming_cdc_merge_matches_batch_merge(spark, scratch):
    """foreachBatch CDC apply: after the stream drains, the parquet
    table must equal the batch merge_upsert of the same change set."""
    import os

    from iot_sensor_log_data_pipeline_spark.operators.scd import merge_upsert
    from iot_sensor_log_data_pipeline_spark.streaming.pipeline import (
        start_cdc_merge_sink,
    )

    table = os.path.join(scratch, "cdc_table")
    changes_dir = os.path.join(scratch, "cdc_changes")
    ckpt = os.path.join(scratch, "cdc_ckpt")

    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], "k long, v string, seq long"
    )
    base.write.parquet(table)

    changes = spark.createDataFrame(
        [(2, "b2", 1), (4, "d", 1), (2, "b3", 2)], "k long, v string, seq long"
    )
    changes.write.parquet(changes_dir)

    stream = spark.readStream.schema(changes.schema).parquet(changes_dir)
    q = start_cdc_merge_sink(stream, table, keys=["k"], seq_col="seq", checkpoint=ckpt)
    q.processAllAvailable()
    q.stop()

    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(table).collect())
    latest = changes.withColumn(
        "__rn",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                "k"
            ).orderBy(F.desc("seq"))
        ),
    ).where("__rn = 1").drop("__rn")
    expect = sorted(
        (r["k"], r["v"]) for r in merge_upsert(base, latest, ["k"]).collect()
    )
    assert got == expect == [(1, "a"), (2, "b3"), (3, "c"), (4, "d")]


def test_socket_wire_ingest_end_to_end(spark):
    """Broker-in-the-loop integration of the ingest path WITHOUT Kafka
    jars: a local TCP server plays the broker, Spark's socket source is
    the consumer, and the wire decode + QoS1 dedup are exactly the
    builders the Kafka reader composes (``sources/kafka.py`` swaps only
    the transport).  Redelivers one message to prove the at-least-once
    correction over a real network transport."""
    import json
    import socket
    import threading

    from iot_sensor_log_data_pipeline_spark.sources.sensor import from_wire

    def wire(count: int) -> str:
        return json.dumps(
            {
                "client_id": "raspberrypi",
                "timestamp": f"2022-07-14 15:00:{count:02d}",
                "humidity": 45.0 + count,
                "temperature": 38.0 + count,
                "pressure": 1013.0,
                "pitch": 0.5,
                "roll": 1.5,
                "yaw": 2.5,
                "count": count,
            }
        )

    msgs = [wire(0), wire(1), wire(1), wire(2)]  # count=1 redelivered

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    done = threading.Event()

    def serve() -> None:
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(msgs) + "\n").encode())
            done.wait(timeout=60)  # hold open until the query drained

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    rows = P.dedup_qos1(from_wire(raw))
    name = "socket_wire_e2e"
    q = P.start_memory_sink(rows, name)
    try:
        q.processAllAvailable()
        got = {
            (r["client_id"], r["count"], r["temperature"])
            for r in spark.table(name).collect()
        }
    finally:
        done.set()
        q.stop()
        server.close()
    assert got == {
        ("raspberrypi", 0, 38.0),
        ("raspberrypi", 1, 39.0),
        ("raspberrypi", 2, 40.0),
    }


def test_near_dup_match_stream_flags_corpus_copy(spark, tmp_path):
    """Streaming near-dup: a near-copy of a corpus doc must match the
    persisted LSH index in-flight; a novel doc must not."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    corpus = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (101, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    index = DD.minhash_bands(
        DD.minhash_signatures_wide(DD.shingle_table(corpus, "doc_id", "text"))
    )

    src = str(tmp_path / "stream_src")
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    incoming = spark.createDataFrame(
        [
            # exact text of corpus doc 100 -> every band collides
            (1, t0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, t0, "completely novel words that share nothing with the corpus"),
        ],
        "doc_id long, ts timestamp, text string",
    )
    incoming.write.parquet(src)

    stream = spark.readStream.schema(incoming.schema).parquet(src)
    matches = P.near_dup_match_stream(stream, index)
    name = "near_dup_stream"
    q = P.start_memory_sink(matches, name)
    try:
        q.processAllAvailable()
        got = {(r["doc_id"], r["corpus_id"]) for r in spark.table(name).collect()}
    finally:
        q.stop()
    assert got == {(1, 100)}


def test_ann_match_stream_flags_near_identical_vector(spark, tmp_path):
    """Streaming ANN: an arriving vector near-identical to an indexed
    corpus vector must match the persisted LSH index in-flight with
    cosine >= threshold; an unrelated vector must not."""
    from datetime import datetime

    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN

    rng = np.random.default_rng(31)
    base = rng.standard_normal(64)
    corpus = spark.createDataFrame(
        [
            (100, [float(x) for x in base]),
            (101, [float(x) for x in rng.standard_normal(64)]),
        ],
        "vec_id long, embedding array<float>",
    )
    root = str(tmp_path / "lsh_idx")
    ANN.build_lsh_index(corpus, root, bands=16, rows_per_band=4)

    src = str(tmp_path / "vec_stream")
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    near_dup = base + rng.standard_normal(64) * 0.001
    incoming = spark.createDataFrame(
        [
            (1, t0, [float(x) for x in near_dup]),
            (2, t0, [float(x) for x in rng.standard_normal(64)]),
        ],
        "vec_id long, ts timestamp, embedding array<float>",
    )
    incoming.write.parquet(src)

    stream = spark.readStream.schema(incoming.schema).parquet(src)
    matches = P.ann_match_stream(stream, root, threshold=0.9)
    name = "ann_match_stream_sink"
    q = P.start_memory_sink(matches, name)
    try:
        q.processAllAvailable()
        got = {
            (r["vec_id"], r["corpus_id"]): r["cos_sim"]
            for r in spark.table(name).collect()
        }
    finally:
        q.stop()
    assert set(got) == {(1, 100)}
    assert got[(1, 100)] > 0.99


def test_psi_monitor_flags_drifted_batch(spark, tmp_path):
    """Streaming PSI: a micro-batch drawn from the reference
    distribution logs a low PSI; a mean-shifted batch logs
    investigate-level drift."""
    import numpy as np

    rng = np.random.default_rng(17)
    ref = spark.createDataFrame(
        [(float(x),) for x in rng.normal(50.0, 5.0, 3000)], "v double"
    )
    src = str(tmp_path / "psi_src")
    # one file per micro-batch (maxFilesPerTrigger=1): file0 stable,
    # file1 shifted
    stable = spark.createDataFrame(
        [(float(x),) for x in rng.normal(50.0, 5.0, 2000)], "v double"
    )
    shifted = spark.createDataFrame(
        [(float(x),) for x in rng.normal(80.0, 5.0, 2000)], "v double"
    )
    stable.coalesce(1).write.parquet(src)
    shifted.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "psi_log")
    q = P.start_psi_monitor(
        stream, ref, "v", out, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        (r["psi"] for r in spark.read.parquet(out).collect())
    )
    assert len(rows) == 2
    assert rows[0] < 0.1          # stable batch
    assert rows[1] > 0.25         # shifted batch

    # At-least-once replay: wipe the checkpoint and re-run over the
    # same source into the same drift log.  Both batches re-execute
    # with the same batch ids; the per-batch overwrite partition keeps
    # the log duplicate-free (one row per batch id, not four).
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt"))
    q2 = P.start_psi_monitor(
        stream, ref, "v", out, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    replayed = spark.read.parquet(out).collect()
    assert len(replayed) == 2
    assert sorted(r["batch_id"] for r in replayed) == [0, 1]


def test_curation_ingest_stream_gates_and_dedups(spark, tmp_path):
    """Streaming curation front door: low-quality and off-language
    rows are dropped in flight, and a reordered duplicate within the
    watermark is deduplicated by its canonical fingerprint."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), "the quick brown fox jumps over the lazy dog"),
        (2, datetime(2024, 1, 1, 10, 0, 5), "dog lazy the over jumps fox brown quick the"),  # reordered dup
        (3, datetime(2024, 1, 1, 10, 0, 9), "le chat est sur la table et la chaise"),        # not-en
        (4, datetime(2024, 1, 1, 10, 0, 12), "#### $$$$ !!!! %%%% ^^^^ &&&& **** @@@@"),     # junk
        (5, datetime(2024, 1, 1, 10, 0, 20), "a completely different and quite reasonable the sentence"),
    ]
    src = str(tmp_path / "cur_src")
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)
    q = (
        P.curation_ingest_stream(stream, min_quality=0.5, lang="en")
        .writeStream.format("memory")
        .queryName("curated_ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.table("curated_ingest").collect()}
    finally:
        q.stop()
    assert 5 in got and got <= {1, 2, 5}
    assert len(got & {1, 2}) == 1  # exactly one of the reordered twins
    assert 3 not in got and 4 not in got


def test_curation_ingest_stream_blocklist_gate(spark, tmp_path):
    """The C4-style badwords rule applied in flight: any whole-token
    blocklist hit rejects the document before it lands; substring
    look-alikes pass (same `blocklist_hit_tokens` expression as the
    batch audit, so the two paths cannot drift)."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0),
         "the quick brown fox jumps over the lazy dog"),
        (2, datetime(2024, 1, 1, 10, 0, 5),
         "this sentence contains spam and it should not land at all"),
        (3, datetime(2024, 1, 1, 10, 0, 9),
         "the scunthorpe residents write perfectly reasonable sentences and the town is fine"),
    ]
    src = str(tmp_path / "bl_src")
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(src)
    q = (
        P.curation_ingest_stream(
            stream, min_quality=0.3, lang="en",
            blocklist=["spam", "thorpe"],
        )
        .writeStream.format("memory")
        .queryName("bl_curated")
        .option("checkpointLocation", str(tmp_path / "bl_ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.table("bl_curated").collect()}
    finally:
        q.stop()
    assert 2 not in got          # whole-token 'spam' hit -> dropped
    assert 1 in got and 3 in got  # clean + substring-only survive


def test_watermark_sized_from_measured_lateness(spark, tmp_path):
    """The lateness monitor closes its loop: profile a stream whose
    p99 lag is a planted 40 s, derive the watermark
    (ceil(40 * 1.5) = 60 s), and construct the curation ingest sink
    from the MEASURED number -- a duplicate arriving 50 s late (inside
    the sized watermark) still dedups.  A guessed 10 s watermark
    would have expired the fingerprint state before it arrived."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    late_log = str(tmp_path / "late_log")
    # profile: 99 on-time events, 1 trailing by 40 s => p99 ~= 40
    profile = spark.createDataFrame(
        [(base,)] * 95 + [(base - dt.timedelta(seconds=40),)] * 5,
        "ts timestamp",
    )
    P.lateness_score_batch(profile, 0, "ts", late_log)
    wm = P.watermark_from_lateness(spark, late_log)
    secs = int(wm.split()[0])
    assert wm.endswith("seconds") and 40 <= secs <= 60

    rows = [
        (1, base, "the quick brown fox jumps over the lazy dog"),
        (2, base + dt.timedelta(seconds=55),
         "the new data arrived after the big window closed today"),
        # reordered duplicate of doc 1, 50 s late vs the frontier
        (3, base + dt.timedelta(seconds=5),
         "dog lazy the over jumps fox brown quick the"),
    ]
    src = str(tmp_path / "wm_src")
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(src)
    q = (
        P.curation_ingest_stream(stream, min_quality=0.3, lang="en",
                                 watermark=wm)
        .writeStream.format("memory")
        .queryName("wm_curated")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.table("wm_curated").collect()}
    finally:
        q.stop()
    assert 2 in got
    assert len(got & {1, 3}) == 1  # the late reordered twin deduped

    # an empty profile refuses loudly instead of guessing
    import pytest as _pytest

    empty_profile = spark.createDataFrame([], "ts timestamp")
    P.lateness_score_batch(empty_profile, 0, "ts", str(tmp_path / "none"))
    with _pytest.raises(Exception):
        P.watermark_from_lateness(spark, str(tmp_path / "none"))


def test_verbatim_match_stream_flags_shared_run(spark, tmp_path):
    """Streaming verbatim matching: an arriving doc that embeds a
    20-token block from the indexed corpus produces exactly the
    batch operator's run row; clean arrivals produce nothing."""
    import random

    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(200)]
    rand = lambda n: [vocab[rng.randrange(200)] for _ in range(n)]  # noqa: E731

    block = rand(20)
    corpus = spark.createDataFrame(
        [
            (100, " ".join(rand(15) + block + rand(10))),
            (101, " ".join(rand(40))),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "anchor_idx")
    DD.build_anchor_index(corpus, idx, k=8)

    arrivals = [
        (1, " ".join(rand(5) + block + rand(5))),   # contains the block
        (2, " ".join(rand(30))),                     # clean
    ]
    src = str(tmp_path / "v_src")
    spark.createDataFrame(arrivals, "doc_id long, text string").coalesce(
        1
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = str(tmp_path / "match_log")
    q = P.start_verbatim_match_sink(
        stream, idx, out, checkpoint=str(tmp_path / "ckpt"), min_len=15
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert {r["id"] for r in rows} == {1}
    hit = [r for r in rows if r["corpus_id"] == 100]
    assert hit and any(r["run_len"] >= 20 for r in hit)
    assert all(r["a_start"] == 5 for r in hit if r["run_len"] >= 20)


def test_nb_quality_stream_matches_batch_scores(spark, tmp_path):
    """Streaming NB gate: in-flight scores must equal the batch
    nb_quality_scores logits for the same docs and model; rejected
    docs carry keep=False.  A far-future flush row advances the
    watermark so append mode finalizes the test windows."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators import text as TX

    train = spark.createDataFrame(
        [
            (True, "good clean prose here"),
            (True, "clean good text prose"),
            (False, "spam spam buy now"),
            (False, "buy spam now now now"),
        ],
        "is_positive boolean, text string",
    )
    model, stats = TX.nb_quality_model(train)

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), "good clean prose"),
        (2, datetime(2024, 1, 1, 10, 0, 5), "spam buy now"),
        (3, datetime(2024, 1, 1, 10, 0, 9), "zzz qqq"),
        (99, datetime(2024, 1, 1, 13, 0, 0), "flush row advancing watermark"),
    ]
    src = str(tmp_path / "nb_src")
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)

    q = (
        P.nb_quality_stream(stream, model, stats, window="5 minutes",
                            watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("nb_stream")
        .option("checkpointLocation", str(tmp_path / "nb_ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["doc_id"]: (r["n_tokens"], r["nb_logit"], r["keep"])
            for r in spark.table("nb_stream").collect()
        }
    finally:
        q.stop()

    batch_docs = spark.createDataFrame(
        [(i, t) for i, _, t in rows[:3]], "doc_id long, text string"
    )
    want = {
        r["doc_id"]: (r["n_tokens"], r["nb_logit"], r["keep"])
        for r in TX.nb_quality_scores(batch_docs, model, stats).collect()
    }
    for did in (1, 2, 3):
        assert got[did] == want[did], (did, got.get(did), want[did])
    assert got[1][2] is True and got[2][2] is False


def test_winnowing_match_stream_flags_local_overlap(spark, tmp_path):
    """Streaming winnowing gate: an arrival sharing a >= w+k-1-token
    run with an indexed corpus doc is flagged against exactly that
    doc; clean arrivals emit nothing; hot fingerprints (df above the
    cap) are pruned from the index side."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    run = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens = w+k-1
    corpus = spark.createDataFrame(
        [
            (100, "intro words here " + run + " closing words follow now"),
            (101, "totally separate corpus document about other things entirely"),
        ],
        "doc_id long, text string",
    )
    corpus_fps = DD.winnowing_fingerprints(corpus, k=4, w=4)

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), "prefix " + run + " suffix tokens here"),
        (2, datetime(2024, 1, 1, 10, 0, 5), "nothing in common with anything indexed at all"),
    ]
    src = str(tmp_path / "win_src")
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)

    q = (
        P.winnowing_match_stream(stream, corpus_fps)
        .writeStream.format("memory")
        .queryName("win_stream")
        .option("checkpointLocation", str(tmp_path / "win_ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["doc_id"], r["corpus_id"])
            for r in spark.table("win_stream").collect()
        }
    finally:
        q.stop()
    assert got == {(1, 100)}


def test_winnowing_match_stream_probes_persisted_index(spark, tmp_path):
    """The streaming winnowing gate over a PERSISTED index: the
    build-time (k, w) geometry -- here a non-default k=3, w=3 -- is
    loaded from the index config and applied to the probe side, and
    the pre-pruned postings replace the per-batch stop-fp aggregation
    of the ad-hoc path."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    run = "alpha beta gamma delta epsilon"  # 5 tokens = w+k-1 at k=w=3
    corpus = spark.createDataFrame(
        [
            (100, "intro words here " + run + " closing words follow now"),
            (101, "totally separate corpus document about other things entirely"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "win_idx")
    DD.build_winnowing_index(corpus, idx, k=3, w=3)

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), "prefix " + run + " suffix tokens here"),
        (2, datetime(2024, 1, 1, 10, 0, 5), "nothing in common with anything indexed at all"),
    ]
    src = str(tmp_path / "win_idx_src")
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(src)

    q = (
        P.winnowing_match_stream(stream, index_path=idx)
        .writeStream.format("memory")
        .queryName("win_idx_stream")
        .option("checkpointLocation", str(tmp_path / "win_idx_ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["doc_id"], r["corpus_id"])
            for r in spark.table("win_idx_stream").collect()
        }
    finally:
        q.stop()
    assert got == {(1, 100)}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly one"):
        P.winnowing_match_stream(stream)


def test_history_dedup_sink_rejects_cross_batch_duplicates(spark, tmp_path):
    """History-complete dedup: a duplicate arriving in a LATER
    micro-batch (beyond any watermark horizon) is still rejected;
    reordered copies dedup via the canonical fingerprint; within-batch
    twins keep the min id."""
    import os

    out = str(tmp_path / "hd_out")
    state = str(tmp_path / "hd_state")
    src = str(tmp_path / "hd_src")
    ckpt = str(tmp_path / "hd_ckpt")
    os.makedirs(src)

    schema = "doc_id long, text string"
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"),  # twin: min id wins
         (3, "a totally different doc")],
        schema,
    )
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = P.start_history_dedup_sink(stream, out, state, ckpt)
    try:
        q.processAllAvailable()
        # batch 2: exact dup of 1, reordered dup of 3, one new doc
        spark.createDataFrame(
            [(10, "the quick brown fox"),
             (11, "doc different totally a"),
             (12, "genuinely new content here")],
            schema,
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 3, 12], got
    n_fps = spark.read.parquet(state).count()
    assert n_fps == 3


def test_history_dedup_replay_is_idempotent_and_store_bucketed(spark, tmp_path):
    """Replaying a micro-batch id (retry after a crash between the
    output and state writes) must not duplicate output rows or state
    fingerprints -- both writes are per-batch-id directory overwrites
    and the anti-join excludes the failed attempt's own state rows.
    The store lays out as batch=<id>/fp_bucket=<k> so the per-batch
    probe partition-prunes to the batch's buckets."""
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    schema = "doc_id long, text string"

    b0 = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"),
         (3, "a totally different doc")],
        schema,
    )
    P.history_dedup_apply_batch(b0, 0, out, state)
    # Replay batch 0: the state already holds batch 0's fingerprints
    # (the exact scenario the pre-fix append path double-wrote).
    P.history_dedup_apply_batch(b0, 0, out, state)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1, 3]
    assert spark.read.parquet(state).count() == 2

    b1 = spark.createDataFrame(
        [(10, "the quick brown fox"), (12, "genuinely new content here")], schema
    )
    P.history_dedup_apply_batch(b1, 1, out, state)
    P.history_dedup_apply_batch(b1, 1, out, state)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [1, 3, 12]
    assert spark.read.parquet(state).count() == 3

    # Store layout: per-batch dirs partitioned by fingerprint bucket.
    batch_dirs = sorted(d for d in os.listdir(state) if d.startswith("batch="))
    assert batch_dirs == ["batch=0", "batch=1"]
    for d in batch_dirs:
        subs = [s for s in os.listdir(os.path.join(state, d)) if s.startswith("fp_bucket=")]
        assert subs, f"{d} missing fp_bucket partitions"


def test_optimize_history_store_compacts_and_preserves_rejection(spark, tmp_path):
    """Compaction rewrites the per-batch state dirs as one batch=-1
    tree (one sorted file per bucket); fingerprints ingested before
    the compaction still reject later duplicates."""
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    schema = "doc_id long, text string"

    P.history_dedup_apply_batch(
        spark.createDataFrame([(1, "alpha beta gamma")], schema), 0, out, state
    )
    P.history_dedup_apply_batch(
        spark.createDataFrame([(2, "delta epsilon zeta")], schema), 1, out, state
    )
    P.optimize_history_store(spark, state)

    dirs = sorted(d for d in os.listdir(state) if d.startswith("batch="))
    assert dirs == ["batch=-1"]
    buckets = [
        d for d in os.listdir(os.path.join(state, "batch=-1"))
        if d.startswith("fp_bucket=")
    ]
    assert len(buckets) == 2  # one dir per distinct fingerprint bucket
    for b in buckets:
        files = [
            f for f in os.listdir(os.path.join(state, "batch=-1", b))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{b} not compacted to one file"

    P.history_dedup_apply_batch(
        spark.createDataFrame(
            [(9, "gamma beta alpha"), (10, "fresh after optimize")], schema
        ),
        2,
        out,
        state,
    )
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 10], got
    assert spark.read.parquet(state).count() == 3


def test_cdc_merge_sink_errors_on_unreadable_table_and_keeps_it(spark, tmp_path):
    """A corrupt/unreadable maintained table must FAIL the micro-batch
    (checkpoint retries it) -- never fall through to the table rewrite,
    which would silently truncate everything previously merged.  The
    pre-fix code swallowed the read error in a bare except and replaced
    the table with only the current batch's rows."""
    table = str(tmp_path / "cdc_table")
    changes_dir = str(tmp_path / "cdc_changes")
    ckpt = str(tmp_path / "cdc_ckpt")

    os.makedirs(table)
    corrupt = os.path.join(table, "part-00000.parquet")
    with open(corrupt, "wb") as f:
        f.write(b"this is not a parquet file")

    changes = spark.createDataFrame([(2, "b2", 1)], "k long, v string, seq long")
    changes.write.parquet(changes_dir)
    stream = spark.readStream.schema(changes.schema).parquet(changes_dir)
    q = P.start_cdc_merge_sink(
        stream, table, keys=["k"], seq_col="seq", checkpoint=ckpt
    )
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    # The table dir was never rmtree'd: the planted file is intact.
    assert os.path.isfile(corrupt)
    with open(corrupt, "rb") as f:
        assert f.read() == b"this is not a parquet file"


def test_cdc_merge_sink_first_batch_creates_table(spark, tmp_path):
    """The legitimate no-table case (first batch) still takes the
    create path -- via an explicit directory probe, not an except."""
    table = str(tmp_path / "cdc_table")
    changes_dir = str(tmp_path / "cdc_changes")
    ckpt = str(tmp_path / "cdc_ckpt")

    changes = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k long, v string, seq long"
    )
    changes.write.parquet(changes_dir)
    stream = spark.readStream.schema(changes.schema).parquet(changes_dir)
    q = P.start_cdc_merge_sink(
        stream, table, keys=["k"], seq_col="seq", checkpoint=ckpt
    )
    q.processAllAvailable()
    q.stop()
    got = sorted((r["k"], r["v"]) for r in spark.read.parquet(table).collect())
    assert got == [(1, "a"), (2, "b")]


def test_history_store_n_buckets_is_persisted_and_validated(spark, tmp_path):
    """The bucket modulus is store geometry, not a per-call knob: it is
    written to a _store_config.json sidecar at creation, a mismatched
    caller raises (probing with a different modulus would miss stored
    fingerprints and admit duplicates), and
    optimize_history_store(n_buckets=...) is the supported re-bucketing
    path -- after which cross-batch rejection still holds under the new
    modulus."""
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    schema = "doc_id long, text string"

    P.history_dedup_apply_batch(
        spark.createDataFrame([(1, "alpha beta gamma")], schema),
        0, out, state, n_buckets=64,
    )
    assert P._read_history_store_n_buckets(state) == 64

    with pytest.raises(ValueError, match="n_buckets=64"):
        P.history_dedup_apply_batch(
            spark.createDataFrame([(2, "delta epsilon")], schema),
            1, out, state, n_buckets=512,
        )

    P.optimize_history_store(spark, state, n_buckets=512)
    assert P._read_history_store_n_buckets(state) == 512

    # Under the new modulus the pre-rebucket fingerprint still rejects
    # its duplicate (token-set fingerprint: reordered copy), and new
    # content lands.
    P.history_dedup_apply_batch(
        spark.createDataFrame(
            [(9, "gamma beta alpha"), (10, "fresh content")], schema
        ),
        1, out, state, n_buckets=512,
    )
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 10], got


def test_history_store_legacy_without_sidecar_adopts_callers_modulus(
    spark, tmp_path
):
    """A store created before the sidecar existed (or whose creating
    batch crashed before stamping it) adopts the caller's n_buckets on
    the next batch and persists it from then on."""
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    schema = "doc_id long, text string"

    P.history_dedup_apply_batch(
        spark.createDataFrame([(1, "alpha beta gamma")], schema),
        0, out, state, n_buckets=64,
    )
    os.remove(P._history_store_config_path(state))  # simulate legacy
    P.history_dedup_apply_batch(
        spark.createDataFrame([(2, "gamma beta alpha"), (3, "new stuff")], schema),
        1, out, state, n_buckets=64,
    )
    assert P._read_history_store_n_buckets(state) == 64
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 3], got


def test_history_store_rejects_out_of_range_modulus(spark, tmp_path):
    """Bucket ids derive from 4 hex chars (16-bit space): a modulus
    beyond 65536 silently stops spreading, so it raises instead."""
    schema = "doc_id long, text string"
    df = spark.createDataFrame([(1, "a b c")], schema)
    with pytest.raises(ValueError, match="65536"):
        P.history_dedup_apply_batch(
            df, 0, str(tmp_path / "o"), str(tmp_path / "s"), n_buckets=100_000
        )
    with pytest.raises(ValueError, match="65536"):
        P.optimize_history_store(spark, str(tmp_path / "s"), n_buckets=0)


def test_winnowing_match_stream_honors_tighter_cap_on_index_branch(
    spark, tmp_path
):
    """A caller cap TIGHTER than the index's persisted max_fp_df must
    re-prune the postings -- pre-fix, max_fp_df was silently ignored on
    the index_path branch, so a hot fingerprint shared by many corpus
    docs fanned every probe out to all of them."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    run = "alpha beta gamma delta epsilon zeta eta"
    # The run appears in 3 corpus docs -> its fingerprints have df 3.
    corpus = spark.createDataFrame(
        [(100 + i, f"doc {i} prefix " + run + f" suffix {i}") for i in range(3)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "win_idx")
    # Build with a loose cap: postings keep the df-3 fingerprints.
    DD.build_winnowing_index(corpus, idx, k=4, w=4, max_fp_df=100)

    rows = [(1, datetime(2024, 1, 1, 10, 0, 0), "probe " + run + " tail words")]
    src = str(tmp_path / "win_src")
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    schema = "doc_id long, ts timestamp, text string"

    def run_stream(name: str, cap):
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            P.winnowing_match_stream(stream, index_path=idx, max_fp_df=cap)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            return {
                (r["doc_id"], r["corpus_id"]) for r in spark.table(name).collect()
            }
        finally:
            q.stop()

    # Loose/equal caller cap: the shared run matches all 3 corpus docs.
    assert run_stream("win_loose", 100) == {(1, 100), (1, 101), (1, 102)}
    # Tighter caller cap (2 < stored 100): the df-3 fingerprints are
    # re-pruned, so the hot run cannot fan out.
    assert run_stream("win_tight", 2) == set()


def test_optimize_ivf_index_stages_both_tables_before_swap(spark, tmp_path):
    """After optimize, centroids and entries agree (every entry cell
    has a centroid, fresh split cells included) and no __next staging
    directory is left behind -- the staged-swap crash-window contract."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI

    rng = np.random.default_rng(5)
    # One tight cluster (over-cap cell) plus scattered points.
    tight = [
        (i, [float(x) for x in (rng.standard_normal(16) * 0.01 + 5.0)])
        for i in range(30)
    ]
    spread = [
        (100 + i, [float(x) for x in rng.standard_normal(16)]) for i in range(10)
    ]
    emb = spark.createDataFrame(tight + spread, "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf_opt")
    AI.build_ivf_index(emb, path, n_cells=2)
    AI.optimize_ivf_index(spark, path, cell_cap=10)

    cent_cells = {
        int(r["cell"]) for r in spark.read.parquet(path + "/centroids").collect()
    }
    entry_cells = {
        int(r["cell"]) for r in spark.read.parquet(path + "/entries").collect()
    }
    assert entry_cells <= cent_cells
    assert len(cent_cells) > 2  # splitting actually happened
    leftovers = [d for d in os.listdir(path) if d.endswith("__next")]
    assert not leftovers, leftovers


def test_cms_sink_maintains_mergeable_sketch(spark, tmp_path):
    """Streaming CMS maintenance: after two micro-batches, point
    estimates from the merged store respect the CMS guarantee
    (estimate >= true count) and hit exactly for keys without
    collisions; replaying a batch id does not change totals; compaction
    folds the store to one batch=-1 tree with identical estimates."""
    from iot_sensor_log_data_pipeline_spark.operators.sketch import cms_estimate

    store = str(tmp_path / "cms_store")
    schema = "key string"

    b0 = spark.createDataFrame(
        [("alpha",)] * 5 + [("beta",)] * 2 + [("gamma",)], schema
    )
    b1 = spark.createDataFrame([("alpha",)] * 3 + [("delta",)] * 4, schema)
    P.cms_apply_batch(b0, 0, store)
    P.cms_apply_batch(b0, 0, store)  # replay: overwrite, not double-count
    P.cms_apply_batch(b1, 1, store)

    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",), ("never-seen",)], schema
    )
    true = {"alpha": 8, "beta": 2, "gamma": 1, "delta": 4, "never-seen": 0}

    def estimates():
        sk = P.load_cms_store(spark, store)
        return {
            r["key"]: r["est_count"]
            for r in cms_estimate(sk, probes, key_col="key").collect()
        }

    est = estimates()
    # sparse-sketch semantics (cms_estimate): a key whose cells were
    # never touched returns no row == estimate 0
    for k, t in true.items():
        assert est.get(k, 0) >= t, (k, est.get(k, 0), t)
    # 1024-wide rows, 5 keys: collisions are absent for this fixture
    assert est["alpha"] == 8 and est["delta"] == 4

    P.optimize_cms_store(spark, store)
    dirs = sorted(d for d in os.listdir(store) if d.startswith("batch="))
    assert dirs == ["batch=-1"]
    assert estimates() == est


def test_cms_sink_end_to_end_stream(spark, tmp_path):
    """Drive start_cms_sink with a real file-source stream and check
    the merged sketch sees every ingested key."""
    from iot_sensor_log_data_pipeline_spark.operators.sketch import cms_estimate

    store = str(tmp_path / "cms_store")
    src = str(tmp_path / "cms_src")
    ckpt = str(tmp_path / "cms_ckpt")
    rows = [("tok%d" % (i % 7),) for i in range(50)]
    spark.createDataFrame(rows, "key string").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("key string").parquet(src)
    q = P.start_cms_sink(stream, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    probes = spark.createDataFrame([("tok0",), ("tok6",)], "key string")
    est = {
        r["key"]: r["est_count"]
        for r in cms_estimate(P.load_cms_store(spark, store), probes).collect()
    }
    assert est["tok0"] >= 8 and est["tok6"] >= 7


def test_interval_overlap_join_works_stream_static(spark, tmp_path):
    """The bucketed interval join is stateless (per-row bucket explode
    + equi-join + arithmetic exactly-once rule), so it composes with a
    streaming left side as a stream-static join in append mode with no
    watermark state -- the ingest-time "does this arriving interval
    clash with a reservation/maintenance window?" gate."""
    from datetime import datetime

    from iot_sensor_log_data_pipeline_spark.operators.intervals import (
        interval_overlap_join,
    )

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    static = spark.createDataFrame(
        [(100, t(2), t(4)), (101, t(10), t(12))],
        "win_id long, s_b timestamp, e_b timestamp",
    )
    src = str(tmp_path / "iv_src")
    spark.createDataFrame(
        [
            (1, t(3), t(3, 30)),   # inside window 100
            (2, t(5), t(6)),       # clashes with nothing
            (3, t(1), t(11)),      # spans both windows (multi-bucket)
        ],
        "req_id long, s_a timestamp, e_a timestamp",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "req_id long, s_a timestamp, e_a timestamp"
    ).parquet(src)

    q = (
        interval_overlap_join(stream, static, "s_a", "e_a", "s_b", "e_b")
        .select("req_id", "win_id")
        .writeStream.format("memory")
        .queryName("iv_stream")
        .option("checkpointLocation", str(tmp_path / "iv_ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["req_id"], r["win_id"]) for r in spark.table("iv_stream").collect()
        )
    finally:
        q.stop()
    assert got == [(1, 100), (3, 100), (3, 101)]


def test_hh_sink_maintains_mergeable_summary(spark, tmp_path):
    """Streaming heavy-hitter maintenance: after skewed micro-batches
    where distinct keys >> k, the merged store (a) keeps every key
    whose true all-time count exceeds n/(k+1), (b) only ever
    under-counts, within n/(k+1); replaying a batch id does not
    double-count; compaction folds the store to one <= k-row batch=-1
    summary with the guarantees intact."""
    import collections

    store = str(tmp_path / "hh_store")
    schema = "key string"
    k = 8

    rows0 = [("hot1",)] * 200 + [(f"c{i % 64}",) for i in range(100)]
    rows1 = [("hot1",)] * 100 + [("hot2",)] * 150 + [(f"d{i % 64}",) for i in range(100)]
    b0 = spark.createDataFrame(rows0, schema)
    b1 = spark.createDataFrame(rows1, schema)
    truth = collections.Counter(r[0] for r in rows0 + rows1)
    n = len(rows0) + len(rows1)
    bound = n / (k + 1)

    P.hh_apply_batch(b0, 0, store, k=k)
    P.hh_apply_batch(b0, 0, store, k=k)  # replay: overwrite, not double-count
    P.hh_apply_batch(b1, 1, store, k=k)

    def summary():
        return {
            r["key"]: r["count_lo"]
            for r in P.load_hh_store(spark, store).collect()
        }

    s = summary()
    for key, lo in s.items():
        assert 0 < lo <= truth[key], (key, lo, truth[key])
        assert truth[key] - lo <= bound, (key, lo, truth[key], bound)
    for key, cnt in truth.items():
        if cnt > bound:
            assert key in s, (key, cnt, bound)
    assert "hot1" in s and "hot2" in s

    P.optimize_hh_store(spark, store, k=k)
    dirs = sorted(d for d in os.listdir(store) if d.startswith("batch="))
    assert dirs == ["batch=-1"]
    s2 = summary()
    assert len(s2) <= k
    for key, lo in s2.items():
        assert 0 < lo <= truth[key]
        assert truth[key] - lo <= bound, (key, lo, truth[key], bound)
    assert "hot1" in s2 and "hot2" in s2

    # A later batch lands on the compacted store without conflict.
    P.hh_apply_batch(spark.createDataFrame([("hot3",)] * 50, schema), 2, store, k=k)
    s3 = summary()
    assert s3["hot3"] == 50


def test_hh_sink_end_to_end_stream(spark, tmp_path):
    """The writeStream wiring: rate-driven micro-batches through
    start_heavy_hitters_sink leave a loadable store whose summary
    contains the dominant key."""
    store = str(tmp_path / "hh_stream_store")
    ckpt = str(tmp_path / "hh_ckpt")
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(
            F.when(F.col("value") % 10 < 8, F.lit("dominant"))
            .otherwise(F.concat(F.lit("rare"), F.col("value")))
            .alias("key")
        )
    )
    q = P.start_heavy_hitters_sink(stream, store, ckpt, k=16)

    # NO processAllAvailable here: on a rate source new data arrives
    # continuously, so that call can block forever.  Poll the store
    # for the success condition under a deadline instead.
    def summary() -> dict:
        try:
            return {
                r["key"]: r["count_lo"]
                for r in P.load_hh_store(spark, store).collect()
            }
        except Exception:
            return {}  # store not created / mid-write yet

    s: dict = {}
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            s = summary()
            if s.get("dominant", 0) > 0:
                break
            time.sleep(1.0)
    finally:
        q.stop()
        s = summary() or s
    assert s, "store should have at least one batch"
    assert s.get("dominant", 0) == max(s.values())


def test_dd_sink_replay_idempotent_and_compaction_exact(spark, tmp_path):
    """Streaming DDSketch quantile store: replaying a batch id does
    not double-count; merged-store estimates stay within alpha
    relative error of the exact all-time order statistic; compaction
    is a pure re-sum, so estimates before and after are IDENTICAL."""
    import numpy as np

    store = str(tmp_path / "dd_store")
    alpha = 0.01
    rng = np.random.default_rng(11)
    v0 = np.exp(rng.normal(0.0, 1.0, size=1500))
    v1 = np.exp(rng.normal(0.5, 1.2, size=1500))

    b0 = spark.createDataFrame([(float(v),) for v in v0], "value double")
    b1 = spark.createDataFrame([(float(v),) for v in v1], "value double")
    P.dd_apply_batch(b0, 0, store, alpha=alpha)
    P.dd_apply_batch(b0, 0, store, alpha=alpha)  # replay: overwrite
    P.dd_apply_batch(b1, 1, store, alpha=alpha)

    qs = (0.5, 0.9, 0.99)

    def estimates():
        return {
            r["q"]: r["estimate"]
            for r in P.dd_store_quantiles(spark, store, qs, alpha=alpha).collect()
        }

    est = estimates()
    srt = np.sort(np.concatenate([v0, v1]))
    n = len(srt)
    for q in qs:
        true = srt[int(np.floor(q * (n - 1)))]
        assert abs(est[q] - true) / true <= alpha * 1.001 + 1e-6, (
            q, est[q], true,
        )

    P.optimize_dd_store(spark, store)
    dirs = sorted(d for d in os.listdir(store) if d.startswith("batch="))
    assert dirs == ["batch=-1"]
    assert estimates() == est  # compaction is exact, not just within-bound

    # A later batch lands on the compacted store and shifts the tail.
    P.dd_apply_batch(
        spark.createDataFrame([(1000.0,)] * 400, "value double"), 2, store,
        alpha=alpha,
    )
    est2 = estimates()
    assert abs(est2[0.99] - 1000.0) / 1000.0 <= alpha * 1.001 + 1e-6


def test_observed_quality_metrics_ride_each_batch(spark, tmp_path):
    """CollectMetrics observability: the quality counters attached via
    with_observed_quality arrive in the streaming progress of every
    micro-batch and, folded across batches, equal the batch-computed
    truth -- with no aggregation query of their own."""
    data_dir = str(tmp_path / "in")
    rows = [(float(i),) if i % 5 else (None,) for i in range(200)]
    df = spark.createDataFrame(rows, "value double")
    df.repartition(2).write.mode("overwrite").parquet(data_dir)

    stream = spark.readStream.schema("value double").parquet(data_dir)
    name = f"obs_{uuid.uuid4().hex[:8]}"
    q = P.start_memory_sink(P.with_observed_quality(stream), name)
    try:
        q.processAllAvailable()
        history = P.observed_metrics_history(q)
    finally:
        q.stop()

    assert history, "no observed metrics in any progress event"
    n = sum(m["n_rows"] for m in history)
    nulls = sum(m["n_null"] for m in history)
    non_null = [m for m in history if m["n_rows"] > m["n_null"]]
    assert n == 200 and nulls == 40
    assert min(m["min_value"] for m in non_null) == 1.0
    assert max(m["max_value"] for m in non_null) == 199.0


def test_token_budget_sink_enforces_lifetime_caps(spark, tmp_path):
    """The streaming budget gate spends each source's cap across
    micro-batches: a source exhausted in batch 1 admits nothing in
    batch 2, a source with remaining budget keeps filling, and an
    uncapped source never passes."""
    import os

    out = str(tmp_path / "tb_out")
    state = str(tmp_path / "tb_state")
    src = str(tmp_path / "tb_src")
    ckpt = str(tmp_path / "tb_ckpt")
    os.makedirs(src)

    schema = "doc_id long, source string, text string"
    # every doc is 4 tokens; caps: a=6 (fits one doc), b=100 (plenty)
    b1 = spark.createDataFrame(
        [(1, "a", "w x y z"), (2, "a", "w x y z"),
         (3, "b", "w x y z"), (4, "c", "w x y z")],
        schema,
    )
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = P.start_token_budget_sink(
        stream, out, state, ckpt, caps={"a": 6, "b": 100}
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(10, "a", "w x y z"),   # a exhausted: rejected
             (11, "b", "w x y z"),   # b still open: admitted
             (12, "c", "w x y z")],  # uncapped: rejected
            schema,
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r["doc_id"])
    assert "c" not in by_source
    assert sorted(by_source["b"]) == [3, 11]
    assert len(by_source["a"]) == 1 and by_source["a"][0] in (1, 2)
    assert all(r["n_tokens"] == 4 for r in rows)
    ledger = {
        r["source"]: r["admitted_tokens"]
        for r in P.load_budget_ledger(spark, state).collect()
    }
    assert ledger == {"a": 4, "b": 8}


def test_token_budget_replay_is_idempotent(spark, tmp_path):
    """Re-running a batch id (crash replay) rewrites the same output
    and the same ledger rows -- totals never double-spend; a short doc
    later in the prefix order cannot ride around the greedy gate."""
    out = str(tmp_path / "tbr_out")
    state = str(tmp_path / "tbr_state")

    schema = "doc_id long, source string, text string"
    b0 = spark.createDataFrame(
        [(1, "a", "t1 t2 t3"), (2, "a", "t4 t5 t6"), (3, "a", "t7 t8")],
        schema,
    )
    P.token_budget_apply_batch(b0, 0, out, state, caps={"a": 7})
    first = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in spark.read.parquet(out).collect()
    )
    # greedy prefix in md5(doc_id) order: total admitted <= 7 tokens
    assert sum(n for _, n in first) <= 7
    P.token_budget_apply_batch(b0, 0, out, state, caps={"a": 7})  # replay
    again = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == first
    ledger = {
        r["source"]: r["admitted_tokens"]
        for r in P.load_budget_ledger(spark, state).collect()
    }
    assert ledger == {"a": sum(n for _, n in first)}
    # a second batch keeps spending the remainder only
    b1 = spark.createDataFrame([(9, "a", "u1 u2 u3 u4 u5")], schema)
    P.token_budget_apply_batch(b1, 1, out, state, caps={"a": 7})
    total = sum(r["n_tokens"] for r in spark.read.parquet(out).collect())
    assert total <= 7


def test_token_budget_custom_source_col_normalizes_ledger(spark, tmp_path):
    """A non-default source_col must still write the ledger under the
    fixed 'source' column: cross-batch enforcement and
    load_budget_ledger both read it without knowing the caller's
    naming (the ADVICE round-8 unresolved-column / null-key bug)."""
    out = str(tmp_path / "tbc_out")
    state = str(tmp_path / "tbc_state")

    schema = "doc_id long, domain string, text string"
    b0 = spark.createDataFrame([(1, "a", "t1 t2 t3 t4 t5")], schema)
    P.token_budget_apply_batch(
        b0, 0, out, state, caps={"a": 7}, source_col="domain"
    )
    ledger = {
        r["source"]: r["admitted_tokens"]
        for r in P.load_budget_ledger(spark, state).collect()
    }
    assert ledger == {"a": 5}
    # second batch must see the prior spend under the custom name too
    b1 = spark.createDataFrame([(2, "a", "u1 u2 u3 u4 u5")], schema)
    P.token_budget_apply_batch(
        b1, 1, out, state, caps={"a": 7}, source_col="domain"
    )
    total = sum(r["n_tokens"] for r in spark.read.parquet(out).collect())
    assert total <= 7


def test_optimize_budget_ledger_preserves_spend_and_enforcement(spark, tmp_path):
    """Compaction folds the ledger to one row per source with
    identical totals, and post-compaction batches still see the full
    lifetime spend (batch=-1 survives the replay-exclusion filter)."""
    out = str(tmp_path / "obl_out")
    state = str(tmp_path / "obl_state")

    schema = "doc_id long, source string, text string"
    P.token_budget_apply_batch(
        spark.createDataFrame([(1, "a", "t1 t2 t3")], schema),
        0, out, state, caps={"a": 5},
    )
    P.token_budget_apply_batch(
        spark.createDataFrame([(2, "a", "t4 t5")], schema),
        1, out, state, caps={"a": 5},
    )
    before = {
        r["source"]: r["admitted_tokens"]
        for r in P.load_budget_ledger(spark, state).collect()
    }
    P.optimize_budget_ledger(spark, state)
    after = {
        r["source"]: r["admitted_tokens"]
        for r in P.load_budget_ledger(spark, state).collect()
    }
    assert after == before == {"a": 5}
    # budget exhausted: a post-compaction batch admits nothing
    P.token_budget_apply_batch(
        spark.createDataFrame([(3, "a", "t6")], schema),
        2, out, state, caps={"a": 5},
    )
    total = sum(r["n_tokens"] for r in spark.read.parquet(out).collect())
    assert total == 5


def test_dd_sink_end_to_end_stream(spark, tmp_path):
    """Drive start_dd_quantile_sink with a real file-source stream:
    the persisted store's p50/p99 must sit within the alpha relative
    error of the exact order statistics over everything ingested."""
    import numpy as np

    store = str(tmp_path / "dds_store")
    src = str(tmp_path / "dds_src")
    ckpt = str(tmp_path / "dds_ckpt")
    vals = [float(v) for v in np.random.default_rng(2).lognormal(3, 1, 400)]
    spark.createDataFrame(
        [(v,) for v in vals], "value double"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("value double").parquet(src)
    q = P.start_dd_quantile_sink(stream, store, ckpt, alpha=0.01)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["q"]: r["estimate"]
        for r in P.dd_store_quantiles(
            spark, store, quantiles=(0.5, 0.99), alpha=0.01
        ).collect()
    }
    for qq in (0.5, 0.99):
        exact = float(np.quantile(vals, qq, method="lower"))
        assert abs(got[qq] - exact) / exact <= 0.025, (qq, got[qq], exact)


def test_cusum_monitor_accumulates_across_micro_batches(spark, tmp_path):
    """The stateful CUSUM monitor fires an alarm whose drift spans TWO
    micro-batches (each batch alone stays under the threshold --
    stateless per-batch monitoring would never fire), emits nothing
    for an in-control key, and resets after the alarm."""
    import datetime as dt

    from iot_sensor_log_data_pipeline_spark.streaming.stateful import (
        cusum_monitor_stream,
    )

    src = str(tmp_path / "cm_src")
    ckpt = str(tmp_path / "cm_ckpt")
    os.makedirs(src)
    baseline = spark.createDataFrame(
        [("drift", 10.0, 2.0), ("ok", 10.0, 2.0)], "client_id string, mu double, sd double"
    )
    schema = "client_id string, ts timestamp, value double"

    def rows(dev, vals, t0):
        return [
            (dev, dt.datetime(2024, 1, 1, 0, 0, t0 + i), float(v))
            for i, v in enumerate(vals)
        ]

    # z = (value-10)/2; drift sends 12.6 -> z=1.3 -> s_hi += 0.8/event.
    # 3 events/batch = +2.4 per batch: under h=4 alone, over after two.
    b1 = rows("drift", [12.6] * 3, 0) + rows("ok", [10.0, 9.8, 10.2], 0)
    b2 = rows("drift", [12.6] * 3, 10) + rows("ok", [10.1, 9.9, 10.0], 10)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = cusum_monitor_stream(stream, baseline, k=0.5, h=4.0)
    q = (
        out.writeStream.format("memory")
        .queryName("cusum_mon")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM cusum_mon").count() == 0  # under h
        spark.createDataFrame(b2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        alarms = spark.sql("SELECT * FROM cusum_mon").collect()
    finally:
        q.stop()

    assert len(alarms) == 1
    a = alarms[0]
    assert a["key"] == "drift" and a["side"] == "high"
    # fired on the 5th drift event: 5 * 0.8 = 4.0 < ... 6th: 4.8 > 4
    assert abs(a["s_hi"] - 4.8) < 1e-6
    assert a["alarm_ts"].second == 12  # the 6th drift event (t0=10 + 2)


def test_cusum_monitor_tws_gated_or_matches_classic(spark, tmp_path):
    """The Spark-4 TWS CUSUM twin either fails with the clear protobuf
    gate error (this container) or reproduces the classic monitor's
    cross-batch alarm."""
    import datetime as dt

    from iot_sensor_log_data_pipeline_spark.streaming.stateful import (
        cusum_monitor_stream_tws,
        tws_available,
    )

    src = str(tmp_path / "cmt_src")
    schema = "key string, ts timestamp, z double"
    rows = [
        ("drift", dt.datetime(2024, 1, 1, 0, 0, i), 1.3) for i in range(6)
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    if not tws_available():
        with pytest.raises(ModuleNotFoundError):
            cusum_monitor_stream_tws(stream)
        return
    out = cusum_monitor_stream_tws(stream, k=0.5, h=4.0)
    name = f"cusum_tws_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "cmt_ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        alarms = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    assert len(alarms) == 1 and alarms[0]["side"] == "high"


def test_ivf_ingest_sink_indexes_replays_and_compacts(spark, tmp_path):
    """Streaming IVF ingest: (1) a vector arriving in a micro-batch is
    findable by the probe the batch after (segment union); (2)
    replaying a batch id is idempotent; (3) compacting the segment
    trees changes nothing the probe sees; (4) re-balance refuses while
    segments exist (stranded-postings guard)."""
    import numpy as np

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    sf_dir = "/root/testdata/sf0.001"
    emb = load(spark, sf_dir, "embeddings")
    root = str(tmp_path / "ivf_stream")
    ANN.build_ivf_index(
        emb, root, n_cells=16, n_assign=2, centroids=SIM.seed_centroids(emb, 16)
    )
    queries = emb.where(F.col("vec_id") < 3)

    # near-duplicate of query 0 arrives on the "stream" (double-typed
    # on purpose: the cast-to-stored-type path).
    q0 = [float(x) for x in emb.where("vec_id = 0").head()["embedding"]]
    new_id = 20_000_000
    b0 = spark.createDataFrame(
        [(new_id, [x * 1.0001 for x in q0])], "vec_id long, embedding array<double>"
    )
    P.ivf_ingest_apply_batch(b0, 0, root)
    top = ANN.query_ivf_index(spark, root, queries, k=5, n_probe=4)
    assert top.where("query_id = 0 AND rank = 1").head()["neighbor_id"] == new_id

    before = sorted(tuple(r) for r in top.collect())
    P.ivf_ingest_apply_batch(b0, 0, root)  # crash replay
    again = sorted(
        tuple(r)
        for r in ANN.query_ivf_index(spark, root, queries, k=5, n_probe=4).collect()
    )
    assert again == before

    b1 = spark.createDataFrame(
        [(new_id + 1, [float(x) for x in np.ones(64)])],
        "vec_id long, embedding array<double>",
    )
    P.ivf_ingest_apply_batch(b1, 1, root)
    ANN.optimize_ivf_stream_segments(spark, root)
    after = sorted(
        tuple(r)
        for r in ANN.query_ivf_index(spark, root, queries, k=5, n_probe=4).collect()
    )
    # compaction must preserve batch-0 results; batch-1's all-ones
    # vector may enter some top-5, so compare the batch-0 near-dup row.
    assert (
        ANN.query_ivf_index(spark, root, queries, k=5, n_probe=4)
        .where("query_id = 0 AND rank = 1")
        .head()["neighbor_id"]
        == new_id
    )
    assert len(after) > 0

    with pytest.raises(ValueError, match="streaming ingest segments"):
        ANN.optimize_ivf_index(spark, root, cell_cap=1)


def test_sample_sink_maintains_exact_bottomk(spark, tmp_path):
    """Streaming bottom-k sample: the live view equals the batch
    bottom-k over everything ingested (min-wise mergeability), replay
    is idempotent, and compaction changes nothing."""
    import hashlib

    store = str(tmp_path / "sample_store")
    schema = "doc_id long, text string"
    rows = [(i, f"doc {i}") for i in range(60)]
    b0 = spark.createDataFrame(rows[:30], schema)
    b1 = spark.createDataFrame(rows[30:], schema)
    P.sample_apply_batch(b0, 0, store, k=5)
    P.sample_apply_batch(b1, 1, store, k=5)
    P.sample_apply_batch(b1, 1, store, k=5)  # crash replay

    def exact(upto):
        return sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i) for i, _ in upto
        )[:5]

    want = [i for _, i in exact(rows)]
    got = [r["doc_id"] for r in P.load_sample_store(spark, store, k=5).collect()]
    assert got == want

    P.optimize_sample_store(spark, store, k=5)
    got2 = [r["doc_id"] for r in P.load_sample_store(spark, store, k=5).collect()]
    assert got2 == want
    # a later batch can still displace members
    b2 = spark.createDataFrame([(i, f"doc {i}") for i in range(60, 120)], schema)
    P.sample_apply_batch(b2, 2, store, k=5)
    want3 = [i for _, i in exact(rows + [(i, None) for i in range(60, 120)])]
    got3 = [r["doc_id"] for r in P.load_sample_store(spark, store, k=5).collect()]
    assert got3 == want3


def test_index_ingest_sink_dispatches_lsh_and_pq(spark, tmp_path):
    """The family-wide ingest dispatcher: LSH and PQ indexes also
    absorb streamed vectors via segments, the probes see them, and
    segment compaction preserves results."""
    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as ANN
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 2)
    q0 = [float(x) for x in emb.where("vec_id = 0").head()["embedding"]]
    new_id = 40_000_000
    extra = spark.createDataFrame(
        [(new_id, [x * 1.0001 for x in q0])], "vec_id long, embedding array<double>"
    )

    lsh_root = str(tmp_path / "lsh")
    ANN.build_lsh_index(emb, lsh_root, bands=8, rows_per_band=4,
                        planes=SIM.hash_hyperplanes(32, dim=64))
    P.index_ingest_apply_batch(extra, 0, lsh_root)
    got = ANN.query_lsh_index(spark, lsh_root, queries, k=5)
    assert got.where("query_id = 0 AND rank = 1").head()["neighbor_id"] == new_id

    pq_root = str(tmp_path / "pq")
    ANN.build_pq_index(emb, pq_root, m=8, n_codes=16,
                       codebooks=SIM.pq_seed_codebooks(emb, m=8, k=16))
    P.index_ingest_apply_batch(extra, 0, pq_root)
    got = ANN.query_pq_index(spark, pq_root, queries, k=5, rerank=20)
    assert got.where("query_id = 0 AND rank = 1").head()["neighbor_id"] == new_id

    ANN.optimize_stream_segments(spark, lsh_root)
    ANN.optimize_stream_segments(spark, pq_root)
    assert (
        ANN.query_lsh_index(spark, lsh_root, queries, k=5)
        .where("query_id = 0 AND rank = 1").head()["neighbor_id"] == new_id
    )
    assert (
        ANN.query_pq_index(spark, pq_root, queries, k=5, rerank=20)
        .where("query_id = 0 AND rank = 1").head()["neighbor_id"] == new_id
    )


def test_scd2_sink_keeps_history_and_replays_idempotently(spark, tmp_path):
    """Streaming SCD2: (1) first batch bootstraps the dim, (2) a value
    change closes the old version and opens a new current one, (3)
    replaying a batch (crash recovery) changes nothing -- SCD2's own
    semantics make the apply idempotent, (4) in-batch multi-versions
    collapse to the latest, (5) a no-op update opens no version."""
    from datetime import datetime

    dim = str(tmp_path / "scd2_dim")
    ts = lambda s: datetime.fromisoformat(s)  # noqa: E731
    schema = "cust_id long, segment string, eff_ts timestamp"
    args = (["cust_id"], ["segment"], "eff_ts")

    b0 = spark.createDataFrame(
        [(1, "bronze", ts("2024-01-01T00:00:00")),
         (2, "silver", ts("2024-01-01T00:00:00"))], schema)
    P.scd2_sink_apply_batch(b0, 0, dim, *args)
    rows = {(r["cust_id"], r["segment"], r["is_current"])
            for r in spark.read.parquet(dim).collect()}
    assert rows == {(1, "bronze", True), (2, "silver", True)}

    # batch 1: cust 1 changes twice in-batch (collapses to gold),
    # cust 2 re-sends its current value (no-op), cust 3 inserts.
    b1 = spark.createDataFrame(
        [(1, "silver", ts("2024-02-01T00:00:00")),
         (1, "gold", ts("2024-03-01T00:00:00")),
         (2, "silver", ts("2024-03-01T00:00:00")),
         (3, "bronze", ts("2024-03-01T00:00:00"))], schema)
    P.scd2_sink_apply_batch(b1, 1, dim, *args)

    def state():
        return sorted(
            (r["cust_id"], r["segment"], str(r["valid_from"]),
             str(r["valid_to"]), r["is_current"])
            for r in spark.read.parquet(dim).collect()
        )

    after = state()
    cur = {(c, s) for c, s, _, _, curr in after if curr}
    assert cur == {(1, "gold"), (2, "silver"), (3, "bronze")}
    closed = [r for r in after if r[0] == 1 and not r[4]]
    assert len(closed) == 1 and closed[0][3].startswith("2024-03-01")
    assert len([r for r in after if r[0] == 2]) == 1  # no-op: one version

    P.scd2_sink_apply_batch(b1, 1, dim, *args)  # crash replay
    assert state() == after


def test_hll_sink_maintains_mergeable_registers(spark, tmp_path):
    """Streaming HLL maintenance: after two micro-batches the merged
    store's estimates track per-group TRUE distinct counts within HLL
    error; replaying a batch id changes nothing (max is idempotent);
    compaction folds to batch=-1 with identical registers; and the
    persisted registers feed the overlap pair algebra directly."""
    from iot_sensor_log_data_pipeline_spark.operators.sketch import (
        hll_estimate,
        hll_overlap_from_registers,
    )

    store = str(tmp_path / "hll_store")
    schema = "src string, key string"
    b0 = spark.createDataFrame(
        [("a", f"k{i}") for i in range(500)]
        + [("b", f"k{i}") for i in range(250, 750)],
        schema,
    )
    b1 = spark.createDataFrame(
        [("a", f"k{i}") for i in range(400, 600)]  # 100 new for a
        + [("c", f"z{i}") for i in range(500)],
        schema,
    )
    P.hll_apply_batch(b0, 0, store, key_col="key", group_col="src")
    P.hll_apply_batch(b0, 0, store, key_col="key", group_col="src")  # replay
    P.hll_apply_batch(b1, 1, store, key_col="key", group_col="src")

    def ests():
        regs = P.load_hll_store(spark, store, group_col="src")
        return {
            r["src"]: r["est_distinct"]
            for r in hll_estimate(regs, group_cols=("src",)).collect()
        }

    est = ests()
    true = {"a": 600, "b": 500, "c": 500}
    for g, t in true.items():
        assert abs(est[g] - t) / t < 0.2, (g, est[g], t)

    # overlap algebra straight off the persisted store: a and b share
    # 250..599 (350 keys); c is disjoint from both
    regs = P.load_hll_store(spark, store, group_col="src")
    ov = {
        (r["src_a"], r["src_b"]): r
        for r in hll_overlap_from_registers(regs, "src").collect()
    }
    assert ov[("a", "b")]["est_jaccard"] > ov[("a", "c")]["est_jaccard"]
    assert ov[("a", "c")]["est_jaccard"] < 0.1

    P.optimize_hll_store(spark, store, group_col="src")
    dirs = sorted(d for d in os.listdir(store) if d.startswith("batch="))
    assert dirs == ["batch=-1"]
    assert ests() == est


def test_hll_sink_end_to_end_stream(spark, tmp_path):
    """Drive start_hll_sink with a real file-source stream; the merged
    grouped estimates see every ingested key."""
    from iot_sensor_log_data_pipeline_spark.operators.sketch import hll_estimate

    store = str(tmp_path / "hll_store")
    src = str(tmp_path / "hll_src")
    ckpt = str(tmp_path / "hll_ckpt")
    rows = [("s%d" % (i % 2), "u%d" % (i % 40)) for i in range(200)]
    spark.createDataFrame(rows, "src string, key string").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("src string, key string").parquet(src)
    q = P.start_hll_sink(stream, store, ckpt, key_col="key", group_col="src")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    regs = P.load_hll_store(spark, store, group_col="src")
    est = {
        r["src"]: r["est_distinct"]
        for r in hll_estimate(regs, group_cols=("src",)).collect()
    }
    # each source saw 20 distinct users
    assert abs(est["s0"] - 20) / 20 < 0.25 and abs(est["s1"] - 20) / 20 < 0.25


def test_ks_monitor_flags_shifted_batch(spark, tmp_path):
    """Streaming KS monitor: an in-distribution batch logs a small
    statistic, a shifted batch a large one; replaying a batch id
    overwrites its own row (idempotent layout); the drift log exposes
    batch_id as a partition column."""
    out = str(tmp_path / "ks_log")
    reference = spark.createDataFrame(
        [(i / 1000.0,) for i in range(1000)], "v double"
    )
    ok_batch = spark.createDataFrame(
        [((i + 0.5) / 1000.0,) for i in range(1000)], "v double"
    )
    bad_batch = spark.createDataFrame(
        [(0.6 + i / 2500.0,) for i in range(1000)], "v double"
    )
    P.ks_score_batch(ok_batch, 0, reference, "v", out)
    P.ks_score_batch(ok_batch, 0, reference, "v", out)  # replay
    P.ks_score_batch(bad_batch, 1, reference, "v", out)
    log = {
        r["batch_id"]: r
        for r in spark.read.option("basePath", out).parquet(out).collect()
    }
    assert set(log) == {0, 1}
    assert log[0]["ks_stat"] < 0.1
    assert log[1]["ks_stat"] > 0.5
    assert log[1]["n_rows"] == 1000


def test_ks_monitor_end_to_end_stream(spark, tmp_path):
    """Drive start_ks_monitor with a real file-source stream."""
    out = str(tmp_path / "ks_log")
    src = str(tmp_path / "ks_src")
    ckpt = str(tmp_path / "ks_ckpt")
    reference = spark.createDataFrame(
        [(i / 500.0,) for i in range(500)], "v double"
    )
    spark.createDataFrame(
        [(2.0 + i / 500.0,) for i in range(500)], "v double"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("v double").parquet(src)
    q = P.start_ks_monitor(stream, reference, "v", out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.option("basePath", out).parquet(out).collect()
    assert rows and rows[0]["ks_stat"] > 0.9  # fully disjoint ranges


def test_cms_stores_price_a_join_without_scanning(spark, tmp_path):
    """The join between two LIVE ingested tables is priced from their
    maintained CMS stores alone: inner product over the merged cells
    upper-bounds (here: equals, no collisions) the exact join size."""
    from iot_sensor_log_data_pipeline_spark.operators.sketch import (
        cms_inner_product,
    )

    sa, sb = str(tmp_path / "cms_a"), str(tmp_path / "cms_b")
    a0 = spark.createDataFrame([("u1",)] * 4 + [("u2",)] * 2, "key string")
    a1 = spark.createDataFrame([("u1",)] * 1 + [("u3",)] * 5, "key string")
    b0 = spark.createDataFrame([("u1",)] * 3 + [("u2",)] * 7, "key string")
    P.cms_apply_batch(a0, 0, sa)
    P.cms_apply_batch(a1, 1, sa)
    P.cms_apply_batch(b0, 0, sb)
    est = cms_inner_product(
        P.load_cms_store(spark, sa), P.load_cms_store(spark, sb)
    ).collect()[0]["est_pairs"]
    # exact: u1 -> 5*3, u2 -> 2*7, u3 unmatched
    assert est == 5 * 3 + 2 * 7


def test_rag_write_path_streams_end_to_end(spark, tmp_path):
    """The full RAG write path as a stream: a documents file-stream is
    chunked, hash-embedded, and ingested into a persisted LSH index;
    a probe with a streamed document's own embedding finds that
    document's chunk at rank 1 the batch after it arrived."""
    from iot_sensor_log_data_pipeline_spark.operators import ann_index as AI
    from iot_sensor_log_data_pipeline_spark.operators import similarity as SIM
    from iot_sensor_log_data_pipeline_spark.operators.text import hash_embedding

    root = str(tmp_path / "rag_idx")
    src = str(tmp_path / "rag_src")
    ckpt = str(tmp_path / "rag_ckpt")

    # static bootstrap corpus -> initial index (chunk ids in doc*1e6 space)
    base_docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta " * 10), (2, "one two three four " * 10)],
        "doc_id long, text string",
    )
    base_vecs = hash_embedding(
        base_docs.selectExpr("doc_id * 1000000 AS vec_id", "text AS chunk_text"),
        dim=64, id_col="vec_id", text_col="chunk_text",
    )
    AI.build_lsh_index(
        base_vecs, root, bands=16, rows_per_band=4,
        planes=SIM.hash_hyperplanes(64, dim=64),
        id_col="vec_id", vec_col="embedding",
    )

    streamed_text = "zebra quark lumen vortex " * 10
    spark.createDataFrame(
        [(7, streamed_text)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = P.start_chunk_embed_ingest_sink(stream, root, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # probe with the streamed doc's own full-text embedding
    probe = hash_embedding(
        spark.createDataFrame(
            [(0, streamed_text)], "doc_id long, text string"
        ).selectExpr("doc_id AS vec_id", "text AS chunk_text"),
        dim=64, id_col="vec_id", text_col="chunk_text",
    )
    hits = AI.query_lsh_index(spark, root, probe, k=3).collect()
    assert hits, "no hits from the persisted index"
    top = [r for r in hits if r["rank"] == 1][0]
    assert top["neighbor_id"] // 1_000_000 == 7  # the streamed doc's chunk


def test_chunk_vec_ids_guards_overflow(spark):
    """The chunk-key projection asserts chunk_id < 10^6 instead of
    silently folding an overflowing document into the next doc's
    vec_id space (which would corrupt retrieval AND tombstone
    takedowns for the collided doc)."""
    import pytest as _pytest

    ok = spark.createDataFrame(
        [(3, 999_999, "tail chunk"), (3, 0, "head chunk")],
        "doc_id long, chunk_id long, chunk_text string",
    )
    got = {r["vec_id"] for r in P.chunk_vec_ids(ok).collect()}
    assert got == {3_000_000, 3_999_999}

    bad = spark.createDataFrame(
        [(3, 1_000_000, "overflow chunk")],
        "doc_id long, chunk_id long, chunk_text string",
    )
    with _pytest.raises(Exception) as exc:
        P.chunk_vec_ids(bad).collect()
    assert "chunk_id overflow for doc_id=3" in str(exc.value)


def test_lateness_monitor_measures_event_time_lag(spark, tmp_path):
    """Planted lateness: 90% of a batch is at the frontier, 10% trails
    by 100 s -- p50 reads 0, p95/p99/max read the tail; replaying a
    batch id overwrites its own row."""
    import datetime as dt

    out = str(tmp_path / "late_log")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(base,)] * 90 + [(base - dt.timedelta(seconds=100),)] * 10
    batch = spark.createDataFrame(rows, "ts timestamp")
    P.lateness_score_batch(batch, 0, "ts", out)
    P.lateness_score_batch(batch, 0, "ts", out)  # replay
    log = spark.read.option("basePath", out).parquet(out).collect()
    assert len(log) == 1
    r = log[0]
    assert r["n_rows"] == 100
    assert r["p50_s"] == 0.0
    assert r["p95_s"] == 100.0 and r["max_s"] == 100.0

    # a non-empty batch whose ts values are ALL NULL has no event-time
    # frontier: it must be skipped (no row, no TypeError inside
    # foreachBatch), exactly like an empty batch
    null_batch = spark.createDataFrame([(None,)] * 5, "ts timestamp")
    P.lateness_score_batch(null_batch, 1, "ts", out)
    log = spark.read.option("basePath", out).parquet(out).collect()
    assert len(log) == 1  # still only batch 0's row


def test_lateness_monitor_end_to_end_stream(spark, tmp_path):
    """Drive start_lateness_monitor with a real file-source stream."""
    import datetime as dt

    out = str(tmp_path / "late_log")
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [(base - dt.timedelta(seconds=i % 30),) for i in range(300)],
        "ts timestamp",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp").parquet(src)
    q = P.start_lateness_monitor(stream, "ts", out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.option("basePath", out).parquet(out).collect()
    assert rows and rows[0]["max_s"] == 29.0


def test_text_index_ingest_stream_end_to_end(spark, tmp_path):
    """Streaming BM25 index maintenance: a document streamed into a
    persisted text index is searchable the batch after it arrives
    with live N/avgdl; a replayed batch changes nothing (idempotent
    segments); optimize folds the segment tree and preserves results;
    a tombstoned streamed doc stays masked through the physical pass."""
    from iot_sensor_log_data_pipeline_spark.operators import text_index as TI

    root = str(tmp_path / "tidx_stream")
    base = spark.createDataFrame(
        [(1, "spark engine spark catalyst"), (2, "unrelated words entirely")],
        "doc_id long, text string",
    )
    TI.build_text_index(base, root)

    src = str(tmp_path / "tidx_src")
    spark.createDataFrame(
        [(7, "spark spark spark streaming arrival")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = P.start_text_index_ingest_sink(stream, root, str(tmp_path / "tidx_ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    hits = TI.query_text_index(spark, root, ("spark",), k=5).collect()
    assert {r["doc_id"] for r in hits} == {1, 7}
    top = max(hits, key=lambda r: r["bm25"])
    assert top["doc_id"] == 7  # tf 3 beats tf 2 at similar length
    rows_before = sorted(tuple(r) for r in hits)

    # replayed batch (same id, same data) rewrites its own segment --
    # scores identical, no duplicate postings
    replay = spark.createDataFrame(
        [(7, "spark spark spark streaming arrival")],
        "doc_id long, text string",
    )
    TI.text_ingest_apply_batch(replay, 0, root)
    assert sorted(
        tuple(r) for r in TI.query_text_index(spark, root, ("spark",), k=5).collect()
    ) == rows_before

    TI.optimize_text_stream_segments(spark, root)
    assert sorted(
        tuple(r) for r in TI.query_text_index(spark, root, ("spark",), k=5).collect()
    ) == rows_before

    # takedown of the STREAMED doc: masked at once, physically retired,
    # still masked if its batch replays after the rewrite
    TI.delete_from_text_index(
        spark.createDataFrame([(7,)], "doc_id long"), root
    )
    assert {r["doc_id"] for r in
            TI.query_text_index(spark, root, ("spark",), k=5).collect()} == {1}
    TI.apply_text_deletes(spark, root)
    TI.text_ingest_apply_batch(replay, 0, root)  # crash-window replay
    assert {r["doc_id"] for r in
            TI.query_text_index(spark, root, ("spark",), k=5).collect()} == {1}


def test_winnowing_ingest_stream_end_to_end(spark, tmp_path):
    """Streaming winnowing-index maintenance: a streamed document
    matches probes the batch after it arrives; replay is idempotent
    (same keep/skip decision, no duplicate postings); the df cap
    holds across stream segments; segment fold preserves matches."""
    from iot_sensor_log_data_pipeline_spark.operators import dedup as DD

    root = str(tmp_path / "widx_stream")
    shared = "the quick brown fox jumps over the lazy dog again and again"
    base = spark.createDataFrame(
        [(1, shared), (2, "completely different content with no shared runs at all")],
        "doc_id long, text string",
    )
    DD.build_winnowing_index(base, root, k=4, w=4)

    src = str(tmp_path / "widx_src")
    spark.createDataFrame(
        [(9, shared)], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = P.start_winnowing_ingest_sink(stream, root, str(tmp_path / "widx_ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    probe = spark.createDataFrame([(99, shared)], "doc_id long, text string")

    def matched():
        postings, k, w = DD.load_winnowing_index(spark, root)
        pf = DD.winnowing_fingerprints(probe, k, w).select("fp")
        return sorted(
            tuple(r) for r in postings.join(pf, "fp").collect()
        )

    first = matched()
    assert {t[1] for t in first} >= {1, 9}  # streamed doc matches now

    # replay: same batch id recomputes the same decision and rewrites
    # its own directory -- posting multiset unchanged
    DD.winnowing_ingest_apply_batch(
        spark.createDataFrame([(9, shared)], "doc_id long, text string"), 0, root
    )
    assert matched() == first

    DD.optimize_winnowing_stream_segments(spark, root)
    assert matched() == first


def test_graph_ingest_stream_end_to_end(spark, tmp_path):
    """Streaming graph-index maintenance (search-then-link): a vector
    streamed into a persisted k-NN graph is beam-findable at rank 1
    for its own embedding the batch after it arrives (reverse edges
    make it reachable from unchanged entry points); a replayed batch
    is idempotent; optimize absorbs the segments (trees gone) and the
    streamed node stays findable."""
    import os as _os

    from iot_sensor_log_data_pipeline_spark.io_utils import load
    from iot_sensor_log_data_pipeline_spark.operators import graph_ann as GA

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 10 AND vec_id < 60")
    streamed = emb.where("vec_id >= 60 AND vec_id < 64")
    root = str(tmp_path / "gidx_stream")
    GA.build_graph_index(corpus, root, k=6, n_entry=8)

    src = str(tmp_path / "gidx_src")
    streamed.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(streamed.schema).parquet(src)
    q = P.start_graph_ingest_sink(stream, root, str(tmp_path / "gidx_ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    probe = emb.where("vec_id = 61").selectExpr(
        "vec_id + 1000 AS vec_id", "embedding"
    )  # same vector, new id, so self-exclusion doesn't hide it
    hits = GA.query_graph_index(spark, root, probe, k=5).collect()
    top = [r for r in hits if r["rank"] == 1][0]
    assert top["neighbor_id"] == 61  # the streamed vector, at rank 1
    rows_before = sorted(tuple(r) for r in hits)

    # replay: identical segment rewrite, identical probe results
    GA.graph_ingest_apply_batch(streamed, 0, root)
    assert sorted(
        tuple(r) for r in GA.query_graph_index(spark, root, probe, k=5).collect()
    ) == rows_before

    # absorption: segments fold into the main tables, trees removed,
    # the streamed node survives refinement and stays rank 1
    GA.optimize_graph_index(spark, root)
    assert not _os.path.exists(_os.path.join(root, "graph_stream"))
    assert not _os.path.exists(_os.path.join(root, "vectors_stream"))
    after = GA.query_graph_index(spark, root, probe, k=5).collect()
    assert [r for r in after if r["rank"] == 1][0]["neighbor_id"] == 61
    vec_ids = {
        r["id"] for r in spark.read.parquet(_os.path.join(root, "vectors")).collect()
    }
    assert {60, 61, 62, 63} <= vec_ids
