"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2 Table B "stateful counter/trigger";
``pyspark_guide.md`` Stateful pattern).

The reference keeps one mutable counter in DynamoDB (``{ID: "Counter",
TotalCount: N}``, ``sensor-log-compactor.py:40-51``) incremented per
event and reset at a threshold (A12/A13/A18).  This module is that
state machine as a first-class streaming operator: per-key state lives
in the streaming state store (checkpointed, exactly-once), emits one
row per threshold crossing, and needs no external database.

Scale: state is one struct per device key, partitioned by key across
executors -- millions of devices = millions of tiny state rows, the
shape the state store is built for.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: state: running total per key (the DynamoDB item analogue).
STATE_SCHEMA = T.StructType([T.StructField("total_count", T.LongType())])

#: output: one row per fired threshold crossing.
FIRE_SCHEMA = T.StructType(
    [
        T.StructField("client_id", T.StringType()),
        T.StructField("fired_at_count", T.LongType()),
        T.StructField("batch_rows", T.LongType()),
    ]
)


def make_count_trigger(threshold: int = 100):
    """Build the per-group state function: accumulate arriving row
    counts; each time the running total crosses a multiple of
    ``threshold``, emit a fire row and (like the reference's A18 reset)
    fold the total back modulo the threshold."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (client_id,) = key
        total = state.get[0] if state.exists else 0
        batch_rows = 0
        fires: list[dict] = []
        for pdf in pdfs:
            batch_rows += len(pdf)
        total += batch_rows
        while total >= threshold:  # A13 predicate + A18 reset, atomically
            fires.append(
                {
                    "client_id": client_id,
                    "fired_at_count": threshold,
                    "batch_rows": batch_rows,
                }
            )
            total -= threshold
        state.update((total,))
        if fires:
            yield pd.DataFrame(fires, columns=list(FIRE_SCHEMA.fieldNames()))

    return fn


def count_trigger_stream(
    sensor: DataFrame, threshold: int = 100, ts_col: str = "timestamp"
) -> DataFrame:
    """Wire the stateful counter over a sensor stream, keyed by device."""
    return (
        sensor.withWatermark(ts_col, "10 minutes")
        .groupBy("client_id")
        .applyInPandasWithState(
            make_count_trigger(threshold),
            outputStructType=FIRE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually run: its
    state-server protocol needs the ``protobuf`` package, which the
    PySpark distribution does not vendor (a missing protobuf crashes
    the streaming query at runtime, not at plan time -- hence this
    explicit gate)."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except ImportError:
        return False


def count_trigger_stream_tws(
    sensor: DataFrame, threshold: int = 100, ts_col: str = "timestamp"
) -> DataFrame:
    """The same A12/A13/A18 counter state machine on Spark 4's
    ``transformWithStateInPandas`` (StatefulProcessor) API -- the
    successor to ``applyInPandasWithState``: named state variables via
    a handle, explicit init/close lifecycle, and per-state TTL support.
    Kept alongside the classic implementation so both stateful APIs
    stay covered; availability-gated on the protobuf dependency."""
    if not tws_available():
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs the protobuf package, which "
            "this environment does not ship; use count_trigger_stream "
            "(applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class CountTriggerProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "total_count BIGINT")

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            (client_id,) = key
            total = self._total.get()[0] if self._total.exists() else 0
            batch_rows = sum(len(pdf) for pdf in rows)
            total += batch_rows
            fires: list[dict] = []
            while total >= threshold:
                fires.append(
                    {
                        "client_id": client_id,
                        "fired_at_count": threshold,
                        "batch_rows": batch_rows,
                    }
                )
                total -= threshold
            self._total.update((total,))
            if fires:
                yield pd.DataFrame(fires, columns=list(FIRE_SCHEMA.fieldNames()))

        def close(self) -> None:
            pass

    return (
        sensor.withWatermark(ts_col, "10 minutes")
        .groupBy("client_id")
        .transformWithStateInPandas(
            statefulProcessor=CountTriggerProcessor(),
            outputStructType=FIRE_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


#: Sessionizer output: one row per CLOSED session.
SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

#: Sessionizer state: the one open session per user (epoch micros --
#: integer state avoids tz/unit ambiguity across the Arrow boundary).
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _epoch_us(ts: pd.Series) -> list[int]:
    idx = pd.DatetimeIndex(ts)
    if idx.tz is not None:
        idx = idx.tz_convert("UTC").tz_localize(None)
    # Python ints, not numpy int64: state round-trips through JSON.
    return [int(x) for x in idx.as_unit("us").asi8]


def make_sessionizer(gap_seconds: int = 1800):
    """Per-user session windows with inactivity-gap timeout -- the
    streaming twin of the batch lag+cumsum sessionization
    (``plans/relational_queries.sessionize_events``).

    Sessions close two ways: (a) arrival-driven -- a new event for the
    user more than ``gap_seconds`` after the last one closes the open
    session in the same micro-batch; (b) watermark-driven -- event-time
    timeout fires once the watermark passes last_event + gap, so users
    who simply stop sending still emit their final session (the case a
    batch job only handles by rerunning)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n = state.get
                closed.append((s, last, n))
            state.remove()
        else:
            stamps: list[int] = []
            for pdf in pdfs:
                stamps.extend(_epoch_us(pdf["ts"]))
            stamps.sort()
            if state.exists:
                s, last, n = state.get
            else:
                s, last, n = None, None, 0
            for t in stamps:
                if s is not None and t - last > gap_us:
                    closed.append((s, last, n))
                    s = None
                if s is None:
                    s, n = t, 0
                n += 1
                last = t
            if last is not None:
                state.update((s, last, n))
                # Event-time timeout at last+gap; must stay ahead of
                # the current watermark or the state store rejects it.
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(last // 1000 + gap_seconds * 1000, wm_ms + 1)
                )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization keyed by user: state is one open-session
    struct per user (millions of users = millions of tiny state rows,
    partitioned by key -- the state store's native shape)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


#: CUSUM monitor state: the two running sums per key.
CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s_hi", T.DoubleType()),
        T.StructField("s_lo", T.DoubleType()),
    ]
)

#: CUSUM monitor output: one row per ALARM (append-mode semantics --
#: quiet keys emit nothing).
CUSUM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("alarm_ts", T.TimestampType()),
        T.StructField("s_hi", T.DoubleType()),
        T.StructField("s_lo", T.DoubleType()),
        T.StructField("side", T.StringType()),
    ]
)


def make_cusum_monitor(k: float = 0.5, h: float = 4.0):
    """Per-key streaming CUSUM fold (the stateful twin of
    ``operators/timeseries.cusum_alarms``): carries (s_hi, s_lo)
    across micro-batches in the state store, folds each batch's
    pre-standardized ``z`` values in event-time order, emits one row
    per alarm, resets after it.  A shift too slow to fire inside any
    single micro-batch still fires once its drift accumulates -- the
    exact failure mode per-batch (stateless) monitoring has."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (dev,) = key
        rows: list[tuple[int, float]] = []
        for pdf in pdfs:
            rows.extend(zip(_epoch_us(pdf["ts"]), pdf["z"].astype(float)))
        rows.sort()
        s_hi, s_lo = state.get if state.exists else (0.0, 0.0)
        alarms: list[tuple[int, float, float, str]] = []
        for t, z in rows:
            s_hi = max(0.0, s_hi + z - k)
            s_lo = min(0.0, s_lo + z + k)
            if s_hi > h or s_lo < -h:
                alarms.append(
                    (t, round(s_hi, 6), round(s_lo, 6),
                     "high" if s_hi > h else "low")
                )
                s_hi, s_lo = 0.0, 0.0
        state.update((float(s_hi), float(s_lo)))
        if alarms:
            yield pd.DataFrame(
                {
                    "key": [dev] * len(alarms),
                    "alarm_ts": pd.to_datetime([a[0] for a in alarms], unit="us"),
                    "s_hi": [a[1] for a in alarms],
                    "s_lo": [a[2] for a in alarms],
                    "side": [a[3] for a in alarms],
                }
            )

    return fn


def cusum_monitor_stream(
    events: DataFrame,
    baseline: DataFrame,
    key_col: str = "client_id",
    ts_col: str = "ts",
    value_col: str = "value",
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """Streaming CUSUM drift monitor: standardize each arriving value
    against a FIXED per-key ``baseline`` (key, mu, sd -- trained
    offline on a known-good period, exactly the held-out-baseline
    practice the batch operator's docstring prescribes; a tiny
    broadcast join), then fold per key with persistent (s_hi, s_lo)
    state.  Emits only alarms.  Within a micro-batch values fold in
    event-time order; across batches in arrival order -- the only
    order a stream has.  State is two doubles per key -- millions of
    devices = millions of tiny state rows, the state store's native
    shape; no watermark needed (nothing is time-windowed; state never
    grows past one row per key)."""
    from pyspark.sql import functions as F

    z = F.when(
        F.col("__sd").isNull() | (F.col("__sd") == 0.0), F.lit(0.0)
    ).otherwise(
        F.round((F.col(value_col).cast("double") - F.col("__mu")) / F.col("__sd"), 6)
    )
    scored = events.join(
        F.broadcast(
            baseline.select(
                F.col(key_col), F.col("mu").alias("__mu"), F.col("sd").alias("__sd")
            )
        ),
        key_col,
    ).select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"), z.alias("z"))
    return scored.groupBy("key").applyInPandasWithState(
        make_cusum_monitor(k=k, h=h),
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_monitor_stream_tws(
    scored: DataFrame,
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """The CUSUM drift monitor on Spark 4's
    ``transformWithStateInPandas`` (StatefulProcessor) API -- same
    semantics as ``cusum_monitor_stream``'s fold (which see), kept so
    BOTH stateful APIs stay covered, like the counter twin above.
    Input contract: ``scored`` already carries (key, ts, z) -- the
    baseline standardization join happens upstream exactly as in the
    classic form.  Availability-gated on the protobuf dependency."""
    if not tws_available():
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs the protobuf package, which "
            "this environment does not ship; use cusum_monitor_stream "
            "(applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class CusumProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sums = handle.getValueState("sums", "s_hi DOUBLE, s_lo DOUBLE")

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            (dev,) = key
            pts: list[tuple[int, float]] = []
            for pdf in rows:
                pts.extend(zip(_epoch_us(pdf["ts"]), pdf["z"].astype(float)))
            pts.sort()
            s_hi, s_lo = self._sums.get() if self._sums.exists() else (0.0, 0.0)
            alarms: list[dict] = []
            for t, z in pts:
                s_hi = max(0.0, s_hi + z - k)
                s_lo = min(0.0, s_lo + z + k)
                if s_hi > h or s_lo < -h:
                    alarms.append(
                        {
                            "key": dev,
                            "alarm_ts": pd.Timestamp(t, unit="us"),
                            "s_hi": round(s_hi, 6),
                            "s_lo": round(s_lo, 6),
                            "side": "high" if s_hi > h else "low",
                        }
                    )
                    s_hi, s_lo = 0.0, 0.0
            self._sums.update((float(s_hi), float(s_lo)))
            if alarms:
                yield pd.DataFrame(
                    alarms, columns=list(CUSUM_OUT_SCHEMA.fieldNames())
                )

        def close(self) -> None:
            pass

    return scored.groupBy("key").transformWithStateInPandas(
        statefulProcessor=CusumProcessor(),
        outputStructType=CUSUM_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
