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
