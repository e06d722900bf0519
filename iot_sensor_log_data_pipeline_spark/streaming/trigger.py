"""Count-based trigger: the one genuinely non-built-in piece of
reference control flow (SURVEY.md §4: Structured Streaming has only
time-based triggers; the reference fires compaction after exactly 100
input files via a DynamoDB counter, ``sensor-log-compactor.py:38-70``).

Implementation: a ``foreachBatch`` gate.  Each micro-batch lands files
via the normal file sink; the gate then counts accumulated files and,
at the threshold, runs the synchronous compaction job.  Idempotency
across restarts comes from two sides: the streaming checkpoint replays
at-most the last unacknowledged batch, and the compactor's file-listing
IS its counter state (a replayed batch sees the already-cleaned
directory and simply doesn't re-fire) -- no separate counter row to
reset (Table A18) and no way for counter and directory to disagree.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..operators.compaction import CompactionResult, run_compaction_cycle


@dataclass
class CountTriggeredCompactor:
    """``foreachBatch`` body: land the batch as JSON files, then run the
    count-gated compaction cycle (Table A12/A13/A19)."""

    logs_dir: str
    dest_base: str
    threshold: int = 100
    columns: list[str] | None = None
    mode: str = "parity"
    results: list[CompactionResult] = field(default_factory=list)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Land this micro-batch (one Firehose flush, Table A10): one
        # file per partition under logs/.  mode=overwrite on the
        # per-batch directory makes checkpoint replays idempotent --
        # a re-delivered batch_id rewrites the same directory instead
        # of appending duplicates (exactly-once to this sink).
        (
            batch_df.write.mode("overwrite").json(
                os.path.join(self.logs_dir, f"batch_{batch_id}")
            )
        )
        result = run_compaction_cycle(
            spark,
            self.logs_dir,
            self.dest_base,
            threshold=self.threshold,
            columns=self.columns,
            mode=self.mode,
        )
        if result is not None:
            self.results.append(result)


def attach(stream_df: DataFrame, compactor: CountTriggeredCompactor, checkpoint: str):
    """Wire the gate into a streaming query."""
    return (
        stream_df.writeStream.foreachBatch(compactor)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
