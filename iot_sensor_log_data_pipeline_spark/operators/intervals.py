"""Interval overlap join -- the bucketed scale path for the classic
"find all overlapping time ranges" join.

The naive plan is a theta join (``a.start <= b.end AND b.start <=
a.end``), which Spark executes as a broadcast-nested-loop / cartesian
product: O(|A| * |B|) comparisons regardless of how sparse the overlaps
are.  The standard fix (used by every temporal-join engine) is to
discretize time into fixed buckets, explode each interval to the
buckets it spans, and equi-join on the bucket id -- the shuffle then
moves only same-bucket rows, and the quadratic blow-up is confined to
intervals that genuinely share a bucket.

Duplicate elimination is arithmetic, not a shuffle: a pair overlapping
across several shared buckets is emitted only from the bucket
containing ``greatest(a.start, b.start)`` (the first bucket where both
are live), so no ``distinct`` pass is needed on the (potentially large)
pair output.

Bucket sizing is the caller's lever: cost per row is
O(interval_length / bucket) explode fan-out, so pick the bucket near
the TYPICAL interval length.  Long-tail intervals (one giant interval
spanning the corpus) are the known weakness of the fixed-grid scheme --
split those upstream or raise the bucket.

The plan is STATELESS (per-row bucket explode + equi-join + arithmetic
exactly-once rule), so it also composes as a stream-static join in
append mode with no watermark state: pass a streaming DataFrame as
``left`` and a static interval table as ``right`` for an ingest-time
"does this arriving interval clash with a reservation / maintenance
window?" gate (tested in ``tests/test_streaming.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All (left, right) row pairs whose CLOSED timestamp intervals
    ``[l_start, l_end]`` and ``[r_start, r_end]`` overlap (touching
    endpoints count).  Column names of the two sides must be disjoint
    -- this operator joins arbitrary payload columns through, so a
    collision would silently shadow one side.

    Plan shape: explode both sides to spanned epoch buckets (fan-out =
    interval length / bucket + 1 per row), equi-join on the bucket id,
    verify the exact overlap predicate, and keep a pair only in the
    bucket of ``greatest(l_start, r_start)`` so multi-bucket overlaps
    emit exactly once without a distinct.
    """
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(
            f"left/right column names must be disjoint, both have: {sorted(clash)}"
        )
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")

    w = F.lit(int(bucket_seconds))

    def bucket_of(col: str):
        return F.floor(F.col(col).cast("long") / w).cast("long")

    lb = left.withColumn(
        "__ivl_bkt",
        F.explode(F.sequence(bucket_of(l_start), bucket_of(l_end))),
    )
    rb = right.withColumn(
        "__ivl_bkt",
        F.explode(F.sequence(bucket_of(r_start), bucket_of(r_end))),
    )
    first_shared = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)).cast("long") / w
    ).cast("long")
    return (
        lb.join(rb, "__ivl_bkt")
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__ivl_bkt") == first_shared)
        )
        .drop("__ivl_bkt")
    )
