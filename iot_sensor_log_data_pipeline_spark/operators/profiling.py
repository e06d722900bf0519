"""Data profiling: per-column statistics in ONE pass over the table
(the training-data-pipeline health check: row counts, null rates,
distinct cardinalities, ranges).

All columns' aggregates run in a single HashAggregate (no per-column
jobs like ``DataFrame.describe``'s), then unpivot to one row per
column -- at 100 TB that is exactly one table scan.  Exact distinct
counts are an expand+aggregate; ``approx=True`` swaps in HLL++ for the
mergeable-sketch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """One-pass per-column profile: (column, n_rows, n_nulls,
    n_distinct, min_repr, max_repr) -- min/max rendered as strings so
    heterogeneous column types share one output schema."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(F.col(c))
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            distinct.alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)

    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_repr"),
                F.col(f"__max_{c}").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
