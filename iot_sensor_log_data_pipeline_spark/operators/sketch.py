"""Count-Min sketch over a distributed corpus, expressed as DataFrame
aggregation (Cormode & Muthukrishnan 2005) -- the mergeable frequency
sketch for heavy-hitter queries when exact per-key counts don't fit.

Spark-first shape: the sketch IS a DataFrame of ((row, bucket), count)
cells -- built with ONE exact pre-aggregation per key (map-side
combine does the heavy lifting) followed by one (d x distinct-keys)
explode and a second keyed aggregation into d*w cells.  Sketches built
this way merge for free (union + re-aggregate), exactly the property
that makes CMS useful across partitions/days/shards at 100 TB.

Hashing is md5-salted per row (content-derived, engine-portable), so
the DuckDB oracle replays the whole sketch bit-for-bit -- same
discipline as the MinHash pipeline (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default geometry: 4 rows x 1024 buckets => overestimate bound
#: ~ 2N/w per row with failure probability ~ (1/2)^d on the min.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-``row``'s bucket for ``key``: md5 of the row-salted key,
    first 8 hex chars as an integer, mod width."""
    salted = F.concat_ws("#", key, F.lit(str(row)))
    return (
        F.conv(F.substring(F.md5(salted.cast("binary")), 1, 8), 16, 10).cast("long")
        % width
    )


def cms_build(
    keyed_counts: DataFrame,
    key_col: str = "key",
    count_col: str = "n",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, cell_count) cells from exact per-key counts.

    Feed this PRE-AGGREGATED (key, count) pairs, not raw occurrences:
    the exact pre-aggregation is one map-side-combined shuffle on the
    key, after which the sketch explode touches one row per DISTINCT
    key -- the construction stays linear in distinct keys, not corpus
    positions."""
    cells = keyed_counts.select(
        F.col(count_col).alias("_n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    )
    return (
        cells.groupBy(
            F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.sum("_n").alias("cell_count"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query estimates: for each probe key, min over the sketch's
    d cells it hashes into (CMS guarantees estimate >= true count).
    The sketch (d*w cells, KBs) broadcasts onto the probes."""
    probe_cells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cell_count").alias("est_count"))
    )
