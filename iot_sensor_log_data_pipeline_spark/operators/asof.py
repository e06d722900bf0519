"""As-of join: for each left row, the most recent right row at or
before it (per key).  SURVEY.md §2 Table B ("as-of (nearest prior)").

Spark has no native ASOF JOIN (DuckDB/Pandas do), so this implements
the union+window formulation:

    union(left tagged, right tagged)
      -> window per key ordered by (ts, side)        [rights first]
      -> last(right_col, ignorenulls) over rows unbounded-preceding..current
      -> keep left rows

Why this beats the alternatives at 100 TB:
- One shuffle on the join key + one in-partition sort -- identical cost
  shape to the sort-merge join Spark would run for an equi-join.
- No range-bucketing guesswork, no ``applyInPandas`` (which would move
  every byte through Arrow into Python).
- Skewed keys behave exactly like a skewed sort-merge join and are
  handled by AQE the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_cols: dict[str, str],
    *,
    strict: bool = False,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join.

    Parameters
    ----------
    by : equality key columns (present in both sides).
    left_on / right_on : event-time columns.
    right_cols : mapping {right column -> output alias} to carry over.
    strict : if True match strictly-before (``<``); default at-or-before
        (``<=``, DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).
    tolerance_seconds : if set, matches older than this are nulled out.
    """
    # Tag: right rows sort before left rows at equal ts for `<=`
    # semantics, after for strict `<`.
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    left_payload = [c for c in left.columns if c not in by and c != left_on]
    r_src = list(right_cols)

    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("__ts"),
        F.lit(left_tag).alias("__side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in r_src],
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__ts"),
        F.lit(right_tag).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in r_src],
    )

    # Final tiebreak on the carried right columns: when several right
    # rows share key AND timestamp, ``last()`` must not depend on
    # partition-internal order -- with the tiebreak the greatest carried
    # tuple wins deterministically (left rows carry nulls there, which
    # sort first and never reorder relative to rights).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__side"), *[F.col(f"__r_{c}") for c in r_src])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    unioned = l_tagged.unionByName(r_tagged)
    matched = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in r_src
        ],
        F.last(
            F.when(F.col("__side") == right_tag, F.col("__ts")), ignorenulls=True
        )
        .over(w)
        .alias("__m_ts"),
    ).where(F.col("__side") == F.lit(left_tag))

    def _gate(col: Column) -> Column:
        if tolerance_seconds is None:
            return col
        in_tol = (
            F.col("__ts").cast("long") - F.col("__m_ts").cast("long")
        ) <= F.lit(tolerance_seconds)
        return F.when(in_tol, col)

    out_cols = (
        [F.col(c) for c in by]
        + [F.col("__ts").alias(left_on)]
        + [F.col(c) for c in left_payload]
        + [_gate(F.col(f"__m_{c}")).alias(alias) for c, alias in right_cols.items()]
        + [_gate(F.col("__m_ts")).alias(f"matched_{right_on}")]
    )
    return matched.select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_cols: dict[str, str],
    *,
    strict: bool = False,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row
    at-or-after it per key (``strict=True``: strictly after) -- the
    'next event' direction (next click after a purchase, next
    heartbeat after a restart).  Same union+window formulation and
    cost shape as the backward join, with the frame reversed:
    ``first(ignorenulls)`` over current-row..unbounded-following.
    Ties on (key, ts) among right rows break by the carried tuple
    (smallest wins) -- deterministic under any partitioning.
    ``tolerance_seconds`` nulls out matches farther ahead than the
    horizon."""
    # Inclusive: rights at equal ts must be IN a left row's following
    # frame -> lefts sort first.  Strict: rights at equal ts sort
    # before the left row and fall outside its frame.
    left_tag, right_tag = (0, 1) if not strict else (1, 0)

    left_payload = [c for c in left.columns if c not in by and c != left_on]
    r_src = list(right_cols)

    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("__ts"),
        F.lit(left_tag).alias("__side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in r_src],
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__ts"),
        F.lit(right_tag).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in r_src],
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__side"), *[F.col(f"__r_{c}") for c in r_src])
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    unioned = l_tagged.unionByName(r_tagged)
    matched = unioned.select(
        "*",
        *[
            F.first(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in r_src
        ],
        F.first(
            F.when(F.col("__side") == right_tag, F.col("__ts")), ignorenulls=True
        )
        .over(w)
        .alias("__m_ts"),
    ).where(F.col("__side") == F.lit(left_tag))

    def _gate(col: Column) -> Column:
        if tolerance_seconds is None:
            return col
        in_tol = (
            F.col("__m_ts").cast("long") - F.col("__ts").cast("long")
        ) <= F.lit(tolerance_seconds)
        return F.when(in_tol, col)

    out_cols = (
        [F.col(c) for c in by]
        + [F.col("__ts").alias(left_on)]
        + [F.col(c) for c in left_payload]
        + [_gate(F.col(f"__m_{c}")).alias(alias) for c, alias in right_cols.items()]
        + [_gate(F.col("__m_ts")).alias(f"matched_{right_on}")]
    )
    return matched.select(*out_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    right_cols: dict[str, str],
    *,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Nearest as-of join: per key, whichever of the most recent prior
    and the earliest following right row is closer in time (tie ->
    the PRIOR row, pandas ``merge_asof(direction='nearest')``'s
    convention).  ONE shuffle + sort on the key: both directions are
    window frames over the same unioned, once-sorted table --
    ``last(ignorenulls)`` over the preceding frame and
    ``first(ignorenulls)`` over the following frame -- then an in-row
    distance compare picks the side.  ``tolerance_seconds`` bounds
    the accepted distance in BOTH directions."""
    left_payload = [c for c in left.columns if c not in by and c != left_on]
    r_src = list(right_cols)

    # Rights sort before lefts at equal ts: the prior frame then
    # includes same-ts rights (distance 0 backward) and the following
    # frame starts at the left row itself, so a same-ts right is seen
    # once, as a prior match -- matching the tie -> prior convention.
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in r_src],
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"__r_{c}") for c in r_src],
    )
    order = [F.col("__ts"), F.col("__side"), *[F.col(f"__r_{c}") for c in r_src]]
    wb = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    right_ts = F.when(F.col("__side") == 0, F.col("__ts"))
    matched = (
        l_tagged.unionByName(r_tagged)
        .select(
            "*",
            F.last(right_ts, ignorenulls=True).over(wb).alias("__b_ts"),
            F.first(right_ts, ignorenulls=True).over(wf).alias("__f_ts"),
            *[
                F.last(F.col(f"__r_{c}"), ignorenulls=True)
                .over(wb)
                .alias(f"__b_{c}")
                for c in r_src
            ],
            *[
                F.first(F.col(f"__r_{c}"), ignorenulls=True)
                .over(wf)
                .alias(f"__f_{c}")
                for c in r_src
            ],
        )
        .where(F.col("__side") == 1)
    )
    # Microsecond distances: a seconds cast would truncate sub-second
    # timestamps and misdecide near-tie directions.
    b_dist = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__b_ts"))
    f_dist = F.unix_micros(F.col("__f_ts")) - F.unix_micros(F.col("__ts"))
    use_b = F.col("__b_ts").isNotNull() & (
        F.col("__f_ts").isNull() | (b_dist <= f_dist)
    )

    def _pick(b: Column, f: Column) -> Column:
        col = F.when(use_b, b).otherwise(f)
        if tolerance_seconds is None:
            return col
        dist = F.when(use_b, b_dist).otherwise(f_dist)
        return F.when(dist <= F.lit(int(tolerance_seconds) * 1_000_000), col)

    out_cols = (
        [F.col(c) for c in by]
        + [F.col("__ts").alias(left_on)]
        + [F.col(c) for c in left_payload]
        + [
            _pick(F.col(f"__b_{c}"), F.col(f"__f_{c}")).alias(alias)
            for c, alias in right_cols.items()
        ]
        + [_pick(F.col("__b_ts"), F.col("__f_ts")).alias(f"matched_{right_on}")]
    )
    return matched.select(*out_cols)
