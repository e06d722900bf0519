"""As-of join: for each left row, the most recent right row at or
before it (per key).  SURVEY.md §2 Table B ("as-of (nearest prior)").

Spark has no native ASOF JOIN (DuckDB/Pandas do), so this implements
the union+window formulation:

    union(left tagged, right tagged)
      -> window per key ordered by (ts, side)        [rights first]
      -> last(right_struct, ignorenulls) over rows unbounded-preceding..current
      -> keep left rows

The carried right columns travel as ONE struct (payload + right
timestamp), so the match is atomic: a NULL inside a right row's
carried column stays NULL in the output instead of being back-filled
from a DIFFERENT (older/newer) right row -- the tuple-tearing bug a
per-column last(ignorenulls) formulation has.  The struct itself is
non-null for every right row, so ignorenulls skips only left rows.

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
from pyspark.sql import types as T
from pyspark.sql.window import Window

_MTS = "__mts"  # right-timestamp field inside the carried struct


def _tag_sides(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    r_src: list[str],
    left_tag: int,
    right_tag: int,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Project both sides onto the union schema: keys, ``__ts``,
    ``__side``, the left payload, and the atomic right struct ``__r``
    (carried columns + right timestamp; NULL on left rows)."""
    left_payload = [c for c in left.columns if c not in by and c != left_on]
    r_struct = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in r_src]
        + [T.StructField(_MTS, right.schema[right_on].dataType)]
    )
    l_tagged = left.select(
        *[F.col(c) for c in by],
        F.col(left_on).alias("__ts"),
        F.lit(left_tag).alias("__side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(r_struct).alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("__ts"),
        F.lit(right_tag).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(
            *[F.col(c).alias(c) for c in r_src],
            F.col(right_on).alias(_MTS),
        ).alias("__r"),
    )
    return l_tagged, r_tagged, left_payload


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
    r_src = list(right_cols)
    l_tagged, r_tagged, left_payload = _tag_sides(
        left, right, by, left_on, right_on, r_src, left_tag, right_tag
    )

    # Final tiebreak on the carried right struct: when several right
    # rows share key AND timestamp, ``last()`` must not depend on
    # partition-internal order -- with the tiebreak the greatest carried
    # tuple wins deterministically (left rows carry a null struct,
    # which sorts first and never reorders relative to rights).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    matched = (
        l_tagged.unionByName(r_tagged)
        .select(
            "*",
            F.last(F.col("__r"), ignorenulls=True).over(w).alias("__m"),
        )
        .where(F.col("__side") == F.lit(left_tag))
    )

    def _gate(col: Column) -> Column:
        if tolerance_seconds is None:
            return col
        in_tol = (
            F.col("__ts").cast("long") - F.col("__m")[_MTS].cast("long")
        ) <= F.lit(tolerance_seconds)
        return F.when(in_tol, col)

    out_cols = (
        [F.col(c) for c in by]
        + [F.col("__ts").alias(left_on)]
        + [F.col(c) for c in left_payload]
        + [_gate(F.col("__m")[c]).alias(alias) for c, alias in right_cols.items()]
        + [_gate(F.col("__m")[_MTS]).alias(f"matched_{right_on}")]
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
    ``first(ignorenulls)`` of the atomic right struct over
    current-row..unbounded-following.  Ties on (key, ts) among right
    rows break by the carried tuple (smallest wins) -- deterministic
    under any partitioning.  ``tolerance_seconds`` nulls out matches
    farther ahead than the horizon."""
    # Inclusive: rights at equal ts must be IN a left row's following
    # frame -> lefts sort first.  Strict: rights at equal ts sort
    # before the left row and fall outside its frame.
    left_tag, right_tag = (0, 1) if not strict else (1, 0)
    r_src = list(right_cols)
    l_tagged, r_tagged, left_payload = _tag_sides(
        left, right, by, left_on, right_on, r_src, left_tag, right_tag
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__r"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .select(
            "*",
            F.first(F.col("__r"), ignorenulls=True).over(w).alias("__m"),
        )
        .where(F.col("__side") == F.lit(left_tag))
    )

    def _gate(col: Column) -> Column:
        if tolerance_seconds is None:
            return col
        in_tol = (
            F.col("__m")[_MTS].cast("long") - F.col("__ts").cast("long")
        ) <= F.lit(tolerance_seconds)
        return F.when(in_tol, col)

    out_cols = (
        [F.col(c) for c in by]
        + [F.col("__ts").alias(left_on)]
        + [F.col(c) for c in left_payload]
        + [_gate(F.col("__m")[c]).alias(alias) for c, alias in right_cols.items()]
        + [_gate(F.col("__m")[_MTS]).alias(f"matched_{right_on}")]
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
    ``last(ignorenulls)`` of the right struct over the preceding frame
    and ``first(ignorenulls)`` over the following frame -- then an
    in-row distance compare picks the side (atomically: every output
    column comes from the picked struct).  ``tolerance_seconds``
    bounds the accepted distance in BOTH directions."""
    r_src = list(right_cols)

    # Rights sort before lefts at equal ts: the prior frame then
    # includes same-ts rights (distance 0 backward) and the following
    # frame starts at the left row itself, so a same-ts right is seen
    # once, as a prior match -- matching the tie -> prior convention.
    l_tagged, r_tagged, left_payload = _tag_sides(
        left, right, by, left_on, right_on, r_src, left_tag=1, right_tag=0
    )
    order = [F.col("__ts"), F.col("__side"), F.col("__r")]
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
    matched = (
        l_tagged.unionByName(r_tagged)
        .select(
            "*",
            F.last(F.col("__r"), ignorenulls=True).over(wb).alias("__b"),
            F.first(F.col("__r"), ignorenulls=True).over(wf).alias("__f"),
        )
        .where(F.col("__side") == 1)
    )
    # Microsecond distances: a seconds cast would truncate sub-second
    # timestamps and misdecide near-tie directions.
    b_dist = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__b")[_MTS])
    f_dist = F.unix_micros(F.col("__f")[_MTS]) - F.unix_micros(F.col("__ts"))
    use_b = F.col("__b").isNotNull() & (
        F.col("__f").isNull() | (b_dist <= f_dist)
    )

    def _pick(field: str) -> Column:
        col = F.when(use_b, F.col("__b")[field]).otherwise(F.col("__f")[field])
        if tolerance_seconds is None:
            return col
        dist = F.when(use_b, b_dist).otherwise(f_dist)
        return F.when(dist <= F.lit(int(tolerance_seconds) * 1_000_000), col)

    out_cols = (
        [F.col(c) for c in by]
        + [F.col("__ts").alias(left_on)]
        + [F.col(c) for c in left_payload]
        + [_pick(c).alias(alias) for c, alias in right_cols.items()]
        + [_pick(_MTS).alias(f"matched_{right_on}")]
    )
    return matched.select(*out_cols)
