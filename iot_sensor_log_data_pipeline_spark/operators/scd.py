"""CDC / SCD2 merge emulation (pyspark_guide 'CDC / SCD2': MERGE INTO
needs a table format; in plain parquet emulate with anti-join + union
+ window).

``merge_upsert`` is the CDC apply: new snapshot wins per key, untouched
rows carried over -- one anti join (all broadcastable when the delta is
small).  ``scd2_apply`` maintains slowly-changing-dimension history:
closing validity intervals on changed keys and appending new current
rows, entirely as set operations -- no per-row driver logic, one shuffle
on the business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Open-ended validity sentinel (avoids NULL-end-date three-valued
#: logic in downstream range predicates).
OPEN_END = "9999-12-31 00:00:00"


def merge_upsert(current: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """UPSERT (CDC apply): rows from ``updates`` replace same-key rows
    in ``current``; unmatched current rows survive.  current ANTI-JOIN
    updates UNION updates -- the standard MERGE emulation without a
    table format."""
    untouched = current.join(updates, on=keys, how="left_anti")
    return untouched.unionByName(updates)


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff: classify every key across two table versions as
    ``added`` / ``removed`` / ``changed`` / ``unchanged``, with the
    number of differing compare columns -- the audit view behind CDC
    reconciliation and table-format time travel (DIFF of two commits),
    here as one FULL OUTER equi-join on the key with null-safe
    per-column comparison (so NULL -> value counts as a change, not a
    three-valued-logic escape).

    Scale shape: both sides shuffle once on the key (sort-merge at
    corpus scale, broadcast when one snapshot is a small delta); the
    per-column comparisons are codegen'd expressions, no UDFs.
    Returns ``keys + change_type + n_changed_cols``.
    """
    b = before.select(
        *keys, *[F.col(c).alias(f"__b_{c}") for c in compare_cols]
    ).withColumn("__in_b", F.lit(1))
    a = after.select(
        *keys, *[F.col(c).alias(f"__a_{c}") for c in compare_cols]
    ).withColumn("__in_a", F.lit(1))
    j = b.join(a, on=keys, how="full_outer")
    n_changed = F.lit(0)
    for c in compare_cols:
        n_changed = n_changed + F.when(
            ~F.col(f"__b_{c}").eqNullSafe(F.col(f"__a_{c}")), 1
        ).otherwise(0)
    change_type = (
        F.when(F.col("__in_b").isNull(), F.lit("added"))
        .when(F.col("__in_a").isNull(), F.lit("removed"))
        .when(n_changed > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        change_type.alias("change_type"),
        F.when(
            F.col("__in_b").isNotNull() & F.col("__in_a").isNotNull(), n_changed
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_changed_cols"),
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    effective_ts_col: str,
) -> DataFrame:
    """SCD Type-2: version rows with [valid_from, valid_to) intervals.

    ``dim`` columns: ``keys + compare_cols + valid_from + valid_to +
    is_current``.  ``changes``: ``keys + compare_cols +
    effective_ts_col``.  Changed keys get their current row closed
    (valid_to = change ts) and a new current row appended; unchanged
    keys pass through untouched (a join + filter decides 'changed').
    """
    cur = dim.where(F.col("is_current"))
    hist = dim.where(~F.col("is_current"))

    chg = changes.select(
        *keys,
        *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
        F.col(effective_ts_col).alias("__eff_ts"),
    )
    joined = cur.join(chg, on=keys, how="left")

    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    changed = joined.where(F.col("__eff_ts").isNotNull() & differs)
    unchanged = joined.where(F.col("__eff_ts").isNull() | ~differs).select(dim.columns)

    closed = changed.select(
        *keys,
        *compare_cols,
        F.col("valid_from"),
        F.col("__eff_ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changed.select(
        *keys,
        *[F.col(f"__new_{c}").alias(c) for c in compare_cols],
        F.col("__eff_ts").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    inserts = changes.join(cur, on=keys, how="left_anti").select(
        *keys,
        *compare_cols,
        F.col(effective_ts_col).alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        hist.select(dim.columns)
        .unionByName(unchanged)
        .unionByName(closed.select(dim.columns))
        .unionByName(opened.select(dim.columns))
        .unionByName(inserts.select(dim.columns))
    )


def incremental_join_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
    prune_base: bool = True,
) -> DataFrame:
    """Delta of a materialized inner-join view under insert-only
    ingestion: with A' = A ∪ ΔA and B' = B ∪ ΔB,

        Δ(A ⋈ B)  =  (ΔA ⋈ B')  ∪  (A ⋈ ΔB)

    -- the rows to APPEND to the stored join, never touching existing
    output (pinned in pytest as new-join minus old-join, multiset
    semantics).  This is how a 100 TB joined table refreshes hourly:
    the full A ⋈ B re-join never runs again; each refresh shuffles
    only delta-sized inputs against base-sized ones.

    ``prune_base``: semi-join each BASE side down to the delta's join
    keys before the real join -- the base scan then prunes to
    delta-matching rows (Catalyst turns the semi-join into a
    broadcast/bloom filter when the delta is small), so refresh cost
    tracks |delta| + matching-base, not |base|.  Disable only when
    delta keys are a large fraction of base keys.

    Insert-only by contract: deletes/updates need the retraction
    algebra (``incremental_join_cdc_delta``), which an append-only
    delta cannot express.
    """
    keys = [on] if isinstance(on, str) else list(on)
    b_new = b_old.unionByName(delta_b)
    if prune_base:
        b_new = b_new.join(
            F.broadcast(delta_a.select(*keys).distinct()), keys, "left_semi"
        )
        a_for_db = a_old.join(
            F.broadcast(delta_b.select(*keys).distinct()), keys, "left_semi"
        )
    else:
        a_for_db = a_old
    return delta_a.join(b_new, keys).unionByName(a_for_db.join(delta_b, keys))


def apply_cdc(
    base: DataFrame,
    cdc: DataFrame,
    pk: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply a CDC batch to a pk-unique table: ``insert``/``update``
    rows upsert (``merge_upsert``), ``delete`` rows anti-join out by
    primary key (their payload columns are ignored).  One anti-join +
    one union -- both broadcastable while the batch is delta-sized.

    Per-pk ordering contract: the implementation applies upserts then
    anti-joins delete pks, so WITHIN one batch it cannot order ops on
    the same pk -- a delete followed by a re-insert of the same pk
    would silently resolve to the delete.  Two ways to stay correct:

    * pass ``seq_col`` (a per-row change-sequence / LSN column) and
      the batch may carry any op mix per pk -- one delta-sized window
      keeps the highest-sequence row per pk (a delete/non-delete tie
      at the same sequence resolves non-delete, matching
      apply-in-order semantics where the later op survives), so
      delete-then-reinsert resolves to the reinsert; the sequence
      column is dropped from the output.  TWO NON-DELETES tied at the
      same (pk, sequence) carry genuinely different payloads with no
      order between them, so that raises ValueError (a delta-sized
      check) instead of letting shuffle order pick the survivor;
    * without ``seq_col``, a batch must carry AT MOST ONE row per pk
      (the usual compacted-CDC contract).  Violations raise
      ValueError via one delta-sized count job rather than resolving
      delete-last silently.
    """
    from pyspark.sql.types import MapType

    # Byte-identical duplicate rows are at-least-once replay artifacts
    # (a connector retry), not conflicts -- collapse them BEFORE the
    # ambiguity checks so healthy replays never halt the pipeline.
    # Spark forbids map columns in set operations, so a map-typed
    # payload skips the collapse (its duplicates then hit the
    # ambiguity checks -- strict, but never a new crash class).
    if not any(isinstance(f.dataType, MapType) for f in cdc.schema.fields):
        cdc = cdc.dropDuplicates()
    if seq_col is not None:
        is_upsert = F.when(F.col(op_col) == "delete", F.lit(0)).otherwise(
            F.lit(1)
        )
        amb = (
            cdc.where(F.col(op_col) != "delete")
            .groupBy(pk, seq_col)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if amb:
            raise ValueError(
                f"CDC batch carries {int(amb[0]['count'])} non-delete rows "
                f"for {pk}={amb[0][pk]!r} at {seq_col}="
                f"{amb[0][seq_col]!r}; equal-sequence upserts have no "
                "defined order -- assign distinct sequences (or compact "
                "the batch) instead of letting partitioning pick one"
            )
        w = Window.partitionBy(pk).orderBy(
            F.desc(seq_col),
            # equal sequence: a delete ordered before a non-delete of
            # the same pk means the non-delete happened "after" in
            # apply-in-order semantics; deterministic either way (the
            # two-upsert tie was rejected above).
            is_upsert.desc(),
        )
        cdc = (
            cdc.withColumn("__cdc_rn", F.row_number().over(w))
            .where(F.col("__cdc_rn") == 1)
            .drop("__cdc_rn", seq_col)
        )
    else:
        dup = (
            cdc.groupBy(pk)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"CDC batch carries {int(dup[0]['count'])} rows for "
                f"{pk}={dup[0][pk]!r}; without seq_col a batch must be "
                "pk-compacted (at most one op per pk) -- pass seq_col "
                "to resolve multi-op pks by change sequence"
            )
    upserts = cdc.where(F.col(op_col).isin("insert", "update")).drop(op_col)
    dels = cdc.where(F.col(op_col) == "delete").select(pk).distinct()
    return merge_upsert(base, upserts, [pk]).join(
        F.broadcast(dels), pk, "left_anti"
    )


def incremental_join_cdc_delta(
    a_old: DataFrame,
    cdc_a: DataFrame,
    b_old: DataFrame,
    cdc_b: DataFrame,
    on: list[str] | str,
    pk_a: str,
    pk_b: str,
    op_col: str = "op",
) -> DataFrame:
    """Delta of a materialized inner-join view under FULL CDC
    (insert / update / delete) -- the retraction algebra
    ``incremental_join_delta`` refuses by contract.  CDC batches carry
    ``op_col`` in {insert, update, delete} plus the base schema; both
    bases are pk-unique.  Returns the stored view's maintenance delta
    with an ``action`` column: ``retract`` rows to remove (multiset
    semantics), ``insert`` rows to append, such that

        apply(V, delta)  ==  apply_cdc(A) ⋈ apply_cdc(B)

    (pinned in pytest as an exceptAll identity, including join-key
    moves and delete-then-reinsert).

    How it stays delta-sized: every view row that changes has its join
    key in the AFFECTED-KEY set K -- the join keys of the cdc rows'
    OLD base images (a pk semi-join pulls them) plus the cdc rows' NEW
    images (an updated row that MOVES join key affects both its old
    and new key's groups).  Both old and new views are recomputed only
    restricted to K (semi-join pruned scans -- Catalyst pushes the
    broadcast key set into the base scans), and the retract/insert
    sets are their multiset differences.  Cost tracks |K|-matching
    rows, never |base|; the full re-join never runs."""
    keys = [on] if isinstance(on, str) else list(on)
    # CDC batches are delta-sized by contract but REFERENCED many times
    # (affected-key derivation + apply_cdc per side); un-materialized,
    # every reference re-expands the caller's cdc subtree into the plan
    # -- this query planned 85 parquet scans / 62 exchanges before the
    # checkpoints, ~8 scans after (the branch fan-out class recorded in
    # SCALE.md).  Same for the affected-key set K: bounded by the cdc
    # size and read by all four restrict() calls.
    cdc_a = cdc_a.localCheckpoint(eager=False)
    cdc_b = cdc_b.localCheckpoint(eager=False)

    def affected_keys(base: DataFrame, cdc: DataFrame, pk: str) -> DataFrame:
        old_images = base.join(
            F.broadcast(cdc.select(pk).distinct()), pk, "left_semi"
        ).select(*keys)
        new_images = cdc.where(
            F.col(op_col).isin("insert", "update")
        ).select(*keys)
        return old_images.unionByName(new_images)

    k = (
        affected_keys(a_old, cdc_a, pk_a)
        .unionByName(affected_keys(b_old, cdc_b, pk_b))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a_new = apply_cdc(a_old, cdc_a, pk_a, op_col)
    b_new = apply_cdc(b_old, cdc_b, pk_b, op_col)

    def restrict(df: DataFrame) -> DataFrame:
        return df.join(F.broadcast(k), keys, "left_semi")

    old_view = restrict(a_old).join(restrict(b_old), keys)
    new_view = restrict(a_new).join(restrict(b_new), keys)
    # Both multiset differences in ONE signed-count aggregation: the
    # naive ``old.exceptAll(new)`` + ``new.exceptAll(old)`` pair plans
    # each restricted view TWICE (each exceptAll re-derives both
    # inputs) and shuffles the full row set twice.  A +1/-1 weighted
    # union grouped on the row computes the same multisets -- rows with
    # surplus old copies retract that many times, surplus new copies
    # insert -- with each view derived once and one exchange
    # (guide §2.4: remove shuffles outright).  NULL-equality and
    # duplicate-multiplicity semantics match exceptAll's exactly
    # (pinned in pytest as the apply(V, delta) == full-re-join
    # identity, including join-key moves and delete-then-reinsert).
    # POSITIONAL aliases for the aggregation working columns: the
    # signed-count rewrite resolves rows by name, but exceptAll (the
    # semantics being replayed) was positional -- a joined view with
    # duplicate non-key output names, or a column literally named
    # __w/__d, must keep working.  toDF() renames by position, the
    # final select restores the original names (duplicates included).
    cols = old_view.columns
    tmp = [f"__c{i}" for i in range(len(cols))]
    old_t = old_view.toDF(*tmp)
    new_t = new_view.toDF(*tmp)
    signed = old_t.select(F.lit(1).alias("__w"), "*").unionByName(
        new_t.select(F.lit(-1).alias("__w"), "*")
    )
    diff = (
        signed.groupBy(*tmp)
        .agg(F.sum("__w").alias("__d"))
        .where(F.col("__d") != 0)
    )
    return diff.select(
        F.when(F.col("__d") > 0, F.lit("retract"))
        .otherwise(F.lit("insert"))
        .alias("action"),
        *[F.col(t).alias(c) for t, c in zip(tmp, cols)],
        F.explode(F.sequence(F.lit(1), F.abs(F.col("__d")))).alias("__i"),
    ).drop("__i")
