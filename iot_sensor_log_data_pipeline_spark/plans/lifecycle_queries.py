"""Mutation-lifecycle and semantics queries: CDC upsert, SCD2 history,
null-handling semantics, and the extended string-function battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load, parallelize_small
from ..operators.scd import merge_upsert, scd2_apply, snapshot_diff
from .catalog import register


@register(
    "cdc_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             '0-URGENT-NEW' AS o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    merged AS (
      SELECT c.* FROM orders c
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = c.o_orderkey)
      UNION ALL
      SELECT * FROM updates
    )
    SELECT o_orderpriority, count(*) AS n
    FROM merged
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("lifecycle", "cdc", "merge"),
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply / MERGE emulation (anti-join + union,
    operators/scd.py): every 10th order gets a replacement row; counts
    by priority prove replaced rows vanish and survivors carry over."""
    orders = load(spark, sf_dir, "orders")
    updates = orders.where(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_orderpriority", F.lit("0-URGENT-NEW")
    )
    merged = merge_upsert(orders, updates, keys=["o_orderkey"])
    return (
        merged.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
    WITH b AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
    ),
    a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN 'R' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders WHERE o_orderkey % 17 <> 0
      UNION ALL
      SELECT -o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
           CASE WHEN b.o_orderkey IS NULL THEN 'added'
                WHEN a.o_orderkey IS NULL THEN 'removed'
                WHEN CAST(b.o_orderstatus IS DISTINCT FROM a.o_orderstatus AS INT)
                   + CAST(b.o_totalprice IS DISTINCT FROM a.o_totalprice AS INT)
                   + CAST(b.o_orderpriority IS DISTINCT FROM a.o_orderpriority AS INT)
                   > 0 THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           CAST(CASE WHEN b.o_orderkey IS NULL OR a.o_orderkey IS NULL THEN 0
                ELSE CAST(b.o_orderstatus IS DISTINCT FROM a.o_orderstatus AS INT)
                   + CAST(b.o_totalprice IS DISTINCT FROM a.o_totalprice AS INT)
                   + CAST(b.o_orderpriority IS DISTINCT FROM a.o_orderpriority AS INT)
                END AS BIGINT) AS n_changed_cols
    FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey
    ORDER BY o_orderkey
    """,
    tags=("lifecycle", "cdc", "diff"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (``operators/scd.py:snapshot_diff``):
    classify every order key across two synthetic table versions --
    every 17th key dropped (removed), every 5th restatused + repriced
    (changed), every 7th priority NULLed (changed via the null-safe
    compare, the three-valued-logic trap the operator exists to
    avoid), every 13th re-keyed negative (added).  One full-outer
    equi-join on the key; per-column compares are codegen'd
    expressions.  The oracle replays the same mutation and IS DISTINCT
    FROM classification."""
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    before = load(spark, sf_dir, "orders").select(*cols)
    k = F.col("o_orderkey")
    changed = k % 5 == 0
    after = before.where(k % 17 != 0).select(
        "o_orderkey",
        F.when(changed, F.lit("R")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(changed, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(k % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    ).unionByName(
        before.where(k % 13 == 0).select(
            (-k).alias("o_orderkey"),
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
        )
    )
    diff = snapshot_diff(
        before,
        after,
        keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    return diff.orderBy("o_orderkey")


@register(
    "scd2_customer_history",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
             TIMESTAMP '9999-12-31 00:00:00' AS valid_to,
             true AS is_current
      FROM customer
    ),
    changes AS (
      SELECT c_custkey, 'RELOCATED' AS c_mktsegment,
             TIMESTAMP '2000-06-01 00:00:00' AS eff_ts
      FROM customer WHERE c_custkey % 3 = 0
    ),
    changed AS (
      SELECT d.c_custkey, d.c_mktsegment AS old_seg, c.c_mktsegment AS new_seg,
             d.valid_from, c.eff_ts
      FROM dim d JOIN changes c ON d.c_custkey = c.c_custkey
      WHERE d.c_mktsegment <> c.c_mktsegment
    ),
    result AS (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from, d.valid_to, d.is_current
      FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM changed)
      UNION ALL
      SELECT c_custkey, old_seg, valid_from, eff_ts, false FROM changed
      UNION ALL
      SELECT c_custkey, new_seg, eff_ts,
             TIMESTAMP '9999-12-31 00:00:00', true FROM changed
    )
    SELECT is_current,
           c_mktsegment,
           count(*) AS n,
           strftime(min(valid_from), '%Y-%m-%d') AS min_from,
           strftime(max(valid_to), '%Y-%m-%d') AS max_to
    FROM result
    GROUP BY is_current, c_mktsegment
    ORDER BY is_current, c_mktsegment
    """,
    tags=("lifecycle", "scd2"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history maintenance (operators/scd.py): every third
    customer relocates segment on 2000-06-01 -- old rows get their
    validity closed, new current rows open, others pass through.
    Output: interval summary per (is_current, segment)."""
    cust = load(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit("9999-12-31 00:00:00").cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = (
        cust.where(F.col("c_custkey") % 3 == 0)
        .select(
            "c_custkey",
            F.lit("RELOCATED").alias("c_mktsegment"),
            F.lit("2000-06-01 00:00:00").cast("timestamp").alias("eff_ts"),
        )
    )
    result = scd2_apply(
        dim, changes, keys=["c_custkey"], compare_cols=["c_mktsegment"],
        effective_ts_col="eff_ts",
    )
    return (
        result.groupBy("is_current", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.min("valid_from"), "yyyy-MM-dd").alias("min_from"),
            F.date_format(F.max("valid_to"), "yyyy-MM-dd").alias("max_to"),
        )
        .orderBy("is_current", "c_mktsegment")
    )


@register(
    "null_semantics",
    oracle="""
    WITH lj AS (
      SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
      FROM customer c
      LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
        ON c.c_custkey = o.o_custkey
    )
    SELECT c_mktsegment,
           count(*) AS n_rows,
           count(o_orderkey) AS n_matched,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct_matched,
           CAST(sum(CASE WHEN o_totalprice IS NOT DISTINCT FROM NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null,
           round(coalesce(max(o_totalprice), 0.0), 2) AS max_price_or_zero
    FROM lj
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("lifecycle", "nulls", "semantics"),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic battery over genuine outer-join nulls:
    count(col) vs count(*), IS NULL tallies, null-safe equality
    (eqNullSafe == IS NOT DISTINCT FROM), distinct-with-nulls,
    coalesce defaults."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    lj = cust.join(big, cust.c_custkey == big.o_custkey, "left")
    return (
        lj.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_matched"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("n_null"),
            F.countDistinct("o_orderkey").alias("n_distinct_matched"),
            F.sum(
                F.when(F.col("o_totalprice").eqNullSafe(F.lit(None).cast("double")), 1)
                .otherwise(0)
            ).alias("n_nullsafe_null"),
            F.round(F.coalesce(F.max("o_totalprice"), F.lit(0.0)), 2).alias(
                "max_price_or_zero"
            ),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "string_functions_extended",
    oracle="""
    SELECT s_suppkey,
           to_base64(encode(s_name)) AS name_b64,
           lower(hex(encode(s_name))) AS name_hex,
           translate(s_name, '#0', '_O') AS name_translated,
           split_part(s_name, '#', 2) AS name_num,
           levenshtein(s_name, 'Supplier#1') AS lev_to_one,
           strpos(s_name, '#') AS hash_pos,
           repeat(left(s_name, 2), 2) AS prefix_twice,
           right(s_name, 3) AS suffix,
           ascii(s_name) AS first_code
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("functions", "string"),
)
def string_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: base64/hex codecs, translate, split_part,
    levenshtein, position, repeat, left/right, ascii."""
    supp = load(spark, sf_dir, "supplier")
    name = F.col("s_name")
    return supp.select(
        "s_suppkey",
        F.base64(name.cast("binary")).alias("name_b64"),
        F.lower(F.hex(name.cast("binary"))).alias("name_hex"),
        F.translate(name, "#0", "_O").alias("name_translated"),
        F.split_part(name, F.lit("#"), F.lit(2)).alias("name_num"),
        F.levenshtein(name, F.lit("Supplier#1")).cast("long").alias("lev_to_one"),
        F.instr(name, "#").cast("long").alias("hash_pos"),
        F.repeat(F.substring(name, 1, 2), 2).alias("prefix_twice"),
        F.substring(name, -3, 3).alias("suffix"),
        F.ascii(name).alias("first_code"),
    ).orderBy("s_suppkey")


@register(
    "profile_events_table",
    oracle="""
    SELECT 'event_type' AS "column", count(*) AS n_rows,
           CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT event_type) AS n_distinct,
           CAST(min(event_type) AS VARCHAR) AS min_repr,
           CAST(max(event_type) AS VARCHAR) AS max_repr
    FROM events
    UNION ALL
    SELECT 'user_id', count(*),
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT user_id),
           CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'value', count(*),
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT value),
           CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR)
    FROM events
    ORDER BY "column"
    """,
    tags=("lifecycle", "profiling"),
)
def profile_events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (operators/profiling.py): per-column null rate,
    exact distinct cardinality, and range -- all columns in ONE scan
    (the oracle's UNION ALL formulation scans per column; the engine's
    single-pass plan is the point)."""
    from ..operators.profiling import profile

    events = load(spark, sf_dir, "events")
    return profile(events, ["event_type", "user_id", "value"]).orderBy("column")


@register(
    "incremental_rollup_merge",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS "day",
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
               AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY "day"
    """,
    tags=("lifecycle", "incremental", "rollup"),
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance: the stored rollup
    (events before 2024-01-15) is MERGED with the new partition's
    partial aggregate by re-aggregating mergeable state (sum, count) --
    never re-scanning history -- and must equal the full recompute (the
    oracle).  This is the hypertable continuous-aggregate pattern: at
    100 TB the left input is the tiny rollup table, only the new
    partition is scanned."""
    events = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")

    def partial(df):
        return df.groupBy(day).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )

    stored_rollup = partial(events.where(F.col("ts") < cutoff))
    increment = partial(events.where(F.col("ts") >= cutoff))
    merged = (
        stored_rollup.unionByName(increment)
        .groupBy("day")
        .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
    )
    return merged.select(
        "day",
        "n",
        F.round(F.col("sum_value").cast("double") / F.col("n"), 6).alias("avg_value"),
    ).orderBy("day")


@register(
    "quality_referential_checks",
    oracle="""
    SELECT 'orders_without_customer' AS check_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS n_violations
    UNION ALL
    SELECT 'lineitem_without_order',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer_without_nation',
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_negative_quantity',
           CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT)
    UNION ALL
    SELECT 'orders_null_date',
           CAST((SELECT count(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT)
    ORDER BY check_name
    """,
    tags=("lifecycle", "quality", "referential"),
)
def quality_referential_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-ops data-quality battery: referential integrity as
    LEFT ANTI joins (orphan orders/lineitems/customers -- each plans as
    a broadcast/shuffled hash anti-join, never a subquery loop) plus
    range and null-rate checks, one count per rule.  The
    fail-the-pipeline gate a 100 TB ingest runs before publishing a
    snapshot; all counts are 0 on the clean synthetic corpus, which is
    exactly what the gate asserts."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    nation = load(spark, sf_dir, "nation")

    def n(df) -> F.Column:
        return F.count(F.lit(1)).cast("long")

    checks = [
        (
            "orders_without_customer",
            orders.join(
                customer, orders.o_custkey == customer.c_custkey, "left_anti"
            ),
        ),
        (
            "lineitem_without_order",
            lineitem.join(
                orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
            ),
        ),
        (
            "customer_without_nation",
            customer.join(
                nation, customer.c_nationkey == nation.n_nationkey, "left_anti"
            ),
        ),
        ("lineitem_negative_quantity", lineitem.where(F.col("l_quantity") <= 0)),
        ("orders_null_date", orders.where(F.col("o_orderdate").isNull())),
    ]
    parts = [
        df.agg(n(df).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )
        for name, df in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check_name")


@register(
    "profile_psi_drift",
    oracle="""
    WITH ref AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    ),
    cur AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    ),
    stats AS (SELECT min(v) AS lo, max(v) AS hi FROM ref),
    rbin AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE greatest(least(CAST(floor((v - lo) * 10 / (hi - lo))
                                           AS INT), 9), 0) END AS bin
      FROM ref CROSS JOIN stats
    ),
    cbin AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE greatest(least(CAST(floor((v - lo) * 10 / (hi - lo))
                                           AS INT), 9), 0) END AS bin
      FROM cur CROSS JOIN stats
    ),
    rs AS (
      SELECT bin, count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM rbin)
               AS share_ref
      FROM rbin GROUP BY bin
    ),
    cs AS (
      SELECT bin, count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM cbin)
               AS share_cur
      FROM cbin GROUP BY bin
    ),
    grid AS (SELECT unnest(range(10)) AS bin)
    SELECT CAST(g.bin AS INT) AS bin,
           round(coalesce(rs.share_ref, 0.0), 6) AS share_ref,
           round(coalesce(cs.share_cur, 0.0), 6) AS share_cur,
           round((greatest(coalesce(cs.share_cur, 0.0), 1e-6)
                  - greatest(coalesce(rs.share_ref, 0.0), 1e-6))
                 * ln(greatest(coalesce(cs.share_cur, 0.0), 1e-6)
                      / greatest(coalesce(rs.share_ref, 0.0), 1e-6)), 6)
             AS psi_contrib
    FROM grid g LEFT JOIN rs ON rs.bin = g.bin LEFT JOIN cs ON cs.bin = g.bin
    ORDER BY bin
    """,
    tags=("profiling", "drift", "psi", "monitoring"),
)
def profile_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring
    (``operators/profiling.py:psi_drift``): Population Stability Index
    of ``l_extendedprice`` between the pre-1999 reference snapshot and
    the current period, per equi-width bin anchored on the REFERENCE
    range (out-of-range drift lands in the edge bins).  One scalar
    pass + two binned hash aggs + a 10-row join -- the comparison
    itself never scales with the data."""
    from ..operators.profiling import psi_drift

    li = load(spark, sf_dir, "lineitem")
    split = F.lit("1999-01-01 00:00:00").cast("timestamp")
    ref = li.where(F.col("l_shipdate") < split)
    cur = li.where(F.col("l_shipdate") >= split)
    out = psi_drift(ref, cur, "l_extendedprice", n_bins=10)
    return out.select(
        "bin",
        F.round("share_ref", 6).alias("share_ref"),
        F.round("share_cur", 6).alias("share_cur"),
        F.round("psi_contrib", 6).alias("psi_contrib"),
    ).orderBy("bin")


@register(
    "scd2_point_in_time_join",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
             TIMESTAMP '9999-12-31 00:00:00' AS valid_to
      FROM customer
    ),
    changes AS (
      SELECT c_custkey, 'RELOCATED' AS c_mktsegment,
             TIMESTAMP '2000-06-01 00:00:00' AS eff_ts
      FROM customer WHERE c_custkey % 3 = 0
    ),
    changed AS (
      SELECT d.c_custkey, d.c_mktsegment AS old_seg, c.c_mktsegment AS new_seg,
             d.valid_from, c.eff_ts
      FROM dim d JOIN changes c ON d.c_custkey = c.c_custkey
      WHERE d.c_mktsegment <> c.c_mktsegment
    ),
    hist AS (
      SELECT d.c_custkey, d.c_mktsegment, d.valid_from, d.valid_to
      FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM changed)
      UNION ALL
      SELECT c_custkey, old_seg, valid_from, eff_ts FROM changed
      UNION ALL
      SELECT c_custkey, new_seg, eff_ts,
             TIMESTAMP '9999-12-31 00:00:00' FROM changed
    )
    SELECT h.c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS sum_price
    FROM orders o
    JOIN hist h ON h.c_custkey = o.o_custkey
               AND o.o_orderdate >= h.valid_from
               AND o.o_orderdate < h.valid_to
    GROUP BY h.c_mktsegment
    ORDER BY h.c_mktsegment
    """,
    tags=("lifecycle", "scd2", "point-in-time", "range-join"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each order joins the SCD2
    version of its customer VALID AT o_orderdate (equi key + validity
    range predicate -- sort-merge on the business key, the range
    filter rides the join), so orders after the 2000-06-01 relocation
    attribute to 'RELOCATED' while older orders keep the historical
    segment -- the as-of-dimension semantics every warehouse fact
    query needs, composed from ``scd2_apply``'s history."""
    cust = load(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit("9999-12-31 00:00:00").cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = cust.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("RELOCATED").alias("c_mktsegment"),
        F.lit("2000-06-01 00:00:00").cast("timestamp").alias("eff_ts"),
    )
    hist = scd2_apply(
        dim,
        changes,
        keys=["c_custkey"],
        compare_cols=["c_mktsegment"],
        effective_ts_col="eff_ts",
    )
    orders = load(spark, sf_dir, "orders")
    joined = orders.join(
        hist,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "quality_iqr_outliers",
    oracle="""
    WITH fences AS (
      SELECT event_type,
             quantile_cont(CAST(value AS DOUBLE), 0.25)
               - 1.5 * (quantile_cont(CAST(value AS DOUBLE), 0.75)
                        - quantile_cont(CAST(value AS DOUBLE), 0.25)) AS lo_fence,
             quantile_cont(CAST(value AS DOUBLE), 0.75)
               + 1.5 * (quantile_cont(CAST(value AS DOUBLE), 0.75)
                        - quantile_cont(CAST(value AS DOUBLE), 0.25)) AS hi_fence
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(f.lo_fence, 6) + 0.0 AS lo_fence,
           round(f.hi_fence, 6) + 0.0 AS hi_fence,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) < f.lo_fence
                           OR CAST(e.value AS DOUBLE) > f.hi_fence
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(sum(CASE WHEN CAST(e.value AS DOUBLE) < f.lo_fence
                            OR CAST(e.value AS DOUBLE) > f.hi_fence
                          THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS outlier_frac
    FROM events e JOIN fences f ON f.event_type = e.event_type
    GROUP BY e.event_type, f.lo_fence, f.hi_fence
    ORDER BY e.event_type
    """,
    tags=("profiling", "quality", "outliers", "iqr"),
)
def quality_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier summary (``operators/profiling.py:iqr_outliers``):
    per event type, Tukey fences at p25/p75 +- 1.5 IQR over ``value``
    with outlier counts and fractions -- the quantile-based anomaly
    gate beside the rolling z-score (parametric) and PSI (drift)."""
    from ..operators.profiling import iqr_outliers

    ev = load(spark, sf_dir, "events")
    out = iqr_outliers(ev, "value", ["event_type"], k=1.5)
    return out.select(
        "event_type",
        F.round("lo_fence", 6).alias("lo_fence"),
        F.round("hi_fence", 6).alias("hi_fence"),
        "n_rows",
        "n_outliers",
        F.round("outlier_frac", 6).alias("outlier_frac"),
    ).orderBy("event_type")


#: JL projection of the embeddings onto the first 4 'proj' directions
#: (same md5 derivation as ``similarity_random_projection``), kept in
#: long (vec_id, label, d, v) form for the drift bins.
_DRIFT_PROJ = """
    plane_vals AS (
      SELECT j, d,
             CAST(('0x' || substr(md5('proj:' || j || ':' || d), 1, 8)) AS BIGINT)
               / 2147483648.0 - 1.0 AS w
      FROM range(4) t1(j) CROSS JOIN range(64) t2(d)
    ),
    planes AS (SELECT j, list(w ORDER BY d) AS wv FROM plane_vals GROUP BY j),
    proj AS (
      SELECT e.vec_id, e.label, CAST(p.j AS BIGINT) AS d,
             list_sum(list_transform(range(64),
                 i -> CAST(e.embedding[i+1] AS DOUBLE) * p.wv[i+1])) AS v
      FROM embeddings e CROSS JOIN planes p
    )
"""


@register(
    "profile_embedding_drift",
    oracle=f"""
    WITH {_DRIFT_PROJ},
    ref AS (SELECT d, v FROM proj WHERE label < 5),
    cur AS (SELECT d, v FROM proj WHERE label >= 5),
    stats AS (SELECT d, min(v) AS lo, max(v) AS hi FROM ref GROUP BY d),
    rbin AS (
      SELECT r.d, CASE WHEN hi = lo THEN 0
                       ELSE greatest(least(CAST(floor((v - lo) * 10 / (hi - lo))
                                                AS INT), 9), 0) END AS bin
      FROM ref r JOIN stats USING (d)
    ),
    cbin AS (
      SELECT c.d, CASE WHEN hi = lo THEN 0
                       ELSE greatest(least(CAST(floor((v - lo) * 10 / (hi - lo))
                                                AS INT), 9), 0) END AS bin
      FROM cur c JOIN stats USING (d)
    ),
    rs AS (SELECT d, bin, count(*) AS c FROM rbin GROUP BY d, bin),
    rt AS (SELECT d, CAST(count(*) AS DOUBLE) AS t FROM rbin GROUP BY d),
    rsh AS (SELECT rs.d, rs.bin, rs.c / rt.t AS share_ref
            FROM rs JOIN rt USING (d)),
    cs AS (SELECT d, bin, count(*) AS c FROM cbin GROUP BY d, bin),
    ct AS (SELECT d, CAST(count(*) AS DOUBLE) AS t FROM cbin GROUP BY d),
    csh AS (SELECT cs.d, cs.bin, cs.c / ct.t AS share_cur
            FROM cs JOIN ct USING (d)),
    grid AS (SELECT CAST(dd.d AS BIGINT) AS d, CAST(bb.bin AS INT) AS bin
             FROM range(4) dd(d) CROSS JOIN range(10) bb(bin)),
    j AS (
      SELECT g.d,
             greatest(coalesce(rsh.share_ref, 0.0), 1e-6) AS sr,
             greatest(coalesce(csh.share_cur, 0.0), 1e-6) AS sc
      FROM grid g
      LEFT JOIN rsh ON rsh.d = g.d AND rsh.bin = g.bin
      LEFT JOIN csh ON csh.d = g.d AND csh.bin = g.bin
    )
    SELECT d, round(sum((sc - sr) * ln(sc / sr)), 6) AS psi
    FROM j GROUP BY d ORDER BY d
    """,
    tags=("profiling", "drift", "embedding", "north-star"),
)
def profile_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor
    (``operators/profiling.py:embedding_drift``): PSI per JL-projected
    direction between two corpus snapshots (labels 0-4 as the
    reference encoder's output, 5-9 as the current) -- the check that
    catches an encoder swap or upstream corruption before ANN recall
    degrades.  One stats pass + one binned agg per side regardless of
    out_dim; every projected value replays bit-for-bit in the oracle
    (md5-derived matrix, sequential-fold dots)."""
    from ..io_utils import parallelize_small
    from ..operators.profiling import embedding_drift

    emb = parallelize_small(load(spark, sf_dir, "embeddings"))
    ref = emb.where(F.col("label") < 5)
    cur = emb.where(F.col("label") >= 5)
    return embedding_drift(ref, cur, out_dim=4).orderBy("d")


@register(
    "profile_numeric_correlation",
    oracle="""
    WITH base AS (
      -- (l_orderkey, l_linenumber) is NOT unique in this synthetic
      -- corpus: the rid exists only to pair each row with itself, so
      -- any unique surrogate works.
      SELECT row_number() OVER () AS rid,
             l_quantity, l_extendedprice, l_discount, l_tax
      FROM lineitem
    ),
    e AS (
      SELECT rid,
             unnest(range(4)) AS d,
             unnest([l_quantity, l_extendedprice, l_discount, l_tax]) AS x
      FROM base
    )
    SELECT CAST(a.d AS INT) AS i, CAST(b.d AS INT) AS j,
           round(corr(a.x, b.x), 6) + 0.0 AS corr
    FROM e a JOIN e b ON a.rid = b.rid
    GROUP BY a.d, b.d
    ORDER BY i, j
    """,
    tags=("profiling", "statistics"),
)
def profile_numeric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Pearson correlation MATRIX over the lineitem measures in
    one pass -- the multi-column generalization of ``value_props_corr``
    and the standard first look at a new numeric table.  Reuses the
    embedding engine's gemm covariance
    (``operators/similarity.py:embedding_covariance``) by packing the
    columns into an array: per-partition Arrow X^T X partials, a
    dim^2-keyed merge, then corr_ij = cov_ij / sqrt(cov_ii * cov_jj)
    over the 16-cell result -- one corpus pass for ALL pairs where the
    naive approach runs a corr() scan per pair.

    Columns are STANDARDIZED in-row first (a bounded scalar pre-agg
    supplies mean/std): corr is shift/scale-invariant, so this changes
    nothing statistically but removes the E[xy] - E[x]E[y]
    catastrophic cancellation that raw 10^4-magnitude prices with
    near-zero correlation would otherwise hit (observed: 3rd-decimal
    divergence from the oracle on uncentered data).  The oracle's
    corr() replays the same statistic (Pearson's (n-1) factors
    cancel)."""
    from ..operators.similarity import embedding_covariance

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li_raw = load(spark, sf_dir, "lineitem")
    stats = li_raw.select(
        *[F.avg(c).alias(f"m_{c}") for c in cols],
        *[F.stddev_pop(c).alias(f"s_{c}") for c in cols],
    ).collect()[0]
    li = li_raw.select(
        F.array(
            *[
                (F.col(c).cast("double") - F.lit(float(stats[f"m_{c}"])))
                / F.lit(float(stats[f"s_{c}"]))
                for c in cols
            ]
        ).alias("v")
    )
    cov = embedding_covariance(li, vec_col="v", dim=len(cols))
    diag = cov.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("cov").alias("var")
    )
    da = diag.select(F.col("d").alias("i"), F.col("var").alias("var_i"))
    db = diag.select(F.col("d").alias("j"), F.col("var").alias("var_j"))
    return (
        cov.join(F.broadcast(da), "i")
        .join(F.broadcast(db), "j")
        .select(
            "i",
            "j",
            F.round(
                F.col("cov") / F.sqrt(F.col("var_i") * F.col("var_j")), 6
            ).alias("corr"),
        )
        .orderBy("i", "j")
    )


@register(
    "profile_join_skew",
    oracle="""
    WITH cl AS (SELECT l_partkey AS join_key, count(*) AS n_left
                FROM lineitem GROUP BY 1),
    cr AS (SELECT p_partkey AS join_key, count(*) AS n_right
           FROM part GROUP BY 1)
    SELECT cl.join_key, cl.n_left, cr.n_right,
           cl.n_left * cr.n_right AS est_pairs
    FROM cl JOIN cr USING (join_key)
    ORDER BY est_pairs DESC, join_key
    LIMIT 20
    """,
    tags=("profiling", "join", "skew", "planning"),
)
def profile_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnostic
    (``operators/profiling.py:join_skew_report``): the 20 hottest
    lineitem-x-part join keys by exact output fan-out -- the report
    that decides broadcast vs AQE skew split vs salting before a
    fact-fact join.  The count shuffles carry one long per distinct
    key, never full rows; top-k is TakeOrdered, not a global sort."""
    from ..operators.profiling import join_skew_report

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("join_key")
    )
    pt = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("join_key")
    )
    return join_skew_report(li, pt, "join_key", k=20)


def _dd_oracle() -> str:
    import math

    from ..operators.sketch import DD_ALPHA, _dd_gamma

    gamma = _dd_gamma(DD_ALPHA)
    # Embed the PYTHON-computed ln(gamma) on both sides (the Spark plan
    # uses the same literal) so the only cross-engine libm call is
    # ln(value), whose last-ulp drift the round(.., 9) washes out.
    return f"""
    WITH b AS (
      SELECT CAST(ceil(round(ln(CAST(value AS DOUBLE)) / {math.log(gamma)!r}, 9))
                  AS BIGINT) AS idx,
             count(*) AS cnt
      FROM events WHERE value > 0 GROUP BY 1
    ),
    c AS (
      SELECT idx, cnt,
             sum(cnt) OVER (ORDER BY idx) AS cum,
             sum(cnt) OVER () AS n
      FROM b
    ),
    q AS (
      SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                            (CAST(0.99 AS DOUBLE))) t(q)
    )
    SELECT q.q,
           round(2 * power({gamma!r}, c.idx) / ({gamma!r} + 1), 6) AS estimate
    FROM c JOIN q
      ON c.cum >= floor(q.q * (c.n - 1)) + 1
     AND c.cum - c.cnt < floor(q.q * (c.n - 1)) + 1
    ORDER BY q
    """


@register(
    "sketch_dd_quantiles",
    oracle=_dd_oracle(),
    tags=("sketch", "quantile", "ddsketch"),
)
def sketch_dd_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-error quantiles of ``events.value`` from a DDSketch
    bucket table (``operators/sketch.py:ddsketch_buckets`` /
    ``ddsketch_quantiles``): p50/p90/p99 within 1% of the true order
    statistic, from one keyed aggregation whose bucket boundaries
    depend only on alpha -- the sketch that merges across shards/days
    by count addition, which ``histogram_quantiles``'s data-dependent
    min/max binning cannot do.  The oracle replays the bucket math
    exactly; accuracy vs NumPy is pinned separately in pytest."""
    from ..operators.sketch import ddsketch_buckets, ddsketch_quantiles

    ev = load(spark, sf_dir, "events")
    return ddsketch_quantiles(ddsketch_buckets(ev, "value"))


_FP_COLS = sorted([
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
])
_FP_FLOATS = {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}


def _fp_oracle() -> str:
    parts = []
    for c in _FP_COLS:
        if c in _FP_FLOATS:
            parts.append(
                f"coalesce(CAST(CAST(round(CAST({c} AS DOUBLE), 6)"
                f" AS DECIMAL(28,6)) AS VARCHAR), chr(30))"
            )
        else:
            parts.append(f"coalesce(CAST({c} AS VARCHAR), chr(30))")
    return f"""
    WITH h AS (
      SELECT md5(concat_ws(chr(31), {", ".join(parts)})) AS h FROM lineitem
    )
    SELECT count(*) AS n_rows,
           CAST(coalesce(sum(CAST(('0x' || substr(h, 1, 15)) AS BIGINT)), 0)
                % 4611686018427387904 AS BIGINT) AS checksum_sum,
           coalesce(bit_xor(CAST(('0x' || substr(h, 16, 15)) AS BIGINT)), 0)
               AS checksum_xor
    FROM h
    """


@register(
    "profile_dataset_fingerprint",
    oracle=_fp_oracle(),
    tags=("profiling", "checksum", "scale"),
)
def profile_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order/partitioning-independent content checksum of ``lineitem``
    (``operators/profiling.py:dataset_fingerprint``): the one-row
    (count, mod-2^62 sum, 60-bit XOR) fold of canonical per-row md5
    hashes -- the cross-engine replica/migration equality check that
    needs no global sort.  The oracle recomputes the identical hash
    fold in DuckDB, which IS the cross-engine portability claim."""
    from ..operators.profiling import dataset_fingerprint

    li = load(spark, sf_dir, "lineitem").select(*_FP_COLS)
    return dataset_fingerprint(li, cols=_FP_COLS)


@register(
    "incremental_join_refresh",
    oracle="""
    WITH a_old AS (SELECT * FROM orders
                   WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
    da AS (SELECT * FROM orders
           WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
    b_old AS (SELECT * FROM customer WHERE c_custkey % 10 <> 0),
    db AS (SELECT * FROM customer WHERE c_custkey % 10 = 0),
    delta AS (
      SELECT da.o_orderstatus, da.o_totalprice
      FROM da JOIN (SELECT * FROM b_old UNION ALL SELECT * FROM db) b
        ON da.o_custkey = b.c_custkey
      UNION ALL
      SELECT a_old.o_orderstatus, a_old.o_totalprice
      FROM a_old JOIN db ON a_old.o_custkey = db.c_custkey
    )
    SELECT o_orderstatus, count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS total_price
    FROM delta GROUP BY 1 ORDER BY 1
    """,
    tags=("incremental", "join", "warehouse", "scale"),
)
def incremental_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized orders-x-customer
    join (``operators/scd.py:incremental_join_delta``): 1998+ orders
    and every-10th customers arrive as insert deltas, and the query
    returns the aggregated rows the stored join view must APPEND --
    (delta-A join new-B) union (old-A join delta-B), with each base
    side semi-pruned to the delta's join keys so refresh cost tracks
    the delta, not the base.  The oracle states the same algebra
    directly; the new-minus-old multiset identity is pinned in
    pytest."""
    from ..operators.scd import incremental_join_delta

    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    delta = incremental_join_delta(
        od.where(F.col("o_orderdate") < cut).withColumnRenamed("o_custkey", "c_custkey"),
        od.where(F.col("o_orderdate") >= cut).withColumnRenamed("o_custkey", "c_custkey"),
        cu.where(F.col("c_custkey") % 10 != 0),
        cu.where(F.col("c_custkey") % 10 == 0),
        on="c_custkey",
    )
    return (
        delta.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "incremental_join_cdc_refresh",
    oracle="""
    WITH a_old AS (
      SELECT o_orderkey, o_custkey AS c_custkey, o_orderstatus, o_totalprice
      FROM orders
    ),
    a_new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 0 THEN c_custkey + 1
                  ELSE c_custkey END AS c_custkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice
      FROM a_old WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, c_custkey, o_orderstatus, o_totalprice
      FROM a_old WHERE o_orderkey % 193 = 0
    ),
    b_old AS (SELECT c_custkey, c_name FROM customer),
    b_new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 50 = 0 THEN c_name || '*'
                  ELSE c_name END AS c_name
      FROM b_old WHERE c_custkey % 101 <> 0
    ),
    old_view AS (
      SELECT a.o_orderkey, a.c_custkey, a.o_orderstatus, a.o_totalprice,
             b.c_name
      FROM a_old a JOIN b_old b USING (c_custkey)
    ),
    new_view AS (
      SELECT a.o_orderkey, a.c_custkey, a.o_orderstatus, a.o_totalprice,
             b.c_name
      FROM a_new a JOIN b_new b USING (c_custkey)
    ),
    delta AS (
      SELECT 'retract' AS action, *
      FROM (SELECT * FROM old_view EXCEPT ALL SELECT * FROM new_view)
      UNION ALL
      SELECT 'insert' AS action, *
      FROM (SELECT * FROM new_view EXCEPT ALL SELECT * FROM old_view)
    )
    SELECT action, o_orderkey, c_custkey, o_orderstatus, o_totalprice, c_name
    FROM delta
    ORDER BY action, o_orderkey, c_custkey
    """,
    tags=("incremental", "join", "cdc", "warehouse", "scale"),
)
def incremental_join_cdc_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized orders-x-customer
    join under FULL CDC (``operators/scd.py:incremental_join_cdc_delta``
    -- the retraction algebra ``incremental_join_refresh``'s
    insert-only contract refuses): every-97th order is deleted,
    every-100th surviving order is updated (price bump AND a join-key
    move to the next customer -- the case that touches two key
    groups), every-193rd is re-inserted under a new key; every-101st
    customer is deleted and every-50th renamed.  The query returns
    the retract/insert delta the stored view applies.  The engine
    computes it delta-sized -- CDC keys -> affected-join-key set ->
    semi-pruned recompute of ONLY those keys' view rows -> multiset
    diff; the oracle replays the same answer as a FULL re-join
    EXCEPT ALL diff, which is exactly the full-recompute-equality
    claim."""
    from ..operators.scd import incremental_join_cdc_delta

    a_old = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        "o_orderstatus",
        "o_totalprice",
    )
    b_old = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pk = F.col("o_orderkey")
    cdc_a = (
        a_old.where(pk % 97 == 0)
        .select("*", F.lit("delete").alias("op"))
        .unionByName(
            a_old.where((pk % 100 == 0) & (pk % 97 != 0)).select(
                "o_orderkey",
                (F.col("c_custkey") + 1).alias("c_custkey"),
                "o_orderstatus",
                (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
                F.lit("update").alias("op"),
            )
        )
        .unionByName(
            a_old.where(pk % 193 == 0).select(
                (pk + 10_000_000).alias("o_orderkey"),
                "c_custkey",
                "o_orderstatus",
                "o_totalprice",
                F.lit("insert").alias("op"),
            )
        )
    )
    ck = F.col("c_custkey")
    cdc_b = (
        b_old.where(ck % 101 == 0)
        .select("*", F.lit("delete").alias("op"))
        .unionByName(
            b_old.where((ck % 50 == 0) & (ck % 101 != 0)).select(
                "c_custkey",
                F.concat(F.col("c_name"), F.lit("*")).alias("c_name"),
                F.lit("update").alias("op"),
            )
        )
    )
    return incremental_join_cdc_delta(
        a_old, cdc_a, b_old, cdc_b,
        on="c_custkey", pk_a="o_orderkey", pk_b="c_custkey",
    ).orderBy("action", "o_orderkey", "c_custkey")


def _dd_grouped_oracle() -> str:
    import math

    from ..operators.sketch import DD_ALPHA, _dd_gamma

    gamma = _dd_gamma(DD_ALPHA)
    return f"""
    WITH b AS (
      SELECT event_type,
             CAST(ceil(round(ln(CAST(value AS DOUBLE)) / {math.log(gamma)!r}, 9))
                  AS BIGINT) AS idx,
             count(*) AS cnt
      FROM events WHERE value > 0 GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, idx, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY idx) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM b
    ),
    q AS (
      SELECT * FROM (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                            (CAST(0.99 AS DOUBLE))) t(q)
    )
    SELECT c.event_type, q.q,
           round(2 * power({gamma!r}, c.idx) / ({gamma!r} + 1), 6) AS estimate
    FROM c JOIN q
      ON c.cum >= floor(q.q * (c.n - 1)) + 1
     AND c.cum - c.cnt < floor(q.q * (c.n - 1)) + 1
    ORDER BY event_type, q
    """


@register(
    "sketch_dd_quantiles_grouped",
    oracle=_dd_grouped_oracle(),
    tags=("sketch", "quantile", "ddsketch", "grouped"),
)
def sketch_dd_quantiles_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90/p99 from grouped DDSketch buckets
    (``operators/sketch.py:ddsketch_buckets_grouped`` /
    ``ddsketch_quantiles_grouped``) -- every group's sketch built in
    ONE keyed aggregation and walked under a group-partitioned window,
    the "p99 per tenant" query that would otherwise be a per-group
    approx_percentile loop.  Same alpha relative-error guarantee per
    group; the oracle replays the grouped bucket math exactly."""
    from ..operators.sketch import (
        ddsketch_buckets_grouped,
        ddsketch_quantiles_grouped,
    )

    ev = load(spark, sf_dir, "events")
    return ddsketch_quantiles_grouped(
        ddsketch_buckets_grouped(ev, ["event_type"], "value"), ["event_type"]
    )


@register(
    "quality_winsorize_values",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(CAST(value AS DOUBLE), 0.01) AS lo,
             quantile_cont(CAST(value AS DOUBLE), 0.99) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(CAST(e.value AS DOUBLE), 6) AS value,
           round(least(greatest(CAST(e.value AS DOUBLE), b.lo), b.hi), 6)
             AS value_winsorized,
           round(b.lo, 6) AS value_lo,
           round(b.hi, 6) AS value_hi
    FROM events e JOIN bounds b ON b.event_type = e.event_type
    ORDER BY e.event_id
    """,
    tags=("profiling", "quality", "winsorize", "robust"),
)
def quality_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization (``operators/profiling.py:winsorize``):
    every event's value clipped to its type's exact [p1, p99] -- the
    robust pre-scaling transform beside the IQR fence REPORT (same
    two-stage plan; the final agg becomes an in-row clamp, rows keep
    flowing).  The oracle replays bounds and clamp."""
    from ..operators.profiling import winsorize

    ev = load(spark, sf_dir, "events")
    out = winsorize(ev, "value", ["event_type"], lo=0.01, hi=0.99)
    return out.select(
        "event_id",
        "event_type",
        F.round(F.col("value").cast("double"), 6).alias("value"),
        F.round("value_winsorized", 6).alias("value_winsorized"),
        F.round("value_lo", 6).alias("value_lo"),
        F.round("value_hi", 6).alias("value_hi"),
    ).orderBy("event_id")


@register(
    "profile_key_candidates",
    oracle="""
    SELECT 'events' AS table_name, 'event_id' AS key_columns,
           count(*) AS n_rows,
           count(DISTINCT CAST(event_id AS VARCHAR)) AS n_distinct,
           count(*) - count(DISTINCT CAST(event_id AS VARCHAR)) AS dup_rows,
           count(*) = count(DISTINCT CAST(event_id AS VARCHAR)) AS is_unique
    FROM events
    UNION ALL
    SELECT 'events', 'user_id,ts',
           count(*),
           count(DISTINCT CAST(user_id AS VARCHAR) || '|' || CAST(ts AS VARCHAR)),
           count(*) - count(DISTINCT CAST(user_id AS VARCHAR) || '|' || CAST(ts AS VARCHAR)),
           count(*) = count(DISTINCT CAST(user_id AS VARCHAR) || '|' || CAST(ts AS VARCHAR))
    FROM events
    UNION ALL
    SELECT 'lineitem', 'l_orderkey,l_linenumber',
           count(*),
           count(DISTINCT CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)),
           count(*) - count(DISTINCT CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)),
           count(*) = count(DISTINCT CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR))
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'l_orderkey',
           count(*),
           count(DISTINCT CAST(l_orderkey AS VARCHAR)),
           count(*) - count(DISTINCT CAST(l_orderkey AS VARCHAR)),
           count(*) = count(DISTINCT CAST(l_orderkey AS VARCHAR))
    FROM lineitem
    UNION ALL
    SELECT 'orders', 'o_orderkey',
           count(*),
           count(DISTINCT CAST(o_orderkey AS VARCHAR)),
           count(*) - count(DISTINCT CAST(o_orderkey AS VARCHAR)),
           count(*) = count(DISTINCT CAST(o_orderkey AS VARCHAR))
    FROM orders
    ORDER BY table_name, key_columns
    """,
    tags=("profiling", "quality", "uniqueness", "constraints"),
)
def profile_key_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key uniqueness audit
    (``operators/profiling.py:key_candidate_report``): the
    merge/upsert-key verdict for five (table, column-set) candidates
    -- event_id IS unique, (user_id, ts) may collide, lineitem's
    composite key IS unique while l_orderkey alone is not, o_orderkey
    IS unique.  One exact-distinct aggregate per candidate, stacked.
    The oracle replays each count pair."""
    from ..operators.profiling import key_candidate_report

    report = key_candidate_report(
        {
            "events": (
                load(spark, sf_dir, "events"),
                [["event_id"], ["user_id", "ts"]],
            ),
            "lineitem": (
                load(spark, sf_dir, "lineitem"),
                [["l_orderkey", "l_linenumber"], ["l_orderkey"]],
            ),
            "orders": (load(spark, sf_dir, "orders"), [["o_orderkey"]]),
        }
    )
    return report.orderBy("table_name", "key_columns")


def _mi_block(table: str, x: str, y: str, label_x: str, label_y: str) -> str:
    """DuckDB replay of one ``mutual_information`` pair (joint counts
    -> marginals -> MI in nats + entropies + normalized MI)."""
    return f"""
    SELECT '{label_x}' AS col_x, '{label_y}' AS col_y,
           round(greatest(mi, 0.0), 6) + 0.0 AS mi_nats,
           round(hx, 6) + 0.0 AS h_x, round(hy, 6) + 0.0 AS h_y,
           round(CASE WHEN least(hx, hy) > 0.0
                      THEN greatest(mi, 0.0) / least(hx, hy)
                      ELSE 0.0 END, 6) AS nmi
    FROM (
      WITH j AS (
        SELECT coalesce(CAST({x} AS VARCHAR), '__null__') AS jx,
               coalesce(CAST({y} AS VARCHAR), '__null__') AS jy,
               CAST(count(*) AS DOUBLE) AS nxy
        FROM {table} GROUP BY 1, 2
      ),
      mx AS (SELECT jx, sum(nxy) AS nx FROM j GROUP BY jx),
      my AS (SELECT jy, sum(nxy) AS ny FROM j GROUP BY jy),
      tot AS (SELECT sum(nxy) AS n FROM j)
      SELECT
        (SELECT sum((j.nxy / tot.n) * ln(j.nxy * tot.n / (mx.nx * my.ny)))
         FROM j JOIN mx USING (jx) JOIN my USING (jy), tot) AS mi,
        (SELECT -sum((nx / tot.n) * ln(nx / tot.n)) FROM mx, tot) AS hx,
        (SELECT -sum((ny / tot.n) * ln(ny / tot.n)) FROM my, tot) AS hy
    )
    """


@register(
    "profile_mutual_information",
    oracle=f"""
    {_mi_block('documents', 'source', 'lang', 'source', 'lang')}
    UNION ALL
    {_mi_block(
        "(SELECT event_type, CAST(CAST(floor(value / 50.0) AS INT) AS VARCHAR)"
        " AS value_band FROM events)",
        'event_type', 'value_band', 'event_type', 'value_band')}
    ORDER BY col_x
    """,
    tags=("profiling", "information", "association"),
)
def profile_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information association profile
    (``operators/profiling.py:mutual_information``): MI in nats,
    per-column entropies, and normalized MI in [0, 1] for two
    categorical pairs -- (documents.source, documents.lang) and
    (events.event_type, 50-unit value band) -- the
    schema-relationship / label-leak discovery read.  Joint counts
    are the only corpus-sized agg; everything else derives from the
    tiny |X| x |Y| table.  The oracle replays joints, marginals,
    entropies, and the MI sum."""
    from ..operators.profiling import mutual_information

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    ev = load(spark, sf_dir, "events").withColumn(
        "value_band",
        F.floor(F.col("value") / 50.0).cast("int").cast("string"),
    )
    out = mutual_information(docs, [("source", "lang")]).unionByName(
        mutual_information(ev, [("event_type", "value_band")])
    )
    return out.orderBy("col_x")


@register(
    "profile_salt_advisor",
    oracle="""
    WITH cl AS (SELECT user_id, count(*) AS n_left FROM events
                WHERE event_type = 'click' GROUP BY 1),
    cr AS (SELECT user_id, count(*) AS n_right FROM events
           WHERE event_type = 'purchase' GROUP BY 1)
    SELECT cl.user_id, cl.n_left, cr.n_right,
           cl.n_left * cr.n_right AS est_pairs,
           CASE WHEN cl.n_left * cr.n_right > 40
                     AND cl.n_left <> 1 AND cr.n_right <> 1
                THEN CAST(ceil(CAST(cl.n_left * cr.n_right AS DOUBLE) / 40)
                          AS BIGINT) ELSE 1 END AS salt_factor,
           CASE WHEN cl.n_left * cr.n_right <= 40 THEN 'as-is'
                WHEN cl.n_left = 1 OR cr.n_right = 1 THEN 'split'
                ELSE 'salt' END AS strategy
    FROM cl JOIN cr USING (user_id)
    ORDER BY est_pairs DESC, user_id
    LIMIT 20
    """,
    tags=("profiling", "join", "skew", "planning"),
)
def profile_salt_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key mitigation plan (``operators/skew.py:salt_advisor``):
    for the 20 hottest click-x-purchase attribution-join users, the
    strategy (as-is / split / salt) and the salt width that spreads
    each key's output to a 40-pair task budget -- the planning step
    between ``profile_join_skew``'s ranking and the skew-join
    executors.  Cost is two one-long-per-key count aggs + TakeOrdered;
    the advice columns are per-row arithmetic."""
    from ..operators.skew import salt_advisor

    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    return salt_advisor(clicks, buys, "user_id", target_pairs=40, k=20)


@register(
    "profile_ks_drift",
    oracle="""
    WITH stats AS (SELECT min(CAST(value AS DOUBLE)) AS lo,
                          max(CAST(value AS DOUBLE)) AS hi
                   FROM events
                   WHERE value IS NOT NULL AND event_type IS NOT NULL),
    b AS (SELECT event_type AS grp,
                 CASE WHEN s.hi = s.lo THEN 0
                      ELSE greatest(least(CAST(floor(
                               (CAST(value AS DOUBLE) - s.lo) * 100
                               / (s.hi - s.lo)) AS INT), 99), 0) END AS bin
          FROM events, stats s
          WHERE value IS NOT NULL AND event_type IS NOT NULL),
    counts AS (SELECT grp, bin, count(*) AS n FROM b GROUP BY grp, bin),
    totals AS (SELECT grp, sum(n) AS n_g FROM counts GROUP BY grp),
    grand AS (SELECT sum(n_g) AS n_all FROM totals),
    grid AS (SELECT t.grp, t.n_g, r.bin
             FROM totals t CROSS JOIN range(100) r(bin)),
    cells AS (SELECT g.grp, g.bin, g.n_g, coalesce(c.n, 0) AS n
              FROM grid g LEFT JOIN counts c
                ON c.grp = g.grp AND c.bin = g.bin),
    cum AS (SELECT grp, bin, n_g,
                   sum(n) OVER (PARTITION BY grp ORDER BY bin) AS cum_g
            FROM cells),
    allcum AS (SELECT bin, sum(n_b) OVER (ORDER BY bin) AS cum_all
               FROM (SELECT bin, sum(n) AS n_b FROM cells GROUP BY bin))
    SELECT c.grp AS event_type, CAST(max(c.n_g) AS BIGINT) AS n,
           round(max(abs(CAST(cum_g AS BIGINT) / CAST(n_g AS BIGINT)
                 - CAST(cum_all - cum_g AS BIGINT)
                   / CAST(n_all - n_g AS BIGINT))), 6) AS ks_stat
    FROM cum c JOIN allcum a USING (bin) CROSS JOIN grand
    WHERE n_all > n_g
    GROUP BY c.grp
    ORDER BY event_type
    """,
    tags=("profiling", "drift", "ks", "nonparametric"),
)
def profile_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS audit
    (``operators/profiling.py:ks_drift_report``): for every event type,
    the Kolmogorov-Smirnov distance between its value distribution and
    the rest of the corpus -- the nonparametric 'which group looks
    different' read; a sup over the CDF, so a concentrated shift shows
    at full strength where PSI's per-bin log-ratio dilutes it.  One
    (group, bin) hash agg is the only corpus-sized step; the statistic
    itself lives on groups x 100 cumulative rows."""
    from ..operators.profiling import ks_drift_report

    ev = load(spark, sf_dir, "events")
    return ks_drift_report(ev, "value", "event_type", n_bins=100)


@register(
    "sketch_cms_join_size",
    oracle="""
    WITH ca AS (SELECT user_id, count(*) AS n FROM events
                WHERE event_type = 'click' GROUP BY user_id),
    cb AS (SELECT user_id, count(*) AS n FROM events
           WHERE event_type = 'purchase' GROUP BY user_id),
    rows_ AS (SELECT unnest(range(4)) AS row_id),
    sa AS (SELECT row_id,
                  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                        || '#' || row_id), 1, 8)) AS BIGINT) % 1024 AS bucket,
                  sum(n) AS c
           FROM ca CROSS JOIN rows_ GROUP BY 1, 2),
    sb AS (SELECT row_id,
                  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                        || '#' || row_id), 1, 8)) AS BIGINT) % 1024 AS bucket,
                  sum(n) AS c
           FROM cb CROSS JOIN rows_ GROUP BY 1, 2),
    ip AS (SELECT sa.row_id, sum(sa.c * sb.c) AS ip
           FROM sa JOIN sb ON sa.row_id = sb.row_id AND sa.bucket = sb.bucket
           GROUP BY sa.row_id),
    exact AS (SELECT coalesce(sum(ca.n * cb.n), 0) AS exact_pairs
              FROM ca JOIN cb USING (user_id))
    SELECT CAST(exact_pairs AS BIGINT) AS exact_pairs,
           CAST(coalesce((SELECT min(ip) FROM ip), 0) AS BIGINT) AS est_pairs
    FROM exact
    """,
    tags=("sketch", "count-min", "join", "planning"),
)
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation by CMS inner product
    (``operators/sketch.py:cms_join_size``): the click-x-purchase
    attribution join's exact output size next to the sketch estimate
    (min over rows of the cell-wise inner product -- Cormode &
    Muthukrishnan's a^T b estimator, an upper bound by construction).
    The planning primitive that prices a fact-fact join from two
    KB-sized sketches instead of a distinct-key shuffle of both
    sides; completes the skew-planning family (`profile_join_skew`
    ranks keys, `profile_salt_advisor` picks strategies, this prices
    the TOTAL)."""
    from ..operators.sketch import cms_join_size

    ev = load(spark, sf_dir, "events")
    ca = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cb = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cms_join_size(ca, cb, key_col="user_id")
