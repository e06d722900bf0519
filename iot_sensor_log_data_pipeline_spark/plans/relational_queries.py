"""Relational surface (SURVEY.md §2 Table B): joins of every flavor,
full aggregate set, rollup/cube/grouping-sets, set ops, top-k, pivot,
sessionization -- over the TPC-H-ish corpus.

Every query is a declarative DataFrame/SQL plan: Catalyst gets filter
pushdown, column pruning and join selection; dimension joins broadcast
explicitly (``F.broadcast``); fact-fact joins shuffle on their keys and
are AQE-managed.  Float outputs are rounded per catalog policy
(sums -> 2dp, ratios/avgs -> 6dp) identically in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io_utils import load, load_tables
from ..operators.asof import asof_join, asof_join_forward, asof_join_nearest
from ._numeric import dec_avg
from .catalog import register


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("relational", "aggregation", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide aggregate -- 8 measures in ONE
    partial+final hash aggregate over a 4-group key (map-side combine
    does ~all the work; the shuffle moves 4 rows per task at any SF)."""
    li = load(spark, sf_dir, "lineitem")
    ext_d = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_d = F.col("l_discount").cast("decimal(18,2)")
    tax_d = F.col("l_tax").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = ext_d * (one - disc_d)
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price * (one + tax_d)).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "tpch", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-k.
    ``customer`` (filtered) broadcasts; orders⋈lineitem shuffles on the
    orderkey; LIMIT after ORDER BY is a TakeOrderedAndProject (no global
    sort materialization).  Deterministic tiebreak on orderkey."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].where(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    li = t["lineitem"].where(
        F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("relational", "join", "tpch"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join.  All dimensions (customer, supplier,
    nation, region) broadcast -- only orders⋈lineitem is a shuffle join,
    so the plan stays one big-table pass at any scale."""
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    asia_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    tags=("relational", "aggregation", "tpch", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate.  All three predicates
    push to the parquet reader (row-group stats pruning on l_shipdate);
    the aggregate is a single scalar -- the minimum-IO query shape."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name, n.n_name, count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) + 0.0 AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r_name, n_name
    """,
    tags=("relational", "join", "broadcast"),
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join (Table B): nation+region are tiny at ANY
    scale factor (25/5 rows) -- broadcasting them removes both shuffles;
    the plan is a single pass over customer."""
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "join_left_order_counts",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT n_orders, count(*) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    ORDER BY n_orders
    """,
    tags=("relational", "join", "outer"),
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (count(col)
    skips the nulls the outer join introduces -- the SQL-correct zero)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


@register(
    "join_semi_anti_balance",
    oracle="""
    SELECT 'with_open_order' AS cohort, count(*) AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) + 0.0 AS avg_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'without_open_order' AS cohort, count(*) AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) + 0.0 AS avg_acctbal
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    ORDER BY cohort
    """,
    tags=("relational", "join", "semi", "anti"),
)
def join_semi_anti_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (existence / non-existence) -- the
    planner turns both into broadcast hash joins with no row
    duplication, unlike an equi-join + distinct."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    open_orders = t["orders"].where(F.col("o_orderstatus") == "O").select("o_custkey")
    on = F.col("c_custkey") == F.col("o_custkey")

    def cohort(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.lit(tag).alias("cohort"),
            F.count(F.lit(1)).alias("n_customers"),
            dec_avg("c_acctbal").alias("avg_acctbal"),
        ).select("cohort", "n_customers", "avg_acctbal")

    semi = cohort(t["customer"].join(open_orders, on, "left_semi"), "with_open_order")
    anti = cohort(
        t["customer"].join(open_orders, on, "left_anti"), "without_open_order"
    )
    return semi.unionByName(anti).orderBy("cohort")


@register(
    "join_full_outer_nations",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_customers
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ),
    supp AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cust.nationkey, supp.nationkey) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    ORDER BY nationkey
    """,
    tags=("relational", "join", "outer"),
)
def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated sides with coalesced keys --
    the standard reconciliation shape (both sides pre-aggregated, so the
    join input is tiny regardless of fact-table size)."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    cust = (
        t["customer"]
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        t["supplier"]
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(supp, F.col("c_nk") == F.col("s_nk"), "full_outer")
        .select(
            F.coalesce("c_nk", "s_nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_theta_size_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('tiny', 1, 10), ('small', 11, 20), ('medium', 21, 35), ('large', 36, 50)
    )
    SELECT b.band, count(*) AS n_parts,
           round(CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
    FROM part p JOIN bands b ON p.p_size BETWEEN b.lo AND b.hi
    GROUP BY b.band
    ORDER BY band
    """,
    tags=("relational", "join", "theta"),
)
def join_theta_size_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join against an inline band dimension: Spark
    plans BroadcastNestedLoopJoin -- correct here because the broadcast
    side is 4 rows; the fact side streams through once."""
    part = load(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("tiny", 1, 10), ("small", 11, 20), ("medium", 21, 35), ("large", 36, 50)],
        "band string, lo int, hi int",
    )
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_size") >= F.col("lo")) & (F.col("p_size") <= F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dec_avg("p_retailprice").alias("avg_price"),
        )
        .orderBy("band")
    )


@register(
    "join_asof_purchase_click",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           p.ts,
           p.value,
           c.value AS last_click_value,
           c.ts AS matched_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    tags=("relational", "join", "asof"),
)
def join_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest prior event): for every purchase, the user's
    most recent click at-or-before it.  Union+window implementation
    (operators/asof.py) -- one shuffle + sort on user_id, the same cost
    shape as a sort-merge join.  Oracle uses DuckDB's native ASOF JOIN."""
    events = load(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_cols={"value": "last_click_value"},
    )
    return joined.select(
        "event_id", "user_id", "ts", "value", "last_click_value", "matched_ts"
    ).orderBy("event_id")


@register(
    "setops_user_cohorts",
    oracle="""
    SELECT 'purchasers_or_errorers' AS cohort, count(*) AS n_users FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      UNION
      SELECT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT 'purchasers_and_errorers', count(*) FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT 'purchasers_not_errorers', count(*) FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error'
    )
    ORDER BY cohort
    """,
    tags=("relational", "setops"),
)
def setops_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: union (distinct), intersect, except -- each plans
    as an aggregate / semi / anti join respectively."""
    events = load(spark, sf_dir, "events")
    purch = events.where(F.col("event_type") == "purchase").select("user_id")
    err = events.where(F.col("event_type") == "error").select("user_id")

    def tally(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.lit(tag).alias("cohort"), F.count(F.lit(1)).alias("n_users")
        ).select("cohort", "n_users")

    return (
        tally(purch.union(err).distinct(), "purchasers_or_errorers")
        .unionByName(tally(purch.intersect(err), "purchasers_and_errorers"))
        .unionByName(tally(purch.subtract(err), "purchasers_not_errorers"))
        .orderBy("cohort")
    )


@register(
    "agg_full_set",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           round(sum(o_totalprice), 2) AS sum_price,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           round(stddev_samp(o_totalprice), 6) AS stddev_price,
           round(var_samp(o_totalprice), 0) AS var_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("relational", "aggregation"),
)
def agg_full_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full aggregate battery incl. exact count-distinct (which plans as
    an expand + two-phase aggregate) and sample stddev/variance."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            dec_avg("o_totalprice").alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.round(F.stddev_samp("o_totalprice"), 6).alias("stddev_price"),
            F.round(F.var_samp("o_totalprice"), 0).alias("var_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("relational", "aggregation", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``).  The approximate production path at 100 TB is
    ``percentile_approx`` (t-digest-style sketch, mergeable map-side) --
    exposed by agg_approx (rows-only, sketches are engine-specific)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", 0.5), 6).alias("median_qty"),
            F.round(F.percentile("l_extendedprice", 0.25), 6).alias("p25_price"),
            F.round(F.percentile("l_extendedprice", 0.75), 6).alias("p75_price"),
            F.round(F.percentile("l_extendedprice", 0.95), 6).alias("p95_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_sketches",
    oracle=None,  # HLL++/GK sketches are engine-specific; rows-only check.
    tags=("relational", "aggregation", "approx"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates -- the 100 TB path: HLL++ count-distinct
    and quantile sketches are mergeable map-side, so the shuffle carries
    kilobyte sketches instead of distinct values.  No oracle: sketch
    results are engine-specific by design."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "rollup_order_status_priority",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
    """,
    tags=("relational", "aggregation", "rollup"),
)
def rollup_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; grouping() flags disambiguate the
    all-group row from genuine nulls.  Plans as a single Expand +
    aggregate -- one shuffle for all three grouping levels."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority",
            "n_orders", "sum_price",
        )
        .orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    )


@register(
    "cube_lineitem_flags",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    tags=("relational", "aggregation", "cube"),
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^n grouping combinations in one Expand+aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n")
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@register(
    "grouping_sets_part",
    oracle="""
    SELECT p_brand,
           p_type,
           CAST(grouping(p_brand) AS BIGINT) AS g_brand,
           CAST(grouping(p_type) AS BIGINT) AS g_type,
           count(*) AS n_parts,
           round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
    FROM part
    GROUP BY GROUPING SETS ((p_brand), (p_type), ())
    ORDER BY g_brand, g_type, p_brand, p_type
    """,
    tags=("relational", "aggregation", "grouping-sets", "sql"),
)
def grouping_sets_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (the engine's SQL surface
    is first-class: temp views over the same pushdown-capable scans)."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand,
               p_type,
               CAST(grouping(p_brand) AS BIGINT) AS g_brand,
               CAST(grouping(p_type) AS BIGINT) AS g_type,
               count(*) AS n_parts,
               round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
        FROM part
        GROUP BY GROUPING SETS ((p_brand), (p_type), ())
        ORDER BY g_brand, g_type, p_brand, p_type
        """
    )


@register(
    "pivot_daily_event_values",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS "day",
           round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 4) AS "click",
           round(sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END), 4) AS "error",
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS "purchase",
           round(sum(CASE WHEN event_type = 'signup' THEN value ELSE 0 END), 4) AS "signup",
           round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 4) AS "view"
    FROM events
    GROUP BY 1
    ORDER BY "day"
    """,
    tags=("relational", "pivot"),
)
def pivot_daily_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-scan job;
    mandatory at scale where a surprise high-cardinality pivot column
    would explode the schema)."""
    events = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .agg(F.sum("value"))
    )
    return pivoted.select(
        "day", *[F.round(F.coalesce(t, F.lit(0.0)), 4).alias(t) for t in types]
    ).orderBy("day")


@register(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("relational", "topk"),
)
def topk_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject --
    per-partition heaps + driver merge of k rows, NOT a global sort.
    Raw (unaggregated) doubles, so no rounding needed for the oracle."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("relational", "window", "sessionization"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap): lag + cumulative
    sum of session-start flags.  One shuffle on user_id serves both
    windows; the streaming twin is ``session_window`` (streaming layer)."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_session"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.select(
        "user_id", F.sum("new_session").over(cum).alias("session_id")
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "tpch", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking -- selective fact
    filter, broadcast dims, single fact shuffle, top-k."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    returned = t["lineitem"].where(F.col("l_returnflag") == "R")
    return (
        returned.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_volume",
    oracle="""
    SELECT o.o_orderkey,
           o.o_custkey,
           o.o_orderdate,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
    tags=("relational", "join", "tpch", "subquery"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN + grouped HAVING subquery -> planned as an
    aggregate then semi join (no row-at-a-time subquery execution)."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    li = t["lineitem"].join(big, "l_orderkey", "left_semi")
    return (
        li.join(F.broadcast(t["orders"]), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "unpivot_order_measures",
    oracle="""
    SELECT o_orderkey, measure, val
    FROM (
      SELECT o_orderkey,
             'totalprice' AS measure, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    )
    WHERE o_orderkey < 1000
    ORDER BY o_orderkey, measure
    """,
    tags=("relational", "unpivot"),
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measures -> long (measure, value) rows via
    DataFrame.unpivot -- the inverse of pivot_daily_event_values."""
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="measure",
        valueColumnName="val",
    ).orderBy("o_orderkey", "measure")


@register(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_nationkey < 3 AND cn.n_nationkey < 3
      AND sn.n_nationkey <> cn.n_nationkey
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, ship_year
    """,
    tags=("relational", "join", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between nation pairs per
    year -- two independent dimension chains (supplier-nation,
    customer-nation) hanging off one fact pass, all dims broadcast."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("sn_key") < 3)
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cn_key") < 3)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("sn_key") != F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           count(*) AS n_total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("relational", "join", "tpch", "conditional-agg"),
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counting inside an aggregate
    (shipped >90 days after order date), grouped by priority."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6)
             AS promo_revenue_pct,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY ALL
    """,
    tags=("relational", "join", "tpch"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share -- conditional decimal sums
    ratio'd in double (exact numerators, stable division)."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    ext_d = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = ext_d * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01 00:00:00").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(disc_price).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("relational", "join", "tpch", "pushdown"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    ranges across the join -- the optimizer-stressing OR predicate
    (Catalyst extracts common join keys and pushes per-side residuals)."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    j = t["lineitem"].join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("relational", "tpch", "exists"),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an inequality between the
    two relations' columns -- decorrelates to a left-semi join whose
    condition carries the cross-relation predicate."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("relational", "tpch", "subquery", "view"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: grouped revenue view + scalar max subquery over
    the SAME view (exact-decimal revenue makes the equality comparison
    engine-stable -- the classic Q15 float-equality trap avoided by
    construction)."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    revenue.createOrReplaceTempView("q15_revenue")
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        t["supplier"]
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "agg_histogram_quantiles",
    oracle="""
    WITH stats AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
             count(*) AS n
      FROM lineitem
    ),
    binned AS (
      SELECT CASE WHEN s.hi = s.lo THEN 0
                  ELSE least(CAST(floor((l.l_extendedprice - s.lo) * 128
                                        / (s.hi - s.lo)) AS INT), 127)
             END AS bin,
             s.lo, s.hi, s.n
      FROM lineitem l CROSS JOIN stats s
    ),
    cum AS (
      SELECT bin, lo, hi, n, cnt, sum(cnt) OVER (ORDER BY bin) AS cum
      FROM (SELECT bin, lo, hi, n, count(*) AS cnt
            FROM binned GROUP BY bin, lo, hi, n)
    ),
    qs AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
    SELECT qs.q,
           round(CASE WHEN c.hi = c.lo THEN c.lo
                      ELSE c.lo + (c.bin + ((qs.q * c.n) - (c.cum - c.cnt)) / c.cnt)
                             * ((c.hi - c.lo) / 128)
                 END, 6) AS estimate
    FROM cum c JOIN qs
      ON c.cum >= qs.q * c.n AND (c.cum - c.cnt) < qs.q * c.n
    ORDER BY qs.q
    """,
    tags=("aggregation", "sketch", "quantile"),
)
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram-sketch quantiles of l_extendedprice
    (``operators/sketch.py:histogram_quantiles``): mergeable bin counts
    + in-bin linear interpolation -- the deterministic, oracle-checked
    complement of the engine-specific ``approx_percentile`` sketch
    (``agg_approx_sketches``, rows-only by design)."""
    from ..operators.sketch import histogram_quantiles

    li = load(spark, sf_dir, "lineitem")
    return histogram_quantiles(li, "l_extendedprice")


#: Identical SQL text on BOTH engines (Spark 4 recursive CTE /
#: DuckDB WITH RECURSIVE): per-customer order chain walked link by
#: link.  The depth guard (< 90) stays under Spark's
#: cteRecursionLevelLimit (100); max chain length in the corpus is
#: ~25, so the guard never binds on real data.
_RECURSIVE_CHAIN_SQL = """
    WITH RECURSIVE nxt AS (
      SELECT o_orderkey, o_custkey,
             lag(o_orderkey)  OVER w AS prev_key,
             lead(o_orderkey) OVER w AS next_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    chain AS (
      SELECT o_custkey, o_orderkey, next_key, CAST(1 AS BIGINT) AS chain_pos
      FROM nxt WHERE prev_key IS NULL
      UNION ALL
      SELECT n.o_custkey, n.o_orderkey, n.next_key, c.chain_pos + 1
      FROM chain c JOIN nxt n ON n.o_orderkey = c.next_key
      WHERE c.chain_pos < 90
    )
    SELECT o_custkey, o_orderkey, chain_pos
    FROM chain
    ORDER BY o_custkey, chain_pos
"""


@register(
    "recursive_order_chain",
    oracle=_RECURSIVE_CHAIN_SQL,
    tags=("relational", "recursion", "cte", "spark4"),
)
def recursive_order_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk each customer's
    order chain link by link -- base case = the order with no
    predecessor, recursive step = one join per hop along the
    lead()-derived next pointer, depth-guarded under Spark's
    recursion limit.  The SQL text is IDENTICAL on both engines, so
    the oracle replays the recursion itself, not a window-function
    rewrite.  Executes as iterated joins of a shrinking frontier
    (per-iteration cost ~ frontier size); chain position equals the
    per-customer row_number, which is what makes the recursion
    externally checkable."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_CHAIN_SQL)


@register(
    "events_rolling_actives",
    oracle="""
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    wau AS (
      SELECT days.d,
             CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
      FROM days JOIN ud
        ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.d
    ),
    dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d)
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           round(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    ORDER BY day
    """,
    tags=("events", "analytics", "actives", "rolling"),
)
def events_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active users: per calendar day, DAU (distinct users
    that day), trailing-7-day WAU, and the DAU/WAU stickiness ratio
    -- the standard engagement dashboard over an event stream.

    Scale shape: the corpus collapses to distinct (user, day) FIRST
    (one hash agg -- the only pass over raw events), the day spine is
    day-count-sized, and the trailing window is a bounded range join
    (every user-day lands in <= 7 spine days) -- never a
    count-distinct-over-range window, which Spark cannot evaluate
    incrementally.  The spine side broadcasts."""
    ud = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    days = ud.select("d").distinct()
    wau = (
        ud.alias("u")
        .join(
            F.broadcast(days.alias("s")),
            (F.col("u.d") >= F.date_sub(F.col("s.d"), 6))
            & (F.col("u.d") <= F.col("s.d")),
        )
        .groupBy(F.col("s.d").alias("d"))
        .agg(F.countDistinct("u.user_id").cast("long").alias("wau"))
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    return (
        dau.join(wau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@register(
    "events_last_touch_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT p.purchase_id, p.user_id, p.ts, c.click_id, c.click_ts,
             row_number() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.click_ts DESC, c.click_id DESC)
               AS rn
      FROM p JOIN c
        ON c.user_id = p.user_id
       AND c.click_ts <= p.ts
       AND c.click_ts >= p.ts - INTERVAL 24 HOUR
    )
    SELECT p.purchase_id, p.user_id,
           r.click_id,
           round((epoch_us(p.ts) - epoch_us(r.click_ts)) / 1000000.0, 6)
             AS lag_seconds
    FROM p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.purchase_id = p.purchase_id
    ORDER BY p.purchase_id
    """,
    tags=("events", "analytics", "attribution", "asof"),
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase attributed to the same
    user's most recent click within a 24-hour lookback, via the
    engine's as-of join (``operators/asof.py``: union + per-key window,
    sort-merge cost shape, deterministic (ts, id) tie-break) --
    purchases with no eligible click stay unattributed (null click).
    The oracle replays the asof semantics as a ranked range join."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    att = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="click_ts",
        right_cols={"click_id": "click_id", "click_ts": "click_ts"},
        tolerance_seconds=86400,
    )
    return att.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.round(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts")))
            / 1000000.0,
            6,
        ).alias("lag_seconds"),
    ).orderBy("purchase_id")


@register(
    "customer_rfm_segments",
    oracle="""
    WITH asof_d AS (SELECT max(o_orderdate) AS anchor FROM orders),
    base AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(o_orderdate), a.anchor) AS BIGINT)
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS monetary
      FROM orders CROSS JOIN asof_d a
      GROUP BY o_custkey, a.anchor
    ),
    b AS (
      SELECT quantile_cont(CAST(recency_days AS DOUBLE), [0.25, 0.5, 0.75]) AS rb,
             quantile_cont(CAST(frequency AS DOUBLE), [0.25, 0.5, 0.75]) AS fb,
             quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mb
      FROM base
    )
    SELECT base.o_custkey AS custkey, recency_days, frequency, monetary,
           CAST(4 - len(list_filter(b.rb, x -> recency_days > x)) AS BIGINT)
             AS r_score,
           CAST(1 + len(list_filter(b.fb, x -> frequency > x)) AS BIGINT)
             AS f_score,
           CAST(1 + len(list_filter(b.mb, x -> monetary > x)) AS BIGINT)
             AS m_score
    FROM base CROSS JOIN b
    ORDER BY custkey
    """,
    tags=("relational", "analytics", "rfm", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (days since
    last order, anchored at the corpus's max order date so the query
    is reproducible), frequency (order count), monetary (total
    spend), each scored 1-4 by exact quartile boundaries (recency
    inverted: recent = high score) -- the standard CRM segmentation.
    Same scale discipline as ``corpus_length_buckets``: one grouped
    agg over orders, one 1-row quartile broadcast, in-row strict-
    greater boundary counts; no global ntile sort."""
    orders = load(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    base = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey", "anchor")
        .agg(
            F.datediff(F.max("anchor"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast("double")), 2).alias(
                "monetary"
            ),
        )
        .drop("anchor")
    )
    bounds = base.agg(
        F.percentile(F.col("recency_days").cast("double"), F.lit([0.25, 0.5, 0.75])).alias("rb"),
        F.percentile(F.col("frequency").cast("double"), F.lit([0.25, 0.5, 0.75])).alias("fb"),
        F.percentile(F.col("monetary"), F.lit([0.25, 0.5, 0.75])).alias("mb"),
    )

    def tier(val, arr):  # 1 + boundaries strictly below value
        return (
            F.lit(1)
            + F.size(F.filter(F.col(arr), lambda x: val > x))
        ).cast("long")

    return (
        base.crossJoin(F.broadcast(bounds))
        .select(
            F.col("o_custkey").alias("custkey"),
            "recency_days",
            "frequency",
            "monetary",
            (F.lit(5) - tier(F.col("recency_days"), "rb")).cast("long").alias("r_score"),
            tier(F.col("frequency"), "fb").alias("f_score"),
            tier(F.col("monetary"), "mb").alias("m_score"),
        )
        .orderBy("custkey")
    )


@register(
    "events_session_overlap",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    iv AS (
      SELECT user_id, sid, min(ts) AS s, max(ts) AS e
      FROM sess GROUP BY user_id, sid
    ),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s))
               AS overlap_us
      FROM iv a JOIN iv b
        ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    )
    SELECT user_a, user_b,
           count(*) AS n_overlaps,
           CAST(sum(overlap_us) AS BIGINT) AS overlap_us
    FROM pairs GROUP BY user_a, user_b ORDER BY user_a, user_b
    """,
    tags=("relational", "join", "interval", "sessionization"),
)
def events_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (``operators/intervals.py``): which user
    pairs had CONCURRENT sessions, how often, and for how long -- the
    co-activity analysis behind concurrency billing, fraud rings, and
    capacity modeling.  Sessions come from the engine's 30-min-gap
    sessionizer; the overlap join explodes each session to the hour
    buckets it spans and equi-joins on the bucket (never the
    cartesian theta join DuckDB happily runs at oracle scale), with
    the greatest-start bucket rule making multi-bucket overlaps emit
    exactly once."""
    from ..operators.intervals import interval_overlap_join

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_session"),
        )
        .select("user_id", "ts", F.sum("new_session").over(cum).alias("sid"))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        # Materialized once: BOTH sides of the overlap self-join read
        # the session table, and without the checkpoint each side
        # re-ran the whole sessionize subtree (events scan + exchange
        # + two windows + aggregate -- plan-audited as a doubled
        # subtree).  Sessions are one row per (user, session): far
        # smaller than events, so the checkpoint is the cheap side of
        # the trade at any scale (guide §2.4 / §5).
        .localCheckpoint(eager=False)
    )
    a = iv.select(
        F.col("user_id").alias("user_a"), F.col("s").alias("s_a"), F.col("e").alias("e_a")
    )
    b = iv.select(
        F.col("user_id").alias("user_b"), F.col("s").alias("s_b"), F.col("e").alias("e_b")
    )
    pairs = interval_overlap_join(
        a, b, "s_a", "e_a", "s_b", "e_b", bucket_seconds=3600
    ).where(F.col("user_a") < F.col("user_b"))
    overlap_us = F.unix_micros(F.least("e_a", "e_b")) - F.unix_micros(
        F.greatest("s_a", "s_b")
    )
    return (
        pairs.select("user_a", "user_b", overlap_us.alias("o"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum("o").cast("long").alias("overlap_us"),
        )
        .orderBy("user_a", "user_b")
    )


@register(
    "join_hot_key_split",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("join", "skew", "scale"),
)
def join_hot_key_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentiated skew join
    (``operators/skew.py:hot_key_split_join``): the 8 hottest event
    users take a broadcast path against just their customer rows, the
    cold rest take the normal shuffle path, and the union -- checked
    against the oracle's PLAIN join -- aggregates identically.  The
    oracle deliberately ignores the split: it is a physical routing
    decision, not a semantic one, and the equality is the point."""
    from ..operators.skew import hot_key_split_join

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").cast("bigint").alias("c_custkey"), "value"
    )
    cu = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = hot_key_split_join(ev, cu, "c_custkey", n_hot=8, how="inner")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_asof_forward_click",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.event_id, p.user_id, p.ts, p.value,
             c.value AS next_click_value, c.ts AS m_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts, c.value) AS rn
      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts >= p.ts
    )
    SELECT event_id, user_id, ts, value, next_click_value,
           m_ts AS matched_ts
    FROM j WHERE rn = 1
    ORDER BY event_id
    """,
    tags=("relational", "join", "asof", "forward"),
)
def join_asof_forward_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (``operators/asof.py:asof_join_forward``):
    for every purchase, the user's NEXT click at-or-after it -- the
    post-event-behavior direction the backward join can't express.
    Same union+window cost shape (one shuffle + sort per key), frame
    reversed to first-over-following.  The oracle replays it as a
    per-left row_number pick with the identical (ts, value)
    tie-break."""
    events = load(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join_forward(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_cols={"value": "next_click_value"},
    )
    return joined.select(
        "event_id", "user_id", "ts", "value", "next_click_value", "matched_ts"
    ).orderBy("event_id")


@register(
    "join_asof_nearest_click",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
    b AS (
      SELECT * FROM (
        SELECT p.event_id, c.ts AS b_ts, c.value AS b_val,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts DESC, c.value DESC) AS rn
        FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
      WHERE rn = 1
    ),
    f AS (
      SELECT * FROM (
        SELECT p.event_id, c.ts AS f_ts, c.value AS f_val,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts, c.value) AS rn
        FROM p JOIN c ON c.user_id = p.user_id AND c.ts > p.ts)
      WHERE rn = 1
    ),
    pick AS (
      SELECT p.event_id, p.user_id, p.ts, p.value,
             b.b_ts, b.b_val, f.f_ts, f.f_val,
             (b.b_ts IS NOT NULL AND (f.f_ts IS NULL OR
                epoch_us(p.ts) - epoch_us(b.b_ts)
                  <= epoch_us(f.f_ts) - epoch_us(p.ts))) AS use_b
      FROM p
      LEFT JOIN b ON b.event_id = p.event_id
      LEFT JOIN f ON f.event_id = p.event_id
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN use_b THEN b_val ELSE f_val END AS nearest_click_value,
           CASE WHEN use_b THEN b_ts ELSE f_ts END AS matched_ts
    FROM pick
    ORDER BY event_id
    """,
    tags=("relational", "join", "asof", "nearest"),
)
def join_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (``operators/asof.py:asof_join_nearest``):
    for every purchase, the user's closest click in either direction
    (tie -> the prior click, pandas merge_asof convention), computed
    with ONE shuffle + sort -- both directions are frames over the
    same sorted union.  The oracle replays prior pick, next pick, and
    the microsecond distance decision."""
    events = load(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join_nearest(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        right_cols={"value": "nearest_click_value"},
    )
    return joined.select(
        "event_id", "user_id", "ts", "value", "nearest_click_value", "matched_ts"
    ).orderBy("event_id")
