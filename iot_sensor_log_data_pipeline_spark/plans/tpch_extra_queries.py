"""TPC-H shapes Q8, Q13, Q21, Q22 adapted to the driver corpus.

Round-2 additions (VERDICT.md next-round item 4): the four remaining
TPC-H query shapes implementable without a ``partsupp`` table
(Q2/Q9/Q11/Q16/Q20 need it -- they live in ``partsupp_queries.py``
over a deterministic derived stand-in since round 10).  Shapes follow
the public TPC-H specification; constants are adapted to the synthetic
corpus (nations are ``NATION_0..24``, ``p_type`` has six plain values,
``lineitem`` carries only ``l_shipdate``, ``customer`` has no phone):

* Q8  market share: nation filter ``NATION_1``, region ``AMERICA``,
  ``p_type='ECONOMY'``, order years 1995-1996.
* Q13 order-count distribution: the ``o_comment NOT LIKE`` filter becomes
  ``o_orderpriority <> '4-NOT SPECIFIED'`` (same left-join-with-ON-filter
  shape: the filter must NOT drop customers, only their matches).
* Q21 waiting suppliers: "receipt after commit" becomes "shipped more
  than 90 days after the order date" (lineitem-local once orders is
  joined, so the EXISTS / NOT EXISTS self-join structure is preserved).
* Q22 dormant accounts: the phone-country-code IN-list becomes a
  ``c_nationkey`` IN-list, and "never ordered" (empty here: every
  corpus customer has orders) becomes "no order since 2000-07-01".

Float discipline per catalog policy: all money sums in exact
DECIMAL(18,2), cast to double only at the end; ratios are divisions of
bit-identical doubles rounded to 6dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load_tables
from ._numeric import DEC
from .catalog import register

_Q22_NATIONS = (2, 5, 9, 12, 17, 20, 23)
_Q22_CUTOFF = "2000-07-01 00:00:00"


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("relational", "join", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join, one nation's share of regional volume
    per order-year.  Physical plan: the only shuffle join is
    lineitem⋈orders on the orderkey; part (selective p_type filter),
    supplier⋈nation(n2), and customer⋈nation(n1)⋈region (selective
    region filter) all broadcast.  The conditional sum is one
    partial+final hash aggregate over the year key."""
    t = load_tables(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "customer",
        "nation", "region",
    )
    part = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    region = t["region"].where(F.col("r_name") == "AMERICA").select("r_regionkey")
    cust_nation = (
        t["customer"]
        .join(
            F.broadcast(t["nation"]),
            t["customer"].c_nationkey == t["nation"].n_nationkey,
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            t["supplier"].s_nationkey == t["nation"].n_nationkey,
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = t["orders"].where(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    volume = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    flagged = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_nation), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        flagged.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("relational", "join", "tpch", "outer-join"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with the filter in the ON clause
    (it removes matches, never customers), per-customer order count,
    then the distribution of those counts.  Two hash aggregates; the
    join shuffles on the custkey and AQE handles the tiny second agg."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    orders = t["orders"].where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        t["customer"]
        .join(orders, t["customer"].c_custkey == orders.o_custkey, "left")
        .groupBy(t["customer"].c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late,
             o.o_orderstatus
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN flagged l1 ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE l1.late AND l1.o_orderstatus = 'F' AND n.n_name = 'NATION_7'
      AND EXISTS (SELECT 1 FROM flagged l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("relational", "join", "tpch", "semi-anti"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    multi-supplier order.  EXISTS -> left-semi self-join on lineitem,
    NOT EXISTS -> left-anti self-join against the late subset; both are
    shuffle hash joins on the orderkey with the ``suppkey <>`` residual
    predicate, so no cartesian anywhere.  The l2/l3 sides only need
    'F'-status orders (l1 forces the shared order to be 'F'), letting
    the status filter prune all three scans.

    Scale note: an equivalent per-order aggregate (n_suppliers,
    n_late_suppliers) + join is one fewer pass; this form is kept to
    exercise the semi/anti self-join pattern the catalog otherwise
    lacks, and both shuffle the same key."""
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    orders_f = t["orders"].where(F.col("o_orderstatus") == "F")
    flagged = (
        t["lineitem"]
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("late"),
        )
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_7")),
            t["supplier"].s_nationkey == t["nation"].n_nationkey,
        )
        .select("s_suppkey", "s_name")
    )
    l1 = flagged.where(F.col("late")).alias("l1")
    l2 = flagged.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = flagged.where(F.col("late")).select("l_orderkey", "l_suppkey").alias("l3")
    sole_late = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "leftanti",
        )
    )
    return (
        sole_late.join(F.broadcast(supp), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


@register(
    "q22_dormant_accounts",
    oracle=f"""
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN {_Q22_NATIONS}
    ),
    thresh AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
      FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
    FROM eligible, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = eligible.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
    tags=("relational", "join", "tpch", "subquery"),
)
def q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in a country
    set with no recent orders.  The scalar average is an exact-decimal
    sum divided as a double (bit-identical across engines, so the
    ``>`` threshold cannot flip rows), broadcast onto every eligible
    row; the NOT EXISTS is a left-anti shuffle join against the
    date-pruned orders scan."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    eligible = t["customer"].where(F.col("c_nationkey").isin(*_Q22_NATIONS))
    thresh = (
        eligible.where(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1)))
            .alias("avg_bal")
        )
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    )
    return (
        eligible.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(DEC)).cast("double"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "join_bloom_pruned_revenue",
    oracle="""
    SELECT count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
    tags=("join", "bloom", "sketch", "scale"),
)
def join_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side bloom pruning before a fact x selective-dim join
    (operators/sketch.bloom_prune_join): lineitems whose orderkey can't
    be an urgent order are dropped before the join shuffle.  Results
    are EXACT (blooms have no false negatives), so the oracle is the
    plain join -- what the sketch changes is shuffle volume, which is
    the 100 TB story (runtime row-level filtering that Spark's own
    AQE/DPP applies only in narrower cases).  128 KB filter, fp ~1%."""
    from ..operators import sketch as SK

    t = load_tables(spark, sf_dir, "lineitem", "orders")
    li, orders = t["lineitem"], t["orders"]
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    joined = SK.bloom_prune_join(
        li.select("l_orderkey", "l_extendedprice"), urgent, "l_orderkey", "o_orderkey"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_price"),
    )
