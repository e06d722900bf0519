"""TPC-H shapes Q2, Q9, Q11, Q16, Q20 over a DERIVED ``partsupp``.

The driver corpus (TESTDATA.md) ships no ``partsupp`` table, which
left these five query shapes -- min-cost supplier, product-type
profit, important stock, parts/supplier relation, potential promotion
-- as the one uncovered relational family.  This module closes it
with a deterministic stand-in every engine can replay bit-for-bit:

* rows    = the DISTINCT (l_partkey, l_suppkey) pairs observed in
  ``lineitem`` (51,731 pairs at sf0.01 -- a real many-to-many
  part/supplier relation, shaped like the genuine table);
* ``ps_availqty``  = 1 + h1 % 9999          (h1 = first 8 md5 hex
  digits of ``partkey:suppkey`` as a BIGINT);
* ``ps_supplycost``= 100.0 + (h2 % 90000)/100.0  (h2 = next 8 hex
  digits) -- a two-decimal money value in [100.00, 999.99].

The md5-derived attributes replay exactly in DuckDB (the
``('0x' || substr(md5(..)))::BIGINT`` idiom used across this repo's
oracles, e.g. the LSH hyperplanes), so all five queries hold FULL
value oracles -- no fixture files, no rows-only rows.

Constants are adapted to the synthetic corpus exactly as
``tpch_extra_queries.py`` adapts Q8/Q13/Q21/Q22: nations are
``NATION_0..24``, ``p_type`` has six plain values, ``p_name`` is
``<color> <noun>``, supplier carries no comment column (Q16's
"Customer Complaints" exclusion becomes ``s_acctbal < 0`` -- same
anti-join-against-a-supplier-subquery shape).

Float discipline per catalog policy: money products/sums in exact
DECIMAL, cast to double at the end; signed aggregates rounded with
the shared ``round_half_up`` formula on BOTH engines (plain double
arithmetic -- no engine-specific round(), no -0.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load, load_tables
from ._numeric import DEC, DEC_SQL, round_half_up, round_half_up_sql
from .catalog import register

#: DuckDB replay of ``derived_partsupp`` -- prepend to every oracle.
_PARTSUPP_CTE = """
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST(CAST(('0x' || substr(d, 1, 8)) AS BIGINT) % 9999 + 1
                  AS INTEGER) AS ps_availqty,
             100.0 + CAST(CAST(('0x' || substr(d, 9, 8)) AS BIGINT) % 90000
                          AS DOUBLE) / 100.0 AS ps_supplycost
      FROM (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               md5(CAST(l_partkey AS VARCHAR) || ':'
                   || CAST(l_suppkey AS VARCHAR)) AS d
        FROM lineitem
      )
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic ``partsupp`` stand-in (module docstring).

    Scale shape: one DISTINCT over (l_partkey, l_suppkey) -- a
    map-side-combinable hash agg on the join key the consumers
    shuffle on anyway -- then narrow md5 projections.  At real scale
    the genuine table would be a dimension load instead; every query
    below touches partsupp only through this function, so swapping in
    a real table is a one-function change."""
    li = load(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    d = F.md5(
        F.concat(
            F.col("ps_partkey").cast("string"),
            F.lit(":"),
            F.col("ps_suppkey").cast("string"),
        )
    )
    h1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (h1 % 9999 + 1).cast("int").alias("ps_availqty"),
        (F.lit(100.0) + (h2 % 90000).cast("double") / 100.0).alias(
            "ps_supplycost"
        ),
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    europe AS (
      SELECT ps.ps_partkey, ps.ps_supplycost, s.s_suppkey, s.s_name,
             s.s_acctbal, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    best AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost
      FROM europe GROUP BY ps_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           e.ps_supplycost
    FROM europe e
    JOIN best b ON b.ps_partkey = e.ps_partkey
               AND e.ps_supplycost = b.min_cost
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("relational", "join", "tpch", "partsupp"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every size-15 ECONOMY part, the EUROPE
    supplier(s) offering it at the region-minimum supply cost.  The
    spec's correlated MIN subquery is decorrelated into a grouped-min
    + self-join -- the plan Catalyst cannot always reach from the
    correlated form, and the one that scales (one hash agg on
    ps_partkey, no per-row re-scan).  supplier x nation x region is a
    broadcast chain (dimension-sized); the part filter broadcasts
    into the final join.  Supply cost is a raw passthrough (no
    aggregation), so no rounding is needed."""
    t = load_tables(spark, sf_dir, "supplier", "nation", "region", "part")
    region = t["region"].where(F.col("r_name") == "EUROPE").select("r_regionkey")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            t["supplier"].s_nationkey == t["nation"].n_nationkey,
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    europe = derived_partsupp(spark, sf_dir).join(
        F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    best = europe.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    part = t["part"].where(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_name")
    return (
        europe.join(
            best,
            (europe.ps_partkey == best.ps_partkey)
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .drop(best.ps_partkey)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "ps_supplycost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT nation, o_year,
           {round_half_up_sql("CAST(sum(amount) AS DOUBLE)", 2)} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS {DEC_SQL})
               * (1 - CAST(l.l_discount AS {DEC_SQL}))
               - CAST(ps.ps_supplycost AS {DEC_SQL})
                 * CAST(l.l_quantity AS {DEC_SQL}) AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                      AND ps.ps_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE 'red %'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("relational", "join", "tpch", "partsupp"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus supply cost) of red parts
    by supplier nation and order year.  Physical plan: the two
    data-sized joins -- lineitem x orders on orderkey and lineitem x
    partsupp on the composite (partkey, suppkey) -- shuffle; part
    (selective LIKE) and supplier x nation broadcast.  All money
    arithmetic is exact DECIMAL until the final cast, and the signed
    profit rounds through the shared half-up double formula on both
    engines (sum can be negative -- supply cost is independent of
    price here -- so engine round() would risk both midpoint drift
    and -0.0)."""
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem", "orders",
                    "nation")
    part = t["part"].where(F.col("p_name").like("red %")).select("p_partkey")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            t["supplier"].s_nationkey == t["nation"].n_nationkey,
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    ps = derived_partsupp(spark, sf_dir)
    amount = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    ) - F.col("ps_supplycost").cast(DEC) * F.col("l_quantity").cast(DEC)
    joined = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        joined.groupBy("nation", "o_year")
        .agg(round_half_up(F.sum("amount").cast("double"), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_stock",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    scoped AS (
      SELECT ps.ps_partkey,
             CAST(ps.ps_supplycost AS {DEC_SQL})
               * CAST(ps.ps_availqty AS {DEC_SQL}) AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    ),
    tot AS (SELECT CAST(sum(v) AS DOUBLE) * 0.001 AS threshold FROM scoped)
    SELECT ps_partkey,
           {round_half_up_sql("CAST(sum(v) AS DOUBLE)", 2)} AS stock_value
    FROM scoped CROSS JOIN tot
    GROUP BY ps_partkey, threshold
    HAVING CAST(sum(v) AS DOUBLE) > threshold
    ORDER BY stock_value DESC, ps_partkey
    """,
    tags=("relational", "join", "tpch", "partsupp"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value (supply cost x avail
    qty) held by NATION_3 suppliers exceeds a fraction of that
    nation's total stock value.  The spec's scalar HAVING subquery is
    one 1-row broadcast (total -> threshold) against the grouped
    sums -- two passes over a partsupp-sized frame, no correlated
    re-evaluation.  Fraction adapted to corpus scale (0.001; the
    spec's 0.0001/SF keeps ~2% of parts -- here ~1 in 5 survives,
    preserving the selective-HAVING shape).  Values exact DECIMAL
    until the final double compare/round, identically on both
    engines."""
    t = load_tables(spark, sf_dir, "supplier", "nation")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].where(F.col("n_name") == "NATION_3")
            ),
            t["supplier"].s_nationkey == t["nation"].n_nationkey,
        )
        .select("s_suppkey")
    )
    scoped = (
        derived_partsupp(spark, sf_dir)
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost").cast(DEC)
                * F.col("ps_availqty").cast(DEC)
            ).alias("v"),
        )
    )
    tot = scoped.agg(
        (F.sum("v").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("v").cast("double").alias("sv"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("sv") > F.col("threshold"))
        .select(
            "ps_partkey", round_half_up(F.col("sv"), 2).alias("stock_value")
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


@register(
    "q16_parts_supplier_relation",
    oracle=f"""
    WITH {_PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("relational", "join", "tpch", "partsupp"),
)
def q16_parts_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) for a size IN-list, excluding one brand, one type prefix,
    and a supplier denylist (the spec's 'Customer Complaints' comment
    scan becomes ``s_acctbal < 0`` -- the corpus has no comment
    column; the anti-join-against-a-supplier-subquery shape is what
    the query exercises).  Plan: part filter broadcasts into the
    partsupp scan, denylist broadcasts as a left_anti, then one
    count-distinct hash agg on the (brand, type, size) key."""
    t = load_tables(spark, sf_dir, "part", "supplier")
    part = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    denylist = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        derived_partsupp(spark, sf_dir)
        .join(
            F.broadcast(denylist),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_potential_promotion",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red %'
    ),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS {DEC_SQL})) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    qualified AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN red_parts rp ON rp.p_partkey = ps.ps_partkey
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > 0.5 * sh.qty
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN qualified q ON q.ps_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
    ORDER BY s.s_name
    """,
    tags=("relational", "join", "tpch", "partsupp"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_7 suppliers holding excess stock
    (availqty > half of what they shipped in 1996) of red parts.
    The spec's correlated 0.5*SUM subquery is decorrelated into one
    grouped lineitem agg joined back on the composite key -- the only
    data-sized shuffle; red parts and the nation-filtered supplier
    dimension broadcast.  Quantity sums run in exact DECIMAL (the
    0.5x compare sits exactly on representable halves), identically
    on both engines.  Pairs with no 1996 shipments drop out via the
    inner join -- the spec's NULL-comparison semantics."""
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem", "nation")
    red = t["part"].where(F.col("p_name").like("red %")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"))
    )
    qualified = (
        derived_partsupp(spark, sf_dir)
        .join(F.broadcast(red), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > F.lit(0.5) * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_name") == "NATION_7")),
            t["supplier"].s_nationkey == t["nation"].n_nationkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return (
        supp.join(qualified, F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
