"""Scalar-function surface (SURVEY.md §2 Table B): string, date/time,
math, array, JSON, conditional, hash, and cast functions.

All JVM-side built-ins (``pyspark.sql.functions``) -- zero Python UDFs,
so every expression stays inside whole-stage codegen.  Cross-engine
footguns handled per expression: day-of-week base (Spark Sunday=1 vs
DuckDB Sunday=0), date vs timestamp pandas rendering (dates emitted as
strings), double->int cast rounding (avoided; floor/ceil used instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load
from .catalog import register


@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           p_name,
           upper(p_name) AS name_upper,
           concat_ws('|', p_brand, p_type) AS brand_type,
           substring(p_name, 1, 5) AS name_prefix,
           length(p_name) AS name_len,
           replace(p_name, ' ', '_') AS name_snake,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           len(string_split(p_name, ' ')) AS n_words,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           contains(p_name, 'red') AS has_red,
           starts_with(p_type, 'ECO') AS is_economy
    FROM part
    ORDER BY p_partkey
    """,
    tags=("functions", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (concat/substr/regex/split/pad/case)."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        F.upper("p_name").alias("name_upper"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("ECO").alias("is_economy"),
    ).orderBy("p_partkey")


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           month(o_orderdate) AS mon,
           day(o_orderdate) AS dom,
           dayofweek(o_orderdate) AS dow,
           dayofyear(o_orderdate) AS doy,
           week(o_orderdate) AS iso_week,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS plus_30d,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
    tags=("functions", "date"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction + arithmetic (Table A3/A11/A15 family).
    Cross-engine bases normalized: Spark dayofweek is Sunday=1, DuckDB
    Sunday=0 -> emit Spark's value minus 1; date-typed results emitted
    as formatted strings so both engines hash identically."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mon"),
            F.dayofmonth("o_orderdate").cast("long").alias("dom"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
            F.dayofyear("o_orderdate").cast("long").alias("doy"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.date_format(
                F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("plus_30d"),
            F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
            F.datediff(
                F.lit("2002-01-01 00:00:00").cast("timestamp"), F.col("o_orderdate")
            )
            .cast("long")
            .alias("days_to_2002"),
            F.col("o_orderdate").cast("long").alias("epoch_sec"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_disc_delta,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(l_extendedprice, 1) AS price_round1,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           round(exp(l_discount), 6) AS disc_exp,
           l_linenumber % 3 AS line_mod3,
           CAST(sign(l_quantity - 25) AS BIGINT) AS qty_sign,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           round(sin(l_discount), 6) AS disc_sin
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("functions", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (Table A22's floor-bucket family and beyond).
    double->int casts avoided (Spark truncates, DuckDB rounds); floor/
    ceil make the rounding rule explicit."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
            F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
            F.floor("l_extendedprice").cast("long").alias("price_floor"),
            F.round("l_extendedprice", 1).alias("price_round1"),
            F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
            (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
            F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
            F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
            F.round(F.exp("l_discount"), 6).alias("disc_exp"),
            (F.col("l_linenumber") % 3).alias("line_mod3"),
            F.signum(F.col("l_quantity") - 25).cast("long").alias("qty_sign"),
            F.greatest("l_tax", "l_discount").alias("max_rate"),
            F.least("l_tax", "l_discount").alias("min_rate"),
            F.round(F.sin("l_discount"), 6).alias("disc_sin"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_elem,
           list_max(embedding) AS max_elem,
           list_min(embedding) AS min_elem,
           len(embedding[1:8]) AS slice_len,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) + 0.0
               AS elem_sum,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("functions", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/lambda battery over the embedding column: size/index/slice,
    higher-order transform/filter/aggregate -- all JVM-side (Catalyst
    HigherOrderFunctions), the base layer of the similarity operators."""
    emb = load(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.array_max("embedding").alias("max_elem"),
        F.array_min("embedding").alias("min_elem"),
        F.size(F.slice("embedding", 1, 8)).cast("long").alias("slice_len"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + xd(x)), 6
        ).alias("elem_sum"),
        F.round(
            F.sqrt(
                F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + xd(x) * xd(x))
            ),
            6,
        ).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    ).orderBy("vec_id")


@register(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(props ->> '$.k' AS BIGINT) AS k_long,
           props ->> '$.k' AS k_str,
           json_valid(props) AS is_valid,
           CAST(json_extract(props, '$.missing') IS NULL AS BOOLEAN) AS missing_is_null
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    tags=("functions", "json"),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode battery over ``events.props`` (Table A5 inverse +
    Table B json row): path extraction via get_json_object and typed
    decode via from_json with an explicit schema."""
    from ..schemas import EVENT_PROPS

    events = load(spark, sf_dir, "events")
    return (
        events.where(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.from_json("props", EVENT_PROPS).getField("k").alias("k_long"),
            F.get_json_object("props", "$.k").alias("k_str"),
            F.from_json("props", EVENT_PROPS).isNotNull().alias("is_valid"),
            F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        )
        .orderBy("event_id")
    )


@register(
    "conditional_functions",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS balance_tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
           CASE WHEN c_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS nation_parity
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("functions", "conditional"),
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: when/otherwise chains, coalesce, nullif."""
    cust = load(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
        .alias("balance_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias(
            "nation_parity"
        ),
    ).orderBy("c_custkey")


@register(
    "hash_functions",
    oracle="""
    SELECT s_suppkey,
           md5(s_name) AS name_md5,
           sha256(s_name) AS name_sha256
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("functions", "hash"),
)
def hash_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content hashes -- the substrate of the dedup and
    fingerprint operators (md5/sha2 agree byte-for-byte across engines,
    unlike engine-native hash())."""
    supp = load(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.md5(F.col("s_name").cast("binary")).alias("name_md5"),
        F.sha2(F.col("s_name").cast("binary"), 256).alias("name_sha256"),
    ).orderBy("s_suppkey")


@register(
    "map_functions",
    oracle="""
    SELECT user_id,
           count(DISTINCT event_type) AS n_types,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
                AS BIGINT) AS n_purchases,
           CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0)
                AS BIGINT) AS n_errors
    FROM events
    WHERE user_id < 30
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("functions", "map"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type battery: build a per-user event_type->count map
    (map_from_entries over collected structs), then read it back with
    size/map_keys/element_at.  Output is scalar-typed only (keys are
    joined to one string): external verifiers hash/sort result frames,
    and top-level array/map cells are unhashable there; the map itself
    is the intermediate."""
    events = load(spark, sf_dir, "events").where(F.col("user_id") < 30)
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("event_type"), F.col("cnt")))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("types"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("n_purchases"),
        F.coalesce(F.element_at("m", "error"), F.lit(0)).alias("n_errors"),
    ).orderBy("user_id")


@register(
    "variant_functions",
    oracle="""
    SELECT event_id,
           CAST(props ->> '$.k' AS BIGINT) AS k_big,
           CAST(props ->> '$.k' AS VARCHAR) AS k_str,
           CAST(NULL AS BIGINT) AS missing,
           'OBJECT<k: BIGINT>' AS vschema
    FROM events
    ORDER BY event_id
    """,
    tags=("functions", "json", "variant"),
)
def variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface over ``events.props``: parse_json into
    the binary variant encoding once, then typed path extraction
    (variant_get), null-on-miss extraction (try_variant_get), and
    per-row schema introspection (schema_of_variant).  At scale this
    is the semi-structured fast path: the variant is parsed once and
    stored/pruned columnar, vs get_json_object re-parsing the string
    per extraction."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_big"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.nope", "bigint").alias("missing"),
        F.schema_of_variant(v).alias("vschema"),
    ).orderBy("event_id")
