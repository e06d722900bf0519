"""Advanced relational surface: subqueries (scalar, correlated,
EXISTS/IN) and the Python UDF surface (pandas scalar UDF, grouped-map
applyInPandas, grouped-agg pandas UDF).

UDF stance (SURVEY.md §2 Table B "UDF surface"): the reference has no
UDFs; these exist to prove the engine's extension points.  All three
are Arrow-vectorized -- row-at-a-time Python UDFs are banned from this
codebase -- and each one's semantics are chosen to be SQL-expressible
so the DuckDB oracle still applies.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io_utils import load, parallelize_small
from .catalog import register


@register(
    "subquery_scalar_avg",
    oracle="""
    SELECT p_brand,
           count(*) AS n_above_avg,
           round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price_above
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("advanced", "subquery"),
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: Catalyst evaluates the inner
    aggregate once and broadcasts the scalar into the filter."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand,
               count(*) AS n_above_avg,
               round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price_above
        FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


@register(
    "subquery_exists_bigorder",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("advanced", "subquery", "exists"),
)
def subquery_exists_bigorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS: Catalyst decorrelates both into
    left-semi and left-anti joins -- no per-row subquery execution."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@register(
    "subquery_correlated_q17",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_weekly_spend,
           count(*) AS n_small_lots
    FROM lineitem l1
    WHERE l1.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l1.l_partkey
    )
    """,
    tags=("advanced", "subquery", "tpch"),
)
def subquery_correlated_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate subquery -- Catalyst
    rewrites it to a per-partkey aggregate joined back to the fact (one
    shuffle on partkey), not a nested loop."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_weekly_spend,
               count(*) AS n_small_lots
        FROM lineitem l1
        WHERE l1.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey
        )
        """
    )


@register(
    "udf_pandas_scalar_bucket",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice / 50000) AS BIGINT) AS price_bucket,
           round(o_totalprice / 1000.0, 6) AS price_k
    FROM orders
    WHERE o_orderkey < 3000
    ORDER BY o_orderkey
    """,
    tags=("advanced", "udf", "pandas"),
)
def udf_pandas_scalar_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized): NumPy bucket math over
    whole column batches.  Exists to prove the extension point -- the
    identical logic as built-ins would stay in codegen (and the oracle
    is exactly that built-in formulation)."""

    @F.pandas_udf(T.LongType())
    def bucket(price: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.floor(price.to_numpy() / 50000).astype("int64"))

    @F.pandas_udf(T.DoubleType())
    def price_k(price: pd.Series) -> pd.Series:
        return (price / 1000.0).round(6)

    orders = parallelize_small(load(spark, sf_dir, "orders"))
    return (
        orders.where(F.col("o_orderkey") < 3000)
        .select(
            "o_orderkey",
            bucket("o_totalprice").alias("price_bucket"),
            price_k("o_totalprice").alias("price_k"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 6) + 0.0 AS zscore
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id)
    ORDER BY event_id
    """,
    tags=("advanced", "udf", "applyInPandas"),
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: whole group in as a pandas frame,
    arbitrary Python per group, frame out.  The workhorse for custom
    per-entity logic Spark can't express; here per-user z-scores
    (deliberately window-expressible so the oracle checks it).  Scale:
    one shuffle on user_id; each group must fit one executor's memory
    -- fine for per-user/device groups, the documented contract."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)  # == stddev_samp
        mean = pdf["value"].mean()
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "zscore": ((pdf["value"] - mean) / std).round(6)}
        )

    events = load(spark, sf_dir, "events").where(F.col("user_id") < 20)
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, schema)
        .orderBy("event_id")
    )


@register(
    "udf_grouped_agg_weighted",
    oracle="""
    SELECT event_type,
           round(sum(value * CAST(props ->> '$.k' AS DOUBLE))
                 / sum(CAST(props ->> '$.k' AS DOUBLE)), 6) AS weighted_avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("advanced", "udf", "grouped-agg"),
)
def udf_grouped_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF surface): weighted mean per
    group computed in NumPy.  Sum order inside a group is pandas's;
    rounding absorbs the 1-ulp drift vs the oracle's sum."""

    @F.pandas_udf(T.DoubleType())
    def weighted_avg(value: pd.Series, weight: pd.Series) -> float:
        return float((value * weight).sum() / weight.sum())

    events = parallelize_small(load(spark, sf_dir, "events"))
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        events.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(F.round(weighted_avg("value", "k"), 6).alias("weighted_avg_value"))
        .orderBy("event_type")
    )


@register(
    "udtf_tokenize_lateral",
    oracle="""
    SELECT doc_id, u.pos AS pos, u.token AS token FROM (
      SELECT doc_id,
             unnest(list_transform(toks,
               (x, i) -> {'pos': CAST(i - 1 AS BIGINT), 'token': x})) AS u
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, ' +'), x -> x <> '') AS toks
            FROM documents WHERE doc_id < 50)
    )
    ORDER BY doc_id, pos
    """,
    tags=("advanced", "udtf"),
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface: a tokenizer emitting one
    (pos, token) row per token, applied via SQL LATERAL join -- the
    full UDTF row of SURVEY §2's UDF table (the JVM-side equivalent is
    posexplode, used everywhere else; this proves the extension point).
    Row-based Python execution, so the catalog keeps it on a small
    deliberate slice."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(text.split()):
                yield (i, t)

    spark.udtf.register("engine_tokenize", Tokenize)
    load(spark, sf_dir, "documents").where(F.col("doc_id") < 50).createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        """
        SELECT doc_id, pos, token
        FROM udtf_docs, LATERAL engine_tokenize(text)
        ORDER BY doc_id, pos
        """
    )


@register(
    "udf_arrow_map_batches",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("advanced", "udf", "mapInArrow"),
)
def udf_arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy end of the Python UDF surface --
    each task hands whole Arrow ``RecordBatch``es to Python and takes
    Arrow back, with NO pandas materialization in between (the pandas
    UDF variants pay an Arrow->pandas->Arrow conversion per batch;
    object-dtype string columns make that conversion the dominant cost
    on text tables).  Here per-document UTF-8 byte length and
    whitespace-token counts come from ``pyarrow.compute`` kernels
    (C++, SIMD) applied batch-at-a-time.

    Both engines run RE2, so ``count_substring_regex(text, '\\S+')``
    and DuckDB's ``regexp_extract_all`` agree exactly (verified on
    multi-byte + tab/newline edge cases).  Scale shape: a pure map --
    no shuffle, batches stream through Python workers one Arrow IPC
    frame at a time, memory bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
    input size."""

    def batch_stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    pc.cast(b.column("doc_id"), pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
                ],
                ["doc_id", "n_bytes", "n_tokens"],
            )

    docs = parallelize_small(load(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", "text")
        .mapInArrow(batch_stats, "doc_id bigint, n_bytes bigint, n_tokens bigint")
        .orderBy("doc_id")
    )
