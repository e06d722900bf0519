"""Explicit schemas for every dataset the engine touches.

The reference has no schema system (SURVEY.md §1.3: producer = implicit
dict literal at ``sensor_publish.py:65-75``; Athena = manually declared;
OpenSearch = dynamic mapping).  The engine replaces all three with one
explicit StructType per dataset -- schema-on-write, enforced at the scan
(streaming file sources *require* it, and explicit schemas kill the
full-file inference pass that would be ruinous at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The reference's sensor record, one row per second per device
#: (``data-publish/sensor_publish.py:65-75``).  ``timestamp`` is parsed
#: from the producer's ``'%Y-%m-%d %H:%M:%S'`` string (second precision,
#: tz-naive -> session TZ pinned to UTC).  ``count`` is the producer's
#: monotonic per-session publish counter (``sensor_publish.py:47,74,83``).
SENSOR_LOG = T.StructType(
    [
        T.StructField("client_id", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("humidity", T.DoubleType(), True),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("pressure", T.DoubleType(), True),
        T.StructField("pitch", T.DoubleType(), True),
        T.StructField("roll", T.DoubleType(), True),
        T.StructField("yaw", T.DoubleType(), True),
        T.StructField("count", T.LongType(), False),
    ]
)

#: Wire format of the sensor record: the JSON the producer publishes
#: (``json.dumps`` at ``sensor_publish.py:80``) -- timestamp still a string.
SENSOR_LOG_WIRE = T.StructType(
    [
        T.StructField("client_id", T.StringType(), False),
        T.StructField("timestamp", T.StringType(), False),
        T.StructField("humidity", T.DoubleType(), True),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("pressure", T.DoubleType(), True),
        T.StructField("pitch", T.DoubleType(), True),
        T.StructField("roll", T.DoubleType(), True),
        T.StructField("yaw", T.DoubleType(), True),
        T.StructField("count", T.LongType(), False),
    ]
)

#: The producer reads orientation as a nested dict and flattens it
#: (``sensor_publish.py:59-60,71-73``); this is the pre-flatten shape the
#: projection operator (Table A2) accepts.
SENSOR_LOG_NESTED = T.StructType(
    [
        T.StructField("client_id", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("humidity", T.DoubleType(), True),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("pressure", T.DoubleType(), True),
        T.StructField(
            "orientation",
            T.StructType(
                [
                    T.StructField("pitch", T.DoubleType(), True),
                    T.StructField("roll", T.DoubleType(), True),
                    T.StructField("yaw", T.DoubleType(), True),
                ]
            ),
            True,
        ),
        T.StructField("count", T.LongType(), False),
    ]
)

#: ``%Y-%m-%d %H:%M:%S`` from ``sensor_publish.py:62-63`` in Spark syntax.
SENSOR_TS_FORMAT = "yyyy-MM-dd HH:mm:ss"

#: Driver test-corpus tables (FIXTURES.md, verified against sf0.001 parquet).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

#: Schema of the JSON inside ``events.props``.
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType(), True)])

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
