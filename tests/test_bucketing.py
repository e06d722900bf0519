"""Bucketing: pre-shuffled storage so repeated joins/aggregations on
the bucket key run with NO exchange (SURVEY.md §2 'bucketing' /
pyspark_guide 'Partitioning & shuffle').  At 100 TB this is the
difference between shuffling the fact table on every join and never
shuffling it at all."""

from __future__ import annotations

import contextlib
import io

import pytest

from iot_sensor_log_data_pipeline_spark.io_utils import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("CREATE DATABASE IF NOT EXISTS bdemo")
    (
        load(spark, SF, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .format("parquet")
        .saveAsTable("bdemo.orders_b")
    )
    (
        load(spark, SF, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .format("parquet")
        .saveAsTable("bdemo.lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bdemo.orders_b")
    spark.sql("DROP TABLE IF EXISTS bdemo.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bdemo")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.sql(
            """
            SELECT o.o_orderkey, count(*) AS n
            FROM bdemo.orders_b o JOIN bdemo.lineitem_b l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey
            """
        )
        plan = _plan(joined)
        # Co-located bucketed scan: the join itself requires no shuffle;
        # SelectedBucketsCount proves bucket pruning awareness.
        assert "Exchange" not in plan, plan  # join AND agg, all shuffle-free
        assert "Bucketed: true" in plan
        # And it still returns correct results (vs the plain-table join).
        o = load(spark, SF, "orders").select("o_orderkey")
        l = load(spark, SF, "lineitem").select("l_orderkey")
        expected = (
            o.join(l, o.o_orderkey == l.l_orderkey).select("o_orderkey").distinct().count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    agg = spark.sql(
        "SELECT o_orderkey, count(*) n FROM bdemo.lineitem_b GROUP BY l_orderkey, o_orderkey"
    ) if False else spark.sql(
        "SELECT l_orderkey, count(*) AS n FROM bdemo.lineitem_b GROUP BY l_orderkey"
    )
    plan = _plan(agg)
    assert "Exchange" not in plan.split("HashAggregate")[0]
