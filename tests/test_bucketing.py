"""Bucketed tables: co-located joins and aggregations run without a
shuffle — the plan-level proof of the pre-partitioning strategy."""

import contextlib
import io

import pytest

from pyspark.sql import functions as F

from pipelines_spark.sinks.partitioned import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    write_bucketed_table(orders, "orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = _plan_text(joined)
        assert "Exchange" not in plan  # bucket layout satisfies the join
        # and results are correct
        n = joined.count()
        want = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .join(
                spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    agg = spark.table("lineitem_b").groupBy("o_orderkey").agg(F.sum("l_quantity"))
    assert "Exchange" not in _plan_text(agg)
