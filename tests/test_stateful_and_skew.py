"""applyInPandasWithState per-key watermark stream; salting helpers."""

from datetime import datetime

from pyspark.sql import functions as F

from pipelines_spark.operators.skew import salted_aggregate, salted_join
from pipelines_spark.streaming.stateful import track_latest_per_key


def test_track_latest_per_key_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "station string, ts timestamp, mm double"
    spark.createDataFrame(
        [
            ("st1", datetime(2024, 1, 1, 10, 0), 1.0),
            ("st1", datetime(2024, 1, 1, 10, 5), 2.5),   # newer wins
            ("st1", datetime(2024, 1, 1, 9, 0), 99.0),   # stale, ignored
            ("st2", datetime(2024, 1, 1, 8, 0), 0.5),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    latest = track_latest_per_key(stream, key_col="station", ts_col="ts", value_col="mm")
    q = (
        latest.writeStream.format("memory")
        .queryName("latest_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["key"]: r for r in spark.sql("SELECT * FROM latest_state").collect()}
    assert rows["st1"]["latest_value"] == 2.5
    assert rows["st1"]["latest_ts"] == datetime(2024, 1, 1, 10, 5)
    assert rows["st2"]["latest_value"] == 0.5


def test_salted_aggregate_matches_plain(spark, sf_medium):
    df = spark.read.parquet(f"{sf_medium}/lineitem.parquet").select(
        F.col("l_suppkey").alias("user_id"), F.col("l_quantity").alias("value")
    )
    plain = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    salted = salted_aggregate(
        df, ["user_id"], {"n": ("*", "count"), "total": ("value", "sum")}
    ).withColumn("total", F.round("total", 2))
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_join_matches_plain(spark, sf_medium):
    orders = spark.read.parquet(f"{sf_medium}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    customer = spark.read.parquet(f"{sf_medium}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(customer, ["o_custkey"]).groupBy("c_mktsegment").count()
    salted = (
        salted_join(orders, customer, ["o_custkey"], buckets=4)
        .groupBy("c_mktsegment")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
