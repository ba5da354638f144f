"""Partitioned writer semantics: Hive layout, idempotent dynamic
partition overwrite (T6), append mode, all-string staging."""

import os

from pyspark.sql import functions as F

from pipelines_spark.sinks.partitioned import to_all_string, write_partitioned


def _sample(spark, month):
    return spark.createDataFrame(
        [(1, month, 10.0), (2, month, 20.0)], "id long, mes string, v double"
    )


def test_hive_layout_and_dynamic_overwrite(spark, tmp_path):
    path = str(tmp_path / "t")
    write_partitioned(_sample(spark, "01"), path, ["mes"], mode="overwrite_partitions")
    write_partitioned(_sample(spark, "02"), path, ["mes"], mode="overwrite_partitions")
    assert sorted(d for d in os.listdir(path) if d.startswith("mes=")) == ["mes=01", "mes=02"]

    # Re-writing one partition must replace it, not duplicate it, and
    # must leave the other partition untouched (idempotent re-run).
    write_partitioned(_sample(spark, "02"), path, ["mes"], mode="overwrite_partitions")
    out = spark.read.parquet(path)
    assert out.count() == 4
    assert out.filter(F.col("mes") == "02").count() == 2


def test_append_mode(spark, tmp_path):
    path = str(tmp_path / "t")
    write_partitioned(_sample(spark, "01"), path, ["mes"], mode="append")
    write_partitioned(_sample(spark, "01"), path, ["mes"], mode="append")
    assert spark.read.parquet(path).count() == 4


def test_all_string_staging(spark):
    df = to_all_string(_sample(spark, "01"))
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)


def test_compact_partitions_merges_small_files(spark, tmp_path):
    import os

    from pipelines_spark.sinks.partitioned import compact_partitions

    path = str(tmp_path / "lake")
    # simulate a minutely capture: 6 tiny appends into one partition,
    # 1 into another
    for i in range(6):
        spark.createDataFrame([(i, "2024-01-01")], "v long, data string").coalesce(
            1
        ).write.mode("append").partitionBy("data").parquet(path)
    spark.createDataFrame([(99, "2024-01-02")], "v long, data string").coalesce(
        1
    ).write.mode("append").partitionBy("data").parquet(path)

    def parquet_files(rel):
        d = os.path.join(path, rel)
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert len(parquet_files("data=2024-01-01")) == 6
    before_other = set(parquet_files("data=2024-01-02"))

    rewritten = compact_partitions(spark, path, ["data"], min_files_to_compact=4)
    assert rewritten == {"data=2024-01-01": 6}
    assert len(parquet_files("data=2024-01-01")) == 1
    # untouched partition keeps its files
    assert set(parquet_files("data=2024-01-02")) == before_other
    # data intact
    got = spark.read.parquet(path)
    assert got.filter("data = '2024-01-01'").count() == 6
    assert sorted(r["v"] for r in got.collect()) == [0, 1, 2, 3, 4, 5, 99]
