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
