"""Export sink with cost guard, KV sink, capture-log sink, geo
functions, inference UDF, skip-gate."""

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from pipelines_spark.functions.geo import grid_cell, haversine_km, point_in_polygon
from pipelines_spark.llm.inference import with_predictions
from pipelines_spark.plans.cost_guard import ScanTooLargeError
from pipelines_spark.sinks.export import export_csv_gzip, kv_sink
from pipelines_spark.sinks.logs import append_capture_log
from pipelines_spark.state.watermark import WatermarkStore


def test_export_csv_gzip_with_guard(spark, sf_medium, tmp_path):
    df = spark.read.parquet(f"{sf_medium}/region.parquet")
    out = str(tmp_path / "export")
    export_csv_gzip(df, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == df.count()
    big = spark.read.parquet(f"{sf_medium}/lineitem.parquet")
    with pytest.raises(ScanTooLargeError):
        export_csv_gzip(big, str(tmp_path / "never"), max_scan_bytes=1024)


def test_kv_sink_driver_store(spark):
    df = spark.createDataFrame(
        [("h3a", 1.5, "ok"), ("h3b", 0.0, "dry")], "cell string, mm double, status string"
    )
    store: dict = {}
    n = kv_sink(df, ["cell"], store=store)
    assert n == 2
    assert store["h3a"] == '{"mm": 1.5, "status": "ok"}'


def test_upload_files_to_storage_roundtrip_and_replace(spark, tmp_path):
    """K5: Hadoop-FS-URI upload — byte-identical copy, same-name
    re-upload replaces (idempotent contract). file:// here; the same
    call takes s3a:///gs:// with a configured connector."""
    from pipelines_spark.sinks.export import upload_files_to_storage

    src = tmp_path / "staging" / "report.bin"
    src.parent.mkdir()
    src.write_bytes(b"\x01\x02raw-payload\x03")
    dest = tmp_path / "bucket" / "raw" / "2024-01-01"
    uris = upload_files_to_storage(
        spark, [str(src)], f"file://{dest}"
    )
    assert uris == [f"file:{dest}/report.bin"]
    assert (dest / "report.bin").read_bytes() == b"\x01\x02raw-payload\x03"
    # idempotent replace: same filename, new content wins
    src.write_bytes(b"v2")
    upload_files_to_storage(spark, [str(src)], f"file://{dest}")
    assert (dest / "report.bin").read_bytes() == b"v2"


def test_append_capture_log_partitions(spark, tmp_path):
    path = str(tmp_path / "logs")
    append_capture_log(
        spark, path, [datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 1)], success=True
    )
    append_capture_log(
        spark, path, [datetime(2024, 1, 1, 0, 2)], success=False,
        error="timeout", recapture=True,
    )
    df = spark.read.parquet(path)
    assert df.count() == 3
    failed = df.filter(~F.col("sucesso")).collect()[0]
    assert failed["erro"] == "[recapturado]timeout"
    assert failed["data"] == "2024-01-01"


def test_capture_log_one_schema_for_all_producers(spark, tmp_path):
    """The K10 log table is written by three producers (batch
    append_capture_log, the capture stream's per-batch rows, the drift
    monitor's verdicts). They must share ONE schema — batch appends
    carry batch_id as NULL — so a plain (non-mergeSchema) read sees
    every column regardless of which file's footer Spark samples."""
    path = str(tmp_path / "logs")
    append_capture_log(spark, path, [datetime(2024, 1, 2, 0, 0)], success=True)
    # a streaming-writer-shaped row into the SAME table
    (
        spark.createDataFrame(
            [(7, True, None)], "batch_id long, sucesso boolean, erro string"
        )
        .withColumn("timestamp_captura", F.lit(datetime(2024, 1, 2, 0, 5)))
        .withColumn("data", F.date_format("timestamp_captura", "yyyy-MM-dd"))
        .write.mode("append")
        .partitionBy("data")
        .parquet(path)
    )
    df = spark.read.parquet(path)
    assert {"timestamp_captura", "sucesso", "erro", "batch_id", "data"} <= set(
        df.columns
    )
    rows = {r["batch_id"] for r in df.collect()}
    assert rows == {None, 7}


def test_haversine_and_grid(spark):
    df = spark.createDataFrame(
        [(-22.9068, -43.1729, -23.5505, -46.6333)], "la1 double, lo1 double, la2 double, lo2 double"
    )
    row = df.select(
        haversine_km("la1", "lo1", "la2", "lo2").alias("rio_sp"),
        grid_cell("la1", "lo1").alias("cell_a"),
        grid_cell("la2", "lo2").alias("cell_b"),
    ).collect()[0]
    assert 355 < row["rio_sp"] < 365  # Rio -> São Paulo ~360 km
    assert row["cell_a"] != row["cell_b"]
    # same point -> same cell
    again = df.select(grid_cell("la1", "lo1").alias("c")).collect()[0]["c"]
    assert again == row["cell_a"]


def test_point_in_polygon(spark):
    square = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    df = spark.createDataFrame(
        [(2.0, 2.0, square), (5.0, 2.0, square), (3.9999, 3.9999, square)],
        "lon double, lat double, poly array<struct<x:double,y:double>>",
    )
    out = [
        r["inside"]
        for r in df.select(
            point_in_polygon("lat", "lon", F.col("poly")).alias("inside")
        ).collect()
    ]
    assert out == [True, False, True]


def test_with_predictions_batch_inference(spark):
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "x double, y double")

    def factory():
        return lambda pdf: pdf["x"] * 10 + pdf["y"]

    out = with_predictions(df, ["x", "y"], factory)
    got = sorted(r["prediction"] for r in out.collect())
    assert got == [12.0, 34.0]


def test_skip_if_unchanged_gate(spark, tmp_path):
    store = WatermarkStore(spark, str(tmp_path / "wm"))
    assert not store.source_newer_than_target("src", "tgt")  # no source data
    store.set_table_watermark("src", ts=datetime(2024, 1, 2))
    assert store.source_newer_than_target("src", "tgt")  # never materialized
    store.set_table_watermark("tgt", ts=datetime(2024, 1, 2))
    assert not store.source_newer_than_target("src", "tgt")  # caught up
    store.set_table_watermark("src", ts=datetime(2024, 1, 3))
    assert store.source_newer_than_target("src", "tgt")
