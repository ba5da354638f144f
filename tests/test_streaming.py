"""Structured Streaming capture: dedup-within-watermark, dual
raw/staging sinks, checkpointed exactly-once-ish re-run."""

import json
import os
from datetime import datetime

from pyspark.sql import functions as F

from pipelines_spark.streaming.capture import run_capture_stream


def _write_source_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "ordem string, velocidade double, datahora timestamp"
    ).coalesce(1).write.mode("append").parquet(path)


def test_capture_stream_dedup_and_dual_sink(spark, tmp_path):
    src = str(tmp_path / "src")
    raw = str(tmp_path / "raw")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    logs = str(tmp_path / "logs")

    _write_source_batch(
        spark,
        src,
        [
            ("v1", 10.0, datetime(2024, 1, 1, 0, 0, 0)),
            ("v1", 10.0, datetime(2024, 1, 1, 0, 0, 0)),  # dup (same key+event ts)
            ("v2", 20.0, datetime(2024, 1, 1, 0, 1, 0)),
        ],
    )

    stream = (
        spark.readStream.schema("ordem string, velocidade double, datahora timestamp")
        .parquet(src)
    )
    q = run_capture_stream(
        stream,
        keys=["ordem"],
        event_ts_col="datahora",
        raw_path=raw,
        staging_path=staging,
        checkpoint_path=ckpt,
        log_path=logs,
    )
    q.awaitTermination(120)

    raw_df = spark.read.parquet(raw)
    assert raw_df.count() == 2  # dup dropped
    assert {d for d in os.listdir(raw) if d.startswith("data=")} == {"data=2024-01-01"}

    staged = spark.read.parquet(staging)
    rows = staged.collect()
    assert set(staged.columns) == {"ordem", "content", "timestamp_captura", "data", "hora"}
    payload = json.loads([r for r in rows if r["ordem"] == "v1"][0]["content"])
    assert payload["velocidade"] == "10.0"

    log_df = spark.read.parquet(logs)
    assert log_df.filter(F.col("sucesso")).count() >= 1

    # second run with a new source file: checkpoint resumes, appends
    # only the new data (exactly-once-ish), dups across batches are
    # dropped within the watermark.
    _write_source_batch(spark, src, [("v3", 30.0, datetime(2024, 1, 1, 0, 2, 0))])
    q2 = run_capture_stream(
        spark.readStream.schema("ordem string, velocidade double, datahora timestamp").parquet(src),
        keys=["ordem"],
        event_ts_col="datahora",
        raw_path=raw,
        staging_path=staging,
        checkpoint_path=ckpt,
        log_path=logs,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(raw).count() == 3
