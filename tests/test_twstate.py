from __future__ import annotations

import json
import time

import pytest

from pipelines_spark.streaming.twstate import stale_key_alerts, stale_key_alerts_gst

SCHEMA = "station string, ts timestamp"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture()
def rocksdb_state(spark):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    yield spark
    if prev is None:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def _write_batch(src_dir, name, rows):
    src_dir.mkdir(parents=True, exist_ok=True)
    with open(src_dir / f"{name}.json", "w") as fh:
        for station, ts in rows:
            fh.write(json.dumps({"station": station, "ts": ts}) + "\n")


@pytest.mark.parametrize("impl", ["gst", "tws"])
def test_stale_key_timer_fires_only_for_silent_key(rocksdb_state, tmp_path, impl):
    """A and B report; later only A keeps reporting. When the
    watermark passes B's last_seen + timeout, exactly one alert for B
    fires — A's timer was re-armed and stays quiet."""
    spark = rocksdb_state
    if impl == "tws":
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            pytest.skip("protobuf not installed - transformWithState gated")
    fn = stale_key_alerts_gst if impl == "gst" else stale_key_alerts
    src = tmp_path / "feed"
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        alerts = fn(
            stream, key_col="station", ts_col="ts", timeout="10 minutes"
        )
        q = (
            alerts.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        time.sleep(0.2)

    # batch 1: both stations healthy at 12:00/12:01
    _write_batch(src, "b1", [
        ("A", "2024-03-01 12:00:00"), ("B", "2024-03-01 12:01:00"),
        ("A", "2024-03-01 12:02:00"),
    ])
    run_once()
    # batch 2: only A reports at 12:30 -> watermark will advance past
    # B's 12:01+10min timer on the NEXT batch
    _write_batch(src, "b2", [("A", "2024-03-01 12:30:00")])
    run_once()
    # batch 3: one more A event carries the advanced watermark in
    _write_batch(src, "b3", [("A", "2024-03-01 12:31:00")])
    run_once()

    rows = spark.read.parquet(out).collect()
    by_key = {r["key"]: r for r in rows}
    assert "B" in by_key, f"expected a B alert, got {rows}"
    b = by_key["B"]
    assert b["last_seen_ms"] == 1709294460000  # 2024-03-01 12:01:00 UTC
    assert b["expired_at_ms"] == b["last_seen_ms"] + 600_000
    assert b["n_events"] == 1
    # A kept reporting: its timer was re-armed each time, no alert
    # until its own silence exceeds the timeout
    if "A" in by_key:
        assert by_key["A"]["last_seen_ms"] >= 1709296200000  # >= 12:30


def test_tws_gate_raises_cleanly_without_protobuf(spark, tmp_path):
    try:
        from google.protobuf import descriptor  # noqa: F401
        pytest.skip("protobuf installed - gate inactive")
    except ImportError:
        pass
    stream = spark.readStream.schema(SCHEMA).json(str(tmp_path))
    with pytest.raises(NotImplementedError, match="protobuf"):
        stale_key_alerts(stream, key_col="station", ts_col="ts")
