"""Watermark store: table/per-key advance, monotonicity under
re-appends, incremental filter; backfill window planner."""

from datetime import datetime, timedelta

from pipelines_spark.state.backfill import backfill_windows
from pipelines_spark.state.watermark import WatermarkStore


def test_table_watermark_roundtrip(spark, tmp_path):
    store = WatermarkStore(spark, str(tmp_path / "wm"))
    assert store.get_table_watermark("orders") == (None, None)
    store.set_table_watermark("orders", ts=datetime(2024, 1, 2), id_=10)
    ts, id_ = store.get_table_watermark("orders")
    assert (ts, id_) == (datetime(2024, 1, 2), 10)


def test_watermark_monotone_max_merge(spark, tmp_path):
    store = WatermarkStore(spark, str(tmp_path / "wm"))
    store.set_table_watermark("t", ts=datetime(2024, 1, 5))
    store.set_table_watermark("t", ts=datetime(2024, 1, 3))  # stale write
    ts, _ = store.get_table_watermark("t")
    assert ts == datetime(2024, 1, 5)  # max-merge wins


def test_per_key_advance_and_filter(spark, tmp_path, monkeypatch):
    store = WatermarkStore(spark, str(tmp_path / "wm"))
    batch1 = spark.createDataFrame(
        [("st1", datetime(2024, 1, 1, 10)), ("st2", datetime(2024, 1, 1, 11))],
        "station string, ts timestamp",
    )
    # scale contract: per-key advance must never materialize the key
    # space on the driver — the aggregate is written straight to the
    # state table (a 100 TB per-document key space would OOM a collect)
    from pyspark.sql import DataFrame

    def _no_collect(self):
        raise AssertionError("advance_from must not collect() to the driver")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    store.advance_from("readings", batch1, key_col="station", ts_col="ts")
    monkeypatch.undo()

    batch2 = spark.createDataFrame(
        [
            ("st1", datetime(2024, 1, 1, 9)),   # older than st1 watermark -> drop
            ("st1", datetime(2024, 1, 1, 12)),  # newer -> keep
            ("st3", datetime(2024, 1, 1, 8)),   # unseen key -> keep
        ],
        "station string, ts timestamp",
    )
    kept = store.filter_newer("readings", batch2, key_col="station", ts_col="ts")
    rows = {(r["station"], r["ts"]) for r in kept.collect()}
    assert rows == {("st1", datetime(2024, 1, 1, 12)), ("st3", datetime(2024, 1, 1, 8))}


def test_run_backfill_resumes_from_watermark(spark, tmp_path):
    from pipelines_spark.plans.models import ModelRunner, SqlModel
    from pipelines_spark.state.backfill import run_backfill

    spark.createDataFrame(
        [(i, datetime(2024, 1, 1 + i % 4), float(i)) for i in range(20)],
        "id long, d timestamp, v double",
    ).createOrReplaceTempView("bf_src")

    target = str(tmp_path / "bf_target")
    model = SqlModel(
        name="bf_model",
        sql="""
            SELECT date_format(d, 'yyyy-MM-dd') AS data_particao, sum(v) AS total
            FROM bf_src
            WHERE d >= timestamp '{date_range_start}'
              AND d < timestamp '{date_range_end}'
            GROUP BY 1
        """,
        materialization="incremental",
        path=target,
        partition_cols=["data_particao"],
    )
    runner = ModelRunner(spark, [model])
    store = WatermarkStore(spark, str(tmp_path / "wm"))

    n = run_backfill(
        runner, "bf_model", store,
        start=datetime(2024, 1, 1), end=datetime(2024, 1, 5),
        interval=timedelta(days=2),
    )
    assert n == 2
    assert spark.read.parquet(target).count() == 4  # 4 distinct days
    # resume: watermark is at end, nothing left to do
    n2 = run_backfill(
        runner, "bf_model", store,
        start=datetime(2024, 1, 1), end=datetime(2024, 1, 5),
        interval=timedelta(days=2),
    )
    assert n2 == 0


def test_backfill_windows():
    ws = backfill_windows(
        datetime(2024, 1, 1), datetime(2024, 1, 4), interval=timedelta(days=1)
    )
    assert len(ws) == 3
    assert ws[0] == (datetime(2024, 1, 1), datetime(2024, 1, 2))
    rev = backfill_windows(
        datetime(2024, 1, 1), datetime(2024, 1, 4), interval=timedelta(days=1), reverse=True
    )
    assert rev[0][0] == datetime(2024, 1, 3)
    # ragged tail
    ws = backfill_windows(
        datetime(2024, 1, 1), datetime(2024, 1, 2, 12), interval=timedelta(days=1)
    )
    assert ws[-1] == (datetime(2024, 1, 2), datetime(2024, 1, 2, 12))


def test_with_retries_eventually_succeeds_and_reraises():
    from pipelines_spark.retry import with_retries

    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")
        return "ok"

    assert (
        with_retries(flaky, attempts=5, delay_s=2, backoff=2, sleep=sleeps.append)
        == "ok"
    )
    assert calls["n"] == 3 and sleeps == [2, 4]

    import pytest

    calls["n"] = -100  # never recovers within 2 attempts
    with pytest.raises(RuntimeError):
        with_retries(flaky, attempts=2, delay_s=0, sleep=lambda _: None)
