"""End-to-end lakehouse integration: the round-3 pieces composed the
way a production pipeline would run them —

  file stream → exactly-once foreachBatch snapshot sink
             → incremental rollup maintenance
             → partial small-file compaction
             → change-feed consumer

Each piece has its own unit tests; this test pins that they COMPOSE:
the txn sink's replayed epoch must not double the rollup, compaction
must not replay through the change feed or break the rollup
watermark, and the final table/rollup/feed must all agree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelines_spark.sinks.snapshots import (
    compact_small_files,
    current_version,
    snapshot_changes,
    snapshot_foreach_batch,
    snapshot_read,
)
from pipelines_spark.state.rollup import run_incremental_rollup


def _stream_once(spark, src, table, ckpt, app="lakehouse_app"):
    q = (
        spark.readStream.schema("user_id BIGINT, amount BIGINT")
        .json(str(src))
        .writeStream.foreachBatch(snapshot_foreach_batch(table, app))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_lakehouse_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    table = str(tmp_path / "tbl")
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: two users
    (src / "a.json").write_text(
        '{"user_id": 1, "amount": 10}\n{"user_id": 2, "amount": 5}\n'
    )
    _stream_once(spark, src, table, ckpt)

    out = run_incremental_rollup(
        spark, table, rollup,
        keys=["user_id"], measures={"total": ("sum", "amount"), "n": ("count", "amount")},
    )
    assert out["action"] in ("bootstrap", "merge", "rebuild", "init") or out["rows_delta"] >= 0

    # epoch replay: same batch id re-applied -> sink skips, rollup noop
    v = current_version(spark, table)
    sink = snapshot_foreach_batch(table, "lakehouse_app")
    sink(spark.createDataFrame([(1, 10), (2, 5)], "user_id BIGINT, amount BIGINT"), 0)
    assert current_version(spark, table) == v
    again = run_incremental_rollup(
        spark, table, rollup,
        keys=["user_id"], measures={"total": ("sum", "amount"), "n": ("count", "amount")},
    )
    assert again["action"] == "noop"

    # batch 1: more data for user 1 + a new user
    (src / "b.json").write_text(
        '{"user_id": 1, "amount": 7}\n{"user_id": 3, "amount": 2}\n'
    )
    _stream_once(spark, src, table, ckpt)
    run_incremental_rollup(
        spark, table, rollup,
        keys=["user_id"], measures={"total": ("sum", "amount"), "n": ("count", "amount")},
    )

    # maintenance: merge the tiny streaming files; rollup must treat
    # the compact commit as an empty delta, feed must skip it
    pre_feed_version = current_version(spark, table)
    comp = compact_small_files(spark, table, small_file_mb=64, target_files=1)
    assert comp["files_rewritten"] >= 2
    after_compact = run_incremental_rollup(
        spark, table, rollup,
        keys=["user_id"], measures={"total": ("sum", "amount"), "n": ("count", "amount")},
    )
    assert after_compact["rows_delta"] == 0
    assert snapshot_changes(spark, table, since_version=pre_feed_version).count() == 0

    # final agreement: table, rollup, and a from-scratch aggregate
    expected = {(1, 17, 2), (2, 5, 1), (3, 2, 1)}
    got_rollup = {
        (r["user_id"], r["total"], r["n"])
        for r in snapshot_read(spark, rollup).collect()
    }
    assert got_rollup == expected
    direct = {
        (r["user_id"], r["total"], r["n"])
        for r in snapshot_read(spark, table)
        .groupBy("user_id")
        .agg(F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert direct == expected
    assert snapshot_read(spark, table).count() == 4
