from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from pipelines_spark.sinks.snapshots import (
    snapshot_read,
    snapshot_read_pruned,
    snapshot_write,
    snapshot_write_with_stats,
)
from pipelines_spark.sources.snapstream import SnapshotTableDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SnapshotTableDataSource)
    return spark


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "id int, v string")


def _run_stream(spark, table, out, ckpt):
    q = (
        spark.readStream.format("snapshot_table")
        .load(table)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(t) returns False on timeout with the stream
    # still running — under a fully loaded test box the availableNow
    # batch can exceed a tight bound, and a silent partial read then
    # fails the assertion downstream instead of here
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("snapshot stream did not drain in 600s")
    time.sleep(0.2)


def test_stream_replays_then_reads_only_new_commits(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "tbl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    snapshot_write(spark, table, _df(spark, [(1, "a"), (2, "b")]))
    snapshot_write(spark, table, _df(spark, [(3, "c")]))

    _run_stream(spark, table, out, ckpt)
    got = {r["id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 3}

    # two more commits; restart from checkpoint reads ONLY them
    snapshot_write(spark, table, _df(spark, [(4, "d")]))
    snapshot_write(spark, table, _df(spark, [(5, "e")]))
    _run_stream(spark, table, out, ckpt)
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3, 4, 5]  # no duplicates -> no re-read


def test_stream_overwrite_commit_streams_new_fileset(registered, tmp_path):
    spark = registered
    table = str(tmp_path / "tbl2")
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    snapshot_write(spark, table, _df(spark, [(1, "a")]))
    _run_stream(spark, table, out, ckpt)
    snapshot_write(spark, table, _df(spark, [(9, "z")]), mode="overwrite")
    _run_stream(spark, table, out, ckpt)
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 9]


def test_stats_pruning_skips_files_from_manifest(spark, tmp_path):
    table = str(tmp_path / "tbl3")
    # three commits with disjoint id ranges -> three file sets with
    # disjoint manifest stats
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 50).select(
            F.col("id").cast("int").alias("id"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ).coalesce(1)
        snapshot_write_with_stats(spark, table, df)

    pruned = snapshot_read_pruned(spark, table, col="id", lo=120, hi=130)
    assert sorted(r["id"] for r in pruned.collect()) == list(range(120, 131))
    # the scan's file list only contains the one matching file
    files = pruned.inputFiles() if hasattr(pruned, "inputFiles") else []
    assert len(files) == 1

    # unbounded side works; residual filter still applies
    lo_only = snapshot_read_pruned(spark, table, col="id", lo=205)
    assert sorted(r["id"] for r in lo_only.collect()) == list(range(205, 250))
    assert len(lo_only.inputFiles()) == 1

    # full read unchanged
    assert snapshot_read(spark, table).count() == 150


def test_stats_pruning_keeps_files_without_stats(spark, tmp_path):
    table = str(tmp_path / "tbl4")
    snapshot_write(spark, table, _df(spark, [(1, "a")]))  # no stats
    snapshot_write_with_stats(spark, table, _df(spark, [(100, "z")]))
    out = snapshot_read_pruned(spark, table, col="id", lo=0, hi=10)
    # stat-less file conservatively read; row filter still correct
    assert [r["id"] for r in out.collect()] == [1]


def test_merge_and_compaction_commit_semantics(registered, tmp_path):
    """MERGE commits one atomic version; compaction rewrites files but
    never re-streams rows through the change feed or rollups."""
    from pipelines_spark.sinks.snapshots import (
        compact_snapshot,
        snapshot_changes,
        snapshot_merge,
    )
    from pipelines_spark.state.rollup import run_incremental_rollup

    spark = registered
    table = str(tmp_path / "tblm")
    out, ckpt = str(tmp_path / "outm"), str(tmp_path / "ckptm")
    rollup = str(tmp_path / "rollm")

    snapshot_write(spark, table, _df(spark, [(1, "a"), (2, "b")]))
    _run_stream(spark, table, out, ckpt)

    # MERGE: update id=2, insert id=3 -> one new version, exact rows
    r = snapshot_merge(spark, table, _df(spark, [(2, "B"), (3, "c")]), keys=["id"])
    assert r["rows_upserted"] == 2
    assert sorted(tuple(x) for x in snapshot_read(spark, table).collect()) == [
        (1, "a"), (2, "B"), (3, "c"),
    ]

    # compaction after more appends: files shrink, rows identical
    snapshot_write(spark, table, _df(spark, [(4, "d")]))
    before = snapshot_read(spark, table)
    c = compact_snapshot(spark, table, target_files=1)
    assert c["files_after"] <= c["files_before"]
    after = snapshot_read(spark, table)
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, before.collect()))
    assert len(after.inputFiles()) == 1

    # change feed across the compact commit: no duplicate rows
    # (stream restarted AFTER merge-overwrite replays the reloaded
    # table once -- reload semantics -- but the compact version itself
    # contributes nothing)
    ch = snapshot_changes(spark, table, since_version=c["version"] - 1)
    assert ch.count() == 0

    # rollup across compact: treated as empty delta, no double count
    run_incremental_rollup(
        spark, table, rollup, keys=["v"],
        measures={"n": ("count", "id"), "id_sum": ("sum", "id")},
    )
    snapshot_write(spark, table, _df(spark, [(5, "e")]))
    compact_snapshot(spark, table, target_files=1)
    r2 = run_incremental_rollup(
        spark, table, rollup, keys=["v"],
        measures={"n": ("count", "id"), "id_sum": ("sum", "id")},
    )
    assert r2["rows_delta"] == 1  # only id=5; compact contributed 0
    got = {(r["v"], r["n"], r["id_sum"]) for r in snapshot_read(spark, rollup).collect()}
    assert got == {("a", 1, 1), ("B", 1, 2), ("c", 1, 3), ("d", 1, 4), ("e", 1, 5)}


def test_delete_where_rewrites_only_candidate_files(spark, tmp_path):
    from pipelines_spark.sinks.snapshots import (
        snapshot_changes,
        snapshot_delete_where,
    )

    table = str(tmp_path / "tbld")
    # three stats-bearing commits with disjoint id ranges
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 50).select(
            F.col("id").cast("int").alias("id"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ).coalesce(1)
        snapshot_write_with_stats(spark, table, df)

    r = snapshot_delete_where(
        spark, table, F.col("id").between(110, 120),
        prune_col="id", prune_lo=110, prune_hi=120,
    )
    # only the middle file intersects [110,120]
    assert r["files_rewritten"] == 1 and r["files_kept"] == 2
    assert r["rows_deleted"] == 11
    remaining = sorted(row["id"] for row in snapshot_read(spark, table).collect())
    written = list(range(50)) + list(range(100, 150)) + list(range(200, 250))
    assert remaining == [i for i in written if not (110 <= i <= 120)]
    # kept files carried over byte-identical (same physical paths)
    paths = snapshot_read(spark, table).inputFiles()
    assert len(paths) == 3  # 2 kept + 1 rewritten
    # the delete version contributes nothing to the change feed
    assert snapshot_changes(spark, table, since_version=r["version"] - 1).count() == 0


def test_delete_without_stats_rewrites_everything_correctly(spark, tmp_path):
    from pipelines_spark.sinks.snapshots import snapshot_delete_where

    table = str(tmp_path / "tbld2")
    snapshot_write(spark, table, _df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    r = snapshot_delete_where(spark, table, F.col("id") == 2)
    assert r["rows_deleted"] == 1 and r["files_kept"] == 0
    assert sorted(row["id"] for row in snapshot_read(spark, table).collect()) == [1, 3]


def test_delete_noop_when_pruning_excludes_all(spark, tmp_path):
    from pipelines_spark.sinks.snapshots import current_version, snapshot_delete_where

    table = str(tmp_path / "tbld3")
    df = spark.range(0, 50).select(
        F.col("id").cast("int").alias("id"), F.lit("x").alias("v")
    ).coalesce(1)
    snapshot_write_with_stats(spark, table, df)
    head = current_version(spark, table)
    r = snapshot_delete_where(
        spark, table, F.col("id").between(900, 950),
        prune_col="id", prune_lo=900, prune_hi=950,
    )
    # no candidate file -> no new version at all
    assert r["version"] == head and r["files_rewritten"] == 0
    assert current_version(spark, table) == head


def test_write_audit_publish(spark, tmp_path):
    from pipelines_spark.sinks.snapshots import (
        abandon_staged,
        current_version,
        publish_snapshot,
        snapshot_write_staged,
        staged_snapshot_read,
    )

    table = str(tmp_path / "wap")
    snapshot_write(spark, table, _df(spark, [(1, "a")]))

    # stage: readers keep seeing v1 while the stage exists
    sid = snapshot_write_staged(spark, table, _df(spark, [(2, "b"), (-5, "bad")]))
    assert current_version(spark, table) == 1
    assert sorted(r["id"] for r in snapshot_read(spark, table).collect()) == [1]
    # the audit target is the would-be table
    assert sorted(r["id"] for r in staged_snapshot_read(spark, table, sid).collect()) == [-5, 1, 2]

    # failing audit: publish refused, table untouched, stage kept
    audit = lambda df: df.filter(F.col("id") < 0).limit(1).count() == 0
    with pytest.raises(ValueError, match="audit rejected"):
        publish_snapshot(spark, table, sid, audit=audit)
    assert current_version(spark, table) == 1

    abandon_staged(spark, table, sid)
    import glob as _glob
    assert not _glob.glob(f"{table}/_log/_staged-*")

    # clean stage passes the audit and publishes atomically
    sid2 = snapshot_write_staged(spark, table, _df(spark, [(2, "b")]))
    v = publish_snapshot(spark, table, sid2, audit=audit)
    assert v == 2
    assert sorted(r["id"] for r in snapshot_read(spark, table).collect()) == [1, 2]
    assert not _glob.glob(f"{table}/_log/_staged-*")


def test_bloom_point_lookup_prunes_to_one_file(spark, tmp_path):
    from pipelines_spark.sinks.snapshots import (
        snapshot_read_point,
        snapshot_write_with_blooms,
    )

    table = str(tmp_path / "tblb")
    # three commits with DISJOINT scattered keys: min/max ranges all
    # overlap (keys interleave mod 3), so range stats cannot prune —
    # only the bloom can
    for r in range(3):
        df = spark.range(100).select(
            (F.col("id") * 3 + r).alias("k"),
            F.concat(F.lit(f"file{r}_"), F.col("id")).alias("v"),
        ).coalesce(1)
        snapshot_write_with_blooms(spark, table, df, bloom_cols=["k"])

    hit = snapshot_read_point(spark, table, col="k", value=151)  # 151 % 3 == 1
    rows = hit.collect()
    assert [r["v"] for r in rows] == ["file1_50"]
    # bloom pruned to (almost certainly, fpp=1%) exactly one file
    assert len(hit.inputFiles()) == 1

    # absent key: every bloom rejects -> empty result, empty scan
    miss = snapshot_read_point(spark, table, col="k", value=1_000_003)
    assert miss.count() == 0


def test_bloom_keeps_files_without_filters(spark, tmp_path):
    from pipelines_spark.sinks.snapshots import (
        snapshot_read_point,
        snapshot_write_with_blooms,
    )

    table = str(tmp_path / "tblb2")
    snapshot_write(spark, table, _df(spark, [(7, "legacy")]))  # no bloom
    snapshot_write_with_blooms(
        spark, table, _df(spark, [(1000, "new")]), bloom_cols=["id"]
    )
    out = snapshot_read_point(spark, table, col="id", value=7)
    # filterless legacy file conservatively scanned; row still found
    assert [r["v"] for r in out.collect()] == ["legacy"]


def test_bloom_false_positive_rate_bounded(spark, tmp_path):
    from pipelines_spark.sinks.snapshots import (
        _bloom_build,
        _bloom_maybe_contains,
    )

    bloom = _bloom_build(range(1000), fpp=0.01)
    fp = sum(
        _bloom_maybe_contains(bloom, v) for v in range(10_000, 20_000)
    )
    assert fp < 300  # 1% target, 3x headroom for hash variance
    assert all(_bloom_maybe_contains(bloom, v) for v in range(1000))


def test_foreach_batch_sink_exactly_once(spark, tmp_path):
    """Drive a real Structured Streaming query through the
    snapshot_foreach_batch sink, then simulate the crash-after-commit
    retry (foreachBatch re-invoked with the same batch_id) and assert
    nothing duplicates."""
    from pipelines_spark.sinks.snapshots import (
        current_version,
        snapshot_foreach_batch,
        snapshot_read,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text('{"id": 1, "v": "a"}\n{"id": 2, "v": "b"}\n')
    table = str(tmp_path / "tbl_fb")
    ckpt = str(tmp_path / "ckpt_fb")

    sink = snapshot_foreach_batch(table, "capture_app")
    stream = (
        spark.readStream.schema("id BIGINT, v STRING").json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert {r["id"] for r in snapshot_read(spark, table).collect()} == {1, 2}
    v_after = current_version(spark, table)

    # epoch retry: the engine re-invokes foreachBatch with the SAME
    # batch id after a failure between commit and checkpoint advance
    batch_df = spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, v STRING")
    sink(batch_df, 0)
    assert current_version(spark, table) == v_after
    assert snapshot_read(spark, table).count() == 2

    # a genuinely new file -> new batch id -> commits
    (src / "b.json").write_text('{"id": 3, "v": "c"}\n')
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert {r["id"] for r in snapshot_read(spark, table).collect()} == {1, 2, 3}


def test_zorder_into_snapshot_prunes_both_dimensions(spark, tmp_path):
    """Composition: Z-order-cluster the data, commit it via
    snapshot_write_with_stats, and the MANIFEST (not just parquet
    footers) prunes selective ranges on BOTH clustered columns — a
    linear sort can only ever serve its leading column."""
    from pipelines_spark.functions.zorder import with_zorder_key
    from pipelines_spark.sinks.snapshots import (
        snapshot_read_pruned,
        snapshot_write_with_stats,
    )

    table = str(tmp_path / "tblz")
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    clustered = (
        with_zorder_key(df, ["x", "y"])
        .repartitionByRange(16, F.col("_zorder"))
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )
    snapshot_write_with_stats(spark, table, clustered, stat_cols=["x", "y"])

    for col in ("x", "y"):
        rd = snapshot_read_pruned(spark, table, col=col, lo=0, hi=3)
        assert rd.count() == 4 * 64
        # a selective slice on EITHER dimension reads a fraction of
        # the 16 committed files straight from the manifest
        assert len(rd.inputFiles()) <= 8, col


def test_compact_preserves_stats_and_clusters(spark, tmp_path):
    """Compaction must not degrade pruned reads: the rewrite
    re-collects manifest stats, and sort_cols range-clusters the
    files so a selective range hits a single compacted file."""
    from pipelines_spark.sinks.snapshots import (
        compact_snapshot,
        snapshot_read,
        snapshot_read_pruned,
        snapshot_write_with_stats,
    )

    table = str(tmp_path / "tblc2")
    # interleaved ids across commits: pre-compaction stats can't
    # prune an id range (every file spans the domain)
    for r in range(4):
        df = spark.range(250).select(
            (F.col("id") * 4 + r).alias("id"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ).coalesce(1)
        snapshot_write_with_stats(spark, table, df)
    wide = snapshot_read_pruned(spark, table, col="id", lo=10, hi=40)
    assert len(wide.inputFiles()) == 4  # nothing prunable yet

    out = compact_snapshot(spark, table, target_files=4, sort_cols=["id"])
    assert out["files_before"] == 4 and out["files_after"] <= 4

    pruned = snapshot_read_pruned(spark, table, col="id", lo=10, hi=40)
    assert sorted(r["id"] for r in pruned.collect()) == list(range(10, 41))
    # clustered rewrite + fresh stats: one file serves the range
    assert len(pruned.inputFiles()) == 1
    assert snapshot_read(spark, table).count() == 1000


def test_compact_small_files_rewrites_only_small(spark, tmp_path):
    """Partial compaction: small files merge, the big file carries
    over untouched (same path => manifest stats/blooms stay valid);
    I/O proportional to small-file volume only."""
    from pipelines_spark.sinks.snapshots import (
        compact_small_files,
        snapshot_changes,
        snapshot_read,
        snapshot_write_with_stats,
    )

    table = str(tmp_path / "tblpc")
    # md5-derived pad: incompressible, so the file is genuinely large
    # on disk (a constant pad RLE-compresses under any threshold)
    big = spark.range(50_000).select(
        F.col("id").alias("id"),
        F.concat(*[F.md5(F.concat(F.col("id").cast("string"), F.lit(str(i)))) for i in range(4)]).alias("pad"),
    ).coalesce(1)
    snapshot_write_with_stats(spark, table, big)
    big_files = set(snapshot_read(spark, table).inputFiles())
    # a trickle of tiny commits on top
    for r in range(3):
        tiny = spark.createDataFrame(
            [(100_000 + r, "t")], "id bigint, pad string"
        )
        snapshot_write_with_stats(spark, table, tiny)

    out = compact_small_files(spark, table, small_file_mb=1, target_files=1)
    # each tiny commit lands 2 part files (one empty) -> 6 small files
    assert out["files_rewritten"] == 6 and out["files_kept"] == 1

    after = set(snapshot_read(spark, table).inputFiles())
    # the big file is byte-identical and still referenced by path
    assert big_files <= after
    assert len(after) == 2  # big + one merged small file
    assert snapshot_read(spark, table).count() == 50_003

    # compact commit invisible to change consumers
    assert snapshot_changes(spark, table, since_version=out["version"] - 1).count() == 0

    # nothing small left -> clean noop, same version
    again = compact_small_files(spark, table, small_file_mb=0.001)
    assert again["files_rewritten"] == 0 and again["version"] == out["version"]
