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


def test_merge_upsert_row_grain_partition_io(spark, tmp_path):
    from pipelines_spark.sinks.partitioned import merge_upsert

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [(1, "a", 1995), (2, "b", 1995), (3, "c", 1996), (4, "d", 1996)],
        "id long, v string, year int",
    )
    write_partitioned(base, path, ["year"], mode="overwrite")

    def file_state(year):
        d = os.path.join(path, f"year={year}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        )

    untouched_before = file_state(1995)

    updates = spark.createDataFrame(
        # update id=3 in 1996, insert id=5 into 1996, open year=1997
        [(3, "C2", 1996), (5, "e", 1996), (6, "f", 1997)],
        "id long, v string, year int",
    )
    stats = merge_upsert(spark, path, updates, ["id"], ["year"])
    assert stats == {"partitions_touched": 2, "rows_upserted": 3}

    # partition columns read back as string: the session disables
    # partitionColumnTypeInference (all-string staging contract)
    out = {
        (r["id"], r["v"], r["year"])
        for r in spark.read.parquet(path).collect()
    }
    assert out == {
        (1, "a", "1995"), (2, "b", "1995"),      # partition not touched
        (3, "C2", "1996"), (4, "d", "1996"), (5, "e", "1996"),  # update+survivor+insert
        (6, "f", "1997"),                         # new partition
    }
    # the 1995 partition was never rewritten — same files, bytes, mtimes
    assert file_state(1995) == untouched_before
    # staging dir cleaned up
    assert not os.path.exists(os.path.join(path, "_tmp_merge"))

    # idempotence: re-applying the same updates yields the same table
    merge_upsert(spark, path, updates, ["id"], ["year"])
    out2 = {
        (r["id"], r["v"], r["year"])
        for r in spark.read.parquet(path).collect()
    }
    assert out2 == out


def test_write_partitioned_sort_cols_orders_file_contents(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "sorted_lake")
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", F.year("l_shipdate").alias("year")
    )
    write_partitioned(
        df, path, ["year"], mode="overwrite", sort_cols=["l_shipdate"]
    )
    checked = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            col = pq.read_table(os.path.join(dirpath, fn), columns=["l_shipdate"])[
                "l_shipdate"
            ].to_pylist()
            assert col == sorted(col), f"{dirpath}/{fn} not sorted"
            checked += 1
    assert checked >= 3  # several year partitions actually verified


def test_vacuum_partitions_retention(spark, tmp_path):
    from pipelines_spark.sinks.partitioned import vacuum_partitions

    path = str(tmp_path / "retained")
    df = spark.createDataFrame(
        [(i, f"199{5 + i % 4}", f"{(i // 4) % 2:02d}") for i in range(16)],
        "id long, year string, month string",
    )
    write_partitioned(df, path, ["year", "month"], mode="overwrite")
    os.makedirs(os.path.join(path, "_tmp_merge"), exist_ok=True)

    preview = vacuum_partitions(
        path, ["year", "month"], keep=lambda v: v["year"] >= "1997", dry_run=True
    )
    assert preview == ["year=1995/month=00", "year=1995/month=01",
                       "year=1996/month=00", "year=1996/month=01"]
    # dry run touched nothing
    assert spark.read.parquet(path).count() == 16

    removed = vacuum_partitions(
        path, ["year", "month"], keep=lambda v: v["year"] >= "1997"
    )
    assert removed == preview
    left = spark.read.parquet(path)
    assert left.count() == 8
    assert {r["year"] for r in left.select("year").distinct().collect()} == {"1997", "1998"}
    # bookkeeping dirs are never candidates
    assert os.path.isdir(os.path.join(path, "_tmp_merge"))
    # emptied parent shells are pruned, not left to grow forever
    assert not os.path.exists(os.path.join(path, "year=1995"))
    assert not os.path.exists(os.path.join(path, "year=1996"))


def test_lake_schema_evolution_merge_schema(spark, tmp_path):
    """Schema-drift contract: a column added by a later capture window
    appears table-wide under mergeSchema, NULL for old partitions —
    the all-string staging zone absorbs type drift, mergeSchema
    absorbs column drift."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a", "2024-01-01")], "id long, v string, data string")
    write_partitioned(v1, path, ["data"], mode="append")
    v2 = spark.createDataFrame(
        [(2, "b", "extra", "2024-01-02")], "id long, v string, w string, data string"
    )
    write_partitioned(v2, path, ["data"], mode="append")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "w", "data"}
    rows = {r["id"]: (r["v"], r["w"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", "extra")}


def test_write_and_merge_orc_format(spark, tmp_path):
    """ORC is a first-class lake format: partitioned write, read-back,
    and row-grain merge all work with file_format='orc'."""
    from pipelines_spark.sinks.partitioned import merge_upsert

    path = str(tmp_path / "orc_lake")
    base = spark.createDataFrame(
        [(1, "a", "1995"), (2, "b", "1996")], "id long, v string, year string"
    )
    write_partitioned(base, path, ["year"], mode="overwrite", file_format="orc")
    assert {
        (r["id"], r["v"]) for r in spark.read.orc(path).collect()
    } == {(1, "a"), (2, "b")}

    updates = spark.createDataFrame(
        [(2, "b2", "1996"), (3, "c", "1997")], "id long, v string, year string"
    )
    stats = merge_upsert(spark, path, updates, ["id"], ["year"], file_format="orc")
    assert stats["partitions_touched"] == 2
    assert {
        (r["id"], r["v"]) for r in spark.read.orc(path).collect()
    } == {(1, "a"), (2, "b2"), (3, "c")}


def test_merge_upsert_requires_dynamic_overwrite(spark, tmp_path):
    """Under static partitionOverwriteMode the final write would wipe
    every untouched partition — merge_upsert must refuse up front."""
    import pytest
    from pipelines_spark.sinks.partitioned import merge_upsert

    path = str(tmp_path / "guarded")
    base = spark.createDataFrame([(1, "a", "1995")], "id long, v string, year string")
    write_partitioned(base, path, ["year"], mode="overwrite")
    updates = spark.createDataFrame([(1, "a2", "1995")], "id long, v string, year string")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        with pytest.raises(RuntimeError, match="partitionOverwriteMode=dynamic"):
            merge_upsert(spark, path, updates, ["id"], ["year"])
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # nothing was written
    assert {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()} == {(1, "a")}


def test_merge_upsert_rejects_data_column_type_drift(spark, tmp_path):
    """An updates frame whose DATA column types drift from the table
    must be rejected, not silently widened and written back."""
    import pytest
    from pipelines_spark.sinks.partitioned import merge_upsert

    path = str(tmp_path / "typed")
    base = spark.createDataFrame([(1, "7", "1995")], "id long, v string, year string")
    write_partitioned(base, path, ["year"], mode="overwrite")
    drifted = spark.createDataFrame([(1, 7, "1995")], "id long, v int, year string")
    with pytest.raises(ValueError, match="drift"):
        merge_upsert(spark, path, drifted, ["id"], ["year"])
    # partition-column representation differences stay allowed (dir
    # values legitimately read back as string)
    ok = spark.createDataFrame([(1, "8", 1995)], "id long, v string, year int")
    stats = merge_upsert(spark, path, ok, ["id"], ["year"])
    assert stats["rows_upserted"] == 1


def test_merge_upsert_many_partitions_uses_semijoin_prune(spark, tmp_path):
    """A backfill touching more partitions than the static-predicate
    cap must still merge correctly (broadcast semi-join prune path, no
    kiloclaus OR-chain)."""
    from pipelines_spark.sinks import partitioned as P

    path = str(tmp_path / "backfill")
    n = P._STATIC_PRUNE_MAX_COMBOS + 8
    base = spark.createDataFrame(
        [(i, "old", f"d{i:04d}") for i in range(n)] + [(999, "keep", "d9999")],
        "id long, v string, data string",
    )
    write_partitioned(base, path, ["data"], mode="overwrite")
    updates = spark.createDataFrame(
        [(i, "new", f"d{i:04d}") for i in range(n)],
        "id long, v string, data string",
    )
    stats = P.merge_upsert(spark, path, updates, ["id"], ["data"])
    assert stats == {"partitions_touched": n, "rows_upserted": n}
    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(i, "new") for i in range(n)} | {(999, "keep")}


def test_compact_rejects_non_atomic_rename_schemes(spark):
    """Compaction's directory swap needs atomic rename; object-store
    schemes where rename is a copy are rejected BEFORE any filesystem
    connection is attempted (vacuum has no such constraint — its
    deletes go through the Hadoop FS on any scheme)."""
    import pytest
    from pipelines_spark.sinks.partitioned import compact_partitions

    for scheme in ("s3a", "gs", "wasbs"):
        with pytest.raises(NotImplementedError, match="atomic"):
            compact_partitions(spark, f"{scheme}://bucket/table", ["data"])


def test_vacuum_and_compact_over_hadoop_fs_scheme(spark, tmp_path):
    """Maintenance runs through the Hadoop FileSystem API: drive both
    against an explicit file:// URI (a non-empty scheme the old
    os.walk implementation rejected) and verify the same retention +
    rewrite semantics as the local-path tests."""
    from pipelines_spark.sinks.partitioned import (
        compact_partitions,
        vacuum_partitions,
    )

    path = "file://" + str(tmp_path / "lake")
    for i in range(5):
        spark.createDataFrame(
            [(i, "2024-01-01")], "v long, data string"
        ).coalesce(1).write.mode("append").partitionBy("data").parquet(path)
    spark.createDataFrame(
        [(99, "2023-12-31")], "v long, data string"
    ).coalesce(1).write.mode("append").partitionBy("data").parquet(path)

    removed = vacuum_partitions(
        path, ["data"], keep=lambda v: v["data"] >= "2024", spark=spark
    )
    assert removed == ["data=2023-12-31"]

    rewritten = compact_partitions(spark, path, ["data"], min_files_to_compact=4)
    assert rewritten == {"data=2024-01-01": 5}
    got = spark.read.parquet(path)
    assert sorted(r["v"] for r in got.collect()) == [0, 1, 2, 3, 4]
    assert len([
        f for f in os.listdir(tmp_path / "lake" / "data=2024-01-01")
        if f.endswith(".parquet")
    ]) == 1
