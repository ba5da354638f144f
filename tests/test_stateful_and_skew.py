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


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Streaming funnel ≡ batch funnel_depth under per-key ordered
    arrival across batches (in-batch disorder allowed — each batch is
    sorted before folding); intermediate update-mode rows mark each
    depth advance."""
    import time

    from pipelines_spark.operators.funnel import funnel_depth
    from pipelines_spark.streaming.funnel_stream import streaming_funnel_depth

    src = str(tmp_path / "src")
    schema = "user_id long, ts timestamp, event_type string"
    batch1 = [
        # deliberately out of order within the batch
        (1, datetime(2024, 1, 1, 10, 10), "click"),
        (1, datetime(2024, 1, 1, 10, 0), "view"),
        (2, datetime(2024, 1, 1, 10, 0), "view"),
        (3, datetime(2024, 1, 1, 9, 0), "click"),  # click before any view
        (3, datetime(2024, 1, 1, 9, 30), "view"),
        (4, datetime(2024, 1, 1, 8, 0), "other"),  # never enters
    ]
    batch2 = [
        (1, datetime(2024, 1, 1, 10, 20), "purchase"),
        (2, datetime(2024, 1, 1, 11, 0), "click"),  # 60 min > 30-min window
        (3, datetime(2024, 1, 1, 9, 45), "click"),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes so maxFilesPerTrigger=1 replays in order
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    steps = ["view", "click", "purchase"]
    out = streaming_funnel_depth(stream, steps, step_window_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_state").collect()

    # final state = max depth per user
    final = {}
    for r in rows:
        final[r["user_id"]] = max(final.get(r["user_id"], 0), r["depth"])

    batch_df = spark.createDataFrame(batch1 + batch2, schema)
    expected = {
        r["user_id"]: r["depth"]
        for r in funnel_depth(batch_df, steps, step_window="30 MINUTE").collect()
        if r["depth"] > 0  # streaming emits only users that advanced
    }
    assert final == expected
    assert expected == {1: 3, 2: 1, 3: 2}

    # u1 advanced in both micro-batches -> two update rows
    assert sorted(r["depth"] for r in rows if r["user_id"] == 1) == [2, 3]


def test_watermarked_funnel_out_of_order_matches_batch(spark, tmp_path):
    """Out-of-order arrival with an event-time watermark: the final
    emitted (depth, reached_at) per user equals batch funnel_depth
    over the watermark-ADMITTED events. Covers (a) a cross-batch LATE
    event that RAISES a depth (u1's click arrives one batch after a
    younger click), (b) a late event that LOWERS a previously emitted
    speculative depth (u4's earlier view makes the greedy entry expire
    the step window — the update-mode correction case), and (c) an
    event beyond the lateness bound being dropped (u1's purchase)."""
    import time

    from pipelines_spark.operators.funnel import funnel_depth
    from pipelines_spark.streaming.funnel_stream import watermarked_funnel_depth

    src = str(tmp_path / "src")
    schema = "user_id long, ts timestamp, event_type string"
    batch1 = [
        (1, datetime(2024, 1, 1, 10, 0), "view"),
        (1, datetime(2024, 1, 1, 10, 40), "click"),  # outside 30-min window
        (2, datetime(2024, 1, 1, 10, 0), "view"),
        (4, datetime(2024, 1, 1, 10, 35), "view"),
        (4, datetime(2024, 1, 1, 10, 50), "click"),  # in window of 10:35 view
    ]
    batch2 = [
        # late (vs batch1's 10:50 max) but inside the 1 h bound:
        (1, datetime(2024, 1, 1, 10, 20), "click"),  # raises u1 to depth 2
        (4, datetime(2024, 1, 1, 10, 5), "view"),    # lowers u4 to depth 1
        (2, datetime(2024, 1, 1, 10, 10), "click"),
        (3, datetime(2024, 1, 1, 12, 30), "view"),   # advances the watermark
    ]
    batch3 = [
        # watermark is now 11:30 (12:30 - 1 h): dropped as too late
        (1, datetime(2024, 1, 1, 10, 30), "purchase"),
        (3, datetime(2024, 1, 1, 12, 40), "click"),
    ]
    for b in (batch1, batch2, batch3):
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes so maxFilesPerTrigger=1 replays in order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    steps = ["view", "click", "purchase"]
    out = watermarked_funnel_depth(
        stream, steps, lateness="1 hour", step_window_minutes=30
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wm_funnel")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM wm_funnel").collect()

    # last emission per user (emit_seq orders update-mode corrections)
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["emit_seq"] > final[r["user_id"]]["emit_seq"]:
            final[r["user_id"]] = r

    admitted = batch1 + batch2 + [batch3[1]]  # u1's purchase was too late
    expected = {
        r["user_id"]: (r["depth"], r["reached_at"])
        for r in funnel_depth(
            spark.createDataFrame(admitted, schema), steps, step_window="30 MINUTE"
        ).collect()
        if r["depth"] > 0
    }
    got = {u: (r["depth"], r["reached_at"]) for u, r in final.items()}
    assert got == expected
    assert expected[1] == (2, datetime(2024, 1, 1, 10, 20))
    assert expected[4] == (1, datetime(2024, 1, 1, 10, 5))
    # the correction really happened: u4 was first emitted at depth 2
    u4_seq = sorted((r["emit_seq"], r["depth"]) for r in rows if r["user_id"] == 4)
    assert u4_seq == [(1, 2), (2, 1)]


def test_streaming_incremental_dedup_matches_oneshot(spark, tmp_path, sf_small):
    """The streaming ingestion-dedup loop (foreachBatch over the
    incremental batch operator + lake-resident fingerprint store):
    two micro-batches produce EXACTLY the one-shot decisions, the
    store accumulates every seen fingerprint, and the deduped corpus
    is the is_dup=false filter."""
    import time

    from pipelines_spark.llm.dedup import (
        incremental_dedup_batch,
        minhash_fingerprints,
    )
    from pipelines_spark.streaming.dedup_stream import (
        run_incremental_dedup_stream,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    docs.filter(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_incremental_dedup_stream(
        stream,
        corpus_path=str(tmp_path / "corpus"),
        store_path=str(tmp_path / "store"),
        decisions_path=str(tmp_path / "decisions"),
        checkpoint_path=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)

    got = {
        (r["doc_id"], r["is_dup"], r["dup_of"])
        for r in spark.read.parquet(str(tmp_path / "decisions")).collect()
    }
    empty = docs.filter(F.lit(False))
    oneshot = incremental_dedup_batch(
        docs, minhash_fingerprints(empty, id_col="doc_id", text_col="text"), empty
    )
    want = {
        (r["doc_id"], r["is_dup"], r["dup_of"]) for r in oneshot.collect()
    }
    assert got == want
    assert any(d for (_, d, _) in got), "corpus should contain duplicates"

    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    assert corpus.count() == 500  # raw zone keeps everything
    n_kept = corpus.filter(~F.col("is_dup")).count()
    assert n_kept == sum(1 for (_, d, _) in want if not d)
    # the store holds every seen doc's fingerprints (kept AND dropped)
    store = spark.read.parquet(str(tmp_path / "store"))
    n_shinglable = docs.filter(F.size(F.split("text", " ")) >= 3).count()
    assert store.select("doc_id").distinct().count() == n_shinglable


def test_streaming_heavy_hitters_matches_batch_guarantee(spark, tmp_path):
    """Streaming MG sketch: with <= capacity distinct values per
    group the counts are EXACT under any micro-batch split (no
    decrement ever fires); above capacity, every true heavy hitter
    still appears in the final summary (the MG no-false-negative
    contract), matching the batch operator's candidates."""
    import time

    from pipelines_spark.streaming.stateful import streaming_heavy_hitters

    src = str(tmp_path / "src")
    schema = "g string, v string"
    # group A: 3 distinct values (< capacity=4) -> exact counts
    a1 = [("A", "x")] * 5 + [("A", "y")] * 2
    a2 = [("A", "x")] * 3 + [("A", "z")] * 1
    # group B: 9 distinct with one dominant value -> survives MG
    b1 = [("B", "hot")] * 20 + [("B", f"c{i}") for i in range(4)]
    b2 = [("B", "hot")] * 20 + [("B", f"d{i}") for i in range(5)]
    spark.createDataFrame(a1 + b1, schema).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(a2 + b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_heavy_hitters(stream, group_col="g", value_col="v", capacity=4)
    q = (
        out.writeStream.format("memory")
        .queryName("mg_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM mg_state").collect()

    # group A never decrements -> per-(group,value) counts are
    # monotone and the max IS the final exact count
    a_final = {}
    for r in rows:
        if r["group"] == "A":
            a_final[r["value"]] = max(a_final.get(r["value"], 0), r["mg_count"])
    assert a_final == {"x": 8, "y": 2, "z": 1}

    # group B: 'hot' is 40 of 49 rows (> n/capacity) -> must be in
    # the final (second-batch) summary with a count no higher than
    # the truth (MG only undercounts)
    b_vals = {r["value"]: r["mg_count"] for r in rows if r["group"] == "B"}
    assert "hot" in b_vals and b_vals["hot"] <= 40
    # summary never exceeds capacity per emission
    from collections import Counter

    per_batch = Counter(r["group"] for r in rows)
    assert per_batch["B"] <= 2 * 4  # two emissions, <= capacity each
