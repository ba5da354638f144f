"""Operator combinators: filters with observed metrics, dedup,
anti/range/knn joins, spine gap detection, pivot/unpivot."""

from datetime import datetime

from pyspark.sql import functions as F

from pipelines_spark.operators.dedup import last_row_per_key
from pipelines_spark.operators.filters import (
    FilterReport,
    filter_expressions,
    filter_nulls,
    temporal_window_filter,
)
from pipelines_spark.operators.joins import anti_join, knn_join, range_join
from pipelines_spark.operators.pivot import pivot_wide, unpivot_long
from pipelines_spark.operators.spine import find_gaps, time_spine


def test_filter_expressions_with_observation(spark):
    df = spark.createDataFrame([(1, 5.0), (2, -1.0), (3, 20.0)], "id long, v double")
    report = FilterReport()
    out = filter_expressions(df, ["v < 0", "v > 10"], report=report)
    assert {r["id"] for r in out.collect()} == {1}
    metrics = report.metrics()
    assert metrics["filter_0"]["removed"] == 1  # v < 0
    assert metrics["filter_1"]["removed"] == 1  # v > 10


def test_filter_nulls_reports_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c")], "id long, name string"
    )
    report = FilterReport()
    out = filter_nulls(df, ["id", "name"], report=report)
    assert out.count() == 1
    m = report.metrics()["filter_nulls"]
    assert m["null_id"] == 1 and m["null_name"] == 1


def test_temporal_window_filter(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 0, 0, 30)),   # +30s ok
        (2, datetime(2024, 1, 1, 0, 0, 0), datetime(2024, 1, 1, 0, 2, 0)),    # +120s late
        (3, datetime(2024, 1, 1, 0, 1, 0), datetime(2024, 1, 1, 0, 0, 0)),    # -60s skew
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, cap timestamp")
    out = temporal_window_filter(df, "ts", "cap", min_skew_seconds=-20, max_delay_seconds=60)
    assert {r["id"] for r in out.collect()} == {1}


def test_last_row_per_key_deterministic_ties(spark):
    rows = [
        ("u1", 1, datetime(2024, 1, 1, 10)),
        ("u1", 2, datetime(2024, 1, 1, 10)),  # same ts: higher id wins
        ("u2", 3, datetime(2024, 1, 1, 9)),
    ]
    df = spark.createDataFrame(rows, "k string, id long, ts timestamp")
    out = last_row_per_key(df, ["k"], "ts", tiebreak=["id"])
    assert {(r["k"], r["id"]) for r in out.collect()} == {("u1", 2), ("u2", 3)}


def test_anti_join(spark):
    facts = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    state = spark.createDataFrame([(2,), (2,)], "k long")
    assert {r["k"] for r in anti_join(facts, state, ["k"]).collect()} == {1, 3}


def test_range_join_null_open(spark):
    points = spark.createDataFrame([(1, 5), (2, 50)], "id long, x long")
    ranges = spark.createDataFrame(
        [("lo", 0, 10), ("open", 40, None)], "name string, lo long, hi long"
    )
    out = range_join(points, ranges, point="x", lower="lo", upper="hi")
    pairs = {(r["id"], r["name"]) for r in out.collect()}
    assert pairs == {(1, "lo"), (2, "open")}


def test_knn_join_orders_by_distance(spark):
    points = spark.createDataFrame([(1, 0.0)], "pid long, px double")
    anchors = spark.createDataFrame(
        [(10, 5.0), (11, 1.0), (12, 3.0)], "aid long, ax double"
    )
    out = knn_join(
        points,
        anchors,
        point_id="pid",
        distance=F.abs(F.col("px") - F.col("ax")),
        k=2,
        tiebreak=[F.col("aid")],
    )
    got = [(r["aid"], r["rank"]) for r in out.orderBy("rank").collect()]
    assert got == [(11, 1), (12, 2)]


def test_spine_gap_detection_caps_and_requires_success(spark):
    spine = time_spine(
        spark, "2024-01-01 00:00:00", "2024-01-01 00:04:00", interval="1 minute"
    )
    logs = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 0, 0), True, None),
            (datetime(2024, 1, 1, 0, 1), False, "boom"),  # failed -> still a gap
            (datetime(2024, 1, 1, 0, 3), True, None),
        ],
        "timestamp_captura timestamp, sucesso boolean, erro string",
    )
    gaps = find_gaps(spine, logs, cap=2)
    got = [r["timestamp_captura"] for r in gaps.collect()]
    assert got == [datetime(2024, 1, 1, 0, 1), datetime(2024, 1, 1, 0, 2)]  # oldest-first, capped


def test_pivot_roundtrip(spark):
    long_df = spark.createDataFrame(
        [("r1", "a", 1.0), ("r1", "b", 2.0), ("r2", "a", 3.0)],
        "k string, col string, v double",
    )
    wide = pivot_wide(long_df, ["k"], "col", ["a", "b"], F.first("v"))
    assert {tuple(r) for r in wide.collect()} == {("r1", 1.0, 2.0), ("r2", 3.0, None)}
    back = unpivot_long(wide, ["k"], ["a", "b"], var_name="col", value_name="v")
    assert back.filter(F.col("v").isNotNull()).count() == 3


def test_asof_join_semantics(spark):
    from pipelines_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 999.0)],
        "k long, ts long, v double",
    )
    out = {
        r["tag"]: r["asof_v"]
        for r in asof_join(left, right, on="k", value_cols=["v"]).collect()
    }
    # equal-ts right row matches (>= semantics); no prior → NULL
    assert out == {"a": 100.0, "b": 150.0, "c": None, "d": None}


def test_asof_join_null_right_values_come_from_one_row(spark):
    """A NULL field in the newest right row must stay NULL — not blend
    in an older row's value for that column (all value_cols propagate
    as one struct, matching DuckDB ASOF JOIN row semantics)."""
    from pipelines_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 20, "x")], "k long, ts long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100.0, "old"), (1, 15, None, "new")],
        "k long, ts long, v double, label string",
    )
    row = asof_join(left, right, on="k", value_cols=["v", "label"]).collect()[0]
    # newest right row (ts=15) has v=NULL, label='new' — the output
    # must be that exact row, not (100.0, 'new')
    assert row["asof_label"] == "new"
    assert row["asof_v"] is None


def _scd2_rows(df):
    return {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_merge_row_fates(spark):
    from pipelines_spark.operators.scd import scd2_init, scd2_merge

    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    ntz = "k long, v string"
    snap0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], ntz
    )
    hist = scd2_init(snap0, effective_ts=F.expr("TIMESTAMP_NTZ'2024-01-01'"))
    # 1 unchanged, 2 changed, 3 unchanged (NULL==NULL null-safely),
    # 4 brand new, and... nothing deleted yet
    snap1 = spark.createDataFrame([(1, "a"), (2, "B"), (3, None), (4, "d")], ntz)
    hist1 = scd2_merge(
        hist, snap1, keys=["k"], track_cols=["v"],
        effective_ts=F.expr("TIMESTAMP_NTZ'2024-02-01'"),
    )
    assert _scd2_rows(hist1) == {
        (1, "a", t0, None, True),
        (2, "b", t0, t1, False),
        (2, "B", t1, None, True),
        (3, None, t0, None, True),
        (4, "d", t1, None, True),
    }
    # idempotence: re-applying the same snapshot changes nothing
    hist1b = scd2_merge(
        hist1, snap1, keys=["k"], track_cols=["v"],
        effective_ts=F.expr("TIMESTAMP_NTZ'2024-03-01'"),
    )
    assert _scd2_rows(hist1b) == _scd2_rows(hist1)


def test_scd2_merge_delete_and_reinsert(spark):
    from pyspark.sql import functions as F2
    from pipelines_spark.operators.scd import scd2_init, scd2_merge

    t0, t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1), datetime(2024, 3, 1)
    hist = scd2_init(
        spark.createDataFrame([(1, "a")], "k long, v string"),
        effective_ts=F2.expr("TIMESTAMP_NTZ'2024-01-01'"),
    )
    gone = spark.createDataFrame([], "k long, v string")
    closed = scd2_merge(
        hist, gone, keys=["k"], track_cols=["v"],
        effective_ts=F2.expr("TIMESTAMP_NTZ'2024-02-01'"),
    )
    assert _scd2_rows(closed) == {(1, "a", t0, t1, False)}
    # close_deleted=False keeps the key open instead
    kept = scd2_merge(
        hist, gone, keys=["k"], track_cols=["v"],
        effective_ts=F2.expr("TIMESTAMP_NTZ'2024-02-01'"),
        close_deleted=False,
    )
    assert _scd2_rows(kept) == {(1, "a", t0, None, True)}
    # the key reappearing after closure: closed row passes through,
    # fresh open row inserted
    back = scd2_merge(
        closed,
        spark.createDataFrame([(1, "a2")], "k long, v string"),
        keys=["k"], track_cols=["v"],
        effective_ts=F2.expr("TIMESTAMP_NTZ'2024-03-01'"),
    )
    assert _scd2_rows(back) == {
        (1, "a", t0, t1, False),
        (1, "a2", t2, None, True),
    }


def test_asof_join_forward_semantics(spark):
    from pipelines_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("k", 5, 1), ("k", 10, 2), ("k", 25, 3)], "k string, ts long, lid long"
    )
    right = spark.createDataFrame(
        [("k", 7, 70.0), ("k", 10, 100.0), ("k", 20, 200.0)],
        "k string, ts long, v double",
    )
    rows = {
        r["lid"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", value_cols=["v"], direction="forward"
        ).collect()
    }
    # nearest at-or-after: ts=5→7(70), ts=10→10 inclusive (100),
    # ts=25→nothing following → NULL
    assert rows == {1: 70.0, 2: 100.0, 3: None}


def test_asof_join_tolerance_bounds_the_gap(spark):
    """merge_asof-style tolerance: a nearest match farther than the
    bound yields NULL; numeric ts uses same-unit tolerance."""
    from pipelines_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, "near"), (1, 500, "far"), (1, 50, "none")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame([(1, 90, 9.0)], "k long, ts long, v double")
    out = {
        r["tag"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", value_cols=["v"], tolerance=50
        ).collect()
    }
    # near: gap 10 <= 50 matches; far: gap 410 > 50 -> NULL; none: no
    # prior at all -> NULL
    assert out == {"near": 9.0, "far": None, "none": None}

    # without tolerance the far row still matches (regression guard)
    out2 = {
        r["tag"]: r["asof_v"]
        for r in asof_join(left, right, on="k", value_cols=["v"]).collect()
    }
    assert out2 == {"near": 9.0, "far": 9.0, "none": None}


def test_interval_overlap_join_semantics_and_cap(spark):
    """interval_overlap_join: inclusive overlap within a key, each
    unordered pair once even when it co-occurs in several day
    buckets; cross-key rows never pair; the hot-bucket cap drops
    pathological (key, bucket) groups with graceful recall loss."""
    from pipelines_spark.operators.joins import interval_overlap_join

    rows = [
        # key u1: a-b overlap (same day), b-c touch at the boundary
        # (inclusive => pair), a-c disjoint
        ("u1", 1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        ("u1", 2, "2024-01-01 10:30:00", "2024-01-01 12:00:00"),
        ("u1", 3, "2024-01-01 12:00:00", "2024-01-01 13:00:00"),
        # key u1: d spans midnight and overlaps e on day 2 — the pair
        # appears in exactly one result row despite double bucketing
        ("u1", 4, "2024-01-02 23:00:00", "2024-01-03 01:00:00"),
        ("u1", 5, "2024-01-03 00:30:00", "2024-01-03 02:00:00"),
        # key u2: same times as u1's a/b but a different key
        ("u2", 6, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "key string, id long, s string, e string"
    ).selectExpr("key", "id", "CAST(s AS TIMESTAMP) s", "CAST(e AS TIMESTAMP) e")
    got = sorted(
        map(
            tuple,
            interval_overlap_join(
                df, id_col="id", key_col="key", start_col="s", end_col="e"
            ).collect(),
        )
    )
    assert got == [("u1", 1, 2), ("u1", 2, 3), ("u1", 4, 5)]

    # cap: u1 has 4 intervals on day 1 (ids 1,2,3 + a fourth) — cap 3
    # drops the whole (u1, day1) bucket; the midnight pair survives
    # because its day-2/day-3 buckets stay under the cap
    rows_hot = rows + [("u1", 7, "2024-01-01 09:00:00", "2024-01-01 09:30:00")]
    df_hot = spark.createDataFrame(
        rows_hot, "key string, id long, s string, e string"
    ).selectExpr("key", "id", "CAST(s AS TIMESTAMP) s", "CAST(e AS TIMESTAMP) e")
    capped = sorted(
        map(
            tuple,
            interval_overlap_join(
                df_hot, id_col="id", key_col="key", start_col="s",
                end_col="e", max_bucket_group=3,
            ).collect(),
        )
    )
    assert capped == [("u1", 4, 5)]


def test_funnel_depth_semantics(spark):
    from pipelines_spark.operators.funnel import funnel_depth

    ts = datetime
    rows = [
        # u1: clean view -> click -> purchase progression
        (1, ts(2024, 1, 1, 0, 0), "view"),
        (1, ts(2024, 1, 2, 0, 0), "click"),
        (1, ts(2024, 1, 3, 0, 0), "purchase"),
        # u2: click BEFORE any view must not count; no click after the
        # view -> depth stays 1
        (2, ts(2024, 1, 1, 0, 0), "click"),
        (2, ts(2024, 1, 2, 0, 0), "view"),
        # u3: click at the SAME timestamp as the first view (strict >)
        (3, ts(2024, 1, 1, 0, 0), "view"),
        (3, ts(2024, 1, 1, 0, 0), "click"),
        # u4: click outside the 7-day window; greedy state never
        # resets, so the later in-window purchase is unreachable
        (4, ts(2024, 1, 1, 0, 0), "view"),
        (4, ts(2024, 1, 9, 0, 0), "click"),
        (4, ts(2024, 1, 10, 0, 0), "purchase"),
        # u5: greedy takes the EARLIEST view; a later view does not
        # refresh the window
        (5, ts(2024, 1, 1, 0, 0), "view"),
        (5, ts(2024, 1, 5, 0, 0), "view"),
        (5, ts(2024, 1, 9, 0, 0), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = funnel_depth(
        df, ["view", "click", "purchase"], step_window="7 DAY"
    )
    depths = {r["user_id"]: r["depth"] for r in out.collect()}
    assert depths == {1: 3, 2: 1, 3: 1, 4: 1, 5: 1}

    # unbounded window: u4 converts fully
    out2 = funnel_depth(df, ["view", "click", "purchase"])
    depths2 = {r["user_id"]: r["depth"] for r in out2.collect()}
    assert depths2[4] == 3


def test_funnel_summary_counts_and_rates(spark):
    from pipelines_spark.operators.funnel import funnel_summary

    ts = datetime
    rows = [
        (1, ts(2024, 1, 1), "view"),
        (1, ts(2024, 1, 2), "click"),
        (2, ts(2024, 1, 1), "view"),
        (3, ts(2024, 1, 1), "other"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step_name"]: r for r in funnel_summary(df, ["view", "click"]).collect()}
    assert out["view"]["users"] == 2 and out["view"]["conv_from_prev"] == 1.0
    assert out["click"]["users"] == 1 and out["click"]["conv_from_prev"] == 0.5


def test_profile_columns_exact_and_approx(spark):
    from pipelines_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "a")], "id long, name string"
    )
    prof = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_non_null"] == 4 and prof["id"]["n_distinct"] == 3
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "3"
    assert prof["name"]["n_non_null"] == 3 and prof["name"]["n_distinct"] == 2
    assert prof["name"]["min_value"] == "a" and prof["name"]["max_value"] == "b"

    # approx mode: same shape, HLL distincts exact at this cardinality
    aprof = {
        r["col_name"]: r
        for r in profile_columns(df, exact=False, rsd=0.01).collect()
    }
    assert aprof["id"]["n_distinct"] == 3

    # approx mode must not plan an Expand (the exact multi-distinct
    # rewrite); that is the whole point of the 100 TB switch
    plan = profile_columns(df, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_profile_columns_hll_matches_exact_at_low_cardinality(spark):
    """The md5-HLL profiler: same base stats as the exact profiler,
    register-based distinct estimates exact at tiny cardinality (the
    linear-counting branch), and no Expand in the plan."""
    from pipelines_spark.operators.profile import (
        profile_columns,
        profile_columns_hll,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (3, "a")], "id long, name string"
    )
    exact = {r["col_name"]: r for r in profile_columns(df).collect()}
    prof = {r["col_name"]: r for r in profile_columns_hll(df).collect()}
    for c in ("id", "name"):
        assert prof[c]["n_rows"] == exact[c]["n_rows"]
        assert prof[c]["n_non_null"] == exact[c]["n_non_null"]
        assert prof[c]["min_value"] == exact[c]["min_value"]
        assert prof[c]["max_value"] == exact[c]["max_value"]
        assert prof[c]["est_distinct"] == exact[c]["n_distinct"]

    plan = profile_columns_hll(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_ks_drift_bounds(spark):
    """KS statistic: 0 for identical samples, 1 for disjoint supports,
    and the 95% rejection flag follows the Smirnov bound."""
    from pipelines_spark.operators.drift import ks_drift

    same = spark.createDataFrame([(float(i % 10),) for i in range(200)], "v double")
    r = ks_drift(same, same, "v").collect()[0]
    assert r["ks_stat"] == 0.0 and not r["reject_95"]
    assert r["n_ref"] == 200 and r["n_cur"] == 200

    lo = spark.createDataFrame([(float(i % 10),) for i in range(200)], "v double")
    hi = spark.createDataFrame([(100.0 + i % 10,) for i in range(200)], "v double")
    r2 = ks_drift(lo, hi, "v").collect()[0]
    assert r2["ks_stat"] == 1.0 and r2["reject_95"]


def test_rendezvous_shard_movement_invariant(spark):
    """The HRW guarantee that makes it the incremental-resharding
    primitive: growing 8 → 9 shards only ever moves keys TO the new
    shard (a doc moves iff shard 8 wins its tournament), and the
    moved share is ~1/9, never the ~8/9 a modulo reshard causes."""
    from pipelines_spark.llm.sampling import rendezvous_shard

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    assigned = docs.select(
        "doc_id",
        rendezvous_shard("doc_id", shards=8).alias("s8"),
        rendezvous_shard("doc_id", shards=9).alias("s9"),
    )
    moved = assigned.filter(F.col("s8") != F.col("s9"))
    # every moved doc went to the NEW shard — nothing reshuffles
    # between existing shards
    assert moved.filter(F.col("s9") != 8).count() == 0
    # moved share ≈ 1/9 (loose band; 2000 Bernoulli(1/9) trials)
    frac = moved.count() / 2000
    assert 0.05 < frac < 0.18, frac
    # assignment is a pure function: shards are all in range
    mm = assigned.agg(
        F.min("s8"), F.max("s8"), F.min("s9"), F.max("s9")
    ).collect()[0]
    assert mm[0] >= 0 and mm[1] <= 7 and mm[2] >= 0 and mm[3] <= 8
