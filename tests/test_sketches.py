"""KMV distinct sketch + blocked fuzzy join unit tests.

The invariants that matter at scale:
- KMV is partitioning-independent: the distributed per-partition
  merge must be bit-identical to a single-partition run (that is the
  property that makes the DuckDB oracle a valid referee).
- KMV error is bounded: ~1/sqrt(k) relative error; a gross miss means
  the hash fold or the estimator regressed.
- Blocked fuzzy pairs never compare across blocks (the candidate set
  is the equi-join, not a cross join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelines_spark.operators.joins import blocked_fuzzy_pairs
from pipelines_spark.operators.sketches import kmv_distinct


def test_kmv_estimate_within_error(spark):
    n = 20_000
    df = spark.range(n).select((F.col("id") % 7_919).alias("v"))  # 7919 distinct
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["k"] == 256
    # 1/sqrt(256) ~ 6% expected relative error; allow 3 sigma
    assert abs(row["est_distinct"] - 7_919) / 7_919 < 0.20


def test_kmv_partitioning_independent(spark):
    df = spark.range(5_000).select((F.col("id") * 13 % 4_001).alias("v"))
    a = kmv_distinct(df.repartition(1), "v", k=128).collect()[0]
    b = kmv_distinct(df.repartition(17), "v", k=128).collect()[0]
    assert a == b


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    # degenerate regime: fewer distincts than k -> exact count
    assert row["est_distinct"] == 100


def test_blocked_fuzzy_pairs_respects_blocks(spark):
    df = spark.createDataFrame(
        [("small bolt",), ("small bolt",), ("small rod",), ("large bolt",),
         ("tiny gear",), (None,)],
        ["name"],
    )
    rows = blocked_fuzzy_pairs(
        df, "name", block_expr=F.split(F.col("_name"), " ").getItem(0), max_dist=3
    ).collect()
    pairs = {(r["name_a"], r["name_b"]): r["edit_dist"] for r in rows}
    # within-block near match found once (distinct input)
    assert pairs == {("small bolt", "small rod"): 3}
    # cross-block near-identical names ("small bolt"/"large bolt", dist 4
    # anyway) and NULLs never surface


def test_blocked_fuzzy_pairs_orders_names(spark):
    df = spark.createDataFrame([("bb",), ("ba",), ("bc",)], ["name"])
    rows = blocked_fuzzy_pairs(
        df, "name", block_expr=F.substring(F.col("_name"), 1, 1), max_dist=1
    ).collect()
    assert all(r["name_a"] < r["name_b"] for r in rows)
    assert len(rows) == 3  # all three within-block pairs at dist 1


def test_sweepline_concurrency_matches_bruteforce(spark):
    """The running-sum sweep must equal the O(n^2) definition: peak
    over open-instants t of #{intervals with open <= t < close}
    (half-open). The DuckDB oracle replays the same sweep, so this
    brute-force check is the independent semantic pin."""
    import random

    from pyspark.sql import Window

    rng = random.Random(42)
    rows = []
    for key in range(8):
        for _ in range(40):
            a = rng.randint(0, 500)
            rows.append((key, a, a + rng.randint(0, 120)))
    expected = {}
    for key in range(8):
        iv = [(a, b) for k, a, b in rows if k == key]
        expected[key] = max(
            sum(1 for a2, b2 in iv if a2 <= a < b2) for a, _ in iv
        )

    df = spark.createDataFrame(rows, ["k", "open_t", "close_t"])
    deltas = df.select("k", F.col("open_t").alias("t"), F.lit(1).alias("d")).unionByName(
        df.select("k", F.col("close_t").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["k"]: r["mx"]
        for r in deltas.withColumn("run", F.sum("d").over(w))
        .groupBy("k")
        .agg(F.max("run").alias("mx"))
        .collect()
    }
    assert got == expected


def test_pagerank_matches_hand_model(spark):
    """Integer fixed-point PageRank equals a pure-Python replay of
    the same recurrence on a small graph (star: hub <-> 3 leaves) —
    and the hub outranks the leaves."""
    from pipelines_spark.operators.graph import SCALE, pagerank

    edges = [("h", x) for x in "abc"] + [(x, "h") for x in "abc"]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, iterations=2).collect()}

    nodes = ["h", "a", "b", "c"]
    base = SCALE // len(nodes)
    deg = {"h": 3, "a": 1, "b": 1, "c": 1}
    rank = {n: base for n in nodes}
    for _ in range(2):
        cin = {n: 0 for n in nodes}
        for s, d in edges:
            cin[d] += rank[s] // deg[s]
        rank = {n: (15 * base) // 100 + (85 * cin[n]) // 100 for n in nodes}
    assert got == rank
    assert got["h"] > got["a"] == got["b"] == got["c"]


def test_triangle_count_small_graphs(spark):
    from pipelines_spark.operators.graph import triangle_count

    # K4 has 4 triangles; duplicate/reversed edges and self-loops
    # must not change the count
    edges = [
        (a, b) for a in "abcd" for b in "abcd" if a != b
    ] + [("a", "a"), ("b", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert triangle_count(df).collect()[0]["n_triangles"] == 4

    # a square (no diagonal) has none
    sq = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], ["src", "dst"]
    )
    assert triangle_count(sq).collect()[0]["n_triangles"] == 0


def test_triangle_count_skewed_hub_graph(spark):
    """Power-law stress for the degree-ordered orientation: a hub
    wired to 60 spokes (star: 0 triangles) plus a chain of spoke-spoke
    edges closing exactly 10 triangles through the hub, plus one
    hub-free triangle. Under id-order the hub would fan out ~60²
    candidate pairs; degree-order keeps it as the order-MAX vertex so
    it never serves as the pair pivot — and the count is exact."""
    from pipelines_spark.operators.graph import triangle_count

    spokes = [f"s{i:02d}" for i in range(60)]
    edges = [("hub", s) for s in spokes]
    # 10 spoke-spoke edges, each closing one triangle with the hub
    edges += [(spokes[i], spokes[i + 30]) for i in range(10)]
    # one triangle that avoids the hub entirely
    edges += [("x", "y"), ("y", "z"), ("z", "x")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert triangle_count(df).collect()[0]["n_triangles"] == 11


def test_khop_reachability_path_graph(spark):
    """Path a-b-c-d from source a: hops 0,1,2 reached at max_hops=2;
    d unreachable within the bound; no node settles twice."""
    from pipelines_spark.operators.graph import khop_reachability

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "d"), ("d", "c")],
        ["src", "dst"],
    )
    srcs = spark.createDataFrame([("a",)], ["node"])
    got = {
        r["node"]: r["min_hops"]
        for r in khop_reachability(edges, srcs, max_hops=2).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}


def _lpa_reference(edges, iterations):
    """Pure-Python replay of synchronous label propagation with the
    operator's exact tie-break (count DESC, label ASC). Labels flow
    src -> dst, matching the join on labels.node == edges._s."""
    from collections import defaultdict

    uniq = sorted(set(edges))
    nodes = sorted({n for e in uniq for n in e})
    in_nbrs = defaultdict(list)
    for s, d in uniq:
        in_nbrs[d].append(s)
    labels = {n: n for n in nodes}
    for _ in range(iterations):
        nxt = {}
        for n in nodes:
            cnt = defaultdict(int)
            for s in in_nbrs[n]:
                cnt[labels[s]] += 1
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l)) if cnt else n
        labels = nxt
    return labels


def test_label_propagation_two_communities(spark):
    """Two triangles bridged by one edge: after 3 sync rounds the
    triangles settle into two distinct communities, and the result
    equals the pure-Python replay of the recurrence exactly (the
    determinism the DuckDB oracle relies on). Duplicate edges must
    not bias the neighbor-label counts."""
    from pipelines_spark.operators.graph import label_propagation

    und = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    edges = und + [(d, s) for s, d in und] + [("a", "b"), ("c", "x")]  # dups
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["label"] for r in label_propagation(df, iterations=3).collect()}
    assert got == _lpa_reference(edges, 3)
    # the bridge does not merge the triangles
    left = {got[n] for n in "abc"}
    right = {got[n] for n in "xyz"}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_checkpoint_staging_matches_local(spark, tmp_path):
    """staging="checkpoint" (reliable checkpoints, the 100 TB
    durability posture) returns the identical labeling as the default
    localCheckpoint mode."""
    from pipelines_spark.operators.graph import label_propagation

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    und = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    edges = und + [(d, s) for s, d in und]
    df = spark.createDataFrame(edges, ["src", "dst"])
    loc = {r["node"]: r["label"] for r in label_propagation(df, iterations=3).collect()}
    chk = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=3, staging="checkpoint").collect()
    }
    assert chk == loc


def test_community_modularity_hand_model(spark):
    """Two disjoint triangles with their component labeling: each
    community contributes 6/12 − (6/12)² = 0.25, total Q = 0.5. The
    degenerate one-community labeling contributes exactly 0 (internal
    = total, degree share = 1)."""
    from pipelines_spark.operators.graph import community_modularity

    und = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")]
    bi = und + [(d, s) for s, d in und]
    edges = spark.createDataFrame(bi, ["src", "dst"])
    labels = spark.createDataFrame(
        [(n, "a") for n in "abc"] + [(n, "x") for n in "xyz"], ["node", "label"]
    )
    got = {
        r["community"]: (
            r["n_members"],
            r["internal_edges"],
            r["degree_sum"],
            r["modularity_contrib"],
        )
        for r in community_modularity(edges, labels).collect()
    }
    assert got == {"a": (3, 3, 6, 0.25), "x": (3, 3, 6, 0.25)}
    one = spark.createDataFrame([(n, "all") for n in "abcxyz"], ["node", "label"])
    row = community_modularity(edges, one).collect()[0]
    assert row["modularity_contrib"] == 0.0 and row["internal_edges"] == 6


def test_bloom_prefilter_no_false_negatives_and_fpr_sane(spark):
    """Every true member passes the prefilter (the Bloom guarantee),
    and with m >> n the disjoint-probe pass rate (false positives) is
    small. Deterministic: same bitmap and pass set under any
    partitioning."""
    from pipelines_spark.operators.sketches import bloom_bitmap, bloom_prefilter

    members = spark.range(0, 500).withColumnRenamed("id", "k")
    bm = bloom_bitmap(members, "k", m_bits=1 << 14, k=3)
    # bitmap is slot-bounded: at most m/64 rows no matter the key count
    assert bm.count() <= (1 << 14) // 64
    # members all pass
    passed = bloom_prefilter(members, "k", bm, m_bits=1 << 14, k=3)
    assert passed.count() == 500
    # disjoint probes mostly rejected (n/m = 500/16384 -> FPR ~ 0.06%)
    outsiders = spark.range(10_000, 12_000).withColumnRenamed("id", "k")
    fp = bloom_prefilter(outsiders, "k", bm, m_bits=1 << 14, k=3).count()
    assert fp < 100, fp
    # partitioning-independent
    bm2 = bloom_bitmap(members.repartition(13), "k", m_bits=1 << 14, k=3)
    assert sorted(map(tuple, bm.collect())) == sorted(map(tuple, bm2.collect()))


def test_bloom_semi_reduction_equals_exact_semi_join(spark):
    """Prefilter + exact semi-join returns exactly the plain
    semi-join rows — the Bloom only prunes, never changes the
    answer."""
    from pipelines_spark.operators.sketches import bloom_bitmap, bloom_prefilter

    probe = spark.range(0, 3000).withColumnRenamed("id", "k")
    keys = spark.range(0, 3000, 7).withColumnRenamed("id", "k")  # every 7th
    bm = bloom_bitmap(keys, "k", m_bits=1 << 12, k=3)
    pre = bloom_prefilter(probe, "k", bm, m_bits=1 << 12, k=3)
    got = sorted(r["k"] for r in pre.join(keys, "k", "semi").collect())
    want = sorted(r["k"] for r in probe.join(keys, "k", "semi").collect())
    assert got == want
    # both probe modes pass the identical row set (literal embeds the
    # collected bitmap; join probes it as a broadcast table)
    lit_rows = sorted(r["k"] for r in pre.collect())
    join_rows = sorted(
        r["k"]
        for r in bloom_prefilter(
            probe, "k", bm, m_bits=1 << 12, k=3, mode="join"
        ).collect()
    )
    assert lit_rows == join_rows


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    """CMS guarantee: estimate >= exact frequency for EVERY key, and
    with far fewer keys than buckets (no forced collisions across all
    depth rows) the estimate is exact."""
    from pipelines_spark.operators.sketches import cms_estimate, cms_table

    rows = [(f"k{i % 37}",) for i in range(1000)]  # 37 keys, skewed 28/27
    df = spark.createDataFrame(rows, ["v"])
    sketch = cms_table(df, "v", depth=4, width=1024)
    probes = df.distinct()
    est = {r["v"]: r["cms_est"] for r in cms_estimate(sketch, probes, "v").collect()}
    exact = {r["v"]: r["cnt"] for r in df.groupBy("v").count().withColumnRenamed("count", "cnt").collect()}
    assert set(est) == set(exact)
    for k in exact:
        assert est[k] >= exact[k]
    # sketch is 37x4 updates into 4x1024 buckets: exact w.h.p., and the
    # deterministic md5 hashes make this reproducible, not flaky
    assert est == exact


def test_cms_overcount_bounded_under_forced_collisions(spark):
    """With width 2 every bucket collides: estimates still never
    undercount, and the min-over-rows estimate is <= total mass."""
    from pipelines_spark.operators.sketches import cms_estimate, cms_table

    rows = [("a",)] * 90 + [("b",)] * 9 + [("c",)]
    df = spark.createDataFrame(rows, ["v"])
    sketch = cms_table(df, "v", depth=3, width=2)
    est = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(sketch, df.distinct(), "v", depth=3, width=2).collect()
    }
    assert est["a"] >= 90 and est["b"] >= 9 and est["c"] >= 1
    assert all(v <= 100 for v in est.values())


def test_cms_join_size_never_undercounts_and_tight_when_sparse(spark):
    """Inner-product estimator: exact join size Σ_k fA(k)·fB(k) is a
    lower bound (collision terms are non-negative); at default width
    with a handful of keys there are no collisions and the estimate
    is EXACT."""
    from pipelines_spark.operators.sketches import cms_join_size, cms_table

    a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2 + [("w",)], ["k"])
    b = spark.createDataFrame([("x",)] * 3 + [("y",)] * 5 + [("z",)], ["k"])
    exact = 4 * 3 + 2 * 5  # w and z don't match
    est = cms_join_size(cms_table(a, "k"), cms_table(b, "k")).collect()[0]
    assert est["est_join_size"] == exact

    # forced collisions (width 2): still never an undercount
    est2 = cms_join_size(
        cms_table(a, "k", depth=3, width=2), cms_table(b, "k", depth=3, width=2)
    ).collect()[0]
    assert est2["est_join_size"] >= exact


def test_cms_mergeable(spark):
    """Summing two sketches per (row_idx, bucket) equals the sketch of
    the concatenated input — the mergeability contract."""
    from pyspark.sql import functions as F

    from pipelines_spark.operators.sketches import cms_table

    d1 = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, ["v"])
    d2 = spark.createDataFrame([("y",)] * 2 + [("z",)] * 7, ["v"])
    merged = (
        cms_table(d1, "v").unionByName(cms_table(d2, "v"))
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_table(d1.unionByName(d2), "v")
    a = {(r["row_idx"], r["bucket"]): r["cnt"] for r in merged.collect()}
    b = {(r["row_idx"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert a == b


def test_hll_estimate_within_error(spark):
    from pipelines_spark.operators.sketches import hll_distinct

    n = 30_000
    df = spark.range(n).select((F.col("id") % 9_973).alias("v"))  # 9973 distinct
    row = hll_distinct(df, "v", b=8).collect()[0]
    assert row["m"] == 256
    # ~1.04/sqrt(256) ~ 6.5% expected relative error; allow 3 sigma
    assert abs(row["est_distinct"] - 9_973) / 9_973 < 0.20


def test_hll_partitioning_independent(spark):
    from pipelines_spark.operators.sketches import hll_distinct

    df = spark.range(5_000).select((F.col("id") * 13 % 4_001).alias("v"))
    a = hll_distinct(df.repartition(1), "v").collect()[0]
    b = hll_distinct(df.repartition(17), "v").collect()[0]
    assert a == b


def test_hll_registers_merge_is_union(spark):
    """MAX-per-bucket of two disjoint halves' registers == registers
    of the union: the mergeability contract that lets per-day sketches
    roll up without touching raw data."""
    from pipelines_spark.operators.sketches import hll_registers

    df = spark.range(8_000).select((F.col("id") % 3_001).alias("v"))
    left = hll_registers(df.filter(F.col("v") % 2 == 0), "v")
    right = hll_registers(df.filter(F.col("v") % 2 == 1), "v")
    merged = (
        left.unionByName(right)
        .groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    whole = hll_registers(df, "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_small_range_uses_linear_counting(spark):
    from pipelines_spark.operators.sketches import hll_distinct

    # 50 distincts over 256 buckets: deep in the linear-counting regime
    df = spark.range(50).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v").collect()[0]
    assert row["zeros"] > 0
    assert abs(row["est_distinct"] - 50) <= 10


def test_hll_by_group_matches_per_group_global(spark):
    """Each group's grouped-HLL estimate must equal a global HLL run
    on that group alone — same hash, same registers, same estimator."""
    from pipelines_spark.operators.sketches import hll_distinct, hll_distinct_by

    df = spark.range(6_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 997).alias("v"),
    )
    grouped = {
        r["g"]: (r["n_used"], r["zeros"], r["est_distinct"])
        for r in hll_distinct_by(df, "v", ["g"]).collect()
    }
    for g in ("0", "1", "2"):
        solo = hll_distinct(df.filter(F.col("g") == g), "v").collect()[0]
        assert grouped[g] == (solo["n_used"], solo["zeros"], solo["est_distinct"])


def test_psi_drift_zero_for_identical_and_positive_for_shift(spark):
    from pipelines_spark.operators.drift import psi_drift

    base = [(i, "g", float(i % 100)) for i in range(1000)]
    shifted = [(i, "g", float(i % 100) + 60.0) for i in range(1000)]
    ref = spark.createDataFrame(base, ["id", "grp", "v"])
    same = psi_drift(ref, ref, "v", ["grp"]).collect()[0]
    assert same["psi"] == 0.0 and same["n_ref"] == 1000
    cur = spark.createDataFrame(shifted, ["id", "grp", "v"])
    moved = psi_drift(ref, cur, "v", ["grp"]).collect()[0]
    assert moved["psi"] > 0.25  # rule-of-thumb "action" threshold


def test_psi_drift_partitioning_independent(spark):
    from pipelines_spark.operators.drift import psi_drift

    rows = [(i, "a" if i % 2 else "b", float((i * 37) % 250)) for i in range(2000)]
    ref = spark.createDataFrame(rows[:1000], ["id", "grp", "v"])
    cur = spark.createDataFrame(rows[1000:], ["id", "grp", "v"])
    one = sorted(map(tuple, psi_drift(ref, cur, "v", ["grp"]).collect()))
    many = sorted(
        map(
            tuple,
            psi_drift(ref.repartition(11), cur.repartition(7), "v", ["grp"]).collect(),
        )
    )
    assert one == many


def test_ses_closed_form_matches_recursion(spark):
    """The one-shot weighted aggregation must equal the textbook
    l_t = a*y_t + (1-a)*l_{t-1} recursion (modulo the documented 6-dp
    term rounding)."""
    import datetime

    from pipelines_spark.queries import w13_ses_forecast

    # reuse the real query at sf0.001 and recompute its inputs in python
    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in w13_ses_forecast(spark, sf).collect()}
    daily = (
        spark.table("events")
        .where("value is not null")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.expr("CAST(value AS DECIMAL(18,6))")).cast("double").alias("y"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["y"]))
    for et, pts in series.items():
        ys = [y for _, y in sorted(pts)]
        level = ys[0]
        for y in ys[1:]:
            level = 0.3 * y + 0.7 * level
        assert abs(got[et]["forecast"] - level) < 1e-3
        assert got[et]["n_days"] == len(ys)


def test_kmv_set_ops_accuracy_and_plan(spark):
    """Per-group KMV: sketch-derived union/intersection estimates land
    within sketch error of truth, and the per-group top-k compiles to
    WindowGroupLimit (bounded map-side output, no full sort)."""
    from pipelines_spark.operators.sketches import (
        kmv_candidates_by,
        kmv_estimate_from_candidates,
    )

    # |A| = 6000, |B| = 6000, |A ∩ B| = 2000
    a = spark.range(6_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(4_000, 10_000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    df = a.union(b)
    cand = kmv_candidates_by(df, "v", "g", k=256)
    assert "WindowGroupLimit" in cand._jdf.queryExecution().toString()
    est_a = kmv_estimate_from_candidates(
        cand.filter(F.col("g") == "a").select("h"), 256
    ).collect()[0]["est_distinct"]
    est_u = kmv_estimate_from_candidates(cand.select("h"), 256).collect()[0][
        "est_distinct"
    ]
    assert abs(est_a - 6_000) / 6_000 < 0.25
    assert abs(est_u - 10_000) / 10_000 < 0.25
    inter = est_a + est_a - est_u  # symmetric sets
    assert abs(inter - 2_000) < 1_500  # inclusion-exclusion compounds error


def test_iterative_operators_checkpoint_staging(spark, tmp_path):
    """VERDICT r6 item 3: the durable-staging knob. Every iterative
    operator accepts staging="checkpoint" (reliable checkpoints under
    setCheckpointDir — the 100 TB posture where executor loss must
    not kill a multi-hour loop) and produces results identical to the
    default executor-local staging. plans/staging.py documents the
    durability/speed trade; docs/SCALE.md records it."""
    from pipelines_spark.llm.dedup import connected_components, semantic_dedup
    from pipelines_spark.operators.graph import (
        ancestor_closure,
        khop_reachability,
        pagerank,
        triangle_count,
    )

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("x", "y")],
        ["src", "dst"],
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    for op in (
        lambda st: pagerank(edges, iterations=2, staging=st),
        lambda st: triangle_count(edges, staging=st),
        lambda st: khop_reachability(
            edges, edges.selectExpr("src as node").limit(1), max_hops=2, staging=st
        ),
        lambda st: ancestor_closure(
            edges.selectExpr("src as node", "dst as parent"), max_depth=4, staging=st
        ),
        lambda st: connected_components(
            edges.selectExpr("src as id_a", "dst as id_b"), staging=st
        ),
    ):
        assert rows(op("local")) == rows(op("checkpoint"))

    import numpy as np

    rng = np.random.default_rng(5)
    vecs = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(30)]
        + [(100 + i, (rng.normal(size=8) * 1e-9 + 1.0).tolist()) for i in range(3)],
        ["vec_id", "embedding"],
    )
    a = rows(semantic_dedup(vecs, n_clusters=4, dim=8, staging="local"))
    b = rows(semantic_dedup(vecs, n_clusters=4, dim=8, staging="checkpoint"))
    assert a == b and len(a) >= 1
