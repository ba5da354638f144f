from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pipelines_spark.operators.frequency import heavy_hitters


def _skewed(spark, n_partitions):
    # 3 heavy keys (shares 30%/20%/11%) + 3900 singleton keys: the
    # candidate path must prune the tail, not just pass everything
    heavy = [(0,)] * 3000 + [(1,)] * 2000 + [(2,)] * 1100
    tail = [(i,) for i in range(10, 3910)]
    return spark.createDataFrame(heavy + tail, "key long").repartition(n_partitions)


def test_exact_heavy_hitters_with_tight_capacity(spark):
    df = _skewed(spark, 8)
    # k=10 (threshold 10% of 10000 rows = 1000): keys 0,1,2 qualify.
    # capacity=k exactly — the minimal guaranteed configuration
    got = {
        (r["key"], r["cnt"])
        for r in heavy_hitters(df, "key", k=10, capacity=10).collect()
    }
    assert got == {(0, 3000), (1, 2000), (2, 1100)}


def test_output_is_partitioning_independent(spark):
    expect = {(0, 3000), (1, 2000), (2, 1100)}
    for parts in (1, 3, 32):
        got = {
            (r["key"], r["cnt"])
            for r in heavy_hitters(_skewed(spark, parts), "key", k=10).collect()
        }
        assert got == expect, f"partitions={parts}"


def test_boundary_is_strict(spark):
    # 4 keys x 25 rows each: share exactly 1/4 — "more than total/k"
    # must exclude them at k=4 and include them at k=5
    df = spark.createDataFrame([(i % 4,) for i in range(100)], "key long")
    assert heavy_hitters(df, "key", k=4).count() == 0
    assert heavy_hitters(df, "key", k=5).count() == 4


def test_capacity_floor_enforced(spark):
    # capacity below k silently loses the no-false-negative guarantee,
    # so the operator must raise it to k internally
    df = _skewed(spark, 8)
    got = {r["key"] for r in heavy_hitters(df, "key", k=10, capacity=2).collect()}
    assert got == {0, 1, 2}


def test_nulls_and_strings(spark):
    rows = [("a",)] * 50 + [(None,)] * 30 + [("b",)] * 5 + [("c",)] * 15
    df = spark.createDataFrame(rows, "key string")
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=4).collect()}
    # threshold 25: a(50) and NULL(30) qualify
    assert got == {("a", 50), (None, 30)}


def test_semantic_dedup_smoke(spark):
    import numpy as np

    from pipelines_spark.llm.dedup import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
        # ids 100+i are exact duplicates of ids i -> cosine 1.0,
        # same cluster by construction
        rows.append((100 + i, [float(x) for x in v], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")
    out = semantic_dedup(df, n_clusters=4, iters=1, threshold=0.99, dim=64)
    got = {(r["vec_id"], r["canonical_id"]) for r in out.collect()}
    # every duplicate is pruned toward its lower-id twin
    assert {(100 + i, i) for i in range(20)} <= got
    # no original is pruned by its own twin (canonical is always lower)
    assert all(v > c for v, c in got)


def test_lsh_tuner_scurve_math():
    from pipelines_spark.llm.dedup import lsh_collision_probability, lsh_tune

    # hand-checked S-curve point: s=0.5, b=8, r=4 -> 1-(1-0.0625)^8
    p = lsh_collision_probability(0.5, 8, 4)
    assert abs(p - (1 - (1 - 0.5**4) ** 8)) < 1e-12

    out = lsh_tune(0.5, num_hashes=32)
    assert out["bands"] * out["rows_per_band"] == 32
    # the estimated threshold lands near the target
    assert abs(out["estimated_threshold"] - 0.5) < 0.2
    # the curve is steep around the threshold: far-below pairs rarely
    # collide, far-above pairs almost surely do
    b, r = out["bands"], out["rows_per_band"]
    assert lsh_collision_probability(0.2, b, r) < 0.35
    assert lsh_collision_probability(0.8, b, r) > 0.9

    # weight asymmetry shifts the curve: recall-biased tuning picks
    # parameters with lower false-negative mass
    recall = lsh_tune(0.5, num_hashes=32, false_negative_weight=10.0)
    assert recall["false_negative_mass"] <= out["false_negative_mass"]

    with pytest.raises(ValueError):
        lsh_tune(1.5)
