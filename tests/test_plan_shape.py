"""Physical-plan shape assertions: the scale contract.

These tests pin the plan properties that matter at 100 TB: filters
and projections reaching the parquet scan, broadcast joins for small
dims, window-group-limit pushdown for top-k, no Python UDFs in
built-in operator paths.
"""

import contextlib
import io

from pyspark.sql import functions as F

from pipelines_spark.queries import QUERIES, register


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _final_plan(df) -> str:
    """Plan after execution — under AQE the codegen'd final stages
    only exist once the adaptive plan is finalized."""
    df.write.format("noop").mode("overwrite").save()
    return _formatted(df)


def test_incremental_filter_pushed_to_scan(spark, sf_medium):
    df = QUERIES["f6_pruned_incremental_scan"](spark, sf_medium)
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_column_pruning_reaches_scan(spark, sf_medium):
    register(spark, sf_medium, ("lineitem",))
    df = spark.table("lineitem").select("l_orderkey").filter(F.col("l_orderkey") > 100)
    plan = _formatted(df)
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan


def test_dim_joins_are_broadcast(spark, sf_medium):
    plan = _plan(QUERIES["j1_orders_enriched"](spark, sf_medium))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_window_group_limit(spark, sf_medium):
    plan = _plan(QUERIES["embed_knn_topk"](spark, sf_medium))
    assert "WindowGroupLimit" in plan


def test_no_python_udf_in_relational_paths(spark, sf_medium):
    for name in (
        "q1_pricing_summary",
        "dedup_minhash_lsh",
        "text_quality_by_source",
        "embed_knn_topk",
    ):
        plan = _plan(QUERIES[name](spark, sf_medium))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_whole_inventory_stays_off_the_python_slow_path(spark, sf_medium):
    """Sweep EVERY query: row-at-a-time Python (BatchEvalPython) is
    banned everywhere, and — r12 — so is Arrow-batched Python
    (ArrowEvalPython): the last holdouts (the IVF/SemDeDup numpy-
    matmul cell assignments) became JVM greatest-folds over
    constant-folded centroid literals, so the whole registry now
    executes without crossing the JVM↔Python boundary."""
    arrow_allowed: set[str] = set()
    for name, fn in QUERIES.items():
        plan = _plan(fn(spark, sf_medium))
        assert "BatchEvalPython" not in plan, name
        if name not in arrow_allowed:
            assert "ArrowEvalPython" not in plan, name


def test_no_registered_query_returns_bare_array_or_map(spark, sf_medium):
    """Driver-contract pin: the driver's DuckDB-oracle harness
    canonicalizes results via pandas sort_values over all columns,
    which crashes on unhashable cells (list/dict). Every registered
    query must therefore serialize collection outputs to scalars
    (concat_ws / to_json), the lesson of er_part_name_clusters'
    red r8 row. Schema-only check — no execution needed."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, fn in QUERIES.items():
        for field in fn(spark, sf_medium).schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, offenders


def test_whole_stage_codegen_in_flagship(spark, sf_medium):
    # AQE's AdaptiveSparkPlan hides codegen subtrees until runtime —
    # disable it for the probe so EXPLAIN CODEGEN sees the stages.
    df = QUERIES["q1_pricing_summary"](spark, sf_medium)
    df.createOrReplaceTempView("_q1_plan_probe")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = spark.sql("EXPLAIN CODEGEN SELECT * FROM _q1_plan_probe").collect()[0][0]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in out
    assert "Found 0 WholeStageCodegen" not in out


def test_exists_becomes_semi_join(spark, sf_medium):
    plan = _plan(QUERIES["q4_order_priority"](spark, sf_medium))
    assert "LeftSemi" in plan


def test_q6_predicates_pushed_to_scan(spark, sf_medium):
    plan = _formatted(QUERIES["q6_forecast_revenue"](spark, sf_medium))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan


def test_ivf_corpus_assignment_is_map_only(spark, sf_medium, monkeypatch):
    # the corpus-side cell assignment must not shuffle: the only
    # exchanges allowed are the candidate equi-join's broadcast and
    # the final top-k window partitioning on query_id (the register()
    # scan widen is infrastructural and pinned separately — probe the
    # un-widened plan)
    monkeypatch.setenv("SPARK_GRAFT_NO_WIDEN", "1")
    plan = _plan(QUERIES["embed_ivf_ann"](spark, sf_medium))
    import re

    shuffles = re.findall(r"Exchange (\w+)", plan)
    non_broadcast = [s for s in shuffles if s.startswith("hashpartitioning")]
    assert len(non_broadcast) <= 1, shuffles


def test_asof_join_single_shuffle(spark, sf_medium, monkeypatch):
    from pipelines_spark.operators.joins import asof_join

    monkeypatch.setenv("SPARK_GRAFT_NO_WIDEN", "1")
    register(spark, sf_medium, ("events",))
    ev = spark.table("events")
    left = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    plan = _plan(asof_join(left, right, on="user_id"))
    # one hash exchange for the per-key sort window; no band join
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q19_disjunction_decomposed_to_scans(spark, sf_medium):
    """The OR-of-AND-brackets spans both join sides; Catalyst must
    extract the per-side implied disjunctions and push them into each
    scan (classic predicate decomposition) rather than filtering only
    after the join."""
    plan = _formatted(QUERIES["q19_bracket_predicates"](spark, sf_medium)).replace(" ", "")
    # part side: the brand/size disjunction reaches the part scan
    assert "And(EqualTo(p_brand,Brand#12)" in plan, plan
    # lineitem side: the quantity-envelope disjunction is pushed too
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan, plan


def test_q22_decorrelates_to_anti_join(spark, sf_medium):
    """NOT EXISTS must decorrelate into a (broadcast) anti-join and
    the scalar avg subquery must not force a per-row re-evaluation."""
    plan = _plan(QUERIES["q22_global_sales_opportunity"](spark, sf_medium))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_srp_precomputed_bucket_skips_corpus_recompute(spark, sf_medium, tmp_path):
    """With the bucket key persisted as a lake column, the ANN probe
    reads it off the scan (ReadSchema carries srp_bucket) instead of
    re-deriving the dim×n_planes projection over the corpus — and the
    result is identical to the recomputed variant."""
    from pipelines_spark.llm.similarity import srp_bucketed_topk, with_srp_bucket

    emb = spark.read.parquet(f"{sf_medium}/embeddings.parquet")
    lake = str(tmp_path / "emb_bucketed")
    with_srp_bucket(emb).write.parquet(lake)

    corpus = spark.read.parquet(lake)
    queries = emb.filter(F.col("vec_id") < 10)
    pre = srp_bucketed_topk(corpus, queries, corpus_bucket_col="srp_bucket")
    plan = _formatted(pre)
    # the corpus-side scan projects the stored key
    assert any(
        "srp_bucket" in line for line in plan.splitlines() if "ReadSchema" in line
    ), plan
    # parity with the recomputed path
    recomputed = srp_bucketed_topk(emb, queries)
    assert sorted(map(tuple, pre.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


def test_decontamination_probe_is_broadcast(spark, sf_medium):
    """The probe (benchmark) side must broadcast — a shuffle join here
    would re-shuffle the full corpus shingle stream at 100 TB."""
    plan = _plan(QUERIES["text_decontamination"](spark, sf_medium))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
