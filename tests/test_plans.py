"""Model runner (dbt-equivalent), check harness, cost guard."""

import pytest

from pyspark.sql import functions as F

from pipelines_spark.plans.checks import Check, run_checks
from pipelines_spark.plans.cost_guard import ScanTooLargeError, guard_scan
from pipelines_spark.plans.models import ModelRunner, SqlModel


@pytest.fixture()
def base_view(spark):
    spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0), (3, "2024-01-03", 30.0)],
        "id long, d string, v double",
    ).createOrReplaceTempView("base_tbl")


def test_model_runner_dependency_order_and_vars(spark, base_view):
    models = [
        SqlModel(
            name="daily",
            sql="SELECT d, sum(v) AS total FROM base_tbl "
                "WHERE d >= '{date_range_start}' GROUP BY d",
        ),
        SqlModel(name="grand", sql="SELECT sum(total) AS g FROM daily", depends_on=["daily"]),
    ]
    out = ModelRunner(spark, models).run(variables={"date_range_start": "2024-01-02"})
    assert out["grand"].collect()[0]["g"] == 50.0


def test_model_runner_graph_selection(spark, base_view):
    models = [
        SqlModel(name="a", sql="SELECT * FROM base_tbl"),
        SqlModel(name="b", sql="SELECT * FROM a", depends_on=["a"]),
        SqlModel(name="c", sql="SELECT * FROM b", depends_on=["b"]),
    ]
    runner = ModelRunner(spark, models)
    assert list(runner.run(select="+b")) == ["a", "b"]
    assert list(runner.run(select="b+")) == ["b", "c"]


def test_incremental_model_overwrites_only_touched_partitions(spark, base_view, tmp_path):
    path = str(tmp_path / "inc")
    model = SqlModel(
        name="inc",
        sql="SELECT id, v, d AS data_particao FROM base_tbl "
            "WHERE d BETWEEN '{start}' AND '{end}'",
        materialization="incremental",
        path=path,
        partition_cols=["data_particao"],
    )
    runner = ModelRunner(spark, [model])
    runner.run(variables={"start": "2024-01-01", "end": "2024-01-02"})
    assert spark.read.parquet(path).count() == 2
    # re-run a single day: its partition is replaced, other days kept
    runner.run(variables={"start": "2024-01-02", "end": "2024-01-03"})
    out = spark.read.parquet(path)
    assert out.count() == 3
    assert out.filter(F.col("data_particao") == "2024-01-02").count() == 1


def test_checks(spark, base_view):
    checks = [
        Check(name="no_negative_v", sql="SELECT * FROM base_tbl WHERE v < 0"),
        Check(name="has_rows", sql="SELECT count(*) > 0 FROM base_tbl", kind="expect_true"),
        Check(name="will_fail", sql="SELECT * FROM base_tbl WHERE v > {threshold}"),
    ]
    results = run_checks(spark, checks, variables={"threshold": "25"})
    by_name = {r.name: r for r in results}
    assert by_name["no_negative_v"].passed
    assert by_name["has_rows"].passed
    assert not by_name["will_fail"].passed


def test_cost_guard(spark, sf_medium):
    df = spark.read.parquet(f"{sf_medium}/lineitem.parquet")
    guard_scan(df, max_bytes=10 * 1024**3)  # passes
    with pytest.raises(ScanTooLargeError):
        guard_scan(df, max_bytes=1024)


def test_join_advisor_recommendations(spark):
    """Sketch-driven pre-flight: tiny side → broadcast; hot key →
    salted_join; and the CMS output estimate is exact when
    collision-free."""
    from pipelines_spark.plans.advisor import advise_join

    dim = spark.createDataFrame([(i, f"n{i}") for i in range(20)], "k long, name string")
    fact = spark.createDataFrame(
        [(i % 20, "x" * 50) for i in range(2000)], "k long, payload string"
    )
    adv = advise_join(fact, dim, "k")
    assert adv.recommendation == "broadcast_b"
    assert adv.est_join_size == 2000  # every fact row matches once
    assert adv.n_rows_a == 2000 and adv.n_rows_b == 20

    # skew: one key holds half of a big (past-broadcast-budget) side
    skewed = spark.createDataFrame(
        [((0 if i % 2 == 0 else i), "y" * 40) for i in range(4000)],
        "k long, payload string",
    )
    other = spark.createDataFrame(
        [(i, "z" * 40) for i in range(4000)], "k long, p2 string"
    )
    adv2 = advise_join(skewed, other, "k", broadcast_bytes=1000)
    assert adv2.recommendation == "salted_join"
    assert adv2.top_key_share_a > 0.4
    assert "one reducer" in adv2.reason

    # no skew, both big → plain shuffle
    adv3 = advise_join(other, other, "k", broadcast_bytes=1000)
    assert adv3.recommendation == "shuffle_join"
    assert adv3.est_join_size >= 4000
