"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes the full operator inventory (SURVEY.md §2 +
LLM-data-pipeline operators) as (spark, sf_dir) callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL per key.

Implementations live in ``pipelines_spark.queries`` (Spark) and
``pipelines_spark.oracles`` (oracle SQL); tests/test_oracle_parity.py
runs both engines side-by-side and compares, replicating the driver's
correctness gate locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipelines_spark.oracles import ORACLES
from pipelines_spark.queries import QUERIES, q1_pricing_summary

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM ops)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each ``queries()`` key."""
    return dict(ORACLES)
