"""Column-level dataset profiler — the summary a pipeline runs before
trusting a new feed.

The reference inspects incoming feeds ad hoc (per-flow pandas
``describe``-style checks before load; reference spec:
pipelines/utils dump-to-datalake pre-checks). This operator is the
engine-native form: one DataFrame in, one long-format profile out —
per column: row count, non-null count, distinct count, min and max
(stringified so heterogeneous columns share one schema).

Scale shape: a single global aggregate. With ``exact=True`` the
distinct counts use COUNT(DISTINCT col) — Spark plans the N distinct
aggregates with one Expand (rows × N), which is the exact-answer
price and fine up to mid-scale. At 100 TB pass ``exact=False``:
``approx_count_distinct`` (HyperLogLog++) keeps the whole profile a
one-pass partial-merge aggregate with O(columns × 2^p) state and no
Expand. min/max/count are partial-merge either way. The wide→long
pivot is a literal-array explode on the single result row — no
second job, no re-scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    exact: bool = True,
    rsd: float = 0.01,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns one row per column:
    (col_name, n_rows, n_non_null, n_distinct, min_value, max_value)
    with min/max cast to string. ``exact=False`` swaps COUNT(DISTINCT)
    for approx_count_distinct(rsd) — the 100 TB posture.
    """
    cols = list(columns) if columns is not None else [c for c, _ in df.dtypes]
    if not cols:
        raise ValueError("no columns to profile")

    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"_nn_{c}"))
        distinct = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c), rsd)
        )
        aggs.append(distinct.cast("bigint").alias(f"_nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))

    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n_rows").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_non_null"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("_s")).select("_s.*")


def profile_columns_hll(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    b: int = 8,
) -> DataFrame:
    """The 100 TB profile with an ORACLE-REPLAYABLE estimator: distinct
    counts come from the repo's own cross-engine md5 HyperLogLog
    registers (operators/sketches.py::hll_distinct_by) instead of
    COUNT(DISTINCT) (whose Expand multiplies shuffle rows × columns)
    or ``approx_count_distinct`` (whose HLL++ registers are
    engine-internal — correct, but only rows-checkable). Every
    register here is a pure function of the value set, so a SQL
    oracle replays the estimate bit-for-bit.

    Plan shape: one typed partial-merge aggregate for
    rows/non-null/min/max, plus one melt (literal-array explode →
    (col_name, value-as-string)) feeding the (col, bucket) register
    aggregation — partial state is columns × 2^b registers per
    partition, and the shuffle carries O(partitions × columns × 2^b)
    rows regardless of input size. No Expand anywhere (pinned in
    tests/test_sketches.py).

    Returns (col_name, n_rows, n_non_null, est_distinct, min_value,
    max_value); min/max are typed aggregates cast to string, same as
    :func:`profile_columns`.
    """
    from pipelines_spark.operators.sketches import hll_distinct_by

    cols = list(columns) if columns is not None else [c for c, _ in df.dtypes]
    if not cols:
        raise ValueError("no columns to profile")

    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"_nn_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n_rows").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_non_null"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    base = wide.select(F.explode(F.array(*structs)).alias("_s")).select("_s.*")

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("_m")
    ).select("_m.*")
    est = hll_distinct_by(melted, "value", ["col_name"], b=b).select(
        "col_name", "est_distinct"
    )
    return base.join(est, "col_name", "left").select(
        "col_name", "n_rows", "n_non_null", "est_distinct",
        "min_value", "max_value",
    )
