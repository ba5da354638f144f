"""Join operators: anti, range/interval, kNN (SURVEY §2.5).

Reference shapes: left-anti new-rows-vs-state dedup
(pipelines/rj_cor/utils.py:60-64, merge-indicator idiom), date-range
interval join (pipelines/rj_smtr/constants.py:190-196), cross join +
distance ranking keep-top-k (pipelines/rj_escritorio/rain_dashboard/
constants.py:169-205).

Scale notes:
- anti_join broadcasts the (small) state side by default — the state
  table is per-key watermarks, orders of magnitude smaller than the
  fact side; a broadcast left-anti is a map-only stage, zero shuffle
  of the 100 TB side.
- range_join expresses the interval predicate declaratively so AQE /
  the optimizer can pick broadcast-nested-loop for a small dim side
  rather than a full cartesian.
- knn_join is the exact small-dims variant (cross join + window
  top-k). For large candidate sets use llm.similarity's bucketed
  variant instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def anti_join(
    df: DataFrame,
    state: DataFrame,
    on: list[str],
    *,
    broadcast_state: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose key is absent from ``state``."""
    right = F.broadcast(state) if broadcast_state else state
    return df.join(right.select(*on).dropDuplicates(on), on, "left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    equi: list[str] | None = None,
    point: str | Column,
    lower: str | Column,
    upper: str | Column,
    how: str = "inner",
    null_open: bool = True,
) -> DataFrame:
    """Join where ``left.point BETWEEN right.lower AND right.upper``.

    ``null_open=True`` treats NULL bounds as open intervals (the
    reference's feed_start/feed_end semantics).
    """
    p = left[point] if isinstance(point, str) else point
    lo = right[lower] if isinstance(lower, str) else lower
    hi = right[upper] if isinstance(upper, str) else upper
    if null_open:
        cond = (lo.isNull() | (p >= lo)) & (hi.isNull() | (p <= hi))
    else:
        cond = p.between(lo, hi)
    for k in equi or []:
        cond = cond & (left[k] == right[k])
    return left.join(right, cond, how)


def knn_join(
    points: DataFrame,
    anchors: DataFrame,
    *,
    point_id: str,
    distance: Column,
    k: int,
    tiebreak: list[Column] | None = None,
) -> DataFrame:
    """For each row of ``points``, the ``k`` nearest rows of
    ``anchors`` by ``distance`` (a Column over the joined schema).

    ``anchors`` is broadcast — the anchor set (stations, centroids)
    is assumed small; the cross join is then map-side only and the
    window top-k shuffles on ``point_id`` once.
    """
    joined = points.crossJoin(F.broadcast(anchors)).withColumn("_dist", distance)
    order = [F.col("_dist").asc()] + [c.asc() for c in (tiebreak or [])]
    w = Window.partitionBy(point_id).orderBy(*order)
    return (
        joined.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .withColumnRenamed("_dist", "distance")
        .withColumnRenamed("_rank", "rank")
    )
