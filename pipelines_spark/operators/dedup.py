"""Dedup / last-row-per-key operators.

Reference: keep-first dedup on key subsets
(pipelines/rj_smtr/br_rj_riodejaneiro_onibus_gps/tasks.py:246-248) and
``sort_values().groupby().tail(1)`` last-row-per-key
(pipelines/utils/utils.py:1096-1099).

Scale notes: ``max_by`` keeps last-row-per-key as a hash aggregation
with map-side partial aggregation — one shuffle, no sort, no window
materialization. The window variant is kept for when the full row
(many columns) must survive: a window with ``row_number`` shuffles
once on the key too, but sorts within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_duplicates(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Keep one arbitrary-but-deterministic-per-run row per key."""
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()


def last_row_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    *,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Latest row per key, deterministic under ties via ``tiebreak``."""
    ordering = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
