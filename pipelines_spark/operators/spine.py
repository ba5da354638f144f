"""Time-spine generation and capture-gap detection (SURVEY T4/J5).

The reference's completeness mechanism: generate the expected
timestamp spine for a window, left-join against the success log, and
every spine point without a success row becomes a recapture candidate,
capped per run (reference: pipelines/rj_smtr/tasks.py:437-558
``query_logs`` — GENERATE_TIMESTAMP_ARRAY + UNNEST + left join where
``sucesso IS NOT TRUE``; cap 90 at :442,542-556).

Spark-native: ``sequence() + explode`` builds the spine without any
driver-side loop; the anti-join against logs prunes on the log
table's date partitions. The spine for a bounded lookback window is
tiny (days × 1440 minutes), so the join broadcasts it.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The reference defers any backlog beyond this many recaptures.
DEFAULT_RECAPTURE_CAP = 90


def time_spine(
    spark: SparkSession,
    start: datetime | str,
    end: datetime | str,
    *,
    interval: str = "1 minute",
    ts_col: str = "timestamp_captura",
) -> DataFrame:
    """One row per expected capture timestamp in ``[start, end]``."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"INTERVAL {interval}"),
            )
        ).alias(ts_col)
    )


def find_gaps(
    spine: DataFrame,
    logs: DataFrame,
    *,
    ts_col: str = "timestamp_captura",
    success_col: str = "sucesso",
    cap: int | None = DEFAULT_RECAPTURE_CAP,
) -> DataFrame:
    """Spine timestamps with no success row — the recapture list.

    A timestamp counts as captured only if some log row for it has
    ``sucesso = true`` (failed attempts still need recapture). Output
    is ordered oldest-first and capped like the reference.
    """
    ok = (
        logs.filter(F.col(success_col) == F.lit(True))
        .select(F.col(ts_col))
        .dropDuplicates([ts_col])
    )
    gaps = spine.join(F.broadcast(ok), [ts_col], "left_anti").orderBy(ts_col)
    return gaps.limit(cap) if cap else gaps
