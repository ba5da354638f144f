"""Streaming sessionization: native session windows over an event
stream.

The reference's closest analog is its per-key watermark/last-reading
state (SURVEY T3); session windows are part of the beyond-the-
reference training-data surface (w6_sessionize is the batch
equivalent). Structured Streaming's ``session_window`` handles the
merge logic in the state store: a session extends while events arrive
within ``gap``, closes when the watermark passes session end, and the
closed aggregate emits exactly once (append mode). State per key is
bounded by the watermark — the scale contract for an unbounded
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionized(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Session aggregation over a streaming (or batch) DataFrame:
    one row per closed session with start/end/event count.

    In streaming mode pair with ``outputMode("append")`` so sessions
    emit only when finalized by the watermark.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value") if "value" in events.columns else F.count(F.lit(1)).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
