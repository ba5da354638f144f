"""Stream-stream event-time joins.

The reference enriches captured streams against other captured tables
in batch (re-reading staging between captures); Structured Streaming
can do it online, but ONLY safely when both sides carry watermarks and
the join condition bounds event-time skew — otherwise each side's
state store grows without bound waiting for arbitrarily late matches.
This module packages that contract so callers cannot accidentally
build the unbounded-state version.

At scale: join state is partitioned by key (same hash shuffle as a
batch equi-join); the watermark + time-range condition lets Spark
evict per-key state once the other side's watermark passes, so state
size is O(keys active within the skew window), independent of stream
lifetime.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    max_skew: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on ``keys`` with a bounded
    event-time range: right rows match only within
    ``[left_ts - max_skew, left_ts + max_skew]``.

    Both inputs get ``withWatermark`` and the condition includes the
    time bound — the two requirements Spark enforces (inner: for state
    eviction; outer: for emitting unmatched rows at all). ``left_ts``
    and ``right_ts`` must be distinct column names, since both survive
    into the output for downstream window/dedup logic.

    ``how``: ``inner`` or ``leftOuter`` (right-side columns NULL for
    left rows with no in-window match, emitted once the right
    watermark passes the window).
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    key_cond = reduce(
        lambda a, b: a & b, [lw[k] == rw[k] for k in keys]
    )
    time_cond = (
        F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_skew}")
    ) & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_skew}"))
    joined = lw.join(rw, key_cond & time_cond, how)
    # de-duplicate the key columns (keep the left side's)
    return joined.drop(*[rw[k] for k in keys])
