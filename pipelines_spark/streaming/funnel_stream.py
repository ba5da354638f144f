"""Streaming twin of the batch funnel (operators/funnel.py) —
per-user ordered-step progression tracked in-stream.

The reference's streaming surface is per-key last-update state (see
``streaming/stateful.py`` provenance); this operator carries the SAME
greedy-earliest funnel fold across micro-batches with
``applyInPandasWithState``: GroupState per user holds just
``(step, t)`` — O(1) regardless of history — and each batch folds its
(batch-sorted) rows on top of it, emitting a row only when the user's
depth advances.

Equivalence contract (tested in test_streaming.py): the streaming
depth equals the batch ``funnel_depth`` whenever events arrive
ts-ordered per key ACROSS batches (in-batch disorder is fine — each
batch is sorted before folding). That is the standard streaming
trade: the O(1) state cannot replay the past, so a step event that
arrives in a later batch than a younger event it should have preceded
is folded late. Feed order within a key is usually per-partition
append order, which is exactly this contract.

Scale: state is two fields per user, partitioned by user across
executors; each micro-batch sorts only its own rows per key. No
global shuffle beyond the per-key grouping every stateful operator
needs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "step int, t timestamp"


def streaming_funnel_depth(
    stream: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_window_minutes: int | None = None,
    key_type: str = "bigint",
) -> DataFrame:
    """Update-mode stream of (user, depth, reached_at): one row per
    user per micro-batch in which their funnel depth advanced.
    Semantics identical to :func:`operators.funnel.funnel_depth`
    under the ordered-arrival contract (module docstring)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    steps = list(steps)
    window = (
        None
        if step_window_minutes is None
        else pd.Timedelta(minutes=step_window_minutes)
    )
    out_schema = f"{user_col} {key_type}, depth int, reached_at timestamp"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            step, t = state.get
            t = None if t is None else pd.Timestamp(t)
        else:
            step, t = 0, None
        advanced = False
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, type_col])
            for ts, ty in zip(pdf[ts_col], pdf[type_col]):
                if step >= len(steps) or ty != steps[step]:
                    continue
                ts = pd.Timestamp(ts)
                if step > 0:
                    if ts <= t:
                        continue
                    if window is not None and ts > t + window:
                        continue
                step, t = step + 1, ts
                advanced = True
        if advanced:
            state.update((step, t.to_pydatetime()))
            yield pd.DataFrame(
                [{user_col: key[0], "depth": step, "reached_at": t}]
            )

    from pyspark.sql import functions as F

    stream = stream.where(F.col(type_col).isin(steps))
    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
