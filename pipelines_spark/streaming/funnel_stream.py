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


#: committed fold state + the bounded-lateness reorder buffer + the
#: last emitted (depth, reached_at) for change detection. Timestamps
#: as epoch-ms so the buffer arrays stay engine-portable.
LATE_STATE_SCHEMA = (
    "step int, t bigint, buf_ts array<bigint>, buf_ty array<string>, "
    "last_depth int, last_t bigint, emit_seq int"
)


def watermarked_funnel_depth(
    stream: DataFrame,
    steps: Sequence[str],
    *,
    lateness: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_window_minutes: int | None = None,
    key_type: str = "bigint",
) -> DataFrame:
    """Out-of-order-tolerant streaming funnel: the ordered-arrival
    restriction of :func:`streaming_funnel_depth` lifted to Spark's
    standard bounded-lateness contract (the reason the reference's T4
    recapture machinery exists — arrival is NOT ordered).

    An event-time watermark (``withWatermark(ts, lateness)``) bounds
    how late an event may arrive. Spark only advances the watermark
    for arbitrary-state operators (it does NOT filter late rows, as
    it would for built-in aggregations), so the operator enforces the
    admission rule itself: an event older than the current watermark
    is dropped. Within the horizon, per-user state keeps a
    REORDER BUFFER of not-yet-final events alongside the O(1)
    committed fold: each micro-batch merges its rows into the buffer,
    commits (folds, in (ts, type) order) exactly the events older
    than the current watermark — no earlier event can still arrive,
    so the commit is final — and emits the SPECULATIVE depth folded
    over committed-state + remaining buffer whenever it changes.

    Equivalence contract (tested in test_stateful_and_skew.py): for
    each user, the LAST emitted (depth, reached_at) — rows carry a
    monotonically increasing ``emit_seq`` — equals the batch
    ``funnel_depth`` over the watermark-ADMITTED subset of events,
    under ANY cross-batch arrival order within the lateness bound.
    Update-mode corrections are real: a late early event can LOWER a
    previously emitted speculative depth (greedy-earliest + step
    window: the earlier entry event may expire the window for a
    later step), and the correction row supersedes it.

    Scale: state per user is the committed pair + the buffer, and the
    buffer holds at most the user's events inside the lateness
    horizon — the same state bound every watermarked stateful
    operator (windowed agg, dropDuplicates) carries. One per-key
    shuffle, no joins.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    steps = list(steps)
    window_ms = (
        None
        if step_window_minutes is None
        else step_window_minutes * 60_000
    )
    out_schema = (
        f"{user_col} {key_type}, depth int, reached_at timestamp, "
        "emit_seq int"
    )

    def fold(
        events: list[tuple[int, str]], step: int, t: int | None
    ) -> tuple[int, int | None]:
        """Greedy-earliest fold of (ts_ms, type) events, mirroring
        operators/funnel.funnel_depth's aggregate expression."""
        for ts, ty in sorted(events):
            if step >= len(steps) or ty != steps[step]:
                continue
            if step > 0:
                if ts <= t:
                    continue
                if window_ms is not None and ts > t + window_ms:
                    continue
            step, t = step + 1, ts
        return step, t

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            step, t, buf_ts, buf_ty, last_depth, last_t, seq = state.get
            buf = list(zip(buf_ts, buf_ty))
        else:
            step, t, buf, last_depth, last_t, seq = 0, None, [], 0, None, 0
        wm = state.getCurrentWatermarkMs()
        # Spark's watermark only FILTERS late rows for built-in
        # stateful operators (aggregation, dropDuplicates, joins);
        # for arbitrary state the operator enforces its own admission
        # rule — same contract: event time < watermark ⇒ too late.
        for pdf in pdfs:
            buf.extend(
                e
                for e in (
                    (pd.Timestamp(ts).value // 1_000_000, ty)
                    for ts, ty in zip(pdf[ts_col], pdf[type_col])
                )
                if e[0] >= wm
            )
        # commit: buffered events strictly older than the watermark
        # are final (no admissible arrival can sort before them);
        # fold them into the O(1) committed state
        mature = [e for e in buf if e[0] < wm]
        buf = [e for e in buf if e[0] >= wm]
        step, t = fold(mature, step, t)
        # speculate over the reorder buffer for the emitted depth
        spec_depth, spec_t = fold(buf, step, t)
        if spec_depth > 0 and (spec_depth, spec_t) != (last_depth, last_t):
            last_depth, last_t = spec_depth, spec_t
            seq += 1
            yield pd.DataFrame(
                [
                    {
                        user_col: key[0],
                        "depth": spec_depth,
                        "reached_at": pd.Timestamp(spec_t, unit="ms"),
                        "emit_seq": seq,
                    }
                ]
            )
        state.update(
            (
                step,
                t,
                [e[0] for e in buf],
                [e[1] for e in buf],
                last_depth,
                last_t,
                seq,
            )
        )

    from pyspark.sql import functions as F

    stream = stream.where(F.col(type_col).isin(steps)).withWatermark(
        ts_col, lateness
    )
    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=LATE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
