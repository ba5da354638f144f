"""Custom stateful streaming operator (SURVEY T3's in-stream form).

The reference keeps a per-station "last update" map in Redis and
filters each batch against it (pipelines/utils/utils.py:1013-1108).
When the state must live *inside* the stream (no external KV), the
Spark-native form is ``applyInPandasWithState``: per-key GroupState
holding the latest (event_ts, value), emitting one row per key per
micro-batch only when the watermark advanced — i.e. a streaming
last-row-per-key with monotone output.

State size is O(#keys), partitioned by key across executors — the
scalable replacement for a central Redis map.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, latest_ts timestamp, latest_value double, n_updates bigint"
STATE_SCHEMA = "latest_ts timestamp, latest_value double, n_updates bigint"


def track_latest_per_key(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming per-key watermark: emits (key, latest_ts,
    latest_value, n_updates) whenever a batch advances a key's
    watermark; late/stale rows mutate nothing."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            latest_ts, latest_value, n_updates = state.get
            latest_ts = pd.Timestamp(latest_ts)
        else:
            latest_ts, latest_value, n_updates = None, None, 0
        advanced = False
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ts = pd.Timestamp(row[ts_col])
                if latest_ts is None or ts > latest_ts:
                    latest_ts, latest_value = ts, float(row[value_col])
                    n_updates += 1
                    advanced = True
        if advanced:
            state.update((latest_ts.to_pydatetime(), latest_value, n_updates))
            yield pd.DataFrame(
                [
                    {
                        "key": key[0],
                        "latest_ts": latest_ts,
                        "latest_value": latest_value,
                        "n_updates": n_updates,
                    }
                ]
            )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    *,
    group_col: str,
    value_col: str,
    capacity: int = 16,
) -> DataFrame:
    """Streaming Misra–Gries frequent-items sketch per group — the
    in-stream twin of ``operators/frequency.heavy_hitters``. Each
    group's GroupState holds at most ``capacity`` (value, count)
    counters; every micro-batch folds its per-value counts in and
    decrements by the minimum surplus until the summary fits (the
    batch-merge form of item-at-a-time MG — identical guarantee).
    Emits the group's CURRENT summary ``(group, value, mg_count)``
    whenever the group sees data; downstream takes the latest batch.

    Guarantees (the MG contract, preserved under ANY micro-batch
    split because counter addition is commutative and the decrement
    step depends only on the counter multiset): every value with
    true frequency > n/capacity is in the summary (no false
    negatives), and each mg_count underestimates the true count by
    at most the total decrement. With ≤ capacity distinct values per
    group the decrement never fires and counts are EXACT regardless
    of batching.

    State is O(capacity) per group — never the distinct-value set —
    partitioned by group across executors like every sketch in the
    family.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            vals, cnts = state.get
            counters = {v: int(c) for v, c in zip(vals, cnts)}
        else:
            counters = {}
        saw = False
        for pdf in pdfs:
            if len(pdf):
                saw = True
            for value, cnt in (
                pdf[value_col].astype(str).value_counts(dropna=False).items()
            ):
                counters[value] = counters.get(value, 0) + int(cnt)
            while len(counters) > capacity:
                drop = min(counters.values())
                counters = {v: c - drop for v, c in counters.items() if c > drop}
        if saw:
            state.update((list(counters.keys()), list(counters.values())))
            yield pd.DataFrame(
                {
                    "group": [str(key[0])] * len(counters),
                    "value": list(counters.keys()),
                    "mg_count": list(counters.values()),
                }
            )

    return stream.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType="group string, value string, mg_count bigint",
        stateStructType="values array<string>, counts array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
