"""Stale-feed detection with ``transformWithStateInPandas`` (Spark 4's
arbitrary-stateful-processing API with per-key timers).

Reference parity: the operational watchdog the reference runs OUTSIDE
the data path — "which stations stopped reporting?" is answered there
by comparing a Redis last-reading map against the clock
(save_updated_rows_on_redis, pipelines/utils/utils.py:1013-1108, and
per-station `data_medicao` staleness checks in the rain dashboards).
The streaming-native form needs something ``applyInPandasWithState``
cannot express cleanly: an alert must fire for a key precisely when
NO data arrives for it — i.e. the operator must wake up WITHOUT
input. That is what per-key timers are for:

- every batch of readings for a station updates a ``last_seen``
  ValueState and re-arms that station's timer at
  ``last_event_ms + timeout``;
- if the watermark passes the timer before a new reading re-arms it,
  ``handleExpiredTimer`` emits one ``(key, last_seen, expired_at)``
  alert row — exactly once per silence, with no polling loop and no
  external KV;
- state per key is one timestamp + one timer, hash-partitioned
  across executors: the 100 TB posture for a million-sensor fleet is
  O(keys) state, zero driver involvement.

Requires the RocksDB state store provider (transformWithState's
backing store) — set by ``stale_key_alerts``'s caller or session
conf; the test pins the exact alert semantics on a replayed stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

OUTPUT_SCHEMA = (
    "key string, last_seen_ms bigint, expired_at_ms bigint, n_events bigint"
)


class StaleKeyProcessor(StatefulProcessor):
    """Emits one alert row per key whose feed stays silent for
    ``timeout_ms`` of event time (watermark-driven)."""

    def __init__(self, timeout_ms: int):
        self.timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.last_seen = handle.getValueState(
            "last_seen", "last_ms bigint, n_events bigint"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        max_ms, n = 0, 0
        for pdf in rows:
            n += len(pdf)
            batch_max = int(pdf["event_ms"].max())
            max_ms = max(max_ms, batch_max)
        prev = self.last_seen.get() if self.last_seen.exists() else None
        if prev is not None:
            # re-arm: drop the previous timer, keep monotone last_seen
            self.handle.deleteTimer(prev[0] + self.timeout_ms)
            max_ms = max(max_ms, prev[0])
            n += prev[1]
        self.last_seen.update((max_ms, n))
        self.handle.registerTimer(max_ms + self.timeout_ms)
        return iter([])

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        state = self.last_seen.get() if self.last_seen.exists() else None
        if state is None:
            return iter([])
        last_ms, n = state
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "last_seen_ms": [last_ms],
                "expired_at_ms": [expiredTimerInfo.getExpiryTimeInMs()],
                "n_events": [n],
            }
        )

    def close(self) -> None:
        pass


def _timeout_ms(timeout: str) -> int:
    unit_ms = {"seconds": 1000, "minutes": 60_000, "hours": 3_600_000}
    qty, unit = timeout.split()
    return int(qty) * unit_ms[unit]


def _prepare(stream: DataFrame, key_col: str, ts_col: str, watermark_delay: str) -> DataFrame:
    from pyspark.sql import functions as F

    return stream.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("_event_ts"),
        (F.unix_millis(F.col(ts_col))).alias("event_ms"),
    )


def stale_key_alerts(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    timeout: str = "10 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Alert stream via ``transformWithStateInPandas``: one row per
    key whose last event is older than ``timeout`` when the watermark
    passes. Input must be streaming.

    ENV-GATED: the transformWithState protocol talks protobuf between
    the JVM and the Python state server; without the ``protobuf``
    package the query crashes at runtime with an opaque worker error,
    so the gate fails fast here instead. ``stale_key_alerts_gst`` is
    the dependency-free equivalent on ``applyInPandasWithState``."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pip install protobuf); use stale_key_alerts_gst — same "
            "semantics on applyInPandasWithState — in this environment"
        ) from exc
    return _prepare(stream, key_col, ts_col, watermark_delay).groupBy(
        "key"
    ).transformWithStateInPandas(
        StaleKeyProcessor(_timeout_ms(timeout)),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )


def stale_key_alerts_gst(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    timeout: str = "10 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Same stale-feed alert on the ``applyInPandasWithState`` API
    (GroupStateTimeout.EventTimeTimeout — no extra dependencies): the
    state function is invoked WITHOUT input when the watermark passes
    a key's registered timeout, emits the alert, and clears the
    key's state (one alert per silence; a returning key restarts
    fresh). State is one (last_ms, n_events) pair per key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout_ms = _timeout_ms(timeout)

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            (last_ms, n) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "last_seen_ms": [last_ms],
                    "expired_at_ms": [last_ms + timeout_ms],
                    "n_events": [n],
                }
            )
            return
        max_ms, n = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            max_ms = max(max_ms, int(pdf["event_ms"].max()))
        if state.exists:
            (prev_ms, prev_n) = state.get
            max_ms, n = max(max_ms, prev_ms), n + prev_n
        state.update((max_ms, n))
        state.setTimeoutTimestamp(max_ms + timeout_ms)
        return
        yield  # pragma: no cover — make fn a generator on both paths

    return _prepare(stream, key_col, ts_col, watermark_delay).groupBy(
        "key"
    ).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="last_ms bigint, n_events bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
