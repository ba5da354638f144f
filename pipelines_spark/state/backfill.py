"""Backfill window driver (SURVEY T8).

Splits ``[start, end)`` into interval-sized windows, optionally
reversed, for loop-of-batch-jobs backfills (reference:
pipelines/utils/backfill_flow/tasks.py:16-125; step-wise incremental
model catch-up pipelines/rj_smtr/tasks.py:70-140).

Driver-side and O(#windows) — the per-window work is a full Spark
job; this only plans the loop.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pipelines_spark.plans.models import ModelRunner
    from pipelines_spark.state.watermark import WatermarkStore


def backfill_windows(
    start: datetime,
    end: datetime,
    *,
    interval: timedelta,
    reverse: bool = False,
) -> list[tuple[datetime, datetime]]:
    """Half-open ``[lo, hi)`` windows covering ``[start, end)``."""
    if interval <= timedelta(0):
        raise ValueError("interval must be positive")
    windows: list[tuple[datetime, datetime]] = []
    lo = start
    while lo < end:
        hi = min(lo + interval, end)
        windows.append((lo, hi))
        lo = hi
    return list(reversed(windows)) if reverse else windows


def run_backfill(
    runner: "ModelRunner",
    model_name: str,
    store: "WatermarkStore",
    *,
    start: datetime,
    end: datetime,
    interval: timedelta,
    var_start: str = "date_range_start",
    var_end: str = "date_range_end",
    ts_format: str = "%Y-%m-%d %H:%M:%S",
) -> int:
    """Window-by-window incremental backfill of one model (SURVEY T8
    + U4): each window runs the model with date-range vars (the dbt
    --vars contract) and advances the watermark only after the window
    succeeds — a crash resumes from the last completed window.
    Returns the number of windows run.
    """
    last_ts, _ = store.get_table_watermark(model_name)
    effective_start = max(start, last_ts) if last_ts else start
    windows = backfill_windows(effective_start, end, interval=interval)
    for lo, hi in windows:
        runner.run(
            select=model_name,
            variables={var_start: lo.strftime(ts_format), var_end: hi.strftime(ts_format)},
        )
        store.set_table_watermark(model_name, ts=hi)
    return len(windows)
