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
