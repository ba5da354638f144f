"""Pre-execution scan cost guard (SURVEY K8).

The reference dry-runs every export query and refuses to run anything
scanning more than 5 GiB (reference:
pipelines/utils/dump_to_gcs/tasks.py:108-127; cap
pipelines/utils/dump_to_gcs/constants.py:14). Spark equivalent: read
the optimized logical plan's statistics — after partition pruning and
column pruning these reflect what the scan will actually touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_MAX_BYTES = 5 * 1024**3


class ScanTooLargeError(RuntimeError):
    pass


def estimate_scan_bytes(df: DataFrame) -> int:
    """Optimizer-estimated bytes the plan will read (post-pruning)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    return int(plan.stats().sizeInBytes())


def guard_scan(df: DataFrame, max_bytes: int = DEFAULT_MAX_BYTES) -> DataFrame:
    """Raise if the estimated scan exceeds ``max_bytes``; else pass
    the DataFrame through unchanged."""
    estimated = estimate_scan_bytes(df)
    if estimated > max_bytes:
        raise ScanTooLargeError(
            f"query would scan ~{estimated} bytes > cap {max_bytes}"
        )
    return df
