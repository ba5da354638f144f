"""Filter operators with observed data-quality metrics.

The reference logs how many rows each cleaning filter removes and
warns when a "critical subset" is affected (reference:
pipelines/rj_smtr/utils.py:436-465 ``filter_data``, :403-433
``filter_null``, :372-400 ``check_not_null``; the GPS temporal sanity
window pipelines/rj_smtr/br_rj_riodejaneiro_onibus_gps/tasks.py:225-233).

Spark-native accounting: ``df.observe`` attaches metric expressions to
the plan so removed-row counts come out of the *same* pass that does
the filtering — no extra count() jobs, which matters at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class FilterReport:
    """Handle to per-filter Observations; resolve after an action."""

    observations: dict[str, Observation] = field(default_factory=dict)

    def metrics(self) -> dict[str, dict]:
        return {name: obs.get for name, obs in self.observations.items()}


def filter_expressions(
    df: DataFrame,
    exclude: list[str | Column],
    *,
    report: FilterReport | None = None,
) -> DataFrame:
    """Remove rows matching any of the ``exclude`` predicates.

    Mirrors the reference's list-of-exclusion-expressions contract;
    each predicate's removed-row count is observed in-plan.
    """
    for i, pred in enumerate(exclude):
        cond = F.expr(pred) if isinstance(pred, str) else pred
        if report is not None:
            obs = Observation(f"filter_{i}")
            df = df.observe(obs, F.sum(cond.cast("long")).alias("removed"))
            report.observations[f"filter_{i}"] = obs
        df = df.filter(~cond | cond.isNull())
    return df


def filter_nulls(
    df: DataFrame,
    columns: list[str],
    *,
    report: FilterReport | None = None,
) -> DataFrame:
    """Drop rows with NULL in any of ``columns`` (critical-subset
    accounting via Observation)."""
    if report is not None:
        obs = Observation("filter_nulls")
        df = df.observe(
            obs,
            *[F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}") for c in columns],
        )
        report.observations["filter_nulls"] = obs
    return df.na.drop(subset=columns)


def temporal_window_filter(
    df: DataFrame,
    event_ts: str,
    capture_ts: str,
    *,
    min_skew_seconds: int = -20,
    max_delay_seconds: int = 60,
) -> DataFrame:
    """Keep rows whose capture-vs-event skew is within
    ``[min_skew, max_delay]`` seconds — the GPS sanity window."""
    skew = F.unix_timestamp(capture_ts) - F.unix_timestamp(event_ts)
    return df.filter(skew.between(F.lit(min_skew_seconds), F.lit(max_delay_seconds)))
