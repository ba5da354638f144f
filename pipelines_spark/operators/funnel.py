"""Ordered-step funnel over an event log.

The reference analyzes event streams per entity (captures per station,
admin-feed actions per user) but has no funnel primitive; this is the
standard product-analytics extension of its per-key ordered scans
(reference spec: pipelines/rj_smtr per-vehicle event ordering, see
``operators/spine.py`` provenance). Semantics here are the
well-defined "earliest strictly-increasing progression": a user is at
depth *k* when, scanning their events in time order, step 1 matched at
its earliest occurrence and each later step *i* matched at the
earliest event strictly after step *i-1*'s match (and, if a window is
given, no later than ``window`` after it). Greedy-earliest matching
makes the result order-deterministic and lets a SQL oracle replay it
as a chain of ``min(ts)`` CTEs.

Scale shape: ONE shuffle (the per-user groupBy). Each user's events
are packed into a sorted array and folded with the ``aggregate``
higher-order function — JVM-side, no Python, state is two fields
regardless of event count. Per-user arrays are bounded by per-user
activity, the same bound every per-key window in the engine already
assumes; there is no join and no second shuffle. At 100 TB the fold
is embarrassingly parallel over users.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    df: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_window: str | None = None,
) -> DataFrame:
    """Per-user funnel depth: how many of ``steps`` the user completed
    in order. Returns (user_col, depth int, entered_at, reached_at)
    with one row per user that has at least one event of a step type;
    ``entered_at`` is the step-1 match time, ``reached_at`` the latest
    step's match time (both NULL at depth 0) — their difference is
    the user's conversion latency.

    ``step_window`` is a SQL interval literal body (e.g. ``"7 DAY"``)
    bounding the gap between CONSECUTIVE step matches; ``None`` means
    unbounded. Matching is greedy-earliest (see module docstring) —
    the state never resets, so a step-2 event outside the window does
    not restart the funnel, exactly like the min-ts-chain SQL
    formulation.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    ts_type = dict(df.dtypes)[ts_col]

    packed = (
        df.where(F.col(type_col).isin(list(steps)))
        .select(user_col, ts_col, type_col)
        .groupBy(user_col)
        .agg(
            F.array_sort(F.collect_list(F.struct(ts_col, type_col))).alias("_evs")
        )
    )

    def _advance(acc: Column, e: Column) -> Column:
        expr = None
        for i, step in enumerate(steps):
            cond = (acc["step"] == i) & (e[type_col] == step)
            if i > 0:
                cond = cond & (e[ts_col] > acc["t"])
                if step_window is not None:
                    cond = cond & (
                        e[ts_col] <= acc["t"] + F.expr(f"INTERVAL {step_window}")
                    )
            branch = F.struct(
                F.lit(i + 1).cast("int").alias("step"),
                e[ts_col].alias("t"),
                (e[ts_col] if i == 0 else acc["t0"]).alias("t0"),
            )
            expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
        return expr.otherwise(acc)

    init = F.struct(
        F.lit(0).cast("int").alias("step"),
        F.lit(None).cast(ts_type).alias("t"),
        F.lit(None).cast(ts_type).alias("t0"),
    )
    state = F.aggregate("_evs", init, _advance)
    return packed.select(
        user_col,
        state["step"].alias("depth"),
        state["t0"].alias("entered_at"),
        state["t"].alias("reached_at"),
    )


def funnel_summary(
    df: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_window: str | None = None,
) -> DataFrame:
    """Step-level rollup of :func:`funnel_depth`: one row per step with
    the number of users who reached it and the conversion rate from
    the previous step. Adds one global aggregate (partial map-side)
    on top of the single funnel shuffle."""
    depths = funnel_depth(
        df,
        steps,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        step_window=step_window,
    )
    counts = depths.agg(
        *[
            F.sum(F.when(F.col("depth") >= i + 1, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_u{i + 1}")
            for i in range(len(steps))
        ]
    )
    # One explode over a literal array, NOT a per-step union: a union
    # of selects over `counts` would re-run the whole funnel once per
    # step.
    step_structs = []
    for i, step in enumerate(steps):
        from pipelines_spark.functions.exact import exact_div_round

        # exact-rational rounding discipline (functions/exact.py):
        # users/users is an exact integer ratio that can land ON a
        # *.5e-6 boundary, where round(double) splits across engines
        conv = (
            F.lit(1.0).cast("double")
            if i == 0
            else exact_div_round(
                F.col(f"_u{i + 1}"),
                F.nullif(F.col(f"_u{i}"), F.lit(0)),
                out_scale=6,
            )
        )
        step_structs.append(
            F.struct(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(step).alias("step_name"),
                F.col(f"_u{i + 1}").alias("users"),
                conv.alias("conv_from_prev"),
            )
        )
    return counts.select(
        F.explode(F.array(*step_structs)).alias("_s")
    ).select("_s.*")
