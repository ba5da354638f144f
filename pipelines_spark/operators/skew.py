"""Skew mitigation: salting for hot keys (the 100-TB insurance).

AQE's skew-join splitting handles most cases at runtime
(enabled in session.get_spark); these helpers cover the two shapes
AQE can't fix:

- ``salted_aggregate``: a groupBy whose hot key overwhelms one
  reducer. Two-stage: aggregate on (key, salt) first — the hot key's
  rows spread over ``buckets`` reducers — then combine partials.
  Algebraic aggregates only (sum/count/min/max), which is exactly
  what makes two-stage combining legal.
- ``salted_join``: a join whose build side is small enough to
  replicate but whose probe side has hot keys and the planner chose
  a shuffle join. The small side is exploded ``buckets``× with a salt
  column; the large side salts randomly — each hot key spreads over
  ``buckets`` tasks. (Prefer ``broadcast()`` when the small side fits;
  this is for the in-between sizes.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {"sum", "count", "min", "max"}
_RECOMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    sum/count/min/max. Example::

        salted_aggregate(df, ["user_id"],
                         {"n": ("*", "count"), "total": ("value", "sum")})
    """
    for out, (_, fn) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{out}: {fn} is not algebraic; cannot salt")
    salted = df.withColumn("_salt", (F.rand(seed=0) * buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[_RECOMBINE[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: small side replicated per salt bucket,
    large side salted randomly; the composite key (on + salt) spreads
    each hot key over ``buckets`` reducers."""
    salted_large = large.withColumn("_salt", (F.rand(seed=0) * buckets).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_large.join(replicated, [*on, "_salt"], how).drop("_salt")
