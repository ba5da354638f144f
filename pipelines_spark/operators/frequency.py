"""Exact distributed heavy hitters (frequent items).

The pattern the reference never needed but a 100 TB profiler does
constantly: "which keys exceed 1/k of all traffic" over a column
whose CARDINALITY is itself too large to group-by comfortably. A
plain ``GROUP BY key`` shuffles every distinct key; the two-phase
Misra–Gries design below shuffles only O(num_partitions × capacity)
candidate keys plus one broadcast, and is still EXACT:

1. **Candidates** (map-only): each partition runs a Misra–Gries
   summary with ``capacity`` counters over its local rows. MG's
   guarantee: an item decremented to zero had local frequency
   ≤ n_p/(capacity+1), so any item with local share > 1/(capacity+1)
   survives. If an item's GLOBAL share exceeds 1/k and
   capacity ≥ k, it must exceed the local threshold in at least one
   partition (else summing the per-partition bounds caps its global
   share below 1/k) — no false negatives.
2. **Exact recount**: the candidate set (small) broadcasts back as a
   semi-join filter; only candidate rows aggregate, and the exact
   global threshold ``count·k > total`` removes MG's false
   positives.

Output is therefore deterministic and partitioning-independent — the
candidate set may vary with the partition layout, but it always
contains every true heavy hitter, and the recount keeps exactly
those.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(col: str, capacity: int):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            # batch-merge variant: fold the batch's value_counts in,
            # then decrement by the minimum surplus until the summary
            # fits capacity (equivalent to item-at-a-time MG)
            for value, cnt in pdf[col].value_counts(dropna=False).items():
                counters[value] = counters.get(value, 0) + int(cnt)
            while len(counters) > capacity:
                drop = min(counters.values())
                counters = {
                    v: c - drop for v, c in counters.items() if c > drop
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return summarize


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    k: int,
    capacity: int | None = None,
) -> DataFrame:
    """Exact frequent items: rows ``(col, cnt)`` for every value
    whose count strictly exceeds ``total/k``. ``capacity`` tunes the
    per-partition summary size (default ``2k``; must be ≥ k for the
    no-false-negative guarantee — enforced)."""
    capacity = max(capacity or 2 * k, k)
    field = df.schema[col]
    candidates = (
        df.select(col)
        .mapInPandas(
            _misra_gries_partition(col, capacity),
            schema=f"{col} {field.dataType.simpleString()}",
        )
        .distinct()
    )
    total = df.count()
    cand = candidates.withColumnRenamed(col, "_cand")
    return (
        # eqNullSafe: NULL is a value here — a NULL-heavy column is a
        # classic heavy hitter and must survive the semi-join
        df.join(F.broadcast(cand), df[col].eqNullSafe(cand["_cand"]), "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(total))
    )
