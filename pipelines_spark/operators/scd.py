"""Slowly-changing-dimension type-2 history merge (SURVEY §2.5/§2.9
extension).

The reference detects composite-key updates and replaces partitions
(pipelines/utils/dump_db/flows.py dump modes; J10 update detection) but
keeps no version history. ``scd2_merge`` is the standard warehouse
completion of that family: fold a new full snapshot into a versioned
history table with ``valid_from`` / ``valid_to`` / ``is_current``
columns, producing the history that a sequence of per-partition
replaces throws away.

Scale shape: ONE equi-join (full outer, on the business key) between
the *open* history slice and the snapshot; closed rows pass through
untouched (and skip the join entirely — store the history partitioned
on ``is_current`` and the closed scan is partition-pruned). At 100 TB
the open slice and the snapshot hash-partition on the key once; skewed
keys can reuse operators.skew salting. No window, no collect, no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


def _all_eq(track_cols: list[str]) -> Column:
    """Null-safe equality of every tracked column across the h/s
    aliases of the merge join."""
    cond = F.lit(True)
    for c in track_cols:
        cond = cond & F.col(f"h.{c}").eqNullSafe(F.col(f"s.{c}"))
    return cond


def scd2_init(snapshot: DataFrame, *, effective_ts: Column) -> DataFrame:
    """Bootstrap a history table from a first full snapshot: every row
    open from ``effective_ts`` (a TIMESTAMP_NTZ column/literal)."""
    return (
        snapshot.withColumn(VALID_FROM, effective_ts)
        .withColumn(VALID_TO, F.lit(None).cast("timestamp_ntz"))
        .withColumn(IS_CURRENT, F.lit(True))
    )


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    *,
    keys: list[str],
    track_cols: list[str],
    effective_ts: Column,
    close_deleted: bool = True,
) -> DataFrame:
    """Fold a full ``snapshot`` (one row per key, state as of
    ``effective_ts``) into an SCD2 ``history`` table.

    ``history`` carries ``keys + track_cols + valid_from + valid_to +
    is_current`` (``valid_to`` NULL while open; both valid columns
    TIMESTAMP_NTZ). Row fates:

    - closed history rows (``is_current = false``): pass through.
    - open row, key absent from snapshot: closed at ``effective_ts``
      when ``close_deleted`` (the key disappeared from the source),
      else passed through open.
    - open row, key in snapshot, tracked values null-safe-equal:
      passes through open — re-applying the same snapshot is a no-op.
    - open row, key in snapshot, tracked values differ: the old row is
      closed at ``effective_ts`` AND a new open row with the snapshot
      values is emitted (``valid_from = effective_ts``).
    - snapshot key absent from history: new open row.

    One full-outer equi-join on ``keys``; both sides shuffle once on
    the business key. Presence on each side is derived from constant
    tags, never from nullable value columns.
    """
    out_cols = keys + track_cols + [VALID_FROM, VALID_TO, IS_CURRENT]
    closed = history.filter(~F.col(IS_CURRENT)).select(*out_cols)
    open_rows = history.filter(F.col(IS_CURRENT)).withColumn(
        "_in_hist", F.lit(True)
    )
    snap = snapshot.select(*keys, *track_cols).withColumn("_in_snap", F.lit(True))

    joined = open_rows.alias("h").join(snap.alias("s"), on=keys, how="full_outer")
    in_hist = F.col("h._in_hist").isNotNull()
    in_snap = F.col("s._in_snap").isNotNull()
    unchanged = _all_eq(track_cols)
    stays_open = (in_snap & unchanged) | (
        ~in_snap & F.lit(not close_deleted)
    )

    # surviving version of each open-history row (possibly closed now)
    from_history = joined.filter(in_hist).select(
        *keys,
        *[F.col(f"h.{c}").alias(c) for c in track_cols],
        F.col(f"h.{VALID_FROM}").alias(VALID_FROM),
        F.when(stays_open, F.col(f"h.{VALID_TO}"))
        .otherwise(effective_ts)
        .alias(VALID_TO),
        stays_open.alias(IS_CURRENT),
    )
    # new open version: changed keys and brand-new keys
    new_versions = joined.filter(in_snap & (~in_hist | ~unchanged)).select(
        *keys,
        *[F.col(f"s.{c}").alias(c) for c in track_cols],
        effective_ts.alias(VALID_FROM),
        F.lit(None).cast("timestamp_ntz").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )
    return closed.unionByName(from_history).unionByName(new_versions)
