"""Deterministic sampling and split assignment for training data.

Random sampling (``df.sample``) is seed- and partitioning-dependent —
useless for reproducible dataset construction across runs, engines,
and cluster sizes. These operators derive the sampling decision from a
content hash of a stable id (md5, available bit-identically in every
engine), so:

- the same row lands in the same split everywhere, forever;
- adding/removing other rows never reshuffles assignments (unlike
  ntile/row_number schemes);
- the op is a map-only projection — no shuffle, no state.

This is the standard web-scale-corpus trick for train/val/test splits
and downsampling (cf. deterministic hash-mod sharding in public data
pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, *, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets): md5 of the id string
    (optionally salted to decorrelate multiple independent samplings
    of the same ids), first 8 hex digits as an integer."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def sample_fraction(
    df: DataFrame, id_col: str, *, percent: int, salt: str = ""
) -> DataFrame:
    """Keep ~percent% of rows, deterministically by id hash."""
    return df.filter(hash_bucket(id_col, salt=salt) < percent)


def assign_split(
    df: DataFrame,
    id_col: str,
    *,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a train/val/test split column, stable under any reordering
    or growth of the dataset."""
    b = hash_bucket(id_col, salt=salt)
    return df.withColumn(
        split_col,
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )
