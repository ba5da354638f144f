"""Timestamp parsing, timezone handling, partition-column derivation.

Reference semantics: dual-format coerce-parsing
(pipelines/rj_smtr/br_rj_riodejaneiro_onibus_gps/tasks.py:97-106),
unix-millis → zone-aware timestamps (same file :209-213), canonical
zone America/Sao_Paulo (pipelines/constants.py:68), and the
``ano_particao/mes_particao/data_particao`` partition derivation
(pipelines/utils/utils.py:885-922).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CANONICAL_TZ = "America/Sao_Paulo"


def parse_timestamp_multi(col: Column | str, formats: list[str]) -> Column:
    """Try each format in order, first non-null wins (coerce to NULL).

    Equivalent of pandas ``to_datetime(errors="coerce")`` with a
    dual-format fallback; ``try_to_timestamp`` keeps it codegen'd.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats])


def from_unix_millis(col: Column | str) -> Column:
    """Unix epoch milliseconds → TimestampType (UTC instant)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def to_local(col: Column | str, tz: str = CANONICAL_TZ) -> Column:
    """UTC instant → wall-clock in ``tz`` (reference's display zone)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_utc_timestamp(c, tz)


def to_utc(col: Column | str, tz: str = CANONICAL_TZ) -> Column:
    """Wall-clock in ``tz`` → UTC instant."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_utc_timestamp(c, tz)


def derive_partition_columns(
    df: DataFrame, date_col: str, prefix: str = "particao"
) -> DataFrame:
    """Add ``ano_/mes_/data_particao`` string partition keys from a
    date/timestamp column. Partition keys are strings by contract
    (zero-padded month), matching the reference's lake layout."""
    c = F.col(date_col)
    return df.withColumns(
        {
            f"ano_{prefix}": F.date_format(c, "yyyy"),
            f"mes_{prefix}": F.date_format(c, "MM"),
            f"data_{prefix}": F.date_format(c, "yyyy-MM-dd"),
        }
    )
