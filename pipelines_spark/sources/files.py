"""File sources with imposed schemas and name normalization.

Reference shapes (SURVEY §2.1): headerless ``;``-delimited files with
config-imposed column names (S7,
pipelines/rj_smtr/br_rj_riodejaneiro_rdo/tasks.py:178-205), fixed-width
files (S8, pd.read_fwf), JSON record payloads (S16), and the general
rule that every inbound schema passes through column-name
normalization (P3).

All readers are distributed Spark file scans — a 100 TB directory of
CSVs splits across executors automatically; nothing here reads on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelines_spark.naming import normalize_columns


def read_parquet_normalized(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan + column-name normalization (metadata-only)."""
    return normalize_columns(spark.read.parquet(path))


def read_csv_imposed_schema(
    spark: SparkSession,
    path: str,
    columns: list[str],
    *,
    sep: str = ";",
    header: bool = False,
) -> DataFrame:
    """Headerless delimited scan with imposed column names; all
    columns string-typed (staging contract)."""
    schema = " ".join(f"`{c}` STRING," for c in columns).rstrip(",")
    df = spark.read.csv(path, sep=sep, header=header, schema=schema)
    return normalize_columns(df)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: dict[str, tuple[int, int]],
) -> DataFrame:
    """Fixed-width scan: ``spark.read.text`` + substring projections.

    ``colspecs`` maps column name → (start, end) 0-based half-open
    character offsets, pandas ``read_fwf`` style.
    """
    raw = spark.read.text(path)
    cols = [
        F.trim(F.substring("value", start + 1, end - start)).alias(name)
        for name, (start, end) in colspecs.items()
    ]
    return normalize_columns(raw.select(*cols))


def read_json_records(
    spark: SparkSession,
    path: str,
    *,
    multiline: bool = False,
) -> DataFrame:
    """JSON records scan (API payload dumps saved verbatim to the raw
    zone, reference save_raw_local_func rj_smtr/utils.py:602-639)."""
    return normalize_columns(spark.read.option("multiLine", multiline).json(path))
