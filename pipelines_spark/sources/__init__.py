"""Sources (SURVEY §2.1)."""

from pipelines_spark.sources.files import (  # noqa: F401
    read_csv_imposed_schema,
    read_fixed_width,
    read_json_records,
    read_parquet_normalized,
)
