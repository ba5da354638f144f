"""Sinks (SURVEY §2.2)."""

from pipelines_spark.sinks.partitioned import (  # noqa: F401
    write_partitioned,
    create_staging_table,
)
from pipelines_spark.sinks.logs import append_capture_log  # noqa: F401
