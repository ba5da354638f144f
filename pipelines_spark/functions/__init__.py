"""Scalar column expressions (SURVEY §2.10).

All helpers return Column expressions built from
``pyspark.sql.functions`` so they stay JVM-side inside whole-stage
codegen — no Python UDFs in this package.
"""

from pipelines_spark.functions.cleaning import (  # noqa: F401
    clean_string_columns,
    negative_to_null,
    recode,
    safe_cast,
    strip_accents_expr,
    trim_all_strings,
)
from pipelines_spark.functions.datetime_ops import (  # noqa: F401
    derive_partition_columns,
    from_unix_millis,
    parse_timestamp_multi,
    to_local,
    to_utc,
)
from pipelines_spark.functions.json_ops import (  # noqa: F401
    flatten_struct,
    nest_payload,
    unnest_payload,
)
