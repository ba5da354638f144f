"""Relational operators (SURVEY §2.4-2.9) as DataFrame combinators."""

from pipelines_spark.operators.filters import (  # noqa: F401
    FilterReport,
    filter_expressions,
    filter_nulls,
    temporal_window_filter,
)
from pipelines_spark.operators.dedup import (  # noqa: F401
    drop_duplicates,
    last_row_per_key,
)
from pipelines_spark.operators.joins import (  # noqa: F401
    anti_join,
    asof_join,
    knn_join,
    range_join,
)
from pipelines_spark.operators.spine import (  # noqa: F401
    find_gaps,
    time_spine,
)
