"""Reshape operators: pivot long→wide and unpivot (SURVEY O6/S15).

Reference: satellite raster pivot lat×lon
(pipelines/rj_cor/meteorologia/satelite/satellite_utils.py:571-597).

Scale note: always pass explicit pivot values — without them Spark
runs an extra distinct job over the whole input to discover them, and
the resulting schema is data-dependent (a drifting input could mint
thousands of columns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    index: list[str],
    pivot_col: str,
    values: list[str],
    agg: Column,
) -> DataFrame:
    """Pivot ``pivot_col`` (restricted to ``values``) into columns."""
    return df.groupBy(*index).pivot(pivot_col, values).agg(agg)


def unpivot_long(
    df: DataFrame,
    index: list[str],
    value_cols: list[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long via the native ``unpivot`` (melt) operator."""
    return df.unpivot(index, value_cols, var_name, value_name)
