"""Batch ML inference over DataFrames (SURVEY U2/U3).

The reference loads an MLflow pyfunc model and maps it over captured
rows (pipelines/utils/predict_flow/tasks.py:20-82), and labels camera
frames with a vision model (flooding_detection/tasks.py:196-320).

Spark-native: an Arrow-batched pandas UDF wrapping a pluggable
``model_fn: pd.DataFrame -> pd.Series``. The model loads once per
executor (factory invoked inside the UDF closure, cached), predictions
stream batch-by-batch — the mlflow.pyfunc.spark_udf shape without the
mlflow dependency (wire mlflow's loader as the factory in production).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_predictions(
    df: DataFrame,
    feature_cols: list[str],
    model_factory: Callable[[], Callable[[pd.DataFrame], "pd.Series"]],
    *,
    output_col: str = "prediction",
    output_type: str = "double",
) -> DataFrame:
    """Append a prediction column computed by ``model_factory()``.

    The factory runs once per Python worker (lazy module-level cache),
    not per batch — the expensive model load amortizes across the
    partition stream exactly like ``mlflow.pyfunc.spark_udf``.
    """
    state: dict = {}

    @F.pandas_udf(output_type)
    def predict(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        if "model" not in state:
            state["model"] = model_factory()
        model = state["model"]
        for batch in it:
            yield pd.Series(model(batch))

    struct = F.struct(*[F.col(c) for c in feature_cols])
    return df.withColumn(output_col, predict(struct))
