"""Incremental state: watermarks, id-resume, backfill (SURVEY §2.9)."""

from pipelines_spark.state.watermark import WatermarkStore  # noqa: F401
from pipelines_spark.state.backfill import backfill_windows  # noqa: F401
