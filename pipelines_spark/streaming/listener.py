"""Capture-log via StreamingQueryListener (SURVEY §3.2, K10/T4).

The reference appends one (timestamp_captura, sucesso, erro) row per
capture run (pipelines/rj_smtr/utils.py:939-1006 upload_run_logs_to_bq)
and later anti-joins a time spine against it to find gaps (T4). In
Structured Streaming the idiomatic signal is the listener bus: every
micro-batch progress event carries batch id, input rows, and event-time
watermark; termination events carry the exception if any.

Events are buffered on the driver and flushed to the logs table
explicitly (``flush``) — listener callbacks must not launch Spark jobs
(they run on the listener bus thread), so the write happens on the
caller's thread. The flushed schema matches sinks/logs.py's capture
log, so spine reconciliation consumes either source unchanged.
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class CaptureLogListener(StreamingQueryListener):
    """Buffers per-batch progress + termination rows for the logs table."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._rows: list[tuple[str, int | None, int | None, bool, str | None]] = []

    # -- listener bus callbacks (no Spark jobs here) --------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self._lock:
            self._rows.append(
                (str(p.id), p.batchId, p.numInputRows, True, None)
            )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        exc = getattr(event, "exception", None)
        if exc:
            with self._lock:
                self._rows.append((str(event.id), None, None, False, str(exc)))

    # -- caller-side flush ---------------------------------------------
    def flush(self, spark: SparkSession, log_path: str) -> int:
        """Append buffered rows to the capture-log parquet table;
        returns the number of rows written."""
        with self._lock:
            rows, self._rows = self._rows, []
        if not rows:
            return 0
        (
            spark.createDataFrame(
                rows,
                "query_id string, batch_id long, num_input_rows long, "
                "sucesso boolean, erro string",
            )
            .withColumn("timestamp_captura", F.current_timestamp())
            .coalesce(1)
            .write.mode("append")
            .parquet(log_path)
        )
        return len(rows)
