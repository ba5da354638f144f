"""Capture-log sink (SURVEY K10, §1.1 capture-log table).

One row per (table, scheduled timestamp) attempt:
``(timestamp_captura, sucesso, erro, batch_id, data)`` partitioned by
``data`` (reference: pipelines/rj_smtr/utils.py:939-1006
``upload_run_logs_to_bq``; ``[recapturado]`` prefix on healed rows at
:976-985). The log table is what the recapture spine (operators.spine)
anti-joins against, so appends must be atomic per batch.

The SAME table also receives rows from the streaming writers
(streaming/capture.py per-batch successes, streaming/drift_stream.py
per-window verdicts), which stamp a micro-batch ``batch_id``; batch
appends carry it as NULL so every producer writes ONE schema and a
plain (non-mergeSchema) read sees every column regardless of which
file's footer Spark samples.

Layout migration note: the table has been ``partitionBy("data")``
since round 10. A log directory written by a PRE-round-10 deployment
(unpartitioned files at the root) must be rewritten once
(``spark.read.parquet(old).write.partitionBy("data").parquet(new)``)
or pointed at a fresh path — Spark's partition discovery rejects a
directory mixing root-level data files with ``data=...`` dirs.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_SCHEMA = T.StructType(
    [
        T.StructField("timestamp_captura", T.TimestampType(), False),
        T.StructField("sucesso", T.BooleanType(), False),
        T.StructField("erro", T.StringType(), True),
        # micro-batch id, stamped by the streaming writers sharing the
        # table; NULL on batch appends (one schema for all producers)
        T.StructField("batch_id", T.LongType(), True),
    ]
)


def append_capture_log(
    spark: SparkSession,
    path: str,
    timestamps: list[datetime],
    *,
    success: bool,
    error: str | None = None,
    recapture: bool = False,
) -> None:
    """Append one log row per captured timestamp."""
    err = error
    if recapture:
        err = f"[recapturado]{error or ''}"
    rows = [(ts, success, err, None) for ts in timestamps]
    df = (
        spark.createDataFrame(rows, LOG_SCHEMA)
        .withColumn("data", F.date_format("timestamp_captura", "yyyy-MM-dd"))
    )
    df.repartition(1).write.mode("append").partitionBy("data").parquet(path)
