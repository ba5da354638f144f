"""Export sink with cost guard (SURVEY K8) and KV cache sink (K9).

K8: the reference exports query results as gzip CSV shards after a
5 GiB dry-run cost check (pipelines/utils/dump_to_gcs/tasks.py:27-164).
K9: query results pushed to a Redis-style KV cache feeding an API
(pipelines/rj_escritorio/rain_dashboard/tasks.py:15-75).

The KV store is pluggable (any MutableMapping-like object with
``__setitem__``); production wires a Redis client, tests wire a dict.
Rows are collected per partition through ``foreachPartition`` on the
executors only when a client factory is given; with a plain mapping
the (small, capped) result is collected on the driver — matching the
reference, which caches a handful of dashboard rows, not a fact table.
"""

from __future__ import annotations

import json
from collections.abc import Callable, MutableMapping

from pyspark.sql import DataFrame

from pipelines_spark.plans.cost_guard import DEFAULT_MAX_BYTES, guard_scan

DEFAULT_KV_ROW_CAP = 100_000


def export_csv_gzip(
    df: DataFrame,
    path: str,
    *,
    max_scan_bytes: int = DEFAULT_MAX_BYTES,
    header: bool = True,
) -> None:
    """Guarded gzip-CSV export: refuses plans whose estimated scan
    exceeds the cap (the reference's dry-run), then writes compressed
    shards (one per partition — Spark's parallel equivalent of the
    BQ extract's multi-shard output)."""
    guard_scan(df, max_scan_bytes)
    df.write.mode("overwrite").option("compression", "gzip").option(
        "header", header
    ).csv(path)


def kv_sink(
    df: DataFrame,
    key_cols: list[str],
    *,
    store: MutableMapping | None = None,
    client_factory: Callable[[], MutableMapping] | None = None,
    row_cap: int = DEFAULT_KV_ROW_CAP,
) -> int:
    """Write rows to a KV store as ``key -> JSON(payload)``.

    With ``client_factory`` the writes happen per-partition on the
    executors (each partition opens its own client — the scalable
    path). With ``store`` the result is collected on the driver
    (capped) — the reference's dashboard-cache shape.
    Returns the number of rows written (driver path) or -1
    (executor path — counts live in the store).
    """
    payload_cols = [c for c in df.columns if c not in key_cols]

    def encode(row) -> tuple[str, str]:
        key = ":".join(str(row[k]) for k in key_cols)
        return key, json.dumps({c: row[c] for c in payload_cols}, default=str)

    if client_factory is not None:
        def write_partition(rows):
            client = client_factory()
            for row in rows:
                k, v = encode(row)
                client[k] = v

        df.foreachPartition(write_partition)
        return -1

    if store is None:
        raise ValueError("kv_sink needs either store or client_factory")
    rows = df.limit(row_cap + 1).collect()
    if len(rows) > row_cap:
        raise ValueError(
            f"kv_sink driver path capped at {row_cap} rows; use client_factory"
        )
    for row in rows:
        k, v = encode(row)
        store[k] = v
    return len(rows)


def upload_files_to_storage(
    spark,
    local_files: list[str],
    dest_uri_prefix: str,
    *,
    overwrite: bool = True,
) -> list[str]:
    """Object-store upload (SURVEY K5): copy local staging files to a
    ``scheme://bucket/prefix`` destination through the Hadoop
    FileSystem API — the same abstraction Spark's own writers use, so
    any configured connector scheme works (file://, hdfs://, s3a://,
    gs://) with no provider-specific code. Same-name uploads replace
    (the reference's idempotent re-upload contract,
    pipelines/utils/utils.py:770-800 + tasks.py:273-276).

    Returns the destination URIs. For DataFrame-shaped data prefer
    ``write_partitioned`` straight to the destination URI; this is for
    raw-zone artifacts (downloaded blobs, reports) that must land
    byte-identical.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dest_prefix = dest_uri_prefix.rstrip("/")
    out = []
    for lf in local_files:
        src = jvm.org.apache.hadoop.fs.Path("file://" + lf)
        dst = jvm.org.apache.hadoop.fs.Path(
            dest_prefix + "/" + src.getName()
        )
        fs = dst.getFileSystem(conf)
        fs.mkdirs(dst.getParent())
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            src.getFileSystem(conf), src, fs, dst, False, overwrite, conf
        )
        out.append(dst.toString())
    return out
