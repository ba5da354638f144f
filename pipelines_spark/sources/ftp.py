"""FTP directory scan + incremental fetch (SURVEY S6).

Reference behavior (pipelines/rj_smtr/br_rj_riodejaneiro_rdo/
tasks.py:35-150 + client at pipelines/rj_smtr/utils.py:306-322):
list report files under a mode/report-type directory, diff against
the set already downloaded (Redis-backed in the reference), download
only the new ones to a local staging dir, then parse. The download is
driver-side (files are small daily reports); the distributed part is
the parse over the staged directory.

The FTP protocol surface is injected (``FtpClient``) so the listing/
diff/fetch logic is testable without a live server and swappable for
FTPS/SFTP. ``ftplib_client`` adapts the stdlib client for real use.
Downloaded-file state lives in ``state.watermark``-style parquet (a
set of filenames), replacing Redis.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class FtpClient(Protocol):
    """Minimal protocol: list names under a path, fetch one file."""

    def list_names(self, path: str) -> list[str]: ...

    def fetch(self, remote_path: str, local_path: str) -> None: ...


def ftplib_client(host: str, user: str = "", password: str = "", timeout_s: int = 60):
    """Adapter over stdlib ftplib (lazy import; real deployments
    only). Returns an object satisfying ``FtpClient``."""
    import ftplib

    @dataclass
    class _Client:
        conn: "ftplib.FTP"

        def list_names(self, path: str) -> list[str]:
            return self.conn.nlst(path)

        def fetch(self, remote_path: str, local_path: str) -> None:
            with open(local_path, "wb") as fh:
                self.conn.retrbinary(f"RETR {remote_path}", fh.write)

    conn = ftplib.FTP(host, timeout=timeout_s)
    conn.login(user, password)
    return _Client(conn)


def _downloaded_set(spark: SparkSession, registry_path: str) -> set[str]:
    try:
        return {
            r["file_name"]
            for r in spark.read.parquet(registry_path).select("file_name").collect()
        }
    except Exception:
        return set()


def sync_new_files(
    spark: SparkSession,
    client: FtpClient,
    *,
    remote_dir: str,
    staging_dir: str,
    registry_path: str,
    name_filter: str | None = None,
) -> list[str]:
    """Download files in ``remote_dir`` not yet in the registry; record
    them; return the newly staged local paths.

    Mirrors the reference's anti-join-on-filename semantics (J4): the
    registry is the state table, the listing is the probe side.
    Idempotent: a crash between download and registry append re-downloads
    on the next run (same filename overwrites — the reference's T6
    same-name replace contract).
    """
    names = client.list_names(remote_dir)
    if name_filter:
        import re

        names = [n for n in names if re.search(name_filter, Path(n).name)]
    seen = _downloaded_set(spark, registry_path)
    new = sorted(n for n in names if Path(n).name not in seen)
    if not new:
        return []
    Path(staging_dir).mkdir(parents=True, exist_ok=True)
    staged = []
    for name in new:
        local = str(Path(staging_dir) / Path(name).name)
        client.fetch(name, local)
        staged.append(local)
    log = spark.createDataFrame(
        [(Path(n).name,) for n in new], "file_name string"
    ).withColumn("downloaded_at", F.current_timestamp())
    log.coalesce(1).write.mode("append").parquet(registry_path)
    return staged


def read_staged_reports(
    spark: SparkSession,
    staging_dir: str,
    *,
    schema: str,
    sep: str = ";",
) -> DataFrame:
    """Parse the staged report files (headerless delimited with an
    imposed schema — the reference's S7 contract) with the source
    filename attached for audit/date extraction (regex-on-filename,
    §2.10)."""
    return (
        spark.read.csv(staging_dir, sep=sep, schema=schema, header=False)
        .withColumn("source_file", F.input_file_name())
    )
