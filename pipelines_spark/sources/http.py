"""Driver-side URL fetchers feeding distributed file sources
(SURVEY S3/S11/S12/S16).

The reference's API captures fetch JSON/CSV on the orchestrator and
save it verbatim to a raw zone before treatment
(pipelines/rj_smtr/tasks.py:561-627 get_raw;
pipelines/utils/dump_url/tasks.py:37-180 google-sheet/drive/direct
URL). The Spark shape keeps that: a *small* driver-side fetch to a
staging directory (audit copy), then ``spark.read`` over the staged
files — the distributed part is the parse, not the download. For
large exports use S1/S5 paths instead.

Only stdlib (urllib) — works with file:// URLs in tests; 60 s timeout
matches the reference's HTTP contract.
"""

from __future__ import annotations

import os
import urllib.request
from urllib.parse import urlparse

DEFAULT_TIMEOUT_S = 60
CHUNK_BYTES = 1 << 20


def google_sheet_export_url(sheet_url: str, *, fmt: str = "csv") -> str:
    """Rewrite a Google Sheets UI URL into its CSV export URL
    (reference: dump_url url_type="google_sheet")."""
    if "/edit" in sheet_url:
        base = sheet_url.split("/edit", 1)[0]
    else:
        base = sheet_url.rstrip("/")
    gid = None
    if "gid=" in sheet_url:
        gid = sheet_url.split("gid=", 1)[1].split("&", 1)[0].split("#", 1)[0]
    url = f"{base}/export?format={fmt}"
    return f"{url}&gid={gid}" if gid else url


def google_drive_download_url(file_url: str) -> str:
    """Rewrite a Drive share link into a direct-download URL."""
    if "/file/d/" in file_url:
        file_id = file_url.split("/file/d/", 1)[1].split("/", 1)[0]
    elif "id=" in file_url:
        file_id = file_url.split("id=", 1)[1].split("&", 1)[0]
    else:
        raise ValueError(f"unrecognized drive url: {file_url}")
    return f"https://drive.google.com/uc?export=download&id={file_id}"


def download_to_staging(
    url: str,
    staging_dir: str,
    *,
    filename: str | None = None,
    timeout_s: int = DEFAULT_TIMEOUT_S,
) -> str:
    """Chunked streaming download to the staging dir; returns the
    local path (feed it to ``spark.read``). The raw bytes are kept
    verbatim — the reference's audit-copy contract."""
    os.makedirs(staging_dir, exist_ok=True)
    name = filename or os.path.basename(urlparse(url).path) or "download"
    dest = os.path.join(staging_dir, name)
    with urllib.request.urlopen(url, timeout=timeout_s) as resp, open(dest, "wb") as out:
        while True:
            chunk = resp.read(CHUNK_BYTES)
            if not chunk:
                break
            out.write(chunk)
    return dest
