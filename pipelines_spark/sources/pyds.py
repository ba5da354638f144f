"""Custom PySpark (v4) Python Data Source: distributed paged-API
reader, batch + streaming.

The reference's paged captures run ON THE ORCHESTRATOR — one process
walks `page=N` / `id > last_id` request loops and stages the payloads
(create_request_params pipelines/rj_smtr/tasks.py:667-718, paged dump
loops pipelines/utils/dump_db). `sources/http.py` reproduces that
driver-side shape for small feeds; this module is the scale path:
Spark's Python Data Source API (SPARK-44076, pyspark 4
``pyspark.sql.datasource``) turns each page into an **input
partition fetched on an executor**, so a 10k-page API drains with
cluster parallelism, retries per task, and no driver bottleneck.

Two surfaces on one format name (``paged_json_api``):

- **Batch** (``spark.read.format(...)``): options ``url_template``
  (with a ``{page}`` placeholder), ``pages``, optional ``page0``.
  ``partitions()`` emits one ``InputPartition`` per page; executors
  fetch and JSON-decode their page independently.
- **Streaming** (``spark.readStream.format(...)``): the reference's
  monotonic-id resume loop (T7, create_request_params
  pipelines/rj_smtr/tasks.py:667-718) as a real Structured Streaming
  source. The offset is ``{"page": N}`` — ``latestOffset`` probes
  how many pages currently exist, each micro-batch reads the new
  half-open page range, and checkpoint recovery replays from the
  committed offset exactly (``SimpleDataSourceStreamReader``'s
  prefetch-replay contract handles the rest).

The page fetcher is stdlib urllib and accepts any URL scheme
(file:// in tests, https:// in production). Rows must be JSON arrays
of objects; fields are projected by the user-supplied schema —
missing keys → NULL, the all-string staging contract composes on
top. A 404/empty page yields zero rows (end-of-feed tolerance), any
other error propagates to the task for Spark's retry machinery.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

DEFAULT_TIMEOUT_S = 60


def _fetch_page(url: str, timeout: float) -> list[dict]:
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as exc:
        if exc.code == 404:
            return []
        raise
    except urllib.error.URLError as exc:
        # file:// missing page arrives as URLError(FileNotFoundError)
        if isinstance(exc.reason, FileNotFoundError):
            return []
        raise
    except FileNotFoundError:
        return []
    if isinstance(payload, dict):
        # tolerate {"data": [...]} envelopes (common API shape)
        payload = payload.get("data", [])
    if not isinstance(payload, list):
        raise ValueError(f"page {url!r} is not a JSON array (or data-envelope)")
    return payload


def _project(records: list[dict], schema: StructType):
    names = schema.fieldNames()
    for rec in records:
        yield tuple(rec.get(n) for n in names)


class PagedJsonApiDataSource(DataSource):
    """``spark.dataSource.register(PagedJsonApiDataSource)`` then
    ``spark.read.format("paged_json_api")``. A user-defined schema is
    required (the reference imposes schemas on raw captures too —
    SURVEY S7)."""

    @classmethod
    def name(cls) -> str:
        return "paged_json_api"

    def schema(self):
        raise NotImplementedError(
            "paged_json_api requires an explicit .schema(...) — raw API "
            "pages are schema-imposed, never inferred"
        )

    def reader(self, schema: StructType) -> "PagedJsonApiReader":
        return PagedJsonApiReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "PagedJsonApiStreamReader":
        return PagedJsonApiStreamReader(schema, self.options)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class PagedJsonApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.url_template = options["url_template"]
        self.pages = int(options["pages"])
        self.page0 = int(options.get("page0", 0))
        self.timeout = float(options.get("timeout_s", DEFAULT_TIMEOUT_S))

    def partitions(self):
        # one partition per page: the unit of executor parallelism,
        # task retry, and speculative re-fetch
        return [_PagePartition(self.page0 + i) for i in range(self.pages)]

    def read(self, partition: _PagePartition):
        url = self.url_template.format(page=partition.page)
        yield from _project(_fetch_page(url, self.timeout), self.schema_)


class PagedJsonApiStreamReader(SimpleDataSourceStreamReader):
    """Monotonic page-offset streaming: each micro-batch covers the
    half-open page range [start.page, end.page). ``probe_template``
    (default = url_template) is fetched with increasing page numbers
    at ``latestOffset`` time until a missing/empty page marks the
    current feed head — the same "walk forward from the last id"
    probe as the reference's T7 loop, bounded by
    ``max_pages_per_batch`` so one micro-batch never bites more than
    it can chew (backfill happens across batches, not inside one)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.url_template = options["url_template"]
        self.page0 = int(options.get("page0", 0))
        self.timeout = float(options.get("timeout_s", DEFAULT_TIMEOUT_S))
        self.max_pages_per_batch = int(options.get("max_pages_per_batch", 100))
        self._known_head = self.page0

    def initialOffset(self) -> dict:
        return {"page": self.page0}

    def _head(self) -> int:
        """First page number that does NOT exist yet."""
        page = max(self._known_head, self.page0)
        while _fetch_page(self.url_template.format(page=page), self.timeout):
            page += 1
        self._known_head = page
        return page

    def latestOffset(self, start: dict = None) -> dict:  # noqa: ARG002
        head = self._head()
        return {"page": head}

    def read(self, start: dict):
        head = min(self._head(), start["page"] + self.max_pages_per_batch)
        end = {"page": max(head, start["page"])}
        rows = []
        for page in range(start["page"], end["page"]):
            rows.extend(
                _project(
                    _fetch_page(self.url_template.format(page=page), self.timeout),
                    self.schema_,
                )
            )
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay after restart: same pages, same rows
        rows = []
        for page in range(start["page"], end["page"]):
            rows.extend(
                _project(
                    _fetch_page(self.url_template.format(page=page), self.timeout),
                    self.schema_,
                )
            )
        return iter(rows)
