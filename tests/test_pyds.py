from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from pipelines_spark.sources.pyds import PagedJsonApiDataSource

SCHEMA = "id long, name string, value double"


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(PagedJsonApiDataSource)
    return spark


def _write_pages(root, n_pages, rows_per_page=5, start_id=0, page0=0):
    root.mkdir(parents=True, exist_ok=True)
    i = start_id
    for p in range(page0, page0 + n_pages):
        page = []
        for _ in range(rows_per_page):
            page.append({"id": i, "name": f"rec{i}", "value": float(i) / 2})
            i += 1
        (root / f"page{p}.json").write_text(json.dumps(page))
    return i


def test_batch_read_is_partition_per_page(registered, tmp_path):
    spark = registered
    _write_pages(tmp_path / "api", 4)
    df = (
        spark.read.format("paged_json_api")
        .schema(SCHEMA)
        .option("url_template", f"file://{tmp_path}/api/page{{page}}.json")
        .option("pages", 4)
        .load()
    )
    assert df.count() == 20
    assert df.rdd.getNumPartitions() == 4
    assert df.agg(F.sum("id")).collect()[0][0] == sum(range(20))
    # missing keys in a record project as NULL, extra keys are dropped
    (tmp_path / "api" / "page1.json").write_text(
        json.dumps([{"id": 99, "extra": True}])
    )
    row = (
        spark.read.format("paged_json_api")
        .schema(SCHEMA)
        .option("url_template", f"file://{tmp_path}/api/page{{page}}.json")
        .option("pages", 2)
        .load()
        .filter(F.col("id") == 99)
        .collect()[0]
    )
    assert row["name"] is None and row["value"] is None


def test_batch_read_tolerates_missing_tail_page(registered, tmp_path):
    spark = registered
    _write_pages(tmp_path / "api2", 2)
    df = (
        spark.read.format("paged_json_api")
        .schema(SCHEMA)
        .option("url_template", f"file://{tmp_path}/api2/page{{page}}.json")
        .option("pages", 5)  # pages 2..4 don't exist -> 0 rows, no error
        .load()
    )
    assert df.count() == 10


def test_streaming_resumes_at_committed_page_offset(registered, tmp_path):
    spark = registered
    api = tmp_path / "sapi"
    next_id = _write_pages(api, 2, rows_per_page=3)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("paged_json_api")
            .schema(SCHEMA)
            .option("url_template", f"file://{api}/page{{page}}.json")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        time.sleep(0.2)

    run_once()
    got1 = {r["id"] for r in spark.read.schema(SCHEMA).parquet(out).collect()}
    assert got1 == set(range(6))

    # feed grows by 2 pages; restart from checkpoint reads ONLY the new
    # pages (monotonic offset resume, reference T7)
    _write_pages(api, 2, rows_per_page=3, start_id=next_id, page0=2)
    run_once()
    got2 = {r["id"] for r in spark.read.schema(SCHEMA).parquet(out).collect()}
    assert got2 == set(range(6)) | set(range(next_id, next_id + 6))
