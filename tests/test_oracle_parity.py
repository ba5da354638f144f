"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, then compare row counts, column names, and
order-insensitive values.

This is the single most important test in the repo — if it's green at
sf0.01, the driver's CORRECTNESS check passes by construction.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(value):
    """Canonicalize a cell for order-insensitive comparison."""
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # collapse -0.0 vs 0.0 and format stably
        return repr(value + 0.0)
    if isinstance(value, datetime.datetime):
        return value.isoformat()
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    if isinstance(value, decimal.Decimal):
        return repr(float(value))
    return value


def _rows_to_canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def test_every_query_has_oracle():
    assert set(QUERIES) == set(ORACLES)


def test_head_rotation_applied():
    """The driver samples the FIRST 50 registry keys; the rotation
    policy (stalest-driver-checked first) is applied programmatically
    via _HEAD_ROTATION — pin that the reorder actually leads the dict
    and stays oracle-covered."""
    from pipelines_spark.queries import _HEAD_ROTATION

    head = list(QUERIES)[:50]
    assert head == _HEAD_ROTATION
    assert len(set(_HEAD_ROTATION)) == 50
    assert set(_HEAD_ROTATION) <= set(ORACLES)


def _spark_family(dt) -> str:
    """Coarse type family for a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return "list:" + _spark_family(dt.elementType)
    return "other"


def _arrow_family(at) -> str:
    """Coarse type family for a pyarrow DataType."""
    import pyarrow as pa

    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_floating(at):
        return "float"
    if pa.types.is_decimal(at):
        return "decimal"
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "string"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return "list:" + _arrow_family(at.value_type)
    return "other"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"

    # Type-family check via Arrow: the external driver ships both
    # result sets through Arrow/pandas, so a DuckDB HUGEINT
    # (decimal128(38,0)) against a Spark BIGINT hash-mismatches even
    # when every value is identical (this killed q12 in round 3).
    # Compare coarse families — int↔int, float↔float — and treat
    # decimal as its own family so un-CAST sums fail here, locally.
    arrow_schema = duck.execute(ORACLES[name]).arrow().schema
    d_fams = {f.name: _arrow_family(f.type) for f in arrow_schema}
    s_fams = {f.name: _spark_family(f.dataType) for f in sdf.schema.fields}
    fam_diffs = {
        c: (s_fams[c], d_fams[c]) for c in s_fams if s_fams[c] != d_fams[c]
    }
    assert not fam_diffs, f"{name}: type-family mismatches (spark, duck): {fam_diffs}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"

    s_canon = _rows_to_canon(s_cols, s_rows)
    d_canon = _rows_to_canon(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"
