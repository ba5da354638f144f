"""Property tests (hypothesis) for the engine's pure contracts:
naming normalization, backfill coverage, JDBC rewrite, URL rewrites,
WKT conversion."""

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from pipelines_spark.naming import normalize_column_name, normalize_names
from pipelines_spark.sources.http import google_sheet_export_url
from pipelines_spark.sources.jdbc import incremental_query
from pipelines_spark.state.backfill import backfill_windows

names = st.text(min_size=0, max_size=40)


@given(names)
@settings(max_examples=300, deadline=None)
def test_normalize_is_idempotent_and_safe(name):
    once = normalize_column_name(name)
    # idempotent
    assert normalize_column_name(once) == once
    # output alphabet: ascii lowercase / digits / underscore, non-empty,
    # never starts with a digit
    assert once
    assert all(c.islower() or c.isdigit() or c == "_" for c in once)
    assert not once[0].isdigit()


@given(st.lists(names, max_size=20))
@settings(max_examples=100, deadline=None)
def test_normalize_names_never_collides(raw):
    out = normalize_names(raw)
    assert len(out) == len(raw)
    assert len(set(out)) == len(out)


@given(
    start=st.datetimes(
        min_value=datetime(2000, 1, 1), max_value=datetime(2030, 1, 1)
    ),
    span_hours=st.integers(min_value=0, max_value=24 * 90),
    interval_hours=st.integers(min_value=1, max_value=100),
    reverse=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_backfill_windows_cover_exactly(start, span_hours, interval_hours, reverse):
    end = start + timedelta(hours=span_hours)
    windows = backfill_windows(
        start, end, interval=timedelta(hours=interval_hours), reverse=reverse
    )
    if span_hours == 0:
        assert windows == []
        return
    ordered = sorted(windows)
    # contiguous, non-overlapping, covering [start, end)
    assert ordered[0][0] == start
    assert ordered[-1][1] == end
    for (lo1, hi1), (lo2, _hi2) in zip(ordered, ordered[1:]):
        assert hi1 == lo2
        assert lo1 < hi1


@given(
    query=st.text(
        alphabet=st.characters(whitelist_categories=("L", "N"), whitelist_characters=" _.*,="),
        min_size=1, max_size=80,
    ),
    col=st.text(alphabet="abcdefg_", min_size=1, max_size=10),
)
@settings(max_examples=100, deadline=None)
def test_incremental_query_wraps_any_query(query, col):
    out = incremental_query(query, col, "2024-01-01 00:00:00")
    assert out.startswith("WITH q AS (")
    assert out.endswith(f"WHERE {col} >= '2024-01-01 00:00:00'")
    assert query.rstrip().rstrip(";") in out


@given(gid=st.integers(min_value=0, max_value=10**9))
@settings(max_examples=50, deadline=None)
def test_sheet_url_rewrite_keeps_gid(gid):
    url = f"https://docs.google.com/spreadsheets/d/KEY/edit#gid={gid}"
    out = google_sheet_export_url(url)
    assert out.endswith(f"&gid={gid}")
    assert "/export?format=csv" in out
