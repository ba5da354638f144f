"""Property tests (hypothesis) for the engine's pure contracts:
naming normalization, backfill coverage, JDBC rewrite, URL rewrites,
WKT conversion, CRS projection round-trip."""

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from pipelines_spark.functions.crs import utm_forward, utm_inverse
from pipelines_spark.naming import normalize_column_name, normalize_names
from pipelines_spark.sources.http import google_sheet_export_url
from pipelines_spark.sources.jdbc import incremental_query
from pipelines_spark.state.backfill import backfill_windows


@given(
    # anywhere in UTM zone 23 (lon -48..-42 around the -45 central
    # meridian), latitudes spanning both hemispheres' useful range
    lon=st.floats(min_value=-48.0, max_value=-42.0),
    lat=st.floats(min_value=-80.0, max_value=-0.01),
)
@settings(max_examples=300, deadline=None)
def test_utm_roundtrip_property(lon, lat):
    e, n = utm_forward(lon, lat, 23, south=True)
    lon2, lat2 = utm_inverse(e, n, 23, south=True)
    # series accuracy inside a zone is << 1e-7 deg (~1 cm)
    assert abs(lon2 - lon) < 1e-6
    assert abs(lat2 - lat) < 1e-6

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


@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 1000)),
        min_size=0, max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 1000), st.floats(0, 100, width=32)),
        min_size=0, max_size=30,
    ),
)
@settings(max_examples=15, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """asof_join ≡ pandas.merge_asof (backward, inclusive) on random
    keyed integer-timestamp data — an independent reference
    implementation, not our own oracle SQL."""
    import pandas as pd

    from pipelines_spark.operators.joins import asof_join

    # right side must be unique per (key, ts) — the operator contract
    right_dedup = {}
    for k, ts, v in right_rows:
        right_dedup[(k, ts)] = v
    right_rows = [(k, ts, v) for (k, ts), v in right_dedup.items()]
    left_rows = [(i, k, ts) for i, (k, ts) in enumerate(left_rows)]

    left = spark.createDataFrame(
        left_rows or [(0, 0, 0)], "row_id long, k long, ts long"
    )
    right = spark.createDataFrame(
        right_rows or [(0, 0, 0.0)], "k long, ts long, v double"
    )
    if not left_rows:
        left = left.filter("false")
    if not right_rows:
        right = right.filter("false")

    got = {
        r["row_id"]: r["asof_v"]
        for r in asof_join(left, right, on="k", value_cols=["v"]).collect()
    }

    lpdf = pd.DataFrame(left_rows, columns=["row_id", "k", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    if len(lpdf) and len(rpdf):
        merged = pd.merge_asof(lpdf, rpdf, on="ts", by="k", direction="backward")
        want = {
            int(r.row_id): (None if pd.isna(r.v) else float(r.v))
            for r in merged.itertuples()
        }
    else:
        want = {int(r.row_id): None for r in lpdf.itertuples()}
    assert got == want


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_connected_components_match_union_find(spark, edges):
    from pipelines_spark.llm.dedup import connected_components

    pairs = [(a, b) for a, b in edges if a != b]
    if not pairs:
        return

    # pure-Python union-find reference
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(df).collect()
    }
    assert got == expected


@given(
    snaps=st.lists(
        st.dictionaries(
            st.integers(min_value=0, max_value=6),
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
            max_size=7,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=10, deadline=None)
def test_scd2_merge_matches_model_fold(spark, snaps):
    """scd2_init + repeated scd2_merge ≡ a pure-Python history fold:
    per key at most one open row, closed intervals stamped at the
    snapshot time that invalidated them, null-safe change detection."""
    from datetime import datetime as dt

    from pyspark.sql import functions as F

    from pipelines_spark.operators.scd import scd2_init, scd2_merge

    times = [dt(2024, 1, d + 1) for d in range(len(snaps))]

    # pure-python reference fold
    hist = [[k, v, times[0], None, True] for k, v in snaps[0].items()]
    for t, snap in zip(times[1:], snaps[1:]):
        for row in hist:
            if row[4] and (row[0] not in snap or snap[row[0]] != row[1]):
                row[3], row[4] = t, False
        open_keys = {r[0] for r in hist if r[4]}
        for k, v in snap.items():
            if k not in open_keys:
                hist.append([k, v, t, None, True])
    expect = {tuple(r) for r in hist}

    def frame(snap, i):
        if not snap:
            return spark.createDataFrame([], "k long, v long")
        return spark.createDataFrame(list(snap.items()), "k long, v long")

    ts = lambda i: F.expr(f"TIMESTAMP_NTZ'2024-01-{times[i].day:02d} 00:00:00'")  # noqa: E731
    df = scd2_init(frame(snaps[0], 0), effective_ts=ts(0))
    for i in range(1, len(snaps)):
        df = scd2_merge(
            df, frame(snaps[i], i), keys=["k"], track_cols=["v"],
            effective_ts=ts(i),
        )
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }
    assert got == expect
    # invariant: at most one open row per key
    open_rows = [r for r in got if r[4]]
    assert len({r[0] for r in open_rows}) == len(open_rows)


# ---- Bloom filter (snapshot point-lookup pruning) ----

from pipelines_spark.sinks.snapshots import (  # noqa: E402
    _bloom_build,
    _bloom_maybe_contains,
    _bloom_params,
)


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_bloom_never_false_negative(values):
    bloom = _bloom_build(values, fpp=0.05)
    # the one property pruning correctness rests on: a present key is
    # NEVER rejected (a false negative would silently drop rows)
    assert all(_bloom_maybe_contains(bloom, v) for v in values)


@given(st.integers(min_value=1, max_value=100_000), st.floats(min_value=0.001, max_value=0.5))
@settings(max_examples=200, deadline=None)
def test_bloom_params_sane(n, fpp):
    m, k = _bloom_params(n, fpp)
    assert m >= 8 and k >= 1
    # standard sizing: bits per element grows as fpp shrinks, and the
    # hash count stays in a practical range
    assert k <= max(1, int(m / n * 0.7)) + 1


# --- BPE merge-application fold vs a pure-python greedy reference ----------

def _bpe_apply_ref(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


@given(
    syms=st.lists(st.sampled_from(["a", "b", "c", "ab", "bc"]), min_size=0, max_size=12),
    rule=st.sampled_from([("a", "a"), ("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc")]),
)
@settings(max_examples=40, deadline=None)
def test_bpe_fold_matches_greedy_reference(spark, syms, rule):
    from pyspark.sql import functions as F
    from pipelines_spark.llm.bpe import apply_merge

    df = spark.createDataFrame([(syms,)], "syms: array<string>")
    got = df.select(apply_merge(F.col("syms"), *rule).alias("out")).collect()[0]["out"]
    assert got == _bpe_apply_ref(syms, *rule)


# --- duplicate_spans vs a brute-force python computation -------------------

def _dup_spans_ref(texts: dict[int, str], w: int = 3):
    from collections import Counter

    toks = {i: [x for x in t.lower().split(" ") if x] for i, t in texts.items()}
    wins = Counter()
    for ws in toks.values():
        for i in range(len(ws) - w + 1):
            wins[" ".join(ws[i : i + w])] += 1
    out = {}
    for i, ws in toks.items():
        covered = set()
        for s in range(len(ws) - w + 1):
            if wins[" ".join(ws[s : s + w])] > 1:
                covered.update(range(s, s + w))
        spans = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p > prev + 1:
                spans += 1
            prev = p
        out[i] = (len(ws), spans, len(covered))
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=0, max_size=10).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=25, deadline=None)
def test_duplicate_spans_matches_bruteforce(spark, docs):
    from pipelines_spark.llm.text import duplicate_spans

    texts = dict(enumerate(docs))
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_words"], r["n_dup_spans"], r["dup_words"])
        for r in duplicate_spans(df, window_words=3).collect()
    }
    assert got == _dup_spans_ref(texts, 3)


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_hdf5_chunk_index_roundtrip_property(data):
    """Property: write(x) → read == x for random shapes, chunk grids,
    dtypes, filters, and EVERY chunk index the minimal HDF5 reader
    supports — v1 B-tree, single-chunk, implicit, fixed array (plain
    and paged), extensible array (default and deep cparams, any
    unlimited dim), v2 B-tree (leaf root and depth-1). Edge chunks,
    1-element dims, and rank 1–3 are all fair game."""
    import numpy as np

    from pipelines_spark.sources.hdf5_min import build_hdf5, parse_hdf5

    rank = data.draw(st.integers(1, 3), label="rank")
    shape = tuple(
        data.draw(st.integers(1, 13), label=f"dim{d}") for d in range(rank)
    )
    chunks = tuple(
        data.draw(st.integers(1, shape[d] + 2), label=f"chunk{d}")
        for d in range(rank)
    )
    dtype = data.draw(st.sampled_from(["<i2", "<i4", "<f8"]), label="dtype")
    index = data.draw(
        st.sampled_from(["v1", "single", "implicit", "fixed", "earray", "bt2"]),
        label="index",
    )
    filtered = data.draw(st.booleans(), label="filtered") and index != "implicit"

    rng = np.random.default_rng(
        data.draw(st.integers(0, 2**31 - 1), label="seed")
    )
    arr = rng.integers(-1000, 1000, size=shape).astype(dtype)
    spec = {"data": arr, "chunks": chunks, "index": index}
    if filtered:
        spec["deflate"] = 4
        spec["shuffle"] = True
    if index == "earray":
        unlim = data.draw(st.integers(0, rank - 1), label="unlim_dim")
        spec["maxshape"] = tuple(
            None if d == unlim else shape[d] for d in range(rank)
        )
        if data.draw(st.booleans(), label="deep_params"):
            spec["earray_params"] = (32, 2, 2, 2, 2)  # sblocks + paging
    elif index == "bt2":
        spec["maxshape"] = tuple(None for _ in range(rank))
        spec["bt2_node_size"] = data.draw(
            st.sampled_from([2048, 160]), label="node_size"
        )
    elif index == "fixed" and data.draw(st.booleans(), label="paged"):
        spec["fixed_page_bits"] = 2

    ds = parse_hdf5(build_hdf5({"v": spec}))
    assert np.array_equal(ds["v"].data, arr)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 120),
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=0,
        max_size=40,
    ),
    st.sampled_from([None, 30]),
)
@settings(max_examples=15, deadline=None)
def test_funnel_depth_matches_greedy_reference(spark, rows, window_min):
    """funnel_depth ≡ an independent pure-Python greedy scan over
    random (user, minute, type) event logs, with and without a
    per-transition window — including same-timestamp ties, repeated
    steps, and out-of-order arrival."""
    from datetime import datetime, timedelta

    from pipelines_spark.operators.funnel import funnel_depth

    steps = ["view", "click", "purchase"]
    base = datetime(2024, 1, 1)
    data = [
        (u, base + timedelta(minutes=m), ty) for (u, m, ty) in rows
    ]

    def ref_depths():
        out = {}
        per_user = {}
        for u, ts, ty in data:
            if ty in steps:
                per_user.setdefault(u, []).append((ts, ty))
        for u, evs in per_user.items():
            evs.sort()  # (ts, type): same tie order as array_sort(struct)
            step, t = 0, None
            for ts, ty in evs:
                if step >= len(steps) or ty != steps[step]:
                    continue
                if step > 0:
                    if ts <= t:
                        continue
                    if window_min is not None and ts > t + timedelta(
                        minutes=window_min
                    ):
                        continue
                step, t = step + 1, ts
            out[u] = step
        return out

    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string"
    )
    win = None if window_min is None else f"{window_min} MINUTE"
    got = {
        r["user_id"]: r["depth"]
        for r in funnel_depth(df, steps, step_window=win).collect()
    }
    assert got == ref_depths()


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60)
)
@settings(max_examples=200, deadline=None)
def test_cusum_prefix_identity_matches_recursion(deviations):
    """The identity a39_cusum_changepoints is built on:
    s_i = max(0, s_{i-1} + d_i)  ==  p_i - min(0, min_{j<=i} p_j)
    for ANY deviation sequence (integer grid stands in for the
    query's DECIMAL-exact deviations)."""
    # naive sequential recursion
    s, naive = 0, []
    for d in deviations:
        s = max(0, s + d)
        naive.append(s)
    # windowed rewrite: running prefix sum minus clamped running min
    p, pmin, rewritten = 0, 0, []
    for d in deviations:
        p += d
        pmin = min(pmin, p)
        rewritten.append(p - min(pmin, 0))
    assert rewritten == naive


@given(
    a=st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    b=st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=40),
    t10=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=500, deadline=None)
def test_prefix_filter_pigeonhole_theorem(a, b, t10):
    """The losslessness guarantee behind llm/dedup.py::
    prefix_filter_jaccard_pairs, independent of Spark: for ANY common
    total order, if Jaccard(A, B) >= t then the first
    floor((1-t)|A|)+1 elements of A and the first floor((1-t)|B|)+1
    of B (in that order) share an element — so indexing only prefixes
    can never miss a qualifying pair."""
    t = t10 / 10.0
    inter = len(a & b)
    if inter / len(a | b) < t:
        return  # theorem only claims qualifying pairs collide
    order = sorted  # any common total order; ints sort naturally
    pa = set(order(a)[: int((1 - t) * len(a)) + 1])
    pb = set(order(b)[: int((1 - t) * len(b)) + 1])
    assert pa & pb, (sorted(a), sorted(b), t)


@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=6), min_size=1, max_size=80
    ),
    w=st.integers(min_value=2, max_value=10),
)
@settings(max_examples=500, deadline=None)
def test_mattr_closed_form_matches_window_brute_force(toks, w):
    """The O(tokens) identity behind text_mattr_diversity (both
    engines implement THIS formula, so oracle parity alone would not
    catch an error in it): Σ over sliding windows of the window's
    distinct count equals Σ over token positions p of
    |[max(p−W+1, prev(p)+1, 1), min(p, K)]| where prev is the
    previous same-type position (0 if none) and K = n−W+1."""
    n = len(toks)
    if n < w:
        return
    k = n - w + 1
    brute = sum(len(set(toks[s : s + w])) for s in range(k))
    last: dict[int, int] = {}
    closed = 0
    for p1, t in enumerate(toks, start=1):
        prev = last.get(t, 0)
        lo = max(p1 - w + 1, prev + 1, 1)
        hi = min(p1, k)
        closed += max(0, hi - lo + 1)
        last[t] = p1
    assert closed == brute


@given(
    xs=st.lists(st.integers(min_value=0, max_value=50), min_size=14, max_size=14),
    ys=st.lists(st.integers(min_value=0, max_value=50), min_size=14, max_size=14),
)
@settings(max_examples=300, deadline=None)
def test_rolling_corr_sufficient_stats_match_numpy(xs, ys):
    """w15_rolling_corr's integer-sufficient-statistics Pearson
    (n·Σxy−ΣxΣy over the √ product of the two variance terms) agrees
    with numpy's corrcoef to float tolerance on every non-degenerate
    window (both engines share the formula; this pins it against an
    independent implementation)."""
    import math

    import numpy as np

    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx == 0 or vy == 0:
        return  # degenerate window: NaN/inf in both engines by design
    ours = (n * sxy - sx * sy) / math.sqrt(vx * vy)
    ref = float(np.corrcoef(xs, ys)[0, 1])
    assert abs(ours - ref) < 1e-9
