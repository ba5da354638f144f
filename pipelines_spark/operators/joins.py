"""Join operators: anti, range/interval, kNN (SURVEY §2.5).

Reference shapes: left-anti new-rows-vs-state dedup
(pipelines/rj_cor/utils.py:60-64, merge-indicator idiom), date-range
interval join (pipelines/rj_smtr/constants.py:190-196), cross join +
distance ranking keep-top-k (pipelines/rj_escritorio/rain_dashboard/
constants.py:169-205).

Scale notes:
- anti_join broadcasts the (small) state side by default — the state
  table is per-key watermarks, orders of magnitude smaller than the
  fact side; a broadcast left-anti is a map-only stage, zero shuffle
  of the 100 TB side.
- range_join expresses the interval predicate declaratively so AQE /
  the optimizer can pick broadcast-nested-loop for a small dim side
  rather than a full cartesian.
- knn_join is the exact small-dims variant (cross join + window
  top-k). For large candidate sets use llm.similarity's bucketed
  variant instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def anti_join(
    df: DataFrame,
    state: DataFrame,
    on: list[str],
    *,
    broadcast_state: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose key is absent from ``state``."""
    right = F.broadcast(state) if broadcast_state else state
    return df.join(right.select(*on).dropDuplicates(on), on, "left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    equi: list[str] | None = None,
    point: str | Column,
    lower: str | Column,
    upper: str | Column,
    how: str = "inner",
    null_open: bool = True,
) -> DataFrame:
    """Join where ``left.point BETWEEN right.lower AND right.upper``.

    ``null_open=True`` treats NULL bounds as open intervals (the
    reference's feed_start/feed_end semantics).
    """
    p = left[point] if isinstance(point, str) else point
    lo = right[lower] if isinstance(lower, str) else lower
    hi = right[upper] if isinstance(upper, str) else upper
    if null_open:
        cond = (lo.isNull() | (p >= lo)) & (hi.isNull() | (p <= hi))
    else:
        cond = p.between(lo, hi)
    for k in equi or []:
        cond = cond & (left[k] == right[k])
    return left.join(right, cond, how)


def knn_join(
    points: DataFrame,
    anchors: DataFrame,
    *,
    point_id: str,
    distance: Column,
    k: int,
    tiebreak: list[Column] | None = None,
) -> DataFrame:
    """For each row of ``points``, the ``k`` nearest rows of
    ``anchors`` by ``distance`` (a Column over the joined schema).

    ``anchors`` is broadcast — the anchor set (stations, centroids)
    is assumed small; the cross join is then map-side only and the
    window top-k shuffles on ``point_id`` once.
    """
    joined = points.crossJoin(F.broadcast(anchors)).withColumn("_dist", distance)
    order = [F.col("_dist").asc()] + [c.asc() for c in (tiebreak or [])]
    w = Window.partitionBy(point_id).orderBy(*order)
    return (
        joined.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .withColumnRenamed("_dist", "distance")
        .withColumnRenamed("_rank", "rank")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: each left row gains the right row's ``value_cols``
    from the nearest right event for the same ``on`` key — the latest
    with ``right_ts <= left_ts`` (``direction="backward"``, default)
    or the earliest with ``right_ts >= left_ts``
    (``direction="forward"``); NULLs when no such right event exists.
    Matches DuckDB/pandas ``ASOF LEFT JOIN`` / ``merge_asof``
    semantics in both directions, including the equal-timestamp case
    (a right event at exactly left_ts matches).

    Spark has no native as-of join; the usual range-join encoding
    explodes into an O(n·m) band join. This implementation instead
    unions both sides tagged, sorts once per key (ascending for
    backward, descending for forward), and propagates the nearest
    right values with ``last(..., ignorenulls=True)`` over an
    unbounded-preceding row frame — ONE shuffle on ``on``, linear
    work per partition in BOTH directions (a following frame would
    re-scan the partition tail per row), no candidate blow-up. At
    100 TB both sides shuffle-hash-partition on the key once; skewed
    keys can reuse operators.skew salting.

    Right side must be unique per (key, right_ts); pre-aggregate if
    not (the reference's last-row-per-key operator, A3).

    ``tolerance`` bounds the match gap (pandas ``merge_asof``
    tolerance): a nearest right event further than ``tolerance`` from
    the left timestamp yields NULLs instead. Seconds for timestamp
    columns (fractions allowed), same-unit for numeric ones. Purely a
    post-window column expression — the plan (one shuffle, linear
    frame) is unchanged.

    All ``value_cols`` are propagated as ONE struct with a single
    ``last(ignorenulls=True)``: every output value comes from the same
    (latest) right row, so a NULL field in the newest right row stays
    NULL rather than blending in an older row's value — matching the
    DuckDB ASOF JOIN / pandas merge_asof row semantics.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    rv_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType, True) for c in value_cols]
        + [T.StructField("_asof_mts", right.schema[right_ts].dataType, True)]
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            l_tagged.schema["_lrow"].dataType
        ).alias("_lrow"),
        F.struct(
            *[F.col(c) for c in value_cols],
            F.col(right_ts).alias("_asof_mts"),
        ).alias("_rv"),
    )
    # Both directions use a PRECEDING frame + last(ignorenulls) — the
    # one window shape Spark executes as a linear running aggregate
    # (a following frame re-scans the partition tail per row: O(n²)
    # per key). Forward = the same scan over ts DESCENDING, so
    # "preceding" means larger-or-equal timestamps and last() is the
    # nearest following right event. Equal-ts right events sort
    # before the left row in scan order either way (_is_left asc), so
    # an exact-ts match is visible to the left row (>= / <=
    # inclusive semantics).
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).withColumn(
        "_rv", F.last("_rv", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_is_left") == 1)
    rv = F.col("_rv")
    if tolerance is not None:
        if isinstance(right.schema[right_ts].dataType, T.NumericType):
            gap_ok = F.abs(F.col("_ts") - rv["_asof_mts"]) <= F.lit(tolerance)
        else:
            gap_ok = (
                F.abs(F.expr("timestampdiff(MICROSECOND, _rv._asof_mts, _ts)"))
                <= F.lit(int(tolerance * 1_000_000))
            )
        rv = F.when(rv.isNotNull() & gap_ok, rv)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[rv[c].alias(f"asof_{c}") for c in value_cols],
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    block_expr: Column,
    max_dist: int = 3,
) -> DataFrame:
    """Entity-resolution candidate pairs: fuzzy self-match of the
    distinct values of ``name_col`` under an edit-distance bound,
    with a blocking key so the candidate set is an equi-join, never a
    cross join.

    Classic record-linkage blocking (Fellegi-Sunter style): only
    values sharing ``block_expr`` (e.g. first token, phonetic code,
    length band) are compared, so the pair count is
    sum(block_size^2) instead of n^2 — the same
    bucket-bounds-the-scan shape as LSH dedup (llm/dedup.py). The
    Levenshtein refine runs JVM-side (built-in ``levenshtein``).

    The reference does value recoding/matching by exact replace maps
    (/root/reference/pipelines/rj_cor/comando/eventos/tasks.py:203-239);
    fuzzy matching is the scale-path generalization for dirty keys.

    Returns ``(name_a, name_b, edit_dist)`` with ``name_a < name_b``
    (each unordered pair once).
    """
    names = df.select(F.col(name_col).alias("_name")).where(
        F.col(name_col).isNotNull()
    ).distinct()
    blocked = names.withColumn("_blk", block_expr)
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._name") < F.col("b._name")),
        )
        .withColumn("edit_dist", F.levenshtein(F.col("a._name"), F.col("b._name")))
        .where(F.col("edit_dist") <= max_dist)
        .select(
            F.col("a._name").alias("name_a"),
            F.col("b._name").alias("name_b"),
            "edit_dist",
        )
    )


def interval_overlap_join(
    df: DataFrame,
    *,
    id_col: str,
    key_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "DAY",
    max_bucket_group: int | None = None,
) -> DataFrame:
    """Interval x interval overlap self-join — the shape range_join's
    point-in-interval probe cannot express (co-presence detection,
    meeting overlap, concurrent-session pairing).

    TEMPORAL BUCKETING decomposition: each [start, end] interval
    explodes to the ``bucket``-grain calendar units it touches, the
    pair join keys on (key, bucket) so candidates are co-bucketed
    rather than quadratic per key, a DISTINCT collapses pairs that
    co-occur in several buckets, and the exact inclusive overlap
    predicate (a.start <= b.end AND b.start <= a.end) verifies. The
    bucket grain tunes candidate volume exactly like an LSH band
    width: pick it near the typical interval length so intervals
    touch O(1) buckets while unrelated rows rarely share one.

    ``max_bucket_group`` is the standard hot-bucket cap (same posture
    as llm/dedup.py::minhash LSH ``max_bucket_size`` and
    llm/multimodal.py::dhash ``max_block_group``): (key, bucket)
    groups larger than the cap are dropped with a logged count, so a
    pathological key cannot go quadratic; recall degrades gracefully
    through the pair's other buckets.

    Returns ``(key, id_a, id_b)`` with ``id_a < id_b`` (each
    unordered overlapping pair once).
    """
    iv = df.select(
        F.col(key_col).alias("_key"),
        F.col(id_col).alias("_id"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
    ).where(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
    bucketed = iv.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col("_s")),
                F.date_trunc(bucket, F.col("_e")),
                F.expr(f"interval 1 {bucket}"),
            )
        ),
    )
    if max_bucket_group is not None:
        import logging

        counts = bucketed.groupBy("_key", "_bucket").agg(
            F.count(F.lit(1)).alias("_n")
        )
        n_hot = counts.filter(F.col("_n") > max_bucket_group).count()
        if n_hot:
            logging.getLogger("pipelines_spark.operators.joins").warning(
                "interval_overlap_join: dropping %d hot (key, bucket) groups "
                "(> %d rows); pairs confined to those buckets are lost",
                n_hot, max_bucket_group,
            )
        bucketed = (
            bucketed.join(counts, ["_key", "_bucket"])
            .filter(F.col("_n") <= max_bucket_group)
            .drop("_n")
        )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._key") == F.col("b._key"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._key").alias("key"),
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._s").alias("_sa"),
            F.col("a._e").alias("_ea"),
            F.col("b._s").alias("_sb"),
            F.col("b._e").alias("_eb"),
        )
        .dropDuplicates(["key", "id_a", "id_b"])
    )
    return cand.where(
        (F.col("_sa") <= F.col("_eb")) & (F.col("_sb") <= F.col("_ea"))
    ).select("key", "id_a", "id_b")
