"""Deterministic sampling and split assignment for training data.

Random sampling (``df.sample``) is seed- and partitioning-dependent —
useless for reproducible dataset construction across runs, engines,
and cluster sizes. These operators derive the sampling decision from a
content hash of a stable id (md5, available bit-identically in every
engine), so:

- the same row lands in the same split everywhere, forever;
- adding/removing other rows never reshuffles assignments (unlike
  ntile/row_number schemes);
- the op is a map-only projection — no shuffle, no state.

This is the standard web-scale-corpus trick for train/val/test splits
and downsampling (cf. deterministic hash-mod sharding in public data
pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col: Column | str, *, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets): md5 of the id string
    (optionally salted to decorrelate multiple independent samplings
    of the same ids), first 8 hex digits as an integer."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def sample_fraction(
    df: DataFrame, id_col: str, *, percent: int, salt: str = ""
) -> DataFrame:
    """Keep ~percent% of rows, deterministically by id hash."""
    return df.filter(hash_bucket(id_col, salt=salt) < percent)


def assign_split(
    df: DataFrame,
    id_col: str,
    *,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a train/val/test split column, stable under any reordering
    or growth of the dataset."""
    b = hash_bucket(id_col, salt=salt)
    return df.withColumn(
        split_col,
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str] | tuple[str, ...],
    *,
    cap: int,
    salt: str = "",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling toward ``cap`` rows per
    stratum (language/source balancing for training mixes): stratum
    rate = min(1, cap / stratum_count), and a row survives iff its
    salted id hash-bucket falls below ``floor(rate * buckets)``.

    Scale shape: one map-side-combinable count per stratum (strata
    are few — languages, sources), broadcast back onto the corpus,
    then a map-only filter. No repartition, no per-stratum limit/sort
    (a LIMIT-per-group would funnel each stratum through one
    reducer). Rates are derived from exact integer counts and IEEE
    division, so the kept set is engine- and partitioning-independent;
    the kept count is binomial around the cap, not exactly the cap —
    the price of a shuffle-free, growth-stable design (each row's
    fate never depends on other rows' hashes).
    """
    strata = list(strata_cols)
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_stratum_n"))
    thresh = F.floor(
        F.least(F.lit(1.0), F.lit(float(cap)) / F.col("_stratum_n"))
        * F.lit(buckets)
    ).cast("long")
    return (
        df.join(F.broadcast(counts.withColumn("_thresh", thresh)), strata)
        .filter(hash_bucket(id_col, buckets=buckets, salt=salt) < F.col("_thresh"))
        .drop("_stratum_n", "_thresh")
    )


def pack_token_shards(
    df: DataFrame,
    id_col: str,
    size_col: Column | str,
    *,
    shard_tokens: int,
    n_buckets: int = 8,
    bucket_col: str = "bucket",
    shard_col: str = "shard_no",
) -> DataFrame:
    """Assign each document to a training shard of ~``shard_tokens``
    tokens: deterministic hash bucket + greedy first-fit packing
    within the bucket in hash order.

    The scale shape: packing is inherently sequential, so a single
    global running sum would serialize 100 TB through one window
    partition. Instead rows hash into ``n_buckets`` independent
    streams (one window partition each — parallel across the
    cluster), and each stream packs greedily by EXCLUSIVE running
    token sum: shard = floor(tokens_before_this_doc / shard_tokens).
    Deterministic: ordering is (md5(id), id) — reproducible across
    engines, runs, and partitionings for a fixed corpus. Raise
    ``n_buckets`` to the cluster's parallelism at scale; shards are
    then named (bucket, shard_no).
    """
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    c = F.col(id_col)
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(F.md5(c.cast("string")), c)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn(bucket_col, hash_bucket(id_col, buckets=n_buckets))
        .withColumn("_tokens_before", F.coalesce(F.sum(size).over(w), F.lit(0)))
        .withColumn(
            shard_col, F.floor(F.col("_tokens_before") / F.lit(shard_tokens))
        )
        .drop("_tokens_before")
    )


def mixture_rebalance(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, int],
    *,
    salt: str = "mix|",
) -> DataFrame:
    """Rebalance a multi-source corpus toward target mixture
    ``weights`` by deterministic down-sampling only (the Pile-style
    mixture construction, without up-sampling duplication): the
    most-constrained source — the one with the smallest n_s/w_s —
    keeps all its rows, and every other source's acceptance rate is
    scaled so expected kept counts are proportional to the weights.

    Rates are exact integer basis points,
    ``rate_bp = min(10000, ⌊10000·w_s·n_min / (w_min·n_s)⌋)``
    computed from exact counts (no float ratios anywhere), and
    acceptance is the md5 hash-bucket rule shared by the whole
    sampling family — engine-reproducible, growth-stable, map-only
    after one counts aggregation (sources are few; the counts and
    the anchor row broadcast).

    Sources absent from ``weights`` default to weight 1. Returns the
    kept rows with their source's ``rate_bp`` attached; the rates
    frame itself is available via ``mixture_rates``."""
    rates = mixture_rates(df, source_col, weights)
    return df.join(F.broadcast(rates.drop("n_docs")), source_col).filter(
        hash_bucket(id_col, buckets=10000, salt=salt) < F.col("rate_bp")
    )


def mixture_rates(
    df: DataFrame, source_col: str, weights: dict[str, int]
) -> DataFrame:
    """Per-source acceptance rates for ``mixture_rebalance``:
    (source, n_docs, rate_bp). One counts aggregation; the anchor
    (most-constrained source, ties toward the smaller name) is a
    TakeOrdered over the tiny per-source counts, never the corpus."""
    wmap = F.create_map(
        *[x for s, w in sorted(weights.items()) for x in (F.lit(s), F.lit(int(w)))]
    )
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", F.coalesce(wmap[F.col(source_col)], F.lit(1)))
    )
    anchor = (
        counts.orderBy(
            (F.col("_n").cast("double") / F.col("_w")).asc(), F.col(source_col).asc()
        )
        .limit(1)
        .select(F.col("_n").alias("_n_min"), F.col("_w").alias("_w_min"))
    )
    return counts.crossJoin(F.broadcast(anchor)).select(
        source_col,
        F.col("_n").alias("n_docs"),
        F.least(
            F.lit(10000),
            F.floor(
                F.lit(10000) * F.col("_w") * F.col("_n_min")
                / (F.col("_w_min") * F.col("_n"))
            ),
        )
        .cast("long")
        .alias("rate_bp"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    k: int = 10,
    group_cols: tuple[str, ...] = (),
    salt: str = "",
    score_col: str = "score_q",
    rank_col: str = "rn",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``k`` rows per group whose key ``ln(u)/w`` ranks highest, where
    ``u`` is an md5-derived uniform in (0,1) and ``w`` the row weight
    — the Efraimidis–Spirakis A-ES exponential-jumps key (selection
    probability proportional to weight), with the randomness replaced
    by the corpus's content hash so the sample is reproducible across
    engines, runs, and partitionings (the same determinism contract
    as ``assign_split``).

    Map-only scoring plus one top-k window per group; Spark rewrites
    the ``row_number <= k`` filter into WindowGroupLimit, so each
    partition forwards at most k candidates per group — no full sort,
    no global shuffle of the corpus. The score is quantized (1e-12
    grid) before ranking and ties break on the id, so the cut is
    engine-identical. Rows with non-positive weight are excluded (a
    zero weight has zero selection probability; ln(u)/0 is ±Inf).
    """
    c = F.col(id_col)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    score = F.log(u) / F.col(weight_col).cast("double")
    sq = F.floor(score * F.lit(1e12)) / F.lit(1e12)
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(
        F.col(score_col).desc(), c.asc()
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(score_col, sq)
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def cap_per_source(
    df: DataFrame,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    order_col: str = "quality",
    n_max: int = 1000,
) -> DataFrame:
    """Per-source document cap (the RefinedWeb/CCNet "no domain
    dominates" discipline): keep at most ``n_max`` rows per
    ``source_col``, preferring the highest ``order_col`` (quality
    score), ties broken by ``id_col`` ascending so the kept set is a
    pure function of the data — reproducible across engines and
    partitionings, like every sampling decision in this module.

    Web crawls are Zipf-distributed over domains; without a cap the
    head domains dominate the token budget and the dedup stages'
    hot keys. Cost: ONE window shuffle on the source key, and Spark
    rewrites the ``row_number <= n_max`` filter into
    WindowGroupLimit, so each map partition forwards at most
    ``n_max`` candidates per source instead of the full group — the
    cap gets CHEAPER relative to a plain sort as sources get hotter,
    which is exactly when it matters.
    """
    w = Window.partitionBy(source_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_src_rank", F.row_number().over(w))
        .filter(F.col("_src_rank") <= n_max)
        .drop("_src_rank")
    )


def rendezvous_shard(
    id_col: Column | str, *, shards: int, salt: str = ""
) -> Column:
    """Rendezvous (highest-random-weight) shard assignment: the shard
    with the largest md5-fold hash of ``id:shard`` wins
    (Thaler & Ravishankar 1998). Unlike ``hash_bucket``'s modulo,
    GROWING the shard count moves only ~1/(n+1) of the keys — the
    property an incremental resharding of a 100 TB corpus needs
    (modulo reshuffles almost everything). Pure map-side expression:
    an array of (hash, shard) structs reduced by array_max — zero
    shuffle, O(shards) work per row, replayable by any engine with
    md5 (the module's cross-engine hash convention).
    """
    from pipelines_spark.operators.sketches import md5_hash32

    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.array_max(
        F.array(
            *[
                F.struct(
                    md5_hash32(
                        F.concat_ws(":", col.cast("string"), F.lit(salt + str(s)))
                    ).alias("h"),
                    F.lit(s).cast("long").alias("s"),
                )
                for s in range(shards)
            ]
        )
    )["s"]


def largest_remainder_quota(
    df: DataFrame, group_col: str, *, budget: int
) -> DataFrame:
    """Hamilton / largest-remainder apportionment of a document
    ``budget`` across ``group_col`` groups, proportional to group
    size: each group gets floor(budget·n_g/total), and the leftover
    seats go to the largest remainders (ties by group name, so the
    allocation is a pure function of the data). This is the exact
    integer allocation a mixture spec needs BEFORE sampling — quotas
    sum to exactly ``budget`` by construction, where independent
    per-group rounding drifts. All arithmetic is integer (the
    remainder is ``budget·n_g mod total``), so the result is
    engine-exact. State: one row per group; nothing scales with rows.

    Returns (group_col, n_docs, quota).
    """
    from pyspark.sql import Window

    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("_total"))
    alloc = per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        F.floor(F.lit(budget) * F.col("n_docs") / F.col("_total")).alias("_floor"),
        (F.lit(budget) * F.col("n_docs") % F.col("_total")).alias("_rem"),
    )
    wrem = Window.orderBy(F.desc("_rem"), F.asc(group_col))
    short = alloc.groupBy().agg((F.lit(budget) - F.sum("_floor")).alias("_short"))
    return (
        alloc.withColumn("_rk", F.row_number().over(wrem))
        .crossJoin(F.broadcast(short))
        .select(
            group_col,
            "n_docs",
            (F.col("_floor") + (F.col("_rk") <= F.col("_short")).cast("long")).alias(
                "quota"
            ),
        )
    )
