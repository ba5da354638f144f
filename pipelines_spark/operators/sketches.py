"""Mergeable sketch operators.

KMV (k-minimum-values) distinct-count estimation: every partition
keeps only its ``k`` smallest *distinct* hash values (O(k) state and
O(k) output per partition, regardless of partition size), and the
global merge is a distinct + ordered ``LIMIT k`` over at most
``k x partitions`` candidate rows. The k-th smallest of the merged
candidates equals the k-th smallest of the global distinct hash set
(any globally-top-k value is necessarily within the top-k of its own
partition), so the distributed sketch is bit-identical to a
single-node KMV — and therefore exactly replayable by the DuckDB
oracle with a plain ``ORDER BY h LIMIT k``.

Estimator (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM 2002): with hashes uniform on [0, 2^32), the k-th
smallest value h_k estimates the distinct count as
``(k-1) * 2^32 / h_k``. Integer division keeps the result exact and
engine-independent (no float rounding at the boundary).

Hashing uses the repo's cross-engine convention: first 32 bits of
``md5(value-as-string)`` (cf. llm/dedup._md5_hash32) so Spark and the
DuckDB oracle agree on every hash. Hash collisions merge values in
BOTH engines identically — they are part of the sketch's (bounded)
error, not a parity hazard.

Reference parity: the reference has no sketches — it answers
"how many distinct X" with exact BigQuery COUNT(DISTINCT)
(e.g. /root/reference/pipelines/rj_smtr/constants.py:348-420 checks).
At 100 TB an exact distinct is a full shuffle of the key set; KMV
answers the same monitoring questions with O(k) per-partition state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def md5_hash32(col: Column) -> Column:
    """First 32 bits of md5(string(col)) as a non-negative long —
    reproducible in any engine with md5."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def kmv_candidates(df: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """Per-partition KMV state: the ``k`` smallest distinct 32-bit
    hashes of ``value_col`` in each input partition, via an
    Arrow-batched ``mapInPandas`` that never holds more than the
    running top-k per partition."""
    hashed = df.select(md5_hash32(F.col(value_col)).alias("h"))
    schema = T.StructType([T.StructField("h", T.LongType())])

    def _partition_kmv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        best: "np.ndarray | None" = None
        for pdf in batches:
            vals = np.unique(pdf["h"].to_numpy())  # sorted distinct
            if best is None:
                best = vals[:k]
            else:
                best = np.unique(np.concatenate([best, vals]))[:k]
        if best is not None and len(best):
            yield pd.DataFrame({"h": best})

    return hashed.mapInPandas(_partition_kmv, schema=schema)


def kmv_distinct(df: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """Distinct-count estimate for ``value_col``.

    Returns one row ``(k, kth_hash, est_distinct)``. When fewer than
    ``k`` distinct hashes exist the sketch degenerates to the exact
    distinct count (est = n_seen); ``kth_hash = 0`` (an md5 prefix of
    eight zero nibbles) is guarded to avoid division by zero.
    """
    cand = kmv_candidates(df, value_col, k)
    # <= k x partitions candidate rows: the distinct + TakeOrdered is
    # driver-cheap at any corpus size
    merged = cand.dropDuplicates(["h"]).orderBy("h").limit(k)
    numer = (k - 1) * (1 << 32)
    return merged.agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth_hash")
    ).select(
        F.lit(k).alias("k"),
        "kth_hash",
        F.when(F.col("n_seen") < k, F.col("n_seen"))
        .when(F.col("kth_hash") > 0, F.expr(f"CAST({numer} AS BIGINT) DIV kth_hash"))
        .alias("est_distinct"),
    )


def kmv_candidates_by(
    df: DataFrame, value_col: str, group_col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV state as (group_col, h) — the ``k`` smallest
    distinct hashes per group, via distinct + per-group top-k.

    Pure JVM: the ``row_number() <= k`` filter compiles to
    WindowGroupLimit, whose partial mode caps each map task's output
    at k rows per group BEFORE the exchange — the same bounded-shuffle
    posture as the mapInPandas global sketch, without Python.

    Sketches over the same hash family compose: the union sketch of
    two groups is the k smallest of their candidates' union, and
    intersections follow by inclusion–exclusion — the set-algebra
    trick theta sketches industrialize."""
    from pyspark.sql import Window

    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), md5_hash32(F.col(value_col)).alias("h"))
        .dropDuplicates([group_col, "h"])
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(group_col, "h")
    )


def kmv_estimate_from_candidates(cand: DataFrame, k: int) -> DataFrame:
    """(n_seen, kth_hash, est_distinct) from a single sketch's
    candidate rows (column ``h``): same integer estimator and
    below-k degeneracy as ``kmv_distinct``."""
    numer = (k - 1) * (1 << 32)
    merged = cand.dropDuplicates(["h"]).orderBy("h").limit(k)
    return merged.agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth_hash")
    ).select(
        "n_seen",
        "kth_hash",
        F.when(F.col("n_seen") < k, F.col("n_seen"))
        .when(
            F.col("kth_hash") > 0,
            F.expr(f"CAST({numer} AS BIGINT) DIV kth_hash"),
        )
        .alias("est_distinct"),
    )


def cms_table(
    df: DataFrame, value_col: str, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) of
    ``value_col`` frequencies as an aggregated table
    ``(row_idx, bucket, cnt)``.

    Each input row explodes into ``depth`` (row, bucket) updates
    map-side (salted md5 per row — the repo's cross-engine hash
    convention, so a SQL oracle replays the sketch EXACTLY); partial
    aggregation caps the shuffle at depth x width keys per partition
    regardless of input size — the same bounded-state posture as KMV.
    The sketch is mergeable by construction: summing two sketches'
    ``cnt`` per (row_idx, bucket) is the sketch of the union.

    NULL values are excluded (a NULL has no frequency; the salted
    concat would propagate NULL through the hash anyway).
    """
    updates = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_idx"),
                    (
                        md5_hash32(
                            F.concat(
                                F.lit(f"cms{i}|"), F.col(value_col).cast("string")
                            )
                        )
                        % width
                    ).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(updates.alias("u"))
        .select("u.row_idx", "u.bucket")
        .groupBy("row_idx", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    probe_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates from a ``cms_table`` sketch: for each
    probe value, min over the sketch rows of its bucket counts — never
    an undercount, overcount bounded by collisions (≤ n/width per row,
    the min over ``depth`` independent rows makes it exp. unlikely).

    The probe side re-derives the same salted hashes; empty buckets
    count 0 via the left join. The sketch is tiny (≤ depth x width
    rows) so Spark broadcasts it under the probes at any corpus size.
    """
    ph = (
        probes.filter(F.col(probe_col).isNotNull())
        .select(
            F.col(probe_col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row_idx"),
                            (
                                md5_hash32(
                                    F.concat(
                                        F.lit(f"cms{i}|"),
                                        F.col(probe_col).cast("string"),
                                    )
                                )
                                % width
                            ).alias("bucket"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("u"),
        )
        .select(probe_col, "u.row_idx", "u.bucket")
    )
    return (
        ph.join(F.broadcast(cms), ["row_idx", "bucket"], "left")
        .groupBy(probe_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def hll_registers(df: DataFrame, value_col: str, *, b: int = 8) -> DataFrame:
    """HyperLogLog registers (Flajolet et al., AofA 2007) for
    ``value_col`` as an aggregated table ``(bucket, m_j)``.

    Hash = first 56 bits of md5('hll|' || value) — the repo's
    cross-engine convention, so a SQL oracle replays every register
    exactly. Top ``b`` bits pick the bucket (m = 2^b registers); the
    register value m_j is the 1-based position of the first set bit
    in the remaining 48 bits (all-zero remainder → 49).

    Scale shape: map-only hashing + one hash aggregation whose
    partial (map-side) state is capped at 2^b keys per partition —
    the shuffle carries O(partitions × 2^b) rows no matter how many
    input rows exist. Registers merge by MAX(m_j) per bucket, the
    HLL union, so sketches from independent corpora compose.
    """
    rem_bits = 56 - b
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), F.col(value_col).cast("string"))), 1, 14),
        16,
        10,
    ).cast("long")
    hashed = df.filter(F.col(value_col).isNotNull()).select(h.alias("h"))
    w = F.col("h") % (1 << rem_bits)
    rho = F.when(w == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(w))
    )
    return (
        # integer DIV, not `/`: float division of a 56-bit value loses
        # low bits (53-bit mantissa) and can misplace boundary hashes
        hashed.select(
            F.expr(f"CAST(h DIV {1 << rem_bits} AS BIGINT)").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_distinct_by(
    df: DataFrame, value_col: str, group_cols: list[str], *, b: int = 8
) -> DataFrame:
    """Per-group HyperLogLog distinct estimates:
    ``(*group_cols, n_used, zeros, est_distinct)``.

    The grouped register aggregation keys on (group, bucket) — state
    per group is 2^b registers no matter how many values stream
    through, which is the whole point vs a per-group COUNT DISTINCT
    (whose shuffle carries every distinct (group, value) pair). Same
    exact-integer harmonic sum and small-range branch as
    ``hll_distinct``; same hash, so a group's registers here merge
    with any other sketch of the same values."""
    m = 1 << b
    scale = 56 - b + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    rem_bits = 56 - b
    hashed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll|"), F.col(value_col).cast("string"))), 1, 14
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    w = F.col("h") % (1 << rem_bits)
    rho = F.when(w == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits + 1) - F.length(F.bin(w))
    )
    regs = (
        hashed.select(
            *group_cols,
            F.expr(f"CAST(h DIV {1 << rem_bits} AS BIGINT)").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - m_j)"))
        .cast("long")
        .alias("denom_used"),
    )
    denom_scaled = (
        F.col("denom_used") + (F.lit(m) - F.col("n_used")) * F.lit(1 << scale)
    ).cast("long")
    zeros = (F.lit(m) - F.col("n_used"))
    raw = (
        F.lit(float(alpha * m * m))
        * F.lit(float(1 << scale))
        / denom_scaled.cast("double")
    )
    return agg.select(
        *group_cols,
        "n_used",
        zeros.alias("zeros"),
        F.round(
            F.when(
                (raw <= 2.5 * m) & (zeros > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
            ).otherwise(raw),
            0,
        )
        .cast("long")
        .alias("est_distinct"),
    )


def hll_distinct(df: DataFrame, value_col: str, *, b: int = 8) -> DataFrame:
    """One-row HyperLogLog distinct-count estimate:
    ``(m, n_used, zeros, denom_scaled, est_distinct)``.

    The harmonic-mean denominator Σ 2^(-m_j) is kept as an EXACT
    integer scaled by 2^49 (max 2^b · 2^48 < 2^63 — no float
    summation order anywhere), so both engines agree bit-for-bit;
    only the final estimate applies the float constant α_m and the
    small-range linear-counting branch (E ≤ 2.5m with empty
    registers → m·ln(m/zeros)), each a single deterministic libm
    call rounded to an integer. Large-range (2^32) correction is
    deliberately omitted: the 56-bit hash space makes it moot below
    ~10^15 distincts."""
    m = 1 << b
    scale = 56 - b + 1  # Σ2^(-m_j) scaled exact: max m·2^scale < 2^63
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = hll_registers(df, value_col, b=b)
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - m_j)"))
        .cast("long")
        .alias("denom_used"),
    )
    raw = (
        F.lit(float(alpha * m * m))
        * F.lit(float(1 << scale))
        / F.col("denom_scaled").cast("double")
    )
    return agg.select(
        F.lit(m).alias("m"),
        "n_used",
        (F.lit(m) - F.col("n_used")).alias("zeros"),
        (
            F.col("denom_used")
            + (F.lit(m) - F.col("n_used")) * F.lit(1 << scale)
        ).cast("long").alias("denom_scaled"),
    ).select(
        "m",
        "n_used",
        "zeros",
        "denom_scaled",
        F.round(
            F.when(
                (raw <= 2.5 * m) & (F.col("zeros") > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
            ).otherwise(raw),
            0,
        )
        .cast("long")
        .alias("est_distinct"),
    )


def cms_join_size(
    cms_a: DataFrame, cms_b: DataFrame
) -> DataFrame:
    """Join-CARDINALITY estimate |A ⋈_k B| = Σ_k f_A(k)·f_B(k) from
    two ``cms_table`` sketches of the join keys — the inner-product
    estimator (Cormode & Muthukrishnan, J.Alg 2005 §4.2; AMS
    lineage): within one sketch row, Σ_buckets cntA·cntB equals the
    true inner product PLUS non-negative collision terms, so each row
    overestimates and the MIN over the ``depth`` independent rows is
    the estimate (never an undercount, error ≤ ‖A‖₁‖B‖₁/width per
    row w.h.p.).

    This is the planner discipline at 100 TB: the output size of a
    candidate join priced from two O(depth × width) sketches — built
    in one bounded-state pass each, mergeable across shards — before
    committing to the join's shuffle. Both sketches must share depth,
    width, and the salted-md5 hash family, which they do by
    construction when both come from :func:`cms_table`.

    Returns one row: ``(est_join_size bigint)``.
    """
    # inner join only sees OVERLAPPING buckets — a depth row with zero
    # shared buckets has inner product 0 (the tightest estimate) and
    # must not be dropped from the min, so left-join the per-row
    # products back onto the full row_idx spine and coalesce to 0;
    # the outer coalesce covers two empty sketches (est 0, not NULL,
    # so advise_join's int(est) never sees None)
    prod = (
        cms_a.alias("a")
        .join(cms_b.alias("b"), ["row_idx", "bucket"])
        .groupBy("row_idx")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("_ip"))
    )
    spine = cms_a.select("row_idx").union(cms_b.select("row_idx")).distinct()
    per_row = spine.join(prod, "row_idx", "left").select(
        F.coalesce("_ip", F.lit(0)).alias("_ip")
    )
    return per_row.agg(
        F.coalesce(F.min("_ip"), F.lit(0)).cast("long").alias("est_join_size")
    )


# ---------------------------------------------------------------------------
# Bloom filter: semi-join reduction
# ---------------------------------------------------------------------------

def _bloom_pos(key: Column, j: int, m_bits: int) -> Column:
    """Bit position of hash ``j`` for ``key``: xxhash64 seeded by the
    hash index, non-negative mod ``m_bits``. Deliberately NOT the
    sketch family's cross-engine md5 convention: the Bloom is a pure
    pruning structure whose correctness oracle is the exact join
    after it, so no other engine ever replays these positions — and
    the probe side hashes EVERY row k times, where whole-stage-codegen
    xxhash64 is ~100x cheaper than md5-hex + conv (measured 6.4 s →
    0.7 s on the j19 probe at sf0.1). Deterministic within Spark,
    which is all the tests and the build/probe contract need. The
    key is hashed in its NATIVE type (xxhash64 handles numerics
    directly) — no per-row string cast on the probe hot path; build
    and probe must simply agree on the key's type, which they do by
    hashing the same column."""
    return F.pmod(F.xxhash64(F.lit(f"bloom{j}"), key), F.lit(m_bits))


def bloom_bitmap(
    df: DataFrame, key_col: str, *, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Build a Bloom filter over ``df[key_col]`` as a slot-indexed
    bitmap TABLE: ``(slot, word)`` with ``word`` the bitwise-OR of
    the 64 bits in that slot — at most ``m_bits / 64`` rows total,
    REGARDLESS of how many keys went in. That fixed size is the whole
    point: a 2^20-bit filter is 16 Ki rows (~128 KiB) whether it
    summarizes ten thousand keys or ten billion, so it broadcasts
    where the key set itself never could.

    Plan shape: explode k positions per key (map-side), partial
    ``bit_or`` per slot in each partition, one ≤ m/64-per-partition
    shuffle to merge — O(m) state everywhere, never O(keys). The
    seeded-xxhash64 positions (see ``_bloom_pos`` for why this sketch
    deliberately leaves the module's cross-engine md5 convention) are
    still a pure function of the key set — partitioning-independent
    within Spark, which is all a pruning-only structure needs.
    """
    key = F.col(key_col)
    exploded = df.select(
        F.explode(
            F.array(*[_bloom_pos(key, j, m_bits) for j in range(k)])
        ).alias("_pos")
    )
    return (
        exploded.select(
            F.floor(F.col("_pos") / 64).cast("long").alias("slot"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_bit"),
        )
        .groupBy("slot")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    *,
    m_bits: int = 1 << 20,
    k: int = 3,
    mode: str = "literal",
) -> DataFrame:
    """Keep the probe rows whose ``key_col`` MIGHT be in the set the
    ``bitmap`` summarizes (no false negatives; false-positive rate
    ≈ (1 - e^(-k·n/m))^k). The semi-join-reduction pattern: at scale
    an exact semi-join shuffles the full probe table on the key; this
    prunes the probe MAP-SIDE first so only surviving candidates
    reach the exact join's shuffle. Always follow with the exact
    join: the Bloom is a performance structure, not an answer.

    ``mode="literal"`` (default): the bitmap — at most m/64 longs,
    128 KiB at 2^20 bits — is collected once and embedded as a
    literal array, so the probe is a PURE whole-stage-codegen filter:
    k ``element_at``+mask tests per row, zero joins, zero broadcast
    builds. This is the true Bloom shape (the filter is a compact
    VALUE, not a table) and mirrors the IVF family's driver-scale
    index-build step. Guarded to m_bits ≤ 2^24 (2 MiB of literals).

    ``mode="join"``: k broadcast equi-joins against the bitmap
    table — no driver materialization, for filters too big to embed.
    """
    key = F.col(key_col)
    if mode == "literal":
        if m_bits > 1 << 24:
            raise ValueError(
                "literal mode embeds m_bits/64 longs in the plan; "
                f"m_bits={m_bits} > 2^24 — use mode='join'"
            )
        words = [0] * (m_bits // 64)
        for r in bitmap.collect():
            words[int(r["slot"])] = int(r["word"])
        # a TRUE array literal (one Literal node) — F.array(*2048
        # F.lits) is a CreateArray re-evaluated per row, which costs
        # more than the joins it replaces
        lit_words = F.lit(words).cast("array<bigint>")
        out = probe
        for j in range(k):
            out = (
                out.withColumn("_bp", _bloom_pos(key, j, m_bits))
                .withColumn(
                    "_bm",
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bp % 64 AS INT))"),
                )
                .withColumn(
                    "_bw",
                    F.element_at(lit_words, (F.col("_bp") / 64).cast("int") + 1),
                )
                .filter(F.col("_bw").bitwiseAND(F.col("_bm")) == F.col("_bm"))
                .drop("_bp", "_bm", "_bw")
            )
        return out
    if mode != "join":
        raise ValueError(f"mode must be 'literal' or 'join', got {mode!r}")
    out = probe
    for j in range(k):
        pos = _bloom_pos(key, j, m_bits)
        bm = bitmap.select(
            F.col("slot").alias(f"_s{j}"), F.col("word").alias(f"_w{j}")
        )
        out = (
            out.withColumn(f"_pos{j}", pos)
            .withColumn(f"_slot{j}", F.floor(F.col(f"_pos{j}") / 64).cast("long"))
            .withColumn(
                f"_mask{j}",
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_pos{j} % 64 AS INT))"),
            )
            .drop(f"_pos{j}")
            .join(F.broadcast(bm), F.col(f"_slot{j}") == F.col(f"_s{j}"))
            .filter(
                F.col(f"_w{j}").bitwiseAND(F.col(f"_mask{j}"))
                == F.col(f"_mask{j}")
            )
            .drop(f"_slot{j}", f"_mask{j}", f"_s{j}", f"_w{j}")
        )
    return out
