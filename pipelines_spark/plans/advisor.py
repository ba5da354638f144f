"""Sketch-driven join planning advice: price a join BEFORE paying for
its shuffle.

Catalyst already picks broadcast-vs-SMJ from byte statistics and AQE
re-plans skew at runtime; what neither gives a PIPELINE author is an
a-priori, data-dependent answer to "what will this join between two
100 TB tables DO?" — output cardinality, key-overlap, hot keys —
cheap enough to run as a pre-flight check. This module composes the
engine's own bounded-state sketches into that answer:

- output cardinality: CMS inner product
  (operators/sketches.py::cms_join_size) — O(depth × width) state per
  side, never an undercount;
- distinct keys per side: the md5 HLL registers
  (operators/sketches.py::hll_distinct);
- hot-key shares: exact Misra-Gries heavy hitters
  (operators/frequency.py::heavy_hitters) — O(capacity) candidate
  state, exact recount.

Every probe is one bounded-state pass over each input; nothing here
scales with key cardinality. The recommendation encodes the
engine's own remediations: `broadcast()` the small side, or route the
join through operators/skew.py::salted_join when one key dominates.

The advisor is intentionally DRIVER-SIDE and explicit — the point is
an auditable pre-flight report (the reference's cost-guard
discipline, plans/cost_guard.py provenance), not a hidden optimizer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default byte threshold under which a side is called broadcastable —
#: Spark's own autoBroadcastJoinThreshold default (10 MiB)
BROADCAST_BYTES = 10 * 1024 * 1024

#: a single key holding more than this share of a side's rows makes a
#: plain shuffle join skew-bound (one reducer does that share of the
#: probe work); route through salted_join instead
SKEW_SHARE = 0.2


@dataclass
class JoinAdvice:
    est_join_size: int
    n_rows_a: int
    n_rows_b: int
    est_distinct_a: int
    est_distinct_b: int
    top_key_share_a: float
    top_key_share_b: float
    est_bytes_a: int
    est_bytes_b: int
    recommendation: str
    reason: str


def _side_profile(df: DataFrame, key: str, *, hh_k: int = 8):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.concat_ws("\x00", *df.columns))).alias("bytes"),
    ).collect()[0]
    n, nbytes = row["n"], int(row["bytes"] or 0)
    from pipelines_spark.operators.frequency import heavy_hitters

    hh = heavy_hitters(df.select(key), key, k=hh_k).collect()
    top = max((r["cnt"] for r in hh), default=0)
    from pipelines_spark.operators.sketches import hll_distinct

    est = hll_distinct(df, key).collect()[0]["est_distinct"]
    return n, nbytes, est, (top / n if n else 0.0)


def advise_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    *,
    broadcast_bytes: int = BROADCAST_BYTES,
    skew_share: float = SKEW_SHARE,
) -> JoinAdvice:
    """Pre-flight report + strategy recommendation for
    ``a JOIN b ON key``.

    Decision ladder (first match wins):

    1. either side's estimated payload fits ``broadcast_bytes`` →
       ``broadcast`` that side (no shuffle at all);
    2. either side's hottest key exceeds ``skew_share`` of its rows →
       ``salted_join`` with the smaller side replicated;
    3. otherwise → plain ``shuffle`` (sort-merge/hash) join.

    The estimated join size rides along so callers can also gate on
    OUTPUT explosion (a many-to-many key set can make even two small
    inputs produce an enormous join — the case byte statistics can't
    see).
    """
    from pipelines_spark.operators.sketches import cms_join_size, cms_table

    n_a, bytes_a, d_a, share_a = _side_profile(a, key)
    n_b, bytes_b, d_b, share_b = _side_profile(b, key)
    est = cms_join_size(cms_table(a, key), cms_table(b, key)).collect()[0][
        "est_join_size"
    ]

    if min(bytes_a, bytes_b) <= broadcast_bytes:
        side = "a" if bytes_a <= bytes_b else "b"
        rec, why = (
            f"broadcast_{side}",
            f"side {side} ≈ {min(bytes_a, bytes_b)} bytes fits the "
            f"{broadcast_bytes}-byte broadcast budget; no shuffle needed",
        )
    elif max(share_a, share_b) > skew_share:
        hot = "a" if share_a >= share_b else "b"
        rec, why = (
            "salted_join",
            f"side {hot}'s hottest key holds "
            f"{max(share_a, share_b):.0%} of its rows — a plain shuffle "
            f"join funnels that share through one reducer",
        )
    else:
        rec, why = (
            "shuffle_join",
            "both sides exceed the broadcast budget and no key "
            f"exceeds the {skew_share:.0%} skew share",
        )
    return JoinAdvice(
        est_join_size=int(est),
        n_rows_a=n_a,
        n_rows_b=n_b,
        est_distinct_a=int(d_a),
        est_distinct_b=int(d_b),
        top_key_share_a=round(share_a, 4),
        top_key_share_b=round(share_b, 4),
        est_bytes_a=bytes_a,
        est_bytes_b=bytes_b,
        recommendation=rec,
        reason=why,
    )


def execute_advised_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    *,
    how: str = "inner",
    buckets: int = 8,
    broadcast_bytes: int = BROADCAST_BYTES,
    skew_share: float = SKEW_SHARE,
    advice: JoinAdvice | None = None,
) -> tuple[DataFrame, JoinAdvice]:
    """Run the advisor's pre-flight and EXECUTE its recommendation —
    the composition a pipeline author actually wants: one call that
    prices the join from bounded sketches, then routes it through the
    matching physical strategy:

    - ``broadcast_a`` / ``broadcast_b`` → the fitting side is wrapped
      in ``F.broadcast`` (plan shows BroadcastHashJoin, zero shuffle);
    - ``salted_join`` → the skewed side is salted and the other side
      replicated per bucket (operators/skew.py::salted_join), so the
      hot key spreads over ``buckets`` reducers instead of funneling
      through one;
    - ``shuffle_join`` → plain equi-join (sort-merge/hash under AQE).

    Returns ``(joined, advice)`` so callers can log the decision and
    its inputs (the reference's auditable cost-guard discipline).
    Pass a precomputed ``advice`` to skip re-profiling when the
    caller already ran the pre-flight. ``salted_join`` supports only
    inner joins (the replicated build side would break outer
    semantics); a non-inner ``how`` with a salted recommendation
    falls back to the plain join.
    """
    adv = advice or advise_join(
        a, b, key, broadcast_bytes=broadcast_bytes, skew_share=skew_share
    )
    if adv.recommendation == "broadcast_a":
        return a.hint("broadcast").join(b, key, how), adv
    if adv.recommendation == "broadcast_b":
        return a.join(F.broadcast(b), key, how), adv
    if adv.recommendation == "salted_join" and how == "inner":
        from pipelines_spark.operators.skew import salted_join

        # salt the HOT side (its reducers are the bottleneck); the
        # other side is replicated per salt bucket
        if adv.top_key_share_a >= adv.top_key_share_b:
            return salted_join(a, b, [key], buckets=buckets, how=how), adv
        out = salted_join(b, a, [key], buckets=buckets, how=how)
        # restore caller column order (a's columns first)
        return out.select(*a.columns, *[c for c in b.columns if c != key]), adv
    return a.join(b, key, how), adv
