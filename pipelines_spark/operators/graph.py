"""Graph operators beyond connected components (llm/dedup.py).

PageRank with EXACT integer arithmetic: ranks are maintained as
BIGINT numerators scaled by 1e15, and every division is integer
``DIV`` — deterministic to the last unit across engines and
partitionings, so a DuckDB oracle can replay the iterations
bit-for-bit (the same exact-replay discipline as the k-means and KMV
oracles; float PageRank would drift in the last ulp with summation
order). The truncation error per step is < 1e-15 of total mass —
irrelevant next to the damping-factor convergence error of a bounded
iteration count.

Each iteration is one join (rank ⋈ edges on src) + one aggregate
(sum contributions by dst) — the standard scalable PR shape: at 100
TB the edge table shuffle-partitions on src once and every iteration
reuses it; iterations are bounded by the caller, never data-driven.
Dangling nodes (no out-edges) are excluded from the node universe by
construction when edges are made bidirectional; for directed use,
pre-filter or accept mass leakage like the simple formulation does.

The reference has no graph operators; this generalizes its
"relation check" notion of entity importance (SURVEY §2.6 A1) the
way near-dup clustering generalized its exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000_000  # 1e15 fixed-point rank numerators


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node, rank_scaled)`` where ``rank_scaled`` is the
    BIGINT fixed-point rank (divide by 1e15 for the float value).
    ``damping_pct`` is the damping factor in percent (integer, so the
    85/100 split stays exact).

    rank_0 = SCALE DIV N per node;
    rank_{t+1}(v) = ((100-d) * (SCALE DIV N)) DIV 100
                  + (d * Σ_{u→v} rank_t(u) DIV outdeg(u)) DIV 100.
    Nodes nobody links to keep the teleport term only.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one small action; N is a plan constant
    base = SCALE // n_nodes
    teleport = (100 - damping_pct) * base // 100

    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank_scaled"))
    for _ in range(iterations):
        contrib = (
            ranks.join(e, ranks["node"] == e["_s"])
            .join(outdeg, "_s")
            .select(
                F.col("_d").alias("node"),
                F.expr("rank_scaled DIV _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"CAST({damping_pct} AS BIGINT) * coalesce(_in, CAST(0 AS BIGINT)) DIV 100"
                    )
                ).cast("long").alias("rank_scaled"),
            )
        )
    return ranks


def triangle_count(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count of an undirected graph given as an edge
    list (either or both directions; self-loops ignored).

    Textbook scalable shape: canonicalize each edge to (lo, hi) with
    a TOTAL order on vertices, then count paths lo→mid→hi whose
    closing edge (lo, hi) exists — each triangle is counted exactly
    once. Two equi-joins on vertex keys; the degree-skew refinement
    (order vertices by degree instead of id, so hubs never serve as
    the fan-out vertex of the join) drops in by swapping the ordering
    expression — id order keeps the oracle replay simple here.

    Returns a 1-row frame ``(n_triangles)``.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = canon.alias("e1")  # a < b
    e2 = canon.alias("e2")  # b < c
    e3 = canon.alias("e3")  # closing a < c
    paths = e1.join(e2, F.col("e1.b") == F.col("e2.a"))
    closed = paths.join(
        e3,
        (F.col("e1.a") == F.col("e3.a")) & (F.col("e2.b") == F.col("e3.b")),
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def khop_reachability(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_hops: int = 2,
) -> DataFrame:
    """Minimum hop distance from a source node set, bounded by
    ``max_hops`` (BFS unrolled a fixed number of levels).

    Level expansion is one join (frontier ⋈ edges) + one min-aggregate
    per hop; the frontier is only the nodes FIRST reached at the
    previous level, so re-expansion of settled nodes never happens —
    the standard bounded-reachability shape (recommendation radius,
    blast-radius analysis, fraud rings). Hop counts are exact
    integers, so the oracle unrolls the same levels in SQL.

    Returns ``(node, min_hops)`` for every node within ``max_hops``
    (sources at 0).
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    reached = sources.select(
        F.col(node_col).alias("node"), F.lit(0).alias("min_hops")
    ).distinct()
    frontier = reached
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(reached, "node", "left_anti")
            .select("node", F.lit(hop).alias("min_hops"))
        )
        reached = reached.unionByName(nxt)
        frontier = nxt
    return reached


def ancestor_closure(
    edges: DataFrame,
    *,
    node: str = "node",
    parent: str = "parent",
    max_depth: int = 16,
) -> DataFrame:
    """Transitive (node, ancestor) closure of a parent-pointer forest
    — the hierarchy primitive behind org-chart rollups and
    bill-of-materials explosion, which SQL expresses as a recursive
    CTE and Spark as iterated joins.

    Pointer DOUBLING, not level-at-a-time chaining: round r joins the
    closure-so-far with itself, so paths up to 2^r edges exist after r
    rounds — ceil(log2(max_depth)) self-joins instead of max_depth
    sequential ones. For a 16-deep hierarchy that is 4 shuffled joins
    rather than 16; at 100 TB the win is fewer barrier stages, and
    every join keys on the (node/ancestor) id so AQE handles skewed
    fan-in nodes. Output size is n·depth pairs (each node has at most
    ``max_depth`` proper ancestors); the per-round distinct dedupes
    the multiple split points a doubled path can take.

    Returns ``(node, ancestor)`` for every PROPER ancestor reachable
    within ``max_depth`` parent steps (self pairs excluded; union
    them in if subtree-inclusive semantics are wanted).
    """
    closure = (
        edges.select(F.col(node).alias("node"), F.col(parent).alias("ancestor"))
        .filter(F.col("ancestor").isNotNull())
        .distinct()
    )
    rounds = max(1, (max_depth - 1).bit_length())
    for _ in range(rounds):
        hop = closure.select(
            F.col("node").alias("_mid"), F.col("ancestor").alias("_anc")
        )
        doubled = (
            closure.join(hop, closure["ancestor"] == hop["_mid"])
            .select("node", F.col("_anc").alias("ancestor"))
        )
        # lazy lineage cut: each round references closure twice, so
        # without a checkpoint the plan tree TRIPLES per round — the
        # same trap connected_components dodges (llm/dedup.py:533)
        closure = (
            closure.unionByName(doubled).distinct().localCheckpoint(eager=False)
        )
    return closure
