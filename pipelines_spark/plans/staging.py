"""Staging policy for iterative operators.

Iterative operators (pagerank, connected_components, semantic_dedup,
…) must materialize loop invariants and cut per-iteration lineage, or
the logical plan grows with the iteration count and multiply-
referenced stages recompute. HOW they materialize is a durability /
speed trade the caller should own:

- ``"local"`` (default): ``DataFrame.localCheckpoint`` — blocks live
  in executor storage (memory, spilling to local disk). Fastest, no
  configuration, and the blocks are freed by the ContextCleaner when
  the frame is GC'd. BUT lineage is discarded, so losing an executor
  loses the blocks unrecoverably and fails the job. Right for
  single-node runs, short jobs, and anything cheap to rerun.

- ``"checkpoint"``: ``DataFrame.checkpoint`` — blocks are written to
  the reliable checkpoint directory (HDFS / object store on a
  cluster; ``spark.sparkContext.setCheckpointDir`` must have been
  called). One extra write+read round-trip per staging point, but a
  lost executor re-reads instead of failing — the right posture for
  100 TB multi-hour jobs where preemption is routine and restarting
  a 20-round components loop costs more than the checkpoint writes.
  Checkpoint files persist until the checkpoint dir is cleaned
  (``spark.cleaner.referenceTracking.cleanCheckpoints=true`` opts
  into GC-driven cleanup).

See docs/SCALE.md ("Durable staging for iterative operators") for
the measured trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

STAGING_MODES = ("local", "checkpoint")


def widen_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition an input whose SCAN produced far fewer
    partitions than the session's parallelism — the guide §2.5
    "input skew" remedy (one huge unsplittable file / single-row-group
    parquet / gzip: repartition immediately after the read) made
    scale-adaptive: a no-op whenever the scan is already at least
    half-parallel, which is every real multi-row-group/multi-file
    table, so the exchange exists ONLY where the input's physical
    layout would otherwise pin the whole map side of the operator to
    one core.

    Why it matters here (r12, measured): the bench corpora are
    single-row-group parquet files, so every scan is ONE task and all
    map-side work riding it — shingling, text gates, hash projections
    — ran 1/32-parallel. The repartition moves a few hundred KB once
    and parallelizes everything downstream of it (including persisted
    staging tables, whose block count it sets). Rows only ever carry
    (id, payload) through a round-robin exchange — no keyed semantics
    — and every consumer in this repo is partitioning-order-exact by
    the rounding/integer-sum discipline, so results are unchanged.
    """
    import os

    if os.environ.get("SPARK_GRAFT_NO_WIDEN"):  # measurement kill-switch
        return df
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= n:
        return df
    return df.repartition(n)


def stage(df: DataFrame, *, eager: bool = True, staging: str = "local") -> DataFrame:
    """Materialize ``df`` (or lazily mark it for materialization at
    its first action when ``eager=False``) and cut its lineage, under
    the chosen durability mode."""
    if staging == "local":
        return df.localCheckpoint(eager=eager)
    if staging == "checkpoint":
        return df.checkpoint(eager=eager)
    raise ValueError(f"staging must be one of {STAGING_MODES}, got {staging!r}")
