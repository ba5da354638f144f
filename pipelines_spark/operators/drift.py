"""Distribution-drift monitoring: Population Stability Index.

PSI is the standard production drift check (credit-risk lineage,
now ubiquitous for ML feature monitoring): bin a reference period's
value distribution, re-bin the current period on the SAME breakpoints,
and score Σ (p_i − q_i)·ln(p_i/q_i). Rule-of-thumb thresholds:
< 0.1 stable, 0.1–0.25 drifting, > 0.25 action.

Scale shape: two bounded aggregations — per-group reference min/max
(broadcast back), then one (group, bin) count aggregation per period;
the per-row binning is pure column math. Output is groups × bins
rows. Nothing here holds per-row state, so the same plan serves a
streaming foreachBatch monitor unchanged.

Determinism contract (the repo's float convention): bin ids come from
IEEE double math identical in any engine; proportions are clamped to
``min_frac`` before the log-ratio (the standard zero-bin guard) and
each bin's PSI term is rounded to 6 dp and summed as DECIMAL so the
total is partitioning- and engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    bins: int = 10,
    min_frac: float = 1e-4,
) -> DataFrame:
    """PSI per group between a reference and a current frame.

    Breakpoints are ``bins`` equal-width intervals over the REFERENCE
    period's per-group [min, max] (the standard protocol — the
    reference defines the expected distribution; current-period
    values outside it clamp into the edge bins). NULL values are
    dropped on BOTH sides before binning — greatest/least would
    otherwise silently park them in the top bin as spurious drift;
    use the streaming monitor's dedicated null bin (or a plain null
    count check) when NULL emission itself is the signal. Returns
    ``(*group_cols, n_ref, n_cur, psi)``.
    """
    gcols = [F.col(c) for c in group_cols]
    v = F.col(value_col)
    ref = ref.filter(v.isNotNull())
    cur = cur.filter(v.isNotNull())
    bounds = ref.groupBy(*gcols).agg(
        F.min(v).alias("_vmin"), F.max(v).alias("_vmax")
    )

    def _binned(df: DataFrame) -> DataFrame:
        span = F.col("_vmax") - F.col("_vmin")
        raw = F.floor((v - F.col("_vmin")) * bins / span)
        b = F.when(span == 0, F.lit(0)).otherwise(
            F.greatest(F.lit(0), F.least(F.lit(bins - 1), raw))
        )
        return (
            df.join(F.broadcast(bounds), group_cols)
            .select(*gcols, b.cast("int").alias("_bin"))
            .groupBy(*group_cols, "_bin")
            .agg(F.count(F.lit(1)).alias("_n"))
        )

    rb = _binned(ref)
    cb = _binned(cur)
    totals_r = rb.groupBy(*group_cols).agg(F.sum("_n").alias("_nr"))
    totals_c = cb.groupBy(*group_cols).agg(F.sum("_n").alias("_nc"))
    # full bin spine per group so empty bins contribute via the clamp
    spine = (
        bounds.select(*gcols)
        .crossJoin(
            F.broadcast(
                ref.sparkSession.range(bins).select(
                    F.col("id").cast("int").alias("_bin")
                )
            )
        )
    )
    joined = (
        spine.join(rb, [*group_cols, "_bin"], "left")
        .withColumnRenamed("_n", "_n_ref")
        .join(cb, [*group_cols, "_bin"], "left")
        .withColumnRenamed("_n", "_n_cur")
        .join(totals_r, group_cols)
        .join(totals_c, group_cols)
    )
    p = F.greatest(
        F.coalesce(F.col("_n_ref"), F.lit(0)) / F.col("_nr").cast("double"),
        F.lit(min_frac),
    )
    q = F.greatest(
        F.coalesce(F.col("_n_cur"), F.lit(0)) / F.col("_nc").cast("double"),
        F.lit(min_frac),
    )
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        joined.select(*gcols, F.col("_nr"), F.col("_nc"), term.alias("_t"))
        .groupBy(*group_cols)
        .agg(
            F.max("_nr").cast("long").alias("n_ref"),
            F.max("_nc").cast("long").alias("n_cur"),
            # round the exact DECIMAL(18,6) sum, not its double cast —
            # a 6-dp rational can sit on a 4-dp boundary (tie class)
            F.round(F.sum("_t"), 4).cast("double").alias("psi"),
        )
    )


def ks_drift(ref: DataFrame, cur: DataFrame, value_col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the
    ``value_col`` distributions of a reference and a current frame:
    D = max over the pooled support of |ECDF_ref − ECDF_cur|, with
    the 95% rejection bound c(0.05)·sqrt((n1+n2)/(n1·n2)),
    c(0.05) = 1.358 (Smirnov's asymptotic table). The
    distribution-free companion to :func:`psi_drift` — PSI needs a
    binning choice; KS does not.

    Scale shape: counts aggregate BY DISTINCT VALUE first (one
    shuffle, bounded by the value domain — a fixed-precision metric
    column has a bounded distinct count regardless of row volume),
    and only then does the single-partition cumulative window run
    over the distinct-value table. For a genuinely unbounded
    continuous domain, quantize ``value_col`` to fixed precision
    first — the statistic degrades by at most one quantum.

    Returns one row: (n_ref, n_cur, ks_stat, reject_95).
    """
    from pyspark.sql import Window

    flagged = ref.select(F.col(value_col).alias("_v"), F.lit(1).alias("_is_ref")).unionByName(
        cur.select(F.col(value_col).alias("_v"), F.lit(0).alias("_is_ref"))
    ).filter(F.col("_v").isNotNull())
    per_val = flagged.groupBy("_v").agg(
        F.sum("_is_ref").alias("_n_ref"),
        F.sum(F.lit(1) - F.col("_is_ref")).alias("_n_cur"),
    )
    wv = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_val.select(
        F.sum("_n_ref").over(wv).alias("_c_ref"),
        F.sum("_n_cur").over(wv).alias("_c_cur"),
    )
    tot = per_val.agg(
        F.sum("_n_ref").alias("_N_ref"), F.sum("_n_cur").alias("_N_cur")
    )
    from pipelines_spark.functions.exact import exact_div_round

    # |c_ref/N_ref − c_cur/N_cur| = |c_ref·N_cur − c_cur·N_ref| / (N_ref·N_cur):
    # take the max in exact integer space (decimal(38,0) products, so
    # 100 TB row counts cannot wrap), divide once with the exact-
    # rational rounding discipline (functions/exact.py) — the D
    # statistic is a rational whose round(double, 6) can land ON a
    # *.5e-6 boundary and split engines
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.abs(
                F.col("_c_ref").cast("decimal(38,0)") * F.col("_N_cur")
                - F.col("_c_cur").cast("decimal(38,0)") * F.col("_N_ref")
            ).alias("_d"),
            "_N_ref",
            "_N_cur",
        )
        .groupBy("_N_ref", "_N_cur")
        .agg(
            exact_div_round(
                F.max("_d"),
                (F.col("_N_ref").cast("decimal(38,0)") * F.col("_N_cur")),
                out_scale=6,
            ).alias("ks_stat")
        )
        .select(
            F.col("_N_ref").alias("n_ref"),
            F.col("_N_cur").alias("n_cur"),
            "ks_stat",
            (
                F.col("ks_stat")
                > F.lit(1.358)
                * F.sqrt(
                    (F.col("_N_ref") + F.col("_N_cur"))
                    / (F.col("_N_ref") * F.col("_N_cur"))
                )
            ).alias("reject_95"),
        )
    )
