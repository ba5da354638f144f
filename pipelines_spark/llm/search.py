"""Lexical retrieval over the documents table: BM25 / TF-IDF top-k.

The reference's search surface is SQL-side LIKE/regex filtering (e.g.
pipelines/utils/dump_db-style query templates); a training-data
pipeline additionally needs ranked lexical retrieval for corpus
inspection and decontamination triage. Spark-first design:

- The query term set is a small literal — it broadcasts inside the
  plan (an ``isin`` filter on the exploded token stream), so the
  corpus-side explode is filtered to query terms BEFORE any shuffle.
  At 100 TB the per-(doc, term) aggregation only ever sees rows for
  the handful of query terms.
- Corpus statistics (N, total length) reduce to ONE row; document
  length is a map-side-combinable count per doc. Both stay in-plan
  (broadcast 1-row cross join), no driver collect.
- Per-term scores are rounded then summed as DECIMAL, so the final
  score is order-independent — the same determinism convention the
  relational queries use for float aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Okapi BM25 top-k: (doc_id, score, rank) for a literal query.

    ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)`` (the non-negative
    Lucene variant); ``tf`` saturates with ``k1`` and normalizes by
    ``dl / avgdl`` with slope ``b``. Per-term contributions are
    rounded to 6 digits and summed exactly (DECIMAL) so ties and
    ranks are reproducible; final score rounds to ``round_digits``.
    Ties break on ascending doc id. Top-k is an orderBy+limit —
    Spark's TakeOrdered (per-partition heads + driver merge), never a
    single-reducer global sort.
    """
    terms = [t for t in query_terms]
    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")

    dl = tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    qt = tokens.filter(F.col("term").isin(terms))
    tf = qt.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_d = F.col("tf").cast("double")
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    contrib = F.round(idf * tf_d * F.lit(k1 + 1.0) / norm, 6)

    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", contrib.cast("decimal(18,6)").alias("_c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("_c"), round_digits).cast("double").alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long"))
