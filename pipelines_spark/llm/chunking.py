"""Document chunking for training-window preparation.

Long documents become overlapping fixed-size token windows (the
standard pretraining prep step between cleaning and shard packing).
Map-only by construction: one split per document, chunk starts
generated with ``sequence`` and exploded — no shuffle, no UDF, all
whole-stage-codegen expressions, so the operator streams at parquet
scan speed regardless of corpus size.

Chunk contract (deterministic, engine-independent):
- tokens = whitespace split with empty tokens dropped;
- ``stride = chunk_tokens - overlap``;
- ``n_chunks = max(1, ceil((n_tokens - overlap) / stride))`` — every
  token is covered, consecutive chunks share ``overlap`` tokens, and
  an empty/short document still yields exactly one (possibly short)
  chunk;
- chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``,
  clamped at the document end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode documents into (doc_id, chunk_id, n_tokens, chunk_text)
    overlapping windows. ``chunk_id`` is 0-based and dense per doc.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    toks: Column = F.filter(
        F.split(F.col(text_col), " "), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in keep_cols],
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * F.lit(stride) + F.lit(1), chunk_tokens
    )
    return exploded.select(
        "doc_id",
        *keep_cols,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
