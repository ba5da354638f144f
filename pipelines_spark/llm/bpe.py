"""Distributed byte-pair-encoding tokenizer training + encoding.

BPE (Sennrich et al., ACL 2016) is the tokenization step of every
modern pre-training pipeline. The expensive part — corpus word
frequencies — is one explode + one hash aggregation; the merge loop
then runs over the DISTINCT-WORD table (vocabulary-sized, orders of
magnitude smaller than the corpus), so each of the ``n_merges``
iterations costs one pair-count aggregation plus a 1-row TakeOrdered
(O(1) driver state per iteration — the same bounded-driver-loop
discipline as the trained-k-means index, llm/similarity.py).

Everything is deterministic and engine-replayable: pair counts are
exact integers, the argmax tie-breaks on (count DESC, left ASC,
right ASC), and merge application is the greedy leftmost
non-overlapping rewrite — expressed here as a JVM ``aggregate`` fold
over the symbol array, and in the DuckDB oracle as an equivalent
explode + gaps-and-islands pass (keep the odd-ranked match of every
consecutive-match run; for left≠right runs cannot even occur). A
merged symbol never re-matches within its own iteration in either
formulation (the merged token ``l||r`` can't equal ``l``).

Reference parity: the reference has no tokenizer; this is part of the
beyond-reference training-data surface (SURVEY.md §6) next to dedup,
mixture sampling, and the n-gram LM filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — lowercased whitespace tokens
    (the lm_tokens contract). The only corpus-sized aggregation in
    BPE training; everything after runs on this vocabulary table."""
    from pipelines_spark.llm.text import lm_tokens

    return (
        docs.select(F.explode(lm_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _char_symbols(word: Column) -> Column:
    return F.split(word, "")


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping application of one merge rule:
    fold over the symbol array, replacing an (left, right) adjacency
    with the concatenated symbol. Runs of a self-pair (left == right)
    merge leftmost-first — 'a a a' → ['aa', 'a'] — matching the
    reference BPE implementations."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 8,
    wf: DataFrame | None = None,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [{rank, left_sym, right_sym, pair_count}, ...] in merge order.

    Per iteration: adjacent-pair counts weighted by word frequency
    (one aggregation over the vocabulary table), then a single-row
    TakeOrdered argmax — the only driver state is the running merge
    list. The words frame is persisted per iteration (and the
    previous one released) so iteration k never replays folds 1..k-1.
    Materialization piggybacks on the NEXT iteration's argmax job —
    the parent cache is released only after that job has filled the
    child's — so the loop runs ONE job per merge instead of two (and
    never materializes the final, unused fold). Stops early if no
    adjacency occurs at least twice (merging singletons would just
    memorize hapax words).

    ``wf`` (r12, guide §2.4): a precomputed (word, freq) vocabulary —
    callers that ALSO need the vocabulary downstream (the encode
    path) pass a staged copy so the corpus-scale word-frequency
    aggregation — the only corpus-sized stage in BPE — runs once per
    query instead of once per consumer. Same values by construction.
    Mutually exclusive with non-default ``id_col``/``text_col`` (the
    vocabulary already fixed its columns)."""
    if wf is not None and (id_col, text_col) != ("doc_id", "text"):
        raise ValueError(
            "bpe_train: wf is mutually exclusive with non-default "
            "id_col/text_col"
        )
    if wf is None:
        wf = word_frequencies(docs, id_col=id_col, text_col=text_col)
    words = wf.select(_char_symbols(F.col("word")).alias("syms"), "freq").persist()
    prev: DataFrame | None = None
    merges: list[dict] = []
    try:
        for rank in range(1, n_merges + 1):
            pairs = (
                words.filter(F.size("syms") >= 2)
                .select(
                    F.explode(
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("syms"), i).alias("l"),
                                F.element_at(F.col("syms"), i + 1).alias("r"),
                            ),
                        )
                    ).alias("p"),
                    "freq",
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").cast("long").alias("cnt"))
            )
            best = (
                pairs.filter(F.col("cnt") >= 2)
                .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(1)
                .collect()
            )
            # this collect just filled `words`' cache (computed from
            # the still-cached parent) — the parent can go now
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best:
                break
            row = best[0]
            merges.append(
                {
                    "rank": rank,
                    "left_sym": row["l"],
                    "right_sym": row["r"],
                    "pair_count": row["cnt"],
                }
            )
            nxt = words.select(
                apply_merge(F.col("syms"), row["l"], row["r"]).alias("syms"),
                "freq",
            ).persist()
            prev, words = words, nxt
    finally:
        if prev is not None:
            prev.unpersist()
        words.unpersist()
    return merges


def bpe_encode_words(wf: DataFrame, merges: list[dict]) -> DataFrame:
    """Apply a learned merge list to the (word, freq) vocabulary
    table: (word, freq, syms). Chained JVM folds, map-only — encode
    of the full corpus is this + a broadcast join on the word."""
    syms = _char_symbols(F.col("word"))
    for mrow in merges:
        syms = apply_merge(syms, mrow["left_sym"], mrow["right_sym"])
    return wf.select("word", "freq", syms.alias("syms"))


def bpe_token_counts(
    docs: DataFrame,
    merges: list[dict],
    *,
    wf: DataFrame | None = None,
    **kw,
) -> DataFrame:
    """Corpus token frequencies under the learned BPE vocabulary:
    (token, n). Weighted by word frequency so the corpus is tokenized
    once per DISTINCT word, never per occurrence. ``wf`` shares a
    staged vocabulary with training (see ``bpe_train``) and is
    mutually exclusive with the column kwargs — a precomputed
    vocabulary already fixed its columns, so silently dropping
    ``id_col``/``text_col`` would hide a caller bug."""
    if wf is not None and kw:
        raise ValueError(
            "bpe_token_counts: wf is mutually exclusive with column "
            f"kwargs (got {sorted(kw)})"
        )
    if wf is None:
        wf = word_frequencies(docs, **kw)
    enc = bpe_encode_words(wf, merges)
    return (
        enc.select(F.explode("syms").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").cast("long").alias("n"))
    )
