"""DuckDB oracle SQL for every query in pipelines_spark.queries.

The correctness driver runs these against the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings) and hash-compares with the Spark result after
sorting columns by name. Conventions keeping the two engines
bit-compatible:

- ``events.ts`` is TIMESTAMP_NS in DuckDB; every reference casts it
  to TIMESTAMP (µs), matching Spark's floor conversion of the
  nanosAsLong read.
- integer aggregates are CAST to BIGINT (DuckDB sums to HUGEINT),
  matching Spark's long.
- SUM/AVG over float columns goes through DECIMAL on both sides
  (exact addition — round(sum(double)) is summation-order-dependent
  and flips at .xx5 boundaries), then casts back to DOUBLE.
- remaining float outputs are per-row deterministic and rounded
  identically on both sides.
- every computed column carries the same alias as the Spark plan.
"""

from __future__ import annotations

# --- generated SQL fragments ------------------------------------------------

# 32-bit hex → BIGINT fold (md5 prefix), used by simhash.
_HEXFOLD = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split(substr(md5(w), 1, 8), ''), "
    "c -> CAST(strpos('123456789abcdef', c) AS BIGINT))), (a, b) -> a * 16 + b)"
)

_SIMHASH_BITS = ",\n               ".join(
    f"sum(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(32)
)
_SIMHASH_VALUE = " + ".join(
    f"CASE WHEN s{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for j in range(32)
)

# 3-word shingle set per document (mirrors llm.dedup.word_shingles).
_SHINGLES_CTE = """
words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingles AS (
    SELECT DISTINCT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS sh
    FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
    WHERE len(w) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
pair_inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
jaccards AS (
    SELECT id_a, id_b,
           ((CASE WHEN CAST(inter AS HUGEINT) < 0 THEN -((2 * abs(CAST(inter AS HUGEINT)) * 10000 + (CAST(sa.n + sb.n - inter AS HUGEINT))) // (2 * (CAST(sa.n + sb.n - inter AS HUGEINT)))) ELSE ((2 * abs(CAST(inter AS HUGEINT)) * 10000 + (CAST(sa.n + sb.n - inter AS HUGEINT))) // (2 * (CAST(sa.n + sb.n - inter AS HUGEINT)))) END) / 10000.0) AS jaccard
    FROM pair_inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
)
"""

_EXACT_JACCARD_SQL = f"WITH {_SHINGLES_CTE} SELECT id_a, id_b, jaccard FROM jaccards"

# Capped variant: shingles with document frequency > DEDUP_CAP are
# dropped BEFORE pairing, and per-doc sizes are recomputed over the
# surviving universe — exact replay of the ``max_shingle_freq``
# branch in llm.dedup (intersection AND denominators both count
# surviving shingles only; docs losing every shingle drop out of
# sizes, so they can't pair, same as Spark's inner join on the
# recomputed sizes). The cap is interpolated from the SAME constant
# the Spark queries use (llm/dedup.py::DEDUP_CAP), so changing it
# can't desynchronize the two engines.
from pipelines_spark.llm.dedup import DEDUP_CAP as _DEDUP_CAP  # noqa: E402

_CAPPED_SHINGLES_CTE = f"""
words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shingles0 AS (
    SELECT DISTINCT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS sh
    FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
    WHERE len(w) >= 3
),
sdf AS (SELECT sh, count(*) AS d FROM shingles0 GROUP BY sh),
shingles AS (
    SELECT s.doc_id, s.sh FROM shingles0 s JOIN sdf USING (sh) WHERE d <= {_DEDUP_CAP}
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
pair_inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
"""

_CAPPED_JACCARD_SQL = f"""
    WITH {_CAPPED_SHINGLES_CTE}
    SELECT id_a, id_b,
           ((CASE WHEN CAST(inter AS HUGEINT) < 0 THEN -((2 * abs(CAST(inter AS HUGEINT)) * 10000 + (CAST(sa.n + sb.n - inter AS HUGEINT))) // (2 * (CAST(sa.n + sb.n - inter AS HUGEINT)))) ELSE ((2 * abs(CAST(inter AS HUGEINT)) * 10000 + (CAST(sa.n + sb.n - inter AS HUGEINT))) // (2 * (CAST(sa.n + sb.n - inter AS HUGEINT)))) END) / 10000.0) AS jaccard
    FROM pair_inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
"""

_CAPPED_CONTAINMENT_SQL = f"""
    WITH {_CAPPED_SHINGLES_CTE}
    SELECT CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND id_a < id_b)
                THEN id_a ELSE id_b END AS contained_id,
           CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND id_a < id_b)
                THEN id_b ELSE id_a END AS container_id,
           ((CASE WHEN CAST(inter AS HUGEINT) < 0 THEN -((2 * abs(CAST(inter AS HUGEINT)) * 10000 + (CAST(least(sa.n, sb.n) AS HUGEINT))) // (2 * (CAST(least(sa.n, sb.n) AS HUGEINT)))) ELSE ((2 * abs(CAST(inter AS HUGEINT)) * 10000 + (CAST(least(sa.n, sb.n) AS HUGEINT))) // (2 * (CAST(least(sa.n, sb.n) AS HUGEINT)))) END) / 10000.0) AS containment
    FROM pair_inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE inter / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.8
"""


def _bpe_sql(n_merges: int, final: str) -> str:
    """Exact replay of llm/bpe.py training: per iteration, a weighted
    adjacent-pair count over the symbol table, the (cnt DESC, l, r)
    argmax, then greedy leftmost merge application — expressed as
    match-start islands where the odd-ranked match of each consecutive
    run survives (equivalent to the engine's left-to-right fold; for
    left≠right rules consecutive match-starts cannot occur at all).
    CTEs are MATERIALIZED so the 8-level chain doesn't inline
    exponentially. Assumes the corpus supports all n_merges merges
    (pair count ≥ 2) — true of any non-degenerate text corpus."""
    parts = [
        """wf AS MATERIALIZED (
            SELECT word, count(*) AS freq FROM (
                SELECT unnest(list_filter(string_split(lower(text), ' '),
                              w -> w <> '')) AS word
                FROM documents
            ) GROUP BY 1
        ),
        s0 AS MATERIALIZED (
            SELECT word AS wid, i AS pos, substr(word, i, 1) AS sym
            FROM wf, UNNEST(range(1, length(word) + 1)) AS t(i)
        )"""
    ]
    for k in range(n_merges):
        parts.append(f""",
        p{k} AS MATERIALIZED (
            SELECT a.sym AS l, b.sym AS r, CAST(sum(f.freq) AS BIGINT) AS cnt
            FROM s{k} a
            JOIN s{k} b ON a.wid = b.wid AND b.pos = a.pos + 1
            JOIN wf f ON f.word = a.wid
            GROUP BY 1, 2
        ),
        best{k} AS MATERIALIZED (
            SELECT l, r, cnt FROM p{k} WHERE cnt >= 2
            ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
        ),
        m{k} AS MATERIALIZED (
            SELECT a.wid, a.pos
            FROM s{k} a
            JOIN s{k} b ON a.wid = b.wid AND b.pos = a.pos + 1
            CROSS JOIN best{k} bst
            WHERE a.sym = bst.l AND b.sym = bst.r
        ),
        kept{k} AS MATERIALIZED (
            SELECT wid, pos FROM (
                SELECT wid, pos,
                       row_number() OVER (PARTITION BY wid, grp ORDER BY pos) AS rn
                FROM (
                    SELECT wid, pos,
                           pos - row_number() OVER (PARTITION BY wid ORDER BY pos) AS grp
                    FROM m{k}
                )
            ) WHERE rn % 2 = 1
        ),
        s{k + 1} AS MATERIALIZED (
            SELECT s.wid,
                   row_number() OVER (PARTITION BY s.wid ORDER BY s.pos) AS pos,
                   CASE WHEN k1.pos IS NOT NULL THEN s.sym || bst.r
                        ELSE s.sym END AS sym
            FROM s{k} s
            CROSS JOIN best{k} bst
            LEFT JOIN kept{k} k1 ON s.wid = k1.wid AND s.pos = k1.pos
            LEFT JOIN kept{k} k2 ON s.wid = k2.wid AND s.pos = k2.pos + 1
            WHERE k2.pos IS NULL
        )""")
    return "WITH " + "".join(parts) + final


_BPE_MERGES_FINAL = "\nSELECT * FROM (\n" + "\nUNION ALL\n".join(
    f"SELECT CAST({k + 1} AS INTEGER) AS rank, l AS left_sym, "
    f"r AS right_sym, cnt AS pair_count FROM best{k}"
    for k in range(8)
) + "\n)"

_BPE_TOKENS_FINAL = """
SELECT s.sym AS token, CAST(sum(f.freq) AS BIGINT) AS n
FROM s8 s JOIN wf f ON s.wid = f.word
GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 20
"""


def _stopword_ratio(lang_words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in lang_words)
    return (
        f"len(list_filter(string_split(text, ' '), w -> list_contains([{lst}], lower(w))))"
        f" / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE)"
    )


_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "for", "on"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "por", "los"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "une", "pour", "les"),
    "de": ("der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "nicht"),
    "pt": ("o", "a", "de", "e", "que", "em", "um", "uma", "para", "os"),
}

_LANG_SCORES = ",\n           ".join(
    f"{_stopword_ratio(words)} AS score_{code}" for code, words in _STOPWORDS.items()
)
# argmax with ties broken toward the lexicographically larger code —
# mirrors Spark array_max over struct(score, lang).
_LANG_CODES_DESC = sorted(_STOPWORDS, reverse=True)
_LANG_BEST = "greatest(" + ", ".join(f"score_{c}" for c in _STOPWORDS) + ")"
_LANG_PICK = (
    "CASE WHEN " + _LANG_BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{c} = {_LANG_BEST} THEN '{c}'" for c in _LANG_CODES_DESC
    )
    + " END"
)

# engine-exact quality score (mirrors llm/text.py::quality_score):
# round-half-up of the exact rational ×10⁴ via integer arithmetic —
# the round(double, 4) form ties at *.5e-4 boundaries where the two
# engines' rounding disagrees (first seen at sf0.1)
_Q_W = "CAST(greatest(len(string_split(text, ' ')), 1) AS BIGINT)"
_Q_S = (
    "CAST(len(list_filter(string_split(text, ' '), w -> list_contains(["
    + ", ".join(f"'{w}'" for w in _STOPWORDS["en"])
    + "], lower(w)))) AS BIGINT)"
)
_Q_TW = (
    "CAST(coalesce(list_sum(list_transform(string_split(text, ' '),"
    " w -> length(w))), 0) AS BIGINT)"
)
_Q_L = "CAST(length(text) AS BIGINT)"
_Q_C = f"greatest({_Q_L}, 1)"
_Q_P = (
    "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT)"
)
# W·C products in HUGEINT: n_num ≈ 7000·W·C overflows BIGINT for
# ~100 MB documents (the Spark twin runs the same products in
# DECIMAL(38,0) — llm/text.py::quality_score)
_Q_NUM = (
    f"((6 * least({_Q_L}, 500)"
    f" + (CASE WHEN {_Q_TW} BETWEEN 3 * {_Q_W} AND 8 * {_Q_W}"
    f"    THEN 2000 ELSE 600 END)"
    f" + 2000) * CAST({_Q_W} AS HUGEINT) * CAST({_Q_C} AS HUGEINT)"
    f" + least(9000 * {_Q_S}, 3000 * {_Q_W}) * CAST({_Q_C} AS HUGEINT)"
    f" - least(10000 * {_Q_P}, 2000 * {_Q_C}) * CAST({_Q_W} AS HUGEINT))"
)
_Q_DEN = f"(CAST({_Q_W} AS HUGEINT) * CAST({_Q_C} AS HUGEINT))"
_QUALITY_EXPR = (
    f"(((2 * {_Q_NUM} + {_Q_DEN}) // (2 * {_Q_DEN})) / 10000.0)"
)

_MWL = (
    "CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)"
    " / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE)"
)


def _srp_bucket(table_alias: str, dim: int = 64, n_planes: int = 8) -> str:
    """Deterministic sign-projection bucket key — mirrors
    llm.similarity.srp_bucket_key term-for-term (same add order)."""
    parts = []
    for i in range(n_planes):
        terms = []
        for m, j in enumerate(range(i, dim, n_planes)):
            sign = "1.0" if m % 2 == 0 else "-1.0"
            terms.append(f"CAST({table_alias}.embedding[{j + 1}] AS DOUBLE) * {sign}")
        proj = " + ".join(terms)
        parts.append(f"CASE WHEN ({proj}) >= 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(parts) + ")"


def _srp_probe_parts(table_alias: str, dim: int = 64, n_planes: int = 8) -> tuple[str, str]:
    """(key_expr, sorted-candidate-list expr) for multi-probe SRP —
    margins |proj_i| with their plane index, ascending, mirroring
    llm.similarity._srp_projections term-for-term."""
    structs = []
    for i in range(n_planes):
        terms = []
        for m, j in enumerate(range(i, dim, n_planes)):
            sign = "1.0" if m % 2 == 0 else "-1.0"
            terms.append(f"CAST({table_alias}.embedding[{j + 1}] AS DOUBLE) * {sign}")
        proj = " + ".join(terms)
        structs.append(f"{{'absp': abs({proj}), 'bit': {i}}}")
    cand = "list_sort([" + ", ".join(structs) + "])"
    return _srp_bucket(table_alias, dim, n_planes), cand


_COS_DOT = (
    "list_sum(list_transform(list_zip(c.cv, q.qv), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)
_COS_NC = "sqrt(list_sum(list_transform(c.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_COS_NQ = "sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

#: shared 2-round sync-LPA replay over the customer<->supplier trade
#: graph (operators/graph.py::label_propagation semantics: neighbor-
#: label argmax, ties count DESC then label ASC) — used by both
#: graph_communities and graph_modularity so the two oracles cannot
#: drift apart
_LPA_TRADE_CTE = """e AS (
            SELECT DISTINCT concat('c', o_custkey) AS s,
                            concat('s', l_suppkey) AS d
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), bi AS (
            SELECT s AS _s, d AS _d FROM e
            UNION ALL
            SELECT d AS _s, s AS _d FROM e
        ), lab0 AS (
            SELECT DISTINCT _s AS node, _s AS label FROM bi
        ), f1 AS (
            SELECT b._d AS node, l.label, count(*) AS c
            FROM bi b JOIN lab0 l ON b._s = l.node
            GROUP BY 1, 2
        ), lab1 AS (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY c DESC, label ASC) AS rn
                FROM f1) WHERE rn = 1
        ), f2 AS (
            SELECT b._d AS node, l.label, count(*) AS c
            FROM bi b JOIN lab1 l ON b._s = l.node
            GROUP BY 1, 2
        ), lab2 AS (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY c DESC, label ASC) AS rn
                FROM f2) WHERE rn = 1
        )"""


def _kmeans_iter(prev: str, i: int, dim: int = 64) -> str:
    """One Lloyd iteration as chained CTEs: assign every vector to its
    nearest ``{prev}`` centroid (rounded cosine, cell-asc ties), then
    recompute per-cell elementwise means over 1e-10 floor-quantized
    components — exact HUGEINT sums, so the means are bit-identical
    to the Spark side's DECIMAL(38,0) path (llm/similarity.kmeans_train)."""
    return f"""r{i} AS (
            SELECT q.vec_id, c.cell, q.qv,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) DESC,
                                c.cell ASC) AS rn
            FROM (SELECT vec_id, embedding AS qv FROM embeddings) q
            CROSS JOIN {prev} c
        ), sums{i} AS (
            SELECT cell, idx, count(*) AS n,
                   sum(CAST(floor(CAST(v AS DOUBLE) * 1e10) AS HUGEINT)) AS s
            FROM (SELECT cell, unnest(qv) AS v,
                         unnest(range(1, {dim + 1})) AS idx
                  FROM r{i} WHERE rn = 1)
            GROUP BY cell, idx
        ), cent{i} AS (
            SELECT c0.cell, coalesce(m.mv, c0.cv) AS cv
            FROM {prev} c0 LEFT JOIN (
                SELECT cell, list(CAST(s AS DOUBLE) / n / 1e10 ORDER BY idx) AS mv
                FROM sums{i} GROUP BY cell
            ) m ON m.cell = c0.cell
        )"""


# ---------------------------------------------------------------------------
# Composed curation pipeline: the full curate_corpus stage chain as
# one CTE cascade, each stage replayed on the PREVIOUS stage's
# survivors. Config interpolated from the same constant the Spark
# query uses (llm/curation.py::BENCH_CONFIG), so tuning it cannot
# desynchronize the engines.
# ---------------------------------------------------------------------------
from pipelines_spark.llm.curation import BENCH_CONFIG as _CURCFG  # noqa: E402


def _md5_bucket(expr: str, m: int) -> str:
    """md5-hex → int bucket in [0, m), mirroring sampling.hash_bucket."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substr(md5(CAST({expr} AS VARCHAR)), 1, 8), ''), "
        "c -> CAST(strpos('123456789abcdef', c) AS BIGINT))), "
        f"(a, x) -> a * 16 + x) % {m}"
    )


def _curation_gate_ctes(cfg: dict) -> tuple[str, str]:
    """Optional-stage CTEs (CCNet LM-entropy gate, dup-span gate) for
    the composed cascade, each replayed ON THE PREVIOUS survivors;
    returns (cte_sql_fragment, name_of_final_relation)."""
    frag, src = "", "kept"
    if cfg.get("max_entropy_bits") is not None:
        frag += f""",
etoks AS (
    SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS w
    FROM {src}
),
euni AS (SELECT t.doc_id, tok FROM etoks t, UNNEST(t.w) AS u(tok)),
eunic AS (SELECT tok, count(*) AS cu FROM euni GROUP BY 1),
evocab AS (SELECT count(*) AS v FROM eunic),
ebg AS (
    SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i + 1] AS bg
    FROM etoks, UNNEST(range(1, len(w))) AS t(i)
    WHERE len(w) >= 2
),
ebgc AS (SELECT bg, count(*) AS cb FROM ebg GROUP BY 1),
escored AS (
    SELECT ebg.doc_id,
           CAST(round(log2((cb + 1.0) / (cu + v)), 4) AS DECIMAL(18,4)) AS logp
    FROM ebg JOIN ebgc USING (bg)
    JOIN eunic ON ebg.w1 = eunic.tok
    CROSS JOIN evocab
),
ehb AS (
    -- engine-exact 4-dp mean (integer half-up) — same formula as the
    -- standalone text_ngram_entropy oracle; -S/n ties at *.5e-4
    SELECT doc_id,
           floor((2 * CAST(-sum(logp) * 10000 AS BIGINT) + count(*))
                 / (2 * count(*))) / 10000.0 AS h_bits
    FROM escored GROUP BY doc_id
),
kept_e AS MATERIALIZED (
    SELECT k.* FROM {src} k LEFT JOIN ehb ON k.doc_id = ehb.doc_id
    WHERE ehb.h_bits IS NULL OR ehb.h_bits <= {cfg["max_entropy_bits"]}
)"""
        src = "kept_e"
    if cfg.get("max_dup_frac") is not None:
        frag += f""",
dtoks AS (
    SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS w
    FROM {src}
),
dsizes AS (SELECT doc_id, len(w) AS n_words FROM dtoks),
dwin AS (
    SELECT doc_id, i AS s0,
           md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS h
    FROM dtoks, UNNEST(range(1, len(w) - 6)) AS t(i)
    WHERE len(w) >= 8
),
ddup AS (SELECT h FROM dwin GROUP BY h HAVING count(*) > 1),
dmarked AS (
    SELECT w.doc_id, w.s0, w.s0 + 7 AS e0 FROM dwin w JOIN ddup USING (h)
),
disl AS (
    SELECT doc_id, s0, e0,
           CASE WHEN max(e0) OVER prev IS NULL
                     OR s0 > max(e0) OVER prev + 1
                THEN 1 ELSE 0 END AS new_island
    FROM dmarked
    WINDOW prev AS (PARTITION BY doc_id ORDER BY s0
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
disl2 AS (
    SELECT doc_id, s0, e0,
           sum(new_island) OVER (PARTITION BY doc_id ORDER BY s0
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM disl
),
dspans AS (
    SELECT doc_id, island, min(s0) AS s, max(e0) AS e
    FROM disl2 GROUP BY 1, 2
),
dper AS (
    SELECT doc_id, sum(e - s + 1) AS dup_words FROM dspans GROUP BY 1
),
dfrac AS (
    SELECT z.doc_id,
           ((CASE WHEN CAST(COALESCE(p.dup_words, 0) AS HUGEINT) < 0 THEN -((2 * abs(CAST(COALESCE(p.dup_words, 0) AS HUGEINT)) * 10000 + (CAST(greatest(z.n_words, 1) AS HUGEINT))) // (2 * (CAST(greatest(z.n_words, 1) AS HUGEINT)))) ELSE ((2 * abs(CAST(COALESCE(p.dup_words, 0) AS HUGEINT)) * 10000 + (CAST(greatest(z.n_words, 1) AS HUGEINT))) // (2 * (CAST(greatest(z.n_words, 1) AS HUGEINT)))) END) / 10000.0) AS dup_frac
    FROM dsizes z LEFT JOIN dper p USING (doc_id)
),
kept_d AS MATERIALIZED (
    SELECT k.* FROM {src} k JOIN dfrac USING (doc_id)
    WHERE dup_frac <= {cfg["max_dup_frac"]}
)"""
        src = "kept_d"
    return frag, src


def _curation_cascade(cfg: dict) -> str:
    """The full curate_corpus stage cascade for ``cfg`` (gates →
    source cap → exact dedup → optional CCNet gates → LSH near-dup
    canonical), each stage replayed on the previous stage's
    survivors; ends in the ``curated`` CTE."""
    gates, src = _curation_gate_ctes(cfg)
    # optional stage 1b: hashed-feature linear-classifier gate (md5
    # bucket weights, the text_quality_linear arithmetic) on the
    # stage-1 survivors
    clf_cte, cap_src = "", "gated"
    if cfg.get("min_classifier_score") is not None:
        clf_cte = f""",
clf_gated AS MATERIALIZED (
    SELECT * FROM gated
    WHERE round(1.0 / (1.0 + exp(-(0.2
        + (list_sum(list_transform(list_distinct(string_split(text, ' ')),
               w -> {_md5_bucket("w", 64)} % 21 - 10)) / 10.0)
          / len(list_distinct(string_split(text, ' ')))))), 6)
        >= {cfg["min_classifier_score"]}
)"""
        cap_src = "clf_gated"
    prefix = f"""scored AS (
    SELECT doc_id, text, source,
           {_QUALITY_EXPR} AS quality,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split(text, ' ')) END AS n_tokens,
           {_LANG_SCORES}
    FROM documents
),
gated AS MATERIALIZED (
    SELECT doc_id, text, source, quality, n_tokens, {_LANG_PICK} AS detected_lang
    FROM scored
    WHERE quality >= {cfg["min_quality"]} AND n_tokens >= {cfg["min_tokens"]}
){clf_cte},
capped AS MATERIALIZED (
    SELECT doc_id, text, source, quality, n_tokens, detected_lang FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS rk
        FROM {cap_src}
    ) WHERE rk <= {cfg["max_per_source"]}
),
canon AS (SELECT min(doc_id) AS doc_id FROM capped GROUP BY text),
kept AS MATERIALIZED (SELECT c.* FROM capped c JOIN canon USING (doc_id))"""
    tail = f"""cwords AS (SELECT doc_id, string_split(text, ' ') AS w FROM {src}),
cshingles AS (
    SELECT DISTINCT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS sh
    FROM cwords, UNNEST(range(1, len(w) - 1)) AS t(i)
    WHERE len(w) >= 3
),
csizes AS (SELECT doc_id, count(*) AS n FROM cshingles GROUP BY doc_id),
cpairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
    FROM cshingles a JOIN cshingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
cjacc AS (
    SELECT id_a, id_b FROM cpairs
    JOIN csizes sa ON id_a = sa.doc_id
    JOIN csizes sb ON id_b = sb.doc_id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {cfg["near_dup_threshold"]}
),
cedges AS (
    SELECT id_a AS a, id_b AS b FROM cjacc
    UNION SELECT id_b, id_a FROM cjacc
),
creach(a, b) AS (
    SELECT a, b FROM cedges
    UNION SELECT r.a, e.b FROM creach r JOIN cedges e ON r.b = e.a
),
clabels AS (SELECT a AS doc_id, least(a, min(b)) AS component_id FROM creach GROUP BY a),
clabeled AS (
    SELECT k.*, CAST(COALESCE(l.component_id, k.doc_id) AS BIGINT) AS component_id
    FROM {src} k LEFT JOIN clabels l USING (doc_id)
),
curated AS (
    SELECT doc_id, quality, detected_lang, n_tokens, component_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY component_id ORDER BY quality DESC, doc_id ASC) AS rn
        FROM clabeled
    ) WHERE rn = 1
)"""
    return prefix + gates + ",\n" + tail


_CURATION_CTE = _curation_cascade(_CURCFG)

from pipelines_spark.llm.curation import (  # noqa: E402
    BENCH_CONFIG_FULL as _CURCFG_FULL,
)

_CURATION_FULL_CTE = _curation_cascade(_CURCFG_FULL)

from pipelines_spark.llm.curation import (  # noqa: E402
    BENCH_CONFIG_SCORED as _CURCFG_SCORED,
)

_CURATION_SCORED_CTE = _curation_cascade(_CURCFG_SCORED)


def _exact_mean_sql(
    sum_expr: str,
    count_expr: str,
    *,
    sum_scale: int,
    out_scale: int = 4,
    den_factor: int = 1,
) -> str:
    """DuckDB twin of functions/exact.py::exact_mean /
    exact_div_round: round-half-up of the exact rational mean in
    integer arithmetic (DuckDB's // on BIGINT/HUGEINT is exact), so a
    mean landing ON a *.5e-out boundary cannot split the engines
    (docs/PARITY_SF01.md). ``sum_expr`` must be an exact DECIMAL or
    integer sum carrying ``sum_scale`` decimals; ``den_factor`` folds
    a non-power-of-ten unit divisor into the denominator (pre-reduce
    large numerators at the call site)."""
    s = f"CAST({sum_expr} * {10 ** sum_scale} AS HUGEINT)"
    up = 10 ** max(out_scale - sum_scale, 0)
    half = f"(CAST({count_expr} AS HUGEINT) * {10 ** max(sum_scale - out_scale, 0) * den_factor})"
    q = f"((2 * abs({s}) * {up} + {half}) // (2 * {half}))"
    return (
        f"((CASE WHEN {s} < 0 THEN -{q} ELSE {q} END) / {float(10 ** out_scale)})"
    )


def _curation_pipeline_sql(cte: str, cfg: dict) -> str:
    """The shared split + shard-packing tail over a cascade's
    ``curated`` CTE. Shard parameters come from the SAME ``cfg`` the
    cascade was built from — a config that changes shard_buckets /
    shard_tokens desynchronizes nothing."""
    return f"""
        WITH RECURSIVE {cte},
        assigned AS (
            SELECT *,
                   CASE WHEN {_md5_bucket("doc_id", 100)} < 80 THEN 'train'
                        WHEN {_md5_bucket("doc_id", 100)} < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   {_md5_bucket("doc_id", cfg["shard_buckets"])} AS bucket
            FROM curated
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, quality, detected_lang,
               CAST(n_tokens AS BIGINT) AS n_tokens, component_id, split,
               CAST(bucket AS BIGINT) AS bucket,
               CAST(floor(COALESCE(sum(n_tokens) OVER (
                   PARTITION BY bucket
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {float(cfg["shard_tokens"])}) AS BIGINT) AS shard_no
        FROM assigned ORDER BY doc_id
    """


_COS_DOT_BQ = (
    "list_sum(list_transform(list_zip(bc.cv, bq.qv), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)
_COS_NC_BC = "sqrt(list_sum(list_transform(bc.cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_COS_NQ_BQ = "sqrt(list_sum(list_transform(bq.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

#: shared PQ/ADC CTE chain (codebook -> codes -> query tables ->
#: ADC scores) used by embed_pq_adc and embed_pq_recall_audit —
#: one copy so the replayed quantization cannot drift between them
_PQ_ADC_CTES = """        WITH samp0 AS (
            SELECT vec_id, embedding,
                   md5('pq|' || CAST(vec_id AS VARCHAR)) AS h
            FROM embeddings ORDER BY h, vec_id LIMIT 16
        ),
        cb AS (
            SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INT) AS cw,
                   s.s AS sub,
                   embedding[s.s * 16 + 1 : s.s * 16 + 16] AS subvec
            FROM samp0, (SELECT unnest(range(0, 4)) AS s) s
        ),
        cand AS (
            SELECT e.vec_id AS pid, cb.sub, cb.cw,
                   list_sum(list_transform(
                       list_zip(e.embedding[cb.sub * 16 + 1 : cb.sub * 16 + 16],
                                cb.subvec),
                       x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                            * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                   )) AS dist
            FROM embeddings e CROSS JOIN cb
        ),
        codes AS (
            SELECT pid, sub, cw FROM (
                SELECT pid, sub, cw,
                       row_number() OVER (PARTITION BY pid, sub
                                          ORDER BY dist, cw) AS rn
                FROM cand
            ) WHERE rn = 1
        ),
        qtab AS (
            SELECT q.vec_id AS query_id, cb.sub, cb.cw,
                   CAST(round(list_sum(list_transform(
                       list_zip(q.embedding[cb.sub * 16 + 1 : cb.sub * 16 + 16],
                                cb.subvec),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)
                   )), 6) AS DECIMAL(18,6)) AS contrib
            FROM embeddings q CROSS JOIN cb
            WHERE q.vec_id < 50
        ),
        scored AS (
            SELECT t.query_id, c.pid AS neighbor_id,
                   CAST(sum(t.contrib) AS DOUBLE) AS adc_dot
            FROM codes c JOIN qtab t ON c.sub = t.sub AND c.cw = t.cw
            WHERE c.pid <> t.query_id
            GROUP BY 1, 2
        )"""


def _pq_trained_cb(
    n_sub: int = 32, n_codes: int = 16, iters: int = 2, dim: int = 64,
    prefix: str = "",
) -> tuple[str, str]:
    """The TRAINING half of the trained-PQ replay: hash-ordered init
    codebook + ``iters`` Lloyd rounds (squared-L2 assign rounded to
    6 dp before argmin with cw-asc ties; per-(sub, cw) elementwise
    means over 1e-10 floor-quantized components summed as HUGEINT —
    exact, so the trained model itself is replayed bit-for-bit).
    Returns (cte_fragment_without_WITH, name_of_final_codebook) so
    both the standalone ADC chain and the IVF-PQ composition can
    consume one copy of the training arithmetic."""
    sl = dim // n_sub
    slice_ = f"[cb.sub * {sl} + 1 : cb.sub * {sl} + {sl}]"
    sq = (
        f"list_sum(list_transform(list_zip(e.embedding{slice_}, cb.subvec), "
        "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
        "* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"
    )
    parts = [
        f"""{prefix}samp0 AS (
            SELECT vec_id, embedding,
                   md5('pq|' || CAST(vec_id AS VARCHAR)) AS h
            FROM embeddings ORDER BY h, vec_id LIMIT {n_codes}
        ),
        {prefix}cb0 AS (
            SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INT) AS cw,
                   s.s AS sub,
                   list_transform(
                       embedding[s.s * {sl} + 1 : s.s * {sl} + {sl}],
                       x -> CAST(x AS DOUBLE)) AS subvec
            FROM {prefix}samp0, (SELECT unnest(range(0, {n_sub})) AS s) s
        )"""
    ]
    prev = f"{prefix}cb0"
    for i in range(1, iters + 1):
        parts.append(f"""        {prefix}asg{i} AS (
            SELECT sub, cw, subv FROM (
                SELECT cb.sub, cb.cw, e.embedding{slice_} AS subv,
                       row_number() OVER (PARTITION BY e.vec_id, cb.sub
                           -- round-ok: quantize-before-compare argmin (Spark twin rounds identically)
                           ORDER BY round({sq}, 6) ASC, cb.cw ASC) AS rn
                FROM embeddings e CROSS JOIN {prev} cb
            ) WHERE rn = 1
        ),
        {prefix}sums{i} AS (
            SELECT sub, cw, idx, count(*) AS n,
                   sum(CAST(floor(CAST(v AS DOUBLE) * 1e10) AS HUGEINT)) AS s
            FROM (SELECT sub, cw, unnest(subv) AS v,
                         unnest(range(1, {sl + 1})) AS idx
                  FROM {prefix}asg{i})
            GROUP BY 1, 2, 3
        ),
        {prefix}cb{i} AS (
            SELECT c.cw, c.sub, coalesce(m.mv, c.subvec) AS subvec
            FROM {prev} c LEFT JOIN (
                SELECT sub, cw,
                       list(CAST(s AS DOUBLE) / n / 1e10 ORDER BY idx) AS mv
                FROM {prefix}sums{i} GROUP BY 1, 2
            ) m ON m.sub = c.sub AND m.cw = c.cw
        )""")
        prev = f"{prefix}cb{i}"
    return ",\n".join(parts), prev


def _pq_trained_ctes(
    n_sub: int = 32, n_codes: int = 16, iters: int = 2, dim: int = 64
) -> str:
    """CTE chain replaying llm/similarity.pq_codebook_trained +
    pq_adc_topk at the shipping config: the ``_pq_trained_cb``
    training rounds, then the standard encode → query-table → ADC
    chain against the final codebook. Ends with the ``scored``
    relation."""
    sl = dim // n_sub
    slice_ = f"[cb.sub * {sl} + 1 : cb.sub * {sl} + {sl}]"
    sq = (
        f"list_sum(list_transform(list_zip(e.embedding{slice_}, cb.subvec), "
        "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
        "* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"
    )
    frag, prev = _pq_trained_cb(n_sub, n_codes, iters, dim)
    parts = ["        WITH " + frag]
    parts.append(f"""        cand AS (
            SELECT e.vec_id AS pid, cb.sub, cb.cw, {sq} AS dist
            FROM embeddings e CROSS JOIN {prev} cb
        ),
        codes AS (
            SELECT pid, sub, cw FROM (
                SELECT pid, sub, cw,
                       row_number() OVER (PARTITION BY pid, sub
                                          ORDER BY dist, cw) AS rn
                FROM cand
            ) WHERE rn = 1
        ),
        qtab AS (
            SELECT e.vec_id AS query_id, cb.sub, cb.cw,
                   CAST(round(list_sum(list_transform(
                       list_zip(e.embedding{slice_}, cb.subvec),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)
                   )), 6) AS DECIMAL(18,6)) AS contrib
            FROM embeddings e CROSS JOIN {prev} cb
            WHERE e.vec_id < 50
        ),
        scored AS (
            SELECT t.query_id, c.pid AS neighbor_id,
                   CAST(sum(t.contrib) AS DOUBLE) AS adc_dot
            FROM codes c JOIN qtab t ON c.sub = t.sub AND c.cw = t.cw
            WHERE c.pid <> t.query_id
            GROUP BY 1, 2
        )""")
    return ",\n".join(parts)


#: one rendered copy shared by embed_pq_adc_trained and its audit —
#: the audited quantization cannot drift from the audit (the
#: _PQ_ADC_CTES discipline, applied to the trained variant)
_PQ_TRAINED_CTES = _pq_trained_ctes()


ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)      AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
               ((CASE WHEN CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) ELSE ((2 * abs(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) END) / 10000.0)      AS avg_qty,
               ((CASE WHEN CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) ELSE ((2 * abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) END) / 10000.0) AS avg_price,
               ((CASE WHEN CAST(sum(CAST(l_discount AS DECIMAL(18,6))) * 1000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) ELSE ((2 * abs(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) END) / 10000.0)      AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l.l_orderkey,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n.n_name,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'AMERICA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    "revenue_by_month": """
        SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)  AS order_month,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE)  AS revenue,
               count(DISTINCT o.o_orderkey)                           AS n_orders
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    """,
    "top_customers_by_revenue": """
        SELECT c.c_custkey, c.c_name,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "f1_filter_expressions": """
        SELECT l_returnflag,
               count(*)                        AS n_rows,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)  AS sum_price
        FROM lineitem
        -- exclusion semantics mirror the Spark side exactly: a row is
        -- removed only when a predicate is TRUE; a NULL predicate
        -- KEEPS the row (coalesce(NOT p, TRUE)), so null-bearing data
        -- cannot silently diverge between engines
        WHERE COALESCE(NOT (l_quantity <= 0), TRUE)
          AND COALESCE(NOT (l_discount < 0 OR l_discount > 0.1), TRUE)
          AND COALESCE(NOT (l_extendedprice <= 0), TRUE)
        GROUP BY l_returnflag
    """,
    "f2_null_filter": """
        SELECT event_type, count(*) AS n_rows
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
        GROUP BY event_type
    """,
    "f3_capture_window": """
        WITH e AS (
            SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        ), skewed AS (
            SELECT event_type,
                   date_diff('second', ts, ts + k * INTERVAL '1' SECOND) AS skew_s
            FROM e
        )
        SELECT event_type, count(*) AS n_rows, max(skew_s) AS max_skew_s
        FROM skewed WHERE skew_s BETWEEN -20 AND 60
        GROUP BY event_type
    """,
    "j1_orders_enriched": """
        SELECT r.r_name, n.n_name,
               count(*)                       AS n_orders,
               CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)  AS total_price
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    "j2_full_outer_nation_flows": """
        WITH c AS (
            SELECT c_nationkey AS nationkey, count(*) AS n_customers
            FROM customer WHERE c_nationkey < 20 GROUP BY 1
        ), s AS (
            SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
            FROM supplier WHERE s_nationkey >= 5 GROUP BY 1
        )
        SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
               coalesce(c.n_customers, 0) AS n_customers,
               coalesce(s.n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    "j3_customers_without_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "j5_capture_gaps": """
        WITH spine AS (
            SELECT minute FROM generate_series(
                TIMESTAMP '2024-01-01 00:00:00',
                TIMESTAMP '2024-01-01 05:59:00',
                INTERVAL 1 MINUTE) t(minute)
        ), observed AS (
            SELECT DISTINCT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute
            FROM events
        )
        SELECT s.minute FROM spine s
        WHERE s.minute NOT IN (SELECT minute FROM observed)
    """,
    "j7_shipdate_range_join": f"""
        SELECT o_orderpriority,
               count(*)                  AS n_quick_ships,
               CAST({_exact_mean_sql("sum(CAST(l_quantity AS DECIMAL(18,2)))", "count(*)", sum_scale=2, out_scale=4)} AS DOUBLE) AS avg_qty
        FROM lineitem l
        JOIN orders o
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <= o.o_orderdate + INTERVAL '30' DAY
        GROUP BY o_orderpriority
    """,
    "j9_idw_interpolation": """
        WITH cells AS (
            SELECT c_custkey AS cell_id, c_custkey % 90 AS cell_lat,
                   (c_custkey * 7) % 180 AS cell_lon
            FROM customer WHERE c_custkey <= 200
        ), stations AS (
            SELECT s_suppkey AS station_id, s_suppkey % 90 AS st_lat,
                   (s_suppkey * 13) % 180 AS st_lon, s_acctbal AS reading
            FROM supplier
        ), ranked AS (
            SELECT cell_id, reading,
                   CAST((cell_lat - st_lat) * (cell_lat - st_lat)
                      + (cell_lon - st_lon) * (cell_lon - st_lon) AS BIGINT) AS distance,
                   row_number() OVER (
                       PARTITION BY cell_id
                       ORDER BY (cell_lat - st_lat) * (cell_lat - st_lat)
                              + (cell_lon - st_lon) * (cell_lon - st_lon) ASC,
                              station_id ASC
                   ) AS rnk
            FROM cells CROSS JOIN stations
        )
        SELECT cell_id,
               ((CASE WHEN CAST(sum(CAST(reading * (1.0 / (distance + 1.0)) AS DECIMAL(28,14))) * 100000000000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(reading * (1.0 / (distance + 1.0)) AS DECIMAL(28,14))) * 100000000000000 AS HUGEINT)) * 10000 + (CAST(sum(CAST(1.0 / (distance + 1.0) AS DECIMAL(28,14))) * 100000000000000 AS HUGEINT))) // (2 * (CAST(sum(CAST(1.0 / (distance + 1.0) AS DECIMAL(28,14))) * 100000000000000 AS HUGEINT)))) ELSE ((2 * abs(CAST(sum(CAST(reading * (1.0 / (distance + 1.0)) AS DECIMAL(28,14))) * 100000000000000 AS HUGEINT)) * 10000 + (CAST(sum(CAST(1.0 / (distance + 1.0) AS DECIMAL(28,14))) * 100000000000000 AS HUGEINT))) // (2 * (CAST(sum(CAST(1.0 / (distance + 1.0) AS DECIMAL(28,14))) * 100000000000000 AS HUGEINT)))) END) / 10000.0) AS idw_reading
        FROM ranked WHERE rnk <= 3
        GROUP BY cell_id
    """,
    "a1_relation_check": """
        SELECT l_orderkey, count(*) AS n_items
        FROM lineitem GROUP BY l_orderkey HAVING count(*) > 5
    """,
    "a3_latest_event_per_user": """
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "a4_nested_content": """
        SELECT o_orderkey,
               to_json(struct_pack(
                   o_orderstatus := CAST(o_orderstatus AS VARCHAR),
                   o_totalprice := CAST(o_totalprice AS VARCHAR),
                   o_orderpriority := CAST(o_orderpriority AS VARCHAR))) AS content
        FROM orders
    """,
    "a4b_grouped_content": """
        SELECT o_custkey,
               to_json(list_sort(list(struct_pack(
                   o_orderkey := o_orderkey,
                   tp := CAST(o_totalprice AS VARCHAR))))) AS content
        FROM orders GROUP BY o_custkey
    """,
    "a6_distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
    "a7_hourly_event_counts": """
        SELECT CAST(ts AS DATE)                          AS event_date,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS event_hour,
               count(*)                                  AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)  AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "a11_colwise_max": """
        SELECT round(max(greatest(value, CAST(json_extract(props, '$.k') AS DOUBLE))), 2) AS max_any
        FROM events
    """,
    "w4_rolling_hourly_sum": """
        SELECT event_id, user_id,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                   RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW
               ), 2) AS DOUBLE) AS rolling_1h
        FROM events
    """,
    "o5_union_priorities": """
        SELECT o_orderpriority, count(*) AS n_orders FROM (
            SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT * FROM orders WHERE o_orderpriority = '2-HIGH'
        ) GROUP BY o_orderpriority
    """,
    "q2_min_per_group_subquery": """
        SELECT s_suppkey, s_name, s_nationkey,
               CAST(round(s_acctbal, 2) AS DOUBLE) AS min_acctbal
        FROM supplier s
        WHERE s_acctbal = (
            SELECT min(s2.s_acctbal) FROM supplier s2
            WHERE s2.s_nationkey = s.s_nationkey
        )
    """,
    "o11_intersect_custkeys": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    "o10_unpivot": """
        WITH wide AS (
            SELECT CAST(ts AS DATE) AS event_date,
                   count(*) FILTER (WHERE event_type = 'click')    AS click,
                   count(*) FILTER (WHERE event_type = 'error')    AS error,
                   count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                   count(*) FILTER (WHERE event_type = 'signup')   AS signup,
                   count(*) FILTER (WHERE event_type = 'view')     AS view
            FROM events GROUP BY 1
        )
        SELECT event_date, 'click' AS event_type, click AS n_events FROM wide
        UNION ALL SELECT event_date, 'error', error FROM wide
        UNION ALL SELECT event_date, 'purchase', purchase FROM wide
        UNION ALL SELECT event_date, 'signup', signup FROM wide
        UNION ALL SELECT event_date, 'view', view FROM wide
    """,
    # mirrors functions/geo.py: same haversine AST, rectangle ring
    # off-lattice so ray-cast membership equals the range test
    "j8_geo_stations": """
        WITH st AS (
            SELECT s_suppkey AS station_id, s_nationkey AS nationkey,
                   -23.1 + (s_suppkey % 97) * 0.01       AS lat,
                   -43.6 + ((s_suppkey * 7) % 89) * 0.01 AS lon
            FROM supplier
        ), inside AS (
            SELECT *,
                   round(2 * 6371.0088 * asin(sqrt(
                       pow(sin((radians(-22.9068) - radians(lat)) / 2), 2)
                       + cos(radians(lat)) * cos(radians(-22.9068))
                         * pow(sin((radians(-43.1729) - radians(lon)) / 2), 2)
                   )), 4) AS dist_km
            FROM st
            WHERE lat > -23.055 AND lat < -22.505
              AND lon > -43.555 AND lon < -43.005
        )
        SELECT nationkey,
               count(*) AS n_stations,
               ((CASE WHEN CAST(sum(CAST(dist_km AS DECIMAL(14,4))) * 10000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(dist_km AS DECIMAL(14,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(CAST(dist_km AS DECIMAL(14,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS avg_dist_km
        FROM inside GROUP BY nationkey
    """,
    "j8b_best_overlap": """
        WITH neigh AS (
            SELECT n_nationkey AS nationkey,
                   -43.6 + (n_nationkey % 5) * 0.1              AS nx0,
                   -23.1 + FLOOR(n_nationkey / 5.0) * 0.1       AS ny0
            FROM nation
        ), n2 AS (
            SELECT nationkey, nx0, ny0,
                   nx0 + 0.15 AS nx1, ny0 + 0.15 AS ny1
            FROM neigh
        ), cells AS (
            SELECT s_suppkey AS cell_id,
                   -43.6 + ((s_suppkey * 7) % 89) * 0.01 AS cx0,
                   -23.1 + (s_suppkey % 97) * 0.01       AS cy0
            FROM supplier
        ), c2 AS (
            SELECT cell_id, cx0, cy0,
                   cx0 + 0.08 AS cx1, cy0 + 0.08 AS cy1
            FROM cells
        ), pairs AS (
            -- closed-form axis-aligned rectangle intersection: the
            -- analytically exact answer the engine's general
            -- Sutherland-Hodgman clip must reproduce
            SELECT cell_id, nationkey,
                   -- round-ok: exact rect area of 2/3-dp grid coords has <= 6 dp
                   round(
                       GREATEST(0, LEAST(cx1, nx1) - GREATEST(cx0, nx0))
                       * GREATEST(0, LEAST(cy1, ny1) - GREATEST(cy0, ny0)),
                   6) AS best_area
            FROM c2 CROSS JOIN n2
        ), ranked AS (
            SELECT cell_id, nationkey, best_area,
                   ROW_NUMBER() OVER (
                       PARTITION BY cell_id
                       ORDER BY best_area DESC, nationkey
                   ) AS rn
            FROM pairs WHERE best_area > 0
        )
        SELECT cell_id, nationkey AS best_nationkey, best_area
        FROM ranked WHERE rn = 1
    """,
    "o6_pivot_event_types": """
        SELECT CAST(ts AS DATE) AS event_date,
               count(*) FILTER (WHERE event_type = 'click')    AS click,
               count(*) FILTER (WHERE event_type = 'error')    AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup')   AS signup,
               count(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events GROUP BY 1
    """,
    "o7_json_props_extract": """
        WITH e AS (
            SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
        )
        SELECT k - k % 10 AS k_bucket, count(*) AS n_events
        FROM e GROUP BY 1
    """,
    "scalar_gauntlet": """
        SELECT o_orderkey,
               lower(o_orderstatus)                                        AS status_lower,
               CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS BIGINT) AS priority_num,
               strftime(o_orderdate, '%Y-%m-%d')                           AS order_day,
               CAST(o_orderdate AS DATE)                                   AS order_date,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)         AS order_month,
               o_orderdate + INTERVAL '90' DAY                             AS due_ts,
               CAST(year(o_orderdate) AS BIGINT)                           AS order_year,
               TRY_CAST(o_orderpriority AS DOUBLE)                         AS bad_cast,
               -- round-ok: 2-dp price over den in (1,2): exact value has <= 3 dp, identity at 4
               round(o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0), 4) AS safe_ratio,
               concat_ws('-', o_orderstatus, o_orderpriority)              AS tag,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'small' END                                       AS size_band,
               coalesce(TRY_CAST('x' AS BIGINT), o_orderkey)               AS coalesced
        FROM orders WHERE o_orderkey <= 2000
    """,
    "p2_rename_projection": """
        SELECT p_partkey, p_name AS nome, p_brand AS marca,
               'Regular' AS tipo_os,
               CAST(p_retailprice * 100 AS BIGINT) AS preco_centavos
        FROM part
    """,
    "j10_composite_update_detection": """
        WITH current_rows AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 7 = 0
        ), state AS (
            SELECT o_orderkey, o_orderstatus
            FROM orders WHERE o_orderkey % 7 = 0 AND o_orderstatus <> 'P'
        )
        SELECT c.o_orderkey, c.o_orderstatus, c.o_totalprice
        FROM current_rows c
        WHERE NOT EXISTS (
            SELECT 1 FROM state s
            WHERE s.o_orderkey = c.o_orderkey AND s.o_orderstatus = c.o_orderstatus
        )
    """,
    "a2_group_any_flag": """
        SELECT o_custkey,
               CAST(max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS any_fulfilled,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey
    """,
    "o1_multikey_sort": """
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        FROM lineitem
        ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 50
    """,
    "t1_tumbling_5min": """
        SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
               count(*)             AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1
    """,
    "t2_incremental_window": """
        SELECT event_type, count(*) AS n_rows,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
               max(CAST(ts AS TIMESTAMP)) AS max_ts
        FROM events
        WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-10 00:00:00'
          AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY event_type
    """,
    "k4_partition_derivation": """
        SELECT strftime(o_orderdate, '%Y')       AS ano_particao,
               strftime(o_orderdate, '%m')       AS mes_particao,
               strftime(o_orderdate, '%Y-%m-%d') AS data_particao,
               count(*)                          AS n_rows
        FROM orders GROUP BY 1, 2, 3
    """,
    "f6_pruned_incremental_scan": """
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               count(*)                         AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)      AS total_price
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY 1
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS canonical_id, count(*) AS dup_count
        FROM documents GROUP BY text
    """,
    # The composed curate_corpus chain: gates → source cap → exact
    # dedup → LSH near-dup canonical → split + shard packing, every
    # stage replayed on the previous stage's survivors.
    "curation_pipeline": _curation_pipeline_sql(_CURATION_CTE, _CURCFG),
    "curation_funnel_stats": f"""
        WITH RECURSIVE {_CURATION_CTE}
        SELECT stage, n_docs FROM (
            SELECT 'input' AS stage, count(*) AS n_docs FROM documents
            UNION ALL SELECT 'quality_lang_gate', count(*) FROM gated
            UNION ALL SELECT 'source_cap', count(*) FROM capped
            UNION ALL SELECT 'exact_dedup', count(*) FROM kept
            UNION ALL SELECT 'near_dup_canonical', count(*) FROM curated
        ) ORDER BY stage
    """,
    # Incremental batch dedup: dup iff exact-Jaccard ≥ 0.5 against any
    # SEEN predecessor (store doc, or smaller-id batch doc) — the LSH
    # probe is exactly verified, so the observable result is the
    # predecessor-pair relation.
    "dedup_incremental_batch": """
        WITH words AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        shingles AS (
            SELECT DISTINCT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS sh
            FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 3
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        pair_inter AS (
            SELECT n.doc_id AS new_id, p.doc_id AS prev_id, count(*) AS inter
            FROM shingles n JOIN shingles p ON n.sh = p.sh AND p.doc_id < n.doc_id
            WHERE n.doc_id >= 250
            GROUP BY 1, 2
        ),
        dups AS (
            SELECT new_id, min(prev_id) AS dup_of, count(*) AS n_dup_sources
            FROM pair_inter
            JOIN sizes sn ON new_id = sn.doc_id
            JOIN sizes sp ON prev_id = sp.doc_id
            WHERE inter * 1.0 / (sn.n + sp.n - inter) >= 0.5
            GROUP BY new_id
        )
        SELECT d.doc_id, (u.dup_of IS NOT NULL) AS is_dup,
               CAST(u.dup_of AS BIGINT) AS dup_of,
               CAST(COALESCE(u.n_dup_sources, 0) AS BIGINT) AS n_dup_sources
        FROM documents d LEFT JOIN dups u ON d.doc_id = u.new_id
        WHERE d.doc_id >= 250 ORDER BY doc_id
    """,
    # the FULL-gate cascade: + CCNet LM-entropy gate + span-dedup gate
    "curation_pipeline_full": _curation_pipeline_sql(_CURATION_FULL_CTE, _CURCFG_FULL),
    "curation_funnel_full": f"""
        WITH RECURSIVE {_CURATION_FULL_CTE}
        SELECT stage, n_docs FROM (
            SELECT 'input' AS stage, count(*) AS n_docs FROM documents
            UNION ALL SELECT 'quality_lang_gate', count(*) FROM gated
            UNION ALL SELECT 'source_cap', count(*) FROM capped
            UNION ALL SELECT 'exact_dedup', count(*) FROM kept
            UNION ALL SELECT 'lm_entropy_gate', count(*) FROM kept_e
            UNION ALL SELECT 'dup_span_gate', count(*) FROM kept_d
            UNION ALL SELECT 'near_dup_canonical', count(*) FROM curated
        ) ORDER BY stage
    """,
    # The scored cascade: full gates + the stage-1b classifier gate
    "curation_pipeline_scored": _curation_pipeline_sql(_CURATION_SCORED_CTE, _CURCFG_SCORED),
    "curation_funnel_scored": f"""
        WITH RECURSIVE {_CURATION_SCORED_CTE}
        SELECT stage, n_docs FROM (
            SELECT 'input' AS stage, count(*) AS n_docs FROM documents
            UNION ALL SELECT 'quality_lang_gate', count(*) FROM gated
            UNION ALL SELECT 'classifier_gate', count(*) FROM clf_gated
            UNION ALL SELECT 'source_cap', count(*) FROM capped
            UNION ALL SELECT 'exact_dedup', count(*) FROM kept
            UNION ALL SELECT 'lm_entropy_gate', count(*) FROM kept_e
            UNION ALL SELECT 'dup_span_gate', count(*) FROM kept_d
            UNION ALL SELECT 'near_dup_canonical', count(*) FROM curated
        ) ORDER BY stage
    """,
    # LSH candidates are exactly verified, so the observable result
    # equals the exact-Jaccard pair set.
    "dedup_minhash_lsh": _EXACT_JACCARD_SQL,
    "dedup_ngram_jaccard": _EXACT_JACCARD_SQL,
    # prefix filtering is LOSSLESS (pigeonhole guarantee) + exact
    # verify ⇒ the same exact-Jaccard pair set as the other two
    # candidate engines
    "dedup_prefix_jaccard": _EXACT_JACCARD_SQL,
    # the 100 TB posture: posting-list cap at df>4, exact scoring over
    # the surviving shingle universe
    "dedup_ngram_capped": _CAPPED_JACCARD_SQL,
    "dedup_containment_capped": _CAPPED_CONTAINMENT_SQL,
    "dedup_simhash": f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ), hv AS (
            SELECT doc_id, {_HEXFOLD} AS hv FROM toks
        ), bits AS (
            SELECT doc_id,
               {_SIMHASH_BITS}
            FROM hv GROUP BY doc_id
        ), sh AS (
            SELECT doc_id, {_SIMHASH_VALUE} AS simhash FROM bits
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    "dedup_embed_cosine": """
        WITH a AS (SELECT vec_id AS id_a, embedding AS va FROM embeddings),
             b AS (SELECT vec_id AS id_b, embedding AS vb FROM embeddings),
        scored AS (
            SELECT id_a, id_b,
                   round(
                     list_sum(list_transform(list_zip(va, vb),
                              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(va, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * sqrt(list_sum(list_transform(vb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                   4) AS cosine
            FROM a JOIN b ON id_a < id_b
        )
        SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.4
    """,
    "text_langid_counts": f"""
        WITH scored AS (
            SELECT doc_id,
           {_LANG_SCORES}
            FROM documents
        )
        SELECT {_LANG_PICK} AS lang_pred, count(*) AS n_docs
        FROM scored GROUP BY 1
    """,
    "text_quality_by_source": f"""
        SELECT source,
               ((CASE WHEN CAST(sum(CAST({_QUALITY_EXPR} AS DECIMAL(14,4))) * 10000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST({_QUALITY_EXPR} AS DECIMAL(14,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(CAST({_QUALITY_EXPR} AS DECIMAL(14,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS avg_quality,
               count(*) AS n_docs
        FROM documents GROUP BY source
    """,
    "text_token_stats": f"""
        WITH per_doc AS (
            SELECT lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS BIGINT) AS re_tokens,
                   {_MWL} AS mwl
            FROM documents
        )
        SELECT lang,
               CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
               CAST(sum(re_tokens) AS BIGINT) AS total_re_tokens,
               ((CASE WHEN CAST(sum(CAST(mwl AS DECIMAL(18,8))) * 100000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(mwl AS DECIMAL(18,8))) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 10000)) // (2 * (CAST(count(*) AS HUGEINT) * 10000))) ELSE ((2 * abs(CAST(sum(CAST(mwl AS DECIMAL(18,8))) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 10000)) // (2 * (CAST(count(*) AS HUGEINT) * 10000))) END) / 10000.0) AS avg_word_len
        FROM per_doc GROUP BY lang
    """,
    "text_fingerprints": """
        SELECT doc_id,
               list_min(list_transform(
                   range(1, greatest(length(text) - 7, 1) + 1),
                   i -> md5(substr(text, i, 8)))) AS fingerprint
        FROM documents
    """,
    # Matryoshka truncation audit: full-dim and first-16-dim exact
    # rankings replayed, recall = |top5 ∩ top5_trunc| / 5
    "embed_truncated_recall": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
        ), fscored AS (
            SELECT q.query_id, c.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM c CROSS JOIN q
            WHERE c.neighbor_id <> q.query_id
        ), full5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
                FROM fscored
            ) WHERE rn <= 5
        ), tq AS (
            SELECT vec_id AS query_id, embedding[1:16] AS qv
            FROM embeddings WHERE vec_id < 10
        ), tc AS (
            SELECT vec_id AS neighbor_id, embedding[1:16] AS cv FROM embeddings
        ), tscored AS (
            SELECT q.query_id, c.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM tc c CROSS JOIN tq q
            WHERE c.neighbor_id <> q.query_id
        ), trunc5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
                FROM tscored
            ) WHERE rn <= 5
        ), ov AS (
            SELECT f.query_id, count(*) AS n_overlap
            FROM full5 f JOIN trunc5 t
              ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
            GROUP BY 1
        )
        SELECT b.query_id,
               CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap,
               CAST({_exact_mean_sql("COALESCE(n_overlap, 0)", "5", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS recall
        FROM (SELECT DISTINCT query_id FROM full5) b
        LEFT JOIN ov USING (query_id)
        ORDER BY query_id
    """,
    "embed_knn_topk": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
        ), scored AS (
            SELECT q.query_id, c.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM c CROSS JOIN q
            WHERE c.neighbor_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    # IVF-PQ replay: the ivf cell CTEs composed with the PQ code/table
    # CTEs; candidates = corpus of the query's nprobe cells, scored by
    # summed DECIMAL table lookups.
    "embed_ivf_pq": f"""
        WITH cent AS (
            SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 16
        ), ranked AS (
            SELECT q.vec_id, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) DESC,
                                c.centroid_id ASC) AS cr
            FROM (SELECT vec_id, embedding AS qv FROM embeddings) q
            CROSS JOIN cent c
        ), corpus_cell AS (
            SELECT vec_id AS pid, centroid_id FROM ranked WHERE cr = 1
        ), probes AS (
            SELECT vec_id AS query_id, centroid_id
            FROM ranked WHERE cr <= 2 AND vec_id < 20
        ),
        samp0 AS (
            SELECT vec_id, embedding,
                   md5('pq|' || CAST(vec_id AS VARCHAR)) AS h
            FROM embeddings ORDER BY h, vec_id LIMIT 16
        ),
        cb AS (
            SELECT CAST(row_number() OVER (ORDER BY h, vec_id) AS INT) AS cw,
                   s.s AS sub,
                   embedding[s.s * 16 + 1 : s.s * 16 + 16] AS subvec
            FROM samp0, (SELECT unnest(range(0, 4)) AS s) s
        ),
        pqcand AS (
            SELECT e.vec_id AS pid, cb.sub, cb.cw,
                   list_sum(list_transform(
                       list_zip(e.embedding[cb.sub * 16 + 1 : cb.sub * 16 + 16],
                                cb.subvec),
                       x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                            * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                   )) AS dist
            FROM embeddings e CROSS JOIN cb
        ),
        codes AS (
            SELECT pid, sub, cw FROM (
                SELECT pid, sub, cw,
                       row_number() OVER (PARTITION BY pid, sub
                                          ORDER BY dist, cw) AS rn
                FROM pqcand
            ) WHERE rn = 1
        ),
        qtab AS (
            SELECT q.vec_id AS query_id, cb.sub, cb.cw,
                   CAST(round(list_sum(list_transform(
                       list_zip(q.embedding[cb.sub * 16 + 1 : cb.sub * 16 + 16],
                                cb.subvec),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)
                   )), 6) AS DECIMAL(18,6)) AS contrib
            FROM embeddings q CROSS JOIN cb
            WHERE q.vec_id < 20
        ),
        pairs AS (
            SELECT DISTINCT p.query_id, cc.pid
            FROM probes p JOIN corpus_cell cc USING (centroid_id)
            WHERE cc.pid <> p.query_id
        ),
        scored AS (
            SELECT pr.query_id, pr.pid AS neighbor_id,
                   CAST(sum(t.contrib) AS DOUBLE) AS adc_dot
            FROM pairs pr
            JOIN codes c ON c.pid = pr.pid
            JOIN qtab t ON t.query_id = pr.query_id
                       AND t.sub = c.sub AND t.cw = c.cw
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, adc_dot, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_dot DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    # PQ/ADC replay: hash-sampled codebook, per-(vector, subspace)
    # argmin with (dist, cw) tie-break, per-subspace dot contributions
    # rounded + DECIMAL-summed.
    "embed_pq_adc": f"""
{_PQ_ADC_CTES}
        SELECT query_id, neighbor_id, adc_dot, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_dot DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    "embed_srp_multiprobe": f"""
        WITH q0 AS (
            SELECT vec_id AS query_id, embedding AS qv,
                   {_srp_probe_parts('embeddings')[0]} AS key,
                   {_srp_probe_parts('embeddings')[1]} AS cand
            FROM embeddings WHERE vec_id < 50
        ), q AS (
            SELECT query_id, qv,
                   unnest([CAST(key AS BIGINT),
                           xor(CAST(key AS BIGINT),
                               CAST(1 AS BIGINT) << cand[1].bit),
                           xor(CAST(key AS BIGINT),
                               CAST(1 AS BIGINT) << cand[2].bit)]) AS bucket
            FROM q0
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding AS cv,
                   CAST({_srp_bucket('embeddings')} AS BIGINT) AS bucket
            FROM embeddings
        ), scored AS (
            SELECT q.query_id, c.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM c JOIN q ON c.bucket = q.bucket
            WHERE c.neighbor_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    "embed_srp_ann": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv, {_srp_bucket('embeddings')} AS bucket
            FROM embeddings WHERE vec_id < 50
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding AS cv, {_srp_bucket('embeddings')} AS bucket
            FROM embeddings
        ), scored AS (
            SELECT q.query_id, c.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM c JOIN q ON c.bucket = q.bucket
            WHERE c.neighbor_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    "a12_rollup_revenue": """
        SELECT CAST(coalesce(year(o_orderdate), -1) AS INTEGER) AS order_year,
               coalesce(o_orderpriority, 'ALL')   AS priority,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)        AS total_price,
               count(*)                           AS n_orders
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    """,
    "o9_except_nations": """
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "w5_lag_event_gap": """
        WITH ev AS (
            SELECT event_type, user_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
            FROM events
        ), gaps AS (
            SELECT event_type,
                   us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
            FROM ev
        )
        SELECT event_type,
               ((CASE WHEN CAST(sum(gap_us) * 1 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(gap_us) * 1 AS HUGEINT)) * 100 + (CAST(count(*) AS HUGEINT) * 1000000)) // (2 * (CAST(count(*) AS HUGEINT) * 1000000))) ELSE ((2 * abs(CAST(sum(gap_us) * 1 AS HUGEINT)) * 100 + (CAST(count(*) AS HUGEINT) * 1000000)) // (2 * (CAST(count(*) AS HUGEINT) * 1000000))) END) / 100.0) AS avg_gap_s,
               CAST(max(gap_us) AS BIGINT)       AS max_gap_us,
               count(*)                          AS n_gaps
        FROM gaps WHERE gap_us IS NOT NULL
        GROUP BY event_type
    """,
    "w6_sessionize": """
        WITH ev AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
            FROM events
        ), flagged AS (
            SELECT user_id, us, event_id,
                   CASE WHEN us - lag(us) OVER w IS NULL
                          OR us - lag(us) OVER w > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ), sess AS (
            SELECT user_id,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        ), per_session AS (
            SELECT user_id, session_id, count(*) AS n FROM sess GROUP BY 1, 2
        )
        SELECT user_id,
               count(*)                  AS n_sessions,
               CAST(sum(n) AS BIGINT)    AS n_events,
               CAST(max(n) AS BIGINT)    AS max_session_events
        FROM per_session GROUP BY user_id
    """,
    "a13_value_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4)  AS p50,
               round(quantile_cont(value, 0.95), 4) AS p95,
               round(min(value), 4)                 AS v_min,
               round(max(value), 4)                 AS v_max,
               count(*)                             AS n
        FROM events
        GROUP BY event_type
    """,
    "text_top_terms": """
        WITH terms AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), df AS (
            SELECT term, count(*) AS doc_freq FROM terms
            WHERE term <> '' GROUP BY term
        )
        SELECT term, doc_freq, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY doc_freq DESC, term ASC) AS rn
            FROM df
        ) WHERE rn <= 20
    """,
    # DuckDB's native ASOF JOIN is the oracle for our window-encoded
    # as-of join (equal timestamps match, per >= semantics).
    "j11_asof_enrichment": """
        WITH ev AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value, event_type
            FROM events
        ), clicks AS (
            SELECT user_id, ts, event_id FROM ev WHERE event_type = 'click'
        ), purch AS (
            SELECT user_id, ts AS pts, max(value) AS purchase_value
            FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2
        ), j AS (
            SELECT c.user_id, c.ts, p.pts, p.purchase_value
            FROM clicks c
            ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.ts >= p.pts
        )
        SELECT user_id,
               count(*)               AS n_clicks,
               count(purchase_value)  AS n_matched,
               ((CASE WHEN CAST(sum(epoch_us(ts) - epoch_us(pts)) * 1 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(epoch_us(ts) - epoch_us(pts)) * 1 AS HUGEINT)) * 100 + (CAST(count(pts) AS HUGEINT) * 1000000)) // (2 * (CAST(count(pts) AS HUGEINT) * 1000000))) ELSE ((2 * abs(CAST(sum(epoch_us(ts) - epoch_us(pts)) * 1 AS HUGEINT)) * 100 + (CAST(count(pts) AS HUGEINT) * 1000000)) // (2 * (CAST(count(pts) AS HUGEINT) * 1000000))) END) / 100.0) AS avg_staleness_s,
               CAST(round(sum(CAST(purchase_value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_purchase_value
        FROM j GROUP BY user_id
    """,
    # DuckDB has no width_bucket; the CASE mirrors Spark's formula
    # with identical double arithmetic ((400-0)/8 = 50 exactly)
    "a16_value_histogram": """
        WITH b AS (
            SELECT event_type, value,
                   CASE WHEN value < 0.0 THEN 0
                        WHEN value >= 400.0 THEN 9
                        ELSE CAST(floor(value / ((400.0 - 0.0) / 8)) AS BIGINT) + 1
                   END AS bucket
            FROM events
        )
        SELECT event_type, bucket, count(*) AS n,
               CAST(round(min(value), 4) AS DOUBLE) AS lo,
               CAST(round(max(value), 4) AS DOUBLE) AS hi
        FROM b
        GROUP BY event_type, bucket
    """,
    # int8 quantization replayed exactly: scale = max|v|/127 (1 for
    # all-zero), q = sign-aware half-up round of v/scale; cosine over
    # the integer vectors (scales cancel, integer sums exact)
    "embed_quantized_knn": """
        WITH mx AS (
            SELECT vec_id, embedding,
                   CASE WHEN list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))) = 0
                        THEN 1.0
                        ELSE list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))) / 127.0
                   END AS s
            FROM embeddings
        ), qv AS (
            SELECT vec_id,
                   list_transform(embedding, x ->
                       CAST(CASE WHEN CAST(x AS DOUBLE) < 0
                            THEN -floor(abs(CAST(x AS DOUBLE)) / s + 0.5)
                            ELSE  floor(abs(CAST(x AS DOUBLE)) / s + 0.5)
                       END AS BIGINT)) AS q
            FROM mx
        ), qn AS (
            SELECT vec_id, q,
                   list_sum(list_transform(q, x -> x * x)) AS n2
            FROM qv
        ), scored AS (
            SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(
                       CAST(list_sum(list_transform(list_zip(c.q, p.q),
                            x -> x[1] * x[2])) AS DOUBLE)
                       / (sqrt(CAST(c.n2 AS DOUBLE)) * sqrt(CAST(p.n2 AS DOUBLE))),
                       4) AS cosine
            FROM qn c CROSS JOIN (SELECT * FROM qn WHERE vec_id < 10) p
            WHERE c.vec_id <> p.vec_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    "a17_grouping_sets_revenue": """
        SELECT CAST(coalesce(year(l_shipdate), -1) AS INTEGER) AS ship_year,
               coalesce(l_returnflag, 'ALL') AS returnflag,
               CAST(grouping(year(l_shipdate)) AS INTEGER) AS g_year,
               CAST(grouping(l_returnflag) AS INTEGER)     AS g_flag,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY GROUPING SETS ((year(l_shipdate)), (l_returnflag), ())
    """,
    "j12_asof_forward": """
        WITH ev AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value, event_type
            FROM events
        ), clicks AS (
            SELECT user_id, ts, event_id FROM ev WHERE event_type = 'click'
        ), purch AS (
            SELECT user_id, ts AS pts, max(value) AS purchase_value
            FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2
        ), j AS (
            SELECT c.user_id, c.ts, p.pts, p.purchase_value
            FROM clicks c
            ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.ts <= p.pts
        )
        SELECT user_id,
               count(*)               AS n_clicks,
               count(purchase_value)  AS n_converted,
               ((CASE WHEN CAST(sum(epoch_us(pts) - epoch_us(ts)) * 1 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(epoch_us(pts) - epoch_us(ts)) * 1 AS HUGEINT)) * 100 + (CAST(count(pts) AS HUGEINT) * 1000000)) // (2 * (CAST(count(pts) AS HUGEINT) * 1000000))) ELSE ((2 * abs(CAST(sum(epoch_us(pts) - epoch_us(ts)) * 1 AS HUGEINT)) * 100 + (CAST(count(pts) AS HUGEINT) * 1000000)) // (2 * (CAST(count(pts) AS HUGEINT) * 1000000))) END) / 100.0) AS avg_time_to_purchase_s
        FROM j GROUP BY user_id
    """,
    "embed_ivf_ann": f"""
        WITH cent AS (
            SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 16
        ), ranked AS (
            SELECT q.vec_id, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) DESC,
                                c.centroid_id ASC) AS cr
            FROM (SELECT vec_id, embedding AS qv FROM embeddings) q
            CROSS JOIN cent c
        ), corpus_cell AS (
            SELECT vec_id AS neighbor_id, centroid_id FROM ranked WHERE cr = 1
        ), probes AS (
            SELECT vec_id AS query_id, centroid_id
            FROM ranked WHERE cr <= 2 AND vec_id < 20
        ), scored AS (
            SELECT p.query_id, cc.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM probes p
            JOIN corpus_cell cc ON p.centroid_id = cc.centroid_id
            JOIN (SELECT vec_id, embedding AS cv FROM embeddings) c
                 ON c.vec_id = cc.neighbor_id
            JOIN (SELECT vec_id, embedding AS qv FROM embeddings) q
                 ON q.vec_id = p.query_id
            WHERE cc.neighbor_id <> p.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    # md5-derived bucket mirrors llm/sampling.hash_bucket (same hex
    # fold as simhash's _HEXFOLD, over the id string)
    "sample_split_counts": """
        WITH b AS (
            SELECT lang,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) % 100 AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang, count(*) AS n_docs
        FROM b GROUP BY 1, 2
    """,
    # Transitive closure of the exact near-dup pair graph via
    # recursive CTE — the SQL mirror of iterative label propagation.
    "dedup_clusters": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        edges AS (
            SELECT id_a AS a, id_b AS b FROM jaccards
            UNION
            SELECT id_b AS a, id_a AS b FROM jaccards
        ),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id,
               CAST(least(a, min(b)) AS BIGINT) AS component_id
        FROM reach GROUP BY a
    """,
    "q7_nation_volume": """
        SELECT supp_nation, cust_nation, l_year,
               CAST(round(sum(CAST(volume AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        SELECT l_year,
               ((CASE WHEN CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                                 THEN CAST(volume AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                                 THEN CAST(volume AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000 AS HUGEINT)) * 1000000 + (CAST(sum(CAST(volume AS DECIMAL(18,6))) * 1000000 AS HUGEINT))) // (2 * (CAST(sum(CAST(volume AS DECIMAL(18,6))) * 1000000 AS HUGEINT)))) ELSE ((2 * abs(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                                 THEN CAST(volume AS DECIMAL(18,6))
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) * 1000000 AS HUGEINT)) * 1000000 + (CAST(sum(CAST(volume AS DECIMAL(18,6))) * 1000000 AS HUGEINT))) // (2 * (CAST(sum(CAST(volume AS DECIMAL(18,6))) * 1000000 AS HUGEINT)))) END) / 1000000.0) AS mkt_share
        FROM (
            SELECT CAST(year(o.o_orderdate) AS INTEGER) AS l_year,
                   l.l_extendedprice * (1 - l.l_discount) AS volume,
                   n2.n_name AS supp_nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'AMERICA'
              AND p.p_brand = 'Brand#9'
        ) all_nations
        GROUP BY l_year
    """,
    "q10_returned_items": """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "text_pii_redaction": """
        WITH seeded AS (
            SELECT doc_id,
                   substring(text, 1, 40)
                   || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or call 555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   || '-1234 from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                   AS text2
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id,
               len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
               len(regexp_extract_all(text2, '\\d{3}[-.]\\d{3,4}[-.]\\d{4}'))                    AS n_phone,
               len(regexp_extract_all(text2, '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}'))       AS n_ipv4,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text2,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\\d{3}[-.]\\d{3,4}[-.]\\d{4}', '<PHONE>', 'g'),
                   '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}', '<IP>', 'g') AS redacted
        FROM seeded
    """,
    "text_repetition_stats": """
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents
            WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 2
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i + 1])) AS b
            FROM docs
        ),
        counts AS (
            SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b
        ),
        shares AS (
            SELECT doc_id,
                   ((CASE WHEN CAST(max(n) AS HUGEINT) < 0 THEN -((2 * abs(CAST(max(n) AS HUGEINT)) * 10000 + (CAST(sum(n) AS HUGEINT))) // (2 * (CAST(sum(n) AS HUGEINT)))) ELSE ((2 * abs(CAST(max(n) AS HUGEINT)) * 10000 + (CAST(sum(n) AS HUGEINT))) // (2 * (CAST(sum(n) AS HUGEINT)))) END) / 10000.0) AS top_bigram_share
            FROM counts GROUP BY doc_id
        )
        SELECT d.doc_id,
               ((CASE WHEN CAST(len(d.ws) - len(list_distinct(d.ws)) AS HUGEINT) < 0 THEN -((2 * abs(CAST(len(d.ws) - len(list_distinct(d.ws)) AS HUGEINT)) * 10000 + (CAST(len(d.ws) AS HUGEINT))) // (2 * (CAST(len(d.ws) AS HUGEINT)))) ELSE ((2 * abs(CAST(len(d.ws) - len(list_distinct(d.ws)) AS HUGEINT)) * 10000 + (CAST(len(d.ws) AS HUGEINT))) // (2 * (CAST(len(d.ws) AS HUGEINT)))) END) / 10000.0) AS dup_word_ratio,
               s.top_bigram_share
        FROM docs d JOIN shares s ON d.doc_id = s.doc_id
    """,
    "text_decontamination": """
        WITH words AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh5 AS (
            SELECT DISTINCT doc_id, list_aggregate(w[i:i+4], 'string_agg', ' ') AS sh
            FROM words, UNNEST(range(1, len(w) - 3)) AS t(i)
            WHERE len(w) >= 5
        ),
        probe AS (SELECT DISTINCT sh FROM sh5 WHERE doc_id < 10)
        SELECT c.doc_id, count(DISTINCT c.sh) AS n_contaminated_shingles
        FROM sh5 c JOIN probe p ON c.sh = p.sh
        WHERE c.doc_id >= 10
        GROUP BY c.doc_id
    """,
    # transitive closure (same as dedup_clusters) + quality argmax per
    # component, singletons as their own component
    "dedup_canonical_selection": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        edges AS (
            SELECT id_a AS a, id_b AS b FROM jaccards
            UNION
            SELECT id_b AS a, id_a AS b FROM jaccards
        ),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        labels AS (
            SELECT a AS doc_id, least(a, min(b)) AS component_id
            FROM reach GROUP BY a
        ),
        scored AS (
            SELECT d.doc_id,
                   CAST(COALESCE(l.component_id, d.doc_id) AS BIGINT) AS component_id,
                   {_QUALITY_EXPR} AS q
            FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY component_id ORDER BY q DESC, doc_id ASC) AS rn
            FROM scored
        )
        SELECT component_id,
               CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS canonical_doc_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) - 1 AS BIGINT) AS n_dropped
        FROM ranked GROUP BY component_id
    """,
    "text_lang_mismatch": f"""
        WITH scored AS (
            SELECT source, lang,
           {_LANG_SCORES}
            FROM documents
        ), det AS (
            SELECT source, lang, {_LANG_PICK} AS detected FROM scored
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN detected <> lang THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
               ((CASE WHEN CAST(sum(CASE WHEN detected <> lang THEN 1 ELSE 0 END) * 1 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CASE WHEN detected <> lang THEN 1 ELSE 0 END) * 1 AS HUGEINT)) * 10000 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(CASE WHEN detected <> lang THEN 1 ELSE 0 END) * 1 AS HUGEINT)) * 10000 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS mismatch_rate
        FROM det GROUP BY source
    """,
    # greedy first-fit packing by exclusive running token sum within
    # md5 hash buckets — mirrors llm/sampling.pack_token_shards
    "sample_token_shards": """
        WITH toks AS (
            SELECT doc_id,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) % 8 AS bucket,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split(text, ' ')) END AS n_tokens
            FROM documents
        ), packed AS (
            SELECT bucket, n_tokens,
                   CAST(floor(COALESCE(sum(n_tokens) OVER (
                       PARTITION BY bucket
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 2000.0) AS BIGINT) AS shard_no
            FROM toks
        )
        SELECT bucket, shard_no,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        FROM packed GROUP BY bucket, shard_no
    """,
    # shingle document-frequency boilerplate: mirrors
    # llm/text.boilerplate_shingles + boilerplate_ratio (per-doc ratio
    # rounded to 4 before the decimal-routed average)
    "text_boilerplate_stats": f"""
        WITH words AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        shingles AS (
            SELECT DISTINCT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS sh
            FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 3
        ),
        freq AS (SELECT sh, count(*) AS doc_freq FROM shingles GROUP BY sh),
        total AS (SELECT count(*) AS n_total FROM documents),
        bp AS (SELECT sh FROM freq, total WHERE doc_freq > n_total * 0.01),
        ratios AS (
            SELECT s.doc_id,
                   CAST({_exact_mean_sql("sum(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)", "count(*)", sum_scale=0, out_scale=4)}
                        AS DOUBLE) AS r
            FROM shingles s LEFT JOIN bp b ON s.sh = b.sh
            GROUP BY s.doc_id
        )
        SELECT d.source,
               count(*) AS n_docs,
               ((CASE WHEN CAST(sum(CAST(r AS DECIMAL(14,4))) * 10000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(r AS DECIMAL(14,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(CAST(r AS DECIMAL(14,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS avg_bp_ratio,
               max(r) AS max_bp_ratio
        FROM ratios x JOIN documents d ON d.doc_id = x.doc_id
        GROUP BY d.source
    """,
    "q9_product_profit": """
        SELECT n.n_name AS nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS o_year,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%bolt%'
        GROUP BY n.n_name, year(l.l_shipdate)
    """,
    "q14_promo_revenue": """
        SELECT CAST(round(
                   100.0 * CAST(round(sum(CAST(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount) END AS DECIMAL(18,6))), 4) AS DOUBLE)
                   / CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 4) AS DOUBLE),
               4) AS DOUBLE) AS promo_revenue_pct,
               count(*) AS n_rows
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
    "q20_nested_in_chain": """
        SELECT c_mktsegment, count(*) AS numcust
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                WHERE l_partkey IN (
                    SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
                )
                AND l_quantity > 30
            )
        )
        GROUP BY c_mktsegment
    """,
    "q17_small_quantity_revenue": """
        SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly,
               count(*) AS n_rows
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey
          )
    """,
    "q13_order_count_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT OUTER JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    "q22_global_sales_opportunity": """
        SELECT c_mktsegment,
               count(*) AS numcust,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
        FROM customer c1
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c1.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
        GROUP BY c_mktsegment
    """,
    "q19_bracket_predicates": """
        SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_rows
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 5 AND 35)
           OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 10 AND 50)
    """,
    "q11_important_suppliers": """
        SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS value
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_suppkey, s.s_name
        HAVING sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) * 100 > (
            SELECT sum(CAST(l2.l_extendedprice * (1 - l2.l_discount) AS DECIMAL(18,6)))
            FROM lineitem l2
        )
    """,
    "q12_priority_shipping": """
        SELECT l.l_returnflag AS returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_returnflag
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue_d
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
               CAST(round(r.total_revenue_d, 2) AS DOUBLE) AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue_d = (SELECT max(total_revenue_d) FROM revenue)
    """,
    "q16_part_supplier_counts": """
        SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
               count(DISTINCT ps.l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part p ON p.p_partkey = ps.l_partkey
        WHERE p.p_brand <> 'Brand#15'
          AND p.p_type NOT LIKE 'MEDIUM%'
          AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND ps.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    "q18_large_volume_customers": """
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               o.o_orderdate,
               CAST(round(CAST(o.o_totalprice AS DECIMAL(18,6)), 2) AS DOUBLE) AS total_price,
               CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 250
        )
        GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY total_price DESC, o_orderkey ASC
        LIMIT 100
    """,
    "q21_waiting_suppliers": """
        SELECT s.s_name AS supp_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, supp_name ASC
        LIMIT 50
    """,
    # prank/cdist are exact integer rationals (unique-key order →
    # singleton peer groups) computed round-half-up in integer
    # arithmetic — the tie-proof twin of the Spark reformulation.
    "w7_rank_gauntlet": f"""
        SELECT c_custkey, c_mktsegment,
               CAST(round(CAST(c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal,
               dense_rank()   OVER w AS drank,
               CAST(CASE WHEN count(*) OVER (PARTITION BY c_mktsegment) = 1
                    THEN 0.0
                    ELSE {_exact_mean_sql("(row_number() OVER w - 1)", "(count(*) OVER (PARTITION BY c_mktsegment) - 1)", sum_scale=0, out_scale=6)}
                    END AS DOUBLE) AS prank,
               CAST({_exact_mean_sql("(row_number() OVER w)", "(count(*) OVER (PARTITION BY c_mktsegment))", sum_scale=0, out_scale=6)} AS DOUBLE) AS cdist,
               ntile(4)       OVER w AS quartile,
               first_value(c_custkey) OVER (
                   PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS top_custkey
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    "a14_cube_revenue": """
        SELECT CAST(coalesce(year(l_shipdate), -1) AS INTEGER) AS ship_year,
               coalesce(l_returnflag, 'ALL') AS returnflag,
               CAST(grouping(year(l_shipdate)) AS INTEGER)  AS g_year,
               CAST(grouping(l_returnflag) AS INTEGER)      AS g_flag,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY CUBE (year(l_shipdate), l_returnflag)
    """,
    # Mirrors llm/chunking.chunk_documents: stride=48, chunk=64,
    # n_chunks = max(1, ceil((n-16)/48)), window i = tokens
    # [i*48, i*48+64) clamped — md5 over the space-joined slice.
    "text_chunk_windows": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tk
            FROM documents
        ), sized AS (
            SELECT doc_id, tk,
                   greatest(1, CAST(ceil((len(tk) - 16) / 48.0) AS INTEGER)) AS n_chunks
            FROM toks
        ), chunks AS (
            SELECT doc_id, tk, unnest(range(0, n_chunks)) AS chunk_id
            FROM sized
        )
        SELECT doc_id,
               CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(len(tk[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS BIGINT) AS n_tokens,
               md5(array_to_string(tk[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')) AS chunk_hash
        FROM chunks
    """,
    # Mirrors llm/sampling.stratified_sample: per-stratum rate
    # min(1, cap/n), salted md5 hex fold (same as sample_split_counts)
    # mod 1e6 against floor(rate*1e6).
    "sample_stratified_counts": """
        WITH cnt AS (
            SELECT lang, count(*) AS n FROM documents GROUP BY lang
        ), th AS (
            SELECT lang,
                   CAST(floor(least(1.0, 120.0 / n) * 1000000) AS BIGINT) AS thresh
            FROM cnt
        ), b AS (
            SELECT lang,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) % 1000000 AS bucket
            FROM documents
        )
        SELECT b.lang, count(*) AS n_kept
        FROM b JOIN th USING (lang)
        WHERE b.bucket < th.thresh
        GROUP BY b.lang
    """,
    # Mirrors llm/search.bm25_topk: Lucene-variant idf, k1=1.2 b=0.75,
    # per-term contribution rounded to 6 then summed as DECIMAL.
    # RRF fusion of the BM25 leg (text_bm25_search CTEs at k=20) and
    # the dense leg (embed_knn_topk cosine for query 0 at k=20)
    "search_hybrid_rrf": f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tok_ne AS (
            SELECT * FROM tok WHERE term <> ''
        ), dl AS (
            SELECT doc_id, count(*) AS dl FROM tok_ne GROUP BY doc_id
        ), totals AS (
            SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tok_ne WHERE term IN ('hash', 'join', 'window')
            GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), contrib AS (
            SELECT t.doc_id,
                   CAST(round(
                       ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * t.tf * 2.2
                       / (t.tf + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE)
                           / (CAST(sum_dl AS DOUBLE) / n_docs))),
                   6) AS DECIMAL(18,6)) AS c
            FROM tf t
            JOIN df USING (term)
            JOIN dl l USING (doc_id)
            CROSS JOIN totals
        ), lex AS (
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                        AS BIGINT) AS r_lex
            FROM (
                SELECT doc_id, CAST(round(sum(c), 4) AS DOUBLE) AS score
                FROM contrib GROUP BY doc_id
                ORDER BY score DESC, doc_id ASC
                LIMIT 20
            )
        ), q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id = 0
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
        ), dscored AS (
            SELECT c.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM c CROSS JOIN q
            WHERE c.neighbor_id <> q.query_id
        ), dense AS (
            SELECT neighbor_id AS doc_id, CAST(rn AS BIGINT) AS r_dense
            FROM (
                SELECT *, row_number() OVER (
                    ORDER BY cosine DESC, neighbor_id ASC) AS rn
                FROM dscored
            ) WHERE rn <= 20
        )
        SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id, r_lex, r_dense,
               (CASE WHEN r_lex IS NOT NULL AND r_dense IS NOT NULL
                     THEN ((CASE WHEN CAST(120 + r_lex + r_dense AS HUGEINT) < 0 THEN -((2 * abs(CAST(120 + r_lex + r_dense AS HUGEINT)) * 1000000 + (CAST((60 + r_lex) * (60 + r_dense) AS HUGEINT))) // (2 * (CAST((60 + r_lex) * (60 + r_dense) AS HUGEINT)))) ELSE ((2 * abs(CAST(120 + r_lex + r_dense AS HUGEINT)) * 1000000 + (CAST((60 + r_lex) * (60 + r_dense) AS HUGEINT))) // (2 * (CAST((60 + r_lex) * (60 + r_dense) AS HUGEINT)))) END) / 1000000.0)
                     ELSE ((CASE WHEN CAST(1 AS HUGEINT) < 0 THEN -((2 * abs(CAST(1 AS HUGEINT)) * 1000000 + (CAST(60 + COALESCE(r_lex, r_dense) AS HUGEINT))) // (2 * (CAST(60 + COALESCE(r_lex, r_dense) AS HUGEINT)))) ELSE ((2 * abs(CAST(1 AS HUGEINT)) * 1000000 + (CAST(60 + COALESCE(r_lex, r_dense) AS HUGEINT))) // (2 * (CAST(60 + COALESCE(r_lex, r_dense) AS HUGEINT)))) END) / 1000000.0)
                END) AS rrf_score
        FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
        ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
    "text_bm25_search": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tok_ne AS (
            SELECT * FROM tok WHERE term <> ''
        ), dl AS (
            SELECT doc_id, count(*) AS dl FROM tok_ne GROUP BY doc_id
        ), totals AS (
            SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tok_ne WHERE term IN ('hash', 'join', 'window')
            GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), contrib AS (
            SELECT t.doc_id,
                   CAST(round(
                       ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                       * t.tf * 2.2
                       / (t.tf + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE)
                           / (CAST(sum_dl AS DOUBLE) / n_docs))),
                   6) AS DECIMAL(18,6)) AS c
            FROM tf t
            JOIN df USING (term)
            JOIN dl l USING (doc_id)
            CROSS JOIN totals
        ), scored AS (
            SELECT doc_id,
                   CAST(round(sum(c), 4) AS DOUBLE) AS score,
                   count(*) AS n_terms_hit
            FROM contrib GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        )
        SELECT doc_id, score, n_terms_hit,
               row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM scored
    """,
    # Full replay of 2 deterministic Lloyd iterations (init = hash-
    # ordered LIMIT k, exact quantized-integer means), then the IVF
    # probe over the trained centroids — mirrors
    # llm/similarity.kmeans_train + ivf_kmeans_topk arithmetic.
    "embed_ivf_kmeans": f"""
        WITH cent0 AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 8
        ), {_kmeans_iter('cent0', 1)}, {_kmeans_iter('cent1', 2)},
        ranked AS (
            SELECT q.vec_id, c.cell,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) DESC,
                                c.cell ASC) AS cr
            FROM (SELECT vec_id, embedding AS qv FROM embeddings) q
            CROSS JOIN cent2 c
        ), corpus_cell AS (
            SELECT vec_id AS neighbor_id, cell FROM ranked WHERE cr = 1
        ), probes AS (
            SELECT vec_id AS query_id, cell
            FROM ranked WHERE cr <= 2 AND vec_id < 10
        ), scored AS (
            SELECT p.query_id, cc.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM probes p
            JOIN corpus_cell cc ON p.cell = cc.cell
            JOIN (SELECT vec_id, embedding AS cv FROM embeddings) c
                 ON c.vec_id = cc.neighbor_id
            JOIN (SELECT vec_id, embedding AS qv FROM embeddings) q
                 ON q.vec_id = p.query_id
            WHERE cc.neighbor_id <> p.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    # the salted two-stage aggregation must be indistinguishable from
    # a direct GROUP BY — the oracle is exactly that
    "a15_salted_event_totals": """
        SELECT event_type,
               count(*) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
               round(max(value), 4) AS max_value,
               round(min(value), 4) AS min_value
        FROM events
        GROUP BY event_type
    """,
    # SCD2 history merge replayed in SQL: bootstrap from the 1996
    # snapshot, then two full-outer-join merge rounds (1997, 1998)
    # mirroring operators/scd.py row fates exactly (IS NOT DISTINCT
    # FROM = eqNullSafe; close_deleted=true; closed rows pass through
    # the second merge untouched).
    "scd2_order_history": """
        WITH snap0 AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        ),
        hist0 AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   TIMESTAMP '1996-01-01' AS valid_from,
                   CAST(NULL AS TIMESTAMP) AS valid_to,
                   TRUE AS is_current
            FROM snap0
        ),
        snap1 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 5 = 0 THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderdate < TIMESTAMP '1997-01-01' AND o_orderkey % 11 <> 0
        ),
        j1 AS (
            SELECT h.o_orderkey AS hk, s.o_orderkey AS sk,
                   h.o_orderstatus AS h_st, h.o_totalprice AS h_tp,
                   h.valid_from AS h_vf, h.valid_to AS h_vt,
                   s.o_orderstatus AS s_st, s.o_totalprice AS s_tp,
                   (s.o_orderkey IS NOT NULL AND h.o_orderkey IS NOT NULL
                    AND h.o_orderstatus IS NOT DISTINCT FROM s.o_orderstatus
                    AND h.o_totalprice  IS NOT DISTINCT FROM s.o_totalprice) AS same
            FROM (SELECT * FROM hist0 WHERE is_current) h
            FULL OUTER JOIN snap1 s ON h.o_orderkey = s.o_orderkey
        ),
        hist1 AS (
            SELECT hk AS o_orderkey, h_st AS o_orderstatus, h_tp AS o_totalprice,
                   h_vf AS valid_from,
                   CASE WHEN same THEN h_vt ELSE TIMESTAMP '1997-01-01' END AS valid_to,
                   same AS is_current
            FROM j1 WHERE hk IS NOT NULL
            UNION ALL
            SELECT sk, s_st, s_tp, TIMESTAMP '1997-01-01',
                   CAST(NULL AS TIMESTAMP), TRUE
            FROM j1 WHERE sk IS NOT NULL AND NOT same
        ),
        snap2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN 'O' ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
            FROM orders
            WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_orderkey % 13 <> 0
        ),
        j2 AS (
            SELECT h.o_orderkey AS hk, s.o_orderkey AS sk,
                   h.o_orderstatus AS h_st, h.o_totalprice AS h_tp,
                   h.valid_from AS h_vf, h.valid_to AS h_vt,
                   s.o_orderstatus AS s_st, s.o_totalprice AS s_tp,
                   (s.o_orderkey IS NOT NULL AND h.o_orderkey IS NOT NULL
                    AND h.o_orderstatus IS NOT DISTINCT FROM s.o_orderstatus
                    AND h.o_totalprice  IS NOT DISTINCT FROM s.o_totalprice) AS same
            FROM (SELECT * FROM hist1 WHERE is_current) h
            FULL OUTER JOIN snap2 s ON h.o_orderkey = s.o_orderkey
        )
        SELECT o_orderkey, o_orderstatus, o_totalprice, valid_from, valid_to, is_current
        FROM hist1 WHERE NOT is_current
        UNION ALL
        SELECT hk, h_st, h_tp, h_vf,
               CASE WHEN same THEN h_vt ELSE TIMESTAMP '1998-01-01' END,
               same
        FROM j2 WHERE hk IS NOT NULL
        UNION ALL
        SELECT sk, s_st, s_tp, TIMESTAMP '1998-01-01',
               CAST(NULL AS TIMESTAMP), TRUE
        FROM j2 WHERE sk IS NOT NULL AND NOT same
    """,
    # exact heavy hitters: the MG-candidate + recount pipeline must be
    # indistinguishable from the naive GROUP BY ... HAVING
    "a18_heavy_hitter_users": """
        SELECT user_id, count(*) AS cnt
        FROM events
        GROUP BY user_id
        HAVING count(*) * 125 > (SELECT count(*) FROM events)
    """,
    # SemDeDup replay: identical k-means training to embed_ivf_kmeans
    # (hash-ordered init, two exact-integer-mean Lloyd iterations,
    # rounded-cosine/lowest-cell assignment), then within-cluster
    # lower-id pairs at cosine >= 0.4
    "dedup_semantic": f"""
        WITH cent0 AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 8
        ), {_kmeans_iter('cent0', 1)}, {_kmeans_iter('cent1', 2)},
        ranked AS (
            SELECT q.vec_id, c.cell,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) DESC,
                                c.cell ASC) AS cr
            FROM (SELECT vec_id, embedding AS qv FROM embeddings) q
            CROSS JOIN cent2 c
        ), corpus_cell AS (
            SELECT vec_id, cell FROM ranked WHERE cr = 1
        ), pairs AS (
            SELECT ca.vec_id AS a_id, cb.vec_id AS b_id
            FROM corpus_cell ca
            JOIN corpus_cell cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
            JOIN (SELECT vec_id, embedding AS cv FROM embeddings) c ON c.vec_id = ca.vec_id
            JOIN (SELECT vec_id, embedding AS qv FROM embeddings) q ON q.vec_id = cb.vec_id
            WHERE round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) >= 0.4
        )
        SELECT b_id AS vec_id, min(a_id) AS canonical_id,
               count(*) AS n_similar
        FROM pairs
        GROUP BY b_id
    """,
    # variant extraction must agree with plain JSON-path extraction
    "o12_variant_props": """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        FROM events
        GROUP BY event_type
    """,
    # resample+interpolate replay: same tick spine, same two-sided
    # ignore-nulls window scan, time-weighted blend; exact-hit ticks
    # take the observation via the (t_s, is_tick) sort
    "w8_resample_interpolate": """
        WITH ev AS (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t_s, value AS val
            FROM events
        ), bounds AS (
            SELECT user_id, min(t_s) AS t0, max(t_s) AS t1 FROM ev GROUP BY user_id
        ), ticks AS (
            SELECT user_id, unnest(range(
                CAST(ceil(t0 / 1800.0) * 1800 AS BIGINT),
                t1 + 1, 1800)) AS t_s
            FROM bounds
        ), merged AS (
            SELECT user_id, t_s, val, 0 AS is_tick FROM ev
            UNION ALL
            SELECT user_id, t_s, NULL AS val, 1 AS is_tick FROM ticks
        ), filled AS (
            SELECT user_id, t_s, is_tick,
                   last_value(val IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY t_s, is_tick, val NULLS FIRST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_val,
                   last_value(CASE WHEN val IS NOT NULL THEN t_s END IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY t_s, is_tick, val NULLS FIRST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_t,
                   first_value(val IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY t_s, is_tick, val NULLS FIRST
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_val,
                   first_value(CASE WHEN val IS NOT NULL THEN t_s END IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY t_s, is_tick, val NULLS FIRST
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_t
            FROM merged
        )
        SELECT user_id,
               CAST(to_timestamp(t_s) AS TIMESTAMP) AS tick_ts,
               floor((CASE WHEN prev_t IS NOT NULL AND next_t IS NOT NULL
                     THEN prev_val + (next_val - prev_val)
                          * ((t_s - prev_t) / (next_t - prev_t)) END) * 1e4 + 0.5) / 1e4 AS value_interp
        FROM filled WHERE is_tick = 1
    """,
    # batch watchdog: silence measured against the corpus head with
    # second-truncated timestamps (matching Spark's unix_timestamp)
    "a19_stale_feeds": """
        WITH head AS (
            SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS head_s FROM events
        ), per_key AS (
            SELECT user_id, max(ts) AS last_seen, count(*) AS n_events
            FROM events GROUP BY user_id
        )
        SELECT user_id, last_seen, n_events,
               CAST(floor((head.head_s - CAST(floor(epoch(last_seen)) AS BIGINT)) / 3600.0) AS BIGINT) AS hours_silent
        FROM per_key, head
        WHERE floor((head.head_s - CAST(floor(epoch(last_seen)) AS BIGINT)) / 3600.0) > 48
    """,
    # cohort = month of first order; offset counts month boundaries
    # (identical to Spark months_between on month-truncated stamps)
    "a20_cohort_retention": """
        WITH o AS (
            SELECT o_custkey, date_trunc('month', o_orderdate) AS om FROM orders
        ), first AS (
            SELECT o_custkey, min(om) AS cohort_month FROM o GROUP BY o_custkey
        )
        SELECT CAST(cohort_month AS DATE) AS cohort_month,
               CAST(date_diff('month', cohort_month, om) AS INTEGER) AS month_offset,
               count(DISTINCT o.o_custkey) AS n_active
        FROM o JOIN first USING (o_custkey)
        GROUP BY 1, 2
    """,
    # day-number minus row-number island key over distinct purchase days
    "w9_activity_islands": """
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events WHERE event_type = 'purchase'
        ), keyed AS (
            SELECT user_id, day,
                   date_diff('day', DATE '1970-01-01', day)
                   - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
            FROM days
        )
        SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
               count(*) AS streak_days
        FROM keyed GROUP BY user_id, grp
    """,
    # blocking key = first name token; refine = levenshtein <= 3
    # entity resolution: the j13 blocked fuzzy pair graph closed
    # transitively (recursive CTE), least name = canonical
    "er_part_name_clusters": """
        WITH RECURSIVE names AS (
            SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL
        ),
        blocked AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM names),
        pairs AS (
            SELECT a.p_name AS na, b.p_name AS nb
            FROM blocked a JOIN blocked b
              ON a.blk = b.blk AND a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 3
        ),
        edges AS (
            SELECT na AS a, nb AS b FROM pairs
            UNION SELECT nb, na FROM pairs
        ),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        labels AS (
            SELECT a AS node, least(a, min(b)) AS canonical
            FROM reach GROUP BY a
        )
        SELECT canonical AS canonical_name,
               count(*) AS n_members,
               array_to_string(list_sort(list(node)), '|') AS members
        FROM labels GROUP BY canonical ORDER BY canonical
    """,
    "j13_fuzzy_name_match": """
        WITH names AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL),
        blocked AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM names)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    # KMV replay: distinct 32-bit md5-fold hashes, k smallest, exact
    # integer estimator (k-1)*2^32 // h_k; degenerate case n<k exact
    "a21_kmv_distinct": """
        WITH h AS (
            SELECT DISTINCT list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8), ''),
                c -> CAST(strpos('123456789abcdef', c) AS BIGINT))), (a, b) -> a * 16 + b) AS h
            FROM lineitem
        ), topk AS (
            SELECT h FROM h ORDER BY h LIMIT 256
        )
        SELECT CAST(256 AS INTEGER) AS k,
               max(h) AS kth_hash,
               CASE WHEN count(*) < 256 THEN count(*)
                    WHEN max(h) > 0 THEN CAST(255 * 4294967296 AS BIGINT) // max(h)
               END AS est_distinct
        FROM topk
    """,
    # three chained unbounded windows over one user partitioning
    "a22_funnel_conversion": """
        WITH w1 AS (
            SELECT user_id, event_type, ts,
                   min(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id) AS v_ts
            FROM events
        ), w2 AS (
            SELECT *, min(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
                       OVER (PARTITION BY user_id) AS c_ts
            FROM w1
        ), w3 AS (
            SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
                       OVER (PARTITION BY user_id) AS p_ts
            FROM w2
        ), per_user AS (
            SELECT user_id, max(v_ts) AS v_ts, max(c_ts) AS c_ts, max(p_ts) AS p_ts
            FROM w3 GROUP BY user_id
        )
        SELECT count(v_ts) AS n_viewed,
               count(c_ts) AS n_clicked_after_view,
               count(p_ts) AS n_purchased_after_click
        FROM per_user
    """,
    # step-hold time-weighted average; DECIMAL weighted sum (exact,
    # order-independent) then the engine-identical quantized rounding
    "w10_time_weighted_avg": """
        WITH ev AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, value
            FROM events
        ), nxt AS (
            SELECT user_id, t_us, value,
                   lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, value) AS next_us
            FROM ev
        ), g AS (
            SELECT user_id,
                   CAST(sum(CASE WHEN next_us IS NOT NULL
                        THEN CAST(value AS DECIMAL(18,4)) * (next_us - t_us) END)
                        AS DECIMAL(38,4)) AS wsum,
                   max(t_us) - min(t_us) AS span_us,
                   count(*) AS n_obs
            FROM nxt GROUP BY user_id
        )
        SELECT user_id, n_obs,
               floor(CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE) * 1e4 + 0.5) / 1e4 AS twa_value
        FROM g WHERE span_us > 0
    """,
    # sweep-line: +1 at open, -1 at last-shipment close, running sum
    # per customer; [open, close) via delta-ascending tie-break
    "j14_max_concurrent_orders": """
        WITH close AS (
            SELECT l_orderkey, max(l_shipdate) AS close_ts
            FROM lineitem GROUP BY l_orderkey
        ), spans AS (
            SELECT o_custkey, o_orderdate AS open_ts, close_ts
            FROM orders JOIN close ON o_orderkey = l_orderkey
        ), deltas AS (
            SELECT o_custkey, open_ts AS t, 1 AS delta FROM spans
            UNION ALL
            SELECT o_custkey, close_ts AS t, -1 AS delta FROM spans
        ), running AS (
            SELECT o_custkey,
                   sum(delta) OVER (PARTITION BY o_custkey ORDER BY t, delta
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_now
            FROM deltas
        )
        SELECT o_custkey, CAST(max(open_now) AS BIGINT) AS max_open_orders
        FROM running GROUP BY o_custkey
    """,
    # last preceding non-purchase touch within 24h, else unattributed;
    # ties at identical timestamps break on event_id
    "w11_last_touch_attribution": """
        WITH ev AS (
            SELECT user_id, event_type, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
            FROM events
        ), tagged AS (
            SELECT *,
                   last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
                   last_value(CASE WHEN event_type <> 'purchase' THEN t_us END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_us
            FROM ev
        )
        SELECT CASE WHEN touch_us IS NOT NULL AND t_us - touch_us <= 86400000000
                    THEN touch_type ELSE 'unattributed' END AS touch_type,
               count(*) AS n_purchases
        FROM tagged WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    # z-score outliers: exact DECIMAL moments, double math from exact
    # inputs, quantized |z| compared at the threshold
    "a23_value_outliers": """
        WITH stats AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS s1,
                   CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS s2
            FROM events GROUP BY event_type
        ), z AS (
            SELECT e.event_id, e.event_type, e.value,
                   floor(abs((e.value - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0))) * 1e4 + 0.5) / 1e4 AS abs_z
            FROM events e JOIN stats USING (event_type)
        )
        SELECT event_id, event_type, value, abs_z
        FROM z WHERE abs_z > 3.0
    """,
    # same-order part pairs; (count, pair) is a total order so the
    # top-20 cut is deterministic
    "j15_part_cooccurrence": """
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_orders
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY n_orders DESC, part_a, part_b
        LIMIT 20
    """,
    # first-seen day per (user, type) -> per-day adopters -> running
    # total per type
    "w12_cumulative_new_users": """
        WITH first_seen AS (
            SELECT user_id, event_type, min(CAST(ts AS DATE)) AS first_day
            FROM events GROUP BY user_id, event_type
        ), daily AS (
            SELECT event_type, first_day, count(*) AS n_new_users
            FROM first_seen GROUP BY event_type, first_day
        )
        SELECT event_type, first_day AS day, n_new_users,
               CAST(sum(n_new_users) OVER (PARTITION BY event_type ORDER BY first_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users
        FROM daily
    """,
    # native ASOF JOIN + explicit 10-minute gap bound
    "j16_asof_tolerance": """
        WITH l AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ), r AS (
            SELECT user_id, ts, max(value) AS value
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        ), j AS (
            SELECT l.event_id, l.user_id, l.ts, r.ts AS rts, r.value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND r.ts <= l.ts
        )
        SELECT event_id, user_id, ts,
               CASE WHEN rts IS NOT NULL
                     AND epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(rts AS TIMESTAMP)) <= 600000000
                    THEN value END AS prior_click_value
        FROM j
    """,
    # explicit mode with deterministic tie-break (count desc, type asc)
    "a24_mode_per_group": """
        WITH counts AS (
            SELECT user_id, event_type, count(*) AS cnt
            FROM events GROUP BY user_id, event_type
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY user_id
                       ORDER BY cnt DESC, event_type) AS rn
            FROM counts
        )
        SELECT user_id, event_type AS mode_event_type, cnt
        FROM ranked WHERE rn = 1
    """,
    # first-occurrence positions: list_position (first match, 1-based)
    # replays Spark's posexplode + min(pos)+1
    "o13_token_positions": """
        WITH hits AS (
            SELECT doc_id, t.term,
                   list_position(string_split(text, ' '), t.term) AS first_pos
            FROM documents
            CROSS JOIN (VALUES ('spark'), ('window'), ('hash')) t(term)
            WHERE list_position(string_split(text, ' '), t.term) > 0
        )
        SELECT term, count(*) AS n_docs,
               floor(avg(first_pos) * 1e4 + 0.5) / 1e4 AS avg_first_pos
        FROM hits GROUP BY term
    """,
    # same LATERAL shape natively
    "j17_lateral_topk": """
        SELECT n.n_name AS nation, t.c_name AS customer,
               t.c_acctbal AS acctbal
        FROM nation n,
        LATERAL (
            SELECT c_name, c_acctbal, c_custkey
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
    """,
    # exact integer-fixed-point PageRank, two unrolled iterations
    # (DuckDB // == Spark DIV on positive BIGINTs: truncation)
    "graph_pagerank": """
        WITH e AS (
            SELECT DISTINCT concat('c', o_custkey) AS s,
                            concat('s', l_suppkey) AS d
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), bi AS (
            SELECT s AS _s, d AS _d FROM e
            UNION ALL
            SELECT d AS _s, s AS _d FROM e
        ), nodes AS (
            SELECT DISTINCT _s AS node FROM bi
            UNION
            SELECT DISTINCT _d AS node FROM bi
        ), params AS (
            SELECT CAST(1000000000000000 // count(*) AS BIGINT) AS base FROM nodes
        ), outdeg AS (
            SELECT _s, count(*) AS deg FROM bi GROUP BY _s
        ), r0 AS (
            SELECT node, (SELECT base FROM params) AS rank FROM nodes
        ), c1 AS (
            SELECT _d AS node, sum(rank // deg) AS cin
            FROM r0 JOIN bi ON node = _s JOIN outdeg USING (_s)
            GROUP BY _d
        ), r1 AS (
            SELECT n.node,
                   CAST((15 * (SELECT base FROM params)) // 100
                        + (85 * coalesce(cin, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN c1 USING (node)
        ), c2 AS (
            SELECT _d AS node, sum(rank // deg) AS cin
            FROM r1 JOIN bi ON node = _s JOIN outdeg USING (_s)
            GROUP BY _d
        ), r2 AS (
            SELECT n.node,
                   CAST((15 * (SELECT base FROM params)) // 100
                        + (85 * coalesce(cin, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN c2 USING (node)
        )
        SELECT node, rank AS rank_scaled FROM r2
    """,
    # canonical lo<mid<hi triangle orientation — each triangle once
    "graph_triangles": """
        WITH baskets AS (
            SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS parts
            FROM lineitem GROUP BY l_orderkey
        ), pairs AS (
            SELECT DISTINCT a.p AS a, b.p AS b
            FROM baskets, unnest(parts) a(p), unnest(parts) b(p)
            WHERE a.p < b.p
        )
        SELECT count(*) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e1.b = e2.a
        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    # one stats row per column; doubles render via DECIMAL(18,2)
    "a25_column_profile": """
        SELECT 'o_orderkey' AS column_name,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_str,
               CAST(max(o_orderkey) AS VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_custkey',
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_totalprice),
               CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
               CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate',
               CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderdate),
               CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
    # Benford screen: first digit of the decimal rendering
    "a26_benford_digits": """
        WITH counts AS (
            SELECT CAST(substr(CAST(abs(o_totalprice) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
                   count(*) AS n
            FROM orders WHERE o_totalprice > 0
            GROUP BY 1
        ), t AS (SELECT sum(n) AS total FROM counts)
        SELECT digit, n,
               floor(n / CAST(total AS DOUBLE) * 1e6 + 0.5) / 1e6 AS observed_share,
               floor(log10(1 + 1.0 / digit) * 1e6 + 0.5) / 1e6 AS benford_share
        FROM counts, t
    """,
    # BFS unrolled two levels; anti-join against settled nodes per hop
    "graph_khop_reach": """
        WITH e AS (
            SELECT DISTINCT concat('c', o_custkey) AS s,
                            concat('s', l_suppkey) AS d
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), bi AS (
            SELECT s AS _s, d AS _d FROM e
            UNION ALL
            SELECT d AS _s, s AS _d FROM e
        ), l0 AS (
            SELECT DISTINCT concat('s', s_suppkey) AS node
            FROM supplier WHERE s_nationkey = 0
        ), l1 AS (
            SELECT DISTINCT _d AS node
            FROM l0 JOIN bi ON l0.node = bi._s
            WHERE _d NOT IN (SELECT node FROM l0)
        ), l2 AS (
            SELECT DISTINCT _d AS node
            FROM l1 JOIN bi ON l1.node = bi._s
            WHERE _d NOT IN (SELECT node FROM l0)
              AND _d NOT IN (SELECT node FROM l1)
        )
        SELECT node, 0 AS min_hops FROM l0
        UNION ALL
        SELECT node, 1 FROM l1
        UNION ALL
        SELECT node, 2 FROM l2
    """,
    # hopping windows: each event lands in window/slide = 4 windows,
    # starts at its 15-min bucket minus k slides; epoch alignment
    # matches Spark's TimeWindow (both anchor at 1970-01-01 naive)
    "t3_sliding_window": """
        SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL '15 minutes' * k.k AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
        GROUP BY 1, 2
    """,
    # seasonal anomalies: integer hourly counts -> exact integer
    # moments per (type, hour-of-day) -> quantized |z|; zero-variance
    # slots excluded by exact integer guard
    "a27_seasonal_anomaly": """
        WITH hourly AS (
            SELECT event_type,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_ts,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ), keyed AS (
            SELECT *, CAST(hour(bucket_ts) AS INTEGER) AS hod
            FROM hourly
        ), base AS (
            SELECT event_type, hod, count(*) AS n,
                   sum(n_events) AS s1,
                   sum(n_events * n_events) AS s2
            FROM keyed GROUP BY 1, 2
        )
        SELECT k.event_type, k.bucket_ts, k.n_events,
               floor(abs((k.n_events - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
                   / sqrt((CAST(b.s2 AS DOUBLE)
                           - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
                          / (CAST(b.n AS DOUBLE) - 1.0))) * 1e4 + 0.5) / 1e4 AS abs_z
        FROM keyed k
        JOIN base b
          ON k.event_type = b.event_type AND k.hod = b.hod
        WHERE b.n >= 3 AND b.n * b.s2 - b.s1 * b.s1 > 0
          AND floor(abs((k.n_events - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
                  / sqrt((CAST(b.s2 AS DOUBLE)
                          - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
                         / (CAST(b.n AS DOUBLE) - 1.0))) * 1e4 + 0.5) / 1e4 > 2.5
    """,
    # snapshot diff: presence via full-outer join, change via direct
    # column compare (the oracle checks the SEMANTICS the xxhash64
    # fingerprint stands in for)
    "o14_snapshot_diff": """
        WITH old AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders WHERE CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-01-01'
        ), new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-06-01'
        )
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    ELSE 'changed' END AS diff_type
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
    """,
    # equi-depth histogram: the same exact interpolated decile
    # boundaries (quantile_cont ≡ percentile), bucket = count of
    # boundaries <= value
    "a40_equidepth_histogram": """
        WITH b AS (
            SELECT quantile_cont(value,
                [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bnds
            FROM events WHERE value IS NOT NULL
        ), x AS (
            SELECT e.value,
                   CAST(len(list_filter(b.bnds, t -> t <= e.value))
                        AS INTEGER) AS bucket
            FROM events e CROSS JOIN b
            WHERE e.value IS NOT NULL
        )
        SELECT bucket, count(*) AS n_rows,
               round(min(value), 4) AS lo,
               round(max(value), 4) AS hi
        FROM x GROUP BY bucket ORDER BY bucket
    """,
    # Theil-Sen: pairwise slopes over the daily series, exact
    # interpolated median (quantile_cont ≡ Spark percentile),
    # intercept = median residual at that slope
    "trend_theilsen_by_type": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        ), seq AS (
            SELECT event_type, y,
                   date_diff('day',
                             min(day) OVER (PARTITION BY event_type),
                             day) AS x
            FROM daily
        ), slopes AS (
            SELECT a.event_type, (b.y - a.y) / (b.x - a.x) AS slope
            FROM seq a JOIN seq b
              ON a.event_type = b.event_type AND a.x < b.x
        ), sl AS (
            SELECT event_type, quantile_cont(slope, 0.5) AS slope
            FROM slopes GROUP BY 1
        ), resid AS (
            SELECT s.event_type, sl.slope, s.y - sl.slope * s.x AS r
            FROM seq s JOIN sl USING (event_type)
        )
        SELECT event_type,
               count(*) AS n_days,
               round(max(slope), 6) AS theil_slope,
               round(quantile_cont(r, 0.5), 4) AS theil_intercept
        FROM resid GROUP BY event_type ORDER BY event_type
    """,
    # CUSUM via the same prefix identity the operator uses
    # (s_i = p_i - min(0, running-min p)); DECIMAL-exact daily sums,
    # deviations, and prefixes keep both engines bit-identical
    "a39_cusum_changepoints": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(value AS DECIMAL(18,6))) AS y
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ), tgt AS (
            SELECT event_type,
                   CAST(((CASE WHEN CAST(sum(y) * 1000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(y) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(y) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 1000000.0)
                        AS DECIMAL(18,6)) AS target
            FROM daily GROUP BY 1
        ), pre AS (
            SELECT d.event_type, d.day, t.target,
                   sum(d.y - t.target) OVER w AS p
            FROM daily d JOIN tgt t USING (event_type)
            WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), s AS (
            SELECT event_type, target, day,
                   p - least(min(p) OVER w, 0)       AS s_up,
                   (-p) - least(min(-p) OVER w, 0)   AS s_dn
            FROM pre
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_type,
               count(*) AS n_days,
               CAST(sum(CASE WHEN s_up > target / 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_alerts_up,
               CAST(sum(CASE WHEN s_dn > target / 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_alerts_down,
               CAST(round(max(s_up), 4) AS DOUBLE) AS max_cusum_up,
               CAST(round(max(s_dn), 4) AS DOUBLE) AS max_cusum_down
        FROM s GROUP BY event_type ORDER BY event_type
    """,
    # the Bloom prefilter is a pure pruning structure — the exact
    # semi-join after it removes every false positive, so the oracle
    # is the PLAIN semi-join aggregate
    "j19_bloom_semi_reduction": """
        SELECT l_returnflag AS returnflag,
               count(*) AS n_lines,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag
        ORDER BY returnflag
    """,
    # per-source cap: same quality expression as
    # text_quality_by_source, per-source top-40 by (quality DESC,
    # doc_id ASC), exact DECIMAL mean over the kept set
    "sample_source_cap": f"""
        WITH q AS (
            SELECT doc_id, source, {_QUALITY_EXPR} AS quality FROM documents
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY source
                ORDER BY quality DESC, doc_id ASC) AS rk
            FROM q
        ), kept AS MATERIALIZED (
            SELECT * FROM ranked WHERE rk <= 40
        ), tot AS (
            SELECT source, count(*) AS n_total FROM q GROUP BY source
        )
        SELECT k.source, t.n_total,
               count(*) AS n_kept,
               t.n_total - count(*) AS n_dropped,
               -- engine-exact 4-dp mean (integer half-up), mirrored
               -- from the Spark query: the round(double) form ties at
               -- *.5e-4 boundaries (first seen at sf0.1)
               floor((2 * CAST(sum(CAST(k.quality AS DECIMAL(14,4)))
                               * 10000 AS BIGINT) + count(*))
                     / (2 * count(*))) / 10000.0 AS avg_kept_quality,
               min(k.quality) AS quality_cutoff
        FROM kept k JOIN tot t USING (source)
        GROUP BY k.source, t.n_total
        ORDER BY k.source
    """,
    # IVF-cell kNN graph: same hash-sampled centroid set and rounded
    # nearest-cell assignment as embed_ivf_ann, then an exact-cosine
    # self-join within each cell and a per-src top-3 with the
    # operator's (cosine DESC, dst ASC) tie-break
    "embed_knn_graph": f"""
        WITH cent AS (
            SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 16
        ), ranked AS (
            SELECT q.vec_id, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) DESC,
                                c.centroid_id ASC) AS cr
            FROM (SELECT vec_id, embedding AS qv FROM embeddings) q
            CROSS JOIN cent c
        ), cell AS (
            SELECT vec_id, centroid_id FROM ranked WHERE cr = 1
        ), scored AS (
            SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM cell a
            JOIN cell b ON a.centroid_id = b.centroid_id
            JOIN (SELECT vec_id, embedding AS qv FROM embeddings) q
                 ON q.vec_id = a.vec_id
            JOIN (SELECT vec_id, embedding AS cv FROM embeddings) c
                 ON c.vec_id = b.vec_id
            WHERE a.vec_id <> b.vec_id
        )
        SELECT src_id, dst_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src_id ORDER BY cosine DESC, dst_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    # capped kNN graph: same cells, but the NEIGHBOR side of each
    # cell keeps only the 20 rows ranked first by (md5(id), id) —
    # the exact replay of knn_graph's max_cell_rows cap
    "embed_knn_graph_capped": f"""
        WITH cent AS (
            SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 16
        ), ranked AS (
            SELECT q.vec_id, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) DESC,
                                c.centroid_id ASC) AS cr
            FROM (SELECT vec_id, embedding AS qv FROM embeddings) q
            CROSS JOIN cent c
        ), cell AS (
            SELECT vec_id, centroid_id FROM ranked WHERE cr = 1
        ), capped AS MATERIALIZED (
            SELECT vec_id, centroid_id FROM (
                SELECT vec_id, centroid_id,
                       row_number() OVER (
                           PARTITION BY centroid_id
                           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
                FROM cell) WHERE rk <= 20
        ), scored AS (
            SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM cell a
            JOIN capped b ON a.centroid_id = b.centroid_id
            JOIN (SELECT vec_id, embedding AS qv FROM embeddings) q
                 ON q.vec_id = a.vec_id
            JOIN (SELECT vec_id, embedding AS cv FROM embeddings) c
                 ON c.vec_id = b.vec_id
            WHERE a.vec_id <> b.vec_id
        )
        SELECT src_id, dst_id, cosine, CAST(rn AS INTEGER) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src_id ORDER BY cosine DESC, dst_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    # sync label propagation, 2 rounds unrolled: each round counts
    # neighbor labels and takes the per-node argmax with the identical
    # deterministic tie-break (count DESC, label ASC) the Spark
    # operator uses — exact replay, same discipline as pagerank
    "graph_communities": f"""
        WITH {_LPA_TRADE_CTE}
        SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members
        FROM lab2
        GROUP BY label
        ORDER BY n_members DESC, community ASC
        LIMIT 15
    """,
    # Newman modularity of the SAME 2-round LPA labeling (shared CTE
    # chain): exact integer counts (bi-edges inside each community,
    # degree sums, total bi-edges) until the one final division
    "graph_modularity": f"""
        WITH {_LPA_TRADE_CTE},
        deg AS (
            SELECT l.label AS community,
                   count(*) AS degree_sum,
                   sum(CASE WHEN l.label = r.label THEN 1 ELSE 0 END)
                       AS internal_bi
            FROM bi b
            JOIN lab2 l ON b._s = l.node
            JOIN lab2 r ON b._d = r.node
            GROUP BY 1
        ), mem AS (
            SELECT label AS community, count(*) AS n_members
            FROM lab2 GROUP BY 1
        ), mm AS (
            SELECT count(*) AS m_bi FROM bi
        )
        SELECT d.community, m.n_members,
               CAST(d.internal_bi // 2 AS BIGINT) AS internal_edges,
               d.degree_sum,
               ((CASE WHEN CAST(d.internal_bi * mm.m_bi - d.degree_sum * d.degree_sum AS HUGEINT) < 0 THEN -((2 * abs(CAST(d.internal_bi * mm.m_bi - d.degree_sum * d.degree_sum AS HUGEINT)) * 1000000 + (CAST(mm.m_bi * mm.m_bi AS HUGEINT))) // (2 * (CAST(mm.m_bi * mm.m_bi AS HUGEINT)))) ELSE ((2 * abs(CAST(d.internal_bi * mm.m_bi - d.degree_sum * d.degree_sum AS HUGEINT)) * 1000000 + (CAST(mm.m_bi * mm.m_bi AS HUGEINT))) // (2 * (CAST(mm.m_bi * mm.m_bi AS HUGEINT)))) END) / 1000000.0) AS modularity_contrib
        FROM deg d JOIN mem m USING (community) CROSS JOIN mm
        ORDER BY m.n_members DESC, d.community ASC
        LIMIT 15
    """,
    # recursive CTE walks the same parent chain the pointer-doubling
    # closure materializes; self pairs unioned in for subtree-inclusive
    # semantics
    "graph_hierarchy_rollup": """
        WITH RECURSIVE anc AS (
            SELECT c_custkey AS node, c_custkey // 10 AS ancestor
            FROM customer WHERE c_custkey >= 10
            UNION ALL
            SELECT a.node, a.ancestor // 10
            FROM anc a WHERE a.ancestor >= 10
        ), subtree AS (
            SELECT node, ancestor FROM anc
            UNION ALL
            SELECT c_custkey AS node, c_custkey AS ancestor FROM customer
        )
        SELECT s.ancestor AS node_key,
               count(*) AS n_subtree,
               CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS subtree_bal
        FROM subtree s JOIN customer c ON c.c_custkey = s.node
        WHERE s.ancestor < 100
        GROUP BY 1
    """,
    # A-ES weighted sampling replay: same md5 hex fold -> uniform ->
    # ln(u)/w key, same 1e-12 quantization, same (key desc, id) order
    "sample_weighted_topk": """
        WITH scored AS (
            SELECT doc_id, lang, n_chars,
                   floor(ln((CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(
                               string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), ''),
                               c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                           (a, x) -> a * 16 + x) AS DOUBLE) + 0.5) / 4294967296.0)
                       / CAST(n_chars AS DOUBLE) * 1e12) / 1e12 AS score_q
            FROM documents WHERE n_chars > 0
        )
        SELECT lang, rn, doc_id, n_chars FROM (
            SELECT *, row_number() OVER (
                PARTITION BY lang ORDER BY score_q DESC, doc_id) AS rn
            FROM scored
        ) WHERE rn <= 10
    """,
    # brute-force replay of the prefix-filtered AllPairs join: same
    # integer-quantized tf-idf weights (wq), exact integer dot/norm,
    # 1e-9-grid cosine; the prefix filter is lossless so brute force
    # and filtered plans agree exactly
    "text_tfidf_pairs": """
        WITH words AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), toks AS (
            SELECT doc_id, list_aggregate(w[i:i+2], 'string_agg', ' ') AS term,
                   count(*) AS tf
            FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 3
            GROUP BY 1, 2
        ), nn AS (SELECT count(*) AS n FROM documents),
        dfreq AS (SELECT term, count(*) AS df FROM toks GROUP BY 1),
        feats AS (
            SELECT t.doc_id, t.term,
                   CAST(floor(t.tf * ln((nn.n + 1.0) / (d.df + 1.0)) * 1e4 + 0.5)
                        AS BIGINT) AS wq
            FROM toks t JOIN dfreq d USING (term), nn
            WHERE CAST(d.df AS DOUBLE) / nn.n <= 0.5
        ), norms AS (
            SELECT doc_id, sum(wq * wq) AS n2 FROM feats GROUP BY 1
        ), dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   sum(a.wq * b.wq) AS dot_q
            FROM feats a JOIN feats b
              ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               floor(CAST(dot_q AS DOUBLE)
                     / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                     * 1e9) / 1e9 AS cos_sim
        FROM dots
        JOIN norms na ON na.doc_id = dots.doc_a
        JOIN norms nb ON nb.doc_id = dots.doc_b
        WHERE floor(CAST(dot_q AS DOUBLE)
                    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                    * 1e9) / 1e9 >= 0.5
    """,
    # exact CMS replay: same salted md5 fold per sketch row, same
    # depth/width, min-over-rows estimate left-joined with 0-default
    # CMS inner-product join-size estimate: both sketches replayed
    # with the a28 salted-md5 fold, est = min over rows of Σ cntA·cntB
    "a41_cms_join_size": f"""
        WITH rows_i AS (SELECT unnest([0, 1, 2, 3]) AS i),
        ua AS (
            SELECT i.i AS row_idx,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('cms' || CAST(i.i AS VARCHAR) || '|'
                               || CAST(user_id AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) % 1024 AS bucket
            FROM events CROSS JOIN rows_i i
            WHERE user_id IS NOT NULL
        ),
        ca AS (SELECT row_idx, bucket, count(*) AS cnt FROM ua GROUP BY 1, 2),
        ub AS (
            SELECT i.i AS row_idx,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('cms' || CAST(i.i AS VARCHAR) || '|'
                               || CAST(o_custkey AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) % 1024 AS bucket
            FROM orders CROSS JOIN rows_i i
            WHERE o_custkey IS NOT NULL
        ),
        cb AS (SELECT row_idx, bucket, count(*) AS cnt FROM ub GROUP BY 1, 2),
        prod AS (
            SELECT a.row_idx, sum(a.cnt * b.cnt) AS ip
            FROM ca a JOIN cb b USING (row_idx, bucket) GROUP BY 1
        ),
        est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_size FROM prod),
        exact AS (
            SELECT CAST(sum(na * nb) AS BIGINT) AS exact_join_size
            FROM (SELECT user_id AS k, count(*) AS na FROM events
                  WHERE user_id IS NOT NULL GROUP BY 1) a
            JOIN (SELECT o_custkey AS k, count(*) AS nb FROM orders
                  WHERE o_custkey IS NOT NULL GROUP BY 1) b USING (k)
        )
        SELECT est_join_size, exact_join_size,
               CAST({_exact_mean_sql("(est_join_size - exact_join_size)", "exact_join_size", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS rel_err
        FROM est, exact
    """,
    # PMI collocations: exact bigram/unigram counts, identical
    # arithmetic expression tree in both engines before the round
    "text_pmi_collocations": """
        WITH words AS (SELECT string_split(text, ' ') AS w FROM documents),
        uni AS (SELECT unnest(w) AS t FROM words),
        ucnt AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
        utot AS (SELECT count(*) AS na FROM uni),
        bg AS (
            SELECT w[i] AS w1, w[i + 1] AS w2
            FROM words, UNNEST(range(1, len(w))) AS x(i)
            WHERE len(w) >= 2
        ),
        bcnt AS (SELECT w1, w2, count(*) AS n_pairs FROM bg GROUP BY 1, 2),
        btot AS (SELECT count(*) AS n FROM bg)
        SELECT w1, w2, n_pairs,
               round(log2((CAST(n_pairs AS DOUBLE) * na * na)
                          / (CAST(n AS DOUBLE) * ca.c * cb.c)), 4) AS pmi
        FROM bcnt
        JOIN ucnt ca ON bcnt.w1 = ca.t
        JOIN ucnt cb ON bcnt.w2 = cb.t
        CROSS JOIN utot CROSS JOIN btot
        WHERE n_pairs >= 5
        ORDER BY pmi DESC, w1, w2 LIMIT 30
    """,
    # Heaps'-law growth: first-occurrence placement + decile grid,
    # closed-form log-log least squares — same expression tree as Spark
    "text_heaps_law": f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        wne AS (SELECT * FROM words WHERE w <> ''),
        first_seen AS (SELECT w, min(doc_id) AS first_doc FROM wne GROUP BY w),
        doc_tokens AS (SELECT doc_id, count(*) AS n_tok FROM wne GROUP BY doc_id),
        grid AS (
            SELECT CAST(i + 1 AS INTEGER) AS decile,
                   CAST(floor(q[CAST(i + 1 AS INTEGER)]) AS BIGINT) AS cutoff
            FROM (SELECT quantile_cont(doc_id,
                      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) AS q
                  FROM documents),
                 UNNEST(range(0, 10)) AS t(i)
        ),
        vocab AS (
            SELECT g.decile, g.cutoff, count(*) AS vocab
            FROM grid g JOIN first_seen f ON f.first_doc <= g.cutoff
            GROUP BY 1, 2
        ),
        toks AS (
            SELECT g.decile, sum(n_tok) AS tokens
            FROM grid g JOIN doc_tokens d ON d.doc_id <= g.cutoff
            GROUP BY 1
        ),
        pts AS (
            -- 6-dp logs as scaled BIGINTs (x1e6): exact integer fit
            SELECT v.decile, v.cutoff, t.tokens, v.vocab,
                   CAST(round(log10(t.tokens) * 1000000, 0) AS BIGINT) AS x,
                   CAST(round(log10(v.vocab) * 1000000, 0) AS BIGINT) AS y
            FROM vocab v JOIN toks t USING (decile)
        ),
        sums AS (
            SELECT CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(x) AS HUGEINT) AS sx,
                   CAST(sum(y) AS HUGEINT) AS sy,
                   CAST(sum(x * x) AS HUGEINT) AS sxx,
                   CAST(sum(x * y) AS HUGEINT) AS sxy
            FROM pts
        ),
        fit AS (
            -- slope/intercept rationals rounded half-up in integer
            -- arithmetic (tie class); the x1e-12 unit cancels for
            -- beta, the intercept numerator carries one extra x1e-6
            SELECT CAST({_exact_mean_sql("(n * sxy - sx * sy)", "(n * sxx - sx * sx)", sum_scale=0, out_scale=4)} AS DOUBLE) AS beta,
                   CAST({_exact_mean_sql("(sy * sxx - sx * sxy)", "((n * sxx - sx * sx) * 1000000)", sum_scale=0, out_scale=4)} AS DOUBLE) AS log10_k
            FROM sums
        )
        SELECT decile, cutoff, CAST(tokens AS BIGINT) AS tokens,
               CAST(vocab AS BIGINT) AS vocab, beta, log10_k
        FROM pts CROSS JOIN fit ORDER BY decile
    """,
    "o15_multiset_ops": """
        SELECT 'except_all' AS op, l_returnflag, count(*) AS n_rows FROM (
            SELECT l_returnflag FROM lineitem WHERE year(l_shipdate) = 1997
            EXCEPT ALL
            SELECT l_returnflag FROM lineitem WHERE year(l_shipdate) = 1998
        ) GROUP BY l_returnflag
        UNION ALL
        SELECT 'intersect_all', l_returnflag, count(*) FROM (
            SELECT l_returnflag FROM lineitem WHERE year(l_shipdate) = 1997
            INTERSECT ALL
            SELECT l_returnflag FROM lineitem WHERE year(l_shipdate) = 1998
        ) GROUP BY l_returnflag
        ORDER BY op, l_returnflag
    """,
    "a28_cms_frequencies": """
        WITH rows_i AS (SELECT unnest([0, 1, 2, 3]) AS i),
        upd AS (
            SELECT i.i AS row_idx,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('cms' || CAST(i.i AS VARCHAR) || '|'
                               || CAST(user_id AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) % 1024 AS bucket
            FROM events CROSS JOIN rows_i i
            WHERE user_id IS NOT NULL
        ), cms AS (
            SELECT row_idx, bucket, count(*) AS cnt FROM upd GROUP BY 1, 2
        ), probes AS (
            SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
        ), ph AS (
            SELECT user_id, i.i AS row_idx,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('cms' || CAST(i.i AS VARCHAR) || '|'
                               || CAST(user_id AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) % 1024 AS bucket
            FROM probes CROSS JOIN rows_i i
        ), est AS (
            SELECT ph.user_id, min(COALESCE(cms.cnt, 0)) AS cms_est
            FROM ph LEFT JOIN cms USING (row_idx, bucket)
            GROUP BY 1
        ), exact AS (
            SELECT user_id, count(*) AS exact_n
            FROM events WHERE user_id IS NOT NULL GROUP BY 1
        )
        SELECT user_id, cms_est, exact_n FROM est JOIN exact USING (user_id)
    """,
    # Add-one bigram LM trained on the corpus; per-bigram log2-probs
    # rounded to 4 dp and DECIMAL-summed (order-independent), exactly
    # mirroring llm/text.py::ngram_cross_entropy.
    "text_ngram_entropy": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), w -> w <> '') AS w
            FROM documents
        ),
        uni AS (SELECT t.doc_id, tok FROM toks t, UNNEST(t.w) AS u(tok)),
        unic AS (SELECT tok, count(*) AS cu FROM uni GROUP BY 1),
        vocab AS (SELECT count(*) AS v FROM unic),
        bg AS (
            SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i + 1] AS bg
            FROM toks, UNNEST(range(1, len(w))) AS t(i)
            WHERE len(w) >= 2
        ),
        bgc AS (SELECT bg, count(*) AS cb FROM bg GROUP BY 1),
        scored AS (
            SELECT bg.doc_id,
                   CAST(round(log2((cb + 1.0) / (cu + v)), 4)
                        AS DECIMAL(18,4)) AS logp
            FROM bg
            JOIN bgc USING (bg)
            JOIN unic ON bg.w1 = unic.tok
            CROSS JOIN vocab
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               -- engine-exact 4-dp mean (integer half-up), mirrored
               -- from ngram_cross_entropy: -S/n ties at *.5e-4
               floor((2 * CAST(-sum(logp) * 10000 AS BIGINT) + count(*))
                     / (2 * count(*))) / 10000.0 AS h_bits
        FROM scored GROUP BY doc_id
    """,
    # 8-word duplicate windows (count > 1 corpus-wide) merged into
    # maximal spans with the same gaps-and-islands pass as Spark.
    "text_dup_spans": f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), w -> w <> '') AS w
            FROM documents
        ),
        sizes AS (SELECT doc_id, len(w) AS n_words FROM toks),
        win AS (
            SELECT doc_id, i AS s0,
                   md5(list_aggregate(w[i:i+7], 'string_agg', ' ')) AS h
            FROM toks, UNNEST(range(1, len(w) - 6)) AS t(i)
            WHERE len(w) >= 8
        ),
        dup_h AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1),
        marked AS (
            SELECT w.doc_id, w.s0, w.s0 + 7 AS e0
            FROM win w JOIN dup_h USING (h)
        ),
        isl AS (
            SELECT doc_id, s0, e0,
                   CASE WHEN max(e0) OVER prev IS NULL
                             OR s0 > max(e0) OVER prev + 1
                        THEN 1 ELSE 0 END AS new_island
            FROM marked
            WINDOW prev AS (PARTITION BY doc_id ORDER BY s0
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        isl2 AS (
            SELECT doc_id, s0, e0,
                   sum(new_island) OVER (PARTITION BY doc_id ORDER BY s0
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM isl
        ),
        spans AS (
            SELECT doc_id, island, min(s0) AS s, max(e0) AS e
            FROM isl2 GROUP BY 1, 2
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_dup_spans, sum(e - s + 1) AS dup_words
            FROM spans GROUP BY 1
        )
        SELECT z.doc_id, z.n_words,
               CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CAST(COALESCE(p.dup_words, 0) AS BIGINT) AS dup_words,
               CAST({_exact_mean_sql("COALESCE(p.dup_words, 0)", "greatest(z.n_words, 1)", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS dup_frac
        FROM sizes z LEFT JOIN per_doc p USING (doc_id)
    """,
    # One-sided containment over the shared 3-word shingle universe;
    # smaller set (ties: smaller id) reported as contained.
    "dedup_containment": f"""
        WITH {_SHINGLES_CTE}
        SELECT CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND id_a < id_b)
                    THEN id_a ELSE id_b END AS contained_id,
               CASE WHEN sa.n < sb.n OR (sa.n = sb.n AND id_a < id_b)
                    THEN id_b ELSE id_a END AS container_id,
               ((CASE WHEN CAST(inter AS HUGEINT) < 0 THEN -((2 * abs(CAST(inter AS HUGEINT)) * 10000 + (CAST(least(sa.n, sb.n) AS HUGEINT))) // (2 * (CAST(least(sa.n, sb.n) AS HUGEINT)))) ELSE ((2 * abs(CAST(inter AS HUGEINT)) * 10000 + (CAST(least(sa.n, sb.n) AS HUGEINT))) // (2 * (CAST(least(sa.n, sb.n) AS HUGEINT)))) END) / 10000.0) AS containment
        FROM pair_inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE inter / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.8
    """,
    # Exact-integer basis-point rates anchored on the most-constrained
    # source; md5 hash-bucket acceptance (the sampling family's rule).
    "sample_mixture_rates": """
        WITH counts AS (
            SELECT source, count(*) AS n,
                   CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2
                        ELSE 1 END AS w
            FROM documents GROUP BY 1
        ),
        anchor AS (
            SELECT n AS n_min, w AS w_min FROM counts
            ORDER BY n * 1.0 / w ASC, source ASC LIMIT 1
        ),
        rates AS (
            SELECT source, n AS n_docs,
                   least(10000, CAST(floor(
                       (10000 * w * n_min) * 1.0 / (w_min * n)
                   ) AS BIGINT)) AS rate_bp
            FROM counts CROSS JOIN anchor
        ),
        sampled AS (
            SELECT d.source, count(*) AS n_sampled
            FROM documents d JOIN rates r USING (source)
            WHERE list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(
                          string_split(substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8), ''),
                          c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                      (a, x) -> a * 16 + x) % 10000 < r.rate_bp
            GROUP BY 1
        )
        SELECT r.source, r.n_docs, r.rate_bp,
               CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled
        FROM rates r LEFT JOIN sampled s USING (source)
    """,
    # HLL registers replayed exactly: 56-bit md5 fold, top-8-bit
    # bucket via integer division, rank-of-first-set-bit via bin(),
    # harmonic denominator as an exact 2^49-scaled BIGINT.
    "a29_hll_distinct": """
        WITH hashed AS (
            SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 14), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) AS h
            FROM events WHERE user_id IS NOT NULL
        ),
        regs AS (
            SELECT CAST(h // 281474976710656 AS BIGINT) AS bucket,
                   max(CASE WHEN h % 281474976710656 = 0 THEN 49
                            ELSE 49 - length(bin(h % 281474976710656))
                       END) AS m_j
            FROM hashed GROUP BY 1
        ),
        agg AS (
            SELECT count(*) AS n_used,
                   CAST(sum(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS denom_used
            FROM regs
        ),
        wide AS (
            SELECT 256 AS m, n_used, 256 - n_used AS zeros,
                   CAST(denom_used
                        + (256 - n_used) * (CAST(1 AS BIGINT) << 49)
                        AS BIGINT) AS denom_scaled
            FROM agg
        ),
        est AS (
            SELECT m, n_used, zeros, denom_scaled,
                   CAST(round(
                       CASE WHEN (0.7213 / (1 + 1.079 / 256)) * 256 * 256
                                 * 562949953421312.0 / denom_scaled <= 2.5 * 256
                                 AND zeros > 0
                            THEN 256.0 * ln(256.0 / zeros)
                            ELSE (0.7213 / (1 + 1.079 / 256)) * 256 * 256
                                 * 562949953421312.0 / denom_scaled
                       END, 0) AS BIGINT) AS est_distinct
            FROM wide
        )
        SELECT e.m, e.n_used, e.zeros, e.denom_scaled, e.est_distinct,
               x.exact_distinct
        FROM est e CROSS JOIN (
            SELECT count(DISTINCT user_id) AS exact_distinct
            FROM events WHERE user_id IS NOT NULL
        ) x
    """,
    # Per-group KMV: k smallest distinct hashes per group, integer
    # estimator; mirrors kmv_candidates_by's window top-k.
    "a36_kmv_by_type": """
        WITH hashed AS (
            SELECT DISTINCT event_type,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5(CAST(user_id AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) AS h
            FROM events WHERE user_id IS NOT NULL
        ),
        topk AS (
            SELECT event_type, h FROM (
                SELECT event_type, h,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY h) AS rn
                FROM hashed
            ) WHERE rn <= 256
        ),
        est AS (
            SELECT event_type,
                   CASE WHEN count(*) < 256 THEN count(*)
                        WHEN max(h) > 0
                        THEN CAST(1095216660480 AS BIGINT) // max(h)
                   END AS est_distinct
            FROM topk GROUP BY 1
        )
        SELECT e.event_type, e.est_distinct, x.exact_distinct
        FROM est e JOIN (
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_distinct
            FROM events WHERE user_id IS NOT NULL GROUP BY 1
        ) x USING (event_type)
    """,
    # Robust MAD outlier screen: two quantile passes + threshold scan.
    "a35_mad_outliers": """
        WITH ev AS (
            SELECT event_type, value FROM events WHERE value IS NOT NULL
        ),
        med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM ev GROUP BY 1
        ),
        mad AS (
            SELECT e.event_type, max(m.med) AS med,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM ev e JOIN med m USING (event_type) GROUP BY 1
        )
        SELECT e.event_type,
               round(max(m.med), 4) AS median,
               round(max(m.mad), 4) AS mad,
               count(*) AS n,
               -- round-ok: quantize-before-compare convention (kills the 1-ulp percentile class)
               CAST(sum(CASE WHEN round(abs(e.value - m.med), 6) > round(3 * 1.4826 * m.mad, 6)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               -- round-ok: same quantize-before-compare; max/min select stored 2-dp values
               round(max(CASE WHEN round(abs(e.value - m.med), 6) > round(3 * 1.4826 * m.mad, 6)
                              THEN e.value END), 4) AS worst_high,
               -- round-ok: same quantize-before-compare; max/min select stored 2-dp values
               round(min(CASE WHEN round(abs(e.value - m.med), 6) > round(3 * 1.4826 * m.mad, 6)
                              THEN e.value END), 4) AS worst_low
        FROM ev e JOIN mad m USING (event_type)
        GROUP BY 1
    """,
    # KMV set algebra: per-segment ORDER BY h LIMIT k sketches, union
    # sketch from merged candidates, intersection by
    # inclusion-exclusion; same integer estimator as a21.
    "a34_kmv_set_ops": """
        WITH hashed AS (
            SELECT DISTINCT event_type,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5(CAST(user_id AS VARCHAR)), 1, 8), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) AS h
            FROM events
            WHERE user_id IS NOT NULL AND event_type IN ('view', 'click')
        ),
        ca AS (SELECT h FROM hashed WHERE event_type = 'view'
               ORDER BY h LIMIT 256),
        cb AS (SELECT h FROM hashed WHERE event_type = 'click'
               ORDER BY h LIMIT 256),
        cu AS (SELECT DISTINCT h FROM (
                   SELECT h FROM ca UNION ALL SELECT h FROM cb)
               ORDER BY h LIMIT 256),
        ea AS (SELECT CASE WHEN count(*) < 256 THEN count(*)
                           WHEN max(h) > 0
                           THEN CAST(1095216660480 AS BIGINT) // max(h)
                      END AS est_view FROM ca),
        eb AS (SELECT CASE WHEN count(*) < 256 THEN count(*)
                           WHEN max(h) > 0
                           THEN CAST(1095216660480 AS BIGINT) // max(h)
                      END AS est_click FROM cb),
        eu AS (SELECT CASE WHEN count(*) < 256 THEN count(*)
                           WHEN max(h) > 0
                           THEN CAST(1095216660480 AS BIGINT) // max(h)
                      END AS est_union FROM cu),
        v AS (SELECT DISTINCT user_id FROM events
              WHERE user_id IS NOT NULL AND event_type = 'view'),
        c AS (SELECT DISTINCT user_id FROM events
              WHERE user_id IS NOT NULL AND event_type = 'click'),
        ex AS (
            SELECT CAST(count(v.user_id) AS BIGINT) AS exact_view,
                   CAST(count(c.user_id) AS BIGINT) AS exact_click,
                   CAST(count(*) AS BIGINT) AS exact_union,
                   CAST(sum(CASE WHEN v.user_id IS NOT NULL
                                  AND c.user_id IS NOT NULL
                            THEN 1 END) AS BIGINT) AS exact_inter
            FROM v FULL JOIN c USING (user_id)
        )
        SELECT ea.est_view, eb.est_click, eu.est_union,
               CAST(greatest(0, ea.est_view + eb.est_click - eu.est_union)
                    AS BIGINT) AS est_inter,
               ex.exact_view, ex.exact_click, ex.exact_union, ex.exact_inter
        FROM ea, eb, eu, ex
    """,
    # Rolling 7-day HLL: per-day registers MAX-merged across the
    # window — identical replay of the mergeable-sketch math.
    "a33_hll_rolling_distinct": """
        WITH ev AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
            FROM events WHERE user_id IS NOT NULL
        ),
        hashed AS (
            SELECT day,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 14), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) AS h
            FROM ev
        ),
        daily_regs AS (
            SELECT day, CAST(h // 281474976710656 AS BIGINT) AS bucket,
                   max(CASE WHEN h % 281474976710656 = 0 THEN 49
                            ELSE 49 - length(bin(h % 281474976710656))
                       END) AS m_j
            FROM hashed GROUP BY 1, 2
        ),
        days AS (SELECT DISTINCT day FROM daily_regs),
        merged AS (
            SELECT d.day, r.bucket, max(r.m_j) AS m_j
            FROM days d JOIN daily_regs r
              ON r.day <= d.day AND r.day >= d.day - 6
            GROUP BY 1, 2
        ),
        agg AS (
            SELECT day, count(*) AS n_used,
                   CAST(sum(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS denom_used
            FROM merged GROUP BY 1
        ),
        est AS (
            SELECT day,
                   CAST(round(
                       CASE WHEN (0.7213 / (1 + 1.079 / 256)) * 256 * 256
                                 * 562949953421312.0
                                 / (denom_used + (256 - n_used)
                                    * (CAST(1 AS BIGINT) << 49)) <= 2.5 * 256
                                 AND 256 - n_used > 0
                            THEN 256.0 * ln(256.0 / (256 - n_used))
                            ELSE (0.7213 / (1 + 1.079 / 256)) * 256 * 256
                                 * 562949953421312.0
                                 / (denom_used + (256 - n_used)
                                    * (CAST(1 AS BIGINT) << 49))
                       END, 0) AS BIGINT) AS est_distinct
            FROM agg
        ),
        pairs AS (SELECT DISTINCT day, user_id FROM ev),
        exact AS (
            SELECT d.day, count(DISTINCT p.user_id) AS exact_distinct
            FROM days d JOIN pairs p
              ON p.day <= d.day AND p.day >= d.day - 6
            GROUP BY 1
        )
        SELECT e.day, e.est_distinct, x.exact_distinct
        FROM est e JOIN exact x USING (day)
    """,
    # SES closed form: weighted terms rounded to 6 dp, DECIMAL-summed.
    "w13_ses_forecast": """
        WITH daily AS (
            SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        seq AS (
            SELECT event_type, day, y,
                   row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
            FROM daily
        ),
        tmax AS (
            SELECT event_type, max(t) AS tt, max(day) AS last_day
            FROM seq GROUP BY 1
        ),
        terms AS (
            SELECT s.event_type, m.tt, m.last_day,
                   CAST(round(
                       CASE WHEN s.t = 1 THEN s.y * pow(0.7, m.tt - 1)
                            ELSE s.y * 0.3 * pow(0.7, m.tt - s.t)
                       END, 6) AS DECIMAL(18,6)) AS term
            FROM seq s JOIN tmax m USING (event_type)
        )
        SELECT event_type, CAST(max(tt) AS BIGINT) AS n_days,
               max(last_day) AS last_day,
               CAST(round(sum(term), 4) AS DOUBLE) AS forecast
        FROM terms GROUP BY 1
    """,
    # 10% salted-hash sample (the sampling family's md5 rule) vs exact
    # interpolated percentiles.
    "a31_sampled_percentiles": """
        WITH ev AS (
            SELECT event_id, event_type, value FROM events
            WHERE value IS NOT NULL
        ),
        samp AS (
            SELECT event_type, value FROM ev
            WHERE list_reduce(list_prepend(CAST(0 AS BIGINT),
                      list_transform(
                          string_split(substr(md5('pct|' || CAST(event_id AS VARCHAR)), 1, 8), ''),
                          c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                      (a, x) -> a * 16 + x) % 100 < 10
        ),
        exact AS (
            SELECT event_type, count(*) AS n_full,
                   round(quantile_cont(value, 0.5), 4)  AS p50_exact,
                   round(quantile_cont(value, 0.95), 4) AS p95_exact
            FROM ev GROUP BY 1
        ),
        est AS (
            SELECT event_type, count(*) AS n_sample,
                   round(quantile_cont(value, 0.5), 4)  AS p50_sample,
                   round(quantile_cont(value, 0.95), 4) AS p95_sample
            FROM samp GROUP BY 1
        )
        SELECT e.event_type, e.n_full, e.p50_exact, e.p95_exact,
               s.n_sample, s.p50_sample, s.p95_sample
        FROM exact e JOIN est s USING (event_type)
    """,
    # PSI drift: 15-day reference window defines per-group equal-width
    # bins; both periods re-binned on those breakpoints; per-bin terms
    # rounded to 6 dp and DECIMAL-summed (order-independent).
    "a32_psi_drift": """
        WITH ev AS (
            SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
            WHERE value IS NOT NULL
        ),
        cutoff AS (
            SELECT CAST(min(CAST(ts AS DATE)) + 15 AS DATE) AS cut FROM ev
        ),
        ref AS (
            SELECT event_type, value FROM ev, cutoff
            WHERE CAST(ts AS DATE) < cut
        ),
        cur AS (
            SELECT event_type, value FROM ev, cutoff
            WHERE CAST(ts AS DATE) >= cut
        ),
        bounds AS (
            SELECT event_type, min(value) AS vmin, max(value) AS vmax
            FROM ref GROUP BY 1
        ),
        rb AS (
            SELECT r.event_type,
                   CASE WHEN vmax = vmin THEN 0
                        ELSE CAST(greatest(0, least(9,
                             floor((value - vmin) * 10 / (vmax - vmin)))) AS INT)
                   END AS bin,
                   count(*) AS n
            FROM ref r JOIN bounds USING (event_type) GROUP BY 1, 2
        ),
        cb AS (
            SELECT c.event_type,
                   CASE WHEN vmax = vmin THEN 0
                        ELSE CAST(greatest(0, least(9,
                             floor((value - vmin) * 10 / (vmax - vmin)))) AS INT)
                   END AS bin,
                   count(*) AS n
            FROM cur c JOIN bounds USING (event_type) GROUP BY 1, 2
        ),
        tot_r AS (SELECT event_type, sum(n) AS nr FROM rb GROUP BY 1),
        tot_c AS (SELECT event_type, sum(n) AS nc FROM cb GROUP BY 1),
        spine AS (
            SELECT event_type, CAST(i AS INT) AS bin
            FROM bounds, UNNEST(range(0, 10)) AS t(i)
        ),
        j AS (
            SELECT s.event_type, s.bin,
                   COALESCE(rb.n, 0) AS n_ref, COALESCE(cb.n, 0) AS n_cur,
                   tr.nr, tc.nc
            FROM spine s
            LEFT JOIN rb ON s.event_type = rb.event_type AND s.bin = rb.bin
            LEFT JOIN cb ON s.event_type = cb.event_type AND s.bin = cb.bin
            JOIN tot_r tr ON s.event_type = tr.event_type
            JOIN tot_c tc ON s.event_type = tc.event_type
        ),
        terms AS (
            SELECT event_type, nr, nc,
                   CAST(round(
                       (greatest(n_ref / CAST(nr AS DOUBLE), 0.0001)
                        - greatest(n_cur / CAST(nc AS DOUBLE), 0.0001))
                       * ln(greatest(n_ref / CAST(nr AS DOUBLE), 0.0001)
                            / greatest(n_cur / CAST(nc AS DOUBLE), 0.0001)),
                   6) AS DECIMAL(18,6)) AS t
            FROM j
        )
        SELECT event_type, CAST(max(nr) AS BIGINT) AS n_ref,
               CAST(max(nc) AS BIGINT) AS n_cur,
               CAST(round(sum(t), 4) AS DOUBLE) AS psi
        FROM terms GROUP BY 1
    """,
    "text_bpe_merges": _bpe_sql(8, _BPE_MERGES_FINAL),
    "text_bpe_top_tokens": _bpe_sql(8, _BPE_TOKENS_FINAL),
    # Per-group HLL: identical register replay, grouped by event_type.
    "a30_hll_by_type": """
        WITH hashed AS (
            SELECT event_type,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('hll|' || CAST(user_id AS VARCHAR)), 1, 14), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) AS h
            FROM events WHERE user_id IS NOT NULL
        ),
        regs AS (
            SELECT event_type,
                   CAST(h // 281474976710656 AS BIGINT) AS bucket,
                   max(CASE WHEN h % 281474976710656 = 0 THEN 49
                            ELSE 49 - length(bin(h % 281474976710656))
                       END) AS m_j
            FROM hashed GROUP BY 1, 2
        ),
        agg AS (
            SELECT event_type, count(*) AS n_used,
                   CAST(sum(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS denom_used
            FROM regs GROUP BY 1
        ),
        est AS (
            SELECT event_type, n_used, 256 - n_used AS zeros,
                   CAST(round(
                       CASE WHEN (0.7213 / (1 + 1.079 / 256)) * 256 * 256
                                 * 562949953421312.0
                                 / (denom_used + (256 - n_used)
                                    * (CAST(1 AS BIGINT) << 49)) <= 2.5 * 256
                                 AND 256 - n_used > 0
                            THEN 256.0 * ln(256.0 / (256 - n_used))
                            ELSE (0.7213 / (1 + 1.079 / 256)) * 256 * 256
                                 * 562949953421312.0
                                 / (denom_used + (256 - n_used)
                                    * (CAST(1 AS BIGINT) << 49))
                       END, 0) AS BIGINT) AS est_distinct
            FROM agg
        )
        SELECT e.event_type, e.n_used, e.zeros, e.est_distinct, x.exact_distinct
        FROM est e JOIN (
            SELECT event_type, count(DISTINCT user_id) AS exact_distinct
            FROM events WHERE user_id IS NOT NULL GROUP BY 1
        ) x USING (event_type)
    """,
    # r7: interval-overlap join — the oracle replays the QUADRATIC
    # per-user formulation directly; Spark's day-bucketed candidate
    # decomposition must be lossless against it
    "j18_interval_overlap": """
        WITH iv AS (
            SELECT event_id, user_id, ts AS s,
                   ts + to_minutes(CAST(floor(value) AS BIGINT)) AS e
            FROM events
        )
        SELECT a.user_id AS user_id, count(*) AS n_overlapping_pairs
        FROM iv a JOIN iv b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
        WHERE a.s <= b.e AND b.s <= a.e
        GROUP BY 1
        ORDER BY n_overlapping_pairs DESC, user_id ASC
        LIMIT 10
    """,
    "a37_weighted_median": """
        WITH cum AS (
            SELECT l_returnflag, l_extendedprice,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                       PARTITION BY l_returnflag ORDER BY l_extendedprice
                       RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                       PARTITION BY l_returnflag) AS tw
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(min(l_extendedprice) AS DOUBLE) AS weighted_median_price
        FROM cum
        WHERE 2 * cw >= tw
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "a38_gini_concentration": """
        WITH rev AS (
            SELECT c_nationkey, o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey, o_custkey
        ),
        ranked AS (
            SELECT c_nationkey, x,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY x, o_custkey) AS i
            FROM rev
        )
        SELECT c_nationkey,
               count(*) AS n_customers,
               CAST(round(
                   CAST(2 * SUM(i * x) AS DOUBLE) / CAST(COUNT(*) * SUM(x) AS DOUBLE)
                   - (COUNT(*) + 1.0) / COUNT(*), 6) AS DOUBLE) AS gini
        FROM ranked
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    # Funnel replayed as a chain of min(ts) CTEs — the greedy-earliest
    # fold on the Spark side advances to the EARLIEST qualifying
    # next-step event and never resets, which is exactly "min(ts)
    # strictly after the previous step's match, within the window".
    "funnel_windowed_conversion": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click'
              AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 7 DAY
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase'
              AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL 7 DAY
            GROUP BY e.user_id
        ), agg AS (
            SELECT (SELECT count(*) FROM s1) AS u1,
                   (SELECT count(*) FROM s2) AS u2,
                   (SELECT count(*) FROM s3) AS u3
        )
        SELECT CAST(1 AS INTEGER) AS step, 'view' AS step_name,
               CAST(u1 AS BIGINT) AS users,
               CAST(1.0 AS DOUBLE) AS conv_from_prev FROM agg
        UNION ALL
        SELECT CAST(2 AS INTEGER), 'click', CAST(u2 AS BIGINT),
               CAST(((CASE WHEN CAST(u2 AS HUGEINT) < 0 THEN -((2 * abs(CAST(u2 AS HUGEINT)) * 1000000 + (CAST(nullif(u1, 0) AS HUGEINT))) // (2 * (CAST(nullif(u1, 0) AS HUGEINT)))) ELSE ((2 * abs(CAST(u2 AS HUGEINT)) * 1000000 + (CAST(nullif(u1, 0) AS HUGEINT))) // (2 * (CAST(nullif(u1, 0) AS HUGEINT)))) END) / 1000000.0) AS DOUBLE) FROM agg
        UNION ALL
        SELECT CAST(3 AS INTEGER), 'purchase', CAST(u3 AS BIGINT),
               CAST(((CASE WHEN CAST(u3 AS HUGEINT) < 0 THEN -((2 * abs(CAST(u3 AS HUGEINT)) * 1000000 + (CAST(nullif(u2, 0) AS HUGEINT))) // (2 * (CAST(nullif(u2, 0) AS HUGEINT)))) ELSE ((2 * abs(CAST(u3 AS HUGEINT)) * 1000000 + (CAST(nullif(u2, 0) AS HUGEINT))) // (2 * (CAST(nullif(u2, 0) AS HUGEINT)))) END) / 1000000.0) AS DOUBLE) FROM agg
    """,
    # Same exact-sufficient-statistics formulation as the Spark side:
    # exact bigint/DECIMAL sums, one cast to DOUBLE each, identical
    # closed-form arithmetic.
    "trend_by_event_type": f"""
        WITH pts AS (
            SELECT event_type,
                   CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                        AS BIGINT) AS x,
                   CAST(value AS DECIMAL(18,6)) AS y
            FROM events
            WHERE value IS NOT NULL AND ts IS NOT NULL
        ), s AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   SUM(x) AS sx,
                   SUM(x * x) AS sxx,
                   SUM(y) AS sy,
                   SUM(x * y) AS sxy,
                   SUM(y * y) AS syy
            FROM pts GROUP BY event_type
        )
        SELECT event_type,
               n,
               CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
                    ELSE CAST({_exact_mean_sql("(n * sxy - sx * sy)", "(n * sxx - sx * sx)", sum_scale=6, out_scale=6)} AS DOUBLE)
                    END AS slope_per_day,
               CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
                    ELSE CAST({_exact_mean_sql("(sy * sxx - sx * sxy)", "(n * sxx - sx * sx)", sum_scale=6, out_scale=4)} AS DOUBLE)
                    END AS intercept,
               CAST(round(CAST((n * sxy - sx * sy) AS DOUBLE)
                          / sqrt(CAST((n * sxx - sx * sx) AS DOUBLE)
                                 * CAST((n * syy - sy * sy) AS DOUBLE)), 6)
                    AS DOUBLE) AS r
        FROM s
        ORDER BY event_type
    """,
    # min-ts-chain funnel replay (as funnel_windowed_conversion), then
    # exact-bigint microsecond durations; quantile_cont pairs with
    # Spark's percentile (same linear interpolation).
    "funnel_time_to_convert": """
        WITH s1 AS (
            SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click'
              AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 7 DAY
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase'
              AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL 7 DAY
            GROUP BY e.user_id
        ), durations AS (
            SELECT epoch_us(s3.t) - epoch_us(s1.t) AS us
            FROM s3 JOIN s1 ON s3.user_id = s1.user_id
        )
        SELECT count(*) AS n_converted,
               ((CASE WHEN CAST(sum(us) * 1 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(us) * 1 AS HUGEINT)) * 10000 + (CAST(count(*) AS HUGEINT) * 3600000000)) // (2 * (CAST(count(*) AS HUGEINT) * 3600000000))) ELSE ((2 * abs(CAST(sum(us) * 1 AS HUGEINT)) * 10000 + (CAST(count(*) AS HUGEINT) * 3600000000)) // (2 * (CAST(count(*) AS HUGEINT) * 3600000000))) END) / 10000.0) AS avg_hours,
               CAST(round(quantile_cont(us, 0.5) / 3.6e9, 4)
                    AS DOUBLE) AS p50_hours,
               CAST(round(quantile_cont(us, 0.95) / 3.6e9, 4)
                    AS DOUBLE) AS p95_hours
        FROM durations
    """,
    # Identical formulation both engines: lead() sequence pairs,
    # exact-bigint counts, one final double division.
    "w12_event_transitions": """
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type AS from_type,
               next_type AS to_type,
               count(*) AS n,
               ((CASE WHEN CAST(count(*) AS HUGEINT) < 0 THEN -((2 * abs(CAST(count(*) AS HUGEINT)) * 1000000 + (CAST(sum(count(*)) OVER (PARTITION BY event_type) AS HUGEINT))) // (2 * (CAST(sum(count(*)) OVER (PARTITION BY event_type) AS HUGEINT)))) ELSE ((2 * abs(CAST(count(*) AS HUGEINT)) * 1000000 + (CAST(sum(count(*)) OVER (PARTITION BY event_type) AS HUGEINT))) // (2 * (CAST(sum(count(*)) OVER (PARTITION BY event_type) AS HUGEINT)))) END) / 1000000.0) AS p
        FROM seq
        WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
        ORDER BY from_type, to_type
    """,
    # Per-column aggregates, one branch per column (the oracle may
    # re-scan; the Spark side is a single aggregate + explode).
    # the approx profiler: same base stats, distinct estimates from
    # the repo's md5-HLL registers (b=8), replayed register-exact —
    # same fold as a29/a30.
    "profile_documents_approx": """
        WITH melted AS (
            SELECT 'doc_id' AS col_name, CAST(doc_id AS VARCHAR) AS value FROM documents
            UNION ALL SELECT 'text', text FROM documents
            UNION ALL SELECT 'lang', lang FROM documents
            UNION ALL SELECT 'source', source FROM documents
            UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
        ),
        hashed AS (
            SELECT col_name,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                           string_split(substr(md5('hll|' || value), 1, 14), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x) AS h
            FROM melted WHERE value IS NOT NULL
        ),
        regs AS (
            SELECT col_name,
                   CAST(h // 281474976710656 AS BIGINT) AS bucket,
                   max(CASE WHEN h % 281474976710656 = 0 THEN 49
                            ELSE 49 - length(bin(h % 281474976710656))
                       END) AS m_j
            FROM hashed GROUP BY 1, 2
        ),
        agg AS (
            SELECT col_name, count(*) AS n_used,
                   CAST(sum(CAST(1 AS BIGINT) << (49 - m_j)) AS BIGINT) AS denom_used
            FROM regs GROUP BY 1
        ),
        est AS (
            SELECT col_name,
                   CAST(round(
                       CASE WHEN (0.7213 / (1 + 1.079 / 256)) * 256 * 256
                                 * 562949953421312.0
                                 / (denom_used + (256 - n_used)
                                    * (CAST(1 AS BIGINT) << 49)) <= 2.5 * 256
                                 AND 256 - n_used > 0
                            THEN 256.0 * ln(256.0 / (256 - n_used))
                            ELSE (0.7213 / (1 + 1.079 / 256)) * 256 * 256
                                 * 562949953421312.0
                                 / (denom_used + (256 - n_used)
                                    * (CAST(1 AS BIGINT) << 49))
                       END, 0) AS BIGINT) AS est_distinct
            FROM agg
        ),
        base AS (
            SELECT 'doc_id' AS col_name, count(*) AS n_rows,
                   count(doc_id) AS n_non_null,
                   CAST(min(doc_id) AS VARCHAR) AS min_value,
                   CAST(max(doc_id) AS VARCHAR) AS max_value FROM documents
            UNION ALL
            SELECT 'text', count(*), count(text),
                   CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'lang', count(*), count(lang),
                   CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'source', count(*), count(source),
                   CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(*), count(n_chars),
                   CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
            FROM documents
        )
        SELECT b.col_name, b.n_rows, b.n_non_null, e.est_distinct,
               b.min_value, b.max_value
        FROM base b LEFT JOIN est e USING (col_name)
        ORDER BY col_name
    """,
    "profile_documents": """
        SELECT 'doc_id' AS col_name, count(*) AS n_rows,
               count(doc_id) AS n_non_null, count(DISTINCT doc_id) AS n_distinct,
               CAST(min(doc_id) AS VARCHAR) AS min_value,
               CAST(max(doc_id) AS VARCHAR) AS max_value FROM documents
        UNION ALL
        SELECT 'text', count(*), count(text), count(DISTINCT text),
               CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'lang', count(*), count(lang), count(DISTINCT lang),
               CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'source', count(*), count(source), count(DISTINCT source),
               CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'n_chars', count(*), count(n_chars), count(DISTINCT n_chars),
               CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        FROM documents
    """,
    # r9: gaps-and-islands replay of Spark's session_window semantics
    # (session end = last event + gap; an event exactly at the previous
    # window's end starts a NEW session, hence >= on the gap test)
    "t4_session_window": """
        WITH e AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             >= INTERVAL 10 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
        ), s AS (
            SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM e
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 10 MINUTE AS session_end,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS total_value
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    # r9 (reworked r11): Zipf fit — ×10⁶-scaled BIGINT log sums and an
    # integer-arithmetic slope/intercept round (tie class), same
    # discipline as text_heaps_law
    "text_zipf_fit": f"""
        WITH w AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ), counts AS (
            SELECT w, count(*) AS freq FROM w WHERE w <> '' GROUP BY w
        ), top AS (
            SELECT freq, row_number() OVER (ORDER BY freq DESC, w ASC) AS rank
            FROM counts ORDER BY freq DESC, w ASC LIMIT 200
        ), pts AS (
            SELECT CAST(round(log10(rank) * 1000000, 0) AS BIGINT) AS x,
                   CAST(round(log10(freq) * 1000000, 0) AS BIGINT) AS y
            FROM top
        ), s AS (
            SELECT count(*) AS n_terms, CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
                   CAST(sum(x*x) AS HUGEINT) AS sxx, CAST(sum(x*y) AS HUGEINT) AS sxy
            FROM pts
        )
        SELECT n_terms,
               CAST({_exact_mean_sql("(n * sxy - sx * sy)", "(n * sxx - sx * sx)", sum_scale=0, out_scale=4)} AS DOUBLE) AS zipf_slope,
               CAST({_exact_mean_sql("(sy * sxx - sx * sxy)", "((n * sxx - sx * sx) * 1000000)", sum_scale=0, out_scale=4)} AS DOUBLE)
                 AS log10_c
        FROM s
    """,
    # r9: HRW replay — the md5-fold tournament per (doc, shard), argmax
    # via (hash DESC, shard DESC) row_number matching Spark's
    # array_max-over-structs tie order
    "sample_rendezvous_shards": """
        WITH g AS (
            SELECT doc_id, CAST(s AS BIGINT) AS s, doc_id || ':' || s AS key
            FROM documents, (SELECT unnest(range(9)) AS s)
        ), h AS (
            SELECT doc_id, s,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(substr(md5(key), 1, 8), ''),
                       c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, b) -> a * 16 + b) AS h
            FROM g
        ), a8 AS (
            SELECT doc_id, s AS shard8 FROM (
                SELECT doc_id, s, row_number() OVER (
                    PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
                FROM h WHERE s < 8
            ) WHERE rn = 1
        ), a9 AS (
            SELECT doc_id, s AS shard9 FROM (
                SELECT doc_id, s, row_number() OVER (
                    PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
                FROM h
            ) WHERE rn = 1
        )
        SELECT shard8 AS shard, count(*) AS n_docs,
               CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved,
               min(a8.doc_id) AS min_doc, max(a8.doc_id) AS max_doc
        FROM a8 JOIN a9 USING (doc_id)
        GROUP BY shard8 ORDER BY shard8
    """,
    # r9: two-sample KS — distinct-value cumulative ECDFs, same
    # 15-day period split as the PSI oracle
    "a42_ks_drift": """
        WITH ev AS (
            SELECT value, ts FROM events WHERE value IS NOT NULL
        ), cut AS (
            SELECT min(CAST(ts AS DATE)) + 15 AS c FROM ev
        ), flagged AS (
            SELECT value, CASE WHEN CAST(ts AS DATE) < (SELECT c FROM cut)
                               THEN 1 ELSE 0 END AS is_ref
            FROM ev
        ), per_val AS (
            SELECT value, sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
            FROM flagged GROUP BY value
        ), cum AS (
            SELECT value,
                   sum(n_ref) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c_ref,
                   sum(n_cur) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c_cur
            FROM per_val
        ), tot AS (
            SELECT sum(n_ref) AS N_ref, sum(n_cur) AS N_cur FROM per_val
        )
        SELECT CAST(N_ref AS BIGINT) AS n_ref, CAST(N_cur AS BIGINT) AS n_cur,
               ((CASE WHEN CAST(max(abs(CAST(c_ref AS HUGEINT) * N_cur - CAST(c_cur AS HUGEINT) * N_ref)) AS HUGEINT) < 0 THEN -((2 * abs(CAST(max(abs(CAST(c_ref AS HUGEINT) * N_cur - CAST(c_cur AS HUGEINT) * N_ref)) AS HUGEINT)) * 1000000 + (CAST(CAST(N_ref AS HUGEINT) * N_cur AS HUGEINT))) // (2 * (CAST(CAST(N_ref AS HUGEINT) * N_cur AS HUGEINT)))) ELSE ((2 * abs(CAST(max(abs(CAST(c_ref AS HUGEINT) * N_cur - CAST(c_cur AS HUGEINT) * N_ref)) AS HUGEINT)) * 1000000 + (CAST(CAST(N_ref AS HUGEINT) * N_cur AS HUGEINT))) // (2 * (CAST(CAST(N_ref AS HUGEINT) * N_cur AS HUGEINT)))) END) / 1000000.0) AS ks_stat,
               ((CASE WHEN CAST(max(abs(CAST(c_ref AS HUGEINT) * N_cur - CAST(c_cur AS HUGEINT) * N_ref)) AS HUGEINT) < 0 THEN -((2 * abs(CAST(max(abs(CAST(c_ref AS HUGEINT) * N_cur - CAST(c_cur AS HUGEINT) * N_ref)) AS HUGEINT)) * 1000000 + (CAST(CAST(N_ref AS HUGEINT) * N_cur AS HUGEINT))) // (2 * (CAST(CAST(N_ref AS HUGEINT) * N_cur AS HUGEINT)))) ELSE ((2 * abs(CAST(max(abs(CAST(c_ref AS HUGEINT) * N_cur - CAST(c_cur AS HUGEINT) * N_ref)) AS HUGEINT)) * 1000000 + (CAST(CAST(N_ref AS HUGEINT) * N_cur AS HUGEINT))) // (2 * (CAST(CAST(N_ref AS HUGEINT) * N_cur AS HUGEINT)))) END) / 1000000.0)
                 > 1.358 * sqrt((N_ref + N_cur)
                                / (CAST(N_ref AS DOUBLE) * N_cur)) AS reject_95
        FROM cum, tot
        GROUP BY N_ref, N_cur
    """,
    # r9: Cramér's V — exact contingency counts, per-cell chi-square
    # terms rounded then DECIMAL-summed (the repo's float convention)
    "a43_cramers_v": """
        WITH cells AS (
            SELECT o_orderpriority AS p, o_orderstatus AS s, count(*) AS n_cell
            FROM orders GROUP BY 1, 2
        ), rowt AS (SELECT p, sum(n_cell) AS n_row FROM cells GROUP BY p),
        colt AS (SELECT s, sum(n_cell) AS n_col FROM cells GROUP BY s),
        tot AS (
            SELECT sum(n_cell) AS n, count(DISTINCT p) AS r,
                   count(DISTINCT s) AS c
            FROM cells
        ), terms AS (
            SELECT n, r, c,
                   CAST(round(pow(n_cell - n_row * n_col / n, 2)
                              / (n_row * n_col / n), 6) AS DECIMAL(18,6)) AS t
            FROM cells JOIN rowt USING (p) JOIN colt USING (s), tot
        ), agg AS (
            SELECT n, r, c, CAST(round(sum(t), 4) AS DOUBLE) AS chi2
            FROM terms GROUP BY n, r, c
        )
        SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_rows,
               CAST(c AS BIGINT) AS n_cols, chi2,
               round(sqrt(chi2 / (n * least(r - 1, c - 1))), 4) AS cramers_v
        FROM agg
    """,
    # r9: ratio-margin bitext mining replay — rounded-DECIMAL cosines,
    # degree = exact decimal top-4 sum / 4.0, ties on target/query id
    "embed_bitext_margin": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id % 2 = 1 AND vec_id < 200
        ), c AS (
            SELECT vec_id AS target_id, embedding AS cv FROM embeddings
            WHERE vec_id % 2 = 0
        ), pairs AS (
            SELECT q.query_id, c.target_id,
                   CAST(round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4)
                        AS DECIMAL(10,4)) AS cos
            FROM c CROSS JOIN q
        ), dq AS (
            SELECT query_id, sum(cos) / 4.0 AS deg_q FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, target_id ASC) AS rn
                FROM pairs
            ) WHERE rn <= 4 GROUP BY query_id
        ), dt AS (
            SELECT target_id, sum(cos) / 4.0 AS deg_t FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY target_id ORDER BY cos DESC, query_id ASC) AS rn
                FROM pairs
            ) WHERE rn <= 4 GROUP BY target_id
        ), marg AS (
            SELECT p.query_id, p.target_id, p.cos,
                   round(p.cos / ((deg_q + deg_t) / 2.0), 4) AS margin
            FROM pairs p JOIN dq USING (query_id) JOIN dt USING (target_id)
        )
        SELECT query_id, target_id AS match_id, CAST(cos AS DOUBLE) AS cosine,
               margin
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY margin DESC, target_id ASC) AS rn
            FROM marg
        ) WHERE rn = 1
        ORDER BY query_id
    """,
    # r9: the at-scale margin-mining twin — SRP-bucket candidates
    # (same deterministic projection replay as embed_srp_ann), margin
    # degrees over the candidate lists
    "embed_bitext_margin_bucketed": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv,
                   {_srp_bucket('embeddings')} AS bucket
            FROM embeddings WHERE vec_id % 2 = 1
        ), c AS (
            SELECT vec_id AS target_id, embedding AS cv,
                   {_srp_bucket('embeddings')} AS bucket
            FROM embeddings WHERE vec_id % 2 = 0
        ), pairs AS (
            SELECT q.query_id, c.target_id,
                   CAST(round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4)
                        AS DECIMAL(10,4)) AS cos
            FROM c JOIN q ON c.bucket = q.bucket
        ), dq AS (
            SELECT query_id, sum(cos) / 4.0 AS deg_q FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, target_id ASC) AS rn
                FROM pairs
            ) WHERE rn <= 4 GROUP BY query_id
        ), dt AS (
            SELECT target_id, sum(cos) / 4.0 AS deg_t FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY target_id ORDER BY cos DESC, query_id ASC) AS rn
                FROM pairs
            ) WHERE rn <= 4 GROUP BY target_id
        ), marg AS (
            SELECT p.query_id, p.target_id, p.cos,
                   round(p.cos / ((deg_q + deg_t) / 2.0), 4) AS margin
            FROM pairs p JOIN dq USING (query_id) JOIN dt USING (target_id)
        )
        SELECT query_id, target_id AS match_id, CAST(cos AS DOUBLE) AS cosine,
               margin
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY margin DESC, target_id ASC) AS rn
            FROM marg
        ) WHERE rn = 1
        ORDER BY query_id
    """,
    # r9: GPT-style packing — per-source cumulative token placement,
    # sequence id = floor(start / 2048)
    "sample_sequence_packing": """
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                        AS BIGINT) AS n_tok
            FROM documents
        ), placed AS (
            SELECT source, doc_id, n_tok,
                   sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tok AS s,
                   sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS e
            FROM toks
        ), seqd AS (
            SELECT source, n_tok,
                   CAST(floor(s / 2048) AS BIGINT) AS seq_id,
                   CASE WHEN floor((e - 1) / 2048) <> floor(s / 2048)
                        THEN 1 ELSE 0 END AS straddles
            FROM placed
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               max(seq_id) + 1 AS n_seqs,
               CAST(sum(straddles) AS BIGINT) AS n_straddling_docs,
               CAST(sum(n_tok) - 2048 * max(seq_id) AS BIGINT) AS last_fill
        FROM seqd GROUP BY source ORDER BY source
    """,
    # r9: Mann-Kendall — exact DECIMAL daily totals make every
    # pairwise sign engine-exact; no-ties variance
    "trend_mann_kendall": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events GROUP BY 1, 2
        ), pairs AS (
            SELECT a.event_type,
                   CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1
                        ELSE 0 END AS sgn
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d < b.d
        ), s AS (
            SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat
            FROM pairs GROUP BY event_type
        ), nd AS (
            SELECT event_type, count(*) AS n_days FROM daily GROUP BY event_type
        )
        SELECT s.event_type, n_days, s_stat,
               round((s_stat - sign(CAST(s_stat AS DOUBLE)))
                     / sqrt(n_days * (n_days - 1) * (2 * n_days + 5) / 18.0),
                     4) AS z_stat,
               abs(round((s_stat - sign(CAST(s_stat AS DOUBLE)))
                     / sqrt(n_days * (n_days - 1) * (2 * n_days + 5) / 18.0),
                     4)) > 1.96 AS trend_95
        FROM s JOIN nd USING (event_type)
        ORDER BY event_type
    """,
    # r9: Hamilton apportionment — all-integer arithmetic (remainder
    # = budget·n mod total), ties on source name
    "sample_quota_allocation": """
        WITH per_src AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        ), tot AS (SELECT sum(n_docs) AS total FROM per_src),
        alloc AS (
            SELECT source, n_docs,
                   CAST(floor(200 * n_docs / total) AS BIGINT) AS f,
                   200 * n_docs % total AS rem
            FROM per_src, tot
        ), short AS (SELECT 200 - sum(f) AS s FROM alloc)
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(f + CASE WHEN row_number() OVER (
                                  ORDER BY rem DESC, source ASC)
                                  <= (SELECT s FROM short)
                             THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM alloc ORDER BY source
    """,
    # r9: pairwise source-vocabulary Jaccard — vocabulary-bounded
    # word self-join, |sources|² pair table
    "text_source_overlap": """
        WITH words AS (
            SELECT DISTINCT source, w FROM (
                SELECT source, unnest(string_split(text, ' ')) AS w
                FROM documents
            ) WHERE w <> ''
        ), sizes AS (
            SELECT source, count(*) AS vocab FROM words GROUP BY source
        ), inter AS (
            SELECT a.source AS s1, b.source AS s2, count(*) AS n_inter
            FROM words a JOIN words b ON a.w = b.w AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT s1, s2, n_inter,
               CAST(va.vocab + vb.vocab - n_inter AS BIGINT) AS n_union,
               ((CASE WHEN CAST(n_inter AS HUGEINT) < 0 THEN -((2 * abs(CAST(n_inter AS HUGEINT)) * 1000000 + (CAST(va.vocab + vb.vocab - n_inter AS HUGEINT))) // (2 * (CAST(va.vocab + vb.vocab - n_inter AS HUGEINT)))) ELSE ((2 * abs(CAST(n_inter AS HUGEINT)) * 1000000 + (CAST(va.vocab + vb.vocab - n_inter AS HUGEINT))) // (2 * (CAST(va.vocab + vb.vocab - n_inter AS HUGEINT)))) END) / 1000000.0) AS jaccard
        FROM inter
        JOIN sizes va ON va.source = s1
        JOIN sizes vb ON vb.source = s2
        ORDER BY s1, s2
    """,
    # r9: fuzzy decontamination — 4-gram shingle replay (Spark
    # word_shingles: distinct windows i..i+3 over the space split),
    # containment = shared / doc shingles, worst probe per doc
    "text_decontamination_fuzzy": f"""
        WITH shing AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(string_split(text,' ')) - 2, 1)),
                       i -> array_to_string(string_split(text,' ')[i:i+3], ' ')
                   ))) AS sh
            FROM documents
            WHERE len(string_split(text,' ')) >= 4
        ), corpus AS (
            SELECT doc_id, sh FROM shing WHERE doc_id >= 10
        ), probe AS (
            SELECT DISTINCT doc_id AS probe_id, sh FROM shing WHERE doc_id < 10
        ), shared AS (
            SELECT c.doc_id, p.probe_id, count(*) AS n_shared
            FROM corpus c JOIN probe p USING (sh)
            GROUP BY 1, 2
        ), sizes AS (
            SELECT doc_id, count(*) AS n_doc_shingles FROM corpus GROUP BY doc_id
        )
        SELECT doc_id, probe_id AS worst_probe_id, n_shared, n_doc_shingles,
               containment
        FROM (
            SELECT s.doc_id, s.probe_id, s.n_shared, z.n_doc_shingles,
                   CAST({_exact_mean_sql("n_shared", "z.n_doc_shingles", sum_scale=0, out_scale=6)}
                        AS DOUBLE) AS containment,
                   row_number() OVER (
                       PARTITION BY s.doc_id
                       ORDER BY {_exact_mean_sql("n_shared", "z.n_doc_shingles", sum_scale=0, out_scale=6)} DESC,
                                s.probe_id ASC) AS rn
            FROM shared s JOIN sizes z USING (doc_id)
        ) WHERE rn = 1
        ORDER BY doc_id
    """,
    # r9: temperature-scaled mixture — rounded-DECIMAL α-powered
    # weights so the normalizer is partition-order-exact
    "sample_temperature_mixture": """
        WITH per AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        ), tot AS (SELECT sum(n_docs) AS total FROM per),
        w AS (
            SELECT source, n_docs, total,
                   CAST(round(pow(n_docs / CAST(total AS DOUBLE), 0.5), 9)
                        AS DECIMAL(18,9)) AS w
            FROM per, tot
        ), sw AS (SELECT sum(w) AS sw FROM w)
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               ((CASE WHEN CAST(n_docs AS HUGEINT) < 0 THEN -((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) ELSE ((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) END) / 1000000.0) AS natural_share,
               ((CASE WHEN CAST(w * 1000000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(w * 1000000000 AS HUGEINT)) * 1000000 + (CAST(sw * 1000000000 AS HUGEINT))) // (2 * (CAST(sw * 1000000000 AS HUGEINT)))) ELSE ((2 * abs(CAST(w * 1000000000 AS HUGEINT)) * 1000000 + (CAST(sw * 1000000000 AS HUGEINT))) // (2 * (CAST(sw * 1000000000 AS HUGEINT)))) END) / 1000000.0) AS temp_share,
               -- round-ok: the embedded rounds recover exact integers q from
               -- the generated q/1e6 share expressions, never a .5
               ((CASE WHEN CAST(CAST(round((((CASE WHEN CAST(w * 1000000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(w * 1000000000 AS HUGEINT)) * 1000000 + (CAST(sw * 1000000000 AS HUGEINT))) // (2 * (CAST(sw * 1000000000 AS HUGEINT)))) ELSE ((2 * abs(CAST(w * 1000000000 AS HUGEINT)) * 1000000 + (CAST(sw * 1000000000 AS HUGEINT))) // (2 * (CAST(sw * 1000000000 AS HUGEINT)))) END) / 1000000.0)) * 1000000, 0) AS HUGEINT) AS HUGEINT) < 0 THEN -((2 * abs(CAST(CAST(round((((CASE WHEN CAST(w * 1000000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(w * 1000000000 AS HUGEINT)) * 1000000 + (CAST(sw * 1000000000 AS HUGEINT))) // (2 * (CAST(sw * 1000000000 AS HUGEINT)))) ELSE ((2 * abs(CAST(w * 1000000000 AS HUGEINT)) * 1000000 + (CAST(sw * 1000000000 AS HUGEINT))) // (2 * (CAST(sw * 1000000000 AS HUGEINT)))) END) / 1000000.0)) * 1000000, 0) AS HUGEINT) AS HUGEINT)) * 10000 + (CAST(CAST(round((((CASE WHEN CAST(n_docs AS HUGEINT) < 0 THEN -((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) ELSE ((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) END) / 1000000.0)) * 1000000, 0) AS HUGEINT) AS HUGEINT))) // (2 * (CAST(CAST(round((((CASE WHEN CAST(n_docs AS HUGEINT) < 0 THEN -((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) ELSE ((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) END) / 1000000.0)) * 1000000, 0) AS HUGEINT) AS HUGEINT)))) ELSE ((2 * abs(CAST(CAST(round((((CASE WHEN CAST(w * 1000000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(w * 1000000000 AS HUGEINT)) * 1000000 + (CAST(sw * 1000000000 AS HUGEINT))) // (2 * (CAST(sw * 1000000000 AS HUGEINT)))) ELSE ((2 * abs(CAST(w * 1000000000 AS HUGEINT)) * 1000000 + (CAST(sw * 1000000000 AS HUGEINT))) // (2 * (CAST(sw * 1000000000 AS HUGEINT)))) END) / 1000000.0)) * 1000000, 0) AS HUGEINT) AS HUGEINT)) * 10000 + (CAST(CAST(round((((CASE WHEN CAST(n_docs AS HUGEINT) < 0 THEN -((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) ELSE ((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) END) / 1000000.0)) * 1000000, 0) AS HUGEINT) AS HUGEINT))) // (2 * (CAST(CAST(round((((CASE WHEN CAST(n_docs AS HUGEINT) < 0 THEN -((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) ELSE ((2 * abs(CAST(n_docs AS HUGEINT)) * 1000000 + (CAST(total AS HUGEINT))) // (2 * (CAST(total AS HUGEINT)))) END) / 1000000.0)) * 1000000, 0) AS HUGEINT) AS HUGEINT)))) END) / 10000.0) AS boost
        FROM w, sw ORDER BY source
    """,
    # r9: ACF lags 1-7 over DECIMAL-exact daily totals; one window
    # leg per lag, Pearson from exact sufficient statistics
    "a44_acf_daily": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events GROUP BY 1, 2
        ), stacked AS (
            """
    + "\n            UNION ALL\n            ".join(
        f"SELECT event_type, {k} AS lag, v AS x, lag(v, {k}) OVER "
        f"(PARTITION BY event_type ORDER BY d) AS y FROM daily"
        for k in range(1, 8)
    )
    + """
        ), stats AS (
            SELECT event_type, lag, count(*) AS n_pairs,
                   CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                   CAST(sum(x*y) AS DOUBLE) AS sxy,
                   CAST(sum(x*x) AS DOUBLE) AS sxx,
                   CAST(sum(y*y) AS DOUBLE) AS syy
            FROM stacked WHERE y IS NOT NULL GROUP BY 1, 2
        )
        SELECT event_type, CAST(lag AS BIGINT) AS lag, n_pairs,
               round((n_pairs * sxy - sx * sy)
                     / sqrt((n_pairs * sxx - sx * sx)
                            * (n_pairs * syy - sy * sy)), 4) AS acf
        FROM stats ORDER BY event_type, lag
    """,
    # r9: label-centroid cohesion — rounded-DECIMAL element sums make
    # the centroid means partition-order-exact; cosine replay via the
    # module's list-op convention
    "embed_label_cohesion": """
        WITH dims AS (
            SELECT label, dim - 1 AS dim,
                   CAST(round(CAST(v AS DOUBLE), 7) AS DECIMAL(20,7)) AS v
            FROM (
                SELECT label, unnest(embedding) AS v,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings
            )
        ), cent AS (
            SELECT label, dim, CAST(sum(v) AS DOUBLE) / count(*) AS c
            FROM dims GROUP BY 1, 2
        ), cent_arr AS (
            SELECT label, list(c ORDER BY dim) AS centroid FROM cent GROUP BY label
        ), scored AS (
            SELECT e.label,
                   CAST(round(
                       list_sum(list_transform(list_zip(e.embedding, a.centroid),
                           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(e.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(a.centroid,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
                       AS DECIMAL(10,4)) AS cos
            FROM embeddings e JOIN cent_arr a USING (label)
        )
        SELECT label, count(*) AS n_vecs,
               ((CASE WHEN CAST(sum(CAST(cos AS DECIMAL(14,4))) * 10000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(cos AS DECIMAL(14,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(CAST(cos AS DECIMAL(14,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS cohesion
        FROM scored GROUP BY label ORDER BY label
    """,
    # r9: referential-integrity audit — NOT EXISTS replays the
    # left-anti legs
    "a45_fk_integrity": """
        WITH legs AS (
            SELECT 'orders->customer' AS relation,
                   (SELECT count(*) FROM orders) AS n_child,
                   (SELECT count(*) FROM orders o WHERE NOT EXISTS
                       (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)) AS n_orphans
            UNION ALL
            SELECT 'lineitem->orders',
                   (SELECT count(*) FROM lineitem),
                   (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                       (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey))
            UNION ALL
            SELECT 'lineitem->supplier',
                   (SELECT count(*) FROM lineitem),
                   (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                       (SELECT 1 FROM supplier s
                        WHERE s.s_suppkey = l.l_suppkey))
            UNION ALL
            SELECT 'customer->nation',
                   (SELECT count(*) FROM customer c WHERE TRUE),
                   (SELECT count(*) FROM customer c WHERE NOT EXISTS
                       (SELECT 1 FROM nation n
                        WHERE n.n_nationkey = c.c_nationkey))
        )
        SELECT relation, n_child, n_orphans,
               ((CASE WHEN CAST(n_orphans AS HUGEINT) < 0 THEN -((2 * abs(CAST(n_orphans AS HUGEINT)) * 1000000 + (CAST(n_child AS HUGEINT))) // (2 * (CAST(n_child AS HUGEINT)))) ELSE ((2 * abs(CAST(n_orphans AS HUGEINT)) * 1000000 + (CAST(n_child AS HUGEINT))) // (2 * (CAST(n_child AS HUGEINT)))) END) / 1000000.0) AS orphan_rate
        FROM legs ORDER BY relation
    """,
    # r9: Monroe et al. log-odds with informative Dirichlet prior
    # (a0 = 1000, prior from the corpus distribution), each source vs
    # the rest; top-3 terms per source
    "text_fightin_words": """
        WITH words AS (
            SELECT source, w FROM (
                SELECT source, unnest(string_split(text, ' ')) AS w
                FROM documents
            ) WHERE w <> ''
        ), src_w AS (
            SELECT source, w, count(*) AS y FROM words GROUP BY 1, 2
        ), corpus_w AS (
            SELECT w, sum(y) AS y_all FROM src_w GROUP BY w
        ), src_n AS (
            SELECT source, sum(y) AS n_src FROM src_w GROUP BY source
        ), tot AS (SELECT sum(y_all) AS n_all FROM corpus_w),
        j AS (
            SELECT source, w, y, y_all, n_src, n_all,
                   1000.0 * y_all / n_all AS a_w,
                   y_all - y AS y_rest,
                   n_all - n_src AS n_rest
            FROM src_w JOIN corpus_w USING (w) JOIN src_n USING (source), tot
        ), z AS (
            SELECT source, w, CAST(y AS BIGINT) AS y,
                   round((ln((y + a_w) / (n_src + 1000.0 - y - a_w))
                          - ln((y_rest + a_w)
                               / (n_rest + 1000.0 - y_rest - a_w)))
                         / sqrt(1.0 / (y + a_w) + 1.0 / (y_rest + a_w)),
                         4) AS zeta
            FROM j
        )
        SELECT source, CAST(rn AS BIGINT) AS rank, w, y, zeta
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY zeta DESC, w ASC) AS rn
            FROM z
        ) WHERE rn <= 3
        ORDER BY source, rank
    """,
    # r9: salted-hash tokenized join — the md5-fold replay proves the
    # linkage is lossless vs the raw-key join
    "j20_hashed_key_join": """
        WITH oc AS (
            SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(substr(md5(
                           'lnk2024:' || o_custkey), 1, 8), ''),
                       c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, b) -> a * 16 + b) AS hk,
                   o_totalprice
            FROM orders
        ), cc AS (
            SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(substr(md5(
                           'lnk2024:' || c_custkey), 1, 8), ''),
                       c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, b) -> a * 16 + b) AS hk,
                   c_mktsegment
            FROM customer
        )
        SELECT c_mktsegment, count(*) AS n_orders,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
        FROM oc JOIN cc USING (hk)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    # r9: rolling 7-day median — percentile ≡ quantile_cont over a
    # 7-row frame on the DECIMAL-exact daily rollup
    "w14_rolling_median": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(18,2))) AS v
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, d, CAST(v AS DOUBLE) AS daily_total,
               round(quantile_cont(CAST(v AS DOUBLE), 0.5) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                   4) AS rolling_median_7d,
               count(*) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_window
        FROM daily ORDER BY event_type, d
    """,
    # r9: Newman degree assortativity — DECIMAL(38,0) sufficient
    # statistics (Σdeg² over edges overflows BIGINT), one final
    # double division
    "graph_assortativity": """
        WITH pairs AS (
            SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), bi AS (
            SELECT src, dst FROM pairs
            UNION ALL
            SELECT dst, src FROM pairs
        ), deg AS (
            SELECT src, count(*) AS deg FROM bi GROUP BY src
        ), ends AS (
            SELECT a.deg AS dx, b.deg AS dy
            FROM bi JOIN deg a ON bi.src = a.src JOIN deg b ON bi.dst = b.src
        ), stats AS (
            SELECT CAST(count(*) AS DECIMAL(38,0)) AS m2,
                   CAST(sum(dx) AS DECIMAL(38,0)) AS sx,
                   CAST(sum(dy) AS DECIMAL(38,0)) AS sy,
                   CAST(sum(dx*dy) AS DECIMAL(38,0)) AS sxy,
                   CAST(sum(dx*dx) AS DECIMAL(38,0)) AS sxx,
                   CAST(sum(dy*dy) AS DECIMAL(38,0)) AS syy
            FROM ends
        )
        SELECT CAST(m2 AS BIGINT) AS n_directed_edges,
               round(CAST(m2 * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE)
                            * CAST(m2 * syy - sy * sy AS DOUBLE)),
                     4) AS assortativity
        FROM stats
    """,
    # r9: winsorized mean — bounds rounded to the metric's 2-decimal
    # grain, clamped values stay DECIMAL (exact sum / count)
    "a47_winsorized_stats": """
        WITH ev AS (
            SELECT event_type, value FROM events WHERE value IS NOT NULL
        ), bounds AS (
            SELECT event_type,
                   CAST(round(quantile_cont(value, 0.05), 2)
                        AS DECIMAL(18,2)) AS lo,
                   CAST(round(quantile_cont(value, 0.95), 2)
                        AS DECIMAL(18,2)) AS hi
            FROM ev GROUP BY event_type
        ), clamped AS (
            SELECT e.event_type, lo, hi,
                   least(greatest(CAST(value AS DECIMAL(18,2)), lo), hi) AS wv
            FROM ev e JOIN bounds USING (event_type)
        )
        SELECT event_type, count(*) AS n,
               CAST(lo AS DOUBLE) AS p05, CAST(hi AS DOUBLE) AS p95,
               ((CASE WHEN CAST(sum(wv) * 100 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(wv) * 100 AS HUGEINT)) * 100 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(wv) * 100 AS HUGEINT)) * 100 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS winsorized_mean
        FROM clamped GROUP BY event_type, lo, hi ORDER BY event_type
    """,
    # r9: entropy/diversity profile — rounded-DECIMAL per-value terms
    "a48_column_entropy": " UNION ALL ".join(
        f'''
        SELECT '{table}.{col}' AS "column", n, k AS n_distinct,
               CAST(round(sum(h), 4) AS DOUBLE) AS entropy,
               round(CAST(round(sum(h), 4) AS DOUBLE)
                     / ln(CAST(k AS DOUBLE)), 4) AS norm_entropy,
               CAST(round(1.0 - sum(p2), 4) AS DOUBLE) AS gini_simpson
        FROM (
            SELECT n, k,
                   CAST(round(-(c / CAST(n AS DOUBLE))
                              * ln(c / CAST(n AS DOUBLE)), 8)
                        AS DECIMAL(18,8)) AS h,
                   CAST(((CASE WHEN CAST(c * c AS HUGEINT) < 0 THEN -((2 * abs(CAST(c * c AS HUGEINT)) * 100000000 + (CAST(n * n AS HUGEINT))) // (2 * (CAST(n * n AS HUGEINT)))) ELSE ((2 * abs(CAST(c * c AS HUGEINT)) * 100000000 + (CAST(n * n AS HUGEINT))) // (2 * (CAST(n * n AS HUGEINT)))) END) / 100000000.0)
                        AS DECIMAL(18,8)) AS p2
            FROM (
                SELECT {col} AS v, count(*) AS c FROM {table} GROUP BY 1
            ), (SELECT count(*) AS n, count(DISTINCT {col}) AS k FROM {table})
        ) GROUP BY n, k
        '''
        for table, col in (
            ("events", "event_type"),
            ("documents", "source"),
            ("documents", "lang"),
            ("orders", "o_orderpriority"),
            ("orders", "o_orderstatus"),
        )
    )
    + ' ORDER BY "column"',
    # r9: lifetime-revenue deciles — exact DECIMAL sums, deterministic
    # ntile over the total order
    "q23_revenue_deciles": f"""
        WITH rev AS (
            SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY o_custkey
        ), dec AS (
            SELECT *, ntile(10) OVER (ORDER BY rev DESC, o_custkey ASC)
                AS decile
            FROM rev
        ), tot AS (SELECT sum(rev) AS total FROM rev)
        SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_customers,
               sum(rev) AS revenue,
               CAST({_exact_mean_sql("(sum(rev) * 100)", "(total * 100)", sum_scale=0, out_scale=6)}
                    AS DOUBLE) AS revenue_share
        FROM dec, tot GROUP BY decile, total ORDER BY decile
    """,
    # r9: bounded 3-core peel — the identical five rounds unrolled as
    # a CTE chain (degree filter + two EXISTS per round)
    "graph_kcore": """
        WITH pairs AS (
            SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), bi AS (
            SELECT src, dst FROM pairs
            UNION ALL
            SELECT dst, src FROM pairs
        ),
        e0 AS (SELECT src, dst FROM bi),
        """
    + ",\n        ".join(
        f"k{r} AS (SELECT src FROM (SELECT src, count(*) AS deg "
        f"FROM e{r-1} GROUP BY src) WHERE deg >= 3),\n"
        f"        e{r} AS (SELECT e.src, e.dst FROM e{r-1} e\n"
        f"          WHERE EXISTS (SELECT 1 FROM k{r} a WHERE a.src = e.src)\n"
        f"            AND EXISTS (SELECT 1 FROM k{r} b WHERE b.src = e.dst))"
        for r in range(1, 6)
    )
    + "\n        "
    + "\n        UNION ALL\n        ".join(
        f"SELECT {r} AS round, CAST(count(*) / 2 AS BIGINT) AS n_edges, "
        f"CAST(count(DISTINCT src) AS BIGINT) AS n_nodes FROM e{r}"
        for r in range(0, 6)
    )
    + "\n        ORDER BY round",
    # r9: Flesch reading-ease — vowel-group syllables (min 1/word),
    # [.!?]+ sentences (min 1/doc), rounded-DECIMAL per-doc scores
    "text_readability_scores": f"""
        WITH d AS (
            SELECT source, string_split(text, ' ') AS w,
                   greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS ns
            FROM documents
        ), m AS (
            SELECT source, len(w) AS nw, ns,
                   list_sum(list_transform(w,
                       x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')), 1)
                   )) AS syl
            FROM d
        ), f AS (
            -- flesch is an exact rational: (206835*ns*nw - 1015*nw*nw
            -- - 84600*syl*ns) / (1000*ns*nw) — integer-arithmetic round
            SELECT source,
                   CAST({_exact_mean_sql("(206835 * ns * nw - 1015 * nw * nw - 84600 * syl * ns)", "(1000 * ns * nw)", sum_scale=0, out_scale=8)}
                        AS DECIMAL(18,8)) AS fl
            FROM m
        )
        SELECT source, count(*) AS n_docs,
               ((CASE WHEN CAST(sum(fl) * 100000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(fl) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 10000)) // (2 * (CAST(count(*) AS HUGEINT) * 10000))) ELSE ((2 * abs(CAST(sum(fl) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 10000)) // (2 * (CAST(count(*) AS HUGEINT) * 10000))) END) / 10000.0) AS mean_flesch,
               ((CASE WHEN CAST(sum(CASE WHEN fl >= 50 THEN 1 ELSE 0 END) * 1 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CASE WHEN fl >= 50 THEN 1 ELSE 0 END) * 1 AS HUGEINT)) * 10000 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(CASE WHEN fl >= 50 THEN 1 ELSE 0 END) * 1 AS HUGEINT)) * 10000 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS easy_share
        FROM f GROUP BY source ORDER BY source
    """,
    # r9: first-occurrence 3-gram novelty — same shingle construction
    # as the dedup oracles (3-word window, DISTINCT per doc, len>=3
    # guard); docs with no shingles drop out in both engines
    "text_ngram_novelty": f"""
        WITH words AS (
            SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
        ), shingles AS (
            SELECT DISTINCT doc_id, source,
                   list_aggregate(w[i:i+2], 'string_agg', ' ') AS sh
            FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 3
        ), sizes AS (
            SELECT doc_id, source, count(*) AS n_sh FROM shingles GROUP BY 1, 2
        ), firstseen AS (
            SELECT sh, min(doc_id) AS doc_id FROM shingles GROUP BY sh
        ), novel AS (
            SELECT doc_id, count(*) AS novel FROM firstseen GROUP BY doc_id
        ), per_doc AS (
            SELECT s.source, coalesce(n.novel, 0) AS novel,
                   CAST({_exact_mean_sql("coalesce(n.novel, 0)", "s.n_sh", sum_scale=0, out_scale=8)}
                        AS DECIMAL(18,8)) AS nov
            FROM sizes s LEFT JOIN novel n USING (doc_id)
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(novel) AS BIGINT) AS novel_shingles,
               ((CASE WHEN CAST(sum(nov) * 100000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(nov) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 10000)) // (2 * (CAST(count(*) AS HUGEINT) * 10000))) ELSE ((2 * abs(CAST(sum(nov) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 10000)) // (2 * (CAST(count(*) AS HUGEINT) * 10000))) END) / 10000.0) AS mean_novelty
        FROM per_doc GROUP BY source ORDER BY source
    """,
    # r9: hashed-feature linear classifier gate — md5 bucket in
    # [0,64) (the shared hash convention), integer tenth-weights so
    # the per-doc sums are exact, sigmoid rounded to 6
    "text_quality_linear": f"""
        WITH feats AS (
            SELECT DISTINCT doc_id, source, w
            FROM (SELECT doc_id, source,
                         UNNEST(string_split(text, ' ')) AS w
                  FROM documents)
        ), weighted AS (
            SELECT doc_id, source,
                   ({_md5_bucket("w", 64)}) % 21 - 10 AS w_tenths
            FROM feats
        ), per_doc AS (
            SELECT source,
                   CAST(round(1.0 / (1.0 + exp(-(0.2
                        + (sum(w_tenths) / 10.0) / count(*)))), 6)
                        AS DECIMAL(18,6)) AS score
            FROM weighted GROUP BY doc_id, source
        )
        SELECT source, count(*) AS n_docs,
               ((CASE WHEN CAST(sum(CAST(score AS DECIMAL(18,6))) * 1000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(score AS DECIMAL(18,6))) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) ELSE ((2 * abs(CAST(sum(CAST(score AS DECIMAL(18,6))) * 1000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) END) / 10000.0) AS mean_score,
               ((CASE WHEN CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) * 1 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) * 1 AS HUGEINT)) * 10000 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) * 1 AS HUGEINT)) * 10000 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS keep_rate
        FROM per_doc GROUP BY source ORDER BY source
    """,
    # r9: DSIR importance weights — 256-bucket hashed-unigram models
    # (target lang='en' vs raw), add-1 smoothing, rounded-DECIMAL
    # per-bucket log-ratios
    "text_dsir_weights": f"""
        WITH toks AS (
            SELECT doc_id, lang, source, {_md5_bucket("w", 256)} AS bucket
            FROM (SELECT doc_id, lang, source,
                         UNNEST(string_split(text, ' ')) AS w
                  FROM documents)
        ), counts AS (
            SELECT bucket, count(*) AS c_raw,
                   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
            FROM toks GROUP BY bucket
        ), totals AS (
            SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM counts
        ), model AS (
            SELECT bucket,
                   CAST(round(
                       ln((c_tgt + 1) / CAST(n_tgt + 256 AS DOUBLE))
                       - ln((c_raw + 1) / CAST(n_raw + 256 AS DOUBLE)), 8)
                        AS DECIMAL(18,8)) AS lr
            FROM counts, totals
        )
        SELECT doc_id, lang, source, count(*) AS n_tokens,
               ((CASE WHEN CAST(sum(lr) * 100000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(lr) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) ELSE ((2 * abs(CAST(sum(lr) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 100)) // (2 * (CAST(count(*) AS HUGEINT) * 100))) END) / 1000000.0) AS dsir_logratio
        FROM toks JOIN model USING (bucket)
        GROUP BY doc_id, lang, source
        ORDER BY dsir_logratio DESC, doc_id ASC LIMIT 15
    """,
    # r9: data-constrained epoch schedule — balanced 2×-corpus budget,
    # 4-epoch repeat cap; all integer except the reported ratio
    "sample_epoch_schedule": f"""
        WITH avail AS (
            SELECT source,
                   sum(CAST(floor(n_chars / 4) AS BIGINT)) AS available_tokens
            FROM documents GROUP BY source
        ), totals AS (
            SELECT sum(available_tokens) AS corpus_tokens,
                   count(*) AS n_sources
            FROM avail
        )
        SELECT source, CAST(available_tokens AS BIGINT) AS available_tokens,
               CAST(floor((corpus_tokens * 2) / CAST(n_sources AS DOUBLE))
                    AS BIGINT) AS target_tokens,
               CAST({_exact_mean_sql("CAST(floor((corpus_tokens * 2) / CAST(n_sources AS DOUBLE)) AS BIGINT)", "available_tokens", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS repeat_epochs,
               CAST(least(CAST(floor((corpus_tokens * 2)
                                / CAST(n_sources AS DOUBLE)) AS BIGINT),
                     available_tokens * 4) AS BIGINT) AS effective_tokens,
               CAST(greatest(CAST(floor((corpus_tokens * 2)
                                   / CAST(n_sources AS DOUBLE)) AS BIGINT)
                        - available_tokens * 4,
                        0) AS BIGINT) AS unmet_tokens
        FROM avail, totals ORDER BY source
    """,
    # r9: Adamic–Adar + Jaccard link prediction over the supplier↔part
    # bipartite graph; per-part degree cap 32 before pairing (same
    # constant as the Spark query), rounded-DECIMAL weights
    "graph_adamic_adar": """
        WITH sp AS (
            SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
        ), sdeg AS (
            SELECT s, count(*) AS sd FROM sp GROUP BY s
        ), pdeg AS (
            SELECT p, count(*) AS pd FROM sp GROUP BY p
        ), pairs AS (
            SELECT a.s AS s_a, b.s AS s_b,
                   CAST(round(1.0 / ln(CAST(pd AS DOUBLE)), 8)
                        AS DECIMAL(18,8)) AS w
            FROM sp a
            JOIN sp b ON a.p = b.p AND a.s < b.s
            JOIN pdeg d ON d.p = a.p
            WHERE pd BETWEEN 2 AND 32
        ), agg AS (
            SELECT s_a, s_b, count(*) AS common_parts,
                   CAST(round(sum(w), 4) AS DOUBLE) AS adamic_adar
            FROM pairs GROUP BY s_a, s_b
        )
        SELECT s_a, s_b, common_parts, adamic_adar,
               ((CASE WHEN CAST(common_parts AS HUGEINT) < 0 THEN -((2 * abs(CAST(common_parts AS HUGEINT)) * 10000 + (CAST(da.sd + db.sd - common_parts AS HUGEINT))) // (2 * (CAST(da.sd + db.sd - common_parts AS HUGEINT)))) ELSE ((2 * abs(CAST(common_parts AS HUGEINT)) * 10000 + (CAST(da.sd + db.sd - common_parts AS HUGEINT))) // (2 * (CAST(da.sd + db.sd - common_parts AS HUGEINT)))) END) / 10000.0) AS jaccard
        FROM agg
        JOIN sdeg da ON da.s = s_a
        JOIN sdeg db ON db.s = s_b
        ORDER BY adamic_adar DESC, s_a ASC, s_b ASC LIMIT 20
    """,
    # r9: MMR greedy top-5 — identical 5 rounds unrolled as a CTE
    # chain; all cosines rounded to 4 before any comparison
    "embed_mmr_select": f"""
        WITH q AS (
            SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
        ), c0 AS (
            SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id <> 0
        ), cand AS (
            SELECT vec_id, cv,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS rel
            FROM c0 c CROSS JOIN q
            ORDER BY rel DESC, vec_id LIMIT 20
        ), sims AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   round(
                       list_sum(list_transform(list_zip(a.cv, b.cv),
                           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(a.cv,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(b.cv,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                       4) AS sim
            FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
        ), s1 AS (
            SELECT 1 AS "rank", vec_id, rel, CAST(0.0 AS DOUBLE) AS redundancy,
                   -- round-ok: rel is a cosine (sqrt-normalized, continuous)
                   round(0.7 * rel, 6) AS mmr_score
            FROM cand ORDER BY rel DESC, vec_id LIMIT 1
        ), sel1 AS (SELECT vec_id FROM s1),
        """
    + ",\n        ".join(
        f's{r} AS (\n'
        f'            SELECT {r} AS "rank", vec_id, rel, redundancy,\n'
        # round-ok: rel/redundancy are cosines (continuous)
        f"                   round(0.7 * rel - 0.3 * redundancy, 6) AS mmr_score\n"
        f"            FROM (\n"
        f"                SELECT c.vec_id, c.rel, max(s.sim) AS redundancy\n"
        f"                FROM cand c JOIN sims s ON s.a_id = c.vec_id\n"
        f"                WHERE s.b_id IN (SELECT vec_id FROM sel{r-1})\n"
        f"                  AND c.vec_id NOT IN (SELECT vec_id FROM sel{r-1})\n"
        f"                GROUP BY c.vec_id, c.rel\n"
        f"            )\n"
        f"            ORDER BY mmr_score DESC, vec_id LIMIT 1\n"
        f"        ),\n"
        f"        sel{r} AS (SELECT vec_id FROM sel{r-1}\n"
        f"                   UNION ALL SELECT vec_id FROM s{r})"
        for r in range(2, 6)
    )
    + """
        SELECT "rank", vec_id, rel AS relevance, redundancy, mmr_score
        FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
              UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
              UNION ALL SELECT * FROM s5)
        ORDER BY "rank"
    """,
    # r9: order-key sequence gaps — one global lag replays the Spark
    # bucketed two-level formulation exactly (adjacent-pair coverage
    # is identical)
    "a49_id_gap_audit": """
        WITH ids AS (SELECT DISTINCT l_orderkey AS id FROM lineitem),
        g AS (SELECT lag(id) OVER (ORDER BY id) AS prev, id FROM ids)
        SELECT prev + 1 AS gap_start, id - 1 AS gap_end,
               id - prev - 1 AS n_missing
        FROM g WHERE id - prev > 1
        ORDER BY n_missing DESC, gap_start ASC LIMIT 10
    """,
    # r9: order-insensitive table fingerprints — 48-bit md5-prefix
    # fold summed mod 1e18; same canonical '|' serialization
    "a50_table_checksums": " UNION ALL ".join(
        f"""
        SELECT '{table}' AS table_name, count(*) AS n_rows,
               CAST(sum(
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(substr(md5(
                           concat_ws('|', '{tag}', {cols})), 1, 12), ''),
                           c -> CAST(strpos('123456789abcdef', c) AS BIGINT))),
                       (a, x) -> a * 16 + x)
               ) % 1000000000000000000 AS BIGINT) AS checksum
        FROM {table}
        """
        for table, tag, cols in (
            (
                "orders",
                "o",
                "CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), "
                "CAST(o_orderdate AS VARCHAR), o_orderpriority",
            ),
            (
                "customer",
                "c",
                "CAST(c_custkey AS VARCHAR), c_name, CAST(c_nationkey AS VARCHAR)",
            ),
            (
                "lineitem",
                "l",
                "CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), "
                "CAST(l_suppkey AS VARCHAR), CAST(l_shipdate AS VARCHAR)",
            ),
            (
                "events",
                "e",
                "CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR), event_type",
            ),
        )
    )
    + " ORDER BY table_name",
    # r9: closed-form MATTR — same O(tokens) first-occurrence window
    # count as the Spark plan; W=25, sub-W docs drop
    "text_mattr_diversity": f"""
        WITH words AS (
            SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        ), toks AS (
            SELECT doc_id, source, i AS p, ws[i] AS w, len(ws) AS n
            FROM words, UNNEST(range(1, len(ws) + 1)) AS t(i)
        ), pt AS (
            SELECT doc_id, source, p, n,
                   coalesce(lag(p) OVER (PARTITION BY doc_id, w ORDER BY p),
                            0) AS prev
            FROM toks
        ), per_tok AS (
            SELECT doc_id, source, n - 25 + 1 AS k,
                   greatest(0, least(p, n - 25 + 1)
                               - greatest(p - 25 + 1, prev + 1, 1) + 1)
                       AS contrib
            FROM pt WHERE n >= 25
        ), per_doc AS (
            SELECT source,
                   CAST({_exact_mean_sql("sum(contrib)", "(k * 25)", sum_scale=0, out_scale=8)}
                        AS DECIMAL(18,8)) AS mattr
            FROM per_tok GROUP BY doc_id, source, k
        )
        SELECT source, count(*) AS n_docs,
               ((CASE WHEN CAST(sum(mattr) * 100000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(mattr) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 10000)) // (2 * (CAST(count(*) AS HUGEINT) * 10000))) ELSE ((2 * abs(CAST(sum(mattr) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 10000)) // (2 * (CAST(count(*) AS HUGEINT) * 10000))) END) / 10000.0) AS mean_mattr
        FROM per_doc GROUP BY source ORDER BY source
    """,
    # r9: Wald–Wolfowitz runs test — DECIMAL daily totals, integer
    # run counting, closed-form z
    "a51_runs_test": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS v
            FROM events GROUP BY 1, 2
        ), s1 AS (
            SELECT event_type, day, v,
                   lag(v) OVER (PARTITION BY event_type ORDER BY day) AS prev_v
            FROM daily
        ), s2 AS (
            SELECT event_type, day,
                   CASE WHEN v > prev_v THEN 1 ELSE -1 END AS sgn
            FROM s1 WHERE prev_v IS NOT NULL AND v <> prev_v
        ), r AS (
            SELECT event_type,
                   sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS n_up,
                   sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS n_down,
                   1 + sum(CASE WHEN prev_sgn IS NOT NULL AND sgn <> prev_sgn
                           THEN 1 ELSE 0 END) AS runs
            FROM (SELECT *, lag(sgn) OVER (PARTITION BY event_type
                                           ORDER BY day) AS prev_sgn
                  FROM s2)
            GROUP BY event_type
        )
        SELECT event_type, CAST(n_up AS BIGINT) AS n_up,
               CAST(n_down AS BIGINT) AS n_down,
               CAST(runs AS BIGINT) AS runs,
               -- degenerate-sequence guard mirrored from the Spark
               -- query: all-up/all-down or < 2 signed days -> NULL
               CASE WHEN n_up = 0 OR n_down = 0 OR n_up + n_down < 2
                    THEN NULL
                    ELSE round((runs - (1.0 + 2.0 * n_up * n_down
                              / CAST(n_up + n_down AS DOUBLE)))
                     / sqrt(2.0 * n_up * n_down
                            * (2.0 * n_up * n_down - CAST(n_up + n_down AS DOUBLE))
                            / (CAST(n_up + n_down AS DOUBLE)
                               * CAST(n_up + n_down AS DOUBLE)
                               * (CAST(n_up + n_down AS DOUBLE) - 1.0))),
                     4)
               END AS z_score
        FROM r ORDER BY event_type
    """,
    # r9: pairwise JSD between source unigram distributions on the
    # dense 256-bucket grid; 0·ln(0) = 0, rounded-DECIMAL terms
    "text_js_divergence_sources": f"""
        WITH toks AS (
            SELECT source, {_md5_bucket("w", 256)} AS b
            FROM (SELECT source, UNNEST(string_split(text, ' ')) AS w
                  FROM documents)
        ), counts AS (
            SELECT source, b, count(*) AS c FROM toks GROUP BY source, b
        ), totals AS (
            SELECT source, sum(c) AS n FROM counts GROUP BY source
        ), grid AS (
            SELECT t.source, g.b,
                   coalesce(c.c, 0) / CAST(t.n AS DOUBLE) AS p
            FROM totals t
            CROSS JOIN (SELECT j AS b FROM UNNEST(range(0, 256)) AS u(j)) g
            LEFT JOIN counts c ON c.source = t.source AND c.b = g.b
        ), pairs AS (
            SELECT l.source AS s1, r.source AS s2,
                   CAST(round(0.5 * (
                       (CASE WHEN l.p > 0
                        THEN l.p * ln(l.p / ((l.p + r.p) / 2))
                        ELSE 0.0 END)
                       + (CASE WHEN r.p > 0
                          THEN r.p * ln(r.p / ((l.p + r.p) / 2))
                          ELSE 0.0 END)), 8) AS DECIMAL(18,8)) AS t
            FROM grid l JOIN grid r ON l.b = r.b AND l.source < r.source
        )
        SELECT s1, s2, CAST(round(sum(t), 6) AS DOUBLE) AS jsd
        FROM pairs GROUP BY s1, s2 ORDER BY jsd, s1, s2
    """,
    # r9: Neyman allocation — σ from integer sums, largest-remainder
    # integer rounding to the exact budget
    "sample_neyman_allocation": """
        WITH stats AS (
            SELECT source, count(*) AS n_h, sum(n_chars) AS sx,
                   sum(n_chars * n_chars) AS sxx
            FROM documents GROUP BY source
        ), sig AS (
            -- singleton-stratum guard mirrored from the Spark query:
            -- one observation has sigma 0, never a 0/0 NULL.
            -- σ quantizes to DECIMAL(28,8) at birth (tie class)
            SELECT source, n_h,
                   CAST(CASE WHEN n_h <= 1 THEN 0.0
                        ELSE round(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE)
                                   / CAST(n_h * (n_h - 1) AS DOUBLE)), 8)
                   END AS DECIMAL(28,8)) AS sigma
            FROM stats
        ), wgt AS (
            SELECT source, n_h, sigma,
                   CAST(n_h * sigma AS DECIMAL(28,8)) AS w
            FROM sig
        ), tot AS (SELECT sum(w) AS wtot FROM wgt),
        shares AS (
            SELECT source, n_h,
                   CAST(round(sigma, 4) AS DOUBLE) AS sigma,
                   ((CASE WHEN CAST(w * 100000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(w * 100000000 AS HUGEINT)) * 100000000 + (CAST(wtot * 100000000 AS HUGEINT))) // (2 * (CAST(wtot * 100000000 AS HUGEINT)))) ELSE ((2 * abs(CAST(w * 100000000 AS HUGEINT)) * 100000000 + (CAST(wtot * 100000000 AS HUGEINT))) // (2 * (CAST(wtot * 100000000 AS HUGEINT)))) END) / 100000000.0) AS share,
                   ((CASE WHEN CAST(w * 100000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(w * 100000000 AS HUGEINT)) * 1000000 + (CAST(wtot * 100000000 AS HUGEINT))) // (2 * (CAST(wtot * 100000000 AS HUGEINT)))) ELSE ((2 * abs(CAST(w * 100000000 AS HUGEINT)) * 1000000 + (CAST(wtot * 100000000 AS HUGEINT))) // (2 * (CAST(wtot * 100000000 AS HUGEINT)))) END) / 1000000.0) AS share6
            FROM wgt, tot
        ), fl AS (
            SELECT *, CAST(floor(share * 1000) AS BIGINT) AS base,
                   share * 1000 - floor(share * 1000) AS frac
            FROM shares
        ), ranked AS (
            SELECT *, row_number() OVER (ORDER BY frac DESC, source ASC)
                      AS rk
            FROM fl
        ), short AS (SELECT 1000 - sum(base) AS short FROM fl)
        SELECT source, CAST(n_h AS BIGINT) AS n_h, sigma,
               share6 AS neyman_share,
               CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END
                    AS BIGINT) AS allocation
        FROM ranked, short ORDER BY source
    """,
    # r9: seasonality strength — day-of-week seasonal means over
    # DECIMAL daily totals, residual/total variances from rounded-
    # DECIMAL sufficient sums
    # r11: scaled-integer moments (x_i = v·10², r_i = v·10⁸ − s·10⁸)
    # and integer-arithmetic variance rounds — the double-round of an
    # exact rational is the cross-engine tie class
    "a53_seasonality_strength": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS v,
                   dayofweek(CAST(ts AS DATE)) AS dow
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ), seas AS (
            SELECT event_type, dow,
                   ((CASE WHEN CAST(sum(v) * 100 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(v) * 100 AS HUGEINT)) * 1000000 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(v) * 100 AS HUGEINT)) * 1000000 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 100000000.0) AS s
            FROM daily GROUP BY event_type, dow
        ), resid AS (
            SELECT d.event_type,
                   CAST(d.v * 100 AS BIGINT) AS xi,
                   CAST(d.v * 100 AS BIGINT) * 1000000
                       - CAST(round(s.s * 1e8, 0) AS BIGINT) AS ri
            FROM daily d JOIN seas s
              ON d.event_type = s.event_type AND d.dow = s.dow
        ), st AS (
            SELECT event_type, count(*) AS n_days,
                   CAST(sum(xi) AS HUGEINT) AS sx,
                   sum(CAST(xi AS HUGEINT) * CAST(xi AS HUGEINT)) AS sxx,
                   CAST(sum(ri) AS HUGEINT) AS sr,
                   sum(CAST(ri AS HUGEINT) * CAST(ri AS HUGEINT)) AS srr
            FROM resid GROUP BY event_type
        ), nums AS (
            SELECT event_type, n_days,
                   CAST(n_days AS HUGEINT) * sxx - sx * sx AS num_x,
                   CAST(n_days AS HUGEINT) * srr - sr * sr AS num_r,
                   CAST(n_days AS HUGEINT)
                       * (CAST(n_days AS HUGEINT) - 1) AS den_n
            FROM st
        )
        SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
               CASE WHEN n_days > 1 THEN
                   CAST({_exact_mean_sql("num_x", "(den_n * 10000)", sum_scale=0, out_scale=4)} AS DOUBLE)
               END AS var_total,
               CASE WHEN n_days > 1 THEN
                   CAST({_exact_mean_sql("num_r", "(den_n * 10000000000000000)", sum_scale=0, out_scale=4)} AS DOUBLE)
               END AS var_resid,
               CASE WHEN n_days > 1 AND num_x > 0 THEN
                   greatest(0.0, CAST({_exact_mean_sql("(num_x * 1000000000000 - num_r)", "(num_x * 1000000000000)", sum_scale=0, out_scale=4)} AS DOUBLE))
               END AS seasonality_strength
        FROM nums ORDER BY event_type
    """,
    # r9: RAKE keyphrases — same stopword-boundary split, degree/freq
    # word scores, rounded-DECIMAL phrase sums
    "text_keyword_rake": rf"""
        WITH pieces AS (
            SELECT trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
            FROM (SELECT UNNEST(string_split_regex(text,
                      '\b(?:the|a|of|and|to|in|is|that|for|on)\b')) AS p
                  FROM documents)
        ), phrases AS (
            SELECT phrase FROM pieces WHERE length(phrase) > 0
        ), occ AS (
            SELECT phrase, count(*) AS n_occ FROM phrases GROUP BY phrase
        ), iw AS (
            SELECT UNNEST(string_split(phrase, ' ')) AS w,
                   len(string_split(phrase, ' ')) AS plen
            FROM phrases
        ), ws AS (
            SELECT w, count(*) AS freq, sum(plen) AS degree FROM iw GROUP BY w
        ), pw AS (
            SELECT phrase, n_occ, UNNEST(string_split(phrase, ' ')) AS w
            FROM occ
        ), scored AS (
            SELECT phrase, n_occ, count(*) AS n_words,
                   sum(CAST({_exact_mean_sql("degree", "freq", sum_scale=0, out_scale=8)}
                            AS DECIMAL(18,8))) AS s
            FROM pw JOIN ws USING (w) GROUP BY phrase, n_occ
        )
        SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
               CAST(n_occ AS BIGINT) AS n_occurrences,
               CAST(round(s, 4) AS DOUBLE) AS rake_score
        FROM scored ORDER BY rake_score DESC, phrase ASC LIMIT 20
    """,
    # r9: term burstiness — VMR over all docs from integer sufficient
    # statistics (zeros in closed form, never densified)
    "text_burstiness": f"""
        WITH per_doc AS (
            SELECT doc_id, w, count(*) AS c
            FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY doc_id, w
        ), nd AS (
            SELECT count(*) AS n_docs FROM documents
        ), stats AS (
            SELECT w, count(*) AS df, sum(c) AS total,
                   sum(c * c) AS sumsq
            FROM per_doc GROUP BY w
        )
        SELECT w AS term, CAST(df AS BIGINT) AS df,
               CAST(total AS BIGINT) AS total,
               CAST({_exact_mean_sql("(n_docs * sumsq - total * total)", "(n_docs * total)", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS vmr
        FROM stats, nd WHERE total >= 50
        ORDER BY vmr DESC, term ASC LIMIT 20
    """,
    # r9: A/B experiment health — md5 50/50 split, SRM chi-square,
    # Welch z from integer sufficient sums
    "a52_ab_experiment_health": f"""
        WITH pu AS (
            SELECT CASE WHEN {_md5_bucket("user_id", 100)} < 50
                   THEN 'A' ELSE 'B' END AS arm,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS p
            FROM events GROUP BY user_id
        ), wide AS (
            SELECT sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
                   sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
                   sum(CASE WHEN arm = 'A' THEN p ELSE 0 END) AS sa,
                   sum(CASE WHEN arm = 'B' THEN p ELSE 0 END) AS sb,
                   sum(CASE WHEN arm = 'A' THEN p * p ELSE 0 END) AS qa,
                   sum(CASE WHEN arm = 'B' THEN p * p ELSE 0 END) AS qb
            FROM pu
        ), en AS (
            SELECT na, nb, sa, sb,
                   CAST({_exact_mean_sql("((na - nb) * (na - nb))", "(na + nb)", sum_scale=0, out_scale=4)}
                        AS DOUBLE) AS chi2_srm,
                   CAST((na - nb) * (na - nb) AS DOUBLE)
                       / CAST(na + nb AS DOUBLE) > 3.841 AS srm_flag,
                   round((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                          - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
                         / sqrt((CAST(na * qa - sa * sa AS DOUBLE)
                                 / (CAST(na AS DOUBLE)
                                    * (CAST(na AS DOUBLE) - 1.0)))
                                / CAST(na AS DOUBLE)
                                + (CAST(nb * qb - sb * sb AS DOUBLE)
                                   / (CAST(nb AS DOUBLE)
                                      * (CAST(nb AS DOUBLE) - 1.0)))
                                / CAST(nb AS DOUBLE)),
                         4) AS z_mean_diff
            FROM wide
        )
        SELECT 'A' AS arm, CAST(na AS BIGINT) AS n_users,
               CAST(sa AS BIGINT) AS n_purchases,
               CAST({_exact_mean_sql("sa", "na", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS mean_purchases,
               chi2_srm, srm_flag, z_mean_diff
        FROM en
        UNION ALL
        SELECT 'B', CAST(nb AS BIGINT), CAST(sb AS BIGINT),
               CAST({_exact_mean_sql("sb", "nb", sum_scale=0, out_scale=4)}
                    AS DOUBLE),
               chi2_srm, srm_flag, z_mean_diff
        FROM en
        ORDER BY arm
    """,
    # r9: PCA principal-direction audit — identical eight unrolled
    # power-iteration rounds over the rounded-DECIMAL covariance
    "embed_pca_power_iteration": """
        WITH e AS (
            SELECT vec_id, i - 1 AS d,
                   CAST(round(CAST(embedding[i] AS DOUBLE), 8)
                        AS DECIMAL(18,8)) AS x
            FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        ), means AS (
            SELECT d, ((CASE WHEN CAST(sum(x) * 100000000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(x) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(x) * 100000000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 100000000.0) AS mu
            FROM e GROUP BY d
        ), centered AS (
            SELECT vec_id, d, round(CAST(x AS DOUBLE) - mu, 8) AS xc
            FROM e JOIN means USING (d)
        ), cov AS MATERIALIZED (
            SELECT a.d AS i, b.d AS j,
                   round(CAST(sum(CAST(round(a.xc * b.xc, 8)
                                  AS DECIMAL(28,8))) AS DOUBLE), 8) AS c
            FROM centered a JOIN centered b USING (vec_id)
            GROUP BY a.d, b.d
        ), v0 AS (
            SELECT j, CAST(0.12345678 AS DOUBLE) AS v
            FROM UNNEST(range(0, 64)) AS t(j)
        )"""
    + "".join(
        f""",
        w{r} AS MATERIALIZED (
            SELECT i, round(CAST(sum(CAST(round(c * v, 8)
                           AS DECIMAL(18,8))) AS DOUBLE), 8) AS w
            FROM cov JOIN v{r-1} ON cov.j = v{r-1}.j GROUP BY i
        ),
        n{r} AS MATERIALIZED (
            SELECT sqrt(CAST(sum(CAST(round(w * w, 8) AS DECIMAL(18,8)))
                        AS DOUBLE)) AS nrm
            FROM w{r}
        ),
        v{r} AS MATERIALIZED (
            SELECT i AS j, round(w / nrm, 8) AS v FROM w{r}, n{r})"""
        for r in range(1, 9)
    )
    + """,
        w9 AS MATERIALIZED (
            SELECT i, round(CAST(sum(CAST(round(c * v, 8)
                           AS DECIMAL(18,8))) AS DOUBLE), 8) AS w
            FROM cov JOIN v8 ON cov.j = v8.j GROUP BY i
        ),
        lam AS (
            SELECT round(CAST(sum(CAST(round(v8.v * w9.w, 8)
                          AS DECIMAL(18,8))) AS DOUBLE), 8) AS eigenvalue
            FROM v8 JOIN w9 ON v8.j = w9.i
        ),
        tr AS (
            SELECT round(CAST(sum(CAST(c AS DECIMAL(18,8))) AS DOUBLE), 8)
                   AS trace
            FROM cov WHERE i = j
        )
        -- round-ok: v is sqrt-normalized (continuous)
        SELECT v8.j AS dim, round(v8.v, 6) AS loading, eigenvalue,
               round(eigenvalue / trace, 6) AS var_share
        FROM v8, lam, tr ORDER BY dim
    """,
    # r9: near-dup cluster over-merge audit — same pair set + CC as
    # dedup_clusters, aggregated per component
    "dedup_cluster_audit": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        edges AS (
            SELECT id_a AS a, id_b AS b FROM jaccards
            UNION
            SELECT id_b AS a, id_a AS b FROM jaccards
        ),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        labels AS (
            SELECT a AS doc_id,
                   CAST(least(a, min(b)) AS BIGINT) AS component_id
            FROM reach GROUP BY a
        ),
        comp_sizes AS (
            SELECT component_id, count(*) AS size FROM labels GROUP BY 1
        ),
        ce AS (
            SELECT l.component_id, count(*) AS n_edges,
                   min(j.jaccard) AS min_edge_jaccard,
                   ((CASE WHEN CAST(sum(CAST(j.jaccard AS DECIMAL(8,4))) * 10000 AS HUGEINT) < 0 THEN -((2 * abs(CAST(sum(CAST(j.jaccard AS DECIMAL(8,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) ELSE ((2 * abs(CAST(sum(CAST(j.jaccard AS DECIMAL(8,4))) * 10000 AS HUGEINT)) * 1 + (CAST(count(*) AS HUGEINT) * 1)) // (2 * (CAST(count(*) AS HUGEINT) * 1))) END) / 10000.0) AS mean_edge_jaccard
            FROM jaccards j JOIN labels l ON j.id_a = l.doc_id
            GROUP BY l.component_id
        )
        SELECT component_id, size, n_edges,
               CAST({_exact_mean_sql("(n_edges * 2)", "(size * (size - 1))", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS edge_density,
               min_edge_jaccard, mean_edge_jaccard
        FROM comp_sizes JOIN ce USING (component_id) ORDER BY component_id
    """,
    # r9: SRP recall audit — brute-force top-5 and bucketed top-5
    # replayed (the embed_knn_topk / embed_srp_ann constructions),
    # joined per query
    "embed_srp_recall_audit": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id < 50
        ), c AS (
            SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
        ), fscored AS (
            SELECT q.query_id, c.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM c CROSS JOIN q
            WHERE c.neighbor_id <> q.query_id
        ), full5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id ASC) AS rn
                FROM fscored
            ) WHERE rn <= 5
        ), qb AS (
            SELECT vec_id AS query_id, embedding AS qv,
                   {_srp_bucket('embeddings')} AS bucket
            FROM embeddings WHERE vec_id < 50
        ), cb AS (
            SELECT vec_id AS neighbor_id, embedding AS cv,
                   {_srp_bucket('embeddings')} AS bucket
            FROM embeddings
        ), sscored AS (
            SELECT q.query_id, c.neighbor_id,
                   round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) AS cosine
            FROM cb c JOIN qb q ON c.bucket = q.bucket
            WHERE c.neighbor_id <> q.query_id
        ), srp5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id ASC) AS rn
                FROM sscored
            ) WHERE rn <= 5
        ), acounts AS (
            SELECT query_id, count(*) AS n_ann FROM srp5 GROUP BY query_id
        ), h AS (
            SELECT f.query_id,
                   sum(CASE WHEN s.neighbor_id IS NOT NULL
                       THEN 1 ELSE 0 END) AS hits
            FROM full5 f LEFT JOIN srp5 s
              ON f.query_id = s.query_id AND f.neighbor_id = s.neighbor_id
            GROUP BY f.query_id
        )
        SELECT query_id, CAST(coalesce(n_ann, 0) AS BIGINT) AS n_ann,
               CAST(hits AS BIGINT) AS hits,
               CAST({_exact_mean_sql("hits", "5", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS recall_at_5
        FROM h LEFT JOIN acounts USING (query_id) ORDER BY query_id
    """,
    # r9: rolling 14-day Pearson vs the all-types total — integer
    # sufficient statistics inside the window, one double division out
    "w15_rolling_corr": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
            FROM events GROUP BY 1, 2
        ), tot AS (
            SELECT day, sum(x) AS y FROM daily GROUP BY day
        ), j AS (
            SELECT event_type, day, x, y FROM daily JOIN tot USING (day)
        ), stats AS (
            SELECT event_type, day,
                   count(*) OVER w AS n,
                   sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                   sum(x * y) OVER w AS sxy,
                   sum(x * x) OVER w AS sxx,
                   sum(y * y) OVER w AS syy
            FROM j
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, day,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)),
                     4) AS corr_with_total
        FROM stats WHERE n = 14 ORDER BY event_type, day
    """,
    # r11: curriculum ordering — difficulty ntile + deterministic md5
    # within-stage shuffle; all integer arithmetic
    "sample_curriculum_order": f"""
        WITH staged AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   ntile(10) OVER (ORDER BY n_chars, doc_id) AS stage,
                   CAST({_md5_bucket("doc_id", 4294967296)} AS BIGINT)
                       AS hash_ord
            FROM documents
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, n_chars,
               CAST(stage AS BIGINT) AS stage, hash_ord,
               CAST(row_number() OVER (ORDER BY stage, hash_ord, doc_id)
                    AS BIGINT) AS curriculum_pos
        FROM staged ORDER BY curriculum_pos
    """,
    # r11: BH step-up FDR over per-type KS drift p-values; D is the
    # exact integer rational, p is quantized to DECIMAL(18,8) before
    # any rank/compare (round-before-compare), the BH threshold test
    # p <= i*0.05/m runs as the exact decimal comparison p8*(20m) <= i
    "a54_bh_drift_fdr": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS v
            FROM events GROUP BY 1, 2
        ), cut AS (SELECT min(day) + 15 AS _cut FROM daily),
        marked AS (
            SELECT event_type, v,
                   CASE WHEN day < _cut THEN 1 ELSE 0 END AS is_ref
            FROM daily, cut
        ), counts AS (
            SELECT event_type, v, sum(is_ref) AS nr,
                   sum(1 - is_ref) AS nc
            FROM marked GROUP BY event_type, v
        ), cum AS (
            SELECT event_type,
                   sum(nr) OVER wv AS c_ref,
                   sum(nc) OVER wv AS c_cur,
                   sum(nr) OVER wt AS n_ref,
                   sum(nc) OVER wt AS n_cur
            FROM counts
            WINDOW wv AS (PARTITION BY event_type ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW),
                   wt AS (PARTITION BY event_type)
        ), per_type AS (
            SELECT event_type,
                   max(abs(c_ref * n_cur - c_cur * n_ref)) AS d_num,
                   max(n_ref) AS n_ref, max(n_cur) AS n_cur
            FROM cum GROUP BY event_type
        ), scored AS (
            SELECT event_type,
                   CAST({_exact_mean_sql("d_num", "(n_ref * n_cur)", sum_scale=0, out_scale=6)}
                        AS DOUBLE) AS d_stat,
                   -- round-ok: quantize-before-compare (exp is continuous)
                   CAST(round(least(2.0 * exp(-2.0
                            * CAST(d_num * d_num AS DOUBLE)
                            / CAST(n_ref * n_cur * (n_ref + n_cur)
                                   AS DOUBLE)), 1.0), 8)
                        AS DECIMAL(18,8)) AS p8
            FROM per_type
        ), ranked AS (
            SELECT event_type, d_stat, p8,
                   row_number() OVER (ORDER BY p8, event_type) AS p_rank,
                   count(*) OVER () AS m
            FROM scored
        )
        SELECT event_type, d_stat, CAST(p8 AS DOUBLE) AS p_value,
               CAST(p_rank AS BIGINT) AS p_rank,
               p_rank <= max(CASE WHEN p8 * (20 * m) <= p_rank
                                  THEN p_rank ELSE 0 END) OVER ()
                   AS bh_reject
        FROM ranked ORDER BY p_rank
    """,
    # r11: measured PQ/ADC recall@5 vs brute force — completes the ANN
    # audit family (SRP bucketing: embed_srp_recall_audit; dimension
    # cut: embed_truncated_recall; byte-code quantization: this).
    # Shares _PQ_ADC_CTES with embed_pq_adc so the replayed
    # quantization cannot drift between the score query and its audit.
    "embed_pq_recall_audit": f"""
{_PQ_ADC_CTES},
        pq5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY adc_dot DESC, neighbor_id ASC) AS rn
                FROM scored
            ) WHERE rn <= 5
        ), bq AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id < 50
        ), bc AS (
            SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
        ), fscored AS (
            SELECT bq.query_id, bc.neighbor_id,
                   round({_COS_DOT_BQ} / ({_COS_NC_BC} * {_COS_NQ_BQ}), 4)
                       AS cosine
            FROM bc CROSS JOIN bq
            WHERE bc.neighbor_id <> bq.query_id
        ), full5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id ASC) AS rn
                FROM fscored
            ) WHERE rn <= 5
        ), h AS (
            SELECT f.query_id,
                   sum(CASE WHEN p.neighbor_id IS NOT NULL
                       THEN 1 ELSE 0 END) AS hits
            FROM full5 f LEFT JOIN pq5 p
              ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
            GROUP BY f.query_id
        )
        SELECT query_id, CAST(hits AS BIGINT) AS hits,
               CAST({_exact_mean_sql("hits", "5", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS recall_at_5
        FROM h ORDER BY query_id
    """,
    # r12: trained-codebook PQ/ADC at the shipping 32×16 config —
    # full Lloyd's training replayed in SQL (see _pq_trained_ctes)
    "embed_pq_adc_trained": f"""
{_PQ_TRAINED_CTES}
        SELECT query_id, neighbor_id, adc_dot, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_dot DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    # r12: the end-to-end pretraining composition — the ENTIRE scored
    # curation cascade (shared _CURATION_SCORED_CTE, so this chain
    # cannot drift from curation_pipeline_scored's), then train
    # split, curriculum ntile + md5 within-stage shuffle, and token
    # shards packed along the curriculum order. One CTE cascade on
    # one config constant: any stage-contract drift hash-mismatches.
    "pretrain_composition": f"""
        WITH RECURSIVE {_CURATION_SCORED_CTE},
        p_assigned AS (
            SELECT *,
                   CASE WHEN {_md5_bucket("doc_id", 100)} < 80 THEN 'train'
                        WHEN {_md5_bucket("doc_id", 100)} < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM curated
        ),
        p_staged AS (
            SELECT doc_id, quality, detected_lang, n_tokens, component_id,
                   ntile(10) OVER (ORDER BY n_tokens, doc_id) AS stage,
                   CAST({_md5_bucket("doc_id", 4294967296)} AS BIGINT)
                       AS hash_ord
            FROM p_assigned WHERE split = 'train'
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, quality, detected_lang,
               CAST(n_tokens AS BIGINT) AS n_tokens, component_id,
               CAST(stage AS BIGINT) AS stage, hash_ord,
               CAST(row_number() OVER (ORDER BY stage, hash_ord, doc_id)
                    AS BIGINT) AS curriculum_pos,
               CAST(floor(COALESCE(sum(n_tokens) OVER (
                   ORDER BY stage, hash_ord, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {float(_CURCFG_SCORED["shard_tokens"])}) AS BIGINT)
                   AS curriculum_shard
        FROM p_staged ORDER BY curriculum_pos
    """,
    # r12: LSH banding recall audit — exact inverted-index truth leg,
    # md5 minhash signatures (32 hashes, 8 bands × 4 rows) replayed
    # bit-for-bit, per-true-pair band-collision counts. Threshold as
    # exact integer compare (inter·2 ≥ union for 0.5).
    "dedup_lsh_recall_audit": f"""
        WITH words AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        shingles AS (
            SELECT DISTINCT doc_id,
                   list_aggregate(w[i:i+2], 'string_agg', ' ') AS sh
            FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 3
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        pair_inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
            FROM shingles a JOIN shingles b
              ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        truth AS (
            SELECT id_a, id_b, inter, sa.n + sb.n - inter AS un
            FROM pair_inter
            JOIN sizes sa ON id_a = sa.doc_id
            JOIN sizes sb ON id_b = sb.doc_id
            WHERE inter * 2 >= sa.n + sb.n - inter
        ),
        hx AS (
            SELECT doc_id, g.i,
                   min(CAST({_md5_bucket("CAST(g.i AS VARCHAR) || '|' || sh",
                                         4294967296)} AS BIGINT)) AS mh
            FROM shingles, (SELECT unnest(range(0, 32)) AS i) g
            GROUP BY doc_id, g.i
        ),
        bandtab AS (
            SELECT doc_id, i // 4 AS band_no,
                   string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bk
            FROM hx GROUP BY doc_id, i // 4
        ),
        cand AS (
            SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                   count(DISTINCT l.band_no) AS nb
            FROM bandtab l JOIN bandtab r
              ON l.band_no = r.band_no AND l.bk = r.bk
                 AND l.doc_id < r.doc_id
            GROUP BY 1, 2
        )
        SELECT t.id_a, t.id_b,
               CAST({_exact_mean_sql("inter", "un", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS jaccard,
               CAST(COALESCE(c.nb, 0) AS BIGINT) AS n_bands_hit,
               (c.nb IS NOT NULL) AS caught
        FROM truth t LEFT JOIN cand c USING (id_a, id_b)
        ORDER BY id_a, id_b
    """,
    # r12: fully-trained IVF-PQ — BOTH training loops replayed (the
    # embed_ivf_kmeans cosine k-means chain for the coarse cells, the
    # _pq_trained_cb squared-L2 chain — prefixed 't' to keep CTE
    # names disjoint — for the codebook) plus the IVF-PQ composition
    "embed_ivf_pq_trained": f"""
        WITH cent0 AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 8
        ), {_kmeans_iter('cent0', 1)}, {_kmeans_iter('cent1', 2)},
        ranked AS (
            SELECT q.vec_id, c.cell,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({_COS_DOT} / ({_COS_NC} * {_COS_NQ}), 4) DESC,
                                c.cell ASC) AS cr
            FROM (SELECT vec_id, embedding AS qv FROM embeddings) q
            CROSS JOIN cent2 c
        ), corpus_cell AS (
            SELECT vec_id AS pid, cell FROM ranked WHERE cr = 1
        ), probes AS (
            SELECT vec_id AS query_id, cell
            FROM ranked WHERE cr <= 2 AND vec_id < 20
        ),
        {_pq_trained_cb(prefix="t")[0]},
        pqcand AS (
            SELECT e.vec_id AS pid, cb.sub, cb.cw,
                   list_sum(list_transform(
                       list_zip(e.embedding[cb.sub * 2 + 1 : cb.sub * 2 + 2],
                                cb.subvec),
                       x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                            * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                   )) AS dist
            FROM embeddings e CROSS JOIN tcb2 cb
        ),
        codes AS (
            SELECT pid, sub, cw FROM (
                SELECT pid, sub, cw,
                       row_number() OVER (PARTITION BY pid, sub
                                          ORDER BY dist, cw) AS rn
                FROM pqcand
            ) WHERE rn = 1
        ),
        qtab AS (
            SELECT q.vec_id AS query_id, cb.sub, cb.cw,
                   CAST(round(list_sum(list_transform(
                       list_zip(q.embedding[cb.sub * 2 + 1 : cb.sub * 2 + 2],
                                cb.subvec),
                       x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)
                   )), 6) AS DECIMAL(18,6)) AS contrib
            FROM embeddings q CROSS JOIN tcb2 cb
            WHERE q.vec_id < 20
        ),
        pairs AS (
            SELECT DISTINCT p.query_id, cc.pid
            FROM probes p JOIN corpus_cell cc USING (cell)
            WHERE cc.pid <> p.query_id
        ),
        scored AS (
            SELECT pr.query_id, pr.pid AS neighbor_id,
                   CAST(sum(t.contrib) AS DOUBLE) AS adc_dot
            FROM pairs pr
            JOIN codes c ON c.pid = pr.pid
            JOIN qtab t ON t.query_id = pr.query_id
                       AND t.sub = c.sub AND t.cw = c.cw
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, adc_dot, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY adc_dot DESC, neighbor_id ASC) AS rn
            FROM scored
        ) WHERE rn <= 5
    """,
    # r12: the audit re-run against the trained 32×16 index — shares
    # _PQ_TRAINED_CTES with embed_pq_adc_trained so the audited
    # quantization cannot drift from the audit
    "embed_pq_trained_recall_audit": f"""
{_PQ_TRAINED_CTES},
        pq5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY adc_dot DESC, neighbor_id ASC) AS rn
                FROM scored
            ) WHERE rn <= 5
        ), bq AS (
            SELECT vec_id AS query_id, embedding AS qv FROM embeddings
            WHERE vec_id < 50
        ), bc AS (
            SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
        ), fscored AS (
            SELECT bq.query_id, bc.neighbor_id,
                   round({_COS_DOT_BQ} / ({_COS_NC_BC} * {_COS_NQ_BQ}), 4)
                       AS cosine
            FROM bc CROSS JOIN bq
            WHERE bc.neighbor_id <> bq.query_id
        ), full5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id ASC) AS rn
                FROM fscored
            ) WHERE rn <= 5
        ), h AS (
            SELECT f.query_id,
                   sum(CASE WHEN p.neighbor_id IS NOT NULL
                       THEN 1 ELSE 0 END) AS hits
            FROM full5 f LEFT JOIN pq5 p
              ON f.query_id = p.query_id AND f.neighbor_id = p.neighbor_id
            GROUP BY f.query_id
        )
        SELECT query_id, CAST(hits AS BIGINT) AS hits,
               CAST({_exact_mean_sql("hits", "5", sum_scale=0, out_scale=4)}
                    AS DOUBLE) AS recall_at_5
        FROM h ORDER BY query_id
    """,
}
