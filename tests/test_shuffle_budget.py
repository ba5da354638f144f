"""Shuffle-budget pins: the per-query exchange counts documented in
docs/SCALE.md, asserted against the physical plan so an accidental
extra shuffle (a lost broadcast, a re-partition regression, an
aggregate that stopped being partial) fails CI instead of shipping.

Counts SHUFFLE exchanges only (hash/range/single-partition).
BroadcastExchange is excluded — broadcasting a dim is the cheap move
these budgets exist to protect. AQE is disabled for the probe so the
static plan is visible; at runtime AQE can only coalesce/convert
these further, never add exchanges.
"""

from __future__ import annotations

import re

import pytest

from pipelines_spark.queries import QUERIES

#: query -> max shuffle exchanges allowed in the static plan
#: (current counts pinned exactly — a +1 regression is precisely the
#: lost-broadcast/extra-repartition case this test exists to catch)
BUDGETS = {
    # one agg exchange; scan-side partial agg
    "q1_pricing_summary": 1,
    # ALL dims broadcast: a 3-table (q3) / 6-table (q5) join tree
    # costs exactly one shuffle — the aggregation's
    "q3_shipping_priority": 1,
    "q5_local_supplier_volume": 1,
    # pre-aggregate below the join + final agg
    "revenue_by_month": 2,
    "top_customers_by_revenue": 2,
    # single window partitioning
    "a3_latest_event_per_user": 1,
    "w4_rolling_hourly_sum": 1,
    "w6_sessionize": 1,
    # one agg over (date, hour)
    "a7_hourly_event_counts": 1,
    # broadcast anchors -> map-side cross, one per-cell window
    "j9_idw_interpolation": 1,
    # hash once on the dedup key
    "dedup_exact": 1,
    # per-key bounds agg + gap window
    "j5_capture_gaps": 2,
    # per-key bounds agg + one union-window partitioning
    "w8_resample_interpolate": 2,
    # collect_set agg + retention-cell agg; no join, no distinct expand
    "a20_cohort_retention": 2,
    # distinct purchase days + island window (streak agg reuses it)
    "w9_activity_islands": 2,
    # candidate merge only — the full key set never shuffles
    "a21_kmv_distinct": 1,
    # one user_id exchange shared by all three windows + global rollup
    "a22_funnel_conversion": 2,
    # lead window; the per-user agg reuses the clustering
    "w10_time_weighted_avg": 1,
    # one user_id window exchange + the tiny touch-type aggregate
    "w11_last_touch_attribution": 2,
    # basket agg + pair agg; the array pair expansion is map-side —
    # no self-join, no third exchange
    "j15_part_cooccurrence": 2,
    # moments agg (broadcast back onto the scan) — the outlier filter
    # itself is map-side
    "a23_value_outliers": 1,
    # decorrelated lateral == window top-k: one exchange
    "j17_lateral_topk": 1,
    # (user, type) count agg + per-user mode window
    "a24_mode_per_group": 2,
    # per-(doc,term) min agg + per-term rollup
    "o13_token_positions": 2,
    # one wide agg with countDistinct expand; stack() is projection
    "a25_column_profile": 2,
    # digit agg + 1-row total + broadcast-join back
    "a26_benford_digits": 3,
    # `oriented` is an eager localCheckpoint feeding the adjacency
    # build + the per-edge probe: adjacency agg, lo-join, hi-join,
    # final 1-row sum — the candidate-pair relation never
    # materializes. The checkpoint makes the probe
    # cache-state-independent — the r4 flap (19 vs 55 depending on
    # test order) came from persist() re-expanding lineage.
    "graph_triangles": 5,
    # every loop invariant (edges, nodes, outdeg) is checkpointed and
    # the per-iteration ranks carry a lazy lineage cut — the returned
    # plan is a stored scan
    "graph_pagerank": 0,
    # edge invariant checkpointed + per-hop frontier lineage cut; the
    # visible plan is the final union over stored scans
    "graph_khop_reach": 1,
    # k-means bucket staging is checkpointed; visible plan = bucketed
    # pair join + dedup exchange
    "dedup_semantic": 1,
    # 16-row centroid collect + literal codebook (r12: encode/qtab are
    # map-only literal-argmin projections — the codebook broadcast and
    # the encode's (pid, sub) argmin shuffle are gone): cell equi-join
    # is broadcast; exchanges = ADC agg + top-k window
    "embed_ivf_pq": 2,
    # window expansion is map-side (explode of 4 assignments); one
    # agg exchange on (window_start, event_type)
    "t3_sliding_window": 1,
    # hour-grid agg + baseline agg (broadcast back) — z filter map-side
    "a27_seasonal_anomaly": 2,
    # both sides fingerprint map-side; one full-outer sort-merge join
    # = one exchange per side
    "o14_snapshot_diff": 2,
    # visible plan = rollup agg only — the pointer-doubling closure's
    # per-round join/distinct shuffles sit behind its localCheckpoint
    # lineage cut (bounded at ceil(log2(depth)) rounds by design)
    "graph_hierarchy_rollup": 1,
    # map-only A-ES scoring + one WindowGroupLimit top-k exchange
    "sample_weighted_topk": 1,
    # visible plan: candidate distinct + pair aggregate; the 4-window
    # feature pipeline (term-df, doc-norm, term-maxweight, suffix
    # bound) sits behind the feats localCheckpoint lineage cut
    "text_tfidf_pairs": 2,
    # sketch agg (bounded at depth x width keys/partition) + probe
    # distinct + exact-count agg; the sketch joins back via broadcast
    "a28_cms_frequencies": 3,
    # unigram agg + bigram agg + two scoring joins + doc regroup +
    # vocab 1-row agg; all linear, no pairwise stage
    "text_ngram_entropy": 6,
    # dup-hash agg + mark join + per-doc summary (islands window
    # reuses the doc_id exchange)
    "text_dup_spans": 3,
    # posting-list pair agg + size joins (sizes broadcast)
    "dedup_containment": 2,
    # counts agg + 1-row anchor + kept-count agg + tiny rate/sample
    # joins (20-row frames — AQE broadcasts them at runtime)
    "sample_mixture_rates": 5,
    # register agg (map-capped at 2^b keys) + 1-row estimate +
    # exact count-distinct (2: expand + global)
    "a29_hll_distinct": 4,
    # grouped register agg + per-group estimate + exact distinct +
    # final join on the tiny group key
    "a30_hll_by_type": 5,
    # full-side agg + sample-side agg + join on the group key
    "a31_sampled_percentiles": 3,
    # two corpus-sized bin aggs; everything after operates on
    # (groups x bins)-sized frames — the 5-way spine join exchanges
    # are tiny by construction and AQE broadcasts them at runtime
    "a32_psi_drift": 10,
    # daily agg + seq window + t_last agg + term join + final agg
    "w13_ses_forecast": 5,
    # one corpus-sized register agg + one distinct-pair agg for the
    # exact side; every window merge operates on (days x 256)-row
    # register tables — the range joins and re-aggs are tiny
    "a33_hll_rolling_distinct": 8,
    # word-frequency agg + token regroup (encode folds are map-only;
    # training actions run before the returned plan)
    "text_bpe_top_tokens": 2,
    # --- r5 additions: the rest of the expensive/structural set ----
    # training actions run before the returned plan; visible plan =
    # broadcast probe + cell equi-join + one top-k window exchange
    "embed_ivf_kmeans": 1,
    # single Expand pass — CUBE never re-scans per grouping set
    "a14_cube_revenue": 1,
    # bucketed candidate join (one stored corpus key) + top-k window
    "embed_srp_multiprobe": 1,
    # r12: collected literal codebook — encode + qtab are map-only
    # projections (no codebook broadcast, no (pid, sub) argmin
    # shuffle); exchanges = ADC agg + top-k window
    "embed_pq_adc": 2,
    # two sub-corpus KMV sketches + set-algebra spine: every exchange
    # moves <= k x partitions candidate rows, never the key sets
    "a34_kmv_set_ops": 12,
    # grouped KMV candidates + per-group estimate + tiny group join
    "a36_kmv_by_type": 5,
    # band-bucket candidate join + verify join on the cached staging
    "dedup_minhash_lsh": 2,
    # posting-list pair agg; sizes broadcast back
    "dedup_ngram_jaccard": 1,
    # capped mode adds the surviving-sizes agg + static size joins
    # (AQE broadcasts the tiny sizes frames at runtime)
    "dedup_ngram_capped": 3,
    # + the orderBy range exchange
    "dedup_containment_capped": 4,
    # probe set broadcast — corpus shuffles only for the doc agg
    "text_decontamination": 3,
    # change-detection window + validity interval window
    "scd2_order_history": 2,
    # ALL dims broadcast over the 4-table tree; one agg exchange
    "q7_nation_volume": 1,
    "q9_product_profit": 1,
    # per-block pair join + exact verify (sizes ride the rows)
    "j13_fuzzy_name_match": 2,
    # as-of union-window + tolerance filter: one exchange per side
    "j16_asof_tolerance": 2,
    # stack() unpivot is projection; agg + final exchange
    "o10_unpivot": 2,
    # all six rank flavors share ONE partitioning exchange
    "w7_rank_gauntlet": 1,
    # salted partial agg + final de-salt agg
    "a15_salted_event_totals": 2,
    # one Expand pass for the explicit sets
    "a17_grouping_sets_revenue": 1,
    # term stats + doc norms + score agg; query terms broadcast
    "text_bm25_search": 3,
    # md5-hash shard assignment is map-only; one pack agg
    "sample_token_shards": 1,
    # line-frequency agg + mark join + per-doc regroup + rollup
    "text_boilerplate_stats": 4,
    # r7: day-bucketed interval-overlap join — one exchange per join
    # side on (user_id, day); pair-DISTINCT + per-user count are
    # partial aggs on the same clustering, TakeOrdered absorbs top-10
    "j18_interval_overlap": 2,
    # returnflag window (cumulative + total share one exchange) + agg
    "a37_weighted_median": 2,
    # revenue agg -> per-nation rank window -> gini agg (orders joins
    # customer broadcast; final ORDER BY folds into the small result)
    "a38_gini_concentration": 3,
    # r7: per-user pack agg + single-partition global rollup; the
    # step fold and the wide->long explode are map-side
    "funnel_windowed_conversion": 2,
    # one sufficient-statistics agg + the 5-row ORDER BY range
    # exchange; slope/intercept/r arithmetic is projection
    "trend_by_event_type": 2,
    # exact mode: one Expand-backed multi-distinct agg (partial +
    # final = 2 exchanges); approx mode drops the Expand (pinned in
    # test_operators.py::test_profile_columns_exact_and_approx)
    "profile_documents": 2,
    # one real (user_id sequence window) exchange; pair agg reshuffle
    # + row-normalize window + ORDER BY all move the <= |types|^2
    # transition matrix, not event rows
    "w12_event_transitions": 4,
    # same shape as funnel_windowed_conversion: pack agg + global agg
    "funnel_time_to_convert": 2,
    # r7: LPA loop frames are lineage-cut (staged per round); the
    # static plan shows only the final community-count aggregate —
    # TakeOrdered absorbs the top-15
    "graph_communities": 1,
    # r7: cell assignment is map-only; at sf0.01 statistics broadcast
    # one join side, so the static plan's one exchange is the per-src
    # top-k window (at corpus scale the join adds its own two —
    # that's the designed posture, not a regression this pin guards)
    "embed_knn_graph": 1,
    # r7: source window (WindowGroupLimit-bounded, verified in plan)
    # + totals agg + final ORDER BY over the tiny per-source rows;
    # the kept-side agg reuses the window's source clustering
    "sample_source_cap": 3,
    # r7: literal-mode probe is a pure codegen filter (the bitmap
    # build+collect happens at query-build time, outside this plan);
    # remaining exchanges: revenue agg + tiny ORDER BY; the exact
    # semi-join broadcasts
    "j19_bloom_semi_reduction": 2,
    # r7: daily agg + per-type target agg + event_type window + final
    # agg + tiny ORDER BY — the CUSUM recursion itself is two window
    # passes inside the one event_type ordering, zero extra exchanges
    "a39_cusum_changepoints": 5,
    # r7: daily agg + event_type window + pair self-join reusing the
    # type clustering + slope-median agg (broadcast back) + residual
    # agg + tiny ORDER BY — the pair explosion runs on the
    # |types|x|days| aggregate, never the event table
    "trend_theilsen_by_type": 5,
    # r7: staged bi edge list shared by LPA + modularity; remaining
    # exchanges are the operator's defensive distinct, the two
    # node-keyed label joins, the per-community/member aggs, and the
    # tiny ORDER BY — all O(|E|) or O(|communities|)
    "graph_modularity": 7,
    # r7: the percentile agg's partial+final pair + bucket agg; the
    # boundaries broadcast back and bucketing is a map-side array
    # filter — the global-ntile single-reducer funnel never exists
    "a40_equidepth_histogram": 3,
    # r7: knn_graph plan + the per-cell neighbor-cap window's _cell
    # exchange (the top-k window is the other)
    "embed_knn_graph_capped": 2,
    # r8: df-frequency agg + per-doc prefix window + prefix self-join
    # + candidate dedup + the two verify joins' id exchanges
    "dedup_prefix_jaccard": 6,
    # r8: two (row, bucket) sketch aggs (partial+final pairs), the
    # tiny inner-product join/agg, and two per-key count aggs for the
    # exact comparison — every exchange is sketch- or key-bounded.
    # r9: +3 for the zero-overlap fix — the row_idx spine (a distinct
    # over the two depth-row sets) left-joins the per-row products so
    # a no-shared-bucket row contributes 0 instead of vanishing; all
    # three new exchanges move ≤ depth rows
    "a41_cms_join_size": 10,
    # r8: bigram agg + unigram agg + the two unigram joins; totals
    # broadcast
    "text_pmi_collocations": 5,
    # r8: BM25's doc agg + top-k + the dense leg's global window +
    # the fusion full-outer join
    "search_hybrid_rrf": 6,
    # r8: two brute-force rankings (per-query windows) + overlap join
    # + per-query agg
    "embed_truncated_recall": 7,
    # r8: per-side counts fold into the except/intersect rewrite —
    # one agg exchange each + the final union agg
    "o15_multiset_ops": 3,
    # r8: first-occurrence agg + doc-token agg + decile grid + two
    # range-join aggs + the 10-row fit — growth-curve exchanges are
    # word/doc-keyed once each, grid-side all tiny
    "text_heaps_law": 9,
    # r8: base stats agg + the (col, bucket) register agg + per-col
    # register rollup; no Expand anywhere (pinned in test_operators)
    "profile_documents_approx": 3,
    # r8: batch/store band tables + candidate dedup + the two verify
    # set joins + the decision left join — all equi-joins on band or
    # id keys; store×store never appears. r9: +4 static exchanges for
    # the candidate-bounded verification (cand_ids dedup + one
    # LeftSemi per corpus leg, and the persisted `sets` subtree is
    # textually inlined twice pre-materialization). At runtime AQE
    # broadcasts the tiny cand_ids side and `sets` materializes once,
    # so the executed count is lower than this static ceiling.
    "dedup_incremental_batch": 10,
    # r9 additions — static no-AQE counts measured at registration;
    # a lost broadcast or stray repartition moves these
    "t4_session_window": 2,  # user-keyed session merge + final sort
    "text_zipf_fit": 1,  # word-count agg; top-200 window is post-limit
    "sample_rendezvous_shards": 2,  # map-side HRW + 8-row rollup + sort
    "a42_ks_drift": 5,  # distinct-value agg + bounded cum window + totals
    "a43_cramers_v": 9,  # contingency cells + three margin joins (tiny)
    "embed_bitext_margin": 6,  # persisted pair tree inlined per consumer
    "embed_bitext_margin_bucketed": 6,  # same, bucket equi-join candidates
    "sample_sequence_packing": 2,  # per-source window + source rollup
    "trend_mann_kendall": 4,  # daily agg + type-keyed pair join + rollup
    "sample_quota_allocation": 6,  # counts + remainder window (20 rows)
    "text_source_overlap": 6,  # distinct words + vocab-keyed self-join
    "text_decontamination_fuzzy": 5,  # shingle agg + probe join + window
    "sample_temperature_mixture": 6,  # counts + two 1-row normalizers
    "a44_acf_daily": 3,  # daily agg + one type window + (type,lag) agg
    "embed_label_cohesion": 4,  # (label,dim) agg + centroid pack + rollup
    "a45_fk_integrity": 12,  # four anti-join legs x (dedup + count aggs)
    "text_fightin_words": 9,  # per-source counts + three margin frames
    "j20_hashed_key_join": 2,  # tokenized equi-join, same as the raw join
    "w14_rolling_median": 3,  # daily agg + percentile window + sort
    "graph_assortativity": 9,  # edges + degree agg + two lookups + stats
    "a47_winsorized_stats": 3,  # percentile bounds + clamped sum agg
    "a48_column_entropy": 21,  # 5 legs x (value counts + totals + term agg)
    "q23_revenue_deciles": 4,  # customer rollup + ntile + decile agg
    "graph_kcore": 12,  # staged peel rounds; per-round degree + semi-joins
    "text_readability_scores": 2,  # per-source agg + sort
    "text_ngram_novelty": 5,  # sizes + argmin + novel aggs, doc join, sort
    "text_quality_linear": 3,  # per-doc agg + per-source agg + sort
    "text_dsir_weights": 4,  # bucket model (counts+totals) + per-doc agg
    "sample_epoch_schedule": 4,  # source agg (x2: totals leg) + sort
    "graph_adamic_adar": 4,  # distinct edges + baskets + sdeg + pair agg
    # static plan folds the 20-row greedy chain under CollectLimit (0
    # exchanges today); headroom for representation-only plan changes
    "embed_mmr_select": 4,
    # distinct + bucket-partitioned window + bucket-summary window
    # (the only global ordering runs on the |keys|/4096 summary)
    "a49_id_gap_audit": 4,
    "a50_table_checksums": 4,  # one single-row agg per table leg
    "text_mattr_diversity": 3,  # (doc,token) lag + per-doc agg + source agg
    "a51_runs_test": 3,  # daily agg + per-type lag windows + final agg
    "w15_rolling_corr": 5,  # daily agg + total agg + window + sort
    # two ranked top-5 legs (window each) + hits agg + n_ann agg + sort
    "embed_srp_recall_audit": 7,
    # visible plan = label joins + sizes/edges/per-component aggs +
    # sort; the CC rounds sit behind their localCheckpoint lineage cut
    "dedup_cluster_audit": 9,
    # means pack + map-side outer-product agg + matvec/norm aggs up
    # to the last lineage cut + eigenvalue/trace aggs + sort — every
    # post-cov frame is <= 4096 rows; the 20M product rows never
    # shuffle (born in the partial aggregate), and the alternate-
    # round localCheckpoints hide the earlier iterations
    "embed_pca_power_iteration": 12,
    "text_keyword_rake": 2,  # word-stats agg + phrase agg (occ broadcast)
    "text_burstiness": 3,  # (doc,term) agg + term agg + sort
    "a52_ab_experiment_health": 3,  # per-user agg + 1-row wide agg + sort
    # bucket counts + totals + dense-grid join legs + pair agg + sort;
    # every post-counts frame is |sources|x256, corpus-independent
    "text_js_divergence_sources": 7,
    # source stats + 1-row total + remainder window over |sources|
    # rows (the only global ordering) + 1-row shortfall + sort
    "sample_neyman_allocation": 6,
    "a53_seasonality_strength": 5,  # daily agg + dow means + joins + agg
    # r11: two global windows over catalogue-granularity rows (the
    # documented total-sort cost; a40-boundary staging at 100 TB)
    "sample_curriculum_order": 2,
    # daily agg + per-value ECDF counts + per-type windows/agg +
    # the m-row global BH windows + the m-row output sort; the date
    # cut broadcasts. Everything after the daily agg is m-row-bounded.
    "a54_bh_drift_fdr": 5,
    # composes the two already-pinned legs (brute-force window + PQ
    # encode argmin + ADC score/top-k) + the hit join/agg/sort; the
    # brute-force leg is the audit's deliberate cost (sampled queries)
    "embed_pq_recall_audit": 7,
    # r12 trained-codebook PQ: training runs eagerly (per-iteration
    # fixed-k collect, kmeans_train discipline), so the FINAL plan is
    # just the literal-argmin encode + ADC score + top-k — the same 2
    # exchanges as embed_pq_adc. Per training iteration (not in this
    # plan): ONE map-side-combined (sub, cw) agg shuffle — the
    # literal-argmin assign is map-only (optimization r12: was 2 agg
    # shuffles + a broadcast join).
    "embed_pq_adc_trained": 2,
    # audit = brute-force leg + trained-PQ leg + hit join/agg/sort
    "embed_pq_trained_recall_audit": 7,
    # r12 end-to-end composition: the curation cascade's shuffles sit
    # behind its lazy localCheckpoint boundaries (LogicalRDD inputs —
    # budgeted stage-by-stage in curate_corpus/SCALE.md, not here);
    # the VISIBLE tail is the curriculum ntile + position + shard
    # cumsum riding ONE catalogue-granularity total sort.
    "pretrain_composition": 1,
    # r12 LSH-banding recall audit: exact-truth leg (shingle join +
    # pair agg) + md5-signature min agg + band-collision join/agg +
    # the final audit join — every stage map-side combinable
    "dedup_lsh_recall_audit": 5,
    # r12 fully-trained IVF-PQ: both training loops run EAGERLY
    # (fixed-k driver state), so the final plan is the embed_ivf_pq
    # probe/encode/ADC shape over literal models
    "embed_ivf_pq_trained": 2,
}


@pytest.fixture(scope="module")
def no_aqe(spark):
    import os

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # The catalog-level scan widen (queries.register, r12) adds one
    # HASH exchange per under-parallel fact-table scan — an
    # infrastructural, kill-switchable addition pinned by its own
    # test (test_plans.py::test_register_widens_fact_scans). These
    # budgets pin the OPERATOR-added shuffles (lost broadcast, extra
    # repartition in operator code), so they probe the un-widened
    # plan.
    os.environ["SPARK_GRAFT_NO_WIDEN"] = "1"
    yield spark
    del os.environ["SPARK_GRAFT_NO_WIDEN"]
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def _shuffles(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    # shuffle exchanges only; BroadcastExchange deliberately excluded
    return len(re.findall(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(no_aqe, sf_medium, name):
    # explain from a CLEAR cache: persist-based queries otherwise pick
    # up InMemoryRelation substitutions from whatever earlier tests
    # happened to materialize (CacheManager matches canonicalized
    # plans), and the pin flaps with test order — the r4 incident
    no_aqe.catalog.clearCache()
    df = QUERIES[name](no_aqe, sf_medium)
    n = _shuffles(df)
    assert n <= BUDGETS[name], (
        f"{name}: {n} shuffle exchanges > budget {BUDGETS[name]} — "
        "a broadcast was lost or an extra repartition crept in"
    )
