"""Plan budgets: every headline query's physical plan must keep its
scale-critical shape (pushdown reaching scans, no nested-loop/cartesian
joins, bounded shuffle count). A regression here is invisible in row
counts but catastrophic at 100 TB."""

import pytest

import __spark_entry__ as entry_mod
from deltalake_spark.plans import assert_plan, plan_summary

SF = "/root/testdata/sf0.01"

# name → (max_shuffles, require_pushdown)
BUDGETS = {
    "q1_pricing_summary": (2, True),     # agg + sort
    "q3_unshipped_value": (4, True),
    "q5_nation_volume": (4, True),
    "q6_forecast_revenue": (1, True),
    "q10_returned_items": (4, True),
    "q4_late_orders": (2, True),
    "q12_priority_by_flag": (3, True),
    "q14_promo_revenue": (1, True),
    "q18_large_orders": (3, False),
    "q19_bracket_revenue": (1, True),
    "q7_nation_volume": (4, True),
    "q9_profit_by_nation_year": (3, True),
    "filter_range": (2, True),
    "asof_purchase_attribution": (3, True),
    "range_view_attribution": (4, True),
    "sessionize_events": (3, False),
    "window_topk_per_group": (2, False),
    "skew_salted_topk": (4, False),
    "histogram_totalprice": (2, False),
    "tfidf_top_terms": (4, False),
    "variant_binary_roundtrip": (2, False),
    "percentile_prices": (2, False),
    "ivf_exhaustive_topk": (2, False),    # bucket equi-join + ranked window
    # r7 portable/exact-hash conversions — same banded/bucketed shapes:
    # sig agg + band-bucket agg + sort
    "minhash_neardup_groups": (3, False),
    # bit-sum agg + block agg + sort
    "simhash_blocks": (3, False),
    # sketch equi-join (broadcast at fixture scale) + window + sort
    "embedding_knn_join": (3, False),
    # bucket equi-join + ranked window + sort (training is cached
    # driver-side metadata, not part of this plan)
    "ivf_ann_topk": (3, False),
    # r7: map-only canonicalize + distinct-expand agg + sort
    "url_canonical_dedup": (3, False),
    # r7: vocab agg + group rank window + moment agg + sort
    "zipf_token_slope": (4, False),
    # r7: one user-keyed window + island agg + user agg, TakeOrdered
    "interval_union_exposure": (3, False),
    "language_id_dist": (2, False),       # one narrow pass + agg + sort
    "fingerprint_dedup_stats": (3, False),
    "jaccard_neardup_pairs": (3, False),  # lang-blocked pairs, never cross
    "audio_meta_extract": (1, False),     # synth + mapInPandas + sort
    "sketch_distinct_users": (6, False),  # distinct-expand + sketch agg paths
    "sketch_quantile_check": (3, False),  # sketch agg + broadcast rank check
    # no pushdown REQUIRED: the $lookup join is null-safe (Mongo: null
    # localField matches null foreignField), so the isnotnull join-key
    # inference that used to reach the scans is semantically forbidden
    "pipeline_lookup_segments": (4, False),  # pre-agg lookup + count + sort
    "pipeline_bucket_quantities": (2, True),  # CASE bucket + one hash agg
    "doc_chunk_pack": (3, False),    # explode + pack window + final agg
    "events_rollup_cascade": (3, False),  # hourly agg + daily reagg + sort
    "video_meta_extract": (1, False),     # synth + mapInPandas + sort
    # span explode + WindowGroupLimit'd first-occurrence + rebuild + agg
    "span_dedup_stats": (4, False),
    # tiny budget frame (agg + SinglePartition window) + bucket prefix
    # sums + in-bucket window + final agg/sort — all joins broadcast
    "mixture_temperature_sample": (6, False),
    # TakeOrderedAndProject — a global sort head must not shuffle
    "deterministic_shuffle_head": (0, False),
    # pure projection + stats agg + sort — the split itself shuffles 0
    "deterministic_split_stats": (2, False),
    # two LM aggs + broadcast log-ratio join + doc-keyed avg + top-k
    "dsir_importance_topk": (4, False),
    # MG summaries merge on one KB-scale token-keyed exchange
    "frequent_tokens_sketch": (1, False),
    # bucketed prefix sum: per-bucket agg + tiny offsets window +
    # in-bucket window + final agg/sort; offsets join broadcasts
    "shard_assignment_stats": (5, False),
    # zero-shuffle union concat; agg + sort only
    "pipeline_unionwith_quality": (2, True),
    # one window exchange (all frames share the partition order) + sort
    "window_fields_running": (2, True),
    # sparse agg + broadcast grid join + locf window + final agg/sort
    "densify_fill_timeseries": (6, True),
    # codegen expression enrichment collapses into the agg scan
    "pipeline_expr_enrich": (3, False),
    # date intrinsics + $switch CASE fold into the scan (full-table
    # query, nothing to push); agg + sort
    "pipeline_expr_dates": (2, False),
    # higher-order array lambdas stay in-row; one group shuffle + sort
    "pipeline_expr_arrays": (2, False),
    # stats via one scalar subquery (no join node), TakeOrdered head —
    # zero wide shuffles end to end
    "bm25_topk_docs": (0, False),
    # narrow assignment; within-cluster pair join broadcasts at fixture
    # scale (hash-shuffle equi-join at 100 TB — never cross); kept-flag
    # join + agg + sort bound the rest
    "semantic_dedup_stats": (4, False),
    # map-only assign + one cluster-keyed window (WindowGroupLimit'd
    # top-20) + agg + sort; no joins at all
    "cluster_prune_stats": (3, False),
    # word-count shuffle + pair-count shuffle, TakeOrdered head; the
    # lang filter must reach the scan
    "bpe_pair_counts": (2, True),
    # priority projection + one lang-keyed window (WindowGroupLimit) +
    # output sort; full-table sample, nothing to push
    "weighted_sample_docs": (2, False),
    # BM25 head (scalar-subquery stats, TakeOrdered) + length-prior
    # TakeOrdered; fusion windows run on the <=40-row candidate set
    "rrf_fused_topk": (2, False),
    # map-only two-subspace encode + agg + sort; no joins
    "pq_error_stats": (2, False),
    # encode + literal-table ADC scoring is map-only; TakeOrdered head
    "pq_adc_topk_query": (0, False),
    # two KB-output aggs (source and source×lang keyed) + broadcast
    # join + sort; n_langs entropy via the shuffle-free ln identity
    "corpus_card": (4, False),
    # synth UDF + fused decode/stats mapInPandas are map-only; one
    # lang agg + sort. Pixel buffers never shuffle.
    "png_pixel_stats": (2, False),
    # same shape, audio flavor: synth + PCM decode/RMS in one Arrow
    # pass, then lang agg + sort
    "wav_rms_stats": (2, False),
    # r5: same fused map-only shape for the baseline JPEG decode
    "jpeg_pixel_stats": (2, False),
    # r5: synth + MPEG frame-walk mapInPandas, one lang agg + sort
    "mp3_meta_stats": (2, False),
    # r5: JVM-codegen JL projections are map-only; label agg + sort
    "jl_projection_stats": (2, False),
    # r5: exact int-grid gram sums; label agg + sort
    "gram_matrix_probe": (2, False),
    # r5: Arrow NFC pass is map-only; lang agg + sort
    "unicode_norm_stats": (2, False),
    # r5: bit_or build (one KB-wide shuffle) + broadcast-filter probe
    # + key reagg + truth semi-join + segment agg
    "bloom_filter_stats": (8, False),
    # r5: grid build + broadcast-grid estimate + truth agg + joins
    "cms_frequency_stats": (8, False),
    # r5: explode + token×doc partial agg + token agg + sort
    "inverted_index_stats": (3, False),
    # r5: ONE aggregation pass for all five checks + explode + sort
    "audit_constraint_stats": (2, False),
    # r5: single agg with expand for 4 exact distincts + explode + sort
    "table_profile_stats": (3, False),
    # r5: gram explode + ref distinct + gram join + doc agg + lang agg
    "ngram_novelty_stats": (7, False),
    # r5: one expand-based cube agg + sort
    "agg_cube_stats": (2, False),
    # r5: explicit-value pivot agg (no discovery scan) + post-unpivot
    # filter agg + sort
    "pivot_unpivot_roundtrip": (3, False),
    # r5: block-keyed self-join (never all-pairs) + nation join + agg
    "fuzzy_name_pairs": (6, False),
    # r5: range repartition + pid-local window + bucket agg + sort
    # (NO single-partition global window; persisted layout adds one
    # textual exchange)
    "equidepth_price_histogram": (5, False),
    # r5: one window exchange (all five functions share it) + agg + sort
    "window_rank_suite": (3, False),
    # r5: cascaded conditional-min aggs, user-keyed exchanges reused
    "funnel_conversion_stats": (7, True),
    # r5: first-activity agg + distinct + co-partitioned join + grid agg
    "retention_cohort_stats": (5, True),
    # r5: the TEXTUAL plan repeats the persisted edge subplan (pair
    # self-join + distinct) under every branch — degrees, orientation,
    # wedge, closing, summary — so the static Exchange count is high;
    # at runtime the cached edges materialize ONCE and downstream
    # branches reuse them. Budget pins the current textual shape.
    "copurchase_triangle_stats": (28, False),
    # r5 statistics suite (operators/stats.py): closed-form moment
    # compositions — agg(+sort); marginal/rank windows run over
    # already-reduced cell/key frames, never the input
    "ols_regression_stats": (2, False),     # one moment agg + sort
    "chi2_priority_status": (2, False),     # cell agg + final reduce
    "entropy_mi_events": (1, False),        # joint-count agg only
    "gini_supplier_share": (3, False),      # key agg + rank window + agg
    "pareto_customer_coverage": (1, False),  # key agg; windows on keys
    "welch_ttest_events": (0, True),        # conditional agg, 0 shuffles
    "winsorized_price_stats": (3, True),    # percentile bcast + reagg
    # r5 time-series suite (operators/timeseries.py): one rollup
    # shuffle to the daily grain; smoothing/window/corr run on the
    # (type × day) frame only
    "ewma_daily_values": (3, False),        # rollup + fold agg + sort
    "rolling_zscore_days": (3, False),      # rollup + z window + agg
    "autocorr_daily_values": (3, False),    # rollup + lag window + agg
    "markov_event_transitions": (4, False),  # user window + cell agg
    # r5: blocked JW join (broadcast at fixture scale; block-keyed
    # equi-join at 100 TB — never cross); Arrow scorer post-blocking
    "jw_name_pairs": (3, False),
    # r5: synth + fused LZW decode/stats mapInPandas are map-only;
    # one lang agg + sort — same shape as png/jpeg_pixel_stats
    "gif_pixel_stats": (2, False),
    # r5: fixed-point k-means final frame — the k-row stats tail
    # ((cid,label) agg + cid agg + majority window + broadcast join +
    # sort); every Lloyd iteration inside kmeans_fit is map-only
    # assignment + ONE k-row groupBy, and the assignment itself is
    # literal-centroid zip_with with zero joins
    "kmeans_cluster_stats": (5, False),
    # r5: bigram explode agg + unigram agg (persisted; textually
    # nested) + broadcast vocab joins + TakeOrdered head
    "collocation_pmi_topk": (5, False),
    # r8: same shape as PMI but marginals come from the CACHED bigram
    # frame (3 real exchanges: bigram agg + 2 marginal aggs; the
    # static count sees the cached agg once per consumer branch),
    # marginal joins broadcast, TakeOrdered head
    "collocation_g2_topk": (8, False),
    # r8: probe explode + bucket equi-join (broadcast at fixture
    # scale) + ranked window; ADC is map-only literal-codebook math
    "ivf_pq_ann_topk": (3, False),
    # r8: ONE user-keyed exchange shared by all three window passes
    # (both quantile frames + the last-row rank), user agg, TakeOrdered
    "rolling_quantile_user_values": (2, False),
    # r8: both island branches reuse the user-keyed exchange (4 window
    # passes over it), overlap join broadcasts at fixture scale, user
    # agg + TakeOrdered; the overlap test is a residual, never a loop
    "interval_overlap_attention": (3, False),
    # r8: one (token)-keyed count agg off the cached frame (+1 static
    # replica for the totals branch), totals as literals, TakeOrdered
    "keyness_en_de_topk": (3, False),
    # r8: ONE user-keyed window (median and MAD both read the single
    # collected frame), user agg, TakeOrdered
    "rolling_mad_outliers": (2, False),
    # r8: (type, day) grain agg + one type-keyed calendar-RANGE window
    # (sets and sketches merge in the same frame) + sort
    "sliding_distinct_users": (3, False),
    # r8: entity journey window + self-join on (entity, journey) +
    # journey-sum window + channel agg/sort (same shape as the
    # linear-attribution gate)
    "decay_attribution_purchases": (4, False),
    # r8: one category-keyed window over the detail rows + category
    # agg + sort; prior is a 2-scalar collect folded as a literal
    "loo_encode_priority": (2, False),
    # r9: bucket-cover pair scoring + one (anchor, same?) window +
    # pos/neg splits + active-negative join/agg + final joins + sort.
    # r12: the scored pair frame is PERSISTED (pos/neg/active branches
    # replayed the whole cosine join 3x before) and the anchor side is
    # spread off the single-file scan — the static text now embeds the
    # cached subtree (with its spread exchange) once per consumer, so
    # the textual count rises while the executed exchanges drop
    "hard_negative_triplets": (12, False),
    # r9: batch-only fingerprint (explode + 60-bit-sum agg) + bucket
    # cap agg + band equi-join + pair-dedup agg + argmin window +
    # left join + sort; index side is scan+join only
    "simhash_incremental_dedup": (7, False),
    # r9: one bucket-cover equi-join scores all pairs; two windows
    # (fwd/bwd ranks) + two kNN-sum aggs + candidate joins, TakeOrdered.
    # r12: the ranked pair frame is PERSISTED (sum_f/sum_b/candidate
    # branches replayed the full pair-scoring join 3x before — measured
    # 22 s → 6 s at sf0.1) and both sides spread off single-file scans;
    # the static text embeds the cached subtree per consumer
    "bitext_margin_topk": (13, False),
    # r10: IVF-PQ candidate pairs (bucket equi-join + per-src window)
    # + two id equi-joins fetching true vectors + the same margin
    # machinery — |candidates| work downstream, never |X|x|Y|.
    # r12: + the persisted ranked frame and candidate/corpus spreads
    # (see bitext_margin_topk) — textual count, not executed exchanges
    "bitext_margin_ivf_topk": (16, False),
    # r10: map-only window explode + one hash agg (distinct-doc count
    # rides the same exchange) + global TakeOrdered
    "top_dup_spans_corpus": (2, False),
    # r10: one score-histogram shuffle; prefix sums + the AP fold run
    # on the cell frame (SinglePartition window over T score cells)
    "pr_auc_purchase_value": (2, False),
    # r10: one action-count shuffle + broadcast policy join + one
    # scalar conditional aggregate
    "ips_policy_value": (2, False),
    # r9: map-only flag expressions + one lang agg + sort
    "gopher_rule_stats": (2, False),
    # r9: one lang-keyed window (rank + count share the exchange) +
    # kept agg + totals agg + broadcast join + sort
    "adaptive_quality_topfrac": (3, False),
    # r9: map-only selections both sides, eval fps broadcast, per-doc
    # hit agg + left join + lang agg + sort
    "winnow_decontam_stats": (5, False),
    # r9: selection is map-only array exprs (zero shuffle); the stats
    # are lang-join + three aggregates (fps, grams, shared) + sort
    "winnow_fingerprint_stats": (7, False),
    # r9: (type, day) grain agg + one calendar-RANGE window merging
    # the 17-point digests + sort; no joins
    "sliding_p90_digest_values": (3, False),
    # r9: window-hash explode + stop-span cap agg + hash equi-join
    # (never all-pairs) + diagonal-island window + run agg + pair agg,
    # TakeOrdered head
    "longest_dup_span_topk": (4, False),
    # r9: approx side = the ivf_pq bucket-join shape; exact side = the
    # same bucket machinery at nprobe=all + per-query window; semi-join
    # intersection + query agg + left join + sort
    "ann_recall_ivfpq": (7, False),
    # r9: batch-only signature derivation (spread + sig agg + band
    # explode, textually repeated for the probe and final-join
    # branches) + index bucket-cap agg + band equi-join + pair agg +
    # argmax window + left join + sort; the INDEX side is scan+join
    # only (pinned harder in tests/test_minhash_index.py)
    "minhash_incremental_dedup": (14, False),
    # r11: two banded probes (before/after retention) joined per doc
    "dedup_index_retention_probe": (15, False),
    # r9: map-only score + one global rank window (documented 1e7
    # ceiling) + 10-cell bucket agg + cumulative window + sort
    "lift_deciles_en": (3, False),
    # r9: orders-customer equi-join + per-year conditional cell agg
    # (the only detail pass) + scalar fold over the sorted strata array
    "cmh_building_urgent": (4, False),
    # r9: one grain rollup (the only detail pass) + the shared
    # (type, day) sort for the centered-median window + phase-median
    # agg broadcast back + final agg/sort
    "robust_seasonal_events": (5, False),
    # r9: orders-customer equi-join + nation cell agg (the only
    # detail work); totals/rank/cutoff are full-frame windows over the
    # 25-row cell frame; erf polynomial is in-row codegen
    "bh_fdr_urgent_nations": (5, False),
    # r9: positives equi-join + distinct, user distinct, pipelined
    # draw explode, (user,item) anti-join, per-user window over <=8
    # rows, draw-index agg + sort — never a cross join over the catalog
    "negative_sample_stats": (8, False),
    # r9: returned plan is the test-split coverage agg (fit + q_hat
    # are scalar collects folded as literals); split filter is a
    # map-only hash expression
    "conformal_coverage_lineitem": (1, False),
    # r9: map-only in-row window-distinct folds (no explode, no UDF)
    # + one lang agg + sort
    "mattr_diversity_langs": (2, False),
    # r9: one scan; the 65-way replicate explode pipelines into one
    # map-side-combined hash agg (B-row output), B-row rank window +
    # scalar agg — no joins at all
    "bootstrap_ci_totalprice": (2, False),
    # r9: pool = the ivf_pq bucket-join shape; refine joins the tiny
    # pool to corpus vectors BY ID (broadcast at fixture scale) + one
    # per-query window over <=k_pool rows + sort
    "ivf_pq_rerank_topk": (4, False),
    # r9: truth side is the PPJoin shape (persisted tok/size frames,
    # prefix equi-join, positional filters), candidate side the banded
    # bucket shape; full-outer pair join + scalar agg — never all-pairs
    "lsh_quality_eval": (28, False),
    # r9: one value-keyed agg (the ONLY raw-data pass; lang IN-filter
    # must reach the scan) + single-partition rank window + scalar agg
    "mannwhitney_doclen_langs": (1, True),
    # r9: persisted (value,lang) cell frame replayed by the rank
    # window, tie term, and group sums (textually nested 3x); value
    # join broadcasts; scalar tails cross-join 1-row frames
    "kruskal_doclen_langs": (6, False),
    # r5: blocked DL join (broadcast at fixture scale, equi-join at
    # 100 TB) + Arrow scorer + nation rollup — same shape as jw/fuzzy
    "damerau_name_pairs": (3, False),
    # r5: ONE detail-row shuffle (score histogram); prefix window +
    # final agg run on histogram rows; sort
    "auc_doclen_source": (3, False),
    # r5: one detail shuffle to the cell frame (persisted; textually
    # nested) + KB-frame marginal aggs/joins + sort
    "kappa_langid_source": (8, False),
    # r5: basket-keyed pair equi-join over the persisted size-capped
    # incidence frame (textually nested 4x) + broadcast count joins +
    # TakeOrdered; the partkey thinning filter must reach the scans
    "copurchase_item_similarity": (15, True),
    # r5: one detail join + one category agg (persisted; textually
    # nested) + sort; prior is a literal, no crossJoin node
    "target_encode_nation": (3, False),
    # r6: PPJoin pipeline — (f,w) composite rarity order (no global
    # rank materialization), per-doc prefix window, prefix equi-join
    # with size+positional filters BEFORE the pair dedup, map-side
    # array_intersect verify (no re-explode); persisted tok/size
    # frames nest textually
    "prefix_jaccard_pairs": (18, False),
    # r5: one user window (WindowGroupLimit-capped) + path agg on the
    # same exchange + TakeOrdered head
    "event_paths_topk": (2, False),
    # r5: quasi-key agg + class-frame histogram agg + sort
    "k_anonymity_events": (3, False),
    # r5: one groupBy(bin) over the filtered detail (persisted;
    # totals are literals — no crossJoin node) + sort
    "tvd_drift_events": (3, False),
    # r5: (status, digit) agg + totals window on the 9-row-per-group
    # digit frame + sort
    "benford_order_prices": (3, False),
    # r5: daily-grain agg + one series-keyed exchange shared by both
    # prefix windows + sort
    "cusum_daily_values": (3, False),
    # r5: ONE conditional agg + sort — zero joins
    "ab_conversion_ztest": (2, False),
    # r5: three group-keyed passes (median, MAD, threshold count),
    # stats broadcast back — the detail rows never re-shuffle
    "mad_price_outliers": (5, False),
    # r5: daily-grain agg + one series exchange shared by
    # row_number/sum/count windows + phase agg
    "seasonal_event_pattern": (3, False),
    # r5: daily-grain agg + one group fold shuffle + sort; the Holt
    # recursion runs inside a JVM aggregate — no iteration in plan
    "holt_daily_forecast": (3, False),
    # r6: daily-grain agg + ONE group shuffle shared by the prefix-sum
    # window and the argmax aggregate + sort; no joins at all
    "changepoint_daily_events": (3, False),
    # r6: daily-grain agg + group-keyed pair self-join + slope-median
    # agg + broadcast back for the residual median + sort
    "theilsen_daily_trend": (6, False),
    # r6: daily-grain agg (count_distinct expands) + one shared-sort
    # lead window + moment agg + sort
    "xcorr_event_daily": (4, False),
    # r6: per feature ONE narrow agg to the distinct-value frame +
    # bounded single-partition prefix windows + argmax; zero joins
    "gini_split_lineitem": (2, False),
    # r6: daily-grain agg + group rank window + rank agg broadcast
    # back + sort
    "qnorm_daily_event_values": (6, False),
    # r6: persisted bounds/pairs frames nest textually (68
    # InMemoryTableScans at sf0.01); runtime is entity-keyed joins
    # over the cached KB-scale frames, no cartesian anywhere
    "seq_patterns_events": (125, False),
    # r6: synth + fused Arrow decode+reduce + one format agg + sort
    "wav_g711_stats": (2, False),
    "bmp_pixel_stats": (2, False),
    # r6: one narrow regex projection + lang agg + sort
    "readability_docs": (2, False),
    # r6: user window + journey self-join + cell aggs; KB frames after
    # the first window
    "attribution_user_purchases": (5, False),
    # r6: user agg + step-cell agg + risk window + fold + sort
    "km_user_purchase_survival": (4, False),
    # r6: per-user agg + one arm agg (pooled moments are literals —
    # no one-row NLJ crossJoin)
    "cuped_event_lift": (2, False),
    # r6: per-round persisted frames nest textually, and HOW MUCH
    # they nest depends on which subtrees the session's CacheManager
    # already holds (259 standalone, ~290 inside the full suite) —
    # the load-bearing assertions are no-NLJ/no-cartesian, so the
    # textual cap carries a wide margin
    "kcore_copurchase": (450, False),
    # r6: tagged-union conditional agg (checkpoints are literals —
    # no rank window, no 1x1 join)
    "vocab_growth_docs": (2, False),
    # r6: cell agg + cumulative window over the distinct-value frame
    # + conditional-min agg + sort
    "weighted_median_prices": (3, False),
    # r6: lag window + cell count; iteration is driver-side over the
    # alphabet-bounded cell table
    "absorption_event_conversion": (1, False),
    # r6: PPJoin-shaped containment — persisted tok/size frames nest
    # textually; prefix x full-token join + array verify
    "containment_doc_pairs": (15, False),
    # r6: map-only assignment + silhouette transform + ONE cluster agg
    "silhouette_embedding_clusters": (2, False),
    # r6: ONE bucket aggregate (min_by/max_by carry the order) + sort
    "ohlc_daily_values": (2, False),
    # r6: distinct grain + entity window + streak agg + TakeOrdered
    "activity_streaks_users": (2, False),
    # r6: second-grain agg + lead window + group agg (shared sort)
    "twa_event_values": (3, False),
    # r6: token-count agg + rank window over the KB vocab + lang agg
    "token_gini_concentration": (3, False),
    # r6: daily-grain agg + moment agg + sort
    "burstiness_event_volumes": (3, False),
}


def test_bucketed_join_zero_shuffles(spark):
    """The co-located join gate query must keep its 0-Exchange join: the
    in-query verifier raises, but pin it here too so a plan regression
    fails fast in CI, not only at the gate."""
    df = entry_mod.queries()["bucketed_colocated_join"](spark, SF)
    # final agg adds its own exchange; the join itself contributed none —
    # verified inside the query (verify_colocated) before aggregation
    s = plan_summary(df)
    assert s.sort_merge_joins == 1
    assert s.cartesian_products == 0 and s.nested_loop_joins == 0


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_plan_budget(spark, name):
    max_shuffles, need_pushdown = BUDGETS[name]
    # isolate from cross-gate cache substitution: CacheManager swaps
    # any logically-equal subplan for an earlier gate's persisted
    # frame (e.g. PMI's bigram counts for G²'s), making the static
    # shuffle count depend on which gates ran earlier in the session
    spark.catalog.clearCache()
    df = entry_mod.queries()[name](spark, SF)
    assert_plan(
        df,
        max_shuffles=max_shuffles,
        require_pushdown=need_pushdown,
        forbid_nested_loop=True,
        forbid_cartesian=True,
    )


def test_scalar_subquery_broadcast_allowed(spark):
    """q22's 1-row scalar broadcast is the one sanctioned nested-loop."""
    df = entry_mod.queries()["q22_idle_customers"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins <= 1  # the scalar avg attach only


def test_lm_perplexity_plan(spark):
    """LM scoring: the vocabulary-size attach is a sanctioned 1-row
    broadcast nested-loop (same class as q22's scalar); everything else
    must stay broadcast-joined with bounded shuffles."""
    df = entry_mod.queries()["lm_perplexity_stats"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins <= 1  # the 1-row V attach only
    assert s.shuffles <= 6
    assert s.broadcast_joins >= 2  # model joins never shuffle the corpus


def test_nb_confusion_plan(spark):
    """NB scoring: the L-row priors attach is a sanctioned broadcast
    nested-loop (same class as q22's scalar); the V×L model must join
    broadcast so the corpus never shuffles for the lookup."""
    df = entry_mod.queries()["nb_language_confusion"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins <= 1  # priors cross-attach only
    assert s.broadcast_joins >= 2   # likelihoods + totals
    assert s.shuffles <= 8


def test_nb_margin_calibration_plan(spark):
    """r9: same scoring chain as nb_language_confusion (priors
    cross-attach sanctioned, V×L model broadcast) plus one doc window
    and the bin aggregate — the corpus never shuffles for the model."""
    df = entry_mod.queries()["nb_margin_calibration"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins <= 1  # priors cross-attach only
    assert s.broadcast_joins >= 2   # likelihoods + totals
    assert s.shuffles <= 8


def test_semantic_decontam_plan(spark):
    """Eval-set attach is the one sanctioned broadcast nested-loop; the
    corpus side must never shuffle for the similarity pass."""
    df = entry_mod.queries()["semantic_decontam_stats"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins <= 1  # broadcast eval crossJoin only
    assert s.shuffles <= 4


def test_kmv_overlap_plan(spark):
    """Everything past the per-segment distinct is sketch-sized (≤ k
    rows per segment); the replicated-click attach is a broadcast
    nested-loop over a 4-row type frame. Shuffle count is high but
    every exchange moves KB sketches, so the pin only guards shape."""
    df = entry_mod.queries()["kmv_user_overlap"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins <= 1
    assert s.shuffles <= 14


def test_itemsets_gate_join_shapes(spark):
    """The two itemsets gates persist the shared basket-item incidence
    frame, so explain text nests cached subtrees AND the cache manager
    dedups the identical lineage across the two queries — a raw
    shuffle-count budget flips with test execution order (the
    pagerank/hits lesson). What must hold regardless: every join is
    basket- or component-keyed — no cartesian, no nested loop."""
    for name in ("frequent_itemsets_parts", "assoc_rules_parts"):
        df = entry_mod.queries()[name](spark, SF)
        s = plan_summary(df)
        assert s.cartesian_products == 0, name
        assert s.nested_loop_joins == 0, name


def test_lpa_gate_join_shapes(spark):
    """Same rationale as the pagerank/hits gates: iterative op with
    per-round persist+materialize — explain text nests cached
    subtrees, so a shuffle budget pins noise. Must hold: no cartesian
    or nested-loop join, and the round-lineage cut happened (final
    plan reads an InMemoryTableScan, not a replay of round 1)."""
    df = entry_mod.queries()["lpa_copurchase_communities"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins == 0
    assert "InMemoryTableScan" in s.text


def test_bfs_linkpred_gate_join_shapes(spark):
    """bfs is iterative (per-round persist nests cached subtrees in
    the explain text — 500+ textual exchanges for 3 real rounds) and
    both gates share the _copurchase_pairs_thin lineage, which the
    cache manager dedups across tests, so shuffle budgets would flip
    with execution order. Shape must hold regardless: every join
    equi-keyed, and bfs's round-lineage cut visible."""
    for name in ("bfs_part_neighborhood", "link_prediction_parts"):
        df = entry_mod.queries()[name](spark, SF)
        s = plan_summary(df)
        assert s.cartesian_products == 0, name
        assert s.nested_loop_joins == 0, name
        if name == "bfs_part_neighborhood":
            assert "InMemoryTableScan" in s.text  # round-lineage cut


def test_textrank_gate_join_shapes(spark):
    """Iterative gate (pagerank rounds persist+materialize): same
    rationale as the pagerank/hits/lpa shape pins."""
    df = entry_mod.queries()["textrank_doc_keywords"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins == 0
    assert "InMemoryTableScan" in s.text


def test_summary_counts(spark):
    df = entry_mod.queries()["q5_nation_volume"](spark, SF)
    s = plan_summary(df)
    assert s.scans == 6 and s.joins >= 5
    assert s.broadcast_joins >= 3  # region/nation/supplier dims
    # codegen spans only appear in the post-execution adaptive plan, so
    # they are not asserted here (field is best-effort pre-execution)


def test_pagerank_gate_join_shapes(spark):
    """pagerank_copurchase_topk is iterative: each Lloyd-style pass is
    persisted+materialized inside pagerank_fixed_point, so the static
    explain text NESTS the cached subtrees (InMemoryRelation embeds its
    child plan) and raw Exchange counts double-count work the runtime
    reads from cache — a shuffle-count budget would pin noise. What
    must hold regardless: no cartesian/nested-loop join anywhere in
    the tree, and the lineage cut actually happened (the final plan
    reads an InMemoryTableScan instead of replaying iteration 1)."""
    df = entry_mod.queries()["pagerank_copurchase_topk"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins == 0
    assert "InMemoryTableScan" in s.text


def test_hits_gate_join_shapes(spark):
    """Same rationale as the pagerank gate: iterative op with
    persisted+materialized half-steps — static Exchange counts pin
    cache-nested noise. Must hold: no cartesian/nested-loop joins and
    the lineage cut is real (InMemoryTableScan present)."""
    df = entry_mod.queries()["hits_customer_part"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins == 0
    assert "InMemoryTableScan" in s.text


def test_dbscan_gate_join_shapes(spark):
    """DBSCAN gate: candidate pairs must come from the cell-keyed
    EQUI-join (9-cell probe) — no cartesian/nested-loop anywhere —
    and the CC loop's persist+materialize lineage cut must be real."""
    df = entry_mod.queries()["dbscan_embedding_clusters"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins == 0
    assert "InMemoryTableScan" in s.text


def test_golden_records_gate_join_shapes(spark):
    """ER survivorship gate: CC is iterative (persisted half-steps →
    nested static text), so pin shapes not counts — no cartesian /
    nested-loop joins; the blocked pair join must be an equi-join."""
    df = entry_mod.queries()["golden_customer_records"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins == 0


def test_rfm_gate_no_single_partition_exchange(spark):
    """RFM gate (r6 verdict ask #2): the quintile scoring must come from
    the distributed global-rank path — a ``ntile() OVER (ORDER BY …)``
    regression shows up as an ``Exchange SinglePartition`` funneling the
    whole entity frame through one task. Pin its absence, plus the usual
    join-shape invariants; range exchanges (the rank partitioner + the
    final orderBy) are the expected shape."""
    df = entry_mod.queries()["rfm_customer_segments"](spark, SF)
    s = plan_summary(df)
    assert "Exchange SinglePartition" not in s.text
    assert s.cartesian_products == 0
    assert s.nested_loop_joins == 0
    # the ranked frames are persisted (range layout pinned for the
    # offset collect) — the joins must read the cached layout back
    assert "InMemoryTableScan" in s.text


def test_curation_e2e_plan(spark):
    """r10 e2e composition: the static explain text re-embeds each
    persisted stage's cached plan once per consumer, so the raw
    shuffle count (~164) is an artifact of InMemoryRelation printing,
    not executed exchanges (the persists exist precisely so gopher +
    winnow + dedup each RUN once). Budget here: the hard anti-patterns
    (cartesian/BNLJ) stay zero, every scan keeps pushdown, and the
    static count stays under a tripwire ceiling so a new stage that
    doubles the replay tree still fails loudly."""
    spark.catalog.clearCache()
    df = entry_mod.queries()["curation_pipeline_e2e"](spark, SF)
    s = plan_summary(df)
    assert s.cartesian_products == 0
    assert s.nested_loop_joins == 0
    assert s.scans == s.scans_with_pushdown
    assert s.shuffles <= 180
