"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Timing counts full query execution (collect to driver of the small result)
after a session warm-up so JVM startup isn't attributed to query 1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from deltalake_spark.session import get_spark, release_caches

HEADLINE = [
    "q1_pricing_summary",
    "q3_unshipped_value",
    "q5_nation_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "pipeline_compound_group",
    "window_topk_per_group",
    "text_token_stats",
    "dedup_exact",
    "similarity_topk",
    "minhash_neardup_groups",
    "delta_table_lifecycle",
    "asof_purchase_attribution",
    "sessionize_events",
    "q4_late_orders",
    "q18_large_orders",
    "ivf_ann_topk",
    "stream_windowed_counts",
    "q7_nation_volume",
    "tfidf_top_terms",
    "percentile_prices",
]

# new-in-round-3/4 flagships: benched separately (extra_queries) so the
# headline warm total stays comparable to earlier rounds
EXTRA = [
    "semantic_dedup_stats",
    "cluster_prune_stats",
    "bpe_pair_counts",
    "weighted_sample_docs",
    "rrf_fused_topk",
    "pq_adc_topk_query",
    "png_pixel_stats",   # r4: real PNG decode
    "wav_rms_stats",     # r4: real PCM decode
    "jpeg_pixel_stats",  # r5: real baseline JPEG decode
    "bloom_filter_stats",          # r5: bit_or build + broadcast probe
    "cms_frequency_stats",         # r5: count-min grid
    "funnel_conversion_stats",     # r5: cascaded conditional mins
    "copurchase_triangle_stats",   # r5: degree-oriented triangles
    "jl_projection_stats",         # r5: JVM-exact JL folds
    "inverted_index_stats",        # r5: posting-list build
    "gif_pixel_stats",             # r5: real GIF LZW decode
    "ewma_daily_values",           # r5: recursive fold smoothing
    "markov_event_transitions",    # r5: user-sequence window
    "winsorized_price_stats",      # r5: exact-percentile broadcast
    "jw_name_pairs",               # r5: blocked Arrow JW scorer
    "kmeans_cluster_stats",        # r5: fixed-point Lloyd iterations
    "pagerank_copurchase_topk",    # r5: integer power iteration
    "collocation_pmi_topk",        # r5: PMI phrase mining
    "copurchase_item_similarity",  # r5: basket cosine recommender
    "dbscan_embedding_clusters",   # r5: grid DBSCAN + CC
    "prefix_jaccard_pairs",        # r5: PPJoin exact similarity join
    "frequent_itemsets_parts",     # r5s3: distributed Apriori L1-L3
    "lpa_copurchase_communities",  # r5s3: label propagation rounds
    "link_prediction_parts",       # r5s3: wedge-join RA scoring
    "textrank_doc_keywords",       # r5s3: bigram-graph pagerank
    "cusum_daily_values",          # r5s3: prefix-sum CUSUM windows
    "mad_price_outliers",          # r5s3: three-pass median/MAD
    "holt_daily_forecast",         # r5s3: integer Holt fold
    "benford_order_prices",        # r5s3: digit-frame chi-square
    "changepoint_daily_events",    # r6: exact SSE change-point
    "theilsen_daily_trend",        # r6: pairwise-median robust trend
    "xcorr_event_daily",           # r6: integer-moment lagged xcorr
    "gini_split_lineitem",         # r6: exact CART decision stump
    "qnorm_daily_event_values",    # r6: rank-mean quantile normalize
    "seq_patterns_events",         # r6: bounds-frame PrefixSpan L1-L3
    "wav_g711_stats",              # r6: real mu-law/A-law expansion
    "bmp_pixel_stats",             # r6: real BMP decode
    "readability_docs",            # r6: group-exact Flesch screen
    "attribution_user_purchases",  # r6: exact-units multi-touch
    "km_user_purchase_survival",   # r6: fixed-chain Kaplan-Meier
    "cuped_event_lift",            # r6: literal-theta CUPED readout
    "kcore_copurchase",            # r6: synchronous k-core peel
    "vocab_growth_docs",           # r6: tagged-union Heaps curve
    "weighted_median_prices",      # r6: integer-crossing percentiles
    "absorption_event_conversion", # r6: absorbing-chain fixed point
    "stream_cusum_alarms",         # r6: stateful streaming monitor
    "containment_doc_pairs",       # r6: asymmetric containment join
    "silhouette_embedding_clusters",  # r6: cluster-quality eval
    "simhash_blocks",              # r7: portable 60-bit fingerprint
    "embedding_knn_join",          # r7: exact-integer sign-LSH kNN
    "rolling_quantile_user_values",  # r8: exact trailing quantiles
    "collocation_g2_topk",         # r8: Dunning G2 collocations
    "ivf_pq_ann_topk",             # r8: IVF routing + PQ ADC composed
    "interval_overlap_attention",  # r8: interval x interval overlap
    "keyness_en_de_topk",          # r8: G2 corpus-contrast keywords
    "rolling_mad_outliers",        # r8: rolling median/MAD screen
    "sliding_distinct_users",      # r8: windowed HLL-merge DAU
    "decay_attribution_purchases", # r8: exact time-decay credit
    "loo_encode_priority",         # r8: leave-one-out encoding
    "minhash_incremental_dedup",   # r9: batch-vs-persisted-index dedup
    "ann_recall_ivfpq",            # r9: IVF-PQ recall@5 vs exact truth
    "longest_dup_span_topk",       # r9: exact longest-duplicated-span
    "stream_sliding_distinct",     # r9: streaming DAU/WAU sketch state
    "sliding_p90_digest_values",   # r9: mergeable windowed quantile digest
    "winnow_fingerprint_stats",    # r9: true winnowing selection (MOSS)
    "bitext_margin_topk",          # r9: margin-based bitext mining
    "bitext_margin_ivf_topk",      # r10: bitext on IVF-PQ candidates
    "top_dup_spans_corpus",        # r10: corpus boilerplate census
    "curation_pipeline_e2e",       # r10: whole-chain curation run
    "pr_auc_purchase_value",       # r10: PR-AUC / average precision
    "ips_policy_value",            # r10: IPS/SNIPS off-policy eval
    "cdc_consumer_exactly_once",   # r11: crash/resume CDC consumer
    "dedup_index_retention_probe", # r11: index expiry + layout rewrite
    "simhash_incremental_dedup",   # r9: Hamming-index nightly dedup
    "hard_negative_triplets",      # r9: triplet mining for embeddings
    "nb_margin_calibration",       # r9: confidence calibration bins
    "stream_ingest_dedup",         # r9: streaming dedup vs the index
    "gopher_rule_stats",           # r9: published Gopher quality rules
    "winnow_decontam_stats",       # r9: char-level winnow decontam
    "adaptive_quality_topfrac",    # r9: per-domain quality threshold
    "lsh_quality_eval",            # r9: LSH precision/recall harness
    "ivf_pq_rerank_topk",          # r9: IVFADC+R exact refine step
    "bootstrap_ci_totalprice",     # r9: Poisson bootstrap 95% CI
    "mattr_diversity_langs",       # r9: pooled MATTR lexical diversity
    "conformal_coverage_lineitem", # r9: split-conformal intervals
    "negative_sample_stats",       # r9: BPR-style negative sampling
    "stream_mg_topk",              # r9: streaming Misra-Gries monitor
    "bh_fdr_urgent_nations",       # r9: BH-FDR multiple testing
    "robust_seasonal_events",      # r9: median-robust decomposition
    "cmh_building_urgent",         # r9: CMH stratified association
    "lift_deciles_en",             # r9: lift/gains model eval
    "mannwhitney_doclen_langs",    # r9: rank-sum test, integer core
    "kruskal_doclen_langs",        # r9: k-sample ANOVA on ranks
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    load0 = round(os.getloadavg()[0], 1)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # a 1-min load already above cpus/8 BEFORE the bench starts means a
    # co-tenant owns a meaningful slice of the machine; stamp the run so
    # round-over-round comparisons skip it mechanically instead of by
    # human judgment (r5 and r7 both burned a round chasing phantom
    # regressions that were co-tenant load)
    contended = load0 > max(2.0, cpus / 8.0)
    spark = get_spark("deltalake-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM so q1 isn't charged for session init: codegen paths
    # via range, parquet-reader class loading via the smallest table
    # (region, 5 rows — none of the benchmarked tables are touched)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).collect()

    qs = entry_mod.queries()

    def run_once(name: str) -> tuple[float, int]:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count() if name == "minhash_neardup_groups" else len(df.collect())
        dt = round(time.perf_counter() - t0, 3)
        return dt, n

    # cold pass first (codegen/plan compile noise lands here, in the
    # PINNED list order above so attribution is stable round-to-round),
    # then warm passes. The headline metric is the WARM total: r2 showed
    # cold deltas are JVM noise in both directions, so round-over-round
    # comparisons should lead with warm-to-warm ("queries" below = warm;
    # cold is emitted separately). Each warm number is the MEDIAN of 3
    # passes — r5's driver bench ran during co-tenant load and reported
    # a phantom +13% across the board; a single sample can't tell load
    # from regression, the median of 3 mostly can (and `loadavg` in the
    # compact line makes contaminated runs self-identifying).
    # r12 measurement fix: release persisted frames BETWEEN queries.
    # session.release_caches's contract says the bench owns cleanup,
    # but no call was ever wired in — ~100 gates' persist() pins
    # accumulated in the 8g driver across the session and the tail of
    # the extras list paid for it in GC/eviction churn (r12 baseline:
    # dedup_index_retention_probe 94 s inside the full bench vs 12-14 s
    # isolated in a fresh session). Releasing only at query BOUNDARIES
    # keeps each query's own timed region — including any same-query
    # cache reuse across its warm passes — exactly as previous rounds
    # measured it; only cross-query pollution is removed.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        release_caches(spark)
        cold[name], n = run_once(name)
        print(f"# cold {name}: {cold[name]}s ({n} rows)", file=sys.stderr)
    for name in HEADLINE:
        release_caches(spark)
        samples = sorted(run_once(name)[0] for _ in range(3))
        warm[name] = samples[1]
        print(f"# warm {name}: {warm[name]}s (3 passes: {samples})",
              file=sys.stderr)

    # round-3 flagship additions, measured OUTSIDE the headline total so
    # "value"/"warm_total" stay comparable round-over-round (warm pass:
    # each runs twice, second timing reported)
    # SPARK_GRAFT_SKIP_EXTRAS=1 → headline-only run (the sf1 bench
    # anchors time the 21 headline queries at 10x volume; the EXTRA
    # list's scale evidence lives in the ORACLE_SF1 sweep timings)
    extra: dict[str, float] = {}
    skip_extras = os.environ.get("SPARK_GRAFT_SKIP_EXTRAS") == "1"
    for name in [] if skip_extras else EXTRA:
        release_caches(spark)
        run_once(name)
        extra[name], _ = run_once(name)
        print(f"# extra(warm) {name}: {extra[name]}s", file=sys.stderr)

    # Full detail goes to STDERR (humans / archaeology). STDOUT carries
    # exactly ONE compact JSON line: the driver captures only the last
    # 2000 chars of stdout, and r3/r4's ~2.5KB line overflowed that
    # window ("parsed": null in BENCH_r03/04). Keep this line < 1900B.
    print("# detail " + json.dumps({
        "cold_queries": cold,
        "extra_queries": extra,
    }), file=sys.stderr)

    compact = {
        "metric": "headline_queries_warm_total_wall",
        "value": round(sum(warm.values()), 2),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in warm.items()},
        "warm_total": round(sum(warm.values()), 2),
        "cold_total": round(sum(cold.values()), 2),
        "extra_total": round(sum(extra.values()), 2),
        "sf": sf,
        # 1-min load BEFORE the bench started vs at the end: values far
        # above SPARK_GRAFT_CPUS mean co-tenant contention — treat the
        # timings as contaminated rather than chasing phantom regressions
        "loadavg": [load0, round(os.getloadavg()[0], 1)],
        "contended": contended,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # never let the machine line overflow the window
        compact.pop("queries")
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
