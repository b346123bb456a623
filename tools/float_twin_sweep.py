"""sf0.1 sweep of the double-heavy oracle twins (r4 verdict ask #6,
institutionalized per r5 ask #10).

Floating-point aggregates can pass at sf0.01 yet drift at sf0.1 if an
operator's summation order is partition-dependent. The engine's twins
are designed partition-order-independent (exact-integer numerators,
single IEEE ops at the end, canonical op ordering); this sweep proves
it at 10x the gate scale for every query whose values go through
double arithmetic.

Usage:  python tools/float_twin_sweep.py [sf_dir]   (default sf0.1)
Exit 0 = all pass. Referenced from COVERAGE.md.
"""

import os
import subprocess
import sys

# Every registered twin whose VALUES pass through double arithmetic
# (ratios, IEEE divisions, logs, cosines) — rank-only or pure-integer
# twins are already scale-independent and stay in the sf0.01 gate.
FLOAT_HEAVY = [
    "corpus_card",
    "lm_perplexity_stats",
    "semantic_decontam_stats",
    "kmv_user_overlap",
    "tfidf_top_terms",
    "percentile_prices",
    "similarity_topk",
    "embedding_cosine_pairs",
    "jaccard_neardup_pairs",
    "prefix_jaccard_pairs",
    "collocation_pmi_topk",
    "jw_name_pairs",
    "damerau_name_pairs",
    "auc_doclen_source",
    "kappa_langid_source",
    "copurchase_item_similarity",
    "target_encode_nation",
    "ols_regression_stats",
    "chi2_priority_status",
    "entropy_mi_events",
    "gini_supplier_share",
    "welch_ttest_events",
    "ab_conversion_ztest",
    "mad_price_outliers",
    "ks_doclen_sources",
    "tvd_drift_events",
    "benford_order_prices",
    "rfm_customer_segments",
    "cohort_retention_weekly",
    "seasonal_event_pattern",
    # r6 additions
    "theilsen_daily_trend",
    "xcorr_event_daily",
    "cuped_event_lift",
    "km_user_purchase_survival",
    "readability_docs",
    "qnorm_daily_event_values",
    "vocab_growth_docs",
    "bmp_pixel_stats",
    "containment_doc_pairs",
    "silhouette_embedding_clusters",
    "ohlc_daily_values",
    "twa_event_values",
    # r7 additions: the converted ANN gates carry round-6 cosine VALUES
    # (their bucketing/banding is exact-integer); ivf_exhaustive_topk
    # was the one pre-r7 cosine twin the list missed
    "embedding_knn_join",
    "ivf_ann_topk",
    "ivf_exhaustive_topk",
    "zipf_token_slope",  # r7: ln-moment OLS (round-4 outputs)
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env.setdefault("ORACLE_JOBS", "4")
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "check_oracle.py"),
         sf_dir, *FLOAT_HEAVY],
        env=env,
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
