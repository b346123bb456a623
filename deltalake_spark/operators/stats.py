"""Closed-form statistical analytics: regression, independence tests,
information theory, concentration, and robust moments.

Engine-native additions (the reference at ``src/query/index.ts`` stops
at the Mongo accumulator surface — ``$stdDevPop`` etc.; none of these
exist there). Everything here is a CLOSED-FORM composition of JVM-side
aggregates — no iteration, no UDFs, no driver math beyond assembling
the plan — so each operator is one or two hash-aggregate shuffles
regardless of input size:

- :func:`linear_regression` — per-group OLS fit (slope, intercept, r²)
  from the textbook moment identities ``slope = cov(x,y)/var(x)``,
  ``r² = corr²``. ONE partial-aggregated shuffle; no second pass.
- :func:`chi_square` — Pearson χ² independence over a contingency
  table. One groupBy(a,b) shuffle builds the cells; marginals are
  window sums OVER THE CELL FRAME (|A|·|B| rows, not N), so the big
  table is touched once.
- :func:`entropy_stats` — H(A), H(B), joint H(A,B) and mutual
  information from the same single-pass joint-count frame.
- :func:`gini_concentration` — Gini coefficient + Herfindahl index of
  a per-key measure. Agg to keys, then rank/sum windows over the
  (already reduced) key frame.
- :func:`pareto_coverage` — "what fraction of keys covers X% of the
  measure" (ABC analysis) via a descending cumulative-share window.
- :func:`welch_ttest` — Welch's unequal-variance t statistic and
  Satterthwaite dof between two groups, from per-group moments.
- :func:`winsorized_stats` — exact-percentile winsorized mean/clip
  counts per group (Spark's exact interpolating ``percentile``, same
  linear rule as DuckDB ``quantile_cont``), percentile agg broadcast
  back — the detail table is scanned twice but never re-shuffled.

100 TB notes: every operator reduces to aggregates whose partial
(map-side) combine Spark applies automatically; the window stages run
on frames whose row count is the number of GROUPS / CELLS / KEYS, not
input rows. ``winsorized_stats`` holds per-group value arrays only
inside the exact-percentile aggregate — for truly unbounded groups
callers should pre-aggregate or accept approx_percentile; documented
on the function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deltalake_spark.operators.sketches import KMV_MULT, _knuth32

__all__ = [
    "linear_regression",
    "chi_square",
    "entropy_stats",
    "gini_concentration",
    "pareto_coverage",
    "welch_ttest",
    "winsorized_stats",
    "roc_auc",
    "pr_auc",
    "ips_offpolicy",
    "cohens_kappa",
    "target_encode",
    "distribution_drift",
    "benford_digit_test",
    "proportion_ztest",
    "mad_outliers",
    "ks_two_sample",
    "mannwhitney_u",
    "kruskal_wallis",
    "bootstrap_mean_ci",
    "split_conformal_interval",
    "normal_sf_expr",
    "bh_fdr_ztests",
    "cmh_test",
    "lift_deciles",
    "best_gini_split",
    "quantile_normalize",
    "cuped_lift",
    "weighted_percentile",
]


def linear_regression(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group simple OLS ``y = slope*x + intercept`` via population
    moments (the SQL-standard ``REGR_*`` identities): one hash
    aggregate computing n, means, ``covar_pop`` and ``var_pop``, then
    pure column arithmetic. Emits ``n, slope, intercept, r2``; slope
    and r² are null for degenerate groups (zero x-variance), matching
    ``REGR_SLOPE``'s null contract."""
    group_cols = group_cols or []
    x, y = F.col(x_col), F.col(y_col)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("__mx"),
        F.avg(y).alias("__my"),
        F.covar_pop(x, y).alias("__cxy"),
        F.var_pop(x).alias("__vx"),
        F.var_pop(y).alias("__vy"),
    )
    slope = F.when(F.col("__vx") > 0, F.col("__cxy") / F.col("__vx"))
    r2 = F.when(
        (F.col("__vx") > 0) & (F.col("__vy") > 0),
        (F.col("__cxy") * F.col("__cxy"))
        / (F.col("__vx") * F.col("__vy")),
    )
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        (F.col("__my") - slope * F.col("__mx")).alias("intercept"),
        r2.alias("r2"),
    )


def chi_square(df: DataFrame, *, col_a: str, col_b: str) -> DataFrame:
    """Pearson χ² test of independence between two categorical
    columns. The N-row input collapses to one contingency-cell frame
    in a single shuffle; row/column marginals and the grand total are
    window sums over that cell frame (|A|·|B| rows), so no second scan
    and no join. Returns ONE row: ``chi2``, ``dof``, ``n``, and
    Cramér's V. Skew-safe: a hot category only concentrates one cell
    count, the partial aggregation absorbs the volume map-side."""
    cells = df.groupBy(col_a, col_b).agg(
        F.count(F.lit(1)).alias("__c"))
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    wall = Window.partitionBy()
    c = F.col("__c").cast("double")
    expected = (
        F.sum(c).over(wa) * F.sum(c).over(wb) / F.sum(c).over(wall))
    enriched = cells.select(
        col_a,
        col_b,
        c.alias("__c"),
        expected.alias("__e"),
    )
    agg = enriched.groupBy().agg(
        F.sum((F.col("__c") - F.col("__e")) ** 2 / F.col("__e"))
        .alias("chi2"),
        F.count_distinct(F.col(col_a)).alias("__ka"),
        F.count_distinct(F.col(col_b)).alias("__kb"),
        F.sum("__c").cast("long").alias("n"),
    )
    min_dim = F.least(F.col("__ka"), F.col("__kb")) - 1
    return agg.select(
        "chi2",
        ((F.col("__ka") - 1) * (F.col("__kb") - 1)).alias("dof"),
        "n",
        F.when(
            min_dim > 0,
            F.sqrt(F.col("chi2") / (F.col("n") * min_dim)),
        ).alias("cramers_v"),
    )


def entropy_stats(df: DataFrame, *, col_a: str, col_b: str) -> DataFrame:
    """Shannon entropies H(A), H(B), H(A,B) (nats) and mutual
    information ``MI = H(A)+H(B)-H(A,B)`` from ONE pass: the joint
    count frame is built with a single shuffle; marginal probabilities
    are window sums over the joint cells. Joint entropy sums
    ``-p log p`` over cells; marginal entropies de-duplicate each
    level with a row_number guard instead of re-scanning the input."""
    cells = df.groupBy(col_a, col_b).agg(
        F.count(F.lit(1)).alias("__c"))
    wall = Window.partitionBy()
    wa = Window.partitionBy(col_a)
    wb = Window.partitionBy(col_b)
    n = F.sum("__c").over(wall).cast("double")
    pj = F.col("__c") / n
    pa = F.sum("__c").over(wa) / n
    pb = F.sum("__c").over(wb) / n
    ra = F.row_number().over(wa.orderBy(col_b))
    rb = F.row_number().over(wb.orderBy(col_a))
    terms = cells.select(
        (-pj * F.log(pj)).alias("__hj"),
        F.when(ra == 1, -pa * F.log(pa)).otherwise(F.lit(0.0))
        .alias("__ha"),
        F.when(rb == 1, -pb * F.log(pb)).otherwise(F.lit(0.0))
        .alias("__hb"),
    )
    return terms.groupBy().agg(
        F.sum("__ha").alias("h_a"),
        F.sum("__hb").alias("h_b"),
        F.sum("__hj").alias("h_ab"),
    ).select(
        "h_a",
        "h_b",
        "h_ab",
        (F.col("h_a") + F.col("h_b") - F.col("h_ab")).alias("mi"),
    )


def gini_concentration(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Concentration of a measure across keys, per group: Gini
    coefficient via the rank formula over ascending per-key totals
    ``G = (2·Σ i·x_i) / (n·Σ x) − (n+1)/n`` and the Herfindahl–
    Hirschman index ``HHI = Σ share²``. First shuffle reduces the
    input to one row per (group, key); the rank window then runs over
    that reduced frame only. Ties are broken by key for determinism."""
    group_cols = group_cols or []
    keyed = df.groupBy(*group_cols, key_col).agg(
        F.sum(value_col).cast("double").alias("__x"))
    w = Window.partitionBy(*group_cols).orderBy("__x", key_col)
    ranked = keyed.select(
        *group_cols,
        "__x",
        F.row_number().over(w).alias("__i"),
    )
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__x").alias("total"),
        (
            2.0 * F.sum(F.col("__i") * F.col("__x"))
            / (F.count(F.lit(1)) * F.sum("__x"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))
        ).alias("gini"),
        (F.sum(F.col("__x") * F.col("__x"))
         / (F.sum("__x") * F.sum("__x"))).alias("hhi"),
    )


def pareto_coverage(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    thresholds: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """ABC / Pareto analysis: per group, the NUMBER and FRACTION of
    top keys whose descending cumulative share first reaches each
    threshold (e.g. 0.5, 0.8, 0.9 of total revenue). One reduce to
    per-key totals; a descending cumulative-sum window over the key
    frame; one conditional-count agg per threshold. Output: one row
    per (group, threshold)."""
    group_cols = group_cols or []
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    keyed = df.groupBy(*group_cols, key_col).agg(
        F.sum(value_col).cast("double").alias("__x"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__x").desc(), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    shares = keyed.select(
        *group_cols,
        (F.sum("__x").over(w) / F.sum("__x").over(tot))
        .alias("__cum_share"),
    )
    thr = F.explode(
        F.array(*[F.lit(float(t)) for t in thresholds])
    ).alias("threshold")
    expanded = shares.select(*group_cols, "__cum_share", thr)
    eps = 1e-12  # float-sum slack so 'exactly reaches' is stable
    return expanded.groupBy(*group_cols, "threshold").agg(
        F.count(F.lit(1)).alias("n_keys"),
        (
            F.sum(
                (F.col("__cum_share") < F.col("threshold") - eps)
                .cast("long")
            ) + 1
        ).alias("keys_to_cover"),
    ).select(
        *group_cols,
        "threshold",
        "n_keys",
        "keys_to_cover",
        (F.col("keys_to_cover") / F.col("n_keys"))
        .alias("frac_keys"),
    )


def welch_ttest(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t statistic between two
    levels of ``group_col``, with the Welch–Satterthwaite degrees of
    freedom. One conditional-aggregate pass (no join, no pivot):
    FILTER-style aggregates compute both groups' n/mean/s² in the same
    shuffle. Returns one row: ``n_a n_b mean_a mean_b t_stat dof``."""
    v = F.col(value_col).cast("double")
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    agg = df.where(in_a | in_b).groupBy().agg(
        F.count(F.when(in_a, 1)).alias("n_a"),
        F.count(F.when(in_b, 1)).alias("n_b"),
        F.avg(F.when(in_a, v)).alias("mean_a"),
        F.avg(F.when(in_b, v)).alias("mean_b"),
        F.var_samp(F.when(in_a, v)).alias("__va"),
        F.var_samp(F.when(in_b, v)).alias("__vb"),
    )
    sa = F.col("__va") / F.col("n_a")
    sb = F.col("__vb") / F.col("n_b")
    return agg.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        ((F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb))
        .alias("t_stat"),
        (
            (sa + sb) * (sa + sb)
            / (
                sa * sa / (F.col("n_a") - 1)
                + sb * sb / (F.col("n_b") - 1)
            )
        ).alias("dof"),
    )


def winsorized_stats(
    df: DataFrame,
    *,
    value_col: str,
    lower: float,
    upper: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Winsorized mean per group: clamp values to the exact
    [``lower``, ``upper``] percentiles (linear interpolation — Spark's
    ``percentile``, the same rule as DuckDB/Postgres
    ``quantile_cont``/``percentile_cont``) and re-average. The
    percentile aggregate reduces each group to two numbers; that tiny
    frame is BROADCAST back onto the detail rows, so the big table is
    never shuffled — scanned twice, reduced twice, joined zero-shuffle.

    Exact percentiles hold per-group value buffers inside the
    aggregate; for pathological single groups at extreme scale swap in
    ``approx_percentile`` (same plan shape, bounded memory)."""
    group_cols = group_cols or []
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(v, F.lit(float(lower))).alias("__lo"),
        F.percentile(v, F.lit(float(upper))).alias("__hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), on=group_cols or None, how="inner")
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    clamped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(v).alias("raw_mean"),
        F.avg(clamped).alias("winsorized_mean"),
        F.sum((v < F.col("__lo")).cast("long")).alias("n_clipped_low"),
        F.sum((v > F.col("__hi")).cast("long")).alias("n_clipped_high"),
    )


def roc_auc(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC-AUC (Mann–Whitney U) per group, with proper
    average-rank tie handling — the standard eval metric for "does
    this signal separate the classes" checks over quality scores,
    classifier outputs, or dedup similarities.

    Exactness without a global sort: reduce to the per-score class
    HISTOGRAM first (one groupBy shuffle — the only pass over the
    detail rows), then on histogram rows compute
    ``neg_below(s)`` with a prefix-sum window. Twice the U statistic
    is then the exact integer
    ``u2 = Σ_s (2·pos(s)·neg_below(s) + pos(s)·neg(s))``
    (the second term IS the tie correction: each tied pos/neg pair
    contributes ½), and ``auc = u2 / (2·n_pos·n_neg)`` is ONE double
    division of exact integers — bit-identical on any engine or
    partitioning, no rank column, no 0.5-rank floats.

    The window runs over histogram rows (distinct scores per group),
    not detail rows — for bounded-cardinality scores (lengths, int
    quality buckets, calibrated probabilities) that is KB-scale even
    at 100 TB. Groups with a single class get ``auc = NULL``
    (undefined), not a crash. ``label_col`` must be 0/1-castable.

    Returns per group: ``n_pos, n_neg, u2, auc``.
    """
    group_cols = group_cols or []
    y = F.col(label_col).cast("long")
    hist = df.groupBy(*group_cols, F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(y).alias("__p"),
    ).withColumn("__q", F.col("__c") - F.col("__p"))
    w = (Window.partitionBy(*group_cols) if group_cols
         else Window.partitionBy()).orderBy("__s") \
        .rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "__neg_below",
        F.coalesce(F.sum("__q").over(w), F.lit(0).cast("long")))
    out = ranked.groupBy(*group_cols).agg(
        F.sum("__p").alias("n_pos"),
        F.sum("__q").alias("n_neg"),
        F.sum(2 * F.col("__p") * F.col("__neg_below")
              + F.col("__p") * F.col("__q")).alias("u2"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("u2").cast("double")
        / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
    )
    return out.withColumn("auc", auc)


def pr_auc(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact AVERAGE PRECISION (area under the precision-recall curve,
    the sklearn ``average_precision_score`` threshold-sum definition)
    per group — the companion to :func:`roc_auc` for IMBALANCED
    positives, where ROC-AUC saturates but PR-AUC still separates
    retrieval/quality rankers.

    Tie-robust by construction: thresholds are the DISTINCT scores
    descending, so within-tie ordering can never change the value
    (the step-function AP over row ranks does depend on it) —
    ``AP = Σ_k (R_k − R_{k−1})·P_k`` over score cells with
    ``P_k = TP_k/(TP_k+FP_k)``, ``R_k = TP_k/n_pos``.

    Same scale shape as :func:`roc_auc`: ONE detail-row shuffle to the
    per-score class histogram; prefix sums and the AP fold run over
    the T-row cell frame (quantize continuous scores first — the
    :func:`roc_auc` bounded-cardinality contract). Each AP term is
    ``ΔTP·TP`` (exact BIGINTs) over one double division, and the terms
    fold in SORTED threshold order via an in-plan array fold (the
    :func:`cmh_test` recipe), so any engine replays the float sequence
    exactly. Single-class groups get NULL.

    Returns per group: ``(n_pos, n_neg, n_thresholds,
    average_precision)``.
    """
    group_cols = group_cols or []
    y = F.col(label_col).cast("long")
    hist = df.groupBy(*group_cols, F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(y).alias("__p"),
    ).withColumn("__q", F.col("__c") - F.col("__p"))
    w = (Window.partitionBy(*group_cols) if group_cols
         else Window.partitionBy()).orderBy(F.desc("__s")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        *group_cols, "__s", "__p", "__q",
        F.sum("__p").over(w).alias("__tp"),
        F.sum("__q").over(w).alias("__fp"),
    )
    packed = cum.groupBy(*group_cols).agg(
        F.sum("__p").alias("n_pos"),
        F.sum("__q").alias("n_neg"),
        F.count(F.lit(1)).alias("n_thresholds"),
        F.array_sort(F.collect_list(F.struct(
            F.col("__tp").alias("o"),  # tp ascending == thresholds desc
            F.col("__p").alias("dtp"),
            F.col("__tp").alias("tp"),
            F.col("__fp").alias("fp"),
        ))).alias("__cells"),
    )
    ap_sum = F.aggregate(
        F.col("__cells"), F.lit(0.0),
        lambda acc, r: acc + (
            r["dtp"] * r["tp"]).cast("double")
        / (r["tp"] + r["fp"]).cast("double"))
    ap = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(ap_sum / F.col("n_pos").cast("double"), 6))
    return packed.select(
        *group_cols, "n_pos", "n_neg", "n_thresholds",
        ap.alias("average_precision"))


def ips_offpolicy(
    df: DataFrame,
    *,
    reward_col: str,
    logged_prop_col: str,
    target_prop_col: str,
) -> DataFrame:
    """OFF-POLICY EVALUATION of a target policy from logged bandit
    feedback: inverse-propensity scoring (Horvitz–Thompson), the
    self-normalized variant (SNIPS, Swaminathan & Joachims 2015), and
    the effective sample size — the standard "would the new
    ranker/filter have done better?" readout computed WITHOUT an A/B
    test, from logs alone.

    ``w = π(a|x)/μ(a|x)`` per logged row; ``IPS = Σ w·r / n``;
    ``SNIPS = Σ w·r / Σ w``; ``ESS = (Σ w)² / Σ w²`` (how many
    uniform-weight samples the weighted estimate is worth — the
    diagnostic that exposes propensity mismatch).

    Determinism: weights quantize once to integer micros
    (``round(w·1e6)``) and rewards to cents, so every sum is EXACT
    integer arithmetic carried in decimal(38,0) (products reach
    ~1e13/row — BIGINT would overflow beyond ~1e5 rows); the reported
    estimates are single divisions of those exact sums. One
    conditional-aggregate pass, no windows, no joins. Rows with
    non-positive logged propensity raise upstream concerns — they are
    EXCLUDED and counted (``n_unsupported``), the standard support
    rule. Output one row: ``(n, n_unsupported, sum_w_micro,
    ips_value, snips_value, ess)``.
    """
    w = F.col(target_prop_col).cast("double") \
        / F.col(logged_prop_col).cast("double")
    ok = F.col(logged_prop_col).cast("double") > 0
    w6 = F.round(w * 1_000_000).cast("decimal(38,0)")
    r_c = F.round(F.col(reward_col).cast("double") * 100).cast(
        "decimal(38,0)")
    agg = df.groupBy().agg(
        F.count(F.when(ok, 1)).alias("n"),
        F.count(F.when(~ok, 1)).alias("n_unsupported"),
        F.sum(F.when(ok, w6)).alias("__sw"),
        F.sum(F.when(ok, w6 * r_c)).alias("__swr"),
        F.sum(F.when(ok, w6 * w6)).alias("__sww"),
    )
    n_d = F.col("n").cast("double")
    sw = F.col("__sw").cast("double")
    swr = F.col("__swr").cast("double")
    sww = F.col("__sww").cast("double")
    return agg.select(
        "n",
        "n_unsupported",
        F.col("__sw").cast("long").alias("sum_w_micro"),
        # /1e6 (micros) /100 (cents) /n
        F.round(swr / (F.lit(1e8) * n_d), 6).alias("ips_value"),
        F.round(swr / (F.lit(100.0) * sw), 6).alias("snips_value"),
        F.round(sw * sw / sww, 6).alias("ess"),
    )


def cohens_kappa(
    df: DataFrame,
    *,
    col_a: str,
    col_b: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cohen's kappa per group: chance-corrected agreement between two
    categorical annotators (model vs model, model vs gold label) —
    the standard "is this auto-labeler actually better than chance"
    check before trusting weak supervision at corpus scale.

    One detail-row shuffle reduces to the contingency CELL frame
    (|A|x|B| rows per group); marginals, the diagonal, and the chance
    term are aggregates/joins over that KB-scale frame only. With
    integer counts the whole statistic is the exact rational
    ``kappa = (n·agree − Σ_k row_k·col_k) / (n² − Σ_k row_k·col_k)``
    evaluated as ONE double division — bit-identical cross-engine.
    (Exactness needs ``n² < 2^63``: fine to ~3e9 rows per group;
    beyond that, pre-aggregate or accept double sums.) Degenerate
    groups where both annotators are constant (``n² == Σ row·col``)
    yield ``kappa = NULL``.

    Returns per group: ``n, n_agree, pe_pairs, kappa``.
    """
    g = group_cols or []
    cells = df.groupBy(
        *g, F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__c"))
    cells = cells.persist()  # three aggregates replay this KB frame
    ra = cells.groupBy(*g, F.col("__a").alias("__k")).agg(
        F.sum("__c").alias("__ra"))
    cb = cells.groupBy(*g, F.col("__b").alias("__k")).agg(
        F.sum("__c").alias("__cb"))
    # inner join: a label absent on either side contributes 0 to pe —
    # and a group with NO shared labels at all must surface pe = 0
    # (left join + coalesce), not vanish or go NULL
    pe = ra.join(cb, [*g, "__k"]).groupBy(*g).agg(
        F.sum(F.col("__ra") * F.col("__cb")).alias("__pe"))
    tot = cells.groupBy(*g).agg(
        F.sum("__c").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))
              .otherwise(F.lit(0))).alias("n_agree"))
    out = (tot.join(pe, g, "left") if g
           else tot.crossJoin(F.broadcast(pe)))
    out = out.withColumn(
        "pe_pairs",
        F.coalesce(F.col("__pe"), F.lit(0).cast("long"))).drop("__pe")
    denom = F.col("n") * F.col("n") - F.col("pe_pairs")
    kappa = F.when(
        denom != 0,
        (F.col("n") * F.col("n_agree") - F.col("pe_pairs"))
        .cast("double") / denom,
    )
    return out.withColumn("kappa", kappa)


def target_encode(
    df: DataFrame,
    *,
    cat_col: str,
    label_col: str,
    smoothing: float = 20.0,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical column — the
    standard high-cardinality featurization: each category maps to a
    shrunk estimate of the label mean,

        enc(c) = (sum_y(c) + m·prior) / (n(c) + m)

    with ``prior`` the global label mean and ``m`` the smoothing
    pseudo-count, so rare categories fall back toward the prior
    instead of memorizing noise (the m-estimate / empirical-Bayes
    shrinkage rule).

    Determinism: with a 0/1 (or integer) label, ``sum_y`` and ``n``
    are exact integers and ``prior`` is one exact-integer division;
    the encode is then a FIXED chain of IEEE ops — reproducible
    cross-engine, unlike a mean of doubles. One groupBy shuffle over
    the detail rows + one 2-scalar collect for the prior (compiled
    back as a literal — no crossJoin node).

    Returns ``(category, n, sum_y, encoded)`` keyed by ``cat_col``'s
    values; join it back (broadcast — category vocabularies are
    small) to featurize the detail table.
    """
    y = F.col(label_col).cast("long")
    grp = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(y).alias("sum_y"))
    grp = grp.persist()  # totals agg + output both read it
    tot = grp.agg(F.sum("n"), F.sum("sum_y")).first()
    n_all, y_all = int(tot[0] or 0), int(tot[1] or 0)
    if n_all == 0:
        return grp.withColumn("encoded", F.lit(None).cast("double"))
    prior = y_all / n_all  # one exact-integer IEEE division
    m = float(smoothing)
    return grp.withColumn(
        "encoded",
        (F.col("sum_y").cast("double") + F.lit(m * prior))
        / (F.col("n") + F.lit(m)),
    )


def target_encode_loo(
    df: DataFrame,
    *,
    cat_col: str,
    label_col: str,
    smoothing: float = 20.0,
    out_col: str = "encoded_loo",
) -> DataFrame:
    """LEAVE-ONE-OUT smoothed target encoding — the leakage-controlled
    variant of :func:`target_encode` used when the encoded feature
    trains a model on the SAME rows: each row's encode excludes its
    own label,

        enc_i = (sum_y(c) − y_i + m·prior) / (n(c) − 1 + m)

    so a row can never see itself (the classic target-leakage fix;
    Micci-Barreca 2001 m-estimate with the LOO correction).

    Determinism: with an integer 0/1 label, ``sum_y(c) − y_i`` and
    ``n(c) − 1`` are exact integers per row, ``prior`` is one exact
    integer division, and the encode is a FIXED chain of IEEE ops —
    reproducible cross-engine. ``smoothing`` must be > 0 (it is also
    what keeps singleton categories finite: their LOO denominator is
    exactly ``m``).

    Scale shape: ONE category-keyed window pass annotates every detail
    row with its category totals (no separate agg + join-back), plus a
    2-scalar collect for the prior folded in as a literal. Returns the
    input plus ``out_col``.
    """
    if smoothing <= 0:
        raise ValueError(
            "smoothing must be > 0 (singleton categories divide by "
            "n - 1 + smoothing)")
    y = F.col(label_col).cast("long")
    tot = df.agg(F.count(y).alias("n"), F.sum(y).alias("s")).first()
    n_all, y_all = int(tot["n"] or 0), int(tot["s"] or 0)
    if n_all == 0:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    prior = y_all / n_all  # one exact-integer IEEE division
    m = float(smoothing)
    w = Window.partitionBy(cat_col)
    enc = (
        (F.sum(y).over(w) - y).cast("double") + F.lit(m * prior)
    ) / ((F.count(y).over(w) - 1).cast("double") + F.lit(m))
    return df.withColumn(out_col, enc)


def distribution_drift(
    df: DataFrame,
    *,
    split_col: str,
    bin_col: str,
    base_value,
    curr_value,
) -> DataFrame:
    """Distribution drift between a baseline and a current slice of
    the same table — the monitoring check a 100 TB ingest runs per
    batch: has the categorical/binned profile of the new data moved
    away from the reference period?

    The drift score is TOTAL VARIATION DISTANCE,
    ``TVD = 1/2 · Σ_bins |p_base(b) − p_curr(b)|`` — same support-
    union semantics as PSI but with NO logarithms, so the per-bin
    numerators stay EXACT INTEGERS:

        contrib_num(b) = |n_base(b)·N_curr − n_curr(b)·N_base|

    and each reported double is one fixed IEEE division over exact
    integers — bit-identical cross-engine (the same trick the PMI op
    uses to avoid ln drift). Bins missing from one side contribute
    their full mass, so category births/deaths register as drift.

    Scale shape: ONE groupBy(bin) over the filtered detail rows
    builds both counts via conditional sums; the totals are a 2-
    scalar collect compiled back as literals (no crossJoin node);
    everything after the first shuffle runs on the BIN frame.

    Output: ``(bin, n_base, n_curr, p_base, p_curr, tvd_contrib)``
    ordered by bin — TVD itself is ``sum(tvd_contrib)`` but the
    per-bin frame is the useful artifact (which bins moved).
    """
    split = F.col(split_col)
    both = df.where(split.isin([base_value, curr_value]))
    cells = both.groupBy(F.col(bin_col).alias("bin")).agg(
        F.sum((split == F.lit(base_value)).cast("long"))
        .alias("n_base"),
        F.sum((split == F.lit(curr_value)).cast("long"))
        .alias("n_curr"),
    )
    cells = cells.persist()  # totals agg + output both read it
    tot = cells.agg(F.sum("n_base"), F.sum("n_curr")).first()
    n_base_all, n_curr_all = int(tot[0] or 0), int(tot[1] or 0)
    if n_base_all == 0 or n_curr_all == 0:
        raise ValueError(
            f"empty slice: baseline={n_base_all} current={n_curr_all}")
    # |n_b·N_c − n_c·N_b| is an exact bigint; each double below is one
    # IEEE division away from integers → reproducible cross-engine
    num = F.abs(F.col("n_base") * F.lit(n_curr_all)
                - F.col("n_curr") * F.lit(n_base_all))
    return (
        cells.select(
            "bin", "n_base", "n_curr",
            (F.col("n_base") / F.lit(float(n_base_all)))
            .alias("p_base"),
            (F.col("n_curr") / F.lit(float(n_curr_all)))
            .alias("p_curr"),
            (num / F.lit(2.0 * n_base_all * n_curr_all))
            .alias("tvd_contrib"),
        )
        .orderBy("bin")
    )


# Benford expected first-digit probabilities log10(1 + 1/d), d=1..9,
# folded to literal doubles HERE (not at runtime) so the Spark plan
# and the SQL twin embed bit-identical constants with no cross-engine
# log10 call.
_BENFORD_P = (
    0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
)


def benford_digit_test(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fraud / synthetic-data screen for naturally-occurring
    amounts. Values are quantized to integer cents, the first digit
    is taken from the INTEGER's decimal rendering (portable — no
    cross-engine log10/pow drift), and each digit row reports its
    observed count against the Benford expectation with its Pearson
    χ² term ``(obs − n·p)² / (n·p)``.

    Expected probabilities are compile-time literal doubles (module
    constant ``_BENFORD_P``), so every reported double is a fixed
    IEEE chain over exact integer counts and literals. The per-digit
    frame (9 rows per group) is the output; callers sum ``chi2_term``
    in digit order if they want the scalar statistic.

    Scale shape: one groupBy(group, digit) shuffle with map-side
    partial counts; the group-total window runs on the 9-row-per-
    group digit frame. Rows with value ≤ 0 or NULL are excluded
    (Benford applies to positive magnitudes).
    """
    groups = [F.col(c) for c in (group_cols or [])]
    cents = F.round(F.col(value_col) * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    pos = df.where(F.col(value_col).isNotNull() & (cents > 0))
    counts = pos.groupBy(*groups, digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n_obs"))
    w = Window.partitionBy(
        *[F.col(c) for c in (group_cols or [])]) if group_cols \
        else Window.partitionBy()
    counts = counts.withColumn("n_total", F.sum("n_obs").over(w))
    p_expr = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        p_expr = F.when(F.col("digit") == d,
                        F.lit(_BENFORD_P[d - 1])).otherwise(p_expr)
    expected = F.col("n_total") * p_expr
    dev = F.col("n_obs") - expected
    return (
        counts.select(
            *[F.col(c) for c in (group_cols or [])],
            "digit", "n_obs", "n_total",
            expected.alias("expected"),
            (dev * dev / expected).alias("chi2_term"),
        )
        .orderBy(*(group_cols or []), "digit")
    )


def proportion_ztest(
    df: DataFrame,
    *,
    group_cols: list[str],
    variant_col: str,
    success_col: str,
    variant_a,
    variant_b,
) -> DataFrame:
    """Two-proportion z-test per group — the A/B conversion test
    (complements :func:`welch_ttest`, which compares means): is the
    success rate of variant A different from variant B?

        z = (p_a − p_b) / sqrt(p·(1−p)·(1/n_a + 1/n_b))

    with ``p`` the pooled rate. All counts come from ONE conditional
    aggregation (zero extra shuffles beyond the group agg); every
    reported double is a FIXED chain of correctly-rounded IEEE ops
    (divisions, one sqrt) over exact integers, so the SQL twin matches
    bit-for-bit. Degenerate groups (either variant empty, or pooled
    rate 0/1 → zero variance) return NULL z.

    Output: ``(group..., n_a, x_a, n_b, x_b, p_a, p_b, z)``.
    """
    v = F.col(variant_col)
    s = F.col(success_col).cast("long")
    grp = df.groupBy(*group_cols).agg(
        F.sum((v == F.lit(variant_a)).cast("long")).alias("n_a"),
        F.sum(F.when(v == F.lit(variant_a), s).otherwise(0))
        .alias("x_a"),
        F.sum((v == F.lit(variant_b)).cast("long")).alias("n_b"),
        F.sum(F.when(v == F.lit(variant_b), s).otherwise(0))
        .alias("x_b"),
    )
    p_a = F.col("x_a") / F.col("n_a").cast("double")
    p_b = F.col("x_b") / F.col("n_b").cast("double")
    pool = (F.col("x_a") + F.col("x_b")) \
        / (F.col("n_a") + F.col("n_b")).cast("double")
    se = F.sqrt(pool * (F.lit(1.0) - pool)
                * (F.lit(1.0) / F.col("n_a")
                   + F.lit(1.0) / F.col("n_b")))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0)
    return grp.select(
        *group_cols, "n_a", "x_a", "n_b", "x_b",
        F.when(F.col("n_a") > 0, p_a).alias("p_a"),
        F.when(F.col("n_b") > 0, p_b).alias("p_b"),
        F.when(ok, (p_a - p_b) / se).alias("z"),
    )


def mad_outliers(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier screen per group via the median absolute
    deviation — the heavy-tail-safe alternative to mean/stddev
    z-scores (which break down when the outliers themselves inflate
    the spread; median/MAD have a 50% breakdown point).

    ``med = median(x)``; ``mad = median(|x − med|)``; a value is an
    outlier when ``|x − med| > k·mad``. With integer(-cents) inputs
    both medians interpolate on halves — exactly representable
    doubles under the same linear rule as DuckDB ``quantile_cont``
    (the winsorized-stats precedent) — and the threshold compare is
    a fixed IEEE chain, so counts are cross-engine exact. Zero-MAD
    groups (>50% identical values) degenerate to "anything ≠ median
    is an outlier", the standard caveat.

    Scale shape: three passes over the detail rows (median, MAD,
    threshold count), each a group-keyed aggregate with the KB-scale
    per-group stats broadcast back between passes — the detail table
    is never re-shuffled. Like ``winsorized_stats``, the exact
    ``percentile`` aggregate holds per-group arrays; pre-aggregate
    unbounded groups or swap approx_percentile.

    Output: ``(group..., n, median, mad, n_outliers)``.
    """
    x = F.col(value_col).cast("double")
    med_frame = df.groupBy(*group_cols).agg(
        F.percentile(x, F.lit(0.5)).alias("median"),
        F.count(F.lit(1)).alias("n"))
    with_med = df.join(F.broadcast(med_frame), list(group_cols))
    dev = F.abs(x - F.col("median"))
    mad_frame = with_med.groupBy(*group_cols).agg(
        F.percentile(dev, F.lit(0.5)).alias("mad"))
    full = with_med.join(F.broadcast(mad_frame), list(group_cols))
    return (
        full.groupBy(*group_cols)
        .agg(
            F.first("n").alias("n"),
            F.first("median").alias("median"),
            F.first("mad").alias("mad"),
            F.sum((F.abs(x - F.col("median"))
                   > F.lit(float(k)) * F.col("mad")).cast("long"))
            .alias("n_outliers"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between EVERY
    pair of groups, in pure integers.

    The KS statistic is ``D = sup_x |F_a(x) − F_b(x)|``; multiplying
    through by ``n_a·n_b`` makes the supremum an INTEGER —
    ``D_scaled = max_x |n_b·C_a(x) − n_a·C_b(x)|`` over cumulative
    counts C — so both engines agree bit-for-bit, and the float ``d``
    is one IEEE division at the end.

    Plan shape (for |G| groups, T distinct values): one
    (group, value) hash aggregate over the detail rows (map-side
    combine — the ONLY pass over raw data); the value grid
    (T rows) is cross-joined with the broadcast group-totals frame
    (|G| rows) so every group has a row at every threshold; one
    cumulative window per group over the G×T grid; a value-keyed
    self-join pairs groups at each threshold (G²·T rows, still
    grid-scale); one (a, b) max-aggregate. Raw volume is touched
    once — everything else is distribution-frame-sized. For
    continuous value domains at 100 TB, quantize/bucket the value
    first (T bounds every frame here).

    Output: ``(src_a, src_b, n_a, n_b, d_scaled, d)``, one row per
    unordered group pair (a < b).
    """
    counts = df.groupBy(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("x"),
    ).agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("g").agg(F.sum("c").alias("n"))
    grid_x = counts.select("x").distinct()
    grid = grid_x.crossJoin(F.broadcast(totals))
    cum = (
        grid.join(counts, ["g", "x"], "left")
        .select(
            "g", "x", "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"))
        .withColumn(
            "cum",
            F.sum("c").over(
                Window.partitionBy("g").orderBy("x")
                .rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    a = cum.select(
        F.col("g").alias("src_a"), "x",
        F.col("n").alias("n_a"), F.col("cum").alias("cum_a"))
    b = cum.select(
        F.col("g").alias("src_b"), "x",
        F.col("n").alias("n_b"), F.col("cum").alias("cum_b"))
    pairs = a.join(b, "x").where(F.col("src_a") < F.col("src_b"))
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.max(
                F.abs(
                    F.col("n_b") * F.col("cum_a")
                    - F.col("n_a") * F.col("cum_b"))
            ).alias("d_scaled"),
        )
        .select(
            "src_a", "src_b", "n_a", "n_b", "d_scaled",
            F.round(
                F.col("d_scaled")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("d"),
        )
    )


def _guard_rank_frame(
    expr: "F.Column", op: str, max_rank_frame: int | None,
) -> "F.Column":
    """Executor-side guard for the rank tests' single-partition value
    window: the distinct-value count T is data-dependent (unknowable
    at plan time), so — the ``rolling_quantile``/``max_frame``
    precedent — a full-frame count rides the SAME single-partition
    window the ranks already use, and the raise_error branch fires
    before any downstream work when T exceeds the cap. An unquantized
    continuous column at 100 TB has T ≈ N; this turns "one executor
    sorts the corpus" into a loud, actionable error."""
    if max_rank_frame is None:
        return expr
    wall = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return F.when(
        F.count(F.lit(1)).over(wall) > int(max_rank_frame),
        F.raise_error(F.lit(
            f"{op}: the distinct-value frame exceeded "
            f"max_rank_frame={max_rank_frame} rows — the rank window "
            f"sorts it in ONE partition, so a continuous value domain "
            f"must be quantized/bucketed first (the ks_two_sample "
            f"grid rule: ranks over the coarsened grid are still the "
            f"exact test on the coarsened data); or pass "
            f"max_rank_frame=None/larger to accept the cost")),
    ).otherwise(expr)


def mannwhitney_u(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    max_rank_frame: int | None = 1_000_000,
) -> DataFrame:
    """Mann–Whitney U test (Wilcoxon rank-sum) between two levels of
    ``group_col``, with the normal approximation and the standard tie
    correction — the nonparametric counterpart of :func:`welch_ttest`
    for ordinal / heavy-tailed metrics (doc lengths, latencies).

    Exact-integer core: average ranks of tied blocks are half-integers,
    so everything is carried as DOUBLED ranks — for a tied block of
    size ``t`` starting after ``c`` earlier rows the doubled average
    rank is ``2c + t + 1`` (an integer). The doubled rank sum ``R2_a``
    is an exact BIGINT; the tie term ``Σ(t³−t)`` is carried in
    decimal(38,0) — in BIGINT it overflows once one tied block passes
    ~2.09M rows, exactly the regime coarse quantization creates at
    large N; decimal is exact to t ≈ 4.6e12, and ``z_stat`` is
    assembled from the decimal directly. The reported ``tie_term``
    diagnostic is a double (exact to 2⁵³, approximate past it — the
    test statistic never loses exactness). The only floats are the
    final half-dozen flops
    assembling ``z = (U − μ)/σ`` from those integers, which both
    engines perform on identical operands.

    Plan shape (T distinct values): one (value) hash aggregate with
    conditional counts over the detail rows — the ONLY pass over raw
    data; one cumulative window over the T-row value frame; one scalar
    aggregate. No joins. The value frame's cumulative window is a
    single-partition sort of T rows, so for CONTINUOUS value domains
    (T approaching N) quantize/bucket the value first — the
    :func:`ks_two_sample` grid rule; ranks over the quantized grid
    are the test on the coarsened data, still exact. That rule is
    ENFORCED, not advisory: ``max_rank_frame`` (default 1e6) is
    checked per row ON THE EXECUTOR — T is data-dependent, so the
    :func:`~deltalake_spark.operators.timeseries.rolling_quantile`
    ``max_frame`` precedent applies — and an unquantized continuous
    column raises with a pointer at quantization instead of silently
    sorting N rows in one partition. Output one row:
    ``(n_a, n_b, u_a, u_mean, tie_term, z_stat)``.
    """
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    vals = (
        df.where(in_a | in_b)
        .groupBy(F.col(value_col).alias("__v"))
        .agg(
            F.count(F.lit(1)).alias("__t"),
            F.count(F.when(in_a, 1)).alias("__ta"),
        )
    )
    wcum = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "__c", F.coalesce(F.sum("__t").over(wcum), F.lit(0)))
    # doubled average rank of the tied block: 2c + t + 1 —
    # materialized as a column so the guard's full-frame window sits
    # in the projection, not inside the aggregate below
    ranked = ranked.withColumn(
        "__r2",
        _guard_rank_frame(
            2 * F.col("__c") + F.col("__t") + F.lit(1),
            "mannwhitney_u", max_rank_frame))
    # tie term in decimal(38,0): t³−t in BIGINT silently wraps (or
    # raises under ANSI) once a single tied block exceeds ~2.09M rows
    # — exactly the regime quantize-first creates at large N. Decimal
    # is exact to t ≈ 4.6e12.
    td = F.col("__t").cast("decimal(38,0)")
    agg = ranked.groupBy().agg(
        F.sum("__ta").alias("n_a"),
        F.sum(F.col("__t") - F.col("__ta")).alias("n_b"),
        F.sum(F.col("__ta") * F.col("__r2")).alias("__r2a"),
        F.sum(td * td * td - td).alias("__tie"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    n = n_a + n_b
    # U_a = R_a − n_a(n_a+1)/2, carried doubled then halved once.
    u2 = F.col("__r2a") - F.col("n_a") * (F.col("n_a") + 1)
    u_a = u2.cast("double") / F.lit(2.0)
    u_mean = n_a * n_b / F.lit(2.0)
    sigma2 = (
        n_a * n_b / F.lit(12.0)
        * ((n + 1) - F.col("__tie").cast("double") / (n * (n - 1)))
    )
    return agg.select(
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        u_mean.alias("u_mean"),
        F.col("__tie").cast("double").alias("tie_term"),
        ((u_a - u_mean) / F.sqrt(sigma2)).alias("z_stat"),
    )


def kruskal_wallis(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    max_rank_frame: int | None = 1_000_000,
) -> DataFrame:
    """Kruskal–Wallis H test across ALL levels of ``group_col`` — the
    k-sample extension of :func:`mannwhitney_u` (one-way ANOVA on
    ranks), with the standard tie correction
    ``C = 1 − Σ(t³−t)/(N³−N)``.

    Same doubled-rank integer core as :func:`mannwhitney_u`: per-group
    doubled rank sums ``R2_g`` are exact BIGINTs and the tie term is
    exact decimal(38,0) (see :func:`mannwhitney_u` on why BIGINT
    overflows at ~2.09M-row tie blocks; the reported ``tie_term``
    diagnostic is a double, while ``h_corrected`` uses the exact
    decimal); H is assembled from them in a handful of trailing
    flops
    (``H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1)``, with ``R_g = R2_g/2``).

    Plan shape (T distinct values, G groups): one (value, group) hash
    aggregate over the detail rows — the only raw-data pass (the cell
    frame stays persisted: the rank window, the tie term, and the
    per-group sums all replay it; long-lived sessions release it via
    :func:`deltalake_spark.session.release_caches`); a value-frame
    cumulative window (T rows) derived from it by a second tiny
    aggregate, joined back on value (both sides value-frame scale);
    one G-row aggregate, one scalar reduce. As with
    :func:`mannwhitney_u`, the rank window is a single-partition sort
    of the T-row value frame — quantize continuous value domains
    first, and ``max_rank_frame`` (default 1e6) enforces it with an
    executor-side raise_error when T exceeds the cap. Output one row:
    ``(n_total, n_groups, tie_term, h_stat, h_corrected, dof)``.
    """
    cells = df.groupBy(
        F.col(value_col).alias("__v"),
        F.col(group_col).alias("__g"),
    ).agg(F.count(F.lit(1)).alias("__tg"))
    cells = cells.persist()  # 3 consumers replay the only raw-data pass
    vals = cells.groupBy("__v").agg(F.sum("__tg").alias("__t"))
    wcum = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "__c", F.coalesce(F.sum("__t").over(wcum), F.lit(0)))
    rank2 = _guard_rank_frame(
        2 * F.col("__c") + F.col("__t") + F.lit(1),
        "kruskal_wallis", max_rank_frame)
    joined = cells.join(
        ranked.select("__v", rank2.alias("__r2"), "__t"), "__v")
    # tie term folded into the same pass: Σ_v t(t²−1) = Σ_{(v,g)} t_g(t²−1)
    # — in decimal(38,0), same overflow rationale as mannwhitney_u
    tdec = F.col("__t").cast("decimal(38,0)")
    groups = joined.groupBy("__g").agg(
        F.sum("__tg").alias("__ng"),
        F.sum(F.col("__tg") * F.col("__r2")).alias("__r2g"),
        F.sum(
            F.col("__tg").cast("decimal(38,0)")
            * (tdec * tdec - F.lit(1))
        ).alias("__tie_g"),
    )
    # Σ R_g²/n_g with R_g = R2_g/2 → Σ R2_g²/(4·n_g)
    term = (
        F.col("__r2g").cast("double") * F.col("__r2g").cast("double")
        / (F.lit(4.0) * F.col("__ng").cast("double"))
    )
    agg = groups.groupBy().agg(
        F.sum("__ng").alias("n_total"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(term).alias("__s"),
        F.sum("__tie_g").alias("__tie"),
    )
    n = F.col("n_total").cast("double")
    h = F.lit(12.0) / (n * (n + 1)) * F.col("__s") - 3 * (n + 1)
    c = F.lit(1.0) - F.col("__tie").cast("double") / (n * n * n - n)
    return agg.select(
        "n_total",
        "n_groups",
        F.col("__tie").cast("double").alias("tie_term"),
        h.alias("h_stat"),
        (h / c).alias("h_corrected"),
        (F.col("n_groups") - 1).cast("long").alias("dof"),
    )


def _poisson1_thresholds(max_k: int = 8) -> list[int]:
    """Exact integer thresholds for inverse-CDF sampling of Poisson(1)
    from a 32-bit uniform: ``floor(CDF(k) · 2³²)`` for k = 0..max_k−1
    (draws above the last threshold truncate to ``max_k`` — CDF(7) ≈
    0.99999, so truncation to 8 is one draw in ~10⁵ and part of the
    definition both engines replay)."""
    import math

    e1 = math.exp(-1.0)
    cum, out, term = 0.0, [], e1
    for k in range(max_k):
        cum += term
        out.append(int(cum * 4294967296.0))
        term /= (k + 1)
    return out


def bootstrap_mean_ci(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str,
    n_resamples: int = 64,
    seed: int = 7,
    lo: tuple[int, int] = (1, 40),
    hi: tuple[int, int] = (39, 40),
) -> DataFrame:
    """Distributed POISSON BOOTSTRAP confidence interval for the mean —
    the classic single-pass resampling scheme for data too large to
    permute (each bootstrap replicate gives every row an independent
    Poisson(1) multiplicity; Hanley & MacGibbon 2006, and the engine
    trick behind BLB-style CIs at scale): no row is ever copied B
    times through a shuffle, no driver-side resampling loop.

    Fully deterministic: the (row, replicate) uniform is the portable
    Knuth hash ``((id·B + b + seed) · 2654435761) mod 2³²`` and the
    Poisson draw is an inverse-CDF threshold ladder of EXACT integer
    constants (:func:`_poisson1_thresholds`), so any SQL engine
    replays every multiplicity. Values aggregate as integer cents
    (``round(value·100)``) — replicate sums are exact BIGINTs and each
    replicate mean is one IEEE division. CI bounds are nearest-rank
    order statistics of the B replicate means (rank ``⌈q·B⌉`` in pure
    integers, ties broken by replicate index) — no interpolation
    ambiguity. Caller contract: ``id·B + B + seed`` must fit int64
    (ids below ~2⁵⁷ at B = 64); the Knuth multiply itself is
    overflow-proof on BOTH engines — Spark uses the 16-bit-decomposed
    :func:`~deltalake_spark.operators.sketches._knuth32` (products
    stay under 2⁴⁹) and the SQL twin routes the product through
    HUGEINT, so no id ever silently wraps or raises mid-multiply.

    Plan shape: ONE pass over the detail rows — the replicate explode
    is pipelined into a hash aggregate keyed by replicate (map-side
    combine means the shuffle carries partitions × B rows, never
    rows × B); the full-data mean rides the same aggregate as the
    b = -1 replicate with multiplicity 1. A B-row window picks the
    order statistics. Output one row:
    ``(n_resamples, n_rows, mean_full, ci_lo, ci_hi)``.
    """
    b_count = int(n_resamples)
    if b_count < 4:
        raise ValueError("n_resamples must be >= 4")
    thresholds = _poisson1_thresholds()
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    rows = df.select(
        F.col(id_col).cast("long").alias("__id"),
        cents.alias("__c"),
        F.explode(
            F.sequence(F.lit(-1), F.lit(b_count - 1))).alias("__b"),
    )
    u = _knuth32(
        F.col("__id") * b_count + F.col("__b"), KMV_MULT, int(seed))
    w = F.when(F.col("__b") == -1, F.lit(1))
    for k, t in enumerate(thresholds):
        w = w.when(u < t, F.lit(k))
    w = w.otherwise(F.lit(len(thresholds)))
    per_b = (
        rows.select("__b", "__c", w.alias("__w"))
        .groupBy("__b")
        .agg(
            F.sum(F.col("__w") * F.col("__c")).alias("__swc"),
            F.sum("__w").alias("__sw"),
        )
        .select(
            "__b",
            (F.col("__swc").cast("double")
             / (F.lit(100.0) * F.col("__sw"))).alias("__mean"),
            "__sw",
        )
    )
    # rank replicates within the is-replicate partition (the b = -1
    # full-data row sits alone in the other partition) so one scalar
    # aggregate closes everything — no 1-row cross join in the plan
    is_rep = F.col("__b") >= 0
    wrank = Window.partitionBy(is_rep).orderBy("__mean", "__b")
    ranked = per_b.withColumn("__rn", F.row_number().over(wrank))
    lo_rank = (lo[0] * b_count + lo[1] - 1) // lo[1]
    hi_rank = (hi[0] * b_count + hi[1] - 1) // hi[1]
    return ranked.groupBy().agg(
        F.count(F.when(is_rep, 1)).alias("n_resamples"),
        F.min(F.when(~is_rep, F.col("__sw"))).alias("n_rows"),
        F.min(F.when(~is_rep, F.col("__mean"))).alias("mean_full"),
        F.min(F.when(is_rep & (F.col("__rn") == lo_rank),
                     F.col("__mean"))).alias("ci_lo"),
        F.min(F.when(is_rep & (F.col("__rn") == hi_rank),
                     F.col("__mean"))).alias("ci_hi"),
    )


def split_conformal_interval(
    df: DataFrame,
    *,
    id_col: str,
    x_col: str,
    y_col: str,
    alpha: tuple[int, int] = (1, 10),
    seed: int = 11,
) -> DataFrame:
    """SPLIT CONFORMAL prediction intervals (Papadopoulos et al. 2002;
    Lei et al. 2018) around a simple OLS fit — the
    distribution-free uncertainty wrapper modern ML pipelines attach
    to any point predictor: split the data, fit on train, take the
    ⌈(n_cal+1)(1−α)⌉-th smallest absolute calibration residual as the
    interval half-width ``q_hat``, and the marginal coverage guarantee
    P(|y−ŷ| ≤ q_hat) ≥ 1−α holds with NO distributional assumptions.
    The held-out test split empirically checks that guarantee.
    When ⌈(n_cal+1)(1−α)⌉ > n_cal (e.g. fewer than 9 calibration rows
    at α = 0.1) the guarantee requires ``q_hat = +∞``, so this raises
    instead of silently clamping to the largest residual — the same
    loud-refusal contract as the per-split row checks below.

    Fully deterministic end to end: the 1/2–1/4–1/4
    train/calibration/test split is the portable Knuth hash; the OLS
    fit uses EXACT integer moments in the cents domain (x as integer
    units, y as ``round(y·100)`` cents; the one decimal(38,0)
    product guards ``n·Sxy`` overflow) so slope/intercept are a fixed
    sequence of IEEE ops on exact integers; residuals are then
    identical doubles in any engine, making the nearest-rank
    ``q_hat`` (ties broken by id) and the coverage count exact
    replays. α is the rational ``alpha[0]/alpha[1]``.

    Plan/scale shape: one conditional-aggregate pass collects ALL
    split counts and train moments (5-scalar collect folded back as
    literals — the train_centroids contract); the calibration
    order statistic is one ranked window over the cal split (exact
    select-k; at extreme scale swap a two-pass quantile prune in
    front — documented, same contract as winsorized_stats); one
    aggregate over the test split closes coverage. Output one row:
    ``(n_train, n_cal, n_test, slope, intercept, q_hat_cents,
    n_covered, coverage)``.
    """
    a_num, a_den = int(alpha[0]), int(alpha[1])
    if not 0 < a_num < a_den:
        raise ValueError("alpha must be a fraction in (0, 1)")
    u = _knuth32(F.col(id_col), KMV_MULT, int(seed))
    x = F.round(F.col(x_col).cast("double")).cast("long")
    y_c = F.round(F.col(y_col).cast("double") * 100).cast("long")
    base = df.select(
        F.col(id_col).cast("long").alias("__id"),
        x.alias("__x"), y_c.alias("__y"),
        F.when(u < 2147483648, F.lit("train"))
        .when(u < 3221225472, F.lit("cal"))
        .otherwise(F.lit("test")).alias("__s"),
    )
    spark = df.sparkSession
    in_t = F.col("__s") == "train"
    m = base.groupBy().agg(
        F.count(F.when(in_t, 1)).alias("n_train"),
        F.count(F.when(F.col("__s") == "cal", 1)).alias("n_cal"),
        F.count(F.when(F.col("__s") == "test", 1)).alias("n_test"),
        F.sum(F.when(in_t, F.col("__x"))).alias("sx"),
        F.sum(F.when(in_t, F.col("__y"))).alias("sy"),
        F.sum(F.when(in_t, F.col("__x") * F.col("__x"))).alias("sxx"),
        F.sum(F.when(in_t, F.col("__x") * F.col("__y"))).alias("sxy"),
    ).collect()[0]
    n_tr, n_cal, n_te = m["n_train"], m["n_cal"], m["n_test"]
    if n_tr < 2 or n_cal < 1 or n_te < 1:
        raise ValueError("every split needs rows "
                         f"(train={n_tr}, cal={n_cal}, test={n_te})")
    # exact integers in Python (unbounded ints — the decimal guard);
    # the final divisions are the only floats, identical IEEE ops to
    # the SQL twin's HUGEINT->DOUBLE route
    num = n_tr * int(m["sxy"]) - int(m["sx"]) * int(m["sy"])
    den = n_tr * int(m["sxx"]) - int(m["sx"]) * int(m["sx"])
    if den == 0:
        raise ValueError("degenerate train split: var(x) == 0")
    slope = float(num) / float(den)
    intercept = (float(m["sy"]) - slope * float(m["sx"])) / float(n_tr)
    resid = F.abs(
        F.col("__y").cast("double")
        - (F.lit(intercept) + F.lit(slope)
           * F.col("__x").cast("double")))
    rank = ((n_cal + 1) * (a_den - a_num) + a_den - 1) // a_den
    if rank > n_cal:
        # ⌈(n_cal+1)(1−α)⌉ > n_cal means the guarantee needs
        # q_hat = +inf; clamping to the max residual would silently
        # drop the advertised marginal coverage — refuse instead.
        raise ValueError(
            "calibration split too small for alpha="
            f"{a_num}/{a_den}: split conformal needs "
            f"(n_cal+1)(1-alpha) <= n_cal (n_cal={n_cal}, so at "
            f"least {-(-a_den // a_num) - 1} calibration rows per the "
            "ceil rule); lower alpha or provide more data")
    wr = Window.orderBy("__r", "__id")
    q_hat = (
        base.filter(F.col("__s") == "cal")
        .select("__id", resid.alias("__r"))
        .withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == rank)
        .collect()[0]["__r"]
    )
    cov = base.filter(F.col("__s") == "test").groupBy().agg(
        F.sum((resid <= q_hat).cast("long")).alias("n_covered"))
    return cov.select(
        F.lit(n_tr).cast("long").alias("n_train"),
        F.lit(n_cal).cast("long").alias("n_cal"),
        F.lit(n_te).cast("long").alias("n_test"),
        F.lit(slope).alias("slope"),
        F.lit(intercept).alias("intercept"),
        F.lit(float(q_hat)).alias("q_hat_cents"),
        F.col("n_covered"),
        (F.col("n_covered").cast("double") / F.lit(float(n_te)))
        .alias("coverage"),
    )


def normal_sf_expr(z: "F.Column") -> "F.Column":
    """Standard-normal survival function P(Z > z) for z >= 0, via the
    Abramowitz & Stegun 7.1.26 erf approximation (|error| < 1.5e-7 —
    plenty for p-value screening). A fixed sequence of IEEE ops
    (one division, a 5-term Horner polynomial, one exp), so any SQL
    engine replays it bit-for-bit — the reason to use this instead of
    an engine-native erf neither Spark nor DuckDB exposes."""
    x = z / F.lit(1.4142135623730951)  # z / sqrt(2)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = t * (
        F.lit(0.254829592)
        + t * (
            F.lit(-0.284496736)
            + t * (
                F.lit(1.421413741)
                + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
            )
        )
    )
    erf = F.lit(1.0) - poly * F.exp(-x * x)
    return (F.lit(1.0) - erf) / F.lit(2.0)


def bh_fdr_ztests(
    df: DataFrame,
    *,
    group_col: str,
    success_col: str,
    alpha: tuple[int, int] = (1, 20),
) -> DataFrame:
    """Per-group two-sided proportion z-tests against the pooled rate,
    with BENJAMINI–HOCHBERG false-discovery-rate correction (Benjamini
    & Hochberg 1995) — the standard answer to "we ran one test per
    segment, which segments are REALLY different?" that naive
    per-test α gets wrong at any realistic segment count.

    Per group g: ``z = (p_g − p0) / sqrt(p0(1−p0)/n_g)`` with the
    pooled ``p0``; two-sided ``p = 2·Φ̄(|z|)`` via
    :func:`normal_sf_expr`. BH step-up: sort the m p-values ascending,
    find the LARGEST rank i with ``p_(i) ≤ i·α/m`` (as pure integer
    cross-multiplication ``p·m·a_den ≤ i·a_num`` on the float p —
    one comparison, no division), and reject hypotheses 1..i.

    Determinism: counts are exact integers; p0, z, and p are fixed
    IEEE sequences on those integers; the BH rank is a window over the
    m-row group frame (ties broken by group key); the rejection
    cutoff propagates as a full-frame window max. Everything after
    the one detail-row aggregate is m-row-frame work. A degenerate
    pooled rate (zero successes or zero failures overall) pins
    z = 0 / p ≈ 1 / no rejections explicitly — the engines' native
    0/0 behaviors differ (NULL vs NaN), so the edge is defined, not
    inherited.

    Output per group: ``(group, n, successes, rate, z, p_value,
    p_rank, bh_cutoff_rank, rejected)``.
    """
    a_num, a_den = int(alpha[0]), int(alpha[1])
    if not 0 < a_num < a_den:
        raise ValueError("alpha must be a fraction in (0, 1)")
    s = F.col(success_col).cast("long")
    cells = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(s).alias("k"),
    )
    wall = Window.partitionBy()
    cells = cells.withColumn(
        "__nt", F.sum("n").over(wall)
    ).withColumn("__kt", F.sum("k").over(wall))
    p0 = F.col("__kt").cast("double") / F.col("__nt").cast("double")
    rate = F.col("k").cast("double") / F.col("n").cast("double")
    # degenerate pooled rate (all successes or all failures): every
    # group's rate equals p0 exactly, so there is no evidence of
    # deviation — but the raw expression is 0/0, where Spark yields
    # NULL and DuckDB (ieee_floating_point_ops) yields NaN. Pin
    # z = 0 / p = 1 / no rejections explicitly so both engines agree
    # by construction; the SQL twin carries the same CASE.
    degenerate = (F.col("__kt") == 0) | (F.col("__kt") == F.col("__nt"))
    z = F.when(degenerate, F.lit(0.0)).otherwise(
        (rate - p0) / F.sqrt(
            p0 * (F.lit(1.0) - p0) / F.col("n").cast("double")))
    scored = cells.select(
        "g", "n", "k",
        rate.alias("__rate"),
        z.alias("__z"),
        (F.lit(2.0) * normal_sf_expr(F.abs(z))).alias("__p"),
    )
    wrank = Window.orderBy("__p", "g")
    m = F.count(F.lit(1)).over(wall)
    ranked = scored.withColumn(
        "__i", F.row_number().over(wrank)
    ).withColumn("__m", m)
    # BH step-up: largest i with p_(i)·m·a_den <= i·a_num
    hit = F.when(
        F.col("__p") * F.col("__m") * a_den
        <= F.col("__i") * a_num, F.col("__i"))
    cutoff = F.coalesce(F.max(hit).over(wall), F.lit(0))
    return (
        ranked.withColumn("__cut", cutoff)
        .select(
            F.col("g").alias(group_col),
            "n",
            F.col("k").alias("successes"),
            F.round("__rate", 6).alias("rate"),
            F.round("__z", 6).alias("z"),
            F.round("__p", 8).alias("p_value"),
            F.col("__i").cast("long").alias("p_rank"),
            F.col("__cut").cast("long").alias("bh_cutoff_rank"),
            (F.col("__i") <= F.col("__cut")).alias("rejected"),
        )
    )


def cmh_test(
    df: DataFrame,
    *,
    stratum_col: str,
    exposure_col: str,
    outcome_col: str,
) -> DataFrame:
    """Cochran–Mantel–Haenszel test of exposure→outcome association
    ACROSS strata (Mantel & Haenszel 1959) — the Simpson's-paradox-
    aware A/B readout: a pooled 2×2 test can reverse sign when strata
    (cohort, region, year) differ in both mix and base rate; CMH
    combines the per-stratum evidence instead.

    Per stratum k with 2×2 cells (a=exposed·success, b=exposed·fail,
    c=unexposed·success, d=unexposed·fail, n=a+b+c+d):
    ``E_k = (a+b)(a+c)/n``, ``V_k = (a+b)(c+d)(a+c)(b+d)/(n²(n−1))``,
    ``χ² = (|Σa − ΣE| − 1/2)² / ΣV`` (continuity-corrected), plus the
    Mantel–Haenszel common odds ratio ``Σ(a·d/n) / Σ(b·c/n)``.

    Determinism: all cells are exact integers from ONE conditional
    aggregate per stratum; E_k/V_k/odds terms are fixed IEEE
    sequences on those integers summed over the STRATA FRAME (tens of
    rows — float order is pinned by a sorted in-plan fold, not a
    shuffle-ordered SUM). Single detail pass; everything downstream is
    strata-frame-sized. Output one row:
    ``(n_strata, sum_a, sum_e, sum_v, chi2_cmh, or_mh)``.

    Degenerate strata (n < 2, or an empty margin making V_k = 0)
    contribute zero evidence and are EXCLUDED — the standard rule.
    """
    e = F.col(exposure_col).cast("boolean")
    o = F.col(outcome_col).cast("boolean")
    cells = df.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.count(F.when(e & o, 1)).alias("a"),
        F.count(F.when(e & ~o, 1)).alias("b"),
        F.count(F.when(~e & o, 1)).alias("c"),
        F.count(F.when(~e & ~o, 1)).alias("d"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d"))
    r1 = (F.col("a") + F.col("b")).cast("double")
    r2 = (F.col("c") + F.col("d")).cast("double")
    c1 = (F.col("a") + F.col("c")).cast("double")
    c2 = (F.col("b") + F.col("d")).cast("double")
    nd = n.cast("double")
    ek = r1 * c1 / nd
    vk = r1 * r2 * c1 * c2 / (nd * nd * (nd - 1))
    ok_row = (n >= 2) & (r1 > 0) & (r2 > 0) & (c1 > 0) & (c2 > 0)
    per = cells.where(ok_row).select(
        "__s", "a",
        ek.alias("__e"), vk.alias("__v"),
        (F.col("a").cast("double") * F.col("d") / nd).alias("__ad"),
        (F.col("b").cast("double") * F.col("c") / nd).alias("__bc"),
    )
    # strata-frame float sums folded in SORTED stratum order so both
    # engines add in the same sequence (a shuffle-ordered SUM is not
    # replayable; the frame is tens of rows, the fold is free)
    packed = per.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct(
                F.col("__s").alias("s"), F.col("a").alias("a"),
                F.col("__e").alias("e"), F.col("__v").alias("v"),
                F.col("__ad").alias("ad"), F.col("__bc").alias("bc"),
            ))
        ).alias("__rows"))

    def fold(field: str) -> "F.Column":
        return F.aggregate(
            F.col("__rows"), F.lit(0.0),
            lambda acc, r: acc + r[field].cast("double"))

    sum_a = fold("a")
    sum_e = fold("e")
    sum_v = fold("v")
    chi2 = (
        (F.abs(sum_a - sum_e) - F.lit(0.5))
        * (F.abs(sum_a - sum_e) - F.lit(0.5)) / sum_v
    )
    return packed.select(
        F.size("__rows").cast("long").alias("n_strata"),
        sum_a.cast("long").alias("sum_a"),
        sum_e.alias("sum_e"),
        sum_v.alias("sum_v"),
        chi2.alias("chi2_cmh"),
        (fold("ad") / fold("bc")).alias("or_mh"),
    )


def lift_deciles(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Lift / gains table — the standard business-facing classifier
    eval (companion to :func:`roc_auc`): rank the population by score
    descending, cut into ``n_buckets`` equal-count buckets, and report
    each bucket's positive rate, cumulative capture ("the top 20% of
    scores catches X% of all positives"), and lift over the base rate.

    Exactness: bucket assignment is the pure integer
    ``((rank−1)·n_buckets) div N`` over a total order (score DESC,
    id ASC — the id tiebreak makes the cut deterministic under score
    ties); per-bucket counts are exact integers; rate/capture/lift are
    single IEEE divisions of those integers (lift as the exact
    cross-ratio ``(k·N)/(n·K)``).

    Scale note: the global rank is ONE single-partition window over
    (score, id, label) triples — fine to ~10⁷ rows; beyond that,
    quantize the score and rank the quantile cells instead (the
    ks_two_sample grid recipe). Output per bucket:
    ``(bucket, n, positives, rate, cum_positives, capture, lift)``.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    w = Window.orderBy(F.col("__sc").desc(), F.col("__id"))
    wall = Window.partitionBy()
    base = df.select(
        F.col(score_col).cast("double").alias("__sc"),
        F.col(label_col).cast("long").alias("__y"),
        F.col(id_col).cast("long").alias("__id"),
    )
    ranked = base.withColumn("__rn", F.row_number().over(w)) \
        .withColumn("__n", F.count(F.lit(1)).over(wall))
    bucket = F.expr(f"((__rn - 1) * {int(n_buckets)}) div __n")
    cells = (
        ranked.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("positives"),
        )
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0)
    tot_n = F.sum("n").over(wall)
    tot_k = F.sum("positives").over(wall)
    cum_k = F.sum("positives").over(wcum)
    return cells.select(
        "bucket", "n", "positives",
        (F.col("positives").cast("double") / F.col("n"))
        .alias("rate"),
        cum_k.alias("cum_positives"),
        (cum_k.cast("double") / tot_k).alias("capture"),
        ((F.col("positives") * tot_n).cast("double")
         / (F.col("n") * tot_k)).alias("lift"),
    ).orderBy("bucket")


def best_gini_split(
    df: DataFrame,
    *,
    label_col: str,
    feature_cols: list[str],
    score_scale: int = 10 ** 12,
    max_thresholds: int = 100_000,
) -> DataFrame:
    """Exact best univariate split per feature — the CART decision-
    stump step: for each candidate threshold v (every distinct feature
    value), split ``x <= v`` / ``x > v`` and score the weighted Gini
    purity of the binary label; report each feature's argmax.

    All in EXACT integer arithmetic: with left/right positive counts
    ``pL, pR`` and sizes ``nL, nR``, minimizing weighted Gini impurity
    is maximizing

        score(v) = (pL² + (nL−pL)²)/nL + (pR² + (nR−pR)²)/nR

    The reported ``score_units`` is the exact floor of ``score_scale ·
    score(v)`` over the common denominator ``nL·nR``, computed
    remainder-first in decimal(38,0) (the same exact-multiple division
    trick as ``sse_changepoint`` — no rounding-mode ambiguity, HUGEINT
    ``//`` replays it bit-for-bit). Argmax by ``(score_units, −v)``:
    deterministic smallest-threshold tie-break.

    Scale shape: per feature, ONE narrow aggregate reduces N rows to
    the distinct-value frame (count, positives per value); prefix-sum
    windows over that frame build every candidate split; one argmax
    aggregate. The detail table is scanned once per feature, nothing
    else scales with N. The global-sort window runs over the DISTINCT
    VALUE frame only — ENFORCED: a feature whose distinct-value count
    exceeds ``max_thresholds`` raises at runtime (quantize/bucket
    continuous features first; the "quantize first" contract is a
    guard, not an assumption). Numeric domain: the scored numerator is
    ``score_scale·((pL²+qL²)·nR + (pR²+qR²)·nL)`` ~ ``score_scale·n³``,
    which must stay inside decimal(38,0) — n up to ~3e8 rows at the
    default scale (reduce ``score_scale`` to widen); an overflow (null
    score) raises at runtime instead of silently skewing the argmax.

    Output: one row per feature —
    ``(feature, n, n_pos, threshold, score_units, n_left, pos_left)``.
    """
    if score_scale < 1:
        raise ValueError("score_scale must be >= 1")
    if max_thresholds < 1:
        raise ValueError("max_thresholds must be >= 1")
    y = F.col(label_col).cast("long")
    outs = []
    for feat in feature_cols:
        v = F.col(feat).cast("double")
        cells = df.groupBy(v.alias("__v")).agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum(y).alias("__p"))
        w = Window.orderBy("__v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        g = Window.partitionBy()
        cum = (
            cells
            .withColumn("__nL", F.sum("__c").over(w))
            .withColumn("__pL", F.sum("__p").over(w))
            .withColumn("__n", F.sum("__c").over(g))
            .withColumn("__pT", F.sum("__p").over(g))
            # cardinality of the distinct-value frame (= the window
            # frame), for the guard folded into the score below
            .withColumn("__nd", F.count(F.lit(1)).over(g))
            .filter(F.col("__nL") < F.col("__n"))  # right side non-empty
        )
        dec = "decimal(38,0)"
        nL = F.col("__nL").cast(dec)
        pL = F.col("__pL").cast(dec)
        nR = (F.col("__n") - F.col("__nL")).cast(dec)
        pR = (F.col("__pT") - F.col("__pL")).cast(dec)
        qL = nL - pL
        qR = nR - pR
        a = F.lit(int(score_scale)).cast(dec) * (
            (pL * pL + qL * qL) * nR + (pR * pR + qR * qR) * nL)
        den = nL * nR
        raw = (a - a % den) / den
        # guards live INSIDE the score expression (a free-standing guard
        # column would be pruned): (1) cardinality — refuse unquantized
        # high-cardinality features instead of crawling and mis-ranking;
        # (2) decimal(38,0) overflow — a null numerator would otherwise
        # silently vanish from the argmax (non-ANSI) instead of failing
        score = (
            F.when(
                F.col("__nd") > F.lit(int(max_thresholds)),
                F.raise_error(F.concat(
                    F.lit(f"best_gini_split: feature {feat!r} has "),
                    F.col("__nd").cast("string"),
                    F.lit(f" distinct values > max_thresholds="
                          f"{int(max_thresholds)}; quantize/bucket "
                          f"it first"))).cast(dec),
            )
            .when(
                raw.isNull(),
                F.raise_error(F.lit(
                    "best_gini_split: null score — decimal(38,0) "
                    "overflow (score_scale*n^3 domain: n up to ~3e8 at "
                    "the default scale; reduce score_scale) or null "
                    "labels")).cast(dec),
            )
            .otherwise(raw)
            .cast("long")
        )
        scored = cum.withColumn("__score", score)
        best = scored.groupBy().agg(
            F.first("__n").alias("__ntot"),
            F.first("__pT").alias("__ptot"),
            F.max(F.struct(
                F.col("__score"),
                (-F.col("__v")).alias("__negv"),
                F.col("__v"), F.col("__nL"), F.col("__pL"))).alias("__b"),
        )
        outs.append(best.select(
            F.lit(feat).alias("feature"),
            F.col("__ntot").cast("long").alias("n"),
            F.col("__ptot").cast("long").alias("n_pos"),
            F.col("__b.__v").alias("threshold"),
            F.col("__b.__score").alias("score_units"),
            F.col("__b.__nL").cast("long").alias("n_left"),
            F.col("__b.__pL").cast("long").alias("pos_left"),
        ))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def quantile_normalize(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Quantile normalization across EQUAL-LENGTH groups (the
    bioinformatics/batch-harmonization classic): rank each group's
    values, replace every value with the MEAN of the values holding
    the same rank across all groups — afterwards every group has an
    identical distribution while preserving each group's order.

    Designed for equal group sizes; with unequal groups the rank-mean
    join still aligns but deep ranks average fewer groups — the
    ``n_groups`` output column exposes exactly that, so callers can
    assert it is constant (or re-grain first). ``order_col`` breaks
    rank ties deterministically.

    The rank mean is ``sum_at_rank / n_at_rank`` — exact integer sum,
    ONE IEEE division — so the twin replays exactly.

    Scale shape: one group-keyed rank window over the detail, one
    KB-scale rank aggregate, one broadcast join back on rank. Output:
    ``(group, order, value, rank, qnorm, n_groups)``.
    """
    x = F.col(value_col).cast("long")
    w = Window.partitionBy(group_col).orderBy("__x", order_col)
    ranked = df.select(
        F.col(group_col), F.col(order_col), x.alias("__x")
    ).withColumn("__rk", F.row_number().over(w))
    at_rank = ranked.groupBy("__rk").agg(
        F.sum("__x").alias("__s"),
        F.count(F.lit(1)).alias("__m"))
    return (
        ranked.join(F.broadcast(at_rank), "__rk")
        .select(
            F.col(group_col),
            F.col(order_col),
            F.col("__x").alias(value_col),
            F.col("__rk").cast("long").alias("rank"),
            (F.col("__s").cast("double") / F.col("__m").cast("double"))
            .alias("qnorm"),
            F.col("__m").cast("long").alias("n_groups"),
        )
    )


def cuped_lift(
    df: DataFrame,
    *,
    arm_col: str,
    pre_col: str,
    post_col: str,
    control_value,
) -> DataFrame:
    """CUPED-adjusted A/B lift (Deng et al. 2013) — the industry-
    standard variance-reduction for experiment readouts: regress the
    post-period metric on its pre-period covariate,
    ``theta = cov(pre, post)/var(pre)`` pooled across arms, adjust
    ``y' = y − theta·(x − mean(x))``, then compare arm means of the
    adjusted metric. Typically cuts required sample size 30-50% when
    pre/post correlate.

    Determinism contract: moments use SQL-standard aggregates
    (``covar_pop``/``var_pop``/``avg``) whose merge order is
    partition-dependent at the last ulps — gate queries round to the
    same precision as the other moment-based twins (``ols_*``); the
    adjustment and lift are a fixed arithmetic chain over the 2-arm
    moment frame, so no per-row adjusted values ever materialize.

    Output: one row — ``(theta, n_t, n_c, mean_t_adj, mean_c_adj,
    lift_adj, lift_raw, var_reduction_pct)``.
    """
    x = F.col(pre_col).cast("double")
    y = F.col(post_col).cast("double")
    # pooled moments: ONE 3-scalar driver collect compiled back as
    # literals (the corpus-stats precedent) — a one-row broadcast
    # crossJoin would plan as BroadcastNestedLoopJoin, which the
    # repo-wide plan budgets forbid. The same collect validates the
    # 2-arm contract: the treatment-side F.first aggregates below
    # would silently mix arms on >2-arm input (partition-order pick).
    prow = df.groupBy().agg(
        F.count_distinct(F.col(arm_col)).alias("n_arms"),
        F.sum(F.when(F.col(arm_col) == F.lit(control_value), 1)
              .otherwise(0)).alias("n_ctrl"),
        F.covar_pop(x, y).alias("cxy"),
        F.var_pop(x).alias("vx"),
        F.avg(x).alias("mx")).collect()[0]
    if prow["n_arms"] != 2 or not prow["n_ctrl"]:
        raise ValueError(
            f"cuped_lift is a 2-arm readout: need exactly one control "
            f"({control_value!r}) and one treatment arm, got "
            f"{prow['n_arms']} distinct arm value(s) with "
            f"{prow['n_ctrl']} control row(s)")
    theta_v = (prow["cxy"] / prow["vx"]) if (
        prow["vx"] is not None and prow["vx"] > 0) else 0.0
    j = df.groupBy(arm_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg(y).alias("__my"),
        F.avg(x).alias("__max"),
        F.var_pop(y).alias("__vy"),
        F.covar_pop(x, y).alias("__cxy_a"),
        F.var_pop(x).alias("__vx_a"))
    theta = F.lit(float(theta_v))
    # adjusted arm mean: mean(y) - theta*(mean(x) - pooled mean(x))
    adj = F.col("__my") - theta * (F.col("__max") - F.lit(prow["mx"]))
    # per-arm adjusted variance: var(y) - 2 theta cov + theta^2 var(x)
    vadj = (F.col("__vy") - 2 * theta * F.col("__cxy_a")
            + theta * theta * F.col("__vx_a"))
    is_c = F.col(arm_col) == F.lit(control_value)
    enriched = j.select(
        is_c.alias("__isc"), F.col("__n"), F.col("__my"),
        adj.alias("__adj"), vadj.alias("__vadj"), F.col("__vy"),
        theta.alias("__theta"))
    out = enriched.groupBy().agg(
        F.first(F.col("__theta")).alias("theta"),
        F.sum(F.when(~F.col("__isc"), F.col("__n"))).alias("n_t"),
        F.sum(F.when(F.col("__isc"), F.col("__n"))).alias("n_c"),
        F.first(F.when(~F.col("__isc"), F.col("__adj")), True)
        .alias("mean_t_adj"),
        F.first(F.when(F.col("__isc"), F.col("__adj")), True)
        .alias("mean_c_adj"),
        F.first(F.when(~F.col("__isc"), F.col("__my")), True)
        .alias("__myt"),
        F.first(F.when(F.col("__isc"), F.col("__my")), True)
        .alias("__myc"),
        F.first(F.when(~F.col("__isc"), F.col("__vadj")), True)
        .alias("__vat"),
        F.first(F.when(~F.col("__isc"), F.col("__vy")), True)
        .alias("__vyt"),
    )
    return out.select(
        "theta", "n_t", "n_c", "mean_t_adj", "mean_c_adj",
        (F.col("mean_t_adj") - F.col("mean_c_adj")).alias("lift_adj"),
        (F.col("__myt") - F.col("__myc")).alias("lift_raw"),
        F.when(F.col("__vyt") > 0,
               F.lit(100.0) * (F.lit(1.0)
                               - F.col("__vat") / F.col("__vyt")))
        .alias("var_reduction_pct"),
    )


def weighted_percentile(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    quantiles: list[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
) -> DataFrame:
    """EXACT weighted percentiles per group (inverted-CDF definition):
    the smallest value whose cumulative weight reaches ``q`` of the
    group's total — the estimator for "the price half the QUANTITY
    trades below" and every other mass-weighted cut, where unweighted
    percentile silently answers a different question.

    Quantiles are RATIONALS ``(num, den)``; the crossing test is the
    pure integer ``den·cumw >= num·total`` — no float thresholds, no
    interpolation ambiguity across engines.

    Scale shape: one hash agg reduces N rows to (group, value) cells
    with integer weight sums; one cumulative window over the cell
    frame (bounded by distinct values per group — quantize continuous
    values first if cardinality approaches N); one conditional-min
    aggregate emits every quantile. Output:
    ``(group..., q_num, q_den, value, total_weight)``.
    """
    for num, den in quantiles:
        if not 0 < num <= den:
            raise ValueError("quantiles must be fractions in (0, 1]")
    v = F.col(value_col)
    w = F.col(weight_col).cast("long")
    cells = df.groupBy(*group_cols, v.alias("__v")).agg(
        F.sum(w).alias("__w"))
    wcum = Window.partitionBy(*group_cols).orderBy("__v") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy(*group_cols)
    cum = cells.withColumn("__cw", F.sum("__w").over(wcum)) \
        .withColumn("__tw", F.sum("__w").over(wall))
    aggs = []
    for num, den in quantiles:
        hit = den * F.col("__cw") >= num * F.col("__tw")
        aggs.append(F.min(F.when(hit, F.col("__v")))
                    .alias(f"__q_{num}_{den}"))
    row = cum.groupBy(*group_cols).agg(
        F.first("__tw").alias("__t"), *aggs)
    cellsx = F.explode(F.array(*[
        F.struct(F.lit(num).cast("long").alias("q_num"),
                 F.lit(den).cast("long").alias("q_den"),
                 F.col(f"__q_{num}_{den}").alias("value"))
        for num, den in quantiles
    ])).alias("__e")
    return row.select(*group_cols, F.col("__t"), cellsx).select(
        *group_cols,
        F.col("__e.q_num").alias("q_num"),
        F.col("__e.q_den").alias("q_den"),
        F.col("__e.value").alias("value"),
        F.col("__t").alias("total_weight"),
    )
