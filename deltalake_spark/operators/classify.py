"""Model-based corpus classification: Naive Bayes + DSIR importance weights.

Large-scale training-data pipelines gate documents with cheap linear
text classifiers (the fastText quality/language-ID pattern) and select
domain-relevant data with importance weights (DSIR: Data Selection via
Importance Resampling, Xie et al. 2023). The reference engine has no
model-based operators at all — its closest analog is the stopword
heuristic this repo ships in ``operators/text.py`` — so these are
north-star additions, built Spark-first:

- **Training is two narrow aggregations** (class priors + per-class
  token counts), not an iterative solver: multinomial Naive Bayes with
  add-one smoothing is closed-form, so the "fit" is exactly one shuffle
  on (label, token) and produces a small model table. Deterministic,
  partitioning-invariant, and value-level oracle-able in ANSI SQL —
  properties an SGD fit cannot offer the correctness gate.
- **Scoring is a broadcast join**, never a UDF: the model (V×L rows,
  MBs even for web-scale vocabularies after ``min_count`` pruning)
  broadcasts to every executor; per-document log-likelihood sums are
  one aggregation on doc_id. At 100 TB the corpus-side cost is a single
  explode + one shuffle keyed by document — the same shape as the
  token-count statistics the pipeline computes anyway.
- **Scores are rounded before argmax** so float-summation order (which
  Spark does not guarantee) can never flip a prediction between runs or
  against the DuckDB oracle: ties at 6 decimal places break by label.

DSIR follows the same discipline: unigram LMs for the target slice and
the raw corpus are two aggregations; the per-document weight
``mean(log p_target(tok) - log p_raw(tok))`` is one broadcast join and
one doc-keyed aggregation. Hashed-ngram features (the paper's trick to
bound V) drop in by replacing the token column with
``pmod(hash(token), B)`` — at fixture scale raw unigrams keep the
DuckDB oracle exact, and the hashed variant changes only the join key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokenize_ascii",
    "NaiveBayesModel",
    "train_naive_bayes",
    "score_naive_bayes",
    "dsir_importance_weights",
]


def tokenize_ascii(col: F.Column) -> F.Column:
    """Lowercase ASCII-word tokens as an array column (JVM-side).

    Mirrors the oracle's ``regexp_split_to_array(lower(x), '[^a-z]+')``
    with empties filtered, so Spark and DuckDB tokenize identically.
    """
    return F.filter(
        F.split(F.lower(col), "[^a-z]+"), lambda t: t != F.lit("")
    )


@dataclass(frozen=True)
class NaiveBayesModel:
    """Closed-form multinomial NB model as two small DataFrames.

    ``priors``:      label, log_prior (ln of doc-count fraction)
    ``likelihoods``: label, token, c (token count in that class)
    ``totals``:      label, t (total token occurrences in that class)
    ``vocab_size``:  |V| across all classes (add-one denominator).

    All components are aggregation outputs sized by V×L — broadcastable;
    nothing here scales with corpus row count.
    """

    priors: DataFrame
    likelihoods: DataFrame
    totals: DataFrame
    vocab_size: int


def train_naive_bayes(
    df: DataFrame,
    *,
    text_col: str,
    label_col: str,
    min_count: int = 1,
) -> NaiveBayesModel:
    """Fit multinomial NB with add-one smoothing in two aggregations.

    ``min_count`` prunes rare (label, token) cells from the model to
    bound its size on web-scale vocabularies; pruned cells score as
    unseen (count 0 + smoothing), keeping the formula uniform. The
    default 1 keeps the model exact for the oracle twin.
    """
    n_docs = df.count()
    priors = (
        df.groupBy(F.col(label_col).alias("label"))
        .agg(F.log(F.count("*") / F.lit(float(n_docs))).alias("log_prior"))
    )
    toks = df.select(
        F.col(label_col).alias("label"),
        F.explode(tokenize_ascii(F.col(text_col))).alias("token"),
    )
    likelihoods = (
        toks.groupBy("label", "token")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
    )
    totals = toks.groupBy("label").agg(F.count("*").alias("t"))
    vocab_size = likelihoods.select("token").distinct().count()
    return NaiveBayesModel(priors, likelihoods, totals, vocab_size)


def _nb_scored(
    df: DataFrame,
    model: "NaiveBayesModel",
    *,
    id_col: str,
    text_col: str,
    keep_cols: list[str],
    round_digits: int,
) -> DataFrame:
    """Shared (doc, keep_cols, label, score) frame under
    :func:`score_naive_bayes` (argmax) and
    :func:`score_naive_bayes_margin` (top-2 confidence)."""
    # explode_outer keeps empty-token docs as a single null-token row;
    # each doc token occurrence × each label, then model left-join:
    # unseen (label, token) cells coalesce to c=0 and get pure smoothing
    toks = df.select(
        F.col(id_col).alias("__doc"),
        *[F.col(c) for c in keep_cols],
        F.explode_outer(tokenize_ascii(F.col(text_col))).alias("token"),
    )
    labeled = toks.crossJoin(
        F.broadcast(model.priors.select("label", "log_prior"))
    )
    joined = labeled.join(
        F.broadcast(model.likelihoods), ["label", "token"], "left"
    ).join(F.broadcast(model.totals), ["label"], "left")
    v = float(model.vocab_size)
    tok_ll = F.when(F.col("token").isNull(), F.lit(0.0)).otherwise(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
            / (F.col("t") + F.lit(v))
        )
    )
    scored = joined.groupBy(
        "__doc", *keep_cols, "label", "log_prior"
    ).agg(F.sum(tok_ll).alias("__ll"))
    return scored.withColumn(
        "score", F.round(F.col("log_prior") + F.col("__ll"), round_digits)
    )


def score_naive_bayes_margin(
    df: DataFrame,
    model: "NaiveBayesModel",
    *,
    id_col: str,
    text_col: str,
    label_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document top-2 NB scores → the CONFIDENCE MARGIN, the
    input every classifier-thresholding decision in a curation
    pipeline actually needs (keep/drop/route-to-human by confidence),
    and what a margin-calibration curve is built from. The winning
    rounded log-posterior alone (:func:`score_naive_bayes`) can't
    rank confidence — it scales with document length; the top-1/top-2
    GAP is the standard length-robust proxy.

    Returns one row per doc: ``predicted``, ``correct`` (vs
    ``label_col``), and ``margin_micro`` — ``round((s1 − s2)·1e6)``
    as BIGINT, so downstream bin/aggregate arithmetic is exact
    integers (no float summation order). Docs are dropped only if the
    model has a single class (no runner-up exists).
    """
    scored = _nb_scored(df, model, id_col=id_col, text_col=text_col,
                        keep_cols=[label_col], round_digits=round_digits)
    w = Window.partitionBy("__doc").orderBy(
        F.desc("score"), F.asc("label"))
    top2 = scored.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= 2)
    return (
        top2.groupBy("__doc", label_col)
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("label")))
            .alias("predicted"),
            F.max(F.when(F.col("__rn") == 1, F.col("score")))
            .alias("__s1"),
            F.max(F.when(F.col("__rn") == 2, F.col("score")))
            .alias("__s2"),
        )
        .filter(F.col("__s2").isNotNull())
        .select(
            F.col("__doc").alias(id_col),
            F.col(label_col),
            "predicted",
            (F.col("predicted") == F.col(label_col)).alias("correct"),
            F.expr(f"cast(round((__s1 - __s2) * {10**6}D) as bigint)")
            .alias("margin_micro"),
        )
    )


def score_naive_bayes(
    df: DataFrame,
    model: NaiveBayesModel,
    *,
    id_col: str,
    text_col: str,
    keep_cols: list[str] | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Score documents against every class; pick the argmax class.

    Output: one row per input document with ``predicted`` (argmax
    label, ties broken by label ascending) and ``score`` (the winning
    rounded log-posterior) plus ``keep_cols`` carried through.

    Plan shape: explode tokens → broadcast-join the V×L model → one
    aggregation keyed by (doc, label) → one doc-keyed ranking window.
    No Python in the hot path; every arithmetic step (ln of a single
    division, then a sum rounded to ``round_digits``) is replicated
    exactly by the SQL oracle, and the rounding makes argmax immune to
    summation-order float drift.

    Documents that tokenize to ZERO tokens (numeric-only, non-Latin
    script under the ASCII tokenizer) are still scored — by class prior
    alone — via ``explode_outer``; a plain explode would silently drop
    them from the output, which for a language/quality gate means
    silently discarding every such document.
    """
    keep_cols = keep_cols or []
    scored = _nb_scored(df, model, id_col=id_col, text_col=text_col,
                        keep_cols=keep_cols, round_digits=round_digits)
    w = Window.partitionBy("__doc").orderBy(
        F.desc("score"), F.asc("label")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__doc").alias(id_col),
            *keep_cols,
            F.col("label").alias("predicted"),
            "score",
        )
    )


def dsir_importance_weights(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    target_filter: F.Column,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document DSIR importance weight vs a target slice.

    weight(doc) = mean over tokens of
    ``ln p_target(tok) - ln p_raw(tok)`` with add-one smoothing over
    the raw vocabulary (so target-unseen tokens are defined). Documents
    resembling the target slice score high; resampling by these weights
    shifts the corpus mixture toward the target domain (DSIR).

    Plan shape: ONE token-keyed aggregation produces both unigram LMs
    (c_raw and c_tgt side by side); the smoothing scalars come from
    that vocabulary-sized frame, not a corpus rescan. Scoring is the
    broadcast log-ratio join + one doc-keyed aggregation — two corpus
    passes total (counts + scoring). Nothing driver-side beyond three
    scalars, nothing all-pairs. The weight is rounded so the
    value-level oracle is immune to summation order.

    Zero-token documents get a neutral weight of 0.0 (explode_outer
    keeps them; a plain explode would drop them from the output).
    """
    toks = df.select(
        F.col(id_col).alias("__doc"),
        target_filter.alias("__is_target"),
        F.explode_outer(tokenize_ascii(F.col(text_col))).alias("token"),
    )
    real = toks.where(F.col("token").isNotNull())
    # both LMs in one pass over the token stream
    counts = real.groupBy("token").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.col("__is_target").cast("long")).alias("c_tgt"),
    )
    # smoothing denominators: raw vocabulary size for both LMs so the
    # ratio is well-defined on target-unseen tokens. Derived from the
    # vocabulary-sized counts frame — no extra corpus scan.
    stats = counts.agg(
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_tgt").alias("t_tgt"),
        F.count(F.lit(1)).alias("v"),
    ).first()
    t_raw, t_tgt, v = stats["t_raw"], stats["t_tgt"], stats["v"]
    lm = counts.select(
        "token",
        (
            F.log((F.col("c_tgt") + F.lit(1.0)) / F.lit(float(t_tgt + v)))
            - F.log((F.col("c_raw") + F.lit(1.0)) / F.lit(float(t_raw + v)))
        ).alias("log_ratio"),
    )
    return (
        toks.join(F.broadcast(lm), "token", "left")
        .groupBy("__doc")
        .agg(
            F.coalesce(
                F.round(F.avg("log_ratio"), round_digits), F.lit(0.0)
            ).alias("weight")
        )
        .select(F.col("__doc").alias(id_col), "weight")
    )
