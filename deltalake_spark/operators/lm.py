"""N-gram language-model scoring for perplexity-style quality
filtering — the CCNet/LLaMA-pipeline stage that ranks documents by how
"natural" their token stream is under a reference LM and drops the
tails. Engine-native extension (the reference has no text scoring).

The model here is a bigram LM with add-one smoothing over the corpus
(or any reference corpus passed in), deliberately tiny and exactly
reproducible in SQL so the gate can check values; a production
deployment swaps the model builder for a KenLM-style external model
served through the same broadcast-join shape.

Scale shapes:
* The model is CAPPED at ``max_bigrams`` rows chosen deterministically
  (count desc, then lexicographic) — bounded broadcast metadata no
  matter the corpus size. Uncapped bigram vocabularies grow with the
  corpus and would turn the scoring join into a shuffle of the whole
  gram stream.
* Scoring is one narrow explode of the corpus joined against the
  broadcast model — map-side only, then a single per-doc aggregation
  shuffle.
* The smoothed probability ``(c12 + 1) / (c1 + V)`` is one uniform
  formula for all cases (unseen bigram, unseen unigram) — no branchy
  backoff, and every term is an exact integer before the final
  division, which keeps Spark and any SQL oracle bit-compatible up to
  the documented 6-decimal rounding of the per-doc mean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )


def _bigrams(text_col: Column) -> Column:
    toks = _tokens(text_col)
    n = F.size(toks)
    return F.when(n < 2, F.array().cast(
        "array<struct<w1:string,w2:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2")),
        )
    )


def bigram_model(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    max_bigrams: int = 50_000,
) -> "tuple[DataFrame, DataFrame]":
    """Count-based bigram model: returns ``(bigrams, unigrams)`` frames
    ``(w1, w2, c12)`` / ``(w1, c1)``. Bigrams keep only the
    ``max_bigrams`` most frequent (ties broken lexicographically —
    deterministic across partitionings); unigram counts stay complete
    (one row per distinct token: vocabulary-sized, not corpus-sized)."""
    grams = corpus.select(
        F.explode(_bigrams(F.col(text_col))).alias("g"))
    big = grams.groupBy("g.w1", "g.w2").agg(
        F.count(F.lit(1)).alias("c12"))
    # sort+limit, NOT a row_number window: Spark plans this as
    # TakeOrderedAndProject (per-partition top-M heaps merged), while a
    # global window would serialize every distinct bigram onto one task
    big = big.orderBy(F.desc("c12"), "w1", "w2").limit(max_bigrams)
    uni = corpus.select(
        F.explode(_tokens(F.col(text_col))).alias("w1")
    ).groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return big, uni


def lm_doc_scores(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean log-probability per document under the add-one-smoothed
    bigram model: ``avg(ln((c12 + 1) / (c1 + V)))`` over the doc's
    bigrams, rounded to 6 decimals (the engine-portability contract —
    ln() may differ in the last ulp across math libraries). ``V`` is
    the unigram vocabulary size. Documents with fewer than two tokens
    are dropped (no bigrams to score). Appends ``n_bigrams`` and
    ``avg_logprob``; lower scores = less LM-like text (boilerplate,
    noise, wrong language) — the perplexity-filter signal."""
    vocab = unigrams.agg(
        F.count(F.lit(1)).alias("__v")).select("__v")
    exploded = docs.select(
        F.col(id_col),
        F.explode(_bigrams(F.col(text_col))).alias("g"),
    ).select(id_col, "g.w1", "g.w2")
    scored = (
        exploded
        .join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(unigrams), ["w1"], "left")
        .join(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("__v"))
            ).alias("__lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__lp"), 6).alias("avg_logprob"),
    )
    return docs.join(per_doc, id_col)
