"""Lexical retrieval: BM25 scoring over a document corpus.

The reference engine has no text-retrieval operator; this is a
north-star addition for training-data curation (query-focused corpus
selection, eval-set mining, boosted sampling — the lexical complement
to the embedding ANN operators in ``operators/similarity.py``).

Scale design (Robertson/Spärck Jones BM25, the Okapi formulation used
by Lucene):

- Per-document term frequencies come from Spark higher-order functions
  over the in-row token array — a narrow, shuffle-free JVM projection.
- The corpus statistics BM25 needs (N, avgdl, per-term document
  frequency) are ONE struct-valued SCALAR SUBQUERY: a single extra
  aggregation stage producing one row of a few doubles regardless of
  corpus size, referenced directly by the scoring expression.  No join
  node exists in the plan — a literal-key broadcast join would fold
  back into a nested-loop join (which the plan budgets forbid), and a
  driver-side collect would serialize the pipeline.
- Top-k lands in TakeOrderedAndProject (per-partition heaps, no global
  sort materialization).

At 100 TB this is two corpus scans (stats + score) with KB-scale
intermediate state — no inverted index is materialized.  For repeated
querying, persist the token arrays and stats once and reuse them; the
per-query cost is then one scan.
"""

from __future__ import annotations

import uuid
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(text_col: Column) -> Column:
    """Lowercase whitespace tokens, empties dropped (matches
    operators/text.py token accounting)."""
    return F.filter(F.split(F.lower(F.trim(text_col)), r"\s+"),
                    lambda t: t != "")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-words query.

    idf uses the Lucene-style non-negative form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``; tf saturation is
    ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.  Score is rounded
    before the final ordering so the ranking (incl. the k boundary) is
    reproducible bit-for-bit against a SQL oracle despite 1-ulp libm
    differences in ``ln``.

    Side effect: registers a uniquely-named temp view for the duration
    of this call (the scalar subquery needs a relation to reference) and
    drops it before returning — PySpark analysis is eager, so the view
    is already resolved into the returned plan and the catalog is left
    unchanged. A per-call unique name (not a 32-bit semanticHash, which
    can collide across different corpora and silently rebind an earlier
    lazily-built result's stats) makes cross-call interference
    impossible.
    """
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")

    view = f"__bm25_corpus_{uuid.uuid4().hex}"
    docs.createOrReplaceTempView(view)

    tk_sql = (f"filter(split(lower(trim({text_col})), '\\\\s+'), "
              "x -> x != '')")
    df_parts = ", ".join(
        f"sum(cast(array_contains(tk, {_sql_str(t)}) as int)) as df_{i}"
        for i, t in enumerate(terms))
    stats = F.expr(
        f"(select struct(cast(count(*) as double) as n, "
        f"avg(size(tk)) as avgdl, {df_parts}) "
        f"from (select {tk_sql} as tk from {view}))")

    toks = docs.select(
        F.col(id_col),
        tokenize(F.col(text_col)).alias("__tk"),
    ).withColumn("__dl", F.size("__tk"))

    def term_eq(term: str):
        # single-arg lambda factory: a two-parameter lambda would be
        # interpreted by F.filter as its (element, index) form
        return lambda x: x == F.lit(term)

    parts: list[Column] = []
    for i, t in enumerate(terms):
        tf = F.size(F.filter("__tk", term_eq(t)))
        df_t = stats[f"df_{i}"]
        idf = F.log(
            F.lit(1.0) + (stats["n"] - df_t + 0.5) / (df_t + 0.5))
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / stats["avgdl"])
        parts.append(idf * tf * F.lit(k1 + 1.0) / denom)
    score = parts[0]
    for p in parts[1:]:
        score = score + p

    out = (
        toks.select(
            F.col(id_col),
            F.round(score, round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    # analysis already resolved the view into `out`'s plan; dropping it
    # here leaves no catalog residue
    docs.sparkSession.catalog.dropTempView(view)
    return out


def rrf_fuse(
    ranked: "Sequence[DataFrame]",
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009): fuse several
    rankings of the same id space with ``score(d) = Σ 1/(k + rank_d)``
    — the standard glue for hybrid retrieval (BM25 + ANN + priors),
    robust to incomparable score scales because only ranks matter.

    Each input carries ``(id_col, rank_col)`` with 1-based ranks.
    Union + one hash aggregate on the id; no joins. The inputs are
    top-k lists, so everything past the source rankings is
    candidate-sized (|lists|·k rows), not corpus-sized — the final
    global order is a TakeOrdered over that bounded set. Contributions
    ``1/(k + rank)`` are exact IEEE divisions of small integers, so the
    fused ordering replays bit-for-bit in any double-precision engine.
    Output: ``id_col``, ``rrf_score`` (rounded to 6), ``fused_rank``.

    The ``fused_rank`` window is global-ordered (no PARTITION BY) by
    design: its frame is the candidate union above — |lists|·k rows,
    KB-scale — never the corpus. With ``topk=None`` the frame is the
    union of the input lists, still candidate-sized by construction;
    feed :func:`operators.ranking.with_global_rank` instead if you
    ever fuse corpus-sized "rankings".
    """
    from pyspark.sql.window import Window

    if not ranked:
        raise ValueError("rrf_fuse requires at least one ranking")
    parts = [
        d.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))
             ).alias("__c"),
        )
        for d in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(id_col).agg(F.sum("__c").alias("__s"))
    if topk is not None:
        fused = fused.orderBy(F.desc("__s"), F.asc(id_col)).limit(topk)
    w = Window.orderBy(F.desc("__s"), F.asc(id_col))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .withColumn("rrf_score", F.round(F.col("__s"), 6))
        .drop("__s")
        .select(id_col, "rrf_score", "fused_rank")
    )


def inverted_index(
    df: DataFrame,
    *,
    doc_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Materialize an inverted index: one row per token with document
    frequency, total term frequency, and the sorted posting list
    (``array<struct<doc_id, tf>>``) — the persisted-side-table form of
    the statistics BM25/TF-IDF recompute per query.

    Scale shape: explode + two hash aggregations (token×doc partial
    counts combine map-side, then token-keyed postings assembly). The
    posting-list collect is bounded per token by document frequency —
    for stopword-scale tokens cap or drop them via ``min_df``-style
    pruning downstream before collecting (this helper materializes
    what it is given). Tokens are whitespace-split; empty tokens are
    dropped.
    """
    toks = df.select(
        F.col(doc_col),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).filter(F.col("token") != "")
    per_doc = toks.groupBy("token", doc_col).agg(
        F.count(F.lit(1)).alias("tf"))
    out = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.min(doc_col).alias("first_doc"),
        F.max(doc_col).alias("last_doc"),
        F.sort_array(F.collect_list(
            F.struct(F.col(doc_col), F.col("tf")))).alias("postings"),
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out
