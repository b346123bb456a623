"""Distributed BPE tokenizer training and encoding.

The reference has no tokenizer (its token awareness stops at counting);
``operators.text.token_count_bpe`` is a regex *estimate*. This module is
the real thing — byte-pair-encoding merges learned from the corpus — done
Spark-shaped:

- **Training** (:func:`train_bpe`) never materializes text on the driver.
  The corpus collapses once into a distributed ``(word, count)`` table
  (vocabulary-sized — Heaps' law puts it orders of magnitude under the
  corpus even at 100 TB, and it stays distributed regardless). Each merge
  iteration is then: one pair-count shuffle over that table + a **1-row**
  argmax collect + a map-only JVM fold applying the merge. ``num_merges``
  iterations = ``num_merges`` small jobs over vocabulary-sized data, with
  ``localCheckpoint`` every few merges to keep lineage flat.
- **Encoding** (:func:`encode_bpe`) broadcasts the KB-scale merge ranks
  once per executor inside an Arrow-batched ``pandas_udf`` (iterative
  rank-greedy merging is inherently sequential per word — the sanctioned
  Python path, same cost model as the multimodal decoders).

Symbols are per-word (no merge can cross a whitespace boundary), without
an end-of-word marker — the marker-free variant keeps the pair alphabet
equal to the corpus alphabet, and round-trip still holds because token
concatenation rebuilds each word exactly (property-tested).

Pairs travel as ``a + "\\x00" + b``: NUL cannot appear in whitespace-split
tokens, and lexicographic order on the joined string equals tuple order
on (a, b), so the deterministic tie-break (max count, then smallest pair)
is one ORDER BY.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x00"


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal (escape quotes and backslashes)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_counts(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Whitespace-tokenized, lowercased ``(word, cnt)`` table — the only
    corpus-wide shuffle in BPE training."""
    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        .alias("word")
    ).filter(F.length("word") > 0)
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def adjacent_pairs(sym_col: str) -> Column:
    """Adjacent symbol pairs of an ``array<string>`` column as
    ``a\\x00b`` strings (JVM transform, empty for single-symbol words)."""
    return F.expr(
        f"transform(slice({sym_col}, 1, size({sym_col}) - 1),"
        f" (s, i) -> concat(s, {_sql_str(SEP)}, {sym_col}[i + 1]))"
    )


def merge_pair(sym_col: str, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) → ab over an
    ``array<string>`` column, as a JVM aggregate fold (the fold naturally
    gives BPE's non-overlap rule: a just-merged ``ab`` can't be the left
    side of the next match)."""
    la, lb, lab = _sql_str(a), _sql_str(b), _sql_str(a + b)
    return F.expr(
        f"aggregate({sym_col}, cast(array() as array<string>),"
        " (acc, s) -> CASE WHEN size(acc) > 0"
        f"   AND element_at(acc, -1) = {la} AND s = {lb}"
        f"  THEN concat(slice(acc, 1, size(acc) - 1), array({lab}))"
        "   ELSE concat(acc, array(s)) END)"
    )


def train_bpe(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 50,
    min_freq: int = 2,
    checkpoint_every: int = 8,
    checkpoint_dir: str | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the merge
    list in rank order. Stops early when the best pair's frequency drops
    below ``min_freq``. Deterministic: ties break to the lexicographically
    smallest pair. ``checkpoint_dir`` switches the periodic lineage cut
    to reliable checkpoints (see
    :mod:`deltalake_spark.operators.iterative`)."""
    from deltalake_spark.operators.iterative import RoundCutter
    cutter = RoundCutter(df.sparkSession, checkpoint_dir, "bpe")
    syms = word_counts(df, text_col=text_col).select(
        F.split("word", "").alias("syms"), "cnt"
    )
    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        top = (
            syms.select(F.explode(adjacent_pairs("syms")).alias("pair"),
                        "cnt")
            .groupBy("pair").agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("pair"))
            .first()
        )
        if top is None or top["freq"] < min_freq:
            break
        a, b = top["pair"].split(SEP, 1)
        merges.append((a, b))
        syms = syms.withColumn("syms", merge_pair("syms", a, b))
        if (it + 1) % checkpoint_every == 0:
            # flat lineage: each merge adds a fold on top of the last
            syms = cutter.cut(syms, eager=True)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic rank-greedy BPE encode of one word (best-ranked pair first,
    merged left-to-right non-overlapping) — mirrors train_bpe's fold."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: whitespace-split,
    lowercase, per-word rank-greedy merges. Appends ``out_col``
    (array<string>). Arrow-batched pandas UDF; the ranks dict (KB for any
    realistic vocab) ships once per executor with the task closure."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: r for r, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            if t:
                for w in t.lower().split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
