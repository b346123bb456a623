"""Distributed BPE trainer/encoder vs a pure-Python reference."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.bpe import (
    SEP,
    encode_bpe,
    train_bpe,
    word_counts,
)


def ref_train(texts: list[str], num_merges: int, min_freq: int = 2):
    """Reference BPE trainer: same rule set (lowercase whitespace words,
    global best pair, freq desc / pair asc tie-break, left-to-right
    non-overlapping merge)."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for p in zip(s, s[1:]):
                counts[p] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w in vocab:
            s, out = syms[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


@pytest.fixture(scope="module")
def corpus(spark, tables):
    rows = tables["documents"].where("lang = 'en'") \
        .select("doc_id", "text").orderBy("doc_id").limit(60)
    return rows.cache(), [r["text"] for r in rows.collect()]


def test_train_matches_reference(corpus):
    df, texts = corpus
    got = train_bpe(df, num_merges=25, min_freq=2)
    want, _ = ref_train(texts, num_merges=25, min_freq=2)
    assert got == want
    assert len(got) == 25  # the corpus supports that many merges


def test_sep_order_equals_tuple_order():
    # the NUL-joined tie-break string must order like the (a, b) tuple
    pairs = [("ab", "c"), ("a", "bc"), ("a", "b"), ("aa", "a")]
    by_str = sorted(pairs, key=lambda p: p[0] + SEP + p[1])
    assert by_str == sorted(pairs)


def test_encode_roundtrip_and_reference(corpus, spark):
    df, texts = corpus
    merges, ref_syms = ref_train(texts, num_merges=25, min_freq=2)
    out = encode_bpe(df, merges).select("doc_id", "text", "bpe_tokens")
    for r in out.collect():
        toks = r["bpe_tokens"]
        # round-trip: concatenating tokens rebuilds the lowercased words
        assert "".join(toks) == "".join(r["text"].lower().split())
        # every token is either a learned merge product or a single char
        learned = {a + b for a, b in merges}
        assert all(t in learned or len(t) == 1 for t in toks)


def test_encode_agrees_with_training_segmentation(corpus):
    """Encoding the training corpus reproduces the trainer's final
    symbol table (greedy-by-rank encode ≡ replaying merges in order for
    words seen in training — the classic BPE consistency property)."""
    df, texts = corpus
    merges, ref_syms = ref_train(texts, num_merges=25, min_freq=2)
    out = encode_bpe(df, merges)
    enc = out.select("text", "bpe_tokens").collect()
    for r in enc:
        toks = list(r["bpe_tokens"])
        for w in r["text"].lower().split():
            seg = ref_syms[w]
            assert toks[: len(seg)] == seg, w
            toks = toks[len(seg):]
        assert toks == []


def test_min_freq_stops_training(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string")
    # 'a b' and nothing else reaches freq 2
    assert train_bpe(df, num_merges=10, min_freq=2) == [("a", "b")]
    # min_freq=1 keeps merging until words are single tokens
    merges = train_bpe(df, num_merges=10, min_freq=1)
    assert merges == [("a", "b"), ("c", "d")]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  ")], "doc_id long, text string")
    assert train_bpe(df, num_merges=5, min_freq=1) == []
    out = encode_bpe(df, [("a", "b")]).collect()
    assert [list(r["bpe_tokens"]) for r in out] == [[], [], []]


def test_word_counts_shape(corpus):
    df, texts = corpus
    wc = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    want = Counter(w for t in texts for w in t.lower().split())
    assert wc == dict(want)
