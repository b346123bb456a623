"""Bigram LM perplexity filtering (operators/lm.py): model counts,
cap determinism, and score parity with a Python reference."""

import math

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.lm import bigram_model, lm_doc_scores


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "a dog sat"),
        ],
        "doc_id long, text string",
    )


def test_bigram_and_unigram_counts(spark, corpus):
    big, uni = bigram_model(corpus)
    b = {(r["w1"], r["w2"]): r["c12"] for r in big.collect()}
    assert b[("the", "cat")] == 2
    assert b[("cat", "sat")] == 1
    assert b[("on", "the")] == 1
    u = {r["w1"]: r["c1"] for r in uni.collect()}
    assert u["the"] == 3 and u["cat"] == 2 and u["sat"] == 2


def test_model_cap_deterministic(spark, corpus):
    big, _ = bigram_model(corpus, max_bigrams=2)
    rows = sorted((r["w1"], r["w2"], r["c12"]) for r in big.collect())
    # top by count then lexicographic: ("the","cat") c=2, then the
    # lexicographically-smallest count-1 bigram ("a","dog")
    assert rows == [("a", "dog", 1), ("the", "cat", 2)]


def _python_scores(rows, max_bigrams=None):
    import re

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    c12, c1 = {}, {}
    for _, t in rows:
        ws = toks(t)
        for w in ws:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    if max_bigrams is not None:
        keep = sorted(c12.items(), key=lambda kv: (-kv[1], kv[0]))
        c12 = dict(keep[:max_bigrams])
    V = len(c1)
    out = {}
    for doc_id, t in rows:
        ws = toks(t)
        if len(ws) < 2:
            continue
        lps = [
            math.log((c12.get((a, b), 0) + 1) / (c1.get(a, 0) + V))
            for a, b in zip(ws, ws[1:])
        ]
        out[doc_id] = (len(lps), round(sum(lps) / len(lps), 6))
    return out


def test_scores_match_python_reference(spark, corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    big, uni = bigram_model(corpus)
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
           for r in lm_doc_scores(corpus, big, uni).collect()}
    assert got == _python_scores(rows)


def test_oov_and_short_docs(spark, corpus):
    """Docs scored against a FOREIGN model: OOV bigrams take the
    uniform (0+1)/(0+V) mass; sub-2-token docs drop out."""
    queries = spark.createDataFrame(
        [(10, "zebra quux"), (11, "single"), (12, "the cat")],
        "doc_id long, text string",
    )
    big, uni = bigram_model(corpus)
    got = {r["doc_id"]: r for r in
           lm_doc_scores(queries, big, uni).collect()}
    assert 11 not in got  # one token -> no bigrams
    V = uni.count()
    assert got[10]["avg_logprob"] == round(math.log(1 / V), 6)
    assert got[12]["avg_logprob"] == round(math.log(3 / (3 + V)), 6)


def test_ordering_signal(spark):
    """A doc of in-distribution text outscores noise under a model
    trained on the distribution."""
    train = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(5)],
        "doc_id long, text string")
    test = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "qq zz pp rr")],
        "doc_id long, text string")
    big, uni = bigram_model(train)
    got = {r["doc_id"]: r["avg_logprob"] for r in
           lm_doc_scores(test, big, uni).collect()}
    assert got[100] > got[101]
