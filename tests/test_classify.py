"""Naive Bayes / DSIR / MG-sketch / semantic-decontamination tests.

Each operator is checked against an independent pure-Python (or numpy)
reference implementation on small data, plus partitioning-invariance —
the property that makes the closed-form designs safe on a real cluster.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.classify import (
    dsir_importance_weights,
    score_naive_bayes,
    train_naive_bayes,
)
from deltalake_spark.operators.curation import semantic_decontaminate
from deltalake_spark.operators.sketches import mg_frequent_items

DOCS = [
    (1, "spam", "buy cheap pills buy now"),
    (2, "spam", "cheap pills online buy"),
    (3, "ham", "meeting notes for the team"),
    (4, "ham", "team lunch notes tomorrow"),
    (5, "ham", "notes on the quarterly meeting"),
]


def _tokenize(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z]+", text.lower()) if t]


def _nb_reference(docs):
    """Independent multinomial NB with add-one smoothing."""
    labels = Counter(lab for _, lab, _ in docs)
    n_docs = len(docs)
    counts: Counter = Counter()
    totals: Counter = Counter()
    vocab = set()
    for _, lab, text in docs:
        for tok in _tokenize(text):
            counts[(lab, tok)] += 1
            totals[lab] += 1
            vocab.add(tok)
    v = len(vocab)
    out = {}
    for doc_id, _, text in docs:
        scores = {}
        for lab in labels:
            s = math.log(labels[lab] / n_docs)
            for tok in _tokenize(text):
                s += math.log(
                    (counts[(lab, tok)] + 1.0) / (totals[lab] + v)
                )
            scores[lab] = round(s, 6)
        # argmax, ties by label ascending
        best = max(scores.values())
        out[doc_id] = min(k for k, sc in scores.items() if sc == best)
    return out


def test_nb_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "label", "text"])
    model = train_naive_bayes(df, text_col="text", label_col="label")
    scored = score_naive_bayes(
        df, model, id_col="doc_id", text_col="text"
    )
    got = {r["doc_id"]: r["predicted"] for r in scored.collect()}
    assert got == _nb_reference(DOCS)
    # sanity: the classes actually separate on this data
    assert got[1] == "spam" and got[3] == "ham"


def test_nb_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "label", "text"])
    base = None
    for parts in (1, 7):
        d = df.repartition(parts)
        model = train_naive_bayes(d, text_col="text", label_col="label")
        scored = score_naive_bayes(
            d, model, id_col="doc_id", text_col="text"
        ).orderBy("doc_id")
        rows = [(r["doc_id"], r["predicted"], r["score"]) for r in scored.collect()]
        if base is None:
            base = rows
        else:
            assert rows == base


def test_nb_min_count_prunes_but_still_scores(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "label", "text"])
    model = train_naive_bayes(
        df, text_col="text", label_col="label", min_count=2
    )
    kept = model.likelihoods.agg(F.min("c")).first()[0]
    assert kept >= 2
    scored = score_naive_bayes(df, model, id_col="doc_id", text_col="text")
    assert scored.count() == len(DOCS)


def test_dsir_weights_favor_target_like_docs(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "label", "text"])
    w = dsir_importance_weights(
        df,
        id_col="doc_id",
        text_col="text",
        target_filter=F.col("label") == "spam",
    )
    got = {r["doc_id"]: r["weight"] for r in w.collect()}
    assert len(got) == len(DOCS)
    spam_mean = (got[1] + got[2]) / 2
    ham_mean = (got[3] + got[4] + got[5]) / 3
    assert spam_mean > ham_mean
    # deterministic under repartition
    w2 = dsir_importance_weights(
        df.repartition(5),
        id_col="doc_id",
        text_col="text",
        target_filter=F.col("label") == "spam",
    )
    assert {r["doc_id"]: r["weight"] for r in w2.collect()} == got


def test_dsir_reference_value(spark):
    """Closed-form check on a 2-doc corpus."""
    rows = [(1, True, "a a b"), (2, False, "b c")]
    df = spark.createDataFrame(rows, ["doc_id", "is_tgt", "text"])
    w = dsir_importance_weights(
        df, id_col="doc_id", text_col="text",
        target_filter=F.col("is_tgt"),
    )
    got = {r["doc_id"]: r["weight"] for r in w.collect()}
    # raw counts: a=2 b=2 c=1, T_raw=5, V=3; tgt: a=2 b=1, T_tgt=3
    def lr(c_tgt, c_raw):
        return math.log((c_tgt + 1) / (3 + 3)) - math.log((c_raw + 1) / (5 + 3))

    exp1 = round((lr(2, 2) + lr(2, 2) + lr(1, 2)) / 3, 6)
    exp2 = round((lr(1, 2) + lr(0, 1)) / 2, 6)
    assert got == {1: pytest.approx(exp1), 2: pytest.approx(exp2)}


def test_mg_exact_when_capacity_fits(spark):
    data = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5
    df = spark.createDataFrame(data, ["tok"]).repartition(4)
    out = {
        r["tok"]: r["mg_count"]
        for r in mg_frequent_items(df, col="tok", capacity=16).collect()
    }
    assert out == {"a": 50, "b": 30, "c": 5}


def test_mg_eviction_bound(spark):
    """Capacity far below vocabulary: every reported count must be an
    underestimate within n/(capacity+1), and every true heavy hitter
    above that threshold must survive the merge."""
    import random

    rng = random.Random(7)
    stream = []
    # heavy items with mass, plus a long tail of distinct singletons
    for i, mass in ((0, 400), (1, 300), (2, 200)):
        stream += [f"heavy{i}"] * mass
    stream += [f"tail{j}" for j in range(1500)]
    rng.shuffle(stream)
    n = len(stream)
    cap = 64
    truth = Counter(stream)
    df = spark.createDataFrame([(t,) for t in stream], ["tok"]).repartition(8)
    got = {
        r["tok"]: r["mg_count"]
        for r in mg_frequent_items(df, col="tok", capacity=cap).collect()
    }
    bound = n / (cap + 1)
    for tok, c in got.items():
        assert c <= truth[tok]
        assert truth[tok] - c <= bound
    for tok, c in truth.items():
        if c > bound:
            assert tok in got, f"heavy hitter {tok} ({c} > {bound}) evicted"
    # sketch stayed bounded: far fewer rows than the 1503-token vocabulary
    assert len(got) <= 8 * cap


def test_semantic_decontaminate_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    ev = rng.normal(size=(4, 8)).astype("float32")
    corpus = rng.normal(size=(10, 8)).astype("float32")
    corpus[7] = ev[2] * 1.7  # planted contamination (cosine 1.0)
    ev_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(ev)],
        ["vec_id", "vec"],
    )
    c_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
        ["vec_id", "vec"],
    )
    out = semantic_decontaminate(
        c_df, ev_df, id_col="vec_id", vec_col="vec", threshold=0.9
    )
    got = {r["vec_id"]: (r["max_eval_sim"], r["contaminated"]) for r in out.collect()}
    cd = corpus.astype("float64")
    ed = ev.astype("float64")
    sims = (cd @ ed.T) / (
        np.linalg.norm(cd, axis=1)[:, None] * np.linalg.norm(ed, axis=1)[None, :]
    )
    for i in range(10):
        exp = round(float(sims[i].max()), 6)
        assert got[i][0] == pytest.approx(exp, abs=1e-6)
        assert got[i][1] == (exp >= 0.9)
    assert got[7][1] is True


def test_nb_scores_zero_token_docs_by_prior(spark):
    """Docs that tokenize to nothing (numeric/non-Latin text) must still
    be scored — by class prior alone — not silently dropped."""
    docs = DOCS + [(6, "ham", "12345 67890"), (7, "ham", "你好世界")]
    df = spark.createDataFrame(docs, ["doc_id", "label", "text"])
    model = train_naive_bayes(df, text_col="text", label_col="label")
    scored = score_naive_bayes(df, model, id_col="doc_id",
                               text_col="text")
    got = {r["doc_id"]: (r["predicted"], r["score"])
           for r in scored.collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    # prior-only argmax: ham has 5/7 docs vs spam 2/7
    import math
    assert got[6][0] == "ham" and got[7][0] == "ham"
    assert got[6][1] == pytest.approx(round(math.log(5 / 7), 6))


def test_dsir_zero_token_docs_get_neutral_weight(spark):
    df = spark.createDataFrame(
        DOCS + [(6, "ham", "!!!")], ["doc_id", "label", "text"])
    w = dsir_importance_weights(
        df, id_col="doc_id", text_col="text",
        target_filter=F.col("label") == "spam")
    got = {r["doc_id"]: r["weight"] for r in w.collect()}
    assert got[6] == 0.0 and len(got) == 6


def test_semantic_decontaminate_empty_eval_set(spark):
    """An empty eval set means nothing is contaminated — the corpus
    must pass through intact, not be deleted by an inner join."""
    c_df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], ["vec_id", "vec"])
    ev_df = c_df.filter(F.col("vec_id") < 0)  # empty
    out = semantic_decontaminate(
        c_df, ev_df, id_col="vec_id", vec_col="vec", threshold=0.5)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["contaminated"] is False for r in rows)
    assert all(r["max_eval_sim"] is None for r in rows)


class TestNgramNovelty:
    def test_exact_novelty_values(self, spark):
        from deltalake_spark.operators.curation import ngram_novelty

        ref = spark.createDataFrame(
            [(100, "abcdef")], "doc_id long, text string")
        docs = spark.createDataFrame(
            [(1, "abcdef"),     # all grams in reference → novelty 0
             (2, "xyzxyz"),    # no grams in reference → novelty 1
             (3, "abcxyz")],   # mixed
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               ngram_novelty(docs, ref).collect()}
        assert out[1]["novelty"] == 0.0
        assert out[2]["novelty"] == 1.0
        # doc 3 grams: abc bcx cxy xyz — only abc is in ref → 3/4
        assert (out[3]["n_grams"], out[3]["n_novel"]) == (4, 3)
        assert out[3]["novelty"] == 0.75

    def test_bloom_variant_one_sided_and_close(self, spark):
        from deltalake_spark.operators.curation import (
            ngram_novelty,
            ngram_novelty_bloom,
        )
        from pyspark.sql import functions as F

        ref = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("ref text block "),
                     F.col("id").cast("string"),
                     F.lit(" common tail")).alias("text"))
        docs = spark.range(300, 360).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("novel payload "),
                     F.col("id").cast("string"),
                     F.lit(" common tail")).alias("text"))
        exact = {r["doc_id"]: r["n_novel"]
                 for r in ngram_novelty(docs, ref).collect()}
        est = {r["doc_id"]: r["n_novel"]
               for r in ngram_novelty_bloom(
                   docs, ref, m_bits=1 << 18).collect()}
        assert set(exact) == set(est)
        for d in exact:
            # one-sided: bloom FPs mark grams as seen → est <= exact
            assert est[d] <= exact[d], d
            assert est[d] >= exact[d] - 3  # FP slack at this m/n


def test_score_margin_consistent_with_argmax(spark):
    """r9: score_naive_bayes_margin's predicted label equals
    score_naive_bayes's argmax on every doc, margins are non-negative
    integers, and a perfectly separable corpus puts every correct doc
    in a positive-margin bin."""
    from deltalake_spark.operators.classify import (
        score_naive_bayes,
        score_naive_bayes_margin,
        train_naive_bayes,
    )

    rows = [(i, "en", "the cat and the dog sat") for i in range(6)]
    rows += [(10 + i, "de", "der hund und die katze sass")
             for i in range(6)]
    rows += [(20, "en", "der the mixed katze cat")]  # ambiguous-ish
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = train_naive_bayes(df, text_col="text", label_col="lang")
    am = {r["doc_id"]: r["predicted"] for r in score_naive_bayes(
        df, model, id_col="doc_id", text_col="text").collect()}
    mg = {r["doc_id"]: r for r in score_naive_bayes_margin(
        df, model, id_col="doc_id", text_col="text",
        label_col="lang").collect()}
    assert set(am) == set(mg)
    for d, r in mg.items():
        assert r["predicted"] == am[d]
        assert r["margin_micro"] >= 0
        assert r["correct"] == (r["predicted"] == r["lang"])
    # the clean docs are all correct with fat margins; the mixed doc's
    # margin is strictly smaller than any clean doc's
    clean = [mg[i]["margin_micro"] for i in list(range(6))
             + list(range(10, 16))]
    assert all(mg[i]["correct"] for i in range(6))
    assert mg[20]["margin_micro"] < min(clean)
