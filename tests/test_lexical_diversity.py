"""MATTR / TTR lexical diversity (Covington & McFall 2010), pinned
against a direct Python reference."""
from __future__ import annotations

import random

import pytest

from deltalake_spark.operators.text import lexical_diversity


def _ref(text: str, w: int = 25):
    toks = [t for t in text.strip().split() if t]
    n = len(toks)
    types = len(set(toks))
    wins = max(n - w + 1, 0)
    dsum = sum(len(set(toks[i:i + w])) for i in range(wins))
    ttr = round(types / n, 6) if n else None
    mattr = round(dsum / (wins * w), 6) if wins else None
    return n, types, ttr, dsum, wins, mattr


def test_matches_python_reference(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(3, 120)))
             for _ in range(60)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    for i, t in enumerate(texts):
        n, types, ttr, dsum, wins, mattr = _ref(t)
        r = got[i]
        assert r["n_tokens"] == n
        assert r["n_types"] == types
        assert r["ttr"] == pytest.approx(ttr)
        assert r["mattr_distinct_sum"] == dsum
        assert r["mattr_windows"] == wins
        if mattr is None:
            assert r["mattr"] is None
        else:
            assert r["mattr"] == pytest.approx(mattr)


def test_known_values(spark):
    # 30 identical tokens: every 25-window has 1 type -> mattr = 1/25
    df = spark.createDataFrame(
        [(1, " ".join(["x"] * 30)),
         (2, " ".join(str(i) for i in range(25))),   # all distinct
         (3, "a b c")],                               # shorter than window
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert got[1]["mattr"] == pytest.approx(1 / 25, abs=1e-9)
    assert got[1]["ttr"] == pytest.approx(1 / 30, abs=1e-6)
    assert got[2]["mattr"] == 1.0 and got[2]["mattr_windows"] == 1
    assert got[3]["mattr"] is None and got[3]["mattr_windows"] == 0
    assert got[3]["ttr"] == 1.0


def test_mattr_is_length_robust(spark):
    # the metric's reason to exist: repeating the same passage leaves
    # MATTR (nearly) unchanged while raw TTR collapses
    base = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, base), (2, " ".join([base] * 8))], "doc_id long, text string")
    got = {r["doc_id"]: r for r in lexical_diversity(df).collect()}
    assert got[2]["ttr"] < got[1]["ttr"] / 4
    assert abs(got[2]["mattr"] - got[1]["mattr"]) < 0.05


def test_bad_window_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lexical_diversity(df, window=1)
