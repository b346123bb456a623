"""lsh_candidate_quality: precision/recall of MinHash-LSH banding vs
exact-Jaccard ground truth, pinned against a full Python re-derivation
(shingle hashing, permutation minima, banding, bucket pairs, exact J)."""
from __future__ import annotations

import hashlib
import random

import pytest

from deltalake_spark.operators.dedup import (
    _hash_params,
    lsh_candidate_quality,
)

_PRIME = 2_147_483_647


def _shingles(text: str) -> set[int]:
    w = text.strip().split()
    if len(w) < 3:
        grams = [" ".join(w + [""] * (3 - len(w)))[: None]]
        # mirror slice+coalesce('') padding: always exactly one gram
        grams = [" ".join((w + ["", ""])[:3])]
    else:
        grams = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)]
    return {
        int(hashlib.md5(g.encode()).hexdigest()[:7], 16)
        for g in set(grams)
    }


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


def _lsh_pairs(texts: dict[int, str], num_hashes=32, bands=8, seed=42):
    params = _hash_params(num_hashes, seed)
    keys = {}
    rows = num_hashes // bands
    for i, t in texts.items():
        hs = _shingles(t)
        sig = [min((h * a + b) % _PRIME for h in hs) for a, b in params]
        for b in range(bands):
            bkey = "|".join(
                str(x) for x in sig[b * rows:(b + 1) * rows])
            h = int(hashlib.md5(bkey.encode()).hexdigest()[:15], 16)
            keys.setdefault((b, h), []).append(i)
    pairs = set()
    for members in keys.values():
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
    return pairs


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(200)]
    texts = {}
    i = 0
    # clone clusters (J=1), mutated near-dups, and unrelated docs
    for _ in range(6):
        base = " ".join(rng.choices(vocab, k=40))
        texts[i] = base
        texts[i + 1] = base
        words = base.split()
        for j in range(0, len(words), 7):
            words[j] = rng.choice(vocab)
        texts[i + 2] = " ".join(words)
        i += 3
    for _ in range(30):
        texts[i] = " ".join(rng.choices(vocab, k=35))
        i += 1
    return texts


def test_quality_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    got = lsh_candidate_quality(
        df, id_col="doc_id", text_col="text",
        threshold_num=1, threshold_den=2,
    ).collect()[0]

    sh = {i: _shingles(t) for i, t in corpus.items()}
    ids = sorted(corpus)
    truth = {
        (a, b)
        for ai, a in enumerate(ids) for b in ids[ai + 1:]
        if _jaccard(sh[a], sh[b]) >= 0.5
    }
    cand = _lsh_pairs(corpus)
    assert got["n_true"] == len(truth)
    assert got["n_cand"] == len(cand)
    assert got["n_hit"] == len(truth & cand)
    if cand:
        assert got["precision"] == pytest.approx(
            len(truth & cand) / len(cand))
    if truth:
        assert got["recall"] == pytest.approx(
            len(truth & cand) / len(truth))
    # the synthetic corpus must actually exercise all three regions
    assert len(truth) > 0 and len(cand) > 0


def test_native_mode_runs_and_finds_clones(spark, corpus):
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    got = lsh_candidate_quality(
        df, id_col="doc_id", text_col="text",
        threshold_num=4, threshold_den=5, hash_mode="native",
    ).collect()[0]
    # exact clones (J=1) are always banded together: recall at a high
    # threshold can only miss mutated pairs, never the 6 clone pairs
    assert got["n_hit"] >= 6
    assert got["recall"] > 0


def test_bad_hash_mode_raises(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lsh_candidate_quality(
            df, id_col="doc_id", text_col="text",
            threshold_num=1, threshold_den=2, hash_mode="sha",
        ).collect()
