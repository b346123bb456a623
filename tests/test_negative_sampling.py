"""Deterministic negative sampling for implicit feedback, pinned
against a full Python re-derivation."""
from __future__ import annotations

import pytest

from deltalake_spark.operators.recommend import (
    negative_sample_interactions,
)


def _ref(pos_pairs, n_items, k=4, oversample=2, seed=19):
    total = k * oversample
    pos = set(pos_pairs)
    users = sorted({u for u, _ in pos_pairs})
    out = []
    for u in users:
        kept = 0
        for j in range(total):
            it = 1 + (((u * total + j + seed) * 2654435761)
                      % 4294967296) % n_items
            if (u, it) in pos:
                continue
            out.append((u, kept, it))
            kept += 1
            if kept == k:
                break
    return out


def test_matches_python_reference(spark):
    import random

    rng = random.Random(9)
    pos = list({(rng.randint(1, 30), rng.randint(1, 50))
                for _ in range(300)})
    df = spark.createDataFrame(pos, "user long, item long")
    got = sorted(
        tuple(r) for r in negative_sample_interactions(
            df, user_col="user", item_col="item", n_items=50
        ).collect())
    assert got == sorted(_ref(pos, 50))


def test_negatives_never_collide_with_positives(spark):
    pos = [(1, i) for i in range(1, 40)] + [(2, 5)]
    df = spark.createDataFrame(pos, "user long, item long")
    got = negative_sample_interactions(
        df, user_col="user", item_col="item", n_items=40, k=3
    ).collect()
    pos_set = set(pos)
    for r in got:
        assert (r["user"], r["neg_item"]) not in pos_set
    # user 1 owns 39/40 items: fewer than k survivors is allowed
    n1 = sum(1 for r in got if r["user"] == 1)
    assert n1 <= 3
    # user 2 owns 1/40: all k survive, draw_index dense from 0
    idx2 = sorted(r["draw_index"] for r in got if r["user"] == 2)
    assert idx2 == [0, 1, 2]


def test_deterministic_across_partitionings(spark):
    pos = [(u, (u * 7 + i) % 97 + 1) for u in range(1, 25)
           for i in range(6)]
    a = spark.createDataFrame(pos, "user long, item long").coalesce(1)
    b = spark.createDataFrame(pos, "user long, item long").repartition(8)
    ra = sorted(tuple(r) for r in negative_sample_interactions(
        a, user_col="user", item_col="item", n_items=97).collect())
    rb = sorted(tuple(r) for r in negative_sample_interactions(
        b, user_col="user", item_col="item", n_items=97).collect())
    assert ra == rb


def test_guards(spark):
    df = spark.createDataFrame([(1, 1)], "user long, item long")
    with pytest.raises(ValueError):
        negative_sample_interactions(
            df, user_col="user", item_col="item", n_items=1)
    with pytest.raises(ValueError):
        negative_sample_interactions(
            df, user_col="user", item_col="item", n_items=10, k=0)
