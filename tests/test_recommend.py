"""Item-item co-occurrence similarity (operators/recommend.py)."""

from __future__ import annotations

import math

from deltalake_spark.operators.recommend import cooccurrence_similarity


def _run(spark, baskets, **kw):
    rows = [(b, i) for b, items in baskets for i in items]
    df = spark.createDataFrame(rows, "basket long, item string") \
        .repartition(5)
    out = cooccurrence_similarity(df, basket_col="basket",
                                  item_col="item", **kw)
    return {(r["item_a"], r["item_b"]):
            (r["n_both"], r["n_a"], r["n_b"], r["cosine"])
            for r in out.collect()}


def test_cosine_hand_values(spark):
    baskets = [
        (1, ["x", "y"]), (2, ["x", "y"]), (3, ["x", "y", "z"]),
        (4, ["x"]), (5, ["z"]),
    ]
    got = _run(spark, baskets, min_pairs=1)
    # x in 4 baskets, y in 3, z in 2; xy together 3, xz 1, yz 1
    assert got[("x", "y")] == (3, 4, 3, 3.0 / math.sqrt(12.0))
    assert got[("x", "z")] == (1, 4, 2, 1.0 / math.sqrt(8.0))
    assert got[("y", "z")] == (1, 3, 2, 1.0 / math.sqrt(6.0))
    # perfect companions score 1.0
    assert _run(spark, [(1, ["p", "q"]), (2, ["p", "q"])],
                min_pairs=1)[("p", "q")][3] == 1.0


def test_duplicate_items_in_basket_count_once(spark):
    got = _run(spark, [(1, ["a", "a", "b"]), (2, ["a", "b", "b"])],
               min_pairs=1)
    assert got[("a", "b")] == (2, 2, 2, 1.0)


def test_min_pairs_floor(spark):
    baskets = [(1, ["a", "b"]), (2, ["a", "b"]), (3, ["a", "c"])]
    got = _run(spark, baskets, min_pairs=2)
    assert set(got) == {("a", "b")}


def test_max_basket_drops_mega_baskets(spark):
    mega = (99, [f"m{i}" for i in range(50)])
    baskets = [(1, ["a", "b"]), (2, ["a", "b"]), mega]
    got = _run(spark, baskets, min_pairs=1, max_basket=10)
    # the 50-item basket contributes NO pairs and no item counts
    assert set(got) == {("a", "b")}
    assert got[("a", "b")] == (2, 2, 2, 1.0)


def test_partitioning_invariance_bit_exact(spark):
    import random

    rng = random.Random(23)
    baskets = [(b, [f"i{rng.randrange(12)}" for _ in range(rng.randrange(1, 6))])
               for b in range(150)]
    a = _run(spark, baskets, min_pairs=2)
    rows = [(b, i) for b, items in baskets for i in items]
    df1 = spark.createDataFrame(rows, "basket long, item string") \
        .repartition(1)
    b_ = {(r["item_a"], r["item_b"]):
          (r["n_both"], r["n_a"], r["n_b"], r["cosine"])
          for r in cooccurrence_similarity(
              df1, basket_col="basket", item_col="item",
              min_pairs=2).collect()}
    assert a == b_
