"""Unit tests for operators/itemsets.py — distributed Apriori checked
against an itertools brute force on hand-built baskets (the gate query
cross-checks the same joins against DuckDB at fixture scale)."""

from itertools import combinations

import pytest

from deltalake_spark.operators.itemsets import (
    association_rules,
    frequent_itemsets,
)

BASKETS = {
    1: {"a", "b", "c"},
    2: {"a", "b", "c", "d"},
    3: {"a", "b"},
    4: {"b", "c"},
    5: {"a", "c"},
    6: {"a"},
    7: {"d"},
}


def _df(spark):
    rows = [(b, i) for b, items in BASKETS.items() for i in items]
    # duplicate a few rows: incidence must dedup per basket
    rows += [(1, "a"), (2, "d")]
    return spark.createDataFrame(rows, "b int, i string")


def _brute(min_support, size):
    counts = {}
    for items in BASKETS.values():
        for combo in combinations(sorted(items), size):
            counts[combo] = counts.get(combo, 0) + 1
    return {k: v for k, v in counts.items() if v >= min_support}


def test_frequent_itemsets_match_brute_force(spark):
    out = frequent_itemsets(
        _df(spark), basket_col="b", item_col="i",
        min_support=2).collect()
    got = {}
    for r in out:
        key = tuple(x for x in (r["item_a"], r["item_b"], r["item_c"])
                    if x is not None)
        assert r["size"] == len(key)
        got[key] = r["support"]
    want = {}
    for size in (1, 2, 3):
        want.update(_brute(2, size))
    assert got == want
    # spot values: supp(a)=5, supp(a,b)=3, supp(a,b,c)=2
    assert got[("a",)] == 5
    assert got[("a", "b")] == 3
    assert got[("a", "b", "c")] == 2


def test_frequent_itemsets_max_size_and_support(spark):
    out = frequent_itemsets(
        _df(spark), basket_col="b", item_col="i",
        min_support=4, max_size=2).collect()
    got = {(r["item_a"], r["item_b"]): r["support"] for r in out}
    # only singles reach support 4: a=5, b=4, c=4
    assert got == {("a", None): 5, ("b", None): 4, ("c", None): 4}


def test_frequent_itemsets_mega_basket_guard(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
            (99, "a"), (99, "b"), (99, "c"), (99, "d")]
    df = spark.createDataFrame(rows, "b int, i string")
    out = frequent_itemsets(
        df, basket_col="b", item_col="i", min_support=2,
        max_basket=2).collect()
    got = {tuple(x for x in (r["item_a"], r["item_b"], r["item_c"])
                 if x is not None): r["support"] for r in out}
    # basket 99 dropped entirely: supports come from baskets 1, 2 only
    assert got == {("a",): 2, ("b",): 2, ("a", "b"): 2}


def test_association_rules_metrics(spark):
    out = association_rules(
        _df(spark), basket_col="b", item_col="i",
        min_support=2).collect()
    got = {(r["antecedent"], r["consequent"]): r for r in out}
    # N=7 baskets; supp(a)=5, supp(c)=4, supp(a,c)=3
    r = got[("a", "c")]
    assert r["n_both"] == 3 and r["n_ante"] == 5 and r["n_cons"] == 4
    assert r["support_frac"] == 3 / 7.0
    assert r["confidence"] == 3 / 5.0
    assert r["lift"] == (3 * 7) / float(5 * 4)
    # reverse direction present with its own confidence
    assert got[("c", "a")]["confidence"] == 3 / 4.0


def test_association_rules_min_confidence(spark):
    out = association_rules(
        _df(spark), basket_col="b", item_col="i",
        min_support=2, min_confidence=0.74).collect()
    confs = [r["confidence"] for r in out]
    assert confs and all(c >= 0.74 for c in confs)


def test_itemsets_validation(spark):
    df = spark.createDataFrame([(1, "a")], "b int, i string")
    with pytest.raises(ValueError):
        frequent_itemsets(df, basket_col="b", item_col="i",
                          min_support=0)
    with pytest.raises(ValueError):
        frequent_itemsets(df, basket_col="b", item_col="i",
                          min_support=1, max_size=4)
    with pytest.raises(ValueError):
        association_rules(df, basket_col="b", item_col="i",
                          min_support=0)


# ---------------------------------------------------------------- r6


class TestSequentialPatterns:
    def _mine(self, spark, rows, minsup, max_len=3):
        from deltalake_spark.operators.itemsets import (
            sequential_patterns,
        )

        df = spark.createDataFrame(rows, "e long, t long, s string")
        return {(r["pattern"], r["level"]): r["support"]
                for r in sequential_patterns(
                    df, entity_col="e", order_col="t", state_col="s",
                    min_support=minsup, max_len=max_len).collect()}

    def test_hand_sequences(self, spark):
        rows = [
            (1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
            (2, 0, "a"), (2, 1, "b"),
            (3, 0, "b"), (3, 1, "a"), (3, 2, "c"),
        ]
        got = self._mine(spark, rows, minsup=2)
        assert got[("a", 1)] == 3 and got[("b", 1)] == 3
        assert got[("c", 1)] == 2
        assert got[("a>b", 2)] == 2       # entities 1, 2
        assert got[("a>c", 2)] == 2       # entities 1, 3
        assert got[("b>c", 2)] == 2       # entities 1, 3
        assert ("b>a", 2) not in got      # entity 3 only: sup 1 < 2
        assert ("a>b>c", 3) not in got    # entity 1 only: sup 1 < 2
        assert set(got) == {("a", 1), ("b", 1), ("c", 1),
                            ("a>b", 2), ("a>c", 2), ("b>c", 2)}

    def test_matches_bruteforce_subsequences(self, spark):
        import random
        from itertools import product

        rng = random.Random(19)
        streams = {e: [(t, rng.choice("abcd"))
                       for t in range(rng.randint(2, 10))]
                   for e in range(25)}
        rows = [(e, t, s) for e, st in streams.items() for t, s in st]
        minsup = 5
        got = self._mine(spark, rows, minsup)

        def supports(entity, pat):
            seq = [s for _, s in sorted(streams[entity])]
            i = 0
            for sym in pat:
                found = False
                for j in range(i, len(seq)):
                    if seq[j] == sym:
                        i = j + 1
                        found = True
                        break
                if not found:
                    return False
            return True

        want = {}
        for ln in (1, 2, 3):
            for pat in product("abcd", repeat=ln):
                sup = sum(supports(e, pat) for e in streams)
                if sup >= minsup:
                    want[(">".join(pat), ln)] = sup
        assert got == want

    def test_repeated_state_pattern(self, spark):
        rows = [
            (1, 0, "x"), (1, 5, "x"),
            (2, 0, "x"),
            (3, 1, "x"), (3, 2, "x"), (3, 3, "x"),
        ]
        got = self._mine(spark, rows, minsup=2, max_len=2)
        assert got[("x", 1)] == 3
        assert got[("x>x", 2)] == 2      # entities 1 and 3 only

    def test_validation_and_levels(self, spark):
        import pytest as _p
        from deltalake_spark.operators.itemsets import (
            sequential_patterns,
        )

        df = spark.createDataFrame([(1, 0, "a")], "e long, t long, s string")
        with _p.raises(ValueError):
            sequential_patterns(df, entity_col="e", order_col="t",
                                state_col="s", min_support=0)
        with _p.raises(ValueError):
            sequential_patterns(df, entity_col="e", order_col="t",
                                state_col="s", min_support=1, max_len=4)
        only1 = sequential_patterns(
            df, entity_col="e", order_col="t", state_col="s",
            min_support=1, max_len=1).collect()
        assert [(r["pattern"], r["level"], r["support"])
                for r in only1] == [("a", 1, 1)]
