"""Golden-record survivorship (operators/entity.py)."""

from __future__ import annotations

import pytest

from deltalake_spark.operators.entity import golden_records


def _run(spark, records, pairs, rules, partitions=5):
    df = spark.createDataFrame(
        records, "rid long, name string, bal long, seg string"
    ).repartition(partitions)
    p = spark.createDataFrame(pairs or [(0, 0)], "id_a long, id_b long")
    if not pairs:
        p = p.filter("id_a != id_a")
    out = golden_records(df, p, id_col="rid", rules=rules)
    return {r["entity_id"]: r for r in out.collect()}


RECORDS = [
    (1, "dave", 10, "web"), (2, "david", 30, "app"),
    (3, "davide", 20, "web"),                      # cluster {1,2,3}
    (4, "erin", 99, "app"), (5, "erin b", 5, "app"),  # cluster {4,5}
    (9, "solo", 7, "kiosk"),                       # singleton
]
PAIRS = [(1, 2), (2, 3), (4, 5)]


def test_rules_and_transitive_clustering(spark):
    got = _run(spark, RECORDS, PAIRS, {
        "name": "longest", "bal": "max", "seg": "most_common"})
    assert set(got) == {1, 4, 9}
    e1 = got[1]
    assert e1["n_members"] == 3
    assert e1["name"] == "davide"   # longest
    assert e1["bal"] == 30          # max
    assert e1["seg"] == "web"       # modal (2 web vs 1 app)
    e4 = got[4]
    assert (e4["n_members"], e4["name"], e4["bal"]) == (2, "erin b", 99)
    e9 = got[9]                      # untouched singleton passes through
    assert (e9["n_members"], e9["name"], e9["bal"], e9["seg"]) == \
        (1, "solo", 7, "kiosk")


def test_earliest_and_min_rules_and_mode_tiebreak(spark):
    got = _run(spark, RECORDS, PAIRS, {
        "name": "earliest", "bal": "min", "seg": "most_common"})
    assert got[1]["name"] == "dave"   # lowest-id record's value
    assert got[1]["bal"] == 10
    # cluster {4,5}: seg 'app' x2 -> modal; make a tie cluster too
    tie = _run(spark, [(1, "a", 0, "x"), (2, "b", 0, "y")], [(1, 2)],
               {"seg": "most_common"})
    assert tie[1]["seg"] == "x"       # tie -> lexicographically smallest


def test_longest_tie_breaks_lexicographic(spark):
    got = _run(spark, [(1, "bb", 0, "s"), (2, "aa", 0, "s")], [(1, 2)],
               {"name": "longest"})
    assert got[1]["name"] == "aa"     # equal length -> smallest value


def test_no_pairs_everything_singleton(spark):
    got = _run(spark, RECORDS, [], {"name": "earliest"})
    assert set(got) == {1, 2, 3, 4, 5, 9}
    assert all(r["n_members"] == 1 for r in got.values())


def test_unknown_rule_rejected(spark):
    with pytest.raises(ValueError):
        _run(spark, RECORDS, PAIRS, {"name": "newest"})


def test_partitioning_invariance(spark):
    a = _run(spark, RECORDS, PAIRS,
             {"name": "longest", "seg": "most_common"}, partitions=1)
    b = _run(spark, RECORDS, PAIRS,
             {"name": "longest", "seg": "most_common"}, partitions=11)
    assert {k: tuple(v) for k, v in a.items()} == \
        {k: tuple(v) for k, v in b.items()}
