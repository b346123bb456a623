"""Lift / gains table, pinned against a Python reference."""
from __future__ import annotations

import random

import pytest

from deltalake_spark.operators.stats import lift_deciles


def _ref(rows, nb=10):
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    n = len(ranked)
    total_k = sum(y for _, _, y in ranked)
    cells = {}
    for i, (_, _, y) in enumerate(ranked):
        b = (i * nb) // n
        c = cells.setdefault(b, [0, 0])
        c[0] += 1
        c[1] += y
    out, cum = {}, 0
    for b in sorted(cells):
        cn, ck = cells[b]
        cum += ck
        out[b] = (cn, ck, ck / cn, cum, cum / total_k,
                  (ck * n) / (cn * total_k))
    return out


def test_matches_python_reference(spark):
    rng = random.Random(21)
    rows = []
    for i in range(730):
        score = rng.random()
        y = 1 if rng.random() < score * 0.8 else 0  # informative score
        rows.append((i, score, y))
    df = spark.createDataFrame(rows, "rid long, s double, y int")
    got = {r["bucket"]: r for r in lift_deciles(
        df, score_col="s", label_col="y", id_col="rid").collect()}
    want = _ref(rows)
    assert set(got) == set(want)
    for b, (cn, ck, rate, cum, cap, lift) in want.items():
        r = got[b]
        assert (r["n"], r["positives"], r["cum_positives"]) == \
            (cn, ck, cum)
        assert r["rate"] == pytest.approx(rate)
        assert r["capture"] == pytest.approx(cap)
        assert r["lift"] == pytest.approx(lift)
    # an informative score must show descending lift
    assert got[0]["lift"] > 1.5 > got[9]["lift"]
    assert got[9]["capture"] == pytest.approx(1.0)


def test_random_score_is_flat(spark):
    rng = random.Random(8)
    rows = [(i, rng.random(), 1 if rng.random() < 0.3 else 0)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "rid long, s double, y int")
    got = lift_deciles(df, score_col="s", label_col="y",
                       id_col="rid").collect()
    for r in got:
        assert 0.5 < r["lift"] < 1.6  # no systematic lift


def test_bad_buckets_raises(spark):
    df = spark.createDataFrame([(1, 1.0, 1)], "rid long, s double, y int")
    with pytest.raises(ValueError):
        lift_deciles(df, score_col="s", label_col="y", id_col="rid",
                     n_buckets=1)
