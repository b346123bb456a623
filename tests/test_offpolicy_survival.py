"""r10 analytics additions pinned against pure-Python references:

- pr_auc: sklearn's threshold-sum average precision re-derived (the
  tie-robust definition over DISTINCT thresholds descending);
- ips_offpolicy: IPS / SNIPS / ESS from logged bandit feedback with
  the integer micro/cent quantization replayed exactly.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.stats import ips_offpolicy, pr_auc


def _ref_average_precision(pairs):
    """Threshold-sum AP over distinct scores descending; pairs =
    [(score, label)]."""
    from collections import defaultdict
    hist = defaultdict(lambda: [0, 0])
    for s, y in pairs:
        hist[s][0] += y
        hist[s][1] += 1 - y
    n_pos = sum(p for p, _ in hist.values())
    tp = fp = 0
    ap = 0.0
    for s in sorted(hist, reverse=True):
        p, q = hist[s]
        tp += p
        fp += q
        ap += (p * tp) / (tp + fp)
    return ap / n_pos


def test_pr_auc_matches_reference_with_ties(spark):
    import random
    rng = random.Random(5)
    pairs = [(rng.randint(0, 20), rng.random() < 0.3 and 1 or 0)
             for _ in range(400)]
    df = spark.createDataFrame(pairs, "s long, y int")
    got = pr_auc(df, score_col="s", label_col="y").collect()[0]
    assert got["n_pos"] == sum(y for _, y in pairs)
    assert got["average_precision"] == pytest.approx(
        round(_ref_average_precision(pairs), 6), abs=1e-9)


def test_pr_auc_perfect_and_degenerate(spark):
    perfect = [(10, 1), (9, 1), (1, 0), (0, 0)]
    df = spark.createDataFrame(perfect, "s long, y int")
    got = pr_auc(df, score_col="s", label_col="y").collect()[0]
    assert got["average_precision"] == 1.0
    onecls = spark.createDataFrame([(1, 1), (2, 1)], "s long, y int")
    assert pr_auc(onecls, score_col="s", label_col="y") \
        .collect()[0]["average_precision"] is None


def test_pr_auc_groups(spark):
    pairs = ([("a", s, y) for s, y in [(3, 1), (2, 0), (1, 1)]]
             + [("b", s, y) for s, y in [(5, 0), (4, 1)]])
    df = spark.createDataFrame(pairs, "g string, s long, y int")
    got = {r["g"]: r["average_precision"]
           for r in pr_auc(df, score_col="s", label_col="y",
                           group_cols=["g"]).collect()}
    assert got["a"] == pytest.approx(round(
        _ref_average_precision([(3, 1), (2, 0), (1, 1)]), 6))
    assert got["b"] == pytest.approx(0.5)


def test_ips_offpolicy_matches_python(spark):
    rows = [
        # (reward, mu, pi)
        (10.0, 0.5, 0.25),
        (2.0, 0.25, 0.5),
        (0.0, 0.25, 0.25),
        (4.0, 0.5, 0.5),
        (1.0, 0.0, 0.5),   # unsupported: excluded + counted
    ]
    df = spark.createDataFrame(rows, "r double, mu double, pi double")
    got = ips_offpolicy(
        df, reward_col="r", logged_prop_col="mu",
        target_prop_col="pi").collect()[0]
    sup = [r for r in rows if r[1] > 0]
    w6 = [round(pi / mu * 1e6) for _, mu, pi in sup]
    rc = [round(r * 100) for r, _, _ in sup]
    swr = sum(a * b for a, b in zip(w6, rc))
    sw = sum(w6)
    sww = sum(a * a for a in w6)
    assert got["n"] == 4 and got["n_unsupported"] == 1
    assert got["sum_w_micro"] == sw
    assert got["ips_value"] == pytest.approx(
        round(swr / (1e8 * 4), 6), abs=1e-12)
    assert got["snips_value"] == pytest.approx(
        round(swr / (100.0 * sw), 6), abs=1e-12)
    assert got["ess"] == pytest.approx(
        round(sw * sw / sww, 6), abs=1e-9)
