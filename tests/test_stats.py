"""Unit tests for operators/stats.py — closed-form statistical
operators checked against hand-derivable ground truth on tiny frames
(the gate queries cross-check the same algebra against DuckDB at
fixture scale)."""

import math

import pytest

from deltalake_spark.operators.stats import (
    chi_square,
    entropy_stats,
    gini_concentration,
    linear_regression,
    pareto_coverage,
    welch_ttest,
    winsorized_stats,
)


def test_linear_regression_exact_line(spark):
    rows = [("g", float(x), 2.0 * x + 1.0) for x in range(10)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = linear_regression(
        df, x_col="x", y_col="y", group_cols=["grp"]).collect()[0]
    assert out["n"] == 10
    assert out["slope"] == pytest.approx(2.0)
    assert out["intercept"] == pytest.approx(1.0)
    assert out["r2"] == pytest.approx(1.0)


def test_linear_regression_degenerate_x_is_null(spark):
    df = spark.createDataFrame(
        [("g", 5.0, 1.0), ("g", 5.0, 2.0)],
        "grp string, x double, y double")
    out = linear_regression(
        df, x_col="x", y_col="y", group_cols=["grp"]).collect()[0]
    assert out["slope"] is None and out["r2"] is None


def test_chi_square_independent_uniform_is_zero(spark):
    # perfectly independent 2x2 with equal cell counts
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square(df, col_a="a", col_b="b").collect()[0]
    assert out["chi2"] == pytest.approx(0.0)
    assert out["dof"] == 1
    assert out["n"] == 20


def test_chi_square_hand_computed(spark):
    # cells: (x,u)=30 (x,v)=10 (y,u)=10 (y,v)=30; n=80
    # marginals 40/40 each; expected 20 everywhere; chi2 = 4*100/20 = 20
    rows = (
        [("x", "u")] * 30 + [("x", "v")] * 10
        + [("y", "u")] * 10 + [("y", "v")] * 30
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi_square(df, col_a="a", col_b="b").collect()[0]
    assert out["chi2"] == pytest.approx(20.0)
    assert out["cramers_v"] == pytest.approx(math.sqrt(20.0 / 80.0))


def test_entropy_independent_and_dependent(spark):
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(7)],
        "a string, b string")
    out = entropy_stats(ind, col_a="a", col_b="b").collect()[0]
    ln2 = math.log(2.0)
    assert out["h_a"] == pytest.approx(ln2)
    assert out["h_b"] == pytest.approx(ln2)
    assert out["mi"] == pytest.approx(0.0, abs=1e-12)

    dep = spark.createDataFrame(
        [("x", "u")] * 9 + [("y", "v")] * 9, "a string, b string")
    out = entropy_stats(dep, col_a="a", col_b="b").collect()[0]
    assert out["h_ab"] == pytest.approx(ln2)
    assert out["mi"] == pytest.approx(ln2)


def test_gini_uniform_zero_and_extreme(spark):
    uniform = spark.createDataFrame(
        [(k, 10.0) for k in range(8)], "k long, v double")
    out = gini_concentration(
        uniform, key_col="k", value_col="v").collect()[0]
    assert out["gini"] == pytest.approx(0.0, abs=1e-12)
    assert out["hhi"] == pytest.approx(1.0 / 8)

    # all mass on one key of n=4: G = (n-1)/n
    skewed = spark.createDataFrame(
        [(0, 0.0), (1, 0.0), (2, 0.0), (3, 100.0)], "k long, v double")
    out = gini_concentration(
        skewed, key_col="k", value_col="v").collect()[0]
    assert out["gini"] == pytest.approx(0.75)
    assert out["hhi"] == pytest.approx(1.0)


def test_pareto_coverage_hand_case(spark):
    # values 50, 30, 15, 5 → cum shares .5, .8, .95, 1.0
    df = spark.createDataFrame(
        [(0, 50.0), (1, 30.0), (2, 15.0), (3, 5.0)], "k long, v double")
    out = pareto_coverage(
        df, key_col="k", value_col="v", thresholds=[0.5, 0.8, 0.99])
    got = {r["threshold"]: r["keys_to_cover"] for r in out.collect()}
    assert got == {0.5: 1, 0.8: 2, 0.99: 4}


def test_welch_identical_groups_t_zero(spark):
    rows = [("a", float(v)) for v in (1, 2, 3, 4)]
    rows += [("b", float(v)) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = welch_ttest(df, group_col="g", value_col="v",
                      group_a="a", group_b="b").collect()[0]
    assert out["t_stat"] == pytest.approx(0.0)
    # equal n and s² → Satterthwaite dof = 2(n-1)
    assert out["dof"] == pytest.approx(6.0)


def test_welch_hand_computed(spark):
    a, b = [1.0, 2.0, 3.0], [2.0, 4.0, 6.0, 8.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    out = welch_ttest(df, group_col="g", value_col="v",
                      group_a="a", group_b="b").collect()[0]
    ma, mb = sum(a) / 3, sum(b) / 4
    va = sum((x - ma) ** 2 for x in a) / 2
    vb = sum((x - mb) ** 2 for x in b) / 3
    sa, sb = va / 3, vb / 4
    t = (ma - mb) / math.sqrt(sa + sb)
    dof = (sa + sb) ** 2 / (sa * sa / 2 + sb * sb / 3)
    assert out["t_stat"] == pytest.approx(t)
    assert out["dof"] == pytest.approx(dof)


def test_winsorized_clamps_exact_percentiles(spark):
    # 0..100: p10 = 10.0, p90 = 90.0 exactly (linear interpolation on
    # 101 evenly spaced points)
    df = spark.createDataFrame(
        [(float(v),) for v in range(101)], "v double")
    out = winsorized_stats(
        df, value_col="v", lower=0.10, upper=0.90).collect()[0]
    assert out["n"] == 101
    assert out["raw_mean"] == pytest.approx(50.0)
    # clamped: 10 values -> 10.0, 10 values -> 90.0, rest unchanged
    expect = (sum(range(10, 91)) + 10 * 10.0 + 10 * 90.0) / 101
    assert out["winsorized_mean"] == pytest.approx(expect)
    assert out["n_clipped_low"] == 10
    assert out["n_clipped_high"] == 10


def test_winsorized_grouped_matches_ungrouped(spark):
    rows = [("g1", float(v)) for v in range(101)]
    rows += [("g2", float(v * 2)) for v in range(101)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in winsorized_stats(
            df, value_col="v", lower=0.10, upper=0.90,
            group_cols=["g"]).collect()
    }
    assert out["g1"]["n_clipped_low"] == 10
    assert out["g2"]["winsorized_mean"] == pytest.approx(
        2 * out["g1"]["winsorized_mean"])

# ---------------------------------------------------------------------------
# roc_auc


def _auc_brute(pairs):
    """O(n²) reference: P(score_pos > score_neg) + ½P(tie)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0
               for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_roc_auc_matches_brute_force_with_ties(spark):
    import random

    from deltalake_spark.operators.stats import roc_auc

    rng = random.Random(13)
    # heavy ties: scores are small ints; positives skew higher
    pairs = [(rng.randrange(8) + (2 if rng.random() < 0.4 else 0), y)
             for y in [rng.randrange(2) for _ in range(300)]]
    pairs = [(s + (2 * y if rng.random() < 0.5 else 0), y)
             for (s, _), y in zip(pairs, [p[1] for p in pairs])]
    df = spark.createDataFrame(pairs, "score long, y long").repartition(7)
    row = roc_auc(df, score_col="score", label_col="y").collect()[0]
    want = _auc_brute(pairs)
    n_pos = sum(1 for _, y in pairs if y == 1)
    n_neg = len(pairs) - n_pos
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert row["u2"] == round(want * 2 * n_pos * n_neg)
    assert abs(row["auc"] - want) < 1e-12


def test_roc_auc_perfect_and_random_separation(spark):
    from deltalake_spark.operators.stats import roc_auc

    perfect = [(i + 100, 1) for i in range(20)] + [(i, 0) for i in range(20)]
    allties = [(5, 1)] * 10 + [(5, 0)] * 10
    df = spark.createDataFrame(
        [("p", s, y) for s, y in perfect] + [("t", s, y) for s, y in allties],
        "g string, score long, y long")
    got = {r["g"]: r["auc"]
           for r in roc_auc(df, score_col="score", label_col="y",
                            group_cols=["g"]).collect()}
    assert got["p"] == 1.0
    assert got["t"] == 0.5


def test_roc_auc_degenerate_single_class(spark):
    from deltalake_spark.operators.stats import roc_auc

    df = spark.createDataFrame([(1, 1), (2, 1)], "score long, y long")
    row = roc_auc(df, score_col="score", label_col="y").collect()[0]
    assert row["n_neg"] == 0 and row["auc"] is None


# ---------------------------------------------------------------------------
# cohens_kappa


def _kappa_brute(pairs):
    from collections import Counter

    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ra, cb = Counter(a for a, _ in pairs), Counter(b for _, b in pairs)
    pe = sum(ra[k] * cb.get(k, 0) for k in ra)
    if n * n == pe:
        return None
    return float(n * agree - pe) / (n * n - pe)


def test_kappa_matches_brute_force(spark):
    import random

    from deltalake_spark.operators.stats import cohens_kappa

    rng = random.Random(17)
    labels = "xyz"
    pairs = []
    for _ in range(400):
        a = rng.choice(labels)
        # annotator b agrees 60% of the time, else random
        b = a if rng.random() < 0.6 else rng.choice(labels)
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a string, b string").repartition(9)
    row = cohens_kappa(df, col_a="a", col_b="b").collect()[0]
    want = _kappa_brute(pairs)
    assert abs(row["kappa"] - want) < 1e-15
    assert row["n"] == 400
    assert row["n_agree"] == sum(1 for a, b in pairs if a == b)


def test_kappa_reference_points(spark):
    from deltalake_spark.operators.stats import cohens_kappa

    # perfect agreement -> 1; independent-looking split -> 0;
    # systematic disagreement -> negative
    data = (
        [("p", "u", "u")] * 5 + [("p", "v", "v")] * 5
        + [("z", "u", "u"), ("z", "u", "v"), ("z", "v", "u"),
           ("z", "v", "v")]
        + [("m", "u", "v")] * 5 + [("m", "v", "u")] * 5
    )
    df = spark.createDataFrame(data, "g string, a string, b string")
    got = {r["g"]: r["kappa"]
           for r in cohens_kappa(df, col_a="a", col_b="b",
                                 group_cols=["g"]).collect()}
    assert got["p"] == 1.0
    assert got["z"] == 0.0
    assert got["m"] == -1.0


def test_kappa_degenerate_constant_annotators(spark):
    from deltalake_spark.operators.stats import cohens_kappa

    df = spark.createDataFrame([("u", "u")] * 4, "a string, b string")
    row = cohens_kappa(df, col_a="a", col_b="b").collect()[0]
    assert row["kappa"] is None and row["n_agree"] == 4


def test_kappa_disjoint_label_sets(spark):
    from deltalake_spark.operators.stats import cohens_kappa

    # no shared labels: agree=0, pe=0 -> kappa = 0/n² = 0
    df = spark.createDataFrame([("u", "x"), ("v", "y")],
                               "a string, b string")
    row = cohens_kappa(df, col_a="a", col_b="b").collect()[0]
    assert row["pe_pairs"] == 0 and row["kappa"] == 0.0


# ---------------------------------------------------------------------------
# target_encode


def test_target_encode_matches_hand_math(spark):
    from deltalake_spark.operators.stats import target_encode

    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 1 + [("c", 0)] * 5
    df = spark.createDataFrame(rows, "cat string, y long").repartition(4)
    out = {r["category"]: r for r in
           target_encode(df, cat_col="cat", label_col="y",
                         smoothing=10.0).collect()}
    prior = 9 / 16
    for cat, n, sy in [("a", 10, 8), ("b", 1, 1), ("c", 5, 0)]:
        r = out[cat]
        assert (r["n"], r["sum_y"]) == (n, sy)
        assert r["encoded"] == (float(sy) + 10.0 * prior) / (n + 10.0)
    # shrinkage: the 1-sample category sits near the prior, the
    # 10-sample one pulls away toward its own mean
    assert abs(out["b"]["encoded"] - prior) < abs(8 / 10 - prior) / 2
    assert out["a"]["encoded"] > prior > out["c"]["encoded"]


def test_target_encode_infinite_smoothing_is_prior(spark):
    from deltalake_spark.operators.stats import target_encode

    rows = [("a", 1), ("a", 0), ("b", 1)]
    df = spark.createDataFrame(rows, "cat string, y long")
    out = target_encode(df, cat_col="cat", label_col="y",
                        smoothing=1e12).collect()
    for r in out:
        assert abs(r["encoded"] - 2 / 3) < 1e-9


# --------------------------------------------------------- distribution drift

def test_distribution_drift_hand_values(spark):
    from deltalake_spark.operators.stats import distribution_drift
    rows = ([("base", "a")] * 6 + [("base", "b")] * 4
            + [("curr", "a")] * 2 + [("curr", "b")] * 6
            + [("curr", "c")] * 2 + [("other", "a")] * 9)
    df = spark.createDataFrame(rows, "period string, bin string")
    out = {r["bin"]: r for r in distribution_drift(
        df, split_col="period", bin_col="bin",
        base_value="base", curr_value="curr").collect()}
    # base: a .6 b .4 c 0; curr: a .2 b .6 c .2; "other" ignored
    assert out["a"]["n_base"] == 6 and out["a"]["n_curr"] == 2
    assert out["a"]["p_base"] == 0.6 and out["a"]["p_curr"] == 0.2
    assert out["a"]["tvd_contrib"] == abs(6 * 10 - 2 * 10) / 200.0
    assert out["c"]["n_base"] == 0 and out["c"]["p_curr"] == 0.2
    tvd = sum(r["tvd_contrib"] for r in out.values())
    assert tvd == pytest.approx(0.4)  # (|.4| + |.2| + |.2|) / 2


def test_distribution_drift_identical_is_zero(spark):
    from deltalake_spark.operators.stats import distribution_drift
    rows = [("base", "x")] * 3 + [("curr", "x")] * 5
    df = spark.createDataFrame(rows, "period string, bin string")
    out = distribution_drift(
        df, split_col="period", bin_col="bin",
        base_value="base", curr_value="curr").collect()
    assert len(out) == 1 and out[0]["tvd_contrib"] == 0.0


def test_distribution_drift_empty_slice_raises(spark):
    from deltalake_spark.operators.stats import distribution_drift
    df = spark.createDataFrame([("base", "x")], "period string, bin string")
    with pytest.raises(ValueError):
        distribution_drift(df, split_col="period", bin_col="bin",
                           base_value="base", curr_value="missing")


# ------------------------------------------------------------------- Benford

def test_benford_digit_counts_and_chi2(spark):
    from deltalake_spark.operators.stats import (
        _BENFORD_P, benford_digit_test)
    # values with known first digits of their cent amounts
    vals = [1.00, 1.50, 19.99, 2.00, 25.0, 3.33, 0.094]  # digits:
    # 100->1, 150->1, 1999->1, 200->2, 2500->2, 333->3, 9->9
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r for r in
           benford_digit_test(df, value_col="v").collect()}
    assert {d: out[d]["n_obs"] for d in out} == {1: 3, 2: 2, 3: 1, 9: 1}
    r = out[1]
    assert r["n_total"] == 7
    assert r["expected"] == 7 * _BENFORD_P[0]
    dev = 3 - 7 * _BENFORD_P[0]
    assert r["chi2_term"] == pytest.approx(dev * dev / (7 * _BENFORD_P[0]))


def test_benford_excludes_nonpositive_and_groups(spark):
    from deltalake_spark.operators.stats import benford_digit_test
    rows = [("g1", 1.0), ("g1", -5.0), ("g1", 0.0), ("g1", None),
            ("g2", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = benford_digit_test(
        df, value_col="v", group_cols=["g"]).collect()
    got = {(r["g"], r["digit"]): (r["n_obs"], r["n_total"]) for r in out}
    assert got == {("g1", 1): (1, 1), ("g2", 7): (1, 1)}


# -------------------------------------------------------- proportion z-test

def test_proportion_ztest_hand_values(spark):
    import math
    from deltalake_spark.operators.stats import proportion_ztest
    rows = ([("g", "A", 1)] * 30 + [("g", "A", 0)] * 70
            + [("g", "B", 1)] * 50 + [("g", "B", 0)] * 50)
    df = spark.createDataFrame(rows, "g string, v string, s int")
    out = proportion_ztest(
        df, group_cols=["g"], variant_col="v", success_col="s",
        variant_a="A", variant_b="B").collect()[0]
    assert (out["n_a"], out["x_a"], out["n_b"], out["x_b"]) == \
        (100, 30, 100, 50)
    assert out["p_a"] == 0.3 and out["p_b"] == 0.5
    pool = 80 / 200.0
    se = math.sqrt(pool * (1.0 - pool) * (1.0 / 100 + 1.0 / 100))
    assert out["z"] == pytest.approx((0.3 - 0.5) / se)


def test_proportion_ztest_degenerate_null(spark):
    from deltalake_spark.operators.stats import proportion_ztest
    # missing variant B -> null z; all-success pooled rate 1 -> null z
    rows = [("g1", "A", 1), ("g1", "A", 0),
            ("g2", "A", 1), ("g2", "B", 1)]
    df = spark.createDataFrame(rows, "g string, v string, s int")
    out = {r["g"]: r for r in proportion_ztest(
        df, group_cols=["g"], variant_col="v", success_col="s",
        variant_a="A", variant_b="B").collect()}
    assert out["g1"]["z"] is None and out["g1"]["p_b"] is None
    assert out["g2"]["z"] is None  # zero pooled variance


# ------------------------------------------------------------- MAD outliers

def test_mad_outliers_hand_values(spark):
    from deltalake_spark.operators.stats import mad_outliers
    # sorted {9,10,11,12,100}: median 11; deviations {2,1,0,1,89}
    # -> MAD = 1
    vals = [10, 9, 11, 12, 100]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, x int")
    out = mad_outliers(
        df, group_cols=["g"], value_col="x", k=3.0).collect()[0]
    assert out["n"] == 5 and out["median"] == 11.0 and out["mad"] == 1.0
    assert out["n_outliers"] == 1  # only 100 (|89| > 3)


def test_mad_outliers_even_count_interpolates(spark):
    from deltalake_spark.operators.stats import mad_outliers
    df = spark.createDataFrame([("g", v) for v in [1, 2, 3, 4]],
                               "g string, x int")
    out = mad_outliers(
        df, group_cols=["g"], value_col="x").collect()[0]
    assert out["median"] == 2.5
    # deviations {1.5, 0.5, 0.5, 1.5} -> median = 1.0
    assert out["mad"] == 1.0 and out["n_outliers"] == 0


def test_mad_outliers_zero_mad_degenerate(spark):
    from deltalake_spark.operators.stats import mad_outliers
    df = spark.createDataFrame(
        [("g", v) for v in [5, 5, 5, 5, 9]], "g string, x int")
    out = mad_outliers(
        df, group_cols=["g"], value_col="x").collect()[0]
    assert out["mad"] == 0.0
    assert out["n_outliers"] == 1  # anything != median


# ---------------------------------------------------------------- r6 ops


def test_best_gini_split_separable(spark):
    from deltalake_spark.operators.stats import best_gini_split

    # label is exactly x >= 10: the perfect split is at v=9 (x<=9 left)
    rows = [(float(x), 1 if x >= 10 else 0) for x in range(20)]
    r = best_gini_split(
        spark.createDataFrame(rows, "x double, y int"),
        label_col="y", feature_cols=["x"]).collect()[0]
    assert r["feature"] == "x"
    assert r["threshold"] == 9.0
    assert r["n"] == 20 and r["n_pos"] == 10
    assert r["n_left"] == 10 and r["pos_left"] == 0
    # pure split: score = (100+0)/10*2 scaled = 20 * 1e12
    assert r["score_units"] == 20 * 10 ** 12


def test_best_gini_split_matches_python_argmax(spark):
    import random

    from deltalake_spark.operators.stats import best_gini_split

    rng = random.Random(3)
    rows = [(float(rng.randint(0, 15)), rng.randint(0, 1))
            for _ in range(300)]
    got = {r["feature"]: r for r in best_gini_split(
        spark.createDataFrame(rows, "x double, y int"),
        label_col="y", feature_cols=["x"]).collect()}

    from collections import Counter
    cnt, pos = Counter(), Counter()
    for x, y in rows:
        cnt[x] += 1
        pos[x] += y
    vals = sorted(cnt)
    n = len(rows)
    ptot = sum(pos.values())
    best = None
    nL = pL = 0
    for v in vals[:-1]:
        nL += cnt[v]
        pL += pos[v]
        nR, pR = n - nL, ptot - pL
        qL, qR = nL - pL, nR - pR
        a = 10 ** 12 * ((pL * pL + qL * qL) * nR
                        + (pR * pR + qR * qR) * nL)
        sc = a // (nL * nR)
        cand = (sc, -v)
        if best is None or cand > best:
            best, bv, bnl, bpl = cand, v, nL, pL
    r = got["x"]
    assert (r["threshold"], r["score_units"], r["n_left"],
            r["pos_left"]) == (bv, best[0], bnl, bpl)


def test_best_gini_split_multi_feature_and_validation(spark):
    import pytest as _p

    from deltalake_spark.operators.stats import best_gini_split

    rows = [(float(x), float(x % 3), 1 if x >= 5 else 0)
            for x in range(10)]
    df = spark.createDataFrame(rows, "a double, b double, y int")
    out = {r["feature"]: r for r in best_gini_split(
        df, label_col="y", feature_cols=["a", "b"]).collect()}
    assert set(out) == {"a", "b"}
    # a separates perfectly, b cannot
    assert out["a"]["score_units"] > out["b"]["score_units"]
    with _p.raises(ValueError):
        best_gini_split(df, label_col="y", feature_cols=["a"],
                        score_scale=0)


def test_quantile_normalize_equal_groups(spark):
    from deltalake_spark.operators.stats import quantile_normalize

    rows = [("a", 0, 10), ("a", 1, 30), ("a", 2, 20),
            ("b", 0, 100), ("b", 1, 200), ("b", 2, 300)]
    out = quantile_normalize(
        spark.createDataFrame(rows, "g string, i long, v long"),
        group_col="g", order_col="i", value_col="v").collect()
    got = {(r["g"], r["i"]): (r["rank"], r["qnorm"], r["n_groups"])
           for r in out}
    # rank means: (10+100)/2=55, (20+200)/2=110, (30+300)/2=165
    assert got[("a", 0)] == (1, 55.0, 2)
    assert got[("a", 2)] == (2, 110.0, 2)
    assert got[("a", 1)] == (3, 165.0, 2)
    assert got[("b", 0)] == (1, 55.0, 2)
    assert got[("b", 2)] == (3, 165.0, 2)
    # both groups now share an identical value distribution
    dist = {}
    for r in out:
        dist.setdefault(r["g"], []).append(r["qnorm"])
    assert sorted(dist["a"]) == sorted(dist["b"])


class TestCupedLift:
    def test_matches_python_moments(self, spark):
        import random

        from deltalake_spark.operators.stats import cuped_lift

        rng = random.Random(21)
        rows = []
        for i in range(400):
            arm = "t" if i % 2 else "c"
            pre = rng.randint(0, 100)
            post = pre + rng.randint(0, 30) + (5 if arm == "t" else 0)
            rows.append((arm, float(pre), float(post)))
        df = spark.createDataFrame(rows, "arm string, pre double, post double")
        r = cuped_lift(df, arm_col="arm", pre_col="pre",
                       post_col="post", control_value="c").collect()[0]

        xs = [x for _, x, _ in rows]
        ys = [y for _, _, y in rows]
        n = len(rows)
        mx = sum(xs) / n
        my = sum(ys) / n
        cxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / n
        vx = sum((a - mx) ** 2 for a in xs) / n
        theta = cxy / vx
        assert abs(r["theta"] - theta) < 1e-9

        def arm_stats(a):
            sub = [(x, y) for arm, x, y in rows if arm == a]
            amx = sum(x for x, _ in sub) / len(sub)
            amy = sum(y for _, y in sub) / len(sub)
            return len(sub), amx, amy

        nt, mxt, myt = arm_stats("t")
        nc, mxc, myc = arm_stats("c")
        assert (r["n_t"], r["n_c"]) == (nt, nc)
        adj_t = myt - theta * (mxt - mx)
        adj_c = myc - theta * (mxc - mx)
        assert abs(r["lift_adj"] - (adj_t - adj_c)) < 1e-9
        assert abs(r["lift_raw"] - (myt - myc)) < 1e-9
        # pre correlates strongly with post -> big variance reduction
        assert r["var_reduction_pct"] > 50

    def test_zero_variance_pre_falls_back_to_raw(self, spark):
        from deltalake_spark.operators.stats import cuped_lift

        rows = [("t", 5.0, 12.0), ("t", 5.0, 14.0),
                ("c", 5.0, 10.0), ("c", 5.0, 11.0)]
        df = spark.createDataFrame(rows, "arm string, pre double, post double")
        r = cuped_lift(df, arm_col="arm", pre_col="pre",
                       post_col="post", control_value="c").collect()[0]
        assert r["theta"] == 0.0
        assert r["lift_adj"] == r["lift_raw"] == 2.5


class TestWeightedPercentile:
    def test_hand_weights(self, spark):
        from deltalake_spark.operators.stats import weighted_percentile

        # values 10(w1) 20(w1) 30(w8): half the mass sits at 30
        rows = [("g", 10, 1), ("g", 20, 1), ("g", 30, 8)]
        df = spark.createDataFrame(rows, "g string, v long, w long")
        out = {(r["q_num"], r["q_den"]): r["value"]
               for r in weighted_percentile(
                   df, group_cols=["g"], value_col="v",
                   weight_col="w").collect()}
        assert out[(1, 4)] == 30   # cum 2/10 < 1/4 until 30
        assert out[(1, 2)] == 30
        assert out[(3, 4)] == 30
        # unweighted median of the VALUES would be 20 — the point

    def test_exact_boundary_crossing(self, spark):
        from deltalake_spark.operators.stats import weighted_percentile

        rows = [("g", 1, 5), ("g", 2, 5)]   # cum at v=1 is exactly 1/2
        df = spark.createDataFrame(rows, "g string, v long, w long")
        out = {(r["q_num"], r["q_den"]): r["value"]
               for r in weighted_percentile(
                   df, group_cols=["g"], value_col="v",
                   weight_col="w", quantiles=[(1, 2), (1, 1)]).collect()}
        assert out[(1, 2)] == 1    # >= is inclusive at the boundary
        assert out[(1, 1)] == 2

    def test_matches_python_reference(self, spark):
        import random

        from deltalake_spark.operators.stats import weighted_percentile

        rng = random.Random(41)
        rows = [("g", rng.randint(0, 50), rng.randint(1, 9))
                for _ in range(300)]
        df = spark.createDataFrame(rows, "g string, v long, w long")
        qs = [(1, 10), (1, 4), (1, 2), (9, 10)]
        got = {(r["q_num"], r["q_den"]): (r["value"], r["total_weight"])
               for r in weighted_percentile(
                   df, group_cols=["g"], value_col="v",
                   weight_col="w", quantiles=qs).collect()}

        from collections import Counter
        wsum = Counter()
        for _, v, w in rows:
            wsum[v] += w
        tot = sum(wsum.values())
        for num, den in qs:
            cum = 0
            for v in sorted(wsum):
                cum += wsum[v]
                if den * cum >= num * tot:
                    assert got[(num, den)] == (v, tot)
                    break
