"""Split-conformal prediction intervals, pinned against a full Python
re-derivation (hash split, integer-moment OLS, nearest-rank q_hat,
coverage count) and the marginal coverage guarantee itself."""
from __future__ import annotations

import random

import pytest

from deltalake_spark.operators.stats import split_conformal_interval


def _ref(rows, alpha=(1, 10), seed=11):
    a_num, a_den = alpha

    def split(i):
        u = ((i + seed) * 2654435761) % 4294967296
        if u < 2147483648:
            return "train"
        return "cal" if u < 3221225472 else "test"

    tr = [(i, x, y) for i, x, y in rows if split(i) == "train"]
    cal = [(i, x, y) for i, x, y in rows if split(i) == "cal"]
    te = [(i, x, y) for i, x, y in rows if split(i) == "test"]
    xs = [round(x) for _, x, _ in tr]
    ys = [round(y * 100) for _, _, y in tr]
    n = len(tr)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    intercept = (float(sy) - slope * float(sx)) / float(n)

    def resid(i, x, y):
        return abs(round(y * 100) - (intercept + slope * round(x)))

    rs = sorted((resid(*r), r[0]) for r in cal)
    rank = min(((len(cal) + 1) * (a_den - a_num) + a_den - 1) // a_den,
               len(cal))
    q = rs[rank - 1][0]
    ncov = sum(1 for r in te if resid(*r) <= q)
    return (len(tr), len(cal), len(te), slope, intercept, q, ncov,
            ncov / len(te))


@pytest.fixture(scope="module")
def linear_rows():
    rng = random.Random(17)
    return [(i, float(rng.randint(1, 50)), 0.0) for i in range(900)]


def test_matches_python_reference(spark, linear_rows):
    rng = random.Random(23)
    rows = [(i, x, 40.0 * x + rng.gauss(0, 25))
            for i, x, _ in linear_rows]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    got = split_conformal_interval(
        df, id_col="rid", x_col="x", y_col="y").collect()[0]
    want = _ref(rows)
    assert (got["n_train"], got["n_cal"], got["n_test"]) == want[:3]
    assert got["slope"] == pytest.approx(want[3], rel=1e-14)
    assert got["intercept"] == pytest.approx(want[4], rel=1e-14)
    assert got["q_hat_cents"] == pytest.approx(want[5], rel=1e-12)
    assert got["n_covered"] == want[6]
    assert got["coverage"] == pytest.approx(want[7])


def test_coverage_guarantee_holds(spark):
    # iid noise -> marginal coverage ~ 1 - alpha; CONDITIONAL on one
    # calibration split it fluctuates like Beta(rank, n_cal+1-rank)
    # plus test-sampling noise (~0.03 sd each here), so bound loosely:
    # a broken q_hat (off-by-one rank, wrong residual sign, unsorted
    # ties) lands far outside [0.70, 0.92] on this size
    rng = random.Random(41)
    rows = [(i, float(rng.randint(1, 100)), 0.0) for i in range(1200)]
    rows = [(i, x, 5.0 * x + rng.gauss(0, 10)) for i, x, _ in rows]
    df = spark.createDataFrame(rows, "rid long, x double, y double")
    got = split_conformal_interval(
        df, id_col="rid", x_col="x", y_col="y", alpha=(1, 5)
    ).collect()[0]
    assert 0.70 <= got["coverage"] <= 0.92


def test_degenerate_and_bad_alpha_raise(spark):
    df = spark.createDataFrame(
        [(i, 7.0, float(i)) for i in range(100)],
        "rid long, x double, y double")
    with pytest.raises(ValueError, match="var"):
        split_conformal_interval(df, id_col="rid", x_col="x", y_col="y")
    with pytest.raises(ValueError, match="alpha"):
        split_conformal_interval(
            df, id_col="rid", x_col="x", y_col="y", alpha=(3, 2))
