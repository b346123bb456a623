"""Deterministic Poisson bootstrap CI, pinned against a full Python
re-derivation (same Knuth hash, same integer threshold ladder, same
nearest-rank order statistics)."""
from __future__ import annotations

import math

import pytest

from deltalake_spark.operators.stats import (
    _poisson1_thresholds,
    bootstrap_mean_ci,
)


def test_thresholds_are_poisson1_cdf():
    th = _poisson1_thresholds()
    e1 = math.exp(-1.0)
    cum, term = 0.0, e1
    for k, t in enumerate(th):
        cum += term
        assert t == int(cum * 4294967296.0)
        term /= (k + 1)
    assert len(th) == 8 and th[-1] / 4294967296.0 > 0.99998


def _ref(rows, b_count=16, seed=7):
    th = _poisson1_thresholds()

    def draw(i, b):
        u = ((i * b_count + b + seed) * 2654435761) % 4294967296
        if b == -1:
            return 1
        for k, t in enumerate(th):
            if u < t:
                return k
        return len(th)

    means = []
    for b in range(b_count):
        swc = sum(draw(i, b) * round(v * 100) for i, v in rows)
        sw = sum(draw(i, b) for i, v in rows)
        means.append((swc / (100.0 * sw), b))
    means.sort()
    lo_rank = (1 * b_count + 40 - 1) // 40
    hi_rank = (39 * b_count + 40 - 1) // 40
    full = sum(round(v * 100) for _, v in rows) / (100.0 * len(rows))
    return full, means[lo_rank - 1][0], means[hi_rank - 1][0]


def test_matches_python_reference(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.uniform(10, 500)) for i in range(400)]
    df = spark.createDataFrame(rows, "rid long, v double")
    got = bootstrap_mean_ci(
        df, id_col="rid", value_col="v", n_resamples=16, seed=7
    ).collect()[0]
    full, lo, hi = _ref(rows)
    assert got["n_resamples"] == 16
    assert got["n_rows"] == len(rows)
    assert got["mean_full"] == pytest.approx(full, abs=1e-12)
    assert got["ci_lo"] == pytest.approx(lo, abs=1e-12)
    assert got["ci_hi"] == pytest.approx(hi, abs=1e-12)
    # the interval brackets the point estimate on well-behaved data
    assert got["ci_lo"] <= got["mean_full"] <= got["ci_hi"]


def test_deterministic_across_partitionings(spark):
    rows = [(i, float(i % 97) + 0.25) for i in range(500)]
    df1 = spark.createDataFrame(rows, "rid long, v double").coalesce(1)
    df8 = spark.createDataFrame(rows, "rid long, v double").repartition(8)
    a = bootstrap_mean_ci(df1, id_col="rid", value_col="v",
                          n_resamples=8).collect()[0]
    b = bootstrap_mean_ci(df8, id_col="rid", value_col="v",
                          n_resamples=8).collect()[0]
    assert tuple(a) == tuple(b)


def test_too_few_resamples_raises(spark):
    df = spark.createDataFrame([(1, 1.0)], "rid long, v double")
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, id_col="rid", value_col="v", n_resamples=2)
