"""Cochran-Mantel-Haenszel stratified association test, pinned against
a Python reference; planted effect detected, null quiet, degenerate
strata excluded."""
from __future__ import annotations

import random

import pytest

from deltalake_spark.operators.stats import cmh_test


def _ref(rows):
    strata = {}
    for s, e, o in rows:
        k = strata.setdefault(s, [0, 0, 0, 0])
        k[0 if (e and o) else 1 if (e and not o) else
          2 if o else 3] += 1
    keep = []
    for s in sorted(strata):
        a, b, c, d = strata[s]
        n = a + b + c + d
        if n < 2 or not (a + b) or not (c + d) or not (a + c) \
                or not (b + d):
            continue
        keep.append((s, a, b, c, d, n))
    sum_a = sum_e = sum_v = ad = bc = 0.0
    for s, a, b, c, d, n in keep:
        r1, r2, c1, c2 = float(a + b), float(c + d), float(a + c), \
            float(b + d)
        sum_a += float(a)
        sum_e += r1 * c1 / n
        sum_v += r1 * r2 * c1 * c2 / (float(n) * n * (n - 1))
        ad += float(a) * d / n
        bc += float(b) * c / n
    chi2 = (abs(sum_a - sum_e) - 0.5) ** 2 / sum_v
    return len(keep), int(sum_a), sum_e, sum_v, chi2, ad / bc


def _gen(effect: float, seed: int = 5, strata: int = 6, n: int = 250):
    rng = random.Random(seed)
    rows = []
    for k in range(strata):
        base = 0.15 + 0.06 * k
        for _ in range(n):
            e = rng.random() < 0.5
            rows.append((k, e, rng.random() < base + (effect if e
                                                      else 0.0)))
    return rows


def test_matches_python_reference(spark):
    rows = _gen(0.08)
    df = spark.createDataFrame(rows, "s long, e boolean, o boolean")
    got = cmh_test(df, stratum_col="s", exposure_col="e",
                   outcome_col="o").collect()[0]
    ns, sa, se, sv, chi2, orm = _ref(rows)
    assert got["n_strata"] == ns and got["sum_a"] == sa
    assert got["sum_e"] == pytest.approx(se, rel=1e-12)
    assert got["sum_v"] == pytest.approx(sv, rel=1e-12)
    assert got["chi2_cmh"] == pytest.approx(chi2, rel=1e-12)
    assert got["or_mh"] == pytest.approx(orm, rel=1e-12)
    assert got["chi2_cmh"] > 6.63 and got["or_mh"] > 1.2  # detected


def test_null_is_quiet(spark):
    rows = _gen(0.0, seed=11)
    df = spark.createDataFrame(rows, "s long, e boolean, o boolean")
    got = cmh_test(df, stratum_col="s", exposure_col="e",
                   outcome_col="o").collect()[0]
    assert got["chi2_cmh"] < 3.84  # ~alpha = 0.05 bar, null holds


def test_degenerate_strata_excluded(spark):
    rows = _gen(0.08, seed=3, strata=4)
    # stratum 9: everyone exposed (c+d = 0) -> zero evidence, excluded
    rows += [(9, True, bool(i % 2)) for i in range(40)]
    # stratum 8: single row (n < 2) -> excluded
    rows += [(8, True, True)]
    df = spark.createDataFrame(rows, "s long, e boolean, o boolean")
    got = cmh_test(df, stratum_col="s", exposure_col="e",
                   outcome_col="o").collect()[0]
    assert got["n_strata"] == 4
    ns, sa, se, sv, chi2, orm = _ref(rows)
    assert got["chi2_cmh"] == pytest.approx(chi2, rel=1e-12)
