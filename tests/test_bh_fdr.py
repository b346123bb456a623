"""Benjamini-Hochberg FDR over per-group proportion z-tests, pinned
against a Python re-derivation of the A&S erf approximation and the
step-up rule; a planted effect must be rejected while nulls survive."""
from __future__ import annotations

import math
import random

import pytest

from deltalake_spark.operators.stats import bh_fdr_ztests


def _sf(z: float) -> float:
    x = z / 1.4142135623730951
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = 1.0 - poly * math.exp(-x * x)
    return (1.0 - erf) / 2.0


def _ref(groups: dict, alpha=(1, 20)):
    nt = sum(n for n, _ in groups.values())
    kt = sum(k for _, k in groups.values())
    p0 = kt / nt
    scored = []
    for g, (n, k) in groups.items():
        z = (k / n - p0) / math.sqrt(p0 * (1 - p0) / n)
        scored.append((2.0 * _sf(abs(z)), g, z, n, k))
    scored.sort(key=lambda r: (r[0], r[1]))
    m = len(scored)
    cut = 0
    for i, (p, *_rest) in enumerate(scored, 1):
        if p * m * alpha[1] <= i * alpha[0]:
            cut = i
    return scored, cut


def test_sf_matches_reference_values():
    # A&S 7.1.26 abs error < 1.5e-7 vs the true normal SF
    for z, want in ((0.0, 0.5), (1.0, 0.15865525), (1.96, 0.02499790),
                    (2.5758, 0.005), (4.0, 3.1671e-05)):
        assert _sf(z) == pytest.approx(want, abs=2e-6)


def test_matches_python_reference(spark):
    rng = random.Random(7)
    rows = []
    groups = {}
    for g in range(12):
        n = rng.randint(50, 200)
        p = 0.2 if g != 5 else 0.55  # planted effect in group 5
        k = sum(1 for _ in range(n) if rng.random() < p)
        groups[g] = (n, k)
        rows += [(g, 1)] * k + [(g, 0)] * (n - k)
    df = spark.createDataFrame(rows, "g long, s int")
    got = {r["g"]: r for r in bh_fdr_ztests(
        df, group_col="g", success_col="s").collect()}
    scored, cut = _ref(groups)
    assert got[scored[0][1]]["p_rank"] == 1
    for p, g, z, n, k in scored:
        r = got[g]
        assert (r["n"], r["successes"]) == (n, k)
        assert r["z"] == pytest.approx(round(z, 6), abs=1e-6)
        assert r["p_value"] == pytest.approx(round(p, 8), abs=1e-8)
        assert r["bh_cutoff_rank"] == cut
        assert r["rejected"] == (r["p_rank"] <= cut)
    # the planted group is rejected; at least some nulls are not
    assert got[5]["rejected"] is True
    assert sum(1 for r in got.values() if not r["rejected"]) >= 8


def test_all_null_rejects_nothing_typically(spark):
    rng = random.Random(3)
    rows = []
    for g in range(10):
        for _ in range(150):
            rows.append((g, 1 if rng.random() < 0.3 else 0))
    df = spark.createDataFrame(rows, "g long, s int")
    got = bh_fdr_ztests(df, group_col="g", success_col="s").collect()
    assert sum(1 for r in got if r["rejected"]) <= 1


def test_bad_alpha_raises(spark):
    df = spark.createDataFrame([(1, 1)], "g long, s int")
    with pytest.raises(ValueError):
        bh_fdr_ztests(df, group_col="g", success_col="s", alpha=(5, 2))
