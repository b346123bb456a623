"""Property-based differential testing of asof_join: the union +
running-last implementation must agree with a naive O(n·m) Python
matcher on random key/time data (ties, duplicate times, missing keys,
tolerance)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deltalake_spark.operators.temporal import asof_join

KEYS = ["a", "b", "c"]
TIMES = list(range(0, 20))


@st.composite
def datasets(draw):
    left = draw(st.lists(
        st.tuples(st.sampled_from(KEYS), st.sampled_from(TIMES)),
        min_size=1, max_size=12))
    right = draw(st.lists(
        st.tuples(st.sampled_from(KEYS), st.sampled_from(TIMES)),
        min_size=0, max_size=12, unique=True))  # unique (key, time)
    tol = draw(st.sampled_from([None, 0, 3, 7]))
    return left, right, tol


def naive_asof(left, right, tol):
    out = {}
    for i, (k, t) in enumerate(left):
        best = None
        for (rk, rt) in right:
            if rk == k and rt <= t and (tol is None or t - rt <= tol):
                if best is None or rt > best:
                    best = rt
        out[i] = best
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=datasets())
def test_asof_matches_naive(spark, data):
    left, right, tol = data
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "lid long, k string, t long",
    )
    rdf = spark.createDataFrame(
        [(k, t, float(t) * 2) for (k, t) in right] or [("zzz", -1, 0.0)],
        "k string, t long, v double",
    )
    got = {
        r["lid"]: r["t_asof"]
        for r in asof_join(ldf, rdf, on="k", left_time="t",
                           right_time="t", right_cols=["v"],
                           tolerance=tol).collect()
    }
    want = naive_asof(left, right if right else [("zzz", -1)], tol)
    assert got == want, (left, right, tol)
