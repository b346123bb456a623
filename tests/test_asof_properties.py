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


def naive_nearest(left, right, tol):
    """pandas merge_asof(direction='nearest') semantics: closest
    |rt - t| within tolerance; equidistant ties prefer backward; among
    equal rt the backward pick is the 'last' right row (here (key,
    time) is unique so that case collapses)."""
    out = {}
    for i, (k, t) in enumerate(left):
        best = None  # (abs_gap, prefer_backward_rank, rt)
        for (rk, rt) in right:
            if rk != k:
                continue
            gap = abs(rt - t)
            if tol is not None and gap > tol:
                continue
            # backward candidates (rt <= t) win equidistant ties
            rank = 0 if rt <= t else 1
            key = (gap, rank)
            if best is None or key < (best[0], best[1]):
                best = (gap, rank, rt)
        out[i] = None if best is None else best[2]
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=datasets())
def test_asof_nearest_matches_naive(spark, data):
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
                           tolerance=tol,
                           direction="nearest").collect()
    }
    want = naive_nearest(left, right if right else [("zzz", -1)], tol)
    assert got == want, (left, right, tol)


def test_asof_nearest_pandas_tie_parity(spark):
    """The two tie rules pinned directly against pandas: equidistant
    -> backward; exact-equal right times -> the LAST right row."""
    import pandas as pd

    left = pd.DataFrame({"k": ["a", "a"], "t": [5, 9]})
    right = pd.DataFrame({"k": ["a", "a", "a", "a"],
                          "t": [3, 7, 9, 9],
                          "v": [1.0, 2.0, 3.0, 4.0]})
    want = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                         on="t", by="k", direction="nearest")
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = {r["t"]: r["v_asof"] for r in asof_join(
        ldf, rdf, on="k", left_time="t", right_time="t",
        right_cols=["v"], direction="nearest").collect()}
    for _, row in want.iterrows():
        assert got[row["t"]] == row["v"], dict(row)
