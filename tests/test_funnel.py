"""Funnel / cohort retention (operators/funnel.py) vs sequential
Python references."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.funnel import (
    funnel_steps,
    retention_cohorts,
)

_DAY = 86_400_000_000_000


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts long")


def _ref_funnel(rows, steps):
    by_user = {}
    for u, t, ts in rows:
        by_user.setdefault(u, []).append((ts, t))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        prev = None
        stamps = []
        for s in steps:
            nxt = min((ts for ts, t in evs
                       if t == s and (prev is None or ts > prev)),
                      default=None)
            stamps.append(nxt)
            if nxt is None:
                break
            prev = nxt
        if stamps[0] is not None:
            stamps += [None] * (len(steps) - len(stamps))
            out[u] = tuple(stamps)
    return out


def test_funnel_matches_reference(spark):
    rows = [
        # u1 completes all three in order
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # u2: click BEFORE view only → stops at view
        (2, "click", 50), (2, "view", 100),
        # u3: click both before and after view → after one counts,
        # purchase before that click does NOT count
        (3, "click", 10), (3, "view", 20), (3, "purchase", 25),
        (3, "click", 30),
        # u4: never views → excluded entirely
        (4, "click", 10), (4, "purchase", 20),
        # u5: duplicate views, earliest wins
        (5, "view", 500), (5, "view", 100), (5, "click", 200),
    ]
    steps = ["view", "click", "purchase"]
    got = {r["user_id"]: (r["ts_1"], r["ts_2"], r["ts_3"])
           for r in funnel_steps(
               _events_df(spark, rows), steps=steps).collect()}
    assert got == _ref_funnel(rows, steps)
    # spot-check the tricky ones
    assert got[2] == (100, None, None)
    assert got[3] == (20, 30, None)
    assert 4 not in got
    assert got[5] == (100, 200, None)


def test_funnel_single_step_and_empty_steps(spark):
    rows = [(1, "view", 7), (2, "click", 9)]
    out = {r["user_id"]: r["ts_1"] for r in funnel_steps(
        _events_df(spark, rows), steps=["view"]).collect()}
    assert out == {1: 7}
    with pytest.raises(ValueError):
        funnel_steps(_events_df(spark, rows), steps=[])


def test_retention_cohorts(spark):
    rows = [
        # u1 first active period 0; active 0, 1, 3
        (1, "view", 1 * _DAY), (1, "click", 8 * _DAY),
        (1, "view", 22 * _DAY),
        # u2 first active period 1; active 1 only (two events same week)
        (2, "view", 8 * _DAY), (2, "click", 9 * _DAY),
        # u3 first active period 0; active 0
        (3, "purchase", 2 * _DAY),
    ]
    grid = {(r["cohort_period"], r["period_offset"]): r["n_users"]
            for r in retention_cohorts(
                _events_df(spark, rows), period_days=7).collect()}
    assert grid == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1}


# ---------------------------------------------------------------------------
# event_paths


def test_event_paths_hand_values(spark):
    from deltalake_spark.operators.funnel import event_paths
    from pyspark.sql import functions as F

    rows = [
        # user 1: view cart buy (+ a 4th event beyond the cap)
        (1, 10, "view"), (1, 20, "cart"), (1, 30, "buy"), (1, 40, "view"),
        # user 2: same first three
        (2, 5, "view"), (2, 6, "cart"), (2, 7, "buy"),
        # user 3: single event
        (3, 1, "view"),
    ]
    df = spark.createDataFrame(rows, "u long, ts long, et string") \
        .repartition(5)
    out = {(r["path"], r["n_steps"]): r["n"]
           for r in event_paths(df, key_col="u", event_col="et",
                                order_cols=["ts"],
                                max_steps=3).collect()}
    assert out == {("view>cart>buy", 3): 2, ("view", 1): 1}


def test_event_paths_tiebreak_deterministic(spark):
    from deltalake_spark.operators.funnel import event_paths

    # two events share ts; the explicit tiebreaker column decides
    rows = [(1, 10, 1, "a"), (1, 10, 0, "b")]
    df = spark.createDataFrame(rows, "u long, ts long, eid long, et string")
    out = event_paths(df, key_col="u", event_col="et",
                      order_cols=["ts", "eid"], max_steps=5).collect()
    assert out[0]["path"] == "b>a"


def test_event_paths_validation(spark):
    import pytest as _pytest

    from deltalake_spark.operators.funnel import event_paths

    df = spark.createDataFrame([(1, 1, "a")], "u long, ts long, et string")
    with _pytest.raises(ValueError):
        event_paths(df, key_col="u", event_col="et",
                    order_cols=["ts"], max_steps=0)
