"""Unit tests for operators/analytics.py (cohort retention, RFM) and
stats.ks_two_sample — hand-computed small cases plus a seeded DuckDB
cross-check for KS."""

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from deltalake_spark.operators.analytics import (
    cohort_retention,
    rfm_segments,
)
from deltalake_spark.operators.stats import ks_two_sample


def test_cohort_retention_hand_case(spark):
    # users: a starts wk0 active wk0,1,3; b starts wk0 active wk0;
    # c starts wk1 active wk1,2. Duplicate activity rows must not
    # inflate counts.
    rows = [
        ("a", 0), ("a", 0), ("a", 1), ("a", 3),
        ("b", 0),
        ("c", 1), ("c", 2), ("c", 2),
    ]
    df = spark.createDataFrame(rows, "u string, wk long")
    out = cohort_retention(
        df, entity_col="u", period_col="wk", max_offset=8)
    got = {(r.cohort_p, r.offset): (r.active, r.cohort_size,
                                    r.retention_pct)
           for r in out.collect()}
    assert got[(0, 0)] == (2, 2, 100.0)
    assert got[(0, 1)] == (1, 2, 50.0)
    assert got[(0, 3)] == (1, 2, 50.0)
    assert got[(1, 0)] == (1, 1, 100.0)
    assert got[(1, 1)] == (1, 1, 100.0)
    assert (0, 2) not in got


def test_cohort_retention_offset_cap(spark):
    rows = [("u", 0), ("u", 50)]
    df = spark.createDataFrame(rows, "u string, wk long")
    out = cohort_retention(
        df, entity_col="u", period_col="wk", max_offset=8).collect()
    assert {r.offset for r in out} == {0}


def test_rfm_segments_hand_case(spark):
    # 5 customers, 1 order each, distinct metrics => with buckets=5
    # every customer is its own quintile on each dimension.
    rows = [
        (1, "1998-01-05", 10.0),   # oldest, cheapest
        (2, "1998-03-01", 20.0),
        (3, "1998-05-01", 30.0),
        (4, "1998-06-01", 40.0),
        (5, "1998-07-30", 50.0),   # most recent, priciest
    ]
    df = spark.createDataFrame(
        rows, "c long, d string, amt double"
    ).select("c", F.col("d").cast("date").alias("d"), "amt")
    out = rfm_segments(
        df, entity_col="c", date_col="d", amount_col="amt",
        asof="1998-08-02", buckets=5).collect()
    got = {(r.r_score, r.f_score, r.m_score): (r.n_customers,
                                               r.total_cents)
           for r in out}
    # all frequencies tie at 1 -> f_score follows custkey order:
    # cust 1 gets ntile 1 -> f=5, cust 5 gets ntile 5 -> f=1
    assert got[(5, 1, 5)] == (1, 5000)   # cust 5: newest, priciest
    assert got[(1, 5, 1)] == (1, 1000)   # cust 1: oldest, cheapest
    assert sum(n for n, _ in got.values()) == 5


def test_rfm_cents_exact(spark):
    rows = [(1, "1998-01-01", 0.115), (1, "1998-01-02", 0.125)]
    df = spark.createDataFrame(
        rows, "c long, d string, amt double"
    ).select("c", F.col("d").cast("date").alias("d"), "amt")
    out = rfm_segments(
        df, entity_col="c", date_col="d", amount_col="amt",
        asof="1998-08-02", buckets=2).collect()
    # round-half-up per row then exact integer sum: 12 + 13
    assert out[0].total_cents == 25


def test_ks_identical_groups_zero(spark):
    rows = [("a", v) for v in [1, 2, 3, 4]] + \
           [("b", v) for v in [1, 2, 3, 4]]
    df = spark.createDataFrame(rows, "g string, x long")
    out = ks_two_sample(df, group_col="g", value_col="x").collect()
    assert len(out) == 1
    assert out[0].d_scaled == 0 and out[0].d == 0.0


def test_ks_disjoint_groups_one(spark):
    rows = [("a", v) for v in [1, 2]] + [("b", v) for v in [10, 20, 30]]
    df = spark.createDataFrame(rows, "g string, x long")
    r = ks_two_sample(df, group_col="g", value_col="x").collect()[0]
    # disjoint supports: D = 1 exactly, scaled = n_a*n_b
    assert (r.n_a, r.n_b) == (2, 3)
    assert r.d_scaled == 6 and r.d == 1.0


def test_ks_hand_case(spark):
    # a = {1,1,3}, b = {2,3}: thresholds 1,2,3
    # C_a = 2,2,3 (n_a=3); C_b = 0,1,2 (n_b=2)
    # |n_b*C_a - n_a*C_b| = |4-0|=4, |4-3|=1, |6-6|=0 -> D_scaled=4
    rows = [("a", 1), ("a", 1), ("a", 3), ("b", 2), ("b", 3)]
    df = spark.createDataFrame(rows, "g string, x long")
    r = ks_two_sample(df, group_col="g", value_col="x").collect()[0]
    assert r.d_scaled == 4
    assert r.d == round(4 / 6, 6)


def test_ks_duckdb_crosscheck_seeded(spark):
    rng = random.Random(7)
    rows = []
    for g, (lo, hi, n) in {
        "g0": (0, 50, 120), "g1": (20, 80, 90), "g2": (0, 100, 60),
    }.items():
        rows += [(g, rng.randint(lo, hi)) for _ in range(n)]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {
        (r.src_a, r.src_b): (r.n_a, r.n_b, r.d_scaled, r.d)
        for r in ks_two_sample(
            df, group_col="g", value_col="x").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {}
    for a, b in [("g0", "g1"), ("g0", "g2"), ("g1", "g2")]:
        na, nb, ds = con.sql(f"""
            WITH xs AS (SELECT DISTINCT x FROM t),
            ca AS (SELECT xs.x,
                     (SELECT count(*) FROM t WHERE g='{a}'
                        AND t.x <= xs.x) AS c FROM xs),
            cb AS (SELECT xs.x,
                     (SELECT count(*) FROM t WHERE g='{b}'
                        AND t.x <= xs.x) AS c FROM xs)
            SELECT (SELECT count(*) FROM t WHERE g='{a}'),
                   (SELECT count(*) FROM t WHERE g='{b}'),
                   max(abs((SELECT count(*) FROM t WHERE g='{b}') * ca.c
                         - (SELECT count(*) FROM t WHERE g='{a}') * cb.c))
            FROM ca JOIN cb USING (x)
        """).fetchone()
        want[(a, b)] = (na, nb, ds, round(ds / (float(na) * nb), 6))
    assert got == want


# ---------------------------------------------------------------- r6 ops


class TestTouchAttribution:
    def _run(self, spark, rows, lookback=None):
        from deltalake_spark.operators.analytics import touch_attribution
        from pyspark.sql import functions as F

        df = spark.createDataFrame(rows, "u long, t long, ch string")
        out = touch_attribution(
            df, entity_col="u", order_col="t", channel_col="ch",
            conversion_pred=(F.col("ch") == "buy"), lookback=lookback)
        return {r["channel"]: r for r in out.collect()}

    def test_single_journey_credits(self, spark):
        rows = [(1, 0, "ad"), (1, 1, "email"), (1, 2, "ad"),
                (1, 3, "buy")]
        got = self._run(spark, rows)
        assert got["ad"]["first_touch"] == 1
        assert got["ad"]["last_touch"] == 1
        assert got["email"]["first_touch"] == 0
        # linear: ad 2/3, email 1/3
        assert abs(got["ad"]["linear_credit"] - 2 / 3) < 1e-12
        assert abs(got["email"]["linear_credit"] - 1 / 3) < 1e-12
        assert got["ad"]["n_touches"] == 2

    def test_multiple_journeys_and_orphans(self, spark):
        rows = [
            # journey 1: ad -> buy ; journey 2: email -> buy
            (1, 0, "ad"), (1, 1, "buy"), (1, 2, "email"), (1, 3, "buy"),
            # orphan touches after the last conversion: no credit
            (1, 4, "ad"),
            # user with no conversion at all: no credit
            (2, 0, "ad"), (2, 1, "email"),
        ]
        got = self._run(spark, rows)
        assert got["ad"]["first_touch"] == 1 and got["ad"]["last_touch"] == 1
        assert got["email"]["first_touch"] == 1
        assert got["ad"]["n_touches"] == 1      # orphans excluded
        assert got["ad"]["linear_credit"] == 1.0

    def test_lookback_window(self, spark):
        rows = [(1, 0, "ad"), (1, 100, "email"), (1, 101, "buy")]
        got = self._run(spark, rows, lookback=10)
        assert "ad" not in got                  # too old
        assert got["email"]["first_touch"] == 1
        assert got["email"]["last_touch"] == 1


class TestKaplanMeier:
    def test_textbook_curve(self, spark):
        from deltalake_spark.operators.analytics import kaplan_meier

        # classic example: events at 1,2,4; censored at 3
        rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 0),
                ("g", 4, 1), ("g", 5, 0)]
        df = spark.createDataFrame(rows, "g string, dur long, ev int")
        out = {r["t"]: r for r in kaplan_meier(
            df, group_cols=["g"], duration_col="dur",
            event_col="ev").collect()}
        assert set(out) == {1, 2, 4}
        assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
        assert out[1]["survival"] == 4 / 5
        assert out[2]["n_risk"] == 4
        assert out[2]["survival"] == (4 / 5) * (3 / 4)
        # after censoring at 3, risk set at 4 is {4, 5} = 2
        assert out[4]["n_risk"] == 2
        assert out[4]["survival"] == (4 / 5) * (3 / 4) * (1 / 2)

    def test_matches_python_product_chain(self, spark):
        import random

        from deltalake_spark.operators.analytics import kaplan_meier

        rng = random.Random(5)
        rows = [("s", rng.randint(1, 12), rng.randint(0, 1))
                for _ in range(200)]
        df = spark.createDataFrame(rows, "g string, dur long, ev int")
        got = {r["t"]: r["survival"] for r in kaplan_meier(
            df, group_cols=["g"], duration_col="dur",
            event_col="ev").collect()}

        from collections import Counter
        d, c = Counter(), Counter()
        for _, t, ev in rows:
            (d if ev else c)[t] += 1
        times = sorted(set(d) | set(c))
        n = len(rows)
        s = 1.0
        want = {}
        for t in times:
            if d[t]:
                s = s * ((n - d[t]) / n)
                want[t] = s
            n -= d[t] + c[t]
        assert got == want
