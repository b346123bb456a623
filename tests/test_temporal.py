"""Unit tests for temporal operators (as-of join, interval join,
sessionization) — engine-native additions; the reference has no temporal
operators (its only join-shaped op is merge, src/cdc/index.ts:1937-2005).
"""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.temporal import (
    asof_join,
    interval_join,
    sessionize,
)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("a", 10, "t1"),
            ("a", 20, "t2"),
            ("a", 35, "t3"),
            ("b", 15, "t4"),
            ("c", 5, "t5"),  # key with no quotes at all
        ],
        "sym string, t long, trade_id string",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("a", 8, 100.0),
            ("a", 20, 101.0),   # tie with t2 → must match (>= semantics)
            ("a", 30, 102.0),
            ("b", 40, 200.0),   # after b's only trade → no match
        ],
        "sym string, t long, px double",
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestAsofJoin:
    def test_backward_match_and_ties(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="t",
            right_cols=["px"],
        )
        got = {r["trade_id"]: (r["t_asof"], r["px_asof"])
               for r in out.collect()}
        assert got == {
            "t1": (8, 100.0),
            "t2": (20, 101.0),   # equal timestamps match
            "t3": (30, 102.0),
            "t4": (None, None),  # quote is in the future
            "t5": (None, None),  # key absent on right side
        }

    def test_left_rows_preserved(self, trades, quotes):
        out = asof_join(trades, quotes, on="sym", left_time="t",
                        right_time="t")
        assert out.count() == trades.count()
        assert set(trades.columns).issubset(set(out.columns))

    def test_tolerance(self, trades, quotes):
        out = asof_join(
            trades, quotes, on="sym", left_time="t", right_time="t",
            right_cols=["px"], tolerance=3,
        )
        got = {r["trade_id"]: r["px_asof"] for r in out.collect()}
        # t1: gap 2 <= 3 keeps; t2: gap 0; t3: gap 5 > 3 dropped
        assert got == {"t1": 100.0, "t2": 101.0, "t3": None,
                       "t4": None, "t5": None}

    def test_payload_struct_is_atomic(self, spark):
        # right payload column that is null in the matching row must NOT
        # fall back to an older row's value (struct travels as one unit)
        left = spark.createDataFrame([("k", 10)], "k string, t long")
        right = spark.createDataFrame(
            [("k", 1, 7.0), ("k", 9, None)], "k string, t long, v double"
        )
        out = asof_join(left, right, on="k", left_time="t",
                        right_time="t", right_cols=["v"])
        row = out.collect()[0]
        assert row["t_asof"] == 9 and row["v_asof"] is None

    def test_single_shuffle_plan(self, trades, quotes):
        out = asof_join(trades, quotes, on="sym", left_time="t",
                        right_time="t")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # window-based impl: no join node, one exchange for the window
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") <= 1


class TestIntervalJoin:
    def test_equi_plus_range(self, spark):
        points = spark.createDataFrame(
            [("u1", 5), ("u1", 15), ("u2", 5)], "pu string, pt long"
        )
        ivals = spark.createDataFrame(
            [("u1", 0, 10, "w1"), ("u2", 10, 20, "w2")],
            "iu string, lo long, hi long, wid string",
        )
        out = interval_join(
            points, ivals, on=(F.col("pu"), F.col("iu")),
            point_time=F.col("pt"), lo=F.col("lo"), hi=F.col("hi"),
        )
        assert _rows(out.select("pt", "wid")) == {(5, "w1")}

    def test_rejects_pure_range(self, spark):
        df = spark.range(1)
        with pytest.raises(ValueError, match="nested-loop"):
            interval_join(df, df, on=None, point_time=F.col("id"),
                          lo=F.lit(0), hi=F.lit(1))

    def test_plans_hash_join_not_nested_loop(self, spark):
        points = spark.createDataFrame([("u1", 5)], "pu string, pt long")
        ivals = spark.createDataFrame(
            [("u1", 0, 10)], "iu string, lo long, hi long"
        )
        out = interval_join(
            points, ivals, on=(F.col("pu"), F.col("iu")),
            point_time=F.col("pt"), lo=F.col("lo"), hi=F.col("hi"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan


class TestSessionize:
    def test_gap_boundaries(self, spark):
        df = spark.createDataFrame(
            [("u", 0), ("u", 10), ("u", 11), ("u", 40), ("v", 100)],
            "uid string, t long",
        )
        out = sessionize(df, key="uid", time_col="t", gap=10)
        got = {(r["uid"], r["t"]): r["session_seq"] for r in out.collect()}
        # gap == 10 does NOT start a new session (strict >)
        assert got == {("u", 0): 1, ("u", 10): 1, ("u", 11): 1,
                       ("u", 40): 2, ("v", 100): 1}

    def test_tiebreak_determinism(self, spark):
        df = spark.createDataFrame(
            [("u", 5, 2), ("u", 5, 1), ("u", 50, 3)],
            "uid string, t long, eid long",
        )
        out = sessionize(df, key="uid", time_col="t", gap=10,
                         tiebreak=["eid"])
        got = {r["eid"]: r["session_seq"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 2}


class TestIntervalUnion:
    def test_merge_touch_and_gap(self, spark):
        """Overlap merges, touching merges ([0,10)+[10,20) -> one
        island), a gap splits; singleton keys stay singleton."""
        from deltalake_spark.operators.temporal import interval_union
        import pyspark.sql.functions as F

        rows = [
            ("u", 0, 10), ("u", 5, 12), ("u", 12, 20),  # overlap+touch
            ("u", 25, 30),                              # gap -> island 2
            ("v", 100, 101),
        ]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        out = {(r["k"], r["island"]): (r["start"], r["end"],
                                       r["n_intervals"], r["span"])
               for r in interval_union(
                   df, key_cols=["k"], start_col="s",
                   end_col="e").collect()}
        assert out == {
            ("u", 1): (0, 20, 3, 20),
            ("u", 2): (25, 30, 1, 5),
            ("v", 1): (100, 101, 1, 1),
        }

    def test_contained_and_duplicate_intervals(self, spark):
        from deltalake_spark.operators.temporal import interval_union

        rows = [("u", 0, 100), ("u", 10, 20), ("u", 10, 20),
                ("u", 99, 150)]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        got = interval_union(df, key_cols=["k"], start_col="s",
                             end_col="e").collect()
        assert len(got) == 1
        r = got[0]
        assert (r["start"], r["end"], r["n_intervals"]) == (0, 150, 4)

    def test_requires_keys(self, spark):
        import pytest

        from deltalake_spark.operators.temporal import interval_union

        df = spark.createDataFrame([("u", 0, 1)], "k string, s long, e long")
        with pytest.raises(ValueError, match="non-empty"):
            interval_union(df, key_cols=[], start_col="s", end_col="e")


class TestAsofForward:
    def test_forward_direction_and_tolerance(self, spark):
        """forward = earliest right with right_time >= left_time,
        ties match, tolerance nulls far-future matches — pandas
        merge_asof(direction='forward') semantics."""
        from deltalake_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [("k", 10, "a"), ("k", 20, "b"), ("k", 35, "c"),
             ("k", 100, "d"), ("x", 5, "e")],
            "k string, t long, tag string")
        right = spark.createDataFrame(
            [("k", 20, 1.0), ("k", 30, 2.0), ("k", 50, 3.0)],
            "k string, rt long, v double")
        out = {r["tag"]: (r["rt_asof"], r["v_asof"])
               for r in asof_join(
                   left, right, on="k", left_time="t",
                   right_time="rt", direction="forward").collect()}
        assert out == {
            "a": (20, 1.0),   # earliest rt >= 10
            "b": (20, 1.0),   # tie matches
            "c": (50, 3.0),
            "d": (None, None),  # nothing ahead
            "e": (None, None),  # key with no right rows
        }

        tol = {r["tag"]: r["rt_asof"]
               for r in asof_join(
                   left, right, on="k", left_time="t",
                   right_time="rt", direction="forward",
                   tolerance=10).collect()}
        assert tol == {"a": 20, "b": 20, "c": None, "d": None,
                       "e": None}

    def test_backward_unchanged_and_direction_validated(self, spark):
        import pytest

        from deltalake_spark.operators.temporal import asof_join

        left = spark.createDataFrame([("k", 25, "a")],
                                     "k string, t long, tag string")
        right = spark.createDataFrame([("k", 20, 1.0), ("k", 30, 2.0)],
                                      "k string, rt long, v double")
        r = asof_join(left, right, on="k", left_time="t",
                      right_time="rt").collect()[0]
        assert r["rt_asof"] == 20
        # r8: nearest is now a real direction; t=25 vs rt∈{20, 30} is
        # the equidistant tie — backward wins (pandas parity)
        n = asof_join(left, right, on="k", left_time="t",
                      right_time="rt", direction="nearest").collect()[0]
        assert n["rt_asof"] == 20
        with pytest.raises(ValueError, match="backward.*forward"):
            asof_join(left, right, on="k", left_time="t",
                      right_time="rt", direction="sideways")
