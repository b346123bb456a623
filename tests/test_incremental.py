"""Incremental view maintenance: the CDC-delta-maintained aggregate must
equal a full recompute after every DML round, and refresh work must be
proportional to the delta (only new change versions read)."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.streaming.incremental import IncrementalAggView


@pytest.fixture()
def source(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "src"))
    t.write(spark.createDataFrame(
        [(i, f"c{i % 3}", float(i)) for i in range(30)],
        "id long, cat string, val double",
    ))
    t.enable_cdc()
    return t


def _full_recompute(t):
    return {
        (r["cat"],): (r["n"], round(r["s"], 6))
        for r in t.to_df().groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }


def _view_state(view):
    return {
        (r["cat"],): (r["n"], round(r["val_sum"], 6))
        for r in view.to_df().collect()
    }


def test_incremental_equals_recompute_across_dml(spark, source):
    view = IncrementalAggView(source, keys=["cat"], sum_cols=["val"])

    # inserts after CDC enable
    source.write(spark.createDataFrame(
        [(100, "c0", 5.5), (101, "c3", 7.0)],
        "id long, cat string, val double",
    ))
    assert view.refresh() > 0
    # note: rows written BEFORE enable_cdc aren't in the feed — seed
    # comparison from the same point by restricting to the delta keys
    assert _view_state(view)[("c3",)] == (1, 7.0)

    # update: pre/post images cancel for count, shift the sum
    source.update({"cat": "c0"}, {"val": "val + 10"})
    view.refresh()
    # delete: negative deltas
    source.delete({"cat": "c1"})
    view.refresh()
    # refresh with no new commits is a no-op
    assert view.refresh() == 0

    # maintained deltas == recompute deltas relative to the CDC horizon
    # (verify via c3 fully, and via change totals for c0/c1)
    st = _view_state(view)
    assert st[("c3",)] == (1, 7.0)
    # c0: 1 insert (5.5) + 11 updates of +10 each → n=1, sum=5.5+110
    assert st[("c0",)] == (1, round(5.5 + 110.0, 6))
    # c1: 10 deletes of rows 1,4,...28 → n=-10, sum=-(sum of those vals)
    deleted = sum(float(i) for i in range(30) if i % 3 == 1)
    assert st[("c1",)] == (-10, round(-deleted, 6))


def test_incremental_from_clean_start(spark, tmp_path):
    """CDC from the very first write → view equals full recompute."""
    t = DeltaTable(spark, str(tmp_path / "clean"))
    t.write(spark.createDataFrame([], "id long, cat string, val double"))
    t.enable_cdc()
    view = IncrementalAggView(t, keys=["cat"], sum_cols=["val"])
    t.write(spark.createDataFrame(
        [(i, f"c{i % 2}", float(i)) for i in range(10)],
        "id long, cat string, val double",
    ))
    view.refresh()
    t.update({"id": {"$lt": 3}}, {"val": "val * 2"})
    view.refresh()
    t.delete({"id": 9})
    view.refresh()
    assert _view_state(view) == _full_recompute(t)


def test_incremental_high_cardinality_state(spark, tmp_path):
    """State lives in a Delta table, not driver memory: maintain a view
    with ~200k distinct groups and verify sampled keys + totals without
    ever materializing the full state on the driver."""
    t = DeltaTable(spark, str(tmp_path / "wide"))
    t.write(spark.createDataFrame([], "id long, cat long, val double"))
    t.enable_cdc()
    view = IncrementalAggView(t, keys=["cat"], sum_cols=["val"])

    n = 200_000
    base = spark.range(n).select(
        F.col("id"), F.col("id").alias("cat"),
        (F.col("id") % 97).cast("double").alias("val"),
    )
    t.write(base)
    view.refresh()
    t.delete({"cat": {"$lt": 1000}})
    view.refresh()

    mv = view.to_df()
    assert mv.count() == n - 1000
    sampled = {r["cat"]: (r["n"], r["val_sum"])
               for r in mv.filter(F.col("cat").isin(1000, 123_456)).collect()}
    assert sampled[1000] == (1, float(1000 % 97))
    assert sampled[123456] == (1, float(123456 % 97))
    # watermark survives a fresh handle (persisted in state metadata)
    reopened = IncrementalAggView(t, keys=["cat"], sum_cols=["val"])
    assert reopened.refresh() == 0
    assert reopened.to_df().count() == n - 1000


def test_incremental_minmax_with_dirty_recompute(spark, tmp_path):
    """MIN/MAX maintenance: inserts narrow in place; deleting a group's
    extremum triggers a key-pruned recompute of only that group; the view
    must equal a full recompute after every round."""
    from deltalake_spark.delta.table import DeltaTable
    from deltalake_spark.streaming.incremental import IncrementalAggView

    t = DeltaTable(spark, str(tmp_path / "mmsrc"))
    t.write(spark.createDataFrame([], "k string, v double"))
    t.enable_cdc()
    view = IncrementalAggView(t, keys=["k"], sum_cols=["v"],
                              minmax_cols=["v"],
                              state_path=str(tmp_path / "mmview"))

    def check():
        got = {r["k"]: (r["n"], r["v_sum"], r["v_min"], r["v_max"])
               for r in view.to_df().collect()}
        want = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
                for r in t.to_df().groupBy("k").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.round(F.sum("v"), 6).alias("s"),
                    F.min("v").alias("mn"), F.max("v").alias("mx"),
                ).collect()}
        assert got == want, (got, want)

    t.write(spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 3.0), ("b", 10.0), ("b", 20.0)],
        "k string, v double"))
    view.refresh(); check()

    # insert-only narrowing: new max for a, new min for b
    t.write(spark.createDataFrame([("a", 9.0), ("b", -1.0)],
                                  "k string, v double"))
    view.refresh(); check()

    # delete a's max (dirty → recompute a only) and b's interior (clean)
    t.delete({"v": 9.0})
    t.delete({"v": 10.0})
    view.refresh(); check()

    # update that moves a preimage extremum (pre=5→dirty) downward
    t.update({"v": 5.0}, {"v": "2.5"})
    view.refresh(); check()

    # wipe out group b entirely → leaves the view
    t.delete({"k": "b"})
    view.refresh(); check()
    assert {r["k"] for r in view.to_df().collect()} == {"a"}


def test_incremental_minmax_initial_build_after_deletes(spark, tmp_path):
    """First refresh replays a CDC history that already contains deletes
    of extrema — the initial min/max must come from the source state, not
    from insert-side candidates."""
    from deltalake_spark.delta.table import DeltaTable
    from deltalake_spark.streaming.incremental import IncrementalAggView

    t = DeltaTable(spark, str(tmp_path / "mmlate"))
    t.write(spark.createDataFrame([], "k string, v double"))
    t.enable_cdc()
    t.write(spark.createDataFrame(
        [("a", 1.0), ("a", 100.0), ("a", 50.0)], "k string, v double"))
    t.delete({"v": 100.0})  # extremum gone BEFORE the view exists
    view = IncrementalAggView(t, keys=["k"], sum_cols=["v"],
                              minmax_cols=["v"],
                              state_path=str(tmp_path / "mmlateview"))
    view.refresh()
    row = view.to_df().first()
    assert (row["n"], row["v_min"], row["v_max"]) == (2, 1.0, 50.0)
