"""Regressions for the five r5 ADVICE findings.

1. ``run_available_now`` serializes drains on a module lock so its
   session-wide conf overrides (shuffle partitions, noDataMicroBatches)
   can't leak into a drain started concurrently from another thread
   (tools/check_oracle.py's ThreadPoolExecutor).
2. ``read_parquet_stream``'s schema/symlink cache keys on file
   (path, mtime, size) — regenerating a source with a new schema in the
   same session must not stream with the stale schema.
3. ``sorted_neighborhood_pairs`` no longer funnels the table through a
   single-partition global window: it range-partitions, computes leads
   partition-locally, and closes seams with a KB-scale boundary pass.
   Pinned by equivalence against a naive single-window reference on
   data spread over many partitions.
4. ``holt_forecast``'s floor-div-by-100 stays exact past 2^53 (the old
   ``/ 100`` double detour silently mis-rounded large units).
5. ``mad_outliers`` builds its median with the typed ``F.percentile``
   call (no f-string SQL), so backtick-hostile column names work.
"""

import os
import threading
import time

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- 1


def test_run_available_now_overrides_do_not_leak_across_threads(spark):
    """While one drain holds noDataMicroBatches=false, a concurrently
    started drain must NOT observe the override (the lock serializes
    them and restores conf before releasing)."""
    from deltalake_spark.streaming import windowed as W

    leaks = []
    orig_start = None

    # Observe the conf AT QUERY START from a second thread by polling
    # while the first drain runs. The lock makes the window where the
    # override is set invisible to other run_available_now callers;
    # we assert the conf is back to default whenever the lock is free.
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    default = spark.conf.get(key)
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            if W._DRAIN_LOCK.acquire(timeout=0.01):
                try:
                    if spark.conf.get(key) != default:
                        leaks.append(spark.conf.get(key))
                finally:
                    W._DRAIN_LOCK.release()
            time.sleep(0.005)

    t = threading.Thread(target=poll)
    t.start()
    try:
        src = spark.range(100).withColumn(
            "ts", F.timestamp_seconds(F.col("id") * 60))
        import tempfile
        d = tempfile.mkdtemp(prefix="advr5_")
        src.write.mode("overwrite").parquet(os.path.join(d, "src"))
        stream = W.read_parquet_stream(
            spark, os.path.join(d, "src"), nanos_cols=())
        agg = (stream.groupBy().count())
        out = W.run_available_now(
            agg, output_mode="complete",
            shuffle_partitions=4, no_data_batch=False)
        assert out.collect()[0]["count"] == 100
    finally:
        stop.set()
        t.join()
    assert leaks == []
    assert spark.conf.get(key) == default


# ---------------------------------------------------------------- 2


def test_stream_source_cache_invalidates_on_regeneration(spark, tmp_path):
    from deltalake_spark.streaming.windowed import (
        read_parquet_stream,
        run_available_now,
    )

    p = str(tmp_path / "src.parquet")
    spark.range(5).select(F.col("id").alias("a")) \
        .toPandas().to_parquet(p)
    s1 = read_parquet_stream(spark, p, nanos_cols=())
    assert s1.columns == ["a"]

    # regenerate SAME path with a different schema; ensure mtime moves
    time.sleep(0.02)
    spark.range(7).select(F.col("id").alias("a"),
                          (F.col("id") * 2).alias("b")) \
        .toPandas().to_parquet(p)
    s2 = read_parquet_stream(spark, p, nanos_cols=())
    assert s2.columns == ["a", "b"]
    out = run_available_now(s2.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("b").alias("sb")),
        output_mode="complete")
    row = out.collect()[0]
    assert (row["n"], row["sb"]) == (7, 42)


# ---------------------------------------------------------------- 3


def _naive_snm(df, id_col, text_col, window, max_distance):
    """The old implementation: ONE global window (correct, tiny-data
    reference)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(text_col, id_col)
    leads = df.select(
        id_col, text_col,
        *[F.lead(id_col, k).over(w).alias(f"n{k}")
          for k in range(1, window + 1)],
        *[F.lead(text_col, k).over(w).alias(f"t{k}")
          for k in range(1, window + 1)])
    nb = F.array(*[F.struct(F.col(f"n{k}").alias("nid"),
                            F.col(f"t{k}").alias("ntext"))
                   for k in range(1, window + 1)])
    e = (leads.select(id_col, text_col, F.explode(nb).alias("nb"))
         .filter(F.col("nb.nid").isNotNull()))
    return (e.select(
        F.least(F.col(id_col), F.col("nb.nid")).alias("id_a"),
        F.greatest(F.col(id_col), F.col("nb.nid")).alias("id_b"),
        F.levenshtein(F.col(text_col), F.col("nb.ntext"))
        .alias("distance"))
        .filter(F.col("distance") <= max_distance))


def test_snm_distributed_matches_naive_global_window(spark):
    """300 rows spread over 32 input partitions, clustered strings so
    boundary pairs are plentiful: the distributed implementation must
    emit EXACTLY the naive global-window pair set."""
    import random

    from deltalake_spark.operators.text import sorted_neighborhood_pairs

    rng = random.Random(65)
    rows = []
    for i in range(300):
        stem = rng.choice(["alpha", "bravo", "carol", "delta"])
        mut = stem[: rng.randint(3, 5)] + rng.choice("xyz")
        rows.append((i, mut))
    df = spark.createDataFrame(rows, "id long, name string") \
        .repartition(32)

    # sorted LISTS, not sets: a local/seam overlap bug would show up
    # as duplicate pairs, which a set comparison silently forgives
    got = sorted((r["id_a"], r["id_b"], r["distance"])
                 for r in sorted_neighborhood_pairs(
                     df, id_col="id", text_col="name",
                     window=3, max_distance=2).collect())
    want = sorted((r["id_a"], r["id_b"], r["distance"])
                  for r in _naive_snm(df, "id", "name", 3, 2).collect())
    assert got == want
    assert len(want) > 50  # non-trivial fixture


def test_snm_plan_has_no_global_sort_window_over_input(spark):
    """The big-table window must be partitioned by __pid — the only
    single-partition exchange allowed is the KB-scale seam frame."""
    from deltalake_spark.operators.text import sorted_neighborhood_pairs

    df = spark.range(1000).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name"))
    plan = sorted_neighborhood_pairs(
        df, id_col="id", text_col="name")._jdf.queryExecution() \
        .executedPlan().toString()
    # the local pass runs over a range-repartitioned layout
    assert "rangepartitioning" in plan.lower()


# ---------------------------------------------------------------- 4


def test_holt_fdiv100_exact_past_2_53(spark):
    """Values ~2^55 — past the 2^53 double-mantissa bound where the
    old ``/ 100`` detour drifts, but inside the recursion's own ANSI
    long-multiply domain (|x| < 2^63/100): must match an exact
    python-int replay."""
    from deltalake_spark.operators.timeseries import holt_forecast

    vals = [(1 << 55) + k * 997 for k in range(6)]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "g string, t long, v long")
    row = holt_forecast(
        df, group_cols=["g"], order_col="t", value_col="v",
        alpha_pct=30, beta_pct=20, horizon=7).collect()[0]

    def fdiv100(x):
        return x // 100  # python floor div IS the spec

    l, b = vals[0], 0
    for x in vals[1:]:
        nl = fdiv100(30 * x + 70 * (l + b))
        nb = fdiv100(20 * (nl - l) + 80 * b)
        l, b = nl, nb
    assert row["level"] == l
    assert row["trend"] == b
    assert row["forecast"] == l + 7 * b


# ---------------------------------------------------------------- 5


def test_mad_outliers_hostile_column_name(spark):
    from deltalake_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 100]],
        ["g", "the value"])  # space would break f-string SQL
    row = mad_outliers(df, group_cols=["g"],
                       value_col="the value", k=3.0).collect()[0]
    assert row["median"] == 3.0
    assert row["mad"] == 1.0
    assert row["n_outliers"] == 1
