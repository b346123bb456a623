"""r6 ADVICE regressions: parameters actually threaded, and
out-of-contract inputs failing loudly instead of returning silently
inconsistent results.

- stateful_cusum: key/value_units_col/time_col/tiebreak_col reach the
  state function and the output schema (previously hardcoded __units/
  ts/event_id/event_type — non-default callers got a KeyError or a
  mis-named column).
- best_gini_split: the "quantize first" contract is enforced (distinct
  value cardinality guard) and decimal overflow raises instead of
  silently dropping candidates from the argmax.
- cuped_lift: >2 arms / missing control raise (F.first over mixed
  treatment arms was a partition-order-dependent pick).
- simplified_silhouette: k=1 raises (the "other centroid" distance is
  undefined; rows used to vanish from every histogram bin).
- cross_correlation: empty lags gets its own message.
"""

import pytest
from pyspark.sql import functions as F


def test_stateful_cusum_custom_columns(spark, tmp_path):
    """Non-default key/value/time/tiebreak column names must work and
    the output key column must carry the caller's key name."""
    from deltalake_spark.streaming.windowed import (
        read_parquet_stream,
        run_available_now,
        stateful_cusum,
    )

    rows = [(i, i, "sensor-a", 40 + i) for i in range(40)]
    src = tmp_path / "cusum_custom"
    spark.createDataFrame(
        rows, "rid long, tick long, sensor string, units long"
    ).coalesce(1).write.parquet(str(src))

    stream = read_parquet_stream(spark, str(src), nanos_cols=())
    out = run_available_now(
        stateful_cusum(stream, key="sensor", value_units_col="units",
                       time_col="tick", tiebreak_col="rid",
                       target_units=10, threshold_units=500),
        output_mode="append")
    assert out.columns == ["sensor", "tick", "cusum_units"]
    got = [(r["sensor"], r["tick"], r["cusum_units"])
           for r in out.collect()]

    # closed-form replay
    s_run, mins, alarmed, want = 0, 0, False, []
    for rid, tick, _, units in rows:
        s_run += units - 10
        mins = min(mins, s_run)
        c = s_run - min(mins, 0)
        if c > 500:
            if not alarmed:
                want.append(("sensor-a", tick, c))
                alarmed = True
        else:
            alarmed = False
    assert sorted(got) == sorted(want)


def test_stateful_cusum_missing_column_raises(spark, tmp_path):
    from deltalake_spark.streaming.windowed import (
        read_parquet_stream,
        stateful_cusum,
    )

    src = tmp_path / "cusum_missing"
    spark.createDataFrame(
        [(1, 1, "k")], "rid long, tick long, sensor string"
    ).coalesce(1).write.parquet(str(src))
    stream = read_parquet_stream(spark, str(src), nanos_cols=())
    with pytest.raises(ValueError, match="missing column"):
        stateful_cusum(stream, key="sensor", value_units_col="units",
                       time_col="tick", tiebreak_col="rid",
                       target_units=1, threshold_units=1)


def test_best_gini_split_cardinality_guard(spark):
    """An unquantized high-cardinality feature must raise, not crawl
    through a huge single-partition window and mis-rank."""
    from deltalake_spark.operators.stats import best_gini_split

    df = spark.range(40).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 2).alias("y"))
    out = best_gini_split(df, label_col="y", feature_cols=["x"],
                          max_thresholds=10)
    with pytest.raises(Exception, match="max_thresholds"):
        out.collect()


def test_best_gini_split_within_guard_unchanged(spark):
    """The guard must not disturb the in-contract path: a perfectly
    separable feature still splits at the class boundary."""
    from deltalake_spark.operators.stats import best_gini_split

    rows = [(float(v), 1 if v >= 5 else 0) for v in range(10)]
    df = spark.createDataFrame(rows, "x double, y int")
    got = best_gini_split(df, label_col="y", feature_cols=["x"],
                          max_thresholds=10).collect()[0]
    assert got["threshold"] == 4.0
    assert got["n_left"] == 5 and got["pos_left"] == 0


def test_cuped_lift_rejects_multi_arm(spark):
    from deltalake_spark.operators.stats import cuped_lift

    rows = [(arm, float(i), float(i * 2))
            for arm in ("control", "t1", "t2") for i in range(5)]
    df = spark.createDataFrame(rows, "arm string, pre double, post double")
    with pytest.raises(ValueError, match="2-arm"):
        cuped_lift(df, arm_col="arm", pre_col="pre", post_col="post",
                   control_value="control")


def test_cuped_lift_rejects_missing_control(spark):
    from deltalake_spark.operators.stats import cuped_lift

    rows = [(arm, float(i), float(i * 2))
            for arm in ("t1", "t2") for i in range(5)]
    df = spark.createDataFrame(rows, "arm string, pre double, post double")
    with pytest.raises(ValueError, match="2-arm"):
        cuped_lift(df, arm_col="arm", pre_col="pre", post_col="post",
                   control_value="control")


def test_silhouette_requires_two_centroids(spark):
    from deltalake_spark.operators.clustering import simplified_silhouette

    df = spark.createDataFrame([(0, [0, 0])], "cid int, qvec array<long>")
    with pytest.raises(ValueError, match=">= 2 centroids"):
        simplified_silhouette(df, [[0, 0]])


def test_cross_correlation_empty_lags_message(spark):
    from deltalake_spark.operators.timeseries import cross_correlation

    df = spark.createDataFrame([("g", 1, 2, 3)],
                               "g string, t long, x long, y long")
    with pytest.raises(ValueError, match="non-empty"):
        cross_correlation(df, group_cols=["g"], order_col="t",
                          x_col="x", y_col="y", lags=[])
    with pytest.raises(ValueError, match=">= 0"):
        cross_correlation(df, group_cols=["g"], order_col="t",
                          x_col="x", y_col="y", lags=[-1])
