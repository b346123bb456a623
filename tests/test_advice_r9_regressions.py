"""r9 ADVICE regressions: int64-overflow hygiene in the portable
Knuth-hash family and deterministic degenerate-edge definitions.

- bootstrap_mean_ci / split_conformal_interval /
  negative_sample_interactions multiplied ``operand * 2654435761``
  directly — the documented caller bound was arithmetically wrong
  (with B=64 it allowed products near 2^68). All three now route
  through the 16-bit-decomposed ``_knuth32`` (products < 2^49), and
  the SQL twins go through HUGEINT, so any int64-fitting operand is
  safe on both engines.
- mannwhitney_u / kruskal_wallis computed the tie term t^3 - t in
  BIGINT, which overflows once one tied block passes ~2.09M rows —
  exactly the regime the quantize-first rule creates. The tie term is
  now decimal(38,0) internally (exact to t ~ 4.6e12) and reported as
  a double diagnostic.
- split_conformal_interval clamped the calibration rank with
  min(..., n_cal); when ceil((n_cal+1)(1-alpha)) > n_cal the
  conformal guarantee requires q_hat = +inf, so it now raises.
- bh_fdr_ztests divided by sqrt(p0(1-p0)/n) even when the pooled rate
  was degenerate (0/0: NULL in Spark, NaN in DuckDB) — now pinned to
  z=0 / p~1 / no rejections on both engines.
- mg_stream_summary_sink hardcoded a string key schema; it now
  derives the key type from the batch schema.
"""

import pytest
from pyspark.sql import functions as F

KNUTH = 2654435761
SPACE = 2 ** 32


def _py_hash(operand: int) -> int:
    return (operand * KNUTH) % SPACE


def test_bootstrap_hash_survives_huge_ids(spark):
    """ids near 2^55: the old plain multiply overflowed int64 (ANSI
    raise / silent wrap); the decomposed multiply must match the
    unbounded-int Python value exactly."""
    from deltalake_spark.operators.stats import bootstrap_mean_ci

    base = 2 ** 55
    rows = [(base + i, float(100 + 7 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = bootstrap_mean_ci(
        df, id_col="id", value_col="v", n_resamples=8).collect()[0]
    assert out["n_rows"] == 40
    # re-derive replicate 0's weighted mean with unbounded ints
    from deltalake_spark.operators.stats import _poisson1_thresholds
    th = _poisson1_thresholds()

    def w_of(i: int, b: int) -> int:
        u = _py_hash((base + i) * 8 + b + 7)
        for k, t in enumerate(th):
            if u < t:
                return k
        return len(th)

    means = []
    for b in range(8):
        sw = sum(w_of(i, b) for i in range(40))
        swc = sum(w_of(i, b) * round((100 + 7 * i) * 100)
                  for i in range(40))
        means.append(swc / (100.0 * sw))
    means.sort()
    assert out["ci_lo"] == pytest.approx(means[0], abs=0)
    assert out["ci_hi"] == pytest.approx(means[7], abs=0)


def test_negative_sampling_survives_huge_user_ids(spark):
    from deltalake_spark.operators.recommend import (
        negative_sample_interactions)

    base = 2 ** 55
    pos = spark.createDataFrame(
        [(base + u, 1) for u in range(4)], "user long, item long")
    out = negative_sample_interactions(
        pos, user_col="user", item_col="item",
        n_items=1000, k=2).collect()
    assert len(out) == 8
    by_user = {}
    for r in out:
        by_user.setdefault(r["user"], []).append(
            (r["draw_index"], r["neg_item"]))
    for u in range(4):
        draws = []
        for j in range(4):  # J = k * oversample = 2 * 2
            item = 1 + _py_hash((base + u) * 4 + j + 19) % 1000
            if item != 1:
                draws.append(item)
        expect = [(d, it) for d, it in enumerate(draws[:2])]
        assert sorted(by_user[base + u]) == expect


def test_conformal_hash_unchanged_and_small_cal_raises(spark):
    from deltalake_spark.operators.stats import split_conformal_interval

    # ids chosen so the Knuth split gives a calibration bucket too
    # small for alpha=1/10: ceil((n_cal+1)*0.9) > n_cal for n_cal < 9
    def split_of(i: int, seed: int = 11) -> str:
        u = _py_hash(i + seed)
        if u < 2147483648:
            return "train"
        if u < 3221225472:
            return "cal"
        return "test"

    train_ids = [i for i in range(4000)
                 if split_of(i) == "train"][:30]
    cal_ids = [i for i in range(4000) if split_of(i) == "cal"][:5]
    test_ids = [i for i in range(4000) if split_of(i) == "test"][:5]
    rows = [(i, float(i % 50), 3.0 * (i % 50) + 10.0)
            for i in train_ids + cal_ids + test_ids]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    with pytest.raises(ValueError, match="calibration split too small"):
        split_conformal_interval(
            df, id_col="id", x_col="x", y_col="y", alpha=(1, 10))
    # a workable alpha on the same data still runs (n_cal=5, rank<=5)
    out = split_conformal_interval(
        df, id_col="id", x_col="x", y_col="y", alpha=(1, 2)).collect()
    assert out[0]["n_cal"] == 5


def test_mannwhitney_tie_term_exact_past_bigint(spark):
    """One tied block of 2.2M rows: t^3 - t ~ 1.06e19 > int64 max.
    The old BIGINT path raised (ANSI) — now the decimal core delivers
    the exact z and the double tie_term."""
    from deltalake_spark.operators.stats import mannwhitney_u

    t1, t2 = 2_200_000, 200_000
    df = spark.range(t1 + t2).select(
        F.when(F.col("id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b")).alias("g"),
        F.when(F.col("id") < t1, F.lit(1.0))
        .otherwise(F.lit(2.0)).alias("v"),
    )
    out = mannwhitney_u(
        df, group_col="g", value_col="v",
        group_a="a", group_b="b").collect()[0]
    tie = (t1 ** 3 - t1) + (t2 ** 3 - t2)
    assert out["tie_term"] == pytest.approx(float(tie), rel=1e-15)
    assert out["z_stat"] is not None
    import math
    assert math.isfinite(out["z_stat"])


def test_kruskal_tie_term_exact_past_bigint(spark):
    from deltalake_spark.operators.stats import kruskal_wallis

    t1, t2 = 2_200_000, 200_000
    df = spark.range(t1 + t2).select(
        F.when(F.col("id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b")).alias("g"),
        F.when(F.col("id") < t1, F.lit(1.0))
        .otherwise(F.lit(2.0)).alias("v"),
    )
    out = kruskal_wallis(df, group_col="g", value_col="v").collect()[0]
    tie = (t1 ** 3 - t1) + (t2 ** 3 - t2)
    assert out["tie_term"] == pytest.approx(float(tie), rel=1e-15)
    assert out["n_total"] == t1 + t2


def test_bh_fdr_degenerate_pooled_rate(spark):
    from deltalake_spark.operators.stats import bh_fdr_ztests

    # all failures: pooled rate 0 -> z pinned to 0, p ~ 1, nothing
    # rejected (pre-fix: NULL z propagated into rank/rejected)
    df = spark.createDataFrame(
        [("g%d" % (i % 3), 0) for i in range(30)], "g string, s int")
    rows = bh_fdr_ztests(
        df, group_col="g", success_col="s").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["z"] == 0.0
        assert r["p_value"] == pytest.approx(1.0, abs=1e-6)
        assert r["rejected"] is False
    # all successes mirror
    df2 = spark.createDataFrame(
        [("g%d" % (i % 3), 1) for i in range(30)], "g string, s int")
    rows2 = bh_fdr_ztests(
        df2, group_col="g", success_col="s").collect()
    assert all(not r["rejected"] and r["z"] == 0.0 for r in rows2)


def test_mg_sink_preserves_long_key_type(spark, tmp_path):
    from deltalake_spark.delta.table import DeltaTable
    from deltalake_spark.streaming.sink import mg_stream_summary_sink

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(int(i % 7),) for i in range(100)], "item long"
    ).toPandas().to_parquet(str(src / "b0.parquet"))
    stream = (
        spark.readStream.schema("item long")
        .option("maxFilesPerTrigger", "1").parquet(str(src))
    )
    summary = DeltaTable(spark, str(tmp_path / "mg_summary"))
    mg_stream_summary_sink(
        stream, summary, col="item", capacity=4,
        app_id="t_mg_long",
        checkpoint_dir=str(tmp_path / "ck"))
    got = summary.to_df()
    assert dict(got.dtypes)["item"] == "bigint"
    assert got.count() <= 4
