"""operators.ranking.with_global_rank — the distributed replacement
for single-partition ORDER BY ranking. Properties pinned:

- exact equivalence with row_number() OVER (ORDER BY ...) on the same
  total order, for asc and desc orders, across repartitioned inputs;
- no Exchange SinglePartition in the plan;
- the ntile identity used by rfm_segments: ntile(k) == (rank-1)*k div
  n + 1 under any n % k remainder.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from deltalake_spark.operators.ranking import with_global_rank


def _ranks(df, order, **kw):
    out = with_global_rank(df, order, **kw)
    return {r["id"]: r["__rank"] for r in out.collect()}


def test_matches_window_row_number_asc_and_desc(spark):
    rows = [(i, (i * 37) % 11, f"g{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v long, g string") \
        .repartition(7)

    for order, sort_cols in [
        ([F.col("v").asc(), F.col("id").asc()],
         [F.col("v").asc(), F.col("id").asc()]),
        ([F.col("v").desc(), F.col("id").asc()],
         [F.col("v").desc(), F.col("id").asc()]),
    ]:
        got = _ranks(df, order)
        w = Window.orderBy(*sort_cols)
        want = {r["id"]: r["rn"] for r in df.select(
            "id", F.row_number().over(w).alias("rn")).collect()}
        assert got == want


def test_no_single_partition_exchange(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 13).alias("v"))
    out = with_global_rank(df, [F.col("v").asc(), F.col("id").asc()])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    got = _ranks(df, [F.col("id").asc()], partitions=32)
    assert got == {1: 1, 2: 2, 3: 3}


def test_empty_order_rejected(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="non-empty"):
        with_global_rank(df, [])


def test_ntile_identity(spark):
    """The rfm_segments mapping must equal real ntile for every
    remainder class n mod k."""
    for n in (10, 11, 12, 13, 14):
        df = spark.range(n).select(F.col("id"))
        k = 5
        ranked = with_global_rank(df, [F.col("id").asc()])
        got = {
            r["id"]: r["b"]
            for r in ranked.select(
                "id",
                F.expr(f"cast((__rank - 1) * {k} div {n} + 1 as int)")
                .alias("b")).collect()
        }
        w = Window.orderBy("id")
        want = {r["id"]: r["nt"] for r in df.select(
            "id", F.ntile(k).over(w).alias("nt")).collect()}
        assert got == want, f"n={n}"
