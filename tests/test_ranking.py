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
    """The rfm_segments rank→ntile mapping must equal real ntile for
    every remainder class n mod k — including n < k. N.B. the naive
    (rank-1)*k div n + 1 is NOT ntile: at n=12, k=5 it yields bucket
    sizes 3,2,3,2,2 (Bresenham remainder spread) where ntile
    front-loads 3,3,2,2,2; this test caught exactly that (the TPC-H
    fixtures' customer counts are divisible by 5, so the RFM oracle
    alone could never see it)."""
    k = 5
    for n in (3, 10, 11, 12, 13, 14):
        df = spark.range(n).select(F.col("id"))
        ranked = with_global_rank(df, [F.col("id").asc()])
        q, rem = divmod(n, k)
        thr = rem * (q + 1)
        got = {
            r["id"]: r["b"]
            for r in ranked.select(
                "id",
                F.expr(
                    f"cast(if(__rank <= {thr}L,"
                    f" (__rank - 1) div {q + 1}L + 1,"
                    f" {rem}L + (__rank - 1 - {thr}L)"
                    f" div {max(q, 1)}L + 1) as int)"
                ).alias("b")).collect()
        }
        w = Window.orderBy("id")
        want = {r["id"]: r["nt"] for r in df.select(
            "id", F.ntile(k).over(w).alias("nt")).collect()}
        assert got == want, f"n={n}"


def test_rfm_matches_window_ntile_on_ragged_n(spark):
    """rfm_segments end-to-end against a plain ntile-window reference
    on an entity count NOT divisible by the bucket count (23 % 5 = 3),
    the case the fixture tables can't exercise."""
    from deltalake_spark.operators.analytics import rfm_segments

    rows = []
    for e in range(23):
        for j in range((e % 4) + 1):
            rows.append((e, f"1998-0{(j % 6) + 1}-15",
                         100.0 + 7 * e + 3 * j))
    df = spark.createDataFrame(rows, "cust long, d string, amt double")
    got = sorted(
        tuple(r) for r in rfm_segments(
            df, entity_col="cust", date_col="d", amount_col="amt",
            asof="1998-08-02", buckets=5).collect())

    base = df.groupBy("cust").agg(
        F.datediff(F.lit("1998-08-02").cast("date"),
                   F.max(F.col("d").cast("date"))).alias("rec"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("amt") * 100).cast("long")).alias("cents"))
    w_r = Window.orderBy(F.col("rec").asc(), F.col("cust").asc())
    w_f = Window.orderBy(F.col("freq").desc(), F.col("cust").asc())
    w_m = Window.orderBy(F.col("cents").desc(), F.col("cust").asc())
    ref = base.select(
        "cents",
        (F.lit(6) - F.ntile(5).over(w_r)).alias("r_score"),
        (F.lit(6) - F.ntile(5).over(w_f)).alias("f_score"),
        (F.lit(6) - F.ntile(5).over(w_m)).alias("m_score"),
    ).groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"))
    want = sorted(tuple(r) for r in ref.collect())
    assert got == want
