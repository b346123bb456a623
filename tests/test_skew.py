"""Skew operators: salted results must be identical to their unsalted
equivalents (salting changes the plan, never the answer)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deltalake_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
    salted_topk,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """One hot key (90% of rows) + long tail."""
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"),
        (F.col("id") % 700).alias("v"),
        F.col("id").alias("uid"),
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 30).alias("v"),
        (F.col("id") + 100000).alias("uid"),
    )
    return hot.unionByName(tail)


def test_salted_topk_matches_window(skewed):
    order = [F.desc("v"), F.asc("uid")]  # total order → exact parity
    got = salted_topk(skewed, key="k", order_by=order, k=5)
    w = Window.partitionBy("k").orderBy(*order)
    want = (
        skewed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_salted_topk_bounds_partition_width(skewed):
    order = [F.desc("v"), F.asc("uid")]
    got = salted_topk(skewed, key="k", order_by=order, k=3, num_salts=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # two window phases = two sorts; survivor set per key ≤ salts*k
    assert plan.count("Window") >= 2
    assert got.filter(F.col("k") == "hot").count() == 3


def test_salted_distinct_count_exact(skewed):
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_distinct_count(skewed, key="k", value="v").collect()
    }
    want = {
        r["k"]: r["nd"]
        for r in skewed.groupBy("k")
        .agg(F.count_distinct("v").alias("nd")).collect()
    }
    assert got == want and got["hot"] == 700


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"t{i}", f"T{i}") for i in range(50)],
        "k string, label string",
    )
    got = salted_join(skewed, dim, on="k").groupBy("label").count()
    want = skewed.join(dim, "k").groupBy("label").count()
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_salted_join_outer(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    got = salted_join(skewed, dim, on="k", how="left")
    assert got.count() == skewed.count()
    assert got.filter(F.col("label").isNull()).count() == 1000
