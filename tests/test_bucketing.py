"""Bucketed co-located joins: matching bucket layouts elide the join
shuffle entirely, and verify_colocated catches silent de-bucketing
(mismatched bucket counts reintroduce Exchanges)."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.bucketing import (
    read_bucketed,
    verify_colocated,
    write_bucketed,
)
from deltalake_spark.plans.explain import plan_summary


@pytest.fixture(scope="module")
def bucketed(spark):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a"))
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("b"))
    write_bucketed(left, "tbkt_left", bucket_cols=["k"], num_buckets=4,
                   sort_cols=["k"])
    write_bucketed(right, "tbkt_right", bucket_cols=["k"], num_buckets=4,
                   sort_cols=["k"])
    write_bucketed(right, "tbkt_right8", bucket_cols=["k"], num_buckets=8,
                   sort_cols=["k"])
    yield
    for t in ("tbkt_left", "tbkt_right", "tbkt_right8"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_matching_buckets_no_shuffle(spark, bucketed):
    lt, rt = read_bucketed(spark, "tbkt_left"), read_bucketed(
        spark, "tbkt_right")
    joined = lt.hint("merge").join(rt, "k")
    verify_colocated(joined)  # must not raise
    s = plan_summary(joined)
    assert s.sort_merge_joins == 1 and s.shuffles == 0
    assert joined.count() == 5_000


def test_mismatched_buckets_detected(spark, bucketed):
    lt = read_bucketed(spark, "tbkt_left")
    r8 = read_bucketed(spark, "tbkt_right8")
    joined = lt.hint("merge").join(r8, "k")
    # results stay correct — only the plan degrades; that's exactly why
    # the verifier exists
    assert joined.count() == 5_000
    with pytest.raises(AssertionError, match="0 shuffles"):
        verify_colocated(joined)


def test_bucketed_agg_reuses_layout(spark, bucketed):
    """groupBy on the bucket key also runs shuffle-free: the bucketed
    scan satisfies the aggregation's required distribution."""
    lt = read_bucketed(spark, "tbkt_left")
    agg = lt.groupBy("k").agg(F.sum("a").alias("s"))
    s = plan_summary(agg)
    assert s.shuffles == 0
    assert agg.count() == 10_000
