"""Session-lifetime cache hygiene (r5 verdict ask #6): operators that
pin intermediates with persist() must leave a session that can get back
to ZERO cached RDDs via release_caches() — repeated invocation in a
long-lived session (bench, notebooks) must not accumulate storage."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.session import cached_rdd_count, release_caches


def _shingled_docs(spark):
    from deltalake_spark.operators.dedup import word_shingles

    rows = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select("doc_id", word_shingles(F.col("text"), 3).alias("sh"))


def test_prefix_jaccard_repeat_invocations_release_to_zero(spark):
    from deltalake_spark.operators.dedup import prefix_jaccard_join

    release_caches(spark)  # clean slate regardless of suite order
    docs = _shingled_docs(spark)
    for _ in range(2):
        res = prefix_jaccard_join(
            docs, id_col="doc_id", tokens_col="sh",
            threshold_num=1, threshold_den=2)
        assert res.count() >= 0  # materialize per the caller contract
        assert cached_rdd_count(spark) > 0  # pins exist while in use
        dropped = release_caches(spark)
        assert dropped > 0
        assert cached_rdd_count(spark) == 0


def test_iterative_graph_op_releases_to_zero(spark):
    from deltalake_spark.operators.graph import pagerank_fixed_point

    release_caches(spark)
    edges = spark.createDataFrame(
        [(i % 17, (i * 3) % 17) for i in range(100)], "src long, dst long")
    pr = pagerank_fixed_point(edges, src="src", dst="dst", n_iter=3)
    assert pr.count() > 0
    release_caches(spark)
    assert cached_rdd_count(spark) == 0
