"""IVF approximate-nearest-neighbor: recall vs brute force, determinism,
and plan shape (equi join on bucket, never a cross join)."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk_join,
    train_centroids,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(emb):
    return train_centroids(emb, k=8, iters=6)


def test_centroids_deterministic(emb, centroids):
    again = train_centroids(emb, k=8, iters=6)
    assert centroids == again
    assert len(centroids) == 8


def test_assignment_covers_all_buckets_reasonably(emb, centroids):
    counts = (
        ivf_assign(emb, centroids)
        .groupBy("bucket").count().collect()
    )
    total = sum(r["count"] for r in counts)
    assert total == emb.count()
    assert len(counts) >= 4  # k-means on real data fills most buckets


def test_recall_vs_brute_force(emb, centroids):
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    approx = ivf_topk_join(
        queries, emb.withColumnRenamed("vec_id", "corpus_id"), centroids,
        query_id="vec_id", corpus_id="corpus_id", k=10, nprobe=4,
    )
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r["vec_id"], set()).add(r["corpus_id"])
    hits = total = 0
    for q in queries.collect():
        exact = brute_force_topk(emb, list(q["embedding"]), k=10)
        exact_ids = {r["vec_id"] for r in exact.collect()}
        got = approx_sets.get(q["vec_id"], set())
        hits += len(exact_ids & got)
        total += len(exact_ids)
    recall = hits / total
    assert recall >= 0.5, f"recall {recall:.2f} too low"


def test_plan_is_equi_join(emb, centroids):
    queries = emb.limit(5)
    out = ivf_topk_join(queries,
                        emb.withColumnRenamed("vec_id", "corpus_id"),
                        centroids, query_id="vec_id",
                        corpus_id="corpus_id", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # colliding id names refuse loudly instead of duplicating columns
    with pytest.raises(ValueError, match="must differ"):
        ivf_topk_join(queries, emb, centroids,
                      query_id="vec_id", corpus_id="vec_id", k=5)


def test_large_codebook_pandas_path_matches_jvm(emb):
    """k > 64 switches ivf_assign to the Arrow-batched numpy probe; the
    two paths must agree bucket-for-bucket on the same centroids (the
    JVM literal-fold path is the ground truth at small k)."""
    import time

    from deltalake_spark.operators.similarity import _JVM_MAX_K, _probe_udf

    centroids = train_centroids(emb, k=96, iters=3, sample=2048)
    assert len(centroids) > _JVM_MAX_K  # really exercises the UDF path
    sub = emb.limit(400)
    via_udf = ivf_assign(sub, centroids, nprobe=1)
    # force the JVM expression path on the same centroids for comparison
    jvm_sub = centroids[:_JVM_MAX_K]
    a = {r["vec_id"]: r["bucket"]
         for r in ivf_assign(sub, jvm_sub, nprobe=1).collect()}
    b_udf = _probe_udf(jvm_sub, 1)
    b = {r["vec_id"]: r["b"]
         for r in sub.select("vec_id",
                             b_udf(F.col("embedding"))[0].alias("b"))
         .collect()}
    assert a == b  # numpy probe ≡ JVM fold on identical codebook
    # and the large-k path is well-formed end to end: every vector lands
    # in a real bucket
    buckets = [r["bucket"] for r in via_udf.collect()]
    assert all(0 <= x < 96 for x in buckets)
    t0 = time.perf_counter()
    n = ivf_assign(emb, centroids, nprobe=4).count()
    dt = time.perf_counter() - t0
    print(f"large-k(96) nprobe=4 assignment over {n} vectors: {dt:.2f}s")


def test_hash_sample_is_layout_independent(spark):
    """r9 VERDICT #4: with id_col the training sample is the `sample`
    smallest portable-hash priorities (ties by id) — pinned here
    against a Python re-derivation, and invariant to repartitioning."""
    from deltalake_spark.operators.similarity import (
        _hash_sample, train_centroids)

    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vid long, embedding array<double>")

    def pri(i, seed=42):
        return ((i + seed) * 2654435761) % 2 ** 32

    expect = sorted(range(50), key=lambda i: (pri(i), i))[:10]
    got = [r["__id"] for r in _hash_sample(
        df, id_col="vid", vec_col="embedding", sample=10, seed=42
    ).collect()]
    assert got == expect
    # same sample (hence same codebook) under a hostile layout
    shuffled = df.repartition(13)
    c1 = train_centroids(df, vec_col="embedding", k=4, sample=10,
                         iters=3, id_col="vid")
    c2 = train_centroids(shuffled, vec_col="embedding", k=4, sample=10,
                         iters=3, id_col="vid")
    assert c1 == c2
