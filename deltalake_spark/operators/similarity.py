"""Similarity search over embedding columns (``array<float>``).

The reference has no vector operators; this is north-star functionality for
LLM data pipelines at 100 TB. Two tiers:

- **Brute force** (:func:`brute_force_topk`) — exact cosine top-k against a
  query vector. The query row is broadcast; the scan is embarrassingly
  parallel; a single ``orderBy().limit(k)`` top-k (Spark plans TakeOrdered,
  no full sort shuffle).
- **LSH-bucketed** (:func:`lsh_topk`) — random-hyperplane sketches block
  the corpus so only matching buckets are scanned: the scale path where a
  full scan per query is unaffordable. Multi-probe (flipping sketch bits)
  trades recall for scan width.

All math is JVM-side (``zip_with``/``aggregate`` higher-order functions) in
double precision — no Python UDF in the hot path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two array columns, computed in double precision."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a.cast("array<double>"), F.lit(0.0),
                    lambda acc, x: acc + x * x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (l2_norm_expr(a) * l2_norm_expr(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    vec_col: str = "embedding",
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k against a literal query vector.

    Catalyst plans the final ``orderBy().limit()`` as TakeOrderedAndProject
    — each partition keeps its local top-k, only k rows per partition move.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    if metric == "cosine":
        score = cosine_expr(F.col(vec_col), q)
    elif metric == "dot":
        score = dot_expr(F.col(vec_col), q)
    elif metric == "l2":
        score = -F.sqrt(
            F.aggregate(
                F.zip_with(F.col(vec_col).cast("array<double>"), q,
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    else:
        raise ValueError(f"Unknown metric {metric!r}")
    return (
        df.withColumn("score", F.round(score, 6))
        .orderBy(F.desc("score"))
        .limit(k)
    )


def _planes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]


def rh_sketch(vec_col: Column, *, dim: int, num_planes: int = 16,
              seed: int = 42) -> Column:
    """Random-hyperplane sign sketch as an int (bit i = sign of v·plane_i).

    Plane coefficients are literals folded into the plan — broadcast for
    free with the task binary, no join needed.
    """
    sketch = F.lit(0)
    for i, plane in enumerate(_planes(dim, num_planes, seed)):
        p = F.array(*[F.lit(c) for c in plane])
        bit = F.when(dot_expr(vec_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sketch = sketch + bit
    return sketch


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 12,
    probe_bits: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only rows whose sketch is within
    ``probe_bits`` Hamming distance of the query's sketch (multi-probe).

    At scale the table would be written bucketed/partitioned by sketch so
    the probe prunes files; here it prunes rows before the cosine math.
    """
    dim = len(query_vec)
    planes = _planes(dim, num_planes, seed)
    qsketch = 0
    for i, plane in enumerate(planes):
        if sum(c * x for c, x in zip(plane, query_vec)) >= 0:
            qsketch |= 1 << i
    probes = {qsketch}
    if probe_bits >= 1:
        for i in range(num_planes):
            probes.add(qsketch ^ (1 << i))

    sk = rh_sketch(F.col(vec_col), dim=dim, num_planes=num_planes, seed=seed)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("__sk", sk)
        .filter(F.col("__sk").isin(list(probes)))
        .withColumn("score", F.round(cosine_expr(F.col(vec_col), q), 6))
        .orderBy(F.desc("score"))
        .limit(k)
        .drop("__sk")
    )


def pairwise_topk_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    right_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Batch kNN: for every left row, top-k right rows by cosine, blocked
    by matching LSH sketch (bucket equi-join, shuffle on the sketch — never
    a cross join)."""
    from pyspark.sql.window import Window

    dim = left.select(F.size(F.col(vec_col))).first()[0]
    lsk = left.select(
        F.col(left_id).alias("__lid"), F.col(vec_col).alias("__lv")
    ).withColumn("__sk", rh_sketch(F.col("__lv"), dim=dim,
                                   num_planes=num_planes, seed=seed))
    rsk = right.select(
        F.col(right_id).alias("__rid"), F.col(vec_col).alias("__rv")
    ).withColumn("__sk", rh_sketch(F.col("__rv"), dim=dim,
                                   num_planes=num_planes, seed=seed))
    joined = lsk.join(rsk, "__sk").withColumn(
        "score", F.round(cosine_expr(F.col("__lv"), F.col("__rv")), 6)
    )
    w = Window.partitionBy("__lid").orderBy(F.desc("score"))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "score",
            F.col("__rn").alias("rank"),
        )
    )
