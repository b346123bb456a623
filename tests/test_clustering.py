"""Fixed-point distributed k-means (operators/clustering.py).

The determinism contract is the whole point: the quantized Lloyd's
recursion must be replayable bit-for-bit by an independent
implementation (numpy here, DuckDB SQL in the gate twin) and must be
invariant to input partitioning.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from deltalake_spark.operators.clustering import (
    _round_half_away,
    assign_to_centroids,
    kmeans_fit,
    quantize_to_grid,
)


def _numpy_kmeans(vecs: np.ndarray, ids: list[int], k: int, n_iter: int,
                  scale: int = 1_000_000):
    """Independent replay of the exact fixed-point recursion."""
    q = np.array([[_round_half_away(float(x) * scale) for x in v]
                  for v in vecs], dtype=object)  # exact ints
    order = np.argsort(ids, kind="stable")
    centroids = [list(q[i]) for i in order[:k]]

    def assign(cents):
        out = []
        for row in q:
            best = min(
                (sum(int(a - b) ** 2 for a, b in zip(row, c)), i)
                for i, c in enumerate(cents)
            )
            out.append(best)
        return out

    for _ in range(n_iter):
        a = assign(centroids)
        new = []
        for i in range(k):
            members = [q[j] for j, (_, ci) in enumerate(a) if ci == i]
            if not members:
                new.append(centroids[i])
            else:
                n = len(members)
                sums = [sum(int(m[d]) for m in members)
                        for d in range(len(q[0]))]
                new.append([_round_half_away(s / n) for s in sums])
        centroids = new
    return assign(centroids), centroids


def _mk_df(spark, vecs, ids, partitions=1):
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(partitions)


def test_matches_numpy_replay_exactly(spark):
    rng = random.Random(7)
    vecs = [[rng.uniform(-0.6, 0.6) for _ in range(8)] for _ in range(60)]
    # float32 round-trip so the Spark float column holds identical values
    vecs = np.array(vecs, dtype=np.float32)
    ids = list(range(60))
    df = _mk_df(spark, vecs, ids, partitions=7)

    assigned, centroids = kmeans_fit(df, k=4, n_iter=2)
    got = {r["vec_id"]: (r["sqdist"], r["cid"])
           for r in assigned.select("vec_id", "cid", "sqdist").collect()}

    ref_assign, ref_centroids = _numpy_kmeans(vecs, ids, k=4, n_iter=2)
    assert centroids == [list(map(int, c)) for c in ref_centroids]
    for i, (d, c) in enumerate(ref_assign):
        assert got[ids[i]] == (d, c), f"vec {i}"


def test_partitioning_invariance(spark):
    rng = random.Random(11)
    vecs = np.array([[rng.uniform(-1, 1) for _ in range(6)]
                     for _ in range(40)], dtype=np.float32)
    ids = list(range(40))
    results = []
    for parts in (1, 13):
        assigned, cents = kmeans_fit(_mk_df(spark, vecs, ids, parts),
                                     k=3, n_iter=3)
        results.append((sorted(
            tuple(r) for r in
            assigned.select("vec_id", "cid", "sqdist").collect()), cents))
    assert results[0] == results[1]


def test_empty_cluster_keeps_seed_centroid(spark):
    # two duplicated seed vectors: ties all break to the lower cid, so
    # cluster 1 is empty after the first assignment and must keep its
    # seed centroid instead of crashing or collapsing k
    vecs = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0], [1.0, 1.0]],
                    dtype=np.float32)
    df = _mk_df(spark, vecs, [0, 1, 2, 3])
    # iter 1: every row ties to cid 0 (seeds are identical), cluster 1
    # goes EMPTY and must keep its [0,0] seed; c0 moves to the global
    # mean. iter 2: the kept seed wins back the origin rows, c0 re-
    # centers on [1,1] — the empty cluster was rescued, k stayed 2.
    assigned, cents_1 = kmeans_fit(df, k=2, n_iter=1)
    assert cents_1 == [[500_000, 500_000], [0, 0]]
    assigned, cents_2 = kmeans_fit(df, k=2, n_iter=2)
    assert cents_2 == [[1_000_000, 1_000_000], [0, 0]]
    rows = {r["vec_id"]: (r["cid"], r["sqdist"])
            for r in assigned.collect()}
    assert rows == {0: (1, 0), 1: (1, 0), 2: (0, 0), 3: (0, 0)}


def test_inertia_nonincreasing_on_separated_data(spark):
    rng = random.Random(3)
    centers = [(-0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)]
    vecs = np.array([
        [cx + rng.uniform(-0.05, 0.05), cy + rng.uniform(-0.05, 0.05)]
        for cx, cy in centers for _ in range(20)
    ], dtype=np.float32)
    ids = list(range(len(vecs)))
    prev = None
    for n_iter in (0, 1, 2, 3):
        assigned, _ = kmeans_fit(_mk_df(spark, vecs, ids, 5),
                                 k=3, n_iter=n_iter)
        inertia = assigned.agg({"sqdist": "sum"}).collect()[0][0]
        if prev is not None:
            assert inertia <= prev
        prev = inertia


def test_assign_tie_breaks_lowest_cid(spark):
    df = _mk_df(spark, np.array([[0.5, 0.5]], dtype=np.float32), [0])
    qdf = df.withColumn("qvec", quantize_to_grid(df.embedding))
    out = assign_to_centroids(
        qdf, [[0, 0], [1_000_000, 1_000_000], [0, 0]])
    row = out.collect()[0]
    assert row["cid"] == 0 and row["sqdist"] == 2 * 500_000 ** 2


def test_validation_errors(spark):
    df = _mk_df(spark, np.array([[0.1, 0.2]], dtype=np.float32), [0])
    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=5)  # only 1 row
    with pytest.raises(ValueError):
        kmeans_fit(df, k=2, init=[[0, 0]])  # wrong init arity


def test_round_half_away_matches_duckdb_std_round():
    import duckdb

    rng = random.Random(19)
    xs = [rng.uniform(-1e6, 1e6) for _ in range(400)]
    xs += [2.5, -2.5, 0.5, -0.5, 1.5, -1.5, 0.49999999999999994,
           -0.49999999999999994, math.nextafter(2.5, 0),
           math.nextafter(2.5, 3)]
    con = duckdb.connect()
    for x in xs:
        want = con.execute("SELECT CAST(ROUND(CAST(? AS DOUBLE)) AS BIGINT)",
                           [x]).fetchone()[0]
        assert _round_half_away(x) == want, x
