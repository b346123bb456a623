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


# ---------------------------------------------------------------------------
# dbscan_2d


def _dbscan(spark, pts, eps, min_pts, partitions=5, scale=1000):
    from deltalake_spark.operators.clustering import dbscan_2d

    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, x, y in pts],
        "pid long, x double, y double").repartition(partitions)
    out = dbscan_2d(df, id_col="pid", x_col="x", y_col="y",
                    eps=eps, min_pts=min_pts, scale=scale)
    return {r["id"]: (r["role"], r["cluster"]) for r in out.collect()}


_TWO_SQUARES = [
    # cluster A: unit square, all core at eps=1.5/min_pts=4
    (0, 0.0, 0.0), (1, 1.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 1.0),
    # cluster B: shifted square
    (4, 4.0, 0.0), (5, 5.0, 0.0), (6, 4.0, 1.0), (7, 5.0, 1.0),
    # border point exactly eps from a core in EACH cluster -> joins
    # the minimum cluster id (the determinism rule)
    (8, 2.5, 0.0),
    # noise
    (9, 10.0, 10.0),
    # cluster C: negative coordinates (floor-vs-truncate cell ids)
    (10, -5.5, -5.5), (11, -6.5, -5.5), (12, -5.5, -6.5),
    (13, -6.5, -6.5),
]


def test_dbscan_roles_clusters_and_negative_cells(spark):
    got = _dbscan(spark, _TWO_SQUARES, eps=1.5, min_pts=4)
    for pid in (0, 1, 2, 3):
        assert got[pid] == ("core", 0)
    for pid in (4, 5, 6, 7):
        assert got[pid] == ("core", 4)
    assert got[8] == ("border", 0)  # min of the two adjacent clusters
    assert got[9] == ("noise", None)
    for pid in (10, 11, 12, 13):
        assert got[pid] == ("core", 10)


def test_dbscan_partitioning_invariance(spark):
    a = _dbscan(spark, _TWO_SQUARES, eps=1.5, min_pts=4, partitions=1)
    b = _dbscan(spark, _TWO_SQUARES, eps=1.5, min_pts=4, partitions=13)
    assert a == b


def test_dbscan_min_pts_one_all_singleton_cores(spark):
    pts = [(0, 0.0, 0.0), (1, 50.0, 50.0)]
    got = _dbscan(spark, pts, eps=1.0, min_pts=1)
    # isolated cores: singleton clusters labeled by their own id
    assert got == {0: ("core", 0), 1: ("core", 1)}


def test_dbscan_cross_cell_neighbors_counted(spark):
    # two points 1.4 apart straddling a cell boundary (cells 0 and 1
    # at eps=1.0... use eps=1.5 so qeps=1500, coords 0.9 and 2.2 land
    # in cells 0 and 1) — the 9-cell probe must still pair them
    pts = [(0, 0.9, 0.0), (1, 2.2, 0.0), (2, 0.0, 0.0)]
    got = _dbscan(spark, pts, eps=1.5, min_pts=2)
    assert got[0] == ("core", 0)
    assert got[1] == ("core", 0)  # 1.3 from pid0: same component
    assert got[2] == ("core", 0)


def test_dbscan_validation(spark):
    import pytest as _pytest

    from deltalake_spark.operators.clustering import dbscan_2d

    df = spark.createDataFrame([(0, 0.0, 0.0)], "pid long, x double, y double")
    with _pytest.raises(ValueError):
        dbscan_2d(df, id_col="pid", x_col="x", y_col="y",
                  eps=0.0, min_pts=2)
    with _pytest.raises(ValueError):
        dbscan_2d(df, id_col="pid", x_col="x", y_col="y",
                  eps=1.0, min_pts=0)


class TestSimplifiedSilhouette:
    def test_matches_python_and_separation(self, spark):
        import math
        import random

        from deltalake_spark.operators.clustering import (
            simplified_silhouette,
        )
        from pyspark.sql import functions as F

        rng = random.Random(9)
        cents = [[0, 0], [1000, 1000]]
        rows = []
        for i in range(200):
            cid = i % 2
            base = cents[cid]
            rows.append((i, cid,
                         [base[0] + rng.randint(-50, 50),
                          base[1] + rng.randint(-50, 50)]))
        df = spark.createDataFrame(
            rows, "vec_id long, cid int, qvec array<long>")
        got = {r["cid"]: r for r in simplified_silhouette(
            df, cents).collect()}

        # python replay
        import collections
        agg = collections.defaultdict(lambda: dict(
            n=0, n_neg=0, n_low=0, n_mid=0, n_high=0, n_top=0,
            mins=None, maxs=None, sd=0))
        for _, cid, q in rows:
            ds = [sum((a - b) ** 2 for a, b in zip(q, c))
                  for c in cents]
            own = ds[cid]
            other = min(d for j, d in enumerate(ds) if j != cid)
            a, b = math.sqrt(own), math.sqrt(other)
            s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
            e = agg[cid]
            e["n"] += 1
            e["sd"] += own
            key = ("n_neg" if s < 0 else "n_low" if s < 0.25
                   else "n_mid" if s < 0.5 else "n_high" if s < 0.75
                   else "n_top")
            e[key] += 1
            e["mins"] = s if e["mins"] is None else min(e["mins"], s)
            e["maxs"] = s if e["maxs"] is None else max(e["maxs"], s)
        for cid in (0, 1):
            r, e = got[cid], agg[cid]
            assert (r["n"], r["n_neg"], r["n_low"], r["n_mid"],
                    r["n_high"], r["n_top"]) == \
                (e["n"], e["n_neg"], e["n_low"], e["n_mid"],
                 e["n_high"], e["n_top"])
            assert r["min_s"] == e["mins"] and r["max_s"] == e["maxs"]
            assert r["sum_sqdist_own"] == e["sd"]
            # tight, well-separated clusters: everything scores high
            assert r["n_top"] == r["n"]

    def test_point_on_centroid_zero_guard(self, spark):
        from deltalake_spark.operators.clustering import (
            simplified_silhouette,
        )

        # a point exactly ON its (duplicate) centroid: a=b=0 -> s=0
        df = spark.createDataFrame(
            [(1, 0, [5, 5])], "vec_id long, cid int, qvec array<long>")
        r = simplified_silhouette(df, [[5, 5], [5, 5]]).collect()[0]
        assert r["min_s"] == r["max_s"] == 0.0
