"""Graph operators (operators/graph.py): canonical edges, degrees,
degree-oriented triangle counting vs a brute-force reference."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.graph import (
    canonical_edges,
    degree_stats,
    triangle_count,
)


def _brute_triangles(edge_set):
    nodes = sorted({n for e in edge_set for n in e})
    tris = set()
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in edge_set and (b, c) in edge_set
                and (a, c) in edge_set):
            tris.add((a, b, c))
    return tris


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src long, dst long")


def test_canonical_edges(spark):
    df = _edges_df(spark, [(2, 1), (1, 2), (3, 3), (4, 5)])
    out = sorted(map(tuple, canonical_edges(df).collect()))
    assert out == [(1, 2), (4, 5)]  # ordered, deduped, no self-loop


def test_degree_stats(spark):
    edges = canonical_edges(_edges_df(spark, [(1, 2), (2, 3), (1, 3),
                                              (3, 4)]))
    deg = {r["node"]: r["degree"] for r in degree_stats(edges).collect()}
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}


@pytest.mark.parametrize("seed", [3, 11])
def test_triangle_count_matches_brute_force(spark, seed):
    # deterministic pseudo-random graph on 30 nodes
    rng = seed
    pairs = set()
    for _ in range(120):
        rng = (1103515245 * rng + 12345) % (1 << 31)
        a = rng % 30
        rng = (1103515245 * rng + 12345) % (1 << 31)
        b = rng % 30
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    edges = canonical_edges(_edges_df(spark, sorted(pairs)))
    want = _brute_triangles(pairs)
    got = triangle_count(edges).collect()[0]["n_triangles"]
    assert got == len(want), (got, len(want))
    # per-node: each triangle credits all three corners
    per_node = {r["node"]: r["n_triangles"]
                for r in triangle_count(edges, per_node=True).collect()}
    assert sum(per_node.values()) == 3 * len(want)
    from collections import Counter
    want_per = Counter(n for t in want for n in t)
    assert per_node == dict(want_per)


def test_triangle_count_star_has_none_clique_has_many(spark):
    # star K1,5: zero triangles despite max-degree hub
    star = canonical_edges(_edges_df(spark, [(0, i) for i in range(1, 6)]))
    assert triangle_count(star).collect()[0]["n_triangles"] == 0
    # K6: C(6,3) = 20 triangles
    k6 = canonical_edges(_edges_df(
        spark, [(a, b) for a in range(6) for b in range(a + 1, 6)]))
    assert triangle_count(k6).collect()[0]["n_triangles"] == 20
