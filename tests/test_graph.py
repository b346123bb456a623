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


# ---------------------------------------------------------------------------
# pagerank_fixed_point


def _pr_ref(edge_list, n_iter=3, damping_pct=85, scale=10 ** 12):
    """Independent replay of the exact integer recursion."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    n = len(nodes)
    outdeg = {}
    for u, _ in edge_list:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = ((100 - damping_pct) * scale) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        mass = {v: 0 for v in nodes}
        for u, v in edge_list:
            mass[v] += (r[u] * damping_pct // 100) // outdeg[u]
        r = {v: base + mass[v] for v in nodes}
    return r


def _edges_df(spark, edge_list, partitions=3):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in edge_list], "src long, dst long"
    ).repartition(partitions)


def test_pagerank_matches_integer_replay(spark):
    from deltalake_spark.operators.graph import pagerank_fixed_point

    # a small web: hub (0), spokes, a cycle, and a dangling node (9)
    edges = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 4), (4, 5),
             (5, 3), (6, 0), (7, 0), (8, 0), (0, 9)]
    got = {r["node"]: r["rank_scaled"]
           for r in pagerank_fixed_point(
               _edges_df(spark, edges), n_iter=3).collect()}
    assert got == _pr_ref(edges, n_iter=3)


def test_pagerank_partitioning_invariance(spark):
    import random

    from deltalake_spark.operators.graph import pagerank_fixed_point

    rng = random.Random(5)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(120)})
    edges = [(u, v) for u, v in edges if u != v]
    runs = []
    for parts in (1, 11):
        runs.append(sorted(
            tuple(r) for r in pagerank_fixed_point(
                _edges_df(spark, edges, parts), n_iter=4).collect()))
    assert runs[0] == runs[1]
    assert runs[0] == sorted(_pr_ref(edges, n_iter=4).items())


def test_pagerank_hub_outranks_spokes(spark):
    from deltalake_spark.operators.graph import pagerank_fixed_point

    # every spoke points at the hub; hub points at one spoke
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    r = {row["node"]: row["rank_scaled"]
         for row in pagerank_fixed_point(
             _edges_df(spark, edges), n_iter=3).collect()}
    assert r[0] == max(r.values())
    assert r[1] > r[2]  # the hub's single out-link boosts node 1
    assert len(set(r[i] for i in range(2, 8))) == 1  # symmetric spokes


def test_pagerank_mass_bounded_and_dangling_leaks(spark):
    from deltalake_spark.operators.graph import pagerank_fixed_point

    scale = 10 ** 12
    # node 2 dangles: its damped mass leaks each iteration, so total
    # mass stays strictly below scale but above the teleport floor
    edges = [(0, 1), (1, 2)]
    r = pagerank_fixed_point(_edges_df(spark, edges), n_iter=3,
                             scale=scale)
    total = sum(row["rank_scaled"] for row in r.collect())
    assert total < scale
    assert total >= (15 * scale) // 100 // 3 * 3


def test_pagerank_validation(spark):
    import pytest as _pytest

    from deltalake_spark.operators.graph import pagerank_fixed_point

    df = _edges_df(spark, [(0, 1)])
    with _pytest.raises(ValueError):
        pagerank_fixed_point(df, damping_pct=0)
    with _pytest.raises(ValueError):
        pagerank_fixed_point(df, damping_pct=100)


# ---------------------------------------------------------------------------
# hits_fixed_point


def _hits_ref(edge_list, n_iter=2, scale=10 ** 12):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(n_iter):
        araw = {v: 0 for v in nodes}
        for u, v in edge_list:
            araw[v] += h[u]
        mx = max(araw.values())
        a = araw if mx == 0 else {v: (araw[v] * scale) // mx
                                  for v in nodes}
        hraw = {v: 0 for v in nodes}
        for u, v in edge_list:
            hraw[u] += a[v]
        mx = max(hraw.values())
        h = hraw if mx == 0 else {v: (hraw[v] * scale) // mx
                                  for v in nodes}
    return h, a


def test_hits_matches_integer_replay(spark):
    from deltalake_spark.operators.graph import hits_fixed_point

    edges = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4), (4, 0), (5, 2),
             (5, 1), (6, 6)]
    got = {r["node"]: (r["hub_scaled"], r["auth_scaled"])
           for r in hits_fixed_point(
               _edges_df(spark, edges), n_iter=2).collect()}
    h, a = _hits_ref(edges, n_iter=2)
    assert got == {v: (h[v], a[v]) for v in h}


def test_hits_hub_authority_separation(spark):
    from deltalake_spark.operators.graph import hits_fixed_point

    # bipartite: 0,1 point at 8,9 — pure hubs vs pure authorities
    edges = [(0, 8), (0, 9), (1, 8), (1, 9)]
    got = {r["node"]: (r["hub_scaled"], r["auth_scaled"])
           for r in hits_fixed_point(
               _edges_df(spark, edges), n_iter=2).collect()}
    scale = 10 ** 12
    for hub in (0, 1):
        assert got[hub] == (scale, 0)
    for auth in (8, 9):
        assert got[auth] == (0, scale)


def test_hits_partitioning_invariance(spark):
    import random

    from deltalake_spark.operators.graph import hits_fixed_point

    rng = random.Random(31)
    edges = list({(rng.randrange(25), rng.randrange(25))
                  for _ in range(100)})
    runs = []
    for parts in (1, 9):
        runs.append(sorted(
            tuple(r) for r in hits_fixed_point(
                _edges_df(spark, edges, parts), n_iter=3).collect()))
    assert runs[0] == runs[1]
    h, a = _hits_ref(edges, n_iter=3)
    assert runs[0] == sorted((v, h[v], a[v]) for v in h)


# -------------------------------------------------------- label propagation

def _lpa_reference(edges, n_iter):
    """Pure-Python synchronous LPA with the same deterministic rules:
    distinct-neighbor votes, max count, ties -> smallest label."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_lpa_two_triangles_with_bridge(spark):
    from deltalake_spark.operators.graph import label_propagation
    edges = [(1, 2), (2, 3), (1, 3),         # triangle A
             (10, 11), (11, 12), (10, 12),   # triangle B
             (3, 10)]                        # bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["community"] for r in
           label_propagation(df, n_iter=3).collect()}
    ref = _lpa_reference(edges, 3)
    assert out == ref
    # the two triangles resolve to different communities
    assert len({out[1], out[2]}) == 1
    assert len({out[10], out[11], out[12]}) == 1
    assert out[1] != out[11]


def test_lpa_matches_reference_on_random_graph(spark):
    import random
    from deltalake_spark.operators.graph import label_propagation
    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(60)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    for n_iter in (1, 2, 3):
        out = {r["node"]: r["community"] for r in
               label_propagation(df, n_iter=n_iter).collect()}
        assert out == _lpa_reference(edges, n_iter), n_iter


def test_lpa_multi_edges_collapse_and_partitioning_invariance(spark):
    from deltalake_spark.operators.graph import label_propagation
    # node 4's vote must not double-count the duplicated (4,1) edge:
    # neighbors {1, 2, 3}; labels {1: 1 vote, 2: 1, 3: 1} -> tie -> 1
    edges = [(4, 1), (4, 1), (1, 4), (4, 2), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["community"] for r in
           label_propagation(df, n_iter=1).collect()}
    assert out[4] == 1
    out2 = {r["node"]: r["community"] for r in
            label_propagation(df.repartition(7), n_iter=1).collect()}
    assert out == out2


def test_lpa_validation(spark):
    import pytest as _pytest
    from deltalake_spark.operators.graph import label_propagation
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError):
        label_propagation(df, n_iter=0)


# ------------------------------------------------------------ BFS distances

def test_bfs_hand_graph(spark):
    from deltalake_spark.operators.graph import bfs_distances
    # path 1->2->3->4 plus shortcut 1->3; directed
    edges = [(1, 2), (2, 3), (3, 4), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["hops"] for r in
           bfs_distances(df, source=1, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_hop_bound_leaves_null(spark):
    from deltalake_spark.operators.graph import bfs_distances
    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["hops"] for r in
           bfs_distances(df, source=1, max_hops=2).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: None}


def test_bfs_direction_and_unreachable(spark):
    from deltalake_spark.operators.graph import bfs_distances
    # edge 3->1 does NOT make 3 reachable from 1; 9-10 is an island
    edges = [(1, 2), (3, 1), (9, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["hops"] for r in
           bfs_distances(df, source=1, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: None, 9: None, 10: None}


def test_bfs_validation(spark):
    import pytest as _pytest
    from deltalake_spark.operators.graph import bfs_distances
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError):
        bfs_distances(df, source=1, max_hops=-1)


# ---------------------------------------------------------- link prediction

def test_link_prediction_hand_scores(spark):
    from deltalake_spark.operators.graph import link_prediction
    # square 1-2-3-4-1: candidates are the diagonals (1,3) and (2,4),
    # each with 2 common neighbors of degree 2
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {(r["node_u"], r["node_v"]): r for r in
           link_prediction(df, scale=1000).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    r = out[(1, 3)]
    assert r["common_neighbors"] == 2
    assert r["ra_scaled"] == 2 * (1000 // 2)


def test_link_prediction_excludes_existing_edges(spark):
    from deltalake_spark.operators.graph import link_prediction
    # triangle + pendant: (1,2),(2,3),(1,3),(3,4). Wedge pairs through
    # shared neighbors that are already edges must not appear.
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {(r["node_u"], r["node_v"]): r for r in
           link_prediction(df, scale=600).collect()}
    # candidates: (1,4) and (2,4) via center 3 (deg 3)
    assert set(out) == {(1, 4), (2, 4)}
    assert out[(1, 4)]["common_neighbors"] == 1
    assert out[(1, 4)]["ra_scaled"] == 600 // 3


def test_link_prediction_degree_cap_and_min_common(spark):
    from deltalake_spark.operators.graph import link_prediction
    # star center 0 with leaves 1..4 plus an edge 1-2: capping degree
    # at 3 drops all wedges through the hub
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    full = {(r["node_u"], r["node_v"]) for r in
            link_prediction(df).collect()}
    assert (3, 4) in full
    capped = {(r["node_u"], r["node_v"]) for r in
              link_prediction(df, max_degree=3).collect()}
    # hub (deg 4) removed as a center: only centers 1/2 (deg 2) remain,
    # and their wedge pairs are existing edges or hub pairs
    assert (3, 4) not in capped
    strict = {(r["node_u"], r["node_v"]) for r in
              link_prediction(df, min_common=2).collect()}
    assert all(p not in strict for p in [(3, 4)])


def test_link_prediction_validation(spark):
    import pytest as _pytest
    from deltalake_spark.operators.graph import link_prediction
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError):
        link_prediction(df, min_common=0)


class TestKCore:
    def _run(self, spark, edges, k, n_rounds=6):
        from deltalake_spark.operators.graph import k_core

        df = spark.createDataFrame(edges, "src long, dst long")
        return {r["node"]: r["degree"] for r in k_core(
            df, k=k, n_rounds=n_rounds).collect()}

    def test_triangle_with_tail(self, spark):
        # triangle 1-2-3 plus a tail 3-4-5: 2-core = the triangle
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
        got = self._run(spark, edges, k=2)
        assert got == {1: 2, 2: 2, 3: 2}

    def test_cascading_peel(self, spark):
        # a chain hanging off a 4-clique: peeling must cascade
        clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        chain = [(4, 5), (5, 6), (6, 7)]
        got = self._run(spark, clique + chain, k=3)
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}
        # k=4: nothing survives
        assert self._run(spark, clique + chain, k=4) == {}

    def test_matches_networkx_free_reference(self, spark):
        import random

        edges = set()
        rng = random.Random(13)
        while len(edges) < 120:
            a, b = rng.randint(0, 30), rng.randint(0, 30)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        got = self._run(spark, sorted(edges), k=4, n_rounds=20)

        # python peeling reference to the canonical fixpoint
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        alive = set(adj)
        while True:
            drop = {v for v in alive
                    if len(adj[v] & alive) < 4}
            if not drop:
                break
            alive -= drop
        want = {v: len(adj[v] & alive) for v in alive}
        assert got == want


def test_kcore_require_converged_raises_on_partial_peel(spark):
    """The CC r7 lesson applied to k-core: a path peels ~2 endpoints
    per round at k=2, so 1 round cannot converge on a 12-node path —
    require_converged=True must raise instead of returning the partial
    peel, and the converged run must return the true (empty) 2-core."""
    import pytest
    from pyspark.sql import functions as F

    from deltalake_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long")
    with pytest.raises(RuntimeError, match="partial peel"):
        k_core(edges, k=2, n_rounds=1, require_converged=True).collect()
    done = k_core(edges, k=2, n_rounds=10, require_converged=True)
    assert done.count() == 0  # a path has no 2-core
    # bounded-round contract unchanged by default: 1 round peels the
    # two endpoints only
    partial = k_core(edges, k=2, n_rounds=1)
    assert partial.count() == 11
