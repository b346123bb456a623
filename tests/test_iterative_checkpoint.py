"""The reliable-checkpoint option on the iterative family (r7 verdict
ask #6): ``checkpoint_dir=None`` keeps localCheckpoint /
persist+materialize (executor-resident — fine on local[k]); a path
switches to ``sparkContext.setCheckpointDir`` + ``Dataset.checkpoint``
so a multi-executor run survives executor loss mid-iteration.

The contract pinned here: BOTH strategies produce IDENTICAL output —
the flag changes fault-tolerance and round-boundary I/O, never
semantics.
"""

import pytest
from pyspark.sql import functions as F


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def chain_edges(spark):
    # a shuffled-id path (the shape that exposed the r1-r6 CC bug)
    # plus a separate triangle and an isolated self-loop node
    import random

    rng = random.Random(7)
    ids = list(range(100, 160))
    rng.shuffle(ids)
    path = list(zip(ids, ids[1:]))
    tri = [(1, 2), (2, 3), (3, 1)]
    edges = path + tri + [(999, 999)]
    return spark.createDataFrame(edges, "src long, dst long").persist()


def test_connected_components_checkpointed_identical(spark, tmp_path,
                                                     chain_edges):
    from deltalake_spark.operators.dedup import connected_components

    local = _rows(connected_components(chain_edges), "node", "component")
    reliable = _rows(
        connected_components(
            chain_edges, checkpoint_dir=str(tmp_path / "cc_ckpt")),
        "node", "component")
    assert local == reliable
    # and the checkpoint dir was actually used (files written)
    ckpt = tmp_path / "cc_ckpt"
    assert ckpt.exists() and any(ckpt.rglob("*"))


def test_pagerank_checkpointed_identical(spark, tmp_path, chain_edges):
    from deltalake_spark.operators.graph import pagerank_fixed_point

    local = _rows(pagerank_fixed_point(chain_edges, n_iter=3),
                  "node", "rank_scaled")
    reliable = _rows(
        pagerank_fixed_point(
            chain_edges, n_iter=3,
            checkpoint_dir=str(tmp_path / "pr_ckpt")),
        "node", "rank_scaled")
    assert local == reliable


def test_hits_lpa_bfs_kcore_checkpointed_identical(spark, tmp_path,
                                                   chain_edges):
    from deltalake_spark.operators.graph import (
        bfs_distances,
        hits_fixed_point,
        k_core,
        label_propagation,
    )

    d = str(tmp_path / "g_ckpt")
    assert _rows(hits_fixed_point(chain_edges, n_iter=2),
                 "node", "hub_scaled", "auth_scaled") == _rows(
        hits_fixed_point(chain_edges, n_iter=2, checkpoint_dir=d),
        "node", "hub_scaled", "auth_scaled")
    assert _rows(label_propagation(chain_edges, n_iter=3),
                 "node", "community") == _rows(
        label_propagation(chain_edges, n_iter=3, checkpoint_dir=d),
        "node", "community")
    assert _rows(bfs_distances(chain_edges, source=1, max_hops=3),
                 "node", "hops") == _rows(
        bfs_distances(chain_edges, source=1, max_hops=3,
                      checkpoint_dir=d),
        "node", "hops")
    assert _rows(k_core(chain_edges, k=2, n_rounds=6),
                 "node", "degree") == _rows(
        k_core(chain_edges, k=2, n_rounds=6, checkpoint_dir=d),
        "node", "degree")


def test_bpe_and_dbscan_checkpointed_identical(spark, tmp_path):
    from deltalake_spark.operators.bpe import train_bpe
    from deltalake_spark.operators.clustering import dbscan_2d

    docs = spark.createDataFrame(
        [("the cat sat on the mat the cat sat",)] * 8 + [("banana bandana",)] * 4,
        "text string")
    merges_local = train_bpe(docs, num_merges=6, checkpoint_every=2)
    merges_ckpt = train_bpe(docs, num_merges=6, checkpoint_every=2,
                            checkpoint_dir=str(tmp_path / "bpe_ckpt"))
    assert merges_local == merges_ckpt

    pts = spark.createDataFrame(
        [(i, 0.001 * i, 0.0) for i in range(6)]
        + [(100 + i, 10.0 + 0.001 * i, 5.0) for i in range(6)]
        + [(999, -50.0, -50.0)],
        "id long, x double, y double")
    a = _rows(dbscan_2d(pts, id_col="id", x_col="x", y_col="y",
                        eps=0.01, min_pts=3), "id", "role", "cluster")
    b = _rows(dbscan_2d(pts, id_col="id", x_col="x", y_col="y",
                        eps=0.01, min_pts=3,
                        checkpoint_dir=str(tmp_path / "db_ckpt")),
              "id", "role", "cluster")
    assert a == b


def test_deep_round_plans_stay_flat(spark):
    """k_core's round plan references the previous frame THREE times
    (degree -> alive on both semi-join sides) and BFS's twice, so
    persist-only rounds grow the logical tree 3^/2^rounds — at
    n_rounds=10 merely stringifying the plan for the SQL listener
    OOMed a 16g driver (full-suite r8 catch). The per-round lineage
    CUT keeps the plan O(1)/O(rounds); pinned here by plan-string
    size at deep round counts."""
    from deltalake_spark.operators.graph import bfs_distances, k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long")
    kc = k_core(edges, k=2, n_rounds=12)
    assert len(kc._jdf.queryExecution().toString()) < 20_000
    bd = bfs_distances(edges, source=0, max_hops=14)
    assert len(bd._jdf.queryExecution().toString()) < 60_000
    # and the results are still right: 12 rounds peel 24 of 31 path
    # nodes (documented partial peel); BFS reaches 15 nodes in 14 hops
    assert kc.count() == 7
    assert bd.filter("hops is not null").count() == 15
