"""r8 ADVICE regressions: iterative-loop storage hygiene and the
rolling-family frame-size guard.

- cut_lineage's setCheckpointDir guard compared the caller's raw path
  against sc.getCheckpointDir(), which Spark stores fs-qualified and
  UUID-suffixed (file:/tmp/ck/<uuid>) — the startswith never matched,
  so every call re-ran setCheckpointDir and minted a fresh UUID subdir
  while churning a context-global setting.
- reliable round files were never deleted (Spark doesn't clean
  checkpoint files), so a long CC/PageRank run accumulated
  rounds x frame-size in checkpoint_dir; RoundCutter now rotates.
- k_core/bfs per-round localCheckpoints lingered until GC — peak
  executor storage grew with round count instead of staying ~2 rounds.
- rolling_quantile/rolling_mad silently accepted any frame size; now
  an oversize window_rows raises at call time and an oversize
  data-density-dependent RANGE frame raises at runtime.
"""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.session import cached_rdd_count, release_caches


def test_cut_lineage_checkpoint_dir_is_idempotent(spark, tmp_path):
    from deltalake_spark.operators.iterative import cut_lineage

    df = spark.range(10)
    d = str(tmp_path / "ck")
    cut_lineage(df, checkpoint_dir=d)
    first = spark.sparkContext.getCheckpointDir()
    cut_lineage(df, checkpoint_dir=d)
    # same caller dir -> no re-set, so no fresh UUID subdir minted
    assert spark.sparkContext.getCheckpointDir() == first


def test_reliable_rounds_are_rotated_not_accumulated(spark, tmp_path):
    from deltalake_spark.operators.dedup import connected_components

    # a 40-node shuffled path needs several star-contraction rounds
    import random
    rng = random.Random(3)
    ids = list(range(40))
    rng.shuffle(ids)
    edges = spark.createDataFrame(
        list(zip(ids, ids[1:])), "src long, dst long")
    d = tmp_path / "cc_rot"
    out = connected_components(edges, checkpoint_dir=str(d))
    assert out.select("component").distinct().count() == 1
    # rotation: per cutter at most 1 in-grace round dir survives the
    # loop (plus the two keep-dirs for the canonical edge/node sets);
    # pre-fix this grew one dir per round
    round_dirs = [p for p in (d / _only(d)).iterdir()
                  if p.name.startswith("r")]
    keep_dirs = [p for p in (d / _only(d)).iterdir()
                 if p.name.startswith("keep")]
    assert len(keep_dirs) == 2
    assert len(round_dirs) <= 2


def _only(d):
    names = [p.name for p in d.iterdir()]
    assert len(names) == 1, names
    return names[0]


def test_local_kcore_blocks_bounded_across_rounds(spark):
    from deltalake_spark.operators.graph import k_core

    release_caches(spark)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long")
    kc = k_core(edges, k=2, n_rounds=12)
    assert kc.count() == 7
    # 12 rounds ran; pre-fix every round's localCheckpoint blocks
    # lingered (~13 persistent RDDs) — now the cutter keeps <= 2
    # rounds plus the persisted adjacency
    assert cached_rdd_count(spark) <= 4
    release_caches(spark)


def test_rolling_window_rows_over_max_frame_raises(spark):
    from deltalake_spark.operators.timeseries import (
        rolling_mad,
        rolling_quantile,
    )

    df = spark.createDataFrame([("a", 1, 1)], "k string, t long, v long")
    with pytest.raises(ValueError, match="max_frame"):
        rolling_quantile(df, group_cols=["k"], order_cols=["t"],
                         value_col="v", q_num=1, q_den=2,
                         window_rows=100_000)
    with pytest.raises(ValueError, match="max_frame"):
        rolling_mad(df, group_cols=["k"], order_cols=["t"],
                    value_col="v", window_rows=100_000)
    # explicit opt-out still works
    assert rolling_quantile(
        df, group_cols=["k"], order_cols=["t"], value_col="v",
        q_num=1, q_den=2, window_rows=100_000,
        max_frame=None).count() == 1


def test_rolling_range_frame_guard_fires_at_runtime(spark):
    from deltalake_spark.operators.timeseries import (
        rolling_mad,
        rolling_quantile,
    )
    from pyspark.errors import PySparkException

    # dense series: 20 rows inside one range_interval -> frame of 20
    # rows exceeds max_frame=5 only at RUNTIME (data-dependent)
    df = spark.createDataFrame(
        [("a", i, i) for i in range(20)], "k string, t long, v long")
    q = rolling_quantile(df, group_cols=["k"], order_cols=["t"],
                         value_col="v", q_num=1, q_den=2,
                         range_interval=1000, max_frame=5)
    with pytest.raises(PySparkException, match="max_frame"):
        q.collect()
    m = rolling_mad(df, group_cols=["k"], order_cols=["t"],
                    value_col="v", range_interval=1000, max_frame=5)
    with pytest.raises(PySparkException, match="max_frame"):
        m.collect()
    # under the bound: identical to the unguarded result
    ok = rolling_quantile(df, group_cols=["k"], order_cols=["t"],
                          value_col="v", q_num=1, q_den=2,
                          range_interval=3, max_frame=5)
    ref = rolling_quantile(df, group_cols=["k"], order_cols=["t"],
                           value_col="v", q_num=1, q_den=2,
                           range_interval=3, max_frame=None)
    assert sorted((r["t"], r["rolling_q"]) for r in ok.collect()) == \
        sorted((r["t"], r["rolling_q"]) for r in ref.collect())
