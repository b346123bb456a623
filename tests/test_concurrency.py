"""Concurrent-writer integration: optimistic concurrency + retry
(reference tests/integration/concurrent-writes.test.ts; OCC commit
src/delta/table.ts:450-460,795-816; retry src/delta/retry.ts:243-401).

Writers race on the same table from multiple threads of one Spark
session (the driver-side log is what's contended — commits are atomic
file creates). Every writer must land, each in its own version, with no
lost updates.
"""

import threading

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.retry import RetryConfig, with_retry
from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import ConcurrencyError


def test_racing_writers_all_land(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "race"))
    t.write(spark.createDataFrame([(0, -1)], "writer long, seq long"))

    n_writers, per_writer = 6, 3
    errors: list[Exception] = []

    def writer(wid: int):
        try:
            for seq in range(per_writer):
                df = spark.createDataFrame(
                    [(wid, seq)], "writer long, seq long"
                )
                with_retry(
                    lambda df=df: t.write(df),
                    config=RetryConfig(max_attempts=40,
                                       initial_delay=0.005),
                )
        except Exception as e:  # surface to the main thread
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(w,))
        for w in range(1, n_writers + 1)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors

    # no lost updates: every (writer, seq) row present exactly once
    rows = t.to_df().groupBy("writer", "seq").count().collect()
    assert all(r["count"] == 1 for r in rows)
    assert len(rows) == n_writers * per_writer + 1
    # one commit per write: versions are dense 0..N
    assert t.version() == n_writers * per_writer


def test_conflict_without_retry_raises(spark, tmp_path):
    """A stale writer (version check against a snapshot that moved)
    must fail with ConcurrencyError, not silently overwrite."""
    import deltalake_spark.delta.log as dlog

    t = DeltaTable(spark, str(tmp_path / "c"))
    t.write(spark.createDataFrame([(1,)], "id long"))
    v = t.version()
    # simulate the losing side of a race: the version it targets is taken
    dlog.write_commit(t.path, v + 1, [dlog.commit_info_action("WRITE", {})])
    with pytest.raises(ConcurrencyError):
        dlog.write_commit(t.path, v + 1,
                          [dlog.commit_info_action("WRITE", {})])


def test_retry_metrics(spark, tmp_path):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConcurrencyError("/tmp/simulated", calls["n"])
        return "ok"

    out = with_retry(flaky,
                     config=RetryConfig(max_attempts=5,
                                        initial_delay=0.001))
    assert out == "ok" and calls["n"] == 3
