"""Streaming → Delta sink: SetTransaction-based exactly-once append and
MERGE upsert mode; txn watermarks survive checkpoint + log cleanup."""

import os

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.streaming.sink import delta_stream_sink
from deltalake_spark.streaming.windowed import read_parquet_stream


@pytest.fixture()
def src_dir(spark, tmp_path):
    d = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"k{i % 3}", float(i)) for i in range(30)],
        "id long, k string, v double",
    ).coalesce(2).write.parquet(d)
    return d


def test_append_sink_exactly_once(spark, src_dir, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "sink"))
    stream = read_parquet_stream(spark, src_dir)
    delta_stream_sink(stream, t, app_id="ingest-1",
                      checkpoint_dir=str(tmp_path / "cp1"))
    assert t.to_df().count() == 30
    assert t.last_txn_version("ingest-1") >= 0

    # replay without a checkpoint: batch ids restart at 0, which is at or
    # below the committed txn watermark → the sink must skip, not double
    stream2 = read_parquet_stream(spark, src_dir)
    delta_stream_sink(stream2, t, app_id="ingest-1")
    assert t.to_df().count() == 30

    # a DIFFERENT app id is an independent stream → appends
    stream3 = read_parquet_stream(spark, src_dir)
    delta_stream_sink(stream3, t, app_id="ingest-2")
    assert t.to_df().count() == 60


def test_append_sink_multi_batch(spark, src_dir, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "sinkmb"))
    stream = read_parquet_stream(spark, src_dir, max_files_per_trigger=1)
    delta_stream_sink(stream, t, app_id="mb",
                      checkpoint_dir=str(tmp_path / "cpmb"))
    assert t.to_df().count() == 30
    # two source files → two micro-batches → watermark advanced past 0
    assert t.last_txn_version("mb") >= 1


def test_upsert_sink_merges_by_key(spark, tmp_path):
    base = str(tmp_path / "upd")
    spark.createDataFrame(
        [("k0", 1.0), ("k1", 10.0)], "k string, v double"
    ).coalesce(1).write.parquet(base)

    t = DeltaTable(spark, str(tmp_path / "sinku"))
    t.write(spark.createDataFrame(
        [("k0", 0.0), ("k2", 99.0)], "k string, v double"))

    stream = read_parquet_stream(spark, base)
    delta_stream_sink(stream, t, app_id="ups", mode="upsert",
                      merge_keys=["k"],
                      checkpoint_dir=str(tmp_path / "cpu"))
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got == {"k0": 1.0, "k1": 10.0, "k2": 99.0}

    with pytest.raises(ValueError, match="merge_keys"):
        delta_stream_sink(stream, t, app_id="x", mode="upsert")


def test_txn_survives_checkpoint_and_cleanup(spark, tmp_path):
    from deltalake_spark.delta.maintenance import cleanup_log
    from deltalake_spark.delta.snapshot import CHECKPOINT_INTERVAL

    t = DeltaTable(spark, str(tmp_path / "txncp"))
    t.write(spark.createDataFrame([(0,)], "id long"),
            _extra_actions=[{"txn": {"appId": "app-a", "version": 7}}])
    # push past a checkpoint boundary so replay starts from the checkpoint
    for i in range(CHECKPOINT_INTERVAL + 1):
        t.write(spark.createDataFrame([(i + 1,)], "id long"))
    assert t.last_txn_version("app-a") == 7
    cleanup_log(t, retain_checkpoints=1)
    # commit 0 (which carried the txn) may be pruned; the checkpoint must
    # have preserved the watermark
    assert t.last_txn_version("app-a") == 7
    assert t.last_txn_version("other") == -1
