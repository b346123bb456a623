"""End-to-end CDC replication pipeline: source table → change feed →
consumer → derived table, across inserts, updates, and deletes, with
offsets resuming mid-stream.

This is the lifecycle the reference's e2e tier exercises
(tests/e2e/table-lifecycle.test.ts, time-travel.test.ts) — here the
downstream apply is itself a Spark MERGE-shaped operation.
"""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.streaming.consumer import (
    CDCConsumer,
    FileOffsetStorage,
)


@pytest.fixture()
def source(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "src"))
    t.write(spark.createDataFrame(
        [(i, f"u{i}", float(i * 10)) for i in range(20)],
        "id long, name string, bal double",
    ))
    t.enable_cdc()
    return t


def _apply_changes(dst: DeltaTable, changes):
    """Replicate a polled CDC batch onto the destination table in commit
    order: upsert postimages/inserts, delete deletes."""
    rows = changes.orderBy("_commit_version").collect()
    for r in rows:
        d = r.asDict()
        op = d.pop("_change_type")
        d.pop("_commit_version", None)
        d.pop("_commit_timestamp", None)
        if op == "delete":
            dst.delete({"id": d["id"]})
        elif op in ("insert", "update_postimage"):
            src_df = dst.spark.createDataFrame(
                [tuple(d.values())], "id long, name string, bal double"
            )
            if dst.exists() and dst.query({"id": d["id"]}).count():
                dst.update({"id": d["id"]},
                           {"name": F.lit(d["name"]),
                            "bal": F.lit(d["bal"])})
            else:
                dst.write(src_df)


def test_cdc_replication_with_resume(spark, tmp_path, source):
    # bootstrap: snapshot copy (CDC only covers changes AFTER enable —
    # same as the reference; consumers seed from a snapshot read)
    dst = DeltaTable(spark, str(tmp_path / "dst"))
    dst.write(source.to_df())
    offsets = FileOffsetStorage(str(tmp_path / "offsets"))
    consumer = CDCConsumer(source, "replica", storage=offsets,
                           ops=["insert", "update_postimage", "delete"],
                           starting_version=source.version() + 1)

    # phase 1: an insert batch flows through the feed
    source.write(spark.createDataFrame(
        [(100, "u100", 5.0), (101, "u101", 6.0)],
        "id long, name string, bal double",
    ))
    batch = consumer.poll()
    assert {r["_change_type"] for r in batch.collect()} == {"insert"}
    _apply_changes(dst, batch)
    consumer.commit()
    assert dst.to_df().count() == 22

    # phase 2: mutate source; a NEW consumer instance resumes from the
    # committed offset (no re-delivery of phase-1 changes)
    source.update({"id": {"$lt": 5}}, {"bal": "bal + 1000"})
    source.delete({"id": {"$gte": 15, "$lt": 100}})
    consumer2 = CDCConsumer(source, "replica", storage=offsets,
                            ops=["insert", "update_postimage", "delete"])
    batch = consumer2.poll()
    types = {r["_change_type"] for r in batch.collect()}
    assert types == {"update_postimage", "delete"}
    _apply_changes(dst, batch)
    consumer2.commit()

    # destination equals source state exactly
    src_state = {(r["id"], r["name"], r["bal"])
                 for r in source.to_df().collect()}
    dst_state = {(r["id"], r["name"], r["bal"])
                 for r in dst.to_df().collect()}
    assert dst_state == src_state
    assert len(dst_state) == 17  # 20 + 2 inserts - 5 deleted
    assert all(b >= 1000.0 for (i, _n, b) in dst_state if i < 5)

    # phase 3: nothing new → empty poll
    consumer3 = CDCConsumer(source, "replica", storage=offsets)
    assert consumer3.poll().count() == 0
