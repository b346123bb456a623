"""Debezium-style CDC surface: Delta-CDF ↔ CDCRecord round trip, the
manual producer's sequence semantics (reference CDCProducer,
src/cdc/index.ts:305-453), and the JSON CDC write path
(src/cdc/index.ts:1462-1558 dual-format parity)."""

import glob
import os

from pyspark.sql import functions as F

from deltalake_spark.delta.debezium import (
    CDCProducer,
    from_debezium,
    to_debezium,
)
from deltalake_spark.delta.table import DeltaTable


def _dml_rounds(spark, path):
    t = DeltaTable(spark, path)
    t.write(spark.createDataFrame([], "id long, cat string, val double"))
    t.enable_cdc()
    t.write(spark.createDataFrame(
        [(i, f"c{i % 2}", float(i)) for i in range(6)],
        "id long, cat string, val double"))
    t.update({"id": {"$lt": 2}}, {"val": "val + 100"})
    t.delete({"id": 5})
    return t


def _feed_key(r):
    return (r["id"], r["_change_type"], r["_commit_version"],
            r["cat"], round(r["val"], 6))


def test_cdf_debezium_round_trip(spark, tmp_path):
    t = _dml_rounds(spark, str(tmp_path / "rt"))
    feed = t.read_changes()
    deb = to_debezium(feed, id_cols=["id"], database="db",
                      collection="tbl")
    rows = {r["_id"]: r for r in deb.collect()}
    # op mapping: inserts are 'c' with null _before
    assert rows["3"]["_op"] == "c" and rows["3"]["_before"] is None
    assert rows["3"]["_after"]["val"] == 3.0
    # updates collapse to one 'u' with both images
    assert rows["0"]["_op"] == "u"
    assert rows["0"]["_before"]["val"] == 0.0
    assert rows["0"]["_after"]["val"] == 100.0
    # delete: 'd' with null _after (id 5 appears twice: insert then delete)
    dels = [r for r in deb.collect() if r["_op"] == "d"]
    assert len(dels) == 1 and dels[0]["_after"] is None
    # _seq strictly increasing in commit order, _source carried
    seqs = [r["_seq"] for r in deb.orderBy("_seq").collect()]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    assert rows["3"]["_source"]["system"] == "deltalake"
    assert rows["3"]["_source"]["database"] == "db"
    assert rows["3"]["_txn"] == str(rows["3"]["_commit_version"]) \
        if "_commit_version" in rows["3"] else True

    # full inverse: back to CDF rows, identical multiset
    back = from_debezium(deb)
    assert sorted(_feed_key(r) for r in back.collect()) == \
        sorted(_feed_key(r) for r in feed.collect())
    # commit timestamps survive at microsecond precision
    orig_ts = {(r["id"], r["_change_type"]): r["_commit_timestamp"]
               for r in feed.collect()}
    for r in back.collect():
        assert r["_commit_timestamp"] == orig_ts[(r["id"], r["_change_type"])]


def test_producer_sequence_and_ops():
    p = CDCProducer(system="kafkalake", database="db", collection="users")
    r1 = p.create("u1", {"name": "Alice"})
    r2 = p.update("u1", {"name": "Alice"}, {"name": "Al"})
    r3 = p.delete("u1", {"name": "Al"}, txn="tx-9")
    snap = p.snapshot([("u2", {"name": "Bob"}), ("u3", {"name": "Eve"})])
    assert [r1["_seq"], r2["_seq"], r3["_seq"]] == [0, 1, 2]
    assert [s["_seq"] for s in snap] == [3, 4]
    assert p.get_sequence() == 5
    assert (r1["_op"], r2["_op"], r3["_op"], snap[0]["_op"]) == \
        ("c", "u", "d", "r")
    assert r1["_before"] is None and r3["_after"] is None
    assert r3["_txn"] == "tx-9" and "_txn" not in r1
    assert r1["_source"]["system"] == "kafkalake"
    assert r2["_ts"] >= r1["_ts"] > 0  # nanoseconds
    p.reset_sequence(100)
    assert p.create("u4", {})["_seq"] == 100


def test_json_cdc_write_format(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "jsoncdc"))
    t.write(spark.createDataFrame([], "id long, v double"))
    t.update_metadata({
        "delta.enableChangeDataFeed": "true",
        "delta.cdc.writeFormat": "json",
    })
    t.write(spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double"))
    t.update({"id": 1}, {"v": "v * 10"})
    files = glob.glob(os.path.join(t.path, "_change_data", "cdc-*"))
    assert files and all(f.endswith(".json") for f in files)
    feed = t.read_changes()
    assert feed.filter("_change_type = 'insert'").count() == 2
    post = feed.filter("_change_type = 'update_postimage'").collect()
    assert len(post) == 1 and post[0]["v"] == 10.0
    # typed read: version is long, timestamp is a real timestamp
    assert dict(feed.dtypes)["_commit_version"] == "bigint"
    assert dict(feed.dtypes)["_commit_timestamp"].startswith("timestamp")


def test_mixed_parquet_json_cdc(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "mixed"))
    t.write(spark.createDataFrame([], "id long, v double"))
    t.enable_cdc()
    t.write(spark.createDataFrame([(1, 1.0)], "id long, v double"))  # parquet
    t.update_metadata({"delta.cdc.writeFormat": "json"})
    t.write(spark.createDataFrame([(2, 2.0)], "id long, v double"))  # json
    feed = t.read_changes()
    assert feed.count() == 2
    assert {r["id"] for r in feed.collect()} == {1, 2}
