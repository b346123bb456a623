"""Foreign-writer interop: a _delta_log authored BY HAND (standard Delta
NDJSON action layout, as the reference's TS writer emits) with parquet
files written by pyarrow — none of it produced by this engine — must
load, prune, and query correctly. This is the conformance tier the
reference covers with DAT tables (SURVEY §5), scoped to the features we
implement."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable

SCHEMA_JSON = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        {"name": "part", "type": "string", "nullable": True,
         "metadata": {}},
    ],
})


def _commit(log_dir, version, actions):
    path = os.path.join(log_dir, f"{version:020d}.json")
    with open(path, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


@pytest.fixture()
def foreign_table(tmp_path):
    root = str(tmp_path / "ftable")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)

    def write_part(rel, ids, vs):
        dest = os.path.join(root, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64()),
                      "v": pa.array(vs, pa.string())}),
            dest,
        )
        return os.path.getsize(dest)

    s_a = write_part("part=a/f1.parquet", [1, 2, 3], ["x", "y", "z"])
    s_b = write_part("part=b/f2.parquet", [4, 5], ["p", "q"])

    _commit(log, 0, [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1700000000000}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "foreign-0001", "format": {"provider": "parquet"},
            "schemaString": SCHEMA_JSON, "partitionColumns": ["part"],
            "configuration": {}, "createdTime": 1700000000000,
        }},
        {"add": {"path": "part=a/f1.parquet",
                 "partitionValues": {"part": "a"}, "size": s_a,
                 "modificationTime": 1700000000000, "dataChange": True,
                 "stats": json.dumps({
                     "numRecords": 3, "minValues": {"id": 1},
                     "maxValues": {"id": 3}, "nullCount": {"id": 0}})}},
        {"add": {"path": "part=b/f2.parquet",
                 "partitionValues": {"part": "b"}, "size": s_b,
                 "modificationTime": 1700000000000, "dataChange": True,
                 "stats": json.dumps({
                     "numRecords": 2, "minValues": {"id": 4},
                     "maxValues": {"id": 5}, "nullCount": {"id": 0}})}},
    ])
    # v1: foreign writer removes partition b (remove without rewrite)
    _commit(log, 1, [
        {"commitInfo": {"operation": "DELETE", "timestamp": 1700000001000}},
        {"remove": {"path": "part=b/f2.parquet",
                    "deletionTimestamp": 1700000001000, "dataChange": True}},
    ])
    return root


def test_reads_foreign_log(spark, foreign_table):
    t = DeltaTable(spark, foreign_table)
    assert t.version() == 1
    df = t.to_df()
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]
    # partition values reconstituted from the directory layout
    assert {r.part for r in df.collect()} == {"a"}


def test_time_travel_to_foreign_v0(spark, foreign_table):
    t = DeltaTable(spark, foreign_table)
    v0 = t.to_df(version=0)
    assert sorted(r.id for r in v0.collect()) == [1, 2, 3, 4, 5]


def test_stats_pruning_on_foreign_stats(spark, foreign_table):
    t = DeltaTable(spark, foreign_table)
    rows = t.query({"id": {"$gte": 2}})
    got = sorted(r["id"] for r in
                 (rows.collect() if hasattr(rows, "collect") else rows))
    assert got == [2, 3]


def test_engine_can_extend_foreign_table(spark, foreign_table):
    t = DeltaTable(spark, foreign_table)
    t.write(spark.createDataFrame([(9, "w", "a")],
                                  "id long, v string, part string"))
    assert sorted(r.id for r in t.to_df().collect()) == [1, 2, 3, 9]
    assert t.version() == 2


def test_reads_foreign_non_hive_layout(spark, tmp_path):
    """The Delta spec does NOT require Hive directory layout — partition
    values come from add.partitionValues. A foreign table with FLAT
    data files (no part=x/ dirs) must read, filter, and prune
    correctly."""
    root = str(tmp_path / "flat")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)

    def write_flat(rel, ids, vs):
        dest = os.path.join(root, rel)
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64()),
                      "v": pa.array(vs, pa.string())}), dest)
        return os.path.getsize(dest)

    s1 = write_flat("f-aaa.parquet", [1, 2], ["x", "y"])
    s2 = write_flat("f-bbb.parquet", [3, 4], ["p", "q"])
    s3 = write_flat("f-ccc.parquet", [5], ["n"])
    adds = [
        ("f-aaa.parquet", {"part": "a"}, s1, 2),
        ("f-bbb.parquet", {"part": "b"}, s2, 2),
        # null partition: spec serializes as JSON null
        ("f-ccc.parquet", {"part": None}, s3, 1),
    ]
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "foreign-flat", "format": {"provider": "parquet"},
            "schemaString": SCHEMA_JSON, "partitionColumns": ["part"],
            "configuration": {}, "createdTime": 1700000000000,
        }},
    ] + [
        {"add": {"path": p, "partitionValues": pv, "size": s,
                 "modificationTime": 1700000000000, "dataChange": True,
                 "stats": json.dumps({"numRecords": n})}}
        for p, pv, s, n in adds
    ])

    t = DeltaTable(spark, root)
    rows = {(r["id"], r["part"]) for r in t.query({}).collect()}
    assert rows == {(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, None)}
    assert sorted(r["id"] for r in t.query({"part": "b"}).collect()) \
        == [3, 4]
    # partition pruning on log values still works without directories
    t.query({"part": "a"}).collect()
    assert t.last_query_skipped_files == 2
    # null partition readable
    assert [r["id"] for r in
            t.query({"part": {"$exists": False}}).collect()] == [5]


def test_foreign_partition_values_override_file_columns(spark, tmp_path):
    """Files that DO physically contain the partition column still read
    the LOG's values (spec: readers must use partitionValues)."""
    root = str(tmp_path / "override")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    dest = os.path.join(root, "g.parquet")
    pq.write_table(
        pa.table({"id": pa.array([7], pa.int64()),
                  "v": pa.array(["w"], pa.string()),
                  "part": pa.array(["stale"], pa.string())}), dest)
    _commit(log, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "foreign-ovr", "format": {"provider": "parquet"},
            "schemaString": SCHEMA_JSON, "partitionColumns": ["part"],
            "configuration": {}, "createdTime": 1700000000000,
        }},
        {"add": {"path": "g.parquet",
                 "partitionValues": {"part": "fresh"},
                 "size": os.path.getsize(dest),
                 "modificationTime": 1700000000000, "dataChange": True,
                 "stats": json.dumps({"numRecords": 1})}},
    ])
    t = DeltaTable(spark, root)
    assert [(r["id"], r["part"]) for r in t.query({}).collect()] \
        == [(7, "fresh")]
