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
