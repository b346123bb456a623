"""Regression tests for the round-2 advisor findings (ADVICE.md):

1. a foreign column-mapped table using the STANDARD layout (per-field
   delta.columnMapping.physicalName in schemaString metadata) must read
   correctly, and a mode-declaring table with NO resolvable mapping must
   be refused, not silently read with logical names;
2. feature-enabling commits must upgrade the table protocol per the
   Delta spec (constraints -> writer 3, CDF -> writer 4, name column
   mapping -> (2, 5));
3. $lastN preserves original order (covered in test_pipeline);
4. drop_column must detect backquoted identifier references in CHECK
   constraints;
5. apply_lookup: null localField matches null foreignField (Mongo
   semantics) and a pre-existing output column is overwritten, not
   duplicated.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import (
    UnsupportedProtocolError,
    ValidationError,
)
from deltalake_spark.functions.pipeline import apply_pipeline


def _commit(log_dir, version, actions):
    path = os.path.join(log_dir, f"{version:020d}.json")
    with open(path, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _foreign_mapped_table(tmp_path, *, physical_meta, extra_conf=None):
    """Hand-author a column-mapped table: parquet columns use PHYSICAL
    names; schemaString carries logical names (and, when physical_meta,
    standard per-field physicalName metadata)."""
    root = str(tmp_path / "fmap")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    dest = os.path.join(root, "f1.parquet")
    pq.write_table(
        pa.table({"col-aaa": pa.array([1, 2, 3], pa.int64()),
                  "col-bbb": pa.array(["x", "y", "z"], pa.string())}),
        dest,
    )
    fields = []
    for logical, phys, typ in (("id", "col-aaa", "long"),
                               ("v", "col-bbb", "string")):
        meta = {"delta.columnMapping.physicalName": phys,
                "delta.columnMapping.id": len(fields) + 1} \
            if physical_meta else {}
        fields.append({"name": logical, "type": typ, "nullable": True,
                       "metadata": meta})
    conf = {"delta.columnMapping.mode": "name"}
    conf.update(extra_conf or {})
    _commit(log, 0, [
        {"commitInfo": {"operation": "WRITE",
                        "timestamp": 1700000000000}},
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "foreign-map-1", "format": {"provider": "parquet"},
            "schemaString": json.dumps({"type": "struct",
                                        "fields": fields}),
            "partitionColumns": [], "configuration": conf,
            "createdTime": 1700000000000,
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": os.path.getsize(dest),
                 "modificationTime": 1700000000000, "dataChange": True}},
    ])
    return root


def test_foreign_physicalname_metadata_layout_reads(spark, tmp_path):
    """Standard layout: mapping resolved from schemaString field
    metadata — logical names must surface the physical columns' data."""
    root = _foreign_mapped_table(tmp_path, physical_meta=True)
    t = DeltaTable(spark, root)
    rows = {r["id"]: r["v"] for r in t.query({}).collect()}
    assert rows == {1: "x", 2: "y", 3: "z"}
    # filters on logical names hit the mapped physical columns
    assert t.query({"id": {"$gte": 2}}).count() == 2


def test_foreign_mapping_mode_without_mapping_refused(spark, tmp_path):
    """mode=name declared but neither map config nor physicalName
    metadata present: the r2 silent-null case — must refuse."""
    root = _foreign_mapped_table(tmp_path, physical_meta=False)
    t = DeltaTable(spark, root)
    with pytest.raises(UnsupportedProtocolError,
                       match="columnMapping"):
        t.query({}).collect()


def test_foreign_id_mapping_mode_refused(spark, tmp_path):
    """mode=id resolves by parquet field id, which this name-based
    reader cannot honor — refuse rather than misread."""
    root = _foreign_mapped_table(
        tmp_path, physical_meta=True,
        extra_conf={"delta.columnMapping.mode": "id"})
    t = DeltaTable(spark, root)
    with pytest.raises(UnsupportedProtocolError, match="id"):
        t.query({}).collect()


def test_constraint_commit_upgrades_protocol(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1,)], "id long"))
    proto = t.snapshot().protocol
    assert int(proto["minWriterVersion"]) == 2
    t.add_check_constraint("pos", "id > 0")
    proto = t.snapshot().protocol
    assert int(proto["minWriterVersion"]) >= 3


def test_cdc_enable_upgrades_protocol(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1,)], "id long"))
    t.enable_cdc()
    assert int(t.snapshot().protocol["minWriterVersion"]) >= 4


def test_rename_column_upgrades_protocol_and_still_writes(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.rename_column("v", "w")
    proto = t.snapshot().protocol
    assert int(proto["minReaderVersion"]) >= 2
    assert int(proto["minWriterVersion"]) >= 5
    # this engine supports writer 5: subsequent writes must still work
    t.write(spark.createDataFrame([(2, "b")], "id long, w string"))
    assert t.query({}).count() == 2


def test_protocol_never_downgrades(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.rename_column("v", "w")          # -> (2, 5)
    t.add_check_constraint("pos", "id > 0")  # floor (1, 3): no downgrade
    proto = t.snapshot().protocol
    assert (int(proto["minReaderVersion"]),
            int(proto["minWriterVersion"])) == (2, 5)


def test_generated_columns_write_refused(spark, tmp_path):
    """Writer-4 generated columns are not computed by this engine: a
    table whose schema carries delta.generationExpression must refuse
    writes instead of leaving the generated column stale."""
    root = str(tmp_path / "gen")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    dest = os.path.join(root, "f1.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64()),
                             "id2": pa.array([2], pa.int64())}), dest)
    _commit(log, 0, [
        {"commitInfo": {"operation": "WRITE",
                        "timestamp": 1700000000000}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {"metaData": {
            "id": "gen-1", "format": {"provider": "parquet"},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "id2", "type": "long", "nullable": True,
                 "metadata": {
                     "delta.generationExpression": "id * 2"}},
            ]}),
            "partitionColumns": [], "configuration": {},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": os.path.getsize(dest),
                 "modificationTime": 1700000000000, "dataChange": True}},
    ])
    t = DeltaTable(spark, root)
    assert t.query({}).count() == 1  # reading is fine
    with pytest.raises(UnsupportedProtocolError, match="generat"):
        t.write(spark.createDataFrame([(3, 6)], "id long, id2 long"))


def test_drop_column_detects_backquoted_constraint_ref(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 2)], "id long, v long"))
    t.add_check_constraint("vpos", "`v` > 0")
    with pytest.raises(ValidationError, match="vpos"):
        t.drop_column("v")
    # boundary check still holds: 'id' inside `valid` must not block
    t.write(spark.createDataFrame(
        [(1, 2, 3)], "id long, v long, valid long"), merge_schema=True)
    t.add_check_constraint("ok", "`valid` >= 0")
    t.drop_column("id")  # not referenced -> allowed


def test_lookup_null_key_matches_null_foreign(spark):
    orders = spark.createDataFrame(
        [(1, "c1"), (2, None)], "oid int, cust string")
    custs = spark.createDataFrame(
        [("c1", "alice"), (None, "ghost")], "cid string, name string")
    out = apply_pipeline(
        orders,
        [{"$lookup": {"from": custs, "localField": "cust",
                      "foreignField": "cid", "as": "matches"}}],
    )
    rows = {r["oid"]: r["matches"] for r in out.collect()}
    assert [m["name"] for m in rows[1]] == ["alice"]
    # Mongo: null localField matches docs with null foreignField
    assert [m["name"] for m in rows[2]] == ["ghost"]


def test_lookup_overwrites_existing_output_column(spark):
    orders = spark.createDataFrame(
        [(1, "c1", "stale")], "oid int, cust string, matches string")
    custs = spark.createDataFrame([("c1", "alice")],
                                  "cid string, name string")
    out = apply_pipeline(
        orders,
        [{"$lookup": {"from": custs, "localField": "cust",
                      "foreignField": "cid", "as": "matches"}}],
    ).collect()
    assert len(out) == 1
    assert [m["name"] for m in out[0]["matches"]] == ["alice"]


def test_rename_writes_standard_physicalname_metadata(spark, tmp_path):
    """Our column-mapped tables must be readable by SPEC readers: after
    a rename, schemaString fields carry delta.columnMapping.physicalName
    and .id, and the table still reads correctly with the engine-local
    map config REMOVED (the standard-metadata fallback path)."""
    import json as _json

    from deltalake_spark.delta import log as dlog
    from deltalake_spark.delta.table import DeltaTable

    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")],
                                  "id long, v string"))
    t.rename_column("v", "w")
    snap = t.snapshot()
    fields = {f["name"]: f for f in
              _json.loads(snap.schema_string)["fields"]}
    md = fields["w"]["metadata"]
    assert md["delta.columnMapping.physicalName"] == "v"
    assert isinstance(md["delta.columnMapping.id"], int)
    assert int(snap.configuration["delta.columnMapping.maxColumnId"]) >= 2

    # strip the engine map config; the standard metadata must carry it
    meta = dict(snap.metadata)
    conf = dict(meta["configuration"])
    del conf["delta.columnMapping.map"]
    meta["configuration"] = conf
    dlog.write_commit(t.path, snap.version + 1, [
        dlog.commit_info_action("TEST STRIP MAP", {}),
        {"metaData": meta},
    ])
    rows = {r["id"]: r["w"] for r in t.query({}).collect()}
    assert rows == {1: "a", 2: "b"}
    assert t.query({"w": "b"}).count() == 1

    # ids survive further evolution: drop + re-add gets a FRESH id
    t2 = DeltaTable(spark, str(tmp_path / "t2"))
    t2.write(spark.createDataFrame([(1, "a")], "id long, v string"))
    t2.rename_column("v", "w")
    id_w = {
        f["name"]: f["metadata"]["delta.columnMapping.id"]
        for f in _json.loads(t2.snapshot().schema_string)["fields"]
    }["w"]
    t2.drop_column("w")
    t2.write(spark.createDataFrame([(2, "x")], "id long, w string"),
             merge_schema=True)
    snap2 = t2.snapshot()
    f_w = {f["name"]: f for f in
           _json.loads(snap2.schema_string)["fields"]}["w"]
    assert f_w["metadata"]["delta.columnMapping.id"] != id_w
    # and the re-added column never resurrects old data
    rows = {r["id"]: r["w"] for r in t2.query({}).collect()}
    assert rows == {1: None, 2: "x"}
