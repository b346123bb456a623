"""Delta-spec deletion vector format: Z85 codec, RoaringBitmap
portable serialization, .bin file layout, and foreign-writer interop
(reference: src/delta/deletion-vectors.ts)."""

import json
import os
import struct
import uuid
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deltalake_spark.delta import deletion_vectors as dv
from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import ValidationError


# -- Z85 ------------------------------------------------------------------

def test_z85_golden_vector():
    # the ZeroMQ spec:32/Z85 reference vector
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(data) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == data


def test_z85_roundtrip_and_errors():
    for n in (4, 8, 16, 40):
        raw = bytes(range(n))
        assert dv.z85_decode(dv.z85_encode(raw)) == raw
    with pytest.raises(ValidationError):
        dv.z85_encode(b"abc")  # not multiple of 4
    with pytest.raises(ValidationError):
        dv.z85_decode("abcd")  # not multiple of 5
    with pytest.raises(ValidationError):
        dv.z85_decode('"""""')  # invalid character


def test_uuid_z85_roundtrip_with_prefix():
    u = uuid.UUID("12345678-9abc-def0-1234-56789abcdef0")
    enc = dv.encode_uuid_z85(u)
    assert len(enc) == 20
    prefix, decoded = dv.decode_uuid_z85("ab" + enc)
    assert (prefix, decoded) == ("ab", str(u))
    assert dv.decode_uuid_z85(enc) == ("", str(u))


# -- 32-bit roaring -------------------------------------------------------

def test_bitmap32_array_container_roundtrip():
    vals = [0, 1, 5, 100, 65535, 65536, 70000, (7 << 16) | 42]
    blob = dv.serialize_bitmap32(sorted(vals))
    out, consumed = dv.parse_bitmap32(blob)
    assert out == sorted(vals)
    assert consumed == len(blob)


def test_bitmap32_bitset_container_roundtrip():
    # > 4096 values in one 16-bit key space forces a bitset container
    vals = sorted(set(range(0, 60000, 7)))
    assert len(vals) > 4096
    blob = dv.serialize_bitmap32(vals)
    out, consumed = dv.parse_bitmap32(blob)
    assert out == vals
    assert consumed == len(blob)


def test_bitmap32_parses_run_containers():
    """Foreign writers may emit run containers; hand-craft one:
    cookie 12347 w/ 1 container flagged run, runs [10..14], [100..100]."""
    cookie = dv._SERIAL_COOKIE | ((1 - 1) << 16)
    blob = (struct.pack("<I", cookie)
            + bytes([0b1])              # run bitset: container 0 is run
            + struct.pack("<HH", 0, 6 - 1)   # key 0, cardinality 6
            + struct.pack("<H", 2)       # 2 runs
            + struct.pack("<HH", 10, 4)  # 10 + length-1=4 -> 10..14
            + struct.pack("<HH", 100, 0))
    out, consumed = dv.parse_bitmap32(blob)
    assert out == [10, 11, 12, 13, 14, 100]
    assert consumed == len(blob)


# -- treemap --------------------------------------------------------------

def test_treemap_roundtrip_including_high_bits():
    idx = [0, 3, 65536, 2**32 - 1, 2**32, 2**32 + 7, 2**33 + 12345]
    blob = dv.serialize_treemap(idx)
    # leading magic present (spec layout)
    assert struct.unpack_from("<I", blob, 0)[0] == dv.DV_MAGIC
    assert dv.parse_treemap(blob) == sorted(idx)
    # magic-less blob parses too (reference tolerance)
    assert dv.parse_treemap(blob[4:]) == sorted(idx)


def test_treemap_empty_and_dedup():
    assert dv.parse_treemap(dv.serialize_treemap([])) == []
    assert dv.parse_treemap(dv.serialize_treemap([5, 5, 1])) == [1, 5]


# -- file layout ----------------------------------------------------------

def test_write_dv_file_layout_and_load(tmp_path):
    root = str(tmp_path)
    blobs = [
        ("a.parquet", dv.serialize_treemap([1, 2, 3]), 3),
        ("b.parquet", dv.serialize_treemap([10, 2**32 + 1]), 2),
    ]
    rel, descs = dv.write_dv_file(root, blobs)
    raw = open(os.path.join(root, rel), "rb").read()
    assert raw[0] == 1  # format version byte
    d_a, d_b = descs["a.parquet"], descs["b.parquet"]
    assert d_a["storageType"] == "u" and d_a["offset"] == 1
    # dataSize int (big-endian) at the descriptor offset == sizeInBytes
    for d, blob in ((d_a, blobs[0][1]), (d_b, blobs[1][1])):
        off = d["offset"]
        assert struct.unpack_from(">I", raw, off)[0] == d["sizeInBytes"]
        data = raw[off + 4:off + 4 + d["sizeInBytes"]]
        assert data == blob
        crc = struct.unpack_from(">I", raw, off + 4 + len(blob))[0]
        assert crc == (zlib.crc32(blob) & 0xFFFFFFFF)
    # path resolution via the Z85 uuid descriptor
    assert dv.load_dv_indices(root, d_a) == [1, 2, 3]
    assert dv.load_dv_indices(root, d_b) == [10, 2**32 + 1]


def test_reference_reader_skip8_equivalence(tmp_path):
    """The reference reads a file DV by skipping offset+8 bytes
    (dataSize + magic) and parsing the treemap from the bucket count on
    (deletion-vectors.ts:424-438). Files written here must round-trip
    through that exact access pattern."""
    root = str(tmp_path)
    idx = [0, 7, 65536, 2**32 + 3]
    rel, descs = dv.write_dv_file(
        root, [("f.parquet", dv.serialize_treemap(idx), len(idx))])
    raw = open(os.path.join(root, rel), "rb").read()
    d = descs["f.parquet"]
    tail = raw[d["offset"] + 8:]  # reference: startOffset + headerSize
    assert dv.parse_treemap(tail) == idx


# -- table-level integration ---------------------------------------------

def _commit(log_dir, version, actions):
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


SCHEMA = json.dumps({"type": "struct", "fields": [
    {"name": "id", "type": "long", "nullable": True, "metadata": {}},
]})


def _base_actions(size):
    return [
        {"commitInfo": {"operation": "WRITE",
                        "timestamp": 1700000000000}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "dv-foreign", "format": {"provider":
                                                     "parquet"},
                      "schemaString": SCHEMA, "partitionColumns": [],
                      "configuration": {},
                      "createdTime": 1700000000000}},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": size, "modificationTime": 1700000000000,
                 "dataChange": True}},
    ]


def test_foreign_spec_dv_table_reads(spark, tmp_path):
    """Foreign-writer conformance: a table whose DV .bin and descriptor
    were synthesized byte-by-byte (version byte, big-endian dataSize,
    magic, treemap, CRC) — none of it via write_dv_file — must read
    with the deleted rows masked."""
    root = str(tmp_path / "t")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    dest = os.path.join(root, "f1.parquet")
    pq.write_table(pa.table({"id": pa.array(range(10), pa.int64())}),
                   dest)
    # delete rows 2, 3, 7 — hand-built array-container treemap
    bitmap32 = (struct.pack("<II", 12346, 1)       # cookie, 1 container
                + struct.pack("<HH", 0, 3 - 1)     # key 0, card 3
                + struct.pack("<I", 16)            # offset header
                + struct.pack("<3H", 2, 3, 7))
    blob = (struct.pack("<I", dv.DV_MAGIC)
            + struct.pack("<Q", 1)                 # 1 bucket
            + struct.pack("<I", 0)                 # high bits 0
            + bitmap32)
    u = uuid.uuid4()
    with open(os.path.join(root, f"deletion_vector_{u}.bin"),
              "wb") as f:
        f.write(bytes([1]))
        f.write(struct.pack(">I", len(blob)))
        f.write(blob)
        f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    actions = _base_actions(os.path.getsize(dest))
    _commit(log, 0, actions)
    _commit(log, 1, [
        {"commitInfo": {"operation": "DELETE",
                        "timestamp": 1700000001000}},
        {"remove": {"path": "f1.parquet",
                    "deletionTimestamp": 1700000001000,
                    "dataChange": False}},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": os.path.getsize(dest),
                 "modificationTime": 1700000000000, "dataChange": False,
                 "deletionVector": {
                     "storageType": "u",
                     "pathOrInlineDv": dv.encode_uuid_z85(u),
                     "offset": 1, "sizeInBytes": len(blob),
                     "cardinality": 3}}},
    ])
    t = DeltaTable(spark, root)
    ids = sorted(r["id"] for r in t.query({}).collect())
    assert ids == [0, 1, 4, 5, 6, 8, 9]


def test_inline_dv_descriptor(spark, tmp_path):
    """storageType 'i': bitmap data Z85-encoded directly in the
    descriptor (deletion-vectors.ts:414-417)."""
    root = str(tmp_path / "t")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    dest = os.path.join(root, "f1.parquet")
    pq.write_table(pa.table({"id": pa.array(range(6), pa.int64())}),
                   dest)
    blob = dv.serialize_treemap([0, 5])
    pad = (-len(blob)) % 4
    inline = dv.z85_encode(blob + b"\x00" * pad)
    actions = _base_actions(os.path.getsize(dest))
    actions[3]["add"]["deletionVector"] = {
        "storageType": "i", "pathOrInlineDv": inline,
        "sizeInBytes": len(blob), "cardinality": 2}
    _commit(log, 0, actions)
    t = DeltaTable(spark, root)
    assert sorted(r["id"] for r in t.query({}).collect()) == [1, 2, 3, 4]


def test_engine_delete_writes_spec_format(spark, tmp_path):
    """The engine's own DV deletes now produce the spec layout: a
    deletion_vector_<uuid>.bin at the table root and u-type descriptors
    with offset/sizeInBytes/cardinality."""
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(i,) for i in range(20)], "id long"))
    t.enable_deletion_vectors()
    t.delete("id >= 15")
    snap = t.snapshot()
    descs = [f["deletionVector"] for f in snap.files
             if f.get("deletionVector")]
    assert descs and all(d["storageType"] == "u" for d in descs)
    assert sum(d["cardinality"] for d in descs) == 5
    bins = [f for f in os.listdir(t.path)
            if f.startswith("deletion_vector_") and f.endswith(".bin")]
    assert bins
    assert sorted(r["id"] for r in t.query({}).collect()) == \
        list(range(15))
    # a second delete merges with the existing spec DVs
    t.delete("id < 3")
    assert sorted(r["id"] for r in t.query({}).collect()) == \
        list(range(3, 15))


def test_legacy_parquet_sidecar_still_reads(spark, tmp_path):
    """Tables written by earlier engine versions carry {"path": ...}
    parquet-sidecar descriptors — they must keep reading."""
    t = DeltaTable(spark, str(tmp_path / "t"))
    # one file, ids in row-index order, so row_index i <-> id i
    t.write(spark.createDataFrame([(i,) for i in range(8)], "id long")
            .coalesce(1).orderBy("id"))
    snap = t.snapshot()
    assert len(snap.files) == 1
    f = snap.files[0]
    sidecar_dir = os.path.join(t.path, "_deletion_vectors")
    os.makedirs(sidecar_dir, exist_ok=True)
    pq.write_table(
        pa.table({"file_path": pa.array([f["path"]] * 2, pa.string()),
                  "row_index": pa.array([0, 4], pa.int64())}),
        os.path.join(sidecar_dir, "dv-legacy.parquet"))
    from deltalake_spark.delta import log as dlog
    now = 1700000002000
    new_add = dict(f)
    new_add["deletionVector"] = {
        "path": "_deletion_vectors/dv-legacy.parquet", "cardinality": 2}
    new_add["dataChange"] = False
    dlog.write_commit(t.path, snap.version + 1, [
        dlog.commit_info_action("DELETE", {"mode": "legacy-dv"}),
        {"remove": {"path": f["path"], "deletionTimestamp": now,
                    "dataChange": False}},
        {"add": new_add},
    ])
    assert sorted(r["id"] for r in t.query({}).collect()) == \
        [1, 2, 3, 5, 6, 7]
    # and a NEW spec-format delete merges the legacy pairs forward
    t.enable_deletion_vectors()
    t.delete("id = 6")
    assert sorted(r["id"] for r in t.query({}).collect()) == \
        [1, 2, 3, 5, 7]
    descs = [x["deletionVector"] for x in t.snapshot().files
             if x.get("deletionVector")]
    assert all(d.get("storageType") == "u" for d in descs)


def test_vacuum_collects_orphaned_dv_bins(spark, tmp_path):
    """Superseded DV .bin files age out of vacuum once nothing in the
    surviving log references them; referenced bins are never touched."""
    import time as _time

    from deltalake_spark.delta.maintenance import cleanup_log, vacuum

    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(i,) for i in range(20)], "id long")
            .coalesce(1).orderBy("id"))
    t.enable_deletion_vectors()
    t.delete("id >= 18")   # bin 1
    t.delete("id >= 16")   # bin 2 (supersedes bin 1's descriptors)
    bins = sorted(f for f in os.listdir(t.path)
                  if f.startswith("deletion_vector_"))
    assert len(bins) == 2

    _time.sleep(1.1)  # ensure mtimes fall below the cutoff
    # both bins are still referenced by surviving commits (time travel
    # to the first delete must keep working) -> vacuum keeps both
    res = vacuum(t, retention_hours=0, min_retention_hours=0)
    assert not [p for p in res["paths"] if p.endswith(".bin")]

    # checkpoint + prune the old commits: only bin 2 stays referenced
    for _ in range(10):
        t.write(spark.createDataFrame([(999,)], "id long"))
    cleanup_log(t, retain_checkpoints=1)
    _time.sleep(1.1)
    res = vacuum(t, retention_hours=0, min_retention_hours=0)
    gone = [p for p in res["paths"] if p.endswith(".bin")]
    assert len(gone) == 1
    left = sorted(f for f in os.listdir(t.path)
                  if f.startswith("deletion_vector_"))
    assert len(left) == 1
    # and the survivor still resolves: deleted rows stay masked
    got = sorted(r["id"] for r in t.query({"id": {"$lt": 999}}).collect())
    assert got == list(range(16))


def test_inline_dv_write_opt_in(spark, tmp_path):
    """With deltalake_spark.deletionVectors.inlineMaxBytes set, tiny
    per-file bitmaps become 'i' descriptors (no .bin file); larger ones
    still go to the packed .bin. Both read back together."""
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(i,) for i in range(5000)], "id long")
            .coalesce(1).orderBy("id"))
    t.enable_deletion_vectors()
    t.update_metadata(
        {"deltalake_spark.deletionVectors.inlineMaxBytes": "256"})

    t.delete("id >= 4995")  # 5 rows -> tiny blob -> inline
    descs = [f["deletionVector"] for f in t.snapshot().files
             if f.get("deletionVector")]
    assert descs and all(d["storageType"] == "i" for d in descs)
    assert not [f for f in os.listdir(t.path)
                if f.startswith("deletion_vector_")]
    assert t.to_df().count() == 4995

    # a big delete (thousands of rows, bitset-size bitmap) exceeds the
    # inline cap -> .bin file; merged result stays correct
    t.delete("id < 4000")
    descs = [f["deletionVector"] for f in t.snapshot().files
             if f.get("deletionVector")]
    assert all(d["storageType"] == "u" for d in descs)
    assert [f for f in os.listdir(t.path)
            if f.startswith("deletion_vector_")]
    assert sorted(r["id"] for r in t.to_df().collect()) == \
        list(range(4000, 4995))


def test_foreign_dv_with_prefix_both_layouts(spark, tmp_path):
    """A 'u' descriptor whose pathOrInlineDv carries a random prefix:
    the reference joins the prefix into the FILENAME
    (deletion_vector_<prefix><uuid>.bin) while standard writers use it
    as a SUBDIRECTORY — both must resolve."""
    for layout in ("filename", "subdir"):
        root = str(tmp_path / layout)
        log = os.path.join(root, "_delta_log")
        os.makedirs(log)
        dest = os.path.join(root, "f1.parquet")
        pq.write_table(
            pa.table({"id": pa.array(range(6), pa.int64())}), dest)
        blob = dv.serialize_treemap([1, 4])
        u = uuid.uuid4()
        prefix = "ab"
        if layout == "filename":
            dv_path = os.path.join(
                root, f"deletion_vector_{prefix}{u}.bin")
        else:
            os.makedirs(os.path.join(root, prefix), exist_ok=True)
            dv_path = os.path.join(
                root, prefix, f"deletion_vector_{u}.bin")
        with open(dv_path, "wb") as f:
            f.write(bytes([1]))
            f.write(struct.pack(">I", len(blob)))
            f.write(blob)
            f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
        actions = _base_actions(os.path.getsize(dest))
        actions[3]["add"]["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": prefix + dv.encode_uuid_z85(u),
            "offset": 1, "sizeInBytes": len(blob), "cardinality": 2}
        _commit(log, 0, actions)
        t = DeltaTable(spark, root)
        assert sorted(r["id"] for r in t.query({}).collect()) == \
            [0, 2, 3, 5], layout


def test_foreign_mapped_table_with_dv(spark, tmp_path):
    """Feature interaction at the interop boundary: a foreign table
    using BOTH standard column mapping (physicalName metadata, no
    engine map config) AND a spec DV — renamed columns resolve and
    deleted rows stay masked in one scan."""
    root = str(tmp_path / "t")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    dest = os.path.join(root, "f1.parquet")
    pq.write_table(
        pa.table({"col-k": pa.array(range(8), pa.int64()),
                  "col-n": pa.array([f"n{i}" for i in range(8)],
                                    pa.string())}), dest)
    blob = dv.serialize_treemap([0, 7])
    u = uuid.uuid4()
    with open(os.path.join(root, f"deletion_vector_{u}.bin"),
              "wb") as f:
        f.write(bytes([1]))
        f.write(struct.pack(">I", len(blob)))
        f.write(blob)
        f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "key", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-k",
                      "delta.columnMapping.id": 1}},
        {"name": "name", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-n",
                      "delta.columnMapping.id": 2}},
    ]})
    _commit(log, 0, [
        {"commitInfo": {"operation": "WRITE",
                        "timestamp": 1700000000000}},
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "map-dv-1", "format": {"provider": "parquet"},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
            "createdTime": 1700000000000}},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": os.path.getsize(dest),
                 "modificationTime": 1700000000000, "dataChange": True,
                 "deletionVector": {
                     "storageType": "u",
                     "pathOrInlineDv": dv.encode_uuid_z85(u),
                     "offset": 1, "sizeInBytes": len(blob),
                     "cardinality": 2}}},
    ])
    t = DeltaTable(spark, root)
    rows = {r["key"]: r["name"] for r in t.query({}).collect()}
    assert rows == {i: f"n{i}" for i in range(1, 7)}
    # logical-name filter over the mapped column, DV still applied
    assert t.query({"name": "n3"}).count() == 1
    assert t.query({"key": {"$lte": 1}}).count() == 1  # 0 deleted


def test_dv_antijoin_broadcast_vs_shuffle_by_cardinality(spark, tmp_path):
    """Scale shape: the DV anti-join must BROADCAST the delete set when
    descriptor cardinality says it fits, and fall back to a shuffle
    join when it does not (monkeypatched threshold) — checked in the
    physical plan, not assumed."""
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(i,) for i in range(100)], "id long")
            .coalesce(1))
    t.enable_deletion_vectors()
    t.delete("id < 10")

    plan = t.to_df()._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "Broadcast" in plan, plan[:800]

    orig = DeltaTable.DV_BROADCAST_MAX_ROWS
    try:
        DeltaTable.DV_BROADCAST_MAX_ROWS = 0  # force the big-DV path
        plan = t.to_df()._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
        assert "BroadcastHashJoin" not in plan, plan[:800]
    finally:
        DeltaTable.DV_BROADCAST_MAX_ROWS = orig
    # both shapes produce identical results
    assert t.to_df().count() == 90
