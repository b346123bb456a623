"""Export conformance: tables WRITTEN by this engine must be readable
by a foreign, reference-faithful reader.

test_foreign_log.py proves the read direction (we read foreign logs);
this file proves the write direction with an INDEPENDENT mini-reader —
pure Python + pyarrow, importing nothing from ``deltalake_spark`` — that
replays the NDJSON log per the Delta/reference semantics
(/root/reference/src/delta/table.ts:557-642), reads the reference
four-column checkpoint layout (checkpoint.ts:346-383), decodes
Z85+RoaringBitmap deletion vectors (deletion-vectors.ts:48-101,154-220,
409-439), applies column mapping from schemaString physicalName
metadata (snapshot.ts:29-83), and merges Hive partition values. If this
reader reproduces ``DeltaTable.to_df()`` exactly, any spec-compliant
implementation can consume our tables.
"""

from __future__ import annotations

import json
import os
import re
import struct
import zlib

import pyarrow.parquet as papq
import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable

# --------------------------------------------------------------------------
# Independent mini-reader (no deltalake_spark imports below this line)
# --------------------------------------------------------------------------

_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_IDX = {c: i for i, c in enumerate(_Z85)}


def _z85_decode(s: str) -> bytes:
    assert len(s) % 5 == 0
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for ch in s[i:i + 5]:
            v = v * 85 + _Z85_IDX[ch]
        out += v.to_bytes(4, "big")
    return bytes(out)


def _bitmap32(buf: bytes, off: int) -> tuple[list[int], int]:
    """One portable 32-bit roaring bitmap -> (values, new offset)."""
    (cookie,) = struct.unpack_from("<I", buf, off)
    off += 4
    runs = None
    if (cookie & 0xFFFF) == 12347:  # SERIAL_COOKIE (with run containers)
        n = ((cookie >> 16) & 0xFFFF) + 1
        nb = (n + 7) // 8
        runs = buf[off:off + nb]
        off += nb
    else:
        assert cookie == 12346, f"bad roaring cookie {cookie}"
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
    keys_cards = [struct.unpack_from("<HH", buf, off + 4 * i)
                  for i in range(n)]
    off += 4 * n
    if runs is None or n >= 4:
        off += 4 * n  # offset header
    vals: list[int] = []
    for i, (key, cm1) in enumerate(keys_cards):
        card = cm1 + 1
        hi = key << 16
        if runs is not None and (runs[i // 8] >> (i % 8)) & 1:
            (nr,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(nr):
                s0, ln = struct.unpack_from("<HH", buf, off)
                off += 4
                vals.extend(hi | v for v in range(s0, s0 + ln + 1))
        elif card > 4096:
            words = struct.unpack_from("<1024Q", buf, off)
            off += 8192
            for wi, w in enumerate(words):
                for b in range(64):
                    if (w >> b) & 1:
                        vals.append(hi | (wi * 64 + b))
        else:
            vs = struct.unpack_from(f"<{card}H", buf, off)
            off += 2 * card
            vals.extend(hi | v for v in vs)
    return vals, off


def _treemap(blob: bytes) -> set[int]:
    off = 0
    (magic,) = struct.unpack_from("<I", blob, 0)
    if magic == 1681511377:
        off = 4
    (nb,) = struct.unpack_from("<Q", blob, off)
    off += 8
    out: set[int] = set()
    for _ in range(nb):
        (high,) = struct.unpack_from("<I", blob, off)
        off += 4
        vals, off = _bitmap32(blob, off)
        out.update((high << 32) | v for v in vals)
    return out


def _dv_deleted_rows(table_dir: str, desc: dict) -> set[int]:
    st = desc["storageType"]
    if st == "i":
        return _treemap(_z85_decode(desc["pathOrInlineDv"]))
    if st == "p":
        path = desc["pathOrInlineDv"]
        if not os.path.isabs(path):
            path = os.path.join(table_dir, path)
    else:
        assert st == "u"
        poi = desc["pathOrInlineDv"]
        prefix, enc = poi[:-20], poi[-20:]
        raw = _z85_decode(enc)
        u = "%08x-%04x-%04x-%04x-%012x" % (
            int.from_bytes(raw[0:4], "big"),
            int.from_bytes(raw[4:6], "big"),
            int.from_bytes(raw[6:8], "big"),
            int.from_bytes(raw[8:10], "big"),
            int.from_bytes(raw[10:16], "big"),
        )
        path = os.path.join(table_dir, prefix, f"deletion_vector_{u}.bin")
    with open(path, "rb") as f:
        raw_file = f.read()
    off = int(desc.get("offset") or 0)
    (size,) = struct.unpack_from(">I", raw_file, off)
    blob = raw_file[off + 4: off + 4 + size]
    (crc,) = struct.unpack_from(">I", raw_file, off + 4 + size)
    assert crc == (zlib.crc32(blob) & 0xFFFFFFFF), "DV checksum mismatch"
    assert size == desc["sizeInBytes"]
    deleted = _treemap(blob)
    assert len(deleted) == desc["cardinality"]
    return deleted


def _checkpoint_actions(path: str) -> list[dict]:
    t = papq.read_table(path)
    actions = []
    for i in range(t.num_rows):
        for col in ("protocol", "metaData", "txn", "remove", "add"):
            if col in t.column_names:
                v = t.column(col)[i].as_py()
                if v is not None:
                    actions.append({col: json.loads(v)})
    # checkpoint rows are a set; removes must apply before same-path adds
    rank = {"protocol": 0, "metaData": 1, "txn": 2, "remove": 3, "add": 4}
    return sorted(actions, key=lambda a: rank[next(iter(a))])


def _replay(table_dir: str) -> tuple[dict, dict]:
    """Replay the log -> ({path: add_action}, metaData)."""
    log = os.path.join(table_dir, "_delta_log")
    commits, cps = {}, {}
    for name in os.listdir(log):
        m = re.fullmatch(r"(\d{20})\.json", name)
        if m:
            commits[int(m.group(1))] = [os.path.join(log, name)]
        m = re.fullmatch(r"(\d{20})\.checkpoint(\.\d+\.\d+)?\.parquet",
                         name)
        if m:
            cps.setdefault(int(m.group(1)), []).append(
                os.path.join(log, name))
    files: dict = {}
    meta: dict = {}
    start = 0
    last_cp = os.path.join(log, "_last_checkpoint")
    if os.path.exists(last_cp):
        with open(last_cp) as f:
            cp_version = json.load(f)["version"]
        actions = []
        for part in sorted(cps[cp_version]):
            actions.extend(_checkpoint_actions(part))
        for a in actions:
            if "add" in a:
                files[a["add"]["path"]] = a["add"]
            elif "remove" in a:
                files.pop(a["remove"]["path"], None)
            elif "metaData" in a:
                meta = a["metaData"]
        start = cp_version + 1
    for v in sorted(commits):
        if v < start:
            continue
        with open(commits[v][0]) as f:
            for line in f:
                if not line.strip():
                    continue
                a = json.loads(line)
                if "add" in a:
                    files[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    files.pop(a["remove"]["path"], None)
                elif "metaData" in a:
                    meta = a["metaData"]
    return files, meta


def _column_mapping(meta: dict) -> dict:
    """physical -> logical names from schemaString field metadata."""
    mapping = {}
    schema = json.loads(meta.get("schemaString") or "{}")
    for field in schema.get("fields", []):
        phys = (field.get("metadata") or {}).get(
            "delta.columnMapping.physicalName")
        if phys:
            mapping[phys] = field["name"]
    return mapping


def _foreign_read(table_dir: str) -> list[dict]:
    """Full independent table read -> list of row dicts."""
    files, meta = _replay(table_dir)
    part_cols = meta.get("partitionColumns") or []
    mapping = _column_mapping(meta)
    rows: list[dict] = []
    for add in files.values():
        t = papq.read_table(os.path.join(table_dir, add["path"]))
        data = t.to_pylist()
        dv = add.get("deletionVector")
        if dv:
            deleted = _dv_deleted_rows(table_dir, dv)
            data = [r for i, r in enumerate(data) if i not in deleted]
        pv = add.get("partitionValues") or {}
        for r in data:
            if mapping:
                r = {mapping.get(k, k): v for k, v in r.items()}
            for c in part_cols:
                raw = pv.get(c)
                r[c] = None if raw is None else raw  # strings per spec
            rows.append(r)
    return rows


# --------------------------------------------------------------------------
# Conformance scenarios
# --------------------------------------------------------------------------


def _spark_rows(df, part_cols=()) -> list[dict]:
    out = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        for c in part_cols:
            d[c] = None if d[c] is None else str(d[c])
        out.append(d)
    return out


def _sorted(rows, key):
    return sorted(rows, key=lambda r: tuple(
        (v is None, v) for v in (r[k] for k in key)))


def test_foreign_reader_plain_multi_commit(spark, tmp_path):
    path = str(tmp_path / "t1")
    t = DeltaTable(spark, path)
    df1 = spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("name"))
    t.write(df1)
    t.write(spark.range(50, 80).select(
        F.col("id"), (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("v"), F.col("id")).alias("name")))
    t.update({"grp": 2}, {"name": F.lit("updated")})
    ours = _sorted(_spark_rows(t.to_df().select("id", "grp", "name")),
                   ["id"])
    theirs = _sorted(_foreign_read(path), ["id"])
    assert theirs == ours
    assert sum(1 for r in theirs if r["name"] == "updated") == 16


def test_foreign_reader_partitioned_with_null_partition(spark, tmp_path):
    path = str(tmp_path / "t2")
    t = DeltaTable(spark, path)
    df = spark.range(0, 40).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, F.lit(None))
        .otherwise((F.col("id") % 3).cast("string")).alias("bucket"),
        (F.col("id") * 2.5).alias("val"))
    t.write(df, partition_by=["bucket"])
    ours = _sorted(_spark_rows(t.to_df().select("id", "bucket", "val"),
                               part_cols=["bucket"]), ["id"])
    theirs = _sorted(_foreign_read(path), ["id"])
    assert theirs == ours
    assert sum(1 for r in theirs if r["bucket"] is None) == 4


def test_foreign_reader_spec_deletion_vectors(spark, tmp_path):
    path = str(tmp_path / "t3")
    t = DeltaTable(spark, path)
    t.write(spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("m")))
    t.enable_deletion_vectors()
    t.delete({"m": 1})  # soft delete -> spec DV bin file
    snap_files, _ = _replay(path)
    assert any(a.get("deletionVector") for a in snap_files.values()), \
        "expected a DV descriptor in the log"
    ours = _sorted(_spark_rows(t.to_df().select("id", "m")), ["id"])
    theirs = _sorted(_foreign_read(path), ["id"])
    assert theirs == ours
    assert len(theirs) == 75 and all(r["m"] != 1 for r in theirs)


def test_foreign_reader_from_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t4")
    t = DeltaTable(spark, path)
    for i in range(12):  # crosses the 10-commit checkpoint cadence
        t.write(spark.range(i * 10, (i + 1) * 10).select(
            F.col("id"), F.lit(i).alias("batch")))
    log = os.path.join(path, "_delta_log")
    assert any("checkpoint" in n for n in os.listdir(log))
    ours = _sorted(_spark_rows(t.to_df().select("id", "batch")), ["id"])
    theirs = _sorted(_foreign_read(path), ["id"])
    assert theirs == ours and len(theirs) == 120


def test_foreign_reader_column_mapping(spark, tmp_path):
    path = str(tmp_path / "t5")
    t = DeltaTable(spark, path)
    t.write(spark.range(0, 30).select(
        F.col("id"), (F.col("id") * 3).alias("old_name")))
    t.rename_column("old_name", "new_name")
    ours = _sorted(_spark_rows(t.to_df().select("id", "new_name")),
                   ["id"])
    theirs = _sorted(_foreign_read(path), ["id"])
    assert theirs == ours
    assert "new_name" in theirs[0] and "old_name" not in theirs[0]
