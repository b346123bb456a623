"""Maintenance operators — mirrors the reference's compaction/dedup/
Z-order/vacuum suites (/root/reference/tests/unit/delta/vacuum.test.ts,
compaction tests; benchmarks/compaction.bench.ts shapes)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable


@pytest.fixture
def fragmented(spark, tmp_path):
    """Table with many small files (one per write)."""
    t = DeltaTable(spark, str(tmp_path / "frag"))
    for i in range(6):
        df = spark.createDataFrame(
            [(i * 10 + j, f"u{i}_{j}", float(j)) for j in range(5)],
            "id long, name string, v double",
        )
        t.write(df)
    return t


def test_compact(fragmented):
    before = len(fragmented.snapshot().files)
    assert before >= 6
    dry = fragmented.compact(dry_run=True)
    assert dry["dryRun"] and dry["filesCompacted"] == before
    res = fragmented.compact()
    after = len(fragmented.snapshot().files)
    assert after < before
    assert fragmented.to_df().count() == 30  # no rows lost
    assert res["filesCompacted"] == before


def test_compact_preserves_time_travel(fragmented):
    v_before = fragmented.version()
    fragmented.compact()
    assert fragmented.to_df(version=v_before).count() == 30


def test_deduplicate_exact(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "dup"))
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "c")],
        "id long, name string",
    )
    t.write(df)
    res = t.deduplicate()
    assert res["duplicatesRemoved"] == 2
    assert t.to_df().count() == 3


def test_deduplicate_latest(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "dup2"))
    df = spark.createDataFrame(
        [(1, "old", 100), (1, "new", 200), (2, "only", 50)],
        "id long, tag string, ts long",
    )
    t.write(df)
    res = t.deduplicate(primary_keys=["id"], keep="latest", order_by="ts")
    assert res["duplicatesRemoved"] == 1
    got = {r.id: r.tag for r in t.to_df().collect()}
    assert got == {1: "new", 2: "only"}


def test_z_order(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "zo"))
    rows = [(i, i % 17, float((i * 7) % 23)) for i in range(2000)]
    t.write(spark.createDataFrame(rows, "id long, x int, y double"))
    res = t.z_order(["x", "y"], target_file_count=4)
    assert t.to_df().count() == 2000
    files = t.snapshot().files
    assert len(files) <= 4
    # clustering effect: per-file x-ranges should be narrower than global
    import json

    spans = []
    for f in files:
        st = json.loads(f["stats"])
        if "x" in st["minValues"]:
            spans.append(int(st["maxValues"]["x"]) - int(st["minValues"]["x"]))
    assert spans and min(spans) < 16, "at least one file has a narrow x range"


def test_vacuum(spark, tmp_path, fragmented):
    fragmented.compact()  # leaves old files unreferenced
    dry = fragmented.vacuum(retention_hours=1.0, dry_run=True)
    # nothing old enough yet (files just written)
    assert dry["filesDeleted"] == 0

    # age the removed files artificially
    snap = fragmented.snapshot()
    live = {f["path"] for f in snap.files}
    old = time.time() - 100 * 3600
    for root, dirs, files in os.walk(fragmented.path):
        if "_delta_log" in root or "_change_data" in root:
            continue
        for fn in files:
            full = os.path.join(root, fn)
            rel = os.path.relpath(full, fragmented.path)
            if fn.endswith(".parquet") and rel not in live:
                os.utime(full, (old, old))
    # age the remove tombstones in the log (deletionTimestamp is what
    # protects recently-removed files)
    import json as _json

    from deltalake_spark.delta import log as dlog

    old_ms = int(old * 1000)
    for v in dlog.list_commit_versions(fragmented.path):
        p = dlog.commit_file(fragmented.path, v)
        lines = []
        with open(p) as fh:
            for line in fh:
                a = _json.loads(line)
                if "remove" in a:
                    a["remove"]["deletionTimestamp"] = old_ms
                lines.append(_json.dumps(a, separators=(",", ":")))
        with open(p, "w") as fh:
            fh.write("\n".join(lines))

    res = fragmented.vacuum(retention_hours=1.0, dry_run=False)
    assert res["filesDeleted"] > 0
    # table still reads fine
    assert fragmented.to_df().count() == 30


def test_vacuum_retention_guard(fragmented):
    with pytest.raises(ValueError):
        fragmented.vacuum(retention_hours=0.1)


def test_on_progress_callbacks(spark, tmp_path):
    """compact/vacuum progress callbacks (reference onProgress,
    compaction/index.ts:120, vacuum.ts:57)."""
    from deltalake_spark.delta.maintenance import compact, vacuum

    t = DeltaTable(spark, str(tmp_path / "prog"))
    for i in range(3):
        t.write(spark.createDataFrame([(i,)], "id long"))

    events = []
    m = compact(t, target_file_size=1 << 20, on_progress=events.append)
    phases = [e["phase"] for e in events]
    assert phases == ["select", "rewrite", "commit"]
    assert events[0]["filesCompacted"] == m["filesCompacted"] >= 3
    assert events[2]["version"] == m["version"]

    events.clear()
    v = vacuum(t, retention_hours=1.0, min_retention_hours=0.0,
               dry_run=True, on_progress=events.append)
    assert [e["phase"] for e in events] == ["scan"]
    assert events[0]["candidates"] == v["filesDeleted"]

    # dry_run=False emits scan + delete
    events.clear()
    vacuum(t, retention_hours=1.0, min_retention_hours=0.0,
           on_progress=events.append)
    assert [e["phase"] for e in events] == ["scan", "delete"]
