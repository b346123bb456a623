"""Deletion vectors: soft deletes without data-file rewrite (reference
DV read path src/delta/deletion-vectors.ts:48-439, scan filtering
src/delta/table.ts:1717-1726; our write path is an engine-native
extension — the reference only READS DVs produced by other writers).
"""

import os

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import NoMatchError


@pytest.fixture()
def table(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", float(i)) for i in range(20)],
        "id long, parity string, val double",
    )
    t.write(df)
    t.enable_deletion_vectors()
    return t


def _data_files(t):
    out = []
    for root, dirs, files in os.walk(t.path):
        if any(s in root for s in
               ("_delta_log", "_staging", "_deletion_vectors",
                "_change_data")):
            continue
        out.extend(f for f in files if f.endswith(".parquet"))
    return sorted(out)


def test_dv_delete_no_rewrite(table):
    before = _data_files(table)
    res = table.delete({"parity": "odd"})
    assert res["numDeletedRows"] == 10
    assert _data_files(table) == before  # data untouched
    assert {r["id"] for r in table.to_df().collect()} \
        == {i for i in range(20) if i % 2 == 0}
    # DV sidecar exists and add actions carry the descriptor
    snap = table.snapshot()
    dvs = [f for f in snap.files if f.get("deletionVector")]
    assert dvs and dvs[0]["deletionVector"]["cardinality"] > 0


def test_dv_deletes_stack(table):
    table.delete({"parity": "odd"})
    res = table.delete({"id": {"$lt": 5}})
    # ids 1,3 already gone; only 0,2,4 newly deleted
    assert res["numDeletedRows"] == 3
    assert {r["id"] for r in table.to_df().collect()} \
        == {6, 8, 10, 12, 14, 16, 18}


def test_dv_time_travel(table):
    v_before = table.version()
    table.delete({"parity": "odd"})
    assert table.to_df(version=v_before).count() == 20
    assert table.to_df().count() == 10


def test_dv_no_match_raises(table):
    with pytest.raises(NoMatchError):
        table.delete({"id": 999})
    # deleting already-deleted rows is also a no-match
    table.delete({"id": 3})
    with pytest.raises(NoMatchError):
        table.delete({"id": 3})


def test_dv_filter_pushdown_preserved(table):
    """The anti-join must not block predicate pushdown to the scan."""
    table.delete({"id": 0})
    df = table.query({"val": {"$gt": 5.0}})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(val,5.0)" in plan


def test_dv_cdc(table):
    table.enable_cdc()
    table.delete({"id": {"$in": [2, 4]}})
    ch = table.read_changes(0)
    deletes = ch.filter(F.col("_change_type") == "delete")
    assert {r["id"] for r in deletes.collect()} == {2, 4}


def test_compact_purges_dvs(table):
    table.delete({"parity": "odd"})
    table.compact(min_files=1)
    snap = table.snapshot()
    assert not any(f.get("deletionVector") for f in snap.files)
    assert {r["id"] for r in table.to_df().collect()} \
        == {i for i in range(20) if i % 2 == 0}


def test_copy_on_write_after_dv_no_resurrection(table):
    """A later copy-on-write op must not resurrect DV-deleted rows."""
    table.delete({"parity": "odd"})
    table.update_metadata({"delta.enableDeletionVectors": "false"})
    table.update({"id": 2}, {"val": 100.0})
    got = {r["id"] for r in table.to_df().collect()}
    assert got == {i for i in range(20) if i % 2 == 0}


def test_dv_update_no_rewrite(table):
    files_before = set(_data_files(table))
    res = table.update({"id": {"$lt": 3}}, {"val": "val + 100"})
    assert res["numUpdatedRows"] == 3
    # old files untouched; ONE new file appended with the updated rows
    assert files_before.issubset(set(_data_files(table)))
    got = {r["id"]: r["val"] for r in table.to_df().collect()}
    assert got[0] == 100.0 and got[1] == 101.0 and got[2] == 102.0
    assert got[10] == 10.0 and len(got) == 20


def test_dv_update_cdc_pre_post_only(table):
    table.enable_cdc()
    table.update({"id": 5}, {"val": 55.0})
    ch = table.read_changes(0)
    types = sorted(r["_change_type"] for r in ch.collect())
    # no bare 'delete' records — update emits pre/postimage pairs only
    assert types == ["update_postimage", "update_preimage"]


def test_dv_on_partitioned_table(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "pdv"))
    df = spark.createDataFrame(
        [(i, f"c{i % 3}", float(i)) for i in range(30)],
        "id long, cat string, val double",
    )
    t.write(df, partition_by=["cat"])
    t.enable_deletion_vectors()
    res = t.delete({"val": {"$lt": 10.0}})
    assert res["numDeletedRows"] == 10
    out = t.to_df()
    assert out.count() == 20
    # partition column still reconstituted after the DV anti-join
    assert {r["cat"] for r in out.collect()} == {"c0", "c1", "c2"}
    assert {r["id"] for r in out.collect()} == set(range(10, 30))
    # and partition-filtered queries still correct
    assert t.query({"cat": "c1"}).count() == 7  # 10 minus ids 1,4,7


def test_vacuum_keeps_dv_files(table):
    table.delete({"parity": "odd"})
    table.vacuum(retention_hours=1.0, dry_run=False)
    assert table.to_df().count() == 10
