"""Shallow clone (Delta CLONE SHALLOW): zero-copy snapshot tables with
absolute-path add actions. The invariants: the clone reads exactly the
source snapshot (including deletion vectors), diverges independently in
BOTH directions, and its maintenance operations never touch source
files."""

import os

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import ValidationError


def _ids(t, flt=None):
    return sorted(r["id"] for r in t.query(flt or {}).collect())


@pytest.fixture()
def src(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "src"))
    t.write(spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 9)], "id long, s string"))
    return t


def test_clone_reads_source_snapshot_with_dvs(spark, tmp_path, src):
    src.enable_deletion_vectors()
    src.delete({"id": {"$lt": 3}})
    c = src.clone(str(tmp_path / "c"))
    assert _ids(c) == [3, 4, 5, 6, 7, 8]
    assert c.version() == 0  # fresh log
    # fresh table id, same schema
    assert c.snapshot().metadata["id"] != src.snapshot().metadata["id"]
    assert c.schema() == src.schema()


def test_clone_time_travel(spark, tmp_path, src):
    src.delete({"id": 1})
    c0 = src.clone(str(tmp_path / "c0"), version=0)
    assert _ids(c0) == list(range(1, 9))
    c1 = src.clone(str(tmp_path / "c1"))
    assert _ids(c1) == list(range(2, 9))


def test_clone_divergence_is_two_way(spark, tmp_path, src):
    c = src.clone(str(tmp_path / "c"))
    # clone-side changes: source untouched
    c.write(spark.createDataFrame([(100, "z")], "id long, s string"))
    c.enable_deletion_vectors()
    c.delete({"id": 2})           # DV over an EXTERNAL (source) file
    c.update({"id": 100}, {"s": "'zz'"})  # CoW rewrite lands locally
    assert _ids(c) == [1, 3, 4, 5, 6, 7, 8, 100]
    assert _ids(src) == list(range(1, 9))
    # source-side changes: clone untouched (it pinned the old snapshot)
    src.write(spark.createDataFrame([(200, "w")], "id long, s string"))
    src.delete({"id": 5})
    assert _ids(c) == [1, 3, 4, 5, 6, 7, 8, 100]
    # the clone's rewrite really is local
    local = [f["path"] for f in c.snapshot().files
             if not os.path.isabs(f["path"])]
    assert local  # the updated row's file lives under the clone root


def test_clone_of_clone(spark, tmp_path, src):
    c1 = src.clone(str(tmp_path / "c1"))
    c1.enable_deletion_vectors()
    c1.delete({"id": 1})
    c2 = c1.clone(str(tmp_path / "c2"))
    assert _ids(c2) == list(range(2, 9))
    c2.delete({"id": 8})
    assert _ids(c1) == list(range(2, 9))


def test_clone_guards(spark, tmp_path, src):
    src.clone(str(tmp_path / "c"))
    with pytest.raises(ValidationError):
        src.clone(str(tmp_path / "c"))  # target already a table


def test_clone_partitioned(spark, tmp_path):
    """Partitioned clones work because partition values come from the
    log (add.partitionValues), not directory inference — external
    absolute paths have no usable directory layout."""
    p = DeltaTable(spark, str(tmp_path / "part"))
    p.write(spark.createDataFrame(
        [(i, ["a", "b", None][i % 3]) for i in range(9)],
        "id long, k string"), partition_by=["k"])
    c = p.clone(str(tmp_path / "pc"))
    assert _ids(c) == list(range(9))
    assert sorted(r["id"] for r in c.query({"k": "a"}).collect()) \
        == [0, 3, 6]
    # null partition (__HIVE_DEFAULT_PARTITION__) round-trips
    assert sorted(r["id"] for r in
                  c.query({"k": {"$exists": False}}).collect()) \
        == [2, 5, 8]
    c.delete({"k": "b"})
    assert _ids(c) == [0, 2, 3, 5, 6, 8]
    assert _ids(p) == list(range(9))


def test_clone_vacuum_never_touches_source(spark, tmp_path, src):
    from deltalake_spark.delta.maintenance import vacuum

    c = src.clone(str(tmp_path / "c"))
    c.update({"id": 1}, {"s": "'q'"})   # CoW: external file replaced
    before = {f for f in os.listdir(src.path) if f.endswith(".parquet")}
    # zero retention: everything unreferenced under the CLONE root is
    # fair game — external source files must not even be candidates
    vacuum(c, retention_hours=0, min_retention_hours=0)
    after = {f for f in os.listdir(src.path) if f.endswith(".parquet")}
    assert before == after              # source data intact
    assert _ids(c) == list(range(1, 9))
    assert _ids(src) == list(range(1, 9))
