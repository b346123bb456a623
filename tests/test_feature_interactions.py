"""Feature-interaction matrix: column mapping × DML × DV × partitioning
× schema evolution. Each feature is tested alone elsewhere; these cover
the combinations (the staging/cleanup and DV/key-resolution bugs this
round were all interaction bugs)."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable


@pytest.fixture()
def table(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame(
        [(i, f"n{i}", float(i * 10)) for i in range(10)],
        "id long, name string, amount double",
    ))
    return t


def test_merge_after_rename(spark, table):
    table.rename_column("amount", "balance")
    src = spark.createDataFrame(
        [(3, "n3x", 999.0), (42, "new", 1.0)],
        "id long, name string, balance double",
    )
    res = table.merge(src, "t.id = s.id",
                      when_matched_update="*",
                      when_not_matched_insert=True)
    assert res["numUpdated"] == 1 and res["numInserted"] == 1
    got = {r["id"]: (r["name"], r["balance"])
           for r in table.to_df().collect()}
    assert got[3] == ("n3x", 999.0) and got[42] == ("new", 1.0)


def test_dv_delete_after_rename(spark, table):
    table.rename_column("amount", "balance")
    table.enable_deletion_vectors()
    res = table.delete({"balance": {"$lt": 30.0}})
    assert res["numDeletedRows"] == 3
    assert {r["id"] for r in table.to_df().collect()} == set(range(3, 10))


def test_rename_after_dv_delete(spark, table):
    table.enable_deletion_vectors()
    table.delete({"id": {"$lt": 3}})
    table.rename_column("amount", "balance")
    got = {r["id"]: r["balance"] for r in table.to_df().collect()}
    assert got == {i: float(i * 10) for i in range(3, 10)}


def test_evolution_then_rename_new_column(spark, table):
    table.write(
        spark.createDataFrame([(100, "x", 1.0, "tag")],
                              "id long, name string, amount double, "
                              "label string"),
        merge_schema=True,
    )
    table.rename_column("label", "category")
    df = table.to_df()
    assert "category" in df.columns
    got = {r["id"]: r["category"] for r in df.collect()}
    assert got[100] == "tag" and got[0] is None


def test_partitioned_evolution_and_dml(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "pe"))
    t.write(
        spark.createDataFrame(
            [(i, f"c{i % 2}", float(i)) for i in range(10)],
            "id long, cat string, v double",
        ),
        partition_by=["cat"],
    )
    t.write(
        spark.createDataFrame(
            [(100, "c0", 5.0, 42)],
            "id long, cat string, v double, extra long",
        ),
        merge_schema=True,
    )
    t.update({"cat": "c1"}, {"v": "v * 2"})
    t.delete({"id": {"$lt": 2}})
    df = t.to_df()
    assert df.count() == 9
    got = {r["id"]: r["v"] for r in df.collect()}
    assert got[3] == 6.0 and got[2] == 2.0 and got[100] == 5.0
    # partition pruning still works post-evolution
    out = t.query({"cat": "c0"})
    assert t.last_query_skipped_files > 0
    assert {r["id"] for r in out.collect()} == {2, 4, 6, 8, 100}


def test_restore_after_rename_restores_old_schema(spark, table):
    table.rename_column("amount", "balance")
    table.delete({"id": 0})
    table.restore(0)
    df = table.to_df()
    assert "amount" in df.columns and "balance" not in df.columns
    assert df.count() == 10


def test_compact_after_rename_keeps_logical_names(spark, table):
    table.rename_column("amount", "balance")
    table.write(spark.createDataFrame(
        [(50, "x", 1.0)], "id long, name string, balance double"))
    table.compact(min_files=2)
    df = table.to_df()
    assert "balance" in df.columns
    assert df.count() == 11
    assert df.filter(F.col("balance") == 1.0).count() == 1


def test_merge_on_dv_table(spark, table):
    """MERGE against a table with active deletion vectors (the scan has
    two sources — input_file_name() would fail here)."""
    table.enable_deletion_vectors()
    table.delete({"id": {"$lt": 2}})  # ids 0,1 soft-deleted
    src = spark.createDataFrame(
        [(1, "ghost", 1.0), (5, "upd", 500.0)],
        "id long, name string, amount double",
    )
    res = table.merge(src, "t.id = s.id", when_matched_update="*",
                      when_not_matched_insert=True)
    # id=1 is deleted → counts as NOT matched → re-inserted
    assert res["numUpdated"] == 1 and res["numInserted"] == 1
    got = {r["id"]: r["amount"] for r in table.to_df().collect()}
    assert got[5] == 500.0 and got[1] == 1.0 and 0 not in got


def test_merge_clause_condition(spark, table):
    src = spark.createDataFrame(
        [(2, "x", 1000.0), (3, "y", 5.0), (77, "new", 7.0)],
        "id long, name string, amount double",
    )
    res = table.merge(
        src, "t.id = s.id",
        when_matched_update="*",
        when_matched_condition="s.amount > t.amount",
        when_not_matched_insert=True,
    )
    # id=2: 1000 > 20 → updated; id=3: 5 < 30 → untouched
    assert res["numUpdated"] == 1 and res["numInserted"] == 1
    got = {r["id"]: (r["name"], r["amount"])
           for r in table.to_df().collect()}
    assert got[2] == ("x", 1000.0)
    assert got[3] == ("n3", 30.0)  # untouched
    assert got[77] == ("new", 7.0)


def test_merge_conditional_delete_with_cdc(spark, table):
    table.enable_cdc()
    src = spark.createDataFrame([(4,), (5,)], "id long")
    res = table.merge(
        src, "t.id = s.id",
        when_matched_delete=True,
        when_matched_condition="t.amount >= 50.0",
        when_not_matched_insert=False,
    )
    assert res["numDeleted"] == 1  # only id=5 (amount 50); id=4 is 40
    ids = {r["id"] for r in table.to_df().collect()}
    assert 5 not in ids and 4 in ids
    ch = table.read_changes(0)
    deletes = {r["id"] for r in ch.collect()
               if r["_change_type"] == "delete"}
    assert deletes == {5}
