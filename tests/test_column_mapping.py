"""Column mapping: rename without rewrite (reference physical→logical
column mapping, src/delta/snapshot.ts:29-83, applied on read
src/delta/table.ts:1753-1756).
"""

import os

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable


@pytest.fixture()
def table(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)],
        "id long, name string, val double",
    )
    t.write(df)
    return t


def _data_files(t):
    out = []
    for root, _d, files in os.walk(t.path):
        if "_delta_log" in root or "_staging" in root:
            continue
        out.extend(f for f in files if f.endswith(".parquet"))
    return sorted(out)


def test_rename_no_rewrite(table):
    files_before = _data_files(table)
    v = table.rename_column("val", "amount")
    assert v == 1
    assert _data_files(table) == files_before  # zero data files touched
    df = table.to_df()
    assert set(df.columns) == {"id", "name", "amount"}
    assert {r["amount"] for r in df.collect()} == {10.0, 20.0, 30.0}


def test_time_travel_sees_old_name(table):
    table.rename_column("val", "amount")
    old = table.to_df(version=0)
    assert "val" in old.columns and "amount" not in old.columns


def test_write_after_rename(table, spark):
    table.rename_column("val", "amount")
    table.write(spark.createDataFrame([(4, "w", 40.0)],
                                      "id long, name string, amount double"))
    df = table.to_df()
    assert df.count() == 4
    assert {r["amount"] for r in df.filter(F.col("id") == 4).collect()} \
        == {40.0}


def test_dml_after_rename(table):
    table.rename_column("val", "amount")
    table.update({"id": 2}, {"amount": "amount + 5"})
    table.delete({"amount": {"$lt": 15.0}})
    got = {(r["id"], r["amount"]) for r in table.to_df().collect()}
    assert got == {(2, 25.0), (3, 30.0)}


def test_double_rename(table):
    table.rename_column("val", "amount")
    table.rename_column("amount", "total")
    df = table.to_df()
    assert "total" in df.columns
    assert {r["total"] for r in df.collect()} == {10.0, 20.0, 30.0}


def test_new_column_colliding_with_physical(table, spark):
    # rename val→amount leaves physical 'val' in files; adding a NEW
    # logical 'val' must not read the old physical data
    table.rename_column("val", "amount")
    table.write(
        spark.createDataFrame(
            [(5, "q", 50.0, "fresh")],
            "id long, name string, amount double, val string",
        ),
        merge_schema=True,
    )
    df = table.to_df()
    rows = {r["id"]: (r["amount"], r["val"]) for r in df.collect()}
    assert rows[5] == (50.0, "fresh")
    assert rows[1] == (10.0, None)  # old rows: null new col, kept amount


def test_rename_partition_column_rejected(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "p"))
    t.write(
        spark.createDataFrame([(1, "a")], "id long, cat string"),
        partition_by=["cat"],
    )
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("cat", "category")


def test_rename_validation(table):
    with pytest.raises(ValueError, match="no such column"):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("val", "name")


# --- drop_column (metadata-only, retired-physical-name bookkeeping) ---


def test_drop_column_metadata_only(spark, tmp_path):
    from deltalake_spark.delta.table import DeltaTable

    t = DeltaTable(spark, str(tmp_path / "drop1"))
    t.write(spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0)], "id int, v string, score double"))
    files_before = {f["path"] for f in t.snapshot().files}
    t.drop_column("v")
    assert {f["path"] for f in t.snapshot().files} == files_before  # no rewrite
    df = t.to_df()
    assert sorted(df.columns) == ["id", "score"]
    assert df.count() == 2


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    from pyspark.sql import functions as F

    from deltalake_spark.delta.table import DeltaTable

    t = DeltaTable(spark, str(tmp_path / "drop2"))
    t.write(spark.createDataFrame([(1, "old1"), (2, "old2")],
                                  "id int, v string"))
    t.drop_column("v")
    # re-add the same logical name; rows written before the re-add must
    # read NULL for it, never the retired physical data
    t.write(spark.createDataFrame([(3, "new3")], "id int, v string"),
            merge_schema=True)
    rows = {r.id: r.v for r in t.to_df().collect()}
    assert rows == {1: None, 2: None, 3: "new3"}


def test_drop_column_guards(spark, tmp_path):
    import pytest

    from deltalake_spark.delta.table import DeltaTable
    from deltalake_spark.errors import ValidationError

    t = DeltaTable(spark, str(tmp_path / "drop3"))
    t.write(spark.createDataFrame([(1, "a", "p")],
                                  "id int, v string, part string"),
            partition_by=["part"])
    with pytest.raises(ValueError):
        t.drop_column("nope")
    with pytest.raises(ValueError):
        t.drop_column("part")
    t.add_check_constraint("v_nonempty", "length(v) > 0")
    with pytest.raises(ValidationError):
        t.drop_column("v")


def test_drop_column_guard_is_identifier_aware(spark, tmp_path):
    from deltalake_spark.delta.table import DeltaTable

    t = DeltaTable(spark, str(tmp_path / "drop4"))
    t.write(spark.createDataFrame([(1, 5)], "id int, valid int"))
    t.add_check_constraint("v_pos", "valid > 0")
    # 'id' is a substring of 'valid' but NOT referenced — must drop fine
    t.drop_column("id")
    assert [f.name for f in t.schema().fields] == ["valid"]
