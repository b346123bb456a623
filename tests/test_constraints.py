"""CHECK constraints: Delta-protocol `delta.constraints.*` properties,
enforced on every data-file-creating path (write / update / merge).

Engine-native — the reference has no constraints; the property layout
follows the Delta protocol so the configuration round-trips like any
other table property (survives checkpoints, time travel, restore)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import (
    ConstraintViolationError,
    ValidationError,
)


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="constraints_")
    t = DeltaTable(spark, d)
    t.write(spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b")], "id int, price double, tag string"
    ))
    return t


def test_add_and_enforce_on_write(spark, table):
    table.add_check_constraint("price_positive", "price > 0")
    assert table.check_constraints() == {"price_positive": "price > 0"}
    with pytest.raises(ConstraintViolationError) as e:
        table.write(spark.createDataFrame(
            [(3, -5.0, "c")], "id int, price double, tag string"))
    assert e.value.violations == {"price_positive": 1}
    # valid rows still write
    table.write(spark.createDataFrame(
        [(3, 5.0, "c")], "id int, price double, tag string"))
    assert table.to_df().count() == 3


def test_null_passes_check(spark, table):
    table.add_check_constraint("price_positive", "price > 0")
    table.write(spark.createDataFrame(
        [(4, None, "d")], "id int, price double, tag string"))
    assert table.to_df().filter(F.col("price").isNull()).count() == 1


def test_add_validates_existing_rows(spark, table):
    with pytest.raises(ConstraintViolationError):
        table.add_check_constraint("id_big", "id > 1")
    # and nothing was persisted
    assert table.check_constraints() == {}
    table.add_check_constraint("id_big", "id > 1", validate=False)
    assert "id_big" in table.check_constraints()


def test_update_and_merge_enforce(spark, table):
    table.add_check_constraint("price_positive", "price > 0")
    with pytest.raises(ConstraintViolationError):
        table.update({"id": {"$eq": 1}}, {"price": -1.0})
    src = spark.createDataFrame(
        [(2, -99.0, "x")], "id int, price double, tag string")
    with pytest.raises(ConstraintViolationError):
        table.merge(src, "t.id = s.id", when_matched_update="*")
    # table unchanged after both rejected mutations
    assert table.to_df().filter(F.col("price") <= 0).count() == 0


def test_drop_constraint(spark, table):
    table.add_check_constraint("price_positive", "price > 0")
    table.drop_check_constraint("price_positive")
    assert table.check_constraints() == {}
    table.write(spark.createDataFrame(
        [(9, -1.0, "z")], "id int, price double, tag string"))
    with pytest.raises(ValidationError):
        table.drop_check_constraint("nope")


def test_invalid_expression_rejected(spark, table):
    with pytest.raises(ValidationError):
        table.add_check_constraint("bad", "this is (not sql")
    assert table.check_constraints() == {}


def test_constraint_survives_restore_and_time_travel(spark, table):
    v = table.add_check_constraint("price_positive", "price > 0")
    table.drop_check_constraint("price_positive")
    assert table.check_constraints() == {}
    table.restore(v)
    assert table.check_constraints() == {"price_positive": "price > 0"}
