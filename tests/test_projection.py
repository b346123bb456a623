"""Projection translator — mirrors applyProjection tests
(/root/reference/src/query/index.ts:768-930)."""

from __future__ import annotations

import pytest

from deltalake_spark.errors import InvalidProjectionError
from deltalake_spark.functions.projection import apply_projection, projection_columns


@pytest.fixture(scope="module")
def df(spark):
    rows = [(1, "a", "x", ("ann", 30, "p"))]
    return spark.createDataFrame(
        rows,
        "i long, name string, secret string, "
        "user struct<name:string, age:int, pwd:string>",
    )


def test_list_inclusion(df):
    out = apply_projection(df, ["i", "name"])
    assert out.columns == ["i", "name"]


def test_mapping_inclusion(df):
    out = apply_projection(df, {"i": 1, "user": 1})
    assert out.columns == ["i", "user"]


def test_exclusion(df):
    out = apply_projection(df, {"secret": 0})
    assert sorted(out.columns) == ["i", "name", "user"]


def test_nested_inclusion(df):
    out = apply_projection(df, ["user.name", "i"])
    row = out.collect()[0]
    assert row["user.name"] == "ann" and row["i"] == 1


def test_nested_exclusion(df):
    out = apply_projection(df, {"user.pwd": 0})
    user = out.collect()[0]["user"]
    assert "pwd" not in user.asDict() and user["name"] == "ann"


def test_mixed_rejected(df):
    with pytest.raises(InvalidProjectionError):
        apply_projection(df, {"i": 1, "secret": 0})


def test_projection_columns():
    assert projection_columns(["a.b", "c"]) == ["a", "c"]
    assert projection_columns({"x": 0}) is None
    assert projection_columns(None) is None
