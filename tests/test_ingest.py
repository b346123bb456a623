"""Schemaless dict ingestion (write_rows): the reference type lattice
(src/delta/table.ts:1289-1432) and validateAndMergeSchemas semantics
(table.ts:1239-1280)."""

import datetime as dt
import json

import pytest

from deltalake_spark.delta.ingest import (
    infer_schema,
    infer_type,
    rows_to_dataframe,
)
from deltalake_spark.delta.table import DeltaTable
from deltalake_spark.errors import (
    SchemaMismatchError,
    ValidationError,
)


def test_infer_type_lattice():
    assert infer_type(True) is not None and infer_type(True) == "boolean"
    assert infer_type(5) == "int32"
    assert infer_type(2 ** 31 - 1) == "int32"
    assert infer_type(2 ** 31) == "int64"
    assert infer_type(-(2 ** 31) - 1) == "int64"
    assert infer_type(1.5) == "double"
    assert infer_type("x") == "string"
    assert infer_type(dt.datetime(2024, 1, 2, 3)) == "timestamp"
    assert infer_type(dt.date(2024, 1, 2)) == "timestamp"
    assert infer_type(b"\x00") == "binary"
    assert infer_type({"a": 1}) == "variant"
    assert infer_type([1, 2]) == "variant"
    assert infer_type(None) == "string"
    with pytest.raises(ValidationError):
        infer_type(2 ** 63)  # beyond int64
    with pytest.raises(ValidationError):
        infer_type(object())


def test_infer_schema_sparse_promotion_and_allnull():
    rows = [
        {"a": 1, "b": None, "c": None},
        {"a": 2.5, "b": 7, "d": "x"},      # a promotes int32 -> double
        {"b": 2 ** 40},                    # b promotes int32 -> int64
    ]
    s = infer_schema(rows)
    assert s == {"a": "double", "b": "int64", "c": "string",
                 "d": "string"}


def test_infer_schema_incompatible_mix_raises():
    with pytest.raises(ValidationError, match="incompatible"):
        infer_schema([{"a": 1}, {"a": "x"}])
    with pytest.raises(ValidationError, match="incompatible"):
        infer_schema([{"a": True}, {"a": 1}])  # bool is NOT numeric


def test_rows_to_dataframe_types_and_values(spark):
    rows = [
        {"i": 1, "big": 2 ** 40, "f": 0.5, "s": "a", "b": True,
         "ts": dt.datetime(2024, 5, 6, 7, 8, 9),
         "bin": b"\x01\x02", "v": {"k": [1, 2], "d": dt.date(2024, 1, 1)}},
        {"i": None, "big": 3, "f": 2, "s": None, "b": False,
         "ts": dt.date(2024, 2, 3), "bin": None, "v": None},
    ]
    df = rows_to_dataframe(spark, rows)
    types = dict(df.dtypes)
    assert types == {"i": "int", "big": "bigint", "f": "double",
                     "s": "string", "b": "boolean",
                     "ts": "timestamp_ntz", "bin": "binary",
                     "v": "string"}
    out = {r["big"]: r for r in df.collect()}
    assert out[3]["ts"] == dt.datetime(2024, 2, 3)  # date -> midnight
    assert out[3]["f"] == 2.0
    v = json.loads(out[2 ** 40]["v"])
    assert v == {"d": "2024-01-01", "k": [1, 2]}
    # variant fields are flagged for JSON revival
    fld = next(f for f in df.schema.fields if f.name == "v")
    assert fld.metadata.get("deltalake_spark.variant") is True


def test_write_rows_roundtrip_and_merge(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write_rows([
        {"id": 1, "name": "a", "meta": {"x": 1}},
        {"id": 2, "name": "b"},
    ])
    assert dict(t.to_df().dtypes)["id"] == "int"
    # second batch: new field joins as nullable, id widens to double
    t.write_rows([{"id": 3.5, "score": 9}])
    got = {r["name"]: r for r in t.to_df().collect()}
    assert dict(t.to_df().dtypes) == {
        "id": "double", "name": "string", "meta": "string",
        "score": "int"}
    assert got["a"]["id"] == 1.0 and got["a"]["score"] is None
    assert got[None]["id"] == 3.5 and got[None]["score"] == 9
    # incompatible write refused (string into numeric)
    with pytest.raises((ValidationError, SchemaMismatchError)):
        t.write_rows([{"id": "nope"}])


def test_write_rows_empty_and_nonmapping():
    # no spark needed: validation fires before any job
    t = DeltaTable.__new__(DeltaTable)
    with pytest.raises(ValidationError):
        DeltaTable.write_rows(t, [])
    with pytest.raises(ValidationError):
        infer_schema([("not", "a", "dict")])


def test_write_rows_variant_revives_via_query(spark, tmp_path):
    """Nested values stored as JSON text read back through the engine's
    JSON-revival path (functions/variant.py)."""
    from pyspark.sql import functions as F

    t = DeltaTable(spark, str(tmp_path / "t"))
    t.write_rows([
        {"id": i, "meta": {"region": i % 3, "tags": ["a", "b"]}}
        for i in range(6)
    ])
    out = (
        t.to_df()
        .withColumn("region",
                    F.get_json_object("meta", "$.region").cast("long"))
        .groupBy("region").count().orderBy("region").collect()
    )
    assert [(r["region"], r["count"]) for r in out] == [
        (0, 2), (1, 2), (2, 2)]


# -- property: arbitrary dicts round-trip through the lattice -------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _scalar = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=20),
    )

    @given(st.lists(
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]), _scalar, max_size=4),
        min_size=1, max_size=8))
    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_rows_roundtrip_property(spark, rows):
        """Any homogeneous-per-field batch either raises a clear
        ValidationError (incompatible mix) or round-trips: every
        non-null input value equals the read-back value after the
        lattice's documented numeric widening."""
        try:
            df = rows_to_dataframe(spark, rows)
        except ValidationError:
            return  # incompatible mix across rows — documented contract
        got = [r.asDict() for r in df.collect()]
        assert len(got) == len(rows)
        types = dict(df.dtypes)
        # per-field multiset of non-null values must survive, modulo
        # numeric widening to the unified column type
        for name in types:
            def norm(v):
                if v is None:
                    return None
                return float(v) if types[name] in ("double",) else v
            want = sorted((norm(r.get(name)) for r in rows),
                          key=lambda x: (x is None, str(type(x)), str(x)))
            have = sorted((r.get(name) for r in got),
                          key=lambda x: (x is None, str(type(x)), str(x)))
            assert want == have, f"field {name}: {want} != {have}"
except ImportError:  # pragma: no cover
    pass
