"""Parquet Variant binary codec: encode/decode round-trip identity on
nested docs (reference variant.ts:80-684), Arrow-UDF plumbing, and the
shredding writer's footer statistics (reference parquet/index.ts:283-326)."""

import datetime as dt
import json

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deltalake_spark.functions.variant_binary import (
    VariantError,
    decode_variant,
    decode_variant_udf,
    encode_variant,
    encode_variant_udf,
    get_statistics_paths,
    map_filter_path_to_stats,
    shred_to_binary,
)


def rt(value):
    meta, val = encode_variant(value)
    return decode_variant(meta, val)


def test_round_trip_primitives():
    for v in [None, True, False, 0, 1, -1, 127, -128, 128, -129,
              32767, -32768, 32768, 2**31 - 1, -2**31, 2**31, 2**63 - 1,
              -(2**63), 0.0, -1.5, 3.141592653589793, "", "hello",
              "x" * 63, "x" * 64, "x" * 100_000, "héllo wörld 🎉",
              b"", b"\x00\x01\xff", bytes(range(256))]:
        assert rt(v) == v, repr(v)


def test_round_trip_timestamp_micros():
    ts = dt.datetime(2024, 3, 1, 12, 34, 56, 789123, tzinfo=dt.timezone.utc)
    assert rt(ts) == ts
    # naive datetimes are treated as UTC
    naive = dt.datetime(1999, 12, 31, 23, 59, 59)
    assert rt(naive) == naive.replace(tzinfo=dt.timezone.utc)


def test_round_trip_nested():
    doc = {
        "name": "Alice",
        "age": 30,
        "active": True,
        "scores": [95, 87.5, None, "n/a"],
        "address": {"city": "Oslo", "geo": {"lat": 59.91, "lon": 10.75}},
        "tags": [],
        "blob": b"\x89PNG",
        "nested_arrays": [[1, [2, [3]]], {"k": [{"j": 1}]}],
    }
    assert rt(doc) == doc


def test_encoding_structure():
    # empty dictionary sentinel (reference variant.ts:129-131)
    meta, val = encode_variant(None)
    assert meta == b"\x01\x00" and val == b"\x00"
    assert encode_variant(True)[1] == b"\x04"
    assert encode_variant(False)[1] == b"\x08"
    # short string header: 0x01 | len<<2
    _, sval = encode_variant("ab")
    assert sval[0] == 0x01 | (2 << 2) and sval[1:] == b"ab"
    # int width promotion: int8 / int16 / int32 / int64 type ids
    assert encode_variant(5)[1][0] == 0x0C
    assert encode_variant(300)[1][0] == 0x10
    assert encode_variant(70_000)[1][0] == 0x14
    assert encode_variant(2**40)[1][0] == 0x18
    # dictionary contains each key once, in first-seen order
    meta, _ = encode_variant({"b": {"a": 1}, "a": 2})
    assert meta[2 + 3:].endswith(b"ba")


def test_large_collections():
    arr = list(range(1000))  # forces is_large array header + wide offsets
    assert rt(arr) == arr
    obj = {f"k{i:04d}": i for i in range(300)}  # >255 fields
    assert rt(obj) == obj


def test_errors():
    with pytest.raises(VariantError):
        encode_variant(2**64)  # out of int64
    with pytest.raises(VariantError):
        encode_variant({1: "non-string-key"})
    with pytest.raises(VariantError):
        encode_variant({"x": object()})
    with pytest.raises(VariantError):
        decode_variant(b"\x01\x00", b"\x18\x01")  # truncated INT64


_json_scalars = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=80),
)
_json_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(min_size=1, max_size=10), children,
                        max_size=6),
    ),
    max_leaves=40,
)


@settings(max_examples=200, deadline=None)
@given(_json_values)
def test_round_trip_property(value):
    assert rt(value) == value


def test_spark_udf_round_trip(spark):
    docs = [
        json.dumps({"id": i, "tags": [f"t{i}", "x"], "meta": {"v": i * 1.5}})
        for i in range(50)
    ] + [None]
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    out = (
        df.withColumn("var", encode_variant_udf("doc"))
        .withColumn("back", decode_variant_udf("var"))
        .collect()
    )
    for r in out:
        if r["doc"] is None:
            assert r["back"] is None and r["var"]["metadata"] is None
        else:
            assert json.loads(r["back"]) == json.loads(r["doc"])
            assert isinstance(r["var"]["metadata"], (bytes, bytearray))


def test_shredded_write_stats_and_pruning(spark, tmp_path):
    rows = [(json.dumps({"k": i, "name": f"n{i}", "extra": [i]}),)
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc string")
    shredded = shred_to_binary(df, "doc", "v",
                               {"k": "bigint", "name": "string"})
    path = str(tmp_path / "shredded.parquet")
    shredded.drop("doc").coalesce(1).write.parquet(path)

    # typed subcolumns carry real footer min/max stats (the point of
    # shredding: stats-eligible → row-group pruning / pushdown)
    pf = pq.ParquetFile(next(
        str(p) for p in __import__("pathlib").Path(path).glob("*.parquet")))
    stats = {}
    rg = pf.metadata.row_group(0)
    for ci in range(rg.num_columns):
        col = rg.column(ci)
        if col.statistics is not None:
            stats[col.path_in_schema] = (col.statistics.min,
                                         col.statistics.max)
    assert stats.get("v.typed_value.k.typed_value") == (0, 99)
    assert stats.get("v.typed_value.name.typed_value") is not None
    # binary variant preserved alongside and decodes to the full doc
    back = spark.read.parquet(path)
    row = back.filter("v.typed_value.k.typed_value = 7") \
        .select(decode_variant_udf("v").alias("j")).first()
    assert json.loads(row["j"]) == {"k": 7, "name": "n7", "extra": [7]}


def test_stats_path_helpers():
    assert get_statistics_paths("v", ["a", "b"]) == [
        "v.typed_value.a.typed_value", "v.typed_value.b.typed_value"]
    assert map_filter_path_to_stats("v.a", "v", ["a"]) == \
        "v.typed_value.a.typed_value"
    assert map_filter_path_to_stats("v.c", "v", ["a"]) is None
    assert map_filter_path_to_stats("w.a", "v", ["a"]) is None
