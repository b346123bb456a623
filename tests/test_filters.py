"""Filter translator semantics — mirrors the reference's operator tests
(/root/reference/tests/unit/query/query-layer.test.ts:110-741)."""

from __future__ import annotations

import pytest

from deltalake_spark.errors import InvalidFilterError
from deltalake_spark.functions.filters import translate_filter


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        {"i": 1, "name": "alpha", "price": 10.0, "cat": "a", "maybe": 1.0},
        {"i": 2, "name": "beta", "price": 20.0, "cat": "b", "maybe": None},
        {"i": 3, "name": "gamma", "price": 30.0, "cat": "a", "maybe": 3.0},
        {"i": 4, "name": "Delta", "price": 40.0, "cat": "c", "maybe": None},
    ]
    return spark.createDataFrame(rows)


def ids(df, flt):
    return sorted(r.i for r in df.filter(translate_filter(flt)).collect())


def test_empty_filter_matches_all(docs):
    assert ids(docs, None) == [1, 2, 3, 4]
    assert ids(docs, {}) == [1, 2, 3, 4]


def test_bare_equality(docs):
    assert ids(docs, {"cat": "a"}) == [1, 3]


def test_eq_ne(docs):
    assert ids(docs, {"price": {"$eq": 20.0}}) == [2]
    # $ne matches nulls (reference src/query/index.ts:387-389)
    assert ids(docs, {"maybe": {"$ne": 1.0}}) == [2, 3, 4]


def test_ranges_skip_null(docs):
    assert ids(docs, {"price": {"$gt": 15.0, "$lte": 30.0}}) == [2, 3]
    # range ops never match null
    assert ids(docs, {"maybe": {"$gte": 0.0}}) == [1, 3]


def test_in_nin(docs):
    assert ids(docs, {"cat": {"$in": ["a", "c"]}}) == [1, 3, 4]
    # $nin passes nulls (reference src/query/index.ts:411-413)
    assert ids(docs, {"maybe": {"$nin": [1.0]}}) == [2, 3, 4]


def test_exists(docs):
    assert ids(docs, {"maybe": {"$exists": True}}) == [1, 3]
    assert ids(docs, {"maybe": {"$exists": False}}) == [2, 4]


def test_regex(docs):
    assert ids(docs, {"name": {"$regex": "^.a"}}) == [3]
    assert ids(docs, {"name": {"$regex": "a$"}}) == [1, 2, 3, 4]
    assert ids(docs, {"name": {"$regex": "^(al|be)"}}) == [1, 2]
    assert ids(docs, {"name": {"$regex": "^delta", "$options": "i"}}) == [4]


def test_logical(docs):
    assert ids(docs, {"$and": [{"cat": "a"}, {"price": {"$gt": 15.0}}]}) == [3]
    assert ids(docs, {"$or": [{"cat": "b"}, {"price": {"$gt": 35.0}}]}) == [2, 4]
    assert ids(docs, {"$nor": [{"cat": "a"}, {"cat": "b"}]}) == [4]
    assert ids(docs, {"$not": {"cat": "a"}}) == [2, 4]
    # implicit AND of multiple field keys
    assert ids(docs, {"cat": "a", "price": {"$lt": 15.0}}) == [1]


def test_type_is_noop(docs):
    # $type declared-but-unimplemented in reference → always passes
    assert ids(docs, {"i": {"$type": "number"}}) == [1, 2, 3, 4]


def test_field_level_not(docs):
    assert ids(docs, {"price": {"$not": {"$gt": 15.0}}}) == [1]


def test_nested_struct_path(spark):
    rows = [
        {"i": 1, "user": {"name": "ann", "age": 30}},
        {"i": 2, "user": {"name": "bob", "age": 40}},
    ]
    df = spark.createDataFrame(rows)
    got = sorted(
        r.i for r in df.filter(translate_filter({"user.age": {"$gte": 35}})).collect()
    )
    assert got == [2]


def test_unknown_operator_rejected(docs):
    with pytest.raises(InvalidFilterError, match="Unknown"):
        translate_filter({"price": {"$mod": [2, 0]}})
    with pytest.raises(InvalidFilterError):
        translate_filter({"$xor": [{"cat": "a"}]})
    with pytest.raises(InvalidFilterError):
        translate_filter({"cat": {"$in": "not-a-list"}})


# --- array operators ($size/$all/$elemMatch) — engine-native extensions


def test_array_size(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a"]), (3, []), (4, None)],
        "id int, tags array<string>",
    )
    got = sorted(r.id for r in
                 df.filter(translate_filter({"tags": {"$size": 2}})).collect())
    assert got == [1]
    got0 = sorted(r.id for r in
                  df.filter(translate_filter({"tags": {"$size": 0}})).collect())
    assert got0 == [3]
    with pytest.raises(InvalidFilterError):
        translate_filter({"tags": {"$size": "2"}})


def test_array_all(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a", "c"]), (3, ["b"])],
        "id int, tags array<string>",
    )
    got = sorted(r.id for r in df.filter(
        translate_filter({"tags": {"$all": ["a", "c"]}})).collect())
    assert got == [1, 2]


def test_elem_match(spark):
    df = spark.createDataFrame(
        # id=2: 5 passes $lt and 50 passes $gte, but NO single element
        # passes both — $elemMatch must not match (vs naive AND of
        # per-array conditions, which would)
        [(1, [5, 15]), (2, [5, 50]), (3, [30]), (4, None)],
        "id int, vals array<int>",
    )
    got = sorted(r.id for r in df.filter(
        translate_filter({"vals": {"$elemMatch": {"$gte": 10, "$lt": 40}}})
    ).collect())
    assert got == [1, 3]
    with pytest.raises(InvalidFilterError):
        translate_filter({"vals": {"$elemMatch": {}}})
    with pytest.raises(InvalidFilterError):
        translate_filter({"vals": {"$elemMatch": {"$exists": True}}})


def test_array_all_empty_matches_nothing(spark):
    df = spark.createDataFrame(
        [(1, ["a"]), (2, [])], "id int, tags array<string>"
    )
    got = df.filter(translate_filter({"tags": {"$all": []}})).collect()
    assert got == []
