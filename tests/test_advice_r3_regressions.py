"""Regression tests for the round-3 ADVICE findings.

1. $arrayToObject: duplicate keys with DIFFERENT values must resolve
   last-key-wins (previously reached map_from_entries and threw
   DUPLICATED_MAP_KEY under mapKeyDedupPolicy=EXCEPTION).
2. $strcasecmp: null/missing compares as empty string like Mongo
   (previously fell through every when-branch to 1).
3. $dateDiff millisecond: boundary crossings, not elapsed-micros/1000.
4. $project: {"_id": 0} is allowed in inclusion/computed mode.
5. bm25_topk: per-call unique view name, no catalog residue.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from deltalake_spark.errors import InvalidPipelineError
from deltalake_spark.functions.pipeline import apply_pipeline, value_expr
from deltalake_spark.operators.retrieval import bm25_topk


def _eval(spark, expr_spec, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(value_expr(expr_spec)).collect()]


# --- 1. $arrayToObject last-key-wins -----------------------------------

def test_array_to_object_duplicate_keys_last_wins(spark):
    df = spark.createDataFrame(
        [([("a", 1), ("b", 2), ("a", 3)],)],
        "entries array<struct<k string, v int>>")
    out = df.select(
        value_expr({"$arrayToObject": "$entries"}).alias("m")).collect()
    assert out[0]["m"] == {"a": 3, "b": 2}


def test_array_to_object_identical_pairs_still_dedup(spark):
    df = spark.createDataFrame(
        [([("a", 1), ("a", 1), ("b", 2)],)],
        "entries array<struct<k string, v int>>")
    out = df.select(
        value_expr({"$arrayToObject": "$entries"}).alias("m")).collect()
    assert out[0]["m"] == {"a": 1, "b": 2}


def test_array_to_object_preserves_distinct_keys(spark):
    df = spark.createDataFrame(
        [([("x", 10), ("y", 20)],)],
        "entries array<struct<k string, v int>>")
    out = df.select(
        value_expr({"$arrayToObject": "$entries"}).alias("m")).collect()
    assert out[0]["m"] == {"x": 10, "y": 20}


# --- 2. $strcasecmp null handling ---------------------------------------

def test_strcasecmp_null_first_arg(spark):
    got = _eval(spark, {"$strcasecmp": ["$a", "$b"]},
                [(None, "a")], "a string, b string")
    assert got == [-1]  # '' < 'a'


def test_strcasecmp_null_second_arg(spark):
    got = _eval(spark, {"$strcasecmp": ["$a", "$b"]},
                [("a", None)], "a string, b string")
    assert got == [1]


def test_strcasecmp_both_null_equal(spark):
    got = _eval(spark, {"$strcasecmp": ["$a", "$b"]},
                [(None, None)], "a string, b string")
    assert got == [0]


def test_strcasecmp_case_insensitive_still_works(spark):
    got = _eval(spark, {"$strcasecmp": ["$a", "$b"]},
                [("ABC", "abc"), ("abc", "abd"), ("b", "a")],
                "a string, b string")
    assert got == [0, -1, 1]


# --- 3. $dateDiff millisecond boundary crossings ------------------------

def test_datediff_millisecond_boundary_crossing(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0, 600)    # 600 µs
    t1 = datetime.datetime(2024, 1, 1, 0, 0, 0, 1400)   # 1400 µs
    got = _eval(
        spark,
        {"$dateDiff": {"startDate": "$s", "endDate": "$e",
                       "unit": "millisecond"}},
        [(t0, t1)], "s timestamp_ntz, e timestamp_ntz")
    assert got == [1]  # crosses the 1000µs boundary once


def test_datediff_millisecond_same_bucket_is_zero(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0, 100)
    t1 = datetime.datetime(2024, 1, 1, 0, 0, 0, 900)
    got = _eval(
        spark,
        {"$dateDiff": {"startDate": "$s", "endDate": "$e",
                       "unit": "millisecond"}},
        [(t0, t1)], "s timestamp_ntz, e timestamp_ntz")
    assert got == [0]


def test_datediff_millisecond_negative(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0, 1400)
    t1 = datetime.datetime(2024, 1, 1, 0, 0, 0, 600)
    got = _eval(
        spark,
        {"$dateDiff": {"startDate": "$s", "endDate": "$e",
                       "unit": "millisecond"}},
        [(t0, t1)], "s timestamp_ntz, e timestamp_ntz")
    assert got == [-1]


# --- 4. $project {"_id": 0} in inclusion mode ---------------------------

def test_project_id_exclusion_with_computed(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 6.0)], "_id int, y double")
    out = apply_pipeline(
        df, [{"$project": {"_id": 0, "x": "$y"}}])
    assert out.columns == ["x"]
    assert sorted(r["x"] for r in out.collect()) == [5.0, 6.0]


def test_project_id_exclusion_with_inclusion_flags(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a")], "_id int, y double, z string")
    out = apply_pipeline(
        df, [{"$project": {"_id": 0, "y": 1, "up": {"$toUpper": "$z"}}}])
    assert out.columns == ["y", "up"]
    assert out.collect()[0]["up"] == "A"


def test_project_other_exclusion_still_rejected(spark):
    df = spark.createDataFrame([(1, 5.0)], "_id int, y double")
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(df, [{"$project": {"y": 0, "x": "$y"}}])


# --- 5. bm25_topk view hygiene ------------------------------------------

def test_bm25_no_catalog_residue_and_no_cross_call_rebind(spark):
    docs_a = spark.createDataFrame(
        [(1, "spark merge spark"), (2, "vector")], "doc_id int, text string")
    docs_b = spark.createDataFrame(
        [(1, "nothing here"), (2, "spark spark spark")],
        "doc_id int, text string")
    before = {v.name for v in spark.catalog.listTables()
              if v.name.startswith("__bm25_corpus_")}
    out_a = bm25_topk(docs_a, ["spark"], k=2)
    out_b = bm25_topk(docs_b, ["spark"], k=2)
    # the earlier lazily-built result must still score corpus A even
    # after a second call on corpus B
    a_rows = {r["doc_id"]: r["score"] for r in out_a.collect()}
    b_rows = {r["doc_id"]: r["score"] for r in out_b.collect()}
    assert a_rows[1] > a_rows[2] >= 0.0
    assert b_rows[2] > b_rows[1] >= 0.0
    after = {v.name for v in spark.catalog.listTables()
             if v.name.startswith("__bm25_corpus_")}
    assert after == before, "bm25_topk left temp views in the catalog"
