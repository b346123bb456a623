"""Extended Mongo expression operator surface (functions/expr_ops.py).

Each case evaluates the operator through a $project/$addFields pipeline
over a tiny in-memory frame and pins the exact Mongo-documented result.
The reference has none of these (its $project is include/exclude only,
src/query/index.ts:1509-1547) — this is the engine-native extension to
the documented MongoDB 7.0 expression language.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from deltalake_spark.errors import InvalidPipelineError
from deltalake_spark.functions.expr_ops import translate_date_format
from deltalake_spark.functions.pipeline import value_expr


def ev(spark, expr, rows=None, schema=None):
    """Evaluate one expression operand against rows (default single row)."""
    df = spark.createDataFrame(rows or [(1,)], schema or ["x"])
    return [r["out"] for r in
            df.select(value_expr(expr).alias("out")).collect()]


TS = dt.datetime(2024, 3, 15, 13, 45, 30, 123000)  # Friday


class TestDates:
    def test_parts(self, spark):
        parts = {
            "$year": 2024, "$month": 3, "$dayOfMonth": 15, "$hour": 13,
            "$minute": 45, "$second": 30, "$millisecond": 123,
            "$dayOfWeek": 6,          # 1=Sunday → Friday=6
            "$dayOfYear": 75,         # 31+29+15 (2024 is a leap year)
            "$isoDayOfWeek": 5,       # 1=Monday → Friday=5
            "$isoWeek": 11,
            "$isoWeekYear": 2024,
        }
        row = [(TS,)]
        for op, want in parts.items():
            got = ev(spark, {op: "$x"}, row, ["x"])[0]
            assert got == want, f"{op}: {got} != {want}"

    def test_week_sunday_start(self, spark):
        # 2024-01-01 is a Monday → week 0; first Sunday (Jan 7) starts
        # week 1; Mongo's $week semantics exactly
        rows = [(dt.datetime(2024, 1, 1),), (dt.datetime(2024, 1, 6),),
                (dt.datetime(2024, 1, 7),), (dt.datetime(2024, 12, 31),)]
        assert ev(spark, {"$week": "$x"}, rows, ["x"]) == [0, 0, 1, 52]

    def test_date_to_string(self, spark):
        got = ev(spark, {"$dateToString": {
            "date": "$x", "format": "%Y-%m-%d %H:%M:%S.%L (day %j)"}},
            [(TS,)], ["x"])
        assert got == ["2024-03-15 13:45:30.123 (day 075)"]

    def test_date_to_string_literal_quoting(self, spark):
        # letters in literal text must not be parsed as pattern letters
        got = ev(spark, {"$dateToString": {
            "date": "$x", "format": "year=%Y month's=%m 100%%"}},
            [(TS,)], ["x"])
        assert got == ["year=2024 month's=03 100%"]

    def test_date_to_string_rejects_unknown_specifier(self, spark):
        with pytest.raises(InvalidPipelineError):
            translate_date_format("%Q")

    def test_date_from_string(self, spark):
        got = ev(spark, {"$dateFromString": {
            "dateString": "$x", "format": "%Y/%m/%d"}},
            [("2024/03/15",)], ["x"])
        assert got == [dt.datetime(2024, 3, 15)]

    def test_date_from_string_on_error(self, spark):
        fallback = dt.datetime(2000, 1, 1)
        got = ev(spark, {"$dateFromString": {
            "dateString": "$x", "format": "%Y/%m/%d",
            "onError": {"$literal": fallback}}},
            [("garbage",)], ["x"])
        assert got == [fallback]

    def test_date_trunc_add_diff(self, spark):
        row = [(TS,)]
        assert ev(spark, {"$dateTrunc": {"date": "$x", "unit": "month"}},
                  row, ["x"]) == [dt.datetime(2024, 3, 1)]
        assert ev(spark, {"$dateAdd": {"startDate": "$x", "unit": "day",
                                       "amount": 20}},
                  row, ["x"]) == [TS + dt.timedelta(days=20)]
        assert ev(spark, {"$dateSubtract": {
            "startDate": "$x", "unit": "hour", "amount": 14}},
            row, ["x"]) == [TS - dt.timedelta(hours=14)]

    def test_date_diff_counts_boundary_crossings(self, spark):
        # Mongo: 23:59 → 00:01 next day is 1 "day" even though only
        # 2 minutes elapsed
        rows = [(dt.datetime(2024, 1, 1, 23, 59),
                 dt.datetime(2024, 1, 2, 0, 1))]
        df = spark.createDataFrame(rows, ["a", "b"])
        spec = {"$dateDiff": {"startDate": "$a", "endDate": "$b",
                              "unit": "day"}}
        assert df.select(value_expr(spec).alias("out")) \
            .collect()[0]["out"] == 1
        for unit, want in [("month", 0), ("hour", 1), ("minute", 2),
                           ("second", 120)]:
            spec = {"$dateDiff": {"startDate": "$a", "endDate": "$b",
                                  "unit": unit}}
            assert df.select(value_expr(spec).alias("out")) \
                .collect()[0]["out"] == want, unit

    def test_date_diff_months_years(self, spark):
        rows = [(dt.datetime(2023, 12, 31), dt.datetime(2024, 1, 1))]
        df = spark.createDataFrame(rows, ["a", "b"])
        for unit, want in [("month", 1), ("year", 1), ("quarter", 1)]:
            spec = {"$dateDiff": {"startDate": "$a", "endDate": "$b",
                                  "unit": unit}}
            assert df.select(value_expr(spec).alias("out")) \
                .collect()[0]["out"] == want, unit

    def test_timezone_rejected(self, spark):
        with pytest.raises(InvalidPipelineError, match="timezone"):
            ev(spark, {"$dateToString": {"date": "$x",
                                         "timezone": "America/New_York"}},
               [(TS,)], ["x"])


class TestArrays:
    ROWS = [([1, 2, 3, 4, 5],)]

    def test_elem_at(self, spark):
        for idx, want in [(0, 1), (2, 3), (-1, 5), (-5, 1), (9, None),
                          (-9, None)]:
            got = ev(spark, {"$arrayElemAt": ["$x", idx]},
                     self.ROWS, ["x"])
            assert got == [want], f"idx {idx}"

    def test_slice(self, spark):
        cases = [([["$x", 2]], [1, 2]), ([["$x", -2]], [4, 5]),
                 ([["$x", 1, 3]], [2, 3, 4]), ([["$x", -2, 1]], [4]),
                 ([["$x", 10]], [1, 2, 3, 4, 5])]
        for (args,), want in cases:
            assert ev(spark, {"$slice": args}, self.ROWS, ["x"]) == [want]

    def test_concat_size_reverse_indexof(self, spark):
        assert ev(spark, {"$concatArrays": ["$x", [9]]},
                  self.ROWS, ["x"]) == [[1, 2, 3, 4, 5, 9]]
        assert ev(spark, {"$size": "$x"}, self.ROWS, ["x"]) == [5]
        assert ev(spark, {"$reverseArray": "$x"},
                  self.ROWS, ["x"]) == [[5, 4, 3, 2, 1]]
        assert ev(spark, {"$indexOfArray": ["$x", 3]},
                  self.ROWS, ["x"]) == [2]
        assert ev(spark, {"$indexOfArray": ["$x", 42]},
                  self.ROWS, ["x"]) == [-1]
        assert ev(spark, {"$in": [4, "$x"]}, self.ROWS, ["x"]) == [True]
        assert ev(spark, {"$in": [42, "$x"]}, self.ROWS, ["x"]) == [False]

    def test_set_ops(self, spark):
        rows = [([1, 2, 2, 3], [3, 4])]
        df_cols = ["x", "y"]
        assert sorted(ev(spark, {"$setUnion": ["$x", "$y"]},
                         rows, df_cols)[0]) == [1, 2, 3, 4]
        assert ev(spark, {"$setIntersection": ["$x", "$y"]},
                  rows, df_cols) == [[3]]
        assert sorted(ev(spark, {"$setDifference": ["$x", "$y"]},
                         rows, df_cols)[0]) == [1, 2]
        assert ev(spark, {"$setIsSubset": [[3, 4], "$y"]},
                  rows, df_cols) == [True]
        assert ev(spark, {"$setIsSubset": ["$x", "$y"]},
                  rows, df_cols) == [False]
        # set semantics: duplicates and order are ignored
        assert ev(spark, {"$setEquals": ["$x", [3, 2, 1, 1]]},
                  rows, df_cols) == [True]
        assert ev(spark, {"$setEquals": ["$x", "$y"]},
                  rows, df_cols) == [False]

    def test_all_any_true(self, spark):
        rows = [([True, True], [True, False], [False, False])]
        cols = ["a", "b", "c"]
        assert ev(spark, {"$allElementsTrue": ["$a"]}, rows, cols) == [True]
        assert ev(spark, {"$allElementsTrue": ["$b"]}, rows, cols) == [False]
        assert ev(spark, {"$anyElementTrue": ["$b"]}, rows, cols) == [True]
        assert ev(spark, {"$anyElementTrue": ["$c"]}, rows, cols) == [False]

    def test_map_filter_reduce(self, spark):
        out = ev(spark, {"$map": {"input": "$x", "as": "n",
                                  "in": {"$multiply": ["$$n", "$$n"]}}},
                 self.ROWS, ["x"])
        assert out == [[1, 4, 9, 16, 25]]
        out = ev(spark, {"$filter": {"input": "$x",
                                     "cond": {"$gt": ["$$this", 2]}}},
                 self.ROWS, ["x"])
        assert out == [[3, 4, 5]]
        out = ev(spark, {"$filter": {"input": "$x",
                                     "cond": {"$gt": ["$$this", 2]},
                                     "limit": 2}},
                 self.ROWS, ["x"])
        assert out == [[3, 4]]
        out = ev(spark, {"$reduce": {
            "input": "$x", "initialValue": 100,
            "in": {"$add": ["$$value", "$$this"]}}},
            self.ROWS, ["x"])
        assert out == [115]

    def test_nested_lambdas_shadowing(self, spark):
        # inner $map's $$this shadows the outer $filter variable
        spec = {"$map": {
            "input": {"$filter": {"input": "$x", "as": "keep",
                                  "cond": {"$lte": ["$$keep", 3]}}},
            "in": {"$add": ["$$this", 10]}}}
        assert ev(spark, spec, self.ROWS, ["x"]) == [[11, 12, 13]]

    def test_zip(self, spark):
        rows = [([1, 2, 3], [10, 20])]
        out = ev(spark, {"$zip": {"inputs": ["$x", "$y"]}}, rows,
                 ["x", "y"])
        assert out == [[[1, 10], [2, 20]]]
        out = ev(spark, {"$zip": {"inputs": ["$x", "$y"],
                                  "useLongestLength": True,
                                  "defaults": [0, -1]}}, rows,
                 ["x", "y"])
        assert out == [[[1, 10], [2, 20], [3, -1]]]
        # empty input stays a typed empty array
        out = ev(spark, {"$zip": {"inputs": ["$x", "$y"]}},
                 [([], [1])], "x array<int>, y array<int>")
        assert out == [[]]

    def test_range(self, spark):
        assert ev(spark, {"$range": [0, 5]})[0] == [0, 1, 2, 3, 4]
        assert ev(spark, {"$range": [0, 10, 3]})[0] == [0, 3, 6, 9]
        assert ev(spark, {"$range": [5, 0, -2]})[0] == [5, 3, 1]
        assert ev(spark, {"$range": [3, 3]})[0] == []
        assert ev(spark, {"$range": [5, 0]})[0] == []

    def test_sort_array(self, spark):
        rows = [([3, 1, 2],)]
        assert ev(spark, {"$sortArray": {"input": "$x", "sortBy": 1}},
                  rows, ["x"]) == [[1, 2, 3]]
        assert ev(spark, {"$sortArray": {"input": "$x", "sortBy": -1}},
                  rows, ["x"]) == [[3, 2, 1]]

    def test_object_to_array_roundtrip(self, spark):
        df = spark.createDataFrame([(1,)], ["i"]).select(
            F.create_map(F.lit("a"), F.lit(1),
                         F.lit("b"), F.lit(2)).alias("m"))
        out = df.select(
            value_expr({"$objectToArray": "$m"}).alias("out")).collect()
        assert sorted((r["k"], r["v"]) for r in out[0]["out"]) == \
            [("a", 1), ("b", 2)]
        back = df.select(value_expr(
            {"$arrayToObject": {"$objectToArray": "$m"}}).alias("out"))
        assert back.collect()[0]["out"] == {"a": 1, "b": 2}

    def test_get_field(self, spark):
        df = spark.createDataFrame([(1,)], ["i"]).select(
            F.struct(F.lit(7).alias("a")).alias("s"))
        out = df.select(value_expr(
            {"$getField": {"field": "a", "input": "$s"}}).alias("out"))
        assert out.collect()[0]["out"] == 7


class TestConditionals:
    def test_switch(self, spark):
        spec = {"$switch": {
            "branches": [
                {"case": {"$lt": ["$x", 10]}, "then": "small"},
                {"case": {"$lt": ["$x", 100]}, "then": "medium"},
            ],
            "default": "large"}}
        rows = [(5,), (50,), (500,)]
        assert ev(spark, spec, rows, ["x"]) == ["small", "medium", "large"]

    def test_switch_no_default_yields_null(self, spark):
        spec = {"$switch": {"branches": [
            {"case": {"$lt": ["$x", 0]}, "then": "neg"}]}}
        assert ev(spark, spec, [(5,)], ["x"]) == [None]

    def test_let(self, spark):
        spec = {"$let": {
            "vars": {"total": {"$add": ["$x", "$y"]}},
            "in": {"$multiply": ["$$total", "$$total"]}}}
        assert ev(spark, spec, [(3, 4)], ["x", "y"]) == [49]

    def test_unknown_variable_raises(self, spark):
        with pytest.raises(InvalidPipelineError, match="nope"):
            ev(spark, {"$add": ["$$nope", 1]})

    def test_literal(self, spark):
        assert ev(spark, {"$literal": "$x"}) == ["$x"]

    def test_and_or_not(self, spark):
        rows = [(5,)]
        assert ev(spark, {"$and": [{"$gt": ["$x", 1]},
                                   {"$lt": ["$x", 10]}]},
                  rows, ["x"]) == [True]
        assert ev(spark, {"$or": [{"$gt": ["$x", 100]},
                                  {"$lt": ["$x", 10]}]},
                  rows, ["x"]) == [True]
        assert ev(spark, {"$not": [{"$gt": ["$x", 1]}]},
                  rows, ["x"]) == [False]

    def test_convert(self, spark):
        assert ev(spark, {"$convert": {"input": "$x", "to": "string"}},
                  [(7,)], ["x"]) == ["7"]
        assert ev(spark, {"$convert": {"input": "$x", "to": "int",
                                       "onError": -1}},
                  [("abc",)], ["x"]) == [-1]
        assert ev(spark, {"$convert": {"input": "$x", "to": "int",
                                       "onNull": 0}},
                  [(None,)], "x string") == [0]


class TestStrings:
    def test_split(self, spark):
        rows = [("a.b.c",)]
        # delimiter is LITERAL, not a regex — '.' must not match-any
        assert ev(spark, {"$split": ["$x", "."]},
                  rows, ["x"]) == [["a", "b", "c"]]
        assert ev(spark, {"$split": ["abc", "."]}) == [["abc"]]
        # trailing empty fields are kept (Mongo keeps them)
        assert ev(spark, {"$split": ["$x", ","]},
                  [("a,b,",)], ["x"]) == [["a", "b", ""]]
        # dynamic delimiter from a column
        assert ev(spark, {"$split": ["$x", "$d"]},
                  [("a|b", "|")], ["x", "d"]) == [["a", "b"]]

    def test_replace(self, spark):
        rows = [("one two two",)]
        assert ev(spark, {"$replaceOne": {
            "input": "$x", "find": "two", "replacement": "2"}},
            rows, ["x"]) == ["one 2 two"]
        assert ev(spark, {"$replaceAll": {
            "input": "$x", "find": "two", "replacement": "2"}},
            rows, ["x"]) == ["one 2 2"]
        # literal replace: regex metacharacters are inert
        assert ev(spark, {"$replaceAll": {
            "input": "$x", "find": ".", "replacement": "!"}},
            [("a.b",)], ["x"]) == ["a!b"]

    def test_regex_match(self, spark):
        rows = [("Hello World",)]
        assert ev(spark, {"$regexMatch": {
            "input": "$x", "regex": "^hello", "options": "i"}},
            rows, ["x"]) == [True]
        assert ev(spark, {"$regexMatch": {
            "input": "$x", "regex": "^hello"}}, rows, ["x"]) == [False]

    def test_index_of_cp(self, spark):
        rows = [("foobarbar",)]
        assert ev(spark, {"$indexOfCP": ["$x", "bar"]},
                  rows, ["x"]) == [3]
        assert ev(spark, {"$indexOfCP": ["$x", "bar", 4]},
                  rows, ["x"]) == [6]
        assert ev(spark, {"$indexOfCP": ["$x", "zzz"]},
                  rows, ["x"]) == [-1]

    def test_trim_chars(self, spark):
        rows = [("xxhixx",)]
        assert ev(spark, {"$ltrim": {"input": "$x", "chars": "x"}},
                  rows, ["x"]) == ["hixx"]
        assert ev(spark, {"$rtrim": {"input": "$x", "chars": "x"}},
                  rows, ["x"]) == ["xxhi"]
        assert ev(spark, {"$ltrim": {"input": "  hi "}}) == ["hi "]

    def test_strcasecmp(self, spark):
        assert ev(spark, {"$strcasecmp": ["ABC", "abc"]}) == [0]
        assert ev(spark, {"$strcasecmp": ["abc", "abd"]}) == [-1]
        assert ev(spark, {"$strcasecmp": ["abd", "abc"]}) == [1]


class TestMath:
    def test_pow_log_exp(self, spark):
        assert ev(spark, {"$pow": [2, 10]}) == [1024.0]
        assert ev(spark, {"$log": [8, 2]}) == [3.0]
        assert ev(spark, {"$log10": 1000}) == [3.0]
        assert abs(ev(spark, {"$exp": 1})[0] - 2.718281828) < 1e-6

    def test_trunc(self, spark):
        assert ev(spark, {"$trunc": [7.85]}) == [7.0]
        assert ev(spark, {"$trunc": [-7.85]}) == [-7.0]
        assert ev(spark, {"$trunc": [7.85, 1]}) == [7.8]
        assert ev(spark, {"$trunc": [-7.85, 1]}) == [-7.8]

    def test_trig(self, spark):
        import math
        assert abs(ev(spark, {"$sin": math.pi / 2})[0] - 1.0) < 1e-12
        assert abs(ev(spark, {"$atan2": [1, 1]})[0] - math.pi / 4) < 1e-12
        assert ev(spark, {"$degreesToRadians": 180})[0] == math.pi
        assert ev(spark, {"$radiansToDegrees": math.pi})[0] == 180.0

    def test_casts(self, spark):
        assert ev(spark, {"$toLong": "42"}) == [42]
        assert ev(spark, {"$toBool": 1}) == [True]


class TestProjectComputed:
    """$project with computed fields (Mongo inclusion-mode grammar)."""

    def test_computed_and_included(self, spark):
        from deltalake_spark.functions.pipeline import apply_pipeline

        df = spark.createDataFrame([(1, 10.0, "ab"), (2, 20.0, "cde")],
                                   ["id", "price", "tag"])
        out = apply_pipeline(df, [
            {"$project": {
                "id": 1,
                "double_price": {"$multiply": ["$price", 2]},
                "tag_up": {"$toUpper": "$tag"},
            }},
            {"$sort": {"id": 1}},
        ])
        assert out.columns == ["id", "double_price", "tag_up"]
        assert [tuple(r) for r in out.collect()] == \
            [(1, 20.0, "AB"), (2, 40.0, "CDE")]

    def test_rename_via_field_ref(self, spark):
        from deltalake_spark.functions.pipeline import apply_pipeline

        df = spark.createDataFrame([(1, "x")], ["id", "v"])
        out = apply_pipeline(df, [{"$project": {"renamed": "$v"}}])
        assert out.columns == ["renamed"]
        assert out.collect()[0]["renamed"] == "x"

    def test_mixing_exclusion_rejected(self, spark):
        from deltalake_spark.errors import InvalidPipelineError
        from deltalake_spark.functions.pipeline import apply_pipeline

        df = spark.createDataFrame([(1, "x")], ["id", "v"])
        with pytest.raises(InvalidPipelineError, match="exclusion"):
            apply_pipeline(df, [{"$project": {
                "id": 0, "up": {"$toUpper": "$v"}}}])

    def test_pure_include_exclude_unchanged(self, spark):
        from deltalake_spark.functions.pipeline import apply_pipeline

        df = spark.createDataFrame([(1, "x", 2.0)], ["id", "v", "w"])
        assert apply_pipeline(
            df, [{"$project": {"id": 1, "v": 1}}]).columns == ["id", "v"]
        assert apply_pipeline(
            df, [{"$project": {"w": 0}}]).columns == ["id", "v"]


class TestInPipeline:
    """The operators compose inside real pipeline stages."""

    def test_addfields_group(self, spark):
        from deltalake_spark.functions.pipeline import apply_pipeline

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 5), "a-b-c"),
             (2, dt.datetime(2024, 1, 20), "x-y"),
             (3, dt.datetime(2024, 2, 2), "p-q-r-s")],
            ["id", "ts", "path"])
        out = apply_pipeline(df, [
            {"$addFields": {
                "ym": {"$dateToString": {"date": "$ts",
                                         "format": "%Y-%m"}},
                "nseg": {"$size": {"$split": ["$path", "-"]}},
            }},
            {"$group": {"_id": "$ym",
                        "n": {"$sum": 1},
                        "segs": {"$sum": "$nseg"}}},
            {"$sort": {"_id": 1}},
        ]).collect()
        assert [(r["_id"], r["n"], r["segs"]) for r in out] == \
            [("2024-01", 2, 5), ("2024-02", 1, 4)]

    def test_whole_stage_codegen(self, spark):
        # the lambda operators must stay JVM-side: no Python eval nodes
        df = spark.createDataFrame([([1, 2, 3],)], ["x"])
        out = df.select(value_expr(
            {"$reduce": {"input": {"$map": {"input": "$x",
                                            "in": {"$multiply": ["$$this",
                                                                 2]}}},
                         "initialValue": 0,
                         "in": {"$add": ["$$value", "$$this"]}}}
        ).alias("out"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert out.collect()[0]["out"] == 12
