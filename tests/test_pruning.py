"""File-level data skipping: stats + partition pruning must eliminate
files without ever changing results (reference partition pruning
table.ts:1624-1687; stats skipping is our completion of its unwired
zone-map scaffolding, SURVEY §4)."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.delta.pruning import extract_predicates, prune_files
from deltalake_spark.delta.table import DeltaTable


class TestExtractPredicates:
    def test_basic_and_nested_and(self):
        preds = extract_predicates({
            "a": 1,
            "b": {"$gte": 2, "$lt": 9},
            "$and": [{"c": {"$in": [1, 2]}}],
        })
        assert sorted(preds) == [("a", "$eq", 1), ("b", "$gte", 2),
                                 ("b", "$lt", 9), ("c", "$in", [1, 2])]

    def test_or_not_ignored(self):
        assert extract_predicates(
            {"$or": [{"a": 1}], "$not": {"b": 2}}) == []
        assert extract_predicates({"a": {"$ne": 1}}) == []


class TestPruneFiles:
    def _f(self, path, mn, mx, pv=None):
        import json
        return {
            "path": path,
            "partitionValues": pv or {},
            "stats": json.dumps(
                {"minValues": {"x": mn}, "maxValues": {"x": mx}}),
        }

    def test_range_pruning(self):
        files = [self._f("a", 0, 10), self._f("b", 20, 30),
                 self._f("c", 5, 25)]
        kept, skipped = prune_files(files, {"x": {"$gt": 12}}, [])
        assert {f["path"] for f in kept} == {"b", "c"} and skipped == 1
        kept, _ = prune_files(files, {"x": 7}, [])
        assert {f["path"] for f in kept} == {"a", "c"}
        kept, _ = prune_files(files, {"x": {"$in": [1, 22]}}, [])
        assert {f["path"] for f in kept} == {"a", "b", "c"}
        kept, _ = prune_files(files, {"x": {"$in": [15]}}, [])
        assert {f["path"] for f in kept} == {"c"}

    def test_missing_stats_kept(self):
        files = [{"path": "nostats", "partitionValues": {}}]
        kept, skipped = prune_files(files, {"x": 99}, [])
        assert kept and skipped == 0

    def test_type_mismatch_kept(self):
        files = [self._f("a", 0, 10)]
        kept, _ = prune_files(files, {"x": "zzz"}, [])  # str vs int stats
        assert kept

    def test_partition_pruning(self):
        files = [self._f("a", 0, 1, {"cat": "x"}),
                 self._f("b", 0, 1, {"cat": "y"})]
        kept, skipped = prune_files(files, {"cat": "x"}, ["cat"])
        assert [f["path"] for f in kept] == ["a"] and skipped == 1
        kept, _ = prune_files(files, {"cat": {"$in": ["y", "z"]}}, ["cat"])
        assert [f["path"] for f in kept] == ["b"]


@pytest.fixture()
def table(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "t"))
    for lo in (0, 100, 200, 300):
        df = spark.createDataFrame(
            [(lo + i, f"cat{lo // 100}") for i in range(100)],
            "x long, cat string",
        ).coalesce(1)
        t.write(df)
    return t


def test_end_to_end_stats_skipping(table):
    out = table.query({"x": {"$gte": 250, "$lt": 320}})
    assert table.last_query_skipped_files == 2  # files [0,99] and [100,199]
    assert out.count() == 70
    assert {r["x"] for r in out.collect()} == set(range(250, 320))


def test_end_to_end_partition_pruning(spark, tmp_path):
    t = DeltaTable(spark, str(tmp_path / "p"))
    df = spark.createDataFrame(
        [(i, f"cat{i % 4}") for i in range(400)], "x long, cat string"
    )
    t.write(df, partition_by=["cat"])
    n_files = len(t.snapshot().files)
    out = t.query({"cat": "cat2", "x": {"$lt": 1000}})
    assert t.last_query_skipped_files > 0
    assert out.count() == 100
    assert n_files > len(t.snapshot().files) - t.last_query_skipped_files


def test_pruning_never_changes_results(table):
    for flt in ({"x": {"$gt": 150}}, {"x": 42}, {"x": {"$in": [5, 305]}},
                {"$or": [{"x": 1}, {"x": 399}]}, None):
        via_query = table.query(flt)
        plain = table.to_df()
        if flt:
            from deltalake_spark.functions.filters import translate_filter

            plain = plain.filter(translate_filter(flt))
        assert sorted(r["x"] for r in via_query.collect()) \
            == sorted(r["x"] for r in plain.collect())
