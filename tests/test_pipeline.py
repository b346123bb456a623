"""Aggregation pipeline translator — mirrors the reference's accumulator and
stage tests (/root/reference/tests/unit/query/aggregation.test.ts:64-581,
fixtures `Sale`/`Order` at 23-60)."""

from __future__ import annotations

import math

import pytest

from deltalake_spark.errors import InvalidPipelineError
from deltalake_spark.functions.pipeline import apply_pipeline


@pytest.fixture(scope="module")
def sales(spark):
    # mirrors the Sale fixture shape (aggregation.test.ts:23-41)
    rows = [
        ("widget", "widgets", 10, 2.5, "US", ["a", "b"]),
        ("widget", "widgets", 5, 2.5, "EU", ["b"]),
        ("gadget", "gadgets", 20, 10.0, "US", None),
        ("gadget", "gadgets", 2, 10.0, "APAC", ["c"]),
        ("gizmo", "gadgets", 8, 5.0, "EU", ["a", "c"]),
    ]
    return spark.createDataFrame(
        rows, "product string, category string, quantity int, price double, "
        "region string, tags array<string>"
    )


def by_id(rows):
    return {r["_id"]: r.asDict() for r in rows}


def test_group_sum_avg_count(sales):
    out = apply_pipeline(
        sales,
        [
            {"$group": {
                "_id": "$category",
                "totalQty": {"$sum": "$quantity"},
                "avgPrice": {"$avg": "$price"},
                "n": {"$sum": 1},
            }},
            {"$sort": {"_id": 1}},
        ],
    ).collect()
    got = by_id(out)
    assert got["gadgets"]["totalQty"] == 30
    assert got["gadgets"]["n"] == 3
    assert got["widgets"]["avgPrice"] == 2.5
    assert [r["_id"] for r in out] == ["gadgets", "widgets"]


def test_group_all_null_id(sales):
    out = apply_pipeline(
        sales, [{"$group": {"_id": None, "total": {"$sum": "$quantity"}}}]
    ).collect()
    assert len(out) == 1
    assert out[0]["_id"] is None
    assert out[0]["total"] == 45


def test_group_compound_key(sales):
    out = apply_pipeline(
        sales,
        [{"$group": {"_id": {"cat": "$category", "region": "$region"},
                     "n": {"$count": {}}}}],
    ).collect()
    keys = {(r["_id"]["cat"], r["_id"]["region"]) for r in out}
    assert ("widgets", "US") in keys and ("gadgets", "APAC") in keys
    assert len(out) == 5


def test_min_max_stddev(sales):
    out = apply_pipeline(
        sales,
        [{"$group": {
            "_id": "$category",
            "lo": {"$min": "$quantity"},
            "hi": {"$max": "$quantity"},
            "sp": {"$stdDevPop": "$quantity"},
            "ss": {"$stdDevSamp": "$quantity"},
        }}],
    ).collect()
    got = by_id(out)
    assert got["gadgets"]["lo"] == 2 and got["gadgets"]["hi"] == 20
    assert math.isclose(got["widgets"]["sp"], 2.5)


def test_stddev_samp_single_value_is_null(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    out = apply_pipeline(
        df, [{"$group": {"_id": "$k", "s": {"$stdDevSamp": "$v"}}}]
    ).collect()
    assert out[0]["s"] is None


def test_push_addtoset(sales):
    out = apply_pipeline(
        sales,
        [{"$group": {"_id": "$category",
                     "products": {"$push": "$product"},
                     "uniq": {"$addToSet": "$price"}}}],
    ).collect()
    got = by_id(out)
    assert sorted(got["gadgets"]["products"]) == ["gadget", "gadget", "gizmo"]
    assert sorted(got["gadgets"]["uniq"]) == [5.0, 10.0]


def test_sum_expression(sales):
    # nested accumulator expression (src/query/index.ts:1240-1249)
    out = apply_pipeline(
        sales,
        [{"$group": {"_id": None,
                     "revenue": {"$sum": {"$multiply": ["$quantity", "$price"]}}}}],
    ).collect()
    assert math.isclose(out[0]["revenue"], 10 * 2.5 + 5 * 2.5 + 200 + 20 + 40)


def test_match_group_sort_limit_skip(sales):
    out = apply_pipeline(
        sales,
        [
            {"$match": {"quantity": {"$gte": 5}}},
            {"$group": {"_id": "$product", "q": {"$sum": "$quantity"}}},
            {"$sort": {"q": -1}},
            {"$skip": 1},
            {"$limit": 1},
        ],
    ).collect()
    # quantities: widget 15, gadget 20, gizmo 8 → sorted desc: gadget, widget, gizmo
    assert out[0]["_id"] == "widget" and out[0]["q"] == 15


def test_unwind(sales):
    out = apply_pipeline(sales, [{"$unwind": "$tags"}]).collect()
    assert len(out) == 6  # nulls dropped
    outer = apply_pipeline(
        sales, [{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": True}}]
    ).collect()
    assert len(outer) == 7


def test_project_stage(sales):
    out = apply_pipeline(
        sales, [{"$project": {"product": 1, "quantity": 1}}]
    )
    assert out.columns == ["product", "quantity"]
    out2 = apply_pipeline(sales, [{"$project": {"tags": 0}}])
    assert "tags" not in out2.columns


def test_count_stage(sales):
    out = apply_pipeline(
        sales, [{"$match": {"category": "gadgets"}}, {"$count": "n"}]
    ).collect()
    assert out[0]["n"] == 3


def test_unknown_stage_rejected(sales):
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(sales, [{"$lookup": {}}])
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(sales, [{"$group": {"x": {"$sum": 1}}}])  # no _id


# --- extension stages ($addFields/$lookup/$bucket/$sortByCount/$replaceRoot)


def test_add_fields(sales):
    out = apply_pipeline(
        sales,
        [{"$addFields": {"revenue": {"$multiply": ["$quantity", "$price"]},
                         "flag": 1}},
         {"$sort": {"product": 1, "region": 1}}],
    ).collect()
    assert out[0]["revenue"] == 2 * 10.0 and out[0]["flag"] == 1
    assert {r["product"] for r in out} == {"widget", "gadget", "gizmo"}


def test_lookup_collects_matches_and_empty_arrays(spark, sales):
    regions = spark.createDataFrame(
        [("US", "Americas"), ("EU", "Europe")],
        "code string, continent string",
    )
    out = apply_pipeline(
        sales,
        [{"$lookup": {"from": regions, "localField": "region",
                      "foreignField": "code", "as": "geo"}},
         {"$sort": {"product": 1, "region": 1}}],
    ).collect()
    by_region = {(r["product"], r["region"]): r["geo"] for r in out}
    assert by_region[("widget", "US")][0]["continent"] == "Americas"
    assert by_region[("gadget", "APAC")] == []  # unmatched → [], not null


def test_lookup_via_registered_view(spark, sales):
    spark.createDataFrame(
        [("widgets", "hardware")], "cat string, dept string"
    ).createOrReplaceTempView("depts_vw")
    out = apply_pipeline(
        sales,
        [{"$lookup": {"from": "depts_vw", "localField": "category",
                      "foreignField": "cat", "as": "dept"}}],
    ).collect()
    n_matched = sum(1 for r in out if r["dept"])
    assert n_matched == 2  # the two widgets rows


def test_bucket(sales):
    out = apply_pipeline(
        sales,
        [{"$bucket": {"groupBy": "$quantity", "boundaries": [0, 5, 10, 50],
                      "default": "other",
                      "output": {"count": {"$sum": 1},
                                 "total": {"$sum": "$quantity"}}}}],
    ).collect()
    got = {int(r["_id"]): (r["count"], r["total"]) for r in out}
    assert got[0] == (1, 2) and got[5] == (2, 13) and got[10] == (2, 30)


def test_bucket_rejects_unsorted(sales):
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(sales, [{"$bucket": {"groupBy": "$quantity",
                                            "boundaries": [10, 0]}}])


def test_sort_by_count(sales):
    out = apply_pipeline(sales, [{"$sortByCount": "$category"}]).collect()
    assert [(r["_id"], r["count"]) for r in out] == [
        ("gadgets", 3), ("widgets", 2)]


def test_replace_root(spark):
    df = spark.createDataFrame(
        [(1, {"a": 10, "b": "x"})], "id int, doc struct<a:int,b:string>"
    )
    out = apply_pipeline(df, [{"$replaceRoot": {"newRoot": "$doc"}}]).collect()
    assert out[0].asDict() == {"a": 10, "b": "x"}
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(df, [{"$replaceRoot": {"newRoot": "$id"}}])


def test_median_and_percentile_accumulators(sales):
    out = apply_pipeline(
        sales,
        [{"$group": {
            "_id": None,
            "med_qty": {"$median": "$quantity"},
            "qs": {"$percentile": {"input": "$quantity",
                                   "p": [0.0, 0.5, 1.0]}},
        }}],
    ).collect()[0]
    # quantities: 2, 5, 8, 10, 20 → median 8
    assert out["med_qty"] == 8.0
    assert out["qs"] == [2.0, 8.0, 20.0]
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(sales, [{"$group": {
            "_id": None, "bad": {"$percentile": {"input": "$quantity",
                                                 "p": [1.5]}}}}])


def test_topn_bottomn_accumulators(sales):
    out = apply_pipeline(
        sales,
        [{"$group": {
            "_id": None,
            "top2": {"$topN": {"output": "$product",
                               "sortBy": "$quantity", "n": 2}},
            "bot2": {"$bottomN": {"output": "$product",
                                  "sortBy": "$quantity", "n": 2}},
        }}],
    ).collect()[0]
    # quantities: gadget 20, widget 10, gizmo 8, widget 5, gadget 2
    assert out["top2"] == ["gadget", "widget"]
    assert out["bot2"] == ["gadget", "widget"]
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(sales, [{"$group": {
            "_id": None,
            "bad": {"$topN": {"output": "$product", "sortBy": "$quantity",
                              "n": 0}}}}])


def test_firstn_lastn_accumulators(spark):
    df = spark.createDataFrame(
        [("g", i) for i in range(1, 6)], "k string, v int"
    ).coalesce(1).orderBy("v")
    out = apply_pipeline(
        df,
        [{"$sort": {"v": 1}},
         {"$group": {"_id": "$k",
                     "f2": {"$firstN": {"input": "$v", "n": 2}},
                     "l2": {"$lastN": {"input": "$v", "n": 2}}}}],
    ).collect()[0]
    assert out["f2"] == [1, 2]
    # Mongo's $lastN preserves ORIGINAL order (the last n, not reversed)
    assert out["l2"] == [4, 5]


def test_unwind_include_array_index(sales):
    out = apply_pipeline(
        sales,
        [{"$match": {"product": "widget", "region": "US"}},
         {"$unwind": {"path": "$tags", "includeArrayIndex": "tag_idx"}}],
    ).collect()
    assert sorted((r["tag_idx"], r["tags"]) for r in out) == [
        (0, "a"), (1, "b")]
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(sales, [{"$unwind": {"path": "$tags",
                                            "includeArrayIndex": "$x"}}])


def test_aggregate_returns_documents_and_stats(spark):
    from deltalake_spark.functions.pipeline import aggregate

    df = spark.createDataFrame(
        [(i, f"c{i % 3}", i * 10) for i in range(30)],
        ["id", "cat", "amount"],
    )
    docs, stats = aggregate(df, [
        {"$match": {"amount": {"$gte": 50}}},
        {"$group": {"_id": "$cat", "total": {"$sum": "$amount"}}},
        {"$sort": {"total": -1}},
    ])
    assert len(docs) == 3
    assert stats.documents_processed == 30
    assert stats.groups_created == 3
    assert stats.execution_time_ms > 0
    # values: cats of ids 5..29 -> totals
    expected = {}
    for i in range(5, 30):
        expected[f"c{i % 3}"] = expected.get(f"c{i % 3}", 0) + i * 10
    got = {r["_id"]: r["total"] for r in docs}
    assert got == expected


def test_aggregate_stats_without_group(spark):
    from deltalake_spark.functions.pipeline import aggregate

    df = spark.createDataFrame([(1,), (2,), (3,)], ["x"])
    docs, stats = aggregate(df, [{"$match": {"x": {"$gt": 1}}}])
    assert len(docs) == 2
    assert stats.documents_processed == 3
    assert stats.groups_created == 0


def test_aggregate_group_count_exact_despite_gap_sort(spark):
    """$group -> $match -> $sort: the $match breaks the contiguous
    cardinality-preserving run, so an in-flight metric under the sort
    would double-count via boundary sampling; the fallback must report
    the exact group count."""
    from deltalake_spark.functions.pipeline import aggregate

    df = spark.createDataFrame(
        [(i, f"c{i % 7}") for i in range(700)], ["id", "cat"]
    ).repartition(8)
    docs, stats = aggregate(df, [
        {"$group": {"_id": "$cat", "n": {"$sum": 1}}},
        {"$match": {"n": {"$gte": 100}}},
        {"$sort": {"n": -1}},
    ])
    assert stats.groups_created == 7
    assert stats.documents_processed == 700
    assert len(docs) == 7


def test_union_with_stage(spark):
    from deltalake_spark.functions.pipeline import apply_pipeline

    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    b = spark.createDataFrame(
        [(3, "z", 9.5), (4, "w", 0.5)], ["id", "v", "extra"])
    out = apply_pipeline(
        a,
        [{"$unionWith": {"coll": "b",
                         "pipeline": [{"$match": {"extra": {"$gt": 1}}}]}},
         {"$sort": {"id": 1}}],
        tables={"b": b},
    )
    rows = out.collect()
    assert [r["id"] for r in rows] == [1, 2, 3]
    # missing columns null-filled (Mongo shape)
    assert rows[0]["extra"] is None and rows[2]["extra"] == 9.5
    # string shorthand
    out2 = apply_pipeline(a, [{"$unionWith": "b"}], tables={"b": b})
    assert out2.count() == 4


def test_set_window_fields_stage(spark):
    from deltalake_spark.functions.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
         ("b", 1, 5.0), ("b", 2, 15.0)],
        ["grp", "seq", "amt"],
    )
    out = apply_pipeline(df, [
        {"$setWindowFields": {
            "partitionBy": "$grp",
            "sortBy": {"seq": 1},
            "output": {
                "running": {"$sum": "$amt"},
                "rnk": {"$rank": {}},
                "prev": {"$shift": {"output": "$amt", "by": -1,
                                    "default": 0.0}},
                "grp_total": {"$sum": "$amt",
                              "window": {"documents":
                                         ["unbounded", "unbounded"]}},
            },
        }},
    ]).orderBy("grp", "seq")
    rows = [(r["grp"], r["seq"], r["running"], r["rnk"], r["prev"],
             r["grp_total"]) for r in out.collect()]
    assert rows == [
        ("a", 1, 10.0, 1, 0.0, 60.0),
        ("a", 2, 30.0, 2, 10.0, 60.0),
        ("a", 3, 60.0, 3, 20.0, 60.0),
        ("b", 1, 5.0, 1, 0.0, 20.0),
        ("b", 2, 20.0, 2, 5.0, 20.0),
    ]


def test_set_window_fields_validation(spark):
    from deltalake_spark.errors import InvalidPipelineError
    from deltalake_spark.functions.pipeline import apply_set_window_fields

    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(InvalidPipelineError):
        apply_set_window_fields(df, {"output": {"r": {"$rank": {}}}})
    with pytest.raises(InvalidPipelineError):
        apply_set_window_fields(
            df, {"sortBy": {"x": 1}, "output": {"r": {"$bogus": {}}}})


def test_densify_and_fill_stages(spark):
    from deltalake_spark.functions.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 20, 3.0), ("b", 10, 7.0), ("b", 15, 9.0)],
        ["grp", "t", "v"],
    )
    out = apply_pipeline(df, [
        {"$densify": {"field": "t", "partitionBy": "$grp",
                      "range": {"step": 5, "bounds": "partition"}}},
        {"$fill": {"partitionBy": "$grp", "sortBy": {"t": 1},
                   "output": {"v": {"method": "locf"}}}},
    ]).orderBy("grp", "t")
    rows = [(r["grp"], r["t"], r["v"]) for r in out.collect()]
    assert rows == [
        ("a", 0, 1.0), ("a", 5, 1.0), ("a", 10, 1.0), ("a", 15, 1.0),
        ("a", 20, 3.0),
        ("b", 10, 7.0), ("b", 15, 9.0),
    ]
    # off-step existing docs survive densify untouched
    df2 = spark.createDataFrame([("a", 3, 5.0)], ["grp", "t", "v"])
    out2 = apply_pipeline(
        df.unionByName(df2),
        [{"$densify": {"field": "t", "partitionBy": "$grp",
                       "range": {"step": 10, "bounds": "partition"}}}])
    ts = sorted(r["t"] for r in out2.where("grp = 'a'").collect())
    assert ts == [0, 3, 10, 20]
    # constant fill
    out3 = apply_pipeline(
        out2.where("grp = 'a'"),
        [{"$fill": {"output": {"v": {"value": 0.0}}}}])
    assert out3.where("v IS NULL").count() == 0


def test_out_and_merge_stages(spark, tmp_path):
    from deltalake_spark.delta.table import DeltaTable
    from deltalake_spark.functions.pipeline import apply_pipeline

    path = str(tmp_path / "merge_target")
    t = DeltaTable(spark, path)
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"])
    # $out: overwrite-create the target from a pipeline
    apply_pipeline(base, [{"$out": t}])
    assert t.to_df().count() == 3
    # $merge: upsert updated + new rows by key
    src = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], ["id", "name", "v"])
    apply_pipeline(src, [
        {"$merge": {"into": t, "on": "id",
                    "whenMatched": "replace",
                    "whenNotMatched": "insert"}},
    ])
    got = {r["id"]: (r["name"], r["v"])
           for r in t.to_df().collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30),
                   4: ("d", 40)}
    # keepExisting + discard = no-op merge
    apply_pipeline(
        spark.createDataFrame([(2, "x", 0), (9, "y", 9)],
                              ["id", "name", "v"]),
        [{"$merge": {"into": t, "on": "id",
                     "whenMatched": "keepExisting",
                     "whenNotMatched": "discard"}}])
    assert {r["id"] for r in t.to_df().collect()} == {1, 2, 3, 4}
    assert t.to_df().where("id = 2").first()["v"] == 200


def test_graph_lookup_ancestors_and_cycles(spark):
    from deltalake_spark.functions.pipeline import apply_pipeline

    # tree: 1 <- 2 <- 3 <- 4, plus a 2-cycle 10 <-> 11
    emp = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 3), (10, 11), (11, 10)],
        ["eid", "mgr"],
    )
    out = apply_pipeline(emp, [
        {"$graphLookup": {
            "from": emp, "startWith": "$mgr",
            "connectFromField": "mgr", "connectToField": "eid",
            "as": "chain", "depthField": "d",
        }},
    ])
    got = {r["eid"]: sorted((e["eid"], e["d"]) for e in r["chain"])
           for r in out.collect()}
    assert got[1] == []                      # null start -> empty
    assert got[4] == [(1, 2), (2, 1), (3, 0)]  # BFS depths
    # cycle terminates and collects both nodes once, min depth
    assert got[10] == [(10, 1), (11, 0)]
    assert got[11] == [(10, 0), (11, 1)]


def test_graph_lookup_max_depth(spark):
    from deltalake_spark.functions.pipeline import apply_pipeline

    emp = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 3)], ["eid", "mgr"])
    out = apply_pipeline(emp, [
        {"$graphLookup": {
            "from": emp, "startWith": "$mgr",
            "connectFromField": "mgr", "connectToField": "eid",
            "as": "chain", "maxDepth": 0,
        }},
    ])
    got = {r["eid"]: [e["eid"] for e in r["chain"]]
           for r in out.collect()}
    assert got[4] == [3] and got[1] == []


def test_expression_operators(spark):
    from deltalake_spark.functions.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [(1, "Alpha", 10.567, None), (2, "beta", -3.2, 5.0)],
        ["id", "name", "x", "y"],
    )
    out = apply_pipeline(df, [
        {"$addFields": {
            "upper": {"$toUpper": "$name"},
            "tag": {"$concat": ["$name", "-", {"$toString": "$id"}]},
            "head": {"$substrCP": ["$name", 0, 2]},
            "mag": {"$round": [{"$abs": "$x"}, 1]},
            "y_filled": {"$ifNull": ["$y", 0.0]},
            "band": {"$cond": {"if": {"$gte": ["$x", 0]},
                               "then": "pos", "else": "neg"}},
            "parity": {"$mod": ["$id", 2]},
        }},
    ]).orderBy("id")
    rows = out.collect()
    r1, r2 = rows
    assert r1["upper"] == "ALPHA" and r2["upper"] == "BETA"
    assert r1["tag"] == "Alpha-1" and r2["tag"] == "beta-2"
    assert r1["head"] == "Al"
    assert r1["mag"] == 10.6 and r2["mag"] == 3.2
    assert r1["y_filled"] == 0.0 and r2["y_filled"] == 5.0
    assert r1["band"] == "pos" and r2["band"] == "neg"
    assert r1["parity"] == 1 and r2["parity"] == 0
    # unknown operator still raises a clear error
    from deltalake_spark.errors import InvalidPipelineError
    with pytest.raises(InvalidPipelineError):
        apply_pipeline(df, [{"$addFields": {"z": {"$bogus": "$x"}}}])


def test_facet_bucketauto_sample_stages(spark):
    from deltalake_spark.functions.pipeline import apply_pipeline

    df = spark.createDataFrame(
        [(i, f"c{i % 3}", float(i)) for i in range(100)],
        ["id", "cat", "v"],
    )
    # $facet: two sub-pipelines over the same input, one result doc
    out = apply_pipeline(df, [
        {"$facet": {
            "by_cat": [{"$group": {"_id": "$cat", "n": {"$sum": 1}}},
                       {"$sort": {"_id": 1}}],
            "top3": [{"$sort": {"v": -1}}, {"$limit": 3},
                     {"$project": ["id"]}],
        }},
    ])
    row = out.first()
    assert sorted((e["_id"], e["n"]) for e in row["by_cat"]) == [
        ("c0", 34), ("c1", 33), ("c2", 33)]
    assert sorted(e["id"] for e in row["top3"]) == [97, 98, 99]

    # $bucketAuto: ~equal-count buckets, contiguous boundaries
    ba = apply_pipeline(df, [
        {"$bucketAuto": {"groupBy": "$v", "buckets": 4}},
    ]).collect()
    assert len(ba) == 4
    assert sum(r["count"] for r in ba) == 100
    assert all(20 <= r["count"] <= 30 for r in ba)
    mins = [r["_id"]["min"] for r in ba]
    assert mins == sorted(mins)

    # $sample: deterministic across partitionings, size respected
    s1 = apply_pipeline(df, [{"$sample": {"size": 10, "seed": 5}}])
    s2 = apply_pipeline(df.repartition(7),
                        [{"$sample": {"size": 10, "seed": 5}}])
    ids1 = sorted(r["id"] for r in s1.collect())
    assert ids1 == sorted(r["id"] for r in s2.collect())
    assert len(ids1) == 10
    s3 = apply_pipeline(df, [{"$sample": {"size": 10, "seed": 6}}])
    assert sorted(r["id"] for r in s3.collect()) != ids1
