"""Single-pass data-quality audit (operators/audit.py)."""

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.audit import audit_checks
from deltalake_spark.plans import plan_summary


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (2, None, 999.0),
         (3, "zz", -5.0), (4, "c", None)],
        "id long, name string, v double")


def test_all_check_kinds(spark, dirty):
    out = {(r["col"], r["check"]): r
           for r in audit_checks(dirty, [
               {"col": "id", "check": "unique"},
               {"col": "name", "check": "not_null"},
               {"col": "v", "check": "range", "min": 0, "max": 100},
               {"col": "name", "check": "in_set",
                "values": ["a", "b", "c"]},
               {"col": "name", "check": "regex", "pattern": "^[a-z]$"},
           ]).collect()}
    assert out[("id", "unique")]["n_violations"] == 1      # dup id 2
    assert out[("name", "not_null")]["n_violations"] == 1
    # range: null + 999 + -5
    assert out[("v", "range")]["n_violations"] == 3
    assert out[("name", "in_set")]["n_violations"] == 2    # null + zz
    assert out[("name", "regex")]["n_violations"] == 2
    assert all(r["n_rows"] == 5 for r in out.values())
    assert not any(r["passed"] for r in out.values())


def test_clean_table_passes_and_single_pass(spark):
    clean = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    out = audit_checks(clean, [
        {"col": "id", "check": "unique"},
        {"col": "id", "check": "not_null"},
        {"col": "v", "check": "range", "min": 0, "max": 6},
    ])
    assert all(r["passed"] for r in out.collect())
    # all checks fold into one aggregation over one scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # range source appears once (+reuse)
    assert plan_summary(out).shuffles <= 2


def test_spec_order_preserved_and_validation(spark, dirty):
    out = audit_checks(dirty, [
        {"col": "v", "check": "range", "min": 0, "max": 100},
        {"col": "id", "check": "unique"},
        {"col": "name", "check": "not_null"},
    ]).collect()
    # spec order before the gate's orderBy: range, unique, not_null
    assert [(r["col"], r["check"]) for r in out] == [
        ("v", "range"), ("id", "unique"), ("name", "not_null")]
    with pytest.raises(ValueError):
        audit_checks(dirty, [])
    with pytest.raises(ValueError):
        audit_checks(dirty, [{"col": "id", "check": "nope"}])


class TestProfileTable:
    def test_profile_values(self, spark):
        from deltalake_spark.operators.audit import profile_table

        df = spark.createDataFrame(
            [(1, "x"), (2, None), (2, "y"), (None, "x")],
            "a long, s string")
        out = {r["column"]: r for r in profile_table(df).collect()}
        assert out["a"]["n_rows"] == 4
        assert out["a"]["n_null"] == 1
        assert out["a"]["n_distinct"] == 2
        assert (out["a"]["min_value"], out["a"]["max_value"]) == ("1", "2")
        assert out["s"]["n_null"] == 1
        assert out["s"]["n_distinct"] == 2
        assert (out["s"]["min_value"], out["s"]["max_value"]) == ("x", "y")

    def test_profile_column_subset_and_validation(self, spark):
        from deltalake_spark.operators.audit import profile_table

        df = spark.createDataFrame([(1, "x")], "a long, s string")
        assert [r["column"] for r in
                profile_table(df, ["s"]).collect()] == ["s"]
        with pytest.raises(ValueError):
            profile_table(df, [])


class TestEquidepthHistogram:
    def test_exact_buckets_vs_sequential(self, spark):
        from deltalake_spark.operators.audit import equidepth_histogram
        from pyspark.sql import functions as F

        # values with heavy ties — the tiebreak resolves the order
        df = spark.createDataFrame(
            [(i, (i * 7) % 13) for i in range(103)], "id long, v long")
        out = {r["bucket"]: r for r in equidepth_histogram(
            df, col="v", tiebreak="id", buckets=4,
            partitions=5).collect()}
        # sequential reference
        rows = sorted(((i * 7) % 13, i) for i in range(103))
        want = {}
        for rank, (v, i) in enumerate(rows):
            b = rank * 4 // 103
            lo, hi, n = want.get(b, (v, v, 0))
            want[b] = (min(lo, v), max(hi, v), n + 1)
        assert set(out) == set(want)
        for b, (lo, hi, n) in want.items():
            assert (out[b]["lo"], out[b]["hi"], out[b]["n"]) == (lo, hi, n)
        # equal depth within one row
        sizes = [out[b]["n"] for b in sorted(out)]
        assert max(sizes) - min(sizes) <= 1

    def test_partitioning_invariant_and_validation(self, spark):
        from deltalake_spark.operators.audit import equidepth_histogram
        from pyspark.sql import functions as F

        df = spark.range(500).select(
            F.col("id"), ((F.col("id") * 31) % 97).alias("v"))
        a = sorted(map(tuple, equidepth_histogram(
            df.coalesce(1), col="v", tiebreak="id", buckets=7,
            partitions=3).collect()))
        b = sorted(map(tuple, equidepth_histogram(
            df.repartition(11), col="v", tiebreak="id", buckets=7,
            partitions=9).collect()))
        assert a == b
        import pytest as _pytest
        with _pytest.raises(ValueError):
            equidepth_histogram(df, col="v", tiebreak="id", buckets=0)
        empty = spark.createDataFrame([], "id long, v long")
        with _pytest.raises(ValueError):
            equidepth_histogram(empty, col="v", tiebreak="id")


# ---------------------------------------------------------------- k-anonymity

def test_k_anonymity_histogram(spark):
    from deltalake_spark.operators.audit import k_anonymity
    rows = (
        [("a", "x")] * 1          # class size 1  -> at risk (k=3)
        + [("a", "y")] * 2        # class size 2  -> at risk
        + [("b", "x")] * 3        # class size 3  -> safe
        + [("b", "y")] * 3        # class size 3  -> safe
    )
    df = spark.createDataFrame(rows, "qa string, qb string")
    out = {r["class_size"]: r for r in
           k_anonymity(df, quasi_cols=["qa", "qb"], k=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_classes"] == 1 and out[1]["n_rows"] == 1
    assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 2
    assert out[3]["n_classes"] == 2 and out[3]["n_rows"] == 6
    assert out[1]["at_risk"] and out[2]["at_risk"]
    assert not out[3]["at_risk"]


def test_k_anonymity_null_is_its_own_class(spark):
    from deltalake_spark.operators.audit import k_anonymity
    df = spark.createDataFrame(
        [(None, "x"), (None, "x"), ("a", "x")], "qa string, qb string")
    out = {r["class_size"]: r for r in
           k_anonymity(df, quasi_cols=["qa", "qb"], k=2).collect()}
    # (NULL, x) twice -> size 2 safe; (a, x) once -> size 1 at risk
    assert out[2]["n_classes"] == 1 and not out[2]["at_risk"]
    assert out[1]["n_classes"] == 1 and out[1]["at_risk"]


def test_k_anonymity_validation(spark):
    from deltalake_spark.operators.audit import k_anonymity
    df = spark.createDataFrame([(1,)], "a int")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        k_anonymity(df, quasi_cols=[], k=2)
    with _pytest.raises(ValueError):
        k_anonymity(df, quasi_cols=["a"], k=0)
