"""r7 ADVICE regressions: silent-truncation and cross-mode row-contract
fixes.

- interval_union: fractional start/end columns raise TypeError instead
  of silently cast("long")-truncating toward zero (a truncation can
  flip a touch-vs-gap decision, contradicting the "exact integer
  arithmetic end to end" contract).
- simhash_candidates: NULL-text rows are excluded in BOTH hash modes
  (previously the portable path dropped them via explode while the
  native path kept a null-fingerprint row — cross-mode divergence).
"""

import pytest
from pyspark.sql import functions as F


def test_interval_union_rejects_fractional_bounds(spark):
    from deltalake_spark.operators.temporal import interval_union

    df = spark.createDataFrame(
        [("a", 0.5, 2.4)], "k string, s double, e double")
    with pytest.raises(TypeError, match="integral"):
        interval_union(df, key_cols=["k"], start_col="s", end_col="e")

    # the would-have-truncated case: [0.5, 2.4) and [2.5, 3.0) do NOT
    # touch, but truncation makes them [0,2) / [2,3) which do; the
    # explicit-cast caller sees the merge and owns that decision
    ok = spark.createDataFrame(
        [("a", 0, 2), ("a", 2, 3)], "k string, s long, e long")
    got = interval_union(ok, key_cols=["k"], start_col="s", end_col="e")
    assert got.count() == 1


def test_interval_union_accepts_int_types(spark):
    from deltalake_spark.operators.temporal import interval_union

    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 7, 9)], "k string, s int, e int")
    assert interval_union(
        df, key_cols=["k"], start_col="s", end_col="e").count() == 2


@pytest.mark.parametrize("mode", ["native", "portable"])
def test_simhash_candidates_null_text_excluded(spark, mode):
    from deltalake_spark.operators.dedup import simhash_candidates

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in
            range(4)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = simhash_candidates(
        df, id_col="doc_id", text_col="text", prefix_bits=8,
        hash_mode=mode).collect()
    members = sorted(m for r in out for m in r["member_ids"])
    # the 4 identical docs block together; the NULL-text rows appear in
    # no block in EITHER mode (same row contract across modes)
    assert members == [0, 1, 2, 3]
