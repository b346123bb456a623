"""BM25 retrieval operator (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest

from deltalake_spark.operators.retrieval import bm25_topk
from deltalake_spark.plans import assert_plan


def python_bm25(rows, terms, k1=1.2, b=0.75):
    """Sequential reference implementation (dict-of-lists corpus)."""
    toks = {i: t.lower().split() for i, t in rows}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(tk) / avgdl))
        out[i] = round(s, 4)
    return out


ROWS = [
    (1, "spark join merge spark spark"),
    (2, "merge sort filter table"),
    (3, "vector vector vector spark"),
    (4, "the a an of"),
    (5, "spark"),
    (6, "join join join join join join join join"),
]


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, ["spark", "vector"], k=10).collect()}
    want = python_bm25(ROWS, ["spark", "vector"])
    assert got == want


def test_ranking_and_k_boundary(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    rows = bm25_topk(docs, ["spark", "vector"], k=3).collect()
    want = python_bm25(ROWS, ["spark", "vector"])
    order = sorted(want, key=lambda i: (-want[i], i))[:3]
    assert [r["doc_id"] for r in rows] == order
    # zero-match docs score exactly 0 and rank by doc_id
    zero = bm25_topk(docs, ["nonexistent"], k=10).collect()
    assert all(r["score"] == 0.0 for r in zero)
    assert [r["doc_id"] for r in zero] == [1, 2, 3, 4, 5, 6]


def test_empty_terms_rejected(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_plan_shape(spark, sf_dir):
    """Stats row broadcasts as a hash join (never nested-loop), no wide
    shuffle beyond the single stats aggregate, top-k is a TakeOrdered."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bm25_topk(docs, ["spark", "merge"], k=20)
    s = assert_plan(df, max_shuffles=0)
    # stats arrive via ONE reused scalar subquery — no join node at all
    assert s.joins == 0
    assert s.text.count("Subquery") >= 1
    assert "TakeOrderedAndProject" in s.text
    assert "BatchEvalPython" not in s.text


def test_view_isolation_across_corpora(spark):
    """Results from an earlier corpus stay correct after a second call
    registers a different corpus (views are keyed by plan hash)."""
    a = spark.createDataFrame(ROWS, ["doc_id", "text"])
    b = spark.createDataFrame([(9, "spark spark spark")],
                              ["doc_id", "text"])
    ra = bm25_topk(a, ["spark"], k=10)        # lazily references view(a)
    rb = bm25_topk(b, ["spark"], k=10)
    got_b = rb.collect()
    got_a = {r["doc_id"]: r["score"] for r in ra.collect()}
    assert got_a == python_bm25(ROWS, ["spark"])
    assert [r["doc_id"] for r in got_b] == [9]


class TestRRFFuse:
    def test_known_fusion(self, spark):
        from deltalake_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long")
        b = spark.createDataFrame(
            [(20, 1), (10, 2), (40, 3)], "doc_id long, rank long")
        out = {r["doc_id"]: (r["rrf_score"], r["fused_rank"])
               for r in rrf_fuse([a, b], k=60).collect()}
        exp = {
            10: 1 / 61 + 1 / 62,
            20: 1 / 62 + 1 / 61,
            30: 1 / 63,
            40: 1 / 63,
        }
        for d, s in exp.items():
            assert out[d][0] == round(s, 6)
        # 10 and 20 tie exactly -> id ascending breaks it; same for 30/40
        assert [out[d][1] for d in (10, 20, 30, 40)] == [1, 2, 3, 4]

    def test_topk_and_single_list(self, spark):
        from deltalake_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "doc_id long, rank long")
        out = rrf_fuse([a], k=60, topk=3).collect()
        assert [r["doc_id"] for r in out] == [0, 1, 2]
        assert [r["fused_rank"] for r in out] == [1, 2, 3]

    def test_empty_input_raises(self, spark):
        from deltalake_spark.operators.retrieval import rrf_fuse

        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([])
