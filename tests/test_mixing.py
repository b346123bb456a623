"""Corpus mixing (operators/mixing.py) + span dedup
(operators/curation.py span_dedup): determinism, prefix-sum exactness
vs a sequential reference, and partitioning invariance."""

import math

import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.curation import span_dedup
from deltalake_spark.operators.mixing import (
    KNUTH,
    deterministic_shuffle,
    doc_priority,
    mixture_weights,
    proportional_budgets,
    sample_by_token_budget,
    temperature_budgets,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


@pytest.fixture()
def mix_corpus(spark):
    # two sources with very different sizes so temperature visibly
    # reallocates; texts sized so budgets cut mid-source
    rows = []
    for i in range(40):
        rows.append((i, "big", " ".join(f"w{i}x{j}" for j in range(10))))
    for i in range(40, 46):
        rows.append((i, "small", " ".join(f"s{i}y{j}" for j in range(5))))
    return _docs(spark, rows)


# ---------------------------------------------------------------- span dedup

def test_span_dedup_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),       # spans (k=2): "a b", "c d"
            (2, "a b x y"),       # "a b" duplicates doc 1 pos 0
            (3, "c d"),           # duplicates doc 1 pos 1
        ],
        "doc_id long, text string",
    )
    out = span_dedup(df, span_tokens=2).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["text"], r["n_spans_total"],
             r["n_spans_kept"]) for r in out] == [
        (1, "a b c d", 2, 2),
        (2, "x y", 2, 1),
        (3, "", 1, 0),
    ]


def test_span_dedup_tail_span_and_order(spark):
    # 5 tokens at k=2 -> spans "a b", "c d", "e" (short tail kept)
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "q r e")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           span_dedup(df, span_tokens=2).collect()}
    assert out[1]["text"] == "a b c d e"
    # doc 2: "q r" unique, tail "e" duplicates doc 1's tail span
    assert out[2]["text"] == "q r"
    assert out[2]["n_spans_kept"] == 1


def test_span_dedup_delimiter_mode(spark):
    df = spark.createDataFrame(
        [
            (1, "intro line\nshared boilerplate\noutro one"),
            (2, "other intro\nshared boilerplate\noutro two"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in
           span_dedup(df, delimiter="\n").collect()}
    assert out[1] == "intro line\nshared boilerplate\noutro one"
    assert out[2] == "other intro\noutro two"


def test_span_dedup_mark_only_and_brute_force(spark, mix_corpus):
    # reference implementation in plain Python over the same rows
    rows = [(r["doc_id"], r["text"])
            for r in mix_corpus.orderBy("doc_id").collect()]
    k = 3
    seen = set()
    expect_kept = {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        spans = [" ".join(toks[i:i + k]) for i in range(0, len(toks), k)]
        for pos, s in enumerate(spans):
            if s not in seen:
                seen.add(s)
                expect_kept[(doc_id, pos)] = s
    marked = span_dedup(
        mix_corpus, span_tokens=k, mark_only=True).collect()
    got_kept = {(r["doc_id"], r["pos"]): r["span"]
                for r in marked if r["kept"]}
    assert got_kept == expect_kept


# ------------------------------------------------------------------- mixing

def test_doc_priority_matches_python(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    got = {r["doc_id"]: r["p"] for r in df.select(
        "doc_id", doc_priority(F.col("doc_id"), 7).alias("p")).collect()}
    for i in range(100):
        assert got[i] == ((i + 7) * KNUTH) % 2**32


def test_mixture_weights_normalized_and_temperature(spark, mix_corpus):
    w = {r["source"]: r for r in
         mixture_weights(mix_corpus, alpha=0.5).collect()}
    assert math.isclose(sum(r["weight"] for r in w.values()), 1.0)
    big_t, small_t = w["big"]["tokens"], w["small"]["tokens"]
    expect_big = math.sqrt(big_t) / (
        math.sqrt(big_t) + math.sqrt(small_t))
    assert math.isclose(w["big"]["weight"], expect_big, rel_tol=1e-12)
    # temperature upsamples the small source vs proportional share
    assert w["small"]["weight"] > small_t / (big_t + small_t)


def test_proportional_budgets_integer_exact(spark, mix_corpus):
    b = {r["source"]: r["budget"] for r in
         proportional_budgets(mix_corpus, 100).collect()}
    tokens = {"big": 400, "small": 30}
    total = 430
    for s in b:
        assert b[s] == 100 * tokens[s] // total


def test_temperature_budgets_integer_exact(spark, mix_corpus):
    rows = {r["source"]: r for r in
            temperature_budgets(
                mix_corpus, budget_num=2, budget_den=5).collect()}
    scales = {s: math.isqrt(rows[s]["tokens"]) for s in rows}
    total = (400 + 30) * 2 // 5
    ssum = sum(scales.values())
    for s in rows:
        assert rows[s]["scale"] == scales[s]
        assert rows[s]["budget"] == total * scales[s] // ssum


def _sequential_reference(rows, budgets, seed):
    """Naive per-source priority-ordered prefix selection."""
    sel = set()
    by_source = {}
    for doc_id, source, text in rows:
        tok = len([t for t in text.split(" ") if t])
        pri = ((doc_id + seed) * KNUTH) % 2**32
        by_source.setdefault(source, []).append((pri, doc_id, tok))
    for source, docs in by_source.items():
        docs.sort()
        cum = 0
        for pri, doc_id, tok in docs:
            cum += tok
            if cum <= budgets[source]:
                sel.add(doc_id)
    return sel


@pytest.mark.parametrize("n_buckets", [4, 256])
def test_sample_by_token_budget_matches_sequential(
        spark, mix_corpus, n_buckets):
    budgets = temperature_budgets(mix_corpus)
    bud = {r["source"]: r["budget"] for r in budgets.collect()}
    rows = [(r["doc_id"], r["source"], r["text"])
            for r in mix_corpus.collect()]
    expect = _sequential_reference(rows, bud, seed=7)
    sel = sample_by_token_budget(
        mix_corpus, budgets, seed=7, n_buckets=n_buckets)
    got = {r["doc_id"] for r in sel.collect()}
    assert got == expect
    assert 0 < len(got) < len(rows)  # budget actually cuts
    # cum_tokens is the exact per-source running total
    for r in sel.collect():
        assert r["cum_tokens"] <= bud[r["source"]]


def test_sample_partitioning_invariant(spark, mix_corpus):
    budgets = temperature_budgets(mix_corpus)
    a = {r["doc_id"] for r in sample_by_token_budget(
        mix_corpus.repartition(1), budgets, seed=7).collect()}
    b = {r["doc_id"] for r in sample_by_token_budget(
        mix_corpus.repartition(13, "doc_id"), budgets,
        seed=7).collect()}
    assert a == b


def test_deterministic_shuffle_stable(spark, mix_corpus):
    a = [r["doc_id"] for r in
         deterministic_shuffle(mix_corpus, seed=3).collect()]
    b = [r["doc_id"] for r in
         deterministic_shuffle(
             mix_corpus.repartition(7, "source"), seed=3).collect()]
    assert a == b
    assert sorted(a) == sorted(r[0] for r in mix_corpus
                               .select("doc_id").collect())
    # a different seed produces a different order
    c = [r["doc_id"] for r in
         deterministic_shuffle(mix_corpus, seed=4).collect()]
    assert a != c


# ---------------------------------------------------------- property tests

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny alphabet + short docs force heavy span collisions
_doc = st.lists(st.sampled_from("aa bb cc".split()), min_size=0,
                max_size=12).map(" ".join)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc, min_size=1, max_size=8), k=st.integers(1, 4))
def test_span_dedup_matches_reference(spark, texts, k):
    rows = [(i, t) for i, t in enumerate(texts)]
    # Python reference: first-occurrence-wins over (doc_id, pos)
    seen, want = set(), {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        spans = [" ".join(toks[i:i + k]) for i in range(0, len(toks), k)]
        kept = [s for s in spans if s not in seen and not seen.add(s)]
        want[doc_id] = (" ".join(kept), len(spans), len(kept))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_spans_total"], r["n_spans_kept"])
           for r in span_dedup(df, span_tokens=k).collect()}
    assert got == want


def test_deterministic_split_disjoint_exhaustive(spark):
    from deltalake_spark.operators.mixing import deterministic_split

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = deterministic_split(
        df, id_col="doc_id",
        fractions={"train": 0.75, "val": 0.125, "test": 0.125}, seed=7)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    # exhaustive: every row assigned exactly once
    assert sum(counts.values()) == 5000
    # roughly proportional (hash uniformity)
    assert abs(counts["train"] - 3750) < 250
    # stable across partitioning and repeated runs
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    out2 = deterministic_split(
        df.repartition(13), id_col="doc_id",
        fractions={"train": 0.75, "val": 0.125, "test": 0.125}, seed=7)
    assert sorted((r["doc_id"], r["split"]) for r in out2.collect()) == a
    # seed changes the assignment
    out3 = deterministic_split(df, id_col="doc_id", seed=8)
    assert sorted((r["doc_id"], r["split"]) for r in out3.collect()) != a


def test_assign_shards_matches_sequential_reference(spark):
    from deltalake_spark.operators.mixing import (
        assign_shards,
        doc_priority,
        token_count,
    )

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 7))) for i in range(2000)],
        ["doc_id", "text"],
    )
    out = assign_shards(df, id_col="doc_id", text_col="text",
                        shard_tokens=500, seed=3)
    rows = {r["doc_id"]: (r["shard_id"], r["tok"], r["cum_tokens"])
            for r in out.collect()}
    # sequential reference: sort by (priority, id), running sum
    KNUTH = 2654435761
    order = sorted(range(2000),
                   key=lambda i: (((i + 3) * KNUTH) % 2**32, i))
    cum = 0
    for i in order:
        tok = 3 + i % 7
        assert rows[i] == (cum // 500, tok, cum + tok), i
        cum += tok
    # partitioning invariance
    out2 = assign_shards(df.repartition(17), id_col="doc_id",
                         text_col="text", shard_tokens=500, seed=3)
    assert {r["doc_id"]: (r["shard_id"], r["tok"], r["cum_tokens"])
            for r in out2.collect()} == rows
    # shard fill: every shard but the last holds >= shard_tokens - max_doc
    per = {}
    for sid, tok, _ in rows.values():
        per[sid] = per.get(sid, 0) + tok
    last = max(per)
    for sid, tot in per.items():
        if sid != last:
            assert tot >= 500 - 9


class TestWeightedSample:
    def test_matches_python_reference(self, spark):
        from deltalake_spark.operators.mixing import (
            KNUTH,
            weighted_sample,
        )

        rows = [(i, "g0" if i % 2 else "g1", float(10 + (i * 13) % 90))
                for i in range(200)]
        df = spark.createDataFrame(
            rows, "doc_id long, grp string, w double")
        out = weighted_sample(df, id_col="doc_id", weight_col="w", k=5,
                              group_col="grp", seed=7)
        got = {(r["grp"], r["sample_rank"]): r["doc_id"]
               for r in out.collect()}

        def pri(i, w):
            u = (((i + 7) * KNUTH) % 2**32 + 0.5) / 2**32
            return u ** (1.0 / w)

        for g in ("g0", "g1"):
            members = [(i, w) for i, gg, w in rows if gg == g]
            ranked = sorted(members, key=lambda t: (-pri(*t), t[0]))[:5]
            for rk, (i, _) in enumerate(ranked, start=1):
                assert got[(g, rk)] == i
        assert len(got) == 10

    def test_weight_bias(self, spark):
        """Heavily weighted rows dominate the sample."""
        from deltalake_spark.operators.mixing import weighted_sample

        rows = [(i, 1000.0 if i < 50 else 0.001) for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        out = weighted_sample(df, id_col="doc_id", weight_col="w", k=40)
        picked = [r["doc_id"] for r in out.collect()]
        assert len(picked) == 40
        assert sum(1 for i in picked if i < 50) >= 38

    def test_nonpositive_weights_excluded(self, spark):
        from deltalake_spark.operators.mixing import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id long, w double")
        out = weighted_sample(df, id_col="doc_id", weight_col="w", k=10)
        assert [r["doc_id"] for r in out.collect()] == [1]

    def test_repartition_invariance(self, spark):
        from deltalake_spark.operators.mixing import weighted_sample

        df = spark.range(500).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 9 + 1.0).alias("w"))
        a = {r["doc_id"] for r in weighted_sample(
            df, id_col="doc_id", weight_col="w", k=25).collect()}
        b = {r["doc_id"] for r in weighted_sample(
            df.repartition(13), id_col="doc_id", weight_col="w",
            k=25).collect()}
        assert a == b and len(a) == 25


def test_group_topfrac_filter_exact_ceil_and_ties(spark):
    """r9: kept count is ceil(n * num/den) per group; the boundary tie
    breaks on the tiebreak column (total order); every non-empty group
    keeps at least one row."""
    from deltalake_spark.operators.mixing import group_topfrac_filter

    rows = [("a", i, 10 - (i % 3)) for i in range(10)]   # ties in score
    rows += [("b", 100 + i, 5) for i in range(4)]        # ALL tied
    rows += [("c", 200, 1)]                              # singleton
    df = spark.createDataFrame(rows, "g string, id long, s long")
    kept = group_topfrac_filter(
        df, group_cols=["g"], score_col="s", tiebreak_col="id",
        keep_num=3, keep_den=10)
    got = {}
    for r in kept.collect():
        got.setdefault(r["g"], []).append(r["id"])
    # a: ceil(10*0.3)=3 -> the three score-10 rows (ids 0,3,6)
    assert sorted(got["a"]) == [0, 3, 6]
    # b: ceil(4*0.3)=2 -> all tied, smallest ids win
    assert sorted(got["b"]) == [100, 101]
    # c: ceil(1*0.3)=1 -> singleton survives
    assert got["c"] == [200]
    import pytest

    with pytest.raises(ValueError):
        group_topfrac_filter(df, group_cols=["g"], score_col="s",
                             tiebreak_col="id", keep_num=0, keep_den=10)
