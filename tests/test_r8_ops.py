"""r8 operators: rolling quantiles, Dunning G² collocations, and the
IVF-PQ composed ANN search."""

import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- rolling

def test_rolling_quantile_matches_python(spark):
    from deltalake_spark.operators.timeseries import rolling_quantile

    rng = random.Random(11)
    rows = [("k%d" % (i % 3), i, rng.randrange(-50, 500))
            for i in range(120)]
    df = spark.createDataFrame(rows, "k string, t int, x long")
    for q_num, q_den, w in ((1, 2, 7), (9, 10, 5), (0, 1, 4), (1, 1, 6)):
        out = rolling_quantile(
            df, group_cols=["k"], order_cols=["t"], value_col="x",
            q_num=q_num, q_den=q_den, window_rows=w, out_col="rq")
        got = {(r["k"], r["t"]): r["rq"] for r in out.collect()}
        series = {}
        for k, t, x in sorted(rows, key=lambda r: (r[0], r[1])):
            series.setdefault(k, []).append((t, x))
        for k, pts in series.items():
            for i, (t, _) in enumerate(pts):
                frame = sorted(x for _, x in pts[max(0, i - w + 1):i + 1])
                idx = (len(frame) - 1) * q_num // q_den
                assert got[(k, t)] == frame[idx], (k, t, q_num, q_den, w)


def test_rolling_quantile_validation(spark):
    from deltalake_spark.operators.timeseries import rolling_quantile

    df = spark.createDataFrame([("a", 1, 1)], "k string, t int, x long")
    with pytest.raises(ValueError, match="window_rows"):
        rolling_quantile(df, group_cols=["k"], order_cols=["t"],
                         value_col="x", q_num=1, q_den=2, window_rows=0)
    with pytest.raises(ValueError, match="quantile"):
        rolling_quantile(df, group_cols=["k"], order_cols=["t"],
                         value_col="x", q_num=3, q_den=2, window_rows=3)
    with pytest.raises(ValueError, match="non-empty"):
        rolling_quantile(df, group_cols=[], order_cols=["t"],
                         value_col="x", q_num=1, q_den=2, window_rows=3)


# ---------------------------------------------------------------- G²

def test_collocation_g2_matches_reference(spark):
    from deltalake_spark.operators.text import collocation_g2

    corpus = [
        "the new york times is here",
        "new york city and new york state",
        "the times are new",
        "york is a city in england the new era",
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = {(r["w1"], r["w2"]): (r["pair_count"], r["g2"])
           for r in collocation_g2(df, min_count=1).collect()}

    bigrams = []
    for t in corpus:
        ws = t.split(" ")
        bigrams += list(zip(ws, ws[1:]))
    c = Counter(bigrams)
    n = len(bigrams)
    r1 = Counter(w1 for w1, _ in bigrams)
    c2 = Counter(w2 for _, w2 in bigrams)

    def ref_g2(pair):
        k11 = c[pair]
        rr, cc = r1[pair[0]], c2[pair[1]]
        cells = ((k11, rr, cc), (rr - k11, rr, n - cc),
                 (cc - k11, n - rr, cc), (n - rr - cc + k11, n - rr, n - cc))
        s = 0.0
        for k, row, col in cells:
            if k > 0:
                s += k * math.log(k * float(n) / row / col)
        return 2.0 * s

    assert len(got) == len(c)
    for pair, (cnt, val) in got.items():
        assert cnt == c[pair]
        assert val == pytest.approx(ref_g2(pair), abs=1e-9)
    # the planted collocation dominates
    top = max(got, key=lambda p: got[p][1])
    assert top == ("new", "york")


def test_collocation_g2_ranks_frequency_over_rarity(spark):
    """The reason G² exists beside PMI: a pair seen once between two
    hapax words maxes PMI lift but must NOT outrank a pair seen many
    times between common words."""
    from deltalake_spark.operators.text import collocation_g2
    from deltalake_spark.operators.text import collocation_pmi

    docs = [("strong coffee please",)] * 30 + [("zq xv",)] \
        + [("strong tea please",)] * 10 + [("coffee is strong",)] * 10
    df = spark.createDataFrame(docs, "text string")
    g2 = {(r["w1"], r["w2"]): r["g2"]
          for r in collocation_g2(df, min_count=1).collect()}
    pmi = {(r["w1"], r["w2"]): r["lift"]
           for r in collocation_pmi(df, min_count=1).collect()}
    # PMI puts the hapax pair at the top; G² puts it strictly below
    # the 30-count collocation
    assert pmi[("zq", "xv")] == max(pmi.values())
    assert g2[("strong", "coffee")] > g2[("zq", "xv")]


def test_collocation_g2_empty_corpus(spark):
    from deltalake_spark.operators.text import collocation_g2

    df = spark.createDataFrame([("",), ("solo",)], "text string")
    assert collocation_g2(df).count() == 0


# ---------------------------------------------------------------- IVF-PQ

@pytest.fixture(scope="module")
def emb001(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").persist()


def _seed_setup(spark, emb):
    rows = {r[0]: list(r[1])
            for r in emb.where(F.col("vec_id") < 8)
            .orderBy("vec_id").collect()}
    seeds = [rows[i] for i in range(8)]
    books = [[s[:32] for s in seeds], [s[32:] for s in seeds]]
    intc = [list(r[0]) for r in emb.where(F.col("vec_id") < 8)
            .orderBy("vec_id")
            .select(F.expr(
                "transform(cast(embedding as array<double>),"
                " x -> cast(round(x * 1000000.0D) as bigint))"))
            .collect()]
    return books, intc


def test_ivf_pq_full_probe_equals_adc_scan(spark, emb001):
    """nprobe = all buckets ⇒ per-query results equal the full-corpus
    ADC scan (pq_adc_topk) for that query vector — the composition
    adds routing, never changes the scoring."""
    from deltalake_spark.operators.similarity import (
        ivf_pq_topk_join, pq_adc_topk, pq_encode)

    books, intc = _seed_setup(spark, emb001)
    queries = emb001.filter(F.col("vec_id") % 50 == 0)
    corpus = emb001.select(F.col("vec_id").alias("corpus_id"),
                           "embedding")
    out = ivf_pq_topk_join(
        queries, corpus, intc, books, query_id="vec_id",
        corpus_id="corpus_id", k=4, nprobe=8).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["vec_id"], []).append(
            (r["rank"], r["corpus_id"], r["adc"]))
    enc = pq_encode(emb001.select("vec_id", "embedding"), books)
    for qid, mine in by_q.items():
        qvec = list(emb001.where(F.col("vec_id") == qid)
                    .select("embedding").first()[0])
        ref = [(i + 1, r["vec_id"], r["adc"]) for i, r in enumerate(
            pq_adc_topk(enc, books, qvec, id_col="vec_id", k=4)
            .collect())]
        assert sorted(mine) == ref, qid


def test_ivf_pq_partial_probe_subset_and_recall(spark, emb001):
    """nprobe<all returns candidates ONLY from the query's probed
    buckets (the routing actually constrains the join), per-query
    ranks are consecutive from 1 with non-decreasing adc, and every
    query answers."""
    from deltalake_spark.operators.similarity import (
        _probe_expr_q, ivf_pq_topk_join)

    books, intc = _seed_setup(spark, emb001)
    queries = emb001.filter(F.col("vec_id") % 50 == 0)
    corpus = emb001.select(F.col("vec_id").alias("corpus_id"),
                           "embedding")
    out = ivf_pq_topk_join(
        queries, corpus, intc, books, query_id="vec_id",
        corpus_id="corpus_id", k=3, nprobe=2).collect()
    n_queries = queries.count()
    by_q = {}
    for r in out:
        by_q.setdefault(r["vec_id"], []).append(r)
    assert len(by_q) == n_queries
    qv = ("transform(cast(`embedding` as array<double>),"
          " x -> cast(round(x * 1000000.0D) as bigint))")
    probes = {r["vec_id"]: set(r["p"]) for r in queries.select(
        "vec_id", _probe_expr_q(intc, qv, 2).alias("p")).collect()}
    buckets = {r["corpus_id"]: r["b"] for r in corpus.select(
        "corpus_id", _probe_expr_q(intc, qv, 1)[0].alias("b")).collect()}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        adcs = [r["adc"] for r in rows]
        assert adcs == sorted(adcs)
        for r in rows:
            assert buckets[r["corpus_id"]] in probes[qid], (qid, r)


def test_ivf_pq_same_id_raises(spark, emb001):
    from deltalake_spark.operators.similarity import ivf_pq_topk_join

    books, intc = _seed_setup(spark, emb001)
    with pytest.raises(ValueError, match="must differ"):
        ivf_pq_topk_join(emb001, emb001, intc, books,
                         query_id="vec_id", corpus_id="vec_id")


def test_rolling_quantile_range_mode_matches_python(spark):
    from deltalake_spark.operators.timeseries import rolling_quantile

    rng = random.Random(5)
    # duplicate order values on purpose: RANGE includes equal-t peers
    rows = [("k%d" % (i % 2), rng.randrange(0, 40), rng.randrange(0, 99))
            for i in range(80)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    out = rolling_quantile(
        df, group_cols=["k"], order_cols=["t"], value_col="x",
        q_num=1, q_den=2, range_interval=5, out_col="rq")
    got = sorted((r["k"], r["t"], r["x"], r["rq"])
                 for r in out.collect())
    want = []
    for k, t, x in rows:
        frame = sorted(x2 for k2, t2, x2 in rows
                       if k2 == k and t - 5 <= t2 <= t)
        idx = (len(frame) - 1) * 1 // 2
        want.append((k, t, x, frame[idx]))
    assert got == sorted(want)


def test_rolling_quantile_mode_validation(spark):
    from deltalake_spark.operators.timeseries import rolling_quantile

    df = spark.createDataFrame([("a", 1, 1)], "k string, t int, x long")
    with pytest.raises(ValueError, match="exactly one"):
        rolling_quantile(df, group_cols=["k"], order_cols=["t"],
                         value_col="x", q_num=1, q_den=2)
    with pytest.raises(ValueError, match="exactly one"):
        rolling_quantile(df, group_cols=["k"], order_cols=["t"],
                         value_col="x", q_num=1, q_den=2,
                         window_rows=3, range_interval=5)
    with pytest.raises(ValueError, match="one numeric order col"):
        rolling_quantile(df, group_cols=["k"], order_cols=["t", "x"],
                         value_col="x", q_num=1, q_den=2,
                         range_interval=5)


# ------------------------------------------------------- interval overlap

def test_interval_overlap_join_matches_python(spark):
    from deltalake_spark.operators.temporal import interval_overlap_join

    rng = random.Random(3)
    lrows = [("k%d" % (i % 2), s, s + rng.randrange(1, 15))
             for i, s in enumerate(rng.sample(range(0, 200), 30))]
    rrows = [("k%d" % (i % 2), s, s + rng.randrange(1, 15))
             for i, s in enumerate(rng.sample(range(0, 200), 30))]
    ldf = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(lrows)],
        "k string, ls long, le long, lid long")
    rdf = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(rrows)],
        "k string, rs long, re long, rid long")
    got = sorted(
        (r["lid"], r["rid"], r["overlap_start"], r["overlap_end"],
         r["overlap_len"])
        for r in interval_overlap_join(
            ldf, rdf, on="k", left_start="ls", left_end="le",
            right_start="rs", right_end="re", min_overlap=2).collect())
    want = []
    for li, (lk, ls, le) in enumerate(lrows):
        for ri, (rk, rs, re) in enumerate(rrows):
            if lk != rk:
                continue
            os_, oe = max(ls, rs), min(le, re)
            if oe - os_ >= 2:
                want.append((li, ri, os_, oe, oe - os_))
    assert got == sorted(want)


def test_interval_overlap_join_contracts(spark):
    from deltalake_spark.operators.temporal import interval_overlap_join

    ldf = spark.createDataFrame([("a", 0, 5)], "k string, s long, e long")
    rdf = spark.createDataFrame([("a", 5, 9)], "k string, s long, e long")
    # touching half-open intervals do NOT overlap
    assert interval_overlap_join(
        ldf, rdf, on="k", left_start="s", left_end="e",
        right_start="s", right_end="e").count() == 0
    with pytest.raises(ValueError, match="equi-keys"):
        interval_overlap_join(
            ldf, rdf, on=[], left_start="s", left_end="e",
            right_start="s", right_end="e")
    with pytest.raises(ValueError, match="min_overlap"):
        interval_overlap_join(
            ldf, rdf, on="k", left_start="s", left_end="e",
            right_start="s", right_end="e", min_overlap=0)
    # colliding right columns get the suffix; join is equi-key (no
    # cartesian in the plan)
    out = interval_overlap_join(
        spark.createDataFrame([("a", 0, 9)], "k string, s long, e long"),
        spark.createDataFrame([("a", 3, 6)], "k string, s long, e long"),
        on="k", left_start="s", left_end="e",
        right_start="s", right_end="e")
    assert {"s_r", "e_r"} <= set(out.columns)
    row = out.collect()[0]
    assert (row["overlap_start"], row["overlap_end"],
            row["overlap_len"]) == (3, 6, 3)
    assert "Cartesian" not in out._jdf.queryExecution().executedPlan().toString()


def test_rolling_quantile_null_values_excluded(spark):
    """NULL values drop out of frames (collect_list semantics, now
    explicit contract); an all-null frame yields NULL instead of the
    ANSI element_at(arr, 0) error."""
    from deltalake_spark.operators.timeseries import rolling_quantile

    df = spark.createDataFrame(
        [("a", 0, None), ("a", 1, 10), ("a", 2, None), ("a", 3, 30),
         ("b", 0, None), ("b", 1, None)],
        "k string, t int, x long")
    out = {(r["k"], r["t"]): r["rq"] for r in rolling_quantile(
        df, group_cols=["k"], order_cols=["t"], value_col="x",
        q_num=1, q_den=2, window_rows=3, out_col="rq").collect()}
    assert out[("a", 0)] is None          # empty frame -> NULL, no error
    assert out[("a", 1)] == 10
    assert out[("a", 2)] == 10            # frame {10}
    assert out[("a", 3)] == 10            # frame {10, 30}, lower median
    assert out[("b", 0)] is None and out[("b", 1)] is None


# ----------------------------------------------------------- rolling MAD

def test_rolling_mad_matches_python(spark):
    from deltalake_spark.operators.timeseries import rolling_mad

    rng = random.Random(17)
    rows = [("k%d" % (i % 2), i, rng.randrange(-30, 300))
            for i in range(90)]
    df = spark.createDataFrame(rows, "k string, t int, x long")
    for w in (3, 7):
        out = {(r["k"], r["t"]): (r["rolling_med"], r["rolling_mad"])
               for r in rolling_mad(
                   df, group_cols=["k"], order_cols=["t"],
                   value_col="x", window_rows=w).collect()}
        series = {}
        for k, t, x in sorted(rows):
            series.setdefault(k, []).append((t, x))
        for k, pts in series.items():
            for i, (t, _) in enumerate(pts):
                fr = sorted(x for _, x in pts[max(0, i - w + 1):i + 1])
                med = fr[(len(fr) - 1) // 2]
                mad = sorted(abs(v - med) for v in fr)[(len(fr) - 1) // 2]
                assert out[(k, t)] == (med, mad), (k, t, w)


def test_rolling_mad_robust_to_outlier_and_nulls(spark):
    from deltalake_spark.operators.timeseries import rolling_mad

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 12), ("a", 2, 11), ("a", 3, 100000),
         ("a", 4, 13), ("b", 0, None)],
        "k string, t int, x long")
    out = {(r["k"], r["t"]): (r["rolling_med"], r["rolling_mad"])
           for r in rolling_mad(df, group_cols=["k"], order_cols=["t"],
                                value_col="x", window_rows=5).collect()}
    # the outlier barely moves median/MAD (the whole point vs stddev)
    assert out[("a", 4)] == (12, 1)
    assert out[("b", 0)] == (None, None)


# --------------------------------------------------------------- keyness

def test_keyness_g2_matches_reference(spark):
    from deltalake_spark.operators.text import keyness_g2

    docs_a = ["the quick brown fox", "the lazy dog sat", "fox and dog"]
    docs_b = ["der schnelle fuchs", "the dog der hund", "hund und fuchs"]
    rows = [(t, "en") for t in docs_a] + [(t, "de") for t in docs_b]
    df = spark.createDataFrame(rows, "text string, lang string")
    got = {r["token"]: (r["count_a"], r["count_b"], r["g2"],
                        r["overuse_a"])
           for r in keyness_g2(df, group_col="lang", group_a="en",
                               group_b="de", min_count=1).collect()}
    toks_a = [w for t in docs_a for w in t.split(" ")]
    toks_b = [w for t in docs_b for w in t.split(" ")]
    ca, cb = Counter(toks_a), Counter(toks_b)
    na, nb = len(toks_a), len(toks_b)
    n = na + nb
    for tok in set(ca) | set(cb):
        k11, k21 = ca[tok], cb[tok]
        cw = k11 + k21
        s = 0.0
        for k, row, col in ((k11, na, cw), (na - k11, na, n - cw),
                            (k21, nb, cw), (nb - k21, nb, n - cw)):
            if k > 0:
                s += k * math.log(k * float(n) / row / col)
        want = 2.0 * s
        assert got[tok][0] == k11 and got[tok][1] == k21
        assert got[tok][2] == pytest.approx(want, abs=1e-9), tok
        assert got[tok][3] == (k11 * nb > k21 * na)
    # 'fuchs'/'hund' are German-only, 'fox'/'lazy' English-only
    assert not got["fuchs"][3] and not got["hund"][3]
    assert got["fox"][3] and got["lazy"][3]


def test_keyness_g2_empty_side(spark):
    from deltalake_spark.operators.text import keyness_g2

    df = spark.createDataFrame([("hello world", "en")],
                               "text string, lang string")
    assert keyness_g2(df, group_col="lang", group_a="en",
                      group_b="de").count() == 0


# ------------------------------------------------------- sliding distinct

def test_sliding_distinct_matches_python(spark):
    from deltalake_spark.operators.sketches import sliding_distinct

    rng = random.Random(23)
    rows = [("g%d" % (i % 2), rng.randrange(0, 12), rng.randrange(0, 40))
            for i in range(300)]
    df = spark.createDataFrame(rows, "g string, day long, uid long")
    out = {(r["g"], r["day"]): (r["exact_distinct"], r["hll_estimate"])
           for r in sliding_distinct(
               df, group_cols=["g"], order_col="day", col="uid",
               window_range=3).collect()}
    days = {}
    for g, d, u in rows:
        days.setdefault((g, d), set()).add(u)
    for (g, d), _ in days.items():
        want = len(set().union(*[days.get((g, d2), set())
                                 for d2 in range(d - 3, d + 1)]))
        exact, est = out[(g, d)]
        assert exact == want, (g, d)
        # at these cardinalities the HLL sparse mode is near-exact
        assert abs(est - exact) <= max(2, 0.1 * exact), (g, d)


def test_sliding_distinct_calendar_gaps(spark):
    """RANGE semantics: a missing day still ages values out (a ROWS
    frame over observed days would keep them alive)."""
    from deltalake_spark.operators.sketches import sliding_distinct

    df = spark.createDataFrame(
        [("g", 0, 1), ("g", 0, 2), ("g", 5, 3)],
        "g string, day long, uid long")
    out = {r["day"]: r["exact_distinct"] for r in sliding_distinct(
        df, group_cols=["g"], order_col="day", col="uid",
        window_range=2).collect()}
    assert out[0] == 2
    assert out[5] == 1  # days 3..5: the day-0 users aged out

    with pytest.raises(ValueError, match="window_range"):
        sliding_distinct(df, group_cols=["g"], order_col="day",
                         col="uid", window_range=-1)


# -------------------------------------------------------- time decay attr

def test_time_decay_attribution_matches_python(spark):
    from deltalake_spark.operators.analytics import time_decay_attribution

    rng = random.Random(29)
    rows = []
    for uid in range(6):
        t = 0
        for _ in range(rng.randrange(4, 15)):
            t += rng.randrange(1, 30)
            ch = rng.choice(["view", "click", "email", "purchase"])
            rows.append((uid, t, ch))
    df = spark.createDataFrame(rows, "uid long, t long, ch string")
    hl, mh = 7, 20
    got = {r["channel"]: (r["decay_units"], r["n_touches"])
           for r in time_decay_attribution(
               df, entity_col="uid", order_col="t", channel_col="ch",
               conversion_pred=(F.col("ch") == "purchase"),
               halflife=hl, max_halvings=mh).collect()}

    # reference: journeys = touches before the NEXT purchase
    want_units, want_n = {}, {}
    by_uid = {}
    for uid, t, ch in sorted(rows):
        by_uid.setdefault(uid, []).append((t, ch))
    for uid, seq in by_uid.items():
        journey = []
        for t, ch in seq:
            if ch == "purchase":
                if journey:
                    ws = [(c, 2 ** (mh - min((t - tt) // hl, mh)))
                          for tt, c in journey]
                    W = sum(w for _, w in ws)
                    for c, w in ws:
                        want_units[c] = want_units.get(c, 0) \
                            + (10 ** 12 * w) // W
                        want_n[c] = want_n.get(c, 0) + 1
                journey = []
            else:
                journey.append((t, ch))
    assert {c: u for c, (u, _) in got.items()} == want_units
    assert {c: n for c, (_, n) in got.items()} == want_n


def test_time_decay_recent_touch_dominates(spark):
    from deltalake_spark.operators.analytics import time_decay_attribution

    df = spark.createDataFrame(
        [(1, 0, "old"), (1, 95, "recent"), (1, 100, "purchase")],
        "uid long, t long, ch string")
    got = {r["channel"]: r["decay_units"]
           for r in time_decay_attribution(
               df, entity_col="uid", order_col="t", channel_col="ch",
               conversion_pred=(F.col("ch") == "purchase"),
               halflife=10).collect()}
    assert got["recent"] > 100 * got["old"]
    # units conserve (floor loss < n_touches)
    assert 10 ** 12 - 2 <= got["recent"] + got["old"] <= 10 ** 12

    with pytest.raises(ValueError, match="halflife"):
        time_decay_attribution(
            df, entity_col="uid", order_col="t", channel_col="ch",
            conversion_pred=(F.col("ch") == "purchase"), halflife=0)
    with pytest.raises(ValueError, match="max_halvings"):
        time_decay_attribution(
            df, entity_col="uid", order_col="t", channel_col="ch",
            conversion_pred=(F.col("ch") == "purchase"), halflife=5,
            max_halvings=25)


def test_interval_overlap_suffix_collision_raises(spark):
    from deltalake_spark.operators.temporal import interval_overlap_join

    ldf = spark.createDataFrame([("a", 0, 5, 9)],
                                "k string, s long, e long, s_r long")
    rdf = spark.createDataFrame([("a", 3, 6)], "k string, s long, e long")
    with pytest.raises(ValueError, match="collides"):
        interval_overlap_join(ldf, rdf, on="k", left_start="s",
                              left_end="e", right_start="s",
                              right_end="e")


def test_sliding_distinct_nulls_excluded(spark):
    from deltalake_spark.operators.sketches import sliding_distinct

    df = spark.createDataFrame(
        [("g", 0, 1), ("g", 0, None), ("g", 1, None)],
        "g string, day long, uid long")
    out = {r["day"]: r["exact_distinct"] for r in sliding_distinct(
        df, group_cols=["g"], order_col="day", col="uid",
        window_range=1).collect()}
    assert out[0] == 1 and out[1] == 1


# -------------------------------------------------------- LOO encoding

def test_target_encode_loo_matches_python(spark):
    from deltalake_spark.operators.stats import target_encode_loo

    rng = random.Random(31)
    rows = [(rng.choice("abc"), rng.randrange(2)) for _ in range(200)]
    df = spark.createDataFrame(rows, "cat string, y long")
    got = [(r["cat"], r["y"], r["encoded_loo"]) for r in
           target_encode_loo(df, cat_col="cat", label_col="y",
                             smoothing=7.0).collect()]
    n_all = len(rows)
    y_all = sum(y for _, y in rows)
    prior = y_all / n_all
    sums = {}
    cnts = {}
    for c, y in rows:
        sums[c] = sums.get(c, 0) + y
        cnts[c] = cnts.get(c, 0) + 1
    for c, y, e in got:
        want = (sums[c] - y + 7.0 * prior) / (cnts[c] - 1 + 7.0)
        assert e == want, (c, y)  # bit-identical, not approx


def test_target_encode_loo_leakage_and_singleton(spark):
    from deltalake_spark.operators.stats import target_encode_loo

    df = spark.createDataFrame(
        [("a", 1), ("a", 0), ("solo", 1)], "cat string, y long")
    out = {(r["cat"], r["y"]): r["encoded_loo"] for r in
           target_encode_loo(df, cat_col="cat", label_col="y",
                             smoothing=2.0).collect()}
    prior = 2 / 3
    # the row's own label is excluded: y=1 sees sum 0, y=0 sees sum 1
    assert out[("a", 1)] == (0 + 2.0 * prior) / (1 + 2.0)
    assert out[("a", 0)] == (1 + 2.0 * prior) / (1 + 2.0)
    # singleton: denominator is exactly m — finite because m > 0
    assert out[("solo", 1)] == (0 + 2.0 * prior) / 2.0

    with pytest.raises(ValueError, match="smoothing"):
        target_encode_loo(df, cat_col="cat", label_col="y",
                          smoothing=0.0)
