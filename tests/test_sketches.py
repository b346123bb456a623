"""Sketch operators: error bounds, mergeability, and rank guarantees.

The key property at 100 TB is MERGEABILITY: per-partition sketches
unioned later must estimate exactly what one global sketch would have —
that's what makes precomputed sketch tables answer arbitrary-subset
questions without rescans."""

import pyspark.sql.functions as F
import pytest

from deltalake_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    hll_merge,
    hll_partition_sketches,
)


@pytest.fixture(scope="module")
def ids(spark):
    # 20k rows, 5k distinct ids, 4 partitions ("day"), 2 groups
    return spark.range(20_000).select(
        (F.col("id") % 5000).alias("uid"),
        ((F.col("id") / 2).cast("long") % 4).alias("day"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
    )


def test_approx_distinct_error_bound(spark, ids):
    rows = approx_distinct(
        ids, group_cols=["grp"], col="uid", rsd=0.02
    ).collect()
    # each group sees 2500 distinct uids; 5x rsd is a generous bound
    for r in rows:
        assert abs(r.approx_distinct - 2500) <= 2500 * 0.10


def test_hll_merge_preserves_bounds(spark, ids):
    """Merging per-day sketches estimates within the same error bound a
    single global sketch would (union re-encodes registers, so it need
    not be bit-identical — but it must stay near both the truth and the
    direct estimate)."""
    per_day = hll_partition_sketches(
        ids, partition_cols=["grp", "day"], col="uid", lg_k=12
    )
    merged = {
        r.grp: r.est
        for r in hll_merge(
            per_day, group_cols=["grp"], out_col="est"
        ).collect()
    }
    direct = {
        r.grp: r.est
        for r in ids.groupBy("grp")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("uid"), F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    for g in ("a", "b"):
        assert abs(merged[g] - 2500) <= 2500 * 0.10
        assert abs(direct[g] - 2500) <= 2500 * 0.10
        assert abs(merged[g] - direct[g]) <= 2500 * 0.05


def test_hll_sketch_rows_are_small(spark, ids):
    """The persisted sketch table is KB-scale per partition — that's the
    entire point of precomputing it."""
    rows = hll_partition_sketches(
        ids, partition_cols=["grp", "day"], col="uid", lg_k=12
    ).collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r.hll_sketch) <= 1 << 14  # ≤16 KiB at lg_k=12


def test_approx_quantiles_rank_guarantee(spark):
    n = 10_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    row = approx_quantiles(
        df, group_cols=["g"], col="v", percentiles=[0.1, 0.5, 0.99],
        accuracy=1000,
    ).collect()[0]
    for p, got in zip([0.1, 0.5, 0.99], row.approx_quantiles):
        # value IS a data point whose rank is within eps (=n/1000) + 1
        assert abs(got - p * (n - 1)) <= n / 1000 + 1


def test_gate_queries_sane(spark):
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    d = entry_mod.queries()["sketch_distinct_users"](spark, sf).collect()
    assert d and all(r.hllpp_within_10pct and r.merged_within_10pct
                     for r in d)
    q = entry_mod.queries()["sketch_quantile_check"](spark, sf).collect()
    assert q and all(r.p50_rank_ok and r.p90_rank_ok for r in q)


# --- KMV (bottom-k) sketches ------------------------------------------------

def test_kmv_unsaturated_is_exact(spark):
    from deltalake_spark.operators.sketches import kmv_estimate, kmv_sketch

    df = spark.createDataFrame(
        [("g", i % 40) for i in range(500)], ["g", "uid"])
    s = kmv_sketch(df, group_cols=["g"], key_col="uid", k=64)
    assert s.count() == 40  # sketch IS the distinct hash set
    est = kmv_estimate(s, group_cols=["g"], k=64).first()
    assert est["est_distinct"] == 40.0


def test_kmv_estimate_accuracy_and_determinism(spark):
    from deltalake_spark.operators.sketches import kmv_estimate, kmv_sketch

    n = 20_000
    df = spark.range(n).select(F.lit("g").alias("g"),
                               F.col("id").alias("uid"))
    vals = []
    for parts in (1, 16):
        s = kmv_sketch(df.repartition(parts), group_cols=["g"],
                       key_col="uid", k=256)
        est = kmv_estimate(s, group_cols=["g"], k=256).first()["est_distinct"]
        vals.append(est)
        # KMV rel. error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
        assert abs(est - n) / n < 0.25, est
    assert vals[0] == vals[1]  # partitioning-invariant, exactly


def test_kmv_intersection_estimates_overlap(spark):
    from deltalake_spark.operators.sketches import (
        kmv_intersection,
        kmv_sketch,
    )

    # A = [0, 8000), B = [4000, 12000) -> |A∩B| = 4000, J = 1/3
    a = spark.range(0, 8_000).select(F.lit("a").alias("g"),
                                     F.col("id").alias("uid"))
    b = spark.range(4_000, 12_000).select(F.lit("b").alias("g"),
                                          F.col("id").alias("uid"))
    sa = kmv_sketch(a, group_cols=["g"], key_col="uid", k=256)
    sb = kmv_sketch(b, group_cols=["g"], key_col="uid", k=256)
    r = kmv_intersection(sa, sb, k=256).first()
    assert abs(r["est_jaccard"] - 1 / 3) < 0.15
    assert abs(r["est_intersection"] - 4_000) / 4_000 < 0.35


def test_kmv_merge_equals_direct_union_sketch(spark):
    """The k smallest of two merged sketches must equal the union's own
    sketch — the property that makes KMV mergeable at all."""
    from deltalake_spark.operators.sketches import kmv_sketch

    a = spark.range(0, 5_000).select(F.lit("s").alias("g"),
                                     F.col("id").alias("uid"))
    b = spark.range(2_500, 9_000).select(F.lit("s").alias("g"),
                                         F.col("id").alias("uid"))
    k = 128
    sa = kmv_sketch(a, group_cols=["g"], key_col="uid", k=k)
    sb = kmv_sketch(b, group_cols=["g"], key_col="uid", k=k)
    merged = sorted(
        r["kmv_h"]
        for r in sa.unionByName(sb).select("kmv_h").distinct()
        .orderBy("kmv_h").limit(k).collect()
    )
    direct = sorted(
        r["kmv_h"]
        for r in kmv_sketch(a.unionByName(b), group_cols=["g"],
                            key_col="uid", k=k).collect()
    )
    assert merged == direct


def test_kmv_hash_safe_for_large_keys(spark):
    """Keys near int64 ranges must hash without overflow (ANSI-safe
    decomposed multiply) and stay congruent to (k*M) mod 2^32."""
    from deltalake_spark.operators.sketches import kmv_hash

    keys = [0, 1, 65535, 65536, 2**31, 2**32 - 1, 2**32, 2**40 + 123,
            2**52 + 7]
    df = spark.createDataFrame([(k,) for k in keys], ["uid"])
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = {r["uid"]: r["h"] for r in df.select(
            "uid", kmv_hash(F.col("uid")).alias("h")).collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    for k in keys:
        assert got[k] == (k * 2654435761) % 2**32, k


class TestBloomFilter:
    def test_no_false_negatives_and_deterministic(self, spark):
        from deltalake_spark.operators.sketches import (
            bloom_build,
            bloom_probe,
        )
        from pyspark.sql import functions as F

        present = spark.range(0, 5000).select(F.col("id").alias("k"))
        bloom = bloom_build(present, key_col="k", m_bits=1 << 16,
                            k_hashes=4)
        # filter is bounded by m/32 words regardless of input size
        words = bloom.collect()
        assert len(words) <= (1 << 16) // 32
        # every present key must probe true (hard Bloom invariant)
        probed = bloom_probe(present, bloom, key_col="k",
                             m_bits=1 << 16, k_hashes=4)
        assert probed.filter(~F.col("maybe_present")).count() == 0
        # absent keys: fp rate stays near theory ((1-e^{-kn/m})^k ~ 2.4%
        # at n=5000, m=65536, k=4); assert a generous ceiling
        absent = spark.range(1_000_000, 1_010_000).select(
            F.col("id").alias("k"))
        fp = bloom_probe(absent, bloom, key_col="k", m_bits=1 << 16,
                         k_hashes=4).filter(F.col("maybe_present")).count()
        assert fp / 10_000 < 0.08, fp
        # deterministic: rebuilding from a different partitioning gives
        # the identical word set
        again = bloom_build(present.repartition(7), key_col="k",
                            m_bits=1 << 16, k_hashes=4)
        assert sorted((r["word_idx"], r["word"]) for r in words) \
            == sorted((r["word_idx"], r["word"])
                      for r in again.collect())

    def test_probe_uses_broadcast_join(self, spark):
        from deltalake_spark.operators.sketches import (
            bloom_build,
            bloom_probe,
        )
        from pyspark.sql import functions as F

        present = spark.range(0, 100).select(F.col("id").alias("k"))
        bloom = bloom_build(present, key_col="k")
        out = bloom_probe(present, bloom, key_col="k")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # the filter moves, not data

    def test_m_bits_validation(self, spark):
        from deltalake_spark.operators.sketches import bloom_build
        from pyspark.sql import functions as F

        df = spark.range(1).select(F.col("id").alias("k"))
        import pytest as _pytest
        with _pytest.raises(ValueError):
            bloom_build(df, key_col="k", m_bits=100)


class TestCountMinSketch:
    def test_never_undercounts_and_exact_when_sparse(self, spark):
        from deltalake_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )
        from pyspark.sql import functions as F

        # planted frequencies: key k appears (k % 7) + 1 times
        base = spark.range(0, 500).select(F.col("id").alias("k"))
        stream = base.select(
            "k", F.explode(F.sequence(F.lit(1), (F.col("k") % 7) + 1))
            .alias("rep")).select("k")
        cms = cms_build(stream, key_col="k", width=4096, depth=4)
        # grid bounded, counts conserve the stream length
        grid = cms.collect()
        assert len(grid) <= 4 * 4096
        total = stream.count()
        per_row = {}
        for r in grid:
            per_row[r["r"]] = per_row.get(r["r"], 0) + r["cnt"]
        assert all(v == total for v in per_row.values())
        est = {r["k"]: r["cms_est"] for r in cms_estimate(
            stream, cms, key_col="k", width=4096, depth=4).collect()}
        true = {r["k"]: r["c"] for r in stream.groupBy("k")
                .agg(F.count(F.lit(1)).alias("c")).collect()}
        # hard invariant: never undercounts
        assert all(est[k] >= true[k] for k in true)
        # sparse grid (500 keys x 4 rows into 4096 cells): most
        # estimates exact, total overcount small
        over = sum(est[k] - true[k] for k in true)
        assert over <= total * 0.1, over

    def test_partitioning_invariant(self, spark):
        from deltalake_spark.operators.sketches import cms_build
        from pyspark.sql import functions as F

        df = spark.range(0, 2000).select((F.col("id") % 97).alias("k"))
        a = sorted(map(tuple, cms_build(df.coalesce(1), key_col="k")
                       .collect()))
        b = sorted(map(tuple, cms_build(df.repartition(13), key_col="k")
                       .collect()))
        assert a == b


def test_sliding_quantile_digest_rank_error_bound(spark):
    """r9: the digest pick must land within the documented rank-error
    bound (sum of per-digest segment mass = window_rows/points per
    period) of the true windowed quantile — and be bit-stable (a pure
    function of the data, replayed by the DuckDB twin)."""
    import random

    from deltalake_spark.operators.sketches import sliding_quantile_digest

    rng = random.Random(3)
    rows = [("a", d, rng.randrange(0, 10_000))
            for d in range(10) for _ in range(60)]
    df = spark.createDataFrame(rows, "k string, day long, v long")
    out = {r["day"]: (r["n_window"], r["digest_q"])
           for r in sliding_quantile_digest(
               df, group_cols=["k"], order_col="day", value_col="v",
               window_range=6, q_num=1, q_den=2, points=16).collect()}
    byday = {}
    for _, d, v in rows:
        byday.setdefault(d, []).append(v)
    for d in range(10):
        vals = sorted(sum((byday[x]
                           for x in range(max(0, d - 6), d + 1)), []))
        nw, got = out[d]
        assert nw == len(vals)
        true_rank = (len(vals) - 1) // 2
        got_rank = vals.index(got)  # every pick IS a data value
        n_periods = min(d, 6) + 1
        bound = n_periods * (60 // 16 + 1)
        assert abs(got_rank - true_rank) <= bound, (d, got_rank,
                                                    true_rank, bound)


def test_sliding_quantile_digest_tight_when_points_cover(spark):
    """points >= period size makes every digest lossless (every value
    is a point), so the pick must land within one rank PER MERGED
    PERIOD of the exact quantile — the only residual is the floor
    unevenness in how the points+1 picks repeat n values."""
    from deltalake_spark.operators.sketches import sliding_quantile_digest

    rows = [("a", d, (d * 7 + i * 13) % 50)
            for d in range(6) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, day long, v long")
    out = {r["day"]: r["digest_q"]
           for r in sliding_quantile_digest(
               df, group_cols=["k"], order_col="day", value_col="v",
               window_range=3, q_num=1, q_den=2, points=64).collect()}
    byday = {}
    for _, d, v in rows:
        byday.setdefault(d, []).append(v)
    for d in range(6):
        vals = sorted(sum((byday[x]
                           for x in range(max(0, d - 3), d + 1)), []))
        true_rank = (len(vals) - 1) // 2
        got_rank = vals.index(out[d])
        n_periods = min(d, 3) + 1
        assert abs(got_rank - true_rank) <= n_periods, (
            d, out[d], vals)
