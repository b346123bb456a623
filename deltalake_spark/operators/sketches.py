"""Sketch operators: mergeable approximate aggregates for 100 TB scans.

The reference engine's only cardinality machinery is a Set-based
per-row-group ``distinctCount`` estimate in the streaming parquet writer
(/root/reference/src/parquet/streaming-writer.ts:763-771) — it is never
mergeable and never queryable. At the 100 TB design point, exact
COUNT(DISTINCT) is a full shuffle of every distinct value and exact
percentiles are a sort; sketches replace both with one narrow map-side
pass and constant-size mergeable state:

- ``approx_distinct`` — HyperLogLog++ via ``approx_count_distinct``:
  one pass, no shuffle of values (only fixed-size registers), rsd-tunable.
- ``hll_partition_sketches`` / ``hll_merge`` — the Apache DataSketches
  HLL pair (``hll_sketch_agg`` / ``hll_union_agg``): build per-partition
  binary sketches once (e.g. per ingest day), persist them in a tiny
  side table, and answer "distinct over any partition subset" by merging
  kilobyte sketches instead of rescanning terabytes. This is the
  pre-aggregation pattern every large ingest pipeline needs for
  dashboards/dedup-rate monitoring.
- ``approx_quantiles`` — ``percentile_approx`` (GK sketch): rank-error
  bounded by 1/accuracy, single aggregation buffer, no global sort.

All functions are JVM-side built-ins — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "approx_distinct",
    "hll_partition_sketches",
    "hll_merge",
    "approx_quantiles",
    "sliding_distinct",
    "sliding_quantile_digest",
    "mg_frequent_items",
    "mg_merge_summaries",
    "kmv_hash",
    "kmv_sketch",
    "kmv_estimate",
    "kmv_intersection",
    "bloom_build",
    "bloom_probe",
    "cms_build",
    "cms_estimate",
]


def approx_distinct(
    df: DataFrame,
    *,
    group_cols: list[str],
    col: str,
    rsd: float = 0.05,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate distinct count of ``col`` per group (HLL++).

    Scale shape: map-side partial HLL registers merge in the shuffle —
    bytes moved are O(groups * register_size), independent of the number
    of distinct values (exact distinct shuffles every value once).
    """
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(col, rsd).alias(out_col)
    )


def hll_partition_sketches(
    df: DataFrame,
    *,
    partition_cols: list[str],
    col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Build one binary DataSketches-HLL sketch per partition.

    The output is tiny (≤ ~2^lg_k bytes per row) and mergeable: persist
    it and answer distinct-count queries over arbitrary partition
    subsets with ``hll_merge`` — no rescan of the base table.
    """
    return df.groupBy(*partition_cols).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    sketches: DataFrame,
    *,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Merge per-partition sketches up to ``group_cols`` and estimate.

    Union preserves the sketch's error guarantees — the merged estimate
    stays within the same relative-error bound as a single pass over the
    union (it may differ from that single-pass estimate by a small
    representation-dependent amount: the union gadget re-encodes
    registers, it does not bit-copy them).
    """
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(False))
        ).alias(out_col)
    )


def sliding_distinct(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    col: str,
    window_range: int,
    lg_k: int = 12,
) -> DataFrame:
    """Trailing-window distinct counts per series — the production
    DAU/WAU pattern (distinct users over the trailing N days, one row
    per day): per (group, period) build BOTH a mergeable HLL sketch
    and the exact period set, then one RANGE window per group merges
    the trailing ``window_range`` periods (calendar semantics — gaps
    count, unlike a ROWS frame over observed periods only).

    Two estimates per row, deliberately:

    - ``exact_distinct`` — flatten + dedup of the trailing period
      sets. Exact and replayable anywhere; its shuffle carries the
      per-period DISTINCT value sets, so it scales with distinct
      values per window — the verification path.
    - ``hll_estimate`` — ``hll_union_agg`` over the same frame. The
      shuffle carries ≤ 2^lg_k bytes per period regardless of
      cardinality — the 100 TB path (this windowed sketch-merge is
      exactly why mergeable sketches are persisted per ingest
      partition).

    ``order_col`` must be numeric (e.g. epoch days). NULL values of
    ``col`` are excluded from both counts (Spark ``collect_set``/HLL
    semantics — note that some engines' list aggregates KEEP nulls).
    One shuffle to the (group, period) grain, one group-keyed window
    pass for both columns.
    """
    if window_range < 0:
        raise ValueError("window_range must be >= 0")
    daily = df.groupBy(*group_cols, order_col).agg(
        F.collect_set(col).alias("__set"),
        F.hll_sketch_agg(F.col(col), F.lit(int(lg_k))).alias("__sk"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rangeBetween(-int(window_range), 0)
    )
    exact = F.size(
        F.array_distinct(F.flatten(F.collect_list("__set").over(w))))
    est = F.hll_sketch_estimate(
        F.hll_union_agg(F.col("__sk"), F.lit(False)).over(w))
    return daily.select(
        *group_cols, order_col,
        exact.cast("long").alias("exact_distinct"),
        est.cast("long").alias("hll_estimate"),
    )


def sliding_quantile_digest(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    window_range: int,
    q_num: int,
    q_den: int,
    points: int = 32,
    out_col: str = "digest_q",
) -> DataFrame:
    """Trailing-window quantiles from MERGEABLE per-period digests —
    the scale path :func:`operators.timeseries.rolling_quantile`'s
    ``max_frame`` guard points huge-window callers at: instead of
    collecting the whole trailing frame per row (O(frame) state), each
    (group, period) reduces once to an equi-depth digest — its count
    plus ``points + 1`` evenly spaced order statistics — and one
    calendar RANGE window merges the trailing ``window_range``
    periods' digests. The shuffle carries ``points + 1`` values per
    period regardless of period size; the same persisted digests
    answer ANY window and ANY quantile (the sliding_distinct HLL
    recipe, for ranks).

    DETERMINISTIC approximation — so unlike GK it is fully
    SQL-twin-able value-for-value, not just tolerance-checked:

    - digest: ``pts[i] = sorted_vals[(i·(n−1)) // points]`` for
      i in 0..points (nearest-rank-lower, pure integer index math);
    - merge: every point of period p carries integer weight ``n_p``;
      points sort by value and the answer is the first value whose
      cumulative weight exceeds ``((W−1)·q_num) // q_den`` of the
      total ``W = Σ (points+1)·n_p`` — a left-to-right fold over a
      sorted array, exact on any engine.

    Rank error is bounded by the per-digest segment mass, ≤
    ``Σ n_p / points`` of the window — 3% of the frame at the default
    32 points, independent of frame SIZE. NULL values are excluded
    (collect_list semantics). ``order_col`` must be numeric (e.g.
    epoch days). Returns the (group, period) grain plus ``n_window``
    (exact trailing row count) and ``out_col``.
    """
    if window_range < 0:
        raise ValueError("window_range must be >= 0")
    if points < 1:
        raise ValueError("points must be >= 1")
    if q_den <= 0 or not 0 <= q_num <= q_den:
        raise ValueError("quantile q_num/q_den must be in [0, 1]")
    b = int(points)
    vt = dict(df.dtypes)[value_col]
    daily = df.groupBy(*group_cols, order_col).agg(
        F.sort_array(
            F.collect_list(F.col(value_col).alias("v"))).alias("__vals"),
    ).select(
        *group_cols, order_col,
        F.size("__vals").cast("long").alias("__n"),
        F.expr(
            # [] is 0-based in Spark SQL (element_at is the 1-based one)
            f"transform(sequence(0, {b}), i ->"
            f" __vals[cast(i * (size(__vals) - 1) div {b} as int)])"
        ).alias("__pts"),
    ).filter(F.col("__n") > 0)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rangeBetween(-int(window_range), 0)
    )
    with_ds = daily.select(
        *group_cols, order_col,
        F.sum("__n").over(w).alias("n_window"),
        F.collect_list(
            F.struct(F.col("__n").alias("n"),
                     F.col("__pts").alias("pts"))).over(w).alias("__ds"),
    )
    # weighted nearest-rank over the value-sorted union of digest
    # points: flatten + sort + one left-to-right fold, all JVM array
    # exprs. Total weight is (points+1) per digest point x its period
    # count; the target rank is let-bound via the transform-singleton
    # trick so the fold's lambda reads a VALUE.
    pick = F.expr(
        f"""transform(array(
              (({b + 1}L * n_window - 1L) * {int(q_num)}L)
                div {int(q_den)}L),
            tgt -> aggregate(
              array_sort(flatten(transform(__ds, d ->
                transform(d.pts, p ->
                  named_struct('v', p, 'w', d.n))))),
              named_struct('cum', 0L, 'ans', cast(null as {vt})),
              (acc, pt) -> named_struct(
                'cum', acc.cum + pt.w,
                'ans', coalesce(acc.ans,
                  if(acc.cum + pt.w > tgt, pt.v,
                     cast(null as {vt}))))
            ).ans)[0]""")
    return with_ds.select(
        *group_cols, order_col, "n_window", pick.alias(out_col))


def approx_quantiles(
    df: DataFrame,
    *,
    group_cols: list[str],
    col: str,
    percentiles: list[float],
    accuracy: int = 10_000,
    out_col: str = "approx_quantiles",
) -> DataFrame:
    """Approximate percentiles per group (Greenwald-Khanna sketch).

    Rank error ≤ 1/accuracy of the group size; one aggregation buffer
    per group, no sort. The exact twin (``percentile``) keeps a full
    value buffer per group — fine at fixture scale, a spill hazard when
    a group holds billions of rows.
    """
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            F.col(col),
            F.array(*[F.lit(p) for p in percentiles]),
            F.lit(accuracy),
        ).alias(out_col)
    )


def _mg_compress(counts: dict, capacity: int) -> None:
    """Compress a counter dict to ≤ ``capacity`` entries, MG-style.

    Subtracts the (capacity+1)-th largest count from every entry and
    drops non-positives — the mergeable-summaries compression (Agarwal
    et al., PODS'12): at most ``capacity`` entries can exceed that
    threshold, and the per-item undercount introduced across all
    compressions of a stream of n items totals ≤ n/(capacity+1).
    """
    if len(counts) <= capacity:
        return
    import numpy as np

    vals = np.fromiter(counts.values(), dtype=np.int64)
    thresh = int(np.partition(vals, -(capacity + 1))[-(capacity + 1)])
    for t in list(counts):
        c = counts[t] - thresh
        if c > 0:
            counts[t] = c
        else:
            del counts[t]


def mg_frequent_items(
    df: DataFrame,
    *,
    col: str,
    capacity: int = 256,
    count_col: str = "mg_count",
) -> DataFrame:
    """Misra-Gries heavy hitters over a string column, mergeable.

    Completes the sketch trio (HLL distinct, GK quantiles, MG
    frequency): per-partition bounded-memory counter summaries built in
    one Arrow-batched pass, merged by a single (token-keyed) sum. The
    column to sketch is typically an exploded token stream.

    Guarantees (classic MG, preserved under merge-by-addition):
    every item with true frequency > n/(capacity+1) appears in the
    output, and its reported count satisfies
    ``true − n/(capacity+1) ≤ reported ≤ true``. State per partition is
    ≤ capacity counters regardless of stream length; the merged result
    is ≤ partitions × capacity rows (KBs), so the shuffle moves
    sketches, not the stream — the exact-count twin shuffles every
    distinct value. When the true vocabulary fits ``capacity`` no
    compression ever fires and counts are exact (how the gate query
    stays value-level while the eviction path is property-tested).

    Batches are pre-aggregated with vectorized ``value_counts`` before
    touching the Python dict, so per-item Python work is O(distinct per
    batch), not O(stream).
    """
    import pandas as pd

    out_schema = f"`{col}` string, `{count_col}` long"

    def build(batches):
        d: dict = {}
        for pdf in batches:
            for t, c in pdf[col].value_counts().items():
                if t is None:
                    continue
                d[t] = d.get(t, 0) + int(c)
            _mg_compress(d, capacity)
        if d:
            yield pd.DataFrame({col: list(d.keys()), count_col: list(d.values())})

    sketches = df.select(col).mapInPandas(build, out_schema)
    return sketches.groupBy(col).agg(F.sum(count_col).alias(count_col))


def mg_merge_summaries(
    a: DataFrame,
    b: DataFrame,
    *,
    col: str,
    count_col: str = "mg_count",
    capacity: int = 256,
) -> DataFrame:
    """Merge two Misra-Gries summaries (or a summary and a batch's
    exact counts) into one summary of ≤ ``capacity`` counters — the
    mergeable-summaries rule of Agarwal et al. (PODS'12): sum counts
    per item, then subtract the (capacity+1)-th LARGEST count from
    every item and drop the non-positives. The subtraction preserves
    the classic MG guarantee (``true − N/(capacity+1) ≤ reported ≤
    true`` over everything merged so far) and the result is a pure
    function of the two count multisets — no tie-order dependence,
    since all items at the threshold count drop together.

    Plan shape: one token-keyed sum over the two KB-scale summaries,
    two windows over that summary frame (rank to locate the threshold,
    a full-frame max to broadcast it in-plan), one filter. Everything
    is summary-sized; nothing touches raw data.
    """
    merged = (
        a.select(col, count_col)
        .unionByName(b.select(col, count_col))
        .groupBy(col)
        .agg(F.sum(count_col).alias(count_col))
    )
    wr = Window.orderBy(F.desc(count_col), col)
    wall = Window.partitionBy()
    ranked = merged.withColumn("__rn", F.row_number().over(wr))
    thr = F.coalesce(
        F.max(F.when(F.col("__rn") == capacity + 1,
                     F.col(count_col))).over(wall),
        F.lit(0).cast("long"),
    )
    return (
        ranked.withColumn("__new", F.col(count_col) - thr)
        .filter(F.col("__new") > 0)
        .select(col, F.col("__new").alias(count_col))
    )


# --- KMV (k-minimum-values) sketches: distinct + set intersection -----------
#
# HLL answers "how many distinct" but cannot intersect segments; the KMV
# (bottom-k / theta-sketch family) keeps the k smallest values of a
# bijective integer hash, giving (a) a distinct estimate (k-1)/t_k and
# (b) set algebra: the k smallest of a union are exactly the k smallest
# of the combined sketches, so Jaccard/intersection estimates need only
# the KB-size sketches. Because the hash is a fixed odd-multiplier
# permutation of the key space (no collisions, no RNG), every estimate
# is a deterministic pure function of the data — partitioning-invariant
# and replicable in ANSI SQL for the value-level gate.

KMV_MULT = 2654435761  # Knuth multiplicative; odd => bijective mod 2^32
KMV_SPACE = 2 ** 32


def kmv_hash(key_col, seed: int = 0):
    """Deterministic Knuth-multiplicative hash into [0, 2^32).

    The odd multiplier is a bijection of the 32-bit key space, so keys
    WITHIN [0, 2^32) never collide; ids ≥ 2^32 fold mod 2^32 first
    (two ids congruent mod 2^32 share a hash — for >32-bit id spaces
    use a 64-bit variant, same shape). The multiply is decomposed into
    16-bit halves so no intermediate exceeds ~2^49: never overflows
    int64, safe under ANSI mode, and exactly congruent to
    ``(key * M) mod 2^32`` — the SQL twin can keep the plain formula
    whenever its key width cannot overflow."""
    k = F.pmod(key_col.cast("long") + F.lit(seed), F.lit(KMV_SPACE))
    hi = (k / F.lit(65536)).cast("long")  # k div 2^16, < 2^16
    lo = F.pmod(k, F.lit(65536))
    return F.pmod(
        F.pmod(hi * F.lit(KMV_MULT), F.lit(KMV_SPACE)) * F.lit(65536)
        + lo * F.lit(KMV_MULT),
        F.lit(KMV_SPACE),
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    *,
    group_cols: list[str],
    key_col: str,
    k: int = 256,
    seed: int = 0,
    hash_col: str = "kmv_h",
) -> DataFrame:
    """Per-group bottom-k sketch: the k smallest distinct key hashes.

    Output: one row per (group, retained hash), ≤ k rows per group —
    persist it as a tiny side table and answer distinct/overlap queries
    without rescanning the base data.

    Scale shape: the global k smallest distinct hashes of a group are a
    subset of every partition's local k smallest, so the plan is
    partial-aggregating: in-partition dedupe + local bottom-k first
    (map-side, via the same window Spark runs per shuffle partition
    after a group-keyed exchange of ALREADY-DISTINCT hashes), then the
    final bottom-k. The shuffle carries at most the distinct hashes —
    and the result is identical under any partitioning.
    """
    from pyspark.sql import Window

    h = kmv_hash(F.col(key_col), seed).alias(hash_col)
    distinct = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy(hash_col)
    return (
        distinct.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    sketch: DataFrame,
    *,
    group_cols: list[str],
    k: int = 256,
    hash_col: str = "kmv_h",
    out_col: str = "est_distinct",
) -> DataFrame:
    """Distinct-count estimate per group from a bottom-k sketch.

    Saturated groups (sketch holds k hashes) use the classic unbiased
    KMV estimator (k-1) * SPACE / h_k; smaller groups are exact (the
    sketch IS the distinct hash set). Estimates are rounded to 4 dp so
    they hash-compare exactly against the SQL twin."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(hash_col).alias("__hk"),
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(
        F.round((F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)))
                / F.col("__hk"), 4)
    )
    return agg.select(*group_cols, est.alias(out_col))


def kmv_intersection(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    k: int = 256,
    hash_col: str = "kmv_h",
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Jaccard + intersection-cardinality estimates from sketches.

    Merge = k smallest of the union of retained hashes (exactly the
    union's own KMV sketch); ρ = fraction of those present in both
    sides estimates Jaccard; intersection ≈ ρ × est_distinct(union).
    Computed entirely from the KB-size sketches.

    Ungrouped (``group_cols=None``): one row from two single-segment
    sketches; bottom-k of the merge is ``orderBy(h).limit(k)`` —
    planned as TakeOrdered (per-partition heaps), no single-partition
    window. Grouped: ``sketch_a`` (one segment, its group columns
    dropped) is compared against EVERY segment of ``sketch_b`` in one
    declarative plan — sketch_a's rows replicate per counterpart group
    (broadcast, sketch-sized), the merge groups by (group, h), and the
    bottom-k is a group-partitioned window. One result row per
    ``sketch_b`` group."""
    group_cols = group_cols or []
    a = sketch_a.select(F.col(hash_col).alias("h"),
                        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    b = sketch_b.select(*group_cols, F.col(hash_col).alias("h"),
                        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    if group_cols:
        groups = sketch_b.select(*group_cols).distinct()
        a = a.crossJoin(F.broadcast(groups))
    merged = (
        a.unionByName(b)
        .groupBy(*group_cols, "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    if group_cols:
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols).orderBy("h")
        union_k = (merged.withColumn("__rn", F.row_number().over(w))
                   .where(F.col("__rn") <= k))
    else:
        union_k = merged.orderBy("h").limit(k)
    return union_k.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("h").alias("__hk"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("__both"),
    ).select(
        *group_cols,
        F.round(F.col("__both") / F.col("__n"), 6).alias("est_jaccard"),
        F.round(
            (F.col("__both") / F.col("__n")) *
            F.when(F.col("__n") < k, F.col("__n").cast("double"))
             .otherwise((F.lit(float(k - 1)) * F.lit(float(KMV_SPACE)))
                        / F.col("__hk")),
            4,
        ).alias("est_intersection"),
    )


# --- Bloom filter (distributed build + broadcast probe) --------------------

BLOOM_MULT2 = 2246822519  # second odd multiplier (xxhash32 prime 2)


def _knuth32(key_col, mult: int, seed: int):
    """((key + seed) * mult) mod 2^32 via 16-bit-decomposed multiply
    (no int64 overflow under ANSI; same value as the HUGEINT SQL
    formula)."""
    k = F.pmod(key_col.cast("long") + F.lit(seed), F.lit(KMV_SPACE))
    hi = (k / F.lit(65536)).cast("long")
    lo = F.pmod(k, F.lit(65536))
    return F.pmod(
        F.pmod(hi * F.lit(mult), F.lit(KMV_SPACE)) * F.lit(65536)
        + lo * F.lit(mult),
        F.lit(KMV_SPACE),
    ).cast("long")


def _bloom_positions(key_col, *, m_bits: int, k_hashes: int, seed: int):
    """k bit positions per key by Kirsch-Mitzenmacher double hashing:
    ``(h1 + j*h2) mod m`` with two independent multiplicative hashes
    and h2 forced odd (coprime with the power-of-two m, so the j-walk
    never degenerates). A seed-offset family ((key+s_j)*M) would make
    every position a FIXED offset of the first — effective k=1 and a
    10x worse false-positive rate (measured)."""
    h1 = _knuth32(key_col, KMV_MULT, seed)
    h2 = _knuth32(key_col, BLOOM_MULT2, seed + 1)
    h2o = h2 - F.pmod(h2, F.lit(2)) + F.lit(1)  # force odd
    return [
        F.pmod(h1 + F.lit(j) * h2o, F.lit(m_bits))
        for j in range(k_hashes)
    ]


def bloom_build(
    df: DataFrame,
    *,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Build an m-bit Bloom filter of ``key_col`` as ``(word_idx, word)``
    rows — 32-bit words (no sign-bit edge in either engine), at most
    ``m_bits/32`` rows regardless of corpus size.

    The canonical "seen set" for dedup / URL dedup / decontamination at
    scale: one pass, ONE shuffle whose width is the filter (KB), not the
    data — ``bit_or`` partial-aggregates map-side, so each partition
    ships at most m/32 words. No distinct pre-pass needed (bit_or is
    idempotent). Deterministic: the same keys always produce the same
    filter, which is what gives the gate query a value-level SQL twin.
    """
    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    pos = F.explode(F.array(*_bloom_positions(
        F.col(key_col), m_bits=m_bits, k_hashes=k_hashes, seed=seed)))
    return (
        df.select(pos.alias("pos"))
        .select(
            (F.col("pos") / 32).cast("long").alias("word_idx"),
            # column-valued shift needs the SQL form (DSL shiftleft
            # takes only a literal amount)
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("v"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("v").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    *,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    seed: int = 0,
    out_col: str = "maybe_present",
) -> DataFrame:
    """Probe distinct keys of ``df`` against a built filter. Returns one
    row per distinct key with ``out_col`` true iff ALL k bits are set
    (no false negatives; false-positive rate ~(1-e^{-kn/m})^k).

    Scale shape: the filter is broadcast (≤ m/32 rows) to a map-side
    join against the exploded key positions; one key-keyed shuffle
    reaggregates the k bit tests. The corpus never moves."""
    keys = df.select(F.col(key_col).alias("key")).distinct()
    kp = keys.select(
        "key",
        F.explode(F.array(*_bloom_positions(
            F.col("key"), m_bits=m_bits, k_hashes=k_hashes, seed=seed)))
        .alias("pos"),
    ).select(
        "key",
        (F.col("pos") / 32).cast("long").alias("word_idx"),
        F.pmod(F.col("pos"), F.lit(32)).cast("int").alias("bit"),
    )
    joined = kp.join(F.broadcast(bloom), "word_idx", "left")
    # column-valued shift amount needs the SQL form (the DSL's
    # shiftright takes only a literal)
    hit = F.expr("(shiftright(coalesce(word, 0L), bit) & 1) = 1")
    return (
        joined.groupBy("key")
        .agg((F.sum(hit.cast("int")) == F.lit(k_hashes)).alias(out_col))
        .withColumnRenamed("key", key_col)
    )


# --- Count-Min sketch ------------------------------------------------------

def cms_build(
    df: DataFrame,
    *,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Build a depth x width Count-Min sketch of ``key_col`` occurrences
    as ``(r, c, cnt)`` rows — at most depth*width rows regardless of
    corpus size, with map-side partial counting (the shuffle carries
    the grid, not the data). Point-frequency companion to the MG heavy
    hitters / KMV / HLL family: est(key) = min_r grid[r][h_r(key)]
    over-counts only (one-sided error <= eps*N w.h.p., eps = e/width).

    Hashing is the same portable Kirsch-Mitzenmacher double hash as the
    Bloom filter, so the grid is a pure function of the data — exact
    SQL twin, partitioning-invariant."""
    h1 = _knuth32(F.col(key_col), KMV_MULT, seed)
    h2 = _knuth32(F.col(key_col), BLOOM_MULT2, seed + 1)
    h2o = h2 - F.pmod(h2, F.lit(2)) + F.lit(1)
    rows = df.select(
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     F.pmod(h1 + F.lit(r) * h2o, F.lit(width)).alias("c"))
            for r in range(depth)
        ])).alias("rc")
    )
    return (
        rows.select("rc.r", "rc.c")
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    cms: DataFrame,
    *,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 0,
    out_col: str = "cms_est",
) -> DataFrame:
    """Estimate each distinct key's frequency from a built sketch:
    broadcast the (KB-scale) grid against the keys' depth probe cells,
    take the min over rows. Missing cells count 0. One key-keyed
    shuffle; the corpus never moves."""
    keys = df.select(F.col(key_col).alias("key")).distinct()
    h1 = _knuth32(F.col("key"), KMV_MULT, seed)
    h2 = _knuth32(F.col("key"), BLOOM_MULT2, seed + 1)
    h2o = h2 - F.pmod(h2, F.lit(2)) + F.lit(1)
    probes = keys.select(
        "key",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     F.pmod(h1 + F.lit(r) * h2o, F.lit(width)).alias("c"))
            for r in range(depth)
        ])).alias("rc"),
    ).select("key", "rc.r", "rc.c")
    joined = probes.join(F.broadcast(cms), ["r", "c"], "left")
    return (
        joined.groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
        .withColumnRenamed("key", key_col)
    )
