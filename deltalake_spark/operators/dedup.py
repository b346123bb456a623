"""Deduplication operators — exact and near-duplicate — for 100 TB corpora.

The reference implements only exact/PK dedup over in-memory row arrays
(``deduplicate``, /root/reference/src/compaction/index.ts:930-1086, key
grouping 970-1021). We keep that surface (see
``deltalake_spark.delta.maintenance``) and add the near-duplicate family a
training-data pipeline needs. Every operator here is a pure DataFrame
transform built from JVM-side expressions — no Python row loops — so the
shuffles are the only cross-node cost:

- exact:       one hash-aggregate shuffle on the content hash;
- MinHash/LSH: per-row signature (narrow), explode to bands (narrow),
               one shuffle on (band, band_hash) — the classic
               shingle→minhash→band→bucket-join layout;
- SimHash:     per-row 64-bit fingerprint (narrow), one shuffle on the
               fingerprint prefix for candidate blocking;
- n-gram Jaccard: exact verification join for candidate pairs.

At 1000-executor scale the LSH band shuffle is the bottleneck; band count
(b) and rows-per-band (r) trade recall vs shuffle width (s ≈ (1/b)^(1/r)
similarity threshold). Hot buckets (boilerplate docs) are bounded by
``max_bucket`` to keep the pair-join skew-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 32-bit Mersenne prime — universal-hash family (a*x + b) mod p
_PRIME = 2_147_483_647

# portable shingle-hash width: 7 md5 hex digits = 28 bits keeps the
# permutation products (h·a, a < 2^31) inside int64 on any engine
_PORTABLE_SHINGLE_HEX = 7


def spread_narrow_input(df: DataFrame) -> DataFrame:
    """Round-robin a narrow input up to the default parallelism.

    A small/single-file table scans as 1-2 partitions, which runs a
    CPU-bound expansion stage (shingle explode + per-shingle hashing)
    single-threaded and caps every downstream stage until the first
    shuffle — measured 2.3× on the sf0.1 simhash gate. At warehouse
    scale the input already has more partitions than cores and this is
    a NO-OP (never an extra shuffle of wide data)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df


def portable_hash60(c: Column) -> Column:
    """Cross-engine deterministic 60-bit string hash: the first 15 hex
    digits of md5, parsed as an integer. md5 is byte-identical in every
    engine (standard algorithm over UTF-8), and 60 bits stays positive
    in int64 — DuckDB replays it as
    ``CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)``.

    This is the twin-able counterpart of ``F.hash``/``F.xxhash64``
    (Spark-private Murmur3/XXH64 seeds — fast but unreplayable outside
    the JVM). Use it when a gate needs a value-level SQL oracle; keep
    the native hashes for pure-Spark hot paths."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_word_shingles(text_col: Column, k: int = 3) -> Column:
    """k-word shingle STRINGS (space-joined, out-of-range words pad to
    ''), for the portable hash paths: hashing happens AFTER the shingle
    explode — once per distinct shingle row, in a vectorized
    projection — because hashing inside this array expression would be
    inlined into every ``slice`` copy by Catalyst's project-collapse
    and fall out of codegen (measured 3× the cost). The slices here
    only duplicate the cheap ``split``."""
    tokens = F.split(F.trim(text_col), r"\s+")
    n = F.size(tokens)
    length = F.greatest(n - (k - 1), F.lit(1))
    combined = F.slice(tokens, 1, length)
    for offset in range(1, k):
        nxt = F.slice(tokens, 1 + offset, length)
        combined = F.zip_with(
            combined, nxt,
            lambda a, b: F.concat(a, F.lit(" "), F.coalesce(b, F.lit(""))),
        )
    return combined


def _hash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _PRIME), rng.randrange(0, _PRIME))
        for _ in range(num_hashes)
    ]


def exact_dedup(df: DataFrame, *, subset: list[str] | None = None,
                keep_col: str | None = None) -> DataFrame:
    """Exact dedup: one row per duplicate group (hash-groupBy shuffle).

    With ``keep_col`` keeps the row with the minimum value of that column
    (deterministic "first"); otherwise Spark's dropDuplicates.
    Reference parity: keepStrategy 'first' (compaction/index.ts:1010-1016).
    """
    keys = subset or df.columns
    if keep_col is None:
        return df.dropDuplicates(keys)
    ranked = df.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(*[F.col(c) for c in keys])
            .orderBy(F.col(keep_col).asc())
        ),
    )
    return ranked.filter(F.col("__rn") == 1).drop("__rn")


def char_shingles(text_col: Column, k: int = 5) -> Column:
    """Array of k-char shingles, computed JVM-side via transform over a
    position sequence (no Python UDF)."""
    n = F.length(text_col)
    positions = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    return F.transform(positions, lambda i: text_col.substr(i, F.lit(k)))


def word_shingle_hashes(text_col: Column, k: int = 3) -> Column:
    """Hashes of k-word shingles WITHOUT building shingle strings.

    Tokens are hashed once; the shingle hash combines k consecutive word
    hashes arithmetically via aligned ``slice`` + ``zip_with`` — pure
    integer array math, roughly 7x fewer elements and no per-shingle
    string allocation compared to character shingles (measured 6x faster
    at sf0.1).
    """
    tokens = F.split(F.trim(text_col), r"\s+")
    wh = F.transform(tokens, lambda w: F.hash(w).cast("long"))
    n = F.size(wh)
    length = F.greatest(n - (k - 1), F.lit(1))
    combined = F.slice(wh, 1, length)
    for offset in range(1, k):
        nxt = F.slice(wh, 1 + offset, length)
        combined = F.zip_with(
            combined, nxt,
            lambda a, b: a * F.lit(31).cast("long") + F.coalesce(b, F.lit(0)),
        )
    return combined


def minhash_signature(text_col: Column, *, num_hashes: int = 64,
                      shingle_size: int = 5, seed: int = 42,
                      shingle_mode: str = "word") -> Column:
    """MinHash signature as array<long> of length ``num_hashes``.

    shingle → hash → per-permutation (a*h+b) mod p → running min.
    All array expressions run inside codegen; cost is O(shingles×hashes)
    per row with zero shuffle. ``shingle_mode='word'`` (default) hashes
    3-word grams arithmetically (fast path); ``'char'`` builds classic
    character shingles of ``shingle_size``.
    """
    params = _hash_params(num_hashes, seed)
    if shingle_mode == "word":
        shingles = F.array_distinct(word_shingle_hashes(text_col, 3))
    else:
        shingles = F.array_distinct(char_shingles(text_col, shingle_size))

    # Single-pass fold: one traversal of the shingle array computes all
    # permutation minima. N.B. per-permutation array_min(transform(base))
    # would make Catalyst's project-collapse duplicate the shingle+hash
    # expression num_hashes times (measured 25x slower at sf0.1).
    def step(acc: Column, s: Column) -> Column:
        h = F.abs(F.hash(s)).cast("long")
        cands = F.array(*[(h * a + b) % _PRIME for a, b in params])
        return F.zip_with(acc, cands, lambda x, y: F.least(x, y))

    init = F.array_repeat(F.lit(_PRIME).cast("long"), num_hashes)
    return F.aggregate(shingles, init, step)


def minhash_lsh_candidates(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 42,
    max_bucket: int = 1000,
    shingle_mode: str = "word",
    hash_mode: str = "native",
) -> DataFrame:
    """Near-duplicate candidate groups via MinHash + LSH banding.

    Returns (band, band_hash, member_ids array<long> sorted, group_size)
    for buckets with >1 member. ``max_bucket`` caps pathological buckets
    (boilerplate) so downstream pair-verification doesn't explode — capped
    buckets are still reported, truncation is visible in group_size.

    ``hash_mode='native'`` (default) hashes shingles and bands with
    Spark's Murmur3 — the fast pure-Spark path.
    ``hash_mode='portable'`` (word shingles only) swaps BOTH hash sites
    for md5 arithmetic (28-bit md5 shingle hashes applied AFTER the
    explode → the same ``(a·h+b) mod p`` permutation minima →
    md5-of-concat 60-bit band keys), making the whole candidate
    derivation a pure function any SQL engine replays value-for-value —
    the gate query's DuckDB twin. Identical plan shape and recall
    family; one md5 per distinct shingle + one per band.
    """
    exploded = minhash_band_keys(
        df, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
        bands=bands, shingle_size=shingle_size, seed=seed,
        shingle_mode=shingle_mode, hash_mode=hash_mode,
    ).withColumnRenamed(id_col, "__id")
    return (
        exploded.groupBy("band", "band_hash")
        .agg(
            F.slice(F.array_sort(F.collect_set("__id")), 1, max_bucket)
            .alias("member_ids"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
        .orderBy("band", "band_hash")
    )


def minhash_band_keys(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 42,
    shingle_mode: str = "word",
    hash_mode: str = "native",
) -> DataFrame:
    """Per-document LSH band keys: ``(id_col, band, band_hash)``, one
    row per (doc, band) — the shared derivation under
    :func:`minhash_lsh_candidates` (self-corpus dedup) and the
    persisted-index pair :func:`minhash_index_write` /
    :func:`minhash_dedup_incremental` (nightly-ingest dedup). Factoring
    it guarantees the incremental path buckets IDENTICALLY to the
    batch path — an index written today matches candidates tomorrow's
    batch derivation would find.

    shingle → hash → per-permutation ``(a·h+b) mod p`` minima via one
    explode + vectorized hash-aggregate (map-side partial, the shuffle
    carries num_docs x num_hashes longs) → per-band key hash, exploded
    to (doc, band) rows. ``hash_mode='portable'`` swaps both hash
    sites for md5 arithmetic so any SQL engine replays the keys
    value-for-value (the DuckDB-twin path).
    """
    assert num_hashes % bands == 0, "num_hashes must be divisible by bands"
    if hash_mode not in ("native", "portable"):
        raise ValueError("hash_mode must be 'native' or 'portable'")
    if hash_mode == "portable" and shingle_mode != "word":
        raise ValueError("portable hash_mode supports word shingles only")
    df = spread_narrow_input(df)
    rows_per_band = num_hashes // bands
    params = _hash_params(num_hashes, seed)

    # Signature via explode + hash-aggregate: map-side partial aggregation
    # makes the shuffle num_docs x num_hashes longs (tiny), and Spark's
    # vectorized hash agg computes the permutation minima ~3x faster than
    # a per-row higher-order-function fold (measured at sf0.1).
    if hash_mode == "portable":
        # shingle strings exploded FIRST, md5 applied once per row (see
        # portable_word_shingles); 28-bit hash keeps (h·a+b) < 2^59
        sh = portable_word_shingles(F.col(text_col), 3)
        exploded_sh = df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(sh)).alias("__sh"),
        ).select(
            "__id",
            F.conv(F.substring(F.md5("__sh"), 1, _PORTABLE_SHINGLE_HEX),
                   16, 10).cast("long").alias("__h"),
        )
    else:
        if shingle_mode == "word":
            sh = word_shingle_hashes(F.col(text_col), 3)
        else:
            sh = char_shingles(F.col(text_col), shingle_size)
        exploded_sh = df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(sh)).alias("__sh"),
        ).select("__id", F.abs(F.hash("__sh")).cast("long").alias("__h"))
    with_sig = exploded_sh.groupBy("__id").agg(*[
        F.min((F.col("__h") * a + b) % _PRIME).alias(f"__m{i}")
        for i, (a, b) in enumerate(params)
    ])

    def _band_hash(b: int) -> Column:
        cols = [F.col(f"__m{i}")
                for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        if hash_mode == "portable":
            return portable_hash60(F.concat_ws("|", *cols))
        return F.hash(*cols).cast("long")

    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            _band_hash(b).alias("band_hash"),
        )
        for b in range(bands)
    ])
    return with_sig.select(
        "__id", F.explode(band_structs).alias("bb")
    ).select(F.col("__id").alias(id_col), "bb.band", "bb.band_hash")


_MINHASH_INDEX_CONF = "deltalake.minhashIndex.params"


def _minhash_index_params(**kw) -> str:
    import json

    return json.dumps(kw, sort_keys=True)


def minhash_index_write(
    df: DataFrame,
    table,
    *,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 42,
    shingle_mode: str = "word",
    hash_mode: str = "native",
    mode: str = "append",
) -> int:
    """Persist a corpus' MinHash/LSH fingerprints as a Delta table —
    the index side of nightly-ingest dedup.

    Production pipelines don't dedup a corpus against itself: they
    dedup a NEW batch against signatures of everything ALREADY
    ingested (100 TB of text reduces to num_docs x bands key rows of
    three longs — the only thing the nightly job should ever touch).
    This writes ``(id_col, band, band_hash)`` from
    :func:`minhash_band_keys`, partitioned by ``band``, so the
    incremental probe's band equi-join prunes to matching band
    partitions and NEVER recomputes a corpus signature.

    The full parameter set is pinned in the table configuration
    (``deltalake.minhashIndex.params``): signatures are only
    comparable under identical (num_hashes, bands, seed, shingles,
    hash_mode), so :func:`minhash_dedup_incremental` validates its
    parameters against the stored ones and an append with different
    parameters fails LOUD here instead of silently mixing
    incomparable fingerprints.

    ``mode='append'`` is the nightly pattern: after deduping a batch,
    append the KEPT docs' keys so tomorrow's batch dedups against
    today's too. Returns the committed Delta version.
    """
    params = _minhash_index_params(
        num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
        seed=seed, shingle_mode=shingle_mode, hash_mode=hash_mode,
        id_col=id_col,
    )
    if table.exists():
        stored = (table.snapshot().configuration or {}).get(
            _MINHASH_INDEX_CONF)
        if mode != "overwrite" and stored is not None and stored != params:
            raise ValueError(
                f"minhash_index_write: index at {table.path} was built "
                f"with {stored}, incompatible with {params} — signatures "
                f"under different parameters are not comparable; use "
                f"mode='overwrite' to rebuild")
    keys = minhash_band_keys(
        df, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
        bands=bands, shingle_size=shingle_size, seed=seed,
        shingle_mode=shingle_mode, hash_mode=hash_mode,
    )
    existed = table.exists()
    version = table.write(
        keys, mode=mode, partition_by=["band"],
        configuration={_MINHASH_INDEX_CONF: params},
    )
    if existed:
        # write() pins configuration only at table creation; a rebuild
        # (mode='overwrite' on an existing table) must re-pin so the
        # stored params always describe the CURRENT signatures
        stored = (table.snapshot().configuration or {}).get(
            _MINHASH_INDEX_CONF)
        if stored != params:
            version = table.update_metadata({_MINHASH_INDEX_CONF: params})
    return version


def minhash_dedup_incremental(
    batch: DataFrame,
    index,
    *,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 5,
    seed: int = 42,
    shingle_mode: str = "word",
    hash_mode: str = "native",
    max_bucket: int = 1000,
    min_shared_bands: int = 1,
) -> DataFrame:
    """Dedup a new batch against a PERSISTED fingerprint index — the
    nightly-ingest shape: signatures are computed for the BATCH ONLY;
    the index side is a scan of ``(id, band, band_hash)`` rows written
    by :func:`minhash_index_write` (or any DataFrame with those
    columns), joined on the exact band keys.

    Per batch document, over index docs sharing >= ``min_shared_bands``
    LSH buckets:

    - ``n_candidates`` — how many distinct index docs collide;
    - ``match_id`` / ``match_bands`` — the strongest candidate (most
      shared bands, ties to the smallest id — deterministic) and its
      shared-band count; NULL / 0 when none;
    - ``is_new`` — no candidate: safe to ingest (and append to the
      index).

    ``max_bucket`` drops index buckets with more members than the cap
    before the probe join — boilerplate buckets are where LSH skew
    lives, and a single hot ``(band, band_hash)`` would fan one batch
    row into millions of pairs. Dropping (not truncating) keeps the
    result a pure function of (batch, index, params) that a SQL twin
    replays exactly; the cap is visible in the signature the docstring
    pins. At 100 TB the probe is: batch-sized signature derivation
    (map + one partial-agg shuffle), one KB-per-bucket count agg over
    the index keys, and a band-key equi-join whose index side pruned
    to the batch's band partitions — never a corpus text re-read.

    ``index`` may be a DeltaTable (parameters are validated against
    the pinned ones — mismatched signatures fail loud) or a raw
    DataFrame of keys (caller owns compatibility).
    """
    idx_df = index
    if hasattr(index, "to_df"):  # DeltaTable duck-type
        stored = (index.snapshot().configuration or {}).get(
            _MINHASH_INDEX_CONF)
        params = _minhash_index_params(
            num_hashes=num_hashes, bands=bands, shingle_size=shingle_size,
            seed=seed, shingle_mode=shingle_mode, hash_mode=hash_mode,
            id_col=id_col,
        )
        if stored is not None and stored != params:
            raise ValueError(
                f"minhash_dedup_incremental: index was built with "
                f"{stored}, probe requested {params} — signatures under "
                f"different parameters are not comparable")
        idx_df = index.to_df()
    idx_keys = idx_df.select(
        F.col(id_col).alias("__cand"), "band", "band_hash")
    # skew guard: drop boilerplate buckets BEFORE the probe join. The
    # count agg touches only index KEY rows (bands x docs x 3 longs).
    ok_buckets = (
        idx_keys.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("__bc"))
        .filter(F.col("__bc") <= int(max_bucket))
        .select("band", "band_hash")
    )
    idx_keys = idx_keys.join(ok_buckets, ["band", "band_hash"], "left_semi")
    bkeys = minhash_band_keys(
        batch, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
        bands=bands, shingle_size=shingle_size, seed=seed,
        shingle_mode=shingle_mode, hash_mode=hash_mode,
    ).withColumnRenamed(id_col, "__bid")
    pairs = (
        bkeys.join(idx_keys, ["band", "band_hash"])
        .groupBy("__bid", "__cand")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .filter(F.col("__shared") >= int(min_shared_bands))
    )
    win = Window.partitionBy("__bid").orderBy(
        F.desc("__shared"), F.asc("__cand"))
    best = (
        pairs.withColumn("__rn", F.row_number().over(win))
        .groupBy("__bid")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.max(F.when(F.col("__rn") == 1, F.col("__cand")))
            .alias("match_id"),
            F.max(F.when(F.col("__rn") == 1, F.col("__shared")))
            .alias("match_bands"),
        )
    )
    return (
        batch.select(F.col(id_col).alias("__bid"))
        .join(best, "__bid", "left")
        .select(
            F.col("__bid").alias(id_col),
            F.coalesce("n_candidates", F.lit(0).cast("long"))
            .alias("n_candidates"),
            "match_id",
            F.coalesce("match_bands", F.lit(0).cast("long"))
            .alias("match_bands"),
            F.col("n_candidates").isNull().alias("is_new"),
        )
    )


def dedup_index_retention(
    index,
    drop_ids: DataFrame | None,
    *,
    id_col: str,
    dry_run: bool = False,
) -> dict:
    """Nightly retention for a persisted dedup fingerprint index (the
    minhash/simhash tables of :func:`minhash_index_write` /
    :func:`simhash_index_write`, r10 verdict ask #8): under streaming
    ingest (streaming/sink.py:minhash_stream_dedup_sink) the index only
    ever grows — docs deleted or expired from the corpus keep matching
    new batches forever, and every micro-batch append leaves another
    small file per band partition. This drops the expired ids' key rows
    AND re-optimizes the file layout in ONE overwrite commit, so readers
    see either the old index or the fully-retained one, never a half
    state.

    ``drop_ids``: one-column DataFrame of ``id_col`` values to expire
    (e.g. the corpus table's deleted keys); ``None`` or empty means a
    layout-only pass — probe results are then IDENTICAL before/after
    (pinned in tests/test_minhash_index.py).

    100 TB design: the index is bands x docs rows of three longs — the
    ONLY thing this job touches (never corpus text). Expiry is one
    left-anti equi-join on ``id_col`` (AQE picks broadcast when the
    nightly drop set is small); the rewrite repartitions by the index's
    own partition column, so each band directory lands as one coherent
    file per shuffle partition and the band-pruned probe join reads
    compact files again. Pinned index params (the comparability
    contract) survive the overwrite unchanged — asserted and re-pinned
    if the engine ever drops them.

    Returns ``{"dropped_ids": n, "removed_rows": n, "kept_rows": n,
    "version": v}`` (``version`` is the pre-retention version when
    ``dry_run`` or nothing to do).
    """
    snap = index.snapshot()
    part_cols = list(snap.partition_columns or [])
    conf_before = dict(snap.configuration or {})
    keys = index.to_df()
    if drop_ids is not None:
        drop = drop_ids.select(F.col(drop_ids.columns[0]).alias(id_col)) \
            .distinct()
        hit = keys.join(drop, id_col, "left_semi")
        removed_rows = hit.count()
        dropped = hit.select(id_col).distinct().count()
    else:
        removed_rows = dropped = 0
    kept_rows = None
    version = snap.version
    if not dry_run:
        kept = keys
        if dropped:
            kept = keys.join(
                drop_ids.select(F.col(drop_ids.columns[0]).alias(id_col))
                .distinct(),
                id_col, "left_anti")
        if part_cols:
            kept = kept.repartition(*[F.col(c) for c in part_cols])
        kept_rows = kept.count()
        version = index.write(kept, mode="overwrite",
                              partition_by=part_cols or None)
        conf_after = dict(index.snapshot().configuration or {})
        if conf_after != conf_before:
            # the pinned signature params ARE the index's comparability
            # contract — restore them if the overwrite lost any
            version = index.update_metadata(conf_before)
    return {
        "dropped_ids": int(dropped),
        "removed_rows": int(removed_rows),
        "kept_rows": int(kept_rows) if kept_rows is not None else None,
        "version": int(version),
    }


def lsh_candidate_quality(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    threshold_num: int,
    threshold_den: int,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_bucket: int = 1000,
    hash_mode: str = "portable",
) -> DataFrame:
    """Candidate-quality evaluation for MinHash+LSH banding: PRECISION
    and RECALL of the banded candidate pairs against exact-Jaccard
    ground truth at ``threshold_num/threshold_den`` — the number a real
    deployment tunes (num_hashes, bands) against, the dedup analog of
    the ANN ``ivf_pq_recall_join`` gate. A banding change that silently
    drops recall is invisible to every determinism gate; this is the
    quality regression harness.

    Both halves measure the SAME set: ground truth is the exact Jaccard
    over the per-doc DISTINCT shingle-hash sets that the MinHash
    signatures approximate (not raw shingle strings — under the finite
    hash width the signature estimates J of the hash sets, so that is
    the well-defined target). Truth pairs come from
    :func:`prefix_jaccard_join` — provably complete prefix-filtered
    exact join, never all-pairs; candidates from
    :func:`minhash_lsh_candidates` with identical shingle/seed/band
    parameters, bucket-capped at ``max_bucket`` exactly like the
    production path.

    Scale shape: the truth side is the PPJoin plan (rarest-first prefix
    equi-join); the candidate side is the banded bucket plan; the
    comparison is one full-outer pair join + a scalar aggregate. The
    only floats are the two final divisions. Output one row:
    ``(n_true, n_cand, n_hit, precision, recall)``.

    ``hash_mode='portable'`` (default) uses the md5-derived 28-bit
    shingle hashes so a SQL oracle replays truth AND candidates
    value-for-value — in this mode truth and signatures hash the SAME
    sets exactly. ``'native'`` swaps both sides to Spark Murmur3
    (faster, unreplayable outside the JVM); note the native signature
    path hashes arithmetic word-gram combines while the truth side
    hashes shingle strings, so the two sets agree on the underlying
    string-shingle Jaccard only up to (negligible) hash collisions —
    fine for monitoring, use portable for exact evaluation.
    """
    if hash_mode not in ("native", "portable"):
        raise ValueError("hash_mode must be 'native' or 'portable'")
    sh = portable_word_shingles(F.col(text_col), 3)
    if hash_mode == "portable":
        hexpr = F.conv(
            F.substring(F.md5("__s"), 1, _PORTABLE_SHINGLE_HEX),
            16, 10).cast("long")
    else:
        hexpr = F.abs(F.hash("__s")).cast("long")
    toks = (
        spread_narrow_input(df)
        .select(F.col(id_col).alias("__tid"),
                F.explode(F.array_distinct(sh)).alias("__s"))
        .select("__tid", hexpr.alias("__h"))
        .groupBy("__tid")
        .agg(F.collect_set("__h").alias("__toks"))
    )
    truth = prefix_jaccard_join(
        toks, id_col="__tid", tokens_col="__toks",
        threshold_num=threshold_num, threshold_den=threshold_den,
    ).select("id_a", "id_b", F.lit(1).alias("__true"))
    buckets = minhash_lsh_candidates(
        df, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
        bands=bands, seed=seed, max_bucket=max_bucket,
        shingle_mode="word", hash_mode=hash_mode,
    )
    cand = (
        buckets.select(F.explode("member_ids").alias("id_a"),
                       "member_ids")
        .select("id_a", F.explode("member_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
        .select("id_a", "id_b", F.lit(1).alias("__cand"))
    )
    both = truth.join(cand, ["id_a", "id_b"], "full_outer")
    agg = both.groupBy().agg(
        F.sum(F.coalesce("__true", F.lit(0))).alias("n_true"),
        F.sum(F.coalesce("__cand", F.lit(0))).alias("n_cand"),
        F.sum(F.coalesce("__true", F.lit(0))
              * F.coalesce("__cand", F.lit(0))).alias("n_hit"),
    )
    return agg.select(
        "n_true", "n_cand", "n_hit",
        F.when(F.col("n_cand") > 0,
               F.col("n_hit").cast("double") / F.col("n_cand"))
        .otherwise(F.lit(None).cast("double")).alias("precision"),
        F.when(F.col("n_true") > 0,
               F.col("n_hit").cast("double") / F.col("n_true"))
        .otherwise(F.lit(None).cast("double")).alias("recall"),
    )


_SIMHASH_INDEX_CONF = "deltalake.simhashIndex.params"


def simhash_index_write(
    df: DataFrame,
    table,
    *,
    id_col: str,
    text_col: str,
    bands: int = 4,
    shingle_size: int = 4,
    hash_mode: str = "native",
    mode: str = "append",
) -> int:
    """Persist SimHash fingerprints as a banded Delta index — the
    Hamming-distance sibling of :func:`minhash_index_write` (Jaccard).
    Each doc stores its fingerprint once per band: ``(id, simhash,
    band, band_bits)``, partitioned by ``band``, where ``band_bits``
    is the band's bit slice. By pigeonhole, any fingerprint within
    Hamming distance < ``bands`` of an indexed one agrees exactly on
    at least one band — so the incremental probe's band equi-join has
    a RECALL GUARANTEE at radius ``bands − 1``, unlike prefix
    blocking. Parameters pin to table config; incompatible
    append/probe fails loud (the minhash-index contract). Returns the
    committed version."""
    bits = _PORTABLE_SIMHASH_BITS if hash_mode == "portable" else 64
    if bits % bands:
        raise ValueError(f"bands must divide {bits}, got {bands}")
    params = _minhash_index_params(
        kind="simhash", bands=bands, shingle_size=shingle_size,
        hash_mode=hash_mode, id_col=id_col)
    if table.exists():
        stored = (table.snapshot().configuration or {}).get(
            _SIMHASH_INDEX_CONF)
        if mode != "overwrite" and stored is not None and stored != params:
            raise ValueError(
                f"simhash_index_write: index at {table.path} was built "
                f"with {stored}, incompatible with {params} — "
                f"fingerprints under different parameters are not "
                f"comparable; use mode='overwrite' to rebuild")
    width = bits // bands
    mask = (1 << width) - 1
    fp = simhash_fingerprints(
        df, id_col=id_col, text_col=text_col,
        shingle_size=shingle_size, hash_mode=hash_mode)
    keys = fp.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("simhash", b * width)
                .bitwiseAND(F.lit(mask).cast("long")).alias("band_bits"),
            ) for b in range(bands)
        ])).alias("__bb"),
    ).select(id_col, "simhash", "__bb.band", "__bb.band_bits")
    existed = table.exists()
    version = table.write(
        keys, mode=mode, partition_by=["band"],
        configuration={_SIMHASH_INDEX_CONF: params},
    )
    if existed:
        stored = (table.snapshot().configuration or {}).get(
            _SIMHASH_INDEX_CONF)
        if stored != params:
            version = table.update_metadata({_SIMHASH_INDEX_CONF: params})
    return version


def simhash_dedup_incremental(
    batch: DataFrame,
    index,
    *,
    id_col: str,
    text_col: str,
    bands: int = 4,
    shingle_size: int = 4,
    hash_mode: str = "native",
    max_hamming: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Dedup a new batch against a persisted SimHash index: batch-only
    fingerprint derivation, band equi-join against the index SCAN
    (never recomputing a corpus fingerprint), exact
    ``bit_count(a XOR b)`` Hamming verify on collided pairs.

    ``max_hamming`` defaults to ``bands − 1`` — the radius the banded
    layout GUARANTEES (any pair within it shares a band); a larger
    radius still verifies exactly but recall beyond the guarantee is
    best-effort. ``max_bucket`` drops degenerate buckets (e.g. the
    all-zero band every near-empty doc hashes to) before the probe —
    the boilerplate skew guard, deterministic and twin-replayable.

    Per batch doc: ``n_candidates`` (distinct index docs within
    radius), ``match_id``/``match_hamming`` (closest, ties to the
    smallest id), ``is_new``. ``index`` is a DeltaTable (params
    validated against the pinned config) or a DataFrame of
    ``(id, simhash, band, band_bits)`` rows.
    """
    bits = _PORTABLE_SIMHASH_BITS if hash_mode == "portable" else 64
    if bits % bands:
        raise ValueError(f"bands must divide {bits}, got {bands}")
    if max_hamming is None:
        max_hamming = bands - 1
    idx_df = index
    if hasattr(index, "to_df"):
        stored = (index.snapshot().configuration or {}).get(
            _SIMHASH_INDEX_CONF)
        params = _minhash_index_params(
            kind="simhash", bands=bands, shingle_size=shingle_size,
            hash_mode=hash_mode, id_col=id_col)
        if stored is not None and stored != params:
            raise ValueError(
                f"simhash_dedup_incremental: index was built with "
                f"{stored}, probe requested {params} — fingerprints "
                f"under different parameters are not comparable")
        idx_df = index.to_df()
    idx = idx_df.select(
        F.col(id_col).alias("__cand"), F.col("simhash").alias("__cfp"),
        "band", "band_bits")
    ok = (idx.groupBy("band", "band_bits")
          .agg(F.count(F.lit(1)).alias("__bc"))
          .filter(F.col("__bc") <= int(max_bucket))
          .select("band", "band_bits"))
    idx = idx.join(ok, ["band", "band_bits"], "left_semi")
    width = bits // bands
    mask = (1 << width) - 1
    bfp = simhash_fingerprints(
        batch, id_col=id_col, text_col=text_col,
        shingle_size=shingle_size, hash_mode=hash_mode,
    ).select(F.col(id_col).alias("__bid"), F.col("simhash").alias("__bfp"))
    bkeys = bfp.select(
        "__bid", "__bfp",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("__bfp", b * width)
                .bitwiseAND(F.lit(mask).cast("long")).alias("band_bits"),
            ) for b in range(bands)
        ])).alias("__bb"),
    ).select("__bid", "__bfp", "__bb.band", "__bb.band_bits")
    verified = (
        bkeys.join(idx, ["band", "band_bits"])
        .select("__bid", "__cand",
                F.bit_count(F.col("__bfp").bitwiseXOR(F.col("__cfp")))
                .cast("long").alias("__ham"))
        .filter(F.col("__ham") <= int(max_hamming))
        # a pair can collide on several bands — dedupe before counting
        .groupBy("__bid", "__cand")
        .agg(F.min("__ham").alias("__ham"))
    )
    win = Window.partitionBy("__bid").orderBy(
        F.asc("__ham"), F.asc("__cand"))
    best = (
        verified.withColumn("__rn", F.row_number().over(win))
        .groupBy("__bid")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.max(F.when(F.col("__rn") == 1, F.col("__cand")))
            .alias("match_id"),
            F.max(F.when(F.col("__rn") == 1, F.col("__ham")))
            .alias("match_hamming"),
        )
    )
    return (
        batch.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("__bid"))
        .join(best, "__bid", "left")
        .select(
            F.col("__bid").alias(id_col),
            F.coalesce("n_candidates", F.lit(0).cast("long"))
            .alias("n_candidates"),
            "match_id",
            F.coalesce("match_hamming", F.lit(-1).cast("long"))
            .alias("match_hamming"),
            F.col("n_candidates").isNull().alias("is_new"),
        )
    )


def simhash64(text_col: Column, *, shingle_size: int = 4) -> Column:
    """64-bit SimHash fingerprint, pure column expressions.

    Each shingle contributes ±1 per bit position of its 64-bit hash; the
    fingerprint sets bits with positive sums. xxhash64 gives the 64-bit
    base hash JVM-side.
    """
    shingles = char_shingles(text_col, shingle_size)

    # Single-pass fold over shingles: acc is the 64-vector of bit sums.
    # (Per-bit aggregate() calls would recompute shingling 64 times.)
    # signed-long bit masks: bit 63 is Long.MIN_VALUE, not +2^63
    masks = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]

    def step(acc: Column, s: Column) -> Column:
        h = F.xxhash64(s)
        contrib = F.array(*[
            F.when(h.bitwiseAND(F.lit(m).cast("long")) != 0, 1).otherwise(-1)
            for m in masks
        ])
        return F.zip_with(acc, contrib, lambda x, y: x + y)

    init = F.array_repeat(F.lit(0), 64)
    sums = F.aggregate(shingles, init, step)

    # fingerprint: add 2^i for every positive bit sum (bit 63 is the sign
    # bit: adding Long.MIN_VALUE sets it without overflow)
    powers = F.array(*[
        F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        for i in range(64)
    ])
    contribs = F.zip_with(
        sums, powers,
        lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(contribs, F.lit(0).cast("long"),
                       lambda acc, x: acc + x)


_PORTABLE_SIMHASH_BITS = 60


def simhash_fingerprints(df: DataFrame, *, id_col: str, text_col: str,
                         shingle_size: int = 4,
                         hash_mode: str = "native") -> DataFrame:
    """Per-document SimHash fingerprint — the shared derivation under
    :func:`simhash_candidates` / :func:`simhash_near_pairs` blocking
    and the persisted-index pair :func:`simhash_index_write` /
    :func:`simhash_dedup_incremental`. ``'native'``: 64-bit xxhash64
    fold (:func:`simhash64`). ``'portable'``: 60-bit md5-derived
    fingerprint via explode → per-bit exact ±1 hash-aggregate — SQL
    engines replay it bit-for-bit (the twin path). NULL-text rows are
    excluded in BOTH modes (the r7 row contract). Returns
    ``(id_col, simhash)``."""
    if hash_mode not in ("native", "portable"):
        raise ValueError("hash_mode must be 'native' or 'portable'")
    df = spread_narrow_input(df.filter(F.col(text_col).isNotNull()))
    if hash_mode == "portable":
        bits = _PORTABLE_SIMHASH_BITS
        exploded = df.select(
            F.col(id_col).alias("__id"),
            F.explode(char_shingles(F.col(text_col), shingle_size))
            .alias("__s"),
        ).select("__id", portable_hash60(F.col("__s")).alias("__h"))
        sums = exploded.groupBy("__id").agg(*[
            F.sum(
                F.when(F.shiftright(F.col("__h"), i).bitwiseAND(1) == 1,
                       1).otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(bits)
        ])
        fp = F.lit(0).cast("long")
        for i in range(bits):
            fp = fp + F.when(F.col(f"__b{i}") > 0,
                             F.lit(1 << i).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        return sums.select(F.col("__id").alias(id_col),
                           fp.alias("simhash"))
    fp64 = simhash64(F.col(text_col), shingle_size=shingle_size)
    return df.select(F.col(id_col).alias(id_col), fp64.alias("simhash"))


def simhash_candidates(df: DataFrame, *, id_col: str, text_col: str,
                       prefix_bits: int = 16,
                       shingle_size: int = 4,
                       hash_mode: str = "native") -> DataFrame:
    """Block near-dup candidates by SimHash prefix (single shuffle).

    At scale: multiple rotations would be used to guarantee Hamming-distance
    recall; one prefix block demonstrates the layout and keeps the shuffle
    narrow.

    ``hash_mode='native'``: 64-bit xxhash64 fingerprint via the per-row
    :func:`simhash64` fold. ``hash_mode='portable'``: a 60-bit
    fingerprint from :func:`portable_hash60` shingle hashes, built by
    explode → per-bit ±1 hash-aggregate (map-side combined; the shuffle
    is docs × 60 ints) — every bit sum is exact integer arithmetic a
    SQL engine replays, giving the gate query a value-level DuckDB
    twin. The prefix is taken from the top of the 60-bit space.

    Rows with NULL ``text_col`` are EXCLUDED in both modes (same row
    contract: previously the portable path dropped them via explode
    while the native path kept a null-fingerprint row).
    """
    bits = _PORTABLE_SIMHASH_BITS if hash_mode == "portable" else 64
    if not 0 < prefix_bits <= bits:
        raise ValueError(f"prefix_bits must be in 1..{bits}")
    with_fp = simhash_fingerprints(
        df, id_col=id_col, text_col=text_col, shingle_size=shingle_size,
        hash_mode=hash_mode,
    ).select(
        F.col(id_col).alias("__id"), "simhash",
    ).withColumn("block", F.shiftright("simhash", bits - prefix_bits))
    return (
        with_fp.groupBy("block")
        .agg(
            F.array_sort(F.collect_list("__id")).alias("member_ids"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


def simhash_near_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    bands: int = 4,
    max_hamming: int | None = None,
    shingle_size: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs with a recall GUARANTEE: the 64-bit
    fingerprint splits into ``bands`` equal bit-bands; by pigeonhole any
    two fingerprints within Hamming distance < ``bands`` agree exactly on
    at least one band, so banding finds every such pair while the shuffle
    stays narrow (the scale fix promised in :func:`simhash_candidates`'s
    docstring — single-prefix blocking trades recall, banding does not).

    Plan shape at 100 TB: one fingerprint pass, a ``bands``-way explode
    (rows × B, B small), one hash-shuffle on (band, band_bits), pair
    generation inside buckets only, then an exact JVM-side
    ``bit_count(a ^ b)`` verify — never a cross join, no Python workers.

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming ≤
    ``max_hamming`` (default ``bands - 1``, the guaranteed radius).
    """
    if 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    if max_hamming is None:
        max_hamming = bands - 1
    width = 64 // bands
    mask = (1 << width) - 1

    fp = df.select(
        F.col(id_col).alias("__id"),
        simhash64(F.col(text_col), shingle_size=shingle_size)
        .alias("__fp"),
    )
    banded = fp.select(
        "__id", "__fp",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                # logical >>> then mask: band bits as a non-negative long
                F.shiftrightunsigned("__fp", i * width)
                .bitwiseAND(F.lit(mask).cast("long")).alias("bits"),
            )
            for i in range(bands)
        ])).alias("__b"),
    ).select("__id", "__fp", "__b.band", "__b.bits")
    left = banded.select(F.col("__id").alias("id_a"),
                         F.col("__fp").alias("fa"), "band", "bits")
    right = banded.select(F.col("__id").alias("id_b"),
                          F.col("__fp").alias("fb"), "band", "bits")
    pairs = (
        left.join(right, ["band", "bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
                .alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("id_a", "id_b")
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate verification.

    Without ``candidates``, verifies all pairs sharing an LSH bucket from
    :func:`minhash_lsh_candidates` (never a full cross join — at 100 TB a
    blind pairwise comparison is not a plan).
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    if candidates is None:
        candidates = minhash_lsh_candidates(
            df, id_col=id_col, text_col=text_col
        )
    pairs = (
        candidates.select(F.explode("member_ids").alias("id_a"), "member_ids")
        .select("id_a", F.explode("member_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(char_shingles(F.col(text_col), n)).alias("__grams"),
    )
    a = grams.select(F.col("__id").alias("id_a"), F.col("__grams").alias("ga"))
    b = grams.select(F.col("__id").alias("id_b"), F.col("__grams").alias("gb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return (
        joined.select(
            "id_a", "id_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over an undirected edge list → (node,
    component) with component = min node id in the component.

    This is the clustering step real near-dup dedup needs after
    candidate generation (MinHash/SimHash give PAIRS; groups require
    transitive closure). Algorithm: alternating star contraction
    (large-star / small-star, Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014) — each round every node hooks
    its larger neighbors (large-star) and then itself plus its smaller
    neighbors (small-star) onto the minimum of the relevant
    neighborhood; the edge set contracts toward per-component stars in
    O(log n) rounds. Each half-round is one groupBy + one equi-join on
    the (shrinking) edge set.

    The r1–r6 implementation was min-label propagation with one
    pointer jump per round: on PATH-shaped components with shuffled
    ids the jump buys nothing and the minimum travels ONE hop per
    round, so a 186-member duplicate chain in the sf0.1 golden-records
    gate silently returned split components at max_iter=20 (caught r7
    by the first sf0.1 oracle run of that gate). Star contraction
    fixes the complexity; the loud failure below fixes the silence:
    non-convergence raises, and a final verification pass asserts no
    input edge crosses two output components — this operator now
    returns the true partition or an error, never an approximation.

    Self-loops are ignored for edges but their node still reports its
    own singleton component.

    ``checkpoint_dir=None`` cuts per-round lineage with
    ``localCheckpoint`` (executor-resident — right for local runs); a
    path switches to reliable round files there so a multi-executor
    run survives executor loss mid-iteration; both modes release
    out-of-grace prior rounds so storage stays bounded at any round
    count (see :mod:`deltalake_spark.operators.iterative`).
    """
    from deltalake_spark.operators.iterative import RoundCutter

    cutter = RoundCutter(edges.sparkSession, checkpoint_dir, "cc")
    a, b = F.col(src), F.col(dst)
    e0 = edges.select(a.alias("a"), b.alias("b"))
    # one canonical materialization (keep=True: read by the final
    # verification after ALL rounds, so exempt from round rotation):
    # the input lineage may be expensive (a pair self-join, an Arrow
    # scorer like damerau_pairs) and every round — plus the final
    # verification — must read storage, not recompute it
    e_init = cutter.cut(
        e0.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("hi"),
                F.least("a", "b").alias("lo"))
        .distinct(),
        eager=True, keep=True,
    )
    nodes = cutter.cut(
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .distinct(),
        eager=True, keep=True,
    )

    e = e_init
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        # ---- large-star: every node's larger neighbors hook onto the
        # min of its closed neighborhood
        nbrs = e.select(F.col("hi").alias("node"),
                        F.col("lo").alias("nbr")).unionByName(
            e.select(F.col("lo").alias("node"), F.col("hi").alias("nbr")))
        mins = nbrs.groupBy("node").agg(F.min("nbr").alias("__mn"))
        mins = mins.select(
            "node", F.least(F.col("__mn"), F.col("node")).alias("m"))
        e = (
            nbrs.join(mins, "node")
            .filter(F.col("nbr") > F.col("node"))
            .select(F.col("nbr").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # ---- small-star: each node plus its smaller neighbors hook
        # onto the smallest of them. Edges are canonical (hi > lo), so
        # grouping by hi yields exactly the smaller-neighbor set; the
        # row carrying the min emits the (hi, m) hook, every other row
        # re-hooks its lo
        sm = e.groupBy("hi").agg(F.min("lo").alias("m"))
        e = cutter.cut(
            e.join(sm, "hi")
            .select(
                F.when(F.col("lo") == F.col("m"), F.col("hi"))
                .otherwise(F.col("lo")).alias("hi"),
                F.col("m").alias("lo"),
            )
            .filter(F.col("hi") != F.col("lo"))
            .distinct(),
            # cut lineage growth; LAZY so the signature probe below
            # materializes the cut in the same job
            eager=False,
        )
        # 31-bit folded hash: a raw xxhash64 sum overflows int64 under
        # ANSI; (count, sum of 2^31-bounded hashes) stays exact to
        # ~4e9 edges and the verification pass backstops collisions
        row = e.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.pmod(F.xxhash64("hi", "lo"),
                         F.lit(2_147_483_647))).alias("h")).first()
        sig = (row["c"], row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components: edge set still changing after "
            f"{max_iter} star-contraction rounds — raise max_iter")

    # at the fixpoint e is a star forest: hi -> component min. The
    # defensive min() collapses would-be duplicate hooks; roots and
    # isolated nodes label themselves.
    star = e.groupBy("hi").agg(F.min("lo").alias("__label"))
    labels = (
        nodes.join(star, nodes["node"] == star["hi"], "left")
        .select("node",
                F.coalesce("__label", F.col("node")).alias("component"))
    )
    # loud-wrongness guard: every INPUT edge must land inside one
    # component (reads the checkpointed canonical edges — one cheap
    # job, no lineage replay)
    la = labels.select(F.col("node").alias("hi"),
                       F.col("component").alias("__ca"))
    lb = labels.select(F.col("node").alias("lo"),
                       F.col("component").alias("__cb"))
    bad = (e_init.join(la, "hi").join(lb, "lo")
           .filter(F.col("__ca") != F.col("__cb")).count())
    if bad:
        raise RuntimeError(
            f"connected_components: {bad} input edge(s) cross output "
            f"components — star contraction produced a wrong partition")
    return labels


def embedding_neardup(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH blocking.

    Rows whose sign-pattern over ``num_planes`` random hyperplanes matches
    are candidates; exact cosine verifies within blocks. One shuffle on the
    16-bit sketch; the verification join is per-bucket.
    """
    from deltalake_spark.operators.similarity import cosine_expr, rh_sketch

    dim = df.select(F.size(F.col(vec_col))).first()[0]
    sk = rh_sketch(F.col(vec_col), dim=dim, num_planes=num_planes, seed=seed)
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                     sk.alias("__sk"))
    a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("va"),
                    F.col("__sk").alias("sk"))
    b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("vb"),
                    F.col("__sk").alias("sk"))
    return (
        a.join(b, "sk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    cluster_col: str = "cluster",
    keep_col: str = "kept",
    materialize: bool = True,
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings by nearest centroid, then drop a
    row when a *lower-id* row in the same cluster is semantically identical
    (cosine >= threshold). Keeping the minimum id per duplicate set is the
    deterministic stand-in for the paper's keep-one-representative rule.

    Returns the input plus ``cluster`` and a boolean ``kept``.

    Scale shape: assignment is a map-only JVM expression
    (:func:`~deltalake_spark.operators.similarity.cluster_assign`); the
    duplicate scan is a self-equi-join on the cluster id — one hash shuffle,
    never a cross join. Per-cluster work is quadratic in cluster size, so
    the codebook must grow with the corpus (the paper uses n/k ≈ 100–200
    rows per cluster; centroids stay KB-scale metadata regardless). Skewed
    clusters are the operator's known hazard: ``max_cluster`` caps the
    pair scan by letting only each cluster's ``max_cluster`` lowest-id
    rows act as the keep-candidate (lower-id) side of the join — the
    ``max_bucket`` pattern from :func:`minhash_lsh_candidates`. Pairs per
    cluster drop from O(n²) to O(n·max_cluster); a hot cluster can no
    longer stall the stage. Results are identical whenever every cluster
    has ≤ ``max_cluster`` rows (the paper's n/k sizing); beyond the cap a
    duplicate is missed only when its sole near-twin ranks past position
    ``max_cluster`` — hot clusters in practice are boilerplate whose
    duplicates are mutual, so the lowest-id members already cover them.
    """
    from deltalake_spark.operators.similarity import (
        cluster_assign,
        dot_expr,
        l2_norm_expr,
    )

    assigned = cluster_assign(df, centroids, vec_col=vec_col,
                              cluster_col=cluster_col)
    if materialize:
        # the assignment feeds THREE self-join branches; without a cut
        # Catalyst re-optimizes and re-evaluates the k-arm codebook
        # expression per branch (measured 3.6s -> 1.0s warm at sf0.1,
        # k=32). localCheckpoint materializes the assignment once —
        # which is how you'd run a pair scan at 100 TB anyway. Eager
        # (like connected_components): deferred materialization fires
        # inside a later job after the source plan's SQL metrics are
        # GC'd, spamming benign-but-scary accumulator errors. Pass
        # materialize=False to keep the plan fully lazy/inspectable.
        assigned = assigned.localCheckpoint(eager=True)
    # norms once per ROW, not per pair: cosine = dot/(nx*ny) is the same
    # arithmetic as cosine_expr, but the per-pair fold work drops from
    # three array folds to one (the dot)
    base = assigned.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        l2_norm_expr(F.col(vec_col)).alias("__n"),
    )
    x = base.select(F.col("__c"), F.col("__id").alias("__xid"),
                    F.col("__v").alias("__xv"), F.col("__n").alias("__xn"))
    y_base = base
    if max_cluster is not None:
        # keep-candidate side capped to the cluster's lowest ids; the
        # rank window partitions on the same key as the join, so the
        # exchange is reused rather than added
        w = Window.partitionBy("__c").orderBy("__id")
        y_base = (base.withColumn("__rk", F.row_number().over(w))
                  .filter(F.col("__rk") <= max_cluster).drop("__rk"))
    y = y_base.select(F.col("__c"), F.col("__id").alias("__yid"),
                      F.col("__v").alias("__yv"), F.col("__n").alias("__yn"))
    cos = dot_expr(F.col("__xv"), F.col("__yv")) / (
        F.col("__xn") * F.col("__yn"))
    dropped = (
        x.join(y, "__c")
        .filter(F.col("__yid") < F.col("__xid"))
        .filter(F.round(cos, 6) >= threshold)
        .select(F.col("__xid").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.join(dropped, id_col, "left")
        .withColumn(keep_col, F.col("__dup").isNull())
        .drop("__dup")
    )


def word_shingles(text_col: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingle STRINGS (not hashes — see
    :func:`word_shingle_hashes` for the hashed variant). The exact,
    SQL-portable token set for :func:`prefix_jaccard_join`."""
    toks = F.split(F.trim(text_col), " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)) - 1
                   + F.when(n >= k, 1).otherwise(0)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.array_distinct(F.when(n >= k, grams).otherwise(
        F.array().cast("array<string>")))


def prefix_jaccard_join(
    df: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """PPJoin-style prefix-filtered EXACT Jaccard similarity join:
    every unordered pair with ``J(x, y) >= num/den``, no blocking key
    needed, no approximation anywhere — the candidate generation is
    provably complete and the verification is exact.

    The classic set-similarity-join machinery (Chaudhuri/Bayardo
    prefix filter; Xiao et al.'s PPJoin positional filter),
    Spark-shaped:

    1. **Rarity order.** Rarest-first = the composite sort key
       ``(token_freq, token)``. Only the per-doc ORDER matters for
       completeness (any consistent total order works), so no global
       integer rank is ever materialized — one vocabulary-count
       aggregate, zero driver state.
    2. **Prefix.** A pair with J >= α shares >= ⌈α·max(|x|,|y|)⌉
       tokens, so (pigeonhole under ANY total order) their prefixes of
       length ``p = n - ⌈α·n⌉ + 1`` share at least one token. Prefix
       lengths use pure integer math (``⌈α·n⌉ = (num·n + den - 1)
       div den``) — no float thresholds anywhere.
    3. **Candidates.** One token-keyed equi-join of PREFIXES only.
       Rarest-first ordering puts the longest posting lists outside
       every prefix — this is what bounds the join at scale, and it
       is also why a blocking key becomes unnecessary.
    4. **Size + positional filters**, on the raw join output BEFORE
       the pair-dedup shuffle: ``num·|x| <= den·|y|`` both ways, and
       the PPJoin bound ``overlap <= 1 + min(|x|-i, |y|-j)`` at the
       pair's first shared token — all integer arithmetic.
    5. **Exact verify.** Each surviving pair joins its two DISTINCT
       token arrays and counts the true intersection with one
       map-side ``array_intersect`` (no re-explode, no groupBy); the
       threshold test is the exact integer
       ``den·c >= num·(|x|+|y|-c)``.

    Returns ``(id_a, id_b, n_a, n_b, inter, jaccard)`` with
    ``jaccard`` = one deterministic IEEE division.

    Caller contract (cache lifetime): the operator pins ``tok`` and
    ``sizes`` with ``persist()`` (multi-branch reuse); they stay
    cached until the caller materializes the result. In a long-lived
    session, materialize and then call
    :func:`deltalake_spark.session.release_caches` to drop them
    (bench.py's storage stays flat this way); tests pin this via
    ``cached_rdd_count``.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a fraction in (0, 1]")
    num, den = int(threshold_num), int(threshold_den)

    df = spread_narrow_input(df)

    tok = df.select(F.col(id_col).alias("did"),
                    F.explode(F.col(tokens_col)).alias("w")) \
        .distinct().persist()
    sizes = tok.groupBy("did").agg(F.count(F.lit(1)).alias("n"))
    sizes = sizes.persist()

    # --- rarity order = the composite key (f, w) directly. Only the
    # per-doc ORDER matters for prefix completeness (any total order
    # works), so no global integer rank is ever materialized — the r5
    # version's distributed rank machinery (range repartition + offset
    # prefix + a driver collect per call) bought nothing the composite
    # sort key doesn't give for free.
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))

    # --- per-doc prefix under the rarity order; keep the position
    # (__rn) for the positional filter and the size for the length
    # filter so the candidate stage prunes BEFORE deduplicating
    wdoc = Window.partitionBy("did").orderBy("f", "w")
    required = F.expr(f"({num} * n + {den} - 1) div {den}")
    prefix = (
        tok.join(freq, "w")
        .join(sizes, "did")
        .withColumn("__rn", F.row_number().over(wdoc))
        .filter(F.col("__rn") <= F.col("n") - required + 1)
        .select("did", "w", "n", "__rn")
    )

    # --- candidates: prefix x prefix on the shared (rare) token.
    # Both filters run on the RAW join output — before the distinct —
    # so pairs that can't meet the threshold never pay the dedup
    # shuffle, and carrying (n_a, n_b) through the distinct replaces
    # the two post-distinct joins back to `sizes` entirely.
    pa = prefix.select(F.col("did").alias("id_a"), "w",
                       F.col("n").alias("n_a"),
                       F.col("__rn").alias("__ra"))
    pb = prefix.select(F.col("did").alias("id_b"), "w",
                       F.col("n").alias("n_b"),
                       F.col("__rn").alias("__rb"))
    # PPJoin positional filter: at a pair's FIRST shared token (rarity
    # order, positions i, j) no earlier tokens are shared, so
    # overlap <= 1 + min(n_a - i, n_b - j); J >= num/den needs
    # overlap >= ceil(num*(n_a+n_b)/(num+den)). A qualifying pair's
    # first-match row always passes (bound >= true overlap >= t), so
    # dropping later rows that fail it keeps completeness — integer
    # form: (num+den)*(1+min) >= num*(n_a+n_b).
    pos_ok = (
        (num + den)
        * (1 + F.least(F.col("n_a") - F.col("__ra"),
                       F.col("n_b") - F.col("__rb")))
        >= num * (F.col("n_a") + F.col("n_b"))
    )
    cand = (
        pa.join(pb, "w")
        .filter((F.col("id_a") < F.col("id_b"))
                & (num * F.col("n_a") <= den * F.col("n_b"))
                & (num * F.col("n_b") <= den * F.col("n_a"))
                & pos_ok)
        .select("id_a", "id_b", "n_a", "n_b").distinct()
    )

    # --- exact verification over the candidate set only: join each
    # side's DISTINCT token array (map-side `array_intersect`, one
    # JVM expression per pair) instead of re-exploding `tok` through a
    # token-keyed shuffle + groupBy — the pruned candidate stream is
    # orders of magnitude smaller than its exploded token stream
    docs = df.select(F.col(id_col).alias("did"),
                     F.array_distinct(F.col(tokens_col)).alias("__tk"))
    da = docs.select(F.col("did").alias("id_a"),
                     F.col("__tk").alias("__ta"))
    db = docs.select(F.col("did").alias("id_b"),
                     F.col("__tk").alias("__tb"))
    inter = (
        cand.join(da, "id_a").join(db, "id_b")
        .withColumn("inter",
                    F.size(F.array_intersect("__ta", "__tb"))
                    .cast("long"))
        .drop("__ta", "__tb")
    )
    uni = F.col("n_a") + F.col("n_b") - F.col("inter")
    return (
        inter.filter(den * F.col("inter") >= num * uni)
        .select("id_a", "id_b", "n_a", "n_b", "inter",
                (F.col("inter").cast("double") / uni).alias("jaccard"))
    )


def prefix_containment_join(
    df: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """Prefix-filtered EXACT containment join: every ORDERED pair
    (A, B), A != B, with ``|A ∩ B| / |A| >= num/den`` — "A is mostly
    inside B", the asymmetric near-dup/quote/decontamination question
    Jaccard misses (a paragraph lifted into a long document scores
    tiny Jaccard but containment ~1).

    Machinery mirrors :func:`prefix_jaccard_join` with the
    containment-specific bounds:

    - prefix: A must share ``>= ceil(α·|A|)`` tokens with B, so A's
      rarest-first prefix of length ``|A| − ceil(α·|A|) + 1`` hits at
      least one shared token (pigeonhole) — but B contributes its
      FULL token list (containment has no symmetric prefix bound);
      rarest-first keeps the probed posting lists short anyway.
    - size filter: ``|B| >= ceil(α·|A|)`` (the intersection cannot
      exceed |B|), applied before the pair dedup.
    - exact verify: map-side ``array_intersect`` on the two distinct
      token arrays; threshold test ``den·inter >= num·|A|`` in pure
      integers.

    Returns ``(id_a, id_b, n_a, n_b, inter, containment)`` where
    ``containment`` is ONE IEEE division. Same caller cache contract
    as prefix_jaccard_join (tok/sizes pins; release_caches after
    materializing).
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a fraction in (0, 1]")
    num, den = int(threshold_num), int(threshold_den)

    df = spread_narrow_input(df)

    tok = df.select(F.col(id_col).alias("did"),
                    F.explode(F.col(tokens_col)).alias("w")) \
        .distinct().persist()
    sizes = tok.groupBy("did").agg(F.count(F.lit(1)).alias("n"))
    sizes = sizes.persist()
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))

    wdoc = Window.partitionBy("did").orderBy("f", "w")
    required = F.expr(f"({num} * n + {den} - 1) div {den}")
    prefix = (
        tok.join(freq, "w")
        .join(sizes, "did")
        .withColumn("__rn", F.row_number().over(wdoc))
        .filter(F.col("__rn") <= F.col("n") - required + 1)
        .select("did", "w", "n")
    )

    pa = prefix.select(F.col("did").alias("id_a"), "w",
                       F.col("n").alias("n_a"))
    tb = tok.join(sizes, "did").select(
        F.col("did").alias("id_b"), "w", F.col("n").alias("n_b"))
    cand = (
        pa.join(tb, "w")
        .filter((F.col("id_a") != F.col("id_b"))
                # |B| >= ceil(α|A|): den*|B| >= num*|A| is implied by
                # den*|B| >= den*ceil(...) — use the exact form
                & (den * F.col("n_b") >= num * F.col("n_a")))
        .select("id_a", "id_b", "n_a", "n_b").distinct()
    )

    docs = df.select(F.col(id_col).alias("did"),
                     F.array_distinct(F.col(tokens_col)).alias("__tk"))
    da = docs.select(F.col("did").alias("id_a"),
                     F.col("__tk").alias("__ta"))
    db = docs.select(F.col("did").alias("id_b"),
                     F.col("__tk").alias("__tb"))
    inter = (
        cand.join(da, "id_a").join(db, "id_b")
        .withColumn("inter",
                    F.size(F.array_intersect("__ta", "__tb"))
                    .cast("long"))
        .drop("__ta", "__tb")
    )
    return (
        inter.filter(den * F.col("inter") >= num * F.col("n_a"))
        .select("id_a", "id_b", "n_a", "n_b", "inter",
                (F.col("inter").cast("double")
                 / F.col("n_a").cast("double")).alias("containment"))
    )
