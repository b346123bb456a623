"""SparkSession factory with scale-oriented defaults.

Tests run on local[N] but every knob here is chosen for the 100 TB /
1000-executor design point:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting);
- shuffle partitions sized for the local fixture scale, overridable — on a
  real cluster this would be ~2-3x total cores or left to AQE;
- Arrow transfers on (pandas UDF hot paths are Arrow-batched);
- broadcast threshold left at default 10 MB so small dims (region/nation/
  supplier) broadcast automatically; big joins shuffle on their keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deltalake-spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    # Local-mode heap sizing (guide §5): in local[N] the ONE driver JVM
    # holds every executor thread's execution memory, so a fixed 8g
    # heap at N=32 leaves ~150 MB of execution memory per concurrent
    # task and the session spends its time in GC — measured 2-5x wall
    # inflation on the TPC-H headline gates (q5 10.2 s → 1.8 s at
    # sf0.1 after resizing). Default: ~1 GB per core, bounded by a
    # quarter of machine RAM, floor at the old 8 GB. SPARK_DRIVER_MEM
    # still overrides; on a real cluster the driver does no data work
    # and executors size their own heaps (spark.executor.memory), so
    # this default only governs local mode.
    mem = os.environ.get("SPARK_DRIVER_MEM")
    if not mem:
        try:
            total_gb = (os.sysconf("SC_PHYS_PAGES")
                        * os.sysconf("SC_PAGE_SIZE")) // (1024 ** 3)
        except (ValueError, OSError, AttributeError):
            total_gb = 0
        n = cpus or (os.cpu_count() or 8)
        mem = f"{max(8, min(n, total_gb // 4)) if total_gb else 8}g"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", mem)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # events.parquet carries TIMESTAMP(NANOS); read as long (ns since
        # epoch) instead of failing — convert explicitly where needed
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def release_caches(spark: SparkSession) -> int:
    """Unpersist every cached DataFrame/RDD in the session and return
    how many persistent RDDs were dropped.

    Several operators pin intermediate frames with ``persist()`` so
    multi-branch plans agree on sampled partition layouts (range
    boundaries, iterative lineage cuts). Those pins must outlive the
    operator call — the returned DataFrame is lazy — so the CALLER owns
    cleanup: materialize the result, then call this between queries in
    a long-lived session (bench.py does) to keep storage memory flat.
    Do NOT call it while other queries on the same session are still
    running — clearing a pin mid-flight forces a recompute that may
    resample range boundaries inconsistently between plan branches.
    """
    jsc = spark.sparkContext._jsc.sc()
    n = jsc.getPersistentRDDs().size()
    spark.catalog.clearCache()
    # clearCache drops CacheManager (DataFrame) entries; sweep any
    # RDD-level leftovers too so the count really reaches zero
    remaining = jsc.getPersistentRDDs()
    it = remaining.values().iterator()
    while it.hasNext():
        it.next().unpersist(False)
    return n


def cached_rdd_count(spark: SparkSession) -> int:
    """Number of persistent RDDs the JVM currently tracks (storage-leak
    probe for tests and long-session monitoring)."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def ts_to_long_nanos(df, col: str = "ts"):
    """Normalize a timestamp column to epoch nanoseconds (long).

    The fixture ``events.ts`` is parquet TIMESTAMP(NANOS). Depending on
    the Spark version it surfaces either as a long (when the legacy
    ``nanosAsLong`` conf is honored) or as ``timestamp``/``timestamp_ntz``
    truncated to microseconds (Spark ≥4.1 ignores the legacy conf). All
    engine code works in the integer-nanosecond domain, so convert the
    timestamp forms to ``unix_micros * 1000`` — the same µs truncation
    DuckDB applies when it reads the file, keeping oracle values aligned.
    """
    from pyspark.sql import functions as F

    if col not in df.columns:
        return df
    dtype = dict(df.dtypes)[col]
    if not dtype.startswith("timestamp"):
        return df  # already long nanos
    if dtype == "timestamp_ntz":
        # pure NTZ arithmetic: naive wall clock treated as UTC (exactly
        # what DuckDB's epoch_ns does) with NO session-timezone
        # dependence — a cast to TIMESTAMP would shift by the session tz
        expr = F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`) * 1000"
        )
    else:
        expr = F.unix_micros(F.col(col)) * F.lit(1000)
    return df.withColumn(col, expr)


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load fixture tables as temp views + return dict of DataFrames."""
    tables = {}
    all_names = names or (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for name in all_names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            df = ts_to_long_nanos(df)
        df.createOrReplaceTempView(name)
        tables[name] = df
    return tables
