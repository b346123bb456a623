"""Single-pass data-quality audit (Deequ-style constraint checking).

The pre-training validation step every large pipeline runs before a
corpus ships: completeness, uniqueness, ranges, value sets, regex
shape. All checks for a table compile into ONE aggregation pass —
constraint count doesn't multiply scans — and uniqueness piggybacks a
second count-distinct branch of the same scan. Exact integer outputs,
so results are reproducible and SQL-twinned.

Check spec (list of dicts):
  {"col": c, "check": "not_null"}
  {"col": c, "check": "unique"}
  {"col": c, "check": "range", "min": lo, "max": hi}   (inclusive)
  {"col": c, "check": "in_set", "values": [...]}
  {"col": c, "check": "regex", "pattern": r"..."}

Output: one row per check — (col, check, n_rows, n_violations, passed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["audit_checks", "k_anonymity"]


def _violation_expr(spec: dict):
    col = F.col(spec["col"])
    kind = spec["check"]
    if kind == "not_null":
        return col.isNull()
    if kind == "range":
        lo, hi = spec["min"], spec["max"]
        return col.isNull() | (col < F.lit(lo)) | (col > F.lit(hi))
    if kind == "in_set":
        return col.isNull() | ~col.isin(list(spec["values"]))
    if kind == "regex":
        return col.isNull() | ~col.rlike(spec["pattern"])
    raise ValueError(f"unknown check kind {kind!r}")


def audit_checks(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run all checks in one aggregation pass (plus one count-distinct
    branch when any 'unique' check is present). Returns
    ``(col, check, n_rows, n_violations, passed)`` rows in spec
    order."""
    if not checks:
        raise ValueError("checks must be non-empty")
    row_checks = [c for c in checks if c["check"] != "unique"]
    uni_checks = [c for c in checks if c["check"] == "unique"]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, spec in enumerate(row_checks):
        aggs.append(
            F.sum(_violation_expr(spec).cast("long")).alias(f"__v{i}"))
    for i, spec in enumerate(uni_checks):
        # duplicates = rows - distinct values - (0 if no nulls... nulls
        # count as violations of uniqueness here: distinct ignores null)
        aggs.append(F.count_distinct(F.col(spec["col"]))
                    .alias(f"__u{i}"))
    agg = df.agg(*aggs)

    # unpack to one row per check via stack (single JVM projection)
    parts = []
    for i, spec in enumerate(row_checks):
        parts.append(
            (spec["col"], spec["check"], F.col(f"__v{i}")))
    for i, spec in enumerate(uni_checks):
        parts.append(
            (spec["col"], "unique", F.col("__n") - F.col(f"__u{i}")))
    # keep original spec order
    order = {(c["col"], c["check"]): j for j, c in enumerate(checks)}
    parts.sort(key=lambda p: order[(p[0], p[1])])
    stacked = F.array(*[
        F.struct(
            F.lit(colname).alias("col"),
            F.lit(kind).alias("check"),
            F.col("__n").alias("n_rows"),
            viol.cast("long").alias("n_violations"),
        )
        for colname, kind, viol in parts
    ])
    out = agg.select(F.explode(stacked).alias("r")).select(
        "r.col", "r.check", "r.n_rows", "r.n_violations")
    return out.withColumn("passed", F.col("n_violations") == 0)


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
) -> DataFrame:
    """One-pass column profiler: ``(column, n_rows, n_null,
    n_distinct, min_value, max_value)`` per profiled column, extrema
    cast to string for a uniform schema.

    All per-column counts/extrema fold into ONE aggregation; the exact
    count-distincts share the same scan through Spark's expand path
    (one shuffle total, width = profiled columns — swap in
    approx_count_distinct when profiling hundreds of columns of a
    100 TB table). The standard "what is in this table" step before
    audits/training runs.
    """
    names = df.columns if cols is None else list(cols)
    if not names:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(names):
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null{i}"),
            F.count_distinct(col).alias(f"__dist{i}"),
            F.min(col).cast("string").alias(f"__min{i}"),
            F.max(col).cast("string").alias(f"__max{i}"),
        ]
    agg = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null{i}").alias("n_null"),
            F.col(f"__dist{i}").alias("n_distinct"),
            F.col(f"__min{i}").alias("min_value"),
            F.col(f"__max{i}").alias("max_value"),
        )
        for i, c in enumerate(names)
    ])
    return agg.select(F.explode(rows).alias("r")).select(
        "r.column", "r.n_rows", "r.n_null", "r.n_distinct",
        "r.min_value", "r.max_value")


def equidepth_histogram(
    df: DataFrame,
    *,
    col: str,
    tiebreak: str,
    buckets: int = 10,
    partitions: int = 32,
) -> DataFrame:
    """EXACT equi-depth histogram: bucket b holds rows with global rank
    in [b*n/B, (b+1)*n/B) under the total order (col, tiebreak) —
    every bucket within one row of n/B, with exact per-bucket min/max.

    Scale shape: a naive ``ntile() OVER (ORDER BY ...)`` funnels the
    WHOLE table through one partition. This computes exact global ranks
    distributively instead: range-repartition on the sort key,
    partition-LOCAL row_number, plus a collected per-partition count
    prefix (``partitions`` integers — driver-side KB) → global rank =
    local rank + partition offset. The output is a pure function of the
    data (ranks are unique thanks to the tiebreak), independent of
    where the sampled range boundaries land.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    from pyspark.sql.window import Window

    # persist the ranged layout: repartitionByRange SAMPLES boundaries
    # per job, so without the pin the count job and the rank job could
    # see different partition layouts and the offsets would lie
    ranged = df.select(col, tiebreak).repartitionByRange(
        partitions, F.col(col), F.col(tiebreak)).persist()
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    local = with_pid.withColumn(
        "__lr",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy(col, tiebreak)))
    counts = {r["__pid"]: r["c"] for r in
              with_pid.groupBy("__pid").agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    n = sum(counts.values())
    if n == 0:
        raise ValueError("empty input")
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.lit(0)
    for pid, off in offsets.items():
        off_expr = F.when(F.col("__pid") == pid, F.lit(off)) \
            .otherwise(off_expr)
    ranked = local.withColumn("__rank", F.col("__lr") + off_expr)
    bucket = F.expr(f"(( __rank - 1) * {buckets}L) div {n}L")
    return (
        ranked.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
        )
    )


def k_anonymity(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """K-anonymity audit over a set of quasi-identifier columns — the
    re-identification risk check a corpus gets before release: every
    row must share its quasi-identifier combination (its equivalence
    class) with at least ``k - 1`` others, or an attacker joining on
    those columns can single people out.

    Rather than one opaque pass/fail, this returns the equivalence-
    class SIZE HISTOGRAM — one row per distinct class size with how
    many classes/rows sit at that size and whether that size violates
    ``k`` — so the caller reads both the anonymity level (the smallest
    size) and the full risk mass at a glance. All outputs are exact
    integers.

    Scale shape: one groupBy over the quasi-identifier key (partial
    map-side counts apply), then a second tiny groupBy over the CLASS
    frame (rows = number of classes, already reduced); the size
    histogram it returns is at most |distinct sizes| rows. NULL in a
    quasi column is its own value (SQL GROUP BY semantics) — NULL
    groups re-identify just like any other.

    Output: ``(class_size, n_classes, n_rows, at_risk)`` ordered by
    ``class_size``.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("class_size"))
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .withColumn("n_rows", F.col("class_size") * F.col("n_classes"))
        .withColumn("at_risk", F.col("class_size") < F.lit(int(k)))
        .orderBy("class_size")
    )
