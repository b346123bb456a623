"""Corpus mixing operators: temperature-weighted source mixing,
token-budget sampling, and deterministic global shuffle — the final
"assemble the training mix" stage of an LLM data pipeline (after
dedup/curation, before tokenization). Engine-native extensions (the
reference has no corpus ops).

Determinism contract: every operator orders rows by a PORTABLE integer
priority hash (Knuth multiplicative, ``((id + seed) * 2654435761) mod
2^32``) instead of ``rand()``/``xxhash64`` so the DuckDB oracle can
reproduce selections bit-for-bit. Production corpora with ids beyond
~2^31 should switch the priority to ``xxhash64(id, seed)`` (same plan
shape; forfeits only oracle portability — the multiplicative form
overflows int64 before the mod at extreme ids).

Scale shapes:
* Mixture weights aggregate to one row PER SOURCE — KB-scale metadata
  regardless of corpus size; the normalizing window runs over that tiny
  frame only.
* Budget sampling needs a per-source running token sum in priority
  order. A naive global window serializes each source onto one task, so
  the implementation does a DISTRIBUTED PREFIX SUM: hash-bucket the
  priority space (high byte -> 256 buckets), aggregate per-bucket token
  totals (tiny), window the cumulative offsets over that tiny frame,
  broadcast them back, and run the running sum WITHIN each (source,
  bucket) partition. Identical output to the sequential window; 256-way
  parallel per source at any corpus size.
* Deterministic shuffle is a plain ``repartitionByRange``/sort on the
  priority — Spark's range-partitioned sort, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 * (golden ratio - 1), Knuth multiplicative


def doc_priority(id_col: Column, seed: int = 0) -> Column:
    """Portable deterministic pseudo-random priority in [0, 2^32)."""
    return F.pmod((id_col + F.lit(seed)) * F.lit(KNUTH),
                  F.lit(2**32)).cast("long")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (the corpus-budget unit)."""
    return F.size(
        F.filter(F.split(text_col, " "), lambda t: t != F.lit("")))


def mixture_weights(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture weights per source: ``w_s ∝
    tokens_s^alpha`` normalized to 1 (alpha<1 upsamples small sources —
    the multilingual-LM sampling rule). Returns one row per source with
    ``n_docs``, ``tokens``, ``weight``. The normalizing sum runs over
    the per-source frame (one row per source), never the corpus."""
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("tokens"),
    )
    wnorm = Window.partitionBy()
    raw = F.pow(F.col("tokens").cast("double"), F.lit(float(alpha)))
    return per.withColumn(
        "weight", raw / F.sum(raw).over(wnorm)
    ).orderBy(group_col)


def proportional_budgets(
    df: DataFrame,
    total_budget: int,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Integer-exact proportional token budgets: ``budget_s =
    (total_budget * tokens_s) DIV total_tokens``. Pure int64 arithmetic
    so any engine reproduces it exactly (at >~10^13 total tokens the
    product needs decimal(38) — swap the casts, same plan). One row per
    source."""
    per = df.groupBy(group_col).agg(
        F.sum(token_count(F.col(text_col))).alias("tokens"))
    wnorm = Window.partitionBy()
    return per.withColumn(
        "budget",
        F.expr(f"{int(total_budget)} * tokens DIV "
               "(sum(tokens) OVER ())").cast("long"),
    )


def temperature_budgets(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    budget_num: int = 2,
    budget_den: int = 5,
) -> DataFrame:
    """Integer-exact temperature (alpha=0.5) token budgets: scale each
    source by ``floor(sqrt(tokens_s))`` — for n < 2^52, IEEE
    correctly-rounded sqrt makes ``floor(sqrt(n))`` bit-exact in every
    engine, so unlike ``pow(n, alpha)`` the allocation is portable —
    and split ``budget_num/budget_den`` of the corpus's total tokens
    proportionally to those scales with pure int64 arithmetic:

        total    = sum(tokens) * budget_num DIV budget_den
        budget_s = total * sqrt_s DIV sum(sqrt_s)

    sqrt-scaling upsamples small sources relative to proportional
    allocation (the standard multilingual temperature-sampling rule).
    One row per source; every window runs over that tiny frame."""
    per = df.groupBy(group_col).agg(
        F.sum(token_count(F.col(text_col))).alias("tokens"))
    return per.select(
        group_col,
        "tokens",
        F.expr("cast(floor(sqrt(tokens)) as bigint)").alias("scale"),
        F.expr(
            f"(sum(tokens) OVER ()) * {int(budget_num)} "
            f"DIV {int(budget_den)}"
        ).alias("total_budget"),
    ).select(
        group_col,
        "tokens",
        "scale",
        F.expr("total_budget * scale DIV (sum(scale) OVER ())")
        .cast("long").alias("budget"),
    )


def _bucketed_running_tokens(
    df: DataFrame,
    *,
    group_cols: "list[str]",
    id_col: str,
    text_col: str,
    seed: int,
    n_buckets: int,
) -> DataFrame:
    """Shared distributed prefix sum over the priority order.

    Adds ``__tok``, ``__pri``, ``__bkt``, ``__off``, ``__cum`` (exact
    running token total per ``group_cols`` in (priority, id) order).
    Per-(group, bucket) totals are windowed into cumulative offsets on
    a tiny groups×``n_buckets`` frame and broadcast back; the running
    sum completes inside each bucket partition, so no single task ever
    scans a whole group. With ``group_cols=[]`` the prefix sum is
    corpus-global; the offsets window then keys on a column-derived
    constant (a bare literal would be constant-folded out of the
    partition spec and plan an unpartitioned window)."""
    shift = 2**32 // n_buckets
    base = df.withColumn("__tok", token_count(F.col(text_col))) \
        .withColumn("__pri", doc_priority(F.col(id_col), seed)) \
        .withColumn("__bkt", (F.col("__pri") / F.lit(shift))
                    .cast("long"))
    off_keys = (list(group_cols)
                or [(F.col("__bkt") * F.lit(0)).alias("__zero")])
    per_bucket = base.groupBy(*group_cols, "__bkt").agg(
        F.sum("__tok").alias("__bkt_tok"))
    w_off = (
        Window.partitionBy(*off_keys).orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.withColumn(
        "__off", F.coalesce(F.sum("__bkt_tok").over(w_off), F.lit(0))
    ).drop("__bkt_tok")
    w_in = (
        Window.partitionBy(*group_cols, "__bkt")
        .orderBy("__pri", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), [*group_cols, "__bkt"])
        .withColumn("__cum", F.col("__off") + F.sum("__tok").over(w_in))
    )


def sample_by_token_budget(
    df: DataFrame,
    budgets: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic per-source sampling up to a token budget: order
    each source's docs by priority hash and keep the maximal prefix
    whose cumulative token count stays within ``budgets.budget``.

    Distributed prefix sum (see module docstring): per-(source, bucket)
    token totals are windowed into cumulative offsets on a tiny frame
    (sources x ``n_buckets`` rows), broadcast back, and the running sum
    completes inside each bucket partition — no single-task source
    scans. Appends ``tok`` (doc tokens) and ``cum_tokens`` (exact
    running total including this doc), plus every non-key column of
    ``budgets`` (e.g. ``budget``/``tokens``) — carried through so
    callers don't re-join (and thereby re-compute) the budget frame."""
    cum = _bucketed_running_tokens(
        df, group_cols=[group_col], id_col=id_col, text_col=text_col,
        seed=seed, n_buckets=n_buckets)
    out = (
        cum.join(F.broadcast(budgets), group_col)
        .filter(F.col("__cum") <= F.col("budget"))
        .withColumnRenamed("__tok", "tok")
        .withColumnRenamed("__cum", "cum_tokens")
        .drop("__pri", "__bkt", "__off")
    )
    return out


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Reproducible global shuffle for training-order assignment: sort
    by the portable priority hash (ties broken by id). Spark plans this
    as a range-partitioned distributed sort — at 100 TB it is exactly
    the machinery of a sort-merge shuffle, with no driver hot spot.
    Appends the priority as ``shuffle_key``."""
    return (
        df.withColumn(
            "shuffle_key", doc_priority(F.col(id_col), seed))
        .orderBy("shuffle_key", id_col)
    )


def deterministic_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fractions: "dict[str, float] | None" = None,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by portable hash.

    Every large-corpus pipeline needs a split that is (a) stable across
    reruns and cluster layouts, (b) disjoint and exhaustive, and
    (c) assignable per-row with zero shuffle — ``rand()`` gives none of
    these under retry/re-partitioning. The priority hash maps each id
    to [0, 2^32); cumulative fraction boundaries carve that range, so a
    document's split is a pure projection of its id. Adding a new split
    later only moves ids at the carved boundary, and the same Knuth
    hash keeps the DuckDB oracle value-level (integer arithmetic only).
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    pri = doc_priority(F.col(id_col), seed)
    expr = None
    acc = 0.0
    # iterate in insertion order; last bucket catches the remainder so
    # float boundary arithmetic can never leave a row unassigned
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name] / total
        bound = int(acc * 2**32)
        cond = pri < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn(split_col, expr)


def assign_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_tokens: int,
    seed: int = 0,
    n_buckets: int = 256,
) -> DataFrame:
    """Assign docs to equal-token contiguous shards in training order.

    The last layout step of a training-data pipeline: after mixing and
    shuffling, the corpus is cut into shards of ``shard_tokens`` each,
    following the deterministic global order (priority hash, ties by
    id). A doc belongs to the shard where its span STARTS
    (``floor(exclusive_cumsum / shard_tokens)``), so shard boundaries
    never split reassembly order and the layout is reproducible
    anywhere.

    Scale shape: the global running token sum uses the same distributed
    prefix-sum as ``sample_by_token_budget`` — per-bucket totals (high
    byte of the priority) offset-summed on a ``n_buckets``-row frame,
    running sums completed inside bucket partitions. No single task
    ever sees the whole corpus; output adds ``shard_id``, ``tok``,
    ``cum_tokens``.
    """
    cum = _bucketed_running_tokens(
        df, group_cols=[], id_col=id_col, text_col=text_col,
        seed=seed, n_buckets=n_buckets)
    return (
        cum.withColumn(
            "shard_id",
            F.floor((F.col("__cum") - F.col("__tok"))
                    / F.lit(shard_tokens)).cast("long"))
        .withColumnRenamed("__tok", "tok")
        .withColumnRenamed("__cum", "cum_tokens")
        .drop("__pri", "__bkt", "__off")
    )


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weight_col: str,
    k: int,
    group_col: str | None = None,
    seed: int = 7,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis A-ES): each row gets priority ``u^(1/w)`` with ``u`` derived
    from the portable id hash; the top-k priorities are a weighted sample
    without replacement. The standard way to pick a quality- or
    length-weighted corpus subset reproducibly — ``rand()``-based
    sampling changes under retries and repartitioning, this never does.

    With ``group_col``, k rows per group (one window shuffle on the
    group key); without, a global top-k (TakeOrderedAndProject —
    per-partition heaps, no full sort). Rows with weight <= 0 or null
    are never sampled. Appends ``sample_rank``.
    """
    from pyspark.sql.window import Window

    u = (doc_priority(F.col(id_col), seed) + F.lit(0.5)) / F.lit(2.0**32)
    w = F.col(weight_col).cast("double")
    pri = F.when(w > 0.0, F.pow(u, F.lit(1.0) / w)).otherwise(F.lit(-1.0))
    scored = df.withColumn("__pri", pri).filter(F.col("__pri") >= 0.0)
    if group_col is None:
        # rank assigned after the take: global order is (pri desc, id)
        top = scored.orderBy(F.desc("__pri"), F.asc(id_col)).limit(k)
        wname = Window.orderBy(F.desc("__pri"), F.asc(id_col))
        return (
            top.withColumn("sample_rank", F.row_number().over(wname))
            .drop("__pri")
        )
    wname = Window.partitionBy(group_col).orderBy(
        F.desc("__pri"), F.asc(id_col))
    return (
        scored.withColumn("sample_rank", F.row_number().over(wname))
        .filter(F.col("sample_rank") <= k)
        .drop("__pri")
    )


def group_topfrac_filter(
    df: DataFrame,
    *,
    group_cols: list[str],
    score_col: str,
    tiebreak_col: str,
    keep_num: int,
    keep_den: int,
) -> DataFrame:
    """Per-group adaptive quality threshold: keep each group's top
    ``keep_num/keep_den`` fraction by ``score_col`` — the "top 30% by
    quality PER DOMAIN" curation rule. A single global threshold
    over-prunes clean domains and under-prunes noisy ones; ranking
    within the group adapts the cut to each domain's own score
    distribution.

    Exact-integer contract: the kept count is
    ``ceil(n · keep_num / keep_den)`` via pure integer arithmetic
    (``(n·num + den − 1) div den`` — at least one doc survives per
    non-empty group), and the rank orders by (score DESC,
    ``tiebreak_col`` ASC) — a TOTAL order, so the boundary is
    deterministic and a SQL engine replays membership exactly.

    One group-keyed window pass (rank and the group count share the
    same exchange). Returns the kept rows with ``__rank`` dropped.
    """
    from pyspark.sql import Window

    if keep_den <= 0 or not 0 < keep_num <= keep_den:
        raise ValueError("keep_num/keep_den must be in (0, 1]")
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(score_col), F.asc(tiebreak_col))
    wc = Window.partitionBy(*group_cols)
    ranked = df.withColumn("__rank", F.row_number().over(w)) \
        .withColumn("__n", F.count(F.lit(1)).over(wc))
    kept = ranked.filter(
        F.col("__rank") <= F.expr(
            f"(__n * {int(keep_num)}L + {int(keep_den) - 1}L)"
            f" div {int(keep_den)}L"))
    return kept.drop("__rank", "__n")
