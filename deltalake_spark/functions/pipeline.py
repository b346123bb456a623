"""Mongo-style aggregation pipelines → DataFrame transform chains.

Parity target: ``aggregate(docs, pipeline)`` in the reference
(/root/reference/src/query/index.ts:1722-1770). The reference executes each
stage eagerly against a JS array ($match → Array.filter, $group → Map-based
hash agg at src/query/index.ts:1429-1494, $sort → Array.sort, $unwind → row
explosion at 1549-1583). We instead *declare* the whole chain —
``filter → groupBy().agg() → select → orderBy → limit/offset → explode`` —
and let Catalyst re-optimize it globally (pushdown through the chain), then
execute it as distributed hash aggregation with map-side partial aggregation,
something the single-process reference cannot do.

Accumulators (src/query/index.ts:1206-1418):
  $sum $avg $min $max $first $last $push $addToSet $count $stdDevPop
  $stdDevSamp.
Semantics kept:
  - ``$sum: <constant>`` counts rows × constant (src/query/index.ts:1226-1232);
  - ``$stdDevSamp`` of a single value is null (src/query/index.ts:1394-1418)
    — Spark would return NaN, so we guard with a count>=2 CASE;
  - ``_id: None`` groups all rows (src/query/index.ts:1476-1480);
  - compound ``_id: {k:'$f', ...}`` produces a struct key (1481-1494).
Order-sensitive accumulators ($first/$last/$push) follow Spark's partition
order unless the caller sorts first — same caveat the reference documents.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deltalake_spark.errors import InvalidPipelineError
from deltalake_spark.functions.filters import translate_filter
from deltalake_spark.functions.projection import apply_projection

ARITHMETIC_OPS = {
    "$add": lambda a, b: a + b,
    "$subtract": lambda a, b: a - b,
    "$multiply": lambda a, b: a * b,
    "$divide": lambda a, b: a / b,
}

# single-argument expression operators (Mongo $project/$addFields
# surface; all compile to JVM built-ins, zero Python in the hot path)
UNARY_OPS = {
    "$toUpper": F.upper,
    "$toLower": F.lower,
    "$strLenCP": F.length,
    "$trim": lambda c: F.trim(c),
    "$abs": F.abs,
    "$ceil": F.ceil,
    "$floor": F.floor,
    "$sqrt": F.sqrt,
    "$ln": F.log,
    "$toString": lambda c: c.cast("string"),
    "$toInt": lambda c: c.cast("long"),
    "$toDouble": lambda c: c.cast("double"),
}

COMPARISON_OPS = {
    "$eq": lambda a, b: a == b,
    "$ne": lambda a, b: ~a.eqNullSafe(b),
    "$gt": lambda a, b: a > b,
    "$gte": lambda a, b: a >= b,
    "$lt": lambda a, b: a < b,
    "$lte": lambda a, b: a <= b,
}


def value_expr(operand: Any, env: Mapping[str, Column] | None = None) -> Column:
    """An accumulator/projection operand → Column.

    ``'$field'`` references (incl. dot paths), literals, and nested
    expressions. Beyond the reference's nested-$sum arithmetic
    (src/query/index.ts:1240-1249, generalized to all accumulators),
    the Mongo expression surface is covered: arithmetic ($add/
    $subtract/$multiply/$divide, variadic), string ($concat/$toUpper/
    $toLower/$substrCP/$strLenCP/$trim), numeric ($abs/$ceil/$floor/
    $sqrt/$ln/$round/$mod), conditional ($cond/$ifNull), comparison
    ($eq/$ne/$gt/$gte/$lt/$lte), casts ($toString/$toInt/$toDouble),
    and the extended surface in ``expr_ops`` (dates, arrays with
    $$var lambdas, $switch/$let, strings, math/trig, $convert).
    Every operator compiles to a Catalyst expression.

    ``env`` maps lambda/let variable names to Columns so ``"$$this"``/
    ``"$$value"``/``$let`` bindings resolve inside $map/$filter/$reduce
    bodies (dotted tails index into struct elements).
    """
    if isinstance(operand, str) and operand.startswith("$$"):
        parts = operand[2:].split(".")
        bound = (env or {}).get(parts[0])
        if bound is None:
            raise InvalidPipelineError(
                f"Unknown variable {operand!r} (in scope: "
                f"{sorted(env or {})}; $$ROOT/$$CURRENT are not "
                "supported — reference fields directly)")
        for field in parts[1:]:
            bound = bound[field]
        return bound
    if isinstance(operand, str) and operand.startswith("$"):
        return F.col(operand[1:])
    if isinstance(operand, Mapping):
        if len(operand) != 1:
            raise InvalidPipelineError(f"Bad expression operand: {operand!r}")
        op, args = next(iter(operand.items()))
        if op in ARITHMETIC_OPS:
            if not isinstance(args, Sequence) or len(args) < 2:
                raise InvalidPipelineError(f"{op} requires >=2 operands")
            result = value_expr(args[0], env)
            for a in args[1:]:
                result = ARITHMETIC_OPS[op](result, value_expr(a, env))
            return result
        if op in UNARY_OPS:
            return UNARY_OPS[op](value_expr(args, env))
        if op in COMPARISON_OPS:
            if not isinstance(args, Sequence) or len(args) != 2:
                raise InvalidPipelineError(f"{op} requires [a, b]")
            return COMPARISON_OPS[op](value_expr(args[0], env),
                                      value_expr(args[1], env))
        if op == "$concat":
            if not isinstance(args, Sequence) or len(args) < 2:
                raise InvalidPipelineError("$concat requires >=2 operands")
            return F.concat(*[value_expr(a, env) for a in args])
        if op == "$substrCP":
            if not isinstance(args, Sequence) or len(args) != 3:
                raise InvalidPipelineError(
                    "$substrCP requires [string, start, length]")
            # Mongo start is 0-based; Spark substring is 1-based
            return F.substring(
                value_expr(args[0], env),
                value_expr(args[1], env) + F.lit(1),
                value_expr(args[2], env),
            )
        if op == "$round":
            if not isinstance(args, Sequence) or len(args) != 2:
                raise InvalidPipelineError("$round requires [expr, place]")
            return F.round(value_expr(args[0], env), int(args[1]))
        if op == "$mod":
            if not isinstance(args, Sequence) or len(args) != 2:
                raise InvalidPipelineError("$mod requires [a, b]")
            return value_expr(args[0], env) % value_expr(args[1], env)
        if op == "$ifNull":
            if not isinstance(args, Sequence) or len(args) < 2:
                raise InvalidPipelineError("$ifNull requires >=2 operands")
            return F.coalesce(*[value_expr(a, env) for a in args])
        if op == "$cond":
            if isinstance(args, Mapping):
                parts = [args.get("if"), args.get("then"), args.get("else")]
            elif isinstance(args, Sequence) and len(args) == 3:
                parts = list(args)
            else:
                raise InvalidPipelineError(
                    "$cond requires [if, then, else] or {if, then, else}")
            return F.when(
                value_expr(parts[0], env), value_expr(parts[1], env)
            ).otherwise(value_expr(parts[2], env))
        from deltalake_spark.functions import expr_ops

        extended = expr_ops.build(op, args, env, value_expr)
        if extended is not None:
            return extended
        raise InvalidPipelineError(
            f"Unknown expression operator {op!r}. Supported: "
            f"{sorted([*ARITHMETIC_OPS, *UNARY_OPS, *COMPARISON_OPS, '$concat', '$substrCP', '$round', '$mod', '$ifNull', '$cond', *expr_ops.HANDLERS])}"
        )
    return F.lit(operand)


def _is_constant(operand: Any) -> bool:
    return not (
        (isinstance(operand, str) and operand.startswith("$"))
        or isinstance(operand, Mapping)
    )


def accumulator_expr(name: str, spec: Any) -> Column:
    """One output accumulator ``{<op>: <operand>}`` → aliased agg Column."""
    if not isinstance(spec, Mapping) or len(spec) != 1:
        raise InvalidPipelineError(
            f"Accumulator for {name!r} must be a single-op mapping, got {spec!r}"
        )
    op, operand = next(iter(spec.items()))
    if op == "$sum":
        if _is_constant(operand):
            # $sum: k  ≡  count(*) * k  (src/query/index.ts:1226-1232)
            expr = (F.count(F.lit(1)) * F.lit(operand)).cast("long") \
                if isinstance(operand, int) else F.count(F.lit(1)) * F.lit(operand)
        else:
            expr = F.sum(value_expr(operand))
    elif op == "$avg":
        expr = F.avg(value_expr(operand))
    elif op == "$min":
        expr = F.min(value_expr(operand))
    elif op == "$max":
        expr = F.max(value_expr(operand))
    elif op == "$first":
        expr = F.first(value_expr(operand))
    elif op == "$last":
        expr = F.last(value_expr(operand))
    elif op == "$push":
        expr = F.collect_list(value_expr(operand))
    elif op == "$addToSet":
        expr = F.collect_set(value_expr(operand))
    elif op == "$count":
        expr = F.count(F.lit(1))
    elif op == "$stdDevPop":
        expr = F.stddev_pop(value_expr(operand))
    elif op == "$stdDevSamp":
        v = value_expr(operand)
        # sample stddev of <2 values → null, not NaN
        expr = F.when(F.count(v) >= 2, F.stddev_samp(v))
    elif op == "$median":
        # engine-native extension (Mongo 7 accumulator): exact
        # interpolated median via the sort-based percentile aggregate
        expr = F.percentile(value_expr(operand), F.lit(0.5))
    elif op == "$percentile":
        if not isinstance(operand, Mapping) or "input" not in operand \
                or "p" not in operand:
            raise InvalidPipelineError(
                "$percentile requires {'input': expr, 'p': [fractions]}"
            )
        ps = list(operand["p"])
        if not ps or not all(0 <= p <= 1 for p in ps):
            raise InvalidPipelineError(
                "$percentile fractions must be in [0, 1]"
            )
        expr = F.percentile(
            value_expr(operand["input"]),
            F.array(*[F.lit(float(p)) for p in ps]),
        )
    elif op in ("$firstN", "$lastN"):
        if not isinstance(operand, Mapping) or "input" not in operand \
                or "n" not in operand:
            raise InvalidPipelineError(
                f"{op} requires {{'input': expr, 'n': int}}"
            )
        n = int(operand["n"])
        if n < 1:
            raise InvalidPipelineError(f"{op} n must be >= 1")
        lst = F.collect_list(value_expr(operand["input"]))
        # $lastN keeps ORIGINAL order (Mongo): take the tail via
        # reverse/slice, then reverse back — [1..5], n=2 → [4, 5]
        expr = F.slice(lst, 1, n) if op == "$firstN" else F.reverse(
            F.slice(F.reverse(lst), 1, n)
        )
    elif op in ("$topN", "$bottomN"):
        # Mongo 5.2 accumulators: n extreme values by a sort key.
        # array_sort of (key, value) structs keeps everything JVM-side;
        # per-group cost is O(g log g) — for huge groups prefer the
        # two-phase operators/skew.salted_topk.
        if not isinstance(operand, Mapping) or "output" not in operand \
                or "sortBy" not in operand or "n" not in operand:
            raise InvalidPipelineError(
                f"{op} requires {{'output': expr, 'sortBy': expr,"
                " 'n': int}}"
            )
        n = int(operand["n"])
        if n < 1:
            raise InvalidPipelineError(f"{op} n must be >= 1")
        pairs = F.collect_list(F.struct(
            value_expr(operand["sortBy"]).alias("k"),
            value_expr(operand["output"]).alias("v"),
        ))
        ordered = F.array_sort(pairs)
        if op == "$topN":
            ordered = F.reverse(ordered)
        expr = F.transform(F.slice(ordered, 1, n), lambda e: e["v"])
    else:
        raise InvalidPipelineError(
            f"Unknown accumulator {op!r} for {name!r}. Supported: $sum $avg "
            "$min $max $first $last $push $addToSet $count $stdDevPop "
            "$stdDevSamp $median $percentile $firstN $lastN $topN $bottomN"
        )
    return expr.alias(name)


def apply_group(df: DataFrame, spec: Mapping[str, Any]) -> DataFrame:
    """``$group`` stage → ``groupBy().agg()``.

    Output columns: ``_id`` (null / scalar / struct) + one per accumulator,
    matching the reference's result-document shape.
    """
    if "_id" not in spec:
        raise InvalidPipelineError("$group requires an _id key")
    key = spec["_id"]
    accs = [accumulator_expr(k, v) for k, v in spec.items() if k != "_id"]

    if key is None:
        if not accs:
            return df.select(F.lit(None).alias("_id")).distinct()
        grouped = df.groupBy().agg(*accs)
        return grouped.select(
            F.lit(None).alias("_id"), *[F.col(n) for n in _acc_names(spec)]
        )
    if isinstance(key, str) and key.startswith("$"):
        gcol = F.col(key[1:]).alias("_id")
        if accs:
            return df.groupBy(gcol).agg(*accs)
        return df.select(gcol).distinct()
    if isinstance(key, Mapping):
        tmp = [value_expr(v).alias(f"__gk_{k}") for k, v in key.items()]
        out = df.groupBy(*tmp).agg(*accs) if accs else df.select(*tmp).distinct()
        id_struct = F.struct(
            *[F.col(f"__gk_{k}").alias(k) for k in key]
        ).alias("_id")
        keep = [id_struct] + [F.col(n) for n in _acc_names(spec)]
        return out.select(*keep)
    # constant _id → group all under that constant
    grouped = df.groupBy().agg(*accs)
    return grouped.select(F.lit(key).alias("_id"),
                          *[F.col(n) for n in _acc_names(spec)])


def _acc_names(spec: Mapping[str, Any]) -> list[str]:
    return [k for k in spec if k != "_id"]


def apply_unwind(df: DataFrame, spec: Any) -> DataFrame:
    """``$unwind`` → ``explode`` / ``explode_outer`` / ``posexplode``
    (reference row-explosion: src/query/index.ts:1549-1583;
    ``includeArrayIndex`` is a Mongo option the reference lacks)."""
    if isinstance(spec, str):
        path, preserve, idx_col = spec, False, None
    elif isinstance(spec, Mapping):
        path = spec.get("path")
        preserve = bool(spec.get("preserveNullAndEmptyArrays", False))
        idx_col = spec.get("includeArrayIndex")
    else:
        raise InvalidPipelineError(f"Bad $unwind spec: {spec!r}")
    if not isinstance(path, str) or not path.startswith("$"):
        raise InvalidPipelineError("$unwind path must be a '$field' string")
    name = path[1:]
    out_name = name.replace(".", "__") if "." in name else name
    if idx_col is not None:
        if not isinstance(idx_col, str) or idx_col.startswith("$"):
            raise InvalidPipelineError(
                "includeArrayIndex must be a plain output column name"
            )
        fn = F.posexplode_outer if preserve else F.posexplode
        others = [c for c in df.columns if c != out_name]
        return df.select(
            *others, fn(F.col(name)).alias(idx_col, out_name)
        )
    fn = F.explode_outer if preserve else F.explode
    return df.withColumn(out_name, fn(F.col(name)))


def apply_sort(df: DataFrame, spec: Mapping[str, int]) -> DataFrame:
    """``$sort`` — Spark's default null ordering (nulls first asc, last
    desc) matches the reference (src/query/index.ts:1501-1542)."""
    if not isinstance(spec, Mapping) or not spec:
        raise InvalidPipelineError("$sort requires a non-empty mapping")
    cols = []
    for field, direction in spec.items():
        if direction not in (1, -1):
            raise InvalidPipelineError(f"$sort direction must be 1 or -1: {field}")
        cols.append(F.col(field).asc() if direction == 1 else F.col(field).desc())
    return df.orderBy(*cols)


def apply_project_stage(df: DataFrame, spec: Any) -> DataFrame:
    """``$project`` with Mongo's full grammar.

    Pure include/exclude specs route to :func:`apply_projection`
    (reference parity, src/query/index.ts:1509-1547). Any computed
    value — ``{"total": {"$multiply": [...]}}`` or a ``"$field"``
    rename — switches the stage to Mongo's inclusion mode: the output
    has exactly the included + computed fields, and mixing in
    exclusions is rejected like Mongo's
    "Cannot do exclusion ... in inclusion projection" error. Computed
    values reuse the expression grammar, so the whole stage is one
    Catalyst Project node."""
    if not isinstance(spec, Mapping) or not spec:
        return apply_projection(df, spec)
    # any bare number is an include/exclude flag in Mongo (truthy =
    # include); literal outputs need $literal, exactly like Mongo
    flags = {k: v for k, v in spec.items()
             if isinstance(v, (bool, int, float))}
    if len(flags) == len(spec):
        return apply_projection(df, spec)
    excluded = [k for k, v in flags.items() if not v]
    # Mongo explicitly allows {"_id": 0} in inclusion mode — the one
    # exclusion an inclusion projection may carry; drop it from the
    # output instead of raising
    id_excluded = "_id" in excluded
    excluded = [k for k in excluded if k != "_id"]
    if excluded:
        raise InvalidPipelineError(
            f"$project: cannot mix exclusion of {excluded} with "
            "computed/included fields (Mongo inclusion-mode semantics)")
    cols = []
    for name, v in spec.items():
        if id_excluded and name == "_id":
            continue
        if "." in name:
            raise InvalidPipelineError(
                f"$project computed mode supports top-level output "
                f"names only, got {name!r}")
        if name in flags:
            cols.append(F.col(name))
        else:
            cols.append(value_expr(v).alias(name))
    return df.select(*cols)


def apply_add_fields(df: DataFrame, spec: Mapping[str, Any]) -> DataFrame:
    """``$addFields`` / ``$set``: computed top-level columns (extension —
    the reference pipeline has no field-computation stage; expressions
    reuse the $group operand grammar)."""
    if not isinstance(spec, Mapping) or not spec:
        raise InvalidPipelineError("$addFields requires a non-empty mapping")
    out = df
    for name, expr in spec.items():
        if "." in name:
            raise InvalidPipelineError(
                f"$addFields supports top-level names only, got {name!r}"
            )
        out = out.withColumn(name, value_expr(expr))
    return out


def apply_union_with(
    df: DataFrame,
    spec: Mapping[str, Any] | str,
    tables: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """``$unionWith``: concatenate another collection (optionally run
    through its own sub-pipeline first) — Mongo 4.4 stage; extension
    here (the reference's only union is the implicit multi-file scan
    concat, src/delta/table.ts:1702-1779). Accepts the string shorthand
    ``{"$unionWith": "coll"}`` or ``{coll, pipeline}``.

    Spark-natively this is ``unionByName(allowMissingColumns=True)``
    — a zero-shuffle plan concat, with Mongo's behavior of null-filling
    fields the other side lacks."""
    if isinstance(spec, str):
        src, sub = spec, None
    elif isinstance(spec, Mapping) and "coll" in spec:
        src, sub = spec["coll"], spec.get("pipeline")
    else:
        raise InvalidPipelineError(
            f"$unionWith requires a collection name or "
            f"{{coll, pipeline}}, got {spec!r}"
        )
    if isinstance(src, DataFrame):
        other = src
    elif tables is not None and src in tables:
        other = tables[src]
    else:
        other = df.sparkSession.table(src)
    if sub:
        other = apply_pipeline(other, sub, tables)
    return df.unionByName(other, allowMissingColumns=True)


def apply_set_window_fields(
    df: DataFrame,
    spec: Mapping[str, Any],
) -> DataFrame:
    """``$setWindowFields``: per-row window computations — Mongo 5.0's
    window stage, mapped 1:1 onto Spark's Window frames (extension;
    the reference has no window functions at all, SURVEY §2.5).

    Supported output operators: ``$sum $avg $min $max $count`` (with an
    optional ``window.documents: [lower, upper]`` ROWS frame where
    bounds are ints, ``"unbounded"`` or ``"current"``), ``$rank``,
    ``$denseRank``, ``$documentNumber`` and ``$shift``
    (``{output, by, default}`` → lead/lag). Ranking/shift operators
    require ``sortBy`` and ignore frames, per Mongo.

    Scale shape: one hash shuffle on ``partitionBy`` (Spark window
    exchange); running aggregates evaluate in a single ordered pass per
    partition. Callers should include a tiebreaker in ``sortBy`` —
    like Mongo, ties otherwise make running values nondeterministic.
    """
    from pyspark.sql import Window

    if not isinstance(spec, Mapping) or "output" not in spec:
        raise InvalidPipelineError(
            f"$setWindowFields requires an 'output' mapping, got {spec!r}"
        )
    part = spec.get("partitionBy")
    sort = spec.get("sortBy")
    base = Window.partitionBy(
        *([value_expr(part)] if part is not None else [])
    )
    if sort:
        order = [
            value_expr(f"${k}") if d >= 0 else F.desc(k)
            for k, d in sort.items()
        ]
        base = base.orderBy(*order)

    def _bound(b, default):
        if b == "unbounded":
            return default
        if b == "current":
            return Window.currentRow
        return int(b)

    out = df
    for name, ospec in spec["output"].items():
        if not isinstance(ospec, Mapping) or not ospec:
            raise InvalidPipelineError(
                f"$setWindowFields output {name!r} must be a mapping"
            )
        ospec = dict(ospec)
        frame = ospec.pop("window", None)
        if len(ospec) != 1:
            raise InvalidPipelineError(
                f"$setWindowFields output {name!r} needs exactly one "
                f"operator, got {sorted(ospec)}"
            )
        op, operand = next(iter(ospec.items()))
        w = base
        if op in ("$rank", "$denseRank", "$documentNumber", "$shift"):
            if not sort:
                raise InvalidPipelineError(f"{op} requires sortBy")
            if op == "$rank":
                expr = F.rank().over(w)
            elif op == "$denseRank":
                expr = F.dense_rank().over(w)
            elif op == "$documentNumber":
                expr = F.row_number().over(w)
            else:
                if not isinstance(operand, Mapping) \
                        or "output" not in operand or "by" not in operand:
                    raise InvalidPipelineError(
                        "$shift requires {'output': expr, 'by': int"
                        " [, 'default': value]}"
                    )
                by = int(operand["by"])
                fn = F.lead if by > 0 else F.lag
                expr = fn(
                    value_expr(operand["output"]), abs(by),
                    operand.get("default"),
                ).over(w)
        elif op in ("$sum", "$avg", "$min", "$max", "$count"):
            if frame and "documents" in frame:
                lo, hi = frame["documents"]
                w = w.rowsBetween(
                    _bound(lo, Window.unboundedPreceding),
                    _bound(hi, Window.unboundedFollowing),
                )
            elif sort:
                # Mongo default with sortBy: unbounded preceding..current
                w = w.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow)
            agg = {"$sum": F.sum, "$avg": F.avg, "$min": F.min,
                   "$max": F.max,
                   "$count": lambda c: F.count(F.lit(1))}[op]
            expr = agg(value_expr(operand)).over(w)
        else:
            raise InvalidPipelineError(
                f"Unknown $setWindowFields operator {op!r}. Supported: "
                "$sum $avg $min $max $count $rank $denseRank "
                "$documentNumber $shift"
            )
        out = out.withColumn(name, expr)
    return out


def apply_densify(
    df: DataFrame,
    spec: Mapping[str, Any],
) -> DataFrame:
    """``$densify``: generate documents at regular steps of a numeric
    field so downstream window/fill stages see a gapless series —
    Mongo 5.1's time-series gap stage (extension; the reference has no
    series operators).

    ``{field, partitionBy?, range: {step, bounds: 'partition' |
    [lo, hi]}}``. With ``bounds: 'partition'`` each partition densifies
    between its own min and max; explicit bounds apply to every
    partition. Generated docs carry only the partition keys + field
    (other columns null), and only fill points NOT already present.

    Scale shape: the grid is built per-partition from a min/max
    aggregate + ``sequence()`` explode (O(generated rows), no
    driver-side loop) and anti-joined against the existing points —
    one aggregation + one join keyed by partition, no corpus sort.
    """
    if not isinstance(spec, Mapping) or "field" not in spec \
            or "range" not in spec:
        raise InvalidPipelineError(
            f"$densify requires {{field, range}}, got {spec!r}"
        )
    field = spec["field"]
    rng = spec["range"]
    step = rng.get("step")
    if not step or step <= 0:
        raise InvalidPipelineError("$densify range.step must be > 0")
    part = spec.get("partitionBy") or []
    if isinstance(part, str):
        part = [part]
    part = [p.lstrip("$") for p in part]
    bounds = rng.get("bounds", "partition")
    if bounds == "partition":
        if not part:
            raise InvalidPipelineError(
                "$densify bounds='partition' requires partitionBy"
            )
        limits = df.groupBy(*part).agg(
            F.min(field).alias("__lo"), F.max(field).alias("__hi"))
    elif isinstance(bounds, Sequence) and len(bounds) == 2:
        base = df.select(*part).distinct() if part \
            else df.limit(1).select(F.lit(1).alias("__one")).drop("__one")
        limits = base.withColumn("__lo", F.lit(bounds[0])) \
                     .withColumn("__hi", F.lit(bounds[1]))
    else:
        raise InvalidPipelineError(
            "$densify range.bounds must be 'partition' or [lo, hi]"
        )
    grid = limits.select(
        *part,
        F.explode(
            F.sequence(F.col("__lo").cast("long"),
                       F.col("__hi").cast("long"),
                       F.lit(int(step)))
        ).alias(field),
    )
    existing = df.select(*part, field)
    gen = grid.join(existing, [*part, field], "left_anti")
    return df.unionByName(gen, allowMissingColumns=True)


def apply_fill(
    df: DataFrame,
    spec: Mapping[str, Any],
) -> DataFrame:
    """``$fill``: fill null fields — Mongo 5.3's stage. Methods:
    ``{method: 'locf'}`` (last observation carried forward over
    sortBy within partitionBy — ``last(ignorenulls)`` over a running
    frame, one window exchange) or ``{value: v}`` (constant, zero
    shuffle)."""
    from pyspark.sql import Window

    if not isinstance(spec, Mapping) or "output" not in spec:
        raise InvalidPipelineError(
            f"$fill requires an 'output' mapping, got {spec!r}"
        )
    part = spec.get("partitionBy") or []
    if isinstance(part, str):
        part = [part]
    part = [p.lstrip("$") for p in part]
    sort = spec.get("sortBy")
    out = df
    for name, how in spec["output"].items():
        if not isinstance(how, Mapping) or len(how) != 1:
            raise InvalidPipelineError(
                f"$fill output {name!r} must be {{method}} or {{value}}"
            )
        if "value" in how:
            out = out.withColumn(
                name, F.coalesce(F.col(name), F.lit(how["value"])))
        elif how.get("method") == "locf":
            if not sort:
                raise InvalidPipelineError("$fill locf requires sortBy")
            w = Window.partitionBy(*part).orderBy(
                *[F.col(k) if d >= 0 else F.desc(k)
                  for k, d in sort.items()]
            ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            out = out.withColumn(
                name, F.last(F.col(name), ignorenulls=True).over(w))
        else:
            raise InvalidPipelineError(
                f"$fill output {name!r}: unknown method {how!r} "
                "(supported: locf, value)"
            )
    return out


def apply_out(
    df: DataFrame,
    spec: Any,
    tables: Mapping[str, Any] | None = None,
) -> DataFrame:
    """``$out``: replace a target collection with the pipeline result —
    Mongo's terminal write stage, mapped to a Delta overwrite (one
    atomic commit; readers time-travel to the pre-$out version).

    ``spec`` is a ``DeltaTable``, a table path string, or a name that
    resolves through ``tables`` to either. Returns the written
    DataFrame so the stage stays chainable for stats."""
    from deltalake_spark.delta.table import DeltaTable

    target = tables[spec] if tables and isinstance(spec, str) \
        and spec in tables else spec
    if isinstance(target, str):
        target = DeltaTable(df.sparkSession, target)
    if not isinstance(target, DeltaTable):
        raise InvalidPipelineError(
            f"$out target must be a DeltaTable or path, got {spec!r}"
        )
    target.write(df, mode="overwrite")
    return df


def apply_merge(
    df: DataFrame,
    spec: Mapping[str, Any],
    tables: Mapping[str, Any] | None = None,
) -> DataFrame:
    """``$merge``: upsert the pipeline result into a target collection
    (Mongo 4.2's terminal stage) — mapped to ``DeltaTable.merge``, so
    whenMatched/whenNotMatched become the Delta MERGE clauses and the
    whole upsert is one OCC commit with CDC records.

    ``{into, on, whenMatched: 'replace'|'keepExisting'|'merge'(=
    replace here: row-level replace equals field-merge for full rows),
    whenNotMatched: 'insert'|'discard'}``. ``on`` is the equality key
    (string or list)."""
    from deltalake_spark.delta.table import DeltaTable

    if not isinstance(spec, Mapping) or "into" not in spec:
        raise InvalidPipelineError(
            f"$merge requires {{into, on, ...}}, got {spec!r}"
        )
    target = spec["into"]
    if tables and isinstance(target, str) and target in tables:
        target = tables[target]
    if isinstance(target, str):
        target = DeltaTable(df.sparkSession, target)
    if not isinstance(target, DeltaTable):
        raise InvalidPipelineError(
            f"$merge into must be a DeltaTable or path, got {spec['into']!r}"
        )
    on = spec.get("on", "_id")
    keys = [on] if isinstance(on, str) else list(on)
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
    matched = spec.get("whenMatched", "merge")
    not_matched = spec.get("whenNotMatched", "insert")
    if matched not in ("replace", "merge", "keepExisting"):
        raise InvalidPipelineError(
            f"$merge whenMatched must be replace/merge/keepExisting, "
            f"got {matched!r}"
        )
    if not_matched not in ("insert", "discard"):
        raise InvalidPipelineError(
            f"$merge whenNotMatched must be insert/discard, "
            f"got {not_matched!r}"
        )
    update = {c: f"s.`{c}`" for c in df.columns} \
        if matched in ("replace", "merge") else None
    target.merge(
        df,
        cond,
        when_matched_update=update,
        when_not_matched_insert=(not_matched == "insert"),
    )
    return df


def apply_facet(
    df: DataFrame,
    spec: Mapping[str, Any],
    tables: Mapping[str, Any] | None = None,
) -> DataFrame:
    """``$facet``: run several sub-pipelines over the SAME input and
    return one document holding each facet's results as an array.

    Spark shape: each facet is its own pipeline over the shared plan
    (Catalyst reuses the common subtree via exchange reuse); every
    facet collapses to a one-row array aggregate (facet outputs are
    document-sized by definition — Mongo caps them at 16 MB), and the
    one-row frames cross-join into the single result document."""
    if not isinstance(spec, Mapping) or not spec:
        raise InvalidPipelineError(
            f"$facet requires a non-empty mapping of sub-pipelines, "
            f"got {spec!r}"
        )
    result = None
    for name, sub in spec.items():
        branch = apply_pipeline(df, sub, tables)
        one = branch.agg(
            F.collect_list(
                F.struct(*[F.col(c) for c in branch.columns])
            ).alias(name)
        )
        result = one if result is None else result.crossJoin(one)
    return result


def apply_bucket_auto(
    df: DataFrame,
    spec: Mapping[str, Any],
) -> DataFrame:
    """``$bucketAuto``: split docs into ~equal-count buckets with
    boundaries derived from the data (Mongo 3.4).

    Spark-first: boundaries are the exact ``i/N`` percentiles of the
    groupBy expression — ONE aggregation, broadcast back as a CASE
    chain, so there is no global sort / ntile single-partition window;
    assignment is a pure codegen projection. Per Mongo, ties across a
    boundary collapse into the lower bucket (duplicate boundaries are
    dropped), so bucket counts are near-equal, not exact. Output
    follows the $bucket shape: ``_id`` = {min, max} of the bucket plus
    the ``output`` accumulators (default count)."""
    if not isinstance(spec, Mapping) or "groupBy" not in spec \
            or "buckets" not in spec:
        raise InvalidPipelineError(
            f"$bucketAuto requires {{groupBy, buckets}}, got {spec!r}"
        )
    n = int(spec["buckets"])
    if n < 1:
        raise InvalidPipelineError("$bucketAuto buckets must be >= 1")
    gb = value_expr(spec["groupBy"])
    ps = [i / n for i in range(1, n)]
    row = df.agg(
        F.percentile(gb, F.array(*[F.lit(p) for p in ps])).alias("bs")
    ).first() if ps else None
    bounds = []
    if row and row["bs"] is not None:
        for b in row["bs"]:
            if not bounds or b > bounds[-1]:
                bounds.append(b)
    bucket = F.lit(len(bounds))
    for i in range(len(bounds) - 1, -1, -1):
        bucket = F.when(gb <= F.lit(bounds[i]), F.lit(i)).otherwise(bucket)
    out_spec = spec.get("output") or {"count": {"$sum": 1}}
    aggs = [accumulator_expr(name, a) for name, a in out_spec.items()]
    grouped = (
        df.withColumn("__bk", bucket)
        .groupBy("__bk")
        .agg(F.min(gb).alias("__lo"), F.max(gb).alias("__hi"), *aggs)
    )
    return grouped.select(
        F.struct(F.col("__lo").alias("min"),
                 F.col("__hi").alias("max")).alias("_id"),
        *[F.col(name) for name in out_spec],
    ).orderBy("_id.min")


def apply_sample(df: DataFrame, spec: Mapping[str, Any]) -> DataFrame:
    """``$sample``: pseudo-random N documents. DOCUMENTED DIVERGENCE:
    Mongo draws a fresh random sample per execution; a distributed
    engine wants reproducibility, so this samples by the portable
    priority hash of ``seedBy`` (default: first column) with an
    optional ``seed`` — deterministic across runs and partitionings,
    planned as TakeOrdered (per-partition heaps, no global sort)."""
    from deltalake_spark.operators.mixing import doc_priority

    if not isinstance(spec, Mapping) or "size" not in spec:
        raise InvalidPipelineError(
            f"$sample requires {{size}}, got {spec!r}"
        )
    size = int(spec["size"])
    if size < 0:
        raise InvalidPipelineError("$sample size must be >= 0")
    key = spec.get("seedBy") or df.columns[0]
    seed = int(spec.get("seed", 0))
    return (
        df.withColumn("__pri", doc_priority(F.col(key), seed))
        .orderBy("__pri", key)
        .limit(size)
        .drop("__pri")
    )


def apply_graph_lookup(
    df: DataFrame,
    spec: Mapping[str, Any],
    tables: Mapping[str, Any] | None = None,
) -> DataFrame:
    """``$graphLookup``: bounded recursive traversal (Mongo 3.4) —
    per input doc, follow ``connectFromField → connectToField`` edges
    in ``from`` up to ``maxDepth`` recursions and collect every reached
    doc (with its depth) into the array field ``as``.

    Spark-first shape: breadth-first iterative equi-joins — round d
    joins the CURRENT frontier values against ``from`` on the connect
    key (hash join, broadcastable dimension) — the bounded iterative
    equi-join loop shape (cf. the star-contraction rounds of
    ``operators/dedup.connected_components``). A
    (doc, value) seen-set anti-join guards cycles, so each round's
    frontier only carries NEW values and the loop terminates on the
    first empty frontier even with maxDepth above the graph diameter.
    The driver-side loop runs at most ``maxDepth + 1`` bounded rounds —
    never data-proportional. Reached docs dedupe to their minimum
    depth, matching Mongo's BFS semantics.
    """
    required = {"from", "startWith", "connectFromField",
                "connectToField", "as"}
    if not isinstance(spec, Mapping) or not required <= set(spec):
        raise InvalidPipelineError(
            f"$graphLookup requires keys {sorted(required)}, got {spec!r}"
        )
    src = spec["from"]
    if isinstance(src, DataFrame):
        from_df = src
    elif tables is not None and src in tables:
        from_df = tables[src]
    else:
        from_df = df.sparkSession.table(src)
    cf, ct, out_name = (spec["connectFromField"],
                        spec["connectToField"], spec["as"])
    depth_field = spec.get("depthField")
    max_depth = int(spec.get("maxDepth", 20))
    if max_depth < 0:
        raise InvalidPipelineError("$graphLookup maxDepth must be >= 0")

    seed = df.withColumn("__gid", F.monotonically_increasing_id())
    frontier = (
        seed.select("__gid", value_expr(spec["startWith"]).alias("__val"))
        .where(F.col("__val").isNotNull())
        .distinct()
    )
    seen = frontier
    node = F.struct(*[F.col(c) for c in from_df.columns]).alias("__doc")
    levels = []
    for depth in range(max_depth + 1):
        if frontier.isEmpty():
            break
        matched = (
            frontier.join(from_df, frontier["__val"] == from_df[ct])
            .select("__gid", node, F.lit(depth).alias("__depth"))
        )
        levels.append(matched)
        nxt = (
            matched.select(
                "__gid", F.col("__doc")[cf].alias("__val"))
            .where(F.col("__val").isNotNull())
            .distinct()
        )
        # cycle guard: only expand values this doc has not seen yet
        frontier = nxt.join(seen, ["__gid", "__val"], "left_anti") \
            .localCheckpoint(eager=False)
        seen = seen.unionByName(frontier)
    if levels:
        all_matched = levels[0]
        for m in levels[1:]:
            all_matched = all_matched.unionByName(m)
        per_doc = (
            all_matched.groupBy("__gid", "__doc")
            .agg(F.min("__depth").alias("__depth"))
        )
        elem = F.struct(F.col("__doc"), F.col("__depth")) \
            if depth_field else F.col("__doc")
        arr = per_doc.groupBy("__gid").agg(
            F.collect_list(elem).alias("__arr"))
        joined = seed.join(arr, "__gid", "left")
    else:
        joined = seed.withColumn("__arr", F.lit(None))
    if depth_field:
        fill = F.transform(
            F.coalesce(F.col("__arr"), F.array()),
            lambda e: e["__doc"].withField(depth_field, e["__depth"]),
        )
    else:
        fill = F.coalesce(F.col("__arr"), F.array())
    return joined.withColumn(out_name, fill).drop("__gid", "__arr")


def apply_lookup(
    df: DataFrame,
    spec: Mapping[str, Any],
    tables: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """``$lookup``: left outer join collecting matches into an array
    field (Mongo shape). Extension stage — the reference has no joins.

    Scale shape: the foreign side is PRE-AGGREGATED to one row per key
    (``collect_list(struct(*))``) before the join, so the join is 1:1 on
    the key — one shuffle each side (or broadcast for small dims), never
    a row-multiplying join followed by re-grouping of the full left
    table. Unmatched rows get ``[]``, matching Mongo.
    """
    required = {"from", "localField", "foreignField", "as"}
    if not isinstance(spec, Mapping) or not required <= set(spec):
        raise InvalidPipelineError(
            f"$lookup requires keys {sorted(required)}, got {spec!r}"
        )
    src = spec["from"]
    if isinstance(src, DataFrame):
        foreign = src
    elif tables is not None and src in tables:
        foreign = tables[src]
    else:
        foreign = df.sparkSession.table(src)
    local, fk, out_name = spec["localField"], spec["foreignField"], spec["as"]
    # Mongo overwrites a pre-existing field named spec['as']; without the
    # drop the left join would yield a duplicate column and the
    # withColumn below would fail with an ambiguity error
    if out_name in df.columns:
        df = df.drop(out_name)
    matches = (
        foreign.groupBy(F.col(fk).alias("__lk"))
        .agg(F.collect_list(F.struct(*foreign.columns)).alias(out_name))
    )
    # eqNullSafe: Mongo's $lookup matches null localField rows to docs
    # whose foreignField is null (SQL `=` would give them [] instead)
    joined = df.join(matches, df[local].eqNullSafe(matches["__lk"]), "left")
    return joined.drop("__lk").withColumn(
        out_name,
        F.coalesce(F.col(out_name), F.array().cast(
            dict(joined.dtypes)[out_name])),
    )


def apply_bucket(df: DataFrame, spec: Mapping[str, Any]) -> DataFrame:
    """``$bucket``: histogram by explicit boundaries (extension).

    ``groupBy`` value falls in ``[b[i], b[i+1])``; out-of-range rows go
    to ``default`` (error without one, as in Mongo). One hash-agg
    shuffle on the bucket id; the CASE chain is codegen'd per row."""
    if not isinstance(spec, Mapping) or "groupBy" not in spec \
            or "boundaries" not in spec:
        raise InvalidPipelineError(
            "$bucket requires 'groupBy' and 'boundaries'"
        )
    bounds = list(spec["boundaries"])
    if len(bounds) < 2 or bounds != sorted(bounds):
        raise InvalidPipelineError(
            "$bucket boundaries must be a sorted list of >=2 values"
        )
    v = value_expr(spec["groupBy"])
    bucket = None
    for lo, hi in zip(bounds, bounds[1:]):
        cond = (v >= F.lit(lo)) & (v < F.lit(hi))
        bucket = F.when(cond, F.lit(lo)) if bucket is None \
            else bucket.when(cond, F.lit(lo))
    if "default" in spec:
        bucket = bucket.otherwise(F.lit(spec["default"]))
    out_spec = spec.get("output", {"count": {"$sum": 1}})
    aggs = [accumulator_expr(n, s) for n, s in out_spec.items()]
    if "default" not in spec:
        # no default → out-of-range rows drop; express that as a plain
        # range predicate so it reaches the parquet scan (PushedFilters /
        # row-group skipping), instead of an un-pushable CASE null-check
        src = df.filter((v >= F.lit(bounds[0])) & (v < F.lit(bounds[-1])))
    else:
        src = df
    grouped = (
        src.withColumn("__bucket", bucket)
        .filter(F.col("__bucket").isNotNull())
        .groupBy(F.col("__bucket").alias("_id"))
        .agg(*aggs)
    )
    return grouped.orderBy("_id")


def apply_sort_by_count(df: DataFrame, spec: Any) -> DataFrame:
    """``$sortByCount``: group by an expression, count, sort desc
    (extension). Ties broken by ``_id`` for determinism."""
    return (
        df.groupBy(value_expr(spec).alias("_id"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("_id"))
    )


def apply_replace_root(df: DataFrame, spec: Mapping[str, Any]) -> DataFrame:
    """``$replaceRoot``: promote a struct field to the document root
    (extension)."""
    if not isinstance(spec, Mapping) or "newRoot" not in spec:
        raise InvalidPipelineError("$replaceRoot requires 'newRoot'")
    root = spec["newRoot"]
    if not isinstance(root, str) or not root.startswith("$"):
        raise InvalidPipelineError("$replaceRoot newRoot must be '$field'")
    name = root[1:]
    try:
        dtype = df.schema[name].dataType
    except KeyError:
        raise InvalidPipelineError(f"$replaceRoot field {name!r} not found")
    if dtype.typeName() != "struct":
        raise InvalidPipelineError(f"$replaceRoot field {name!r} not a struct")
    return df.select(f"{name}.*")


STAGES = ("$match", "$group", "$project", "$sort", "$limit", "$skip",
          "$unwind", "$count", "$addFields", "$set", "$lookup", "$bucket",
          "$sortByCount", "$replaceRoot", "$unionWith", "$setWindowFields",
          "$densify", "$fill", "$merge", "$out", "$graphLookup",
          "$facet", "$bucketAuto", "$sample")


def apply_pipeline(
    df: DataFrame,
    pipeline: Sequence[Mapping[str, Any]],
    tables: Mapping[str, DataFrame] | None = None,
) -> DataFrame:
    """Execute an aggregation pipeline declaratively.

    The loop over stages mirrors the reference's executor
    (src/query/index.ts:1733-1752), but each stage only *extends the
    logical plan* — Catalyst then optimizes the composed query globally.
    Stages past the reference's seven ($addFields/$set, $lookup, $bucket,
    $sortByCount, $replaceRoot) are engine-native extensions, like the
    join/set-op surface; ``tables`` resolves $lookup's ``from`` (falling
    back to the session catalog's temp views).
    """
    if not isinstance(pipeline, Sequence):
        raise InvalidPipelineError("Pipeline must be a list of stages")
    out = df
    for i, stage in enumerate(pipeline):
        if not isinstance(stage, Mapping) or len(stage) != 1:
            raise InvalidPipelineError(
                f"Stage {i} must be a single-key mapping, got {stage!r}"
            )
        op, spec = next(iter(stage.items()))
        if op == "$match":
            out = out.filter(translate_filter(spec))
        elif op == "$group":
            out = apply_group(out, spec)
        elif op == "$project":
            out = apply_project_stage(out, spec)
        elif op == "$sort":
            out = apply_sort(out, spec)
        elif op == "$limit":
            out = out.limit(int(spec))
        elif op == "$skip":
            out = out.offset(int(spec))
        elif op == "$unwind":
            out = apply_unwind(out, spec)
        elif op == "$count":
            out = out.agg(F.count(F.lit(1)).alias(str(spec)))
        elif op in ("$addFields", "$set"):
            out = apply_add_fields(out, spec)
        elif op == "$lookup":
            out = apply_lookup(out, spec, tables)
        elif op == "$graphLookup":
            out = apply_graph_lookup(out, spec, tables)
        elif op == "$facet":
            out = apply_facet(out, spec, tables)
        elif op == "$bucketAuto":
            out = apply_bucket_auto(out, spec)
        elif op == "$sample":
            out = apply_sample(out, spec)
        elif op == "$unionWith":
            out = apply_union_with(out, spec, tables)
        elif op == "$setWindowFields":
            out = apply_set_window_fields(out, spec)
        elif op == "$densify":
            out = apply_densify(out, spec)
        elif op == "$fill":
            out = apply_fill(out, spec)
        elif op == "$merge":
            out = apply_merge(out, spec, tables)
        elif op == "$out":
            out = apply_out(out, spec, tables)
        elif op == "$bucket":
            out = apply_bucket(out, spec)
        elif op == "$sortByCount":
            out = apply_sort_by_count(out, spec)
        elif op == "$replaceRoot":
            out = apply_replace_root(out, spec)
        else:
            raise InvalidPipelineError(
                f"Unknown pipeline stage {op!r}. Supported: {STAGES}"
            )
    return out


class AggregationStats:
    """Execution statistics mirroring the reference's AggregationResult
    stats block (src/query/index.ts:1137-1149): documentsProcessed,
    groupsCreated, executionTimeMs."""

    __slots__ = ("documents_processed", "groups_created",
                 "execution_time_ms")

    def __init__(self, documents_processed: int, groups_created: int,
                 execution_time_ms: float) -> None:
        self.documents_processed = documents_processed
        self.groups_created = groups_created
        self.execution_time_ms = execution_time_ms

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return (f"AggregationStats(documents_processed="
                f"{self.documents_processed}, groups_created="
                f"{self.groups_created}, execution_time_ms="
                f"{self.execution_time_ms:.1f})")


def aggregate(
    df: DataFrame,
    pipeline: Sequence[Mapping[str, Any]],
    tables: Mapping[str, DataFrame] | None = None,
) -> "tuple[list, AggregationStats]":
    """Eager pipeline execution returning (documents, stats) — the
    reference's ``aggregate()`` shape (src/query/index.ts:1722-1770).

    The row counts come from Spark's Observation API: metric nodes
    accumulate DURING the one real execution, so documentsProcessed
    (input rows) and groupsCreated (rows emitted by the first $group)
    cost no extra scan — where the reference counts eagerly because the
    arrays are already in memory, we observe the stream in flight.

    Caveat (documented divergence): early-terminating ``$limit``
    pipelines let Spark stop pulling rows once the limit is satisfied,
    so BOTH metrics reflect rows actually streamed by the execution —
    ``documents_processed`` can undercount the input and
    ``groups_created`` the groups, where the reference's eager engine
    always reports full counts. That is the honest number for a lazy
    engine; callers needing the eager semantics should drop the $limit.

    Placement subtlety: a ``$sort`` plans as a range-partitioned sort
    whose boundary-sampling pass re-executes the subtree above the
    aggregation's (reused) shuffle — a metric node directly under it
    would double-count. The group observation therefore attaches after
    the contiguous run of cardinality-preserving stages ($sort,
    $project, $addFields/$set, $replaceRoot) that follows the first
    $group. When a LATER $sort sits past a non-preserving stage (e.g.
    ``$group → $match → $sort``), no in-flight placement is safe, so
    groups_created falls back to one extra aggregation-only job over
    the prefix pipeline — exact, at the cost the reference pays on
    every query.
    """
    import time

    from pyspark.sql import Observation

    def _op(stage):
        if isinstance(stage, Mapping) and len(stage) == 1:
            return next(iter(stage))
        return None

    # where to attach the group-cardinality observation (see docstring)
    card_preserving = {"$sort", "$project", "$addFields", "$set",
                       "$replaceRoot"}
    group_idx = None
    group_obs_after = None
    for i, stage in enumerate(pipeline):
        if _op(stage) == "$group":
            group_idx = i
            group_obs_after = i
            for j in range(i + 1, len(pipeline)):
                if _op(pipeline[j]) in card_preserving:
                    group_obs_after = j
                else:
                    break
            break
    # a $sort above the attach point would re-execute the metric node
    # during boundary sampling — use the exact-count fallback instead
    needs_fallback = group_obs_after is not None and any(
        _op(s) == "$sort" for s in pipeline[group_obs_after + 1:]
    )

    obs_in = Observation()
    obs_group: "Observation | None" = None
    out = df.observe(obs_in, F.count(F.lit(1)).alias("n"))
    for i, stage in enumerate(pipeline):
        out = apply_pipeline(out, [stage], tables)
        if not needs_fallback and group_obs_after is not None \
                and i == group_obs_after:
            obs_group = Observation()
            out = out.observe(obs_group, F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    docs = out.collect()
    if obs_group is not None:
        groups = int(obs_group.get["n"])
    elif needs_fallback:
        groups = apply_pipeline(
            df, list(pipeline[:group_idx + 1]), tables).count()
    else:
        groups = 0
    ms = (time.perf_counter() - t0) * 1000.0
    stats = AggregationStats(int(obs_in.get["n"]), groups, ms)
    return docs, stats
