"""Extended Mongo expression operators for $project/$addFields operands.

The reference's expression surface stops at field references and nested
accumulator arithmetic (src/query/index.ts:1240-1249); its $project is
include/exclude only (src/query/index.ts:1509-1547).  This module is the
engine-native extension covering the documented MongoDB 7.0 expression
operator surface — dates, arrays (including the $$var lambda operators
$map/$filter/$reduce), $switch/$let, strings, math/trig, booleans, type
conversion — so pipelines written against Mongo's full expression language
run unchanged.

Every operator compiles to a single Catalyst expression tree: the lambda
operators use Spark higher-order functions (`transform`/`filter`/
`aggregate`), so even per-element logic executes JVM-side inside
whole-stage codegen with ZERO Python in the hot path.  That is the scale
story: `{$reduce: {...}}` over a million-element-corpus array column costs
one narrow projection, not a Python UDF round trip.

Documented divergences from Mongo (each raises or is noted below):
  - No runtime dynamic typing: `$isArray`-style type introspection cannot
    exist in a statically-typed engine and is rejected with a clear error.
  - `$zip` requires inputs coercible to one element type (Spark arrays are
    homogeneous); `useLongestLength` is supported with null padding.
  - `$switch` with no matching branch and no `default` yields NULL instead
    of Mongo's query-fatal error (declarative plans have no per-row abort).
  - `$dateToString` supports the %Y %m %d %H %M %S %L %j %% specifiers;
    others raise InvalidPipelineError rather than silently mis-formatting.
  - Timezone arguments are rejected: sessions run in UTC like the
    reference's epoch-based Date handling.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from deltalake_spark.errors import InvalidPipelineError

# ev(operand, extra_env=None) -> Column: recursive evaluator closed over
# the current variable environment; extra_env layers lambda variables.
Ev = Callable[..., Column]

HANDLERS: dict[str, Callable[[Any, Ev], Column]] = {}


def _op(name: str):
    def deco(fn):
        HANDLERS[name] = fn
        return fn
    return deco


def _args(op: str, args: Any, n: int, at_least: bool = False) -> list:
    if not isinstance(args, Sequence) or isinstance(args, (str, bytes)):
        raise InvalidPipelineError(f"{op} requires an argument array")
    if (len(args) < n) if at_least else (len(args) != n):
        kind = f">= {n}" if at_least else str(n)
        raise InvalidPipelineError(f"{op} requires {kind} operands, "
                                   f"got {len(args)}")
    return list(args)


def _spec(op: str, args: Any, required: Sequence[str],
          optional: Sequence[str] = ()) -> Mapping[str, Any]:
    if not isinstance(args, Mapping):
        raise InvalidPipelineError(f"{op} requires a document operand")
    missing = [k for k in required if k not in args]
    if missing:
        raise InvalidPipelineError(f"{op} missing required {missing}")
    unknown = [k for k in args if k not in (*required, *optional)]
    if unknown:
        if "timezone" in unknown:
            raise InvalidPipelineError(
                f"{op}: timezone arguments are not supported "
                "(engine runs in UTC, matching the reference's "
                "epoch-based dates)")
        raise InvalidPipelineError(f"{op}: unknown arguments {unknown}")
    return args


# ---------------------------------------------------------------------------
# Dates
# ---------------------------------------------------------------------------
# Unary extraction operators.  Mongo numbering matches Spark for
# dayofweek (1 = Sunday); $week ("week 1 begins with the first Sunday,
# earlier days are week 0") has no Spark builtin and is computed as
# floor((dayofyear + 7 - dayofweek) / 7) — exact for every date.

def _ts(c: Column) -> Column:
    return c.cast("timestamp")


_DATE_PARTS: dict[str, Callable[[Column], Column]] = {
    "$year": F.year,
    "$month": F.month,
    "$dayOfMonth": F.dayofmonth,
    "$hour": F.hour,
    "$minute": F.minute,
    "$second": F.second,
    "$millisecond": lambda c: ((F.unix_micros(c) % 1_000_000) / 1_000)
    .cast("int"),
    "$dayOfWeek": F.dayofweek,
    "$dayOfYear": F.dayofyear,
    "$week": lambda c: F.floor(
        (F.dayofyear(c) + 7 - F.dayofweek(c)) / 7).cast("int"),
    "$isoWeek": F.weekofyear,
    # ISO day-of-week: 1 = Monday .. 7 = Sunday
    "$isoDayOfWeek": lambda c: ((F.dayofweek(c) + 5) % 7 + 1).cast("int"),
    # ISO week-year = calendar year of that week's Thursday
    "$isoWeekYear": lambda c: F.year(
        F.date_add(c.cast("date"), 4 - ((F.dayofweek(c) + 5) % 7 + 1))),
}

for _name, _fn in _DATE_PARTS.items():
    def _mk(fn):
        def h(args, ev):
            if isinstance(args, Mapping):
                args = _spec("date part", args, ["date"])["date"]
            return fn(_ts(ev(args)))
        return h
    HANDLERS[_name] = _mk(_fn)
    del _mk

# Mongo strftime-style → Spark DateTimeFormatter pattern.  Literal text
# is single-quote escaped so pattern letters in the input never leak.
_FMT = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%L": "SSS", "%j": "DDD"}


def translate_date_format(fmt: str) -> str:
    out: list[str] = []
    lit: list[str] = []

    def flush():
        if lit:
            text = "".join(lit)
            out.append("'" + text.replace("'", "''") + "'")
            lit.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            tok = fmt[i:i + 2]
            if tok == "%%":
                lit.append("%")
            elif tok in _FMT:
                flush()
                out.append(_FMT[tok])
            else:
                raise InvalidPipelineError(
                    f"$dateToString: unsupported specifier {tok!r} "
                    f"(supported: {sorted(_FMT)} and %%)")
            i += 2
        else:
            lit.append(ch)
            i += 1
    flush()
    return "".join(out)


@_op("$dateToString")
def _date_to_string(args, ev):
    spec = _spec("$dateToString", args, ["date"], ["format", "onNull"])
    fmt = translate_date_format(
        spec.get("format", "%Y-%m-%dT%H:%M:%S.%LZ"))
    out = F.date_format(_ts(ev(spec["date"])), fmt)
    if "onNull" in spec:
        out = F.coalesce(out, ev(spec["onNull"]))
    return out


@_op("$dateFromString")
def _date_from_string(args, ev):
    spec = _spec("$dateFromString", args, ["dateString"],
                 ["format", "onNull", "onError"])
    s = ev(spec["dateString"])
    if "format" in spec:
        out = F.try_to_timestamp(
            s, F.lit(translate_date_format(spec["format"])))
    else:
        out = F.try_to_timestamp(s)
    if "onError" in spec:
        out = F.when(s.isNotNull() & out.isNull(),
                     ev(spec["onError"]).cast("timestamp")).otherwise(out)
    if "onNull" in spec:
        out = F.when(s.isNull(),
                     ev(spec["onNull"]).cast("timestamp")).otherwise(out)
    return out


_DATE_UNITS = {"year", "quarter", "month", "week", "day",
               "hour", "minute", "second", "millisecond"}


def _unit(op: str, unit: Any) -> str:
    if unit not in _DATE_UNITS:
        raise InvalidPipelineError(
            f"{op}: unit must be a constant in {sorted(_DATE_UNITS)}, "
            f"got {unit!r}")
    return str(unit)


@_op("$dateTrunc")
def _date_trunc(args, ev):
    spec = _spec("$dateTrunc", args, ["date", "unit"], ["binSize"])
    if spec.get("binSize", 1) != 1:
        raise InvalidPipelineError("$dateTrunc: only binSize 1 supported")
    return F.date_trunc(_unit("$dateTrunc", spec["unit"]),
                        _ts(ev(spec["date"])))


@_op("$dateAdd")
def _date_add(args, ev):
    spec = _spec("$dateAdd", args, ["startDate", "unit", "amount"])
    return F.timestamp_add(_unit("$dateAdd", spec["unit"]).upper(),
                           ev(spec["amount"]).cast("long"),
                           _ts(ev(spec["startDate"])))


@_op("$dateSubtract")
def _date_subtract(args, ev):
    spec = _spec("$dateSubtract", args, ["startDate", "unit", "amount"])
    return F.timestamp_add(_unit("$dateSubtract", spec["unit"]).upper(),
                           -ev(spec["amount"]).cast("long"),
                           _ts(ev(spec["startDate"])))


@_op("$dateDiff")
def _date_diff(args, ev):
    spec = _spec("$dateDiff", args, ["startDate", "endDate", "unit"])
    unit = _unit("$dateDiff", spec["unit"])
    start = _ts(ev(spec["startDate"]))
    end = _ts(ev(spec["endDate"]))
    # Mongo counts unit-boundary crossings, not elapsed units — e.g.
    # 23:59 → 00:01 next day is one "day".  timestampdiff measures
    # elapsed units, so diff the truncated endpoints instead.
    if unit == "year":
        return (F.year(end) - F.year(start)).cast("long")
    if unit == "quarter":
        return ((F.year(end) * 4 + F.quarter(end))
                - (F.year(start) * 4 + F.quarter(start))).cast("long")
    if unit == "month":
        return ((F.year(end) - F.year(start)) * 12
                + (F.month(end) - F.month(start))).cast("long")
    if unit == "week":
        # weeks start Sunday (Mongo default startOfWeek)
        def to_sunday(c):
            return F.date_sub(c.cast("date"), F.dayofweek(c) - 1)
        return (F.datediff(to_sunday(end), to_sunday(start)) / 7) \
            .cast("long")
    if unit == "day":
        return F.datediff(end.cast("date"), start.cast("date")) \
            .cast("long")
    secs = {"hour": 3600, "minute": 60, "second": 1}[unit] \
        if unit != "millisecond" else None
    if secs is not None:
        trunc_u = {"hour": "hour", "minute": "minute",
                   "second": "second"}[unit]
        a = F.unix_timestamp(F.date_trunc(trunc_u, start))
        b = F.unix_timestamp(F.date_trunc(trunc_u, end))
        return ((b - a) / secs).cast("long")
    # millisecond: count boundary CROSSINGS like every other unit, not
    # truncated elapsed micros/1000 (600µs → 1400µs crosses one boundary)
    return (F.floor(F.unix_micros(end) / 1000)
            - F.floor(F.unix_micros(start) / 1000)).cast("long")


# ---------------------------------------------------------------------------
# Arrays
# ---------------------------------------------------------------------------

@_op("$arrayElemAt")
def _array_elem_at(args, ev):
    arr, idx = _args("$arrayElemAt", args, 2)
    a, ix = ev(arr), ev(idx).cast("int")
    # Mongo: 0-based, negative counts from the end, out of range → missing
    return F.when(ix >= 0, F.try_element_at(a, ix + 1)) \
        .otherwise(F.try_element_at(a, ix))


@_op("$slice")
def _slice(args, ev):
    parts = _args("$slice", args, 2, at_least=True)
    if len(parts) == 2:
        a, n = ev(parts[0]), ev(parts[1]).cast("int")
        # n >= 0: first n; n < 0: last n
        return F.when(n >= 0, F.slice(a, 1, n)) \
            .otherwise(F.slice(a, F.greatest(n, -F.size(a)),
                               F.least(-n, F.size(a))))
    if len(parts) == 3:
        a = ev(parts[0])
        pos, n = ev(parts[1]).cast("int"), ev(parts[2]).cast("int")
        # Mongo: negative position counts from the end, clamped to 0
        start = F.when(pos >= 0, pos + 1) \
            .otherwise(F.greatest(F.size(a) + pos, F.lit(0)) + 1)
        return F.slice(a, start, n)
    raise InvalidPipelineError("$slice takes [array, n] or "
                               "[array, position, n]")


@_op("$concatArrays")
def _concat_arrays(args, ev):
    parts = _args("$concatArrays", args, 1, at_least=True)
    return F.concat(*[ev(p) for p in parts])


@_op("$size")
def _size(args, ev):
    return F.size(ev(args))


@_op("$reverseArray")
def _reverse_array(args, ev):
    return F.reverse(ev(args))


@_op("$indexOfArray")
def _index_of_array(args, ev):
    arr, needle = _args("$indexOfArray", args, 2)
    return (F.array_position(ev(arr), ev(needle)) - 1).cast("int")


@_op("$in")
def _in(args, ev):
    needle, arr = _args("$in", args, 2)
    return F.array_contains(ev(arr), ev(needle))


@_op("$setUnion")
def _set_union(args, ev):
    parts = _args("$setUnion", args, 1, at_least=True)
    out = F.array_distinct(ev(parts[0]))
    for p in parts[1:]:
        out = F.array_union(out, ev(p))
    return out


@_op("$setIntersection")
def _set_intersection(args, ev):
    parts = _args("$setIntersection", args, 1, at_least=True)
    out = F.array_distinct(ev(parts[0]))
    for p in parts[1:]:
        out = F.array_intersect(out, ev(p))
    return out


@_op("$setDifference")
def _set_difference(args, ev):
    a, b = _args("$setDifference", args, 2)
    return F.array_except(ev(a), ev(b))


@_op("$setIsSubset")
def _set_is_subset(args, ev):
    a, b = _args("$setIsSubset", args, 2)
    return F.size(F.array_except(ev(a), ev(b))) == 0


@_op("$setEquals")
def _set_equals(args, ev):
    parts = _args("$setEquals", args, 2, at_least=True)
    cols = [ev(p) for p in parts]
    out = F.lit(True)
    for other in cols[1:]:
        out = out & (F.size(F.array_except(cols[0], other)) == 0) \
            & (F.size(F.array_except(other, cols[0])) == 0)
    return out


@_op("$allElementsTrue")
def _all_elements_true(args, ev):
    (arr,) = _args("$allElementsTrue", args, 1)
    return F.forall(ev(arr), lambda x: x.cast("boolean"))


@_op("$anyElementTrue")
def _any_element_true(args, ev):
    (arr,) = _args("$anyElementTrue", args, 1)
    return F.exists(ev(arr), lambda x: x.cast("boolean"))


@_op("$map")
def _map(args, ev):
    spec = _spec("$map", args, ["input", "in"], ["as"])
    var = spec.get("as", "this")
    return F.transform(ev(spec["input"]),
                       lambda x: ev(spec["in"], {var: x}))


@_op("$filter")
def _filter(args, ev):
    spec = _spec("$filter", args, ["input", "cond"], ["as", "limit"])
    var = spec.get("as", "this")
    out = F.filter(ev(spec["input"]),
                   lambda x: ev(spec["cond"], {var: x}))
    if "limit" in spec:
        out = F.slice(out, 1, ev(spec["limit"]).cast("int"))
    return out


@_op("$reduce")
def _reduce(args, ev):
    spec = _spec("$reduce", args, ["input", "initialValue", "in"])
    init = ev(spec["initialValue"])
    # Spark's `aggregate` requires zero type == merge result type, so a
    # Python int literal (INT) against long/double elements fails to
    # resolve.  Widen numeric literal zeros up front: int → bigint,
    # float → double.  (Mongo is dynamically typed; write `0.0` when
    # reducing doubles with a non-literal initial value.)
    raw = spec["initialValue"]
    if isinstance(raw, bool):
        pass
    elif isinstance(raw, int):
        init = init.cast("bigint")
    elif isinstance(raw, float):
        init = init.cast("double")
    return F.aggregate(
        ev(spec["input"]), init,
        lambda acc, x: ev(spec["in"], {"value": acc, "this": x}))


@_op("$zip")
def _zip(args, ev):
    spec = _spec("$zip", args, ["inputs"],
                 ["useLongestLength", "defaults"])
    inputs = _args("$zip.inputs", spec["inputs"], 2, at_least=True)
    cols = [ev(c) for c in inputs]
    sizes = [F.size(c) for c in cols]
    longest = bool(spec.get("useLongestLength"))
    n = (F.greatest(*sizes) if longest else F.least(*sizes))
    if longest and spec.get("defaults") is not None:
        dflts = [ev(d) for d in _args("$zip.defaults",
                                      spec["defaults"], len(cols))]
    else:
        dflts = [None] * len(cols)

    def row(i: Column) -> Column:
        elems = []
        for c, d in zip(cols, dflts):
            e = F.try_element_at(c, (i + 1).cast("int"))
            elems.append(F.coalesce(e, d) if d is not None else e)
        return F.array(*elems)

    # Build over max(n,1) then slice back to n so the empty case stays a
    # typed empty array (sequence(0, -1) would count downward).
    seq = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    return F.slice(F.transform(seq, row), 1, n)


@_op("$range")
def _range(args, ev):
    parts = _args("$range", args, 2, at_least=True)
    if len(parts) > 3:
        raise InvalidPipelineError("$range takes [start, end, step?]")
    start = ev(parts[0]).cast("int")
    end = ev(parts[1]).cast("int")
    step = ev(parts[2]).cast("int") if len(parts) == 3 else F.lit(1)
    up = F.sequence(start, F.greatest(end - 1, start), step)
    down = F.sequence(start, F.least(end + 1, start), step)
    return F.when((step > 0) & (start < end), up) \
        .when((step < 0) & (start > end), down) \
        .otherwise(F.slice(F.sequence(start, start), 1, 0))


@_op("$sortArray")
def _sort_array(args, ev):
    spec = _spec("$sortArray", args, ["input", "sortBy"])
    by = spec["sortBy"]
    if by not in (1, -1):
        raise InvalidPipelineError(
            "$sortArray: only scalar sortBy 1/-1 supported "
            "(field-wise sort documents are not)")
    return F.sort_array(ev(spec["input"]), asc=(by == 1))


@_op("$objectToArray")
def _object_to_array(args, ev):
    # map<K,V> column → array<struct<k,v>> (Mongo's {k,v} pair shape)
    return F.transform(
        F.map_entries(ev(args)),
        lambda e: F.struct(e["key"].alias("k"), e["value"].alias("v")))


@_op("$arrayToObject")
def _array_to_object(args, ev):
    # array<struct<k,v>> → map<K,V>; last key wins like Mongo.
    # array_distinct only merges identical (k,v) PAIRS, so duplicate keys
    # with different values would reach map_from_entries and throw
    # DUPLICATED_MAP_KEY under the default mapKeyDedupPolicy=EXCEPTION.
    # Instead keep, per key, the first occurrence in the REVERSED array
    # (= the last in the original): element i survives iff the first
    # position of its key equals its own position.
    entries = F.transform(ev(args),
                          lambda e: F.struct(e["k"], e["v"]))
    rev = F.reverse(entries)
    keys = F.transform(rev, lambda e: e["k"])
    last_wins = F.filter(
        rev, lambda e, i: F.array_position(keys, e["k"])
        == (i + F.lit(1)).cast("long"))
    return F.map_from_entries(F.reverse(last_wins))


@_op("$getField")
def _get_field(args, ev):
    if isinstance(args, str):
        raise InvalidPipelineError(
            "$getField shorthand needs {field, input} here "
            "(bare-string form reads $$CURRENT, which is unsupported)")
    spec = _spec("$getField", args, ["field", "input"])
    if not isinstance(spec["field"], str):
        raise InvalidPipelineError("$getField: field must be a constant "
                                   "string")
    return ev(spec["input"])[spec["field"]]


# ---------------------------------------------------------------------------
# Conditionals / variables
# ---------------------------------------------------------------------------

@_op("$switch")
def _switch(args, ev):
    spec = _spec("$switch", args, ["branches"], ["default"])
    branches = spec["branches"]
    if not isinstance(branches, Sequence) or not branches:
        raise InvalidPipelineError("$switch requires >=1 branches")
    out = None
    for b in branches:
        bs = _spec("$switch branch", b, ["case", "then"])
        cond, then = ev(bs["case"]).cast("boolean"), ev(bs["then"])
        out = F.when(cond, then) if out is None else out.when(cond, then)
    # Mongo raises when nothing matches and no default exists; a
    # declarative plan cannot abort per-row, so this yields NULL.
    return out.otherwise(ev(spec["default"])) if "default" in spec else out


@_op("$let")
def _let(args, ev):
    spec = _spec("$let", args, ["vars", "in"])
    if not isinstance(spec["vars"], Mapping):
        raise InvalidPipelineError("$let: vars must be a document")
    # Mongo: vars are evaluated in the OUTER scope (no self-reference)
    bound = {name: ev(expr) for name, expr in spec["vars"].items()}
    return ev(spec["in"], bound)


@_op("$literal")
def _literal(args, ev):
    return F.lit(args)


@_op("$and")
def _and(args, ev):
    parts = _args("$and", args, 1, at_least=True)
    out = ev(parts[0]).cast("boolean")
    for p in parts[1:]:
        out = out & ev(p).cast("boolean")
    return out


@_op("$or")
def _or(args, ev):
    parts = _args("$or", args, 1, at_least=True)
    out = ev(parts[0]).cast("boolean")
    for p in parts[1:]:
        out = out | ev(p).cast("boolean")
    return out


@_op("$not")
def _not(args, ev):
    if isinstance(args, Sequence) and not isinstance(args, (str, bytes)):
        (args,) = _args("$not", args, 1)
    return ~ev(args).cast("boolean")


_CONVERT_TYPES = {"int": "int", "long": "long", "double": "double",
                  "string": "string", "bool": "boolean",
                  "date": "timestamp", "decimal": "decimal(38,10)"}


@_op("$convert")
def _convert(args, ev):
    spec = _spec("$convert", args, ["input", "to"],
                 ["onError", "onNull"])
    to = _CONVERT_TYPES.get(spec["to"])
    if to is None:
        raise InvalidPipelineError(
            f"$convert: to must be one of {sorted(_CONVERT_TYPES)}")
    src = ev(spec["input"])
    out = src.try_cast(to)
    if "onError" in spec:
        out = F.when(src.isNotNull() & out.isNull(),
                     ev(spec["onError"]).cast(to)).otherwise(out)
    if "onNull" in spec:
        out = F.when(src.isNull(),
                     ev(spec["onNull"]).cast(to)).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# Strings
# ---------------------------------------------------------------------------

def _regex_quote(s: str) -> str:
    # Java Pattern.quote: wrap in \Q...\E, splicing any embedded \E
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


@_op("$split")
def _split(args, ev):
    s, delim = _args("$split", args, 2)
    if isinstance(delim, str) and not delim.startswith("$"):
        # constant delimiter (the common case): literal-quoted regex
        return F.split(ev(s), _regex_quote(delim))
    # dynamic delimiter: quote at runtime via \Q...\E concat
    pat = F.concat(F.lit("\\Q"), ev(delim), F.lit("\\E"))
    return F.call_function("split", ev(s), pat)


@_op("$replaceOne")
def _replace_one(args, ev):
    spec = _spec("$replaceOne", args,
                 ["input", "find", "replacement"])
    s, find = ev(spec["input"]), ev(spec["find"])
    repl = ev(spec["replacement"])
    idx = F.instr(s, find)
    return F.when(
        idx > 0,
        F.concat(F.substring(s, F.lit(1), idx - 1), repl,
                 F.substring(s, idx + F.length(find),
                             F.length(s))),
    ).otherwise(s)


@_op("$replaceAll")
def _replace_all(args, ev):
    spec = _spec("$replaceAll", args,
                 ["input", "find", "replacement"])
    # F.replace is a literal (non-regex) replace-all — exactly Mongo's
    return F.replace(ev(spec["input"]), ev(spec["find"]),
                     ev(spec["replacement"]))


@_op("$regexMatch")
def _regex_match(args, ev):
    spec = _spec("$regexMatch", args, ["input", "regex"], ["options"])
    opts = spec.get("options", "")
    bad = set(opts) - set("imsx")
    if bad:
        raise InvalidPipelineError(f"$regexMatch: unsupported options "
                                   f"{sorted(bad)}")
    pattern = spec["regex"]
    if isinstance(pattern, str) and not pattern.startswith("$"):
        pat = F.lit((f"(?{opts})" if opts else "") + pattern)
    else:
        pat = ev(pattern)
        if opts:
            pat = F.concat(F.lit(f"(?{opts})"), pat)
    return F.regexp_like(ev(spec["input"]), pat)


@_op("$indexOfCP")
def _index_of_cp(args, ev):
    parts = _args("$indexOfCP", args, 2, at_least=True)
    if len(parts) > 3:
        raise InvalidPipelineError(
            "$indexOfCP supports [string, substring, start?] "
            "(end bound not supported)")
    s, sub = ev(parts[0]), ev(parts[1])
    if len(parts) == 2:
        return (F.instr(s, sub) - 1).cast("int")
    start = ev(parts[2]).cast("int")
    # SQL locate(substr, str, pos) is 1-based; 0 = not found
    found = F.call_function("locate", sub, s, start + 1)
    return (found - 1).cast("int")


@_op("$ltrim")
def _ltrim(args, ev):
    spec = _spec("$ltrim", args, ["input"], ["chars"])
    if "chars" not in spec:
        return F.ltrim(ev(spec["input"]))
    return F.call_function("ltrim", ev(spec["chars"]),
                           ev(spec["input"]))


@_op("$rtrim")
def _rtrim(args, ev):
    spec = _spec("$rtrim", args, ["input"], ["chars"])
    if "chars" not in spec:
        return F.rtrim(ev(spec["input"]))
    return F.call_function("rtrim", ev(spec["chars"]),
                           ev(spec["input"]))


@_op("$strcasecmp")
def _strcasecmp(args, ev):
    a, b = _args("$strcasecmp", args, 2)
    # Mongo treats null/missing as empty string (without the coalesce,
    # every when-branch is null and a null input falls through to 1)
    la = F.lower(F.coalesce(ev(a), F.lit("")))
    lb = F.lower(F.coalesce(ev(b), F.lit("")))
    return F.when(la == lb, 0).when(la < lb, -1).otherwise(1)


# ---------------------------------------------------------------------------
# Math / trig
# ---------------------------------------------------------------------------

_UNARY_MATH = {
    "$exp": F.exp, "$log10": F.log10,
    "$sin": F.sin, "$cos": F.cos, "$tan": F.tan,
    "$asin": F.asin, "$acos": F.acos, "$atan": F.atan,
    "$sinh": F.sinh, "$cosh": F.cosh, "$tanh": F.tanh,
    "$asinh": F.asinh, "$acosh": F.acosh, "$atanh": F.atanh,
    "$degreesToRadians": F.radians,
    "$radiansToDegrees": F.degrees,
    "$toBool": lambda c: c.cast("boolean"),
    "$toLong": lambda c: c.cast("long"),
    "$toDate": lambda c: c.cast("timestamp"),
}

for _name, _fn in _UNARY_MATH.items():
    def _mk(fn):
        return lambda args, ev: fn(ev(args))
    HANDLERS[_name] = _mk(_fn)
    del _mk


@_op("$pow")
def _pow(args, ev):
    a, b = _args("$pow", args, 2)
    return F.pow(ev(a), ev(b))


@_op("$log")
def _log(args, ev):
    a, base = _args("$log", args, 2)
    if isinstance(base, (int, float)) and not isinstance(base, bool):
        return F.log(float(base), ev(a))  # log(base, x)
    return F.log(ev(a)) / F.log(ev(base))


@_op("$atan2")
def _atan2(args, ev):
    y, x = _args("$atan2", args, 2)
    return F.atan2(ev(y), ev(x))


@_op("$trunc")
def _trunc(args, ev):
    if isinstance(args, Sequence) and not isinstance(args, (str, bytes)):
        parts = list(args)
        if len(parts) not in (1, 2):
            raise InvalidPipelineError("$trunc takes [x] or [x, place]")
        x = ev(parts[0])
        place = parts[1] if len(parts) == 2 else 0
        if not isinstance(place, int):
            raise InvalidPipelineError("$trunc: place must be a "
                                       "constant integer")
    else:
        x, place = ev(args), 0
    factor = F.lit(float(10 ** place))
    scaled = x * factor
    # truncate toward zero (floor for +, ceil for −), like Mongo
    return (F.when(x >= 0, F.floor(scaled))
            .otherwise(F.ceil(scaled)) / factor)


def build(op: str, args: Any, env: Mapping[str, Column] | None,
          value_expr: Callable[..., Column]) -> Column | None:
    """Dispatch an extended operator; None when ``op`` is not ours."""
    handler = HANDLERS.get(op)
    if handler is None:
        return None

    def ev(operand: Any, extra: Mapping[str, Column] | None = None):
        scope = dict(env or {})
        if extra:
            scope.update(extra)
        return value_expr(operand, env=scope or None)

    return handler(args, ev)
