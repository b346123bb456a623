"""Property-based differential testing of the filter translator.

A pure-Python matcher re-implements the reference's row-at-a-time
semantics (matchesFilter, /root/reference/src/query/index.ts:255-494:
two-valued logic, null never satisfies ranges/$eq/$in, $ne/$nin match
null, $not complements). Hypothesis generates random filters; every
batch is evaluated in ONE Spark job (all filters as boolean columns) and
compared row-by-row against the Python matcher.

The reference itself has no property-based tests (SURVEY §5) — this is
our upgrade on its strategy.
"""

from __future__ import annotations

import re
from typing import Any

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deltalake_spark.functions.filters import translate_filter

# -- fixed row universe (nulls in every column) ------------------------------

ROWS = [
    {"rid": i, "a": a, "s": s}
    for i, (a, s) in enumerate([
        (None, None),
        (0, ""),
        (1, "alpha"),
        (5, "beta"),
        (7, None),
        (None, "gamma"),
        (-3, "alp"),
        (10, "delta"),
        (5, "beta"),
        (2, "Alpha"),
    ])
]

INT_VALUES = [-3, 0, 1, 2, 5, 7, 10, 42]
STR_VALUES = ["", "alpha", "beta", "gamma", "alp", "Alpha", "zzz"]
REGEXES = ["^al", "a$", "lp", "^$", "a.*a", "^(be|ga)"]


# -- reference-faithful Python matcher ---------------------------------------

def _cmp_ops(value: Any, ops: dict[str, Any]) -> bool:
    result = True
    for op, operand in ops.items():
        if op == "$eq":
            ok = value is not None and value == operand
        elif op == "$ne":
            ok = value is None or value != operand
        elif op == "$gt":
            ok = value is not None and value > operand
        elif op == "$gte":
            ok = value is not None and value >= operand
        elif op == "$lt":
            ok = value is not None and value < operand
        elif op == "$lte":
            ok = value is not None and value <= operand
        elif op == "$in":
            ok = value is not None and value in operand
        elif op == "$nin":
            ok = value is None or value not in operand
        elif op == "$exists":
            ok = (value is not None) if operand else (value is None)
        elif op == "$regex":
            ok = value is not None and re.search(operand, value) is not None
        elif op == "$not":
            ok = not _cmp_ops(value, operand)
        else:
            raise AssertionError(op)
        result = result and ok
    return result


def py_matches(row: dict[str, Any], flt: dict[str, Any]) -> bool:
    for key, value in flt.items():
        if key == "$and":
            if not all(py_matches(row, f) for f in value):
                return False
        elif key == "$or":
            if not any(py_matches(row, f) for f in value):
                return False
        elif key == "$nor":
            if any(py_matches(row, f) for f in value):
                return False
        elif key == "$not":
            if py_matches(row, value):
                return False
        elif isinstance(value, dict) and value and \
                all(k.startswith("$") for k in value):
            if not _cmp_ops(row.get(key), value):
                return False
        else:
            v = row.get(key)
            if v is None or v != value:
                return False
    return True


# -- filter strategies -------------------------------------------------------

int_ops = st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])
str_ops = st.sampled_from(["$eq", "$ne"])


def leaf_filter() -> st.SearchStrategy[dict]:
    int_cmp = st.builds(
        lambda op, v: {"a": {op: v}}, int_ops, st.sampled_from(INT_VALUES)
    )
    str_cmp = st.builds(
        lambda op, v: {"s": {op: v}}, str_ops, st.sampled_from(STR_VALUES)
    )
    bare = st.one_of(
        st.builds(lambda v: {"a": v}, st.sampled_from(INT_VALUES)),
        st.builds(lambda v: {"s": v}, st.sampled_from(STR_VALUES)),
    )
    in_nin = st.builds(
        lambda op, vs: {"a": {op: vs}},
        st.sampled_from(["$in", "$nin"]),
        st.lists(st.sampled_from(INT_VALUES), min_size=1, max_size=4),
    )
    exists = st.builds(
        lambda col, b: {col: {"$exists": b}},
        st.sampled_from(["a", "s"]), st.booleans(),
    )
    regex = st.builds(lambda p: {"s": {"$regex": p}},
                      st.sampled_from(REGEXES))
    rng = st.builds(
        lambda lo, hi: {"a": {"$gte": lo, "$lt": hi}},
        st.sampled_from(INT_VALUES), st.sampled_from(INT_VALUES),
    )
    return st.one_of(int_cmp, str_cmp, bare, in_nin, exists, regex, rng)


def filters(max_depth: int = 3) -> st.SearchStrategy[dict]:
    if max_depth == 0:
        return leaf_filter()
    sub = filters(max_depth - 1)
    return st.one_of(
        leaf_filter(),
        st.builds(lambda fs: {"$and": fs},
                  st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda fs: {"$or": fs},
                  st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda fs: {"$nor": fs},
                  st.lists(sub, min_size=1, max_size=2)),
        st.builds(lambda f: {"$not": f}, sub),
    )


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.createDataFrame(
        [(r["rid"], r["a"], r["s"]) for r in ROWS],
        "rid long, a long, s string",
    )


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(filters(), min_size=15, max_size=30))
def test_translator_matches_reference_semantics(pdf, batch):
    # evaluate the whole batch in one Spark job: one boolean column each
    cols = [
        translate_filter(f).alias(f"c{i}") for i, f in enumerate(batch)
    ]
    rows = pdf.select(F.col("rid"), *cols).collect()
    spark_result = {
        i: {r["rid"] for r in rows if r[f"c{i}"]}
        for i in range(len(batch))
    }
    for i, flt in enumerate(batch):
        expected = {r["rid"] for r in ROWS if py_matches(r, flt)}
        assert spark_result[i] == expected, (
            f"filter {flt!r}: spark={sorted(spark_result[i])} "
            f"expected={sorted(expected)}"
        )
