"""Property-based differential testing of the aggregation-pipeline
translator (reference executor: aggregate(), src/query/index.ts:1722-1770).

A pure-Python mini-executor re-implements the reference's stage semantics;
hypothesis generates random pipelines ($match → $unwind → $group → $sort/
$limit/$skip) and results are compared order-insensitively (or ordered,
after a unique-key $sort).

Documented deliberate deltas from the JS reference (SQL semantics, chosen
for DuckDB-oracle alignment): aggregates over zero non-null values return
NULL (the reference's $sum would return 0); $addToSet drops nulls
(collect_set). The Python executor below implements OUR semantics — the
test pins the translator, the oracle gate pins us to SQL.
"""

from __future__ import annotations

import math
import statistics
from typing import Any

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deltalake_spark.functions.pipeline import apply_pipeline
from tests.test_filter_properties import py_matches

ROWS = [
    {"_id": i, "cat": cat, "b": b, "x": x, "tags": tags}
    for i, (cat, b, x, tags) in enumerate([
        ("A", True, 1, ["p", "q"]),
        ("A", False, None, ["p"]),
        ("B", True, 5, []),
        ("B", True, 7, None),
        ("B", False, 2, ["q", "r", "q"]),
        ("C", True, None, ["r"]),
        ("C", False, 2, ["p", "r"]),
        (None, True, 3, ["q"]),
        ("A", True, -4, None),
        ("C", False, 2, []),
    ])
]


# -- python mini-executor ----------------------------------------------------

def _exec_unwind(rows: list[dict]) -> list[dict]:
    out = []
    for r in rows:
        for tag in (r.get("tags") or []):
            out.append({**r, "tags": tag})
    return out


def _operand(row: dict, operand: Any) -> Any:
    if isinstance(operand, str) and operand.startswith("$"):
        return row.get(operand[1:])
    if isinstance(operand, dict):
        (op, args), = operand.items()
        vals = [_operand(row, a) for a in args]
        if any(v is None for v in vals):
            return None
        acc = vals[0]
        for v in vals[1:]:
            acc = {"$add": acc + v, "$subtract": acc - v,
                   "$multiply": acc * v}[op]
        return acc
    return operand


def _acc(rows: list[dict], spec: dict) -> Any:
    (op, operand), = spec.items()
    if op == "$count":
        return len(rows)
    if op == "$sum" and not (
        isinstance(operand, str) and operand.startswith("$")
    ) and not isinstance(operand, dict):
        return len(rows) * operand
    vals = [v for v in (_operand(r, operand) for r in rows) if v is not None]
    if op == "$sum":
        return sum(vals) if vals else None
    if op == "$avg":
        return sum(vals) / len(vals) if vals else None
    if op == "$min":
        return min(vals) if vals else None
    if op == "$max":
        return max(vals) if vals else None
    if op == "$addToSet":
        return tuple(sorted(set(vals), key=repr))
    if op == "$stdDevPop":
        return statistics.pstdev(vals) if vals else None
    if op == "$stdDevSamp":
        return statistics.stdev(vals) if len(vals) >= 2 else None
    raise AssertionError(op)


def _exec_group(rows: list[dict], spec: dict) -> list[dict]:
    key = spec["_id"]
    groups: dict[Any, list[dict]] = {}
    for r in rows:
        if key is None:
            k = None
        elif isinstance(key, str):
            k = r.get(key[1:])
        else:
            k = tuple(_operand(r, v) for v in key.values())
        groups.setdefault(k, []).append(r)
    out = []
    for k, members in groups.items():
        doc = {"_id": k}
        for name, acc in spec.items():
            if name != "_id":
                doc[name] = _acc(members, acc)
        out.append(doc)
    return out


def py_pipeline(rows: list[dict], pipeline: list[dict]) -> tuple[list, bool]:
    """Returns (result rows, ordered) — ordered=True when a final unique
    $sort makes row order deterministic."""
    cur = [dict(r) for r in rows]
    ordered = False
    for stage in pipeline:
        (op, spec), = stage.items()
        if op == "$match":
            cur = [r for r in cur if py_matches(r, spec)]
        elif op == "$unwind":
            cur = _exec_unwind(cur)
        elif op == "$group":
            cur = _exec_group(cur, spec)
            ordered = False
        elif op == "$sort":
            cur = sorted(
                cur, key=lambda r: (r["_id"] is not None, r["_id"])
                if not isinstance(r["_id"], tuple)
                else (True, tuple((v is not None, v) for v in r["_id"]))
            )
            ordered = True
        elif op == "$limit":
            cur = cur[:spec]
        elif op == "$skip":
            cur = cur[spec:]
        else:
            raise AssertionError(op)
    return cur, ordered


# -- canonicalization --------------------------------------------------------

def _canon(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(sorted((_canon(x) for x in v), key=repr))
    return v


def canon_rows(dicts: list[dict], cols: list[str]) -> list[tuple]:
    return [tuple(_canon(d.get(c)) for c in cols) for d in dicts]


# -- strategies --------------------------------------------------------------

MATCHES = [
    {"cat": "A"}, {"cat": {"$in": ["A", "B"]}}, {"x": {"$gte": 2}},
    {"b": True}, {"x": {"$ne": 2}}, {"$or": [{"cat": "C"}, {"x": {"$lt": 0}}]},
]
ACCS = [
    ("n", {"$count": True}),
    ("total", {"$sum": "$x"}),
    ("cnt2", {"$sum": 2}),
    ("mean", {"$avg": "$x"}),
    ("lo", {"$min": "$x"}),
    ("hi", {"$max": "$x"}),
    ("sp", {"$stdDevPop": "$x"}),
    ("ss", {"$stdDevSamp": "$x"}),
    ("cats", {"$addToSet": "$cat"}),
    ("xp1", {"$sum": {"$add": ["$x", 1]}}),
]
KEYS = [None, "$cat", "$b", {"c": "$cat", "b": "$b"}]


@st.composite
def pipelines(draw):
    p = []
    if draw(st.booleans()):
        p.append({"$match": draw(st.sampled_from(MATCHES))})
    if draw(st.booleans()):
        p.append({"$unwind": "$tags"})
    accs = draw(st.lists(st.sampled_from(ACCS), min_size=1, max_size=3,
                         unique_by=lambda a: a[0]))
    p.append({"$group": {"_id": draw(st.sampled_from(KEYS)),
                         **dict(accs)}})
    if draw(st.booleans()):
        p.append({"$sort": {"_id": 1}})
        tail = draw(st.sampled_from([None, {"$limit": 2}, {"$skip": 1}]))
        if tail:
            p.append(tail)
    return p


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.createDataFrame(
        [(r["_id"], r["cat"], r["b"], r["x"], r["tags"]) for r in ROWS],
        "_id long, cat string, b boolean, x long, tags array<string>",
    )


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pipeline=pipelines())
def test_pipeline_matches_reference_executor(pdf, pipeline):
    # drop the original _id before $group renames it (doc rows keep theirs
    # only until the group stage, same as the reference)
    spark_rows = [r.asDict() for r in apply_pipeline(pdf, pipeline).collect()]
    py_rows, ordered = py_pipeline(ROWS, pipeline)

    # normalize spark struct _id → tuple
    for r in spark_rows:
        if hasattr(r.get("_id"), "__fields__"):
            r["_id"] = tuple(r["_id"])
    cols = sorted({c for r in py_rows for c in r})
    got = canon_rows(spark_rows, cols)
    want = canon_rows(py_rows, cols)
    if not ordered:
        got, want = sorted(got, key=repr), sorted(want, key=repr)
    assert got == want, f"pipeline {pipeline!r}\n got {got}\nwant {want}"
