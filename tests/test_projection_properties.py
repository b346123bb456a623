"""Property-based differential testing of the projection translator
(reference applyProjection, src/query/index.ts:768-930): random
inclusion/exclusion projections over nested documents, compared against
a reference-faithful Python implementation.

Documented delta: nested INCLUSION surfaces the leaf under its dotted
alias (flat column "u.city") rather than rebuilding the struct skeleton
— the values compared here are identical, only the shape differs, so the
Python side mirrors our flattened form for inclusions and the reference's
structural delete for exclusions.
"""

from __future__ import annotations

from typing import Any

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deltalake_spark.functions.projection import apply_projection

ROWS = [
    {"_id": i, "a": a, "b": b, "u": u}
    for i, (a, b, u) in enumerate([
        (1, "x", {"city": "SF", "zip": "94", "geo": {"lat": 1.0, "lon": 2.0}}),
        (2, "y", {"city": "NY", "zip": "10", "geo": {"lat": 3.0, "lon": 4.0}}),
        (None, "z", {"city": None, "zip": "73", "geo": {"lat": 5.0, "lon": 6.0}}),
        (4, None, {"city": "LA", "zip": None, "geo": {"lat": 7.0, "lon": 8.0}}),
    ])
]

SCHEMA = ("_id long, a long, b string, "
          "u struct<city:string, zip:string, geo:struct<lat:double, lon:double>>")

TOP = ["_id", "a", "b", "u"]
NESTED = ["u.city", "u.zip", "u.geo", "u.geo.lat", "u.geo.lon"]


def _get_path(doc: dict, path: str) -> Any:
    cur: Any = doc
    for seg in path.split("."):
        if not isinstance(cur, dict) or seg not in cur:
            return None
        cur = cur[seg]
    return cur


def _delete_path(doc: dict, path: str) -> None:
    segs = path.split(".")
    cur = doc
    for seg in segs[:-1]:
        nxt = cur.get(seg)
        if not isinstance(nxt, dict):
            return
        cur = nxt
    cur.pop(segs[-1], None)


def py_project(rows: list[dict], projection: Any) -> list[dict]:
    if isinstance(projection, (list, tuple)):
        incl = list(projection)
    else:
        incl = [k for k, v in projection.items() if v]
        excl = [k for k, v in projection.items() if not v]
        if excl:
            out = []
            for r in rows:
                import copy

                c = copy.deepcopy(r)
                for p in excl:
                    _delete_path(c, p)
                out.append(c)
            return out
    return [{p: _get_path(r, p) for p in incl} for r in rows]


def _flatten(v: Any) -> Any:
    """Spark Row / struct → plain dict for comparison."""
    if hasattr(v, "asDict"):
        return {k: _flatten(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _flatten(x) for k, x in v.items()}
    return v


incl_paths = st.lists(st.sampled_from(TOP + NESTED), min_size=1,
                      max_size=4, unique=True)
excl_paths = st.lists(st.sampled_from(["a", "b", "u.zip", "u.geo.lat",
                                       "u.geo", "u.city"]),
                      min_size=1, max_size=3, unique=True)
projections = st.one_of(
    incl_paths,                                        # list form
    incl_paths.map(lambda ps: {p: 1 for p in ps}),     # {p:1} inclusion
    excl_paths.map(lambda ps: {p: 0 for p in ps}),     # {p:0} exclusion
)


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.createDataFrame(
        [(r["_id"], r["a"], r["b"],
          (r["u"]["city"], r["u"]["zip"],
           (r["u"]["geo"]["lat"], r["u"]["geo"]["lon"])))
         for r in ROWS],
        SCHEMA,
    )


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(projection=projections)
def test_projection_matches_reference(pdf, projection):
    spark_rows = [
        {k: _flatten(v) for k, v in r.asDict().items()}
        for r in apply_projection(pdf, projection).collect()
    ]
    py_rows = py_project(ROWS, projection)
    is_exclusion = isinstance(projection, dict) and \
        any(not v for v in projection.values())
    if is_exclusion:
        # struct fields survive as null-ed slots only when the whole
        # struct was dropped; compare field-sets per top-level column
        assert len(spark_rows) == len(py_rows)
        for s, p in zip(spark_rows, py_rows):
            assert set(s) == set(p), (projection, s, p)
            for col in s:
                sv, pv = s[col], p[col]
                if isinstance(pv, dict):
                    assert isinstance(sv, dict)
                    for k2 in pv:
                        assert _norm(sv.get(k2)) == _norm(pv[k2]), \
                            (projection, col, k2, sv, pv)
                else:
                    assert _norm(sv) == _norm(pv), (projection, col, s, p)
    else:
        assert spark_rows == py_rows or [
            {k: _flatten(v) for k, v in r.items()} for r in py_rows
        ] == spark_rows, (projection, spark_rows, py_rows)


def _norm(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    return v
