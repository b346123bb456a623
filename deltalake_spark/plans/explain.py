"""Physical-plan summary + assertions over Spark's executed plan."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# plan toString() truncates long attribute lists ("..." with no closing
# bracket) — match to end-of-line, then trim
_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]\n]*)")


@dataclass
class PlanSummary:
    scans: int = 0
    scans_with_pushdown: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    shuffles: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    window_ops: int = 0
    codegen_stages: int = 0
    text: str = ""

    @property
    def joins(self) -> int:
        return (self.broadcast_joins + self.sort_merge_joins
                + self.shuffled_hash_joins + self.nested_loop_joins
                + self.cartesian_products)


def plan_summary(df: DataFrame) -> PlanSummary:
    """Parse the executed physical plan into countable facts."""
    text = df._jdf.queryExecution().executedPlan().toString()
    s = PlanSummary(text=text)
    s.scans = text.count("FileScan")
    for m in _PUSHED_RE.finditer(text):
        inner = m.group(1).strip().rstrip(".").strip()
        if inner:
            s.scans_with_pushdown += 1
            s.pushed_filters.extend(
                p.strip() for p in inner.split(",") if p.strip())
    s.shuffles = text.count("Exchange hashpartitioning") + \
        text.count("Exchange rangepartitioning")
    s.broadcast_joins = text.count("BroadcastHashJoin")
    s.sort_merge_joins = text.count("SortMergeJoin")
    s.shuffled_hash_joins = text.count("ShuffledHashJoin")
    s.nested_loop_joins = text.count("BroadcastNestedLoopJoin")
    s.cartesian_products = text.count("CartesianProduct")
    s.window_ops = text.count("Window")
    s.codegen_stages = text.count("WholeStageCodegen")
    return s


def assert_plan(
    df: DataFrame,
    *,
    max_shuffles: int | None = None,
    require_pushdown: bool = False,
    forbid_nested_loop: bool = True,
    forbid_cartesian: bool = True,
    require_broadcast_joins: int | None = None,
) -> PlanSummary:
    """Assert scale-critical plan properties; returns the summary so
    callers can make further checks. Raises AssertionError with the plan
    text on violation."""
    s = plan_summary(df)

    def _fail(msg: str):
        raise AssertionError(f"{msg}\n--- plan ---\n{s.text}")

    if forbid_cartesian and s.cartesian_products:
        _fail(f"{s.cartesian_products} CartesianProduct node(s)")
    if forbid_nested_loop and s.nested_loop_joins:
        _fail(f"{s.nested_loop_joins} BroadcastNestedLoopJoin node(s)")
    if max_shuffles is not None and s.shuffles > max_shuffles:
        _fail(f"{s.shuffles} shuffles > budget {max_shuffles}")
    if require_pushdown and s.scans and not s.scans_with_pushdown:
        _fail("no scan received pushed filters")
    if require_broadcast_joins is not None \
            and s.broadcast_joins < require_broadcast_joins:
        _fail(f"{s.broadcast_joins} broadcast joins "
              f"< required {require_broadcast_joins}")
    return s
