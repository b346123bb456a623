"""Plan-quality inspection: make 100 TB-readiness checkable in code.

The reference engine has no plan layer at all (the pipeline IS the plan,
executed eagerly — SURVEY §3); Catalyst gives us a real physical plan, and
this module turns "read the explain output" into assertions that tests and
CI can run. Every operator in this engine is expected to keep its plan
shape as the data grows 1000×: filters pushed to the scan, small sides
broadcast, no nested-loop joins, bounded shuffle count.
"""

from deltalake_spark.plans.explain import (
    assert_plan,
    plan_summary,
)

__all__ = ["plan_summary", "assert_plan"]
