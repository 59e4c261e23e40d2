"""Physical-plan introspection and assertions.

The reference has no optimizer (SURVEY.md §4.1) — here Catalyst is the
optimizer, and at 100 TB the physical plan IS the performance contract:
a dimension join that doesn't broadcast, a filter that doesn't reach
the parquet scan, or an aggregate without map-side combine each turn
into cluster-scale regressions. This module makes those properties
assertable, so tests pin the plan shape, not just the result values.
"""

from stepist_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_partial_aggregate,
    join_strategies,
    plan_summary,
    pushed_filters,
    scan_columns,
    unpartitioned_windows,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_partial_aggregate",
    "join_strategies",
    "plan_summary",
    "pushed_filters",
    "scan_columns",
    "unpartitioned_windows",
]
