"""Read properties off a DataFrame's physical plan.

All helpers parse the formatted explain output — the same text a human
reads — so assertions track exactly what `.explain("formatted")`
shows. With AQE enabled the initial plan may still contain exchange
placeholders; these helpers look at the statically planned operators
(broadcast decisions made by AQE at runtime additionally appear in
`df.queryExecution().executedPlan` after an action, which
``executed_plan_str`` exposes).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan_str(df: DataFrame) -> str:
    """The adaptive, post-execution physical plan (run an action first)."""
    return df._jdf.queryExecution().executedPlan().toString()


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators, in plan order."""
    return _JOIN_RE.findall(explain_str(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when the aggregate combines map-side before the shuffle
    (a partial-mode HashAggregate below the exchange)."""
    plan = explain_str(df)
    return "partial_" in plan or plan.count("HashAggregate") >= 2


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the scan pushed into the parquet reader."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", explain_str(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column sets actually read by each scan (ReadSchema) — the
    observable form of column pruning."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def plan_summary(df: DataFrame) -> dict:
    plan = explain_str(df)
    return {
        "joins": _JOIN_RE.findall(plan),
        "exchanges": plan.count("Exchange"),
        "scans": plan.count("Scan parquet"),
        "pushed_filters": pushed_filters(df),
        "scan_columns": scan_columns(df),
        "has_take_ordered": "TakeOrderedAndProject" in plan,
    }


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window-family nodes in the OPTIMIZED logical plan whose partition
    spec is EMPTY — the shape that moves the whole frame onto one task
    (and logs ``WARN WindowExec: No Partition Defined``). The session
    excludes Spark 4's EliminateWindowPartitions, so the explicit
    ``lit(0)`` key of ``whole_frame()`` survives optimization and a hit
    here is always a real unbounded-window regression, never the
    declared bounded pattern. Returns one ``NodeClass@line`` marker per
    offending node (empty list == hygienic plan)."""
    import json

    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    out = []
    for n in nodes:
        cls = n.get("class", "").rsplit(".", 1)[-1]
        if cls in ("Window", "WindowGroupLimit") and not n.get("partitionSpec"):
            out.append(cls)
    return out
