"""Skyline (Pareto-frontier) query: the rows not dominated by any
other row — ``b`` dominates ``a`` when b is no worse on BOTH
dimensions and strictly better on at least one. The classic
multi-criteria shortlist operator (Börzsönyi et al., ICDE'01,
public): "cheapest AND earliest" orders, "smallest AND highest-
quality" documents.

The reference has no relational surface (SURVEY.md §2.2); this
extends the subquery family (the skyline predicate IS a correlated
NOT EXISTS — which is exactly how the oracle verifies it).

Spark-first shape — no self-join, no NOT EXISTS: ordered by x inside
each group, a row is dominated iff

  (1)  min(y) over {x' <  x}  <= y      (some b: b.x < a.x, b.y <= a.y)
  (2)  min(y) over {x' <= x}  <  y      (some b: b.x <= a.x, b.y < a.y)

two RANGE-frame windows sharing one sort. Duplicate (x, y) points
never dominate each other, so all copies survive — same as the
NOT EXISTS formulation.

Scale path (``prefilter=True``): every global-skyline row is also on
the skyline of ANY subset containing it, so a partition-local pass
(the same windows, partitioned by input partition id) first shrinks
each partition to its local frontier — expected O(log n) rows per
partition for independent dims — and only the tiny survivor union
takes the per-group global sort. At 100 TB the full table never
shuffles; layout only affects the intermediate, not the result.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stepist_spark.operators.cumulative import grouped_frame


def _dominated(y: "F.Column", w) -> "F.Column":
    strict = F.min(y).over(w.rangeBetween(Window.unboundedPreceding, -1))
    incl = F.min(y).over(w.rangeBetween(Window.unboundedPreceding, 0))
    return F.coalesce(strict <= y, F.lit(False)) | (incl < y)


def skyline(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    prefilter: bool = True,
) -> DataFrame:
    """Keep each group's Pareto frontier, MINIMIZING integer columns
    ``x_col`` and ``y_col`` (negate upstream to maximize). Rows with a
    NULL dimension are dropped (they can neither dominate nor be
    ranked). ``x_col`` must be numeric — the dominance windows use
    RANGE frames over it.
    """
    gcols = list(group_cols)
    pts = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    y = F.col(y_col)
    if prefilter:
        local = pts.withColumn("_sky_pid", F.spark_partition_id())
        wl = Window.partitionBy(*gcols, "_sky_pid").orderBy(F.col(x_col).asc())
        pts = (
            local.withColumn("_sky_dom", _dominated(y, wl))
            .filter(~F.col("_sky_dom"))
            .drop("_sky_pid", "_sky_dom")
        )
    # grouped_frame: the ungrouped (default) call keeps an explicit
    # lit(0) key — after the prefilter the global pass sees only the
    # union of per-partition frontiers, bounded in practice
    wg = grouped_frame(gcols, F.col(x_col).asc())
    return (
        pts.withColumn("_sky_dom", _dominated(y, wg))
        .filter(~F.col("_sky_dom"))
        .drop("_sky_dom")
    )


def skyline_not_exists_sql(
    points_sql: str,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    select_cols: str = "a.*",
) -> str:
    """The ALGORITHM-INDEPENDENT witness: brute-force correlated
    NOT EXISTS over the same points — for oracles and tests.
    ``points_sql`` must project plain columns named ``x_col``,
    ``y_col`` and ``group_cols`` (compute expressions inside it)."""
    same_group = " AND ".join(f"b.{g} = a.{g}" for g in group_cols) or "TRUE"
    x, y = x_col, y_col
    return f"""
SELECT {select_cols} FROM ({points_sql}) a
WHERE a.{x} IS NOT NULL AND a.{y} IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM ({points_sql}) b
    WHERE {same_group}
      AND b.{x} <= a.{x} AND b.{y} <= a.{y}
      AND (b.{x} < a.{x} OR b.{y} < a.{y})
)
"""
