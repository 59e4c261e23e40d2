"""Top-k operators.

Global top-k: ``orderBy().limit(k)`` — Spark plans this as
TakeOrderedAndProject: each partition keeps a k-heap, the driver merges
k·partitions rows; no full sort, no full shuffle. Per-group top-k:
row_number window ≤ k — one sort-shuffle on the group key.
Deterministic tiebreaks are mandatory (the oracle gate compares sets,
but the k-boundary must cut identically in both engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stepist_spark.operators.cumulative import require_groups


def global_topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    group_cols = require_groups(
        group_cols, "grouped_topk", "use global_topk (TakeOrderedAndProject)"
    )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
