"""Mergeable sketches: the at-scale answer for distinct counts.

An exact COUNT(DISTINCT x) at 100 TB shuffles every distinct value; a
Datasketches HLL sketch is a few KB per group, merges associatively,
and can be PRE-AGGREGATED: build sketches per partition/day once, then
answer any rollup (per week, per region, total) by merging sketches —
no rescan of the raw data. This is the pattern behind every serious
"distinct users per X" pipeline.

All built on Spark's native HLL functions (JVM, Datasketches-
compatible binary representation) — no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sketches(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    sketch_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per key group — the materialized,
    mergeable form of a distinct count (store this, not the raw data).
    ``lg_k`` trades size (2^lg_k buckets) for error (~1.04/sqrt(2^lg_k),
    ≈1.6% at the default)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*key_list).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge pre-built sketches up to a coarser key set and estimate.

    The merge is a tiny shuffle of fixed-size binaries — the raw data
    is never touched again.
    """
    merged = sketches.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def estimate(sketches: DataFrame, sketch_col: str = "sketch", estimate_col: str = "approx_distinct") -> DataFrame:
    return sketches.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)
