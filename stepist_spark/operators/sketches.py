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


def frequent_items(
    df: DataFrame,
    item_col: str,
    capacity: int = 128,
    k: int | None = None,
) -> DataFrame:
    """Heavy hitters via per-partition summarize-then-merge (the
    Misra-Gries/space-saving family shape). Output: ``item, weight``
    for the top ``k`` (default ``capacity``) items by merged weight,
    deterministic item-string tiebreak.

    Stage 1 counts items exactly WITHIN each partition (streamed over
    Arrow batches, one dict per partition — vocabulary-sized, not
    partition-sized) and emits only its top ``capacity`` entries.
    Stage 2 merges summaries with one item-keyed hash aggregation.

    Guarantees: any item with true global count > n/(capacity+1) in
    every partition survives stage 1, and merged weights never
    overcount. When per-partition distinct items ≤ capacity the result
    is EXACT (the oracle-tested regime); otherwise weights are
    undercounts bounded by each partition's dropped tail — the standard
    mergeable-summary trade. At 100 TB the shuffle carries
    ``capacity × partitions`` rows, not the corpus.
    """
    import pandas as pd

    top_k = capacity if k is None else k

    def _partial(batches):
        counts: dict = {}
        for pdf in batches:
            for item, c in pdf[item_col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
        if not counts:
            return
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:capacity]
        yield pd.DataFrame({"item": [t[0] for t in top], "weight": [t[1] for t in top]})

    partials = df.select(F.col(item_col).alias(item_col)).mapInPandas(
        _partial, schema="item string, weight bigint"
    )
    merged = partials.groupBy("item").agg(F.sum("weight").alias("weight"))
    return (
        merged.orderBy(F.col("weight").desc(), F.col("item").asc())
        .limit(top_k)
    )
