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


# --------------------------------------------------------------------------
# Portable HLL: an HyperLogLog whose registers derive from the repo's
# md5 hash (functions.hashing.span_hash60), so an independent engine
# (the DuckDB oracle) recomputes BIT-IDENTICAL registers — making even
# the approximation hash-checkable. The register sum is integer-scaled
# (each register contributes 2^(SCALE_BITS - M), an exact bigint), so
# the harmonic-mean denominator is order-independent; only the final
# alpha·m²·2^SCALE/S division (correctly rounded) and the small-range
# ln() correction (rounded to 4 dp) touch floating point.
#
# Native Datasketches HLL (build_sketches/rollup_sketches above) stays
# the production path — identical API shape; this is the engine-
# portable variant and the driver-gate subject (q21).
HLL_P = 9  # 512 registers, ~4.6% standard error
HLL_SCALE_BITS = 52


def hll_alpha_mm(p: int = HLL_P) -> float:
    m = 1 << p
    return (0.7213 / (1 + 1.079 / m)) * m * m


def portable_hll_registers(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Per-group HLL register table: ``*keys, bucket, reg`` (max rho).

    bucket = low ``p`` bits of the 60-bit portable hash; rho = leading-
    zero rank of the remaining ``60-p`` bits (via binary-string length —
    integer-exact on any engine). Registers MERGE by max(reg): rolling
    up to coarser keys is another groupBy-max over kilobyte-scale
    register rows, never the raw data — same pattern as the native
    sketch path.
    """
    from stepist_spark.functions.hashing import span_hash60

    key_list = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p
    maxbits = 60 - p
    h = span_hash60(F.col(value_col).cast("string"))
    # integer shift, NOT division — `/` is double division and a 60-bit
    # hash exceeds the 2^53 exact-integer range of doubles
    w = F.shiftright(h, p)
    nbits = F.length(F.conv(w, 10, 2))
    rho = F.when(w == 0, F.lit(maxbits + 1)).otherwise(F.lit(maxbits + 1) - nbits)
    hashed = df.select(
        *key_list,
        F.pmod(h, F.lit(m)).cast("int").alias("bucket"),
        rho.cast("int").alias("_rho"),
    )
    return hashed.groupBy(*key_list, "bucket").agg(F.max("_rho").alias("reg"))


def portable_hll_merge(
    registers: DataFrame, keys: str | Sequence[str]
) -> DataFrame:
    """Merge register tables up to a coarser key set (max per bucket)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return registers.groupBy(*key_list, "bucket").agg(F.max("reg").alias("reg"))


def portable_hll_estimate(
    registers: DataFrame,
    keys: str | Sequence[str],
    p: int = HLL_P,
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Group estimates from a register table, engine-portable:
    S = Σ 2^(SCALE-reg) over present registers + zeros·2^SCALE (exact
    bigints), E = alpha·m²·2^SCALE / S, with the standard small-range
    linear-counting correction when empty registers remain. Rounded to
    4 dp (the ln() in the correction is the one not-correctly-rounded
    libm call in the pipeline)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p
    grouped = registers.groupBy(*key_list).agg(
        # expr(): pyspark's shiftleft() insists on a literal bit count
        F.sum(F.expr(f"shiftleft(1L, {HLL_SCALE_BITS} - reg)")).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_present"),
    )
    zeros = F.lit(m) - F.col("_n_present")
    s_total = F.col("_s_present") + zeros * F.shiftleft(
        F.lit(1).cast("bigint"), HLL_SCALE_BITS
    )
    raw = F.lit(hll_alpha_mm(p)) * F.lit(float(1 << HLL_SCALE_BITS)) / s_total
    corrected = F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return grouped.select(
        *key_list, F.round(corrected, 4).alias(estimate_col)
    )


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
