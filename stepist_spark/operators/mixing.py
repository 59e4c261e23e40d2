"""Corpus-mixing primitives: water-filling token-budget allocation
across sources and deterministic quota sampling to realize it — the
data-mixture assembly step of a large-scale training pipeline (given
a total token budget, take as much as possible from small sources and
cap the large ones at a common level; the max-min fair allocation of
networking literature applied to corpus mixing, cf. the
source-balancing discussed around The Pile / DoReMi — public).

The reference has no analytics surface (SURVEY.md §2.2); this is the
LLM-pipeline extension family (corpus assembly, next to temperature
resampling in operators/sampling.py — waterfilling is its hard-cap
dual: temperature softens ratios, waterfilling enforces a budget).

Cross-engine exactness: the saturation test per source is a pure
integer inequality (``prefix_r + a_r·(k−r) <= B`` over the
availability-sorted frame), the common level is the exact rational
``(B − S_sat)/(k − m)``, and unsaturated sources get its integer
floor — everything bigint, no floats anywhere.

Spark-first shape: the operator runs entirely over the |sources|-row
availability frame (windows over a tiny table); the quota take is one
hash-rank window per source over the corpus — the one scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def waterfill_allocation(
    avail: DataFrame,
    key_col: str,
    avail_col: str,
    budget: int,
) -> DataFrame:
    """Max-min fair (water-filling) allocation of ``budget`` units
    across sources with availabilities ``a_s``: every source gets
    ``min(a_s, t)`` where the level t solves ``Σ min(a_s, t) = B``.

    A source is SATURATED (fully taken) iff serving every source at
    least its own availability is affordable: with the frame sorted
    ascending by (a, key) and r the 1-based position,
    ``prefix_r + a_r·(k−r) <= B`` — an exact bigint test. Unsaturated
    sources receive ``(B − S_sat) DIV (k − m)`` (the floored exact
    level; the floor undershoots the budget by < k units — callers
    wanting exhaustion can hand the remainder to any source).
    If ``Σ a_s <= B`` every source saturates and the budget is slack.

    Output: ``key, avail, allocated, saturated`` (allocated <= avail,
    Σ allocated <= budget).
    """
    a = avail.select(
        F.col(key_col).alias("key"), F.col(avail_col).cast("bigint").alias("avail")
    )
    from stepist_spark.operators.cumulative import whole_frame

    # |sources| rows (dozens) — bounded frame, explicit single-task
    w_ord = whole_frame(F.col("avail").asc(), F.col("key").asc())
    w_all = whole_frame()
    st = a.select(
        "key",
        "avail",
        F.sum("avail").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "_prefix"
        ),
        F.row_number().over(w_ord).alias("_r"),
        F.count(F.lit(1)).over(w_all).alias("_k"),
    )
    sat = F.col("_prefix") + F.col("avail") * (F.col("_k") - F.col("_r")) <= F.lit(
        budget
    )
    st = st.withColumn("saturated", sat)
    st = st.select(
        "key",
        "avail",
        "saturated",
        "_k",
        F.sum(F.when(F.col("saturated"), F.col("avail")).otherwise(F.lit(0)))
        .over(w_all)
        .alias("_ssat"),
        F.sum(F.col("saturated").cast("int")).over(w_all).alias("_m"),
    )
    level = F.expr(f"({budget}L - _ssat) div (_k - _m)")
    return st.select(
        "key",
        "avail",
        F.when(F.col("saturated"), F.col("avail"))
        .otherwise(level)
        .cast("bigint")
        .alias("allocated"),
        "saturated",
    )


def waterfill_allocation_sql(
    avail_sql: str,
    key_col: str,
    avail_col: str,
    budget: int,
) -> str:
    """DuckDB mirror of :func:`waterfill_allocation`."""
    return f"""
WITH _a AS (
    SELECT {key_col} AS key, CAST({avail_col} AS BIGINT) AS avail
    FROM ({avail_sql})
),
_st AS (
    SELECT key, avail,
           sum(avail) OVER (ORDER BY avail, key
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _prefix,
           row_number() OVER (ORDER BY avail, key) AS _r,
           count(*) OVER () AS _k
    FROM _a
),
_sat AS (
    SELECT *, (_prefix + avail * (_k - _r) <= {budget}) AS saturated
    FROM _st
),
_tot AS (
    SELECT *,
           sum(CASE WHEN saturated THEN avail ELSE 0 END) OVER () AS _ssat,
           sum(CASE WHEN saturated THEN 1 ELSE 0 END) OVER () AS _m
    FROM _sat
)
SELECT key, avail,
       CAST(CASE WHEN saturated THEN avail
                 ELSE ({budget} - _ssat) // (_k - _m) END AS BIGINT) AS allocated,
       saturated
FROM _tot
"""


def take_quota(
    df: DataFrame,
    key_col: str,
    id_col: str,
    quotas: DataFrame,
) -> DataFrame:
    """Realize a per-source allocation deterministically: keep the
    first ``allocated`` rows of each source in md5-of-id order — the
    engine-independent "random" subset (the hash-split discipline of
    operators/sampling.py; any engine computing md5 keeps the same
    rows).

    ``quotas`` is (key, allocated) — e.g. the waterfill output. One
    broadcast join + one per-source rank window over the corpus.
    Output: the kept rows (original columns) plus ``_take_rank``.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    ranked = df.withColumn("_take_rank", F.row_number().over(w))
    q = quotas.select(
        F.col("key").alias(key_col), F.col("allocated").alias("_quota")
    )
    return (
        ranked.join(F.broadcast(q), key_col)
        .filter(F.col("_take_rank") <= F.col("_quota"))
        .drop("_quota")
    )


def take_quota_sql(
    table_sql: str,
    key_col: str,
    id_col: str,
    quotas_sql: str,
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`take_quota`."""
    return f"""
SELECT {select_cols}, _take_rank FROM (
    SELECT t.*, row_number() OVER (
               PARTITION BY t.{key_col}
               ORDER BY md5(CAST(t.{id_col} AS VARCHAR)), t.{id_col}
           ) AS _take_rank,
           q.allocated AS _quota
    FROM ({table_sql}) t
    JOIN ({quotas_sql}) q ON t.{key_col} = q.key
)
WHERE _take_rank <= _quota
"""
