"""As-of and range joins — operators Spark lacks natively.

As-of join: composed from a union + running ``last(ignorenulls)``
window, which is a single sort-shuffle on (key, time) — no per-group
pandas, no cross join. This is the merge-asof shape that scales: at
100 TB both sides shuffle once on the join key and the window is a
linear scan within each partition.

Range join: small band dimensions broadcast; the range predicate is
evaluated as a broadcast nested-loop filter (cheap when the dim is
tiny). For large-×-large range joins, bucketize the range key first
(see ``bucketize_range``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` (direction='backward'; inclusive),
    matching on the equi-key ``on``. Left rows with no prior right row
    are dropped (inner as-of).

    Implementation: tag and union both sides, sort within each key by
    (time, side) — right rows sort before left rows at equal times so
    the inclusive semantics hold — then propagate the latest right
    payload with ``last(ignorenulls=True)`` over an unbounded-preceding
    window and keep the left rows.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    payload = right_payload or [c for c in right.columns if c not in (on, right_time)]

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in [right_time, *payload]]).alias("_rpay"),
        F.lit(None).cast("long").alias("_lrow"),
    )
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        F.monotonically_increasing_id().alias("_lrow"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    merged = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn("_last_r", F.last("_rpay", ignorenulls=True).over(w))
    out = carried.filter((F.col("_side") == 1) & F.col("_last_r").isNotNull())
    sel = [F.col(f"_l_{c}").alias(c) for c in lcols]
    sel.append(F.col(f"_last_r.{right_time}").alias(f"asof_{right_time}"))
    sel.extend(F.col(f"_last_r.{c}").alias(f"asof_{c}") for c in payload)
    return out.select(*sel)


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to band rows where ``lo <= value < hi``.

    ``bands`` is broadcast (band dimensions are small by construction).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, how)


def bucketize_range(
    fact: DataFrame,
    value_col: str,
    bucket_width: float,
    bucket_col: str = "_bucket",
) -> DataFrame:
    """Attach a coarse bucket id for large-×-large range joins: equi-join
    on the bucket, then re-check the exact range predicate. Turns an
    O(n·m) nested loop into a co-partitioned hash join."""
    return fact.withColumn(
        bucket_col, F.floor(F.col(value_col) / F.lit(bucket_width)).cast("bigint")
    )
