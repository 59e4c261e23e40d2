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
    tolerance: "F.Column | None" = None,
) -> DataFrame:
    """For each left row, attach the as-of right row matching on the
    equi-key ``on``:

    - ``direction='backward'`` (default): the most recent right row
      with ``right_time <= left_time`` (inclusive);
    - ``direction='forward'``: the earliest right row with
      ``right_time >= left_time`` (inclusive);
    - ``direction='nearest'``: whichever of the two is closer in
      absolute time (backward wins exact ties, pandas
      ``merge_asof(direction='nearest')`` semantics).

    Left rows with no qualifying right row are dropped (inner as-of).

    ``tolerance`` bounds the match distance like pandas
    ``merge_asof(tolerance=...)``: a candidate farther than it is
    treated as absent (so 'nearest' falls back to the OTHER side
    before dropping the row). Pass a literal matching the time
    column's subtraction type — ``F.expr("INTERVAL 2 HOURS")`` for
    timestamps, a number for numeric keys.

    Determinism caveat: if the right side contains MULTIPLE rows with
    the same (key, time), which one's payload is attached is partition-
    order dependent (the sort can't distinguish them). Deduplicate the
    right side on (key, time) first — e.g. ``groupBy(on, right_time).
    agg(max_by(...))`` — when that case is possible in your data.

    Implementation: tag and union both sides, sort within each key by
    (time, side) — right rows sort before (backward) / after (forward)
    left rows at equal times so the inclusive semantics hold — then
    propagate the right payload with ``last(ignorenulls=True)`` over an
    unbounded-preceding window (backward) or ``first(ignorenulls=True)``
    over an unbounded-following window (forward) and keep the left
    rows. 'nearest' computes both carries in ONE pass over the same
    sort (two window frames on one (key, time) ordering — a single
    sort-shuffle, not two joins) and picks per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    payload = right_payload or [c for c in right.columns if c not in (on, right_time)]

    # One (key, time, side) sort serves every direction. Right rows
    # sort before left rows at equal times, so the backward carry is
    # inclusive by construction; an exact-time match sits OUTSIDE the
    # forward frame (which starts at the current row) and is recovered
    # from the backward carry when its time equals the left time.
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in [right_time, *payload]]).alias("_rpay"),
    )
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    merged = r.unionByName(l, allowMissingColumns=True)
    order = [F.col("_t").asc(), F.col("_side").asc()]
    w_back = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = merged
    back = F.last("_rpay", ignorenulls=True).over(w_back)
    fwd = F.first("_rpay", ignorenulls=True).over(w_fwd)
    if tolerance is not None:
        # invalidate each candidate BEFORE direction logic: 'nearest'
        # must fall back to the other side when the closer candidate
        # is out of tolerance (a post-pick filter would drop the row)
        back = F.when((F.col("_t") - back[right_time]) <= tolerance, back)
        fwd = F.when((fwd[right_time] - F.col("_t")) <= tolerance, fwd)
    if direction == "backward":
        carried = carried.withColumn("_pick", back)
    elif direction == "forward":
        carried = carried.withColumn("_b", back).withColumn("_f", fwd)
        carried = carried.withColumn(
            "_pick",
            F.when(
                F.col("_b").isNotNull()
                & (F.col("_b")[right_time] == F.col("_t")),
                F.col("_b"),
            ).otherwise(F.col("_f")),
        )
    else:  # nearest: backward wins ties
        carried = carried.withColumn("_b", back).withColumn("_f", fwd)
        # raw subtraction keeps the comparison type-generic: timestamps
        # yield day-time intervals, numerics yield numerics — both
        # orderable (a cast-to-double would reject TIMESTAMP_NTZ)
        b_dist = F.col("_t") - F.col("_b")[right_time]
        f_dist = F.col("_f")[right_time] - F.col("_t")
        carried = carried.withColumn(
            "_pick",
            F.when(F.col("_b").isNull(), F.col("_f"))
            .when(F.col("_f").isNull(), F.col("_b"))
            .when(b_dist <= f_dist, F.col("_b"))
            .otherwise(F.col("_f")),
        )
    out = carried.filter((F.col("_side") == 1) & F.col("_pick").isNotNull())
    sel = [F.col(f"_l_{c}").alias(c) for c in lcols]
    sel.append(F.col(f"_pick.{right_time}").alias(f"asof_{right_time}"))
    sel.extend(F.col(f"_pick.{c}").alias(f"asof_{c}") for c in payload)
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


def asof_join_multi(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    specs: list[tuple],
    right_payload: list[str] | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Several as-of joins over the SAME (left, right, key, time) pair
    from ONE sort-shuffle: ``specs`` is a list of ``(tag, direction,
    tolerance)`` tuples and the output is the union of each spec's
    :func:`asof_join` result with a leading ``part`` = tag column.

    Why: each asof_join call pays a full (key, time) sort of the
    unioned sides. A gate (or pipeline) that wants backward AND
    forward AND nearest views of the same pair re-sorts identically
    N times. Here the backward/forward carries are computed once over
    one sort and checkpointed (``materialize``); each spec is then a
    column-level pick + filter over that KB-per-row frame — direction
    logic is tolerance-dependent but carry construction is not.
    """
    payload = right_payload if right_payload is not None else [
        c for c in right.columns if c not in (on, right_time)
    ]
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in [right_time, *payload]]).alias("_rpay"),
    )
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    merged = r.unionByName(l, allowMissingColumns=True)
    order = [F.col("_t").asc(), F.col("_side").asc()]
    w_back = (
        Window.partitionBy("_k").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("_k").orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
    )
    carried = (
        merged.withColumn("_b", F.last("_rpay", ignorenulls=True).over(w_back))
        .withColumn("_f", F.first("_rpay", ignorenulls=True).over(w_fwd))
        .filter(F.col("_side") == 1)
        .drop("_rpay", "_side")
    )
    if materialize:
        carried = carried.localCheckpoint(eager=False)

    outs = []
    for tag, direction, tolerance in specs:
        if direction not in ("backward", "forward", "nearest"):
            raise ValueError(
                f"direction must be backward|forward|nearest, got {direction!r}"
            )
        back, fwd = F.col("_b"), F.col("_f")
        if tolerance is not None:
            back = F.when((F.col("_t") - back[right_time]) <= tolerance, back)
            fwd = F.when((fwd[right_time] - F.col("_t")) <= tolerance, fwd)
        if direction == "backward":
            pick = back
        elif direction == "forward":
            # an exact-time right row sits in the backward carry (right
            # sorts before left at equal times) — recover it
            pick = F.when(
                back.isNotNull() & (back[right_time] == F.col("_t")), back
            ).otherwise(fwd)
        else:
            b_dist = F.col("_t") - back[right_time]
            f_dist = fwd[right_time] - F.col("_t")
            pick = (
                F.when(back.isNull(), fwd)
                .when(fwd.isNull(), back)
                .when(b_dist <= f_dist, back)
                .otherwise(fwd)
            )
        picked = carried.withColumn("_pick", pick).filter(F.col("_pick").isNotNull())
        sel = [F.lit(tag).alias("part")]
        sel += [F.col(f"_l_{c}").alias(c) for c in lcols]
        sel.append(F.col(f"_pick.{right_time}").alias(f"asof_{right_time}"))
        sel.extend(F.col(f"_pick.{c}").alias(f"asof_{c}") for c in payload)
        outs.append(picked.select(*sel))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
