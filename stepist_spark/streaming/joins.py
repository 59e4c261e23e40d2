"""Stream-stream joins with bounded state.

The reference cannot join streams at all — its only fan-in is the
count-barrier (`stepist/flow/workers/reducer_engine.py:21-80`).
Structured Streaming joins two unbounded inputs by buffering each side
in the state store; WITHOUT a time bound that buffer grows forever, so
the engine requires (and this helper enforces) watermarks plus an
event-time range on the join condition — then state for rows older
than watermark+range is evicted continuously.

State scales with (rows per time window) × executors, partitioned by
the join key — the same horizontal story as the barrier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on an equi-key where the right event falls in
    ``[left_ts - lower, left_ts + upper]``.

    Both sides get the watermark (state eviction horizon). Column names
    must be disjoint apart from ``on``; ``left_ts``/``right_ts`` name
    each side's event-time column. Works identically on batch frames
    (minus the watermark) — test both paths against each other.
    """
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(f"rename overlapping columns before joining: {sorted(overlap)}")
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (l[on] == r[on])
        & (r[right_ts] >= F.expr(f"{left_ts} - interval {lower}"))
        & (r[right_ts] <= F.expr(f"{left_ts} + interval {upper}"))
    )
    # right/full outer emit right-only rows whose LEFT key is NULL —
    # surface the key as coalesce(l, r) so the join key is always
    # populated (for inner/left the coalesce is the left key verbatim)
    keep = (
        [F.coalesce(l[on], r[on]).alias(on)]
        + [l[c] for c in left.columns if c != on]
        + [r[c] for c in right.columns if c != on]
    )
    return l.join(r, cond, how).select(*keep)
