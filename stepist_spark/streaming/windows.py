"""Event-time windowed aggregation with watermarks.

The reference has no notion of event time at all — its only time-based
behavior is the reducer's 30s processing-time TTL
(`stepist/flow/workers/reducer_engine.py:40-43`). These helpers expose
the full Structured Streaming window surface (tumbling / sliding /
session) with watermark-driven late-data handling: the principled
version of "drop what arrives too late".

All three also work on BATCH DataFrames (Spark evaluates ``F.window``/
``F.session_window`` identically there, minus the watermark) — used by
the q22/q23 oracle queries, so the same code path is correctness-gated
against DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows, e.g. ``duration="1 hour"``.

    Output carries ``window_start``/``window_end`` (flattened — stable
    column names hash cleanly in the oracle compare). One shuffle;
    partial aggregation happens map-side before the exchange.
    """
    df = _with_watermark(df, ts_col, watermark)
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w.alias("_w"), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (``duration`` long, advancing every
    ``slide``). Each event lands in duration/slide windows — cost grows
    with that ratio; keep it small at scale."""
    df = _with_watermark(df, ts_col, watermark)
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w.alias("_w"), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    group_by: Sequence[str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into
    one variable-length window per group — the event-time analog of the
    reference's barrier grouping, with the watermark as the TTL."""
    df = _with_watermark(df, ts_col, watermark)
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("_w"), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )
