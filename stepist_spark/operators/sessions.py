"""Batch sessionization: gap-based session assignment over an event
log — the batch twin of the streaming session window
(`streaming/windows.py` session_agg): a user's events belong to one
session until the gap to the next event exceeds the threshold; then a
new session starts.

The reference has no event analytics at all (SURVEY.md §2.2 — its
"stream" is a Redis list, `stepist/flow/libs/simple_queue.py:15-77`);
this is the LLM/product-analytics extension surface.

Spark-first shape: ONE user-partitioned window sort over the events
(lag to find boundaries, a running sum of boundary flags to number
sessions), then a per-session hash aggregate for the stats. No
self-joins, no per-session scans; at 100 TB the cost is one shuffle
on ``user_col`` — and the same exchange serves both the window and
the aggregate (groupBy(user, session) is a superset of the window's
partition key, so the sort output is reused).

Cross-engine determinism: all time arithmetic is INTEGER MICROSECONDS
(Spark ``unix_micros`` == DuckDB ``epoch_us``) — Spark's
``unix_timestamp`` truncates sub-second parts while DuckDB's
``epoch()`` returns a fractional double, so second-level math would
disagree on any event log with sub-second timestamps. Events are
ordered by (ts, tiebreak_col) inside each user, so same-timestamp
events get a stable order on any engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_sec: int,
    tiebreak_col: str,
    session_col: str = "session_idx",
) -> DataFrame:
    """Append ``session_col``: the user's 1-based session number.

    A session boundary falls BEFORE any event whose gap to the user's
    previous event is STRICTLY greater than ``gap_sec`` — an event
    exactly ``gap_sec`` later still extends the session. NOTE this
    differs from ``session_window``'s half-open interval by exactly
    the boundary instant: there, a session spans [start, last + gap)
    and an event at precisely last + gap opens a NEW session. The gap
    compares exact integer microseconds.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    gap_us = us - prev
    boundary = F.when(prev.isNull() | (gap_us > gap_sec * _US), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_sec: int,
    tiebreak_col: str,
    agg_exprs: Sequence["F.Column"] = (),
) -> DataFrame:
    """Per-session summary: one row per (user, session) with
    ``n_events``, ``session_start``/``session_end``, the integer
    ``duration_sec`` (floor of the exact microsecond span), plus any
    caller ``agg_exprs``.

    One window pass (:func:`sessionize`) + one hash aggregate on
    (user, session) — co-partitioned with the window exchange.
    """
    s = sessionize(df, user_col, ts_col, gap_sec, tiebreak_col)
    span_us = F.unix_micros(F.max(ts_col).cast("timestamp")) - F.unix_micros(
        F.min(ts_col).cast("timestamp")
    )
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        span_us.cast("bigint").alias("_span_us"),
        *agg_exprs,
    ).withColumn(
        "duration_sec", F.expr(f"_span_us DIV {_US}")
    ).drop("_span_us")


def session_stats_sql(
    table_sql: str,
    user_expr: str,
    ts_expr: str,
    gap_sec: int,
    tiebreak_expr: str,
    extra_aggs: str = "",
) -> str:
    """DuckDB mirror of :func:`session_stats` — identical boundary
    rule (strict >, integer-microsecond gap), identical tiebreak."""
    extra = f", {extra_aggs}" if extra_aggs else ""
    return f"""
SELECT {user_expr} AS u, session_idx, count(*) AS n_events,
       min({ts_expr}) AS session_start, max({ts_expr}) AS session_end,
       (epoch_us(max({ts_expr})) - epoch_us(min({ts_expr}))) // {_US}
           AS duration_sec{extra}
FROM (
    SELECT *, CAST(sum(_boundary) OVER (
        PARTITION BY {user_expr} ORDER BY {ts_expr}, {tiebreak_expr}
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_idx
    FROM (
        SELECT *, CASE WHEN _prev_us IS NULL
                        OR epoch_us({ts_expr}) - _prev_us > {gap_sec * _US}
                   THEN 1 ELSE 0 END AS _boundary
        FROM (
            SELECT *, lag(epoch_us({ts_expr})) OVER (
                PARTITION BY {user_expr} ORDER BY {ts_expr}, {tiebreak_expr}
            ) AS _prev_us
            FROM ({table_sql})
        )
    )
)
GROUP BY 1, 2
"""


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
    out_col: str = "active_users",
) -> DataFrame:
    """EXACT rolling distinct-active counts (the DAU/WAU/MAU family):
    for every observed calendar day, the number of DISTINCT users seen
    in the trailing ``window_days`` days (day inclusive).

    Distinct counts don't sum across days, so the naive plan rescans
    the window per day; instead each distinct (user, day) pair
    CONTRIBUTES ITSELF FORWARD to the ``window_days`` windows it can
    appear in — |pairs| × window rows through one hash aggregate, and
    the raw event table is touched once. At 100 TB that is one shuffle
    keyed by day, partial-aggregated map-side.

    Output: ``day, {out_col}`` for each day that has events (leading
    days count a partial trailing window, matching the usual product-
    metric convention).
    """
    pairs = df.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    ).distinct()
    observed = pairs.select(F.col("_d").alias("day")).distinct()
    contrib = pairs.select(
        "_u",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("_off"),
        "_d",
    ).select("_u", F.date_add(F.col("_d"), F.col("_off")).alias("day"))
    return (
        contrib.join(observed, "day")
        .groupBy("day")
        .agg(F.countDistinct("_u").alias(out_col))
    )


def rolling_active_users_sql(
    table_sql: str,
    user_expr: str,
    ts_expr: str,
    window_days: int = 7,
) -> str:
    """DuckDB mirror of :func:`rolling_active_users`."""
    return f"""
WITH rau_pairs AS (
    SELECT DISTINCT {user_expr} AS u, CAST({ts_expr} AS DATE) AS d
    FROM ({table_sql})
),
rau_days AS (SELECT DISTINCT d AS day FROM rau_pairs),
rau_contrib AS (
    -- generate_series yields BIGINT; DATE + BIGINT doesn't bind in
    -- DuckDB, so cast the offset to INTEGER
    SELECT u, d + CAST(o AS INTEGER) AS day
    FROM rau_pairs, (SELECT unnest(generate_series(0, {window_days - 1})) AS o)
)
SELECT c.day, count(DISTINCT u) AS active_users
FROM rau_contrib c JOIN rau_days USING (day)
GROUP BY c.day
"""


def longest_daily_streak(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Per user: the LONGEST RUN of consecutive active calendar days
    plus the total distinct active days — the classic gaps-and-islands
    engagement metric (same island trick t21's span oracle uses,
    surfaced as an operator).

    One distinct (user, day) aggregation, one user-keyed window
    (row_number), one hash aggregate on the (user, day - rank) island
    anchor — the raw events never sort globally.

    Output: ``*user_col, longest_streak, n_active_days``.
    """
    days = df.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    ).distinct()
    w = Window.partitionBy("_u").orderBy(F.col("_d").asc())
    anchored = days.withColumn(
        "_anchor", F.date_sub(F.col("_d"), F.row_number().over(w))
    )
    islands = anchored.groupBy("_u", "_anchor").agg(
        F.count(F.lit(1)).alias("_len")
    )
    return islands.groupBy(F.col("_u").alias(user_col)).agg(
        F.max("_len").alias("longest_streak"),
        F.sum("_len").alias("n_active_days"),
    )


def longest_daily_streak_sql(
    table_sql: str, user_expr: str, ts_expr: str
) -> str:
    """DuckDB mirror of :func:`longest_daily_streak`."""
    return f"""
SELECT u, max(len) AS longest_streak, CAST(sum(len) AS BIGINT) AS n_active_days
FROM (
    SELECT u, anchor, count(*) AS len FROM (
        SELECT u, d, d - CAST(row_number() OVER (
            PARTITION BY u ORDER BY d) AS INTEGER) AS anchor
        FROM (SELECT DISTINCT {user_expr} AS u, CAST({ts_expr} AS DATE) AS d
              FROM ({table_sql}))
    ) GROUP BY u, anchor
)
GROUP BY u
"""
