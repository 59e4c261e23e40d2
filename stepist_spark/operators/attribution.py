"""Multi-touch marketing attribution: assign each touch event (click/
view) to the user's NEXT conversion (purchase), then credit channels
under first-touch / last-touch / linear models — the standard product-
analytics attribution pass (public: every web-analytics stack;
Shapley/Markov variants are research refinements of this base).

The reference has no event analytics at all (SURVEY.md §2.2 — its
"stream" is a Redis list, `stepist/flow/libs/simple_queue.py:15-77`);
this is the product-analytics extension surface.

Spark-first shape: ONE user-partitioned window sort — a REVERSE
running count of conversions gives every touch the index of the next
conversion at-or-after it (touches past the last conversion fall out
with index 0) — then per-(user, conversion) hash aggregates that ride
the same user-keyed exchange. No touch×conversion join, no per-user
loops; at 100 TB the cost is one shuffle on ``user_col``.

Cross-engine determinism: events order by (ts, tiebreak) so same-
timestamp rows are stable; conversion value goes to integer cents
half-up; linear credit is the INTEGER division ``cents·1e6 DIV n``
per touch, so channel sums are order-free bigints (no cross-row
double accumulation — the rolling_zscore discipline).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CREDIT_SCALE = 1_000_000


def attributed_touches(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    id_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
) -> DataFrame:
    """Per-touch frame: every touch event mapped to the user's next
    conversion. Output: ``user, conv_idx, conv_id, conv_ts,
    value_cents, n_touches, touch_id, touch_ts, touch_type, touch_pos
    (1-based in time order), is_first, is_last, credit_linear_scaled``
    (= ``value_cents·1e6 DIV n_touches``, an exact bigint).

    ``conv_idx`` counts the user's conversions from the LAST one
    backwards (the reverse-running-count trick that avoids a second
    forward pass); it is stable and join-able but not chronological.
    """
    touch_types = list(touch_types)
    ev = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
        F.col(value_col).alias("value"),
        F.col(id_col).alias("eid"),
    ).filter(F.col("etype").isin([conversion_type, *touch_types]))
    is_conv = (F.col("etype") == conversion_type).cast("bigint")
    w_rev = (
        Window.partitionBy("user")
        .orderBy(F.col("ts").desc(), F.col("eid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    idx = ev.withColumn("conv_idx", F.sum(is_conv).over(w_rev)).filter(
        F.col("conv_idx") >= 1
    )
    convs = idx.filter(F.col("etype") == conversion_type).select(
        "user",
        "conv_idx",
        F.col("eid").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("value_cents"),
    )
    touches = idx.filter(F.col("etype") != conversion_type).select(
        "user",
        "conv_idx",
        F.col("eid").alias("touch_id"),
        F.col("ts").alias("touch_ts"),
        F.col("etype").alias("touch_type"),
    )
    w_path = Window.partitionBy("user", "conv_idx").orderBy(
        F.col("touch_ts").asc(), F.col("touch_id").asc()
    )
    w_all = Window.partitionBy("user", "conv_idx")
    ranked = (
        touches.withColumn("touch_pos", F.row_number().over(w_path))
        .withColumn("n_touches", F.count(F.lit(1)).over(w_all))
    )
    # conversions per (user, conv_idx) are unique by construction —
    # the join fans out only to that conversion's own touches
    out = ranked.join(convs, ["user", "conv_idx"])
    return out.select(
        "user",
        "conv_idx",
        "conv_id",
        "conv_ts",
        "value_cents",
        F.col("n_touches").cast("bigint").alias("n_touches"),
        "touch_id",
        "touch_ts",
        "touch_type",
        F.col("touch_pos").cast("bigint").alias("touch_pos"),
        (F.col("touch_pos") == 1).alias("is_first"),
        (F.col("touch_pos") == F.col("n_touches")).alias("is_last"),
        # integer DIV, not double-/ then cast: the double quotient
        # rounds before Spark's truncating cast, while DuckDB's // is
        # exact — DIV keeps both engines on the same integer
        F.expr(f"CAST((value_cents * {_CREDIT_SCALE}) DIV n_touches AS BIGINT)").alias(
            "credit_linear_scaled"
        ),
    )


def conversion_paths(touches: DataFrame) -> DataFrame:
    """Per-conversion path summary from :func:`attributed_touches`:
    ``user, conv_id, conv_ts, value_cents, n_touches, first_touch_id,
    first_touch_type, last_touch_id, last_touch_type``. One hash
    aggregate riding the user-keyed exchange."""
    return touches.groupBy(
        "user", "conv_id", "conv_ts", "value_cents", "n_touches"
    ).agg(
        F.max(F.when(F.col("is_first"), F.col("touch_id"))).alias("first_touch_id"),
        F.max(F.when(F.col("is_first"), F.col("touch_type"))).alias(
            "first_touch_type"
        ),
        F.max(F.when(F.col("is_last"), F.col("touch_id"))).alias("last_touch_id"),
        F.max(F.when(F.col("is_last"), F.col("touch_type"))).alias("last_touch_type"),
    )


def channel_credit(touches: DataFrame, model: str = "linear") -> DataFrame:
    """Per-channel credit totals from :func:`attributed_touches` under
    ``model`` in {'first', 'last', 'linear'}. Credits are exact scaled
    bigints (cents·1e6) — order-free sums; ``credit`` is the 6-dp
    currency view. Output: ``touch_type, n_touches, credit_scaled,
    credit``."""
    if model == "first":
        per_touch = F.when(
            F.col("is_first"), F.col("value_cents") * _CREDIT_SCALE
        ).otherwise(F.lit(0))
    elif model == "last":
        per_touch = F.when(
            F.col("is_last"), F.col("value_cents") * _CREDIT_SCALE
        ).otherwise(F.lit(0))
    elif model == "linear":
        per_touch = F.col("credit_linear_scaled")
    else:
        raise ValueError(f"model must be first|last|linear, got {model!r}")
    return (
        touches.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(per_touch).cast("bigint").alias("credit_scaled"),
        )
        .withColumn(
            "credit",
            F.round(
                F.col("credit_scaled").cast("double")
                / F.lit(float(100 * _CREDIT_SCALE)),
                6,
            ),
        )
    )


def attributed_touches_sql(
    table: str,
    user_expr: str,
    ts_expr: str,
    type_expr: str,
    value_expr: str,
    id_expr: str,
    conversion_type: str,
    touch_types: Sequence[str],
) -> str:
    """DuckDB mirror of :func:`attributed_touches` — same reverse
    running count, same (ts, id) ordering, same integer credit."""
    tt = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH _at_ev AS (
    SELECT {user_expr} AS usr, {ts_expr} AS ts, {type_expr} AS etype,
           {value_expr} AS value, {id_expr} AS eid
    FROM {table}
    WHERE {type_expr} IN ('{conversion_type}', {tt})
),
_at_idx AS (
    SELECT *, sum(CASE WHEN etype = '{conversion_type}' THEN 1 ELSE 0 END)
              OVER (PARTITION BY usr ORDER BY ts DESC, eid DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conv_idx
    FROM _at_ev
),
_at_conv AS (
    SELECT usr, conv_idx, eid AS conv_id, ts AS conv_ts,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
    FROM _at_idx WHERE etype = '{conversion_type}' AND conv_idx >= 1
),
_at_touch AS (
    SELECT usr, conv_idx, eid AS touch_id, ts AS touch_ts, etype AS touch_type,
           row_number() OVER (PARTITION BY usr, conv_idx
                              ORDER BY ts ASC, eid ASC) AS touch_pos,
           count(*) OVER (PARTITION BY usr, conv_idx) AS n_touches
    FROM _at_idx WHERE etype <> '{conversion_type}' AND conv_idx >= 1
)
SELECT t.usr AS user, t.conv_idx, c.conv_id, c.conv_ts, c.value_cents,
       CAST(t.n_touches AS BIGINT) AS n_touches,
       t.touch_id, t.touch_ts, t.touch_type,
       CAST(t.touch_pos AS BIGINT) AS touch_pos,
       t.touch_pos = 1 AS is_first,
       t.touch_pos = t.n_touches AS is_last,
       CAST((c.value_cents * {_CREDIT_SCALE}) // t.n_touches AS BIGINT)
           AS credit_linear_scaled
FROM _at_touch t JOIN _at_conv c USING (usr, conv_idx)
"""


def conversion_paths_sql(touches_sql: str) -> str:
    """DuckDB mirror of :func:`conversion_paths`."""
    return f"""
SELECT "user", conv_id, conv_ts, value_cents, n_touches,
       max(CASE WHEN is_first THEN touch_id END) AS first_touch_id,
       max(CASE WHEN is_first THEN touch_type END) AS first_touch_type,
       max(CASE WHEN is_last THEN touch_id END) AS last_touch_id,
       max(CASE WHEN is_last THEN touch_type END) AS last_touch_type
FROM ({touches_sql})
GROUP BY 1, 2, 3, 4, 5
"""


def channel_credit_sql(touches_sql: str, model: str = "linear") -> str:
    """DuckDB mirror of :func:`channel_credit`."""
    if model == "first":
        per = f"CASE WHEN is_first THEN value_cents * {_CREDIT_SCALE} ELSE 0 END"
    elif model == "last":
        per = f"CASE WHEN is_last THEN value_cents * {_CREDIT_SCALE} ELSE 0 END"
    elif model == "linear":
        per = "credit_linear_scaled"
    else:
        raise ValueError(f"model must be first|last|linear, got {model!r}")
    return f"""
SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum({per}) AS BIGINT) AS credit_scaled,
       round(CAST(sum({per}) AS DOUBLE) / {100 * _CREDIT_SCALE}.0, 6) AS credit
FROM ({touches_sql})
GROUP BY 1
"""


def time_to_convert(touches: DataFrame) -> DataFrame:
    """Per-channel time-to-convert stats from
    :func:`attributed_touches`, keyed by the FIRST touch's type: the
    number of conversions, total/mean first-touch-to-conversion
    microseconds, and the exact discrete median — the "how long does
    the funnel take per acquisition channel" report.

    Exactness: durations are integer microseconds (``unix_micros`` ==
    DuckDB ``epoch_us``); the median is an actual data value located
    by a cumulative window over the per-channel duration counts (the
    grouped_median_mad shape — never a per-channel sort of raw rows);
    the mean is ONE double division, round 6.

    Output: ``first_touch_type, n_conv, total_us, median_us, mean_us``.
    """
    from pyspark.sql import Window

    first = touches.filter(F.col("is_first")).select(
        F.col("touch_type").alias("first_touch_type"),
        (
            F.unix_micros(F.col("conv_ts").cast("timestamp"))
            - F.unix_micros(F.col("touch_ts").cast("timestamp"))
        ).alias("tt_us"),
    )
    counts = first.groupBy("first_touch_type", "tt_us").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_ord = (
        Window.partitionBy("first_touch_type")
        .orderBy(F.col("tt_us").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("first_touch_type")
    st = counts.select(
        "first_touch_type",
        "tt_us",
        "c",
        F.sum("c").over(w_ord).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
        F.sum(F.col("c") * F.col("tt_us")).over(w_all).alias("total"),
    )
    med_rank = F.expr("CAST((n + 1) DIV 2 AS BIGINT)")
    return (
        st.filter(F.col("cum") >= med_rank)
        .groupBy("first_touch_type", "n", "total")
        .agg(F.min("tt_us").alias("median_us"))
        .select(
            "first_touch_type",
            F.col("n").cast("bigint").alias("n_conv"),
            F.col("total").cast("bigint").alias("total_us"),
            F.col("median_us").cast("bigint").alias("median_us"),
            F.round(
                F.col("total").cast("double") / F.col("n").cast("double"), 6
            ).alias("mean_us"),
        )
    )


def time_to_convert_sql(touches_sql: str) -> str:
    """DuckDB mirror of :func:`time_to_convert`."""
    return f"""
WITH ttc_f AS (
    SELECT touch_type AS first_touch_type,
           epoch_us(conv_ts) - epoch_us(touch_ts) AS tt_us
    FROM ({touches_sql}) WHERE is_first
),
ttc_c AS (
    SELECT first_touch_type, tt_us, CAST(count(*) AS BIGINT) AS c
    FROM ttc_f GROUP BY 1, 2
),
ttc_s AS (
    SELECT *,
           sum(c) OVER (PARTITION BY first_touch_type ORDER BY tt_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c) OVER (PARTITION BY first_touch_type) AS n,
           sum(c * tt_us) OVER (PARTITION BY first_touch_type) AS total
    FROM ttc_c
)
SELECT first_touch_type, CAST(n AS BIGINT) AS n_conv,
       CAST(total AS BIGINT) AS total_us,
       CAST(min(tt_us) AS BIGINT) AS median_us,
       round(CAST(total AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_us
FROM ttc_s
WHERE cum >= (n + 1) // 2
GROUP BY first_touch_type, n, total
"""
