"""Survival analysis: the Kaplan-Meier product-limit estimator
(Kaplan & Meier, JASA 1958 — public methodology), the standard
time-to-event readout for churn / conversion-latency / reliability
questions over event logs ("what fraction of users have NOT yet
converted by day t, accounting for users we stopped observing?").

The reference has no analytics surface (SURVEY.md §2.2); this extends
the experiment/evaluation family (Welch, CUPED, cohort retention).

Spark-first shape: raw (duration, event) rows collapse in ONE hash
aggregate to the value-counts frame keyed (group, t) — t is an integer
DAY (or any caller-chosen integer grain), so the frame is bounded by
|groups| × |observation-span days| regardless of row count, which is
what justifies the per-group cumulative windows over it (the
grouped_median_mad discipline). No raw row is ever sorted.

Cross-engine determinism: n_at_risk / d / c are exact bigints. The
survival curve is carried in LOG space as the running sum of
``floor(ln((n_t − d_t)/n_t) · 1e6)`` integer terms — the t23/KL/PSI
log pattern: each term is one ln of a ratio of exact integers (both
engines see the identical double), floored to an integer, so the
cumulative sum is order-free and hash-exact. ``survival ≈
exp(s_log_scaled / 1e6)``; once some event time exhausts the risk set
(n_t == d_t) the survivor function is exactly 0 and ``s_log_scaled``
is NULL from that point on (−∞ has no integer encoding).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stepist_spark.operators.cumulative import grouped_frame

#: fixed-point scale for the log-survival terms
_LOG_SCALE = 1_000_000


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Kaplan-Meier curve points per group.

    ``duration_col``: integer time-to-event/censoring in a BOUNDED
    grain (days/hours — the caller owns the truncation; an unbounded
    grain like microseconds would un-bound the value-counts frame).
    ``event_col``: 1 = event observed, 0 = right-censored at that time.

    Output, one row per (group, t) with at least one subject leaving
    the risk set: ``t, n_risk, d, c, s_log_scaled`` where ``n_risk``
    is the number still at risk entering t (standard convention:
    subjects censored AT t are still at risk at t), ``d``/``c`` the
    events/censorings at t, and ``s_log_scaled`` the running
    ``Σ floor(ln((n−d)/n)·1e6)`` over event times ≤ t (NULL once the
    risk set was exhausted — survival exactly 0).
    """
    gcols = list(group_cols)
    ev = F.col(event_col).cast("bigint")
    # NULL durations/events are EXCLUDED explicitly: a NULL-keyed
    # value-counts row would otherwise ride the cumulative windows
    # under the engines' OPPOSITE default NULL orderings (Spark ASC =
    # NULLS FIRST, DuckDB ASC = NULLS LAST) and silently skew n_risk
    # on one side only. Unknown observation times carry no survival
    # information; route them to a data-quality report upstream.
    vc = (
        df.filter(F.col(duration_col).isNotNull() & F.col(event_col).isNotNull())
        .groupBy(*gcols, F.col(duration_col).cast("bigint").alias("t"))
        .agg(
            F.sum(ev).alias("d"),
            F.sum(F.lit(1) - ev).alias("c"),
        )
    )
    w_prev = grouped_frame(gcols, "t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = grouped_frame(gcols, "t").rowsBetween(Window.unboundedPreceding, 0)
    w_all = grouped_frame(gcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    vc = vc.withColumn("_n_grp", F.sum(F.col("d") + F.col("c")).over(w_all))
    vc = vc.withColumn(
        "n_risk",
        F.col("_n_grp") - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    # per-time log term (0 for censor-only times so the running sum is
    # well-defined on every row); NULL-poison marker once n_risk == d
    term = F.when(
        (F.col("d") > 0) & (F.col("n_risk") > F.col("d")),
        F.floor(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * _LOG_SCALE
        ),
    ).otherwise(F.lit(0))
    exhausted = F.when(
        (F.col("d") > 0) & (F.col("n_risk") == F.col("d")), F.lit(1)
    ).otherwise(F.lit(0))
    vc = vc.withColumn("_term", term).withColumn("_dead", exhausted)
    out_cols = [*gcols, "t", "n_risk", "d", "c"]
    return (
        vc.withColumn("_cum_term", F.sum("_term").over(w_cum))
        .withColumn("_cum_dead", F.sum("_dead").over(w_cum))
        .select(
            *out_cols,
            F.when(F.col("_cum_dead") == 0, F.col("_cum_term"))
            .cast("bigint")
            .alias("s_log_scaled"),
        )
    )


def kaplan_meier_sql(
    table_sql: str,
    duration_expr: str,
    event_expr: str,
    group_exprs: Sequence[tuple[str, str]] = (),
) -> str:
    """DuckDB mirror of :func:`kaplan_meier`. ``group_exprs`` is a list
    of ``(expr, alias)`` pairs; the same window/ln/floor sequence over
    the identical value-counts frame."""
    sel_g = "".join(f"({e}) AS {a}, " for e, a in group_exprs)
    gnames = [a for _, a in group_exprs]
    part = ("PARTITION BY " + ", ".join(gnames)) if gnames else "PARTITION BY 0"
    gsel = "".join(f"{a}, " for a in gnames)
    gby = ", ".join(["1"] + [str(i + 2) for i in range(len(gnames))]) if gnames else "1"
    return f"""
WITH _rows AS (
    SELECT CAST(({duration_expr}) AS BIGINT) AS t, {sel_g}
           CAST(({event_expr}) AS BIGINT) AS _e
    FROM ({table_sql})
    WHERE ({duration_expr}) IS NOT NULL AND ({event_expr}) IS NOT NULL
),
_vc AS (
    SELECT t, {gsel} CAST(sum(_e) AS BIGINT) AS d,
           CAST(sum(1 - _e) AS BIGINT) AS c
    FROM _rows GROUP BY {gby}
),
_risk AS (
    SELECT *,
        sum(d + c) OVER ({part}) AS _n_grp,
        coalesce(sum(d + c) OVER ({part} ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _prev
    FROM _vc
),
_terms AS (
    SELECT *, (_n_grp - _prev) AS n_risk,
        CASE WHEN d > 0 AND (_n_grp - _prev) > d
             THEN CAST(floor(ln(CAST((_n_grp - _prev) - d AS DOUBLE)
                                / CAST(_n_grp - _prev AS DOUBLE)) * {_LOG_SCALE}) AS BIGINT)
             ELSE 0 END AS _term,
        CASE WHEN d > 0 AND (_n_grp - _prev) = d THEN 1 ELSE 0 END AS _dead
    FROM _risk
)
SELECT {gsel} t, CAST(n_risk AS BIGINT) AS n_risk, d, c,
       CASE WHEN sum(_dead) OVER ({part} ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0
            THEN CAST(sum(_term) OVER ({part} ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       END AS s_log_scaled
FROM _terms
"""
