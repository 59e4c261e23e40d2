"""Grouped simple linear regression (OLS) — slope/intercept/r² per
group from one aggregation pass: the GROUP BY trend-fitting primitive
(unit-price estimation, drift detection, per-segment elasticity).

Portability contract: inputs are scaled to integers (floor(v*scale +
0.5) — half-up spelled explicitly), the six sufficient statistics
(n, Σx, Σy, Σx², Σy², Σxy) accumulate EXACTLY in decimal(38,0)
(matching DuckDB's HUGEINT sums — same discipline as
rolling_zscore's round-3 fix), and only then does the formula drop to
double: both engines evaluate the identical expression over identical
exact sums, so results agree bit-for-bit before the final 6-dp round.

Scale shape: ONE map-side-combined hash aggregation over the rows —
no sort, no per-group serialization; the statistics table is
|groups| rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_ols(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """Per-group OLS fit of ``y = intercept + slope * x``.

    Output: ``*group_cols, n, slope, intercept, r2`` (6-dp doubles;
    NULL fit when the group has < 2 rows or zero x-variance; r2 NULL
    additionally when y is constant). Overflow errors loudly (ANSI
    decimal) rather than wrapping — lower ``scale`` for huge values.
    """
    group_cols = list(group_cols)
    sx = F.floor(F.col(x_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
    sy = F.floor(F.col(y_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sx).alias("_sx"),
        F.sum(sy).alias("_sy"),
        F.sum(sx * sx).alias("_sxx"),
        F.sum(sy * sy).alias("_syy"),
        F.sum(sx * sy).alias("_sxy"),
    )
    nd = F.col("n").cast("double")
    dx = F.col("_sx").cast("double")
    dy = F.col("_sy").cast("double")
    dxx = F.col("_sxx").cast("double")
    dyy = F.col("_syy").cast("double")
    dxy = F.col("_sxy").cast("double")
    cov_n = nd * dxy - dx * dy     # n²·scale²·cov
    varx_n = nd * dxx - dx * dx    # n²·scale²·var(x)
    vary_n = nd * dyy - dy * dy
    slope = cov_n / varx_n          # scale factors cancel
    intercept = (dy - slope * dx) / (nd * F.lit(float(scale)))
    r2 = (cov_n * cov_n) / (varx_n * vary_n)
    fit_ok = (F.col("n") >= 2) & (varx_n > 0)
    return stats.select(
        *group_cols,
        "n",
        F.when(fit_ok, F.round(slope, 6)).alias("slope"),
        F.when(fit_ok, F.round(intercept, 6)).alias("intercept"),
        F.when(fit_ok & (vary_n > 0), F.round(r2, 6)).alias("r2"),
    )


def grouped_ols_sql(
    table_sql: str,
    group_exprs: Sequence[str],
    x_expr: str,
    y_expr: str,
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`grouped_ols` (BIGINT scaled values sum
    into HUGEINT — exact like the Spark side's decimal(38,0))."""
    g = ", ".join(group_exprs)
    return f"""
WITH ols_t AS (
    SELECT {g},
           CAST(floor(({x_expr}) * {scale} + 0.5) AS BIGINT) AS xs,
           CAST(floor(({y_expr}) * {scale} + 0.5) AS BIGINT) AS ys
    FROM ({table_sql})
),
ols_s AS (
    SELECT {g}, count(*) AS n,
           sum(xs) AS sx, sum(ys) AS sy,
           sum(xs::HUGEINT * xs) AS sxx, sum(ys::HUGEINT * ys) AS syy,
           sum(xs::HUGEINT * ys) AS sxy
    FROM ols_t GROUP BY {g}
),
ols_d AS (
    SELECT {g}, n,
           CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS dx,
           CAST(sy AS DOUBLE) AS dy, CAST(sxx AS DOUBLE) AS dxx,
           CAST(syy AS DOUBLE) AS dyy, CAST(sxy AS DOUBLE) AS dxy
    FROM ols_s
)
SELECT {g}, n,
       CASE WHEN n >= 2 AND nd*dxx - dx*dx > 0
            THEN round((nd*dxy - dx*dy) / (nd*dxx - dx*dx), 6) END AS slope,
       CASE WHEN n >= 2 AND nd*dxx - dx*dx > 0
            THEN round((dy - ((nd*dxy - dx*dy) / (nd*dxx - dx*dx)) * dx)
                       / (nd * {scale}.0), 6) END AS intercept,
       CASE WHEN n >= 2 AND nd*dxx - dx*dx > 0 AND nd*dyy - dy*dy > 0
            THEN round(((nd*dxy - dx*dy) * (nd*dxy - dx*dy))
                       / ((nd*dxx - dx*dx) * (nd*dyy - dy*dy)), 6) END AS r2
FROM ols_d
"""
