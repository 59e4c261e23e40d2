"""Time-series regularization — resample an irregular event series
onto a fixed grid with forward fill (the hypertable/`time_bucket
gapfill` + `locf` operation of time-series stores, public TimescaleDB
semantics).

Spark-first shape: per key, the grid is one `sequence()` explode
anchored at that key's first observation (no driver loop, no
cross join), and the fill is ONE as-of backward join
(operators/asof.py: a single (key, time) sort-shuffle with a window
carry — never a per-gridpoint lookup). At 100 TB the cost is the
as-of sort plus |grid| rows, both linear.

Determinism: callers must ensure one observation per (key, ts) —
pre-aggregate otherwise (same caveat as asof_join).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: Sequence[str],
    step: str = "6 hours",
) -> DataFrame:
    """Per key: grid timestamps from its first to its last observation
    every ``step``, each carrying the most recent observation
    at-or-before the grid point (forward fill / last-observation-
    carried-forward). Every grid point has a value by construction
    (the grid starts AT the first observation).

    Output: ``<key_col>, grid_ts, <ts_col> (the observation actually
    carried), *value_cols``.
    """
    value_cols = list(value_cols)
    from stepist_spark.operators.asof import asof_join

    bounds = df.groupBy(key_col).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.expr(f"sequence(_lo, _hi, INTERVAL {step})")
        ).alias("grid_ts"),
    )
    obs = df.select(key_col, ts_col, *value_cols)
    joined = asof_join(
        grid,
        obs,
        on=key_col,
        left_time="grid_ts",
        right_time=ts_col,
        direction="backward",
    )
    # asof_join prefixes the carried payload with `asof_`; restore the
    # documented output names
    return joined.select(
        key_col,
        "grid_ts",
        F.col(f"asof_{ts_col}").alias(ts_col),
        *[F.col(f"asof_{v}").alias(v) for v in value_cols],
    )


def resample_ffill_sql(
    obs_sql: str,
    key_expr: str,
    ts_expr: str,
    value_exprs: Sequence[str],
    step_sql: str = "INTERVAL 6 HOUR",
) -> str:
    """DuckDB mirror of :func:`resample_ffill` (generate_series grid +
    native ASOF JOIN)."""
    vals = ", ".join(f"o.{v}" for v in value_exprs)
    return f"""
WITH ts_obs AS (SELECT {key_expr} AS k, {ts_expr} AS ts,
                       {', '.join(value_exprs)} FROM ({obs_sql})),
ts_bounds AS (SELECT k, min(ts) AS lo, max(ts) AS hi FROM ts_obs GROUP BY k),
ts_grid AS (
    SELECT k, unnest(generate_series(lo, hi, {step_sql})) AS grid_ts
    FROM ts_bounds
)
SELECT g.k, g.grid_ts, o.ts, {vals}
FROM ts_grid g ASOF JOIN ts_obs o
ON g.k = o.k AND g.grid_ts >= o.ts
"""
