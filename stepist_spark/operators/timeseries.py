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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stepist_spark.operators.cumulative import require_groups


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


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    scale: int = 10**6,
) -> DataFrame:
    """LOCF time-weighted average per key — the hypertable
    ``time_weight('LOCF', ...)`` primitive for irregular samples: each
    sample holds its value until the next one, and the average is
    ``∫ v dt / (t_last - t_first)`` over the key's observed span.
    Sensor/price series where sample density varies make the plain
    AVG meaningless; this weights by holding time instead.

    Output: ``*key_cols, n_samples, first_ts, last_ts, total_us, twa``
    (6-dp double; NULL when the span is empty — fewer than 2 samples
    or all at one instant).

    Shape: ONE key-partitioned window (lead) + ONE map-side-combined
    hash aggregate — no self-join, no per-gridpoint work.

    Portability contract (the grouped_ols discipline): values scale to
    integers (floor(v*scale + 0.5)), segment durations are exact
    integer microseconds, their products accumulate in decimal(38,0)
    (== DuckDB HUGEINT sums), and only the final ratio drops to double
    — identical expression both engines, bit-equal before the 6-dp
    round. Same-timestamp samples order by ``tiebreak_col`` (zero-
    length segments contribute nothing either way — the tiebreak only
    pins WHICH value the window's lead sees, keeping both engines on
    the same segment decomposition).
    """
    key_cols = require_groups(
        key_cols, "time_weighted_avg", "tag a constant series key first"
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    nxt = F.lead(us).over(w)
    vfp = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
    seg = (nxt - us).cast("decimal(18,0)")
    contrib = (vfp * seg).cast("decimal(38,0)")
    staged = df.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        us.alias("_us"),
        contrib.alias("_vdt"),
    )
    agg = staged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.min("_ts").alias("first_ts"),
        F.max("_ts").alias("last_ts"),
        (F.max("_us") - F.min("_us")).cast("bigint").alias("total_us"),
        F.sum("_vdt").alias("_sum_vdt"),
    )
    twa = (
        F.col("_sum_vdt").cast("double")
        / (F.col("total_us").cast("double") * F.lit(float(scale)))
    )
    return agg.select(
        *key_cols,
        "n_samples",
        "first_ts",
        "last_ts",
        "total_us",
        F.when(F.col("total_us") > 0, F.round(twa, 6)).alias("twa"),
    )


def time_weighted_avg_sql(
    table_sql: str,
    key_exprs: Sequence[str],
    ts_expr: str,
    value_expr: str,
    tiebreak_expr: str,
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`time_weighted_avg` (HUGEINT segment
    sums == the Spark side's decimal(38,0))."""
    g = ", ".join(key_exprs)
    return f"""
WITH twa_t AS (
    SELECT {g}, {ts_expr} AS ts, epoch_us({ts_expr}) AS us,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS BIGINT) AS vfp,
           lead(epoch_us({ts_expr})) OVER (
               PARTITION BY {g} ORDER BY {ts_expr}, {tiebreak_expr}
           ) AS nxt
    FROM ({table_sql})
),
twa_s AS (
    SELECT {g}, count(*) AS n_samples,
           min(ts) AS first_ts, max(ts) AS last_ts,
           max(us) - min(us) AS total_us,
           sum(vfp::HUGEINT * (nxt - us)) AS sum_vdt
    FROM twa_t GROUP BY {g}
)
SELECT {g}, n_samples, first_ts, last_ts, total_us,
       CASE WHEN total_us > 0
            THEN round(CAST(sum_vdt AS DOUBLE)
                       / (CAST(total_us AS DOUBLE) * {scale}.0), 6)
       END AS twa
FROM twa_s
"""


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union overlapping/touching intervals per key — the classic
    gaps-and-islands rollup (public SQL folklore; the `range_agg` of
    PostgreSQL, `merge_overlapping` of interval libraries): intervals
    ``[start, end)`` that overlap or abut collapse into one island.

    Spark-first shape: ONE window pass per key ordered by (start, end)
    — a new island opens where ``start`` exceeds the running max of
    all previous ends; the island id is the running sum of those open
    flags — then one group-by. Cost at 100 TB: a single (key, start)
    sort-shuffle, no self-join, no explode.

    Output: ``<key_col>, island, island_start, island_end,
    n_intervals, covered_us`` — covered_us is the EXACT microsecond
    length of the merged island (bigint; no FP).
    """
    w_order = Window.partitionBy(key_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max_end = F.max(F.col(end_col)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    with_island = df.withColumn("island", F.sum(opens).over(w_order))
    return (
        with_island.groupBy(key_col, "island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        )
        .withColumn(
            "covered_us",
            # timestampdiff handles TIMESTAMP_NTZ (unix_micros does not)
            F.expr(
                "timestampdiff(MICROSECOND, island_start, island_end)"
            ).cast("bigint"),
        )
    )


def merge_intervals_sql(
    intervals_sql: str,
    key_expr: str = "k",
    start_expr: str = "s",
    end_expr: str = "e",
) -> str:
    """DuckDB mirror of :func:`merge_intervals` — identical window
    semantics (running max of prior ends, running sum of open flags)."""
    return f"""
WITH iv AS (SELECT {key_expr} AS k, {start_expr} AS s, {end_expr} AS e
            FROM ({intervals_sql})),
flagged AS (
    SELECT k, s, e,
           CASE WHEN max(e) OVER (
                    PARTITION BY k ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                 OR s > max(e) OVER (
                    PARTITION BY k ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) THEN 1 ELSE 0 END AS _open
    FROM iv
),
islands AS (
    SELECT k, s, e,
           sum(_open) OVER (PARTITION BY k ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
    FROM flagged
)
SELECT k, island, min(s) AS island_start, max(e) AS island_end,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(epoch_us(max(e)) - epoch_us(min(s)) AS BIGINT) AS covered_us
FROM islands GROUP BY k, island
"""


def ohlc_bars(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    id_col: str,
    trunc_unit: str = "day",
) -> DataFrame:
    """OHLC (open/high/low/close) candlestick downsampling per group
    and time bucket — the classic time-series rollup (every metrics /
    market-data store; TimescaleDB's ``time_bucket`` + first/last).

    Spark-first shape: ONE map-side-combined hash aggregate — open and
    close are ``min_by``/``max_by`` over an ordering key, so there is
    NO per-bucket window sort and no second pass; at 100 TB the cost
    is one (group, bucket)-keyed shuffle of partial aggregates.

    Cross-engine determinism: values go to integer cents half-up;
    same-timestamp ties are broken by ``id_col`` through ONE exact
    composite ordering key ``epoch_us(ts)·10¹⁹ + id`` held in
    decimal(38,0) (DuckDB: HUGEINT) — both engines pick the same row
    without a struct-ordered sort (DuckDB arg_min/arg_max cannot order
    by structs). ``vwap_cents`` (bucket mean) is ONE double division
    of exact integers, rounded to 6 dp.

    Output: ``*group_cols, bucket, open_cents, high_cents, low_cents,
    close_cents, n_ticks, volume_cents, vwap_cents``.
    """
    group_cols = list(group_cols)
    import decimal

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    # the 10^19 shift MUST be a decimal literal: a double 1e19 would
    # pull the whole key into float where the id tiebreak is below
    # the 53-bit mantissa and silently vanishes
    okey = (
        F.unix_micros(F.col(ts_col).cast("timestamp")).cast("decimal(18,0)")
        * F.lit(decimal.Decimal(10**19))
        + F.col(id_col).cast("decimal(38,0)")
    ).cast("decimal(38,0)")
    bucket = F.date_trunc(trunc_unit, F.col(ts_col)).alias("bucket")
    out = (
        df.select(*group_cols, bucket, cents.alias("_c"), okey.alias("_o"))
        .groupBy(*group_cols, "bucket")
        .agg(
            F.min_by("_c", "_o").alias("open_cents"),
            F.max("_c").alias("high_cents"),
            F.min("_c").alias("low_cents"),
            F.max_by("_c", "_o").alias("close_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
            F.sum("_c").cast("bigint").alias("volume_cents"),
        )
    )
    return out.withColumn(
        "vwap_cents",
        F.round(
            F.col("volume_cents").cast("double") / F.col("n_ticks").cast("double"), 6
        ),
    )


def ohlc_bars_sql(
    table_sql: str,
    group_exprs: Sequence[str],
    ts_expr: str,
    value_expr: str,
    id_expr: str,
    trunc_unit: str = "day",
) -> str:
    """DuckDB mirror of :func:`ohlc_bars` — same cents scaling, same
    HUGEINT composite ordering key, same one-division mean."""
    g = ", ".join(group_exprs)
    return f"""
WITH ohlc_t AS (
    SELECT {g}, date_trunc('{trunc_unit}', {ts_expr}) AS bucket,
           CAST(floor(({value_expr}) * 100 + 0.5) AS BIGINT) AS c,
           epoch_us({ts_expr})::HUGEINT * 10000000000000000000::HUGEINT
               + ({id_expr}) AS o
    FROM ({table_sql})
)
SELECT {g}, bucket,
       arg_min(c, o) AS open_cents,
       max(c) AS high_cents,
       min(c) AS low_cents,
       arg_max(c, o) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(sum(c) AS BIGINT) AS volume_cents,
       round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS vwap_cents
FROM ohlc_t GROUP BY {g}, bucket
"""


def acf(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Autocorrelation function per series: Pearson r between the
    series and its lag-k shift for k = 1..``max_lag`` — the classic
    seasonality/persistence diagnostic (Box & Jenkins, "Time Series
    Analysis", 1970 — public).

    Input is one row per (group, step) with an INTEGER value (the
    caller pre-aggregates raw facts to the series grain, e.g. daily
    cents totals — so at 100 TB this operator runs over |days|-sized
    frames, not raw events). Each series is assumed to fit a per-group
    window sort; the raw-fact collapse upstream is the scale-bearing
    shuffle.

    Spark-first shape: ONE window pass materializes all K lag columns
    (a single per-group sort), a stack unpivot turns them into
    (lag, x, y) pair rows, and one hash aggregate produces the exact
    decimal(38,0) sufficient statistics per (group, lag). The corr is
    the corr_matrix fixed IEEE formula over those exact integers —
    bit-equal across engines — then 6-dp rounded.

    Output: ``*group_cols, lag, n_pairs, corr`` (corr NULL when n < 2
    or a side has zero variance; pairs where either side is NULL are
    excluded — the first k rows of each series, plus any NULL-valued
    observations — the pairwise-complete convention).
    """
    gcols = require_groups(
        group_cols, "acf", "tag a constant series key first"
    )
    w = Window.partitionBy(*gcols).orderBy(F.col(order_col).asc())
    x = F.col(value_col).cast("decimal(19,0)")
    lagged = df.select(
        *gcols,
        x.alias("_x"),
        *[F.lag(x, k).over(w).alias(f"_y{k}") for k in range(1, max_lag + 1)],
    )
    stack_expr = "stack({n}, {args}) AS (lag, _y)".format(
        n=max_lag,
        args=", ".join(f"{k}, _y{k}" for k in range(1, max_lag + 1)),
    )
    pairs = lagged.selectExpr(*gcols, "_x", stack_expr).filter(
        F.col("_x").isNotNull() & F.col("_y").isNotNull()
    )
    dec = "decimal(38,0)"
    agg = pairs.groupBy(*gcols, "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("_x").cast(dec).alias("_sx"),
        F.sum("_y").cast(dec).alias("_sy"),
        F.sum(F.col("_x").cast(dec) * F.col("_x").cast(dec)).cast(dec).alias("_qx"),
        F.sum(F.col("_y").cast(dec) * F.col("_y").cast(dec)).cast(dec).alias("_qy"),
        F.sum(F.col("_x").cast(dec) * F.col("_y").cast(dec)).cast(dec).alias("_xy"),
    )
    nd = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    qx = F.col("_qx").cast("double")
    qy = F.col("_qy").cast("double")
    xy = F.col("_xy").cast("double")
    cov_n = nd * xy - sx * sy
    vx_n = nd * qx - sx * sx
    vy_n = nd * qy - sy * sy
    corr = F.when(
        (F.col("n_pairs") >= 2) & (vx_n > 0) & (vy_n > 0),
        F.round(cov_n / F.sqrt(vx_n * vy_n), 6),
    )
    return agg.select(
        *gcols, F.col("lag").cast("bigint").alias("lag"), "n_pairs", corr.alias("corr")
    )


def acf_sql(
    series_sql: str,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 5,
) -> str:
    """DuckDB mirror of :func:`acf` — identical HUGEINT sufficient
    statistics and IEEE corr formula per (group, lag)."""
    gcols = list(group_cols)
    gsel = "".join(f"{g}, " for g in gcols)
    part = ("PARTITION BY " + ", ".join(gcols)) if gcols else ""
    lag_cols = ", ".join(
        f"lag(_x, {k}) OVER ({part} ORDER BY {order_col}) AS _y{k}"
        for k in range(1, max_lag + 1)
    )
    unions = " UNION ALL ".join(
        f"SELECT {gsel}{k} AS lag, _x, _y{k} AS _y FROM _lagged"
        for k in range(1, max_lag + 1)
    )
    gby = ", ".join(gcols + ["lag"])
    return f"""
WITH _lagged AS (
    SELECT {gsel}{order_col}, CAST({value_col} AS BIGINT) AS _x, {lag_cols}
    FROM ({series_sql})
),
_pairs AS (
    SELECT * FROM ({unions}) _u WHERE _x IS NOT NULL AND _y IS NOT NULL
),
_agg AS (
    SELECT {gsel}lag, CAST(count(*) AS BIGINT) AS n_pairs,
           sum(CAST(_x AS HUGEINT)) AS sx, sum(CAST(_y AS HUGEINT)) AS sy,
           sum(CAST(_x AS HUGEINT) * _x) AS qx,
           sum(CAST(_y AS HUGEINT) * _y) AS qy,
           sum(CAST(_x AS HUGEINT) * _y) AS xy
    FROM _pairs GROUP BY {gby}
)
SELECT {gsel}CAST(lag AS BIGINT) AS lag, n_pairs,
       CASE WHEN n_pairs >= 2
             AND CAST(n_pairs AS DOUBLE) * CAST(qx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n_pairs AS DOUBLE) * CAST(qy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN round(
              (CAST(n_pairs AS DOUBLE) * CAST(xy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / sqrt((CAST(n_pairs AS DOUBLE) * CAST(qx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n_pairs AS DOUBLE) * CAST(qy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS corr
FROM _agg
"""


def period_over_period(
    df: DataFrame,
    group_cols: Sequence[str],
    date_col: str,
    value_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Period-over-period comparison (WoW/MoM product-metric change):
    each (group, day) row pairs with the same group's row exactly
    ``period_days`` earlier — calendar-aligned, so weekday effects
    cancel (the report the seasonal-baseline operator normalizes
    differently).

    Input is the pre-aggregated daily frame with NON-NEGATIVE integer
    values (counts/cents) — the acf grain discipline: at 100 TB the
    fact collapse upstream is the scale-bearing shuffle; this join is
    |days|-sized and co-partitioned on (group, date).

    Exactness: ``ratio_scaled = v·10^6 DIV prev`` (non-negative, so
    Spark's truncating div equals DuckDB's floor //); diff is an exact
    bigint; ratio is the one-division double (NULL when no prior row
    or prev = 0).

    Output: ``*group_cols, d, v, prev_v, diff, ratio_scaled, ratio``.
    """
    gcols = list(group_cols)
    cur = df.select(
        *gcols, F.col(date_col).alias("d"), F.col(value_col).cast("bigint").alias("v")
    )
    prev = df.select(
        *gcols,
        F.date_add(F.col(date_col), period_days).alias("d"),
        F.col(value_col).cast("bigint").alias("_pv"),
    )
    j = cur.join(prev, [*gcols, "d"], "left")
    return j.select(
        *gcols,
        "d",
        "v",
        F.col("_pv").alias("prev_v"),
        (F.col("v") - F.col("_pv")).alias("diff"),
        F.when(
            F.col("_pv") > 0, F.expr("(v * 1000000L) div _pv")
        ).alias("ratio_scaled"),
        F.when(
            F.col("_pv") > 0,
            F.round(F.col("v").cast("double") / F.col("_pv").cast("double"), 6),
        ).alias("ratio"),
    )


def period_over_period_sql(
    series_sql: str,
    group_cols: Sequence[str],
    date_col: str,
    value_col: str,
    period_days: int = 7,
) -> str:
    """DuckDB mirror of :func:`period_over_period` (DATE + INTERVAL
    literal — ``DATE + BIGINT`` does not bind in DuckDB)."""
    gcols = list(group_cols)
    gsel = "".join(f"{g}, " for g in gcols)
    on = " AND ".join([f"c.{g} = p.{g}" for g in gcols] + ["c.d = p.d2"])
    csel = "".join(f"c.{g}, " for g in gcols)
    return f"""
WITH _s AS (SELECT {gsel}{date_col} AS d, CAST({value_col} AS BIGINT) AS v
            FROM ({series_sql})),
_p AS (SELECT {gsel}d + INTERVAL {period_days} DAYS AS d2, v AS pv FROM _s)
SELECT {csel}c.d, c.v, p.pv AS prev_v, c.v - p.pv AS diff,
       CASE WHEN p.pv > 0 THEN (c.v * 1000000) // p.pv END AS ratio_scaled,
       CASE WHEN p.pv > 0
            THEN round(CAST(c.v AS DOUBLE) / CAST(p.pv AS DOUBLE), 6)
       END AS ratio
FROM _s c LEFT JOIN _p p ON {on}
"""


def decayed_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    half_life_days: int = 7,
    scale: int = 10**6,
) -> DataFrame:
    """Time-decayed popularity score per key: each event contributes
    weight ``(1/2)^(age_days DIV half_life_days)`` relative to the
    newest event in the dataset — the trending/recency ranking signal
    (exponentially-decayed counters, Cormode et al. "Forward decay",
    ICDE 2009 — public).

    Exactness: ages are integer days, the halving count is an integer
    division, and the weight is ``scale DIV 2^k`` — EXACT bigints end
    to end (no float pow); weights vanish for k >= ~20 at the default
    scale, which is the decay doing its job. The reference date is the
    data's own max day (deterministic), not wall-clock.

    Spark-first shape: raw events collapse in ONE hash aggregate to
    the (group, day) frame; the reference day and the weighted sum
    ride windows/aggregates over that tiny table.

    Output: ``*group_cols, n_events, score_scaled, score`` (score =
    score_scaled/scale, one division).
    """
    gcols = list(group_cols)
    daily = (
        df.select(*gcols, F.to_date(F.col(ts_col)).alias("_d"))
        .groupBy(*gcols, "_d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    from stepist_spark.operators.cumulative import whole_frame

    # |distinct days| rows — bounded frame, explicit single-task
    daily = daily.withColumn("_maxd", F.max("_d").over(whole_frame()))
    daily = daily.withColumn(
        "_k",
        F.least(
            F.expr(f"CAST(datediff(_maxd, _d) AS BIGINT) div {half_life_days}"),
            F.lit(62).cast("bigint"),
        ).cast("int"),
    ).withColumn("_wt", F.expr(f"{scale}L div shiftleft(1L, _k)"))
    term = F.col("_c") * F.col("_wt")
    agg = daily.groupBy(*gcols).agg(
        F.sum("_c").cast("bigint").alias("n_events"),
        F.sum(term).cast("bigint").alias("score_scaled"),
    )
    return agg.select(
        *gcols,
        "n_events",
        "score_scaled",
        F.round(F.col("score_scaled").cast("double") / F.lit(float(scale)), 6).alias(
            "score"
        ),
    )


def decayed_counts_sql(
    table_sql: str,
    group_exprs: Sequence[str],
    ts_expr: str,
    half_life_days: int = 7,
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`decayed_counts`."""
    g = ", ".join(group_exprs)
    return f"""
WITH _daily AS (
    SELECT {g}, CAST(({ts_expr}) AS DATE) AS _d,
           CAST(count(*) AS BIGINT) AS _c
    FROM ({table_sql}) GROUP BY {g}, 2
),
_ref AS (
    SELECT *, max(_d) OVER () AS _maxd FROM _daily
),
_w AS (
    SELECT {g}, _c,
           {scale} // (1 << least(CAST(date_diff('day', _d, _maxd) AS BIGINT)
                                  // {half_life_days}, 62)) AS _wt
    FROM _ref
)
SELECT {g}, CAST(sum(_c) AS BIGINT) AS n_events,
       CAST(sum(_c * _wt) AS BIGINT) AS score_scaled,
       round(CAST(sum(_c * _wt) AS DOUBLE) / {float(scale)}, 6) AS score
FROM _w GROUP BY {g}
"""


def ccf(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Cross-correlation function between two aligned series: Pearson r
    between ``x_t`` and ``y_{t-k}`` for k = −max_lag..max_lag — the
    lead-lag diagnostic (Box & Jenkins 1970, public): a peak at
    POSITIVE k says y moves k steps BEFORE x (y leads); negative k
    says x leads. Lag 0 is the plain contemporaneous correlation.

    Same contract and shape as :func:`acf` (which is the x==y
    diagonal): one row per (group, step) with INTEGER values — the
    caller pre-aggregates raw facts to the series grain, so the
    scale-bearing shuffle is upstream; ONE window pass materializes
    all 2K+1 shifted columns, a stack unpivot and one hash aggregate
    produce exact decimal(38,0)/HUGEINT sufficient statistics per
    (group, lag), and the corr is the corr_matrix fixed IEEE formula,
    6-dp. Pairs where EITHER side is NULL are excluded — series edges
    (shifted value NULL) and NULL-bearing x alike — matching acf and
    the textbook pairwise-complete convention.

    Output: ``*group_cols, lag, n_pairs, corr``.
    """
    gcols = require_groups(group_cols, "ccf", "tag a constant series key first")
    w = Window.partitionBy(*gcols).orderBy(F.col(order_col).asc())
    x = F.col(x_col).cast("decimal(19,0)")
    y = F.col(y_col).cast("decimal(19,0)")
    lags = list(range(-max_lag, max_lag + 1))

    def _alias(k: int) -> str:
        return f"_y{'m' if k < 0 else ''}{abs(k)}"

    # negative k spelled as lead(): negative lag offsets are not
    # portable (DuckDB binds lag/lead offsets as non-negative)
    lagged = df.select(
        *gcols,
        x.alias("_x"),
        *[
            (F.lag(y, k) if k >= 0 else F.lead(y, -k)).over(w).alias(_alias(k))
            for k in lags
        ],
    )
    stack_expr = "stack({n}, {args}) AS (lag, _y)".format(
        n=len(lags),
        args=", ".join(f"{k}, {_alias(k)}" for k in lags),
    )
    pairs = lagged.selectExpr(*gcols, "_x", stack_expr).filter(
        F.col("_x").isNotNull() & F.col("_y").isNotNull()
    )
    dec = "decimal(38,0)"
    agg = pairs.groupBy(*gcols, "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("_x").cast(dec).alias("_sx"),
        F.sum("_y").cast(dec).alias("_sy"),
        F.sum(F.col("_x").cast(dec) * F.col("_x").cast(dec)).cast(dec).alias("_qx"),
        F.sum(F.col("_y").cast(dec) * F.col("_y").cast(dec)).cast(dec).alias("_qy"),
        F.sum(F.col("_x").cast(dec) * F.col("_y").cast(dec)).cast(dec).alias("_xy"),
    )
    nd = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    qx = F.col("_qx").cast("double")
    qy = F.col("_qy").cast("double")
    xy = F.col("_xy").cast("double")
    cov_n = nd * xy - sx * sy
    vx_n = nd * qx - sx * sx
    vy_n = nd * qy - sy * sy
    corr = F.when(
        (F.col("n_pairs") >= 2) & (vx_n > 0) & (vy_n > 0),
        F.round(cov_n / F.sqrt(vx_n * vy_n), 6),
    )
    return agg.select(
        *gcols, F.col("lag").cast("bigint").alias("lag"), "n_pairs", corr.alias("corr")
    )


def ccf_sql(
    series_sql: str,
    group_cols: Sequence[str],
    order_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 3,
) -> str:
    """DuckDB mirror of :func:`ccf` — identical HUGEINT sufficient
    statistics and IEEE corr formula per (group, lag)."""
    gcols = list(group_cols)
    gsel = "".join(f"{g}, " for g in gcols)
    part = ("PARTITION BY " + ", ".join(gcols)) if gcols else ""
    lags = list(range(-max_lag, max_lag + 1))

    def _alias(k: int) -> str:
        return f"_y{'m' if k < 0 else ''}{abs(k)}"

    lag_cols = ", ".join(
        (
            f"lag(CAST({y_col} AS BIGINT), {k}) OVER ({part} ORDER BY {order_col})"
            if k >= 0
            else f"lead(CAST({y_col} AS BIGINT), {-k}) OVER ({part} ORDER BY {order_col})"
        )
        + f" AS {_alias(k)}"
        for k in lags
    )
    unions = " UNION ALL ".join(
        f"SELECT {gsel}{k} AS lag, _x, {_alias(k)} AS _y FROM _cl" for k in lags
    )
    gby = ", ".join(gcols + ["lag"])
    return f"""
WITH _cl AS (
    SELECT {gsel}{order_col}, CAST({x_col} AS BIGINT) AS _x, {lag_cols}
    FROM ({series_sql})
),
_cp AS (
    SELECT * FROM ({unions}) _u WHERE _x IS NOT NULL AND _y IS NOT NULL
),
_ca AS (
    SELECT {gsel}lag, CAST(count(*) AS BIGINT) AS n_pairs,
           sum(CAST(_x AS HUGEINT)) AS sx, sum(CAST(_y AS HUGEINT)) AS sy,
           sum(CAST(_x AS HUGEINT) * _x) AS qx,
           sum(CAST(_y AS HUGEINT) * _y) AS qy,
           sum(CAST(_x AS HUGEINT) * _y) AS xy
    FROM _cp GROUP BY {gby}
)
SELECT {gsel}CAST(lag AS BIGINT) AS lag, n_pairs,
       CASE WHEN n_pairs >= 2
             AND CAST(n_pairs AS DOUBLE) * CAST(qx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n_pairs AS DOUBLE) * CAST(qy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN round(
              (CAST(n_pairs AS DOUBLE) * CAST(xy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / sqrt((CAST(n_pairs AS DOUBLE) * CAST(qx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n_pairs AS DOUBLE) * CAST(qy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS corr
FROM _ca
"""


def mann_kendall_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    slope_scale: int = 1_000_000,
) -> DataFrame:
    """Mann-Kendall monotone-trend test + Theil-Sen slope per group —
    the robust "is this metric drifting" readout (Mann 1945, Kendall
    1975; Theil 1950 / Sen 1968, all public): rank-based S statistic
    with the standard tie-corrected variance, and the median of all
    pairwise slopes as the outlier-proof trend estimate.

    Contract like :func:`acf`: the caller pre-aggregates raw facts to
    the series grain (one row per (group, step) with INTEGER order and
    value columns), so the per-group frame is bounded by the series
    span — the all-pairs self-join this test is defined over is then
    |span|² per group, a deliberate bounded-frame computation, never a
    row-scale cartesian. The scale-bearing shuffle is the upstream
    collapse.

    Exactness: S and the ×18 variance ``n(n−1)(2n+5) − Σt(t−1)(2t+5)``
    are exact bigints; each pairwise slope is ``floor(dy·scale / dt)``
    (one exact-operand IEEE division + floor, identical on both
    engines); the doubled median ``sen2x_scaled`` (sum of the two
    middle order statistics; 2× the middle one when the pair count is
    odd) is an exact bigint — no interpolation convention to disagree
    on. Only z is floating point, 6 dp, with the ±1 continuity
    correction of the standard normal approximation.

    Output: ``*group_cols, n_obs, s, var18, sen2x_scaled, z_stat``
    (z NULL when var18 ≤ 0, i.e. fewer than 2 distinct steps or all
    values tied). Requires n_obs ≥ 2 per group: a single-observation
    group has an empty pairs frame, so the inner join with pair_stats
    DROPS it from the output entirely (no pairwise slope exists to
    report). The DuckDB mirror behaves identically, so parity holds;
    callers wanting degenerate groups surfaced should pre-filter or
    pad series to ≥ 2 steps.
    """
    gcols = require_groups(
        group_cols, "mann_kendall_trend", "tag a constant series key first"
    )
    t = F.col(order_col).cast("bigint")
    y = F.col(value_col).cast("bigint")
    series = df.select(*gcols, t.alias("_t"), y.alias("_y"))

    a = series.select(*gcols, F.col("_t").alias("_ta"), F.col("_y").alias("_ya"))
    b = series.select(*gcols, F.col("_t").alias("_tb"), F.col("_y").alias("_yb"))
    pairs = a.join(b, on=list(gcols), how="inner").filter(F.col("_ta") < F.col("_tb"))
    dy = F.col("_yb") - F.col("_ya")
    dt = F.col("_tb") - F.col("_ta")
    slope = F.floor(
        (dy.cast("double") * F.lit(float(slope_scale))) / dt.cast("double")
    ).cast("bigint")
    pairs = pairs.select(
        *gcols,
        F.signum(dy.cast("double")).cast("bigint").alias("_sgn"),
        slope.alias("_slope"),
        "_ta",
        "_tb",
    )

    # Theil-Sen: the doubled median over the bounded per-group pairs
    # frame (require_groups guards the raw-row grouped window)
    w = Window.partitionBy(*gcols).orderBy("_slope", "_ta", "_tb")
    ranked = pairs.select(
        *gcols,
        "_sgn",
        "_slope",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*gcols)).alias("_cnt"),
    )
    # lo = floor((cnt+1)/2), hi = floor((cnt+2)/2) — spelled with
    # floor() on exact doubles for engine-portable integer division
    lo = F.floor((F.col("_cnt").cast("double") + 1.0) / 2.0).cast("bigint")
    hi = F.floor((F.col("_cnt").cast("double") + 2.0) / 2.0).cast("bigint")
    pick = (F.col("_rn") == lo).cast("int") + (F.col("_rn") == hi).cast("int")
    pair_stats = ranked.groupBy(*gcols).agg(
        F.sum("_sgn").cast("bigint").alias("s"),
        F.sum(F.col("_slope") * pick).cast("bigint").alias("sen2x_scaled"),
    )

    n_obs = series.groupBy(*gcols).agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    ties = (
        series.groupBy(*gcols, "_y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_tc"))
        .groupBy(*gcols)
        .agg(
            F.sum(
                F.col("_tc") * (F.col("_tc") - 1) * (2 * F.col("_tc") + 5)
            ).cast("bigint").alias("_tie18")
        )
    )
    out = n_obs.join(ties, on=list(gcols)).join(pair_stats, on=list(gcols))
    n = F.col("n_obs")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("_tie18")).cast("bigint")
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s") > 0, (F.col("s").cast("double") - F.lit(1.0)) / sd)
        .when(F.col("s") < 0, (F.col("s").cast("double") + F.lit(1.0)) / sd)
        .otherwise(F.lit(0.0))
    )
    return out.select(
        *gcols,
        "n_obs",
        "s",
        var18.alias("var18"),
        "sen2x_scaled",
        F.when(var18 > 0, F.round(z, 6)).alias("z_stat"),
    )


def mann_kendall_trend_sql(
    series_sql: str,
    group_cols: Sequence[str],
    order_col: str,
    value_col: str,
    slope_scale: int = 1_000_000,
) -> str:
    """DuckDB mirror of :func:`mann_kendall_trend` — identical exact
    integers and IEEE z sequence."""
    gcols = list(group_cols)
    gsel = "".join(f"{g}, " for g in gcols)
    gby = ", ".join(gcols)
    on = " AND ".join(f"a.{g} = b.{g}" for g in gcols)
    agsel = "".join(f"a.{g}, " for g in gcols)
    return f"""
WITH _mks AS (
    SELECT {gsel}CAST({order_col} AS BIGINT) AS _t, CAST({value_col} AS BIGINT) AS _y
    FROM ({series_sql})
),
_mkp AS (
    SELECT {agsel}
           CAST(sign(CAST(b._y - a._y AS DOUBLE)) AS BIGINT) AS _sgn,
           CAST(floor(CAST(b._y - a._y AS DOUBLE) * {float(slope_scale)}
                      / CAST(b._t - a._t AS DOUBLE)) AS BIGINT) AS _slope,
           a._t AS _ta, b._t AS _tb
    FROM _mks a JOIN _mks b ON {on} AND a._t < b._t
),
_mkr AS (
    SELECT *, row_number() OVER (PARTITION BY {gby} ORDER BY _slope, _ta, _tb) AS _rn,
           count(*) OVER (PARTITION BY {gby}) AS _cnt
    FROM _mkp
),
_mka AS (
    SELECT {gsel}CAST(sum(_sgn) AS BIGINT) AS s,
           CAST(sum(_slope * (CAST(_rn = CAST(floor((CAST(_cnt AS DOUBLE) + 1.0) / 2.0) AS BIGINT) AS INTEGER)
                              + CAST(_rn = CAST(floor((CAST(_cnt AS DOUBLE) + 2.0) / 2.0) AS BIGINT) AS INTEGER)))
                AS BIGINT) AS sen2x_scaled
    FROM _mkr GROUP BY {gby}
),
_mkn AS (
    SELECT {gsel}CAST(count(*) AS BIGINT) AS n_obs FROM _mks GROUP BY {gby}
),
_mkt AS (
    SELECT {gsel}CAST(sum(_tc * (_tc - 1) * (2 * _tc + 5)) AS BIGINT) AS _tie18
    FROM (SELECT {gsel}_y, CAST(count(*) AS BIGINT) AS _tc FROM _mks GROUP BY {gby}, _y) _c
    GROUP BY {gby}
)
SELECT {gsel}n_obs, s,
       CAST(n_obs * (n_obs - 1) * (2 * n_obs + 5) - _tie18 AS BIGINT) AS var18,
       sen2x_scaled,
       CASE WHEN n_obs * (n_obs - 1) * (2 * n_obs + 5) - _tie18 > 0
            THEN round(
              CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                        / sqrt(CAST(n_obs * (n_obs - 1) * (2 * n_obs + 5) - _tie18 AS DOUBLE) / 18.0)
                   WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                        / sqrt(CAST(n_obs * (n_obs - 1) * (2 * n_obs + 5) - _tie18 AS DOUBLE) / 18.0)
                   ELSE 0.0 END, 6)
       END AS z_stat
FROM _mkn JOIN _mkt USING ({gby}) JOIN _mka USING ({gby})
"""
