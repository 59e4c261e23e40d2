"""A/B experiment statistics at corpus scale: Welch's unequal-variance
t statistic for a metric comparison and the two-proportion pooled z
statistic for a conversion comparison (Welch, Biometrika 1947;
standard experimentation-platform methodology — public).

The reference has no analytics surface (SURVEY.md §2.2); this is the
product-analytics extension family (experiment readout over event
logs).

Spark-first shape: both tests collapse the fact table to ONE row of
sufficient statistics in a single map-side-combined conditional
aggregate (no per-group rescans, no sort) — the corr_matrix
discipline. At 100 TB the cost is one scan.

Cross-engine determinism: metric values scale to integer cents
half-up and the sums accumulate EXACTLY in decimal(38,0) (DuckDB:
HUGEINT); the final statistics are a fixed sequence of
individually-rounded IEEE ops (+,−,×,÷,sqrt are correctly rounded)
over identical exact integers — bit-equal across engines — then 6-dp
rounded."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def welch_ttest(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Welch's t between two groups of a metric column.

    Output (one row): ``n_a, n_b, sum_a, sum_b, sumsq_a, sumsq_b``
    (exact, in scaled integer units) plus ``mean_a, mean_b, t_stat,
    welch_df`` (doubles, 6 dp; NULL when either group has n < 2 or
    both variances are zero). Means are in ORIGINAL units
    (mean = S/(n·scale) — two exact-operand divisions)."""
    g = F.col(group_col)
    x = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
    in_a = g == group_a
    in_b = g == group_b

    def _msum(cond: Column, expr: Column, alias: str) -> Column:
        return F.sum(F.when(cond, expr)).cast("decimal(38,0)").alias(alias)

    stats = df.filter(in_a | in_b).agg(
        F.count(F.when(in_a, F.lit(1))).cast("bigint").alias("n_a"),
        F.count(F.when(in_b, F.lit(1))).cast("bigint").alias("n_b"),
        _msum(in_a, x, "sum_a"),
        _msum(in_b, x, "sum_b"),
        _msum(in_a, x * x, "sumsq_a"),
        _msum(in_b, x * x, "sumsq_b"),
    )
    return _welch_output(stats, scale)


def _welch_output(stats: DataFrame, scale: int) -> DataFrame:
    """:func:`welch_ttest`'s IEEE output projection over its exact
    sufficient-statistics frame (``n_a, n_b, sum_a, sum_b, sumsq_a,
    sumsq_b``) — split out so :func:`ab_readout_fused` can feed the
    byte-identical expression sequence from a shared aggregate."""
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa = F.col("sum_a").cast("double")
    sb = F.col("sum_b").cast("double")
    qa = F.col("sumsq_a").cast("double")
    qb = F.col("sumsq_b").cast("double")
    # sample variance via the exact-integer numerator: n·Σx² − (Σx)²
    va = (na * qa - sa * sa) / (na * (na - F.lit(1.0)))
    vb = (nb * qb - sb * sb) / (nb * (nb - F.lit(1.0)))
    sea = va / na
    seb = vb / nb
    se2 = sea + seb
    t = (sa / na - sb / nb) / F.sqrt(se2)
    wdf = (se2 * se2) / (
        sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0))
    )
    valid = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return stats.select(
        "n_a",
        "n_b",
        F.col("sum_a").cast("bigint").alias("sum_a"),
        F.col("sum_b").cast("bigint").alias("sum_b"),
        F.col("sumsq_a").cast("bigint").alias("sumsq_a"),
        F.col("sumsq_b").cast("bigint").alias("sumsq_b"),
        F.round(sa / na / F.lit(float(scale)), 6).alias("mean_a"),
        F.round(sb / nb / F.lit(float(scale)), 6).alias("mean_b"),
        F.when(valid, F.round(t, 6)).alias("t_stat"),
        F.when(valid, F.round(wdf, 6)).alias("welch_df"),
    )


def welch_ttest_sql(
    table_sql: str,
    group_expr: str,
    group_a: str,
    group_b: str,
    value_expr: str,
    scale: int = 100,
) -> str:
    """DuckDB mirror of :func:`welch_ttest` — identical HUGEINT sums
    and IEEE expression sequence."""
    return f"""
WITH _r AS (
    SELECT ({group_expr}) AS _g,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS BIGINT) AS _x
    FROM ({table_sql})
    WHERE ({group_expr}) IN ('{group_a}', '{group_b}')
),
_s AS (
    SELECT
        CAST(count(CASE WHEN _g = '{group_a}' THEN 1 END) AS BIGINT) AS n_a,
        CAST(count(CASE WHEN _g = '{group_b}' THEN 1 END) AS BIGINT) AS n_b,
        sum(CASE WHEN _g = '{group_a}' THEN CAST(_x AS HUGEINT) END) AS sum_a,
        sum(CASE WHEN _g = '{group_b}' THEN CAST(_x AS HUGEINT) END) AS sum_b,
        sum(CASE WHEN _g = '{group_a}' THEN CAST(_x AS HUGEINT) * _x END) AS sumsq_a,
        sum(CASE WHEN _g = '{group_b}' THEN CAST(_x AS HUGEINT) * _x END) AS sumsq_b
    FROM _r
)
SELECT n_a, n_b,
       CAST(sum_a AS BIGINT) AS sum_a, CAST(sum_b AS BIGINT) AS sum_b,
       CAST(sumsq_a AS BIGINT) AS sumsq_a, CAST(sumsq_b AS BIGINT) AS sumsq_b,
       round(CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE) / {float(scale)}, 6) AS mean_a,
       round(CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE) / {float(scale)}, 6) AS mean_b,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND _se2 > 0
            THEN round((CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                        - CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                       / sqrt(_se2), 6) END AS t_stat,
       CASE WHEN n_a >= 2 AND n_b >= 2 AND _se2 > 0
            THEN round((_se2 * _se2)
                       / (_sea * _sea / (CAST(n_a AS DOUBLE) - 1.0)
                          + _seb * _seb / (CAST(n_b AS DOUBLE) - 1.0)), 6)
       END AS welch_df
FROM (
    SELECT *,
        ((CAST(n_a AS DOUBLE) * CAST(sumsq_a AS DOUBLE)
          - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE))
         / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
        / CAST(n_a AS DOUBLE) AS _sea,
        ((CAST(n_b AS DOUBLE) * CAST(sumsq_b AS DOUBLE)
          - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE))
         / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
        / CAST(n_b AS DOUBLE) AS _seb,
        ((CAST(n_a AS DOUBLE) * CAST(sumsq_a AS DOUBLE)
          - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE))
         / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
        / CAST(n_a AS DOUBLE)
        + ((CAST(n_b AS DOUBLE) * CAST(sumsq_b AS DOUBLE)
            - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE))
           / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
        / CAST(n_b AS DOUBLE) AS _se2
    FROM _s
)
"""


def cuped_adjusted(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    covariate_col: str,
    scale: int = 100,
    cov_scale: int = 100,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker, WSDM 2013 — public methodology): adjust each arm's metric
    mean with a pre-experiment covariate, Ŷ_adj = Ȳ − θ·(X̄_arm − X̄),
    where θ = Cov(X,Y)/Var(X) is pooled over both arms.

    Same one-aggregate shape as :func:`welch_ttest`: ALL sufficient
    statistics — pooled n/Σx/Σy/Σx²/Σy²/Σxy plus per-arm n/Σx/Σy —
    come out of ONE map-side-combined conditional aggregate (one scan
    at any SF). Values scale to integers half-up and accumulate
    exactly in decimal(38,0)/HUGEINT; θ, the adjusted means (original
    units), and the variance-reduction ratio ρ² = Cov²/(VarX·VarY) are
    a fixed IEEE sequence over those exact integers, 6-dp rounded.
    NULL θ/adjusted/rho2 when Var(X) = 0 (or Var(Y) = 0 for ρ²)."""
    g = F.col(group_col)
    y = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
    x = F.floor(F.col(covariate_col) * cov_scale + F.lit(0.5)).cast("decimal(19,0)")
    in_a = g == group_a
    in_b = g == group_b

    def _d38(expr: Column, alias: str) -> Column:
        return F.sum(expr).cast("decimal(38,0)").alias(alias)

    stats = df.filter(in_a | in_b).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _d38(x, "sx"),
        _d38(y, "sy"),
        _d38(x * x, "sxx"),
        _d38(y * y, "syy"),
        _d38(x * y, "sxy"),
        F.count(F.when(in_a, F.lit(1))).cast("bigint").alias("n_a"),
        F.count(F.when(in_b, F.lit(1))).cast("bigint").alias("n_b"),
        F.sum(F.when(in_a, x)).cast("decimal(38,0)").alias("sx_a"),
        F.sum(F.when(in_b, x)).cast("decimal(38,0)").alias("sx_b"),
        F.sum(F.when(in_a, y)).cast("decimal(38,0)").alias("sy_a"),
        F.sum(F.when(in_b, y)).cast("decimal(38,0)").alias("sy_b"),
    )
    return _cuped_output(stats, scale, cov_scale)


def _cuped_output(stats: DataFrame, scale: int, cov_scale: int) -> DataFrame:
    """:func:`cuped_adjusted`'s IEEE output projection over its exact
    sufficient-statistics frame (``n, sx, sy, sxx, syy, sxy, n_a, n_b,
    sx_a, sx_b, sy_a, sy_b``) — split out for :func:`ab_readout_fused`."""
    n = F.col("n").cast("double")
    # n·Σxy − Σx·Σy etc. stay EXACT in decimal(38,0) before the one
    # double cast — the corr_matrix discipline
    cov_n = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("decimal(38,0)").cast("double")
    varx_n = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("decimal(38,0)").cast("double")
    vary_n = (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ).cast("decimal(38,0)").cast("double")
    theta = cov_n / varx_n  # scaled-y per scaled-x units
    xbar = F.col("sx").cast("double") / n

    def _adj(sy_arm: str, sx_arm: str, n_arm: str) -> Column:
        na = F.col(n_arm).cast("double")
        return (
            F.col(sy_arm).cast("double") / na
            - theta * (F.col(sx_arm).cast("double") / na - xbar)
        ) / F.lit(float(scale))

    varx_ok = varx_n > 0
    both = varx_ok & (vary_n > 0)
    return stats.select(
        "n_a",
        "n_b",
        F.col("sy_a").cast("bigint").alias("sum_a"),
        F.col("sy_b").cast("bigint").alias("sum_b"),
        F.col("sx_a").cast("bigint").alias("cov_sum_a"),
        F.col("sx_b").cast("bigint").alias("cov_sum_b"),
        F.round(F.col("sy_a").cast("double") / F.col("n_a").cast("double")
                / F.lit(float(scale)), 6).alias("mean_a"),
        F.round(F.col("sy_b").cast("double") / F.col("n_b").cast("double")
                / F.lit(float(scale)), 6).alias("mean_b"),
        F.when(varx_ok, F.round(theta * F.lit(float(cov_scale) / float(scale)), 6)).alias("theta"),
        F.when(varx_ok, F.round(_adj("sy_a", "sx_a", "n_a"), 6)).alias("adj_mean_a"),
        F.when(varx_ok, F.round(_adj("sy_b", "sx_b", "n_b"), 6)).alias("adj_mean_b"),
        F.when(both, F.round(cov_n * cov_n / (varx_n * vary_n), 6)).alias("rho2"),
    )


def cuped_adjusted_sql(
    table_sql: str,
    group_expr: str,
    group_a: str,
    group_b: str,
    value_expr: str,
    covariate_expr: str,
    scale: int = 100,
    cov_scale: int = 100,
) -> str:
    """DuckDB mirror of :func:`cuped_adjusted` — identical HUGEINT
    sums and IEEE expression sequence."""
    return f"""
WITH _r AS (
    SELECT ({group_expr}) AS _g,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS HUGEINT) AS _y,
           CAST(floor(({covariate_expr}) * {cov_scale} + 0.5) AS HUGEINT) AS _x
    FROM ({table_sql})
    WHERE ({group_expr}) IN ('{group_a}', '{group_b}')
),
_s AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           sum(_x) AS sx, sum(_y) AS sy,
           sum(_x * _x) AS sxx, sum(_y * _y) AS syy, sum(_x * _y) AS sxy,
           CAST(count(CASE WHEN _g = '{group_a}' THEN 1 END) AS BIGINT) AS n_a,
           CAST(count(CASE WHEN _g = '{group_b}' THEN 1 END) AS BIGINT) AS n_b,
           sum(CASE WHEN _g = '{group_a}' THEN _x END) AS sx_a,
           sum(CASE WHEN _g = '{group_b}' THEN _x END) AS sx_b,
           sum(CASE WHEN _g = '{group_a}' THEN _y END) AS sy_a,
           sum(CASE WHEN _g = '{group_b}' THEN _y END) AS sy_b
    FROM _r
),
_t AS (
    SELECT *,
        CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
        CAST(n * syy - sy * sy AS DOUBLE) AS varyn,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
    FROM _s
)
SELECT n_a, n_b,
       CAST(sy_a AS BIGINT) AS sum_a, CAST(sy_b AS BIGINT) AS sum_b,
       CAST(sx_a AS BIGINT) AS cov_sum_a, CAST(sx_b AS BIGINT) AS cov_sum_b,
       round(CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / {float(scale)}, 6) AS mean_a,
       round(CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / {float(scale)}, 6) AS mean_b,
       CASE WHEN varxn > 0 THEN round(covn / varxn * {float(cov_scale) / float(scale)}, 6) END AS theta,
       CASE WHEN varxn > 0 THEN round(
           (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - (covn / varxn) * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - xbar))
           / {float(scale)}, 6) END AS adj_mean_a,
       CASE WHEN varxn > 0 THEN round(
           (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
            - (covn / varxn) * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) - xbar))
           / {float(scale)}, 6) END AS adj_mean_b,
       CASE WHEN varxn > 0 AND varyn > 0
            THEN round(covn * covn / (varxn * varyn), 6) END AS rho2
FROM _t
"""


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    success_col: "str | Column",
) -> DataFrame:
    """Pooled two-proportion z between two groups of a boolean
    outcome. Output (one row): exact ``n_a, n_b, s_a, s_b`` plus
    ``rate_a, rate_b, z_stat`` (doubles, 6 dp; z NULL when a group is
    empty or the pooled rate is degenerate 0/1). ``success_col`` may
    be a column name or a boolean Column expression."""
    g = F.col(group_col)
    y = (
        F.col(success_col) if isinstance(success_col, str) else success_col
    ).cast("boolean").cast("int")
    in_a = g == group_a
    in_b = g == group_b
    stats = df.filter(in_a | in_b).agg(
        F.count(F.when(in_a, F.lit(1))).cast("bigint").alias("n_a"),
        F.count(F.when(in_b, F.lit(1))).cast("bigint").alias("n_b"),
        F.sum(F.when(in_a, y)).cast("bigint").alias("s_a"),
        F.sum(F.when(in_b, y)).cast("bigint").alias("s_b"),
    )
    return _propz_output(stats)


def _propz_output(stats: DataFrame) -> DataFrame:
    """:func:`two_proportion_ztest`'s IEEE output projection over its
    exact frame (``n_a, n_b, s_a, s_b``) — split out for
    :func:`ab_readout_fused`."""
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    pa = F.col("s_a").cast("double") / na
    pb = F.col("s_b").cast("double") / nb
    pp = (F.col("s_a") + F.col("s_b")).cast("double") / (na + nb)
    se = F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    valid = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("s_a") + F.col("s_b") > 0)
        & (F.col("s_a") + F.col("s_b") < F.col("n_a") + F.col("n_b"))
    )
    return stats.select(
        "n_a",
        "n_b",
        "s_a",
        "s_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.when(valid, F.round((pa - pb) / se, 6)).alias("z_stat"),
    )


def two_proportion_ztest_sql(
    table_sql: str,
    group_expr: str,
    group_a: str,
    group_b: str,
    success_expr: str,
) -> str:
    """DuckDB mirror of :func:`two_proportion_ztest`."""
    return f"""
WITH _r AS (
    SELECT ({group_expr}) AS _g, CAST(({success_expr}) AS INTEGER) AS _y
    FROM ({table_sql})
    WHERE ({group_expr}) IN ('{group_a}', '{group_b}')
),
_s AS (
    SELECT CAST(count(CASE WHEN _g = '{group_a}' THEN 1 END) AS BIGINT) AS n_a,
           CAST(count(CASE WHEN _g = '{group_b}' THEN 1 END) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN _g = '{group_a}' THEN _y END) AS BIGINT) AS s_a,
           CAST(sum(CASE WHEN _g = '{group_b}' THEN _y END) AS BIGINT) AS s_b
    FROM _r
)
SELECT n_a, n_b, s_a, s_b,
       round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
       round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0 AND s_a + s_b > 0
                 AND s_a + s_b < n_a + n_b
            THEN round(
              (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
              / sqrt((CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                     * (1.0 - CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                     * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
       END AS z_stat
FROM _s
"""


def ab_readout_fused(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    covariate_col: str,
    success_col: "str | Column",
    scale: int = 100,
    cov_scale: int = 100,
) -> "tuple[DataFrame, DataFrame, DataFrame]":
    """One fused sufficient-statistics pass for the A/B readout trio —
    returns ``(welch, propz, cuped)`` frames value-identical to
    :func:`welch_ttest`, :func:`two_proportion_ztest` and
    :func:`cuped_adjusted` over the same ``df``/groups by construction:

    - the three originals each run ONE conditional aggregate over the
      identical ``filter(g IN (a, b))`` row set; the fused aggregate
      computes the union of their sum/count columns in a single pass
      (welch's Σy/Σy² per arm ARE cuped's sy_a/sy_b and ride the same
      expressions; only propz's success sums and cuped's pooled
      cross-moments are extra columns),
    - every sum is the same exact decimal(38,0)/bigint expression, and
      exact sums are partitioning/order-independent,
    - the three outputs are produced by the originals' own split-out
      IEEE projections (``_welch_output``/``_propz_output``/
      ``_cuped_output``) over the shared one-row frame, so the
      floating-point expression sequences are byte-identical.

    The one-row stats frame is lazily localCheckpointed: three
    consumers, one fact-table scan at any SF (guide §2.3) instead of
    three."""
    g = F.col(group_col)
    y = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
    x = F.floor(F.col(covariate_col) * cov_scale + F.lit(0.5)).cast(
        "decimal(19,0)"
    )
    s = (
        F.col(success_col) if isinstance(success_col, str) else success_col
    ).cast("boolean").cast("int")
    in_a = g == group_a
    in_b = g == group_b

    def _d38(expr: Column, alias: str) -> Column:
        return F.sum(expr).cast("decimal(38,0)").alias(alias)

    stats = df.filter(in_a | in_b).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(in_a, F.lit(1))).cast("bigint").alias("n_a"),
        F.count(F.when(in_b, F.lit(1))).cast("bigint").alias("n_b"),
        # welch sum_a/sum_b == cuped sy_a/sy_b (same expression)
        _d38(F.when(in_a, y), "sy_a"),
        _d38(F.when(in_b, y), "sy_b"),
        # welch per-arm sum of squares
        _d38(F.when(in_a, y * y), "syy_a"),
        _d38(F.when(in_b, y * y), "syy_b"),
        # cuped pooled moments
        _d38(x, "sx"),
        _d38(y, "sy"),
        _d38(x * x, "sxx"),
        _d38(y * y, "syy"),
        _d38(x * y, "sxy"),
        _d38(F.when(in_a, x), "sx_a"),
        _d38(F.when(in_b, x), "sx_b"),
        # propz success counts
        F.sum(F.when(in_a, s)).cast("bigint").alias("s_a"),
        F.sum(F.when(in_b, s)).cast("bigint").alias("s_b"),
    ).localCheckpoint(eager=False)
    welch = _welch_output(
        stats.select(
            "n_a",
            "n_b",
            F.col("sy_a").alias("sum_a"),
            F.col("sy_b").alias("sum_b"),
            F.col("syy_a").alias("sumsq_a"),
            F.col("syy_b").alias("sumsq_b"),
        ),
        scale,
    )
    propz = _propz_output(stats.select("n_a", "n_b", "s_a", "s_b"))
    cuped = _cuped_output(
        stats.select(
            "n", "sx", "sy", "sxx", "syy", "sxy",
            "n_a", "n_b", "sx_a", "sx_b", "sy_a", "sy_b",
        ),
        scale,
        cov_scale,
    )
    return welch, propz, cuped


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    scale: int = 100,
    value_counts: DataFrame | None = None,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between two groups — the
    NONPARAMETRIC companion of :func:`welch_ttest` (Mann & Whitney
    1947, public): rank-based, so heavy tails and outliers that sink a
    t-test leave it calibrated. Normal approximation with the standard
    tie-corrected variance, no continuity correction (documented — the
    ±0.5 shift is a convention choice and omitting it keeps the
    cross-engine expression short).

    Exactness without ranking rows: U doubles to an INTEGER —
    ``2·U_a = Σ_v ca(v)·(2·cb_below(v) + cb(v))`` over the merged
    distinct-value frame — so the statistic's numerator is an exact
    decimal(38,0)/HUGEINT, as is the tie term ``Σ(t³−t)``. Only the
    final z is floating point, one fixed IEEE sequence, 6 dp.

    Spark-first shape, same as the KS test it complements: raw rows
    collapse in ONE (group, cents) hash aggregate; ``cb_below`` is a
    partition-offset cumulative over the distinct-value frame
    (cumulative.ordered_cumsum — |distinct cents| can approach |rows|,
    no single-task window); one final aggregate.

    Output (one row): ``n_a, n_b, u2_a`` (exact 2·U for group_a),
    ``tie_cubes`` (exact Σ(t³−t)), ``z_stat`` (6 dp; NULL exactly when
    either group is empty or the tie-corrected variance is zero, i.e.
    every observation shares one value — note tiny-but-distinct groups
    such as n_a = n_b = 1 DO emit a z, since sig2 = 0.25 there).

    ``value_counts``: optional pre-built (group, scaled-value, count)
    frame — columns ``(group_col, v, c)`` with ``v`` already scaled
    exactly as this function would (``floor(value·scale + 0.5)``) —
    the ``token_counts=``/``base_banded=`` reuse pattern: a gate
    computing several rank statistics over the SAME fact column builds
    ONE hash-agg base pass (and materializes it) instead of each
    statistic rescanning the raw rows. When provided, ``df``/
    ``value_col``/``scale`` are ignored. The marginal sums are exact
    integers either way, so results are hash-identical to the
    self-scanning path.
    """
    from stepist_spark.operators.cumulative import ordered_cumsum

    if value_counts is not None:
        counts = value_counts.filter(
            F.col(group_col).isin([group_a, group_b])
        ).select(F.col(group_col).alias("_g"), "v", F.col("c").cast("bigint"))
    else:
        g = F.col(group_col)
        x = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("bigint")
        counts = (
            df.filter(g.isin([group_a, group_b]))
            .select(g.alias("_g"), x.alias("v"))
            .groupBy("_g", "v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
    # localCheckpoint stays right even on the value_counts path: the
    # cumsum machinery reads per_v three times (range sampling,
    # offsets, main) and re-deriving the marginal per pass measured
    # SLOWER than one tiny checkpoint (1.5s vs 1.3s at sf0.1)
    per_v = counts.groupBy("v").agg(
        F.sum(F.when(F.col("_g") == group_a, F.col("c")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("_g") == group_b, F.col("c")).otherwise(0)).alias("cb"),
    )
    st = ordered_cumsum(per_v, "v", ["cb"], tot_prefix="n_")
    return _mwu_output(st)


def _mwu_output(st: DataFrame) -> DataFrame:
    """The Mann-Whitney tail: fold a cumulated distinct-value frame
    (``ca, cb, cum_cb, n_cb``) into the one-row output. Shared by
    :func:`mann_whitney_u` and :func:`rank_stats_shared` — the frame
    may carry EXTRA rows with ca = cb = 0 (values seen only in other
    groups): every aggregate term there is exactly zero, so the
    statistics are unchanged by construction."""
    d38 = "decimal(38,0)"
    ca = F.col("ca").cast(d38)
    cb = F.col("cb").cast(d38)
    t = (F.col("ca") + F.col("cb")).cast(d38)
    below_b = F.col("cum_cb").cast(d38) - cb  # strictly-below b count
    agg = st.agg(
        F.sum(ca).cast(d38).alias("_n_a"),
        F.max(F.col("n_cb")).cast(d38).alias("_n_b"),
        F.sum(ca * (below_b * F.lit(2) + cb)).cast(d38).alias("u2_a"),
        F.sum(t * t * t - t).cast(d38).alias("tie_cubes"),
    )
    na = F.col("_n_a").cast("double")
    nb = F.col("_n_b").cast("double")
    nd = na + nb
    td = F.col("tie_cubes").cast("double")
    sig2 = na * nb / F.lit(12.0) * ((nd + F.lit(1.0)) - td / (nd * (nd - F.lit(1.0))))
    z = (F.col("u2_a").cast("double") - na * nb) / (F.lit(2.0) * F.sqrt(sig2))
    valid = (F.col("_n_a") > 0) & (F.col("_n_b") > 0) & (sig2 > 0)
    return agg.select(
        F.col("_n_a").cast("bigint").alias("n_a"),
        F.col("_n_b").cast("bigint").alias("n_b"),
        "u2_a",
        "tie_cubes",
        F.when(valid, F.round(z, 6)).alias("z_stat"),
    )


def mann_whitney_u_sql(
    table_sql: str,
    group_expr: str,
    group_a: str,
    group_b: str,
    value_expr: str,
    scale: int = 100,
) -> str:
    """DuckDB mirror of :func:`mann_whitney_u` — identical HUGEINT
    sufficient statistics and IEEE z sequence."""
    return f"""
WITH _mwr AS (
    SELECT ({group_expr}) AS _g,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS BIGINT) AS v
    FROM ({table_sql})
    WHERE ({group_expr}) IN ('{group_a}', '{group_b}')
),
_mwv AS (
    SELECT v,
           sum(CASE WHEN _g = '{group_a}' THEN 1 ELSE 0 END) AS ca,
           sum(CASE WHEN _g = '{group_b}' THEN 1 ELSE 0 END) AS cb
    FROM _mwr GROUP BY v
),
_mws AS (
    SELECT ca, cb,
           CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS HUGEINT)
               - CAST(cb AS HUGEINT) AS below_b
    FROM _mwv
),
_mwa AS (
    SELECT CAST(sum(CAST(ca AS HUGEINT)) AS HUGEINT) AS n_a,
           CAST(sum(CAST(cb AS HUGEINT)) AS HUGEINT) AS n_b,
           sum(CAST(ca AS HUGEINT) * (below_b * 2 + CAST(cb AS HUGEINT))) AS u2_a,
           sum(CAST(ca + cb AS HUGEINT) * (ca + cb) * (ca + cb)
               - CAST(ca + cb AS HUGEINT)) AS tie_cubes
    FROM _mws
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       u2_a, tie_cubes,
       CASE WHEN n_a > 0 AND n_b > 0
             AND CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                 * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                    - CAST(tie_cubes AS DOUBLE)
                      / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0))) > 0
            THEN round(
              (CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
              / (2.0 * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                 * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                    - CAST(tie_cubes AS DOUBLE)
                      / (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0))))),
              6)
       END AS z_stat
FROM _mwa
"""


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
    value_counts: DataFrame | None = None,
) -> DataFrame:
    """Kruskal-Wallis H across ALL groups of a metric — the k-group
    generalization of :func:`mann_whitney_u` (Kruskal & Wallis 1952,
    public): one rank-based omnibus "did ANY arm shift" before
    pairwise tests, with the standard tie correction.

    Exactness: each group's DOUBLED rank sum ``2·R_g = Σ_v c_g(v)·
    (2·below(v) + t(v) + 1)`` and the tie term ``Σ(t³−t)`` are exact
    decimal(38,0)/HUGEINT integers from the distinct-value frame (the
    mann_whitney_u machinery, one partition-offset cumulative). The
    cross-group ``Σ R_g²/n_g`` is inherently fractional, so it is
    folded in DOUBLES over the |groups|-bounded frame in a FIXED order
    (sorted by group, left fold — Spark ``aggregate`` HOF == DuckDB
    ``list_reduce``), making the float identical on both engines.

    Output: one row per group — ``<group_col>, n_g, r2x`` (exact
    2·R_g) — plus the shared ``n, h, h_tie`` (6 dp; h_tie NULL when
    n < 2 or every value is tied) attached via a broadcast 1-row
    cross join (the target_encode scalar pattern).

    ``value_counts``: optional pre-built ``(group_col, v, c)`` frame,
    the :func:`mann_whitney_u` reuse contract — NULL groups/values
    already excluded, ``v`` scaled as here. When provided, ``df``/
    ``value_col``/``scale`` are ignored; results are hash-identical.
    """
    from stepist_spark.operators.cumulative import ordered_cumsum

    if value_counts is not None:
        counts = value_counts.select(
            F.col(group_col).alias("_g"), "v", F.col("c").cast("bigint")
        )
    else:
        g = F.col(group_col)
        x = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("bigint")
        counts = (
            df.filter(g.isNotNull() & F.col(value_col).isNotNull())
            .select(g.alias("_g"), x.alias("v"))
            .groupBy("_g", "v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
    per_v = counts.groupBy("v").agg(F.sum("c").cast("bigint").alias("t"))
    st = ordered_cumsum(per_v, "v", ["t"]).select(
        "v", "t", (F.col("cum_t") - F.col("t")).alias("below")
    )
    return _kw_output(counts, st, group_col)


def _kw_output(counts: DataFrame, st: DataFrame, group_col: str) -> DataFrame:
    """The Kruskal-Wallis tail: join per-(group, value) ``counts``
    (``_g, v, c``) against the cumulated ALL-group distinct-value
    frame ``st`` (``v, t, below``) and fold H. Shared by
    :func:`kruskal_wallis` and :func:`rank_stats_shared`."""
    d38 = "decimal(38,0)"
    joined = counts.join(st, on="v")
    groups = joined.groupBy("_g").agg(
        F.sum("c").cast("bigint").alias("n_g"),
        F.sum(
            F.col("c").cast(d38)
            * (F.col("below").cast(d38) * 2 + F.col("t").cast(d38) + 1)
        ).cast(d38).alias("r2x"),
    )
    t38 = F.col("t").cast(d38)
    ties = st.agg(F.sum(t38 * t38 * t38 - t38).cast(d38).alias("_tie"))
    folded = groups.agg(
        F.sum("n_g").cast("bigint").alias("_n"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_g", "r2x", "n_g"))),
            F.lit(0.0),
            lambda acc, e: acc
            + (e["r2x"].cast("double") * e["r2x"].cast("double"))
            / (F.lit(4.0) * e["n_g"].cast("double")),
        ).alias("_srn"),
    ).crossJoin(ties)
    nd = F.col("_n").cast("double")
    h = F.lit(12.0) * F.col("_srn") / (nd * (nd + F.lit(1.0))) - F.lit(3.0) * (
        nd + F.lit(1.0)
    )
    cd = F.lit(1.0) - F.col("_tie").cast("double") / (nd * nd * nd - nd)
    stats = folded.select(
        F.col("_n").alias("n"),
        F.when(F.col("_n") >= 2, F.round(h, 6)).alias("h"),
        F.when((F.col("_n") >= 2) & (cd > 0), F.round(h / cd, 6)).alias("h_tie"),
    )
    return groups.select(F.col("_g").alias(group_col), "n_g", "r2x").crossJoin(
        F.broadcast(stats)
    )


def kruskal_wallis_sql(
    table_sql: str,
    group_expr: str,
    value_expr: str,
    scale: int = 100,
    group_name: str = "grp",
) -> str:
    """DuckDB mirror of :func:`kruskal_wallis` — identical HUGEINT
    rank sums and the same sorted left-fold for the float H.

    ``group_expr`` may be any SQL expression, so the group column is
    emitted under ``group_name`` (default ``grp`` for backward
    compatibility) — pass the Spark side's ``group_col`` to get the
    symmetric output schema other ``*_sql`` mirrors have by default.
    """
    return f"""
WITH _kwr AS (
    SELECT ({group_expr}) AS _g,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS BIGINT) AS v
    FROM ({table_sql})
    WHERE ({group_expr}) IS NOT NULL AND ({value_expr}) IS NOT NULL
),
_kwc AS (
    SELECT _g, v, CAST(count(*) AS BIGINT) AS c FROM _kwr GROUP BY _g, v
),
_kwt AS (
    SELECT v, CAST(sum(c) AS BIGINT) AS t FROM _kwc GROUP BY v
),
_kwb AS (
    SELECT v, t,
           CAST(sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS HUGEINT) - t
               AS below
    FROM _kwt
),
_kwg AS (
    SELECT _g, CAST(sum(c) AS BIGINT) AS n_g,
           sum(CAST(c AS HUGEINT) * (CAST(below AS HUGEINT) * 2 + t + 1)) AS r2x
    FROM _kwc JOIN _kwb USING (v) GROUP BY _g
),
_kwsum AS (
    SELECT CAST(sum(n_g) AS BIGINT) AS n,
           list_reduce(
               list_transform(
                   list(struct_pack(r2x := r2x, n_g := n_g) ORDER BY _g),
                   e -> CAST(e.r2x AS DOUBLE) * CAST(e.r2x AS DOUBLE)
                        / (4.0 * CAST(e.n_g AS DOUBLE))),
               (x, y) -> x + y) AS srn
    FROM _kwg
),
_kwtie AS (
    SELECT sum(CAST(t AS HUGEINT) * t * t - CAST(t AS HUGEINT)) AS tie FROM _kwt
),
_kwh AS (
    SELECT n,
           CASE WHEN n >= 2 THEN round(
               12.0 * srn / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
               - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) END AS h,
           CASE WHEN n >= 2
                 AND 1.0 - CAST(tie AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                        - CAST(n AS DOUBLE)) > 0
                THEN round(
                  (12.0 * srn / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                   - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                  / (1.0 - CAST(tie AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                        - CAST(n AS DOUBLE))), 6) END AS h_tie
    FROM _kwsum, _kwtie
)
SELECT _g AS {group_name}, n_g, r2x, n, h, h_tie
FROM _kwg, _kwh
"""


def one_way_anova(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
    value_counts: DataFrame | None = None,
) -> DataFrame:
    """One-way ANOVA F across ALL groups of a metric (Fisher 1925,
    public) — the PARAMETRIC omnibus companion of
    :func:`kruskal_wallis`: same "did ANY arm shift" question, answered
    on means instead of ranks, plus the ``eta²`` effect size
    (SSB/SST — how much of the variance the grouping explains).

    Exactness (the welch/kw disciplines combined): per-group ``n_g,
    s_g = Σx, q_g = Σx²`` are exact decimal(38,0)/HUGEINT integers
    from ONE grouped aggregate; the inherently fractional
    ``Σ s_g²/n_g`` folds in DOUBLES over the |groups|-bounded frame in
    a FIXED sorted order (Spark ``aggregate`` HOF == DuckDB
    ``list_reduce``), so SSB/SSW/F/eta² are one engine-identical IEEE
    sequence, 6 dp.

    Output: one row per group — ``<group_col>, n_g, s_g, q_g`` — plus
    the shared ``k, n, f_stat, eta2`` attached via a broadcast 1-row
    cross join (the kruskal_wallis scalar pattern; f/eta² NULL when
    k < 2, n ≤ k, or SSW/SST is non-positive).

    ``value_counts``: optional pre-built ``(group_col, v, c)`` frame —
    the :func:`mann_whitney_u` reuse contract (``Σx = Σ v·c``,
    ``Σx² = Σ v²·c`` are the same exact integers); hash-identical.
    """
    d38 = "decimal(38,0)"
    if value_counts is not None:
        v = F.col("v").cast("decimal(19,0)")
        c = F.col("c").cast("decimal(19,0)")
        groups = value_counts.groupBy(F.col(group_col).alias("_g")).agg(
            F.sum("c").cast("bigint").alias("n_g"),
            F.sum(v * c).cast(d38).alias("s_g"),
            F.sum(v * v * c).cast(d38).alias("q_g"),
        )
    else:
        g = F.col(group_col)
        x = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
        groups = (
            df.filter(g.isNotNull() & F.col(value_col).isNotNull())
            .groupBy(g.alias("_g"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_g"),
                F.sum(x).cast(d38).alias("s_g"),
                F.sum(x * x).cast(d38).alias("q_g"),
            )
        )
    folded = groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("_k"),
        F.sum("n_g").cast("bigint").alias("_n"),
        F.sum("s_g").cast(d38).alias("_s"),
        F.sum("q_g").cast(d38).alias("_q"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_g", "s_g", "n_g"))),
            F.lit(0.0),
            lambda acc, e: acc
            + (e["s_g"].cast("double") * e["s_g"].cast("double"))
            / e["n_g"].cast("double"),
        ).alias("_fold"),
    )
    nd = F.col("_n").cast("double")
    kd = F.col("_k").cast("double")
    grand = F.col("_s").cast("double") * F.col("_s").cast("double") / nd
    ssb = F.col("_fold") - grand
    ssw = F.col("_q").cast("double") - F.col("_fold")
    sst = F.col("_q").cast("double") - grand
    f = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    ok = (F.col("_k") >= 2) & (F.col("_n") > F.col("_k"))
    stats = folded.select(
        F.col("_k").alias("k"),
        F.col("_n").alias("n"),
        F.when(ok & (ssw > 0), F.round(f, 6)).alias("f_stat"),
        F.when(ok & (sst > 0), F.round(ssb / sst, 6)).alias("eta2"),
    )
    return groups.select(F.col("_g").alias(group_col), "n_g", "s_g", "q_g").crossJoin(
        F.broadcast(stats)
    )


def one_way_anova_sql(
    table_sql: str,
    group_expr: str,
    value_expr: str,
    scale: int = 100,
    group_name: str = "grp",
    counts_sql: str | None = None,
) -> str:
    """DuckDB mirror of :func:`one_way_anova` — identical HUGEINT
    sufficient statistics and the same sorted left-fold. The group
    column is emitted under ``group_name`` (the kruskal_wallis_sql
    convention).

    ``counts_sql``: optional mirror of the ``value_counts=`` reuse
    path — a query producing ``(_g, v, c)`` with ``v`` already scaled;
    when given, ``table_sql``/``group_expr``/``value_expr`` are
    ignored (pass empty strings)."""
    if counts_sql is not None:
        agg_stage = f"""
_aog AS (
    SELECT _g, CAST(sum(c) AS BIGINT) AS n_g,
           CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s_g,
           CAST(sum(CAST(v AS HUGEINT) * v * c) AS HUGEINT) AS q_g
    FROM ({counts_sql}) GROUP BY _g
),"""
    else:
        agg_stage = f"""
_aor AS (
    SELECT ({group_expr}) AS _g,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS HUGEINT) AS x
    FROM ({table_sql})
    WHERE ({group_expr}) IS NOT NULL AND ({value_expr}) IS NOT NULL
),
_aog AS (
    SELECT _g, CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(x) AS HUGEINT) AS s_g,
           CAST(sum(x * x) AS HUGEINT) AS q_g
    FROM _aor GROUP BY _g
),"""
    return f"""
WITH {agg_stage}
_aos AS (
    SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_g) AS BIGINT) AS n,
           CAST(sum(s_g) AS HUGEINT) AS s, CAST(sum(q_g) AS HUGEINT) AS q,
           list_reduce(
               list_transform(
                   list(struct_pack(s_g := s_g, n_g := n_g) ORDER BY _g),
                   e -> CAST(e.s_g AS DOUBLE) * CAST(e.s_g AS DOUBLE)
                        / CAST(e.n_g AS DOUBLE)),
               (x, y) -> x + y) AS fold
    FROM _aog
),
_aoh AS (
    SELECT k, n,
           CASE WHEN k >= 2 AND n > k
                 AND CAST(q AS DOUBLE) - fold > 0
                THEN round(
                  ((fold - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
                  / ((CAST(q AS DOUBLE) - fold) / (CAST(n AS DOUBLE)
                     - CAST(k AS DOUBLE))), 6) END AS f_stat,
           CASE WHEN k >= 2 AND n > k
                 AND CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE) > 0
                THEN round(
                  (fold - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE))
                  / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE)), 6) END AS eta2
    FROM _aos
)
SELECT _g AS {group_name}, n_g, s_g, q_g, k, n, f_stat, eta2
FROM _aog, _aoh
"""


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 100,
    value_counts: DataFrame | None = None,
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Brown & Forsythe
    1974, public — the median-centered Levene): one-way ANOVA on the
    absolute deviations from each group's MEDIAN, the robust "are the
    arms' SPREADS equal" check that should precede any pooled-variance
    readout (heavy tails wreck the mean-centered original; the median
    variant stays calibrated).

    COMPOSED from two certified pieces: the per-group discrete lower
    median comes from a cumulative over the (group, value) counts
    frame (the grouped_median_mad rank rule, ``(n+1) DIV 2``), the
    deviations collapse to a derived |v − med| counts frame — exact
    integers — and :func:`one_way_anova` runs on that frame through
    its ``value_counts=`` path. Raw rows are touched by ONE count
    aggregate; everything after works on the bounded counts frame.

    Output: the :func:`one_way_anova` schema over the deviations —
    ``<group_col>, n_g, s_g, q_g, k, n, f_stat, eta2`` (s_g/q_g are
    exact Σ|z| and Σz² in scaled units).

    ``value_counts``: optional pre-built ``(group_col, v, c)`` frame
    (the reuse contract, ``v`` pre-scaled); hash-identical.
    """
    from pyspark.sql import Window

    from stepist_spark.operators.cumulative import grouped_frame

    if value_counts is not None:
        counts = value_counts.select(
            F.col(group_col).alias("_g"), "v", F.col("c").cast("bigint").alias("c")
        )
    else:
        g = F.col(group_col)
        x = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("bigint")
        counts = (
            df.filter(g.isNotNull() & F.col(value_col).isNotNull())
            .select(g.alias("_g"), x.alias("v"))
            .groupBy("_g", "v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            # consumed twice (median pass + deviation join): materialize
            .localCheckpoint(eager=False)
        )
    w_ord = grouped_frame(["_g"], F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = grouped_frame(["_g"])
    st = counts.select(
        "_g", "v",
        F.sum("c").over(w_ord).alias("_cum"),
        F.sum("c").over(w_all).alias("_n"),
    )
    med = (
        st.filter(F.col("_cum") >= F.expr("(_n + 1) DIV 2"))
        .groupBy("_g")
        .agg(F.min("v").alias("_med"))
    )
    z_counts = (
        counts.join(med, "_g")
        .groupBy("_g", F.abs(F.col("v") - F.col("_med")).alias("v"))
        .agg(F.sum("c").cast("bigint").alias("c"))
        .select(F.col("_g").alias(group_col), "v", "c")
    )
    return one_way_anova(df, group_col, value_col, value_counts=z_counts)


def brown_forsythe_sql(
    table_sql: str,
    group_expr: str,
    value_expr: str,
    scale: int = 100,
    group_name: str = "grp",
) -> str:
    """DuckDB mirror of :func:`brown_forsythe` — the identical median
    rule and deviation counts feeding one_way_anova_sql's counts
    path."""
    counts_sql = f"""
WITH _bfc AS (
    SELECT ({group_expr}) AS _g,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS c
    FROM ({table_sql})
    WHERE ({group_expr}) IS NOT NULL AND ({value_expr}) IS NOT NULL
    GROUP BY 1, 2
),
_bfs AS (
    SELECT _g, v, c,
           sum(c) OVER (PARTITION BY _g ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c) OVER (PARTITION BY _g) AS n
    FROM _bfc
),
_bfm AS (SELECT _g, min(v) AS med FROM _bfs WHERE cum >= (n + 1) // 2 GROUP BY _g)
SELECT cc._g AS _g, abs(cc.v - mm.med) AS v, CAST(sum(cc.c) AS BIGINT) AS c
FROM _bfc cc JOIN _bfm mm USING (_g)
GROUP BY cc._g, abs(cc.v - mm.med)
"""
    return one_way_anova_sql(
        "", "", "", group_name=group_name, counts_sql=counts_sql
    )


def rank_stats_shared(
    base_counts: DataFrame,
    mwu_group_col: str,
    group_a: str,
    group_b: str,
    kw_group_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Mann-Whitney U AND Kruskal-Wallis H over the SAME fact column
    from ONE shared cumulative — the rank-statistics-family fusion
    (round-10 verdict #2): both tests need a running total over the
    ordered distinct-value domain, so computing them separately pays
    the range exchange (plus its sampling pass and materialization)
    twice for the same ordering.

    ``base_counts``: the gate's base pass — ``(mwu_group_col,
    kw_group_col, v, c)`` with ``v`` pre-scaled (``floor(value·scale +
    0.5)``), typically one hash aggregate over the facts, materialized
    by the caller. ONE ``ordered_cumsum`` over the merged domain then
    carries BOTH running sums (``cb`` for the U statistic's
    below-counts, ``t`` for the H statistic's rank offsets) as two sum
    columns of the same pass.

    Hash-identical to the standalone operators by construction:
    MWU's aggregates are unchanged by domain rows where ca = cb = 0
    (every term is exactly zero — see :func:`_mwu_output`), and KW
    consumes the same all-group totals it builds itself.

    Returns ``(mwu_df, kw_df)`` with the standalone operators' exact
    output schemas (kw's group column named ``kw_group_col``).
    """
    from stepist_spark.operators.cumulative import ordered_cumsum

    ga = F.col(mwu_group_col)
    per_v = base_counts.groupBy("v").agg(
        F.sum(F.when(ga == group_a, F.col("c")).otherwise(0)).alias("ca"),
        F.sum(F.when(ga == group_b, F.col("c")).otherwise(0)).alias("cb"),
        F.sum("c").cast("bigint").alias("t"),
    )
    st = ordered_cumsum(per_v, "v", ["cb", "t"], tot_prefix="n_")
    mwu_df = _mwu_output(st)
    kw_counts = base_counts.groupBy(
        F.col(kw_group_col).alias("_g"), "v"
    ).agg(F.sum("c").cast("bigint").alias("c"))
    st_kw = st.select("v", "t", (F.col("cum_t") - F.col("t")).alias("below"))
    kw_df = _kw_output(kw_counts, st_kw, kw_group_col)
    return mwu_df, kw_df


def diff_in_diff(
    df: DataFrame,
    treat_cond: Column,
    post_cond: Column,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Difference-in-differences — the 2×2 natural-experiment readout
    (Card & Krueger AER'94 canonical form, public): the treatment
    effect is the treated group's pre→post change MINUS the control
    group's, removing any shared time trend a naive pre/post compare
    absorbs. SE from the four cell variances (the Welch discipline —
    no pooling assumption).

    One conditional sufficient-statistics aggregate over the facts
    (n/Σx/Σx² per cell, exact scaled decimal(38,0) integers); the
    estimate, its SE, and t are one fixed IEEE sequence — the
    cuped/welch shape, so one scan at any scale.

    Output (one row): per-cell ``n_t1, n_t0, n_c1, n_c0`` and exact
    ``s_t1, s_t0, s_c1, s_c0`` sums, plus ``did`` (original units,
    6 dp) and ``t_stat`` (NULL when any cell has n < 2).
    """
    x = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
    cells = {
        "t1": treat_cond & post_cond,
        "t0": treat_cond & ~post_cond,
        "c1": ~treat_cond & post_cond,
        "c0": ~treat_cond & ~post_cond,
    }
    aggs = []
    for tag, cond in cells.items():
        aggs.append(F.count(F.when(cond, F.lit(1))).cast("bigint").alias(f"n_{tag}"))
        aggs.append(F.sum(F.when(cond, x)).cast("decimal(38,0)").alias(f"s_{tag}"))
        aggs.append(
            F.sum(F.when(cond, x * x)).cast("decimal(38,0)").alias(f"q_{tag}")
        )
    stats = df.agg(*aggs)

    def _m(tag):
        return F.col(f"s_{tag}").cast("double") / F.col(f"n_{tag}").cast("double")

    def _v(tag):  # sample variance via the exact-integer numerator
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        q = F.col(f"q_{tag}").cast("double")
        return (n * q - s * s) / (n * (n - F.lit(1.0)))

    did = (_m("t1") - _m("t0")) - (_m("c1") - _m("c0"))
    se = F.sqrt(
        _v("t1") / F.col("n_t1").cast("double")
        + _v("t0") / F.col("n_t0").cast("double")
        + _v("c1") / F.col("n_c1").cast("double")
        + _v("c0") / F.col("n_c0").cast("double")
    )
    valid = (
        (F.col("n_t1") >= 2)
        & (F.col("n_t0") >= 2)
        & (F.col("n_c1") >= 2)
        & (F.col("n_c0") >= 2)
    )
    return stats.select(
        "n_t1", "n_t0", "n_c1", "n_c0",
        "s_t1", "s_t0", "s_c1", "s_c0",
        F.when(valid, F.round(did / F.lit(float(scale)), 6)).alias("did"),
        F.when(valid & (se > 0), F.round(did / se, 6)).alias("t_stat"),
    )


def diff_in_diff_sql(
    table_sql: str,
    treat_expr: str,
    post_expr: str,
    value_expr: str,
    scale: int = 100,
) -> str:
    """DuckDB mirror of :func:`diff_in_diff` — identical HUGEINT cell
    sums and IEEE sequence."""
    cells = {
        "t1": f"({treat_expr}) AND ({post_expr})",
        "t0": f"({treat_expr}) AND NOT ({post_expr})",
        "c1": f"NOT ({treat_expr}) AND ({post_expr})",
        "c0": f"NOT ({treat_expr}) AND NOT ({post_expr})",
    }
    sums = []
    for tag, cond in cells.items():
        sums.append(f"CAST(count(CASE WHEN {cond} THEN 1 END) AS BIGINT) AS n_{tag}")
        sums.append(f"sum(CASE WHEN {cond} THEN CAST(_x AS HUGEINT) END) AS s_{tag}")
        sums.append(
            f"sum(CASE WHEN {cond} THEN CAST(_x AS HUGEINT) * _x END) AS q_{tag}"
        )
    m = {
        t: f"(CAST(s_{t} AS DOUBLE) / CAST(n_{t} AS DOUBLE))" for t in cells
    }
    v = {
        t: (
            f"((CAST(n_{t} AS DOUBLE) * CAST(q_{t} AS DOUBLE)"
            f" - CAST(s_{t} AS DOUBLE) * CAST(s_{t} AS DOUBLE))"
            f" / (CAST(n_{t} AS DOUBLE) * (CAST(n_{t} AS DOUBLE) - 1.0)))"
        )
        for t in cells
    }
    did = f"(({m['t1']} - {m['t0']}) - ({m['c1']} - {m['c0']}))"
    se = (
        f"sqrt({v['t1']} / CAST(n_t1 AS DOUBLE) + {v['t0']} / CAST(n_t0 AS DOUBLE)"
        f" + {v['c1']} / CAST(n_c1 AS DOUBLE) + {v['c0']} / CAST(n_c0 AS DOUBLE))"
    )
    valid = "n_t1 >= 2 AND n_t0 >= 2 AND n_c1 >= 2 AND n_c0 >= 2"
    return f"""
WITH _dd_r AS (
    SELECT *, CAST(floor(({value_expr}) * {scale} + 0.5) AS BIGINT) AS _x
    FROM ({table_sql})
),
_dd_s AS (
    SELECT {", ".join(sums)} FROM _dd_r
)
SELECT n_t1, n_t0, n_c1, n_c0, s_t1, s_t0, s_c1, s_c0,
       CASE WHEN {valid} THEN round({did} / {float(scale)}, 6) END AS did,
       CASE WHEN {valid} AND {se} > 0 THEN round({did} / {se}, 6) END AS t_stat
FROM _dd_s
"""


def welch_ttest_sliced(
    df: DataFrame,
    slice_cols: list[str],
    group_col: str,
    group_a: str,
    group_b: str,
    value_col: str,
    scale: int = 100,
    value_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-slice Welch t — :func:`welch_ttest` grouped by segment
    columns, the "run the experiment readout on every slice" shape
    that makes multiple-testing control (:func:`bh_discoveries`)
    necessary in the first place. ONE conditional aggregate grouped by
    the slices; per-slice exact decimal(38,0) sums; the same fixed
    IEEE t sequence as the global test.

    Output: ``*slice_cols, n_a, n_b, sum_a, sum_b, sumsq_a, sumsq_b,
    t_stat`` (t NULL when either arm of the slice has n < 2 or zero
    pooled variance).

    ``value_counts``: optional pre-built ``(*slice_cols, group_col, v,
    c)`` frame (the :func:`mann_whitney_u` reuse contract, ``v``
    scaled as here) — the sufficient statistics become exact-integer
    weighted sums of the counts (``Σx = Σ v·c``, ``Σx² = Σ v²·c``),
    identical values, so the t hashes unchanged."""
    from stepist_spark.operators.cumulative import require_groups

    scols = require_groups(slice_cols, "welch_ttest_sliced", "use welch_ttest")
    g = F.col(group_col)
    if value_counts is not None:
        in_a = g == group_a
        in_b = g == group_b
        c = F.col("c").cast("decimal(19,0)")
        v = F.col("v").cast("decimal(19,0)")
        stats = value_counts.filter(in_a | in_b).groupBy(*scols).agg(
            F.sum(F.when(in_a, F.col("c"))).cast("bigint").alias("n_a"),
            F.sum(F.when(in_b, F.col("c"))).cast("bigint").alias("n_b"),
            F.sum(F.when(in_a, v * c)).cast("decimal(38,0)").alias("sum_a"),
            F.sum(F.when(in_b, v * c)).cast("decimal(38,0)").alias("sum_b"),
            F.sum(F.when(in_a, v * v * c)).cast("decimal(38,0)").alias("sumsq_a"),
            F.sum(F.when(in_b, v * v * c)).cast("decimal(38,0)").alias("sumsq_b"),
        )
        # empty arms surface as NULL counts under the sum-of-counts
        # path (COUNT CASE gives 0) — normalize so the t guard and the
        # output ints match the raw path exactly
        stats = stats.select(
            *scols,
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            "sum_a", "sum_b", "sumsq_a", "sumsq_b",
        )
    else:
        x = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("decimal(19,0)")
        in_a = g == group_a
        in_b = g == group_b
        stats = df.filter(in_a | in_b).groupBy(*scols).agg(
            F.count(F.when(in_a, F.lit(1))).cast("bigint").alias("n_a"),
            F.count(F.when(in_b, F.lit(1))).cast("bigint").alias("n_b"),
            F.sum(F.when(in_a, x)).cast("decimal(38,0)").alias("sum_a"),
            F.sum(F.when(in_b, x)).cast("decimal(38,0)").alias("sum_b"),
            F.sum(F.when(in_a, x * x)).cast("decimal(38,0)").alias("sumsq_a"),
            F.sum(F.when(in_b, x * x)).cast("decimal(38,0)").alias("sumsq_b"),
        )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    sa = F.col("sum_a").cast("double")
    sb = F.col("sum_b").cast("double")
    qa = F.col("sumsq_a").cast("double")
    qb = F.col("sumsq_b").cast("double")
    va = (na * qa - sa * sa) / (na * (na - F.lit(1.0)))
    vb = (nb * qb - sb * sb) / (nb * (nb - F.lit(1.0)))
    se2 = va / na + vb / nb
    t = (sa / na - sb / nb) / F.sqrt(se2)
    valid = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return stats.select(
        *scols,
        "n_a", "n_b", "sum_a", "sum_b", "sumsq_a", "sumsq_b",
        F.when(valid, F.round(t, 6)).alias("t_stat"),
    )


def welch_ttest_sliced_sql(
    table_sql: str,
    slice_exprs: list[str],
    group_expr: str,
    group_a: str,
    group_b: str,
    value_expr: str,
    scale: int = 100,
) -> str:
    """DuckDB mirror of :func:`welch_ttest_sliced`."""
    s = ", ".join(slice_exprs)
    return f"""
WITH _ws_r AS (
    SELECT {s}, ({group_expr}) AS _g,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS BIGINT) AS _x
    FROM ({table_sql})
    WHERE ({group_expr}) IN ('{group_a}', '{group_b}')
),
_ws_s AS (
    SELECT {s},
        CAST(count(CASE WHEN _g = '{group_a}' THEN 1 END) AS BIGINT) AS n_a,
        CAST(count(CASE WHEN _g = '{group_b}' THEN 1 END) AS BIGINT) AS n_b,
        sum(CASE WHEN _g = '{group_a}' THEN CAST(_x AS HUGEINT) END) AS sum_a,
        sum(CASE WHEN _g = '{group_b}' THEN CAST(_x AS HUGEINT) END) AS sum_b,
        sum(CASE WHEN _g = '{group_a}' THEN CAST(_x AS HUGEINT) * _x END) AS sumsq_a,
        sum(CASE WHEN _g = '{group_b}' THEN CAST(_x AS HUGEINT) * _x END) AS sumsq_b
    FROM _ws_r GROUP BY {s}
)
SELECT {s}, n_a, n_b, sum_a, sum_b, sumsq_a, sumsq_b,
       CASE WHEN n_a >= 2 AND n_b >= 2
             AND ((CAST(n_a AS DOUBLE) * CAST(sumsq_a AS DOUBLE)
                   - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE))
                  / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
                 / CAST(n_a AS DOUBLE)
                 + ((CAST(n_b AS DOUBLE) * CAST(sumsq_b AS DOUBLE)
                     - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE))
                    / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
                 / CAST(n_b AS DOUBLE) > 0
            THEN round((CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                        - CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                       / sqrt(((CAST(n_a AS DOUBLE) * CAST(sumsq_a AS DOUBLE)
                                - CAST(sum_a AS DOUBLE) * CAST(sum_a AS DOUBLE))
                               / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
                              / CAST(n_a AS DOUBLE)
                              + ((CAST(n_b AS DOUBLE) * CAST(sumsq_b AS DOUBLE)
                                  - CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE))
                                 / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
                              / CAST(n_b AS DOUBLE)), 6)
       END AS t_stat
FROM _ws_s
"""


# Abramowitz & Stegun 7.1.26 rational erf approximation (public,
# |error| <= 1.5e-7): elementary ops + exp only, so both engines
# evaluate the IDENTICAL expression tree — the repo-standard way to
# get a normal CDF without scipy on either side.
_AS_ERF = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _p_two_sided(t: Column) -> Column:
    """Two-sided normal-approximation p-value of a test statistic:
    ``p = 1 − erf(|t|/√2)`` via A&S 7.1.26 (documented ≤1.5e-7 error —
    the normal reference is itself the large-n approximation of the
    t distribution, standard for experiment readouts at event-log n)."""
    x = F.abs(t) / F.lit(1.4142135623730951)
    u = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    a1, a2, a3, a4, a5 = _AS_ERF
    poly = (
        F.lit(a1) * u
        + F.lit(a2) * u * u
        + F.lit(a3) * u * u * u
        + F.lit(a4) * u * u * u * u
        + F.lit(a5) * u * u * u * u * u
    )
    return poly * F.exp(-(x * x))


def _p_two_sided_sql(t: str) -> str:
    a1, a2, a3, a4, a5 = _AS_ERF
    x = f"(abs({t}) / 1.4142135623730951)"
    u = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    poly = (
        f"({a1} * {u} + {a2} * {u} * {u} + {a3} * {u} * {u} * {u}"
        f" + {a4} * {u} * {u} * {u} * {u}"
        f" + {a5} * {u} * {u} * {u} * {u} * {u})"
    )
    return f"({poly} * exp(-({x} * {x})))"


def bh_discoveries(
    stats: DataFrame,
    key_cols: list[str],
    stat_col: str = "t_stat",
    fdr_q: float = 0.10,
    scale: int = 10**6,
) -> DataFrame:
    """Benjamini-Hochberg FDR control over a family of test statistics
    (Benjamini & Hochberg, JRSS-B 1995, public) — the multiple-testing
    step every "test the metric on all N slices" readout needs: rank
    the two-sided p-values ascending, find the largest i with
    ``p_(i) ≤ q·i/m``, reject hypotheses 1..i.

    Input contract: a PER-HYPOTHESIS stats frame (one row per slice —
    |slices|-bounded by construction, e.g. :func:`welch_ttest_sliced`
    output), so the rank window is a :func:`whole_frame` over a
    provably small frame. NULL statistics (untestable slices) are
    EXCLUDED from the family — they neither spend nor receive FDR
    budget. p is the normal-approximation two-sided p via the A&S
    erf polynomial (≤1.5e-7, identical expression both engines).

    Output: ``*key_cols, <stat_col>, p_scaled`` (floor(p·scale)),
    ``p_rank, m, rejected``.
    """
    from stepist_spark.operators.cumulative import whole_frame

    tested = stats.filter(F.col(stat_col).isNotNull())
    p = _p_two_sided(F.col(stat_col))
    base = tested.select(
        *key_cols, stat_col, p.alias("_p")
    )
    w = whole_frame(F.col("_p").asc(), *[F.col(c).asc() for c in key_cols])
    ranked = base.select(
        *key_cols,
        stat_col,
        "_p",
        F.row_number().over(w).alias("p_rank"),
        F.count(F.lit(1)).over(whole_frame()).alias("m"),
    )
    passes = F.col("_p") * F.col("m").cast("double") <= F.lit(fdr_q) * F.col(
        "p_rank"
    ).cast("double")
    flagged = ranked.select(
        *key_cols, stat_col, "_p", "p_rank", "m", passes.alias("_pass")
    )
    kstar = F.max(F.when(F.col("_pass"), F.col("p_rank"))).over(whole_frame())
    return flagged.select(
        *key_cols,
        stat_col,
        F.floor(F.col("_p") * F.lit(scale)).cast("bigint").alias("p_scaled"),
        F.col("p_rank").cast("bigint").alias("p_rank"),
        F.col("m").cast("bigint").alias("m"),
        (F.col("p_rank") <= F.coalesce(kstar, F.lit(0))).alias("rejected"),
    )


def bh_discoveries_sql(
    stats_sql: str,
    key_exprs: list[str],
    stat_col: str = "t_stat",
    fdr_q: float = 0.10,
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`bh_discoveries`."""
    keys = ", ".join(key_exprs)
    p = _p_two_sided_sql(stat_col)
    return f"""
WITH _bh_t AS (
    SELECT {keys}, {stat_col}, {p} AS _p
    FROM ({stats_sql}) WHERE {stat_col} IS NOT NULL
),
_bh_r AS (
    SELECT *, row_number() OVER (ORDER BY _p ASC, {keys}) AS p_rank,
           count(*) OVER () AS m
    FROM _bh_t
),
_bh_f AS (
    SELECT *, (_p * CAST(m AS DOUBLE) <= {fdr_q} * CAST(p_rank AS DOUBLE)) AS _pass
    FROM _bh_r
)
SELECT {keys}, {stat_col},
       CAST(floor(_p * {scale}) AS BIGINT) AS p_scaled,
       CAST(p_rank AS BIGINT) AS p_rank, CAST(m AS BIGINT) AS m,
       p_rank <= coalesce(max(CASE WHEN _pass THEN p_rank END) OVER (), 0) AS rejected
FROM _bh_f
"""
