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


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    scale: int = 10**6,
) -> DataFrame:
    """Pearson correlation for every column pair in ONE aggregation
    pass — the feature-selection / profiling primitive (which numeric
    columns move together).

    Spark-first shape: the whole table collapses to a single row of
    sufficient statistics (n, per-column Σx and Σx², per-pair Σxy) in
    one map-side-combined aggregate — k(k+3)/2 + 1 sums, no sort, no
    per-pair rescans; the pair rows are then an explode of a literal
    array over that ONE row. At 100 TB the cost is one scan.

    Portability contract (the grouped_ols discipline): inputs scale to
    integers half-up, sums accumulate EXACTLY in decimal(38,0)
    (DuckDB: HUGEINT), and the final ``r = (nΣxy − ΣxΣy) /
    sqrt((nΣxx − Σx²)(nΣyy − Σy²))`` is a fixed sequence of
    individually-rounded IEEE ops (sqrt is correctly rounded) over
    identical exact integers — bit-equal across engines, then 6-dp.

    Output: one row per unordered pair ``(col_a, col_b, n, corr)``
    with col_a < col_b in ``cols`` order; corr NULL when either side
    has zero variance or n < 2.
    """
    cols = list(cols)
    scaled = {
        c: F.floor(F.col(c) * scale + F.lit(0.5)).cast("decimal(19,0)") for c in cols
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(scaled[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(scaled[c] * scaled[c]).alias(f"_q_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.sum(scaled[a] * scaled[b]).alias(f"_x_{a}_{b}"))
    stats = df.agg(*aggs)

    nd = F.col("n").cast("double")
    pair_structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sa = F.col(f"_s_{a}").cast("double")
            sb = F.col(f"_s_{b}").cast("double")
            qa = F.col(f"_q_{a}").cast("double")
            qb = F.col(f"_q_{b}").cast("double")
            xab = F.col(f"_x_{a}_{b}").cast("double")
            cov_n = nd * xab - sa * sb
            va_n = nd * qa - sa * sa
            vb_n = nd * qb - sb * sb
            corr = F.when(
                (F.col("n") >= 2) & (va_n > 0) & (vb_n > 0),
                F.round(cov_n / F.sqrt(va_n * vb_n), 6),
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    corr.alias("corr"),
                )
            )
    return stats.select(
        F.col("n"), F.explode(F.array(*pair_structs)).alias("_p")
    ).select("_p.col_a", "_p.col_b", "n", "_p.corr")


def corr_matrix_sql(
    table_sql: str,
    cols: Sequence[str],
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`corr_matrix` — same scaled-integer
    sums (HUGEINT == decimal(38,0) exactness), same IEEE expression
    sequence per pair, so every corr hash-matches."""
    cols = list(cols)
    sums = ["count(*) AS n"]
    for c in cols:
        sums.append(f"sum(_i_{c}) AS s_{c}")
        sums.append(f"sum(_i_{c}::HUGEINT * _i_{c}) AS q_{c}")
    scaled = ", ".join(
        f"CAST(floor(({c}) * {scale} + 0.5) AS BIGINT) AS _i_{c}" for c in cols
    )
    pair_rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            sums.append(f"sum(_i_{a}::HUGEINT * _i_{b}) AS x_{a}_{b}")
            pair_rows.append(
                f"""SELECT '{a}' AS col_a, '{b}' AS col_b, n,
       CASE WHEN n >= 2
             AND CAST(n AS DOUBLE)*CAST(q_{a} AS DOUBLE)
                 - CAST(s_{a} AS DOUBLE)*CAST(s_{a} AS DOUBLE) > 0
             AND CAST(n AS DOUBLE)*CAST(q_{b} AS DOUBLE)
                 - CAST(s_{b} AS DOUBLE)*CAST(s_{b} AS DOUBLE) > 0
            THEN round(
              (CAST(n AS DOUBLE)*CAST(x_{a}_{b} AS DOUBLE)
               - CAST(s_{a} AS DOUBLE)*CAST(s_{b} AS DOUBLE))
              / sqrt((CAST(n AS DOUBLE)*CAST(q_{a} AS DOUBLE)
                      - CAST(s_{a} AS DOUBLE)*CAST(s_{a} AS DOUBLE))
                   * (CAST(n AS DOUBLE)*CAST(q_{b} AS DOUBLE)
                      - CAST(s_{b} AS DOUBLE)*CAST(s_{b} AS DOUBLE))), 6)
       END AS corr FROM corr_s"""
            )
    union = "\nUNION ALL\n".join(pair_rows)
    return f"""
WITH corr_t AS (SELECT {scaled} FROM ({table_sql})),
corr_s AS (SELECT {', '.join(sums)} FROM corr_t)
{union}
"""


def chi_square_contingency(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Pearson chi-square contingency cells for two categorical
    columns — the independence test every segmentation / feature-
    selection pass runs (Pearson 1900, public).

    Spark-first shape: ONE count aggregate collapses the data to its
    |A|x|B| contingency cells; row totals, column totals and the grand
    total are whole-frame windows over that TINY cell frame (never
    over the raw rows), so at 100 TB the cost is the one count shuffle.

    Engine-portable exactness: observed/row/col/grand totals are exact
    bigints; ``expected = row_n * col_n / n`` is ONE double division
    of exact integer products, and the cell contribution
    ``(o - e)^2 / e`` is a fixed sequence of individually-rounded IEEE
    ops on identical inputs — bit-equal on any engine — then rounded
    to 6 dp. The chi2 statistic is the sum of the per-cell rounded
    contributions; the gate hash-compares the cell frame itself.

    Output: one row per cell ``(a, b, observed, row_n, col_n, n,
    expected, contrib)`` plus the summary via ``.groupBy().agg`` by
    the caller, or use the returned ``contrib`` decimal sum.
    """
    from pyspark.sql import Window

    cells = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    from stepist_spark.operators.cumulative import whole_frame

    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    # |a×b| categorical cells — bounded frame, explicit single-task
    wall = whole_frame()
    with_tot = cells.select(
        "a",
        "b",
        "observed",
        F.sum("observed").over(wa).cast("bigint").alias("row_n"),
        F.sum("observed").over(wb).cast("bigint").alias("col_n"),
        F.sum("observed").over(wall).cast("bigint").alias("n"),
    )
    e = (F.col("row_n") * F.col("col_n")).cast("double") / F.col("n").cast("double")
    contrib = (F.col("observed").cast("double") - e) * (
        F.col("observed").cast("double") - e
    ) / e
    return with_tot.select(
        "a",
        "b",
        "observed",
        "row_n",
        "col_n",
        "n",
        F.round(e, 6).alias("expected"),
        F.round(contrib, 6).alias("contrib"),
    )


def chi_square_contingency_sql(table: str, a_expr: str, b_expr: str) -> str:
    """DuckDB mirror of :func:`chi_square_contingency` — identical
    expression sequence so every cell hash-matches."""
    return f"""
WITH cells AS (
    SELECT {a_expr} AS a, {b_expr} AS b, CAST(count(*) AS BIGINT) AS observed
    FROM {table} GROUP BY 1, 2
),
tot AS (
    SELECT a, b, observed,
           CAST(sum(observed) OVER (PARTITION BY a) AS BIGINT) AS row_n,
           CAST(sum(observed) OVER (PARTITION BY b) AS BIGINT) AS col_n,
           CAST(sum(observed) OVER () AS BIGINT) AS n
    FROM cells
)
SELECT a, b, observed, row_n, col_n, n,
       round(CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE), 6) AS expected,
       round(
           (CAST(observed AS DOUBLE) - CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(observed AS DOUBLE) - CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(row_n * col_n AS DOUBLE) / CAST(n AS DOUBLE)), 6)
           AS contrib
FROM tot
"""


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    value_counts: DataFrame | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two groups — the standard distribution-drift test
    (Kolmogorov 1933 / Smirnov 1939, public) behind "did this metric's
    shape change".

    Exactness by cross-multiplying: with cents integers, ``D =
    max_v |F_a(v) − F_b(v)|`` is located on ``|cum_a·n_b − cum_b·n_a|``
    — an exact decimal(38,0)/HUGEINT integer, so the argmax (earliest
    value on ties) and the statistic's numerator are hash-exact; the
    final ``ks = D_scaled / (n_a·n_b)`` is ONE double division, 6 dp.

    Spark-first shape: raw rows collapse in ONE (group, cents) count
    aggregate; CDFs are partition-offset cumulative sums over the
    merged distinct-value frame (operators/cumulative.ordered_cumsum —
    |distinct cents| can approach |rows| for a wide-domain metric, so
    no single-task window), and the argmax row is picked with ONE
    ``max_by`` hash aggregate instead of a global-rank window. Output
    one row: ``n_a, n_b, v_at_max_cents, d_scaled, ks``.

    ``value_counts``: optional pre-built ``(group_col, v, c)`` frame
    (cents-scaled) — the rank-statistics-family reuse contract;
    hash-identical results.
    """
    from stepist_spark.operators.cumulative import ordered_cumsum

    if value_counts is not None:
        counts = value_counts.filter(
            F.col(group_col).isin([group_a, group_b])
        ).select(
            F.col(group_col).alias("_g"), "v",
            F.col("c").cast("bigint").alias("c"),
        )
    else:
        cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
        counts = (
            df.filter(F.col(group_col).isin([group_a, group_b]))
            .select(F.col(group_col).alias("_g"), cents.alias("v"))
            .groupBy("_g", "v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
    ca = F.sum(F.when(F.col("_g") == group_a, F.col("c")).otherwise(0))
    cb = F.sum(F.when(F.col("_g") == group_b, F.col("c")).otherwise(0))
    per_v = counts.groupBy("v").agg(ca.alias("ca"), cb.alias("cb"))
    st = ordered_cumsum(per_v, "v", ["ca", "cb"], tot_prefix="n_").select(
        "v",
        F.col("cum_ca").cast("decimal(38,0)").alias("cum_a"),
        F.col("cum_cb").cast("decimal(38,0)").alias("cum_b"),
        F.col("n_ca").cast("decimal(38,0)").alias("n_a"),
        F.col("n_cb").cast("decimal(38,0)").alias("n_b"),
    )
    d = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    # argmax (earliest v on ties) as one hash aggregate: v is distinct,
    # so the (d, -v) ordering struct has no ties and max_by is exact
    best = st.withColumn("_d", d).agg(
        F.max_by(
            F.struct("n_a", "n_b", "v", "_d"),
            F.struct(F.col("_d"), (-F.col("v")).alias("_nv")),
        ).alias("_best")
    )
    # empty input: the agg yields one all-NULL row where the old
    # window pick yielded none — keep the zero-row contract
    best = best.filter(F.col("_best").isNotNull())
    return best.select(
        F.col("_best.n_a").cast("bigint").alias("n_a"),
        F.col("_best.n_b").cast("bigint").alias("n_b"),
        F.col("_best.v").alias("v_at_max_cents"),
        F.col("_best._d").cast("decimal(38,0)").alias("d_scaled"),
        F.round(
            F.col("_best._d").cast("double")
            / (
                F.col("_best.n_a").cast("double")
                * F.col("_best.n_b").cast("double")
            ),
            6,
        ).alias("ks"),
    )


def ks_two_sample_sql(
    table_sql: str,
    group_expr: str,
    value_expr: str,
    group_a: str,
    group_b: str,
) -> str:
    """DuckDB mirror of :func:`ks_two_sample`."""
    return f"""
WITH ks_c AS (
    SELECT {group_expr} AS g, CAST(floor(({value_expr}) * 100 + 0.5) AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS c
    FROM ({table_sql})
    WHERE {group_expr} IN ('{group_a}', '{group_b}')
    GROUP BY 1, 2
),
ks_v AS (
    SELECT v,
           sum(CASE WHEN g = '{group_a}' THEN c ELSE 0 END) AS ca,
           sum(CASE WHEN g = '{group_b}' THEN c ELSE 0 END) AS cb
    FROM ks_c GROUP BY v
),
ks_s AS (
    SELECT v,
           CAST(sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum_a,
           CAST(sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cum_b,
           CAST(sum(ca) OVER () AS HUGEINT) AS n_a,
           CAST(sum(cb) OVER () AS HUGEINT) AS n_b
    FROM ks_v
),
ks_d AS (
    SELECT *, abs(cum_a * n_b - cum_b * n_a) AS d,
           row_number() OVER (ORDER BY abs(cum_a * n_b - cum_b * n_a) DESC, v ASC) AS rn
    FROM ks_s
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       v AS v_at_max_cents, d AS d_scaled,
       round(CAST(d AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS ks
FROM ks_d WHERE rn = 1
"""


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: int = 10,
) -> DataFrame:
    """Smoothed target (mean) encoding per category — the standard
    high-cardinality categorical feature for tabular models (Micci-
    Barreca SIGKDD'01, public): ``enc = (sum_t + m·prior) / (n + m)``
    with the global mean as prior.

    Exactness: targets go to integer cents; the smoothed ratio is
    evaluated as ``(sum_t·N + m·T) / ((n + m)·N)`` — exact decimal
    products, ONE double division, 6 dp — so no float prior ever
    propagates. Spark-first: one per-category aggregate; the 1-row
    global total broadcasts. Output: ``category, n, sum_cents, enc``
    (enc in currency units).
    """
    cents = F.floor(F.col(target_col) * 100 + F.lit(0.5)).cast("bigint")
    per_cat = df.select(F.col(cat_col).alias("category"), cents.alias("_t")).groupBy(
        "category"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_t").cast("bigint").alias("sum_cents"),
    )
    tot = per_cat.agg(
        F.sum("n").cast("bigint").alias("_N"), F.sum("sum_cents").cast("bigint").alias("_T")
    )
    dec = "decimal(38,0)"
    joined = per_cat.crossJoin(F.broadcast(tot))
    num = F.col("sum_cents").cast(dec) * F.col("_N").cast(dec) + F.lit(m) * F.col(
        "_T"
    ).cast(dec)
    den = (F.col("n") + F.lit(m)).cast(dec) * F.col("_N").cast(dec)
    return joined.select(
        "category",
        "n",
        "sum_cents",
        F.round(num.cast("double") / den.cast("double") / F.lit(100.0), 6).alias(
            "enc"
        ),
    )


def target_encode_sql(
    table_sql: str,
    cat_expr: str,
    target_expr: str,
    m: int = 10,
) -> str:
    """DuckDB mirror of :func:`target_encode`."""
    return f"""
WITH te_c AS (
    SELECT {cat_expr} AS category, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(({target_expr}) * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM ({table_sql}) GROUP BY 1
),
te_t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sum_cents) AS BIGINT) AS tt
         FROM te_c)
SELECT category, n, sum_cents,
       round(CAST(sum_cents::HUGEINT * nn + {m} * tt::HUGEINT AS DOUBLE)
             / CAST((n + {m})::HUGEINT * nn AS DOUBLE) / 100.0, 6) AS enc
FROM te_c CROSS JOIN te_t
"""


def feature_cells(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
) -> DataFrame:
    """Shared (feature, value, label) cell-count frame: ONE stack melt
    + ONE hash aggregate feeding BOTH :func:`split_gain` and
    :func:`mutual_information` — at 100 TB the melt over the fact
    table is the dominant cost and this halves it when a pipeline
    wants both rankings. Output: ``feature, value, _y, cxy``."""
    feats = list(feature_cols)
    lab = F.col(label_col).cast("boolean").cast("int")
    stack_expr = "stack({n}, {args}) AS (feature, value)".format(
        n=len(feats),
        args=", ".join(f"'{f}', CAST({f} AS STRING)" for f in feats),
    )
    melted = df.select(lab.alias("_y"), *feats).selectExpr("_y", stack_expr)
    return melted.groupBy("feature", "value", "_y").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("cxy")
    )


def split_gain_cells(cells: DataFrame) -> DataFrame:
    """Collapse a :func:`feature_cells` frame to the per-(feature,
    value) (nk, c1k) shape split_gain consumes."""
    return cells.groupBy("feature", "value").agg(
        F.sum("cxy").cast("decimal(38,0)").alias("nk"),
        F.sum(F.col("cxy") * F.col("_y")).cast("decimal(38,0)").alias("c1k"),
    )


def split_gain(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    scale: int = 10**6,
    cells_df: DataFrame | None = None,
) -> DataFrame:
    """Gini-impurity decrease of a single split on each candidate
    categorical feature against a boolean label — the decision-stump
    feature-ranking primitive (CART, Breiman et al. 1984, public).

    ``gain(f) = gini(parent) − Σ_k (n_k/n)·gini(child_k)`` with
    ``gini = 1 − Σ_c (c/n)²``. Everything stays EXACT integers:
    per-child ``(n_k² − c0_k² − c1_k²)·scale DIV (n·n_k)`` and parent
    ``(n² − c0² − c1²)·scale DIV n²`` are integer divisions of exact
    decimal(38,0) products (DuckDB: HUGEINT ``//``), so the summed
    gain_scaled is an order-free bigint — the KL/chi² discipline.

    Spark-first shape: ONE stack unpivot melts all features
    (|features|× row amplification), one hash aggregate collapses to
    the |features|·|values| cell frame, and parent totals come from a
    per-feature window over that TINY frame — no second scan, no
    1-row cross join. NULL feature values form their own child.

    Output per feature: ``feature, n, n_values, parent_gini_scaled,
    gain_scaled, gain`` (gain = gain_scaled/scale, one division).
    """
    cells = split_gain_cells(
        cells_df
        if cells_df is not None
        else feature_cells(df, label_col, feature_cols)
    )
    from pyspark.sql import Window

    wf = Window.partitionBy("feature")
    cells = cells.select(
        "feature",
        "nk",
        "c1k",
        F.sum("nk").over(wf).cast("decimal(38,0)").alias("n"),
        F.sum("c1k").over(wf).cast("decimal(38,0)").alias("c1"),
    )
    c0k = F.col("nk") - F.col("c1k")
    # integer DIV (truncating; numerators are non-negative so it equals
    # DuckDB's floor //) keeps every term an exact bigint
    cells = cells.withColumn(
        "_num",
        (F.col("nk") * F.col("nk") - c0k * c0k - F.col("c1k") * F.col("c1k"))
        * F.lit(scale),
    ).withColumn("_term", F.expr("_num div (n * nk)"))
    agg = cells.groupBy("feature").agg(
        F.max("n").alias("_n"),
        F.max("c1").alias("_c1"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum("_term").cast("bigint").alias("_wchild"),
    )
    agg = agg.withColumn(
        "_pnum",
        (
            F.col("_n") * F.col("_n")
            - (F.col("_n") - F.col("_c1")) * (F.col("_n") - F.col("_c1"))
            - F.col("_c1") * F.col("_c1")
        )
        * F.lit(scale),
    ).withColumn("_parent", F.expr("_pnum div (_n * _n)"))
    return agg.select(
        "feature",
        F.col("_n").cast("bigint").alias("n"),
        "n_values",
        F.col("_parent").alias("parent_gini_scaled"),
        (F.col("_parent") - F.col("_wchild")).alias("gain_scaled"),
        F.round(
            (F.col("_parent") - F.col("_wchild")).cast("double")
            / F.lit(float(scale)),
            6,
        ).alias("gain"),
    )


def split_gain_sql(
    table_sql: str,
    label_expr: str,
    feature_exprs: "dict[str, str]",
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`split_gain` — same melt, HUGEINT cell
    arithmetic, and integer ``//`` divisions. ``feature_exprs`` maps
    feature name -> SQL expression."""
    melts = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, CAST(({expr}) AS VARCHAR) AS value, "
        f"CAST(({label_expr}) AS INTEGER) AS _y FROM ({table_sql})"
        for name, expr in feature_exprs.items()
    )
    return f"""
WITH _m AS ({melts}),
_cells AS (
    SELECT feature, value, CAST(count(*) AS HUGEINT) AS nk,
           CAST(sum(_y) AS HUGEINT) AS c1k
    FROM _m GROUP BY feature, value
),
_w AS (
    SELECT feature, nk, c1k,
           sum(nk) OVER (PARTITION BY feature) AS n,
           sum(c1k) OVER (PARTITION BY feature) AS c1
    FROM _cells
),
_t AS (
    SELECT feature, n, c1, nk,
           ((nk * nk - (nk - c1k) * (nk - c1k) - c1k * c1k) * {scale})
               // (n * nk) AS term
    FROM _w
),
_agg AS (
    SELECT feature, max(n) AS n, max(c1) AS c1,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(term) AS BIGINT) AS wchild
    FROM _t GROUP BY feature
)
SELECT feature, CAST(n AS BIGINT) AS n, n_values,
       CAST((n * n - (n - c1) * (n - c1) - c1 * c1) * {scale} // (n * n)
            AS BIGINT) AS parent_gini_scaled,
       CAST((n * n - (n - c1) * (n - c1) - c1 * c1) * {scale} // (n * n)
            AS BIGINT) - wchild AS gain_scaled,
       round((CAST((n * n - (n - c1) * (n - c1) - c1 * c1) * {scale} // (n * n)
                   AS BIGINT) - wchild) / {float(scale)}, 6) AS gain
FROM _agg
"""


def psi_drift(
    df: DataFrame,
    group_col: str,
    ref_group: str,
    cmp_group: str,
    value_col: str,
    n_bins: int = 10,
    scale: int = 10**6,
    value_counts: DataFrame | None = None,
) -> DataFrame:
    """Population Stability Index between a reference cohort and a
    comparison cohort of a numeric column — the standard production
    model-monitoring drift score (credit-scoring literature; PSI < 0.1
    stable / > 0.25 shifted).

    Methodology: equal-frequency bins are derived from the REFERENCE
    side (the deployed model's training distribution), the comparison
    side is histogrammed into those fixed edges, and
    ``PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)`` with add-one smoothing so
    empty bins stay finite.

    Cross-engine exactness (the KL/chi² discipline): with smoothed
    numerators ``A_b = (c_ref_b+1)·(n_cmp+B)`` and ``B_b =
    (c_cmp_b+1)·(n_ref+B)``, each bin's term is
    ``floor(ln(A_b/B_b)·scale) · (A_b − B_b)`` — an exact bigint — and
    ``PSI = Σ terms / ((n_ref+B)·(n_cmp+B)·scale)``, ONE double
    division at the end.

    Spark-first shape: raw rows are touched by ONE (side, value)
    count aggregate; bin edges come from a cumulative window over the
    reference value-counts frame; the ≤n_bins edge table broadcasts
    onto the comparison value counts. Output: one row per bin
    ``(bin, hi_cents, c_ref, c_cmp, term_scaled, psi)`` with the same
    psi on every row (a window over the ≤n_bins frame).

    ``value_counts``: optional pre-built ``(group_col, v, c)`` frame
    (cents-scaled) — the rank-statistics-family reuse contract;
    hash-identical results.
    """
    g = F.col(group_col)
    if value_counts is not None:
        vc = value_counts.filter(g.isin(ref_group, cmp_group)).select(
            (g == ref_group).alias("_is_ref"), "v",
            F.col("c").cast("bigint").alias("c"),
        )
    else:
        cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
        vc = (
            df.filter(g.isin(ref_group, cmp_group))
            .select((g == ref_group).alias("_is_ref"), cents.alias("v"))
            .groupBy("_is_ref", "v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
    ref = vc.filter(F.col("_is_ref")).drop("_is_ref")
    cmp_ = vc.filter(~F.col("_is_ref")).drop("_is_ref")
    # reference CDF over |distinct cents| rows — unbounded for a
    # wide-domain metric, so partition-offset cumsum, not a global
    # window (operators/cumulative.py)
    from stepist_spark.operators.cumulative import ordered_cumsum, whole_frame

    binned = ordered_cumsum(ref, "v", ["c"], tot_prefix="tot_").select(
        "v",
        "c",
        F.expr(
            f"CAST((cum_c * {n_bins} + tot_c - 1) DIV tot_c AS BIGINT)"
        ).alias("bin"),
    )
    ref_bins = binned.groupBy("bin").agg(
        F.max("v").alias("hi_cents"), F.sum("c").cast("bigint").alias("c_ref")
    )
    # comparison values take the smallest bin whose upper edge covers
    # them; values above the last edge fall into the last bin
    edges = ref_bins.select("bin", "hi_cents")
    last_bin = F.lit(n_bins)
    joined = cmp_.join(
        F.broadcast(edges), F.col("v") <= F.col("hi_cents"), "left"
    ).groupBy("v", "c").agg(F.min("bin").alias("_bin"))
    cmp_bins = (
        joined.select(F.coalesce(F.col("_bin"), last_bin).alias("bin"), "c")
        .groupBy("bin")
        .agg(F.sum("c").cast("bigint").alias("c_cmp"))
    )
    # hi_cents -1 marks a comparison-only bin (possible only when the
    # reference side has fewer than n_bins distinct bins) — kept
    # non-NULL so packed string encodings agree across engines
    cells = ref_bins.join(cmp_bins, "bin", "full").select(
        "bin",
        F.coalesce("hi_cents", F.lit(-1)).alias("hi_cents"),
        F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
        F.coalesce("c_cmp", F.lit(0)).alias("c_cmp"),
    )
    # ≤ n_bins+1 rows by construction: explicit bounded whole-frame
    w = whole_frame()
    dec = "decimal(38,0)"
    cells = cells.select(
        "bin",
        "hi_cents",
        "c_ref",
        "c_cmp",
        F.sum("c_ref").over(w).cast(dec).alias("_nr"),
        F.sum("c_cmp").over(w).cast(dec).alias("_nc"),
    )
    a = (F.col("c_ref").cast(dec) + 1) * (F.col("_nc") + F.lit(n_bins))
    b = (F.col("c_cmp").cast(dec) + 1) * (F.col("_nr") + F.lit(n_bins))
    term = (
        F.floor(F.log(a.cast("double") / b.cast("double")) * F.lit(scale)).cast(
            dec
        )
        * (a - b)
    ).cast(dec)
    cells = cells.withColumn("term_scaled", term)
    den = (
        (F.col("_nr") + F.lit(n_bins)) * (F.col("_nc") + F.lit(n_bins))
    ).cast("double") * F.lit(float(scale))
    return cells.select(
        "bin",
        "hi_cents",
        "c_ref",
        "c_cmp",
        F.col("term_scaled").cast("bigint").alias("term_scaled"),
        F.round(
            F.sum(F.col("term_scaled").cast(dec)).over(w).cast("double") / den, 9
        ).alias("psi"),
    )


def psi_drift_sql(
    table_sql: str,
    group_expr: str,
    ref_group: str,
    cmp_group: str,
    value_expr: str,
    n_bins: int = 10,
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`psi_drift` — identical bin derivation,
    HUGEINT smoothed products, floor(ln·scale) integer terms."""
    return f"""
WITH _vc AS (
    SELECT ({group_expr}) = '{ref_group}' AS _is_ref,
           CAST(floor(({value_expr}) * 100 + 0.5) AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS c
    FROM ({table_sql})
    WHERE ({group_expr}) IN ('{ref_group}', '{cmp_group}')
    GROUP BY 1, 2
),
_refb AS (
    SELECT v, c,
           CAST((sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) * {n_bins} + sum(c) OVER () - 1)
                // sum(c) OVER () AS BIGINT) AS bin
    FROM _vc WHERE _is_ref
),
_ref_bins AS (
    SELECT bin, max(v) AS hi_cents, CAST(sum(c) AS BIGINT) AS c_ref
    FROM _refb GROUP BY bin
),
_cmp_assign AS (
    SELECT t.v, t.c, coalesce(min(e.bin), {n_bins}) AS bin
    FROM (SELECT v, c FROM _vc WHERE NOT _is_ref) t
    LEFT JOIN _ref_bins e ON t.v <= e.hi_cents
    GROUP BY t.v, t.c
),
_cmp_bins AS (
    SELECT bin, CAST(sum(c) AS BIGINT) AS c_cmp FROM _cmp_assign GROUP BY bin
),
_cells AS (
    SELECT coalesce(r.bin, m.bin) AS bin, coalesce(r.hi_cents, -1) AS hi_cents,
           coalesce(r.c_ref, 0) AS c_ref, coalesce(m.c_cmp, 0) AS c_cmp
    FROM _ref_bins r FULL JOIN _cmp_bins m ON r.bin = m.bin
),
_tot AS (
    SELECT *, CAST(sum(c_ref) OVER () AS HUGEINT) AS nr,
           CAST(sum(c_cmp) OVER () AS HUGEINT) AS nc
    FROM _cells
),
_terms AS (
    SELECT bin, hi_cents, c_ref, c_cmp, nr, nc,
           CAST(floor(ln(CAST((c_ref + 1) * (nc + {n_bins}) AS DOUBLE)
                         / CAST((c_cmp + 1) * (nr + {n_bins}) AS DOUBLE))
                      * {scale}) AS HUGEINT)
               * ((c_ref + 1) * (nc + {n_bins})
                  - (c_cmp + 1) * (nr + {n_bins})) AS term
    FROM _tot
)
SELECT bin, hi_cents, c_ref, c_cmp, CAST(term AS BIGINT) AS term_scaled,
       round(CAST(sum(term) OVER () AS DOUBLE)
             / (CAST((nr + {n_bins}) * (nc + {n_bins}) AS DOUBLE)
                * {float(scale)}), 9) AS psi
FROM _terms
"""


def mutual_information(
    df: DataFrame,
    label_col: str,
    feature_cols: Sequence[str],
    scale: int = 10**6,
    cells_df: DataFrame | None = None,
) -> DataFrame:
    """Mutual information I(feature; label) per candidate categorical
    feature against a boolean label — the information-theoretic twin
    of :func:`split_gain` (Cover & Thomas, Elements of Information
    Theory — public; the standard filter-method feature ranking).

    ``I = Σ_cells p(x,y)·ln( p(x,y) / (p(x)p(y)) )`` computed as
    ``(1/n)·Σ c_xy·ln(c_xy·n / (c_x·c_y))``. Cross-engine exactness
    (the KL discipline): each cell's ln of a ratio of EXACT bigint
    products is scaled to ``floor(ln·scale)`` BEFORE the
    ``c_xy``-weighted sum, so the aggregate is an order-free bigint;
    ``mi = mi_scaled / (n·scale)`` is one division. Empty cells
    contribute zero and never materialize.

    Spark-first shape: the split_gain melt — one stack unpivot, one
    hash aggregate to the |features|·|values|·2 cell frame, marginals
    via windows over that tiny frame.

    Output per feature: ``feature, n, n_values, mi_scaled, mi``.
    """
    from pyspark.sql import Window

    cells = (
        cells_df
        if cells_df is not None
        else feature_cells(df, label_col, feature_cols)
    )
    wf = Window.partitionBy("feature")
    wx = Window.partitionBy("feature", "value")
    wy = Window.partitionBy("feature", "_y")
    cells = cells.select(
        "feature",
        "value",
        "cxy",
        F.sum("cxy").over(wx).cast("decimal(38,0)").alias("cx"),
        F.sum("cxy").over(wy).cast("decimal(38,0)").alias("cy"),
        F.sum("cxy").over(wf).cast("decimal(38,0)").alias("n"),
    )
    num = F.col("cxy") * F.col("n")
    den = F.col("cx") * F.col("cy")
    term = (
        F.floor(
            F.log(num.cast("double") / den.cast("double")) * F.lit(scale)
        ).cast("decimal(38,0)")
        * F.col("cxy")
    )
    agg = cells.groupBy("feature").agg(
        F.max("n").cast("bigint").alias("n"),
        F.count_distinct("value").cast("bigint").alias("n_values"),
        F.sum(term).cast("bigint").alias("mi_scaled"),
    )
    return agg.select(
        "feature",
        "n",
        "n_values",
        "mi_scaled",
        F.round(
            F.col("mi_scaled").cast("double")
            / (F.col("n").cast("double") * F.lit(float(scale))),
            9,
        ).alias("mi"),
    )


def mutual_information_sql(
    table_sql: str,
    label_expr: str,
    feature_exprs: "dict[str, str]",
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`mutual_information`."""
    melts = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, CAST(({expr}) AS VARCHAR) AS value, "
        f"CAST(({label_expr}) AS INTEGER) AS _y FROM ({table_sql})"
        for name, expr in feature_exprs.items()
    )
    return f"""
WITH _m AS ({melts}),
_cells AS (
    SELECT feature, value, _y, CAST(count(*) AS HUGEINT) AS cxy
    FROM _m GROUP BY feature, value, _y
),
_w AS (
    SELECT feature, value, cxy,
           sum(cxy) OVER (PARTITION BY feature, value) AS cx,
           sum(cxy) OVER (PARTITION BY feature, _y) AS cy,
           sum(cxy) OVER (PARTITION BY feature) AS n
    FROM _cells
),
_t AS (
    SELECT feature, n, value,
           CAST(floor(ln(CAST(cxy * n AS DOUBLE) / CAST(cx * cy AS DOUBLE))
                      * {scale}) AS HUGEINT) * cxy AS term
    FROM _w
),
_agg AS (
    SELECT feature, CAST(max(n) AS BIGINT) AS n,
           CAST(count(DISTINCT value) AS BIGINT) AS n_values,
           CAST(sum(term) AS BIGINT) AS mi_scaled
    FROM _t GROUP BY feature
)
SELECT feature, n, n_values, mi_scaled,
       round(CAST(mi_scaled AS DOUBLE) / (CAST(n AS DOUBLE) * {float(scale)}), 9)
           AS mi
FROM _agg
"""


def weight_of_evidence(
    df: DataFrame,
    category_col: str,
    label_col,
    scale: int = 10**6,
) -> DataFrame:
    """Weight of Evidence per category + the Information Value total
    (standard credit-scoring feature diagnostics, Siddiqi 2006 —
    public): ``WoE_i = ln((g_i/G)/(b_i/B))`` and ``IV = Σ (g_i/G −
    b_i/B)·WoE_i`` for a binary label over a categorical feature —
    the monotone-risk twin of mutual_information's ranking.

    Scale shape: raw rows collapse in ONE conditional hash aggregate
    to the |categories|-row cell frame; G/B totals and the IV sum are
    whole_frame windows over that bounded frame. Exact arithmetic:
    ``woe_scaled = floor(ln((g_i·B)/(b_i·G))·scale)`` — one ln of a
    ratio of exact decimal(38,0)/HUGEINT products (the t23/KL/PSI log
    pattern) — and each IV term is ``(g_i·B − b_i·G)·woe_scaled DIV
    (G·B)``, an exact integer division whose operands share sign (the
    diff and the WoE flip together), so Spark DIV and DuckDB ``//``
    truncate identically. Categories with an empty cell get NULL WoE
    and contribute 0 to IV (the unsmoothed convention; documented).

    Output: ``category, g, b, woe_scaled, woe, iv_term_scaled,
    iv_scaled, iv`` (iv columns repeated per row — the frame is tiny).
    """
    from pyspark.sql import Window

    from stepist_spark.operators.cumulative import whole_frame

    lab = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    # NULL labels are EXCLUDED, not silently counted as "bad": a
    # when(lab, 1).otherwise(0) pair routes NULL into the else branch,
    # which would quietly fold unlabeled rows into b and bias every
    # WoE/IV downstream (the temporal_split 'unknown' discipline).
    cells = df.filter(lab.isNotNull()).groupBy(
        F.col(category_col).alias("category")
    ).agg(
        F.sum(F.when(lab, 1).otherwise(0)).cast("bigint").alias("g"),
        F.sum(F.when(lab, 0).otherwise(1)).cast("bigint").alias("b"),
    )
    w_all = whole_frame().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = "decimal(38,0)"
    cells = (
        cells.withColumn("_G", F.sum("g").over(w_all).cast(dec))
        .withColumn("_B", F.sum("b").over(w_all).cast(dec))
        .withColumn("_num", F.col("g").cast(dec) * F.col("_B"))
        .withColumn("_den", F.col("b").cast(dec) * F.col("_G"))
    )
    woe_scaled = F.when(
        (F.col("g") > 0) & (F.col("b") > 0),
        F.floor(
            F.log(F.col("_num").cast("double") / F.col("_den").cast("double"))
            * scale
        ).cast("bigint"),
    )
    cells = cells.withColumn("woe_scaled", woe_scaled)
    term = F.coalesce(
        F.expr("CAST(((_num - _den) * woe_scaled) DIV (_G * _B) AS BIGINT)"),
        F.lit(0),
    )
    cells = cells.withColumn("iv_term_scaled", term).withColumn(
        "iv_scaled", F.sum("iv_term_scaled").over(w_all).cast("bigint")
    )
    return cells.select(
        "category",
        "g",
        "b",
        "woe_scaled",
        F.round(F.col("woe_scaled").cast("double") / scale, 6).alias("woe"),
        "iv_term_scaled",
        "iv_scaled",
        F.round(F.col("iv_scaled").cast("double") / scale, 6).alias("iv"),
    )


def weight_of_evidence_sql(
    table_sql: str, category_expr: str, label_expr: str, scale: int = 10**6
) -> str:
    """DuckDB mirror of :func:`weight_of_evidence` — identical HUGEINT
    products, ln/floor sequence, and truncating integer division."""
    return f"""
WITH _cells AS (
    SELECT ({category_expr}) AS category,
           CAST(sum(CASE WHEN ({label_expr}) THEN 1 ELSE 0 END) AS BIGINT) AS g,
           CAST(sum(CASE WHEN ({label_expr}) THEN 0 ELSE 1 END) AS BIGINT) AS b
    FROM ({table_sql}) WHERE ({label_expr}) IS NOT NULL GROUP BY 1
),
_tot AS (
    SELECT *,
        CAST(sum(g) OVER () AS HUGEINT) AS _G,
        CAST(sum(b) OVER () AS HUGEINT) AS _B,
        CAST(g AS HUGEINT) * CAST(sum(b) OVER () AS HUGEINT) AS _num,
        CAST(b AS HUGEINT) * CAST(sum(g) OVER () AS HUGEINT) AS _den
    FROM _cells
),
_woe AS (
    SELECT *,
        CASE WHEN g > 0 AND b > 0
             THEN CAST(floor(ln(CAST(_num AS DOUBLE) / CAST(_den AS DOUBLE))
                             * {scale}) AS BIGINT) END AS woe_scaled
    FROM _tot
),
_terms AS (
    SELECT *,
        coalesce(CAST(((_num - _den) * woe_scaled) // (_G * _B) AS BIGINT), 0)
            AS iv_term_scaled
    FROM _woe
)
SELECT category, g, b, woe_scaled,
       round(CAST(woe_scaled AS DOUBLE) / {scale}, 6) AS woe,
       iv_term_scaled,
       CAST(sum(iv_term_scaled) OVER () AS BIGINT) AS iv_scaled,
       round(CAST(sum(iv_term_scaled) OVER () AS DOUBLE) / {scale}, 6) AS iv
FROM _terms
"""


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    scale: int = 100,
    x_counts: DataFrame | None = None,
    y_counts: DataFrame | None = None,
) -> DataFrame:
    """Spearman rank correlation between two metric columns — Pearson
    on the tie-averaged ranks (Spearman 1904, public): the monotone-
    association readout that outliers and nonlinear-but-monotone
    relationships can't distort, the rank twin of
    :func:`corr_matrix`'s Pearson.

    No per-row ranking window: each column's DOUBLED tie-averaged rank
    is an exact integer looked up from its distinct-value frame —
    ``2·r(v) = 2·below(v) + t(v) + 1`` via one
    ``cumulative.ordered_cumsum`` per column (|distinct values| can
    approach |rows|, so no single-task window) — and joins back to the
    fact rows by value (two hash joins). Pearson's sufficient
    statistics over the doubled ranks accumulate exactly in
    decimal(38,0); doubling cancels in the correlation. The final rho
    is the corr_matrix fixed IEEE sequence, 6 dp.

    Output (one row): ``n, sxx2, syy2, sxy2`` (exact doubled-rank
    sums of squares/products) and ``rho`` (NULL when n < 2 or either
    side is all ties). Rows where either column is NULL are excluded
    (pairwise-complete).

    ``x_counts``/``y_counts``: optional pre-built UNGROUPED ``(v, c)``
    value-counts frames for each column (cents-scaled with this
    ``scale``, over exactly the pairwise-complete rows) — the
    rank-statistics-family reuse contract: the cumsum's three internal
    passes then re-derive from the caller's materialized base instead
    of re-aggregating the fact rows. Hash-identical results. The PAIR
    frame still scans ``df`` once — pair ranks can't ride
    single-column counts.
    """
    from stepist_spark.operators.cumulative import ordered_cumsum

    rows = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.floor(F.col(x_col) * scale + F.lit(0.5)).cast("bigint").alias("vx"),
        F.floor(F.col(y_col) * scale + F.lit(0.5)).cast("bigint").alias("vy"),
    )
    given = {"vx": x_counts, "vy": y_counts}

    def _rank_frame(col: str):
        pre = given[col]
        if pre is not None:
            vc = pre.select(
                F.col("v").alias(col), F.col("c").cast("bigint").alias("t")
            )
        else:
            vc = rows.groupBy(col).agg(
                F.count(F.lit(1)).cast("bigint").alias("t")
            )
        # materialize="none": each rank frame is consumed exactly once
        # (the join back), and its upstream is one hash agg over a
        # 2-column parquet projection (or the caller's cached counts) —
        # recomputing that across the cumsum's three internal passes
        # beats checkpointing the |distinct values| frame (measured
        # 3.8s vs 11.9s at sf0.1 on the 1M-distinct cents column)
        st = ordered_cumsum(vc, col, ["t"], materialize="none")
        return st.select(
            col,
            ((F.col("cum_t") - F.col("t")) * 2 + F.col("t") + 1)
            .cast("bigint")
            .alias(f"r2{col[-1]}"),
        )

    ranked = rows.join(_rank_frame("vx"), "vx").join(_rank_frame("vy"), "vy")
    dec = "decimal(38,0)"
    rx = F.col("r2x").cast(dec)
    ry = F.col("r2y").cast(dec)
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(rx).cast(dec).alias("_sx"),
        F.sum(ry).cast(dec).alias("_sy"),
        F.sum(rx * rx).cast(dec).alias("sxx2"),
        F.sum(ry * ry).cast(dec).alias("syy2"),
        F.sum(rx * ry).cast(dec).alias("sxy2"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    qx = F.col("sxx2").cast("double")
    qy = F.col("syy2").cast("double")
    xy = F.col("sxy2").cast("double")
    cov_n = nd * xy - sx * sy
    vx_n = nd * qx - sx * sx
    vy_n = nd * qy - sy * sy
    rho = F.when(
        (F.col("n") >= 2) & (vx_n > 0) & (vy_n > 0),
        F.round(cov_n / F.sqrt(vx_n * vy_n), 6),
    )
    return agg.select("n", "sxx2", "syy2", "sxy2", rho.alias("rho"))


def spearman_corr_sql(
    table_sql: str,
    x_expr: str,
    y_expr: str,
    scale: int = 100,
) -> str:
    """DuckDB mirror of :func:`spearman_corr` — identical HUGEINT
    doubled-rank sums and IEEE rho sequence."""
    return f"""
WITH _sp_r AS (
    SELECT CAST(floor(({x_expr}) * {scale} + 0.5) AS BIGINT) AS vx,
           CAST(floor(({y_expr}) * {scale} + 0.5) AS BIGINT) AS vy
    FROM ({table_sql})
    WHERE ({x_expr}) IS NOT NULL AND ({y_expr}) IS NOT NULL
),
_sp_x AS (
    SELECT vx, CAST((CAST(sum(count(*)) OVER (ORDER BY vx ROWS UNBOUNDED PRECEDING)
                     AS HUGEINT) - count(*)) * 2 + count(*) + 1 AS HUGEINT) AS r2x
    FROM _sp_r GROUP BY vx
),
_sp_y AS (
    SELECT vy, CAST((CAST(sum(count(*)) OVER (ORDER BY vy ROWS UNBOUNDED PRECEDING)
                     AS HUGEINT) - count(*)) * 2 + count(*) + 1 AS HUGEINT) AS r2y
    FROM _sp_r GROUP BY vy
),
_sp_j AS (
    SELECT r2x, r2y FROM _sp_r JOIN _sp_x USING (vx) JOIN _sp_y USING (vy)
),
_sp_a AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           sum(r2x) AS sx, sum(r2y) AS sy,
           sum(r2x * r2x) AS sxx2, sum(r2y * r2y) AS syy2,
           sum(r2x * r2y) AS sxy2
    FROM _sp_j
)
SELECT n, sxx2, syy2, sxy2,
       CASE WHEN n >= 2
             AND CAST(n AS DOUBLE) * CAST(sxx2 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n AS DOUBLE) * CAST(syy2 AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            THEN round(
              (CAST(n AS DOUBLE) * CAST(sxy2 AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / sqrt((CAST(n AS DOUBLE) * CAST(sxx2 AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy2 AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS rho
FROM _sp_a
"""
