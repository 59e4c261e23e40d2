"""Table profiling — the ``describe``-style data-quality summary every
ingestion pipeline runs before trusting a new drop: per column, the
row count, null count, EXACT distinct count, and min/max.

Spark-first shape: ONE aggregation statement computes every column's
stats together; the multiple exact COUNT(DISTINCT)s compile to a
single-pass Expand (each input row fans out once per distinct-agg),
so the table is scanned exactly once. The wide one-row result is then
unpivoted driver-free via an array-of-structs explode.

At 100 TB the exact distinct counts are the expensive term (each adds
an Expand replica of the scan); profile the columns you need, or use
``operators.sketches`` HLL for the approximate version — this operator
is deliberately the exact one, which is why it can carry an oracle.

Reference parity: the reference has no profiling surface (SURVEY.md
§2.2 'absent'); BASELINE.json extension.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: ``col_name, n_rows, n_nulls, n_distinct,
    min_repr, max_repr`` (min/max cast to string AFTER the native-type
    aggregation, so numeric/date ordering is preserved).

    Exact-typed columns (ints, strings, dates) produce engine-portable
    reprs; float columns profile fine but their string repr is
    engine-specific — keep them out of hash-compared outputs.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__rows").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_repr"),
                F.col(f"__max_{c}").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select("p.*")


def profile_table_sql(table_sql: str, cols: Sequence[str]) -> str:
    """DuckDB mirror of :func:`profile_table` (one SELECT per column,
    UNION ALL — DuckDB's optimizer shares the scan)."""
    parts = []
    for c in cols:
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,\n"
            f"       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,\n"
            f"       count(DISTINCT {c}) AS n_distinct,\n"
            f"       CAST(min({c}) AS VARCHAR) AS min_repr,\n"
            f"       CAST(max({c}) AS VARCHAR) AS max_repr\n"
            f"FROM ({table_sql})"
        )
    return "\nUNION ALL\n".join(parts)


# log10(1 + 1/d) for d=1..9, precomputed in Python and injected as
# literal doubles into BOTH engines — no runtime libm call can diverge
_BENFORD_EXPECTED = {
    d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)
}


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law (Newcomb
    1881 / Benford 1938, public) — the fraud/data-quality screen for
    naturally-occurring numeric columns.

    Engine-portable exactness: values go to integer cents half-up and
    the leading digit is the FIRST CHARACTER OF THE BIGINT'S STRING
    form — no log10/pow chain whose boundary behavior (10^k edges)
    could differ between engines. Non-positive values are excluded
    (Benford applies to positive magnitudes). Share is one double
    division of exact bigints; expected shares are Python-precomputed
    literals identical in both engines; deviation = share − expected
    is one subtraction of those doubles, all rounded to 6 dp.

    Spark-first shape: ONE map-side-combined aggregate to ≤ 9 rows;
    the total rides a whole-frame window over that 9-row table.

    Output: ``digit, n, total, share, expected, deviation``.
    """
    from pyspark.sql import Window

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    digits = (
        df.select(cents.alias("_c"))
        .filter(F.col("_c") > 0)
        .select(F.substring(F.col("_c").cast("string"), 1, 1).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    from stepist_spark.operators.cumulative import whole_frame

    # 9 digit rows — bounded frame, explicit single-task window
    total = F.sum("n").over(whole_frame())
    expected = F.element_at(
        F.create_map(
            *[
                x
                for d, p in sorted(_BENFORD_EXPECTED.items())
                for x in (F.lit(str(d)), F.lit(p))
            ]
        ),
        F.col("digit"),
    )
    share = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        digits.withColumn("total", total.cast("bigint"))
        .select(
            "digit",
            "n",
            "total",
            F.round(share, 6).alias("share"),
            F.round(expected, 6).alias("expected"),
            F.round(share - expected, 6).alias("deviation"),
        )
    )


def benford_digits_sql(table_sql: str, value_expr: str) -> str:
    """DuckDB mirror of :func:`benford_digits` — same string-leading-
    digit extraction and literal expected shares."""
    cases = " ".join(
        f"WHEN '{d}' THEN CAST({p!r} AS DOUBLE)"
        for d, p in sorted(_BENFORD_EXPECTED.items())
    )
    return f"""
WITH bf_d AS (
    SELECT substr(CAST(c AS VARCHAR), 1, 1) AS digit,
           CAST(count(*) AS BIGINT) AS n
    FROM (SELECT CAST(floor(({value_expr}) * 100 + 0.5) AS BIGINT) AS c
          FROM ({table_sql}))
    WHERE c > 0 GROUP BY 1
),
bf_t AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM bf_d)
SELECT digit, n, total,
       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
       round(CASE digit {cases} END, 6) AS expected,
       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
             - (CASE digit {cases} END), 6) AS deviation
FROM bf_t
"""


def column_entropy(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Shannon entropy (nats) of each column's value distribution —
    the information-density profile (near-zero entropy = constant
    column; ln(n_distinct) = uniform ids). NULLs are excluded.

    Engine-portable exactness (the t23/KL log pattern): per distinct
    value, the term ``c · floor(ln(c)·1e6)`` is an exact bigint, so
    the cross-value sum is order-free; ``H = ln(N) − S/(N·1e6)``
    spends ONE final ln + one division on identical inputs.

    Spark-first shape: every column's values unpivot through ONE
    array-of-structs explode (one scan), then one (col, value) hash
    aggregate and one per-col aggregate — no per-column rescans.

    Output: ``col_name, n, n_distinct, entropy`` (6-dp nats).
    """
    cols = list(cols)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"), F.col(c).cast("string").alias("val")
            )
            for c in cols
        ]
    )
    long = (
        df.select(F.explode(entries).alias("_e"))
        .select("_e.col_name", "_e.val")
        .filter(F.col("val").isNotNull())
    )
    counts = long.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    term = F.col("c") * F.floor(
        F.log(F.col("c").cast("double")) * F.lit(1_000_000)
    ).cast("bigint")
    per_col = counts.groupBy("col_name").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(term).cast("bigint").alias("_s"),
    )
    ent = F.log(F.col("n").cast("double")) - F.col("_s").cast("double") / (
        F.col("n").cast("double") * F.lit(1_000_000.0)
    )
    return per_col.select(
        "col_name", "n", "n_distinct", F.round(ent, 6).alias("entropy")
    )


def column_entropy_sql(table_sql: str, cols: Sequence[str]) -> str:
    """DuckDB mirror of :func:`column_entropy` — same unpivot, same
    floor(ln·1e6) integer terms, same final expression."""
    arms = ", ".join(
        f"{{'col_name': '{c}', 'val': CAST({c} AS VARCHAR)}}" for c in cols
    )
    return f"""
WITH ce_long AS (
    SELECT e.col_name AS col_name, e.val AS val
    FROM (SELECT unnest([{arms}]) AS e FROM ({table_sql}))
    WHERE e.val IS NOT NULL
),
ce_cnt AS (
    SELECT col_name, val, CAST(count(*) AS BIGINT) AS c
    FROM ce_long GROUP BY 1, 2
),
ce_col AS (
    SELECT col_name, CAST(sum(c) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
                AS BIGINT) AS s
    FROM ce_cnt GROUP BY 1
)
SELECT col_name, n, n_distinct,
       round(ln(CAST(n AS DOUBLE))
             - CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6) AS entropy
FROM ce_col
"""
