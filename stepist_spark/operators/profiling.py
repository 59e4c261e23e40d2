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
