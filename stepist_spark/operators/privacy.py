"""k-anonymity audit and suppression — the release-gating privacy
check a curation pipeline runs next to PII redaction
(`functions/text.redact_pii`): a row is k-anonymous when at least k
rows share its quasi-identifier combination (Sweeney 2002, public),
so no released record can be narrowed below a crowd of k.

The reference has no governance surface (SURVEY.md §2.2); this is the
LLM-pipeline extension next to the PII scrub.

Spark-first shape: ONE window count over the quasi-identifier key (no
join, no second scan); suppression is the filter on that count. At
100 TB this is a single hash exchange on the quasi columns with
map-side partial counting.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stepist_spark.operators.cumulative import require_groups


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    size_col: str = "group_size",
    safe_col: str = "is_k_anon",
) -> DataFrame:
    """Append each row's quasi-identifier ``size_col`` and the
    ``safe_col`` flag (group_size >= k). NULL quasi values group
    together (SQL GROUP BY semantics — a NULL birthdate crowd is still
    a crowd)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    quasi_cols = require_groups(
        quasi_cols, "k_anonymity", "an empty quasi set means every row is one crowd"
    )
    w = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    return df.withColumn(
        size_col, F.count(F.lit(1)).over(w).cast("bigint")
    ).withColumn(safe_col, F.col(size_col) >= k)


def suppress_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Record suppression: drop every row whose quasi-identifier group
    has fewer than k members — the release set is k-anonymous by
    construction. (Generalization — coarsening values instead of
    dropping rows — composes upstream: bucket/truncate the quasi
    columns first, then suppress what remains.)"""
    out = k_anonymity(df, quasi_cols, k)
    return out.filter(F.col("is_k_anon")).drop("group_size", "is_k_anon")


def k_anonymity_sql(
    table_sql: str, quasi_exprs: Sequence[str], k: int, select_cols: str = "*"
) -> str:
    """DuckDB mirror: rows surviving suppression with their group size."""
    keys = ", ".join(quasi_exprs)
    return f"""
SELECT {select_cols} FROM (
    SELECT *, count(*) OVER (PARTITION BY {keys}) AS group_size
    FROM ({table_sql})
) WHERE group_size >= {k}
"""
