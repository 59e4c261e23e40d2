"""RFM customer segmentation (Recency / Frequency / Monetary
quartile scoring — the classic direct-marketing segmentation, Hughes
1994, public): collapse a transaction log to one row per customer,
score each dimension into n quantile tiles, and emit the combined
segment label.

The reference has no analytics surface (SURVEY.md §2.2); this is the
product-analytics extension family.

Spark-first shape: the transaction log collapses in ONE map-side-
combined hash aggregate to a |customers|-row frame; the three NTILE
windows then run over that DIMENSION-SIZED table, never over raw
transactions — the same |keys|-frame-window discipline as
skew_report/chi_square. At 100 TB the cost is the one fact shuffle;
the window pass is customer-table-sized. (If even the customer frame
outgrows a sortable window at extreme scale, swap the NTILEs for
approx-quantile boundary joins — documented trade: boundaries become
approximate.)

Cross-engine determinism: monetary goes to exact integer cents;
every NTILE orders by (metric, customer id) so ties land in the same
tile on any engine; recency ranks on the raw last-purchase timestamp
(no "days since" float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rfm_segments(
    df: DataFrame,
    customer_col: str,
    ts_col: str,
    amount_col: str,
    n_tiles: int = 4,
) -> DataFrame:
    """Per-customer RFM scores and segment label.

    Scores are 1..n_tiles with n_tiles = best (most recent / most
    frequent / highest spend) — the marketing convention. Output:
    ``customer, last_ts, frequency, monetary_cents, r_score, f_score,
    m_score, segment`` (segment = 'r-f-m').
    """
    cents = F.floor(F.col(amount_col) * 100 + F.lit(0.5)).cast("bigint")
    per_cust = (
        df.select(F.col(customer_col).alias("customer"), F.col(ts_col).alias("_ts"), cents.alias("_c"))
        .groupBy("customer")
        .agg(
            F.max("_ts").alias("last_ts"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum("_c").cast("bigint").alias("monetary_cents"),
        )
    )
    # three total-order NTILEs over the |customers| frame — unbounded
    # at 100 TB, so each rides the partition-offset global_ntile
    # (operators/cumulative.py: range exchange + local rank + broadcast
    # offsets; bit-identical to ntile() OVER (ORDER BY ...)) instead of
    # a single-task global window
    from stepist_spark.operators.cumulative import global_ntile

    scored = global_ntile(
        per_cust, ["last_ts", "customer"], n_tiles, out_col="r_score"
    )
    scored = global_ntile(
        scored, ["frequency", "customer"], n_tiles, out_col="f_score"
    )
    scored = global_ntile(
        scored, ["monetary_cents", "customer"], n_tiles, out_col="m_score"
    )
    scored = scored.select(
        "customer",
        "last_ts",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def rfm_segments_sql(
    table_sql: str,
    customer_expr: str,
    ts_expr: str,
    amount_expr: str,
    n_tiles: int = 4,
) -> str:
    """DuckDB mirror of :func:`rfm_segments` — same cents scaling,
    same (metric, customer) tie-stable NTILE ordering."""
    return f"""
WITH rfm_c AS (
    SELECT {customer_expr} AS customer, max({ts_expr}) AS last_ts,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(sum(CAST(floor(({amount_expr}) * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS monetary_cents
    FROM ({table_sql}) GROUP BY 1
)
SELECT customer, last_ts, frequency, monetary_cents,
       CAST(ntile({n_tiles}) OVER (ORDER BY last_ts ASC, customer ASC) AS BIGINT)
           AS r_score,
       CAST(ntile({n_tiles}) OVER (ORDER BY frequency ASC, customer ASC) AS BIGINT)
           AS f_score,
       CAST(ntile({n_tiles}) OVER (ORDER BY monetary_cents ASC, customer ASC) AS BIGINT)
           AS m_score,
       CAST(ntile({n_tiles}) OVER (ORDER BY last_ts ASC, customer ASC) AS VARCHAR)
       || '-' ||
       CAST(ntile({n_tiles}) OVER (ORDER BY frequency ASC, customer ASC) AS VARCHAR)
       || '-' ||
       CAST(ntile({n_tiles}) OVER (ORDER BY monetary_cents ASC, customer ASC) AS VARCHAR)
           AS segment
FROM rfm_c
"""
