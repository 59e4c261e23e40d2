"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (revenue by nation, TPC-H Q5 shape)
  over /root/testdata/sf0.001, built through the stepist_spark Pipeline
  API so the smoke check exercises the composition layer end-to-end.
- ``queries()``: every implemented operator from SURVEY.md §2 as a
  named (spark, sf_dir) -> DataFrame callable.
- ``oracle_sql()``: the DuckDB-dialect equivalent for each query —
  every registered gate carries one (round 3): even the approximation-
  bearing ops are engine-portable (md5-register HLL, deterministic
  hash-sample percentile), so the driver hash-checks all 50.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from stepist_spark.pipeline import Pipeline
    from stepist_spark.queries.relational import q03_revenue_by_nation

    sf_dir = "/root/testdata/sf0.001"
    pipe = Pipeline().add(lambda df: df, name="flagship")
    base = q03_revenue_by_nation(spark, sf_dir)
    return pipe.run(base).orderBy(F.col("revenue").desc(), F.col("n_name"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from stepist_spark.queries import all_queries

    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle for each query (same aliases, same rounding)."""
    from stepist_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
