"""Scalar/array function library.

Everything here is built from ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs in the hot path. Each family
exposes a Spark Column builder AND a DuckDB-dialect SQL mirror
generated from the same constants, so the driver's oracle comparison
exercises bit-identical semantics on both engines.
"""

from stepist_spark.functions import hashing, text, vectors

__all__ = ["hashing", "text", "vectors"]
