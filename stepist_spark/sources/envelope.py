"""Wire-envelope helpers for queue-shaped sources/sinks (Kafka et al).

The reference serializes every queued job as
``{'data': {'flow_data': <record>, 'meta_data': <session meta>}}`` —
built by ``StepData.get_dict`` (`stepist/flow/steps/step.py:18-22`) and
wrapped/pickled at enqueue (`stepist/flow/libs/simple_queue.py:49-51`).
These helpers restate that envelope as JSON columns so a flow written
against the reference's wire format ports onto any Structured
Streaming key/value transport:

- :func:`to_envelope` turns rows into ``(key?, value)`` JSON strings —
  the shape ``write_stream(fmt="kafka")`` (and the kafka batch writer)
  expects;
- :func:`from_envelope` parses them back, restoring the flow columns
  and the ``_meta`` struct that :func:`stepist_spark.pipeline.with_meta`
  reads.

Everything is JVM-side ``to_json``/``from_json`` — no Python in the
per-record path, so the envelope adds no scale cost beyond the JSON
codec itself. No broker is required to certify the round trip: the
same columns write/read through file or memory backends (see
tests/test_sources.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def envelope_schema(flow_schema: str, meta_schema: str | None = None) -> str:
    """DDL schema of one envelope value: ``flow_schema`` (and
    optionally ``meta_schema``) are inner DDL fragments like
    ``"order_id BIGINT, total DOUBLE"``."""
    inner = f"flow_data: STRUCT<{flow_schema}>"
    if meta_schema:
        inner += f", meta_data: STRUCT<{meta_schema}>"
    return f"STRUCT<data: STRUCT<{inner}>>"


def to_envelope(
    df: DataFrame,
    flow_cols: Sequence[str] | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Serialize rows into the reference wire envelope.

    Output columns: ``value`` (JSON string) and, when ``key_col`` is
    given, ``key`` (string) — exactly what the kafka sink consumes
    (both are cast to binary by Spark's kafka writer). ``flow_cols``
    defaults to every column except ``_meta`` — the key is carried IN
    flow_data too (the reference's flow_data is the whole record; the
    kafka key is routing metadata, not a projection). A ``_meta``
    struct column (from :func:`~stepist_spark.pipeline.with_meta`)
    rides along as ``meta_data``, mirroring the reference's session
    propagation (`stepist/flow/session.py:6-75`).
    """
    if flow_cols is None:
        flow_cols = [c for c in df.columns if c != "_meta"]
    fields: list[Column] = [
        F.struct(*[F.col(c) for c in flow_cols]).alias("flow_data")
    ]
    if "_meta" in df.columns:
        fields.append(F.col("_meta").alias("meta_data"))
    payload = F.struct(F.struct(*fields).alias("data"))
    out_cols = [F.to_json(payload).alias("value")]
    if key_col is not None:
        out_cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*out_cols)


def from_envelope(
    df: DataFrame,
    flow_schema: str,
    meta_schema: str | None = None,
    value_col: str = "value",
    key_col: str | None = "key",
) -> DataFrame:
    """Parse envelope values back into flow columns (+ ``_meta`` when
    ``meta_schema`` is given). ``value_col`` may be string or binary
    (kafka delivers binary — it is cast). Works identically on batch
    and streaming DataFrames; malformed records yield null columns
    (from_json's PERMISSIVE behavior) rather than poisoning the stream —
    the declarative upgrade of the reference's re-push-on-error loop
    (`stepist/flow/libs/simple_queue.py:42-47`).

    ``key_col`` names the envelope's ROUTING-KEY column to drop
    alongside the parsed value (kafka's ``key`` by default); pass
    ``None`` to keep a business column that happens to be named
    ``key``.
    """
    parsed = df.withColumn(
        "_env", F.from_json(F.col(value_col).cast("string"), envelope_schema(flow_schema, meta_schema))
    )
    cols: list[Column | str] = [F.col("_env.data.flow_data.*")]
    if meta_schema:
        cols.append(F.col("_env.data.meta_data").alias("_meta"))
    passthrough = [
        c for c in df.columns if c not in (value_col, "_env") and c != key_col
    ]
    return parsed.select(*passthrough, *cols)
