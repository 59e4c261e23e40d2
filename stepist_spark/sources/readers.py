"""Batch and streaming readers.

Replaces the reference's dequeue loop (`stepist/flow/libs/
simple_queue.py:15-47`: shuffled BRPOP across per-step Redis lists)
with declarative sources. Batch reads are lazy DataFrames; streaming
reads are unbounded DataFrames consumed by ``stepist_spark.streaming``.

Scale notes:
- parquet/orc reads get predicate pushdown + column pruning for free;
  callers should filter/select on the returned frame, never pre-collect.
- ``schema`` is accepted everywhere and REQUIRED for streaming file
  sources (Spark refuses to infer on a stream) — schema-first is also
  the right stance at 100 TB, where an inference pass is a full scan.
- rate limits (``maxFilesPerTrigger`` etc.) are the backpressure analog
  of the reference's ``jobs_limit`` producer blocking
  (`stepist/flow/workers/adapters/simple_queue.py:24-38`).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

_BATCH_FORMATS = {"parquet", "csv", "json", "orc", "text", "avro"}
_STREAM_FORMATS = {"parquet", "csv", "json", "orc", "text", "rate", "rate-micro-batch", "kafka", "socket"}


def read(
    spark: SparkSession,
    path_or_format: str,
    fmt: str | None = None,
    schema: str | Any | None = None,
    **options: str,
) -> DataFrame:
    """Read a batch source lazily.

    ``read(spark, "/data/x.parquet")`` infers the format from the
    extension; pass ``fmt`` explicitly for extension-less paths.
    Options pass straight through (``header``, ``inferSchema``, ...).
    """
    fmt = fmt or _infer_format(path_or_format)
    if fmt not in _BATCH_FORMATS:
        raise ValueError(f"unsupported batch format {fmt!r}; one of {sorted(_BATCH_FORMATS)}")
    if fmt == "parquet" and schema is None:
        # TIMESTAMP(NANOS) parquet columns make Spark throw outright;
        # the session helper reads nanos as long and converts to
        # timestamp_ntz (µs), and is a plain parquet read otherwise.
        # Options apply regardless — the nanos path must not depend on
        # unrelated reader options.
        from stepist_spark.session import read_parquet_nanos_safe

        return read_parquet_nanos_safe(spark, path_or_format, options=options)
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path_or_format)


def read_stream(
    spark: SparkSession,
    fmt: str,
    path: str | None = None,
    schema: str | Any | None = None,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Open an unbounded streaming source.

    File formats require ``path`` and ``schema``. ``rate`` needs
    neither (synthetic `timestamp,value` rows — the test/demo source).
    ``max_files_per_trigger`` caps per-micro-batch intake: declarative
    backpressure, vs. the reference's producer-side queue-length spin
    (`stepist/flow/workers/adapters/simple_queue.py:24-38`).
    """
    if fmt not in _STREAM_FORMATS:
        raise ValueError(f"unsupported stream format {fmt!r}; one of {sorted(_STREAM_FORMATS)}")
    if fmt == "kafka":
        # fail fast in the driver on a misconfigured reader — the
        # option contract is validated broker-free (sources/kafka.py)
        from stepist_spark.sources.kafka import validate_kafka_source_options

        if path is not None:
            raise ValueError("kafka stream takes options, not a path")
        validate_kafka_source_options(options)
    reader = spark.readStream.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in _BATCH_FORMATS:
        raise ValueError(f"streaming {fmt} source requires an explicit schema")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path) if path is not None else reader.load()


def _infer_format(path: str) -> str:
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if ext in _BATCH_FORMATS:
        return ext
    if ext in {"jsonl", "ndjson"}:
        return "json"
    if ext in {"tsv", "tbl"}:
        return "csv"
    return "parquet"
