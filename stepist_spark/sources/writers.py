"""Batch and streaming writers.

Replaces the reference's enqueue path (`stepist/flow/steps/
step.py:125-145` → Redis LPUSH `stepist/flow/libs/simple_queue.py:49-60`)
with declarative sinks. The batch writer exposes the two layout levers
that matter at 100 TB — ``partition_by`` (directory partitioning →
partition pruning on read) and ``bucket_by`` (pre-shuffled layout →
shuffle-free joins/aggs on the bucket key); the streaming writer wires
checkpointing (exactly-once, the principled upgrade of the reference's
at-least-once re-push, `stepist/flow/libs/simple_queue.py:42-47`).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: str | Sequence[str] | None = None,
    bucket_by: tuple[int, str | Sequence[str]] | None = None,
    sort_by: str | Sequence[str] | None = None,
    table: str | None = None,
    **options: str,
) -> None:
    """Write a DataFrame to a file sink.

    ``partition_by``: hive-style directory partitioning; readers prune
    whole directories when filtering on these columns. Keep cardinality
    moderate (dates, regions) — millions of tiny partitions is the
    classic 100 TB anti-pattern.

    ``bucket_by=(n, cols)``: pre-shuffle the data into n buckets by
    cols (requires ``table``; Spark bucketing is table-metadata-bound).
    Two tables bucketed the same way join WITHOUT a shuffle — the
    at-scale answer for repeated joins on the same key.
    """
    if sort_by and not bucket_by:
        # Spark's writer-level sortBy exists only with bucketing; honor
        # the intent (sorted-within-file layout) instead of silently
        # dropping it
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        df = df.sortWithinPartitions(*scols)
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    if bucket_by:
        n, bcols = bucket_by
        bcols = [bcols] if isinstance(bcols, str) else list(bcols)
        if table is None:
            raise ValueError("bucket_by requires a table name (saveAsTable)")
        writer = writer.bucketBy(n, *bcols)
        if sort_by:
            scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
            writer = writer.sortBy(*scols)
        writer.option("path", path).saveAsTable(table)
        return
    writer.save(path)


def write_stream(
    df: DataFrame,
    checkpoint: str,
    path: str | None = None,
    fmt: str = "parquet",
    output_mode: str = "append",
    trigger: dict | None = None,
    query_name: str | None = None,
    foreach_batch: Callable[[DataFrame, int], None] | None = None,
    **options: str,
) -> StreamingQuery:
    """Start a streaming sink; returns the live StreamingQuery.

    ``checkpoint`` is mandatory: with it, Structured Streaming gives
    exactly-once file-sink semantics across restarts — the upgrade over
    the reference's re-LPUSH-on-error at-least-once retry
    (`stepist/flow/libs/simple_queue.py:42-47`), which can hot-loop on a
    poison record.

    ``foreach_batch``: per-micro-batch callable ``(df, epoch_id)`` —
    the general fan-out hook (the streaming Hub: one micro-batch, N
    writers). ``trigger``: e.g. ``{"processingTime": "10 seconds"}``,
    ``{"availableNow": True}`` (drain-and-stop, the analog of the
    reference's ``die_when_empty``, `simple_queue.py:34-36`).
    """
    if fmt == "kafka":
        # fail fast on a sink frame/option misconfiguration — the
        # contract is validated broker-free (sources/kafka.py)
        from stepist_spark.sources.kafka import (
            validate_kafka_sink_frame,
        )

        if path is not None:
            raise ValueError("kafka sink takes a 'topic' option, not a path")
        if not str(options.get("kafka.bootstrap.servers", "")).strip():
            raise ValueError(
                "kafka sink requires the 'kafka.bootstrap.servers' option "
                "(build options with kafka_sink_options())"
            )
        validate_kafka_sink_frame(df, options)
    writer = (
        df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .options(**options)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    if foreach_batch is not None:
        return writer.foreachBatch(foreach_batch).start()
    writer = writer.format(fmt)
    return writer.start(path) if path is not None else writer.start()
