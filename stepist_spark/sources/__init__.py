"""Sources & sinks — the engine's IO layer.

The reference's only sources/sinks are message queues (Redis list
`stepist/flow/libs/simple_queue.py:62-77`, RabbitMQ
`stepist/flow/workers/adapters/rm_queue.py:56-64`, SQS
`stepist/flow/workers/adapters/sqs_queue.py:46-72`) plus the in-memory
FlowResult. Here the batch surface is file formats (parquet/csv/json/
orc) and the streaming surface is Structured Streaming sources — the
principled replacement for queue consumption (see
``stepist_spark.streaming``).

Everything is a thin declarative wrapper: reads stay lazy so Catalyst
pushes filters/projection into the scan; writes expose partitioning and
bucketing because at 100 TB layout IS the performance model.
"""

from stepist_spark.sources.envelope import envelope_schema, from_envelope, to_envelope
from stepist_spark.sources.fixedwidth import read_fixed_width, write_fixed_width
from stepist_spark.sources.kafka import kafka_sink_options, kafka_source_options
from stepist_spark.sources.readers import read, read_stream
from stepist_spark.sources.writers import write, write_stream

__all__ = [
    "envelope_schema",
    "from_envelope",
    "kafka_sink_options",
    "kafka_source_options",
    "read",
    "read_fixed_width",
    "read_stream",
    "to_envelope",
    "write",
    "write_fixed_width",
    "write_stream",
]
