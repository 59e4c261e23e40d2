"""Kafka source/sink option contracts — validated broker-free.

The reference's deployments run over live brokers (Redis/RabbitMQ/SQS:
`stepist/flow/libs/simple_queue.py:49-77`, `rm_queue.py:30-54`,
`sqs_queue.py:27-44`); the Spark analog is the kafka connector
(`readStream.format("kafka")`). Neither a broker nor the connector JAR
exists in the test sandbox, so what CAN be certified here is the
option contract — which combinations Spark's kafka source accepts —
encoded as build-time validation: a misconfigured reader fails fast in
the driver with a precise message instead of minutes later on the
cluster with a connector stack trace.

Contract source (public Spark docs, Structured Streaming + Kafka
integration guide): a source needs ``kafka.bootstrap.servers`` and
EXACTLY ONE of ``subscribe`` (topic list), ``subscribePattern``
(regex), or ``assign`` (JSON topic→partitions map); a sink needs
``kafka.bootstrap.servers`` and either a ``topic`` option or a
``topic`` column in the frame. All option values are strings — Spark's
DataSourceOptions are a string map.
"""

from __future__ import annotations

#: Exactly one of these selects what a kafka SOURCE reads.
SUBSCRIBE_MODES = ("subscribe", "subscribePattern", "assign")


def kafka_source_options(
    bootstrap_servers: str,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    assign: str | None = None,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    max_offsets_per_trigger: int | None = None,
    **extra: str,
) -> dict[str, str]:
    """Validated option map for ``read_stream(spark, "kafka", **opts)``.

    ``max_offsets_per_trigger`` is the kafka twin of the file source's
    ``maxFilesPerTrigger`` backpressure cap (the reference's
    ``jobs_limit`` analog). ``fail_on_data_loss=False`` matches the
    at-least-once posture of the reference's queue retry loop —
    expired/compacted offsets log and continue instead of killing the
    stream. Everything in ``extra`` passes through verbatim (consumer
    properties use the ``kafka.`` prefix per the integration guide).
    """
    if not bootstrap_servers or not str(bootstrap_servers).strip():
        raise ValueError("kafka source requires non-empty bootstrap_servers")
    chosen = {
        "subscribe": subscribe,
        "subscribePattern": subscribe_pattern,
        "assign": assign,
    }
    picked = [k for k, v in chosen.items() if v is not None]
    if len(picked) != 1:
        raise ValueError(
            f"kafka source requires exactly one of {SUBSCRIBE_MODES}, got {picked or 'none'}"
        )
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": str(bootstrap_servers),
        picked[0]: str(chosen[picked[0]]),
        "startingOffsets": str(starting_offsets),
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        if int(max_offsets_per_trigger) <= 0:
            raise ValueError("max_offsets_per_trigger must be positive")
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    for k, v in extra.items():
        opts[k] = str(v)
    return opts


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str | None = None,
    **extra: str,
) -> dict[str, str]:
    """Validated option map for ``write_stream(df, ..., fmt="kafka",
    **opts)``. ``topic=None`` is legal ONLY when the frame carries a
    ``topic`` column (per-row routing) — the caller owns that check;
    the frame must also carry a ``value`` column (and optionally
    ``key``), which :func:`validate_kafka_sink_frame` asserts."""
    if not bootstrap_servers or not str(bootstrap_servers).strip():
        raise ValueError("kafka sink requires non-empty bootstrap_servers")
    opts: dict[str, str] = {"kafka.bootstrap.servers": str(bootstrap_servers)}
    if topic is not None:
        if not str(topic).strip():
            raise ValueError("kafka sink topic must be non-empty when given")
        opts["topic"] = str(topic)
    for k, v in extra.items():
        opts[k] = str(v)
    return opts


def validate_kafka_source_options(options: dict) -> None:
    """The check :func:`stepist_spark.sources.read_stream` runs for
    ``fmt="kafka"`` — also callable on a hand-built option dict."""
    if not str(options.get("kafka.bootstrap.servers", "")).strip():
        raise ValueError(
            "kafka stream requires the 'kafka.bootstrap.servers' option "
            "(build options with kafka_source_options())"
        )
    picked = [m for m in SUBSCRIBE_MODES if m in options]
    if len(picked) != 1:
        raise ValueError(
            f"kafka stream requires exactly one of {SUBSCRIBE_MODES}, got {picked or 'none'}"
        )


def validate_kafka_sink_frame(df, options: dict) -> None:
    """Schema contract for a kafka SINK frame: a ``value`` column is
    mandatory; ``topic`` must come from either the options or a column
    (exactly one source of truth is required to exist)."""
    cols = set(df.columns)
    if "value" not in cols:
        raise ValueError("kafka sink frame must carry a 'value' column")
    if "topic" not in options and "topic" not in cols:
        raise ValueError(
            "kafka sink needs a 'topic' option or a 'topic' column on the frame"
        )
