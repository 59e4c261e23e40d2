"""Structured Streaming runtime — the analog of the reference's
distributed worker execution.

In the reference, "streaming" means: a producer LPUSHes job dicts to a
per-step Redis list (`stepist/flow/steps/step.py:125-133`), worker
processes BRPOP-loop forever (`stepist/flow/libs/simple_queue.py:15-47`),
retry is re-push (at-least-once), backpressure is a producer-side
queue-length spin, and fan-in is a Redis count-barrier with a 30s TTL
that silently drops incomplete groups
(`stepist/flow/workers/reducer_engine.py:21-80`).

Here the same capabilities are Structured Streaming:

- queue hop            → micro-batch boundary (``readStream``/``writeStream``)
- worker loop          → ``StreamFlow`` (a running StreamingQuery)
- at-least-once retry  → checkpointed exactly-once
- backpressure         → ``maxFilesPerTrigger``/``maxOffsetsPerTrigger``
- ``die_when_empty``   → ``availableNow`` trigger (drain and stop)
- count-barrier w/ TTL → ``barrier_reduce`` (stateful, real timeouts)
- event-time windows   → ``windowed_agg``/``session_agg`` (+watermark),
                         which the reference cannot express at all
- grouped leaders      → ``stream_topk`` (O(k) state per key, RocksDB
                         provider ready)
"""

from stepist_spark.streaming.barrier import barrier_reduce
from stepist_spark.streaming.dedup import stream_dedup
from stepist_spark.streaming.incremental import dedup_against_history
from stepist_spark.streaming.joins import interval_join
from stepist_spark.streaming.runtime import StreamFlow
from stepist_spark.streaming.topk import latest_topk, stream_topk
from stepist_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg

__all__ = [
    "StreamFlow",
    "barrier_reduce",
    "dedup_against_history",
    "interval_join",
    "latest_topk",
    "stream_dedup",
    "stream_topk",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
]
