"""Streaming-runtime correctness gates beyond s01's tumbling drain:
sliding windows, stream-stream interval joins, and a non-file
(rate-micro-batch) source driven through StreamFlow.

Each query EXECUTES as a real StreamingQuery (micro-batches, state
store, sink) and must hash-match a batch SQL oracle — certifying the
streaming machinery itself, not just the window expression:

- s02: overlapping event-time windows (every event lands in
  duration/slide windows) computed by the streaming engine in complete
  mode equals the batch grid oracle.
- s03: a stream-stream inner interval join — the state-store-buffered
  join with watermark eviction bounds — equals the batch range join.
- s04: the reference's queue-consumption path
  (`stepist/flow/libs/simple_queue.py:15-47` BRPOP loop) mapped to a
  generated non-file source: rate-micro-batch emits a deterministic
  (timestamp, value) grid (batch b carries values [b*R, (b+1)*R) all
  stamped startTimestamp + b*advance), so a windowed rollup over it
  has a closed-form oracle with no input table at all. rowsPerBatch is
  the per-trigger intake bound — the backpressure knob of a generated
  source, like maxFilesPerTrigger for files.
"""

from __future__ import annotations

import itertools
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stepist_spark.queries import QuerySpec

_SINK_IDS = itertools.count()

def _events_stream(spark: SparkSession, sf: str) -> DataFrame:
    """File-source stream over the events table — footer-aware ts
    handling (NANOS-as-long vs native µs) via session.stream_events."""
    from stepist_spark.session import stream_events

    return stream_events(spark, sf)


# --------------------------------------------------------------------------
# s02 — sliding event-time windows computed BY THE STREAMING RUNTIME
# (2-hour windows advancing hourly: every event lands in 2 windows).
def s02_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.streaming.runtime import await_drained, stream_shuffle_partitions
    from stepist_spark.streaming.windows import sliding_agg

    agg = sliding_agg(
        _events_stream(spark, sf),
        "ts",
        "2 hours",
        "1 hour",
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
        group_by=["event_type"],
    )
    sink = f"s02_sink_{next(_SINK_IDS)}"
    with stream_shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        await_drained(q, 300)
    return spark.table(sink)


# Epoch-aligned 2h/1h sliding windows = the two hour-truncated starts
# (k ∈ {0,1}) whose [start, start+2h) covers the event.
S02_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
       ws AS window_start, ws + INTERVAL 2 HOUR AS window_end
FROM (
    SELECT event_type, value,
           date_trunc('hour', ts::TIMESTAMP) - k * INTERVAL 1 HOUR AS ws
    FROM events, (SELECT unnest([0, 1]) AS k)
)
GROUP BY event_type, ws
"""


# --------------------------------------------------------------------------
# s03 — stream-stream inner interval join: purchases joined to signups
# within the 6 hours before each purchase. Both sides are unbounded
# streams buffered in the state store; the watermark + event-time range
# bound state eviction (streaming/joins.py).
def s03_stream_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.streaming.joins import interval_join
    from stepist_spark.streaming.runtime import await_drained, stream_shuffle_partitions

    # withWatermark demands TIMESTAMP (ltz) event time; the session tz
    # is UTC, so casting the ntz column preserves the wall clock.
    # The user_id % 4 cohort bounds buffered state (the gate certifies
    # the join machinery, not full-corpus throughput — r01 subsets the
    # same way); both sides and the oracle share the predicate.
    purchases = (
        _events_stream(spark, sf)
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") % 4 == 0))
        .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("p_ts"), "value")
    )
    signups = (
        _events_stream(spark, sf)
        .filter((F.col("event_type") == "signup") & (F.col("user_id") % 4 == 0))
        .select("user_id", F.col("ts").cast("timestamp").alias("s_ts"))
    )
    joined = interval_join(
        purchases,
        signups,
        on="user_id",
        left_ts="p_ts",
        right_ts="s_ts",
        lower="6 hours",
        upper="0 seconds",
        watermark="6 hours",
    )
    out = joined.select(
        "event_id", "user_id", "p_ts", "s_ts", F.round("value", 2).alias("value")
    )
    sink = f"s03_sink_{next(_SINK_IDS)}"
    with stream_shuffle_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_drained(q, 300)
    return spark.table(sink)


S03_SQL = """
WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS p_ts, value
           FROM events WHERE event_type = 'purchase' AND user_id % 4 = 0),
     s AS (SELECT user_id, ts::TIMESTAMP AS s_ts
           FROM events WHERE event_type = 'signup' AND user_id % 4 = 0)
SELECT p.event_id, p.user_id, p.p_ts, s.s_ts, round(p.value, 2) AS value
FROM p JOIN s ON s.user_id = p.user_id
   AND s.s_ts >= p.p_ts - INTERVAL 6 HOUR AND s.s_ts <= p.p_ts
"""


# --------------------------------------------------------------------------
# s04 — non-file streaming source through StreamFlow: rate-micro-batch
# emits a deterministic grid; the flow filters to 3 batches' worth of
# rows, windows them (2-minute tumbling) per value%3 key, and drains in
# complete mode once all 600 rows are accounted for. The oracle is
# closed-form integer arithmetic — no input table. (3 × 200-row batches
# still certify the multi-trigger loop; each extra trigger costs a full
# state commit round, so the gate doesn't buy coverage with more.)
def s04_rate_windows(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.streaming import StreamFlow
    from stepist_spark.streaming.runtime import await_drained, stream_shuffle_partitions
    from stepist_spark.streaming.windows import tumbling_agg

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 200)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 60000)
        .option("numPartitions", 2)
        .load()
    )

    def xform(df: DataFrame) -> DataFrame:
        bounded = df.filter(F.col("value") < 600).select(
            (F.col("value") % 3).cast("bigint").alias("k"),
            F.col("value"),
            F.col("timestamp").cast("timestamp_ntz").alias("ts"),
        )
        return tumbling_agg(
            bounded,
            "ts",
            "2 minutes",
            [F.count(F.lit(1)).alias("n"), F.sum("value").cast("bigint").alias("sum_value")],
            group_by=["k"],
        )

    flow = StreamFlow(src, xform)
    sink = f"s04_sink_{next(_SINK_IDS)}"
    with stream_shuffle_partitions(spark, 4):
        flow.to_memory(sink, output_mode="complete", trigger={"processingTime": "0 seconds"})
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                total = spark.table(sink).agg(F.sum("n")).collect()[0][0]
            except Exception:
                total = None
            if total == 600:
                break
            time.sleep(0.1)
    flow.stop()
    return spark.table(sink)


S04_SQL = """
SELECT CAST(value % 3 AS BIGINT) AS k, count(*) AS n,
       CAST(sum(value) AS BIGINT) AS sum_value,
       epoch_ms((((value // 200) * 60000) // 120000) * 120000) AS window_start,
       epoch_ms(((((value // 200) * 60000) // 120000) * 120000) + 120000) AS window_end
FROM (SELECT unnest(generate_series(0, 599)) AS value)
GROUP BY 1, 4, 5
"""


# --------------------------------------------------------------------------
# s05 — STREAMING deduplication end-to-end: the events file stream
# unioned with ITSELF (every row arrives exactly twice — deterministic
# planted duplicates, no synthetic table) flows through
# streaming.stream_dedup (dropDuplicates state) into an append-mode
# memory sink. The sink must hold each event exactly once — without
# the dedup the row count would be 2×, so the oracle (plain events)
# discriminates. Certifies reference operator #10's dedup half (the
# reference re-pushes on failure and relies on consumer idempotence;
# here exactly-once is engine state).
def s05_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.streaming.dedup import stream_dedup
    from stepist_spark.streaming.runtime import await_drained, stream_shuffle_partitions

    src = _events_stream(spark, sf)
    doubled = src.unionByName(src)
    deduped = stream_dedup(doubled, ["event_id"]).select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value")
    )
    sink = f"s05_sink_{next(_SINK_IDS)}"
    with stream_shuffle_partitions(spark, 8):
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_drained(q, 300)
    return spark.table(sink)


S05_SQL = """
SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type,
       round(value, 2) AS value
FROM events
"""


QUERIES = [
    QuerySpec("s02_sliding_window", s02_sliding_window, S02_SQL, "streaming sliding windows vs batch grid oracle"),
    QuerySpec("s03_stream_interval_join", s03_stream_interval_join, S03_SQL, "stream-stream interval join vs batch range join"),
    QuerySpec("s04_rate_windows", s04_rate_windows, S04_SQL, "rate-micro-batch source through StreamFlow, closed-form oracle"),
    QuerySpec("s05_stream_dedup", s05_stream_dedup, S05_SQL, "streaming dedup: self-unioned stream lands exactly once"),
]
