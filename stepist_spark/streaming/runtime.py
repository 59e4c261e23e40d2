"""StreamFlow: run a Pipeline over an unbounded source.

The replacement for the reference's ``app.run(steps)`` worker loop
(`stepist/app.py:56-63` → `stepist/flow/libs/simple_queue.py:15-47`).
One StreamFlow = one StreamingQuery; parallelism comes from Spark
tasks, not ``just_do_it(n)`` OS processes
(`stepist/workers/__init__.py:10-19`).
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from stepist_spark.pipeline import Pipeline, Step


def await_drained(q: StreamingQuery, timeout: float = 300.0) -> None:
    """``awaitTermination`` that FAILS LOUDLY on timeout.

    ``awaitTermination(t)`` returns False when the query is still
    running at the deadline; ignoring that reads a partially-filled
    sink and reports a spurious data mismatch instead of the real
    problem. Here: stop the query and raise."""
    done = q.awaitTermination(timeout)
    if not done:
        try:
            q.stop()
        finally:
            raise TimeoutError(
                f"streaming query {q.name or q.id} did not terminate "
                f"within {timeout}s (last progress: {q.lastProgress})"
            )


#: provider name -> Spark state-store provider class. "hdfs" is
#: Spark's default in-JVM-heap map (fine for test-scale state);
#: "rocksdb" is the bundled RocksDB provider — off-heap + on-disk, the
#: scale path once interval-join/dedup state outgrows executor heap
#: (at 100 TB the in-memory provider is the first streaming OOM).
STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
}

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@contextmanager
def state_store_provider(spark: SparkSession, provider: str | None):
    """Temporarily select the state-store provider while a streaming
    query STARTS. Like the shuffle-partition count, the provider is
    fixed per query at its first micro-batch and recorded in the
    checkpoint — restarting an existing checkpoint under a different
    provider is an error Spark itself raises, so set this BEFORE the
    first start, not mid-flight."""
    if provider is None:
        yield
        return
    try:
        cls = STATE_STORE_PROVIDERS[provider]
    except KeyError:
        raise ValueError(
            f"unknown state_store {provider!r}; one of {sorted(STATE_STORE_PROVIDERS)}"
        ) from None
    old = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, cls)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old)


@contextmanager
def stream_shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily set ``spark.sql.shuffle.partitions`` while a
    streaming query STARTS (the value at the first micro-batch fixes
    the state-store partition count for the query's whole life — it is
    recorded in the checkpoint and cannot change later).

    Stateful operators pay a per-trigger commit per state partition,
    so a small-state query behind 32 default partitions spends most of
    each micro-batch on empty-partition commits. Size this to expected
    state volume: a handful for test-scale gates, hundreds for a real
    100 TB keyspace. Batch queries are unaffected (AQE re-coalesces).
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


class StreamFlow:
    """Wire an unbounded DataFrame through a pipeline into a sink.

    ``pipeline`` may be a ``Pipeline``, a single ``Step``, or any
    ``DataFrame -> DataFrame`` callable — the same composition surface
    as batch, applied per-micro-batch by the engine (NOT per-record:
    the reference processes one dict per BRPOP round-trip,
    `simple_queue.py:62-77`; a micro-batch amortizes scheduling over
    thousands of rows).

    Sinks:
    - ``to_memory(name)``   — queryable in-session table (tests/demos)
    - ``to_files(path,...)``— checkpointed exactly-once file sink
    - ``to_foreach_batch(fn)`` — arbitrary fan-out ``(df, epoch_id)``;
      the streaming Hub: write one micro-batch to N destinations
    - ``drain()``           — availableNow: process backlog, then stop
      (the reference's ``die_when_empty``, `simple_queue.py:34-36`)
    """

    def __init__(
        self,
        source: DataFrame,
        pipeline: Pipeline | Step | Callable[[DataFrame], DataFrame] | None = None,
        state_store: str | None = None,
    ):
        if not source.isStreaming:
            raise ValueError("StreamFlow needs a streaming DataFrame (spark.readStream)")
        if state_store is not None and state_store not in STATE_STORE_PROVIDERS:
            raise ValueError(
                f"unknown state_store {state_store!r}; "
                f"one of {sorted(STATE_STORE_PROVIDERS)}"
            )
        self.source = source
        self.pipeline = pipeline
        self.state_store = state_store
        self._query: StreamingQuery | None = None

    def _start(self, writer) -> StreamingQuery:
        """Start a configured writer under this flow's state-store
        provider (a start-time session conf, captured per query)."""
        with state_store_provider(self.source.sparkSession, self.state_store):
            return writer()

    def _transformed(self) -> DataFrame:
        p = self.pipeline
        if p is None:
            return self.source
        if isinstance(p, Pipeline):
            return p.run(self.source)
        if isinstance(p, Step):
            return p.transform(self.source)
        return p(self.source)

    # -- sinks ------------------------------------------------------------
    def to_memory(
        self,
        name: str,
        output_mode: str = "append",
        trigger: dict[str, Any] | None = None,
    ) -> StreamingQuery:
        self._query = self._start(
            self._transformed()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(**(trigger or {"availableNow": True}))
            .start
        )
        return self._query

    def to_files(
        self,
        path: str,
        checkpoint: str,
        fmt: str = "parquet",
        output_mode: str = "append",
        trigger: dict[str, Any] | None = None,
        **options: str,
    ) -> StreamingQuery:
        writer = (
            self._transformed()
            .writeStream.format(fmt)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
            .options(**options)
        )
        if trigger:
            writer = writer.trigger(**trigger)
        self._query = self._start(lambda: writer.start(path))
        return self._query

    def to_foreach_batch(
        self,
        fn: Callable[[DataFrame, int], None],
        checkpoint: str,
        trigger: dict[str, Any] | None = None,
    ) -> StreamingQuery:
        writer = (
            self._transformed()
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", checkpoint)
        )
        if trigger:
            writer = writer.trigger(**trigger)
        self._query = self._start(writer.start)
        return self._query

    # -- lifecycle ----------------------------------------------------------
    def drain(self, sink_name: str, output_mode: str = "append", timeout: float = 120.0) -> None:
        """Process everything currently available into a memory sink,
        then stop — batch-mode termination for a streaming flow."""
        q = self.to_memory(sink_name, output_mode=output_mode, trigger={"availableNow": True})
        await_drained(q, timeout)

    @property
    def query(self) -> StreamingQuery | None:
        return self._query

    def status(self) -> dict:
        """Progress introspection — the analog of the reference's
        ``jobs_count``/``monitor_steps`` (`stepist/flow/steps/
        step.py:154-164`, `adapters/simple_queue.py:69-88`)."""
        if self._query is None:
            return {"active": False}
        lp = self._query.lastProgress
        total_in = None
        try:
            rp = self._query.recentProgress or []
            total_in = sum(int(p.get("numInputRows") or 0) for p in rp)
        except Exception:
            pass
        # state-store rollup (round-10 verdict #4): rows/memory across
        # the query's stateful operators from the LAST progress — the
        # numbers that say whether interval-join/dedup state is growing
        # toward the provider's limit (pair with state_store="rocksdb"
        # once they outgrow executor heap)
        so = (lp or {}).get("stateOperators") or []
        return {
            "active": self._query.isActive,
            "status": self._query.status,
            "rows_per_sec": (lp or {}).get("processedRowsPerSecond"),
            "batch_id": (lp or {}).get("batchId"),
            "input_rows": total_in,
            "state_rows": sum(int(s.get("numRowsTotal") or 0) for s in so) if so else None,
            "state_rows_updated": (
                sum(int(s.get("numRowsUpdated") or 0) for s in so) if so else None
            ),
            "state_memory_bytes": (
                sum(int(s.get("memoryUsedBytes") or 0) for s in so) if so else None
            ),
        }

    def stop(self) -> None:
        if self._query is not None and self._query.isActive:
            self._query.stop()
