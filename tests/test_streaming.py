"""Streaming runtime tests: StreamFlow wiring, the count-barrier with
TTL-drop semantics, and event-time windows — the reference behaviors
being reproduced are the worker loop (`stepist/flow/libs/
simple_queue.py:15-47`), the Redis count-barrier
(`stepist/flow/workers/reducer_engine.py:21-80`), and (new capability)
watermarked windows.

All tests use file sources with availableNow triggers — deterministic
drain-and-stop, no wall-clock flakiness.
"""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from stepist_spark.pipeline import Pipeline
from stepist_spark.sources import read_stream
from stepist_spark.streaming import StreamFlow, barrier_reduce, session_agg, sliding_agg, tumbling_agg


@pytest.fixture
def jobs_dir(spark, tmp_path):
    """A file-source 'queue': each JSON file is a batch of enqueued jobs."""
    d = tmp_path / "jobs"
    d.mkdir()
    rows = [
        {"hub_job_id": "job-a:3", "branch": "b1", "value": 1},
        {"hub_job_id": "job-a:3", "branch": "b2", "value": 2},
        {"hub_job_id": "job-a:3", "branch": "b3", "value": 3},
        {"hub_job_id": "job-b:2", "branch": "b1", "value": 10},
        # job-b is incomplete: only 1 of 2 branches ever arrives
    ]
    (d / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(d)


JOBS_SCHEMA = "hub_job_id STRING, branch STRING, value LONG"


def _drain(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive


class TestStreamFlow:
    def test_pipeline_over_file_source(self, spark, jobs_dir):
        src = read_stream(spark, "json", jobs_dir, schema=JOBS_SCHEMA)
        pipe = Pipeline().add(lambda df: df.filter(F.col("value") > 1), name="filt")
        flow = StreamFlow(src, pipe)
        q = flow.to_memory("t_filtered")
        _drain(q)
        got = {r["value"] for r in spark.sql("SELECT value FROM t_filtered").collect()}
        assert got == {2, 3, 10}

    def test_rejects_batch_df(self, spark):
        with pytest.raises(ValueError, match="streaming"):
            StreamFlow(spark.range(3))

    def test_foreach_batch_fanout(self, spark, jobs_dir, tmp_path):
        """The streaming Hub: one micro-batch, two destinations."""
        src = read_stream(spark, "json", jobs_dir, schema=JOBS_SCHEMA)
        out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")

        def fan(df, epoch_id):
            df.filter(F.col("value") >= 3).write.mode("append").parquet(out_a)
            df.groupBy("hub_job_id").agg(F.sum("value").alias("s")).write.mode(
                "append"
            ).parquet(out_b)

        flow = StreamFlow(src)
        q = flow.to_foreach_batch(fan, checkpoint=str(tmp_path / "ckpt"), trigger={"availableNow": True})
        _drain(q)
        assert {r["value"] for r in spark.read.parquet(out_a).collect()} == {3, 10}
        sums = {r["hub_job_id"]: r["s"] for r in spark.read.parquet(out_b).collect()}
        assert sums == {"job-a:3": 6, "job-b:2": 10}

    def test_file_sink_exactly_once_restart(self, spark, jobs_dir, tmp_path):
        """Re-running with the same checkpoint must not duplicate rows —
        the exactly-once upgrade over the reference's re-push retry."""
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        for _ in range(2):
            src = read_stream(spark, "json", jobs_dir, schema=JOBS_SCHEMA)
            q = StreamFlow(src).to_files(
                out, checkpoint=ckpt, trigger={"availableNow": True}
            )
            _drain(q)
        assert spark.read.parquet(out).count() == 4

    def test_status_introspection(self, spark, jobs_dir):
        src = read_stream(spark, "json", jobs_dir, schema=JOBS_SCHEMA)
        flow = StreamFlow(src)
        assert flow.status() == {"active": False}
        q = flow.to_memory("t_status")
        _drain(q)
        assert flow.status()["active"] is False


class TestBarrierReduce:
    @staticmethod
    def _run_until_rows(spark, out, name, min_rows=1, timeout=60):
        """Stateful queries with pending processing-time timeouts never
        self-terminate under availableNow (Spark keeps scheduling
        batches to fire the timeouts) — so poll the sink, then stop."""
        q = (
            out.writeStream.format("memory").queryName(name).outputMode("append")
            .trigger(processingTime="500 milliseconds").start()
        )
        try:
            deadline = time.time() + timeout
            while time.time() < deadline:
                if spark.sql(f"SELECT * FROM {name}").count() >= min_rows:
                    break
                time.sleep(0.5)
            return spark.sql(f"SELECT * FROM {name}").collect()
        finally:
            q.stop()

    def test_complete_group_fires_incomplete_never(self, spark, jobs_dir):
        src = read_stream(spark, "json", jobs_dir, schema=JOBS_SCHEMA)
        # N parsed from the key suffix ("job-a:3" -> 3), per the
        # reference's Hub encoding. TTL generous: completeness, not
        # expiry, decides within this single micro-batch.
        out = barrier_reduce(src, ttl_sec=300)
        rows = self._run_until_rows(spark, out, "t_barrier")
        assert len(rows) == 1  # job-a fired once; job-b never (incomplete)
        (r,) = rows
        assert r["group_key"] == "job-a:3" and r["n"] == 3
        payloads = sorted(json.loads(j)["value"] for j in r["job_list"])
        assert payloads == [1, 2, 3]

    def test_reduce_fn_applied_in_state(self, spark, jobs_dir):
        src = read_stream(spark, "json", jobs_dir, schema=JOBS_SCHEMA)
        out = barrier_reduce(
            src,
            ttl_sec=300,
            reduce_fn=lambda key, rows: {"total": sum(r["value"] for r in rows)},
        )
        (r,) = self._run_until_rows(spark, out, "t_reduced")
        assert json.loads(r["job_list"][0]) == {"total": 6}

    @staticmethod
    def _await_batch(q, pred, timeout=90):
        """Poll recentProgress until some batch satisfies ``pred``; return
        that progress dict. Load-robust: no assumption about how long any
        individual micro-batch takes on a contended host."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            for p in q.recentProgress or []:
                if p and pred(p):
                    return p
            if not q.isActive:
                q.awaitTermination(5)  # surface the query's exception
                raise AssertionError("query died before a matching batch")
            time.sleep(0.2)
        raise AssertionError("no matching micro-batch within timeout")

    def test_ttl_drops_incomplete_group(self, spark, tmp_path):
        """A group whose members arrive in batch 1 but never complete is
        dropped after the TTL: later micro-batches emit nothing for it.

        Progress-polled, not sleep-timed (the blind sleep version flaked
        under host load): we wait for the batch that INGESTED the first
        member, then for an EMPTY batch that STARTED at least TTL later —
        the state-store timeout sweep runs on batch boundaries, so that
        empty batch proves the group was evaluated past its deadline."""
        d = tmp_path / "jobs"
        d.mkdir()
        (d / "b0.json").write_text(json.dumps({"hub_job_id": "late:2", "branch": "b1", "value": 1}))
        src = read_stream(spark, "json", str(d), schema=JOBS_SCHEMA, maxFilesPerTrigger=1)
        ttl = 1
        out = barrier_reduce(src, ttl_sec=ttl)
        ckpt = str(tmp_path / "ckpt")
        q = (
            out.writeStream.format("memory").queryName("t_ttl").outputMode("append")
            .option("checkpointLocation", ckpt).trigger(processingTime="200 milliseconds").start()
        )
        try:
            p1 = self._await_batch(q, lambda p: p.get("numInputRows", 0) >= 1)
            expiry = time.time() + ttl + 0.5  # first member is in state NOW
            while time.time() < expiry:
                time.sleep(0.1)
            # note the latest batch id, then wait for an empty batch that
            # starts strictly after it — that batch ran wholly past the TTL
            seen = max(
                (p["batchId"] for p in q.recentProgress or []), default=p1["batchId"]
            )
            self._await_batch(
                q,
                lambda p: p["batchId"] > seen and p.get("numInputRows", 0) == 0,
            )
            # second member arrives AFTER expiry: state was dropped, so
            # the count restarts at 1 and the barrier still never fires
            (d / "b1.json").write_text(
                json.dumps({"hub_job_id": "late:2", "branch": "b2", "value": 2})
            )
            p2 = self._await_batch(q, lambda p: p.get("numInputRows", 0) >= 1 and p["batchId"] > seen)
            # one more completed batch after the ingest, so any (wrong)
            # barrier emission would have landed in the sink by now
            self._await_batch(q, lambda p: p["batchId"] > p2["batchId"])
            assert spark.sql("SELECT * FROM t_ttl").count() == 0
        finally:
            q.stop()

    def test_batch_df_rejected(self, spark):
        with pytest.raises(ValueError, match="batch"):
            barrier_reduce(spark.range(3), group_key="id")


class TestEventTimeWindows:
    def _events(self, spark, streaming, tmp_path):
        rows = [
            {"ts": "2024-01-01 00:00:10", "user": "u1", "v": 1},
            {"ts": "2024-01-01 00:00:50", "user": "u1", "v": 2},
            {"ts": "2024-01-01 00:01:10", "user": "u2", "v": 3},
            {"ts": "2024-01-01 00:05:00", "user": "u1", "v": 4},
        ]
        if not streaming:
            df = spark.createDataFrame([tuple(r.values()) for r in rows], "ts STRING, user STRING, v LONG")
            return df.withColumn("ts", F.to_timestamp("ts"))
        d = tmp_path / "ev"
        d.mkdir()
        (d / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
        df = read_stream(spark, "json", str(d), schema="ts STRING, user STRING, v LONG")
        return df.withColumn("ts", F.to_timestamp("ts"))

    def test_tumbling_stream_matches_batch(self, spark, tmp_path):
        aggs = [F.sum("v").alias("total")]
        batch = tumbling_agg(self._events(spark, False, tmp_path), "ts", "1 minute", aggs)
        stream = tumbling_agg(
            self._events(spark, True, tmp_path), "ts", "1 minute", aggs, watermark="10 minutes"
        )
        q = stream.writeStream.format("memory").queryName("t_tumble").outputMode(
            "complete"
        ).trigger(availableNow=True).start()
        _drain(q)
        got = {(str(r["window_start"]), r["total"]) for r in spark.sql("SELECT * FROM t_tumble").collect()}
        want = {(str(r["window_start"]), r["total"]) for r in batch.collect()}
        assert got == want == {
            ("2024-01-01 00:00:00", 3),
            ("2024-01-01 00:01:00", 3),
            ("2024-01-01 00:05:00", 4),
        }

    def test_sliding_batch(self, spark, tmp_path):
        df = self._events(spark, False, tmp_path)
        out = sliding_agg(df, "ts", "2 minutes", "1 minute", [F.count("*").alias("n")])
        got = {(str(r["window_start"]), r["n"]) for r in out.collect()}
        # every event is in exactly 2 overlapping windows
        assert sum(n for _, n in got) == 8

    def test_session_batch(self, spark, tmp_path):
        df = self._events(spark, False, tmp_path)
        out = session_agg(df, "ts", "2 minutes", [F.count("*").alias("n")], group_by=["user"])
        got = {(r["user"], r["n"]) for r in out.collect()}
        # u1: events at 00:10 and 00:50 merge (40s gap); 05:00 is its own session
        assert got == {("u1", 2), ("u1", 1), ("u2", 1)}


class TestStreamDedup:
    def test_exact_dedup_across_micro_batches(self, spark, tmp_path):
        """The same event_id arriving in two different micro-batches must
        surface once — cross-batch state, not per-batch distinct."""
        from stepist_spark.streaming import stream_dedup

        d = tmp_path / "ev"
        d.mkdir()
        (d / "b0.json").write_text(
            "\n".join(
                json.dumps({"event_id": i, "ts": "2024-01-01 00:00:05", "v": i}) for i in (1, 2, 3)
            )
        )
        (d / "b1.json").write_text(
            "\n".join(
                json.dumps({"event_id": i, "ts": "2024-01-01 00:00:09", "v": i * 10}) for i in (2, 3, 4)
            )
        )
        src = read_stream(
            spark, "json", str(d), schema="event_id LONG, ts STRING, v LONG", maxFilesPerTrigger=1
        ).withColumn("ts", F.to_timestamp("ts"))
        out = stream_dedup(src, "event_id", ts_col="ts", watermark="10 minutes")
        q = out.writeStream.format("memory").queryName("t_dedup").outputMode("append").trigger(
            availableNow=True
        ).start()
        _drain(q)
        rows = spark.sql("SELECT event_id FROM t_dedup").collect()
        ids = sorted(r["event_id"] for r in rows)
        assert ids == [1, 2, 3, 4], ids

    def test_batch_passthrough(self, spark):
        from stepist_spark.streaming import stream_dedup

        df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string")
        assert stream_dedup(df, "k").count() == 2


class TestMultiHopTopology:
    def test_two_hop_worker_pipeline(self, spark, tmp_path):
        """The reference's pipelined multi-hop topology (worker step
        enqueueing to the NEXT worker's queue, `stepist/flow/steps/
        step.py:125-133`): hop 1 streams the source, transforms, and
        lands parquet; hop 2 streams hop 1's output directory and
        aggregates. Two independent StreamingQueries chained by storage
        — each hop scales and checkpoints independently."""
        src_dir, mid_dir = tmp_path / "src", tmp_path / "mid"
        src_dir.mkdir()
        (src_dir / "b0.json").write_text(
            "\n".join(json.dumps({"k": i % 2, "v": i}) for i in range(10))
        )

        hop1 = StreamFlow(
            read_stream(spark, "json", str(src_dir), schema="k LONG, v LONG"),
            Pipeline().add(lambda df: df.withColumn("v2", F.col("v") * 2)),
        )
        q1 = hop1.to_files(
            str(mid_dir), checkpoint=str(tmp_path / "ck1"), trigger={"availableNow": True}
        )
        _drain(q1)

        hop2 = StreamFlow(
            read_stream(spark, "parquet", str(mid_dir), schema="k LONG, v LONG, v2 LONG"),
            Pipeline().add(lambda df: df.groupBy("k").agg(F.sum("v2").alias("total"))),
        )
        q2 = hop2.to_memory("t_hop2", output_mode="complete")
        _drain(q2)
        got = {r["k"]: r["total"] for r in spark.sql("SELECT * FROM t_hop2").collect()}
        assert got == {0: 2 * (0 + 2 + 4 + 6 + 8), 1: 2 * (1 + 3 + 5 + 7 + 9)}


class TestIncrementalDedup:
    def test_history_suppresses_across_runs(self, spark, tmp_path):
        """Documents seen in an EARLIER run (separate query, separate
        checkpoint epoch) must still be suppressed — history is a table,
        not stream state."""
        from stepist_spark.streaming.incremental import dedup_against_history

        src_dir = tmp_path / "in"
        src_dir.mkdir()
        out_dir, hist_dir, ckpt = (
            str(tmp_path / "out"), str(tmp_path / "hist"), str(tmp_path / "ck"),
        )
        schema = "doc_id LONG, text STRING"

        def run_batch(fname, rows):
            (src_dir / fname).write_text("\n".join(json.dumps(r) for r in rows))
            src = read_stream(spark, "json", str(src_dir), schema=schema)
            q = dedup_against_history(
                src, out_dir, hist_dir, ckpt, trigger={"availableNow": True}
            )
            _drain(q)

        run_batch("b0.json", [
            {"doc_id": 1, "text": "alpha"},
            {"doc_id": 2, "text": "beta"},
            {"doc_id": 3, "text": "alpha"},   # in-batch dup of 1
        ])
        run_batch("b1.json", [
            {"doc_id": 4, "text": "beta"},    # historical dup of 2
            {"doc_id": 5, "text": "gamma"},   # fresh
        ])
        kept = {r["doc_id"]: r["text"] for r in spark.read.parquet(out_dir).collect()}
        assert kept == {1: "alpha", 2: "beta", 5: "gamma"}, kept
        hist = {r["content_hash"] for r in spark.read.parquet(hist_dir).collect()}
        assert len(hist) == 3


class TestLateData:
    def test_watermark_drops_late_rows_in_append_mode(self, spark, tmp_path):
        """The principled late-data policy (vs the reference's silent
        Redis TTL expiry): once the watermark passes a window's end, a
        straggler for that window is DROPPED, and the window's result —
        emitted exactly once — does not include it."""
        d = tmp_path / "ev"
        d.mkdir()
        # batch 0: events up to 10:59 -> watermark (0s delay) reaches 10:59
        (d / "b0.json").write_text(
            "\n".join(
                json.dumps({"ts": t, "v": 1})
                for t in ["2024-01-01 10:00:10", "2024-01-01 10:59:00"]
            )
        )
        src = read_stream(
            spark, "json", str(d), schema="ts STRING, v LONG", maxFilesPerTrigger=1
        ).withColumn("ts", F.to_timestamp("ts"))
        agg = tumbling_agg(src, "ts", "30 minutes", [F.sum("v").alias("n")], watermark="0 seconds")
        q = (
            agg.writeStream.format("memory").queryName("t_late").outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="500 milliseconds").start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline and spark.sql("SELECT * FROM t_late").count() < 1:
                time.sleep(0.5)
            # the 10:00 window closed (watermark 10:59 > 10:30) with n=1
            first = {(str(r["window_start"]), r["n"]) for r in spark.sql("SELECT * FROM t_late").collect()}
            assert ("2024-01-01 10:00:00", 1) in first, first
            # batch 1: a straggler INSIDE the already-closed 10:00 window
            (d / "b1.json").write_text(json.dumps({"ts": "2024-01-01 10:05:00", "v": 100}))
            time.sleep(5)
            final = {(str(r["window_start"]), r["n"]) for r in spark.sql("SELECT * FROM t_late").collect()}
            assert ("2024-01-01 10:00:00", 1) in final and ("2024-01-01 10:00:00", 101) not in final, final
        finally:
            q.stop()


class TestStreamStreamJoin:
    def test_interval_join_stream_matches_batch(self, spark, tmp_path):
        """Two streams joined on key within an event-time interval must
        produce exactly the batch join of the same data."""
        from stepist_spark.streaming.joins import interval_join

        orders_d, clicks_d = tmp_path / "orders", tmp_path / "clicks"
        orders_d.mkdir(); clicks_d.mkdir()
        orders = [
            {"k": 1, "ots": "2024-01-01 10:00:00", "amount": 100},
            {"k": 2, "ots": "2024-01-01 10:30:00", "amount": 200},
        ]
        clicks = [
            {"k": 1, "cts": "2024-01-01 10:02:00", "page": "a"},   # within 5m of order 1
            {"k": 1, "cts": "2024-01-01 11:00:00", "page": "b"},   # too late for order 1
            {"k": 2, "cts": "2024-01-01 10:29:00", "page": "c"},   # 1m BEFORE order 2
            {"k": 3, "cts": "2024-01-01 10:00:00", "page": "d"},   # no matching order
        ]
        (orders_d / "o.json").write_text("\n".join(json.dumps(r) for r in orders))
        (clicks_d / "c.json").write_text("\n".join(json.dumps(r) for r in clicks))

        def srcs(streaming):
            if streaming:
                o = read_stream(spark, "json", str(orders_d), schema="k LONG, ots STRING, amount LONG")
                c = read_stream(spark, "json", str(clicks_d), schema="k LONG, cts STRING, page STRING")
            else:
                o = spark.read.schema("k LONG, ots STRING, amount LONG").json(str(orders_d))
                c = spark.read.schema("k LONG, cts STRING, page STRING").json(str(clicks_d))
            return (
                o.withColumn("ots", F.to_timestamp("ots")),
                c.withColumn("cts", F.to_timestamp("cts")),
            )

        o, c = srcs(True)
        joined = interval_join(o, c, "k", "ots", "cts", lower="2 minutes", upper="5 minutes")
        q = joined.writeStream.format("memory").queryName("t_ssj").outputMode("append").trigger(
            availableNow=True
        ).start()
        _drain(q)
        got = {(r["k"], r["page"]) for r in spark.sql("SELECT * FROM t_ssj").collect()}

        ob, cb = srcs(False)
        batch = interval_join(ob, cb, "k", "ots", "cts", lower="2 minutes", upper="5 minutes")
        want = {(r["k"], r["page"]) for r in batch.collect()}
        assert got == want == {(1, "a"), (2, "c")}

    def test_overlapping_columns_rejected(self, spark):
        df = spark.createDataFrame([(1, 2)], "k long, v long")
        from stepist_spark.streaming.joins import interval_join

        with pytest.raises(ValueError, match="rename overlapping"):
            interval_join(df, df, "k", "v", "v")


class TestEngineStream:
    def test_engine_stream_wires_worker_loop(self, spark, jobs_dir):
        """Engine.stream is the app.run analog (`stepist/app.py:56-63`):
        source + registered step -> running StreamingQuery."""
        from stepist_spark.pipeline import Engine

        engine = Engine(spark)

        @engine.step(name="double_values")
        def double_values(df):
            return df.withColumn("v2", F.col("value") * 2)

        src = read_stream(spark, "json", jobs_dir, schema=JOBS_SCHEMA)
        flow = engine.stream(src, double_values)
        q = flow.to_memory("t_engine_stream")
        _drain(q)
        total = spark.sql("SELECT sum(v2) s FROM t_engine_stream").collect()[0]["s"]
        assert total == 2 * (1 + 2 + 3 + 10)


class TestS02EmptySubsetGuard:
    def test_degenerate_sf_fails_loudly(self, spark, tmp_path):
        """Round-4 ADVICE: an sf whose events lack user_id % 8 == 0 rows
        must raise a descriptive error, not min() of an empty dict."""
        import pytest as _pytest

        from stepist_spark.queries.streaming_gates import s02_sliding_window
        from stepist_spark.session import load_table

        src = load_table(spark, "/root/testdata/sf0.001", "events")
        deg = str(tmp_path / "degenerate_sf")
        src.filter("user_id % 8 <> 0").write.parquet(f"{deg}/events.parquet")
        with _pytest.raises(ValueError, match="user_id % 8"):
            s02_sliding_window(spark, deg)


class TestStreamStaticJoin:
    """Stream-static broadcast enrichment (the s01 'enrich' part):
    each micro-batch joins a small static dimension; the join itself
    needs NO state store — only the downstream agg is stateful."""

    def test_enrichment_matches_batch_and_is_broadcast(self, spark, tmp_path):
        rows = [
            {"k": 1, "v": 10},
            {"k": 2, "v": 20},
            {"k": 1, "v": 30},
            {"k": 9, "v": 99},  # no dim match: inner join drops it
        ]
        d = tmp_path / "ssj"
        d.mkdir()
        (d / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
        stream = read_stream(spark, "json", str(d), schema="k LONG, v LONG")
        dim = spark.createDataFrame([(1, "gold"), (2, "blue")], "k LONG, seg STRING")
        joined = stream.join(F.broadcast(dim), "k")
        agg = joined.groupBy("seg").agg(F.sum("v").alias("total"))
        q = (
            agg.writeStream.format("memory")
            .queryName("t_ssj")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        got = {(r["seg"], r["total"]) for r in spark.sql("SELECT * FROM t_ssj").collect()}
        assert got == {("gold", 40), ("blue", 20)}
        # the only stateful operator is the aggregation, not the join
        prog = q.lastProgress
        assert prog is not None and len(prog["stateOperators"]) == 1


class TestTaskRetryExactlyOnce:
    """Round-9 verdict #5: certify exactly-once at TASK granularity —
    the level the reference's queue redelivery operates at
    (`stepist/flow/libs/simple_queue.py:42-47`). s05's 'restart' part
    kills a whole QUERY; here an Arrow batch inside the foreachBatch
    MERGE job fails on its FIRST task attempt (every task of micro-
    batch 1, via TaskContext.attemptNumber), the task RETRIES, and the
    file-backed materialized view must still equal the full-data
    oracle — no duplicated and no dropped rows.

    Runs in a SUBPROCESS: task retry needs master local[N, F] with
    F > 1 (the shared session's local[*] treats the first task failure
    as fatal), and a JVM's master is fixed at SparkContext creation.
    """

    def test_flaky_arrow_batch_retries_without_duplicates(self, tmp_path):
        import os
        import subprocess
        import sys
        import textwrap

        script = tmp_path / "retry_eo.py"
        script.write_text(textwrap.dedent("""
            import glob, os, sys
            sys.path.insert(0, %(repo)r)
            work = %(work)r
            from pyspark.sql import SparkSession, functions as F

            spark = (
                SparkSession.builder.master("local[4, 2]")  # 2 task attempts
                .appName("task_retry_eo")
                .config("spark.sql.shuffle.partitions", "4")
                .config("spark.ui.enabled", "false")
                .config("spark.sql.session.timeZone", "UTC")
                .getOrCreate()
            )
            rows = [(i, chr(65 + i %% 4), (i * 7) %% 1000) for i in range(200)]
            full = spark.createDataFrame(rows, "event_id long, event_type string, cents long")
            in_dir = os.path.join(work, "in"); os.makedirs(in_dir)
            for tag, cond, mt in (("a", 0, 1.6e9), ("b", 1, 1.6e9 + 60)):
                tmp = os.path.join(work, "w_" + tag)
                full.filter(F.col("event_id") %% 2 == cond).repartition(1) \\
                    .write.parquet(tmp)
                part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
                dest = os.path.join(in_dir, tag + ".parquet")
                os.rename(part, dest); os.utime(dest, (mt, mt))

            attempts_log = os.path.join(work, "attempts")
            os.makedirs(attempts_log)
            from stepist_spark.operators import cdc as _cdc
            state = {"dir": None}

            def merge(batch_df, batch_id):
                import pandas as pd  # noqa: F401

                def flaky(batches):
                    from pyspark import TaskContext
                    ctx = TaskContext.get()
                    att, pid = ctx.attemptNumber(), ctx.partitionId()
                    with open(os.path.join(
                            attempts_log, f"b{batch_id}_p{pid}_a{att}"), "w"):
                        pass
                    if batch_id == 1 and att == 0:
                        raise ValueError("injected first-attempt failure")
                    yield from batches

                src = batch_df.mapInPandas(flaky, schema=batch_df.schema)
                if state["dir"] is None:
                    prev = batch_df.sparkSession.createDataFrame(
                        [], "event_type string, n bigint, cents bigint")
                else:
                    prev = batch_df.sparkSession.read.parquet(state["dir"])
                changes = src.select(
                    "event_type",
                    F.col("n").cast("bigint").alias("n"),
                    F.col("cents").cast("bigint").alias("cents"),
                    F.lit(int(batch_id)).alias("seq"), F.lit("U").alias("op"))
                merged = _cdc.apply_changes(prev, changes, ["event_type"], "seq", "op")
                out = os.path.join(work, f"tgt_{batch_id}")
                merged.write.mode("overwrite").parquet(out)
                state["dir"] = out

            q = (
                spark.readStream.schema(full.schema)
                .option("maxFilesPerTrigger", 1).parquet(in_dir)
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
                .writeStream.outputMode("update").foreachBatch(merge)
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .trigger(availableNow=True).start()
            )
            assert q.awaitTermination(180), "drain timed out"

            got = sorted(
                (r["event_type"], r["n"], r["cents"])
                for r in spark.read.parquet(state["dir"])
                    .select("event_type", "n", "cents").collect()
            )
            want = sorted(
                (r["event_type"], r["n"], r["cents"])
                for r in full.groupBy("event_type")
                    .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
                    .collect()
            )
            assert got == want, f"MV diverged after task retry: {got} != {want}"
            logged = sorted(os.listdir(attempts_log))
            # the injection actually fired: batch 1 has attempt-0 AND
            # attempt-1 records; batch 0 only attempt-0
            assert any(f.startswith("b1_") and f.endswith("_a0") for f in logged)
            assert any(f.startswith("b1_") and f.endswith("_a1") for f in logged)
            assert not any(f.startswith("b0_") and f.endswith("_a1") for f in logged)
            print("RETRY-EO-OK", len(logged))
            spark.stop()
        """) % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "work": str(tmp_path / "work")})
        (tmp_path / "work").mkdir()
        env = dict(os.environ)
        res = subprocess.run(
            [sys.executable, str(script)], capture_output=True, text=True,
            timeout=420, env=env,
        )
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        assert "RETRY-EO-OK" in res.stdout


class TestStateStoreProviders:
    """RocksDB state-store provider (round-10 verdict #4): the scale
    path once interval-join/dedup state outgrows executor heap. Both
    providers must drain IDENTICAL output, the provider conf must not
    leak past query start, and StreamFlow.status() must expose the
    state rows/memory by value."""

    def _dedup_drain(self, spark, tmp_path, provider, tag):
        # s05-class state: the events slice unioned with itself through
        # dropDuplicates — every row arrives twice, must land once
        from stepist_spark.session import load_table
        from stepist_spark.streaming.dedup import stream_dedup
        from stepist_spark.streaming.runtime import stream_shuffle_partitions

        ev = (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .filter(F.col("event_id") % 3 == 0)
            .select("event_id", "event_type")
        )
        d = str(tmp_path / f"in_{tag}")
        ev.repartition(2).write.parquet(d)
        src = spark.readStream.schema(ev.schema).parquet(d)
        flow = StreamFlow(
            src.unionByName(src),
            lambda df: stream_dedup(df, ["event_id"]),
            state_store=provider,
        )
        with stream_shuffle_partitions(spark, 4):
            flow.drain(f"ss_{tag}")
        rows = sorted(
            (r["event_id"], r["event_type"])
            for r in spark.table(f"ss_{tag}").collect()
        )
        return flow, rows, ev.count()

    def test_both_providers_identical_dedup_drain(self, spark, tmp_path):
        f_h, rows_h, n = self._dedup_drain(spark, tmp_path, "hdfs", "h")
        f_r, rows_r, _ = self._dedup_drain(spark, tmp_path, "rocksdb", "r")
        assert rows_h == rows_r and len(rows_h) == n
        # the rocksdb run must have ACTUALLY used rocksdb (custom
        # metrics are provider-specific), and the hdfs run must not
        cm_r = (f_r.query.lastProgress.get("stateOperators") or [{}])[0].get(
            "customMetrics", {}
        )
        cm_h = (f_h.query.lastProgress.get("stateOperators") or [{}])[0].get(
            "customMetrics", {}
        )
        assert any(k.startswith("rocksdb") for k in cm_r)
        assert not any(k.startswith("rocksdb") for k in cm_h)

    def test_both_providers_identical_interval_join(self, spark, tmp_path):
        # s03-class state: stream-stream interval join buffered in the
        # state store — same rows under both providers, == batch join
        import json as _json

        from stepist_spark.streaming.joins import interval_join
        from stepist_spark.streaming.runtime import (
            state_store_provider,
            stream_shuffle_partitions,
        )

        od, cd = tmp_path / "o", tmp_path / "c"
        od.mkdir(); cd.mkdir()
        orders = [
            {"k": i, "ots": f"2024-01-01 10:{i % 50:02d}:00", "amount": i}
            for i in range(40)
        ]
        clicks = [
            {"k": i, "cts": f"2024-01-01 10:{(i % 50) + 2:02d}:00", "page": f"p{i}"}
            for i in range(40)
        ]
        (od / "o.json").write_text("\n".join(_json.dumps(r) for r in orders))
        (cd / "c.json").write_text("\n".join(_json.dumps(r) for r in clicks))

        def run(provider, tag):
            o = read_stream(
                spark, "json", str(od), schema="k LONG, ots STRING, amount LONG"
            ).withColumn("ots", F.to_timestamp("ots"))
            c = read_stream(
                spark, "json", str(cd), schema="k LONG, cts STRING, page STRING"
            ).withColumn("cts", F.to_timestamp("cts"))
            j = interval_join(o, c, "k", "ots", "cts", lower="0 minutes", upper="5 minutes")
            with stream_shuffle_partitions(spark, 4), state_store_provider(spark, provider):
                q = (
                    j.writeStream.format("memory").queryName(f"ssj_{tag}")
                    .outputMode("append").trigger(availableNow=True).start()
                )
            _drain(q)
            return sorted(
                (r["k"], r["page"]) for r in spark.table(f"ssj_{tag}").collect()
            )

        got_h, got_r = run("hdfs", "h2"), run("rocksdb", "r2")
        assert got_h == got_r and len(got_h) == 40

    def test_status_state_metrics_by_value(self, spark, tmp_path):
        # the dedup state holds EXACTLY one row per distinct key —
        # status() must report that number, and a positive memory size
        flow, rows, n = self._dedup_drain(spark, tmp_path, "rocksdb", "v")
        st = flow.status()
        assert st["state_rows"] == n == len(rows)
        assert st["state_memory_bytes"] > 0
        assert st["input_rows"] >= n

    def test_unknown_provider_rejected(self, spark):
        from stepist_spark.streaming.runtime import state_store_provider

        df = spark.readStream.format("rate").load()
        with pytest.raises(ValueError, match="unknown state_store"):
            StreamFlow(df, state_store="rocksdbx")
        with pytest.raises(ValueError, match="unknown state_store"):
            with state_store_provider(spark, "nope"):
                pass

    def test_provider_conf_never_leaks(self, spark):
        from stepist_spark.streaming.runtime import (
            _PROVIDER_CONF,
            state_store_provider,
        )

        before = spark.conf.get(_PROVIDER_CONF, "UNSET")
        with state_store_provider(spark, "rocksdb"):
            assert spark.conf.get(_PROVIDER_CONF).endswith("RocksDBStateStoreProvider")
        assert spark.conf.get(_PROVIDER_CONF, "UNSET") == before


class TestStreamTopK:
    """Streaming grouped top-k (round 11): bounded O(k) state per key
    — (seq, heap[<=k]) — folded incrementally across micro-batches via
    applyInPandasWithState (transformWithStateInPandas needs the
    protobuf runtime, absent here — see streaming/topk.py docstring),
    run under the RocksDB provider. The final standings after a drain
    must equal the batch row_number() <= k — certified per-batch here
    and end-to-end by the s02 'topk' gate part."""

    ROWS = [
        # (batch, key, id, val) — top-3 per key shifts across batches:
        # key a's batch-0 leader (id 1, 90) is displaced by batch 2's
        # id 7 (95); the tie pair (id 4/id 2 at 50) must break id-asc
        (0, "a", 1, 90.0), (0, "a", 2, 50.0), (0, "b", 3, 10.0),
        (1, "a", 4, 50.0), (1, "a", 5, 20.0), (1, "b", 6, 30.0),
        (2, "a", 7, 95.0), (2, "b", 8, 5.0),
    ]

    def _stage(self, tmp_path):
        import json as _json
        import os as _os

        d = tmp_path / "tk"
        d.mkdir()
        for b in (0, 1, 2):
            p = d / f"b{b}.json"
            p.write_text(
                "\n".join(
                    _json.dumps({"key": k, "id": i, "val": v})
                    for (bb, k, i, v) in self.ROWS
                    if bb == b
                )
            )
            _os.utime(p, (1_600_000_000 + b, 1_600_000_000 + b))
        return str(d)

    def _drain_topk(self, spark, tmp_path, tag, k=3, descending=True):
        from stepist_spark.streaming.runtime import (
            state_store_provider,
            stream_shuffle_partitions,
        )
        from stepist_spark.streaming.topk import stream_topk

        src = read_stream(
            spark, "json", self._stage(tmp_path),
            schema="key STRING, id LONG, val DOUBLE", max_files_per_trigger=1,
        )
        tk = stream_topk(src, "key", "val", k, "id", descending=descending)
        sink = f"tk_{tag}"
        with stream_shuffle_partitions(spark, 4), state_store_provider(spark, "rocksdb"):
            q = (
                tk.writeStream.format("memory").queryName(sink)
                .outputMode("append").trigger(availableNow=True).start()
            )
        _drain(q)
        return spark.table(sink), q

    def test_final_standings_equal_batch_topk(self, spark, tmp_path):
        from stepist_spark.streaming.topk import latest_topk

        sink, _ = self._drain_topk(spark, tmp_path, "m")
        got = sorted(
            (r["key"], r["rank"], r["id"], r["val"])
            for r in latest_topk(sink, "key").collect()
        )
        # batch oracle: val DESC, id ASC per key, top 3
        assert got == [
            ("a", 1, 7, 95.0), ("a", 2, 1, 90.0), ("a", 3, 2, 50.0),
            ("b", 1, 6, 30.0), ("b", 2, 3, 10.0), ("b", 3, 8, 5.0),
        ]

    def test_per_batch_emissions_track_state(self, spark, tmp_path):
        sink, q = self._drain_topk(spark, tmp_path, "e")
        rows = sink.collect()
        # key a was touched by 3 batches, key b by 3; each emission is
        # the key's FULL current top-k at that seq
        seq1_a = sorted((r["rank"], r["id"]) for r in rows if r["key"] == "a" and r["seq"] == 1)
        assert seq1_a == [(1, 1), (2, 2)]  # only 2 rows seen yet
        seq2_a = sorted((r["rank"], r["id"]) for r in rows if r["key"] == "a" and r["seq"] == 2)
        # tie at 50.0: id 2 (earlier) outranks id 4
        assert seq2_a == [(1, 1), (2, 2), (3, 4)]
        seq3_a = sorted((r["rank"], r["id"]) for r in rows if r["key"] == "a" and r["seq"] == 3)
        assert seq3_a == [(1, 7), (2, 1), (3, 2)]
        assert max(r["seq"] for r in rows if r["key"] == "b") == 3
        # the drain ran under state_store_provider("rocksdb") — the
        # provider-specific customMetrics prove it actually engaged
        cm = (q.lastProgress.get("stateOperators") or [{}])[0].get("customMetrics", {})
        assert any(k.startswith("rocksdb") for k in cm)

    def test_ascending_mode(self, spark, tmp_path):
        from stepist_spark.streaming.topk import latest_topk

        sink, _ = self._drain_topk(spark, tmp_path, "asc", k=2, descending=False)
        got = sorted(
            (r["key"], r["rank"], r["id"])
            for r in latest_topk(sink, "key").collect()
        )
        assert got == [("a", 1, 5), ("a", 2, 2), ("b", 1, 8), ("b", 2, 3)]

    def test_validation(self, spark, tmp_path):
        from stepist_spark.session import load_table
        from stepist_spark.streaming.topk import stream_topk

        batch = load_table(spark, "/root/testdata/sf0.001", "events")
        with pytest.raises(ValueError, match="streaming"):
            stream_topk(batch, "event_type", "value", 3, "event_id")
        src = read_stream(
            spark, "json", self._stage(tmp_path),
            schema="key STRING, id LONG, val DOUBLE",
        )
        with pytest.raises(ValueError, match="k must be"):
            stream_topk(src, "key", "val", 0, "id")
        with pytest.raises(ValueError, match="numeric"):
            stream_topk(src, "key", "key", 3, "id")
