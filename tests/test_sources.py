"""Batch IO layer tests: format round-trips, extension inference,
schema enforcement, partitioned layout pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stepist_spark import plans
from stepist_spark.session import load_table
from stepist_spark.sources import read, write

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, SF, "nation").cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestRoundTrips:
    @pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
    def test_write_read_roundtrip(self, spark, nation, tmp_path, fmt):
        path = str(tmp_path / f"nation_{fmt}")
        opts = {"header": "true"} if fmt == "csv" else {}
        write(nation, path, fmt=fmt, mode="overwrite", **opts)
        back = read(spark, path, fmt=fmt, schema=nation.schema, **opts)
        assert _rows(back.select(*nation.columns)) == _rows(nation)

    def test_extension_inference(self, spark, nation, tmp_path):
        path = str(tmp_path / "n.json")
        write(nation, path, fmt="json", mode="overwrite")
        back = read(spark, path, schema=nation.schema)  # json inferred from ext
        assert back.count() == nation.count()

    def test_unknown_format_rejected(self, spark):
        with pytest.raises(ValueError, match="unsupported batch format"):
            read(spark, "/tmp/x", fmt="xml")


class TestPartitionedLayout:
    def test_partition_pruning_on_read(self, spark, tmp_path):
        """partitionBy layout must let a filter prune whole directories:
        the scan's PartitionFilters carry the predicate and the other
        partitions are never opened."""
        li = load_table(spark, SF, "lineitem").select(
            "l_orderkey", "l_quantity", "l_returnflag"
        )
        path = str(tmp_path / "li_part")
        write(li, path, mode="overwrite", partition_by="l_returnflag")
        back = read(spark, path).filter(F.col("l_returnflag") == "A")
        plan = plans.explain_str(back)
        assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1][:200]
        assert back.count() == li.filter("l_returnflag = 'A'").count()


class TestNanosTimestamps:
    def test_generic_read_handles_nanos_parquet(self, spark):
        """events.parquet carries TIMESTAMP(NANOS), which plain
        spark.read.parquet refuses — the generic reader must transparently
        convert to timestamp_ntz like load_table does."""
        df = read(spark, f"{SF}/events.parquet")
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        assert df.count() > 0


class TestEnvelope:
    """Reference wire envelope: {'data': {'flow_data': ..., 'meta_data':
    ...}} (`stepist/flow/steps/step.py:18-22`, serialized at
    `stepist/flow/libs/simple_queue.py:49-51`) as JSON key/value columns
    — the kafka-shaped path, certified broker-free through file and
    memory backends."""

    FLOW_SCHEMA = "n_nationkey BIGINT, n_name STRING"

    def _frame(self, spark):
        return load_table(spark, SF, "nation").select("n_nationkey", "n_name")

    def test_batch_roundtrip(self, spark):
        from stepist_spark.sources import from_envelope, to_envelope

        df = self._frame(spark)
        enveloped = to_envelope(df, key_col="n_nationkey")
        assert enveloped.columns == ["key", "value"]
        sample = enveloped.orderBy("key").first()
        assert sample["value"].startswith('{"data":{"flow_data":')
        back = from_envelope(enveloped, self.FLOW_SCHEMA)
        assert _rows(back) == _rows(df)

    def test_meta_data_roundtrip(self, spark):
        from stepist_spark.pipeline import meta_value, with_meta
        from stepist_spark.sources import from_envelope, to_envelope

        df = with_meta(self._frame(spark), hub_job_id="job-7", attempt=1)
        enveloped = to_envelope(df)
        back = from_envelope(
            enveloped, self.FLOW_SCHEMA, meta_schema="hub_job_id STRING, attempt INT"
        )
        assert "_meta" in back.columns
        got = back.select(meta_value(back, "hub_job_id").alias("j")).distinct().collect()
        assert [r["j"] for r in got] == ["job-7"]

    def test_malformed_value_yields_nulls_not_failure(self, spark):
        from stepist_spark.sources import from_envelope

        bad = spark.createDataFrame(
            [("not json",), ('{"data":{"flow_data":{"n_nationkey":3,"n_name":"X"}}}',)],
            "value string",
        )
        back = from_envelope(bad, self.FLOW_SCHEMA)
        rows = {tuple(r) for r in back.collect()}
        assert rows == {(3, "X"), (None, None)}

    def test_streaming_roundtrip_through_file_backend(self, spark, tmp_path):
        """write envelopes as text files -> stream them back -> unwrap ->
        memory sink: the whole kafka-shaped path minus the broker."""
        from stepist_spark.sources import from_envelope, read_stream, to_envelope

        df = self._frame(spark)
        path = str(tmp_path / "envelopes")
        to_envelope(df).write.mode("overwrite").text(path)

        src = read_stream(spark, "text", path=path, schema="value string")
        unwrapped = from_envelope(src, self.FLOW_SCHEMA)
        q = (
            unwrapped.writeStream.format("memory")
            .queryName("env_roundtrip")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = _rows(spark.sql("SELECT * FROM env_roundtrip"))
        assert got == _rows(df)


def test_from_envelope_keeps_business_key_column(spark):
    """key_col=None preserves a passthrough column that happens to be
    named 'key' (only the routing key is dropped by default)."""
    from stepist_spark.sources.envelope import from_envelope, to_envelope

    df = spark.createDataFrame([(1, "a")], "x long, y string")
    env = to_envelope(df, key_col="x").withColumn("key2", F.lit("route"))
    # simulate a business column literally named 'key' riding along
    enriched = env.withColumnRenamed("key", "_routing").withColumn(
        "key", F.lit("business")
    )
    out = from_envelope(enriched, "x long, y string", key_col="_routing")
    row = out.collect()[0]
    assert row.key == "business" and row.x == 1 and row.y == "a"
    # default behavior still drops the kafka routing key
    out2 = from_envelope(env, "x long, y string")
    assert "key" not in out2.columns


class TestFixedWidth:
    """Fixed-width text codec: round-trip fidelity + loud failure on
    unrepresentable values."""

    SPECS = [("k", 8, "bigint"), ("name", 10, "string"), ("cents", 12, "bigint")]

    def test_roundtrip(self, spark, tmp_path):
        from stepist_spark.sources import read_fixed_width, write_fixed_width

        rows = [(1, "alpha", 12345), (22, "b", 0), (333, "gamma-x", 999999999)]
        df = spark.createDataFrame(rows, "k bigint, name string, cents bigint")
        p = str(tmp_path / "fw")
        write_fixed_width(df, p, [(n, w) for n, w, _ in self.SPECS])
        back = read_fixed_width(spark, p, self.SPECS)
        assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
        # raw layout check: every line is exactly the summed width
        raw = spark.read.text(p).collect()
        assert {len(r["value"]) for r in raw} == {8 + 10 + 12}

    def test_overflow_raises(self, spark, tmp_path):
        import pytest
        from py4j.protocol import Py4JJavaError

        from stepist_spark.sources import write_fixed_width

        df = spark.createDataFrame([(123456789,)], "k bigint")
        with pytest.raises(Exception) as ei:
            write_fixed_width(df, str(tmp_path / "ofl"), [("k", 4)])
        assert "overflow" in str(ei.value)

    def test_padded_value_raises(self, spark, tmp_path):
        import pytest

        from stepist_spark.sources import write_fixed_width

        df = spark.createDataFrame([(" padded",)], "s string")
        with pytest.raises(Exception) as ei:
            write_fixed_width(df, str(tmp_path / "pad"), [("s", 10)])
        assert "whitespace" in str(ei.value)

    def test_null_raises_at_write(self, spark, tmp_path):
        """Round-6 ADVICE: a NULL used to yield a NULL line and fail
        later inside the text writer; the guard must name the column."""
        import pytest

        from stepist_spark.sources import write_fixed_width

        df = spark.createDataFrame([(None,)], "s string")
        with pytest.raises(Exception) as ei:
            write_fixed_width(df, str(tmp_path / "nul"), [("s", 10)])
        assert "NULL" in str(ei.value) and "'s'" in str(ei.value)

    def test_multibyte_within_char_budget_raises(self, spark, tmp_path):
        """Round-6 ADVICE: widths are BYTE widths — 'héllo' is 5 chars
        but 6 bytes, so a 5-wide column must reject it rather than emit
        a line external byte-offset readers cannot parse."""
        import pytest

        from stepist_spark.sources import write_fixed_width

        df = spark.createDataFrame([("héllo",)], "s string")
        with pytest.raises(Exception) as ei:
            write_fixed_width(df, str(tmp_path / "mb"), [("s", 5)])
        assert "overflow" in str(ei.value) or "non-ASCII" in str(ei.value)

    def test_non_ascii_in_byte_budget_raises(self, spark, tmp_path):
        import pytest

        from stepist_spark.sources import write_fixed_width

        df = spark.createDataFrame([("hé",)], "s string")  # 3 bytes, fits 10
        with pytest.raises(Exception) as ei:
            write_fixed_width(df, str(tmp_path / "na"), [("s", 10)])
        assert "non-ASCII" in str(ei.value)


class TestKafkaContract:
    """Round-7 verdict task #6: the kafka option plumbing, certified
    broker-free. `read_stream` whitelists kafka but no broker (or
    connector JAR) exists in the sandbox — so the testable surface is
    the OPTION CONTRACT: builders produce exactly the string map the
    Spark integration guide specifies, and read_stream/write_stream
    reject misconfigurations in the driver before any cluster work."""

    def test_source_options_shape(self):
        from stepist_spark.sources import kafka_source_options

        opts = kafka_source_options(
            "b1:9092,b2:9092",
            subscribe="events,orders",
            starting_offsets="latest",
            max_offsets_per_trigger=10_000,
            **{"kafka.group.id": "stepist"},
        )
        assert opts == {
            "kafka.bootstrap.servers": "b1:9092,b2:9092",
            "subscribe": "events,orders",
            "startingOffsets": "latest",
            "failOnDataLoss": "false",
            "maxOffsetsPerTrigger": "10000",
            "kafka.group.id": "stepist",
        }
        assert all(isinstance(v, str) for v in opts.values())

    def test_source_requires_exactly_one_subscription_mode(self):
        import pytest

        from stepist_spark.sources import kafka_source_options

        with pytest.raises(ValueError, match="exactly one"):
            kafka_source_options("b:9092")
        with pytest.raises(ValueError, match="exactly one"):
            kafka_source_options("b:9092", subscribe="t", assign='{"t":[0]}')
        # each single mode is accepted
        for kw in (
            {"subscribe": "t"},
            {"subscribe_pattern": "t.*"},
            {"assign": '{"t":[0,1]}'},
        ):
            assert kafka_source_options("b:9092", **kw)

    def test_source_requires_bootstrap_servers(self):
        import pytest

        from stepist_spark.sources import kafka_source_options

        with pytest.raises(ValueError, match="bootstrap"):
            kafka_source_options("", subscribe="t")

    def test_read_stream_validates_before_spark(self, spark):
        import pytest

        from stepist_spark.sources import read_stream

        # missing subscription mode: OUR error, not a connector error
        with pytest.raises(ValueError, match="exactly one"):
            read_stream(spark, "kafka", **{"kafka.bootstrap.servers": "b:9092"})
        with pytest.raises(ValueError, match="bootstrap"):
            read_stream(spark, "kafka", subscribe="t")
        with pytest.raises(ValueError, match="not a path"):
            read_stream(
                spark,
                "kafka",
                path="/tmp/x",
                **{"kafka.bootstrap.servers": "b:9092", "subscribe": "t"},
            )

    def test_read_stream_valid_options_reach_source_resolution(self, spark):
        """With VALID options the call must get past our validation and
        fail only on the absent connector JAR — proving the option
        plumbing reaches Spark intact."""
        import pytest

        from stepist_spark.sources import kafka_source_options, read_stream

        with pytest.raises(Exception) as ei:
            read_stream(spark, "kafka", **kafka_source_options("b:9092", subscribe="t"))
        msg = str(ei.value)
        assert "kafka" in msg.lower()
        assert not isinstance(ei.value, ValueError)  # not our contract error

    def test_sink_options_and_frame_contract(self, spark):
        import pytest

        from stepist_spark.sources import kafka_sink_options
        from stepist_spark.sources.kafka import validate_kafka_sink_frame

        opts = kafka_sink_options("b:9092", topic="out")
        assert opts == {"kafka.bootstrap.servers": "b:9092", "topic": "out"}
        ok = spark.createDataFrame([("k", "v")], "key string, value string")
        validate_kafka_sink_frame(ok, opts)  # value col + topic option: fine
        no_value = ok.select(F.col("key"))
        with pytest.raises(ValueError, match="value"):
            validate_kafka_sink_frame(no_value, opts)
        with pytest.raises(ValueError, match="topic"):
            validate_kafka_sink_frame(ok, kafka_sink_options("b:9092"))
        # per-row routing: a topic COLUMN satisfies the contract
        routed = ok.withColumn("topic", F.lit("t1"))
        validate_kafka_sink_frame(routed, kafka_sink_options("b:9092"))

    def test_write_stream_validates_kafka_sink(self, spark, tmp_path):
        import pytest

        from stepist_spark.sources import write_stream

        stream = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        frame = stream.selectExpr("CAST(value AS STRING) AS value")
        with pytest.raises(ValueError, match="bootstrap"):
            write_stream(frame, str(tmp_path / "cp"), fmt="kafka", topic="out")
        with pytest.raises(ValueError, match="topic"):
            write_stream(
                frame,
                str(tmp_path / "cp2"),
                fmt="kafka",
                **{"kafka.bootstrap.servers": "b:9092"},
            )
        with pytest.raises(ValueError, match="not a path"):
            write_stream(
                frame,
                str(tmp_path / "cp3"),
                path="/tmp/x",
                fmt="kafka",
                topic="out",
                **{"kafka.bootstrap.servers": "b:9092"},
            )
