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
