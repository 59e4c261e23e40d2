"""Range/as-of join operator tests beyond the oracle queries (q18/q19):
the bucketized large-×-large range-join pattern must produce exactly
the broadcast nested-loop result — bucketing only changes the physical
shape (co-partitioned equi-join + re-check) from O(n·m) to O(n + m)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stepist_spark.operators import asof
from stepist_spark.session import load_table

SF = "/root/testdata/sf0.001"
WIDTH = 1000.0


@pytest.fixture(scope="module")
def fact(spark):
    return load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice").cache()


@pytest.fixture(scope="module")
def bands(spark):
    rows = [(i, i * 2500.0, (i + 1) * 2500.0) for i in range(30)]
    return spark.createDataFrame(rows, "band_id long, lo double, hi double")


class TestBucketizedRangeJoin:
    def test_matches_broadcast_range_join(self, spark, fact, bands):
        exact = asof.range_join(fact, bands, "l_extendedprice")
        bucketed_fact = asof.bucketize_range(fact, "l_extendedprice", WIDTH)
        # expand each band to every bucket its [lo, hi) span touches,
        # equi-join on the bucket, then re-check the exact predicate
        expanded = bands.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / WIDTH).cast("bigint"),
                    F.floor((F.col("hi") - F.lit(1e-9)) / WIDTH).cast("bigint"),
                )
            ),
        )
        rejoined = (
            bucketed_fact.join(expanded, "_bucket")
            .filter(
                (F.col("l_extendedprice") >= F.col("lo"))
                & (F.col("l_extendedprice") < F.col("hi"))
            )
            .drop("_bucket")
        )
        cols = sorted(exact.columns)
        a = sorted(tuple(r) for r in exact.select(*cols).collect())
        b = sorted(tuple(r) for r in rejoined.select(*cols).collect())
        assert a == b and len(a) > 0

    def test_bucketed_path_is_equi_join(self, spark, fact, bands):
        from stepist_spark import plans

        bucketed_fact = asof.bucketize_range(fact, "l_extendedprice", WIDTH)
        expanded = bands.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / WIDTH).cast("bigint"),
                    F.floor((F.col("hi") - F.lit(1e-9)) / WIDTH).cast("bigint"),
                )
            ),
        )
        joined = bucketed_fact.join(expanded, "_bucket")
        strategies = plans.join_strategies(joined)
        assert strategies and "BroadcastNestedLoopJoin" not in strategies, strategies
