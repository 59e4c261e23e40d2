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


class TestAsofDirections:
    """All three as-of directions against a pandas-merge_asof-shaped
    hand oracle (backward/forward inclusive, nearest with backward
    tie-break)."""

    RIGHT = [  # (key, time, quote)
        ("a", 10, 1.0),
        ("a", 20, 2.0),
        ("a", 40, 4.0),
        ("b", 15, 9.0),
    ]
    LEFT = [  # (key, time, trade_id)
        ("a", 5, 1),    # before any right
        ("a", 10, 2),   # exact match at 10
        ("a", 25, 3),   # between 20 and 40 (nearer 20)
        ("a", 31, 4),   # between 20 and 40 (nearer 40)
        ("a", 30, 5),   # equidistant 20/40 -> backward wins nearest
        ("a", 99, 6),   # after all rights
        ("b", 14, 7),   # before b's only right
        ("c", 50, 8),   # key with no right rows
    ]
    EXPECT = {
        # trade_id -> asof_t per direction (None = dropped)
        "backward": {1: None, 2: 10, 3: 20, 4: 20, 5: 20, 6: 40, 7: None, 8: None},
        "forward": {1: 10, 2: 10, 3: 40, 4: 40, 5: 40, 6: None, 7: 15, 8: None},
        "nearest": {1: 10, 2: 10, 3: 20, 4: 40, 5: 20, 6: 40, 7: 15, 8: None},
    }

    @pytest.fixture(scope="class")
    def frames(self, spark):
        right = spark.createDataFrame(self.RIGHT, "k string, t long, quote double")
        left = spark.createDataFrame(self.LEFT, "k string, t long, trade_id long")
        return left, right

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_direction_semantics(self, spark, frames, direction):
        left, right = frames
        out = asof.asof_join(
            left, right, on="k", left_time="t", right_time="t", direction=direction
        )
        got = {r["trade_id"]: r["asof_t"] for r in out.collect()}
        want = {k: v for k, v in self.EXPECT[direction].items() if v is not None}
        assert got == want, f"{direction}: {got} != {want}"

    def test_bad_direction_rejected(self, spark, frames):
        left, right = frames
        with pytest.raises(ValueError, match="backward|forward|nearest"):
            asof.asof_join(
                left, right, on="k", left_time="t", right_time="t", direction="sideways"
            )
