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


class TestAsofTolerance:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 100, "a"), (1, 205, "b"), (2, 50, "c")],
            "k bigint, t bigint, tag string",
        )
        right = spark.createDataFrame(
            [(1, 90, "r90"), (1, 300, "r300"), (2, 500, "r500")],
            "k bigint, t bigint, rv string",
        )
        return left, right

    def _got(self, spark, direction, tol):
        left, right = self._frames(spark)
        out = asof.asof_join(
            left, right, on="k", left_time="t", right_time="t",
            direction=direction, tolerance=tol,
        )
        return {r["tag"]: (r["asof_t"], r["asof_rv"]) for r in out.collect()}

    def test_backward_tolerance_drops_far_matches(self, spark):
        # 'a' at 100 has r90 (dist 10, kept); 'b' at 205 only r90
        # backward (dist 115 > 50: dropped); 'c' has no backward match
        got = self._got(spark, "backward", F.lit(50))
        assert got == {"a": (90, "r90")}

    def test_nearest_falls_back_to_other_side(self, spark):
        # 'b' at 205: backward r90 (dist 115), forward r300 (dist 95).
        # tol=100 invalidates backward but keeps forward — a post-pick
        # filter would have dropped the row entirely
        got = self._got(spark, "nearest", F.lit(100))
        assert got["b"] == (300, "r300")
        assert got["a"] == (90, "r90")
        assert "c" not in got  # nearest r500 dist 450 > 100

    def test_matches_pandas_merge_asof(self, spark):
        import pandas as pd

        left, right = self._frames(spark)
        out = asof.asof_join(
            left, right, on="k", left_time="t", right_time="t",
            direction="nearest", tolerance=F.lit(100),
        )
        got = sorted(
            (r["tag"], r["asof_t"]) for r in out.collect()
        )
        lp = left.toPandas().sort_values("t")
        rp = right.toPandas().sort_values("t")
        m = pd.merge_asof(lp, rp, on="t", by="k", direction="nearest", tolerance=100)
        exp = sorted(
            (row.tag, int(row.t_r) if pd.notna(row.t_r) else None)
            for row in m.assign(
                t_r=pd.merge_asof(
                    lp, rp.rename(columns={"t": "rt"}).assign(t=lambda d: d.rt),
                    on="t", by="k", direction="nearest", tolerance=100,
                ).rt
            ).itertuples()
            if pd.notna(row.rv)
        )
        assert got == exp


class TestAsofJoinMulti:
    def test_matches_individual_joins(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.asof import asof_join, asof_join_multi

        left = spark.createDataFrame(
            [(1, "u", 100, "l1"), (2, "u", 205, "l2"), (3, "v", 50, "l3"),
             (4, "w", 10, "l4")],
            "id bigint, k string, t bigint, tag string",
        )
        right = spark.createDataFrame(
            [("u", 90, "r1"), ("u", 200, "r2"), ("u", 210, "r3"),
             ("v", 500, "r4")],
            "k string, t bigint, pay string",
        )
        specs = [
            ("b", "backward", None),
            ("f", "forward", None),
            ("n", "nearest", None),
            ("ntol", "nearest", F.lit(20)),
        ]
        multi = asof_join_multi(left, right, "k", "t", "t", specs)
        got = {
            part: sorted(
                (r["id"], r["asof_t"], r["asof_pay"])
                for r in multi.filter(F.col("part") == part).collect()
            )
            for part, _, _ in specs
        }
        for part, direction, tol in specs:
            single = sorted(
                (r["id"], r["asof_t"], r["asof_pay"])
                for r in asof_join(
                    left, right, "k", "t", "t", direction=direction, tolerance=tol
                ).collect()
            )
            assert got[part] == single, part
        # sanity on semantics, not just self-consistency
        assert got["b"] == [(1, 90, "r1"), (2, 200, "r2")]
        assert (1, 90, "r1") in got["b"]
        assert (3, 500, "r4") in got["f"]
        assert (2, 200, "r2") in got["n"]  # backward wins |205-200| < |210-205|? 5==5 -> backward
        assert all(r[0] != 3 for r in got["ntol"])  # v's only match is 450 away
