"""HLL sketch rollup: merge-don't-rescan distinct counting. Accuracy is
bounded (~1.6% at lg_k=12), and crucially the two-level path (build per
fine key, merge to coarse key) must estimate the SAME value as
sketching the coarse key directly — associativity is what makes the
pattern work at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stepist_spark.operators import sketches
from stepist_spark.session import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def li(spark):
    return load_table(spark, SF, "lineitem").cache()


class TestHLLRollup:
    def test_estimate_within_error_bound(self, spark, li):
        per_flag = sketches.build_sketches(li, "l_returnflag", "l_partkey")
        est = {
            r["l_returnflag"]: r["approx_distinct"]
            for r in sketches.estimate(per_flag).collect()
        }
        exact = {
            r["l_returnflag"]: r["n"]
            for r in li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n"))
            .collect()
        }
        for k, n in exact.items():
            assert abs(est[k] - n) / n < 0.05, (k, est[k], n)

    def test_merge_tracks_direct_sketch(self, spark, li):
        """Sketch per (flag, linestatus), merge to flag — the union
        estimate is not bit-identical to a direct flag-level sketch
        (Datasketches promotes sparse->dense during union), but both
        must land within the error bound of the exact count."""
        fine = sketches.build_sketches(li, ["l_returnflag", "l_linestatus"], "l_partkey")
        rolled = {
            r["l_returnflag"]: r["approx_distinct"]
            for r in sketches.rollup_sketches(fine, ["l_returnflag"]).collect()
        }
        exact = {
            r["l_returnflag"]: r["n"]
            for r in li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n"))
            .collect()
        }
        for k, n in exact.items():
            assert abs(rolled[k] - n) / n < 0.05, (k, rolled[k], n)

    def test_global_rollup_from_group_sketches(self, spark, li):
        fine = sketches.build_sketches(li, "l_returnflag", "l_partkey")
        merged = fine.agg(F.hll_union_agg("sketch").alias("sketch"))
        (r,) = sketches.estimate(merged).collect()
        exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
        assert abs(r["approx_distinct"] - exact) / exact < 0.05


class TestFrequentItems:
    def test_exact_when_capacity_sufficient(self, spark):
        from stepist_spark.operators.sketches import frequent_items

        rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
        df = spark.createDataFrame(rows, "tok string").repartition(4)
        got = [(r["item"], r["weight"]) for r in frequent_items(df, "tok", capacity=10).collect()]
        # ties (b=c=3) break on item string
        assert got == [("a", 5), ("b", 3), ("c", 3), ("d", 1)]

    def test_k_limits_output(self, spark):
        from stepist_spark.operators.sketches import frequent_items

        rows = [("x%d" % i,) for i in range(30)]
        df = spark.createDataFrame(rows, "tok string")
        assert frequent_items(df, "tok", capacity=64, k=5).count() == 5

    def test_undercount_never_overcounts(self, spark):
        from stepist_spark.operators.sketches import frequent_items

        # capacity 1 per partition: weights must be <= true counts
        rows = [("a",)] * 6 + [("b",)] * 4
        df = spark.createDataFrame(rows, "tok string").repartition(3)
        got = {r["item"]: r["weight"] for r in frequent_items(df, "tok", capacity=1).collect()}
        true = {"a": 6, "b": 4}
        assert all(w <= true[i] for i, w in got.items())

    def test_empty_input(self, spark):
        from stepist_spark.operators.sketches import frequent_items

        df = spark.createDataFrame([], "tok string")
        assert frequent_items(df, "tok", capacity=4).count() == 0


class TestPortableHll:
    """Engine-portable HLL: md5-derived registers, integer-exact
    register sums — the q21 oracle recomputes it bit-identically; here
    we check the estimates are actually GOOD and the merge law holds."""

    def test_estimate_within_error_bound(self, spark):
        from stepist_spark.operators import sketches

        n = 20_000
        df = spark.range(n).selectExpr("id AS v", "id % 4 AS g")
        regs = sketches.portable_hll_registers(df, "g", "v")
        est = {
            r["g"]: r["approx_distinct"]
            for r in sketches.portable_hll_estimate(regs, "g").collect()
        }
        for g in range(4):
            exact = n // 4
            assert abs(est[g] - exact) / exact < 0.15, (g, est[g], exact)

    def test_merge_equals_direct_build(self, spark):
        from stepist_spark.operators import sketches

        df = spark.range(10_000).selectExpr("id AS v", "id % 8 AS fine", "id % 2 AS coarse")
        fine = sketches.portable_hll_registers(df, ["coarse", "fine"], "v")
        merged = sketches.portable_hll_merge(fine, "coarse")
        direct = sketches.portable_hll_registers(df, "coarse", "v")
        a = sorted(tuple(r) for r in merged.collect())
        b = sorted(tuple(r) for r in direct.collect())
        assert a == b  # register-level merge law: max is associative
