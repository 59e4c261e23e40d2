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


class TestBloomFilter:
    M, K = 1 << 12, 4

    @pytest.fixture(scope="class")
    def members(self, spark):
        return spark.createDataFrame(
            [(f"member_{i}",) for i in range(300)], "v string"
        )

    def test_no_false_negatives(self, spark, members):
        bloom = sketches.bloom_build(members, "v", self.M, self.K)
        probed = sketches.bloom_probe(members, "v", bloom, self.M, self.K)
        assert probed.filter(~F.col("maybe_member")).count() == 0

    def test_false_positive_rate_bounded(self, spark, members):
        bloom = sketches.bloom_build(members, "v", self.M, self.K)
        novel = spark.createDataFrame(
            [(f"novel_{i}",) for i in range(1000)], "v string"
        )
        fp = (
            sketches.bloom_probe(novel, "v", bloom, self.M, self.K)
            .filter(F.col("maybe_member"))
            .count()
        )
        # n=300, m=4096, k=4 -> theoretical fp ~ (1-e^(-kn/m))^k ~ 0.4%
        assert fp / 1000 < 0.05, fp

    def test_merge_equals_direct_build(self, spark, members):
        """Bitmaps built over shards merge (union + bit_or) to exactly
        the bitmap of the union — the property that lets 100 TB shards
        build their filters independently."""
        half1 = members.filter(F.substring("v", 8, 10).cast("int") % 2 == 0)
        half2 = members.filter(F.substring("v", 8, 10).cast("int") % 2 == 1)
        b1 = sketches.bloom_build(half1, "v", self.M, self.K)
        b2 = sketches.bloom_build(half2, "v", self.M, self.K)
        merged = sketches.bloom_merge(b1, b2)
        direct = sketches.bloom_build(members, "v", self.M, self.K)
        got = sorted((r.word_idx, r.word) for r in merged.collect())
        exp = sorted((r.word_idx, r.word) for r in direct.collect())
        assert got == exp

    def test_empty_filter_rejects_everything(self, spark, members):
        empty = sketches.bloom_build(
            members.filter(F.lit(False)), "v", self.M, self.K
        )
        probed = sketches.bloom_probe(members, "v", empty, self.M, self.K)
        assert probed.filter(F.col("maybe_member")).count() == 0

    def test_sign_bit_never_set(self, spark, members):
        """63 bits per word: every word is non-negative, so engines
        cannot disagree about shifting into two's-complement sign."""
        bloom = sketches.bloom_build(members, "v", self.M, self.K)
        assert bloom.filter(F.col("word") < 0).count() == 0


class TestCountMin:
    D, W = 4, 256

    @pytest.fixture(scope="class")
    def freqs(self):
        # zipf-ish: item_i appears i times
        return {f"item_{i}": i for i in range(1, 40)}

    @pytest.fixture(scope="class")
    def stream(self, spark, freqs):
        rows = [(v,) for v, n in freqs.items() for _ in range(n)]
        return spark.createDataFrame(rows, "v string")

    def test_never_undercounts(self, spark, stream, freqs):
        cms = sketches.cms_build(stream, "v", depth=self.D, width=self.W)
        keys = spark.createDataFrame([(k,) for k in freqs], "v string")
        est = {
            r.v: r.approx_count
            for r in sketches.cms_estimate(
                keys, "v", cms, depth=self.D, width=self.W
            ).collect()
        }
        for k, n in freqs.items():
            assert est[k] >= n, (k, est[k], n)

    def test_exact_in_sparse_regime(self, spark, stream, freqs):
        # 39 keys into 4x256 cells: collisions in all 4 rows are
        # vanishingly unlikely -> min over rows is exact
        cms = sketches.cms_build(stream, "v", depth=self.D, width=self.W)
        keys = spark.createDataFrame([(k,) for k in freqs], "v string")
        est = {
            r.v: r.approx_count
            for r in sketches.cms_estimate(
                keys, "v", cms, depth=self.D, width=self.W
            ).collect()
        }
        assert est == freqs

    def test_weighted_build(self, spark, freqs):
        weighted = spark.createDataFrame(
            [(k, n) for k, n in freqs.items()], "v string, w long"
        )
        cms = sketches.cms_build(
            weighted, "v", weight_col="w", depth=self.D, width=self.W
        )
        keys = spark.createDataFrame([(k,) for k in freqs], "v string")
        est = {
            r.v: r.approx_count
            for r in sketches.cms_estimate(
                keys, "v", cms, depth=self.D, width=self.W
            ).collect()
        }
        assert est == freqs

    def test_shard_merge_equals_direct(self, spark, stream, freqs):
        h1 = stream.filter(F.substring("v", 6, 8).cast("int") % 2 == 0)
        h2 = stream.filter(F.substring("v", 6, 8).cast("int") % 2 == 1)
        merged = sketches.cms_merge(
            sketches.cms_build(h1, "v", depth=self.D, width=self.W),
            sketches.cms_build(h2, "v", depth=self.D, width=self.W),
        )
        direct = sketches.cms_build(stream, "v", depth=self.D, width=self.W)
        got = sorted((r.row_idx, r.col_idx, r.cnt) for r in merged.collect())
        exp = sorted((r.row_idx, r.col_idx, r.cnt) for r in direct.collect())
        assert got == exp

    def test_absent_key_estimates_low(self, spark, stream):
        cms = sketches.cms_build(stream, "v", depth=self.D, width=self.W)
        novel = spark.createDataFrame([("never_seen_abc",)], "v string")
        est = sketches.cms_estimate(
            novel, "v", cms, depth=self.D, width=self.W
        ).collect()[0].approx_count
        # total weight 780 over 256 columns: the min over 4 rows should
        # be far under the single-row expectation
        assert est <= 30

    def test_depth_rows_independent_under_base_hash_collision(self, spark):
        """Round-6 ADVICE regression: 'cmscol21060' and 'cmscol90424'
        share the same FIRST-8-HEX md5 prefix (the old 32-bit base
        hash), so under scheme v1 they landed in the same cell of
        EVERY depth row. Scheme v2 derives positions from the 60-bit
        hash, so at least one depth row must separate them."""
        import hashlib

        a, b = "cmscol21060", "cmscol90424"
        assert (
            hashlib.md5(a.encode()).hexdigest()[:8]
            == hashlib.md5(b.encode()).hexdigest()[:8]
        )
        df = spark.createDataFrame([(a,), (b,)], "v string")
        cells = sketches.cms_build(df, "v", depth=4, width=1 << 20)
        # 2 values x 4 rows: if any row holds a cnt=2 cell the pair
        # collided there; they must NOT collide in all 4
        collided_rows = [
            r.row_idx for r in cells.filter(F.col("cnt") == 2).collect()
        ]
        assert len(collided_rows) < 4, collided_rows

    def test_legacy_unversioned_sketch_is_rejected(self, spark):
        """A sketch with depth/width stamps but no 'scheme' column was
        built by the pre-v2 position hash: probing it must raise, not
        silently read the wrong cells."""
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        legacy = sketches.cms_build(df, "v", depth=4, width=256).drop("scheme")
        with pytest.raises(ValueError, match="hash-scheme"):
            sketches.cms_estimate(df, "v", legacy, depth=4, width=256)

    def test_scheme_mismatch_raises_eagerly_when_cached(self, spark):
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        wrong = (
            sketches.cms_build(df, "v", depth=4, width=256)
            .withColumn("scheme", F.lit(1).cast("int"))
            .cache()
        )
        try:
            wrong.count()
            with pytest.raises(ValueError, match="scheme"):
                sketches.cms_estimate(df, "v", wrong, depth=4, width=256)
        finally:
            wrong.unpersist()


class TestSketchParamGuards:
    def test_bloom_param_mismatch_raises_eagerly_when_cached(self, spark):
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        bloom = sketches.bloom_build(df, "v", m_bits=1 << 12, n_hashes=4).cache()
        try:
            bloom.count()  # materialize so the eager guard is free
            with pytest.raises(ValueError, match="m_bits"):
                sketches.bloom_probe(df, "v", bloom, m_bits=1 << 16, n_hashes=4)
        finally:
            bloom.unpersist()

    def test_cms_param_mismatch_raises_eagerly_when_cached(self, spark):
        df = spark.createDataFrame([("x",)], "v string")
        cms = sketches.cms_build(df, "v", depth=4, width=256).cache()
        try:
            cms.count()
            with pytest.raises(ValueError, match="width"):
                sketches.cms_estimate(df, "v", cms, depth=4, width=1024)
        finally:
            cms.unpersist()

    def test_bloom_param_mismatch_raises_for_unmaterialized(self, spark):
        # The probe materializes an unmaterialized sketch ONCE
        # (localCheckpoint) so the k join references stop re-running
        # the build aggregate, and the eager guard is complete again:
        # a wrong-parameter probe raises even when every lookup would
        # MISS (a join-side-only check would silently return false
        # negatives).
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        bloom = sketches.bloom_build(df, "v", m_bits=1 << 12, n_hashes=4)
        with pytest.raises(ValueError, match="n_hashes"):
            sketches.bloom_probe(df, "v", bloom, m_bits=1 << 12, n_hashes=8)

    def test_cms_param_mismatch_raises_for_unmaterialized(self, spark):
        df = spark.createDataFrame([("x",)], "v string")
        cms = sketches.cms_build(df, "v", depth=4, width=256)
        # all-miss regime (wrong width hashes to non-existent cells):
        # the old lazy join-side guard returned silent zero estimates
        # here; the materialize-then-check guard must raise
        with pytest.raises(ValueError, match="width"):
            sketches.cms_estimate(df, "v", cms, depth=4, width=1024)

    def test_merge_mismatched_shards_raises(self, spark):
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        a = sketches.bloom_build(df, "v", m_bits=1 << 12, n_hashes=4)
        b = sketches.bloom_build(df, "v", m_bits=1 << 13, n_hashes=4)
        with pytest.raises(Exception, match="mismatched m_bits"):
            sketches.bloom_merge(a, b).collect()
        c1 = sketches.cms_build(df, "v", depth=4, width=256)
        c2 = sketches.cms_build(df, "v", depth=4, width=512)
        with pytest.raises(Exception, match="mismatched depth/width"):
            sketches.cms_merge(c1, c2).collect()

    def test_merge_mismatch_survives_stamp_column_pruning(self, spark):
        # Round-4 ADVICE: selecting only the data columns let Catalyst
        # prune the stamp-column guard and a mismatched merge silently
        # produced a false-negative bitmap. The guard now rides the data
        # column itself, so even a stamp-free consumer raises.
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        a = sketches.bloom_build(df, "v", m_bits=1 << 12, n_hashes=4)
        b = sketches.bloom_build(df, "v", m_bits=1 << 13, n_hashes=4)
        pruned = sketches.bloom_merge(a, b).select("word_idx", "word")
        with pytest.raises(Exception, match="mismatched m_bits/n_hashes"):
            pruned.agg(F.sum("word")).collect()
        c1 = sketches.cms_build(df, "v", depth=4, width=256)
        c2 = sketches.cms_build(df, "v", depth=4, width=512)
        with pytest.raises(Exception, match="mismatched depth/width"):
            sketches.cms_merge(c1, c2).select("cnt").agg(F.sum("cnt")).collect()
        q1 = sketches.qsketch_build(df.selectExpr("length(v) AS n"), "n", sub_bits=3)
        q2 = sketches.qsketch_build(df.selectExpr("length(v) AS n"), "n", sub_bits=4)
        with pytest.raises(Exception, match="mismatched sub_bits"):
            sketches.qsketch_merge(q1, q2).select("cnt").agg(F.sum("cnt")).collect()

    def test_merge_uniform_shards_unaffected_by_guard(self, spark):
        df = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
        a = sketches.bloom_build(df.limit(2), "v", m_bits=1 << 12, n_hashes=4)
        b = sketches.bloom_build(df, "v", m_bits=1 << 12, n_hashes=4)
        direct = sketches.bloom_build(df, "v", m_bits=1 << 12, n_hashes=4)
        got = sorted(
            (r.word_idx, r.word)
            for r in sketches.bloom_merge(a, b).select("word_idx", "word").collect()
        )
        exp = sorted((r.word_idx, r.word) for r in direct.collect())
        assert got == exp

    def test_merge_same_params_passes_guard(self, spark):
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        a = sketches.bloom_build(df, "v", m_bits=1 << 12, n_hashes=4)
        b = sketches.bloom_build(df, "v", m_bits=1 << 12, n_hashes=4)
        merged = sketches.bloom_merge(a, b)
        flags = sketches.bloom_probe(df, "v", merged, m_bits=1 << 12, n_hashes=4)
        assert all(r.maybe_member for r in flags.collect())


class TestProbeAfterMerge:
    def test_bloom_probe_after_merge_keeps_guarantee(self, spark):
        a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "v string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "v string")
        m, k = 1 << 12, 4
        merged = sketches.bloom_merge(
            sketches.bloom_build(a, "v", m, k), sketches.bloom_build(b, "v", m, k)
        )
        both = a.unionByName(b)
        probed = sketches.bloom_probe(both, "v", merged, m, k)
        assert probed.filter(~F.col("maybe_member")).count() == 0

    def test_cms_estimate_after_merge(self, spark):
        rows = [(i, f"k{i % 7}") for i in range(70)]
        df = spark.createDataFrame(rows, "i long, v string")
        h1 = df.filter(F.col("i") < 35)
        h2 = df.filter(F.col("i") >= 35)
        merged = sketches.cms_merge(
            sketches.cms_build(h1, "v", depth=3, width=128),
            sketches.cms_build(h2, "v", depth=3, width=128),
        )
        keys = df.select("v").distinct()
        est = {
            r.v: r.approx_count
            for r in sketches.cms_estimate(
                keys, "v", merged, depth=3, width=128
            ).collect()
        }
        assert est == {f"k{i}": 10 for i in range(7)}


class TestQuantileSketch:
    def _vals(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "x bigint")

    def test_relative_error_bound(self, spark):
        import random

        from stepist_spark.operators.sketches import qsketch_build, qsketch_quantiles

        rng = random.Random(11)
        vals = [rng.randrange(0, 10**7) for _ in range(4000)]
        sk = qsketch_build(self._vals(spark, vals), "x", sub_bits=5)
        qs = [(1, 4), (1, 2), (3, 4), (9, 10), (99, 100)]
        got = {
            (r["q_num"], r["q_den"]): (r["est"], r["n"])
            for r in qsketch_quantiles(sk, qs, sub_bits=5).collect()
        }
        sv = sorted(vals)
        for (qn, qd), (est, n) in got.items():
            assert n == len(vals)
            rank = max(1, -(-qn * n // qd))
            true = sv[rank - 1]
            assert est <= true  # lower-bound estimator never overshoots
            assert true - est <= max(true / 32, 1)  # 2^-sub_bits relative

    def test_exact_region_is_exact(self, spark):
        from stepist_spark.operators.sketches import qsketch_build, qsketch_quantiles

        vals = list(range(32)) * 3  # all below 2^sub_bits
        sk = qsketch_build(self._vals(spark, vals), "x", sub_bits=5)
        est = qsketch_quantiles(sk, [(1, 2)], sub_bits=5).collect()[0]["est"]
        sv = sorted(vals)
        assert est == sv[max(1, -(-len(vals) // 2)) - 1]

    def test_merge_equals_direct(self, spark):
        from stepist_spark.operators.sketches import qsketch_build, qsketch_merge

        vals = [v * 37 % 100000 for v in range(2000)]
        df = self._vals(spark, vals)
        direct = qsketch_build(df, "x")
        merged = qsketch_merge(
            qsketch_build(df.filter("x % 3 = 0"), "x"),
            qsketch_build(df.filter("x % 3 = 1"), "x"),
            qsketch_build(df.filter("x % 3 = 2"), "x"),
        )
        a = sorted(map(tuple, direct.select("bucket", "cnt").collect()))
        b = sorted(map(tuple, merged.select("bucket", "cnt").collect()))
        assert a == b

    def test_mismatched_sub_bits_raises(self, spark):
        from stepist_spark.operators.sketches import qsketch_build, qsketch_merge

        df = self._vals(spark, [1, 100, 10000])
        m = qsketch_merge(qsketch_build(df, "x", 5), qsketch_build(df, "x", 6))
        try:
            m.collect()
            raise AssertionError("expected mixed-stamp merge to raise")
        except Exception as ex:
            assert "merge" in str(ex).lower() or "parameter" in str(ex).lower()


class TestRollingHllActives:
    def test_tracks_exact_within_error(self, spark):
        from stepist_spark.operators.sessions import rolling_active_users
        from stepist_spark.operators.sketches import rolling_hll_actives

        ev = load_table(spark, "/root/testdata/sf0.01", "events")
        exact = {
            str(r["day"]): r["active_users"]
            for r in rolling_active_users(ev, "user_id", "ts", 7).collect()
        }
        approx = {
            str(r["day"]): r["approx_active_users"]
            for r in rolling_hll_actives(ev, "user_id", "ts", 7).collect()
        }
        assert set(approx) == set(exact)
        for d, n in exact.items():
            # ~4.6% std error at p=9; allow 4 sigma
            assert abs(approx[d] - n) <= max(5, 0.2 * n), (d, n, approx[d])

    def test_window_one_matches_per_day_estimate(self, spark):
        from pyspark.sql import functions as F2

        from stepist_spark.operators.sketches import (
            portable_hll_estimate,
            portable_hll_registers,
            rolling_hll_actives,
        )

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        a = {
            str(r["day"]): r["approx_active_users"]
            for r in rolling_hll_actives(ev, "user_id", "ts", 1).collect()
        }
        days = ev.select(F2.to_date("ts").alias("day"), "user_id")
        regs = portable_hll_registers(days, ["day"], "user_id")
        b = {
            str(r["day"]): r["approx_distinct"]
            for r in portable_hll_estimate(regs, ["day"]).collect()
        }
        assert a == b


class TestHllPairIntersections:
    def test_inclusion_exclusion_accuracy(self, spark):
        from stepist_spark.operators.sketches import (
            hll_pair_intersections,
            portable_hll_registers,
        )

        # A = 0..999, B = 500..1499 -> |A∩B| = 500
        rows = [("A", i) for i in range(1000)] + [("B", i) for i in range(500, 1500)]
        df = spark.createDataFrame(rows, "label string, v bigint")
        regs = portable_hll_registers(df, "label", "v")
        [r] = hll_pair_intersections(regs, "label").collect()
        assert (r["label_a"], r["label_b"]) == ("A", "B")
        # HLL p=9 -> ~4.6% std error per estimate; the intersection
        # compounds three estimates, allow 15%
        assert abs(r["est_inter"] - 500) < 75, r["est_inter"]
        assert abs(r["est_union"] - 1500) < 150, r["est_union"]

    def test_disjoint_sets_near_zero(self, spark):
        from stepist_spark.operators.sketches import (
            hll_pair_intersections,
            portable_hll_registers,
        )

        rows = [("A", i) for i in range(800)] + [("B", i) for i in range(1000, 1800)]
        df = spark.createDataFrame(rows, "label string, v bigint")
        regs = portable_hll_registers(df, "label", "v")
        [r] = hll_pair_intersections(regs, "label").collect()
        assert abs(r["est_inter"]) < 120, r["est_inter"]


class TestCmsJoinSize:
    def test_upper_bound_and_accuracy(self, spark):
        from stepist_spark.operators.sketches import cms_build, cms_join_size

        # join size = sum over keys of c_a * c_b
        a_rows = [(k,) for k in range(200) for _ in range(3)]   # 200 keys x3
        b_rows = [(k,) for k in range(100, 300) for _ in range(2)]  # overlap 100..199
        a = spark.createDataFrame(a_rows, "k bigint")
        b = spark.createDataFrame(b_rows, "k bigint")
        exact = 100 * 3 * 2
        sa = cms_build(a, "k", depth=4, width=4096)
        sb = cms_build(b, "k", depth=4, width=4096)
        [r] = cms_join_size(sa, sb).collect()
        est = int(r["est_join_size"])
        assert est >= exact  # CMS inner product never under-estimates
        # expected additive noise ~ n_a*n_b/width = 600*400/4096 ~ 59
        assert est <= exact + 600, est

    def test_disjoint_near_zero(self, spark):
        from stepist_spark.operators.sketches import cms_build, cms_join_size

        a = spark.createDataFrame([(k,) for k in range(150)], "k bigint")
        b = spark.createDataFrame([(k,) for k in range(1000, 1150)], "k bigint")
        [r] = cms_join_size(
            cms_build(a, "k", depth=4, width=4096),
            cms_build(b, "k", depth=4, width=4096),
        ).collect()
        assert int(r["est_join_size"]) <= 30
