"""Skew operators must be RESULT-identical to their naive equivalents —
they only change the physical distribution of work."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stepist_spark.operators import skew
from stepist_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, spark):
        li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
        orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        plain = li.join(orders, "l_orderkey")
        salted = skew.salted_join(li, orders, "l_orderkey", salt=8)
        assert _rows(salted.select(*plain.columns)) == _rows(plain)

    def test_left_matches_plain_join(self, spark):
        li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity").limit(200)
        small = spark.createDataFrame([(1, "x")], "l_orderkey long, tag string")
        plain = li.join(small, "l_orderkey", "left")
        salted = skew.salted_join(li, small, "l_orderkey", salt=4, how="left")
        assert _rows(salted.select(*plain.columns)) == _rows(plain)

    def test_rejects_right_join(self, spark):
        df = spark.range(2)
        with pytest.raises(ValueError, match="inner/left"):
            skew.salted_join(df, df, "id", how="right")

    def test_spreads_hot_key(self, spark):
        """All rows share ONE key: the salted pre-join distribution must
        occupy multiple salt shards (that's the whole point)."""
        hot = spark.range(1000).select(F.lit(1).alias("k"), F.col("id"))
        salted = hot.withColumn(
            "_salt", F.pmod(F.xxhash64("k", "id"), F.lit(8)).cast("int")
        )
        assert salted.select("_salt").distinct().count() > 4


class TestSaltedAgg:
    def test_matches_plain_groupby(self, spark):
        li = load_table(spark, SF, "lineitem")
        plain = li.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("s"),
            F.count("l_quantity").alias("c"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
            F.avg("l_quantity").alias("a"),
        )
        two_phase = skew.salted_agg(
            li,
            "l_returnflag",
            {
                "s": ("l_quantity", "sum"),
                "c": ("l_quantity", "count"),
                "mn": ("l_quantity", "min"),
                "mx": ("l_quantity", "max"),
                "a": ("l_quantity", "avg"),
            },
            salt=8,
        )
        # l_quantity values are whole numbers -> sums/avgs are FP-exact
        assert _rows(two_phase.select(*plain.columns)) == _rows(plain)

    def test_rejects_non_algebraic(self, spark):
        with pytest.raises(ValueError, match="algebraic"):
            skew.salted_agg(spark.range(3), "id", {"x": ("id", "median")})


class TestSkewReport:
    def test_top_keys_and_shares(self, spark):
        from stepist_spark.operators.skew import skew_report

        rows = [("hot",)] * 50 + [("warm",)] * 30 + [("a",)] * 10 + [("b",)] * 10
        df = spark.createDataFrame(rows, "k string")
        got = [
            (r["k"], r["n_rows"], r["share"])
            for r in skew_report(df, "k", top_n=2).collect()
        ]
        assert got == [("hot", 50, 0.5), ("warm", 30, 0.3)]

    def test_tie_breaks_by_key(self, spark):
        from stepist_spark.operators.skew import skew_report

        df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
        got = [r["k"] for r in skew_report(df, "k", top_n=2).collect()]
        assert got == ["a", "b"]


class TestLshBandJoinSkew:
    """Round-6 verdict #6: a duplicate-heavy corpus makes some
    (band, signature) buckets hot in minhash_lsh_candidates' self-join.
    The scale story is broadcast (skew-immune) below the threshold and
    AQE skew-split sort-merge above it — plant a hot bucket and pin
    correctness under BOTH plans."""

    @staticmethod
    def _hot_corpus(spark, n_dup=40, n_uniq=20):
        # n_dup identical docs -> every band bucket they share is hot
        dup = [(i, "the quick brown fox jumps over the lazy dog") for i in range(n_dup)]
        uniq = [
            (1000 + i, f"unique document number {i} about topic {i * 7} entirely")
            for i in range(n_uniq)
        ]
        return spark.createDataFrame(dup + uniq, "doc_id bigint, text string")

    def _pairs(self, spark, df):
        from stepist_spark.operators.dedup import minhash_lsh_candidates

        cands = minhash_lsh_candidates(df, "doc_id", "text", n_hashes=8, bands=4)
        return cands, sorted((r.id_a, r.id_b) for r in cands.collect())

    def test_hot_bucket_yields_all_dup_pairs_broadcast_plan(self, spark):
        from stepist_spark.plans import inspect as plans

        cands, got = self._pairs(spark, self._hot_corpus(spark))
        n_dup = 40
        expected = sorted((a, b) for a in range(n_dup) for b in range(a + 1, n_dup))
        # every identical-doc pair must surface (identical signatures
        # collide in every band); unique docs must not flood in
        assert [p for p in got if p[0] < 1000 and p[1] < 1000] == expected
        strategies = plans.join_strategies(cands)
        assert "CartesianProduct" not in strategies

    def test_hot_bucket_correct_under_forced_sort_merge(self, spark):
        """Past the broadcast threshold the same join must run as a
        skew-splittable sort-merge with AQE skew handling on."""
        from stepist_spark.plans import inspect as plans

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            cands, got = self._pairs(spark, self._hot_corpus(spark))
            n_dup = 40
            expected = sorted(
                (a, b) for a in range(n_dup) for b in range(a + 1, n_dup)
            )
            assert [p for p in got if p[0] < 1000 and p[1] < 1000] == expected
            strategies = plans.join_strategies(cands)
            assert "SortMergeJoin" in strategies, strategies
            # the operator enforces the runtime tuning itself, so the
            # skew split is available even on a foreign session
            assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
            assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


class TestIncrementalLsh:
    """minhash_lsh_candidates_between: the new-batch-vs-base shape."""

    @staticmethod
    def _frames(spark):
        base = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog tonight"),
                (2, "an entirely different text about spark physical plans"),
                (3, "yet another unrelated document mentioning parquet files"),
            ],
            "doc_id bigint, text string",
        )
        new = spark.createDataFrame(
            [
                # near-copy of base doc 1 -> must be flagged
                (101, "the quick brown fox jumps over the lazy dog today"),
                # novel content -> must not pair
                (102, "completely novel material with no shared shingles whatsoever"),
            ],
            "doc_id bigint, text string",
        )
        return base, new

    def test_flags_near_copy_of_base_only(self, spark):
        from stepist_spark.operators.dedup import minhash_lsh_candidates_between

        base, new = self._frames(spark)
        got = sorted(
            (r.base_id, r.new_id)
            for r in minhash_lsh_candidates_between(
                new, base, "doc_id", "text"
            ).collect()
        )
        assert (1, 101) in got
        assert all(n != 102 for _, n in got)
        # no base-base or new-new pairs ever
        assert all(b <= 3 and n >= 101 for b, n in got)

    def test_reused_base_index_matches_fresh(self, spark):
        from stepist_spark.operators.dedup import (
            banded_signatures,
            minhash_lsh_candidates_between,
        )

        base, new = self._frames(spark)
        idx = banded_signatures(base, "doc_id", "text").localCheckpoint()
        fresh = sorted(
            map(
                tuple,
                minhash_lsh_candidates_between(new, base, "doc_id", "text").collect(),
            )
        )
        reused = sorted(
            map(
                tuple,
                minhash_lsh_candidates_between(
                    new, base, "doc_id", "text", base_banded=idx
                ).collect(),
            )
        )
        assert fresh == reused

    def test_self_join_unchanged_by_refactor(self, spark):
        """The banding extraction must leave the self-join results
        identical: a doc and its near-copy in ONE frame still pair."""
        from stepist_spark.operators.dedup import minhash_lsh_candidates

        base, new = self._frames(spark)
        both = base.unionByName(new)
        got = sorted(
            (r.id_a, r.id_b)
            for r in minhash_lsh_candidates(both, "doc_id", "text").collect()
        )
        assert (1, 101) in got
