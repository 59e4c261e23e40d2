"""Connected components + deterministic sampling operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from stepist_spark.operators import sampling
from stepist_spark.operators.clusters import connected_components, dup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


class TestConnectedComponents:
    def test_two_components(self, spark):
        # {1,2,3} via 1-2, 2-3; {10,11}
        comp = connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
        got = {r["node"]: r["comp"] for r in comp.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_path_graph_converges_fast(self, spark):
        # a 64-node path is the worst case for plain neighbor
        # propagation (diameter 63); pointer jumping must close it
        # within the default max_iter=25 (O(log n))
        edges = [(i, i + 1) for i in range(63)]
        comp = connected_components(_pairs(spark, edges))
        rows = comp.collect()
        assert len(rows) == 64
        assert {r["comp"] for r in rows} == {0}

    def test_edge_direction_irrelevant(self, spark):
        a = connected_components(_pairs(spark, [(5, 2), (2, 9)]))
        b = connected_components(_pairs(spark, [(2, 5), (9, 2)]))
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_dup_clusters_sizes(self, spark):
        out = dup_clusters(_pairs(spark, [(1, 2), (2, 3), (10, 11)]))
        got = {r["doc_id"]: (r["cluster_id"], r["n_members"]) for r in out.collect()}
        assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}


class TestSampling:
    def test_split_is_deterministic_and_partition_independent(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = sampling.hash_split(df, "doc_id").select("doc_id", "split")
        b = sampling.hash_split(df.repartition(7), "doc_id").select("doc_id", "split")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_split_proportions_roughly_hold(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        counts = dict(
            sampling.hash_split(df, "doc_id").groupBy("split").count().collect()
        )
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > 6 * counts["test"]  # ~80 vs ~10
        assert abs(counts["val"] - counts["test"]) < 150

    def test_split_weights_must_sum(self, spark):
        try:
            sampling.split_label(F.lit(1), splits=(("a", 50), ("b", 10)))
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    def test_stratified_sample_size_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(i, "s%d" % (i % 3)) for i in range(90)], "doc_id bigint, src string"
        )
        s1 = sampling.stratified_sample(df, "src", "doc_id", 4)
        s2 = sampling.stratified_sample(df.repartition(5), "src", "doc_id", 4)
        rows1 = sorted(map(tuple, s1.collect()))
        assert rows1 == sorted(map(tuple, s2.collect()))
        per = dict(s1.groupBy("src").count().collect())
        assert per == {"s0": 4, "s1": 4, "s2": 4}

    def test_stratified_sample_small_stratum_keeps_all(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, src string")
        out = sampling.stratified_sample(df, "src", "doc_id", 5)
        assert out.count() == 3


class TestWeightedPrioritySample:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, w bigint")

    def test_deterministic_and_partition_independent(self, spark):
        rows = [(i, (i % 7) + 1) for i in range(300)]
        a = sampling.weighted_priority_sample(self._df(spark, rows), "doc_id", "w", 20)
        b = sampling.weighted_priority_sample(
            self._df(spark, rows).repartition(7), "doc_id", "w", 20
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        assert a.count() == 20

    def test_heavier_items_overrepresented(self, spark):
        rows = [(i, 1) for i in range(1000)] + [(i, 10) for i in range(1000, 2000)]
        out = sampling.weighted_priority_sample(self._df(spark, rows), "doc_id", "w", 200)
        heavy = out.filter("w = 10").count()
        # expectation ~10/11 of the sample; demand a clear majority
        assert heavy > 140

    def test_nonpositive_weights_dropped_and_small_groups_kept(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 5), (2, "a", 0), (3, "b", 2)], "doc_id bigint, g string, w bigint"
        )
        out = sampling.weighted_priority_sample(df, "doc_id", "w", 10, group_cols=["g"])
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
