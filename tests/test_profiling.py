"""Table profiler: one-pass exact per-column stats."""

from __future__ import annotations

from stepist_spark.operators.profiling import profile_table


class TestProfileTable:
    def test_stats(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (4, "b")], "id bigint, tag string"
        )
        got = {r["col_name"]: r for r in profile_table(df).collect()}
        assert set(got) == {"id", "tag"}
        assert (got["id"]["n_rows"], got["id"]["n_nulls"], got["id"]["n_distinct"]) == (4, 0, 4)
        assert (got["id"]["min_repr"], got["id"]["max_repr"]) == ("1", "4")
        assert (got["tag"]["n_nulls"], got["tag"]["n_distinct"]) == (1, 2)
        assert (got["tag"]["min_repr"], got["tag"]["max_repr"]) == ("a", "b")

    def test_column_subset(self, spark):
        df = spark.createDataFrame([(1, "x")], "id bigint, tag string")
        got = profile_table(df, ["tag"]).collect()
        assert len(got) == 1 and got[0]["col_name"] == "tag"

    def test_single_scan_plan(self, spark):
        # the multi-distinct agg must compile to ONE scan (Expand),
        # not one scan per column
        df = spark.range(100).selectExpr("id", "id % 7 AS a", "id % 3 AS b")
        plan = profile_table(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Range (0, 100") == 1

    def test_empty_cols_rejected(self, spark):
        df = spark.range(1)
        try:
            profile_table(df, [])
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
