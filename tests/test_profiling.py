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


class TestBenfordDigits:
    def test_shares_and_expected(self, spark):
        from stepist_spark.operators.profiling import benford_digits

        # 19, 19, 2.5, 35, -4 (excluded), 0 (excluded)
        df = spark.createDataFrame(
            [(19.0,), (19.0,), (2.5,), (35.0,), (-4.0,), (0.0,)], "v double"
        )
        got = {r["digit"]: r for r in benford_digits(df, "v").collect()}
        assert set(got) == {"1", "2", "3"}
        assert got["1"]["n"] == 2 and got["1"]["total"] == 4
        assert got["1"]["share"] == 0.5
        import math

        assert abs(got["1"]["expected"] - round(math.log10(2), 6)) < 1e-12
        assert got["2"]["n"] == 1  # 2.5 -> cents 250 -> digit 2

    def test_power_of_ten_boundary(self, spark):
        from stepist_spark.operators.profiling import benford_digits

        # 10.00 -> cents 1000 -> digit 1; 9.996 -> 1000.1 -> 1000 -> 1;
        # 9.995 is binary ~999.49999... so it stays 999 -> digit 9 (the
        # same IEEE value both engines see — no string-vs-log10 risk)
        df = spark.createDataFrame([(10.0,), (9.996,), (9.995,)], "v double")
        got = {r["digit"]: r["n"] for r in benford_digits(df, "v").collect()}
        assert got == {"1": 2, "9": 1}


class TestColumnEntropy:
    def test_matches_python(self, spark):
        import math

        from stepist_spark.operators.profiling import column_entropy

        vals = ["a", "a", "a", "b", "b", "c", None]
        df = spark.createDataFrame([(v,) for v in vals], "x string")
        [r] = column_entropy(df, ["x"]).collect()
        assert r["n"] == 6 and r["n_distinct"] == 3
        counts = [3, 2, 1]
        s = sum(c * math.floor(math.log(c) * 1_000_000) for c in counts)
        exp = round(math.log(6) - s / (6 * 1_000_000), 6)
        assert r["entropy"] == exp

    def test_constant_column_zero(self, spark):
        from stepist_spark.operators.profiling import column_entropy

        df = spark.createDataFrame([("k",)] * 5, "x string")
        [r] = column_entropy(df, ["x"]).collect()
        assert abs(r["entropy"]) < 1e-5
