"""Welch t and two-proportion z vs pure-Python closed forms."""

from __future__ import annotations

import math

from stepist_spark.operators.abtest import two_proportion_ztest, welch_ttest


def _welch_ref(xs, ys):
    na, nb = len(xs), len(ys)
    ma, mb = sum(xs) / na, sum(ys) / nb
    va = sum((x - ma) ** 2 for x in xs) / (na - 1)
    vb = sum((y - mb) ** 2 for y in ys) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return t, df


class TestWelch:
    def test_matches_closed_form(self, spark):
        xs = [10.25, 11.50, 9.75, 12.00, 10.00, 11.25]
        ys = [8.50, 9.00, 7.75, 8.25]
        rows = [("A", x) for x in xs] + [("B", y) for y in ys] + [("C", 99.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = welch_ttest(df, "g", "A", "B", "v").collect()[0]
        t, wdf = _welch_ref(xs, ys)
        assert (r["n_a"], r["n_b"]) == (6, 4)
        assert abs(r["t_stat"] - t) < 1e-5
        assert abs(r["welch_df"] - wdf) < 1e-5
        assert abs(r["mean_a"] - sum(xs) / 6) < 1e-6
        assert r["sum_a"] == round(sum(xs) * 100)

    def test_degenerate_small_group(self, spark):
        df = spark.createDataFrame([("A", 1.0), ("B", 2.0), ("B", 3.0)], "g string, v double")
        r = welch_ttest(df, "g", "A", "B", "v").collect()[0]
        assert r["t_stat"] is None and r["welch_df"] is None


class TestPropZ:
    def test_matches_closed_form(self, spark):
        rows = [("A", i < 30) for i in range(100)] + [("B", i < 20) for i in range(80)]
        df = spark.createDataFrame(rows, "g string, y boolean")
        r = two_proportion_ztest(df, "g", "A", "B", "y").collect()[0]
        pa, pb = 0.3, 0.25
        pp = 50 / 180
        z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 80))
        assert (r["n_a"], r["s_a"], r["n_b"], r["s_b"]) == (100, 30, 80, 20)
        assert abs(r["z_stat"] - z) < 1e-5

    def test_degenerate_all_success(self, spark):
        df = spark.createDataFrame([("A", True), ("B", True)], "g string, y boolean")
        r = two_proportion_ztest(df, "g", "A", "B", "y").collect()[0]
        assert r["z_stat"] is None
