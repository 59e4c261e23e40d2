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


def _cuped_ref(rows):
    """rows: (group, y, x) in original units; scale=100 both."""
    ys = [round(y * 100) for _, y, _ in rows]
    xs = [round(x * 100) for _, _, x in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    covn = n * sxy - sx * sy
    varxn = n * sxx - sx * sx
    varyn = n * syy - sy * sy
    theta = covn / varxn
    xbar = sx / n
    out = {}
    for g in ("A", "B"):
        idx = [i for i, r in enumerate(rows) if r[0] == g]
        na = len(idx)
        sya = sum(ys[i] for i in idx)
        sxa = sum(xs[i] for i in idx)
        out[g] = (sya / na - theta * (sxa / na - xbar)) / 100.0
    rho2 = covn * covn / (varxn * varyn)
    return theta, out, rho2


class TestCuped:
    ROWS = [
        ("A", 10.0, 5.0), ("A", 12.0, 7.0), ("A", 9.0, 4.0), ("A", 11.5, 6.5),
        ("B", 8.0, 5.5), ("B", 9.5, 6.0), ("B", 7.0, 3.5), ("B", 10.0, 7.5),
        ("C", 99.0, 1.0),  # excluded arm
    ]

    def test_matches_closed_form(self, spark):
        from stepist_spark.operators.abtest import cuped_adjusted

        df = spark.createDataFrame(self.ROWS, "g string, y double, x double")
        r = cuped_adjusted(df, "g", "A", "B", "y", "x").collect()[0]
        theta, adj, rho2 = _cuped_ref([t for t in self.ROWS if t[0] != "C"])
        assert (r["n_a"], r["n_b"]) == (4, 4)
        assert abs(r["theta"] - theta) < 1e-5
        assert abs(r["adj_mean_a"] - adj["A"]) < 1e-5
        assert abs(r["adj_mean_b"] - adj["B"]) < 1e-5
        assert abs(r["rho2"] - rho2) < 1e-5
        # adjustment moves toward the covariate-corrected value but the
        # pooled-mean identity holds: weighted adj means == weighted raw
        raw = (r["mean_a"] * 4 + r["mean_b"] * 4) / 8
        adj_pool = (r["adj_mean_a"] * 4 + r["adj_mean_b"] * 4) / 8
        assert abs(raw - adj_pool) < 1e-5

    def test_degenerate_constant_covariate(self, spark):
        from stepist_spark.operators.abtest import cuped_adjusted

        rows = [("A", 1.0, 5.0), ("A", 2.0, 5.0), ("B", 3.0, 5.0)]
        df = spark.createDataFrame(rows, "g string, y double, x double")
        r = cuped_adjusted(df, "g", "A", "B", "y", "x").collect()[0]
        assert r["theta"] is None and r["adj_mean_a"] is None and r["rho2"] is None
        assert r["mean_a"] is not None  # raw means still reported

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.abtest import cuped_adjusted, cuped_adjusted_sql

        rows = [
            ("A" if i % 2 == 0 else "B", float(i % 17) + 0.25, float(i % 7) + 0.5)
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "g string, y double, x double")
        p = str(tmp_path / "cuped.parquet")
        df.write.parquet(p)
        got = [tuple(r) for r in cuped_adjusted(df, "g", "A", "B", "y", "x").collect()]
        con = duckdb.connect()
        want = con.execute(
            cuped_adjusted_sql(
                f"SELECT * FROM '{p}/*.parquet'", "g", "A", "B", "y", "x"
            )
        ).fetchall()
        assert got == want


def _mwu_ref(xs, ys):
    from collections import Counter

    u = sum(
        (1.0 if x > y else 0.5 if x == y else 0.0) for x in xs for y in ys
    )
    n1, n2 = len(xs), len(ys)
    n = n1 + n2
    tie = sum(t**3 - t for t in Counter(xs + ys).values())
    sig2 = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - n1 * n2 / 2) / math.sqrt(sig2)
    return u, z


class TestMannWhitney:
    def test_matches_closed_form(self, spark):
        from stepist_spark.operators.abtest import mann_whitney_u

        xs = [10.25, 11.50, 9.75, 12.00, 10.00, 11.25, 9.75]
        ys = [8.50, 9.00, 7.75, 8.25, 9.75, 10.25]
        rows = [("A", x) for x in xs] + [("B", y) for y in ys] + [("C", 99.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        r = mann_whitney_u(df, "g", "A", "B", "v").collect()[0]
        u, z = _mwu_ref(xs, ys)
        assert (r["n_a"], r["n_b"]) == (7, 6)
        assert float(r["u2_a"]) == 2 * u
        assert abs(r["z_stat"] - z) < 1e-5

    def test_all_tied_is_null(self, spark):
        from stepist_spark.operators.abtest import mann_whitney_u

        rows = [("A", 5.0)] * 3 + [("B", 5.0)] * 4
        df = spark.createDataFrame(rows, "g string, v double")
        r = mann_whitney_u(df, "g", "A", "B", "v").collect()[0]
        assert float(r["u2_a"]) == 2 * (3 * 4 * 0.5)  # all half-ties
        assert r["z_stat"] is None  # zero variance

    def test_empty_group_is_null(self, spark):
        from stepist_spark.operators.abtest import mann_whitney_u

        df = spark.createDataFrame([("A", 1.0), ("A", 2.0)], "g string, v double")
        r = mann_whitney_u(df, "g", "A", "B", "v").collect()[0]
        assert r["z_stat"] is None

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.abtest import mann_whitney_u, mann_whitney_u_sql

        rows = [
            ("A" if i % 3 == 0 else "B", float(i % 23) + (0.25 if i % 2 else 0.75))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        p = str(tmp_path / "mwu.parquet")
        df.write.parquet(p)
        got = [tuple(r) for r in mann_whitney_u(df, "g", "A", "B", "v").collect()]
        con = duckdb.connect()
        want = con.execute(
            mann_whitney_u_sql(f"SELECT * FROM '{p}/*.parquet'", "g", "A", "B", "v")
        ).fetchall()
        assert [tuple(map(float, g)) for g in got] == [
            tuple(map(float, w)) for w in want
        ]


def _kw_ref(groups):
    """groups: {name: [cents...]} — textbook H with the same sorted
    left-fold convention the operator documents."""
    from collections import Counter
    from itertools import groupby as _gb

    allv = sorted(c for xs in groups.values() for c in xs)
    n = len(allv)
    ranks, i = {}, 0
    for v, grp in _gb(allv):
        m = len(list(grp))
        ranks[v] = i + (m + 1) / 2
        i += m
    srn = 0.0
    for g in sorted(groups):
        r2 = 2 * sum(ranks[c] for c in groups[g])
        srn += r2 * r2 / (4.0 * len(groups[g]))
    tie = sum(t**3 - t for t in Counter(allv).values())
    h = 12.0 * srn / (n * (n + 1)) - 3.0 * (n + 1)
    c = 1.0 - tie / (n**3 - n)
    return h, (h / c if c > 0 else None)


class TestKruskalWallis:
    def test_matches_closed_form(self, spark):
        from stepist_spark.operators.abtest import kruskal_wallis

        data = {
            "A": [10.25, 11.50, 9.75, 12.00, 10.00],
            "B": [8.50, 9.00, 7.75, 9.75, 8.25],
            "C": [10.25, 13.00, 12.50, 11.75],
        }
        rows = [(g, v) for g, xs in data.items() for v in xs]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["g"]: r for r in kruskal_wallis(df, "g", "v").collect()}
        h, hc = _kw_ref({g: [round(v * 100) for v in xs] for g, xs in data.items()})
        assert set(out) == {"A", "B", "C"}
        assert all(r["n"] == 14 for r in out.values())
        assert abs(out["A"]["h"] - h) < 1e-6
        assert abs(out["A"]["h_tie"] - hc) < 1e-6
        # exact doubled rank sums: Σ over all groups == N(N+1)
        assert sum(int(r["r2x"]) for r in out.values()) == 14 * 15

    def test_two_groups_squares_mwu_z(self, spark):
        """With k=2 and no ties, H == z² of the Mann-Whitney test."""
        from stepist_spark.operators.abtest import kruskal_wallis, mann_whitney_u

        rows = [("A", float(i) + 0.25) for i in range(9)] + [
            ("B", float(i) + 0.5) for i in range(7)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        (kw,) = {r["h"] for r in kruskal_wallis(df, "g", "v").collect()},
        z = mann_whitney_u(df, "g", "A", "B", "v").collect()[0]["z_stat"]
        assert abs(list(kw)[0] - z * z) < 1e-4

    def test_all_tied_null_h_tie(self, spark):
        from stepist_spark.operators.abtest import kruskal_wallis

        df = spark.createDataFrame(
            [("A", 5.0)] * 3 + [("B", 5.0)] * 2, "g string, v double"
        )
        out = kruskal_wallis(df, "g", "v").collect()
        assert all(r["h_tie"] is None for r in out)

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.abtest import kruskal_wallis, kruskal_wallis_sql

        rows = [
            (["A", "B", "C", "D"][i % 4], float(i % 19) + (0.25 if i % 3 else 0.5))
            for i in range(500)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        p = str(tmp_path / "kw.parquet")
        df.write.parquet(p)
        got = sorted(
            (r["g"], r["n_g"], int(r["r2x"]), r["n"], r["h"], r["h_tie"])
            for r in kruskal_wallis(df, "g", "v").collect()
        )
        con = duckdb.connect()
        want = sorted(
            (w[0], w[1], int(w[2]), w[3], w[4], w[5])
            for w in con.execute(
                kruskal_wallis_sql(f"SELECT * FROM '{p}/*.parquet'", "g", "v")
            ).fetchall()
        )
        assert got == want


class TestDiffInDiff:
    def _rows(self):
        # planted effect: +2.0 only in the treated-post cell
        return [
            (i % 2 == 0, i % 3 == 0,
             float(i % 23) + 0.25 + (2.0 if (i % 2 == 0 and i % 3 == 0) else 0.0))
            for i in range(300)
        ]

    def test_matches_closed_form(self, spark):
        import statistics

        from pyspark.sql import functions as F

        from stepist_spark.operators.abtest import diff_in_diff

        rows = self._rows()
        cells = {}
        for t, p, v in rows:
            cells.setdefault(("t" if t else "c") + ("1" if p else "0"), []).append(
                round(v * 100)
            )
        m = {k: sum(v) / len(v) for k, v in cells.items()}
        var = {k: statistics.variance(v) for k, v in cells.items()}
        did = ((m["t1"] - m["t0"]) - (m["c1"] - m["c0"])) / 100.0
        se = math.sqrt(sum(var[k] / len(cells[k]) for k in cells))
        t_ref = ((m["t1"] - m["t0"]) - (m["c1"] - m["c0"])) / se
        df = spark.createDataFrame(rows, "treat boolean, post boolean, v double")
        (r,) = diff_in_diff(df, F.col("treat"), F.col("post"), "v").collect()
        assert abs(r["did"] - did) < 1e-6
        assert abs(r["t_stat"] - t_ref) < 1e-6
        assert r["n_t1"] == len(cells["t1"])
        # the planted +2.0 is recovered (shared trend cancelled)
        assert abs(r["did"] - 2.0) < 0.01 or r["did"] > 1.0

    def test_small_cell_null(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.abtest import diff_in_diff

        rows = [(True, True, 1.0), (True, False, 2.0), (True, False, 3.0),
                (False, True, 4.0), (False, True, 5.0), (False, False, 6.0),
                (False, False, 7.0)]
        df = spark.createDataFrame(rows, "treat boolean, post boolean, v double")
        (r,) = diff_in_diff(df, F.col("treat"), F.col("post"), "v").collect()
        assert r["did"] is None and r["t_stat"] is None  # t1 cell has n=1

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from pyspark.sql import functions as F

        from stepist_spark.operators.abtest import diff_in_diff, diff_in_diff_sql

        rows = self._rows()
        df = spark.createDataFrame(rows, "treat boolean, post boolean, v double")
        p = str(tmp_path / "did.parquet")
        df.write.parquet(p)
        got = [tuple(r) for r in diff_in_diff(df, F.col("treat"), F.col("post"), "v").collect()]
        con = duckdb.connect()
        want = con.execute(
            diff_in_diff_sql(f"SELECT * FROM '{p}/*.parquet'", "treat", "post", "v")
        ).fetchall()
        assert [tuple(map(float, g)) for g in got] == [tuple(map(float, w)) for w in want]


class TestSharedRankStats:
    """The value_counts= reuse inputs and the fused rank_stats_shared
    pass (round-10 verdict #2) must be bit-identical to the
    self-scanning operators."""

    def _df(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (rng.choice("OFP"), rng.choice(["hi", "md", "lo"]),
             round(rng.uniform(5, 40), 2))
            for _ in range(600)
        ]
        return spark.createDataFrame(rows, "s string, p string, v double")

    def _base(self, df):
        from pyspark.sql import functions as F

        cents = F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint")
        return df.groupBy("s", "p", cents.alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )

    def test_value_counts_paths_match_self_scan(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.abtest import (
            kruskal_wallis,
            mann_whitney_u,
            welch_ttest_sliced,
        )

        df = self._df(spark)
        base = self._base(df)
        svc = base.groupBy(F.col("s"), "v").agg(
            F.sum("c").cast("bigint").alias("c")
        )
        pvc = base.groupBy(F.col("p"), "v").agg(
            F.sum("c").cast("bigint").alias("c")
        )
        direct = mann_whitney_u(df, "s", "O", "F", "v").collect()
        reused = mann_whitney_u(
            df, "s", "O", "F", "v", value_counts=svc
        ).collect()
        assert direct == reused
        d_kw = sorted(map(tuple, kruskal_wallis(df, "p", "v").collect()))
        r_kw = sorted(
            map(tuple, kruskal_wallis(df, "p", "v", value_counts=pvc).collect())
        )
        assert d_kw == r_kw
        d_w = sorted(map(tuple, welch_ttest_sliced(
            df, ["p"], "s", "O", "F", "v").collect()))
        r_w = sorted(map(tuple, welch_ttest_sliced(
            df, ["p"], "s", "O", "F", "v", value_counts=base).collect()))
        assert d_w == r_w

    def test_gini_value_counts_matches(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.anomaly import gini_coefficient

        df = self._df(spark)
        pvc = self._base(df).groupBy(F.col("p"), "v").agg(
            F.sum("c").cast("bigint").alias("c")
        )
        direct = sorted(map(tuple, gini_coefficient(df, ["p"], "v").collect()))
        reused = sorted(map(tuple, gini_coefficient(
            df, ["p"], "v", value_counts=pvc).collect()))
        assert direct == reused

    def test_fused_matches_standalone(self, spark):
        from stepist_spark.operators.abtest import (
            kruskal_wallis,
            mann_whitney_u,
            rank_stats_shared,
        )

        df = self._df(spark)
        base = self._base(df)
        mw_f, kw_f = rank_stats_shared(base, "s", "O", "F", "p")
        assert mw_f.collect() == mann_whitney_u(df, "s", "O", "F", "v").collect()
        # the fused frame carries the full value domain (P-only values
        # appear with ca = cb = 0) — mwu statistics must be unchanged
        got = sorted(map(tuple, kw_f.collect()))
        want = sorted(map(tuple, kruskal_wallis(df, "p", "v").collect()))
        assert got == want
        assert kw_f.columns == kruskal_wallis(df, "p", "v").columns

    def test_fused_empty_arm(self, spark):
        from stepist_spark.operators.abtest import rank_stats_shared

        df = self._df(spark).filter("s <> 'O'")
        mw_f, _ = rank_stats_shared(self._base(df), "s", "O", "F", "p")
        row = mw_f.collect()[0]
        assert row["n_a"] == 0 and row["z_stat"] is None


class TestBenjaminiHochberg:
    def test_p_matches_erfc_reference(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.abtest import bh_discoveries

        stats = spark.createDataFrame(
            [("a", 1.0), ("b", 2.5), ("c", 0.0), ("d", -3.2)],
            "k string, t_stat double",
        )
        out = {r["k"]: r for r in bh_discoveries(stats, ["k"], fdr_q=0.05).collect()}
        for k, t in [("a", 1.0), ("b", 2.5), ("c", 0.0), ("d", -3.2)]:
            p_ref = math.erfc(abs(t) / math.sqrt(2))
            # A&S 7.1.26 is accurate to 1.5e-7
            assert abs(out[k]["p_scaled"] / 1e6 - p_ref) < 1e-5, (k, t)

    def test_step_up_rejection_set(self, spark):
        from stepist_spark.operators.abtest import bh_discoveries

        # hand-picked z's: p ~ [.0016, .012, .046, .317, .617]
        stats = spark.createDataFrame(
            [("a", 3.16), ("b", 2.5), ("c", 2.0), ("d", 1.0), ("e", 0.5)],
            "k string, t_stat double",
        )
        out = {r["k"]: r for r in bh_discoveries(stats, ["k"], fdr_q=0.10).collect()}
        # BH at q=.10, m=5: crit = .02, .04, .06, .08, .10 ->
        # p1<=.02 T, p2<=.04 T, p3(.0455)<=.06 T, p4 F, p5 F; k*=3
        rejected = {k for k, r in out.items() if r["rejected"]}
        assert rejected == {"a", "b", "c"}
        assert all(r["m"] == 5 for r in out.values())

    def test_step_up_rescues_below_threshold_ranks(self, spark):
        from stepist_spark.operators.abtest import bh_discoveries

        # classic step-UP property: p2 fails its own crit but a LATER
        # rank passes, so p2 is still rejected (k* dominates)
        stats = spark.createDataFrame(
            [("a", 3.3), ("b", 2.0), ("c", 2.1), ("d", 2.05)],
            "k string, t_stat double",
        )
        out = {r["k"]: r for r in bh_discoveries(stats, ["k"], fdr_q=0.20).collect()}
        # m=4, crits .05 .10 .15 .20; ps ~ .00097 .0357 .0404 .0455
        assert {k for k, r in out.items() if r["rejected"]} == {"a", "b", "c", "d"}

    def test_null_stats_excluded_from_family(self, spark):
        from stepist_spark.operators.abtest import bh_discoveries

        stats = spark.createDataFrame(
            [("a", 3.16), ("b", None), ("c", 0.5)], "k string, t_stat double"
        )
        out = bh_discoveries(stats, ["k"], fdr_q=0.10).collect()
        assert {r["k"] for r in out} == {"a", "c"}  # b dropped
        assert all(r["m"] == 2 for r in out)  # family size excludes b

    def test_sliced_welch_and_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.abtest import (
            bh_discoveries,
            bh_discoveries_sql,
            welch_ttest_sliced,
            welch_ttest_sliced_sql,
        )

        rows = []
        for s in range(6):
            shift = 3.0 if s < 3 else 0.0
            for i in range(60):
                rows.append((f"s{s}", "A", float(i % 17) + 0.25 + shift))
                rows.append((f"s{s}", "B", float(i % 17) + 0.35))
        df = spark.createDataFrame(rows, "slice string, g string, v double")
        p = str(tmp_path / "bh.parquet")
        df.write.parquet(p)
        st = welch_ttest_sliced(df, ["slice"], "g", "A", "B", "v")
        got = sorted(
            tuple(r) for r in bh_discoveries(st, ["slice"], fdr_q=0.10).collect()
        )
        con = duckdb.connect()
        ssql = welch_ttest_sliced_sql(
            f"SELECT * FROM '{p}/*.parquet'", ["slice"], "g", "A", "B", "v"
        )
        want = sorted(con.execute(bh_discoveries_sql(ssql, ["slice"], "t_stat", 0.10)).fetchall())
        assert [tuple(map(str, a)) for a in got] == [tuple(map(str, b)) for b in want]
        assert {r[0] for r in got if r[-1]} == {"s0", "s1", "s2"}


class TestOneWayAnova:
    def _data(self):
        return {
            "A": [10.25, 11.50, 9.75, 12.00, 10.00],
            "B": [8.50, 9.00, 7.75, 9.75, 8.25],
            "C": [10.25, 13.00, 12.50, 11.75],
        }

    def _ref(self, data):
        # closed-form over scaled ints with the same sorted fold
        groups = {g: [round(v * 100) for v in xs] for g, xs in sorted(data.items())}
        n = sum(len(xs) for xs in groups.values())
        k = len(groups)
        s = sum(sum(xs) for xs in groups.values())
        q = sum(x * x for xs in groups.values() for x in xs)
        fold = 0.0
        for g in sorted(groups):
            sg = sum(groups[g])
            fold += float(sg) * float(sg) / float(len(groups[g]))
        grand = float(s) * float(s) / n
        ssb, ssw, sst = fold - grand, q - fold, q - grand
        return (ssb / (k - 1)) / (ssw / (n - k)), ssb / sst

    def test_matches_closed_form(self, spark):
        from stepist_spark.operators.abtest import one_way_anova

        data = self._data()
        rows = [(g, v) for g, xs in data.items() for v in xs]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["g"]: r for r in one_way_anova(df, "g", "v").collect()}
        f, eta2 = self._ref(data)
        assert set(out) == {"A", "B", "C"}
        r = out["A"]
        assert (r["k"], r["n"]) == (3, 14)
        assert abs(r["f_stat"] - f) < 1e-6
        assert abs(r["eta2"] - eta2) < 1e-6
        assert 0.0 <= r["eta2"] <= 1.0
        # exact sufficient statistics
        assert int(out["B"]["s_g"]) == sum(round(v * 100) for v in data["B"])

    def test_degenerate_edges(self, spark):
        from stepist_spark.operators.abtest import one_way_anova

        # all values tied: SSW = SSB = 0 -> NULL f and NULL eta2
        tied = spark.createDataFrame(
            [("A", 5.0)] * 3 + [("B", 5.0)] * 3, "g string, v double"
        )
        r = one_way_anova(tied, "g", "v").collect()[0]
        assert r["f_stat"] is None and r["eta2"] is None
        # single group: k < 2 -> NULL
        one = spark.createDataFrame([("A", 1.0), ("A", 2.0)], "g string, v double")
        r = one_way_anova(one, "g", "v").collect()[0]
        assert r["k"] == 1 and r["f_stat"] is None

    def test_degenerate_key2_engine_parity(self, spark, tmp_path):
        # round-10 ADVICE: the q09 gate concatenates the scaled eta2
        # into key2; on degenerate data eta2 is NULL and Spark's
        # concat_ws SKIPS nulls while DuckDB's || PROPAGATES them — the
        # gate now coalesces to a -1 sentinel on BOTH engines. Prove
        # the two key2 strings agree on a single-group (k < 2) input.
        import duckdb
        from pyspark.sql import functions as F

        from stepist_spark.operators.abtest import one_way_anova, one_way_anova_sql

        one = spark.createDataFrame([("A", 1.0), ("A", 2.0)], "g string, v double")
        got = (
            one_way_anova(one, "g", "v")
            .select(
                F.concat_ws(
                    ":",
                    F.col("s_g").cast("string"),
                    F.col("q_g").cast("string"),
                    F.coalesce(
                        F.floor(F.col("eta2") * 1_000_000 + F.lit(0.5)).cast("bigint"),
                        F.lit(-1),
                    ).cast("string"),
                ).alias("key2")
            )
            .collect()[0]["key2"]
        )
        p = str(tmp_path / "one.parquet")
        one.write.parquet(p)
        con = duckdb.connect()
        (want,) = con.execute(
            "SELECT CAST(s_g AS VARCHAR) || ':' || CAST(q_g AS VARCHAR) || ':' "
            "|| CAST(COALESCE(CAST(floor(eta2 * 1000000 + 0.5) AS BIGINT), -1) "
            "AS VARCHAR) FROM ("
            + one_way_anova_sql(f"SELECT * FROM '{p}/*.parquet'", "g", "v")
            + ")"
        ).fetchone()
        assert got == want and got.endswith(":-1")

    def test_value_counts_path_matches(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.abtest import one_way_anova

        data = self._data()
        rows = [(g, v) for g, xs in data.items() for v in xs]
        df = spark.createDataFrame(rows, "g string, v double")
        vc = (
            df.select("g", F.floor(F.col("v") * 100 + F.lit(0.5))
              .cast("bigint").alias("v"))
            .groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        direct = sorted(map(tuple, one_way_anova(df, "g", "v").collect()))
        reused = sorted(
            map(tuple, one_way_anova(df, "g", "v", value_counts=vc).collect())
        )
        assert direct == reused

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.abtest import one_way_anova, one_way_anova_sql

        rows = [
            (f"g{i % 5}", float((i * 13) % 97) + 0.25 * (i % 4)) for i in range(400)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        p = str(tmp_path / "anova.parquet")
        df.write.parquet(p)
        got = sorted(
            (r["g"], r["n_g"], int(r["s_g"]), int(r["q_g"]), r["k"], r["n"],
             r["f_stat"], r["eta2"])
            for r in one_way_anova(df, "g", "v").collect()
        )
        con = duckdb.connect()
        want = sorted(
            (w[0], w[1], int(w[2]), int(w[3]), w[4], w[5], w[6], w[7])
            for w in con.execute(
                one_way_anova_sql(f"SELECT * FROM '{p}/*.parquet'", "g", "v")
            ).fetchall()
        )
        assert got == want


class TestBrownForsythe:
    def _data(self):
        # g B has ~3x the spread of A; C is tight
        return {
            "A": [10.0, 11.0, 9.5, 10.5, 10.25, 9.75],
            "B": [5.0, 14.0, 2.5, 16.0, 8.0, 12.5],
            "C": [7.0, 7.25, 6.75, 7.1],
        }

    def _ref(self, data):
        # median-centered Levene via the same lower-median rule
        devs = {}
        for g, xs in data.items():
            cents = sorted(round(v * 100) for v in xs)
            med = cents[(len(cents) + 1) // 2 - 1]
            devs[g] = [abs(c - med) for c in cents]
        n = sum(len(z) for z in devs.values())
        k = len(devs)
        s = sum(sum(z) for z in devs.values())
        q = sum(x * x for z in devs.values() for x in z)
        fold = 0.0
        for g in sorted(devs):
            sg = sum(devs[g])
            fold += float(sg) * float(sg) / len(devs[g])
        grand = float(s) * float(s) / n
        return (fold - grand) / (k - 1) / ((q - fold) / (n - k))

    def test_matches_closed_form_and_detects_spread(self, spark):
        from stepist_spark.operators.abtest import brown_forsythe

        data = self._data()
        rows = [(g, v) for g, xs in data.items() for v in xs]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["g"]: r for r in brown_forsythe(df, "g", "v").collect()}
        assert abs(out["A"]["f_stat"] - self._ref(data)) < 1e-6
        assert out["A"]["f_stat"] > 4.0  # the planted spread difference

    def test_equal_spreads_small_f(self, spark):
        from stepist_spark.operators.abtest import brown_forsythe

        rows = [
            (g, base + d)
            for g, base in (("A", 10.0), ("B", 50.0), ("C", 90.0))
            for d in (-1.0, -0.5, 0.0, 0.5, 1.0)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = brown_forsythe(df, "g", "v").collect()[0]
        # identical deviation profiles: SSB == 0 exactly
        assert r["f_stat"] == 0.0

    def test_value_counts_path_matches(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.abtest import brown_forsythe

        data = self._data()
        rows = [(g, v) for g, xs in data.items() for v in xs]
        df = spark.createDataFrame(rows, "g string, v double")
        vc = (
            df.select("g", F.floor(F.col("v") * 100 + F.lit(0.5))
              .cast("bigint").alias("v"))
            .groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        direct = sorted(map(tuple, brown_forsythe(df, "g", "v").collect()))
        reused = sorted(
            map(tuple, brown_forsythe(df, "g", "v", value_counts=vc).collect())
        )
        assert direct == reused

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.abtest import brown_forsythe, brown_forsythe_sql

        rows = [
            (f"g{i % 4}", float((i * 29) % 83) * (1 + i % 4) / 3.0 + 0.25 * (i % 5))
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        p = str(tmp_path / "bf.parquet")
        df.write.parquet(p)
        got = sorted(
            (r["g"], r["n_g"], int(r["s_g"]), int(r["q_g"]), r["k"], r["n"],
             r["f_stat"], r["eta2"])
            for r in brown_forsythe(df, "g", "v").collect()
        )
        con = duckdb.connect()
        want = sorted(
            (w[0], w[1], int(w[2]), int(w[3]), w[4], w[5], w[6], w[7])
            for w in con.execute(
                brown_forsythe_sql(f"SELECT * FROM '{p}/*.parquet'", "g", "v")
            ).fetchall()
        )
        assert got == want
