"""Grouped OLS vs closed-form / numpy reference."""

from __future__ import annotations

from stepist_spark.operators.regression import grouped_ols


def _fit(spark, rows, scale=10**6):
    df = spark.createDataFrame(rows, "g string, x double, y double")
    return {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in grouped_ols(df, ["g"], "x", "y", scale).collect()
    }


class TestGroupedOls:
    def test_exact_line(self, spark):
        rows = [("a", float(x), 3.0 * x + 2.0) for x in range(10)]
        n, slope, intercept, r2 = _fit(spark, rows)["a"]
        assert (n, slope, intercept, r2) == (10, 3.0, 2.0, 1.0)

    def test_matches_numpy(self, spark):
        import numpy as np

        xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        ys = [2.1, 3.9, 6.2, 7.8, 10.1, 11.9]
        got = _fit(spark, [("g", x, y) for x, y in zip(xs, ys)])["g"]
        b, a = np.polyfit(xs, ys, 1)
        assert abs(got[1] - b) < 1e-4
        assert abs(got[2] - a) < 1e-4
        r = np.corrcoef(xs, ys)[0, 1]
        assert abs(got[3] - r * r) < 1e-4

    def test_degenerate_groups(self, spark):
        rows = [
            ("one_point", 1.0, 5.0),
            ("const_x", 2.0, 1.0),
            ("const_x", 2.0, 9.0),
            ("const_y", 1.0, 7.0),
            ("const_y", 3.0, 7.0),
        ]
        got = _fit(spark, rows)
        assert got["one_point"][1] is None            # n < 2
        assert got["const_x"][1] is None              # zero x-variance
        assert got["const_y"][1] == 0.0               # flat line fits
        assert got["const_y"][3] is None              # r2 undefined

    def test_independent_groups(self, spark):
        rows = [("p", float(x), 2.0 * x) for x in range(5)] + [
            ("q", float(x), -1.0 * x + 10.0) for x in range(5)
        ]
        got = _fit(spark, rows)
        assert got["p"][1] == 2.0 and got["q"][1] == -1.0


class TestChiSquareContingency:
    def test_known_2x2(self, spark):
        from stepist_spark.operators.regression import chi_square_contingency

        rows = (
            [("m", "y")] * 30 + [("m", "n")] * 10
            + [("f", "y")] * 20 + [("f", "n")] * 40
        )
        df = spark.createDataFrame(rows, "g string, r string")
        out = {(r["a"], r["b"]): r for r in chi_square_contingency(df, "g", "r").collect()}
        c = out[("m", "y")]
        assert c["observed"] == 30 and c["row_n"] == 40 and c["col_n"] == 50
        assert c["n"] == 100
        assert c["expected"] == 20.0
        assert c["contrib"] == 5.0  # (30-20)^2/20
        # chi2 statistic = 5 + 5 + 10/3 + 10/3 = 16.666666...
        assert out[("m", "n")]["contrib"] == 5.0
        assert out[("f", "y")]["contrib"] == round(10 / 3, 6)
        total = round(sum(r["contrib"] for r in out.values()), 4)
        assert total == 16.6667

    def test_independent_near_zero(self, spark):
        from stepist_spark.operators.regression import chi_square_contingency

        rows = [(g, r) for g in ("a", "b") for r in ("x", "y") for _ in range(25)]
        df = spark.createDataFrame(rows, "g string, r string")
        out = chi_square_contingency(df, "g", "r").collect()
        assert all(r["contrib"] == 0.0 for r in out)


class TestCorrMatrix:
    def test_matches_numpy(self, spark):
        import numpy as np

        from stepist_spark.operators.regression import corr_matrix

        rng = np.random.RandomState(7)
        x = rng.rand(40)
        y = 2.0 * x + rng.rand(40) * 0.1
        z = rng.rand(40)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
            "x double, y double, z double",
        )
        got = {
            (r["col_a"], r["col_b"]): (r["n"], r["corr"])
            for r in corr_matrix(df, ["x", "y", "z"]).collect()
        }
        assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
        for (a, b), (n, c) in got.items():
            assert n == 40
            ref = np.corrcoef(
                {"x": x, "y": y, "z": z}[a], {"x": x, "y": y, "z": z}[b]
            )[0, 1]
            assert abs(c - ref) < 1e-4, (a, b, c, ref)
        assert got[("x", "y")][1] > 0.99

    def test_zero_variance_null(self, spark):
        from stepist_spark.operators.regression import corr_matrix

        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, c double"
        )
        [r] = corr_matrix(df, ["x", "c"]).collect()
        assert r["corr"] is None and r["n"] == 3

    def test_single_row_null(self, spark):
        from stepist_spark.operators.regression import corr_matrix

        df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
        [r] = corr_matrix(df, ["x", "y"]).collect()
        assert r["corr"] is None and r["n"] == 1


class TestKsTwoSample:
    def test_matches_python(self, spark):
        import random

        from stepist_spark.operators.regression import ks_two_sample

        rng = random.Random(9)
        a = [round(rng.gauss(50, 10), 2) for _ in range(150)]
        b = [round(rng.gauss(55, 12), 2) for _ in range(120)]
        rows = [("A", v) for v in a] + [("B", v) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = ks_two_sample(df, "g", "v", "A", "B").collect()
        ca = sorted(int(v * 100 + 0.5) for v in a)
        cb = sorted(int(v * 100 + 0.5) for v in b)
        vals = sorted(set(ca) | set(cb))
        import bisect

        best = max(
            abs(bisect.bisect_right(ca, v) * len(cb) - bisect.bisect_right(cb, v) * len(ca))
            for v in vals
        )
        assert int(r["d_scaled"]) == best
        assert r["ks"] == round(best / (len(ca) * len(cb)), 6)

    def test_identical_distributions_zero(self, spark):
        from stepist_spark.operators.regression import ks_two_sample

        rows = [("A", float(v)) for v in range(10)] + [
            ("B", float(v)) for v in range(10)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = ks_two_sample(df, "g", "v", "A", "B").collect()
        assert r["ks"] == 0.0


class TestTargetEncode:
    def test_smoothing_formula(self, spark):
        from stepist_spark.operators.regression import target_encode

        # cat x: 2 rows avg 10; cat y: 1 row 40; global mean = 20
        rows = [("x", 10.0), ("x", 10.0), ("y", 40.0)]
        df = spark.createDataFrame(rows, "cat string, t double")
        got = {r["category"]: r for r in target_encode(df, "cat", "t", m=1).collect()}
        # enc(x) = (2000 + 1*2000)/(3) /100 ... formula: (sum*N + m*T)/((n+m)*N)
        # x: (2000*3 + 1*6000) / (3*3) = 12000/9 cents = 13.333333
        assert got["x"]["enc"] == round(12000 / 9 / 100, 6)
        # y: (4000*3 + 6000) / (2*3) = 18000/6 = 3000 cents = 30.0
        assert got["y"]["enc"] == 30.0

    def test_large_m_pulls_to_prior(self, spark):
        from stepist_spark.operators.regression import target_encode

        rows = [("x", 0.0)] * 5 + [("y", 100.0)] * 5
        df = spark.createDataFrame(rows, "cat string, t double")
        got = {r["category"]: r["enc"] for r in target_encode(df, "cat", "t", m=10**6).collect()}
        assert abs(got["x"] - 50.0) < 0.01 and abs(got["y"] - 50.0) < 0.01


class TestSplitGain:
    def _ref(self, rows, feat_idx):
        # pure-Python gini gain with the same scaled-integer floors
        from collections import defaultdict

        scale = 10**6
        n = len(rows)
        c1 = sum(1 for r in rows if r[0])
        c0 = n - c1
        parent = (n * n - c0 * c0 - c1 * c1) * scale // (n * n)
        cells = defaultdict(lambda: [0, 0])
        for r in rows:
            k = r[feat_idx]
            cells[k][0] += 1
            cells[k][1] += 1 if r[0] else 0
        wchild = 0
        for nk, c1k in cells.values():
            c0k = nk - c1k
            wchild += (nk * nk - c0k * c0k - c1k * c1k) * scale // (n * nk)
        return parent, parent - wchild, len(cells)

    def test_matches_reference_and_pure_split(self, spark):
        from stepist_spark.operators.regression import split_gain

        rows = [
            (True, "a", "x"), (True, "a", "y"), (True, "a", "x"),
            (False, "b", "x"), (False, "b", "y"), (False, "b", "x"),
            (True, "c", "y"), (False, "c", "x"),
        ]
        df = spark.createDataFrame(rows, "y boolean, f1 string, f2 string")
        got = {r["feature"]: r for r in split_gain(df, "y", ["f1", "f2"]).collect()}
        for i, f in ((1, "f1"), (2, "f2")):
            parent, gain, nv = self._ref(rows, i)
            assert got[f]["parent_gini_scaled"] == parent
            assert got[f]["gain_scaled"] == gain
            assert got[f]["n_values"] == nv
            assert got[f]["n"] == len(rows)
        # f1 separates classes (almost) perfectly; f2 carries ~nothing
        assert got["f1"]["gain_scaled"] > got["f2"]["gain_scaled"]
        assert got["f2"]["gain"] <= 0.05

    def test_null_feature_forms_own_child(self, spark):
        from stepist_spark.operators.regression import split_gain

        rows = [(True, "a"), (False, None), (False, None), (True, "a")]
        df = spark.createDataFrame(rows, "y boolean, f string")
        r = split_gain(df, "y", ["f"]).collect()[0]
        assert r["n_values"] == 2
        # perfect split: gain == parent impurity
        assert r["gain_scaled"] == r["parent_gini_scaled"]

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.regression import split_gain, split_gain_sql

        rows = [
            (i % 3 == 0, str(i % 4), str(i % 5)) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "y boolean, f1 string, f2 string")
        p = str(tmp_path / "t.parquet")
        df.write.parquet(p)
        got = sorted(
            tuple(r)
            for r in split_gain(df, "y", ["f1", "f2"]).collect()
        )
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                split_gain_sql(
                    f"SELECT * FROM '{p}/*.parquet'",
                    "y",
                    {"f1": "f1", "f2": "f2"},
                )
            ).fetchall()
        )
        assert got == want


class TestPsiDrift:
    def _df(self, spark, a_vals, b_vals):
        rows = [("A", float(v)) for v in a_vals] + [("B", float(v)) for v in b_vals]
        return spark.createDataFrame(rows, "g string, v double")

    def test_identical_distributions_zero(self, spark):
        from stepist_spark.operators.regression import psi_drift

        vals = [i % 10 for i in range(200)]
        out = psi_drift(self._df(spark, vals, vals), "g", "A", "B", "v", 5).collect()
        assert all(r["term_scaled"] == 0 for r in out)
        assert out[0]["psi"] == 0.0

    def test_shift_detected_and_nonnegative(self, spark):
        from stepist_spark.operators.regression import psi_drift

        a = [i % 10 for i in range(300)]
        b = [5 + (i % 10) for i in range(300)]  # shifted up
        out = psi_drift(self._df(spark, a, b), "g", "A", "B", "v", 5).collect()
        psi = out[0]["psi"]
        assert psi > 0.25  # classic "shifted" threshold
        tot_ref = sum(r["c_ref"] for r in out)
        tot_cmp = sum(r["c_cmp"] for r in out)
        assert tot_ref == 300 and tot_cmp == 300  # nothing dropped

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.regression import psi_drift, psi_drift_sql

        import random

        rng = random.Random(3)
        rows = [("A", round(rng.uniform(0, 50), 2)) for _ in range(400)] + [
            ("B", round(rng.uniform(10, 60), 2)) for _ in range(350)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        p = str(tmp_path / "t.parquet")
        df.write.parquet(p)
        got = sorted(tuple(r) for r in psi_drift(df, "g", "A", "B", "v").collect())
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                psi_drift_sql(f"SELECT * FROM '{p}/*.parquet'", "g", "A", "B", "v")
            ).fetchall()
        )
        assert got == want


class TestMutualInformation:
    def test_matches_python_reference(self, spark):
        import math
        from collections import Counter

        from stepist_spark.operators.regression import mutual_information

        rows = [(i % 3 == 0, str(i % 4), str((i * i) % 3)) for i in range(120)]
        df = spark.createDataFrame(rows, "y boolean, f1 string, f2 string")
        got = {
            r["feature"]: r
            for r in mutual_information(df, "y", ["f1", "f2"]).collect()
        }
        scale = 10**6
        n = len(rows)
        for idx, f in ((1, "f1"), (2, "f2")):
            cells = Counter((r[idx], r[0]) for r in rows)
            cx = Counter(r[idx] for r in rows)
            cy = Counter(r[0] for r in rows)
            want = sum(
                c * math.floor(math.log(c * n / (cx[x] * cy[y])) * scale)
                for (x, y), c in cells.items()
            )
            assert got[f]["mi_scaled"] == want
            assert got[f]["n"] == n

    def test_perfect_predictor_beats_noise(self, spark):
        from stepist_spark.operators.regression import mutual_information

        rows = [(i % 2 == 0, str(i % 2), str(i % 5)) for i in range(200)]
        df = spark.createDataFrame(rows, "y boolean, sig string, noise string")
        got = {
            r["feature"]: r["mi"]
            for r in mutual_information(df, "y", ["sig", "noise"]).collect()
        }
        import math

        assert abs(got["sig"] - math.log(2)) < 1e-3  # I = H(y) = ln 2
        assert got["noise"] < 0.01


class TestWeightOfEvidence:
    def test_matches_reference(self, spark):
        import math

        from stepist_spark.operators.regression import weight_of_evidence

        # cat x: 30 good / 10 bad;  cat y: 10 good / 50 bad
        rows = (
            [("x", True)] * 30 + [("x", False)] * 10
            + [("y", True)] * 10 + [("y", False)] * 50
        )
        df = spark.createDataFrame(rows, "c string, lab boolean")
        out = {r["category"]: r for r in weight_of_evidence(df, "c", "lab").collect()}
        G, B = 40, 60
        for cat, g, b in [("x", 30, 10), ("y", 10, 50)]:
            woe_scaled = math.floor(math.log((g * B) / (b * G)) * 1e6)
            term = ((g * B - b * G) * woe_scaled) // (G * B)
            r = out[cat]
            assert (r["g"], r["b"], r["woe_scaled"], r["iv_term_scaled"]) == (
                g, b, woe_scaled, term,
            )
        iv = sum(r["iv_term_scaled"] for r in out.values())
        assert all(r["iv_scaled"] == iv for r in out.values())
        assert iv > 0  # IV is non-negative by construction

    def test_zero_cell_null_woe(self, spark):
        from stepist_spark.operators.regression import weight_of_evidence

        rows = [("x", True)] * 5 + [("y", True)] * 2 + [("y", False)] * 3
        df = spark.createDataFrame(rows, "c string, lab boolean")
        out = {r["category"]: r for r in weight_of_evidence(df, "c", "lab").collect()}
        assert out["x"]["woe_scaled"] is None
        assert out["x"]["iv_term_scaled"] == 0  # excluded from IV, not infinite
        assert out["y"]["woe_scaled"] is not None

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.regression import (
            weight_of_evidence,
            weight_of_evidence_sql,
        )

        rows = [(str(i % 5), i % 3 == 0) for i in range(500)]
        df = spark.createDataFrame(rows, "c string, lab boolean")
        p = str(tmp_path / "woe.parquet")
        df.write.parquet(p)
        got = sorted(tuple(r) for r in weight_of_evidence(df, "c", "lab").collect())
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                weight_of_evidence_sql(f"SELECT * FROM '{p}/*.parquet'", "c", "lab")
            ).fetchall()
        )
        assert got == want

    def test_null_labels_excluded(self, spark):
        from stepist_spark.operators.regression import weight_of_evidence

        rows = [("x", True)] * 3 + [("x", False)] * 2 + [("x", None)] * 4 + [
            ("y", True)
        ] * 1 + [("y", False)] * 3
        df = spark.createDataFrame(rows, "c string, lab boolean")
        out = {r["category"]: r for r in weight_of_evidence(df, "c", "lab").collect()}
        # NULL labels vanish rather than counting as "bad"
        assert (out["x"]["g"], out["x"]["b"]) == (3, 2)
        assert (out["y"]["g"], out["y"]["b"]) == (1, 3)


class TestSpearman:
    def _ref(self, rows, scale=100):
        import math
        from itertools import groupby

        xs = [round(x * scale) for x, _ in rows]
        ys = [round(y * scale) for _, y in rows]

        def ranks(vs):
            s = sorted(vs)
            r, i = {}, 0
            for v, g in groupby(s):
                m = len(list(g))
                r[v] = i + (m + 1) / 2
                i += m
            return [r[v] for v in vs]

        rx, ry = ranks(xs), ranks(ys)
        n = len(rx)
        mx, my = sum(rx) / n, sum(ry) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        vx = sum((a - mx) ** 2 for a in rx)
        vy = sum((b - my) ** 2 for b in ry)
        return cov / math.sqrt(vx * vy)

    def test_matches_closed_form_with_ties(self, spark):
        from stepist_spark.operators.regression import spearman_corr

        rows = [(1.0, 2.0), (2.0, 4.0), (2.0, 3.0), (3.0, 9.0), (4.0, 9.0), (5.0, 1.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        (r,) = spearman_corr(df, "x", "y").collect()
        assert r["n"] == 6
        assert abs(r["rho"] - self._ref(rows)) < 1e-6
        # doubled-rank sum identity: Σ2r == n(n+1) on each axis
        # (not output directly, but sxx2 >= the no-ties minimum)
        assert int(r["sxy2"]) > 0

    def test_perfect_monotone_is_one(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.regression import spearman_corr

        rows = [(float(i), float(i * i)) for i in range(1, 9)]  # nonlinear, monotone
        df = spark.createDataFrame(rows, "x double, y double")
        (r,) = spearman_corr(df, "x", "y").collect()
        assert r["rho"] == 1.0
        (r2,) = spearman_corr(
            df.select("x", (-F.col("y")).alias("y")), "x", "y"
        ).collect()
        assert r2["rho"] == -1.0

    def test_null_rows_excluded_and_degenerate_null(self, spark):
        from stepist_spark.operators.regression import spearman_corr

        rows = [(1.0, 2.0), (2.0, None), (None, 3.0), (4.0, 5.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        (r,) = spearman_corr(df, "x", "y").collect()
        assert r["n"] == 2  # pairwise-complete
        const = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
        (rc,) = spearman_corr(const, "x", "y").collect()
        assert rc["rho"] is None  # y all ties: zero rank variance

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.regression import spearman_corr, spearman_corr_sql

        rows = [
            (float(i % 13) + 0.25 * (i % 2), float((i * 7) % 19) + 0.5 * (i % 3))
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "x double, y double")
        p = str(tmp_path / "sp.parquet")
        df.write.parquet(p)
        got = [tuple(r) for r in spearman_corr(df, "x", "y").collect()]
        con = duckdb.connect()
        want = con.execute(
            spearman_corr_sql(f"SELECT * FROM '{p}/*.parquet'", "x", "y")
        ).fetchall()
        assert [tuple(map(float, g)) for g in got] == [tuple(map(float, w)) for w in want]


class TestValueCountsReuse:
    """ks/psi/spearman value_counts= reuse paths (round-10 verdict #2)
    must be bit-identical to the self-scanning paths."""

    def _df(self, spark):
        import random

        rng = random.Random(13)
        rows = [
            (rng.choice("ABN"), float(rng.randint(1, 30)),
             round(rng.uniform(10, 900), 2))
            for _ in range(500)
        ]
        return spark.createDataFrame(rows, "g string, q double, p double")

    def test_reuse_paths_match(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.regression import (
            ks_two_sample,
            psi_drift,
            spearman_corr,
        )

        df = self._df(spark)
        cents_p = (
            df.select("g", F.floor(F.col("p") * 100 + F.lit(0.5))
              .cast("bigint").alias("v"))
            .groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        xq = (
            df.select(F.floor(F.col("q") * 100 + F.lit(0.5))
              .cast("bigint").alias("v"))
            .groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        yp = cents_p.groupBy("v").agg(F.sum("c").cast("bigint").alias("c"))

        def rows(d):
            return sorted(map(tuple, d.collect()))

        assert rows(ks_two_sample(df, "g", "p", "A", "N")) == rows(
            ks_two_sample(df, "g", "p", "A", "N", value_counts=cents_p)
        )
        assert rows(psi_drift(df, "g", "A", "N", "p")) == rows(
            psi_drift(df, "g", "A", "N", "p", value_counts=cents_p)
        )
        assert rows(spearman_corr(df, "q", "p")) == rows(
            spearman_corr(df, "q", "p", x_counts=xq, y_counts=yp)
        )
