"""ROC AUC (tie-corrected Mann-Whitney) and confusion cells vs a
pure-Python reference."""

from __future__ import annotations

from stepist_spark.operators.evaluation import confusion_stats, roc_auc


def _auc_ref(pairs):
    """Probability a random positive outranks a random negative,
    ties counting half — brute-force over all (pos, neg) pairs."""
    pos = [s for y, s in pairs if y]
    neg = [s for y, s in pairs if not y]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "y boolean, s bigint")
    return roc_auc(df, "y", "s").collect()[0]


class TestRocAuc:
    def test_perfect_separation(self, spark):
        pairs = [(True, 10), (True, 9), (False, 1), (False, 2)]
        r = _run(spark, pairs)
        assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)
        assert r["auc_num"] == r["auc_den"]

    def test_reversed(self, spark):
        r = _run(spark, [(True, 1), (False, 5), (False, 9)])
        assert r["auc"] == 0.0

    def test_ties_count_half(self, spark):
        r = _run(spark, [(True, 5), (False, 5)])
        assert r["auc"] == 0.5

    def test_matches_bruteforce(self, spark):
        import random

        rng = random.Random(7)
        pairs = [
            (rng.random() < 0.4, rng.randrange(-5, 6)) for _ in range(120)
        ]
        r = _run(spark, pairs)
        assert abs(r["auc"] - _auc_ref(pairs)) < 1e-6
        assert r["n_pos"] == sum(1 for y, _ in pairs if y)

    def test_grouped_and_degenerate(self, spark):
        pairs = [("g1", True, 3), ("g1", False, 1), ("g2", True, 2)]
        df = spark.createDataFrame(pairs, "g string, y boolean, s bigint")
        rows = {r["g"]: r for r in roc_auc(df, "y", "s", ["g"]).collect()}
        assert rows["g1"]["auc"] == 1.0
        assert rows["g2"]["auc"] is None  # no negatives -> undefined


class TestConfusion:
    def test_cells(self, spark):
        rows = [(True, True)] * 3 + [(True, False)] * 2 + [(False, False)] * 4
        df = spark.createDataFrame(rows, "y boolean, p boolean")
        cells = {
            (r["label"], r["pred"]): r["n"]
            for r in confusion_stats(df, "y", "p").collect()
        }
        assert cells == {(True, True): 3, (True, False): 2, (False, False): 4}


class TestCalibrationBins:
    def test_perfectly_calibrated_steps(self, spark):
        from stepist_spark.operators.evaluation import calibration_bins

        # scores 0..9, 20 rows each; positives = score/10 fraction
        rows = []
        for s in range(10):
            for i in range(20):
                rows.append((i < 2 * s, s))
        df = spark.createDataFrame(rows, "y boolean, s bigint")
        out = {r["bin"]: r for r in calibration_bins(df, "y", "s", 10).collect()}
        assert len(out) == 10
        for b, r in out.items():
            assert r["n"] == 20
            assert r["lo_score"] == r["hi_score"] == b - 1
            assert abs(r["pos_rate"] - (b - 1) / 10) < 1e-9

    def test_ties_share_bins_and_totals_preserved(self, spark):
        from stepist_spark.operators.evaluation import calibration_bins

        rows = [(i % 3 == 0, i % 4) for i in range(101)]
        df = spark.createDataFrame(rows, "y boolean, s bigint")
        out = calibration_bins(df, "y", "s", 4).collect()
        assert sum(r["n"] for r in out) == 101
        assert sum(r["n_pos"] for r in out) == sum(1 for i in range(101) if i % 3 == 0)

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.evaluation import (
            calibration_bins,
            calibration_bins_sql,
        )

        rows = [((i * 7) % 13 < 5, (i * i) % 37) for i in range(500)]
        df = spark.createDataFrame(rows, "y boolean, s bigint")
        p = str(tmp_path / "t.parquet")
        df.write.parquet(p)
        got = sorted(tuple(r) for r in calibration_bins(df, "y", "s", 10).collect())
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                calibration_bins_sql(f"SELECT * FROM '{p}/*.parquet'", "y", "s", 10)
            ).fetchall()
        )
        assert got == want


class TestCohensKappa:
    def test_hand_computed_two_by_two(self, spark):
        from stepist_spark.operators.evaluation import cohens_kappa

        # the classic worked example: 20 A-yes/B-yes, 5 A-yes/B-no,
        # 10 A-no/B-yes, 15 A-no/B-no -> po=0.7, pe=0.5, kappa=0.4
        rows = (
            [("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15
        )
        df = spark.createDataFrame(rows, "a string, b string")
        got = cohens_kappa(df, "a", "b").collect()[0]
        assert got.n == 50 and got.agree_n == 35
        assert got.kappa_scaled == 400_000

    def test_perfect_and_chance_and_negative(self, spark):
        from stepist_spark.operators.evaluation import cohens_kappa

        perfect = spark.createDataFrame(
            [("x", "x")] * 3 + [("y", "y")] * 2, "a string, b string"
        )
        assert cohens_kappa(perfect, "a", "b").collect()[0].kappa_scaled == 10**6
        # total disagreement on balanced marginals -> kappa = -1
        anti = spark.createDataFrame(
            [("x", "y")] * 5 + [("y", "x")] * 5, "a string, b string"
        )
        assert cohens_kappa(anti, "a", "b").collect()[0].kappa_scaled == -(10**6)

    def test_constant_identical_raters_null(self, spark):
        from stepist_spark.operators.evaluation import cohens_kappa

        df = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
        got = cohens_kappa(df, "a", "b").collect()[0]
        assert got.kappa_scaled is None  # pe = 1: undefined

    def test_rater_exclusive_categories(self, spark):
        from stepist_spark.operators.evaluation import cohens_kappa

        # category 'z' appears only for rater b: contributes 0 to pe
        df = spark.createDataFrame(
            [("x", "x"), ("x", "z"), ("y", "y"), ("y", "y")],
            "a string, b string",
        )
        got = cohens_kappa(df, "a", "b").collect()[0]
        # n=4, agree=3, pe_num = x:2*1 + y:2*2 + z:0*1 = 6
        assert (got.n, got.agree_n, int(got.pe_num)) == (4, 3, 6)
        assert got.kappa_scaled == (4 * 3 - 6) * 10**6 // (16 - 6)

    def test_grouped_and_null_excluded(self, spark):
        from stepist_spark.operators.evaluation import cohens_kappa

        rows = [("g1", "x", "x"), ("g1", "x", None), ("g2", "x", "y"), ("g2", "y", "x")]
        df = spark.createDataFrame(rows, "g string, a string, b string")
        got = {r.g: r for r in cohens_kappa(df, "a", "b", group_cols=["g"]).collect()}
        assert got["g1"].n == 1  # NULL rating excluded
        assert got["g2"].kappa_scaled == -(10**6)

    def test_duckdb_mirror(self, spark):
        import duckdb

        from stepist_spark.operators.evaluation import (
            cohens_kappa,
            cohens_kappa_sql,
        )

        rows = (
            [("y", "y")] * 7 + [("y", "n")] * 3 + [("n", "y")] * 2
            + [("n", "n")] * 4 + [("m", "y")] * 2
        )
        df = spark.createDataFrame(rows, "a string, b string")
        got = sorted(map(tuple, cohens_kappa(df, "a", "b").collect()))
        vals = ", ".join(f"('{a}', '{b}')" for a, b in rows)
        duck = sorted(
            tuple(r)
            for r in duckdb.sql(
                cohens_kappa_sql(
                    f"SELECT * FROM (VALUES {vals}) t(a, b)", "a", "b"
                )
            ).fetchall()
        )
        # pe_num comes back as Decimal from both engines; compare as int
        norm = lambda rs: [(r[0], r[1], int(r[2]), r[3]) for r in rs]
        assert norm(got) == norm(duck)


class TestMcNemar:
    def test_matches_closed_form(self, spark):
        from stepist_spark.operators.evaluation import mcnemar_test

        # 100 examples: pa right on 60, pb right on 50; b=25, c=15
        rows = []
        for i in range(100):
            y = True
            pa = i < 60
            pb = (35 <= i < 85)  # both right on 35..59 (25), b: 0..34? recompute
            rows.append((y, pa, pb))
        df = spark.createDataFrame(rows, "y boolean, pa boolean, pb boolean")
        r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
        b = sum(1 for y, pa, pb in rows if (pa == y) and (pb != y))
        c = sum(1 for y, pa, pb in rows if (pa != y) and (pb == y))
        assert (r["b"], r["c"]) == (b, c)
        assert r["n"] == 100
        want = (abs(b - c) - 1) ** 2 / (b + c)
        assert abs(r["chi2"] - want) < 1e-6

    def test_no_discordant_pairs_is_null(self, spark):
        from stepist_spark.operators.evaluation import mcnemar_test

        df = spark.createDataFrame(
            [(True, True, True), (False, False, False)],
            "y boolean, pa boolean, pb boolean",
        )
        r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
        assert r["chi2"] is None and r["n_both_right"] == 2

    def test_continuity_floor_at_zero(self, spark):
        from stepist_spark.operators.evaluation import mcnemar_test

        # b == c: max(|b-c|-1, 0) == 0, chi2 exactly 0
        rows = [(True, True, False), (True, False, True)]
        df = spark.createDataFrame(rows, "y boolean, pa boolean, pb boolean")
        r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
        assert r["chi2"] == 0.0

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.evaluation import (
            mcnemar_test,
            mcnemar_test_sql,
        )

        rows = [(i % 2 == 0, i % 3 == 0, i % 5 == 0) for i in range(200)]
        df = spark.createDataFrame(rows, "y boolean, pa boolean, pb boolean")
        p = str(tmp_path / "mcn.parquet")
        df.write.parquet(p)
        got = [tuple(r) for r in mcnemar_test(df, "y", "pa", "pb").collect()]
        con = duckdb.connect()
        want = con.execute(
            mcnemar_test_sql(f"SELECT * FROM '{p}/*.parquet'", "y", "pa", "pb")
        ).fetchall()
        assert got == want
