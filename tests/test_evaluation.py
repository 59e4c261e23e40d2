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
