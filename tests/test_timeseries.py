"""Time-series grid resample with forward fill."""

from __future__ import annotations

from pyspark.sql import functions as F

from stepist_spark.operators.timeseries import resample_ffill


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


class TestResampleFfill:
    def test_gapfill_locf(self, spark):
        df = _series(
            spark,
            [
                ("a", "2024-01-01 00:00:00", 1.0),
                ("a", "2024-01-01 02:30:00", 2.0),  # between grid points
                ("a", "2024-01-01 06:00:00", 3.0),
                ("b", "2024-01-01 01:00:00", 9.0),
            ],
        )
        out = resample_ffill(df, "k", "ts", ["v"], step="2 hours").collect()
        got = {(r["k"], str(r["grid_ts"])): (str(r["ts"]), r["v"]) for r in out}
        assert got == {
            ("a", "2024-01-01 00:00:00"): ("2024-01-01 00:00:00", 1.0),
            ("a", "2024-01-01 02:00:00"): ("2024-01-01 00:00:00", 1.0),  # carried
            ("a", "2024-01-01 04:00:00"): ("2024-01-01 02:30:00", 2.0),  # carried
            ("a", "2024-01-01 06:00:00"): ("2024-01-01 06:00:00", 3.0),
            ("b", "2024-01-01 01:00:00"): ("2024-01-01 01:00:00", 9.0),
        }

    def test_single_observation_key(self, spark):
        df = _series(spark, [("x", "2024-01-01 00:00:00", 5.0)])
        out = resample_ffill(df, "k", "ts", ["v"], step="1 hour").collect()
        assert len(out) == 1 and out[0]["v"] == 5.0

    def test_every_grid_point_filled(self, spark):
        rows = [("a", f"2024-01-01 {h:02d}:17:00", float(h)) for h in (0, 5, 11, 23)]
        out = resample_ffill(_series(spark, rows), "k", "ts", ["v"], step="3 hours")
        assert out.filter(F.col("v").isNull()).count() == 0
        assert out.count() == 8  # 23h span anchored at 00:17 -> 8 points


class TestTimeWeightedAvg:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "k string, ts string, v double, eid bigint"
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    def test_hand_example(self, spark):
        from stepist_spark.operators.timeseries import time_weighted_avg

        # v=10 holds 10s, v=20 holds 20s, last sample ends the span:
        # twa = (10*10 + 20*20) / 30
        df = self._ev(spark, [
            ("a", "2024-01-01 00:00:00", 10.0, 1),
            ("a", "2024-01-01 00:00:10", 20.0, 2),
            ("a", "2024-01-01 00:00:30", 99.0, 3),
        ])
        (r,) = time_weighted_avg(df, ["k"], "ts", "v", "eid").collect()
        assert r["n_samples"] == 3
        assert r["total_us"] == 30_000_000
        assert r["twa"] == round((10 * 10 + 20 * 20) / 30, 6)

    def test_single_sample_is_null(self, spark):
        from stepist_spark.operators.timeseries import time_weighted_avg

        df = self._ev(spark, [("a", "2024-01-01 00:00:00", 5.0, 1)])
        (r,) = time_weighted_avg(df, ["k"], "ts", "v", "eid").collect()
        assert r["twa"] is None and r["total_us"] == 0

    def test_irregular_density_beats_plain_avg(self, spark):
        from stepist_spark.operators.timeseries import time_weighted_avg

        # one hour-long stretch at v=0 (LOCF holds it), then a burst of
        # rapid samples at v=100: the plain AVG is dominated by the
        # burst's row count, the TWA by holding time
        rows = [("a", "2024-01-01 00:00:00", 0.0, 0)]
        rows += [("a", f"2024-01-01 01:00:{s:02d}", 100.0, s + 1) for s in range(10)]
        df = self._ev(spark, rows)
        (r,) = time_weighted_avg(df, ["k"], "ts", "v", "eid").collect()
        assert r["twa"] < 1.0  # plain avg would be ~90.9

    def test_duckdb_mirror_parity(self, spark):
        import random

        import duckdb

        from stepist_spark.operators.timeseries import (
            time_weighted_avg,
            time_weighted_avg_sql,
        )

        rng = random.Random(11)
        rows = []
        eid = 0
        for k in ("x", "y", "z"):
            t = 0
            for _ in range(rng.randint(1, 60)):
                t += rng.randint(0, 5_000_000)  # micros, incl. 0-gaps
                eid += 1
                rows.append((k, t, rng.uniform(-50, 50), eid))
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        data = [
            (k, base + dt.timedelta(microseconds=t), v, e) for k, t, v, e in rows
        ]
        df = spark.createDataFrame(
            data, "k string, ts timestamp_ntz, v double, eid bigint"
        )
        got = sorted(
            (r["k"], r["n_samples"], r["total_us"], r["twa"])
            for r in time_weighted_avg(df, ["k"], "ts", "v", "eid").collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE ev (k VARCHAR, ts TIMESTAMP, v DOUBLE, eid BIGINT)")
        con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?)", data)
        sql = time_weighted_avg_sql("SELECT * FROM ev", ["k"], "ts", "v", "eid")
        exp = sorted(
            (r[0], r[1], r[2], r[3])
            for r in con.execute(
                f"SELECT k, n_samples, total_us, twa FROM ({sql})"
            ).fetchall()
        )
        assert got == exp


class TestMergeIntervals:
    def _iv(self, spark, rows):
        from pyspark.sql import functions as F

        return (
            spark.createDataFrame(rows, "k string, s string, e string")
            .withColumn("s", F.col("s").cast("timestamp"))
            .withColumn("e", F.col("e").cast("timestamp"))
        )

    def test_overlap_abut_disjoint(self, spark):
        from stepist_spark.operators.timeseries import merge_intervals

        df = self._iv(
            spark,
            [
                # overlapping pair -> one island
                ("a", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
                ("a", "2024-01-01 00:30:00", "2024-01-01 02:00:00"),
                # abutting (start == previous end) merges too
                ("a", "2024-01-01 02:00:00", "2024-01-01 03:00:00"),
                # gap -> new island
                ("a", "2024-01-01 05:00:00", "2024-01-01 06:00:00"),
                ("b", "2024-01-01 00:00:00", "2024-01-01 00:10:00"),
            ],
        )
        out = {
            (r["k"], r["island"]): (
                str(r["island_start"]),
                str(r["island_end"]),
                r["n_intervals"],
                r["covered_us"],
            )
            for r in merge_intervals(df, "k", "s", "e").collect()
        }
        assert out[("a", 1)] == (
            "2024-01-01 00:00:00",
            "2024-01-01 03:00:00",
            3,
            3 * 3600 * 1_000_000,
        )
        assert out[("a", 2)] == (
            "2024-01-01 05:00:00",
            "2024-01-01 06:00:00",
            1,
            3600 * 1_000_000,
        )
        assert out[("b", 1)][2] == 1

    def test_contained_interval(self, spark):
        from stepist_spark.operators.timeseries import merge_intervals

        # an interval fully inside an earlier one must not split the
        # island even though its end is EARLIER than the running max
        df = self._iv(
            spark,
            [
                ("k", "2024-01-01 00:00:00", "2024-01-01 10:00:00"),
                ("k", "2024-01-01 01:00:00", "2024-01-01 02:00:00"),
                ("k", "2024-01-01 03:00:00", "2024-01-01 04:00:00"),
            ],
        )
        rows = merge_intervals(df, "k", "s", "e").collect()
        assert len(rows) == 1
        assert rows[0]["n_intervals"] == 3
        assert rows[0]["covered_us"] == 10 * 3600 * 1_000_000


class TestOhlcBars:
    def test_hand_bars_and_tie_break(self, spark):
        import datetime as dt

        from stepist_spark.operators.timeseries import ohlc_bars

        d0 = dt.datetime(2024, 3, 1)
        rows = [
            # day 1: open=1.00 (earliest), close=4.00 (latest)
            ("a", d0.replace(hour=1), 1.0, 10),
            ("a", d0.replace(hour=5), 9.0, 11),
            ("a", d0.replace(hour=9), 0.5, 12),
            ("a", d0.replace(hour=23), 4.0, 13),
            # day 2, same-ts ties: id decides open (20) and close (22)
            ("a", d0.replace(day=2, hour=3), 7.0, 20),
            ("a", d0.replace(day=2, hour=3), 2.0, 21),
            ("a", d0.replace(day=2, hour=3), 5.0, 22),
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double, id bigint")
        got = {
            r["bucket"].day: r
            for r in ohlc_bars(df, ["g"], "ts", "v", "id", "day").collect()
        }
        d1, d2 = got[1], got[2]
        assert (d1["open_cents"], d1["close_cents"]) == (100, 400)
        assert (d1["high_cents"], d1["low_cents"]) == (900, 50)
        assert d1["n_ticks"] == 4 and d1["volume_cents"] == 1450
        assert d1["vwap_cents"] == round(1450 / 4, 6)
        assert (d2["open_cents"], d2["close_cents"]) == (700, 500)

    def test_one_row_bucket(self, spark):
        import datetime as dt

        from stepist_spark.operators.timeseries import ohlc_bars

        df = spark.createDataFrame(
            [("g", dt.datetime(2024, 1, 1, 6), 3.333, 1)],
            "g string, ts timestamp, v double, id bigint",
        )
        [r] = ohlc_bars(df, ["g"], "ts", "v", "id", "day").collect()
        assert (
            r["open_cents"] == r["close_cents"] == r["high_cents"]
            == r["low_cents"] == 333
        )


class TestAcf:
    def _ref(self, xs, k):
        import math

        pairs = [(xs[i], xs[i - k]) for i in range(k, len(xs))]
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        qx = sum(p[0] ** 2 for p in pairs)
        qy = sum(p[1] ** 2 for p in pairs)
        xy = sum(p[0] * p[1] for p in pairs)
        vx = n * qx - sx * sx
        vy = n * qy - sy * sy
        if n < 2 or vx <= 0 or vy <= 0:
            return None
        return (n * xy - sx * sy) / math.sqrt(vx * vy)

    def test_matches_pairwise_pearson(self, spark):
        from stepist_spark.operators.timeseries import acf

        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
        rows = [("s", i, v) for i, v in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, t int, v bigint")
        got = {r["lag"]: r for r in acf(df, ["g"], "t", "v", max_lag=3).collect()}
        for k in (1, 2, 3):
            assert got[k]["n_pairs"] == len(xs) - k
            assert abs(got[k]["corr"] - self._ref(xs, k)) < 1e-6

    def test_alternating_series_lag2_positive(self, spark):
        from stepist_spark.operators.timeseries import acf

        xs = [1, 9, 1, 9, 1, 9, 1, 9]
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(xs)], "g string, t int, v bigint"
        )
        got = {r["lag"]: r["corr"] for r in acf(df, ["g"], "t", "v", 2).collect()}
        assert got[1] == -1.0 and got[2] == 1.0

    def test_constant_series_null(self, spark):
        from stepist_spark.operators.timeseries import acf

        df = spark.createDataFrame(
            [("s", i, 5) for i in range(6)], "g string, t int, v bigint"
        )
        assert all(r["corr"] is None for r in acf(df, ["g"], "t", "v", 2).collect())


class TestPeriodOverPeriod:
    def test_alignment_and_ratio(self, spark):
        import datetime as dt

        from stepist_spark.operators.timeseries import period_over_period

        d0 = dt.date(2024, 1, 1)
        rows = [("t", d0 + dt.timedelta(days=i), 100 + 10 * i) for i in range(10)]
        df = spark.createDataFrame(rows, "g string, d date, v bigint")
        out = {r["d"]: r for r in period_over_period(df, ["g"], "d", "v", 7).collect()}
        r = out[d0 + dt.timedelta(days=8)]
        assert r["prev_v"] == 110 and r["v"] == 180 and r["diff"] == 70
        assert r["ratio_scaled"] == 180 * 10**6 // 110
        assert out[d0]["prev_v"] is None and out[d0]["ratio"] is None

    def test_gap_days_have_no_prev(self, spark):
        import datetime as dt

        from stepist_spark.operators.timeseries import period_over_period

        d0 = dt.date(2024, 1, 1)
        rows = [("t", d0, 5), ("t", d0 + dt.timedelta(days=10), 8)]
        df = spark.createDataFrame(rows, "g string, d date, v bigint")
        out = {r["d"]: r for r in period_over_period(df, ["g"], "d", "v", 7).collect()}
        assert out[d0 + dt.timedelta(days=10)]["prev_v"] is None


class TestDecayedCounts:
    def test_halving_weights(self, spark):
        import datetime as dt

        from stepist_spark.operators.timeseries import decayed_counts

        t0 = dt.datetime(2024, 3, 1)
        rows = (
            [("a", t0)] * 4                                  # age 0 -> weight 1e6
            + [("a", t0 - dt.timedelta(days=7))] * 2          # k=1 -> 5e5
            + [("a", t0 - dt.timedelta(days=20))] * 8         # k=2 -> 25e4
            + [("b", t0 - dt.timedelta(days=700))] * 3        # k=100 -> cap -> 0
        )
        df = spark.createDataFrame(rows, "g string, ts timestamp")
        out = {r["g"]: r for r in decayed_counts(df, ["g"], "ts", 7).collect()}
        assert out["a"]["score_scaled"] == 4 * 10**6 + 2 * 500_000 + 8 * 250_000
        assert out["a"]["n_events"] == 14
        assert out["b"]["score_scaled"] == 0  # fully decayed but counted
        assert out["b"]["n_events"] == 3

    def test_sql_mirror(self, spark, tmp_path):
        import datetime as dt

        import duckdb

        from stepist_spark.operators.timeseries import (
            decayed_counts,
            decayed_counts_sql,
        )

        t0 = dt.datetime(2024, 3, 1)
        rows = [
            (f"g{i % 3}", t0 - dt.timedelta(days=(i * 5) % 40, hours=i % 24))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp")
        p = str(tmp_path / "t.parquet")
        df.write.parquet(p)
        got = sorted(tuple(r) for r in decayed_counts(df, ["g"], "ts", 7).collect())
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                decayed_counts_sql(f"SELECT * FROM '{p}/*.parquet'", ["g"], "ts", 7)
            ).fetchall()
        )
        assert got == want


class TestCcf:
    def _df(self, spark, xs, ys):
        rows = [("a", i, x, y) for i, (x, y) in enumerate(zip(xs, ys))]
        return spark.createDataFrame(rows, "g string, t bigint, x bigint, y bigint")

    def test_lag_zero_is_pearson(self, spark):
        import math

        from stepist_spark.operators.timeseries import ccf

        xs = [3, 1, 4, 1, 5, 9, 2, 6]
        ys = [2, 7, 1, 8, 2, 8, 1, 8]
        out = {r["lag"]: r for r in ccf(self._df(spark, xs, ys), ["g"], "t", "x", "y").collect()}
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        cov = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
        vx = n * sum(a * a for a in xs) - sx * sx
        vy = n * sum(b * b for b in ys) - sy * sy
        assert abs(out[0]["corr"] - round(cov / math.sqrt(vx * vy), 6)) < 1e-9
        assert out[0]["n_pairs"] == n

    def test_shift_detection(self, spark):
        from stepist_spark.operators.timeseries import ccf

        # y_t = x_{t+2}: y anticipates x by two steps (y LEADS).
        # corr(x_t, y_{t-k}) with y_{t-k} = x_{t-k+2} is exactly 1.0
        # at k = +2 — the sign convention the docstring promises.
        base = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
        ys = base[2:] + [0, 0]
        out = {r["lag"]: r["corr"] for r in
               ccf(self._df(spark, base, ys), ["g"], "t", "x", "y", max_lag=3).collect()}
        peak = max((v, k) for k, v in out.items() if v is not None)
        assert peak[1] == 2 and abs(peak[0] - 1.0) < 1e-6

    def test_acf_diagonal(self, spark):
        # ccf(x, x) at positive lags equals acf(x)
        from stepist_spark.operators.timeseries import acf, ccf

        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
        df = self._df(spark, xs, xs)
        got = {r["lag"]: (r["n_pairs"], r["corr"]) for r in
               ccf(df, ["g"], "t", "x", "y", max_lag=3).collect() if r["lag"] > 0}
        want = {r["lag"]: (r["n_pairs"], r["corr"]) for r in
                acf(df.select("g", "t", F.col("x").alias("v")), ["g"], "t", "v",
                    max_lag=3).collect()}
        assert got == want

    def test_requires_groups(self, spark):
        import pytest

        from stepist_spark.operators.timeseries import ccf

        with pytest.raises(ValueError):
            ccf(self._df(spark, [1, 2], [3, 4]), [], "t", "x", "y")

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.timeseries import ccf, ccf_sql

        rows = [
            (f"g{i % 2}", i // 2, (i * 7) % 23, (i * 5) % 17) for i in range(120)
        ]
        df = spark.createDataFrame(rows, "g string, t bigint, x bigint, y bigint")
        p = str(tmp_path / "ccf.parquet")
        df.write.parquet(p)
        got = sorted(
            tuple(r) for r in ccf(df, ["g"], "t", "x", "y", max_lag=3).collect()
        )
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                ccf_sql(f"SELECT * FROM '{p}/*.parquet'", ["g"], "t", "x", "y", 3)
            ).fetchall()
        )
        assert got == want


def _mk_ref(ts, ys, scale=1_000_000):
    import math
    from collections import Counter

    n = len(ys)
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie
    sd = math.sqrt(var18 / 18) if var18 > 0 else None
    z = None if sd is None else ((s - 1) / sd if s > 0 else (s + 1) / sd if s < 0 else 0.0)
    slopes = sorted(
        math.floor((ys[j] - ys[i]) * scale / (ts[j] - ts[i]))
        for i in range(n)
        for j in range(i + 1, n)
    )
    m = len(slopes)
    sen2x = slopes[(m - 1) // 2] + slopes[m // 2]
    return s, var18, sen2x, z


class TestMannKendall:
    def _df(self, spark, series):
        rows = [(g, t, y) for g, pts in series.items() for t, y in pts]
        return spark.createDataFrame(rows, "g string, t long, y long")

    def test_matches_closed_form(self, spark):
        from stepist_spark.operators.timeseries import mann_kendall_trend

        ts = [0, 1, 2, 3, 5, 8, 9]
        ys = [10, 12, 11, 15, 15, 18, 17]
        df = self._df(spark, {"a": list(zip(ts, ys))})
        (r,) = mann_kendall_trend(df, ["g"], "t", "y").collect()
        s, var18, sen2x, z = _mk_ref(ts, ys)
        assert (r["n_obs"], r["s"], r["var18"], r["sen2x_scaled"]) == (
            7, s, var18, sen2x,
        )
        assert abs(r["z_stat"] - z) < 1e-5

    def test_monotone_series_and_grouping(self, spark):
        from stepist_spark.operators.timeseries import mann_kendall_trend

        up = [(t, 10 + 3 * t) for t in range(6)]
        down = [(t, 50 - 2 * t) for t in range(6)]
        df = self._df(spark, {"up": up, "down": down})
        rows = {r["g"]: r for r in mann_kendall_trend(df, ["g"], "t", "y").collect()}
        assert rows["up"]["s"] == 15 and rows["down"]["s"] == -15  # all pairs agree
        assert rows["up"]["z_stat"] > 0 > rows["down"]["z_stat"]
        # constant slope: the pairwise-slope median IS the slope (×2×1e6)
        assert rows["up"]["sen2x_scaled"] == 2 * 3_000_000
        assert rows["down"]["sen2x_scaled"] == 2 * -2_000_000

    def test_flat_series_zero_variance_null(self, spark):
        from stepist_spark.operators.timeseries import mann_kendall_trend

        df = self._df(spark, {"flat": [(t, 7) for t in range(5)]})
        (r,) = mann_kendall_trend(df, ["g"], "t", "y").collect()
        assert r["s"] == 0 and r["z_stat"] is None  # all ties: var18 == 0
        assert r["sen2x_scaled"] == 0

    def test_empty_groups_raise(self, spark):
        import pytest

        from stepist_spark.operators.timeseries import mann_kendall_trend

        df = self._df(spark, {"a": [(0, 1)]})
        with pytest.raises(ValueError, match="mann_kendall_trend"):
            mann_kendall_trend(df, [], "t", "y")

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.timeseries import (
            mann_kendall_trend,
            mann_kendall_trend_sql,
        )

        series = {
            "a": [(t, (t * 7) % 13 + t) for t in range(25)],
            "b": [(t * 2, 40 - t + (t % 5)) for t in range(20)],
        }
        df = self._df(spark, series)
        p = str(tmp_path / "mk.parquet")
        df.write.parquet(p)
        got = sorted(
            tuple(r) for r in mann_kendall_trend(df, ["g"], "t", "y").collect()
        )
        con = duckdb.connect()
        want = sorted(
            con.execute(
                mann_kendall_trend_sql(
                    f"SELECT * FROM '{p}/*.parquet'", ["g"], "t", "y"
                )
            ).fetchall()
        )
        assert got == want
