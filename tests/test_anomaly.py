"""Rolling z-score anomaly scoring: hand-computed reference, history
guards, and the DuckDB mirror parity that backs the q22 gate part."""

from __future__ import annotations

import math

import duckdb
import pytest

from stepist_spark.operators.anomaly import rolling_zscore, rolling_zscore_sql

# (key, t, n): steady series with one planted spike at t=8
ROWS = [("a", t, 10 + (t % 3) + (40 if t == 8 else 0)) for t in range(12)] + [
    ("b", t, 5) for t in range(9)  # constant history -> zero variance
]


def py_reference(rows, lookback=6, threshold=2.0):
    out = {}
    by_key: dict = {}
    for k, t, n in sorted(rows):
        by_key.setdefault(k, []).append((t, n))
    for k, series in by_key.items():
        for i, (t, n) in enumerate(series):
            hist = [v for _, v in series[max(0, i - lookback) : i]]
            z = None
            if len(hist) == lookback:
                s, s2, kk = sum(hist), sum(v * v for v in hist), len(hist)
                var_num = kk * s2 - s * s
                if var_num > 0:
                    var = var_num / (kk * (kk - 1))
                    z = round((n - s / kk) / math.sqrt(var), 6)
            out[(k, t)] = (z, z is not None and abs(z) > threshold)
    return out


class TestRollingZscore:
    @pytest.fixture(scope="class")
    def windowed(self, spark):
        return spark.createDataFrame(ROWS, "key string, t int, n long")

    def test_matches_python_reference(self, spark, windowed):
        got = {
            (r.key, r.t): (r.z, r.is_anomaly)
            for r in rolling_zscore(windowed, ["key"], "t", "n").collect()
        }
        assert got == py_reference(ROWS)

    def test_spike_flagged_steady_not(self, spark, windowed):
        rows = {
            (r.key, r.t): r
            for r in rolling_zscore(windowed, ["key"], "t", "n").collect()
        }
        assert rows[("a", 8)].is_anomaly
        assert not rows[("a", 7)].is_anomaly
        # constant series: zero variance -> NULL z, never flagged
        assert all(rows[("b", t)].z is None for t in range(9))

    def test_duckdb_mirror_parity(self, spark, windowed):
        got = sorted(
            (r.key, r.t, r.z, r.is_anomaly)
            for r in rolling_zscore(windowed, ["key"], "t", "n").collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE w (key VARCHAR, t INT, n BIGINT)")
        con.executemany("INSERT INTO w VALUES (?, ?, ?)", ROWS)
        sql = rolling_zscore_sql("SELECT * FROM w", ["key"], "t", "n")
        # mirror schema == Spark schema: windowed cols + z + is_anomaly
        exp = sorted(
            (k, t, z, flag) for k, t, n, z, flag in con.execute(sql).fetchall()
        )
        assert got == exp

    def test_huge_values_no_bigint_overflow(self, spark):
        # round-3 ADVICE: Σx² in bigint overflows (ANSI error) once
        # x ~ 1.2e9 with lookback 6; decimal(38,0) accumulation must
        # survive and still match the Python reference (exact ints)
        rows = [("a", t, 3_000_000_000 + (t % 5) + (10**9 if t == 8 else 0))
                for t in range(12)]
        df = spark.createDataFrame(rows, "key string, t int, n long")
        got = {
            (r.key, r.t): (r.z, r.is_anomaly)
            for r in rolling_zscore(df, ["key"], "t", "n").collect()
        }
        assert got == py_reference(rows)
        assert got[("a", 8)][1]  # the planted spike is still flagged


class TestFunnel:
    EVENTS = [
        # u1 completes view->click->purchase inside the windows
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:30:00", "click"),
        (1, "2024-01-01 11:00:00", "purchase"),
        # u2 clicks too late after the earliest view (no re-anchor)
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 12:30:00", "click"),
        (2, "2024-01-01 12:40:00", "purchase"),
        # u3 views and clicks, never purchases in window
        (3, "2024-01-01 09:00:00", "view"),
        (3, "2024-01-01 09:10:00", "click"),
        (3, "2024-01-02 09:00:00", "purchase"),
        # u4 purchase before click: order matters
        (4, "2024-01-01 09:00:00", "view"),
        (4, "2024-01-01 09:05:00", "purchase"),
        (4, "2024-01-01 09:10:00", "click"),
    ]

    @pytest.fixture(scope="class")
    def events(self, spark):
        return spark.createDataFrame(
            [(u, ts, et) for u, ts, et in self.EVENTS],
            "user_id long, ts string, event_type string",
        ).selectExpr("user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_type")

    def test_funnel_counts(self, spark, events):
        from stepist_spark.operators.anomaly import funnel_stages

        got = {
            r.stage: r.n_users
            for r in funnel_stages(
                events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
            ).collect()
        }
        # view: u1-u4; click within 1h of first view: u1, u3, u4;
        # purchase within 1h after that click: u1 only (u4's purchase
        # precedes its click; u3's is next-day)
        assert got == {"view": 4, "click": 3, "purchase": 1}

    def test_duckdb_mirror_parity(self, spark, events):
        from stepist_spark.operators.anomaly import funnel_stages, funnel_stages_sql

        got = sorted(
            (r.stage_idx, r.stage, r.n_users)
            for r in funnel_stages(
                events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE e (user_id BIGINT, ts TIMESTAMP, event_type VARCHAR)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?)", self.EVENTS)
        sql = funnel_stages_sql(
            "SELECT * FROM e", "user_id", "ts", "event_type",
            ["view", "click", "purchase"],
        )
        exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == exp


class TestEventTransitions:
    ROWS = [
        (1, "2024-01-01 10:00:00", "view", 1),
        (1, "2024-01-01 10:05:00", "click", 2),
        (1, "2024-01-01 10:06:00", "purchase", 3),
        (2, "2024-01-01 09:00:00", "view", 4),
        (2, "2024-01-01 09:30:00", "view", 5),
        (3, "2024-01-02 09:00:00", "click", 6),
    ]

    def _events(self, spark):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            self.ROWS, "user_id bigint, ts string, event_type string, event_id bigint"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    def test_counts(self, spark):
        from stepist_spark.operators.anomaly import event_transitions

        got = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in event_transitions(
                self._events(spark), "user_id", "ts", "event_type", "event_id"
            ).collect()
        }
        assert got == {("view", "click"): 1, ("click", "purchase"): 1, ("view", "view"): 1}

    def test_single_event_user_contributes_nothing(self, spark):
        from stepist_spark.operators.anomaly import event_transitions

        out = event_transitions(
            self._events(spark).filter("user_id = 3"),
            "user_id", "ts", "event_type", "event_id",
        )
        assert out.count() == 0


class TestCohortRetention:
    def test_triangle(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.anomaly import cohort_retention

        rows = [
            (1, "2024-01-01 10:00:00"),  # Mon wk0 cohort 2024-01-01
            (1, "2024-01-10 10:00:00"),  # wk1
            (1, "2024-01-11 10:00:00"),  # wk1 again -> still one row
            (2, "2024-01-03 10:00:00"),  # wk0 cohort
            (2, "2024-01-17 10:00:00"),  # wk2
            (3, "2024-01-09 10:00:00"),  # cohort 2024-01-08
        ]
        ev = spark.createDataFrame(rows, "user_id bigint, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        got = {
            (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
            for r in cohort_retention(ev, "user_id", "ts").collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 2): 1,
            ("2024-01-08", 0): 1,
        }


class TestGroupedMedianMad:
    def test_exact_values(self, spark):
        from stepist_spark.operators.anomaly import grouped_median_mad

        rows = [("a", v) for v in [1.0, 3.0, 5.0, 7.0, 100.0]] + [
            ("b", v) for v in [10.0, 20.0]
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r["g"]: (r["median"], r["mad"], r["n"])
            for r in grouped_median_mad(df, ["g"], "v").collect()
        }
        # a: sorted [1,3,5,7,100], rank (5+1)//2=3 -> 5; deviations
        # [4,2,0,2,95] sorted [0,2,2,4,95] -> rank 3 -> 2
        # b: rank (2+1)//2=1 -> 10; deviations [0,10] -> rank 1 -> 0
        assert got == {"a": (5.0, 2.0, 5), "b": (10.0, 0.0, 2)}

    def test_outlier_resistant(self, spark):
        from stepist_spark.operators.anomaly import grouped_median_mad

        clean = [("g", float(i)) for i in range(1, 100)]
        dirty = clean + [("g", 1e12)]
        df_c = spark.createDataFrame(clean, "g string, v double")
        df_d = spark.createDataFrame(dirty, "g string, v double")
        mc = grouped_median_mad(df_c, ["g"], "v").collect()[0]
        md = grouped_median_mad(df_d, ["g"], "v").collect()[0]
        assert abs(mc["median"] - md["median"]) <= 1.0
        assert abs(mc["mad"] - md["mad"]) <= 1.0


class TestGroupedWeightedMedian:
    def test_hand_example(self, spark):
        from stepist_spark.operators.anomaly import grouped_weighted_median

        # values 1..4 with weights 1,1,5,1: cum at 3 is 7 of 8 -> first
        # value with 2*cum >= tot is 3
        df = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 5), ("a", 4.0, 1)],
            "g string, v double, w bigint",
        )
        (r,) = grouped_weighted_median(df, ["g"], "v", "w").collect()
        assert (r["weighted_median"], r["total_weight"]) == (3.0, 8)

    def test_unit_weights_match_lower_median(self, spark):
        from stepist_spark.operators.anomaly import grouped_weighted_median

        import random

        rng = random.Random(3)
        rows = [("g", float(rng.randrange(100)), 1) for _ in range(101)]
        df = spark.createDataFrame(rows, "g string, v double, w bigint")
        (r,) = grouped_weighted_median(df, ["g"], "v", "w").collect()
        vals = sorted(v for _, v, _ in rows)
        # lower median: smallest v with 2*rank >= n
        import math

        assert r["weighted_median"] == vals[math.ceil(len(vals) / 2) - 1]

    def test_python_reference_random_weights(self, spark):
        from stepist_spark.operators.anomaly import grouped_weighted_median

        import random

        rng = random.Random(9)
        rows = [
            (g, float(rng.randrange(20)), rng.randrange(1, 6))
            for g in ("x", "y")
            for _ in range(60)
        ]
        df = spark.createDataFrame(rows, "g string, v double, w bigint")
        got = {
            r["g"]: (r["weighted_median"], r["total_weight"])
            for r in grouped_weighted_median(df, ["g"], "v", "w").collect()
        }
        for g in ("x", "y"):
            items = sorted((v, w) for gg, v, w in rows if gg == g)
            tot = sum(w for _, w in items)
            cum = 0
            for v, w in items:
                cum += w
                if 2 * cum >= tot:
                    assert got[g] == (v, tot)
                    break


class TestCusumChangepoint:
    def test_planted_level_shift(self, spark):
        import datetime as dt

        from stepist_spark.operators.anomaly import cusum_changepoint

        base = dt.datetime(2024, 1, 1)
        # 10 points at 1.0 then 10 points at 5.0: |D| peaks at the shift
        rows = [
            ("g", base + dt.timedelta(hours=i), 1.0 if i < 10 else 5.0, i)
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double, id bigint")
        [r] = cusum_changepoint(df, ["g"], "ts", "v", "id").collect()
        assert r["t_at_max"] == 10 and r["change_id"] == 9
        assert r["n"] == 20
        # stat = max|sum_{i<=t}(v_i - mean)| ; mean=3, t=10 -> |10*1-10*3| = 20
        assert abs(r["cusum_stat"] - 20.0) < 1e-6

    def test_matches_python_bruteforce(self, spark):
        import datetime as dt
        import random

        from stepist_spark.operators.anomaly import cusum_changepoint

        rng = random.Random(3)
        vals = [round(rng.uniform(0, 10), 3) for _ in range(50)]
        base = dt.datetime(2024, 1, 1)
        rows = [
            ("g", base + dt.timedelta(minutes=i), v, i) for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double, id bigint")
        [r] = cusum_changepoint(df, ["g"], "ts", "v", "id").collect()
        scale = 10**6
        iv = [int((v * scale) + 0.5) for v in vals]
        n, tot = len(iv), sum(iv)
        best_t, best_d = None, -1
        p = 0
        for t, v in enumerate(iv, start=1):
            p += v
            d = abs(n * p - t * tot)
            if d > best_d:
                best_t, best_d = t, d
        assert r["t_at_max"] == best_t
        assert int(r["d_abs_scaled"]) == best_d

    def test_flat_series_zero(self, spark):
        import datetime as dt

        from stepist_spark.operators.anomaly import cusum_changepoint

        base = dt.datetime(2024, 1, 1)
        rows = [("g", base + dt.timedelta(hours=i), 2.5, i) for i in range(5)]
        df = spark.createDataFrame(rows, "g string, ts timestamp, v double, id bigint")
        [r] = cusum_changepoint(df, ["g"], "ts", "v", "id").collect()
        assert r["cusum_stat"] == 0.0
        # all |D|=0: earliest (ts, id) wins
        assert r["t_at_max"] == 1 and r["change_id"] == 0


class TestEventPaths:
    def test_trigram_counts(self, spark):
        import datetime as dt

        from stepist_spark.operators.anomaly import event_paths

        base = dt.datetime(2024, 1, 1)
        seq = {1: ["v", "c", "p", "v"], 2: ["v", "c", "p"], 3: ["c", "p"]}
        rows = [
            (u, base + dt.timedelta(minutes=i), t, u * 100 + i)
            for u, types in seq.items()
            for i, t in enumerate(types)
        ]
        df = spark.createDataFrame(rows, "u bigint, ts timestamp, t string, id bigint")
        got = {r["path"]: r["n"] for r in event_paths(df, "u", "ts", "t", "id").collect()}
        # user1 contributes v>c>p and c>p>v; user2 contributes v>c>p
        assert got == {"v>c>p": 2, "c>p>v": 1}

    def test_no_cross_user_paths(self, spark):
        import datetime as dt

        from stepist_spark.operators.anomaly import event_paths

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, "a", 1), (1, base + dt.timedelta(minutes=1), "b", 2),
            (2, base + dt.timedelta(minutes=2), "c", 3),
        ]
        df = spark.createDataFrame(rows, "u bigint, ts timestamp, t string, id bigint")
        assert event_paths(df, "u", "ts", "t", "id", path_len=3).count() == 0


class TestSeasonalBaseline:
    def test_planted_weekday_effect(self, spark):
        import datetime as dt

        from stepist_spark.operators.anomaly import seasonal_baseline

        # 4 weeks: Mondays get 10 events, other days 2 — except one
        # anomalous Monday with 22
        rows = []
        eid = 0
        base = dt.date(2024, 1, 1)  # a Monday
        for d in range(28):
            day = base + dt.timedelta(days=d)
            n = 10 if day.weekday() == 0 else 2
            if d == 21:
                n = 22  # anomalous 4th Monday
            for _ in range(n):
                rows.append(("g", dt.datetime.combine(day, dt.time(12)), eid))
                eid += 1
        df = spark.createDataFrame(rows, "g string, ts timestamp, id bigint")
        out = {
            (str(r["day"]), r["n"]): r
            for r in seasonal_baseline(df, ["g"], "ts").collect()
        }
        anom = out[("2024-01-22", 22)]
        # Monday cohort: 10,10,10,22 -> mean 13 -> resid 9
        assert anom["days_dow"] == 4 and anom["sum_dow"] == 52
        assert anom["resid"] == 9.0
        normal = out[("2024-01-08", 10)]
        assert normal["resid"] == -3.0  # 10 vs 13
        tue = out[("2024-01-02", 2)]
        assert tue["resid"] == 0.0

    def test_negative_resid_division(self, spark):
        import datetime as dt

        from stepist_spark.operators.anomaly import seasonal_baseline

        # cohort counts 1, 2, 4 -> mean 7/3; resid for n=1 is -4/3
        rows = []
        eid = 0
        for week, n in enumerate((1, 2, 4)):
            day = dt.date(2024, 1, 1) + dt.timedelta(days=7 * week)
            for _ in range(n):
                rows.append(("g", dt.datetime.combine(day, dt.time(9)), eid))
                eid += 1
        df = spark.createDataFrame(rows, "g string, ts timestamp, id bigint")
        got = {r["n"]: r["resid_scaled"] for r in seasonal_baseline(df, ["g"], "ts").collect()}
        # (1*3 - 7) * 1e6 DIV 3 = -4000000 DIV 3 = -1333333 (trunc toward 0)
        assert got[1] == -1333333
        assert got[4] == 1666666


class TestWinsorizedStats:
    def test_clamps_outliers(self, spark):
        from stepist_spark.operators.anomaly import winsorized_stats

        # 18 values of 10.00, one 0.01, one 1000.00 -> p5=0.01? n=20:
        # r_lo = ceil(20*5/100)=1 -> p_lo = min value (0.01);
        # r_hi = ceil(20*95/100)=19 -> p_hi = 10.00 (cum at 10.00 is 19)
        rows = [("g", 10.0)] * 18 + [("g", 0.01), ("g", 1000.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        [r] = winsorized_stats(df, ["g"], "v").collect()
        assert r["n"] == 20
        assert r["p_lo_cents"] == 1 and r["p_hi_cents"] == 1000
        # sum = 18*1000 + 1 + clamp(100000 -> 1000) = 19001
        assert r["sum_wins_cents"] == 19001
        assert r["mean_wins"] == round(19001 / 2000.0, 6)

    def test_matches_python(self, spark):
        import random

        from stepist_spark.operators.anomaly import winsorized_stats

        rng = random.Random(5)
        vals = [round(rng.uniform(0, 100), 2) for _ in range(200)]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        [r] = winsorized_stats(df, ["g"], "v").collect()
        cents = sorted(int(v * 100 + 0.5) for v in vals)
        n = len(cents)
        p_lo = cents[max(1, -(-n * 5 // 100)) - 1]
        p_hi = cents[max(1, -(-n * 95 // 100)) - 1]
        exp = sum(min(p_hi, max(p_lo, c)) for c in cents)
        assert (r["p_lo_cents"], r["p_hi_cents"]) == (p_lo, p_hi)
        assert r["sum_wins_cents"] == exp


class TestGiniCoefficient:
    def test_known_values(self, spark):
        from stepist_spark.operators.anomaly import gini_coefficient

        # perfectly equal -> 0
        eq = spark.createDataFrame([("g", 5.0)] * 4, "g string, v double")
        [r] = gini_coefficient(eq, ["g"], "v").collect()
        assert r["gini"] == 0.0
        # one holder of everything among n=4: G = (n-1)/n = 0.75
        conc = spark.createDataFrame(
            [("g", 0.0)] * 3 + [("g", 100.0)], "g string, v double"
        )
        [r2] = gini_coefficient(conc, ["g"], "v").collect()
        assert r2["gini"] == 0.75

    def test_matches_python(self, spark):
        import random

        from stepist_spark.operators.anomaly import gini_coefficient

        rng = random.Random(2)
        vals = [round(rng.uniform(0, 500), 2) for _ in range(100)]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        [r] = gini_coefficient(df, ["g"], "v").collect()
        cents = sorted(int(v * 100 + 0.5) for v in vals)
        n, t = len(cents), sum(cents)
        s = sum((i + 1) * x for i, x in enumerate(cents))
        exp = round((2.0 * s) / (n * t) - (n + 1.0) / n, 6)
        assert r["gini"] == exp


class TestQuantileBuckets:
    def test_bucket_assignment(self, spark):
        from stepist_spark.operators.anomaly import quantile_buckets

        # 1..8 into 4 buckets: pairs per bucket
        rows = [("g", float(v)) for v in range(1, 9)]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r["v_cents"]: r["bucket"]
            for r in quantile_buckets(df, ["g"], "v", 4).collect()
        }
        assert got == {100: 1, 200: 1, 300: 2, 400: 2, 500: 3, 600: 3, 700: 4, 800: 4}

    def test_ties_share_bucket(self, spark):
        from stepist_spark.operators.anomaly import quantile_buckets

        rows = [("g", 1.0)] * 6 + [("g", 2.0)] * 2
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r["v_cents"]: r["bucket"]
            for r in quantile_buckets(df, ["g"], "v", 4).collect()
        }
        assert got == {100: 3, 200: 4}  # cum 6/8 -> ceil(24/8)=3; cum 8 -> 4


class TestInterarrivalBurstiness:
    def test_matches_python_and_regimes(self, spark):
        import datetime as dt
        import math

        from stepist_spark.operators.anomaly import interarrival_burstiness

        t0 = dt.datetime(2024, 1, 1)
        periodic = [("p", t0 + dt.timedelta(seconds=10 * i), i) for i in range(20)]
        bursty_gaps = [1, 1, 1, 1, 1, 1, 1, 1, 1, 600] * 2
        ts, acc = [], 0
        for g in bursty_gaps:
            acc += g
            ts.append(acc)
        bursty = [("b", t0 + dt.timedelta(seconds=s), i) for i, s in enumerate(ts)]
        df = spark.createDataFrame(
            periodic + bursty, "g string, ts timestamp, id bigint"
        )
        out = {
            r["g"]: r
            for r in interarrival_burstiness(df, ["g"], "ts", "id").collect()
        }
        assert out["p"]["cv"] == 0.0 and out["p"]["burstiness"] == -1.0
        gaps = [(ts[i] - ts[i - 1]) * 10**6 for i in range(1, len(ts))]
        n = len(gaps)
        mean = sum(gaps) / n
        var = sum((x - mean) ** 2 for x in gaps) / (n - 1)
        cv = math.sqrt(var) / mean
        assert abs(out["b"]["cv"] - cv) < 1e-4
        assert abs(out["b"]["burstiness"] - (cv - 1) / (cv + 1)) < 1e-4
        assert out["b"]["burstiness"] > 0.4  # clearly bursty

    def test_single_event_group_absent(self, spark):
        import datetime as dt

        from stepist_spark.operators.anomaly import interarrival_burstiness

        df = spark.createDataFrame(
            [("solo", dt.datetime(2024, 1, 1), 1)], "g string, ts timestamp, id bigint"
        )
        assert interarrival_burstiness(df, ["g"], "ts", "id").count() == 0


class TestPercentileCont:
    def test_matches_numpy_linear(self, spark):
        import numpy as np

        from stepist_spark.operators.anomaly import grouped_percentile_cont

        vals = [3.0, 1.0, 4.0, 1.5, 5.0, 9.0, 2.5, 6.0]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        out = {
            (r["q_num"], r["q_den"]): r
            for r in grouped_percentile_cont(df, ["g"], "v").collect()
        }
        for (a, b) in ((1, 4), (1, 2), (19, 20)):
            want = float(np.percentile(vals, 100 * a / b, method="linear"))
            assert abs(out[(a, b)]["value"] - want) < 1e-6, (a, b)
            assert out[(a, b)]["n"] == len(vals)

    def test_single_row_and_exact_hit(self, spark):
        from stepist_spark.operators.anomaly import grouped_percentile_cont

        df = spark.createDataFrame([("g", 7.0)], "g string, v double")
        out = grouped_percentile_cont(df, ["g"], "v", [(1, 2)]).collect()
        assert out[0]["value"] == 7.0

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.anomaly import (
            grouped_percentile_cont,
            grouped_percentile_cont_sql,
        )

        import random

        rng = random.Random(2)
        rows = [(f"g{i % 3}", round(rng.uniform(0, 99), 2)) for i in range(300)]
        df = spark.createDataFrame(rows, "g string, v double")
        p = str(tmp_path / "t.parquet")
        df.write.parquet(p)
        got = sorted(tuple(r) for r in grouped_percentile_cont(df, ["g"], "v").collect())
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                grouped_percentile_cont_sql(
                    f"SELECT * FROM '{p}/*.parquet'", ["g"], "v"
                )
            ).fetchall()
        )
        assert got == want


class TestEmptyGroupHygiene:
    """Round-7 verdict #3: value-counts operators accept the ungrouped
    call via the explicit lit(0) whole-frame route; raw-row operators
    refuse it. Either way, no bare unpartitioned window can appear."""

    @staticmethod
    def _vals(spark):
        data = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 100.0, 6.0, 7.0, 8.0]
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(data)], "id bigint, v double"
        )

    def test_value_counts_ops_accept_empty_groups(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators import anomaly
        from stepist_spark.plans import unpartitioned_windows

        df = self._vals(spark)
        konst = df.withColumn("k", F.lit("a"))
        for build in (
            lambda d, g: anomaly.grouped_median_mad(d, g, "v"),
            lambda d, g: anomaly.winsorized_stats(d, g, "v"),
            lambda d, g: anomaly.gini_coefficient(d, g, "v"),
            lambda d, g: anomaly.quantile_buckets(d, g, "v"),
            lambda d, g: anomaly.grouped_weighted_median(
                d.withColumn("w", F.lit(2)), g, "v", "w"
            ),
        ):
            ungrouped = build(df, [])
            assert unpartitioned_windows(ungrouped) == []
            got = sorted(map(tuple, ungrouped.collect()))
            # the ungrouped result must equal the constant-group twin
            want = sorted(tuple(r)[1:] for r in build(konst, ["k"]).collect())
            assert got == want

    def test_raw_row_ops_refuse_empty_groups(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from stepist_spark.operators import anomaly

        df = self._vals(spark).withColumn(
            "ts", (F.lit(1600000000) + F.col("id")).cast("timestamp")
        )
        with pytest.raises(ValueError, match="non-empty"):
            anomaly.rolling_zscore(df, [], "id", "v")
        with pytest.raises(ValueError, match="non-empty"):
            anomaly.cusum_changepoint(df, [], "ts", "v", "id")
        with pytest.raises(ValueError, match="non-empty"):
            anomaly.interarrival_burstiness(df, [], "ts", "id")

    def test_other_raw_row_guards(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from stepist_spark.operators import topk, privacy, timeseries
        from stepist_spark.operators.cdc import latest_changes

        df = self._vals(spark)
        with pytest.raises(ValueError, match="non-empty"):
            topk.grouped_topk(df, [], [F.col("v").desc()], 3)
        with pytest.raises(ValueError, match="non-empty"):
            privacy.k_anonymity(df, [], 2)
        ts = df.withColumn("ts", (F.lit(1600000000) + F.col("id")).cast("timestamp"))
        with pytest.raises(ValueError, match="non-empty"):
            timeseries.time_weighted_avg(ts, [], "ts", "v", "id")
        with pytest.raises(ValueError, match="non-empty"):
            timeseries.acf(ts, [], "id", "v", 2)
        with pytest.raises(ValueError, match="non-empty"):
            latest_changes(
                df.withColumn("op", F.lit("I")).withColumn("seq", F.col("id")),
                [], "seq", "op",
            )


class TestValueCountsReuse:
    """The rank-statistics-family value_counts= reuse inputs (round-10
    verdict #2) must be bit-identical to the self-scanning paths."""

    def _df(self, spark):
        import random

        rng = random.Random(11)
        rows = [
            (rng.choice("ABN"), float(rng.randint(1, 30)),
             round(rng.uniform(10, 900), 2))
            for _ in range(500)
        ]
        return spark.createDataFrame(rows, "g string, q double, p double")

    def test_all_reuse_paths_match(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.operators.anomaly import (
            grouped_median_mad,
            grouped_percentile_cont,
            grouped_weighted_median,
            quantile_buckets,
            winsorized_stats,
        )

        df = self._df(spark)
        raw_q = df.groupBy("g", "q").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        cents_q = (
            df.select("g", F.floor(F.col("q") * 100 + F.lit(0.5))
              .cast("bigint").alias("v"))
            .groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        cents_p = (
            df.select("g", F.floor(F.col("p") * 100 + F.lit(0.5))
              .cast("bigint").alias("v"))
            .groupBy("g", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        weights = df.groupBy("g", "p").agg(
            F.sum(F.col("q").cast("bigint")).alias("w")
        )

        def rows(d):
            return sorted(map(tuple, d.collect()))

        assert rows(grouped_median_mad(df, ["g"], "q")) == rows(
            grouped_median_mad(df, ["g"], "q", value_counts=raw_q)
        )
        assert rows(winsorized_stats(df, ["g"], "p")) == rows(
            winsorized_stats(df, ["g"], "p", value_counts=cents_p)
        )
        assert rows(quantile_buckets(df, ["g"], "q", n_buckets=4)) == rows(
            quantile_buckets(
                df, ["g"], "q", n_buckets=4,
                value_counts=cents_q.withColumnRenamed("v", "v_cents"),
            )
        )
        assert rows(grouped_percentile_cont(df, ["g"], "q")) == rows(
            grouped_percentile_cont(df, ["g"], "q", value_counts=cents_q)
        )
        assert rows(grouped_weighted_median(df, ["g"], "p", "q")) == rows(
            grouped_weighted_median(
                df, ["g"], "p", "q", weight_counts=weights
            )
        )
