"""Batch sessionization vs hand-computed sessions and the DuckDB
mirror (exact integer-microsecond gap math)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from stepist_spark.operators.sessions import (
    session_stats,
    session_stats_sql,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz, event_id bigint")


def _us(seconds):
    return T0 + dt.timedelta(microseconds=int(seconds * 1_000_000))


class TestSessionize:
    def test_gap_is_strictly_greater_than(self, spark):
        # 0s, +10s (gap == 10 extends), +20.000001s (gap 10.000001 splits)
        df = _ev(spark, [(1, _us(0), 1), (1, _us(10), 2), (1, _us(20.000001), 3)])
        got = {
            r["event_id"]: r["session_idx"]
            for r in sessionize(df, "user_id", "ts", 10, "event_id").collect()
        }
        assert got == {1: 1, 2: 1, 3: 2}

    def test_users_are_independent(self, spark):
        df = _ev(spark, [(1, _us(0), 1), (2, _us(0), 2), (1, _us(100), 3), (2, _us(1), 4)])
        got = sessionize(df, "user_id", "ts", 10, "event_id").collect()
        by_user = {(r["user_id"], r["event_id"]): r["session_idx"] for r in got}
        assert by_user == {(1, 1): 1, (1, 3): 2, (2, 2): 1, (2, 4): 1}

    def test_same_ts_ordered_by_tiebreak(self, spark):
        df = _ev(spark, [(1, _us(0), 2), (1, _us(0), 1)])
        got = sessionize(df.repartition(3), "user_id", "ts", 10, "event_id")
        assert {r["event_id"]: r["session_idx"] for r in got.collect()} == {1: 1, 2: 1}

    def test_stats_duration_floor_of_micros(self, spark):
        df = _ev(spark, [(1, _us(0), 1), (1, _us(9.7), 2)])
        (row,) = session_stats(df, "user_id", "ts", 10, "event_id").collect()
        assert row["n_events"] == 2
        assert row["duration_sec"] == 9  # floor(9.7s)
        assert row["session_start"] == _us(0) and row["session_end"] == _us(9.7)

    def test_duckdb_mirror_parity(self, spark):
        import random

        rng = random.Random(7)
        rows = []
        eid = 0
        for u in range(20):
            t = 0.0
            for _ in range(rng.randint(1, 40)):
                t += rng.choice([0.0, 1.0, 29.9, 30.0, 30.000001, 120.5])
                eid += 1
                rows.append((u, _us(t), eid))
        df = _ev(spark, rows)
        got = sorted(
            (r["user_id"], r["session_idx"], r["n_events"], r["duration_sec"])
            for r in session_stats(df, "user_id", "ts", 30, "event_id").collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE ev (user_id BIGINT, ts TIMESTAMP, event_id BIGINT)")
        con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
        sql = session_stats_sql("SELECT * FROM ev", "user_id", "ts", 30, "event_id")
        exp = sorted(
            (r[0], r[1], r[2], r[3])
            for r in con.execute(
                f"SELECT u, session_idx, n_events, duration_sec FROM ({sql})"
            ).fetchall()
        )
        assert got == exp


class TestRollingActiveUsers:
    def test_matches_python_brute_force(self, spark):
        import random

        from stepist_spark.operators.sessions import rolling_active_users

        rng = random.Random(5)
        rows = []
        for i in range(800):
            rows.append(
                (rng.randrange(40), T0 + dt.timedelta(days=rng.randrange(20),
                                                      hours=rng.randrange(24)), i)
            )
        df = _ev(spark, rows)
        got = {
            str(r["day"]): r["active_users"]
            for r in rolling_active_users(df, "user_id", "ts", 7).collect()
        }
        pairs = {(u, ts.date()) for u, ts, _ in rows}
        days = sorted({d for _, d in pairs})
        exp = {
            str(d): len(
                {u for u, pd in pairs if 0 <= (d - pd).days < 7}
            )
            for d in days
        }
        assert got == exp

    def test_window_one_is_daily_actives(self, spark):
        from stepist_spark.operators.sessions import rolling_active_users

        rows = [(1, T0, 1), (2, T0, 2), (1, T0 + dt.timedelta(days=1), 3)]
        df = _ev(spark, rows)
        got = sorted(
            (str(r["day"]), r["active_users"])
            for r in rolling_active_users(df, "user_id", "ts", 1).collect()
        )
        assert got == [("2024-01-01", 2), ("2024-01-02", 1)]


class TestLongestDailyStreak:
    def test_hand_example(self, spark):
        from stepist_spark.operators.sessions import longest_daily_streak

        rows = []
        eid = 0
        for day in (1, 2, 3, 7, 8, 20):  # streaks 3, 2, 1
            for _ in range(2):  # duplicate events on the same day
                eid += 1
                rows.append((5, T0 + dt.timedelta(days=day), eid))
        df = _ev(spark, rows)
        (r,) = longest_daily_streak(df, "user_id", "ts").collect()
        assert (r["longest_streak"], r["n_active_days"]) == (3, 6)

    def test_python_reference(self, spark):
        import random

        from stepist_spark.operators.sessions import longest_daily_streak

        rng = random.Random(13)
        rows = [
            (u, T0 + dt.timedelta(days=rng.randrange(30)), i)
            for i, u in enumerate(rng.choices(range(8), k=400))
        ]
        df = _ev(spark, rows)
        got = {
            r["user_id"]: (r["longest_streak"], r["n_active_days"])
            for r in longest_daily_streak(df, "user_id", "ts").collect()
        }
        byu = {}
        for u, ts, _ in rows:
            byu.setdefault(u, set()).add(ts.date())
        for u, days in byu.items():
            ds = sorted(days)
            best = run = 1
            for a, b in zip(ds, ds[1:]):
                run = run + 1 if (b - a).days == 1 else 1
                best = max(best, run)
            assert got[u] == (best, len(ds))
