"""Kaplan-Meier product-limit estimator vs a pure-Python reference."""

from __future__ import annotations

import math

from stepist_spark.operators.survival import kaplan_meier, kaplan_meier_sql


def _km_ref(pairs):
    """pairs: (t, event). Returns {t: (n_risk, d, c, s_log_scaled|None)}
    computed the textbook way (float survival kept alongside to sanity-
    check the log-scaled integer encoding)."""
    times = sorted({t for t, _ in pairs})
    out = {}
    at_risk = len(pairs)
    log_sum = 0
    dead = False
    for t in times:
        d = sum(1 for u, e in pairs if u == t and e)
        c = sum(1 for u, e in pairs if u == t and not e)
        if d > 0 and at_risk > d:
            log_sum += math.floor(math.log((at_risk - d) / at_risk) * 1_000_000)
        if d > 0 and at_risk == d:
            dead = True
        out[t] = (at_risk, d, c, None if dead else log_sum)
        at_risk -= d + c
    return out


class TestKaplanMeier:
    def test_matches_reference(self, spark):
        pairs = [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0), (6, 1), (8, 0), (8, 1)]
        df = spark.createDataFrame(
            [(t, e) for t, e in pairs], "dur bigint, ev bigint"
        )
        rows = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
        ref = _km_ref(pairs)
        assert set(rows) == set(ref)
        for t, (n_risk, d, c, s) in ref.items():
            r = rows[t]
            assert (r["n_risk"], r["d"], r["c"], r["s_log_scaled"]) == (n_risk, d, c, s)

    def test_censoring_keeps_survival_flat(self, spark):
        # censor-only times contribute no survival drop but shrink the
        # risk set for LATER event times
        df = spark.createDataFrame(
            [(1, 1), (2, 0), (2, 0), (5, 1)], "dur bigint, ev bigint"
        )
        rows = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
        assert rows[2]["s_log_scaled"] == rows[1]["s_log_scaled"]
        assert rows[5]["n_risk"] == 1  # 4 - 1 event - 2 censored
        # the last subject dies: risk set exhausted -> survival 0 -> NULL
        assert rows[5]["s_log_scaled"] is None

    def test_grouped_independent_curves(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 1), ("a", 2, 1), ("b", 1, 0), ("b", 3, 1), ("b", 3, 0)],
            "g string, dur bigint, ev bigint",
        )
        rows = kaplan_meier(df, "dur", "ev", ["g"]).collect()
        a = {r["t"]: r for r in rows if r["g"] == "a"}
        b = {r["t"]: r for r in rows if r["g"] == "b"}
        assert a[1]["n_risk"] == 2 and b[1]["n_risk"] == 3
        ref_a = _km_ref([(1, 1), (2, 1)])
        ref_b = _km_ref([(1, 0), (3, 1), (3, 0)])
        for t, (n_risk, d, c, s) in ref_a.items():
            r = a[t]
            assert (r["n_risk"], r["d"], r["c"], r["s_log_scaled"]) == (n_risk, d, c, s)
        for t, (n_risk, d, c, s) in ref_b.items():
            r = b[t]
            assert (r["n_risk"], r["d"], r["c"], r["s_log_scaled"]) == (n_risk, d, c, s)

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        rows = [
            (str(i % 3), (i * 7) % 23, 1 if i % 4 else 0) for i in range(400)
        ]
        df = spark.createDataFrame(rows, "g string, dur bigint, ev bigint")
        p = str(tmp_path / "km.parquet")
        df.write.parquet(p)
        got = sorted(
            tuple(r) for r in kaplan_meier(df, "dur", "ev", ["g"]).collect()
        )
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                kaplan_meier_sql(
                    f"SELECT * FROM '{p}/*.parquet'", "dur", "ev", [("g", "g")]
                )
            ).fetchall()
        )
        assert got == want

    def test_null_durations_excluded(self, spark):
        # NULL observation times must not skew n_risk (Spark and DuckDB
        # order NULLs on OPPOSITE ends of an ASC sort — a NULL-keyed
        # value-counts row would diverge silently)
        df = spark.createDataFrame(
            [(1, 1), (None, 1), (2, None), (3, 0)], "dur bigint, ev bigint"
        )
        rows = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
        assert set(rows) == {1, 3}
        assert rows[1]["n_risk"] == 2  # only the two fully-observed rows
