"""Waterfill budget allocation + deterministic quota take."""

from __future__ import annotations

from stepist_spark.operators.mixing import (
    take_quota,
    waterfill_allocation,
    waterfill_allocation_sql,
)


def _alloc(spark, avail, budget):
    df = spark.createDataFrame(list(avail.items()), "src string, a bigint")
    return {
        r["key"]: (r["allocated"], r["saturated"])
        for r in waterfill_allocation(df, "src", "a", budget).collect()
    }


class TestWaterfill:
    def test_slack_budget_all_saturated(self, spark):
        got = _alloc(spark, {"a": 10, "b": 20}, 100)
        assert got == {"a": (10, True), "b": (20, True)}

    def test_binding_budget_caps_large_sources(self, spark):
        # avail 10/40/50, budget 70 -> a full (10), b and c capped at 30
        got = _alloc(spark, {"a": 10, "b": 40, "c": 50}, 70)
        assert got["a"] == (10, True)
        assert got["b"] == (30, False)
        assert got["c"] == (30, False)

    def test_floor_undershoot_bounded(self, spark):
        got = _alloc(spark, {"a": 100, "b": 100, "c": 100}, 100)
        # level = 100/3 = 33 floored; total 99 <= 100, undershoot < k
        assert all(v == (33, False) for v in got.values())

    def test_matches_python_bruteforce(self, spark):
        import random

        rng = random.Random(11)
        for trial in range(5):
            avail = {f"s{i}": rng.randrange(1, 500) for i in range(8)}
            budget = rng.randrange(50, 2500)
            got = _alloc(spark, avail, budget)
            # brute-force level search
            total = sum(avail.values())
            if total <= budget:
                want = {k: (v, True) for k, v in avail.items()}
            else:
                ks = sorted(avail.items(), key=lambda kv: (kv[1], kv[0]))
                n = len(ks)
                sat, ssat = set(), 0
                prefix = 0
                for r, (k, a) in enumerate(ks, 1):
                    prefix += a
                    if prefix + a * (n - r) <= budget:
                        sat.add(k)
                        ssat += a
                level = (budget - ssat) // (n - len(sat))
                want = {
                    k: ((v, True) if k in sat else (level, False))
                    for k, v in avail.items()
                }
            assert got == want, (trial, avail, budget)

    def test_sql_mirror(self, spark):
        import duckdb

        avail = {"a": 7, "b": 300, "c": 42, "d": 42}
        df = spark.createDataFrame(list(avail.items()), "src string, a bigint")
        got = sorted(
            tuple(r) for r in waterfill_allocation(df, "src", "a", 120).collect()
        )
        con = duckdb.connect()
        rows = ", ".join(f"('{k}', {v})" for k, v in avail.items())
        want = sorted(
            tuple(r)
            for r in con.execute(
                waterfill_allocation_sql(
                    f"SELECT * FROM (VALUES {rows}) t(src, a)", "src", "a", 120
                )
            ).fetchall()
        )
        assert got == want


class TestTakeQuota:
    def test_exact_counts_and_determinism(self, spark):
        rows = [(f"s{i % 3}", i) for i in range(90)]
        df = spark.createDataFrame(rows, "src string, doc_id bigint")
        q = spark.createDataFrame(
            [("s0", 5), ("s1", 30), ("s2", 0)], "key string, allocated bigint"
        )
        kept = take_quota(df, "src", "doc_id", q)
        got = {
            s: sorted(r["doc_id"] for r in grp)
            for s, grp in __import__("itertools").groupby(
                sorted(kept.collect(), key=lambda r: r["src"]),
                key=lambda r: r["src"],
            )
        }
        assert len(got.get("s0", [])) == 5
        assert len(got.get("s1", [])) == 30
        assert "s2" not in got
        # deterministic across invocations
        again = {
            s: sorted(r["doc_id"] for r in grp)
            for s, grp in __import__("itertools").groupby(
                sorted(take_quota(df, "src", "doc_id", q).collect(), key=lambda r: r["src"]),
                key=lambda r: r["src"],
            )
        }
        assert got == again
