"""Skyline operator vs brute-force Python domination (the
algorithm-independent witness the q24 oracle also uses)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from stepist_spark.operators.skyline import skyline


def _brute(points):
    """points: list of (id, g, x, y) -> surviving ids."""
    out = []
    for pid, g, x, y in points:
        dominated = any(
            bg == g and bx <= x and by <= y and (bx < x or by < y)
            for _, bg, bx, by in points
        )
        if not dominated:
            out.append(pid)
    return sorted(out)


def _df(spark, points):
    return spark.createDataFrame(points, "id bigint, g string, x bigint, y bigint")


class TestSkyline:
    def _rand_points(self, seed, n, groups=1, span=30):
        rng = random.Random(seed)
        return [
            (i, f"g{rng.randrange(groups)}", rng.randrange(span), rng.randrange(span))
            for i in range(n)
        ]

    def test_matches_brute_force_single_group(self, spark):
        pts = self._rand_points(1, 200)
        got = sorted(r["id"] for r in skyline(_df(spark, pts), "x", "y").collect())
        assert got == _brute(pts)

    def test_matches_brute_force_grouped(self, spark):
        pts = self._rand_points(2, 300, groups=4)
        got = sorted(
            r["id"] for r in skyline(_df(spark, pts), "x", "y", ["g"]).collect()
        )
        assert got == _brute(pts)

    def test_duplicate_points_all_survive(self, spark):
        pts = [(1, "a", 5, 5), (2, "a", 5, 5), (3, "a", 9, 9)]
        got = sorted(r["id"] for r in skyline(_df(spark, pts), "x", "y").collect())
        assert got == [1, 2]  # dup frontier points don't dominate each other

    def test_prefilter_matches_global_and_layout_independent(self, spark):
        pts = self._rand_points(3, 500, groups=3)
        base = _df(spark, pts)
        a = sorted(r["id"] for r in skyline(base, "x", "y", ["g"], prefilter=True).collect())
        b = sorted(r["id"] for r in skyline(base, "x", "y", ["g"], prefilter=False).collect())
        c = sorted(
            r["id"]
            for r in skyline(base.repartition(13), "x", "y", ["g"], prefilter=True).collect()
        )
        assert a == b == c == _brute(pts)

    def test_null_dimensions_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 1), (2, None, 0), (3, 0, None)], "id bigint, x bigint, y bigint"
        )
        got = sorted(r["id"] for r in skyline(df, "x", "y").collect())
        assert got == [1]

    def test_ties_on_one_dim(self, spark):
        # same x: only the min-y row survives; same y: only min-x
        pts = [(1, "a", 3, 7), (2, "a", 3, 4), (3, "a", 1, 9), (4, "a", 2, 9)]
        got = sorted(r["id"] for r in skyline(_df(spark, pts), "x", "y").collect())
        assert got == _brute(pts) == [2, 3]
