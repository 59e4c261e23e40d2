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
