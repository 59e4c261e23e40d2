"""Z-order layout: interleave correctness + clustered write."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from stepist_spark.operators.layout import write_zordered, z_value


def _py_z(vals, bits):
    out = 0
    k = len(vals)
    for b in range(bits):
        for d, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * k + d)
    return out


class TestZValue:
    def test_2d_matches_python(self, spark):
        rows = [(3, 5), (0, 0), (65535, 65535), (12345, 54321), (1, 2)]
        df = spark.createDataFrame(rows, "x bigint, y bigint")
        got = df.select("x", "y", z_value(["x", "y"]).alias("z")).collect()
        for r in got:
            assert r["z"] == _py_z((r["x"], r["y"]), 16), (r["x"], r["y"])

    def test_3d_matches_python(self, spark):
        rows = [(1, 2, 3), (7, 0, 5), (255, 255, 255)]
        df = spark.createDataFrame(rows, "x bigint, y bigint, z0 bigint")
        got = df.select(
            "x", "y", "z0", z_value(["x", "y", "z0"], bits=8).alias("z")
        ).collect()
        for r in got:
            assert r["z"] == _py_z((r["x"], r["y"], r["z0"]), 8)

    def test_high_bits_truncated(self, spark):
        df = spark.createDataFrame([(1 << 20, 0)], "x bigint, y bigint")
        assert df.select(z_value(["x", "y"]).alias("z")).collect()[0]["z"] == 0

    def test_bit_budget_enforced(self, spark):
        try:
            z_value(["a", "b", "c", "d"], bits=16)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    def test_locality_beats_lexicographic(self, spark):
        # the point of z-order: sorting by z keeps BOTH dims clustered.
        # Build a 32x32 grid, split into 4 z-ranges, and check every
        # chunk's bounding box is far smaller than the full grid in
        # BOTH dims (a lexicographic sort gives full-width y ranges).
        rows = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(rows, "x bigint, y bigint")
        zs = sorted(
            (r["z"], r["x"], r["y"])
            for r in df.select("x", "y", z_value(["x", "y"], 5).alias("z")).collect()
        )
        quarter = len(zs) // 4
        for i in range(4):
            chunk = zs[i * quarter : (i + 1) * quarter]
            xs = [c[1] for c in chunk]
            ys = [c[2] for c in chunk]
            assert max(xs) - min(xs) <= 16
            assert max(ys) - min(ys) <= 16


class TestWriteZordered:
    def test_roundtrip_and_clustering(self, spark, tmp_path):
        rows = [(i, (i * 7919) % 256, (i * 104729) % 256) for i in range(2000)]
        df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
        path = os.path.join(str(tmp_path), "zordered")
        write_zordered(df, path, ["x", "y"], bits=8, n_files=8)
        back = spark.read.parquet(path)
        assert back.count() == 2000
        assert sorted(r["id"] for r in back.collect()) == list(range(2000))
        # per-file bounding boxes must be narrower than the full domain
        # in both dims for most files (that's what buys data skipping)
        tight = 0
        files = glob.glob(os.path.join(path, "part-*.parquet"))
        assert len(files) >= 4
        for f in files:
            st = (
                spark.read.parquet(f)
                .agg(
                    (F.max("x") - F.min("x")).alias("dx"),
                    (F.max("y") - F.min("y")).alias("dy"),
                )
                .collect()[0]
            )
            if st["dx"] <= 160 and st["dy"] <= 160:
                tight += 1
        assert tight >= len(files) // 2


class TestCompactFiles:
    def test_compacts_and_preserves_rows(self, spark, tmp_path):
        from stepist_spark.operators.layout import compact_files

        path = str(tmp_path / "many")
        df = spark.range(10_000).selectExpr("id", "id % 7 AS g")
        df.repartition(40).write.parquet(path)
        exp = sorted(map(tuple, spark.read.parquet(path).collect()))
        n_before, n_after = compact_files(spark, path, target_mb=128)
        assert n_before == 40
        assert n_after == 1  # 10k bigint rows << 128 MB
        got = sorted(map(tuple, spark.read.parquet(path).collect()))
        assert got == exp

    def test_target_splits_into_multiple_files(self, spark, tmp_path):
        from stepist_spark.operators.layout import compact_files

        path = str(tmp_path / "big")
        # incompressible pad (hex of per-row md5) so the on-disk size
        # actually reflects the row count
        spark.range(200_000).selectExpr(
            "id", "md5(CAST(id AS STRING)) || md5(CAST(id + 7 AS STRING)) AS pad"
        ).repartition(50).write.parquet(path)
        # ~a few MB of data with a 1 MB target -> several output files
        n_before, n_after = compact_files(spark, path, target_mb=1)
        assert n_before == 50
        assert 1 < n_after < 50
        assert spark.read.parquet(path).count() == 200_000
