"""FK integrity report + int8 quantization."""

from __future__ import annotations

from pyspark.sql import functions as F

from stepist_spark.operators.integrity import Relation, fk_orphan_rows, fk_report
from stepist_spark.operators.similarity import quantize_int8


class TestFkReport:
    def _tables(self, spark):
        child = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)], "id bigint, fk bigint"
        )
        parent = spark.createDataFrame([(10,), (20,), (30,)], "pk bigint")
        return child, parent

    def test_orphan_rows(self, spark):
        child, parent = self._tables(spark)
        rows = fk_orphan_rows(child, parent, "fk", "pk").collect()
        assert [r["id"] for r in rows] == [4]  # NULL fk is not an orphan

    def test_report_counts(self, spark):
        child, parent = self._tables(spark)
        out = fk_report(
            spark,
            [
                Relation("c->p", child, parent, "fk", "pk"),
                Relation("c->p20", child, parent.filter("pk = 20"), "fk", "pk"),
            ],
        ).collect()
        got = {r["relation"]: (r["n_child"], r["n_orphans"]) for r in out}
        assert got == {"c->p": (4, 1), "c->p20": (4, 3)}


class TestQuantizeInt8:
    def test_values_and_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id bigint, embedding array<float>",
        )
        got = {r["vec_id"]: r for r in quantize_int8(df, "vec_id", "embedding").collect()}
        assert got[1]["qvec"] == [127, -63, 32, 0]  # floor(x*127/1 + .5)
        assert abs(got[1]["max_abs"] - 1.0) < 1e-12
        assert got[2]["qvec"] == [0, 0, 0, 0] and got[2]["max_abs"] == 0.0

    def test_clamped_symmetric(self, spark):
        df = spark.createDataFrame(
            [(1, [-2.0, 2.0])], "vec_id bigint, embedding array<float>"
        )
        r = quantize_int8(df, "vec_id", "embedding").collect()[0]
        assert r["qvec"] == [-127, 127]

    def test_dequantize_error_bounded(self, spark):
        import math

        vals = [math.sin(i * 0.7) for i in range(16)]
        df = spark.createDataFrame(
            [(1, vals)], "vec_id bigint, embedding array<float>"
        )
        r = quantize_int8(df, "vec_id", "embedding").collect()[0]
        m = r["max_abs"]
        for orig, q in zip(vals, r["qvec"]):
            assert abs(orig - q * m / 127) <= m / 127 * 0.51 + 1e-6
