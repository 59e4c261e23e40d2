"""Declarative data-quality expectations (operators/expectations.py)."""

from __future__ import annotations

import pytest

from stepist_spark.operators.expectations import expect


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", "ok"),
            (2, -1.0, "A", "ok"),   # negative
            (3, None, "B", "bad!"),  # null value, regex miss
            (None, 5.0, "C", "ok"),  # null id, C not in set
            (3, 7.0, "A", "ok"),    # duplicate id
        ],
        "id bigint, v double, flag string, s string",
    )


class TestExpect:
    def test_report(self, spark):
        cons = [
            ("not_null", "id"),
            ("non_negative", "v"),
            ("between", "v", 0.0, 8.0),
            ("in_set", "flag", ["A", "B"]),
            ("matches", "s", "^ok$"),
            ("unique", ["id"]),
        ]
        rep = {
            (r["constraint"], r["column"]): (r["violations"], r["total"], r["passed"])
            for r in expect(_frame(spark), cons).collect()
        }
        assert rep[("not_null", "id")] == (1, 5, False)
        # NULL counts as a violation for value checks
        assert rep[("non_negative", "v")] == (2, 5, False)
        assert rep[("between", "v")] == (3, 5, False)  # -1, None, 10.0
        assert rep[("in_set", "flag")] == (1, 5, False)
        assert rep[("matches", "s")] == (1, 5, False)
        # both rows carrying the duplicated key value count
        assert rep[("unique", "id")] == (2, 5, False)

    def test_all_pass(self, spark):
        cons = [("not_null", "flag"), ("unique", ["id", "v"])]
        rows = expect(_frame(spark), cons).collect()
        assert all(r["passed"] for r in rows)
        assert all(r["violations"] == 0 for r in rows)

    def test_empty_constraints(self, spark):
        out = expect(_frame(spark), [])
        assert out.count() == 0
        assert out.columns == ["constraint", "column", "violations", "total", "passed"]

    def test_unknown_kind_raises(self, spark):
        with pytest.raises(ValueError, match="unknown constraint kind"):
            expect(_frame(spark), [("bogus", "id")]).collect()
