"""Hashed-linear quality classifier: Rocchio training + margin scoring
(exact integer arithmetic), cross-checked against a pure-Python
re-implementation using the same portable md5 hash."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from stepist_spark.operators.classifier import (
    SCALE,
    score_documents,
    train_quality_classifier,
)

POS = [
    "the quick brown fox jumps over the lazy dog",
    "a thoughtful essay about science and careful reasoning",
    "science and reasoning with the careful fox",
]
NEG = [
    "buy buy buy cheap cheap pills pills pills",
    "click here cheap pills buy now click click",
]
DIM = 64


def _hash32(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16)


def _buckets(text: str) -> list[int]:
    return [_hash32(t) % DIM for t in text.lower().split() if t]


def _expected_weights() -> dict[int, int]:
    from collections import Counter

    cp, cn = Counter(), Counter()
    for t in POS:
        cp.update(_buckets(t))
    for t in NEG:
        cn.update(_buckets(t))
    return {
        b: (cp[b] * SCALE) // len(POS) - (cn[b] * SCALE) // len(NEG)
        for b in set(cp) | set(cn)
    }


def _expected_margin(text: str) -> int:
    w = _expected_weights()
    return sum(w.get(b, 0) for b in _buckets(text))


class TestClassifier:
    def _fixtures(self, spark):
        labeled = spark.createDataFrame(
            [(t, True) for t in POS] + [(t, False) for t in NEG],
            "text string, label boolean",
        )
        return train_quality_classifier(labeled, dim=DIM)

    def test_weights_match_python(self, spark):
        got = {r["bucket"]: r["w_scaled"] for r in self._fixtures(spark).collect()}
        assert got == _expected_weights()

    def test_margins_match_python_and_separate_classes(self, spark):
        w = self._fixtures(spark)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(POS + NEG + ["careful scientific reasoning", ""])],
            "doc_id bigint, text string",
        )
        rows = {r["doc_id"]: r for r in score_documents(docs, w, dim=DIM).collect()}
        assert len(rows) == len(POS) + len(NEG) + 2  # empty doc kept as a row
        for i, t in enumerate(POS + NEG):
            assert rows[i]["margin_scaled"] == _expected_margin(t), t
        # training docs separate: every pos margin above every neg margin
        pos_m = [rows[i]["margin_scaled"] for i in range(len(POS))]
        neg_m = [rows[len(POS) + i]["margin_scaled"] for i in range(len(NEG))]
        assert min(pos_m) > 0 > max(neg_m)
        assert all(rows[i]["keep"] for i in range(len(POS)))
        assert not any(rows[len(POS) + i]["keep"] for i in range(len(NEG)))
        # unseen-vocab doc with positive-leaning words scores >= 0 via hash hits
        empty = rows[len(POS) + len(NEG) + 1]
        assert empty["n_toks"] == 0 and empty["margin_scaled"] == 0 and empty["keep"]

    def test_scoring_plan_broadcasts_weights(self, spark):
        w = self._fixtures(spark)
        docs = spark.createDataFrame([(1, "science fox")], "doc_id bigint, text string")
        plan = (
            score_documents(docs, w, dim=DIM)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .lower()
        )
        assert "broadcasthashjoin" in plan, plan
        assert "cartesianproduct" not in plan
