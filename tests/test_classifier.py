"""Hashed-linear quality classifier: Rocchio training + margin scoring
(exact integer arithmetic), cross-checked against a pure-Python
re-implementation using the same portable md5 hash."""

from __future__ import annotations

import hashlib

import pytest

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


class TestBigramLm:
    CORPUS = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "the cat ate the fish"),
    ]

    def _py_model(self):
        from collections import Counter

        bg, uni = Counter(), Counter()
        for _, t in self.CORPUS:
            ws = t.split()
            uni.update(ws)
            bg.update(zip(ws, ws[1:]))
        vocab = len(set(uni))
        return bg, uni, vocab

    def _py_score(self, text):
        import math

        bg, uni, v = self._py_model()
        ws = text.lower().split()
        lp = 0
        for a, b in zip(ws, ws[1:]):
            p = (bg.get((a, b), 0) + 1) / (uni.get(a, 0) + v)
            lp += math.floor(math.log(p) * 1_000_000)
        n = max(len(ws) - 1, 0)
        return n, lp, math.exp(-lp / (n * 1_000_000)) if n else None

    def test_scores_match_python(self, spark):
        from stepist_spark.operators.classifier import (
            perplexity_score,
            train_bigram_lm,
        )

        corpus = spark.createDataFrame(self.CORPUS, "doc_id bigint, text string")
        model = train_bigram_lm(corpus)
        probes = [
            (10, "the cat sat on the mat"),   # in-domain
            (11, "zx qv pl mm"),              # fully OOV
            (12, "solo"),                     # no bigrams
            (13, ""),
        ]
        docs = spark.createDataFrame(probes, "doc_id bigint, text string")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["logp_scaled"], r["ppl"])
            for r in perplexity_score(docs, model).collect()
        }
        assert set(got) == {10, 11, 12, 13}
        for i, t in probes:
            n, lp, ppl = self._py_score(t)
            assert got[i][0] == n, (i, got[i])
            assert got[i][1] == lp, (i, got[i])
            if ppl is None:
                assert got[i][2] is None
            else:
                assert got[i][2] == pytest.approx(ppl, rel=1e-9)
        # the in-domain doc must be far less perplexing than OOV noise
        assert got[10][2] < got[11][2]

    def test_layout_deterministic(self, spark):
        from stepist_spark.operators.classifier import (
            perplexity_score,
            train_bigram_lm,
        )

        corpus = spark.createDataFrame(self.CORPUS, "doc_id bigint, text string")
        docs = spark.createDataFrame(
            [(i, "the cat sat on the mat extra words " + "x " * i) for i in range(20)],
            "doc_id bigint, text string",
        )
        m1 = train_bigram_lm(corpus)
        m2 = train_bigram_lm(corpus.repartition(5))
        a = sorted((r["doc_id"], r["logp_scaled"]) for r in perplexity_score(docs, m1).collect())
        b = sorted(
            (r["doc_id"], r["logp_scaled"])
            for r in perplexity_score(docs.repartition(7), m2).collect()
        )
        assert a == b


class TestDsir:
    def test_identical_corpora_score_zero(self, spark):
        from stepist_spark.operators.classifier import dsir_log_ratios, dsir_score

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "beta beta delta")], "doc_id bigint, text string"
        )
        lr = dsir_log_ratios(docs, docs, dim=64)
        # target == raw: every bucket ratio is exactly 1 -> floor(ln 1 * 1e6) = 0
        assert lr.filter("lr_scaled != 0").count() == 0
        scored = {r["doc_id"]: r for r in dsir_score(docs, lr, dim=64).collect()}
        assert scored[1]["dsir_scaled"] == 0 and scored[1]["n_feats"] == 3
        assert scored[2]["dsir_scaled"] == 0 and scored[2]["n_feats"] == 3

    def test_matches_python_reference(self, spark):
        import hashlib
        import math

        from stepist_spark.operators.classifier import dsir_log_ratios, dsir_score

        dim = 256
        target_texts = ["spark shuffle join", "join agg shuffle", "spark spark join"]
        raw_texts = [
            (1, "spark shuffle join window"),
            (2, "python loop collect driver"),
            (3, "join join shuffle"),
        ]

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim

        def counts(texts):
            out = {}
            for t in texts:
                for tok in t.lower().split():
                    b = bucket(tok)
                    out[b] = out.get(b, 0) + 1
            return out

        tc = counts(target_texts)
        rc = counts(t for _, t in raw_texts)
        T, R = sum(tc.values()), sum(rc.values())

        def lr(b):
            return math.floor(
                math.log(
                    ((tc.get(b, 0) + 1) * (R + dim)) / ((rc.get(b, 0) + 1) * (T + dim))
                )
                * 1e6
            )

        expected = {
            i: sum(lr(bucket(tok)) for tok in t.lower().split())
            for i, t in raw_texts
        }
        target = spark.createDataFrame([(t,) for t in target_texts], "text string")
        raw = spark.createDataFrame(raw_texts, "doc_id bigint, text string")
        table = dsir_log_ratios(target, raw, dim=dim)
        got = {
            r["doc_id"]: r["dsir_scaled"]
            for r in dsir_score(raw, table, dim=dim).collect()
        }
        assert got == expected
        # target-like docs outrank off-target docs
        assert got[1] > got[2] and got[3] > got[2]

    def test_empty_doc_scores_zero(self, spark):
        from stepist_spark.operators.classifier import dsir_log_ratios, dsir_score

        target = spark.createDataFrame([("a b",)], "text string")
        raw = spark.createDataFrame(
            [(1, "a"), (2, "")], "doc_id bigint, text string"
        )
        got = {
            r["doc_id"]: (r["n_feats"], r["dsir_scaled"])
            for r in dsir_score(raw, dsir_log_ratios(target, raw, dim=32), dim=32).collect()
        }
        assert got[2] == (0, 0)
        assert got[1][0] == 1


class TestCrossValidatedMargins:
    def _docs(self, spark):
        rows = [
            (i, f"w{i % 13} w{i % 5} common tok{i % 3}", i % 2 == 0)
            for i in range(90)
        ] + [(990, "zzzuniq qqquniq xxxuniq", True)]
        return spark.createDataFrame(rows, "doc_id long, text string, label boolean")

    def test_partition_and_fold_assignment(self, spark):
        from stepist_spark.functions import hashing
        from stepist_spark.operators.classifier import cross_validated_margins
        from pyspark.sql import functions as F

        docs = self._docs(spark)
        out = cross_validated_margins(docs, k=3, dim=64)
        rows = out.collect()
        assert len(rows) == 91  # every doc exactly once
        assert len({r["doc_id"] for r in rows}) == 91
        want_fold = {
            r["doc_id"]: r["f"]
            for r in docs.select(
                "doc_id",
                (hashing.word_hash32(F.col("doc_id").cast("string")) % 3).alias("f"),
            ).collect()
        }
        assert all(r["fold"] == want_fold[r["doc_id"]] for r in rows)

    def test_no_leakage_for_unique_tokens(self, spark):
        from stepist_spark.operators.classifier import (
            cross_validated_margins,
            score_documents,
            train_quality_classifier,
        )

        docs = self._docs(spark)
        cv = {r["doc_id"]: r for r in
              cross_validated_margins(docs, k=3, dim=4096).collect()}
        # doc 990's tokens appear NOWHERE else: its fold's model never
        # saw them, so every bucket weight it touches is unseen -> 0
        assert cv[990]["margin_scaled"] == 0
        # in-sample scoring DOES leak: the same doc's margin is
        # positive because its own tokens trained positive weights
        w = train_quality_classifier(docs, dim=4096)
        ins = {r["doc_id"]: r for r in
               score_documents(docs, w, dim=4096).collect()}
        assert ins[990]["margin_scaled"] > 0

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.classifier import (
            cross_validated_margins,
            cross_validated_margins_sql,
        )

        docs = self._docs(spark)
        p = str(tmp_path / "cv.parquet")
        docs.write.parquet(p)
        got = sorted(
            (r["doc_id"], r["fold"], r["n_toks"], r["margin_scaled"], r["keep"])
            for r in cross_validated_margins(docs, k=3, dim=64).collect()
        )
        con = duckdb.connect()
        want = sorted(
            (w[0], w[1], w[2], w[3], w[4])
            for w in con.execute(
                cross_validated_margins_sql(
                    f"SELECT * FROM '{p}/*.parquet'", k=3, dim=64
                )
            ).fetchall()
        )
        assert got == want
