"""ExactSubstr-style duplicate-span detection: hand-computed span
positions, within-doc repeats, merge/no-merge behavior, coverage stats."""

from __future__ import annotations

import pytest

from stepist_spark.operators.dedup import duplicate_span_stats, duplicate_spans

K = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(df, k=K).collect()
    )


class TestDuplicateSpans:
    def test_cross_doc_shared_phrase(self, spark):
        df = _docs(
            spark,
            [
                (1, "a b c d e f x y z"),
                (2, "q r a b c d e f s"),
            ],
        )
        # shared 6-token run "a b c d e f": windows at doc1 pos 1-3,
        # doc2 pos 3-5; each window covers k=4 tokens
        assert _spans(df) == [(1, 1, 6), (2, 3, 8)]

    def test_within_doc_repetition_counts(self, spark):
        df = _docs(spark, [(3, "m n o p m n o p m n o p")])
        # every window content recurs inside the doc -> full coverage
        assert _spans(df) == [(3, 1, 12)]

    def test_separate_phrases_stay_separate_spans(self, spark):
        df = _docs(
            spark,
            [
                (5, "a b c d g1 g2 g3 g4 g5 w x y z"),
                (6, "a b c d h1 h2 h3 h4 h5 w x y z"),
            ],
        )
        assert _spans(df) == [
            (5, 1, 4),
            (5, 10, 13),
            (6, 1, 4),
            (6, 10, 13),
        ]

    def test_unique_docs_produce_nothing(self, spark):
        df = _docs(spark, [(7, "u1 u2 u3 u4 u5 u6 u7 u8 u9"), (8, "short text")])
        assert _spans(df) == []

    def test_stats_cover_every_doc(self, spark):
        df = _docs(
            spark,
            [
                (1, "a b c d e f x y z"),
                (2, "q r a b c d e f s"),
                (8, "totally unique words here only once ever"),
            ],
        )
        spans = duplicate_spans(df, k=K)
        got = {
            r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_token_frac"])
            for r in duplicate_span_stats(df, spans).collect()
        }
        assert got[1] == (9, 6, pytest.approx(6 / 9))
        assert got[2] == (9, 6, pytest.approx(6 / 9))
        assert got[8] == (7, 0, 0.0)

    def test_min_count_raises_threshold(self, spark):
        df = _docs(
            spark,
            [
                (1, "a b c d e"),
                (2, "a b c d f"),
                (3, "a b c d g"),
            ],
        )
        # "a b c d" occurs 3x; "b c d e/f/g" once each
        three = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(df, k=K, min_count=3).collect()
        )
        assert three == [(1, 1, 4), (2, 1, 4), (3, 1, 4)]
        assert duplicate_spans(df, k=K, min_count=4).count() == 0


class TestCutDuplicateSpans:
    def _cut(self, spark, rows, **kw):
        from stepist_spark.operators.dedup import cut_duplicate_spans

        return {
            r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_cut"])
            for r in cut_duplicate_spans(_docs(spark, rows), k=K, **kw).collect()
        }

    def test_first_occurrence_survives_cross_doc(self, spark):
        got = self._cut(
            spark,
            [(1, "a b c d e f x y z"), (2, "q r a b c d e f s")],
        )
        # canonical occurrences live in doc 1 (min doc id) -> untouched
        assert got[1] == ("a b c d e f x y z", 9, 0)
        assert got[2] == ("q r s", 3, 6)

    def test_within_doc_first_copy_survives(self, spark):
        got = self._cut(spark, [(3, "m n o p m n o p m n o p")])
        assert got[3] == ("m n o p", 4, 8)

    def test_case_preserved_and_hash_case_insensitive(self, spark):
        got = self._cut(
            spark,
            [(4, "Hello World A B C D"), (5, "A B C D tail x y")],
        )
        assert got[4] == ("Hello World A B C D", 6, 0)
        assert got[5] == ("tail x y", 3, 4)

    def test_unique_corpus_roundtrips(self, spark):
        rows = [(7, "u1 u2  u3 u4 u5 u6"), (8, "w1 w2 w3 w4 w5")]
        got = self._cut(spark, rows)
        # whitespace-normalized but otherwise intact
        assert got[7] == ("u1 u2 u3 u4 u5 u6", 6, 0)
        assert got[8] == ("w1 w2 w3 w4 w5", 5, 0)

    def test_keep_first_flag_on_detection(self, spark):
        df = _docs(spark, [(1, "a b c d e f x y z"), (2, "q r a b c d e f s")])
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(df, k=K, keep_first=True).collect()
        )
        assert got == [(2, 3, 8)]
