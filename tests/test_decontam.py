"""operators/decontam.py — benchmark decontamination (n-gram
train/test overlap) vs hand-computed overlap and the DuckDB mirror."""

import duckdb
import pytest
from pyspark.sql import functions as F

from stepist_spark.operators.decontam import (
    decontaminate,
    ngram_contamination,
    ngram_contamination_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1 contains the benchmark question verbatim mid-document
        (1, "intro words here what is the capital of france tail words"),
        # doc 2 is clean
        (2, "a completely different document about distributed joins"),
        # doc 3 too short for any 5-gram
        (3, "tiny doc"),
        # doc 4 shares a 5-gram with eval doc 101's second half
        (4, "students must answer the following question carefully today"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def eval_set(spark):
    rows = [
        (100, "what is the capital of france"),
        (101, "please answer the following question carefully"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestNgramContamination:
    def test_flags_verbatim_overlap(self, spark, corpus, eval_set):
        got = {
            r.doc_id: r
            for r in ngram_contamination(corpus, eval_set, k=5).collect()
        }
        assert set(got) == {1, 2, 3, 4}
        assert got[1].contaminated and got[1].n_hit >= 2
        assert not got[2].contaminated and got[2].n_hit == 0
        # doc 3: no 5-gram windows at all -> clean with zero windows
        assert got[3].n_windows == 0 and not got[3].contaminated
        assert got[4].contaminated and got[4].n_hit >= 1
        # fraction is n_hit / n_windows to 6 dp
        assert got[1].hit_frac == round(got[1].n_hit / got[1].n_windows, 6)

    def test_hand_window_count(self, spark, corpus, eval_set):
        # doc 1 has 11 tokens -> 7 windows of 5; the eval question is
        # 6 tokens -> exactly 2 of those windows are verbatim hits
        got = {
            r.doc_id: r
            for r in ngram_contamination(corpus, eval_set, k=5).collect()
        }
        assert got[1].n_windows == 7 and got[1].n_hit == 2

    def test_decontaminate_drops_flagged_rows_only(self, spark, corpus, eval_set):
        clean = decontaminate(corpus, eval_set, k=5)
        assert sorted(r.doc_id for r in clean.collect()) == [2, 3]
        # original columns pass through unchanged
        assert clean.columns == corpus.columns

    def test_duckdb_mirror_matches(self, spark, corpus, eval_set):
        spark_rows = sorted(
            map(tuple, ngram_contamination(corpus, eval_set, k=5).collect())
        )
        corpus_sql = (
            "SELECT * FROM (VALUES "
            + ", ".join(
                f"({r.doc_id}, '{r.text}')" for r in corpus.collect()
            )
            + ") t(doc_id, text)"
        )
        eval_sql = (
            "SELECT * FROM (VALUES "
            + ", ".join(
                f"({r.doc_id}, '{r.text}')" for r in eval_set.collect()
            )
            + ") t(doc_id, text)"
        )
        duck_rows = sorted(
            tuple(r)
            for r in duckdb.sql(
                ngram_contamination_sql(corpus_sql, eval_sql, k=5)
            ).fetchall()
        )
        assert spark_rows == duck_rows

    def test_eval_side_broadcasts(self, spark, corpus, eval_set):
        """The benchmark hash set must reach the corpus as a broadcast
        hash join — the shape that scales to a 100 TB corpus."""
        from stepist_spark.plans import inspect as plans

        strategies = plans.join_strategies(
            ngram_contamination(corpus, eval_set, k=5)
        )
        assert "BroadcastHashJoin" in strategies
        assert "CartesianProduct" not in strategies
