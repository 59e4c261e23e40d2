"""BM25 retrieval: scoring correctness vs a pure-Python reference,
stop-term pruning, determinism of the fixed-point scores, and the
DuckDB-mirror parity that backs the t16 gate."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from stepist_spark.operators.ranking import SCALE, bm25_topk, bm25_topk_sql

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox"),
    (2, "lorem ipsum dolor sit amet"),
    (3, "the dog sleeps all day the dog dreams"),
    (4, "brown bears eat honey"),
    (5, "a fox and a dog can be friends"),
]
QUERIES = [(100, "quick fox"), (101, "brown dog")]


def py_bm25(docs, queries, k1=1.2, b=0.75, max_df_ratio=1.0, portable=True):
    """Row-at-a-time reference implementation."""
    toks = {d: t.lower().split() for d, t in docs}
    n_docs = float(len(toks))
    total = float(sum(len(t) for t in toks.values()))
    df = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = {}
    for qid, qtext in queries:
        for w in set(qtext.lower().split()):
            if w not in df or df[w] > max_df_ratio * n_docs:
                continue
            for d, t in toks.items():
                tf = t.count(w)
                if not tf:
                    continue
                idf = (n_docs - df[w] + 0.5) / (df[w] + 0.5)
                if not portable:
                    idf = math.log(1.0 + idf)
                norm = k1 * (1.0 - b + b * len(t) * n_docs / total)
                part = idf * (tf * (k1 + 1.0)) / (tf + norm)
                key = (qid, d)
                s, n = out.get(key, (0, 0))
                out[key] = (s + int(round(part * SCALE)), n + 1)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    qs = spark.createDataFrame(QUERIES, "query_id bigint, query_text string")
    return docs, qs


class TestBm25:
    def test_scores_match_python_reference(self, spark, frames):
        docs, qs = frames
        got = {
            (r.query_id, r.doc_id): (r.score_scaled, r.n_terms_hit)
            for r in bm25_topk(docs, qs, k=100).collect()
        }
        assert got == py_bm25(DOCS, QUERIES, max_df_ratio=0.5)

    def test_rank_is_dense_and_ordered(self, spark, frames):
        docs, qs = frames
        rows = bm25_topk(docs, qs, k=3).orderBy("query_id", "rank").collect()
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            scores = [r.score_scaled for r in rs]
            assert scores == sorted(scores, reverse=True)

    def test_stop_term_pruning(self, spark, frames):
        docs, qs = frames
        # 'the' appears in 3/6 docs (df ratio 0.5); with max_df_ratio
        # 0.4 a the-only query matches nothing
        the_q = spark.createDataFrame([(7, "the")], "query_id bigint, query_text string")
        assert bm25_topk(docs, the_q, max_df_ratio=0.4).count() == 0
        assert bm25_topk(docs, the_q, max_df_ratio=0.5).count() == 3

    def test_lucene_idf_mode(self, spark, frames):
        docs, qs = frames
        got = {
            (r.query_id, r.doc_id): (r.score_scaled, r.n_terms_hit)
            for r in bm25_topk(docs, qs, k=100, portable=False).collect()
        }
        exp = py_bm25(DOCS, QUERIES, max_df_ratio=0.5, portable=False)
        for key, (s, n) in exp.items():
            # ln is only within-1-ulp portable: compare to the scaled
            # integer within 1 (JVM vs libm rounding)
            assert abs(got[key][0] - s) <= 1 and got[key][1] == n

    def test_duckdb_mirror_parity(self, spark, frames):
        docs, qs = frames
        got = sorted(
            (r.query_id, r.doc_id, r.rank, r.score_scaled, r.n_terms_hit)
            for r in bm25_topk(docs, qs, k=4, max_df_ratio=1.0).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
        qsql = " UNION ALL ".join(
            f"SELECT {q}::BIGINT AS query_id, '{t}' AS query_text" for q, t in QUERIES
        )
        osql = bm25_topk_sql("d", qsql, k=4, max_df_ratio=1.0)
        exp = sorted(tuple(int(x) for x in row) for row in con.execute(osql).fetchall())
        assert got == exp


def test_shuffle_query_join_path(spark, frames):
    """broadcast_queries=False (batch-retrieval scale path) returns the
    broadcast path's rows exactly."""
    docs, qs = frames
    key = lambda r: (r.query_id, r.doc_id, r.rank, r.score_scaled, r.n_terms_hit)
    a = sorted(map(key, bm25_topk(docs, qs, k=10).collect()))
    b = sorted(map(key, bm25_topk(docs, qs, k=10, broadcast_queries=False).collect()))
    assert a == b and a


class TestPhraseOccurrences:
    def _run(self, spark, docs, phrases):
        from stepist_spark.operators.ranking import phrase_occurrences

        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        return {
            (r["phrase"], r["doc_id"]): (r["n_occurrences"], r["first_pos"])
            for r in phrase_occurrences(df, "doc_id", "text", phrases).collect()
        }

    def test_adjacency_required(self, spark):
        got = self._run(
            spark,
            [(1, "fast key scan now"), (2, "fast scan key now")],
            ["key scan"],
        )
        assert got == {("key scan", 1): (1, 1)}

    def test_overlapping_matches_both_count(self, spark):
        got = self._run(spark, [(1, "go go go go")], ["go go"])
        assert got[("go go", 1)] == (3, 0)

    def test_trigram_and_multiple_phrases(self, spark):
        got = self._run(
            spark,
            [(1, "the quick brown fox the quick fox")],
            ["the quick brown", "quick fox", "missing phrase"],
        )
        assert got[("the quick brown", 1)] == (1, 0)
        assert got[("quick fox", 1)] == (1, 5)
        assert ("missing phrase", 1) not in got

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.ranking import phrase_occurrences_sql

        rows = [
            (1, "key scan table table fast sort key scan"),
            (2, "sort fast table key scan table table table"),
            (3, "nothing here"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        p = str(tmp_path / "docs.parquet")
        df.write.parquet(p)
        from stepist_spark.operators.ranking import phrase_occurrences

        phrases = ["key scan", "table table", "fast sort"]
        got = sorted(
            (r["phrase"], r["doc_id"], r["n_occurrences"], r["first_pos"])
            for r in phrase_occurrences(df, "doc_id", "text", phrases).collect()
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
        want = sorted(
            tuple(r)
            for r in con.execute(
                phrase_occurrences_sql("documents", "doc_id", "text", phrases)
            ).fetchall()
        )
        assert got == want


class TestRrfFuse:
    """Reciprocal-rank fusion: hand-computed contributions, single-
    system membership, determinism, and the DuckDB mirror."""

    def _lists(self, spark):
        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id bigint, doc_id bigint, rank bigint",
        )
        b = spark.createDataFrame(
            [(1, 11, 1), (1, 13, 2), (1, 10, 3)],
            "query_id bigint, doc_id bigint, rank bigint",
        )
        return a, b

    def test_hand_computed_scores(self, spark):
        from stepist_spark.operators.ranking import RRF_SCALE, rrf_fuse

        a, b = self._lists(spark)
        got = {
            r["doc_id"]: (r["rrf_scaled"], r["n_systems"], r["fused_rank"])
            for r in rrf_fuse([a, b], c=60, k=10).collect()
        }
        s = RRF_SCALE
        # doc 10: rank 1 in a + rank 3 in b; doc 11: 2 + 1; 12: a only; 13: b only
        exp = {
            10: s // 61 + s // 63,
            11: s // 62 + s // 61,
            12: s // 63,
            13: s // 62,
        }
        assert {d: v[0] for d, v in got.items()} == exp
        assert got[10][1] == 2 and got[12][1] == 1
        # 11 beats 10 (1/62+1/61 > 1/61+1/63); 13 (rank 2) beats 12 (rank 3)
        order = sorted(got, key=lambda d: got[d][2])
        assert order == [11, 10, 13, 12]

    def test_k_cut_and_tiebreak(self, spark):
        from stepist_spark.operators.ranking import rrf_fuse

        # two docs with identical rank profiles tie on score -> doc_id asc
        a = spark.createDataFrame(
            [(1, 20, 1), (1, 21, 1)],
            "query_id bigint, doc_id bigint, rank bigint",
        )
        rows = rrf_fuse([a], c=60, k=1).collect()
        assert len(rows) == 1 and rows[0]["doc_id"] == 20

    def test_duckdb_mirror(self, spark):
        from stepist_spark.operators.ranking import rrf_fuse, rrf_fuse_sql

        a, b = self._lists(spark)
        got = sorted(
            (r["query_id"], r["doc_id"], r["fused_rank"], r["rrf_scaled"], r["n_systems"])
            for r in rrf_fuse([a, b], c=60, k=10).collect()
        )
        con = duckdb.connect()
        sql_a = "SELECT * FROM (VALUES (1, 10, 1), (1, 11, 2), (1, 12, 3)) t(query_id, doc_id, rank)"
        sql_b = "SELECT * FROM (VALUES (1, 11, 1), (1, 13, 2), (1, 10, 3)) t(query_id, doc_id, rank)"
        exp = sorted(
            tuple(r)
            for r in con.execute(rrf_fuse_sql([sql_a, sql_b], c=60, k=10)).fetchall()
        )
        assert got == exp


class TestRankingQuality:
    """nDCG@k + first-relevant-rank vs a float reference and edges."""

    def _ranked(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id bigint, doc_id bigint, rank bigint, rel bigint"
        )

    def test_matches_float_ndcg(self, spark):
        import math

        rows = [
            (1, 10, 1, 3), (1, 11, 2, 0), (1, 12, 3, 2), (1, 13, 4, 0), (1, 14, 5, 1),
            (2, 20, 1, 0), (2, 21, 2, 0), (2, 22, 3, 1),
        ]
        from stepist_spark.operators.ranking import ranking_quality

        got = {
            r.query_id: r
            for r in ranking_quality(
                self._ranked(spark, rows), rel_col="rel", k=5
            ).collect()
        }

        def float_ndcg(pairs):
            dcg = sum(rel / math.log2(r + 1) for r, rel in pairs)
            ideal = sorted((rel for _, rel in pairs), reverse=True)
            idcg = sum(rel / math.log2(i + 2) for i, rel in enumerate(ideal))
            return dcg / idcg

        for q, pairs in ((1, [(1, 3), (2, 0), (3, 2), (4, 0), (5, 1)]),
                         (2, [(1, 0), (2, 0), (3, 1)])):
            # integer-LUT nDCG agrees with float nDCG to ~1e-5 (the
            # LUT floor costs < 1e-6 per weight)
            assert abs(got[q].ndcg_scaled / 1e6 - float_ndcg(pairs)) < 1e-4, q
        assert got[1].first_rel_rank == 1 and got[2].first_rel_rank == 3

    def test_perfect_ranking_is_one(self, spark):
        from stepist_spark.operators.ranking import ranking_quality

        rows = [(1, 10, 1, 5), (1, 11, 2, 3), (1, 12, 3, 1)]
        got = ranking_quality(self._ranked(spark, rows), "rel", k=5).collect()[0]
        assert got.ndcg_scaled == 10**6
        assert got.dcg_scaled == got.idcg_scaled

    def test_all_irrelevant_is_null(self, spark):
        from stepist_spark.operators.ranking import ranking_quality

        rows = [(1, 10, 1, 0), (1, 11, 2, 0)]
        got = ranking_quality(self._ranked(spark, rows), "rel", k=5).collect()[0]
        assert got.ndcg_scaled is None and got.first_rel_rank is None

    def test_rows_past_k_ignored(self, spark):
        from stepist_spark.operators.ranking import ranking_quality

        rows = [(1, 10, 1, 1), (1, 11, 2, 1), (1, 12, 3, 9)]
        got = ranking_quality(self._ranked(spark, rows), "rel", k=2).collect()[0]
        assert got.n_scored == 2 and got.first_rel_rank == 1

    def test_duckdb_mirror(self, spark):
        import duckdb

        from stepist_spark.operators.ranking import (
            ranking_quality,
            ranking_quality_sql,
        )

        rows = [
            (1, 10, 1, 3), (1, 11, 2, 0), (1, 12, 3, 2),
            (2, 20, 1, 0), (2, 22, 2, 4),
        ]
        got = sorted(
            map(tuple, ranking_quality(self._ranked(spark, rows), "rel", k=5).collect())
        )
        vals = ", ".join(f"({q}, {d}, {r}, {rel})" for q, d, r, rel in rows)
        duck = sorted(
            tuple(r)
            for r in duckdb.sql(
                ranking_quality_sql(
                    f"SELECT * FROM (VALUES {vals}) t(query_id, doc_id, rank, n_terms_hit)",
                    rel_expr="n_terms_hit",
                    k=5,
                )
            ).fetchall()
        )
        assert got == duck
