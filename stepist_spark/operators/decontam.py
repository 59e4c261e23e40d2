"""Benchmark decontamination: flag (and drop) training documents that
share verbatim k-token windows with an evaluation/benchmark set — the
standard train/test-overlap audit for LLM corpora (GPT-3 appendix C's
13-gram filter, Brown et al. 2020; the C4 benchmark-contamination
audit of Dodge et al. 2021; Lee et al. 2022 — all public).

The reference has no analytics surface (SURVEY.md §2.2); this is the
LLM-pipeline extension family (corpus hygiene), the eval-set twin of
the leakage-safe split: `leakage_safe_split` keeps duplicate clusters
inside ONE split, this keeps benchmark text out of ALL of them.

Spark-first shape: both sides collapse to hashed k-token windows
(`dedup.token_windows` — one tokenize+hash pass each, reusable/
persistable); the benchmark side reduces to its DISTINCT window-hash
set, which for any real benchmark (MBs) is broadcastable against a
100 TB corpus — so contamination scoring is ONE broadcast hash
left-join plus a per-document hash aggregate, no corpus shuffle. If
the eval side ever outgrew broadcast, the same equi-join runs as a
shuffled hash join unchanged.

Cross-engine exactness: window hashes are the portable 60-bit md5
(`span_hash60`), counts are bigints, and the contamination fraction
is ONE final division rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stepist_spark.operators.dedup import token_windows


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    corpus_windows: DataFrame | None = None,
    eval_windows: DataFrame | None = None,
) -> DataFrame:
    """Per-corpus-document contamination accounting against
    ``eval_set``: ``<id_col>, n_windows, n_hit, hit_frac,
    contaminated`` where ``n_hit`` counts the document's k-token
    windows whose hash also occurs anywhere in the eval set.

    Documents shorter than ``k`` tokens have no windows and emit
    ``n_windows = 0`` with ``contaminated = false`` (no verbatim
    k-gram can be shared). Pass ``corpus_windows`` / ``eval_windows``
    (the `token_windows` frame, possibly pre-persisted) to reuse an
    existing tokenize+hash pass — the t21 gate shares one window table
    across spans/stats/cutting/inflation AND this audit.
    """
    cw = (
        corpus_windows
        if corpus_windows is not None
        else token_windows(corpus, id_col, text_col, k=k)
    )
    ew = (
        eval_windows
        if eval_windows is not None
        else token_windows(eval_set, id_col, text_col, k=k)
    )
    eh = ew.select(F.col("_h").alias("_eh")).distinct()
    scored = (
        cw.join(F.broadcast(eh), cw["_h"] == F.col("_eh"), "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(F.col("_eh").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_hit"),
        )
    )
    # left join keeps every windowed doc; docs with NO windows (< k
    # tokens) re-enter via the corpus side with zero counts
    base = corpus.select(F.col(id_col)).distinct()
    out = base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_windows", F.lit(0)).cast("bigint").alias("n_windows"),
        F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
    )
    return out.select(
        id_col,
        "n_windows",
        "n_hit",
        F.when(
            F.col("n_windows") > 0,
            F.round(
                F.col("n_hit").cast("double") / F.col("n_windows").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("hit_frac"),
        (F.col("n_hit") > 0).alias("contaminated"),
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    corpus_windows: DataFrame | None = None,
    eval_windows: DataFrame | None = None,
) -> DataFrame:
    """Drop every corpus document sharing a verbatim k-token window
    with the eval set (the GPT-3 discipline: remove, don't trim —
    partial-overlap docs are suspect wholesale). Returns the clean
    corpus rows unchanged; one anti-join against the contaminated-id
    set on top of :func:`ngram_contamination`'s accounting."""
    flagged = ngram_contamination(
        corpus,
        eval_set,
        id_col,
        text_col,
        k=k,
        corpus_windows=corpus_windows,
        eval_windows=eval_windows,
    )
    bad = flagged.filter(F.col("contaminated")).select(id_col)
    return corpus.join(bad, id_col, "anti")


def ngram_contamination_sql(
    corpus_sql: str,
    eval_sql: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    k: int = 13,
) -> str:
    """DuckDB mirror of :func:`ngram_contamination` — same tokenize →
    k-shingle → span_hash60 pipeline, same distinct-eval-set left join
    and per-document exact counts."""
    from stepist_spark.functions import hashing
    from stepist_spark.functions.text import tokens_sql

    def win(src: str) -> str:
        return f"""
    SELECT {id_expr} AS doc_id,
           {hashing.span_hash60_sql('sh')} AS h
    FROM (
        SELECT {id_expr}, unnest({hashing.shingles_sql(f'{tokens_sql(text_expr)}', k)}) AS sh
        FROM ({src})
    )
"""

    return f"""
WITH dc_cw AS ({win(corpus_sql)}),
dc_eh AS (SELECT DISTINCT h FROM ({win(eval_sql)})),
dc_scored AS (
    SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
    FROM dc_cw w LEFT JOIN dc_eh e USING (h)
    GROUP BY w.doc_id
)
SELECT b.doc_id,
       coalesce(s.n_windows, 0) AS n_windows,
       coalesce(s.n_hit, 0) AS n_hit,
       CASE WHEN coalesce(s.n_windows, 0) > 0
            THEN round(CAST(s.n_hit AS DOUBLE) / CAST(s.n_windows AS DOUBLE), 6)
            ELSE 0.0 END AS hit_frac,
       coalesce(s.n_hit, 0) > 0 AS contaminated
FROM (SELECT DISTINCT {id_expr} AS doc_id FROM ({corpus_sql})) b
LEFT JOIN dc_scored s USING (doc_id)
"""
