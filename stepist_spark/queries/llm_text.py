"""LLM-data-pipeline text operators over the ``documents`` table:
exact dedup, MinHash signatures, LSH near-dup candidates, Jaccard
verification, SimHash, fingerprinting, token statistics, quality
scoring, language ID.

The driver corpus contains no natural duplicates, so the dedup queries
plant deterministic duplicates — UNION ALL with shifted doc_ids and
(for near-dup) a suffixed copy — identically on both engines. The
operators still scan the full real corpus; the plants guarantee
nonempty, discriminating outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stepist_spark.functions import hashing
from stepist_spark.functions import text as TX
from stepist_spark.operators import dedup
from stepist_spark.queries import QuerySpec
from stepist_spark.session import load_table

N_HASHES = 8
BANDS = 4

# ---- shared corpus builders (Spark + SQL must stay in lockstep) ----------

def _docs_with_exact_dups(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    plants = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(plants)


EXACT_DUP_CORPUS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def _docs_with_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    plants = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzplantedtoken")).alias("text"),
    )
    return docs.unionByName(plants)


NEAR_DUP_CORPUS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 2000000 AS doc_id, text || ' zzplantedtoken' AS text
FROM documents WHERE doc_id % 20 = 0
"""


def _minhash_sig_sql(corpus_sql: str, shingle_k: int | None = None) -> str:
    """Signature CTE body shared by the LSH/jaccard oracles.

    ``shingle_k`` mirrors the operator's shingle-based MinHash (see
    dedup.minhash_lsh_candidates: single-token MinHash degenerates on a
    small vocabulary); None hashes raw tokens (t06's signature demo).
    """
    unit = TX.tokens_sql("text")
    if shingle_k is not None:
        unit = hashing.shingles_sql(unit, shingle_k)
    h = hashing.word_hash32_sql("_tok")
    aggs = ", ".join(
        f"min({hashing.minhash_of_hash_sql(h, i)}) AS mh{i}" for i in range(N_HASHES)
    )
    return f"""
corpus AS ({corpus_sql}),
toks AS (
    SELECT doc_id AS _id, unnest({unit}) AS _tok FROM corpus
),
sig AS (SELECT _id, {aggs} FROM toks GROUP BY _id)
"""


def _bands_sql() -> str:
    rows_per_band = N_HASHES // BANDS
    parts = []
    for b in range(BANDS):
        cols = ", ".join(
            f"mh{b * rows_per_band + r} AS h{r}" for r in range(rows_per_band)
        )
        parts.append(f"SELECT _id, {b} AS band, {cols} FROM sig")
    return " UNION ALL ".join(parts)


_CAND_JOIN_SQL = (
    "bands a JOIN bands b ON a.band = b.band AND a.h0 = b.h0 AND a.h1 = b.h1 "
    "AND a._id < b._id"
)


# --------------------------------------------------------------------------
# t01 — exact duplicate groups (hash-groupBy dedup)
def t01_exact_dup_groups(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dup_groups(_docs_with_exact_dups(spark, sf), "doc_id", "text")


T01_SQL = f"""
WITH corpus AS ({EXACT_DUP_CORPUS_SQL})
SELECT md5(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS canonical_id
FROM corpus GROUP BY md5(text) HAVING count(*) > 1
"""


# t03 — the per-document text profile in one pass (merged former t03
# token stats + t05 lang-ID + t11 subword counts — all 1-row-per-doc
# projections over the same scan, so one gate certifies the whole
# scalar text surface). Ratio columns are single divisions of identical
# integers on both engines — bit-identical IEEE doubles, so they ship
# UNROUNDED (rounding would reintroduce .5-boundary rounding-mode
# divergence). Exact-dedup survivors (former t02) are gated by c01,
# which runs dedup_exact inside its oracle-checked pipeline.
def t03_doc_profile(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.session import spread

    # tokens bound once: the stats reference the array ~11× total
    docs = spread(load_table(spark, sf, "documents")).withColumn(
        "_tk", TX.tokens(F.col("text"))
    )
    txt = F.col("text")
    tk = F.col("_tk")
    return docs.select(
        "doc_id",
        TX.token_count(txt, toks=tk).cast("bigint").alias("n_tokens"),
        TX.avg_token_len(txt, toks=tk).alias("avg_token_len"),
        TX.punct_ratio(txt).alias("punct_ratio"),
        TX.stopword_ratio(txt, toks=tk).alias("stopword_ratio"),
        F.length(txt).cast("bigint").alias("n_chars_computed"),
        "lang",
        TX.lang_id(txt, toks=tk).alias("lang_guess"),
        TX.subword_token_count(txt).cast("bigint").alias("n_subtokens"),
        F.size(F.array_distinct(TX.subword_tokens(txt))).cast("bigint").alias(
            "n_distinct_subtokens"
        ),
    )


T03_SQL = f"""
SELECT doc_id,
       {TX.token_count_sql('text')} AS n_tokens,
       {TX.avg_token_len_sql('text')} AS avg_token_len,
       {TX.punct_ratio_sql('text')} AS punct_ratio,
       {TX.stopword_ratio_sql('text')} AS stopword_ratio,
       length(text) AS n_chars_computed,
       lang,
       {TX.lang_id_sql('text')} AS lang_guess,
       len({TX.subword_tokens_sql('text')}) AS n_subtokens,
       len(list_distinct({TX.subword_tokens_sql('text')})) AS n_distinct_subtokens
FROM documents
"""


# t04 — quality scoring aggregated by source. Scores are integer-scaled
# (exact bigint arithmetic end-to-end): composite FP scores land on
# decimal .5 rounding boundaries where engines disagree by one ulp.
def t04_quality_by_source(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.session import spread

    docs = spread(load_table(spark, sf, "documents"))
    # tokens bound first — the score references the array ~8×
    toked = docs.withColumn("_tk", TX.tokens(F.col("text")))
    scored = toked.select(
        "source", TX.quality_score_scaled(F.col("text"), toks=F.col("_tk")).alias("q")
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("q").alias("sum_quality_scaled"),
        F.min("q").alias("min_quality_scaled"),
    )


T04_SQL = f"""
SELECT source, count(*) AS n_docs,
       CAST(sum({TX.quality_score_scaled_sql('text')}) AS BIGINT) AS sum_quality_scaled,
       min({TX.quality_score_scaled_sql('text')}) AS min_quality_scaled
FROM documents GROUP BY source
"""


# t08 — exact Jaccard verification of the LSH candidates, BOTH set
# units in one gate (merged former t07/t08/t12): every banded-LSH
# candidate pair ships with its token-set Jaccard AND its 3-shingle
# (n-gram, order-sensitive) Jaccard. The candidate row set IS the
# former t07 output, so the banding join is certified too; the MinHash
# signature values themselves are certified transitively — this oracle
# recomputes the full shingle→minhash→band pipeline and one differing
# signature would change the candidate set.
def t08_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _docs_with_near_dups(spark, sf)
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text", N_HASHES, BANDS)
    tok = dedup.jaccard_pairs(corpus, cands, "doc_id", "text", threshold=0.0)
    sh = dedup.jaccard_pairs(corpus, cands, "doc_id", "text", threshold=0.0, shingle_k=3)
    return tok.withColumnRenamed("jaccard", "jaccard_tok").join(
        sh.withColumnRenamed("jaccard", "jaccard_shingle"), ["id_a", "id_b"]
    )


def _jac_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN len(list_distinct(list_concat({a}, {b}))) > 0 "
        f"THEN CAST(len(list_intersect({a}, {b})) AS DOUBLE) "
        f"/ len(list_distinct(list_concat({a}, {b}))) ELSE 0.0 END"
    )


T08_SQL = f"""
WITH {_minhash_sig_sql(NEAR_DUP_CORPUS_SQL, shingle_k=3)},
bands AS ({_bands_sql()}),
cands AS (SELECT DISTINCT a._id AS id_a, b._id AS id_b FROM {_CAND_JOIN_SQL}),
sets_t AS (SELECT doc_id AS _sid, list_distinct({TX.tokens_sql('text')}) AS _set FROM corpus),
sets_s AS (SELECT doc_id AS _sid,
                  list_distinct({hashing.shingles_sql(TX.tokens_sql('text'), 3)}) AS _set
           FROM corpus)
SELECT id_a, id_b,
       {_jac_sql('ta._set', 'tb._set')} AS jaccard_tok,
       {_jac_sql('sa._set', 'sb._set')} AS jaccard_shingle
FROM cands
JOIN sets_t ta ON ta._sid = id_a
JOIN sets_t tb ON tb._sid = id_b
JOIN sets_s sa ON sa._sid = id_a
JOIN sets_s sb ON sb._sid = id_b
"""


# t09 — per-document fingerprints in one gate (merged former t09
# SimHash + t10 shingle fingerprint): both compact near-dup signatures
# joined on doc_id.
def t09_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    sh = dedup.simhash_docs(docs, "doc_id", "text")
    fp = dedup.fingerprint_docs(docs, "doc_id", "text", k=3)
    return sh.join(fp, "doc_id")


_SHINGLES = hashing.shingles_sql(TX.tokens_sql("text"), 3)
T09_SQL = f"""
SELECT a.doc_id, a.simhash, b.doc_md5, b.min_shingle_hash, b.n_shingles
FROM (SELECT _id AS doc_id, simhash FROM ({hashing.simhash_sql("documents", "doc_id", TX.tokens_sql("text"))})) a
JOIN (
    SELECT doc_id, md5(text) AS doc_md5,
           list_min(list_transform({_SHINGLES}, s -> {hashing.word_hash32_sql('s')})) AS min_shingle_hash,
           len({_SHINGLES}) AS n_shingles
    FROM documents
) b USING (doc_id)
"""


# t13 — deterministic sampling + splitting in one gate (merged former
# t13 hash split + t14 stratified sample): the 5 smallest-hash docs per
# source (id tiebreak), each carrying its deterministic train/val/test
# split label — per-row certification of both id-hash operators,
# reproducible across engines, runs, and partition layouts.
def t13_sample_split(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import sampling

    docs = load_table(spark, sf, "documents").select("doc_id", "source", "lang")
    sampled = sampling.stratified_sample(docs, "source", "doc_id", 5)
    return sampling.hash_split(sampled, "doc_id")


def _t13_sql() -> str:
    from stepist_spark.operators import sampling

    inner = sampling.stratified_sample_sql(
        "(SELECT doc_id, source, lang FROM documents)",
        "source",
        "doc_id",
        5,
        select_cols="doc_id, source, lang",
    )
    return f"""
SELECT doc_id, source, lang, {sampling.split_label_sql('doc_id')} AS split
FROM ({inner})
"""


T13_SQL = _t13_sql()


# t15 — within-document token statistics in one explode→count pass
# (merged former t15 word-repetition + t17 salient terms): the most
# frequent token (Gopher/C4-style repetition signal) alongside the
# TF-IDF-shaped salient term ranked on the exact integer pair
# (tf desc, df asc) — see operators.corpus.salient_terms for why the
# float tf·ln(N/df) is deliberately avoided cross-engine. Ratio is a
# single division of identical integers — bit-identical unrounded.
def t15_word_stats(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from stepist_spark.operators import corpus as corpus_ops

    docs = load_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    counts = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w_doc = Window.partitionBy("doc_id")
    w_rep = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("tok").asc())
    top = (
        counts.withColumn("_rn", F.row_number().over(w_rep))
        .withColumn("n_tokens", F.sum("cnt").over(w_doc).cast("bigint"))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            "n_tokens",
            F.col("tok").alias("top_token"),
            F.col("cnt").cast("bigint").alias("top_freq"),
            (F.col("cnt").cast("double") / F.col("n_tokens")).alias("top_ratio"),
        )
    )
    sal = corpus_ops.salient_terms(docs, "doc_id", "text").select(
        "doc_id",
        F.col("top_token").alias("salient_token"),
        F.col("tf").alias("salient_tf"),
        F.col("df").alias("salient_df"),
    )
    return top.join(sal, "doc_id")


T15_SQL = f"""
WITH counts AS (
    SELECT doc_id, _tok AS tok, count(*) AS cnt
    FROM (SELECT doc_id, unnest({TX.tokens_sql('text')}) AS _tok FROM documents)
    GROUP BY doc_id, _tok
),
dfreq AS (SELECT tok, count(*) AS df FROM counts GROUP BY tok),
j AS (
    SELECT c.doc_id, c.tok, c.cnt, d.df,
           row_number() OVER (PARTITION BY c.doc_id ORDER BY c.cnt DESC, c.tok) AS r1,
           row_number() OVER (PARTITION BY c.doc_id ORDER BY c.cnt DESC, d.df, c.tok) AS r2,
           CAST(sum(c.cnt) OVER (PARTITION BY c.doc_id) AS BIGINT) AS n_tokens
    FROM counts c JOIN dfreq d USING (tok)
)
SELECT t.doc_id, t.n_tokens, t.tok AS top_token, t.cnt AS top_freq,
       CAST(t.cnt AS DOUBLE) / t.n_tokens AS top_ratio,
       s.tok AS salient_token, s.cnt AS salient_tf, s.df AS salient_df
FROM (SELECT * FROM j WHERE r1 = 1) t
JOIN (SELECT * FROM j WHERE r2 = 1) s USING (doc_id)
"""


# t16 — corpus vocabulary: top-50 tokens by occurrence (doc frequency
# alongside) — the vocab-build pass of a tokenizer-training pipeline.
def t16_vocabulary(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import corpus as corpus_ops

    docs = load_table(spark, sf, "documents")
    v = corpus_ops.vocabulary(docs, "doc_id", "text", min_count=2)
    return v.orderBy(F.col("n_occurrences").desc(), F.col("tok").asc()).limit(50)


T16_SQL = f"""
SELECT _tok AS tok, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({TX.tokens_sql('text')}) AS _tok FROM documents)
GROUP BY _tok HAVING count(*) >= 2
ORDER BY n_occurrences DESC, tok LIMIT 50
"""


# t18 — benchmark decontamination: 8-gram shingle overlap between the
# training corpus and a held-out benchmark set. The corpus plants exact
# copies of benchmark docs (id+3M) — the contamination the op must
# flag; clean docs appear with ratio 0.
def _decontam_frames(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0).unionByName(
        bench.select((F.col("doc_id") + 3_000_000).alias("doc_id"), "text")
    )
    return corpus, bench


def t18_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import corpus as corpus_ops

    corpus, bench = _decontam_frames(spark, sf)
    return corpus_ops.ngram_contamination(corpus, bench, "doc_id", "text", shingle_k=8)


_SH8 = hashing.shingles_sql(TX.tokens_sql("text"), 8)
T18_SQL = f"""
WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 50 != 0
    UNION ALL
    SELECT doc_id + 3000000 AS doc_id, text FROM bench
),
bsh AS (SELECT DISTINCT unnest({_SH8}) AS sh FROM bench),
csh AS (
    SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, unnest({_SH8}) AS sh FROM corpus
    )
),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM csh GROUP BY doc_id),
hit AS (
    SELECT c.doc_id, count(*) AS n_contaminated
    FROM csh c JOIN bsh USING (sh) GROUP BY c.doc_id
)
SELECT t.doc_id, t.n_shingles,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       CAST(coalesce(h.n_contaminated, 0) AS DOUBLE) / t.n_shingles AS contamination_ratio
FROM tot t LEFT JOIN hit h USING (doc_id)
"""


# t20 — sequence packing: concatenate-and-chunk layout of the corpus
# into 512-token training sequences across 16 shards (per-shard window
# cumsum — no global ordering bottleneck).
def t20_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import packing
    from stepist_spark.session import spread

    docs = spread(load_table(spark, sf, "documents")).withColumn(
        "_tk", TX.tokens(F.col("text"))
    )
    counted = docs.select(
        "doc_id", TX.token_count(F.col("text"), toks=F.col("_tk")).alias("n_toks")
    )
    return packing.pack_sequences(counted, "doc_id", "n_toks", seq_len=512, shards=16)


T20_SQL = f"""
WITH counted AS (
    SELECT doc_id, doc_id % 16 AS shard,
           CAST({TX.token_count_sql('text')} AS BIGINT) AS n_tokens
    FROM documents
),
cum AS (
    SELECT doc_id, shard, n_tokens,
           CAST(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS _cum
    FROM counted
)
SELECT doc_id, shard, n_tokens,
       _cum - n_tokens AS start_offset, _cum AS end_offset,
       CAST(floor(CAST(_cum - n_tokens AS DOUBLE) / 512) AS BIGINT) AS first_chunk,
       CAST(floor(CAST(greatest(_cum - 1, _cum - n_tokens) AS DOUBLE) / 512) AS BIGINT) AS last_chunk
FROM cum
"""


# t19 — heavy hitters: per-partition summarize-then-merge frequent-items
# sketch over all document tokens. Capacity (128) exceeds the corpus
# vocabulary, so the sketch is EXACT here and the oracle is plain
# count-group-by — certifying the merge machinery end-to-end.
def t19_frequent_tokens(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import sketches
    from stepist_spark.session import spread

    docs = spread(load_table(spark, sf, "documents"))
    toks = docs.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
    return sketches.frequent_items(toks, "tok", capacity=128, k=20)


T19_SQL = f"""
SELECT _tok AS item, count(*) AS weight
FROM (SELECT unnest({TX.tokens_sql('text')}) AS _tok FROM documents)
GROUP BY _tok ORDER BY weight DESC, item LIMIT 20
"""


# Registry discipline (round-2, see queries/relational.py): merged to
# fit the driver's 50-entry correctness window — t02→c01 (dedup_exact
# runs inside c01's oracle-gated pipeline), t05/t11→t03, t06/t07→t08
# (the oracle recomputes the signature+banding pipeline), t10→t09,
# t14→t13, t17→t15.
QUERIES = [
    QuerySpec("t01_exact_dup_groups", t01_exact_dup_groups, T01_SQL, "exact dedup: md5 hash-groupBy"),
    QuerySpec("t03_doc_profile", t03_doc_profile, T03_SQL, "per-doc token/quality/lang-ID/subword profile"),
    QuerySpec("t04_quality_by_source", t04_quality_by_source, T04_SQL, "quality scoring"),
    QuerySpec("t08_jaccard_pairs", t08_jaccard_pairs, T08_SQL, "LSH candidates + token & 3-shingle Jaccard verification"),
    QuerySpec("t09_fingerprints", t09_fingerprints, T09_SQL, "SimHash + shingle fingerprints"),
    QuerySpec("t13_sample_split", t13_sample_split, T13_SQL, "stratified sample + hash train/val/test split"),
    QuerySpec("t15_word_stats", t15_word_stats, T15_SQL, "word repetition + salient term (integer-exact)"),
    QuerySpec("t16_vocabulary", t16_vocabulary, T16_SQL, "corpus vocabulary build (top-50)"),
    QuerySpec("t18_decontamination", t18_decontamination, T18_SQL, "benchmark n-gram decontamination"),
    QuerySpec("t19_frequent_tokens", t19_frequent_tokens, T19_SQL, "frequent-items sketch (exact regime)"),
    QuerySpec("t20_sequence_packing", t20_sequence_packing, T20_SQL, "concat-and-chunk sequence packing"),
]
