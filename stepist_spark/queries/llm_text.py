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


# t02 — surviving rows after exact dedup (keep min doc_id per text)
def t02_dedup_exact_count(spark: SparkSession, sf: str) -> DataFrame:
    kept = dedup.dedup_exact(_docs_with_exact_dups(spark, sf), "doc_id", "text")
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("doc_id")).alias("sum_ids"),
    )


T02_SQL = f"""
WITH corpus AS ({EXACT_DUP_CORPUS_SQL}),
ranked AS (
    SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM corpus
)
SELECT count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS sum_ids FROM ranked WHERE rn = 1
"""


# t03 — per-document token statistics.
# Ratio columns are single divisions of identical integers on both
# engines — bit-identical IEEE doubles, so they ship UNROUNDED (rounding
# would reintroduce .5-boundary rounding-mode divergence).
def t03_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.session import spread

    # tokens bound once: the four stats reference the array ~9× total
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
    )


T03_SQL = f"""
SELECT doc_id,
       {TX.token_count_sql('text')} AS n_tokens,
       {TX.avg_token_len_sql('text')} AS avg_token_len,
       {TX.punct_ratio_sql('text')} AS punct_ratio,
       {TX.stopword_ratio_sql('text')} AS stopword_ratio,
       length(text) AS n_chars_computed
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


# t05 — language-ID heuristic vs the labeled lang column
def t05_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.session import spread

    # tokens bound once: lang_id references the array 2× per language
    docs = spread(load_table(spark, sf, "documents")).withColumn(
        "_tk", TX.tokens(F.col("text"))
    )
    return docs.select(
        "doc_id", "lang", TX.lang_id(F.col("text"), toks=F.col("_tk")).alias("lang_guess")
    )


T05_SQL = f"""
SELECT doc_id, lang, {TX.lang_id_sql('text')} AS lang_guess FROM documents
"""


# t06 — MinHash signatures (8 portable universal hashes over tokens)
def t06_minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = docs.select(F.col("doc_id").alias("_id"), TX.tokens(F.col("text")).alias("_toks"))
    sig = hashing.minhash_signature(toks, "_id", "_toks", n_hashes=N_HASHES)
    return sig.withColumnRenamed("_id", "doc_id")


T06_SQL = f"""
WITH {_minhash_sig_sql("SELECT doc_id, text FROM documents")}
SELECT _id AS doc_id, {", ".join(f"mh{i}" for i in range(N_HASHES))} FROM sig
"""


# t07 — MinHash-LSH near-duplicate candidate pairs (banded signature join)
def t07_lsh_candidates(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_lsh_candidates(
        _docs_with_near_dups(spark, sf), "doc_id", "text", n_hashes=N_HASHES, bands=BANDS
    )


T07_SQL = f"""
WITH {_minhash_sig_sql(NEAR_DUP_CORPUS_SQL, shingle_k=3)},
bands AS ({_bands_sql()})
SELECT DISTINCT a._id AS id_a, b._id AS id_b FROM {_CAND_JOIN_SQL}
"""


# t08 — exact Jaccard verification of the LSH candidates
def t08_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _docs_with_near_dups(spark, sf)
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text", N_HASHES, BANDS)
    return dedup.jaccard_pairs(corpus, cands, "doc_id", "text", threshold=0.5)


T08_SQL = f"""
WITH {_minhash_sig_sql(NEAR_DUP_CORPUS_SQL, shingle_k=3)},
bands AS ({_bands_sql()}),
cands AS (SELECT DISTINCT a._id AS id_a, b._id AS id_b FROM {_CAND_JOIN_SQL}),
sets AS (SELECT doc_id AS _sid, list_distinct({TX.tokens_sql('text')}) AS _set FROM corpus)
SELECT id_a, id_b,
       CASE WHEN len(list_distinct(list_concat(sa._set, sb._set))) > 0
            THEN CAST(len(list_intersect(sa._set, sb._set)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa._set, sb._set)))
            ELSE 0.0 END AS jaccard
FROM cands
JOIN sets sa ON sa._sid = id_a
JOIN sets sb ON sb._sid = id_b
WHERE CASE WHEN len(list_distinct(list_concat(sa._set, sb._set))) > 0
           THEN CAST(len(list_intersect(sa._set, sb._set)) AS DOUBLE)
                / len(list_distinct(list_concat(sa._set, sb._set)))
           ELSE 0.0 END >= 0.5
"""


# t09 — SimHash fingerprints
def t09_simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return dedup.simhash_docs(docs, "doc_id", "text")


T09_SQL = (
    "SELECT _id AS doc_id, simhash FROM ("
    + hashing.simhash_sql("documents", "doc_id", TX.tokens_sql("text"))
    + ")"
)


# t10 — shingle fingerprint (rolling-hash document signature)
def t10_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return dedup.fingerprint_docs(docs, "doc_id", "text", k=3)


_SHINGLES = hashing.shingles_sql(TX.tokens_sql("text"), 3)
T10_SQL = f"""
SELECT doc_id, md5(text) AS doc_md5,
       list_min(list_transform({_SHINGLES}, s -> {hashing.word_hash32_sql('s')})) AS min_shingle_hash,
       len({_SHINGLES}) AS n_shingles
FROM documents
"""


# t11 — BPE-ish subword pre-tokenization (the GPT-2-style splitter
# shape): per-document counts, aggregated by source
def t11_subword_tokens(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        TX.subword_token_count(F.col("text")).cast("bigint").alias("n_subtokens"),
        F.size(F.array_distinct(TX.subword_tokens(F.col("text")))).cast("bigint").alias(
            "n_distinct_subtokens"
        ),
    )


T11_SQL = f"""
SELECT doc_id,
       len({TX.subword_tokens_sql('text')}) AS n_subtokens,
       len(list_distinct({TX.subword_tokens_sql('text')})) AS n_distinct_subtokens
FROM documents
"""


# t12 — n-gram (3-shingle) Jaccard verification of the LSH candidates:
# order-sensitive set similarity on the same unit the candidates were
# hashed on (vs t08's token-set Jaccard)
def t12_shingle_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _docs_with_near_dups(spark, sf)
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text", N_HASHES, BANDS)
    return dedup.jaccard_pairs(corpus, cands, "doc_id", "text", threshold=0.5, shingle_k=3)


_SHJ = hashing.shingles_sql(TX.tokens_sql("text"), 3)
T12_SQL = f"""
WITH {_minhash_sig_sql(NEAR_DUP_CORPUS_SQL, shingle_k=3)},
bands AS ({_bands_sql()}),
cands AS (SELECT DISTINCT a._id AS id_a, b._id AS id_b FROM {_CAND_JOIN_SQL}),
sets AS (SELECT doc_id AS _sid, list_distinct({_SHJ}) AS _set FROM corpus)
SELECT id_a, id_b,
       CASE WHEN len(list_distinct(list_concat(sa._set, sb._set))) > 0
            THEN CAST(len(list_intersect(sa._set, sb._set)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa._set, sb._set)))
            ELSE 0.0 END AS jaccard
FROM cands
JOIN sets sa ON sa._sid = id_a
JOIN sets sb ON sb._sid = id_b
WHERE CASE WHEN len(list_distinct(list_concat(sa._set, sb._set))) > 0
           THEN CAST(len(list_intersect(sa._set, sb._set)) AS DOUBLE)
                / len(list_distinct(list_concat(sa._set, sb._set)))
           ELSE 0.0 END >= 0.5
"""


# t13 — deterministic hash-based train/val/test split (portable md5
# bucketing — reproducible across engines, runs, and partitionings,
# unlike rand()/randomSplit). Checked via per-split counts + id sums.
def t13_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import sampling

    docs = load_table(spark, sf, "documents")
    return sampling.hash_split(docs, "doc_id").groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_ids"),
    )


def _t13_sql() -> str:
    from stepist_spark.operators import sampling

    return f"""
SELECT {sampling.split_label_sql('doc_id')} AS split,
       count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
FROM documents GROUP BY 1
"""


T13_SQL = _t13_sql()


# t14 — deterministic stratified sample: the 5 smallest-hash docs per
# source (id tiebreak) — reproducible uniform sampling per stratum.
def t14_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import sampling

    docs = load_table(spark, sf, "documents").select("doc_id", "source", "lang")
    return sampling.stratified_sample(docs, "source", "doc_id", 5)


def _t14_sql() -> str:
    from stepist_spark.operators import sampling

    return sampling.stratified_sample_sql(
        "(SELECT doc_id, source, lang FROM documents)",
        "source",
        "doc_id",
        5,
        select_cols="doc_id, source, lang",
    )


T14_SQL = _t14_sql()


# t15 — within-document word-repetition signal (Gopher/C4-style quality
# filter): most frequent token's share of the document. Ratio is a
# single division of identical integers — bit-identical unrounded.
def t15_word_repetition(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    counts = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w_rank = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("tok").asc())
    w_doc = Window.partitionBy("doc_id")
    return (
        counts.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("n_tokens", F.sum("cnt").over(w_doc))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("tok").alias("top_token"),
            F.col("cnt").cast("bigint").alias("top_freq"),
            (F.col("cnt").cast("double") / F.col("n_tokens")).alias("top_ratio"),
        )
    )


T15_SQL = f"""
WITH counts AS (
    SELECT doc_id, _tok AS tok, count(*) AS cnt
    FROM (SELECT doc_id, unnest({TX.tokens_sql('text')}) AS _tok FROM documents)
    GROUP BY doc_id, _tok
),
ranked AS (
    SELECT doc_id, tok, cnt,
           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn,
           CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tokens
    FROM counts
)
SELECT doc_id, n_tokens, tok AS top_token, cnt AS top_freq,
       CAST(cnt AS DOUBLE) / n_tokens AS top_ratio
FROM ranked WHERE rn = 1
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


# t17 — per-document salient term, TF-IDF shaped but ranked on the
# exact integer pair (tf desc, df asc) — see operators.corpus.salient_terms
# for why the float tf·ln(N/df) is deliberately avoided cross-engine.
def t17_salient_terms(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import corpus as corpus_ops

    docs = load_table(spark, sf, "documents")
    return corpus_ops.salient_terms(docs, "doc_id", "text")


T17_SQL = f"""
WITH tf AS (
    SELECT doc_id, _tok AS tok, count(*) AS tf
    FROM (SELECT doc_id, unnest({TX.tokens_sql('text')}) AS _tok FROM documents)
    GROUP BY doc_id, _tok
),
dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
j AS (
    SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
           row_number() OVER (
               PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfreq.df, tf.tok
           ) AS rn,
           CAST(sum(tf.tf) OVER (PARTITION BY tf.doc_id) AS BIGINT) AS n_tokens
    FROM tf JOIN dfreq USING (tok)
)
SELECT doc_id, tok AS top_token, tf, df, n_tokens FROM j WHERE rn = 1
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


QUERIES = [
    QuerySpec("t01_exact_dup_groups", t01_exact_dup_groups, T01_SQL, "exact dedup: md5 hash-groupBy"),
    QuerySpec("t02_dedup_exact_count", t02_dedup_exact_count, T02_SQL, "exact dedup survivors"),
    QuerySpec("t03_token_stats", t03_token_stats, T03_SQL, "token counting + char stats"),
    QuerySpec("t04_quality_by_source", t04_quality_by_source, T04_SQL, "quality scoring"),
    QuerySpec("t05_lang_id", t05_lang_id, T05_SQL, "language-ID heuristic"),
    QuerySpec("t06_minhash_signatures", t06_minhash_signatures, T06_SQL, "MinHash signatures"),
    QuerySpec("t07_lsh_candidates", t07_lsh_candidates, T07_SQL, "MinHash-LSH banding candidates"),
    QuerySpec("t08_jaccard_pairs", t08_jaccard_pairs, T08_SQL, "Jaccard verification of candidates"),
    QuerySpec("t09_simhash", t09_simhash, T09_SQL, "SimHash fingerprints"),
    QuerySpec("t10_fingerprint", t10_fingerprint, T10_SQL, "shingle fingerprinting"),
    QuerySpec("t11_subword_tokens", t11_subword_tokens, T11_SQL, "BPE-ish subword pre-tokenization counts"),
    QuerySpec("t12_shingle_jaccard", t12_shingle_jaccard, T12_SQL, "n-gram (3-shingle) Jaccard on LSH candidates"),
    QuerySpec("t13_hash_split", t13_hash_split, T13_SQL, "deterministic hash train/val/test split"),
    QuerySpec("t14_stratified_sample", t14_stratified_sample, T14_SQL, "deterministic per-stratum sample"),
    QuerySpec("t15_word_repetition", t15_word_repetition, T15_SQL, "word-repetition quality signal"),
    QuerySpec("t16_vocabulary", t16_vocabulary, T16_SQL, "corpus vocabulary build (top-50)"),
    QuerySpec("t17_salient_terms", t17_salient_terms, T17_SQL, "per-doc salient term (TF-IDF-shaped, integer-exact)"),
    QuerySpec("t18_decontamination", t18_decontamination, T18_SQL, "benchmark n-gram decontamination"),
    QuerySpec("t19_frequent_tokens", t19_frequent_tokens, T19_SQL, "frequent-items sketch (exact regime)"),
    QuerySpec("t20_sequence_packing", t20_sequence_packing, T20_SQL, "concat-and-chunk sequence packing"),
]
