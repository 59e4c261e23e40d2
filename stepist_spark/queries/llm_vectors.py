"""Similarity-search queries over the ``embeddings`` table
(``embedding: array<float>``, 64-dim).

Brute-force cosine top-k is the exact baseline (broadcast queries ×
streamed corpus); sign-LSH bucketing is the sub-linear scale path. The
driver corpus is near-orthogonal random vectors, so the near-dup query
plants perturbed copies (v * 1.001 element-wise) identically on both
engines to guarantee discriminating output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stepist_spark.functions import vectors as V
from stepist_spark.operators import similarity
from stepist_spark.queries import QuerySpec
from stepist_spark.session import load_table

K = 5
N_QUERY = 8


# v01 — brute-force exact cosine top-k for the first N_QUERY vectors,
# tag-unioned (round 3) with the banded-LSH approximate top-k (former
# v04) — same output shape, exact vs sub-linear scale path in one gate.
# Round 5 adds the 'hardneg' part: hard-negative mining (top-k nearest
# DIFFERENT-label corpus vectors per anchor — similarity.hard_negatives);
# the extra xk column carries the neighbor label the oracle recomputes.
def v01_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    no_xk = F.lit(None).cast("bigint").alias("xk")
    exact = _v01_exact(spark, sf).withColumn("part", F.lit("exact"))
    lsh = v04_lsh_topk(spark, sf).withColumn("part", F.lit("lsh"))
    emb = load_table(spark, sf, "embeddings")
    anchors = emb.filter(F.col("vec_id") < N_QUERY)
    hn = similarity.hard_negatives(
        emb, anchors, "vec_id", "embedding", "label", k=K
    ).select(
        F.lit("hardneg").alias("part"),
        "query_id",
        "neighbor_id",
        "cos_sim",
        F.col("neighbor_label").cast("bigint").alias("xk"),
    )
    # Matryoshka truncated-dim retrieval: exact top-k over the FIRST
    # 16 coordinates — the cheap coarse pass of a two-stage funnel
    mrl = similarity.truncated_topk(
        emb, anchors, "vec_id", "embedding", k=K, dims=16
    ).withColumn("part", F.lit("mrl"))
    # Johnson-Lindenstrauss signed projection 64→16: the data-
    # INDEPENDENT coarse pass (works on any embedding, unlike MRL's
    # trained ordering) — exact integer dot products in projected
    # space, dot packed into xk, no float discipline needed
    from stepist_spark.session import spread

    emb_wide = spread(emb)  # see v03: one-partition scans serialize
    # ONE projection pass serves both JL parts: the top-K list is the
    # first K rows of the top-4K candidate list by construction
    cand = similarity.jl_topk(
        emb_wide, anchors, "vec_id", "embedding", k=4 * K, out_dims=16, in_dims=64
    ).localCheckpoint(eager=False)
    jl_raw = cand.filter(F.col("rank") <= K)
    jl = jl_raw.select(
        F.lit("jl").alias("part"),
        "query_id",
        "neighbor_id",
        F.lit(None).cast("double").alias("cos_sim"),
        F.col("dot_scaled").alias("xk"),
    )
    # two-stage funnel certified END-TO-END (round 6): JL coarse
    # candidates (top-4K in projected space) reranked by exact cosine
    # over the broadcast candidate list — one corpus scan, no shuffle
    funnel = similarity.rerank_exact(
        emb_wide, anchors, cand, "vec_id", "embedding", k=K
    ).withColumn("part", F.lit("funnel"))
    return (
        exact.select("part", "query_id", "neighbor_id", "cos_sim", no_xk)
        .unionByName(lsh.select("part", "query_id", "neighbor_id", "cos_sim", no_xk))
        .unionByName(hn)
        .unionByName(mrl.select("part", "query_id", "neighbor_id", "cos_sim", no_xk))
        .unionByName(jl)
        .unionByName(
            funnel.select("part", "query_id", "neighbor_id", "cos_sim", no_xk)
        )
    )


def _v01_exact(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY)
    return similarity.brute_force_topk(emb, queries, "vec_id", "embedding", k=K)


_COS = V.cosine_sql("q.v", "c.v")
V01X_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {N_QUERY}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round({_COS}, 6) AS cos_sim
    FROM q, e c WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
) WHERE rn <= {K}
"""


def _bands_sql(src: str, n_bands: int, planes_per_band: int) -> str:
    """Banded-signature CTE body: one SELECT per band over ``src``
    (columns ``vec_id, v``), mirroring operators.similarity.
    lsh_band_signatures exactly — the integer-exact signature decision
    (fixed-point quantization × integer planes, functions.vectors.
    band_sig_int_sql), which is summation-order independent and so
    bit-identical to the Spark side's vectorized numpy matmul."""
    return " UNION ALL ".join(
        f"SELECT vec_id AS _bid, {b} AS band, "
        f"{V.band_sig_int_sql('v', b, planes_per_band)} AS sig "
        f"FROM {src}"
        for b in range(n_bands)
    )


# v03 — embedding near-duplicate pairs via banded-LSH self-join
# (4 bands × 16 planes — OR-of-ANDs; see operators.similarity.
# embedding_near_dups for the bucket-population math). The former v02
# bucket-assignment gate is subsumed: this oracle recomputes every
# band signature, so one differing signature changes the candidate set.
def v03_embedding_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    plants = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    corpus = emb.unionByName(plants)
    near_raw = similarity.embedding_near_dups(
        corpus, "vec_id", "embedding", threshold=0.95
    ).localCheckpoint(eager=False)
    near = near_raw.select(
        F.lit("near").alias("part"),
        "id_a",
        "id_b",
        "cos_sim",
        F.lit(None).cast("bigint").alias("margin_scaled"),
    )
    # ensemble-dedup agreement (round 6): the LEXICAL duplicate signal
    # (canonical-hash pairs over documents, re-encoded text plants at
    # %20) vs the SEMANTIC one (the embedding near-dups above, vector
    # plants at %25) over ALIGNED ids (doc_id ↔ vec_id, both plant
    # conventions use +1M) — the two signals agree exactly on %100
    # ids, so both flag packings (1=vec only, 2=text only, 3=both)
    # appear and a wrong membership on either side cannot hash-match
    from stepist_spark.operators import dedup as dedup_ops

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    tplants = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit(" "), F.upper(F.col("text"))).alias("text"),
    )
    tpairs = dedup_ops.canonical_dup_pairs(
        docs.unionByName(tplants), "doc_id", "text"
    )
    agree = dedup_ops.pair_agreement(
        tpairs, near_raw.select("id_a", "id_b")
    ).select(
        F.lit("agree").alias("part"),
        "id_a",
        "id_b",
        F.lit(None).cast("double").alias("cos_sim"),
        (
            F.lit(2) * F.col("in_a").cast("int") + F.col("in_b").cast("int")
        ).cast("bigint").alias("margin_scaled"),
    )
    # mutual-NN + ratio-margin mining rides along (round 6): the
    # bitext/parallel-pair primitive — stage 1 is the brute-force
    # top-5 over a subset, stage 2 is |ids|·k relational work only
    from stepist_spark.session import spread

    # spread(): the embeddings table scans as ONE partition at toy
    # scale, which would serialize the |sub|x|sub| cosine pass on one
    # core; at real scale the scan is already wide and this no-ops
    sub = spread(emb.filter(F.col("vec_id") % 10 == 0))
    topk = similarity.brute_force_topk(sub, sub, "vec_id", "embedding", k=5)
    mutual = similarity.mutual_margin_pairs(topk).select(
        F.lit("mutual").alias("part"),
        "id_a",
        "id_b",
        (F.col("c6").cast("double") / F.lit(1e6)).alias("cos_sim"),
        "margin_scaled",
    )
    return near.unionByName(mutual).unionByName(agree)


_PCOS = V.cosine_sql("va.v", "vb.v")

from stepist_spark.functions.text import canonical_text_sql as _ctsql

_CANON_SQL = _ctsql("text")
V03_SQL = f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
corpus AS (
    SELECT vec_id, v FROM base
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 1.001) AS v
    FROM base WHERE vec_id % 25 = 0
),
bands AS ({_bands_sql('corpus', 4, 16)}),
cands AS (
    SELECT DISTINCT a._bid AS id_a, b._bid AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a._bid < b._bid
),
vnear AS (
    SELECT id_a, id_b, round({_PCOS}, 6) AS cos_sim
    FROM cands
    JOIN corpus va ON va.vec_id = id_a
    JOIN corpus vb ON vb.vec_id = id_b
    WHERE round({_PCOS}, 6) >= 0.95
),
tcorpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, ' ' || upper(text) AS text
    FROM documents WHERE doc_id % 20 = 0
),
thash AS (
    SELECT doc_id, md5({_CANON_SQL}) AS h FROM tcorpus
),
tpairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM thash a JOIN thash b ON a.h = b.h AND a.doc_id < b.doc_id
)
SELECT 'near' AS part, id_a, id_b, cos_sim,
       CAST(NULL AS BIGINT) AS margin_scaled
FROM vnear
UNION ALL
SELECT 'agree', COALESCE(t.id_a, v.id_a), COALESCE(t.id_b, v.id_b),
       CAST(NULL AS DOUBLE),
       CAST(2 * (CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN v.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM tpairs t
FULL JOIN (SELECT DISTINCT id_a, id_b FROM vnear) v
ON t.id_a = v.id_a AND t.id_b = v.id_b
UNION ALL
SELECT 'mutual', id_a, id_b, CAST(c6 AS DOUBLE) / 1e6, margin_scaled
FROM ({similarity.mutual_margin_pairs_sql(f'''
WITH _se AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
             WHERE vec_id % 10 = 0),
_ss AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round({V.cosine_sql("q.v", "c.v")}, 6) AS cos_sim
    FROM _se q, _se c WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM _ss
) WHERE rn <= 5
''')})
"""


# v04 — banded-LSH approximate top-k (4 bands × 8 planes: wider
# candidate recall for search than v03's near-dup setting; approximate
# by design, but deterministic: same band signatures, same candidates
# on both engines)
def v04_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY)
    return similarity.lsh_bucketed_topk(emb, queries, "vec_id", "embedding", k=K)


V04_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {N_QUERY}),
cb AS ({_bands_sql('e', 4, 8)}),
qb AS ({_bands_sql('q', 4, 8)}),
cands AS (
    SELECT DISTINCT qb._bid AS query_id, cb._bid AS neighbor_id
    FROM cb JOIN qb ON cb.band = qb.band AND cb.sig = qb.sig
    WHERE qb._bid <> cb._bid
),
scored AS (
    SELECT c.query_id, c.neighbor_id, round({V.cosine_sql("q.v", "e2.v")}, 6) AS cos_sim
    FROM cands c JOIN q ON q.vec_id = c.query_id JOIN e e2 ON e2.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
) WHERE rn <= {K}
"""


V01HN_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, label, v FROM e WHERE vec_id < {N_QUERY}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           c.label AS neighbor_label, round({_COS}, 6) AS cos_sim
    FROM q, e c WHERE q.label <> c.label
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(neighbor_label AS BIGINT) AS xk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
) WHERE rn <= {K}
"""

V01MRL_SQL = f"""
WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {N_QUERY}),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round({_COS}, 6) AS cos_sim
    FROM q, e c WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
) WHERE rn <= {K}
"""

V01_SQL = f"""
SELECT 'exact' AS part, query_id, neighbor_id, cos_sim,
       CAST(NULL AS BIGINT) AS xk
FROM ({V01X_SQL})
UNION ALL
SELECT 'lsh', query_id, neighbor_id, cos_sim, CAST(NULL AS BIGINT)
FROM ({V04_SQL})
UNION ALL
SELECT 'hardneg', query_id, neighbor_id, cos_sim, xk FROM ({V01HN_SQL})
UNION ALL
SELECT 'mrl', query_id, neighbor_id, cos_sim, CAST(NULL AS BIGINT)
FROM ({V01MRL_SQL})
UNION ALL
SELECT 'jl', query_id, neighbor_id, CAST(NULL AS DOUBLE), dot_scaled
FROM ({similarity.jl_topk_sql(query_pred=f"vec_id < {N_QUERY}", k=K)})
UNION ALL
SELECT 'funnel', query_id, neighbor_id, cos_sim, CAST(NULL AS BIGINT)
FROM (
    WITH _fc AS ({similarity.jl_topk_sql(query_pred=f"vec_id < {N_QUERY}", k=4 * K)}),
    _fe AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    _fs AS (
        SELECT _fc.query_id, _fc.neighbor_id,
               round({V.cosine_sql("q.v", "c.v")}, 6) AS cos_sim
        FROM _fc
        JOIN _fe q ON q.vec_id = _fc.query_id
        JOIN _fe c ON c.vec_id = _fc.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM _fs
    ) WHERE rn <= {K}
)
"""


# v05 — IVF approximate top-k: deterministic seeded centroids, probe the
# n_probe nearest clusters per query. The oracle mirrors the exact same
# index build (min-id per residue class), assignment argmin (squared-L2,
# cid tiebreak) and probe ranking, so the approximate result is
# bit-reproducible across engines.
N_CENTROIDS = 16
N_PROBE = 4


def v05_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY)
    seeded = similarity.ivf_topk(
        emb, queries, "vec_id", "embedding", k=K, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    ).withColumn("part", F.lit("seeded"))
    # one portable Lloyd iteration (fixed-point means — bit-identical
    # across engines, see ivf_refine) then the same probe/top-k
    cent0 = similarity.ivf_centroids(emb, "vec_id", "embedding", N_CENTROIDS)
    cent1 = similarity.ivf_refine(
        emb, cent0, "vec_id", "embedding", iters=1, portable=True
    )
    # lazy localCheckpoint (round 11): the refined top-k list feeds
    # BOTH the 'refined' part and the recall join below — the whole
    # assign+probe+window pipeline ran twice for a |queries|×K frame
    refined = (
        similarity.ivf_topk(
            emb,
            queries,
            "vec_id",
            "embedding",
            k=K,
            n_probe=N_PROBE,
            centroids=cent1,
        )
        .withColumn("part", F.lit("refined"))
        .localCheckpoint(eager=False)
    )
    # 'recall' — the ANN acceptance metric: refined-IVF recall@K per
    # query against the exact brute-force top-K (operators/
    # similarity.recall_at_k) — n_hits packed into neighbor_id,
    # recall into cos_sim
    exact = similarity.brute_force_topk(emb, queries, "vec_id", "embedding", k=K)
    rec = similarity.recall_at_k(refined, exact, K).select(
        F.lit("recall").alias("part"),
        "query_id",
        F.col("n_hits").alias("neighbor_id"),
        F.col("recall").alias("cos_sim"),
    )
    return (
        seeded.unionByName(refined)
        .select("part", "query_id", "neighbor_id", "cos_sim")
        .unionByName(rec)
    )


_L2_EC = V.l2sq_sql("e.v", "c.cvec")
_IVF_LEVEL_SQL = f"""
SELECT query_id, neighbor_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM (
        SELECT p.query_id, a.neighbor_id,
               round({V.cosine_sql("p.qv", "a.v")}, 6) AS cos_sim
        FROM (
            SELECT query_id, qv, cid FROM (
                SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY {_L2_EC}, c.cid) AS rn
                FROM e CROSS JOIN {{cent}} c WHERE e.vec_id < {N_QUERY}) WHERE rn <= {N_PROBE}
        ) p JOIN (
            SELECT vec_id AS neighbor_id, v, cid FROM (
                SELECT e.vec_id, e.v, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY {_L2_EC}, c.cid) AS rn
                FROM e CROSS JOIN {{cent}} c) WHERE rn = 1
        ) a ON p.cid = a.cid AND p.query_id <> a.neighbor_id
    )
) WHERE rn <= {K}
"""

V05_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (
    SELECT cid, v AS cvec FROM (
        SELECT vec_id % {N_CENTROIDS} AS cid, v,
               row_number() OVER (PARTITION BY vec_id % {N_CENTROIDS} ORDER BY vec_id) AS rn
        FROM e) WHERE rn = 1
),
assigned0 AS (
    SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {_L2_EC}, c.cid) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1
),
-- one portable Lloyd iteration: fixed-point component sums (exact
-- bigints) so the refined centroids match Spark's bit-for-bit
cent_r AS (
    SELECT cid, list(m ORDER BY dim) AS cvec FROM (
        SELECT cid, dim,
               CAST(sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / (count(*) * 1000000) AS m
        FROM (
            SELECT cid, i - 1 AS dim, list_extract(v, i) AS x
            FROM (SELECT cid, v, unnest(range(1, len(v) + 1)) AS i FROM assigned0)
        ) GROUP BY cid, dim
    ) GROUP BY cid
)
SELECT 'seeded' AS part, query_id, neighbor_id, cos_sim FROM (
    {_IVF_LEVEL_SQL.format(cent="cent")}
)
UNION ALL
SELECT 'refined', query_id, neighbor_id, cos_sim FROM (
    {_IVF_LEVEL_SQL.format(cent="cent_r")}
)
UNION ALL
SELECT 'recall', a.query_id, CAST(count(x.neighbor_id) AS BIGINT),
       round(CAST(count(x.neighbor_id) AS DOUBLE) / {float(K)}, 6)
FROM ({_IVF_LEVEL_SQL.format(cent="cent_r")}) a
LEFT JOIN ({V01X_SQL}) x
  ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
GROUP BY a.query_id
"""


# v06 — vector summarization family, two tag-union parts:
#   'centroid' — per-label centroid vectors (class prototypes):
#                fixed-point component sums so the unordered
#                aggregation is exact cross-engine.
#   'quant'    — symmetric int8 quantization
#                (similarity.quantize_int8) of a deterministic vector
#                sample, exploded per dimension: every q value and the
#                per-vector max_abs are hash-matched (the half-up
#                round is floor(x+0.5) in BOTH engines, so no
#                rounding-mode divergence).
def v06_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    cen = similarity.label_centroids(emb, "embedding", "label").select(
        F.lit("centroid").alias("part"),
        F.col("label").cast("string").alias("key"),
        F.col("dim").cast("bigint").alias("dim"),
        F.col("sum_scaled").cast("bigint").alias("n1"),
        F.col("n_vecs").cast("bigint").alias("n2"),
        F.col("centroid").alias("d1"),
    )
    qz = similarity.quantize_int8(
        emb.filter(F.col("vec_id") % 40 == 0), "vec_id", "embedding"
    )
    quant = qz.select(
        "vec_id", "max_abs", F.posexplode("qvec").alias("dim", "q")
    ).select(
        F.lit("quant").alias("part"),
        F.col("vec_id").cast("string").alias("key"),
        F.col("dim").cast("bigint").alias("dim"),
        F.col("q").cast("bigint").alias("n1"),
        F.lit(None).cast("bigint").alias("n2"),
        F.col("max_abs").alias("d1"),
    )
    # 'norm' — embedding-space QA (operators/similarity.py): exact
    # per-label fixed-point L2-norm sums + mean norm (collapse/drift
    # health check); norm_sum_scaled -> n1, n_vecs -> n2
    ns = similarity.embedding_norm_stats(emb, "embedding", "label").select(
        F.lit("norm").alias("part"),
        F.col("label").cast("string").alias("key"),
        F.lit(None).cast("bigint").alias("dim"),
        F.col("norm_sum_scaled").alias("n1"),
        F.col("n_vecs").alias("n2"),
        F.col("mean_norm").alias("d1"),
    )
    return cen.unionByName(quant).unionByName(ns)



def _v06_norm_sql() -> str:
    from stepist_spark.operators.similarity import embedding_norm_stats_sql

    return embedding_norm_stats_sql(
        "SELECT label, embedding FROM embeddings", "embedding", "label"
    )


_V06_NORM_SQL = _v06_norm_sql()

V06_SQL = f"""
WITH ex AS (
    SELECT label, i - 1 AS dim,
           CAST(floor(list_extract(v, i) * 1000000 + 0.5) AS BIGINT) AS s
    FROM (
        SELECT label, embedding::DOUBLE[] AS v,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    )
),
qx AS (
    SELECT vec_id, v, i, m
    FROM (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS m,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings WHERE vec_id % 40 = 0
    )
)
SELECT 'centroid' AS part, label AS key, dim,
       CAST(sum(s) AS BIGINT) AS n1, count(*) AS n2,
       CAST(sum(s) AS DOUBLE) / (count(*) * 1000000) AS d1
FROM ex GROUP BY label, dim
UNION ALL
SELECT 'quant', CAST(vec_id AS VARCHAR), i - 1,
       CASE WHEN m = 0 THEN 0
            ELSE greatest(-127, least(127,
                 CAST(floor(list_extract(v, i) * 127.0 / m + 0.5) AS BIGINT)))
       END,
       CAST(NULL AS BIGINT), m
FROM qx
UNION ALL
SELECT 'norm', CAST(label AS VARCHAR), CAST(NULL AS BIGINT),
       norm_sum_scaled, n_vecs, mean_norm
FROM ({_V06_NORM_SQL})
"""


# v07 — product-quantization ADC top-k, both index shapes in one
# tag-union gate: flat PQ (codes-only scan of the whole corpus) and
# IVF-PQ (probe-pruned). The oracle recomputes the deterministic
# codebook seeding, the per-subspace encode argmin, the query ADC
# lookup tables, and the probe ranking — one differing code anywhere
# changes the candidate scores.
N_SUBSPACES = 4
N_CODES = 16


def v07_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY)
    book = similarity.pq_codebook(emb, "vec_id", "embedding", N_SUBSPACES, N_CODES)
    enc = similarity.pq_encode(emb, book, "vec_id", "embedding", N_SUBSPACES)
    pq = similarity.pq_topk(
        enc, book, queries, "vec_id", "embedding", k=K, n_subspaces=N_SUBSPACES
    ).withColumn("part", F.lit("pq"))
    ivf = similarity.ivf_pq_topk(
        emb,
        queries,
        "vec_id",
        "embedding",
        k=K,
        n_centroids=N_CENTROIDS,
        n_probe=N_PROBE,
        n_subspaces=N_SUBSPACES,
        n_codes=N_CODES,
    ).withColumn("part", F.lit("ivfpq"))
    return pq.unionByName(ivf).select("part", "query_id", "neighbor_id", "adc_dot")


def _v07_sql() -> str:
    # 64-dim embeddings / 4 subspaces => 16-dim slices, mirroring
    # pq_codebook/pq_encode's (subspace*d+1, d) slicing exactly
    d = 16
    l2 = V.l2sq_sql("s.sv", "b.subvec")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERY}),
cent AS (
    SELECT cid, v AS cvec FROM (
        SELECT vec_id % {N_CODES} AS cid, v,
               row_number() OVER (PARTITION BY vec_id % {N_CODES} ORDER BY vec_id) AS rn
        FROM e) WHERE rn = 1
),
subspaces AS (SELECT unnest(range(0, {N_SUBSPACES})) AS subspace),
book AS (
    SELECT subspace, cid AS code,
           list_slice(cvec, subspace * {d} + 1, subspace * {d} + {d}) AS subvec
    FROM cent CROSS JOIN subspaces
),
sliced AS (
    SELECT vec_id, subspace,
           list_slice(v, subspace * {d} + 1, subspace * {d} + {d}) AS sv
    FROM e CROSS JOIN subspaces
),
enc AS (
    SELECT vec_id, subspace, code FROM (
        SELECT s.vec_id, s.subspace, b.code,
               row_number() OVER (
                   PARTITION BY s.vec_id, s.subspace ORDER BY {l2}, b.code
               ) AS rn
        FROM sliced s JOIN book b ON s.subspace = b.subspace
    ) WHERE rn = 1
),
qtable AS (
    SELECT q.query_id, b.subspace, b.code,
           CAST(round(({V.dot_sql(f"list_slice(q.qv, b.subspace * {d} + 1, b.subspace * {d} + {d})", "b.subvec")}) * 1000000.0) AS BIGINT) AS partial
    FROM q CROSS JOIN book b
),
pq_scored AS (
    SELECT t.query_id, enc.vec_id AS neighbor_id, round(sum(t.partial) / 1000000.0, 6) AS adc_dot
    FROM enc JOIN qtable t ON t.subspace = enc.subspace AND t.code = enc.code
    WHERE t.query_id <> enc.vec_id
    GROUP BY t.query_id, enc.vec_id
),
assigned AS (
    SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY {V.l2sq_sql("e.v", "c.cvec")}, c.cid
               ) AS rn
        FROM e CROSS JOIN cent c
    ) WHERE rn = 1
),
probe AS (
    SELECT query_id, cid FROM (
        SELECT q.query_id, c.cid,
               row_number() OVER (
                   PARTITION BY q.query_id ORDER BY {V.l2sq_sql("q.qv", "c.cvec")}, c.cid
               ) AS rn
        FROM q CROSS JOIN cent c
    ) WHERE rn <= {N_PROBE}
),
ivf_scored AS (
    SELECT t.query_id, enc.vec_id AS neighbor_id, round(sum(t.partial) / 1000000.0, 6) AS adc_dot
    FROM enc
    JOIN assigned a ON a.vec_id = enc.vec_id
    JOIN probe p ON p.cid = a.cid
    JOIN qtable t ON t.query_id = p.query_id
         AND t.subspace = enc.subspace AND t.code = enc.code
    WHERE t.query_id <> enc.vec_id
    GROUP BY t.query_id, enc.vec_id
)
SELECT 'pq' AS part, query_id, neighbor_id, adc_dot FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id
    ) AS rn FROM pq_scored
) WHERE rn <= {K}
UNION ALL
SELECT 'ivfpq', query_id, neighbor_id, adc_dot FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id
    ) AS rn FROM ivf_scored
) WHERE rn <= {K}
"""


V07_SQL = _v07_sql()


# v08 — SemDeDup semantic deduplication: cluster-bounded cosine test
# against lower-id members, min-id greedy keep. Plants perturbed
# near-copies (v * 1.001, cosine 1.0) like v03 so the dup set is
# nonempty and deterministic on both engines.
def v08_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    plants = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    corpus = emb.unionByName(plants)
    return similarity.semantic_dedup(
        corpus, "vec_id", "embedding", threshold=0.95, n_centroids=N_CENTROIDS
    )


_SD_NORM = V.norm_sql("v")
V08_SQL = f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
corpus AS (
    SELECT vec_id, v FROM base
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 1.001) AS v
    FROM base WHERE vec_id % 25 = 0
),
cent AS (
    SELECT cid, v AS cvec FROM (
        SELECT vec_id % {N_CENTROIDS} AS cid, v,
               row_number() OVER (PARTITION BY vec_id % {N_CENTROIDS} ORDER BY vec_id) AS rn
        FROM corpus) WHERE rn = 1
),
assigned AS (
    SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (
                   PARTITION BY e.vec_id ORDER BY {V.l2sq_sql("e.v", "c.cvec")}, c.cid
               ) AS rn
        FROM corpus e CROSS JOIN cent c
    ) WHERE rn = 1
),
normed AS (
    SELECT vec_id, cid,
           CASE WHEN {_SD_NORM} > 0
                THEN list_transform(v, x -> x / {_SD_NORM}) ELSE v END AS nv
    FROM assigned
),
dups AS (
    SELECT DISTINCT b.vec_id
    FROM normed b JOIN normed a ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE round({V.dot_sql("a.nv", "b.nv")}, 6) >= 0.95
)
SELECT s.vec_id, s.cid, d.vec_id IS NULL AS keep
FROM assigned s LEFT JOIN dups d ON d.vec_id = s.vec_id
"""


# Registry discipline (round-2, see queries/relational.py): the former
# v02 bucket-assignment entry is subsumed by v03/v04, whose oracles
# recompute every band signature.
QUERIES = [
    QuerySpec("v01_cosine_topk", v01_cosine_topk, V01_SQL, "brute-force exact + banded-LSH + hard-negatives + MRL + JL-projected cosine/dot top-k, tag-unioned"),
    QuerySpec("v03_embedding_near_dups", v03_embedding_near_dups, V03_SQL, "banded-LSH embedding near-dups + mutual-NN margins + lexical-vs-semantic agreement"),
    QuerySpec("v05_ivf_topk", v05_ivf_topk, V05_SQL, "IVF-partitioned approximate top-k (seeded centroids)"),
    QuerySpec("v06_label_centroids", v06_label_centroids, V06_SQL, "per-label centroid vectors (fixed-point exact)"),
    QuerySpec("v07_pq_topk", v07_pq_topk, V07_SQL, "product-quantization ADC top-k, flat + IVF-PQ"),
    QuerySpec("v08_semantic_dedup", v08_semantic_dedup, V08_SQL, "SemDeDup cluster-bounded semantic dedup"),
]
