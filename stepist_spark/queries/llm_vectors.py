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


# v01 — brute-force exact cosine top-k for the first N_QUERY vectors
def v01_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY)
    return similarity.brute_force_topk(emb, queries, "vec_id", "embedding", k=K)


_COS = V.cosine_sql("q.v", "c.v")
V01_SQL = f"""
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
    return similarity.embedding_near_dups(corpus, "vec_id", "embedding", threshold=0.95)


_PCOS = V.cosine_sql("va.v", "vb.v")
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
)
SELECT id_a, id_b, round({_PCOS}, 6) AS cos_sim
FROM cands
JOIN corpus va ON va.vec_id = id_a
JOIN corpus vb ON vb.vec_id = id_b
WHERE round({_PCOS}, 6) >= 0.95
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
    return similarity.ivf_topk(
        emb, queries, "vec_id", "embedding", k=K, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    )


_L2_EC = V.l2sq_sql("e.v", "c.cvec")
V05_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (
    SELECT cid, v AS cvec FROM (
        SELECT vec_id % {N_CENTROIDS} AS cid, v,
               row_number() OVER (PARTITION BY vec_id % {N_CENTROIDS} ORDER BY vec_id) AS rn
        FROM e) WHERE rn = 1
),
assigned AS (
    SELECT vec_id AS neighbor_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {_L2_EC}, c.cid) AS rn
        FROM e CROSS JOIN cent c) WHERE rn = 1
),
probe AS (
    SELECT query_id, qv, cid FROM (
        SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY {_L2_EC}, c.cid) AS rn
        FROM e CROSS JOIN cent c WHERE e.vec_id < {N_QUERY}) WHERE rn <= {N_PROBE}
),
scored AS (
    SELECT p.query_id, a.neighbor_id,
           round({V.cosine_sql("p.qv", "a.v")}, 6) AS cos_sim
    FROM probe p JOIN assigned a ON p.cid = a.cid AND p.query_id <> a.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
) WHERE rn <= {K}
"""


# v06 — per-label centroid vectors (class prototypes): fixed-point
# component sums so the unordered aggregation is exact cross-engine
def v06_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return similarity.label_centroids(emb, "embedding", "label")


V06_SQL = """
WITH ex AS (
    SELECT label, i - 1 AS dim,
           CAST(floor(list_extract(v, i) * 1000000 + 0.5) AS BIGINT) AS s
    FROM (
        SELECT label, embedding::DOUBLE[] AS v,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    )
)
SELECT label, dim, CAST(sum(s) AS BIGINT) AS sum_scaled, count(*) AS n_vecs,
       CAST(sum(s) AS DOUBLE) / (count(*) * 1000000) AS centroid
FROM ex GROUP BY label, dim
"""


# Registry discipline (round-2, see queries/relational.py): the former
# v02 bucket-assignment entry is subsumed by v03/v04, whose oracles
# recompute every band signature.
QUERIES = [
    QuerySpec("v01_cosine_topk", v01_cosine_topk, V01_SQL, "brute-force exact cosine top-k"),
    QuerySpec("v03_embedding_near_dups", v03_embedding_near_dups, V03_SQL, "banded-LSH embedding near-dup pairs"),
    QuerySpec("v04_lsh_topk", v04_lsh_topk, V04_SQL, "banded-LSH approximate top-k"),
    QuerySpec("v05_ivf_topk", v05_ivf_topk, V05_SQL, "IVF-partitioned approximate top-k (seeded centroids)"),
    QuerySpec("v06_label_centroids", v06_label_centroids, V06_SQL, "per-label centroid vectors (fixed-point exact)"),
]
