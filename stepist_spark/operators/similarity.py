"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — a broadcast nested-loop join
(queries broadcast, corpus streamed once; no shuffle of the corpus).
Scale path: sign-LSH bucketing — equi-join on bucket id so only
same-bucket vectors are compared; with multi-probe fallback this is
the standard sub-linear ANN shape for 100 TB corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stepist_spark.functions import vectors as V


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query.

    ``queries`` must be small (it is broadcast). The corpus is scanned
    once; cosine runs as a codegen'd higher-order function; top-k is a
    per-query window (row_number ≤ k) with a deterministic
    (similarity desc, corpus id) tiebreak.

    Output: ``query_id, neighbor_id, cos_sim`` (rounded to 6 dp).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), V.to_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), V.to_double(F.col(vec_col)).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(V.cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = V.N_PLANES,
) -> DataFrame:
    """Approximate cosine top-k: compare only vectors sharing the
    sign-LSH bucket of the query.

    The corpus is hashed once (narrow map), then the search is an
    equi-join on ``bucket`` — at 100 TB this shuffles each side by an
    8-bit key instead of materializing |corpus|×|queries| pairs. Recall
    trades off with n_planes; callers needing higher recall union
    multiple plane-sets (multi-probe) before the join.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), V.to_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", V.lsh_bucket(F.col("qv"), n_planes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), V.to_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", V.lsh_bucket(F.col("cv"), n_planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(V.cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = V.N_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join.

    Same-bucket pairs only (id_a < id_b), verified against the cosine
    threshold. Output: ``id_a, id_b, cos_sim``.
    """
    c = corpus.select(
        F.col(id_col).alias("_id"), V.to_double(F.col(vec_col)).alias("_v")
    ).withColumn("bucket", V.lsh_bucket(F.col("_v"), n_planes))
    a = c.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"), "bucket")
    b = c.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", F.round(V.cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
