"""Model-based quality filtering (DCLM / FineWeb-Edu style).

Modern pre-training curation gates documents with a lightweight text
classifier trained on seed labels (good refs vs crawl noise). This
module is the Spark-native, engine-portable version of that stage: a
hashed bag-of-words linear model — the fastText-shaped architecture —
with Rocchio (class-centroid difference) training, all in exact
integer arithmetic so scores are bit-identical across engines and
re-runs.

Why not MLlib's LogisticRegression? Gradient training is FP-iteration
whose result depends on partitioning/order — unusable under this
repo's oracle discipline (SURVEY.md §6). The centroid-difference
weight vector is the closed-form one-pass analog: deterministic,
integer-exact, and one hash-aggregate per pass, while keeping the
exact production scoring shape (hash → weight lookup → sum).

Physical shape at 100 TB:
- training: explode(tokens) → groupBy(label, bucket) count — shuffle
  carries ≤ |labels|·dim rows per partition after map-side combine.
- scoring: explode(tokens) → broadcast-join the dim-row weight table →
  groupBy(doc) sum. A document's token rows stay in the producing
  partition, so the partial sum collapses map-side and the shuffle
  moves ONE row per document, never one per token.

Reference parity: the reference has no ML surface at all (SURVEY.md
§2.2 'absent'); BASELINE.json LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stepist_spark.functions.hashing import word_hash32
from stepist_spark.functions.text import tokens

SCALE = 1_000_000


def hashed_buckets(text_col, dim: int = 4096):
    """Token → feature-bucket ids (hashing trick): one bucket per
    token occurrence, ``pmod(word_hash32(token), dim)``. Portable: the
    md5-derived hash has an exact DuckDB mirror (functions/hashing.py)."""
    return F.transform(tokens(text_col), lambda t: F.pmod(word_hash32(t), F.lit(dim)))


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 4096,
) -> DataFrame:
    """Rocchio-trained weight table from a labeled seed set.

    ``label_col`` must be boolean-like (true = positive/keep). Weight
    per bucket = mean positive count − mean negative count, each mean
    integer-scaled exactly as ``floor(count·SCALE / n_docs)`` (single
    division of exact integers — portable). Output: ``bucket,
    w_scaled`` (dim rows at most; broadcast it at scoring time).
    """
    ex = labeled.select(
        F.col(label_col).cast("boolean").alias("_pos"),
        F.explode(hashed_buckets(F.col(text_col), dim)).alias("bucket"),
    )
    n_pos = F.sum(F.when(F.col(label_col).cast("boolean"), 1).otherwise(0))
    n_neg = F.sum(F.when(F.col(label_col).cast("boolean"), 0).otherwise(1))
    counts = labeled.agg(n_pos.alias("np"), n_neg.alias("nn"))
    per_bucket = ex.groupBy("bucket").agg(
        F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("cn"),
    )
    # `div` is bigint integer division (== floor for the non-negative
    # counts here) — a double `/` + floor() would round through 2^53
    # and can mis-floor at corpus-scale counts.
    return per_bucket.crossJoin(F.broadcast(counts)).select(
        "bucket",
        F.expr(f"cp * {SCALE}L div np - cn * {SCALE}L div nn").alias("w_scaled"),
    )


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    threshold_scaled: int = 0,
) -> DataFrame:
    """Classifier margin per document: sum of bucket weights over all
    token occurrences (exact bigint). Output: ``id_col, n_toks,
    margin_scaled, keep`` — filter on ``keep`` (margin ≥ threshold) or
    rank on ``margin_scaled`` for quality-weighted sampling.

    Unseen buckets (absent from training) contribute 0. The weight
    table is broadcast; the per-document sum collapses map-side (see
    module docstring).
    """
    ex = docs.select(
        F.col(id_col),
        F.explode_outer(hashed_buckets(F.col(text_col), dim)).alias("bucket"),
    )
    joined = ex.join(F.broadcast(weights), "bucket", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.col("bucket")).alias("n_toks"),
            F.coalesce(F.sum("w_scaled"), F.lit(0)).cast("bigint").alias("margin_scaled"),
        )
        .withColumn("keep", F.col("margin_scaled") >= F.lit(threshold_scaled))
    )
