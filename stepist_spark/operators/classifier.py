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


LOGP_SCALE = 1_000_000


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
) -> dict:
    """Count model for a CCNet-style n-gram LM quality signal: bigram
    and unigram-context counts over the lowercased token stream, plus
    the vocabulary size (as a 1-row frame — never collected). Returns
    ``{"bigrams", "contexts", "vocab"}`` DataFrames; persist them as
    parquet to reuse the model (they are plain frames, like the PQ
    codebook).

    Shape: one explode per order and one hash-aggregate shuffle each —
    map-side combine collapses in-partition repeats, so the shuffle
    carries distinct n-grams per partition, not token occurrences.
    """
    toks = corpus.select(tokens(F.col(text_col)).alias("_tk"))
    big = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("_tk"), 1, F.greatest(F.size("_tk") - 1, F.lit(0))),
                F.slice(F.col("_tk"), 2, F.greatest(F.size("_tk") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg")
    ).select("_bg.w1", "_bg.w2")
    uni = toks.select(F.explode("_tk").alias("w1"))
    return {
        "bigrams": big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")),
        "contexts": uni.groupBy("w1").agg(F.count(F.lit(1)).alias("c1")),
        "vocab": uni.select("w1").distinct().agg(F.count(F.lit(1)).alias("v")),
    }


def perplexity_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document add-one-smoothed bigram perplexity under a
    :func:`train_bigram_lm` model — the CCNet quality gate (keep the
    low-perplexity head / resample the tail). Output: ``id_col,
    n_bigrams, logp_scaled, ppl`` (ppl NULL for docs under 2 tokens).

    p(w2|w1) = (c12 + 1) / (c1 + V); unseen words hit the smoothing
    floor. Each bigram's log-prob is scaled to an integer
    (``floor(log(p)·10⁶)``) BEFORE the per-doc sum, so the aggregate is
    a bigint — order-independent and layout-deterministic, the same
    fixed-point discipline as `label_centroids`.

    Shape at scale: the doc-bigram stream joins the count tables on
    their own grouping keys (co-partitioned shuffle joins — the bigram
    table is corpus-vocabulary-sized, NEVER broadcast); V rides along
    as a broadcast 1-row cross join; the per-doc sum collapses
    map-side like every (doc-key, token-row) aggregate in this repo.
    """
    tk = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_tk"))
    dbg = tk.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(F.col("_tk"), 1, F.greatest(F.size("_tk") - 1, F.lit(0))),
                F.slice(F.col("_tk"), 2, F.greatest(F.size("_tk") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("_bg"),
    ).select(id_col, "_bg.w1", "_bg.w2")
    joined = (
        dbg.join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["contexts"], "w1", "left")
        .crossJoin(F.broadcast(model["vocab"]))
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double") / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")
    ).cast("double")
    scored = joined.select(
        F.col(id_col),
        F.floor(F.log(p) * F.lit(LOGP_SCALE)).cast("bigint").alias("_lp"),
    )
    agg = docs.select(F.col(id_col)).join(
        scored.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_bigrams"), F.sum("_lp").alias("logp_scaled")
        ),
        id_col,
        "left",
    )
    avg = F.col("logp_scaled").cast("double") / (F.col("n_bigrams") * F.lit(LOGP_SCALE))
    return agg.select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("logp_scaled"), F.lit(0)).alias("logp_scaled"),
        F.when(F.col("n_bigrams") > 0, F.exp(-avg)).alias("ppl"),
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
) -> DataFrame:
    """DSIR importance-weight feature table (Xie, Santurkar, Ma &
    Liang, "Data Selection for Language Models via Importance
    Resampling", NeurIPS 2023 — public): per hashed token bucket, the
    add-one-smoothed log-ratio ``ln(p_target(b) / p_raw(b))``. A raw
    document's importance weight is the sum of these over its token
    buckets (:func:`dsir_score`) — the importance-sampling twin of the
    Rocchio classifier above (generative ratio vs discriminative
    margin; same hashing trick, same scoring shape).

    Shape: one explode + hash aggregate per corpus (map-side combine —
    the shuffle carries ≤ dim rows per partition); the ratio table is
    built over the full dim-row support via ``spark.range(dim)`` so
    buckets unseen in either corpus still carry their smoothing-floor
    ratio. Exact arithmetic: ``lr_scaled = floor(ln(((ct+1)·(R+dim)) /
    ((cr+1)·(T+dim)))·1e6)`` — one ln of a ratio of exact
    decimal(38,0)/HUGEINT products (the t23/KL/PSI log pattern).

    Output: ``bucket, ct, cr, lr_scaled`` (dim rows — broadcast it at
    scoring time, like the classifier weight table)."""
    from pyspark.sql import Window

    from stepist_spark.operators.cumulative import whole_frame

    def _bucket_counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(F.explode(hashed_buckets(F.col(text_col), dim)).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    support = target.sparkSession.range(dim).select(
        F.col("id").cast("bigint").alias("bucket")
    )
    joined = (
        support.join(_bucket_counts(target, "ct"), "bucket", "left")
        .join(_bucket_counts(raw, "cr"), "bucket", "left")
        .fillna(0, ["ct", "cr"])
    )
    w_all = whole_frame().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = "decimal(38,0)"
    joined = joined.withColumn("_T", F.sum("ct").over(w_all)).withColumn(
        "_R", F.sum("cr").over(w_all)
    )
    num = (F.col("ct") + 1).cast(dec) * (F.col("_R") + dim).cast(dec)
    den = (F.col("cr") + 1).cast(dec) * (F.col("_T") + dim).cast(dec)
    return joined.select(
        "bucket",
        "ct",
        "cr",
        F.floor(F.log(num.cast("double") / den.cast("double")) * F.lit(SCALE))
        .cast("bigint")
        .alias("lr_scaled"),
    )


def dsir_score(
    docs: DataFrame,
    log_ratios: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
) -> DataFrame:
    """Per-document DSIR importance weight: the sum of
    :func:`dsir_log_ratios` bucket log-ratios over the document's
    token occurrences (integer-scaled BEFORE the sum — order-free).
    In the paper the weight gates sampling via Gumbel top-k; compose
    with ``sampling.weighted_priority_sample`` for that step.

    Shape: explode → broadcast-join the dim-row ratio table → per-doc
    sum that collapses map-side (one shuffled row per document).
    Output: ``id_col, n_feats, dsir_scaled`` (0 for token-less docs).
    """
    ex = docs.select(
        F.col(id_col), F.explode(hashed_buckets(F.col(text_col), dim)).alias("bucket")
    )
    scored = (
        ex.join(F.broadcast(log_ratios.select("bucket", "lr_scaled")), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("lr_scaled").cast("bigint").alias("dsir_scaled"),
        )
    )
    return docs.select(F.col(id_col)).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
        F.coalesce(F.col("dsir_scaled"), F.lit(0)).alias("dsir_scaled"),
    )


def cross_validated_margins(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    k: int = 3,
    dim: int = 4096,
) -> DataFrame:
    """k-fold CROSS-VALIDATED classifier margins: every document is
    scored by a model trained WITHOUT its fold — the honest estimate
    of :func:`train_quality_classifier`'s filter quality (in-sample
    margins flatter the classifier because each document voted for its
    own bucket weights; CV removes that leak by construction).

    Folds are the portable md5 bucket of the id (``word_hash32 % k``,
    the hash_split discipline), so the assignment — and therefore
    every margin — is deterministic and engine-portable. k trainings
    each see (k−1)/k of the corpus; each fold's scoring joins ITS
    model's broadcast weight table. Total cost ≈ k× one training pass,
    all hash aggregates (the train/score shapes unchanged).

    Output: ``id_col, fold, n_toks, margin_scaled, keep`` — one row
    per document, exact integers end-to-end.
    """
    from stepist_spark.functions import hashing

    fold = (hashing.word_hash32(F.col(id_col).cast("string")) % k).alias("_fold")
    base = docs.select(id_col, text_col, label_col, fold).localCheckpoint(
        eager=False
    )
    out = None
    for f in range(k):
        weights = train_quality_classifier(
            base.filter(F.col("_fold") != f), text_col, label_col, dim=dim
        )
        scored = score_documents(
            base.filter(F.col("_fold") == f), weights, id_col, text_col, dim=dim
        ).select(id_col, F.lit(f).cast("int").alias("fold"),
                 "n_toks", "margin_scaled", "keep")
        out = scored if out is None else out.unionByName(scored)
    return out


def cross_validated_margins_sql(
    table_sql: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    label_expr: str = "label",
    k: int = 3,
    dim: int = 4096,
) -> str:
    """DuckDB mirror of :func:`cross_validated_margins` — the same
    md5 folds, k per-fold trainings and scorings unioned."""
    from stepist_spark.functions import hashing
    from stepist_spark.functions.text import tokens_sql

    h = hashing.word_hash32_sql("t")
    toks = tokens_sql(text_expr)
    fold = f"({hashing.word_hash32_sql(f'CAST({id_expr} AS VARCHAR)')} % {k})"
    parts = []
    for f in range(k):
        # fold membership LEFT JOIN: a token-less document must still
        # emit (n_toks 0, margin 0) — Spark's explode_outer keeps it
        parts.append(f"""
SELECT {f} AS fold, d.doc_id,
       coalesce(s.n_toks, 0) AS n_toks,
       coalesce(s.margin_scaled, 0) AS margin_scaled
FROM (SELECT ({id_expr}) AS doc_id FROM ({table_sql}) WHERE {fold} = {f}) d
LEFT JOIN (
SELECT doc_id,
       CAST(count(bucket) AS BIGINT) AS n_toks,
       CAST(coalesce(sum(w), 0) AS BIGINT) AS margin_scaled
FROM (
    SELECT ({id_expr}) AS doc_id,
           unnest(list_transform({toks}, t -> ({h}) % {dim})) AS bucket
    FROM ({table_sql}) WHERE {fold} = {f}
) ex_{f}
LEFT JOIN (
    SELECT bucket, cp * 1000000 // np - cn * 1000000 // nn AS w
    FROM (
        SELECT bucket,
               sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
        FROM (
            SELECT ({label_expr}) AS pos,
                   unnest(list_transform({toks}, t -> ({h}) % {dim})) AS bucket
            FROM ({table_sql}) WHERE {fold} <> {f}
        ) GROUP BY bucket
    ) pb_{f},
    (
        SELECT sum(CASE WHEN ({label_expr}) THEN 1 ELSE 0 END) AS np,
               sum(CASE WHEN ({label_expr}) THEN 0 ELSE 1 END) AS nn
        FROM ({table_sql}) WHERE {fold} <> {f}
    ) ct_{f}
) w_{f} USING (bucket)
GROUP BY doc_id
) s USING (doc_id)""")
    body = "\nUNION ALL\n".join(parts)
    return (
        f"SELECT doc_id, fold, n_toks, margin_scaled, "
        f"margin_scaled >= 0 AS keep FROM ({body})"
    )
