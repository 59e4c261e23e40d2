"""Sequence packing: lay documents out into fixed-length training
sequences (concatenate-and-chunk, the GPT-style pretraining layout).

Each document gets a deterministic byte... token-offset interval inside
its shard's concatenated token stream, and from it the chunk (training
sequence) indices it lands in. Documents may span chunk boundaries —
that IS concat-then-chunk semantics; a packer that never splits
documents needs a sequential fill and does not distribute.

Scale shape: packing is per-SHARD (hash of the doc id), so the cumsum
window is partitioned — no global ordering, no single-partition
bottleneck. Within a shard the order is (doc_id) — deterministic and
reproducible across runs/engines. At 100 TB, shards ≈ output files;
one window shuffle keyed on the shard.

Reference parity: absent from the reference (SURVEY.md §2.2);
BASELINE.json LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: Column | str,
    seq_len: int = 512,
    shards: int = 16,
) -> DataFrame:
    """Assign every document its token-offset interval and chunk span
    within its shard's concatenated stream.

    Output: ``<id_col>, shard, n_tokens, start_offset, end_offset,
    first_chunk, last_chunk`` — ``end_offset`` exclusive; chunk indices
    are ``offset // seq_len``; zero-token documents take no space
    (first_chunk = last_chunk = the chunk of their start offset).
    """
    from pyspark.sql import Window

    n_tok = F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    base = df.select(
        F.col(id_col),
        (F.col(id_col) % F.lit(shards)).alias("shard"),
        n_tok.cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = base.withColumn("_cum", F.sum("n_tokens").over(w))
    start = (F.col("_cum") - F.col("n_tokens")).alias("start_offset")
    return cum.select(
        id_col,
        "shard",
        "n_tokens",
        start,
        F.col("_cum").alias("end_offset"),
        F.floor((F.col("_cum") - F.col("n_tokens")) / F.lit(seq_len)).alias("first_chunk"),
        F.floor(
            F.greatest(F.col("_cum") - 1, F.col("_cum") - F.col("n_tokens")) / F.lit(seq_len)
        ).alias("last_chunk"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 8,
    seed: str = "shards",
    fmt: str = "parquet",
    mode: str = "error",
) -> DataFrame:
    """Materialize the corpus as ``n_shards`` balanced, globally
    shuffled training shards: ``path/shard=K/`` directories whose
    within-file row order follows the deterministic global permutation
    (:func:`~stepist_spark.operators.sampling.deterministic_shuffle`).
    A new ``seed`` per epoch gives a fresh, reproducible epoch order.
    Returns the per-shard row counts READ BACK from the written files
    (an audit of what actually landed, not of the plan).

    Layout semantics: shard = (rank−1) mod n_shards, so each shard is
    an every-n-th-row subsequence of one global permutation — shard
    sizes balance to ±1 row and each is itself in random order, so a
    trainer can stream any subset of shards in file order. All rows of
    a shard hash to ONE task (repartition on the shard key), whose
    sorted spill writes one rank-ordered file per shard directory —
    at 100 TB raise ``n_shards`` so a shard fits a task (shards ≈
    files is the intended operating point, same as pack_sequences).
    """
    from stepist_spark.operators.sampling import deterministic_shuffle

    ranked = deterministic_shuffle(df, id_col, seed=seed)
    sharded = ranked.withColumn(
        "shard", F.pmod(F.col("shuffle_rank") - 1, F.lit(n_shards)).cast("int")
    )
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_rank")
        .write.format(fmt)
        .mode(mode)
        .partitionBy("shard")
        .save(path)
    )
    return (
        df.sparkSession.read.format(fmt)
        .load(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
) -> DataFrame:
    """Overlapping context-window chunks: split each document's token
    stream into windows of ``chunk_tokens`` advancing by
    ``chunk_tokens - overlap_tokens`` — the RAG-indexing / long-doc
    pretraining chunker (every token appears in ≥1 chunk; consecutive
    chunks share ``overlap_tokens`` of context).

    Output: ``<id_col>, chunk_idx, start_tok (1-based), n_chunk_tokens,
    chunk_text``. Empty documents produce no chunks.

    Scale shape: one tokenize + one JVM explode over the start grid —
    no Python, no shuffle at all (chunking is embarrassingly row-local;
    write the result partitioned however the index wants it).
    """
    step = chunk_tokens - overlap_tokens
    if step <= 0:
        raise ValueError("chunk_tokens must exceed overlap_tokens")
    toks = _text_tokens(F.col(text_col))
    ex = (
        docs.select(id_col, toks.alias("_tk"))
        .filter(F.size("_tk") > 0)
        .select(
            id_col,
            "_tk",
            F.explode(F.sequence(F.lit(1), F.size("_tk"), F.lit(step))).alias(
                "start_tok"
            ),
        )
    )
    n = F.size("_tk")
    return ex.select(
        id_col,
        # exact: start-1 is always a multiple of step, so the double
        # division is integral and the cast is lossless
        ((F.col("start_tok") - 1) / F.lit(step)).cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.least(F.lit(chunk_tokens), n - F.col("start_tok") + 1)
        .cast("bigint")
        .alias("n_chunk_tokens"),
        F.concat_ws(" ", F.slice("_tk", F.col("start_tok"), chunk_tokens)).alias(
            "chunk_text"
        ),
    )


# --------------------------------------------------------------------------
# T5-style span corruption: deterministic masked-span training pairs.
#
# The denoising-objective data-prep step: mask ~mask_rate of each
# document's tokens, merge adjacent masked tokens into spans, replace
# each span with a numbered sentinel in the INPUT and emit the span's
# tokens after the same sentinel in the TARGET. "Randomness" is the
# repo's portable md5 hash of (doc_id, position) — the masking is a
# pure function of the data, so pipeline re-runs, engine mirrors, and
# shard-parallel workers all agree on every mask without sharing RNG
# state (the same determinism discipline as sampling.hash_split).
#
# Scale shape: posexplode -> one doc-keyed window pass (mask, span
# starts, running sentinel ids) -> one doc-keyed aggregation that
# reassembles both strings from ordered pieces. Everything is LINEAR
# in document length (an in-row F.aggregate fold would re-copy the
# accumulated string at every token — O(n²) per document — and a
# per-position prefix count via slices is O(n²) too); the cost is one
# |tokens|-row shuffle keyed on the doc id, the same shape as
# dedup.duplicate_spans.

from stepist_spark.functions.text import tokens as _text_tokens


def span_corruption(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_rate_pct: int = 15,
    sentinel: str = "<extra_id_{}>",
) -> DataFrame:
    """Per-document denoising pair. Output: ``<id_col>, n_tokens,
    n_masked, n_spans, input_text, target_text``.

    Sentinels number spans left-to-right from 0. A document with no
    masked token keeps its text verbatim and gets an empty target.
    """
    from pyspark.sql import Window

    from stepist_spark.functions import hashing

    pre, post = sentinel.split("{}")
    toked = docs.select(F.col(id_col), _text_tokens(F.col(text_col)).alias("_tk"))
    tok = toked.select(id_col, F.posexplode("_tk").alias("pos", "tok"))
    m = (
        hashing.word_hash32(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("pos").cast("string"))
        )
        % 100
        < F.lit(mask_rate_pct)
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = tok.withColumn("_m", m).withColumn(
        "_start", F.col("_m") & ~F.coalesce(F.lag("_m").over(w), F.lit(False))
    )
    run = flagged.withColumn(
        "_k",
        F.sum(F.col("_start").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )
    sent = F.concat(F.lit(pre), F.col("_k").cast("string"), F.lit(post))
    inp_piece = F.when(~F.col("_m"), F.col("tok")).when(F.col("_start"), sent)
    tgt_piece = F.when(F.col("_start"), F.concat(sent, F.lit(" "), F.col("tok"))).when(
        F.col("_m"), F.col("tok")
    )

    def _ordered_join(piece):
        # collect_list drops NULL entries (the pieces this position
        # contributes nothing to), sort by position, join
        collected = F.collect_list(
            F.when(piece.isNotNull(), F.struct(F.col("pos").alias("p"), piece.alias("s")))
        )
        return F.array_join(
            F.transform(F.array_sort(collected), lambda x: x["s"]), " "
        )

    agg = run.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("_m").cast("int")).cast("bigint").alias("n_masked"),
        F.sum(F.col("_start").cast("int")).cast("bigint").alias("n_spans"),
        _ordered_join(inp_piece).alias("input_text"),
        _ordered_join(tgt_piece).alias("target_text"),
    )
    # docs with zero tokens produce no exploded rows: restore them
    return toked.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("input_text", F.lit("")).alias("input_text"),
        F.coalesce("target_text", F.lit("")).alias("target_text"),
    )
