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
