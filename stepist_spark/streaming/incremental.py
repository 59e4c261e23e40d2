"""Incremental corpus ingestion: dedup each micro-batch against ALL
history, not just the stream's watermark horizon.

``stream_dedup`` bounds state by time — right for event streams, wrong
for corpus building, where a document ingested months ago must still
suppress today's copy. The scalable shape keeps the seen-keys set as a
PARQUET TABLE (columnar, partitioned, cheap to anti-join) rather than
in the state store: each micro-batch anti-joins the history, appends
the survivors to both the output and the history, and stays
exactly-once via the streaming checkpoint plus idempotent-by-content
appends.

At 100 TB the anti-join is hash-key vs hash-key (16-byte md5s, not
documents) and prunes with AQE; the history table can be bucketed on
the hash for a shuffle-free anti-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def dedup_against_history(
    src: DataFrame,
    out_dir: str,
    history_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start a streaming ingestion that keeps only first-seen documents.

    Per micro-batch: content-hash the batch, drop rows whose hash is
    already in ``history_dir`` (left-anti join) or duplicated within the
    batch (min-id wins), append survivors to ``out_dir`` and their
    hashes to ``history_dir``. Restart-safe: the checkpoint replays an
    epoch only if it didn't complete, and replaying is idempotent for
    the history (same hashes are anti-joined away... except the epoch's
    own partial append — callers needing strict exactly-once should
    write history under epoch-id paths; documented trade-off).
    """
    spark = src.sparkSession

    def ingest(batch: DataFrame, epoch_id: int) -> None:
        hashed = batch.withColumn("_h", F.md5(F.col(text_col)))
        # in-batch dedup: min id wins (deterministic)
        from pyspark.sql import Window

        w = Window.partitionBy("_h").orderBy(F.col(id_col))
        hashed = hashed.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        ).drop("_rn")
        # probe history through Spark, not the driver's local filesystem
        # — history_dir may be s3://-style storage where os.path never
        # matches and a silent probe failure would disable deduplication
        try:
            seen = spark.read.parquet(history_dir)
            has_history = "content_hash" in seen.columns
        except Exception:  # path does not exist yet: first epoch
            has_history = False
        if has_history:
            hashed = hashed.join(seen, hashed["_h"] == seen["content_hash"], "left_anti")
        fresh = hashed.persist()
        try:
            fresh.drop("_h").write.mode("append").parquet(out_dir)
            fresh.select(F.col("_h").alias("content_hash")).write.mode("append").parquet(
                history_dir
            )
        finally:
            fresh.unpersist()

    writer = src.writeStream.foreachBatch(ingest).option("checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
