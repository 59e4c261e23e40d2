"""Streaming deduplication with bounded state.

Batch dedup is a shuffle (`operators.dedup`); in a stream the engine
must REMEMBER seen keys, and unbounded memory of every key ever seen
is the classic way streaming dedup falls over. The watermark bounds
the state: a key older than the horizon can never collide with a
future arrival (the engine drops its state), which is exactly the
principled version of the reference's expiring-Redis-keys pattern
(`stepist/flow/workers/reducer_engine.py:40-43` — TTL as memory bound).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup(
    df: DataFrame,
    keys: str | Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Drop duplicate rows (by ``keys``) from a streaming DataFrame.

    With ``ts_col`` + ``watermark`` (e.g. ``"10 minutes"``), duplicate
    suppression uses ``dropDuplicatesWithinWatermark``: duplicates
    arriving within the watermark horizon of the first occurrence are
    dropped, and per-key state is evicted once the watermark passes —
    state size is O(keys per horizon), not O(all keys ever).

    Without a watermark the state grows without bound — acceptable only
    for low-cardinality keys; a warning of this is in the caller's
    hands (mirrors Spark's own semantics).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if not df.isStreaming:
        return df.dropDuplicates(key_list)
    if watermark is not None:
        if ts_col is None:
            raise ValueError("watermarked dedup needs ts_col")
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_list)
    return df.dropDuplicates(key_list)
