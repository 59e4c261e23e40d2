"""Sequence packing operator."""

from __future__ import annotations

from stepist_spark.operators.packing import pack_sequences


def test_offsets_and_chunks(spark):
    df = spark.createDataFrame(
        [(0, 300), (16, 300), (32, 100)], "doc_id bigint, n bigint"
    )  # all shard 0 (ids % 16 == 0)
    got = {r["doc_id"]: (r["start_offset"], r["end_offset"], r["first_chunk"], r["last_chunk"])
           for r in pack_sequences(df, "doc_id", "n", seq_len=512, shards=16).collect()}
    assert got[0] == (0, 300, 0, 0)
    assert got[16] == (300, 600, 0, 1)   # spans the 512 boundary
    assert got[32] == (600, 700, 1, 1)


def test_shards_are_independent(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 20), (16, 5)], "doc_id bigint, n bigint"
    )
    got = {r["doc_id"]: (r["shard"], r["start_offset"]) for r in
           pack_sequences(df, "doc_id", "n", seq_len=512, shards=16).collect()}
    assert got[0] == (0, 0)
    assert got[1] == (1, 0)    # own shard, fresh offsets
    assert got[16] == (0, 10)  # continues shard 0 after doc 0


def test_zero_token_doc_takes_no_space(spark):
    df = spark.createDataFrame([(0, 10), (16, 0), (32, 5)], "doc_id bigint, n bigint")
    got = {r["doc_id"]: (r["start_offset"], r["end_offset"], r["first_chunk"], r["last_chunk"])
           for r in pack_sequences(df, "doc_id", "n", seq_len=512, shards=16).collect()}
    assert got[16] == (10, 10, 0, 0)
    assert got[32] == (10, 15, 0, 0)
