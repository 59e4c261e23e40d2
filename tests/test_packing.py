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


class TestWriteTrainingShards:
    def test_roundtrip_balanced_ordered(self, spark, tmp_path):
        from stepist_spark.operators.packing import write_training_shards

        df = spark.range(101).withColumnRenamed("id", "doc_id")
        path = str(tmp_path / "shards")
        audit = {r["shard"]: r["n_rows"] for r in
                 write_training_shards(df, path, "doc_id", n_shards=4, seed="e0").collect()}
        # balanced to +-1 and complete
        assert set(audit) == {0, 1, 2, 3}
        assert sum(audit.values()) == 101
        assert max(audit.values()) - min(audit.values()) <= 1
        back = spark.read.parquet(path)
        assert sorted(r["doc_id"] for r in back.collect()) == list(range(101))
        # each shard directory is one rank-ordered file
        for s in range(4):
            rows = spark.read.parquet(f"{path}/shard={s}").collect()
            ranks = [r["shuffle_rank"] for r in rows]
            assert ranks == sorted(ranks)
            assert all((rk - 1) % 4 == s for rk in ranks)

    def test_epoch_seed_changes_order_not_membership(self, spark, tmp_path):
        from stepist_spark.operators.packing import write_training_shards

        df = spark.range(60).withColumnRenamed("id", "doc_id")
        p0, p1 = str(tmp_path / "e0"), str(tmp_path / "e1")
        write_training_shards(df, p0, "doc_id", n_shards=3, seed="e0").collect()
        write_training_shards(df, p1, "doc_id", n_shards=3, seed="e1").collect()
        s0 = [r["doc_id"] for r in spark.read.parquet(p0 + "/shard=0").collect()]
        s1 = [r["doc_id"] for r in spark.read.parquet(p1 + "/shard=0").collect()]
        assert s0 != s1  # different epoch permutation
        all0 = sorted(r["doc_id"] for r in spark.read.parquet(p0).collect())
        all1 = sorted(r["doc_id"] for r in spark.read.parquet(p1).collect())
        assert all0 == all1 == list(range(60))

    def test_rerun_is_identical(self, spark, tmp_path):
        from stepist_spark.operators.packing import write_training_shards

        df = spark.range(50).withColumnRenamed("id", "doc_id")
        pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
        write_training_shards(df, pa, "doc_id", n_shards=2, seed="s").collect()
        write_training_shards(df.repartition(5), pb, "doc_id", n_shards=2, seed="s").collect()
        for s in range(2):
            a = [r["doc_id"] for r in spark.read.parquet(f"{pa}/shard={s}").collect()]
            b = [r["doc_id"] for r in spark.read.parquet(f"{pb}/shard={s}").collect()]
            assert a == b


class TestSpanCorruption:
    def _py_reference(self, doc_id, text, rate=15):
        import hashlib
        import re

        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        # 0-based positions: F.transform's lambda index convention
        mask = [
            int(hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()[:8], 16) % 100
            < rate
            for i in range(len(toks))
        ]
        inp, tgt, k, in_span = [], [], 0, False
        for t, m in zip(toks, mask):
            if not m:
                inp.append(t)
                in_span = False
            elif not in_span:
                sent = f"<extra_id_{k}>"
                inp.append(sent)
                tgt.extend([sent, t])
                k += 1
                in_span = True
            else:
                tgt.append(t)
        spans = k
        return (
            len(toks), sum(mask), spans, " ".join(inp), " ".join(tgt)
        )

    def test_matches_python_reference(self, spark):
        from stepist_spark.operators.packing import span_corruption
        from stepist_spark.session import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id", "text"
        ).limit(80)
        rows = {r.doc_id: r for r in span_corruption(docs).collect()}
        src = {r.doc_id: r.text for r in docs.collect()}
        assert rows and set(rows) == set(src)
        any_masked = False
        for d, text in src.items():
            exp = self._py_reference(d, text)
            r = rows[d]
            got = (r.n_tokens, r.n_masked, r.n_spans, r.input_text, r.target_text)
            assert got == exp, (d, got, exp)
            any_masked = any_masked or r.n_masked > 0
        assert any_masked

    def test_unmasked_doc_roundtrips(self, spark):
        from stepist_spark.operators.packing import span_corruption

        # rate 0: nothing masked, text verbatim (lowercased tokens)
        df = spark.createDataFrame(
            [(1, "Alpha beta GAMMA")], "doc_id long, text string"
        )
        r = span_corruption(df, mask_rate_pct=0).collect()[0]
        assert (r.n_masked, r.n_spans, r.target_text) == (0, 0, "")
        assert r.input_text == "alpha beta gamma"

    def test_full_mask_single_span(self, spark):
        from stepist_spark.operators.packing import span_corruption

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        r = span_corruption(df, mask_rate_pct=100).collect()[0]
        assert (r.n_masked, r.n_spans) == (3, 1)
        assert r.input_text == "<extra_id_0>"
        assert r.target_text == "<extra_id_0> a b c"


class TestChunkDocuments:
    def test_windows_cover_and_overlap(self, spark):
        from stepist_spark.operators.packing import chunk_documents

        text = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_documents(df, chunk_tokens=4, overlap_tokens=2).collect(),
            key=lambda r: r.chunk_idx,
        )
        # step 2 over 10 tokens: starts 1,3,5,7,9
        assert [r.start_tok for r in rows] == [1, 3, 5, 7, 9]
        assert rows[0].chunk_text == "w0 w1 w2 w3"
        assert rows[1].chunk_text == "w2 w3 w4 w5"  # 2-token overlap
        assert rows[-1].chunk_text == "w8 w9"       # short tail chunk
        assert rows[-1].n_chunk_tokens == 2
        # coverage: every token appears in at least one chunk
        seen = set()
        for r in rows:
            seen.update(r.chunk_text.split())
        assert seen == {f"w{i}" for i in range(10)}

    def test_empty_doc_produces_no_chunks(self, spark):
        from stepist_spark.operators.packing import chunk_documents

        df = spark.createDataFrame([(1, ""), (2, "a b")], "doc_id long, text string")
        got = chunk_documents(df, chunk_tokens=4, overlap_tokens=2)
        assert [r.doc_id for r in got.collect()] == [2]

    def test_overlap_must_be_smaller_than_window(self, spark):
        import pytest

        from stepist_spark.operators.packing import chunk_documents

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=4, overlap_tokens=4)
