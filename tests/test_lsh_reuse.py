"""Round-11 optimization: the shared-signature LSH seam.

t08 used to run FOUR tokenize->shingle->minhash passes over the same
corpus (8-hash self candidates, 8-hash incremental candidates over
both corpus halves, 16-hash 'steep' candidates, plus the stats
tokenize). The optimization computes ONE 16-hash signature frame and
derives every banding from it — sound because the universal-hash
family is prefix-stable (coefficient i is independent of n_hashes, the
first 12 are frozen literals, the rest md5-position-keyed), so
mh0..mh7 of a 16-hash signature are byte-identical to an 8-hash run.

These tests pin that equivalence so the reuse seam can never drift
from the original operators (whose outputs every t08 oracle hash
certifies).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stepist_spark.functions import hashing
from stepist_spark.functions.text import tokens
from stepist_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "a completely different document about spark optimization"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (5, "a completely different document about spark tuning"),
    (6, "short doc"),  # < 3 tokens after shingling -> no shingles
    (2_000_001, "the quick brown fox jumps over the lazy dog today"),
    (2_000_002, "a completely different document about spark optimization"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def _sig16(corpus):
    toked = corpus.select(
        F.col("doc_id").alias("_id"), tokens(F.col("text")).alias("_tk")
    )
    shingled = toked.select(
        "_id", hashing.shingles(F.col("_tk"), 3).alias("_toks")
    )
    return hashing.minhash_signature(shingled, "_id", "_toks", n_hashes=16)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestSignaturePrefixStability:
    def test_mh_prefix_of_16_equals_8_hash_run(self, corpus):
        toked = corpus.select(
            F.col("doc_id").alias("_id"), tokens(F.col("text")).alias("_tk")
        )
        shingled = toked.select(
            "_id", hashing.shingles(F.col("_tk"), 3).alias("_toks")
        )
        s8 = hashing.minhash_signature(shingled, "_id", "_toks", n_hashes=8)
        s16 = _sig16(corpus).select("_id", *[f"mh{i}" for i in range(8)])
        assert _rows(s8) == _rows(s16)


class TestBandsFromSignature:
    def test_banded_8_4_matches_banded_signatures(self, corpus):
        direct = dedup.banded_signatures(corpus, "doc_id", "text", 8, 4)
        derived = dedup.bands_from_signature(_sig16(corpus), 8, 4)
        assert _rows(direct) == _rows(derived)

    def test_banded_16_4_matches_banded_signatures(self, corpus):
        direct = dedup.banded_signatures(corpus, "doc_id", "text", 16, 4)
        derived = dedup.bands_from_signature(_sig16(corpus), 16, 4)
        assert _rows(direct) == _rows(derived)

    def test_bands_must_divide(self, corpus):
        with pytest.raises(ValueError):
            dedup.bands_from_signature(_sig16(corpus), 16, 5)


class TestCandidatesFromBanded:
    def test_self_candidates_match_operator(self, corpus):
        via_op = dedup.minhash_lsh_candidates(corpus, "doc_id", "text", 8, 4)
        via_banded = dedup.candidates_from_banded(
            dedup.bands_from_signature(_sig16(corpus), 8, 4)
        )
        assert _rows(via_op) == _rows(via_banded)
        # sanity: the planted dup pair is a candidate at all
        assert (1, 4) in {(a, b) for a, b in _rows(via_op)}

    def test_steep_candidates_match_operator(self, corpus):
        via_op = dedup.minhash_lsh_candidates(corpus, "doc_id", "text", 16, 4)
        via_banded = dedup.candidates_from_banded(
            dedup.bands_from_signature(_sig16(corpus), 16, 4)
        )
        assert _rows(via_op) == _rows(via_banded)

    def test_between_candidates_match_operator(self, corpus):
        base = corpus.filter(F.col("doc_id") < 2_000_000)
        newb = corpus.filter(F.col("doc_id") >= 2_000_000)
        via_op = dedup.minhash_lsh_candidates_between(
            newb, base, "doc_id", "text", 8, 4
        )
        banded8 = dedup.bands_from_signature(_sig16(corpus), 8, 4)
        via_banded = dedup.candidates_between_banded(
            banded8.filter(F.col("_id") < 2_000_000),
            banded8.filter(F.col("_id") >= 2_000_000),
        )
        assert _rows(via_op) == _rows(via_banded)
