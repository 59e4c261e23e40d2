"""Property-based tests (hypothesis): the portable function library's
Spark expressions must agree with straightforward Python reference
implementations on arbitrary input — the same property the DuckDB
mirrors rely on. Alphabet is printable ASCII + simple whitespace
(unicode case-folding and \\s-class edge cases differ BETWEEN python/
Java/DuckDB by spec; the engine's contract is ASCII-stable).

Each hypothesis example generates a BATCH of strings and runs one Spark
job over the batch — examples are capped so the whole module stays
fast.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stepist_spark.functions import hashing, text as TX

ALPHABET = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n.,;:!?'\"-()")
)
TEXTS = st.lists(st.text(ALPHABET, max_size=120), min_size=1, max_size=12)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def tokens_py(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.lower()) if t != ""]


def shingles_py(toks: list[str], k: int) -> list[str]:
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def word_hash32_py(t: str) -> int:
    return int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)


def _run(spark, texts, col):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    return {r["i"]: r["out"] for r in df.select("i", col.alias("out")).collect()}


class TestTokenProperties:
    @SETTINGS
    @given(TEXTS)
    def test_tokens_match_python(self, spark, texts):
        got = _run(spark, texts, TX.tokens(F.col("text")))
        assert got == {i: tokens_py(t) for i, t in enumerate(texts)}

    @SETTINGS
    @given(TEXTS)
    def test_token_count_matches(self, spark, texts):
        got = _run(spark, texts, TX.token_count(F.col("text")))
        assert got == {i: len(tokens_py(t)) for i, t in enumerate(texts)}


class TestShingleProperties:
    @SETTINGS
    @given(TEXTS, st.integers(min_value=2, max_value=4))
    def test_shingles_match_python(self, spark, texts, k):
        col = hashing.shingles(TX.tokens(F.col("text")), k)
        got = _run(spark, texts, col)
        assert got == {i: shingles_py(tokens_py(t), k) for i, t in enumerate(texts)}


class TestHashProperties:
    @SETTINGS
    @given(st.lists(st.text(ALPHABET, min_size=1, max_size=40), min_size=1, max_size=12))
    def test_word_hash32_matches_python_md5(self, spark, words):
        got = _run(spark, words, hashing.word_hash32(F.col("text")))
        assert got == {i: word_hash32_py(w) for i, w in enumerate(words)}

    def test_minhash_universal_hash_formula(self, spark):
        h = 12345
        df = spark.createDataFrame([(h,)], "h long")
        for i in (0, 3, 7):
            (r,) = df.select(hashing.minhash_of_hash(F.col("h"), i).alias("v")).collect()
            expected = (hashing.MINHASH_A[i] * h + hashing.MINHASH_B[i]) % hashing.MINHASH_P
            assert r["v"] == expected


class TestQualityScoreProperties:
    @SETTINGS
    @given(TEXTS)
    def test_scaled_score_bounds_and_emptiness(self, spark, texts):
        got = _run(spark, texts, TX.quality_score_scaled(F.col("text")))
        for i, t in enumerate(texts):
            v = got[i]
            assert 0 <= v <= 1_000_000
            if not tokens_py(t):
                assert v == 0
