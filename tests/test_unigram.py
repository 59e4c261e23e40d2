"""Unigram-LM tokenizer training (round-11 verdict #5): the Spark
Viterbi DP must match the pure-Python twin exactly (integer-scaled
scores make equality exact, not approximate), the DuckDB mirror must
replay the identical DP, and the full EM+prune trainer must reproduce
a pure-Python reference implementation piece-for-piece."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from stepist_spark.operators.unigram import (
    LOGP_SCALE,
    UNK_LOGP,
    seed_pieces,
    train_unigram,
    viterbi_py,
    viterbi_segment,
    viterbi_segment_sql,
)

PIECES = {
    "th": -120_000, "the": -90_000, "e": -200_000, "t": -210_000,
    "h": -220_000, "an": -130_000, "d": -230_000, "er": -150_000,
    "x": -400_000,
}


def _rand_words(n=150, seed=7):
    rng = random.Random(seed)
    alpha = "theandrx"
    return list({
        "".join(rng.choices(alpha, k=rng.randint(1, 14))) for _ in range(n)
    })


class TestViterbiSegment:
    def test_matches_python_twin_exactly(self, spark):
        words = _rand_words() + ["the", "theater", "a", "qqq"]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        got = {
            r["word"]: (r["logp_scaled"], r["n_pieces"], list(r["sym"]))
            for r in viterbi_segment(df, PIECES, max_piece_len=3).collect()
        }
        for w in words:
            s, k, seg = viterbi_py(w, PIECES, 3)
            assert got[w] == (s, k, seg), w

    def test_segmentation_reassembles_word(self, spark):
        words = _rand_words(seed=11)
        df = spark.createDataFrame([(w,) for w in words], "word string")
        for r in viterbi_segment(df, PIECES, max_piece_len=3).collect():
            assert "".join(r["sym"]) == r["word"]

    def test_unknown_chars_cost_unk(self, spark):
        df = spark.createDataFrame([("zzz",)], "word string")
        (r,) = viterbi_segment(df, PIECES, max_piece_len=3).collect()
        assert r["logp_scaled"] == 3 * UNK_LOGP
        assert list(r["sym"]) == ["z", "z", "z"]

    def test_known_pieces_beat_unk_singles(self, spark):
        df = spark.createDataFrame([("the",)], "word string")
        (r,) = viterbi_segment(df, PIECES, max_piece_len=3).collect()
        assert list(r["sym"]) == ["the"] and r["n_pieces"] == 1

    def test_jvm_and_arrow_impls_identical(self, spark):
        # the impl choice must NEVER move a gate hash: both paths run
        # the same integer DP with the same tie-break tuple
        words = _rand_words(seed=23) + ["the", "zq", "a"]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        jvm = {
            r["word"]: (r["logp_scaled"], r["n_pieces"], list(r["sym"]))
            for r in viterbi_segment(df, PIECES, max_piece_len=3, impl="jvm").collect()
        }
        arrow = {
            r["word"]: (r["logp_scaled"], r["n_pieces"], list(r["sym"]))
            for r in viterbi_segment(df, PIECES, max_piece_len=3, impl="arrow").collect()
        }
        assert jvm == arrow
        with pytest.raises(ValueError, match="unknown impl"):
            viterbi_segment(df, PIECES, impl="numpy")

    def test_duckdb_mirror_exact(self, spark):
        import duckdb

        words = _rand_words(seed=13) + ["the", "a", "zq"]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        got = {
            r["word"]: (r["logp_scaled"], r["n_pieces"], " ".join(r["sym"]))
            for r in viterbi_segment(df, PIECES, max_piece_len=3).collect()
        }
        frag = viterbi_segment_sql("w", PIECES, 3)
        q = f"""
        WITH words AS (SELECT unnest($words) AS w),
        d AS (SELECT w, {frag['dp']} AS dparr FROM words)
        SELECT w, {frag['score']} AS s, {frag['np']} AS np,
               array_to_string({frag['seg']}, ' ') AS seg
        FROM d
        """
        for w, s, np_, seg in duckdb.sql(q, params={"words": words}).fetchall():
            assert got[w] == (s, np_, seg), w


class TestSeedPieces:
    def test_counts_match_brute_force(self, spark):
        from collections import Counter

        texts = ["aba abab", "abab ba", "cc cc cc"]
        corpus = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        from stepist_spark.operators.bpe import word_frequencies

        wf = word_frequencies(corpus)
        got = {
            r["piece"]: r["cnt"]
            for r in seed_pieces(wf, max_piece_len=3, min_count=2, seed_size=50).collect()
        }
        words = Counter(w for t in texts for w in t.split())
        want: Counter = Counter()
        for w, n in words.items():
            for i in range(len(w)):
                for l in (2, 3):
                    if i + l <= len(w):
                        want[w[i : i + l]] += n
        want = {p: c for p, c in want.items() if c >= 2}
        assert got == want

    def test_seed_size_cap_deterministic(self, spark):
        corpus = spark.createDataFrame(
            [(0, "abcd abcd bcde bcde cdef cdef")], "doc_id long, text string"
        )
        from stepist_spark.operators.bpe import word_frequencies

        wf = word_frequencies(corpus)
        a = [r["piece"] for r in seed_pieces(wf, 3, 1, seed_size=4).collect()]
        b = [r["piece"] for r in seed_pieces(wf, 3, 1, seed_size=4).collect()]
        assert a == b and len(a) == 4


def _train_py(texts, vocab_size, seed_size, max_piece_len, em_iters, prune_keep=0.75, min_count=2):
    """Pure-Python reference of train_unigram: same seeding, same
    Viterbi-EM, same loss-ranked pruning — the parity oracle."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.lower().split())
    chars = Counter()
    for w, n in words.items():
        for c in w:
            chars[c] += n
    subs: Counter = Counter()
    for w, n in words.items():
        for i in range(len(w)):
            for l in range(2, max_piece_len + 1):
                if i + l <= len(w):
                    subs[w[i : i + l]] += n
    seeds = {p: c for p, c in subs.items() if c >= min_count}
    top = sorted(seeds.items(), key=lambda t: (-t[1], t[0]))[:seed_size]
    counts = dict(top)
    for c, n in chars.items():
        counts.setdefault(c, n)

    def scores_of(counts):
        total = sum(counts.values())
        return {
            p: math.floor(math.log(c / total) * LOGP_SCALE)
            for p, c in counts.items()
            if c > 0
        }

    scores = scores_of(counts)

    def em(scores):
        for _ in range(em_iters):
            got: Counter = Counter()
            for w, n in words.items():
                _, _, seg = viterbi_py(w, scores, max_piece_len)
                for p in seg:
                    got[p] += n
            counts = {
                p: got.get(p, 1 if len(p) == 1 else 0)
                for p in scores
                if len(p) == 1 or got.get(p, 0) > 0
            }
            scores = scores_of(counts)
        return scores

    def seg_counts(scores):
        got: Counter = Counter()
        for w, n in words.items():
            _, _, seg = viterbi_py(w, scores, max_piece_len)
            for p in seg:
                got[p] += n
        return got

    scores = em(scores)
    while len(scores) > vocab_size:
        target = max(vocab_size, math.ceil(len(scores) * prune_keep))
        cnts = seg_counts(scores)
        losses = []
        for p, lp in scores.items():
            if len(p) == 1:
                continue
            others = {k: v for k, v in scores.items() if k != p}
            alt, _, _ = viterbi_py(p, others, max_piece_len)
            losses.append((cnts.get(p, 0) * (lp - alt), p))
        losses.sort(key=lambda t: (t[0], t[1]))
        n_char = sum(1 for p in scores if len(p) == 1)
        drop = {p for _, p in losses[: max(0, len(scores) - max(target, n_char))]}
        if not drop:
            break
        scores = {p: lp for p, lp in scores.items() if p not in drop}
        scores = em(scores)
    return scores


class TestTrainUnigram:
    TEXTS = [
        "the theater and the other anthem end",
        "and the thunder ended there anthem rend",
        "tender theaters trend and thereafter",
        "the end of the other theater",
    ]

    def _corpus(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], "doc_id long, text string"
        )

    def test_matches_python_reference_exactly(self, spark):
        got, _ = train_unigram(
            self._corpus(spark), vocab_size=24, seed_size=40,
            max_piece_len=4, em_iters=2,
        )
        want = _train_py(self.TEXTS, 24, 40, 4, 2)
        assert got == want

    def test_chars_never_pruned_and_vocab_bounded(self, spark):
        scores, seg = train_unigram(
            self._corpus(spark), vocab_size=20, seed_size=60,
            max_piece_len=4, em_iters=1,
        )
        chars = {c for t in self.TEXTS for w in t.split() for c in w}
        assert chars <= set(scores)
        assert len(scores) <= max(20, len(chars))
        # the memo frame reassembles and scores every training word
        for r in seg.collect():
            assert "".join(r["sym"]) == r["word"]
            s, k, pieces = viterbi_py(r["word"], scores, 4)
            assert (r["logp_scaled"], r["n_pieces"], list(r["sym"])) == (s, k, pieces)

    def test_deterministic(self, spark):
        a, _ = train_unigram(self._corpus(spark), vocab_size=24, seed_size=40)
        b, _ = train_unigram(self._corpus(spark), vocab_size=24, seed_size=40)
        assert a == b

    def test_prune_keep_validated(self, spark):
        with pytest.raises(ValueError, match="prune_keep"):
            train_unigram(self._corpus(spark), prune_keep=1.5)


class TestGatePieceTable:
    def test_committed_table_is_well_formed(self):
        from stepist_spark.queries.llm_text import (
            UNIGRAM_MAX_PIECE_LEN,
            UNIGRAM_PIECES,
        )

        assert all(
            1 <= len(p) <= UNIGRAM_MAX_PIECE_LEN and lp < 0
            for p, lp in UNIGRAM_PIECES.items()
        )
        # a piece table without its single-char closure could leave a
        # word unsegmentable-without-UNK in gate data; chars present:
        assert sum(1 for p in UNIGRAM_PIECES if len(p) == 1) >= 20
