"""Prefix-filtered exact set-similarity join vs brute force."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from stepist_spark.operators.dedup import set_similarity_join

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def _brute(texts, t_num, t_den):
    """All-pairs exact Jaccard >= t over lowercased whitespace tokens."""
    sets = [frozenset(t.lower().split()) for t in texts]
    out = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            if not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if inter * t_den >= union * t_num:
                out[(i, j)] = Fraction(inter, union)
    return out


def _run(spark, texts, t_num=1, t_den=2):
    rows = set_similarity_join(
        _docs(spark, texts), "doc_id", "text", t_num, t_den
    ).collect()
    return {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in rows
    }


class TestSetSimilarityJoin:
    def test_simple_pairs(self, spark):
        texts = [
            "the quick brown fox",
            "the quick brown wolf",   # J = 3/5 with 0
            "something else entirely",
            "the quick brown fox",    # identical to 0
        ]
        got = _run(spark, texts, 1, 2)
        assert set(got) == {(0, 1), (0, 3), (1, 3)}
        assert got[(0, 3)] == 1.0
        assert abs(got[(0, 1)] - 3 / 5) < 1e-12

    def test_no_false_negatives_vs_lsh_blind_spot(self, spark):
        # two docs sharing exactly half their tokens: always found
        texts = ["a b c d", "c d e f"]
        assert set(_run(spark, texts, 1, 3)) == {(0, 1)}  # J=1/3 >= 1/3

    def test_threshold_one_means_identical_sets(self, spark):
        texts = ["x y z", "z y x", "x y w"]
        got = _run(spark, texts, 1, 1)
        assert set(got) == {(0, 1)}

    def test_empty_docs_ignored(self, spark):
        got = _run(spark, ["", "   ", "a b", "a b"])
        assert set(got) == {(2, 3)}

    def test_invalid_threshold(self, spark):
        try:
            set_similarity_join(_docs(spark, ["a"]), "doc_id", "text", 3, 2)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    @settings(max_examples=12, deadline=None)
    @given(
        texts=st.lists(
            st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(" ".join),
            min_size=2,
            max_size=12,
        ),
        thresh=st.sampled_from([(1, 3), (1, 2), (2, 3), (3, 4)]),
    )
    def test_matches_brute_force(self, spark, texts, thresh):
        t_num, t_den = thresh
        got = _run(spark, texts, t_num, t_den)
        want = _brute(texts, t_num, t_den)
        assert set(got) == set(want)
        for k, v in want.items():
            assert abs(got[k] - float(v)) < 1e-12


class TestContainmentPairs:
    def test_asymmetric_quote_detection(self, spark):
        from stepist_spark.operators.dedup import containment_pairs

        docs = _docs(spark, ["alpha beta gamma delta", "alpha beta", "zeta eta"])
        cands = spark.createDataFrame(
            [(0, 1), (0, 2)], "id_a bigint, id_b bigint"
        )
        got = {
            (r["id_a"], r["id_b"]): (r["contain_a_in_b"], r["contain_b_in_a"])
            for r in containment_pairs(docs, cands, "doc_id", "text").collect()
        }
        # doc 1 is fully quoted inside doc 0: containment 1.0 one way,
        # 0.5 the other; disjoint pair scores 0 both ways
        assert got[(0, 1)] == (2 / 4, 1.0)
        assert got[(0, 2)] == (0.0, 0.0)

    @given(
        st.lists(
            st.lists(st.sampled_from(WORDS), min_size=1, max_size=6).map(" ".join),
            min_size=2,
            max_size=8,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_python_reference(self, spark, texts):
        from stepist_spark.operators.dedup import containment_pairs

        cands = [(a, b) for a in range(len(texts)) for b in range(a + 1, len(texts))]
        cdf = spark.createDataFrame(cands, "id_a bigint, id_b bigint")
        got = {
            (r["id_a"], r["id_b"]): (r["contain_a_in_b"], r["contain_b_in_a"])
            for r in containment_pairs(
                _docs(spark, texts), cdf, "doc_id", "text"
            ).collect()
        }
        sets = [frozenset(t.lower().split()) for t in texts]
        for a, b in cands:
            inter = len(sets[a] & sets[b])
            exp = (
                inter / len(sets[a]) if sets[a] else 0.0,
                inter / len(sets[b]) if sets[b] else 0.0,
            )
            assert got[(a, b)] == exp
