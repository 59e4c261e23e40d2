"""q-gram-blocked exact edit-distance join vs brute force."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from stepist_spark.operators.dedup import edit_distance_join


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(strs, d):
    out = {}
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            dist = _lev(strs[i], strs[j])
            if dist <= d:
                out[(i, j)] = dist
    return out


def _run(spark, strs, d, q=3):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "id bigint, name string"
    )
    rows = edit_distance_join(df, "id", "name", max_dist=d, q=q).collect()
    return {(r["id_a"], r["id_b"]): r["dist"] for r in rows}


class TestEditDistanceJoin:
    def test_simple(self, spark):
        strs = ["quantify", "quantify", "quantile", "different"]
        got = _run(spark, strs, 2)
        assert got == {(0, 1): 0, (0, 2): 2, (1, 2): 2}

    def test_short_strings_use_length_buckets(self, spark):
        # all shorter than q*(d+1): zero shared q-grams possible
        strs = ["ab", "ac", "b", "xyz"]
        got = _run(spark, strs, 1)
        assert got == {(0, 1): 1, (0, 2): 1}  # "ac"->"b" is distance 2

    def test_short_long_boundary_pair(self, spark):
        # len 5 (< q*(d+1)=6) vs len 6 (>= 6) at distance 1 — the pair
        # that only the widened length-bucket emission can find
        strs = ["abcde", "abcdef"]
        assert _run(spark, strs, 1) == {(0, 1): 1}

    def test_exact_zero_distance(self, spark):
        strs = ["hello world", "hello world", "hello weird"]
        got = _run(spark, strs, 0)
        assert got == {(0, 1): 0}

    @settings(max_examples=10, deadline=None)
    @given(
        strs=st.lists(st.text(alphabet="abc", min_size=0, max_size=10), min_size=2, max_size=10),
        d=st.sampled_from([0, 1, 2]),
    )
    def test_matches_brute_force(self, spark, strs, d):
        got = _run(spark, strs, d)
        assert got == _brute(strs, d)
