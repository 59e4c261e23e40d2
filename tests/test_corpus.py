"""Corpus-level operators: vocabulary, salient terms, decontamination."""

from __future__ import annotations

from stepist_spark.operators import corpus as corpus_ops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestVocabulary:
    def test_counts_and_docfreq(self, spark):
        df = _docs(spark, [(1, "a b a"), (2, "a c")])
        got = {r["tok"]: (r["n_occurrences"], r["n_docs"]) for r in
               corpus_ops.vocabulary(df, "doc_id", "text").collect()}
        assert got == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}

    def test_min_count(self, spark):
        df = _docs(spark, [(1, "a b a"), (2, "a c")])
        got = corpus_ops.vocabulary(df, "doc_id", "text", min_count=2).collect()
        assert [r["tok"] for r in got] == ["a"]


class TestSalientTerms:
    def test_rarest_wins_ties(self, spark):
        # doc 1: 'a' and 'b' both tf=2, but 'b' is rarer (df 1 vs 2)
        df = _docs(spark, [(1, "a a b b"), (2, "a x")])
        got = {r["doc_id"]: (r["top_token"], r["tf"], r["df"], r["n_tokens"])
               for r in corpus_ops.salient_terms(df, "doc_id", "text").collect()}
        assert got[1] == ("b", 2, 1, 4)

    def test_token_string_final_tiebreak(self, spark):
        df = _docs(spark, [(1, "z q")])
        got = corpus_ops.salient_terms(df, "doc_id", "text").collect()
        assert got[0]["top_token"] == "q"  # tf/df equal -> lexicographic


class TestDecontamination:
    def test_planted_copy_fully_contaminated(self, spark):
        bench = _docs(spark, [(1, "one two three four five six seven eight nine")])
        corpus = _docs(
            spark,
            [
                (10, "one two three four five six seven eight nine"),  # exact copy
                (11, "totally different words with no overlap at all here now"),
            ],
        )
        got = {r["doc_id"]: (r["n_contaminated"], r["contamination_ratio"]) for r in
               corpus_ops.ngram_contamination(corpus, bench, "doc_id", "text", shingle_k=8).collect()}
        assert got[10] == (2, 1.0)  # 9 tokens -> 2 distinct 8-grams, both hit
        assert got[11] == (0, 0.0)

    def test_short_docs_have_no_shingles(self, spark):
        bench = _docs(spark, [(1, "a b c d e f g h")])
        corpus = _docs(spark, [(10, "too short")])
        assert corpus_ops.ngram_contamination(corpus, bench, "doc_id", "text", 8).count() == 0

    def test_decontaminate_drops_flagged_keeps_short(self, spark):
        """Round 7: the removal step — any shared 8-gram drops the
        whole doc; clean docs and no-shingle (short) docs survive with
        their columns unchanged."""
        bench = _docs(spark, [(1, "one two three four five six seven eight nine")])
        corpus = _docs(
            spark,
            [
                (10, "one two three four five six seven eight nine"),  # copy
                (11, "totally different words with no overlap at all here now"),
                (12, "too short"),  # no 8-gram can exist
            ],
        )
        clean = corpus_ops.decontaminate(corpus, bench, "doc_id", "text", shingle_k=8)
        assert sorted(r["doc_id"] for r in clean.collect()) == [11, 12]
        assert clean.columns == corpus.columns

    def test_decontaminate_max_ratio_threshold(self, spark):
        bench = _docs(spark, [(1, "one two three four five six seven eight")])
        corpus = _docs(
            spark,
            [
                # 1 hit of 3 shingles (ratio 1/3): kept at 0.5, dropped at 0
                (10, "one two three four five six seven eight extra tail words"),
            ],
        )
        kept = corpus_ops.decontaminate(
            corpus, bench, "doc_id", "text", shingle_k=8, max_ratio=0.5
        )
        dropped = corpus_ops.decontaminate(
            corpus, bench, "doc_id", "text", shingle_k=8, max_ratio=0.0
        )
        assert kept.count() == 1 and dropped.count() == 0


class TestBoilerplateLines:
    def _run(self, spark, rows, **kw):
        from stepist_spark.operators.dedup import remove_boilerplate_lines

        df = _docs(spark, rows)
        return {
            r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
            for r in remove_boilerplate_lines(df, "doc_id", "text", **kw).collect()
        }

    def test_frequent_line_dropped_order_preserved(self, spark):
        boiler = "accept all cookies"
        rows = [
            (1, f"alpha one\n{boiler}\nbravo two"),
            (2, f"{boiler}\ncharlie three"),
            (3, f"delta four\n{boiler}"),
            (4, "echo five\nfoxtrot six"),
        ]
        got = self._run(spark, rows, max_doc_freq=2)
        assert got[1] == ("alpha one\nbravo two", 2, 1)
        assert got[2] == ("charlie three", 1, 1)
        assert got[3] == ("delta four", 1, 1)
        assert got[4] == ("echo five\nfoxtrot six", 2, 0)

    def test_all_boiler_doc_survives_empty(self, spark):
        rows = [(i, "same line") for i in range(4)]
        got = self._run(spark, rows, max_doc_freq=2)
        assert got[0] == ("", 0, 1)
        assert set(got) == {0, 1, 2, 3}

    def test_doc_freq_counts_docs_not_occurrences(self, spark):
        # the line repeats 3x inside ONE doc: doc-frequency is 1, kept
        rows = [(1, "x\nx\nx"), (2, "y")]
        got = self._run(spark, rows, max_doc_freq=2)
        assert got[1] == ("x\nx\nx", 3, 0)

    def test_trim_key_but_original_line_kept(self, spark):
        # matching is on the trimmed form; surviving text keeps the raw line
        rows = [(1, "  padded  \nunique a"), (2, "padded\nunique b"), (3, "padded")]
        got = self._run(spark, rows, max_doc_freq=2)
        assert got[1] == ("unique a", 1, 1)
        assert got[2] == ("unique b", 1, 1)

    def test_blank_lines_removed_silently(self, spark):
        rows = [(1, "a\n\n \nb"), (2, "c")]
        got = self._run(spark, rows, max_doc_freq=2)
        assert got[1] == ("a\nb", 2, 0)


class TestBloomPrefilterPath:
    def test_scale_path_equals_broadcast_path(self, spark):
        """broadcast_benchmark=False (bloom pre-filter + shuffle
        verify) must return exactly the broadcast path's rows."""
        from stepist_spark.operators.corpus import ngram_contamination
        from stepist_spark.session import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id", "text"
        )
        bench = docs.filter(F.col("doc_id") % 40 == 0)
        corpus = docs.filter(F.col("doc_id") % 40 != 0).unionByName(
            bench.select((F.col("doc_id") + 900000).alias("doc_id"), "text")
        )
        kw = dict(id_col="doc_id", text_col="text", shingle_k=8)
        exact = ngram_contamination(corpus, bench, **kw).collect()
        scale = ngram_contamination(
            corpus, bench, broadcast_benchmark=False, bloom_m_bits=1 << 14, **kw
        ).collect()
        key = lambda r: (r.doc_id, r.n_shingles, r.n_contaminated)
        assert sorted(map(key, exact)) == sorted(map(key, scale))
        assert any(r.n_contaminated > 0 for r in exact)


def test_salient_terms_shuffle_join_path(spark):
    """broadcast_df=False (open-vocabulary scale path) must return the
    broadcast path's rows exactly."""
    from stepist_spark.operators.corpus import salient_terms
    from stepist_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    key = lambda r: (r.doc_id, r.top_token, r.tf, r.df, r.n_tokens)
    a = sorted(map(key, salient_terms(docs, "doc_id", "text").collect()))
    b = sorted(
        map(key, salient_terms(docs, "doc_id", "text", broadcast_df=False).collect())
    )
    assert a == b and a


class TestDistributionShift:
    def test_identical_groups_near_zero(self, spark):
        from stepist_spark.operators.corpus import distribution_shift

        docs = spark.createDataFrame(
            [(1, "x y z x", "a"), (2, "x y z x", "b")],
            "doc_id bigint, text string, source string",
        )
        out = {r["grp"]: r for r in distribution_shift(docs, "doc_id", "text", "source").collect()}
        # same distribution both sides: every log-ratio is ~0, and the
        # floor() makes each scaled term <= 0, so kl is a small negative
        for r in out.values():
            assert abs(r["kl"]) < 0.01
            assert r["n_tokens"] == 4 and r["vocab_v"] == 3

    def test_disjoint_vocab_is_larger(self, spark):
        from stepist_spark.operators.corpus import distribution_shift

        docs = spark.createDataFrame(
            [(1, "x x x x", "a"), (2, "y y y y", "b"), (3, "x y", "b")],
            "doc_id bigint, text string, source string",
        )
        out = {r["grp"]: r["kl"] for r in distribution_shift(docs, "doc_id", "text", "source").collect()}
        assert out["a"] > 0.3  # concentrated on a token the rest lacks

    def test_from_counts_matches_text_path(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.functions.text import tokens
        from stepist_spark.operators.corpus import (
            distribution_shift,
            distribution_shift_from_counts,
        )

        docs = spark.createDataFrame(
            [(1, "p q r p", "a"), (2, "q r s", "b"), (3, "p p s", "a")],
            "doc_id bigint, text string, source string",
        )
        direct = sorted(
            map(tuple, distribution_shift(docs, "doc_id", "text", "source").collect())
        )
        gt = (
            docs.select(F.col("source").alias("grp"), F.explode(tokens(F.col("text"))).alias("tok"))
            .groupBy("grp", "tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        via_counts = sorted(
            map(tuple, distribution_shift_from_counts(gt).collect())
        )
        assert direct == via_counts and direct


class TestPmiCollocations:
    def test_planted_collocation_vs_reference(self, spark):
        import math

        from stepist_spark.operators.corpus import pmi_collocations

        # "new york" always adjacent; "the" everywhere -> low PMI
        docs = [
            ("the cat sat in new york",),
            ("new york is the place",),
            ("the dog sat on the mat",),
            ("they moved to new york",),
        ]
        df = spark.createDataFrame(docs, "text string")
        rows = pmi_collocations(df, "text", min_pair_count=2, top_k=5).collect()
        top = rows[0]
        assert (top["a"], top["b"]) == ("new", "york")
        # python reference on the same tokenization (lowercase words)
        toks = [d[0].split() for d in docs]
        uni: dict = {}
        bi: dict = {}
        for tk in toks:
            for t in tk:
                uni[t] = uni.get(t, 0) + 1
            for x, y in zip(tk, tk[1:]):
                bi[(x, y)] = bi.get((x, y), 0) + 1
        n_uni = sum(uni.values())
        n_bi = sum(bi.values())
        c_ab = bi[("new", "york")]
        exp = math.floor(
            math.log((c_ab * n_uni * n_uni) / (n_bi * uni["new"] * uni["york"]))
            * 1_000_000
        )
        assert top["pmi_scaled"] == exp
        assert top["c_ab"] == c_ab and top["c_a"] == uni["new"]

    def test_min_pair_count_filters(self, spark):
        from stepist_spark.operators.corpus import pmi_collocations

        df = spark.createDataFrame(
            [("alpha beta",), ("alpha beta",), ("gamma delta",)], "text string"
        )
        rows = pmi_collocations(df, "text", min_pair_count=2, top_k=10).collect()
        pairs = {(r["a"], r["b"]) for r in rows}
        assert ("alpha", "beta") in pairs
        assert ("gamma", "delta") not in pairs

    def test_single_token_docs_no_bigrams(self, spark):
        from stepist_spark.operators.corpus import pmi_collocations

        df = spark.createDataFrame([("solo",), ("word pair",)], "text string")
        rows = pmi_collocations(df, "text", min_pair_count=1, top_k=10).collect()
        assert {(r["a"], r["b"]) for r in rows} == {("word", "pair")}


class TestVocabularyRichness:
    def test_hand_computed(self, spark):
        # tokens: a×3, b×2, c×1, d×1 -> N=7, V=4, f1=2, f2=1
        df = _docs(spark, [(1, "a a a b b c"), (2, "d")])
        got = corpus_ops.vocabulary_richness(df).collect()[0]
        assert (got.n_tokens, got.n_types, got.f1, got.f2) == (7, 4, 2, 1)
        # chao1 = V + f1^2/(2 f2) = 4 + 4/2 = 6
        assert got.chao1_scaled == 6_000_000
        assert got.p0 == round(2 / 7, 6)

    def test_no_doubletons_bias_corrected(self, spark):
        # a×3, b×1, c×1: f2=0 -> chao1 = V + f1(f1-1)/2 = 3 + 1 = 4
        df = _docs(spark, [(1, "a a a b c")])
        got = corpus_ops.vocabulary_richness(df).collect()[0]
        assert got.f2 == 0 and got.chao1_scaled == 4_000_000

    def test_counts_reuse_matches_direct(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.functions import text as TX

        df = _docs(spark, [(1, "x y x z"), (2, "y w")])
        tc = (
            df.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        direct = corpus_ops.vocabulary_richness(df).collect()
        reused = corpus_ops.vocabulary_richness(token_counts=tc).collect()
        assert sorted(map(tuple, direct)) == sorted(map(tuple, reused))

    def test_empty_corpus(self, spark):
        df = _docs(spark, [])
        assert corpus_ops.vocabulary_richness(df).count() == 0

    def test_duckdb_mirror(self, spark):
        import duckdb

        from stepist_spark.operators.corpus import vocabulary_richness_sql

        rows = [(1, "a a a b b c"), (2, "d e e f")]
        df = _docs(spark, rows)
        got = sorted(map(tuple, corpus_ops.vocabulary_richness(df).collect()))
        vals = ", ".join(f"({i}, '{t}')" for i, t in rows)
        duck = sorted(
            tuple(r)
            for r in duckdb.sql(
                vocabulary_richness_sql(
                    f"SELECT * FROM (VALUES {vals}) t(doc_id, text)"
                )
            ).fetchall()
        )
        assert got == duck


class TestNfcNormalize:
    def test_decomposed_composes(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.functions.text import nfc_normalize

        decomposed = "cafe\u0301"          # e + combining acute
        composed = "caf\u00e9"             # precomposed
        rows = [(1, decomposed), (2, "plain ascii"), (3, None), (4, composed)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r.doc_id: r.n
            for r in df.select(
                "doc_id", nfc_normalize(F.col("text")).alias("n")
            ).collect()
        }
        assert got[1] == composed           # composes
        assert got[2] == "plain ascii"
        assert got[3] is None
        assert got[4] == composed           # already NFC: unchanged

    def test_matches_duckdb(self, spark):
        import duckdb
        from pyspark.sql import functions as F

        from stepist_spark.functions.text import nfc_normalize, nfc_normalize_sql

        texts = [
            "cafe\u0301 de\u0301ja\u0300",   # decomposed accents
            "a\u030a ring",                     # a + combining ring
            "ascii only",
            "caf\u00e9 already composed",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = sorted(
            r.n
            for r in df.select(nfc_normalize(F.col("text")).alias("n")).collect()
        )
        vals = ", ".join("('" + t + "')" for t in texts)
        duck = sorted(
            r[0]
            for r in duckdb.sql(
                f"SELECT {nfc_normalize_sql('text')} FROM (VALUES {vals}) t(text)"
            ).fetchall()
        )
        assert got == duck


class TestJsShift:
    def _gt(self, spark, rows):
        return spark.createDataFrame(rows, "grp string, tok string, c bigint")

    def test_matches_python_reference(self, spark):
        import math

        from stepist_spark.operators.corpus import js_shift_from_counts

        rows = [
            ("a", "x", 5), ("a", "y", 3), ("a", "z", 1),
            ("b", "x", 2), ("b", "y", 6), ("b", "w", 4),
        ]
        out = {r["grp"]: r for r in js_shift_from_counts(self._gt(spark, rows)).collect()}
        vocab = {"x", "y", "z", "w"}
        tot = {}
        for g, t, c in rows:
            tot[t] = tot.get(t, 0) + c
        for grp in ("a", "b"):
            mine = {t: c for g, t, c in rows if g == grp}
            n_p = sum(mine.values())
            n_all = sum(tot.values())
            v = len(vocab)
            dp, dq = n_p + v, (n_all - n_p) + v
            sp = sq = 0
            for t in sorted(vocab):
                a = mine.get(t, 0) + 1
                b = (tot[t] - mine.get(t, 0)) + 1
                mix = a * dq + b * dp
                sp += math.floor(math.log(2 * a * dq / mix) * 1e6) * a
                sq += math.floor(math.log(2 * b * dp / mix) * 1e6) * b
            r = out[grp]
            assert (r["n_tokens"], r["vocab_v"]) == (n_p, v)
            assert (r["js_p_scaled"], r["js_q_scaled"]) == (sp, sq)
            assert r["js_scaled"] == math.floor((sp / dp + sq / dq) / 2.0)
            # JS is bounded by ln 2 and (here) strictly positive
            assert 0 < r["js"] < math.log(2) + 1e-6

    def test_symmetry_two_groups(self, spark):
        # with exactly two groups, p-vs-rest and q-vs-rest are the SAME
        # comparison from opposite sides: js must match
        from stepist_spark.operators.corpus import js_shift_from_counts

        rows = [("a", "x", 9), ("a", "y", 1), ("b", "x", 1), ("b", "y", 9)]
        out = {r["grp"]: r for r in js_shift_from_counts(self._gt(spark, rows)).collect()}
        assert out["a"]["js_scaled"] == out["b"]["js_scaled"]

    def test_identical_groups_near_zero(self, spark):
        from stepist_spark.operators.corpus import js_shift_from_counts

        rows = [("a", "x", 5), ("a", "y", 5), ("b", "x", 5), ("b", "y", 5)]
        out = js_shift_from_counts(self._gt(spark, rows)).collect()
        for r in out:
            assert abs(r["js"]) < 1e-4

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.corpus import js_shift_from_counts, js_shift_sql
        from stepist_spark.functions.text import tokens as _tokens

        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(i, f"src{i % 3}", "alpha beta " + ("gamma " * (i % 4)) + f"tok{i % 7}")
             for i in range(60)],
            "doc_id bigint, source string, text string",
        )
        p = str(tmp_path / "jsdocs.parquet")
        docs.write.parquet(p)
        gt = docs.select(
            F.col("source").alias("grp"), F.explode(_tokens(F.col("text"))).alias("tok")
        ).groupBy("grp", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        got = sorted(tuple(r) for r in js_shift_from_counts(gt, min_count=2).collect())
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                js_shift_sql(f"(SELECT * FROM '{p}/*.parquet')", "text", "source", 2)
            ).fetchall()
        )
        assert got == want


class TestZipfSlope:
    def test_perfect_zipf_slope(self, spark):
        # counts c_r = round(C / r) follow slope ~ -1 on log-log
        from stepist_spark.operators.corpus import zipf_slope

        rows = [(f"t{r}", max(1, round(100000 / r))) for r in range(1, 200)]
        df = spark.createDataFrame(rows, "tok string, n_occurrences bigint")
        r = zipf_slope(df).collect()[0]
        assert r["n_vocab"] == 199
        assert abs(r["slope"] + 1.0) < 0.01
        assert r["r2"] > 0.999

    def test_matches_python_reference(self, spark):
        import math

        from stepist_spark.operators.corpus import zipf_slope

        rows = [("a", 50), ("b", 20), ("c", 20), ("d", 5), ("e", 1)]
        df = spark.createDataFrame(rows, "tok string, n_occurrences bigint")
        r = zipf_slope(df).collect()[0]
        # rank order: count desc, token asc -> a,b,c,d,e
        xs = [math.floor(math.log(i + 1) * 1e6) for i in range(5)]
        ys = [math.floor(math.log(c) * 1e6) for _, c in rows]
        n = 5
        sx, sy = sum(xs), sum(ys)
        covn = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
        varxn = n * sum(x * x for x in xs) - sx * sx
        varyn = n * sum(y * y for y in ys) - sy * sy
        assert r["slope_scaled"] == math.floor(covn / varxn * 1e6)
        assert r["r2_scaled"] == math.floor(covn * covn / (varxn * varyn) * 1e6)

    def test_degenerate_single_token(self, spark):
        from stepist_spark.operators.corpus import zipf_slope

        df = spark.createDataFrame([("a", 10)], "tok string, n_occurrences bigint")
        r = zipf_slope(df).collect()[0]
        assert r["slope"] is None and r["r2"] is None and r["n_vocab"] == 1

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.corpus import zipf_slope, zipf_slope_sql

        rows = [(f"w{i}", 1 + (i * 13) % 97) for i in range(300)]
        df = spark.createDataFrame(rows, "tok string, n_occurrences bigint")
        p = str(tmp_path / "zipf.parquet")
        df.write.parquet(p)
        got = [tuple(r) for r in zipf_slope(df).collect()]
        con = duckdb.connect()
        want = con.execute(
            zipf_slope_sql(f"SELECT * FROM '{p}/*.parquet'")
        ).fetchall()
        assert got == want


class TestHeapsFit:
    def _postings(self, spark, docs):
        from stepist_spark.operators.ranking import doc_postings

        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        return doc_postings(df, "doc_id", "text")

    def test_matches_python_reference(self, spark):
        import math

        from stepist_spark.operators.corpus import heaps_fit

        docs = [
            (1, "a b c"),
            (2, "a b d d"),
            (3, "e"),
            (4, "a e f g"),
        ]
        r = heaps_fit(self._postings(spark, docs)).collect()[0]
        # cumulative (N, V) in doc order
        seen, N, pts = set(), 0, []
        for _, text in docs:
            toks = text.split()
            N += len(toks)
            seen |= set(toks)
            pts.append((N, len(seen)))
        xs = [math.floor(math.log(n) * 1e6) for n, _ in pts]
        ys = [math.floor(math.log(v) * 1e6) for _, v in pts]
        k = len(pts)
        sx, sy = sum(xs), sum(ys)
        covn = k * sum(x * y for x, y in zip(xs, ys)) - sx * sy
        varxn = k * sum(x * x for x in xs) - sx * sx
        assert r["n_docs"] == k
        assert r["slope_scaled"] == math.floor(covn / varxn * 1e6)

    def test_sublinear_growth_beta_below_one(self, spark):
        from stepist_spark.operators.corpus import heaps_fit

        # heavy token reuse -> vocabulary saturates -> beta well under 1
        docs = [(i, "common filler tokens every doc " + f"new{i % 7}") for i in range(1, 60)]
        r = heaps_fit(self._postings(spark, docs)).collect()[0]
        assert 0 < r["slope"] < 0.6

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.corpus import heaps_fit, heaps_fit_sql

        docs = [
            (i, " ".join(f"t{(i * j) % 23}" for j in range(1, 1 + i % 6)))
            for i in range(1, 120)
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        p = str(tmp_path / "heaps.parquet")
        df.write.parquet(p)
        got = [tuple(r) for r in heaps_fit(self._postings(spark, docs)).collect()]
        con = duckdb.connect()
        want = con.execute(
            heaps_fit_sql(f"(SELECT * FROM '{p}/*.parquet')", "doc_id", "text")
        ).fetchall()
        assert got == want


class TestCoverageCurve:
    def test_known_masses(self, spark):
        from stepist_spark.operators.corpus import coverage_curve

        rows = [("a", 50), ("b", 30), ("c", 15), ("d", 5)]
        df = spark.createDataFrame(rows, "tok string, exact bigint")
        out = {r["k"]: r for r in coverage_curve(df, ks=(1, 2, 10)).collect()}
        assert (out[1]["covered"], out[1]["total"]) == (50, 100)
        assert out[2]["covered"] == 80
        # k beyond the vocabulary clamps to full coverage
        assert (out[10]["k_effective"], out[10]["covered"]) == (4, 100)
        assert out[10]["coverage"] == 1.0

    def test_tie_break_deterministic(self, spark):
        from stepist_spark.operators.corpus import coverage_curve

        # equal counts: rank order falls back to token asc
        rows = [("z", 10), ("a", 10), ("m", 10)]
        df = spark.createDataFrame(rows, "tok string, exact bigint")
        out = {r["k"]: r for r in coverage_curve(df, ks=(1, 2)).collect()}
        assert out[1]["covered"] == 10 and out[2]["covered"] == 20

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb

        from stepist_spark.operators.corpus import coverage_curve, coverage_curve_sql

        rows = [(f"w{i}", 1 + (i * 31) % 113) for i in range(500)]
        df = spark.createDataFrame(rows, "tok string, exact bigint")
        p = str(tmp_path / "cov.parquet")
        df.write.parquet(p)
        got = sorted(tuple(r) for r in coverage_curve(df, ks=(10, 100, 1000)).collect())
        con = duckdb.connect()
        want = sorted(
            tuple(r)
            for r in con.execute(
                coverage_curve_sql(f"SELECT * FROM '{p}/*.parquet'", ks=(10, 100, 1000))
            ).fetchall()
        )
        assert got == want


class TestLogOdds:
    def _gt(self, spark, rows):
        return spark.createDataFrame(rows, "grp string, tok string, c bigint")

    ROWS = [
        ("a", "x", 9), ("a", "y", 3), ("a", "z", 1),
        ("b", "x", 2), ("b", "y", 6), ("b", "w", 5),
    ]

    def _ref(self, rows):
        import math

        tot, mine = {}, {}
        for g, t, c in rows:
            tot[t] = tot.get(t, 0) + c
            mine.setdefault(g, {})[t] = c
        n_all = sum(tot.values())
        v = len(tot)
        out = {}
        for g, m in mine.items():
            n_p = sum(m.values())
            for t, c in m.items():
                a, b = c + 1, (tot[t] - c) + 1
                di, dj = n_p + v - a, (n_all - n_p) + v - b
                if di <= 0 or dj <= 0:
                    continue
                delta = math.log((a * dj) / (b * di))
                z = delta / math.sqrt(1.0 / a + 1.0 / b)
                out[(g, t)] = (
                    math.floor(delta * 1e6),
                    math.floor(z * 1e6),
                )
        return out

    def test_matches_python_reference(self, spark):
        from stepist_spark.operators.corpus import log_odds_tokens

        got = {
            (r["grp"], r["tok"]): (r["delta_scaled"], r["z_scaled"])
            for r in log_odds_tokens(self._gt(spark, self.ROWS), k=10).collect()
        }
        assert got == self._ref(self.ROWS)

    def test_over_represented_token_tops_the_list(self, spark):
        from stepist_spark.operators.corpus import log_odds_tokens

        out = log_odds_tokens(self._gt(spark, self.ROWS), k=1).collect()
        top = {r["grp"]: r["tok"] for r in out}
        assert top["a"] == "x"  # 9-vs-2: a's most characteristic token
        assert top["b"] == "w"  # b-exclusive token
        assert all(r["rank"] == 1 for r in out)

    def test_topk_boundary_deterministic(self, spark):
        from stepist_spark.operators.corpus import log_odds_tokens

        # two tokens with IDENTICAL counts in the same group: the tok
        # tiebreak must cut the k-boundary alphabetically
        rows = [("a", "m", 4), ("a", "n", 4), ("b", "q", 4)]
        out = [
            r["tok"]
            for r in log_odds_tokens(self._gt(spark, rows), k=1).collect()
            if r["grp"] == "a"
        ]
        assert out == ["m"]

    def test_matches_duckdb_mirror(self, spark, tmp_path):
        import duckdb
        from pyspark.sql import functions as F

        from stepist_spark.functions.text import tokens as tx_tokens
        from stepist_spark.operators.corpus import log_odds_sql, log_odds_tokens

        docs = spark.createDataFrame(
            [
                (1, "s1", "alpha beta beta gamma"),
                (2, "s1", "alpha alpha delta"),
                (3, "s2", "beta gamma gamma gamma"),
                (4, "s2", "delta delta epsilon alpha"),
                (5, "s3", "zeta zeta zeta alpha beta"),
            ],
            "doc_id long, source string, text string",
        )
        p = str(tmp_path / "lodds.parquet")
        docs.write.parquet(p)
        gt = (
            docs.select("source", F.explode(tx_tokens(F.col("text"))).alias("tok"))
            .groupBy(F.col("source").alias("grp"), "tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        got = sorted(tuple(r) for r in log_odds_tokens(gt, k=3).collect())
        con = duckdb.connect()
        want = sorted(
            con.execute(
                log_odds_sql(f"(SELECT * FROM '{p}/*.parquet')", "text", "source", k=3)
            ).fetchall()
        )
        assert got == want
