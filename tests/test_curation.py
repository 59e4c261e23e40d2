"""Corpus-curation extras: PII redaction (JVM regex scrub) and
deterministic temperature resampling across groups."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from stepist_spark.functions.text import pii_counts, redact_pii
from stepist_spark.operators.sampling import mixture_resample, temperature_resample


def _one(spark, text):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            redact_pii(F.col("text")).alias("red"),
            pii_counts(F.col("text")).alias("cnt"),
        )
        .first()
    )
    return row["red"], row["cnt"].asDict()


class TestPiiRedaction:
    def test_email(self, spark):
        red, cnt = _one(spark, "contact bob.smith+x@example.co.uk today")
        assert red == "contact [EMAIL] today"
        assert cnt == {"email": 1, "ipv4": 0, "phone": 0}

    def test_ipv4(self, spark):
        red, cnt = _one(spark, "served from 192.168.001.1 ok")
        assert red == "served from [IPV4] ok"
        assert cnt["ipv4"] == 1

    def test_phone(self, spark):
        red, cnt = _one(spark, "call +1 (555) 867-5309 now")
        assert "[PHONE]" in red and "5309" not in red
        assert cnt["phone"] == 1

    def test_email_wins_over_phone_digits(self, spark):
        # digits inside an email local part must not double-count
        red, cnt = _one(spark, "mail 555-867-5309@relay.example.com please")
        assert red == "mail [EMAIL] please"
        assert cnt == {"email": 1, "ipv4": 0, "phone": 0}

    def test_clean_text_untouched(self, spark):
        text = "no sensitive content here, just words and 42 numbers"
        red, cnt = _one(spark, text)
        assert red == text
        assert cnt == {"email": 0, "ipv4": 0, "phone": 0}

    def test_kinds_subset(self, spark):
        df = spark.createDataFrame([("a@b.co and 10.0.0.1",)], "text string")
        red = df.select(redact_pii(F.col("text"), kinds=("ipv4",)).alias("r")).first()["r"]
        assert red == "a@b.co and [IPV4]"


class TestTemperatureResample:
    def _df(self, spark, sizes):
        rows = []
        i = 0
        for g, n in sizes.items():
            for _ in range(n):
                rows.append((i, g))
                i += 1
        return spark.createDataFrame(rows, "id bigint, grp string")

    def test_alpha_one_keeps_everything(self, spark):
        df = self._df(spark, {"a": 400, "b": 50})
        assert temperature_resample(df, "grp", "id", alpha=1.0).count() == 450

    def test_smallest_group_always_complete(self, spark):
        df = self._df(spark, {"big": 800, "small": 40})
        got = temperature_resample(df, "grp", "id", alpha=0.3)
        per = {r["grp"]: r["n"] for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        assert per["small"] == 40

    def test_kept_volume_tracks_alpha_power_law(self, spark):
        sizes = {"big": 3200, "small": 200}
        df = self._df(spark, sizes)
        got = temperature_resample(df, "grp", "id", alpha=0.5)
        per = {r["grp"]: r["n"] for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        # expected big-group rate = (3200/200)^-0.5 = 0.25
        expect = sizes["big"] * (sizes["big"] / sizes["small"]) ** -0.5
        assert math.isclose(per["big"], expect, rel_tol=0.15), (per, expect)

    def test_deterministic_across_runs_and_layouts(self, spark):
        df = self._df(spark, {"a": 500, "b": 100})
        a = {r["id"] for r in temperature_resample(df, "grp", "id", 0.5).collect()}
        b = {
            r["id"]
            for r in temperature_resample(df.repartition(13), "grp", "id", 0.5).collect()
        }
        assert a == b


class TestMixtureResample:
    def _df(self, spark, sizes):
        rows = []
        i = 0
        for g, n in sizes.items():
            for _ in range(n):
                rows.append((i, g))
                i += 1
        return spark.createDataFrame(rows, "id bigint, grp string")

    def test_kept_volume_matches_targets(self, spark):
        df = self._df(spark, {"a": 2000, "b": 1000, "c": 500})
        got = mixture_resample(df, "grp", "id", {"a": 0.5, "b": 0.25, "c": 0.25})
        per = {r["grp"]: r["n"] for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()}
        # binding group: c (500/0.25 = 2000 = scale); expected kept:
        # a = 1000, b = 500, c = 500
        assert per["c"] == 500  # binding group keeps everything
        assert math.isclose(per["a"], 1000, rel_tol=0.12), per
        assert math.isclose(per["b"], 500, rel_tol=0.12), per

    def test_untargeted_group_dropped(self, spark):
        df = self._df(spark, {"a": 300, "b": 300, "junk": 300})
        got = mixture_resample(df, "grp", "id", {"a": 0.5, "b": 0.5})
        assert got.filter(F.col("grp") == "junk").count() == 0

    def test_deterministic_across_layouts(self, spark):
        df = self._df(spark, {"a": 600, "b": 300})
        t = {"a": 0.6, "b": 0.4}
        x = {r["id"] for r in mixture_resample(df, "grp", "id", t).collect()}
        y = {r["id"] for r in mixture_resample(df.repartition(17), "grp", "id", t).collect()}
        assert x == y

    def test_duckdb_mirror_parity(self, spark):
        import duckdb

        from stepist_spark.operators.sampling import mixture_resample_sql

        df = self._df(spark, {"a": 700, "b": 250, "c": 100})
        t = {"a": 0.5, "b": 0.3, "c": 0.2}
        got = sorted(r["id"] for r in mixture_resample(df, "grp", "id", t).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (id BIGINT, grp VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)",
                        [(r.id, r.grp) for r in df.collect()])
        sql = mixture_resample_sql("docs", "grp", "id", t, select_cols="id")
        exp = sorted(r[0] for r in con.execute(sql).fetchall())
        assert got == exp


class TestDeterministicShuffle:
    def test_rank_is_dense_permutation(self, spark):
        from stepist_spark.operators.sampling import deterministic_shuffle

        df = spark.range(500).withColumnRenamed("id", "doc_id")
        got = deterministic_shuffle(df, "doc_id", seed="s1")
        ranks = sorted(r["shuffle_rank"] for r in got.collect())
        assert ranks == list(range(1, 501))

    def test_layout_independent_and_seed_sensitive(self, spark):
        from stepist_spark.operators.sampling import deterministic_shuffle

        df = spark.range(400).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["shuffle_rank"] for r in deterministic_shuffle(df, "doc_id", "s1").collect()}
        b = {
            r["doc_id"]: r["shuffle_rank"]
            for r in deterministic_shuffle(df.repartition(7), "doc_id", "s1", num_partitions=3).collect()
        }
        c = {r["doc_id"]: r["shuffle_rank"] for r in deterministic_shuffle(df, "doc_id", "s2").collect()}
        assert a == b  # same seed: same permutation, any layout
        assert a != c  # different seed: different permutation

    def test_no_single_partition_sort_in_plan(self, spark):
        from stepist_spark.operators.sampling import deterministic_shuffle

        df = spark.range(100).withColumnRenamed("id", "doc_id")
        plan = deterministic_shuffle(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
        # the corpus-wide exchange must be range (parallel sort), never
        # a SinglePartition gather of the data itself
        assert "rangepartitioning" in plan.lower(), plan


class TestRepetitionSignals:
    def _sig(self, spark, text):
        from stepist_spark.functions.text import repetition_signals, tokens

        row = (
            spark.createDataFrame([(text,)], "text string")
            # bind tokens to a real column first (interpreted HOF lambdas
            # re-evaluate non-attribute expressions per reference)
            .withColumn("toks", tokens(F.col("text")))
            .select(repetition_signals(F.col("text"), F.col("toks")).alias("s"))
            .first()
        )
        return row["s"].asDict()

    def test_duplicate_lines(self, spark):
        s = self._sig(spark, "alpha\nalpha\nbeta")
        assert s["dup_line_frac"] == pytest.approx(1 / 3)
        # both 'alpha' lines (5 chars each) are dup chars of 14 total
        assert s["dup_line_char_frac"] == pytest.approx(10 / 14)

    def test_blank_lines_ignored_and_trimmed(self, spark):
        s = self._sig(spark, "  x \n\n   \nx\ny")
        assert s["dup_line_frac"] == pytest.approx(1 / 3)
        assert s["dup_line_char_frac"] == pytest.approx(2 / 3)

    def test_top_bigram_share(self, spark):
        # tokens [x y x y x] -> grams [x y, y x, x y, y x] -> max 2 of 4
        s = self._sig(spark, "x y x y x")
        assert s["top_bigram_share"] == pytest.approx(0.5)

    def test_no_repetition(self, spark):
        s = self._sig(spark, "all words here are fully distinct lines")
        assert s["dup_line_frac"] == 0.0
        assert s["dup_line_char_frac"] == 0.0
        assert s["top_bigram_share"] == pytest.approx(1 / 6)

    def test_empty_and_single_token(self, spark):
        for text in ("", "   \n  ", "solo"):
            s = self._sig(spark, text)
            assert s["dup_line_char_frac"] == 0.0
            assert s["top_bigram_share"] == 0.0

    def test_template_spam_scores_high(self, spark):
        spam = "\n".join(["buy cheap widgets now"] * 9 + ["one real sentence"])
        s = self._sig(spark, spam)
        assert s["dup_line_frac"] == pytest.approx(0.8)
        assert s["top_bigram_share"] > 0.2


class TestAdvice5Regressions:
    """Round-4 ADVICE items, pinned."""

    def test_mixture_sql_default_star_hides_rate(self, spark):
        import duckdb

        from stepist_spark.operators.sampling import (
            mixture_resample,
            mixture_resample_sql,
        )

        df = spark.createDataFrame(
            [(i, "a" if i % 3 else "b") for i in range(200)], "id bigint, grp string"
        )
        t = {"a": 0.7, "b": 0.3}
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (id BIGINT, grp VARCHAR)")
        con.executemany(
            "INSERT INTO docs VALUES (?, ?)", [(r.id, r.grp) for r in df.collect()]
        )
        # DEFAULT select_cols='*' must emit exactly the input columns —
        # the old shape leaked the helper _rate column through *
        res = con.execute(mixture_resample_sql("docs", "grp", "id", t))
        cols = [d[0] for d in res.description]
        assert cols == ["id", "grp"]
        exp = sorted(tuple(r) for r in res.fetchall())
        got = sorted(
            (r["id"], r["grp"]) for r in mixture_resample(df, "grp", "id", t).collect()
        )
        assert got == exp

    def test_wps_large_weights_keep_resolution(self, spark):
        from stepist_spark.operators.sampling import weighted_priority_sample

        # weights around 1e9 collapsed the old (u32 * 1e6) DIV w key to
        # a handful of values, letting the id tiebreak decide; the
        # 63-bit key must keep the heavy class overrepresented
        rows = [(i, 1_000_000_000) for i in range(1000)] + [
            (i, 10_000_000_000) for i in range(1000, 2000)
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
        out = weighted_priority_sample(df, "doc_id", "w", 200)
        heavy = out.filter("w = 10000000000").count()
        assert heavy > 140  # ~10/11 expected; an id-tiebreak pick gives ~100


class TestReadability:
    def test_syllables_and_flesch(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.functions.text import (
            flesch_reading_ease,
            syllable_count,
        )

        df = spark.createDataFrame(
            [("The cat sat on the mat. It was happy!",), ("",)], "text string"
        )
        rows = df.select(
            syllable_count(F.col("text")).alias("sy"),
            F.round(flesch_reading_ease(F.col("text")), 6).alias("fl"),
        ).collect()
        # the(1) cat(1) sat(1) on(1) the(1) mat.(1) it(1) was(1) happy!(2)
        assert rows[0]["sy"] == 10
        w, s, sy = 9.0, 2.0, 10.0
        exp = round(206.835 - 1.015 * (w / s) - 84.6 * (sy / w), 6)
        assert rows[0]["fl"] == exp
        assert rows[1]["sy"] == 0 and rows[1]["fl"] is None

    def test_no_vowel_token_counts_one(self, spark):
        from pyspark.sql import functions as F

        from stepist_spark.functions.text import syllable_count

        df = spark.createDataFrame([("tsk pfft 123",)], "text string")
        [r] = df.select(syllable_count(F.col("text")).alias("sy")).collect()
        assert r["sy"] == 3


class TestCanonicalDedup:
    """Normalization-robust dedup: canonical_text collapses encoding
    variance, canonical_dup_groups catches what byte-exact misses."""

    def test_canonical_text_collapses_variants(self, spark):
        from stepist_spark.functions.text import canonical_text

        rows = spark.createDataFrame(
            [
                ("Hello,   World!",),
                ("  hello world  ",),
                ("HELLO--world",),
                ("hello worlds",),
            ],
            "text string",
        ).select(canonical_text(F.col("text")).alias("c")).collect()
        assert [r["c"] for r in rows[:3]] == ["hello world"] * 3
        assert rows[3]["c"] == "hello worlds"

    def test_groups_reencoded_copies_exact_misses(self, spark):
        from stepist_spark.operators.dedup import (
            canonical_dup_groups,
            exact_dup_groups,
        )

        df = spark.createDataFrame(
            [
                (1, "The cat sat."),
                (2, "the CAT   sat"),
                (3, "a different doc"),
            ],
            "doc_id bigint, text string",
        )
        assert exact_dup_groups(df, "doc_id", "text").count() == 0
        got = canonical_dup_groups(df, "doc_id", "text").collect()
        assert len(got) == 1
        assert got[0]["n_dups"] == 2 and got[0]["canonical_id"] == 1

    def test_sql_mirror(self, spark):
        import duckdb

        from stepist_spark.functions.text import canonical_text, canonical_text_sql

        texts = ["Mixed CASE & punct...", "  spaces\teverywhere \n", "123-456"]
        got = [
            r["c"]
            for r in spark.createDataFrame([(t,) for t in texts], "text string")
            .select(canonical_text(F.col("text")).alias("c"))
            .collect()
        ]
        con = duckdb.connect()
        exp = [
            con.execute(
                "SELECT " + canonical_text_sql("$1"), [t]
            ).fetchone()[0]
            for t in texts
        ]
        assert got == exp


class TestLeakageSafeSplit:
    def test_cluster_members_co_split(self, spark):
        from stepist_spark.functions.text import canonical_text
        from stepist_spark.operators.sampling import leakage_safe_split

        docs = spark.createDataFrame(
            [(i, f"doc number {i} body") for i in range(40)]
            + [(1000 + i, f"  DOC Number {i} BODY ") for i in range(40)],
            "doc_id bigint, text string",
        ).withColumn("ckey", F.md5(canonical_text(F.col("text"))))
        out = leakage_safe_split(docs, "ckey")
        # every re-encoded copy lands in its original's split
        per_key = (
            out.groupBy("ckey").agg(F.countDistinct("split").alias("ns")).collect()
        )
        assert all(r["ns"] == 1 for r in per_key)
        # whereas id-keyed splitting DOES separate at least one pair
        from stepist_spark.operators.sampling import hash_split

        naive = hash_split(docs, "doc_id")
        leaked = (
            naive.withColumn("k", F.col("ckey"))
            .groupBy("k")
            .agg(F.countDistinct("split").alias("ns"))
            .filter(F.col("ns") > 1)
            .count()
        )
        assert leaked > 0


class TestPairAgreement:
    def test_flags_and_full_outer(self, spark):
        from stepist_spark.operators.dedup import pair_agreement

        a = spark.createDataFrame([(1, 2), (3, 4)], "id_a bigint, id_b bigint")
        b = spark.createDataFrame([(3, 4), (5, 6)], "id_a bigint, id_b bigint")
        got = {
            (r["id_a"], r["id_b"]): (r["in_a"], r["in_b"])
            for r in pair_agreement(a, b).collect()
        }
        assert got == {
            (1, 2): (True, False),
            (3, 4): (True, True),
            (5, 6): (False, True),
        }

    def test_canonical_dup_pairs(self, spark):
        from stepist_spark.operators.dedup import canonical_dup_pairs

        df = spark.createDataFrame(
            [(1, "The cat."), (2, " the CAT "), (3, "other"), (4, "THE cat")],
            "doc_id bigint, text string",
        )
        got = sorted(
            (r["id_a"], r["id_b"])
            for r in canonical_dup_pairs(df, "doc_id", "text").collect()
        )
        assert got == [(1, 2), (1, 4), (2, 4)]


class TestMojibakeSignals:
    def test_planted_artifacts_flag_and_clean_does_not(self, spark):
        from stepist_spark.functions.text import mojibake_count, non_ascii_count

        plant = " caf\u00c3\u00a9 \u00e2\u0080\u0099q\u00e2\u0080\u0099 \ufffd"
        df = spark.createDataFrame(
            [(1, "clean body"), (2, "body" + plant), (3, "natural caf\u00e9")],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: (r["m"], r["na"])
            for r in df.select(
                "doc_id",
                mojibake_count(F.col("text")).alias("m"),
                non_ascii_count(F.col("text")).alias("na"),
            ).collect()
        }
        assert got[1] == (0, 0)
        assert got[2][0] >= 3 and got[2][1] > got[2][0]
        # natural accents are non-ASCII but NOT mojibake
        assert got[3] == (0, 1)

    def test_sql_mirror(self, spark):
        import duckdb

        from stepist_spark.functions.text import (
            mojibake_count,
            mojibake_count_sql,
            non_ascii_count,
            non_ascii_count_sql,
        )

        texts = ["x", "caf\u00c3\u00a9 \ufffd", "\u00e2\u0080\u0099", "caf\u00e9"]
        got = [
            (r["m"], r["na"])
            for r in spark.createDataFrame([(t,) for t in texts], "text string")
            .select(
                mojibake_count(F.col("text")).alias("m"),
                non_ascii_count(F.col("text")).alias("na"),
            )
            .collect()
        ]
        con = duckdb.connect()
        exp = [
            tuple(
                con.execute(
                    f"SELECT {mojibake_count_sql('$1')}, {non_ascii_count_sql('$1')}",
                    [t],
                ).fetchone()
            )
            for t in texts
        ]
        assert got == exp


class TestTemporalSplit:
    """sampling.temporal_split — embargoed chronological splits."""

    def _df(self, spark):
        import datetime as dt

        rows = [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)) for i in range(100)
        ]
        return spark.createDataFrame(rows, "event_id bigint, ts timestamp")

    def test_boundaries_and_embargo(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from stepist_spark.operators.sampling import temporal_split

        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        us = lambda h: int((base + dt.timedelta(hours=h)).timestamp() * 1_000_000)
        # val at hour 70, test at hour 85, embargo 5 hours
        got = {
            r.event_id: r.split
            for r in temporal_split(
                self._df(spark), "ts", us(70), test_start_us=us(85),
                embargo_us=5 * 3600 * 1_000_000,
            ).collect()
        }
        assert got[0] == "train" and got[64] == "train"
        assert got[65] == "embargo" and got[69] == "embargo"  # purged tail
        assert got[70] == "val" and got[79] == "val"
        assert got[80] == "embargo" and got[84] == "embargo"
        assert got[85] == "test" and got[99] == "test"
        # no silent row loss: every row labeled
        assert len(got) == 100

    def test_no_test_split(self, spark):
        import datetime as dt

        from stepist_spark.operators.sampling import temporal_split

        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        us70 = int((base + dt.timedelta(hours=70)).timestamp() * 1_000_000)
        got = {
            r.event_id: r.split
            for r in temporal_split(self._df(spark), "ts", us70).collect()
        }
        assert set(got.values()) == {"train", "val"}  # zero embargo

    def test_duckdb_mirror(self, spark):
        import datetime as dt

        import duckdb

        from stepist_spark.operators.sampling import (
            temporal_split,
            temporal_split_sql,
        )

        base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        us = lambda h: int((base + dt.timedelta(hours=h)).timestamp() * 1_000_000)
        df = self._df(spark)
        got = sorted(
            (r.event_id, r.split)
            for r in temporal_split(
                df, "ts", us(70), test_start_us=us(85),
                embargo_us=3 * 3600 * 1_000_000,
            ).collect()
        )
        vals = ", ".join(
            f"({r.event_id}, TIMESTAMP '{r.ts}')" for r in df.collect()
        )
        duck = sorted(
            (r[0], r[2])
            for r in duckdb.sql(
                temporal_split_sql(
                    f"SELECT * FROM (VALUES {vals}) t(event_id, ts)",
                    "ts", us(70), test_start_us=us(85),
                    embargo_us=3 * 3600 * 1_000_000,
                )
            ).fetchall()
        )
        assert got == duck
