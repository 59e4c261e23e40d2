"""Corpus-level text operators: vocabulary building, salient-term
extraction, and benchmark decontamination — the whole-corpus passes a
training-data pipeline runs after per-document filtering.

Scale shapes:
- vocabulary: explode + one hash-aggregate shuffle keyed on the token;
  partial (map-side) aggregation carries one row per distinct token per
  partition, so the shuffle is vocabulary-sized, not corpus-sized;
- salient terms: two aggregations sharing the token key plus a
  token-keyed join of per-term document frequency back onto per-doc
  term counts — df (the document-frequency table) is vocabulary-sized
  and broadcast;
- decontamination: the benchmark shingle set is tiny by construction
  (benchmarks are small), so the membership test is a BROADCAST semi
  join against the corpus shingle stream — no shuffle of the corpus.

Reference parity: absent from the reference (SURVEY.md §2.2);
BASELINE.json LLM-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stepist_spark.functions import hashing
from stepist_spark.functions.text import tokens


def vocabulary(df: DataFrame, id_col: str, text_col: str, min_count: int = 1) -> DataFrame:
    """Corpus vocabulary: per-token total occurrences and document
    frequency. Output: ``tok, n_occurrences, n_docs`` (n_occurrences ≥
    ``min_count``)."""
    tok = df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
    out = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("_id").alias("n_docs"),
    )
    return out.filter(F.col("n_occurrences") >= min_count)


def vocabulary_from_postings(postings: DataFrame, min_count: int = 1) -> DataFrame:
    """:func:`vocabulary` computed from an inverted index
    (``ranking.doc_postings`` output) instead of the raw corpus —
    ``n_occurrences = sum(tf)``, ``n_docs = count(postings rows)``.
    When a pipeline also runs BM25, the postings pass is built once and
    the vocabulary falls out of it for one vocabulary-sized aggregate."""
    out = postings.groupBy("tok").agg(
        F.sum("tf").cast("bigint").alias("n_occurrences"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    return out.filter(F.col("n_occurrences") >= min_count)


def salient_terms(
    df: DataFrame, id_col: str, text_col: str, broadcast_df: bool = True
) -> DataFrame:
    """Per-document most-salient term, TF-IDF shaped: highest term
    frequency first, rarest (lowest document frequency) as tiebreak,
    token string as final tiebreak.

    Deliberately ranked on the INTEGER pair (tf desc, df asc) rather
    than the float tf·ln(N/df): the ordering is the same monotone
    intent, but exact integer comparison is reproducible bit-for-bit
    across engines, while ``ln`` is only within-1-ulp portable and a
    rounded composite can flip hash comparisons at decimal boundaries.

    ``broadcast_df``: the document-frequency table is vocabulary-sized.
    For curated corpora that is MBs — broadcast it (default). For raw
    web text the open vocabulary (URLs, typos, hashes) can run to 10⁹
    rows, where a forced broadcast hint — which OVERRIDES Spark's size
    checks — would OOM every executor: pass ``False`` for a plain
    shuffle join on the token (tf is already partitioned by (_id, tok)
    from its aggregation; the extra exchange is one vocab-keyed
    shuffle of the tf table, the standard big-big layout).

    Output: ``<id_col>, top_token, tf, df, n_tokens``.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
    tf = tok.groupBy("_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency: vocabulary-sized, broadcast back onto tf
    docfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    joined = tf.join(F.broadcast(docfreq) if broadcast_df else docfreq, "tok")
    w_rank = Window.partitionBy("_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok").asc()
    )
    w_doc = Window.partitionBy("_id")
    return (
        joined.withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("n_tokens", F.sum("tf").over(w_doc))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("tok").alias("top_token"),
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


def shingle_set(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int = 8
) -> DataFrame:
    """Distinct ``(_id, sh)`` k-word shingles per document — the shared
    input of the exact and Bloom decontamination paths (compute once,
    feed both)."""
    toked = df.select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_tk"))
    sh = toked.select(
        "_id", F.explode(hashing.shingles(F.col("_tk"), shingle_k)).alias("sh")
    )
    return sh.distinct()


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 8,
    corpus_shingles: DataFrame | None = None,
    benchmark_shingles: DataFrame | None = None,
    broadcast_benchmark: bool = True,
    bloom_m_bits: int = 1 << 24,
    bloom_n_hashes: int = 4,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document, how many of
    its distinct ``shingle_k``-gram shingles appear anywhere in the
    benchmark set. Output: ``<id_col>, n_shingles, n_contaminated,
    contamination_ratio`` (one row per corpus doc with ≥1 shingle).

    ``broadcast_benchmark=True`` (default): the benchmark shingle set
    is broadcast and the corpus side never shuffles for the membership
    test — right when the benchmark is small. ``False`` is the scale
    path for benchmark sets too large to broadcast exactly: a Bloom
    bitmap of the benchmark (KBs regardless of set size,
    ``sketches.bloom_build``) pre-filters the corpus with zero false
    negatives, and only the surviving candidate shingles — typically a
    vanishing fraction — exact-verify through a shuffle semi-join.
    Both paths return IDENTICAL results (the Bloom filter never drops
    a true member; false positives are removed by the exact verify).

    ``corpus_shingles``/``benchmark_shingles`` (outputs of
    :func:`shingle_set`) let a caller that also inspects the shingles
    share one tokenize+shingle pass instead of re-exploding the corpus.
    """
    corpus_sh = (
        corpus_shingles
        if corpus_shingles is not None
        else shingle_set(corpus, id_col, text_col, shingle_k)
    )
    bench_sh = (
        benchmark_shingles
        if benchmark_shingles is not None
        else shingle_set(benchmark, id_col, text_col, shingle_k)
    ).select("sh").distinct()
    if broadcast_benchmark:
        candidates = corpus_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
    else:
        from stepist_spark.operators import sketches

        bloom = sketches.bloom_build(
            bench_sh, "sh", m_bits=bloom_m_bits, n_hashes=bloom_n_hashes
        )
        maybe = sketches.bloom_probe(
            corpus_sh, "sh", bloom, m_bits=bloom_m_bits, n_hashes=bloom_n_hashes
        ).filter(F.col("maybe_member")).drop("maybe_member")
        # exact verify of the survivors: a SHUFFLE semi-join — both
        # sides hash-partition on the shingle, no broadcast of the
        # full benchmark set anywhere
        candidates = maybe.join(bench_sh, "sh", "left_semi")
    hits = candidates.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    totals = corpus_sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    joined = totals.join(hits, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.coalesce("n_contaminated", F.lit(0)).cast("bigint").alias("n_contaminated"),
    )
    # single division of identical integers — bit-identical, unrounded
    return joined.withColumn(
        "contamination_ratio",
        F.col("n_contaminated").cast("double") / F.col("n_shingles"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 8,
    max_ratio: float = 0.0,
    **contamination_kwargs,
) -> DataFrame:
    """REMOVE contaminated documents: the action step on top of
    :func:`ngram_contamination`'s audit (GPT-3 appendix C's discipline
    — drop the whole document, don't trim; a partially-overlapping doc
    is suspect wholesale). Keeps corpus rows whose contamination ratio
    is <= ``max_ratio`` (default 0: any shared shingle drops the doc).

    Documents with NO shingles (shorter than ``shingle_k`` tokens)
    cannot share a verbatim k-gram and are KEPT — the audit emits no
    row for them, and the anti-join below only removes flagged ids.
    One anti-join over the audit's flagged-id set; all of
    :func:`ngram_contamination`'s sharing/scale knobs pass through
    (``corpus_shingles=``, ``broadcast_benchmark=False`` Bloom path).
    Returns corpus rows unchanged.
    """
    audit = ngram_contamination(
        corpus, benchmark, id_col, text_col, shingle_k, **contamination_kwargs
    )
    flagged = audit.filter(F.col("contamination_ratio") > max_ratio).select(id_col)
    return corpus.join(flagged, id_col, "anti")


def distribution_shift(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Per-group corpus drift: add-one-smoothed KL divergence of each
    group's token distribution from the REST of the corpus — the
    distribution-shift monitor a training-data pipeline runs when a
    new source/dump lands (Kullback & Leibler 1951; the data-mixing
    diagnostics of CCNet/DoReMi are public descendants).

    Semantics: vocabulary V = tokens with global count >= ``min_count``
    (out-of-vocabulary tokens are excluded on BOTH sides, so the two
    distributions share support); for group p with complement q,
    ``p_i = (c_pi + 1) / (N_p + |V|)`` and KL(p||q) =
    sum_i p_i * ln(p_i / q_i).

    Engine-portable exactness (the t23 log pattern): each token's
    ``ln(ratio)`` — one double division of exact bigint products, one
    ``ln`` — is scaled to an integer ``floor(ln * 1e6)`` BEFORE the
    weighted sum, so the aggregate is an order-free bigint and the
    value hash is stable.

    Scale shape: one explode+count shuffle (vocabulary-sized after
    map-side partials), then a (groups x V) frame built by
    broadcasting the TINY group table across the vocabulary — never a
    corpus-sized join. Output: ``grp, n_tokens, vocab_v, kl_scaled,
    kl`` (kl rounded to 6 dp).
    """
    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    gt = tok.groupBy("grp", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return distribution_shift_from_counts(gt, min_count=min_count)


def distribution_shift_from_counts(
    gt: DataFrame, min_count: int = 1
) -> DataFrame:
    """:func:`distribution_shift` from a precomputed per-(group, token)
    count frame ``(grp, tok, c)`` — lets a pipeline that already built
    an inverted index (ranking.doc_postings) reuse that single corpus
    explode instead of re-tokenizing."""
    vocab = (
        gt.groupBy("tok")
        .agg(F.sum("c").cast("bigint").alias("c_all"))
        .filter(F.col("c_all") >= min_count)
    )
    # in-vocab token mass per group and overall
    gv = gt.join(vocab.select("tok"), "tok").groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n_p")
    )
    from stepist_spark.operators.cumulative import whole_frame

    # |groups| rows — bounded frame, explicit single-task window
    gv = gv.select(
        "grp", "n_p", F.sum("n_p").over(whole_frame()).cast("bigint").alias("n_all")
    )
    v_count = vocab.select(F.count(F.lit(1)).cast("bigint").alias("v"))
    # (group x vocab) support frame: broadcast the tiny group table
    support = vocab.crossJoin(F.broadcast(gv)).crossJoin(F.broadcast(v_count))
    cells = support.join(
        gt.withColumnsRenamed({"c": "c_p"}), ["grp", "tok"], "left"
    ).select(
        "grp",
        "tok",
        "n_p",
        "n_all",
        "v",
        F.coalesce(F.col("c_p"), F.lit(0)).cast("bigint").alias("c_p"),
        "c_all",
    )
    # p side: group; q side: complement (rest of corpus)
    num = (F.col("c_p") + 1) * ((F.col("n_all") - F.col("n_p")) + F.col("v"))
    den = ((F.col("c_all") - F.col("c_p")) + 1) * (F.col("n_p") + F.col("v"))
    term = F.floor(
        F.log(num.cast("double") / den.cast("double")) * F.lit(1_000_000)
    ).cast("bigint") * (F.col("c_p") + 1)
    out = cells.groupBy("grp", "n_p", "v").agg(
        F.sum(term).cast("bigint").alias("kl_scaled")
    )
    return out.select(
        "grp",
        F.col("n_p").alias("n_tokens"),
        F.col("v").alias("vocab_v"),
        "kl_scaled",
        F.round(
            F.col("kl_scaled").cast("double")
            / ((F.col("n_p") + F.col("v")).cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("kl"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    min_pair_count: int = 2,
    top_k: int = 50,
    broadcast_unigrams: bool = True,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over ADJACENT
    token bigrams — the corpus phrase-discovery pass (Church & Hanks
    1990, public): ``pmi(a,b) = ln( p(ab) / (p(a)·p(b)) )`` with
    unigram probabilities from token counts and bigram probabilities
    from adjacent-pair counts.

    Spark-first shape: bigrams are built INSIDE each row with a JVM
    ``transform`` over the token array (zip-adjacent — no per-document
    window sort, no positional shuffle); unigram and bigram counts are
    each ONE map-side-combined hash aggregate, so both shuffles are
    vocabulary-sized. The unigram table joins back onto the (already
    ``min_pair_count``-filtered) pair frame — broadcast by default,
    ``broadcast_unigrams=False`` for open web-scale vocabularies (the
    salient_terms contract). Top-k compiles to TakeOrderedAndProject.

    Engine-portable exactness (the distribution_shift log pattern):
    ``pmi = ln( (c_ab·N_uni²) / (N_bi·c_a·c_b) )`` — exact decimal/
    HUGEINT integer products, ONE double division, ONE ``ln``, scaled
    to ``floor(ln·1e6)`` so ranking and hashing are integer-stable;
    ties break on the pair strings.

    Output: ``a, b, c_ab, c_a, c_b, pmi_scaled, pmi`` (pmi = 6-dp).
    """
    toked = df.select(tokens(F.col(text_col)).alias("_tk"))
    uni = (
        toked.select(F.explode("_tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    bi = (
        toked.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(_tk) >= 2 THEN "
                    "transform(slice(_tk, 1, size(_tk) - 1), "
                    "          (x, i) -> struct(x AS a, _tk[i + 1] AS b)) "
                    "ELSE array() END"
                )
            ).alias("_bg")
        )
        .select("_bg.a", "_bg.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    n_uni = uni.agg(F.sum("c").cast("bigint").alias("n_uni"))
    n_bi = bi.agg(F.sum("c_ab").cast("bigint").alias("n_bi"))
    pairs = bi.filter(F.col("c_ab") >= min_pair_count)
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b"))
    if broadcast_unigrams:
        ua, ub = F.broadcast(ua), F.broadcast(ub)
    joined = (
        pairs.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    dec = "decimal(38,0)"
    num = (
        F.col("c_ab").cast(dec) * F.col("n_uni").cast(dec) * F.col("n_uni").cast(dec)
    )
    den = F.col("n_bi").cast(dec) * F.col("c_a").cast(dec) * F.col("c_b").cast(dec)
    pmi_scaled = F.floor(
        F.log(num.cast("double") / den.cast("double")) * F.lit(1_000_000)
    ).cast("bigint")
    return (
        joined.select(
            "a",
            "b",
            "c_ab",
            "c_a",
            "c_b",
            pmi_scaled.alias("pmi_scaled"),
        )
        .withColumn(
            "pmi", F.round(F.col("pmi_scaled").cast("double") / F.lit(1_000_000.0), 6)
        )
        .orderBy(F.col("pmi_scaled").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(top_k)
    )


def pmi_collocations_sql(
    table: str,
    text_expr: str,
    min_pair_count: int = 2,
    top_k: int = 50,
) -> str:
    """DuckDB mirror of :func:`pmi_collocations` — same zip-adjacent
    bigrams (list_transform's 1-based lambda index), same HUGEINT
    products, one division + one ln, same floor(ln*1e6) scaling and
    (pmi desc, a, b) ordering."""
    from stepist_spark.functions.text import tokens_sql

    tk = tokens_sql(text_expr)
    return f"""
WITH _pmi_tk AS (SELECT {tk} AS tk FROM {table}),
_pmi_uni AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT unnest(tk) AS tok FROM _pmi_tk) GROUP BY tok
),
_pmi_bi AS (
    SELECT bg.a AS a, bg.b AS b, CAST(count(*) AS BIGINT) AS c_ab
    FROM (
        SELECT unnest(list_transform(tk[1:len(tk)-1],
                                     (x, i) -> {{'a': x, 'b': tk[i + 1]}})) AS bg
        FROM _pmi_tk WHERE len(tk) >= 2
    ) GROUP BY 1, 2
),
_pmi_nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM _pmi_uni),
_pmi_nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bi FROM _pmi_bi)
SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
       CAST(floor(ln(
           CAST(c_ab::HUGEINT * n_uni * n_uni AS DOUBLE)
           / CAST(n_bi::HUGEINT * ua.c * ub.c AS DOUBLE)
       ) * 1000000) AS BIGINT) AS pmi_scaled,
       round(CAST(floor(ln(
           CAST(c_ab::HUGEINT * n_uni * n_uni AS DOUBLE)
           / CAST(n_bi::HUGEINT * ua.c * ub.c AS DOUBLE)
       ) * 1000000) AS BIGINT) / 1000000.0, 6) AS pmi
FROM _pmi_bi
JOIN _pmi_uni ua ON _pmi_bi.a = ua.tok
JOIN _pmi_uni ub ON _pmi_bi.b = ub.tok
CROSS JOIN _pmi_nu CROSS JOIN _pmi_nb
WHERE c_ab >= {min_pair_count}
ORDER BY pmi_scaled DESC, a, b LIMIT {top_k}
"""


def distribution_shift_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    group_expr: str,
    min_count: int = 1,
) -> str:
    """DuckDB mirror of :func:`distribution_shift` — same smoothing,
    same floor(ln*1e6) scaling, same aggregation order-freeness."""
    from stepist_spark.functions.text import tokens_sql

    return f"""
WITH _tok AS (
    SELECT {group_expr} AS grp, unnest({tokens_sql(text_expr)}) AS tok
    FROM {table}
),
_gt AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS c FROM _tok GROUP BY 1, 2),
_vocab AS (
    SELECT tok, CAST(sum(c) AS BIGINT) AS c_all FROM _gt GROUP BY 1
    HAVING sum(c) >= {min_count}
),
_gv AS (
    SELECT g.grp, CAST(sum(g.c) AS BIGINT) AS n_p
    FROM _gt g JOIN _vocab v ON g.tok = v.tok GROUP BY 1
),
_gv2 AS (SELECT grp, n_p, CAST(sum(n_p) OVER () AS BIGINT) AS n_all FROM _gv),
_v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM _vocab),
_cells AS (
    SELECT gv.grp, vo.tok, gv.n_p, gv.n_all, _v.v,
           CAST(coalesce(g.c, 0) AS BIGINT) AS c_p, vo.c_all
    FROM _vocab vo CROSS JOIN _gv2 gv CROSS JOIN _v
    LEFT JOIN _gt g ON g.grp = gv.grp AND g.tok = vo.tok
)
SELECT grp, n_p AS n_tokens, v AS vocab_v,
       CAST(sum(CAST(floor(ln(
           CAST((c_p + 1) * ((n_all - n_p) + v) AS DOUBLE)
           / CAST(((c_all - c_p) + 1) * (n_p + v) AS DOUBLE)
       ) * 1000000) AS BIGINT) * (c_p + 1)) AS BIGINT) AS kl_scaled,
       round(CAST(sum(CAST(floor(ln(
           CAST((c_p + 1) * ((n_all - n_p) + v) AS DOUBLE)
           / CAST(((c_all - c_p) + 1) * (n_p + v) AS DOUBLE)
       ) * 1000000) AS BIGINT) * (c_p + 1)) AS DOUBLE)
             / (CAST(n_p + v AS DOUBLE) * 1000000.0), 6) AS kl
FROM _cells
GROUP BY grp, n_p, v
"""


def vocabulary_richness(
    df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 10**6,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Corpus vocabulary-COVERAGE estimators from the frequency-of-
    frequencies table — "how much vocabulary haven't we seen yet", the
    question a corpus-growth decision hangs on:

    - **Chao1** lower-bound estimate of the TRUE vocabulary size
      (Chao 1984, public): ``V + f1²/(2·f2)`` with f1/f2 the
      singleton/doubleton type counts; when f2 = 0 the bias-corrected
      ``V + f1·(f1−1)/2`` variant applies.
    - **Good-Turing unseen mass** (Good 1953): ``p0 = f1/N`` — the
      probability the NEXT token is a previously-unseen type.

    Spark-first shape: one token-count hash aggregate (reusable: pass
    ``token_counts`` = a ``(tok, c)`` frame, e.g. summed from the t16
    postings pass, and the corpus is never re-tokenized), one
    |distinct-frequencies|-bounded aggregate on top. Exactness: V, N,
    f1, f2 are exact bigints; ``chao1_scaled`` keeps the correction
    term as one integer division (DuckDB ``//`` == Spark ``DIV`` on
    non-negatives); p0 is one double division, 6 dp.

    Output one row: ``n_tokens, n_types, f1, f2, chao1_scaled, p0``.
    """
    if token_counts is None:
        if df is None:
            raise ValueError("pass a corpus df or a token_counts frame")
        token_counts = (
            df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    agg = token_counts.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("f1"),
        F.sum((F.col("c") == 2).cast("int")).cast("bigint").alias("f2"),
    )
    chao = F.when(
        F.col("f2") > 0,
        F.expr(f"n_types * CAST({scale} AS BIGINT) + (f1 * f1 * {scale}) DIV (2 * f2)"),
    ).otherwise(
        F.expr(f"n_types * CAST({scale} AS BIGINT) + (f1 * (f1 - 1) * {scale}) DIV 2")
    )
    return agg.filter(F.col("n_tokens").isNotNull()).select(
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        chao.cast("bigint").alias("chao1_scaled"),
        F.round(
            F.col("f1").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("p0"),
    )


def vocabulary_richness_sql(
    corpus_sql: str,
    text_expr: str = "text",
    scale: int = 10**6,
    token_counts_sql: str | None = None,
) -> str:
    """DuckDB mirror of :func:`vocabulary_richness`."""
    from stepist_spark.functions.text import tokens_sql

    tc = (
        token_counts_sql
        if token_counts_sql is not None
        else (
            f"SELECT tok, count(*) AS c FROM (SELECT unnest({tokens_sql(text_expr)})"
            f" AS tok FROM ({corpus_sql})) GROUP BY tok"
        )
    )
    return f"""
WITH _vr AS (
    SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
    FROM ({tc})
)
SELECT n_tokens, n_types, f1, f2,
       CAST(CASE WHEN f2 > 0
            THEN n_types * CAST({scale} AS BIGINT) + (f1 * f1 * {scale}) // (2 * f2)
            ELSE n_types * CAST({scale} AS BIGINT) + (f1 * (f1 - 1) * {scale}) // 2
       END AS BIGINT) AS chao1_scaled,
       round(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS p0
FROM _vr WHERE n_tokens IS NOT NULL
"""


def js_shift_from_counts(gt: DataFrame, min_count: int = 1) -> DataFrame:
    """Per-group Jensen-Shannon divergence of each group's token
    distribution vs the REST of the corpus (Lin, IEEE-IT 1991 —
    public): the SYMMETRIC, bounded (≤ ln 2) companion of
    :func:`distribution_shift_from_counts`'s KL — the right metric
    when neither side is the "reference" (e.g. comparing two crawl
    dumps), and immune to KL's blowup on near-zero q cells.

    Same input contract — a per-(group, token) count frame ``(grp,
    tok, c)``, e.g. summed off the t16 postings pass — and the same
    add-one smoothing over the shared global vocabulary. With
    ``a = c_p+1, b = c_q+1, Dp = N_p+|V|, Dq = N_q+|V|``:
    ``ln(p_i/m_i) = ln(2·a·Dq / (a·Dq + b·Dp))`` — exact
    decimal(38,0)/HUGEINT products, ONE double division and ONE ln per
    cell, floor-scaled to an integer BEFORE the a-weighted sum (the
    distribution_shift discipline), so both one-sided sums are
    order-free bigints. ``js = (Σ_p/Dp + Σ_q/Dq) / 2e6`` is then a
    fixed IEEE sequence over those exact integers.

    Output: ``grp, n_tokens, vocab_v, js_p_scaled, js_q_scaled,
    js_scaled, js`` (js_scaled = floor(js·1e6); js 6-dp)."""
    vocab = (
        gt.groupBy("tok")
        .agg(F.sum("c").cast("bigint").alias("c_all"))
        .filter(F.col("c_all") >= min_count)
    )
    gv = gt.join(vocab.select("tok"), "tok").groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n_p")
    )
    from stepist_spark.operators.cumulative import whole_frame

    gv = gv.select(
        "grp", "n_p", F.sum("n_p").over(whole_frame()).cast("bigint").alias("n_all")
    )
    v_count = vocab.select(F.count(F.lit(1)).cast("bigint").alias("v"))
    support = vocab.crossJoin(F.broadcast(gv)).crossJoin(F.broadcast(v_count))
    cells = support.join(
        gt.withColumnsRenamed({"c": "c_p"}), ["grp", "tok"], "left"
    ).select(
        "grp",
        "n_p",
        "n_all",
        "v",
        F.coalesce(F.col("c_p"), F.lit(0)).cast("bigint").alias("c_p"),
        "c_all",
    )
    dec = "decimal(38,0)"
    a = (F.col("c_p") + 1).cast(dec)
    b = ((F.col("c_all") - F.col("c_p")) + 1).cast(dec)
    dp = (F.col("n_p") + F.col("v")).cast(dec)
    dq = ((F.col("n_all") - F.col("n_p")) + F.col("v")).cast(dec)
    mix = a * dq + b * dp

    def _side(w_num, w_den, weight):
        return (
            F.floor(
                F.log(
                    (F.lit(2).cast(dec) * w_num * w_den).cast("double")
                    / mix.cast("double")
                )
                * F.lit(1_000_000)
            ).cast("bigint")
            * weight.cast("bigint")
        )

    out = cells.groupBy("grp", "n_p", "v").agg(
        F.sum(_side(a, dq, a)).cast("bigint").alias("js_p_scaled"),
        F.sum(_side(b, dp, b)).cast("bigint").alias("js_q_scaled"),
    )
    # Dq = (n_all - n_p) + v is not carried through the groupBy; rebuild
    # it from the broadcast totals instead of widening the group key
    out = out.join(F.broadcast(gv.select("grp", "n_all")), "grp")
    half = (
        F.col("js_p_scaled").cast("double")
        / (F.col("n_p") + F.col("v")).cast("double")
        + F.col("js_q_scaled").cast("double")
        / ((F.col("n_all") - F.col("n_p")) + F.col("v")).cast("double")
    ) / F.lit(2.0)
    return out.select(
        "grp",
        F.col("n_p").alias("n_tokens"),
        F.col("v").alias("vocab_v"),
        "js_p_scaled",
        "js_q_scaled",
        F.floor(half).cast("bigint").alias("js_scaled"),
        F.round(half / F.lit(1_000_000.0), 6).alias("js"),
    )


def js_shift_sql(table: str, text_expr: str, group_expr: str, min_count: int = 1) -> str:
    """DuckDB mirror of :func:`js_shift_from_counts` fed from a raw
    corpus (same tokenize → per-(group, token) counts as
    distribution_shift_sql), same smoothing/products/floor scaling."""
    from stepist_spark.functions.text import tokens_sql

    tk = tokens_sql(text_expr)
    return f"""
WITH _js_tok AS (
    SELECT ({group_expr}) AS grp, unnest({tk}) AS tok FROM {table}
),
_js_gt AS (
    SELECT grp, tok, CAST(count(*) AS BIGINT) AS c FROM _js_tok GROUP BY grp, tok
),
_js_vocab AS (
    SELECT tok, CAST(sum(c) AS BIGINT) AS c_all
    FROM _js_gt GROUP BY tok HAVING sum(c) >= {min_count}
),
_js_gv AS (
    SELECT grp, CAST(sum(c) AS BIGINT) AS n_p
    FROM _js_gt JOIN _js_vocab USING (tok) GROUP BY grp
),
_js_tot AS (
    SELECT grp, n_p, CAST(sum(n_p) OVER () AS BIGINT) AS n_all FROM _js_gv
),
_js_v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM _js_vocab),
_js_cells AS (
    SELECT t.grp, t.n_p, t.n_all, v.v, _js_vocab.tok,
           coalesce(g.c, 0) AS c_p, _js_vocab.c_all
    FROM _js_vocab CROSS JOIN _js_tot t CROSS JOIN _js_v v
    LEFT JOIN _js_gt g ON g.grp = t.grp AND g.tok = _js_vocab.tok
),
_js_terms AS (
    SELECT grp, n_p, v, n_all,
        CAST(floor(ln(
            CAST(2::HUGEINT * (c_p + 1) * ((n_all - n_p) + v) AS DOUBLE)
            / CAST((c_p + 1)::HUGEINT * ((n_all - n_p) + v)
                   + ((c_all - c_p) + 1)::HUGEINT * (n_p + v) AS DOUBLE)
        ) * 1000000) AS BIGINT) * (c_p + 1) AS tp,
        CAST(floor(ln(
            CAST(2::HUGEINT * ((c_all - c_p) + 1) * (n_p + v) AS DOUBLE)
            / CAST((c_p + 1)::HUGEINT * ((n_all - n_p) + v)
                   + ((c_all - c_p) + 1)::HUGEINT * (n_p + v) AS DOUBLE)
        ) * 1000000) AS BIGINT) * ((c_all - c_p) + 1) AS tq
    FROM _js_cells
),
_js_out AS (
    SELECT grp, n_p, v, n_all,
           CAST(sum(tp) AS BIGINT) AS js_p_scaled,
           CAST(sum(tq) AS BIGINT) AS js_q_scaled
    FROM _js_terms GROUP BY grp, n_p, v, n_all
)
SELECT grp, n_p AS n_tokens, v AS vocab_v, js_p_scaled, js_q_scaled,
       CAST(floor((CAST(js_p_scaled AS DOUBLE) / CAST(n_p + v AS DOUBLE)
                   + CAST(js_q_scaled AS DOUBLE)
                     / CAST((n_all - n_p) + v AS DOUBLE)) / 2.0) AS BIGINT)
           AS js_scaled,
       round((CAST(js_p_scaled AS DOUBLE) / CAST(n_p + v AS DOUBLE)
              + CAST(js_q_scaled AS DOUBLE)
                / CAST((n_all - n_p) + v AS DOUBLE)) / 2.0 / 1000000.0, 6) AS js
FROM _js_out
"""


def zipf_slope(
    counts: DataFrame, token_col: str = "tok", count_col: str = "n_occurrences"
) -> DataFrame:
    """Zipf rank-frequency fit (Zipf 1949 — public): the OLS slope of
    ``ln(frequency)`` against ``ln(rank)`` over the vocabulary — the
    classic corpus-health diagnostic (natural language sits near −1;
    boilerplate-heavy or templated corpora flatten, OCR noise
    steepens the tail).

    Scale shape: ranking rides :mod:`operators.cumulative`'s
    ``global_row_number`` partition-offset machinery (the vocabulary
    frame is NOT provably small — no single-task window), then ONE
    map-side-combined aggregate collects the exact decimal(38,0)
    sufficient statistics of the log-log fit (the grouped_ols
    discipline: x/y are floor(ln·1e6) integers, so every sum is
    exact; slope and r² drop to double once, in a fixed IEEE
    sequence).

    Output (one row): ``n_vocab, slope_scaled, r2_scaled, slope, r2``
    (scaled = floor(v·1e6) bigints; doubles 6-dp; NULL fit when the
    vocabulary has < 2 distinct tokens or zero x-variance)."""
    from stepist_spark.operators.cumulative import global_row_number

    ranked = global_row_number(
        counts.select(
            F.col(token_col).alias("_tok"),
            F.col(count_col).cast("bigint").alias("_c"),
        ).withColumn("_neg", -F.col("_c")),
        ["_neg", "_tok"],
        out_col="_rank",
    )
    return _loglog_fit(ranked, "_rank", "_c", "n_vocab")


def _loglog_fit(
    df: DataFrame, x_col: str, y_col: str, n_alias: str
) -> DataFrame:
    """Shared tail of the power-law fits (:func:`zipf_slope`,
    :func:`heaps_fit`): OLS of ``ln(y)`` on ``ln(x)`` over positive
    integer columns. x/y become floor(ln·1e6) integers so every
    sufficient statistic is an exact decimal(38,0)/HUGEINT sum; the
    slope and r² drop to double once, in a fixed IEEE sequence (the
    grouped_ols discipline). Output (one row): ``{n_alias},
    slope_scaled, r2_scaled, slope, r2`` (NULL fit when < 2 points or
    zero x-variance)."""
    dec = "decimal(38,0)"
    xy = df.filter((F.col(x_col) > 0) & (F.col(y_col) > 0)).select(
        F.floor(F.log(F.col(x_col).cast("double")) * F.lit(1_000_000))
        .cast(dec)
        .alias("_x"),
        F.floor(F.log(F.col(y_col).cast("double")) * F.lit(1_000_000))
        .cast(dec)
        .alias("_y"),
    )
    stats = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_x").cast(dec).alias("sx"),
        F.sum("_y").cast(dec).alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).cast(dec).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast(dec).alias("syy"),
        F.sum(F.col("_x") * F.col("_y")).cast(dec).alias("sxy"),
    )
    covn = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast(dec)
        .cast("double")
    )
    varxn = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast(dec)
        .cast("double")
    )
    varyn = (
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast(dec)
        .cast("double")
    )
    slope = covn / varxn
    r2 = covn * covn / (varxn * varyn)
    ok = (F.col("n") >= 2) & (varxn > 0)
    okr = ok & (varyn > 0)
    return stats.select(
        F.col("n").alias(n_alias),
        F.when(ok, F.floor(slope * F.lit(1_000_000)).cast("bigint")).alias(
            "slope_scaled"
        ),
        F.when(okr, F.floor(r2 * F.lit(1_000_000)).cast("bigint")).alias("r2_scaled"),
        F.when(ok, F.round(slope, 6)).alias("slope"),
        F.when(okr, F.round(r2, 6)).alias("r2"),
    )


def heaps_fit(postings: DataFrame) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps 1978 — public): OLS of
    ``ln V(N)`` on ``ln N`` where V(N) is the distinct-type count
    after the first N token occurrences in doc-id order — the
    corpus-growth planning twin of :func:`vocabulary_richness`'s
    Chao1/Good-Turing point estimates (β well under 1 says vocabulary
    is saturating; β near 1 says every new shard still brings new
    types).

    Input: an inverted index ``(doc_id, tok, tf)`` (ranking.
    doc_postings output — the same shared pass as BM25/vocabulary).
    Shape: one min-aggregate (each type attributed to its FIRST doc),
    one per-doc aggregate, and a cumulative over the |docs|-row frame
    via cumulative.ordered_cumsum — no single-task window, no second
    corpus pass. Exactness: V_d/N_d are exact bigints; the log-log
    tail is :func:`_loglog_fit`'s integer discipline.

    Output (one row): ``n_docs, slope_scaled, r2_scaled, slope, r2``
    (slope = the Heaps exponent β)."""
    from stepist_spark.operators.cumulative import ordered_cumsum

    new_types = (
        postings.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
    )
    doc_tokens = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("_n")
    )
    per_doc = doc_tokens.join(new_types, "doc_id", "left").select(
        "doc_id", "_n", F.coalesce(F.col("_v"), F.lit(0)).alias("_v")
    )
    cum = ordered_cumsum(per_doc, "doc_id", ["_n", "_v"])
    return _loglog_fit(cum, "cum__n", "cum__v", "n_docs")


def heaps_fit_sql(table: str, id_expr: str, text_expr: str) -> str:
    """DuckDB mirror of :func:`heaps_fit` from the raw corpus (same
    first-doc attribution, cumulative, and integer log-log tail)."""
    from stepist_spark.functions.text import tokens_sql

    tk = tokens_sql(text_expr)
    return f"""
WITH _hp_tok AS (
    SELECT ({id_expr}) AS doc_id, unnest({tk}) AS tok FROM {table}
),
_hp_first AS (
    SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS _v
    FROM (SELECT tok, min(doc_id) AS first_doc FROM _hp_tok GROUP BY tok)
    GROUP BY first_doc
),
_hp_n AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS _n FROM _hp_tok GROUP BY doc_id
),
_hp_cum AS (
    SELECT sum(_n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
           sum(coalesce(_v, 0)) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
    FROM _hp_n LEFT JOIN _hp_first USING (doc_id)
),
_hp_xy AS (
    SELECT CAST(floor(ln(CAST(cn AS DOUBLE)) * 1000000) AS HUGEINT) AS x,
           CAST(floor(ln(CAST(cv AS DOUBLE)) * 1000000) AS HUGEINT) AS y
    FROM _hp_cum WHERE cn > 0 AND cv > 0
),
_hp_s AS (
    SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
    FROM _hp_xy
),
_hp_f AS (
    SELECT n,
        CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
        CAST(n * syy - sy * sy AS DOUBLE) AS varyn
    FROM _hp_s
)
SELECT n AS n_docs,
       CASE WHEN n >= 2 AND varxn > 0
            THEN CAST(floor(covn / varxn * 1000000) AS BIGINT) END AS slope_scaled,
       CASE WHEN n >= 2 AND varxn > 0 AND varyn > 0
            THEN CAST(floor(covn * covn / (varxn * varyn) * 1000000) AS BIGINT)
       END AS r2_scaled,
       CASE WHEN n >= 2 AND varxn > 0 THEN round(covn / varxn, 6) END AS slope,
       CASE WHEN n >= 2 AND varxn > 0 AND varyn > 0
            THEN round(covn * covn / (varxn * varyn), 6) END AS r2
FROM _hp_f
"""


def coverage_curve(
    counts: DataFrame,
    ks: "Sequence[int]" = (10, 100, 1000),
    token_col: str = "tok",
    count_col: str = "exact",
) -> DataFrame:
    """Vocabulary coverage curve (tokenizer/vocab sizing input): for
    each requested vocabulary size k, the share of TOTAL token mass
    covered by the k most frequent types — the empirical curve behind
    "a 32k vocab covers 99.7% of occurrences" decisions.

    Shape: rank + cumulative over the vocabulary counts frame ride the
    cumulative.py partition-offset machinery (open vocabularies are
    not provably small); the k probe points join via a broadcast
    |ks|-row frame. A k beyond the vocabulary clamps to the full
    vocabulary (coverage 1.0). Exactness: covered/total are exact
    bigints, the ratio one 6-dp division.

    Output: one row per k — ``k, k_effective, covered, total,
    coverage``."""
    from stepist_spark.operators.cumulative import ordered_cumsum

    staged = counts.select(
        F.col(token_col).alias("_tok"),
        F.col(count_col).cast("bigint").alias("_c"),
    ).withColumn("_neg", -F.col("_c"))
    cum = ordered_cumsum(
        staged, ["_neg", "_tok"], ["_c"], tot_prefix="tot_"
    )
    from stepist_spark.operators.cumulative import global_row_number

    ranked = global_row_number(cum, ["_neg", "_tok"], out_col="_r", tot_col="_V")
    ks_df = counts.sparkSession.createDataFrame(
        [(int(k),) for k in sorted(set(int(k) for k in ks))], "k bigint"
    )
    # clamp k to |V| BEFORE the probe join so it stays a broadcast HASH
    # equi-join (a least(k, _V) condition on the join itself compiles
    # to BroadcastNestedLoopJoin — harmless at |ks| rows but banned by
    # the catalog plan-hygiene sweep); _V rides a 1-row aggregate frame
    vtot = ranked.agg(F.max("_V").alias("_V"))
    probes = ks_df.crossJoin(F.broadcast(vtot)).select(
        "k", F.least(F.col("k"), F.col("_V")).alias("_r")
    )
    return (
        F.broadcast(probes)
        .join(ranked, "_r")
        .select(
            "k",
            F.col("_r").alias("k_effective"),
            F.col("cum__c").alias("covered"),
            F.col("tot__c").alias("total"),
            F.round(
                F.col("cum__c").cast("double") / F.col("tot__c").cast("double"), 6
            ).alias("coverage"),
        )
    )


def coverage_curve_sql(
    counts_sql: str,
    ks: "Sequence[int]" = (10, 100, 1000),
    token_expr: str = "tok",
    count_expr: str = "exact",
) -> str:
    """DuckDB mirror of :func:`coverage_curve`."""
    ks_rows = ", ".join(f"({int(k)})" for k in sorted(set(int(k) for k in ks)))
    return f"""
WITH _cv_c AS (
    SELECT ({token_expr}) AS tok, CAST(({count_expr}) AS BIGINT) AS c
    FROM ({counts_sql})
),
_cv_r AS (
    SELECT c,
        CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS r,
        CAST(sum(c) OVER (ORDER BY c DESC, tok
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        CAST(sum(c) OVER () AS BIGINT) AS total,
        CAST(count(*) OVER () AS BIGINT) AS v
    FROM _cv_c
),
_cv_k AS (SELECT CAST(k AS BIGINT) AS k FROM (VALUES {ks_rows}) t(k))
SELECT k, r AS k_effective, cum AS covered, total,
       round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS coverage
FROM _cv_k JOIN _cv_r ON r = least(k, v)
"""


def zipf_slope_sql(counts_sql: str, token_expr: str = "tok", count_expr: str = "n_occurrences") -> str:
    """DuckDB mirror of :func:`zipf_slope` over the same counts frame
    (the oracle's window rank is the semantic twin of the
    partition-offset rank — the total order is identical)."""
    return f"""
WITH _zc AS (
    SELECT ({token_expr}) AS tok, CAST(({count_expr}) AS BIGINT) AS c
    FROM ({counts_sql})
),
_zr AS (
    SELECT c, CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS r
    FROM _zc
),
_zxy AS (
    SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000) AS HUGEINT) AS x,
           CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS HUGEINT) AS y
    FROM _zr
),
_zs AS (
    SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
    FROM _zxy
),
_zf AS (
    SELECT n,
        CAST(n * sxy - sx * sy AS DOUBLE) AS covn,
        CAST(n * sxx - sx * sx AS DOUBLE) AS varxn,
        CAST(n * syy - sy * sy AS DOUBLE) AS varyn
    FROM _zs
)
SELECT n AS n_vocab,
       CASE WHEN n >= 2 AND varxn > 0
            THEN CAST(floor(covn / varxn * 1000000) AS BIGINT) END AS slope_scaled,
       CASE WHEN n >= 2 AND varxn > 0 AND varyn > 0
            THEN CAST(floor(covn * covn / (varxn * varyn) * 1000000) AS BIGINT)
       END AS r2_scaled,
       CASE WHEN n >= 2 AND varxn > 0 THEN round(covn / varxn, 6) END AS slope,
       CASE WHEN n >= 2 AND varxn > 0 AND varyn > 0
            THEN round(covn * covn / (varxn * varyn), 6) END AS r2
FROM _zf
"""


def log_odds_tokens(
    gt: DataFrame, min_count: int = 1, k: int = 5, scale: int = 10**6
) -> DataFrame:
    """Per-group CHARACTERISTIC tokens by prior-smoothed log-odds z —
    the "Fightin' Words" method (Monroe, Colaresi & Quinn, Political
    Analysis 2008, public): for each group vs the rest of the corpus,
    ``δ_w = ln((y+1)/(n_i+V−y−1)) − ln((y'+1)/(n_j+V−y'−1))`` with the
    uniform Dirichlet α=1 prior (the corpus module's add-one
    discipline), ``σ²_w ≈ 1/(y+1) + 1/(y'+1)``, ``z = δ/σ`` — the
    variance term is what plain log-ratio keyword lists miss: rare
    tokens stop dominating.

    Same ``(grp, tok, c)`` input contract as the KL/JS shift operators
    — feed it the shared postings pass, never re-tokenize. Only cells
    with ``c > 0`` are scored (a token absent from the group has δ < 0
    and can never enter the top-k), which keeps each group's frame at
    its OWN vocabulary instead of the full support crossJoin the
    symmetric divergences need.

    Exactness: the log argument is a ratio of two exact
    decimal(38,0)/HUGEINT products (``(a·d_j) / (b·d_i)``), one ln and
    one division per cell; δ and z floor-scale to integers. Top-k per
    group by (z_scaled desc, tok asc) — deterministic k-boundary.

    Output: ``grp, tok, rank, c, c_all, delta_scaled, z_scaled``.
    """
    from stepist_spark.operators.cumulative import whole_frame
    from stepist_spark.operators.topk import grouped_topk

    vocab = (
        gt.groupBy("tok")
        .agg(F.sum("c").cast("bigint").alias("c_all"))
        .filter(F.col("c_all") >= min_count)
    )
    gv = gt.join(vocab.select("tok"), "tok").groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n_p")
    )
    gv = gv.select(
        "grp", "n_p", F.sum("n_p").over(whole_frame()).cast("bigint").alias("n_all")
    )
    v_count = vocab.select(F.count(F.lit(1)).cast("bigint").alias("v"))
    cells = (
        gt.join(vocab, "tok")
        .join(F.broadcast(gv), "grp")
        .crossJoin(F.broadcast(v_count))
    )
    dec = "decimal(38,0)"
    a = (F.col("c") + 1).cast(dec)
    b = ((F.col("c_all") - F.col("c")) + 1).cast(dec)
    di = (F.col("n_p") + F.col("v")).cast(dec) - a
    dj = ((F.col("n_all") - F.col("n_p")) + F.col("v")).cast(dec) - b
    delta = F.log((a * dj).cast("double") / (b * di).cast("double"))
    sig2 = F.lit(1.0) / a.cast("double") + F.lit(1.0) / b.cast("double")
    z = delta / F.sqrt(sig2)
    scored = cells.filter((di > 0) & (dj > 0)).select(
        "grp",
        "tok",
        F.col("c").cast("bigint").alias("c"),
        "c_all",
        F.floor(delta * F.lit(scale)).cast("bigint").alias("delta_scaled"),
        F.floor(z * F.lit(scale)).cast("bigint").alias("z_scaled"),
    )
    return grouped_topk(
        scored,
        ["grp"],
        [F.col("z_scaled").desc(), F.col("tok").asc()],
        k,
        rank_col="rank",
    ).select("grp", "tok", "rank", "c", "c_all", "delta_scaled", "z_scaled")


def log_odds_sql(
    table: str,
    text_expr: str,
    group_expr: str,
    min_count: int = 1,
    k: int = 5,
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`log_odds_tokens` fed from a raw corpus
    (same tokenize → per-(group, token) counts as js_shift_sql)."""
    from stepist_spark.functions.text import tokens_sql

    tk = tokens_sql(text_expr)
    return f"""
WITH _lo_tok AS (
    SELECT ({group_expr}) AS grp, unnest({tk}) AS tok FROM {table}
),
_lo_gt AS (
    SELECT grp, tok, CAST(count(*) AS BIGINT) AS c FROM _lo_tok GROUP BY grp, tok
),
_lo_vocab AS (
    SELECT tok, CAST(sum(c) AS BIGINT) AS c_all
    FROM _lo_gt GROUP BY tok HAVING sum(c) >= {min_count}
),
_lo_gv AS (
    SELECT grp, CAST(sum(c) AS BIGINT) AS n_p
    FROM _lo_gt JOIN _lo_vocab USING (tok) GROUP BY grp
),
_lo_tot AS (
    SELECT grp, n_p, CAST(sum(n_p) OVER () AS BIGINT) AS n_all FROM _lo_gv
),
_lo_v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM _lo_vocab),
_lo_cells AS (
    SELECT g.grp, g.tok, g.c, vb.c_all, t.n_p, t.n_all, v.v,
           CAST(g.c + 1 AS HUGEINT) AS a,
           CAST((vb.c_all - g.c) + 1 AS HUGEINT) AS b,
           CAST(t.n_p + v.v AS HUGEINT) - (g.c + 1) AS di,
           CAST((t.n_all - t.n_p) + v.v AS HUGEINT) - ((vb.c_all - g.c) + 1) AS dj
    FROM _lo_gt g
    JOIN _lo_vocab vb USING (tok)
    JOIN _lo_tot t ON t.grp = g.grp
    CROSS JOIN _lo_v v
),
_lo_z AS (
    SELECT grp, tok, c, c_all,
           CAST(floor(ln(CAST(a * dj AS DOUBLE) / CAST(b * di AS DOUBLE))
                      * {scale}) AS BIGINT) AS delta_scaled,
           CAST(floor(ln(CAST(a * dj AS DOUBLE) / CAST(b * di AS DOUBLE))
                      / sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE))
                      * {scale}) AS BIGINT) AS z_scaled
    FROM _lo_cells WHERE di > 0 AND dj > 0
),
_lo_r AS (
    SELECT *, row_number() OVER (
        PARTITION BY grp ORDER BY z_scaled DESC, tok ASC) AS rank
    FROM _lo_z
)
SELECT grp, tok, rank, c, c_all, delta_scaled, z_scaled
FROM _lo_r WHERE rank <= {k}
"""
