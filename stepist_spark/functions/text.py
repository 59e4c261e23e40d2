"""Text analysis built from JVM-side expressions (no Python in the path).

LLM-pipeline text operators over the ``documents`` table: tokenization,
token counting, quality scoring (length / punctuation / stopword
ratios), and a deterministic stopword-overlap language-ID heuristic.
Each has a DuckDB-dialect mirror generated from the same constants for
the oracle gate. The reference has no scalar-function surface at all —
handlers are arbitrary Python (`stepist/flow/steps/step.py:120`,
example `README.markdown:84-86` counts substring occurrences); these
are its Spark-native replacements plus the BASELINE.json extensions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic stopword lists per language — the lang-ID heuristic
# scores each language by stopword hits and takes the argmax
# (first-in-list wins ties). Fixed literals shared with the oracle SQL.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}
LANGS = list(STOPWORDS)
PUNCT_RE = r"[.,!?;:'\"()\[\]{}-]"
PUNCT_RE_SQL = PUNCT_RE.replace("'", "''")  # escape the quote for SQL literals
WS_RE = r"\s+"


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(F.split(F.lower(text), WS_RE), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return rf"list_filter(string_split_regex(lower({expr}), '\s+'), t -> t <> '')"


def token_count(text: Column, toks: Column | None = None) -> Column:
    return F.size(tokens(text) if toks is None else toks)


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


# BPE-ish pre-tokenizer: the GPT-2-style splitter shape (contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs)
# without lookaheads, so Java regex (Spark) and RE2 (DuckDB) agree.
SUBWORD_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9']+"


def subword_tokens(text: Column) -> Column:
    """BPE-style pre-tokens (lowercased): the unit a byte-pair encoder
    would merge within. ``regexp_extract_all`` keeps this JVM-side."""
    return F.regexp_extract_all(F.lower(text), F.lit(SUBWORD_RE), F.lit(0))


def subword_tokens_sql(expr: str) -> str:
    pat = SUBWORD_RE.replace("'", "''")
    return f"regexp_extract_all(lower({expr}), '{pat}')"


def subword_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(SUBWORD_RE), F.lit(0)))


def subword_token_count_sql(expr: str) -> str:
    pat = SUBWORD_RE.replace("'", "''")
    return f"len(regexp_extract_all(lower({expr}), '{pat}'))"


def avg_token_len(text: Column, toks: Column | None = None) -> Column:
    """Mean token length, 0.0 for empty docs (no ANSI division-by-zero).
    Pass a pre-bound ``toks`` column on hot paths (see
    :func:`quality_score_scaled`)."""
    toks = tokens(text) if toks is None else toks
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def avg_token_len_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE) / len({toks}) "
        f"ELSE 0.0 END"
    )


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0.0 for empty strings)."""
    stripped = F.regexp_replace(text, PUNCT_RE, "")
    return F.when(
        F.length(text) > 0,
        (F.length(text) - F.length(stripped)).cast("double") / F.length(text),
    ).otherwise(F.lit(0.0))


def punct_ratio_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"CAST(length({expr}) - length(regexp_replace({expr}, '{PUNCT_RE_SQL}', '', 'g')) AS DOUBLE)"
        f" / length({expr}) ELSE 0.0 END"
    )


def stopword_ratio(text: Column, lang: str = "en", toks: Column | None = None) -> Column:
    toks = tokens(text) if toks is None else toks
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio_sql(expr: str, lang: str = "en") -> str:
    toks = tokens_sql(expr)
    sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_filter({toks}, t -> list_contains({sw}, t))) AS DOUBLE) / len({toks}) "
        f"ELSE 0.0 END"
    )


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0, 1]:
    0.4 · min(tokens/100, 1) + 0.3 · (1 − punct_ratio) + 0.3 · min(avg_len/8, 1).

    Cheap length/punctuation-based filtering, the standard first pass
    of a pretraining-data pipeline. Float variant for users; oracle
    queries use :func:`quality_score_scaled` (exact integer arithmetic
    — composite FP scores land on decimal .5 rounding boundaries where
    engines legitimately disagree by one ulp).
    """
    return quality_score_scaled(text).cast("double") / F.lit(1_000_000.0)


def _intdiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative bigints without relying
    on engine-specific div operators: (a - a%b)/b — the numerator is an
    exact multiple of b and both fit in 2^53, so the FP quotient is the
    exact integer on every IEEE engine."""
    return ((a - a % b) / b).cast("bigint")


def _intdiv_sql(a: str, b: str) -> str:
    return f"CAST((({a}) - ({a}) % ({b})) / ({b}) AS BIGINT)"


def quality_score_scaled(text: Column, toks: Column | None = None) -> Column:
    """Integer-scaled quality score in [0, 1_000_000]: same formula as
    :func:`quality_score` with every term in exact bigint arithmetic,
    so Spark and any oracle engine agree bit-for-bit. Empty docs
    score 0.

    Pass ``toks`` as a PRE-BOUND column (``withColumn("_tk",
    tokens(text))`` in a prior projection) on hot paths: the token
    array is referenced ~8× here, and an inlined tokenizer expression
    is re-evaluated at every reference (no CSE across the expression
    tree), measurably dominating the stage."""
    toks = tokens(text) if toks is None else toks
    n = F.size(toks).cast("bigint")
    total_chars = F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t))
    stripped = F.length(F.regexp_replace(text, PUNCT_RE, "")).cast("bigint")
    tlen = F.length(text).cast("bigint")
    part1 = F.lit(4000).cast("bigint") * F.least(n, F.lit(100).cast("bigint"))
    part2 = F.when(
        tlen > 0, _intdiv(F.lit(300000).cast("bigint") * stripped, tlen)
    ).otherwise(F.lit(300000).cast("bigint"))
    part3 = F.when(
        n > 0,
        _intdiv(
            F.lit(300000).cast("bigint") * F.least(total_chars, F.lit(8).cast("bigint") * n),
            F.lit(8).cast("bigint") * n,
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    return F.when(n > 0, part1 + part2 + part3).otherwise(F.lit(0).cast("bigint"))


def quality_score_scaled_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    n = f"len({toks})"
    total = f"CAST(list_sum(list_transform({toks}, t -> length(t))) AS BIGINT)"
    stripped = f"length(regexp_replace({expr}, '{PUNCT_RE_SQL}', '', 'g'))"
    part1 = f"4000 * least({n}, 100)"
    part2 = (
        f"CASE WHEN length({expr}) > 0 THEN {_intdiv_sql(f'300000 * {stripped}', f'length({expr})')} "
        f"ELSE 300000 END"
    )
    part3 = (
        f"CASE WHEN {n} > 0 THEN {_intdiv_sql(f'300000 * least({total}, 8 * {n})', f'8 * {n}')} "
        f"ELSE 0 END"
    )
    return f"CASE WHEN {n} > 0 THEN CAST({part1} + {part2} + {part3} AS BIGINT) ELSE 0 END"


def quality_score_scaled_vec(text: Column) -> Column:
    """Arrow-batched vectorized twin of :func:`quality_score_scaled`:
    one pandas_udf evaluating the identical integer formula with
    pandas str ops + numpy int64 arithmetic — bit-identical results,
    certified by the same oracle SQL.

    Why it exists: the HOF form references the token array ~8×, and
    Spark's interpreted higher-order expressions re-evaluate per
    reference (no CSE), which dominated c01's runtime. Here each batch
    pays four vectorized regex passes total. Use this on hot paths
    that score entire corpora; the HOF form remains for single-column
    projections where staying JVM-side matters more.

    Character classes are pinned to Java regex semantics: \\s in Java
    is ASCII-only ([ \\t\\n\\x0b\\f\\r]) while Python's re defaults to
    Unicode, so the token/char counts use the explicit ASCII class.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws_cls = r"[ \t\n\x0b\f\r]"
    non_ws_cls = r"[^ \t\n\x0b\f\r]+"

    def _score(s):
        s = s.fillna("")
        n = s.str.count(non_ws_cls).to_numpy(dtype=np.int64)
        total = s.str.replace(ws_cls, "", regex=True).str.len().to_numpy(dtype=np.int64)
        tlen = s.str.len().to_numpy(dtype=np.int64)
        stripped = s.str.replace(PUNCT_RE, "", regex=True).str.len().to_numpy(dtype=np.int64)
        part1 = 4000 * np.minimum(n, 100)
        part2 = np.where(tlen > 0, (300000 * stripped) // np.maximum(tlen, 1), 300000)
        part3 = np.where(
            n > 0, (300000 * np.minimum(total, 8 * n)) // np.maximum(8 * n, 1), 0
        )
        return pd.Series(np.where(n > 0, part1 + part2 + part3, 0).astype(np.int64))

    # explicit scalar eval type: module-level `from __future__ import
    # annotations` stringifies hints, which the hint-based API rejects
    return pandas_udf(_score, "bigint")(text)


def lang_id(text: Column, toks: Column | None = None) -> Column:
    """Deterministic language guess: argmax of per-language stopword
    hit counts; ties (incl. zero hits) resolve to the earliest language
    in LANGS, with 'und' when no stopword matched at all."""
    toks = tokens(text) if toks is None else toks
    scores = []
    for lang in LANGS:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(F.size(F.filter(toks, lambda t: F.array_contains(sw, t))))
    best = F.greatest(*scores)
    out = F.lit("und")
    for lang, score in reversed(list(zip(LANGS, scores))):
        out = F.when((best > 0) & (score == best), F.lit(lang)).otherwise(out)
    return out


def lang_id_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    score = {}
    for lang in LANGS:
        sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
        score[lang] = f"len(list_filter({toks}, t -> list_contains({sw}, t)))"
    best = "greatest(" + ", ".join(score.values()) + ")"
    whens = " ".join(
        f"WHEN {best} > 0 AND {score[lang]} = {best} THEN '{lang}'" for lang in LANGS
    )
    return f"CASE {whens} ELSE 'und' END"


# --------------------------------------------------------------------------
# Repetition signals (Gopher-style intra-document repetition filters,
# Rae et al. 2021 §A1.1): pre-training curation drops documents whose
# content repeats itself — boilerplate listings, scraped templates,
# keyword stuffing. All JVM-side array/HOF expressions; the pairwise
# counting lambdas are O(L²)/O(G²) in the number of LINES / 2-GRAMS of
# ONE document (never across documents), so cost is bounded by document
# size and the whole computation stays a narrow map at any corpus scale.


def doc_lines(text: Column) -> Column:
    """Trimmed non-blank lines of a document (bind to a real column
    before passing as ``lines=`` on hot paths — interpreted HOF lambdas
    re-evaluate non-attribute argument expressions per reference)."""
    # regex trim, not F.trim — Spark's trim strips only spaces, so a
    # tab-only line would survive as a "distinct" line
    return F.filter(
        F.transform(
            F.split(text, r"\n"), lambda l: F.regexp_replace(l, r"^\s+|\s+$", "")
        ),
        lambda l: l != "",
    )


def dup_line_frac(text: Column, lines: Column | None = None) -> Column:
    """Fraction of lines that are repeats of an earlier-seen line
    (0.0 for empty docs): 1 − distinct/total, Gopher's
    ``duplicate_line_fraction``."""
    lines = doc_lines(text) if lines is None else lines
    return F.when(
        F.size(lines) > 0,
        (F.size(lines) - F.size(F.array_distinct(lines))).cast("double")
        / F.size(lines),
    ).otherwise(F.lit(0.0))


def _dup_run_chars(sorted_arr: Column) -> Column:
    """Total characters in elements whose value occurs >1 time in the
    SORTED array — one linear fold tracking the current equal-run
    (prev value, run length, chars-if-duplicated accumulator)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("dup"),
    )

    def step(acc, x):
        same = acc["prev"].isNotNull() & (acc["prev"] == x)
        # entering a run's 2nd element banks the 1st element's chars too
        add = F.when(
            same & (acc["run"] == 1), F.length(x).cast("bigint") * 2
        ).when(same, F.length(x).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("bigint")).alias("run"),
            (acc["dup"] + add).alias("dup"),
        )

    return F.aggregate(sorted_arr, init, step)["dup"]


def dup_line_char_frac(text: Column, lines: Column | None = None) -> Column:
    """Fraction of line-characters belonging to lines that occur more
    than once in the document (Gopher's
    ``duplicate_line_character_fraction``). Linear per document: sort
    the lines, then one fold over equal runs — the naive
    count-each-line-against-all form is O(L²) and dominates a corpus
    scan on long documents."""
    lines = doc_lines(text) if lines is None else lines
    dup_chars = _dup_run_chars(F.array_sort(lines))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
    )
    return F.when(
        total_chars > 0, dup_chars.cast("double") / total_chars
    ).otherwise(F.lit(0.0))


def word_bigrams(text: Column, toks: Column | None = None) -> Column:
    """Adjacent word 2-grams (``"a b"``) from the whitespace tokens."""
    toks = tokens(text) if toks is None else toks
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def top_bigram_share(text: Column, toks: Column | None = None) -> Column:
    """Share of 2-gram occurrences taken by the most frequent 2-gram
    (Gopher's ``top_2gram_fraction`` shape); 0.0 when the doc has fewer
    than two tokens. High values flag keyword stuffing / template spam.
    Linear per document (sort + longest-equal-run fold), not the O(G²)
    count-each-against-all form."""
    grams = F.array_sort(word_bigrams(text, toks))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):
        run = F.when(
            acc["prev"].isNotNull() & (acc["prev"] == x), acc["run"] + 1
        ).otherwise(F.lit(1).cast("bigint"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    max_cnt = F.aggregate(grams, init, step)["best"]
    return F.when(
        F.size(grams) > 0, max_cnt.cast("double") / F.size(grams)
    ).otherwise(F.lit(0.0))


def repetition_signals(text: Column, toks: Column | None = None) -> Column:
    """Struct of the three Gopher repetition filters —
    ``dup_line_frac``, ``dup_line_char_frac``, ``top_bigram_share`` —
    for one-pass curation scans (filter with e.g. ``dup_line_frac <=
    0.3 AND top_bigram_share <= 0.2``)."""
    lines = doc_lines(text)
    return F.struct(
        dup_line_frac(text, lines).alias("dup_line_frac"),
        dup_line_char_frac(text, lines).alias("dup_line_char_frac"),
        top_bigram_share(text, toks).alias("top_bigram_share"),
    )


# --------------------------------------------------------------------------
# PII redaction (CCNet/Dolma-style pre-training scrub). All JVM-side
# regexp_replace — no Python in the path, safe to run over a full
# corpus scan. Patterns are deliberately conservative, high-precision
# forms (emails, IPv4, international-ish phone runs); redaction order
# matters: emails first (their local part can look like a phone run),
# then IPs (dotted digits), then phones. A phone needs either a
# +country / (area) prefix with ≥1 separated digit group, or ≥3
# separated groups bare — ISO dates (2026-08-13) are a documented,
# accepted false positive of the bare form, as in most corpus
# scrubbers; lone small numbers never match.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    (
        "phone",
        r"(?:(?:\+\d{1,3}[ .-]?)?\(\d{2,4}\)[ .-]?\d{2,4}(?:[ .-]\d{2,4}){1,4}"
        r"|\+\d{1,3}[ .-]?\d{2,4}(?:[ .-]\d{2,4}){1,4}"
        r"|\d{2,4}(?:[ .-]\d{2,4}){2,4})",
    ),
)


def redact_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace each PII match with a ``[KIND]`` tag (``[EMAIL]``,
    ``[IPV4]``, ``[PHONE]``). ``kinds`` selects/reorders pattern
    subsets; default applies all in precedence order."""
    out = text
    for kind, pat in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pat, f"[{kind.upper()}]")
    return out


def doc_lines_sql(expr: str) -> str:
    """DuckDB mirror of :func:`doc_lines`."""
    return (
        f"list_filter(list_transform(string_split({expr}, chr(10)), "
        f"l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')), l -> l <> '')"
    )


def dup_line_frac_sql(lines: str) -> str:
    """DuckDB mirror of :func:`dup_line_frac` over a bound lines expr."""
    return (
        f"CASE WHEN len({lines}) > 0 THEN "
        f"CAST(len({lines}) - len(list_distinct({lines})) AS DOUBLE) / len({lines}) "
        f"ELSE 0.0 END"
    )


def dup_line_char_frac_sql(lines: str) -> str:
    """DuckDB mirror of :func:`dup_line_char_frac` over a bound lines expr."""
    dup = (
        f"coalesce(list_sum(list_transform({lines}, "
        f"l -> CASE WHEN len(list_filter({lines}, x -> x = l)) > 1 "
        f"THEN length(l) ELSE 0 END)), 0)"
    )
    tot = f"coalesce(list_sum(list_transform({lines}, l -> length(l))), 0)"
    return f"CASE WHEN {tot} > 0 THEN CAST({dup} AS DOUBLE) / {tot} ELSE 0.0 END"


def top_bigram_share_sql(toks: str) -> str:
    """DuckDB mirror of :func:`top_bigram_share` over a bound tokens expr."""
    grams = (
        f"list_transform(range(1, len({toks})), "
        f"i -> list_extract({toks}, i) || ' ' || list_extract({toks}, i + 1))"
    )
    # bind grams once via a scalar subquery-free trick: inline twice is
    # fine for the oracle (DuckDB CSE handles it); mirror the exact
    # integer/size arithmetic of the Spark HOF
    max_cnt = (
        f"list_max(list_transform(list_distinct({grams}), "
        f"g -> len(list_filter({grams}, x -> x = g))))"
    )
    return (
        f"CASE WHEN len({grams}) > 0 THEN CAST({max_cnt} AS DOUBLE) / len({grams}) "
        f"ELSE 0.0 END"
    )


def redact_pii_sql(expr: str, kinds: tuple[str, ...] | None = None) -> str:
    """DuckDB mirror of :func:`redact_pii` (regexp_replace needs the
    explicit ``'g'`` flag there; patterns are RE2-compatible — no
    lookaround/backreferences — so both engines see the same matches)."""
    out = expr
    for kind, pat in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        out = f"regexp_replace({out}, '{pat}', '[{kind.upper()}]', 'g')"
    return out


def pii_counts_sql(expr: str) -> list[tuple[str, str]]:
    """DuckDB mirror of :func:`pii_counts`: ``[(kind, count_expr)]``
    over the same precedence-redacted intermediate text."""
    out = []
    cur = expr
    for kind, pat in PII_PATTERNS:
        out.append((kind, f"len(regexp_extract_all({cur}, '{pat}'))"))
        cur = f"regexp_replace({cur}, '{pat}', '[{kind.upper()}]', 'g')"
    return out


def pii_counts(text: Column) -> Column:
    """Struct of per-kind match counts (``email``, ``ipv4``,
    ``phone``) — the audit/filter side of :func:`redact_pii` (e.g.
    drop documents whose counts exceed a policy threshold). Counts are
    taken on the same precedence-redacted text as redact_pii, so a
    digit run inside an email is never double-counted as a phone."""
    fields = []
    cur = text
    for kind, pat in PII_PATTERNS:
        fields.append(F.regexp_count(cur, F.lit(pat)).alias(kind))
        cur = F.regexp_replace(cur, pat, f"[{kind.upper()}]")
    return F.struct(*fields)


def sentence_count(text: Column) -> Column:
    """Heuristic sentence count: segments between runs of sentence
    terminators ``. ! ?`` that contain at least one non-whitespace
    character — the C4/Gopher-style structural quality signal
    (too-few-sentences docs are boilerplate or navigation debris).
    Regex-split + filter stay JVM-side. The emptiness check is the
    EXPLICIT class ``[^ \\t\\n\\r]`` rather than trim() or ``\\S``:
    trim strips only ASCII spaces (a tab-only segment would count) and
    the ``\\s`` class differs between Java regex, RE2, and Python —
    the literal class means all three agree."""
    segs = F.split(text, r"[.!?]+")
    return F.size(
        F.filter(segs, lambda s: s.rlike("[^ \\t\\n\\r]"))
    ).cast("bigint")


def sentence_count_sql(expr: str) -> str:
    return (
        f"CAST(len(list_filter(string_split_regex({expr}, '[.!?]+'), "
        f"s -> regexp_matches(s, '[^ \\t\\n\\r]'))) AS BIGINT)"
    )


def syllable_count(text: Column, toks: Column | None = None) -> Column:
    """Heuristic total syllables: per token, the number of vowel GROUPS
    (``[aeiouy]+`` runs, min 1 per token) — the standard cheap English
    syllable proxy behind readability formulas (Flesch 1948, public).
    One JVM higher-order fold over the token array, no UDF."""
    tk = tokens(text) if toks is None else toks
    # vowel groups = split-segments − 1 (split keeps leading/trailing
    # empties in BOTH Spark split(limit=-1 default) and DuckDB
    # string_split_regex, so the count is identical)
    counts = F.transform(
        tk,
        lambda t: F.greatest(F.lit(1), F.size(F.split(t, "[aeiouy]+")) - 1),
    )
    return F.aggregate(counts, F.lit(0).cast("bigint"), lambda a, x: a + x)


def syllable_count_sql(expr: str) -> str:
    """DuckDB mirror of :func:`syllable_count`."""
    tk = tokens_sql(expr)
    # coalesce: DuckDB's list_sum of an EMPTY list is NULL, Spark's
    # aggregate with a 0 init is 0
    return (
        f"CAST(coalesce(list_sum(list_transform({tk}, t -> greatest(1, "
        f"len(string_split_regex(t, '[aeiouy]+')) - 1))), 0) AS BIGINT)"
    )


def flesch_reading_ease(text: Column, toks: Column | None = None) -> Column:
    """Flesch reading ease (Flesch 1948): ``206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words)`` with the heuristic
    :func:`syllable_count`. NULL when the doc has no words or no
    sentences. Two exact-integer divisions and a fixed literal
    combination — the same IEEE sequence in both engines; round at
    the call site."""
    tk = tokens(text) if toks is None else toks
    w = F.size(tk).cast("double")
    s = sentence_count(text).cast("double")
    sy = syllable_count(text, toks=tk).cast("double")
    return F.when(
        (w > 0) & (s > 0),
        F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (sy / w),
    )


def flesch_reading_ease_sql(expr: str) -> str:
    """DuckDB mirror of :func:`flesch_reading_ease` — identical
    expression order."""
    w = f"CAST({token_count_sql(expr)} AS DOUBLE)"
    s = f"CAST({sentence_count_sql(expr)} AS DOUBLE)"
    sy = f"CAST({syllable_count_sql(expr)} AS DOUBLE)"
    return (
        f"CASE WHEN {w} > 0 AND {s} > 0 THEN "
        f"206.835 - 1.015 * ({w} / {s}) - 84.6 * ({sy} / {w}) END"
    )


def canonical_text(text: Column) -> Column:
    """Canonical form for normalization-robust dedup (the
    RefinedWeb/C4 'normalized hash' discipline): lowercase, every run
    of non-alphanumerics collapses to ONE space, trimmed. A document
    re-encoded with different casing, punctuation or whitespace maps
    to the same canonical string while genuinely different content
    does not. One JVM lower + one global regexp_replace — codegen,
    no UDF; the character class is spelled explicitly ([^a-z0-9]+)
    so Java and RE2 regex agree byte-for-byte."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def canonical_text_sql(expr: str) -> str:
    """DuckDB mirror of :func:`canonical_text`."""
    return f"trim(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"


# Classic UTF-8-decoded-as-Latin-1 artifacts (the 'A-tilde + continua-
# tion' and 'a-circumflex + punctuation' digraph families) plus the
# U+FFFD replacement character — the standard mojibake fingerprints of
# encoding-damaged web text. Built from codepoint escapes so the
# pattern is identical bytes in the Java-regex and RE2 mirrors.
MOJIBAKE_RE = (
    "(\u00c3[\u0080-\u00bf]"      # UTF-8 lead 0xC3 read as Latin-1
    "|\u00e2[\u0080-\u00be]"      # UTF-8 lead 0xE2 (punctuation family)
    "|\ufffd)"                      # replacement character
)
NON_ASCII_RE = "[^\\x00-\\x7f]"


def mojibake_count(text: Column) -> Column:
    """Occurrences of classic encoding-damage artifacts (mojibake
    digraphs + U+FFFD). One JVM regexp pass — a standard web-corpus
    quality gate signal."""
    return F.size(F.regexp_extract_all(text, F.lit(MOJIBAKE_RE), 0)).cast("bigint")


def mojibake_count_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{MOJIBAKE_RE}')) AS BIGINT)"


def non_ascii_count(text: Column) -> Column:
    """Characters outside ASCII — a high ratio on an expected-ASCII
    corpus flags double-encoding or binary contamination."""
    return F.size(F.regexp_extract_all(text, F.lit(NON_ASCII_RE), 0)).cast("bigint")


def non_ascii_count_sql(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '[^\\x00-\\x7f]')) AS BIGINT)"


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC normalization — the canonical-composition scrubber
    every multilingual corpus needs before hashing/dedup: the SAME
    visible text can arrive precomposed (é = U+00E9) or decomposed
    (e + U+0301), and byte-keyed operators (md5 dedup, shingles,
    exact-substr windows) silently treat them as different documents.

    Spark has no built-in Unicode normalizer, so this is an
    Arrow-batched pandas_udf over Python's unicodedata (the documented
    slow path — one str pass per row, no per-character Python).
    Cross-engine: DuckDB's ``nfc_normalize`` implements the same
    Unicode canonical composition, and NFC is stable for assigned
    codepoints across Unicode versions, so both engines agree
    byte-for-byte on real text.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    def _norm(s):
        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    return pandas_udf(_norm, "string")(text)


def nfc_normalize_sql(expr: str) -> str:
    """DuckDB mirror of :func:`nfc_normalize`."""
    return f"nfc_normalize({expr})"
