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


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


def avg_token_len(text: Column) -> Column:
    """Mean token length, 0.0 for empty docs (no ANSI division-by-zero)."""
    toks = tokens(text)
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


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
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
    of a pretraining-data pipeline.
    """
    n = token_count(text).cast("double")
    return F.round(
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * F.least(avg_token_len(text) / F.lit(8.0), F.lit(1.0)),
        6,
    )


def quality_score_sql(expr: str) -> str:
    return (
        f"round(0.4 * least(CAST({token_count_sql(expr)} AS DOUBLE) / 100.0, 1.0) "
        f"+ 0.3 * (1.0 - {punct_ratio_sql(expr)}) "
        f"+ 0.3 * least({avg_token_len_sql(expr)} / 8.0, 1.0), 6)"
    )


def lang_id(text: Column) -> Column:
    """Deterministic language guess: argmax of per-language stopword
    hit counts; ties (incl. zero hits) resolve to the earliest language
    in LANGS, with 'und' when no stopword matched at all."""
    toks = tokens(text)
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
