"""Distributed unigram-LM (SentencePiece-style) tokenizer training
(Kudo 2018) — the BPE twin (operators/bpe.py discipline).

Where BPE GROWS a vocabulary by merging frequent pairs, the unigram LM
SHRINKS one: seed with frequent substrings, estimate piece
probabilities by EM (E-step: each training word's best segmentation
under the current scores; M-step: piece counts from those
segmentations re-normalized), and prune the pieces whose removal costs
the corpus likelihood least, until the target vocabulary remains.

Scale shape (the bpe.py contract): the corpus-wide pass happens ONCE
(word count); every EM iteration is a vocab-sized Viterbi pass over
the word-frequency frame (the memoized join — all repeats of a word
contribute through one row's count) + one hash-aggregate of piece
counts; the driver holds only vocab-sized state (the piece table IS
the tokenizer artifact, a few KB). The Viterbi DP exists in three
exactly-equal forms (integer arithmetic end-to-end, equality
unit-proven): a declarative JVM HOF-fold expression, the DuckDB
replay ``viterbi_segment_sql`` (the t24 'unigram' oracle), and an
Arrow-batched twin (the hot-path default — the nested per-position
lambdas of the JVM form fall out of whole-stage codegen and run
interpreted, the repo's documented numpy-twin case).

Cross-engine portability: piece scores are INTEGER-scaled log-probs
(``floor(log(p)·10⁶)`` — the t23 'ppl' fixed-point discipline), so
every DP comparison is exact bigint arithmetic and both engines pick
identical segmentations; ties break by (max score, fewest pieces,
smallest back-pointer) via lexicographic struct comparison, identical
in Spark's array_max and DuckDB's list_max.

The reference has no tokenizer surface (SURVEY.md §2.2 'absent');
BASELINE.json LLM-pipeline extension.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stepist_spark.operators.bpe import word_frequencies

#: fixed-point scale for log-probabilities (the t23 'ppl' discipline)
LOGP_SCALE = 1_000_000
#: scaled log-prob charged to a single character absent from the piece
#: table — worse than any real piece (p ≈ e^-10), so known pieces are
#: always preferred, but every string stays segmentable
UNK_LOGP = -10_000_000
#: "minus infinity" sentinel for invalid DP candidates; far below any
#: reachable path score yet safe under bigint addition
_NEG = -(1 << 50)


def _dp_expr(word: Column, pieces: dict[str, int], max_piece_len: int) -> Column:
    """The Viterbi DP array over ``word``: element i+1 holds the best
    path to position i as ``struct(s, mk, mb)`` = (scaled log-prob,
    −piece count, −back-pointer) — negated fields so the lexicographic
    struct max IS the tie-break and entries are stored unmodified."""
    pm = F.create_map(
        *[F.lit(x) for kv in pieces.items() for x in kv]
    ) if pieces else F.create_map()
    zero = F.struct(
        F.lit(0).cast("bigint").alias("s"),
        F.lit(0).cast("bigint").alias("mk"),
        F.lit(0).cast("bigint").alias("mb"),
    )

    def step(acc, i):
        def cand(j):
            sub = F.substring(word, (j + 1).cast("int"), (i - j).cast("int"))
            lk = F.try_element_at(pm, sub)
            prev = F.element_at(acc, (j + 1).cast("int"))
            known = lk.isNotNull()
            single = (i - j) == 1
            return F.struct(
                F.when(known, prev["s"] + lk)
                .when(single, prev["s"] + F.lit(UNK_LOGP))
                .otherwise(F.lit(_NEG))
                .cast("bigint")
                .alias("s"),
                F.when(known | single, prev["mk"] - 1)
                .otherwise(F.lit(_NEG))
                .cast("bigint")
                .alias("mk"),
                (-j).cast("bigint").alias("mb"),
            )

        lo = F.greatest(i - max_piece_len, F.lit(0))
        return F.concat(
            acc,
            F.array(F.array_max(F.transform(F.sequence(lo, i - 1), cand))),
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(zero),
        step,
    )


def _backtrace_expr(word: Column, dparr: Column) -> Column:
    """Recover the best segmentation from a :func:`_dp_expr` array:
    fold word-length steps of ``pos -> backptr(pos)``, prepending the
    piece ``word[b:pos]`` each step (no-op once pos reaches 0)."""
    init = F.struct(
        F.length(word).cast("bigint").alias("pos"),
        F.array().cast("array<string>").alias("seg"),
    )

    def step(acc, _i):
        pos = acc["pos"]
        b = -F.element_at(dparr, (pos + 1).cast("int"))["mb"]
        piece = F.substring(word, (b + 1).cast("int"), (pos - b).cast("int"))
        return F.when(
            pos > 0,
            F.struct(
                b.alias("pos"),
                F.concat(F.array(piece), acc["seg"]).alias("seg"),
            ),
        ).otherwise(acc)

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)), init, step
    )["seg"]


def viterbi_segment(
    df: DataFrame,
    pieces: dict[str, int],
    word_col: str = "word",
    max_piece_len: int = 4,
    impl: str = "arrow",
) -> DataFrame:
    """Best-path unigram segmentation of a word column under integer-
    scaled piece log-probs. Adds ``sym array<string>, logp_scaled
    bigint, n_pieces int``. Unknown single characters cost
    :data:`UNK_LOGP` each, so every word (incl. OOV alphabets)
    segments deterministically.

    Two implementations computing IDENTICAL integers (equality
    unit-proven, so the choice never moves a gate hash):

    - ``impl="jvm"`` — the declarative HOF-fold DP (:func:`_dp_expr` +
      :func:`_backtrace_expr`): no Python anywhere, and the exact
      expression :func:`viterbi_segment_sql` mirrors. Its nested
      per-position lambdas fall OUT of whole-stage codegen and run
      interpreted (~55 µs/word measured at t24's sf0.1 shape).
    - ``impl="arrow"`` (default) — the numpy-twin discipline (the
      repo's documented escape hatch for large per-row expression
      trees): an Arrow-batched pandas iterator running
      :func:`viterbi_py` per word — the same integer DP, same
      tie-break tuple, ~10× less per-word overhead.
    """
    if impl == "jvm":
        w = F.col(word_col)
        dp = _dp_expr(w, pieces, max_piece_len)
        out = df.withColumn("_dp", dp)
        last = F.element_at(F.col("_dp"), (F.length(w) + 1).cast("int"))
        return out.select(
            *df.columns,
            _backtrace_expr(w, F.col("_dp")).alias("sym"),
            last["s"].alias("logp_scaled"),
            (-last["mk"]).cast("int").alias("n_pieces"),
        )
    if impl != "arrow":
        raise ValueError(f"unknown impl {impl!r}; 'arrow' or 'jvm'")
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sym", T.ArrayType(T.StringType())),
            T.StructField("logp_scaled", T.LongType()),
            T.StructField("n_pieces", T.IntegerType()),
        ]
    )

    def op(batches):
        for pdf in batches:
            cols = pdf[word_col].map(
                lambda w: viterbi_py(w, pieces, max_piece_len)
            )
            pdf = pdf.copy()
            pdf["sym"] = cols.map(lambda t: t[2])
            pdf["logp_scaled"] = cols.map(lambda t: t[0])
            pdf["n_pieces"] = cols.map(lambda t: t[1])
            yield pdf

    return df.mapInPandas(op, schema=schema)


def viterbi_segment_sql(
    word_expr: str, pieces: dict[str, int], max_piece_len: int = 4
) -> dict[str, str]:
    """DuckDB mirror of :func:`viterbi_segment`: SQL fragments keyed
    ``dp`` (the DP-array expression over ``word_expr``), and — given a
    column named ``dparr`` holding that array — ``score`` / ``np`` /
    ``seg`` (the certified outputs). Same integer scores, same
    struct-lexicographic tie-break, same 1-based substr geometry."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    if pieces:
        pm = (
            "MAP(["
            + ", ".join(q(k) for k in pieces)
            + "], ["
            + ", ".join(f"CAST({v} AS BIGINT)" for v in pieces.values())
            + "])"
        )
    else:
        pm = "MAP([], [])"
    w = word_expr
    i = "x[1].s"
    sub = f"substr({w}, CAST(j + 1 AS INTEGER), CAST({i} - j AS INTEGER))"
    lk = f"map_extract({pm}, {sub})"
    prev = "list_extract(acc, CAST(j + 1 AS INTEGER))"
    cand = (
        f"list_max(list_transform(range(greatest(0, {i} - {max_piece_len}), {i}), j -> "
        f"{{'s': CASE WHEN len({lk}) > 0 THEN {prev}.s + {lk}[1] "
        f"WHEN {i} - j = 1 THEN {prev}.s + ({UNK_LOGP}) "
        f"ELSE CAST({_NEG} AS BIGINT) END, "
        f"'mk': CASE WHEN len({lk}) > 0 OR {i} - j = 1 THEN {prev}.mk - 1 "
        f"ELSE CAST({_NEG} AS BIGINT) END, "
        f"'mb': -j}}))"
    )
    wrap = (
        f"list_transform(range(1, len({w}) + 1), i -> "
        "[{'s': CAST(i AS BIGINT), 'mk': CAST(i AS BIGINT), 'mb': CAST(i AS BIGINT)}])"
    )
    dp = (
        "list_reduce(list_prepend([{'s': CAST(0 AS BIGINT), 'mk': CAST(0 AS BIGINT), "
        f"'mb': CAST(0 AS BIGINT)}}], {wrap}), (acc, x) -> list_append(acc, {cand}))"
    )
    pos = "list_extract(acc, CAST(len(acc) AS INTEGER)).pos"
    b = f"(-(list_extract(dparr, CAST({pos} + 1 AS INTEGER)).mb))"
    bt_step = (
        f"CASE WHEN {pos} > 0 THEN list_append(acc, "
        f"{{'pos': {b}, "
        f"'seg': list_prepend(substr({w}, CAST({b} + 1 AS INTEGER), "
        f"CAST({pos} - {b} AS INTEGER)), "
        "list_extract(acc, CAST(len(acc) AS INTEGER)).seg)}) "
        "ELSE list_append(acc, list_extract(acc, CAST(len(acc) AS INTEGER))) END"
    )
    btwrap = (
        f"list_transform(range(1, len({w}) + 1), i -> "
        "[{'pos': CAST(i AS BIGINT), 'seg': CAST([] AS VARCHAR[])}])"
    )
    bt = (
        f"list_reduce(list_prepend([{{'pos': CAST(len({w}) AS BIGINT), "
        f"'seg': CAST([] AS VARCHAR[])}}], {btwrap}), (acc, x) -> {bt_step})"
    )
    last = f"list_extract(dparr, CAST(len({w}) + 1 AS INTEGER))"
    return {
        "dp": dp,
        "score": f"{last}.s",
        "np": f"CAST(-({last}.mk) AS INTEGER)",
        "seg": f"list_extract({bt}, CAST(len({w}) + 1 AS INTEGER)).seg",
    }


def seed_pieces(
    wf: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 2,
    seed_size: int = 256,
) -> DataFrame:
    """Seed candidate pieces: every substring of length 2..max_piece_len
    of every training word, counted with word-frequency weights — one
    explode + one hash aggregate (the shuffle carries only distinct
    substrings). Output: ``piece, cnt`` — the top ``seed_size`` by
    (cnt desc, piece asc), substrings under ``min_count`` dropped.
    Single characters are NOT included here; the trainer adds them
    unconditionally (they are never pruned — the coverage floor)."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda p: F.filter(
                F.transform(
                    F.sequence(F.lit(2), F.lit(max_piece_len)),
                    lambda l: F.when(
                        p + l - 1 <= F.length(w), F.substring(w, p.cast("int"), l.cast("int"))
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    counted = (
        wf.select(F.explode(subs).alias("piece"), F.col("n"))
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    return counted.orderBy(F.col("cnt").desc(), F.col("piece").asc()).limit(seed_size)


def _scores_from_counts(counts: dict[str, int]) -> dict[str, int]:
    """M-step: integer-scaled log-probs from piece counts (driver-side
    — the dict IS the vocab-sized artifact)."""
    total = sum(counts.values())
    return {
        p: math.floor(math.log(c / total) * LOGP_SCALE)
        for p, c in counts.items()
        if c > 0
    }


def viterbi_py(word: str, pieces: dict[str, int], max_piece_len: int = 4):
    """Pure-Python twin of the JVM/SQL DP — the trainer's prune-loss
    probe over piece STRINGS (vocab-sized work) and the parity oracle
    in tests. Returns ``(scaled_score, n_pieces, [pieces])``."""
    best = [(0, 0, 0)]
    for i in range(1, len(word) + 1):
        cands = []
        for j in range(max(0, i - max_piece_len), i):
            sub = word[j:i]
            if sub in pieces:
                s = best[j][0] + pieces[sub]
            elif i - j == 1:
                s = best[j][0] + UNK_LOGP
            else:
                continue
            cands.append((s, -(best[j][1] + 1), -j))
        c = max(cands)
        best.append((c[0], -c[1], -c[2]))
    pos, seg = len(word), []
    while pos > 0:
        b = best[pos][2]
        seg.insert(0, word[b:pos])
        pos = b
    return best[len(word)][0], best[len(word)][1], seg


def train_unigram(
    corpus: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    seed_size: int = 256,
    max_piece_len: int = 4,
    em_iters: int = 2,
    prune_keep: float = 0.75,
    min_count: int = 2,
) -> tuple[dict[str, int], DataFrame]:
    """Learn a unigram-LM piece table. Returns ``(pieces, seg)``:
    ``pieces`` maps piece → integer-scaled log-prob (host-side — the
    tokenizer artifact), ``seg`` is the final ``word, n, sym,
    logp_scaled, n_pieces`` frame memoizing each training word's
    segmentation.

    Outer loop (SentencePiece shape): run ``em_iters`` Viterbi-EM
    iterations — E-step = one distributed :func:`viterbi_segment`
    pass over the word-frequency frame + one piece-count aggregate;
    M-step = re-normalized integer log-probs — then, while the
    vocabulary exceeds ``vocab_size``, prune the non-character pieces
    with the LOWEST removal loss (loss = count · (own score − best
    alternative segmentation's score, probed with :func:`viterbi_py`
    on the piece string)) down to ``max(vocab_size, ⌈keep·|V|⌉)``,
    and repeat. Single characters are never pruned (coverage floor).
    Zero-count pieces fall out at each M-step exactly as in
    SentencePiece."""
    if not 0.0 < prune_keep < 1.0:
        raise ValueError("prune_keep must be in (0, 1)")
    wf = word_frequencies(corpus, text_col).localCheckpoint()
    chars = {
        r["c"]: int(r["cnt"])
        for r in wf.select(
            F.explode(F.split(F.col("word"), "")).alias("c"), F.col("n")
        )
        .filter(F.length("c") == 1)
        .groupBy("c")
        .agg(F.sum("n").alias("cnt"))
        .collect()
    }
    seeds = {
        r["piece"]: int(r["cnt"])
        for r in seed_pieces(
            wf, max_piece_len=max_piece_len, min_count=min_count, seed_size=seed_size
        ).collect()
    }
    counts = dict(seeds)
    for c, n in chars.items():
        counts.setdefault(c, n)
    scores = _scores_from_counts(counts)

    def em(scores: dict[str, int]) -> dict[str, int]:
        for _ in range(em_iters):
            seg = viterbi_segment(wf, scores, "word", max_piece_len)
            got = {
                r["piece"]: int(r["cnt"])
                for r in seg.select(F.explode("sym").alias("piece"), F.col("n"))
                .groupBy("piece")
                .agg(F.sum("n").alias("cnt"))
                .collect()
            }
            # characters keep a floor count of 1: they must stay
            # segmentable even when every occurrence currently rides a
            # longer piece
            counts = {
                p: got.get(p, 1 if len(p) == 1 else 0)
                for p in scores
                if len(p) == 1 or got.get(p, 0) > 0
            }
            scores = _scores_from_counts(counts)
        return scores

    scores = em(scores)
    while len(scores) > vocab_size:
        target = max(vocab_size, math.ceil(len(scores) * prune_keep))
        losses = []
        for p, lp in scores.items():
            if len(p) == 1:
                continue
            others = {k: v for k, v in scores.items() if k != p}
            alt, _, _ = viterbi_py(p, others, max_piece_len)
            # count·(own − alt): how much corpus log-prob is lost if
            # every use of p re-segments through the alternatives
            cnt = counts_of(scores, wf, p, max_piece_len)
            losses.append((cnt * (lp - alt), p))
        losses.sort(key=lambda t: (t[0], t[1]))
        n_char = sum(1 for p in scores if len(p) == 1)
        drop = {p for _, p in losses[: max(0, len(scores) - max(target, n_char))]}
        if not drop:
            break
        scores = {p: lp for p, lp in scores.items() if p not in drop}
        scores = em(scores)
    seg = viterbi_segment(wf, scores, "word", max_piece_len)
    return scores, seg


# piece-count cache for the prune loop: ONE distributed count pass per
# prune round, not one per piece
_COUNT_CACHE: dict = {"key": None, "counts": {}}


def counts_of(
    scores: dict[str, int], wf: DataFrame, piece: str, max_piece_len: int
) -> int:
    """Count of ``piece`` in the current Viterbi segmentation of the
    word-frequency frame — computed once per score table (cached by
    identity-ish key) and read per piece by the prune loop."""
    key = (id(wf), tuple(sorted(scores.items())))
    if _COUNT_CACHE["key"] != key:
        seg = viterbi_segment(wf, scores, "word", max_piece_len)
        _COUNT_CACHE["counts"] = {
            r["piece"]: int(r["cnt"])
            for r in seg.select(F.explode("sym").alias("piece"), F.col("n"))
            .groupBy("piece")
            .agg(F.sum("n").alias("cnt"))
            .collect()
        }
        _COUNT_CACHE["key"] = key
    return _COUNT_CACHE["counts"].get(piece, 0)
