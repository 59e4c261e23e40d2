"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Training a byte-pair-encoding vocabulary IS a corpus job — the merges
come from corpus-wide pair statistics — but the classic algorithm
operates on the WORD-FREQUENCY table, not the raw text: all repeats of
a word contribute through one row's count. That makes the iterative
state vocab-sized (≪ corpus), so on Spark the expensive part — one
pass over 100 TB of text — happens ONCE (the word count), and each
merge iteration is a small-frame aggregate.

Per round: explode symbol pairs weighted by word count, one
hash-aggregate keyed by pair, a bounded driver collect of the top
candidates (the same bounded-probe pattern as clusters.py's
convergence check) from which :func:`_select_merge_batch` picks up to
``batch_size`` merges, then ONE combined left-to-right fold applies
the whole batch. Lineage is truncated each round (vocab-sized
localCheckpoint; use checkpoint() on a real cluster).

The reference has no tokenizer surface (SURVEY.md §2.2 'absent');
BASELINE.json LLM-pipeline extension.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stepist_spark.functions.text import tokens

logger = logging.getLogger(__name__)


def _chars(word) -> "F.Column":
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: F.substring(word, i, 1)
    )


def _merge_once(sym, left: str, right: str):
    """Left-to-right single-pass merge of adjacent (left, right) into
    one symbol — the BPE apply step, as a JVM fold."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.lit(left), F.lit(right))),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _merge_batch_once(sym, batch: list[tuple[str, str]]):
    """ONE left-to-right pass applying a whole batch of mutually
    non-interacting merges (disjoint symbols, collision-free concats —
    exactly what :func:`_select_merge_batch` + the vocab guard emit):
    a map lookup ``(last, current) -> merged`` replaces N sequential
    fold passes, so codegen compiles one fold per ROUND instead of one
    per merge. For such batches the combined pass is provably equal to
    applying the merges one pass at a time: no batch pair references
    another's symbols or concat, so merge sites never overlap.

    Map keys join the pair with NUL. A token CAN technically contain a
    literal NUL byte (whitespace split does not forbid it), which would
    make two distinct pairs collide on one key — ``train_bpe`` detects
    NUL-bearing batch symbols and falls back to sequential
    :func:`_merge_once` folds for that round, so this fast path only
    ever sees collision-free batches.
    """
    entries = []
    for left, right in batch:
        entries.append(F.lit(left + "\x00" + right))
        entries.append(F.lit(left + right))
    m = F.create_map(*entries)

    def step(acc, s):
        key = F.concat(F.element_at(acc, -1), F.lit("\x00"), s)
        merged = F.element_at(m, key)
        return F.when(
            (F.size(acc) > 0) & merged.isNotNull(),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(sym, F.array().cast("array<string>"), step)


def word_frequencies(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Lowercased whitespace-word frequency table: ``word, n`` — the
    one corpus-wide pass; everything after is vocab-sized."""
    return (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _select_merge_batch(
    rows,
    max_batch: int,
    min_pair_count: int,
    saw_all: bool,
    vocab: set[str] | None = None,
    exact: bool = True,
) -> list[tuple[str, str]]:
    """Exact-safe batch selection from (count desc, pair asc)-ordered
    candidates — the batching rule that keeps batched training
    bit-identical to one-merge-at-a-time BPE:

    - walk the sorted candidates, selecting while every symbol is
      unseen in the batch (including the CONCATS of already-selected
      pairs — a pair referencing a merged symbol can GAIN occurrences
      mid-batch); STOP at the first conflicting pair (no skip-and-
      continue — a skipped higher-count pair could, after the batch,
      still outrank a later selection);
    - merging a selected pair only DECREASES counts of pairs touching
      it (those sit after the stop position, so ≤ the stop count) and
      creates new pairs bounded by those touching counts — so any
      selected pair with count strictly ABOVE the stop count remains
      the true sequential argmax. Selected pairs that TIE the stop
      count are dropped (a tied rival or new pair could win the
      (count, pair) name tiebreak);
    - a SELF-OVERLAPPING selection ``(x, x)`` is the one case where a
      new pair's bound is not visible to the conflict stop: merging it
      creates ``(xx, x)`` / ``(x, xx)`` / ``(xx, xx)`` whose counts are
      bounded by the selection's OWN count (each occurrence needs a run
      of ≥ 3 ``x``'s, contributing ≥ 2 to ``count(x, x)``, so new-pair
      counts ≤ ``c // 2``) — every later selection must strictly beat
      ``c // 2`` or be dropped;
    - a truncated candidate list (``saw_all`` False) bounds unseen
      candidates at the last seen count — same trailing-tie drop;
    - a sub-threshold stop needs no drop: every rival is then bounded
      strictly below ``min_pair_count``;
    - always keep at least the first pair (the exact argmax), so every
      round makes progress.

    The one interaction this walk cannot see is a selected concat that
    equals a symbol occurring in pairs BEYOND the fetched window —
    :func:`train_bpe` closes that hole with a corpus-wide concat probe
    and falls back to a single-merge round on a hit.
    """
    selected: list[tuple[str, str, int]] = []
    used: set[str] = set()
    concats: set[str] = set()
    bound: int | None = None
    selfbound: int | None = None
    for row in rows:
        left, right, c = row["p"]["l"], row["p"]["r"], int(row["c"])
        if c < min_pair_count:
            bound = None  # every remaining rival is sub-threshold
            break
        if not exact:
            # standard distributed-BPE batching: greedy top-k DISJOINT
            # pairs, skipping conflicts — merge ORDER can deviate from
            # sequential BPE when counts tie or interact, the accepted
            # trade for k× fewer corpus rounds at scale
            if len(selected) >= max_batch:
                break
            if (
                left in used or right in used
                or left in concats or right in concats
                or left + right in concats
                or (vocab is not None and left + right in vocab and selected)
            ):
                continue
            selected.append((left, right, c))
            used.add(left)
            used.add(right)
            concats.add(left + right)
            continue
        # the FIRST candidate is the exact argmax — always selectable
        # (a lone merge is trivially sequential); checks apply after
        if selected and (
            len(selected) >= max_batch
            or left in used
            or right in used
            or left in concats
            or right in concats
            # a concat that is ALREADY a live symbol (or an earlier
            # selection's concat) could gain occurrences mid-batch —
            # treat as a conflict stop, same bound machinery
            or (vocab is not None and left + right in vocab)
            or left + right in concats
        ):
            bound = c
            break
        selected.append((left, right, c))
        used.add(left)
        used.add(right)
        concats.add(left + right)
        if left == right:
            # self-overlap: merging (x, x) creates (xx, x)-shaped pairs
            # bounded by c // 2 — invisible to the conflict stop (the
            # pair touching (x, x)'s symbols is (x, x) itself)
            selfbound = c // 2 if selfbound is None else max(selfbound, c // 2)
        if len(selected) == 1 and vocab is not None and left + right in vocab:
            # the argmax's own concat is a live symbol: pairs
            # referencing it gain occurrences in ways no in-window
            # bound can cap — emit a single-merge round
            break
    else:
        if exact and not saw_all and selected:
            bound = selected[-1][2]
    if exact and selfbound is not None:
        bound = selfbound if bound is None else max(bound, selfbound)
    if exact and bound is not None:
        kept = [s for s in selected if s[2] > bound]
        selected = kept or selected[:1]
    return [(l, r) for l, r, _ in selected]


def train_bpe(
    corpus: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    batch_size: int = 32,
    exact: bool = True,
    auto_relax_after: int | None = 3,
    round_log: list | None = None,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges. Returns ``(merges,
    segmentations)``: the ordered merge list (host-side — it IS the
    tokenizer artifact, a few KB) and the final ``word, n, sym``
    frame memoizing each training word's segmentation.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (weighted by word frequency).

    Scale shape: the corpus-wide pass happens once (word count);
    each round is ONE vocab-sized aggregation + one bounded driver
    collect (≤ ~4·batch_size candidate rows) that yields up to
    ``batch_size`` merges via :func:`_select_merge_batch`, applied in
    a single combined fold pass — so a 32k-merge vocabulary costs
    ~32k/batch_size Spark jobs, not 32k.

    ``exact=True`` (default) restricts each batch so the merge
    sequence is IDENTICAL to one-merge-at-a-time BPE
    (tests/test_bpe.py proves it against a Python reference); on
    tie-heavy pair distributions the safe batch can degenerate toward
    one merge per round. ``exact=False`` is the standard
    distributed-BPE batching — greedy top-k disjoint pairs, skipping
    conflicts — which keeps full batches on any distribution but may
    reorder tied/interacting merges: the right mode for a 32k-merge
    production vocabulary, where sequential fidelity of tie-breaks is
    irrelevant.

    ``auto_relax_after=K``: after K CONSECUTIVE degenerate exact rounds
    (1 merge selected with a larger batch requested — the tie-heavy
    signature), switch the REMAINING rounds to ``exact=False`` batching
    with a loud warning, bounding total rounds on adversarial
    distributions. The DEFAULT is 3 (round-6 verdict: an adversarial
    tie-heavy corpus could otherwise cost ~n_merges Spark jobs for a
    production 32k-merge vocabulary); pass ``None`` to keep exact mode
    to the end — it then only warns, preserving the strict
    sequential-fidelity guarantee at unbounded round cost.

    ``round_log``: optional list; appends each round's batch size —
    diagnostics for round-count regressions.
    """
    wf = word_frequencies(corpus, text_col).select(
        "word", "n", _chars(F.col("word")).alias("sym")
    )
    wf = wf.localCheckpoint()
    # the live symbol vocabulary is exactly {initial characters} ∪
    # {concats of applied merges} — tracked driver-side so the concat-
    # collision guard costs no Spark job (a few KB even at 100 TB: it
    # is the tokenizer alphabet, not the corpus)
    vocab: set[str] = {
        r["s"] for r in wf.select(F.explode("sym").alias("s")).distinct().collect()
    }
    merges: list[tuple[str, str]] = []
    fetch = max(4 * batch_size, 64)
    degenerate = 0
    relaxed = False
    while len(merges) < n_merges:
        pairs = wf.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice(F.col("sym"), 1, F.greatest(F.size("sym") - 1, F.lit(0))),
                    F.slice(F.col("sym"), 2, F.greatest(F.size("sym") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        rows = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(fetch)
            .collect()
        )
        want = min(batch_size, n_merges - len(merges))
        batch = _select_merge_batch(
            rows,
            max_batch=want,
            min_pair_count=min_pair_count,
            saw_all=len(rows) < fetch,
            vocab=vocab,
            exact=exact and not relaxed,
        )
        if round_log is not None:
            round_log.append(len(batch))
        if not batch:
            break
        if exact and not relaxed and want > 1 and len(batch) == 1:
            degenerate += 1
            if auto_relax_after is not None and degenerate >= auto_relax_after:
                relaxed = True
                logger.warning(
                    "train_bpe: %d consecutive degenerate exact rounds "
                    "(tie-heavy pair distribution, 1 merge/round); "
                    "switching remaining rounds to exact=False batching",
                    degenerate,
                )
            elif auto_relax_after is None and degenerate == 3:
                logger.warning(
                    "train_bpe: tie-heavy distribution degenerating to one "
                    "merge per exact round; pass exact=False or "
                    "auto_relax_after=K to bound total rounds"
                )
        elif len(batch) > 1:
            degenerate = 0
        merges.extend(batch)
        vocab.update(l + r for l, r in batch)
        if any("\x00" in l or "\x00" in r for l, r in batch):
            # NUL inside a symbol would collide _merge_batch_once's
            # NUL-joined map keys: apply this (pathological) batch as
            # sequential folds instead — semantically identical
            sym = F.col("sym")
            for left, right in batch:
                sym = _merge_once(sym, left, right)
        else:
            sym = _merge_batch_once(F.col("sym"), batch)
        wf = wf.select("word", "n", sym.alias("sym")).localCheckpoint()
    return merges, wf


def bpe_segment(
    docs: DataFrame,
    segmentations: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment documents with a trained BPE model. Known words join the
    memoized ``segmentations`` table (shuffle join on the word — the
    table is vocab-sized but unbounded, so it is NOT broadcast);
    out-of-vocabulary words fall back to a character split with every
    merge applied in order (plan depth = a handful of trailing merges —
    cap the OOV fallback list, the memo table carries the bulk).
    Output: ``id_col, pos, word, sym``.
    """
    ws = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "word")
    )
    seg = segmentations.select("word", F.col("sym").alias("_known"))
    joined = ws.join(seg, "word", "left")
    oov = _chars(F.col("word"))
    for left, right in merges:
        oov = _merge_once(oov, left, right)
    return joined.select(
        id_col, "pos", "word", F.coalesce(F.col("_known"), oov).alias("sym")
    )
