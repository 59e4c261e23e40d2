"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Training a byte-pair-encoding vocabulary IS a corpus job — the merges
come from corpus-wide pair statistics — but the classic algorithm
operates on the WORD-FREQUENCY table, not the raw text: all repeats of
a word contribute through one row's count. That makes the iterative
state vocab-sized (≪ corpus), so on Spark the expensive part — one
pass over 100 TB of text — happens ONCE (the word count), and each
merge iteration is a small-frame aggregate.

Per iteration: explode symbol pairs weighted by word count, one
hash-aggregate keyed by pair, take the argmax (deterministic
(count desc, pair asc) tiebreak — a one-row collect, the same bounded
driver-probe pattern as clusters.py's convergence check), then rewrite
each word's symbol array with a left-to-right merge fold (JVM HOF).
Lineage is truncated every few iterations (vocab-sized
localCheckpoint; use checkpoint() on a real cluster).

The reference has no tokenizer surface (SURVEY.md §2.2 'absent');
BASELINE.json LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stepist_spark.functions.text import tokens

_CHECKPOINT_EVERY = 8


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


def word_frequencies(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Lowercased whitespace-word frequency table: ``word, n`` — the
    one corpus-wide pass; everything after is vocab-sized."""
    return (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    corpus: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges. Returns ``(merges,
    segmentations)``: the ordered merge list (host-side — it IS the
    tokenizer artifact, a few KB) and the final ``word, n, sym``
    frame memoizing each training word's segmentation.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (weighted by word frequency).
    """
    wf = word_frequencies(corpus, text_col).select(
        "word", "n", _chars(F.col("word")).alias("sym")
    )
    wf = wf.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
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
        best = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right = best[0]["p"]["l"], best[0]["p"]["r"]
        merges.append((left, right))
        wf = wf.select("word", "n", _merge_once(F.col("sym"), left, right).alias("sym"))
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            wf = wf.localCheckpoint()
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
