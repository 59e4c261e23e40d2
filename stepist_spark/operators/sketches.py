"""Mergeable sketches: the at-scale answer for distinct counts.

An exact COUNT(DISTINCT x) at 100 TB shuffles every distinct value; a
Datasketches HLL sketch is a few KB per group, merges associatively,
and can be PRE-AGGREGATED: build sketches per partition/day once, then
answer any rollup (per week, per region, total) by merging sketches —
no rescan of the raw data. This is the pattern behind every serious
"distinct users per X" pipeline.

All built on Spark's native HLL functions (JVM, Datasketches-
compatible binary representation) — no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_sketches(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    sketch_col: str = "sketch",
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per key group — the materialized,
    mergeable form of a distinct count (store this, not the raw data).
    ``lg_k`` trades size (2^lg_k buckets) for error (~1.04/sqrt(2^lg_k),
    ≈1.6% at the default)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*key_list).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge pre-built sketches up to a coarser key set and estimate.

    The merge is a tiny shuffle of fixed-size binaries — the raw data
    is never touched again.
    """
    merged = sketches.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


def estimate(sketches: DataFrame, sketch_col: str = "sketch", estimate_col: str = "approx_distinct") -> DataFrame:
    return sketches.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    ).drop(sketch_col)


# --------------------------------------------------------------------------
# Portable HLL: an HyperLogLog whose registers derive from the repo's
# md5 hash (functions.hashing.span_hash60), so an independent engine
# (the DuckDB oracle) recomputes BIT-IDENTICAL registers — making even
# the approximation hash-checkable. The register sum is integer-scaled
# (each register contributes 2^(SCALE_BITS - M), an exact bigint), so
# the harmonic-mean denominator is order-independent; only the final
# alpha·m²·2^SCALE/S division (correctly rounded) and the small-range
# ln() correction (rounded to 4 dp) touch floating point.
#
# Native Datasketches HLL (build_sketches/rollup_sketches above) stays
# the production path — identical API shape; this is the engine-
# portable variant and the driver-gate subject (q21).
HLL_P = 9  # 512 registers, ~4.6% standard error
HLL_SCALE_BITS = 52


def hll_alpha_mm(p: int = HLL_P) -> float:
    m = 1 << p
    return (0.7213 / (1 + 1.079 / m)) * m * m


def portable_hll_registers(
    df: DataFrame,
    keys: str | Sequence[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Per-group HLL register table: ``*keys, bucket, reg`` (max rho).

    bucket = low ``p`` bits of the 60-bit portable hash; rho = leading-
    zero rank of the remaining ``60-p`` bits (via binary-string length —
    integer-exact on any engine). Registers MERGE by max(reg): rolling
    up to coarser keys is another groupBy-max over kilobyte-scale
    register rows, never the raw data — same pattern as the native
    sketch path.
    """
    from stepist_spark.functions.hashing import span_hash60

    key_list = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p
    maxbits = 60 - p
    h = span_hash60(F.col(value_col).cast("string"))
    # integer shift, NOT division — `/` is double division and a 60-bit
    # hash exceeds the 2^53 exact-integer range of doubles
    w = F.shiftright(h, p)
    nbits = F.length(F.conv(w, 10, 2))
    rho = F.when(w == 0, F.lit(maxbits + 1)).otherwise(F.lit(maxbits + 1) - nbits)
    hashed = df.select(
        *key_list,
        F.pmod(h, F.lit(m)).cast("int").alias("bucket"),
        rho.cast("int").alias("_rho"),
    )
    return hashed.groupBy(*key_list, "bucket").agg(F.max("_rho").alias("reg"))


def portable_hll_merge(
    registers: DataFrame, keys: str | Sequence[str]
) -> DataFrame:
    """Merge register tables up to a coarser key set (max per bucket)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return registers.groupBy(*key_list, "bucket").agg(F.max("reg").alias("reg"))


def portable_hll_estimate(
    registers: DataFrame,
    keys: str | Sequence[str],
    p: int = HLL_P,
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Group estimates from a register table, engine-portable:
    S = Σ 2^(SCALE-reg) over present registers + zeros·2^SCALE (exact
    bigints), E = alpha·m²·2^SCALE / S, with the standard small-range
    linear-counting correction when empty registers remain. Rounded to
    4 dp (the ln() in the correction is the one not-correctly-rounded
    libm call in the pipeline)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p
    grouped = registers.groupBy(*key_list).agg(
        # expr(): pyspark's shiftleft() insists on a literal bit count
        F.sum(F.expr(f"shiftleft(1L, {HLL_SCALE_BITS} - reg)")).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_present"),
    )
    zeros = F.lit(m) - F.col("_n_present")
    s_total = F.col("_s_present") + zeros * F.shiftleft(
        F.lit(1).cast("bigint"), HLL_SCALE_BITS
    )
    raw = F.lit(hll_alpha_mm(p)) * F.lit(float(1 << HLL_SCALE_BITS)) / s_total
    corrected = F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return grouped.select(
        *key_list, F.round(corrected, 4).alias(estimate_col)
    )


def frequent_items(
    df: DataFrame,
    item_col: str,
    capacity: int = 128,
    k: int | None = None,
) -> DataFrame:
    """Heavy hitters via per-partition summarize-then-merge (the
    Misra-Gries/space-saving family shape). Output: ``item, weight``
    for the top ``k`` (default ``capacity``) items by merged weight,
    deterministic item-string tiebreak.

    Stage 1 counts items exactly WITHIN each partition (streamed over
    Arrow batches, one dict per partition — vocabulary-sized, not
    partition-sized) and emits only its top ``capacity`` entries.
    Stage 2 merges summaries with one item-keyed hash aggregation.

    Guarantees: any item with true global count > n/(capacity+1) in
    every partition survives stage 1, and merged weights never
    overcount. When per-partition distinct items ≤ capacity the result
    is EXACT (the oracle-tested regime); otherwise weights are
    undercounts bounded by each partition's dropped tail — the standard
    mergeable-summary trade. At 100 TB the shuffle carries
    ``capacity × partitions`` rows, not the corpus.
    """
    import pandas as pd

    top_k = capacity if k is None else k

    def _partial(batches):
        counts: dict = {}
        for pdf in batches:
            for item, c in pdf[item_col].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
        if not counts:
            return
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:capacity]
        yield pd.DataFrame({"item": [t[0] for t in top], "weight": [t[1] for t in top]})

    partials = df.select(F.col(item_col).alias(item_col)).mapInPandas(
        _partial, schema="item string, weight bigint"
    )
    merged = partials.groupBy("item").agg(F.sum("weight").alias("weight"))
    return (
        merged.orderBy(F.col("weight").desc(), F.col("item").asc())
        .limit(top_k)
    )


# --------------------------------------------------------------------------
# Bloom filter: mergeable set-membership bitmap.
#
# The broadcast-side complement of the HLL above: where HLL answers
# "how many distinct", a Bloom filter answers "is this value possibly
# in the set" with no false negatives and a bounded false-positive
# rate. At 100 TB the use-case is the two-stage membership test:
# broadcasting an exact benchmark-shingle set for decontamination can
# run to GBs, but its Bloom bitmap is KBs — broadcast the bitmap,
# pre-filter the corpus (drops ~everything), then exact-verify only the
# survivors (the same filter→verify shape as LSH→Jaccard).
#
# Portability: bit positions come from the repo-wide md5-derived
# word_hash32 with per-hash seed prefixes, and the bitmap uses 63 bits
# per bigint word — the sign bit is never set, so ``1 << pos`` behaves
# identically in every engine (no engine-specific semantics of
# shifting into two's-complement sign). The bitmap is SPARSE
# (word_idx -> word): only non-zero words ship, merges are a bit_or
# per word_idx, and the empty filter is the empty frame.

BLOOM_WORD_BITS = 63


def _bit_value(bit_in_word):
    """``1 << bit`` for a COLUMN shift amount (F.shiftleft only takes a
    Python int): element_at over the 63 literal powers of two."""
    powers = F.array(*[F.lit(1 << i).cast("bigint") for i in range(BLOOM_WORD_BITS)])
    return F.element_at(powers, bit_in_word.cast("int") + F.lit(1))


def _bloom_positions(col, m_bits: int, n_hashes: int):
    """k portable bit positions for a value: md5('i:' || value) % m."""
    from stepist_spark.functions import hashing

    return [
        hashing.word_hash32(F.concat(F.lit(f"{i}:"), col)) % F.lit(m_bits)
        for i in range(n_hashes)
    ]


def _bloom_positions_sql(expr: str, m_bits: int, n_hashes: int) -> list[str]:
    from stepist_spark.functions import hashing

    out = []
    for i in range(n_hashes):
        seeded = f"'{i}:' || {expr}"
        out.append(f"({hashing.word_hash32_sql(seeded)} % {m_bits})")
    return out


def _plan_is_materialized(df: DataFrame) -> bool:
    """True when evaluating ``df`` is (near-)free: cached/persisted, or
    backed by an already-computed RDD / local rows (checkpoint,
    createDataFrame). Used to decide whether an eager driver-side guard
    is affordable — against an unmaterialized plan it would compute the
    whole upstream aggregate once for the guard and again for the real
    query."""
    try:
        lvl = df.storageLevel
        if lvl.useMemory or lvl.useDisk:
            return True
    except Exception:
        pass
    try:
        head = df._jdf.queryExecution().logical().nodeName()
        return head in ("LogicalRDD", "LocalRelation")
    except Exception:
        return False


def _probe_ready(sketch: DataFrame, expect: dict[str, int]) -> DataFrame:
    """Prepare a sketch for probing: materialize it once if needed,
    then validate ALL distinct stamp combinations eagerly.

    Probes reference the sketch once per hash/depth row, so an
    unmaterialized sketch plan would re-run its full upstream aggregate
    k times (plus once more for any eager guard — the round-3 ADVICE
    hazard). localCheckpoint-ing the KB-scale cell/word table first
    makes every reference (and the guard) read the computed rows — the
    guard is COMPLETE again: a wrong-parameter probe raises even when
    every lookup would miss (where a lazy join-side check would
    silently return false negatives / zero estimates)."""
    if not _plan_is_materialized(sketch):
        sketch = sketch.localCheckpoint()
    cols = set(sketch.columns)
    if all(c in cols for c in expect):
        rows = sketch.select(*expect).distinct().collect()
        for row in rows:
            for name, want in expect.items():
                got = row[name]
                if got is not None and int(got) != want:
                    raise ValueError(
                        f"sketch was built with {name}={got}, "
                        f"probed with {name}={want}"
                    )
    return sketch


def _stamp_guard(value: "F.Column", expect: dict[str, int], what: str) -> "F.Column":
    """Fold a lazy parameter check into a probed sketch value: the value
    passes through iff every stamp column equals the expected build
    parameter, else the task raises. Zero extra passes — evaluated only
    on rows the probe actually touches (a full check is the eager path
    in :func:`_probe_ready`)."""
    cond = F.lit(True)
    for name, want in expect.items():
        cond = cond & (F.col(name) == F.lit(want))
    return F.when(cond, value).otherwise(
        F.raise_error(
            f"{what}: sketch stamp differs from probe parameters {expect} "
            "— probing with the wrong m/width maps values to the wrong cells"
        )
    )


def _uniform_stamp(name: str, what: str) -> "F.Column":
    """A stamp column that raises unless it is constant across the whole
    frame — the merge-time guard against unioning shards built with
    different parameters. One whole-frame window over the MERGED sketch
    (KB-scale by construction), not over the raw data."""
    from stepist_spark.operators.cumulative import whole_frame

    w = whole_frame()
    return F.when(
        F.min(name).over(w) == F.max(name).over(w), F.col(name)
    ).otherwise(
        F.raise_error(
            f"{what}: shards were built with mismatched {name} — "
            "sketches only merge when build parameters agree"
        )
    ).alias(name)


def _uniform_guard(value: "F.Column", names: list[str], what: str) -> "F.Column":
    """Pruning-proof companion to :func:`_uniform_stamp`: fold the
    mismatched-shard condition into the DATA column itself, so the
    check survives even when a consumer never references the stamp
    columns (round-4 ADVICE: ``bloom_merge(a, b).select('word_idx',
    'word')`` let Catalyst column-prune the stamp guard away and a
    mismatched merge could silently emit a false-negative bitmap).
    Same whole-frame window as ``_uniform_stamp`` — Catalyst plans the
    shared window spec once, so this adds no extra pass."""
    from stepist_spark.operators.cumulative import whole_frame

    w = whole_frame()
    cond = F.lit(True)
    for name in names:
        cond = cond & (F.min(name).over(w) == F.max(name).over(w))
    return F.when(cond, value).otherwise(
        F.raise_error(
            f"{what}: shards were built with mismatched {'/'.join(names)} — "
            "sketches only merge when build parameters agree"
        )
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Build a sparse Bloom bitmap over ``value_col``.

    Output: ``word_idx, word, m_bits, n_hashes`` — one row per
    non-zero 63-bit word; the last two are the stamped build parameters
    (constant), which :func:`bloom_probe` validates against. One
    explode (k rows per value) + one hash-aggregate (map-side partial
    bit_or), so the shuffle carries at most m/63 rows total. Merge
    shard bitmaps with :func:`bloom_merge`.
    """
    pos = F.explode(F.array(*_bloom_positions(F.col(value_col), m_bits, n_hashes)))
    p = df.select(pos.alias("p"))
    return (
        # floor, not cast: Spark casts double->bigint by truncation but
        # other engines round -- floor() is unambiguous in both
        p.groupBy(F.floor(F.col("p") / BLOOM_WORD_BITS).cast("bigint").alias("word_idx"))
        .agg(F.bit_or(_bit_value(F.col("p") % BLOOM_WORD_BITS)).alias("word"))
        .select(
            "word_idx",
            "word",
            F.lit(m_bits).cast("bigint").alias("m_bits"),
            F.lit(n_hashes).cast("int").alias("n_hashes"),
        )
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge shard bitmaps by bit_or per word. Shards built with
    mismatched (m_bits, n_hashes) raise at evaluation time — grouping
    alone would keep them as separate rows and silently produce a
    bitmap with false NEGATIVES."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    merged = out.groupBy("word_idx", "m_bits", "n_hashes").agg(
        F.bit_or("word").alias("word")
    )
    return merged.select(
        "word_idx",
        _uniform_guard(
            F.col("word"), ["m_bits", "n_hashes"], "bloom_merge"
        ).alias("word"),
        _uniform_stamp("m_bits", "bloom_merge"),
        _uniform_stamp("n_hashes", "bloom_merge"),
    )


def bloom_probe(
    df: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    flag_col: str = "maybe_member",
) -> DataFrame:
    """Append ``flag_col``: True iff every one of the value's k bits is
    set in ``bloom`` (possibly-member; False is definite non-member).

    Lookup strategy: k BROADCAST HASH JOINS of the probe frame against
    the sparse word table, one per hash — an O(1) hashed lookup per
    probe. (The tempting alternative — packing the bitmap into one
    broadcast MAP column — is an O(|bitmap|) linear scan per
    ``element_at``: Spark's GetMapValue has no hash index, which would
    defeat the scale path for dense bitmaps.) The probe side never
    shuffles and gains no fan-out: word_idx is unique per bitmap, so
    every join matches at most one row.
    """
    expect = {"m_bits": m_bits, "n_hashes": n_hashes}
    bloom = _probe_ready(bloom, expect)
    if set(expect) <= set(bloom.columns):
        # belt-and-suspenders in-plan guard on top of _probe_ready's
        # eager check: any touched word with disagreeing stamps raises
        words = bloom.select(
            "word_idx", _stamp_guard(F.col("word"), expect, "bloom_probe").alias("word")
        )
    else:
        words = bloom.select("word_idx", "word")
    out = df
    flag_cols = []
    for i, pos in enumerate(_bloom_positions(F.col(value_col), m_bits, n_hashes)):
        wi = F.floor(pos / BLOOM_WORD_BITS).cast("bigint")
        mask = _bit_value(pos % BLOOM_WORD_BITS)
        side = words.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("word").alias(f"_w{i}")
        )
        out = (
            out.join(F.broadcast(side), wi == F.col(f"_wi{i}"), "left")
            .withColumn(
                f"_f{i}",
                F.coalesce(F.col(f"_w{i}"), F.lit(0)).bitwiseAND(mask) != 0,
            )
            .drop(f"_wi{i}", f"_w{i}")
        )
        flag_cols.append(F.col(f"_f{i}"))
    flag = flag_cols[0]
    for c in flag_cols[1:]:
        flag = flag & c
    return out.withColumn(flag_col, flag).drop(*[f"_f{i}" for i in range(n_hashes)])


# --------------------------------------------------------------------------
# Count-min sketch: mergeable per-key frequency estimation.
#
# Completes the sketch family: HLL answers "how many distinct", Bloom
# "is it a member", frequent_items "which keys are heavy", count-min
# "ABOUT how often does key x occur" — in depth×width integers instead
# of a |keys|-sized exact table. Estimates never undercount; the
# overcount is bounded by (2/width)·total_weight with probability
# 1 - (1/2)^depth. Per-shard sketches merge by cell-wise sum, so a
# 100 TB corpus builds per-partition sketches map-side and ships
# depth×width rows per shard — the same pre-aggregate-then-merge shape
# as the HLL rollup above.


# CMS position-hash wire-format version. v2 (round 7): positions are
# derived from the 60-bit span_hash60 via sketch_pos60 — a 32-bit base
# (v1) let any base-hash collision collide in EVERY depth row, so depth
# stopped reducing error at birthday-range (~2^16) distinct values
# (round-6 ADVICE). The stamp rides every sketch and is guarded like
# depth/width: probing a sketch built under a different scheme raises
# instead of silently reading the wrong cells.
CMS_HASH_SCHEME = 2


def cms_build(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Sparse count-min sketch: one ``(row_idx, col_idx, cnt)`` row per
    non-zero cell, stamped ``(depth, width, scheme)``. Positions use
    the portable md5 ``span_hash60`` with per-depth universal-hash
    rederivation (engine-reproducible, like the Bloom filter).
    One explode (depth rows per value) + one hash-aggregate with
    map-side partial sums."""
    from stepist_spark.functions import hashing

    w = F.col(weight_col) if weight_col else F.lit(1)
    # ONE md5 per value; the depth positions are universal-hash
    # rederivations of its two 30-bit halves (hashing.sketch_pos60 —
    # depth rows stay independent under base-hash collisions). Each
    # depth row is its own map-side-combined aggregate and the tiny
    # cell tables union — measured 2.8x faster than aggregating an
    # exploded generator (the Generate breaks whole-stage codegen
    # around the hash agg)
    h = hashing.span_hash60(F.col(value_col).cast("string"))
    out = None
    for d in range(depth):
        part = (
            df.select(hashing.sketch_pos60(h, d, width).alias("col_idx"), w.alias("_w"))
            .groupBy("col_idx")
            .agg(F.sum("_w").cast("bigint").alias("cnt"))
            .select(
                F.lit(d).cast("int").alias("row_idx"),
                F.col("col_idx").cast("int").alias("col_idx"),
                "cnt",
            )
        )
        out = part if out is None else out.unionByName(part)
    return out.select(
        "row_idx",
        "col_idx",
        "cnt",
        F.lit(depth).cast("int").alias("depth"),
        F.lit(width).cast("int").alias("width"),
        F.lit(CMS_HASH_SCHEME).cast("int").alias("scheme"),
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge shard sketches by cell-wise sum. Shards built with
    mismatched (depth, width) raise at evaluation time — grouping alone
    would keep them separate and silently UNDER-estimate."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    merged = out.groupBy("row_idx", "col_idx", "depth", "width", "scheme").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    return merged.select(
        "row_idx",
        "col_idx",
        _uniform_guard(
            F.col("cnt"), ["depth", "width", "scheme"], "cms_merge"
        ).alias("cnt"),
        _uniform_stamp("depth", "cms_merge"),
        _uniform_stamp("width", "cms_merge"),
        _uniform_stamp("scheme", "cms_merge"),
    )


def cms_estimate(
    df: DataFrame,
    value_col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 1024,
    estimate_col: str = "approx_count",
) -> DataFrame:
    """Append ``estimate_col``: the count-min estimate (min over the
    depth rows) for each value.

    Lookup strategy mirrors :func:`bloom_probe`: one broadcast hash
    join per depth row against that row's cells — O(1) hashed lookup
    per probe, no probe-side shuffle, no fan-out (cell keys are unique
    per row). A packed broadcast MAP would be an O(depth·width) linear
    scan per lookup (Spark's GetMapValue has no hash index)."""
    from stepist_spark.functions import hashing

    expect = {"depth": depth, "width": width, "scheme": CMS_HASH_SCHEME}
    if "depth" in sketch.columns and "scheme" not in sketch.columns:
        raise ValueError(
            "cms_estimate: sketch predates hash-scheme v2 (no 'scheme' "
            "stamp) — its cells were placed by the old 32-bit position "
            "hash and the estimates would be silently wrong; rebuild it "
            "with cms_build"
        )
    sketch = _probe_ready(sketch, expect)
    guarded = set(expect) <= set(sketch.columns)
    out = df
    ests = []
    h = hashing.span_hash60(F.col(value_col).cast("string"))
    for d in range(depth):
        pos = hashing.sketch_pos60(h, d, width)
        cnt = (
            _stamp_guard(F.col("cnt"), expect, "cms_estimate")
            if guarded
            else F.col("cnt")
        )
        side = sketch.filter(F.col("row_idx") == d).select(
            F.col("col_idx").alias(f"_c{d}"), cnt.alias(f"_n{d}")
        )
        out = (
            out.join(F.broadcast(side), pos == F.col(f"_c{d}"), "left")
            .withColumn(f"_e{d}", F.coalesce(F.col(f"_n{d}"), F.lit(0)))
            .drop(f"_c{d}", f"_n{d}")
        )
        ests.append(F.col(f"_e{d}"))
    return out.withColumn(estimate_col, F.least(*ests)).drop(
        *[f"_e{d}" for d in range(depth)]
    )


# --------------------------------------------------------------------------
# Log-linear quantile sketch — the mergeable-quantiles member of the
# family (HLL: distinct, Bloom: membership, CMS: frequency; this:
# "what's the p95"). The bucket layout is the public HdrHistogram /
# DDSketch idea restated with PURE INTEGER arithmetic so both engines
# agree bit-for-bit: values below 2^sub_bits land in exact unit
# buckets; above, each power-of-two octave splits into 2^sub_bits
# linear sub-buckets, giving relative error <= 2^-sub_bits at any
# magnitude. Bucket index and bucket lower bound are integer
# shift/divide expressions (floor(log2 v) comes from the BINARY STRING
# LENGTH of v — no libm, whose last-ulp log() differences across
# engines would flip boundary values into neighboring buckets).
# Per-shard sketches merge by bucket-wise count sum — order-free,
# exactly the pre-aggregate-then-merge shape of the other sketches.


def qsketch_build(
    df: DataFrame,
    value_col: str,
    sub_bits: int = 5,
) -> DataFrame:
    """Build the sketch: one ``(bucket, cnt, sub_bits)`` row per
    non-empty bucket. ``value_col`` must be a NON-NEGATIVE bigint
    (scale/offset upstream). One projection + one map-side-combined
    hash aggregate; the sketch is at most ~64 * 2^sub_bits rows."""
    sb = 1 << sub_bits
    v = F.col(value_col).cast("bigint")
    o = (F.length(F.conv(v, 10, 2)) - 1).cast("bigint")
    sub = F.expr(
        f"{value_col} DIV shiftleft(CAST(1 AS BIGINT), "
        f"CAST(length(conv({value_col}, 10, 2)) - 1 - {sub_bits} AS INT)) - {sb}"
    )
    bucket = F.when(v < sb, v).otherwise(o * sb + sub).cast("bigint")
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select("bucket", "cnt", F.lit(sub_bits).cast("int").alias("sub_bits"))
    )


def qsketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge shard sketches by bucket-wise count sum; mismatched
    ``sub_bits`` stamps raise at evaluation time."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    merged = out.groupBy("bucket", "sub_bits").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    return merged.select(
        "bucket",
        _uniform_guard(F.col("cnt"), ["sub_bits"], "qsketch_merge").alias("cnt"),
        _uniform_stamp("sub_bits", "qsketch_merge"),
    )


def qsketch_quantiles(
    sketch: DataFrame,
    quantiles: Sequence[tuple[int, int]],
    sub_bits: int = 5,
) -> DataFrame:
    """Quantile estimates from the sketch: for each rational
    ``(q_num, q_den)``, the LOWER BOUND of the bucket containing the
    rank-``ceil(q*n)`` element (clamped to rank >= 1). The estimate is
    an under-approximation within relative error 2^-sub_bits.

    Output: ``q_num, q_den, est, n`` — one row per requested quantile.
    One cumulative window over the (tiny) bucket table per call.
    """
    from pyspark.sql import Window

    sb = 1 << sub_bits
    sk = _probe_ready(sketch, {"sub_bits": sub_bits})
    guarded = "sub_bits" in sk.columns
    cnt = (
        _stamp_guard(F.col("cnt"), {"sub_bits": sub_bits}, "qsketch_quantiles")
        if guarded
        else F.col("cnt")
    )
    from stepist_spark.operators.cumulative import whole_frame

    # |buckets| sketch rows (KB-scale) — bounded, explicit single-task
    w = whole_frame(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = sk.select(
        "bucket",
        F.sum(cnt).over(w).alias("cum"),
        F.sum(cnt).over(
            whole_frame().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    # bucket lower bound: exact region is the value itself; above,
    # (2^sb + sub) << (octave - sub_bits)
    lb = F.when(F.col("bucket") < sb, F.col("bucket")).otherwise(
        F.expr(
            f"shiftleft(CAST({sb} + bucket % {sb} AS BIGINT), "
            f"CAST(bucket DIV {sb} - {sub_bits} AS INT))"
        )
    )
    parts = []
    for q_num, q_den in quantiles:
        rank = F.expr(f"greatest(CAST(1 AS BIGINT), ({q_num} * n + {q_den} - 1) DIV {q_den})")
        hit = cum.filter(F.col("cum") >= rank).select(
            F.lit(q_num).cast("int").alias("q_num"),
            F.lit(q_den).cast("int").alias("q_den"),
            lb.alias("_lb"),
            "n",
        )
        parts.append(
            hit.groupBy("q_num", "q_den").agg(
                F.min("_lb").alias("est"), F.max("n").alias("n")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rolling_hll_actives(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
    p: int = HLL_P,
    estimate_col: str = "approx_active_users",
) -> DataFrame:
    """APPROXIMATE rolling distinct actives from MERGEABLE per-day HLL
    registers — the merge-don't-rescan twin of
    ``sessions.rolling_active_users``: the exact operator ships
    |user-day pairs| × window rows per pass, while this builds per-day
    register tables ONCE (≤ m rows/day regardless of traffic) and
    every trailing window is a register-wise max over ≤ window·m
    kilobyte-scale rows. At 100 TB the raw events are touched once no
    matter how many window lengths ride on the same registers; the
    price is the HLL error (~4.6% at p=9), which the exact twin
    witnesses at test scale.

    Output: ``day, {estimate_col}`` for each observed day (portable
    estimate — bit-reproducible cross-engine like the q21 family).
    """
    days = df.select(
        F.to_date(F.col(ts_col)).alias("_d"), F.col(user_col).alias("_u")
    )
    regs = portable_hll_registers(days, ["_d"], "_u", p=p)
    observed = days.select(F.col("_d").alias("day")).distinct()
    contrib = regs.select(
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("_off"),
        "_d",
        "bucket",
        "reg",
    ).select(F.date_add(F.col("_d"), F.col("_off")).alias("day"), "bucket", "reg")
    merged = (
        contrib.join(observed, "day")
        .groupBy("day", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    return portable_hll_estimate(merged, ["day"], p=p, estimate_col=estimate_col)


def hll_pair_intersections(
    registers: DataFrame,
    label_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Distinct-intersection estimates for every unordered pair of
    label sets via inclusion-exclusion over ONE portable-HLL register
    table: ``|A∩B| ≈ est(A) + est(B) − est(A∪B)`` (Flajolet 2007 HLL
    + the standard set-algebra composition, public).

    Spark-first shape: the raw data was already collapsed to the
    per-label register table (≤ m rows per label); every pairwise
    union is a register-wise MAX over those kilobyte rows — the pair
    sweep never touches raw data, so k labels cost k(k-1)/2 merges of
    2^p-row frames. The tiny label list broadcasts.

    Estimates reuse :func:`portable_hll_estimate` (bit-reproducible);
    the intersection is one add/subtract of the 4-dp-rounded
    estimates (can go slightly negative for near-disjoint sets —
    reported as-is, the caller clamps if needed).

    Output: ``label_a, label_b, est_a, est_b, est_union, est_inter``.
    """
    labels = registers.select(F.col(label_col).alias("_l")).distinct()
    pairs = (
        labels.select(F.col("_l").alias("label_a"))
        .crossJoin(F.broadcast(labels.select(F.col("_l").alias("label_b"))))
        .filter(F.col("label_a") < F.col("label_b"))
    )
    ra = pairs.join(
        registers.select(
            F.col(label_col).alias("label_a"), "bucket", "reg"
        ),
        "label_a",
    )
    rb = pairs.join(
        registers.select(
            F.col(label_col).alias("label_b"), "bucket", "reg"
        ),
        "label_b",
    )
    union_regs = (
        ra.select("label_a", "label_b", "bucket", "reg")
        .unionByName(rb.select("label_a", "label_b", "bucket", "reg"))
        .groupBy("label_a", "label_b", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    est_u = portable_hll_estimate(
        union_regs, ["label_a", "label_b"], p, "est_union"
    )
    est_l = portable_hll_estimate(registers, label_col, p, "est_l")
    ea = est_l.select(F.col(label_col).alias("label_a"), F.col("est_l").alias("est_a"))
    eb = est_l.select(F.col(label_col).alias("label_b"), F.col("est_l").alias("est_b"))
    return (
        est_u.join(F.broadcast(ea), "label_a")
        .join(F.broadcast(eb), "label_b")
        .select(
            "label_a",
            "label_b",
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_inter"),
        )
    )


def cms_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches via
    the inner product ``min_d Σ_w cnt_a[d,w]·cnt_b[d,w]`` (Cormode &
    Muthukrishnan 2005; the AMS F₂ idea specialized to CMS) — the
    join-size estimator a planner consults before picking a strategy,
    and the scale answer to "how big will this join be" without
    running it.

    Spark-first shape: both inputs are ALREADY kilobyte-scale sketch
    tables (≤ depth·width cells); the inner product is one cell-keyed
    equi-join + one ≤depth-row aggregate — the raw tables are never
    touched. Mismatched (depth, width) shards raise via the stamp
    guard rather than silently under-estimating.

    The estimate is an EXACT integer function of the sketch cells
    (products and sums of bigints, min over depth) — fully
    hash-gateable, no float anywhere. Output: one row
    ``(est_join_size, depth, width)``.
    """
    a = sketch_a.select(
        "row_idx",
        "col_idx",
        _uniform_guard(
            F.col("cnt"), ["depth", "width", "scheme"], "cms_join_size"
        ).alias("_ca"),
        "depth",
        "width",
    )
    b = sketch_b.select(
        F.col("row_idx").alias("_rb"),
        F.col("col_idx").alias("_cb"),
        _uniform_guard(
            F.col("cnt"), ["depth", "width", "scheme"], "cms_join_size"
        ).alias("_nb"),
        F.col("depth").alias("_db"),
        F.col("width").alias("_wb"),
    )
    joined = a.join(
        b,
        (F.col("row_idx") == F.col("_rb")) & (F.col("col_idx") == F.col("_cb")),
    )
    mismatch = joined.filter(
        (F.col("depth") != F.col("_db")) | (F.col("width") != F.col("_wb"))
    )
    per_row = (
        joined.groupBy("row_idx", "depth", "width")
        .agg(
            F.sum(
                F.col("_ca").cast("decimal(38,0)") * F.col("_nb").cast("decimal(38,0)")
            ).alias("_dot")
        )
    )
    # min over depth rows; depth/width ride along for provenance
    return per_row.groupBy("depth", "width").agg(
        F.min("_dot").cast("decimal(38,0)").alias("est_join_size")
    ).select("est_join_size", "depth", "width")


def cms_join_size_sql(
    table_a: str,
    expr_a: str,
    table_b: str,
    expr_b: str,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB mirror of :func:`cms_join_size` over the raw tables —
    rebuilds both sketches with the same portable md5 hash and takes
    the same min-of-dot-products (all HUGEINT-exact)."""
    from stepist_spark.functions import hashing

    def cells(table: str, expr: str) -> str:
        h = hashing.span_hash60_sql(f"CAST(({expr}) AS VARCHAR)")
        arms = " UNION ALL ".join(
            f"SELECT {d} AS row_idx, "
            f"{hashing.sketch_pos60_sql('_h', d, width)} AS col_idx FROM _hv"
            for d in range(depth)
        )
        return (
            f"WITH _hv AS (SELECT {h} AS _h FROM {table}) "
            f"SELECT row_idx, col_idx, CAST(count(*) AS BIGINT) AS cnt "
            f"FROM ({arms}) GROUP BY 1, 2"
        )

    return f"""
WITH cjs_a AS ({cells(table_a, expr_a)}),
cjs_b AS ({cells(table_b, expr_b)}),
cjs_dot AS (
    SELECT a.row_idx, sum(a.cnt::HUGEINT * b.cnt) AS dot
    FROM cjs_a a JOIN cjs_b b ON a.row_idx = b.row_idx AND a.col_idx = b.col_idx
    GROUP BY a.row_idx
)
SELECT min(dot) AS est_join_size, {depth} AS depth, {width} AS width
FROM cjs_dot
"""
