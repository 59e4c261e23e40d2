"""Bootstrap confidence intervals by deterministic Poissonization —
uncertainty quantification for corpus/metric means at 100 TB, where
classical closed-form CIs don't cover ratio/trimmed/derived metrics.

Method (public): the Poisson bootstrap (Chamandy et al., "Estimating
uncertainty for massive data streams", Google tech report 2012; the
one-pass variant of Efron 1979's resampling) — instead of drawing B
resamples WITH replacement (impossible without B shuffles of the full
data), every row gets an independent Poisson(1) weight per replicate;
replicate b's mean is Σ w_ib·x_i / Σ w_ib. For large n this is the
classical bootstrap's distribution to O(1/n).

Engine-portable determinism AND one-hash cost: each row pays ONE
portable md5 (``span_hash60(id:seed)``); the per-replicate uniform is
an affine rederivation of the hash's two 30-bit halves with
per-replicate coefficient triples that are themselves md5-derived
driver-side and inlined as literals — the same pairwise-independent
universal-hash discipline as the MinHash signatures and the CMS
sketch_pos60 (a per-(row, replicate) md5 measured 33× the hash cost:
~14s/replicate-pass at sf1 vs ~1s). The uniform inverts through the
Poisson(1) CDF with thresholds ``T_k = floor(cdf_k · P)`` inlined in
BOTH engines, so Spark and DuckDB materialize bit-identical weight
matrices and every replicate sum is an exact integer. Weights cap at
8: the Poisson tail P[W >= 8] ≈ 1.0e-5 folds into weight 8 (total
mass preserved; the distortion is documented, not silent).

Spark-first shape: ONE scan; each row explodes to ``n_boot`` (b, w)
pairs, but the per-replicate hash aggregate partially combines
map-side, so the shuffle carries only ``n_boot × |partitions|`` rows
regardless of data size. The replicate table (B rows) and the CI
(2 ranks over B rows) are driver-free bounded-frame operations. Cost
is one md5 plus n_boot affine evaluations per row: B=32 gives a
usable 95% CI at one hash per row.

The reference has no analytics surface (SURVEY.md §2.2); this is the
LLM-pipeline extension family (metric uncertainty for data-quality
dashboards and A/B-style corpus comparisons).
"""

from __future__ import annotations

import math

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stepist_spark.functions import hashing
from stepist_spark.operators.cumulative import whole_frame

#: The universal-hash modulus shared with the MinHash family.
_P = hashing.MINHASH_P

#: Poisson(1) CDF thresholds on the [0, P) uniform scale, k = 0..7.
#: Literal in both engines — no runtime exp/factorial anywhere.
_POIS_MAX = 8
_POIS_T = []
_cum = 0.0
for _k in range(_POIS_MAX):
    _cum += math.exp(-1.0) / math.factorial(_k)
    _POIS_T.append(int(_cum * _P))


def _rep_coeffs(n_boot: int, seed: str) -> "list[tuple[int, int, int]]":
    """Per-replicate affine coefficient triples (C_b, D_b, E_b),
    md5-derived driver-side — deterministic literals both engines
    share. C/D are masked to 31 bits (and forced odd) so
    ``C·lo + D·hi + E`` stays under 2^63 for 30-bit halves."""
    import hashlib

    out = []
    for b in range(n_boot):
        h = hashlib.md5(f"{seed}:rep:{b}".encode()).hexdigest()
        c = (int(h[:8], 16) & 0x7FFFFFFF) | 1
        d = (int(h[8:16], 16) & 0x7FFFFFFF) | 1
        e = int(h[16:24], 16)
        out.append((c, d, e))
    return out


def _poisson_weight_sql(u_expr: str) -> str:
    """Poisson(1) weight from a uniform [0, P) hash: branchless
    ``Σ_k [u >= T_k]`` — 0 below the first threshold, capped at 8
    (numpy twin on the Spark side: searchsorted over the same
    thresholds)."""
    terms = " + ".join(
        f"(CASE WHEN ({u_expr}) >= {t} THEN 1 ELSE 0 END)" for t in _POIS_T
    )
    return f"({terms})"


def bootstrap_replicates(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_boot: int = 32,
    seed: str = "boot",
    scale: int = 100,
    group_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """One row per bootstrap replicate (per group when ``group_cols``
    is given — per-slice uncertainty, e.g. a mean-quality CI per
    source): ``[*group_cols,] b, n_eff, sum_scaled, mean`` where
    ``n_eff = Σ w`` and ``sum_scaled = Σ w · round(x·scale)`` are
    exact bigints and ``mean`` (original units, 6 dp) is ONE double
    division. Weights depend only on (id, seed, b), so a row keeps
    the SAME weight whether the estimate is sliced or global —
    grouped replicates sum to the ungrouped ones by construction.
    Changing ``seed`` redraws all replicates; replicate 0..n_boot-1
    are mutually independent by hash-salt construction. Empty
    replicates (possible on tiny inputs) emit NULL mean.
    """
    gcols = list(group_cols or [])
    cents = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("bigint")
    sid = F.col(id_col).cast("string")
    coeffs = _rep_coeffs(n_boot, seed)
    h60 = hashing.span_hash60(F.concat(sid, F.lit(f":{seed}")))
    # NULL ids hash to NULL: to_numpy(np.int64) on NaN is an UNSAFE
    # cast yielding garbage weights silently, while the SQL mirror's
    # NULL uniform contributes weight 0 — drop those rows explicitly
    # so both engines agree (round-7 ADVICE)
    df = df.where(F.col(id_col).isNotNull())
    hashed = df.select(*gcols, cents.alias("_x"), h60.alias("_h")).select(
        *gcols,
        "_x",
        (F.col("_h") % F.lit(1 << 30)).alias("_lo"),
        F.shiftright("_h", 30).alias("_hi"),
    )
    # Arrow-batched numpy twin of the certified integer formula (the
    # repo's pandas_udf discipline): 32 branchless expression trees of
    # 8 comparisons each fall out of codegen and evaluate interpreted
    # (~10µs/row measured at sf1); numpy computes the same exact int64
    # affines + searchsorted thresholds per batch instead.
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    thresholds = np.asarray(_POIS_T, dtype=np.int64)
    carr = np.asarray([c for c, _, _ in coeffs], dtype=np.int64)
    darr = np.asarray([d for _, d, _ in coeffs], dtype=np.int64)
    earr = np.asarray([e for _, _, e in coeffs], dtype=np.int64)

    def _wvec(lo, hi):
        lo_a = lo.to_numpy(np.int64)
        hi_a = hi.to_numpy(np.int64)
        # (n_rows, n_boot): c*lo < 2^61, +d*hi < 2^62 — int64-safe
        u = (np.outer(lo_a, carr) + np.outer(hi_a, darr) + earr) % _P
        w = np.searchsorted(thresholds, u, side="right").astype(np.int32)
        return pd.Series(list(w))

    wvec = pandas_udf(_wvec, "array<int>")
    pairs = hashed.select(
        *gcols, "_x", F.posexplode(wvec("_lo", "_hi")).alias("b", "_w")
    )
    rep = pairs.groupBy(*gcols, "b").agg(
        F.sum("_w").cast("bigint").alias("n_eff"),
        F.sum(F.col("_w") * F.col("_x")).cast("bigint").alias("sum_scaled"),
    )
    return rep.select(
        *gcols,
        F.col("b").cast("bigint").alias("b"),
        "n_eff",
        "sum_scaled",
        F.when(
            F.col("n_eff") > 0,
            F.round(
                F.col("sum_scaled").cast("double")
                / (F.col("n_eff").cast("double") * F.lit(float(scale))),
                6,
            ),
        ).alias("mean"),
    )


def percentile_ci(
    replicates: DataFrame,
    alpha_num: int = 5,
    alpha_den: int = 100,
    group_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Nearest-rank percentile CI over the B-row replicate table (per
    group when ``group_cols`` is given): ``lo_mean`` = the
    ``ceil(B·α/2)``-th smallest replicate mean, ``hi_mean`` the
    symmetric upper rank. Replicate means are IEEE divisions of
    identical exact integers, so their sort order (tie break: b)
    matches across engines. The rank pass is a :func:`whole_frame`
    (or per-group) window over B rows — bounded by construction.
    Output per group: ``n_boot, lo_rank, lo_mean, hi_mean``.
    """
    gcols = list(group_cols or [])
    order = [F.col("mean").asc(), F.col("b").asc()]
    w = Window.partitionBy(*gcols).orderBy(*order) if gcols else whole_frame(*order)
    w_all = Window.partitionBy(*gcols) if gcols else whole_frame()
    ranked = replicates.filter(F.col("mean").isNotNull()).select(
        *gcols,
        "b",
        "mean",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(w_all).alias("_nb"),
    )
    lo_rank = F.expr(f"CAST(((_nb * {alpha_num}) + (2 * {alpha_den}) - 1) DIV (2 * {alpha_den}) AS BIGINT)")
    lo_rank = F.greatest(F.lit(1).cast("bigint"), lo_rank)
    picked = ranked.withColumn("_lo", lo_rank).withColumn(
        "_hi", F.col("_nb") + 1 - F.col("_lo")
    )
    return picked.groupBy(*gcols).agg(
        F.max("_nb").cast("bigint").alias("n_boot"),
        F.max("_lo").cast("bigint").alias("lo_rank"),
        F.max(F.when(F.col("_rk") == F.col("_lo"), F.col("mean"))).alias("lo_mean"),
        F.max(F.when(F.col("_rk") == F.col("_hi"), F.col("mean"))).alias("hi_mean"),
    ).filter(F.col("n_boot").isNotNull())


def bootstrap_replicates_sql(
    table_sql: str,
    value_expr: str,
    id_expr: str,
    n_boot: int = 32,
    seed: str = "boot",
    scale: int = 100,
) -> str:
    """DuckDB mirror of :func:`bootstrap_replicates` — same literal
    Poisson thresholds, same md5 salts, same exact integer sums."""
    h60 = hashing.span_hash60_sql(f"_id || ':{seed}'")
    coeffs = _rep_coeffs(n_boot, seed)
    arms = " UNION ALL ".join(
        f"SELECT {b} AS b, "
        + _poisson_weight_sql(
            f"(({c}::BIGINT * _lo + {d}::BIGINT * _hi + {e}) % {_P})"
        )
        + " AS _w, _x FROM _bs_h"
        for b, (c, d, e) in enumerate(coeffs)
    )
    return f"""
WITH _bs_rows AS (
    SELECT CAST(({id_expr}) AS VARCHAR) AS _id,
           CAST(floor(({value_expr}) * {scale} + 0.5) AS BIGINT) AS _x
    FROM ({table_sql})
),
_bs_h AS (
    SELECT _x, ({h60}) % {1 << 30} AS _lo, ({h60}) // {1 << 30} AS _hi
    FROM _bs_rows
),
_bs_w AS (
    {arms}
)
SELECT CAST(b AS BIGINT) AS b,
       CAST(sum(_w) AS BIGINT) AS n_eff,
       CAST(sum(_w * _x) AS BIGINT) AS sum_scaled,
       CASE WHEN sum(_w) > 0
            THEN round(CAST(sum(_w * _x) AS DOUBLE)
                       / (CAST(sum(_w) AS DOUBLE) * {float(scale)}), 6)
       END AS mean
FROM _bs_w GROUP BY b
"""


def percentile_ci_sql(
    replicates_sql: str,
    alpha_num: int = 5,
    alpha_den: int = 100,
) -> str:
    """DuckDB mirror of :func:`percentile_ci` over a replicate SQL."""
    return f"""
WITH _ci_r AS (
    SELECT b, mean,
           row_number() OVER (ORDER BY mean ASC, b ASC) AS rk,
           count(*) OVER () AS nb
    FROM ({replicates_sql}) WHERE mean IS NOT NULL
),
_ci_p AS (
    SELECT *, greatest(1, ((nb * {alpha_num}) + (2 * {alpha_den}) - 1)
                          // (2 * {alpha_den})) AS lo
    FROM _ci_r
)
SELECT CAST(max(nb) AS BIGINT) AS n_boot,
       CAST(max(lo) AS BIGINT) AS lo_rank,
       max(CASE WHEN rk = lo THEN mean END) AS lo_mean,
       max(CASE WHEN rk = nb + 1 - lo THEN mean END) AS hi_mean
FROM _ci_p
HAVING max(nb) IS NOT NULL
"""
