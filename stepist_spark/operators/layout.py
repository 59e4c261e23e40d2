"""Z-order (Morton curve) layout — the multi-dimensional data-skipping
lever: sorting a table by the bit-interleaving of several columns
clusters rows that are close in EVERY dimension into the same files,
so min/max footer stats prune scans for predicates on ANY of the
dimensions (the technique behind Delta/Iceberg OPTIMIZE ZORDER BY;
Morton 1966, public).

Spark-first shape: ``z_value`` is a pure JVM integer expression (bit
twiddling — no UDF), and ``write_zordered`` is repartitionByRange +
sortWithinPartitions on it, i.e. one range exchange over the z key.
At 100 TB that single exchange is the whole cost, after which every
parquet file covers a compact z-range whose per-column min/max are
tight.

Portability: the interleave is plain shifts/masks on non-negative
bigints, identical in Spark SQL and DuckDB, so z-values hash-match
across engines bit-for-bit.

Reference parity: the reference has no storage-layout operators at all
(its sink is a Redis list, `stepist/flow/libs/simple_queue.py:49-60`);
this is a BASELINE.json extension.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: magic-number bit spreading for the 2-D fast path (public
#: "Interleave bits by Binary Magic Numbers" technique)
_MAGIC = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread2(col: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of a non-negative bigint so bit i
    lands at position 2i (one zero between consecutive bits)."""
    c = col.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _MAGIC:
        if shift >= bits:
            continue
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def z_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton z-value of ``cols`` (each truncated to its low ``bits``
    bits; values must be non-negative — range-code first if not).

    2 dimensions use the magic-number fast path; k dimensions fall back
    to a per-bit fold (k*bits shift-or terms, still a single JVM
    expression). ``len(cols) * bits`` must be <= 63.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if k == 0:
        raise ValueError("z_value needs at least one column")
    if k * bits > 63:
        raise ValueError(f"{k} dims x {bits} bits exceeds the 63-bit budget")
    if k == 1:
        return cs[0].cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    if k == 2:
        return _spread2(cs[0], bits).bitwiseOR(F.shiftleft(_spread2(cs[1], bits), 1))
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        for d, c in enumerate(cs):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * k + d))
    return out


def z_value_sql(exprs: Sequence[str], bits: int = 16) -> str:
    """DuckDB mirror of :func:`z_value` (per-bit fold form — the
    engines agree because both are plain integer shifts and masks)."""
    k = len(exprs)
    if k == 1:
        return f"(({exprs[0]}) & {(1 << bits) - 1})"
    terms = []
    for b in range(bits):
        for d, e in enumerate(exprs):
            terms.append(f"(((({e}) >> {b}) & 1) << {b * k + d})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered by the z-order of ``cols``: one range
    exchange on the z key, sort within partitions, one file per range —
    every output file then covers a tight min/max box in all ``cols``.
    """
    z = z_value(list(cols), bits).alias("_z")
    clustered = df.withColumn("_z", z)
    if n_files:
        clustered = clustered.repartitionByRange(n_files, "_z")
    else:
        clustered = clustered.repartitionByRange("_z")
    clustered.sortWithinPartitions("_z").drop("_z").write.mode("overwrite").format(
        fmt
    ).save(path)


def compact_files(
    spark,
    path: str,
    target_mb: int = 128,
    fmt: str = "parquet",
) -> tuple[int, int]:
    """Small-file COMPACTION for a file-backed table directory: rewrite
    its many small files into ~``target_mb`` files and swap them in.
    Returns ``(n_files_before, n_files_after)``.

    Why it matters at 100 TB: streaming sinks and fine-grained
    partition writes accumulate kB-scale files; every query then pays
    a task per file and the namenode/driver pays listing + footer
    metadata per file — compaction is the standing maintenance job
    that keeps scan parallelism matched to data, not to write history.

    Plan shape: ONE read of the directory, a round-robin repartition
    to ceil(total_bytes / target) (no sort — use :func:`write_zordered`
    when re-clustering is wanted too), one write to a staging dir,
    then a filesystem swap via the Hadoop FileSystem API (works on any
    scheme Spark can reach, not just local paths). NOT atomic for
    concurrent readers — like any non-table-format rewrite, schedule
    it in a maintenance window or use a table format for snapshot
    isolation.
    """
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)

    def _data_files(p):
        # recurse so hive-partitioned layouts count leaf files (the
        # rewrite itself flattens partition dirs — re-partitioned
        # layouts should compact per partition directory instead)
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isDirectory():
                out.extend(_data_files(st.getPath()))
            elif st.isFile():
                out.append(st)
        return out

    before = _data_files(hpath)
    total_bytes = sum(st.getLen() for st in before)
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    df = spark.read.format(fmt).load(path)
    staging = path.rstrip("/") + "__compact_staging"
    spath = jvm.org.apache.hadoop.fs.Path(staging)
    fs.delete(spath, True)
    df.repartition(n_out).write.mode("overwrite").format(fmt).save(staging)

    fs.delete(hpath, True)
    if not fs.rename(spath, hpath):
        raise IOError(f"compact_files: rename {staging} -> {path} failed")
    return len(before), len(_data_files(hpath))
