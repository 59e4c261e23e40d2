"""Fixed-width text codec — the classic mainframe/ETL interchange
layout (COBOL copybooks, bank/telco feeds): every column occupies a
fixed byte range of each line, no delimiter, no quoting.

The reference has no file-format surface at all (its IO is Redis/
RabbitMQ/SQS queue payloads, `stepist/flow/libs/simple_queue.py:62-77`);
this extends the engine's text-source family (jsonl/csv, gated in w02)
with the one legacy format large ingest pipelines still meet.

Scale shape: both directions are pure JVM string expressions inside
whole-stage codegen — the writer is one ``concat`` of ``lpad`` columns
per row, the reader one ``substring``+``trim``+``cast`` per column over
``spark.read.text`` (which splits by line across tasks like any text
source). No UDF, no shuffle; Catalyst prunes unreferenced columns of
the parse because each output column depends only on ``value``.

Fidelity contract: values are LEFT-padded with spaces and trimmed on
read, so values must not themselves start or end with a space (raise
via an explicit guard); a value longer than its column width raises at
write time instead of silently truncating. Widths are BYTE widths:
values must be single-byte (ASCII) text — a multi-byte character
inside the char budget could still overflow the byte range an external
fixed-OFFSET (COBOL-style) reader consumes, so non-ASCII raises at
write time (round-6 ADVICE), as does NULL (the format has no
sentinel). Only exactly-text-representable types belong here
(integers, dates, bounded strings) — carry money as integer cents,
not doubles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_fixed_width", "read_fixed_width"]


def _guarded(col: str, width: int) -> F.Column:
    s = F.col(col).cast("string")
    # octet_length: the contract is a fixed BYTE range per column
    bad_len = F.octet_length(s) > width
    # byte-based external readers need bytes == chars; our own reader
    # slices by character, so the two only agree on single-byte text
    bad_bytes = F.octet_length(s) != F.length(s)
    bad_pad = s != F.trim(s)
    return (
        F.when(
            s.isNull(),
            F.raise_error(
                F.lit(
                    f"fixed-width: column '{col}' is NULL — the format has "
                    "no NULL sentinel; filter or fill first"
                )
            ),
        )
        .when(
            bad_len,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fixed-width overflow: column '{col}' width {width} "
                        "bytes got "
                    ),
                    s,
                )
            ),
        )
        .when(
            bad_bytes,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fixed-width: column '{col}' contains non-ASCII "
                        "text — byte-offset layouts require single-byte "
                        "characters: "
                    ),
                    s,
                )
            ),
        )
        .when(
            bad_pad,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fixed-width: column '{col}' has leading/trailing "
                        "whitespace, which cannot round-trip: "
                    ),
                    s,
                )
            ),
        )
        .otherwise(F.lpad(s, width, " "))
    )


def write_fixed_width(
    df: DataFrame,
    path: str,
    widths: Sequence[tuple[str, int]],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as fixed-width text lines; ``widths`` is the layout
    ``[(column, byte_width), ...]`` in line order. NULLs are not
    representable (no sentinel in the format) — filter or fill first;
    a NULL raises via an explicit guard at write time (it used to
    surface later as a text-writer failure on the NULL line)."""
    line = F.concat(*[_guarded(c, w) for c, w in widths])
    df.select(line.alias("value")).write.mode(mode).text(path)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: Sequence[tuple[str, int, str]],
) -> DataFrame:
    """Read fixed-width text lines written by :func:`write_fixed_width`
    (or any system emitting the same layout). ``colspecs`` is
    ``[(name, byte_width, spark_type), ...]`` in line order."""
    txt = spark.read.text(path)
    out = []
    start = 1  # substring is 1-based
    for name, width, dtype in colspecs:
        out.append(
            F.trim(F.substring(F.col("value"), start, width)).cast(dtype).alias(name)
        )
        start += width
    return txt.select(*out)
