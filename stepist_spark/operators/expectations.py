"""Declarative data-quality expectations — the Deequ/Great-Expectations
shape (Schelter et al., VLDB'18 — public): declare row-level and
table-level constraints, get back ONE violations report frame.

Spark-first shape, sized for 100 TB:
- every ROW-LEVEL check (not_null / in_set / between / matches /
  non_negative) folds into a SINGLE conditional-sum aggregate — one
  scan, zero shuffles beyond the final 1-row reduce, no matter how
  many constraints are declared;
- each UNIQUE check is one count-distinct-style aggregate on its key
  (an unavoidable shuffle per distinct key set, map-side partial);
- the report is a tiny union of per-constraint rows — constraint,
  column, violations, total, passed — suitable for an `observe()`-
  style gate or a warehouse audit table.

All outputs are exact bigints/booleans: nothing to round, the value
hash is stable on any engine.

Reference parity: stepist validates nothing (records are opaque dicts,
`stepist/flow/steps/step.py:60-75` passes kwargs through unchecked);
this operator is the admission-control layer a production pipeline
adds in front of that.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# constraint spec: (kind, column(s), *params)
#   ("not_null", col)
#   ("unique", [col, ...])
#   ("in_set", col, [v1, v2, ...])
#   ("between", col, lo, hi)            # inclusive; NULL is a violation
#   ("matches", col, regex)             # NULL is a violation
#   ("non_negative", col)               # NULL is a violation


def _violation_expr(spec: tuple) -> "F.Column":
    kind, col = spec[0], spec[1]
    c = F.col(col)
    if kind == "not_null":
        bad = c.isNull()
    elif kind == "in_set":
        bad = ~c.isin(list(spec[2])) | c.isNull()
    elif kind == "between":
        lo, hi = spec[2], spec[3]
        bad = ~c.between(F.lit(lo), F.lit(hi)) | c.isNull()
    elif kind == "matches":
        bad = ~c.rlike(spec[2]) | c.isNull()
    elif kind == "non_negative":
        bad = (c < 0) | c.isNull()
    else:  # pragma: no cover - guarded by expect()
        raise ValueError(f"unknown constraint kind {kind!r}")
    return F.sum(F.when(bad, 1).otherwise(0)).cast("bigint")


def expect(df: DataFrame, constraints: Sequence[tuple]) -> DataFrame:
    """Evaluate ``constraints`` and return the report frame
    ``(constraint, column, violations, total, passed)``, one row per
    constraint, ordered deterministically by (constraint, column).

    Row-level checks share ONE aggregate pass; each ``unique`` check
    adds one aggregate on its key columns (violations = rows carrying
    a duplicated key value).
    """
    spark = df.sparkSession
    row_specs = [s for s in constraints if s[0] != "unique"]
    uniq_specs = [s for s in constraints if s[0] == "unique"]
    for s in row_specs:
        _violation_expr(s)  # validate kinds eagerly

    reports: list[DataFrame] = []
    if row_specs:
        aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
        for i, s in enumerate(row_specs):
            aggs.append(_violation_expr(s).alias(f"_v{i}"))
        one = df.agg(*aggs)
        rows = []
        for i, s in enumerate(row_specs):
            rows.append(
                one.select(
                    F.lit(s[0]).alias("constraint"),
                    F.lit(s[1]).alias("column"),
                    F.col(f"_v{i}").alias("violations"),
                    F.col("_total").alias("total"),
                    (F.col(f"_v{i}") == 0).alias("passed"),
                )
            )
        agg_report = rows[0]
        for r in rows[1:]:
            agg_report = agg_report.unionByName(r)
        reports.append(agg_report)

    for s in uniq_specs:
        cols = list(s[1])
        dup = (
            df.groupBy(*[F.col(c) for c in cols])
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)), F.lit(0)
                )
                .cast("bigint")
                .alias("violations"),
                F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("total"),
            )
            .select(
                F.lit("unique").alias("constraint"),
                F.lit(",".join(cols)).alias("column"),
                "violations",
                "total",
                (F.col("violations") == 0).alias("passed"),
            )
        )
        reports.append(dup)

    if not reports:
        return spark.createDataFrame(
            [], "constraint string, column string, violations bigint, total bigint, passed boolean"
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("constraint", "column")


def _violation_sql(spec: tuple) -> str:
    kind, col = spec[0], spec[1]
    if kind == "not_null":
        bad = f"{col} IS NULL"
    elif kind == "in_set":
        vals = ", ".join(f"'{v}'" if isinstance(v, str) else repr(v) for v in spec[2])
        bad = f"({col} NOT IN ({vals}) OR {col} IS NULL)"
    elif kind == "between":
        bad = f"(NOT ({col} BETWEEN {spec[2]} AND {spec[3]}) OR {col} IS NULL)"
    elif kind == "matches":
        bad = f"(NOT regexp_matches(CAST({col} AS VARCHAR), '{spec[2]}') OR {col} IS NULL)"
    elif kind == "non_negative":
        bad = f"({col} < 0 OR {col} IS NULL)"
    else:
        raise ValueError(f"unknown constraint kind {kind!r}")
    return f"CAST(sum(CASE WHEN {bad} THEN 1 ELSE 0 END) AS BIGINT)"


def expect_sql(table: str, constraints: Sequence[tuple]) -> str:
    """DuckDB mirror of :func:`expect` — same report rows.

    Note: ``matches`` uses DuckDB ``regexp_matches`` (partial-match,
    same as Spark ``rlike``)."""
    row_specs = [s for s in constraints if s[0] != "unique"]
    uniq_specs = [s for s in constraints if s[0] == "unique"]
    parts = []
    if row_specs:
        sums = ", ".join(
            f"{_violation_sql(s)} AS _v{i}" for i, s in enumerate(row_specs)
        )
        sel = " UNION ALL ".join(
            f"SELECT '{s[0]}' AS \"constraint\", '{s[1]}' AS \"column\", _v{i} AS violations, "
            f"_total AS total, _v{i} = 0 AS passed FROM _agg"
            for i, s in enumerate(row_specs)
        )
        parts.append(
            f"WITH _agg AS (SELECT CAST(count(*) AS BIGINT) AS _total, {sums} FROM {table}) {sel}"
        )
    for s in uniq_specs:
        cols = ", ".join(s[1])
        label = ",".join(s[1])
        parts.append(
            f"SELECT 'unique' AS \"constraint\",  '{label}' AS \"column\", "
            f"CAST(coalesce(sum(CASE WHEN _n > 1 THEN _n ELSE 0 END), 0) AS BIGINT) AS violations, "
            f"CAST(coalesce(sum(_n), 0) AS BIGINT) AS total, "
            f"coalesce(sum(CASE WHEN _n > 1 THEN _n ELSE 0 END), 0) = 0 AS passed "
            f"FROM (SELECT count(*) AS _n FROM {table} GROUP BY {cols})"
        )
    body = " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)
    return f"SELECT * FROM ({body}) ORDER BY \"constraint\", \"column\""
