"""Replicates the driver's correctness gate: run every registered query
on Spark AND its DuckDB oracle over the same parquet tables, then
compare row count, column names, and order-insensitive values.

Runs at sf0.001 by default (fast); set STEPIST_ORACLE_SF=/root/testdata/sf0.01
to mirror the driver's scale exactly.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from stepist_spark.queries import all_queries

SF_DIR = os.environ.get("STEPIST_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

SPECS = {name: spec for name, spec in all_queries().items() if spec.oracle is not None}
NO_ORACLE = [name for name, spec in all_queries().items() if spec.oracle is None]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # final guard against last-ulp drift after explicit query-side rounding
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:  # pragma: no cover
        pass
    return v


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, ddb):
    spec = SPECS[name]
    sdf = spec.spark(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    s_cols, s_rows = _normalize_rows(spark_cols, spark_rows)
    d_cols, d_rows = _normalize_rows(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
    assert len(s_rows) > 0, f"{name}: empty result weakens the gate"


def test_rows_only_queries_run(spark):
    for name in NO_ORACLE:
        spec = all_queries()[name]
        df = spec.spark(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 30
