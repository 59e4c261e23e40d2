"""Ad-hoc round-6 parity driver: run each new operator on Spark and
its DuckDB mirror at sf0.01 and diff sorted results. Not a test —
a development feedback loop (tests get the distilled versions)."""

import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def compare(name, sdf, con, sql):
    import pandas as pd

    sp = sdf.toPandas()
    du = con.execute(sql).df()
    sp = sp[sorted(sp.columns)].sort_values(sorted(sp.columns)).reset_index(drop=True)
    du = du[sorted(du.columns)].sort_values(sorted(du.columns)).reset_index(drop=True)
    ok_rows = len(sp) == len(du)
    ok_cols = list(sp.columns) == list(du.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            pd.testing.assert_frame_equal(
                sp, du, check_dtype=False, check_exact=True
            )
            ok_vals = True
        except AssertionError as e:
            print(f"[{name}] VALUE MISMATCH: {str(e)[:500]}")
    print(
        f"[{name}] rows spark={len(sp)} duck={len(du)} cols_ok={ok_cols} "
        f"vals_ok={ok_vals}"
    )
    if not (ok_rows and ok_cols and ok_vals):
        print(" spark:", sp.head(5).to_string())
        print(" duck :", du.head(5).to_string())
    return ok_rows and ok_cols and ok_vals


def main():
    from stepist_spark.session import get_spark, load_table

    spark = get_spark()
    con = duck()
    ok = True

    from stepist_spark.operators.association import (
        association_rules,
        association_rules_sql,
    )

    li = load_table(spark, SF, "lineitem")
    ok &= compare(
        "assoc",
        association_rules(li, "l_orderkey", "l_partkey", min_pair_support=2, k=50),
        con,
        association_rules_sql("lineitem", "l_orderkey", "l_partkey", 2, 50),
    )

    from stepist_spark.operators.expectations import expect, expect_sql

    cons = [
        ("not_null", "l_orderkey"),
        ("non_negative", "l_quantity"),
        ("between", "l_discount", 0.0, 0.1),
        ("in_set", "l_returnflag", ["A", "N", "R"]),
        ("matches", "l_linestatus", "^[OF]$"),
        ("unique", ["l_orderkey", "l_linenumber"]),
        ("unique", ["l_partkey"]),
    ]
    ok &= compare("expect", expect(li, cons), con, expect_sql("lineitem", cons))

    from stepist_spark.operators.timeseries import (
        merge_intervals,
        merge_intervals_sql,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    ok &= compare(
        "intervals",
        merge_intervals(ev, "k", "s", "e"),
        con,
        merge_intervals_sql(
            "SELECT user_id AS k, ts::TIMESTAMP AS s, "
            "ts::TIMESTAMP + INTERVAL 30 MINUTE AS e FROM events"
        ),
    )

    from stepist_spark.operators.regression import (
        chi_square_contingency,
        chi_square_contingency_sql,
    )

    evt = load_table(spark, SF, "events").select(
        "event_type", (F.col("user_id") % 4).alias("seg")
    )
    ok &= compare(
        "chi2",
        chi_square_contingency(evt, "event_type", "seg"),
        con,
        chi_square_contingency_sql(
            "(SELECT event_type, user_id % 4 AS seg FROM events)",
            "event_type",
            "seg",
        ),
    )

    from stepist_spark.operators.corpus import (
        distribution_shift,
        distribution_shift_sql,
    )

    docs = load_table(spark, SF, "documents")
    ok &= compare(
        "klshift",
        distribution_shift(docs, "doc_id", "text", "source", min_count=5),
        con,
        distribution_shift_sql("documents", "doc_id", "text", "source", 5),
    )

    print("ALL OK" if ok else "FAILURES")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
