"""k-anonymity audit/suppression."""

from __future__ import annotations

from pyspark.sql import functions as F

from stepist_spark.operators.privacy import (
    k_anonymity,
    k_anonymity_sql,
    suppress_small_groups,
)


def _df(spark):
    rows = [
        (1, "en", "web"), (2, "en", "web"), (3, "en", "web"),
        (4, "fr", "web"), (5, "fr", "book"), (6, None, "web"), (7, None, "web"),
    ]
    return spark.createDataFrame(rows, "id bigint, lang string, src string")


class TestKAnonymity:
    def test_sizes_and_flags(self, spark):
        got = {
            r["id"]: (r["group_size"], r["is_k_anon"])
            for r in k_anonymity(_df(spark), ["lang", "src"], 2).collect()
        }
        assert got[1] == (3, True) and got[4] == (1, False) and got[5] == (1, False)
        # NULL quasi values group together (a NULL crowd is a crowd)
        assert got[6] == (2, True) and got[7] == (2, True)

    def test_suppression_is_k_anonymous(self, spark):
        out = suppress_small_groups(_df(spark), ["lang", "src"], 2)
        ids = sorted(r["id"] for r in out.collect())
        assert ids == [1, 2, 3, 6, 7]
        sizes = out.groupBy("lang", "src").count().collect()
        assert all(r["count"] >= 2 for r in sizes)

    def test_duckdb_mirror(self, spark):
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE t (id BIGINT, lang VARCHAR, src VARCHAR)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?)",
            [(r["id"], r["lang"], r["src"]) for r in _df(spark).collect()],
        )
        sql = k_anonymity_sql("SELECT * FROM t", ["lang", "src"], 2, "id, group_size")
        exp = sorted(con.execute(sql).fetchall())
        got = sorted(
            (r["id"], r["group_size"])
            for r in k_anonymity(_df(spark), ["lang", "src"], 2)
            .filter("is_k_anon")
            .collect()
        )
        assert got == [tuple(e) for e in exp]
