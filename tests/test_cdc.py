"""CDC apply_changes (latest-wins MERGE) vs hand-computed snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from stepist_spark.operators.cdc import apply_changes, incremental_agg, latest_changes


def _target(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string, seq bigint, op string")


def _snap(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


class TestApplyChanges:
    def test_upsert_insert_delete(self, spark):
        t = _target(spark, [(1, "a"), (2, "b"), (3, "c")])
        ch = _changes(
            spark,
            [
                (2, "B", 1, "U"),   # update existing
                (3, None, 1, "D"),  # delete existing
                (4, "d", 1, "I"),   # insert new
                (9, None, 1, "D"),  # delete absent: no-op
            ],
        )
        out = apply_changes(t, ch, ["k"])
        assert _snap(out) == [(1, "a"), (2, "B"), (4, "d")]

    def test_latest_wins_per_key(self, spark):
        t = _target(spark, [(1, "a")])
        ch = _changes(
            spark,
            [(1, "x", 1, "U"), (1, "y", 3, "U"), (1, "z", 2, "U")],
        )
        assert _snap(apply_changes(t, ch, ["k"])) == [(1, "y")]

    def test_delete_then_reinsert_by_seq(self, spark):
        t = _target(spark, [(1, "a")])
        ch = _changes(spark, [(1, None, 1, "D"), (1, "back", 2, "I")])
        assert _snap(apply_changes(t, ch, ["k"])) == [(1, "back")]

    def test_equal_seq_delete_outranks_update(self, spark):
        t = _target(spark, [(1, "a")])
        ch = _changes(spark, [(1, "x", 5, "U"), (1, None, 5, "D")])
        assert _snap(apply_changes(t, ch, ["k"])) == []

    def test_insert_of_existing_key_upserts(self, spark):
        t = _target(spark, [(1, "a")])
        ch = _changes(spark, [(1, "a2", 1, "I")])
        assert _snap(apply_changes(t, ch, ["k"])) == [(1, "a2")]

    def test_partition_independent(self, spark):
        t = _target(spark, [(i, "v%d" % i) for i in range(50)])
        ch = _changes(
            spark,
            [(i, "u%d" % i, i % 3 + 1, "U" if i % 4 else "D") for i in range(0, 80, 2)],
        )
        a = _snap(apply_changes(t, ch, ["k"]))
        b = _snap(apply_changes(t.repartition(7), ch.repartition(5), ["k"]))
        assert a == b

    def test_same_seq_same_op_tie_breaks_by_tie_cols(self, spark):
        t = _target(spark, [(1, "a")])
        # two U rows for the same key at the same seq: only the tie_cols
        # contract makes the winner deterministic (ascending -> "m")
        ch = _changes(spark, [(1, "x", 5, "U"), (1, "m", 5, "U")])
        assert _snap(apply_changes(t, ch, ["k"], tie_cols=["v"])) == [(1, "m")]
        got = latest_changes(ch.repartition(3), ["k"], tie_cols=["v"]).collect()
        assert [(r["k"], r["v"]) for r in got] == [(1, "m")]

    def test_latest_changes_keeps_full_row(self, spark):
        ch = _changes(spark, [(1, "x", 1, "U"), (1, "y", 2, "I"), (2, "z", 1, "U")])
        got = sorted(
            (r["k"], r["v"], r["seq"], r["op"]) for r in latest_changes(ch, ["k"]).collect()
        )
        assert got == [(1, "y", 2, "I"), (2, "z", 1, "U")]


class TestSnapshotDiff:
    def test_statuses_and_column_attribution(self, spark):
        from stepist_spark.operators.cdc import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
            "k bigint, s string, v bigint",
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "B", 21), (4, "now", 40), (9, "x", 1)],
            "k bigint, s string, v bigint",
        )
        got = {
            r["k"]: (r["status"], sorted(r["changed_cols"]))
            for r in snapshot_diff(old, new, ["k"]).collect()
        }
        assert got == {
            1: ("unchanged", []),
            2: ("changed", ["s", "v"]),
            3: ("removed", []),
            4: ("changed", ["s"]),  # NULL -> value counts as a change
            9: ("added", []),
        }

    def test_compare_subset(self, spark):
        from stepist_spark.operators.cdc import snapshot_diff

        old = spark.createDataFrame([(1, "a", 10)], "k bigint, s string, v bigint")
        new = spark.createDataFrame([(1, "a", 99)], "k bigint, s string, v bigint")
        r = snapshot_diff(old, new, ["k"], compare_cols=["s"]).collect()[0]
        assert r["status"] == "unchanged"


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k bigint, grp string, amt bigint")


class TestIncrementalAgg:
    def _agg(self, df):
        return df.groupBy("grp").agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("amt"))

    def test_incremental_equals_recompute(self, spark):
        base = _rows(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "c", 7)])
        removed = _rows(spark, [(2, "a", 20), (4, "c", 7)])       # update pre-image + delete
        added = _rows(spark, [(2, "b", 21), (9, "d", 1)])         # moved group + insert
        got = incremental_agg(self._agg(base), removed, added, ["grp"], ["amt"])
        merged = (
            base.join(removed.select("k"), "k", "left_anti").unionByName(added)
        )
        want = sorted(map(tuple, self._agg(merged).collect()))
        assert sorted(map(tuple, got.collect())) == want

    def test_group_vanishes_at_zero_count(self, spark):
        base = _rows(spark, [(1, "only", 3)])
        got = incremental_agg(
            self._agg(base), _rows(spark, [(1, "only", 3)]),
            _rows(spark, []), ["grp"], ["amt"],
        )
        assert got.count() == 0

    def test_new_group_appears(self, spark):
        base = _rows(spark, [(1, "a", 1)])
        got = incremental_agg(
            self._agg(base), _rows(spark, []),
            _rows(spark, [(5, "z", 9), (6, "z", 1)]), ["grp"], ["amt"],
        )
        rows = {r["grp"]: (r["n"], r["amt"]) for r in got.collect()}
        assert rows == {"a": (1, 1), "z": (2, 10)}


class TestScd2History:
    def _ch(self, spark, rows):
        return spark.createDataFrame(rows, "k bigint, v string, seq bigint, op string")

    def test_versions_and_delete_closes_interval(self, spark):
        from stepist_spark.operators.cdc import scd2_history

        ch = self._ch(
            spark,
            [(1, "a", 1, "I"), (1, "b", 3, "U"), (1, None, 5, "D"), (1, "c", 7, "I")],
        )
        got = sorted(
            (r["v"], r["valid_from_seq"], r["valid_to_seq"], r["is_current"])
            for r in scd2_history(ch, ["k"]).collect()
        )
        assert got == [("a", 1, 3, False), ("b", 3, 5, False), ("c", 7, None, True)]

    def test_same_seq_tie_collapses_by_tie_cols(self, spark):
        from stepist_spark.operators.cdc import scd2_history

        ch = self._ch(spark, [(1, "x", 2, "U"), (1, "m", 2, "U"), (1, "z", 4, "U")])
        got = sorted(
            (r["v"], r["valid_from_seq"], r["valid_to_seq"])
            for r in scd2_history(ch, ["k"], tie_cols=["v"]).collect()
        )
        assert got == [("m", 2, 4), ("z", 4, None)]

    def test_delete_outranks_upsert_at_same_seq(self, spark):
        from stepist_spark.operators.cdc import scd2_history

        ch = self._ch(spark, [(1, "a", 1, "I"), (1, "b", 2, "U"), (1, None, 2, "D")])
        got = sorted(
            (r["v"], r["valid_from_seq"], r["valid_to_seq"])
            for r in scd2_history(ch, ["k"]).collect()
        )
        # seq 2 collapses to the delete: 'a' closes at 2, no version at 2
        assert got == [("a", 1, 2)]

    def test_duckdb_mirror_parity(self, spark):
        import duckdb

        from stepist_spark.operators.cdc import scd2_history, scd2_history_sql

        rows = [
            (k, f"v{k}_{s}", s, op)
            for k in range(20)
            for s, op in [(1, "I"), (2, "U" if k % 3 else "D"), (4, "U")]
        ] + [(5, "tie", 2, "U")]
        ch = self._ch(spark, rows)
        got = sorted(
            (r["k"], r["v"], r["valid_from_seq"], r["valid_to_seq"])
            for r in scd2_history(ch, ["k"], tie_cols=["v"]).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE ch (k BIGINT, v VARCHAR, seq BIGINT, op VARCHAR)")
        con.executemany("INSERT INTO ch VALUES (?, ?, ?, ?)", rows)
        sql = scd2_history_sql("SELECT * FROM ch", ["k"], "seq", "op", ["v"])
        exp = sorted(
            tuple(r)
            for r in con.execute(
                f"SELECT k, v, valid_from_seq, valid_to_seq FROM ({sql})"
            ).fetchall()
        )
        assert got == exp
