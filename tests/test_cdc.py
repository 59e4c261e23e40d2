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
