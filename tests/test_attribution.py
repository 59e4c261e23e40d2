"""Multi-touch attribution + RFM segmentation vs hand/Python references."""

from __future__ import annotations

from stepist_spark.operators.attribution import (
    attributed_touches,
    channel_credit,
    conversion_paths,
)
from stepist_spark.operators.segmentation import rfm_segments

SCHEMA = "user bigint, ts bigint, etype string, value double, eid bigint"


def _touches(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return attributed_touches(
        df, "user", "ts", "etype", "value", "eid", "buy", ["click", "view"]
    )


class TestAttribution:
    def test_touch_assignment_and_flags(self, spark):
        rows = [
            # user 1: v, c -> buy(10); c -> buy(20); trailing view unattributed
            (1, 10, "view", 0.0, 101),
            (1, 20, "click", 0.0, 102),
            (1, 30, "buy", 10.0, 103),
            (1, 40, "click", 0.0, 104),
            (1, 50, "buy", 20.0, 105),
            (1, 60, "view", 0.0, 106),
            # user 2: conversion with no touches; then nothing
            (2, 10, "buy", 5.0, 201),
        ]
        got = _touches(spark, rows).collect()
        by_touch = {r["touch_id"]: r for r in got}
        assert set(by_touch) == {101, 102, 104}  # 106 is unattributed
        assert by_touch[101]["conv_id"] == 103 and by_touch[102]["conv_id"] == 103
        assert by_touch[104]["conv_id"] == 105
        assert by_touch[101]["is_first"] and not by_touch[101]["is_last"]
        assert by_touch[102]["is_last"] and not by_touch[102]["is_first"]
        assert by_touch[104]["is_first"] and by_touch[104]["is_last"]
        # linear credit: integer division of cents*1e6
        assert by_touch[101]["credit_linear_scaled"] == (1000 * 1_000_000) // 2
        assert by_touch[104]["credit_linear_scaled"] == 2000 * 1_000_000

    def test_paths_and_credit_models(self, spark):
        rows = [
            (1, 10, "view", 0.0, 1),
            (1, 20, "click", 0.0, 2),
            (1, 25, "view", 0.0, 3),
            (1, 30, "buy", 9.0, 4),
        ]
        tt = _touches(spark, rows)
        [p] = conversion_paths(tt).collect()
        assert (p["first_touch_id"], p["last_touch_id"]) == (1, 3)
        assert (p["first_touch_type"], p["last_touch_type"]) == ("view", "view")
        assert p["n_touches"] == 3 and p["value_cents"] == 900
        first = {r["touch_type"]: r["credit_scaled"] for r in channel_credit(tt, "first").collect()}
        last = {r["touch_type"]: r["credit_scaled"] for r in channel_credit(tt, "last").collect()}
        lin = {r["touch_type"]: r["credit_scaled"] for r in channel_credit(tt, "linear").collect()}
        assert first == {"view": 900 * 1_000_000, "click": 0}
        assert last == {"view": 900 * 1_000_000, "click": 0}
        # 900 cents over 3 touches: each gets 300*1e6 exactly
        assert lin == {"view": 2 * 300 * 1_000_000, "click": 300 * 1_000_000}

    def test_same_ts_tie_breaks_by_id(self, spark):
        # touch and conversion share ts: ordering is (ts, eid) so the
        # touch (lower eid) precedes the conversion and is attributed
        rows = [
            (1, 10, "click", 0.0, 1),
            (1, 10, "buy", 1.0, 2),
        ]
        got = _touches(spark, rows).collect()
        assert len(got) == 1 and got[0]["conv_id"] == 2


class TestRfm:
    def test_scores_match_python(self, spark):
        import datetime as dt

        rows = []
        # 4 customers: spend/frequency/recency strictly ordered by id
        for c in range(1, 5):
            for k in range(c):  # frequency = c
                rows.append(
                    (c, dt.datetime(2024, 1, c), float(10 * c))
                )  # last_ts, amount grow with c
        df = spark.createDataFrame(rows, "cust bigint, ts timestamp, amt double")
        got = {
            r["customer"]: (r["r_score"], r["f_score"], r["m_score"], r["segment"])
            for r in rfm_segments(df, "cust", "ts", "amt", n_tiles=4).collect()
        }
        # each dimension orders customers 1..4 -> tiles 1..4
        for c in range(1, 5):
            assert got[c] == (c, c, c, f"{c}-{c}-{c}")

    def test_monetary_exact_cents(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 0.1), (1, dt.datetime(2024, 1, 2), 0.2)],
            "cust bigint, ts timestamp, amt double",
        )
        [r] = rfm_segments(df, "cust", "ts", "amt", n_tiles=2).collect()
        assert r["monetary_cents"] == 30  # 10 + 20, no float drift
        assert r["frequency"] == 2


class TestTimeToConvert:
    def test_median_and_mean(self, spark):
        from stepist_spark.operators.attribution import (
            attributed_touches,
            time_to_convert,
        )
        import datetime as dt

        base = dt.datetime(2024, 1, 1)

        def t(mins):
            return base + dt.timedelta(minutes=mins)

        rows = [
            # conv 1: first touch view at 0, conv at 10 -> 600s
            (1, t(0), "view", 0.0, 1),
            (1, t(10), "buy", 5.0, 2),
            # conv 2 (same user): first touch view at 20, conv at 50 -> 1800s
            (1, t(20), "view", 0.0, 3),
            (1, t(30), "click", 0.0, 4),
            (1, t(50), "buy", 5.0, 5),
            # conv 3 (user 2): first touch click at 0 -> 300s
            (2, t(0), "click", 0.0, 6),
            (2, t(5), "buy", 5.0, 7),
        ]
        df = spark.createDataFrame(
            rows, "user bigint, ts timestamp, etype string, value double, eid bigint"
        )
        tt = attributed_touches(
            df, "user", "ts", "etype", "value", "eid", "buy", ["click", "view"]
        )
        got = {r["first_touch_type"]: r for r in time_to_convert(tt).collect()}
        v = got["view"]
        assert v["n_conv"] == 2
        assert v["total_us"] == (600 + 1800) * 1_000_000
        assert v["median_us"] == 600 * 1_000_000  # lower median of {600, 1800}
        assert v["mean_us"] == round((600 + 1800) * 1_000_000 / 2, 6)
        c = got["click"]
        assert c["n_conv"] == 1 and c["median_us"] == 300 * 1_000_000
