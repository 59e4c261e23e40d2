"""Relational operator coverage (SURVEY.md §2.2) over the TPC-H-ish
tables: scans, projection, filters, every join type, hash/sort
aggregation, distinct, rollup/cube/grouping sets, window functions,
sorts/top-k, set ops, scalar functions, pivot, range join, as-of join,
sessionization, JSON extraction.

Scale shapes: dimension sides of joins are broadcast (region/nation/
customer at TPC-H proportions stay small relative to lineitem); all
aggregations are partial-before-shuffle hash aggregates; top-k is
TakeOrderedAndProject (per-partition heaps, no global sort); windows
sort-shuffle once on their partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stepist_spark.operators import asof as asof_ops
from stepist_spark.operators import topk as topk_ops
from stepist_spark.queries import QuerySpec
from stepist_spark.session import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


# --------------------------------------------------------------------------
# q01 — TPC-H Q1 pricing summary: filter + 8-agg hash aggregation
def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 1) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02 — TPC-H Q3 shape: 3-way join + agg + global top-k
def q02_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < _ts("1996-03-15 00:00:00"))
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > _ts("1996-03-15 00:00:00"))
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return topk_ops.global_topk(
        agg.select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        ),
        order=[F.col("revenue").desc(), F.col("l_orderkey").asc()],
        k=10,
    )


Q02_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q03 — TPC-H Q5 shape (flagship): star join region→nation→customer→orders→lineitem
def q03_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q03_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# q04 — EXISTS / left-semi join (TPC-H Q4 shape)
def q04_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf, "lineitem")
    has_late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return has_late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q04_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q05 — NOT EXISTS / left-anti join: customers without any big order
def q05_customers_no_big_order(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    big = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 400000.0)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment", F.round(F.col("c_acctbal"), 2).alias("acctbal"))
    )


Q05_SQL = """
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0
)
"""


# --------------------------------------------------------------------------
# q06 — TPC-H Q6 shape: pure filter + scalar agg (pushdown showcase)
def q06_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q06_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q07 — per-group top-k via row_number window
def q07_top_orders_per_segment(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    ranked = topk_ops.grouped_topk(
        joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        group_cols=["c_mktsegment"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return ranked.select(
        "c_mktsegment",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.col("rn").cast("bigint").alias("rn"),
    )


Q07_SQL = """
SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
FROM (
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# q08 — running aggregates + lag over an ordered per-key window
def q08_running_totals(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


Q08_SQL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       row_number() OVER w AS order_seq
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --------------------------------------------------------------------------
# q09 / q10 / q20 — rollup, cube, grouping sets
def q09_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


Q09_SQL = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 1) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q10_cube(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


Q10_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def q20_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


Q20_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


# --------------------------------------------------------------------------
# q11 — multi-distinct aggregation
def q11_distinct_aggs(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


Q11_SQL = """
SELECT o_orderpriority, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers,
       round(avg(o_totalprice), 4) AS avg_price,
       round(min(o_totalprice), 2) AS min_price, round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q12 — set operations: intersect / except / union
def q12_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    big_spenders = orders.filter(F.col("o_totalprice") > 300000.0).select(
        F.col("o_custkey").alias("k")
    ).distinct()
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("k")
    ).distinct()
    rows = [
        ("intersect", big_spenders.intersect(auto)),
        ("except", big_spenders.exceptAll(auto).distinct()),
        ("union", big_spenders.union(auto).distinct()),
    ]
    out = None
    for op, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")
        out = one if out is None else out.unionByName(one)
    return out


Q12_SQL = """
WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000.0),
     auto AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
SELECT 'intersect' AS op, count(*) AS n FROM (SELECT k FROM big INTERSECT SELECT k FROM auto)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (SELECT k FROM big EXCEPT SELECT k FROM auto)
UNION ALL
SELECT 'union' AS op, count(*) AS n FROM (SELECT k FROM big UNION SELECT k FROM auto)
"""


# --------------------------------------------------------------------------
# q13 — scalar function surface: string / math / conditional, row-level
def q13_scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.length(F.col("p_name")).cast("bigint").alias("name_len"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        F.abs(F.col("p_size") - F.lit(25)).cast("bigint").alias("size_dist"),
        (F.col("p_size") % 7).cast("bigint").alias("size_mod"),
        F.round(F.sqrt(F.col("p_retailprice")), 6).alias("price_sqrt"),
        F.when(F.col("p_size") > 25, "large").otherwise("small").alias("size_class"),
    )


Q13_SQL = """
SELECT p_partkey, upper(p_name) AS name_upper, length(p_name) AS name_len,
       substring(p_type, 1, 5) AS type_prefix,
       concat_ws('-', p_brand, p_type) AS brand_type,
       round(p_retailprice * 1.1, 2) AS marked_up,
       CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
       CAST(p_size % 7 AS BIGINT) AS size_mod,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       CASE WHEN p_size > 25 THEN 'large' ELSE 'small' END AS size_class
FROM part
"""


# --------------------------------------------------------------------------
# q14 — conditional aggregation (CASE inside agg)
def q14_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)), 1).alias("qty_open"),
        F.round(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)), 1).alias("qty_filled"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).cast("bigint").alias("n_high_discount"),
    )


Q14_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END), 1) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END), 1) AS qty_filled,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_discount
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q15 — events: time bucketing + JSON extraction
def q15_events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.sum(F.get_json_object(F.col("props"), "$.k").cast("bigint")).alias("sum_k"),
        )
    )


Q15_SQL = """
SELECT date_trunc('hour', ts::TIMESTAMP) AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q16 — sessionization: lag + gap flag + running sum + per-session agg
def q16_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    gap_us = 30 * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    flagged = ev.withColumn(
        "_new", F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "_sess", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "_sess")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .drop("_sess")
    )


Q16_SQL = """
WITH x AS (
    SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
           lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
), s AS (
    SELECT *, sum(CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
    FROM x
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, sess
"""


# --------------------------------------------------------------------------
# q17 — pivot
def q17_pivot_status(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot yields NULL for empty cells; the oracle's CASE-sum yields 0
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


Q17_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q18 — range join against a broadcast band dimension
PRICE_BANDS = [("budget", 0.0, 20000.0), ("mid", 20000.0, 60000.0), ("premium", 60000.0, 1e9)]


def q18_range_join(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = asof_ops.range_join(li, bands, "l_extendedprice")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


Q18_SQL = f"""
SELECT band, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
JOIN (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)}) AS bands(band, lo, hi)
  ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY band
"""


# --------------------------------------------------------------------------
# q19 — as-of join: for each purchase, the user's most recent signup <= ts
def q19_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_ops.asof_join(
        purchases, signups, on="user_id", left_time="ts", right_time="ts", right_payload=[]
    )
    lag_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("asof_ts").cast("timestamp")
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("signup_ts"),
        lag_us.alias("lag_us"),
        F.round("value", 2).alias("value"),
    )


Q19_SQL = """
WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id, p.ts,
       max(s.ts) AS signup_ts,
       epoch_us(p.ts) - epoch_us(max(s.ts)) AS lag_us,
       round(p.value, 2) AS value
FROM p JOIN s ON s.user_id = p.user_id AND s.ts <= p.ts
GROUP BY p.event_id, p.user_id, p.ts, p.value
"""


# --------------------------------------------------------------------------
# q21 — approximate distinct (no exact cross-engine oracle: rows-only check)
def q21_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.round(F.expr("percentile_approx(l_extendedprice, 0.5)"), 0).alias("approx_median_price"),
    )


# --------------------------------------------------------------------------
# q22 — tumbling event-time window via the streaming helper's batch path
# (stepist_spark.streaming.windows.tumbling_agg: same code the streaming
# runtime runs, here oracle-gated against DuckDB date_trunc buckets —
# valid because 1-hour tumbling windows are epoch-aligned).
def q22_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.streaming.windows import tumbling_agg

    ev = load_table(spark, sf, "events")
    return tumbling_agg(
        ev,
        "ts",
        "1 hour",
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
        group_by=["event_type"],
    )


Q22_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
       date_trunc('hour', ts::TIMESTAMP) AS window_start,
       date_trunc('hour', ts::TIMESTAMP) + INTERVAL 1 HOUR AS window_end
FROM events GROUP BY event_type, window_start
"""


# --------------------------------------------------------------------------
# q23 — session windows (30-minute gap) via the streaming helper's batch
# path. Spark session_window semantics: a gap of exactly 30min starts a
# NEW session (windows are [ts, ts+gap) and merge only on overlap), so
# the oracle's lag-based sessionization uses `>= gap`.
def q23_session_window(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.streaming.windows import session_agg

    ev = load_table(spark, sf, "events")
    return session_agg(
        ev,
        "ts",
        "30 minutes",
        [F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")],
        group_by=["user_id"],
    )


Q23_SQL = """
WITH x AS (
    SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
           lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
    FROM events
), s AS (
    SELECT *, sum(CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) >= 1800000000
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
    FROM x
)
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value,
       min(ts) AS window_start, max(ts) + INTERVAL 30 MINUTE AS window_end
FROM s GROUP BY user_id, sess
"""


# --------------------------------------------------------------------------
# q32 — IN / NOT IN subqueries, including the NOT IN three-valued-logic
# trap: when the subquery can yield NULL, NOT IN must return no rows for
# otherwise-matching keys — both engines must agree on that semantics.
def q32_in_subqueries(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "supplier").createOrReplaceTempView("_q32_supplier")
    load_table(spark, sf, "nation").createOrReplaceTempView("_q32_nation")
    # The NULL trap sits in WHERE position: projected NOT-IN-with-NULL
    # is where engines drift from the standard (Spark returns FALSE for
    # the not-found case where the standard says UNKNOWN); the WHERE
    # form (null-aware anti-join: any NULL in the subquery filters ALL
    # rows) is standard on both engines, so trap_count must be 0.
    return spark.sql(
        """
        SELECT s_suppkey, s_name,
               s_nationkey IN (SELECT n_nationkey FROM _q32_nation WHERE n_regionkey = 0)
                   AS in_region0,
               s_nationkey NOT IN (SELECT n_nationkey FROM _q32_nation WHERE n_regionkey = 1)
                   AS not_in_region1,
               (SELECT count(*) FROM _q32_supplier
                WHERE s_nationkey NOT IN (SELECT CASE WHEN n_regionkey = 2 THEN NULL
                                                      ELSE n_nationkey END
                                          FROM _q32_nation))
                   AS trap_count
        FROM _q32_supplier
        """
    )


Q32_SQL = """
SELECT s_suppkey, s_name,
       s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
           AS in_region0,
       s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
           AS not_in_region1,
       (SELECT count(*) FROM supplier
        WHERE s_nationkey NOT IN (SELECT CASE WHEN n_regionkey = 2 THEN NULL
                                              ELSE n_nationkey END
                                  FROM nation))
           AS trap_count
FROM supplier
"""


# --------------------------------------------------------------------------
# q33 — uncorrelated scalar subquery in SELECT and WHERE
def q33_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "orders").createOrReplaceTempView("_q33_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM _q33_orders), 2)
                   AS delta_from_mean
        FROM _q33_orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM _q33_orders)
        """
    )


Q33_SQL = """
SELECT o_orderkey, o_orderstatus,
       round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2)
           AS delta_from_mean
FROM orders
WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
"""


# --------------------------------------------------------------------------
# q31 — mergeable-HLL distinct rollup (rows-only: Spark's Datasketches
# binary differs from DuckDB's HLL, so estimates can't hash-match; the
# accuracy bound is asserted in tests/test_sketches.py). The two-level
# shape — sketch per fine key, merge to coarse — is the 100 TB pattern:
# rollups re-merge kilobyte sketches instead of rescanning raw data.
def q31_hll_rollup(spark: SparkSession, sf: str) -> DataFrame:
    from stepist_spark.operators import sketches

    li = load_table(spark, sf, "lineitem")
    fine = sketches.build_sketches(li, ["l_returnflag", "l_linestatus"], "l_partkey")
    return sketches.rollup_sketches(fine, ["l_returnflag"]).withColumn(
        "approx_distinct", F.col("approx_distinct").cast("bigint")
    )


# --------------------------------------------------------------------------
# q30 — unpivot (wide -> long): per-flag quantity/price sums melted into
# (flag, measure, value) rows. Spark: the unpivot/melt API; DuckDB: UNPIVOT.
def q30_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_discount"), 2).alias("discount"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )


Q30_SQL = """
UNPIVOT (
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS qty,
           round(sum(l_extendedprice), 2) AS price,
           round(sum(l_discount), 2) AS discount
    FROM lineitem GROUP BY l_returnflag
) ON qty, price, discount INTO NAME measure VALUE value
"""


# --------------------------------------------------------------------------
# q24 — correlated scalar subquery: customers above their nation's mean
# balance. Spark: SQL correlated subquery (decorrelated by Catalyst
# into an aggregate + join — the plan a hand-written join would give).
def q24_correlated_subquery(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "customer").createOrReplaceTempView("_q24_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        FROM _q24_customer o
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM _q24_customer i
                           WHERE i.c_nationkey = o.c_nationkey)
        """
    )


Q24_SQL = """
SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
FROM customer o
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                   WHERE i.c_nationkey = o.c_nationkey)
"""


# --------------------------------------------------------------------------
# q25 — exact percentiles (continuous interpolation) per group.
# l_quantity is whole numbers, so the interpolation arithmetic
# (lo + frac*(hi-lo)) is FP-exact on both engines.
def q25_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95_qty"),
    )


Q25_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.25) AS p25_qty,
       quantile_cont(l_quantity, 0.95) AS p95_qty
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q26 — array aggregation + array functions: per-flag sorted distinct
# quantities, sliced; size and element access.
def q26_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    arr = F.array_sort(F.collect_set(F.col("l_quantity").cast("bigint")))
    return li.groupBy("l_returnflag").agg(
        F.slice(arr, 1, 5).alias("low5"),
        F.size(arr).alias("n_distinct_qty"),
        F.element_at(arr, -1).alias("max_qty"),
    )


Q26_SQL = """
SELECT l_returnflag,
       list_sort(list(DISTINCT CAST(l_quantity AS BIGINT)))[1:5] AS low5,
       len(list(DISTINCT CAST(l_quantity AS BIGINT))) AS n_distinct_qty,
       list_sort(list(DISTINCT CAST(l_quantity AS BIGINT)))[-1] AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q27 — string aggregation (listagg) with deterministic ordering
def q27_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    na = load_table(spark, sf, "nation")
    re = load_table(spark, sf, "region")
    return (
        na.join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


Q27_SQL = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# q28 — date arithmetic: monthly order revenue with month boundaries,
# order age in days at a fixed reference date.
def q28_date_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    return (
        o.groupBy(month.alias("month_start"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.max(
                F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
            ).alias("max_age_days"),
        )
        .withColumn("month_end", F.last_day(F.col("month_start")))
    )


Q28_SQL = """
SELECT date_trunc('month', o_orderdate::TIMESTAMP)::DATE AS month_start,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders,
       max(datediff('day', o_orderdate::DATE, DATE '1998-12-31')) AS max_age_days,
       last_day(date_trunc('month', o_orderdate::TIMESTAMP)::DATE) AS month_end
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
# q29 — window RANGE frame: revenue of orders within a totalprice band
# (current - 1000 .. current) per status, plus ntile quartiles and
# first/last frame values.
def q29_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 50 == 0)
    w_order = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    # float RANGE boundaries aren't expressible through the PySpark
    # Window API (ints only); the SQL frame syntax is
    n_in_band = F.expr(
        "count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice "
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        n_in_band.alias("n_in_band"),
        F.ntile(4).over(w_order).alias("quartile"),
        F.round(F.first("o_totalprice").over(w_order), 2).alias("cheapest_so_far"),
    )


Q29_SQL = """
SELECT o_orderkey, o_orderstatus,
       count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_in_band,
       ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile,
       round(first_value(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey), 2) AS cheapest_so_far
FROM orders WHERE o_orderkey % 50 = 0
"""


# --------------------------------------------------------------------------
# q34 — LATERAL correlated subquery join: each customer's top-2 orders
# by price. The lateral per-row subquery is the SQL-standard spelling;
# Catalyst decorrelates it into a ranked window join rather than
# executing per-customer probes.
def q34_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "customer").createOrReplaceTempView("_q34_customer")
    load_table(spark, sf, "orders").createOrReplaceTempView("_q34_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
               round(t.o_totalprice, 2) AS o_totalprice
        FROM _q34_customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM _q34_orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        """
    )


Q34_SQL = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
       round(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


# --------------------------------------------------------------------------
# q35 — price histogram on exact integer cents (25,000.00-wide buckets):
# engine-portable bucketing without width_bucket's FP boundary hazards.
def q35_price_histogram(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    bucket = (cents - cents % 2_500_000) / 2_500_000
    return (
        orders.withColumn("bucket", bucket.cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


Q35_SQL = """
SELECT CAST((cents - cents % 2500000) / 2500000 AS BIGINT) AS bucket,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_totalprice FROM orders)
GROUP BY 1
"""


QUERIES = [
    QuerySpec("q01_pricing_summary", q01_pricing_summary, Q01_SQL, "TPC-H Q1: filter + 8-agg groupBy"),
    QuerySpec("q02_top_orders", q02_top_orders, Q02_SQL, "TPC-H Q3: 3-way join + agg + top-10"),
    QuerySpec("q03_revenue_by_nation", q03_revenue_by_nation, Q03_SQL, "TPC-H Q5: star join, broadcast dims"),
    QuerySpec("q04_order_priority", q04_order_priority, Q04_SQL, "EXISTS / left-semi join"),
    QuerySpec("q05_customers_no_big_order", q05_customers_no_big_order, Q05_SQL, "NOT EXISTS / left-anti join"),
    QuerySpec("q06_forecast_revenue", q06_forecast_revenue, Q06_SQL, "TPC-H Q6: filter-only scalar agg"),
    QuerySpec("q07_top_orders_per_segment", q07_top_orders_per_segment, Q07_SQL, "grouped top-k window"),
    QuerySpec("q08_running_totals", q08_running_totals, Q08_SQL, "running sum + lag + row_number"),
    QuerySpec("q09_rollup", q09_rollup, Q09_SQL, "ROLLUP aggregation"),
    QuerySpec("q10_cube", q10_cube, Q10_SQL, "CUBE aggregation"),
    QuerySpec("q11_distinct_aggs", q11_distinct_aggs, Q11_SQL, "count distinct + min/max/avg"),
    QuerySpec("q12_set_ops", q12_set_ops, Q12_SQL, "INTERSECT / EXCEPT / UNION"),
    QuerySpec("q13_scalar_functions", q13_scalar_functions, Q13_SQL, "string/math/conditional scalars"),
    QuerySpec("q14_conditional_agg", q14_conditional_agg, Q14_SQL, "CASE inside aggregates"),
    QuerySpec("q15_events_hourly", q15_events_hourly, Q15_SQL, "time bucketing + JSON extraction"),
    QuerySpec("q16_sessionize", q16_sessionize, Q16_SQL, "sessionization via gap windows"),
    QuerySpec("q17_pivot_status", q17_pivot_status, Q17_SQL, "pivot"),
    QuerySpec("q18_range_join", q18_range_join, Q18_SQL, "range join vs broadcast bands"),
    QuerySpec("q19_asof_join", q19_asof_join, Q19_SQL, "as-of join (backward, inclusive)"),
    QuerySpec("q20_grouping_sets", q20_grouping_sets, Q20_SQL, "GROUPING SETS via SQL API"),
    QuerySpec("q21_approx_distinct", q21_approx_distinct, None, "approx_count_distinct + approx percentile (rows-only)"),
    QuerySpec("q22_tumbling_window", q22_tumbling_window, Q22_SQL, "tumbling event-time window (streaming helper, batch path)"),
    QuerySpec("q23_session_window", q23_session_window, Q23_SQL, "session windows, 30-min gap (streaming helper, batch path)"),
    QuerySpec("q24_correlated_subquery", q24_correlated_subquery, Q24_SQL, "correlated scalar subquery (decorrelated)"),
    QuerySpec("q25_percentiles", q25_percentiles, Q25_SQL, "exact continuous percentiles per group"),
    QuerySpec("q26_array_functions", q26_array_functions, Q26_SQL, "array agg + sort/slice/element_at"),
    QuerySpec("q27_string_agg", q27_string_agg, Q27_SQL, "ordered string aggregation (listagg)"),
    QuerySpec("q28_date_arithmetic", q28_date_arithmetic, Q28_SQL, "date_trunc/datediff/last_day arithmetic"),
    QuerySpec("q29_window_frames", q29_window_frames, Q29_SQL, "RANGE frame + ntile + first_value windows"),
    QuerySpec("q30_unpivot", q30_unpivot, Q30_SQL, "unpivot/melt wide measures to long"),
    QuerySpec("q31_hll_rollup", q31_hll_rollup, None, "mergeable HLL sketch rollup (rows-only)"),
    QuerySpec("q32_in_subqueries", q32_in_subqueries, Q32_SQL, "IN / NOT IN subqueries incl. NULL three-valued logic"),
    QuerySpec("q33_scalar_subquery", q33_scalar_subquery, Q33_SQL, "uncorrelated scalar subqueries in SELECT and WHERE"),
    QuerySpec("q34_lateral_topn", q34_lateral_topn, Q34_SQL, "LATERAL correlated top-n subquery join"),
    QuerySpec("q35_price_histogram", q35_price_histogram, Q35_SQL, "integer-exact price histogram"),
]
