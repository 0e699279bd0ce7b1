"""Join surface (SURVEY.md §2 B3): broadcast star joins, semi/anti,
as-of, range, and non-equi theta joins.

The reference schema links event families via user/session/content keys
(``dto.proto:9-11``; ``migrations/009_…:18-19``); the driver's TPC-H-ish
star (lineitem->orders->customer->nation->region) is the stand-in."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.joins import asof_join, range_join
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import dec, dsum, t


@query(
    "q20_star_join_revenue",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1, 2
    """,
)
def q20_star_join_revenue(spark, sf_dir):
    """TPC-H Q5-shaped star join. The dimension chain
    (customer->nation->region) is broadcast — only the fact->orders join
    shuffles, on the join key. At 100 TB: orders/lineitem bucketed on
    orderkey makes even that shuffle-free."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer is sf-proportional — un-forced (AQE broadcasts when
        # small); bounded: nation (25 rows) / region (5 rows) are fixed
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(revenue).cast("double").alias("revenue"), F.count("*").alias("n_lineitems"))
    )


@query(
    "q21_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = customer.c_custkey AND o.o_totalprice > 300000)
    """,
)
def q21_semi_join(spark, sf_dir):
    """left_semi ≙ EXISTS — customers with at least one big order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q22_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey)
    """,
)
def q22_anti_join(spark, sf_dir):
    """left_anti ≙ NOT EXISTS — "users who watched but never liked"
    cohort shape (SURVEY §2 B3)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q23_left_join_agg",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS lifetime_value
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def q23_left_join_agg(spark, sf_dir):
    """Left outer join preserving order-less customers, then aggregate."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("lifetime_value"),
        )
    )


@query(
    "q24_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           p.ts AS purchase_ts, v.ts AS last_view_ts, v.event_id AS view_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q24_asof_join(spark, sf_dir):
    """As-of join — for each purchase, the user's most recent prior view
    (latest-state-before-event, the ClickHouse ASOF JOIN idiom). Engine
    operator: union+window, one shuffle (operators/joins.py)."""
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("last_view_ts"), F.col("event_id").alias("view_id")
    )
    return asof_join(
        p,
        v,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="last_view_ts",
        right_cols=["last_view_ts", "view_id"],
    )


@query(
    "q25_range_join",
    oracle="""
    SELECT o.o_orderkey, COUNT(l.l_linenumber) AS n_shipped_90d,
           CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS shipped_value
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def q25_range_join(spark, sf_dir):
    """Equi+range (interval) join: lineitems shipped within 90 days of
    their order. The equi key carries the hash join; the range predicate
    evaluates inside it — no nested-loop."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        o.join(li, cond, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_linenumber").alias("n_shipped_90d"),
            F.coalesce(F.sum(dec("l_extendedprice")), F.lit(0)).cast("double").alias("shipped_value"),
        )
    )


@query(
    "q26_theta_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_richer_customers
    FROM supplier s
    JOIN customer c ON c.c_acctbal > s.s_acctbal AND c.c_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q26_theta_join(spark, sf_dir):
    """Theta join (inequality predicate) with an equi anchor on
    nationkey — Catalyst uses the equi part for hashing, theta as filter."""
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    return (
        s.join(c, (c.c_acctbal > s.s_acctbal) & (c.c_nationkey == s.s_nationkey))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_richer_customers"))
    )


@query(
    "q139_any_join",
    oracle="""
    WITH one AS (
      SELECT l_orderkey, l_partkey, l_quantity,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity
             ) AS rn
      FROM lineitem
    )
    SELECT o.o_orderkey, o.o_custkey,
           one.l_partkey AS first_part,
           one.l_quantity AS first_qty
    FROM orders o
    LEFT JOIN one ON one.l_orderkey = o.o_orderkey AND one.rn = 1
    """,
)
def q139_any_join(spark, sf_dir):
    """ClickHouse ANY LEFT JOIN: each order matched to at most ONE
    lineitem (deterministically the lowest line number — CH picks an
    arbitrary one; a pinned order is the engine-portable spelling). The
    right side reduces to one row per key BEFORE the join
    (WindowGroupLimit), so the join can never fan out."""
    from ed_clickhouse_spark.operators.joins import any_join

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_partkey",
        "l_quantity",
        "l_linenumber",
    )
    return any_join(
        o, li, on=["o_orderkey"], order_by=[F.col("l_linenumber"), F.col("l_partkey"), F.col("l_quantity")]
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("l_partkey").alias("first_part"),
        F.col("l_quantity").alias("first_qty"),
    )
