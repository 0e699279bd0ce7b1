"""Advanced relational surface: statistical aggregates, subqueries, CTEs,
lead/percent_rank, batch session windows, unpivot, time-range frames.

Rounds out SURVEY.md §2 B4/B5 with the ClickHouse analytics idioms not
covered by the core modules. Statistical moments are computed from exact
decimal power sums so results are bit-identical to the oracle regardless
of partial-aggregation order."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import dec, dsum, t


@query(
    "q51_stats_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND(sx / n, 6) AS mean_qty,
           ROUND((sx2 - sx * sx / n) / (n - 1), 6) AS var_qty,
           ROUND(sqrt((sx2 - sx * sx / n) / (n - 1)), 6) AS stddev_qty
    FROM s
    """,
)
def q51_stats_moments(spark, sf_dir):
    """varSamp/stddevSamp (ClickHouse spellings) from exact decimal power
    sums — the two-pass-free, shuffle-once moment computation; at scale
    this is how you get deterministic variance over 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sx"),
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("sx2"),
    )
    var = (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(F.col("sx") / F.col("n"), 6).alias("mean_qty"),
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
    )


@query(
    "q52_correlation",
    oracle="""
    WITH s AS (
      SELECT l_linestatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus, n,
           ROUND((n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6) AS corr_qty_price
    FROM s
    """,
)
def q52_correlation(spark, sf_dir):
    """Pearson correlation from exact decimal cross-moments (ClickHouse
    corr())."""
    li = t(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity"), dec("l_extendedprice")
    s = li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sx2"),
        F.sum(p * p).cast("double").alias("sy2"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sy, sx2, sy2, sxy = (F.col(c) for c in ["n", "sx", "sy", "sx2", "sy2", "sxy"])
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy))
    return s.select("l_linestatus", "n", F.round(corr, 6).alias("corr_qty_price"))


@query(
    "q53_exists_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = orders.o_orderkey AND l.l_discount > 0.09)
      AND o_orderstatus = 'O'
    """,
)
def q53_exists_subquery(spark, sf_dir):
    """Correlated EXISTS through the SQL path (Catalyst rewrites to a
    left-semi join — same plan as q21's DataFrame form)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = orders.o_orderkey AND l.l_discount > 0.09)
          AND o_orderstatus = 'O'
        """
    )


@query(
    "q54_in_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
    )
    """,
)
def q54_in_subquery(spark, sf_dir):
    """IN + nested scalar subquery (region lookup) through SQL."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    t(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM nation
            WHERE n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
        )
        """
    )


@query(
    "q55_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)
    """,
)
def q55_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery: orders above 2x the mean price."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)
        """
    )


@query(
    "q56_cte_share",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS seg_rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
    ),
    tot AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev FROM orders)
    SELECT c_mktsegment, seg_rev, ROUND(seg_rev / total_rev, 6) AS rev_share
    FROM seg CROSS JOIN tot
    """,
)
def q56_cte_share(spark, sf_dir):
    """Chained CTEs + cross join with a 1-row aggregate (revenue share
    per market segment)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_mktsegment,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS seg_rev
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment
        ),
        tot AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev FROM orders)
        SELECT c_mktsegment, seg_rev, ROUND(seg_rev / total_rev, 6) AS rev_share
        FROM seg CROSS JOIN tot
        """
    )


@query(
    "q57_event_transitions",
    oracle="""
    SELECT event_type AS from_event, next_event AS to_event, COUNT(*) AS n
    FROM (SELECT event_type,
                 LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event
          FROM events) x
    WHERE next_event IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q57_event_transitions(spark, sf_dir):
    """lead() — the event-transition (markov edge) matrix per user."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.col("event_type").alias("from_event"),
            F.lead("event_type").over(w).alias("to_event"),
        )
        .filter(F.col("to_event").isNotNull())
        .groupBy("from_event", "to_event")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q58_percent_rank",
    oracle="""
    SELECT c_custkey,
           ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_cume_dist
    FROM customer
    """,
)
def q58_percent_rank(spark, sf_dir):
    """percent_rank / cume_dist over account balance.

    Note: a semantically-global rank is a single-reducer sort — acceptable
    for a dimension table like customer, never for a fact table.  At fact
    scale, pre-bucket with approx_percentile (or the range-partitioned
    cumsum in operators/stats.py) and rank within buckets instead."""
    c = t(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


@query(
    "q59_string_extra",
    oracle="""
    SELECT p_partkey,
           replace(p_name, ' ', '_') AS snake_name,
           strpos(p_name, 'widget') AS widget_pos,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           left(p_type, 3) AS type3,
           repeat('*', p_size % 5) AS stars
    FROM part
    """,
)
def q59_string_extra(spark, sf_dir):
    """replace/locate/lpad/reverse/left/repeat — the rest of the B8
    string family."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.instr("p_name", "widget").cast("bigint").alias("widget_pos"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_type", 1, 3).alias("type3"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
    )


@query(
    "q60_distinct_pairs",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_combos
    FROM (SELECT DISTINCT l_returnflag, l_suppkey, l_partkey FROM lineitem) x
    GROUP BY l_returnflag
    """,
)
def q60_distinct_pairs(spark, sf_dir):
    """Multi-column distinct -> count (dedup-then-aggregate shape)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_suppkey", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_combos"))
    )


@query(
    "q61_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def q61_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (disjoint dimension subtotals — distinct
    from q09 rollup / q10 cube)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "q62_session_window",
    oracle="""
    WITH g AS (
      -- MICROSECOND comparison, not date_diff('second'): Spark's native
      -- session_window gaps at full timestamp precision, while
      -- date_diff('second') counts boundary crossings (a 1799.34s gap
      -- spans 1800 boundaries and would split a session Spark merges —
      -- caught by the sf0.1 sweep, one such pair in the data)
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR epoch_ns(ts) // 1000
                          - epoch_ns(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) // 1000
                          >= 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q62_session_window(spark, sf_dir):
    """Native session_window() in BATCH mode — same expression runs under
    readStream+watermark (SURVEY §2 B9). Spark merges events closer than
    the gap; window end = last event + gap. Oracle reproduces via the
    lag/islands construction.

    Note Spark's session_window uses gap > diff (an event exactly 30:00
    later starts a NEW session) — the oracle's `>= 1800` matches."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q63_unpivot",
    oracle="""
    SELECT user_id, metric, v
    FROM (
      SELECT user_id, 'n_events' AS metric, CAST(COUNT(*) AS DOUBLE) AS v FROM events GROUP BY user_id
      UNION ALL
      SELECT user_id, 'total_value', CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) FROM events GROUP BY user_id
      UNION ALL
      SELECT user_id, 'max_value', CAST(MAX(value) AS DOUBLE) FROM events GROUP BY user_id
    ) u
    """,
)
def q63_unpivot(spark, sf_dir):
    """Unpivot (wide metrics -> long) via stack — ClickHouse users reach
    for arrayJoin(map); Spark spells it stack/unpivot."""
    e = t(spark, sf_dir, "events")
    wide = e.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n_events"),
        dsum("value", "total_value"),
        F.max("value").alias("max_value"),
    )
    return wide.unpivot(
        ["user_id"], ["n_events", "total_value", "max_value"], "metric", "v"
    )


@query(
    "q64_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d
    FROM orders
    """,
)
def q64_range_frame(spark, sf_dir):
    """Time-RANGE window frame: trailing-90-day spend per customer (the
    moving-aggregate idiom; frame bounds in epoch seconds because Spark's
    rangeBetween needs a numeric ordering key)."""
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("spend_90d"),
    )
