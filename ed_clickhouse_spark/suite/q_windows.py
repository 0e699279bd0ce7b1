"""Window-function surface (SURVEY.md §2 B5): ranking, lag/lead,
running frames, ntile, sessionization, funnel — the sessionized
time-ordered analytics the reference's ``(timestamp, event_name)``
MergeTree ordering is designed for (``migrations/007_…:5,7,18``)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.joins import topk_per_group
from ed_clickhouse_spark.operators.windows import funnel, sessionize
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import dec, t


@query(
    "q27_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM (SELECT p_brand, p_partkey, p_name, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part) x
    WHERE rn <= 3
    """,
)
def q27_topk_per_group(spark, sf_dir):
    """Top-3 parts by price per brand — engine helper topk_per_group
    (row_number pattern; WindowGroupLimit keeps the shuffle at k rows/key)."""
    p = t(spark, sf_dir, "part")
    return topk_per_group(
        p.select("p_brand", "p_partkey", "p_name", "p_retailprice"),
        keys=["p_brand"],
        order=[F.col("p_retailprice").desc(), F.col("p_partkey")],
        k=3,
    )


@query(
    "q28_lag_gap",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_gaps,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
           CAST(SUM(gap_s) AS BIGINT) AS total_gap_s
    FROM (SELECT user_id,
                 date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
          FROM events) x
    WHERE gap_s IS NOT NULL
    GROUP BY user_id
    """,
)
def q28_lag_gap(spark, sf_dir):
    """Inter-event gaps per user via lag — the session-stitching primitive."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        e.withColumn("gap_s", gap)
        .filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
            F.sum("gap_s").alias("total_gap_s"),
        )
    )


@query(
    "q29_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def q29_running_sum(spark, sf_dir):
    """Cumulative spend per customer — running frame + row_number share
    one window partitioning (single shuffle, single sort)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


@query(
    "q30_ntile_rank",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS wealth_quartile,
           RANK() OVER (ORDER BY c_mktsegment) AS seg_rank,
           DENSE_RANK() OVER (ORDER BY c_mktsegment) AS seg_dense_rank
    FROM customer
    """,
)
def q30_ntile_rank(spark, sf_dir):
    """ntile/rank/dense_rank. Note: a global (unpartitioned) window is a
    single-reducer sort — fine for dimension tables, never for facts; at
    scale use operators/windows.py approx_ntile (q253) instead — one
    approx_percentile aggregate + a codegen projection, no WindowExec."""
    c = t(spark, sf_dir, "customer")
    w_bal = W.orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_seg = W.orderBy("c_mktsegment")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w_bal).cast("bigint").alias("wealth_quartile"),
        F.rank().over(w_seg).cast("bigint").alias("seg_rank"),
        F.dense_rank().over(w_seg).cast("bigint").alias("seg_dense_rank"),
    )


@query(
    "q31_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) IS NULL
                       OR date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    )
    SELECT user_id,
           CAST(SUM(is_start) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def q31_sessionize(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via the engine sessionize
    operator; batch twin of streaming session_window(ts, '30 minutes')."""
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = sessionize(e, "user_id", "ts", 1800)
    return s.groupBy("user_id").agg(
        F.max("session_seq").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "q32_funnel",
    oracle="""
    WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events WHERE event_type = 'signup' GROUP BY user_id),
         t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'view' AND e.ts > t1.ts1 GROUP BY e.user_id),
         t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id)
    SELECT u.user_id,
           CASE WHEN t3.user_id IS NOT NULL THEN 3
                WHEN t2.user_id IS NOT NULL THEN 2
                WHEN t1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_steps
    FROM (SELECT DISTINCT user_id FROM events WHERE event_type IN ('signup','view','purchase')) u
    LEFT JOIN t1 ON u.user_id = t1.user_id
    LEFT JOIN t2 ON u.user_id = t2.user_id
    LEFT JOIN t3 ON u.user_id = t3.user_id
    """,
)
def q32_funnel(spark, sf_dir):
    """ClickHouse windowFunnel ≙ engine funnel operator: steps completed
    in order (signup -> view -> purchase), strictly increasing timestamps.
    Single shuffle + JVM higher-order-function fold — no Python UDF."""
    e = t(spark, sf_dir, "events")
    return funnel(e, "user_id", "ts", "event_type", ["signup", "view", "purchase"])


@query(
    "q33_first_last_value",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
           LAST_VALUE(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    """,
)
def q33_first_last_value(spark, sf_dir):
    """first/last event per user (full-frame window + distinct)."""
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_event"),
        F.last("event_type").over(w).alias("last_event"),
    ).distinct()


@query(
    "q140_running_difference",
    oracle="""
    SELECT event_id,
           ROUND(COALESCE(value - LAG(value) OVER w, 0), 4) AS diff,
           ROUND(COALESCE(LAG(value) OVER w, -1.0), 4) AS prev_v,
           ROUND(COALESCE(LEAD(value) OVER w, -1.0), 4) AS next_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q140_running_difference(spark, sf_dir):
    """ClickHouse runningDifference + neighbor(x, ±1): per-user value
    deltas and adjacent-row values in time order (deterministic
    (ts, event_id) tiebreak; out-of-range neighbor -> -1.0 default).
    One window shuffle on user_id serves all three expressions."""
    from ed_clickhouse_spark.operators.windows import neighbor, running_difference

    e = t(spark, sf_dir, "events")
    pb, ob = ["user_id"], ["ts", "event_id"]
    return e.select(
        "event_id",
        F.round(running_difference("value", pb, ob), 4).alias("diff"),
        F.round(neighbor("value", -1, pb, ob, default=-1.0), 4).alias("prev_v"),
        F.round(neighbor("value", 1, pb, ob, default=-1.0), 4).alias("next_v"),
    )


@query(
    "q129_moving_window_aggs",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           ROUND(SUM(v) OVER w3, 4) AS mov_sum3,
           ROUND(AVG(v) OVER w3, 4) AS mov_avg3,
           ROUND(MAX(v) OVER w3, 4) AS mov_max3
    FROM daily
    WINDOW w3 AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q129_moving_window_aggs(spark, sf_dir):
    """ClickHouse groupArrayMovingSum/MovingAvg(3): 3-day moving sum,
    average, and max of daily event value per type. CH materializes the
    moving series as an array inside the aggregate; the engine-idiomatic
    spelling is a sliding ROWS frame over the pre-aggregated daily
    series — the window shuffle carries days, not events."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
    w3 = W.partitionBy("event_type").orderBy("day").rowsBetween(-2, 0)
    return daily.select(
        "event_type",
        "day",
        F.round(F.sum("v").over(w3), 4).alias("mov_sum3"),
        F.round(F.avg("v").over(w3), 4).alias("mov_avg3"),
        F.round(F.max("v").over(w3), 4).alias("mov_max3"),
    )


@query(
    "q130_gapfill_interpolate",
    oracle="""
    WITH cal AS (
      SELECT CAST(d AS DATE) AS day
      FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) t(d)
    ),
    daily AS (
      -- exact integer round-half-up of avg*10000 (see the Spark side:
      -- avg-of-decimal double-rounds)
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             (200 * SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              + COUNT(value)) // (2 * COUNT(value)) AS v4
      FROM events
      WHERE day(ts) % 3 <> 0
      GROUP BY 1
    ),
    g AS (
      SELECT cal.day, daily.v4,
             CAST(cal.day - DATE '2024-01-01' AS BIGINT) AS h
      FROM cal LEFT JOIN daily ON cal.day = daily.day
    ),
    n AS (
      SELECT day, v4, h,
             LAST_VALUE(v4 IGNORE NULLS) OVER wp AS pv,
             LAST_VALUE(CASE WHEN v4 IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS ph,
             FIRST_VALUE(v4 IGNORE NULLS) OVER wf AS nv,
             FIRST_VALUE(CASE WHEN v4 IS NOT NULL THEN h END IGNORE NULLS) OVER wf AS nh
      FROM g
      WINDOW wp AS (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT day,
           (v4 IS NULL) AS filled,
           CAST(COALESCE(v4 * 2,
             CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN (pv * (nh - h) + nv * (h - ph)) * 2 / (nh - ph)
                  ELSE COALESCE(pv, nv) * 2 END) AS BIGINT) AS val_e4x2
    FROM n
    """,
)
def q130_gapfill_interpolate(spark, sf_dir):
    """ClickHouse ``WITH FILL ... INTERPOLATE``: daily averages with
    every third day removed, re-filled by LINEAR interpolation between
    the nearest observed neighbors (edges take the nearest side). The
    neighbor search is two ignore-nulls window scans — no self-join,
    no per-gap loop; at scale the window shuffles days, not events."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        e.where(F.dayofmonth("ts") % 3 != 0)
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        # exact scaled-integer values (1e-4 units) computed ENTIRELY in
        # integer arithmetic: v4 = round_half_up(sum_hundredths * 100 /
        # count) = (200*S + C) div (2*C) for the non-negative values
        # here. The previous round(avg(decimal), 4) DOUBLE-ROUNDED:
        # Spark's decimal avg is itself rounded to scale 6, so
        # 49.92514952 became 49.925150 then 49.9252, while the true
        # 4-dp rounding is 49.9251 (caught by the sf0.1 sweep).
        .agg(
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("__s"),
            F.count("value").alias("__c"),
        )
        .select(
            "day",
            F.expr("(200 * __s + __c) div (2 * __c)").alias("v4"),
        )
    )
    g = (
        # bounded: cal is a generated day spine (one row per calendar day)
        F.broadcast(cal)
        .join(daily, "day", "left")
        .withColumn("h", F.datediff("day", F.lit("2024-01-01").cast("date")).cast("bigint"))
    )
    # bounded windows: one row per calendar day (the broadcast spine)
    wp = W.orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    wf = W.orderBy("h").rowsBetween(0, W.unboundedFollowing)
    marked = F.when(F.col("v4").isNotNull(), F.col("h"))
    n = g.select(
        "day",
        "v4",
        "h",
        F.last("v4", ignorenulls=True).over(wp).alias("pv"),
        F.last(marked, ignorenulls=True).over(wp).alias("ph"),
        F.first("v4", ignorenulls=True).over(wf).alias("nv"),
        F.first(marked, ignorenulls=True).over(wf).alias("nh"),
    )
    # doubled numerator keeps half-step midpoints exact in integers
    # (value = val_e4x2 / 2e4); integer div is exact here because
    # (nh - ph) | 2 for the single-day gaps this fill produces
    interp = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        (
            (F.col("pv") * (F.col("nh") - F.col("h")) + F.col("nv") * (F.col("h") - F.col("ph")))
            * 2
            / (F.col("nh") - F.col("ph"))
        ),
    ).otherwise(F.coalesce("pv", "nv") * 2)
    return n.select(
        "day",
        F.col("v4").isNull().alias("filled"),
        F.coalesce(F.col("v4") * 2, interp).cast("bigint").alias("val_e4x2"),
    )


@query(
    "q154_lttb_downsample",
    oracle="""
    WITH s AS (
      SELECT event_type, ts, epoch(ts) AS x,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    env AS (
      SELECT event_type, MIN(x) AS lo, MAX(x) AS hi FROM s GROUP BY 1
    ),
    pts AS (
      SELECT s.*, CAST(FLOOR((x - lo) * 20 / (hi - lo + 1)) AS BIGINT) AS b
      FROM s JOIN env USING (event_type)
    ),
    means AS (
      SELECT event_type, b,
             SUM(x) / COUNT(*) AS mx,
             CAST(SUM(CAST(y AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS my
      FROM pts GROUP BY 1, 2
    ),
    anchors AS (
      SELECT event_type, b,
             LAG(mx)  OVER (PARTITION BY event_type ORDER BY b) AS px,
             LAG(my)  OVER (PARTITION BY event_type ORDER BY b) AS py,
             LEAD(mx) OVER (PARTITION BY event_type ORDER BY b) AS nx,
             LEAD(my) OVER (PARTITION BY event_type ORDER BY b) AS ny
      FROM means
    ),
    scored AS (
      SELECT pts.event_type, pts.b, pts.ts, pts.y,
             CASE WHEN px IS NULL THEN -pts.x
                  WHEN ny IS NULL THEN pts.x
                  ELSE ABS((px - nx) * (pts.y - py) - (px - pts.x) * (ny - py))
             END AS score
      FROM pts JOIN anchors USING (event_type, b)
    ),
    ranked AS (
      SELECT event_type, b AS bucket, ts, y,
             ROW_NUMBER() OVER (PARTITION BY event_type, b
                                ORDER BY score DESC, ts ASC) AS rn
      FROM scored
    )
    SELECT event_type, bucket, ts, y FROM ranked WHERE rn = 1
    """,
)
def q154_lttb_downsample(spark, sf_dir):
    """ClickHouse largestTriangleThreeBuckets(20): downsample each
    event type's per-second value series to 20 visually-representative
    points (parallel mean-anchor variant — see
    operators/windows.py:lttb_downsample for why the anchor choice is
    what makes the operator distributable). The series is pre-reduced
    to one row per (type, second) so every tiebreak is deterministic."""
    from ed_clickhouse_spark.operators.windows import lttb_downsample

    e = t(spark, sf_dir, "events")
    s = e.groupBy("event_type", "ts").agg(
        F.sum(dec("value")).cast("double").alias("y")
    )
    return lttb_downsample(s, "ts", "y", 20, ["event_type"])


@query(
    "q184_session_depth",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN date_diff('second', LAG(ts) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id), ts) IS NULL
                       OR date_diff('second', LAG(ts) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    s AS (
      SELECT user_id,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
      FROM g
    ),
    d AS (
      SELECT user_id, seq, COUNT(*) AS depth FROM s GROUP BY 1, 2
    )
    SELECT LEAST(depth, 10) AS depth_bucket,
           COUNT(*) AS n_sessions,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6) AS share
    FROM d GROUP BY 1
    """,
)
def q184_session_depth(spark, sf_dir):
    """Session-depth distribution (how many events per 30-min session,
    capped at 10+) with each bucket's share — the bounce-rate readout
    (depth 1 = bounce). Rides the q31 sessionize window; one extra
    grouped count + one tiny distribution aggregate."""
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    s = sessionize(e, "user_id", "ts", 1800)
    d = s.groupBy("user_id", "session_seq").agg(F.count("*").alias("depth"))
    dist = d.groupBy(
        F.least(F.col("depth"), F.lit(10)).alias("depth_bucket")
    ).agg(F.count("*").alias("n_sessions"))
    # bounded window: <= 11 depth-bucket rows
    total = W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return dist.select(
        "depth_bucket",
        "n_sessions",
        F.round(F.col("n_sessions") * 1.0 / F.sum("n_sessions").over(total), 6).alias(
            "share"
        ),
    )


@query(
    "q185_top_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
           COUNT(*) AS n
    FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path ASC
    LIMIT 10
    """,
)
def q185_top_paths(spark, sf_dir):
    """Top consecutive 3-event paths across all user journeys (the
    "what do users do next" sankey feed). One user-keyed window (both
    leads share it), a path-string count, TakeOrderedAndProject — no
    self-joins, no path explosion beyond one row per event."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(10)
    )


@query(
    "q186_time_to_conversion",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(ts) AS first_seen,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS first_buy
      FROM events GROUP BY 1
    ),
    h AS (
      SELECT user_id,
             CAST(FLOOR(date_diff('second', first_seen, first_buy) / 86400.0)
               AS BIGINT) AS days_to_convert
      FROM f WHERE first_buy IS NOT NULL AND first_buy > first_seen
    )
    SELECT LEAST(days_to_convert, 30) AS days_bucket,
           COUNT(*) AS n_users
    FROM h GROUP BY 1
    """,
)
def q186_time_to_conversion(spark, sf_dir):
    """Time-to-conversion distribution: days from a user's first event
    to their first purchase, bucketed (30+ capped) — the activation
    funnel's denominator chart. One grouped pass computes both firsts
    (conditional MIN rides the same shuffle), then a tiny histogram."""
    e = t(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_buy"
        ),
    )
    h = f.filter(
        F.col("first_buy").isNotNull() & (F.col("first_buy") > F.col("first_seen"))
    ).select(
        F.floor(
            (
                F.unix_micros(F.col("first_buy").cast("timestamp"))
                - F.unix_micros(F.col("first_seen").cast("timestamp"))
            )
            / 1_000_000.0
            / 86400.0
        )
        .cast("bigint")
        .alias("days_to_convert")
    )
    return h.groupBy(
        F.least(F.col("days_to_convert"), F.lit(30)).alias("days_bucket")
    ).agg(F.count("*").alias("n_users"))


@query(
    "q187_last_touch_attribution",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS channel
      FROM events
    )
    SELECT COALESCE(channel, '(direct)') AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM s WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q187_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent PRECEDING non-purchase event type (no prior event →
    '(direct)'). One user-keyed window with an ignore-nulls last_value
    over the preceding frame — the standard marketing-attribution
    shape, no self-join, no per-purchase scan-back."""
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    s = e.withColumn("channel", channel)
    return (
        s.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("(direct)")).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(dec("value")).cast("double").alias("revenue"),
        )
    )


@query(
    "q188_funnel_report",
    oracle="""
    WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
         t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
                JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'view' AND e.ts > t1.ts1 GROUP BY e.user_id),
         t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
                JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id),
         depth AS (
           SELECT u.user_id,
                  CASE WHEN t3.user_id IS NOT NULL THEN 3
                       WHEN t2.user_id IS NOT NULL THEN 2
                       WHEN t1.user_id IS NOT NULL THEN 1
                       ELSE 0 END AS d
           FROM (SELECT DISTINCT user_id FROM events
                 WHERE event_type IN ('signup','view','purchase')) u
           LEFT JOIN t1 ON u.user_id = t1.user_id
           LEFT JOIN t2 ON u.user_id = t2.user_id
           LEFT JOIN t3 ON u.user_id = t3.user_id
         ),
         steps AS (SELECT unnest([1, 2, 3]) AS step)
    SELECT step,
           CAST((SELECT COUNT(*) FROM depth WHERE d >= step) AS BIGINT)
             AS n_reached,
           ROUND((SELECT COUNT(*) FROM depth WHERE d >= step) * 1.0
                 / NULLIF((SELECT COUNT(*) FROM depth WHERE d >= step - 1), 0),
                 6) AS conv_from_prev
    FROM steps
    """,
)
def q188_funnel_report(spark, sf_dir):
    """The funnel REPORT on top of q32's per-user depths: users
    reaching each step and the step-over-step conversion rate — the
    chart a growth team actually reads. The depth computation is the
    one shuffle (q32's HOF fold); the report is a 3-row rollup of its
    distribution (cumulative-from-the-top counts via a reversed
    running sum — no per-step re-scan of events)."""
    e = t(spark, sf_dir, "events")
    d = funnel(e, "user_id", "ts", "event_type", ["signup", "view", "purchase"])
    dist = d.groupBy("funnel_steps").agg(F.count("*").alias("c"))
    # a literal 3-row step spine LEFT-joined to the depth distribution:
    # every step row survives even when nobody reached it (a filtered
    # groupBy would silently drop empty steps)
    steps = spark.createDataFrame([(1,), (2,), (3,)], "step int")
    reached = (
        steps.join(
            # bounded: dist has one row per funnel depth (<= 4 rows)
            F.broadcast(dist), dist["funnel_steps"] >= steps["step"], "left"
        )
        .groupBy("step")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_reached"))
    )
    wprev = W.orderBy("step")  # bounded window: one row per funnel step
    prev = F.lag("n_reached").over(wprev)
    # lazy 1-row total (= sum over the depth distribution) instead of an
    # eager d.count() job that re-ran the whole funnel shuffle; both
    # branches share dist's aggregate subtree, so ReuseExchange computes
    # the funnel once inside the single job (r11)
    tot = dist.agg(F.sum("c").alias("__total"))
    # bounded: tot is a 1-row aggregate (total funnel users)
    return reached.crossJoin(F.broadcast(tot)).select(
        "step",
        F.col("n_reached").cast("bigint").alias("n_reached"),
        F.round(
            F.col("n_reached") * 1.0
            / F.nullif(F.coalesce(prev, F.col("__total")), F.lit(0)),
            6,
        ).alias("conv_from_prev"),
    )


@query(
    "q253_approx_ntile",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS n_buckets,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           true AS balanced_ok
    FROM customer
    """,
)
def q253_approx_ntile(spark, sf_dir):
    """The scale-safe global-rank alternative q30's docstring names
    (VERDICT r8 #5 / r9 #3), now executable: operators/windows.py
    approx_ntile buckets customers into account-balance quartiles from
    ONE approx_percentile tree-aggregate + a codegen projection — no
    unpartitioned WindowExec anywhere in the plan (pinned in
    test_scale_plans.py). Tolerance-banded oracle in the q103/q245
    style: the exact arm cross-checks bucket count and total rows; the
    band boolean holds iff every quartile is within max(2% of rows, 8
    rows) of equal — approx_percentile at accuracy 10000 places each
    boundary within rows/10000 ranks, so the band has wide margin on
    all three test scales and trips only if the bucketing breaks."""
    from ed_clickhouse_spark.operators.windows import approx_ntile

    c = t(spark, sf_dir, "customer").select(
        F.col("c_acctbal").cast("double").alias("bal")
    )
    g = approx_ntile(c, "bal", 4, descending=True).groupBy("ntile").agg(
        F.count("*").alias("c")
    )
    return g.agg(
        F.countDistinct("ntile").alias("nbd"),
        F.sum("c").alias("n"),
        F.max("c").alias("mx"),
        F.min("c").alias("mn"),
    ).select(
        F.col("nbd").cast("bigint").alias("n_buckets"),
        F.col("n").cast("bigint").alias("n_rows"),
        (
            (F.col("nbd") == 4)
            & (
                (F.col("mx") - F.col("mn"))
                <= F.greatest(F.col("n") * 0.02, F.lit(8.0))
            )
        ).alias("balanced_ok"),
    )
