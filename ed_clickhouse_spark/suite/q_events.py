"""ClickHouse event-analytics parity queries (SURVEY.md §2 B5): the
aggregate-function idioms ClickHouse ships as ``retention``,
``sequenceMatch`` and ``windowFunnel`` (the query surface the reference's
event tables are designed for), re-expressed as Spark compositions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ed_clickhouse_spark.operators.windows import (
    funnel,
    retention,
    sequence_match,
    sequence_match_times,
)
from ed_clickhouse_spark.suite import query
from ed_clickhouse_spark.suite._util import t


@query(
    "q93_retention",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    u AS (
      SELECT user_id, MIN(d) AS cohort_date, list(d) AS days
      FROM daily GROUP BY 1
    )
    SELECT cohort_date, COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN list_contains(days, cohort_date + 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS r1,
           CAST(SUM(CASE WHEN list_contains(days, cohort_date + 3)
                         THEN 1 ELSE 0 END) AS BIGINT) AS r3,
           CAST(SUM(CASE WHEN list_contains(days, cohort_date + 7)
                         THEN 1 ELSE 0 END) AS BIGINT) AS r7
    FROM u GROUP BY 1
    """,
)
def q93_retention(spark, sf_dir):
    """ClickHouse ``retention()``-style cohort table: users grouped by
    first-active date, with day+1/+3/+7 comeback counts. Dedup to
    (user, day) first — the shuffle carries at most calendar-many rows
    per user no matter how hot the user's event stream is."""
    d = t(spark, sf_dir, "events")
    r = retention(d, "user_id", "ts", offsets=(1, 3, 7))
    return r.groupBy("cohort_date").agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("d1").cast("bigint")).alias("r1"),
        F.sum(F.col("d3").cast("bigint")).alias("r3"),
        F.sum(F.col("d7").cast("bigint")).alias("r7"),
    )


@query(
    "q94_sequence_match",
    oracle="""
    WITH su AS (
      SELECT user_id FROM events
      WHERE event_type IN ('signup', 'click', 'purchase') GROUP BY 1
    ),
    t1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e
      JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e
      JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT su.user_id, (t3.user_id IS NOT NULL) AS matched
    FROM su LEFT JOIN t3 ON su.user_id = t3.user_id
    """,
)
def q94_sequence_match(spark, sf_dir):
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')`` — per user, did
    signup -> click -> purchase occur as an ordered subsequence (greedy-
    earliest chain, complete for existence). One shuffle on user_id; the
    chain folds JVM-side over each user's sorted event array."""
    d = t(spark, sf_dir, "events")
    return sequence_match(
        d, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
    )


@query(
    "q95_window_funnel",
    oracle="""
    WITH su AS (
      SELECT user_id FROM events
      WHERE event_type IN ('signup', 'click', 'purchase') GROUP BY 1
    ),
    t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN t1 ON e.user_id = t1.user_id
             AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 1 DAY
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN t2 ON e.user_id = t2.user_id
      JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > t2.t2 AND e.ts <= t1.t1 + INTERVAL 1 DAY
      GROUP BY e.user_id
    )
    SELECT CASE WHEN t3.user_id IS NOT NULL THEN 3
                WHEN t2.user_id IS NOT NULL THEN 2
                WHEN t1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_steps,
           COUNT(*) AS n_users
    FROM su
    LEFT JOIN t1 ON su.user_id = t1.user_id
    LEFT JOIN t2 ON su.user_id = t2.user_id
    LEFT JOIN t3 ON su.user_id = t3.user_id
    GROUP BY 1
    """,
)
def q95_window_funnel(spark, sf_dir):
    """``windowFunnel(86400)``-style: funnel depth per user where every
    later step must land within 1 day of the step-1 match, under
    funnel()'s greedy-earliest anchor (the SQL-tractable MIN-chain
    semantics). q220_funnel_exact_depth computes the SAME funnel under
    ClickHouse's exact re-anchoring DP — the pair quantifies the
    documented deviation on real data. Output: histogram of depth."""
    d = t(spark, sf_dir, "events")
    f = funnel(
        d, "user_id", "ts", "event_type",
        ["signup", "click", "purchase"], window_seconds=86400,
    )
    return f.groupBy("funnel_steps").agg(F.count("*").alias("n_users"))


@query(
    "q178_sliding_dau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    contrib AS (
      SELECT user_id,
             CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS w
      FROM ud
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS w FROM events)
    SELECT contrib.w AS d, COUNT(DISTINCT user_id) AS wau7
    FROM contrib JOIN days ON days.w = contrib.w
    GROUP BY 1
    """,
)
def q178_sliding_dau(spark, sf_dir):
    """7-day rolling distinct users per observed day (the W7 engagement
    metric) — EXACT, via the contribute-forward trick: each (user, day)
    pair is exploded to the <=7 window days it counts toward, then one
    countDistinct per day. Dedup to (user, day) FIRST shrinks the
    explode to calendar-bounded size; no per-day self-join, no window
    over raw events. (The approximate path at extreme scale is
    mergeable HLL states per day, q103.)"""
    e = t(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add("d", 6))
        ).alias("w"),
    )
    days = e.select(F.col("ts").cast("date").alias("w")).distinct()
    return (
        contrib.join(days, "w")
        .groupBy(F.col("w").alias("d"))
        .agg(F.countDistinct("user_id").alias("wau7"))
    )


@query(
    "q183_cohort_retention_matrix",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(w) AS c FROM uw GROUP BY 1
    ),
    sizes AS (
      SELECT c, COUNT(*) AS n0 FROM cohort GROUP BY 1
    ),
    cells AS (
      SELECT cohort.c, CAST(date_diff('week', cohort.c, uw.w) AS BIGINT) AS k,
             COUNT(DISTINCT uw.user_id) AS n
      FROM uw JOIN cohort USING (user_id)
      GROUP BY 1, 2
    )
    SELECT cells.c AS cohort_week, cells.k, cells.n,
           ROUND(cells.n * 1.0 / sizes.n0, 6) AS retention
    FROM cells JOIN sizes ON sizes.c = cells.c
    WHERE cells.k <= 8
    """,
)
def q183_cohort_retention_matrix(spark, sf_dir):
    """The cohort retention matrix (signup week × weeks-since →
    fraction of the cohort still active) — the canonical product-
    analytics heavy query the event tables exist for. Dedup to (user,
    week) FIRST (calendar-bounded), then one user-keyed join to the
    cohort map and two small aggregates; no per-week self-joins, no
    k-pass scans."""
    e = t(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("w").alias("c"))
    sizes = cohort.groupBy("c").agg(F.count("*").alias("n0"))
    cells = (
        uw.join(cohort, "user_id")
        .select("user_id", "c", (F.datediff("w", "c") / 7).cast("bigint").alias("k"))
        .groupBy("c", "k")
        .agg(F.countDistinct("user_id").alias("n"))
    )
    return (
        # bounded: sizes has one row per cohort week (timeline-sized)
        cells.join(F.broadcast(sizes), "c")
        .filter(F.col("k") <= 8)
        .select(
            F.col("c").alias("cohort_week"),
            "k",
            "n",
            F.round(F.col("n") * 1.0 / F.col("n0"), 6).alias("retention"),
        )
    )


@query(
    "q189_cohort_arpu",
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(date_trunc('month', MIN(ts)) AS DATE) AS c
      FROM events GROUP BY 1
    ),
    rev AS (
      SELECT user_id, SUM(CAST(value AS DECIMAL(18,2))) AS r
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT cohort.c AS cohort_month,
           COUNT(*) AS n_users,
           CAST(COALESCE(SUM(rev.r), 0) AS DOUBLE) AS revenue,
           ROUND(CAST(COALESCE(SUM(rev.r), 0) AS DOUBLE) / COUNT(*), 6) AS arpu
    FROM cohort LEFT JOIN rev USING (user_id)
    GROUP BY 1
    """,
)
def q189_cohort_arpu(spark, sf_dir):
    """ARPU by signup cohort month: total purchase revenue over ALL
    cohort members (non-payers dilute — that is the point of ARPU vs
    ARPPU). Two user-keyed aggregates joined on the same key — AQE
    reuses the exchange; exact decimal revenue."""
    e = t(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).cast("date").alias("c")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("r"))
    )
    j = cohort.join(rev, "user_id", "left")
    return j.groupBy(F.col("c").alias("cohort_month")).agg(
        F.count("*").alias("n_users"),
        F.coalesce(F.sum("r"), F.lit(0)).cast("double").alias("revenue"),
        F.round(
            F.coalesce(F.sum("r"), F.lit(0)).cast("double") / F.count("*"), 6
        ).alias("arpu"),
    )


@query(
    "q194_sequence_match_times",
    oracle="""
    WITH su AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('signup', 'click', 'purchase')
    )
    SELECT matched, COUNT(*) AS n_users FROM (
      SELECT user_id,
             EXISTS (
               SELECT 1 FROM events a
               WHERE a.user_id = su.user_id AND a.event_type = 'signup'
                 AND EXISTS (
                   SELECT 1 FROM events b
                   WHERE b.user_id = su.user_id AND b.event_type = 'click'
                     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
                     AND EXISTS (
                       SELECT 1 FROM events c
                       WHERE c.user_id = su.user_id
                         AND c.event_type = 'purchase'
                         AND c.ts > b.ts AND c.ts <= b.ts + INTERVAL 1 DAY
                     )
                 )
             ) AS matched
      FROM su
    ) GROUP BY matched
    """,
)
def q194_sequence_match_times(spark, sf_dir):
    """``sequenceMatch('(?1)(?t<=3600)(?2)(?t<=86400)(?3)')``: users with
    a signup -> click-within-an-hour -> purchase-within-a-day chain.
    EXACT re-anchoring semantics (operators/windows.py:
    sequence_match_times — nested JVM exists folds, one user shuffle);
    the oracle spells the same existential chain as correlated EXISTS."""
    d = t(spark, sf_dir, "events")
    m = sequence_match_times(
        d, "user_id", "ts", "event_type",
        ["signup", "click", "purchase"],
        [("<=", 3600), ("<=", 86400)],
    )
    return m.groupBy("matched").agg(F.count("*").alias("n_users"))


@query(
    "q195_funnel_strict_dedup",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    c2 AS (
      SELECT e.user_id, MIN(e.ts) AS c2 FROM events e
      JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    d2 AS (
      SELECT e.user_id, MIN(e.ts) AS d2 FROM events e
      JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'signup' GROUP BY 1
    ),
    t2 AS (
      SELECT c2.user_id, c2.c2 AS t2 FROM c2
      LEFT JOIN d2 ON c2.user_id = d2.user_id
      WHERE d2.d2 IS NULL OR d2.d2 >= c2.c2
    ),
    c3 AS (
      SELECT e.user_id, MIN(e.ts) AS c3 FROM events e
      JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
      WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    d3 AS (
      SELECT e.user_id, MIN(e.ts) AS d3 FROM events e
      JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
      WHERE e.event_type IN ('signup', 'click') GROUP BY 1
    ),
    t3 AS (
      SELECT c3.user_id FROM c3
      LEFT JOIN d3 ON c3.user_id = d3.user_id
      WHERE d3.d3 IS NULL OR d3.d3 >= c3.c3
    ),
    su AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('signup', 'click', 'purchase')
    )
    SELECT CASE WHEN t3.user_id IS NOT NULL THEN 3
                WHEN t2.user_id IS NOT NULL THEN 2
                WHEN t1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_steps,
           COUNT(*) AS n_users
    FROM su
    LEFT JOIN t1 ON su.user_id = t1.user_id
    LEFT JOIN t2 ON su.user_id = t2.user_id
    LEFT JOIN t3 ON su.user_id = t3.user_id
    GROUP BY 1
    """,
)
def q195_funnel_strict_dedup(spark, sf_dir):
    """``windowFunnel(...., 'strict_deduplication')``: a repeat of an
    already-matched step condition interrupts the chain — a second
    signup before the click stops the funnel at 1, a signup/click
    repeat before the purchase stops it at 2. Same greedy-earliest
    anchor and one user shuffle as the base funnel; the oracle spells
    the candidate-vs-earliest-repeat race as a CTE chain."""
    d = t(spark, sf_dir, "events")
    f = funnel(
        d, "user_id", "ts", "event_type",
        ["signup", "click", "purchase"], strict_dedup=True,
    )
    return f.groupBy("funnel_steps").agg(F.count("*").alias("n_users"))


_CH_EVENT_SQL = """
WITH per_user AS (
  SELECT user_id,
         windowFunnel(86400)(ts, event_type = 'signup',
                             event_type = 'click',
                             event_type = 'purchase') AS depth,
         sequenceMatch('(?1).*(?2)')(ts, event_type = 'signup',
                                     event_type = 'purchase') AS m
  FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY user_id
)
SELECT depth, count() AS n_users, countIf(m) AS n_matched
FROM per_user GROUP BY depth ORDER BY depth
"""


@query(
    "q206_ch_event_analytics",
    oracle="""
    WITH su AS (
      SELECT user_id FROM events
      WHERE event_type IN ('signup', 'click', 'purchase') GROUP BY 1
    ),
    t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    m2 AS (
      SELECT e.user_id FROM events e
      JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    pu AS (
      SELECT su.user_id,
             CASE
               WHEN EXISTS (
                 SELECT 1 FROM events a
                 JOIN events b ON b.user_id = a.user_id
                 JOIN events c ON c.user_id = a.user_id
                 WHERE a.user_id = su.user_id
                   AND a.event_type = 'signup' AND b.event_type = 'click'
                   AND c.event_type = 'purchase'
                   AND b.ts >= a.ts AND c.ts >= b.ts
                   AND c.ts <= a.ts + INTERVAL 1 DAY
               ) THEN 3
               WHEN EXISTS (
                 SELECT 1 FROM events a
                 JOIN events b ON b.user_id = a.user_id
                 WHERE a.user_id = su.user_id
                   AND a.event_type = 'signup' AND b.event_type = 'click'
                   AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 DAY
               ) THEN 2
               WHEN t1.user_id IS NOT NULL THEN 1
               ELSE 0
             END AS depth,
             (m2.user_id IS NOT NULL) AS m
      FROM su
      LEFT JOIN t1 ON su.user_id = t1.user_id
      LEFT JOIN m2 ON su.user_id = m2.user_id
    )
    SELECT depth, COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
    FROM pu GROUP BY 1 ORDER BY 1
    """,
)
def q206_ch_event_analytics(spark, sf_dir):
    """The ClickHouse event-analytics aggregates a reference user pastes
    in VERBATIM — ``windowFunnel(86400)(ts, ...)`` and
    ``sequenceMatch('(?1).*(?2)')(ts, ...)`` — through the dialect
    front-end (chsql._rewrite_funnel_aggs): each becomes ONE
    ``aggregate()`` fold over the user's time-sorted event array (pure
    JVM, one shuffle on user_id, linear per group), then a depth
    histogram with sequence-match counts. Bare windowFunnel runs
    ClickHouse's EXACT re-anchoring DP since r6 (the funnel_exact
    engine); the oracle is the literal nested-EXISTS existence
    formula."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_CH_EVENT_SQL).sql)


_CH_SEQ_TIMES_SQL = """
SELECT matched, count() AS n_users
FROM (
  SELECT user_id,
         sequenceMatch('(?1)(?t<=3600)(?2)(?t<=86400)(?3)')(
           ts, event_type = 'signup', event_type = 'click',
           event_type = 'purchase') AS matched
  FROM events
  WHERE event_type IN ('signup', 'click', 'purchase')
  GROUP BY user_id
) GROUP BY matched
"""


@query(
    "q208_sql_sequence_times",
    oracle="""
    WITH su AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('signup', 'click', 'purchase')
    )
    SELECT matched, COUNT(*) AS n_users FROM (
      SELECT user_id,
             EXISTS (
               SELECT 1 FROM events a
               WHERE a.user_id = su.user_id AND a.event_type = 'signup'
                 AND EXISTS (
                   SELECT 1 FROM events b
                   WHERE b.user_id = su.user_id AND b.event_type = 'click'
                     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
                     AND EXISTS (
                       SELECT 1 FROM events c
                       WHERE c.user_id = su.user_id
                         AND c.event_type = 'purchase'
                         AND c.ts > b.ts AND c.ts <= b.ts + INTERVAL 1 DAY
                     )
                 )
             ) AS matched
      FROM su
    ) GROUP BY matched
    """,
)
def q208_sql_sequence_times(spark, sf_dir):
    """q194's time-bounded sequence chain, but spelled VERBATIM in the
    ClickHouse dialect — ``sequenceMatch('(?1)(?t<=3600)(?2)
    (?t<=86400)(?3)')`` — through chsql's nested-exists translation
    (exact re-anchoring semantics, the SQL spelling of
    operators/windows.py:sequence_match_times).  One shuffle on
    user_id; the k-level exists search runs over each user's collected
    step events JVM-side."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_CH_SEQ_TIMES_SQL).sql)


_CH_SEQ_COUNT_SQL = """
SELECT c_pairs, c_trips, count() AS n_users
FROM (
  SELECT user_id,
         sequenceCount('(?1)(?2)')(
           ts, event_type = 'click', event_type = 'purchase',
           event_type = 'view') AS c_pairs,
         sequenceCount('(?1)(?2)(?3)')(
           ts, event_type = 'click', event_type = 'purchase',
           event_type = 'view') AS c_trips
  FROM events
  WHERE event_type IN ('click', 'purchase', 'view')
  GROUP BY user_id
) GROUP BY c_pairs, c_trips ORDER BY c_pairs, c_trips
"""


@query(
    "q217_sequence_count_adjacent",
    oracle="""
    WITH f AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS p1,
             LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts) AS p2
      FROM events WHERE event_type IN ('click', 'purchase', 'view')
    ),
    pu AS (
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                     AND p1 = 'click' THEN 1 END), 0)
                  AS INTEGER) AS c_pairs,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                                     AND p1 = 'purchase'
                                     AND p2 = 'click' THEN 1 END), 0)
                  AS INTEGER) AS c_trips
      FROM f GROUP BY user_id
    )
    SELECT c_pairs, c_trips, COUNT(*) AS n_users
    FROM pu GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q217_sequence_count_adjacent(spark, sf_dir):
    """ClickHouse ADJACENCY counting spelled VERBATIM in the dialect:
    ``sequenceCount('(?1)(?2)')`` / ``'(?1)(?2)(?3)'`` — the matched
    events must be CONSECUTIVE among events matching ANY listed
    condition (the unreferenced 'view' condition in c_pairs breaks
    adjacency without ever matching a ref). Translated to the NFA
    subset-simulation fold over each user's time-sorted event array
    (chsql.py sequenceCount rewrite): pure JVM, one shuffle on user_id,
    linear per group. The oracle is exact because click/purchase/view
    are disjoint, so adjacent candidate chains can never overlap and
    the greedy non-overlapping count equals the plain LAG pair/triple
    count."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_CH_SEQ_COUNT_SQL).sql)


_CH_STAR_APPLY_SQL = """
SELECT event_type,
       * EXCEPT (event_type, ts, props) APPLY (max),
       COLUMNS('^value$') APPLY (min)
FROM events GROUP BY event_type ORDER BY event_type
"""


@query(
    "q218_star_apply_monitoring",
    oracle="""
    SELECT event_type,
           MAX(event_id) AS "max(event_id)",
           MAX(user_id)  AS "max(user_id)",
           MAX(value)    AS "max(value)",
           MIN(value)    AS "min(value)"
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q218_star_apply_monitoring(spark, sf_dir):
    """The monitoring-style star-modifier query a ClickHouse operator
    pastes in VERBATIM: ``* EXCEPT (...) APPLY (max)`` and
    ``COLUMNS('re') APPLY (min)`` expand against the registered table
    schema (chsql._expand_apply_columns, r6) with ClickHouse's literal
    output names (`max(value)`), then run as one codegen aggregate —
    single shuffle on the group key, no Python. Unknown tables and
    join-ambiguous FROMs keep the pre-r6 loud refusal."""
    from ed_clickhouse_spark.chsql import translate

    ev = t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    return spark.sql(
        translate(_CH_STAR_APPLY_SQL, {"events": ev.columns}).sql
    )


_CH_SEQ_COUNT_DEADLINE_SQL = """
SELECT conversions, count() AS n_users
FROM (
  SELECT user_id,
         sequenceCount('(?1)(?t<=3600)(?2)')(
           ts, event_type = 'click', event_type = 'purchase') AS conversions
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id
) GROUP BY conversions ORDER BY conversions
"""


@query(
    "q219_sequence_count_deadline",
    oracle="""
    WITH RECURSIVE f AS (
      SELECT user_id, ts,
             event_type = 'click' AS is_a,
             event_type = 'purchase' AS is_b,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    walk AS (
      SELECT user_id, 0 AS rn, CAST(NULL AS TIMESTAMP) AS last_a, 0 AS cnt
      FROM (SELECT DISTINCT user_id FROM f)
      UNION ALL
      SELECT f.user_id, f.rn,
             CASE WHEN f.is_b AND w.last_a IS NOT NULL
                       AND f.ts > w.last_a
                       AND f.ts <= w.last_a + INTERVAL 1 HOUR THEN NULL
                  WHEN f.is_a THEN f.ts
                  ELSE w.last_a END,
             w.cnt + CASE WHEN f.is_b AND w.last_a IS NOT NULL
                       AND f.ts > w.last_a
                       AND f.ts <= w.last_a + INTERVAL 1 HOUR
                      THEN 1 ELSE 0 END
      FROM walk w JOIN f ON f.user_id = w.user_id AND f.rn = w.rn + 1
    ),
    final AS (
      SELECT w.user_id, CAST(w.cnt AS INTEGER) AS conversions
      FROM walk w
      JOIN (SELECT user_id, MAX(rn) AS mx FROM f GROUP BY 1) m
        ON w.user_id = m.user_id AND w.rn = m.mx
    )
    SELECT conversions, COUNT(*) AS n_users
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def q219_sequence_count_deadline(spark, sf_dir):
    """Time-bounded conversion counting spelled VERBATIM in the dialect:
    ``sequenceCount('(?1)(?t<=3600)(?2)')`` — click-to-purchase chains
    completing within an hour, greedy non-overlapping with exact
    re-anchoring (A@0 A@100 B@105 under t<=10 counts via the second A).
    Translated to the timed multi-slot NFA fold (chsql.py): live
    previous-ref times per pattern depth (dominance-compressed per
    edge op) folded over each user's time-sorted event array —
    pure JVM, one shuffle on user_id, linear per group, validated
    against a backtracking reference on 190k exhaustive+random cases.
    The DuckDB oracle walks the same greedy state machine with a
    recursive CTE (latest unconsumed click; consume on fire)."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_CH_SEQ_COUNT_DEADLINE_SQL).sql)


@query(
    "q220_funnel_exact_depth",
    oracle="""
    WITH su AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('signup', 'click', 'purchase')
    ),
    d AS (
      SELECT user_id,
        CASE
          WHEN EXISTS (
            SELECT 1 FROM events a
            JOIN events b ON b.user_id = a.user_id
            JOIN events c ON c.user_id = a.user_id
            WHERE a.user_id = su.user_id
              AND a.event_type = 'signup' AND b.event_type = 'click'
              AND c.event_type = 'purchase'
              AND b.ts >= a.ts AND c.ts >= b.ts
              AND c.ts <= a.ts + INTERVAL 1 DAY
          ) THEN 3
          WHEN EXISTS (
            SELECT 1 FROM events a
            JOIN events b ON b.user_id = a.user_id
            WHERE a.user_id = su.user_id
              AND a.event_type = 'signup' AND b.event_type = 'click'
              AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 DAY
          ) THEN 2
          WHEN EXISTS (
            SELECT 1 FROM events a
            WHERE a.user_id = su.user_id AND a.event_type = 'signup'
          ) THEN 1
          ELSE 0
        END AS funnel_steps
      FROM su
    )
    SELECT funnel_steps, COUNT(*) AS n_users
    FROM d GROUP BY 1 ORDER BY 1
    """,
)
def q220_funnel_exact_depth(spark, sf_dir):
    """windowFunnel with ClickHouse's EXACT re-anchoring semantics
    (operators/windows.py:funnel_exact — latest-anchor DP, the
    algorithm ClickHouse itself runs): per-user max funnel depth for
    signup -> click -> purchase within a day, where the chain may
    anchor at ANY signup. The sibling q95/q32 keep funnel()'s greedy
    first-anchor semantics (documented deviation, SQL-oracle-able with
    MIN-chains); here the oracle is the literal existence formula —
    depth >= k iff an increasing event chain matching steps 1..k fits
    in the window — spelled as nested EXISTS joins."""
    from ed_clickhouse_spark.operators.windows import funnel_exact

    e = t(spark, sf_dir, "events")
    depths = funnel_exact(
        e, "user_id", "ts", "event_type",
        ["signup", "click", "purchase"], 86400,
    )
    return (
        depths.groupBy("funnel_steps")
        .agg(F.count("*").alias("n_users"))
        .orderBy("funnel_steps")
    )


def _duckdb_funnel_ch_oracle(conds, window, modes, source):
    """DuckDB transliteration of ClickHouse's windowFunnel event loop —
    the oracle twin of operators/windows.py:funnel_ch_fold_sql, written
    independently as a RECURSIVE CTE over scalar state columns
    (r, fe, f1..fK, l1..lK — early-return value, first-event flag,
    per-level chain anchors, per-level last event times), one recursion
    step per (event, matched condition) entry. Entries carry nc = -cond
    so the (t, nc) ordering reproduces the pinned (t asc, cond DESC)
    tie order of the Spark side; condition expansion per event mirrors
    ClickHouse's descending-condition insertion. Validated against the
    same pure-Python model as the Spark fold on a ~24k-case exhaustive
    grid before being adopted as an oracle
    (tests/test_property.py:_ch_window_funnel_model).

    (A first formulation on DuckDB 1.0's list_reduce was semantically
    identical but exploded exponentially in list length once a vector
    held rows taking divergent lambda branches — 3 users x 40 events
    never finished. The recursive CTE is linear: step rows = total
    entries.)"""
    so = "strict_order" in modes
    sd = "strict_dedup" in modes
    si = "strict_increase" in modes
    K = len(conds)
    sels = [
        f"SELECT user_id AS u, epoch(ts) AS t, {-k} AS nc"
        f" FROM {source} AS __src WHERE ({conds[k - 1]})"
        for k in range(K, 0, -1)
    ]
    if so:
        anycond = " OR ".join(f"({c})" for c in conds)
        sels.append(
            f"SELECT user_id AS u, epoch(ts) AS t, 0 AS nc"
            f" FROM {source} AS __src"
            f" WHERE NOT coalesce({anycond}, false)"
        )
    entries_sql = " UNION ALL ".join(sels)
    cols = ["r", "fe"] + [f"f{k}" for k in range(1, K + 1)] + [
        f"l{k}" for k in range(1, K + 1)
    ]

    def prefix(q):
        cases = " ".join(
            f"WHEN {q}.f{k} IS NULL THEN {k - 1}.0" for k in range(1, K + 1)
        )
        return f"(CASE {cases} ELSE {K}.0 END)"

    # ordered transition branches: (condition, {col: new value}); a
    # branch that fires but does not name a column keeps it — so every
    # branch appears in every column's CASE with the keep as default
    branches = [("st.r IS NOT NULL", {})]
    if so:
        branches.append(("ev.nc = 0 AND st.fe = 1", {"r": prefix("st")}))
    branches.append(
        ("ev.nc = -1", {"f1": "ev.t", "l1": "ev.t", "fe": "1.0"})
    )
    for k in range(2, K + 1):
        if sd:
            branches.append(
                (f"ev.nc = {-k} AND st.f{k} IS NOT NULL", {"r": f"{k}.0"})
            )
        if so:
            branches.append(
                (
                    f"ev.nc = {-k} AND st.fe = 1 AND st.f{k - 1} IS NULL",
                    {"r": prefix("st")},
                )
            )
        adv = (
            f"ev.nc = {-k} AND st.f{k - 1} IS NOT NULL"
            f" AND ev.t <= st.f{k - 1} + ({window})"
        )
        if si:
            adv += f" AND st.l{k - 1} < ev.t"
        upd = {f"f{k}": f"st.f{k - 1}", f"l{k}": "ev.t"}
        if k == K:
            upd["r"] = f"{K}.0"
        branches.append((adv, upd))

    def colexpr(col):
        whens = " ".join(
            f"WHEN {cond} THEN {upd.get(col, 'st.' + col)}"
            for cond, upd in branches
        )
        return f"CASE {whens} ELSE st.{col} END AS {col}"

    init_cols = ", ".join(
        {"r": "CAST(NULL AS DOUBLE) AS r", "fe": "0.0 AS fe"}.get(
            c, f"CAST(NULL AS DOUBLE) AS {c}"
        )
        for c in cols
    )
    step_cols = ", ".join(colexpr(c) for c in cols)
    return f"""WITH RECURSIVE
    __wf_raw AS (
      {entries_sql}
    ),
    __wf_ev AS (
      SELECT u, t, nc,
             row_number() OVER (PARTITION BY u ORDER BY t, nc) AS i
      FROM __wf_raw
    ),
    __wf_n AS (SELECT u, COUNT(*) AS cnt FROM __wf_ev GROUP BY u),
    __wf_step AS (
      SELECT u, 0 AS i, {init_cols} FROM __wf_n
      UNION ALL
      SELECT st.u, st.i + 1, {step_cols}
      FROM __wf_step st JOIN __wf_ev ev ON ev.u = st.u AND ev.i = st.i + 1
    ),
    depths AS (
      SELECT st.u,
             CAST(coalesce(st.r, {prefix("st")}) AS INT) AS funnel_steps
      FROM __wf_step st JOIN __wf_n n ON n.u = st.u AND st.i = n.cnt
    )
    SELECT funnel_steps, COUNT(*) AS n_users
    FROM depths GROUP BY 1 ORDER BY 1
    """


_FUNNEL_CONDS = [
    "event_type = 'signup'",
    "event_type = 'click'",
    "event_type = 'purchase'",
]
_FUNNEL_STEP_SRC = (
    "(SELECT * FROM events"
    " WHERE event_type IN ('signup', 'click', 'purchase'))"
)


def _funnel_mode_depths(spark, sf_dir, mode):
    """Spark side of q221-q223: funnel_ch depth histogram under one
    ClickHouse mode string (signup -> click -> purchase, 1-day window).
    strict_order keeps every event (non-matching events interrupt, so
    funnel_ch reads the unfiltered table in that mode); the other modes
    pre-filter to step events before the shuffle."""
    from ed_clickhouse_spark.operators.windows import funnel_ch

    e = t(spark, sf_dir, "events")
    depths = funnel_ch(
        e, "user_id", "ts", "event_type",
        ["signup", "click", "purchase"], 86400, {mode},
    )
    return (
        depths.groupBy("funnel_steps")
        .agg(F.count("*").alias("n_users"))
        .orderBy("funnel_steps")
    )


@query(
    "q221_funnel_strict_order",
    oracle=_duckdb_funnel_ch_oracle(
        _FUNNEL_CONDS, 86400, {"strict_order"}, "events"
    ),
)
def q221_funnel_strict_order(spark, sf_dir):
    """windowFunnel(86400, 'strict_order') with ClickHouse's exact
    event-loop semantics (operators/windows.py:funnel_ch): an event
    matching no step after the chain starts, or an out-of-order step,
    ends the scan."""
    return _funnel_mode_depths(spark, sf_dir, "strict_order")


@query(
    "q222_funnel_strict_dedup",
    oracle=_duckdb_funnel_ch_oracle(
        _FUNNEL_CONDS, 86400, {"strict_dedup"}, _FUNNEL_STEP_SRC
    ),
)
def q222_funnel_strict_dedup(spark, sf_dir):
    """windowFunnel(86400, 'strict_deduplication') with ClickHouse's
    exact semantics: a repeat of an already-matched condition (levels
    2+; level-1 repeats refresh the anchor) ends the scan at that
    level."""
    return _funnel_mode_depths(spark, sf_dir, "strict_deduplication")


@query(
    "q223_funnel_strict_increase",
    oracle=_duckdb_funnel_ch_oracle(
        _FUNNEL_CONDS, 86400, {"strict_increase"}, _FUNNEL_STEP_SRC
    ),
)
def q223_funnel_strict_increase(spark, sf_dir):
    """windowFunnel(86400, 'strict_increase') with ClickHouse's exact
    semantics: each step's timestamp must be strictly after the
    previous level's LAST matched event time."""
    return _funnel_mode_depths(spark, sf_dir, "strict_increase")


_CH_SEQ_COUNT_EXACT_GAP_SQL = """
SELECT conversions, count() AS n_users
FROM (
  SELECT user_id,
         sequenceCount('(?1)(?t==3600)(?2)')(
           toStartOfHour(ts), event_type = 'click',
           event_type = 'purchase') AS conversions
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id
) GROUP BY conversions ORDER BY conversions
"""


@query(
    "q224_sequence_count_exact_gap",
    oracle="""
    WITH RECURSIVE f AS (
      SELECT user_id,
             epoch(date_trunc('hour', ts)) AS t,
             CASE WHEN event_type = 'click' THEN -1 ELSE -2 END AS nc
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    o AS (
      SELECT user_id, t, nc,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, nc) AS rn
      FROM f
    ),
    walk AS (
      SELECT user_id, 0 AS rn, CAST([] AS DOUBLE[]) AS slot, 0 AS cnt
      FROM (SELECT DISTINCT user_id FROM o)
      UNION ALL
      SELECT o.user_id, o.rn,
             CASE WHEN o.nc = -2 AND len(list_filter(w.slot,
                       __p -> o.t > __p AND o.t - __p = 3600)) > 0
                  THEN CAST([] AS DOUBLE[])
                  WHEN o.nc = -1 AND NOT list_contains(w.slot, o.t)
                  THEN list_append(w.slot, o.t)
                  ELSE w.slot END,
             w.cnt + CASE WHEN o.nc = -2 AND len(list_filter(w.slot,
                       __p -> o.t > __p AND o.t - __p = 3600)) > 0
                     THEN 1 ELSE 0 END
      FROM walk w JOIN o ON o.user_id = w.user_id AND o.rn = w.rn + 1
    ),
    final AS (
      SELECT w.user_id, CAST(w.cnt AS INTEGER) AS conversions
      FROM walk w JOIN (SELECT user_id, MAX(rn) AS mx FROM o GROUP BY 1) m
        ON w.user_id = m.user_id AND w.rn = m.mx
    )
    SELECT conversions, COUNT(*) AS n_users
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def q224_sequence_count_exact_gap(spark, sf_dir):
    """EXACT-gap conversion counting spelled VERBATIM in the dialect:
    ``sequenceCount('(?1)(?t==3600)(?2)')`` over hour-truncated times —
    clicks followed by a purchase exactly one hour-bucket later, greedy
    non-overlapping. == gaps admit no dominance order between live
    chains, so the translation runs the bounded multi-slot NFA (chsql
    r7): the live SET of distinct click hours per user folds JVM-side,
    purchases fire on any member at exactly +3600 s and reset the set.
    Hour truncation makes the == gap realizable on real data (32 raw
    pairs at sf0.01) while keeping the live set calendar-bounded (max
    26 distinct click hours per user at sf0.1 — far under the 64 cap).
    The DuckDB oracle walks the same multi-slot machine with a
    recursive CTE over a list-typed state column."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_CH_SEQ_COUNT_EXACT_GAP_SQL).sql)


_CH_TIME_DECAYED_SQL = """
SELECT user_id, event_id,
       round(exponentialTimeDecayedSum(3600)(value, ts) OVER w, 4)
         AS decayed_sum,
       round(exponentialTimeDecayedCount(3600)(ts) OVER w, 4)
         AS decayed_count,
       round(exponentialTimeDecayedMax(3600)(value, ts) OVER w, 4)
         AS decayed_max,
       round(exponentialTimeDecayedAvg(3600)(value, ts) OVER w, 4)
         AS decayed_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query(
    "q227_time_decayed_windows",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, epoch(ts) AS tsec,
             list(struct_pack(v := CAST(value AS DOUBLE), t := epoch(ts)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS arr
      FROM events
    )
    SELECT user_id, event_id,
           round(list_sum(list_transform(
             arr, e -> e.v * exp((e.t - tsec) / 3600.0))), 4)
             AS decayed_sum,
           round(list_sum(list_transform(
             arr, e -> exp((e.t - tsec) / 3600.0))), 4)
             AS decayed_count,
           round(list_max(list_transform(
             arr, e -> e.v * exp((e.t - tsec) / 3600.0))), 4)
             AS decayed_max,
           round(list_sum(list_transform(
                   arr, e -> e.v * exp((e.t - tsec) / 3600.0)))
                 / list_sum(list_transform(
                   arr, e -> exp((e.t - tsec) / 3600.0))), 4)
             AS decayed_avg
    FROM w
    """,
)
def q227_time_decayed_windows(spark, sf_dir):
    """ClickHouse's exponentialTimeDecayed{Sum,Count,Max,Avg} window
    family spelled VERBATIM in the dialect (chsql r7 rewrite): per
    user, every event weighted exp((t_i - t_now)/3600) over the
    running frame — the freshness-weighted activity score shape. The
    rewrite anchors weights at the frame-max time so every exponent is
    <= 0 (no epoch-scale overflow) and binds the collected frame array
    once via nested single-element transform lambdas (one window
    evaluation, O(frame) fold, all JVM-side codegen — no UDF). The
    DuckDB oracle computes the same fold with list lambdas anchored at
    the current row's epoch — equal by construction since the frame
    ends at the current row. Both engines fold the frame in the same
    deterministic (ts, event_id) order, so the doubles agree bit-exact
    before the 4-dp rounding."""
    from ed_clickhouse_spark.chsql import translate
    from ed_clickhouse_spark.functions.clickhouse import register_sql_aliases

    register_sql_aliases(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(translate(_CH_TIME_DECAYED_SQL).sql)
